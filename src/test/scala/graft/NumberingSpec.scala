package graft

import graft.operators.Numbering
import org.apache.spark.sql.functions._

class NumberingSpec extends SparkSpec {
  import spark.implicits._

  test("numberBySort assigns dense 1..n ids in sort order across partitions") {
    val df = Seq(30L, 10L, 50L, 20L, 40L).toDF("k").repartition(3)
    val out = Numbering.numberBySort(df, "k", "id")
      .orderBy("k").as[(Long, Long)].collect()
    assert(out.toSeq == Seq((10L, 1L), (20L, 2L), (30L, 3L), (40L, 4L), (50L, 5L)))
  }

  test("runningBySort matches a global cumulative sum") {
    val df = (1 to 100).map(i => (i.toLong, (i % 7 + 1).toLong))
      .toDF("k", "v").repartition(5)
    val got = Numbering.runningBySort(df, "k", col("v"), "cum")
      .orderBy("k").select("k", "cum").as[(Long, Long)].collect()
    var acc = 0L
    val want = (1 to 100).map { i => acc += (i % 7 + 1); (i.toLong, acc) }
    assert(got.toSeq == want)
  }

  test("runningMaxBySort matches a global running max; NULLs never raise it") {
    val df = (1 to 100).map { i =>
      val v: java.lang.Long = if (i % 9 == 0) null else ((i * 37) % 50).toLong
      (i.toLong, v)
    }.toDF("k", "v").repartition(5)
    val got = Numbering.runningMaxBySort(df, Seq(col("k")), col("v"), "hwm")
      .orderBy("k").select("k", "hwm").as[(Long, Long)].collect()
    var acc = Long.MinValue
    val want = (1 to 100).map { i =>
      if (i % 9 != 0) acc = math.max(acc, (i * 37) % 50L)
      (i.toLong, acc)
    }
    assert(got.toSeq == want)
  }

  test("numberBySort on empty input returns empty") {
    val df = Seq.empty[Long].toDF("k")
    assert(Numbering.numberBySort(df, "k", "id").count() == 0)
  }

  // VERDICT r2 done-criterion: no single-partition global-sort windows
  // anywhere in main sources — the scalable two-phase Numbering form (or a
  // partitioned window) is required instead.
  test("src/main has no unpartitioned Window.orderBy") {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get("src/main/scala")
    val offenders = java.nio.file.Files.walk(root).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .flatMap { p =>
        // partitioned windows read Window.partitionBy(...).orderBy(...);
        // anything matching Window[ws].orderBy in code (comments stripped)
        // is a global sort window
        val code = java.nio.file.Files.readAllLines(p).asScala
          .map(_.trim).filterNot(l =>
            l.startsWith("//") || l.startsWith("*") || l.startsWith("/*"))
          .mkString("\n")
        if ("Window\\s*\\.\\s*orderBy".r.findFirstIn(code).isDefined)
          Some(p.toString)
        else None
      }.toList
    assert(offenders.isEmpty, s"unpartitioned Window.orderBy in: $offenders")
  }
}
