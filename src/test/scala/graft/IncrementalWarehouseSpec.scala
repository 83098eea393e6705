package graft

import graft.operators.Profiles
import graft.streaming.IncrementalWarehouse
import graft.streaming.IncrementalWarehouse.Designation
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streamed incremental warehouse converges to the batch warehouse. */
class IncrementalWarehouseSpec extends SparkSpec {
  import spark.implicits._

  test("streamed designation updates converge to the batch warehouse") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Designation]
    val q = IncrementalWarehouse.updates(stream.toDS(), nLoci = 3)
      .writeStream.outputMode("append").format("memory")
      .queryName("wh_updates").start()
    try {
      // batch 1: two isolates, partial profiles
      stream.addData(
        Designation(1, 1, "5"), Designation(1, 2, "7"),
        Designation(2, 1, "5"))
      q.processAllAvailable()
      // batch 2: isolate 1 gains locus 3 and a BETTER (lower) allele at
      // locus 1; isolate 2 unchanged (duplicate designation -> no emit)
      stream.addData(
        Designation(1, 3, "9"), Designation(1, 1, "2"),
        Designation(2, 1, "5"))
      q.processAllAvailable()

      val updates = spark.table("wh_updates")
        .select("entity", "profile", "profile_md5")
        .as[(Long, Seq[String], String)].collect()
      // latest update per entity = converged profile
      val latest = updates.zipWithIndex
        .groupBy(_._1._1).map { case (e, us) => e -> us.maxBy(_._2)._1 }
      assert(latest(1L)._2 == Seq("2", "7", "9"))
      assert(latest(2L)._2 == Seq("5", "0", "0"))
      // isolate 2 emitted exactly once (second batch was a no-op)
      assert(updates.count(_._1 == 2L) == 1)

      // equals the batch warehouse over the full designation set
      val allDesignations = Seq(
        (1L, 1, "5"), (1L, 2, "7"), (2L, 1, "5"),
        (1L, 3, "9"), (1L, 1, "2"), (2L, 1, "5"))
        .toDF("entity", "locus", "allele")
      val batch = Profiles.warehouse(allDesignations, "entity", "locus",
          col("allele"), 3)
        .select(col("entity"), col("profile"), col("profile_md5"))
        .as[(Long, Seq[String], String)].collect()
        .map(t => t._1 -> ((t._2, t._3))).toMap
      assert(latest(1L)._2 == batch(1L)._1 && latest(1L)._3 == batch(1L)._2)
      assert(latest(2L)._2 == batch(2L)._1 && latest(2L)._3 == batch(2L)._2)
    } finally q.stop()
  }
}
