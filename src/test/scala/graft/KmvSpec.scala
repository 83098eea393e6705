package graft

import graft.operators.{Hll, Kmv}
import org.apache.spark.sql.functions._

class KmvSpec extends SparkSpec {
  import spark.implicits._

  // sequential reference: bottom-k distinct hashes with min carried value
  private def refPairs(rows: Seq[(Long, Double)], k: Int): Seq[(Long, Double)] =
    rows.groupBy(_._1).view.mapValues(_.map(_._2).min).toSeq
      .sortBy(_._1).take(k)

  private def sketch(rows: Seq[(String, Long, Double)], k: Int): Kmv.Result =
    rows.toDF("g", "h", "v")
      .groupBy(col("g")).agg(Kmv.agg(col("h"), col("v"), k).as("sk"))
      .select("sk.*").as[Kmv.Result].head()

  test("aggregator matches the sequential bottom-k reference") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 3000).map { _ =>
      (rnd.nextLong().abs % (1L << 60), rnd.nextInt(1000).toDouble)
    }
    val k = 64
    val got = sketch(rows.map { case (h, v) => ("g", h, v) }, k)
    val want = Kmv.compute(refPairs(rows, k), k)
    assert(got == want)
  }

  test("order- and partitioning-insensitive (mergeable bounded state)") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 2000).map { _ =>
      ("g", rnd.nextLong().abs % (1L << 60), rnd.nextInt(100).toDouble)
    }
    val k = 32
    val a = sketch(rows, k)
    val b = rows.reverse.toDF("g", "h", "v").repartition(13)
      .groupBy(col("g")).agg(Kmv.agg(col("h"), col("v"), k).as("sk"))
      .select("sk.*").as[Kmv.Result].head()
    assert(a == b)
  }

  test("duplicate hashes dedupe to the min value (set sketch, not a bag)") {
    val base = Seq(("g", 5L, 9.0), ("g", 5L, 3.0), ("g", 7L, 1.0))
    val got = sketch(base ++ base, 8)
    assert(got.sample_size == 2L && got.kth_hash == 7L)
    // q50 over sample values {3.0, 1.0} sorted asc -> rank ceil(.5*2)=1 -> 1.0
    assert(got.q50 == 1.0 && got.q75 == 3.0)
  }

  test("unsaturated sketch reports the exact distinct count") {
    val got = sketch((1 to 10).map(i => ("g", i.toLong, i.toDouble)), 64)
    assert(got.sample_size == 10L && got.est_distinct == 10.0)
  }

  test("saturated estimate within 3 standard errors of truth") {
    val n = 5000
    val k = 256
    val rows = (1 to n).map(i => ("g", s"key-$i"))
      .toDF("g", "key")
      .select(col("g"), Hll.hash60(col("key")).as("h"),
        lit(1.0).as("v"))
      .groupBy(col("g")).agg(Kmv.agg(col("h"), col("v"), k).as("sk"))
      .select("sk.*").as[Kmv.Result].head()
    val se = 1.0 / math.sqrt(k - 2) // ~6.3% at k=256
    assert(math.abs(rows.est_distinct - n) / n < 3 * se,
      s"est=${rows.est_distinct} n=$n")
  }

  test("quantile ranks: exact integer ceil selection") {
    // m=7: ranks ceil(1.75)=2, ceil(3.5)=4, ceil(5.25)=6
    assert(Kmv.rank(25, 7) == 2 && Kmv.rank(50, 7) == 4 && Kmv.rank(75, 7) == 6)
    val got = sketch((1 to 7).map(i => ("g", i.toLong, i.toDouble * 10)), 8)
    assert(got.q25 == 20.0 && got.q50 == 40.0 && got.q75 == 60.0)
  }

  test("setSketch/setOpEstimates: exact below k, bounded error above, " +
      "sketches merge associatively") {
    def md5h(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(8).map("%02x".format(_)).mkString.take(15), 16)
    }
    // A = e0..e299, B = e200..e499: |A|=|B|=300, |A∩B|=100, |A∪B|=500
    val rows = ((0 until 300).map(i => (true, md5h(s"e$i"))) ++
      (200 until 500).map(i => (false, md5h(s"e$i"))))
      .toDF("__side", "__h")
    def ests(k: Int): (Double, Double, Double, Double, Double) = {
      val sk = Kmv.setSketch(rows, Seq("__side"), col("__h"), k)
      val a = sk.filter(col("__side")).select(col("sk").as("ska"))
      val b = sk.filter(!col("__side")).select(col("sk").as("skb"))
      val e = a.crossJoin(b)
        .select(Kmv.setOpEstimates(col("ska"), col("skb"), k).as("e"))
        .select("e.*").as[(Double, Double, Double, Double, Double)].head()
      e
    }
    // k=1000 > every set: sketches are complete, estimates EXACT
    assert(ests(1000) == (300.0, 300.0, 500.0, 100.0, 0.2))
    // k=64 truncates: deterministic estimates, all within 35% relative
    // error of truth (md5's uniformity at this sample size)
    val (ea, eb, eu, ei, ej) = ests(64)
    def rel(est: Double, truth: Double) = math.abs(est - truth) / truth
    assert(rel(ea, 300) < 0.35 && rel(eb, 300) < 0.35 &&
      rel(eu, 500) < 0.35 && rel(ei, 100) < 0.5 && rel(ej, 0.2) < 0.5,
      s"estimates ($ea, $eb, $eu, $ei, $ej)")
    // mergeability: the union sketch from the two bottom-k arrays equals
    // the sketch of the pooled element stream (bottom-k of bottom-ks)
    val pooled = Kmv.setSketch(rows.withColumn("__side", lit(true)),
        Seq("__side"), col("__h"), 64)
      .select(col("sk")).as[Seq[Long]].head()
    val fromSketches = Kmv.setSketch(rows, Seq("__side"), col("__h"), 64)
      .select(explode(col("sk")).as("__h")).withColumn("__side", lit(true))
    val merged = Kmv.setSketch(fromSketches, Seq("__side"), col("__h"), 64)
      .select(col("sk")).as[Seq[Long]].head()
    assert(merged == pooled)
  }
}
