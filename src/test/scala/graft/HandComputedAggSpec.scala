package graft

import graft.functions.NStats
import graft.operators.{ExactQuantiles, Hll, Kmv}
import org.apache.spark.sql.functions._

/** Hand-computed fixture guard for the aggregate formulas (r11 VERDICT
  * #8): every expected value below was worked out BY HAND from the
  * published definition, independent of both the Spark engine and the
  * DuckDB oracle. This is the one check the CORRECTNESS gate cannot
  * provide — the r10 p90 bug (`cum >= floor(9n/10)` instead of the
  * nearest-rank `ceil`) passed the oracle compare because engine and
  * oracle SHARED the wrong expression; a literal fixture would have
  * caught it on n=5.
  */
class HandComputedAggSpec extends SparkSpec {
  import spark.implicits._

  private def mp90(vals: Seq[Long]): (Long, Long, Long) = {
    val r = ExactQuantiles.medianP90ByHistogram(
        vals.map(v => ("g", v)).toDF("k", "v"), col("k"), col("v"))
      .select("n_rows", "median_v", "p90_v").collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("median/p90 histogram: literal nearest-rank values, n = 1..12") {
    // lower median = value at rank ceil((n+1)/2 rounded down) = first
    // cum >= (n+1) div 2; p90 = value at rank ceil(9n/10) = first
    // 10*cum >= 9n. All worked by hand:
    assert(mp90(Seq(7L)) == ((1L, 7L, 7L)))                // n=1: both rank 1
    assert(mp90(Seq(3L, 9L)) == ((2L, 3L, 9L)))            // ranks 1, ceil(1.8)=2
    assert(mp90(Seq(1L, 2L, 3L)) == ((3L, 2L, 3L)))        // ranks 2, ceil(2.7)=3
    assert(mp90(Seq(1L, 2L, 3L, 4L)) == ((4L, 2L, 4L)))    // ranks 2, ceil(3.6)=4
    // n=5 is the r10 regression shape: ceil(4.5)=5 → p90 = max, but the
    // buggy floor gave rank 4
    assert(mp90(Seq(10L, 20L, 30L, 40L, 50L)) == ((5L, 30L, 50L)))
    assert(mp90((1L to 10L)) == ((10L, 5L, 9L)))           // ranks 5, ceil(9)=9
    assert(mp90((1L to 11L)) == ((11L, 6L, 10L)))          // ranks 6, ceil(9.9)=10
    assert(mp90((1L to 12L)) == ((12L, 6L, 11L)))          // ranks 6, ceil(10.8)=11
    // duplicates collapse into histogram buckets: [2,2,2,5] → median
    // rank 2 lands inside the 2-bucket (cum 3 >= 2); p90 rank 4 → 5
    assert(mp90(Seq(2L, 2L, 2L, 5L)) == ((4L, 2L, 5L)))
    // all-equal: every rank is the single value
    assert(mp90(Seq(4L, 4L, 4L, 4L, 4L, 4L, 4L)) == ((7L, 4L, 4L)))
  }

  test("median/p90 histogram: groups are independent") {
    val df = (Seq.fill(1)("a").zip(Seq(7L)) ++
      Seq.fill(5)("b").zip(Seq(10L, 20L, 30L, 40L, 50L)))
      .toDF("k", "v")
    val got = ExactQuantiles.medianP90ByHistogram(df, col("k"), col("v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map("a" -> ((1L, 7L, 7L)), "b" -> ((5L, 30L, 50L))))
  }

  test("NStats: literal N50/L50/N90/L90 on hand-worked assemblies") {
    // definition: sort desc, N50 = first length where the running sum
    // reaches 50% of total; L50 = how many contigs that took
    assert(NStats.compute(Nil) == NStats.Result(0, 0, 0, 0, 0, 0))
    assert(NStats.compute(Seq(5L)) == NStats.Result(1, 5, 5, 1, 5, 1))
    // all-zero assembly: total 0 → all stats 0 (the -1-index edge)
    assert(NStats.compute(Seq(0L, 0L)) == NStats.Result(2, 0, 0, 0, 0, 0))
    // [8,4,2,1]: total 15; 50% = 7.5 → cum 8 ≥ 7.5 → N50=8, L50=1;
    // 90% = 13.5 → cum 8,12,14 → N90=2, L90=3
    assert(NStats.compute(Seq(8L, 4L, 2L, 1L)) ==
      NStats.Result(4, 15, 8, 1, 2, 3))
    // [5,5]: total 10; 50% = 5 → cum 5 ≥ 5 → N50=5, L50=1;
    // 90% = 9 → cum 5,10 → N90=5, L90=2
    assert(NStats.compute(Seq(5L, 5L)) == NStats.Result(2, 10, 5, 1, 5, 2))
    // [3,3,3]: total 9; 50% = 4.5 → cum 3,6 → N50=3, L50=2;
    // 90% = 8.1 → cum 3,6,9 → N90=3, L90=3
    assert(NStats.compute(Seq(3L, 3L, 3L)) ==
      NStats.Result(3, 9, 3, 2, 3, 3))
    // classic textbook case [80,70,50,40,30,20,10]: total 300;
    // 50% = 150 → cum 80,150 → N50=70, L50=2;
    // 90% = 270 → cum 80,150,200,240,270 → N90=30, L90=5
    assert(NStats.compute(Seq(80L, 70L, 50L, 40L, 30L, 20L, 10L)) ==
      NStats.Result(7, 300, 70, 2, 30, 5))
    // order-independence: the aggregator sees arbitrary arrival order
    assert(NStats.compute(Seq(10L, 80L, 30L, 70L, 20L, 50L, 40L)) ==
      NStats.Result(7, 300, 70, 2, 30, 5))
  }

  test("completion status: countDistinct == expected loci, by hand") {
    // the a4_completion shape: per-entity distinct locus count vs 7
    val rows = Seq(
      (1L, 1), (1L, 2), (1L, 3), (1L, 4), (1L, 5), (1L, 6), (1L, 7),
      (2L, 1), (2L, 1), (2L, 2),        // dup designation: 2 loci only
      (3L, 7))
      .toDF("iso", "locus")
    val got = rows.groupBy(col("iso"))
      .agg(countDistinct(col("locus")).as("n_loci"))
      .withColumn("complete", col("n_loci") === 7)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got == Map(1L -> ((7L, true)), 2L -> ((2L, false)),
      3L -> ((1L, false))))
  }

  test("KMV: unsaturated sketch is EXACT (estimate = m); quantile ranks " +
      "by hand") {
    // k=8, five distinct hashes → sample IS the set: est_distinct = 5.0
    // exactly. Quantile rank(pct, 5) = (5*pct + 99) div 100:
    // q25 → rank 2, q50 → rank 3, q75 → rank 4 under ascending (value,
    // hash) order → 20, 30, 40.
    val pairs = Seq((100L, 10.0), (200L, 20.0), (300L, 30.0),
      (400L, 40.0), (500L, 50.0))
    val r = Kmv.compute(pairs, k = 8)
    assert(r.sample_size == 5L && r.kth_hash == 500L)
    assert(r.est_distinct == 5.0)
    assert(r.q25 == 20.0 && r.q50 == 30.0 && r.q75 == 40.0)
    // empty sketch
    assert(Kmv.compute(Nil, k = 8) == Kmv.Result(0L, 0L, 0.0, 0.0, 0.0, 0.0))
    // saturated: m = k = 2, kth hash = 2^59 → est = (2-1)*2^60/2^59 = 2.0
    // exactly (both powers of two — no rounding anywhere)
    val sat = Kmv.compute(Seq((100L, 1.0), (1L << 59, 2.0)), k = 2)
    assert(sat.est_distinct == 2.0)
  }

  test("KMV set ops: short sketches (complete sets) give exact integer " +
      "estimates") {
    // A = {1,2,3}, B = {2,3,4} as sorted hash arrays, k=8 (both short):
    // |A| = 3, |B| = 3, |A∪B| = 4 exact; the union sample is the whole
    // union so J = |{2,3}|/4 = 0.5 and |A∩B| = 0.5·4 = 2.0
    val df = Seq((Seq(1L, 2L, 3L), Seq(2L, 3L, 4L))).toDF("a", "b")
    val r = df.select(Kmv.setOpEstimates(col("a"), col("b"), 8).as("e"))
      .select("e.est_a", "e.est_b", "e.est_union", "e.est_inter",
        "e.est_jaccard")
      .collect().head
    assert(r.getDouble(0) == 3.0 && r.getDouble(1) == 3.0 &&
      r.getDouble(2) == 4.0 && r.getDouble(3) == 2.0 &&
      r.getDouble(4) == 0.5)
  }

  test("HLL: raw estimate from a hand-built register table matches the " +
      "published formula literally") {
    // m=16, registers j=0 → 2, j=1 → 1, all others 0 (absent).
    // Σ 2^-M = 14·1 + 0.5 + 0.25 = 14.75 (dyadic — exact in double);
    // raw = α(16)·m²/Σ = 0.673·256/14.75 = 172.288/14.75
    //     = 11.680542372881357 (one double division); zeros = 14.
    val sparse = Seq(("g", 0L, 2L), ("g", 1L, 1L)).toDF("k", "j", "m")
    val r = Hll.estimate(sparse, Seq("k"), m = 16)
      .select("hll_raw", "n_zero_regs").collect().head
    assert(r.getDouble(0) == 11.680542372881357)
    assert(r.getLong(1) == 14L)
  }

  test("HLL: register derivation from a known md5 constant") {
    // md5("1") is a published constant (c4ca4238a0b92382...): the 60-bit
    // hash is 0xc4ca4238a0b9238 = 885306039509725752... verified below
    // against java MessageDigest directly, independent of Spark
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("1".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    val h = java.lang.Long.parseLong(hex, 16)
    val m = 16
    val expJ = java.lang.Math.floorMod(h, m.toLong)
    val rest = h >> 4
    val expRho =
      if (rest == 0L) 57L else 57L - (64 - java.lang.Long.numberOfLeadingZeros(rest))
    val got = Hll.registers(
        Seq(Tuple1("1")).toDF("key").withColumn("g", lit("g")),
        Seq("g"), "key", m)
      .select("j", "m").collect().head
    assert(got.getLong(0) == expJ && got.getLong(1) == expRho)
  }
}
