package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values / bottom-k) sketch (Bar-Yossef et al. 2002) on
  * the repo's portable 60-bit md5 hash — the uniform-sample structure that
  * completes the sketch family (HLL cardinality, CMS frequency, Bloom
  * membership) with a mergeable bounded-state QUANTILE + distinct
  * estimator.
  *
  * State per group is the k smallest distinct key hashes with one carried
  * value each — bounded at k rows regardless of group size, merged by
  * keep-k-smallest (bottom-k of a union == bottom-k of bottom-ks), so
  * shard sketches combine map-side exactly like the reference's
  * whole-table scans never could. Because hash order is uniform, the kept
  * rows are a simple random sample: empirical quantiles of the carried
  * value read straight off the sample, and the k-th smallest hash gives
  * the classic (k-1) / h_k cardinality estimate.
  *
  * Oracle-replayable by construction: the hash is the same
  * first-15-md5-hex-digits integer DuckDB computes ([[Hll.hash60]]), the
  * sample is an integer rank cut, quantile selection is integer-rank
  * indexing with a total (value, hash) order, and the only float ops are
  * one exact-integer-to-double conversion each plus one division —
  * identical IEEE rounding in both engines. Duplicate hashes (same key,
  * or a collision) dedupe to the minimum carried value on both sides.
  */
object Kmv {

  /** Exact 2^60 as a double (8-bit mantissa times a power of two). */
  val TwoPow60: Double = math.pow(2.0, 60)

  case class Result(
      sample_size: Long, kth_hash: Long, est_distinct: Double,
      q25: Double, q50: Double, q75: Double)

  /** ceil(pct% of m) as exact integer arithmetic — the 1-indexed sample
    * rank both engines select for the pct-th percentile.
    */
  def rank(pct: Long, m: Long): Long = (pct * m + 99L) / 100L

  /** Finish: estimates from the kept (hash, value) pairs.
    *
    * When the sketch is unsaturated (fewer than k distinct hashes) the
    * sample IS the whole key set, so the distinct estimate is exact;
    * saturated, it is (k-1) * 2^60 / h_k. Quantiles select sample values
    * at integer ranks under ascending (value, hash) order.
    */
  def compute(pairs: Seq[(Long, Double)], k: Int): Result = {
    if (pairs.isEmpty) return Result(0L, 0L, 0.0, 0.0, 0.0, 0.0)
    val m = pairs.size.toLong
    val kth = pairs.iterator.map(_._1).max
    val est =
      if (m >= k && kth > 0L) (m - 1L).toDouble * TwoPow60 / kth.toDouble
      else m.toDouble
    val byValue = pairs.toArray
    java.util.Arrays.sort(byValue, Ordering.Tuple2(
      Ordering[Double], Ordering[Long]).on[(Long, Double)](p => (p._2, p._1)))
    def at(pct: Long): Double = byValue((rank(pct, m) - 1L).toInt)._2
    Result(m, kth, est, at(25L), at(50L), at(75L))
  }

  /** Typed Aggregator over (hash60, value) rows for a given k.
    *
    * The buffer is a descending-by-hash sorted list (head = current
    * threshold), deduped by hash to the min value, trimmed to k. After
    * saturation a row above the threshold is rejected with one O(1) head
    * comparison — the k/n-probability insertions pay the O(k) walk.
    */
  def aggregator(k: Int): Aggregator[(Long, Double), List[(Long, Double)], Result] = {
    require(k >= 2, s"k must be >= 2: $k")
    new Aggregator[(Long, Double), List[(Long, Double)], Result] {
      def zero: List[(Long, Double)] = Nil

      private def insert(b: List[(Long, Double)], h: Long, v: Double):
          List[(Long, Double)] = {
        // descending walk; dedupe h to min v; cap at k by dropping head
        val (above, rest) = b.span(_._1 > h)
        val merged = rest match {
          case (h0, v0) :: tail if h0 == h =>
            above ::: (h, math.min(v, v0)) :: tail
          case _ => above ::: (h, v) :: rest
        }
        if (merged.lengthCompare(k) > 0) merged.tail else merged
      }

      def reduce(b: List[(Long, Double)], a: (Long, Double)):
          List[(Long, Double)] =
        b match {
          case (h0, _) :: _ if a._1 > h0 && b.lengthCompare(k) >= 0 => b
          case _ => insert(b, a._1, a._2)
        }

      def merge(b1: List[(Long, Double)], b2: List[(Long, Double)]):
          List[(Long, Double)] =
        b2.foldLeft(b1) { case (acc, (h, v)) => insert(acc, h, v) }

      def finish(b: List[(Long, Double)]): Result = compute(b, k)

      def bufferEncoder: Encoder[List[(Long, Double)]] =
        org.apache.spark.sql.catalyst.encoders
          .ExpressionEncoder[List[(Long, Double)]]()
      def outputEncoder: Encoder[Result] = Encoders.product[Result]
    }
  }

  /** Untyped column form: Kmv.agg(hash60(key), value, k) in groupBy.agg. */
  def agg(hashCol: Column, valueCol: Column, k: Int): Column =
    org.apache.spark.sql.functions.udaf(aggregator(k))
      .apply(hashCol, valueCol)

  /** KMV SET sketch: per group, the k smallest DISTINCT element hashes,
    * sorted ascending (Broder bottom-k / Beyer et al. SIGMOD 2007) — the
    * mergeable fixed-size state that answers |A|, |A∪B|, |A∩B|, |A\B|,
    * and Jaccard across corpus slices WITHOUT ever joining the element
    * spaces (the 100 TB cross-snapshot overlap-planning primitive; HLL
    * gives |A∩B| only by inclusion–exclusion, whose error explodes for
    * small intersections — the union-sample estimator below does not).
    *
    * Plan: one distinct on (group, hash) — the minimal shuffle any exact
    * distinct sketch needs — then a bounded CollectBottomK aggregation
    * whose map-side partial buffers hold at most k entries per group. A
    * sketch shorter than k IS the complete hash set (estimates turn
    * exact); bottom-k of a union equals bottom-k of unioned bottom-ks,
    * so shard sketches merge associatively.
    */
  def setSketch(df: org.apache.spark.sql.DataFrame, group: Seq[String],
      hashCol: Column, k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(k > 0, s"sketch size must be positive: $k")
    val d = df.select(group.map(col) :+ hashCol.as("__h"): _*).distinct()
    d.groupBy(group.map(col): _*)
      .agg(org.apache.spark.sql.graft.ColumnBridge.collectBottomK(
        struct(col("__h")), k).as("__tk"))
      .select(group.map(col) :+
        transform(col("__tk"), x => x.getField("__h")).as("sk"): _*)
  }

  /** Set-operation estimates from two [[setSketch]] arrays (same k).
    * The kk = min(k, |union|) smallest merged values are a uniform
    * sample of A∪B: the fraction present in BOTH sketches estimates
    * Jaccard, the classic (k−1)/h_k reads each cardinality, and
    * |A∩B| = J·|A∪B|. Short sketches (complete sets) make every
    * estimate exact. Returns a struct
    * (est_a, est_b, est_union, est_inter, est_jaccard) — all double,
    * deterministic, and replayable in any engine with list ops.
    */
  def setOpEstimates(ska: Column, skb: Column, k: Int): Column = {
    import org.apache.spark.sql.functions._
    def card(sk: Column): Column =
      when(size(sk) < k, size(sk).cast("double"))
        .otherwise(lit((k - 1).toDouble) * lit(TwoPow60) /
          element_at(sk, k).cast("double"))
    val u = array_sort(array_union(ska, skb))
    val kk = least(size(u), lit(k))
    val j = size(array_intersect(
        array_intersect(slice(u, lit(1), kk), ska), skb)).cast("double") /
      kk.cast("double")
    val uEst = when(size(u) < k, size(u).cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(TwoPow60) /
        element_at(u, k).cast("double"))
    struct(card(ska).as("est_a"), card(skb).as("est_b"),
      uEst.as("est_union"), (j * uEst).as("est_inter"),
      j.as("est_jaccard"))
  }
}
