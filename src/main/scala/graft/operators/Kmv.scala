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
}
