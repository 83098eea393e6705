package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra-Gries mergeable frequency summary + the two-pass EXACT heavy-
  * hitter operator built on it.
  *
  * The sketch family's deterministic member: beside HLL (cardinality),
  * CMS (frequency estimates, randomized), KMV (quantiles/distinct) and
  * Bloom (membership), Misra-Gries tracks at most k counters and
  * guarantees — with no hashing and no failure probability — that every
  * item with true frequency > n/k is present in the summary (Misra &
  * Gries 1982; mergeability per Agarwal et al., PODS 2012: sum summaries,
  * subtract the (k+1)-th largest count, drop non-positives).
  *
  * The summary alone has order-dependent counts, so it is never the
  * answer under this repo's bit-identical oracle discipline. The operator
  * that IS the answer ([[heavyHitters]]) uses it the way production
  * pipelines do: pass 1 reduces the corpus to ≤ k candidate keys per
  * merge path (bounded state, map-side combinable — at 100 TB each
  * executor ships k counters, never a vocabulary); pass 2 exactly
  * recounts ONLY the candidates (semi join prunes the corpus before the
  * count shuffle) and keeps those with n_exact·k > n_total. The MG
  * guarantee makes the candidate set a superset of the true answer, so
  * the output is exact and partitioning-independent even though the
  * intermediate summary is not.
  */
object MisraGries {

  /** Decrement-all insert: classic MG. O(k) only when a new key meets a
    * full summary (amortized O(1) per stream item).
    */
  private def insert(b: Map[String, Long], a: String, k: Int): Map[String, Long] =
    b.get(a) match {
      case Some(c) => b.updated(a, c + 1L)
      case None if b.size < k => b.updated(a, 1L)
      case None =>
        b.view.mapValues(_ - 1L).filter(_._2 > 0L).toMap
    }

  /** Mergeable-summaries combine: sum, subtract the (k+1)-th largest,
    * keep positives — the merged summary keeps the n/k guarantee.
    */
  private def combine(b1: Map[String, Long], b2: Map[String, Long],
      k: Int): Map[String, Long] = {
    val sum = b2.foldLeft(b1) { case (acc, (w, c)) =>
      acc.updated(w, acc.getOrElse(w, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      val kth = sum.values.toArray.sortBy(-_).apply(k) // (k+1)-th largest
      sum.view.mapValues(_ - kth).filter(_._2 > 0L).toMap
    }
  }

  /** Typed Aggregator: string keys in, candidate key array out. */
  def aggregator(k: Int): Aggregator[String, Map[String, Long], Array[String]] = {
    require(k >= 1, s"k must be >= 1: $k")
    new Aggregator[String, Map[String, Long], Array[String]] {
      def zero: Map[String, Long] = Map.empty
      def reduce(b: Map[String, Long], a: String): Map[String, Long] =
        insert(b, a, k)
      def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] =
        combine(b1, b2, k)
      def finish(b: Map[String, Long]): Array[String] = b.keys.toArray.sorted
      def bufferEncoder: Encoder[Map[String, Long]] =
        org.apache.spark.sql.catalyst.encoders
          .ExpressionEncoder[Map[String, Long]]()
      def outputEncoder: Encoder[Array[String]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
    }
  }

  /** Untyped column form: candidate-key array for groupBy.agg. */
  def candidates(keyCol: Column, k: Int): Column =
    org.apache.spark.sql.functions.udaf(aggregator(k)).apply(keyCol)

  /** Exact heavy hitters: every distinct value of `key` with frequency
    * strictly greater than n/k, with its EXACT count — two passes, both
    * bounded-state. Output: (key-named column, n_exact), unordered.
    */
  def heavyHitters(rows: DataFrame, key: String, k: Int): DataFrame = {
    val keys = rows.select(col(key))
    val cand = keys
      .agg(candidates(col(key), k).as("__c"))
      .select(explode(col("__c")).as(key))
    val total = keys.agg(count(lit(1)).as("__n"))
    keys.join(broadcast(cand), key)
      .groupBy(col(key))
      .agg(count(lit(1)).as("n_exact"))
      .crossJoin(broadcast(total))
      .filter(col("n_exact") * k > col("__n"))
      .select(col(key), col("n_exact"))
  }
}
