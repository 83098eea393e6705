package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Assembly N-statistics as a typed Aggregator (SURVEY §2.4 A6 / §2.12).
  *
  * N50 = the largest length L such that contigs of length >= L sum to at
  * least 50% of the assembly; L50 = how many such contigs
  * (lib/BIGSdb/Utils.pm:873-898, plpgsql sql/isolatedb.sql:464-494).
  *
  * The window-function form (AggQueries a6_n50) is preferred when the whole
  * distribution is already shuffled; this Aggregator is the single-pass
  * form for `groupBy(...).agg(...)` pipelines: partial aggregation merges
  * length buffers map-side, so the shuffle carries one array per group —
  * bounded, since real assemblies cap at ~1000 contigs
  * (lib/BIGSdb/Constants.pm:320-333).
  */
object NStats {

  case class Result(contigs: Long, totalLength: Long,
    n50: Long, l50: Long, n90: Long, l90: Long)

  /** Compute N-stats from raw lengths (reference algorithm: sort desc,
    * running sum to threshold).
    */
  def compute(lengths: Seq[Long]): Result = {
    if (lengths.isEmpty) return Result(0, 0, 0, 0, 0, 0)
    // materialize into an Array FIRST: the aggregation buffer arrives as a
    // List, and positional access on a List is O(i) — the cum walk below
    // would go quadratic in the group size (found spinning for minutes on
    // 200k-contig groups in an sf0.1 stress sweep; harmless at per-isolate
    // group sizes, lethal at per-flag ones)
    val sorted = lengths.toArray
    java.util.Arrays.sort(sorted) // ascending; walk from the top
    val n = sorted.length
    var total = 0L
    var j = 0
    while (j < n) { total += sorted(j); j += 1 }
    // all-zero lengths: threshold 0 never enters the cum loop → i-1 = -1
    if (total == 0) return Result(n.toLong, 0, 0, 0, 0, 0)
    def at(frac: Double): (Long, Long) = {
      val threshold = total * frac
      var cum = 0L; var i = 0
      while (i < n && cum < threshold) { cum += sorted(n - 1 - i); i += 1 }
      (sorted(n - i), i.toLong)
    }
    val (n50, l50) = at(0.5)
    val (n90, l90) = at(0.9)
    Result(n.toLong, total, n50, l50, n90, l90)
  }

  /** Typed Aggregator over a Long length column. */
  val aggregator: Aggregator[Long, List[Long], Result] =
    new Aggregator[Long, List[Long], Result] {
      def zero: List[Long] = Nil
      def reduce(b: List[Long], a: Long): List[Long] = a :: b
      def merge(b1: List[Long], b2: List[Long]): List[Long] = b1 ::: b2
      def finish(b: List[Long]): Result = compute(b)
      def bufferEncoder: Encoder[List[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Long]]()
      def outputEncoder: Encoder[Result] = Encoders.product[Result]
    }

  /** Untyped (DataFrame) column form: NStats.agg(col) in groupBy(...).agg. */
  def agg(lengthCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.udaf(aggregator)
      .apply(lengthCol)
}
