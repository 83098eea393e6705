package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval (attribution) join: each left event pairs with
  * the right events of the same key whose time falls in
  * (left.ts, left.ts + horizon] — the view→click attribution shape, the
  * one stateful-join family in Structured Streaming's operator set
  * (watermark + time-range condition bound both sides' state; Spark drops
  * a buffered row once the other side's watermark passes its horizon).
  *
  * Batch and streaming are the SAME declaration: one equi join on the key
  * with the range predicate folded into the join condition — Catalyst
  * plans a single key-partitioned shuffle (no interval-tree operator
  * needed; the per-key group is time-bounded by the horizon, so the
  * post-join filter is linear in true pairs). IntervalJoinSpec pins the
  * watermarked stream-stream form row-for-row against this batch form.
  *
  * Timestamps are integer epoch-micros throughout (the repo's streaming
  * posture — no float time ever crosses an oracle).
  */
object IntervalJoin {

  /** Pairs (all left columns + all right columns) where
    * `right.rTs ∈ (left.lTs, left.lTs + horizonUs]` and the key columns
    * match. Key columns must share names across the two sides; all other
    * column names must be disjoint.
    */
  def within(left: DataFrame, right: DataFrame, keys: Seq[String],
      lTs: String, rTs: String, horizonUs: Long): DataFrame = {
    require(horizonUs > 0, s"horizon must be positive: $horizonUs")
    left.join(right, keys)
      .filter(col(rTs) > col(lTs) &&
        col(rTs) <= col(lTs) + lit(horizonUs))
  }
}
