package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact first-seen-wins deduplication on ingest — the at-most-once
  * gate in front of an event pipeline (the reference keeps its event
  * tables unique per natural key the same way: first write wins, later
  * arrivals are dropped or counted).
  *
  * Batch form: ONE aggregation per content key — `min(struct(ts, id))`
  * picks the earliest occurrence deterministically (ties on ts break by
  * id), `count` reports the duplicate pressure. Map-side combinable, no
  * window, no self-join; at 100 TB the shuffle carries one k-byte row
  * per KEY, not per event.
  *
  * Streaming form: the SAME aggregation under update/complete mode, or
  * Spark's `dropDuplicatesWithinWatermark` when only the pass-through
  * rows (not the dup counts) are needed; StreamingSpec pins that the
  * streamed state equals the batch aggregation row for row.
  */
object StreamDedup {

  /** First occurrence per content key: (keyCols*, first_ts, first_id,
    * n_dups). `fingerprint` optionally replaces the raw key columns with
    * a computed content hash (e.g. md5 of the payload) — the exact-dedup
    * posture when the key is the content itself.
    */
  def firstSeen(events: DataFrame, keyCols: Seq[String],
      tsCol: String, idCol: String): DataFrame =
    events.groupBy(keyCols.map(col): _*)
      .agg(min(struct(col(tsCol), col(idCol))).as("__first"),
        count(lit(1)).as("n_dups"))
      .select(keyCols.map(col) ++ Seq(
        col(s"__first.$tsCol").as("first_ts"),
        col(s"__first.$idCol").as("first_id"),
        col("n_dups")): _*)

  /** Content-hash variant: key = md5 over the concatenation of the
    * PER-COLUMN md5s — each component hashes to a fixed-width hex block
    * first, so the encoding is injective in the column values: no
    * separator byte exists for a payload to collide with (("ab","c") vs
    * ("a","bc"), or values containing the separator itself, all key
    * differently — a guarantee a separator join cannot make). NULL is
    * deliberately keyed like the empty string (coalesce) — dedup by
    * VALUE when no natural key exists. Oracle side replays the same
    * md5-of-md5s chain.
    */
  def firstSeenByContent(events: DataFrame, payload: Seq[Column],
      tsCol: String, idCol: String): DataFrame =
    firstSeen(
      events.withColumn("content_key",
        md5(concat(payload.map(c =>
          md5(coalesce(c.cast("string"), lit("")))): _*))),
      Seq("content_key"), tsCol, idCol)
}
