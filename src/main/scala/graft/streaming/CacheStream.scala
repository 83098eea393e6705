package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** SURVEY §7.1(7) — the reference's cron-driven scheme-field cache
  * refresh (update_scheme_caches.pl `incremental` mode: query new
  * designations since the last run, MERGE them into the cache table,
  * rename-swap) re-expressed as Structured Streaming: new designation
  * rows arrive as a stream, each micro-batch MERGEs into the published
  * cache snapshot via the same versioned-pointer swap the batch
  * federation path uses ([[graft.operators.CacheRefresh.fullSwap]]), so
  * a reader NEVER sees a half-refreshed cache — the Datastore.pm
  * atomicity property, continuously.
  *
  * The cache payload here is the ADDITIVE aggregate family (counts,
  * sums — the seqbin_stats/scheme-field-cache shape): merging a batch is
  * `union(current, batch-agg) → re-aggregate`, which is exact in any
  * arrival order, so the stream provably converges to the full batch
  * rebuild — CacheStreamSpec pins stream ≡ batch-fold ≡ full rebuild
  * row-for-row, and the `cache_stream_merge` CORRECTNESS query replays
  * the same fold against the full-rebuild DuckDB oracle.
  *
  * Scale shape: each micro-batch shuffles (batch rows + one row per
  * cached entity) through one map-side-combinable aggregation. At 100 TB
  * the cache side would be partition-pruned to the entities present in
  * the batch (the MERGE touches only changed keys); the additive algebra
  * is unchanged.
  */
object CacheStream {

  /** One MERGE step: fold a batch of per-entity aggregate rows into the
    * running cache. Both inputs carry (key, aggCols...) with the SAME
    * additive schema; missing entities on either side contribute their
    * identity (SUM over the union).
    */
  def mergeAdditive(cache: DataFrame, updates: DataFrame,
      key: String): DataFrame = {
    val aggCols = cache.columns.filterNot(_ == key)
    require(aggCols.sameElements(updates.columns.filterNot(_ == key)),
      s"cache/update schemas differ: ${cache.columns.toSeq} vs " +
        s"${updates.columns.toSeq}")
    cache.unionByName(updates)
      .groupBy(col(key))
      .agg(sum(col(aggCols.head)).as(aggCols.head),
        aggCols.tail.map(c => sum(col(c)).as(c)): _*)
  }

  /** Continuous cache maintenance: aggregate each micro-batch of
    * designation rows with `agg`, MERGE into the live snapshot, publish
    * the merged cache atomically through the versioned pointer. Readers
    * resolve via [[graft.sources.Federation.readDimension]] at any time
    * and see a complete (old or new) snapshot.
    */
  def maintain(designations: DataFrame, key: String,
      agg: DataFrame => DataFrame, livePath: String): StreamingQuery = {
    val spark = designations.sparkSession
    designations.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val updates = agg(batch)
        val fs = org.apache.hadoop.fs.FileSystem.get(
          spark.sparkContext.hadoopConfiguration)
        val hasCurrent = fs.exists(
          new org.apache.hadoop.fs.Path(livePath + ".current"))
        val merged =
          if (!hasCurrent) updates
          else mergeAdditive(
            graft.sources.Federation.readDimension(spark, livePath),
            updates, key)
        // merged reads the CURRENT version while fullSwap writes the
        // next and only then moves the pointer — the read plan is
        // executed (write) before the pointer flip, so the self-join on
        // the snapshot is race-free
        graft.operators.CacheRefresh.fullSwap(merged, livePath,
          numFiles = Some(1))
        ()
      }
      .start()
  }
}
