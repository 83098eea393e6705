package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Materialized-cache refresh modes (SURVEY §4.1): the reference maintains
  * its isolate scheme-field caches with `full`, `incremental`, and `daily`
  * modes (sql/isolatedb.sql:1439-1588, update_scheme_caches.pl) plus an
  * atomic rename-swap for cross-db replicated dimensions
  * (lib/BIGSdb/Datastore.pm:2165-2172).
  *
  * Spark-native equivalents over parquet snapshots (no table format
  * dependency):
  *   - full      → recompute + atomic directory swap
  *   - incremental → MERGE keyed on the cache key: changed entities'
  *     rows are recomputed and upserted, unchanged rows carry over —
  *     ONE anti join + union, no row-by-row trigger machinery
  *   - streaming  → graft.streaming.IncrementalWarehouse (same result,
  *     continuous)
  */
object CacheRefresh {

  /** MERGE-style upsert: `updates` replaces rows of `current` sharing the
    * same `key`; everything else carries over. The batch equivalent of the
    * reference's incremental trigger maintenance.
    */
  def upsert(current: DataFrame, updates: DataFrame, key: String): DataFrame =
    current.join(updates.select(col(key)), Seq(key), "left_anti")
      .unionByName(updates)

  /** Full refresh with atomic swap: write the rebuilt cache next to the
    * live directory, then rename over it — readers see either the old or
    * the new snapshot, never a partial one (the reference's rename-swap,
    * Datastore.pm:2165-2172).
    */
  def fullSwap(rebuilt: DataFrame, livePath: String): Unit = {
    val tmp = livePath + ".staging"
    rebuilt.write.mode("overwrite").parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      rebuilt.sparkSession.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(livePath)
    val old = new org.apache.hadoop.fs.Path(livePath + ".old")
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(live)) fs.rename(live, old)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), live)
    fs.delete(old, true)
  }
}
