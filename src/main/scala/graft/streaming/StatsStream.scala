package graft.streaming

import graft.sources.SkippingRegistry
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous maintenance of a REGISTERED table's skipping artifacts —
  * the streaming form of [[SkippingRegistry.appendFiles]], closing the
  * stats lifecycle the same way [[IndexStream]] closes the index one:
  * rows arrive as a stream, each micro-batch lands as ONE
  * deterministically-named data file and the zone/Bloom artifacts
  * refresh inline (delta-only), so a reader compiling against the
  * table at any moment prunes with stats that cover every committed
  * file — the trigger-maintained-stats discipline, continuous.
  *
  * Exactly-once WITHOUT a transactional table format: plain parquet
  * appends are at-least-once under replay, so the batch write is made
  * IDEMPOTENT instead — the micro-batch coalesces to one part file,
  * stages under the (listing-invisible) `_skipping/staging` child and
  * renames to the deterministic name `batch<id>.parquet`; a replay
  * deletes and re-renames the same name, never duplicating data. The
  * applied batch id rides inside the stats artifact's published
  * version ([[CacheStream.BatchMarker]] via [[SkippingRegistry
  * .refresh]]), and the refresh order (Bloom first, marker-carrier
  * last) makes every crash window replay-safe: a replay after a
  * half-applied batch re-stages the identical file (same name, same
  * deterministic content) and re-runs the refreshes, whose own
  * anti-joins skip whatever already landed.
  *
  * Scale shape: a micro-batch pays one file write, one rename (a
  * metadata op on POSIX/HDFS) and the delta-only stats scan of itself.
  * Micro-batch-sized files accumulating is the standard streaming-sink
  * compaction concern, orthogonal to the stats (which are per-file and
  * survive any rewrite via [[SkippingRegistry.refresh]] after it).
  */
object StatsStream {

  /** One maintenance step — the exact foreachBatch body, shared with
    * the batch-fold replay (`stream_stats_publish` runs precisely
    * this): skip if the artifacts already folded `batchId` in, else
    * land the batch file idempotently and refresh with the marker.
    */
  def maintainStep(batch: DataFrame, batchId: Long,
      dataDir: String): Unit = {
    val spark = batch.sparkSession
    if (!SkippingRegistry.appliedBatch(spark, dataDir).exists(_ >= batchId)) {
      val conf = spark.sparkContext.hadoopConfiguration
      val dataPath = new org.apache.hadoop.fs.Path(dataDir)
      val fs = dataPath.getFileSystem(conf)
      val staging = new org.apache.hadoop.fs.Path(
        dataDir, s"_skipping/staging/batch$batchId")
      // ONE part per micro-batch: the deterministic target name is the
      // idempotence mechanism, and a fixed part count keeps replays
      // from stranding extra files a prior attempt named. repartition,
      // not coalesce — an EMPTY batch can arrive with zero partitions,
      // and repartition(1) still materializes the one (empty) part
      batch.repartition(1).write.mode("overwrite").parquet(staging.toString)
      val part = fs.listStatus(staging)
        .map(_.getPath).filter(_.getName.startsWith("part-"))
      require(part.length == 1,
        s"expected exactly one staged part file, got ${part.length}")
      val target = new org.apache.hadoop.fs.Path(
        dataDir, s"batch$batchId.parquet")
      if (fs.exists(target)) fs.delete(target, false)
      if (!fs.rename(part.head, target))
        throw new java.io.IOException(s"rename to $target failed")
      fs.delete(staging, true)
      SkippingRegistry.refresh(spark, dataDir, marker = Some(batchId))
    }
  }

  /** Stream driver: `rows` micro-batches append into the registered
    * table at `dataDir` (which must already be registered via
    * [[SkippingRegistry.register]]) with its skipping artifacts
    * maintained inline. Same batchId-lineage contract as
    * [[CacheStream.maintain]]: a new checkpoint lineage needs a fresh
    * marker history (new artifacts), so pair checkpoint and table.
    */
  def maintain(rows: DataFrame, dataDir: String,
      checkpointLocation: Option[String] = None): StreamingQuery =
    rows.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointLocation.getOrElse(
        s"${dataDir.stripSuffix("/")}/_skipping/checkpoint"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        maintainStep(batch, batchId, dataDir)
      }
      .start()
}
