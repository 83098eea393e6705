package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** SURVEY §2.11 — the reference has NO streaming; its trigger-based
  * incremental aggregate maintenance (seqbin_stats deltas,
  * sql/isolatedb.sql:522-610) and cron cache refresh
  * (update_scheme_caches.pl `incremental` mode) map naturally onto
  * Structured Streaming: new designations/contigs arrive as a stream and
  * the per-isolate aggregates update continuously.
  *
  * Batch and streaming share ONE aggregation definition, so the continuous
  * path provably computes the same stats the batch path does (tested in
  * StreamingSpec by replaying a parquet table through the streaming path
  * and diffing against the batch result).
  */
object IncrementalStats {

  /** The shared aggregation: per-key event stats (the seqbin_stats shape:
    * count + sum + max per isolate).
    */
  def eventStats(events: DataFrame): DataFrame =
    events.groupBy(col("user_id")).agg(
      count(lit(1)).as("n_events"),
      // decimal accumulation: double sums are partial-sum-order dependent,
      // so batch/stream/oracle could disagree in the last ulp and round
      // differently at 4dp; fixed-point is exact and order-free
      round(sum(col("value").cast("decimal(30,8)")).cast("double"), 4)
        .as("total_value"),
      round(max(col("value")), 4).as("max_value"))

  /** Tumbling-window aggregate with watermark (the idiomatic streaming
    * surface for the dashboard's change-over-duration counts).
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(30,8)")).cast("double"), 4)
          .as("v"))

  /** Run the shared aggregation over a parquet dir as a STREAM (file
    * micro-batches), materializing into an in-memory sink. Returns the
    * query; callers processAllAvailable() + read table `sinkName`.
    */
  def replayAsStream(
      spark: SparkSession,
      parquetPath: String,
      schema: StructType,
      sinkName: String): StreamingQuery = {
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(parquetPath)
    eventStats(stream)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(sinkName)
      .start()
  }
}
