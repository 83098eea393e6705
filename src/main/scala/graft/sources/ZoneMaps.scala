package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-granularity zone maps — the data-skipping layer ABOVE parquet's
  * own row-group statistics: one (min, max, rows) row per FILE per
  * indexed column, consulted to prune the file LIST before Spark ever
  * opens a footer. Parquet row-group stats only help after a task has
  * been scheduled against the file; at 100 TB (~800k files of 128 MB)
  * the win is not scheduling the task at all — the same small-
  * materialized-aggregates idea behind Moerkotte's zone maps and the
  * Delta/Iceberg data-skipping indexes, kept engine-local as a plain
  * parquet stats table.
  *
  * Scale posture: the stats table is one row per file — metadata-sized
  * by construction (the file listing itself is already driver-resident
  * in Spark's `InMemoryFileIndex`), so collecting it to prune is the
  * same order of driver work Spark's partition pruning does. Stats
  * build is ONE corpus scan; serving sessions read k rows.
  *
  * Correctness contract: zone maps PRUNE, they never DECIDE — the
  * original predicate is re-applied to the surviving files, so a stale
  * or lossy stats row can only cost speed (a kept file with no matches)
  * never rows, EXCEPT staleness in the other direction (a file whose
  * stats say "no overlap" but whose content changed) — which is why
  * [[saveStats]] publishes under the same versioned pointer the other
  * persisted artifacts use: stats flip atomically with nothing torn.
  * NULL semantics: min/max aggregate over non-null values, so an
  * all-null file carries null stats and is pruned — correct for range
  * predicates (NULL never satisfies BETWEEN); IS NULL predicates must
  * not be routed through zone maps (they prune on value ranges only).
  */
object ZoneMaps {

  /** One inclusive value interval per indexed column. */
  final case class ColRange(col: String, lo: Long, hi: Long)

  /** Build the per-file stats table for `cols` over a parquet layout —
    * one scan, one tiny aggregation keyed on the file path.
    */
  def buildStats(spark: SparkSession, dataDir: String,
      cols: Seq[String]): DataFrame =
    spark.read.parquet(dataDir)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("rows"),
        cols.flatMap(c => Seq(
          min(col(c)).as(s"min_$c"),
          max(col(c)).as(s"max_$c"))): _*)

  /** Publish the stats table under a versioned pointer — the fourth
    * build-once/serve-across-sessions artifact (IVF, MinHash, tokenizer,
    * zone maps). A serving session loads k rows instead of re-scanning
    * the corpus.
    */
  def saveStats(stats: DataFrame, livePath: String): Unit =
    graft.operators.CacheRefresh.publishVersioned(
      stats.sparkSession, livePath) { dir =>
      stats.repartition(1).write.mode("overwrite").parquet(dir)
    }

  def loadStats(spark: SparkSession, livePath: String): DataFrame =
    spark.read.parquet(
      graft.operators.CacheRefresh.resolveLive(spark, livePath))

  /** The surviving file list for a conjunction of range predicates:
    * a file is kept iff EVERY predicate's interval overlaps the file's
    * [min, max] zone. Null zones (all-null file) fail the overlap and
    * prune — see the NULL contract above.
    */
  def surviving(stats: DataFrame, ranges: Seq[ColRange]): Seq[String] = {
    val keep = ranges
      .map(r => col(s"max_${r.col}") >= r.lo && col(s"min_${r.col}") <= r.hi)
      .reduce(_ && _)
    stats.filter(keep).select(col("file"))
      .collect().map(_.getString(0)).sorted.toIndexedSeq
  }

  /** Predicate column for `ranges` — re-applied to the pruned read so
    * zone maps only ever prune, never decide.
    */
  def rangePredicate(ranges: Seq[ColRange]): Column =
    ranges.map(r => col(r.col) >= r.lo && col(r.col) <= r.hi)
      .reduce(_ && _)

  final case class PruneReport(filesTotal: Long, filesKept: Long)

  /** Read only the files whose zones overlap `ranges`, with the exact
    * predicate re-applied. Returns the frame plus the prune accounting
    * (how many of the layout's files were skipped without a task).
    * An empty survivor set short-circuits to an empty frame with the
    * layout's schema — `parquet()` with zero paths is an error.
    */
  def prunedRead(spark: SparkSession, dataDir: String, stats: DataFrame,
      ranges: Seq[ColRange]): (DataFrame, PruneReport) = {
    val total = stats.count()
    val files = surviving(stats, ranges)
    val df =
      if (files.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          spark.read.parquet(dataDir).schema)
      else spark.read.parquet(files: _*)
    (df.filter(rangePredicate(ranges)), PruneReport(total, files.length.toLong))
  }
}
