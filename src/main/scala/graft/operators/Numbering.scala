package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed global numbering / running totals in sort order.
  *
  * The reference assigns ST ids in definition order (sql/seqdef.sql:655-730)
  * and renders cumulative growth curves (sql/isolatedb.sql:160). The naive
  * Spark expression for both is a `Window.orderBy` without `partitionBy` —
  * a single-partition global sort that pulls the whole input through one
  * task. These helpers implement the scalable two-phase shape instead:
  *
  *   1. range-shuffle on the sort key + sort within partitions;
  *   2. one tiny job collecting per-partition totals → exclusive prefix
  *      offsets (one long per partition, broadcast);
  *   3. a narrow per-partition pass adding offset + running value.
  *
  * Wall-clock = one range shuffle + two linear passes over the shuffle
  * files; no stage ever sees more than one partition's rows.
  */
object Numbering {

  /** Dense 1-based ids in ascending `sortCol` order, as column `idName`.
    * `sortCol` values should be unique (ties get an arbitrary stable-per-run
    * sub-order, like the reference's insertion order would).
    */
  def numberBySort(df: DataFrame, sortCol: String, idName: String): DataFrame =
    runningBySort(df, sortCol, lit(1L), idName)

  /** Running total of `value` (long) in ascending `sortCol` order, appended
    * as column `outName`. Equivalent to
    * `sum(value) over (order by sortCol rows unbounded preceding)` without
    * the single-partition window.
    */
  def runningBySort(
      df: DataFrame,
      sortCol: String,
      value: Column,
      outName: String): DataFrame =
    runningBySort(df, Seq(col(sortCol)), value, outName)

  /** [[runningBySort]] over a COMPOSITE sort order — `sortCols` may carry
    * sort directions (`col.desc`), so "running token total in descending
    * quality order, ties by id" is the same two-phase shape: one range
    * shuffle on the full ordering, never a single-partition window.
    */
  def runningBySort(
      df: DataFrame,
      sortCols: Seq[Column],
      value: Column,
      outName: String): DataFrame = {
    val spark = df.sparkSession
    // NULL values count as 0 (the running total skips them) — the narrow
    // passes below read the long with getLong, which cannot express NULL
    val withV = df.withColumn("__v", coalesce(value.cast("long"), lit(0L)))
    val sorted = withV
      .repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val vIdx = sorted.schema.fieldIndex("__v")
    val rdd = sorted.rdd
    // pass 1: per-partition totals (tiny: one long per partition)
    val totals = rdd
      .mapPartitionsWithIndex { case (pid, it) =>
        var s = 0L; it.foreach(r => s += r.getLong(vIdx))
        Iterator.single(pid -> s)
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = totals.scanLeft(0L)(_ + _) // exclusive prefix sums
    val bc = spark.sparkContext.broadcast(offsets)
    // pass 2: narrow running pass seeded with the partition's offset
    val out = rdd.mapPartitionsWithIndex { case (pid, it) =>
      var acc = bc.value(pid)
      it.map { r => acc += r.getLong(vIdx); Row.fromSeq(r.toSeq :+ acc) }
    }
    val schema = sorted.schema.add(outName, LongType, nullable = false)
    spark.createDataFrame(out, schema).drop("__v")
  }

  /** Running MAX of `value` (long) in ascending `sortCols` order, appended
    * as column `outName` — `max(value) over (order by ... rows unbounded
    * preceding)` (inclusive of the current row) without the
    * single-partition window. Same two-phase shape as [[runningBySort]]:
    * per-partition maxima (one long each) prefix-combine on the driver and
    * seed a narrow running pass. NULL values are ignored by the max (they
    * never raise it); rows before any non-NULL value carry Long.MinValue.
    */
  def runningMaxBySort(
      df: DataFrame,
      sortCols: Seq[Column],
      value: Column,
      outName: String): DataFrame = {
    val spark = df.sparkSession
    val withV = df.withColumn("__v", coalesce(value.cast("long"), lit(Long.MinValue)))
    val sorted = withV
      .repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val vIdx = sorted.schema.fieldIndex("__v")
    val rdd = sorted.rdd
    // pass 1: per-partition maxima (tiny: one long per partition)
    val maxima = rdd
      .mapPartitionsWithIndex { case (pid, it) =>
        var m = Long.MinValue; it.foreach(r => m = math.max(m, r.getLong(vIdx)))
        Iterator.single(pid -> m)
      }
      .collect().sortBy(_._1).map(_._2)
    // exclusive prefix maxima: seed for partition i = max of partitions < i
    val seeds = maxima.scanLeft(Long.MinValue)(math.max)
    val bc = spark.sparkContext.broadcast(seeds)
    val out = rdd.mapPartitionsWithIndex { case (pid, it) =>
      var acc = bc.value(pid)
      it.map { r =>
        acc = math.max(acc, r.getLong(vIdx))
        Row.fromSeq(r.toSeq :+ acc)
      }
    }
    val schema = sorted.schema.add(outName, LongType, nullable = false)
    spark.createDataFrame(out, schema).drop("__v")
  }
}
