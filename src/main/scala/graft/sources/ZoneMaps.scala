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
  * predicates (NULL never satisfies BETWEEN); IS NULL / IS NOT NULL
  * predicates must never route through VALUE zones — they prune
  * through the per-file null counts instead ([[NullRange]]).
  */
object ZoneMaps {

  /** One per-column pruning interval. */
  sealed trait ZoneRange { def col: String }

  /** Inclusive numeric interval (longs; DATE columns prune as
    * epoch-day longs — the builder stores date zones that way).
    */
  final case class ColRange(col: String, lo: Long, hi: Long)
    extends ZoneRange

  /** Case-folded text interval over upper-cased zones
    * (`min_uc_`/`max_uc_` stats columns — the reference's
    * UPPER-expression index, sql/isolatedb.sql:984, at file
    * granularity). Ci equality is the point interval [V, V]
    * (`hiExclusive = false`); a ci prefix P is the HALF-OPEN range
    * [P, succ(P)) with succ = last-ASCII-char increment
    * (`hiExclusive = true`) — a closed `P + '￿'` bound would be
    * UNSOUND in UTF-8 byte order (an astral character right after the
    * prefix encodes above EF BF BF), so prefix pruning only compiles
    * for ASCII prefixes where the successor is exact.
    */
  final case class TextRange(col: String, lo: String, hi: String,
    hiExclusive: Boolean = false) extends ZoneRange

  /** IS NULL / IS NOT NULL pruning unit over the per-file null counts
    * (`nulls_<col>` in the stats table): IS NULL keeps files with at
    * least one null, IS NOT NULL keeps files that are not all-null —
    * the one clause class value zones structurally cannot serve (the
    * reference's `field IS NULL` grammar, the literal "null" operand).
    * A file whose null count is unknown (older artifact) is KEPT, per
    * the prune-never-decide contract.
    */
  final case class NullRange(col: String, wantNull: Boolean)
    extends ZoneRange

  /** The per-column stat aggregates, typed off the frame's schema:
    * strings zone as (min, max) of UPPER(value) under `min_uc_`/
    * `max_uc_` (self-describing in the artifact — the serving side
    * routes text clauses only at columns published that way); DATE
    * columns as epoch-day longs under the plain `min_`/`max_` names;
    * everything else as raw (min, max).
    */
  private def statsAggs(df: DataFrame, cols: Seq[String]): Seq[Column] =
    cols.flatMap { c =>
      val typed = df.schema(c).dataType match {
        case org.apache.spark.sql.types.StringType => Seq(
          min(upper(col(c))).as(s"min_uc_$c"),
          max(upper(col(c))).as(s"max_uc_$c"))
        case org.apache.spark.sql.types.DateType => Seq(
          min(datediff(col(c), to_date(lit("1970-01-01"))))
            .cast("long").as(s"min_$c"),
          max(datediff(col(c), to_date(lit("1970-01-01"))))
            .cast("long").as(s"max_$c"))
        case _ => Seq(
          min(col(c)).as(s"min_$c"),
          max(col(c)).as(s"max_$c"))
      }
      // per-file null count for every indexed column: serves the
      // IS NULL / IS NOT NULL clause class ([[NullRange]]) that value
      // zones cannot — a null never overlaps a value interval
      typed :+ count(when(col(c).isNull, lit(1))).as(s"nulls_$c")
    }

  /** Build the per-file stats table for `cols` over a parquet layout —
    * one scan, one tiny aggregation keyed on the file path.
    */
  def buildStats(spark: SparkSession, dataDir: String,
      cols: Seq[String]): DataFrame = {
    val src = spark.read.parquet(dataDir)
    src.groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("rows"), statsAggs(src, cols): _*)
  }

  /** Publish the stats table under a versioned pointer — the fourth
    * build-once/serve-across-sessions artifact (IVF, MinHash, tokenizer,
    * zone maps). A serving session loads k rows instead of re-scanning
    * the corpus. `numFiles` bounds the artifact's own file count: one
    * file is right for the one-row-per-file zone table, but a BLOOM
    * table at 800k corpus files is tens of millions of word rows — as
    * a single file every decision scan is serial (the 800k-file probe
    * measured 2.7 s single-file vs sub-second partitioned).
    */
  def saveStats(stats: DataFrame, livePath: String,
      numFiles: Int = 1, marker: Option[Long] = None): Unit =
    graft.operators.CacheRefresh.publishVersioned(
      stats.sparkSession, livePath) { dir =>
      stats.repartition(numFiles).write.mode("overwrite").parquet(dir)
      // exactly-once batch marker for STREAM-maintained stats
      // (CacheStream contract): rides inside the version, flips with
      // the one pointer rename
      marker.foreach(b => graft.streaming.CacheStream
        .writeBatchMarker(stats.sparkSession, dir, b))
    }

  /** Publish a BLOOM table clustered by `word_idx` — the layout
    * discipline that keeps the DECISION sub-second at 800k files: a
    * probe touches only a few driver-known word slots, and with the
    * artifact range-partitioned + sorted on word_idx the probe's isin
    * pre-filter prunes at file level (per-file word_idx ranges) and
    * row-group level (parquet stats) instead of scanning every word
    * row. Measured at the 800k-file probe: 2.7 s single-file → 1.2 s
    * partitioned-unclustered → sub-second clustered.
    */
  def saveBloomStats(bloom: DataFrame, livePath: String,
      numFiles: Int = 1, marker: Option[Long] = None): Unit =
    graft.operators.CacheRefresh.publishVersioned(
      bloom.sparkSession, livePath) { dir =>
      bloom.repartitionByRange(numFiles, col("word_idx"))
        .sortWithinPartitions(col("word_idx"), col("file"))
        .write.mode("overwrite").parquet(dir)
      marker.foreach(b => graft.streaming.CacheStream
        .writeBatchMarker(bloom.sparkSession, dir, b))
    }

  def loadStats(spark: SparkSession, livePath: String): DataFrame =
    spark.read.parquet(
      graft.operators.CacheRefresh.resolveLive(spark, livePath))

  /** The surviving file list for a conjunction of range predicates:
    * a file is kept iff EVERY predicate's interval overlaps the file's
    * [min, max] zone. Null zones (all-null file) fail the overlap and
    * prune — see the NULL contract above.
    */
  def surviving(stats: DataFrame, ranges: Seq[ZoneRange]): Seq[String] = {
    val keep = ranges.map(zoneOverlap).reduce(_ && _)
    stats.filter(keep).select(col("file"))
      .collect().map(_.getString(0)).sorted.toIndexedSeq
  }

  /** The stats-row overlap test for one interval. Zone columns and the
    * probe literal compare in the SAME Spark string/long order the
    * zones were aggregated in, so the test is ordering-consistent by
    * construction.
    */
  private def zoneOverlap(r: ZoneRange): Column = r match {
    case ColRange(c, lo, hi) =>
      col(s"max_$c") >= lo && col(s"min_$c") <= hi
    case TextRange(c, lo, hi, hiEx) =>
      col(s"max_uc_$c") >= lit(lo) &&
        (if (hiEx) col(s"min_uc_$c") < lit(hi)
         else col(s"min_uc_$c") <= lit(hi))
    // coalesce(true): an unknown null count KEEPS the file (older
    // artifact rows migrated without the nulls_ column) — prune never
    // decides
    case NullRange(c, true) =>
      coalesce(col(s"nulls_$c") > 0, lit(true))
    case NullRange(c, false) =>
      coalesce(col(s"nulls_$c") < col("rows"), lit(true))
  }

  /** Predicate column for `ranges` — re-applied to the pruned read so
    * zone maps only ever prune, never decide.
    */
  def rangePredicate(ranges: Seq[ZoneRange]): Column =
    ranges.map {
      case ColRange(c, lo, hi) => col(c) >= lo && col(c) <= hi
      case TextRange(c, lo, hi, hiEx) =>
        upper(col(c)) >= lit(lo) &&
          (if (hiEx) upper(col(c)) < lit(hi) else upper(col(c)) <= lit(hi))
      case NullRange(c, wantNull) =>
        if (wantNull) col(c).isNull else col(c).isNotNull
    }.reduce(_ && _)

  final case class PruneReport(filesTotal: Long, filesKept: Long)

  /** Incremental stats maintenance — the append discipline the persisted
    * IVF index uses, applied to the skipping layer: a refresh after new
    * files land scans ONLY the files absent from the published stats
    * (at 100 TB an append adds a handful of files; rescanning the other
    * 800k to refresh metadata would dwarf the ingest itself) and
    * republishes the union under the next versioned pointer. Stats rows
    * are per-file and independent, so append ≡ full rebuild exactly
    * (ZoneMapsSpec pins row equality).
    */
  def appendStats(spark: SparkSession, dataDir: String, livePath: String,
      cols: Seq[String], marker: Option[Long] = None): Unit = {
    val current = loadStats(spark, livePath)
    // fresh = listing ∖ published stats, as an ANTI-JOIN against the
    // stats table: only the DELTA's names come back to the driver
    // (bounded by the ingest batch), never the known set — the r12
    // VERDICT #6 item. The listing itself (`inputFiles`) is already
    // driver-resident in Spark's own InMemoryFileIndex, so shipping it
    // out as the join's small side adds no driver state.
    import spark.implicits._
    val all = spark.read.parquet(dataDir).inputFiles
    val fresh = all.toIndexedSeq.toDF("file")
      .join(current.select(col("file")), Seq("file"), "left_anti")
      .as[String].collect()
    val merged =
      if (fresh.isEmpty) current
      else {
        val freshDf = spark.read.parquet(fresh.toIndexedSeq: _*)
        val freshStats = freshDf.groupBy(input_file_name().as("file"))
          .agg(count(lit(1)).as("rows"), statsAggs(freshDf, cols): _*)
        // schema drift: an artifact published by an OLDER statsAggs
        // (pre-`nulls_` columns, raw-cased string zones under `min_`/
        // `max_`, DATE-typed date zones) cannot be merged row-wise —
        // a strict union throws, and a lenient
        // unionByName(allowMissingColumns = true) would be WORSE than
        // the error: migrated rows would carry null `min_uc_` zones,
        // which the TextRange overlap test reads as all-null files and
        // silently prunes — lost rows. The per-file rows are
        // independent, so the sound migration is a one-time full
        // rebuild under the current schema; later appends are
        // delta-only again.
        def shape(df: DataFrame) =
          df.schema.map(f => f.name -> f.dataType).toMap
        if (shape(current) != shape(freshStats))
          buildStats(spark, dataDir, cols)
        else current.unionByName(freshStats)
      }
    saveStats(merged, livePath, marker = marker)
  }

  /** Incremental Bloom maintenance — the [[appendStats]] discipline for
    * the point-predicate artifact: fresh files (listing ∖ published
    * file set, anti-joined so only the delta's names reach the driver)
    * get their sparse word rows built with the ARTIFACT's own (m_bits,
    * k) — mixing constants would corrupt probe positions, so they are
    * read off the published table, never recomputed — and the union
    * republishes under the next versioned pointer. Per-file rows are
    * independent, so append ≡ full rebuild at equal constants
    * (ZoneMapsSpec pins it). A no-op delta returns without
    * republishing.
    */
  def appendBloomStats(spark: SparkSession, dataDir: String,
      livePath: String, keyCol: String,
      marker: Option[Long] = None): Unit = {
    val current = loadStats(spark, livePath)
    val head = current.select(col("m_bits"), col("k")).limit(1).collect()
    if (head.isEmpty) {
      saveBloomStats(buildBloomStats(spark, dataDir, keyCol), livePath,
        marker = marker)
      return
    }
    import spark.implicits._
    val all = spark.read.parquet(dataDir).inputFiles
    val fresh = all.toIndexedSeq.toDF("file")
      .join(current.select(col("file")).distinct(), Seq("file"), "left_anti")
      .as[String].collect()
    // a no-op delta skips the republish UNLESS a batch marker must be
    // recorded (the stream-maintenance contract needs the applied id
    // even when a replayed batch contributed no new files)
    if (fresh.isEmpty && marker.isEmpty) return
    // the delta folds exactly as the artifact did — the `folded` flag
    // is as much a build constant as (m_bits, k)
    val folded = bloomFolded(current)
    val keyExpr = if (folded) upper(col(keyCol)) else col(keyCol)
    val merged =
      if (fresh.isEmpty) current
      else current.unionByName(
        bloomStatsOf(
          spark.read.parquet(fresh.toIndexedSeq: _*)
            .select(input_file_name().as("file"), keyExpr.as("__key")),
          head(0).getLong(0), head(0).getInt(1), folded = folded),
        allowMissingColumns = true)
    saveBloomStats(merged, livePath, marker = marker)
  }

  // ---- per-file Bloom filters: point-predicate skipping ----
  //
  // Zone maps prune RANGE predicates; an equality on a high-cardinality
  // column that is scattered across the value range (doc_id under a
  // layout ordered by something else) overlaps every file's [min, max]
  // and zone maps keep everything. A small per-file Bloom filter over
  // that column prunes point predicates instead — the second half of
  // the Delta/Iceberg skipping pair. Representation is SPARSE PACKED:
  // (file, word_idx, word) rows keep only non-zero 32-bit words of each
  // file's bit array, built with one distributed aggregation keyed on
  // (file, word_idx) — no driver-side bit packing, no dense mBits/8
  // bytes per file. Probes reuse the md5 scheme of operators/Bloom
  // (cross-engine-reproducible), so the filter is deterministic.

  /** k md5-derived probe positions for one key value — the Column form
    * (build side), identical arithmetic to [[bloomPositionsLocal]].
    */
  private def bloomProbe(i: Int, key: Column, mBits: Long): Column =
    pmod(conv(substring(md5(
      concat(lit(s"$i|"), key.cast("string"))), 1, 15), 16, 10).cast("long"),
      lit(mBits))

  /** The same k positions computed driver-side for the pruning decision
    * — one md5 per (probe, key), no Spark job.
    */
  private[sources] def bloomPositionsLocal(key: String, mBits: Long,
      k: Int): Seq[Long] =
    (0 until k).map { i =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i|$key".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val v = java.lang.Long.parseLong(hex, 16)
      ((v % mBits) + mBits) % mBits
    }

  /** Sentinel: size the filter from the corpus itself ([[autoBits]]). */
  val AutoBits: Long = -1L

  /** Auto-sized bit width: ~10 bits per expected key per FILE, rounded
    * up to a power of two, floored at 2^13. A fixture-tuned constant is
    * the default that silently dies at scale — the first 100× probe of
    * this operator saturated an 8192-bit filter with 31k keys/file
    * (every bit set → zero pruning, the AutoNlist lesson verbatim); at
    * 10 bits/key the false-positive rate stays ≈1.2% per probe set
    * regardless of corpus size.
    */
  def autoBits(rows: Long, nFiles: Long): Long = {
    val want = math.max(1L << 13, 10L * rows / math.max(nFiles, 1L))
    java.lang.Long.highestOneBit(want - 1) << 1
  }

  /** Build the per-file Bloom table for `keyCol`: one distributed
    * aggregation → (file, word_idx, word) sparse packed rows. The
    * resolved (m_bits, k) ride IN the table — a serving session probing
    * with different constants than the build would produce silent FALSE
    * NEGATIVES (wrong bit positions), so the parameters are part of the
    * artifact, never a caller convention.
    */
  def buildBloomStats(spark: SparkSession, dataDir: String, keyCol: String,
      mBits: Long = AutoBits, k: Int = 3): DataFrame = {
    val src = spark.read.parquet(dataDir)
    val m =
      if (mBits == AutoBits) autoBits(src.count(), src.inputFiles.length.toLong)
      else mBits
    // STRING key columns build CASE-FOLDED (the reference's point
    // predicates on text are case-insensitive, Constants.pm:242 — a
    // raw-cased Bloom probed with a ci key would be a FALSE NEGATIVE,
    // lost rows); the fold is part of the artifact (`folded` column),
    // never a caller convention, same contract as (m_bits, k)
    val keyIsText =
      src.schema(keyCol).dataType == org.apache.spark.sql.types.StringType
    val keyExpr = if (keyIsText) upper(col(keyCol)) else col(keyCol)
    bloomStatsOf(src.select(input_file_name().as("file"),
      keyExpr.as("__key")), m, k, folded = keyIsText)
  }

  /** The Bloom aggregation over explicit (file, __key) rows — the
    * [[buildBloomStats]] body, also driven directly by the prune-
    * decision scale probes (which synthesize an 800k-file stats table
    * without writing 800k parquet files: the DECISION consults only the
    * stats artifacts, never the files).
    */
  private[graft] def bloomStatsOf(rows: DataFrame, mBits: Long,
      k: Int, folded: Boolean = false): DataFrame =
    rows
      .select(col("file"),
        explode(array((0 until k).map(i =>
          bloomProbe(i, col("__key"), mBits)): _*)).as("pos"))
      .groupBy(col("file"), floor(col("pos") / 32).cast("int").as("word_idx"))
      // 2^(pos mod 32) via pow — exact in double up to 2^31, the
      // operators/Bloom mask idiom (shiftleft takes only literal shifts)
      .agg(bit_or(pow(lit(2.0), pmod(col("pos"), lit(32L)).cast("double"))
        .cast("long")).as("word"))
      .withColumn("m_bits", lit(mBits))
      .withColumn("k", lit(k))
      .withColumn("folded", lit(folded))

  /** Whether a published Bloom artifact was built over case-folded
    * keys. Artifacts predating the column read as NOT folded.
    */
  def bloomFolded(bloom: DataFrame): Boolean =
    bloom.columns.contains("folded") &&
      bloom.select(col("folded")).limit(1).collect()
        .headOption.exists(r => !r.isNullAt(0) && r.getBoolean(0))

  /** Files that might contain ANY of `keys` — a file survives iff for at
    * least one key EVERY probe bit is set in its sparse word map.
    * The decision runs DISTRIBUTED: the probe set (a few (key, word_idx,
    * mask) rows, driver-computed) broadcast-joins the bloom table, a
    * per-(file, key) match count picks full-probe hits, and only the
    * surviving FILE NAMES collect — unlike the zone stats (one row per
    * file), the bloom table is files × set-words rows, which at 100 TB
    * (~800k files × ~300k words at 10 bits/key) is nowhere near
    * driver-sized. Probe constants come from the table itself (see
    * [[buildBloomStats]]).
    */
  def survivingBloom(bloom: DataFrame, keys: Seq[String]): Seq[String] = {
    // ONE constants collect: the decision path is latency-sensitive at
    // 800k files (see the prune_decision probes) — m_bits, k and the
    // fold flag ride in the same row rather than two tiny jobs
    val hasFold = bloom.columns.contains("folded")
    val constCols = Seq(col("m_bits"), col("k")) ++
      (if (hasFold) Seq(col("folded")) else Nil)
    val head = bloom.select(constCols: _*).limit(1).collect()
    if (head.isEmpty || keys.isEmpty) return Seq.empty
    val mBits = head(0).getLong(0)
    val k = head(0).getInt(1)
    val folded = hasFold && !head(0).isNullAt(2) && head(0).getBoolean(2)
    // the fold lives in the artifact: probes against a case-folded
    // Bloom fold HERE, the single place build and probe can't diverge
    val useKeys = if (folded) keys.map(_.toUpperCase) else keys
    val spark = bloom.sparkSession
    import spark.implicits._
    val probes = useKeys.zipWithIndex.flatMap { case (key, ki) =>
      bloomPositionsLocal(key, mBits, k).map(p =>
        (ki, (p >> 5).toInt, 1L << (p & 31).toInt))
    }.distinct
    val probeRows = probes.toDF("key_id", "word_idx", "mask")
    // the probe set's word_idx values are driver-known and few (≤ keys·k
    // of the mBits/32 slots) — pre-filtering the bloom table on them is
    // a pushable scan predicate that drops ~(1 − |idxs|/slots) of the
    // word rows before the join ever sees them; at 800k files this is
    // the difference between scanning the whole tens-of-millions-row
    // artifact and touching only the probed slots
    val idxs = probes.map(_._2).distinct
    bloom.filter(col("word_idx").isin(idxs: _*))
      .join(broadcast(probeRows), Seq("word_idx"))
      .filter(col("word").bitwiseAND(col("mask")) =!= 0L)
      // a key's k probes can share a word_idx slot — count DISTINCT
      // satisfied positions (mask identifies the bit), not joined rows
      .groupBy(col("file"), col("key_id"))
      .agg(countDistinct(col("word_idx"), col("mask")).as("hit"))
      .join(broadcast(probeRows.groupBy(col("key_id"))
        .agg(count(lit(1)).as("need"))), Seq("key_id"))
      .filter(col("hit") === col("need"))
      .select(col("file")).distinct()
      .as[String].collect().sorted.toIndexedSeq
  }

  /** Read only the files whose Bloom filter might contain one of `keys`,
    * with the exact IN predicate re-applied — no false negatives by
    * Bloom's one-sided error, so pruning can only skip true-negative
    * files.
    */
  def bloomPrunedRead(spark: SparkSession, dataDir: String,
      bloom: DataFrame, keyCol: String, keys: Seq[Long]):
      (DataFrame, PruneReport) = {
    val total = bloom.select(col("file")).distinct().count()
    val files = survivingBloom(bloom, keys.map(_.toString))
    val df =
      if (files.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          spark.read.parquet(dataDir).schema)
      else spark.read.parquet(files: _*)
    (df.filter(col(keyCol).isin(keys: _*)),
      PruneReport(total, files.length.toLong))
  }

  /** Read only the files whose zones overlap `ranges`, with the exact
    * predicate re-applied. Returns the frame plus the prune accounting
    * (how many of the layout's files were skipped without a task).
    * An empty survivor set short-circuits to an empty frame with the
    * layout's schema — `parquet()` with zero paths is an error.
    */
  def prunedRead(spark: SparkSession, dataDir: String, stats: DataFrame,
      ranges: Seq[ZoneRange]): (DataFrame, PruneReport) = {
    val total = stats.count()
    val files = surviving(stats, ranges)
    (filesRead(spark, dataDir, files).filter(rangePredicate(ranges)),
      PruneReport(total, files.length.toLong))
  }

  private def filesRead(spark: SparkSession, dataDir: String,
      files: Seq[String]): DataFrame =
    if (files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        spark.read.parquet(dataDir).schema)
    else spark.read.parquet(files: _*)

  // ---- default-read-path integration (QueryCompiler routing) ----

  /** Registration of a skipping-indexed parquet layout — what a
    * [[graft.api.QueryCompiler.Catalog]] carries so compiled F1
    * range/equality clauses prune the file LIST before Spark schedules
    * a task. Which columns the zone maps index is read off the
    * published stats table itself (its `min_<col>`/`max_<col>`
    * schema), so the registration is just the artifact pointers; the
    * Bloom artifact does not record its key column, so `bloomCol`
    * names it here (build and registration must agree, same contract
    * as [[buildBloomStats]]'s probe constants).
    *
    * Contract: `dataDir` must be the layout the catalog's entity
    * table reads — the pruned scan REPLACES that scan, so a catalog
    * whose entities frame is anything other than a plain read of
    * `dataDir` must not register skipping.
    */
  final case class Layout(dataDir: String,
    statsLive: Option[String] = None,
    bloomLive: Option[String] = None,
    bloomCol: Option[String] = None)

  /** The published stats table at `livePath`, or None when nothing has
    * been published yet — the transparent-fallback probe: a missing
    * pointer AND missing directory mean "no skipping", never an error
    * (the query must compile identically before the stats job has ever
    * run).
    */
  def loadStatsIfPresent(spark: SparkSession,
      livePath: String): Option[DataFrame] = {
    val live = graft.operators.CacheRefresh.resolveLive(spark, livePath)
    // memo keyed on the RESOLVED version dir: a compile-time consult
    // must not pay footer reads on every query, and a republish flips
    // the pointer to a new dir so the stale entry is simply never hit
    // again (swept with its session, the Tables.load discipline)
    val key = s"${graft.Tables.sessionKey(spark)}|$live"
    // the owning session rides IN the value so the sweep also evicts
    // None entries (not-yet-published probes) — keyed on the frame
    // alone they would accumulate forever across stopped sessions
    statsCache.entrySet.removeIf(e =>
      e.getValue._1.sparkContext.isStopped)
    // superseded-version eviction: a STREAM-maintained artifact
    // republishes once per micro-batch, and with the memo keyed on the
    // resolved `livePath.vN` a long-running session would hold one dead
    // entry per version — drop this session's older versions of the
    // SAME artifact when a newer resolution lands
    if (live != livePath) {
      val prefix = s"${graft.Tables.sessionKey(spark)}|$livePath.v"
      statsCache.keySet.removeIf(k => k != key && k.startsWith(prefix))
    }
    statsCache.computeIfAbsent(key, _ => {
      val p = new org.apache.hadoop.fs.Path(live)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      (spark, if (fs.exists(p)) Some(spark.read.parquet(live)) else None)
    })._2
  }

  private val statsCache = new java.util.concurrent.ConcurrentHashMap[
    String, (SparkSession, Option[DataFrame])]()

  /** How many memoized versions of `livePath` this session holds —
    * the superseded-version eviction's observable (ZoneMapsSpec pins
    * it at ≤ 1; the artifact-specific prefix keeps the count immune to
    * parallel suites sharing the JVM-wide cache).
    */
  private[graft] def cachedVersionsOf(spark: SparkSession,
      livePath: String): Int = {
    val prefix = s"${graft.Tables.sessionKey(spark)}|$livePath.v"
    var n = 0
    statsCache.keySet.forEach(k => if (k.startsWith(prefix)) n += 1)
    n
  }

  /** File-list pruning for a compiled conjunction of range and point
    * predicates — the [[graft.api.QueryCompiler]] entry point. Returns
    * None (caller falls back to the unpruned scan) when no artifact is
    * published or no clause touches an indexed column; otherwise the
    * pruned frame (schema of `dataDir`, exact predicates NOT applied —
    * the compiler re-applies every clause, so pruning only ever skips
    * files, never decides rows) plus the prune accounting.
    *
    * Survivor algebra: the clause families are AND'd, so the kept set
    * is the INTERSECTION of the zone survivors (ranges, themselves
    * AND'd inside [[surviving]]) and each point key's Bloom survivors.
    * Ranges on columns the stats table does not index are ignored —
    * sound under AND (pruning with a predicate subset only keeps more
    * files).
    */
  /** One prunable unit of an OR-combined clause family: a range on an
    * indexed column, or an equality key on the Bloom column.
    */
  type OrUnit = Either[ZoneRange, BloomKey]

  /** One Bloom point probe: the key string (longs in their canonical
    * decimal form) plus whether it came from a CASE-INSENSITIVE text
    * clause. A ci key is servable only by a case-folded artifact —
    * probing a raw-cased Bloom with it would be a false negative
    * (lost rows), so unservable ci keys are dropped from AND pruning
    * and decline ANY/OR pruning entirely.
    */
  final case class BloomKey(key: String, ci: Boolean = false)

  /** `andKeys` are AND-composed equality probes (a file must possibly
    * contain EVERY key — per-key survivor intersection); `anyKeys` is
    * an IN-list/pasted-id-list membership probe (a file survives if it
    * may contain ANY of the keys — one Bloom pass, the semi-join S7
    * shape); `orGroups` are OR-combined clause families, each an
    * AND-composed constraint: a group's keep set is the UNION of its
    * units' survivors and the groups' keep sets INTERSECT. A group
    * contributes NOTHING unless EVERY one of its units is backed by a
    * published artifact (an unsupported OR arm could match any file,
    * so partial OR pruning would lose rows) — but an unsupported group
    * only drops ITSELF: under AND a constraint subset keeps more
    * files, never fewer. An over-wide ANY list stops pruning
    * ([[MaxAnyKeys]]): at some width the probe cost exceeds the
    * skipped tasks, and the semi join downstream is already the right
    * plan.
    */
  def pruneForClauses(spark: SparkSession, layout: Layout,
      ranges: Seq[ZoneRange], andKeys: Seq[BloomKey],
      anyKeys: Option[Seq[BloomKey]] = None,
      orGroups: Seq[Seq[OrUnit]] = Nil):
      Option[(DataFrame, PruneReport)] = {
    val anyK = anyKeys.filter(ks => ks.nonEmpty && ks.size <= MaxAnyKeys)
    val orGs = orGroups.filter(_.nonEmpty)
    // nothing to prune WITH → fall back before touching any artifact
    // (the common no-indexed-clause compile must not pay footer reads)
    if (ranges.isEmpty && andKeys.isEmpty && anyK.isEmpty && orGs.isEmpty)
      return None
    val orRanges = orGs.flatten.collect { case Left(r) => r }
    val orKeys = orGs.flatten.collect { case Right(k) => k }
    val stats =
      if (ranges.nonEmpty || orRanges.nonEmpty)
        layout.statsLive.flatMap(loadStatsIfPresent(spark, _))
      else None
    val bloom =
      if (andKeys.nonEmpty || anyK.nonEmpty || orKeys.nonEmpty)
        layout.bloomLive.flatMap(loadStatsIfPresent(spark, _))
      else None
    def indexed(r: ZoneRange): Boolean = r match {
      case _: ColRange =>
        stats.exists(_.columns.contains(s"min_${r.col}"))
      case _: TextRange =>
        stats.exists(_.columns.contains(s"min_uc_${r.col}"))
      case _: NullRange =>
        stats.exists(_.columns.contains(s"nulls_${r.col}"))
    }
    // ci keys need the case-folded artifact (see [[BloomKey]])
    lazy val folded = bloom.exists(bloomFolded)
    def servable(k: BloomKey): Boolean = !k.ci || folded
    val idxRanges = ranges.filter(indexed)
    val zoneKeep = stats.filter(_ => idxRanges.nonEmpty)
      .map(st => surviving(st, idxRanges).toSet)
    val andServable =
      if (bloom.isEmpty) Nil else andKeys.filter(servable)
    val andKeep = bloom.filter(_ => andServable.nonEmpty).map(bl =>
      andServable.map(k => survivingBloom(bl, Seq(k.key)).toSet)
        .reduce(_ intersect _))
    // an ANY list is ONE composite constraint: a single unservable key
    // could match files the others would prune, so all-or-nothing
    val anyKeep = for (bl <- bloom; ks <- anyK if ks.forall(servable))
      yield survivingBloom(bl, ks.map(_.key)).toSet
    // per-group supported/used tracking feeds the crash-window check:
    // only artifacts that actually CONTRIBUTED a keep set need their
    // unknown files restored
    var statsUsed = zoneKeep.nonEmpty
    var bloomUsed = andKeep.nonEmpty || anyKeep.nonEmpty
    val groupKeeps: Seq[Set[String]] = orGs.flatMap { units =>
      val rs = units.collect { case Left(r) => r }
      val ks = units.collect { case Right(k) => k }
      val supported = rs.forall(indexed) &&
        (ks.isEmpty || (bloom.nonEmpty && ks.forall(servable)))
      if (!supported) None
      else {
        if (rs.nonEmpty) statsUsed = true
        if (ks.nonEmpty) bloomUsed = true
        Some(rs.flatMap(r => surviving(stats.get, Seq(r))).toSet ++
          (if (ks.isEmpty) Set.empty[String]
           else survivingBloom(bloom.get, ks.map(_.key)).toSet))
      }
    }
    val keeps = zoneKeep.toSeq ++ andKeep.toSeq ++ anyKeep.toSeq ++
      groupKeeps
    if (keeps.isEmpty) None
    else {
      // crash-window soundness: [[SkippingRegistry.appendFiles]] commits
      // data BEFORE refreshing stats, so a reader compiling in that
      // window — or after a crash between the write and the refresh —
      // sees layout files no consulted artifact knows. [[surviving]] /
      // [[survivingBloom]] can only keep files their artifact lists, so
      // unknown files must be restored HERE or the pruned read loses
      // their rows (prune never decides). Steady state pays the
      // directory listing (the same driver-resident InMemoryFileIndex
      // work the scan's own planning does) plus the per-artifact file
      // count: under the registry discipline artifacts are built from
      // listings of an append-only layout (artifact files ⊆ listing),
      // so count equality proves set equality, and the anti-join runs
      // only inside the rare mismatch window — returning just the
      // delta's names, never the known set.
      val listing = spark.read.parquet(layout.dataDir).inputFiles
      val consulted = (if (statsUsed) stats.toSeq else Nil) ++
        (if (bloomUsed) bloom.toSeq else Nil)
      val counts = consulted.map(_.select(col("file")).distinct().count())
      val unknown: Set[String] =
        if (counts.forall(_ == listing.length.toLong)) Set.empty
        else {
          import spark.implicits._
          val listDf = listing.toIndexedSeq.toDF("file")
          consulted.map(a =>
            listDf.join(a.select(col("file")).distinct(),
              Seq("file"), "left_anti").as[String].collect().toSet)
            .reduceOption(_ union _).getOrElse(Set.empty)
        }
      val kept = (keeps.reduce(_ intersect _) ++ unknown).toSeq.sorted
      val total = counts.headOption.getOrElse(0L)
      Some((filesRead(spark, layout.dataDir, kept),
        PruneReport(total, kept.length.toLong)))
    }
  }

  /** Widest IN-list the Bloom route will prune with — beyond this the
    * probe table itself stops being broadcast-trivial and the skipped
    * tasks no longer pay for the decision.
    */
  val MaxAnyKeys: Int = 256
}
