package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted ANN indexes — the 100 TB operational posture: an index is
  * built ONCE (a corpus-scale job), published as parquet, and served by
  * any number of later sessions that never touch the raw corpus. The
  * reference has the same lifecycle for its BLAST caches
  * (lib/BIGSdb/Offline/Blast.pm:247-330 creates and reuses on-disk
  * databases; Datastore.pm's temp tables are rename-swapped) — here the
  * index is two plain parquet tables, so every Spark capability
  * (pruning, broadcast, bucketing) applies to serving.
  *
  * Atomicity: BOTH index tables (centroids + assigned corpus) are
  * written under ONE versioned directory and flip with ONE pointer
  * rename ([[graft.operators.CacheRefresh.publishVersioned]]) — a
  * reader can never observe new centroids with an old assignment (a
  * torn index would silently mis-probe: cell ids are only meaningful
  * against the centroids they were assigned to). Refresh keeps the N-1
  * version alive plus the age grace, so in-flight queries survive a
  * rebuild.
  *
  * Fidelity: parquet stores the double arrays bit-exactly and the
  * scoring path is byte-for-byte [[Similarity.ivfScoreTopK]] — a loaded
  * index answers BIT-IDENTICALLY to the in-session build
  * (IndexStoreSpec pins it row-for-row, and the sim_ivf_persisted
  * CORRECTNESS row shares sim_ivf_ann's oracle).
  */
object IndexStore {

  /** Build and publish an IVF index for `corpus` under `livePath`.
    * The assigned table keeps the corpus partition count (it IS
    * corpus-sized); the centroid dimension collapses to one file.
    */
  def saveIvf(corpus: DataFrame, id: String, vec: String, nlist: Int,
      livePath: String,
      trained: Option[Seq[(Long, Seq[Double])]] = None,
      marker: Option[Long] = None): Unit = {
    // pin the centroid sample before deriving the assignment: `assigned`
    // embeds the centroids (broadcast array), so unpinned the corpus-
    // scale sample scan would execute twice inside one publish (ADVICE
    // r11) — same discipline as incrementalNearDup's pinned signatures
    val centroids = graft.operators.Pinning.pin(
      Similarity.ivfCentroids(corpus, id, vec, nlist, trained))
    val assigned = Similarity.ivfAssign(centroids, corpus, id, vec)
    try {
      graft.operators.CacheRefresh.publishVersioned(
        corpus.sparkSession, livePath) { dir =>
        centroids.repartition(1).write.mode("overwrite")
          .parquet(s"$dir/centroids")
        assigned.write.mode("overwrite").parquet(s"$dir/assigned")
        // a save that runs INSIDE a stream's foreachBatch (the
        // compaction step) must carry the batch marker forward: a
        // marker-less version after a marked append would reset the
        // replay guard and a redelivered batch would re-append
        marker.foreach(b => graft.streaming.CacheStream
          .writeBatchMarker(corpus.sparkSession, dir, b))
      }
    } finally graft.operators.Pinning.unpin(centroids)
  }

  /** Load the live (centroids, assigned) pair published by [[saveIvf]]. */
  def loadIvf(spark: SparkSession, livePath: String):
      (DataFrame, DataFrame) = {
    val live = graft.operators.CacheRefresh.resolveLive(spark, livePath)
    (spark.read.parquet(s"$live/centroids"),
      spark.read.parquet(s"$live/assigned"))
  }

  /** Serve top-k queries from the persisted index — no corpus access,
    * no index build: the per-session cost is two parquet reads. The
    * probe fan-out and scoring kernel are exactly the in-session path's.
    */
  def queryIvf(spark: SparkSession, livePath: String, queries: DataFrame,
      id: String, vec: String, k: Int, nprobe: Int): DataFrame = {
    val (centroids, assigned) = loadIvf(spark, livePath)
    Similarity.ivfScoreTopK(centroids, assigned, queries, id, vec, k,
      nprobe)
  }

  /** Build and publish a MinHash near-dup index: per-doc signatures plus
    * the capped (band, bucket) -> id-list bucket table — the base-side
    * frames [[Dedup.incrementalNearDup]] derives per call, written once.
    * Same one-pointer atomicity as the IVF store: a reader can never see
    * new signatures with an old bucket table (bucket keys hash signature
    * slices, so a torn pair would probe the wrong buckets).
    */
  def saveMinhash(base: DataFrame, id: String, text: String,
      shingleN: Int, k: Int, bands: Int, maxBucketSize: Int,
      livePath: String,
      hasher: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        Dedup.shingleHashes): Unit = {
    // pin the signatures before deriving the bucket table: unpinned, the
    // corpus-scale shingle+minhash chain would execute twice inside one
    // publish (ADVICE r11) — the same pin incrementalNearDup holds
    val sigs = graft.operators.Pinning.pin(
      Dedup.minhashSigsOf(base, id, text, shingleN, k, hasher))
    val buckets = Dedup.minhashBucketsOf(sigs, bands, k / bands,
      maxBucketSize)
    try {
      graft.operators.CacheRefresh.publishVersioned(
        base.sparkSession, livePath) { dir =>
        sigs.write.mode("overwrite").parquet(s"$dir/sigs")
        buckets.write.mode("overwrite").parquet(s"$dir/buckets")
      }
    } finally graft.operators.Pinning.unpin(sigs)
  }

  /** Dedup an ingest batch against the persisted index — the daily-crawl
    * access pattern with ZERO base-corpus access: the delta pays its own
    * signature work plus one bucket-key join against the stored bucket
    * table; base signatures attach only for surviving candidates.
    * Parquet round-trips the BIGINT signatures exactly, so verdicts are
    * bit-identical to the in-session [[Dedup.incrementalNearDup]]
    * (IndexStoreSpec pins it; the dedup_index_persisted CORRECTNESS row
    * shares dedup_incremental's oracle).
    */
  /** Persist a learned BPE merge table — the third artifact family with
    * the build-once / serve-across-sessions lifecycle (IVF index, MinHash
    * index, tokenizer): training sweeps the corpus once
    * ([[Tokenizer.bpeTrain]]), the k-row merge table publishes under the
    * versioned pointer, and every later session (or executor-side encode
    * job) loads k rows instead of re-training. Strings and longs
    * round-trip parquet exactly, so a loaded table encodes
    * BIT-IDENTICALLY to the in-session merges (IndexStoreSpec pins it;
    * the tokenizer_persisted CORRECTNESS row shares text_bpe_encode's
    * oracle).
    */
  def saveTokenizer(spark: SparkSession, merges: Seq[Tokenizer.Merge],
      livePath: String): Unit =
    graft.operators.CacheRefresh.publishVersioned(spark, livePath) { dir =>
      spark.createDataFrame(merges).repartition(1)
        .write.mode("overwrite").parquet(dir)
    }

  /** Load the live merge table published by [[saveTokenizer]], in rank
    * order (greedy BPE application order is part of the artifact's
    * meaning — an unordered read would encode differently).
    */
  def loadTokenizer(spark: SparkSession,
      livePath: String): Seq[Tokenizer.Merge] = {
    val live = graft.operators.CacheRefresh.resolveLive(spark, livePath)
    spark.read.parquet(live)
      .select(col("rank"), col("pair"), col("merged"), col("n"))
      .collect()
      .map(r => Tokenizer.Merge(r.getInt(0), r.getString(1),
        r.getString(2), r.getLong(3)))
      .sortBy(_.rank).toIndexedSeq
  }

  def queryMinhash(spark: SparkSession, livePath: String, delta: DataFrame,
      id: String, text: String, shingleN: Int, k: Int, bands: Int,
      minEstJaccard: Double,
      hasher: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        Dedup.shingleHashes): DataFrame = {
    val live = graft.operators.CacheRefresh.resolveLive(spark, livePath)
    Dedup.nearDupVerdictsAgainst(
      spark.read.parquet(s"$live/sigs"),
      spark.read.parquet(s"$live/buckets"),
      delta, id, text, shingleN, k, bands, minEstJaccard, hasher)
  }

  /** Append an ingest batch INTO the persisted MinHash index — the
    * lifecycle step [[queryMinhash]] alone leaves open: an ingest gate
    * that only probes a frozen base never dedups a new document against
    * EARLIER ADMITTED ones. Only the delta pays the expensive text work
    * (shingle + minhash); the bucket table re-derives by re-banding ALL
    * stored signatures — array slicing over the index's own rows, no
    * corpus access — so the capped-bucket rule (buckets over
    * `maxBucketSize` drop entirely, the stop-shingle skip) re-applies
    * over the TRUE merged membership and the result is bit-identical to
    * a fresh [[saveMinhash]] over base ∪ delta (IndexStoreSpec pins it;
    * merging capped lists instead would silently resurrect dropped
    * buckets with partial membership — false-negative city). Parameters
    * must match the build's — same contract as [[queryMinhash]].
    */
  def appendMinhash(delta: DataFrame, id: String, text: String,
      shingleN: Int, k: Int, bands: Int, maxBucketSize: Int,
      livePath: String,
      hasher: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        Dedup.shingleHashes,
      marker: Option[Long] = None): Unit = {
    val spark = delta.sparkSession
    val live = graft.operators.CacheRefresh.resolveLive(spark, livePath)
    val merged = graft.operators.Pinning.pin(
      spark.read.parquet(s"$live/sigs").unionByName(
        Dedup.minhashSigsOf(delta, id, text, shingleN, k, hasher)))
    try {
      val buckets = Dedup.minhashBucketsOf(merged, bands, k / bands,
        maxBucketSize)
      graft.operators.CacheRefresh.publishVersioned(spark, livePath) { dir =>
        merged.write.mode("overwrite").parquet(s"$dir/sigs")
        buckets.write.mode("overwrite").parquet(s"$dir/buckets")
        // exactly-once batch marker (CacheStream contract): rides inside
        // the version, so data + marker flip with the one pointer rename
        marker.foreach(b => graft.streaming.CacheStream
          .writeBatchMarker(spark, dir, b))
      }
    } finally graft.operators.Pinning.unpin(merged)
  }

  /** Build and publish an ExactSubstr window-hash index — the
    * [[saveMinhash]] lifecycle for substring dedup (r14 VERDICT
    * Next-round #4): without it, every ingest re-hashes the WHOLE
    * corpus; with it, a batch pays only its own windows plus
    * index-metadata scans. Layout:
    *
    *   - `<livePath>.segments/seg-*` — IMMUTABLE per-batch partial
    *     hash-stat segments: one row per distinct window hash in that
    *     batch, (`__h`, `n_docs` CAPPED at 2, `min_id`). Docs are
    *     unique across batches, so the TRUE stats for a hash are
    *     `min(sum(n_docs), 2)` / `min(min_id)` over its partial rows —
    *     the cap is exact for the only two questions asked (dup ≥ 2?
    *     sole carrier == 1 and who?). An append WRITES only its own
    *     segment (delta-sized) — the r15 first cut merged-and-rewrote
    *     the whole table per append and measured SLOWER than the
    *     one-shot winnowed rebuild at 100× (43 s vs 23.5 s); segments
    *     took the append to delta-plus-scan cost.
    *   - versioned dir (`publishVersioned`): `reports/` — the per-doc
    *     [[Dedup.substringDedup]] output for the corpus so far (the
    *     one-shot-equivalent serving table, doc-count-sized) — and
    *     `segments.manifest` — the list of segment files this version
    *     reads. Crash between a segment write and the publish leaves
    *     an ORPHAN file no manifest references: harmless, and a re-run
    *     recomputes from the last published manifest.
    *
    * Parameters (minLen / hasher / winnow) are part of the artifact's
    * meaning — appends must pass the same ones, the [[queryMinhash]]
    * contract.
    */
  def saveSubstr(base: DataFrame, id: String, text: String, minLen: Int,
      livePath: String,
      hasher: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        xxhash64(_),
      winnow: Int = 1): Unit = {
    val spark = base.sparkSession
    val b = Dedup.substrPrep(base, id, text)
    def stream = Dedup.substrWindows(b, minLen, 1, hasher, winnow)
    val seg = writeSubstrSegment(spark, livePath,
      stream.groupBy(col("__h")).agg(
        least(countDistinct(col("__id")), lit(2L)).as("n_docs"),
        min(col("__id")).as("min_id")))
    val dup = spark.read.parquet(seg).filter(col("n_docs") >= 2)
      .select(col("__h"))
    val reports = Dedup.substrReports(b,
      stream.join(dup, Seq("__h"), "left_semi")
        .select(col("__id"), col("pos")),
      minLen, id)
    graft.operators.CacheRefresh.publishVersioned(spark, livePath) { dir =>
      reports.write.mode("overwrite").parquet(s"$dir/reports")
      writeSubstrManifest(spark, dir, Seq(seg))
    }
  }

  /** Append an ingest batch INTO the persisted ExactSubstr index. The
    * batch pays its own window sweep plus projection-narrow scans of
    * the existing segments; the BASE corpus text is touched only for
    * AFFECTED docs — docs that were a hash's sole carrier until this
    * batch duplicated it (their spans grow, so their stored report is
    * stale). Steps:
    *
    *   1. batch window stream → the batch's partial-stat segment
    *      (delta-sized write — nothing existing is rewritten);
    *   2. affected ids: existing partials restricted (semi join) to
    *      the batch's hashes, aggregated — total == 1 names the sole
    *      carrier (ids must be corpus-unique: a re-ingested id would
    *      alias the distinct-doc count);
    *   3. reports for (affected ∪ batch) recompute over just those
    *      docs' windows against the dup set aggregated from ALL
    *      partials restricted to those docs' hashes — batch-internal
    *      dups fall out of the same filter; every other stored report
    *      carries over untouched;
    *   4. publish: reports + a manifest referencing old segments plus
    *      the new one.
    *
    * The served result is bit-identical to [[saveSubstr]] over
    * base ∪ delta — the dedup_substring_incremental CORRECTNESS row
    * shares the one-shot oracle; IndexStoreSpec pins append ≡ rebuild
    * and the affected-doc recompute.
    */
  def appendSubstr(base: DataFrame, delta: DataFrame, id: String,
      text: String, minLen: Int, livePath: String,
      hasher: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        xxhash64(_),
      winnow: Int = 1, marker: Option[Long] = None): Unit = {
    val spark = delta.sparkSession
    val live = graft.operators.CacheRefresh.resolveLive(spark, livePath)
    val oldSegs = readSubstrManifest(spark, live)
    val oldPartials = spark.read.parquet(oldSegs: _*)
    val oldR = spark.read.parquet(s"$live/reports")
    val d = Dedup.substrPrep(delta, id, text)
    def dstream = Dedup.substrWindows(d, minLen, 1, hasher, winnow)
    val seg = writeSubstrSegment(spark, livePath,
      dstream.groupBy(col("__h")).agg(
        least(countDistinct(col("__id")), lit(2L)).as("n_docs"),
        min(col("__id")).as("min_id")))
    val dstats = spark.read.parquet(seg)
    // affected base docs: sole carriers of a hash the batch now shares
    // — only THEIR text is re-read from the base corpus. The aggregate
    // runs over existing partials SEMI-FILTERED to the batch's hashes:
    // a columnar (__h, n_docs, min_id) scan, shuffle bounded by the
    // matching rows.
    val affected = oldPartials
      .join(dstats.select(col("__h")), Seq("__h"), "left_semi")
      .groupBy(col("__h"))
      .agg(sum(col("n_docs")).as("bn"), min(col("min_id")).as("bmin"))
      .filter(col("bn") === 1)
      .select(col("bmin").as("__aff")).distinct()
    val rework = Dedup.substrPrep(base, id, text)
      .join(affected, col("__id") === col("__aff"), "left_semi")
      .unionByName(d)
    def rstream = Dedup.substrWindows(rework, minLen, 1, hasher, winnow)
    // dup set for the recompute: totals over ALL partials (new segment
    // included), restricted to the rework docs' own hashes
    val reworkHashes = rstream.select(col("__h")).distinct()
    val dup = oldPartials.unionByName(dstats)
      .join(reworkHashes, Seq("__h"), "left_semi")
      .groupBy(col("__h")).agg(sum(col("n_docs")).as("tn"))
      .filter(col("tn") >= 2).select(col("__h"))
    val newReports = Dedup.substrReports(rework,
      rstream.join(dup, Seq("__h"), "left_semi")
        .select(col("__id"), col("pos")),
      minLen, id)
    val keptReports = oldR.join(
      affected.select(col("__aff").as(id)), Seq(id), "left_anti")
    graft.operators.CacheRefresh.publishVersioned(spark, livePath) { dir =>
      keptReports.unionByName(newReports)
        .write.mode("overwrite").parquet(s"$dir/reports")
      writeSubstrManifest(spark, dir, oldSegs :+ seg)
      marker.foreach(b => graft.streaming.CacheStream
        .writeBatchMarker(spark, dir, b))
    }
  }

  /** Fold the live manifest's partial segments into ONE aggregated
    * segment — the [[compactIvf]] posture: appends stay cheap because
    * they only add segments; compaction bounds how many partials the
    * per-append scans and the stats view pay. Aggregated ≡ partials by
    * the sum-cap algebra, so compaction never changes a verdict
    * (IndexStoreSpec pins the stats view across it).
    */
  def compactSubstr(spark: SparkSession, livePath: String): Unit = {
    val live = graft.operators.CacheRefresh.resolveLive(spark, livePath)
    val segs = readSubstrManifest(spark, live)
    if (segs.size <= 1) return
    val folded = writeSubstrSegment(spark, livePath,
      spark.read.parquet(segs: _*).groupBy(col("__h"))
        .agg(least(sum(col("n_docs")), lit(2L)).as("n_docs"),
          min(col("min_id")).as("min_id")))
    val reports = spark.read.parquet(s"$live/reports")
    graft.operators.CacheRefresh.publishVersioned(spark, livePath) { dir =>
      reports.write.mode("overwrite").parquet(s"$dir/reports")
      writeSubstrManifest(spark, dir, Seq(folded))
    }
  }

  /** The live per-doc report table published by [[saveSubstr]] /
    * [[appendSubstr]] — the serving read: one-shot-equivalent verdicts
    * with zero window hashing.
    */
  def loadSubstrReports(spark: SparkSession, livePath: String): DataFrame =
    spark.read.parquet(
      graft.operators.CacheRefresh.resolveLive(spark, livePath) +
        "/reports")

  /** The aggregated per-hash stats view over the live manifest's
    * partials — `min(sum(n_docs), 2)` / `min(min_id)`, the exact
    * algebra the append path decides with (IndexStoreSpec compares
    * this view between a grown index and a fresh build).
    */
  def loadSubstrHashStats(spark: SparkSession,
      livePath: String): DataFrame = {
    val live = graft.operators.CacheRefresh.resolveLive(spark, livePath)
    spark.read.parquet(readSubstrManifest(spark, live): _*)
      .groupBy(col("__h"))
      .agg(least(sum(col("n_docs")), lit(2L)).as("n_docs"),
        min(col("min_id")).as("min_id"))
  }

  private def writeSubstrSegment(spark: SparkSession, livePath: String,
      stats: DataFrame): String = {
    val seg = s"$livePath.segments/seg-${java.util.UUID.randomUUID()}"
    stats.write.mode("overwrite").parquet(seg)
    seg
  }

  private def writeSubstrManifest(spark: SparkSession, dir: String,
      segs: Seq[String]): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir, "segments.manifest")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    out.write((segs.mkString("\n") + "\n").getBytes("UTF-8"))
    out.close()
  }

  private def readSubstrManifest(spark: SparkSession,
      live: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(live, "segments.manifest")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    text.linesIterator.map(_.trim).filter(_.nonEmpty).toIndexedSeq
  }

  /** Cell-balance of the live IVF index: max cell size over mean cell
    * size — the retrain trigger ([[compactIvf]]'s scaladoc). 1.0 is
    * perfectly balanced; appends assigned to frozen cells drift it
    * upward as the data distribution moves away from the base's. One
    * nlist-sized aggregation over the assigned table.
    */
  def ivfImbalance(spark: SparkSession, livePath: String): Double = {
    val (_, assigned) = loadIvf(spark, livePath)
    val row = assigned.groupBy(col("list_id"))
      .agg(count(lit(1)).as("c"))
      .agg(max(col("c")).cast("double").as("mx"),
        avg(col("c")).as("mean"))
      .head()
    // empty assigned table (freshly-created index, nothing appended yet):
    // max/avg are NULL and getDouble would throw an opaque NPE (ADVICE
    // r12). Zero vectors are perfectly balanced — nothing to compact.
    if (row.isNullAt(0) || row.isNullAt(1)) 1.0
    else row.getDouble(0) / row.getDouble(1)
  }

  /** Compact the persisted IVF index: retrain the coarse centroids and
    * re-assign every vector, publishing the rebuilt index under the next
    * versioned pointer. The input is the index's OWN assigned table —
    * the index stores its vectors, so compaction never touches the raw
    * corpus: at 100 TB the retrain job reads the (much smaller than
    * raw) index snapshot and the corpus stays cold.
    *
    * This closes the index lifecycle: build ([[saveIvf]]) → append
    * ([[graft.streaming.IndexStream.appendBatch]], frozen cells) →
    * compact (here, when [[ivfImbalance]] crosses a threshold). Frozen-
    * cell appends are what keep ingest cheap, and they are also what
    * degrades the index: cells only grow where new data lands, so probe
    * candidate lists bloat and recall-per-scanned-byte decays. Retraining
    * is deterministic ([[Similarity.kmeansTrain]]: first-k-by-id seed,
    * exact-decimal means, L2 ties by list_id), so a compacted index is
    * BIT-IDENTICAL to a fresh trained build over the merged corpus —
    * `compact(append(base, delta)) == build(base ∪ delta)` is the
    * invariant IndexStoreSpec pins and the sim_ivf_compact CORRECTNESS
    * row shares sim_ivf_trained's oracle through.
    */
  def compactIvf(spark: SparkSession, livePath: String,
      k: Int, dim: Int, iters: Int,
      marker: Option[Long] = None): Unit = {
    val (_, assigned) = loadIvf(spark, livePath)
    // pin: kmeansTrain sweeps `iters + 1` times and saveIvf re-scans for
    // the re-assignment — without the pin the parquet scan re-executes
    // per sweep (cheap) but more importantly the frame must be STABLE
    // across those passes while the old version may be pruned under us
    val vecs = graft.operators.Pinning.pin(
      assigned.select(col("neighbor_id"), col("cv")))
    try {
      val retrained = Similarity.kmeansTrain(vecs, "neighbor_id", "cv",
        k, dim, iters)
      saveIvf(vecs, "neighbor_id", "cv", nlist = k, livePath,
        trained = Some(retrained), marker = marker)
    } finally graft.operators.Pinning.unpin(vecs)
  }

  /** Compact iff the cell balance has drifted past `maxImbalance` —
    * the maintenance policy an ingest pipeline runs after its appends.
    * Returns whether a compaction was published.
    */
  def compactIfSkewed(spark: SparkSession, livePath: String,
      maxImbalance: Double, k: Int, dim: Int, iters: Int,
      marker: Option[Long] = None): Boolean = {
    val skewed = ivfImbalance(spark, livePath) > maxImbalance
    if (skewed) compactIvf(spark, livePath, k, dim, iters, marker)
    skewed
  }
}
