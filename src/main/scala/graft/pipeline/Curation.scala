package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: deterministic
  * stratified sampling, target-proportion domain mixing, PII scrubbing.
  *
  * Sampling is HASH-based, not `rand()`-based: the keep/drop decision for a
  * row is a pure function of its id, so (a) re-running the pipeline on a
  * grown corpus keeps every previously-kept row (stable incremental
  * curation), (b) any engine can replay the exact sample for verification
  * (the DuckDB oracles do), and (c) no row ever depends on partitioning or
  * task retry order — the failure mode that makes `sample()` irreproducible
  * on a real cluster.
  *
  * Plan shapes at 100 TB: every operator is one broadcast join (tiny
  * rate/target dimension) + a narrow filter — the corpus is never shuffled.
  * Domain mixing adds one aggregation over the corpus to learn per-stratum
  * counts (map-side combinable; output = one row per stratum).
  */
object Curation {

  /** Deterministic per-row hash in [0, buckets): top-60-bits-of-md5 of the
    * id rendered as a string — the repo's standard cross-engine-replayable
    * hash (DuckDB: `('0x'||substr(md5(CAST(id AS VARCHAR)),1,15))::BIGINT %
    * buckets`).
    */
  def hashBucket(id: Column, buckets: Long): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long"),
      lit(buckets))

  /** Stratified sample: keep a row iff hash(id) mod 10000 < its stratum's
    * `rate_bp` (basis points, 0..10000). `rates` is a (stratumCol, rate_bp)
    * dimension — curated metadata, broadcast. Rows whose stratum has no
    * rate row are dropped (inner join), like an allowlist.
    */
  def stratifiedSample(
      docs: DataFrame, id: String, stratum: String,
      rates: DataFrame): DataFrame =
    docs.join(broadcast(rates), Seq(stratum))
      .filter(hashBucket(col(id), 10000L) < col("rate_bp"))
      .drop("rate_bp")

  /** Weighted bottom-k (priority) sample per stratum — sequential-Poisson
    * / priority sampling (Ohlsson 1998; Duffield-Lund-Thorup 2007): item
    * priority = uniform-hash / weight, keep the k smallest per group, so
    * inclusion probability scales with weight while the whole sample
    * stays deterministic and engine-replayable (portable md5 hash, one
    * IEEE division, (priority, id) total order). State is k rows per
    * group via the bounded CollectTopK aggregate — map-side partials
    * never exceed k, shard samples merge by keep-k-smallest, the same
    * 100 TB posture as the KMV sketch.
    *
    * The hash normalizes to [0,1) BEFORE the weight division (dividing by
    * 2^60 is exact — power-of-two scaling), keeping priorities at unit
    * magnitude where a display rounding is well-defined; at raw 10^15
    * magnitude the ULP exceeds 4 decimals and engines disagree.
    */
  def weightedSample(docs: DataFrame, stratum: String, id: String,
      weight: Column, k: Int): DataFrame = {
    val pri = conv(substring(md5(col(id).cast("string")), 1, 15), 16, 10)
      .cast("long").cast("double") / lit(math.pow(2.0, 60)) /
      weight.cast("double")
    docs.withColumn("__pri", pri)
      .groupBy(col(stratum))
      .agg(org.apache.spark.sql.graft.ColumnBridge.collectBottomK(
        struct(col("__pri"), col(id)), k).as("__tk"))
      .select(col(stratum), posexplode(col("__tk")).as(Seq("__i", "__t")))
      .select(col(stratum), col(s"__t.$id").as(id),
        col("__t.__pri").as("pri"), (col("__i") + 1).cast("long").as("rank"))
  }

  /** Target-proportion domain mix: given per-stratum weights, sample each
    * stratum down so the output follows the weights exactly at the largest
    * total the corpus supports (the binding stratum is kept whole).
    *
    * budget N = min over strata of floor(n_s / w_s); stratum s keeps
    * ~N * w_s rows via a hash cutoff computed in pure INTEGER arithmetic
    * (`(N * w_s * 1e6) div n_s` over hash mod 1e6) so the boundary decision
    * is bit-identical on any engine — no double rounding at the cutoff.
    *
    * `targets` is a (stratumCol, w: long) dimension. One corpus aggregation
    * (map-side combinable) learns n_s; everything else is broadcast + narrow.
    */
  def domainMix(
      docs: DataFrame, id: String, stratum: String,
      targets: DataFrame): DataFrame = {
    val counts = docs.groupBy(col(stratum)).agg(count(lit(1)).as("__n"))
    val jt = counts.join(broadcast(targets), Seq(stratum))
    val budget = jt.agg(min(expr("__n div w")).as("__budget"))
    val cutoffs = jt.crossJoin(broadcast(budget))
      .select(col(stratum),
        expr("(__budget * w * 1000000) div __n").as("__cutoff"))
    docs.join(broadcast(cutoffs), Seq(stratum))
      .filter(hashBucket(col(id), 1000000L) < col("__cutoff"))
      .drop("__cutoff")
  }

  /** Temperature-flattened mixing (the mT5/UNIMAX alpha-sampling shape at
    * alpha = 0.5): the target share of stratum l is ∝ n_l^0.5, so
    * over-represented sources flatten toward the tail without starving
    * it. Weights derive from the data as floor(sqrt(n)) — IEEE sqrt of an
    * exact-integer double is correctly rounded, so the integer weight is
    * identical on any engine — then the [[domainMix]] budget/cutoff
    * machinery applies unchanged (hash-deterministic keeps, integer
    * cutoffs, no rand()).
    *
    * Plan: two tiny aggregations over stratum counts broadcast back; the
    * corpus itself is filtered in place — no shuffle of the fact.
    */
  def temperatureMix(
      docs: DataFrame, id: String, stratum: String): DataFrame = {
    val weights = docs.groupBy(col(stratum)).agg(count(lit(1)).as("__n"))
      .select(col(stratum), col("__n"),
        floor(sqrt(col("__n").cast("double"))).cast("long").as("__w"))
    val budget = weights.agg(min(expr("__n div __w")).as("__budget"))
    val cutoffs = weights.crossJoin(broadcast(budget))
      .select(col(stratum),
        expr("(__budget * __w * 1000000) div __n").as("__cutoff"))
    docs.join(broadcast(cutoffs), Seq(stratum))
      .filter(hashBucket(col(id), 1000000L) < col("__cutoff"))
      .drop("__cutoff")
  }

  /** Epoch-weighted recipe materialization — the UP-sampling counterpart
    * of [[domainMix]]: each document repeats `floor(w)` times plus one
    * extra epoch for the hash-selected fraction `w - floor(w)` of its
    * stratum (so a 1.5-epoch source emits every doc once and a
    * deterministic half of it twice). `weights` is a (stratumCol,
    * epochs_bp: long) dimension in integer basis points (10000 = 1 epoch) —
    * the whole decision is integer arithmetic on the md5 hash, so any
    * engine replays the exact emitted multiset.
    *
    * Plan: broadcast weights + per-row sequence explode — fully narrow,
    * ZERO shuffles; the corpus never moves. Output: one row per
    * (document, epoch), epoch 1-based.
    */
  def epochMix(
      docs: DataFrame, id: String, stratum: String,
      weights: DataFrame): DataFrame = {
    val full = floor(col("epochs_bp") / 10000).cast("long")
    val frac = col("epochs_bp") % 10000
    val n = full +
      when(hashBucket(col(id), 10000L) < frac, 1L).otherwise(0L)
    docs.join(broadcast(weights), Seq(stratum))
      .withColumn("__n_epochs", n)
      .withColumn("epoch",
        explode(when(col("__n_epochs") >= 1,
            sequence(lit(1L), col("__n_epochs")))
          .otherwise(array().cast("array<bigint>"))))
      .drop("epochs_bp", "__n_epochs")
  }

  /** Deterministic train/valid/test split: the label is a pure function of
    * the row id (hash mod 10000 against basis-point cutoffs), so the split
    * is stable under corpus growth, reshuffling, and task retries — a row
    * can never leak across splits between pipeline runs. One narrow
    * projection; the corpus is not shuffled.
    */
  def trainValTestSplit(
      id: Column, trainBp: Int, validBp: Int): Column = {
    val b = hashBucket(id, 10000L)
    when(b < trainBp, "train")
      .when(b < trainBp + validBp, "valid")
      .otherwise("test")
  }

  /** Exact-allocation stratified split — Hamilton (largest-remainder)
    * apportionment per stratum. [[trainValTestSplit]]'s hash buckets give
    * BINOMIAL way sizes (a 10%-valid split of a 1000-doc stratum lands
    * anywhere around 100±19 at 95%); eval sets and ablation grids need
    * the allocation EXACT: each stratum contributes precisely its
    * apportioned count to each way, remainder seats going to the largest
    * fractional quotas (ties to the earlier way). Determinism comes from
    * the same md5-of-id ordering the samplers use: a doc's way depends
    * only on corpus content, never on partitioning or retry order.
    *
    * Plan at 100 TB: per-stratum ranks come from ONE global range
    * shuffle ([[graft.operators.Numbering.numberBySort]] on the
    * stratum|hash composite — never a `Window.partitionBy(stratum)`,
    * which funnels each stratum through a single task); offsets, sizes,
    * and the (stratum × way) allocation table are strata-sized
    * aggregates computed with dimension windows and broadcast back. The
    * corpus passes the shuffle once and is joined narrowly.
    *
    * `ways`: (name, basis points) in priority order, summing to 10000.
    * Output: input row + `__rank` (1-based within stratum) + `way`.
    */
  def exactAllocationSplit(docs: DataFrame, id: String, stratum: String,
      ways: Seq[(String, Int)]): DataFrame = {
    require(ways.nonEmpty && ways.map(_._2).sum == 10000,
      s"way shares must sum to 10000 basis points: $ways")
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    // deterministic total order inside each stratum: md5(id) then id —
    // both rendered as strings so any SQL engine reproduces the sort.
    // The stratum is keyed by its md5, not its raw value: a FIXED-WIDTH
    // hex prefix keeps every stratum contiguous in the global sort even
    // when a stratum value itself contains the '|' separator (raw 'a'
    // and 'a|b' would interleave because md5 hex sorts below '|').
    val keyed = docs.withColumn("__sk",
      concat(md5(col(stratum).cast("string")), lit("|"),
        md5(col(id).cast("string")), lit("|"), col(id).cast("string")))
    val numbered = graft.operators.Numbering.numberBySort(keyed, "__sk", "__gn")
    // strata are contiguous in the global sort, so per-stratum rank =
    // global number − stratum's min + 1 (offsets: a tiny aggregate)
    val dims = numbered.groupBy(col(stratum).as("__s"))
      .agg(min(col("__gn")).as("__off"), count(lit(1)).as("__n"))
    // largest-remainder apportionment on the (stratum × way) dimension:
    // integer quota arithmetic (n·bp < 2^45, so the double `/` under
    // floor() is exact), remainder seats by (frac DESC, way order)
    val waysDf = ways.zipWithIndex
      .map { case ((w, bp), i) => (w, bp, i) }.toDF("way", "__bp", "__wi")
    val perWay = dims.crossJoin(waysDf)
      .withColumn("__fl", floor((col("__n") * col("__bp")) / 10000).cast("long"))
      .withColumn("__fr", (col("__n") * col("__bp")) % 10000)
    val ws = Window.partitionBy(col("__s"))
    val alloc = perWay
      .withColumn("__rem", col("__n") - sum(col("__fl")).over(ws))
      .withColumn("__fri", row_number().over(
        ws.orderBy(col("__fr").desc, col("__wi"))))
      .withColumn("__alloc",
        col("__fl") + when(col("__fri") <= col("__rem"), 1L).otherwise(0L))
      .withColumn("__hi", sum(col("__alloc")).over(
        ws.orderBy(col("__wi")).rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__lo", col("__hi") - col("__alloc"))
      .select(col("__s"), col("__off"), col("way"), col("__lo"), col("__hi"))
    numbered
      .join(broadcast(alloc),
        col(stratum) === col("__s") &&
          col("__gn") - col("__off") + 1 > col("__lo") &&
          col("__gn") - col("__off") + 1 <= col("__hi"))
      .withColumn("__rank", col("__gn") - col("__off") + 1)
      .drop("__sk", "__gn", "__s", "__off", "__lo", "__hi")
  }

  /** Consistent-hash ring shard assignment (Karger et al. 1997):
    * `vnodes` virtual points per shard on a 60-bit md5 ring; a document
    * belongs to the owner of the first ring point at or after its own
    * hash (wrapping to the smallest point). The property that makes this
    * the RESHARDING primitive — where modulo hashing reshuffles nearly
    * everything when the shard count changes — is that adding a shard
    * only moves the documents that land on the NEW shard's ring arcs,
    * an expected vnodes/(ring size) fraction; every other assignment is
    * untouched, so a rebalance plan touches ~1/(n+1) of the corpus.
    *
    * The ring is metadata (shards·vnodes points, built driver-side from
    * the same md5Long60 every oracle replays) and compiles into the
    * projection as a sorted literal array — per-document assignment is
    * one narrow codegen'd array scan, no join, no shuffle, identical on
    * every engine.
    */
  def ringShard(id: Column, shards: Int, vnodes: Int): Column = {
    require(shards > 0 && vnodes > 0, s"need positive ring: $shards x $vnodes")
    val ring = (0 until shards).flatMap(i => (0 until vnodes).map(j =>
        (graft.functions.Vectors.MinHashSig.md5Long60(s"shard-$i-v-$j"), i)))
      .sortBy(_._1)
    // codegen'd binary search over the primitive ring (Rings.owner) —
    // the interpreted filter-HOF over a 144-struct literal it replaces
    // cost ~60 µs/row at the r10 100× probe
    graft.functions.Rings.owner(hashBucket(id, 1L << 60),
      ring.map(_._1).toArray, ring.map(_._2).toArray)
  }

  /** Token-budget corpus selection: take documents in descending `score`
    * order (ties by id) until the cumulative token count would exceed
    * `budget` — the standard "best data that fits the compute budget"
    * curation step when a training run is sized in tokens, not documents.
    *
    * PREFIX semantics: selection stops at the first document that
    * overflows the budget; later (worse) documents are not back-filled
    * even if they would fit. That keeps the selected set a pure function
    * of the ordering (replayable as one running sum — knapsack-style
    * back-fill is sequential state no engine-independent oracle can
    * replay without a recursive CTE) and monotone: growing the budget
    * only ever ADDS documents, it never swaps one out.
    *
    * Plan at 100 TB: one range shuffle on (score DESC, id) + two linear
    * passes ([[graft.operators.Numbering.runningBySort]]) — no global
    * window, no driver-side data. Output: input row + `cum_tokens`.
    */
  def tokenBudgetSelect(docs: DataFrame, id: String, score: Column,
      tokens: Column, budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be non-negative: $budget")
    val scored = docs.withColumn("__score", score)
      .withColumn("__tok", tokens.cast("long"))
    graft.operators.Numbering.runningBySort(
        scored, Seq(col("__score").desc, col(id)), col("__tok"), "cum_tokens")
      .filter(col("cum_tokens") <= budget)
      .drop("__score", "__tok")
  }

  /** Benchmark decontamination: flag corpus documents sharing any word
    * n-gram with an evaluation/benchmark set (the standard pretraining
    * hygiene step — eval items must not appear in training data).
    *
    * Plan at 100 TB: the benchmark side is tiny and BROADCAST as a
    * distinct-gram dimension; the corpus streams through one shingle
    * projection and an inner hash join — corpus text is never shuffled,
    * and the per-doc hit count aggregates map-side on (id, gram) hits
    * only. Output: (id, n_hits) for contaminated documents; anti-join
    * against it to clean the corpus.
    */
  def contamination(
      docs: DataFrame, id: String, text: String,
      evalDocs: DataFrame, n: Int): DataFrame = {
    val evalGrams = evalDocs
      .select(explode(Dedup.shingles(col(text), n)).as("__g"))
      .distinct()
    docs.select(col(id), explode(Dedup.shingles(col(text), n)).as("__g"))
      .join(broadcast(evalGrams), Seq("__g"))
      // shingles() is distinct per document, so count(*) = distinct
      // overlapping grams
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Sequence packing for training batches: within each shard, documents
    * in ascending-id order fill fixed token-capacity bins next-fit — a doc
    * joins the current bin if it fits, else opens the next one (an
    * over-capacity doc occupies a bin alone). Output: one row per doc with
    * its bin index within the shard.
    *
    * Packing is inherently sequential in the fill order, so it runs
    * per-shard: one `collect_list` + an `aggregate` HOF fold per shard —
    * no UDF, no driver involvement. Shards are the pipeline's parallelism
    * AND memory unit (a training shard is sized to fit a worker by
    * construction, exactly like the files a tokenizer emits); 100 TB packs
    * as one shuffle by shard key, every shard folding independently.
    * Deterministic: (shard, id) totally orders the fill.
    */
  def packSequences(
      docs: DataFrame, shard: String, id: String, tokens: Column,
      capacity: Long): DataFrame = {
    val perDoc = docs.select(col(shard),
      struct(col(id).cast("long").as("id"),
        tokens.cast("long").as("t")).as("__dt"))
    val emptyOut = array().cast("array<struct<id:bigint,bin:int>>")
    perDoc.groupBy(col(shard))
      .agg(sort_array(collect_list(col("__dt"))).as("__ds"))
      .select(col(shard), explode(aggregate(
        col("__ds"),
        struct(lit(0).as("bin"), lit(0L).as("fill"), emptyOut.as("out")),
        (acc, x) => {
          val over = acc("fill") + x("t") > lit(capacity) && acc("fill") > 0
          val bin = when(over, acc("bin") + 1).otherwise(acc("bin"))
          val fill = when(over, x("t")).otherwise(acc("fill") + x("t"))
          struct(bin.as("bin"), fill.as("fill"),
            concat(acc("out"),
              array(struct(x("id").as("id"), bin.as("bin")))).as("out"))
        },
        acc => acc("out"))).as("__p"))
      .select(col(shard), col("__p.id").as(id), col("__p.bin").as("bin"))
  }

  /** Best-fit-decreasing sequence packing — the fill-rate upgrade over
    * [[packSequences]]'s next-fit walk: items place largest-first, each
    * into the FULLEST bin that still fits (first such bin on fill ties),
    * opening a new bin only when none fits. Same per-shard fold shape
    * (one shuffle on the shard key, a collect_list + `aggregate` HOF per
    * shard, no UDF, no driver), but the fold state carries the whole
    * per-bin fill vector — bounded by the shard's bin count, which is
    * bounded by the shard's item count, which is bounded by shard sizing.
    * An item larger than `capacity` opens its own (overfull) bin and
    * nothing ever joins it (fill + t <= capacity can't hold again).
    *
    * Deterministic: items order by (t DESC, id ASC); best-fit ties break
    * to the earliest-opened bin (array_position takes the first match) —
    * rules an external engine can replay exactly (the DuckDB oracle walks
    * the identical recursion).
    */
  def packSequencesBestFit(
      docs: DataFrame, shard: String, id: String, tokens: Column,
      capacity: Long): DataFrame = {
    val perDoc = docs.select(col(shard),
      struct((-tokens.cast("long")).as("negt"),
        col(id).cast("long").as("id")).as("__dt"))
    val emptyFills = array().cast("array<bigint>")
    val emptyOut = array().cast("array<struct<id:bigint,bin:int>>")
    perDoc.groupBy(col(shard))
      .agg(sort_array(collect_list(col("__dt"))).as("__ds"))
      .select(col(shard), explode(aggregate(
        col("__ds"),
        struct(emptyFills.as("fills"), emptyOut.as("out")),
        (acc, x) => {
          val t = -x("negt")
          val cands = filter(acc("fills"), f => f + t <= lit(capacity))
          val fresh = size(cands) === 0
          val idx = array_position(acc("fills"), array_max(cands))
          val bin = when(fresh, size(acc("fills")) + 1)
            .otherwise(idx.cast("int"))
          val fills = when(fresh, concat(acc("fills"), array(t)))
            .otherwise(concat(
              slice(acc("fills"), lit(1), (idx - 1).cast("int")),
              array(element_at(acc("fills"), idx.cast("int")) + t),
              slice(acc("fills"), (idx + 1).cast("int"),
                greatest(size(acc("fills")) - idx.cast("int"), lit(0)))))
          struct(fills.as("fills"),
            concat(acc("out"),
              array(struct(x("id").as("id"), bin.cast("int").as("bin"))))
              .as("out"))
        },
        acc => acc("out"))).as("__p"))
      .select(col(shard), col("__p.id").as(id), col("__p.bin").as("bin"))
  }

  /** Per-host document cap — the C4/RefinedWeb host-level curation step:
    * keep at most `cap` documents per URL host so no single site dominates
    * the corpus. Selection within a host is by ascending md5-hash of the
    * id (then id as tiebreak) — a pure function of the row, so re-runs,
    * engine changes, and corpus growth keep a stable prefix of each host's
    * ranking (a previously-kept doc is only evicted by a genuinely
    * lower-hashed newcomer, never by partitioning noise the way a
    * rand()-ranked cap would be).
    *
    * Plan at 100 TB: ONE hash-partitioned window keyed on host. Host
    * cardinality at web scale is enormous (the key diffuses across the
    * cluster), per-host groups are modest, and a pathological mega-host
    * sorts within Spark's spillable window — never on the driver.
    *
    * Returns the input plus (host, host_rank, keep). Filter on `keep` to
    * apply the cap; the full output is the audit view.
    */
  def hostCap(docs: DataFrame, id: String, urlCol: String,
      cap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // unparseable URLs get host = NULL and are exempt from the cap rather
    // than silently collapsing into one giant ''-host group that the cap
    // would mass-drop; callers count/route them via host IS NULL
    val raw = regexp_extract(col(urlCol), "^https?://([^/]+)", 1)
    val host = when(raw =!= "", raw)
    val w = Window.partitionBy(col("host"))
      .orderBy(hashBucket(col(id), 1000000000000L), col(id))
    docs.withColumn("host", host)
      .withColumn("host_rank",
        when(col("host").isNotNull, row_number().over(w).cast("long")))
      .withColumn("keep",
        col("host").isNull || col("host_rank") <= cap)
  }

  /** Exact per-stratum percentile gate over an INTEGER score column (keep
    * rows at/above their stratum's p-th percentile, percentile_disc
    * semantics: the smallest score whose cumulative fraction ≥ p).
    *
    * The 100 TB shape: integer-quantized scores make the exact quantile a
    * HISTOGRAM problem — one map-side-combinable count per (stratum,
    * score) collapses the corpus to a tiny histogram, a running sum over
    * each stratum's ordered scores finds the cut, and the corpus takes
    * one broadcast join + narrow filter. No per-row window, no global
    * sort, no approx-percentile compromise: the quantile is exact AND the
    * heavy side never shuffles. (A float score would force the per-group
    * sort this avoids — quantize first, like text_quality_model does.)
    *
    * `pBp` is the percentile in basis points (5000 = median). Returns the
    * input plus (cut_score, keep).
    *
    * `broadcastCuts` fits the usual case (strata = sources/domains/
    * languages: one cut row each, KBs). Gating on an extreme-cardinality
    * stratum (per-host, millions of cuts) should pass false — the gate
    * join then shuffles by the stratum key instead of collecting the cut
    * table to the driver.
    */
  def percentileGate(docs: DataFrame, stratum: String, score: String,
      pBp: Int, broadcastCuts: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = docs.groupBy(col(stratum), col(score))
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(col(stratum)).orderBy(col(score))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val n = Window.partitionBy(col(stratum))
    val cuts = hist
      .withColumn("__cum", sum(col("__c")).over(w))
      .withColumn("__n", sum(col("__c")).over(n))
      // smallest score with cume_dist >= p: cum*10000 >= p*n in integers
      .filter(col("__cum") * 10000 >= lit(pBp) * col("__n"))
      .groupBy(col(stratum))
      .agg(min(col(score)).as("cut_score"))
    docs.join(if (broadcastCuts) broadcast(cuts) else cuts, Seq(stratum))
      .withColumn("keep", col(score) >= col("cut_score"))
  }

  /** Cross-stratum score calibration: percentile-rank normalization of an
    * integer score within its stratum — pct_bp = floor(10000 * |rows with
    * strictly smaller score| / n). The calibration that makes a quality
    * gate comparable ACROSS domains whose raw score distributions differ
    * (gate on pct_bp, not score).
    *
    * Shape mirrors [[percentileGate]]: per-row work never windows — the
    * corpus reduces to the (stratum, score) HISTOGRAM (map-side
    * combinable), the cumulative runs on that bounded dimension, and the
    * (below, n) columns broadcast back. Pure integer arithmetic end to
    * end.
    */
  def rankNormalize(scored: DataFrame, stratum: String, score: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = scored.groupBy(col(stratum), col(score))
      .agg(count(lit(1)).as("__c"))
    val below = Window.partitionBy(col(stratum)).orderBy(col(score))
      .rowsBetween(Window.unboundedPreceding, -1)
    val dim = hist
      .withColumn("__below", coalesce(sum(col("__c")).over(below), lit(0L)))
      .withColumn("__n",
        sum(col("__c")).over(Window.partitionBy(col(stratum))))
      .select(col(stratum), col(score), col("__below"), col("__n"))
    scored.join(broadcast(dim), Seq(stratum, score))
      .withColumn("pct_bp", expr("(__below * 10000) div __n"))
      .drop("__below", "__n")
  }

  /** Training-shard materialization: assign documents to `nShards` shards
    * by the deterministic id hash, concatenate each shard's texts in
    * ascending-id order with `sep` between documents, and emit the shard
    * payload together with its 1-based document start-offset index (what
    * a tokenizer needs to find document boundaries again).
    *
    * The shard is the pipeline's parallelism AND memory unit (same
    * posture as [[packSequences]]): 100 TB materializes as ONE shuffle
    * keyed by shard, every shard folding independently; shard count is
    * chosen so a shard fits a worker by construction. Deterministic:
    * (shard, id) totally orders the concatenation, so re-runs and
    * engines agree byte-for-byte.
    *
    * Output: (shard, n_docs, payload, offsets ARRAY<BIGINT>).
    */
  def concatShards(docs: DataFrame, id: String, text: String,
      nShards: Int, sep: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // id keeps its natural type: a cast("long") would null out string ids
    // (UUIDs) and silently scramble the fill order
    val perDoc = docs.select(
      hashBucket(col(id), nShards).as("shard"),
      col(id).as("__id"), col(text).as("__t"))
    // offsets as a window prefix sum over the SAME shard key the collect
    // aggregates on — one shuffle total, and linear (an aggregate-HOF
    // fold appending to an array would copy O(docs²) elements per shard)
    val wPrev = Window.partitionBy(col("shard")).orderBy(col("__id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = coalesce(
      sum((length(col("__t")) + lit(sep.length)).cast("long")).over(wPrev),
      lit(0L)) + 1L
    perDoc.withColumn("__off", off)
      .groupBy(col("shard"))
      .agg(sort_array(collect_list(
        struct(col("__id"), col("__t"), col("__off")))).as("__ds"))
      .select(col("shard"),
        size(col("__ds")).cast("long").as("n_docs"),
        array_join(transform(col("__ds"), x => x.getField("__t")), sep)
          .as("payload"),
        transform(col("__ds"), x => x.getField("__off")).as("offsets"))
  }

  /** Corpus snapshot diff — the data-versioning primitive between two
    * crawls/exports: classify every id as added (only in `b`), removed
    * (only in `a`), changed (both, content hash differs), or unchanged.
    * Content compares by digest, so the full-outer join carries (id,
    * hash) pairs only — never two copies of the text through the shuffle.
    * One id-keyed join at 100 TB (diffuse key); downstream incremental
    * work (re-dedup, re-index) consumes the added ∪ changed slice.
    */
  def snapshotDiff(a: DataFrame, b: DataFrame, id: String,
      text: String): DataFrame = {
    val ha = a.select(col(id), md5(col(text)).as("__ha"))
    val hb = b.select(col(id), md5(col(text)).as("__hb"))
    ha.join(hb, Seq(id), "full_outer")
      .select(col(id),
        when(col("__ha").isNull, "added")
          .when(col("__hb").isNull, "removed")
          .when(col("__ha") === col("__hb"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** DSIR-style importance scoring (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): rank raw-corpus
    * documents by how much more likely their hashed n-gram features are
    * under a target-domain bag-of-buckets model than under the raw-corpus
    * model — the standard "make web data look like the quality domain"
    * selection signal.
    *
    * Features: word unigrams + adjacent bigrams, md5-hashed into `dim`
    * buckets (the repo's portable hash, so the oracle replays them).
    * Importance log-weight of a doc with bucket occurrences g_1..g_L:
    *
    *   score = Σ_i [ bits(t_{g_i}+1) − bits(r_{g_i}+1) ]
    *           − L · [ bits(Tt+dim) − bits(Tr+dim) ]
    *
    * i.e. the add-1-smoothed log-likelihood ratio with log2 quantized to
    * the integer binary-digit count (bits(x) = floor(log2 x)+1 — the
    * established cross-engine-exact discipline; no libm double ever
    * crosses engines, so ranking ties are exact, broken by ascending id).
    *
    * Plan at 100 TB: both bucket models are `dim`-row aggregations (the
    * corpora reduce map-side); the scoring pass explodes the raw corpus
    * to (id, bucket) pairs, joins the broadcast dim-row model table, and
    * folds per doc in one combinable aggregation. The text column never
    * shuffles; only (id, bucket) pairs do.
    *
    * Returns (id, n_grams, dsir_bits) for every raw doc.
    */
  def dsirScores(raw: DataFrame, target: DataFrame, id: String,
      text: String, dim: Int): DataFrame = {
    def grams(t: Column): Column = {
      val ws = split(lower(trim(t)), "\\s+")
      concat(ws, zip_with(
        slice(ws, lit(1), size(ws) - 1),
        slice(ws, lit(2), size(ws) - 1),
        (a, b) => concat(a, lit(" "), b)))
    }
    def bucket(g: Column): Column =
      pmod(conv(substring(md5(g), 1, 15), 16, 10).cast("long"), lit(dim.toLong))
    def bits(c: Column): Column = length(bin(c)).cast("long")
    def model(docs: DataFrame, cnt: String, tot: String): DataFrame = {
      // dense dim-row model: every bucket present (add-1 smoothing needs
      // the zero rows), total folded in so one broadcast carries both
      val counts = docs
        .select(explode(grams(col(text))).as("__g"))
        .groupBy(bucket(col("__g")).as("__b"))
        .agg(count(lit(1)).as(cnt))
      val dense = raw.sparkSession.range(dim).select(col("id").as("__b"))
        .join(broadcast(counts), Seq("__b"), "left")
        .select(col("__b"), coalesce(col(cnt), lit(0L)).as(cnt))
      dense.crossJoin(broadcast(
        dense.agg(sum(col(cnt)).as(tot))))
    }
    val m = model(target, "__t", "__tt")
      .join(broadcast(model(raw, "__r", "__rt")), Seq("__b"))
    val pairs = raw.select(col(id), explode(grams(col(text))).as("__g"))
      .select(col(id), bucket(col("__g")).as("__b"))
    pairs.join(broadcast(m), Seq("__b"))
      .groupBy(col(id))
      .agg(
        count(lit(1)).as("n_grams"),
        (sum(bits(col("__t") + 1L) - bits(col("__r") + 1L)) -
          count(lit(1)) * (bits(first(col("__tt")) + dim) -
            bits(first(col("__rt")) + dim))).as("dsir_bits"))
  }
}
