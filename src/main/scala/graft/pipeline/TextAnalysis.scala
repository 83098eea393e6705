package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language ID, document fingerprinting. All built-ins —
  * narrow, codegen'd, no UDFs in the hot path.
  */
object TextAnalysis {

  /** The stand-in English stopword inventory shared by the quality
    * features, the quality model, and the percentile gate. Single source
    * of truth on the Scala side; the DuckDB oracle SQL literals restate
    * it and must change in lockstep.
    */
  val DefaultStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** BPE-ish subword count: word-boundary pieces + digits + punctuation,
    * the regex approximation of a byte-pair tokenizer's pre-tokenizer.
    */
  def subwordCount(text: Column): Column =
    size(filter(split(text, "(?=[\\s\\p{Punct}])|(?<=[\\s\\p{Punct}])"),
      x => trim(x) =!= ""))

  /** Overlapping sliding-window chunks for context-window preparation:
    * windows of `window` chars every `stride` chars (overlap = window −
    * stride), 1-based start offsets. Returns ARRAY<STRUCT<start, chunk>> —
    * posexplode at the call site for (chunk_idx, start, chunk) rows. A
    * narrow per-row projection: chunking 100 TB is embarrassingly parallel
    * and never shuffles. Empty text yields one empty chunk (a document is
    * never silently dropped by chunking).
    */
  def chunks(text: Column, window: Int, stride: Int): Column =
    transform(
      sequence(lit(1), greatest(length(text), lit(1)), lit(stride)),
      s => struct(
        s.cast("long").as("start"),
        substr(text, s, lit(window)).as("chunk")))

  /** Quality features: length, token count, mean word length, punctuation
    * ratio, stopword ratio, uppercase ratio. Returns a struct column.
    */
  def qualityFeatures(text: Column, stopwords: Seq[String]): Column = {
    val chars = length(text).cast("double")
    val toks = tokenCount(text).cast("double")
    val punct = (length(text) -
      length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double")
    val uppers = (length(text) -
      length(regexp_replace(text, "[A-Z]", ""))).cast("double")
    val words = split(lower(trim(text)), "\\s+")
    val stop = size(filter(words, w => w.isin(stopwords: _*))).cast("double")
    struct(
      chars.as("n_chars"),
      toks.as("n_tokens"),
      when(toks > 0, chars / toks).otherwise(lit(0.0)).as("mean_word_len"),
      when(chars > 0, punct / chars).otherwise(lit(0.0)).as("punct_ratio"),
      when(chars > 0, uppers / chars).otherwise(lit(0.0)).as("upper_ratio"),
      when(toks > 0, stop / toks).otherwise(lit(0.0)).as("stopword_ratio"))
  }

  /** Linear-model inference: `bias + Σ wᵢ·termᵢ`, accumulated strictly
    * left-to-right (left-assoc adds over exact-rounded products), so any
    * engine evaluating the same chain reproduces the score bit-for-bit —
    * which is what lets a model-based quality filter stay oracle-checkable.
    * The model-scoring shape of the quality filter (fineweb-edu style):
    * weights are tiny curated metadata, inference is one codegen'd
    * projection — no UDF, no shuffle, no model server.
    */
  def linearScore(bias: Double, terms: (Double, Column)*): Column =
    terms.foldLeft(lit(bias): Column) { case (acc, (w, t)) =>
      acc + lit(w) * t
    }

  /** TRAIN a linear probe by full-batch gradient descent under squared
    * loss — the CCNet/fastText-style move of fitting a cheap classifier
    * on surface features against a weak label, done IN the engine rather
    * than shipped in as curated weights (which is what [[linearScore]]
    * consumes at inference time).
    *
    *   w ← w − η · (2/n) · Σᵢ (xᵢ·w − yᵢ) · xᵢ
    *
    * Scale posture (100 TB): each iteration is ONE narrow aggregation —
    * d+1 partial sums with map-side combine — and the only driver
    * traffic per round is the (d+1)-double coefficient vector (the
    * k-rows-per-round pattern shared with kmeansTrain / PQ training).
    *
    * Determinism (the oracle contract): double summation order depends
    * on partitioning, so each row's gradient term rounds ONCE to
    * DECIMAL(38,18) — deterministic per element — and the sum is exact
    * integer arithmetic, order-free (the kmeansTrain scheme). The
    * per-row residual is a left-associated chain of IEEE double ops, so
    * any engine replaying the same chain reproduces every iteration
    * bit-for-bit; a DuckDB oracle unrolls the iterations as chained
    * CTEs. `features` must therefore be drift-free double expressions
    * (ratios of counts are; transcendentals are not).
    *
    * Returns ("bias" +: feature names) zipped with trained weights.
    */
  def linearProbeTrain(
      docs: DataFrame, features: Seq[(String, Column)], label: Column,
      eta: Double, iters: Int): Seq[(String, Double)] = {
    val feats = ("bias", lit(1.0).as("bias")) +: features
    val x = docs.select(
      feats.map { case (n, c) => c.cast("double").as(n) } :+
        label.cast("double").as("__y"): _*)
    val n = x.count()
    require(n > 0, "linearProbeTrain: empty corpus (gradient mean is 0/0)")
    var w = IndexedSeq.fill(feats.size)(0.0)
    val step = eta * 2.0
    for (_ <- 0 until iters) {
      val pred = feats.zip(w).foldLeft(lit(0.0): Column) {
        case (acc, ((nm, _), wi)) => acc + lit(wi) * col(nm)
      }
      val resid = pred - col("__y")
      // d+1 exact decimal sums, one pass
      val gradCols = feats.zipWithIndex.map { case ((nm, _), i) =>
        sum((resid * col(nm)).cast("decimal(38,18)"))
          .cast("double").as(s"g$i")
      }
      val grads = x.agg(gradCols.head, gradCols.tail: _*).collect()(0)
      // a decimal(38,18) overflow nulls the per-row term and sum() would
      // silently skip it, corrupting the gradient — fail loudly instead
      w = w.indices.map { j =>
        require(!grads.isNullAt(j), s"linearProbeTrain: gradient sum for " +
          s"'${feats(j)._1}' is null — feature magnitude overflowed " +
          "decimal(38,18); rescale the feature")
        w(j) - step * grads.getDouble(j) / n
      }
    }
    feats.map(_._1).zip(w)
  }

  /** Exact tie-aware ROC-AUC of `score` against binary `label` — the
    * Mann-Whitney rank-sum form with AVERAGE ranks on tied scores
    * (identical to sklearn's roc_auc_score):
    *
    *   AUC = (Σ_{i:pos} rank(scoreᵢ) − n₊(n₊+1)/2) / (n₊ · n₋)
    *
    * Scale posture: ranks never come from a global `Window.orderBy`
    * (single-partition at corpus scale). Scores first collapse to the
    * DISTINCT-score table (one hash aggregation, cardinality ≤ n and
    * usually ≪ n), then the cumulative position below each distinct
    * score is a [[graft.operators.Numbering.runningBySort]] — range
    * shuffle + two linear passes. Everything stays integer until the
    * single closing division, so the value is engine-exact.
    *
    * Returns one row: (n_pos, n_neg, auc). If either class is empty
    * (n_pos·n_neg = 0) `auc` is NULL — AUC is undefined with no
    * cross-class pairs to rank (the 0/0 division yields SQL NULL, never
    * NaN); callers needing a hard failure should assert both counts.
    */
  def rocAuc(scored: DataFrame, score: String, label: Column): DataFrame = {
    val g = scored
      .groupBy(col(score).as("__s"))
      .agg(sum(label.cast("long")).as("__pos"),
        sum(lit(1L) - label.cast("long")).as("__neg"))
    // exclusive running count of rows strictly below each distinct score;
    // tied rows share the average rank cum + (cnt+1)/2 — doubled to stay
    // integral: 2·rank_sum(pos in group) = pos · (2·cum + cnt + 1)
    val cum = graft.operators.Numbering
      .runningBySort(g, "__s", col("__pos") + col("__neg"), "__cumIncl")
      .withColumn("__cum", col("__cumIncl") - (col("__pos") + col("__neg")))
    cum.agg(
        sum(col("__pos")).as("np"),
        sum(col("__neg")).as("nn"),
        sum(col("__pos") * (lit(2L) * col("__cum") + col("__pos") +
          col("__neg") + lit(1L))).as("r2"))
      .select(col("np").as("n_pos"), col("nn").as("n_neg"),
        ((col("r2").cast("double") / 2.0d -
          col("np").cast("double") * (col("np").cast("double") + 1.0d) / 2.0d) /
          (col("np").cast("double") * col("nn").cast("double"))).as("auc"))
  }

  /** Language-ID by stopword-set voting: the language whose marker-word set
    * has the highest hit count (word occurrences, duplicates counted) wins;
    * ties break to the ascending language name; documents hitting no marker
    * at all fall back to the alphabetically first language.
    *
    * This is the corpus-scale form (VERDICT r2 #7): ONE pass over the
    * words — explode → broadcast join against the (word, lang) marker
    * dimension → two partial-aggregating counts — instead of re-walking
    * the word array once per language with interpreted `filter`/`isin`
    * chains. Marker sets are data (a DataFrame), not literals baked into
    * the plan, so growing the language inventory changes no code and
    * recompiles no plans.
    *
    * `docs` must carry `idCol` and a lowercase word-array `wordsCol`;
    * returns the input columns plus `predicted`.
    */
  def languageIdByJoin(
      docs: DataFrame, idCol: String, wordsCol: String,
      markers: DataFrame): DataFrame = {
    val defaultLang = markers.agg(min(col("lang"))).collect()(0).getString(0)
    val hits = docs.select(col(idCol), explode(col(wordsCol)).as("word"))
      .join(broadcast(markers), Seq("word"))
      .groupBy(col(idCol), col("lang"))
      .agg(count(lit(1)).as("hits"))
    // argmax by (hits desc, lang asc) as one min over an orderable struct
    val best = hits.groupBy(col(idCol))
      .agg(min(struct((-col("hits")).as("nh"), col("lang").as("lang"))).as("b"))
      .select(col(idCol), col("b.lang").as("predicted"))
    docs.join(best, Seq(idCol), "left")
      .withColumn("predicted", coalesce(col("predicted"), lit(defaultLang)))
  }

  /** Column-form language ID for single-row / small-batch use (the REST
    * "identify this text" path). The per-language `filter` chain is
    * interpreted — for corpus jobs use [[languageIdByJoin]].
    */
  def languageId(text: Column, markers: Map[String, Seq[String]]): Column =
    languageIdFromWords(split(lower(trim(text)), "\\s+"), markers)

  /** languageId over a pre-tokenized lowercase word array. */
  def languageIdFromWords(words: Column, markers: Map[String, Seq[String]]): Column = {
    val scored = markers.toSeq.sortBy(_._1).map { case (lang, ws) =>
      struct(size(filter(words, w => w.isin(ws: _*))).as("hits"),
             lit(lang).as("lang"))
    }
    // strict-greater fold: first language in ascending name order wins ties
    val best = scored.reduce((a, b) =>
      when(b.getField("hits") > a.getField("hits"), b).otherwise(a))
    best.getField("lang")
  }

  /** Hashing-trick featurizer (the fastText / Vowpal-Wabbit input shape):
    * each lowercase token hashes to a bucket in [0, dim) via the repo's
    * portable md5-derived hash; the feature vector is the per-bucket token
    * count (multiplicity preserved). Returns ARRAY<BIGINT> length `dim`.
    *
    * Narrow one-pass fold — featurizing 100 TB is embarrassingly parallel
    * and never shuffles; the vector feeds [[linearScore]]-style models
    * directly. The fold is O(dim · tokens) in the interpreted HOF engine,
    * the right trade at classifier dims (8-256); past that, explode +
    * groupBy(id, bucket) pivots the cost onto one combinable shuffle.
    */
  def hashFeatures(text: Column, dim: Int): Column = {
    val ws = split(lower(trim(text)), "\\s+")
    // hash each token ONCE up front: the fold's inner transform runs per
    // accumulator element, so an idx(w) embedded there would recompute
    // the md5 dim times per token
    val idxs = transform(ws, w =>
      pmod(conv(substring(md5(w), 1, 15), 16, 10).cast("long"),
        lit(dim.toLong)))
    aggregate(idxs, array_repeat(lit(0L), dim),
      (acc, j) =>
        transform(acc, (c, i) => when(i.cast("long") === j, c + 1L).otherwise(c)))
  }

  /** Lazy (\_\_did, word, \_\_n) doc-word count dimension: the work unit
    * of [[unigramSurprisal]] — one map-side-combinable aggregation
    * collapsing the token stream to distinct (doc, word) pairs.
    */
  def docWordCountsPlan(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(col(id).as("__did"),
        explode(split(lower(trim(col(text))), "\\s+")).as("word"))
      .groupBy(col("__did"), col("word"))
      .agg(count(lit(1)).as("__n"))

  /** Corpus-derived unigram surprisal with cross-engine-exact integer
    * log2: bits(x) = length of x's binary representation = floor(log2 x)+1
    * (both engines' `bin()` agree digit-for-digit), so surprisal(w) =
    * bits(N) − bits(count_w) is the integer rarity score — the KenLM-ish
    * "how unusual is this document's vocabulary" filter signal without a
    * single float crossing engines.
    *
    * Plan at 100 TB: the work unit is the (id, word) COUNT, not the raw
    * token — one map-side-combinable aggregation collapses the token
    * stream to distinct (doc, word) pairs (Zipf: orders of magnitude
    * fewer), pinned once per call so the vocabulary rollup, the corpus
    * total, and the scoring join all reuse it instead of re-exploding the
    * corpus.
    * The word-keyed joins diffuse (no skew pole); the corpus text column
    * itself never shuffles — only (id, word, n) triples.
    *
    * Output: (id, n_tokens, surprisal_sum, mean_surprisal_bp) per doc,
    * mean in integer basis points (×10000, floor-divided).
    *
    * `docWordCountsPlan` is the lazy (\_\_did, word, \_\_n) dimension it
    * consumes, exposed so a session can materialize the tokenize+count
    * pass ONCE and share it.
    *
    * `docWordCounts`: optionally supply the (\_\_did, word, \_\_n)
    * doc-word count frame (e.g. an already-pinned session memo — the
    * r10 fix for the bench paying the pin inside every timed pass);
    * when supplied the CALLER owns its materialization and this call
    * pins nothing.
    */
  def unigramSurprisal(docs: DataFrame, id: String, text: String,
      docWordCounts: Option[DataFrame] = None): DataFrame = {
    val bits = (c: Column) => length(bin(c)).cast("long")
    val dw = docWordCounts.getOrElse(
      graft.operators.Pinning.pin(docWordCountsPlan(docs, id, text)))
    val vocabPlan = dw.groupBy(col("word")).agg(sum(col("__n")).as("__cnt"))
    // post-aggregation stats are unknown to Catalyst, so without a hint
    // the word-keyed join sort-merges BOTH sides. When the dimension is
    // materialized (caller-supplied memo) a cheap count gates an explicit
    // broadcast — vocab has at most as many rows as dw; a 100 TB corpus
    // vocabulary fails the gate and keeps the shuffle join.
    val vocab =
      if (docWordCounts.isDefined && dw.count() * 40L <= (64L << 20))
        broadcast(vocabPlan)
      else vocabPlan
    val totalBits = vocab.agg(bits(sum(col("__cnt"))).as("__nbits"))
    dw.join(vocab, Seq("word"))
      .crossJoin(broadcast(totalBits))
      .groupBy(col("__did"))
      .agg(sum(col("__n")).as("n_tokens"),
        sum(col("__n") * (col("__nbits") - bits(col("__cnt"))))
          .as("surprisal_sum"))
      .select(col("__did").as(id), col("n_tokens"), col("surprisal_sum"),
        expr("(surprisal_sum * 10000) div n_tokens").as("mean_surprisal_bp"))
  }

  /** Add-one bigram LM surprisal — the CCNet-posture LM quality filter
    * (perplexity under a corpus-trained n-gram model flags incoherent
    * text that unigram stats cannot: right words, wrong order) made
    * oracle-exact with the same integer floor-log2 scheme as
    * [[unigramSurprisal]]: P(w|p) = (c(p,w)+1)/(ctx(p)+V) with
    * surprisal bits(ctx(p)+V) − bits(c(p,w)+1), where ctx(p) is p's
    * total bigram-left occurrences and V the distinct next-word
    * vocabulary. No float log crosses the oracle boundary.
    *
    * Scale shape: bigrams form in ONE narrow per-row projection (the
    * word array zipped with its own tail — no positional self-join),
    * then one (doc, p, w) aggregation pinned per call; the model's
    * count dimensions (c(p,w), ctx(p)) stack on that aggregate, so the
    * token explode is scanned once, and V broadcasts back as a scalar.
    * Per-doc totals are a second aggregation of the SAME pinned frame —
    * the corpus never re-tokenizes.
    */
  def bigramSurprisal(docs: DataFrame, id: String, text: String): DataFrame = {
    val bits = (c: Column) => length(bin(c)).cast("long")
    val words = split(lower(trim(col(text))), "\\s+")
    val nb = greatest(size(words) - 1, lit(0))
    // Pin kept (r15 measured): a pin-free single plan only reuses db's
    // exchange for the FIRST consumer — column pruning gives ctxDim and
    // vocab differently-projected subtrees, so each re-runs the corpus
    // explode (2 extra full passes at scale, no local win either: 2.48 s
    // pinned vs ~2.45 s unpinned same-context). The corpus-sized pin is
    // the cheaper spelling of "tokenize once" here.
    val db = graft.operators.Pinning.pin(
      docs.select(col(id).as("__did"),
          explode(zip_with(slice(words, lit(1), nb), slice(words, lit(2), nb),
            (a, b) => struct(a.as("p"), b.as("w")))).as("__b"))
        .select(col("__did"), col("__b.p").as("p"), col("__b.w").as("w"))
        .groupBy(col("__did"), col("p"), col("w"))
        .agg(count(lit(1)).as("__n")))
    val bgDim = db.groupBy(col("p"), col("w")).agg(sum(col("__n")).as("__c"))
    val ctxDim = bgDim.groupBy(col("p")).agg(sum(col("__c")).as("__ctx"))
    val vocab = bgDim.agg(countDistinct(col("w")).as("__v"))
    db.join(bgDim, Seq("p", "w"))
      .join(ctxDim, Seq("p"))
      .crossJoin(broadcast(vocab))
      .groupBy(col("__did"))
      .agg(sum(col("__n")).as("n_bigrams"),
        sum(col("__n") * (bits(col("__ctx") + col("__v"))
          - bits(col("__c") + 1))).as("surprisal_sum"))
      .select(col("__did").as(id), col("n_bigrams"), col("surprisal_sum"),
        expr("(surprisal_sum * 10000) div n_bigrams").as("mean_surprisal_bp"))
  }

  /** BM25 ranked retrieval over the corpus for a small literal query-term
    * set — the lexical-search half of a hybrid (BM25 + ANN) retrieval
    * stack, and the standard relevance filter for targeted corpus audits.
    *
    * Scale posture (100 TB): the document side is ONE narrow pass —
    * tokenize, keep only query-term hits (the posting-scan filter runs
    * BEFORE any shuffle), then one (doc, term) aggregation. Corpus stats
    * (N, avgdl) and per-term document frequencies are tiny aggregates
    * broadcast back; the final global top-k is a TakeOrdered, never a
    * single-partition window. Docs with no query term never shuffle.
    *
    * Arithmetic notes for oracle replay: `k1 + 1` stays an ADDITION on
    * both engines (the decimal literal 2.2 rounds differently than
    * 1.2 + 1 in binary); scores round to 4 decimals at the edge.
    *
    * Output: top `k` of (id, score) by (score desc, id).
    */
  /** Frozen BM25 index statistics: corpus size, average doc length, and
    * per-query-term document frequencies — the tiny broadcast state that
    * scoring needs. Collected once (|terms|+2 scalars) so scoring can run
    * against a FROZEN index: batch re-ranking or stream scoring on ingest
    * without touching the corpus again.
    */
  def bm25Stats(
      docs: DataFrame, id: String, text: String,
      queryTerms: Seq[String]): Bm25Stats = {
    val withLen = docs.select(col(id).as("__did"),
        split(lower(trim(col(text))), "\\s+").as("__w"))
      .select(col("__did"), size(col("__w")).cast("double").as("__dl"),
        col("__w"))
    // avgdl from the EXACT integer length total (one division at the
    // end): avg() over doubles sums in partition order, and a ulp there
    // shifts every score
    val Array(n, avgdl) = withLen
      .agg(count(lit(1)).cast("double"),
        sum(col("__dl").cast("long")).cast("double") / count(lit(1)))
      .collect().head.toSeq.map(_.asInstanceOf[Double]).toArray
    val dfs = withLen
      .select(col("__did"), explode(col("__w")).as("word"))
      .filter(col("word").isin(queryTerms.map(_.toLowerCase): _*))
      .groupBy(col("word"))
      .agg(count_distinct(col("__did")).cast("double").as("__df"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    Bm25Stats(n, avgdl, queryTerms.map(_.toLowerCase).distinct
      .map(t => t -> dfs.getOrElse(t, 0.0)).toMap)
  }

  final case class Bm25Stats(n: Double, avgdl: Double, df: Map[String, Double])

  /** Binary-magnitude (libm-free) Robertson idf: with bits(x) =
    * floor(log2 x) + 1 over exact integers, idf = bits(2N+2) − bits(2df+1)
    * — the floor-log2 quantization of log2((N+1)/(df+0.5)), i.e. the
    * classic idf rebased to 2 and snapped to integer bits (the
    * text_unigram_surprisal kernel applied to idf). Replaces the r11
    * ln() chain (whitelist class C5, retired r12): integer binary-digit
    * counts reproduce bit-for-bit in any engine (DuckDB:
    * length(printf('%b', x))), so no libm value ever crosses the oracle.
    */
  def idfBits(n: Long, df: Long): Double =
    ((64 - java.lang.Long.numberOfLeadingZeros(2 * n + 2)) -
      (64 - java.lang.Long.numberOfLeadingZeros(2 * df + 1))).toDouble

  /** Column form of [[idfBits]]: length(bin(x)) is the binary digit
    * count of a positive long — codegen'd, no libm. */
  def idfBitsCol(n: Column, df: Column): Column =
    (length(bin(n.cast("long") * 2 + 2)) -
      length(bin(df.cast("long") * 2 + 1))).cast("double")

  /** Per-document BM25 score under FIXED stats — stateless and narrow
    * (term frequencies fold in-row over the token array; idf factors are
    * literals), so the same definition scores a batch or a document
    * STREAM unchanged. Docs with no query term score 0.
    */
  def bm25Score(
      docs: DataFrame, id: String, text: String, stats: Bm25Stats,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val w = split(lower(trim(col(text))), "\\s+")
    val dl = size(w).cast("double")
    val score = stats.df.toSeq.sortBy(_._1).map { case (term, dfv) =>
      val tf = size(filter(w, x => x === term)).cast("double")
      val idf = idfBits(stats.n.toLong, dfv.toLong)
      when(tf > 0,
        lit(idf) * tf * (lit(k1) + 1)
          / (tf + lit(k1) * (lit(1) - lit(b) + lit(b) * dl / lit(stats.avgdl))))
        .otherwise(lit(0.0))
    }.reduce(_ + _)
    docs.select(col(id), score.as("score"))
  }

  def bm25TopK(
      docs: DataFrame, id: String, text: String,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val withLen = docs.select(col(id).as("__did"),
        split(lower(trim(col(text))), "\\s+").as("__w"))
      .select(col("__did"), col("__w"),
        size(col("__w")).cast("double").as("__dl"))
    val hits = withLen
      .select(col("__did"), col("__dl"), explode(col("__w")).as("word"))
      .filter(col("word").isin(queryTerms.map(_.toLowerCase): _*))
      .groupBy(col("__did"), col("__dl"), col("word"))
      .agg(count(lit(1)).cast("double").as("__tf"))
    // exact integer length total, one division — see bm25Stats
    val stats = withLen.agg(count(lit(1)).cast("double").as("__n"),
      (sum(col("__dl").cast("long")).cast("double") / count(lit(1)))
        .as("__avgdl"))
    val dfs = hits.groupBy(col("word"))
      .agg(count(lit(1)).cast("double").as("__df"))
    hits
      .join(broadcast(dfs), Seq("word"))
      .crossJoin(broadcast(stats))
      .withColumn("__s",
        idfBitsCol(col("__n"), col("__df"))
          * col("__tf") * (lit(k1) + 1)
          / (col("__tf") + lit(k1) *
             (lit(1) - lit(b) + lit(b) * col("__dl") / col("__avgdl"))))
      .groupBy(col("__did"))
      // per-doc term scores fold in SORTED-TERM order (the per-doc term
      // list is bounded by the query size): a plain sum() adds in
      // partition order, which can differ run-to-run and from the oracle
      .agg(sort_array(collect_list(struct(col("word"), col("__s"))))
        .as("__ts"))
      .select(col("__did").as(id),
        aggregate(col("__ts"), lit(0.0),
          (acc, x) => acc + x.getField("__s")).as("score"))
      .orderBy(col("score").desc, col(id))
      .limit(k)
  }

  /** PII patterns chosen to behave IDENTICALLY under Java regex (Spark
    * codegen) and RE2 (DuckDB): character classes, bounded repetition,
    * ASCII \\b only — no backreferences, no lookaround (RE2 has
    * neither). (name, pattern, replacement).
    */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b", "<IP>"),
    ("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>"))

  /** PII scrubbing pass — the redaction stage every corpus release runs
    * before training (emails, IPs, national-id shapes). Per doc: one
    * match count per pattern (counted on the ORIGINAL text, independent
    * per pattern) and the scrubbed text with replacements applied in
    * pattern order. A pure narrow projection — codegen'd regex kernels,
    * no shuffle, embarrassingly parallel at any corpus size, and the
    * same Column works unchanged on a stream.
    */
  def piiScrub(docs: DataFrame, id: String, text: String,
      patterns: Seq[(String, String, String)] = piiPatterns): DataFrame = {
    val t = col(text)
    val counts = patterns.map { case (n, p, _) =>
      regexp_count(t, lit(p)).cast("long").as(s"n_$n") }
    val scrubbed = patterns.foldLeft(t) { case (acc, (_, p, r)) =>
      regexp_replace(acc, p, r) }
    docs.select(col(id) +: counts :+ scrubbed.as("scrubbed"): _*)
  }

  /** Global rank of a scored dimension-sized list: (id, rank) by
    * (score DESC, id ASC), via the bounded two-phase CollectTopK — the
    * map-side partial buffers hold at most `k` entries, so this never
    * becomes the single-partition global-sort window even when the
    * scored set is corpus-sized.
    */
  def rankByScore(df: DataFrame, id: String, score: String, k: Int): DataFrame =
    df.groupBy()
      .agg(org.apache.spark.sql.graft.ColumnBridge.collectBottomK(
        struct((-col(score)).as("neg"), col(id)), k).as("__tk"))
      .select(posexplode(col("__tk")).as(Seq("__i", "__t")))
      .select(col(s"__t.$id").as(id),
        (col("__i") + 1).cast("long").as("rank"))

  /** Per-GROUP top-k by (score DESC, id ASC) — best-exemplar selection
    * (top documents per domain, per language, per shard) with the same
    * bounded CollectBottomK state: map-side partial buffers hold at most
    * k entries PER GROUP, so this replaces the
    * `Window.partitionBy(group).orderBy(score)` + rank filter, whose
    * sort materializes every group's full membership. Output: group
    * columns + (id, score, rank ≤ k).
    */
  def rankByScoreGrouped(df: DataFrame, group: Seq[String], id: String,
      score: String, k: Int): DataFrame =
    df.groupBy(group.map(col): _*)
      .agg(org.apache.spark.sql.graft.ColumnBridge.collectBottomK(
        struct((-col(score)).as("neg"), col(id)), k).as("__tk"))
      .select(group.map(col) :+ posexplode(col("__tk")).as(Seq("__i", "__t")): _*)
      .select(group.map(col) ++ Seq(col(s"__t.$id").as(id),
        (-col("__t.neg")).as(score),
        (col("__i") + 1).cast("long").as("rank")): _*)

  /** Heaps-law vocabulary growth curve: cumulative token count vs
    * cumulative DISTINCT-token count at `buckets` evenly spaced corpus
    * prefixes (docs in id order) — the corpus-health report behind "is
    * more data still adding vocabulary?" (a flattening curve means new
    * crawl is redundant; V(n) ≈ K·n^β with β the Heaps exponent read
    * off the curve).
    *
    * The prefix-distinct count never recomputes per prefix: a token's
    * contribution lands at its FIRST-occurrence document (one groupBy
    * min per distinct token), per-doc new-vocab counts aggregate from
    * that, and both cumulative series are
    * [[graft.operators.Numbering.runningBySort]] range-shuffle passes —
    * no global window, no per-prefix rescans. Bucket ends read off with
    * max() since every series is nondecreasing in doc rank.
    *
    * Output: (bucket 1..buckets, docs, cum_tokens, cum_vocab).
    */
  def vocabGrowth(docs: DataFrame, id: String, text: String,
      buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    val words = Dedup.words(col(text))
    val perDocTok = docs.select(col(id).as("__id"),
      size(words).cast("long").as("__nt"))
    val newPerDoc = docs
      .select(col(id).as("__id"), explode(words).as("__t"))
      .groupBy(col("__t")).agg(min(col("__id")).as("__id"))
      .groupBy(col("__id")).agg(count(lit(1)).as("__nv"))
    val perDoc = perDocTok.join(newPerDoc, Seq("__id"), "left")
      .na.fill(0L, Seq("__nv"))
    val c1 = graft.operators.Numbering.runningBySort(
      perDoc, "__id", col("__nt"), "__ct")
    val c2 = graft.operators.Numbering.runningBySort(
      c1, "__id", col("__nv"), "__cv")
    val rn = graft.operators.Numbering.numberBySort(c2, "__id", "__rn")
    val tot = rn.agg(max(col("__rn")).as("__n"))
    rn.crossJoin(broadcast(tot))
      .withColumn("bucket",
        floor((col("__rn") * buckets + col("__n") - 1) / col("__n"))
          .cast("long"))
      .groupBy(col("bucket"))
      .agg(max(col("__rn")).as("docs"), max(col("__ct")).as("cum_tokens"),
        max(col("__cv")).as("cum_vocab"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009) —
    * the standard hybrid-retrieval combiner: each input list contributes
    * 1/(c + rank) per id; the fused order is the descending sum. This is
    * how a lexical (BM25) and a semantic (ANN) ranking merge into one
    * result list without score calibration — ranks, not scores, fuse.
    *
    * `lists` are (name, DataFrame(id, rank)) pairs, ranks 1-based.
    * Determinism: the per-id contributions fold in sorted (name, rank)
    * order (the bm25 sorted-term-fold discipline), so the summed doubles
    * replay bit-for-bit in any engine; the final top-k is the bounded
    * CollectTopK by (rrf DESC, id ASC). Scale shape: one union + one
    * aggregation keyed on id (map-side combinable), one k-bounded rank —
    * no windows, no global sorts.
    *
    * Output: (id, rrf, n_lists, fused_rank), top `k` by fused score.
    */
  def rrfFuse(lists: Seq[(String, DataFrame)], id: String, k: Int,
      c: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    val tagged = lists.map { case (n, df) =>
      df.select(col(id), col("rank").cast("long").as("__rank"),
        lit(n).as("__src"))
    }.reduce(_ unionByName _)
    val scored = tagged.groupBy(col(id))
      .agg(sort_array(collect_list(struct(col("__src"), col("__rank"))))
        .as("__rs"))
      .select(col(id),
        aggregate(col("__rs"), lit(0.0d), (acc, x) =>
          acc + lit(1.0d) /
            (lit(c.toDouble) + x.getField("__rank").cast("double")))
          .as("rrf"),
        size(col("__rs")).as("n_lists"))
    scored.groupBy()
      .agg(org.apache.spark.sql.graft.ColumnBridge.collectBottomK(
        struct((-col("rrf")).as("neg"), col(id), col("n_lists")), k)
        .as("__tk"))
      .select(posexplode(col("__tk")).as(Seq("__i", "__t")))
      .select(col(s"__t.$id").as(id), (-col("__t.neg")).as("rrf"),
        col("__t.n_lists").as("n_lists"),
        (col("__i") + 1).cast("long").as("fused_rank"))
  }

  /** Count-min sketch of the corpus token stream (Cormode & Muthukrishnan
    * 2005): `d` hash rows × `w` counters, bucket = md5(j + "|" + token)
    * mod w — the repo's portable hash, so the sketch (and every estimate
    * read from it) replays exactly in the oracle. Returns (j, b, c), at
    * most d·w rows.
    *
    * This is the bounded-memory frequency structure for 100 TB streams:
    * the aggregation state is d·w counters regardless of vocabulary size,
    * the (j, b) key space is tiny so hot tokens combine map-side, and
    * sketches from disjoint corpus shards MERGE by counter addition
    * (count-min is a linear sketch) — the same definition therefore runs
    * unchanged under Structured Streaming with `update` aggregation.
    */
  def cmsSketch(docs: DataFrame, text: String, d: Int, w: Int): DataFrame =
    docs.select(explode(split(lower(trim(col(text))), "\\s+")).as("__tok"))
      .select(col("__tok"), explode(sequence(lit(0), lit(d - 1))).as("j"))
      .groupBy(col("j"), cmsBucket(col("j"), col("__tok"), w).as("b"))
      .agg(count(lit(1)).as("c"))

  /** Row-j counter index of a token: md5(j + "|" + token) mod w. */
  def cmsBucket(j: Column, tok: Column, w: Int): Column =
    pmod(conv(substring(md5(
      concat(j.cast("string"), lit("|"), tok)), 1, 15), 16, 10).cast("long"),
      lit(w.toLong))

  /** Point estimates from a count-min sketch: for each candidate token,
    * min over the d row counters it hashes to — never an underestimate,
    * overestimate bounded by collisions (ε = e/w with probability
    * 1 − e^−d). The sketch is d·w rows and broadcasts; candidates stay
    * distributed.
    */
  def cmsEstimate(candidates: DataFrame, tok: String,
      sketch: DataFrame, d: Int, w: Int): DataFrame = {
    val keyed = candidates
      .select(col("*"), explode(sequence(lit(0), lit(d - 1))).as("j"))
      .withColumn("b", cmsBucket(col("j"), col(tok), w))
    keyed.join(broadcast(sketch), Seq("j", "b"))
      .groupBy(candidates.columns.map(col): _*)
      .agg(min(col("c")).as("n_cms"))
  }

  /** Rolling polynomial fingerprint (Karp-Rabin family) of the document:
    * hash = sum(byte_i * B^i mod P) over the first `prefix` chars —
    * content-stable, order-sensitive, cheap. Built-ins only.
    */
  def fingerprint(text: Column, prefix: Int = 64): Column = {
    val p = 1000000007L
    val bytes = transform(
      split(substring(text, 1, prefix), ""),
      c => ascii(c).cast("long"))
    aggregate(bytes, struct(lit(0L).as("h"), lit(1L).as("pow")),
      (acc, b) => struct(
        pmod(acc.getField("h") + b * acc.getField("pow"), lit(p)).as("h"),
        pmod(acc.getField("pow") * 131L, lit(p)).as("pow")),
      acc => acc.getField("h"))
  }

  // ---------------------------------------------------------------------
  // Longest repeated substring — the suffix-array statistic behind
  // within-document repetition removal (Lee et al. 2022, "Deduplicating
  // Training Data Makes Language Models Better", uses corpus-level suffix
  // arrays for the same reduction): LRS length == max LCP of
  // suffix-array-adjacent suffixes. Per document the array fits in one
  // task, so the right engine shape is a narrow codegen'd kernel (suffix
  // sort + one adjacent-LCP scan per row) — per-doc parallelism IS the
  // 100 TB posture; a single giant sequence would instead take the
  // prefix-doubling route (log n sort/re-rank rounds over (pos, rank)
  // pairs). Deterministic: bytewise suffix order (Spark and DuckDB both
  // compare binary), ties on the max take the lexicographically smallest
  // repeated substring.
  // ---------------------------------------------------------------------

  /** (lrs_len, lrs) of one string: suffix sort, adjacent LCP scan. */
  def lrs(t: String): (Int, String) = {
    val n = t.length
    if (n < 2) return (0, "")
    val sa = Array.tabulate(n)(identity)
    // suffix comparator over shared chars — O(n) worst per compare; docs
    // are bounded by the caller (the query truncates), so n^2 log n worst
    // stays small per row
    val cmp = new java.util.Comparator[Integer] {
      def compare(a: Integer, b: Integer): Int = {
        var i = a.intValue; var j = b.intValue
        while (i < n && j < n) {
          val c = t.charAt(i) - t.charAt(j)
          if (c != 0) return c
          i += 1; j += 1
        }
        (n - a.intValue) - (n - b.intValue)
      }
    }
    val boxed = sa.map(Integer.valueOf)
    java.util.Arrays.sort(boxed, cmp)
    var bestLen = 0
    var best = ""
    var k = 1
    while (k < n) {
      var i = boxed(k - 1).intValue; var j = boxed(k).intValue
      var l = 0
      while (i + l < n && j + l < n && t.charAt(i + l) == t.charAt(j + l)) l += 1
      if (l > bestLen) { bestLen = l; best = t.substring(i, i + l) }
      else if (l == bestLen && l > 0) {
        val cand = t.substring(i, i + l)
        if (cand < best) best = cand
      }
      k += 1
    }
    (bestLen, best)
  }

  def lrsRow(t: org.apache.spark.unsafe.types.UTF8String):
      org.apache.spark.sql.catalyst.InternalRow = {
    val (l, s) = lrs(t.toString)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](l, org.apache.spark.unsafe.types.UTF8String.fromString(s)))
  }

  case class Lrs(child: org.apache.spark.sql.catalyst.expressions.Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
    import org.apache.spark.sql.types._
    override def dataType: DataType = StructType(Seq(
      StructField("lrs_len", IntegerType, nullable = false),
      StructField("lrs", StringType, nullable = false)))
    override protected def withNewChildInternal(
        c: org.apache.spark.sql.catalyst.expressions.Expression) = copy(child = c)
    override def nullSafeEval(input: Any): Any =
      lrsRow(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.pipeline.TextAnalysis.lrsRow($c)")
  }

  def longestRepeatedSubstring(text: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(Lrs(
      org.apache.spark.sql.graft.ColumnBridge.expression(text)))
}
