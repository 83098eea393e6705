package graft.pipeline

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer induction (Sennrich et al. 2016 — the
  * subword-vocabulary step every pretraining pipeline runs before token
  * counting means anything) re-expressed as an iterative Spark job, plus
  * the greedy encode path under a learned merge table.
  *
  * Representation: a word is its symbol sequence joined by TWO spaces
  * ("h  e  l  l  o"). The alphabet is restricted to `[a-z]+` words (the
  * documented normalization — anything else is out of the subword
  * vocabulary), so the delimiter can never collide with symbol content,
  * and one `replace(' a  b ', ' ab ')` over the single-space-padded form
  * applies a merge to every non-overlapping occurrence left-to-right —
  * the exact leftmost-greedy semantics of the reference algorithm, and
  * identical between Spark's `StringReplace` and DuckDB's `replace`, so
  * the whole training recursion is replayable by the oracle.
  *
  * Scale posture (100 TB of text): training never iterates the corpus.
  * The corpus reduces ONCE to the word-frequency vocabulary (the standard
  * BPE preprocessing — one shuffle); each merge round is then (a) one
  * map-side-combinable pair-count aggregation over the vocab, (b) a
  * 1-row TakeOrdered argmax to the driver, and (c) a narrow
  * literal-inlined `replace` over the vocab (the kmeansTrain posture:
  * only the winning pair crosses the driver per round). Encoding is a
  * chain of `rounds` codegen'd string replaces per word — narrow, merges
  * inlined as literals, no shuffle, stream-safe.
  */
object Tokenizer {

  /** One learned merge: rank (1-based), the pair ("a b"), the fused
    * symbol ("ab"), and the weighted adjacency count that won the round.
    */
  final case class Merge(rank: Int, pair: String, merged: String, n: Long)

  /** `[a-z]+` tokens of a document — the normalized word stream the
    * subword vocabulary is induced from.
    */
  def alphaWords(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), w => w.rlike("^[a-z]+$"))

  /** Character-level symbol representation of a word (double-space join). */
  private def charRepr(w: Column): Column =
    concat_ws("  ", transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1))))

  /** Apply one learned merge to a repr column (leftmost non-overlapping). */
  private def applyMerge(repr: Column, pair: String): Column = {
    val pat = " " + pair.replace(" ", "  ") + " "
    val rep = " " + pair.replace(" ", "") + " "
    trim(replace(concat(lit(" "), repr, lit(" ")), lit(pat), lit(rep)))
  }

  /** The word-frequency vocabulary: the single corpus-wide reduction that
    * feeds every training round. (word, cnt), `[a-z]+` words only.
    */
  def wordFreq(docs: DataFrame, text: String): DataFrame =
    docs.select(explode(alphaWords(col(text))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))

  /** Learn `rounds` BPE merges from the corpus. Ties on the adjacency
    * count break by ascending pair string (total order — both engines
    * compare ascii binary), so the merge table is a pure function of the
    * corpus. Stops early if no adjacent pair remains.
    */
  def bpeTrain(docs: DataFrame, text: String, rounds: Int): Seq[Merge] = {
    val merges = ArrayBuffer.empty[Merge]
    var words = wordFreq(docs, text)
      .select(col("cnt"), charRepr(col("w")).as("repr")).cache()
    words.count()
    try {
      var r = 1
      var exhausted = false
      while (r <= rounds && !exhausted) {
        val syms = split(col("repr"), "  ")
        val best = words
          .select(col("cnt"), explode(zip_with(
              slice(syms, lit(1), size(syms) - 1),
              slice(syms, lit(2), size(syms) - 1),
              (a, b) => concat(a, lit(" "), b))).as("pair"))
          .groupBy(col("pair")).agg(sum(col("cnt")).as("n"))
          .orderBy(col("n").desc, col("pair").asc)
          .limit(1).collect()
        if (best.isEmpty) exhausted = true
        else {
          val pair = best(0).getString(0)
          merges += Merge(r, pair, pair.replace(" ", ""), best(0).getLong(1))
          val next = words
            .withColumn("repr", applyMerge(col("repr"), pair)).cache()
          next.count()
          words.unpersist()
          words = next
          r += 1
        }
      }
    } finally words.unpersist()
    merges.toSeq
  }

  /** Greedy BPE encode of one word under the learned merge table: the
    * merges are replayed in rank order (the standard encode semantics for
    * a rank-ordered merge list). Returns the symbol array. Narrow chain
    * of `merges.size` literal replaces — codegen'd, stream-safe.
    */
  def encodeWord(w: Column, merges: Seq[Merge]): Column = {
    val repr = merges.foldLeft(charRepr(w))((acc, m) => applyMerge(acc, m.pair))
    split(repr, "  ")
  }

  /** Per-document BPE token count under a learned merge table: the sum of
    * per-word symbol counts over the `[a-z]+` word stream (out-of-alphabet
    * words are outside the subword vocabulary by construction — documented
    * normalization, excluded on both engines). One narrow projection.
    */
  def bpeTokenCount(text: Column, merges: Seq[Merge]): Column =
    aggregate(alphaWords(text), lit(0L),
      (acc, w) => acc + size(encodeWord(w, merges)).cast("long"))

  // ---------------------------------------------------------------------
  // Greedy maximal-munch segmentation (MaxMatch) — the WordPiece
  // INFERENCE rule (Devlin et al. 2019 tokenization; also classic
  // maximum-matching segmentation) under a frequency-induced piece
  // vocabulary: at each position take the longest vocabulary piece that
  // matches, emit it, advance. Unlike BPE's merge-replay this encode is
  // a single left-to-right walk, so frozen-vocab tokenize-on-ingest costs
  // O(len * maxPieceLen) per word with zero string rewriting.
  //
  // Scale posture mirrors bpeTrain: the corpus reduces ONCE to the word
  // frequency vocabulary; piece induction explodes substrings of the
  // VOCAB (bounded), aggregates map-side, and ships topN rows to the
  // driver; encode inlines the piece set as a plan reference object into
  // a narrow per-row kernel — no shuffle, stream-safe.
  // ---------------------------------------------------------------------

  /** Induce the maximal-munch piece vocabulary: the `topN` substrings of
    * length 2..`maxLen` of the corpus word stream by weighted occurrence
    * count (each occurrence inside a word counts that word's frequency),
    * ties broken by ascending piece string. Single letters a-z are
    * implicitly in the vocabulary (every [a-z]+ word stays encodable).
    * Returns (piece, n) in rank order.
    */
  def maxMatchVocab(docs: DataFrame, text: String, topN: Int,
      maxLen: Int): Seq[(String, Long)] = {
    import org.apache.spark.sql.Row
    wordFreq(docs, text)
      .select(col("cnt"), explode(expr(
        s"""flatten(transform(filter(sequence(2, $maxLen), l -> length(w) >= l),
              l -> transform(sequence(1, length(w) - l + 1),
                i -> substring(w, i, l))))""")).as("p"))
      .groupBy(col("p")).agg(sum(col("cnt")).as("n"))
      .orderBy(col("n").desc, col("p").asc)
      .limit(topN)
      .collect()
      .map { case Row(p: String, n: Long) => (p, n) }
      .toSeq
  }

  /** The greedy walk over one word: longest vocabulary piece at each
    * position (single letters always match via the implicit alphabet;
    * the 1-char fallback is unreachable for [a-z]+ input but keeps the
    * kernel total). Returns the piece count.
    */
  def maxMatchWordCount(w: String, vocab: java.util.HashSet[String],
      maxLen: Int): Int = {
    val n = w.length
    var i = 0
    var count = 0
    while (i < n) {
      var l = math.min(maxLen, n - i)
      while (l > 1 && !vocab.contains(w.substring(i, i + l))) l -= 1
      i += l
      count += 1
    }
    count
  }

  /** The walk again, emitting the pieces (spec/inspection surface). */
  def maxMatchPieces(w: String, vocab: java.util.HashSet[String],
      maxLen: Int): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    val n = w.length
    var i = 0
    while (i < n) {
      var l = math.min(maxLen, n - i)
      while (l > 1 && !vocab.contains(w.substring(i, i + l))) l -= 1
      out += w.substring(i, i + l)
      i += l
    }
    out.toSeq
  }

  def maxMatchWordCountUtf(w: org.apache.spark.unsafe.types.UTF8String,
      vocab: java.util.HashSet[String], maxLen: Int): Int =
    maxMatchWordCount(w.toString, vocab, maxLen)

  /** Codegen'd per-word piece count under a frozen vocabulary. The piece
    * set rides the plan as a reference object (one HashSet per executor,
    * not per row).
    */
  case class MaxMatchCount(child: org.apache.spark.sql.catalyst.expressions.Expression,
      pieces: Seq[String], maxLen: Int)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

    @transient private lazy val set: java.util.HashSet[String] = {
      val s = new java.util.HashSet[String]()
      pieces.foreach(s.add)
      ('a' to 'z').foreach(c => s.add(c.toString))
      s
    }

    override def dataType: org.apache.spark.sql.types.DataType =
      org.apache.spark.sql.types.IntegerType
    override protected def withNewChildInternal(
        c: org.apache.spark.sql.catalyst.expressions.Expression) = copy(child = c)
    override def nullSafeEval(input: Any): Any =
      maxMatchWordCountUtf(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], set, maxLen)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("mmVocab", set, "java.util.HashSet")
      defineCodeGen(ctx, ev, c =>
        s"graft.pipeline.Tokenizer.maxMatchWordCountUtf($c, $ref, $maxLen)")
    }
  }

  /** Per-document maximal-munch token count over the [a-z]+ word stream. */
  def maxMatchTokenCount(text: Column, pieces: Seq[String], maxLen: Int): Column = {
    val B = org.apache.spark.sql.graft.ColumnBridge
    aggregate(alphaWords(text), lit(0L), (acc, w) =>
      acc + B.column(MaxMatchCount(B.expression(w), pieces, maxLen)).cast("long"))
  }

  // ---------------------------------------------------------------------
  // Unigram-LM Viterbi segmentation (Kudo 2018 inference): each word is
  // segmented into the MINIMUM-surprisal piece sequence over a lattice of
  // vocabulary pieces — the optimal-decode counterpart to maxmatch's
  // greedy walk, and the third induced-tokenizer family beside BPE.
  // Piece surprisal stays in integer floor-log2 bits (the house scheme),
  // so the lattice DP is exact integer shortest-path and the oracle
  // replays it as an unrolled per-position min recursion.
  // ---------------------------------------------------------------------

  /** Weighted corpus count of every single character of the word stream —
    * the implicit alphabet's unigram weights (the fallback pieces that
    * keep every word segmentable). One aggregation over the word vocab.
    */
  def charCounts(docs: DataFrame, text: String): Seq[(String, Long)] = {
    import org.apache.spark.sql.Row
    wordFreq(docs, text)
      .select(col("cnt"), explode(expr(
        "transform(sequence(1, length(w)), i -> substring(w, i, 1))")).as("p"))
      .groupBy(col("p")).agg(sum(col("cnt")).as("n"))
      .orderBy(col("p"))
      .collect().map { case Row(p: String, n: Long) => (p, n) }.toSeq
  }

  /** Integer piece costs from weighted counts: cost(p) = bits(T) −
    * bits(n(p)) with bits = binary digit count — the same floor-log2
    * surprisal every other integer-exact scorer here uses. `vocab` is the
    * multi-char piece table (e.g. [[maxMatchVocab]]) and `chars` the
    * alphabet weights; T sums over both.
    */
  def unigramCosts(vocab: Seq[(String, Long)],
      chars: Seq[(String, Long)]): Seq[(String, Long)] = {
    val all = vocab ++ chars
    val total = all.iterator.map(_._2).sum
    def bits(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    all.map { case (p, n) => (p, bits(total) - bits(n)) }
  }

  /** The per-word lattice DP. State p = next char to consume (0-based
    * here, 1-based in the oracle); an edge consumes a piece of length
    * 1..maxLen present in the cost table (single chars absent from the
    * table fall back to `fallback` — unreachable for corpus-derived
    * tables, which cover the alphabet by construction). The minimized
    * objective is the composite `cost · 2^20 + pieceCount`, additive per
    * edge, so min-composite = lexicographic (min cost, then fewest
    * pieces) as long as a word has < 2^20 pieces — and the SAME composite
    * is what the SQL replay minimizes, tie handling included.
    */
  def viterbiWordComposite(w: String,
      costs: java.util.HashMap[String, java.lang.Long], maxLen: Int,
      fallback: Long): Long = {
    val n = w.length
    val INF = Long.MaxValue / 4
    val best = Array.fill(n + 1)(INF)
    best(0) = 0L
    var i = 1
    while (i <= n) {
      var l = 1
      val lmax = math.min(maxLen, i)
      while (l <= lmax) {
        val j = i - l
        if (best(j) < INF) {
          val c = costs.get(w.substring(j, i))
          val cost: Long =
            if (c != null) c.longValue()
            else if (l == 1) fallback
            else -1L
          if (cost >= 0L) {
            val cand = best(j) + cost * 1048576L + 1L
            if (cand < best(i)) best(i) = cand
          }
        }
        l += 1
      }
      i += 1
    }
    best(n)
  }

  def viterbiWordCompositeUtf(w: org.apache.spark.unsafe.types.UTF8String,
      costs: java.util.HashMap[String, java.lang.Long], maxLen: Int,
      fallback: Long): Long =
    viterbiWordComposite(w.toString, costs, maxLen, fallback)

  /** Codegen'd per-word Viterbi composite under a frozen cost table (one
    * HashMap per executor via a plan reference object — the
    * [[MaxMatchCount]] posture).
    */
  case class ViterbiComposite(
      child: org.apache.spark.sql.catalyst.expressions.Expression,
      costs: Seq[(String, Long)], maxLen: Int)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

    @transient private lazy val map: java.util.HashMap[String, java.lang.Long] = {
      val m = new java.util.HashMap[String, java.lang.Long]()
      costs.foreach { case (p, c) => m.put(p, java.lang.Long.valueOf(c)) }
      m
    }
    private def fallback: Long = costs.iterator.map(_._2).max + 1L

    override def dataType: org.apache.spark.sql.types.DataType =
      org.apache.spark.sql.types.LongType
    override protected def withNewChildInternal(
        c: org.apache.spark.sql.catalyst.expressions.Expression) = copy(child = c)
    override def nullSafeEval(input: Any): Any =
      viterbiWordCompositeUtf(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
        map, maxLen, fallback)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("vitCosts", map, "java.util.HashMap")
      defineCodeGen(ctx, ev, c =>
        s"graft.pipeline.Tokenizer.viterbiWordCompositeUtf($c, $ref, $maxLen, ${fallback}L)")
    }
  }

  /** The optimal segmentation itself: forward DP (identical to
    * [[viterbiWordComposite]]) then a deterministic backtrack — at each
    * position take the LONGEST piece among edges achieving the optimal
    * composite (= smallest predecessor state; unique per predecessor
    * since the consumed substring is fixed by (j, i)). The SQL replay
    * backtracks with the same min-predecessor rule.
    */
  def viterbiPieces(w: String,
      costs: java.util.HashMap[String, java.lang.Long], maxLen: Int,
      fallback: Long): Seq[String] = {
    val n = w.length
    val INF = Long.MaxValue / 4
    val best = Array.fill(n + 1)(INF)
    best(0) = 0L
    var i = 1
    while (i <= n) {
      var l = 1
      val lmax = math.min(maxLen, i)
      while (l <= lmax) {
        val j = i - l
        if (best(j) < INF) {
          val c = costs.get(w.substring(j, i))
          val cost: Long =
            if (c != null) c.longValue()
            else if (l == 1) fallback
            else -1L
          if (cost >= 0L) {
            val cand = best(j) + cost * 1048576L + 1L
            if (cand < best(i)) best(i) = cand
          }
        }
        l += 1
      }
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var p = n
    while (p > 0) {
      var l = math.min(maxLen, p)
      var found = false
      while (l >= 1 && !found) {
        val j = p - l
        val c = costs.get(w.substring(j, p))
        val cost: Long =
          if (c != null) c.longValue()
          else if (l == 1) fallback
          else -1L
        if (cost >= 0L && best(j) < INF &&
            best(j) + cost * 1048576L + 1L == best(p)) {
          out += w.substring(j, p)
          p = j
          found = true
        } else l -= 1
      }
      if (!found) return Seq.empty // unreachable word (no fallback path)
    }
    out.reverse.toSeq
  }

  def viterbiPiecesUtf(w: org.apache.spark.unsafe.types.UTF8String,
      costs: java.util.HashMap[String, java.lang.Long], maxLen: Int,
      fallback: Long): org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      viterbiPieces(w.toString, costs, maxLen, fallback)
        .map(org.apache.spark.unsafe.types.UTF8String.fromString)
        .toArray[Any])

  /** Codegen'd optimal segmentation per word (array of pieces). */
  case class ViterbiPieceSeq(
      child: org.apache.spark.sql.catalyst.expressions.Expression,
      costs: Seq[(String, Long)], maxLen: Int)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

    @transient private lazy val map: java.util.HashMap[String, java.lang.Long] = {
      val m = new java.util.HashMap[String, java.lang.Long]()
      costs.foreach { case (p, c) => m.put(p, java.lang.Long.valueOf(c)) }
      m
    }
    private def fallback: Long = costs.iterator.map(_._2).max + 1L

    override def dataType: org.apache.spark.sql.types.DataType =
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, containsNull = false)
    override protected def withNewChildInternal(
        c: org.apache.spark.sql.catalyst.expressions.Expression) = copy(child = c)
    override def nullSafeEval(input: Any): Any =
      viterbiPiecesUtf(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
        map, maxLen, fallback)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("vitCosts", map, "java.util.HashMap")
      defineCodeGen(ctx, ev, c =>
        s"graft.pipeline.Tokenizer.viterbiPiecesUtf($c, $ref, $maxLen, ${fallback}L)")
    }
  }

  /** One hard-EM (Viterbi-EM) re-estimation round — the M-step of
    * unigram-LM training under hard assignments (SentencePiece's EM with
    * the E-step's posteriors collapsed to the optimal path, which keeps
    * every count an exact integer): segment every distinct word
    * optimally under the current costs, then recount piece usage
    * weighted by word frequency. Distributed end to end (the kernel
    * segments per word, the reduce is one aggregation over the word
    * vocab); only the re-estimated piece table — bounded by the cost
    * table's size — reaches the driver, the [[maxMatchVocab]] contract.
    * Output in (n DESC, piece ASC) rank order.
    */
  def unigramEmCounts(docs: DataFrame, text: String,
      costs: Seq[(String, Long)], maxLen: Int): Seq[(String, Long)] = {
    import org.apache.spark.sql.Row
    val B = org.apache.spark.sql.graft.ColumnBridge
    wordFreq(docs, text)
      .select(col("cnt"),
        explode(B.column(ViterbiPieceSeq(B.expression(col("w")), costs,
          maxLen))).as("p"))
      .groupBy(col("p")).agg(sum(col("cnt")).as("n"))
      .orderBy(col("n").desc, col("p").asc)
      .collect()
      .map { case Row(p: String, n: Long) => (p, n) }.toSeq
  }

  /** Whole-document composite: tokenize exactly like [[alphaWords]]
    * (trim, lowercase, split on whitespace runs, keep pure [a-z]+ words)
    * and sum the per-word Viterbi composites INSIDE the kernel. Safe to
    * sum raw composites: per-doc piece totals stay far below the 2^20
    * field boundary, so Σ(cost<<20 | pieces) = (Σcost)<<20 | (Σpieces).
    */
  def viterbiDocCompositeUtf(text: org.apache.spark.unsafe.types.UTF8String,
      costs: java.util.HashMap[String, java.lang.Long], maxLen: Int,
      fallback: Long): Long = {
    val s = text.toString.trim.toLowerCase(java.util.Locale.ROOT)
    var total = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
      val start = i
      var alpha = true
      while (i < n && !Character.isWhitespace(s.charAt(i))) {
        val c = s.charAt(i)
        if (c < 'a' || c > 'z') alpha = false
        i += 1
      }
      if (alpha && i > start)
        total += viterbiWordComposite(s.substring(start, i), costs, maxLen,
          fallback)
    }
    total
  }

  /** Codegen'd per-DOCUMENT Viterbi composite — the whole word loop runs
    * inside one generated call, where the per-word [[ViterbiComposite]]
    * wrapped in an `aggregate` HOF paid interpreted lambda + struct
    * boxing per word (the r10 100×-probe constant on
    * text_tokens_viterbi).
    */
  case class ViterbiDocComposite(
      child: org.apache.spark.sql.catalyst.expressions.Expression,
      costs: Seq[(String, Long)], maxLen: Int)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

    @transient private lazy val map: java.util.HashMap[String, java.lang.Long] = {
      val m = new java.util.HashMap[String, java.lang.Long]()
      costs.foreach { case (p, c) => m.put(p, java.lang.Long.valueOf(c)) }
      m
    }
    private def fallback: Long = costs.iterator.map(_._2).max + 1L

    override def dataType: org.apache.spark.sql.types.DataType =
      org.apache.spark.sql.types.LongType
    override protected def withNewChildInternal(
        c: org.apache.spark.sql.catalyst.expressions.Expression) = copy(child = c)
    override def nullSafeEval(input: Any): Any =
      viterbiDocCompositeUtf(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
        map, maxLen, fallback)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("vitCosts", map, "java.util.HashMap")
      defineCodeGen(ctx, ev, c =>
        s"graft.pipeline.Tokenizer.viterbiDocCompositeUtf($c, $ref, $maxLen, ${fallback}L)")
    }
  }

  /** Per-document Viterbi totals over the [a-z]+ word stream:
    * struct(cost = Σ min surprisal bits, pieces = Σ optimal piece count).
    * One narrow codegen'd projection — no shuffle, stream-safe.
    */
  def viterbiTokenStats(text: Column, costs: Seq[(String, Long)],
      maxLen: Int): Column = {
    val B = org.apache.spark.sql.graft.ColumnBridge
    val comp = B.column(ViterbiDocComposite(B.expression(text), costs, maxLen))
    struct(
      shiftright(comp, 20).as("cost"),
      comp.bitwiseAND(lit(1048575L)).as("pieces"))
  }
}
