package graft

import graft.pipeline.Tokenizer
import org.apache.spark.sql.functions._

/** BPE induction against the hand-walked classic corpus (the Sennrich
  * et al. running example, minus the end-of-word marker — documented in
  * Tokenizer's scaladoc): merge order, tie breaks, and the greedy encode
  * path are all pinned to hand-computed values.
  */
class TokenizerSpec extends SparkSpec {
  import spark.implicits._

  // low×5 lower×2 newest×6 widest×3 — one doc per word occurrence plus a
  // mixed doc exercising normalization (case, digits, punctuation-words).
  private def corpus = (
    Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
  ).zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")

  test("bpeTrain: merge table matches the hand computation incl. ties") {
    val merges = Tokenizer.bpeTrain(corpus, "text", 5)
    // r1: pair counts peak at 9 for both "e s" and "s t" (newest 6 +
    // widest 3); ascending-pair tie break picks "e s". r2: "es t" = 9.
    // r3: "l o" ties "o w" at 7 → "l o". r4: "lo w" = 7. r5: "e w"
    // ties "n e" (6) → "e w".
    assert(merges.map(m => (m.rank, m.pair, m.merged, m.n)) == Seq(
      (1, "e s", "es", 9L),
      (2, "es t", "est", 9L),
      (3, "l o", "lo", 7L),
      (4, "lo w", "low", 7L),
      (5, "e w", "ew", 6L)))
  }

  test("bpeTrain: normalization drops non-[a-z]+ words, case-folds") {
    val mixed = Seq((0L, "LOW low"), (1L, "l0w low-est low!")).toDF("doc_id", "text")
    val merges = Tokenizer.bpeTrain(mixed, "text", 1)
    // vocab is {low: 2} only → single pair round: "l o" (2) vs "o w" (2),
    // tie → "l o"
    assert(merges.map(m => (m.pair, m.n)) == Seq(("l o", 2L)))
  }

  test("bpeTrain: stops early when no adjacent pair remains") {
    val tiny = Seq((0L, "ab ab")).toDF("doc_id", "text")
    val merges = Tokenizer.bpeTrain(tiny, "text", 5)
    // round 1 fuses the only pair; rounds 2+ have single-symbol words only
    assert(merges.map(m => (m.pair, m.n)) == Seq(("a b", 2L)))
  }

  test("encodeWord: greedy rank-order replay, leftmost non-overlapping") {
    val merges = Tokenizer.bpeTrain(corpus, "text", 5)
    val enc = Seq("lowest", "newest", "aaa").toDF("w")
      .select(Tokenizer.encodeWord(col("w"), merges).as("syms"))
    // lowest: l o w e s t → es → est → lo → low → [low, est]
    // newest: n e w e s t → es → est → (no lo/low) → ew → [n, ew, est]
    // aaa: untouched by any merge → [a, a, a]
    assert(rows(enc).map(_.head) == Seq(
      Seq("low", "est"), Seq("n", "ew", "est"), Seq("a", "a", "a")))
  }

  test("bpeTokenCount: sums per-word symbol counts over [a-z]+ words") {
    val merges = Tokenizer.bpeTrain(corpus, "text", 5)
    val df = Seq("low lowest 123", "", "Widest!").toDF("t")
      .select(Tokenizer.bpeTokenCount(col("t"), merges).as("n"))
    // "low"→1, "lowest"→2, "123" out of alphabet; empty doc → 0;
    // "Widest!" fails [a-z]+ after folding (trailing '!') → 0
    assert(rows(df).map(_.head) == Seq(3L, 0L, 0L))
  }

  test("encode is lossless on random corpora: symbols concatenate back to the word") {
    val rnd = new scala.util.Random(7)
    // small alphabet → dense merge activity across all 8 rounds
    val words = Seq.fill(60)(
      Seq.fill(1 + rnd.nextInt(8))(('a' + rnd.nextInt(4)).toChar).mkString)
    val corpus = words.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val merges = Tokenizer.bpeTrain(corpus, "text", 8)
    assert(merges.nonEmpty)
    val bad = words.distinct.toDF("w")
      .select(col("w"),
        concat_ws("", Tokenizer.encodeWord(col("w"), merges)).as("rejoined"))
      .filter(col("w") =!= col("rejoined")).count()
    assert(bad == 0)
  }

  test("leftmost non-overlapping merge: a a a + (a,a) → [aa, a]") {
    val tiny = Seq((0L, "aaa aaa")).toDF("doc_id", "text")
    val merges = Tokenizer.bpeTrain(tiny, "text", 1)
    assert(merges.head.pair == "a a")
    val enc = Seq("aaa").toDF("w")
      .select(Tokenizer.encodeWord(col("w"), merges).as("syms"))
    assert(rows(enc).head.head == Seq("aa", "a"))
  }

  test("maxMatchVocab: weighted substring counts with (n desc, piece) ties") {
    // "lo" appears in low(5) and lower(2) = 7; "est" in newest(6)+widest(3)=9
    val v = Tokenizer.maxMatchVocab(corpus, "text", 100, 3).toMap
    assert(v("lo") == 7L)
    assert(v("est") == 9L)
    assert(v("new") == 6L)
    // occurrences inside a word each count: "aaa" has two "aa" spans
    val rep = Seq((0L, "aaa")).toDF("doc_id", "text")
    assert(Tokenizer.maxMatchVocab(rep, "text", 10, 2).toMap.apply("aa") == 2L)
  }

  test("maxMatch walk: longest piece wins, letters always encodable") {
    val set = new java.util.HashSet[String]()
    Seq("newest", "new", "est", "ne").foreach(set.add)
    ('a' to 'z').foreach(c => set.add(c.toString))
    // whole word in vocab → one piece
    assert(Tokenizer.maxMatchPieces("newest", set, 6) == Seq("newest"))
    // maxLen caps the munch: with maxLen=4 "newest" → new + est
    assert(Tokenizer.maxMatchPieces("newest", set, 4) == Seq("new", "est"))
    // greedy is not optimal (documented semantics): "nest" takes "ne",
    // leaving s+t singles rather than n+est
    assert(Tokenizer.maxMatchPieces("nest", set, 6) == Seq("ne", "s", "t"))
    // out-of-vocab letters fall back to singles
    assert(Tokenizer.maxMatchPieces("zq", set, 6) == Seq("z", "q"))
    assert(Tokenizer.maxMatchWordCount("newest", set, 4) == 2)
  }

  test("maxMatchTokenCount: per-doc sum over the [a-z]+ stream via codegen") {
    val pieces = Seq("low", "est", "new")
    val df = Seq((1L, "Low NEWest 42 foo-bar"), (2L, ""))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        Tokenizer.maxMatchTokenCount(col("text"), pieces, 6).as("n"))
      .orderBy(col("doc_id"))
    // doc1: low→1, newest→new+est=2; "42"/"foo-bar" dropped by [a-z]+
    assert(df.as[(Long, Long)].collect().toSeq == Seq((1L, 3L), (2L, 0L)))
  }

  test("maxMatch tokenize-on-ingest runs unchanged on a stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Seq((1L, "low lower newest"), (2L, "widest new est"))
    val pieces = Seq("low", "est", "new", "wid")
    def enc(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"),
        Tokenizer.maxMatchTokenCount(col("text"), pieces, 6).as("n"))
    val in = MemoryStream[(Long, String)]
    in.addData(docs: _*)
    val q = enc(in.toDF.toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("stream_mm_sink")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("stream_mm_sink")
    val batch = enc(docs.toDF("doc_id", "text"))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  private def vitStats(text: String, costs: Seq[(String, Long)],
      maxLen: Int = 6): (Long, Long) =
    Seq((1L, text)).toDF("doc_id", "text")
      .select(Tokenizer.viterbiTokenStats(col("text"), costs, maxLen).as("s"))
      .select(col("s.cost"), col("s.pieces"))
      .as[(Long, Long)].head()

  test("viterbi: optimal decode beats greedy left-to-right on the lattice") {
    // costs: ab=1, a=3, b=3 → "aab" = a|ab (cost 4, 2 pieces), not
    // a|a|b (9, 3); greedy longest-first from the left would take ab
    // first and strand nothing here, but cost-greedy a|a|b is beaten
    val costs = Seq(("ab", 1L), ("a", 3L), ("b", 3L))
    assert(vitStats("aab", costs) == ((4L, 2L)))
  }

  test("viterbi: equal-cost tie resolves to fewest pieces (composite min)") {
    // "aa": aa (cost 2, 1 piece) vs a|a (cost 2, 2 pieces) → aa
    val costs = Seq(("aa", 2L), ("a", 1L))
    assert(vitStats("aa", costs) == ((2L, 1L)))
  }

  test("viterbi: uncovered single chars fall back at maxCost+1") {
    // only b is priced (cost 1); 'a' falls back at 1+1=2
    val costs = Seq(("b", 1L))
    assert(vitStats("ab", costs) == ((3L, 2L)))
  }

  test("viterbi is never worse than maxmatch under uniform costs") {
    // with all pieces equally priced the composite minimizes PIECES, and
    // the optimum is <= any greedy walk, word by word
    val rnd = new scala.util.Random(7)
    val docs = (1L to 40L).map { i =>
      (i, Seq.fill(6)(Seq.fill(2 + rnd.nextInt(6))(
        ('a' + rnd.nextInt(3)).toChar).mkString).mkString(" "))
    }.toDF("doc_id", "text")
    val pieces = Seq("ab", "ba", "abc", "cab", "aa", "bb", "cc", "abab")
    val uniform = pieces.map((_, 1L)) ++
      Seq("a", "b", "c").map((_, 1L))
    val out = docs.select(
        Tokenizer.viterbiTokenStats(col("text"), uniform, 6)
          .getField("pieces").as("nv"),
        Tokenizer.maxMatchTokenCount(col("text"), pieces, 6).as("nm"))
      .as[(Long, Long)].collect()
    assert(out.forall { case (nv, nm) => nv <= nm },
      s"viterbi exceeded maxmatch: ${out.find { case (nv, nm) => nv > nm }}")
    assert(out.exists { case (nv, nm) => nv < nm },
      "fixture never exercised a strict improvement")
  }

  private def costMap(costs: Seq[(String, Long)]) = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    costs.foreach { case (p, c) => m.put(p, java.lang.Long.valueOf(c)) }
    m
  }

  test("viterbiPieces: backtrack returns the optimal path; ambiguity " +
      "resolves longest-piece-first") {
    val m = costMap(Seq(("ab", 1L), ("a", 3L), ("b", 3L)))
    assert(Tokenizer.viterbiPieces("aab", m, 6, 99L) == Seq("a", "ab"))
    // "aba" with ab=1, ba=1, a=2: ab|a and a|ba both cost 3 in 2 pieces;
    // the backtrack takes the LONGEST piece at the end → a|ba
    val amb = costMap(Seq(("ab", 1L), ("ba", 1L), ("a", 2L), ("b", 5L)))
    assert(Tokenizer.viterbiPieces("aba", amb, 6, 99L) == Seq("a", "ba"))
  }

  test("viterbiPieces is lossless and consistent with the composite") {
    val rnd = new scala.util.Random(11)
    val m = costMap(Seq(("ab", 1L), ("abc", 1L), ("bc", 2L), ("cab", 1L),
      ("a", 3L), ("b", 3L), ("c", 4L)))
    (1 to 200).foreach { _ =>
      val w = Seq.fill(1 + rnd.nextInt(10))(('a' + rnd.nextInt(3)).toChar)
        .mkString
      val ps = Tokenizer.viterbiPieces(w, m, 6, 8L)
      assert(ps.mkString == w, s"not a segmentation of $w: $ps")
      val comp = Tokenizer.viterbiWordComposite(w, m, 6, 8L)
      assert((comp & 1048575L) == ps.length,
        s"$w: path pieces ${ps.length} != composite ${comp & 1048575L}")
    }
  }

  test("unigramEmCounts: hand-checked hard-EM recount conserves pieces") {
    // corpus: "ab ab b"×2 docs → word freqs ab=4, b=2; costs make "ab"
    // the optimal single piece and chars the only alternative
    val docs = Seq((1L, "ab ab b"), (2L, "ab ab b")).toDF("doc_id", "text")
    val costs = Seq(("ab", 1L), ("a", 3L), ("b", 3L))
    val out = Tokenizer.unigramEmCounts(docs, "text", costs, 6)
    assert(out == Seq(("ab", 4L), ("b", 2L)))
  }

  test("viterbi tokenize-on-ingest runs unchanged on a stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Seq((1L, "low lower newest"), (2L, "widest new est"))
    val costs = Seq(("low", 2L), ("est", 2L), ("new", 2L), ("wid", 2L)) ++
      ('a' to 'z').map(c => (c.toString, 5L))
    def enc(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"),
        Tokenizer.viterbiTokenStats(col("text"), costs, 6).as("s"))
        .select(col("doc_id"), col("s.cost").as("c"), col("s.pieces").as("n"))
    val in = MemoryStream[(Long, String)]
    in.addData(docs: _*)
    val q = enc(in.toDF.toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("stream_vit_sink")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("stream_vit_sink")
    val batch = enc(docs.toDF("doc_id", "text"))
    assert(streamed.count() == 2 &&
      streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("viterbiDocComposite == sum of per-word composites under the " +
      "alphaWords tokenization (the r10 whole-doc kernel rewrite)") {
    val costs = Seq(("low", 2L), ("est", 2L), ("new", 2L), ("wid", 2L)) ++
      ('a' to 'z').map(c => (c.toString, 5L))
    val m = new java.util.HashMap[String, java.lang.Long]()
    costs.foreach { case (k, v) => m.put(k, java.lang.Long.valueOf(v)) }
    val fb = costs.map(_._2).max + 1L
    val texts = Seq(
      "low lower newest",
      "  Mixed CASE and    runs\tof whitespace  ",
      "digits1 stay out a1b but pure words count",
      "", "   ", "one",
      "punct, words! drop; clean words stay")
    texts.foreach { t =>
      val words = t.trim.toLowerCase(java.util.Locale.ROOT)
        .split("\\s+").filter(w => w.nonEmpty && w.forall(c => c >= 'a' && c <= 'z'))
      val expected = words.map(w =>
        Tokenizer.viterbiWordComposite(w, m, 6, fb)).sum
      val got = Tokenizer.viterbiDocCompositeUtf(
        org.apache.spark.unsafe.types.UTF8String.fromString(t), m, 6, fb)
      assert(got == expected, s"text='$t'")
    }
  }
}
