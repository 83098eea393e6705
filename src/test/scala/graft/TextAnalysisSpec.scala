package graft

import graft.pipeline.TextAnalysis
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount: whitespace tokens, robust to padding") {
    val df = Seq("one two  three", "  lead trail  ", "single").toDF("t")
      .select(TextAnalysis.tokenCount(col("t")).as("n"))
    assert(rows(df).map(_.head) == Seq(3, 2, 1))
  }

  test("chunks: overlapping windows with 1-based offsets") {
    // 10 chars, window 4, stride 3 → starts 1,4,7,10
    val df = Seq("abcdefghij").toDF("t")
      .select(posexplode(TextAnalysis.chunks(col("t"), 4, 3))
        .as(Seq("i", "c")))
      .select(col("i"), col("c.start"), col("c.chunk"))
    assert(rows(df) == Seq(
      Seq(0, 1L, "abcd"), Seq(1, 4L, "defg"),
      Seq(2, 7L, "ghij"), Seq(3, 10L, "j")))
  }

  test("chunks: empty text yields one empty chunk, never drops the doc") {
    val df = Seq("").toDF("t")
      .select(posexplode(TextAnalysis.chunks(col("t"), 4, 3))
        .as(Seq("i", "c")))
      .select(col("c.start"), col("c.chunk"))
    assert(rows(df) == Seq(Seq(1L, "")))
  }

  test("trainValTestSplit: deterministic, stable under corpus growth") {
    import graft.pipeline.Curation
    val small = (1L to 50L).toDF("id")
      .select(col("id"), Curation.trainValTestSplit(col("id"), 8000, 1000)
        .as("split"))
      .as[(Long, String)].collect().toMap
    val grown = (1L to 200L).toDF("id")
      .select(col("id"), Curation.trainValTestSplit(col("id"), 8000, 1000)
        .as("split"))
      .as[(Long, String)].collect().toMap
    // every originally-assigned row keeps its split when the corpus grows
    assert(small.forall { case (id, s) => grown(id) == s })
    assert(grown.values.toSet.subsetOf(Set("train", "valid", "test")))
  }

  test("exactAllocationSplit: Hamilton apportionment is exact per stratum; " +
      "assignment is total, disjoint, and partitioning-insensitive") {
    import graft.pipeline.Curation
    // strata sized so remainders matter: 7 docs → quotas 5.6/0.7/0.7,
    // floors 5/0/0, remainder 2 seats to the two 0.7s (valid, test) →
    // (5,1,1); 10 docs → exact (8,1,1); 3 docs → 2.4/0.3/0.3, the one
    // remainder seat to train's 0.4 → (3,0,0)
    val docs = ((1L to 7L).map(i => (i, "a")) ++
      (11L to 20L).map(i => (i, "b")) ++
      (31L to 33L).map(i => (i, "c"))).toDF("id", "s")
    val ways = Seq(("train", 8000), ("valid", 1000), ("test", 1000))
    val out = Curation.exactAllocationSplit(docs, "id", "s", ways)
    val counts = out.groupBy(col("s"), col("way")).count()
      .as[(String, String, Long)].collect()
      .map { case (s, w, n) => (s, w) -> n }.toMap
    assert(counts == Map(
      ("a", "train") -> 5L, ("a", "valid") -> 1L, ("a", "test") -> 1L,
      ("b", "train") -> 8L, ("b", "valid") -> 1L, ("b", "test") -> 1L,
      ("c", "train") -> 3L), s"allocation: $counts")
    // total and disjoint: every doc assigned exactly once
    assert(out.select(col("id")).distinct().count() == 20 &&
      out.count() == 20)
    // partitioning-insensitive: identical assignment from a skewed layout
    val re = Curation.exactAllocationSplit(docs.repartition(7), "id", "s", ways)
      .select(col("id"), col("way")).as[(Long, String)].collect().toMap
    val base = out.select(col("id"), col("way"))
      .as[(Long, String)].collect().toMap
    assert(re == base)
  }

  test("tokenBudgetSelect: prefix fill in score order, monotone in budget, " +
      "partitioning-insensitive") {
    import graft.pipeline.Curation
    // score order: 4(.9) → 1(.8) → 2(.5, id tiebreak) → 3(.5) → 5(.1)
    val docs = Seq(
      (1L, 0.8, 100L), (2L, 0.5, 80L), (3L, 0.5, 50L),
      (4L, 0.9, 40L), (5L, 0.1, 10L)).toDF("id", "sc", "tok")
    def sel(b: Long) = Curation.tokenBudgetSelect(
        docs, "id", col("sc"), col("tok"), b)
      .select(col("id"), col("cum_tokens")).as[(Long, Long)].collect().toMap
    // budget 200: 4(40) + 1(140) fit; 2 overflows (220), and 3/5 (which
    // WOULD fit at 50/10 tokens) are NOT back-filled — prefix semantics
    assert(sel(200) == Map(4L -> 40L, 1L -> 140L))
    // monotone: a larger budget only adds documents (280 admits all five:
    // cums 40, 140, 220, 270, 280)
    val s280 = sel(280)
    assert(s280.keySet == Set(1L, 2L, 3L, 4L, 5L) &&
      sel(200).keySet.subsetOf(s280.keySet))
    // stable under a skewed layout
    assert(Curation.tokenBudgetSelect(docs.repartition(5), "id",
      col("sc"), col("tok"), 200)
      .select(col("id"), col("cum_tokens")).as[(Long, Long)]
      .collect().toMap == sel(200))
  }

  test("rankByScoreGrouped: per-group top-k, score desc / id asc ties, " +
      "groups shorter than k emit all members") {
    val df = Seq(
      ("a", 1L, 0.5), ("a", 2L, 0.9), ("a", 3L, 0.9), ("a", 4L, 0.1),
      ("b", 5L, 0.7)).toDF("g", "id", "sc")
    val got = TextAnalysis.rankByScoreGrouped(df, Seq("g"), "id", "sc", 2)
      .as[(String, Long, Double, Long)].collect().toSet
    assert(got == Set(
      ("a", 2L, 0.9, 1L), ("a", 3L, 0.9, 2L), ("b", 5L, 0.7, 1L)))
  }

  test("ringShard: adding a shard moves docs ONLY onto the new shard, " +
      "a small fraction; removing it restores the original assignment") {
    import graft.pipeline.Curation
    val docs = (1L to 2000L).toDF("id")
    val plan = docs.select(col("id"),
        Curation.ringShard(col("id"), 8, 16).as("s8"),
        Curation.ringShard(col("id"), 9, 16).as("s9"))
      .as[(Long, Int, Int)].collect()
    val moved = plan.filter(p => p._2 != p._3)
    // the consistent-hashing guarantee: every moved doc lands on shard 8
    assert(moved.forall(_._3 == 8), "a doc moved between OLD shards")
    // expected fraction ≈ 1/9; deterministic, bound it loosely
    assert(moved.length > 0 && moved.length < 2000 / 4,
      s"moved ${moved.length}/2000")
    // all old shards stay populated (uniformity sanity)
    assert(plan.map(_._2).toSet == (0 until 8).toSet)
  }

  test("vocabGrowth: first-occurrence accounting — repeated tokens add " +
      "to cum_tokens but never to cum_vocab; bucket ends are prefixes") {
    // doc1: 3 tokens, 3 new; doc2: 2 tokens, 1 new (b, c seen);
    // doc3: 2 tokens, 0 new
    val docs = Seq(
      (1L, "a b c"), (2L, "b d"), (3L, "a d")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabGrowth(docs, "doc_id", "text", buckets = 3)
      .orderBy(col("bucket"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 3L, 3L), (2L, 2L, 5L, 4L), (3L, 3L, 7L, 4L)))
    // one bucket = whole-corpus totals
    val tot = TextAnalysis.vocabGrowth(docs, "doc_id", "text", buckets = 1)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(tot == Seq((1L, 3L, 7L, 4L)))
  }

  test("packSequences: next-fit fill, oversize doc isolated") {
    import graft.pipeline.Curation
    // cap 256: 100+100 fit, third 100 opens bin 1; the 300-token doc
    // can't share → bin 2 alone; the 10-token tail opens bin 3
    val docs = Seq(
      ("A", 1L, 100L), ("A", 2L, 100L), ("A", 3L, 100L),
      ("A", 4L, 300L), ("A", 5L, 10L),
      ("B", 6L, 50L), ("B", 7L, 50L)).toDF("shard", "doc_id", "t")
    val got = Curation.packSequences(docs, "shard", "doc_id", col("t"), 256L)
      .as[(String, Long, Int)].collect().toSet
    assert(got == Set(
      ("A", 1L, 0), ("A", 2L, 0), ("A", 3L, 1),
      ("A", 4L, 2), ("A", 5L, 3),
      ("B", 6L, 0), ("B", 7L, 0)))
  }

  test("packSequences matches a reference fold on random corpora") {
    import graft.pipeline.Curation
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 3) {
      val docs = (1 to 60).map { i =>
        (s"s${rnd.nextInt(4)}", i.toLong, rnd.nextInt(400).toLong)
      }
      val cap = 256L
      // straightforward sequential reference: per shard, ascending id
      val expected = docs.groupBy(_._1).flatMap { case (sh, ds) =>
        var bin = 0; var fill = 0L
        ds.sortBy(_._2).zipWithIndex.map { case ((_, id, t), i) =>
          if (i > 0 && fill + t > cap) { bin += 1; fill = t }
          else fill += t
          (sh, id, bin)
        }
      }.toSet
      val got = Curation.packSequences(
          docs.toDF("shard", "doc_id", "t"), "shard", "doc_id", col("t"), cap)
        .as[(String, Long, Int)].collect().toSet
      assert(got == expected)
    }
  }

  test("chunks matches substring reference on random texts") {
    val rnd = new scala.util.Random(29)
    val texts = (1 to 20).map(_ =>
      rnd.alphanumeric.take(rnd.nextInt(40)).mkString)
    val (w, st) = (7, 5)
    val expected = texts.zipWithIndex.flatMap { case (t, i) =>
      (1 to math.max(t.length, 1) by st).map(s =>
        (i.toLong, s.toLong, t.slice(s - 1, s - 1 + w)))
    }.toSet
    val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
      .select(col("id"), explode(TextAnalysis.chunks(col("t"), w, st)).as("c"))
      .select(col("id"), col("c.start"), col("c.chunk"))
      .as[(Long, Long, String)].collect().toSet
    assert(got == expected)
  }

  test("contamination: only docs sharing an n-gram with the eval set flag") {
    import graft.pipeline.Curation
    val docs = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "a slow red fox sleeps"),
      (3L, "entirely unrelated words here")).toDF("doc_id", "text")
    val eval = Seq((99L, "said the quick brown fox ran")).toDF("doc_id", "text")
    val got = Curation.contamination(docs, "doc_id", "text", eval, 3)
      .as[(Long, Long)].collect().toMap
    // doc 1 shares "the quick brown" and "quick brown fox"; docs 2, 3 none
    assert(got == Map(1L -> 2L))
  }

  test("qualityFeatures: golden ratios") {
    val df = Seq("The cat, the hat.").toDF("t")
      .select(TextAnalysis.qualityFeatures(col("t"),
        Seq("the", "a", "an")).as("f"))
      .select(col("f.n_tokens"), round(col("f.stopword_ratio"), 4),
        round(col("f.punct_ratio"), 4))
    // tokens: [The, "cat,", the, "hat."] = 4; lowered bare "the" matches
    // twice -> 2/4; punct chars "," "." -> 2/17
    assert(rows(df).head == Seq(4.0, 0.5, BigDecimal(2.0 / 17)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
  }

  test("qualityFeatures stopword ratio counts exact lowercase word matches") {
    val df = Seq("the THE the, banana").toDF("t")
      .select(TextAnalysis.qualityFeatures(col("t"), Seq("the")).as("f"))
      .select(round(col("f.stopword_ratio"), 4))
    // tokens: [the, the, "the,", banana] — "the," does not exact-match
    assert(rows(df).head.head == 0.5)
  }

  test("languageId: highest marker-hit language wins; ties break ascending") {
    val markers = Map("en" -> Seq("the", "and"), "de" -> Seq("der", "und"))
    val df = Seq("the cat and the dog", "der hund und die katze", "x y z")
      .toDF("t").select(TextAnalysis.languageId(col("t"), markers).as("l"))
    assert(rows(df).map(_.head) == Seq("en", "de", "de")) // 0-0 tie -> "de" first
  }

  test("fingerprint: deterministic, order-sensitive, prefix-bound") {
    val df = Seq("abc", "abc", "acb", "abc" + ("x" * 100)).toDF("t")
      .select(TextAnalysis.fingerprint(col("t")).as("fp"))
    val fps = rows(df).map(_.head.asInstanceOf[Long])
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
    // only first 64 chars contribute
    val df2 = Seq("abc" + ("x" * 100), "abc" + ("x" * 61) + "ZZZ").toDF("t")
      .select(TextAnalysis.fingerprint(col("t")).as("fp"))
    val f2 = rows(df2).map(_.head.asInstanceOf[Long])
    assert(f2(0) == f2(1))
  }

  test("languageIdByJoin agrees with the column form, ties and no-hit included") {
    val markers = Map(
      "en" -> Seq("the", "and"), "fr" -> Seq("le", "des"),
      "zh" -> Seq("shi", "le"))
    val docs = Seq(
      (1L, "the cat and the dog"),   // clear en
      (2L, "le chat des bois"),      // clear fr
      (3L, "le shi"),                // tie fr/zh (1 each... le counts both)
      (4L, "nothing matches here"),  // zero hits -> first lang asc
      (5L, "")).toDF("doc_id", "text")
      .withColumn("words", split(lower(trim(col("text"))), "\\s+"))
    val markerDim = markers.toSeq
      .flatMap { case (l, ws) => ws.map(w => (w, l)) }.toDF("word", "lang")
    val joined = TextAnalysis.languageIdByJoin(docs, "doc_id", "words", markerDim)
      .select(col("doc_id"), col("predicted")).as[(Long, String)].collect().toMap
    val columnForm = docs
      .select(col("doc_id"),
        TextAnalysis.languageIdFromWords(col("words"), markers).as("p"))
      .as[(Long, String)].collect().toMap
    assert(joined == columnForm)
  }

  test("subwordCount splits on punctuation boundaries") {
    val df = Seq("don't stop-me now").toDF("t")
      .select(TextAnalysis.subwordCount(col("t")).as("n"))
    // pieces: don | ' | t | stop | - | me | now
    assert(rows(df).head.head == 7)
  }

  test("temperatureMix flattens a skewed source distribution toward sqrt shares") {
    import graft.pipeline.Curation
    // 400 docs in 'big', 16 in 'small' → 25:1 raw, 20:4 = 5:1 in sqrt
    // weight, so the kept ratio must flatten to ~5:1 (hash noise aside)
    val docs = ((1L to 400L).map(i => (i, "big")) ++
      (401L to 416L).map(i => (i, "small"))).toDF("doc_id", "source")
    val kept = Curation.temperatureMix(docs, "doc_id", "source")
      .groupBy(col("source")).count()
      .as[(String, Long)].collect().toMap
    val ratio = kept("big").toDouble / kept("small")
    assert(ratio < 12.0, s"kept ratio $ratio did not flatten (raw was 25)")
    assert(kept("small") >= 8, s"tail source starved: ${kept("small")}")
    // deterministic: rerun keeps the identical set
    val again = Curation.temperatureMix(docs, "doc_id", "source")
      .select(col("doc_id")).as[Long].collect().toSet
    val first = Curation.temperatureMix(docs, "doc_id", "source")
      .select(col("doc_id")).as[Long].collect().toSet
    assert(again == first)
  }

  test("epochMix emits floor(w) epochs plus a deterministic fractional extra") {
    import graft.pipeline.Curation
    val docs = (1L to 40L).map(i => (i, if (i <= 20) "a" else "b"))
      .toDF("doc_id", "source")
    val weights = Seq(("a", 20000L), ("b", 15000L)).toDF("source", "epochs_bp")
    val out = Curation.epochMix(docs, "doc_id", "source", weights)
      .select(col("doc_id"), col("source"), col("epoch"))
      .as[(Long, String, Long)].collect()
    val perDoc = out.groupBy(_._1).view.mapValues(_.length).toMap
    // integer weight: exactly 2 epochs each, epochs numbered 1..2
    assert((1L to 20L).forall(perDoc(_) == 2))
    // fractional 1.5x: every doc 1 or 2 epochs, both outcomes occur
    val bCounts = (21L to 40L).map(perDoc)
    assert(bCounts.forall(c => c == 1 || c == 2))
    assert(bCounts.exists(_ == 1) && bCounts.exists(_ == 2))
    // epochs are 1-based and dense
    assert(out.filter(_._1 == 1L).map(_._3).sorted.toSeq == Seq(1L, 2L))
    // deterministic: a second run emits the identical multiset
    val again = Curation.epochMix(docs, "doc_id", "source", weights)
      .select(col("doc_id"), col("source"), col("epoch"))
      .as[(Long, String, Long)].collect()
    assert(out.sorted.toSeq == again.sorted.toSeq)
  }

  test("hashFeatures: md5-bucket token counts, multiplicity preserved") {
    val df = Seq("Apple banana apple cherry").toDF("t")
      .select(TextAnalysis.hashFeatures(col("t"), 16).as("f"))
    val f = df.as[Seq[Long]].collect().head
    def bucket(w: String): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex.take(15), 16) % 16).toInt
    }
    val expected = Array.fill(16)(0L)
    Seq("apple", "banana", "apple", "cherry") // lowercased, dups counted
      .foreach(w => expected(bucket(w)) += 1)
    assert(f.size == 16 && f.sum == 4)
    assert(f.toSeq == expected.toSeq)
  }

  test("unigramSurprisal: integer-log2 golden on a hand corpus") {
    // counts: a=3, b=1, c=1; N=5 → bits(5)=3, bits(3)=2, bits(1)=1
    // doc1 "a a b": (3-2)+(3-2)+(3-1)=4 over 3 tokens → 13333 bp (floored)
    // doc2 "a c":   (3-2)+(3-1)=3 over 2 tokens → 15000 bp
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramSurprisal(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 3L, 4L, 13333L)))
    assert(out(1) == ((2L, 2L, 3L, 15000L)))
  }

  test("bigramSurprisal: integer-log2 golden; rare transitions score higher") {
    // bigram counts: (a,b)=3, (b,a)=3, (a,c)=1; ctx(a)=4, ctx(b)=3; V=3
    // S(a,b)=bits(7)-bits(4)=0, S(b,a)=bits(6)-bits(4)=0,
    // S(a,c)=bits(7)-bits(2)=1
    // doc1 "a b a b a b": 5 bigrams, sum 0 → 0 bp
    // doc2 "b a c": 2 bigrams, sum 1 → 5000 bp (the rare transition)
    val docs = Seq((1L, "a b a b a b"), (2L, "b a c")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramSurprisal(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 5L, 0L, 0L)))
    assert(out(1) == ((2L, 2L, 1L, 5000L)))
    // single-word and empty docs produce no bigrams and drop out
    val edge = Seq((3L, "solo"), (4L, "")).toDF("doc_id", "text")
    assert(TextAnalysis.bigramSurprisal(edge, "doc_id", "text").count() == 0)
  }

  test("hostCap: at most cap per host, deterministic, stable under growth") {
    import graft.pipeline.Curation
    val docs = (1L to 99L)
      .map(i => (i, s"https://h${i % 3}.example.com/p/$i"))
      .toDF("doc_id", "url")
    val out = Curation.hostCap(docs, "doc_id", "url", cap = 10)
    assert(out.select("host").distinct().as[String].collect().toSet ==
      Set("h0.example.com", "h1.example.com", "h2.example.com"))
    val kept = out.filter(col("keep"))
      .select("host", "doc_id").as[(String, Long)].collect()
    assert(kept.groupBy(_._1).forall(_._2.length == 10)) // 33 docs/host
    // growth stability: with a larger cap the kept set only grows — the
    // hash ranking is a pure row function, so the top-10 prefix survives
    val kept20 = Curation.hostCap(docs, "doc_id", "url", cap = 20)
      .filter(col("keep"))
      .select("host", "doc_id").as[(String, Long)].collect()
    assert(kept.toSet.subsetOf(kept20.toSet))
  }

  test("percentileGate: exact percentile_disc cut per stratum") {
    import graft.pipeline.Curation
    val docs = Seq(("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 3L),
      ("a", 4L, 4L), ("a", 5L, 5L), ("b", 6L, 10L), ("b", 7L, 20L))
      .toDF("source", "id", "score")
    val out = Curation.percentileGate(docs, "source", "score", 5000)
      .select("source", "id", "cut_score", "keep")
      .as[(String, Long, Long, Boolean)].collect()
    // a: scores 1..5 → disc-median 3; b: {10,20} → cume_dist(10)=0.5 → 10
    assert(out.filter(_._1 == "a").forall(_._3 == 3L))
    assert(out.filter(_._1 == "b").forall(_._3 == 10L))
    assert(out.filter(_._4).map(_._2).sorted.toSeq == Seq(3L, 4L, 5L, 6L, 7L))
    // p = 100% keeps only the max; p → 0 keeps everything
    val top = Curation.percentileGate(docs, "source", "score", 10000)
      .filter(col("keep")).select("id").as[Long].collect().sorted
    assert(top.toSeq == Seq(5L, 7L))
    val all = Curation.percentileGate(docs, "source", "score", 1)
      .filter(col("keep")).count()
    assert(all == 7L)
  }

  test("concatShards: ascending-id payload; offsets index every document") {
    import graft.pipeline.Curation
    val docs = Seq((21L, "cccc"), (5L, "aaa"), (13L, "bb"))
      .toDF("doc_id", "text")
    val out = Curation.concatShards(docs, "doc_id", "text", 1, "|")
      .as[(Long, Long, String, Seq[Long])].collect()
    assert(out.length == 1)
    val (_, n, payload, offsets) = out.head
    assert(n == 3L && payload == "aaa|bb|cccc")
    assert(offsets == Seq(1L, 5L, 8L))
    // each offset points at its document's first character (1-based)
    val texts = Seq("aaa", "bb", "cccc")
    offsets.zip(texts).foreach { case (o, t) =>
      assert(payload.substring(o.toInt - 1, o.toInt - 1 + t.length) == t)
    }
  }

  test("percentileGate matches a sort-based reference on random corpora") {
    import graft.pipeline.Curation
    val rnd = new scala.util.Random(11)
    for (p <- Seq(2500, 5000, 9000)) {
      val rows = (1L to 200L).map(i =>
        (s"s${rnd.nextInt(4)}", i, rnd.nextInt(20).toLong))
      val docs = rows.toDF("source", "id", "score")
      // reference: per stratum, smallest v with count(<=v)*10000 >= p*n
      val expected = rows.groupBy(_._1).flatMap { case (_, rs) =>
        val scores = rs.map(_._3).sorted
        val n = scores.length
        val cut = scores.find(v =>
          scores.count(_ <= v) * 10000 >= p.toLong * n).get
        rs.filter(_._3 >= cut).map(_._2)
      }.toSet
      val got = Curation.percentileGate(docs, "source", "score", p)
        .filter(col("keep")).select("id").as[Long].collect().toSet
      assert(got == expected, s"p=$p")
    }
  }

  test("concatShards equals a sequential fold on random corpora") {
    import graft.pipeline.Curation
    val rnd = new scala.util.Random(13)
    val vocab = Vector("ax", "by", "cz", "dw", "evv", "f")
    val rows = (1L to 120L).map(i =>
      (i, Vector.fill(1 + rnd.nextInt(5))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")))
    def bucket(i: Long, n: Int): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % n
    }
    val expected = rows.groupBy(r => bucket(r._1, 4)).map { case (sh, rs) =>
      val sorted = rs.sortBy(_._1)
      val payload = sorted.map(_._2).mkString("|")
      val offsets = sorted.map(_._2).scanLeft(1L)(_ + _.length + 1).init
      (sh, sorted.length.toLong, payload, offsets)
    }.toSet
    val got = Curation.concatShards(rows.toDF("doc_id", "text"),
        "doc_id", "text", 4, "|")
      .as[(Long, Long, String, Seq[Long])].collect()
      .map(r => (r._1, r._2, r._3, r._4.toSeq)).toSet
    assert(got == expected)
  }

  test("hostCap exempts unparseable URLs instead of capping them as one group") {
    import graft.pipeline.Curation
    val docs = ((1L to 30L).map(i => (i, s"https://ok.example.com/p/$i")) ++
      (31L to 60L).map(i => (i, s"//cdn.example.com/asset/$i")))
      .toDF("doc_id", "url")
    val out = Curation.hostCap(docs, "doc_id", "url", cap = 5)
      .select("doc_id", "host", "keep").as[(Long, Option[String], Boolean)]
      .collect()
    // parseable host: capped at 5
    assert(out.count(r => r._2.contains("ok.example.com") && r._3) == 5)
    // protocol-relative URLs: host NULL, all kept (cap-exempt, auditable)
    val malformed = out.filter(_._1 > 30)
    assert(malformed.forall(r => r._2.isEmpty && r._3))
  }

  test("concatShards keeps non-numeric ids intact (no silent long cast)") {
    import graft.pipeline.Curation
    val docs = Seq(("doc-b", "bb"), ("doc-a", "aaa"), ("doc-c", "c"))
      .toDF("doc_id", "text")
    val out = Curation.concatShards(docs, "doc_id", "text", 1, "|")
      .as[(Long, Long, String, Seq[Long])].collect().head
    // ascending string-id order: doc-a, doc-b, doc-c
    assert(out._3 == "aaa|bb|c" && out._4 == Seq(1L, 5L, 8L))
  }

  test("linearScore reproduces the left-assoc double chain bit-for-bit") {
    val df = Seq((0.3, 5.2, 0.04)).toDF("a", "b", "c")
      .select(TextAnalysis.linearScore(0.29,
        2.0 -> col("a"), -0.08 -> col("b"), -3.0 -> col("c")).as("s"))
    val expected = ((0.29 + 2.0 * 0.3) + -0.08 * 5.2) + -3.0 * 0.04
    assert(rows(df).head.head == expected) // exact, not approximate
  }

  test("bm25TopK: hand-replayed scores, ranking, and no-hit exclusion") {
    val docs = Seq(
      (1L, "a b b"),   // tf(b)=2, dl=3
      (2L, "b c"),     // tf(b)=1, dl=2
      (3L, "c c c")    // no query term — must not appear at all
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopK(docs, "doc_id", "text", Seq("b"), k = 10)
      .as[(Long, Double)].collect()
    // replay the formula: N=3, avgdl=8/3, df(b)=2; the binary-magnitude
    // idf is bits(2N+2) − bits(2df+1) = bits(8) − bits(5) = 4 − 3 = 1
    val avgdl = 8.0 / 3.0
    val idf = TextAnalysis.idfBits(3L, 2L)
    assert(idf == 1.0)
    def s(tf: Double, dl: Double) =
      idf * tf * (1.2 + 1) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
    assert(got.map(_._1).toSeq == Seq(1L, 2L)) // ranked, doc 3 excluded
    assert(math.abs(got(0)._2 - s(2, 3)) < 1e-12)
    assert(math.abs(got(1)._2 - s(1, 2)) < 1e-12)
  }

  test("bm25TopK: k cuts the tail deterministically on score ties") {
    // two docs with IDENTICAL text tie exactly — doc_id breaks the tie
    val docs = Seq((5L, "b x"), (4L, "b x"), (9L, "b x")).toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopK(docs, "doc_id", "text", Seq("b"), k = 2)
      .as[(Long, Double)].collect().map(_._1).toSeq
    assert(got == Seq(4L, 5L))
  }

  test("dsirScores equals a sequential reference fold (hash, bits, norm)") {
    import graft.pipeline.Curation
    val dim = 64
    // local reimplementation of the quantized DSIR formula
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def bucket(g: String): Long =
      java.lang.Long.parseLong(md5hex(g).take(15), 16) % dim
    def bits(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    def grams(t: String): Seq[String] = {
      val ws = t.trim.toLowerCase.split("\\s+").toSeq
      ws ++ ws.zip(ws.drop(1)).map { case (a, b) => s"$a $b" }
    }
    val target = Seq("apple pie recipe", "apple tart", "pie crust apple")
    val raw = Seq(
      1L -> "apple pie with apple", 2L -> "zebra quagga okapi",
      3L -> "pie zebra", 4L -> "apple")
    val t = target.flatMap(grams).groupBy(bucket).view.mapValues(_.size.toLong)
    val r = raw.flatMap(d => grams(d._2)).groupBy(bucket).view.mapValues(_.size.toLong)
    val norm = bits(t.values.sum + dim) - bits(r.values.sum + dim)
    val want = raw.map { case (id, tx) =>
      val gs = grams(tx).map(bucket)
      (id, gs.size.toLong,
        gs.map(b => bits(t.getOrElse(b, 0L) + 1) - bits(r.getOrElse(b, 0L) + 1)).sum
          - gs.size * norm)
    }
    val got = Curation.dsirScores(
        raw.toDF("doc_id", "text"), target.map(Tuple1(_)).toDF("text"),
        "doc_id", "text", dim)
      .orderBy(col("doc_id")).as[(Long, Long, Long)].collect().toSeq
    assert(got == want)
  }

  test("count-min sketch: bounded size, never underestimates, merges by addition") {
    val docs = Seq((1L, "a b a c d a"), (2L, "b b e f a"), (3L, "g a b"))
      .toDF("doc_id", "text")
    val d = 4; val w = 32
    val sketch = TextAnalysis.cmsSketch(docs, "text", d, w).cache()
    assert(sketch.count() <= d.toLong * w)
    val exact = docs
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n_exact"))
    val est = TextAnalysis.cmsEstimate(exact, "word", sketch, d, w)
      .as[(String, Long, Long)].collect().toSeq
    assert(est.size == 7)
    // the count-min guarantee: a point estimate never undercounts
    assert(est.forall { case (_, ex, cms) => cms >= ex })
    // linear sketch: building per shard and adding counters equals the
    // one-pass sketch — the property shard-parallel 100 TB builds rest on
    val merged = TextAnalysis.cmsSketch(docs.filter(col("doc_id") <= 2), "text", d, w)
      .union(TextAnalysis.cmsSketch(docs.filter(col("doc_id") === 3), "text", d, w))
      .groupBy(col("j"), col("b")).agg(sum(col("c")).as("c"))
    assert(merged.exceptAll(sketch).isEmpty && sketch.exceptAll(merged).isEmpty)
  }

  test("dsirScores separates in-domain from off-domain docs") {
    import graft.pipeline.Curation
    // bits-quantized log needs count ratios past powers of two to
    // separate — size the target model accordingly
    val target = Seq.fill(64)("apple pie").map(Tuple1(_)).toDF("text")
    val raw = Seq(1L -> "apple pie", 2L -> "zebra horse").toDF("doc_id", "text")
    val got = Curation.dsirScores(raw, target, "doc_id", "text", 64)
      .as[(Long, Long, Long)].collect().map(x => x._1 -> x._3).toMap
    assert(got(1L) > got(2L))
  }

  test("lrs: suffix-sort kernel matches brute force on random strings") {
    // independent O(n^4)-ish brute force: every substring, count occurrences
    def brute(t: String): (Int, String) = {
      val n = t.length
      var best = (0, "")
      for (l <- 1 until n; i <- 0 to n - l) {
        val s = t.substring(i, i + l)
        var occ = 0; var p = t.indexOf(s)
        while (p >= 0) { occ += 1; p = t.indexOf(s, p + 1) }
        if (occ >= 2 && (l > best._1 || (l == best._1 && s < best._2)))
          best = (l, s)
      }
      best
    }
    val rnd = new scala.util.Random(17)
    for (_ <- 1 to 40) {
      val t = Seq.fill(3 + rnd.nextInt(25))("abc"(rnd.nextInt(3))).mkString
      assert(TextAnalysis.lrs(t) == brute(t), s"t=$t")
    }
    // known cases
    assert(TextAnalysis.lrs("banana") == (3, "ana"))
    assert(TextAnalysis.lrs("abcd") == (0, ""))
    assert(TextAnalysis.lrs("aa") == (1, "a"))
    assert(TextAnalysis.lrs("") == (0, ""))
    assert(TextAnalysis.lrs("x") == (0, ""))
  }

  test("longestRepeatedSubstring expression evaluates via codegen") {
    val df = Seq((1L, "banana"), (2L, "mississippi"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        TextAnalysis.longestRepeatedSubstring(col("text")).as("r"))
      .select(col("doc_id"), col("r.lrs_len"), col("r.lrs"))
    assert(df.as[(Long, Int, String)].collect().toSet ==
      Set((1L, 3, "ana"), (2L, 4, "issi")))
  }

  test("UnicodeNorm: NFC recomposes, stripAccents folds, idempotent, ASCII-invariant") {
    import graft.functions.UnicodeNorm
    // explicit escapes -- no reliance on source-file normalization form
    val decomposed = "Cafe\u0301 du re\u0301ve"  // e + combining acute (NFD)
    val recomposed = "Caf\u00e9 du r\u00e9ve"    // precomposed e-acute (NFC)
    val angstromNfd = "A\u030angstro\u0308m"     // A+ring, o+diaeresis
    val df = Seq((1L, decomposed), (2L, "plain ascii"), (3L, angstromNfd))
      .toDF("id", "t")
      .select(col("id"), UnicodeNorm.nfc(col("t")).as("n"),
        UnicodeNorm.stripAccents(UnicodeNorm.nfc(col("t"))).as("s"))
    val byId = df.collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(byId(1L)._1 == recomposed)
    assert(byId(1L)._2 == "Cafe du reve")
    assert(byId(2L) == (("plain ascii", "plain ascii")))
    assert(byId(3L)._1 == "\u00c5ngstr\u00f6m" && byId(3L)._2 == "Angstrom")
    // NFC is idempotent on already-composed text
    val again = Seq(recomposed).toDF("t")
      .select(UnicodeNorm.nfc(col("t")).as("n")).as[String].head()
    assert(again == recomposed)
  }

  test("linearProbeTrain: loss decreases, partitioning-invariant bits") {
    val rnd = new scala.util.Random(11)
    // separable-ish synthetic: y=1 rows lean to higher x1, lower x2
    val docs = (1 to 400).map { i =>
      val y = i % 2
      val x1 = rnd.nextDouble() * 0.5 + (if (y == 1) 0.4 else 0.0)
      val x2 = rnd.nextDouble() * 0.5 + (if (y == 1) 0.0 else 0.4)
      (i.toLong, x1, x2, y.toDouble)
    }.toDF("id", "x1", "x2", "y")
    val feats = Seq("x1" -> col("x1"), "x2" -> col("x2"))
    def sse(w: Seq[Double]): Double = {
      val pred = Seq(lit(1.0), col("x1"), col("x2")).zip(w)
        .foldLeft(lit(0.0): org.apache.spark.sql.Column) {
          case (acc, (c, wi)) => acc + lit(wi) * c
        }
      docs.agg(sum(pow(pred - col("y"), 2.0))).as[Double].head()
    }
    val w0 = TextAnalysis.linearProbeTrain(docs, feats, col("y"), 0.2, 1).map(_._2)
    val w8 = TextAnalysis.linearProbeTrain(docs, feats, col("y"), 0.2, 8).map(_._2)
    assert(sse(w8) < sse(w0), s"GD must reduce loss: ${sse(w0)} -> ${sse(w8)}")
    // the separating direction must be learned
    assert(w8(1) > 0 && w8(2) < 0, s"weights $w8")
    // decimal-sum gradients: weights are BIT-identical regardless of
    // partitioning (the property the DuckDB oracle replay rests on)
    val wA = TextAnalysis.linearProbeTrain(docs.repartition(3), feats, col("y"), 0.2, 8)
    val wB = TextAnalysis.linearProbeTrain(docs.repartition(17), feats, col("y"), 0.2, 8)
    assert(wA.map(_._2).zip(wB.map(_._2)).forall { case (a, b) => a == b },
      s"partitioning changed the trained weights: $wA vs $wB")
  }

  test("rocAuc: matches the hand-computed tie-aware value; bounds") {
    // scores: pos at {0.9, 0.8, 0.5}, neg at {0.5, 0.3} — one tie at 0.5.
    // ranks (avg ties): 0.3→1, 0.5→2.5 (×2), 0.8→4, 0.9→5
    // AUC = (5 + 4 + 2.5 - 3·4/2) / (3·2) = 5.5/6
    val df = Seq((0.9, 1.0), (0.8, 1.0), (0.5, 1.0), (0.5, 0.0), (0.3, 0.0))
      .toDF("score", "y")
    val r = TextAnalysis.rocAuc(df, "score", col("y"))
      .select("n_pos", "n_neg", "auc").as[(Long, Long, Double)].head()
    assert(r._1 == 3 && r._2 == 2)
    assert(math.abs(r._3 - 5.5 / 6.0) < 1e-12, s"auc=${r._3}")
    // perfect and inverted separations hit the bounds exactly
    val perfect = Seq((0.9, 1.0), (0.8, 1.0), (0.2, 0.0)).toDF("score", "y")
    assert(TextAnalysis.rocAuc(perfect, "score", col("y"))
      .select("auc").as[Double].head() == 1.0)
    val inverted = Seq((0.1, 1.0), (0.9, 0.0)).toDF("score", "y")
    assert(TextAnalysis.rocAuc(inverted, "score", col("y"))
      .select("auc").as[Double].head() == 0.0)
  }

  test("rocAuc matches an independent rank-sum reference on random inputs") {
    val rnd = new scala.util.Random(83)
    for (trial <- 1 to 4) {
      // coarse score grid → plenty of ties, the case the formula must get
      // right; labels independent of scores
      val data = (1 to 300).map { _ =>
        (math.floor(rnd.nextDouble() * 8) / 8.0, if (rnd.nextBoolean()) 1.0 else 0.0)
      }
      // reference: average ranks by sorting, mean rank per tie group
      val sorted = data.map(_._1).sorted
      val rankOf = data.map(_._1).distinct.map { s =>
        val lo = sorted.indexWhere(_ == s) + 1
        val hi = sorted.lastIndexWhere(_ == s) + 1
        s -> (lo + hi) / 2.0
      }.toMap
      val np = data.count(_._2 == 1.0).toDouble
      val nn = data.size - np
      val expected =
        (data.filter(_._2 == 1.0).map(d => rankOf(d._1)).sum - np * (np + 1) / 2.0) /
          (np * nn)
      val got = TextAnalysis.rocAuc(data.toDF("score", "y"), "score", col("y"))
        .select("auc").as[Double].head()
      assert(math.abs(got - expected) < 1e-9,
        s"trial $trial: got $got expected $expected")
    }
  }

  test("trained probe separates the weak label on the corpus (AUC > 0.7)") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    // the query's features: en-marker ratio, scaled token count, scaled
    // mean word length; weak label = the Gopher-style length gate
    val words = split(lower(trim(col("text"))), "\\s+")
    val toks = size(split(trim(col("text")), "\\s+")).cast("double")
    val enHits = size(filter(words, w => w.isin(Seq("the", "and", "of"): _*)))
      .cast("double")
    val feats = Seq(
      "r_en" -> when(toks > 0, enHits / toks).otherwise(lit(0.0)),
      "ntok_scaled" -> (toks / 100.0),
      "mwl_scaled" -> (when(toks > 0,
        length(col("text")).cast("double") / toks).otherwise(lit(0.0)) / 10.0))
    val label = (col("n_chars") >= 300).cast("double")
    val w = TextAnalysis.linearProbeTrain(docs, feats,
      label, eta = 0.5, iters = 12).map(_._2)
    val score = (lit(1.0) +: feats.map(_._2)).zip(w)
      .foldLeft(lit(0.0): org.apache.spark.sql.Column) {
        case (acc, (c, wi)) => acc + lit(wi) * c
      }
    val auc = TextAnalysis.rocAuc(
        docs.select(score.as("s"), label.as("y")),
        "s", col("y"))
      .select("auc").as[Double].head()
    assert(auc > 0.7 && auc <= 1.0, s"auc=$auc")
  }

  test("rrfFuse == hand-computed reciprocal-rank fusion; no windows in plan") {
    // two ranked lists with partial overlap: id 3 is #1 lexically and #2
    // semantically, id 1 only lexical, id 7 only semantic
    val lex = Seq((3L, 1L), (1L, 2L), (5L, 3L)).toDF("doc_id", "rank")
    val ann = Seq((7L, 1L), (3L, 2L), (5L, 4L)).toDF("doc_id", "rank")
    val got = TextAnalysis.rrfFuse(
        Seq("ann" -> ann, "bm25" -> lex), "doc_id", k = 10, c = 60)
      .as[(Long, Double, Int, Long)].collect()
      .map { case (id, rrf, n, fr) => id -> ((rrf, n, fr)) }.toMap
    def r(ranks: Long*) = ranks.map(x => 1.0 / (60 + x)).sum
    assert(got(3L)._1 === r(2, 1)) // ann rank 2 folds before bm25 rank 1
    assert(got(5L)._1 === r(4, 3))
    assert(got(1L) == ((r(2), 1, got(1L)._3)))
    assert(got(7L) == ((r(1), 1, got(7L)._3)))
    // fused order: two ranks beat one — 1/64+1/63 (id 5) > 1/61 (id 7)
    assert(got.toSeq.sortBy(_._2._3).map(_._1) == Seq(3L, 5L, 7L, 1L))
    assert(got(3L)._2 == 2 && got(5L)._2 == 2)
    // scale shape: bounded CollectTopK rank, never a window
    val plan = TextAnalysis.rrfFuse(Seq("a" -> lex), "doc_id", k = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(1500))
  }
}
