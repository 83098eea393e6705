package graft

import graft.operators.SeqScan
import org.apache.spark.sql.functions._

class SeqScanSpec extends SparkSpec {
  import spark.implicits._

  test("occurrencePositions: non-overlapping starts, 1-based") {
    val df = Seq(("ACGTACGTAA", "ACGT"), ("AAAA", "AA"), ("ACGT", "TTT"))
      .toDF("hay", "needle")
      .select(SeqScan.occurrencePositions(col("hay"), col("needle")).as("p"))
    assert(rows(df).map(_.head) == Seq(Seq(1L, 5L), Seq(1L, 3L), Seq()))
  }

  test("allOccurrencePositions: includes overlapping hits") {
    val df = Seq(("AAAA", "AA")).toDF("hay", "needle")
      .select(SeqScan.allOccurrencePositions(col("hay"), col("needle")).as("p"))
    assert(rows(df).map(_.head) == Seq(Seq(1L, 2L, 3L)))
  }

  test("exactTagScan finds forward and reverse-complement hits") {
    // contig contains GGGTTT fwd at 3 and its revcomp AAACCC at 12
    val contigs = Seq((1L, "ACGGGTTTACGAAACCCGT")).toDF("cid", "seq")
    val lib = Seq(("locusA", "1", "GGGTTT")).toDF("locus", "allele_id", "aseq")
    val out = SeqScan.exactTagScan(contigs, "cid", "seq", lib,
        "locus", "allele_id", "aseq")
      .select("cid", "locus", "start_pos", "end_pos", "reverse")
      .as[(Long, String, Long, Long, Boolean)].collect().toSet
    assert(out == Set(
      (1L, "locusA", 3L, 8L, false),
      (1L, "locusA", 12L, 17L, true)))
  }

  test("exactTagScan does not double-tag palindromic alleles") {
    val contigs = Seq((1L, "TTGAATTCTT")).toDF("cid", "seq")
    val lib = Seq(("pal", "1", "GAATTC")).toDF("locus", "allele_id", "aseq")
    val out = SeqScan.exactTagScan(contigs, "cid", "seq", lib,
        "locus", "allele_id", "aseq").collect()
    assert(out.length == 1) // GAATTC is its own revcomp
  }

  test("seededTagScan output is identical to exactTagScan") {
    // mixed bag: multi-hit, reverse-strand, palindromic, and a short
    // (< k) allele that takes the unseeded fallback path
    val contigs = Seq(
      (1L, "ACGGGTTTACGAAACCCGTGGGTTT"),
      (2L, "TTGAATTCTTGAATTC"),
      (3L, "AAAAAAAAAA"),
      (4L, "CGTACGTACG")).toDF("cid", "seq")
    val lib = Seq(
      ("locusA", "1", "GGGTTT"),
      ("pal", "1", "GAATTC"),
      ("short", "1", "CGT"),
      ("multi", "1", "ACGTACG")).toDF("locus", "allele_id", "aseq")
    def run(f: Boolean) = {
      val d =
        if (f) SeqScan.exactTagScan(contigs, "cid", "seq", lib,
          "locus", "allele_id", "aseq", overlapping = true)
        else SeqScan.seededTagScan(contigs, "cid", "seq", lib,
          "locus", "allele_id", "aseq", k = 5, overlapping = true)
      d.select("cid", "locus", "allele_id", "start_pos", "end_pos", "reverse")
        .as[(Long, String, String, Long, Long, Boolean)].collect().toSet
    }
    val exact = run(true)
    val seeded = run(false)
    assert(exact.nonEmpty && seeded == exact)
  }

  test("seededTagScan size-gates the candidate broadcast") {
    val contigs = Seq(
      (1L, "ACGGGTTTACGAAACCCGT"),
      (2L, "GGGTTTGGGTTT")).toDF("cid", "seq")
    val lib = Seq(("locusA", "1", "GGGTTT")).toDF("locus", "allele_id", "aseq")
    // cap = 0 forces every candidate set over the limit: the hint must be
    // dropped (no driver collect of the candidate list — the OOM path at
    // huge corpus × huge library) and results must be unchanged.
    val gated = SeqScan.seededTagScan(contigs, "cid", "seq", lib,
      "locus", "allele_id", "aseq", k = 5, maxBroadcastCandidates = 0L)
    val hinted = SeqScan.seededTagScan(contigs, "cid", "seq", lib,
      "locus", "allele_id", "aseq", k = 5)
    def res(d: org.apache.spark.sql.DataFrame) =
      d.select("cid", "locus", "allele_id", "start_pos", "end_pos", "reverse")
        .as[(Long, String, String, Long, Long, Boolean)].collect().toSet
    assert(res(gated).nonEmpty && res(gated) == res(hinted))
    // the gated plan carries fewer broadcast HINTs — none on the candidate
    // side (it appears once per strand branch). At fixture scale Catalyst
    // still auto-broadcasts the tiny candidate relation from its stats —
    // which is exactly the point: above the cap the choice is returned to
    // the optimizer instead of being forced.
    def nHints(d: org.apache.spark.sql.DataFrame) =
      "ResolvedHint".r
        .findAllIn(d.queryExecution.analyzed.toString).length
    assert(nHints(gated) == nHints(hinted) - 2)
  }

  test("findExemplars keeps greedy ascending-id representatives per length") {
    val lib = Seq(
      // length-4 group of locus L: 2 keeps 10 (id order!), AAAT ~ AAAA
      ("L", "10", "AAAA"),
      ("L", "2", "TTTT"),   // 100% diff from AAAA -> exemplar
      ("L", "11", "AAAT"),  // 25% diff from AAAA -> pruned at 50%
      ("L", "3", "TTAA"),   // 50% from both -> exemplar at 50%
      // different length bucket: always keeps its first
      ("L", "5", "AAAAA"),
      // different locus: independent
      ("M", "7", "AAAA")).toDF("locus", "allele_id", "aseq")
    val out = SeqScan.findExemplars(lib, "locus", "allele_id", "aseq", 50.0)
      .as[(String, String)].collect().toSet
    assert(out == Set(
      ("L", "2"), ("L", "3"), ("L", "10"), ("L", "5"), ("M", "7")))
  }

  test("predictAlleleEnds: forward/reverse extension, full-cover passthrough") {
    // local match at contig [11,14] (A=4) of an 8-base allele
    val m = Seq(
      // forward, allele coords 3..6: extend left past the 2 skipped bases
      (11L, 14L, 3L, 6L, false, 8L, 4L),
      // reverse, allele coords 6..3 (descending): prefix maps rightward
      (11L, 14L, 6L, 3L, true, 8L, 4L),
      // A == L: match already covers the allele
      (11L, 18L, 1L, 8L, false, 8L, 8L))
      .toDF("start", "end", "sstart", "send", "reverse", "len", "aln")
    val got = m.select(
        SeqScan.predictedStart(col("start"), col("sstart"), col("send"),
          col("reverse"), col("len"), col("aln")).as("ps"),
        col("end"), col("len"), col("aln"))
      .select(col("ps"),
        SeqScan.predictedEnd(col("ps"), col("end"), col("len"), col("aln"))
          .as("pe"))
      .as[(Long, Long)].collect().toList
    assert(got == List((9L, 16L), (9L, 16L), (11L, 18L)))
  }

  test("flankedSeq: clamps at contig edges, revcomps reverse matches") {
    val df = Seq(("AACCGGTTAACC", 5L, 8L, false),
                 ("AACCGGTTAACC", 5L, 8L, true),
                 ("AACCGGTTAACC", 2L, 11L, false))
      .toDF("contig", "ps", "pe", "rev")
    val got = df.select(SeqScan.flankedSeq(col("contig"), col("ps"),
        col("pe"), col("rev"), 3).as("s"))
      .as[String].collect().toList
    assert(got == List("ACCGGTTAAC", "GTTAACCGGT", "AACCGGTTAACC"))
  }

  test("mutationScan classifies wild-type / variant / other") {
    val seqs = Seq((1L, "ACGTA"), (2L, "ACGTG"), (3L, "ACGTC"), (4L, "AC"))
      .toDF("sid", "seq")
    val muts = Seq(("m1", 5, "A", "G")).toDF("mut_id", "position", "wild_type", "variant")
    val out = SeqScan.mutationScan(seqs, "sid", "seq", muts,
        "mut_id", "position", "wild_type", "variant")
      .select("sid", "status").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "wild_type", 2L -> "variant", 3L -> "other"))
    // sid 4 too short: filtered
  }

  test("incrementalTagScan: new tags + already-tagged pairs == the full scan") {
    // 3 contigs x 2 loci; existing covers a PARTIAL locus set per contig
    // (contig 1 tagged for L1 only, contig 2 for both, contig 3 untagged)
    val contigs = Seq(
      (1L, "AAGGCCTTAAGGCCTT"), (2L, "GGCCAATTGGCC"), (3L, "TTAACCGGTTAA"))
      .toDF("cid", "seq")
    val lib = Seq(("L1", "1", "GGCC"), ("L2", "1", "TTAA"))
      .toDF("locus", "allele_id", "allele_seq")
    val full = SeqScan.exactTagScan(
      contigs, "cid", "seq", lib, "locus", "allele_id", "allele_seq",
      overlapping = true)
    val existing = Seq((1L, "L1"), (2L, "L1"), (2L, "L2")).toDF("cid", "locus")
    val inc = SeqScan.incrementalTagScan(
      contigs, "cid", "seq", existing, lib, "locus", "allele_id", "allele_seq",
      overlapping = true)
    // no scanned pair is already tagged
    assert(inc.join(existing, Seq("cid", "locus"), "left_semi").count() == 0)
    // delta + the full scan's rows on tagged pairs == the full scan
    val replayed = full.join(existing, Seq("cid", "locus"), "left_semi")
    val union = inc.unionByName(replayed)
    assert(union.exceptAll(full).isEmpty && full.exceptAll(union).isEmpty)
    // a fully-tagged contig never reaches the kernel: its id is absent
    assert(!inc.select("cid").as[Long].collect().contains(2L))
  }

  test("AcAutomaton: overlapping, nested, and suffix patterns all emit") {
    val ac = graft.functions.AcAutomaton.build(Array("AA", "AAA", "BAA", "C"))
    def scan(s: String): Set[(Int, Int)] = {
      val arr = graft.functions.MultiPattern
        .acScanKernel(org.apache.spark.unsafe.types.UTF8String.fromString(s), ac)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      (0 until arr.numElements()).map { i =>
        val v = arr.getLong(i)
        ((v >>> 32).toInt, (v & 0xffffffffL).toInt)
      }.toSet
    }
    // AAAA: AA at 1,2,3; AAA at 1,2
    assert(scan("AAAA") == Set((0, 1), (0, 2), (0, 3), (1, 1), (1, 2)))
    // BAAC: BAA at 1, AA at 2 (via failure link), C at 4
    assert(scan("BAAC") == Set((2, 1), (0, 2), (3, 4)))
    assert(scan("XYZ").isEmpty)
  }

  test("multiPatternTagScan == exactTagScan(overlapping) on random DNA corpora") {
    val rnd = new scala.util.Random(61)
    def dna(n: Int) = Seq.fill(n)("ACGT"(rnd.nextInt(4))).mkString
    val contigs = (1L to 40L).map(i => (i, dna(60 + rnd.nextInt(80)))).toDF("cid", "seq")
    // short patterns so hits are plentiful; includes a palindrome (revcomp==self)
    val lib = (Seq(("L0", "1", "ACGT")) ++ (1 to 8).map(i =>
      (s"L$i", "1", dna(4 + rnd.nextInt(3))))).toDF("locus", "allele_id", "allele_seq")
    val want = SeqScan.exactTagScan(contigs, "cid", "seq",
        lib, "locus", "allele_id", "allele_seq", overlapping = true)
      .select("cid", "locus", "allele_id", "start_pos", "end_pos", "reverse")
    val got = SeqScan.multiPatternTagScan(contigs, "cid", "seq",
        lib, "locus", "allele_id", "allele_seq")
      .select("cid", "locus", "allele_id", "start_pos", "end_pos", "reverse")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      s"got=${got.count()} want=${want.count()}")
    assert(want.count() > 0, "fixture must produce hits")
    assert(want.filter(col("reverse")).count() > 0, "fixture must hit the reverse strand")
  }
}
