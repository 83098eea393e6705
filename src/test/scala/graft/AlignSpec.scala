package graft

import graft.functions.Align
import graft.operators.Alignment
import org.apache.spark.sql.functions._

/** NW aligner + center-star MSA (SURVEY §2.10 G7). The reference delegates
  * alignment to MUSCLE (GenomeComparator.pm:1328-1380); here NW with unit
  * costs and a fixed traceback tie-break (diagonal > up > left).
  */
class AlignSpec extends SparkSpec {
  import spark.implicits._

  test("nw: identity, substitution-over-indel ties, gaps, empty sides") {
    assert(Align.nw("ACGT", "ACGT") == ("ACGT", "ACGT", 0))
    // tie substitution vs ins+del resolves to the diagonal (cheaper anyway)
    assert(Align.nw("AB", "BA") == ("AB", "BA", 2))
    assert(Align.nw("ACGTACGT", "TTACGT") == ("ACGTACGT", "--TTACGT", 3))
    assert(Align.nw("GATTACA", "") == ("GATTACA", "-------", 7))
    assert(Align.nw("", "ACG") == ("---", "ACG", 3))
  }

  test("nw refuses contig-scale inputs instead of allocating a huge matrix") {
    val mb = "A" * 9000 // 9001^2 > 64M-cell cap
    val e = intercept[IllegalArgumentException] { Align.nw(mb, mb) }
    assert(e.getMessage.contains("too long"))
    // just under the cap on one side is fine
    assert(Align.nw("A" * 100, "A" * 100)._3 == 0)
  }

  test("nw distance equals levenshtein and alignment is consistent") {
    val cases = Seq(("GATTACA", "GCATGCU"), ("AAAA", "AAAAAAAT"),
      ("ACGTACGT", "AGTACCGT"))
    for ((a, b) <- cases) {
      val (sa, sb, d) = Align.nw(a, b)
      assert(sa.length == sb.length)
      assert(sa.replace("-", "") == a)
      assert(sb.replace("-", "") == b)
      // distance = positions where the aligned chars differ
      assert(sa.zip(sb).count { case (x, y) => x != y } == d)
      // unit-cost NW distance IS levenshtein
      val lev = Seq(a, b).toDF("x").limit(1)
        .select(levenshtein(lit(a), lit(b))).as[Int].collect().head
      assert(d == lev)
    }
  }

  test("nwAlign expression evaluates via codegen on a DataFrame") {
    val df = Seq(("ACGTACGT", "TTACGT")).toDF("a", "b")
      .select(Align.nwAlign(col("a"), col("b")).as("r"))
      .select(col("r.a_ali"), col("r.b_ali"), col("r.dist"))
    assert(df.as[(String, String, Int)].collect().head ==
      ("ACGTACGT", "--TTACGT", 3))
  }

  test("expand pads insertion runs to the profile, left-aligned") {
    // center "GA TTACA" with member inserting 2 after pos 2; profile wants 4
    val (ca, cb, _) = Align.nw("GATTACA", "GATTTTACA")
    assert(Align.expand(ca, cb, Array(0, 0, 4, 0, 0, 0, 0, 0)).length == 11)
    // no insertions anywhere: expansion just pads
    assert(Align.expand("ACG", "A-G", Array(0, 0, 0, 0)) == "A-G")
    assert(Align.expand("ACG", "A-G", Array(1, 0, 0, 1)) == "-A-G-")
  }

  test("centerStar: equal row lengths per group, center preserved, gap-free columns round-trip") {
    val df = Seq(
      (1L, 1L, "ACGTACGT"), (1L, 2L, "AGTACCGTT"), (1L, 3L, "TTACGT"),
      (2L, 4L, "GATTACA"), (2L, 5L, "GAACA"), (2L, 6L, "GATTTTACA"))
      .toDF("g", "id", "seq")
    val msa = Alignment.centerStar(df, "g", "id", "seq")
      .as[(Long, Long, String)].collect().sortBy(r => (r._1, r._2))
    val byGroup = msa.groupBy(_._1)
    // one aligned length per group
    byGroup.foreach { case (_, rows) =>
      assert(rows.map(_._3.length).distinct.size == 1)
    }
    // stripping gaps recovers every original sequence
    val orig = df.as[(Long, Long, String)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    msa.foreach { case (g, id, m) =>
      assert(m.replace("-", "") == orig((g, id)), s"($g,$id)")
    }
    // site frequencies count every column of every row
    val sf = Alignment.siteFrequencies(
        Alignment.centerStar(df, "g", "id", "seq"), "g", "msa")
      .agg(sum(col("n"))).as[Long].collect().head
    assert(sf == msa.map(_._3.length).sum)
  }

  test("blastnScore matches a full-matrix reference DP on random strings") {
    // independent O(n*m) full-matrix reference of the same recurrence
    def ref(a: String, b: String): Int = {
      val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
      for (i <- 0 to a.length) dp(i)(0) = i * Align.BlastnGap
      for (j <- 0 to b.length) dp(0)(j) = j * Align.BlastnGap
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.max(
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) Align.BlastnMatch
                              else Align.BlastnMismatch),
          math.max(dp(i - 1)(j) + Align.BlastnGap,
            dp(i)(j - 1) + Align.BlastnGap))
      dp(a.length)(b.length)
    }
    val rnd = new scala.util.Random(5)
    def randSeq(n: Int) = Seq.fill(n)("ACGT"(rnd.nextInt(4))).mkString
    for (_ <- 1 to 50) {
      val a = randSeq(rnd.nextInt(30)); val b = randSeq(rnd.nextInt(30))
      assert(Align.blastnScore(a, b) == ref(a, b), s"a=$a b=$b")
    }
    // known cases: identity, single mismatch, pure gap
    assert(Align.blastnScore("ACGT", "ACGT") == 8)
    assert(Align.blastnScore("ACGT", "ACCT") == 2 + 2 + 2 - 3)
    assert(Align.blastnScore("", "ACG") == -15)
  }

  test("nwScore expression evaluates via codegen on a DataFrame") {
    val df = Seq(("ACGTACGT", "ACGTTCGT"), ("AAAA", "AAAA"))
      .toDF("a", "b")
      .select(Align.nwScore(col("a"), col("b")).as("s"))
    assert(df.as[Int].collect().toSeq == Seq(11, 8))
  }

  test("gotohScore matches exhaustive alignment enumeration on tiny strings") {
    // independent reference: enumerate EVERY global alignment recursively,
    // tracking whether the previous column was a gap in a / in b
    def ref(a: String, b: String): Int = {
      def go(i: Int, j: Int, last: Int): Int = { // last: 0 none/diag, 1 gapB(vert), 2 gapA(horiz)
        if (i == a.length && j == b.length) 0
        else {
          var best = Int.MinValue
          if (i < a.length && j < b.length) {
            val s = if (a(i) == b(j)) Align.BlastnMatch else Align.BlastnMismatch
            best = math.max(best, s + go(i + 1, j + 1, 0))
          }
          if (i < a.length) {
            val c = if (last == 1) Align.GapExt else Align.GapOpen
            best = math.max(best, c + go(i + 1, j, 1))
          }
          if (j < b.length) {
            val c = if (last == 2) Align.GapExt else Align.GapOpen
            best = math.max(best, c + go(i, j + 1, 2))
          }
          best
        }
      }
      go(0, 0, 0)
    }
    val rnd = new scala.util.Random(23)
    def randSeq(n: Int) = Seq.fill(n)("ACGT"(rnd.nextInt(4))).mkString
    for (_ <- 1 to 60) {
      val a = randSeq(rnd.nextInt(7)); val b = randSeq(rnd.nextInt(7))
      assert(Align.gotohScore(a, b) == ref(a, b), s"a=$a b=$b")
    }
    // affine beats linear on a single long gap: AAAA vs AA
    assert(Align.gotohScore("AAAA", "AA") == -3) // 2 matches + open+ext gap
    assert(Align.blastnScore("AAAA", "AA") == -6) // linear pays per char
    assert(Align.gotohScore("ACGT", "ACGT") == 8)
    assert(Align.gotohScore("", "") == 0)
    assert(Align.gotohScore("ACG", "") == -9) // open + 2 ext
  }
}
