package graft

import graft.operators.Pcr
import org.apache.spark.sql.functions._

class PcrSpec extends SparkSpec {
  import spark.implicits._

  test("expand: IUPAC degenerate bases, cap on explosion") {
    assert(Pcr.expand("ACGT") == Seq("ACGT"))
    assert(Pcr.expand("ATR").toSet == Set("ATA", "ATG"))
    assert(Pcr.expand("NN").size == 16)
    intercept[IllegalArgumentException](Pcr.expand("NNNN", maxVariants = 64))
    // cap fires INSIDE the fold: 4^30 variants must fail fast, not OOM
    intercept[IllegalArgumentException](Pcr.expand("N" * 30))
    intercept[IllegalArgumentException](Pcr.expand("AXT"))
  }

  test("revComp golden") {
    assert(Pcr.revComp("AACCGG") == "CCGGTT")
    assert(Pcr.revComp("TTGGCC") == "GGCCAA")
  }

  test("products: forward and reverse orientations with exact coordinates") {
    val p1 = "AACCGG"; val p2 = "TTGGCC"
    // contig 1: p1 at 1, rc(p2)=GGCCAA at 20 → forward product 1..25 (25bp)
    // contig 2: p2 at 1, rc(p1)=CCGGTT at 15 → reverse product 1..20 (20bp)
    // contig 3: no sites
    val contigs = Seq(
      (1L, "AACCGG" + "T" * 13 + "GGCCAA" + "AAA"),
      (2L, "TTGGCC" + "A" * 8 + "CCGGTT"),
      (3L, "ACACACACACACACAC")
    ).toDF("id", "seq")
    val got = Pcr.products(contigs, "id", "seq", p1, p2, minLen = 10, maxLen = 40)
      .as[(Long, Long, Long, Long, String)].collect().toSet
    assert(got == Set(
      (1L, 1L, 25L, 25L, "forward"),
      (2L, 1L, 20L, 20L, "reverse")))
  }

  test("products: length window and primer-overlap exclusion") {
    val p1 = "AACCGG"; val p2 = "TTGGCC"
    // 12bp product (sites adjacent): below max(minLen=20, 12) → excluded;
    // with minLen=10 the same product IS reported
    val contigs = Seq((1L, "AACCGGGGCCAA")).toDF("id", "seq")
    assert(Pcr.products(contigs, "id", "seq", p1, p2, 20, 60).count() == 0)
    val kept = Pcr.products(contigs, "id", "seq", p1, p2, 10, 60)
      .as[(Long, Long, Long, Long, String)].collect().toSet
    assert(kept == Set((1L, 1L, 12L, 12L, "forward")))
    // maxLen below the product length → excluded
    val long = Seq((1L, "AACCGG" + "T" * 50 + "GGCCAA")).toDF("id", "seq")
    assert(Pcr.products(long, "id", "seq", p1, p2, 10, 30).count() == 0)
  }

  test("products: degenerate primer matches every concrete variant site") {
    // primer1 ATR → {ATA, ATG}; both sites present, both must amplify
    val p2 = "CCCGGG" // rc = CCCGGG (palindrome)
    val contigs = Seq(
      (1L, "ATA" + "T" * 10 + "CCCGGG"),
      (2L, "ATG" + "T" * 10 + "CCCGGG")
    ).toDF("id", "seq")
    val got = Pcr.products(contigs, "id", "seq", "ATR", p2, 10, 40)
      .select(col("id")).as[Long].collect().toSet
    assert(got == Set(1L, 2L))
  }

  test("products: randomized equivalence vs a local reference scan") {
    val rnd = new scala.util.Random(0x9e3779b9L)
    val p1 = "ACGT"; val p2 = "GGAT" // rc(p2)=ATCC, rc(p1)=ACGT
    val minLen = 10; val maxLen = 30
    def naiveSites(seq: String, needle: String): Seq[Int] =
      (0 to seq.length - needle.length)
        .filter(i => seq.regionMatches(i, needle, 0, needle.length))
        .map(_ + 1)
    def naiveProducts(seq: String): Set[(Long, Long, Long, String)] = {
      def dir(headV: String, tailRc: String, hLen: Int, tLen: Int, d: String) =
        for {
          s <- naiveSites(seq, headV); e0 <- naiveSites(seq, tailRc)
          end = e0 + tLen - 1; len = end - s + 1
          if len >= math.max(minLen, hLen + tLen) && len <= maxLen
        } yield (s.toLong, end.toLong, len.toLong, d)
      (dir(p1, Pcr.revComp(p2), 4, 4, "forward") ++
        dir(p2, Pcr.revComp(p1), 4, 4, "reverse")).toSet
    }
    val seqs = (1L to 30L).map(i =>
      (i, (1 to 60).map(_ => "ACGT"(rnd.nextInt(4))).mkString))
    val got = Pcr.products(seqs.toDF("id", "seq"), "id", "seq",
        p1, p2, minLen, maxLen)
      .as[(Long, Long, Long, Long, String)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(r => (r._2, r._3, r._4, r._5)).toSet).toMap
    for ((id, seq) <- seqs) {
      val expected = naiveProducts(seq)
      assert(got.getOrElse(id, Set.empty) == expected, s"id $id seq $seq")
    }
  }

  test("summary: dense over input with zero-product rows") {
    val contigs = Seq(
      (1L, "AACCGG" + "T" * 13 + "GGCCAA"),
      (2L, "ACACACACAC")
    ).toDF("id", "seq")
    val got = Pcr.summary(contigs, "id", "seq", "AACCGG", "TTGGCC", 10, 40)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got == Set((1L, 1L, true), (2L, 0L, false)))
  }
}
