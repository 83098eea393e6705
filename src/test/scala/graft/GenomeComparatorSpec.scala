package graft

import graft.operators.GenomeComparator
import org.apache.spark.sql.functions._

class GenomeComparatorSpec extends SparkSpec {
  import spark.implicits._

  // (isolate, locus, allele, incompleteFlag) designation fixture, 3 loci:
  //  iso 1: L1=a1, L2=a2, L3=a3           — fully typed
  //  iso 2: L1=a1, L2 missing, L3=a9      — one missing, one differing
  //  iso 3: L1=a1 (incomplete), L2=a2, L3 missing
  //  iso 4: L1 has TWO alleles (a1,a5 — paralogous), L2=a7, L3=a3
  private def fixture = Seq(
    (1L, 1, "a1", false), (1L, 2, "a2", false), (1L, 3, "a3", false),
    (2L, 1, "a1", false), (2L, 3, "a9", false),
    (3L, 1, "a1", true), (3L, 2, "a2", false),
    (4L, 1, "a5", false), (4L, 1, "a1", false), (4L, 2, "a7", false),
    (4L, 3, "a3", false)
  ).toDF("iso", "loc", "allele", "inc")

  private def status = GenomeComparator.statusMatrix(
    fixture, "iso", "loc", col("allele"), col("inc"), nLoci = 3)

  test("statusMatrix: dense grid with X/I marks and min-allele choice") {
    val got = status.as[(Long, Int, String)].collect()
      .map { case (i, l, st) => (i, l) -> st }.toMap
    assert(got.size == 12) // 4 isolates × 3 loci, densified
    assert(got((1L, 1)) == "a1" && got((1L, 2)) == "a2" && got((1L, 3)) == "a3")
    assert(got((2L, 2)) == "X") // no designation → missing
    assert(got((3L, 1)) == "I") // incomplete best hit
    assert(got((3L, 3)) == "X")
    assert(got((4L, 1)) == "a1") // min of {a1, a5} — warehouse convention
  }

  test("statusMatrix: incomplete flag follows the CHOSEN allele only") {
    // iso 5: L1 = a9 (incomplete) and a2 (complete) → chosen a2, NOT 'I'
    val d = fixture.union(
      Seq((5L, 1, "a9", true), (5L, 1, "a2", false)).toDF("iso", "loc", "allele", "inc"))
    val got = GenomeComparator.statusMatrix(
        d, "iso", "loc", col("allele"), col("inc"), nLoci = 3)
      .filter(col("iso") === 5 && col("loc") === 1)
      .select(col("status")).as[String].head()
    assert(got == "a2")
  }

  test("distanceMatrix: all four flag combinations match hand counts") {
    // Profiles: 1=(a1,a2,a3)  2=(a1,X,a9)  3=(I,a2,X)  4=(a1,a7,a3)
    def dist(em: Boolean, tps: Boolean): Map[(Long, Long), Int] =
      GenomeComparator.distanceMatrix(status, "iso", "loc", em, tps)
        .as[(Long, Long, Int)].collect()
        .map { case (s, d, v) => (s, d) -> v }.toMap

    // strict (no options): every textual difference counts
    val strict = dist(em = false, tps = false)
    assert(strict((1L, 2L)) == 2) // L2 a2 vs X, L3 a3 vs a9
    assert(strict((1L, 3L)) == 2) // L1 a1 vs I, L3 a3 vs X
    assert(strict((1L, 4L)) == 1) // L2 a2 vs a7
    assert(strict((2L, 3L)) == 3) // all three differ textually
    assert(strict((3L, 4L)) == 3)

    // exclude_missing_pairwise: loci with X on either side are skipped
    val noMissing = dist(em = true, tps = false)
    assert(noMissing((1L, 2L)) == 1) // only L3 a3 vs a9 remains
    assert(noMissing((1L, 3L)) == 1) // only L1 a1 vs I remains
    assert(noMissing((2L, 3L)) == 1) // L1 a1 vs I (L2, L3 have X)

    // truncated=pairwise_same alone: I-vs-allele no longer counts,
    // I-vs-X still does (count_differences XS lines 96-105)
    val tps = dist(em = false, tps = true)
    assert(tps((1L, 3L)) == 1) // L1 a1-vs-I skipped, L3 a3-vs-X counts
    assert(tps((2L, 3L)) == 2) // L1 a1-vs-I skipped; L2 X-vs-a2 + L3 a9-vs-X count

    // both options on (the gc_distance_matrix configuration): only
    // real-allele vs real-allele differences remain
    val both = dist(em = true, tps = true)
    assert(both((2L, 3L)) == 0) // L1 skipped by tps, L2/L3 skipped by em
    assert(both((1L, 4L)) == 1) // L2 a2 vs a7
  }

  test("distanceMatrix: selection above maxRecords fails loudly (MAX_GENOMES)") {
    val e = intercept[IllegalArgumentException] {
      GenomeComparator.distanceMatrix(status, "iso", "loc",
        excludeMissingPairwise = true, truncatedPairwiseSame = true,
        maxRecords = 3).count()
    }
    assert(e.getMessage.contains("cap 3"))
  }

  test("uniqueStrains: md5-of-profile grouping with member lists") {
    // make iso 9 share iso 1's exact profile
    val d = fixture.union(Seq(
      (9L, 1, "a1", false), (9L, 2, "a2", false), (9L, 3, "a3", false)
    ).toDF("iso", "loc", "allele", "inc"))
    val st = GenomeComparator.statusMatrix(
      d, "iso", "loc", col("allele"), col("inc"), nLoci = 3)
    val rows = GenomeComparator.uniqueStrains(st, "iso", "loc")
      .select(col("n"), col("min_member"), concat_ws(",", col("members")).as("m"))
      .as[(Long, Long, String)].collect().toSet
    assert(rows.contains((2L, 1L, "1,9"))) // isolates 1 and 9 group together
    assert(rows.count(_._1 == 1L) == 3)    // isolates 2, 3, 4 are singletons
  }

  test("paralogousLoci: per-locus count of multi-designation isolates") {
    val got = GenomeComparator.paralogousLoci(
        fixture, "iso", "loc", col("allele"))
      .as[(Int, Long)].collect().toMap
    assert(got == Map(1 -> 1L)) // only iso 4 at L1 holds two alleles
  }

  test("distanceMatrix: randomized equivalence vs a local reference, all flag combos") {
    val rnd = new scala.util.Random(20260813L)
    val statuses = Array("1", "2", "3", "X", "I")
    val nIso = 8; val nLoci = 4
    val grid = for (i <- 1 to nIso; l <- 1 to nLoci)
      yield (i.toLong, l, statuses(rnd.nextInt(statuses.length)))
    val df = grid.toDF("iso", "loc", "status")
    val prof: Map[Long, IndexedSeq[String]] = grid.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toIndexedSeq).toMap
    def localDist(a: IndexedSeq[String], b: IndexedSeq[String],
        em: Boolean, tps: Boolean): Int =
      a.zip(b).count { case (x, y) =>
        val base = if (em) x != "X" && y != "X" && x != y else x != y
        if (!tps) base
        else base && ((x == "I" && y == "X") || (x == "X" && y == "I") ||
          (x != "I" && y != "I"))
      }
    for (em <- Seq(false, true); tps <- Seq(false, true)) {
      val got = GenomeComparator.distanceMatrix(df, "iso", "loc", em, tps)
        .as[(Long, Long, Int)].collect()
        .map { case (s, d, v) => (s, d) -> v }.toMap
      assert(got.size == nIso * (nIso - 1) / 2)
      for (((s, d), v) <- got)
        assert(v == localDist(prof(s), prof(d), em, tps),
          s"pair ($s,$d) em=$em tps=$tps")
    }
  }

  test("coreAnalysis: presence fractions and core threshold") {
    val got = GenomeComparator.coreAnalysis(status, "iso", "loc", 0.9)
      .select(col("loc"), col("present"), col("in_core"))
      .as[(Int, Long, Boolean)].collect()
      .map { case (l, p, c) => l -> ((p, c)) }.toMap
    // L1 present in all 4, L2 in 3 of 4, L3 in 3 of 4
    assert(got(1) == ((4L, true)))
    assert(got(2) == ((3L, false)))
    assert(got(3) == ((3L, false)))
  }
}
