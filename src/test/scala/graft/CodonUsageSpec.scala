package graft

import graft.operators.CodonUsage
import org.apache.spark.sql.functions._

class CodonUsageSpec extends SparkSpec {
  import spark.implicits._

  test("CodonInfo: 64 codons, degeneracy matches the standard code") {
    assert(CodonUsage.CodonInfo.size == 64)
    val deg = CodonUsage.CodonInfo.map { case (c, _, d) => c -> d }.toMap
    assert(deg("ATG") == 1) // M
    assert(deg("TGG") == 1) // W
    assert(deg("TTA") == 6) // L
    assert(deg("TAA") == 3) // stop
    assert(deg("GCT") == 4) // A
  }

  test("usage: golden RSCU values on a hand fixture") {
    // codons: ATG ×2 (M, deg 1), AAA ×1 (K, deg 2); trailing 'AT' dropped
    val seqs = Seq(("g1", "ATGATGAAAAT")).toDF("grp", "seq")
    val got = CodonUsage.usage(seqs, "grp", "seq")
      .as[(String, String, Long, Double)].collect()
      .map { case (_, c, n, r) => c -> ((n, r)) }.toMap
    assert(got.size == 64) // dense grid
    assert(got("ATG") == ((2L, 1.0)))  // n·deg/aa_total = 2·1/2
    assert(got("AAA") == ((1L, 2.0)))  // 1·2 / 1
    assert(got("AAG") == ((0L, 0.0)))  // 0·2 / 1 — observed aa, unused codon
    assert(got("GGG") == ((0L, 1.0)))  // unobserved aa → rscu defined as 1
    assert(got.values.map(_._1).sum == 3L)
  }

  test("usage: sub-codon sequences keep their group with all-zero rows, rscu 1") {
    val seqs = Seq(("short", "AT"), ("ok", "ATG")).toDF("grp", "seq")
    val got = CodonUsage.usage(seqs, "grp", "seq")
      .as[(String, String, Long, Double)].collect()
    val short = got.filter(_._1 == "short")
    assert(short.length == 64 && short.forall(r => r._3 == 0L && r._4 == 1.0))
    assert(got.count(_._1 == "ok") == 64)
  }

  test("usage: lower-case input and multiple groups stay independent") {
    val seqs = Seq(("a", "atgatg"), ("b", "aaa")).toDF("grp", "seq")
    val got = CodonUsage.usage(seqs, "grp", "seq")
      .filter(col("n") > 0)
      .as[(String, String, Long, Double)].collect().toSet
    assert(got == Set(("a", "ATG", 2L, 1.0), ("b", "AAA", 1L, 2.0)))
  }
}
