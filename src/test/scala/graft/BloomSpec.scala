package graft

import graft.operators.Bloom
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("mightContain: every inserted key passes (no false negatives)") {
    val keys = (1L to 200L).map(i => s"key-$i")
    val f = Bloom.build(keys.toDF("k"), "k", mBits = 1L << 12, k = 3)
    val misses = keys.toDF("k")
      .filter(!Bloom.mightContain(col("k"), f)).count()
    assert(misses == 0)
  }

  test("false-positive rate stays near (kn/m)^k on disjoint probes") {
    val f = Bloom.build((1L to 100L).map(i => s"in-$i").toDF("k"), "k",
      mBits = 1L << 16, k = 3)
    val probes = (1L to 2000L).map(i => s"out-$i").toDF("k")
    val fp = probes.filter(Bloom.mightContain(col("k"), f)).count()
    // expected ~ (300/65536)^3 ≈ 1e-7; 1% is a generous determinism-safe cap
    assert(fp <= 20, s"false positives: $fp / 2000")
  }

  test("semiJoin equals the plain semi join exactly") {
    val fact = (1L to 3000L).map(i => (i, i % 97)).toDF("id", "fk")
    val small = Seq(3L, 11L, 42L, 96L).toDF("k")
    val got = Bloom.semiJoin(fact, "fk", small, "k")
      .select("id").as[Long].collect().toSet
    val want = fact.join(small.select(col("k").as("fk")), Seq("fk"), "left_semi")
      .select("id").as[Long].collect().toSet
    assert(got == want && want.nonEmpty)
  }

  test("build refuses a non-small side (size gate)") {
    val big = (1L to 5000L).map(i => s"k$i").toDF("k")
    intercept[IllegalArgumentException] {
      Bloom.build(big, "k", mBits = 1L << 20, k = 3, maxSetBits = 1000)
    }
  }

  test("membership is a pure key function — duplication/partition invariant") {
    val keys = Seq("a", "b", "c").toDF("k")
    val f1 = Bloom.build(keys, "k", mBits = 1L << 10, k = 3)
    val f2 = Bloom.build(keys.union(keys).repartition(7), "k",
      mBits = 1L << 10, k = 3)
    assert(f1 == f2)
  }
}
