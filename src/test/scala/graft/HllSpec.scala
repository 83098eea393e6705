package graft

import graft.operators.Hll
import org.apache.spark.sql.functions._

class HllSpec extends SparkSpec {
  import spark.implicits._

  // local reference implementation of the portable hash + register math
  private def md5hex(s: String): String = java.security.MessageDigest
    .getInstance("MD5").digest(s.getBytes("UTF-8"))
    .map("%02x".format(_)).mkString
  private def h60(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(15), 16)

  test("registers match a sequential reference (hash, index, rho)") {
    val m = 64
    val keys = (1L to 500L).map(_.toString)
    val want = keys.map(h60).groupBy(h => h % m).view.mapValues { hs =>
      hs.map { h =>
        val rest = h >> 6
        if (rest == 0) 55L else 55L - (64 - java.lang.Long.numberOfLeadingZeros(rest))
      }.max
    }.toMap
    val got = Hll.registers(
        keys.map(k => ("g", k)).toDF("g", "k"), Seq("g"), "k", m)
      .select("j", "m").as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("estimate within 3 standard errors of the true cardinality") {
    val m = 64
    val n = 2000
    val df = (1 to n).map(i => ("g", s"key-$i")).toDF("g", "k")
    val est = Hll.estimate(Hll.registers(df, Seq("g"), "k", m), Seq("g"), m)
      .select("hll_raw").as[Double].head()
    val se = 1.04 / math.sqrt(m) // ~13% at m=64
    assert(math.abs(est - n) / n < 3 * se, s"est=$est n=$n")
  }

  test("shard sketches merge by register max = one-pass sketch") {
    val df = (1 to 1000).map(i => ("g", s"key-$i")).toDF("g", "k")
    val a = df.filter(substring(col("k"), 5, 10).cast("int") <= 600)
    val b = df.filter(substring(col("k"), 5, 10).cast("int") > 400) // overlap on purpose
    val merged = Hll.registers(a, Seq("g"), "k", 64)
      .union(Hll.registers(b, Seq("g"), "k", 64))
      .groupBy(col("g"), col("j")).agg(max(col("m")).as("m"))
    val once = Hll.registers(df, Seq("g"), "k", 64)
    assert(merged.exceptAll(once).isEmpty && once.exceptAll(merged).isEmpty)
    // and the merged estimate is exactly the one-pass estimate
    val e1 = Hll.estimate(merged, Seq("g"), 64).select("hll_raw").as[Double].head()
    val e2 = Hll.estimate(once, Seq("g"), 64).select("hll_raw").as[Double].head()
    assert(e1 == e2)
  }

  test("estimate is insensitive to duplication (a set sketch, not a bag)") {
    val df = (1 to 300).map(i => ("g", s"key-$i")).toDF("g", "k")
    val dup = df.union(df).union(df)
    val e1 = Hll.estimate(Hll.registers(df, Seq("g"), "k", 64), Seq("g"), 64)
      .select("hll_raw").as[Double].head()
    val e2 = Hll.estimate(Hll.registers(dup, Seq("g"), "k", 64), Seq("g"), 64)
      .select("hll_raw").as[Double].head()
    assert(e1 == e2)
  }
}
