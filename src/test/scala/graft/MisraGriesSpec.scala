package graft

import graft.operators.MisraGries
import org.apache.spark.sql.functions._

/** Misra-Gries summary + two-pass exact heavy hitters. */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  // skewed fixture: item i of `heavy` appears freq(i) times, plus noise
  private def fixture(seed: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val heavy = (0 until 5).flatMap(i => Seq.fill(200 * (i + 1))(s"h$i"))
    val noise = Seq.fill(2000)(s"n${rnd.nextInt(800)}")
    rnd.shuffle(heavy ++ noise)
  }

  test("aggregator buffer never exceeds k; candidates ⊇ items with count > n/k") {
    val agg = MisraGries.aggregator(20)
    val data = fixture(7)
    // sequential reduce, then a two-way merge split — exercise both paths
    val (l, r) = data.splitAt(data.size / 3)
    val bl = l.foldLeft(agg.zero)(agg.reduce)
    val br = r.foldLeft(agg.zero)(agg.reduce)
    assert(bl.size <= 20 && br.size <= 20)
    val merged = agg.merge(bl, br)
    assert(merged.size <= 20)
    val cands = agg.finish(merged).toSet
    val counts = data.groupBy(identity).view.mapValues(_.size).toMap
    val mustKeep = counts.filter(_._2 * 20 > data.size).keySet
    assert(mustKeep.nonEmpty && mustKeep.subsetOf(cands),
      s"missing=${mustKeep -- cands}")
  }

  test("heavyHitters == exact HAVING reference; partitioning-insensitive") {
    val data = fixture(11)
    val df = data.toDF("word")
    val counts = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = counts.filter(_._2 * 20 > data.size)
    val got = MisraGries.heavyHitters(df, "word", 20)
      .as[(String, Long)].collect().toMap
    assert(got == want)
    val got2 = MisraGries.heavyHitters(df.repartition(13), "word", 20)
      .as[(String, Long)].collect().toMap
    assert(got2 == want)
    // the noise tail is genuinely excluded (the guarantee is non-vacuous)
    assert(counts.size > 20 && want.size < counts.size)
  }
}
