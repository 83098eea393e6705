package graft

import org.apache.spark.sql.functions._

/** mix_interleave's deadline schedule: earliest-deadline-first with
  * deadline(k, s) = ceil(k·T/w_s) is the smooth weighted round-robin —
  * every schedule prefix carries each source in proportion to its weight.
  */
class InterleaveSpec extends SparkSpec {
  import spark.implicits._

  // three sources, weights 3:2:1, corpus sizes MATCHING the mixture
  // (300/200/100) — the operator's contract: with sizes proportional to
  // weights every source drains at the same schedule time; a source that
  // runs out early would tail-pack (upstream budget/epoch ops equalize)
  private lazy val sched: Seq[(String, Long)] = {
    val docs = (0L until 600L).map(i =>
      (i, if (i < 300) "src0" else if (i < 500) "src1" else "src2"))
      .toDF("doc_id", "source")
    val w = Seq(("src0", 3000L), ("src1", 2000L), ("src2", 1000L)).toDF("source", "ws")
    val tw = w.agg(sum($"ws").as("tw"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"doc_id")
    val dl = docs.join(broadcast(w), "source").crossJoin(broadcast(tw))
      .withColumn("k", row_number().over(win).cast("long"))
      .select($"doc_id", $"source", $"k", expr("(k * tw + ws - 1) div ws").as("deadline"))
    graft.operators.Numbering
      .runningBySort(dl, Seq($"deadline", $"source", $"k"), lit(1L), "global_pos")
      .select($"source", $"global_pos").as[(String, Long)]
      .collect().sortBy(_._2).toSeq
  }

  test("global_pos is a 1..N permutation") {
    assert(sched.map(_._2).toSet === (1L to 600L).toSet)
  }

  test("every prefix is proportionally mixed to within one emission") {
    // after m emissions, source s with weight share p_s has floor/ceil
    // bracketing: count within [floor(m·p_s) - 1, ceil(m·p_s) + 1]
    val shares = Map("src0" -> 0.5, "src1" -> (1.0 / 3.0), "src2" -> (1.0 / 6.0))
    val counts = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    sched.zipWithIndex.foreach { case ((src, _), i) =>
      counts(src) += 1
      val m = i + 1
      shares.foreach { case (s, p) =>
        val c = counts(s)
        assert(c >= math.floor(m * p) - 1 && c <= math.ceil(m * p) + 1,
          s"prefix $m source $s count $c share $p")
      }
    }
  }

  private def schedule(docs: org.apache.spark.sql.DataFrame,
      w: org.apache.spark.sql.DataFrame): Seq[(String, Long)] = {
    val tw = w.agg(sum($"ws").as("tw"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"doc_id")
    val dl = docs.join(broadcast(w), "source").crossJoin(broadcast(tw))
      .withColumn("k", row_number().over(win).cast("long"))
      .select($"doc_id", $"source", $"k",
        expr("(k * tw + ws - 1) div ws").as("deadline"))
    graft.operators.Numbering
      .runningBySort(dl, Seq($"deadline", $"source", $"k"), lit(1L), "global_pos")
      .select($"source", $"global_pos").as[(String, Long)]
      .collect().sortBy(_._2).toSeq
  }

  test("degenerate single source: schedule is the identity order") {
    val docs = (0L until 50L).map((_, "only")).toDF("doc_id", "source")
    val w = Seq(("only", 1000L)).toDF("source", "ws")
    val s = schedule(docs, w)
    assert(s.map(_._2) === (1L to 50L))
    assert(s.forall(_._1 == "only"))
  }

  test("extreme 100:1 skew: the light source still lands evenly, never bunched") {
    // 303 docs: 300 heavy (weight 100), 3 light (weight 1) — proportional
    // sizes. The light source's deadlines are ceil(k*101*100/100)... its
    // emissions must fall near positions ~101, ~202, ~303, not cluster.
    val docs = ((0L until 300L).map((_, "heavy")) ++
      (300L until 303L).map((_, "light"))).toDF("doc_id", "source")
    val w = Seq(("heavy", 10000L), ("light", 100L)).toDF("source", "ws")
    val s = schedule(docs, w)
    assert(s.map(_._2).toSet === (1L to 303L).toSet)
    val lightPos = s.filter(_._1 == "light").map(_._2)
    assert(lightPos.size === 3)
    // gaps between light emissions stay near 101 (within one emission)
    val gaps = (0L +: lightPos).sliding(2).map(p => p(1) - p(0)).toSeq
    gaps.foreach(g => assert(g >= 99 && g <= 103, s"gaps $gaps"))
  }

  test("no run of a single source longer than the heaviest share implies") {
    // src0 holds half the weight: between two consecutive src0 emissions at
    // most 2 other docs can ever appear... conversely src0 can never run
    // more than 2 in a row under EDF with these integer deadlines
    val runs = sched.map(_._1).foldLeft(List.empty[(String, Int)]) {
      case ((s, n) :: t, x) if s == x => (s, n + 1) :: t
      case (acc, x) => (x, 1) :: acc
    }
    assert(runs.map(_._2).max <= 2, runs.filter(_._2 > 2).take(3).toString)
  }
}
