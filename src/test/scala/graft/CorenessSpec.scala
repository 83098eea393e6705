package graft

import graft.pipeline.Similarity
import org.apache.spark.sql.functions._

/** Pins the h-index coreness iteration (Similarity.corenessHIndex) to the
  * ground truth it claims: synchronous h-index rounds decrease monotonically
  * to the exact vertex coreness (Lü et al. 2016), so a converged round count
  * must equal a brute-force k-core peel — and one extra round must change
  * nothing. sim_coreness runs 5 rounds on the mutual-kNN graph (degree ≤ k);
  * these fixtures bound the same regime.
  */
class CorenessSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force coreness: v's coreness is the largest k whose k-core
    * (maximal subgraph with all degrees ≥ k) still contains v.
    */
  private def brutePeel(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val core = scala.collection.mutable.Map(verts.map(_ -> 0L): _*)
    var k = 1L
    var alive = verts.toSet
    while (alive.nonEmpty) {
      // peel to the k-core: drop vertices with degree < k until stable
      var changed = true
      while (changed) {
        val deg = edges.filter(e => alive(e._1) && alive(e._2))
          .flatMap(e => Seq(e._1, e._2)).groupBy(identity)
          .map { case (v, es) => v -> es.size }
        val keep = alive.filter(v => deg.getOrElse(v, 0) >= k)
        changed = keep != alive
        alive = keep
      }
      alive.foreach(v => core(v) = k)
      k += 1
    }
    core.toMap
  }

  /** In-memory h-index rounds: h_0 = degree, h_{t+1}(v) = H({h_t(u)}). */
  private def hRounds(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val sym = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val nbrs = sym.groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
    var h: Map[Long, Long] = nbrs.map { case (v, ns) => v -> ns.size.toLong }
    for (_ <- 1 to rounds) {
      h = nbrs.map { case (v, ns) =>
        val vals = ns.map(h).sortBy(-_)
        v -> vals.zipWithIndex.map { case (x, i) => math.min(i + 1L, x) }.max
      }
    }
    h
  }

  test("corenessHIndex: K4 + pendant structures match the hand peel") {
    // K4 {1,2,3,4} (coreness 3), vertex 5 tied to {1,4} (coreness 2),
    // tail 5-8 (8 coreness 1)
    val edges = (for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)) ++
      Seq((1L, 5L), (4L, 5L), (5L, 8L))
    val df = edges.toDF("id1", "id2")
    val got = Similarity.corenessHIndex(df, "id1", "id2", rounds = 3)
      .select("id", "coreness").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 2L, 8L -> 1L))
    // degrees are reported alongside
    val degs = Similarity.corenessHIndex(df, "id1", "id2", rounds = 3)
      .select("id", "degree").as[(Long, Long)].collect().toMap
    assert(degs == Map(1L -> 4L, 2L -> 3L, 3L -> 3L, 4L -> 4L, 5L -> 3L, 8L -> 1L))
  }

  test("converged round = one more round = brute peel on a random graph") {
    val rnd = new scala.util.Random(41)
    val edges = (1 to 90).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    // find the in-memory fixpoint round (graph-dependent, like the
    // DuckDB round-by-round probe that sized sim_coreness's rounds=5)
    var rStar = 1
    while (hRounds(edges, rStar) != hRounds(edges, rStar + 1)) rStar += 1
    val df = edges.toDF("id1", "id2")
    val a = Similarity.corenessHIndex(df, "id1", "id2", rStar)
      .select("id", "coreness").as[(Long, Long)].collect().toMap
    val b = Similarity.corenessHIndex(df, "id1", "id2", rStar + 1)
      .select("id", "coreness").as[(Long, Long)].collect().toMap
    assert(a == b, s"fixpoint at round $rStar did not hold distributed")
    assert(a == brutePeel(edges))
  }

  test("each distributed round replays the in-memory h-index recurrence") {
    val rnd = new scala.util.Random(7)
    val edges = (1 to 60).map(_ =>
      (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val df = edges.toDF("id1", "id2")
    for (r <- 1 to 3) {
      val got = Similarity.corenessHIndex(df, "id1", "id2", r)
        .select("id", "coreness").as[(Long, Long)].collect().toMap
      assert(got == hRounds(edges, r), s"diverged at round $r")
    }
  }

  test("partitioning-insensitive") {
    val rnd = new scala.util.Random(23)
    val edges = (1 to 70).map(_ =>
      (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(e => e._1 != e._2).distinct
    val df = edges.toDF("id1", "id2")
    val a = Similarity.corenessHIndex(df, "id1", "id2", 3)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val b = Similarity.corenessHIndex(df.repartition(17), "id1", "id2", 3)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(a == b)
  }
}
