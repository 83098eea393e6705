package graft

import graft.queries.AllQueries

/** Adaptive Query Execution equivalence. The bench runs with AQE off
  * (nothing to re-plan at MB scale), but a production cluster keeps
  * Spark's default AQE ON — runtime partition coalescing, skew-join
  * splitting, and join-strategy flips all change HOW results are
  * computed. Every graft operator is designed partition-order-free
  * (exact decimal sums, sorted folds, bounded top-k with total-order
  * ties), so results must be BIT-IDENTICAL under AQE. This spec runs
  * shuffle-heavy representatives both ways and compares collected rows
  * exactly — a failure here means some operator silently depends on
  * partitioning, which would also break it on any real cluster.
  */
class AqeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def withAqe[A](on: Boolean)(body: => A): A = {
    spark.conf.set("spark.sql.adaptive.enabled", on.toString)
    try body finally spark.conf.unset("spark.sql.adaptive.enabled")
  }

  test("AQE on == AQE off, bit-for-bit, across shuffle-heavy operators") {
    // one per operator family: agg, numbering join, exact pair join,
    // IVF probe join, rank prefix sums, clustering, rank fusion
    val names = Seq("a1_breakdown", "j6_st_assign", "dedup_prefix_join",
      "sim_ivf_ann", "text_probe_auc", "g3_single_linkage",
      "search_hybrid_rrf", "dedup_ngram_jaccard")
    for (n <- names) {
      val off = withAqe(false)(rows(AllQueries.queries(n)(spark, dir)))
      val on = withAqe(true)(rows(AllQueries.queries(n)(spark, dir)))
      assert(on == off, s"$n changes results under AQE")
      assert(off.nonEmpty, s"$n returned no rows — vacuous comparison")
    }
  }
}
