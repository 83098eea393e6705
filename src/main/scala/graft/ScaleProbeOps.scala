package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Single-pass scale probe for operators whose 100× runs are too long
  * for the bench harness's warm-up + min-of-2 discipline, plus the
  * documented scale-path VARIANTS of fixture-capped queries:
  *
  *  - any name in SparkEntry.queries → that query, one timed pass
  *    (cold-ish; numbers are upper bounds vs the bench's steady-state)
  *  - `sim_dbscan_lsh` → DBSCAN over Similarity.lshNearDupPairs on the
  *    FULL embeddings table (the operator contract's 100 TB pair
  *    source; the bench's sim_dbscan runs exact all-pairs behind its
  *    500-vector fixture cap, which the slice's vec_id relabeling
  *    does not grow)
  *
  * usage: ScaleProbeOps <sfDir> <name>[,name...]
  */
object ScaleProbeOps {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach { t =>
      try Tables.load(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }
    def dbscanLsh() = {
      val emb = Tables.load(spark, sfDir, "embeddings")
      val pairs = graft.pipeline.Similarity.lshNearDupPairs(
        emb, "vec_id", "embedding", dim = 64, minCos = 0.35,
        bits = 16, tables = 4)
      graft.pipeline.Similarity.dbscan(emb, pairs, "vec_id", minPts = 2)
    }
    // nn_descent with the CONSTANT-CELL-SIZE coarse index (nlist ~ n/64):
    // the bench query's fixed nlist=32 is right at fixture scale but lets
    // seed cells grow linearly with the corpus — per-cell candidate pairs
    // then grow quadratically, the measured 100x knee. Scaling nlist with
    // n (the standard IVF sizing rule) keeps the seed's per-cell work
    // constant; the descent rounds themselves are n·k² edge-local.
    def nnDescentScaled() = {
      val emb = Tables.load(spark, sfDir, "embeddings")
      val n = emb.count()
      // n/64 (constant cell size) measured FASTER than the classic
      // sqrt(n) rule at 100x (71 vs 169 s for the kNN-graph build):
      // per-probe CANDIDATE rows (n·probes·cellsize) price higher than
      // assignment rows (n·nlist) in this engine, so small cells win
      // until assignment's n²/64 row growth catches up beyond 100x —
      // re-balance toward sqrt(n) there.
      val nlist = math.max(32, (n / 64).toInt)
      graft.pipeline.Similarity.nnDescent(emb, "vec_id", "embedding",
        k = 5, nlist = nlist, nprobe = 3, maxRounds = 12, delta = 0.0)
    }
    // sim_components with the constant-cell-size coarse index (nlist ~
    // n/64): the bench query's fixed nlist=32 is the SAME fixture-tuned
    // knee as nn-descent's — at 100x each IVF cell holds ~15k vectors and
    // the per-cell candidate pairs of the kNN-graph build go quadratic
    // (measured 2423s; the CC label loop itself is rounds-bounded). The
    // operator's own sizing rule restores at-most-linear build work.
    def componentsScaled() = {
      val emb = Tables.load(spark, sfDir, "embeddings")
      val n = emb.count()
      val nlist = math.max(32, (n / 64).toInt) // see nnDescentScaled note
      val g = graft.operators.Pinning.pin(
        graft.pipeline.Similarity.mutualKnnGraph(
          emb, "vec_id", "embedding", k = 5, nlist = nlist, nprobe = 3))
      val cc = graft.operators.Clustering.connectedComponents(
        g.select(col("id1").as("src"), col("id2").as("dst")))
        .select(col("node").as("vec_id"), col("component"))
      cc
    }
    // pack_epoch_shuffle over NON-dense ids (the scale slices relabel
    // doc_id*1000+i): densify with runningBySort's two-phase numbering,
    // then the zero-shuffle Feistel projection — the realistic path for a
    // corpus without a precomputed dense index (one range exchange more
    // than the dense fast path the CORRECTNESS query exercises).
    def epochShuffleScaled() = {
      val docs = Tables.load(spark, sfDir, "documents")
      val n = docs.count()
      val dense = graft.operators.Numbering.numberBySort(
        docs.select(col("doc_id")), "doc_id", "idx")
        .select(col("doc_id"), (col("idx") - 1L).as("idx"))
      dense.select(col("doc_id"), col("idx"),
          explode(array(lit(0L), lit(1L), lit(2L))).as("epoch"))
        .select(col("doc_id"), col("epoch"),
          graft.functions.Feistel.permuteCol(
            col("idx"), col("epoch"), n, 77L).as("pos"))
    }
    names.foreach { name =>
      val fn: () => org.apache.spark.sql.DataFrame =
        if (name == "sim_dbscan_lsh") () => dbscanLsh()
        else if (name == "sim_nn_descent_scaled") () => nnDescentScaled()
        else if (name == "pack_epoch_shuffle_scaled") () => epochShuffleScaled()
        else if (name == "sim_components_scaled") () => componentsScaled()
        else () => SparkEntry.queries(name)(spark, sfDir)
      val t0 = System.nanoTime()
      val n = fn().queryExecution.toRdd.count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"""{"op":"$name%s","rows":$n%d,"sec":$secs%.3f,"mode":"single-pass","sf":"$sfDir%s"}""")
    }
    spark.stop()
  }
}
