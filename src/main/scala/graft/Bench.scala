package graft

import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Driver benchmark: one JSON line with per-query wall seconds at
  * SPARK_GRAFT_SF_DIR (default sf0.1), local[SPARK_GRAFT_CPUS].
  *
  * An untimed warm-up first touches each corpus table once (parquet footer
  * reads, scan-path JIT) so per-query numbers measure the query, not
  * whichever query happens to run first; queries then run in sorted-name
  * order for run-to-run comparability.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // Sub-second queries over MB-scale cached inputs: AQE's per-stage
      // re-planning is pure overhead here (~8% of total bench time) with
      // nothing to re-plan. Production sessions at real scale should keep
      // AQE on (Spark's default) for runtime coalescing and skew joins.
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach { t =>
      try Tables.load(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }
    // SPARK_GRAFT_ONLY=a,b,c restricts to named queries (local profiling)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // Untimed warm-up pass: codegen + JIT compile once and session caches
    // (tables, profile warehouse) materialize. On a cluster these costs
    // amortize to ~zero over TB-scale inputs; folding them into MB-scale
    // per-query numbers would measure the JIT, not the query. The timed
    // pass below reports steady-state latency (flagged in the JSON).
    // Execute the query's OWN plan and iterate every row (toRdd.count):
    // a DataFrame.count() would wrap the plan in COUNT(*), letting the
    // optimizer PRUNE every unreferenced output column — UDAF finishes
    // and string builds would be skipped and the bench would report the
    // cost of counting groups, not of computing results (this is exactly
    // how a quadratic aggregator finish benched at 0.14s while the
    // verify dump spun on it for minutes).
    def exec(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()
    selected.foreach { case (_, fn) =>
      try { exec(fn(spark, sfDir)) } catch { case _: Throwable => () }
    }
    // drain warm-up garbage so a mid-pass full GC doesn't land on one
    // unlucky query's wall time
    System.gc()
    // Two timed passes, per-query MIN: a single pass is hostage to whichever
    // query a concurrent full GC or OS scheduling hiccup lands on (round-3
    // single-pass numbers showed 3-10× one-off outliers on queries whose
    // code hadn't changed). The min of two runs is the honest steady-state
    // latency estimate; the mode flag below says exactly what was measured.
    //
    // Failure honesty: a timed pass that THROWS contributes no wall time —
    // its time-to-failure is not a latency (round 7 recorded a
    // webdataset min that was secretly one failed pass's abort time). The
    // query gets one same-pass retry (transient /tmp races); a pass whose
    // retry also throws yields None for that query, and a query with no
    // successful pass at all lands in the "failed" list instead of the
    // results map.
    def timedPass(): Seq[(String, Option[Double])] =
      selected.map { case (name, fn) =>
        def once(): Option[Double] = {
          val t0 = System.nanoTime()
          try { exec(fn(spark, sfDir)); Some((System.nanoTime() - t0) / 1e9) }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name pass failed: ${e.getMessage}")
            None
          }
        }
        name -> once().orElse(once())
      }
    val p1 = timedPass()
    System.gc()
    val p2 = timedPass().toMap
    val byName = p1.map { case (n, t1) =>
      n -> Seq(t1, p2.getOrElse(n, None)).flatten
    }
    val results = byName.collect { case (n, ts) if ts.nonEmpty => n -> ts.min }
    val failed = byName.collect { case (n, ts) if ts.isEmpty => n }
    def f(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val total = results.map(_._2).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // The driver keeps only a short TAIL of stdout and parses the JSON
    // line from it. 120+ queries no longer fit that tail (rounds 3-5 all
    // recorded "parsed": null), so the FULL per-query map goes to a file
    // and the printed line stays compact: total + the headline queries
    // (one flagship per operator family) + a pointer to the full map.
    val fullJson = results.map { case (k, v) => "\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    // Filtered SPARK_GRAFT_ONLY profiling runs get their own default
    // output file: writing the 2-query map over BENCH_FULL.json loses the
    // round's full sweep (it happened — an 11-query scale-probe run
    // clobbered the 247-query artifact mid-round).
    val fullPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      if (only.isEmpty) "/root/repo/BENCH_FULL.json"
      else "/root/repo/BENCH_ONLY.json")
    val fullLine =
      s"""{"metric":"total","value":${f(total)},"unit":"sec","mode":"steady-state-min2","n":${results.size},"failed":$failedJson,"queries":$fullJson,"sf":"$sfDir"}"""
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(fullPath), fullLine.getBytes("UTF-8"))
      // Archive a per-round copy: BENCH_FULL.json is overwritten each
      // round, losing round-over-round comparison beyond the headliners.
      // Round number = max existing BENCH_r*.json index + 1 (the driver
      // writes BENCH_r{N}.json at round end, AFTER this runs). Filtered
      // SPARK_GRAFT_ONLY profiling runs must NOT archive — a 2-query map
      // would clobber the round's full archive.
      if (only.isEmpty) {
        val dir = java.nio.file.Paths.get(fullPath).toAbsolutePath.getParent
        val rx = "BENCH_r(\\d+)\\.json".r
        val round = java.nio.file.Files.list(dir).iterator().asScala
          .flatMap(p => rx.findFirstMatchIn(p.getFileName.toString))
          .map(_.group(1).toInt).foldLeft(0)(math.max) + 1
        java.nio.file.Files.write(
          dir.resolve(f"BENCH_FULL_r$round%02d.json"), fullLine.getBytes("UTF-8"))
      }
    } catch { case _: Throwable => () } // stdout line below still carries the headline
    val headline = Seq(
      "a1_breakdown", "a5_seqbin_stats", "a6_n50", "a12_growth",
      "f1_range", "f5_alias", "f13_rest_query",
      "j1_designation_and", "j6_st_assign", "j11_broadcast_dims",
      "g1_distance_matrix", "g2_burst", "g3_single_linkage", "g4_lincode",
      "q1_exact_md5", "q2_best_partial", "q4_tag_scan", "q4_longcontig_seeded",
      "q6_mutation_scan", "s1_security_view", "s3_fasta_roundtrip",
      "s9_replicate_profiles", "o4_topk_matches",
      "dedup_exact", "dedup_minhash_lsh", "sim_cosine_topk", "sim_ivf_ann",
      "text_lang_id", "text_tokens", "mm_decode_features",
      "stream_event_stats", "skew_salted_join",
      // round-6 widening representatives
      "seqbin_breakdown", "export_dataset", "sim_pq", "event_sessionize",
      "text_boilerplate_strip", "mm_interleave")
    val rm = results.toMap
    val qs = headline.flatMap(n => rm.get(n).map(v => "\"" + n + "\":" + f(v)))
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${f(total)},"unit":"sec","mode":"steady-state-min2","n":${results.size},"failed":$failedJson,"full":"$fullPath","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
