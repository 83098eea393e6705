package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted ANN indexes — the 100 TB operational posture: an index is
  * built ONCE (a corpus-scale job), published as parquet, and served by
  * any number of later sessions that never touch the raw corpus. The
  * reference has the same lifecycle for its BLAST caches
  * (lib/BIGSdb/Offline/Blast.pm:247-330 creates and reuses on-disk
  * databases; Datastore.pm's temp tables are rename-swapped) — here the
  * index is two plain parquet tables, so every Spark capability
  * (pruning, broadcast, bucketing) applies to serving.
  *
  * Atomicity: BOTH index tables (centroids + assigned corpus) are
  * written under ONE versioned directory and flip with ONE pointer
  * rename ([[graft.operators.CacheRefresh.publishVersioned]]) — a
  * reader can never observe new centroids with an old assignment (a
  * torn index would silently mis-probe: cell ids are only meaningful
  * against the centroids they were assigned to). Refresh keeps the N-1
  * version alive plus the age grace, so in-flight queries survive a
  * rebuild.
  *
  * Fidelity: parquet stores the double arrays bit-exactly and the
  * scoring path is byte-for-byte [[Similarity.ivfScoreTopK]] — a loaded
  * index answers BIT-IDENTICALLY to the in-session build
  * (IndexStoreSpec pins it row-for-row, and the sim_ivf_persisted
  * CORRECTNESS row shares sim_ivf_ann's oracle).
  */
object IndexStore {

  /** Build and publish an IVF index for `corpus` under `livePath`.
    * The assigned table keeps the corpus partition count (it IS
    * corpus-sized); the centroid dimension collapses to one file.
    */
  def saveIvf(corpus: DataFrame, id: String, vec: String, nlist: Int,
      livePath: String,
      trained: Option[Seq[(Long, Seq[Double])]] = None): Unit = {
    val (centroids, assigned) =
      Similarity.ivfIndexFrames(corpus, id, vec, nlist, trained)
    graft.operators.CacheRefresh.publishVersioned(
      corpus.sparkSession, livePath) { dir =>
      centroids.repartition(1).write.mode("overwrite")
        .parquet(s"$dir/centroids")
      assigned.write.mode("overwrite").parquet(s"$dir/assigned")
    }
  }

  /** Load the live (centroids, assigned) pair published by [[saveIvf]]. */
  def loadIvf(spark: SparkSession, livePath: String):
      (DataFrame, DataFrame) = {
    val live = graft.operators.CacheRefresh.resolveLive(spark, livePath)
    (spark.read.parquet(s"$live/centroids"),
      spark.read.parquet(s"$live/assigned"))
  }

  /** Serve top-k queries from the persisted index — no corpus access,
    * no index build: the per-session cost is two parquet reads. The
    * probe fan-out and scoring kernel are exactly the in-session path's.
    */
  def queryIvf(spark: SparkSession, livePath: String, queries: DataFrame,
      id: String, vec: String, k: Int, nprobe: Int): DataFrame = {
    val (centroids, assigned) = loadIvf(spark, livePath)
    Similarity.ivfScoreTopK(centroids, assigned, queries, id, vec, k,
      nprobe)
  }
}
