package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Temporary r15 profiling main (not part of the library surface):
// per-query phase anatomy. Deleted before round close.
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $tag%-44s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    def exec(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()
    val docs = Tables.load(spark, dir, "documents")
    val emb = Tables.load(spark, dir, "embeddings")
    docs.count(); emb.count()
    val full = SparkEntry.queries("ingest_e2e")
    time("full #1")(exec(full(spark, dir)))
    time("full #2")(exec(full(spark, dir)))
    System.gc()
    time("full #3 (post-gc)")(exec(full(spark, dir)))
    System.gc()
    time("full #4 (post-gc)")(exec(full(spark, dir)))
    // queryMinhash phase alone
    val delta0 = docs.filter(col("doc_id") % 11 === 0)
    val mhPath = {
      val m = graft.queries.DedupQueries.getClass
        .getDeclaredMethod("cachedMinhashStore",
          classOf[org.apache.spark.sql.SparkSession], classOf[String])
      m.setAccessible(true)
      m.invoke(graft.queries.DedupQueries, spark, dir).asInstanceOf[String]
    }
    val vq = graft.pipeline.IndexStore.queryMinhash(
      spark, mhPath, delta0, "doc_id", "text", shingleN = 2, k = 64,
      bands = 16, minEstJaccard = 0.1,
      hasher = graft.pipeline.Dedup.portableShingleHashes)
    time("queryMinhash exec")(exec(vq))
    val vq2 = graft.pipeline.IndexStore.queryMinhash(
      spark, mhPath, delta0, "doc_id", "text", shingleN = 2, k = 64,
      bands = 16, minEstJaccard = 0.1,
      hasher = graft.pipeline.Dedup.portableShingleHashes)
    time("queryMinhash exec again")(exec(vq2))
    // phases
    val delta = docs.filter(col("doc_id") % 11 === 0)
    val fs = graft.streaming.StreamDedup.firstSeenByContent(
      delta.withColumn("arrival", col("doc_id")),
      Seq(col("text")), "arrival", "doc_id")
    val surv = fs.select(col("first_id").as("doc_id"), col("n_dups"))
    time("firstSeen exec")(exec(surv))
    time("firstSeen exec again")(exec(surv))
    val admVecsBase = emb.filter(col("vec_id") % 11 =!= 0)
      .select(col("vec_id"), col("embedding"))
    val admV = emb.join(surv.select(col("doc_id").as("vec_id")), Seq("vec_id"))
      .select(col("vec_id"), col("embedding"))
    val ann = graft.pipeline.Similarity.ivfAppendTopK(
      admVecsBase, admV, admV, "vec_id", "embedding", k = 3, nprobe = 4)
    time("ivfAppendTopK exec (surv-gated)")(exec(ann))
    time("ivfAppendTopK exec again")(exec(ann))
    spark.stop()
  }
}
