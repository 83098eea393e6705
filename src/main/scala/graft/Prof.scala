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
      println(f"[prof] $tag%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    def exec(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()
    import graft.pipeline.Similarity
    val emb = Tables.load(spark, dir, "embeddings").filter(col("vec_id") < 500)
    emb.count()
    val full = SparkEntry.queries("sim_dbscan")
    exec(full(spark, dir)); exec(full(spark, dir))
    time("full sim_dbscan warm")(exec(full(spark, dir)))
    val pairs = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.35)
    time("pairs exec")(exec(pairs))
    time("pairs exec again")(exec(pairs))
    val pairs2 = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.35)
    time("dbscan only (pairs prebuilt)")(
      exec(Similarity.dbscan(emb, pairs2, "vec_id", minPts = 2)))
    // interior anatomy
    val edges = pairs2.select(col("id1").as("n"), col("id2").as("m"))
      .unionByName(pairs2.select(col("id2").as("n"), col("id1").as("m")))
    val deg = edges.groupBy(col("n")).agg(count(lit(1)).as("degree"))
    val core = deg.filter(col("degree") >= 2).select(col("n"))
    val coreEdges = edges
      .join(core.withColumnRenamed("n", "__cn"), col("n") === col("__cn"),
        "left_semi")
      .join(core.withColumnRenamed("n", "__cm"), col("m") === col("__cm"),
        "left_semi")
    time("coreEdges exec")(exec(coreEdges))
    val comp = time("connectedComponents call")(
      graft.operators.Clustering.connectedComponents(
        coreEdges.select(col("n").as("src"), col("m").as("dst"))))
    time("comp exec")(exec(comp))
    val comp2 = time("cc call again")(
      graft.operators.Clustering.connectedComponents(
        coreEdges.select(col("n").as("src"), col("m").as("dst"))))
    spark.stop()
  }
}
