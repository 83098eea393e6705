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
    val emb = Tables.load(spark, dir, "embeddings")
    println("emb = " + emb.count())
    val q = emb.filter(col("vec_id") < 8)
    // one full run to warm the session memos (truth/ivf32/adc32/pq models)
    val full = SparkEntry.queries("sim_recall_report")
    exec(full(spark, dir))
    exec(full(spark, dir))
    time("full sim_recall_report warm")(exec(full(spark, dir)))
    def lsh(ph: Int, ps: Int) =
      Similarity.lshTopK(emb, q, "vec_id", "embedding", dim = 64, k = 5,
        bits = 4, tables = 4, probeHamming = ph, probeSeq = ps)
    time("lsh_0probe")(exec(lsh(0, 0)))
    time("lsh_0probe again")(exec(lsh(0, 0)))
    time("lsh_directed_m2")(exec(lsh(1, 2)))
    time("lsh_hamming1")(exec(lsh(1, 0)))
    // planning vs execution split for the giant unioned plan
    val df1 = full(spark, dir)
    time("analyze+optimize+plan")(df1.queryExecution.executedPlan)
    time("execute only")(exec(df1))
    val df2 = full(spark, dir)
    time("plan again (fresh df)")(df2.queryExecution.executedPlan)
    time("execute again")(exec(df2))
    spark.stop()
  }
}
