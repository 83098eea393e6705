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
    val docs = Tables.load(spark, dir, "documents")
    println("docs = " + docs.count())
    import graft.operators.Hll
    def lab(m: Int, l: String) = docs.filter(col("doc_id") % m === 0)
      .select(lit(l).as("which"), md5(col("text")).as("key"))
    val ab = lab(2, "a").union(lab(3, "b"))
    val grk = ab.groupBy(col("key")).agg(
      max(when(col("which") === "a", 1L).otherwise(0L)).as("ha"),
      max(when(col("which") === "b", 1L).otherwise(0L)).as("hb"))
    val (jc, rhoc) = Hll.regCoords(col("key"), 64)
    val grsel = grk.select(col("key"), col("ha"), col("hb"),
      jc.as("j"), rhoc.as("rho"))
    exec(grsel); exec(grsel) // warm JIT
    time("gr exec (warm)")(exec(grsel))
    val gr = time("gr pin")(graft.operators.Pinning.pin(grsel))
    val sparse = gr.groupBy(col("j")).agg(
        max(when(col("ha") === 1L, col("rho"))).as("__ma"),
        max(when(col("hb") === 1L, col("rho"))).as("__mb"),
        max(col("rho")).as("__mu"))
      .selectExpr("stack(3, 'a', j, __ma, 'b', j, __mb, 'union', j, __mu)" +
        " as (which, j, m)")
      .filter(col("m").isNotNull)
    time("sparse exec")(exec(sparse))
    val estL = Hll.estimate(sparse, Seq("which"), 64)
    time("est exec lazy")(exec(estL))
    val est = time("est pin")(graft.operators.Pinning.pin(estL))
    time("est pin read")(exec(est))
    val q = SparkEntry.queries("corpus_overlap_hll")
    exec(q(spark, dir))
    time("full corpus_overlap_hll #2")(exec(q(spark, dir)))
    time("full corpus_overlap_hll #3")(exec(q(spark, dir)))
    spark.stop()
  }
}
