package graft

import org.apache.spark.sql.SparkSession

/** Plan-artifact dumper for the optimization rounds: writes
  * `explain("formatted")` of named declared queries to `<outDir>/<name>.txt`
  * under the SAME session configuration as [[Bench]] (local[$SPARK_GRAFT_CPUS],
  * shuffle.partitions = cpus, AQE off), so the dumped plan is the plan the
  * bench actually times.
  *
  * Usage: ./run.sh graft.ExplainDump <outDir> <query>[,<query>...]
  * Env:   SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 4),
  *        SPARK_GRAFT_SUFFIX appended to each file name (e.g. "_before").
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_SUFFIX", "")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"$n$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"[explain] wrote $outDir/$n$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
