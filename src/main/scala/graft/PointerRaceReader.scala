package graft

import org.apache.spark.sql.SparkSession

/** Cross-PROCESS half of the pointer-publish atomicity proof (r11
  * VERDICT #6): FederationSpec's in-process race readers share the
  * writer's JVM, but the protocol's actual claim is rename(2) atomicity
  * between INDEPENDENT processes — the reference's property
  * (lib/BIGSdb/Datastore.pm:2165-2172 rename-swapped temp tables). This
  * main is spawned as a second JVM by CrossProcessSwapSpec and hammers
  * [[graft.operators.CacheRefresh.resolveLive]] (the real reader code
  * path) while the parent storms publishes, verifying on every read:
  *
  *  - the pointer RESOLVES (a delete-then-rename window would surface
  *    as a fallback to the bare livePath);
  *  - the resolved version directory's content is COMPLETE and
  *    internally consistent (data lines match the version stamp and the
  *    sum sidecar — a torn publish would mismatch);
  *  - observed versions are MONOTONE non-decreasing (a stale pointer
  *    re-appearing would go backwards).
  *
  * Exits after `livePath.stop` appears, printing one JSON line:
  * {"reads":N,"failures":N,"max_version":N,"detail":"..."}
  *
  * usage: PointerRaceReader <livePath>
  */
object PointerRaceReader {
  def main(args: Array[String]): Unit = {
    val livePath = args(0)
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // parent waits for this marker before starting the storm, so every
    // read below races a live writer
    println("READER_READY")
    System.out.flush()
    val stop = java.nio.file.Paths.get(livePath + ".stop")
    var reads = 0L
    var failures = 0L
    var maxV = 0L
    var detail = ""
    def fail(msg: String): Unit = {
      failures += 1
      if (detail.isEmpty) detail = msg
    }
    val vRe = "\\.v(\\d+)$".r
    while (!java.nio.file.Files.exists(stop)) {
      try {
        val live = graft.operators.CacheRefresh.resolveLive(spark, livePath)
        reads += 1
        if (live == livePath) {
          // pointer missing: resolveLive fell back — the torn-pointer
          // window FederationSpec's ChecksumFs fix closed
          fail(s"read $reads: pointer missing (fallback to livePath)")
        } else {
          val v = vRe.findFirstMatchIn(live).map(_.group(1).toLong)
            .getOrElse(-1L)
          if (v < maxV) fail(s"read $reads: version went backwards " +
            s"($maxV -> $v)")
          maxV = math.max(maxV, v)
          val dir = java.nio.file.Paths.get(live)
          val data = new String(java.nio.file.Files.readAllBytes(
            dir.resolve("data.txt")), "UTF-8")
          val sum = new String(java.nio.file.Files.readAllBytes(
            dir.resolve("sum.txt")), "UTF-8").trim
          val lines = data.split("\n", -1).filter(_.nonEmpty)
          val want = s"version $v"
          if (lines.length != 100 || !lines.forall(_ == want) ||
              sum != s"100 $v")
            fail(s"read $reads: torn content in v$v " +
              s"(${lines.length} lines, sum '$sum')")
        }
      } catch {
        case e: Throwable => fail(s"read $reads: ${e.getClass.getName} " +
          s"${e.getMessage}")
      }
    }
    println(s"""{"reads":$reads,"failures":$failures,"max_version":$maxV,"detail":"${detail.replace("\"", "'")}"}""")
    System.out.flush()
    spark.stop()
  }
}
