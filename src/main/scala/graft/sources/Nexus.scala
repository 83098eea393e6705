package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Nexus distance-matrix sink + reader (SURVEY §2.10 G5 — the tree-export
  * piece in engine scope: `lib/BIGSdb/Plugins/GenomeComparator.pm`
  * `_make_nexus_file`:1497-1558 writes a `#NEXUS` distances block with
  * `triangle=LOWER diagonal labels`, handed to SplitsTree).
  *
  * Scale posture mirrors the reference: the DISTRIBUTED object is the
  * pairwise-distance DataFrame (the similarity join); the Nexus file is a
  * bounded driver-side export capped at MAX_SPLITS_TAXA = 150 taxa
  * (`lib/BIGSdb/Constants.pm:36`) — above the cap the reference skips tree
  * generation too (`GenomeComparator.pm:1427`).
  */
object Nexus {

  /** `lib/BIGSdb/Constants.pm:36` MAX_SPLITS_TAXA. */
  val MaxTaxa = 150

  /** Write a lower-triangle distance matrix.
    *
    * `pairs` carries one row per unordered pair (a < b); pairs absent from
    * the input get `defaultDist` (profiles sharing nothing); the diagonal
    * is 0. Taxa are sorted ascending, as the reference sorts its ids
    * (`GenomeComparator.pm:1501`).
    */
  def writeDistances(pairs: DataFrame, a: String, b: String, dist: String,
      path: String, defaultDist: Long): Unit = {
    // bounded collect: <= MaxTaxa taxa implies <= MaxTaxa*(MaxTaxa-1)/2
    // pairs, so limiting the collect to that +1 both caps driver memory
    // (an oversized pair DataFrame can't OOM the driver) and detects the
    // overflow in the same single job
    val maxPairs = MaxTaxa * (MaxTaxa - 1) / 2
    val collected = pairs
      .select(col(a).cast("long"), col(b).cast("long"), col(dist).cast("long"))
      .limit(maxPairs + 1).collect()
    require(collected.length <= maxPairs,
      s"> $maxPairs pairs imply > MAX_SPLITS_TAXA=$MaxTaxa taxa " +
        "(Constants.pm:36); export a thresholded pair list instead")
    val rows = collected
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val taxa = rows.keysIterator.flatMap(k => Iterator(k._1, k._2))
      .toArray.distinct.sorted
    require(taxa.length <= MaxTaxa,
      s"${taxa.length} taxa exceed MAX_SPLITS_TAXA=$MaxTaxa " +
        "(Constants.pm:36); export a thresholded pair list instead")
    def d(x: Long, y: Long): Long =
      if (x == y) 0L
      else rows.getOrElse((math.min(x, y), math.max(x, y)), defaultDist)
    val sb = new StringBuilder
    sb ++= "#NEXUS\n[Distance matrix calculated by graft]\n\n"
    sb ++= s"BEGIN taxa;\n   DIMENSIONS ntax = ${taxa.length};\nEND;\n\n"
    sb ++= s"BEGIN distances;\n   DIMENSIONS ntax = ${taxa.length};\n"
    sb ++= "   FORMAT\n      triangle=LOWER\n      diagonal\n      labels\n"
    sb ++= "      missing=?\n   ;\nMATRIX\n"
    for (i <- taxa.indices) {
      sb ++= taxa(i).toString
      for (j <- 0 to i) { sb += '\t'; sb ++= d(taxa(i), taxa(j)).toString }
      sb += '\n'
    }
    sb ++= "   ;\nEND;\n"
    val conf = pairs.sparkSession.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    out.write(sb.result().getBytes("UTF-8")); out.close()
  }

  /** Parse a Nexus distances block back to (taxon_a, taxon_b, dist) rows,
    * a < b (the lower triangle minus the diagonal). Driver-side parse by
    * design: the file is MAX_SPLITS_TAXA-bounded at write time, so it is
    * always ≤ ~150×150 cells.
    */
  def readDistances(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    val text = scala.io.Source.fromInputStream(in, "UTF-8").mkString
    in.close()
    val matrix = text.linesIterator
      .dropWhile(l => l.trim != "MATRIX").drop(1)
      .takeWhile(l => l.trim != ";").toSeq
    val parsed = matrix.flatMap { line =>
      val parts = line.trim.split("\t")
      val taxon = parts.head.toLong
      parts.tail.init.zipWithIndex.map { case (v, j) => (taxon, j, v.toLong) }
    }
    // second pass: column position j → taxon id (row order = taxa order)
    val order = matrix.map(_.trim.split("\t").head.toLong)
    parsed.map { case (t, j, v) => (order(j), t, v) }
      .toDF("taxon_a", "taxon_b", "dist")
  }
}
