package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FASTA source/sink (SURVEY §2.1 S3/S4/S5; reference parser
  * lib/BIGSdb/Utils.pm:270-293).
  *
  * Distributed read without a custom FileFormat: set the line separator to
  * ">" so each text record is one FASTA entry ("id desc\nseq\nseq..."),
  * then split header/sequence with built-ins. Records never span Spark
  * rows, so the parse is embarrassingly parallel and the file can be any
  * size (Spark splits on the separator).
  */
object Fasta {

  /** Read a FASTA file/dir into (id, description, sequence). Sequence
    * whitespace/newlines are stripped, case preserved (the reference
    * uppercases at comparison time, not ingest).
    */
  def read(spark: SparkSession, path: String): DataFrame =
    parseRecords(spark.read.option("lineSep", ">").text(path))

  /** Read a [[writePartitioned]] layout, recovering the Hive partition
    * column (e.g. `locus=abcZ/`) alongside each record — the reader side of
    * the per-locus bulk download (S5). Partition discovery is Spark's own
    * (directory listing is distributed), so the layout scales to any locus
    * count, and a query for one locus prunes to that directory.
    */
  def readPartitioned(spark: SparkSession, path: String,
      partitionCol: String): DataFrame = {
    val raw = spark.read.option("lineSep", ">").text(path)
    parseRecords(raw)
      .select(col("id"), col("description"), col("sequence"), col(partitionCol))
  }

  private def parseRecords(raw: DataFrame): DataFrame = {
    val passthrough = raw.columns.filterNot(_ == "value").map(col).toSeq
    raw.filter(trim(col("value")) =!= "")
      .select(passthrough :+
        // header = text before first newline; id = first token
        substring_index(col("value"), "\n", 1).as("header") :+
        // sequence = the rest, newlines and CRs removed
        regexp_replace(
          expr("substring(value, instr(value, '\n') + 1)"),
          "[\r\n\\s]", "").as("sequence"): _*)
      .select(passthrough :+
        substring_index(trim(col("header")), " ", 1).as("id") :+
        when(instr(trim(col("header")), " ") > 0,
          expr("substring(trim(header), instr(trim(header), ' ') + 1)"))
          .otherwise(lit("")).as("description") :+
        col("sequence"): _*)
      .filter(col("id") =!= "")
  }

  /** Format (id, description, sequence) rows as FASTA text lines, wrapped at
    * `width` characters (the reference's BigsDB downloads wrap at 60).
    * Returns a single-column DataFrame ready for df.write.text — the bulk
    * allele/profile download sink (DownloadAllelesPage).
    */
  private def headerCol(id: String, desc: Option[String]) = desc match {
    case Some(d) => concat(lit(">"), col(id),
      when(col(d).isNotNull && col(d) =!= "", concat(lit(" "), col(d)))
        .otherwise(lit("")))
    case None => concat(lit(">"), col(id))
  }

  private def recordCol(id: String, seq: String,
      desc: Option[String], width: Int) = {
    // greatest(..., 0): an empty sequence wraps to one empty line, not the
    // two stray lines sequence(0, -1) = [0, -1] would produce
    val wrapped = array_join(
      transform(
        sequence(lit(0),
          greatest(floor((length(col(seq)) - 1) / width), lit(0)).cast("int")),
        i => substr(col(seq), (i * width + 1).cast("int"), lit(width))),
      "\n")
    concat(headerCol(id, desc), lit("\n"), wrapped)
  }

  def format(df: DataFrame, id: String, seq: String,
      desc: Option[String] = None, width: Int = 60): DataFrame =
    df.select(recordCol(id, seq, desc, width).as("value"))

  /** Write FASTA to `path` (one part per partition; repartition upstream to
    * control file count — partitioned by locus for the per-locus download
    * layout, S5).
    */
  def write(df: DataFrame, id: String, seq: String, path: String,
      desc: Option[String] = None): Unit =
    format(df, id, seq, desc).write.mode("overwrite").text(path)

  /** S5 — per-locus bulk download layout (DownloadAllelesPage /
    * DownloadProfilesPage): one FASTA directory per partition value, e.g.
    * `path/locus=abcZ/`. `repartition(partitionCol)` first so each locus is
    * written by the tasks owning it (no tiny-file explosion: files per
    * locus = partitions actually holding it, post-shuffle exactly 1), and
    * the layout is discoverable by any Hive-partitioning-aware reader.
    */
  def writePartitioned(df: DataFrame, id: String, seq: String,
      partitionCol: String, path: String,
      desc: Option[String] = None, width: Int = 60): Unit =
    df.repartition(col(partitionCol))
      .select(col(partitionCol), recordCol(id, seq, desc, width).as("value"))
      .write.mode("overwrite").partitionBy(partitionCol).text(path)
}
