package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** EMBL flat-file sink (SURVEY §2.1 S8 — lib/BIGSdb/SeqbinToEMBL.pm).
  *
  * The reference assembles a Bio::Seq per contig (id, comments, accession
  * list, one CDS feature per tag ordered by start then locus,
  * SeqbinToEMBL.pm:75-160) and lets BioPerl's Bio::SeqIO emit EMBL. This is
  * the same record model serialized by our own formatter: ID/AC/DE header,
  * FT feature table (complement() for reverse-strand tags), SQ composition
  * line, 60-base sequence rows with cumulative position counters.
  *
  * Scale: tags aggregate per contig with one shuffle (collect_list over the
  * tag fact, map-side partial); contigs then left-join their feature list
  * and each record serializes independently inside a typed `map` — the one
  * genuinely imperative step of a text sink, run streaming per partition,
  * never collected to the driver.
  */
object Embl {

  final case class Feature(locus: String, start: Long, end: Long, reverse: Boolean)

  /** One EMBL record. Accessions: the contig id leads, like the
    * reference's unshift (SeqbinToEMBL.pm:125).
    */
  def formatRecord(
      id: String, seq: String, desc: String,
      extraAccessions: Seq[String], features: Seq[Feature]): String = {
    val sb = new StringBuilder
    val len = seq.length
    sb ++= s"ID   $id; SV 1; linear; DNA; STD; UNC; $len BP.\n"
    sb ++= "XX\n"
    sb ++= s"AC   ${(id +: extraAccessions).mkString("; ")};\n"
    sb ++= "XX\n"
    if (desc.nonEmpty) { sb ++= s"DE   $desc\n"; sb ++= "XX\n" }
    if (features.nonEmpty) {
      sb ++= "FH   Key             Location/Qualifiers\n"
      sb ++= "FH\n"
      features.foreach { f =>
        val loc =
          if (f.reverse) s"complement(${f.start}..${f.end})"
          else s"${f.start}..${f.end}"
        sb ++= f"FT   CDS             $loc%s\n"
        sb ++= s"""FT                   /gene="${f.locus}"\n"""
        sb ++= s"""FT                   /locus_tag="${f.locus}"\n"""
      }
      sb ++= "XX\n"
    }
    val u = seq.toUpperCase
    def n(c: Char) = u.count(_ == c)
    val (na, nc, ng, nt) = (n('A'), n('C'), n('G'), n('T'))
    val other = len - na - nc - ng - nt
    sb ++= s"SQ   Sequence $len BP; $na A; $nc C; $ng G; $nt T; $other other;\n"
    var pos = 0
    while (pos < len) {
      val line = seq.slice(pos, pos + 60).toLowerCase
      val groups = line.grouped(10).mkString(" ")
      val upto = math.min(pos + 60, len)
      val body = "     " + groups
      sb ++= body + " " * math.max(1, 75 - body.length) + s"$upto\n"
      pos += 60
    }
    sb ++= "//\n"
    sb.toString
  }

  /** Join contigs with their tags and serialize one EMBL record per contig.
    * `contigs`: (idCol, seqCol, descCol nullable); `tags`:
    * (idCol, locusCol, startCol, endCol, reverseCol). Feature order is the
    * reference's ORDER BY start_pos, locus (SeqbinToEMBL.pm:103).
    */
  def format(
      contigs: DataFrame, idCol: String, seqCol: String, descCol: String,
      tags: DataFrame, locusCol: String, startCol: String, endCol: String,
      reverseCol: String): Dataset[String] = {
    val spark = contigs.sparkSession
    import spark.implicits._
    val feats = tags
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(
        col(startCol).cast("long").as("start"),
        col(locusCol).cast("string").as("locus"),
        col(endCol).cast("long").as("end"),
        col(reverseCol).as("reverse")))).as("__feats"))
    contigs
      .select(col(idCol).cast("string").as("__id"), col(seqCol).as("__seq"),
        coalesce(col(descCol).cast("string"), lit("")).as("__desc"))
      .join(feats.withColumnRenamed(idCol, "__jid"),
        col("__id") === col("__jid").cast("string"), "left")
      .select(col("__id"), col("__seq"), col("__desc"), col("__feats"))
      .as[(String, String, String, Option[Seq[(Long, String, Long, Boolean)]])]
      .map { case (id, seq, desc, fs) =>
        formatRecord(id, seq, desc, Nil,
          fs.getOrElse(Nil).map { case (s, l, e, r) => Feature(l, s, e, r) })
      }
  }

  def write(
      contigs: DataFrame, idCol: String, seqCol: String, descCol: String,
      tags: DataFrame, locusCol: String, startCol: String, endCol: String,
      reverseCol: String, path: String): Unit =
    format(contigs, idCol, seqCol, descCol, tags, locusCol, startCol,
      endCol, reverseCol)
      .write.mode("overwrite").text(path)
}
