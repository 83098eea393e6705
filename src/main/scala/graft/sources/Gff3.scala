package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** GFF3 annotation sink (SURVEY §2.1 S8 — lib/BIGSdb/SeqbinToGFF3.pm):
  * formats a (contig × tag) join as GFF3 feature lines. A pure formatter
  * over the joined DataFrame — one projection, written with df.write.text.
  */
object Gff3 {

  val Header = "##gff-version 3"

  /** Format tag rows (seqid, source, featureType, start, end, strand, id)
    * as GFF3 lines. `strand` is a boolean "reverse" column.
    */
  def format(
      tags: DataFrame,
      seqId: String, featureType: String,
      start: String, end: String, reverse: String,
      attributes: Map[String, String]): DataFrame = {
    val attrCol: Column = concat_ws(";",
      attributes.toSeq.sortBy(_._1).map { case (k, v) =>
        concat(lit(s"$k="), col(v))
      }: _*)
    tags.select(concat_ws("\t",
      col(seqId),
      lit("graft"),
      lit(featureType),
      col(start), col(end),
      lit("."),
      when(col(reverse), "-").otherwise("+"),
      lit("0"),
      attrCol).as("value"))
  }

  def write(tags: DataFrame, seqId: String, featureType: String,
      start: String, end: String, reverse: String,
      attributes: Map[String, String], path: String): Unit =
    format(tags, seqId, featureType, start, end, reverse, attributes)
      .write.mode("overwrite").text(path)
}
