package graft.operators

import graft.functions.Align
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Center-star multiple sequence alignment (SURVEY §2.10 G7).
  *
  * The reference shells out to MUSCLE per locus and feeds the alignment to
  * its site-frequency/SNP tables (GenomeComparator.pm:1328-1380,
  * LocusExplorer.pm get_freq_table). Spark re-expression: center-star MSA —
  * the classic 2-approximation — built from Catalyst-codegen'd pairwise NW
  * alignments:
  *
  *   1. center per group = member with the minimum id (deterministic; the
  *      reference's MUSCLE input order is curation order, also id-sorted),
  *   2. every member NW-aligns to its group's center — a broadcast join of
  *      the tiny (group → center) dimension against the member fact, so
  *      the O(n·m) kernels run data-local inside one codegen stage,
  *   3. per-group insertion profile = element-wise max of the gap runs each
  *      pairwise alignment inserts into the center (one aggregation),
  *   4. every member re-pads to the profile (codegen'd ProjectGaps) —
  *      all rows of a group come out equal-length.
  *
  * Two shuffles total (center agg + profile agg), both on the group key;
  * group count is small by construction (the reference caps comparable
  * sets at MAX_SPLITS_TAXA=150 taxa, Constants.pm:36), so both dimension
  * joins broadcast.
  */
object Alignment {

  /** MSA rows (group, id, msa): msa strings of one group share one length.
    * Input must have one row per (group, id); sequences gap-free.
    */
  def centerStar(df: DataFrame, group: String, id: String, seq: String): DataFrame = {
    val centers = df.groupBy(col(group))
      .agg(min(struct(col(id), col(seq))).as("__c"))
      .select(col(group), col("__c").getField(seq).as("__cseq"))
    val aligned = df.join(broadcast(centers), Seq(group))
      .withColumn("__ali", Align.nwAlign(col("__cseq"), col(seq)))
      // insertion runs: lengths of the '-' runs around/between center
      // chars in the aligned center (always centerLen + 1 entries)
      .withColumn("__ins",
        transform(split(col("__ali").getField("a_ali"), "[^-]"), x => length(x)))
    val prof = aligned
      .select(col(group), posexplode(col("__ins")))
      .groupBy(col(group), col("pos"))
      .agg(max(col("col")).as("mx"))
      .groupBy(col(group))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("mx")))),
        x => x.getField("mx")).as("__prof"))
    aligned.join(broadcast(prof), Seq(group))
      .select(col(group), col(id),
        Align.projectGaps(
          col("__ali").getField("a_ali"), col("__ali").getField("b_ali"),
          col("__prof")).as("msa"))
  }

  /** Pairwise center alignments (group, id, a_ali, b_ali, dist) — the
    * step-2 intermediate, exposed for distance tables and the oracle.
    */
  def pairwiseToCenter(df: DataFrame, group: String, id: String, seq: String): DataFrame = {
    val centers = df.groupBy(col(group))
      .agg(min(struct(col(id), col(seq))).as("__c"))
      .select(col(group), col("__c").getField(seq).as("__cseq"))
    df.join(broadcast(centers), Seq(group))
      .withColumn("__ali", Align.nwAlign(col("__cseq"), col(seq)))
      .select(col(group), col(id),
        col("__ali").getField("a_ali").as("a_ali"),
        col("__ali").getField("b_ali").as("b_ali"),
        col("__ali").getField("dist").cast("long").as("dist"))
  }

  /** Site-frequency table over an MSA (LocusExplorer get_freq_table):
    * (group, position, residue, n) with '-' counted as a residue.
    */
  def siteFrequencies(msa: DataFrame, group: String, msaCol: String): DataFrame =
    msa.select(col(group), posexplode(split(col(msaCol), "")))
      .filter(col("col") =!= "")
      .select(col(group), (col("pos") + 1).cast("long").as("position"),
        col("col").as("residue"))
      .groupBy(col(group), col("position"), col("residue"))
      .agg(count(lit(1)).as("n"))
}
