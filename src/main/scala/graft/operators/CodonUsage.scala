package graft.operators

import graft.functions.Bio
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Codon usage analysis (reference `lib/BIGSdb/Plugins/CodonUsage.pm`):
  * absolute codon counts and RSCU — relative synonymous codon usage —
  * per group (the reference emits by-isolate and by-locus tables).
  *
  * RSCU per codon c with amino acid a (`CodonUsage.pm:344-351,369-376`):
  * expected = aa_count(a) / degeneracy(a); rscu = count(c) / expected,
  * defined as 1 when expected is 0, reported to 3 decimals. Computed
  * here as count(c) * degeneracy(a) / aa_count(a) — one integer-valued
  * double division, so any engine reproduces it bit-for-bit (no float
  * summation anywhere).
  *
  * Scale posture (100 TB of sequence): one narrow triplet explode feeding
  * one map-side-combinable (group, codon) count; everything downstream
  * (aa totals, degeneracy, the dense 64-codon grid) operates on the
  * aggregated |groups|×64 table, never the sequence data again.
  */
object CodonUsage {

  /** The 64 codons with amino acid and degeneracy, from the same standard
    * code table `Bio.Translate` uses.
    */
  val CodonInfo: Seq[(String, String, Int)] = {
    val deg = Bio.CodonTable.groupBy(_._2).view.mapValues(_.size).toMap
    Bio.CodonTable.toSeq.sortBy(_._1)
      .map { case (codon, aa) => (codon, aa.toString, deg(aa)) }
  }

  /** In-frame codon triplets (frame 1, trailing partial dropped — BioPerl
    * translate defaults, as the reference uses).
    */
  def codonArray(seq: Column): Column =
    transform(sequence(lit(0), (length(seq) / lit(3)).cast("int") - 1),
      i => seq.substr(i * lit(3) + lit(1), lit(3)))

  /** Dense per-(group, codon) usage: (group, codon, n, rscu) for all 64
    * codons of every group — zero-count codons kept, as the reference
    * prints them.
    */
  def usage(seqs: DataFrame, groupCol: String, seqCol: String): DataFrame = {
    val spark = seqs.sparkSession
    import spark.implicits._
    val s = upper(col(seqCol))
    val counts = seqs
      .filter(length(s) >= 3)
      .select(col(groupCol).as("__g"), explode(codonArray(s)).as("codon"))
      .groupBy(col("__g"), col("codon"))
      .agg(count(lit(1)).as("__n"))
    // 64-row code dimension (codon, aa, degeneracy) — broadcast side
    val code = broadcast(CodonInfo.toDF("codon", "aa", "deg"))
    val withAa = counts.join(code, Seq("codon"))
    val aaTotals = withAa.groupBy(col("__g"), col("aa"))
      .agg(sum(col("__n")).as("__aat"))
    // dense grid: every group × all 64 codons, narrow explode of the
    // literal codon list (no grid join)
    val grid = seqs.select(col(groupCol).as("__g")).distinct()
      .select(col("__g"),
        explode(typedLit(CodonInfo.map(_._1))).as("codon"))
      .join(code, Seq("codon"))
    grid
      .join(counts, Seq("__g", "codon"), "left")
      .join(aaTotals, Seq("__g", "aa"), "left")
      .select(col("__g").as(groupCol), col("codon"),
        coalesce(col("__n"), lit(0L)).as("n"),
        round(
          when(coalesce(col("__aat"), lit(0L)) > 0,
            coalesce(col("__n"), lit(0L)).cast("double") * col("deg")
              / col("__aat"))
            .otherwise(lit(1.0)), 3).as("rscu"))
  }
}
