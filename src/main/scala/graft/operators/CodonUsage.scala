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
  * Scale posture (100 TB of sequence, by-isolate mode = millions of
  * groups): ONE narrow triplet explode feeding ONE map-side-combinable
  * aggregation that builds the full 64-slot count vector per group; the
  * per-amino-acid totals and every RSCU value are in-row arithmetic over
  * those 64 longs, and the dense per-codon table is a narrow posexplode.
  * Zero joins, one shuffle (the group-by key) — PlanSpec pins it.
  */
object CodonUsage {

  /** The 64 codons with amino acid and degeneracy, from the same standard
    * code table `Bio.Translate` uses (alphabetical codon order).
    */
  val CodonInfo: Seq[(String, String, Int)] = {
    val deg = Bio.CodonTable.groupBy(_._2).view.mapValues(_.size).toMap
    Bio.CodonTable.toSeq.sortBy(_._1)
      .map { case (codon, aa) => (codon, aa.toString, deg(aa)) }
  }

  /** In-frame codon triplets (frame 1, trailing partial dropped — BioPerl
    * translate defaults, as the reference uses). Empty array below 3 chars.
    */
  def codonArray(seq: Column): Column =
    when(length(seq) >= 3,
      transform(sequence(lit(0), (length(seq) / lit(3)).cast("int") - 1),
        i => seq.substr(i * lit(3) + lit(1), lit(3))))
      .otherwise(array())

  /** Dense per-(group, codon) usage: (group, codon, n, rscu) for all 64
    * codons of every group — zero-count codons kept, as the reference
    * prints them; groups whose sequences are all sub-codon length keep
    * their all-zero rows (rscu 1).
    */
  def usage(seqs: DataFrame, groupCol: String, seqCol: String): DataFrame = {
    val n = CodonInfo.size
    // one pass: 64 conditional sums -> the per-group count vector.
    // explode_outer keeps triplet-less groups (their null codon matches
    // no slot, so the vector is all zeros).
    val counts = seqs
      .select(col(groupCol).as("__g"),
        explode_outer(codonArray(upper(col(seqCol)))).as("__codon"))
      .groupBy(col("__g"))
      .agg(array(CodonInfo.map { case (c, _, _) =>
        sum(when(col("__codon") === c, 1L).otherwise(0L))
      }: _*).as("__ns"))
    // in-row aa totals: for slot i, the sum of slots sharing its amino
    // acid — 64 small integer adds over the vector, no join
    val aaIdx: Map[String, Seq[Int]] =
      CodonInfo.zipWithIndex.groupBy(_._1._2).view
        .mapValues(_.map(_._2)).toMap
    val aat = array(CodonInfo.zipWithIndex.map { case ((_, aa, _), _) =>
      aaIdx(aa).map(j => element_at(col("__ns"), j + 1))
        .reduce[Column](_ + _)
    }: _*)
    val rscu = array(CodonInfo.zipWithIndex.map { case ((_, _, deg), i) =>
      val ni = element_at(col("__ns"), i + 1)
      val ti = element_at(col("__aat"), i + 1)
      round(when(ti > 0, ni.cast("double") * lit(deg) / ti)
        .otherwise(lit(1.0)), 3)
    }: _*)
    counts
      .withColumn("__aat", aat)
      .withColumn("__rscu", rscu)
      .select(col("__g"),
        posexplode(arrays_zip(
          typedLit(CodonInfo.map(_._1)).as("codon"),
          col("__ns").as("n"), col("__rscu").as("rscu"))).as(Seq("__i", "__z")))
      .select(col("__g").as(groupCol),
        col("__z.codon").as("codon"),
        col("__z.n").as("n"),
        col("__z.rscu").as("rscu"))
  }
}
