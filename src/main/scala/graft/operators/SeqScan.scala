package graft.operators

import graft.functions.Bio
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Genome scanning operators (SURVEY §2.9 Q4/Q6).
  *
  * Q4 (autotagger, lib/BIGSdb/Offline/Scan.pm:63-287): scan isolate contigs
  * against an allele library — exact matching first (the common case, no
  * alignment), forward and reverse-complement strands, emitting tag rows
  * (contig, locus, start, end, reverse). The library is a broadcast
  * dimension: contigs (the 100 TB side) stream through one codegen'd
  * projection; the contig data is never shuffled.
  *
  * Q6 (mutation scanning, scripts/automation/scan_mutations.pl + tables
  * sql/seqdef.sql:1673-1767): observe defined point variants at fixed
  * positions of each sequence — a substring compare against a broadcast
  * mutation-definition dimension.
  */
object SeqScan {

  /** 1-based start positions of all non-overlapping occurrences of `needle`
    * in `hay`, as ARRAY<BIGINT>. A fused codegen'd expression
    * (Bio.Occurrences): one indexOf-driven scan per row, no per-position
    * substring allocation and no interpreted higher-order functions — this
    * kernel runs per contig over the 100 TB side of the tag scan.
    */
  def occurrencePositions(hay: Column, needle: Column): Column =
    Bio.occurrences(hay, needle, overlapping = false)

  /** All (including overlapping) occurrence positions — the exact BLAST-hit
    * semantics. Same fused kernel, advancing one char per hit.
    */
  def allOccurrencePositions(hay: Column, needle: Column): Column =
    Bio.occurrences(hay, needle, overlapping = true)

  /** Exact-match tag scan: for each (contig × library allele), all match
    * positions on both strands. Output: contigId, locus, alleleId,
    * start_pos (1-based), end_pos, reverse — the allele_sequences tag shape
    * (sql/isolatedb.sql:861-922).
    */
  def exactTagScan(
      contigs: DataFrame, contigId: String, contigSeq: String,
      library: DataFrame, locus: String, alleleId: String, alleleSeq: String,
      overlapping: Boolean = false): DataFrame = {
    val pos: (Column, Column) => Column =
      if (overlapping) allOccurrencePositions else occurrencePositions
    val lib = library.select(
      col(locus), col(alleleId),
      upper(col(alleleSeq)).as("__fwd"),
      Bio.reverseComplement(upper(col(alleleSeq))).as("__rev"))
    val joined = contigs
      .select(col(contigId), upper(col(contigSeq)).as("__contig"))
      .join(broadcast(lib))
    val fwd = joined
      .withColumn("start_pos",
        explode(pos(col("__contig"), col("__fwd"))))
      .withColumn("reverse", lit(false))
      .withColumn("end_pos", col("start_pos") + length(col("__fwd")) - 1)
    val rev = joined
      .filter(col("__rev") =!= col("__fwd")) // palindromic: don't double-tag
      .withColumn("start_pos",
        explode(pos(col("__contig"), col("__rev"))))
      .withColumn("reverse", lit(true))
      .withColumn("end_pos", col("start_pos") + length(col("__rev")) - 1)
    fwd.unionByName(rev)
      .select(col(contigId), col(locus), col(alleleId),
        col("start_pos").cast("long"), col("end_pos").cast("long"), col("reverse"))
  }

  /** Q6 — mutation observation: for each sequence × mutation definition
    * (position, wild-type char, variant char), the observed state at that
    * position: wild_type | variant | other.
    */
  def mutationScan(
      seqs: DataFrame, seqId: String, seq: String,
      mutations: DataFrame, mutId: String, position: String,
      wildType: String, variant: String): DataFrame = {
    seqs.select(col(seqId), upper(col(seq)).as("__s"))
      .join(broadcast(mutations))
      .filter(length(col("__s")) >= col(position))
      .withColumn("observed", substr(col("__s"), col(position), lit(1)))
      .withColumn("status",
        when(col("observed") === upper(col(wildType)), "wild_type")
          .when(col("observed") === upper(col(variant)), "variant")
          .otherwise("other"))
      .select(col(seqId), col(mutId), col(position), col("observed"), col("status"))
  }
}
