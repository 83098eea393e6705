package graft.operators

import graft.functions.Bio
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-silico PCR (reference `lib/BIGSdb/Plugins/PCR.pm`, an ipcress
  * wrapper): find predicted amplification products — a forward-primer
  * site and a downstream reverse-primer site on the same contig with a
  * product length inside [minLen, maxLen] — in both orientations.
  *
  * Degenerate (IUPAC wobble) bases are supported by expanding the primer
  * into its concrete variants up front (the reference validates wobble
  * share via MAX_WOBBLE_PERCENT, `PCR.pm:42-56`; ipcress folds wobbles
  * into its mismatch budget) — expansion happens once, driver-side, and
  * is capped so a pathological all-N primer cannot explode the plan.
  *
  * Scale posture (100 TB of contigs): the whole detection is ONE narrow
  * projection — per contig, occurrence positions of each primer variant
  * come from the codegen'd `Bio.occurrences` kernel, and the forward×
  * reverse pairing with the length window runs as nested array HOFs
  * inside the same row. No shuffle anywhere, no join, no explode until
  * the final per-product unnest. Primer scanning 100 TB is exactly as
  * parallel as reading it.
  */
object Pcr {

  private val Iupac = Map(
    'A' -> "A", 'C' -> "C", 'G' -> "G", 'T' -> "T", 'U' -> "T",
    'R' -> "AG", 'Y' -> "CT", 'S' -> "CG", 'W' -> "AT", 'K' -> "GT",
    'M' -> "AC", 'B' -> "CGT", 'D' -> "AGT", 'H' -> "ACT", 'V' -> "ACG",
    'N' -> "ACGT")

  /** Expand a degenerate primer into concrete ACGT variants. The cap is
    * enforced INSIDE the fold — a wobble-heavy primer (15 Ns = 4^15
    * strings) must fail before allocating the cross-product, not after.
    */
  def expand(primer: String, maxVariants: Int = 64): Seq[String] = {
    val variants = primer.trim.toUpperCase.foldLeft(Seq("")) { (acc, ch) =>
      val opts = Iupac.getOrElse(ch, throw new IllegalArgumentException(
        s"primer contains non-IUPAC base '$ch'"))
      require(acc.size.toLong * opts.length <= maxVariants,
        s"primer expands past $maxVariants variants — too many wobble " +
          "bases (reference MAX_WOBBLE_PERCENT posture)")
      for (p <- acc; o <- opts) yield p + o
    }
    variants
  }

  /** Reverse complement of a concrete ACGT string (driver-side). */
  def revComp(s: String): String =
    s.reverseIterator.map {
      case 'A' => 'T'; case 'C' => 'G'; case 'G' => 'C'; case 'T' => 'A'
      case c => throw new IllegalArgumentException(s"non-ACGT base '$c'")
    }.mkString

  /** Sorted, deduplicated 1-based occurrence positions of ANY variant. */
  private def positionsOf(seq: Column, variants: Seq[String]): Column =
    array_sort(array_distinct(concat(variants.map(v =>
      Bio.occurrences(seq, lit(v), overlapping = true)): _*)))

  /** Predicted products: (id, start, end, product_len, direction) with
    * 1-based inclusive coordinates, direction "forward" (primer1 on the
    * plus strand) or "reverse" (primer2 on the plus strand). Primer sites
    * must not overlap (product length >= len1 + len2), and the product
    * length must fall inside [minLen, maxLen] — the reference's reported
    * products table (`PCR.pm:404-421`: seqbin_id, length, start, end,
    * direction).
    */
  def products(
      contigs: DataFrame, idCol: String, seqCol: String,
      primer1: String, primer2: String,
      minLen: Int, maxLen: Int): DataFrame = {
    val v1 = expand(primer1)
    val v2 = expand(primer2)
    val len1 = primer1.trim.length
    val len2 = primer2.trim.length
    val seq = col(seqCol)

    // one direction: fwd-primer starts × rc-of-other-primer site starts,
    // paired INSIDE the row by nested HOFs — p is a product start, e0 the
    // 3'-primer site start, end = e0 + tailLen - 1. The position arrays
    // are hoisted to named columns so each kernel scan runs once per row,
    // not once per outer-lambda element.
    def pair(starts: Column, ends: Column, headLen: Int,
        tailLen: Int, direction: String): Column = {
      val lenOk = (p: Column, e0: Column) => {
        val productLen = e0 + (tailLen - 1) - p + 1
        productLen >= math.max(minLen, headLen + tailLen) &&
          productLen <= maxLen
      }
      flatten(transform(starts, p =>
        transform(filter(ends, e0 => lenOk(p, e0)), e0 =>
          struct(p.cast("long").as("start"),
            (e0 + (tailLen - 1)).cast("long").as("end"),
            (e0 + (tailLen - 1) - p + 1).cast("long").as("product_len"),
            lit(direction).as("direction")))))
    }

    contigs
      .select(col(idCol),
        positionsOf(seq, v1).as("__p1f"),
        positionsOf(seq, v2.map(revComp)).as("__p2r"),
        positionsOf(seq, v2).as("__p2f"),
        positionsOf(seq, v1.map(revComp)).as("__p1r"))
      .select(col(idCol), explode(concat(
        pair(col("__p1f"), col("__p2r"), len1, len2, "forward"),
        pair(col("__p2f"), col("__p1r"), len2, len1, "reverse"))).as("__p"))
      .select(col(idCol), col("__p.start").as("start"),
        col("__p.end").as("end"), col("__p.product_len").as("product_len"),
        col("__p.direction").as("direction"))
  }

  /** Per-record summary, dense over the input (the reference's summary
    * table: id, PCR +ve, products — `PCR.pm:458-476`): every contig
    * appears, zero-product records with positive=false.
    */
  def summary(
      contigs: DataFrame, idCol: String, seqCol: String,
      primer1: String, primer2: String,
      minLen: Int, maxLen: Int): DataFrame = {
    val prods = products(contigs, idCol, seqCol, primer1, primer2,
      minLen, maxLen)
    contigs.select(col(idCol))
      .join(prods.groupBy(col(idCol)).agg(count(lit(1)).as("n_products")),
        Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_products"), lit(0L)).as("n_products"),
        (coalesce(col("n_products"), lit(0L)) > 0).as("positive"))
  }
}
