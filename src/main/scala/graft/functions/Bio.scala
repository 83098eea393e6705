package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Immutable seed dictionary for [[KmerCandidates]]: rolling polynomial
  * hash → ordinals of equal-length seed words, built once on the driver
  * from the (bounded) library dimension and shipped as a broadcast — the
  * Spark analogue of the reference's materialized BLAST word index
  * (lib/BIGSdb/Offline/Blast.pm:729-931). Data, not a plan literal.
  */
final class SeedIndex private[functions] (
    val k: Int,
    val seeds: Array[String],
    val map: java.util.HashMap[java.lang.Long, Array[Int]],
    val bk: Long) extends Serializable

object SeedIndex {
  private[functions] val B = 1000003L

  def hashOf(s: String, from: Int, k: Int): Long = {
    var h = 0L; var i = 0
    while (i < k) { h = h * B + s.charAt(from + i); i += 1 }
    h
  }

  /** Build from equal-length seed words (ordinal = array position). */
  def build(k: Int, seeds: Array[String]): SeedIndex = {
    require(seeds.forall(_.length == k), s"all seeds must have length $k")
    val map = new java.util.HashMap[java.lang.Long, Array[Int]]()
    seeds.zipWithIndex.foreach { case (s, i) =>
      val h = java.lang.Long.valueOf(hashOf(s, 0, k))
      map.put(h, map.getOrDefault(h, Array.empty) :+ i)
    }
    var bk = 1L; (1 to k).foreach(_ => bk *= B)
    new SeedIndex(k, seeds, map, bk)
  }
}

/** Bio-domain scalar functions (SURVEY §2.8 "Bio domain").
  *
  * Semantics from the reference:
  *   - reverse_complement: lib/BIGSdb/Utils.pm:39-48 (tr/GATCgatc/CTAGctag/ + reverse)
  *   - is_complete_cds:    lib/BIGSdb/Utils.pm:74-103 (ATG/GTG/TTG start, in-frame
  *                         stop only at end, length % 3 == 0)
  *   - translate:          standard codon table 11-ish path
  *                         (lib/BIGSdb/SequenceTranslatePage.pm)
  *   - DNA validation:     lib/BIGSdb/Utils.pm:50-72
  *
  * Hot-path functions are native Catalyst `Expression`s with `doGenCode`
  * (whole-stage-codegen-friendly — these run per contig over 100 TB of
  * sequence bins, a Scala UDF's row-at-a-time boxing would dominate).
  */
object Bio {

  // ---- reverse complement: codegen'd unary expression ----
  case class ReverseComplement(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      UTF8String.fromString(Bio.reverseComplementString(s))
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"UTF8String.fromString(graft.functions.Bio.reverseComplementString($c.toString()))")
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** Complement map per Utils.pm:43 (tr/GATCgatc/CTAGctag/); non-ACGT
    * characters pass through unchanged, as in the reference's tr///.
    */
  def reverseComplementString(s: String): String = {
    val n = s.length
    val out = new Array[Char](n)
    var i = 0
    while (i < n) {
      out(n - 1 - i) = (s.charAt(i): @annotation.switch) match {
        case 'G' => 'C'; case 'A' => 'T'; case 'T' => 'A'; case 'C' => 'G'
        case 'g' => 'c'; case 'a' => 't'; case 't' => 'a'; case 'c' => 'g'
        case other => other
      }
      i += 1
    }
    new String(out)
  }

  def reverseComplement(c: Column): Column =
    ExpressionUtils.column(ReverseComplement(ExpressionUtils.expression(c)))

  // ---- complete CDS check (Utils.pm:74-103) ----
  case class IsCompleteCds(child: Expression) extends UnaryExpression {
    override def dataType: DataType = BooleanType
    override def nullSafeEval(input: Any): Any =
      Bio.isCompleteCdsString(input.asInstanceOf[UTF8String].toString)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.Bio.isCompleteCdsString($c.toString())")
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  private val StartCodons = Set("ATG", "GTG", "TTG")
  private val StopCodons = Set("TAA", "TGA", "TAG")

  def isCompleteCdsString(seq0: String): Boolean = {
    val seq = seq0.toUpperCase
    if (seq.length < 6 || seq.length % 3 != 0) return false
    if (!StartCodons.contains(seq.substring(0, 3))) return false
    if (!StopCodons.contains(seq.substring(seq.length - 3))) return false
    // no in-frame stop before the terminal codon
    var i = 3
    while (i < seq.length - 3) {
      if (StopCodons.contains(seq.substring(i, i + 3))) return false
      i += 3
    }
    true
  }

  def isCompleteCds(c: Column): Column =
    ExpressionUtils.column(IsCompleteCds(ExpressionUtils.expression(c)))

  // ---- translation (standard genetic code; table 11 start handling is the
  //      caller's concern — BIGSdb translates with BioPerl defaults) ----
  private[graft] val CodonTable: Map[String, Char] = {
    val bases = "TCAG"
    val aas = "FFLLSSSSYY**CC*WLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG"
    (for {
      (b1, i) <- bases.zipWithIndex
      (b2, j) <- bases.zipWithIndex
      (b3, k) <- bases.zipWithIndex
    } yield s"$b1$b2$b3" -> aas(i * 16 + j * 4 + k)).toMap
  }

  def translateString(seq0: String): String = {
    val seq = seq0.toUpperCase
    val sb = new StringBuilder(seq.length / 3)
    var i = 0
    while (i + 3 <= seq.length) {
      sb += CodonTable.getOrElse(seq.substring(i, i + 3), 'X')
      i += 3
    }
    sb.toString
  }

  case class Translate(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullSafeEval(input: Any): Any =
      UTF8String.fromString(Bio.translateString(input.asInstanceOf[UTF8String].toString))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"UTF8String.fromString(graft.functions.Bio.translateString($c.toString()))")
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  def translateDna(c: Column): Column =
    ExpressionUtils.column(Translate(ExpressionUtils.expression(c)))

  /** DNA validation (Utils.pm:50-60): non-empty, only ACGTU + ambiguity N. */
  def isValidDna(c: Column): Column =
    upper(c).rlike("^[ACGTUN]+$")

  /** GC content as a fraction — composition stat used by seqbin views. */
  def gcContent(c: Column): Column = {
    val u = upper(c)
    val gc = length(u) - length(regexp_replace(u, "[GC]", ""))
    (gc.cast("double") / length(u).cast("double"))
  }

  // ---- occurrence scan kernel (Q4 tag scanning hot path) ----

  /** 1-based char positions of occurrences of `needle` in `hay`.
    * `overlapping = true` advances one char per hit (BLAST-hit semantics);
    * `false` advances past the match (the reference's tag rows). Empty
    * needle → no occurrences. Driven by UTF8String.indexOf — no
    * per-position substring allocation, unlike a transform/substr HOF scan.
    */
  def occurrencesKernel(hay: UTF8String, needle: UTF8String,
      overlapping: Boolean): org.apache.spark.sql.catalyst.util.ArrayData = {
    val nLen = needle.numChars()
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    if (nLen > 0 && hay.numBytes() > 0) {
      var idx = hay.indexOf(needle, 0)
      while (idx >= 0) {
        out += idx + 1L
        idx = hay.indexOf(needle, if (overlapping) idx + 1 else idx + nLen)
      }
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out.toArray)
  }

  case class Occurrences(left: Expression, right: Expression, overlapping: Boolean)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def dataType: DataType =
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, false)
    override protected def nullSafeEval(hay: Any, needle: Any): Any =
      Bio.occurrencesKernel(hay.asInstanceOf[UTF8String],
        needle.asInstanceOf[UTF8String], overlapping)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (h, n) =>
        s"graft.functions.Bio.occurrencesKernel($h, $n, $overlapping)")
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(left = l, right = r)
  }

  def occurrences(hay: Column, needle: Column, overlapping: Boolean): Column =
    ExpressionUtils.column(Occurrences(
      ExpressionUtils.expression(hay), ExpressionUtils.expression(needle), overlapping))

  // ---- k-mer seed candidate kernel (Q3→Q4 seeded scan hot path) ----

  /** Single-pass multi-pattern scan: ordinals of all seed words occurring
    * in `hay` (distinct, ascending). One rolling-hash sweep — O(|hay|)
    * regardless of dictionary size, with a char-compare verify on hash
    * hits. This is what makes the seeded tag scan sublinear in library
    * size: the per-contig cost no longer multiplies by |library|.
    */
  def kmerCandidatesKernel(hay: UTF8String, idx: SeedIndex):
      org.apache.spark.sql.catalyst.util.ArrayData = {
    val s = hay.toString
    val k = idx.k
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    if (s.length >= k) {
      val seen = new java.util.BitSet(idx.seeds.length)
      var h = SeedIndex.hashOf(s, 0, k)
      var start = 0
      var continue = true
      while (continue) {
        val ords = idx.map.get(h)
        if (ords != null) {
          var j = 0
          while (j < ords.length) {
            val ord = ords(j)
            if (!seen.get(ord)) {
              // verify on hash hit (collisions possible): char compare
              val seed = idx.seeds(ord)
              var i = 0
              var eq = true
              while (eq && i < k) { eq = seed.charAt(i) == s.charAt(start + i); i += 1 }
              if (eq) { seen.set(ord); out += ord }
            }
            j += 1
          }
        }
        if (start + k >= s.length) continue = false
        else {
          h = h * SeedIndex.B + s.charAt(start + k) - idx.bk * s.charAt(start)
          start += 1
        }
      }
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out.sorted.toArray)
  }

  case class KmerCandidates(
      child: Expression,
      bc: org.apache.spark.broadcast.Broadcast[SeedIndex])
      extends UnaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      Bio.kmerCandidatesKernel(input.asInstanceOf[UTF8String], bc.value)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val bcRef = ctx.addReferenceObj("seedIndexBc", bc,
        "org.apache.spark.broadcast.Broadcast")
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.Bio.kmerCandidatesKernel($c, " +
          s"(graft.functions.SeedIndex)$bcRef.value())")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** Column wrapper: ordinals (into the index's seed array) of seed words
    * present in the string column.
    */
  def kmerCandidates(hay: Column,
      bc: org.apache.spark.broadcast.Broadcast[SeedIndex]): Column =
    ExpressionUtils.column(KmerCandidates(ExpressionUtils.expression(hay), bc))

  /** Register the bio functions for SQL use. */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("reverse_complement",
      exprs => ReverseComplement(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("is_complete_cds",
      exprs => IsCompleteCds(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("translate_dna",
      exprs => Translate(exprs.head), "scala_udf")
  }
}
