package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization kernels — the first scrub stage of any
  * web-scale text pipeline (canonicalize before hashing/dedup/tokenize,
  * or byte-identical duplicates slip every content hash). Spark ships no
  * NFC/accent functions; these are codegen'd Expressions over
  * java.text.Normalizer, so they stay inside whole-stage codegen next to
  * the hash/shingle kernels that consume their output.
  */
object UnicodeNorm {

  /** Canonical composition (NFC). */
  def nfcKernel(s: UTF8String): UTF8String =
    UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC))

  /** Accent strip: canonical decomposition, then drop combining marks —
    * the standard diacritic fold (matches DuckDB/ICU strip_accents on
    * latin text).
    */
  def stripAccentsKernel(s: UTF8String): UTF8String = {
    val d = java.text.Normalizer.normalize(s.toString,
      java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val c = d.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  case class Nfc(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    override def nullSafeEval(input: Any): Any =
      nfcKernel(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNorm.nfcKernel($c)")
  }

  case class StripAccents(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    override def nullSafeEval(input: Any): Any =
      stripAccentsKernel(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.UnicodeNorm.stripAccentsKernel($c)")
  }

  def nfc(s: Column): Column =
    ExpressionUtils.column(Nfc(ExpressionUtils.expression(s)))
  def stripAccents(s: Column): Column =
    ExpressionUtils.column(StripAccents(ExpressionUtils.expression(s)))
}
