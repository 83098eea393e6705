package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}

/** The reference's single user-facing predicate operator set, compiled to
  * Catalyst `Column`s.
  *
  * Semantics modeled on BIGSdb (`lib/BIGSdb/Constants.pm:242` operator list;
  * `lib/BIGSdb/IsolateQueryPage.pm:2471-2637` compilation):
  *   - text comparison is case-insensitive on BOTH sides (`UPPER(a)=UPPER(b)`)
  *   - `NOT` / `NOT contain` INCLUDE null rows (`... OR field IS NULL`)
  *   - the literal string "null" means IS NULL / IS NOT NULL
  *   - non-text values are compared as text for the LIKE-family operators
  *   - multi-valued (array) fields: predicate matches if ANY element matches
  *     (`ILIKE ANY(field)`, `lib/BIGSdb/IsolateQueryPage.pm:2508,2525`)
  *
  * Everything returns a plain `Column`, so Catalyst can push the predicate
  * into the parquet scan whenever the expression is pushable.
  */
object Predicates {

  sealed trait Op
  case object Eq          extends Op
  case object Contains    extends Op
  case object StartsWith  extends Op
  case object EndsWith    extends Op
  case object Gt          extends Op
  case object Ge          extends Op
  case object Lt          extends Op
  case object Le          extends Op
  case object NotEq       extends Op // "NOT"
  case object NotContains extends Op // "NOT contain"

  val all: Seq[Op] =
    Seq(Eq, Contains, StartsWith, EndsWith, Gt, Ge, Lt, Le, NotEq, NotContains)

  private def escapeLike(s: String): String =
    s.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")

  /** Compile one scalar predicate. `isText` mirrors the reference branching
    * on the configured field type (`_provenance_equals_type_operator`).
    */
  def compile(field: Column, op: Op, value: String, isText: Boolean = true): Column = {
    val isNullLiteral = value != null && value.equalsIgnoreCase("null")
    val f = if (isText) upper(field) else field.cast(StringType)
    val v = if (isText) value.toUpperCase else value
    val like = escapeLike(v)
    op match {
      case Eq if isNullLiteral    => field.isNull
      case NotEq if isNullLiteral => field.isNotNull
      case Eq                     => f === lit(v)
      // NOT variants include NULL rows (IsolateQueryPage.pm:2500,2432)
      case NotEq                  => f =!= lit(v) || field.isNull
      case Contains               => f.like(s"%$like%")
      case NotContains            => !f.like(s"%$like%") || field.isNull
      case StartsWith             => f.like(s"$like%")
      case EndsWith               => f.like(s"%$like")
      // range operators compare in the field's native type
      case Gt                     => field > lit(value).cast(fieldType(field))
      case Ge                     => field >= lit(value).cast(fieldType(field))
      case Lt                     => field < lit(value).cast(fieldType(field))
      case Le                     => field <= lit(value).cast(fieldType(field))
    }
  }

  // For range ops we let Spark's analyzer insert the cast: comparing
  // col > lit(string) already coerces per ANSI rules. Casting the literal
  // to the column type keeps the filter pushable; we approximate by not
  // forcing a type here (lit(value) with implicit coercion).
  private def fieldType(field: Column): DataType = StringType

  /** Multi-valued (array) field: true if ANY element satisfies the scalar
    * predicate — `E'x' ILIKE ANY(field)`. NOT variants are true when NO
    * element matches OR the array is null (null-inclusion rule).
    */
  def compileArray(field: Column, op: Op, value: String): Column = {
    val positive: Column => Column = op match {
      case Eq | NotEq            => c => upper(c) === lit(value.toUpperCase)
      case Contains | NotContains => c => upper(c).like(s"%${escapeLike(value.toUpperCase)}%")
      case StartsWith            => c => upper(c).like(s"${escapeLike(value.toUpperCase)}%")
      case EndsWith              => c => upper(c).like(s"%${escapeLike(value.toUpperCase)}")
      case _                     => c => compile(c, op, value, isText = false)
    }
    op match {
      case NotEq | NotContains =>
        val pos = op match { case NotEq => Eq; case _ => Contains }
        !exists(field, c => compileArray0(c, pos, value)) || field.isNull
      case _ => exists(field, positive)
    }
  }

  private def compileArray0(elem: Column, op: Op, value: String): Column = op match {
    case Eq       => upper(elem) === lit(value.toUpperCase)
    case Contains => upper(elem).like(s"%${escapeLike(value.toUpperCase)}%")
    case other    => compile(elem, other, value)
  }

  /** Grouped-field query (F4): one predicate applied across a whole field
    * group — OR'd for positive operators, AND'd for NOT variants
    * (`lib/BIGSdb/IsolateQueryPage.pm:2374-2469`).
    */
  def compileGroup(fields: Seq[Column], op: Op, value: String, isText: Boolean = true): Column = {
    val parts = fields.map(f => compile(f, op, value, isText))
    op match {
      case NotEq | NotContains => parts.reduce(_ && _)
      case _                   => parts.reduce(_ || _)
    }
  }

  /** Scheme-field `contains` is case-insensitive REGEX (`~*`), not LIKE —
    * different metacharacter semantics (`IsolateQueryPage.pm:3252`).
    */
  def schemeContains(field: Column, pattern: String): Column =
    field.cast(StringType).rlike(s"(?i)$pattern")
}
