package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Global pairwise alignment (SURVEY §2.10 G7 — the aligner step the
  * reference delegates to MUSCLE/MAFFT, lib/BIGSdb/Plugins/GenomeComparator
  * .pm:1328-1380, capped at MAX_MUSCLE_MB=4GB, Constants.pm:37).
  *
  * Needleman-Wunsch with unit costs (match 0 / mismatch 1 / gap 1), so the
  * alignment distance IS levenshtein and stays oracle-checkable; the
  * traceback tie-break is fixed (diagonal > up > left) so re-runs and the
  * DuckDB replay produce byte-identical alignments. Both expressions are
  * codegen'd (one static call from generated code — no row boxing), so a
  * per-pair alignment map stays inside the whole-stage-codegen span; the
  * O(n·m) kernel runs where the data lives, never on the driver.
  */
object Align {

  /** NW alignment: returns (aligned a, aligned b, distance). Gaps are '-'.
    * Traceback prefers diagonal, then up (gap in b), then left (gap in a).
    */
  /** Hard bound on the DP matrix size: (n+1)·(m+1) Int cells must stay under
    * ~256 MB, the same posture as the reference's MAX_MUSCLE_MB aligner cap
    * (lib/BIGSdb/Constants.pm:37) — without it two contig-scale inputs would
    * attempt a multi-TB allocation inside an executor task.
    */
  val MaxDpCells: Long = 64L * 1024 * 1024

  def nw(a: String, b: String): (String, String, Int) = {
    val n = a.length; val m = b.length
    val cells = (n + 1).toLong * (m + 1).toLong
    if (cells > MaxDpCells)
      throw new IllegalArgumentException(
        s"Align.nw inputs too long for full-matrix alignment: $n x $m " +
          s"(${cells} DP cells > $MaxDpCells cap, analogous to the " +
          "reference's MAX_MUSCLE_MB bound)")
    val dp = Array.ofDim[Int](n + 1, m + 1)
    var i = 0
    while (i <= n) { dp(i)(0) = i; i += 1 }
    var j = 0
    while (j <= m) { dp(0)(j) = j; j += 1 }
    i = 1
    while (i <= n) {
      j = 1
      while (j <= m) {
        val sub = dp(i - 1)(j - 1) + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1)
        dp(i)(j) = math.min(sub, math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1))
        j += 1
      }
      i += 1
    }
    val sa = new StringBuilder(n + m); val sb = new StringBuilder(n + m)
    i = n; j = m
    while (i > 0 || j > 0) {
      if (i > 0 && j > 0 &&
          dp(i)(j) == dp(i - 1)(j - 1) +
            (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1)) {
        sa += a.charAt(i - 1); sb += b.charAt(j - 1); i -= 1; j -= 1
      } else if (i > 0 && dp(i)(j) == dp(i - 1)(j) + 1) {
        sa += a.charAt(i - 1); sb += '-'; i -= 1
      } else {
        sa += '-'; sb += b.charAt(j - 1); j -= 1
      }
    }
    (sa.reverse.toString, sb.reverse.toString, dp(n)(m))
  }

  /** Codegen entry point: NW as an InternalRow(a_ali, b_ali, dist). */
  def nwRow(a: UTF8String, b: UTF8String): InternalRow = {
    val (sa, sb, d) = nw(a.toString, b.toString)
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(sa), UTF8String.fromString(sb), d))
  }

  val nwSchema: StructType = StructType(Seq(
    StructField("a_ali", StringType, nullable = false),
    StructField("b_ali", StringType, nullable = false),
    StructField("dist", IntegerType, nullable = false)))

  case class NwAlign(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = nwSchema
    override def nullSafeEval(a: Any, b: Any): Any =
      nwRow(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Align.nwRow($a, $b)")
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(l, r)
  }

  def nwAlign(a: Column, b: Column): Column =
    ExpressionUtils.column(NwAlign(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Center-star gap projection: re-pad one pairwise alignment (center
    * `aAli` vs member `bAli`) to the group's global insertion profile
    * (`prof(k)` = max insertions any member places before center position
    * k; length = center length + 1). Member insertion runs are left-
    * aligned and padded with '-' — the standard center-star merge.
    */
  def expand(aAli: String, bAli: String, prof: Array[Int]): String = {
    val out = new StringBuilder(bAli.length + prof.sum)
    val n = prof.length - 1
    var idx = 0; var k = 0
    while (k <= n) {
      var run = 0
      while (idx < aAli.length && aAli.charAt(idx) == '-') {
        out += bAli.charAt(idx); run += 1; idx += 1
      }
      while (run < prof(k)) { out += '-'; run += 1 }
      if (k < n && idx < aAli.length) { out += bAli.charAt(idx); idx += 1 }
      k += 1
    }
    out.toString
  }

  def expandUtf(aAli: UTF8String, bAli: UTF8String, prof: ArrayData): UTF8String =
    UTF8String.fromString(expand(aAli.toString, bAli.toString, prof.toIntArray()))

  case class ProjectGaps(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression {
    override def dataType: DataType = StringType
    override def nullSafeEval(a: Any, b: Any, p: Any): Any =
      expandUtf(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String],
        p.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b, p) =>
        s"graft.functions.Align.expandUtf($a, $b, $p)")
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
  }

  def projectGaps(aAli: Column, bAli: Column, prof: Column): Column =
    ExpressionUtils.column(ProjectGaps(
      ExpressionUtils.expression(aAli), ExpressionUtils.expression(bAli),
      ExpressionUtils.expression(prof)))

  /** BLASTN-style similarity scoring (match +2 / mismatch -3 / linear gap
    * -5) — the scoring the reference's ranking actually runs on: BLAST
    * hands back a bitscore and get_best_partial_match keeps the max
    * (lib/BIGSdb/Offline/Blast.pm:201-231). The raw score is an integer
    * (exact in both engines); the bitscore (lambda*S - ln K)/ln 2 is
    * emitted display-side from inlined double literals (no libm ln call,
    * so cross-engine deterministic) and is a strictly increasing function
    * of S — ranking by bitscore IS ranking by the integer raw score.
    */
  val BlastnMatch = 2
  val BlastnMismatch = -3
  val BlastnGap = -5

  /** Representative Karlin-Altschul display constants for the +2/-3
    * scoring; inlined as decimal literals on both engines (= ln 0.41 and
    * ln 2 to double precision).
    */
  val BlastnLambda = 0.625
  val BlastnLnK = -0.8915981192837836
  val Ln2 = 0.6931471805599453

  /** Global max-score DP with linear gaps, two-row O(min memory) form.
    * Same MaxDpCells posture as nw (time is O(n*m) either way).
    */
  def blastnScore(a: String, b: String): Int = {
    val n = a.length; val m = b.length
    if ((n + 1).toLong * (m + 1).toLong > MaxDpCells)
      throw new IllegalArgumentException(
        s"Align.blastnScore inputs too long: $n x $m (> $MaxDpCells DP cells)")
    var prev = Array.tabulate(m + 1)(j => j * BlastnGap)
    var cur = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      cur(0) = i * BlastnGap
      var j = 1
      while (j <= m) {
        val s = prev(j - 1) +
          (if (a.charAt(i - 1) == b.charAt(j - 1)) BlastnMatch else BlastnMismatch)
        cur(j) = math.max(s,
          math.max(prev(j) + BlastnGap, cur(j - 1) + BlastnGap))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m)
  }

  def blastnScoreUtf(a: UTF8String, b: UTF8String): Int =
    blastnScore(a.toString, b.toString)

  case class NwScore(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = IntegerType
    override def nullSafeEval(a: Any, b: Any): Any =
      blastnScoreUtf(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Align.blastnScoreUtf($a, $b)")
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(l, r)
  }

  def nwScore(a: Column, b: Column): Column =
    ExpressionUtils.column(NwScore(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Gotoh affine-gap global max score (Gotoh 1982) under the classic
    * BLASTN scoring task: match +2 / mismatch -3 / gap open -5 /
    * gap extend -2 (a gap of length g costs open + ext*(g-1)). Three
    * two-row DP lanes (M diagonal, X vertical, Y horizontal); integer
    * throughout, so the oracle replays the row recursion exactly — the
    * horizontal lane unrolls as a max-over-k left-run closure, the same
    * trick the unit-cost replay uses.
    */
  val GapOpen = -5
  val GapExt = -2
  private val NegInf = -1000000000 // safe sentinel: no path, never selected

  def gotohScore(a: String, b: String): Int = {
    val n = a.length; val m = b.length
    if (n == 0) return if (m == 0) 0 else GapOpen + GapExt * (m - 1)
    if (m == 0) return GapOpen + GapExt * (n - 1)
    if ((n + 1).toLong * (m + 1).toLong > MaxDpCells)
      throw new IllegalArgumentException(
        s"Align.gotohScore inputs too long: $n x $m (> $MaxDpCells DP cells)")
    // prev-row lanes
    var mP = new Array[Int](m + 1)
    var xP = new Array[Int](m + 1)
    var yP = new Array[Int](m + 1)
    mP(0) = 0; xP(0) = NegInf; yP(0) = NegInf
    var j = 1
    while (j <= m) {
      mP(j) = NegInf; xP(j) = NegInf
      yP(j) = GapOpen + GapExt * (j - 1)
      j += 1
    }
    var mC = new Array[Int](m + 1)
    var xC = new Array[Int](m + 1)
    var yC = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      mC(0) = NegInf; yC(0) = NegInf
      xC(0) = GapOpen + GapExt * (i - 1)
      j = 1
      while (j <= m) {
        val s = if (a.charAt(i - 1) == b.charAt(j - 1)) BlastnMatch else BlastnMismatch
        val diag = math.max(mP(j - 1), math.max(xP(j - 1), yP(j - 1)))
        mC(j) = if (diag <= NegInf) NegInf else diag + s
        val fromM = if (mP(j) <= NegInf) NegInf else mP(j) + GapOpen
        val fromY = if (yP(j) <= NegInf) NegInf else yP(j) + GapOpen
        val fromX = if (xP(j) <= NegInf) NegInf else xP(j) + GapExt
        xC(j) = math.max(fromM, math.max(fromY, fromX))
        val openY = if (mC(j - 1) <= NegInf) NegInf else mC(j - 1) + GapOpen
        val extY0 = math.max(if (xC(j - 1) <= NegInf) NegInf else xC(j - 1) + GapOpen,
          if (yC(j - 1) <= NegInf) NegInf else yC(j - 1) + GapExt)
        yC(j) = math.max(openY, extY0)
        j += 1
      }
      val tm = mP; mP = mC; mC = tm
      val tx = xP; xP = xC; xC = tx
      val ty = yP; yP = yC; yC = ty
      i += 1
    }
    math.max(mP(m), math.max(xP(m), yP(m)))
  }

  def gotohScoreUtf(a: UTF8String, b: UTF8String): Int =
    gotohScore(a.toString, b.toString)

  case class GotohScore(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = IntegerType
    override def nullSafeEval(a: Any, b: Any): Any =
      gotohScoreUtf(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Align.gotohScoreUtf($a, $b)")
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(l, r)
  }

  def gotohScoreCol(a: Column, b: Column): Column =
    ExpressionUtils.column(GotohScore(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
