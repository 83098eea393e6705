package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Conditional curation validation rules — the reference's
  * `validation_rules` / `validation_conditions` /
  * `validation_rule_conditions` tables (sql/isolatedb.sql:1814-1860)
  * evaluated by SubmissionHandler.pm:1035-1364 (`run_validation_checks` /
  * `_setup_validation_rule`): a rule is a CONJUNCTION of typed conditions
  * and FIRES its curator message when every condition holds — "if field A
  * = x and field B < y then reject with message". Each batch-added record
  * runs every rule (CurateBatchAddPage.pm:558, CurateBatchIsolateUpdate
  * Page.pm:759).
  *
  * Reference semantics preserved exactly:
  *   - operators `=`, `NOT`, `contains`, `NOT contain`, `starts with`,
  *     `ends with`, `>`, `>=`, `<`, `<=`;
  *   - text comparisons are case-insensitive; `contains`/`starts with`/
  *     `ends with` treat the condition value as a case-insensitive REGEX
  *     (SubmissionHandler.pm:1162-1211 `=~ /$cvalue/xi`);
  *   - numeric fields compare numerically (`_eq_condition_sub` branches
  *     on the config field type);
  *   - the literal value `null` is a presence check valid only with `=`
  *     (fires when the field is missing/empty) and `NOT` (fires when
  *     present) — `_null_condition_sub`;
  *   - a value of the form `[other_field]` compares against ANOTHER
  *     field of the same record (`_get_comp_value`,
  *     SubmissionHandler.pm:1357-1364);
  *   - a non-null condition on a missing/empty field is FALSE (the rule
  *     cannot fire on absent data — every `return if !defined $value`).
  *
  * Spark-first shape: the rule tables are curator metadata — a handful of
  * rows — so instead of joining them, [[compile]] folds each rule into a
  * single boolean Column over the staged batch. The whole rule set
  * evaluates inside one whole-stage-codegen projection: zero shuffles,
  * zero joins, one pass over the batch regardless of rule count, and at
  * 100 TB the predicate rides the scan like any other filter.
  * [[violations]] emits one (id, rule_id, message) row per fired rule via
  * a filtered-array explode (same pattern as the per-field format checks
  * it composes with in `curate_validate`).
  */
object ValidationRules {

  /** One condition row (validation_conditions): field OPERATOR value. */
  final case class Condition(field: String, operator: String, value: String)

  /** One rule (validation_rules ⋈ validation_rule_conditions): fires
    * `message` when ALL conditions hold.
    */
  final case class Rule(id: Int, message: String, conditions: Seq[Condition])

  private val FieldRef = """^\[(.+)\]$""".r

  /** Compile one condition to a boolean Column (never null: a condition
    * over missing data is false, per the reference).
    *
    * @param types field → "text" | "int" | "float" | "date" (from the
    *              parsed XML config / EAV registry, the same routing as
    *              `_setup_validation_rule`)
    */
  def conditionExpr(c: Condition, types: Map[String, String]): Column = {
    val f = col(c.field)
    val tpe = types.getOrElse(c.field, "text")
    val isText = tpe == "text"
    val present =
      if (isText) f.isNotNull && f =!= "" else f.isNotNull
    if (c.value.equalsIgnoreCase("null")) {
      c.operator match {
        case "="   => !present
        case "NOT" => present
        case op => throw new IllegalArgumentException(
          s"operator '$op' cannot be used for null values")
      }
    } else {
      // [other_field] → cross-field comparison; else literal
      val cv: Column = c.value match {
        case FieldRef(other) => col(other)
        case v               => lit(v)
      }
      def ci(pattern: Column): Column = // case-insensitive regex match
        regexp_like(f.cast("string"), concat(lit("(?i)"), pattern))
      val pred = c.operator match {
        case "contains"    => ci(cv)
        case "NOT contain" => !ci(cv)
        case "starts with" => ci(concat(lit("^(?:"), cv, lit(")")))
        case "ends with"   => ci(concat(lit("(?:"), cv, lit(")$")))
        case op =>
          val (l, r) =
            if (isText) (lower(f.cast("string")), lower(cv.cast("string")))
            else (f.cast("double"), cv.cast("double"))
          op match {
            case "="   => l === r
            case "NOT" => l =!= r
            case ">"   => l > r
            case ">="  => l >= r
            case "<"   => l < r
            case "<="  => l <= r
            case other => throw new IllegalArgumentException(
              s"unknown validation operator '$other'")
          }
      }
      coalesce(present && pred, lit(false))
    }
  }

  /** Compile a rule: AND of its conditions (a rule with no recognized
    * conditions never fires, per `_setup_validation_rule`'s
    * `return if !@condition_subs`).
    */
  def compile(rule: Rule, types: Map[String, String]): Column =
    if (rule.conditions.isEmpty) lit(false)
    else rule.conditions.map(conditionExpr(_, types)).reduce(_ && _)

  /** Evaluate every rule over a staged batch: one row per fired rule,
    * (idCol, rule_id, message), the shape `run_validation_checks` returns
    * per record. Pure projection + filtered-array explode — no shuffle.
    */
  def violations(staged: DataFrame, idCol: String, rules: Seq[Rule],
      types: Map[String, String]): DataFrame = {
    val fired = rules.map { r =>
      when(compile(r, types),
        struct(lit(r.id).as("rule_id"), lit(r.message).as("message")))
    }
    staged.select(col(idCol),
        explode(filter(array(fired: _*), x => x.isNotNull)).as("__r"))
      .select(col(idCol), col("__r.rule_id").as("rule_id"),
        col("__r.message").as("message"))
  }
}
