package graft

import graft.api.ValidationRules
import graft.api.ValidationRules.{Condition, Rule}
import org.apache.spark.sql.functions._

/** Differential spec for the conditional validation-rules engine
  * (SubmissionHandler.pm:1035-1364): the compiled Column predicates must
  * agree with an in-memory Scala re-evaluation of the reference's
  * condition subs over a fixture that hits every operator family, the
  * null presence check, cross-field [refs], case folding, and the
  * missing-field-is-false guard.
  */
class ValidationRulesSpec extends SparkSpec {
  import spark.implicits._

  private val types = Map("name" -> "text", "grade" -> "int",
    "country" -> "text", "alias" -> "text")

  // (id, name, grade, country, alias)
  private val fixture = Seq(
    (1L, "Alpha", Some(10), "gb", "ALPHA"),
    (2L, "beta", Some(250), "GB", "gamma"),
    (3L, null, Some(5), "us", "delta"),
    (4L, "", Some(10), "fr", ""),
    (5L, "Alphabet", None, "fr", "alpha"),
    (6L, "zed99", Some(99), null, "zed"))
  private def df = fixture.toDF("id", "name", "grade", "country", "alias")

  // in-memory reference evaluation (mirrors the Perl condition subs)
  private def refEval(c: Condition,
      row: (Long, String, Option[Int], String, String)): Boolean = {
    val (_, name, grade, country, alias) = row
    def raw(f: String): Option[String] = f match {
      case "name"    => Option(name).filter(_.nonEmpty)
      case "grade"   => grade.map(_.toString)
      case "country" => Option(country).filter(_.nonEmpty)
      case "alias"   => Option(alias).filter(_.nonEmpty)
    }
    val v = raw(c.field)
    if (c.value.equalsIgnoreCase("null"))
      c.operator match {
        case "="   => v.isEmpty
        case "NOT" => v.nonEmpty
      }
    else {
      val cvOpt = if (c.value.startsWith("[") && c.value.endsWith("]"))
        raw(c.value.drop(1).dropLast) else Some(c.value)
      (v, cvOpt) match {
        case (Some(value), Some(cv)) =>
          val p = java.util.regex.Pattern.compile(
            "(?i)" + cv, java.util.regex.Pattern.CASE_INSENSITIVE)
          def find(s: String) = p.matcher(s).find()
          val numeric = types(c.field) != "text"
          c.operator match {
            case "contains"    => find(value)
            case "NOT contain" => !find(value)
            case "starts with" =>
              java.util.regex.Pattern.compile("(?i)^(?:" + cv + ")")
                .matcher(value).find()
            case "ends with" =>
              java.util.regex.Pattern.compile("(?i)(?:" + cv + ")$")
                .matcher(value).find()
            case "=" =>
              if (numeric) value.toDouble == cv.toDouble
              else value.toLowerCase == cv.toLowerCase
            case "NOT" =>
              if (numeric) value.toDouble != cv.toDouble
              else value.toLowerCase != cv.toLowerCase
            case ">"  => if (numeric) value.toDouble > cv.toDouble
                         else value.toLowerCase > cv.toLowerCase
            case ">=" => if (numeric) value.toDouble >= cv.toDouble
                         else value.toLowerCase >= cv.toLowerCase
            case "<"  => if (numeric) value.toDouble < cv.toDouble
                         else value.toLowerCase < cv.toLowerCase
            case "<=" => if (numeric) value.toDouble <= cv.toDouble
                         else value.toLowerCase <= cv.toLowerCase
          }
        case _ => false // missing field value → condition is false
      }
    }
  }
  implicit private class StrOps(s: String) {
    def dropLast: String = s.dropRight(1)
  }

  private val conditions = Seq(
    Condition("name", "=", "ALPHA"),          // ci equality
    Condition("name", "NOT", "beta"),
    Condition("name", "contains", "pha"),
    Condition("name", "NOT contain", "bet"),
    Condition("name", "starts with", "al"),   // ci prefix
    Condition("name", "ends with", "a|t"),    // regex alternation
    Condition("grade", ">", "50"),
    Condition("grade", ">=", "10"),
    Condition("grade", "<", "10"),
    Condition("grade", "<=", "99"),
    Condition("name", "=", "null"),           // presence checks
    Condition("name", "NOT", "null"),
    Condition("country", "=", "null"),
    Condition("name", "=", "[alias]"),        // cross-field ci equality
    Condition("name", "contains", "[alias]")) // cross-field regex

  test("every condition matches the in-memory reference evaluation") {
    conditions.foreach { c =>
      val got = df.select(col("id"),
          ValidationRules.conditionExpr(c, types).as("p"))
        .as[(Long, Boolean)].collect().toMap
      fixture.foreach { row =>
        assert(got(row._1) == refEval(c, row),
          s"condition $c disagrees on row ${row._1}")
      }
    }
  }

  test("rules are conjunctions and fire their message once per record") {
    val rules = Seq(
      Rule(1, "big grade alpha-ish",
        Seq(Condition("name", "starts with", "al"),
          Condition("grade", ">=", "10"))),
      Rule(2, "name missing", Seq(Condition("name", "=", "null"))),
      Rule(3, "never fires: empty conditions", Seq()))
    val got = ValidationRules.violations(df, "id", rules, types)
      .as[(Long, Int, String)].collect().toSet
    // rule 1: row 1 (Alpha, 10); row 5 has no grade → numeric cond false
    // rule 2: rows 3 (null) and 4 (empty string)
    assert(got == Set(
      (1L, 1, "big grade alpha-ish"),
      (3L, 2, "name missing"),
      (4L, 2, "name missing")))
  }

  test("null value rejects operators other than = / NOT") {
    intercept[IllegalArgumentException] {
      ValidationRules.conditionExpr(
        Condition("name", "contains", "null"), types)
    }
  }

  test("violations plan is a pure projection — no shuffle, no join") {
    val rules = Seq(Rule(1, "m", Seq(Condition("name", "=", "ALPHA"))))
    val plan = ValidationRules.violations(df, "id", rules, types)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
  }
}
