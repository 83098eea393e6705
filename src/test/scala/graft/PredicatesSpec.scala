package graft

import graft.operators.Predicates
import graft.operators.Predicates._
import org.apache.spark.sql.functions._

/** Semantic golden tests for the §4.2 correctness-trap list: the reference's
  * 10-operator predicate set (IsolateQueryPage.pm:2471-2637).
  */
class PredicatesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1, "Alpha"), (2, "beta"), (3, null.asInstanceOf[String]), (4, "ALPHABET"))
    .toDF("id", "v")

  private def ids(op: Op, value: String): Seq[Int] =
    df.filter(Predicates.compile(col("v"), op, value))
      .select("id").as[Int].collect().toSeq.sorted

  test("Eq is case-insensitive on both sides") {
    assert(ids(Eq, "ALPHA") == Seq(1))
    assert(ids(Eq, "alpha") == Seq(1))
    assert(ids(Eq, "bEtA") == Seq(2))
  }

  test("NOT includes NULL rows (IsolateQueryPage.pm:2500)") {
    assert(ids(NotEq, "alpha") == Seq(2, 3, 4))       // null id=3 included
    assert(ids(NotContains, "alpha") == Seq(2, 3))    // matches 1 and 4; null kept
  }

  test("literal 'null' means IS NULL / IS NOT NULL (:2501)") {
    assert(ids(Eq, "null") == Seq(3))
    assert(ids(NotEq, "NULL") == Seq(1, 2, 4))
  }

  test("contains / starts with / ends with are case-insensitive LIKE") {
    assert(ids(Contains, "LPH") == Seq(1, 4))
    assert(ids(StartsWith, "alp") == Seq(1, 4))
    assert(ids(EndsWith, "a") == Seq(1, 2))
  }

  test("LIKE metacharacters in user values are literal") {
    val d2 = Seq((1, "100%"), (2, "100x")).toDF("id", "v")
    val got = d2.filter(Predicates.compile(col("v"), Contains, "0%"))
      .select("id").as[Int].collect().toSeq
    assert(got == Seq(1))
  }

  test("range operators compare, not string-compare") {
    val nums = Seq((1, 5), (2, 40), (3, 300)).toDF("id", "n")
    val got = nums.filter(Predicates.compile(col("n"), Ge, "40", isText = false))
      .select("id").as[Int].collect().toSeq.sorted
    assert(got == Seq(2, 3)) // string compare would exclude 300 ("300" < "40")
  }

  test("grouped fields: OR for positive ops, AND for NOT (F4)") {
    val g = Seq((1, "red", "blue"), (2, "blue", "red"), (3, "blue", "green"))
      .toDF("id", "a", "b")
    val pos = g.filter(Predicates.compileGroup(Seq(col("a"), col("b")), Eq, "red"))
      .select("id").as[Int].collect().toSeq.sorted
    assert(pos == Seq(1, 2))
    val neg = g.filter(Predicates.compileGroup(Seq(col("a"), col("b")), NotEq, "red"))
      .select("id").as[Int].collect().toSeq.sorted
    assert(neg == Seq(3))
  }

  test("array predicates: ANY-element semantics with NULL-inclusive NOT (F2)") {
    val arr = Seq(
      (1, Seq("x", "Alpha")), (2, Seq("beta")), (3, null.asInstanceOf[Seq[String]]))
      .toDF("id", "vs")
    def f(op: Op, v: String) =
      arr.filter(Predicates.compileArray(col("vs"), op, v))
        .select("id").as[Int].collect().toSeq.sorted
    assert(f(Eq, "alpha") == Seq(1))
    assert(f(Contains, "ET") == Seq(2))
    assert(f(NotEq, "alpha") == Seq(2, 3))   // null array included
    assert(f(NotContains, "et") == Seq(1, 3))
  }

  test("scheme-field contains is regex, not LIKE (:3252)") {
    val d = Seq((1, "ST-11"), (2, "ST-211")).toDF("id", "v")
    val got = d.filter(Predicates.schemeContains(col("v"), "^st-1[0-9]$"))
      .select("id").as[Int].collect().toSeq
    assert(got == Seq(1)) // regex anchors work; LIKE would treat ^$ literally
  }
}
