package graft.queries

import graft.Tables
import graft.operators.Predicates
import graft.operators.Predicates._
import org.apache.spark.sql.functions._

/** SURVEY §2.2 — the reference's filter/predicate operator family (F1-F13),
  * exercised over the driver corpus with BIGSdb's exact semantics:
  * case-insensitive text compare, NOT-includes-NULL, LIKE-family operators,
  * grouped fields, array predicates, semi-join ("EAV"/list) membership.
  */
object FilterQueries extends QueryModule {

  // F1: case-insensitive equality (UPPER both sides) — query value given in
  // the "wrong" case on purpose (IsolateQueryPage.pm:2445).
  private val f1EqCi = Q(
    "f1_eq_ci",
    (s, dir) => {
      val c = Tables.load(s, dir, "customer")
      c.filter(Predicates.compile(col("c_mktsegment"), Eq, "bUiLdInG"))
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
            WHERE upper(c_mktsegment) = upper('bUiLdInG')
            ORDER BY c_custkey"""))

  // F1: NOT contain — must include NULL rows (:2500,2432).
  private val f1NotContains = Q(
    "f1_not_contains",
    (s, dir) => {
      val p = Tables.load(s, dir, "part")
      p.filter(Predicates.compile(col("p_type"), NotContains, "BRASS"))
        .select(col("p_partkey"), col("p_type"))
        .orderBy(col("p_partkey"))
    },
    Some("""SELECT p_partkey, p_type FROM part
            WHERE NOT (upper(p_type) LIKE '%BRASS%') OR p_type IS NULL
            ORDER BY p_partkey"""))

  // F1: starts with / ends with (LIKE-family, case-insensitive).
  private val f1StartsEnds = Q(
    "f1_starts_ends",
    (s, dir) => {
      val p = Tables.load(s, dir, "part")
      p.filter(
          Predicates.compile(col("p_name"), StartsWith, "gre") ||
          Predicates.compile(col("p_type"), EndsWith, "STEEL"))
        .select(col("p_partkey"), col("p_name"), col("p_type"))
        .orderBy(col("p_partkey"))
    },
    Some("""SELECT p_partkey, p_name, p_type FROM part
            WHERE upper(p_name) LIKE 'GRE%' OR upper(p_type) LIKE '%STEEL'
            ORDER BY p_partkey"""))

  // F1: range operators on native (non-text) types — pushed to the scan.
  private val f1Range = Q(
    "f1_range",
    (s, dir) => {
      val o = Tables.load(s, dir, "orders")
      o.filter(col("o_totalprice") >= 450000.0 &&
               col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey, o_totalprice FROM orders
            WHERE o_totalprice >= 450000.0 AND o_orderdate < TIMESTAMP '1996-01-01'
            ORDER BY o_orderkey"""))

  // F2: multi-valued (array) field predicate — ANY element matches
  // (ILIKE ANY / = ANY, IsolateQueryPage.pm:2508,2525). embeddings.embedding
  // is the corpus array column; exact float compare, no arithmetic.
  private val f2ArrayAny = Q(
    "f2_array_any",
    (s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      e.filter(exists(col("embedding"), x => x > lit(0.999f)))
        .select(col("vec_id"), col("label"))
        .orderBy(col("vec_id"))
    },
    Some("""SELECT vec_id, label FROM embeddings
            WHERE len(list_filter(embedding, x -> x > 0.999)) > 0
            ORDER BY vec_id"""))

  // F3: option-list sub-value expansion — matching a value also matches its
  // "value [sub]" optlist entries; precomputed synonym set → isin().
  private val f3Optlist = Q(
    "f3_optlist",
    (s, dir) => {
      val c = Tables.load(s, dir, "customer")
      val expanded = Seq("AUTOMOBILE", "MACHINERY") // "vehicle" group expansion
      c.filter(upper(col("c_mktsegment")).isin(expanded: _*))
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_mktsegment FROM customer
            WHERE upper(c_mktsegment) IN ('AUTOMOBILE','MACHINERY')
            ORDER BY c_custkey"""))

  // F4: grouped-field query — one predicate OR'd across a field group
  // (AND'd for NOT variants, IsolateQueryPage.pm:2374-2469).
  private val f4Grouped = Q(
    "f4_grouped",
    (s, dir) => {
      val p = Tables.load(s, dir, "part")
      p.filter(Predicates.compileGroup(
          Seq(col("p_name"), col("p_type"), col("p_brand")), Contains, "red"))
        .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_type"))
        .orderBy(col("p_partkey"))
    },
    Some("""SELECT p_partkey, p_name, p_brand, p_type FROM part
            WHERE upper(p_name) LIKE '%RED%' OR upper(p_type) LIKE '%RED%'
               OR upper(p_brand) LIKE '%RED%'
            ORDER BY p_partkey"""))

  // F5: label-field + aliases — direct match OR alias-table match
  // (IsolateQueryPage.pm:2493-2498): union of direct filter and semi join.
  // Analog: customers matching by own name OR by their nation's name.
  private val f5Alias = Q(
    "f5_alias",
    (s, dir) => {
      val c = Tables.load(s, dir, "customer")
      val n = Tables.load(s, dir, "nation")
      val direct = c.filter(Predicates.compile(col("c_name"), Contains, "0001"))
      val viaAlias = c.join(
        broadcast(n.filter(Predicates.compile(col("n_name"), Eq, "france"))),
        c("c_nationkey") === n("n_nationkey"), "left_semi")
      direct.union(viaAlias).distinct()
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT DISTINCT c_custkey, c_name FROM customer
            WHERE upper(c_name) LIKE '%0001%'
               OR EXISTS (SELECT 1 FROM nation
                          WHERE n_nationkey = c_nationkey
                            AND upper(n_name) = upper('france'))
            ORDER BY c_custkey"""))

  // F6/F7: EAV-style predicate — semi join into a filtered long-format fact
  // (IN (SELECT isolate_id FROM eav_* WHERE ...)); anti join for NOT.
  private val f7EavSemi = Q(
    "f7_eav_semi",
    (s, dir) => {
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
      c.join(o.filter(col("o_totalprice") > 400000.0).select(col("o_custkey")),
             c("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_name FROM customer
            WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)
            ORDER BY c_custkey"""))

  private val f7EavAnti = Q(
    "f7_eav_anti",
    (s, dir) => {
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
      c.join(o.filter(col("o_totalprice") > 400000.0).select(col("o_custkey")),
             c("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)
            ORDER BY c_custkey"""))

  // F10: analysis (JSON) field predicate — filter on a JSON-path value with
  // typed cast for ranges (IsolateQueryPage.pm:4260-4359). events.props is
  // the corpus JSON column.
  private val f10Json = Q(
    "f10_json",
    (s, dir) => {
      val e = Tables.load(s, dir, "events")
      e.withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .filter(col("k") >= 90)
        .select(col("event_id"), col("event_type"), col("k"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id, event_type,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events
            WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 90
            ORDER BY event_id"""))

  // F11/F13: composed filter fieldset — several clause families AND'd, the
  // way _run_query chains its mutators (IsolateQueryPage.pm:2093-2106).
  private val f11Composed = Q(
    "f11_composed",
    (s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      o.filter(Predicates.compile(col("o_orderstatus"), Eq, "f"))
        .filter(Predicates.compile(col("o_orderpriority"), Contains, "urgent"))
        .join(c.filter(upper(col("c_mktsegment")) === "BUILDING")
               .select(col("c_custkey")),
              col("o_custkey") === col("c_custkey"), "left_semi")
        .select(col("o_orderkey"), col("o_orderpriority"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey, o_orderpriority FROM orders
            WHERE upper(o_orderstatus) = 'F'
              AND upper(o_orderpriority) LIKE '%URGENT%'
              AND o_custkey IN (SELECT c_custkey FROM customer
                                WHERE upper(c_mktsegment) = 'BUILDING')
            ORDER BY o_orderkey"""))

  // S7: list input — pasted id list becomes a broadcast semi join
  // (create_temp_list_table, Datastore.pm:2333-2388).
  private val s7List = Q(
    "s7_list_semi",
    (s, dir) => {
      import s.implicits._
      val ids = Seq(1L, 7L, 42L, 99L, 123L, 4567L).toDF("id")
      val o = Tables.load(s, dir, "orders")
      o.join(broadcast(ids), o("o_custkey") === ids("id"), "left_semi")
        .select(col("o_orderkey"), col("o_custkey"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey, o_custkey FROM orders
            WHERE o_custkey IN (1, 7, 42, 99, 123, 4567)
            ORDER BY o_orderkey"""))

  val qs: Seq[Q] = Seq(
    f1EqCi, f1NotContains, f1StartsEnds, f1Range, f2ArrayAny, f3Optlist,
    f4Grouped, f5Alias, f7EavSemi, f7EavAnti, f10Json, f11Composed, s7List)
}
