package graft.queries

import graft.Tables
import graft.api.QueryCompiler._
import graft.api.SecurityView
import graft.api.SecurityView.{SecurityColumns, SecurityContext}
import graft.operators.Predicates.{Contains, Eq, Le}
import org.apache.spark.sql.functions._

/** SURVEY §3.1/§3.2 — the query lifecycle end-to-end: typed QuerySpec AST →
  * compiled DataFrame plan → security view → stable sort → count+page.
  * orders = entities, lineitem = designation fact.
  */
object ApiQueries extends QueryModule {

  private def catalog(s: org.apache.spark.sql.SparkSession, dir: String) =
    Catalog(
      entities = Tables.load(s, dir, "orders"),
      entityId = "o_orderkey",
      facts = Some(Tables.load(s, dir, "lineitem")
        .withColumn("allele", col("l_suppkey").cast("string"))),
      factEntityId = "l_orderkey",
      locusCol = "l_linenumber",
      alleleCol = "allele")

  // The full mutator chain in one spec: provenance + designation + count +
  // ordered page 2 of 50 — the reference's flagship interactive query shape.
  private val apiCompiled = Q(
    "api_compiled_query",
    (s, dir) => {
      val spec = QuerySpec(
        provenance = Seq(FieldClause("o_orderstatus", Eq, "f")),
        designations = Seq(HasAllele(2, Eq, "17")),
        counts = Seq(CountClause(Le, 5)),
        orderBy = Seq(SortSpec("o_totalprice", ascending = false)),
        page = Some(PageSpec(2, 50)))
      paged(spec, catalog(s, dir)).page
        .select(col("o_orderkey"), col("o_totalprice"))
    },
    Some("""SELECT o_orderkey, o_totalprice FROM orders
            WHERE upper(o_orderstatus) = 'F'
              AND o_orderkey IN (SELECT l_orderkey FROM lineitem
                                 WHERE l_linenumber = 2
                                   AND upper(CAST(l_suppkey AS VARCHAR)) = '17')
              AND (SELECT count(1) FROM lineitem
                   WHERE l_orderkey = o_orderkey) <= 5
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 50 OFFSET 50"""))

  // Designation-absence (J2) + grouped contains through the same compiler.
  private val apiMissing = Q(
    "api_missing_locus",
    (s, dir) => {
      val spec = QuerySpec(
        grouped = Seq(GroupClause(
          Seq("o_orderpriority", "o_orderstatus"), Contains, "o")),
        designations = Seq(LocusMissing(6)),
        orderBy = Seq(SortSpec("o_orderkey")))
      paged(spec, catalog(s, dir)).page.select(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey FROM orders
            WHERE (upper(o_orderpriority) LIKE '%O%'
                   OR upper(o_orderstatus) LIKE '%O%')
              AND NOT EXISTS (SELECT 1 FROM lineitem
                              WHERE l_orderkey = o_orderkey AND l_linenumber = 6)
            ORDER BY o_orderkey"""))

  // S1: the security view composed under a query — public ∪ own ∪
  // project-shared, date-restricted (Datastore.initiate_view semantics).
  private val s1Security = Q(
    "s1_security_view",
    (s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .withColumn("owner_id", col("o_custkey"))
        .withColumn("is_private", col("o_totalprice") > 300000.0)
        .withColumn("project_id", col("o_custkey") % 10)
        .withColumn("date_entered", col("o_orderdate"))
      val ctx = SecurityContext(userId = Some(7L), memberProjects = Set(3L),
        maxDate = Some("1997-06-30"))
      SecurityView.view(o, ctx, SecurityColumns())
        .select(col("o_orderkey"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey FROM orders
            WHERE (NOT (o_totalprice > 300000.0)
                   OR o_custkey = 7
                   OR (o_custkey % 10) IN (3))
              AND o_orderdate <= TIMESTAMP '1997-06-30'
            ORDER BY o_orderkey"""))

  // F13/§3.2: the REST JSON search grammar parsed into the same compiler —
  // one parser in front of the identical predicate semantics.
  private val restParsed = Q(
    "f13_rest_query",
    (s, dir) => {
      val spec = graft.api.RestQuery.parse(
        """{"field.o_orderstatus": "f", "locus.3": "42",
            "oper": "=", "page": 1, "page_size": 100}""")
      paged(spec, catalog(s, dir)).page
        .select(col("o_orderkey"), col("o_orderstatus"))
    },
    Some("""SELECT o_orderkey, o_orderstatus FROM orders
            WHERE upper(o_orderstatus) = 'F'
              AND o_orderkey IN (SELECT l_orderkey FROM lineitem
                                 WHERE l_linenumber = 3
                                   AND upper(CAST(l_suppkey AS VARCHAR)) = '42')
            ORDER BY o_orderkey
            LIMIT 100 OFFSET 0"""))

  val qs: Seq[Q] = Seq(apiCompiled, apiMissing, s1Security, restParsed)
}
