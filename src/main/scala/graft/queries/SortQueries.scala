package graft.queries

import graft.Tables
import graft.functions.AlleleId
import org.apache.spark.sql.functions._

/** SURVEY §2.6 — sorts / limits / top-k (O1-O5) and pagination (O3).
  *
  * Scale notes: orderBy+limit compiles to TakeOrderedAndProject (per-partition
  * top-k + driver merge of k·partitions rows — no global sort). Pagination
  * via offset/limit keeps the global sort but only materializes one page.
  */
object SortQueries extends QueryModule {

  // O1: user sort with stable tiebreaker (ORDER BY field, id, datestamp —
  // IsolateQueryPage.pm:2107-2128).
  private val o1StableSort = Q(
    "o1_stable_sort",
    (s, dir) => {
      val o = Tables.load(s, dir, "orders")
      o.orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"), col("o_totalprice"))
        .limit(100)
    },
    Some("""SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"""))

  // O2: numeric-aware text sort — allele ids are text even when numeric;
  // ORDER BY CASE WHEN ~'^[0-9]+$' THEN lpad(id,10,'0') ELSE id END
  // (ResultsTablePage.pm:60-64). Exercised on a mixed text key.
  private val o2NumericTextSort = Q(
    "o2_numeric_text_sort",
    (s, dir) => {
      val p = Tables.load(s, dir, "part")
      // derive a text allele-id-like key: numeric for most, text for some
      val withKey = p.withColumn("allele_id",
        when(col("p_size") > 40, concat(lit("del"), col("p_partkey").cast("string")))
          .otherwise(col("p_partkey").cast("string")))
      withKey
        .withColumn("sort_key", AlleleId.sortKey(col("allele_id")))
        .select(col("p_partkey"), col("allele_id"), col("sort_key"))
        .orderBy(col("sort_key"), col("p_partkey"))
    },
    Some("""SELECT p_partkey, allele_id,
                   CASE WHEN regexp_matches(allele_id, '^[0-9]+$')
                        THEN lpad(allele_id, 10, '0') ELSE allele_id END AS sort_key
            FROM (SELECT p_partkey,
                         CASE WHEN p_size > 40
                              THEN 'del' || CAST(p_partkey AS VARCHAR)
                              ELSE CAST(p_partkey AS VARCHAR) END AS allele_id
                  FROM part) t
            ORDER BY sort_key, p_partkey"""))

  // O3: pagination — total count + LIMIT/OFFSET page
  // (ResultsTablePage.pm:36-87,667; REST default 100/page Interface.pm:54).
  private val o3Pagination = Q(
    "o3_pagination",
    (s, dir) => {
      val o = Tables.load(s, dir, "orders")
      o.orderBy(col("o_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"))
        .offset(200)
        .limit(100)
    },
    Some("""SELECT o_orderkey, o_custkey FROM orders
            ORDER BY o_orderkey LIMIT 100 OFFSET 200"""))

  // O4: top-k by match count (CombinationQueryPage.pm:364-482): count
  // matching attributes vs an entered combination; when no explicit
  // threshold, MAX(count) defines it — two-pass, like the reference.
  private val o4TopkMatches = Q(
    "o4_topk_matches",
    (s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val scored = o.withColumn("matches",
        (col("o_orderstatus") === "F").cast("long") +
        (col("o_orderpriority") === "1-URGENT").cast("long") +
        (year(col("o_orderdate")) === 1994).cast("long"))
      val best = scored.agg(max(col("matches"))).first().getLong(0)
      scored.filter(col("matches") === best)
        .select(col("o_orderkey"), col("matches"))
        .orderBy(col("o_orderkey"))
    },
    Some("""WITH scored AS (
              SELECT o_orderkey,
                     CAST(o_orderstatus = 'F' AS BIGINT)
                   + CAST(o_orderpriority = '1-URGENT' AS BIGINT)
                   + CAST(year(o_orderdate) = 1994 AS BIGINT) AS matches
              FROM orders)
            SELECT o_orderkey, matches FROM scored
            WHERE matches = (SELECT max(matches) FROM scored)
            ORDER BY o_orderkey"""))

  val qs: Seq[Q] = Seq(o1StableSort, o2NumericTextSort, o3Pagination, o4TopkMatches)
}
