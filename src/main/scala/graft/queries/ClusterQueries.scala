package graft.queries

import graft.Tables
import graft.operators.{Clustering, Profiles}
import org.apache.spark.sql.functions._

/** SURVEY §2.10 — clustering over the profile warehouse built from lineitem
  * (l_orderkey=isolate, l_linenumber=locus, l_suppkey=allele).
  */
object ClusterQueries extends QueryModule {

  private val NLoci = 7

  // Reuses the session's FULL cached warehouse and filters it: the entity
  // filter commutes with the per-(entity, locus) min-allele aggregation,
  // and one shared build beats a second shuffle pass over the fact.
  private def wh(s: org.apache.spark.sql.SparkSession, dir: String, maxId: Int) =
    Profiles.cachedWarehouse(s"$dir/full", Tables.load(s, dir, "lineitem"),
      "l_orderkey", "l_linenumber", col("l_suppkey"), NLoci)
      .filter(col("l_orderkey") < maxId)

  // Shared oracle fragment: threshold-similarity edges between profiles of
  // isolates < 300 — pairs sharing >= 5 of 7 (locus, allele) designations.
  // (DuckDB: same explode/equi-join shape the engine uses.)
  private def edgesSql(minShared: Int) =
    s"""SELECT x.l_orderkey AS src, y.l_orderkey AS dst
        FROM (SELECT l_orderkey, l_linenumber,
                     min(CAST(l_suppkey AS VARCHAR)) AS a
              FROM lineitem WHERE l_orderkey < 300 GROUP BY 1, 2) x
        JOIN (SELECT l_orderkey, l_linenumber,
                     min(CAST(l_suppkey AS VARCHAR)) AS a
              FROM lineitem WHERE l_orderkey < 300 GROUP BY 1, 2) y
          ON x.l_linenumber = y.l_linenumber AND x.a = y.a
             AND x.l_orderkey < y.l_orderkey
        GROUP BY 1, 2
        HAVING count(1) >= $minShared"""

  // G3: single-linkage classification groups at threshold 2 (profiles within
  // 2 mismatches linked). Oracle: transitive closure by recursive CTE,
  // component id = min reachable node — the same deterministic naming rule.
  private val g3SingleLinkage = Q(
    "g3_single_linkage",
    (s, dir) => {
      val w = wh(s, dir, 300)
      Clustering.singleLinkage(w, "l_orderkey", NLoci, 2)
        .orderBy(col("l_orderkey"))
    },
    Some(s"""WITH RECURSIVE
             edges AS (
               SELECT src, dst FROM (${edgesSql(5)}) e
               UNION SELECT dst, src FROM (${edgesSql(5)}) e2),
             nodes AS (SELECT DISTINCT l_orderkey AS node
                       FROM lineitem WHERE l_orderkey < 300),
             reach AS (
               SELECT node AS src, node AS dst FROM nodes
               UNION
               SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
             SELECT src AS l_orderkey, min(dst) AS group_id
             FROM reach GROUP BY src ORDER BY l_orderkey"""))

  // G2: BURST clonal complexes with grpdef = nLoci - 2 = 5: closure groups
  // + SLV degrees (pairs sharing exactly 6) + founder = most SLVs per
  // group, min id tiebreak — all replicated in the oracle.
  private val g2Burst = Q(
    "g2_burst",
    (s, dir) => {
      val w = wh(s, dir, 300)
      Clustering.burst(w, "l_orderkey", NLoci, grpdef = NLoci - 2)
        .select(col("l_orderkey"), col("group_id"), col("slv_count"),
          col("is_founder"))
        .orderBy(col("l_orderkey"))
    },
    Some(s"""WITH RECURSIVE
             pairs AS (
               SELECT x.l_orderkey AS src, y.l_orderkey AS dst,
                      count(1) AS shared
               FROM (SELECT l_orderkey, l_linenumber,
                            min(CAST(l_suppkey AS VARCHAR)) AS a
                     FROM lineitem WHERE l_orderkey < 300 GROUP BY 1, 2) x
               JOIN (SELECT l_orderkey, l_linenumber,
                            min(CAST(l_suppkey AS VARCHAR)) AS a
                     FROM lineitem WHERE l_orderkey < 300 GROUP BY 1, 2) y
                 ON x.l_linenumber = y.l_linenumber AND x.a = y.a
                    AND x.l_orderkey < y.l_orderkey
               GROUP BY 1, 2),
             edges AS (
               SELECT src, dst FROM pairs WHERE shared >= 5
               UNION SELECT dst, src FROM pairs WHERE shared >= 5),
             nodes AS (SELECT DISTINCT l_orderkey AS node
                       FROM lineitem WHERE l_orderkey < 300),
             reach AS (
               SELECT node AS src, node AS dst FROM nodes
               UNION
               SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
             comp AS (SELECT src AS node, min(dst) AS group_id
                      FROM reach GROUP BY src),
             slv AS (
               SELECT node, count(1) AS n FROM (
                 SELECT src AS node FROM pairs WHERE shared = 6
                 UNION ALL SELECT dst FROM pairs WHERE shared = 6) t
               GROUP BY node)
             SELECT c.node AS l_orderkey, c.group_id,
                    coalesce(s.n, 0) AS slv_count,
                    row_number() OVER (PARTITION BY c.group_id
                      ORDER BY coalesce(s.n, 0) DESC, c.node) = 1 AS is_founder
             FROM comp c LEFT JOIN slv s ON c.node = s.node
             ORDER BY l_orderkey"""))

  // G4: LIN codes — order-dependent sequential assignment, no SQL oracle
  // (ClusteringSpec carries the hand-computed golden); 3-level scheme.
  private val g4Lincode = Q(
    "g4_lincode",
    (s, dir) => {
      val w = wh(s, dir, 300)
      Clustering.assignLinCodes(w, "l_orderkey", Seq(30.0, 60.0, 90.0))
        .select(col("l_orderkey"),
          concat_ws("_", col("lincode")).as("lincode"))
        .orderBy(col("l_orderkey"))
    },
    None)

  // J5: LIN code prefix join — isolates whose assigned code starts with the
  // prefix (positional element equality, IsolateQueryPage.pm:3402-3506).
  // Codes are engine-assigned (order-dependent) → ClusteringSpec carries the
  // semantics; this declares the join shape (rows-only check).
  private val j5LincodePrefix = Q(
    "j5_lincode_prefix",
    (s, dir) => {
      val codes = Clustering.assignLinCodes(
        wh(s, dir, 300), "l_orderkey", Seq(30.0, 60.0, 90.0))
      codes.filter(element_at(col("lincode"), 1) === 0)
        .select(col("l_orderkey"), concat_ws("_", col("lincode")).as("lincode"))
        .orderBy(col("l_orderkey"))
    },
    None)

  val qs: Seq[Q] = Seq(g3SingleLinkage, g2Burst, g4Lincode, j5LincodePrefix)
}
