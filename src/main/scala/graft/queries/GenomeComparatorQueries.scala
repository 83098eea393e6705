package graft.queries

import graft.Tables
import graft.operators.GenomeComparator
import org.apache.spark.sql.functions._

/** Genome Comparator plugin family (reference
  * `lib/BIGSdb/Plugins/GenomeComparator.pm`) over the corpus mapping used
  * by the J/G families: `lineitem` = allele designations (l_orderkey =
  * isolate, l_linenumber = locus 1..7, CAST(l_suppkey AS VARCHAR) =
  * allele id), with `l_returnflag = 'R'` standing in for the
  * incomplete-hit flag (a deterministic per-row property, like the
  * reference's end-of-contig flag on a scan hit).
  *
  * The bounded isolate selection (< 300) mirrors how the plugin runs: a
  * user-selected isolate set per job (`GenomeComparator.pm:870-930`), not
  * the whole database. Corpus-wide distance at scale is `g1_distance_matrix`.
  */
object GenomeComparatorQueries extends QueryModule {

  private val NLoci = 7
  private val MaxId = 300

  private def designations(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.load(s, dir, "lineitem").filter(col("l_orderkey") < MaxId)
      .withColumn("locus_id", col("l_linenumber"))

  private def status(s: org.apache.spark.sql.SparkSession, dir: String) =
    GenomeComparator.statusMatrix(designations(s, dir),
      "l_orderkey", "locus_id",
      col("l_suppkey").cast("string"), col("l_returnflag") === "R", NLoci)

  // Shared oracle fragment: the dense status grid for isolates < MaxId.
  // Chosen allele = lexicographically smallest (warehouse convention);
  // incomplete = any designation row of the chosen allele flagged 'R'.
  private val statusSql =
    s"""d AS (
         SELECT l_orderkey AS iso, l_linenumber AS loc,
                CAST(l_suppkey AS VARCHAR) AS a,
                bool_or(l_returnflag = 'R') AS inc
         FROM lineitem WHERE l_orderkey < $MaxId
         GROUP BY 1, 2, 3),
       chosen AS (
         SELECT iso, loc, min(a) AS a, arg_min(inc, a) AS inc
         FROM d GROUP BY 1, 2),
       grid AS (
         SELECT iso, i AS loc
         FROM (SELECT DISTINCT l_orderkey AS iso
               FROM lineitem WHERE l_orderkey < $MaxId), range(1, ${NLoci + 1}) t(i)),
       status AS (
         SELECT g.iso, g.loc,
                CASE WHEN c.a IS NULL THEN 'X'
                     WHEN c.inc THEN 'I'
                     ELSE c.a END AS status
         FROM grid g LEFT JOIN chosen c ON g.iso = c.iso AND g.loc = c.loc)"""

  // The whole-genome MLST status table itself ('X' missing / 'I'
  // incomplete / allele id — GenomeComparator.pm:888-891).
  private val gcStatusMatrix = Q(
    "gc_status_matrix",
    (s, dir) => status(s, dir)
      .orderBy(col("l_orderkey"), col("locus_id")),
    Some(s"""WITH $statusSql
             SELECT iso AS l_orderkey, CAST(loc AS INTEGER) AS locus_id, status
             FROM status ORDER BY 1, 2"""))

  // Pairwise allelic-difference distance matrix with the reference's
  // exclude_missing_pairwise + truncated=pairwise_same options both on
  // (XS count_differences, GenomeComparator.pm:72-116): a locus counts
  // toward the distance iff both sides hold real, distinct alleles.
  private val gcDistanceMatrix = Q(
    "gc_distance_matrix",
    (s, dir) => GenomeComparator.distanceMatrix(status(s, dir),
        "l_orderkey", "locus_id",
        excludeMissingPairwise = true, truncatedPairwiseSame = true)
      .select(col("src"), col("dst"), col("distance").cast("long").as("distance"))
      .orderBy(col("src"), col("dst")),
    Some(s"""WITH $statusSql
             SELECT x.iso AS src, y.iso AS dst,
                    CAST(sum(CASE WHEN x.status <> 'X' AND y.status <> 'X'
                              AND x.status <> 'I' AND y.status <> 'I'
                              AND x.status <> y.status
                             THEN 1 ELSE 0 END) AS BIGINT) AS distance
             FROM status x JOIN status y
               ON x.loc = y.loc AND x.iso < y.iso
             GROUP BY 1, 2 ORDER BY 1, 2"""))

  // Unique strains: isolates grouped by md5 of the locus-ordered status
  // profile, trailing separator included (GenomeComparator.pm:2444-2463).
  private val gcUniqueStrains = Q(
    "gc_unique_strains",
    (s, dir) => GenomeComparator.uniqueStrains(status(s, dir),
        "l_orderkey", "locus_id")
      // arrays flatten to joined strings in query outputs (compare-tool
      // convention used throughout the registry)
      .select(col("strain"), col("n"), col("min_member"),
        concat_ws(",", col("members")).as("members"))
      .orderBy(col("strain")),
    Some(s"""WITH $statusSql,
             prof AS (
               SELECT iso,
                      string_agg(status, '|' ORDER BY loc) || '|' AS p
               FROM status GROUP BY iso)
             SELECT md5(p) AS strain, count(*) AS n,
                    min(iso) AS min_member,
                    array_to_string(list_sort(list(iso)), ',') AS members
             FROM prof GROUP BY 1 ORDER BY strain"""))

  // Potentially paralogous loci: per locus, how many isolates hold >1
  // distinct designation (GenomeComparator.pm:2465-2477).
  private val gcParalogous = Q(
    "gc_paralogous",
    (s, dir) => GenomeComparator.paralogousLoci(designations(s, dir),
        "l_orderkey", "locus_id", col("l_suppkey").cast("string"))
      .orderBy(col("locus_id")),
    Some(s"""SELECT l_linenumber AS locus_id, count(*) AS n_paralogous
             FROM (SELECT l_orderkey, l_linenumber
                   FROM lineitem WHERE l_orderkey < $MaxId
                   GROUP BY 1, 2
                   HAVING count(DISTINCT CAST(l_suppkey AS VARCHAR)) > 1)
             GROUP BY 1 ORDER BY 1"""))

  // Core-genome analysis at the reference's default 90% presence
  // threshold (GenomeComparator.pm:575-610, 2534-2674).
  private val gcCoreLoci = Q(
    "gc_core_loci",
    (s, dir) => GenomeComparator.coreAnalysis(status(s, dir),
        "l_orderkey", "locus_id", coreThreshold = 0.9)
      .orderBy(col("locus_id")),
    Some(s"""WITH $statusSql,
             tot AS (SELECT count(DISTINCT iso)::DOUBLE AS total FROM status)
             SELECT CAST(loc AS INTEGER) AS locus_id,
                    CAST(sum(CASE WHEN status <> 'X' THEN 1 ELSE 0 END)
                         AS BIGINT) AS present,
                    round(sum(CASE WHEN status <> 'X' THEN 1 ELSE 0 END)::DOUBLE
                          / total, 4) AS presence_frac,
                    sum(CASE WHEN status <> 'X' THEN 1 ELSE 0 END)::DOUBLE
                          / total >= 0.9 AS in_core
             FROM status, tot GROUP BY loc, total ORDER BY 1"""))

  val qs: Seq[Q] = Seq(gcStatusMatrix, gcDistanceMatrix, gcUniqueStrains,
    gcParalogous, gcCoreLoci)
}
