package graft.queries

import graft.Tables
import graft.operators.Profiles
import org.apache.spark.sql.functions._

/** SURVEY §2.3 J6-J8 + §2.10 G1/G6 — the scheme/profile engine over the
  * corpus. Mapping: lineitem = allele_designations (l_orderkey=isolate,
  * l_linenumber=locus 1..7, l_suppkey=allele id as text). Duplicate
  * (orderkey, linenumber) rows in the corpus play BIGSdb's multiple
  * designations per locus, resolved deterministically (min allele).
  */
object ProfileQueries extends QueryModule {

  private val NLoci = 7

  // Shared oracle fragment: the profile warehouse as SQL — min allele per
  // locus, dense 1..7 array with '0' for missing, md5 of the joined array.
  private val whSql =
    """SELECT l_orderkey,
              md5(array_to_string(list_transform(range(1, 8),
                i -> coalesce(m[i][1], '0')), ',')) AS profile_md5
       FROM (SELECT l_orderkey,
                    map(list(l_linenumber ORDER BY l_linenumber),
                        list(a ORDER BY l_linenumber)) AS m
             FROM (SELECT l_orderkey, l_linenumber,
                          min(CAST(l_suppkey AS VARCHAR)) AS a
                   FROM lineitem GROUP BY 1, 2) d
             GROUP BY l_orderkey) g"""

  private def wh(s: org.apache.spark.sql.SparkSession, dir: String) =
    Profiles.cachedWarehouse(s"$dir/full", Tables.load(s, dir, "lineitem"),
      "l_orderkey", "l_linenumber", col("l_suppkey"), NLoci)

  // The warehouse build itself (mv_scheme_<id>, sql/seqdef.sql:1155-1253):
  // one row per isolate with md5(profile) — the exact-lookup key.
  private val j6Warehouse = Q(
    "j6_warehouse",
    (s, dir) => wh(s, dir)
      .select(col("l_orderkey"), col("profile_md5"))
      .orderBy(col("l_orderkey")),
    Some(s"""SELECT l_orderkey, profile_md5 FROM ($whSql) wh
             ORDER BY l_orderkey"""))

  // J6: exact profile lookup — all isolates sharing the profile of isolate 7
  // (md5 equi join against the warehouse = the mv_scheme md5 unique index).
  private val j6ProfileLookup = Q(
    "j6_profile_lookup",
    (s, dir) => {
      val w = wh(s, dir)
      val target = w.filter(col("l_orderkey") === 7)
        .select(col("profile_md5").as("target_md5"))
      val out = w.join(broadcast(target),
          w("profile_md5") === col("target_md5"), "left_semi")
        .select(col("l_orderkey"), col("profile_md5"))
        .orderBy(col("l_orderkey"))
      out
    },
    Some(s"""WITH wh AS ($whSql)
             SELECT l_orderkey, profile_md5 FROM wh
             WHERE profile_md5 IN (SELECT profile_md5 FROM wh WHERE l_orderkey = 7)
             ORDER BY l_orderkey"""))

  // ST assignment (Q5 resolution chain): profile → ST id. ST numbering is
  // deterministic: rank of first-appearing isolate per distinct profile
  // (the reference assigns on definition order; we fix the ordering rule to
  // min isolate id — SURVEY §7.4 hard-part 1 applies). Numbering is the
  // two-phase distributed form (Numbering.numberBySort): for cgMLST-like
  // schemes the profile dimension approaches the isolate count, so a global
  // `Window.orderBy` would funnel it through one task.
  private val j6StAssign = Q(
    "j6_st_assign",
    (s, dir) => {
      val w = wh(s, dir)
      // first_iso is unique across profiles (an isolate has one profile),
      // so dense numbering by first_iso = plain 1..n numbering; the
      // dimension is session-cached beside the warehouse it derives from
      val sts = Profiles.cachedStDim(s"$dir/full", w, "l_orderkey")
      // ST dimension broadcast: classic MLST defines ~10^4 STs (7 loci,
      // Constants.pm MAX_LOCI_NON_CACHE_SCHEME=30 bounds this family), so
      // the (md5 → st) map is MBs and the isolate fact stays unshuffled.
      // cgMLST-scale schemes (profile count ≈ isolate count) should drop
      // the hint and let the planner shuffle both sides.
      w.join(broadcast(sts.select(col("profile_md5"), col("st"))),
          Seq("profile_md5"))
        .select(col("l_orderkey"), col("st"))
        .orderBy(col("l_orderkey"))
    },
    Some(s"""WITH wh AS ($whSql),
             defs AS (SELECT profile_md5, min(l_orderkey) AS first_iso
                      FROM wh GROUP BY profile_md5),
             sts AS (SELECT profile_md5,
                            dense_rank() OVER (ORDER BY first_iso) AS st
                     FROM defs)
             SELECT l_orderkey, st FROM wh JOIN sts USING (profile_md5)
             ORDER BY l_orderkey"""))

  // J7: profile_diff — pairwise mismatch count between profiles of a fixed
  // isolate subset (zip_with form; sql/seqdef.sql:1380-1384).
  private val j7ProfileDiff = Q(
    "j7_profile_diff",
    (s, dir) => {
      val w = wh(s, dir).filter(col("l_orderkey") < 40)
      val a = w.select(col("l_orderkey").as("iso1"), col("profile").as("p1"))
      val b = w.select(col("l_orderkey").as("iso2"), col("profile").as("p2"))
      // output is the bounded pair slice (<40 isolates → 780 rows): a
      // single-partition sort skips the range-sampling pass that would
      // re-execute the join child; total order is preserved
      a.join(b, col("iso1") < col("iso2"))
        .select(col("iso1"), col("iso2"),
          Profiles.profileDiff(col("p1"), col("p2")).cast("long").as("ndiff"))
        .repartition(1)
        .sortWithinPartitions(col("iso1"), col("iso2"))
    },
    Some("""WITH d AS (SELECT l_orderkey, l_linenumber,
                              min(CAST(l_suppkey AS VARCHAR)) AS a
                       FROM lineitem WHERE l_orderkey < 40 GROUP BY 1, 2),
            p AS (SELECT l_orderkey,
                         list_transform(range(1, 8),
                           i -> coalesce(map(list(l_linenumber ORDER BY l_linenumber),
                                             list(a ORDER BY l_linenumber))[i][1], '0'))
                           AS profile
                  FROM d GROUP BY l_orderkey)
            SELECT a.l_orderkey AS iso1, b.l_orderkey AS iso2,
                   len(list_filter(range(1, 8),
                     i -> a.profile[i] != b.profile[i]
                          AND a.profile[i] != 'N' AND b.profile[i] != 'N'))
                     AS ndiff
            FROM p a JOIN p b ON a.l_orderkey < b.l_orderkey
            ORDER BY iso1, iso2"""))

  // J8: matching_profiles — isolates sharing >= nLoci - threshold alleles
  // with isolate 7's profile (broadcast target, linear scan; seqdef.sql:1386).
  private val j8MatchingProfiles = Q(
    "j8_matching_profiles",
    (s, dir) => {
      val w = wh(s, dir)
      val target = w.filter(col("l_orderkey") === 7)
        .select(col("profile").as("tp"))
      w.join(broadcast(target))
        .withColumn("shared",
          Profiles.sharedCount(col("profile"), col("tp")).cast("long"))
        .filter(col("shared") >= NLoci - 3)
        .select(col("l_orderkey"), col("shared"))
        .orderBy(col("l_orderkey"))
    },
    Some("""WITH d AS (SELECT l_orderkey, l_linenumber,
                              min(CAST(l_suppkey AS VARCHAR)) AS a
                       FROM lineitem GROUP BY 1, 2),
            p AS (SELECT l_orderkey,
                         list_transform(range(1, 8),
                           i -> coalesce(map(list(l_linenumber ORDER BY l_linenumber),
                                             list(a ORDER BY l_linenumber))[i][1], '0'))
                           AS profile
                  FROM d GROUP BY l_orderkey),
            t AS (SELECT profile AS tp FROM p WHERE l_orderkey = 7)
            SELECT l_orderkey,
                   len(list_filter(range(1, 8),
                     i -> p.profile[i] = t.tp[i] OR p.profile[i] = 'N'
                          OR t.tp[i] = 'N')) AS shared
            FROM p, t
            WHERE len(list_filter(range(1, 8),
                    i -> p.profile[i] = t.tp[i] OR p.profile[i] = 'N'
                         OR t.tp[i] = 'N')) >= 4
            ORDER BY l_orderkey"""))

  // G1: pairwise allelic distance matrix on a bounded taxa set (the
  // reference caps at MAX_SPLITS_TAXA=150) — explode/equi-join form so only
  // sharing pairs are generated, then distance = nLoci - shared.
  private val g1DistanceMatrix = Q(
    "g1_distance_matrix",
    (s, dir) => {
      val w = wh(s, dir).filter(col("l_orderkey") < 150)
      val sim = Profiles.similarityJoin(w, "l_orderkey", 1)
      sim.select(col("e1").as("iso1"), col("e2").as("iso2"),
          (lit(NLoci) - col("shared")).cast("long").as("dist"))
        .filter(col("dist") <= 3)
        .orderBy(col("iso1"), col("iso2"))
    },
    Some("""WITH d AS (SELECT l_orderkey, l_linenumber,
                              min(CAST(l_suppkey AS VARCHAR)) AS a
                       FROM lineitem WHERE l_orderkey < 150 GROUP BY 1, 2),
            pairs AS (
              SELECT x.l_orderkey AS iso1, y.l_orderkey AS iso2,
                     count(1) AS shared
              FROM d x JOIN d y
                ON x.l_linenumber = y.l_linenumber AND x.a = y.a
                   AND x.l_orderkey < y.l_orderkey
              GROUP BY 1, 2)
            SELECT iso1, iso2, 7 - shared AS dist FROM pairs
            WHERE 7 - shared <= 3
            ORDER BY iso1, iso2"""))

  // G6: gene presence/absence matrix (GenePresence.pm:390-535) — pivot of
  // designation existence to one boolean column per locus.
  private val g6PresenceMatrix = Q(
    "g6_presence_matrix",
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      // presence = one bit per locus, folded with bit_or — a single
      // long-buffer aggregate instead of the 7-count pivot (the e2dcd2e
      // bitmask idiom). ONE exchange total: range-partition the projected
      // fact FIRST — RangePartitioning on the group key satisfies the
      // aggregate's ClusteredDistribution, so no second hash shuffle, and
      // the range sampler reads the 2-column scan, not a re-executed
      // aggregation (a trailing orderBy samples its child twice);
      // sortWithinPartitions then yields global order since range
      // partitions are themselves ordered.
      li.select(col("l_orderkey"), col("l_linenumber"))
        .repartitionByRange(col("l_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(bit_or(expr("shiftleft(1L, l_linenumber)")).as("__mask"))
        .sortWithinPartitions(col("l_orderkey"))
        .select(col("l_orderkey") +:
          (1 to NLoci).map(i =>
            (expr(s"(__mask >> $i) & 1") === 1).as(s"locus$i")): _*)
    },
    Some("""SELECT l_orderkey,
                   count(1) FILTER (WHERE l_linenumber = 1) > 0 AS locus1,
                   count(1) FILTER (WHERE l_linenumber = 2) > 0 AS locus2,
                   count(1) FILTER (WHERE l_linenumber = 3) > 0 AS locus3,
                   count(1) FILTER (WHERE l_linenumber = 4) > 0 AS locus4,
                   count(1) FILTER (WHERE l_linenumber = 5) > 0 AS locus5,
                   count(1) FILTER (WHERE l_linenumber = 6) > 0 AS locus6,
                   count(1) FILTER (WHERE l_linenumber = 7) > 0 AS locus7
            FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey"""))

  // ProfileExport plugin (Plugins/ProfileExport.pm:180-338): the scheme's
  // profile definition table — one row per DISTINCT profile: ST, one column
  // per locus, plus how many isolates carry it. The reference pages through
  // profile ids re-querying the warehouse row by row (:238); here it is the
  // same one-aggregation profile-definition reduce that backs j6_st_assign
  // (map-side combinable on md5) with the allele columns projected out of
  // the array — no second scan of the fact, no per-profile lookups.
  private val exportProfiles = Q(
    "export_profiles",
    (s, dir) => {
      val w = wh(s, dir)
      val defs = w.groupBy(col("profile_md5"))
        .agg(min(col("l_orderkey")).as("first_iso"),
          count(lit(1)).as("n_isolates"),
          // profile is functionally determined by its md5 — `first` is
          // deterministic here because every row in the group agrees
          first(col("profile")).as("profile"))
      val sts = graft.operators.Numbering.numberBySort(defs, "first_iso", "st")
      sts.select(
          (col("st") +: (1 to NLoci).map(i =>
            element_at(col("profile"), i).as(s"locus_$i")) :+
            col("n_isolates")): _*)
        .orderBy(col("st"))
    },
    Some(s"""WITH wh AS (
               SELECT l_orderkey,
                      list_transform(range(1, 8),
                        i -> coalesce(m[i][1], '0')) AS prof
               FROM (SELECT l_orderkey,
                            map(list(l_linenumber ORDER BY l_linenumber),
                                list(a ORDER BY l_linenumber)) AS m
                     FROM (SELECT l_orderkey, l_linenumber,
                                  min(CAST(l_suppkey AS VARCHAR)) AS a
                           FROM lineitem GROUP BY 1, 2) d
                     GROUP BY l_orderkey) g),
             defs AS (SELECT prof, min(l_orderkey) AS first_iso,
                             count(1) AS n_isolates
                      FROM wh GROUP BY prof)
             SELECT dense_rank() OVER (ORDER BY first_iso) AS st,
                    prof[1] AS locus_1, prof[2] AS locus_2,
                    prof[3] AS locus_3, prof[4] AS locus_4,
                    prof[5] AS locus_5, prof[6] AS locus_6,
                    prof[7] AS locus_7, n_isolates
             FROM defs ORDER BY st"""))

  // Batch profile query (BatchProfileQueryPage.pm): a pasted batch of
  // allelic profiles resolved to STs in ONE pass — matched rows get the
  // ST, unmatched rows stay in the result flagged not-found (the page
  // prints a row per input line either way). The (md5 → st) dimension
  // broadcasts; the batch never shuffles. Every third batch row is
  // perturbed to a non-existent allele so the left-join miss path is
  // genuinely exercised.
  private val apiBatchProfiles = Q(
    "api_batch_profiles",
    (s, dir) => {
      val w = wh(s, dir)
      val sts = Profiles.cachedStDim(s"$dir/full", w, "l_orderkey")
      val batch = w.filter(col("l_orderkey") <= 30)
        .select(col("l_orderkey").as("row_id"),
          when(col("l_orderkey") % 3 === 0,
            concat(array(lit("999999")), slice(col("profile"), 2, 6)))
            .otherwise(col("profile")).as("p"))
        .withColumn("profile_md5", md5(array_join(col("p"), ",")))
      batch.join(broadcast(sts.select(col("profile_md5"), col("st"))),
          Seq("profile_md5"), "left")
        .select(col("row_id"), col("st"), col("st").isNotNull.as("matched"))
        .orderBy(col("row_id"))
    },
    Some("""WITH whp AS (
              SELECT l_orderkey,
                     list_transform(range(1, 8),
                       i -> coalesce(m[i][1], '0')) AS prof
              FROM (SELECT l_orderkey,
                           map(list(l_linenumber ORDER BY l_linenumber),
                               list(a ORDER BY l_linenumber)) AS m
                    FROM (SELECT l_orderkey, l_linenumber,
                                 min(CAST(l_suppkey AS VARCHAR)) AS a
                          FROM lineitem GROUP BY 1, 2) d
                    GROUP BY l_orderkey) g),
            md AS (SELECT l_orderkey,
                          md5(array_to_string(prof, ',')) AS profile_md5,
                          prof
                   FROM whp),
            defs AS (SELECT profile_md5, min(l_orderkey) AS first_iso
                     FROM md GROUP BY profile_md5),
            sts AS (SELECT profile_md5,
                           dense_rank() OVER (ORDER BY first_iso) AS st
                    FROM defs),
            b2 AS (SELECT l_orderkey AS row_id,
                          md5(array_to_string(
                            CASE WHEN l_orderkey % 3 = 0
                                 THEN list_prepend('999999', prof[2:7])
                                 ELSE prof END, ',')) AS profile_md5
                   FROM md WHERE l_orderkey <= 30)
            SELECT row_id, st, st IS NOT NULL AS matched
            FROM b2 LEFT JOIN sts USING (profile_md5)
            ORDER BY row_id"""))

  val qs: Seq[Q] = Seq(
    j6Warehouse, j6ProfileLookup, j6StAssign, j7ProfileDiff,
    j8MatchingProfiles, g1DistanceMatrix, g6PresenceMatrix, exportProfiles,
    apiBatchProfiles)
}
