package graft.queries

import graft.Tables
import graft.operators.Alignment
import org.apache.spark.sql.functions._

/** SURVEY §2.10 G7 — the aligner step (previously the one G7 gap: site
  * tables ran only over pre-aligned input). Center-star NW alignment with
  * a full DuckDB replay oracle: the DP matrix is rebuilt as a recursive
  * CTE carrying rows as lists (the anti-diagonal/left-scan dependency is
  * folded with a prefix-min over the row), the traceback recursion replays
  * the same diagonal>up>left tie-break, and the center-star projection is
  * pure list algebra — so the aligned strings are compared byte-for-byte,
  * not just summarized.
  */
object AlignQueries extends QueryModule {

  private val dnaSql = "regexp_replace(upper(text), '[^ACGT]', '', 'g')"

  private def members(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.load(s, dir, "documents")
      .withColumn("dna", regexp_replace(upper(col("text")), "[^ACGT]", ""))
      .filter(col("doc_id") < 40 && length(col("dna")) >= 12)
      .select((col("doc_id") % 5).as("locus"), col("doc_id"),
        substring(col("dna"), 1, 24).as("seq"))

  // The shared oracle prelude: members → center pairs → NW DP (recursion
  // over matrix rows; each new row needs a left-to-right scan, expressed as
  // prefix-min of t[k]-k + j) → deterministic traceback → alignments.
  private val nwReplaySql =
    s"""WITH RECURSIVE d AS (
          SELECT doc_id % 5 AS gid, doc_id AS mid,
                 substr($dnaSql, 1, 24) AS seq
          FROM documents
          WHERE doc_id < 40 AND length($dnaSql) >= 12),
        pairs AS (
          SELECT d.gid, d.mid, cd.seq AS a, d.seq AS b
          FROM d
          JOIN (SELECT gid, min(mid) AS cid FROM d GROUP BY gid) c
            ON c.gid = d.gid
          JOIN d cd ON cd.gid = d.gid AND cd.mid = c.cid),
        dp AS (
          SELECT gid, mid, a, b, 0 AS i,
                 list_transform(range(0, length(b)+1), j -> j) AS row,
                 [list_transform(range(0, length(b)+1), j -> j)] AS rows
          FROM pairs
          UNION ALL
          SELECT gid, mid, a, b, i+1, nr, list_append(rows, nr)
          FROM (
            SELECT *, list_transform(range(0, length(b)+1), j ->
                     list_min(list_transform(range(0, j+1), k -> t[k+1] + (j - k)))) AS nr
            FROM (
              SELECT gid, mid, a, b, i, rows,
                     list_transform(range(0, length(b)+1), j ->
                       CASE WHEN j = 0 THEN i + 1
                            ELSE least(row[j+1] + 1,
                                       row[j] + CASE WHEN substring(a, i+1, 1) = substring(b, j, 1)
                                                     THEN 0 ELSE 1 END) END) AS t
              FROM dp WHERE i < length(a)) s1) s2),
        tb AS (
          SELECT gid, mid, a, b, rows, length(a) AS i, length(b) AS j,
                 '' AS sa, '' AS sb
          FROM dp WHERE i = length(a)
          UNION ALL
          SELECT gid, mid, a, b, rows,
                 CASE WHEN diag OR up THEN i-1 ELSE i END,
                 CASE WHEN diag OR NOT up THEN j-1 ELSE j END,
                 CASE WHEN diag OR up THEN substring(a, i, 1) || sa ELSE '-' || sa END,
                 CASE WHEN diag THEN substring(b, j, 1) || sb
                      WHEN up THEN '-' || sb ELSE substring(b, j, 1) || sb END
          FROM (
            SELECT *, (up0 OR (j = 0 AND NOT diag)) AS up FROM (
              SELECT *,
                     (i > 0 AND j > 0 AND rows[i+1][j+1] = rows[i][j] +
                        CASE WHEN substring(a, i, 1) = substring(b, j, 1)
                             THEN 0 ELSE 1 END) AS diag,
                     (i > 0 AND j > 0 AND rows[i+1][j+1] = rows[i][j+1] + 1) AS up0
              FROM tb WHERE i > 0 OR j > 0) s0) s),
        ali AS (
          SELECT gid, mid, sa AS a_ali, sb AS b_ali,
                 rows[length(a)+1][length(b)+1] AS dist
          FROM tb WHERE i = 0 AND j = 0)"""

  // G7a: every member globally aligned to its locus center — the aligned
  // strings themselves are the checked output.
  private val g7Pairwise = Q(
    "g7_pairwise_align",
    (s, dir) =>
      Alignment.pairwiseToCenter(members(s, dir), "locus", "doc_id", "seq")
        .orderBy(col("locus"), col("doc_id")),
    Some(s"""$nwReplaySql
             SELECT gid AS locus, mid AS doc_id, a_ali, b_ali,
                    CAST(dist AS BIGINT) AS dist
             FROM ali ORDER BY locus, doc_id"""))

  // G7b: center-star MSA → per-site residue frequencies (the reference's
  // LocusExplorer freq table, downstream of its MUSCLE call).
  private val g7Msa = Q(
    "g7_msa_site_freq",
    (s, dir) => {
      val msa = Alignment.centerStar(members(s, dir), "locus", "doc_id", "seq")
      Alignment.siteFrequencies(msa, "locus", "msa")
        .orderBy(col("locus"), col("position"), col("residue"))
    },
    Some(s"""$nwReplaySql,
             iv AS (
               SELECT gid, mid, a_ali, b_ali,
                      list_transform(string_split_regex(a_ali, '[^-]'),
                        s -> length(s)) AS ins
               FROM ali),
             pe AS (
               SELECT gid, unnest(ins) AS v,
                      unnest(range(1, length(ins) + 1)) AS k
               FROM iv),
             prof AS (
               SELECT gid, list(mx ORDER BY k) AS prof
               FROM (SELECT gid, k, max(v) AS mx FROM pe GROUP BY gid, k) t
               GROUP BY gid),
             ex AS (
               SELECT i.gid, i.mid,
                      array_to_string(list_transform(range(1, length(p.prof) + 1), k ->
                        rpad(coalesce(runs[k], ''), CAST(p.prof[k] AS INTEGER), '-') ||
                        coalesce(alich[k], '')), '') AS msa
               FROM (
                 SELECT gid, mid,
                        string_split(array_to_string(
                          list_transform(range(1, length(a_ali) + 1), q ->
                            CASE WHEN substring(a_ali, q, 1) = '-'
                                 THEN substring(b_ali, q, 1)
                                 ELSE '|' END), ''), '|') AS runs,
                        list_transform(
                          list_filter(range(1, length(a_ali) + 1),
                            q -> substring(a_ali, q, 1) != '-'),
                          q -> substring(b_ali, q, 1)) AS alich
                 FROM iv) i
               JOIN prof p ON p.gid = i.gid)
             SELECT gid AS locus, CAST(pos AS BIGINT) AS position,
                    substring(msa, pos, 1) AS residue, count(1) AS n
             FROM ex, unnest(range(1, length(msa) + 1)) t(pos)
             GROUP BY 1, 2, 3
             ORDER BY locus, position, residue"""))

  // SequenceComparison plugin (Plugins/SequenceComparison.pm:159-183): two
  // same-locus alleles of EQUAL length → per-position difference list
  // ("pos: b1 → b2", 1-based) + identity % to 2 dp computed in the
  // reference's operation order (100 - (n/len)*100). Unequal-length pairs
  // take the alignment branch (g7_pairwise_align); this query mirrors the
  // positional branch. Wholly narrow — pair formation is an id-shifted
  // self-join of a filtered slice (broadcastable), the diff scan is a
  // per-row codegen'd HOF chain, no shuffle after the join.
  private val seqComparison = Q(
    "seq_comparison",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      def side(parity: Int, idAs: String, seqAs: String) =
        docs.filter(col("doc_id") < 40 && col("doc_id") % 2 === parity)
          .select((col("doc_id") - parity).as("pair_id"),
            col("doc_id").as(idAs),
            upper(substring(col("text"), 1, 60)).as(seqAs))
      side(0, "allele1", "s1")
        .join(side(1, "allele2", "s2"), "pair_id")
        .filter(length(col("s1")) === length(col("s2")))
        .withColumn("diffs", expr(
          """filter(transform(sequence(1, length(s1)),
                      i -> struct(i AS pos, substring(s1, i, 1) AS b1,
                                  substring(s2, i, 1) AS b2)),
                    x -> x.b1 != x.b2)"""))
        .select(
          col("pair_id"), col("allele1"), col("allele2"),
          size(col("diffs")).as("n_diffs"),
          round(lit(100.0) - size(col("diffs")).cast("double")
            / length(col("s1")) * 100.0, 2).as("identity_pct"),
          expr("""array_join(transform(diffs,
                    x -> concat(x.pos, ': ', x.b1, ' -> ', x.b2)), '; ')""")
            .as("diffs"))
        .orderBy(col("pair_id"))
    },
    Some("""SELECT pair_id, allele1, allele2,
                   CAST(len(d) AS INTEGER) AS n_diffs,
                   round(100.0 - CAST(len(d) AS DOUBLE) / length(s1) * 100.0,
                         2) AS identity_pct,
                   array_to_string(list_transform(d,
                     x -> CAST(x.pos AS VARCHAR) || ': ' || x.b1 || ' -> '
                          || x.b2), '; ') AS diffs
            FROM (
              SELECT a1.pair_id, a1.allele1, a2.allele2, a1.s1, a2.s2,
                     list_filter(list_transform(range(1, length(a1.s1) + 1),
                       i -> {'pos': CAST(i AS INTEGER),
                             'b1': substring(a1.s1, i, 1),
                             'b2': substring(a2.s2, i, 1)}),
                       x -> x.b1 != x.b2) AS d
              FROM (SELECT doc_id AS pair_id, doc_id AS allele1,
                           upper(substring(text, 1, 60)) AS s1
                    FROM documents WHERE doc_id < 40 AND doc_id % 2 = 0) a1
              JOIN (SELECT doc_id - 1 AS pair_id, doc_id AS allele2,
                           upper(substring(text, 1, 60)) AS s2
                    FROM documents WHERE doc_id < 40 AND doc_id % 2 = 1) a2
                USING (pair_id)
              WHERE length(a1.s1) = length(a2.s2)) t
            ORDER BY pair_id"""))

  val qs: Seq[Q] = Seq(g7Pairwise, g7Msa, seqComparison)
}
