package graft.queries

import graft.Tables
import graft.pipeline.Tokenizer
import org.apache.spark.sql.functions._

/** BPE tokenizer induction + encode over `documents` (Sennrich et al.
  * 2016). The training recursion is fully deterministic (integer pair
  * counts, ascending-pair tie break, leftmost non-overlapping merge
  * application), so the DuckDB oracle replays every round as an unrolled
  * CTE chain — the merge table AND the encode under it are both
  * value-checked, not just row-counted.
  */
object TokenizerQueries extends QueryModule {

  private val Rounds = 10

  // The merge table is a pure function of (corpus, rounds) — memoize it
  // per session like Profiles.cachedWarehouse, so the train and encode
  // entry points (and repeated invocations in a long-lived session) share
  // one training sweep instead of re-running the 10-round recursion.
  private val mergeCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[Tokenizer.Merge]]()

  private def trainedMerges(
      s: org.apache.spark.sql.SparkSession, dir: String): Seq[Tokenizer.Merge] =
    mergeCache.computeIfAbsent(
      Tables.sessionKey(s) + "|" + dir + "|" + Rounds,
      _ => Tokenizer.bpeTrain(Tables.load(s, dir, "documents"), "text", Rounds))

  /** Shared oracle prelude: the word-frequency vocab (w0), char-level
    * reprs (r0), then per round r: pair counts (p_r), the winning pair
    * (b_r), and the merged vocab (r_r). Mirrors Tokenizer.bpeTrain
    * round for round.
    */
  private def trainCtes(rounds: Int): String = {
    val sb = new StringBuilder
    sb.append("""WITH w0 AS MATERIALIZED (
        SELECT w, count(1) AS cnt
        FROM (SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
              FROM documents)
        WHERE regexp_matches(w, '^[a-z]+$')
        GROUP BY w),
      r0 AS MATERIALIZED (SELECT cnt,
               array_to_string(list_transform(range(1, length(w) + 1),
                 i -> w[i:i]), '  ') AS repr
             FROM w0)""")
    for (r <- 1 to rounds) {
      val prev = s"r${r - 1}"
      sb.append(s""",
      p$r AS MATERIALIZED (SELECT pair, CAST(sum(cnt) AS BIGINT) AS n
              FROM (SELECT cnt,
                      unnest(list_transform(
                        range(1, len(string_split(repr, '  '))),
                        i -> string_split(repr, '  ')[i] || ' ' ||
                             string_split(repr, '  ')[i + 1])) AS pair
                    FROM $prev)
              GROUP BY pair),
      b$r AS MATERIALIZED (SELECT pair, n FROM p$r ORDER BY n DESC, pair LIMIT 1),
      r$r AS MATERIALIZED (SELECT cnt,
                trim(replace(' ' || repr || ' ',
                  ' ' || replace((SELECT pair FROM b$r), ' ', '  ') || ' ',
                  ' ' || replace((SELECT pair FROM b$r), ' ', '') || ' '))
                  AS repr
              FROM $prev)""")
    }
    sb.toString
  }

  // The learned merge table itself: rank, pair, fused symbol, winning
  // weighted adjacency count. k rows to the driver per round only (the
  // kmeansTrain posture); the corpus reduces once to the vocab.
  private val textBpeTrain = Q(
    "text_bpe_train",
    (s, dir) => {
      val merges = trainedMerges(s, dir)
      s.createDataFrame(merges).select(
        col("rank"), col("pair"), col("merged"), col("n"))
        .orderBy(col("rank"))
    },
    Some {
      val rows = (1 to Rounds).map(r =>
        s"SELECT $r AS rank, pair, replace(pair, ' ', '') AS merged, n FROM b$r")
        .mkString("\n        UNION ALL ")
      s"""${trainCtes(Rounds)}
        SELECT rank, pair, merged, n FROM (
        $rows) ORDER BY rank"""
    })

  // Greedy encode under the learned table: per-document subword token
  // count over the [a-z]+ word stream. The merges inline as literals into
  // one narrow codegen'd projection — no shuffle, stream-safe; the oracle
  // re-derives the merge table and applies the same nested replaces.
  private val textBpeEncode = Q(
    "text_bpe_encode",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val merges = trainedMerges(s, dir)
      docs.select(col("doc_id"),
          size(Tokenizer.alphaWords(col("text"))).cast("long").as("n_words"),
          Tokenizer.bpeTokenCount(col("text"), merges).as("n_bpe"))
        .orderBy(col("doc_id"))
    },
    Some {
      // charRepr(w) with all `Rounds` merges applied, innermost first
      val applied = (1 to Rounds).foldLeft(
        "array_to_string(list_transform(range(1, length(w) + 1), i -> w[i:i]), '  ')") {
        (acc, r) =>
          s"""trim(replace(' ' || $acc || ' ',
               ' ' || replace((SELECT pair FROM b$r), ' ', '  ') || ' ',
               ' ' || replace((SELECT pair FROM b$r), ' ', '') || ' '))"""
      }
      s"""${trainCtes(Rounds)},
        wd AS MATERIALIZED (SELECT doc_id,
                 unnest(list_filter(
                   string_split_regex(lower(trim(text)), '\\s+'),
                   w -> regexp_matches(w, '^[a-z]+$$'))) AS w
               FROM documents),
        ew AS MATERIALIZED (SELECT doc_id,
                 CAST(len(string_split($applied, '  ')) AS BIGINT) AS nt
               FROM wd)
        SELECT d.doc_id,
               CAST(len(list_filter(
                 string_split_regex(lower(trim(d.text)), '\\s+'),
                 w -> regexp_matches(w, '^[a-z]+$$'))) AS BIGINT) AS n_words,
               CAST(coalesce(sum(ew.nt), 0) AS BIGINT) AS n_bpe
        FROM documents d LEFT JOIN ew ON d.doc_id = ew.doc_id
        GROUP BY d.doc_id, d.text
        ORDER BY d.doc_id"""
    })

  val qs: Seq[Q] = Seq(textBpeTrain, textBpeEncode)
}
