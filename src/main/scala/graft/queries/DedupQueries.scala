package graft.queries

import graft.Tables
import graft.pipeline.Dedup
import org.apache.spark.sql.functions._

/** Dedup operator family over `documents` (builder-prompt pipeline surface):
  * exact, MinHash+LSH, SimHash, n-gram Jaccard. Exact and Jaccard have
  * DuckDB oracles; the hash-defined ones (engine-specific xxhash64) are
  * covered by DedupSpec golden tests instead.
  */
object DedupQueries extends QueryModule {

  // Exact dedup: canonical id + copy count per distinct content hash.
  private val dedupExact = Q(
    "dedup_exact",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      Dedup.exact(docs, "doc_id", "text")
        .orderBy(col("content_hash"))
    },
    Some("""SELECT md5(text) AS content_hash, min(doc_id) AS canonical_id,
                   count(1) AS n_copies
            FROM documents GROUP BY content_hash ORDER BY content_hash"""))

  // n-gram Jaccard similarity: query docs vs the corpus, exact set overlap
  // on distinct word 2-grams (the verification stage of a near-dup pipeline).
  private val dedupJaccard = Q(
    "dedup_ngram_jaccard",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      // cache: the corpus side and the broadcast query side share one
      // shingle computation instead of two full scans
      val withSh = docs.select(col("doc_id"),
        Dedup.shingles(col("text"), 2).as("sh")).cache()
      val q = withSh.filter(col("doc_id") < 10)
        .select(col("doc_id").as("id1"), col("sh").as("sh1"))
      val c = withSh.select(col("doc_id").as("id2"), col("sh").as("sh2"))
      c.join(broadcast(q), col("id1") < col("id2"))
        .withColumn("jac", round(Dedup.jaccard(col("sh1"), col("sh2")), 4))
        .filter(col("jac") >= 0.05)
        .select(col("id1"), col("id2"), col("jac"))
        .orderBy(col("id1"), col("id2"))
    },
    Some("""WITH sh AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       range(1, greatest(len(string_split_regex(lower(text), '\s+')), 1)),
                       i -> list_aggregate(
                              string_split_regex(lower(text), '\s+')[i:i+1],
                              'string_agg', ' '))) AS grams
              FROM documents)
            SELECT a.doc_id AS id1, b.doc_id AS id2,
                   round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                         / len(list_distinct(a.grams || b.grams)), 4) AS jac
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE a.doc_id < 10
              AND round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                        / len(list_distinct(a.grams || b.grams)), 4) >= 0.05
            ORDER BY id1, id2"""))

  // MinHash + LSH near-dup candidates (xxhash64-based — no SQL oracle;
  // validated by DedupSpec with planted near-duplicates).
  private val dedupMinhash = Q(
    "dedup_minhash_lsh",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      Dedup.minhashLsh(docs, "doc_id", "text",
          shingleN = 2, k = 64, bands = 16, minEstJaccard = 0.1)
        .withColumn("est_jaccard", round(col("est_jaccard"), 4))
        .orderBy(col("id1"), col("id2"))
    },
    None)

  // SimHash signatures + near-dup pairs at hamming <= 16 among a bounded
  // candidate set (prefix-bucketed). Signature column itself is engine-
  // specific → no SQL oracle; DedupSpec covers the semantics.
  private val dedupSimhash = Q(
    "dedup_simhash",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      docs.select(col("doc_id"),
          Dedup.simhash(Dedup.shingleHashes(
            Dedup.shingles(col("text"), 2))).as("simhash"))
        .orderBy(col("doc_id"))
    },
    None)

  val qs: Seq[Q] = Seq(dedupExact, dedupJaccard, dedupMinhash, dedupSimhash)
}
