package graft.queries

import graft.Tables
import graft.pipeline.Similarity
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** ANN over `embeddings` (ARRAY<FLOAT> 64-dim): brute-force cosine top-k
  * (exact baseline, DuckDB oracle) and SRP-LSH bucketed variant (scale path).
  */
object SimilarityQueries extends QueryModule {

  private val simCosineTopk = Q(
    "sim_cosine_topk",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 8)
      Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
        .withColumn("cos", round(col("cos"), 4))
        .orderBy(col("query_id"), col("rank"))
    },
    Some("""SELECT query_id, neighbor_id, cos, rank FROM (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                     round(list_cosine_similarity(q.embedding::DOUBLE[],
                                                  c.embedding::DOUBLE[]), 4) AS cos,
                     row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
                                                       c.embedding::DOUBLE[]) DESC,
                                c.vec_id) AS rank
              FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
              WHERE q.vec_id < 8) t
            WHERE rank <= 5
            ORDER BY query_id, rank"""))

  // one MMR greedy round in the oracle: penalties against everything
  // picked so far, score the not-yet-picked shortlist, window-pick the max
  private def mmrRoundSql(r: Int, prev: String): String =
    s"""pen$r AS (
              SELECT p.query_id, p.a AS cand, max(p.sim) AS ms
              FROM ps p JOIN $prev x
                ON x.query_id = p.query_id AND x.cand = p.b
              GROUP BY 1, 2),
            sc$r AS (
              SELECT s.query_id, s.cand, s.rel, 3 * s.rel - pen$r.ms AS score
              FROM sh s JOIN pen$r USING (query_id, cand)
              LEFT JOIN $prev x
                ON x.query_id = s.query_id AND x.cand = s.cand
              WHERE x.cand IS NULL),
            sel$r AS MATERIALIZED (
              SELECT query_id, cand, rel, $r AS pick FROM (
                SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY score DESC, cand) AS rn FROM sc$r) t
              WHERE rn = 1),
            selall$r AS MATERIALIZED (
              SELECT * FROM $prev UNION ALL SELECT * FROM sel$r)"""

  // MMR diversified top-5 (λ = 3/4) over the brute-force top-12 shortlist:
  // the standard redundancy-vs-relevance re-rank for retrieval-augmented
  // sampling — rel alone would return near-duplicate neighbors; the greedy
  // penalizes each candidate by its max similarity to what's already
  // picked. Ranked via the ×4-scaled monotone form 3·rel − maxsim (both
  // engines compare the same two-term double; cosines mirror
  // Vectors.cosine's dot/sqrt(na·nb) exactly). The k−1 greedy rounds
  // unroll as SQL; everything after the one corpus-touching shortlist
  // scan is per-query s²-bounded.
  private val simMmr = Q(
    "sim_mmr",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
      Similarity.mmrRerank(emb, queries, "vec_id", "embedding",
          shortlist = 12, k = 5)
        .withColumn("rel", round(col("rel"), 4))
        .orderBy(col("query_id"), col("pick_rank"))
    },
    Some(s"""WITH eq AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings),
            sh AS MATERIALIZED (
              SELECT query_id, cand, rel FROM (
                SELECT q.vec_id AS query_id, c.vec_id AS cand,
                       list_dot_product(q.v, c.v)
                         / sqrt(list_dot_product(q.v, q.v)
                                * list_dot_product(c.v, c.v)) AS rel,
                       row_number() OVER (PARTITION BY q.vec_id
                         ORDER BY list_dot_product(q.v, c.v)
                           / sqrt(list_dot_product(q.v, q.v)
                                  * list_dot_product(c.v, c.v)) DESC,
                           c.vec_id) AS rn
                FROM eq q JOIN eq c ON q.vec_id != c.vec_id
                WHERE q.vec_id < 10) t
              WHERE rn <= 12),
            ps AS MATERIALIZED (
              SELECT a.query_id, a.cand AS a, b.cand AS b,
                     list_dot_product(ea.v, eb.v)
                       / sqrt(list_dot_product(ea.v, ea.v)
                              * list_dot_product(eb.v, eb.v)) AS sim
              FROM sh a JOIN sh b
                ON a.query_id = b.query_id AND a.cand != b.cand
              JOIN eq ea ON ea.vec_id = a.cand
              JOIN eq eb ON eb.vec_id = b.cand),
            sel1 AS MATERIALIZED (
              SELECT query_id, cand, rel, 1 AS pick FROM (
                SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY rel DESC, cand) AS rn FROM sh) t
              WHERE rn = 1),
            ${mmrRoundSql(2, "sel1")},
            ${mmrRoundSql(3, "selall2")},
            ${mmrRoundSql(4, "selall3")},
            ${mmrRoundSql(5, "selall4")}
            SELECT query_id, cand AS neighbor_id,
                   CAST(pick AS BIGINT) AS pick_rank, round(rel, 4) AS rel
            FROM selall5 ORDER BY query_id, pick_rank"""))

  // Hard-negative mining: per labeled query, the 5 most-similar
  // OTHER-label vectors with cos ≤ 0.9 (above that a candidate is
  // presumed an unlabeled positive — the RocketQA denoising guard).
  // The training-pair generator for a contrastive retriever as one
  // oracle-checked query; bounded two-phase top-k, label rides the
  // sort struct behind the unique (cos, id) key.
  private val searchHardNegatives = Q(
    "search_hard_negatives",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 20)
      Similarity.hardNegatives(emb, queries, "vec_id", "embedding",
          "label", k = 5, maxCos = 0.9)
        .withColumn("cos", round(col("cos"), 4))
        .orderBy(col("query_id"), col("neg_rank"))
    },
    Some("""WITH eq AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
              FROM embeddings)
            SELECT query_id, neg_id, neg_label, round(cos, 4) AS cos,
                   CAST(rnk AS BIGINT) AS neg_rank
            FROM (
              SELECT q.vec_id AS query_id, c.vec_id AS neg_id,
                     CAST(c.label AS INT) AS neg_label,
                     list_dot_product(q.v, c.v)
                       / sqrt(list_dot_product(q.v, q.v)
                              * list_dot_product(c.v, c.v)) AS cos,
                     row_number() OVER (PARTITION BY q.vec_id
                       ORDER BY list_dot_product(q.v, c.v)
                         / sqrt(list_dot_product(q.v, q.v)
                                * list_dot_product(c.v, c.v)) DESC,
                         c.vec_id) AS rnk
              FROM eq q JOIN eq c
                ON q.vec_id != c.vec_id AND q.label != c.label
              WHERE q.vec_id < 20
                AND list_dot_product(q.v, c.v)
                      / sqrt(list_dot_product(q.v, q.v)
                             * list_dot_product(c.v, c.v)) <= 0.9) t
            WHERE rnk <= 5
            ORDER BY query_id, neg_rank"""))

  // kNN classification report: majority vote of the 5 nearest neighbors
  // (ties to the smallest label) against each query's true label — the
  // embedding-quality eval loop as one query. The oracle replays the
  // full cosine ranking, the vote count, and the argmax window.
  private val simKnnClassify = Q(
    "sim_knn_classify",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 20)
      Similarity.knnClassify(emb, queries, "vec_id", "embedding",
          "label", k = 5)
        .join(queries.select(col("vec_id").as("query_id"),
          col("label").as("true_label")), Seq("query_id"))
        .withColumn("correct", col("pred_label") === col("true_label"))
        .orderBy(col("query_id"))
    },
    Some("""WITH ranked AS (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                     row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
                                  c.embedding::DOUBLE[]) DESC,
                                c.vec_id) AS rank
              FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
              WHERE q.vec_id < 20),
            nn AS (SELECT query_id, neighbor_id FROM ranked WHERE rank <= 5),
            v AS (
              SELECT nn.query_id, c.label AS l, count(1) AS votes
              FROM nn JOIN embeddings c ON c.vec_id = nn.neighbor_id
              GROUP BY 1, 2),
            best AS (
              SELECT query_id, l, votes FROM (
                SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY votes DESC, l) AS rn FROM v) t
              WHERE rn = 1)
            SELECT b.query_id, CAST(b.l AS INT) AS pred_label,
                   CAST(b.votes AS BIGINT) AS votes,
                   CAST(q.label AS INT) AS true_label,
                   b.l = q.label AS correct
            FROM best b JOIN embeddings q ON q.vec_id = b.query_id
            ORDER BY query_id"""))

  // DBSCAN over the cosine neighborhood graph (eps = cos ≥ 0.35,
  // minPts = 2) on a 500-vector slice: cores by degree, clusters by
  // core–core components only (a border never glues two clusters — the
  // density asymmetry that separates DBSCAN from plain components),
  // borders to their minimum-labeled core neighbor, the rest noise.
  // Oracle replays pairs, degrees, the recursive core-subgraph closure,
  // and the border argmin.
  private val simDbscan = Q(
    "sim_dbscan",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings").filter(col("vec_id") < 500)
      val pairs = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
        0.35)
      Similarity.dbscan(emb, pairs, "vec_id", minPts = 2)
        .orderBy(col("vec_id"))
    },
    Some("""WITH RECURSIVE e0 AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings WHERE vec_id < 500),
            p AS (
              SELECT a.vec_id AS id1, b.vec_id AS id2
              FROM e0 a JOIN e0 b ON a.vec_id < b.vec_id
              WHERE list_cosine_similarity(a.v, b.v) >= 0.35),
            ed AS (SELECT id1 AS n, id2 AS m FROM p
                   UNION ALL SELECT id2, id1 FROM p),
            d AS (SELECT n, count(1) AS degree FROM ed GROUP BY n),
            core AS (SELECT n FROM d WHERE degree >= 2),
            ce AS (SELECT e.n AS src, e.m AS dst FROM ed e
                   JOIN core c1 ON c1.n = e.n
                   JOIN core c2 ON c2.n = e.m),
            reach AS (
              SELECT n AS src, n AS dst FROM core
              UNION
              SELECT r.src, e.dst FROM reach r JOIN ce e ON r.dst = e.src),
            comp AS (SELECT src AS n, min(dst) AS cluster
                     FROM reach GROUP BY src),
            border AS (
              SELECT e.n, min(c.cluster) AS cluster
              FROM ed e JOIN comp c ON c.n = e.m
              WHERE e.n NOT IN (SELECT n FROM core)
              GROUP BY e.n)
            SELECT x.vec_id,
                   CAST(coalesce(d.degree, 0) AS BIGINT) AS degree,
                   CASE WHEN comp.n IS NOT NULL THEN 'core'
                        WHEN border.n IS NOT NULL THEN 'border'
                        ELSE 'noise' END AS role,
                   CAST(coalesce(comp.cluster, border.cluster, -1) AS BIGINT)
                     AS cluster
            FROM e0 x LEFT JOIN d ON d.n = x.vec_id
                      LEFT JOIN comp ON comp.n = x.vec_id
                      LEFT JOIN border ON border.n = x.vec_id
            ORDER BY vec_id"""))

  // Top principal direction via matrix-free power iteration (2 rounds):
  // the anisotropy report — top_share near 1 flags a collapsing
  // embedding space. The covariance never materializes; each round is
  // one corpus pass with order-free DECIMAL(38,18) component sums, so
  // the oracle replays both rounds, the normalization, and the
  // Rayleigh/trace ratio double-for-double.
  private val simPcaPower = Q(
    "sim_pca_power",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      Similarity.pcaPower(emb, "embedding", dim = 64, iters = 2)
        .select(col("dim"), round(col("weight"), 4).as("weight"),
          round(col("lambda"), 4).as("lambda"),
          round(col("top_share"), 4).as("top_share"))
        .orderBy(col("dim"))
    },
    Some("""WITH e AS (
              SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings),
            d1 AS (
              SELECT vec_id, v,
                     list_dot_product(v,
                       list_transform(range(1, 65), i -> 0.125)) AS d
              FROM e),
            ex1 AS (SELECT i, v[i] * d AS t FROM d1, range(1, 65) r(i)),
            y1 AS (SELECT i,
                     CAST(sum(CAST(t AS DECIMAL(38,18))) AS DOUBLE) AS y
                   FROM ex1 GROUP BY i),
            y1l AS (SELECT list(y ORDER BY i) AS y FROM y1),
            x1 AS (SELECT list_transform(y,
                     e -> e / sqrt(list_dot_product(y, y))) AS x
                   FROM y1l),
            d2 AS (SELECT e.vec_id, e.v,
                     list_dot_product(e.v, x1.x) AS d
                   FROM e, x1),
            ex2 AS (SELECT i, v[i] * d AS t FROM d2, range(1, 65) r(i)),
            y2 AS (SELECT i,
                     CAST(sum(CAST(t AS DECIMAL(38,18))) AS DOUBLE) AS y
                   FROM ex2 GROUP BY i),
            y2l AS (SELECT list(y ORDER BY i) AS y FROM y2),
            tr AS (SELECT CAST(sum(CAST(list_dot_product(v, v)
                     AS DECIMAL(38,18))) AS DOUBLE) AS tr FROM e),
            f AS (SELECT y, sqrt(list_dot_product(y, y)) AS lam FROM y2l)
            SELECT CAST(r.i AS BIGINT) AS dim,
                   round(f.y[r.i] / f.lam, 4) AS weight,
                   round(f.lam, 4) AS lambda,
                   round(f.lam / tr.tr, 4) AS top_share
            FROM f, tr, range(1, 65) r(i)
            ORDER BY dim"""))

  // Centroid similarity per label group: mean embedding per label, cosine of
  // each vector to its own label centroid — the embedding-cosine near-dup /
  // clustering primitive, aggregation-shaped (scales as one groupBy + one
  // broadcast join).
  private val simCentroid = Q(
    "sim_label_centroid",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), col("label"),
          Similarity.toDouble(col("embedding")).as("v"))
      val dim = 64
      // exact DECIMAL component sums (order-free) — a plain double sum
      // adds in partition order and could drift a rounded cosine
      val sums = emb.groupBy(col("label")).agg(
        array((0 until dim).map(i =>
          sum(element_at(col("v"), i + 1).cast("decimal(38,18)"))
            .cast("double")): _*).as("vsum"),
        count(lit(1)).as("n"))
      val centroids = sums.select(col("label"),
        transform(col("vsum"), x => x / col("n")).as("centroid"))
      emb.join(broadcast(centroids), Seq("label"))
        .select(col("vec_id"), col("label"),
          round(Similarity.cosine(col("v"), col("centroid")), 4).as("cos_to_centroid"))
        .orderBy(col("vec_id"))
    },
    Some("""WITH exploded AS (
              SELECT vec_id, label, i, embedding[i]::DOUBLE AS x
              FROM embeddings, range(1, 65) t(i)),
            cent AS (
              -- exact decimal sums + ordered list folds mirror the
              -- engine's sequential cosine kernel exactly
              SELECT label, i,
                     CAST(sum(CAST(x AS DECIMAL(38,18))) AS DOUBLE)
                       / count(*) AS cx
              FROM exploded GROUP BY label, i),
            cl AS (SELECT label, list(cx ORDER BY i) AS cv
                   FROM cent GROUP BY label),
            ev AS (SELECT vec_id, label, list(x ORDER BY i) AS v
                   FROM exploded GROUP BY vec_id, label),
            joined AS (
              SELECT e.vec_id, e.label,
                     list_dot_product(e.v, c.cv) AS dot,
                     sqrt(list_dot_product(e.v, e.v)) AS ne,
                     sqrt(list_dot_product(c.cv, c.cv)) AS nc
              FROM ev e JOIN cl c USING (label))
            SELECT vec_id, label,
                   round(CASE WHEN ne * nc > 0 THEN dot / (ne * nc) ELSE 0.0 END, 4)
                     AS cos_to_centroid
            FROM joined ORDER BY vec_id"""))

  // SRP-LSH bucketed ANN. Hyperplanes are md5-derived, so the oracle
  // recomputes the identical planes, signatures (list_dot_product matches
  // the expression's sequential summation), buckets, candidates, and ranks.
  // SimilaritySpec additionally checks recall against brute force.
  private val simLsh = Q(
    "sim_lsh_ann",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 8)
      Similarity.lshTopK(emb, queries, "vec_id", "embedding",
          dim = 64, k = 5, bits = 4, tables = 8)
        .withColumn("cos", round(col("cos"), 4))
        .orderBy(col("query_id"), col("rank"))
    },
    Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            planes AS (
              SELECT t, b, list(h ORDER BY d) AS plane
              FROM (SELECT t.t AS t, b.b AS b, d.d AS d,
                           ('0x' || substr(md5('graft-srp-' || (42 + t.t) || '-' || b.b || '-' || d.d), 1, 15))::BIGINT
                             / 576460752303423488.0 - 1.0 AS h
                    FROM range(0, 8) t(t), range(0, 4) b(b), range(0, 64) d(d)) raw
              GROUP BY t, b),
            sigs AS (
              SELECT e.vec_id, p.t,
                     SUM(CASE WHEN list_dot_product(e.v, p.plane) > 0
                              THEN (CAST(1 AS BIGINT) << p.b) ELSE 0 END) AS bucket
              FROM e, planes p GROUP BY e.vec_id, p.t),
            pairs AS (
              SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
              FROM sigs q JOIN sigs c ON q.t = c.t AND q.bucket = c.bucket
              WHERE q.vec_id < 8 AND q.vec_id <> c.vec_id),
            norm AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n FROM e),
            scored AS (
              SELECT p.query_id, p.neighbor_id,
                     list_dot_product(q.v, c.v) / (q.n * c.n) AS cos
              FROM pairs p
              JOIN norm q ON p.query_id = q.vec_id
              JOIN norm c ON p.neighbor_id = c.vec_id),
            ranked AS (
              SELECT query_id, neighbor_id, cos,
                     row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
              FROM scored)
            SELECT query_id, neighbor_id, round(cos, 4) AS cos, CAST(rank AS BIGINT) AS rank
            FROM ranked WHERE rank <= 5
            ORDER BY query_id, rank"""))

  // Multi-probe SRP-LSH (Lv et al., VLDB 2007): queries additionally
  // probe every Hamming-distance-1 bucket of their own signature —
  // recall approaching more hash tables from the SAME corpus-side index
  // (half the tables of sim_lsh_ann here, bucket fan-out on the tiny
  // query side only). The oracle replays the identical md5-derived
  // hyperplanes and generates the probe set with xor/shift arithmetic.
  private val simLshMultiprobe = Q(
    "sim_lsh_multiprobe",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 8)
      Similarity.lshTopK(emb, queries, "vec_id", "embedding",
          dim = 64, k = 5, bits = 4, tables = 4, probeHamming = 1)
        .withColumn("cos", round(col("cos"), 4))
        .orderBy(col("query_id"), col("rank"))
    },
    Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            planes AS (
              SELECT t, b, list(h ORDER BY d) AS plane
              FROM (SELECT t.t AS t, b.b AS b, d.d AS d,
                           ('0x' || substr(md5('graft-srp-' || (42 + t.t) || '-' || b.b || '-' || d.d), 1, 15))::BIGINT
                             / 576460752303423488.0 - 1.0 AS h
                    FROM range(0, 4) t(t), range(0, 4) b(b), range(0, 64) d(d)) raw
              GROUP BY t, b),
            sigs AS (
              SELECT e.vec_id, p.t,
                     SUM(CASE WHEN list_dot_product(e.v, p.plane) > 0
                              THEN (CAST(1 AS BIGINT) << p.b) ELSE 0 END) AS bucket
              FROM e, planes p GROUP BY e.vec_id, p.t),
            qprobes AS (
              SELECT vec_id, t,
                     CASE WHEN j.j = 0 THEN bucket
                          ELSE xor(bucket, CAST(1 AS BIGINT) << (j.j - 1)) END AS bucket
              FROM sigs, range(0, 5) j(j)
              WHERE vec_id < 8),
            pairs AS (
              SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
              FROM qprobes q JOIN sigs c ON q.t = c.t AND q.bucket = c.bucket
              WHERE q.vec_id <> c.vec_id),
            norm AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n FROM e),
            scored AS (
              SELECT p.query_id, p.neighbor_id,
                     list_dot_product(q.v, c.v) / (q.n * c.n) AS cos
              FROM pairs p
              JOIN norm q ON p.query_id = q.vec_id
              JOIN norm c ON p.neighbor_id = c.vec_id),
            ranked AS (
              SELECT query_id, neighbor_id, cos,
                     row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
              FROM scored)
            SELECT query_id, neighbor_id, round(cos, 4) AS cos, CAST(rank AS BIGINT) AS rank
            FROM ranked WHERE rank <= 5
            ORDER BY query_id, rank"""))

  // Query-DIRECTED multi-probe (Lv et al. §4.1 specialized to SRP): per
  // table, only the 2 lowest-|margin| bits flip — fan-out 3 buckets per
  // table instead of bits+1, keeping the probes a true neighbor most
  // plausibly fell into. The oracle replays the identical md5-derived
  // planes, ranks bits by (abs margin, bit) per (query, table), and
  // generates the probe set with the same xor arithmetic.
  private val simLshProbeDirected = Q(
    "sim_lsh_probe_directed",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 8)
      Similarity.lshTopK(emb, queries, "vec_id", "embedding",
          dim = 64, k = 5, bits = 6, tables = 4, probeHamming = 1,
          probeSeq = 2)
        .withColumn("cos", round(col("cos"), 4))
        .orderBy(col("query_id"), col("rank"))
    },
    Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            planes AS (
              SELECT t, b, list(h ORDER BY d) AS plane
              FROM (SELECT t.t AS t, b.b AS b, d.d AS d,
                           ('0x' || substr(md5('graft-srp-' || (42 + t.t) || '-' || b.b || '-' || d.d), 1, 15))::BIGINT
                             / 576460752303423488.0 - 1.0 AS h
                    FROM range(0, 4) t(t), range(0, 6) b(b), range(0, 64) d(d)) raw
              GROUP BY t, b),
            sigs AS (
              SELECT e.vec_id, p.t,
                     SUM(CASE WHEN list_dot_product(e.v, p.plane) > 0
                              THEN (CAST(1 AS BIGINT) << p.b) ELSE 0 END) AS bucket
              FROM e, planes p GROUP BY e.vec_id, p.t),
            flips AS (
              SELECT vec_id, t, b FROM (
                SELECT e.vec_id, p.t, p.b,
                       row_number() OVER (PARTITION BY e.vec_id, p.t
                         ORDER BY abs(list_dot_product(e.v, p.plane)), p.b) AS r
                FROM e, planes p WHERE e.vec_id < 8) m
              WHERE r <= 2),
            qprobes AS (
              SELECT vec_id, t, bucket FROM sigs WHERE vec_id < 8
              UNION ALL
              SELECT s.vec_id, s.t,
                     xor(s.bucket, CAST(1 AS BIGINT) << f.b) AS bucket
              FROM sigs s JOIN flips f ON s.vec_id = f.vec_id AND s.t = f.t),
            pairs AS (
              SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
              FROM qprobes q JOIN sigs c ON q.t = c.t AND q.bucket = c.bucket
              WHERE q.vec_id <> c.vec_id),
            norm AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n FROM e),
            scored AS (
              SELECT p.query_id, p.neighbor_id,
                     list_dot_product(q.v, c.v) / (q.n * c.n) AS cos
              FROM pairs p
              JOIN norm q ON p.query_id = q.vec_id
              JOIN norm c ON p.neighbor_id = c.vec_id),
            ranked AS (
              SELECT query_id, neighbor_id, cos,
                     row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
              FROM scored)
            SELECT query_id, neighbor_id, round(cos, 4) AS cos, CAST(rank AS BIGINT) AS rank
            FROM ranked WHERE rank <= 5
            ORDER BY query_id, rank"""))

  // ANN index-tuning report (VERDICT r8 #4): recall@5 of every index
  // variant against the brute-force truth on ONE shared query set —
  // 0-probe LSH, uniform Hamming-1 multi-probe, query-directed m=2
  // probing (all on the SAME bits=4/tables=4 index, so the probe policy
  // is the only variable), IVF, and PQ-ADC. Turns index tuning from
  // folklore into a number: the m=2 directed sequence keeps most of the
  // ball's recall gain at 3/5 of its probe fan-out. The oracle replays
  // every variant (md5 planes, xor probes, margin-ranked flips, IVF
  // assignment, the full two-subspace Lloyd recursion) and closes with
  // the same recall arithmetic.
  // Shared substructure (r12 VERDICT #5): the brute-force truth, ONE
  // k=32 IVF shortlist (nlist=16, nprobe=6), ONE k=32 m=8 ADC
  // shortlist, and the normalized corpus are each built ONCE per
  // (session, corpus) and pinned; the variants below slice them — the
  // top-5 of a k=32 ranked list IS the k=5 list (deterministic
  // (score, neighbor) tie order), so the report's output is
  // bit-identical to the per-variant rebuilds and the oracle is
  // unchanged. Before this, the truth executed twice in one plan
  // (recall join + total), the IVF index built twice (ivf_nprobe6 +
  // union) and the ADC scan ran three times (m8, rr32, union).
  private val recallSharedCache = new java.util.concurrent.ConcurrentHashMap[
    String, (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
      org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)]()

  private def cachedRecallShared(s: org.apache.spark.sql.SparkSession,
      dir: String) =
    recallSharedCache.computeIfAbsent(
      Tables.sessionKey(s) + "|" + dir,
      _ => {
        val emb = Tables.load(s, dir, "embeddings")
        val q = emb.filter(col("vec_id") < 8)
        val truth = graft.operators.Pinning.pin(
          Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
            .select(col("query_id"), col("neighbor_id")))
        val ivf32 = graft.operators.Pinning.pin(
          Similarity.ivfTopK(emb, q, "vec_id", "embedding",
              k = 32, nlist = 16, nprobe = 6)
            .select(col("query_id"), col("neighbor_id"), col("rank")))
        val adc32 = graft.operators.Pinning.pin(
          Similarity.pqAdcTopK(emb, q, "vec_id", "embedding",
              cachedPqModel(s, dir, m = 8), k = 32)
            .select(col("query_id"), col("neighbor_id"), col("rank")))
        val ne = graft.operators.Pinning.pin(normalizedVecs(emb))
        (truth, ivf32, adc32, ne)
      })

  private val simRecallReport = Q(
    "sim_recall_report",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
      val (truth, ivf32, adc32, ne) = cachedRecallShared(s, dir)
      def lsh(ph: Int, ps: Int) =
        Similarity.lshTopK(emb, q, "vec_id", "embedding", dim = 64, k = 5,
          bits = 4, tables = 4, probeHamming = ph, probeSeq = ps)
      val model = cachedPqModel(s, dir, m = 2)
      // (variant, index bits per corpus vector, top-k frame). Bits are
      // exact index-payload metadata — together with recall they ARE the
      // recall-vs-bytes curve a user tunes against: the three pq_adc
      // rows sweep PQ's code rate (m=2/4/8 subspaces × 3-bit codes), the
      // standard fix when low-rate ADC recall disappoints (m=2's 0.225
      // in r9 — more subspaces, not a different index).
      val variants = Seq(
        ("ivf_nprobe6", 4, ivf32.filter(col("rank") <= 5)),
        ("lsh_0probe", 16, lsh(0, 0)),
        ("lsh_directed_m2", 16, lsh(1, 2)),
        ("lsh_hamming1", 16, lsh(1, 0)),
        ("pq_adc", 6, Similarity.pqAdcTopK(emb, q, "vec_id", "embedding",
          model, k = 5)),
        ("pq_adc_m4", 12, Similarity.pqAdcTopK(emb, q, "vec_id",
          "embedding", cachedPqModel(s, dir, m = 4), k = 5)),
        ("pq_adc_m8", 24, adc32.filter(col("rank") <= 5)),
        ("pq_adc_m8n", 24, Similarity.pqAdcTopK(ne,
          ne.filter(col("vec_id") < 8), "vec_id",
          "embedding", cachedPqModelNorm(s, dir, m = 8), k = 5)),
        // ADC shortlist (R=32) + exact re-rank — the FAISS-refine second
        // stage: the compressed scan bounds the exact re-score to R
        // candidates per query, so the scan still streams 3-byte codes
        ("pq_adc_m8_rr32", 24, Similarity.rerankTopK(
          adc32.select(col("query_id"), col("neighbor_id")),
          emb, "vec_id", "embedding", k = 5)),
        ("ivfpq_nprobe6", 10, Similarity.ivfPqTopK(emb, q, "vec_id",
          "embedding", k = 5, nlist = 16, nprobe = 6, m = 2, dim = 64,
          kCodes = 8, iters = 2,
          trainedPq = Some(cachedIvfPqModel(s, dir, nlist = 16)))),
        // Multi-index union + refine (the r10 VERDICT's recall push): the
        // ADC shortlist and the IVF probe set fail on DIFFERENT vectors
        // (code-quantization error vs cell-boundary truncation), so the
        // union of two cheap 32-candidate shortlists re-ranked exactly
        // recovers what either misses alone — measured recall@5 1.00 here
        // vs 0.70 for pq_adc_m8_rr32, at 24 + 4 = 28 index bits/vec.
        // (The OPQ-style Hadamard×sign rotation was measured too and
        // HURT on this corpus — 0.40 vs 0.625 baseline — so the union,
        // not the rotation, is the shipped 11th variant.)
        ("union_adc32_ivf6_rr", 28, Similarity.rerankTopK(
          adc32.select(col("query_id"), col("neighbor_id"))
            .unionByName(ivf32.select(col("query_id"), col("neighbor_id")))
            .distinct(),
          emb, "vec_id", "embedding", k = 5)))
      val tagged = variants.map { case (n, bits, df) =>
        df.select(lit(n).as("variant"), lit(bits.toLong).as("bits_per_vec"),
          col("query_id"), col("neighbor_id"))
      }.reduce(_ unionByName _)
      val total = truth.agg(count(lit(1)).as("__total"))
      tagged
        .join(truth.withColumn("__hit", lit(1L)),
          Seq("query_id", "neighbor_id"), "left")
        .groupBy(col("variant"), col("bits_per_vec"))
        .agg(count(lit(1)).as("retrieved"),
          sum(coalesce(col("__hit"), lit(0L))).as("hits"))
        .crossJoin(broadcast(total))
        .select(col("variant"), col("bits_per_vec"), col("retrieved"),
          col("hits"),
          round(col("hits").cast("double") / col("__total"), 4).as("recall"))
        .orderBy(col("variant"))
    },
    Some(s"""WITH e AS MATERIALIZED (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            norm AS MATERIALIZED (
              SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n FROM e),
            truth AS MATERIALIZED (
              SELECT query_id, neighbor_id FROM (
                SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       row_number() OVER (PARTITION BY q.vec_id
                         ORDER BY list_dot_product(q.v, c.v) / (q.n * c.n) DESC,
                                  c.vec_id) AS rank
                FROM norm q JOIN norm c ON q.vec_id <> c.vec_id
                WHERE q.vec_id < 8) t WHERE rank <= 5),
            planes AS MATERIALIZED (
              SELECT t, b, list(h ORDER BY d) AS plane
              FROM (SELECT t.t AS t, b.b AS b, d.d AS d,
                           ('0x' || substr(md5('graft-srp-' || (42 + t.t) || '-' || b.b || '-' || d.d), 1, 15))::BIGINT
                             / 576460752303423488.0 - 1.0 AS h
                    FROM range(0, 4) t(t), range(0, 4) b(b), range(0, 64) d(d)) raw
              GROUP BY t, b),
            sigs AS MATERIALIZED (
              SELECT e.vec_id, p.t,
                     SUM(CASE WHEN list_dot_product(e.v, p.plane) > 0
                              THEN (CAST(1 AS BIGINT) << p.b) ELSE 0 END) AS bucket
              FROM e, planes p GROUP BY e.vec_id, p.t),
            p0 AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
                   FROM sigs q JOIN sigs c ON q.t = c.t AND q.bucket = c.bucket
                   WHERE q.vec_id < 8 AND q.vec_id <> c.vec_id),
            r0 AS (SELECT query_id, neighbor_id FROM (
                     SELECT p.query_id, p.neighbor_id,
                            row_number() OVER (PARTITION BY p.query_id
                              ORDER BY list_dot_product(q.v, c.v) / (q.n * c.n) DESC,
                                       p.neighbor_id) AS rank
                     FROM p0 p JOIN norm q ON p.query_id = q.vec_id
                               JOIN norm c ON p.neighbor_id = c.vec_id) t
                   WHERE rank <= 5),
            qb AS (SELECT vec_id, t,
                          CASE WHEN j.j = 0 THEN bucket
                               ELSE xor(bucket, CAST(1 AS BIGINT) << (j.j - 1)) END AS bucket
                   FROM sigs, range(0, 5) j(j) WHERE vec_id < 8),
            pb AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
                   FROM qb q JOIN sigs c ON q.t = c.t AND q.bucket = c.bucket
                   WHERE q.vec_id <> c.vec_id),
            rb AS (SELECT query_id, neighbor_id FROM (
                     SELECT p.query_id, p.neighbor_id,
                            row_number() OVER (PARTITION BY p.query_id
                              ORDER BY list_dot_product(q.v, c.v) / (q.n * c.n) DESC,
                                       p.neighbor_id) AS rank
                     FROM pb p JOIN norm q ON p.query_id = q.vec_id
                               JOIN norm c ON p.neighbor_id = c.vec_id) t
                   WHERE rank <= 5),
            flips AS (SELECT vec_id, t, b FROM (
                        SELECT e.vec_id, p.t, p.b,
                               row_number() OVER (PARTITION BY e.vec_id, p.t
                                 ORDER BY abs(list_dot_product(e.v, p.plane)), p.b) AS r
                        FROM e, planes p WHERE e.vec_id < 8) m
                      WHERE r <= 2),
            qd AS (SELECT vec_id, t, bucket FROM sigs WHERE vec_id < 8
                   UNION ALL
                   SELECT s.vec_id, s.t,
                          xor(s.bucket, CAST(1 AS BIGINT) << f.b) AS bucket
                   FROM sigs s JOIN flips f ON s.vec_id = f.vec_id AND s.t = f.t),
            pd AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
                   FROM qd q JOIN sigs c ON q.t = c.t AND q.bucket = c.bucket
                   WHERE q.vec_id <> c.vec_id),
            rd AS (SELECT query_id, neighbor_id FROM (
                     SELECT p.query_id, p.neighbor_id,
                            row_number() OVER (PARTITION BY p.query_id
                              ORDER BY list_dot_product(q.v, c.v) / (q.n * c.n) DESC,
                                       p.neighbor_id) AS rank
                     FROM pd p JOIN norm q ON p.query_id = q.vec_id
                               JOIN norm c ON p.neighbor_id = c.vec_id) t
                   WHERE rank <= 5),
            cent AS (SELECT row_number() OVER (ORDER BY vec_id) AS list_id, v AS cvec
                     FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 16) t),
            assign_all AS MATERIALIZED (
              SELECT nm.vec_id, nm.v, nm.n, c.list_id,
                     list_dot_product(nm.v, c.cvec)
                       / (nm.n * sqrt(list_dot_product(c.cvec, c.cvec))) AS cd
              FROM norm nm, cent c),
            corpus_assigned AS (
              SELECT vec_id AS neighbor_id, v AS cv, n AS cn, list_id FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cd DESC, list_id) AS r
                FROM assign_all) t WHERE r = 1),
            probes AS (
              SELECT vec_id AS query_id, v AS qv, n AS qn, list_id FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cd DESC, list_id) AS r
                FROM assign_all WHERE vec_id < 8) t WHERE r <= 6),
            ri AS (SELECT query_id, neighbor_id FROM (
                     SELECT p.query_id, a.neighbor_id,
                            row_number() OVER (PARTITION BY p.query_id
                              ORDER BY list_dot_product(p.qv, a.cv) / (p.qn * a.cn) DESC,
                                       a.neighbor_id) AS rank
                     FROM probes p JOIN corpus_assigned a USING (list_id)
                     WHERE p.query_id <> a.neighbor_id) t
                   WHERE rank <= 5),
            eres AS MATERIALIZED (
              SELECT a.neighbor_id AS vec_id, a.list_id,
                     list_transform(range(1, 65), i -> a.cv[i] - c.cvec[i]) AS v
              FROM corpus_assigned a JOIN cent c USING (list_id)),
            ${pqLloydCte("r1", 1, 32, base = "eres")},
            ${pqLloydCte("r2", 33, 64, base = "eres")},
            qres AS MATERIALIZED (
              SELECT p.query_id, p.list_id,
                     list_transform(range(1, 65), i -> p.qv[i] - c.cvec[i]) AS qr
              FROM probes p JOIN cent c USING (list_id)),
            lutq_r1 AS (
              SELECT q.query_id, q.list_id, cb.list_id AS code,
                     list_sum(list_transform(range(1, 33), i ->
                       (q.qr[i] - cb.cvec[i]) * (q.qr[i] - cb.cvec[i]))) AS d2
              FROM qres q, c2_r1 cb),
            lutq_r2 AS (
              SELECT q.query_id, q.list_id, cb.list_id AS code,
                     list_sum(list_transform(range(1, 33), i ->
                       (q.qr[32 + i] - cb.cvec[i])
                         * (q.qr[32 + i] - cb.cvec[i]))) AS d2
              FROM qres q, c2_r2 cb),
            rq AS (SELECT query_id, neighbor_id FROM (
                     SELECT l1.query_id, cd.vec_id AS neighbor_id,
                            row_number() OVER (PARTITION BY l1.query_id
                              ORDER BY l1.d2 + l2.d2, cd.vec_id) AS rank
                     FROM (SELECT r.vec_id, r.list_id,
                                  c1.list_id AS code1, c2.list_id AS code2
                           FROM eres r JOIN code_r1 c1 USING (vec_id)
                                       JOIN code_r2 c2 USING (vec_id)) cd
                     JOIN lutq_r1 l1 ON l1.list_id = cd.list_id
                                    AND l1.code = cd.code1
                     JOIN lutq_r2 l2 ON l2.query_id = l1.query_id
                                    AND l2.list_id = cd.list_id
                                    AND l2.code = cd.code2
                     WHERE cd.vec_id <> l1.query_id) t
                   WHERE rank <= 5),
            ${pqLloydCte("s1", 1, 32)},
            ${pqLloydCte("s2", 33, 64)},
            ${pqRankSql("rp", Seq("s1", "s2"))},
            ${(1 to 4).map(i => pqLloydCte(s"t$i", 1 + 16 * (i - 1), 16 * i))
              .mkString(",\n            ")},
            ${pqRankSql("rp4", (1 to 4).map("t" + _))},
            ${(1 to 8).map(i => pqLloydCte(s"u$i", 1 + 8 * (i - 1), 8 * i))
              .mkString(",\n            ")},
            ${pqRankSql("rp8", (1 to 8).map("u" + _))},
            en AS MATERIALIZED (
              SELECT vec_id,
                     list_transform(v,
                       x -> x / sqrt(list_dot_product(v, v))) AS v
              FROM e),
            ${(1 to 8).map(i =>
                pqLloydCte(s"w$i", 1 + 8 * (i - 1), 8 * i, base = "en"))
              .mkString(",\n            ")},
            ${pqRankSql("rp8n", (1 to 8).map("w" + _))},
            ${pqRankSql("short8", (1 to 8).map("u" + _), k = 32)},
            rr8 AS (SELECT query_id, neighbor_id FROM (
                      SELECT s.query_id, s.neighbor_id,
                             row_number() OVER (PARTITION BY s.query_id
                               ORDER BY list_dot_product(q.v, c.v) / (q.n * c.n) DESC,
                                        s.neighbor_id) AS rank
                      FROM short8 s
                      JOIN norm q ON s.query_id = q.vec_id
                      JOIN norm c ON s.neighbor_id = c.vec_id) t
                    WHERE rank <= 5),
            ri32 AS (SELECT query_id, neighbor_id FROM (
                       SELECT p.query_id, a.neighbor_id,
                              row_number() OVER (PARTITION BY p.query_id
                                ORDER BY list_dot_product(p.qv, a.cv) / (p.qn * a.cn) DESC,
                                         a.neighbor_id) AS rank
                       FROM probes p JOIN corpus_assigned a USING (list_id)
                       WHERE p.query_id <> a.neighbor_id) t
                     WHERE rank <= 32),
            ushort AS (SELECT query_id, neighbor_id FROM short8
                       UNION
                       SELECT query_id, neighbor_id FROM ri32),
            ru AS (SELECT query_id, neighbor_id FROM (
                     SELECT s.query_id, s.neighbor_id,
                            row_number() OVER (PARTITION BY s.query_id
                              ORDER BY list_dot_product(q.v, c.v) / (q.n * c.n) DESC,
                                       s.neighbor_id) AS rank
                     FROM ushort s
                     JOIN norm q ON s.query_id = q.vec_id
                     JOIN norm c ON s.neighbor_id = c.vec_id) t
                   WHERE rank <= 5),
            allv AS (
              SELECT 'ivf_nprobe6' AS variant, query_id, neighbor_id FROM ri
              UNION ALL
              SELECT 'lsh_0probe', query_id, neighbor_id FROM r0
              UNION ALL
              SELECT 'lsh_directed_m2', query_id, neighbor_id FROM rd
              UNION ALL
              SELECT 'lsh_hamming1', query_id, neighbor_id FROM rb
              UNION ALL
              SELECT 'pq_adc', query_id, neighbor_id FROM rp
              UNION ALL
              SELECT 'pq_adc_m4', query_id, neighbor_id FROM rp4
              UNION ALL
              SELECT 'pq_adc_m8', query_id, neighbor_id FROM rp8
              UNION ALL
              SELECT 'pq_adc_m8n', query_id, neighbor_id FROM rp8n
              UNION ALL
              SELECT 'pq_adc_m8_rr32', query_id, neighbor_id FROM rr8
              UNION ALL
              SELECT 'ivfpq_nprobe6', query_id, neighbor_id FROM rq
              UNION ALL
              SELECT 'union_adc32_ivf6_rr', query_id, neighbor_id FROM ru),
            bits AS (
              SELECT * FROM (VALUES
                ('ivf_nprobe6', 4), ('lsh_0probe', 16),
                ('lsh_directed_m2', 16), ('lsh_hamming1', 16),
                ('pq_adc', 6), ('pq_adc_m4', 12), ('pq_adc_m8', 24),
                ('pq_adc_m8n', 24), ('pq_adc_m8_rr32', 24),
                ('ivfpq_nprobe6', 10),
                ('union_adc32_ivf6_rr', 28)) AS t(variant, bits_per_vec))
            SELECT a.variant, CAST(b.bits_per_vec AS BIGINT) AS bits_per_vec,
                   CAST(count(*) AS BIGINT) AS retrieved,
                   CAST(count(t.query_id) AS BIGINT) AS hits,
                   round(CAST(count(t.query_id) AS DOUBLE)
                     / (SELECT count(*) FROM truth), 4) AS recall
            FROM allv a
            JOIN bits b ON a.variant = b.variant
            LEFT JOIN truth t
              ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
            GROUP BY a.variant, b.bits_per_vec
            ORDER BY a.variant"""))

  // IVF-bucketed ANN (the inverted-file scale path). Centroids are the
  // first nlist corpus vectors by id — fully deterministic, so the oracle
  // replays assignment, probing, scoring, and ranking exactly.
  // SimilaritySpec additionally checks recall. The oracle is SHARED with
  // sim_ivf_persisted: the persisted index round-trips bit-exactly, so
  // the same replay oracles both the in-session and the served path.
  private val ivfAnnOracleSql =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            cent AS (
              SELECT row_number() OVER (ORDER BY vec_id) AS list_id, v AS cvec
              FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 16) t),
            norm AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n FROM e),
            assign_all AS (
              SELECT nm.vec_id, nm.v, nm.n, c.list_id,
                     list_dot_product(nm.v, c.cvec)
                       / (nm.n * sqrt(list_dot_product(c.cvec, c.cvec))) AS cd
              FROM norm nm, cent c),
            corpus_assigned AS (
              SELECT vec_id AS neighbor_id, v AS cv, n AS cn, list_id FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cd DESC, list_id) AS r
                FROM assign_all) t WHERE r = 1),
            probes AS (
              SELECT vec_id AS query_id, v AS qv, n AS qn, list_id FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cd DESC, list_id) AS r
                FROM assign_all WHERE vec_id < 8) t WHERE r <= 6),
            scored AS (
              SELECT p.query_id, a.neighbor_id,
                     list_dot_product(p.qv, a.cv) / (p.qn * a.cn) AS cos
              FROM probes p JOIN corpus_assigned a USING (list_id)
              WHERE p.query_id <> a.neighbor_id),
            ranked AS (
              SELECT query_id, neighbor_id, cos,
                     row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
              FROM scored)
            SELECT query_id, neighbor_id, round(cos, 4) AS cos, CAST(rank AS BIGINT) AS rank
            FROM ranked WHERE rank <= 5
            ORDER BY query_id, rank"""

  private val simIvf = Q(
    "sim_ivf_ann",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 8)
      Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
          k = 5, nlist = 16, nprobe = 6)
        .withColumn("cos", round(col("cos"), 4))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(ivfAnnOracleSql))

  // Build-once / serve-forever: the same IVF index PERSISTED as two
  // parquet tables under one versioned pointer (pipeline/IndexStore) and
  // queried back through the identical scoring kernel — the per-session
  // serving cost is two parquet reads, zero corpus access, zero index
  // build. Bit-exact round trip means the oracle is sim_ivf_ann's own
  // replay, unchanged; the session memo mirrors a production session
  // holding one served index.
  private val ivfStoreCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def cachedIvfStore(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    ivfStoreCache.computeIfAbsent(
      Tables.sessionKey(s) + "|" + dir,
      _ => {
        val p = java.nio.file.Files.createTempDirectory("graft-ivfidx")
          .toString + "/ivf"
        graft.pipeline.IndexStore.saveIvf(
          Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
          nlist = 16, livePath = p)
        p
      })

  private val simIvfPersisted = Q(
    "sim_ivf_persisted",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      graft.pipeline.IndexStore.queryIvf(s, cachedIvfStore(s, dir),
          emb.filter(col("vec_id") < 8), "vec_id", "embedding",
          k = 5, nprobe = 6)
        .withColumn("cos", round(col("cos"), 4))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(ivfAnnOracleSql))

  // Embedding-cosine near-dup pairs (dedup family) on a bounded subset,
  // exact — DuckDB replicates with list_cosine_similarity.
  private val dedupEmbedding = Q(
    "dedup_embedding_cosine",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings").filter(col("vec_id") < 300)
      Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.8)
        .withColumn("cos", round(col("cos"), 4))
        .orderBy(col("id1"), col("id2"))
    },
    Some("""SELECT a.vec_id AS id1, b.vec_id AS id2,
                   round(list_cosine_similarity(a.embedding::DOUBLE[],
                                                b.embedding::DOUBLE[]), 4) AS cos
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE a.vec_id < 300 AND b.vec_id < 300
              AND list_cosine_similarity(a.embedding::DOUBLE[],
                                         b.embedding::DOUBLE[]) >= 0.8
            ORDER BY id1, id2"""))

  // LSH-bucketed embedding near-dup — the 100 TB composition the exact
  // form above is scoped away from: SRP buckets generate candidate id
  // pairs, exact cosine verifies. The oracle replays the md5-derived
  // hyperplanes, so the bucketing (and therefore recall) is reproduced
  // exactly.
  private val dedupLshCosine = Q(
    "dedup_lsh_cosine",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      Similarity.lshNearDupPairs(emb, "vec_id", "embedding",
          dim = 64, minCos = 0.35, bits = 4, tables = 8)
        .withColumn("cos", round(col("cos"), 4))
        .orderBy(col("id1"), col("id2"))
    },
    Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            planes AS (
              SELECT t, b, list(h ORDER BY d) AS plane
              FROM (SELECT t.t AS t, b.b AS b, d.d AS d,
                           ('0x' || substr(md5('graft-srp-' || (42 + t.t) || '-' || b.b || '-' || d.d), 1, 15))::BIGINT
                             / 576460752303423488.0 - 1.0 AS h
                    FROM range(0, 8) t(t), range(0, 4) b(b), range(0, 64) d(d)) raw
              GROUP BY t, b),
            sigs AS (
              SELECT e.vec_id, p.t,
                     SUM(CASE WHEN list_dot_product(e.v, p.plane) > 0
                              THEN (CAST(1 AS BIGINT) << p.b) ELSE 0 END) AS bucket
              FROM e, planes p GROUP BY e.vec_id, p.t),
            pairs AS (
              SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
              FROM sigs a JOIN sigs b ON a.t = b.t AND a.bucket = b.bucket
              WHERE a.vec_id < b.vec_id),
            norm AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n FROM e)
            SELECT p.id1, p.id2,
                   round(list_dot_product(a.v, b.v) / (a.n * b.n), 4) AS cos
            FROM pairs p
            JOIN norm a ON p.id1 = a.vec_id
            JOIN norm b ON p.id2 = b.vec_id
            WHERE list_dot_product(a.v, b.v) / (a.n * b.n) >= 0.35
            ORDER BY id1, id2"""))

  // SemDedup: coarse IVF cells → intra-cell cosine only; drop a vector iff
  // a lower-id cell-mate is at cos >= tau. The oracle replays the exact
  // cell assignment (deterministic centroids) and keep/drop rule, so the
  // kept set — not just counts — is verified.
  private val dedupSemantic = Q(
    "dedup_semantic",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      Similarity.semDedup(emb, "vec_id", "embedding", tau = 0.3, nlist = 16)
        .withColumn("dup_cos", round(col("dup_cos"), 4))
        .withColumn("list_id", col("list_id").cast("long"))
        .orderBy(col("vec_id"))
    },
    Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            cent AS (
              SELECT row_number() OVER (ORDER BY vec_id) AS list_id, v AS cvec
              FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 16) t),
            norm AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n FROM e),
            assigned AS (
              SELECT vec_id, v, n, list_id FROM (
                SELECT nm.vec_id, nm.v, nm.n, c.list_id,
                       row_number() OVER (
                         PARTITION BY nm.vec_id
                         ORDER BY list_dot_product(nm.v, c.cvec)
                                    / (nm.n * sqrt(list_dot_product(c.cvec, c.cvec))) DESC,
                                  c.list_id) AS r
                FROM norm nm, cent c) t WHERE r = 1),
            pairs AS (
              SELECT a.vec_id AS id1, b.vec_id AS id2,
                     list_dot_product(a.v, b.v) / (a.n * b.n) AS cos
              FROM assigned a JOIN assigned b USING (list_id)
              WHERE a.vec_id < b.vec_id),
            dups AS (
              SELECT id2, dup_of, dup_cos FROM (
                SELECT id2, id1 AS dup_of, cos AS dup_cos,
                       row_number() OVER (PARTITION BY id2 ORDER BY id1) AS r
                FROM pairs WHERE cos >= 0.3) t WHERE r = 1)
            SELECT a.vec_id, CAST(a.list_id AS BIGINT) AS list_id,
                   d.dup_of IS NULL AS keep, d.dup_of,
                   round(d.dup_cos, 4) AS dup_cos
            FROM assigned a LEFT JOIN dups d ON d.id2 = a.vec_id
            ORDER BY a.vec_id"""))

  // Embedding hygiene: the corpus is clean, so degenerate vectors are
  // INJECTED deterministically (vec_id % 97 = 0 zeroed) and the filter
  // must find exactly those. Norm² quantized to bp per row before the
  // integer rollup (never sum raw doubles across engines).
  private val embedNormFilter = Q(
    "embed_norm_filter",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val zeroed = emb.select(col("vec_id"), col("label"),
        when(pmod(col("vec_id"), lit(97)) === 0,
            transform(col("embedding"), _ => lit(0.0f)))
          .otherwise(col("embedding")).as("embedding"))
      Similarity.normFilter(zeroed, "embedding", dim = 64)
        .select(col("label"), col("keep"), col("dim_ok"),
          col("n_nonfinite"),
          round(col("norm2") * 10000).cast("long").as("norm2_bp"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"),
          count(when(!col("keep"), 1)).as("n_dropped"),
          count(when(!col("dim_ok") || col("n_nonfinite") > 0, 1))
            .as("n_malformed"),
          sum(when(col("keep"), col("norm2_bp"))).as("kept_norm2_bp_sum"))
        .orderBy(col("label"))
    },
    Some("""WITH z AS (
              SELECT vec_id, label,
                     CASE WHEN vec_id % 97 = 0
                          THEN list_transform(embedding, x -> CAST(0.0 AS FLOAT))
                          ELSE embedding END AS e
              FROM embeddings),
            v AS (
              SELECT vec_id, label,
                     len(e) = 64 AS dim_ok,
                     CAST(len(list_filter(e, x -> isnan(x) OR isinf(x)))
                          AS BIGINT) AS n_nonfinite,
                     list_dot_product(list_transform(e, x -> CAST(x AS DOUBLE)),
                                      list_transform(e, x -> CAST(x AS DOUBLE)))
                       AS norm2
              FROM z),
            k AS (
              SELECT label,
                     dim_ok AND n_nonfinite = 0 AND norm2 > 0.0 AS keep,
                     dim_ok, n_nonfinite,
                     CAST(round(norm2 * 10000) AS BIGINT) AS norm2_bp
              FROM v)
            SELECT label, count(1) AS n_vecs,
                   count(CASE WHEN NOT keep THEN 1 END) AS n_dropped,
                   count(CASE WHEN NOT dim_ok OR n_nonfinite > 0 THEN 1 END)
                     AS n_malformed,
                   CAST(sum(CASE WHEN keep THEN norm2_bp END) AS BIGINT)
                     AS kept_norm2_bp_sum
            FROM k GROUP BY label ORDER BY label"""))

  // Mutual-kNN graph (IVF path, every vector both query and corpus side):
  // the full pipeline — centroid pick, cell assign, probe, rank, mutual
  // self-join — replays in the oracle.
  // One NN-descent refinement round over the IVF seed graph (same seed
  // parameters as sim_mutual_knn, so the oracle's seed replay is shared
  // verbatim): neighbors-of-neighbors candidates in both directions,
  // exact re-score, bounded top-k. Ids-only shuffles until the one
  // vector re-attach; the oracle replays seed + refinement end to end.
  // The IVF seed graph (k=5, nlist=32, nprobe=3) is shared by the single
  // refinement round AND the convergence build — memoize the materialized
  // edge list per (session, corpus) like knnGraphCache, so the two
  // queries (and repeated invocations) pay for ONE seed sweep.
  private val ivfSeedCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.DataFrame]()

  private def cachedIvfSeed(
      s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    ivfSeedCache.entrySet.removeIf(
      _.getValue.sparkSession.sparkContext.isStopped)
    ivfSeedCache.computeIfAbsent(
      graft.Tables.sessionKey(s) + "|" + dir,
      _ => Similarity.ivfTopK(
          Tables.load(s, dir, "embeddings"),
          Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding", k = 5, nlist = Similarity.AutoNlist,
          nprobe = 3)
        .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
        .transform(graft.operators.Pinning.pin))
  }

  private val simNnDescent = Q(
    "sim_nn_descent",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      Similarity.nnDescentRound(emb, "vec_id", "embedding",
          k = 5, nlist = Similarity.AutoNlist, nprobe = 3,
          seed = Some(cachedIvfSeed(s, dir)))
        .withColumn("cos", round(col("cos"), 4))
        .orderBy(col("query_id"), col("rank"))
    },
    Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            cent AS (
              SELECT list_id, cvec FROM (
                SELECT row_number() OVER (ORDER BY vec_id) AS list_id,
                       greatest(32, count(*) OVER () // 64) AS nl, v AS cvec
                FROM e) t
              WHERE list_id <= nl),
            norm AS MATERIALIZED (
              SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n FROM e),
            assign_all AS (
              SELECT nm.vec_id, nm.v, nm.n, c.list_id,
                     list_dot_product(nm.v, c.cvec)
                       / (nm.n * sqrt(list_dot_product(c.cvec, c.cvec))) AS cd
              FROM norm nm, cent c),
            corpus_assigned AS (
              SELECT vec_id AS neighbor_id, v AS cv, n AS cn, list_id FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cd DESC, list_id) AS r
                FROM assign_all) t WHERE r = 1),
            probes AS (
              SELECT vec_id AS query_id, v AS qv, n AS qn, list_id FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cd DESC, list_id) AS r
                FROM assign_all) t WHERE r <= 3),
            scored AS (
              SELECT p.query_id, a.neighbor_id,
                     list_dot_product(p.qv, a.cv) / (p.qn * a.cn) AS cos
              FROM probes p JOIN corpus_assigned a USING (list_id)
              WHERE p.query_id <> a.neighbor_id),
            knn AS MATERIALIZED (
              SELECT query_id, neighbor_id FROM (
                SELECT query_id, neighbor_id,
                       row_number() OVER (PARTITION BY query_id
                         ORDER BY cos DESC, neighbor_id) AS rank
                FROM scored) t WHERE rank <= 5),
            und AS MATERIALIZED (
              SELECT query_id, neighbor_id FROM knn
              UNION
              SELECT neighbor_id, query_id FROM knn),
            cand AS MATERIALIZED (
              SELECT query_id, neighbor_id FROM knn
              UNION
              SELECT u.query_id, w.neighbor_id
              FROM und u JOIN und w ON u.neighbor_id = w.query_id
              WHERE u.query_id <> w.neighbor_id),
            resc AS (
              SELECT c.query_id, c.neighbor_id,
                     list_dot_product(q.v, nb.v) / (q.n * nb.n) AS cos
              FROM cand c JOIN norm q ON c.query_id = q.vec_id
                          JOIN norm nb ON c.neighbor_id = nb.vec_id),
            rr AS (
              SELECT query_id, neighbor_id, cos,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY cos DESC, neighbor_id) AS rank
              FROM resc)
            SELECT query_id, neighbor_id, round(cos, 4) AS cos,
                   CAST(rank AS BIGINT) AS rank
            FROM rr WHERE rank <= 5
            ORDER BY query_id, rank"""))

  // NN-descent run TO CONVERGENCE (the Dong et al. BUILD loop, vs the
  // single refine round above): the engine iterates until a round admits
  // zero new top-k entries — the exact fixed point, where a further round
  // provably changes nothing. The oracle unrolls ORACLE_ROUNDS rounds of
  // the identical refinement as generated CTEs; because rounds past the
  // fixed point are no-ops, any unroll depth >= the engine's stopping
  // round replays the same lists — the unroll depth is a safety margin,
  // not a tuned constant (the engine's cap is higher; a corpus that
  // genuinely needed more rounds would surface as a hash mismatch, not a
  // silent truncation).
  private val simNnDescentConverged = Q(
    "sim_nn_descent_converged",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      Similarity.nnDescent(emb, "vec_id", "embedding",
          k = 5, nlist = Similarity.AutoNlist, nprobe = 3, maxRounds = 12,
          delta = 0.0, seed = Some(cachedIvfSeed(s, dir)))
        .withColumn("cos", round(col("cos"), 4))
        .orderBy(col("query_id"), col("rank"))
    },
    Some {
      val oracleRounds = 8
      val seed = """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            cent AS (
              SELECT list_id, cvec FROM (
                SELECT row_number() OVER (ORDER BY vec_id) AS list_id,
                       greatest(32, count(*) OVER () // 64) AS nl, v AS cvec
                FROM e) t
              WHERE list_id <= nl),
            norm AS MATERIALIZED (
              SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n FROM e),
            assign_all AS (
              SELECT nm.vec_id, nm.v, nm.n, c.list_id,
                     list_dot_product(nm.v, c.cvec)
                       / (nm.n * sqrt(list_dot_product(c.cvec, c.cvec))) AS cd
              FROM norm nm, cent c),
            corpus_assigned AS (
              SELECT vec_id AS neighbor_id, v AS cv, n AS cn, list_id FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cd DESC, list_id) AS r
                FROM assign_all) t WHERE r = 1),
            probes AS (
              SELECT vec_id AS query_id, v AS qv, n AS qn, list_id FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cd DESC, list_id) AS r
                FROM assign_all) t WHERE r <= 3),
            scored AS (
              SELECT p.query_id, a.neighbor_id,
                     list_dot_product(p.qv, a.cv) / (p.qn * a.cn) AS cos
              FROM probes p JOIN corpus_assigned a USING (list_id)
              WHERE p.query_id <> a.neighbor_id),
            knn0 AS MATERIALIZED (
              SELECT query_id, neighbor_id FROM (
                SELECT query_id, neighbor_id,
                       row_number() OVER (PARTITION BY query_id
                         ORDER BY cos DESC, neighbor_id) AS rank
                FROM scored) t WHERE rank <= 5)"""
      val rounds = (1 to oracleRounds).map { r =>
        val prev = s"knn${r - 1}"
        s""",
            und$r AS MATERIALIZED (
              SELECT query_id, neighbor_id FROM $prev
              UNION
              SELECT neighbor_id, query_id FROM $prev),
            cand$r AS MATERIALIZED (
              SELECT query_id, neighbor_id FROM $prev
              UNION
              SELECT u.query_id, w.neighbor_id
              FROM und$r u JOIN und$r w ON u.neighbor_id = w.query_id
              WHERE u.query_id <> w.neighbor_id),
            knn$r AS MATERIALIZED (
              SELECT query_id, neighbor_id, cos, rank FROM (
                SELECT c.query_id, c.neighbor_id,
                       list_dot_product(q.v, nb.v) / (q.n * nb.n) AS cos,
                       row_number() OVER (PARTITION BY c.query_id
                         ORDER BY list_dot_product(q.v, nb.v) / (q.n * nb.n)
                           DESC, c.neighbor_id) AS rank
                FROM cand$r c JOIN norm q ON c.query_id = q.vec_id
                              JOIN norm nb ON c.neighbor_id = nb.vec_id) t
              WHERE rank <= 5)"""
      }.mkString
      seed + rounds + s"""
            SELECT query_id, neighbor_id, round(cos, 4) AS cos,
                   CAST(rank AS BIGINT) AS rank
            FROM knn$oracleRounds
            ORDER BY query_id, rank"""
    })

  // The mutual-kNN graph is a pure function of (corpus, k, nlist, nprobe)
  // — memoize the materialized edge list per session (the
  // Profiles.cachedWarehouse posture), so the graph query and every
  // graph-consuming operator (label propagation here; any future
  // community/metric op) share ONE build instead of re-running the IVF
  // probe + mutuality join each.
  private val knnGraphCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.DataFrame]()

  private def cachedMutualKnn(
      s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    knnGraphCache.computeIfAbsent(Tables.sessionKey(s) + "|" + dir + "|5|auto|3",
      _ => graft.operators.Pinning.pin(
        Similarity.mutualKnnGraph(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding", k = 5, nlist = Similarity.AutoNlist,
          nprobe = 3)))

  // Connected components over the mutual-kNN graph — the canonical
  // near-dup CLUSTER id (component = min member id, the same labeling the
  // adaptive union-find/min-label operator guarantees at any scale). The
  // oracle replays the graph CTE and closes it with a recursive
  // reachability CTE: lab-set of a node = everything reachable in the
  // symmetrized graph, component = min of that set — identical by
  // definition on an undirected graph.
  private val simComponents = Q(
    "sim_components",
    (s, dir) => {
      val g = cachedMutualKnn(s, dir)
        .select(col("id1").as("src"), col("id2").as("dst"))
      graft.operators.Clustering.connectedComponents(g)
        .select(col("node").as("vec_id"), col("component"))
        .orderBy(col("vec_id"))
    },
    Some(s"""WITH RECURSIVE $mutualKnnCteSql,
            sym AS MATERIALIZED (
              SELECT id1 AS src, id2 AS dst FROM mpairs
              UNION
              SELECT id2 AS src, id1 AS dst FROM mpairs),
            reach AS (
              SELECT src AS node, src AS lab FROM sym
              UNION
              SELECT r.node, s.dst AS lab
              FROM reach r JOIN sym s ON r.lab = s.src)
            SELECT node AS vec_id, min(lab) AS component
            FROM reach GROUP BY node ORDER BY vec_id"""))

  private val simMutualKnn = Q(
    "sim_mutual_knn",
    (s, dir) => {
      cachedMutualKnn(s, dir)
        .withColumn("cos", round(col("cos"), 4))
        .orderBy(col("id1"), col("id2"))
    },
    Some(s"""WITH $mutualKnnCteSql
            SELECT id1, id2, round(cos, 4) AS cos,
                   CAST(rank1 AS BIGINT) AS rank1,
                   CAST(rank2 AS BIGINT) AS rank2
            FROM mpairs
            ORDER BY id1, id2"""))

  // shared oracle fragment: the mutual-kNN graph (IVF probe + bounded
  // top-k + mutuality join), ending in mpairs(id1 < id2, cos, rank1,
  // rank2) — used by sim_mutual_knn and the label-propagation query below
  private def mutualKnnCteSql =
    """e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            cent AS (
              SELECT list_id, cvec FROM (
                SELECT row_number() OVER (ORDER BY vec_id) AS list_id,
                       greatest(32, count(*) OVER () // 64) AS nl, v AS cvec
                FROM e) t
              WHERE list_id <= nl),
            norm AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n FROM e),
            assign_all AS (
              SELECT nm.vec_id, nm.v, nm.n, c.list_id,
                     list_dot_product(nm.v, c.cvec)
                       / (nm.n * sqrt(list_dot_product(c.cvec, c.cvec))) AS cd
              FROM norm nm, cent c),
            corpus_assigned AS (
              SELECT vec_id AS neighbor_id, v AS cv, n AS cn, list_id FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cd DESC, list_id) AS r
                FROM assign_all) t WHERE r = 1),
            probes AS (
              SELECT vec_id AS query_id, v AS qv, n AS qn, list_id FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cd DESC, list_id) AS r
                FROM assign_all) t WHERE r <= 3),
            scored AS (
              SELECT p.query_id, a.neighbor_id,
                     list_dot_product(p.qv, a.cv) / (p.qn * a.cn) AS cos
              FROM probes p JOIN corpus_assigned a USING (list_id)
              WHERE p.query_id <> a.neighbor_id),
            ranked AS (
              SELECT query_id, neighbor_id, cos,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY cos DESC, neighbor_id) AS rank
              FROM scored),
            knn AS (SELECT query_id, neighbor_id, cos, rank
                    FROM ranked WHERE rank <= 5),
            mpairs AS (
              SELECT a.query_id AS id1, a.neighbor_id AS id2, a.cos,
                     a.rank AS rank1, b.rank AS rank2
              FROM knn a JOIN knn b
                ON a.query_id = b.neighbor_id AND a.neighbor_id = b.query_id
              WHERE a.query_id < a.neighbor_id)"""

  // Community detection over the mutual-kNN graph: 3 synchronous label-
  // propagation rounds (most-frequent neighbor label, ties to the
  // smallest) — the cluster step of SemDeDup-style semantic curation,
  // deterministic by construction so the oracle replays every round as a
  // grouped-argmax CTE. Each Spark round is an ids-only equi join + two
  // map-side-combinable aggregations; no windows, no vectors shuffled.
  private def lpaRoundSql(prev: String, r: Int): String =
    s"""rc$r AS (SELECT e.dst, l.label, count(1) AS cnt
              FROM edges e JOIN $prev l ON e.src = l.id
              GROUP BY e.dst, l.label),
            r$r AS (SELECT dst AS id, label FROM (
              SELECT dst, label, row_number() OVER (PARTITION BY dst
                ORDER BY cnt DESC, label) AS rn FROM rc$r) t
              WHERE rn = 1)"""

  private val simLabelProp = Q(
    "sim_label_prop",
    (s, dir) => {
      Similarity.labelPropagate(cachedMutualKnn(s, dir), "id1", "id2",
          rounds = 3)
        .select(col("id").as("vec_id"), col("label").as("community"))
        .orderBy(col("vec_id"))
    },
    Some(s"""WITH $mutualKnnCteSql,
            edges AS (SELECT id1 AS src, id2 AS dst FROM mpairs
                      UNION ALL SELECT id2 AS src, id1 AS dst FROM mpairs),
            l0 AS (SELECT DISTINCT src AS id, src AS label FROM edges),
            ${lpaRoundSql("l0", 1)},
            ${lpaRoundSql("r1", 2)},
            ${lpaRoundSql("r2", 3)}
            SELECT id AS vec_id, label AS community
            FROM r3 ORDER BY vec_id"""))

  // One synchronous h-index round over the similarity graph: each vertex's
  // value becomes the h-index of its neighbors' values (row_number over the
  // descending neighbor values, h = max(least(rn, h)))
  private def hIndexRoundSql(prev: String, r: Int): String =
    s"""nbr$r AS (SELECT s.dst, p.h,
                   row_number() OVER (PARTITION BY s.dst
                     ORDER BY p.h DESC) AS rn
              FROM sym s JOIN $prev p ON s.src = p.id),
            hr$r AS (SELECT dst AS id, CAST(max(least(rn, h)) AS BIGINT) AS h
              FROM nbr$r GROUP BY dst)"""

  // Vertex coreness (k-core peel depth) of the mutual-kNN graph via 5
  // synchronous h-index rounds (Lü et al. 2016 — the sequence decreases
  // monotonically to the exact coreness). A FIXED round count is the
  // defined semantic so the oracle replays bit-for-bit; on the sf0.01
  // graph the iteration reaches its fixpoint at round 4 (checked round-by-
  // round in DuckDB), so 5 carries one round of margin, and CorenessSpec
  // pins converged-round = one-more-round = brute-force peel on fixtures.
  // Coreness separates hub documents (dense near-dup cores that dedup
  // should collapse hardest) from fringe singletons — the peel-depth view
  // of the same graph sim_components clusters. Each round shuffles
  // (id, long) pairs only; the h-index is a degree-bounded codegen fold,
  // no windows.
  private val simCoreness = Q(
    "sim_coreness",
    (s, dir) => {
      val g = cachedMutualKnn(s, dir).select(col("id1"), col("id2"))
      Similarity.corenessHIndex(g, "id1", "id2", rounds = 5)
        .select(col("id").as("vec_id"), col("degree"), col("coreness"))
        .orderBy(col("vec_id"))
    },
    Some(s"""WITH $mutualKnnCteSql,
            sym AS (SELECT id1 AS src, id2 AS dst FROM mpairs
                    UNION ALL SELECT id2 AS src, id1 AS dst FROM mpairs),
            hdeg AS (SELECT dst AS id, CAST(count(1) AS BIGINT) AS h
                     FROM sym GROUP BY dst),
            ${hIndexRoundSql("hdeg", 1)},
            ${hIndexRoundSql("hr1", 2)},
            ${hIndexRoundSql("hr2", 3)},
            ${hIndexRoundSql("hr3", 4)},
            ${hIndexRoundSql("hr4", 5)}
            SELECT d.id AS vec_id, d.h AS degree, f.h AS coreness
            FROM hdeg d JOIN hr5 f USING (id)
            ORDER BY vec_id"""))

  // Lloyd's k-means (k=8, 2 assign/update rounds + final assignment) —
  // the IVF centroid-training sweep as a first-class op. Deterministic
  // seeds/tie-breaks make the full iteration replayable: the oracle
  // unrolls both rounds as CTEs (c0→a0→c1→a1→c2→final), with the
  // empty-cell keep-previous rule as a LEFT JOIN coalesce.
  // shared oracle fragment: two Lloyd rounds (c0 seeds → c2 trained),
  // used by sim_kmeans and by the trained-IVF composition below
  private val kmeansCteSql =
    """e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       c0 AS (SELECT row_number() OVER (ORDER BY vec_id) AS list_id, v AS cvec
              FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 8) t),
       d0 AS (SELECT e.vec_id, e.v, c.list_id,
                     list_sum(list_transform(range(1, 65),
                       i -> (e.v[i] - c.cvec[i]) * (e.v[i] - c.cvec[i]))) AS d2
              FROM e, c0 c),
       a0 AS (SELECT vec_id, v, list_id FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id
                                             ORDER BY d2, list_id) AS r
                FROM d0) t WHERE r = 1),
       c1 AS (SELECT c0.list_id, coalesce(nn.cvec, c0.cvec) AS cvec
              FROM c0 LEFT JOIN (
                SELECT list_id, list(cx ORDER BY i) AS cvec FROM (
                  SELECT list_id, i, CAST(sum(CAST(v[i] AS DECIMAL(38,18))) AS DOUBLE) / count(*) AS cx
                  FROM a0, range(1, 65) t(i) GROUP BY 1, 2) GROUP BY 1)
                nn USING (list_id)),
       d1 AS (SELECT e.vec_id, e.v, c.list_id,
                     list_sum(list_transform(range(1, 65),
                       i -> (e.v[i] - c.cvec[i]) * (e.v[i] - c.cvec[i]))) AS d2
              FROM e, c1 c),
       a1 AS (SELECT vec_id, v, list_id FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id
                                             ORDER BY d2, list_id) AS r
                FROM d1) t WHERE r = 1),
       c2 AS (SELECT c1.list_id, coalesce(nn.cvec, c1.cvec) AS cvec
              FROM c1 LEFT JOIN (
                SELECT list_id, list(cx ORDER BY i) AS cvec FROM (
                  SELECT list_id, i, CAST(sum(CAST(v[i] AS DECIMAL(38,18))) AS DOUBLE) / count(*) AS cx
                  FROM a1, range(1, 65) t(i) GROUP BY 1, 2) GROUP BY 1)
                nn USING (list_id))"""

  private val simKmeans = Q(
    "sim_kmeans",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      Similarity.kmeansAssignments(emb, "vec_id", "embedding",
          k = 8, dim = 64, iters = 2)
        .withColumn("dist2", round(col("dist2"), 4))
        .orderBy(col("vec_id"))
    },
    Some(s"""WITH $kmeansCteSql,
            df AS (SELECT e.vec_id, c.list_id,
                          list_sum(list_transform(range(1, 65),
                            i -> (e.v[i] - c.cvec[i]) * (e.v[i] - c.cvec[i]))) AS d2
                   FROM e, c2 c)
            SELECT vec_id, list_id, round(d2, 4) AS dist2 FROM (
              SELECT *, row_number() OVER (PARTITION BY vec_id
                                           ORDER BY d2, list_id) AS r
              FROM df) t WHERE r = 1
            ORDER BY vec_id"""))

  // IVF ANN over TRAINED centroids — the composition the IVF scaladoc
  // defers ("one k-means sweep would refine them without changing the
  // query-side plan shape"): kmeansTrain feeds ivfTopK, plan shape
  // untouched. The oracle chains both replays: Lloyd c0→c2, then the
  // ivf assignment/probe/rank pipeline against c2. SHARED with
  // sim_ivf_compact: a compacted index is bit-identical to a fresh
  // trained build over the merged corpus, so the same replay oracles
  // both (the IndexStore.compactIvf invariant).
  private val ivfTrainedOracleSql = s"""WITH $kmeansCteSql,
            norm AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n FROM e),
            assign_all AS (
              SELECT nm.vec_id, nm.v, nm.n, c.list_id,
                     list_dot_product(nm.v, c.cvec)
                       / (nm.n * sqrt(list_dot_product(c.cvec, c.cvec))) AS cd
              FROM norm nm, c2 c),
            corpus_assigned AS (
              SELECT vec_id AS neighbor_id, v AS cv, n AS cn, list_id FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cd DESC, list_id) AS r
                FROM assign_all) t WHERE r = 1),
            probes AS (
              SELECT vec_id AS query_id, v AS qv, n AS qn, list_id FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cd DESC, list_id) AS r
                FROM assign_all WHERE vec_id < 8) t WHERE r <= 3),
            scored AS (
              SELECT p.query_id, a.neighbor_id,
                     list_dot_product(p.qv, a.cv) / (p.qn * a.cn) AS cos
              FROM probes p JOIN corpus_assigned a USING (list_id)
              WHERE p.query_id <> a.neighbor_id),
            ranked AS (
              SELECT query_id, neighbor_id, cos,
                     row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
              FROM scored)
            SELECT query_id, neighbor_id, round(cos, 4) AS cos,
                   CAST(rank AS BIGINT) AS rank
            FROM ranked WHERE rank <= 5
            ORDER BY query_id, rank"""

  private val simIvfTrained = Q(
    "sim_ivf_trained",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val cents = Similarity.kmeansTrain(emb, "vec_id", "embedding",
        k = 8, dim = 64, iters = 2)
      val queries = emb.filter(col("vec_id") < 8)
      Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
          k = 5, nlist = 8, nprobe = 3, trained = Some(cents))
        .withColumn("cos", round(col("cos"), 4))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(ivfTrainedOracleSql))

  // Index COMPACTION — the lifecycle step after build (sim_ivf_persisted)
  // and append (sim_ivf_append / stream_ivf_maintain): frozen-cell appends
  // keep ingest cheap but only grow cells where new data lands, so probe
  // candidate lists bloat; when IndexStore.ivfImbalance crosses the
  // policy threshold, compactIvf retrains the coarse centroids FROM THE
  // INDEX'S OWN STORED VECTORS (zero raw-corpus access) and republishes
  // under the next versioned pointer. Retraining is deterministic
  // (first-k-by-id seed, exact-decimal means), so the compacted index is
  // bit-identical to a fresh kmeansTrain+ivfTopK build over the merged
  // corpus — the query serves from the compacted store and shares
  // sim_ivf_trained's oracle verbatim. The session memo holds the
  // base-build → skewed-append → compact chain once, as a production
  // maintenance job would.
  private val ivfCompactStoreCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def cachedCompactedStore(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    ivfCompactStoreCache.computeIfAbsent(
      Tables.sessionKey(s) + "|" + dir,
      _ => {
        val p = java.nio.file.Files.createTempDirectory("graft-ivfcompact")
          .toString + "/ivf"
        val emb = Tables.load(s, dir, "embeddings")
        graft.pipeline.IndexStore.saveIvf(
          emb.filter(col("vec_id") < 12), "vec_id", "embedding",
          nlist = 8, livePath = p)
        // the rest of the corpus arrives as an append onto the frozen
        // 12-vector base cells — the distribution shift that skews them
        graft.streaming.IndexStream.appendBatch(
          emb.filter(col("vec_id") >= 12), "vec_id", "embedding", p)
        graft.pipeline.IndexStore.compactIvf(s, p, k = 8, dim = 64,
          iters = 2)
        p
      })

  private val simIvfCompact = Q(
    "sim_ivf_compact",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      graft.pipeline.IndexStore.queryIvf(s, cachedCompactedStore(s, dir),
          emb.filter(col("vec_id") < 8), "vec_id", "embedding",
          k = 5, nprobe = 3)
        .withColumn("cos", round(col("cos"), 4))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(ivfTrainedOracleSql))

  // Parameterized Lloyd replay over a vector SLICE [lo..hi] (k=8, 2
  // rounds), CTE names suffixed — the per-subspace codebook trainer of the
  // PQ oracle below. Same structure as kmeansCteSql.
  /** Oracle rank CTE for an m-subspace PQ ADC scan: the m code tables
    * (code_<sfx>) joined per vector, the m per-query LUTs (lut_<sfx>)
    * joined per code, summed ADC distance, per-query top-5 — the
    * generator behind the recall report's code-rate sweep (m=2/4/8).
    */
  private def pqRankSql(name: String, sfx: Seq[String],
      k: Int = 5, keepRank: Boolean = false): String = {
    val codeJoin = sfx.zipWithIndex.map { case (t, i) =>
      if (i == 0) s"code_$t c1" else s"JOIN code_$t c${i + 1} USING (vec_id)"
    }.mkString(" ")
    val codeCols = sfx.indices.map(i => s"c${i + 1}.list_id AS k${i + 1}")
      .mkString(", ")
    val lutJoins = sfx.zipWithIndex.map { case (t, i) =>
      if (i == 0) s"JOIN lut_$t l1 ON l1.list_id = cd.k1"
      else s"JOIN lut_$t l${i + 1} ON l${i + 1}.list_id = cd.k${i + 1} " +
        s"AND l${i + 1}.query_id = l1.query_id"
    }.mkString("\n               ")
    val dsum = sfx.indices.map(i => s"l${i + 1}.d2").mkString(" + ")
    val outCols = if (keepRank) "query_id, neighbor_id, rank"
      else "query_id, neighbor_id"
    s"""$name AS (SELECT $outCols FROM (
         SELECT l1.query_id, cd.vec_id AS neighbor_id,
                row_number() OVER (PARTITION BY l1.query_id
                  ORDER BY $dsum, cd.vec_id) AS rank
         FROM (SELECT c1.vec_id, $codeCols
               FROM $codeJoin) cd
         $lutJoins
         WHERE cd.vec_id <> l1.query_id) t WHERE rank <= $k)"""
  }

  private def pqLloydCte(sfx: String, lo: Int, hi: Int,
      base: String = "e"): String = {
    val d = hi - lo + 1
    val rng = s"range(1, ${d + 1})"
    def d2(v: String, c: String) =
      s"list_sum(list_transform($rng, i -> ($v[i] - $c[i]) * ($v[i] - $c[i])))"
    s"""e_$sfx AS (SELECT vec_id, v[$lo:$hi] AS v FROM $base),
        c0_$sfx AS (SELECT row_number() OVER (ORDER BY vec_id) AS list_id,
                           v AS cvec
                    FROM (SELECT vec_id, v FROM e_$sfx ORDER BY vec_id
                          LIMIT 8) t),
        d0_$sfx AS (SELECT s.vec_id, s.v, c.list_id,
                           ${d2("s.v", "c.cvec")} AS d2
                    FROM e_$sfx s, c0_$sfx c),
        a0_$sfx AS (SELECT vec_id, v, list_id FROM (
                      SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY d2, list_id) AS r
                      FROM d0_$sfx) t WHERE r = 1),
        c1_$sfx AS (SELECT c0.list_id, coalesce(nn.cvec, c0.cvec) AS cvec
                    FROM c0_$sfx c0 LEFT JOIN (
                      SELECT list_id, list(cx ORDER BY i) AS cvec FROM (
                        SELECT list_id, i, CAST(sum(CAST(v[i] AS DECIMAL(38,18))) AS DOUBLE) / count(*) AS cx
                        FROM a0_$sfx, $rng t(i) GROUP BY 1, 2) GROUP BY 1)
                      nn USING (list_id)),
        d1_$sfx AS (SELECT s.vec_id, s.v, c.list_id,
                           ${d2("s.v", "c.cvec")} AS d2
                    FROM e_$sfx s, c1_$sfx c),
        a1_$sfx AS (SELECT vec_id, v, list_id FROM (
                      SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY d2, list_id) AS r
                      FROM d1_$sfx) t WHERE r = 1),
        c2_$sfx AS (SELECT c1.list_id, coalesce(nn.cvec, c1.cvec) AS cvec
                    FROM c1_$sfx c1 LEFT JOIN (
                      SELECT list_id, list(cx ORDER BY i) AS cvec FROM (
                        SELECT list_id, i, CAST(sum(CAST(v[i] AS DECIMAL(38,18))) AS DOUBLE) / count(*) AS cx
                        FROM a1_$sfx, $rng t(i) GROUP BY 1, 2) GROUP BY 1)
                      nn USING (list_id)),
        dc_$sfx AS (SELECT s.vec_id, c.list_id,
                           ${d2("s.v", "c.cvec")} AS d2
                    FROM e_$sfx s, c2_$sfx c),
        code_$sfx AS (SELECT vec_id, list_id FROM (
                        SELECT *, row_number() OVER (PARTITION BY vec_id
                                   ORDER BY d2, list_id) AS r
                        FROM dc_$sfx) t WHERE r = 1),
        lut_$sfx AS (SELECT vec_id AS query_id, list_id, d2
                     FROM dc_$sfx WHERE vec_id < 8)"""
  }

  // Product quantization ANN (Jégou et al. 2011): m=2 subspaces × k=8
  // codes, trained by the same deterministic Lloyd sweep; corpus vectors
  // compress to 2 codes; search is an ADC scan over the CODES with the
  // query's per-subspace LUT — the 100 TB memory lever (codes, not
  // vectors, stream through the scan). The full train→encode→scan chain
  // is replayed by the oracle: two sliced Lloyd recursions, argmin
  // encoding, LUT join, ADC rank.
  private val simPq = Q(
    "sim_pq",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val model = cachedPqModel(s, dir, m = 2)
      val queries = emb.filter(col("vec_id") < 8)
      Similarity.pqAdcTopK(emb, queries, "vec_id", "embedding", model, k = 5)
        .withColumn("adc", round(col("adc"), 4))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                        FROM embeddings),
             ${pqLloydCte("s1", 1, 32)},
             ${pqLloydCte("s2", 33, 64)},
             scored AS (
               SELECT l1.query_id, cd.vec_id AS neighbor_id,
                      l1.d2 + l2.d2 AS adc
               FROM (SELECT c1.vec_id, c1.list_id AS code1,
                            c2.list_id AS code2
                     FROM code_s1 c1 JOIN code_s2 c2 USING (vec_id)) cd
               JOIN lut_s1 l1 ON l1.list_id = cd.code1
               JOIN lut_s2 l2 ON l2.list_id = cd.code2
                             AND l2.query_id = l1.query_id
               WHERE cd.vec_id <> l1.query_id),
             ranked AS (
               SELECT query_id, neighbor_id, adc,
                      row_number() OVER (PARTITION BY query_id
                        ORDER BY adc, neighbor_id) AS rank
               FROM scored)
             SELECT query_id, neighbor_id, round(adc, 4) AS adc,
                    CAST(rank AS BIGINT) AS rank
             FROM ranked WHERE rank <= 5
             ORDER BY query_id, rank"""))

  // IVF-PQ (Jégou et al. 2011 §V, the FAISS IVFPQ composition): coarse
  // cosine cells prune the scan to nprobe cells per query; within the
  // probed cells, candidates are scanned as PQ codes of their RESIDUAL
  // (vector minus cell centroid), ADC'd against a per-(query, cell)
  // residual LUT. The oracle replays the WHOLE chain: coarse assignment,
  // residual projection, two sliced Lloyd recursions ON RESIDUALS,
  // argmin encoding, per-probed-cell query residuals, LUT join, ADC rank.
  private val simIvfPq = Q(
    "sim_ivfpq",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 8)
      Similarity.ivfPqTopK(emb, queries, "vec_id", "embedding", k = 5,
          nlist = 8, nprobe = 3, m = 2, dim = 64, kCodes = 8, iters = 2,
          trainedPq = Some(cachedIvfPqModel(s, dir, nlist = 8)))
        .withColumn("adc", round(col("adc"), 4))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                        FROM embeddings),
             cent AS (SELECT row_number() OVER (ORDER BY vec_id) AS list_id,
                             v AS cvec
                      FROM (SELECT vec_id, v FROM e ORDER BY vec_id
                            LIMIT 8) t),
             nrm AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n
                     FROM e),
             assign_all AS (
               SELECT nm.vec_id, nm.v, nm.n, c.list_id,
                      list_dot_product(nm.v, c.cvec)
                        / (nm.n * sqrt(list_dot_product(c.cvec, c.cvec))) AS cd
               FROM nrm nm, cent c),
             corpus_assigned AS (
               SELECT vec_id, v, list_id FROM (
                 SELECT *, row_number() OVER (PARTITION BY vec_id
                            ORDER BY cd DESC, list_id) AS r
                 FROM assign_all) t WHERE r = 1),
             eres AS (
               SELECT a.vec_id, a.list_id,
                      list_transform(range(1, 65), i -> a.v[i] - c.cvec[i]) AS v
               FROM corpus_assigned a JOIN cent c USING (list_id)),
             ${pqLloydCte("s1", 1, 32, base = "eres")},
             ${pqLloydCte("s2", 33, 64, base = "eres")},
             probes AS (
               SELECT vec_id AS query_id, list_id FROM (
                 SELECT *, row_number() OVER (PARTITION BY vec_id
                            ORDER BY cd DESC, list_id) AS r
                 FROM assign_all WHERE vec_id < 8) t WHERE r <= 3),
             qres AS (
               SELECT p.query_id, p.list_id,
                      list_transform(range(1, 65), i -> nm.v[i] - c.cvec[i]) AS qr
               FROM probes p JOIN cent c USING (list_id)
                             JOIN nrm nm ON nm.vec_id = p.query_id),
             lutq_s1 AS (
               SELECT q.query_id, q.list_id, cb.list_id AS code,
                      list_sum(list_transform(range(1, 33), i ->
                        (q.qr[i] - cb.cvec[i]) * (q.qr[i] - cb.cvec[i]))) AS d2
               FROM qres q, c2_s1 cb),
             lutq_s2 AS (
               SELECT q.query_id, q.list_id, cb.list_id AS code,
                      list_sum(list_transform(range(1, 33), i ->
                        (q.qr[32 + i] - cb.cvec[i])
                          * (q.qr[32 + i] - cb.cvec[i]))) AS d2
               FROM qres q, c2_s2 cb),
             cd AS (
               SELECT r.vec_id, r.list_id,
                      c1.list_id AS code1, c2.list_id AS code2
               FROM eres r JOIN code_s1 c1 USING (vec_id)
                           JOIN code_s2 c2 USING (vec_id)),
             scored AS (
               SELECT l1.query_id, cd.vec_id AS neighbor_id,
                      l1.d2 + l2.d2 AS adc
               FROM cd
               JOIN lutq_s1 l1 ON l1.list_id = cd.list_id
                              AND l1.code = cd.code1
               JOIN lutq_s2 l2 ON l2.query_id = l1.query_id
                              AND l2.list_id = cd.list_id
                              AND l2.code = cd.code2
               WHERE cd.vec_id <> l1.query_id),
             ranked AS (
               SELECT query_id, neighbor_id, adc,
                      row_number() OVER (PARTITION BY query_id
                        ORDER BY adc, neighbor_id) AS rank
               FROM scored)
             SELECT query_id, neighbor_id, round(adc, 4) AS adc,
                    CAST(rank AS BIGINT) AS rank
             FROM ranked WHERE rank <= 5
             ORDER BY query_id, rank"""))

  // IVF-PQ over TRAINED coarse cells: one k-means sweep provides the
  // cell structure, so residuals are GENUINE displacement-from-mean
  // vectors (smaller variance than residuals against sample centroids —
  // the regime Jégou et al. analyze). The oracle chains three replays:
  // Lloyd c0→c2, cosine assignment/probing against c2, and the two
  // residual-sliced Lloyd recursions + ADC.
  private val simIvfPqTrained = Q(
    "sim_ivfpq_trained",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val (cents, model) = cachedIvfPqTrained(s, dir)
      val queries = emb.filter(col("vec_id") < 8)
      Similarity.ivfPqTopK(emb, queries, "vec_id", "embedding", k = 5,
          nlist = 8, nprobe = 3, m = 2, dim = 64, kCodes = 8, iters = 2,
          trainedPq = Some(model), trainedCoarse = Some(cents))
        .withColumn("adc", round(col("adc"), 4))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""WITH $kmeansCteSql,
             nrm AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n
                     FROM e),
             assign_all AS (
               SELECT nm.vec_id, nm.v, nm.n, c.list_id,
                      list_dot_product(nm.v, c.cvec)
                        / (nm.n * sqrt(list_dot_product(c.cvec, c.cvec))) AS cd
               FROM nrm nm, c2 c),
             corpus_assigned AS (
               SELECT vec_id, v, list_id FROM (
                 SELECT *, row_number() OVER (PARTITION BY vec_id
                            ORDER BY cd DESC, list_id) AS r
                 FROM assign_all) t WHERE r = 1),
             eres AS (
               SELECT a.vec_id, a.list_id,
                      list_transform(range(1, 65), i -> a.v[i] - c.cvec[i]) AS v
               FROM corpus_assigned a JOIN c2 c USING (list_id)),
             ${pqLloydCte("t1", 1, 32, base = "eres")},
             ${pqLloydCte("t2", 33, 64, base = "eres")},
             probes AS (
               SELECT vec_id AS query_id, list_id FROM (
                 SELECT *, row_number() OVER (PARTITION BY vec_id
                            ORDER BY cd DESC, list_id) AS r
                 FROM assign_all WHERE vec_id < 8) t WHERE r <= 3),
             qres AS (
               SELECT p.query_id, p.list_id,
                      list_transform(range(1, 65), i -> nm.v[i] - c.cvec[i]) AS qr
               FROM probes p JOIN c2 c USING (list_id)
                             JOIN nrm nm ON nm.vec_id = p.query_id),
             lutq_t1 AS (
               SELECT q.query_id, q.list_id, cb.list_id AS code,
                      list_sum(list_transform(range(1, 33), i ->
                        (q.qr[i] - cb.cvec[i]) * (q.qr[i] - cb.cvec[i]))) AS d2
               FROM qres q, c2_t1 cb),
             lutq_t2 AS (
               SELECT q.query_id, q.list_id, cb.list_id AS code,
                      list_sum(list_transform(range(1, 33), i ->
                        (q.qr[32 + i] - cb.cvec[i])
                          * (q.qr[32 + i] - cb.cvec[i]))) AS d2
               FROM qres q, c2_t2 cb),
             cd AS (
               SELECT r.vec_id, r.list_id,
                      c1.list_id AS code1, c2.list_id AS code2
               FROM eres r JOIN code_t1 c1 USING (vec_id)
                           JOIN code_t2 c2 USING (vec_id)),
             scored AS (
               SELECT l1.query_id, cd.vec_id AS neighbor_id,
                      l1.d2 + l2.d2 AS adc
               FROM cd
               JOIN lutq_t1 l1 ON l1.list_id = cd.list_id
                              AND l1.code = cd.code1
               JOIN lutq_t2 l2 ON l2.query_id = l1.query_id
                              AND l2.list_id = cd.list_id
                              AND l2.code = cd.code2
               WHERE cd.vec_id <> l1.query_id),
             ranked AS (
               SELECT query_id, neighbor_id, adc,
                      row_number() OVER (PARTITION BY query_id
                        ORDER BY adc, neighbor_id) AS rank
               FROM scored)
             SELECT query_id, neighbor_id, round(adc, 4) AS adc,
                    CAST(rank AS BIGINT) AS rank
             FROM ranked WHERE rank <= 5
             ORDER BY query_id, rank"""))

  // Append-only IVF maintenance: the index's cell structure is FROZEN at
  // the base corpus's centroid sample (vec_id >= 100 here, so the sample
  // provably differs from a full-corpus rebuild), the delta (< 100)
  // assigns to those frozen cells, and the delta's own queries probe the
  // merged index — the ingest path that appends vectors without
  // retraining. The oracle replays base-derived centroids, merged
  // assignment, probing, and ranking exactly.
  private val simIvfAppend = Q(
    "sim_ivf_append",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val base = emb.filter(col("vec_id") >= 100)
      val delta = emb.filter(col("vec_id") < 100)
      val queries = emb.filter(col("vec_id") < 8)
      Similarity.ivfAppendTopK(base, delta, queries, "vec_id", "embedding",
          k = 5, nlist = 16, nprobe = 6)
        .withColumn("cos", round(col("cos"), 4))
        .orderBy(col("query_id"), col("rank"))
    },
    Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            cent AS (
              SELECT row_number() OVER (ORDER BY vec_id) AS list_id, v AS cvec
              FROM (SELECT vec_id, v FROM e WHERE vec_id >= 100
                    ORDER BY vec_id LIMIT 16) t),
            norm AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n FROM e),
            assign_all AS (
              SELECT nm.vec_id, nm.v, nm.n, c.list_id,
                     list_dot_product(nm.v, c.cvec)
                       / (nm.n * sqrt(list_dot_product(c.cvec, c.cvec))) AS cd
              FROM norm nm, cent c),
            corpus_assigned AS (
              SELECT vec_id AS neighbor_id, v AS cv, n AS cn, list_id FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cd DESC, list_id) AS r
                FROM assign_all) t WHERE r = 1),
            probes AS (
              SELECT vec_id AS query_id, v AS qv, n AS qn, list_id FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cd DESC, list_id) AS r
                FROM assign_all WHERE vec_id < 8) t WHERE r <= 6),
            scored AS (
              SELECT p.query_id, a.neighbor_id,
                     list_dot_product(p.qv, a.cv) / (p.qn * a.cn) AS cos
              FROM probes p JOIN corpus_assigned a USING (list_id)
              WHERE p.query_id <> a.neighbor_id),
            ranked AS (
              SELECT query_id, neighbor_id, cos,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY cos DESC, neighbor_id) AS rank
              FROM scored)
            SELECT query_id, neighbor_id, round(cos, 4) AS cos,
                   CAST(rank AS BIGINT) AS rank
            FROM ranked WHERE rank <= 5
            ORDER BY query_id, rank"""))

  // Streaming maintenance of the PERSISTED IVF index — sim_ivf_append's
  // ingest path run through the IndexStream/IndexStore machinery: the
  // base (vec_id >= 100) publishes once, the delta (< 100) folds in as
  // three arrival-ordered chunks via IndexStream.appendBatch (the exact
  // step the foreachBatch stream runs — the cache_stream_merge
  // discipline), and the query serves ANN from the final published
  // version. Frozen cells + append-only rows make the fold
  // order-independent, so the result is bit-identical to the one-shot
  // ivfAppendTopK and SHARES sim_ivf_append's oracle; IndexStreamSpec
  // drives the same chunks through a real MemoryStream + maintain() and
  // pins stream ≡ fold ≡ direct append.
  private val ivfStreamStoreCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def cachedIvfStreamStore(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    ivfStreamStoreCache.computeIfAbsent(
      Tables.sessionKey(s) + "|" + dir,
      _ => {
        val p = java.nio.file.Files.createTempDirectory("graft-ivfstream")
          .toString + "/ivf"
        val emb = Tables.load(s, dir, "embeddings")
        graft.pipeline.IndexStore.saveIvf(
          emb.filter(col("vec_id") >= 100), "vec_id", "embedding",
          nlist = 16, livePath = p)
        (0 to 2).foreach { c =>
          graft.streaming.IndexStream.appendBatch(
            emb.filter(col("vec_id") < 100 && col("vec_id") % 3 === c)
              .select(col("vec_id"), col("embedding")),
            "vec_id", "embedding", p)
        }
        p
      })

  // Streaming maintenance WITH the in-line compaction policy (r12
  // VERDICT #3): the maintainer itself closes the lifecycle loop — each
  // micro-batch appends to the frozen cells and, when the append drifts
  // IndexStore.ivfImbalance past the policy threshold, retrains from
  // the index's own stored vectors under the SAME batch marker
  // (exactly-once across the compaction publish). The base here is a
  // narrow 12-vector seed, so the appended distribution skews every
  // step and the final step's compaction is a full deterministic
  // retrain over the complete stored set — bit-identical to a fresh
  // kmeansTrain+ivfTopK build over the corpus, which is why this row
  // SHARES sim_ivf_trained's oracle (the same invariant sim_ivf_compact
  // pins for the manual batch chain; IndexStreamSpec pins
  // stream-with-compaction ≡ batch compact(append) and the replay skip).
  private val ivfStreamCompactCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def cachedStreamCompactStore(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    ivfStreamCompactCache.computeIfAbsent(
      Tables.sessionKey(s) + "|" + dir,
      _ => {
        val p = java.nio.file.Files.createTempDirectory("graft-ivfscompact")
          .toString + "/ivf"
        val emb = Tables.load(s, dir, "embeddings")
        graft.pipeline.IndexStore.saveIvf(
          emb.filter(col("vec_id") < 12), "vec_id", "embedding",
          nlist = 8, livePath = p)
        val policy = graft.streaming.IndexStream.CompactionPolicy(
          maxImbalance = 1.01, k = 8, dim = 64, iters = 2)
        (0 to 2).foreach { c =>
          graft.streaming.IndexStream.maintainStep(
            emb.filter(col("vec_id") >= 12 && col("vec_id") % 3 === c)
              .select(col("vec_id"), col("embedding")),
            c.toLong, "vec_id", "embedding", p, Some(policy))
        }
        p
      })

  private val streamIvfCompact = Q(
    "stream_ivf_compact",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      graft.pipeline.IndexStore.queryIvf(s, cachedStreamCompactStore(s, dir),
          emb.filter(col("vec_id") < 8), "vec_id", "embedding",
          k = 5, nprobe = 3)
        .withColumn("cos", round(col("cos"), 4))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(ivfTrainedOracleSql))

  private val streamIvfMaintain = Q(
    "stream_ivf_maintain",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      graft.pipeline.IndexStore.queryIvf(
          s, cachedIvfStreamStore(s, dir),
          emb.filter(col("vec_id") < 8), "vec_id", "embedding",
          k = 5, nprobe = 6)
        .withColumn("cos", round(col("cos"), 4))
        .orderBy(col("query_id"), col("rank"))
    },
    simIvfAppend.oracle)

  // Trained PQ models are pure functions of (corpus, params) and feed
  // several queries (sim_pq, sim_pq_m4, sim_ivfpq, the recall report) —
  // memoize per (session, corpus, params) like trainedMerges/
  // cachedWarehouse, so each model pays its Lloyd sweeps ONCE per
  // session instead of once per invocation. The models are k·dim
  // doubles on the driver — no executor storage, nothing to unpersist.
  private val pqModelCache =
    new java.util.concurrent.ConcurrentHashMap[String, Similarity.PqModel]()

  private def cachedPqModel(s: org.apache.spark.sql.SparkSession,
      dir: String, m: Int): Similarity.PqModel =
    pqModelCache.computeIfAbsent(
      Tables.sessionKey(s) + s"|$dir|raw|$m",
      _ => Similarity.pqTrain(Tables.load(s, dir, "embeddings"),
        "vec_id", "embedding", m = m, dim = 64, k = 8, iters = 2))

  /** L2-normalized copy of the embeddings table: ADC scans rank by L2
    * distance, but the retrieval truth is COSINE — on unnormalized
    * vectors those orders genuinely differ (the r10 recall report
    * measured exact-code-rate-independent ~0.25 recall ceilings for the
    * whole raw-PQ family). Normalizing first makes L2 monotone in cosine
    * (||a−b||² = 2−2·cos on the unit sphere), the standard cosine-PQ
    * preprocessing.
    */
  private def normalizedVecs(emb: org.apache.spark.sql.DataFrame) =
    emb.select(col("vec_id"), Similarity.toDouble(col("embedding")).as("__v"))
      .withColumn("__n", sqrt(Similarity.dot(col("__v"), col("__v"))))
      .select(col("vec_id"),
        transform(col("__v"), x => x / col("__n")).as("embedding"))

  private def cachedPqModelNorm(s: org.apache.spark.sql.SparkSession,
      dir: String, m: Int): Similarity.PqModel =
    pqModelCache.computeIfAbsent(
      Tables.sessionKey(s) + s"|$dir|nrm|$m",
      _ => Similarity.pqTrain(
        normalizedVecs(Tables.load(s, dir, "embeddings")),
        "vec_id", "embedding", m = m, dim = 64, k = 8, iters = 2))

  private def cachedIvfPqModel(s: org.apache.spark.sql.SparkSession,
      dir: String, nlist: Int): Similarity.PqModel =
    pqModelCache.computeIfAbsent(
      Tables.sessionKey(s) + s"|$dir|res|$nlist",
      _ => Similarity.ivfPqModel(Tables.load(s, dir, "embeddings"),
        "vec_id", "embedding", nlist = nlist, m = 2, dim = 64,
        kCodes = 8, iters = 2))

  // trained-coarse IVFPQ: one k-means sweep yields the coarse cells AND
  // the residual codebooks train against them — both memoized together
  // (centroids + model are one index build)
  private val ivfPqTrainedCache = new java.util.concurrent.ConcurrentHashMap[
    String, (Seq[(Long, Seq[Double])], Similarity.PqModel)]()

  private def cachedIvfPqTrained(s: org.apache.spark.sql.SparkSession,
      dir: String): (Seq[(Long, Seq[Double])], Similarity.PqModel) =
    ivfPqTrainedCache.computeIfAbsent(
      Tables.sessionKey(s) + s"|$dir|km8",
      _ => {
        val emb = Tables.load(s, dir, "embeddings")
        val cents = Similarity.kmeansTrain(emb, "vec_id", "embedding",
          k = 8, dim = 64, iters = 2)
        (cents, Similarity.ivfPqModel(emb, "vec_id", "embedding",
          nlist = 8, m = 2, dim = 64, kCodes = 8, iters = 2,
          trainedCoarse = Some(cents)))
      })

  // PQ at m=4 subspaces (16 dims each, same k=8 codes): the subspace
  // count is PQ's fidelity lever — 8^4 product cells vs sim_pq's 8^2 at
  // 2x the bytes per code. Beside sim_pq (m=2), this pins both ends of
  // the compression-fidelity tradeoff the recall report surfaces;
  // SimilaritySpec asserts the provable half (m=4 quantization
  // distortion < m=2's). The oracle replays all four sliced Lloyd
  // recursions.
  private val simPqM4 = Q(
    "sim_pq_m4",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val model = cachedPqModel(s, dir, m = 4)
      val queries = emb.filter(col("vec_id") < 8)
      Similarity.pqAdcTopK(emb, queries, "vec_id", "embedding", model, k = 5)
        .withColumn("adc", round(col("adc"), 4))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                        FROM embeddings),
             ${pqLloydCte("s1", 1, 16)},
             ${pqLloydCte("s2", 17, 32)},
             ${pqLloydCte("s3", 33, 48)},
             ${pqLloydCte("s4", 49, 64)},
             scored AS (
               SELECT l1.query_id, cd.vec_id AS neighbor_id,
                      l1.d2 + l2.d2 + l3.d2 + l4.d2 AS adc
               FROM (SELECT c1.vec_id, c1.list_id AS k1, c2.list_id AS k2,
                            c3.list_id AS k3, c4.list_id AS k4
                     FROM code_s1 c1 JOIN code_s2 c2 USING (vec_id)
                                     JOIN code_s3 c3 USING (vec_id)
                                     JOIN code_s4 c4 USING (vec_id)) cd
               JOIN lut_s1 l1 ON l1.list_id = cd.k1
               JOIN lut_s2 l2 ON l2.list_id = cd.k2
                             AND l2.query_id = l1.query_id
               JOIN lut_s3 l3 ON l3.list_id = cd.k3
                             AND l3.query_id = l1.query_id
               JOIN lut_s4 l4 ON l4.list_id = cd.k4
                             AND l4.query_id = l1.query_id
               WHERE cd.vec_id <> l1.query_id),
             ranked AS (
               SELECT query_id, neighbor_id, adc,
                      row_number() OVER (PARTITION BY query_id
                        ORDER BY adc, neighbor_id) AS rank
               FROM scored)
             SELECT query_id, neighbor_id, round(adc, 4) AS adc,
                    CAST(rank AS BIGINT) AS rank
             FROM ranked WHERE rank <= 5
             ORDER BY query_id, rank"""))

  // Per-vertex triangle counts on the mutual-kNN graph — the clustering-
  // coefficient numerator (how clique-like each vector's neighborhood
  // is: a quality metric for ANN graphs and a SemDeDup-cluster density
  // signal). Edges orient ascending (id1 < id2), so the wedge join's
  // fan-out is bounded by the out-degree (<= 2k in a mutual-kNN graph)
  // squared; degree-orientation is the general fix for skewed graphs.
  // All joins are ids-only; the oracle replays the 3-way join.
  private val simTriangles = Q(
    "sim_triangles",
    (s, dir) => {
      Similarity.triangleCounts(cachedMutualKnn(s, dir), "id1", "id2")
        .select(col("id").as("vec_id"), col("n_tri"))
        .orderBy(col("vec_id"))
    },
    Some(s"""WITH $mutualKnnCteSql,
            eg AS (SELECT id1 AS a, id2 AS b FROM mpairs),
            wedge AS (SELECT e1.a, e1.b, e2.b AS c
                      FROM eg e1 JOIN eg e2 ON e1.b = e2.a),
            trig AS (SELECT w.a, w.b, w.c
                     FROM wedge w JOIN eg e3 ON w.a = e3.a AND w.c = e3.b),
            pv AS (SELECT vec_id, CAST(count(1) AS BIGINT) AS n_tri FROM (
                     SELECT unnest([a, b, c]) AS vec_id FROM trig) t
                   GROUP BY vec_id),
            vv AS (SELECT DISTINCT x AS vec_id FROM (
                     SELECT a AS x FROM eg UNION ALL SELECT b FROM eg) t)
            SELECT vv.vec_id, coalesce(pv.n_tri, 0) AS n_tri
            FROM vv LEFT JOIN pv ON vv.vec_id = pv.vec_id
            ORDER BY vv.vec_id"""))

  // Integer PageRank over the mutual-kNN graph (4 damped power-iteration
  // rounds, scale 10^6): graph centrality — which vectors are the hubs of
  // the semantic neighborhood graph (representative-exemplar picking per
  // SemDeDup cluster). Scaled-integer arithmetic — (pr*85) div (deg*100)
  // contributions, exact commutative sums — makes the whole iteration
  // partition-order-independent and bit-identically replayable as
  // unrolled CTEs (float PageRank could never hash-match cross-engine).
  private def prRoundSql(prev: String, r: Int): String =
    s"""pc$r AS (SELECT d.src, (p.pr * 85) // (d.deg * 100) AS c
              FROM deg d JOIN $prev p ON d.src = p.id),
            p$r AS (SELECT e.dst AS id, CAST(150000 + sum(c) AS BIGINT) AS pr
              FROM edges e JOIN pc$r USING (src)
              GROUP BY e.dst)"""

  private val simPagerank = Q(
    "sim_pagerank",
    (s, dir) => {
      Similarity.pagerankInt(cachedMutualKnn(s, dir), "id1", "id2",
          rounds = 4)
        .select(col("id").as("vec_id"), col("pr"))
        .orderBy(col("vec_id"))
    },
    Some(s"""WITH $mutualKnnCteSql,
            edges AS (SELECT id1 AS src, id2 AS dst FROM mpairs
                      UNION ALL SELECT id2 AS src, id1 AS dst FROM mpairs),
            deg AS (SELECT src, count(1) AS deg FROM edges GROUP BY src),
            p0 AS (SELECT src AS id, CAST(1000000 AS BIGINT) AS pr FROM deg),
            ${prRoundSql("p0", 1)},
            ${prRoundSql("p1", 2)},
            ${prRoundSql("p2", 3)},
            ${prRoundSql("p3", 4)}
            SELECT id AS vec_id, pr FROM p4 ORDER BY vec_id"""))

  // Per-class confusion report over the kNN classifier — precision /
  // recall / F1 per label from exact integer tp/fp/fn counts (the eval
  // loop's next step after sim_knn_classify's raw votes). Two bounded
  // aggregations (one keyed by predicted label, one by true label) meet in
  // a label-cardinality full-outer join; the corpus only ever flows through
  // the bounded two-phase top-k inside knnClassify, so at 100 TB this is
  // the ANN scan plus a k-class-sized reduce.
  private val simConfusionF1 = Q(
    "sim_confusion_f1",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 50)
      val preds = Similarity.knnClassify(emb, queries, "vec_id", "embedding",
          "label", k = 5)
        .join(queries.select(col("vec_id").as("query_id"),
          col("label").as("true_label")), Seq("query_id"))
      val hit = when(col("pred_label") === col("true_label"), 1L).otherwise(0L)
      val byPred = preds.groupBy(col("pred_label").as("label"))
        .agg(count(lit(1)).as("__npred"), sum(hit).as("__tpp"))
      val byTrue = preds.groupBy(col("true_label").as("label"))
        .agg(count(lit(1)).as("__support"), sum(hit).as("__tpt"))
      byPred.join(byTrue, Seq("label"), "full_outer")
        .select(col("label"),
          coalesce(col("__tpt"), col("__tpp"), lit(0L)).as("tp"),
          (coalesce(col("__npred"), lit(0L)) - coalesce(col("__tpp"), lit(0L)))
            .as("fp"),
          (coalesce(col("__support"), lit(0L)) - coalesce(col("__tpt"), lit(0L)))
            .as("fn"),
          coalesce(col("__support"), lit(0L)).as("support"))
        .withColumn("prec", round(when(col("tp") + col("fp") > 0L,
          col("tp").cast("double") / (col("tp") + col("fp")))
          .otherwise(lit(0.0)), 4))
        .withColumn("rec", round(when(col("tp") + col("fn") > 0L,
          col("tp").cast("double") / (col("tp") + col("fn")))
          .otherwise(lit(0.0)), 4))
        .withColumn("f1", round(when(
          lit(2L) * col("tp") + col("fp") + col("fn") > 0L,
          lit(2.0) * col("tp") / (lit(2L) * col("tp") + col("fp") + col("fn")))
          .otherwise(lit(0.0)), 4))
        .orderBy(col("label"))
    },
    Some("""WITH ranked AS (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                     row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
                                  c.embedding::DOUBLE[]) DESC,
                                c.vec_id) AS rank
              FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
              WHERE q.vec_id < 50),
            nn AS (SELECT query_id, neighbor_id FROM ranked WHERE rank <= 5),
            v AS (
              SELECT nn.query_id, c.label AS l, count(1) AS votes
              FROM nn JOIN embeddings c ON c.vec_id = nn.neighbor_id
              GROUP BY 1, 2),
            best AS (
              SELECT query_id, l FROM (
                SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY votes DESC, l) AS rn FROM v) t
              WHERE rn = 1),
            preds AS (
              SELECT b.query_id, b.l AS pred_label, q.label AS true_label
              FROM best b JOIN embeddings q ON q.vec_id = b.query_id),
            byp AS (
              SELECT pred_label AS label, count(1) AS npred,
                     sum(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END) AS tpp
              FROM preds GROUP BY 1),
            byt AS (
              SELECT true_label AS label, count(1) AS support,
                     sum(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END) AS tpt
              FROM preds GROUP BY 1)
            SELECT CAST(label AS INT) AS label,
                   CAST(coalesce(tpt, tpp, 0) AS BIGINT) AS tp,
                   CAST(coalesce(npred, 0) - coalesce(tpp, 0) AS BIGINT) AS fp,
                   CAST(coalesce(support, 0) - coalesce(tpt, 0) AS BIGINT) AS fn,
                   CAST(coalesce(support, 0) AS BIGINT) AS support,
                   round(CASE WHEN coalesce(npred, 0) > 0
                     THEN CAST(coalesce(tpp, 0) AS DOUBLE) / npred
                     ELSE 0.0 END, 4) AS prec,
                   round(CASE WHEN coalesce(support, 0) > 0
                     THEN CAST(coalesce(tpt, 0) AS DOUBLE) / support
                     ELSE 0.0 END, 4) AS rec,
                   round(CASE WHEN 2 * coalesce(tpt, tpp, 0)
                              + (coalesce(npred, 0) - coalesce(tpp, 0))
                              + (coalesce(support, 0) - coalesce(tpt, 0)) > 0
                     THEN 2.0 * coalesce(tpt, tpp, 0)
                          / (2 * coalesce(tpt, tpp, 0)
                             + (coalesce(npred, 0) - coalesce(tpp, 0))
                             + (coalesce(support, 0) - coalesce(tpt, 0)))
                     ELSE 0.0 END, 4) AS f1
            FROM byp FULL OUTER JOIN byt USING (label)
            ORDER BY label"""))

  // Cluster-vs-label purity: after the Lloyd sweep, does each k-means cell
  // collect one label? The standard unsupervised-quality eval (purity =
  // majority-label fraction per cluster) — all counts exact integers from
  // one (cluster,label) reduce; the majority pick is the same
  // min(struct(-n, label)) bounded argmax as knnClassify's vote. The
  // oracle replays the full Lloyd chain (shared kmeansCteSql) plus the
  // assignment argmin, then the same aggregation.
  private val simClusterPurity = Q(
    "sim_cluster_purity",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val asg = Similarity.kmeansAssignments(emb, "vec_id", "embedding",
        k = 8, dim = 64, iters = 2)
      asg.join(emb.select(col("vec_id"), col("label")), Seq("vec_id"))
        .groupBy(col("list_id"), col("label"))
        .agg(count(lit(1)).as("__n"))
        .groupBy(col("list_id"))
        .agg(sum(col("__n")).as("n_vecs"),
          min(struct((-col("__n")).as("__neg"), col("label").as("__lab")))
            .as("__b"))
        .select(col("list_id"), col("n_vecs"),
          col("__b.__lab").as("major_label"),
          (-col("__b.__neg")).as("n_major"))
        .withColumn("purity",
          round(col("n_major").cast("double") / col("n_vecs"), 4))
        .orderBy(col("list_id"))
    },
    Some(s"""WITH $kmeansCteSql,
            df AS (SELECT e.vec_id, c.list_id,
                          list_sum(list_transform(range(1, 65),
                            i -> (e.v[i] - c.cvec[i]) * (e.v[i] - c.cvec[i]))) AS d2
                   FROM e, c2 c),
            asg AS (SELECT vec_id, list_id FROM (
                      SELECT *, row_number() OVER (PARTITION BY vec_id
                                                   ORDER BY d2, list_id) AS r
                      FROM df) t WHERE r = 1),
            cl AS (SELECT a.list_id, emb.label, count(1) AS n
                   FROM asg a JOIN embeddings emb USING (vec_id)
                   GROUP BY 1, 2),
            agg AS (SELECT list_id, sum(n) AS n_vecs FROM cl GROUP BY 1),
            mj AS (SELECT list_id, label AS major_label, n AS n_major FROM (
                     SELECT *, row_number() OVER (PARTITION BY list_id
                                                  ORDER BY n DESC, label) AS r
                     FROM cl) t WHERE r = 1)
            SELECT a.list_id, CAST(a.n_vecs AS BIGINT) AS n_vecs,
                   CAST(m.major_label AS INT) AS major_label,
                   CAST(m.n_major AS BIGINT) AS n_major,
                   round(CAST(m.n_major AS DOUBLE) / a.n_vecs, 4) AS purity
            FROM agg a JOIN mj m USING (list_id)
            ORDER BY a.list_id"""))

  // Range (epsilon-ball) retrieval — ALL neighbors above a similarity
  // floor, the other half of the ANN API surface next to top-k (dedup
  // wants "everything above 0.8", not "the best 5"). Exact baseline:
  // broadcast query side, one narrow filtered pass over the corpus —
  // at 100 TB the LSH bucket pre-filter (sim_lsh_ann's shape) bounds the
  // scan and this exact verify runs on the candidates only. The filter
  // applies to the ROUNDED cosine so the boundary is a 1e-4 grid point
  // both engines agree on.
  private val simRangeQuery = Q(
    "sim_range_query",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"),
          Similarity.toDouble(col("embedding")).as("__qv"))
      val c = emb.select(col("vec_id").as("neighbor_id"),
        Similarity.toDouble(col("embedding")).as("__cv"))
      c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
        .withColumn("cos",
          round(Similarity.cosine(col("__qv"), col("__cv")), 4))
        .filter(col("cos") >= 0.2)
        .select(col("query_id"), col("neighbor_id"), col("cos"))
        .orderBy(col("query_id"), col("neighbor_id"))
    },
    Some("""SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   round(list_cosine_similarity(q.embedding::DOUBLE[],
                     c.embedding::DOUBLE[]), 4) AS cos
            FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
            WHERE q.vec_id < 8
              AND round(list_cosine_similarity(q.embedding::DOUBLE[],
                    c.embedding::DOUBLE[]), 4) >= 0.2
            ORDER BY query_id, neighbor_id"""))

  // Johnson–Lindenstrauss signed random projection 64-d -> 16-d: the cheap
  // dimensionality-reduction lever before any ANN index (4x narrower
  // vectors = 4x less shuffle for every downstream cosine). Projection
  // matrix entries are +-1 derived from md5 of a seed-and-index tag —
  // broadcast-free compiled literals on the engine side and exactly
  // replayable by the oracle (the sim_lsh_ann posture). The query emits
  // original vs projected cosine per pair over a 30-vector slice, making
  // the JL distortion a measured artifact rather than a constant in a
  // paper; EvalCurationSpec pins the mean distortion bound.
  //
  // Oracle-exactness posture (the r9 red-row fix): the float components
  // are first quantized onto a 1e-4 integer grid via floor(x*1e4 + 0.5)
  // — identical IEEE ops in both engines, so identical grids. Every
  // downstream dot product is then a sum of integer-valued doubles
  // bounded far below 2^53 (|q_i| <= ~6e3, sum of 64 squares <= 2.4e9;
  // projected |p_j| <= 4e5, 16-term dot <= 2.6e12), making the sums
  // EXACT and therefore order-independent — no cross-engine float-
  // association tie to flip a rounded digit. The cosine of two exact
  // integers through sqrt/mul/div is correctly-rounded IEEE on identical
  // inputs, and the 4-decimal bucket is emitted as floor(cos*1e4)/1e4
  // (floor of identical doubles is exact) instead of the tie-unstable
  // round(double, 4).
  private val embedJlProject = Q(
    "embed_jl_project",
    (s, dir) => {
      val kOut = 16
      val dim = 64
      val signs: IndexedSeq[Seq[Double]] = (0 until kOut).map(j =>
        (0 until dim).map(d =>
          if (graft.functions.Vectors.MinHashSig
                .md5Long60(s"graft-jl-42-$j-$d") % 2L == 0L) 1.0 else -1.0))
      def qcos(a: Column, b: Column): Column = {
        val d2 = Similarity.dot(a, a) * Similarity.dot(b, b)
        when(d2 > 0.0, Similarity.dot(a, b) / sqrt(d2)).otherwise(lit(0.0))
      }
      def bucket4(c: Column): Column = floor(c * lit(10000.0)) / lit(10000.0)
      val emb = Tables.load(s, dir, "embeddings").filter(col("vec_id") < 30)
      val ev = transform(col("embedding"),
        x => floor(x.cast("double") * lit(10000.0) + lit(0.5)).cast("double"))
      val projected = emb.select(col("vec_id"),
        ev.as("embedding"),
        array((0 until kOut).map(j =>
          Similarity.dot(ev, typedLit(signs(j)))): _*).as("p"))
      val a = projected.select(col("vec_id").as("id1"),
        col("embedding").as("__e1"), col("p").as("__p1"))
      val b = projected.select(col("vec_id").as("id2"),
        col("embedding").as("__e2"), col("p").as("__p2"))
      a.join(b, col("id1") < col("id2"))
        .select(col("id1"), col("id2"),
          bucket4(qcos(col("__e1"), col("__e2"))).as("cos64"),
          bucket4(qcos(col("__p1"), col("__p2"))).as("cos16"))
        .orderBy(col("id1"), col("id2"))
    },
    Some("""WITH signs AS (
              SELECT j, d,
                     CASE WHEN ('0x' || substr(md5('graft-jl-42-' || j || '-' || d),
                       1, 15))::BIGINT % 2 = 0 THEN 1.0 ELSE -1.0 END AS sgn
              FROM range(0, 16) a(j), range(0, 64) b(d)),
            e AS (SELECT vec_id,
                         list_transform(embedding::DOUBLE[],
                           x -> floor(x * 10000.0 + 0.5)) AS q
                  FROM embeddings WHERE vec_id < 30),
            comp AS (
              SELECT e.vec_id, s.j, sum(e.q[s.d + 1] * s.sgn) AS pj
              FROM e, signs s
              GROUP BY 1, 2),
            proj AS (
              SELECT c.vec_id, e.q,
                     list(c.pj ORDER BY c.j) AS p
              FROM comp c JOIN e USING (vec_id)
              GROUP BY 1, 2)
            SELECT a.vec_id AS id1, b.vec_id AS id2,
                   floor(list_dot_product(a.q, b.q) /
                     sqrt(list_dot_product(a.q, a.q)
                          * list_dot_product(b.q, b.q)) * 10000.0) / 10000.0
                     AS cos64,
                   floor(list_dot_product(a.p, b.p) /
                     sqrt(list_dot_product(a.p, a.p)
                          * list_dot_product(b.p, b.p)) * 10000.0) / 10000.0
                     AS cos16
            FROM proj a JOIN proj b ON a.vec_id < b.vec_id
            ORDER BY id1, id2"""))

  // Ranking-quality eval beside the recall report: MRR and hits@1 per
  // index variant against the brute-force cosine truth, in the repo's
  // integer-exact posture — MRR is emitted as Σ 60/first_relevant_rank
  // (every rank 1..5 divides 60, so the sum is an exact integer; no
  // float reciprocal crosses the oracle). Known-item form: the relevant
  // document is the TRUE nearest neighbor only, so the metric separates
  // variants that recall-style set-overlap saturates at this corpus
  // size; a query whose variant never surfaces the true NN contributes
  // 0 to the sum and drops from n_hit_queries.
  private val simRankEval = Q(
    "sim_rank_eval",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
      val truth = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 1)
        .select(col("query_id"), col("neighbor_id"))
      def lsh(ph: Int, ps: Int) =
        Similarity.lshTopK(emb, q, "vec_id", "embedding", dim = 64, k = 5,
          bits = 4, tables = 4, probeHamming = ph, probeSeq = ps)
      val variants = Seq(
        ("ivf_nprobe6", Similarity.ivfTopK(emb, q, "vec_id", "embedding",
          k = 5, nlist = 16, nprobe = 6)),
        ("lsh_0probe", lsh(0, 0)),
        ("lsh_hamming1", lsh(1, 0)),
        ("pq_adc_m8_rr32", Similarity.rerankTopK(
          Similarity.pqAdcTopK(emb, q, "vec_id", "embedding",
              cachedPqModel(s, dir, m = 8), k = 32)
            .select(col("query_id"), col("neighbor_id")),
          emb, "vec_id", "embedding", k = 5)))
      val tagged = variants.map { case (n, df) =>
        df.select(lit(n).as("variant"), col("query_id"),
          col("neighbor_id"), col("rank"))
      }.reduce(_ unionByName _)
      tagged.join(truth, Seq("query_id", "neighbor_id"))
        .groupBy(col("variant"), col("query_id"))
        .agg(min(col("rank")).as("__fr"))
        .groupBy(col("variant"))
        .agg(sum(expr("60 div __fr")).as("mrr_x60"),
          count(when(col("__fr") === 1, 1)).as("hits_at_1"),
          count(lit(1)).as("n_hit_queries"))
        .orderBy(col("variant"))
    },
    Some(s"""WITH e AS MATERIALIZED (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            norm AS MATERIALIZED (
              SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n FROM e),
            truth AS MATERIALIZED (
              SELECT query_id, neighbor_id FROM (
                SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       row_number() OVER (PARTITION BY q.vec_id
                         ORDER BY list_dot_product(q.v, c.v) / (q.n * c.n) DESC,
                                  c.vec_id) AS rank
                FROM norm q JOIN norm c ON q.vec_id <> c.vec_id
                WHERE q.vec_id < 8) t WHERE rank <= 1),
            planes AS MATERIALIZED (
              SELECT t, b, list(h ORDER BY d) AS plane
              FROM (SELECT t.t AS t, b.b AS b, d.d AS d,
                           ('0x' || substr(md5('graft-srp-' || (42 + t.t) || '-' || b.b || '-' || d.d), 1, 15))::BIGINT
                             / 576460752303423488.0 - 1.0 AS h
                    FROM range(0, 4) t(t), range(0, 4) b(b), range(0, 64) d(d)) raw
              GROUP BY t, b),
            sigs AS MATERIALIZED (
              SELECT e.vec_id, p.t,
                     SUM(CASE WHEN list_dot_product(e.v, p.plane) > 0
                              THEN (CAST(1 AS BIGINT) << p.b) ELSE 0 END) AS bucket
              FROM e, planes p GROUP BY e.vec_id, p.t),
            p0 AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
                   FROM sigs q JOIN sigs c ON q.t = c.t AND q.bucket = c.bucket
                   WHERE q.vec_id < 8 AND q.vec_id <> c.vec_id),
            r0k AS (SELECT query_id, neighbor_id, rank FROM (
                     SELECT p.query_id, p.neighbor_id,
                            row_number() OVER (PARTITION BY p.query_id
                              ORDER BY list_dot_product(q.v, c.v) / (q.n * c.n) DESC,
                                       p.neighbor_id) AS rank
                     FROM p0 p JOIN norm q ON p.query_id = q.vec_id
                               JOIN norm c ON p.neighbor_id = c.vec_id) t
                   WHERE rank <= 5),
            qb AS (SELECT vec_id, t,
                          CASE WHEN j.j = 0 THEN bucket
                               ELSE xor(bucket, CAST(1 AS BIGINT) << (j.j - 1)) END AS bucket
                   FROM sigs, range(0, 5) j(j) WHERE vec_id < 8),
            pb AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
                   FROM qb q JOIN sigs c ON q.t = c.t AND q.bucket = c.bucket
                   WHERE q.vec_id <> c.vec_id),
            rbk AS (SELECT query_id, neighbor_id, rank FROM (
                     SELECT p.query_id, p.neighbor_id,
                            row_number() OVER (PARTITION BY p.query_id
                              ORDER BY list_dot_product(q.v, c.v) / (q.n * c.n) DESC,
                                       p.neighbor_id) AS rank
                     FROM pb p JOIN norm q ON p.query_id = q.vec_id
                               JOIN norm c ON p.neighbor_id = c.vec_id) t
                   WHERE rank <= 5),
            cent AS (SELECT row_number() OVER (ORDER BY vec_id) AS list_id, v AS cvec
                     FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 16) t),
            assign_all AS MATERIALIZED (
              SELECT nm.vec_id, nm.v, nm.n, c.list_id,
                     list_dot_product(nm.v, c.cvec)
                       / (nm.n * sqrt(list_dot_product(c.cvec, c.cvec))) AS cd
              FROM norm nm, cent c),
            corpus_assigned AS (
              SELECT vec_id AS neighbor_id, v AS cv, n AS cn, list_id FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cd DESC, list_id) AS r
                FROM assign_all) t WHERE r = 1),
            probes AS (
              SELECT vec_id AS query_id, v AS qv, n AS qn, list_id FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cd DESC, list_id) AS r
                FROM assign_all WHERE vec_id < 8) t WHERE r <= 6),
            rik AS (SELECT query_id, neighbor_id, rank FROM (
                     SELECT p.query_id, a.neighbor_id,
                            row_number() OVER (PARTITION BY p.query_id
                              ORDER BY list_dot_product(p.qv, a.cv) / (p.qn * a.cn) DESC,
                                       a.neighbor_id) AS rank
                     FROM probes p JOIN corpus_assigned a USING (list_id)
                     WHERE p.query_id <> a.neighbor_id) t
                   WHERE rank <= 5),
            ${(1 to 8).map(i => pqLloydCte(s"u$i", 1 + 8 * (i - 1), 8 * i))
              .mkString(",\n            ")},
            ${pqRankSql("short8", (1 to 8).map("u" + _), k = 32)},
            rr8k AS (SELECT query_id, neighbor_id, rank FROM (
                      SELECT s.query_id, s.neighbor_id,
                             row_number() OVER (PARTITION BY s.query_id
                               ORDER BY list_dot_product(q.v, c.v) / (q.n * c.n) DESC,
                                        s.neighbor_id) AS rank
                      FROM short8 s
                      JOIN norm q ON s.query_id = q.vec_id
                      JOIN norm c ON s.neighbor_id = c.vec_id) t
                    WHERE rank <= 5),
            allv AS (
              SELECT 'ivf_nprobe6' AS variant, query_id, neighbor_id, rank FROM rik
              UNION ALL
              SELECT 'lsh_0probe', query_id, neighbor_id, rank FROM r0k
              UNION ALL
              SELECT 'lsh_hamming1', query_id, neighbor_id, rank FROM rbk
              UNION ALL
              SELECT 'pq_adc_m8_rr32', query_id, neighbor_id, rank FROM rr8k),
            fr AS (
              SELECT a.variant, a.query_id, min(a.rank) AS fr
              FROM allv a JOIN truth t
                ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
              GROUP BY 1, 2)
            SELECT variant,
                   CAST(sum(60 // fr) AS BIGINT) AS mrr_x60,
                   CAST(count(CASE WHEN fr = 1 THEN 1 END) AS BIGINT)
                     AS hits_at_1,
                   CAST(count(*) AS BIGINT) AS n_hit_queries
            FROM fr GROUP BY variant ORDER BY variant"""))

  val qs: Seq[Q] = Seq(simCosineTopk, simCentroid, simLsh, simIvf,
    simIvfPersisted,
    dedupEmbedding, dedupLshCosine, dedupSemantic, embedNormFilter,
    simMutualKnn, simKmeans, simIvfTrained, simIvfCompact, simPq,
    simNnDescent,
    simNnDescentConverged, simLabelProp, simTriangles, simPagerank,
    simComponents, simLshMultiprobe, simLshProbeDirected, simRecallReport,
    simPqM4, simIvfAppend, streamIvfMaintain, streamIvfCompact,
    simIvfPq, simIvfPqTrained,
    simKnnClassify,
    simPcaPower, simDbscan, simConfusionF1, embedJlProject,
    simClusterPurity, simRangeQuery, simRankEval, simCoreness, simMmr,
    searchHardNegatives)
}
