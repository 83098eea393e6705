package graft.queries

import graft.Tables
import graft.operators.SeqScan
import graft.pipeline.Multimodal
import graft.sources.Fasta
import org.apache.spark.sql.functions._

/** SURVEY §2.9 Q4/Q6 scan operators, §2.1 S3/S4 FASTA source/sink, and the
  * multimodal pipeline — over DNA derived from `documents` text (the same
  * derivation bio_revcomp uses, so oracles can replicate it).
  */
object ScanQueries extends QueryModule {

  private def dnaDocs(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.load(s, dir, "documents")
      .withColumn("dna", regexp_replace(upper(col("text")), "[^ACGT]", ""))

  private val dnaSql = "regexp_replace(upper(text), '[^ACGT]', '', 'g')"

  // Q4: exact tag scan — library = 8-mers cut from docs 0-2, scanned against
  // every contig on both strands (overlapping hit semantics to match the
  // position-scan oracle).
  private val q4TagScan = Q(
    "q4_tag_scan",
    (s, dir) => {
      val docs = dnaDocs(s, dir)
      val lib = docs.filter(col("doc_id") < 3 && length(col("dna")) >= 12)
        .select(concat(lit("L"), col("doc_id")).as("locus"),
          lit("1").as("allele_id"),
          substring(col("dna"), 3, 8).as("allele_seq"))
      SeqScan.exactTagScan(
          docs.filter(length(col("dna")) >= 8), "doc_id", "dna",
          lib, "locus", "allele_id", "allele_seq", overlapping = true)
        .select(col("doc_id"), col("locus"), col("start_pos"),
          col("end_pos"), col("reverse"))
        .orderBy(col("doc_id"), col("locus"), col("start_pos"), col("reverse"))
    },
    Some(s"""WITH d AS (SELECT doc_id, $dnaSql AS dna FROM documents),
             $q4HitCtesSql
             SELECT doc_id, locus, start_pos, end_pos, reverse FROM hits
             ORDER BY doc_id, locus, start_pos, reverse"""))

  // One-pass Aho-Corasick twin of q4_tag_scan: the WHOLE library (both
  // strands) compiles into one broadcast automaton and each contig is
  // walked once — O(len + hits) vs O(len × nPatterns) — with identical
  // hit rows, so the oracle is the same replay. The scale case: a 5k-
  // allele library costs the same contig pass as a 3-allele one.
  private val q4MultiPattern = Q(
    "q4_multi_pattern",
    (s, dir) => {
      val docs = dnaDocs(s, dir)
      val lib = docs.filter(col("doc_id") < 3 && length(col("dna")) >= 12)
        .select(concat(lit("L"), col("doc_id")).as("locus"),
          lit("1").as("allele_id"),
          substring(col("dna"), 3, 8).as("allele_seq"))
      SeqScan.multiPatternTagScan(
          docs.filter(length(col("dna")) >= 8), "doc_id", "dna",
          lib, "locus", "allele_id", "allele_seq")
        .select(col("doc_id"), col("locus"), col("start_pos"),
          col("end_pos"), col("reverse"))
        .orderBy(col("doc_id"), col("locus"), col("start_pos"), col("reverse"))
    },
    Some(s"""WITH d AS (SELECT doc_id, $dnaSql AS dna FROM documents),
             $q4HitCtesSql
             SELECT doc_id, locus, start_pos, end_pos, reverse FROM hits
             ORDER BY doc_id, locus, start_pos, reverse"""))

  // shared oracle fragment: the q4 exact-scan hit CTEs (reference a `d`
  // CTE with the cleaned DNA; used by q4_tag_scan, the seeded twin, and
  // the PCR-filtered composition below)
  // (def, not val: referenced by q4TagScan's oracle above its textual
  // position — a val would still be null at that point)
  private def q4HitCtesSql =
    """lib AS (SELECT 'L' || doc_id AS locus,
                      substring(dna, 3, 8) AS fwd,
                      reverse(translate(substring(dna, 3, 8), 'ACGT', 'TGCA')) AS rev
               FROM d WHERE doc_id < 3 AND length(dna) >= 12),
       contigs AS (SELECT doc_id, dna FROM d WHERE length(dna) >= 8),
       hits AS (
         SELECT c.doc_id, l.locus, CAST(p AS BIGINT) AS start_pos,
                CAST(p + 7 AS BIGINT) AS end_pos, false AS reverse
         FROM contigs c, lib l,
              unnest(list_filter(range(1, length(c.dna) - 6),
                p -> substring(c.dna, p, 8) = l.fwd)) t(p)
         UNION ALL
         SELECT c.doc_id, l.locus, CAST(p AS BIGINT), CAST(p + 7 AS BIGINT), true
         FROM contigs c, lib l,
              unnest(list_filter(range(1, length(c.dna) - 6),
                p -> substring(c.dna, p, 8) = l.rev)) t(p)
         WHERE l.rev != l.fwd)"""

  // Q4 seeded (Q3→Q4): the same scan through the k-mer seed prefilter —
  // a single codegen'd dictionary sweep per contig (Bio.KmerCandidates)
  // yields candidate (contig, allele, strand) pairs; the fused occurrence
  // kernel runs only on candidates. Identical output to q4_tag_scan (same
  // oracle).
  private val q4TagScanSeeded = Q(
    "q4_tag_scan_seeded",
    (s, dir) => {
      val docs = dnaDocs(s, dir)
      val lib = docs.filter(col("doc_id") < 3 && length(col("dna")) >= 12)
        .select(concat(lit("L"), col("doc_id")).as("locus"),
          lit("1").as("allele_id"),
          substring(col("dna"), 3, 8).as("allele_seq"))
      SeqScan.seededTagScan(
          docs.filter(length(col("dna")) >= 8), "doc_id", "dna",
          lib, "locus", "allele_id", "allele_seq", k = 6, overlapping = true)
        .select(col("doc_id"), col("locus"), col("start_pos"),
          col("end_pos"), col("reverse"))
        .orderBy(col("doc_id"), col("locus"), col("start_pos"), col("reverse"))
    },
    q4TagScan.oracle)

  // Q4 incremental (the autotagger's actual nightly posture — autotag.pl
  // re-runs limited to untagged isolates): even-doc tags exist from "the
  // previous run" (fixture = the exact scan over even docs); the
  // incremental job anti-joins the ids-only pending (contig, locus) frame
  // against them BEFORE any contig text is touched and scans only the
  // remainder. Result == the full scan minus already-tagged pairs (odd-doc
  // hits here: even pending pairs rescan to nothing on identical data —
  // the union property is pinned in SeqScanSpec).
  private val q4AutotagIncremental = Q(
    "q4_autotag_incremental",
    (s, dir) => {
      val docs = dnaDocs(s, dir)
      val contigs = docs.filter(length(col("dna")) >= 8)
      val lib = docs.filter(col("doc_id") < 3 && length(col("dna")) >= 12)
        .select(concat(lit("L"), col("doc_id")).as("locus"),
          lit("1").as("allele_id"),
          substring(col("dna"), 3, 8).as("allele_seq"))
      val existing = SeqScan.exactTagScan(
          contigs.filter(col("doc_id") % 2 === 0), "doc_id", "dna",
          lib, "locus", "allele_id", "allele_seq", overlapping = true)
        .select(col("doc_id"), col("locus"))
      SeqScan.incrementalTagScan(
          contigs, "doc_id", "dna", existing,
          lib, "locus", "allele_id", "allele_seq", overlapping = true)
        .select(col("doc_id"), col("locus"), col("start_pos"),
          col("end_pos"), col("reverse"))
        .orderBy(col("doc_id"), col("locus"), col("start_pos"), col("reverse"))
    },
    Some(s"""WITH d AS (SELECT doc_id, $dnaSql AS dna FROM documents),
             $q4HitCtesSql
             SELECT doc_id, locus, start_pos, end_pos, reverse FROM hits
             WHERE doc_id % 2 = 1
             ORDER BY doc_id, locus, start_pos, reverse"""))

  // Genome-shaped scan pair: ~6 kb contigs (100 docs concatenated) × a
  // ~200-allele library through both paths. Exact = O(|library|) kernel
  // scans per contig; seeded = one dictionary sweep + kernel scans on
  // candidate pairs only. Honest bench note: at this corpus scale the
  // exact path is already sub-second (indexOf streams GB/s, contigs are
  // kb not Mb), so the seeded path's fixed costs (seed collect+broadcast,
  // candidate join, second contig pass) dominate its wall time; the
  // crossover needs genome-scale contigs × 10^4-allele libraries, where
  // exact grows linearly in |library| and seeded stays flat (cost model in
  // the SeqScan.seededTagScan doc). Every allele is cut from a doc that is
  // part of some contig, so hits are guaranteed.
  private def longContigs(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val docs = dnaDocs(s, dir)
    val contigs = docs
      .groupBy(floor(col("doc_id") / 100).cast("long").as("cid"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("doc_id"), col("dna")))),
        x => x.getField("dna")), "").as("dna"))
    val lib = docs.filter(col("doc_id") < 200 && length(col("dna")) >= 26)
      .select(concat(lit("L"), col("doc_id")).as("locus"),
        lit("1").as("allele_id"),
        substring(col("dna"), 3, 24).as("allele_seq"))
    (contigs, lib)
  }

  private val longContigOracle =
    s"""WITH d AS (SELECT doc_id, $dnaSql AS dna FROM documents),
        contigs AS (SELECT doc_id // 100 AS cid,
                           string_agg(dna, '' ORDER BY doc_id) AS dna
                    FROM d GROUP BY 1),
        lib AS (SELECT 'L' || doc_id AS locus,
                       substring(dna, 3, 24) AS fwd,
                       reverse(translate(substring(dna, 3, 24), 'ACGT', 'TGCA')) AS rev
                FROM d WHERE doc_id < 200 AND length(dna) >= 26),
        hits AS (
          SELECT c.cid, l.locus, CAST(p AS BIGINT) AS start_pos,
                 CAST(p + 23 AS BIGINT) AS end_pos, false AS reverse
          FROM contigs c, lib l,
               unnest(list_filter(range(1, length(c.dna) - 22),
                 p -> substring(c.dna, p, 24) = l.fwd)) t(p)
          UNION ALL
          SELECT c.cid, l.locus, CAST(p AS BIGINT), CAST(p + 23 AS BIGINT), true
          FROM contigs c, lib l,
               unnest(list_filter(range(1, length(c.dna) - 22),
                 p -> substring(c.dna, p, 24) = l.rev)) t(p)
          WHERE l.rev != l.fwd)
        SELECT cid, locus, start_pos, end_pos, reverse FROM hits
        ORDER BY cid, locus, start_pos, reverse"""

  private val q4LongExact = Q(
    "q4_longcontig_exact",
    (s, dir) => {
      val (contigs, lib) = longContigs(s, dir)
      SeqScan.exactTagScan(contigs, "cid", "dna",
          lib, "locus", "allele_id", "allele_seq", overlapping = true)
        .select(col("cid"), col("locus"), col("start_pos"),
          col("end_pos"), col("reverse"))
        .orderBy(col("cid"), col("locus"), col("start_pos"), col("reverse"))
    },
    Some(longContigOracle))

  private val q4LongSeeded = Q(
    "q4_longcontig_seeded",
    (s, dir) => {
      val (contigs, lib) = longContigs(s, dir)
      SeqScan.seededTagScan(contigs, "cid", "dna",
          lib, "locus", "allele_id", "allele_seq", k = 12, overlapping = true)
        .select(col("cid"), col("locus"), col("start_pos"),
          col("end_pos"), col("reverse"))
        .orderBy(col("cid"), col("locus"), col("start_pos"), col("reverse"))
    },
    Some(longContigOracle))

  // Q3: exemplar pruning (find_exemplars.pl:95-140) — greedy per
  // (locus, length) in ascending allele-id order at 80% variation; the
  // pruned library is what the seeded scan runs against at scale. Oracle:
  // the same greedy replayed as a DuckDB recursive CTE (state = exemplar
  // list per group, all groups advancing one allele per iteration).
  private val q3ExemplarPrune = Q(
    "q3_exemplar_prune",
    (s, dir) => {
      val docs = dnaDocs(s, dir)
      val lib = docs.filter(col("doc_id") < 40 && length(col("dna")) >= 16)
        .select(concat(lit("L"), col("doc_id") % 3).as("locus"),
          col("doc_id").cast("string").as("allele_id"),
          substring(col("dna"), 1, 16).as("allele_seq"))
      SeqScan.findExemplars(lib, "locus", "allele_id", "allele_seq", 80.0)
        .select(col("locus"), col("allele_id").cast("long").as("allele_id"))
        .orderBy(col("locus"), col("allele_id"))
    },
    Some(s"""WITH RECURSIVE
             lib AS (
               SELECT 'L' || CAST(doc_id % 3 AS VARCHAR) AS locus,
                      CAST(doc_id AS VARCHAR) AS allele_id,
                      substring($dnaSql, 1, 16) AS seq
               FROM documents
               WHERE doc_id < 40 AND length($dnaSql) >= 16),
             grp AS (
               SELECT locus, list(struct_pack(id := allele_id, seq := seq)
                                  ORDER BY CAST(allele_id AS INT)) AS items
               FROM lib GROUP BY locus),
             g AS (
               SELECT locus, items, 1 AS i, [items[1]] AS ex FROM grp
               UNION ALL
               SELECT locus, items, i + 1,
                      CASE WHEN len(list_filter(ex, e ->
                             hamming(items[i + 1].seq, e.seq) * 100.0
                               / length(items[i + 1].seq) < 80.0)) = 0
                           THEN list_append(ex, items[i + 1]) ELSE ex END
               FROM g WHERE i < len(items))
             SELECT locus, CAST(u.id AS BIGINT) AS allele_id
             FROM (SELECT locus, ex,
                          row_number() OVER (PARTITION BY locus
                            ORDER BY i DESC) AS rn
                   FROM g) f, unnest(f.ex) AS t(u)
             WHERE rn = 1
             ORDER BY locus, allele_id"""))

  // Q6: mutation scan — three defined point variants at fixed positions.
  private val q6MutationScan = Q(
    "q6_mutation_scan",
    (s, dir) => {
      import s.implicits._
      val muts = Seq(("m1", 5, "A", "G"), ("m2", 10, "C", "T"), ("m3", 20, "G", "A"))
        .toDF("mut_id", "position", "wild_type", "variant")
      SeqScan.mutationScan(
          dnaDocs(s, dir).filter(length(col("dna")) >= 20), "doc_id", "dna",
          muts, "mut_id", "position", "wild_type", "variant")
        .orderBy(col("doc_id"), col("mut_id"))
    },
    Some(s"""WITH d AS (SELECT doc_id, $dnaSql AS dna FROM documents),
             m(mut_id, position, wild_type, variant) AS (
               VALUES ('m1', 5, 'A', 'G'), ('m2', 10, 'C', 'T'),
                      ('m3', 20, 'G', 'A'))
             SELECT doc_id, mut_id, position,
                    substring(dna, position, 1) AS observed,
                    CASE WHEN substring(dna, position, 1) = wild_type THEN 'wild_type'
                         WHEN substring(dna, position, 1) = variant THEN 'variant'
                         ELSE 'other' END AS status
             FROM d, m
             WHERE length(dna) >= 20 AND length(dna) >= position
             ORDER BY doc_id, mut_id"""))

  // S3/S4: FASTA sink + source round trip — write the derived DNA as
  // wrapped FASTA, re-read it distributed, verify content by md5.
  private val s3FastaRoundtrip = Q(
    "s3_fasta_roundtrip",
    (s, dir) => {
      val docs = dnaDocs(s, dir).filter(length(col("dna")) > 0)
        .select(col("doc_id").cast("string").as("id"),
          col("lang").as("desc"), col("dna"))
      val path = s"/tmp/graft_fasta_${dir.replaceAll("[^0-9.]", "")}"
      Fasta.write(docs, "id", "dna", path, desc = Some("desc"))
      Fasta.read(s, path)
        .select(col("id").cast("long").as("doc_id"),
          col("description"),
          length(col("sequence")).cast("long").as("seq_len"),
          md5(col("sequence")).as("seq_md5"))
        .orderBy(col("doc_id"))
    },
    Some(s"""SELECT doc_id, lang AS description,
                    length($dnaSql) AS seq_len, md5($dnaSql) AS seq_md5
             FROM documents WHERE length($dnaSql) > 0
             ORDER BY doc_id"""))

  // Multimodal: binary media column through the partition-preserving decode
  // (mapPartitions) — byte length checked against the oracle; hash/feature
  // columns are engine-defined (MultimodalSpec).
  private val mmDecode = Q(
    "mm_decode_features",
    (s, dir) => {
      val media = Multimodal.syntheticMedia(
        Tables.load(s, dir, "documents"), "doc_id", "text")
      Multimodal.decodeFeatures(media, "doc_id")
        .select(col("doc_id"), col("n_bytes"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
            FROM documents ORDER BY doc_id"""))

  // Multimodal resize (thumbnailing shape): binary in/out through the
  // partition-preserving kernel; output bytes value-hashed against the
  // oracle via their hex form (DuckDB can't slice BLOBs, so both sides
  // compare lower(hex(first budget bytes))).
  private val mmResize = Q(
    "mm_resize",
    (s, dir) => {
      val media = Multimodal.syntheticMedia(
        Tables.load(s, dir, "documents"), "doc_id", "text")
      Multimodal.resize(media, "doc_id", targetW = 64, targetH = 64)
        .select(col("doc_id"),
          length(col("media")).cast("long").as("n_bytes"),
          md5(lower(hex(col("media")))).as("out_md5"))
        .orderBy(col("doc_id"))
    },
    // budget = 64*64/64 = 64 bytes → 128 hex chars
    Some("""SELECT doc_id,
                   CAST(length(substring(hex(encode(text)), 1, 128)) / 2 AS BIGINT)
                     AS n_bytes,
                   md5(lower(substring(hex(encode(text)), 1, 128))) AS out_md5
            FROM documents ORDER BY doc_id"""))

  // Multimodal frame sampling (video frame-extraction shape): bounded
  // one-to-many explode per media row.
  private val mmFrames = Q(
    "mm_frame_sample",
    (s, dir) => {
      val media = Multimodal.syntheticMedia(
        Tables.load(s, dir, "documents").filter(col("doc_id") < 50),
        "doc_id", "text")
      Multimodal.frameSample(media, "doc_id", stride = 64, maxFrames = 4)
        .orderBy(col("doc_id"), col("frame_no"))
    },
    // synthetic media = utf-8 text bytes, so the oracle reproduces the frame
    // tokens from base64 of the same bytes with the same stride/cap arithmetic
    Some("""WITH m AS (
              SELECT doc_id, to_base64(CAST(text AS BLOB)) AS b64,
                     greatest(least(CAST(floor(octet_length(CAST(text AS BLOB))/64.0) AS INT) - 1, 3), 0) AS maxi
              FROM documents WHERE doc_id < 50),
            e AS (SELECT doc_id, b64, unnest(generate_series(0, maxi)) AS i FROM m)
            SELECT doc_id, CAST(i AS INT) AS frame_no,
                   substr(b64, CAST(i*8+1 AS INT), 8) AS frame_token
            FROM e ORDER BY doc_id, frame_no"""))

  // G7: per-site character frequency table (LocusExplorer get_freq_table /
  // SNPsites) — positions 1..20 of each derived DNA sequence.
  private val g7SiteFreq = Q(
    "g7_site_freq",
    (s, dir) => {
      val docs = dnaDocs(s, dir).filter(length(col("dna")) > 0)
      docs.select(posexplode(split(substring(col("dna"), 1, 20), "")))
        .select((col("pos") + 1).cast("long").as("position"), col("col").as("ch"))
        .filter(col("ch") =!= "")
        .groupBy(col("position"), col("ch"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("position"), col("ch"))
    },
    Some(s"""WITH d AS (SELECT $dnaSql AS dna FROM documents
                        WHERE length($dnaSql) > 0)
             SELECT CAST(p AS BIGINT) AS position, substring(dna, p, 1) AS ch,
                    count(1) AS n
             FROM d, unnest(range(1, least(length(dna), 20) + 1)) t(p)
             GROUP BY 1, 2 ORDER BY 1, 2"""))

  // Multimodal patch tiling (ViT patching shape): 32-byte raster rows,
  // 16×2-byte tiles → 2 tiles per row-pair. Oracle replays the same 2D
  // byte arithmetic over hex strings (DuckDB can't slice BLOBs).
  private val mmTile = Q(
    "mm_tile",
    (s, dir) => {
      val media = Multimodal.syntheticMedia(
        Tables.load(s, dir, "documents"), "doc_id", "text")
      Multimodal.tile(media, "doc_id", rowBytes = 32, tileW = 16, tileH = 2)
        .select(col("doc_id"), col("tile_x"), col("tile_y"),
          length(col("tile")).cast("long").as("n_bytes"),
          md5(lower(hex(col("tile")))).as("tile_md5"))
        .orderBy(col("doc_id"), col("tile_y"), col("tile_x"))
    },
    Some("""WITH m AS (
              SELECT doc_id, hex(encode(text)) AS hx,
                     CAST(floor(octet_length(encode(text)) / 32.0 / 2.0)
                          AS INT) AS ny
              FROM documents),
            t AS (SELECT doc_id, hx,
                         unnest(generate_series(0, ny * 2 - 1)) AS tt
                  FROM m WHERE ny >= 1)
            SELECT doc_id, CAST(tt % 2 AS INT) AS tile_x,
                   CAST(tt // 2 AS INT) AS tile_y,
                   CAST(32 AS BIGINT) AS n_bytes,
                   md5(lower(
                     substr(hx, CAST(((tt // 2 * 2) * 32
                       + tt % 2 * 16) * 2 + 1 AS INT), 32) ||
                     substr(hx, CAST(((tt // 2 * 2 + 1) * 32
                       + tt % 2 * 16) * 2 + 1 AS INT), 32))) AS tile_md5
            FROM t ORDER BY doc_id, tile_y, tile_x"""))

  // Multimodal near-dup: 60-bit perceptual-hash stand-in (16-byte media
  // blocks → md5 block hashes → SimHash majority vote; the feature step
  // is honestly stubbed — byte blocks where a real pHash takes DCT
  // coefficients — while the signature algebra and the banded join ARE
  // the production pipeline). 4×15-bit bands are EXACT for hamming ≤ 3
  // by pigeonhole, so the oracle is the plain all-pairs hamming filter —
  // no banding replay needed, equality proves the bands lost nothing.
  private val mmPhashDedup = Q(
    "mm_phash_dedup",
    (s, dir) => {
      val media = Multimodal.syntheticMedia(
        Tables.load(s, dir, "documents"), "doc_id", "text")
      Multimodal.phashNearDupPairs(media, "doc_id", maxHamming = 3)
        .withColumn("hamming", col("hamming").cast("long"))
        .orderBy(col("id1"), col("id2"))
    },
    Some("""WITH hexs AS (
              SELECT doc_id, hex(encode(text)) AS hx FROM documents),
            blocks AS (
              SELECT doc_id,
                     list_transform(generate_series(0,
                         CAST(ceil(len(hx) / 32.0) AS BIGINT) - 1),
                       i -> ('0x' || substr(md5(substr(hx,
                              CAST(i * 32 + 1 AS BIGINT), 32)), 1, 15))::BIGINT)
                       AS bs
              FROM hexs),
            hv AS (SELECT doc_id, unnest(bs) AS h FROM blocks),
            votes AS (
              SELECT doc_id, r.b AS b,
                     SUM(CASE WHEN (h >> r.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
              FROM hv, range(0, 60) r(b) GROUP BY 1, 2),
            sim AS (
              SELECT doc_id,
                     SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b)
                              ELSE 0 END) AS ph
              FROM votes GROUP BY 1)
            SELECT a.doc_id AS id1, b.doc_id AS id2,
                   CAST(bit_count(xor(a.ph, b.ph)) AS BIGINT) AS hamming
            FROM sim a JOIN sim b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.ph, b.ph)) <= 3
            ORDER BY id1, id2"""))

  // REAL perceptual hash for raw rasters (r12 VERDICT #2): a 2-D integer
  // DCT-II over a 32×32 block-mean downsample of synthetic 64×64
  // grayscale rasters — the feature step is genuinely perceptual here
  // (brightness-shifted twins land within hamming 3 of their base and
  // pair through the same 4×15 banding; unrelated rasters don't), with
  // only the compressed-format DECODE still stubbed (no codec libs).
  // Everything is integer-exact — fixed-point basis (embedded in this
  // oracle as literals generated from the SAME Scala array), floor
  // block means, exact BIGINT coefficient sums, lower-median threshold
  // — so the oracle replays the full transform and the all-pairs
  // hamming filter proves the banding lost nothing (pigeonhole
  // exactness, as in mm_phash_dedup). MultimodalSpec pins the
  // perturbation-robustness property on controlled rasters.
  private val mmPhashDct = Q(
    "mm_phash_dct",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val baseIds = docs.filter(col("doc_id") < 96)
        .select(col("doc_id"), col("doc_id").as("seed"))
      val twinIds = docs.filter(col("doc_id") < 96 && col("doc_id") % 3 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"),
          col("doc_id").as("seed"))
      val corpus = Multimodal
        .syntheticRaster(baseIds, "doc_id", "seed", 64, 64, brightness = 0)
        .unionByName(Multimodal.syntheticRaster(
          twinIds, "doc_id", "seed", 64, 64, brightness = 3))
      Multimodal.phashDctPairs(corpus, "doc_id", rowBytes = 64)
        .withColumn("hamming", col("hamming").cast("long"))
        .orderBy(col("id1"), col("id2"))
    },
    Some(s"""WITH ids AS (
              SELECT doc_id AS id, doc_id AS seed, 0 AS br
              FROM documents WHERE doc_id < 96
              UNION ALL
              SELECT doc_id + 100000, doc_id, 3
              FROM documents WHERE doc_id < 96 AND doc_id % 3 = 0),
            blocks AS (
              SELECT id, br, blk.blk AS blk,
                     md5('graft-px-' || seed || '-' || blk.blk) AS hx
              FROM ids, range(0, 256) blk(blk)),
            pix AS (
              SELECT id, blk * 16 + k.k AS idx,
                     ('0x' || substr(hx, k.k * 2 + 1, 2))::BIGINT % 128 + br
                       AS px
              FROM blocks, range(0, 16) k(k)),
            pgrid AS (
              SELECT id, (idx // 64) // 2 AS bi, (idx % 64) // 2 AS bj,
                     CAST(sum(px) // 4 AS BIGINT) AS p
              FROM pix GROUP BY 1, 2, 3),
            basis(u, i, b) AS (VALUES ${Multimodal.dctBasisSqlValues}),
            rmid AS (
              SELECT g.id, ba.u, g.bj, CAST(sum(ba.b * g.p) AS BIGINT) AS rv
              FROM pgrid g JOIN basis ba ON ba.i = g.bi
              GROUP BY 1, 2, 3),
            co AS (
              SELECT r.id, r.u * 8 + bv.u AS flat,
                     CAST(sum(bv.b * r.rv) AS BIGINT) AS c
              FROM rmid r JOIN basis bv ON bv.i = r.bj
              GROUP BY 1, 2),
            med AS (
              SELECT id, c AS m FROM (
                SELECT id, c, row_number() OVER (PARTITION BY id
                  ORDER BY c) AS rn
                FROM co WHERE flat BETWEEN 1 AND 60) t WHERE rn = 30),
            sig AS (
              SELECT co.id,
                     CAST(SUM(CASE WHEN co.c > med.m
                       THEN (CAST(1 AS BIGINT) << (flat - 1))
                       ELSE 0 END) AS BIGINT) AS ph
              FROM co JOIN med ON co.id = med.id
              WHERE flat BETWEEN 1 AND 60
              GROUP BY 1)
            SELECT a.id AS id1, b.id AS id2,
                   CAST(bit_count(xor(a.ph, b.ph)) AS BIGINT) AS hamming
            FROM sig a JOIN sig b ON a.id < b.id
            WHERE bit_count(xor(a.ph, b.ph)) <= 3
            ORDER BY id1, id2"""))

  // Multimodal document assembly (the MMC4/interleaved-pretraining shape):
  // images are assigned to the text chunk they score highest against,
  // then the document materializes as an interleaved token sequence
  // (chunk, then its images in id order). The real pipeline scores with
  // CLIP embeddings; the model call is exactly the stub the multimodal
  // mandate prescribes — scores here are md5-derived so ANY engine
  // reproduces the assignment — while the Spark mechanics (chunk explode,
  // image×chunk scoring join restricted to the image's own document,
  // per-image argmax, per-doc ordered fold) are the production plan.
  // Byte-witnessed by the sequence digest.
  private val mmInterleave = Q(
    "mm_interleave",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents").filter(col("doc_id") < 200)
      val ws = split(col("text"), "\\s+")
      val chunkIdx = sequence(lit(0L),
        floor((size(ws) - lit(1)) / lit(8.0)).cast("long"))
      val chunks = docs.select(col("doc_id"),
          posexplode(transform(chunkIdx,
            i => array_join(slice(ws, (i * 8 + 1).cast("int"), lit(8)), " "))))
        .toDF("doc_id", "pos", "chunk")
      val images = Tables.load(s, dir, "embeddings")
        .filter(col("vec_id") < 400)
        .select(col("vec_id"), (col("vec_id") % 200).as("doc_id"))
      val scored = images.join(chunks, "doc_id")
        .withColumn("score",
          md5(concat(col("chunk"), lit("#"), col("vec_id"))))
      val assign = scored.groupBy(col("vec_id"), col("doc_id"))
        .agg(max(struct(col("score"), col("pos"))).getField("pos").as("pos"))
      val imgsAt = assign.groupBy(col("doc_id"), col("pos"))
        .agg(sort_array(collect_list(col("vec_id"))).as("imgs"),
          count(lit(1)).as("n_img"))
      // imgsAt is at most one row per image (dimension-sized) but hides
      // behind two aggregates, so Catalyst can't see it's broadcastable —
      // without the hint this ran as a SortMergeJoin shuffling every wide
      // chunk row on (doc_id, pos)
      chunks.join(broadcast(imgsAt), Seq("doc_id", "pos"), "left")
        .select(col("doc_id"), col("pos"),
          concat(col("chunk"),
            coalesce(array_join(transform(col("imgs"),
              i => concat(lit(" IMG:"), i)), ""), lit(""))).as("tok"),
          coalesce(col("n_img"), lit(0L)).as("n_img"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(col("n_img")).as("n_images"),
          md5(array_join(transform(
            array_sort(collect_list(struct(col("pos"), col("tok")))),
            x => x.getField("tok")), " ")).as("seq_digest"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH dw AS (
              SELECT doc_id, string_split_regex(text, '\s+') AS w
              FROM documents WHERE doc_id < 200),
            chunks AS (
              SELECT doc_id, CAST(i AS INT) AS pos,
                     array_to_string(w[i*8+1 : i*8+8], ' ') AS chunk
              FROM dw, unnest(range(0, (len(w) + 7) // 8)) t(i)),
            images AS (
              SELECT vec_id, vec_id % 200 AS doc_id
              FROM embeddings WHERE vec_id < 400),
            scored AS (
              SELECT i.vec_id, i.doc_id, c.pos,
                     md5(c.chunk || '#' || CAST(i.vec_id AS VARCHAR))
                       AS score
              FROM images i JOIN chunks c USING (doc_id)),
            assign AS (
              SELECT vec_id, doc_id, pos FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id
                           ORDER BY score DESC, pos DESC) AS r
                FROM scored) t WHERE r = 1),
            imgs AS (
              SELECT doc_id, pos, list_sort(list(vec_id)) AS imgs,
                     count(1) AS n_img
              FROM assign GROUP BY doc_id, pos),
            toks AS (
              SELECT c.doc_id, c.pos,
                     c.chunk || coalesce(array_to_string(
                       list_transform(i.imgs,
                         x -> ' IMG:' || CAST(x AS VARCHAR)), ''), '')
                       AS tok,
                     coalesce(i.n_img, 0) AS n_img
              FROM chunks c LEFT JOIN imgs i
                ON c.doc_id = i.doc_id AND c.pos = i.pos)
            SELECT doc_id, count(1) AS n_chunks,
                   CAST(sum(n_img) AS BIGINT) AS n_images,
                   md5(string_agg(tok, ' ' ORDER BY pos)) AS seq_digest
            FROM toks GROUP BY doc_id ORDER BY doc_id"""))

  // In-silico PCR (Plugins/PCR.pm): primer1 carries a wobble base
  // (ATARTA, R=A/G → two concrete variants) to exercise the IUPAC
  // expansion; primer2 = TTATTA (rc TAATAA). Product window [15, 60] bp,
  // both orientations. The oracle re-derives every variant's occurrence
  // positions with the q4-style position scan and applies the identical
  // length window.
  private val pcrPrimer1 = "ATARTA"
  private val pcrPrimer2 = "TTATTA"

  // shared oracle fragment: per-direction primer-site positions
  private val dCteSql = s"d AS (SELECT doc_id, $dnaSql AS dna FROM documents)"

  private val pcrSitesSql =
    s"""$dCteSql,
       p1f AS (SELECT doc_id, CAST(i AS BIGINT) AS p FROM d,
               unnest(list_filter(range(1, length(dna) - 4),
                 i -> substring(dna, i, 6) IN ('ATAATA', 'ATAGTA'))) t(i)),
       p2r AS (SELECT doc_id, CAST(i AS BIGINT) AS p FROM d,
               unnest(list_filter(range(1, length(dna) - 4),
                 i -> substring(dna, i, 6) = 'TAATAA')) t(i)),
       p2f AS (SELECT doc_id, CAST(i AS BIGINT) AS p FROM d,
               unnest(list_filter(range(1, length(dna) - 4),
                 i -> substring(dna, i, 6) = 'TTATTA')) t(i)),
       p1r AS (SELECT doc_id, CAST(i AS BIGINT) AS p FROM d,
               unnest(list_filter(range(1, length(dna) - 4),
                 i -> substring(dna, i, 6) IN ('TATTAT', 'TACTAT'))) t(i)),
       products AS (
         SELECT a.doc_id, a.p AS start, b.p + 5 AS "end",
                b.p + 5 - a.p + 1 AS product_len, 'forward' AS direction
         FROM p1f a JOIN p2r b ON a.doc_id = b.doc_id
         WHERE b.p + 5 - a.p + 1 BETWEEN 15 AND 60
         UNION ALL
         SELECT a.doc_id, a.p AS start, b.p + 5 AS "end",
                b.p + 5 - a.p + 1 AS product_len, 'reverse' AS direction
         FROM p2f a JOIN p1r b ON a.doc_id = b.doc_id
         WHERE b.p + 5 - a.p + 1 BETWEEN 15 AND 60)"""

  private val pcrProducts = Q(
    "pcr_products",
    (s, dir) => graft.operators.Pcr.products(dnaDocs(s, dir),
        "doc_id", "dna", pcrPrimer1, pcrPrimer2, minLen = 15, maxLen = 60)
      .orderBy(col("doc_id"), col("direction"), col("start"), col("end")),
    Some(s"""WITH $pcrSitesSql
             SELECT doc_id, start, "end", product_len, direction
             FROM products ORDER BY doc_id, direction, start, "end""""))

  private val pcrSummary = Q(
    "pcr_summary",
    (s, dir) => graft.operators.Pcr.summary(dnaDocs(s, dir),
        "doc_id", "dna", pcrPrimer1, pcrPrimer2, minLen = 15, maxLen = 60)
      .orderBy(col("doc_id")),
    Some(s"""WITH $pcrSitesSql,
             n AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_products
                   FROM products GROUP BY 1)
             SELECT d.doc_id,
                    coalesce(n.n_products, 0) AS n_products,
                    coalesce(n.n_products, 0) > 0 AS positive
             FROM d LEFT JOIN n ON d.doc_id = n.doc_id
             ORDER BY d.doc_id"""))

  // Q4 under an in-silico PCR filter (Offline/Scan.pm:63-287: when a locus
  // defines PCR reactions, tags are accepted only INSIDE predicted
  // amplicons — the specificity guard against paralogous hits). The scan
  // and the product prediction are both narrow passes; the containment
  // check is a semi join on the contig key with the interval predicate as
  // its residual — products per contig are few, so the hit side never
  // amplifies.
  private val q4PcrFiltered = Q(
    "q4_pcr_filtered",
    (s, dir) => {
      val docs = dnaDocs(s, dir)
      val prods = graft.operators.Pcr.products(docs, "doc_id", "dna",
          pcrPrimer1, pcrPrimer2, minLen = 15, maxLen = 60)
        .select(col("doc_id"), col("start"), col("end"))
      // loci defined from INSIDE the amplicons of the first five
      // product-bearing docs — tags exist both in and out of amplicons,
      // so the containment filter genuinely separates. The five seed ids
      // collect driver-side (bounded by construction): leaving them as a
      // subtree re-ran the whole primer scan a second time for the lib
      // side — with the orderBy's sampling pass, FOUR primer scans per
      // execution of this query.
      val libIds = prods.select(col("doc_id")).distinct()
        .orderBy(col("doc_id")).limit(5)
        .collect().map(_.getLong(0)).toSeq
      val lib = docs.filter(col("doc_id").isin(libIds: _*))
        .filter(length(col("dna")) >= 22)
        .select(concat(lit("L"), col("doc_id")).as("locus"),
          lit("1").as("allele_id"),
          substring(col("dna"), 14, 8).as("allele_seq"))
      val hits = SeqScan.exactTagScan(
        docs.filter(length(col("dna")) >= 8), "doc_id", "dna",
        lib, "locus", "allele_id", "allele_seq", overlapping = true)
      // bounded output (five loci, amplicon-contained tags): a
      // single-partition sort skips the range sampler that would
      // re-execute the primer scan + tag scan
      hits.join(prods.withColumnRenamed("doc_id", "p_doc"),
          hits("doc_id") === col("p_doc") &&
            col("start_pos") >= col("start") && col("end_pos") <= col("end"),
          "left_semi")
        .select(col("doc_id"), col("locus"), col("start_pos"),
          col("end_pos"), col("reverse"))
        .repartition(1)
        .sortWithinPartitions(col("doc_id"), col("locus"), col("start_pos"),
          col("reverse"))
    },
    Some(s"""WITH $pcrSitesSql,
             lib AS (SELECT 'L' || doc_id AS locus,
                            substring(dna, 14, 8) AS fwd,
                            reverse(translate(substring(dna, 14, 8),
                                              'ACGT', 'TGCA')) AS rev
                     FROM d
                     WHERE doc_id IN (SELECT doc_id FROM (
                             SELECT DISTINCT doc_id FROM products
                             ORDER BY doc_id LIMIT 5))
                       AND length(dna) >= 22),
             contigs AS (SELECT doc_id, dna FROM d WHERE length(dna) >= 8),
             hits AS (
               SELECT c.doc_id, l.locus, CAST(p AS BIGINT) AS start_pos,
                      CAST(p + 7 AS BIGINT) AS end_pos, false AS reverse
               FROM contigs c, lib l,
                    unnest(list_filter(range(1, length(c.dna) - 6),
                      p -> substring(c.dna, p, 8) = l.fwd)) t(p)
               UNION ALL
               SELECT c.doc_id, l.locus, CAST(p AS BIGINT),
                      CAST(p + 7 AS BIGINT), true
               FROM contigs c, lib l,
                    unnest(list_filter(range(1, length(c.dna) - 6),
                      p -> substring(c.dna, p, 8) = l.rev)) t(p)
               WHERE l.rev != l.fwd)
             SELECT h.doc_id, h.locus, h.start_pos, h.end_pos, h.reverse
             FROM hits h
             WHERE EXISTS (SELECT 1 FROM products p
                           WHERE p.doc_id = h.doc_id
                             AND h.start_pos >= p.start
                             AND h.end_pos <= p."end")
             ORDER BY h.doc_id, h.locus, h.start_pos, h.reverse"""))

  // Q4 under the PROBE filter (Scan.pm:2102-2145 `_probe_filter_match`):
  // a hit is accepted only if EVERY defined hybridization probe has a
  // match on the same contig within max_distance — with the reference's
  // exact distance rule, including its quirk that an OVERLAPPING probe
  // (distance stays -1) does NOT qualify. Probe matches come from the
  // same exact-scan kernel; the filter is a contig-keyed join + one
  // hit-keyed aggregation (both map-side combinable; probe matches per
  // contig are few, so the hit side never amplifies).
  private val q4ProbeFiltered = Q(
    "q4_probe_filtered",
    (s, dir) => {
      val (contigs, lib) = longContigs(s, dir)
      val docs = dnaDocs(s, dir)
      val probes = docs.filter(col("doc_id") === 50 && length(col("dna")) >= 16)
        .select(concat(lit("P"), col("doc_id")).as("probe_id"),
          lit("1").as("allele_id"),
          substring(col("dna"), 5, 12).as("probe_seq"))
      // the probe_locus registry: MATCH_ALL needs the defined-probe count
      val nProbes = probes.select(col("probe_id")).distinct().count()
      val pm = SeqScan.exactTagScan(contigs, "cid", "dna",
          probes, "probe_id", "allele_id", "probe_seq", overlapping = true)
        .select(col("cid").as("p_cid"), col("probe_id"),
          col("start_pos").as("p_start"), col("end_pos").as("p_end"))
      val hits = SeqScan.exactTagScan(contigs, "cid", "dna",
        lib, "locus", "allele_id", "allele_seq", overlapping = true)
      val dist = when(col("start_pos") > col("p_end"),
          col("start_pos") - col("p_end"))
        .when(col("end_pos") < col("p_start"),
          col("p_start") - col("end_pos"))
        .otherwise(lit(-1L))
      hits.join(pm, col("cid") === col("p_cid"))
        .withColumn("dist", dist)
        .filter(col("dist") =!= -1L && col("dist") <= 1000L)
        .groupBy(col("cid"), col("locus"), col("start_pos"),
          col("end_pos"), col("reverse"))
        .agg(countDistinct(col("probe_id")).as("n_probes"))
        .filter(col("n_probes") === nProbes)
        .select(col("cid"), col("locus"), col("start_pos"),
          col("end_pos"), col("reverse"))
        // bounded output: single-partition sort skips the range sampler
        // that would re-run both tag scans over the rebuilt long contigs
        .repartition(1)
        .sortWithinPartitions(col("cid"), col("locus"), col("start_pos"),
          col("reverse"))
    },
    Some(s"""WITH d AS (SELECT doc_id, $dnaSql AS dna FROM documents),
             contigs AS (SELECT doc_id // 100 AS cid,
                                string_agg(dna, '' ORDER BY doc_id) AS dna
                         FROM d GROUP BY 1),
             lib AS (SELECT 'L' || doc_id AS locus,
                            substring(dna, 3, 24) AS fwd,
                            reverse(translate(substring(dna, 3, 24),
                                              'ACGT', 'TGCA')) AS rev
                     FROM d WHERE doc_id < 200 AND length(dna) >= 26),
             probes AS (SELECT 'P' || doc_id AS probe_id,
                               substring(dna, 5, 12) AS fwd,
                               reverse(translate(substring(dna, 5, 12),
                                                 'ACGT', 'TGCA')) AS rev
                        FROM d WHERE doc_id = 50 AND length(dna) >= 16),
             hits AS (
               SELECT c.cid, l.locus, CAST(p AS BIGINT) AS start_pos,
                      CAST(p + 23 AS BIGINT) AS end_pos, false AS reverse
               FROM contigs c, lib l,
                    unnest(list_filter(range(1, length(c.dna) - 22),
                      p -> substring(c.dna, p, 24) = l.fwd)) t(p)
               UNION ALL
               SELECT c.cid, l.locus, CAST(p AS BIGINT),
                      CAST(p + 23 AS BIGINT), true
               FROM contigs c, lib l,
                    unnest(list_filter(range(1, length(c.dna) - 22),
                      p -> substring(c.dna, p, 24) = l.rev)) t(p)
               WHERE l.rev != l.fwd),
             pm AS (
               SELECT c.cid, pr.probe_id, CAST(p AS BIGINT) AS p_start,
                      CAST(p + 11 AS BIGINT) AS p_end
               FROM contigs c, probes pr,
                    unnest(list_filter(range(1, length(c.dna) - 10),
                      p -> substring(c.dna, p, 12) = pr.fwd)) t(p)
               UNION ALL
               SELECT c.cid, pr.probe_id, CAST(p AS BIGINT),
                      CAST(p + 11 AS BIGINT)
               FROM contigs c, probes pr,
                    unnest(list_filter(range(1, length(c.dna) - 10),
                      p -> substring(c.dna, p, 12) = pr.rev)) t(p)
               WHERE pr.rev != pr.fwd),
             qual AS (
               SELECT h.cid, h.locus, h.start_pos, h.end_pos, h.reverse,
                      m.probe_id,
                      CASE WHEN h.start_pos > m.p_end
                             THEN h.start_pos - m.p_end
                           WHEN h.end_pos < m.p_start
                             THEN m.p_start - h.end_pos
                           ELSE -1 END AS dist
               FROM hits h JOIN pm m ON h.cid = m.cid)
             SELECT cid, locus, start_pos, end_pos, reverse
             FROM qual
             WHERE dist != -1 AND dist <= 1000
             GROUP BY cid, locus, start_pos, end_pos, reverse
             HAVING count(DISTINCT probe_id) =
                    (SELECT count(DISTINCT probe_id) FROM probes)
             ORDER BY cid, locus, start_pos, reverse"""))

  // J12 detail: intron-aware tag feature segmentation (TagFeatures) —
  // tags over doc-derived contigs, even ids carry two introns, reverse
  // strand every third id, curation flags on ids %4 / %5. The oracle
  // replays the exact Perl cursor walk (ExtractedSequencePage.pm:153-196)
  // relationally: lag() for the exon cursor, negated order for the
  // reverse-strand flip, string_agg for spliced/flags.
  private val j12TagIntrons = Q(
    "j12_tag_introns",
    (s, dir) => {
      val contigs = dnaDocs(s, dir)
        .filter(col("doc_id") < 500 && length(col("dna")) >= 60)
        .select(col("doc_id").as("seqbin_id"), col("dna").as("sequence"))
      val tags = contigs.select(col("seqbin_id").as("id"), col("seqbin_id"),
        lit(11L).as("start_pos"), lit(50L).as("end_pos"),
        (col("seqbin_id") % 3 === 0).as("reverse"))
      val introns = tags.filter(col("id") % 2 === 0)
        .select(col("id"),
          explode(typedLit(Seq((18L, 22L), (31L, 35L)))).as("iv"))
        .select(col("id"), col("iv._1").as("start_pos"),
          col("iv._2").as("end_pos"))
      val flags = tags.filter(col("id") % 4 === 0)
          .select(col("id"), lit("ambiguous read").as("flag"))
        .union(tags.filter(col("id") % 5 === 0)
          .select(col("id"), lit("downstream fuse").as("flag")))
      graft.operators.TagFeatures
        .features(tags, contigs, introns, flags, flanking = 10)
        .orderBy(col("id"), col("ord"))
    },
    Some(s"""WITH d AS (SELECT doc_id, $dnaSql AS dna FROM documents),
             c AS (SELECT doc_id AS seqbin_id, dna FROM d
                   WHERE doc_id < 500 AND length(dna) >= 60),
             tg AS (SELECT seqbin_id AS id, seqbin_id, dna, 11 AS s, 50 AS e,
                           (seqbin_id % 3 = 0) AS rev
                    FROM c),
             intr AS (SELECT id, iv[1] AS istart, iv[2] AS iend
                      FROM tg, unnest([[18, 22], [31, 35]]) AS t(iv)
                      WHERE id % 2 = 0),
             io AS (SELECT id, istart, iend,
                           row_number() OVER (PARTITION BY id ORDER BY istart) AS k,
                           coalesce(lag(iend) OVER (PARTITION BY id ORDER BY istart),
                                    10) AS cur
                    FROM intr),
             f0 AS (
               SELECT t.id, 0 AS ord0, 'flanking' AS feature,
                      substring(t.dna,
                        t.s - (CASE WHEN t.s - 10 < 0 THEN t.s - 1 ELSE 10 END),
                        CASE WHEN t.s - 10 < 0 THEN t.s - 1 ELSE 10 END) AS seq
               FROM tg t
               UNION ALL
               SELECT t.id, 1, 'allele_seq', substring(t.dna, t.s, t.e - t.s + 1)
               FROM tg t WHERE t.id % 2 = 1
               UNION ALL
               SELECT i.id, 2 * i.k - 1, 'exon',
                      substring(t.dna, i.cur + 1, i.istart - i.cur - 1)
               FROM io i JOIN tg t USING (id)
               UNION ALL
               SELECT i.id, 2 * i.k, 'intron',
                      substring(t.dna, i.istart, i.iend - i.istart + 1)
               FROM io i JOIN tg t USING (id)
               UNION ALL
               SELECT mx.id, 2 * mx.kmax + 1, 'exon',
                      substring(t.dna, mx.lst + 1, t.e - mx.lst)
               FROM (SELECT id, max(k) AS kmax, max(iend) AS lst
                     FROM io GROUP BY id) mx
               JOIN tg t USING (id)
               UNION ALL
               SELECT t.id, 9999, 'flanking',
                      substring(t.dna, t.e + 1,
                        CASE WHEN length(t.dna) - t.e > 10 THEN 10
                             ELSE length(t.dna) - t.e END)
               FROM tg t),
             orient AS (
               SELECT f.id, t.seqbin_id, f.feature,
                      CASE WHEN t.rev
                           THEN reverse(translate(f.seq, 'ACGT', 'TGCA'))
                           ELSE f.seq END AS seq,
                      row_number() OVER (PARTITION BY f.id
                        ORDER BY CASE WHEN t.rev THEN -f.ord0 ELSE f.ord0 END)
                        AS ord
               FROM f0 f JOIN tg t USING (id)),
             agg AS (
               SELECT id,
                      string_agg(seq, '' ORDER BY ord)
                        FILTER (WHERE feature IN ('exon', 'allele_seq'))
                        AS spliced
               FROM orient GROUP BY id),
             fl AS (
               SELECT id, string_agg(flag, ';' ORDER BY flag) AS flags FROM (
                 SELECT id, 'ambiguous read' AS flag FROM tg WHERE id % 4 = 0
                 UNION ALL
                 SELECT id, 'downstream fuse' FROM tg WHERE id % 5 = 0)
               GROUP BY id)
             SELECT o.id, o.seqbin_id, CAST(o.ord AS BIGINT) AS ord,
                    o.feature, o.seq, coalesce(f.flags, '') AS flags,
                    a.spliced
             FROM orient o JOIN agg a USING (id) LEFT JOIN fl f USING (id)
             ORDER BY o.id, o.ord"""))

  // Recall-vs-radius report for the DCT pHash banding (r13 VERDICT #8):
  // the 4×15 banding is EXACT only to hamming 3 — real perceptual
  // near-dups (crops, re-encodes) land further out. Over a corpus of
  // base rasters plus twins at three perturbation strengths (every
  // 16th/8th/4th block replaced with unrelated content + a brightness
  // shift — hamming dials smoothly past the exactness radius), this
  // measures what the banding SEES at radii 3/6/10/15 against the
  // brute-force all-pairs truth (bounded corpus: truth is the report's
  // point, quadratic on purpose). recall_bp is integer basis points —
  // no float crosses the oracle. The shipped pair operators keep the
  // ≤ 3 exactness contract; this row quantifies the tail beyond it.
  private val mmPhashRecall = Q(
    "mm_phash_recall",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val base = docs.filter(col("doc_id") < 64)
        .select(col("doc_id"), col("doc_id").as("seed"))
      def twins(k: Int, mix: Int) = Multimodal.syntheticRaster(
        base.select((col("doc_id") + k * 100000L).as("doc_id"),
          col("seed")),
        "doc_id", "seed", 64, 64, brightness = 1, mixEvery = mix)
      val corpus = Multimodal
        .syntheticRaster(base, "doc_id", "seed", 64, 64, brightness = 0)
        .unionByName(twins(1, 16))
        .unionByName(twins(2, 8))
        .unionByName(twins(3, 4))
      val sigs = graft.operators.Pinning.pin(
        Multimodal.phashDct(corpus, "doc_id", rowBytes = 64)
          .select(col("doc_id").as("__mid"), col("ph").as("__ph")))
      val pairs = sigs.select(col("__mid").as("id1"), col("__ph").as("p1"))
        .join(sigs.select(col("__mid").as("id2"), col("__ph").as("p2")),
          col("id1") < col("id2"))
        .select(col("id1"), col("id2"),
          bit_count(col("p1").bitwiseXOR(col("p2"))).as("hamming"))
      val cands = Multimodal.bandCandidates(sigs)
        .select(col("id1"), col("id2")).distinct()
        .withColumn("__cand", lit(1L))
      pairs.join(cands, Seq("id1", "id2"), "left")
        .select(col("hamming"),
          coalesce(col("__cand"), lit(0L)).as("c"),
          explode(array(lit(3L), lit(6L), lit(10L), lit(15L)))
            .as("radius"))
        .filter(col("hamming") <= col("radius"))
        .groupBy(col("radius"))
        .agg(count(lit(1)).as("true_pairs"),
          sum(col("c")).as("banded_pairs"))
        .withColumn("recall_bp",
          expr("banded_pairs * 10000 div true_pairs"))
        .orderBy(col("radius"))
    },
    Some(s"""WITH ids AS (
              SELECT doc_id AS id, doc_id AS seed, 0 AS br, 0 AS mix
              FROM documents WHERE doc_id < 64
              UNION ALL
              SELECT doc_id + 100000, doc_id, 1, 16
              FROM documents WHERE doc_id < 64
              UNION ALL
              SELECT doc_id + 200000, doc_id, 1, 8
              FROM documents WHERE doc_id < 64
              UNION ALL
              SELECT doc_id + 300000, doc_id, 1, 4
              FROM documents WHERE doc_id < 64),
            blocks AS (
              SELECT id, br, blk.blk AS blk,
                     md5('graft-px-' ||
                       CASE WHEN mix > 0 AND blk.blk % mix = 0
                            THEN seed + 50000 ELSE seed END ||
                       '-' || blk.blk) AS hx
              FROM ids, range(0, 256) blk(blk)),
            pix AS (
              SELECT id, blk * 16 + k.k AS idx,
                     ('0x' || substr(hx, k.k * 2 + 1, 2))::BIGINT % 128 + br
                       AS px
              FROM blocks, range(0, 16) k(k)),
            pgrid AS (
              SELECT id, (idx // 64) // 2 AS bi, (idx % 64) // 2 AS bj,
                     CAST(sum(px) // 4 AS BIGINT) AS p
              FROM pix GROUP BY 1, 2, 3),
            basis(u, i, b) AS (VALUES ${Multimodal.dctBasisSqlValues}),
            rmid AS (
              SELECT g.id, ba.u, g.bj, CAST(sum(ba.b * g.p) AS BIGINT) AS rv
              FROM pgrid g JOIN basis ba ON ba.i = g.bi
              GROUP BY 1, 2, 3),
            co AS (
              SELECT r.id, r.u * 8 + bv.u AS flat,
                     CAST(sum(bv.b * r.rv) AS BIGINT) AS c
              FROM rmid r JOIN basis bv ON bv.i = r.bj
              GROUP BY 1, 2),
            med AS (
              SELECT id, c AS m FROM (
                SELECT id, c, row_number() OVER (PARTITION BY id
                  ORDER BY c) AS rn
                FROM co WHERE flat BETWEEN 1 AND 60) t WHERE rn = 30),
            sig AS MATERIALIZED (
              SELECT co.id,
                     CAST(SUM(CASE WHEN co.c > med.m
                       THEN (CAST(1 AS BIGINT) << (flat - 1))
                       ELSE 0 END) AS BIGINT) AS ph
              FROM co JOIN med ON co.id = med.id
              WHERE flat BETWEEN 1 AND 60
              GROUP BY 1),
            pairs AS (
              SELECT a.id AS id1, b.id AS id2,
                     bit_count(xor(a.ph, b.ph)) AS hamming,
                     CASE WHEN ((a.ph >> 0) & 32767) = ((b.ph >> 0) & 32767)
                            OR ((a.ph >> 15) & 32767) = ((b.ph >> 15) & 32767)
                            OR ((a.ph >> 30) & 32767) = ((b.ph >> 30) & 32767)
                            OR ((a.ph >> 45) & 32767) = ((b.ph >> 45) & 32767)
                          THEN 1 ELSE 0 END AS c
              FROM sig a JOIN sig b ON a.id < b.id)
            SELECT CAST(r.radius AS BIGINT) AS radius,
                   count(*) AS true_pairs,
                   CAST(sum(c) AS BIGINT) AS banded_pairs,
                   CAST(sum(c) * 10000 // count(*) AS BIGINT) AS recall_bp
            FROM pairs, (VALUES (3), (6), (10), (15)) r(radius)
            WHERE hamming <= r.radius
            GROUP BY r.radius ORDER BY radius"""))

  // Netpbm decode end-to-end (r13 VERDICT #4): the media bytes here are
  // REAL binary PGM/PPM files — md5-derived pixels encoded by the P5/P6
  // writers (8-bit, 16-bit big-endian when doc_id % 3 = 0, RGB when
  // doc_id % 5 = 1; headers carry comments) — parsed back by the real
  // decoder (Multimodal.decodeNetpbm) with per-doc aggregates computed
  // from the DECODED samples. The oracle replays the pixel arithmetic
  // straight from md5, never touching the bytes, so equality proves the
  // encode→decode roundtrip preserves every sample and the header/luma
  // arithmetic matches the netpbm spec. MultimodalSpec pins the
  // malformed-input cases and the chain into the DCT pHash banding.
  private val mmDecodePgm = Q(
    "mm_decode_pgm",
    (s, dir) => {
      import org.apache.spark.sql.types._
      import org.apache.spark.sql.Row
      val ids = Tables.load(s, dir, "documents")
        .filter(col("doc_id") < 240).select(col("doc_id"))
      val outSchema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("width", LongType), StructField("height", LongType),
        StructField("maxval", LongType), StructField("n_px", LongType),
        StructField("sum_px", LongType), StructField("min_px", LongType),
        StructField("max_px", LongType), StructField("px_md5", StringType)))
      val enc = org.apache.spark.sql.Encoders.row(outSchema)
      ids.mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        def mdBytes(docId: Long, n: Int): Array[Int] = {
          val out = new Array[Int](n)
          var blk = 0
          while (blk * 16 < n) {
            val dig = md.digest(s"graft-pgm-$docId-$blk".getBytes("UTF-8"))
            var k = 0
            while (k < 16 && blk * 16 + k < n) {
              out(blk * 16 + k) = dig(k) & 0xff; k += 1
            }
            blk += 1
          }
          out
        }
        rows.map { r =>
          val id = r.getLong(0)
          val bytes =
            if (id % 5 == 1) Multimodal.encodePpm(32, 32, mdBytes(id, 3072))
            else if (id % 3 == 0) Multimodal.encodePgm(32, 32, 4095,
              mdBytes(id, 1024).map(_ + 3800))
            else Multimodal.encodePgm(32, 32, 255, mdBytes(id, 1024))
          val ras = Multimodal.decodeNetpbm(bytes).getOrElse(
            throw new IllegalStateException(s"roundtrip parse failed: $id"))
          val px = ras.pixels
          val sum = px.foldLeft(0L)(_ + _)
          val digest = md.digest(px.mkString(",").getBytes("UTF-8"))
            .map("%02x".format(_)).mkString
          Row(id, ras.width.toLong, ras.height.toLong, ras.maxval.toLong,
            px.length.toLong, sum, px.min.toLong, px.max.toLong, digest)
        }
      }(enc).orderBy(col("doc_id"))
    },
    Some("""WITH ids AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 5 = 1 THEN 2
                          WHEN doc_id % 3 = 0 THEN 1
                          ELSE 0 END AS kind
              FROM documents WHERE doc_id < 240),
            bts AS (
              SELECT doc_id, kind, j.j AS j,
                     ('0x' || substr(md5('graft-pgm-' || doc_id || '-' ||
                        (j.j // 16)), (j.j % 16) * 2 + 1, 2))::BIGINT AS b
              FROM ids, range(0, 3072) j(j)
              WHERE kind = 2 OR j.j < 1024),
            px AS (
              SELECT doc_id, j AS idx, b AS px FROM bts WHERE kind = 0
              UNION ALL
              SELECT doc_id, j, b + 3800 FROM bts WHERE kind = 1
              UNION ALL
              SELECT doc_id, j // 3,
                     CAST(sum(CASE j % 3 WHEN 0 THEN 299 * b
                                         WHEN 1 THEN 587 * b
                                         ELSE 114 * b END) // 1000 AS BIGINT)
              FROM bts WHERE kind = 2 GROUP BY doc_id, j // 3),
            agg AS (
              SELECT doc_id, count(*) AS n_px,
                     CAST(sum(px) AS BIGINT) AS sum_px,
                     CAST(min(px) AS BIGINT) AS min_px,
                     CAST(max(px) AS BIGINT) AS max_px,
                     md5(string_agg(px::varchar, ',' ORDER BY idx)) AS px_md5
              FROM px GROUP BY doc_id)
            SELECT i.doc_id, CAST(32 AS BIGINT) AS width,
                   CAST(32 AS BIGINT) AS height,
                   CAST(CASE kind WHEN 1 THEN 4095 ELSE 255 END AS BIGINT)
                     AS maxval,
                   n_px, sum_px, min_px, max_px, px_md5
            FROM agg JOIN ids i USING (doc_id) ORDER BY doc_id"""))

  // PNG decode end-to-end (r14 VERDICT Next-round #5): the media bytes
  // are REAL non-interlaced 8-bit PNGs — md5-derived pixels, grayscale
  // (color type 0) by default and truecolor (color type 2, BT.601 luma
  // reduction) when doc_id % 5 = 1, zlib-deflated scanlines with row r
  // filtered as type r % 5 so every document exercises ALL FIVE filter
  // reconstructions — parsed back by the real decoder
  // (Multimodal.decodePng: signature, CRC-verified chunk walk,
  // Inflater, defilter). The oracle replays the pixel arithmetic
  // straight from md5, never touching the bytes, so equality proves
  // filter round-tripping and the luma arithmetic byte-for-byte.
  // MultimodalSpec pins the malformed-input cases (bad CRC, truncated
  // IDAT, unsupported shapes) and the chain into the DCT pHash.
  private val mmDecodePng = Q(
    "mm_decode_png",
    (s, dir) => {
      import org.apache.spark.sql.types._
      import org.apache.spark.sql.Row
      val ids = Tables.load(s, dir, "documents")
        .filter(col("doc_id") < 240).select(col("doc_id"))
      val outSchema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("width", LongType), StructField("height", LongType),
        StructField("n_px", LongType),
        StructField("sum_px", LongType), StructField("min_px", LongType),
        StructField("max_px", LongType), StructField("px_md5", StringType)))
      val enc = org.apache.spark.sql.Encoders.row(outSchema)
      ids.mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        def mdBytes(docId: Long, n: Int): Array[Int] = {
          val out = new Array[Int](n)
          var blk = 0
          while (blk * 16 < n) {
            val dig = md.digest(s"graft-png-$docId-$blk".getBytes("UTF-8"))
            var k = 0
            while (k < 16 && blk * 16 + k < n) {
              out(blk * 16 + k) = dig(k) & 0xff; k += 1
            }
            blk += 1
          }
          out
        }
        rows.map { r =>
          val id = r.getLong(0)
          val bytes =
            if (id % 5 == 1)
              Multimodal.encodePng(32, 32, 3, mdBytes(id, 3072))
            else Multimodal.encodePng(32, 32, 1, mdBytes(id, 1024))
          val ras = Multimodal.decodePng(bytes).getOrElse(
            throw new IllegalStateException(s"roundtrip parse failed: $id"))
          val px = ras.pixels
          val sum = px.foldLeft(0L)(_ + _)
          val digest = md.digest(px.mkString(",").getBytes("UTF-8"))
            .map("%02x".format(_)).mkString
          Row(id, ras.width.toLong, ras.height.toLong,
            px.length.toLong, sum, px.min.toLong, px.max.toLong, digest)
        }
      }(enc).orderBy(col("doc_id"))
    },
    Some("""WITH ids AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 5 = 1 THEN 1 ELSE 0 END AS kind
              FROM documents WHERE doc_id < 240),
            bts AS (
              SELECT doc_id, kind, j.j AS j,
                     ('0x' || substr(md5('graft-png-' || doc_id || '-' ||
                        (j.j // 16)), (j.j % 16) * 2 + 1, 2))::BIGINT AS b
              FROM ids, range(0, 3072) j(j)
              WHERE kind = 1 OR j.j < 1024),
            px AS (
              SELECT doc_id, j AS idx, b AS px FROM bts WHERE kind = 0
              UNION ALL
              SELECT doc_id, j // 3,
                     CAST(sum(CASE j % 3 WHEN 0 THEN 299 * b
                                         WHEN 1 THEN 587 * b
                                         ELSE 114 * b END) // 1000 AS BIGINT)
              FROM bts WHERE kind = 1 GROUP BY doc_id, j // 3),
            agg AS (
              SELECT doc_id, count(*) AS n_px,
                     CAST(sum(px) AS BIGINT) AS sum_px,
                     CAST(min(px) AS BIGINT) AS min_px,
                     CAST(max(px) AS BIGINT) AS max_px,
                     md5(string_agg(px::varchar, ',' ORDER BY idx)) AS px_md5
              FROM px GROUP BY doc_id)
            SELECT i.doc_id, CAST(32 AS BIGINT) AS width,
                   CAST(32 AS BIGINT) AS height,
                   n_px, sum_px, min_px, max_px, px_md5
            FROM agg JOIN ids i USING (doc_id) ORDER BY doc_id"""))

  val qs: Seq[Q] = Seq(q4TagScan, q4MultiPattern, q4TagScanSeeded, q4AutotagIncremental,
    q3ExemplarPrune,
    q4LongExact, q4LongSeeded,
    q6MutationScan, s3FastaRoundtrip, mmDecode, mmResize, mmFrames, mmTile,
    mmInterleave, mmPhashDedup, mmPhashDct, mmPhashRecall, mmDecodePgm,
    mmDecodePng,
    g7SiteFreq,
    pcrProducts,
    pcrSummary,
    q4PcrFiltered,
    q4ProbeFiltered, j12TagIntrons)
}
