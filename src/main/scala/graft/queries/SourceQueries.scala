package graft.queries

import graft.Tables
import graft.sources.{Embl, Fasta, Gff3, RemoteContigs, SchemaConfig}
import org.apache.spark.sql.functions._

/** SURVEY §2.1 sources/sinks that previously had spec-only coverage
  * (VERDICT r4: S2, S5, S6, S8) — each re-expressed as an oracle-checked
  * roundtrip over the driver corpus: write with the engine sink, read back
  * distributed, and compare content-derived values against SQL computed
  * straight from the parquet tables.
  */
object SourceQueries extends QueryModule {
  // process-unique suffix for the roundtrip sink dirs (see webdataset /
  // xlsx roundtrips): JVM-wide monotonic, so repeated bench passes never
  // share a directory
  private val invocation = new java.util.concurrent.atomic.AtomicLong(0L)

  private def dnaDocs(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.load(s, dir, "documents")
      .withColumn("dna", regexp_replace(upper(col("text")), "[^ACGT]", ""))

  private val dnaSql = "regexp_replace(upper(text), '[^ACGT]', '', 'g')"

  // one nonce per JVM: two concurrent runs over the SAME corpus get
  // disjoint scratch trees, so neither can overwrite the other between a
  // sink's eager write and its read-back
  private lazy val runNonce =
    java.util.UUID.randomUUID().toString.take(8)

  private def tmp(dir: String, tag: String) = {
    // key the scratch path on a digest of the FULL corpus path (digits-only
    // keys collide across distinct dirs sharing a digit sequence) plus the
    // per-run nonce (same-corpus concurrent runs)
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    s"/tmp/graft_${runNonce}_${tag}_${digest}"
  }

  // S2: the XML entity-schema declaration drives a query end-to-end —
  // the optlist constrains the filter values and the regex validates them
  // (Parser.pm:155-328 semantics: type/multiple/required/optlist/regex).
  // The XML is the config artifact; everything downstream is derived from
  // the parsed FieldDefs, never hard-coded.
  private val s2Xml =
    """<fields>
      |  <field type="bigint" required="yes">doc_id</field>
      |  <field type="text" optlist="yes" regex="^[a-z]{2}$">lang
      |    <optlist>
      |      <option>en</option><option>de</option><option>fr</option>
      |    </optlist>
      |  </field>
      |  <field type="text" multiple="yes">source</field>
      |</fields>""".stripMargin

  private val s2SchemaConfig = Q(
    "s2_schema_config",
    (s, dir) => {
      val fields = SchemaConfig.parse(s2Xml)
      val struct = SchemaConfig.toStructType(fields)
      // config invariants surface as constants the oracle re-states: the
      // declared field count and the arity of the parsed optlist
      val langDef = fields.find(_.name == "lang").get
      require(struct.fieldNames.sameElements(fields.map(_.name)))
      require(!struct("doc_id").nullable && struct("lang").nullable)
      require(struct("source").dataType.typeName == "array")
      val docs = Tables.load(s, dir, "documents")
      docs
        .filter(col("lang").isin(langDef.optlist: _*) &&
          col("lang").rlike(langDef.regex.get))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"))
        .withColumn("n_fields", lit(fields.length))
        .withColumn("n_options", lit(langDef.optlist.length))
        .orderBy(col("lang"))
    },
    Some("""SELECT lang, count(1) AS n, 3 AS n_fields, 3 AS n_options
            FROM documents
            WHERE lang IN ('en', 'de', 'fr')
              AND regexp_matches(lang, '^[a-z]{2}$')
            GROUP BY lang ORDER BY lang"""))

  // S5: per-locus bulk download layout (DownloadAllelesPage) — one FASTA
  // directory per locus written via repartition+partitionBy, read back with
  // Spark's own partition discovery, locus recovered from the directory
  // name. Roundtrip check: id, locus, and sequence md5 all survive.
  private val s5LocusDownload = Q(
    "s5_locus_download",
    (s, dir) => {
      val alleles = dnaDocs(s, dir).filter(length(col("dna")) > 0)
        .select(col("doc_id").cast("string").as("id"),
          concat(lit("L"), col("doc_id") % 5).as("locus"),
          col("dna"))
      val path = tmp(dir, "loci")
      Fasta.writePartitioned(alleles, "id", "dna", "locus", path)
      Fasta.readPartitioned(s, path, "locus")
        .select(col("locus").cast("string").as("locus"),
          col("id").cast("long").as("doc_id"),
          length(col("sequence")).cast("long").as("seq_len"),
          md5(col("sequence")).as("seq_md5"))
        .orderBy(col("locus"), col("doc_id"))
    },
    Some(s"""SELECT 'L' || (doc_id % 5) AS locus, doc_id,
                    length($dnaSql) AS seq_len, md5($dnaSql) AS seq_md5
             FROM documents WHERE length($dnaSql) > 0
             ORDER BY locus, doc_id"""))

  // S6: remote contig fetch (ContigManager.pm) — URI-addressed contigs
  // pulled through the partition-parallel fetcher, md5-verified against
  // recorded checksums (ContigManager.pm:138-143: match, corrupt, or
  // unrecorded), then published atomically and read back through the
  // snapshot pointer. The fetcher here derives the sequence from the URI
  // deterministically so the oracle can replay the transport in SQL; the
  // HTTP client swaps in behind the same trait.
  private object UriFetcher extends RemoteContigs.ContigFetcher {
    def fetch(uri: String): String = {
      val id = uri.stripPrefix("contig://")
      val base = id.map(c => "ACGT"((c - '0') % 4))
      base * (id.toLong % 3 + 1).toInt
    }
  }

  private val s6RemoteContigs = Q(
    "s6_remote_contigs",
    (s, dir) => {
      val refs = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          concat(lit("contig://"), col("doc_id")).as("uri"),
          // recorded checksums: every 3rd correct, every 3rd+1 corrupt,
          // every 3rd+2 unrecorded (passes unverified, like the reference)
          when(col("doc_id") % 3 === 0,
              md5(expr("repeat(translate(CAST(doc_id AS STRING)," +
                " '0123456789', 'ACGTACGTAC'), CAST(doc_id % 3 + 1 AS INT))")))
            .when(col("doc_id") % 3 === 1, lit("0" * 32))
            .otherwise(lit(null).cast("string")).as("checksum"))
      val live = tmp(dir, "contigs")
      RemoteContigs.materialize(refs, "uri", "checksum", live, UriFetcher)
      RemoteContigs.read(s, live)
        .select(col("doc_id"),
          length(col("sequence")).cast("long").as("seq_len"),
          md5(col("sequence")).as("seq_md5"),
          col("checksum_ok"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH f AS (
              SELECT doc_id,
                     repeat(translate(CAST(doc_id AS VARCHAR),
                       '0123456789', 'ACGTACGTAC'),
                       CAST(doc_id % 3 + 1 AS INTEGER)) AS seq
              FROM documents)
            SELECT doc_id, length(seq) AS seq_len, md5(seq) AS seq_md5,
                   (doc_id % 3 != 1) AS checksum_ok
            FROM f ORDER BY doc_id"""))

  // S8a: EMBL sink (SeqbinToEMBL.pm) — contigs + CDS features serialized
  // to flat-file records, then the records themselves parsed back: ID/BP
  // from the ID line, feature count from the FT table, base counts from
  // the SQ composition line, and the sequence body re-assembled from the
  // 60-base rows and md5'd. Every value must round back to what SQL
  // computes from the source table — the formatter can't drop or mangle a
  // base without the hash catching it.
  private val s8Embl = Q(
    "s8_embl_roundtrip",
    (s, dir) => {
      val contigs = dnaDocs(s, dir).filter(length(col("dna")) >= 12)
        .select(col("doc_id"), col("dna"), col("lang"))
      val tags = contigs.select(col("doc_id"),
          lit("g1").as("locus"), lit(2L).as("start"), lit(9L).as("end"),
          lit(false).as("reverse"))
        .unionByName(contigs.select(col("doc_id"),
          lit("g2").as("locus"), lit(4L).as("start"), lit(11L).as("end"),
          (col("doc_id") % 2 === 1).as("reverse")))
      val path = tmp(dir, "embl")
      Embl.write(contigs, "doc_id", "dna", "lang", tags,
        "locus", "start", "end", "reverse", path)
      // the text sink terminates every record row with \n, so records
      // after a //\n split start with that stray newline — strip it first
      // (regexp, not trim: Spark trim/ltrim strip spaces only, not \n)
      val rec = regexp_replace(col("value"), "^\\s+", "")
      s.read.option("lineSep", "//\n").text(path)
        .filter(regexp_replace(col("value"), "\\s", "") =!= "")
        .select(
          regexp_extract(rec, "(?s)^ID   (\\S+);", 1)
            .cast("long").as("doc_id"),
          regexp_extract(rec, "; (\\d+) BP\\.", 1)
            .cast("long").as("bp"),
          (size(split(rec, "FT   CDS")) - 1).cast("long").as("n_feats"),
          (size(split(rec, "complement\\(")) - 1).cast("long").as("n_rev"),
          regexp_extract(rec, "SQ   Sequence \\d+ BP; (\\d+) A;", 1)
            .cast("long").as("n_a"),
          md5(upper(regexp_replace(
            regexp_extract(rec, "(?s)SQ[^\\n]*\\n(.*)$", 1),
            "[^a-z]", ""))).as("seq_md5"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH d AS (SELECT doc_id, lang, $dnaSql AS dna FROM documents)
             SELECT doc_id, length(dna) AS bp, CAST(2 AS BIGINT) AS n_feats,
                    CAST(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END AS BIGINT)
                      AS n_rev,
                    length(dna) - length(replace(dna, 'A', '')) AS n_a,
                    md5(dna) AS seq_md5
             FROM d WHERE length(dna) >= 12
             ORDER BY doc_id"""))

  // S8b: GFF3 sink (SeqbinToGFF3.pm) — the tag fact formatted as GFF3
  // lines, written, read back, and re-split into columns; the oracle
  // reconstructs each line from the same source rows.
  private val s8Gff3 = Q(
    "s8_gff3_roundtrip",
    (s, dir) => {
      val tags = dnaDocs(s, dir).filter(length(col("dna")) >= 12)
        .select(concat(lit("c"), col("doc_id")).as("seqid"),
          lit(3L).as("start"),
          (length(col("dna")) - 2).cast("long").as("stop"),
          (col("doc_id") % 2 === 0).as("reverse"),
          concat(lit("L"), col("doc_id") % 7).as("locus"))
      val path = tmp(dir, "gff3")
      Gff3.write(tags, "seqid", "CDS", "start", "stop", "reverse",
        Map("ID" -> "locus", "locus_tag" -> "locus"), path)
      val f = split(col("value"), "\t")
      s.read.text(path)
        .select(f.getItem(0).as("seqid"), f.getItem(2).as("ftype"),
          f.getItem(3).cast("long").as("start"),
          f.getItem(4).cast("long").as("stop"),
          f.getItem(6).as("strand"), f.getItem(8).as("attrs"))
        .orderBy(col("seqid"))
    },
    Some(s"""WITH d AS (SELECT doc_id, $dnaSql AS dna FROM documents)
             SELECT 'c' || doc_id AS seqid, 'CDS' AS ftype,
                    CAST(3 AS BIGINT) AS start, length(dna) - 2 AS stop,
                    CASE WHEN doc_id % 2 = 0 THEN '-' ELSE '+' END AS strand,
                    'ID=L' || (doc_id % 7) || ';locus_tag=L' || (doc_id % 7)
                      AS attrs
             FROM d WHERE length(dna) >= 12
             ORDER BY seqid"""))

  // JSONL roundtrip — the LLM-pipeline interchange format (one JSON doc
  // per line): export the corpus, read it back with an explicit schema
  // (never inferred: schema inference is a full extra pass at 100 TB and
  // type-unstable), and prove content survives byte-exactly through JSON
  // escaping via per-doc digests.
  private val jsonlRoundtrip = Q(
    "jsonl_roundtrip",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val path = tmp(dir, "jsonl")
      docs.select(col("doc_id"), col("text"), col("lang"), col("source"))
        .repartition(4)
        .write.mode("overwrite").json(path)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("lang",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("source",
          org.apache.spark.sql.types.StringType)))
      s.read.schema(schema).json(path)
        .select(col("doc_id"), md5(col("text")).as("text_md5"),
          col("lang"), col("source"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id, md5(text) AS text_md5, lang, source
            FROM documents ORDER BY doc_id"""))

  // Curation-intake validation (CurateBatchAddPage.pm check_data loop /
  // Parser.pm check_format): a staged batch validated against the PARSED
  // config — every rule below derives from the FieldDef (optlist members,
  // regex), nothing hard-coded (SURVEY §7.4 hard-part 4). Violations for
  // a field emit one row per failed rule. The corpus is clean, so the
  // staged batch carries deterministic synthetic violations (the PII-scrub
  // pattern): doc_id % 97 → 'ZZ' (fails regex AND optlist), % 101 → 'xx'
  // (passes the regex, fails the optlist — separating the two rules).
  // Wholly narrow: one projection + a filtered-array explode, no shuffle
  // before the presentation sort.
  private val curateValidate = Q(
    "curate_validate",
    (s, dir) => {
      val langDef = SchemaConfig.parse(s2Xml).find(_.name == "lang").get
      val docs = Tables.load(s, dir, "documents")
      val staged = docs.select(col("doc_id"),
        when(col("doc_id") % 97 === 0, "ZZ")
          .when(col("doc_id") % 101 === 0, "xx")
          .otherwise(col("lang")).as("lang"))
      val optlistOk = col("lang").isin(langDef.optlist: _*)
      val regexOk = col("lang").rlike(langDef.regex.get)
      staged.select(col("doc_id"), explode(filter(array(
          when(!optlistOk, struct(lit("lang").as("field"),
            lit("optlist").as("rule"), col("lang").as("value"))),
          when(!regexOk, struct(lit("lang").as("field"),
            lit("regex").as("rule"), col("lang").as("value")))),
          x => x.isNotNull)).as("v"))
        .select(col("doc_id"), col("v.field"), col("v.rule"), col("v.value"))
        .orderBy(col("doc_id"), col("rule"))
    },
    Some("""WITH staged AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 97 = 0 THEN 'ZZ'
                          WHEN doc_id % 101 = 0 THEN 'xx'
                          ELSE lang END AS lang
              FROM documents),
            v AS (
              SELECT doc_id, 'lang' AS field, 'optlist' AS rule,
                     lang AS value
              FROM staged WHERE lang NOT IN ('en', 'de', 'fr')
              UNION ALL
              SELECT doc_id, 'lang', 'regex', lang
              FROM staged WHERE NOT regexp_matches(lang, '^[a-z]{2}$'))
            SELECT doc_id, field, rule, value FROM v
            ORDER BY doc_id, rule"""))

  // Conditional validation rules (SubmissionHandler.pm run_validation_
  // checks, sql/isolatedb.sql:1814-1860): multi-condition curator rules
  // ("if source = X and n_chars < Y then reject with message") compiled
  // by graft.api.ValidationRules into per-rule boolean Columns — the
  // whole rule set evaluates in ONE codegen projection over the staged
  // batch, no joins (rules are dimension-sized metadata). The fixture
  // exercises every operator family: case-insensitive `=`, numeric
  // `<`/`>=`, `NOT`, the `null` presence check (synthetic nulls at
  // doc_id % 89), regex `starts with`, and the `[field]` cross-field
  // form of `NOT contain`.
  private val curateRules = Q(
    "curate_rules",
    (s, dir) => {
      import graft.api.ValidationRules.{Condition, Rule}
      val docs = Tables.load(s, dir, "documents")
      val staged = docs.select(col("doc_id"), col("text"),
        when(col("doc_id") % 89 === 0, lit(null).cast("string"))
          .otherwise(col("lang")).as("lang"),
        col("source"), col("n_chars"))
      val types = Map("doc_id" -> "int", "text" -> "text", "lang" -> "text",
        "source" -> "text", "n_chars" -> "int")
      val rules = Seq(
        Rule(1, "Documents from src0 must have at least 200 characters",
          Seq(Condition("source", "=", "SRC0"),
            Condition("n_chars", "<", "200"))),
        Rule(2, "Language must be provided",
          Seq(Condition("lang", "=", "null"))),
        Rule(3, "Short zh documents must come from src13",
          Seq(Condition("lang", "=", "zh"),
            Condition("n_chars", "<", "150"),
            Condition("source", "NOT", "src13"))),
        Rule(4, "Long documents must mention their language code",
          Seq(Condition("text", "NOT contain", "[lang]"),
            Condition("n_chars", ">=", "500"))),
        Rule(5, "Source family src1x is reserved for en",
          Seq(Condition("source", "starts with", "src1[0-9]"),
            Condition("lang", "NOT", "en"))))
      graft.api.ValidationRules.violations(staged, "doc_id", rules, types)
        .orderBy(col("doc_id"), col("rule_id"))
    },
    Some("""WITH staged AS (
              SELECT doc_id, text,
                     CASE WHEN doc_id % 89 = 0 THEN NULL ELSE lang END AS lang,
                     source, n_chars
              FROM documents),
            v AS (
              SELECT doc_id, 1 AS rule_id,
                     'Documents from src0 must have at least 200 characters'
                       AS message
              FROM staged
              WHERE source IS NOT NULL AND source <> ''
                AND lower(source) = lower('SRC0') AND n_chars < 200
              UNION ALL
              SELECT doc_id, 2, 'Language must be provided'
              FROM staged WHERE lang IS NULL OR lang = ''
              UNION ALL
              SELECT doc_id, 3, 'Short zh documents must come from src13'
              FROM staged
              WHERE lang IS NOT NULL AND lang <> '' AND lower(lang) = 'zh'
                AND n_chars < 150
                AND source IS NOT NULL AND source <> ''
                AND lower(source) <> 'src13'
              UNION ALL
              SELECT doc_id, 4,
                     'Long documents must mention their language code'
              FROM staged
              WHERE text IS NOT NULL AND text <> ''
                AND NOT regexp_matches(text, '(?i)' || lang)
                AND n_chars >= 500
              UNION ALL
              SELECT doc_id, 5, 'Source family src1x is reserved for en'
              FROM staged
              WHERE source IS NOT NULL AND source <> ''
                AND regexp_matches(source, '(?i)^(?:src1[0-9])')
                AND lang IS NOT NULL AND lang <> '' AND lower(lang) <> 'en')
            SELECT doc_id, rule_id, message FROM v
            ORDER BY doc_id, rule_id"""))

  // WebDataset tar shards — the multimodal training-data interchange
  // format: per-doc entries (NNNNNN.txt payload + NNNNNN.cls label)
  // grouped into deterministic ustar shards (zero mtime/uid, name-sorted
  // entries), written one file per shard from the executors, read back
  // via the parallel binaryFile source + the TarEntries expression. The
  // oracle checks post-roundtrip CONTENT (md5 per entry) straight from
  // the parquet table — losslessness, not just row counts.
  private val webdatasetRoundtrip = Q(
    "webdataset_roundtrip",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val entries = docs.select((col("doc_id") % 8).as("shard"),
        array(
          struct(concat(lpad(col("doc_id").cast("string"), 6, "0"),
            lit(".cls")).as("name"), col("source").cast("binary").as("data")),
          struct(concat(lpad(col("doc_id").cast("string"), 6, "0"),
            lit(".txt")).as("name"), col("text").cast("binary").as("data")))
          .as("es"))
        .groupBy(col("shard"))
        .agg(sort_array(flatten(collect_list(col("es")))).as("entries"))
      // per-invocation dir: a shared path let one bench pass's glob race
      // another pass's re-writer (r7 tail AnalysisException); each
      // write/read pair now sees only its own files
      val path = s"/tmp/graft_wds_${dir.replaceAll("[^0-9.]", "")}_${invocation.incrementAndGet()}"
      graft.sources.WebDataset.write(entries, "shard", "entries", path)
      graft.sources.WebDataset.read(s, path)
        .select(split(col("name"), "\\.").getItem(0).cast("long").as("doc_id"),
          split(col("name"), "\\.").getItem(1).as("ext"),
          md5(col("data")).as("payload_md5"))
        .orderBy(col("doc_id"), col("ext"))
    },
    Some("""SELECT doc_id, ext, payload_md5 FROM (
              SELECT doc_id, 'cls' AS ext, md5(source) AS payload_md5
              FROM documents
              UNION ALL
              SELECT doc_id, 'txt' AS ext, md5(text) AS payload_md5
              FROM documents) t
            ORDER BY doc_id, ext"""))

  // XLSX shard sink + reader — the reference's Excel export surface
  // (Utils.pm text2excel backs every exporter plugin's .xlsx offer),
  // closed with a pure-JVM OPC writer (java.util.zip + inline-string
  // cells, fixed zip timestamps): one workbook per shard written from
  // executors, read back via binaryFile + the XlsxRows parsing
  // expression. The oracle proves post-roundtrip CONTENT equality
  // against the source table — values survive the XML + zip round trip.
  private val xlsxRoundtrip = Q(
    "export_xlsx_roundtrip",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val staged = docs.select((col("doc_id") % 4).as("shard"),
        col("doc_id"), col("lang"), col("n_chars"))
      val path = s"/tmp/graft_xlsx_${dir.replaceAll("[^0-9.]", "")}_${invocation.incrementAndGet()}"
      graft.sources.Xlsx.write(staged, "shard", Seq("doc_id"), path)
      graft.sources.Xlsx.read(s, path)
        .filter(col("rn") >= 2) // skip each sheet's header row
        .select(element_at(col("cells"), 1).cast("long").as("doc_id"),
          element_at(col("cells"), 2).as("lang"),
          element_at(col("cells"), 3).cast("long").as("n_chars"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id, lang, n_chars FROM documents ORDER BY doc_id"""))

  // File-granularity zone-map data skipping (sources/ZoneMaps): the
  // documents corpus written range-partitioned on the indexed column, a
  // per-file (min, max, rows) stats table published once under the
  // versioned pointer (the fourth persisted artifact), and the scan
  // pruning its FILE LIST against the stats before Spark schedules a
  // task — parquet row-group stats only help after the task exists; at
  // 100 TB (~800k files) the win is never scheduling it. The predicate
  // re-applies to the surviving files (zone maps prune, never decide),
  // so the oracle is simply the same filtered aggregate over the full
  // table — equality IS the proof that pruning lost nothing.
  // ZoneMapsSpec additionally pins that files were actually skipped and
  // the null-zone prune rule.
  private val zonemapLayoutCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def cachedZonemapLayout(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    zonemapLayoutCache.computeIfAbsent(
      Tables.sessionKey(s) + "|" + dir,
      _ => {
        val p = tmp(dir, s"zonemap_${invocation.incrementAndGet()}")
        Tables.load(s, dir, "documents")
          .repartitionByRange(16, col("n_chars"), col("doc_id"))
          .write.mode("overwrite").parquet(s"$p/data")
        // registry-routed (r13 VERDICT #1): both artifacts — zone maps
        // on the range column, the per-file doc_id Bloom (the point-
        // predicate half; id zones span every file under the n_chars
        // order), word_idx-clustered — ride WITH the table under
        // <data>/_skipping via one registration; serving catalogs
        // resolve the Layout from the table itself, nothing hand-built
        graft.sources.SkippingRegistry.register(s, s"$p/data",
          zoneCols = Seq("n_chars"), bloomCol = Some("doc_id"))
        p
      })

  private val scanZonemapPrune = Q(
    "scan_zonemap_prune",
    (s, dir) => {
      val p = cachedZonemapLayout(s, dir)
      val stats = graft.sources.ZoneMaps.loadStats(s,
        graft.sources.SkippingRegistry.statsLivePath(s"$p/data"))
      val (pruned, _) = graft.sources.ZoneMaps.prunedRead(
        s, s"$p/data", stats,
        Seq(graft.sources.ZoneMaps.ColRange("n_chars", 150, 300)))
      pruned.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"))
        .orderBy(col("lang"))
    },
    Some("""SELECT lang, count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                   min(doc_id) AS min_doc, max(doc_id) AS max_doc
            FROM documents WHERE n_chars BETWEEN 150 AND 300
            GROUP BY lang ORDER BY lang"""))

  // Point-predicate file skipping over the SAME layout: doc_id is
  // scattered under the n_chars range order, so its [min, max] zones
  // span every file and zone maps prune nothing — the per-file Bloom
  // prunes instead (no false negatives: survivors re-filter with the
  // exact IN predicate, so the oracle is the plain filtered rows and
  // equality proves skipping lost nothing). ZoneMapsSpec pins the
  // actual file skipping.
  private val scanBloomPrune = Q(
    "scan_bloom_prune",
    (s, dir) => {
      val p = cachedZonemapLayout(s, dir)
      val bloom = graft.sources.ZoneMaps.loadStats(s,
        graft.sources.SkippingRegistry.bloomLivePath(s"$p/data"))
      val (pruned, _) = graft.sources.ZoneMaps.bloomPrunedRead(
        s, s"$p/data", bloom, "doc_id", Seq(7L, 123L, 401L))
      pruned.select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id, lang, n_chars FROM documents
            WHERE doc_id IN (7, 123, 401) ORDER BY doc_id"""))

  // The skipping layer as the DEFAULT read path (r12 VERDICT #1): the
  // same published artifacts, but consulted by the QUERY COMPILER — the
  // catalog registers the layout and a compiled F1 range clause on the
  // indexed column routes the entity scan through the pruned file list
  // before Spark schedules a task, with every clause still re-applied
  // by the clause-family pipeline (pruning never decides). The oracle
  // is the plain filtered aggregate over the full table — equality IS
  // the proof the routed plan lost nothing; PruneSpec pins that files
  // were actually skipped and the no-stats fallback.
  private def zonemapCatalog(s: org.apache.spark.sql.SparkSession,
      dir: String): graft.api.QueryCompiler.Catalog =
    graft.api.QueryCompiler.registryCatalog(
      s, s"${cachedZonemapLayout(s, dir)}/data", "doc_id")

  private val scanPrunedFilter = Q(
    "scan_pruned_filter",
    (s, dir) => {
      import graft.api.QueryCompiler._
      import graft.operators.Predicates
      val spec = QuerySpec(provenance = Seq(
        FieldClause("n_chars", Predicates.Ge, "150", isText = false),
        FieldClause("n_chars", Predicates.Le, "300", isText = false)))
      compile(spec, zonemapCatalog(s, dir))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"))
        .orderBy(col("lang"))
    },
    Some("""SELECT lang, count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                   min(doc_id) AS min_doc, max(doc_id) AS max_doc
            FROM documents WHERE n_chars BETWEEN 150 AND 300
            GROUP BY lang ORDER BY lang"""))

  // Point-predicate routing through the SAME compiled path: an equality
  // clause on the Bloom-indexed high-cardinality column (whose zones
  // span every file under the n_chars layout) prunes via the per-file
  // Bloom instead, AND-composed with a range clause so both skipping
  // artifacts participate in one compiled query.
  private val scanPrunedPoint = Q(
    "scan_pruned_point",
    (s, dir) => {
      import graft.api.QueryCompiler._
      import graft.operators.Predicates
      val spec = QuerySpec(provenance = Seq(
        FieldClause("doc_id", Predicates.Eq, "123", isText = false),
        FieldClause("n_chars", Predicates.Ge, "0", isText = false)))
      compile(spec, zonemapCatalog(s, dir))
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id, lang, n_chars FROM documents
            WHERE doc_id = 123 AND n_chars >= 0 ORDER BY doc_id"""))

  // S7 pasted-id-list routing: the archetypal point probe — an id list
  // on the Bloom-indexed entity id prunes files a file-survives-if-it-
  // may-contain-ANY-listed-id Bloom pass; the broadcast semi join
  // downstream still decides rows (pruning never decides), so the
  // oracle is the plain IN filter.
  private val scanPrunedList = Q(
    "scan_pruned_list",
    (s, dir) => {
      import graft.api.QueryCompiler._
      val spec = QuerySpec(idList = Some(Seq(7L, 123L, 401L)))
      compile(spec, zonemapCatalog(s, dir))
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id, lang, n_chars FROM documents
            WHERE doc_id IN (7, 123, 401) ORDER BY doc_id"""))

  // Registry-maintained stats across an INGEST (r13 VERDICT #1): the
  // table is created with half the corpus and registered; the other
  // half lands through SkippingRegistry.appendFiles, whose write path
  // refreshes the zone AND Bloom artifacts INLINE, scanning only the
  // delta files — the reference's trigger-maintained-stats discipline
  // (sql/isolatedb.sql:522-610) applied to the skipping layer. The
  // compiled range query then runs over the GROWN table through the
  // registry-resolved Layout; the oracle is the plain filtered
  // aggregate over the FULL documents table, so equality proves both
  // that post-ingest pruning lost no pre-existing rows and that the
  // appended rows are served (a stale survivor list would drop them).
  // ZoneMapsSpec pins that files are actually skipped post-ingest and
  // that registry-routed ≡ hand-routed.
  private val ingestLayoutCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def cachedIngestLayout(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    ingestLayoutCache.computeIfAbsent(
      Tables.sessionKey(s) + "|" + dir,
      _ => {
        val p = tmp(dir, s"ingeststats_${invocation.incrementAndGet()}")
        val docs = Tables.load(s, dir, "documents")
        docs.filter(col("doc_id") % 2 === 0)
          .repartitionByRange(8, col("n_chars"), col("doc_id"))
          .write.mode("overwrite").parquet(s"$p/data")
        graft.sources.SkippingRegistry.register(s, s"$p/data",
          zoneCols = Seq("n_chars"), bloomCol = Some("doc_id"))
        graft.sources.SkippingRegistry.appendFiles(
          docs.filter(col("doc_id") % 2 === 1)
            .repartitionByRange(8, col("n_chars"), col("doc_id")),
          s"$p/data")
        p
      })

  private val ingestStatsPublish = Q(
    "ingest_stats_publish",
    (s, dir) => {
      import graft.api.QueryCompiler._
      import graft.operators.Predicates
      val cat = registryCatalog(
        s, s"${cachedIngestLayout(s, dir)}/data", "doc_id")
      val spec = QuerySpec(provenance = Seq(
        FieldClause("n_chars", Predicates.Ge, "150", isText = false),
        FieldClause("n_chars", Predicates.Le, "300", isText = false)))
      compile(spec, cat)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"))
        .orderBy(col("lang"))
    },
    Some("""SELECT lang, count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                   min(doc_id) AS min_doc, max(doc_id) AS max_doc
            FROM documents WHERE n_chars BETWEEN 150 AND 300
            GROUP BY lang ORDER BY lang"""))

  // Text-clause file skipping (r13 VERDICT #2): the reference's
  // dominant clause class is case-insensitive text (Constants.pm:242)
  // backed by UPPER-expression indexes (sql/isolatedb.sql:984) — here
  // upper-cased per-file string zones prune ci equality (point
  // interval) and `starts with` (half-open [P, succ(P)) — see
  // ZoneMaps.TextRange for why a closed P+'￿' bound is unsound). The
  // third clause (prefix on an UNINDEXED text column) exercises the
  // sound drop-under-AND path. Oracle = the plain ci filter over the
  // full table; ZoneMapsSpec pins the case-fold rule and file skips.
  private val textLayoutCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def cachedTextLayout(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    textLayoutCache.computeIfAbsent(
      Tables.sessionKey(s) + "|" + dir,
      _ => {
        val p = tmp(dir, s"textzones_${invocation.incrementAndGet()}")
        Tables.load(s, dir, "documents")
          .repartitionByRange(8, col("lang"), col("doc_id"))
          .write.mode("overwrite").parquet(s"$p/data")
        graft.sources.SkippingRegistry.register(s, s"$p/data",
          zoneCols = Seq("lang"))
        p
      })

  private val scanPrunedText = Q(
    "scan_pruned_text",
    (s, dir) => {
      import graft.api.QueryCompiler._
      import graft.operators.Predicates
      val cat = registryCatalog(
        s, s"${cachedTextLayout(s, dir)}/data", "doc_id")
      val spec = QuerySpec(provenance = Seq(
        FieldClause("lang", Predicates.Eq, "de"),
        FieldClause("lang", Predicates.StartsWith, "d"),
        FieldClause("source", Predicates.StartsWith, "src")))
      compile(spec, cat)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"))
        .orderBy(col("lang"))
    },
    Some("""SELECT lang, count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                   min(doc_id) AS min_doc, max(doc_id) AS max_doc
            FROM documents
            WHERE upper(lang) = 'DE' AND upper(lang) LIKE 'D%'
              AND upper(source) LIKE 'SRC%'
            GROUP BY lang ORDER BY lang"""))

  // Date-clause file skipping (r13 VERDICT #2, the BRIN-on-datestamp
  // sibling, sql/seqdef.sql:360): DATE columns zone as epoch-day longs
  // and yyyy-MM-dd clause values prune as day intervals. The layout is
  // date-clustered (the natural order of an append-by-day corpus), so
  // a quarter's range clause skips the other quarters' files.
  private val dateLayoutCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def cachedDateLayout(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    dateLayoutCache.computeIfAbsent(
      Tables.sessionKey(s) + "|" + dir,
      _ => {
        val p = tmp(dir, s"datezones_${invocation.incrementAndGet()}")
        Tables.load(s, dir, "orders")
          .withColumn("o_orderdate", col("o_orderdate").cast("date"))
          .repartitionByRange(8, col("o_orderdate"), col("o_orderkey"))
          .write.mode("overwrite").parquet(s"$p/data")
        graft.sources.SkippingRegistry.register(s, s"$p/data",
          zoneCols = Seq("o_orderdate"))
        p
      })

  private val scanPrunedDate = Q(
    "scan_pruned_date",
    (s, dir) => {
      import graft.api.QueryCompiler._
      import graft.operators.Predicates
      val cat = registryCatalog(
        s, s"${cachedDateLayout(s, dir)}/data", "o_orderkey")
      val spec = QuerySpec(provenance = Seq(
        FieldClause("o_orderdate", Predicates.Ge, "1995-01-01",
          isText = false),
        FieldClause("o_orderdate", Predicates.Le, "1995-03-31",
          isText = false)))
      compile(spec, cat)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          min(col("o_orderdate")).cast("string").as("min_day"),
          max(col("o_orderdate")).cast("string").as("max_day"))
        .orderBy(col("o_orderstatus"))
    },
    Some("""SELECT o_orderstatus, count(*) AS n_orders,
                   CAST(min(CAST(o_orderdate AS DATE)) AS VARCHAR) AS min_day,
                   CAST(max(CAST(o_orderdate AS DATE)) AS VARCHAR) AS max_day
            FROM orders
            WHERE CAST(o_orderdate AS DATE) >= DATE '1995-01-01'
              AND CAST(o_orderdate AS DATE) <= DATE '1995-03-31'
            GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  // STREAM-maintained skipping stats (streaming/StatsStream): rows
  // arrive as micro-batches, each lands as one deterministically-named
  // data file and the zone + Bloom artifacts refresh inline under the
  // exactly-once batch marker — the trigger-maintained-stats
  // discipline, continuous. This replays the exact foreachBatch body
  // (maintainStep) for three batches plus a REDELIVERY of the last one
  // (the marker skips it); the compiled range query over the grown
  // table then shares the plain full-corpus oracle, so equality proves
  // the stream-maintained stats serve every committed row and the
  // replay added nothing. SkippingRegistrySpec drives the same
  // machinery through a real MemoryStream.
  private val streamStatsCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def cachedStreamStatsLayout(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    streamStatsCache.computeIfAbsent(
      Tables.sessionKey(s) + "|" + dir,
      _ => {
        val p = tmp(dir, s"streamstats_${invocation.incrementAndGet()}")
        val docs = Tables.load(s, dir, "documents")
        docs.filter(col("doc_id") % 2 === 0)
          .repartitionByRange(8, col("n_chars"), col("doc_id"))
          .write.mode("overwrite").parquet(s"$p/data")
        graft.sources.SkippingRegistry.register(s, s"$p/data",
          zoneCols = Seq("n_chars"), bloomCol = Some("doc_id"))
        val odd = docs.filter(col("doc_id") % 2 === 1)
        (0 to 2).foreach { c =>
          graft.streaming.StatsStream.maintainStep(
            odd.filter(col("doc_id") % 3 === c), c.toLong, s"$p/data")
        }
        // at-least-once redelivery of the last batch: the marker in the
        // published stats version skips it
        graft.streaming.StatsStream.maintainStep(
          odd.filter(col("doc_id") % 3 === 2), 2L, s"$p/data")
        p
      })

  private val streamStatsPublish = Q(
    "stream_stats_publish",
    (s, dir) => {
      import graft.api.QueryCompiler._
      import graft.operators.Predicates
      val cat = registryCatalog(
        s, s"${cachedStreamStatsLayout(s, dir)}/data", "doc_id")
      val spec = QuerySpec(provenance = Seq(
        FieldClause("n_chars", Predicates.Ge, "150", isText = false),
        FieldClause("n_chars", Predicates.Le, "300", isText = false)))
      compile(spec, cat)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"))
        .orderBy(col("lang"))
    },
    ingestStatsPublish.oracle)

  // Case-insensitive POINT pruning on text keys + IS NULL pruning —
  // the two clause classes the r14 zone work still left unserved.
  // One layout carries both: `doc_key` is a high-cardinality text key
  // SCATTERED under the layout order (upper-cased zones span every
  // file; only the case-FOLDED per-file Bloom can prune a ci equality
  // — the artifact records its fold, probes fold centrally), and
  // `opt_tag` is a mostly-null derived column CLUSTERED first, so the
  // per-file null counts give IS NULL real files to skip. Oracles are
  // the plain ci / IS NULL filters over documents with the derivations
  // replayed inline.
  private val pointLayoutCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def cachedPointLayout(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    pointLayoutCache.computeIfAbsent(
      Tables.sessionKey(s) + "|" + dir,
      _ => {
        val p = tmp(dir, s"pointzones_${invocation.incrementAndGet()}")
        Tables.load(s, dir, "documents")
          .withColumn("doc_key", concat(lit("DOC-"), col("doc_id")))
          .withColumn("opt_tag",
            when(col("n_chars") % 7 === 0,
              concat(lit("T"), upper(col("lang")))))
          .repartitionByRange(8, col("opt_tag"), col("doc_id"))
          .write.mode("overwrite").parquet(s"$p/data")
        graft.sources.SkippingRegistry.register(s, s"$p/data",
          zoneCols = Seq("opt_tag"), bloomCol = Some("doc_key"))
        p
      })

  private val scanPrunedTextPoint = Q(
    "scan_pruned_text_point",
    (s, dir) => {
      import graft.api.QueryCompiler._
      import graft.operators.Predicates
      val cat = registryCatalog(
        s, s"${cachedPointLayout(s, dir)}/data", "doc_id")
      val spec = QuerySpec(provenance = Seq(
        FieldClause("doc_key", Predicates.Eq, "doc-123")))
      compile(spec, cat)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id, lang, n_chars FROM documents
            WHERE upper('DOC-' || doc_id) = upper('doc-123')
            ORDER BY doc_id"""))

  private val scanPrunedNull = Q(
    "scan_pruned_null",
    (s, dir) => {
      import graft.api.QueryCompiler._
      import graft.operators.Predicates
      val cat = registryCatalog(
        s, s"${cachedPointLayout(s, dir)}/data", "doc_id")
      // the reference's null literal: `field = 'null'` compiles to
      // IS NULL (Predicates) and prunes via the per-file null counts
      val spec = QuerySpec(provenance = Seq(
        FieldClause("opt_tag", Predicates.Eq, "null")))
      compile(spec, cat)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("lang"))
    },
    Some("""SELECT lang, count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM documents
            WHERE (CASE WHEN n_chars % 7 = 0
                        THEN 'T' || upper(lang) END) IS NULL
            GROUP BY lang ORDER BY lang"""))

  // Fact-table file skipping (r13 VERDICT #3): the J1 designation
  // family's fact scan routes through per-file locus zones — the
  // reference's i_ad3 index on allele_designations.locus
  // (sql/isolatedb.sql:982) at file granularity, over a locus-
  // clustered fact layout. The oracle is j1_designation_and's own SQL
  // (same predicates: locus 1 quantity >= 30, locus 2 discount >=
  // 0.05, AND'd), so equality proves the pruned fact lost no
  // designations; ZoneMapsSpec pins that fact files were skipped.
  private val factLayoutCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def cachedFactLayout(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    factLayoutCache.computeIfAbsent(
      Tables.sessionKey(s) + "|" + dir,
      _ => {
        val p = tmp(dir, s"factzones_${invocation.incrementAndGet()}")
        Tables.load(s, dir, "lineitem")
          // the designation "allele" is the locus's own measure, so the
          // clause grammar (one allele column) expresses both predicates
          .withColumn("allele",
            when(col("l_linenumber") === 1, col("l_quantity"))
              .when(col("l_linenumber") === 2, col("l_discount")))
          .repartitionByRange(8, col("l_linenumber"), col("l_orderkey"))
          .write.mode("overwrite").parquet(s"$p/data")
        graft.sources.SkippingRegistry.register(s, s"$p/data",
          zoneCols = Seq("l_linenumber"))
        p
      })

  private val j1Pruned = Q(
    "j1_pruned",
    (s, dir) => {
      import graft.api.QueryCompiler._
      import graft.operators.Predicates
      val p = cachedFactLayout(s, dir)
      // registry-resolved fact attachment: facts frame + factSkipping
      // Layout both come from the table's own registration — no
      // hand-built Layout anywhere on the serving path
      val cat = withRegistryFacts(s,
        Catalog(entities = Tables.load(s, dir, "orders"),
          entityId = "o_orderkey"),
        s"$p/data", factEntityId = "l_orderkey",
        locusCol = "l_linenumber", alleleCol = "allele")
      val spec = QuerySpec(designations = Seq(
        HasAllele(1, Predicates.Ge, "30.0"),
        HasAllele(2, Predicates.Ge, "0.05")))
      compile(spec, cat)
        .select(col("o_orderkey").as("l_orderkey"))
        .orderBy(col("l_orderkey"))
    },
    Some("""SELECT l_orderkey FROM (
              SELECT l_orderkey,
                     bool_or(l_linenumber = 1 AND l_quantity >= 30.0) AS h1,
                     bool_or(l_linenumber = 2 AND l_discount >= 0.05) AS h2
              FROM lineitem
              WHERE (l_linenumber = 1 AND l_quantity >= 30.0)
                 OR (l_linenumber = 2 AND l_discount >= 0.05)
              GROUP BY l_orderkey) t
            WHERE h1 AND h2
            ORDER BY l_orderkey"""))

  // EAV fact file skipping (r14 VERDICT "what's wrong" #3): the
  // reference indexes every eav_* table per (isolate, field)
  // (sql/isolatedb.sql:1707-1812) — at file granularity a per-file
  // `field` zone over a field-clustered layout. The fused F7 pass only
  // consumes rows matching some clause's (field, value) predicate, so
  // the fact scan routes through the survivor union of the queried
  // fields' zones — for the NEGATED clause too: its flag is computed
  // from the same matching rows, and entities with none coalesce to
  // the same false. Oracle = the EXISTS / NOT EXISTS pair over the raw
  // rows; ZoneMapsSpec pins that fact files were skipped and
  // routed ≡ unrouted.
  private val eavLayoutCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def cachedEavLayout(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    eavLayoutCache.computeIfAbsent(
      Tables.sessionKey(s) + "|" + dir,
      _ => {
        val p = tmp(dir, s"eavzones_${invocation.incrementAndGet()}")
        Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey").as("entity_id"),
            concat(lit("f"), col("l_linenumber")).as("field"),
            col("l_returnflag").as("value"))
          .repartitionByRange(8, col("field"), col("entity_id"))
          .write.mode("overwrite").parquet(s"$p/data")
        graft.sources.SkippingRegistry.register(s, s"$p/data",
          zoneCols = Seq("field"))
        p
      })

  private val f7Pruned = Q(
    "f7_pruned",
    (s, dir) => {
      import graft.api.QueryCompiler._
      import graft.operators.Predicates
      val p = cachedEavLayout(s, dir)
      val cat = withRegistryEav(s,
        Catalog(entities = Tables.load(s, dir, "orders"),
          entityId = "o_orderkey"),
        s"$p/data")
      val spec = QuerySpec(eav = Seq(
        EavClause("f1", Predicates.Eq, "n"),
        EavClause("f2", Predicates.Eq, "r", negate = true)))
      compile(spec, cat)
        .select(col("o_orderkey"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey FROM orders o
            WHERE EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_linenumber = 1
                            AND upper(l.l_returnflag) = 'N')
              AND NOT EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_linenumber = 2
                            AND upper(l.l_returnflag) = 'R')
            ORDER BY o_orderkey"""))

  // Tag fact file skipping (allele_sequences' locus index at file
  // granularity): tag MEMBERSHIP and zero-inclusive tag COUNTS both
  // pre-filter to rows matching some clause's locus, so the
  // locus-clustered fact prunes to the queried loci's survivor union —
  // including the count clause, whose per-locus scope means rows
  // outside every queried locus contribute 0 either way (an unscoped
  // count clause declines pruning, like designations' counts).
  private val tagLayoutCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def cachedTagLayout(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    tagLayoutCache.computeIfAbsent(
      Tables.sessionKey(s) + "|" + dir,
      _ => {
        val p = tmp(dir, s"tagzones_${invocation.incrementAndGet()}")
        Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey").as("entity_id"),
            col("l_linenumber").as("locus"),
            (upper(col("l_returnflag")) === "N").as("complete"),
            when(upper(col("l_returnflag")) === "R", lit("flagged"))
              .as("flag"))
          .repartitionByRange(8, col("locus"), col("entity_id"))
          .write.mode("overwrite").parquet(s"$p/data")
        graft.sources.SkippingRegistry.register(s, s"$p/data",
          zoneCols = Seq("locus"))
        p
      })

  private val tagPruned = Q(
    "tag_pruned",
    (s, dir) => {
      import graft.api.QueryCompiler._
      import graft.operators.Predicates
      val p = cachedTagLayout(s, dir)
      val cat = withRegistryTags(s,
        Catalog(entities = Tables.load(s, dir, "orders"),
          entityId = "o_orderkey"),
        s"$p/data")
      val spec = QuerySpec(
        tags = Seq(TagClause(Some(1), TagComplete),
          TagClause(Some(3), Tagged)),
        tagCounts = Seq(TagCountClause(Predicates.Ge, 1, Some(2))))
      compile(spec, cat)
        .select(col("o_orderkey"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey FROM orders o
            WHERE EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_linenumber = 1
                            AND upper(l.l_returnflag) = 'N')
              AND EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_linenumber = 3)
              AND (SELECT count(*) FROM lineitem l
                   WHERE l.l_orderkey = o.o_orderkey
                     AND l.l_linenumber = 2) >= 1
            ORDER BY o_orderkey"""))

  // OR + grouped pruning (r14 VERDICT "what's wrong" #2): a grouped
  // clause is an OR over its member fields, so when EVERY member of
  // EVERY grouped clause is zone-indexed the OR-combined scalar family
  // stays prunable as the survivor union — here both `lang` and
  // `source` carry zones, the grouped arm (lang|source = 'fr')
  // contributes its members' units next to the provenance arm's, and
  // rows matching ONLY the grouped clause survive because their files
  // do. The oracle is the plain OR filter; ZoneMapsSpec pins both the
  // pruning (indexed members) and the decline (unindexed member).
  private val orGroupLayoutCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def cachedOrGroupLayout(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    orGroupLayoutCache.computeIfAbsent(
      Tables.sessionKey(s) + "|" + dir,
      _ => {
        val p = tmp(dir, s"orgroupzones_${invocation.incrementAndGet()}")
        Tables.load(s, dir, "documents")
          .repartitionByRange(8, col("lang"), col("doc_id"))
          .write.mode("overwrite").parquet(s"$p/data")
        graft.sources.SkippingRegistry.register(s, s"$p/data",
          zoneCols = Seq("lang", "source"))
        p
      })

  private val scanPrunedOrGrouped = Q(
    "scan_pruned_or_grouped",
    (s, dir) => {
      import graft.api.QueryCompiler._
      import graft.operators.Predicates
      val cat = registryCatalog(
        s, s"${cachedOrGroupLayout(s, dir)}/data", "doc_id")
      val spec = QuerySpec(
        provenance = Seq(FieldClause("lang", Predicates.Eq, "de")),
        grouped = Seq(GroupClause(Seq("lang", "source"),
          Predicates.Eq, "fr")),
        provenanceCombine = CombineOr)
      compile(spec, cat)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"))
        .orderBy(col("lang"))
    },
    Some("""SELECT lang, count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                   min(doc_id) AS min_doc, max(doc_id) AS max_doc
            FROM documents
            WHERE upper(lang) = 'DE'
               OR (upper(lang) = 'FR' OR upper(source) = 'FR')
            GROUP BY lang ORDER BY lang"""))

  val qs: Seq[Q] = Seq(s2SchemaConfig, s5LocusDownload, s6RemoteContigs,
    s8Embl, s8Gff3, jsonlRoundtrip, curateValidate, curateRules,
    webdatasetRoundtrip,
    xlsxRoundtrip, scanZonemapPrune, scanBloomPrune,
    scanPrunedFilter, scanPrunedPoint, scanPrunedList,
    ingestStatsPublish, scanPrunedText, scanPrunedDate, j1Pruned,
    scanPrunedTextPoint, scanPrunedNull, streamStatsPublish,
    f7Pruned, tagPruned, scanPrunedOrGrouped)
}
