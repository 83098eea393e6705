package graft.operators

import graft.functions.Bio
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Intron-aware tag feature segmentation — the data layer of the
  * reference's allele-sequence display (SURVEY §2 J12 detail).
  *
  * The reference models per-tag introns (sql/isolatedb.sql:940-950,
  * `introns(id, start_pos, end_pos)` keyed to `allele_sequences`) and
  * renders a tagged region as an ordered feature list — upstream
  * flanking, exon/intron alternation (or one `allele_seq` when no
  * introns), downstream flanking — reverse-complementing and reversing
  * the list for reverse-strand tags, plus the spliced (exons-only)
  * sequence and any curation flags
  * (lib/BIGSdb/ExtractedSequencePage.pm:153-196 get_seq_features,
  * lib/BIGSdb/AlleleSequencePage.pm:86-150).
  *
  * Re-expression: one equi join of tags to contigs on seqbin_id (the
  * contig side is the 100 TB side; tags shuffle to it), introns and
  * flags pre-grouped per tag id (k-row lists), then the whole
  * segmentation is ONE narrow projection — an `aggregate` fold over the
  * sorted intron list emitting the exon/intron alternation, `concat`ed
  * with the two flank segments, reversed+revcomp'd per strand. No
  * per-tag window, no explode before the final posexplode of the
  * (few-element) feature list.
  */
object TagFeatures {

  private val featType = "array<struct<feature:string,seq:string>>"

  /** Segment tagged regions into ordered features.
    *
    * @param tags    (id, seqbin_id, start_pos, end_pos, reverse) — one row
    *                per tag, 1-based inclusive positions
    * @param contigs (seqbin_id, sequence)
    * @param introns (id, start_pos, end_pos) — contig coordinates, within
    *                the tag span, non-overlapping
    * @param flags   (id, flag) — curation flags per tag
    * @param flanking requested flanking length (reference default 100;
    *                truncated at contig edges exactly as the Perl does)
    * @return one row per feature: (id, seqbin_id, ord, feature, seq,
    *         flags, spliced) — ord 1-based in display order, flags the
    *         sorted ';'-joined flag list ('' when none), spliced the
    *         exon-only concatenation in display order
    */
  def features(tags: DataFrame, contigs: DataFrame, introns: DataFrame,
      flags: DataFrame, flanking: Int): DataFrame = {
    val intronAgg = introns.groupBy(col("id")).agg(
      sort_array(collect_list(struct(
        col("start_pos").cast("long").as("s"),
        col("end_pos").cast("long").as("e")))).as("__in"))
    val flagAgg = flags.groupBy(col("id")).agg(
      array_join(sort_array(collect_list(col("flag"))), ";").as("flags"))

    val joined = tags
      .select(col("id"), col("seqbin_id"),
        col("start_pos").cast("long").as("__s"),
        col("end_pos").cast("long").as("__e"),
        col("reverse").cast("boolean").as("__rev"))
      .join(contigs.select(col("seqbin_id"), col("sequence").as("__seq")),
        Seq("seqbin_id"))
      .join(intronAgg, Seq("id"), "left")
      .join(flagAgg, Seq("id"), "left")
      .withColumn("__in",
        coalesce(col("__in"), lit(null).cast(s"array<struct<s:bigint,e:bigint>>")))

    val seq = col("__seq")
    val s = col("__s")
    val e = col("__e")
    val contigLen = length(seq).cast("long")

    // Perl: $start - $flanking < 0 ? $start - 1 : $flanking  (:160)
    val up = when(s - flanking < 0, s - 1).otherwise(lit(flanking.toLong))
    // Perl: $contig_length - $end > $flanking ? $flanking : $contig_length - $end
    val down = when(contigLen - e > flanking, lit(flanking.toLong))
      .otherwise(contigLen - e)

    def feat(name: String, sq: Column): Column =
      struct(lit(name).as("feature"), sq.as("seq"))
    val emptyFeats = array().cast(featType)

    // exon/intron alternation: fold the sorted intron list carrying the
    // 0-based cursor, exactly the Perl loop (:167-178)
    val folded = aggregate(
      coalesce(col("__in"), lit(null).cast("array<struct<s:bigint,e:bigint>>")),
      struct(emptyFeats.as("fs"), (s - 1).as("cur")),
      (acc, in) => struct(
        concat(acc.getField("fs"), array(
          feat("exon",
            seq.substr(acc.getField("cur") + 1,
              in.getField("s") - acc.getField("cur") - 1)),
          feat("intron",
            seq.substr(in.getField("s"),
              in.getField("e") - in.getField("s") + 1)))).as("fs"),
        in.getField("e").as("cur")))

    val mid = when(size(col("__in")) > 0,
        concat(folded.getField("fs"),
          array(feat("exon",
            seq.substr(folded.getField("cur") + 1, e - folded.getField("cur"))))))
      .otherwise(array(feat("allele_seq", seq.substr(s, e - s + 1))))

    val fwd = concat(
      when(up > 0, array(feat("flanking", seq.substr(s - up, up))))
        .otherwise(emptyFeats),
      mid,
      when(down > 0, array(feat("flanking", seq.substr(e + 1, down))))
        .otherwise(emptyFeats))

    // reverse strand: reverse-complement each segment AND the list order
    // (ExtractedSequencePage.pm:189-196)
    val oriented = when(col("__rev"),
        reverse(transform(fwd, f => struct(
          f.getField("feature").as("feature"),
          Bio.reverseComplement(f.getField("seq")).as("seq")))))
      .otherwise(fwd)

    val spliced = array_join(transform(
      filter(oriented, f =>
        f.getField("feature").isin("exon", "allele_seq")),
      _.getField("seq")), "")

    joined
      .withColumn("__feats", oriented)
      .withColumn("spliced", spliced)
      .withColumn("flags", coalesce(col("flags"), lit("")))
      .select(col("id"), col("seqbin_id"), col("flags"), col("spliced"),
        posexplode(col("__feats")).as(Seq("__i", "__f")))
      .select(col("id"), col("seqbin_id"),
        (col("__i") + 1).cast("long").as("ord"),
        col("__f.feature").as("feature"), col("__f.seq").as("seq"),
        col("flags"), col("spliced"))
  }
}
