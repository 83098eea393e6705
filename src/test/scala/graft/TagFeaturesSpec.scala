package graft

import graft.operators.TagFeatures

class TagFeaturesSpec extends SparkSpec {
  import spark.implicits._

  // contig (1-based): A C G T A A C C G G T T A C G T A C G T
  private val contig = "ACGTAACCGGTTACGTACGT"

  test("features: flank/exon/intron segmentation, reverse strand, flags, spliced") {
    val contigs = Seq((1L, contig)).toDF("seqbin_id", "sequence")
    val tags = Seq((1L, 1L, 5L, 16L, false), (2L, 1L, 5L, 16L, true))
      .toDF("id", "seqbin_id", "start_pos", "end_pos", "reverse")
    val introns = Seq((1L, 8L, 10L), (2L, 8L, 10L))
      .toDF("id", "start_pos", "end_pos")
    val flags = Seq((1L, "b flag"), (1L, "a flag")).toDF("id", "flag")
    val out = TagFeatures.features(tags, contigs, introns, flags, 3)
      .orderBy("id", "ord")
      .select("id", "ord", "feature", "seq", "flags", "spliced")
      .as[(Long, Long, String, String, String, String)].collect().toList
    assert(out == List(
      (1L, 1L, "flanking", "CGT", "a flag;b flag", "AACTTACGT"),
      (1L, 2L, "exon", "AAC", "a flag;b flag", "AACTTACGT"),
      (1L, 3L, "intron", "CGG", "a flag;b flag", "AACTTACGT"),
      (1L, 4L, "exon", "TTACGT", "a flag;b flag", "AACTTACGT"),
      (1L, 5L, "flanking", "ACG", "a flag;b flag", "AACTTACGT"),
      (2L, 1L, "flanking", "CGT", "", "ACGTAAGTT"),
      (2L, 2L, "exon", "ACGTAA", "", "ACGTAAGTT"),
      (2L, 3L, "intron", "CCG", "", "ACGTAAGTT"),
      (2L, 4L, "exon", "GTT", "", "ACGTAAGTT"),
      (2L, 5L, "flanking", "ACG", "", "ACGTAAGTT")))
  }

  test("features: no introns gives allele_seq; flanks truncate at contig edges") {
    val contigs = Seq((1L, "ACGTACGT")).toDF("seqbin_id", "sequence")
    val tags = Seq((1L, 1L, 2L, 6L, false))
      .toDF("id", "seqbin_id", "start_pos", "end_pos", "reverse")
    val introns = Seq.empty[(Long, Long, Long)]
      .toDF("id", "start_pos", "end_pos")
    val flags = Seq.empty[(Long, String)].toDF("id", "flag")
    val out = TagFeatures.features(tags, contigs, introns, flags, 5)
      .orderBy("ord")
      .select("ord", "feature", "seq", "spliced")
      .as[(Long, String, String, String)].collect().toList
    // up = start - 1 = 1 (flanking exceeds upstream room);
    // down = contigLen - end = 2 (flanking exceeds downstream room)
    assert(out == List(
      (1L, "flanking", "A", "CGTAC"),
      (2L, "allele_seq", "CGTAC", "CGTAC"),
      (3L, "flanking", "GT", "CGTAC")))
  }
}
