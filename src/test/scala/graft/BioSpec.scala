package graft

import graft.functions.Bio
import org.apache.spark.sql.functions._

/** Golden tests for the bio scalar expressions (SURVEY §2.8), semantics from
  * lib/BIGSdb/Utils.pm:39-103.
  */
class BioSpec extends SparkSpec {
  import spark.implicits._

  test("reverseComplementString matches tr/GATCgatc/CTAGctag/ + reverse") {
    assert(Bio.reverseComplementString("ATGC") == "GCAT")
    assert(Bio.reverseComplementString("AAAA") == "TTTT")
    assert(Bio.reverseComplementString("atgc") == "gcat")
    // non-ACGT chars pass through unchanged (tr/// semantics), position reversed
    assert(Bio.reverseComplementString("AXG") == "CXT")
    assert(Bio.reverseComplementString("") == "")
  }

  test("reverseComplement expression evaluates via codegen on a DataFrame") {
    val df = Seq("ATGC", "GGGTTT").toDF("seq")
      .select(Bio.reverseComplement(col("seq")).as("rc"))
    assert(rows(df).map(_.head) == Seq("GCAT", "AAACCC"))
  }

  test("reverseComplement is its own inverse") {
    val seqs = Seq("ATGCATGCATGC", "ACGTACGT", "TTTTAAAACCCCGGGG")
    for (s <- seqs)
      assert(Bio.reverseComplementString(Bio.reverseComplementString(s)) == s)
  }

  test("isCompleteCds: ATG/GTG/TTG start, terminal stop, no internal stop, len%3==0") {
    assert(Bio.isCompleteCdsString("ATGAAATAG"))       // ATG AAA TAG
    assert(Bio.isCompleteCdsString("GTGAAATAA"))       // alt start GTG
    assert(Bio.isCompleteCdsString("TTGAAATGA"))       // alt start TTG
    assert(!Bio.isCompleteCdsString("ATGAAATAGC"))     // len % 3 != 0
    assert(!Bio.isCompleteCdsString("CCCAAATAG"))      // bad start
    assert(!Bio.isCompleteCdsString("ATGAAACCC"))      // no terminal stop
    assert(!Bio.isCompleteCdsString("ATGTAGAAATAG"))   // internal stop
    assert(Bio.isCompleteCdsString("ATGTAG"))          // minimal start+stop CDS
    assert(!Bio.isCompleteCdsString("ATG"))            // below minimum length
    assert(Bio.isCompleteCdsString("atgaaatag"))       // case-insensitive
  }

  test("translateString uses the standard codon table") {
    assert(Bio.translateString("ATGAAATAG") == "MK*")
    assert(Bio.translateString("ATGGCCGAA") == "MAE")
    assert(Bio.translateString("TTTTTC") == "FF")
    // partial trailing codon dropped; unknown codon -> X
    assert(Bio.translateString("ATGAA") == "M")
    assert(Bio.translateString("ATGNNN") == "MX")
  }

  test("SQL registration: reverse_complement / is_complete_cds / translate_dna") {
    Bio.registerAll(spark)
    val out = spark.sql(
      "SELECT reverse_complement('ATGC') rc, is_complete_cds('ATGAAATAG') cds, " +
      "translate_dna('ATGAAATAG') aa").collect().head
    assert(out.getString(0) == "GCAT")
    assert(out.getBoolean(1))
    assert(out.getString(2) == "MK*")
  }

  test("gcContent and isValidDna") {
    val df = Seq(("GGCC", true), ("ATAT", true), ("GCAT", true)).toDF("seq", "exp")
      .select(round(Bio.gcContent(col("seq")), 4).as("gc"),
              Bio.isValidDna(col("seq")).as("ok"))
    assert(rows(df) == Seq(Seq(1.0, true), Seq(0.0, true), Seq(0.5, true)))
    val bad = Seq("AXGT").toDF("seq").select(Bio.isValidDna(col("seq")))
    assert(rows(bad).head.head == false)
  }
}
