package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language ID, document fingerprinting. All built-ins —
  * narrow, codegen'd, no UDFs in the hot path.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** BPE-ish subword count: word-boundary pieces + digits + punctuation,
    * the regex approximation of a byte-pair tokenizer's pre-tokenizer.
    */
  def subwordCount(text: Column): Column =
    size(filter(split(text, "(?=[\\s\\p{Punct}])|(?<=[\\s\\p{Punct}])"),
      x => trim(x) =!= ""))

  /** Quality features: length, token count, mean word length, punctuation
    * ratio, stopword ratio, uppercase ratio. Returns a struct column.
    */
  def qualityFeatures(text: Column, stopwords: Seq[String]): Column = {
    val chars = length(text).cast("double")
    val toks = tokenCount(text).cast("double")
    val punct = (length(text) -
      length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double")
    val uppers = (length(text) -
      length(regexp_replace(text, "[A-Z]", ""))).cast("double")
    val words = split(lower(trim(text)), "\\s+")
    val stop = size(filter(words, w => w.isin(stopwords: _*))).cast("double")
    struct(
      chars.as("n_chars"),
      toks.as("n_tokens"),
      when(toks > 0, chars / toks).otherwise(lit(0.0)).as("mean_word_len"),
      when(chars > 0, punct / chars).otherwise(lit(0.0)).as("punct_ratio"),
      when(chars > 0, uppers / chars).otherwise(lit(0.0)).as("upper_ratio"),
      when(toks > 0, stop / toks).otherwise(lit(0.0)).as("stopword_ratio"))
  }

  /** Language-ID by stopword-set voting: the language whose marker-word set
    * has the highest hit count wins (n-gram heuristic family). Deterministic
    * tie-break: language name ascending.
    *
    * Prefer projecting the word array once and calling `languageIdFromWords`
    * over that column: higher-order functions are interpreted, and inlining
    * `split` into every per-language score re-tokenizes the text N times.
    */
  def languageId(text: Column, markers: Map[String, Seq[String]]): Column =
    languageIdFromWords(split(lower(trim(text)), "\\s+"), markers)

  /** languageId over a pre-tokenized lowercase word array. */
  def languageIdFromWords(words: Column, markers: Map[String, Seq[String]]): Column = {
    val scored = markers.toSeq.sortBy(_._1).map { case (lang, ws) =>
      struct(size(filter(words, w => w.isin(ws: _*))).as("hits"),
             lit(lang).as("lang"))
    }
    // strict-greater fold: first language in ascending name order wins ties
    val best = scored.reduce((a, b) =>
      when(b.getField("hits") > a.getField("hits"), b).otherwise(a))
    best.getField("lang")
  }

  /** Rolling polynomial fingerprint (Karp-Rabin family) of the document:
    * hash = sum(byte_i * B^i mod P) over the first `prefix` chars —
    * content-stable, order-sensitive, cheap. Built-ins only.
    */
  def fingerprint(text: Column, prefix: Int = 64): Column = {
    val p = 1000000007L
    val bytes = transform(
      split(substring(text, 1, prefix), ""),
      c => ascii(c).cast("long"))
    aggregate(bytes, struct(lit(0L).as("h"), lit(1L).as("pow")),
      (acc, b) => struct(
        pmod(acc.getField("h") + b * acc.getField("pow"), lit(p)).as("h"),
        pmod(acc.getField("pow") * 131L, lit(p)).as("pow")),
      acc => acc.getField("h"))
  }
}
