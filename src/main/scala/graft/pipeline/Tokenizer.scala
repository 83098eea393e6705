package graft.pipeline

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer induction (Sennrich et al. 2016 — the
  * subword-vocabulary step every pretraining pipeline runs before token
  * counting means anything) re-expressed as an iterative Spark job, plus
  * the greedy encode path under a learned merge table.
  *
  * Representation: a word is its symbol sequence joined by TWO spaces
  * ("h  e  l  l  o"). The alphabet is restricted to `[a-z]+` words (the
  * documented normalization — anything else is out of the subword
  * vocabulary), so the delimiter can never collide with symbol content,
  * and one `replace(' a  b ', ' ab ')` over the single-space-padded form
  * applies a merge to every non-overlapping occurrence left-to-right —
  * the exact leftmost-greedy semantics of the reference algorithm, and
  * identical between Spark's `StringReplace` and DuckDB's `replace`, so
  * the whole training recursion is replayable by the oracle.
  *
  * Scale posture (100 TB of text): training never iterates the corpus.
  * The corpus reduces ONCE to the word-frequency vocabulary (the standard
  * BPE preprocessing — one shuffle); each merge round is then (a) one
  * map-side-combinable pair-count aggregation over the vocab, (b) a
  * 1-row TakeOrdered argmax to the driver, and (c) a narrow
  * literal-inlined `replace` over the vocab (the kmeansTrain posture:
  * only the winning pair crosses the driver per round). Encoding is a
  * chain of `rounds` codegen'd string replaces per word — narrow, merges
  * inlined as literals, no shuffle, stream-safe.
  */
object Tokenizer {

  /** One learned merge: rank (1-based), the pair ("a b"), the fused
    * symbol ("ab"), and the weighted adjacency count that won the round.
    */
  final case class Merge(rank: Int, pair: String, merged: String, n: Long)

  /** `[a-z]+` tokens of a document — the normalized word stream the
    * subword vocabulary is induced from.
    */
  def alphaWords(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), w => w.rlike("^[a-z]+$"))

  /** Character-level symbol representation of a word (double-space join). */
  private def charRepr(w: Column): Column =
    concat_ws("  ", transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1))))

  /** Apply one learned merge to a repr column (leftmost non-overlapping). */
  private def applyMerge(repr: Column, pair: String): Column = {
    val pat = " " + pair.replace(" ", "  ") + " "
    val rep = " " + pair.replace(" ", "") + " "
    trim(replace(concat(lit(" "), repr, lit(" ")), lit(pat), lit(rep)))
  }

  /** The word-frequency vocabulary: the single corpus-wide reduction that
    * feeds every training round. (word, cnt), `[a-z]+` words only.
    */
  def wordFreq(docs: DataFrame, text: String): DataFrame =
    docs.select(explode(alphaWords(col(text))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))

  /** Learn `rounds` BPE merges from the corpus. Ties on the adjacency
    * count break by ascending pair string (total order — both engines
    * compare ascii binary), so the merge table is a pure function of the
    * corpus. Stops early if no adjacent pair remains.
    */
  def bpeTrain(docs: DataFrame, text: String, rounds: Int): Seq[Merge] = {
    val merges = ArrayBuffer.empty[Merge]
    var words = wordFreq(docs, text)
      .select(col("cnt"), charRepr(col("w")).as("repr")).cache()
    words.count()
    try {
      var r = 1
      var exhausted = false
      while (r <= rounds && !exhausted) {
        val syms = split(col("repr"), "  ")
        val best = words
          .select(col("cnt"), explode(zip_with(
              slice(syms, lit(1), size(syms) - 1),
              slice(syms, lit(2), size(syms) - 1),
              (a, b) => concat(a, lit(" "), b))).as("pair"))
          .groupBy(col("pair")).agg(sum(col("cnt")).as("n"))
          .orderBy(col("n").desc, col("pair").asc)
          .limit(1).collect()
        if (best.isEmpty) exhausted = true
        else {
          val pair = best(0).getString(0)
          merges += Merge(r, pair, pair.replace(" ", ""), best(0).getLong(1))
          val next = words
            .withColumn("repr", applyMerge(col("repr"), pair)).cache()
          next.count()
          words.unpersist()
          words = next
          r += 1
        }
      }
    } finally words.unpersist()
    merges.toSeq
  }

  /** Greedy BPE encode of one word under the learned merge table: the
    * merges are replayed in rank order (the standard encode semantics for
    * a rank-ordered merge list). Returns the symbol array. Narrow chain
    * of `merges.size` literal replaces — codegen'd, stream-safe.
    */
  def encodeWord(w: Column, merges: Seq[Merge]): Column = {
    val repr = merges.foldLeft(charRepr(w))((acc, m) => applyMerge(acc, m.pair))
    split(repr, "  ")
  }

  /** Per-document BPE token count under a learned merge table: the sum of
    * per-word symbol counts over the `[a-z]+` word stream (out-of-alphabet
    * words are outside the subword vocabulary by construction — documented
    * normalization, excluded on both engines). One narrow projection.
    */
  def bpeTokenCount(text: Column, merges: Seq[Merge]): Column =
    aggregate(alphaWords(text), lit(0L),
      (acc, w) => acc + size(encodeWord(w, merges)).cast("long"))
}
