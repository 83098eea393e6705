package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho-Corasick automaton for one-pass multi-pattern matching — the scan
  * kernel behind [[graft.operators.SeqScan.multiPatternTagScan]].
  *
  * The reference's tag scanner matches every locus's allele library against
  * every contig (lib/BIGSdb/Offline/Scan.pm:63-287, one BLAST run per
  * locus batch). The per-pattern kernel ([[Bio.occurrences]]) re-walks the
  * contig once per library entry — O(contigLen × nPatterns). This automaton
  * walks each contig ONCE for the whole library — O(contigLen + hits) —
  * which is the difference that matters when the library is thousands of
  * alleles and the corpus is 100 TB of contigs: per-executor work drops by
  * the library factor, and the library ships as one broadcast object
  * (data, not a plan literal, like [[SeedIndex]]).
  *
  * Built once on the driver (classic BFS failure links, outputs merged
  * into each node so emission never chases fail chains), shipped as a
  * broadcast. Transitions are per-node sorted char arrays + binary search:
  * alphabet-agnostic, cache-compact, and the fail chase is amortized O(1)
  * per input char.
  */
final class AcAutomaton private[functions] (
    private[functions] val chars: Array[Array[Char]], // per-node sorted edge chars
    private[functions] val next: Array[Array[Int]],   // per-node edge targets
    private[functions] val fail: Array[Int],
    private[functions] val outs: Array[Array[Int]],   // merged pattern ids per node
    val patLens: Array[Int]) extends Serializable {

  private[functions] def step(from: Int, c: Char): Int = {
    var state = from
    while (true) {
      val cs = chars(state)
      val i = java.util.Arrays.binarySearch(cs, c)
      if (i >= 0) return next(state)(i)
      if (state == 0) return 0
      state = fail(state)
    }
    0 // unreachable
  }
}

object AcAutomaton {

  /** Build from patterns (pattern id = array position). Empty patterns are
    * rejected; duplicate strings are fine (each id keeps its own output).
    */
  def build(patterns: Array[String]): AcAutomaton = {
    require(patterns.forall(_.nonEmpty), "patterns must be non-empty")
    // trie with per-node java HashMap, frozen to sorted arrays at the end
    val edges = scala.collection.mutable.ArrayBuffer(
      new java.util.TreeMap[Character, Integer]())
    val outBuf = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pid) =>
      var node = 0
      p.foreach { c =>
        val m = edges(node)
        val nxt = m.get(c)
        if (nxt != null) node = nxt.intValue()
        else {
          edges += new java.util.TreeMap[Character, Integer]()
          outBuf += scala.collection.mutable.ArrayBuffer.empty[Int]
          m.put(c, edges.size - 1)
          node = edges.size - 1
        }
      }
      outBuf(node) += pid
    }
    val n = edges.size
    val fail = new Array[Int](n)
    // BFS: set failure links; merge fail-target outputs into each node
    val queue = new java.util.ArrayDeque[Integer]()
    edges(0).forEach { (_, v) =>
      fail(v.intValue()) = 0; queue.add(v)
    }
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      edges(u).forEach { (c, v0) =>
        val v = v0.intValue()
        var f = fail(u)
        while (f != 0 && !edges(f).containsKey(c)) f = fail(f)
        val fv = edges(f).get(c)
        fail(v) = if (fv != null && fv.intValue() != v) fv.intValue() else 0
        outBuf(v) ++= outBuf(fail(v))
        queue.add(v)
      }
    }
    val chars = Array.tabulate(n) { i =>
      val cs = new Array[Char](edges(i).size)
      var j = 0; edges(i).forEach { (c, _) => cs(j) = c; j += 1 }
      cs
    }
    val next = Array.tabulate(n) { i =>
      val ns = new Array[Int](edges(i).size)
      var j = 0; edges(i).forEach { (_, v) => ns(j) = v; j += 1 }
      ns
    }
    new AcAutomaton(chars, next, fail, outBuf.map(_.toArray).toArray,
      patterns.map(_.length))
  }
}

object MultiPattern {

  /** One automaton pass over `s`: every occurrence of every pattern, packed
    * as (patternId << 32) | startPos with 1-based, overlapping starts —
    * one long per hit keeps the exploded column narrow and codegen-simple.
    */
  def acScanKernel(s: UTF8String, ac: AcAutomaton): Any = {
    val str = s.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var state = 0
    var i = 0
    while (i < str.length) {
      state = ac.step(state, str.charAt(i))
      val os = ac.outs(state)
      var j = 0
      while (j < os.length) {
        val pid = os(j)
        val start = i - ac.patLens(pid) + 2 // 1-based
        out += (pid.toLong << 32) | start.toLong
        j += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out.toArray)
  }

  case class AcScan(
      child: Expression,
      bc: org.apache.spark.broadcast.Broadcast[AcAutomaton])
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      acScanKernel(input.asInstanceOf[UTF8String], bc.value)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val bcRef = ctx.addReferenceObj("acAutomatonBc", bc,
        "org.apache.spark.broadcast.Broadcast")
      defineCodeGen(ctx, ev, c =>
        s"(org.apache.spark.sql.catalyst.util.ArrayData)" +
          s"graft.functions.MultiPattern$$.MODULE$$.acScanKernel($c, " +
          s"(graft.functions.AcAutomaton)$bcRef.value())")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** Column wrapper: packed (patternId << 32 | start1Based) hit longs. */
  def acScan(hay: Column,
      bc: org.apache.spark.broadcast.Broadcast[AcAutomaton]): Column =
    ExpressionUtils.column(AcScan(ExpressionUtils.expression(hay), bc))
}
