package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{ColumnBridge => Bridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Vector arithmetic as native codegen'd Catalyst expressions.
  *
  * The built-in higher-order-function form
  * (`aggregate(zip_with(a,b,_*_), 0.0, _+_)`) is interpreted — three array
  * traversals with per-element boxing per pair. These expressions run the
  * whole similarity kernel as one generated loop over the unsafe array
  * data, keeping ANN scoring inside whole-stage codegen (the builder
  * prompt's "custom Expression beats UDF" tier).
  */
object Vectors {

  /** cosine(a, b) over ARRAY<DOUBLE>: dot and both norms in ONE loop;
    * zero-norm → 0.0 (never NaN). Arrays of different lengths compare over
    * the shorter prefix.
    */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(l, r)

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) {
        val xi = x.getDouble(i); val yi = y.getDouble(i)
        dot += xi * yi; na += xi * xi; nb += yi * yi
        i += 1
      }
      val d = na * nb
      if (d > 0) dot / math.sqrt(d) else 0.0
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val dot = ctx.freshName("dot")
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val xi = ctx.freshName("xi")
        val yi = ctx.freshName("yi")
        val d = ctx.freshName("d")
        s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $xi = $a.getDouble($i);
          double $yi = $b.getDouble($i);
          $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
        }
        double $d = $na * $nb;
        ${ev.value} = ($d > 0) ? $dot / java.lang.Math.sqrt($d) : 0.0;
        """
      })
  }

  /** Dot product over ARRAY<DOUBLE> — same fused-loop treatment. */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(l, r)

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0; var i = 0
      while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
      dot
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val dot = ctx.freshName("dot")
        s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $dot += $a.getDouble($i) * $b.getDouble($i);
        }
        ${ev.value} = $dot;
        """
      })
  }

  /** Squared Euclidean distance — one fused loop, same sequential
    * summation as the interpreted zip_with/aggregate fold it replaces
    * (identical doubles), but inside whole-stage codegen. The k-means
    * assignment hot path runs this k times per corpus row.
    */
  case class SquaredL2(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(l, r)

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0; var i = 0
      while (i < n) {
        val d = x.getDouble(i) - y.getDouble(i); s += d * d; i += 1
      }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        val d = ctx.freshName("d")
        s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $d = $a.getDouble($i) - $b.getDouble($i);
          $s += $d * $d;
        }
        ${ev.value} = $s;
        """
      })
  }

  def cosine(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))

  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  def l2sq(a: Column, b: Column): Column =
    Bridge.column(SquaredL2(Bridge.expression(a), Bridge.expression(b)))

  /** 64-bit SimHash over an ARRAY<BIGINT> of shingle hashes — all 64 bit
    * votes accumulate in ONE pass over the array. The HOF form (one
    * `aggregate` fold per bit) re-traverses the array 64 times through
    * interpreted lambda plumbing; the honest (unpruned) bench caught it
    * at 4.3s on sf0.1 — this fused kernel is the same math in one tight
    * codegen'd loop. Bit b of the result is set iff more shingles carry
    * bit b than not (+1/−1 votes, strict majority).
    */
  case class SimHash64(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    override def dataType: DataType = LongType
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(c)

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val votes = new Array[Int](64)
      var i = 0
      while (i < n) {
        val h = arr.getLong(i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
        i += 1
      }
      var out = 0L
      var b = 0
      while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
      out
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val b = ctx.freshName("b")
        val h = ctx.freshName("h")
        val votes = ctx.freshName("votes")
        val out = ctx.freshName("out")
        s"""
        int $n = $a.numElements();
        int[] $votes = new int[64];
        for (int $i = 0; $i < $n; $i++) {
          long $h = $a.getLong($i);
          for (int $b = 0; $b < 64; $b++) {
            if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
          }
        }
        long $out = 0L;
        for (int $b = 0; $b < 64; $b++) {
          if ($votes[$b] > 0) $out |= (1L << $b);
        }
        ${ev.value} = $out;
        """
      })
  }

  def simhash64(shingleHashes: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(shingleHashes)))

  /** MinHash signature over an ARRAY<BIGINT> of element hashes: k universal
    * hashes h_i(x) = (a_i·(x mod p) + b_i) mod p, min per i — all k mins in
    * ONE fused loop over the input (the HOF form re-traverses the array k
    * times, interpreted). Same (seeded) coefficients and arithmetic as the
    * built-in-expression form, so signatures are stable across engines.
    */
  case class MinHashSig(child: Expression, k: Int, seed: Long)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    private val P = 2147483647L // 2^31-1

    // Universal-hash coefficients derived from md5 of a seed-and-index tag,
    // not from a JVM PRNG: any engine with md5 can replay the identical
    // signature (the DuckDB oracle for dedup_minhash_lsh does exactly that).
    @transient private lazy val coefs: (Array[Long], Array[Long]) = {
      val as = Array.tabulate(k)(i => (MinHashSig.md5Long60(s"graft-mh-a-$seed-$i") % (P - 1)) + 1)
      val bs = Array.tabulate(k)(i => MinHashSig.md5Long60(s"graft-mh-b-$seed-$i") % P)
      (as, bs)
    }

    override def dataType: DataType =
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, false)
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val (as, bs) = coefs
      val mins = Array.fill(k)(Long.MaxValue)
      var j = 0
      val m = arr.numElements()
      while (j < m) {
        val hm = { val r = arr.getLong(j) % P; if (r < 0) r + P else r }
        var i = 0
        while (i < k) {
          val v = (hm * as(i) + bs(i)) % P
          if (v < mins(i)) mins(i) = v
          i += 1
        }
        j += 1
      }
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(mins)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val asRef = ctx.addReferenceObj("minhashA", coefs._1, "long[]")
      val bsRef = ctx.addReferenceObj("minhashB", coefs._2, "long[]")
      nullSafeCodeGen(ctx, ev, c => {
        val mins = ctx.freshName("mins")
        val j = ctx.freshName("j")
        val i = ctx.freshName("i")
        val hm = ctx.freshName("hm")
        val v = ctx.freshName("v")
        s"""
        long[] $mins = new long[$k];
        java.util.Arrays.fill($mins, Long.MAX_VALUE);
        for (int $j = 0; $j < $c.numElements(); $j++) {
          long $hm = $c.getLong($j) % ${P}L;
          if ($hm < 0) $hm += ${P}L;
          for (int $i = 0; $i < $k; $i++) {
            long $v = ($hm * $asRef[$i] + $bsRef[$i]) % ${P}L;
            if ($v < $mins[$i]) $mins[$i] = $v;
          }
        }
        ${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($mins);
        """
      })
    }
  }

  object MinHashSig {
    /** First 15 hex chars (60 bits) of md5(s) as a non-negative Long —
      * matches SQL `('0x' || substr(md5(s),1,15))::BIGINT`.
      */
    def md5Long60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.take(8).map("%02x".format(_)).mkString.take(15).foldLeft(0L)(
        (acc, c) => acc * 16 + Character.digit(c, 16))
    }
  }

  private val md5Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Whole-array md5Long60: ARRAY<STRING> -> ARRAY<BIGINT> in one static
    * call (thread-local digest, UTF8String bytes straight into the digest —
    * no per-element String or expression-eval overhead). Bit-identical to
    * mapping md5Long60 / `('0x'||substr(md5(s),1,15))::BIGINT`.
    */
  def md5ArrayKernel(arr: ArrayData): ArrayData = {
    val d = md5Digest.get()
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      d.reset()
      val h = d.digest(arr.getUTF8String(i).getBytes)
      var v = 0L
      var j = 0
      while (j < 8) { v = (v << 8) | (h(j) & 0xffL); j += 1 }
      out(i) = v >>> 4
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  case class Md5Array60(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    override def dataType: DataType =
      org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(c)
    override def nullSafeEval(input: Any): Any =
      md5ArrayKernel(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Vectors.md5ArrayKernel($c)")
  }

  /** Portable 60-bit md5 of every array element, fused (see md5ArrayKernel). */
  def md5Array60(a: Column): Column =
    Bridge.column(Md5Array60(Bridge.expression(a)))

  /** Nearest-centroid id: one fused loop over the broadcast centroid
    * array — bit-identical to folding [[CosineSimilarity]] with strict >
    * (first/lowest list_id wins exact ties; the array arrives sorted by
    * list_id), but without the per-element HOF interpreter that dominated
    * the 100x IVF build (500k rows x nlist lambda evals).
    */
  def bestCellKernel(v: ArrayData, cents: ArrayData): Long = {
    val m = cents.numElements()
    var best = Double.NegativeInfinity
    var bestId = 0L
    var c = 0
    while (c < m) {
      val row = cents.getStruct(c, 2)
      val cv = row.getArray(1)
      val n = math.min(v.numElements(), cv.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) {
        val xi = v.getDouble(i); val yi = cv.getDouble(i)
        dot += xi * yi; na += xi * xi; nb += yi * yi
        i += 1
      }
      val d = na * nb
      val cd = if (d > 0) dot / math.sqrt(d) else 0.0
      if (cd > best) { best = cd; bestId = row.getLong(0) }
      c += 1
    }
    bestId
  }

  case class BestCellId(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(l, r)
    override def nullSafeEval(a: Any, b: Any): Any =
      bestCellKernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.Vectors.bestCellKernel($a, $b)")
  }

  /** Nearest-centroid assignment, fused (see bestCellKernel). `cents` is
    * the (list_id, cvec) struct array sorted by list_id.
    */
  def bestCellId(v: Column, cents: Column): Column =
    Bridge.column(BestCellId(Bridge.expression(v), Bridge.expression(cents)))

  /** Top-`nprobe` cell ids for `v` — the probe-side sibling of
    * [[bestCellKernel]]: identical cosine arithmetic (the
    * CosineSimilarity loop, zero-norm → 0.0) and EXACTLY the ordering
    * of the HOF probe form `slice(array_sort(transform(cents,
    * struct(-cos, list_id))), 1, nprobe)` — cos DESC, list_id ASC on
    * ties (the array arrives sorted by list_id; strict-< insertion
    * keeps earlier entries ahead of equals) — minus the per-centroid
    * lambda interpreter and the full nlist-struct sort: one pass,
    * nlist·d flops plus ≤ nlist·nprobe slot compares. The HOF form
    * measured 38.4 s of the 100× components probe's 81 s wall
    * (200k queries × 3125 cells); the kernel prices like the
    * assignment pass (~4 s, same flop count).
    */
  def topCellsKernel(v: ArrayData, cents: ArrayData,
      nprobe: Int): ArrayData = {
    val m = cents.numElements()
    val k = math.min(nprobe, m)
    val bc = new Array[Double](k)
    val bi = new Array[Long](k)
    var filled = 0
    var c = 0
    while (c < m) {
      val row = cents.getStruct(c, 2)
      val cv = row.getArray(1)
      val n = math.min(v.numElements(), cv.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) {
        val xi = v.getDouble(i); val yi = cv.getDouble(i)
        dot += xi * yi; na += xi * xi; nb += yi * yi
        i += 1
      }
      val d = na * nb
      val cd = if (d > 0) dot / math.sqrt(d) else 0.0
      if (filled < k || cd > bc(k - 1)) {
        var pos = filled
        while (pos > 0 && bc(pos - 1) < cd) pos -= 1
        if (pos < k) {
          var j = math.min(filled, k - 1)
          while (j > pos) { bc(j) = bc(j - 1); bi(j) = bi(j - 1); j -= 1 }
          bc(pos) = cd; bi(pos) = row.getLong(0)
          if (filled < k) filled += 1
        }
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(bi, filled))
  }

  case class TopCells(left: Expression, right: Expression, nprobe: Int)
      extends BinaryExpression {
    override def dataType: DataType =
      org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(l, r, nprobe)
    override def nullSafeEval(a: Any, b: Any): Any =
      topCellsKernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
        nprobe)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.Vectors.topCellsKernel($a, $b, $nprobe)")
  }

  /** Top-nprobe probe cells, fused (see topCellsKernel). */
  def topCells(v: Column, cents: Column, nprobe: Int): Column =
    Bridge.column(TopCells(Bridge.expression(v), Bridge.expression(cents),
      nprobe))

  /** Top-k scored entries of ONE inverted-list cell for query `qv` —
    * the scoring sibling of [[topCellsKernel]]: `block` is the cell's
    * (neighbor_id, cv) struct array, the output the k smallest
    * `(neg = -cos, neighbor_id)` structs in ascending struct order —
    * EXACTLY the per-candidate rows the row-form scoring join fed to
    * the bounded bottom-k aggregator, pre-reduced inside the cell.
    * Identical cosine arithmetic (the CosineSimilarity loop, zero-norm
    * → 0.0) and the self pair (`neighbor_id == selfId`) excluded, so
    * merging the per-cell lists through the same aggregator yields the
    * SAME global top-k bit-for-bit: k-smallest of a union is the
    * k-smallest of the per-part k-smallests, and (neg, id) is a total
    * order (ids unique). What it saves is the row machinery — one
    * materialized candidate row per (query, cell VECTOR) becomes one
    * per (query, cell, top-k entry): the 100× components build
    * measured 26.5 s in the row-form scoring chain for 38.4M candidate
    * rows of ~1 KB (two 64-dim arrays each).
    */
  def cellTopKKernel(qv: ArrayData, block: ArrayData, selfId: Long,
      k: Int): ArrayData = {
    val m = block.numElements()
    val kk = math.min(k, m)
    val bn = new Array[Double](math.max(kk, 1))
    val bi = new Array[Long](math.max(kk, 1))
    var filled = 0
    var c = 0
    while (c < m) {
      val row = block.getStruct(c, 2)
      val nid = row.getLong(0)
      if (nid != selfId) {
        val cv = row.getArray(1)
        val n = math.min(qv.numElements(), cv.numElements())
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < n) {
          val xi = qv.getDouble(i); val yi = cv.getDouble(i)
          dot += xi * yi; na += xi * xi; nb += yi * yi
          i += 1
        }
        val d = na * nb
        val neg = -(if (d > 0) dot / math.sqrt(d) else 0.0)
        if (filled < kk || neg < bn(filled - 1) ||
            (neg == bn(filled - 1) && nid < bi(filled - 1))) {
          var pos = filled
          while (pos > 0 && (neg < bn(pos - 1) ||
              (neg == bn(pos - 1) && nid < bi(pos - 1)))) pos -= 1
          if (pos < kk) {
            var j = math.min(filled, kk - 1)
            while (j > pos) { bn(j) = bn(j - 1); bi(j) = bi(j - 1); j -= 1 }
            bn(pos) = neg; bi(pos) = nid
            if (filled < kk) filled += 1
          }
        }
      }
      c += 1
    }
    val out = new Array[Any](filled)
    var i = 0
    while (i < filled) {
      out(i) = org.apache.spark.sql.catalyst.InternalRow(bn(i), bi(i))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  case class CellTopK(first: Expression, second: Expression,
      third: Expression, k: Int)
      extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
    override def dataType: DataType =
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("neg", DoubleType,
            nullable = false),
          org.apache.spark.sql.types.StructField("neighbor_id", LongType,
            nullable = false))), containsNull = false)
    override protected def withNewChildrenInternal(
        a: Expression, b: Expression, c: Expression): Expression =
      copy(a, b, c, k)
    override def nullSafeEval(a: Any, b: Any, c: Any): Any =
      cellTopKKernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
        c.asInstanceOf[Long], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b, c) =>
        s"graft.functions.Vectors.cellTopKKernel($a, $b, $c, $k)")
  }

  /** Per-cell top-k scoring, fused (see cellTopKKernel). */
  def cellTopK(qv: Column, block: Column, selfId: Column, k: Int): Column =
    Bridge.column(CellTopK(Bridge.expression(qv), Bridge.expression(block),
      Bridge.expression(selfId), k))

  def minhashSignature(hashes: Column, k: Int, seed: Long = 42L): Column =
    Bridge.column(MinHashSig(Bridge.expression(hashes), k, seed))

  /** Jaccard similarity of two DISTINCT-element arrays: one hash-set build
    * + one probe pass, vs array_intersect + array_union (two interpreted
    * set constructions each). Inputs must be duplicate-free (shingles are
    * array_distinct'd); |A∪B| = |A|+|B|−|A∩B|.
    */
  case class JaccardSim(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(l, r)

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val na = x.numElements(); val nb = y.numElements()
      if (na == 0 && nb == 0) return 0.0
      val set = new java.util.HashSet[Any](na * 2)
      var i = 0
      while (i < na) { set.add(x.getUTF8String(i)); i += 1 }
      var inter = 0; var j = 0
      while (j < nb) { if (set.contains(y.getUTF8String(j))) inter += 1; j += 1 }
      val union = na + nb - inter
      if (union == 0) 0.0 else inter.toDouble / union
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val set = ctx.freshName("set")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val inter = ctx.freshName("inter")
        val union = ctx.freshName("union")
        s"""
        int ${i}n = $a.numElements(); int ${j}n = $b.numElements();
        java.util.HashSet $set = new java.util.HashSet(${i}n * 2);
        for (int $i = 0; $i < ${i}n; $i++) { $set.add($a.getUTF8String($i)); }
        int $inter = 0;
        for (int $j = 0; $j < ${j}n; $j++) {
          if ($set.contains($b.getUTF8String($j))) $inter++;
        }
        int $union = ${i}n + ${j}n - $inter;
        ${ev.value} = ($union == 0) ? 0.0 : ((double) $inter) / $union;
        """
      })
  }

  def jaccard(a: Column, b: Column): Column =
    Bridge.column(JaccardSim(Bridge.expression(a), Bridge.expression(b)))

  /** Banded Levenshtein distance over STRING inputs: cells farther than
    * `band` off the diagonal are never computed, so cost is O(n·band)
    * instead of O(n·m) — the closest-match prefilter for Q2-style partial
    * matching at scale. Returns the exact distance when it is ≤ band,
    * otherwise band+1 (a "too far" clamp — callers threshold, never rank
    * beyond the band).
    */
  case class BandedLevenshtein(left: Expression, right: Expression, band: Int)
      extends BinaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.IntegerType
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(l, r)

    override def nullSafeEval(a: Any, b: Any): Any = {
      val s = a.toString; val t = b.toString
      Vectors.bandedLevenshtein(s, t, band)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"""${ev.value} = graft.functions.Vectors.bandedLevenshtein(
              $a.toString(), $b.toString(), $band);""")
  }

  /** The banded DP kernel (shared by interpreted and generated paths). */
  def bandedLevenshtein(s: String, t: String, band: Int): Int = {
    val n = s.length; val m = t.length
    if (math.abs(n - m) > band) return band + 1
    val INF = band + 1
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    java.util.Arrays.fill(prev, INF)
    var j = 0
    while (j <= math.min(m, band)) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= n) {
      java.util.Arrays.fill(cur, INF)
      val lo = math.max(1, i - band); val hi = math.min(m, i + band)
      if (lo == 1) cur(0) = if (i <= band) i else INF
      var k = lo
      while (k <= hi) {
        val sub = prev(k - 1) + (if (s.charAt(i - 1) == t.charAt(k - 1)) 0 else 1)
        val del = if (prev(k) < INF) prev(k) + 1 else INF
        val ins = if (cur(k - 1) < INF) cur(k - 1) + 1 else INF
        cur(k) = math.min(sub, math.min(del, ins))
        if (cur(k) > INF) cur(k) = INF
        k += 1
      }
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    math.min(prev(m), INF)
  }

  def bandedLevenshtein(a: Column, b: Column, band: Int): Column =
    Bridge.column(BandedLevenshtein(Bridge.expression(a), Bridge.expression(b), band))
}
