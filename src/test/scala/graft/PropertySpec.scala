package graft

import graft.functions.{Bio, NStats, Vectors}
import graft.operators.Clustering
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks of the pure kernels (scalacheck driven directly —
  * no scalatest bridge needed). These are the functions whose codegen'd
  * expression forms run per row at scale, so the scalar semantics must hold
  * on arbitrary inputs, not just the golden cases.
  */
class PropertySpec extends AnyFunSuite {

  private def check(name: String, p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, s"$name: $r")
  }

  private val dnaGen: Gen[String] =
    Gen.listOf(Gen.oneOf('A', 'C', 'G', 'T')).map(_.mkString)

  test("DCT phash kernel: deterministic, exactly contrast-scale-invariant, " +
      "brightness shifts flip at most a few bits") {
    // rasters derive from a seed, not a 4096-element container Gen —
    // scalacheck's big-array generation/shrinking machinery measures in
    // minutes per property at this width, a Long shrinks instantly
    def raster(seed: Long): Array[Byte] = {
      val rnd = new scala.util.Random(seed)
      Array.fill[Byte](64 * 64)(rnd.nextInt(61).toByte)
    }
    check("dct-deterministic", Prop.forAll(Gen.long) { seed =>
      val r = raster(seed)
      graft.pipeline.Multimodal.dctSig(r, 64) ==
        graft.pipeline.Multimodal.dctSig(r.clone(), 64)
    })
    // doubling every pixel doubles every integer coefficient AND the
    // median exactly, so the sign pattern — the signature — is invariant:
    // the hash keys on structure, not contrast. Block-CONSTANT rasters
    // make the downsample exact (a floor mean of mixed pixels does not
    // scale linearly — floor(2s/4) != 2*floor(s/4) — so on arbitrary
    // rasters contrast invariance is only near-exact); pixel budget
    // 0..60 keeps the doubled raster in byte range.
    check("dct-contrast-invariant", Prop.forAll(Gen.long) { seed =>
      val rnd = new scala.util.Random(seed)
      val v = Array.fill(32, 32)(rnd.nextInt(61))
      val r = Array.tabulate(64 * 64)(p =>
        v((p / 64) / 2)((p % 64) / 2).toByte)
      graft.pipeline.Multimodal.dctSig(r.map(b => (b * 2).toByte), 64) ==
        graft.pipeline.Multimodal.dctSig(r, 64)
    })
    // a uniform brightness shift only reaches the AC coefficients
    // through the basis rounding residue (each u>0 basis row sums to
    // ~0 ± 16 in 1e6 fixed point), so bits flip only where a
    // coefficient sits within that sliver of the median — at most a
    // few of 60 on any input
    check("dct-brightness-robust", Prop.forAll(Gen.long,
        Gen.choose(1, 7)) { (seed, b) =>
      val r = raster(seed)
      val shifted = r.map(x => (x + b).toByte)
      val h = java.lang.Long.bitCount(
        graft.pipeline.Multimodal.dctSig(r, 64).get ^
          graft.pipeline.Multimodal.dctSig(shifted, 64).get)
      h <= 8
    })
  }

  test("reverse complement is an involution and length-preserving") {
    check("revcomp", Prop.forAll(dnaGen) { s =>
      val rc = Bio.reverseComplementString(s)
      rc.length == s.length && Bio.reverseComplementString(rc) == s
    })
  }

  test("translate output length is always len/3") {
    check("translate", Prop.forAll(dnaGen) { s =>
      Bio.translateString(s).length == s.length / 3
    })
  }

  test("banded Levenshtein equals the classic DP within the band") {
    val short = Gen.listOfN(12, Gen.oneOf('A', 'C', 'G', 'T')).map(_.mkString)
    def classic(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    check("banded", Prop.forAll(short, short) { (a, b) =>
      val band = math.max(a.length, b.length) // band wide enough => exact
      Vectors.bandedLevenshtein(a, b, band) == classic(a, b)
    })
  }

  test("banded Levenshtein is symmetric and bounded by max length") {
    val g = Gen.listOfN(10, Gen.oneOf('A', 'C', 'G', 'T')).map(_.mkString)
    check("banded-sym", Prop.forAll(g, g) { (a, b) =>
      val d = Vectors.bandedLevenshtein(a, b, 10)
      d == Vectors.bandedLevenshtein(b, a, 10) && d <= math.max(a.length, b.length)
    })
  }

  test("NStats invariants: permutation-invariant, N90 <= N50 <= max, L50 <= L90") {
    val lens = Gen.nonEmptyListOf(Gen.chooseNum(0L, 10000L))
    check("nstats", Prop.forAll(lens) { ls =>
      val r = NStats.compute(ls)
      val shuffled = NStats.compute(scala.util.Random.shuffle(ls))
      r == shuffled &&
        r.contigs == ls.length && r.totalLength == ls.sum &&
        r.n90 <= r.n50 && r.n50 <= ls.max &&
        r.l50 <= r.l90 && r.l90 <= ls.length
    })
  }

  test("identityPct is symmetric and within [0,100]") {
    val prof = Gen.listOfN(7, Gen.oneOf("1", "2", "3", "0", "N"))
    check("identity", Prop.forAll(prof, prof) { (a, b) =>
      val x = Clustering.identityPct(a, b)
      x == Clustering.identityPct(b, a) && x >= 0.0 && x <= 100.0
    })
  }

  test("md5Long60 stays within 60 bits and is deterministic") {
    check("md5long", Prop.forAll(Gen.alphaNumStr) { s =>
      val v = Vectors.MinHashSig.md5Long60(s)
      v >= 0L && v < (1L << 60) && v == Vectors.MinHashSig.md5Long60(s)
    })
  }

  test("kmerCandidates kernel equals the naive contains sweep") {
    import org.apache.spark.unsafe.types.UTF8String
    val k = 4
    val word = Gen.listOfN(k, Gen.oneOf('A', 'C', 'G', 'T')).map(_.mkString)
    val dict = Gen.listOfN(12, word).map(_.distinct.sorted.toArray)
    check("kmer", Prop.forAll(dnaGen, dict) { (hay, seeds0) =>
      val seeds = if (seeds0.isEmpty) Array("ACGT") else seeds0
      val idx = graft.functions.SeedIndex.build(k, seeds)
      val got = Bio.kmerCandidatesKernel(UTF8String.fromString(hay), idx)
        .toIntArray().toSeq
      val want = seeds.indices.filter(i => hay.contains(seeds(i)))
      got == want
    })
  }

  test("SquaredL2 kernel equals the sequential fold, symmetric, 0 iff equal") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.catalyst.expressions.Literal
    val vec = Gen.listOfN(16, Gen.chooseNum(-100.0, 100.0))
    def eval(a: Seq[Double], b: Seq[Double]): Double =
      Vectors.SquaredL2(Literal(1), Literal(1)) // children unused by eval
        .nullSafeEval(new GenericArrayData(a.toArray),
          new GenericArrayData(b.toArray)).asInstanceOf[Double]
    check("l2sq", Prop.forAll(vec, vec) { (a, b) =>
      // identical sequential fold order — bit-exact, not approximate
      var s = 0.0
      a.indices.foreach { i => val d = a(i) - b(i); s += d * d }
      eval(a, b) == s && eval(a, b) == eval(b, a) &&
        eval(a, a) == 0.0 && (eval(a, b) >= 0.0)
    })
  }

  test("prefix zone interval is sound under Spark's binary string " +
      "order: P-prefixed strings land in [P, succ(P)), others outside " +
      "iff they share no prefix") {
    import org.apache.spark.unsafe.types.UTF8String
    def cmp(a: String, b: String): Int =
      UTF8String.fromString(a).compareTo(UTF8String.fromString(b))
    // arbitrary UNICODE payloads (astral chars included — the case a
    // closed P+'￿' bound gets wrong) against ASCII prefixes, the
    // only prefixes the compiler lets prune
    val uni = Gen.listOf(Gen.oneOf(
      Gen.choose(32, 126).map(_.toChar.toString),
      Gen.oneOf("é", "Ж", "中", new String(Character.toChars(0x1F600)),
        new String(Character.toChars(0x10FFFF)), "￿")))
      .map(_.mkString)
    val asciiPrefix = Gen.nonEmptyListOf(
      Gen.choose(32, 125).map(_.toChar)).map(_.mkString)
    check("prefix-interval", Prop.forAll(uni, asciiPrefix) { (s, p0) =>
      val p = p0.toUpperCase
      // non-ASCII upper forms are outside the compiler's gate
      !p.forall(c => c < 0x7f) || {
        val succ = p.init + (p.last + 1).toChar
        val u = s.toUpperCase
        // soundness is one-directional (pruning keeps a superset):
        // every P-prefixed value MUST land inside [P, succ(P))
        !u.startsWith(p) || (cmp(u, p) >= 0 && cmp(u, succ) < 0)
      }
    })
  }

  test("netpbm roundtrip: arbitrary geometry/maxval/pixels survive " +
      "encode->decode exactly; truncation always fails") {
    val gen = for {
      seed <- Gen.long
      w <- Gen.choose(1, 40)
      h <- Gen.choose(1, 40)
      mv <- Gen.oneOf(Gen.choose(1, 255), Gen.choose(256, 65535))
    } yield (seed, w, h, mv)
    check("pgm-roundtrip", Prop.forAll(gen) { case (seed, w, h, mv) =>
      val rnd = new scala.util.Random(seed)
      val px = Array.fill(w * h)(rnd.nextInt(mv + 1))
      val bytes = graft.pipeline.Multimodal.encodePgm(w, h, mv, px)
      val r = graft.pipeline.Multimodal.decodeNetpbm(bytes)
      r.exists(d => d.width == w && d.height == h && d.maxval == mv &&
        d.pixels.toSeq == px.toSeq) &&
        // any strict prefix of the raster must fail, never misparse
        graft.pipeline.Multimodal.decodeNetpbm(
          bytes.dropRight(1 + rnd.nextInt(math.min(8, w * h)))).isEmpty
    })
  }

  test("rolling seed hash matches the direct hash at every offset") {
    val gen = for {
      s <- dnaGen.suchThat(_.length >= 5)
      k <- Gen.choose(1, math.min(8, s.length))
    } yield (s, k)
    check("rollhash", Prop.forAll(gen) { case (s, k) =>
      val B = 1000003L
      var bk = 1L; (1 to k).foreach(_ => bk *= B)
      var h = graft.functions.SeedIndex.hashOf(s, 0, k)
      (0 until s.length - k).forall { i =>
        h = h * B + s.charAt(i + k) - bk * s.charAt(i)
        h == graft.functions.SeedIndex.hashOf(s, i + 1, k)
      }
    })
  }
}
