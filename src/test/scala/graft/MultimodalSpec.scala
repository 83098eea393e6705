package graft

import graft.pipeline.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq((1L, "hello"), (2L, ""), (3L, "wörld"))
    .toDF("doc_id", "text")

  test("syntheticMedia: binary column + typed metadata struct") {
    val m = Multimodal.syntheticMedia(docs, "doc_id", "text")
    assert(m.schema("media").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val metaFields = m.schema("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fields.map(f => (f.name, f.dataType)).toSeq
    assert(metaFields ==
      Multimodal.metaType.fields.map(f => (f.name, f.dataType)).toSeq)
    val meta = m.filter(col("doc_id") === 1)
      .select("meta.format", "meta.duration_ms").collect().head
    assert(meta.getString(0) == "fake/raw" && meta.getLong(1) == 50L)
  }

  test("decodeFeatures: mapPartitions output matches driver-side decoder") {
    val m = Multimodal.syntheticMedia(docs, "doc_id", "text")
    val out = Multimodal.decodeFeatures(m, "doc_id")
      .select("doc_id", "n_bytes", "feature")
      .as[(Long, Long, Seq[Float])].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    val expect1 = Multimodal.StubDecoder.decode("hello".getBytes("UTF-8"), null).toSeq
    assert(out(1L) == ((5L, expect1)))
    assert(out(2L)._1 == 0L)
    assert(out(3L)._1 == 6L) // ö is 2 bytes in UTF-8
  }

  test("decodeFeatures preserves partitioning (no shuffle of media bytes)") {
    val m = Multimodal.syntheticMedia(docs, "doc_id", "text").repartition(3)
    val out = Multimodal.decodeFeatures(m, "doc_id")
    assert(out.rdd.getNumPartitions == 3)
  }

  test("resize: thumbnail bytes within budget, metadata updated") {
    val m = Multimodal.syntheticMedia(
      Seq((1L, "x" * 5000), (2L, "y")).toDF("doc_id", "text"), "doc_id", "text")
    val out = Multimodal.resize(m, "doc_id", 256, 256)
    val got = out.select(col("doc_id"), length(col("media")).as("n"),
        col("meta.format"), col("meta.width"))
      .as[(Long, Int, String, Int)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(got(1L) == ((256 * 256 / 64, "fake/thumb", 256)))
    assert(got(2L)._1 == 1) // tiny input stays tiny
  }

  test("tile: 2D patch gather recovers exact byte blocks, partial rows dropped") {
    // 70 bytes at rowBytes=16, tileW=8, tileH=2: ny = floor(70/16/2) = 2,
    // nx = 2 → 4 tiles over the first 64 bytes; the 6-byte tail is dropped
    val bytes = (0 until 70).map(i => ('A' + i % 26).toChar).mkString
    val m = Multimodal.syntheticMedia(
      Seq((1L, bytes)).toDF("doc_id", "text"), "doc_id", "text")
    val got = Multimodal.tile(m, "doc_id", rowBytes = 16, tileW = 8, tileH = 2)
      .select(col("tile_x"), col("tile_y"), col("tile").cast("string"))
      .as[(Int, Int, String)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(got.size == 4)
    def row(r: Int) = bytes.slice(r * 16, r * 16 + 16)
    // tile (x, y) = rows (2y, 2y+1), byte columns [8x, 8x+8)
    for (ty <- 0 to 1; tx <- 0 to 1) {
      val want = row(ty * 2).slice(tx * 8, tx * 8 + 8) +
        row(ty * 2 + 1).slice(tx * 8, tx * 8 + 8)
      assert(got((tx, ty)) == want, s"tile ($tx,$ty)")
    }
  }

  test("frameSample: bounded one-to-many explode") {
    val m = Multimodal.syntheticMedia(
      Seq((1L, "x" * 300), (2L, "y")).toDF("doc_id", "text"), "doc_id", "text")
    val frames = Multimodal.frameSample(m, "doc_id", stride = 64, maxFrames = 4)
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(frames(1L) == 4L) // 300/64 = 4 (capped)
    assert(frames(2L) == 1L) // minimum one frame
  }

  test("phash: near-identical media collide, unrelated media do not; " +
      "banded pairs == brute-force hamming filter (pigeonhole exactness)") {
    val base = ("the quick brown fox jumps over the lazy dog " * 12).trim
    val docs = Seq(
      (1L, base),
      (2L, base.replace("lazy", "hazy")),            // one block perturbed
      (3L, "completely different content about spark shuffles and " +
        "catalyst optimizer rules and parquet row groups and codegen " +
        "stages repeated enough to fill several blocks of bytes here"),
      (4L, base),                                     // exact copy of 1
      (5L, ""),                                       // empty media -> no sig
      (6L, "")).toDF("doc_id", "text")                // second empty doc
    val media = Multimodal.syntheticMedia(docs, "doc_id", "text")
    val pairs = Multimodal.phashNearDupPairs(media, "doc_id", maxHamming = 3)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L)), "exact copies must pair at hamming 0")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "unrelated media must not pair")
    // zero-length media has no content to be perceptually similar TO:
    // two empty docs share the empty-block signature but must NOT pair
    // (ADVICE r12 — the oracle's sim CTE has no row for blockless docs)
    assert(!pairs.exists(p => p._1 >= 5L || p._2 >= 5L),
      "empty media must not participate in near-dup pairing")
    // brute-force ground truth over NON-EMPTY media: banding must be
    // EXACT for hamming <= 3
    val sigs = media.filter(length(col("media")) > 0)
      .select(col("doc_id"), Multimodal.phash60(col("media")).as("ph"))
      .as[(Long, Long)].collect()
    val brute = (for {
      (a, pa) <- sigs; (b, pb) <- sigs if a < b
      if java.lang.Long.bitCount(pa ^ pb) <= 3
    } yield (a, b)).toSet
    assert(pairs == brute, "banded candidates must equal the brute filter")
  }

  test("DCT phash: brightness and small local perturbations keep rasters " +
      "within hamming 3; distinct rasters stay far; banding is exact") {
    val ids = Seq((1L, 1L), (2L, 2L)).toDF("doc_id", "seed")
    val base = Multimodal.syntheticRaster(ids, "doc_id", "seed",
      64, 64, brightness = 0)
    val baseBytes = base.filter(col("doc_id") === 1L)
      .select("media").as[Array[Byte]].head()
    // brightness twin: every pixel +3 (id 11, same content seed)
    val bright = Multimodal.syntheticRaster(
      Seq((11L, 1L)).toDF("doc_id", "seed"), "doc_id", "seed",
      64, 64, brightness = 3)
    // local twin: a dozen scattered pixels nudged by +/-2 (id 12)
    val local = baseBytes.clone()
    (0 until 12).foreach { k =>
      val p = k * 337 % local.length
      local(p) = (((local(p) & 0xff) + (if (k % 2 == 0) 2 else -2))
        .max(0).min(255)).toByte
    }
    val corpus = base.unionByName(bright)
      .unionByName(Seq((12L, local)).toDF("doc_id", "media"))
    val sigs = Multimodal.phashDct(corpus, "doc_id", rowBytes = 64)
      .as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) =
      java.lang.Long.bitCount(sigs(a) ^ sigs(b))
    assert(ham(1L, 11L) <= 3,
      s"brightness shift must stay near-identical (hamming ${ham(1L, 11L)})")
    assert(ham(1L, 12L) <= 3,
      s"local perturbation must stay near-identical (hamming ${ham(1L, 12L)})")
    assert(ham(1L, 2L) > 10,
      s"distinct rasters must stay far apart (hamming ${ham(1L, 2L)})")
    // the banded join finds exactly the brute-force hamming-<=3 pairs
    val pairs = Multimodal.phashDctPairs(corpus, "doc_id", rowBytes = 64)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val brute = (for {
      (a, pa) <- sigs.toSeq; (b, pb) <- sigs.toSeq if a < b
      if java.lang.Long.bitCount(pa ^ pb) <= 3
    } yield (a, b)).toSet
    assert(pairs == brute, "banded DCT pairs must equal the brute filter")
    assert(pairs.contains((1L, 11L)) && pairs.contains((1L, 12L)))
  }

  test("DCT phash: non-32-multiple geometry (boundary grid) keeps the " +
      "perceptual property") {
    // 48 wide x 40 tall: block boundaries (bi*40)/32, (bj*48)/32 are
    // uneven (1- and 2-pixel blocks mixed) — the integer grid must stay
    // well-defined and the robustness property must survive it
    val rnd = new scala.util.Random(11)
    val base = Array.fill[Byte](48 * 40)((rnd.nextInt(120)).toByte)
    val bright = base.map(b => ((b & 0xff) + 4).toByte)
    val other = Array.fill[Byte](48 * 40)((rnd.nextInt(120)).toByte)
    val corpus = Seq((1L, base), (2L, bright), (3L, other))
      .toDF("doc_id", "media")
    val sigs = Multimodal.phashDct(corpus, "doc_id", rowBytes = 48)
      .as[(Long, Long)].collect().toMap
    assert(sigs.size == 3)
    val near = java.lang.Long.bitCount(sigs(1L) ^ sigs(2L))
    val far = java.lang.Long.bitCount(sigs(1L) ^ sigs(3L))
    assert(near <= 3, s"brightness twin must stay near (hamming $near)")
    assert(far > 10, s"distinct raster must stay far (hamming $far)")
  }

  test("DCT phash: rasters smaller than 32x32 drop (no signature), and " +
      "the kernel is deterministic across invocations") {
    val tiny = Seq((1L, Array.fill[Byte](64 * 16)(7))) // 64 wide, 16 tall
      .toDF("doc_id", "media")
    assert(Multimodal.phashDct(tiny, "doc_id", rowBytes = 64).count() == 0)
    val ids = Seq((5L, 5L)).toDF("doc_id", "seed")
    val m = Multimodal.syntheticRaster(ids, "doc_id", "seed", 64, 64, 0)
    val s1 = Multimodal.phashDct(m, "doc_id", 64).as[(Long, Long)].head()
    val s2 = Multimodal.phashDct(m, "doc_id", 64).as[(Long, Long)].head()
    assert(s1 == s2)
  }

  test("netpbm: P5 roundtrips exactly at 8 and 16 bits (big-endian), " +
      "P6 reduces to the exact BT.601 integer luma") {
    val px8 = Array.tabulate(12)(i => (i * 37) % 256)
    val r8 = Multimodal.decodeNetpbm(Multimodal.encodePgm(4, 3, 255, px8))
    assert(r8.contains(Multimodal.Raster(4, 3, 255, px8)) ||
      (r8.get.width == 4 && r8.get.height == 3 && r8.get.maxval == 255 &&
        r8.get.pixels.toSeq == px8.toSeq))
    // 16-bit: values above 255 must survive the 2-byte big-endian path
    val px16 = Array.tabulate(6)(i => 300 + i * 1000)
    val r16 = Multimodal.decodeNetpbm(Multimodal.encodePgm(3, 2, 65535, px16))
    assert(r16.get.pixels.toSeq == px16.toSeq && r16.get.maxval == 65535)
    // P6 luma: pure colors hit the exact fixed-point weights
    val rgb = Array(255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255)
    val rp = Multimodal.decodeNetpbm(Multimodal.encodePpm(2, 2, rgb))
    assert(rp.get.pixels.toSeq == Seq(255 * 299 / 1000, 255 * 587 / 1000,
      255 * 114 / 1000, 255))
  }

  test("netpbm parser robustness: comments and varied whitespace parse, " +
      "malformed headers and truncated rasters return None") {
    val px = Array.tabulate(4)(i => i * 60)
    val body = px.map(_.toByte)
    def parse(header: String) =
      Multimodal.decodeNetpbm(header.getBytes("US-ASCII") ++ body)
    // comments between ANY header tokens, tabs/CRLF as separators
    val ok = parse("P5 # c1\n\t2 # c2\n 2\r\n# c3\n255\n")
    assert(ok.get.pixels.toSeq == px.toSeq)
    assert(parse("P4 2 2 255\n").isEmpty, "wrong magic must fail")
    assert(parse("P5 2 2 0\n").isEmpty, "maxval 0 must fail")
    assert(parse("P5 2 2 70000\n").isEmpty, "maxval > 65535 must fail")
    assert(parse("P5 2 x 255\n").isEmpty, "non-numeric height must fail")
    assert(parse("P5 2 2\n").isEmpty, "header cut before maxval must fail")
    // truncated raster: header promises 4 bytes, only 3 present
    assert(Multimodal.decodeNetpbm(
      "P5 2 2 255\n".getBytes("US-ASCII") ++ body.take(3)).isEmpty,
      "short raster must fail, not produce a phantom image")
    // 16-bit truncation: enough bytes for 8-bit but not for 2-byte
    assert(Multimodal.decodeNetpbm(
      "P5 2 2 4095\n".getBytes("US-ASCII") ++ body).isEmpty)
    assert(Multimodal.decodeNetpbm(Array.empty[Byte]).isEmpty)
  }

  test("netpbm chains into the DCT pHash: a raster shipped as a PGM file " +
      "decodes to the identical signature as the raw raster") {
    val ids = Seq((7L, 7L)).toDF("doc_id", "seed")
    val raw = Multimodal.syntheticRaster(ids, "doc_id", "seed", 64, 64, 0)
      .select("media").as[Array[Byte]].head()
    val sigRaw = Multimodal.dctSig(raw, 64)
    assert(sigRaw.nonEmpty)
    // encode the raster as a real PGM file, decode with the real parser,
    // and hash the DECODED samples — the full decode→feature chain
    val pgm = Multimodal.encodePgm(64, 64, 255, raw.map(_ & 0xff))
    val decoded = Multimodal.decodeNetpbm(pgm).get
    assert(decoded.width == 64 && decoded.height == 64)
    val sigDecoded = Multimodal.dctSig(
      decoded.pixels.map(_.toByte), decoded.width)
    assert(sigDecoded == sigRaw,
      "the PGM roundtrip must not change a single signature bit")
  }

  test("png: each of the five scanline filters reconstructs exactly, " +
      "grayscale and truecolor") {
    // 6 rows so filter types 0..4 each appear on at least one row (the
    // encoder filters row r as type r % 5), including Paeth with a real
    // up-left neighborhood
    val w = 7; val h = 6
    val gray = Array.tabulate(w * h)(i => (i * 53 + i * i) % 256)
    val g = Multimodal.decodePng(Multimodal.encodePng(w, h, 1, gray))
    assert(g.get.width == w && g.get.height == h && g.get.maxval == 255)
    assert(g.get.pixels.toSeq == gray.toSeq,
      "every filter type must invert to the exact samples")
    // single-row/single-column edges: the filters' a/b/c fall back to 0
    val one = Array.tabulate(5)(i => 250 - i * 49)
    assert(Multimodal.decodePng(Multimodal.encodePng(5, 1, 1, one))
      .get.pixels.toSeq == one.toSeq)
    assert(Multimodal.decodePng(Multimodal.encodePng(1, 5, 1, one))
      .get.pixels.toSeq == one.toSeq)
    // truecolor reduces to the same BT.601 integer luma as P6
    val rgb = Array(255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255)
    val c = Multimodal.decodePng(Multimodal.encodePng(2, 2, 3, rgb))
    assert(c.get.pixels.toSeq == Seq(255 * 299 / 1000, 255 * 587 / 1000,
      255 * 114 / 1000, 255))
  }

  test("png robustness: bad signature / bad CRC / truncated IDAT / " +
      "unsupported shapes all return None, ancillary chunks skip") {
    val px = Array.tabulate(16)(i => i * 16)
    val good = Multimodal.encodePng(4, 4, 1, px)
    assert(Multimodal.decodePng(good).get.pixels.toSeq == px.toSeq)
    // bad signature
    val badSig = good.clone(); badSig(0) = 0
    assert(Multimodal.decodePng(badSig).isEmpty)
    // bad CRC: flip a bit inside the IDAT payload (not its length/tag)
    val idatAt = {
      var i = 8; var found = -1
      while (found < 0) {
        val len = ((good(i) & 0xff) << 24) | ((good(i + 1) & 0xff) << 16) |
          ((good(i + 2) & 0xff) << 8) | (good(i + 3) & 0xff)
        if (new String(good, i + 4, 4, "US-ASCII") == "IDAT") found = i
        else i += 12 + len
      }
      found
    }
    val badCrc = good.clone()
    badCrc(idatAt + 8) = (badCrc(idatAt + 8) ^ 0x40).toByte
    assert(Multimodal.decodePng(badCrc).isEmpty,
      "a corrupted chunk must fail its CRC, never decode")
    // truncated IDAT: a VALID zlib stream that inflates short — rebuild
    // the file with half the raw scanline bytes deflated
    val deflater = new java.util.zip.Deflater()
    val short0 = new Array[Byte](8) // 8 < 4 rows x (1 + 4) bytes
    deflater.setInput(short0); deflater.finish()
    val buf = new Array[Byte](64)
    val bos = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) bos.write(buf, 0, deflater.deflate(buf))
    val crc = new java.util.zip.CRC32()
    crc.update("IDAT".getBytes("US-ASCII")); crc.update(bos.toByteArray)
    def be(v: Long) = Array((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    val truncated = good.take(idatAt) ++
      be(bos.size().toLong) ++ "IDAT".getBytes("US-ASCII") ++
      bos.toByteArray ++ be(crc.getValue) ++
      good.drop(idatAt + 12 + {
        ((good(idatAt) & 0xff) << 24) | ((good(idatAt + 1) & 0xff) << 16) |
          ((good(idatAt + 2) & 0xff) << 8) | (good(idatAt + 3) & 0xff)
      })
    assert(Multimodal.decodePng(truncated).isEmpty,
      "an IDAT stream shorter than the raster must fail, not phantom")
    // file cut mid-chunk
    assert(Multimodal.decodePng(good.take(good.length - 6)).isEmpty)
    assert(Multimodal.decodePng(Array.empty[Byte]).isEmpty)
    // ancillary chunk between IHDR and IDAT is skipped (CRC verified)
    val ihdrEnd = 8 + 12 + 13
    val anc = {
      val tag = "tEXt".getBytes("US-ASCII")
      val data = "graft".getBytes("US-ASCII")
      val c2 = new java.util.zip.CRC32(); c2.update(tag); c2.update(data)
      be(data.length.toLong) ++ tag ++ data ++ be(c2.getValue)
    }
    val withAnc = good.take(ihdrEnd) ++ anc ++ good.drop(ihdrEnd)
    assert(Multimodal.decodePng(withAnc).get.pixels.toSeq == px.toSeq)
  }

  test("png chains into the DCT pHash: a raster shipped as a PNG file " +
      "decodes to the identical signature as the raw raster") {
    val ids = Seq((11L, 11L)).toDF("doc_id", "seed")
    val raw = Multimodal.syntheticRaster(ids, "doc_id", "seed", 64, 64, 0)
      .select("media").as[Array[Byte]].head()
    val sigRaw = Multimodal.dctSig(raw, 64)
    assert(sigRaw.nonEmpty)
    val png = Multimodal.encodePng(64, 64, 1, raw.map(_ & 0xff))
    val decoded = Multimodal.decodePng(png).get
    assert(decoded.width == 64 && decoded.height == 64)
    val sigDecoded = Multimodal.dctSig(
      decoded.pixels.map(_.toByte), decoded.width)
    assert(sigDecoded == sigRaw,
      "the PNG roundtrip must not change a single signature bit")
  }
}
