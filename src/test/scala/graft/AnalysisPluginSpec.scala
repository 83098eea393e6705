package graft

import graft.queries.AllQueries

/** Differential specs for the round-6 analysis/export widening: each query
  * is recomputed with straight Scala loops over the collected base tables
  * (an in-process second implementation, independent of the Spark plan) and
  * compared exactly.
  */
class AnalysisPluginSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = AllQueries.queries(name)(spark, dir)

  test("seqbin_breakdown matches a hand rollup of lineitem") {
    val li = Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_quantity", "l_linenumber", "l_linestatus")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1).toLong, r.getInt(2),
        r.getString(3)))
    val expected = li.groupBy(_._1).map { case (id, rows) =>
      val q = rows.map(_._2)
      val n = q.length
      val sum = q.sum
      val sumsq = q.map(x => x * x).sum
      val mean = math.floor(sum.toDouble / n + 0.5).toLong
      val sd = if (n > 1)
        Some(math.floor(math.sqrt(
          (n * sumsq - sum * sum).toDouble / (n.toLong * (n - 1))) + 0.5).toLong)
      else None
      val nDes = rows.map(_._3).distinct.length
      val nTag = rows.filter(_._4 == "F").map(_._3).distinct.length
      id -> ((n.toLong, sum, q.min, q.max, mean, sd, nDes.toLong, nTag.toLong))
    }
    val got = run("seqbin_breakdown").collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(7),
        if (r.isNullAt(8)) None else Some(r.getLong(8)),
        r.getLong(5), r.getLong(6)))
    }.toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, e) => assert(got(id) == e, s"order $id") }
  }

  test("lin_prefix_tree node values = prefix counts of the g4 assignment") {
    val codes = run("g4_lincode").collect().map(_.getString(1))
    val expected = codes.flatMap { c =>
      val parts = c.split("_")
      (1 to 3).map(l => (l, parts.take(l).mkString("_")))
    }.groupBy(identity).map { case ((l, p), xs) => (l, p) -> xs.length.toLong }
    val got = run("lin_prefix_tree").collect().map { r =>
      // parent of every non-root node must be its prefix one level up
      if (r.getInt(0) > 1)
        assert(r.getString(1).startsWith(r.getString(2)) &&
          r.getString(1).count(_ == '_') == r.getString(2).count(_ == '_') + 1)
      else assert(r.isNullAt(2))
      (r.getInt(0), r.getString(1)) -> r.getLong(3)
    }.toMap
    assert(got == expected)
  }

  test("seq_comparison reproduces the positional diff walk") {
    val docs = Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).take(60).toUpperCase).toMap
    val expected = (0L until 40L by 2).flatMap { a =>
      for {
        s1 <- docs.get(a); s2 <- docs.get(a + 1)
        if s1.length == s2.length
      } yield {
        val diffs = s1.indices.filter(i => s1(i) != s2(i))
        val str = diffs.map(i => s"${i + 1}: ${s1(i)} -> ${s2(i)}")
          .mkString("; ")
        a -> ((diffs.length, str))
      }
    }.toMap
    val got = run("seq_comparison").collect().map { r =>
      val id = r.getLong(0)
      val identity = r.getDouble(4)
      val len = docs(id).length
      val handIdentity = 100.0 - r.getInt(3).toDouble / len * 100.0
      assert(math.abs(identity - handIdentity) < 0.005 + 1e-9)
      id -> ((r.getInt(3), r.getString(5)))
    }.toMap
    assert(got == expected)
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("export_profiles = distinct profiles, first-seen ST order") {
    val li = Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val profiles = li.groupBy(_._1).map { case (id, rows) =>
      val byLocus = rows.groupBy(_._2).map { case (l, xs) =>
        l -> xs.map(_._3.toString).min }
      id -> (1 to 7).map(l => byLocus.getOrElse(l, "0")).toVector
    }
    val expected = profiles.groupBy(_._2).map { case (prof, xs) =>
      (xs.map(_._1).min, prof, xs.size.toLong)
    }.toSeq.sortBy(_._1).zipWithIndex
      .map { case ((_, prof, n), i) => (i + 1L) -> ((prof, n)) }.toMap
    val got = run("export_profiles").collect().map { r =>
      r.getLong(0) -> (((1 to 7).map(i => r.getString(i)).toVector,
        r.getLong(8)))
    }.toMap
    assert(got == expected)
  }

  test("text_top_ngrams = exact trigram heavy hitters, deterministic cut") {
    val texts = Tables.load(spark, dir, "documents")
      .select("text").collect().map(_.getString(0))
    val counts = texts.flatMap { t =>
      val w = t.trim.toLowerCase.split("\\s+")
      if (w.length >= 3) w.sliding(3).map(_.mkString(" ")) else Iterator.empty
    }.groupBy(identity).map { case (g, xs) => (g, xs.length.toLong) }
    val expected = counts.toSeq.sortBy { case (g, n) => (-n, g) }.take(25)
    val got = run("text_top_ngrams").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected)
  }

  test("text_boilerplate_strip removes within-source repeated units") {
    val docs = Tables.load(spark, dir, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def chunks(t: String): Vector[String] =
      t.split("\\s+").grouped(3).map(_.mkString(" ")).toVector
    val units = docs.flatMap { case (id, src, t) =>
      chunks(t).zipWithIndex.map { case (u, p) => (id, src, p, u) } }
    val boiler = units.groupBy(u => (u._2, u._4))
      .filter(_._2.map(_._1).distinct.length >= 2).keySet
    val expected = docs.map { case (id, src, t) =>
      val all = chunks(t)
      val kept = all.filterNot(u => boiler((src, u)))
      id -> ((src, kept.length.toLong, (all.length - kept.length).toLong,
        md5hex(kept.mkString(" "))))
    }.toMap
    val got = run("text_boilerplate_strip").collect().map { r =>
      r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    }.toMap
    assert(got == expected)
  }

  test("text_boilerplate_strip is idempotent: no within-source repeat survives") {
    // a unit carried by >=2 docs of a source is removed from ALL of them,
    // so after one pass every surviving (source, unit) has exactly one
    // carrier — a second pass must be a no-op
    val docs = Tables.load(spark, dir, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def chunks(t: String): Vector[String] =
      t.split("\\s+").grouped(3).map(_.mkString(" ")).toVector
    val units = docs.flatMap { case (id, src, t) =>
      chunks(t).map(u => (id, src, u)) }
    val boiler = units.groupBy(u => (u._2, u._3))
      .filter(_._2.map(_._1).distinct.length >= 2).keySet
    val surviving = units.filterNot(u => boiler((u._2, u._3)))
    val repeats = surviving.groupBy(u => (u._2, u._3))
      .filter(_._2.map(_._1).distinct.length >= 2)
    assert(repeats.isEmpty, s"second pass would strip: ${repeats.keys.take(3)}")
  }

  test("mix_curriculum: bucket-major, hash-shuffled-within-bucket order") {
    val docs = Tables.load(spark, dir, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = docs.map { case (id, nc) =>
      val bucket = nc / 100
      val key = f"${99999 - bucket}%05d" + md5hex(id.toString)
      (key, id, bucket)
    }.sortBy(_._1).zipWithIndex
      .map { case ((_, id, b), i) => (id, b, i + 1L) }
    val got = run("mix_curriculum").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == expected.toSeq)
  }

  test("text_tfidf_topk: integer tf-idf scores and deterministic top-3") {
    val docs = Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val words = docs.map { case (id, t) =>
      id -> t.trim.toLowerCase.split("\\s+").toSeq }
    val dfMap = words.flatMap { case (id, ws) => ws.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (w, xs) => w -> xs.length }
    val nBits = (x: Long) => java.lang.Long.toBinaryString(x).length
    val n = docs.length.toLong
    val expected = words.flatMap { case (id, ws) =>
      ws.groupBy(identity).toSeq
        .map { case (w, xs) =>
          (w, xs.length.toLong,
            xs.length.toLong * (nBits(n) - nBits(dfMap(w).toLong))) }
        .sortBy { case (w, _, sc) => (-sc, w) }.take(3).zipWithIndex
        .map { case ((w, tf, sc), i) => (id, i + 1L, w, tf, sc) }
    }.sortBy(x => (x._1, x._2))
    val got = run("text_tfidf_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected.toSeq)
  }

  test("event_sessionize: 30-minute-gap session walk matches") {
    val ev = Tables.load(spark, dir, "events")
      .selectExpr("user_id", "event_id", "unix_micros(ts) AS us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = ev.groupBy(_._1).flatMap { case (u, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      var session = 0L
      var prev = Long.MinValue
      val tagged = sorted.map { case (_, _, us) =>
        if (prev == Long.MinValue || us - prev > 1800000000L) session += 1
        prev = us
        (session, us)
      }
      tagged.groupBy(_._1).map { case (sid, xs) =>
        val uss = xs.map(_._2)
        (u, sid) -> ((xs.length.toLong, uss.min, uss.max, uss.max - uss.min))
      }
    }
    val got = run("event_sessionize").collect().map { r =>
      (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    }.toMap
    assert(got == expected)
  }

  test("api_batch_profiles: perturbed rows miss, clean rows resolve to their ST") {
    val got = run("api_batch_profiles").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getBoolean(2)))
    assert(got.nonEmpty)
    got.foreach { case (rowId, st, matched) =>
      assert(matched == st.isDefined)
      // every third row was perturbed to a non-existent allele
      if (rowId % 3 == 0) assert(st.isEmpty, s"row $rowId should miss")
      else assert(st.isDefined, s"row $rowId should match")
    }
    // matched rows resolve to the same ST as the isolate's own assignment
    val stAssign = run("j6_st_assign").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.filter(_._2.isDefined).foreach { case (rowId, st, _) =>
      assert(st.get == stAssign(rowId), s"row $rowId ST mismatch")
    }
  }

  test("event_funnel: sequential first-hit state machine matches a hand walk") {
    val ev = Tables.load(spark, dir, "events")
      .selectExpr("user_id", "event_type", "unix_micros(ts) AS us").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = ev.map(_._1).distinct.map { u =>
      val mine = ev.filter(_._1 == u).sortBy(_._3)
      def firstAfter(tpe: String, after: Option[Long]): Option[Long] =
        after.flatMap(t =>
          mine.find(e => e._2 == tpe && e._3 > t).map(_._3))
      val t1 = mine.find(_._2 == "view").map(_._3)
      val t2 = firstAfter("click", t1)
      val t3 = firstAfter("purchase", t2)
      u -> ((t1, t2, t3, Seq(t1, t2, t3).count(_.isDefined).toLong))
    }.toMap
    val got = run("event_funnel").collect().map { r =>
      def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
      r.getLong(0) -> ((opt(1), opt(2), opt(3), r.getLong(4)))
    }.toMap
    assert(got == expected)
  }

  test("event_retention: cohort/offset distinct counts match") {
    val ev = Tables.load(spark, dir, "events")
      .selectExpr("user_id", "unix_micros(ts) div 86400000000 AS day")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val cohort = ev.groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).min }
    val expected = ev.map { case (u, d) => (cohort(u), d - cohort(u), u) }
      .distinct.groupBy(x => (x._1, x._2))
      .map { case (k, xs) => k -> xs.length.toLong }
    val got = run("event_retention").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expected)
  }

  test("corpus_datacard: per-source datasheet row matches a hand rollup") {
    val docs = Tables.load(spark, dir, "documents")
      .select("source", "text", "lang").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val expected = docs.groupBy(_._1).map { case (src, rows) =>
      val texts = rows.map(_._2)
      val nDocs = rows.length.toLong
      val distinct = texts.map(md5hex).distinct.length.toLong
      src -> ((nDocs,
        texts.map(_.trim.split("\\s+").length.toLong).sum,
        texts.map(_.length.toLong).sum,
        distinct,
        rows.map(_._3).distinct.length.toLong,
        (nDocs - distinct) * 10000 / nDocs))
    }
    val got = run("corpus_datacard").collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(7)))
    }.toMap
    assert(got == expected)
  }

  test("curate_validate: config-driven rules emit one row per failed rule") {
    val docs = Tables.load(spark, dir, "documents")
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.flatMap { case (id, lang0) =>
      val lang = if (id % 97 == 0) "ZZ"
        else if (id % 101 == 0) "xx" else lang0
      val opt = if (!Set("en", "de", "fr")(lang))
        Seq((id, "lang", "optlist", lang)) else Nil
      val re = if (!lang.matches("^[a-z]{2}$"))
        Seq((id, "lang", "regex", lang)) else Nil
      opt ++ re
    }.sortBy(v => (v._1, v._3))
    val got = run("curate_validate").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3))).toSeq
    assert(got == expected.toSeq)
    // both violation classes are exercised by the staged batch
    assert(got.exists(_._3 == "optlist") && got.exists(_._3 == "regex"))
    // 'xx' rows fail the optlist but PASS the regex
    assert(got.filter(_._4 == "xx").forall(_._3 == "optlist"))
  }

  test("export_dataset folds multi-designation loci sorted numerically") {
    val li = Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_suppkey", "l_partkey")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    val got = run("export_dataset").collect()
      .map(r => r.getLong(0) -> r).toMap
    li.foreach { case (id, rows) =>
      val r = got(id)
      (0 to 2).foreach { l =>
        val exp = rows.filter(_._2 % 3 == l).map(_._3).sorted.mkString(";")
        assert(r.getString(3 + l) == exp, s"order $id locus $l")
      }
      val refs = rows.map(_._4).distinct.sorted.mkString("; ")
      assert(r.getString(7) == refs, s"order $id refs")
    }
    // isolates without designations export empty cells, not NULLs
    got.values.filterNot(r => li.contains(r.getLong(0))).foreach { r =>
      (3 to 5).foreach(i => assert(r.getString(i) == ""))
      assert(r.getString(7) == "")
    }
  }
}
