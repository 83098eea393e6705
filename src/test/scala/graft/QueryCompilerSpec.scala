package graft

import graft.api.QueryCompiler._
import graft.api.SecurityView
import graft.api.SecurityView.SecurityContext
import graft.operators.Predicates.{Contains, Eq, Ge, Lt, NotEq}
import org.apache.spark.sql.functions._

class QueryCompilerSpec extends SparkSpec {
  import spark.implicits._

  private lazy val entities = Seq(
    (1L, "Alpha", "urgent"), (2L, "beta", "low"), (3L, null.asInstanceOf[String], "urgent"),
    (4L, "gamma", "LOW"))
    .toDF("id", "name", "priority")

  private lazy val facts = Seq(
    (1L, 1, "10"), (1L, 2, "20"),
    (2L, 1, "10"),
    (4L, 1, "99"), (4L, 2, "20"), (4L, 3, "30"))
    .toDF("entity_id", "locus", "allele")

  private lazy val eav = Seq(
    (1L, "color", "red"), (2L, "color", "blue"), (4L, "size", "12"))
    .toDF("entity_id", "field", "value")

  private lazy val cat = Catalog(entities, "id",
    facts = Some(facts), eav = Some(eav))

  private def run(spec: QuerySpec): Seq[Long] =
    compile(spec, cat).select("id").as[Long].collect().toSeq.sorted

  test("provenance clauses AND together, NULL-inclusive NOT") {
    assert(run(QuerySpec(provenance = Seq(
      FieldClause("priority", Eq, "URGENT")))) == Seq(1, 3))
    assert(run(QuerySpec(provenance = Seq(
      FieldClause("name", NotEq, "beta"),
      FieldClause("priority", Eq, "urgent")))) == Seq(1, 3)) // null name kept
  }

  test("id list becomes a semi join") {
    assert(run(QuerySpec(idList = Some(Seq(2L, 4L, 77L)))) == Seq(2, 4))
  }

  test("EAV semi and anti joins") {
    assert(run(QuerySpec(eav = Seq(EavClause("color", Eq, "red")))) == Seq(1))
    assert(run(QuerySpec(eav = Seq(
      EavClause("color", Eq, "red", negate = true)))) == Seq(2, 3, 4))
    assert(run(QuerySpec(eav = Seq(
      EavClause("size", Ge, "10", isText = false)))) == Seq(4))
  }

  test("designation exists / missing") {
    assert(run(QuerySpec(designations = Seq(HasAllele(2, Eq, "20")))) == Seq(1, 4))
    assert(run(QuerySpec(designations = Seq(LocusMissing(2)))) == Seq(2, 3))
    assert(run(QuerySpec(designations = Seq(
      HasAllele(1, Eq, "10"), HasAllele(2, Eq, "20")))) == Seq(1)) // AND across clauses
  }

  test("count predicates include the zero case") {
    assert(run(QuerySpec(counts = Seq(CountClause(Lt, 2)))) == Seq(2, 3)) // 3 has 0
    assert(run(QuerySpec(counts = Seq(CountClause(Ge, 3)))) == Seq(4))
  }

  test("paged: count on unsorted plan, stable tiebreak, offset/limit") {
    val spec = QuerySpec(
      orderBy = Seq(SortSpec("priority")), page = Some(PageSpec(1, 2)))
    val r = paged(spec, cat); val (total, pageDf) = (r.total, r.page)
    assert(total == 4)
    // priority asc: LOW(4), low(2)? — Spark string sort: "LOW" < "low" < "urgent"
    assert(pageDf.select("id").as[Long].collect().toSeq == Seq(4, 2))
    val page2 = paged(spec.copy(page = Some(PageSpec(2, 2))), cat).page
    assert(page2.select("id").as[Long].collect().toSeq == Seq(1, 3))
  }

  test("clause families compose (the full mutator chain)") {
    val spec = QuerySpec(
      provenance = Seq(FieldClause("priority", Contains, "o")),  // low/LOW
      designations = Seq(HasAllele(1, Eq, "10")),
      counts = Seq(CountClause(Lt, 3)))
    assert(run(spec) == Seq(2))
  }

  test("tag clauses: modes, AND vs OR combine, negation under OR") {
    // tags: (entity, locus, complete, flag)
    val tags = Seq(
      (1L, 1, true, null.asInstanceOf[String]),
      (1L, 2, false, "ambiguous"),
      (2L, 1, false, null.asInstanceOf[String]),
      (4L, 2, true, "phase_variable"))
      .toDF("entity_id", "locus", "complete", "flag")
    val c = cat.copy(tags = Some(tags))
    def go(spec: QuerySpec) =
      compile(spec, c).select("id").as[Long].collect().toSeq.sorted
    // AND: complete at locus 1 AND untagged at locus 3
    assert(go(QuerySpec(tags = Seq(
      TagClause(Some(1), TagComplete),
      TagClause(Some(3), Untagged)))) == Seq(1))
    // OR: flagged anywhere OR tagged at locus 1 (3 has neither)
    assert(go(QuerySpec(tags = Seq(
      TagClause(None, TagFlagged(None)),
      TagClause(Some(1), Tagged)), tagCombine = CombineOr)) == Seq(1, 2, 4))
    // untagged (negation) under OR: untagged at locus 2 OR flagged 'ambiguous'
    assert(go(QuerySpec(tags = Seq(
      TagClause(Some(2), Untagged),
      TagClause(None, TagFlagged(Some("ambiguous")))),
      tagCombine = CombineOr)) == Seq(1, 2, 3))
    // FlagNone: tagged at locus 1 but not flagged there
    assert(go(QuerySpec(tags = Seq(TagClause(Some(1), TagFlagNone)))) == Seq(1, 2))
  }

  test("seqbin clauses: stats-less entities match the null-inclusive ops") {
    val stats = Seq((1L, 500.0), (2L, 90.0)).toDF("entity_id", "size")
    val c = cat.copy(seqbinStats = Some(stats))
    def go(spec: QuerySpec) =
      compile(spec, c).select("id").as[Long].collect().toSeq.sorted
    // >= excludes entities without stats (3, 4)
    assert(go(QuerySpec(seqbin = Seq(SeqbinClause("size", Ge, 100.0)))) == Seq(1))
    // < includes stats-less entities, like the reference's OR IS NULL
    assert(go(QuerySpec(seqbin = Seq(SeqbinClause("size", Lt, 100.0)))) == Seq(2, 3, 4))
  }

  test("old-version suppression filters only when the catalog declares it") {
    val versioned = entities.withColumn("new_version",
      when(col("id") === 2, 3L))
    val c = cat.copy(entities = versioned, newVersionCol = Some("new_version"))
    assert(compile(QuerySpec(suppressOldVersions = true), c)
      .select("id").as[Long].collect().toSeq.sorted == Seq(1, 3, 4))
    // catalog without the column: suppression is a no-op, not an error
    assert(run(QuerySpec(suppressOldVersions = true)) == Seq(1, 2, 3, 4))
  }

  test("extended attributes: negated clause excludes NULL parents (NOT IN)") {
    val withCountry = Seq(
      (1L, "UK"), (2L, "FR"), (3L, null.asInstanceOf[String]), (4L, "US"))
      .toDF("id", "country")
    val dim = Seq(("UK", "Europe"), ("FR", "Europe"), ("US", "America"))
      .toDF("field_value", "value")
      .select(lit("country").as("isolate_field"),
        lit("continent").as("attribute"), col("field_value"), col("value"))
    val c = Catalog(withCountry, "id", extendedAttrs = Some(dim))
    def go(negate: Boolean) =
      compile(QuerySpec(extended = Seq(
        ExtendedClause("country", "continent", Eq, "Europe", negate = negate))), c)
        .select("id").as[Long].collect().toSeq.sorted
    assert(go(negate = false) == Seq(1, 2))
    // SQL NOT IN semantics: the NULL-country row is excluded, not kept
    assert(go(negate = true) == Seq(4))
  }

  test("TagFlagNone requires a specific locus, like the reference") {
    val tags = Seq((1L, 1, true, null.asInstanceOf[String]))
      .toDF("entity_id", "locus", "complete", "flag")
    val c = cat.copy(tags = Some(tags))
    intercept[IllegalArgumentException] {
      compile(QuerySpec(tags = Seq(TagClause(None, TagFlagNone))), c).collect()
    }
  }

  test("embargo clauses: date comparison, null forms, invalid null op") {
    val priv = Seq(
      (1L, "2024-01-15"), (2L, null.asInstanceOf[String]), (3L, "2024-06-01"))
      .toDF("entity_id", "embargo")
      .select(col("entity_id"), col("embargo").cast("date"))
    val c = cat.copy(privateRecords = Some(priv))
    def runE(e: EmbargoClause) =
      compile(QuerySpec(embargo = Seq(e)), c)
        .select("id").as[Long].collect().toSeq.sorted
    assert(runE(EmbargoClause(Ge, Some("2024-02-01"))) == Seq(3))
    assert(runE(EmbargoClause(Lt, Some("2024-02-01"))) == Seq(1))
    assert(runE(EmbargoClause(NotEq, Some("2024-01-15"))) == Seq(3)) // null excluded
    assert(runE(EmbargoClause(Eq, None)) == Seq(2))    // embargo IS NULL
    assert(runE(EmbargoClause(NotEq, None)) == Seq(1, 3))
    intercept[IllegalArgumentException] {
      runE(EmbargoClause(Ge, None)) // only = / NOT compare the null text
    }
    // a privacy filter must fail loudly, not silently return extra rows,
    // when the catalog has no private-records dimension to resolve it
    intercept[IllegalArgumentException] {
      compile(QuerySpec(embargo = Seq(EmbargoClause(Eq, None))), cat)
    }
  }

  test("fused membership equals naive EXISTS semantics on random specs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 6) {
      val rows = Seq.fill(60)((rnd.nextInt(20) + 1L, rnd.nextInt(4) + 1,
        (rnd.nextInt(5) + 1).toString,
        if (rnd.nextBoolean()) "confirmed" else "provisional"))
      val rfacts = rows.toDF("entity_id", "locus", "allele", "status")
      val rents = (1L to 25L).toDF("id") // 21..25 have no fact rows at all
      val rcat = Catalog(rents, "id", facts = Some(rfacts))
      val clauses = Seq.fill(rnd.nextInt(3) + 1) {
        if (rnd.nextBoolean())
          HasAllele(rnd.nextInt(4) + 1, Eq, (rnd.nextInt(5) + 1).toString)
        else LocusMissing(rnd.nextInt(4) + 1)
      }
      val combine = if (rnd.nextBoolean()) CombineAnd else CombineOr
      val statusClauses = Seq.fill(rnd.nextInt(2)) {
        StatusClause(if (rnd.nextBoolean()) Some(rnd.nextInt(4) + 1) else None,
          "confirmed")
      }
      val got = compile(QuerySpec(designations = clauses,
          designationCombine = combine,
          designationStatus = statusClauses), rcat)
        .select("id").as[Long].collect().toSet
      // naive per-clause EXISTS reference
      val byE = rows.groupBy(_._1)
      def des(e: Long, c: DesignationClause): Boolean = c match {
        case HasAllele(l, _, v) =>
          byE.getOrElse(e, Nil).exists(r => r._2 == l && r._3 == v)
        case LocusMissing(l) =>
          !byE.getOrElse(e, Nil).exists(_._2 == l)
      }
      def st(e: Long, c: StatusClause): Boolean =
        byE.getOrElse(e, Nil).exists(r =>
          c.locus.forall(_ == r._2) && r._4 == c.status)
      val want = (1L to 25L).filter { e =>
        val ms = clauses.map(des(e, _))
        val dOk = if (combine == CombineAnd) ms.forall(identity)
          else ms.exists(identity)
        dOk && statusClauses.forall(st(e, _)) // AND default for status
      }.toSet
      assert(got == want,
        s"trial $trial clauses=$clauses combine=$combine status=$statusClauses")
    }
  }

  test("security view: public ∪ own ∪ project-shared, date cap") {
    val rowsDf = Seq(
      (1L, 100L, false, 1L, "2020-01-01"),
      (2L, 100L, true, 1L, "2020-01-01"),   // private, owner 100
      (3L, 200L, true, 5L, "2020-01-01"),   // private, project 5
      (4L, 200L, true, 9L, "2020-01-01"),   // private, invisible
      (5L, 100L, false, 1L, "2030-01-01"))  // public but future-dated
      .toDF("id", "owner_id", "is_private", "project_id", "date_entered")
    val ctx = SecurityContext(userId = Some(100L), memberProjects = Set(5L),
      maxDate = Some("2025-01-01"))
    val got = SecurityView.view(rowsDf, ctx)
      .select("id").as[Long].collect().toSeq.sorted
    assert(got == Seq(1, 2, 3))
  }

  test("set view: row scoping via named view, fallback when set has none") {
    val entities = Seq(1L, 2L, 3L, 4L).toDF("id")
    val setView = Seq((1L, "subset_a")).toDF("set_id", "view")
    val membership = Seq(("subset_a", 1L), ("subset_a", 3L),
      ("subset_b", 2L)).toDF("view", "entity_id")
    val scoped = SecurityView.setRowView(entities, "id", setView,
        membership, setId = 1L)
      .select("id").as[Long].collect().toSeq.sorted
    assert(scoped == Seq(1, 3))
    // set 2 has no set_view row → unrestricted (Datastore.pm:3708-3709)
    val unscoped = SecurityView.setRowView(entities, "id", setView,
        membership, setId = 2L)
      .select("id").as[Long].collect().toSeq.sorted
    assert(unscoped == Seq(1, 2, 3, 4))
  }

  test("set loci: scheme members ∪ direct set_loci, set_name renames") {
    val loci = Seq(1L, 2L, 3L, 4L, 5L).toDF("locus")
    val setLoci = Seq((1L, 4L, Some("renamed_4")), (1L, 5L, None))
      .toDF("set_id", "locus", "set_name")
    val setSchemes = Seq((1L, 10L)).toDF("set_id", "scheme_id")
    val schemeMembers = Seq((10L, 1L), (10L, 2L), (11L, 3L))
      .toDF("scheme_id", "locus")
    val got = SecurityView.setVisibleLoci(loci, "locus", setLoci,
        setSchemes, schemeMembers, setId = 1L)
      .select("locus", "display_name").as[(Long, String)]
      .collect().toSeq.sortBy(_._1)
    // locus 3 is in scheme 11, which set 1 does not include → invisible
    assert(got == Seq((1L, "1"), (2L, "2"), (4L, "renamed_4"), (5L, "5")))
  }

  test("embargoPublish: due records publish, NULLs stay, idempotent") {
    import java.sql.Date
    val pr = Seq(
      (1L, Some(Date.valueOf("1996-01-01"))),  // due
      (2L, Some(Date.valueOf("1997-01-01"))),  // future → stays
      (3L, None),                              // indefinite → stays
      (4L, Some(Date.valueOf("1996-06-01"))))  // boundary: due (<=)
      .toDF("entity_id", "embargo")
    val asOf = lit("1996-06-01").cast("date")
    val (remaining, history) = SecurityView.embargoPublish(pr, asOf)
    assert(remaining.select("entity_id").as[Long].collect().sorted.toSeq
      == Seq(2L, 3L))
    val h = history.select("entity_id", "action").as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    assert(h.map(_._1) == Seq(1L, 4L))
    assert(h.forall(_._2 == "Record made public (embargo date reached)"))
    // remaining ∪ history ids partition the input exactly
    assert((remaining.select("entity_id").as[Long].collect() ++
      history.select("entity_id").as[Long].collect()).sorted.toSeq
      == Seq(1L, 2L, 3L, 4L))
    // idempotence: a second run over the remaining set publishes nothing
    val (again, h2) = SecurityView.embargoPublish(remaining, asOf)
    assert(h2.count() == 0 && again.count() == remaining.count())
  }
}
