package graft.api

import graft.operators.Predicates
import graft.operators.Predicates.Op
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The query DSL compiler (SURVEY §3.1 / §7.1 step 2 — "the heart of
  * parity").
  *
  * The reference builds one SQL string through a fixed pipeline of clause
  * mutators (IsolateQueryPage._run_query:2093-2128): provenance fields, EAV
  * fields, pasted id list, filters, designations, count predicates, then
  * ORDER BY + paging. Here the same grammar is a typed AST compiled onto
  * DataFrames: scalar clauses fold into one `Column` predicate (pushable
  * into the scan); clause families that the reference expresses as
  * subqueries become semi/anti joins against their fact tables.
  *
  * Scale: predicates reach the parquet scan via Catalyst pushdown; each
  * subquery family is ONE semi join (no correlated per-row lookups); the
  * entity table is never shuffled except by joins keyed on its primary key.
  */
object QueryCompiler {

  /** One scalar field clause (F1): field op value. */
  final case class FieldClause(field: String, op: Op, value: String,
    isText: Boolean = true)

  /** Grouped-field clause (F4): one predicate across a field group. */
  final case class GroupClause(fields: Seq[String], op: Op, value: String)

  /** EAV clause (F7): entity must (not) have a matching long-format row. */
  final case class EavClause(field: String, op: Op, value: String,
    negate: Boolean = false, isText: Boolean = true)

  /** Designation clause (J1/J2): exists a fact row at `locus` matching the
    * allele predicate; Missing = NOT EXISTS any row at locus (J2).
    */
  sealed trait DesignationClause
  final case class HasAllele(locus: Int, op: Op, value: String) extends DesignationClause
  final case class LocusMissing(locus: Int) extends DesignationClause

  /** Count predicate (A3): designation count per entity `op` n (zero counts
    * included for < / <= via left join).
    */
  final case class CountClause(op: Op, n: Long)

  final case class SortSpec(field: String, ascending: Boolean = true)
  final case class PageSpec(page: Int, pageSize: Int = 100)

  /** The full query AST — clause families AND'd, mirroring _run_query. */
  final case class QuerySpec(
    provenance: Seq[FieldClause] = Nil,
    grouped: Seq[GroupClause] = Nil,
    idList: Option[Seq[Long]] = None,
    eav: Seq[EavClause] = Nil,
    designations: Seq[DesignationClause] = Nil,
    counts: Seq[CountClause] = Nil,
    orderBy: Seq[SortSpec] = Nil,
    page: Option[PageSpec] = None)

  /** The registered tables a spec compiles against. `entityId` is the
    * primary key of `entities`; `facts` is the designation fact keyed by
    * (factEntityId, locusCol, alleleCol); `eav` the long-format sparse
    * fields (entity, field, value).
    */
  final case class Catalog(
    entities: DataFrame, entityId: String,
    facts: Option[DataFrame] = None, factEntityId: String = "entity_id",
    locusCol: String = "locus", alleleCol: String = "allele",
    eav: Option[DataFrame] = None, eavEntityId: String = "entity_id",
    eavField: String = "field", eavValue: String = "value")

  /** Compile spec → DataFrame plan (unsorted, unpaged — see `paged`). */
  def compile(spec: QuerySpec, cat: Catalog): DataFrame = {
    var df = cat.entities
    val pk = col(cat.entityId)

    // 1. provenance + grouped scalar predicates: one AND-folded Column
    val scalar: Seq[Column] =
      spec.provenance.map(c => Predicates.compile(col(c.field), c.op, c.value, c.isText)) ++
      spec.grouped.map(g => Predicates.compileGroup(g.fields.map(col), g.op, g.value))
    if (scalar.nonEmpty) df = df.filter(scalar.reduce(_ && _))

    // 2. pasted id list (S7): broadcast semi join
    spec.idList.foreach { ids =>
      val spark = df.sparkSession
      import spark.implicits._
      df = df.join(broadcast(ids.toDF(cat.entityId)),
        Seq(cat.entityId), "left_semi")
    }

    // 3. EAV clauses (F7): one semi/anti join per clause
    for (c <- spec.eav; eav <- cat.eav) {
      val matching = eav
        .filter(col(cat.eavField) === c.field &&
          Predicates.compile(col(cat.eavValue), c.op, c.value, c.isText))
        .select(col(cat.eavEntityId).as(cat.entityId))
      df = df.join(matching, Seq(cat.entityId), if (c.negate) "left_anti" else "left_semi")
    }

    // 4. designation clauses (J1/J2)
    for (c <- spec.designations; facts <- cat.facts) c match {
      case HasAllele(locus, op, value) =>
        val m = facts.filter(col(cat.locusCol) === locus &&
            Predicates.compile(col(cat.alleleCol), op, value))
          .select(col(cat.factEntityId).as(cat.entityId))
        df = df.join(m, Seq(cat.entityId), "left_semi")
      case LocusMissing(locus) =>
        val m = facts.filter(col(cat.locusCol) === locus)
          .select(col(cat.factEntityId).as(cat.entityId))
        df = df.join(m, Seq(cat.entityId), "left_anti")
    }

    // 5. count predicates (A3): zero-inclusive left join + filter
    for (c <- spec.counts; facts <- cat.facts) {
      val counts = facts.groupBy(col(cat.factEntityId).as(cat.entityId))
        .agg(count(lit(1)).as("__n"))
      df = df.join(counts, Seq(cat.entityId), "left")
        .withColumn("__n", coalesce(col("__n"), lit(0L)))
        .filter(Predicates.compile(col("__n"), c.op, c.n.toString, isText = false))
        .drop("__n")
    }
    df
  }

  /** ORDER BY with the reference's stable tiebreaker (O1: user sort then
    * primary key — IsolateQueryPage.pm:2107-2128), then count + page (O3:
    * ResultsTablePage count rewrite + LIMIT/OFFSET). Returns (total, page).
    */
  /** Lazily-counted page result: `total` runs the count job only when
    * forced, so callers that render a page without the total-hits banner
    * (or bench a single page) don't execute the query twice.
    */
  final class Paged(totalThunk: () => Long, val page: DataFrame) {
    lazy val total: Long = totalThunk()
  }

  def paged(spec: QuerySpec, cat: Catalog): Paged = {
    val base = compile(spec, cat)
    val sorts = spec.orderBy.map(s =>
      if (s.ascending) col(s.field).asc else col(s.field).desc) :+
      col(cat.entityId).asc
    val sorted = base.orderBy(sorts: _*)
    val pageDf = spec.page match {
      case Some(PageSpec(p, size)) => sorted.offset((p - 1) * size).limit(size)
      case None => sorted
    }
    // count on the UNSORTED plan — Catalyst prunes the sort, same as the
    // reference's COUNT rewrite (ResultsTablePage.pm:76-81)
    new Paged(() => base.count(), pageDf)
  }
}
