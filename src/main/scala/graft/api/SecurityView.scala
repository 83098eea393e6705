package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-level security view (SURVEY §2.1 S1 / §7.4 hard-part 6).
  *
  * The reference creates a per-request temporary view over the isolate
  * table applying user/private/project/embargo predicates
  * (Datastore.initiate_view, lib/BIGSdb/Datastore.pm:3685-3807); every
  * query runs against that view. Here the view is a pure function
  * `SecurityContext => DataFrame` — predicate composition is zero-cost in
  * Catalyst (the filters merge into the scan), and because every entry
  * point takes the *viewed* DataFrame, bypassing security requires going
  * around the API rather than forgetting a WHERE clause.
  */
object SecurityView {

  /** What a requester is allowed to see.
    *   - `userId` — owns private records
    *   - `memberProjects` — private records shared via projects
    *   - `maxDate` — date-restricted view (seqdef date restriction,
    *     Datastore.pm:3691-3702); None = no restriction
    */
  final case class SecurityContext(
    userId: Option[Long],
    memberProjects: Set[Long] = Set.empty,
    maxDate: Option[String] = None,
    includeUnpublished: Boolean = false)

  /** Column layout of the secured entity table. */
  final case class SecurityColumns(
    ownerId: String = "owner_id",
    isPrivate: String = "is_private",
    projectId: String = "project_id",
    dateEntered: String = "date_entered")

  /** The view function: public rows ∪ own rows ∪ project-shared rows,
    * optionally date-restricted. Returns a filtered DataFrame — all
    * downstream query compilation composes on top.
    */
  def view(entities: DataFrame, ctx: SecurityContext,
      cols: SecurityColumns = SecurityColumns()): DataFrame = {
    val pub: Column = !col(cols.isPrivate)
    val own: Column = ctx.userId
      .map(u => col(cols.ownerId) === u).getOrElse(lit(false))
    val shared: Column =
      if (ctx.memberProjects.isEmpty) lit(false)
      else col(cols.projectId).isin(ctx.memberProjects.toSeq: _*)
    val visible = pub || own || shared
    val dated = ctx.maxDate match {
      case Some(d) => visible && col(cols.dateEntered) <= lit(d)
      case None => visible
    }
    entities.filter(dated)
  }

  /** Set-scoped ROW view (sql/isolatedb.sql:1293-1299 `set_view`;
    * Datastore.initiate_view, Datastore.pm:3708-3709): a set may name a
    * row-subset view of the entity table; when it does, every query the
    * set sees runs against that subset. `viewMembership` is the
    * materialized (view, entity_id) membership of the named views; a set
    * with no `set_view` row sees the unrestricted table, exactly the
    * reference's fallback.
    *
    * The set_view lookup collects ≤1 row (the reference runs the same
    * per-request scalar query); the membership restriction is a left-semi
    * equi join — at 100 TB the entity side streams through it, and AQE
    * broadcasts the membership when it is small.
    */
  def setRowView(entities: DataFrame, idCol: String, setView: DataFrame,
      viewMembership: DataFrame, setId: Long): DataFrame = {
    val name = setView.filter(col("set_id") === setId)
      .select(col("view")).collect().headOption.map(_.getString(0))
    name match {
      case None => entities
      case Some(v) =>
        val members = viewMembership.filter(col("view") === v)
          .select(col("entity_id").as("__sv_id"))
        entities.join(members, entities(idCol) === col("__sv_id"), "left_semi")
    }
  }

  /** Set-visible loci (sql/isolatedb.sql:1242-1262 `set_loci`, :1264-1285
    * `set_schemes`; Datastore.get_loci/get_loci_in_no_scheme,
    * Datastore.pm:956-957, 2480-2537): a locus is visible in a set iff it
    * belongs to one of the set's schemes OR is listed directly in
    * `set_loci`; a `set_loci.set_name` renames the locus inside the set.
    *
    * Returns the visible loci with `display_name` =
    * coalesce(set_name, locus id). All three set tables are curation
    * dimensions — broadcast; the loci table never shuffles.
    */
  def setVisibleLoci(loci: DataFrame, idCol: String, setLoci: DataFrame,
      setSchemes: DataFrame, schemeMembers: DataFrame,
      setId: Long): DataFrame = {
    val viaScheme = schemeMembers
      .join(broadcast(setSchemes.filter(col("set_id") === setId)
        .select(col("scheme_id"))), Seq("scheme_id"))
      .select(col("locus"))
    val direct = setLoci.filter(col("set_id") === setId).select(col("locus"))
    val visible = viaScheme.union(direct).distinct()
      .select(col("locus").as("__vis_locus"))
    val names = setLoci.filter(col("set_id") === setId)
      .select(col("locus").as("__alias_locus"), col("set_name"))
    loci
      .join(broadcast(visible), loci(idCol) === col("__vis_locus"),
        "left_semi")
      .join(broadcast(names), loci(idCol) === col("__alias_locus"), "left")
      .withColumn("display_name",
        coalesce(col("set_name"), loci(idCol).cast("string")))
      .drop("__alias_locus", "set_name")
  }

  /** Embargo publish transition — the `check_embargoes.pl` maintenance
    * job (scripts/maintenance/check_embargoes.pl:96-127): every private
    * record whose embargo date has arrived (embargo ≤ `asOf`, NULLs keep
    * their indefinite privacy) leaves the private set, and an audit row
    * ("Record made public (embargo date reached)") is appended to the
    * embargo history. Both outputs are narrow filters/projections of the
    * private-records dimension — one scan, no shuffle, trivially
    * idempotent (running twice publishes nothing new).
    *
    * History rows carry a NULL embargo column — the reference inserts
    * `undef` for the embargo value on the publish transition
    * (scripts/maintenance/check_embargoes.pl:119-122: the new state has
    * no embargo), not the date that just expired.
    *
    * Returns (remaining private records, history rows to append).
    */
  def embargoPublish(privateRecords: DataFrame, asOf: Column)
      : (DataFrame, DataFrame) = {
    val due = col("embargo").isNotNull && col("embargo") <= asOf
    val remaining = privateRecords.filter(!due)
    val history = privateRecords.filter(due)
      .select(col("entity_id"), lit(null).cast("date").as("embargo"),
        lit("Record made public (embargo date reached)").as("action"))
    (remaining, history)
  }
}
