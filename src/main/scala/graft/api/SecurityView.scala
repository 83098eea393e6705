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
}
