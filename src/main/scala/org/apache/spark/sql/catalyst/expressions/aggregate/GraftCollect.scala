package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.catalyst.expressions.Expression

/** `CollectTopK` — Spark's bounded-priority-queue top-k aggregate — is
  * `private[aggregate]`; this accessor, compiled inside that package,
  * re-exports the constructor for graft's two-phase ANN rank (the same
  * move as `org.apache.spark.sql.graft.ColumnBridge` for
  * `ExpressionUtils`). No behavior is added or changed here.
  */
object GraftCollect {
  /** With `reverse = true`: keeps the `num` SMALLEST values of `child`
    * under its natural ordering; map-side partial buffers hold at most
    * `num` entries; evaluates to an ASCENDING array.
    */
  def topK(child: Expression, num: Int, reverse: Boolean): AggregateFunction =
    CollectTopK(child, num, reverse)

  /** Fold a SQL literal argument to the Int CollectTopK needs (the same
    * contract as Spark's own expressionToNum, re-exported for the
    * `bottom_k` SQL registration).
    */
  def literalInt(e: Expression, fn: String): Int =
    CollectTopK.expressionToNum(e)
}
