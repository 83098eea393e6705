package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{ColumnBridge => Bridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Consistent-hash ring ownership as a native codegen'd expression.
  *
  * The ring (shards×vnodes points, sorted by 60-bit md5) is compile-time
  * metadata; ownership of a document hash is "first ring point at or
  * after the hash, wrapping to the smallest". The previous formulation —
  * `filter(<144-struct literal array>, p -> p.rh >= h)` + `element_at` —
  * was an INTERPRETED higher-order function: ~144 boxed struct-field
  * reads per row per ring (the r9 100× probe measured ~60 µs/row on
  * `shard_rebalance_plan`, all of it this constant). This expression
  * binary-searches a primitive long[] inside whole-stage codegen:
  * O(log ring) with no boxing, the per-row cost the scaladoc always
  * promised ("one narrow codegen'd array scan").
  *
  * Cf. reference partitioning metaphor: BIGSdb partitions nothing — the
  * ring is the 100 TB resharding primitive SURVEY §2.15 adds.
  */
object Rings {

  /** First index i with rh(i) >= h, wrapping to 0 past the end; returns
    * ow(i). `rh` MUST be ascending (callers sort at ring build).
    */
  def lookup(h: Long, rh: Array[Long], ow: Array[Int]): Int = {
    var lo = 0
    var hi = rh.length
    while (lo < hi) {
      val m = (lo + hi) >>> 1
      if (rh(m) >= h) hi = m else lo = m + 1
    }
    if (lo == rh.length) ow(0) else ow(lo)
  }

  case class RingOwner(child: Expression, ringHashes: Array[Long],
      owners: Array[Int]) extends UnaryExpression {
    require(ringHashes.length == owners.length && ringHashes.nonEmpty)
    override def dataType: DataType = IntegerType
    override protected def withNewChildInternal(c: Expression) =
      copy(child = c)
    override def nullSafeEval(input: Any): Any =
      lookup(input.asInstanceOf[Long], ringHashes, owners)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val rh = ctx.addReferenceObj("ringHashes", ringHashes, "long[]")
      val ow = ctx.addReferenceObj("owners", owners, "int[]")
      defineCodeGen(ctx, ev, c => s"graft.functions.Rings.lookup($c, $rh, $ow)")
    }
  }

  /** Ring owner of a 60-bit hash column under the given sorted ring. */
  def owner(hash: Column, ringHashes: Array[Long], owners: Array[Int]): Column =
    Bridge.column(RingOwner(Bridge.expression(hash), ringHashes, owners))
}
