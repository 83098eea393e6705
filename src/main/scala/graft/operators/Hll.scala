package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog register sketch (Flajolet et al. 2007) on the repo's
  * portable md5 hash — the cardinality structure whose aggregation state
  * is m small integers per group regardless of the distinct count, and
  * whose shard sketches merge by register max.
  *
  * The portable hash (first 15 md5 hex digits → a 60-bit non-negative
  * long, identical in Spark and DuckDB) makes the whole sketch
  * oracle-replayable: register index = low log2(m) bits, rho = leading-
  * zero rank of the remaining (60 − log2 m)-bit field. The raw-estimate
  * register sum folds in ascending-register order (2^-M terms are dyadic
  * rationals, so rounding is deterministic given the fold order) — both
  * engines produce the identical double.
  *
  * The small-range linear-counting correction is deliberately NOT applied
  * here: it needs ln(), which is libm-dependent across engines. The
  * zero-register count the correction would use is emitted instead.
  */
object Hll {

  /** Standard bias-correction constant for m registers. */
  def alpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  private def log2(m: Int): Int = {
    require(m >= 16 && (m & (m - 1)) == 0, s"m must be a power of two >= 16: $m")
    java.lang.Integer.numberOfTrailingZeros(m)
  }

  /** The 60-bit portable hash of a key column. */
  def hash60(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")

  /** Sparse register maxes per group: (groupCols*, j, m) — one combinable
    * aggregation; dups collapse map-side.
    */
  def registers(df: DataFrame, groupCols: Seq[String], key: String,
      m: Int): DataFrame = {
    val p = log2(m)
    val width = 60 - p
    val h = hash60(col(key))
    val rest = shiftright(h, p)
    df.select(
        (groupCols.map(col) :+ pmod(h, lit(m.toLong)).as("j") :+
          when(rest === 0L, lit(width + 1L))
            .otherwise(lit(width + 1L) - length(bin(rest)).cast("long"))
            .as("rho")): _*)
      .groupBy((groupCols :+ "j").map(col): _*)
      .agg(max(col("rho")).as("m"))
  }

  /** Raw HLL estimate + zero-register count per group from a sparse
    * register table (absent registers count as zero). The m-row register
    * dimension densifies against the group list; the ordered fold keeps
    * the double sum engine-exact.
    */
  def estimate(sparse: DataFrame, groupCols: Seq[String], m: Int): DataFrame = {
    val spark = sparse.sparkSession
    val groups = sparse.select(groupCols.map(col): _*).distinct()
    val dense = groups
      .crossJoin(spark.range(m).select(col("id").as("j")))
      .join(sparse, groupCols :+ "j", "left")
      .select((groupCols.map(col) :+ col("j") :+
        coalesce(col("m"), lit(0L)).as("m")): _*)
    dense.groupBy(groupCols.map(col): _*)
      .agg(
        sort_array(collect_list(struct(col("j"),
          pow(lit(2.0), -col("m").cast("double")).as("p")))).as("__ps"),
        sum(when(col("m") === 0L, 1L).otherwise(0L)).as("n_zero_regs"))
      .select((groupCols.map(col) :+
        (lit(alpha(m)) * lit(m.toDouble * m) /
          aggregate(col("__ps"), lit(0.0),
            (a, x) => a + x.getField("p"))).as("hll_raw") :+
        col("n_zero_regs")): _*)
  }
}
