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

  /** Per-row register coordinates of a key: (j, rho) — the kernel
    * [[registers]] aggregates with a per-(group, j) max. Exposed so
    * callers that already hold a per-key frame (e.g. a distinct-key
    * aggregate shared with exact counts) can build registers without a
    * second corpus pass; expressions are byte-identical to registers().
    */
  def regCoords(key: Column, m: Int): (Column, Column) = {
    val p = log2(m)
    val width = 60 - p
    val h = hash60(key)
    val rest = shiftright(h, p)
    (pmod(h, lit(m.toLong)),
      when(rest === 0L, lit(width + 1L))
        .otherwise(lit(width + 1L) - length(bin(rest)).cast("long")))
  }

  /** Sparse register maxes per group: (groupCols*, j, m) — one combinable
    * aggregation; dups collapse map-side.
    */
  def registers(df: DataFrame, groupCols: Seq[String], key: String,
      m: Int): DataFrame = {
    val (j, rho) = regCoords(col(key), m)
    df.select((groupCols.map(col) :+ j.as("j") :+ rho.as("rho")): _*)
      .groupBy((groupCols :+ "j").map(col): _*)
      .agg(max(col("rho")).as("m"))
  }

  /** Raw HLL estimate + zero-register count per group from a sparse
    * register table (absent registers count as zero; null-j rows are
    * ignored, matching the old dense join's null-never-matches
    * semantics). r15 opt (guide §2.4): ONE exchange — each group's
    * sparse registers collapse into a j→max map and densify inside the
    * row via sequence(0, m−1), instead of the old distinct-groups ×
    * range(m) cross join + left join chain (3 exchanges + a broadcast).
    * The fold is unchanged arithmetic: 2^-M terms added in ascending
    * register order (dyadic rationals, deterministic rounding), so both
    * engines still produce the identical double.
    */
  def estimate(sparse: DataFrame, groupCols: Seq[String], m: Int): DataFrame = {
    val dense = transform(
      sequence(lit(0L), lit(m.toLong - 1L)),
      j => coalesce(element_at(col("__rm"), j), lit(0L)))
    sparse
      .filter(col("j").isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(map_from_entries(collect_list(struct(col("j"), col("m"))))
        .as("__rm"))
      .select((groupCols.map(col) :+
        (lit(alpha(m)) * lit(m.toDouble * m) /
          aggregate(dense, lit(0.0),
            (a, x) => a + pow(lit(2.0), -x.cast("double")))).as("hll_raw") :+
        size(filter(dense, x => x === 0L)).cast("long")
          .as("n_zero_regs")): _*)
  }
}
