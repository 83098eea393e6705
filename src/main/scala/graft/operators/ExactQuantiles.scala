package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** EXACT per-group quantiles over a bounded-domain value column via the
  * VALUE-HISTOGRAM form (SURVEY §2.4 A7's scalable exact complement to
  * the KMV approximate quantiles): one map-side-combinable count on
  * (group, value), then a cumulative walk over the ≤|domain|-row
  * histogram per group — windows partition the HISTOGRAM, never the
  * rows, so at 100 TB the shuffle carries one row per (group, distinct
  * value) per task.
  *
  * Definitions (all integer arithmetic, defined for every n ≥ 1):
  *  - lower median = first value with cum ≥ (n+1) div 2;
  *  - nearest-rank p90 = first value with cum ≥ ceil(9n/10), evaluated
  *    as 10·cum ≥ 9·n on integer cum (the r10 threshold bug — `cum ≥
  *    floor(9n/10)` — passed the DuckDB compare because engine and
  *    oracle shared the wrong expression; HandComputedAggSpec pins this
  *    formula against literal hand-worked fixtures, independent of both
  *    engines).
  *
  * Output: (group, n_rows, median_v, p90_v).
  */
object ExactQuantiles {

  def medianP90ByHistogram(df: DataFrame, group: Column,
      value: Column): DataFrame = {
    val h = df.groupBy(group.as("grp"), value.cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
    val cumW = Window.partitionBy(col("grp")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nW = Window.partitionBy(col("grp"))
    h.withColumn("cum", sum(col("c")).over(cumW))
      .withColumn("n", sum(col("c")).over(nW))
      .groupBy(col("grp"))
      .agg(max(col("n")).as("n_rows"),
        min(when(col("cum") >= expr("(n + 1) div 2"), col("v")))
          .as("median_v"),
        min(when(col("cum") * 10 >= col("n") * 9, col("v")))
          .as("p90_v"))
  }
}
