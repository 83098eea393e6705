package graft

import graft.queries.AllQueries
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The operator surface lives in graft.queries.* (one module per SURVEY §2
  * family); this object is just the registry the driver reads.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * SURVEY §7.2 slice: filter → fact join → aggregate → sort (the
    * IsolateQueryPage._run_query shape over the corpus schema).
    */
  def entry(spark: SparkSession): DataFrame =
    AllQueries.queries("j11_broadcast_dims")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    AllQueries.queries

  /** DuckDB-equivalent SQL per query (same column names — driver compare is
    * column-name-keyed). Hash-based / engine-specific ops are omitted →
    * rows-only check.
    */
  def oracleSql: Map[String, String] = AllQueries.oracles
}
