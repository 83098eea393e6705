package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

/** JSON shredding (SURVEY §1 "Analysis results"): the reference flattens
  * JSONB analysis blobs into a queryable long-format cache
  * (analysis_results_cache: isolate_id × json_path × value, maintained by
  * plpgsql `normalize_analysis_jsonb` with jsonb_path_query,
  * sql/isolatedb.sql:2161-2210). Spark-native: parse once with from_json
  * into a map and explode — one narrow pass, no per-path re-parsing — then
  * the F10 predicate family (filter + semi join) works on the long table.
  */
object JsonShred {

  /** Flatten a JSON-object column into (idCol, json_path, value) rows.
    * Top-level keys only (the reference's cache rows are also per-path
    * leaves; nest by repeated application for deeper paths).
    */
  def flatten(df: DataFrame, id: String, json: String): DataFrame =
    df.select(col(id),
        explode(from_json(col(json), MapType(StringType, StringType)))
          .as(Seq("json_path", "value")))
      .filter(col("value").isNotNull)
}
