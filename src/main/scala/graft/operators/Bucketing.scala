package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Co-located (bucketed) materialization for repeatedly-joined tables.
  *
  * The reference's hottest join — isolates ⋈ allele_designations — runs on
  * every interactive query (`lib/BIGSdb/IsolateQueryPage.pm` clause
  * families all correlate the fact to the isolate id; the index `i_ad3` on
  * `sql/isolatedb.sql:982` exists for exactly this). At 100 TB the
  * equivalent Spark join shuffles the designation fact on every query
  * unless both sides are pre-partitioned on the key.
  *
  * `materialize` writes a Hive-style bucketed + sorted parquet table:
  * every query joining two tables bucketed on the same key with the same
  * bucket count gets a shuffle-FREE sort-merge join (Catalyst recognizes
  * the bucket spec as a satisfying output partitioning — no Exchange in
  * the plan; BucketingSpec pins this). Bucket count is the knob that must
  * scale with the cluster: buckets ≈ target parallelism, sized so a
  * bucket's rows fit an executor's memory at the target SF.
  */
object Bucketing {

  /** Write `df` as a managed bucketed table (overwriting), bucketed AND
    * sorted by `key` so bucket joins skip both the shuffle and, with
    * one file per bucket, the sort.
    */
  def materialize(df: DataFrame, table: String, key: String,
      nBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // DROP removes the catalog entry, but a dir left by a previous JVM
    // (in-memory catalog) still blocks CREATE with LOCATION_ALREADY_EXISTS
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    // one file per bucket: repartition on the bucket key first, so each
    // bucket's rows land in a single writer task → single sorted file
    df.repartition(nBuckets, df(key))
      .write.bucketBy(nBuckets, key).sortBy(key)
      .format("parquet").mode("overwrite").saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
