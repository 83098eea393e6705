package graft.sources

import graft.operators.CacheRefresh
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-database dimension replication (SURVEY §2.1 S9/S10).
  *
  * The normal reference topology is federated: every isolate database joins
  * against scheme dimensions that live in a different (seqdef) database, so
  * the reference snapshots them locally — COPY into a timestamped table,
  * index, then drop-and-rename swap (lib/BIGSdb/Datastore.pm:2058-2174 for
  * scheme profiles, :1407-1535 for classification groups / LIN codes).
  *
  * Spark-native equivalent: the "remote" dimension is whatever DataFrame a
  * reader for the remote system produces (another cluster's parquet, a JDBC
  * scan — anything Spark can plan). Replication = write a versioned local
  * parquet snapshot and publish it atomically through the
  * [[CacheRefresh.fullSwap]] pointer protocol; readers resolve the pointer
  * and get a complete snapshot, never a partial directory. Local queries
  * then join against the snapshot — broadcastable, since analytic
  * dimensions (#profiles, #cgroups) are orders of magnitude smaller than
  * the isolate fact.
  */
object Federation {

  /** Snapshot-ingest a remote dimension: materialize `remote` as the next
    * version under `livePath` and atomically move the pointer. Safe to run
    * while readers are resolving the previous version (Datastore.pm's
    * drop-and-rename, without its unavailability window).
    */
  def replicateDimension(remote: DataFrame, livePath: String,
      numFiles: Option[Int] = None): Unit =
    CacheRefresh.fullSwap(remote, livePath, numFiles)

  /** Read the live replica published by [[replicateDimension]]. */
  def readDimension(spark: SparkSession, livePath: String): DataFrame =
    spark.read.parquet(CacheRefresh.resolveLive(spark, livePath))

  /** The scheme dimension the reference replicates (temp_scheme_<id>,
    * Datastore.pm:2119-2123): one row per distinct profile with the scheme
    * key (`st` = min first-appearing entity id, the engine's fixed
    * definition-order rule), `missing_loci` (count of missing positions;
    * the reference counts 'N' via array_positions) and the profile array.
    * Input is a Profiles.warehouse output.
    */
  def schemeDimension(wh: DataFrame, entity: String): DataFrame =
    wh.groupBy(col("profile_md5"))
      .agg(
        min(col(entity)).cast("long").as("st"),
        first(col("profile")).as("profile"))
      .withColumn("missing_loci",
        size(filter(col("profile"),
          a => a === lit(graft.functions.AlleleId.Missing))).cast("int"))
}
