package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Remote contig source (SURVEY §2.1 S6 — lib/BIGSdb/ContigManager.pm).
  *
  * The reference stores contigs by URI (remote_contigs,
  * sql/isolatedb.sql:373-384), fetches them lazily over HTTP, verifies the
  * recorded md5 checksum (ContigManager.pm:119-150) and caches the result.
  * Spark re-expression: a `ContigFetcher` boundary (the HTTP/OAuth client
  * lives behind it; this environment has no egress, so the shipped
  * implementation is a deterministic stub) driven through a
  * partition-parallel materialization pass — one fetcher per task, rows
  * streamed, never collected to the driver — published atomically via the
  * [[Federation]] snapshot protocol so queries always join a complete
  * local contig set.
  */
object RemoteContigs {

  /** The transport boundary: URI → sequence. Implementations must be
    * serializable (instantiated once per task).
    */
  trait ContigFetcher extends Serializable {
    def fetch(uri: String): String
  }

  /** Deterministic offline stand-in for the HTTP client: sequence derived
    * from the URI alone. STUB — swap for a real client without touching
    * the materialization plan.
    */
  object StubFetcher extends ContigFetcher {
    def fetch(uri: String): String = {
      val seed = uri.hashCode
      val n = 40 + math.abs(seed % 40)
      val bases = "ACGT"
      val sb = new StringBuilder(n)
      var h = seed.toLong
      (0 until n).foreach { _ =>
        h = h * 6364136223846793005L + 1442695040888963407L
        sb += bases(((h >>> 33) % 4).toInt)
      }
      sb.toString
    }
  }

  /** Fetch every referenced contig and return (refs columns + sequence +
    * checksum_ok). `refs` carries (uriCol, checksumCol nullable) plus any
    * id columns, which pass through untouched: rows with a recorded
    * checksum are verified against md5(sequence) (ContigManager.pm:138-143);
    * rows without one pass.
    */
  def fetchAll(
      refs: DataFrame, uriCol: String, checksumCol: String,
      fetcher: ContigFetcher = StubFetcher): DataFrame = {
    val inSchema = refs.schema
    val uriIdx = inSchema.fieldIndex(uriCol)
    val ckIdx = inSchema.fieldIndex(checksumCol)
    val outSchema = inSchema
      .add("sequence", StringType)
      .add("checksum_ok", BooleanType, nullable = false)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    refs.mapPartitions { rows =>
      // fetcher per task: client/connection setup amortizes here
      rows.map { r =>
        val seq = fetcher.fetch(r.getString(uriIdx))
        val expected = if (r.isNullAt(ckIdx)) null else r.getString(ckIdx)
        val ok = expected == null || expected == md5Hex(seq)
        Row.fromSeq(r.toSeq :+ seq :+ ok)
      }
    }(enc)
  }

  /** Pre-materialize the remote contigs as a local snapshot (the lazy
    * fetch's batch form): fetch, verify, publish atomically. Readers use
    * [[Federation.readDimension]].
    */
  def materialize(
      refs: DataFrame, uriCol: String, checksumCol: String,
      livePath: String, fetcher: ContigFetcher = StubFetcher): Unit =
    Federation.replicateDimension(
      fetchAll(refs, uriCol, checksumCol, fetcher), livePath)

  def read(spark: SparkSession, livePath: String): DataFrame =
    Federation.readDimension(spark, livePath)

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }
}
