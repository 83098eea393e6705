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

  /** The REAL transport (lib/BIGSdb/ContigManager.pm:119-215, the
    * unauthenticated path): GET the contig URI (appending `?no_loci=1`
    * when no query string, ContigManager.pm:122-124), parse the JSON
    * record's `sequence` field, and fail loudly on an empty sequence
    * (ContigManager.pm:129-131). Retry semantics mirror
    * `_get_remote_record` (ContigManager.pm:196-204): up to
    * `maxAttempts` tries, stopping immediately on success OR on a
    * definitive 401/404, sleeping `retryDelayMs` between other failures
    * (transport errors, 5xx).
    *
    * NOT the default — the sandbox has no egress, so [[StubFetcher]]
    * ships as the default and this class is exercised against an
    * in-process HTTP fixture server in SourcesSpec. One instance per
    * task via [[fetchAll]]'s mapPartitions; md5-checksum verification
    * stays in [[fetchAll]], shared with every other fetcher.
    */
  final case class HttpFetcher(
      maxAttempts: Int = 5,
      retryDelayMs: Long = 1000L) extends ContigFetcher {
    def fetch(uri: String): String = {
      val full = if (uri.contains("?")) uri else uri + "?no_loci=1"
      var attempt = 0
      var last: Either[(Int, String), String] = Left((-1, "not attempted"))
      var done = false
      while (!done && attempt < maxAttempts) {
        attempt += 1
        last = tryOnce(full)
        done = last match {
          case Right(_) => true
          case Left((code, _)) if code == 401 || code == 404 => true
          case _ =>
            if (attempt < maxAttempts) Thread.sleep(retryDelayMs)
            false
        }
      }
      last match {
        case Right(body) => parseSequence(body, full)
        case Left((code, msg)) => throw new java.io.IOException(
          s"GET $full failed after $attempt attempt(s): $code $msg")
      }
    }

    private def tryOnce(uri: String): Either[(Int, String), String] = {
      val conn = java.net.URI.create(uri).toURL.openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestProperty("User-Agent", "graft")
      conn.setConnectTimeout(10000)
      conn.setReadTimeout(30000)
      try {
        val code = conn.getResponseCode
        if (code >= 200 && code < 300)
          Right(new String(conn.getInputStream.readAllBytes(), "UTF-8"))
        else Left((code, Option(conn.getResponseMessage).getOrElse("")))
      } catch {
        case e: java.io.IOException => Left((-1, String.valueOf(e.getMessage)))
      } finally conn.disconnect()
    }

    private def parseSequence(body: String, uri: String): String = {
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
      val s = node.get("sequence")
      require(s != null && s.asText.nonEmpty, s"Contig from $uri has no sequence")
      s.asText
    }
  }

  /** Deterministic offline stand-in for the HTTP client: sequence derived
    * from the URI alone. STUB — swap for [[HttpFetcher]] without touching
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
