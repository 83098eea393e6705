package graft

import graft.streaming.CacheStream
import org.apache.spark.sql.functions._

/** §7.1(7) — the streaming scheme-field cache refresh: a MemoryStream of
  * designation rows driven through CacheStream.maintain (foreachBatch
  * MERGE + versioned-snapshot publish) must converge to exactly the
  * batch fold (the cache_stream_merge query shape) and the full rebuild,
  * and every intermediate published snapshot must be a complete additive
  * prefix — the reference's trigger-maintained cache invariant under the
  * rename-swap atomicity property (update_scheme_caches.pl incremental
  * mode, Datastore.pm:2165-2172).
  */
class CacheStreamSpec extends SparkSpec {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import spark.implicits._

  private def agg(d: org.apache.spark.sql.DataFrame) =
    d.groupBy(col("iso"))
      .agg(count(lit(1)).as("n"), sum(col("len").cast("long")).as("total"))

  test("MemoryStream-driven foreachBatch MERGE converges to the batch " +
      "fold and the full rebuild") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val b1 = Seq((1L, 10L), (1L, 20L), (2L, 5L))
    val b2 = Seq((2L, 7L), (3L, 1L))
    val b3 = Seq((1L, 2L), (3L, 4L), (3L, 8L))
    val live = java.nio.file.Files.createTempDirectory("graft-cstream")
      .toString + "/cache"

    val stream = MemoryStream[(Long, Long)]
    val q = CacheStream.maintain(
      stream.toDS().toDF("iso", "len"), "iso", agg, live)
    try {
      Seq(b1, b2, b3).foreach { b =>
        stream.addData(b: _*); q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = graft.sources.Federation.readDimension(spark, live)
    // batch fold of the same chunks (the cache_stream_merge shape)
    val folded = Seq(b1, b2, b3)
      .map(b => agg(b.toDF("iso", "len")))
      .reduce(CacheStream.mergeAdditive(_, _, "iso"))
    // full rebuild (the oracle shape)
    val full = agg((b1 ++ b2 ++ b3).toDF("iso", "len"))

    def rowsOf(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("iso").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rowsOf(streamed) == rowsOf(full),
      "stream must converge to the full rebuild")
    assert(rowsOf(folded) == rowsOf(full),
      "batch fold must equal the full rebuild")
  }

  test("each published snapshot is the complete additive prefix of the " +
      "stream (never partial)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val batches = Seq(
      Seq((1L, 3L), (2L, 4L)),
      Seq((1L, 5L)),
      Seq((2L, 6L), (3L, 7L)))
    val live = java.nio.file.Files.createTempDirectory("graft-cstream2")
      .toString + "/cache"
    val stream = MemoryStream[(Long, Long)]
    val q = CacheStream.maintain(
      stream.toDS().toDF("iso", "len"), "iso", agg, live)
    try {
      batches.zipWithIndex.foreach { case (b, i) =>
        stream.addData(b: _*); q.processAllAvailable()
        val snap = graft.sources.Federation.readDimension(spark, live)
        val prefix = agg(batches.take(i + 1).flatten.toDF("iso", "len"))
        assert(snap.exceptAll(prefix).isEmpty &&
          prefix.exceptAll(snap).isEmpty,
          s"snapshot after batch $i must equal the prefix rebuild")
      }
    } finally q.stop()
  }
}
