package graft

import graft.streaming.IntervalJoin
import org.apache.spark.sql.functions._

/** Pins the batch interval join against (a) an in-memory reference and
  * (b) Spark's REAL watermarked stream-stream join — same key equi-
  * condition, same (lTs, lTs+horizon] range — proving the query-layer
  * batch declaration (stream_interval_join) is the streaming operator's
  * semantics, not an approximation of them.
  */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private val minute = 60000000L
  private val base = 86400L * 1000000L // see StreamingSpec: never epoch 0

  // (user, id, us): user 1 has a view with two in-horizon clicks, one
  // boundary-exact click (== lTs + horizon, INCLUDED), one too-late
  // click and one click BEFORE the view (both excluded); user 2's click
  // has no view; user 3 has two views sharing one click (both pair)
  private val horizon = 30L * minute
  private val views = Seq(
    (1L, 10L, base + 0L * minute),
    (3L, 30L, base + 0L * minute),
    (3L, 31L, base + 5L * minute))
  private val clicks = Seq(
    (1L, 110L, base + 1L * minute),
    (1L, 111L, base + 29L * minute),
    (1L, 112L, base + 30L * minute), // == horizon boundary: in
    (1L, 113L, base + 31L * minute), // past horizon: out
    (1L, 114L, base - 1L * minute),  // before the view: out
    (2L, 120L, base + 2L * minute),
    (3L, 130L, base + 6L * minute))

  private def expectedPairs: Set[(Long, Long, Long)] =
    (for {
      (u, v, vt) <- views
      (u2, c, ct) <- clicks
      if u == u2 && ct > vt && ct <= vt + horizon
    } yield (u, v, c)).toSet

  test("batch within == in-memory reference, boundary inclusive") {
    val vdf = views.toDF("user_id", "view_id", "v_us")
    val cdf = clicks.toDF("user_id", "click_id", "c_us")
    val got = IntervalJoin.within(vdf, cdf, Seq("user_id"),
        "v_us", "c_us", horizon)
      .select("user_id", "view_id", "click_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expectedPairs)
    assert(got.contains((1L, 10L, 112L)), "boundary click must be included")
    assert(!got.exists(_._3 == 113L) && !got.exists(_._3 == 114L))
  }

  test("watermarked stream-stream join emits exactly the batch pairs") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val vIn = MemoryStream[(Long, Long, Long)]
    val cIn = MemoryStream[(Long, Long, Long)]
    val v = vIn.toDF.toDF("user_id", "view_id", "v_us")
      .withColumn("v_ts", timestamp_micros(col("v_us")))
      .withWatermark("v_ts", "0 seconds")
    val c = cIn.toDF.toDF("c_user_id", "click_id", "c_us")
      .withColumn("c_ts", timestamp_micros(col("c_us")))
      .withWatermark("c_ts", "0 seconds")
    val joined = v.join(c,
      expr("user_id = c_user_id AND " +
        "c_ts > v_ts AND c_ts <= v_ts + interval 30 minutes"))
      .select(col("user_id"), col("view_id"), col("click_id"))
    val q = joined.writeStream.format("memory")
      .queryName("interval_join_sink").outputMode("append").start()
    try {
      vIn.addData(views: _*)
      cIn.addData(clicks: _*)
      q.processAllAvailable()
      // advance both watermarks far past the horizon so state flushes
      vIn.addData((99L, 999L, base + 100000L * minute))
      cIn.addData((99L, 998L, base + 100000L * minute))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("interval_join_sink")
      .filter(col("user_id") < 90)
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed == expectedPairs)
  }
}
