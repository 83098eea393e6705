package graft

import graft.pipeline.{IndexStore, Similarity}
import graft.streaming.IndexStream
import org.apache.spark.sql.functions._

/** Streaming IVF-index maintenance (IndexStream): vectors arriving as
  * micro-batches through maintain() must grow the persisted index to
  * EXACTLY the state of (a) the batch fold of appendBatch calls and
  * (b) the one-shot ivfAppendTopK over base ∪ delta — frozen cells +
  * append-only rows make arrival order irrelevant. Replays are skipped
  * via the in-version batch marker (the CacheStream exactly-once
  * contract).
  */
class IndexStreamSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  private def vecs(ids: Seq[Long], seed: Int) = {
    val rnd = new scala.util.Random(seed)
    val all = (0 until 300).map(_ =>
      Seq.fill(8)(rnd.nextInt(2000) / 1000.0 - 1.0))
    ids.map(i => (i, all(i.toInt % 300))).toDF("vec_id", "embedding")
  }

  test("MemoryStream-maintained index == batch fold == direct " +
      "ivfAppendTopK") {
    val baseIds = (100L to 219L)
    val deltaIds = (0L to 29L)
    val base = vecs(baseIds, seed = 3)
    val delta = vecs(deltaIds, seed = 3)
    val queries = vecs(0L to 4L, seed = 3)
    val chunks = deltaIds.grouped(10).toSeq

    // streaming path
    val liveS = java.nio.file.Files.createTempDirectory("graft-ivfs")
      .toString + "/ivf"
    IndexStore.saveIvf(base, "vec_id", "embedding", nlist = 6, liveS)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, Seq[Double])]
    val q = IndexStream.maintain(
      stream.toDS().toDF("vec_id", "embedding"), "vec_id", "embedding",
      liveS)
    try {
      chunks.foreach { c =>
        stream.addData(c.map(i => (i,
          vecs(Seq(i), seed = 3).as[(Long, Seq[Double])].collect().head._2)): _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    // batch-fold path (the stream_ivf_maintain query shape)
    val liveF = java.nio.file.Files.createTempDirectory("graft-ivff")
      .toString + "/ivf"
    IndexStore.saveIvf(base, "vec_id", "embedding", nlist = 6, liveF)
    chunks.foreach(c => IndexStream.appendBatch(
      vecs(c, seed = 3), "vec_id", "embedding", liveF))

    def serve(p: String) = IndexStore.queryIvf(spark, p, queries,
        "vec_id", "embedding", k = 4, nprobe = 3)
      .as[(Long, Long, Double, Long)].collect().toSeq.sorted
    val streamed = serve(liveS)
    val folded = serve(liveF)
    val direct = Similarity.ivfAppendTopK(base, delta, queries,
        "vec_id", "embedding", k = 4, nlist = 6, nprobe = 3)
      .as[(Long, Long, Double, Long)].collect().toSeq.sorted
    assert(streamed == folded, "stream must equal the batch fold")
    assert(folded == direct, "fold must equal one-shot ivfAppendTopK")
    assert(streamed.nonEmpty)
    // appended vectors are FINDABLE: some query's neighbor is a delta id
    assert(streamed.exists { case (_, nb, _, _) => nb < 30L },
      "appended vectors must appear among neighbors")
  }

  test("restart from the checkpoint neither re-appends nor skips") {
    val base = vecs(100L to 179L, seed = 5)
    val live = java.nio.file.Files.createTempDirectory("graft-ivfr")
      .toString + "/ivf"
    IndexStore.saveIvf(base, "vec_id", "embedding", nlist = 4, live)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val s1 = MemoryStream[(Long, Seq[Double])]
    val q1 = IndexStream.maintain(
      s1.toDS().toDF("vec_id", "embedding"), "vec_id", "embedding", live)
    try {
      s1.addData((1L, Seq.fill(8)(0.5)), (2L, Seq.fill(8)(-0.25)))
      q1.processAllAvailable()
    } finally q1.stop()
    val q2 = IndexStream.maintain(
      s1.toDS().toDF("vec_id", "embedding"), "vec_id", "embedding", live)
    try {
      s1.addData((3L, Seq.fill(8)(0.125)))
      q2.processAllAvailable()
    } finally q2.stop()
    val (_, assigned) = IndexStore.loadIvf(spark, live)
    val deltaRows = assigned.filter(col("neighbor_id") < 100L)
      .select("neighbor_id").as[Long].collect().toSeq.sorted
    assert(deltaRows == Seq(1L, 2L, 3L),
      s"each appended vector must appear exactly once, got $deltaRows")
  }
}
