package graft

import graft.streaming.StreamingNearDup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Online LSH near-dup: pairs surface as documents arrive, across
  * micro-batches, against bucket state — no batch re-join.
  */
class StreamingNearDupSpec extends SparkSpec {
  import spark.implicits._

  test("near-dup pair emitted when the second doc arrives; distinct docs silent") {
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog and keeps running " +
      "through the green field toward the distant river bank every single morning"
    val nearDup = base.replace("green", "wide")
    val distinct = "completely unrelated text about spark catalyst optimizer " +
      "rules and whole stage code generation for columnar execution engines"
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val stream = MemoryStream[(Long, java.sql.Timestamp, String)]
    val docs = stream.toDS().toDF("doc_id", "ts", "text")
    val q = StreamingNearDup.candidates(docs, "doc_id", "text", "ts", "10 minutes",
        shingleN = 2, k = 64, bands = 32, minEstJaccard = 0.3)
      .writeStream.outputMode("append").format("memory")
      .queryName("neardup_stream").start()
    try {
      stream.addData((1L, ts, base), (3L, ts, distinct))
      q.processAllAvailable()
      val afterFirst = spark.table("neardup_stream").count()
      assert(afterFirst == 0, "no pairs before the near-dup arrives")
      // near-dup arrives in a LATER micro-batch: must match bucket state
      stream.addData((2L, new java.sql.Timestamp(ts.getTime + 60000), nearDup))
      q.processAllAvailable()
      val pairs = spark.table("neardup_stream")
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      assert(pairs == Set((1L, 2L)), s"got $pairs")
      val est = spark.table("neardup_stream")
        .select("est_jaccard").as[Double].collect().max
      assert(est >= 0.3)
    } finally q.stop()
  }
}
