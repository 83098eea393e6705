package graft

import graft.sources.Federation
import org.apache.spark.sql.functions._

class FederationSpec extends SparkSpec {
  import spark.implicits._

  private def tmpLive(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-fed").toString
    s"$d/$name"
  }

  test("replicateDimension publishes atomically and readers see full snapshots") {
    val live = tmpLive("dim")
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    Federation.replicateDimension(v1, live)
    val r1 = Federation.readDimension(spark, live)
    assert(rows(r1.orderBy("id")) == Seq(Seq(1L, "a"), Seq(2L, "b")))

    // second replication cycle: pointer advances, readers see the new
    // snapshot; content replaced wholesale (snapshot, not merge)
    val v2 = Seq((1L, "a2"), (3L, "c")).toDF("id", "v")
    Federation.replicateDimension(v2, live)
    val r2 = Federation.readDimension(spark, live)
    assert(rows(r2.orderBy("id")) == Seq(Seq(1L, "a2"), Seq(3L, "c")))
  }

  test("schemeDimension carries st (min entity), profile and missing_loci") {
    val wh = Seq(
      (10L, Seq("1", "2", "0"), "m1"),
      (11L, Seq("1", "2", "0"), "m1"),
      (12L, Seq("0", "0", "5"), "m2"))
      .toDF("iso", "profile", "profile_md5")
    val dim = Federation.schemeDimension(wh, "iso")
      .orderBy("st")
      .select("st", "missing_loci")
    assert(rows(dim) == Seq(Seq(10L, 1), Seq(12L, 2)))
  }
}
