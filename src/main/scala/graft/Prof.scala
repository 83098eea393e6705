package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Temporary r10 profiling main (not part of the library surface):
// prefix-join scale anatomy. Deleted before round close.
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $tag%-36s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    for (dir <- Seq("/root/testdata/sf0.1", "/tmp/sfx10", "/tmp/sfx100")) {
      println(s"=== $dir")
      val docs = Tables.load(spark, dir, "documents")
      docs.count()
      // mirror the dedup_prefix_join query's tokenization + t
      val tb = 2000
      def ceilBp(n: org.apache.spark.sql.Column) =
        floor((n * tb + 9999) / 10000).cast("long")
      val tok = docs.select(col("doc_id").as("__id"),
          array_distinct(graft.pipeline.Dedup.shingles(col("text"), 3)).as("__raw"))
        .filter(size(col("__raw")) > 0)
      val ex = tok.select(col("__id"), explode(col("__raw")).as("__t"))
      val freq = ex.groupBy(col("__t")).agg(count(lit(1)).as("__f"))
      val ordered = time("ordered dim build")(
        graft.operators.Pinning.pin(ex.join(freq, "__t")
          .groupBy(col("__id"))
          .agg(sort_array(collect_list(struct(col("__f"), col("__t")))).as("__st"))
          .select(col("__id"),
            transform(col("__st"), x => x.getField("__t")).as("__ts"))
          .withColumn("__n", size(col("__ts")).cast("long"))
          .withColumn("__p", (col("__n") - ceilBp(col("__n")) + 1).cast("int"))))
      val prefix = ordered.select(col("__id"), col("__n"),
          posexplode(slice(col("__ts"), lit(1), col("__p"))).as(Seq("__i", "__t")))
        .select(col("__id"), col("__n"), (col("__i") + 1).cast("long").as("__pp"),
          col("__t"))
      println("prefix rows = " + time("prefix explode")(prefix.count()))
      val alpha = floor((lit(tb) * (col("__n1") + col("__n2")) + (10000 + tb - 1))
        / (10000 + tb)).cast("long")
      val raw = prefix.select(col("__id").as("id1"), col("__n").as("__n1"),
          col("__pp").as("__p1"), col("__t"))
        .join(prefix.select(col("__id").as("id2"), col("__n").as("__n2"),
          col("__pp").as("__p2"), col("__t")), "__t")
        .filter(col("id1") < col("id2"))
      println("raw collision rows = " + time("collision join")(raw.count()))
      val cands = raw
        .filter(least(col("__n1"), col("__n2")) >=
          ceilBp(greatest(col("__n1"), col("__n2"))))
        .filter(least(col("__p1"), col("__p2")) +
          least(col("__n1") - col("__p1"), col("__n2") - col("__p2")) >= alpha)
        .select(col("id1"), col("id2")).distinct()
      println("cand pairs = " + time("cand distinct")(cands.count()))
      val pairs = time("full prefixFilterPairs")(
        graft.pipeline.Dedup.prefixFilterPairs(docs, "doc_id",
          graft.pipeline.Dedup.shingles(col("text"), 3), t = 0.2))
      println("result pairs = " + pairs.count())
      graft.operators.Pinning.unpin(ordered)
      graft.operators.Pinning.unpin(pairs)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
