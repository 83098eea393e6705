package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation join (builder-prompt scale tooling: "skewed keys →
  * salting or AQE skew-join").
  *
  * AQE's skew-join handles sort-merge skew automatically; salting is the
  * explicit fallback for hash-aggregations and joins where one hot key
  * (think: the '0' missing-allele designation, or a boilerplate dedup
  * shingle) swamps a single reducer. The fact side gets a deterministic
  * salt in [0, factor); the dimension side is exploded once per salt
  * value, so the hot key's rows spread over `factor` reducers and the join
  * result is IDENTICAL to the unsalted join (spec-verified).
  */
object Skew {

  /** Equi join `large ⋈ small` on `key`, with the large side salted.
    * `factor` ≈ number of reducers a hot key should spread across.
    * Salt is derived from a stable row fingerprint (xxhash64 of all large
    * columns), not rand() — deterministic re-runs, no resampling on retry.
    */
  def saltedJoin(
      large: DataFrame, small: DataFrame, key: String,
      factor: Int, joinType: String = "inner"): DataFrame = {
    // Only large-side-preserving types are correct: the small side is
    // exploded once per salt value, so right/full outer would emit each
    // unmatched small-side row `factor` times.
    val allowed = Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti",
      "cross")
    require(allowed(joinType.toLowerCase),
      s"saltedJoin: joinType '$joinType' would duplicate unmatched small-side " +
        s"rows ${factor}x; use one of ${allowed.mkString(", ")}")
    val salted = large.withColumn("__salt",
      pmod(xxhash64(large.columns.map(col).toSeq: _*), lit(factor)).cast("int"))
    val exploded = small
      .withColumn("__salt", explode(sequence(lit(0), lit(factor - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    salted.join(exploded, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Salted two-phase aggregation: count per key with a hot-key-proof
    * first phase — partial counts per (key, salt), then final combine per
    * key. Same result as groupBy(key).count(), but the first shuffle
    * spreads each key over `factor` partitions.
    */
  def saltedCount(df: DataFrame, key: String, factor: Int): DataFrame =
    df.withColumn("__salt",
        pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(factor)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("n"))
}
