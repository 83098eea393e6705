package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Genome Comparator analysis family (reference:
  * `lib/BIGSdb/Plugins/GenomeComparator.pm`): whole-genome MLST comparison
  * of a selected isolate set — a dense per-isolate×locus status matrix,
  * allelic-difference distance matrix with missing/incomplete handling
  * options, unique-strain grouping, paralogy counts, and core-genome
  * presence analysis.
  *
  * Status encoding follows the reference's output marks
  * (`GenomeComparator.pm:888-891`): the designated allele id as text, `X`
  * for a locus with no designation ("missing"), `I` for a designation
  * whose best hit is incomplete (runs off the contig end).
  *
  * Scale posture (100 TB): the status matrix is ONE map-side-combinable
  * aggregation over the designation fact plus a narrow per-isolate
  * densify (explode of a literal locus range — no grid join, no second
  * shuffle). Unique strains and core analysis are single hash
  * aggregations. The pairwise distance matrix is inherently O(n²) in its
  * OUTPUT (the reference emits the full lower triangle,
  * `GenomeComparator.pm:1446-1496`), so n is bounded by the user's
  * selection; for corpus-wide similarity at scale the bucketed
  * explode/equi-join path (`Profiles.similarityJoin`, `g1_distance_matrix`)
  * is the right tool — this operator is the faithful selected-set analysis.
  */
object GenomeComparator {

  val Missing = "X"
  val Incomplete = "I"

  /** Dense status matrix: one row per (entity, locus) for locus 1..nLoci.
    *
    * `allele` must be a text column (allele ids are text in the reference,
    * `sql/isolatedb.sql:727`); the chosen designation per (entity, locus)
    * is the lexicographically smallest allele (the established warehouse
    * convention), and it is flagged incomplete when ANY designation row
    * carrying that allele is flagged (`incomplete`).
    */
  def statusMatrix(
      designations: DataFrame,
      entityCol: String,
      locusCol: String,
      allele: Column,
      incomplete: Column,
      nLoci: Int): DataFrame = {
    val perAllele = designations
      .select(col(entityCol).as("_e"), col(locusCol).as("_l"),
        allele.as("_a"), incomplete.as("_inc"))
      .groupBy(col("_e"), col("_l"), col("_a"))
      .agg(max(col("_inc")).as("_ainc"))
    // _a is unique per group here, so min_by is deterministic
    val chosen = perAllele.groupBy(col("_e"), col("_l"))
      .agg(min(col("_a")).as("_a"), min_by(col("_ainc"), col("_a")).as("_inc"))
    // densify: every selected entity × locus 1..nLoci — a narrow explode
    // of a literal sequence, NOT a grid join
    val grid = designations.select(col(entityCol).as("_e")).distinct()
      .select(col("_e"),
        explode(sequence(lit(1), lit(nLoci))).as("_l"))
    grid.join(chosen, Seq("_e", "_l"), "left")
      .select(col("_e").as(entityCol), col("_l").as(locusCol),
        when(col("_a").isNull, lit(Missing))
          .when(col("_inc"), lit(Incomplete))
          .otherwise(col("_a")).as("status"))
  }

  /** Locus-ordered status profile per entity: (entity, profile array). */
  def statusProfiles(
      status: DataFrame, entityCol: String, locusCol: String): DataFrame =
    status.groupBy(col(entityCol))
      .agg(transform(
        sort_array(collect_list(struct(col(locusCol), col("status")))),
        x => x.getField("status")).as("profile"))

  /** Pairwise allelic-difference distance matrix over a bounded selection
    * (`GenomeComparator.pm` XS `count_differences`, lines 72-116):
    *   - `excludeMissingPairwise`: skip loci where either side is missing
    *   - `truncatedPairwiseSame` ("pairwise_same" incomplete handling): a
    *     difference involving an incomplete allele on exactly one side —
    *     with a real allele on the other — does NOT count (incomplete vs
    *     missing still counts; so does real vs real)
    *
    * Emits (src, dst, distance) for src < dst. The per-pair fold runs as
    * codegen'd array HOFs — no per-locus explode, no shuffle beyond the
    * pair join itself.
    */
  def distanceMatrix(
      status: DataFrame,
      entityCol: String,
      locusCol: String,
      excludeMissingPairwise: Boolean,
      truncatedPairwiseSame: Boolean,
      maxRecords: Int = 1000): DataFrame = {
    // The pair join's OUTPUT is O(n²) by definition (the reference emits
    // the full lower triangle), so n must be a bounded user selection —
    // the reference enforces MAX_GENOMES=1000 (GenomeComparator.pm:46).
    // Materialize the ≤maxRecords profiles ONCE (capped fetch, so an
    // over-sized selection fails after maxRecords+1 rows, not a full
    // count) and re-inline them as a LOCAL relation: the aggregation
    // runs exactly once, there is no cache handle to leak in a
    // long-lived session, and both sides of the pair join broadcast
    // naturally. Corpus-scale similarity is Profiles.similarityJoin
    // (g1_distance_matrix).
    val profPlan = statusProfiles(status, entityCol, locusCol)
    val collected = profPlan.limit(maxRecords + 1).collect()
    require(collected.length <= maxRecords,
      s"distance matrix selection exceeds cap $maxRecords (reference " +
        "MAX_GENOMES) — use the bucketed similarity join for " +
        "corpus-scale work")
    val prof = profPlan.sparkSession.createDataFrame(
      java.util.Arrays.asList(collected: _*), profPlan.schema)
    val x = prof.select(col(entityCol).as("src"), col("profile").as("_px"))
    val y = prof.select(col(entityCol).as("dst"), col("profile").as("_py"))
    def contrib(a: Column, b: Column): Column = {
      val base =
        if (excludeMissingPairwise)
          a =!= Missing && b =!= Missing && a =!= b
        else a =!= b
      val counted =
        if (truncatedPairwiseSame)
          base && ((a === Incomplete && b === Missing) ||
            (a === Missing && b === Incomplete) ||
            (a =!= Incomplete && b =!= Incomplete))
        else base
      when(counted, lit(1)).otherwise(lit(0))
    }
    x.join(y, col("src") < col("dst"))
      .select(col("src"), col("dst"),
        aggregate(zip_with(col("_px"), col("_py"), contrib),
          lit(0), (acc, v) => acc + v).as("distance"))
  }

  /** Unique-strain grouping (`GenomeComparator.pm:2444-2463`): isolates
    * keyed by md5 of the locus-ordered status profile joined with `|`
    * (trailing separator included, as the reference builds it). Returns
    * (strain, n, min_member, members-sorted).
    */
  def uniqueStrains(
      status: DataFrame, entityCol: String, locusCol: String): DataFrame =
    statusProfiles(status, entityCol, locusCol)
      .select(col(entityCol),
        md5(concat(concat_ws("|", col("profile")), lit("|"))).as("strain"))
      .groupBy(col("strain"))
      .agg(count(lit(1)).as("n"),
        min(col(entityCol)).as("min_member"),
        sort_array(collect_list(col(entityCol))).as("members"))

  /** Potentially paralogous loci (`GenomeComparator.pm:2465-2477`): per
    * locus, the number of entities holding more than one distinct
    * designation there. One aggregation pair over the fact.
    */
  def paralogousLoci(
      designations: DataFrame,
      entityCol: String,
      locusCol: String,
      allele: Column): DataFrame =
    designations
      .select(col(entityCol).as("_e"), col(locusCol).as("_l"), allele.as("_a"))
      .groupBy(col("_e"), col("_l"))
      .agg(count_distinct(col("_a")).as("_k"))
      .filter(col("_k") > 1)
      .groupBy(col("_l").as(locusCol))
      .agg(count(lit(1)).as("n_paralogous"))

  /** Core-genome presence analysis (`GenomeComparator.pm:2534-2674`): per
    * locus, how many of the selected entities carry a designation, the
    * presence fraction, and whether the locus clears the core threshold
    * (reference default 90%, `GenomeComparator.pm:575-610`).
    */
  def coreAnalysis(
      status: DataFrame,
      entityCol: String,
      locusCol: String,
      coreThreshold: Double): DataFrame = {
    // denominator as a broadcast one-row join, not a driver action — the
    // status input is computed exactly once either way, and the plan stays
    // fully lazy/distributed
    val totals = status.agg(
      count_distinct(col(entityCol)).cast("double").as("_total"))
    status.groupBy(col(locusCol))
      .agg(sum(when(col("status") =!= Missing, 1).otherwise(0)).as("present"))
      .crossJoin(broadcast(totals))
      .select(col(locusCol), col("present"),
        round(col("present").cast("double") / col("_total"), 4)
          .as("presence_frac"),
        (col("present").cast("double") / col("_total") >=
          lit(coreThreshold)).as("in_core"))
  }
}
