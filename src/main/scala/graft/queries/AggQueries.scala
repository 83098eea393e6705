package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2.4 — aggregation surface (A1-A13).
  *
  * Scale notes: every groupBy here is a hash aggregate with map-side partial
  * aggregation (Spark's default), so the shuffle carries pre-reduced keys,
  * not raw rows. Window-based running sums partition by the group key —
  * no global sort, no driver collection.
  */
object AggQueries extends QueryModule {

  // A1: field frequency breakdown (FieldBreakdown.pm:851-1024).
  private val a1Breakdown = Q(
    "a1_breakdown",
    (s, dir) => {
      val o = Tables.load(s, dir, "orders")
      o.groupBy(col("o_orderpriority").as("label"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("label"))
    },
    Some("""SELECT o_orderpriority AS label, count(1) AS n
            FROM orders GROUP BY label ORDER BY label"""))

  // A2: two-field crosstab / contingency table (TwoFieldBreakdown.pm).
  // groupBy + pivot: the Spark-native form of the reference's pair hashes.
  private val a2Crosstab = Q(
    "a2_crosstab",
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      li.groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .count()
        .na.fill(0L)
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag,
                   count(1) FILTER (WHERE l_linestatus = 'F') AS F,
                   count(1) FILTER (WHERE l_linestatus = 'O') AS O
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // A3: designation-count predicates — GROUP BY HAVING count op N, with the
  // zero case unioned in for `<` ops (IsolateQueryPage.pm:3686-3817).
  private val a3CountHaving = Q(
    "a3_count_having",
    (s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val li = Tables.load(s, dir, "lineitem")
      val counts = li.groupBy(col("l_orderkey")).agg(count(lit(1)).as("n_lines"))
      // "< 3" must include the zero case: left join + coalesce
      o.join(counts, o("o_orderkey") === counts("l_orderkey"), "left")
        .withColumn("n_lines", coalesce(col("n_lines"), lit(0L)))
        .filter(col("n_lines") < 3)
        .select(col("o_orderkey"), col("n_lines"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey, coalesce(n_lines, 0) AS n_lines
            FROM orders LEFT JOIN (
              SELECT l_orderkey, count(1) AS n_lines
              FROM lineitem GROUP BY l_orderkey) t ON o_orderkey = l_orderkey
            WHERE coalesce(n_lines, 0) < 3
            ORDER BY o_orderkey"""))

  // A4: scheme completion status — per-isolate COUNT(DISTINCT locus) vs
  // scheme size (sql/isolatedb.sql:1590-1661): complete = all 7 loci present.
  private val a4Completion = Q(
    "a4_completion",
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      li.groupBy(col("l_orderkey"))
        .agg(countDistinct(col("l_linenumber")).as("n_loci"))
        .withColumn("complete", col("n_loci") === 7)
        .orderBy(col("l_orderkey"))
    },
    Some("""SELECT l_orderkey, count(DISTINCT l_linenumber) AS n_loci,
                   count(DISTINCT l_linenumber) = 7 AS complete
            FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey"""))

  // A5: seqbin-stats maintenance aggregate (count + sum per isolate,
  // sql/isolatedb.sql:510-610) — the batch form of the trigger-maintained
  // incremental aggregate (streaming form in graft.streaming).
  private val a5SeqbinStats = Q(
    "a5_seqbin_stats",
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      // lengths are integer-valued: sum/max on BIGINT — exact in any
      // association order, no float round crosses the oracle (§2.18)
      li.groupBy(col("l_orderkey")).agg(
          count(lit(1)).as("contigs"),
          sum(col("l_quantity").cast("long")).as("total_length"),
          max(col("l_quantity").cast("long")).as("max_length"))
        .orderBy(col("l_orderkey"))
    },
    Some("""SELECT l_orderkey, count(1) AS contigs,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
                     AS total_length,
                   CAST(max(CAST(l_quantity AS BIGINT)) AS BIGINT)
                     AS max_length
            FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey"""))

  // A6: N50 — sort lengths desc within group, running sum, first value whose
  // cumulative sum reaches 50% of the total (Utils.pm:873-898). Window-based:
  // no collect, partitions by group key. Here: per returnflag over quantities.
  private val a6N50 = Q(
    "a6_n50",
    (s, dir) => {
      // N50 depends only on cumulative length at quantity-block granularity:
      // the crossing row's quantity equals the crossing BLOCK's quantity
      // (earlier blocks end below half; later rows have smaller quantities).
      // So pre-reduce to one row per (flag, quantity) — a map-side-combined
      // aggregate — and run the window over ~150 rows instead of sorting the
      // whole fact inside 3 partitions (which would not survive scale-up).
      val li = Tables.load(s, dir, "lineitem")
      val blocks = li.groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(sum(col("l_quantity")).as("blocksum"))
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_quantity").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = Window.partitionBy(col("l_returnflag"))
      blocks.withColumn("cum", sum(col("blocksum")).over(w))
        .withColumn("half", sum(col("blocksum")).over(tot) / 2.0)
        .filter(col("cum") >= col("half"))
        .groupBy(col("l_returnflag"))
        // quantities are integer-valued: emit the crossing length as
        // BIGINT — no float round crosses the oracle (§2.18)
        .agg(max(col("l_quantity").cast("long")).as("n50"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag,
                   CAST(max(CAST(l_quantity AS BIGINT)) AS BIGINT) AS n50
            FROM (
              SELECT l_returnflag, l_quantity,
                     sum(l_quantity) OVER (PARTITION BY l_returnflag
                       ORDER BY l_quantity DESC, l_orderkey, l_linenumber
                       ROWS UNBOUNDED PRECEDING) AS cum,
                     sum(l_quantity) OVER (PARTITION BY l_returnflag) / 2.0 AS half
              FROM lineitem) t
            WHERE cum >= half
            GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // A7: basic stats + histogram (Utils.pm:295-333).
  private val a7Stats = Q(
    "a7_stats",
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      // prices are NOT integer-valued, so avg()/stddev_samp() would sum
      // doubles in partition order — exact DECIMAL sums (one per-row
      // rounding, order-free addition) feed the mean and the
      // sum-of-squares sd as deterministic double algebra both engines
      // evaluate identically
      // min/max are raw stored 2-decimal doubles (bit-identical scans,
      // no rounding needed at all); mean/sd are deterministic double
      // algebra over the exact decimal sums, emitted as floor-buckets —
      // never round(double, 4) (§2.18)
      val x = col("l_extendedprice")
      li.groupBy(col("l_returnflag")).agg(
          sum(x.cast("decimal(38,18)")).cast("double").as("__sx"),
          sum((x * x).cast("decimal(38,18)")).cast("double").as("__sxx"),
          count(lit(1)).cast("double").as("__n"),
          min(x).as("min_price"),
          max(x).as("max_price"))
        .select(col("l_returnflag"),
          (floor(col("__sx") / col("__n") * 10000.0) / 10000.0)
            .as("mean_price"),
          (floor(sqrt((col("__sxx") - col("__sx") * col("__sx") / col("__n"))
            / (col("__n") - 1)) * 10000.0) / 10000.0).as("sd_price"),
          col("min_price"), col("max_price"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag,
                   floor(sx / n * 10000.0) / 10000.0 AS mean_price,
                   floor(sqrt((sxx - sx * sx / n) / (n - 1)) * 10000.0)
                     / 10000.0 AS sd_price,
                   min_price, max_price
            FROM (SELECT l_returnflag,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(38,18)))
                     AS DOUBLE) AS sx,
                   CAST(sum(CAST(l_extendedprice * l_extendedprice
                     AS DECIMAL(38,18))) AS DOUBLE) AS sxx,
                   count(*)::DOUBLE AS n,
                   min(l_extendedprice) AS min_price,
                   max(l_extendedprice) AS max_price
                   FROM lineitem GROUP BY l_returnflag)
            ORDER BY l_returnflag"""))

  private val a7Histogram = Q(
    "a7_histogram",
    (s, dir) => {
      val o = Tables.load(s, dir, "orders")
      o.withColumn("bucket", floor(col("o_totalprice") / 50000.0).cast("long"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
        .orderBy(col("bucket"))
    },
    Some("""SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
                   count(1) AS n
            FROM orders GROUP BY bucket ORDER BY bucket"""))

  // A8: unique combination counts (Combinations.pm:137-340).
  private val a8Combinations = Q(
    "a8_combinations",
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      li.groupBy(col("l_returnflag"), col("l_linestatus"),
                 year(col("l_shipdate")).cast("long").as("ship_year"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"), col("ship_year"))
    },
    Some("""SELECT l_returnflag, l_linestatus, year(l_shipdate) AS ship_year,
                   count(1) AS n
            FROM lineitem GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""))

  // A9: dashboard top-N with deterministic tiebreak
  // (conf/dashboard_primary.toml:57-62 top_values).
  private val a9Top5 = Q(
    "a9_top5",
    (s, dir) => {
      val o = Tables.load(s, dir, "orders")
      o.groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
        .orderBy(col("n_orders").desc, col("o_custkey"))
        .limit(5)
    },
    Some("""SELECT o_custkey, count(1) AS n_orders FROM orders
            GROUP BY o_custkey ORDER BY n_orders DESC, o_custkey LIMIT 5"""))

  // A12: growth curve — cumulative count over date (date_entered index
  // pattern, sql/isolatedb.sql:160). Daily counts + running total.
  // A9 widening: the dashboard's multi-level breakdown in ONE pass — a
  // ROLLUP over (nation, segment) yields leaf counts, per-nation
  // subtotals, and the grand total from a single Expand+aggregate (the
  // reference fires one SQL statement per level,
  // lib/BIGSdb/DashboardPage.pm element queries). grouping_id
  // disambiguates levels on both engines (same bitmask convention);
  // the balance sum stays exact DECIMAL until one final cast to double.
  // Null rollup keys order via coalesce (Spark sorts nulls first,
  // DuckDB last — pinned explicitly on both sides).
  private val a9Rollup = Q(
    "a9_rollup",
    (s, dir) => {
      val cust = Tables.load(s, dir, "customer")
      // c_acctbal is a DOUBLE column: quantize to integer cents BEFORE the
      // sum (README float discipline — the sf0.1 stress sweep catches the
      // order-dependent double sum) and divide once at the end
      cust.rollup(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          (sum(round(col("c_acctbal") * 100).cast("long")).cast("double")
            / 100.0).as("bal"),
          grouping_id().cast("long").as("lvl"))
        .orderBy(col("lvl"), coalesce(col("c_nationkey"), lit(-1)),
          coalesce(col("c_mktsegment"), lit("")))
    },
    Some("""SELECT c_nationkey, c_mktsegment,
                   count(1) AS n,
                   CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
                     / 100.0 AS bal,
                   CAST(grouping(c_nationkey, c_mktsegment) AS BIGINT) AS lvl
            FROM customer
            GROUP BY ROLLUP(c_nationkey, c_mktsegment)
            ORDER BY lvl, coalesce(c_nationkey, -1), coalesce(c_mktsegment, '')"""))

  private val a12Growth = Q(
    "a12_growth",
    (s, dir) => {
      val o = Tables.load(s, dir, "orders")
      // `day` as yyyy-MM-dd STRING: DuckDB DATE surfaces as a timestamp in
      // the driver's pandas compare, so a native date column hash-mismatches
      // even when values agree.
      val daily = o.groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n"))
      // running total via the two-phase distributed form, not a global
      // single-partition window (days are bounded, but the pattern is the
      // one that generalizes to unbounded sort keys)
      graft.operators.Numbering.runningBySort(daily, "day", col("n"), "cum_n")
        .orderBy(col("day"))
    },
    Some("""SELECT day, n,
                   CAST(sum(n) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n
            FROM (SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS day,
                         count(1) AS n
                  FROM orders GROUP BY day) t
            ORDER BY day"""))

  // A13 upgrade: approx distinct (HLL) — absent in the reference (exact
  // only); included as the scale path with an exact oracle on a column
  // where HLL is exact at this cardinality is NOT guaranteed, so the
  // declared query uses exact countDistinct and we expose approx in the
  // library (graft.operators.Aggregations).
  private val a13Distinct = Q(
    "a13_distinct",
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
             countDistinct(col("l_suppkey")).as("n_supps"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
                   count(DISTINCT l_suppkey) AS n_supps
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // A13's scale path made oracle-checkable: a HyperLogLog register sketch
  // (m=64) with the repo's portable md5 hash, so BOTH engines build the
  // identical registers and the raw estimate replays bit-for-bit. Dups
  // collapse map-side into (group, register) maxes — the aggregation
  // state is 64 small ints per group no matter the cardinality, and
  // shard sketches merge by register max (the 100 TB property exact
  // countDistinct lacks). The register sum folds in ascending-register
  // order on both engines (dyadic 2^-M terms, deterministic rounding);
  // the small-range linear-counting correction is deliberately NOT
  // applied — it needs ln() and belongs to the consumer (we emit the
  // zero-register count it would use). Exact distinct rides along as the
  // error witness.
  private val a13Hll = Q(
    "a13_hll_distinct",
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val sparse = graft.operators.Hll.registers(
        li, Seq("l_returnflag"), "l_suppkey", 64)
      val est = graft.operators.Hll.estimate(sparse, Seq("l_returnflag"), 64)
        .select(col("l_returnflag"), round(col("hll_raw"), 4).as("hll_est"),
          col("n_zero_regs"))
      val exact = li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_suppkey")).as("n_exact"))
      exact.join(est, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("n_exact"), col("hll_est"),
          col("n_zero_regs"))
        .orderBy(col("l_returnflag"))
    },
    Some("""WITH h AS (SELECT l_returnflag AS rf,
                     ('0x' || substr(md5(CAST(l_suppkey AS VARCHAR)), 1, 15))::BIGINT AS h
                   FROM lineitem),
            r AS (SELECT rf, h % 64 AS j,
                         CASE WHEN h // 64 = 0 THEN 55
                              ELSE 55 - length(bin(h // 64)) END AS rho
                  FROM h),
            mr AS (SELECT rf, j, max(rho) AS m FROM r GROUP BY rf, j),
            g AS (SELECT DISTINCT rf FROM h),
            dense AS (SELECT g.rf, t.j, coalesce(mr.m, 0) AS m
                      FROM g CROSS JOIN range(0, 64) t(j)
                      LEFT JOIN mr ON mr.rf = g.rf AND mr.j = t.j),
            est AS (SELECT rf,
                           list_sum(list(pow(2.0, -m) ORDER BY j)) AS s,
                           sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS zeros
                    FROM dense GROUP BY rf),
            ex AS (SELECT l_returnflag AS rf,
                          count(DISTINCT l_suppkey) AS n_exact
                   FROM lineitem GROUP BY 1)
            SELECT ex.rf AS l_returnflag, CAST(ex.n_exact AS BIGINT) AS n_exact,
                   round(0.709 * 4096.0 / est.s, 4) AS hll_est,
                   CAST(est.zeros AS BIGINT) AS n_zero_regs
            FROM ex JOIN est USING (rf)
            ORDER BY l_returnflag"""))

  // The sketch family's quantile member: a KMV bottom-k sample (k=256) per
  // group over the portable 60-bit md5 hash of l_partkey, carrying
  // l_extendedprice. One combinable typed-Aggregator pass — state is k
  // (hash, value) pairs per group no matter the group size, merged by
  // keep-k-smallest — yielding empirical quartiles of the carried value
  // (integer-rank selection over the hash-uniform sample, no float
  // arithmetic) plus the (k-1)*2^60/h_k distinct estimate (two exact
  // int->double conversions and one division; identical IEEE rounding in
  // DuckDB). Exact distinct rides along as the error witness.
  private val a13Kmv = Q(
    "a13_kmv_quantile",
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      // dedupe (group, hash) FIRST in a native codegen'd aggregation
      // (duplicates collapse map-side), so the sketch udaf sees one row
      // per distinct key and the exact witness is a plain count — no
      // countDistinct Expand doubling rows through the object aggregate
      li.select(col("l_returnflag"),
          graft.operators.Hll.hash60(col("l_partkey")).as("h"),
          col("l_extendedprice").cast("double").as("v"))
        .groupBy(col("l_returnflag"), col("h"))
        .agg(min(col("v")).as("v"))
        .groupBy(col("l_returnflag"))
        .agg(graft.operators.Kmv.agg(col("h"), col("v"), 256).as("sk"),
          count(lit(1)).as("n_exact"))
        .select(col("l_returnflag"), col("sk.sample_size").as("sample_size"),
          col("sk.kth_hash").as("kth_hash"),
          round(col("sk.est_distinct"), 4).as("est_distinct"),
          col("sk.q25").as("q25"), col("sk.q50").as("q50"),
          col("sk.q75").as("q75"), col("n_exact"))
        .orderBy(col("l_returnflag"))
    },
    Some("""WITH h AS (SELECT l_returnflag AS rf,
                   ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15))::BIGINT AS hh,
                   CAST(l_extendedprice AS DOUBLE) AS v
                   FROM lineitem),
            d AS (SELECT rf, hh, min(v) AS v FROM h GROUP BY rf, hh),
            r AS (SELECT rf, hh, v,
                         row_number() OVER (PARTITION BY rf ORDER BY hh) AS rn
                  FROM d),
            s AS (SELECT rf, hh, v FROM r WHERE rn <= 256),
            m AS (SELECT rf, CAST(count(1) AS BIGINT) AS m, max(hh) AS kth
                  FROM s GROUP BY rf),
            q AS (SELECT s.rf, s.v,
                         row_number() OVER (PARTITION BY s.rf
                           ORDER BY s.v, s.hh) AS vr
                  FROM s),
            sel AS (SELECT q.rf,
                           max(CASE WHEN vr = (25 * m.m + 99) // 100 THEN v END) AS q25,
                           max(CASE WHEN vr = (50 * m.m + 99) // 100 THEN v END) AS q50,
                           max(CASE WHEN vr = (75 * m.m + 99) // 100 THEN v END) AS q75
                    FROM q JOIN m ON q.rf = m.rf GROUP BY q.rf),
            ex AS (SELECT rf, CAST(count(DISTINCT hh) AS BIGINT) AS n_exact
                   FROM h GROUP BY rf)
            SELECT m.rf AS l_returnflag, m.m AS sample_size, m.kth AS kth_hash,
                   round(CASE WHEN m.m >= 256 AND m.kth > 0
                              THEN CAST(m.m - 1 AS DOUBLE) * pow(2.0, 60) / CAST(m.kth AS DOUBLE)
                              ELSE CAST(m.m AS DOUBLE) END, 4) AS est_distinct,
                   sel.q25, sel.q50, sel.q75, ex.n_exact
            FROM m JOIN sel ON m.rf = sel.rf JOIN ex ON m.rf = ex.rf
            ORDER BY l_returnflag"""))

  // A6 via the typed Aggregator (§2.12): single-pass N-stats with map-side
  // partial merge — the groupBy-friendly form of a6_n50's window approach.
  private val a6NStatsAgg = Q(
    "a6_nstats_aggregator",
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      li.groupBy(col("l_returnflag"))
        .agg(graft.functions.NStats.agg(
          col("l_quantity").cast("long")).as("st"))
        .select(col("l_returnflag"),
          col("st.contigs").as("contigs"),
          col("st.totalLength").as("total_length"),
          col("st.n50").as("n50"), col("st.l50").as("l50"),
          col("st.n90").as("n90"), col("st.l90").as("l90"))
        .orderBy(col("l_returnflag"))
    },
    Some("""WITH t AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS len
                       FROM lineitem),
            w AS (SELECT l_returnflag, len,
                         sum(len) OVER (PARTITION BY l_returnflag
                           ORDER BY len DESC ROWS UNBOUNDED PRECEDING) AS cum,
                         row_number() OVER (PARTITION BY l_returnflag
                           ORDER BY len DESC) AS rn,
                         sum(len) OVER (PARTITION BY l_returnflag) AS tot
                  FROM t)
            SELECT l_returnflag,
                   count(1) AS contigs, CAST(max(tot) AS BIGINT) AS total_length,
                   max(CASE WHEN cum >= tot * 0.5 THEN len END) AS n50,
                   min(CASE WHEN cum >= tot * 0.5 THEN rn END) AS l50,
                   max(CASE WHEN cum >= tot * 0.9 THEN len END) AS n90,
                   min(CASE WHEN cum >= tot * 0.9 THEN rn END) AS l90
            FROM w GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // SeqbinBreakdown plugin grid (Plugins/SeqbinBreakdown.pm:488-528,674-688):
  // per-isolate contig stats (count/total/min/max/rounded mean/rounded sample
  // stddev) PLUS locus coverage — designated-loci %, tagged-loci % against the
  // 7-locus scheme, 1 dp (decimal_place, :521,:527). ONE pass over the fact:
  // every measure is a map-side-combinable aggregate on the isolate key, so
  // the shuffle carries pre-reduced rows — no per-isolate collect (the
  // reference loops isolates issuing 3 queries each). Cross-engine float
  // discipline: variance from exact integer sums, ONE double division + one
  // correctly-rounded sqrt, so the rounded ints agree bit-for-bit.
  private val seqbinBreakdown = Q(
    "seqbin_breakdown",
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val q = col("l_quantity").cast("long")
      li.groupBy(col("l_orderkey"))
        .agg(
          count(lit(1)).as("contigs"),
          sum(q).as("total_length"),
          min(q).as("min_length"),
          max(q).as("max_length"),
          sum(q * q).as("sumsq"),
          // distinct loci as a BITMASK: the locus domain is 1..7, so
          // bit_or + bit_count replaces COUNT(DISTINCT) — no Expand
          // (multi-distinct triples every input row through the
          // aggregation; the honest bench showed it)
          bit_count(bit_or(expr("shiftleft(1L, l_linenumber)")))
            .cast("long").as("n_designated"),
          bit_count(bit_or(when(col("l_linestatus") === "F",
            expr("shiftleft(1L, l_linenumber)")).otherwise(0L)))
            .cast("long").as("n_tagged"))
        .withColumn("mean_length",
          floor(col("total_length").cast("double") / col("contigs") + 0.5)
            .cast("long"))
        .withColumn("stddev_length",
          when(col("contigs") > 1, floor(sqrt(
            (col("contigs") * col("sumsq")
              - col("total_length") * col("total_length")).cast("double")
              / (col("contigs") * (col("contigs") - 1))) + 0.5).cast("long")))
        .withColumn("pct_designated",
          round(col("n_designated").cast("double") * 100 / 7, 1))
        .withColumn("pct_tagged",
          round(col("n_tagged").cast("double") * 100 / 7, 1))
        .drop("sumsq")
        .orderBy(col("l_orderkey"))
    },
    Some("""SELECT l_orderkey, contigs, total_length, min_length, max_length,
                   n_designated, n_tagged,
                   CAST(floor(CAST(total_length AS DOUBLE) / contigs + 0.5)
                        AS BIGINT) AS mean_length,
                   CASE WHEN contigs > 1 THEN CAST(floor(sqrt(
                     CAST(contigs * sumsq - total_length * total_length
                          AS DOUBLE) / (contigs * (contigs - 1))) + 0.5)
                     AS BIGINT) END AS stddev_length,
                   round(CAST(n_designated AS DOUBLE) * 100 / 7, 1)
                     AS pct_designated,
                   round(CAST(n_tagged AS DOUBLE) * 100 / 7, 1) AS pct_tagged
            FROM (
              SELECT l_orderkey, count(1) AS contigs,
                     CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
                       AS total_length,
                     min(CAST(l_quantity AS BIGINT)) AS min_length,
                     max(CAST(l_quantity AS BIGINT)) AS max_length,
                     CAST(sum(CAST(l_quantity AS BIGINT)
                              * CAST(l_quantity AS BIGINT)) AS BIGINT)
                       AS sumsq,
                     CAST(bit_count(bit_or(1 << l_linenumber)) AS BIGINT)
                       AS n_designated,
                     CAST(bit_count(coalesce(bit_or(CASE
                            WHEN l_linestatus = 'F' THEN 1 << l_linenumber
                            ELSE 0 END), 0)) AS BIGINT) AS n_tagged
              FROM lineitem GROUP BY l_orderkey) t
            ORDER BY l_orderkey"""))

  // Reports plugin datamart row (Plugins/Reports.pm:294-380
  // _get_isolate_data/_get_assembly_details/_get_assembly_checks): the
  // one-row-per-isolate report the PDF templates render — label, assembly
  // stats incl. per-isolate N50/L50, dominant sequencing method (their
  // `method, count(*) ... ORDER BY count DESC` head), check warn/fail
  // counts, scheme completion. The reference issues 4+ queries per isolate
  // from the template loop; here the whole mart is three order-keyed
  // aggregations (main rollup, N50 window over pre-reduced length blocks,
  // method argmax — all map-side combinable) joined once, plus the label
  // dimension join.
  private val reportIsolate = Q(
    "report_isolate",
    (s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val li = Tables.load(s, dir, "lineitem")
      val q = col("l_quantity").cast("long")
      // ONE aggregation carries everything INCLUDING the dominant-method
      // argmax: the typed NStats Aggregator (a6) folds exact N50/L50
      // map-side next to the plain counts, and `mode(col, true)` (Spark's
      // deterministic mode: the LOWEST value among the most frequent —
      // exactly the reference's `count DESC, then lowest status` tie
      // rule) replaces what was previously a second two-stage argmax
      // aggregation and its extra join (r10: the ~1 s of report_isolate's
      // r9 cost those two stages added)
      val main = li.groupBy(col("l_orderkey")).agg(
        graft.functions.NStats.agg(q).as("st"),
        count(when(col("l_returnflag") === "A", 1)).as("n_warn"),
        count(when(col("l_returnflag") === "R", 1)).as("n_fail"),
        // bitmask distinct (locus domain 1..7) — avoids the Expand a
        // COUNT(DISTINCT) would force on every input row
        bit_count(bit_or(expr("shiftleft(1L, l_linenumber)")))
          .cast("long").as("n_loci"),
        mode(col("l_linestatus"), deterministic = true).as("method"))
        .select(col("l_orderkey"),
          col("st.contigs").as("contigs"),
          col("st.totalLength").as("total_length"),
          col("st.n50").as("n50"), col("st.l50").as("l50"),
          col("n_warn"), col("n_fail"), col("n_loci"), col("method"))
      o.join(main, o("o_orderkey") === main("l_orderkey"))
        .select(o("o_orderkey").as("id"),
          col("o_orderpriority").as("label"),
          col("contigs"), col("total_length"), col("n50"), col("l50"),
          col("method"), col("n_warn"), col("n_fail"), col("n_loci"),
          (col("n_loci") === 7).as("complete"))
        .orderBy(col("id"))
    },
    Some("""WITH q AS (SELECT l_orderkey, CAST(l_quantity AS BIGINT) AS len,
                              l_returnflag, l_linestatus, l_linenumber
                       FROM lineitem),
            main AS (
              SELECT l_orderkey, count(1) AS contigs,
                     CAST(sum(len) AS BIGINT) AS total_length,
                     count(CASE WHEN l_returnflag = 'A' THEN 1 END) AS n_warn,
                     count(CASE WHEN l_returnflag = 'R' THEN 1 END) AS n_fail,
                     CAST(bit_count(bit_or(1 << l_linenumber)) AS BIGINT)
                       AS n_loci
              FROM q GROUP BY l_orderkey),
            wnd AS (
              SELECT l_orderkey, len,
                     sum(len) OVER (PARTITION BY l_orderkey
                       ORDER BY len DESC ROWS UNBOUNDED PRECEDING) AS cum,
                     row_number() OVER (PARTITION BY l_orderkey
                       ORDER BY len DESC) AS rn,
                     sum(len) OVER (PARTITION BY l_orderkey) AS tot
              FROM q),
            nstats AS (
              SELECT l_orderkey,
                     max(CASE WHEN cum >= tot * 0.5 THEN len END) AS n50,
                     min(CASE WHEN cum >= tot * 0.5 THEN rn END) AS l50
              FROM wnd GROUP BY l_orderkey),
            mcounts AS (
              SELECT l_orderkey, l_linestatus, count(1) AS cnt
              FROM q GROUP BY l_orderkey, l_linestatus),
            method AS (
              SELECT l_orderkey, l_linestatus AS method FROM (
                SELECT *, row_number() OVER (PARTITION BY l_orderkey
                           ORDER BY cnt DESC, l_linestatus) AS r
                FROM mcounts) t WHERE r = 1)
            SELECT o_orderkey AS id, o_orderpriority AS label,
                   contigs, total_length, n50, l50, method,
                   n_warn, n_fail, n_loci, n_loci = 7 AS complete
            FROM orders
            JOIN main ON o_orderkey = main.l_orderkey
            JOIN nstats ON main.l_orderkey = nstats.l_orderkey
            JOIN method ON main.l_orderkey = method.l_orderkey
            ORDER BY id"""))

  // EXACT per-group median + p90 without any per-row sort: for a
  // bounded-domain measure (l_quantity: integers 1..50) the scalable
  // exact form is a VALUE HISTOGRAM — one map-side-combinable count on
  // (group, value), then a cumulative walk over the ≤50-row dimension
  // per group (partitioned window over the histogram, never the rows).
  // Lower median = first value with cum ≥ (n+1) div 2; p90 = first with
  // cum ≥ ceil(9n/10), i.e. 10·cum ≥ 9n for integer cum — all integer
  // arithmetic (nearest-rank definition, defined for every n ≥ 1), the
  // complement to the KMV approximate quantiles (a13_kmv_quantile) when
  // the domain is enumerable. At 100 TB the shuffle carries one row per
  // (group, distinct value) per task.
  private val aggMedianExact = Q(
    "agg_median_exact",
    (s, dir) => {
      // the histogram walk lives in operators.ExactQuantiles so
      // HandComputedAggSpec can pin the PRODUCTION formula against
      // literal hand-worked fixtures (the r10 p90 bug survived the
      // DuckDB compare because engine and oracle shared the formula)
      val li = Tables.load(s, dir, "lineitem")
      graft.operators.ExactQuantiles.medianP90ByHistogram(
          li, col("l_returnflag"), col("l_quantity"))
        .select(col("grp").as("l_returnflag"), col("n_rows"),
          col("median_v").as("median_qty"), col("p90_v").as("p90_qty"))
        .orderBy(col("l_returnflag"))
    },
    Some("""WITH h AS (
              SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty,
                     count(1) AS c
              FROM lineitem GROUP BY 1, 2),
            w AS (
              SELECT l_returnflag, qty, c,
                     sum(c) OVER (PARTITION BY l_returnflag ORDER BY qty
                       ROWS UNBOUNDED PRECEDING) AS cum,
                     sum(c) OVER (PARTITION BY l_returnflag) AS n
              FROM h)
            SELECT l_returnflag, CAST(max(n) AS BIGINT) AS n_rows,
                   CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN qty END)
                     AS BIGINT) AS median_qty,
                   CAST(min(CASE WHEN cum * 10 >= n * 9 THEN qty END)
                     AS BIGINT) AS p90_qty
            FROM w GROUP BY l_returnflag ORDER BY l_returnflag"""))

  val qs: Seq[Q] = Seq(
    a1Breakdown, a2Crosstab, a3CountHaving, a4Completion, a5SeqbinStats,
    a6N50, a6NStatsAgg, a7Stats, a7Histogram, a8Combinations, a9Top5,
    a9Rollup, a12Growth, a13Distinct, a13Hll, a13Kmv, seqbinBreakdown,
    reportIsolate, aggMedianExact)
}
