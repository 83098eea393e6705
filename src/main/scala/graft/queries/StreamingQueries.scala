package graft.queries

import graft.Tables
import graft.streaming.IncrementalStats
import org.apache.spark.sql.functions._

/** SURVEY §2.11 — incremental aggregate maintenance re-expressed as
  * Structured Streaming. The batch path below runs the SAME aggregation
  * definition the streaming path uses (IncrementalStats), so the oracle
  * validates both; StreamingSpec replays the table through readStream and
  * diffs against this batch result.
  */
object StreamingQueries extends QueryModule {

  // seqbin_stats-shaped per-key aggregate (sql/isolatedb.sql:522-610):
  // count + sum + max per isolate, maintained incrementally in the ref.
  private val eventStats = Q(
    "stream_event_stats",
    (s, dir) => {
      val events = Tables.load(s, dir, "events")
      IncrementalStats.eventStats(events).orderBy(col("user_id"))
    },
    Some("""SELECT user_id, count(1) AS n_events,
                   round(CAST(sum(CAST(value AS DECIMAL(30,8))) AS DOUBLE), 4) AS total_value,
                   round(max(value), 4) AS max_value
            FROM events GROUP BY user_id ORDER BY user_id"""))

  // Tumbling 1h windows (dashboard change-over-duration counts,
  // conf/dashboard_primary.toml:18-62) — batch run of the watermarked
  // streaming aggregation; window struct flattened for the oracle.
  private val windowed = Q(
    "stream_windowed_counts",
    (s, dir) => {
      val events = Tables.load(s, dir, "events")
      // win_start rendered as a string: timestamp physical types differ
      // between engines (ns vs us) even when values agree
      IncrementalStats.windowedCounts(events)
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
            .as("win_start"),
          col("event_type"), col("n"), col("v"))
        .orderBy(col("win_start"), col("event_type"))
    },
    Some("""SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts),
                            '%Y-%m-%d %H:%M:%S') AS win_start,
                   event_type, count(1) AS n,
                   round(CAST(sum(CAST(value AS DECIMAL(30,8))) AS DOUBLE), 4) AS v
            FROM events GROUP BY win_start, event_type
            ORDER BY win_start, event_type"""))

  // First-seen-wins exact dedup on ingest (StreamDedup.firstSeenByContent):
  // the at-most-once gate — key = md5 of (event_type, props), earliest
  // (ts, event_id) wins deterministically, duplicate pressure counted.
  // One map-side-combinable aggregation; the oracle replays the content
  // hash, the argmin, and the counts.
  private val streamDedup = Q(
    "stream_dedup",
    (s, dir) => {
      val events = Tables.load(s, dir, "events")
      graft.streaming.StreamDedup.firstSeenByContent(events,
          Seq(col("event_type"), col("props")), "ts", "event_id")
        .select(col("content_key"),
          date_format(col("first_ts"), "yyyy-MM-dd HH:mm:ss").as("first_ts"),
          col("first_id"), col("n_dups"))
        .orderBy(col("content_key"))
    },
    Some("""WITH k AS (
              SELECT md5(md5(coalesce(CAST(event_type AS VARCHAR), ''))
                         || md5(coalesce(CAST(props AS VARCHAR), '')))
                       AS content_key,
                     ts, event_id
              FROM events),
            f AS (SELECT content_key, ts, event_id FROM (
                    SELECT *, row_number() OVER (PARTITION BY content_key
                               ORDER BY ts, event_id) AS rn
                    FROM k) t WHERE rn = 1),
            g AS (SELECT content_key, count(1) AS n_dups
                  FROM k GROUP BY content_key)
            SELECT f.content_key,
                   strftime(f.ts, '%Y-%m-%d %H:%M:%S') AS first_ts,
                   f.event_id AS first_id, g.n_dups
            FROM f JOIN g USING (content_key)
            ORDER BY f.content_key"""))

  // Watermark late-data audit: BEFORE committing to a delayThreshold, a
  // pipeline owner wants to know how many events a watermarked stateful
  // operator would DROP at a given delay. Replayed as batch semantics: in
  // arrival order (event_id — the ingest sequence), the stream's
  // high-watermark is the running max event-time; an event is late iff its
  // event-time sits more than the delay behind that max (exactly Spark's
  // watermark drop rule for aggregation state). The running max is the
  // two-phase scan (Numbering.runningMaxBySort) — one range shuffle, a
  // one-long-per-partition driver combine, and a narrow pass; never a
  // single-partition global window, so the audit survives 100 TB of
  // events. Integer epoch-micros end-to-end (no float crosses the oracle).
  private val lateAudit = Q(
    "stream_late_audit",
    (s, dir) => {
      val delayUs = 3600000000L // 1 hour, the stream_windowed_counts horizon
      val ev = Tables.load(s, dir, "events")
        .select(col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      graft.operators.Numbering
        .runningMaxBySort(ev, Seq(col("event_id")), col("us"), "hwm")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("us") < col("hwm") - delayUs, 1L).otherwise(0L))
            .as("n_late"),
          max(when(col("us") < col("hwm") - delayUs, col("hwm") - col("us"))
            .otherwise(0L)).as("max_behind_us"))
        .orderBy(col("event_type"))
    },
    Some("""WITH e AS (
              SELECT event_id, event_type, epoch_ns(ts) // 1000 AS us
              FROM events),
            h AS (
              SELECT event_type, us,
                     max(us) OVER (ORDER BY event_id
                       ROWS UNBOUNDED PRECEDING) AS hwm
              FROM e)
            SELECT event_type, count(1) AS n_events,
                   CAST(sum(CASE WHEN us < hwm - 3600000000 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_late,
                   CAST(max(CASE WHEN us < hwm - 3600000000 THEN hwm - us
                     ELSE 0 END) AS BIGINT) AS max_behind_us
            FROM h GROUP BY event_type ORDER BY event_type"""))

  // View→click attribution via the stream-stream interval join
  // (IntervalJoin.within — the watermarked two-stream stateful join,
  // replayed here as the identical batch declaration): per user, the
  // clicks landing within 30 min after a view. One user-keyed equi
  // shuffle; the range predicate rides the join; all lags are exact
  // integer micros. IntervalJoinSpec pins the watermarked MemoryStream
  // form row-for-row against this batch form.
  private val intervalJoin = Q(
    "stream_interval_join",
    (s, dir) => {
      val horizonUs = 1800000000L // 30 min
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("event_id"),
          unix_micros(col("ts")).as("us"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"),
          col("us").as("v_us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("us").as("c_us"))
      graft.streaming.IntervalJoin
        .within(views, clicks, Seq("user_id"), "v_us", "c_us", horizonUs)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("view_id")).as("n_attr_views"),
          countDistinct(col("click_id")).as("n_attr_clicks"),
          min(col("c_us") - col("v_us")).as("min_lag_us"),
          max(col("c_us") - col("v_us")).as("max_lag_us"))
        .orderBy(col("user_id"))
    },
    Some("""WITH e AS (
              SELECT user_id, event_type, event_id, epoch_ns(ts) // 1000 AS us
              FROM events),
            v AS (SELECT user_id, event_id AS view_id, us AS v_us
                  FROM e WHERE event_type = 'view'),
            c AS (SELECT user_id, event_id AS click_id, us AS c_us
                  FROM e WHERE event_type = 'click'),
            p AS (
              SELECT v.user_id, v.view_id, c.click_id, c.c_us - v.v_us AS lag
              FROM v JOIN c ON v.user_id = c.user_id
              WHERE c.c_us > v.v_us AND c.c_us <= v.v_us + 1800000000)
            SELECT user_id, CAST(count(1) AS BIGINT) AS n_pairs,
                   CAST(count(DISTINCT view_id) AS BIGINT) AS n_attr_views,
                   CAST(count(DISTINCT click_id) AS BIGINT) AS n_attr_clicks,
                   CAST(min(lag) AS BIGINT) AS min_lag_us,
                   CAST(max(lag) AS BIGINT) AS max_lag_us
            FROM p GROUP BY user_id ORDER BY user_id"""))

  // §7.1(7) streaming scheme-field cache refresh (update_scheme_caches.pl
  // `incremental` → foreachBatch MERGE, streaming/CacheStream.scala):
  // designations arrive in shipdate-ordered chunks, each folded into the
  // running per-entity cache by the ADDITIVE merge (union → re-agg —
  // exact in any arrival order). This batch replay IS the micro-batch
  // fold CacheStream.maintain performs; CacheStreamSpec drives the same
  // chunks through a MemoryStream + foreachBatch + versioned-snapshot
  // publish and pins the live cache row-for-row against this query. The
  // oracle is the full rebuild — the trigger-maintained cache invariant.
  private val cacheStreamMerge = Q(
    "cache_stream_merge",
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      def agg(d: org.apache.spark.sql.DataFrame) =
        d.groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("n_parts"),
            sum(col("l_quantity").cast("long")).as("total_qty"))
      val cuts = Seq("1994-01-01", "1995-01-01", "1996-01-01")
      val chunks =
        (li.filter(col("l_shipdate") < cuts.head) +:
          cuts.zip(cuts.tail).map { case (lo, hi) =>
            li.filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
          }) :+ li.filter(col("l_shipdate") >= cuts.last)
      chunks.map(agg).reduce(
        graft.streaming.CacheStream.mergeAdditive(_, _, "l_orderkey"))
        .orderBy(col("l_orderkey"))
    },
    Some("""SELECT l_orderkey, count(1) AS n_parts,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
                     AS total_qty
            FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey"""))

  val qs: Seq[Q] = Seq(eventStats, windowed, streamDedup, lateAudit,
    intervalJoin, cacheStreamMerge)
}
