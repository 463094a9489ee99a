package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import scala.collection.immutable.ListMap
import Qh._
import graft.ops.Windows

/** Streaming-window inventory, batch-verified against DuckDB (SURVEY.md
  * §2.2 rows `tumbling_window`/`sliding_window`/`session_window`).
  *
  * Oracle notes: DuckDB `time_bucket` and Spark `window` are both
  * epoch-aligned for minute-granularity widths (midnight-anchored origins
  * divide evenly), so bucket starts agree. A sliding window of width W and
  * step S=W/2 puts each event in exactly two buckets — expressed in SQL as
  * a two-arm UNION ALL. Session windows use the lag/cumsum gap-detection
  * idiom; Spark's `session_window` merges an event arriving at EXACTLY
  * gap after the previous one (verified empirically in
  * StreamingWindowSpec), so a new session starts only when the gap is
  * strictly greater — hence the `>` boundary.
  */
object QueriesWindows {

  val defs: ListMap[String, QueryDef] = ListMap(

    "tumbling_window" -> QueryDef(
      (s, d) => Windows.tumbling(t(s, d, "events"))
        .orderBy("bucket", "event_type"),
      s"""SELECT time_bucket(INTERVAL '10 minutes', ts) AS bucket, event_type,
         |  COUNT(*) AS n, ${dsumSql("value")} AS sum_value
         |FROM events GROUP BY bucket, event_type ORDER BY bucket, event_type""".stripMargin),

    "sliding_window" -> QueryDef(
      (s, d) => Windows.sliding(t(s, d, "events"))
        .orderBy("bucket", "event_type"),
      s"""SELECT bucket, event_type, COUNT(*) AS n, ${dsumSql("value")} AS sum_value
         |FROM (
         |  SELECT time_bucket(INTERVAL '5 minutes', ts) AS bucket, event_type, value FROM events
         |  UNION ALL
         |  SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes', event_type, value FROM events)
         |GROUP BY bucket, event_type ORDER BY bucket, event_type""".stripMargin),

    "session_window" -> QueryDef(
      (s, d) => Windows.sessions(t(s, d, "events"))
        .orderBy("user_id", "session_start"),
      """WITH y AS (
        |  SELECT user_id, ts, CASE WHEN lag(ts) OVER w IS NULL
        |      OR ts - lag(ts) OVER w > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS ns
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |z AS (
        |  SELECT user_id, ts, SUM(ns) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM y)
        |SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS last_ts, COUNT(*) AS n
        |FROM z GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin),

    // Click→purchase attribution as an interval SELF-join on the event
    // log (the batch twin of Windows.clickAttribution, whose
    // stream-stream form — watermarks both sides, time-bounded state —
    // runs in StreamingWindowSpec). Distinct from theta_range_join: same
    // table both sides, user-equi + time-band condition.
    "stream_join_attribution" -> QueryDef(
      (s, d) => {
        val ev = t(s, d, "events")
        val c = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("ts_c"))
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("ts_p"))
        p.join(c, Seq("user_id"))
          .filter(col("ts_c") < col("ts_p") &&
            col("ts_c") >= col("ts_p") - expr(s"INTERVAL ${Windows.AttributionLookback}"))
          .select("user_id", "purchase_id", "click_id")
          .orderBy("purchase_id", "click_id")
      },
      s"""SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id
        |FROM events p JOIN events c ON p.user_id = c.user_id
        |WHERE p.event_type = 'purchase' AND c.event_type = 'click'
        |  AND c.ts < p.ts AND c.ts >= p.ts - INTERVAL '${Windows.AttributionLookback}'
        |ORDER BY purchase_id, click_id""".stripMargin),

    // Linear multi-touch attribution (Shao & Li, KDD 2011 survey the
    // model zoo; linear = equal credit across the path) — last-touch's
    // (stream_join_attribution) fairer sibling: every click in the 2 h
    // lookback of a purchase shares the conversion EQUALLY, credit per
    // campaign (props.k mod 10) in exact ppm units: each touch earns
    // 1e6 div n_touches, so per-campaign sums are BIGINT-exact and
    // order-independent; the only IEEE step is the display division.
    // Campaign extraction reuses the json_extract path (get_json_object
    // / ->> on the SAME props column).
    "attribution_linear" -> QueryDef(
      (s, d) => {
        val ev = t(s, d, "events")
        val c = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("ts_c"),
            (get_json_object(col("props"), "$.k").cast("long") % 10)
              .as("campaign"))
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"),
            col("ts").as("ts_p"))
        val touches = p.join(c, Seq("user_id"))
          .filter(col("ts_c") < col("ts_p") &&
            col("ts_c") >= col("ts_p") - expr(s"INTERVAL ${Windows.AttributionLookback}"))
          .select(col("purchase_id"), col("campaign"))
        val per = touches.groupBy("purchase_id")
          .agg(count(lit(1)).as("n_touches"))
        touches.join(per, "purchase_id")
          .withColumn("credit_ppm", expr("1000000L div n_touches"))
          .groupBy("campaign")
          .agg(count(lit(1)).as("n_touches"),
            sum(col("credit_ppm")).as("credit_ppm"))
          .select(col("campaign"), col("n_touches"), col("credit_ppm"),
            round(col("credit_ppm").cast("double") / lit(1e6), 6)
              .as("credited_purchases"))
          .orderBy("campaign")
      },
      s"""WITH tch AS (SELECT p.event_id AS purchase_id,
         |    CAST(c.props ->> 'k' AS BIGINT) % 10 AS campaign
         |  FROM events p JOIN events c ON p.user_id = c.user_id
         |  WHERE p.event_type = 'purchase' AND c.event_type = 'click'
         |    AND c.ts < p.ts AND c.ts >= p.ts - INTERVAL '${Windows.AttributionLookback}'),
         |per AS (SELECT purchase_id, CAST(COUNT(*) AS BIGINT) AS n FROM tch GROUP BY 1)
         |SELECT campaign, CAST(COUNT(*) AS BIGINT) AS n_touches,
         |  CAST(SUM(1000000 // n) AS BIGINT) AS credit_ppm,
         |  round(CAST(SUM(1000000 // n) AS DOUBLE) / 1e6, 6) AS credited_purchases
         |FROM tch JOIN per USING (purchase_id)
         |GROUP BY campaign ORDER BY campaign""".stripMargin),

    // Exact INTERPOLATED quantiles (percentile_cont semantics) per event
    // type at p ∈ {0.25, 0.5, 0.9}: rank the values once, compute the
    // fractional position (n−1)·p, and interpolate lo + (hi−lo)·frac with
    // the SAME expression shape on both engines (the built-in
    // quantile_cont's internal arithmetic order isn't specified, so both
    // sides spell it out). Complements quality_filter's percentile_disc
    // median and agg_sketch's approximate path. One window + two
    // rank-keyed joins against a 15-row probe table.
    "quantile_cont" -> QueryDef(
      (s, d) => {
        val ev = t(s, d, "events")
        val w = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
        val ranked = ev.withColumn("rk", row_number().over(w).cast("long"))
          .select("event_type", "rk", "value")
        val probes = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
          .select(col("event_type"), col("n"),
            explode(array(lit(0.25), lit(0.5), lit(0.9))).as("p"))
          .withColumn("pos", (col("n") - 1).cast("double") * col("p"))
          .withColumn("lo_rk", floor(col("pos")).cast("long") + 1)
          .withColumn("hi_rk", ceil(col("pos")).cast("long") + 1)
        probes
          .join(ranked.select(col("event_type"), col("rk").as("lo_rk"),
            col("value").as("lo_v")), Seq("event_type", "lo_rk"))
          .join(ranked.select(col("event_type"), col("rk").as("hi_rk"),
            col("value").as("hi_v")), Seq("event_type", "hi_rk"))
          .select(col("event_type"), col("p"),
            round(col("lo_v") + (col("hi_v") - col("lo_v")) *
              (col("pos") - floor(col("pos"))), 6).as("q"))
          .orderBy("event_type", "p")
      },
      """WITH ranked AS (SELECT event_type, value,
        |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS BIGINT) AS rk
        |  FROM events),
        |probes AS (SELECT event_type, n, p,
        |    CAST(n - 1 AS DOUBLE) * p AS pos,
        |    CAST(floor(CAST(n - 1 AS DOUBLE) * p) AS BIGINT) + 1 AS lo_rk,
        |    CAST(ceil(CAST(n - 1 AS DOUBLE) * p) AS BIGINT) + 1 AS hi_rk
        |  FROM (SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type),
        |       (SELECT CAST(unnest([0.25, 0.5, 0.9]) AS DOUBLE) AS p))
        |SELECT pr.event_type, pr.p,
        |  round(lo.value + (hi.value - lo.value) * (pr.pos - floor(pr.pos)), 6) AS q
        |FROM probes pr
        |JOIN ranked lo ON lo.event_type = pr.event_type AND lo.rk = pr.lo_rk
        |JOIN ranked hi ON hi.event_type = pr.event_type AND hi.rk = pr.hi_rk
        |ORDER BY pr.event_type, pr.p""".stripMargin),

    // The approximate side of the quantile ladder, value-checked: equi
    // -width histogram quantiles (ops.Sketches.histQuantile) at the SAME
    // probe points as quantile_cont — two combinable passes + a 256-row
    // -per-group cumulative window instead of ranking every event row.
    // quantile_cont (exact) stays the calibration twin; SketchesSpec
    // asserts |est − exact| ≤ one bin width per probe. Completes the
    // replayable sketch trio: HLL distincts, CMS frequencies, histogram
    // quantiles.
    "sketch_quantile_hist" -> QueryDef(
      (s, d) => graft.ops.Sketches.histQuantile(
        t(s, d, "events"), "event_type", "value")
        .orderBy("event_type", "p"),
      graft.ops.Sketches.histQuantileOracleSql("events", "event_type", "value")),

    // First-order Markov transition matrix over per-user event sequences:
    // lead() over the deterministic (ts, event_id) order pairs each event
    // with its successor, then one combinable count per (from, to) cell +
    // an exact-integer IEEE division for the row-normalized probability
    // (6dp — the established ladder). The behavior-modeling primitive
    // (what follows what), one user-keyed window + one tiny aggregation.
    "event_transitions" -> QueryDef(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val pairs = t(s, d, "events")
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .filter(col("next_type").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
          .agg(count(lit(1)).as("n"))
        val tot = pairs.groupBy("from_type").agg(sum("n").as("row_n"))
        pairs.join(tot, "from_type")
          .select(col("from_type"), col("to_type"), col("n"),
            round(col("n").cast("double") / col("row_n"), 6).as("p"))
          .orderBy("from_type", "to_type")
      },
      """WITH p AS (SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |c AS (SELECT from_type, to_type, COUNT(*) AS n FROM p
        |      WHERE to_type IS NOT NULL GROUP BY from_type, to_type),
        |t AS (SELECT from_type, SUM(n) AS row_n FROM c GROUP BY from_type)
        |SELECT c.from_type, c.to_type, c.n,
        |  round(CAST(c.n AS DOUBLE) / t.row_n, 6) AS p
        |FROM c JOIN t USING (from_type)
        |ORDER BY from_type, to_type""".stripMargin),

    // Time-RANGE window frame (not expressible as a ROWS frame): per-user
    // trailing 1-hour value sum, frame bounds in exact microseconds on
    // both engines (unix_micros / epoch_us — a seconds key would truncate
    // and shift boundary events).
    "window_time_range" -> QueryDef(
      (s, d) => Windows.trailingSum(t(s, d, "events"))
        .orderBy("event_id"),
      s"""SELECT event_id, user_id, ts,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
        |    PARTITION BY user_id ORDER BY epoch_us(ts)
        |    RANGE BETWEEN ${Windows.TrailingWindowSeconds * 1000000L} PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS trailing_sum
        |FROM events ORDER BY event_id""".stripMargin),

    // Sequential conversion funnel view → click → purchase, each step
    // strictly after the previous AND within 2 hours of it — per-user
    // journey state (stage + the earliest qualifying timestamp per step,
    // NULL once the chain breaks). No event-log self-join: one combinable
    // min per step chained on the user key (Windows.funnel scaladoc has
    // the 100 TB shape).
    "event_funnel" -> QueryDef(
      (s, d) => Windows.funnel(t(s, d, "events")).orderBy("user_id"),
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |t1 AS (SELECT user_id, MIN(ts) AS t FROM events
        |       WHERE event_type = 'view' GROUP BY user_id),
        |t2 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
        |       JOIN t1 ON e.user_id = t1.user_id
        |       WHERE e.event_type = 'click' AND e.ts > t1.t
        |         AND e.ts <= t1.t + INTERVAL '2 hours' GROUP BY e.user_id),
        |t3 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
        |       JOIN t2 ON e.user_id = t2.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts > t2.t
        |         AND e.ts <= t2.t + INTERVAL '2 hours' GROUP BY e.user_id)
        |SELECT u.user_id,
        |  CAST(CASE WHEN t3.user_id IS NOT NULL THEN 3
        |       WHEN t2.user_id IS NOT NULL THEN 2
        |       WHEN t1.user_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS stage,
        |  t1.t AS t_view, t2.t AS t_click, t3.t AS t_purchase
        |FROM u LEFT JOIN t1 USING (user_id) LEFT JOIN t2 USING (user_id)
        |  LEFT JOIN t3 USING (user_id)
        |ORDER BY u.user_id""".stripMargin),

    // Forward fill (LOCF) of a deterministically-missing reading: the
    // time-series gap-repair primitive (sensor dropouts, sparse metrics)
    // — `last(... ignoreNulls)` over an unbounded-preceding ROWS frame
    // with a unique (ts, event_id) tiebreaker. The filled value is an
    // input double carried, never recomputed, so the hash compare is
    // exact without a rounding ladder.
    "window_gap_fill" -> QueryDef(
      (s, d) => Windows.gapFill(t(s, d, "events")).orderBy("event_id"),
      """SELECT event_id, user_id, ts,
        |  CASE WHEN event_type = 'view' THEN NULL ELSE value END AS reading,
        |  last_value(CASE WHEN event_type = 'view' THEN NULL ELSE value END
        |    IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        |FROM events ORDER BY event_id""".stripMargin),

    // Exponentially weighted moving average over the trailing 16 readings
    // per user — the smoothing primitive behind rate estimators, anomaly
    // baselines and feature decay. EWMA is usually UNCHECKABLE cross-
    // engine (α^k powers accumulate rounding in engine-specific order);
    // this one is exact by construction: α = 1/2 means weights are powers
    // of two, each reading is fixed-point micros (exact DECIMAL→BIGINT),
    // so the weighted window sum is Σ v6·2^(15−k) — pure BIGINT
    // arithmetic, order-free — and the warmup-unbiased denominator
    // 2^16 − 2^(16−min(rn,16)) is integer too. ONE IEEE division at the
    // end. One user-keyed shuffle; the 16 lag taps ride a single window
    // pass (codegen'd, no per-row state).
    "window_ewma" -> QueryDef(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val taps = (0 until 16).map(k =>
          coalesce(lag(col("__v6"), k).over(w), lit(0L)) * lit(1L << (15 - k)))
          .reduce(_ + _)
        t(s, d, "events")
          .withColumn("__v6",
            (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6))
              * 1000000).cast("long"))
          .withColumn("__rn", row_number().over(w).cast("long"))
          .withColumn("__num", taps)
          .withColumn("__den",
            (lit(65536L) - expr("shiftleft(1L, cast(16 - least(__rn, 16) as int))"))
              * lit(1000000L))
          .select(col("event_id"), col("user_id"), col("ts"), col("value"),
            round(col("__num").cast("double") / col("__den").cast("double"), 6)
              .as("ewma"))
          .orderBy("event_id")
      },
      {
        val taps = (0 until 16).map(k =>
          s"COALESCE(lag(v6, $k) OVER w, 0) * ${1L << (15 - k)}").mkString(" + ")
        s"""WITH v AS (SELECT event_id, user_id, ts, value,
           |    CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v6
           |  FROM events),
           |e AS (SELECT event_id, user_id, ts, value,
           |    $taps AS num,
           |    (65536 - (CAST(1 AS BIGINT) << CAST(16 - least(
           |      row_number() OVER w, 16) AS INT))) * 1000000 AS den
           |  FROM v WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
           |SELECT event_id, user_id, ts, value,
           |  round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS ewma
           |FROM e ORDER BY event_id""".stripMargin
      }),

    // Interval-union coverage (gaps-and-islands, the MEASURE form of
    // session_window): each event opens a 10-minute activity interval;
    // per user, merge overlaps and report distinct active islands and
    // total covered time — billing/SLA/utilization arithmetic that double
    // counts if you sum durations naively. Islands via the running-max
    // idiom: a new island starts where the interval begins after every
    // prior interval's end (cummax over an UNBOUNDED..-1 frame). All
    // arithmetic in exact integer MICROSECONDS; the one IEEE divide
    // converts to display seconds. One user-keyed shuffle, two frames on
    // the same window ordering (single sort), combinable final agg.
    "interval_coverage" -> QueryDef(
      (s, d) => {
        val iv = 600000000L // 10 min in micros
        val w = Window.partitionBy("user_id").orderBy(col("__us"), col("event_id"))
        val prior = w.rowsBetween(Window.unboundedPreceding, -1)
        t(s, d, "events")
          .withColumn("__us", unix_micros(col("ts")))
          .withColumn("__e", col("__us") + iv)
          .withColumn("__new",
            when(col("__us") > coalesce(max(col("__e")).over(prior), lit(Long.MinValue)), 1L)
              .otherwise(0L))
          .withColumn("__sid", sum(col("__new")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy("user_id", "__sid")
          .agg(min(col("__us")).as("__a"), max(col("__e")).as("__b"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_islands"),
            sum(col("__b") - col("__a")).as("covered_us"))
          .select(col("user_id"), col("n_islands"), col("covered_us"),
            round(col("covered_us").cast("double") / lit(1e6), 6).as("covered_s"))
          .orderBy("user_id")
      },
      """WITH v AS (SELECT user_id, event_id, epoch_us(ts) AS us,
        |    epoch_us(ts) + 600000000 AS e FROM events),
        |y AS (SELECT user_id, event_id, us, e,
        |    CASE WHEN us > COALESCE(max(e) OVER (PARTITION BY user_id
        |      ORDER BY us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |      -9223372036854775808) THEN 1 ELSE 0 END AS ns
        |  FROM v),
        |z AS (SELECT user_id, us, e, SUM(ns) OVER (PARTITION BY user_id
        |    ORDER BY us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM y),
        |i AS (SELECT user_id, sid, MIN(us) AS a, MAX(e) AS b
        |      FROM z GROUP BY user_id, sid)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_islands,
        |  CAST(SUM(b - a) AS BIGINT) AS covered_us,
        |  round(CAST(SUM(b - a) AS DOUBLE) / 1e6, 6) AS covered_s
        |FROM i GROUP BY user_id ORDER BY user_id""".stripMargin),

    // Out-of-orderness audit — the measurement a streaming pipeline needs
    // BEFORE choosing its watermark delay: per event (in arrival order =
    // event_id), lateness = how far the running max event-time had
    // already advanced past it, bucketed into a delay histogram. The
    // watermark that bounds dropped data to bucket B is read straight
    // off this table. Exact integer microseconds end to end; the one
    // display divide is per 6-row bucket. Scale shape: the global
    // running max uses the TWO-LEVEL prefix discipline (the
    // Shuffle.globalRowNumber pattern lifted from sum to max): arrival
    // ranges → per-bucket max → running max over the tiny bucket table →
    // within-bucket frames; no per-event single-partition window ever
    // runs.
    "watermark_audit" -> QueryDef(
      (s, d) => {
        val B = 4096L
        val ev = t(s, d, "events")
          .select(col("event_id"), unix_micros(col("ts")).as("us"))
          .withColumn("bk", expr(s"event_id div ${B}L"))
        val perBk = ev.groupBy("bk").agg(max(col("us")).as("bmax"))
        // deliberately unpartitioned: runs on the ≤(N/B)-row bucket table
        val wB = Window.orderBy("bk").rowsBetween(Window.unboundedPreceding, -1)
        val offs = perBk.withColumn("pmax", max(col("bmax")).over(wB))
          .select("bk", "pmax")
        val wIn = Window.partitionBy("bk").orderBy("event_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        val late = ev.join(broadcast(offs), "bk")
          .withColumn("__wmax", max(col("us")).over(wIn))
          .withColumn("late", greatest(lit(0L),
            greatest(coalesce(col("__wmax"), col("us")),
              coalesce(col("pmax"), col("us"))) - col("us")))
        val bucketed = late.withColumn("bucket_id",
          when(col("late") === 0L, 0L)
            .when(col("late") < 1000000L, 1L)
            .when(col("late") < 10000000L, 2L)
            .when(col("late") < 60000000L, 3L)
            .when(col("late") < 600000000L, 4L).otherwise(5L))
        val total = bucketed.count()
        bucketed.groupBy("bucket_id")
          .agg(count(lit(1)).as("n"), max(col("late")).as("max_late_us"))
          .withColumn("share",
            round(col("n").cast("double") / lit(total.toDouble), 6))
          .orderBy("bucket_id")
      },
      """WITH v AS (SELECT event_id, epoch_us(ts) AS us FROM events),
        |l AS (SELECT event_id, us,
        |    GREATEST(0, COALESCE(MAX(us) OVER (ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), us) - us) AS late
        |  FROM v),
        |b AS (SELECT CASE WHEN late = 0 THEN 0 WHEN late < 1000000 THEN 1
        |    WHEN late < 10000000 THEN 2 WHEN late < 60000000 THEN 3
        |    WHEN late < 600000000 THEN 4 ELSE 5 END AS bucket_id, late FROM l),
        |t AS (SELECT COUNT(*) AS total FROM b)
        |SELECT bucket_id, COUNT(*) AS n,
        |  CAST(MAX(late) AS BIGINT) AS max_late_us,
        |  round(CAST(COUNT(*) AS DOUBLE) / CAST(t.total AS DOUBLE), 6) AS share
        |FROM b, t GROUP BY bucket_id, t.total ORDER BY bucket_id""".stripMargin),

    // Weekly cohort retention matrix: users bucketed by first-seen week,
    // distinct-counted per whole-week offset. Both engines truncate weeks
    // to Monday and the offsets are exact day arithmetic.
    "retention_cohort" -> QueryDef(
      (s, d) => Windows.retentionCohorts(t(s, d, "events"))
        .orderBy("cohort_week", "week_offset"),
      """WITH f AS (SELECT user_id, date_trunc('week', MIN(ts)) AS cohort
        |           FROM events GROUP BY user_id),
        |e AS (SELECT ev.user_id, f.cohort, date_trunc('week', ev.ts) AS w
        |      FROM events ev JOIN f USING (user_id))
        |SELECT CAST(cohort AS DATE) AS cohort_week,
        |  CAST(date_diff('day', cohort, w) // 7 AS BIGINT) AS week_offset,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // Lag autocorrelation of the per-minute event-rate series (the
    // Box-Jenkins ACF at lags 1-3) — the periodicity probe a pipeline
    // runs before picking window sizes or alert baselines. Series =
    // minute-bucket counts; each lag pairs bucket b with b+lag where
    // BOTH exist (gap buckets carry no zero-fill row — the sparse
    // convention, documented rather than hidden); Pearson r from the
    // exact DECIMAL power-sum ladder (agg_stats/assortativity rule:
    // never the built-in corr), one display divide. Shape: events
    // collapse to the minute-count table FIRST — the lag self-join and
    // the 3-lag explode touch only that tiny frame, never events.
    "ts_autocorr" -> QueryDef(
      (s, d) => {
        val bk = Windows.minuteCounts(t(s, d, "events"))
        val pairs = bk
          .select(explode(array(lit(1L), lit(2L), lit(3L))).as("lag"),
            col("b"), col("cnt").as("x"))
          .withColumn("b2", col("b") + col("lag"))
          .join(bk.select(col("b").as("b2"), col("cnt").as("y")), "b2")
        val nD = col("n_pairs").cast("double")
        val vx = nD * col("sx2") - col("sx") * col("sx")
        val vy = nD * col("sy2") - col("sy") * col("sy")
        pairs.groupBy("lag").agg(count(lit(1)).as("n_pairs"),
            dsum(col("x")).as("sx"), dsum(col("y")).as("sy"),
            dsum(col("x") * col("y")).as("sxy"),
            dsum(col("x") * col("x")).as("sx2"),
            dsum(col("y") * col("y")).as("sy2"))
          // zero-variance series (a perfectly constant rate — the sf0.001
          // fixture) has no defined ACF: NULL, never a divide-by-zero
          // (ANSI mode makes the unguarded divide a runtime error)
          .select(col("lag"), col("n_pairs"),
            when(vx > 0 && vy > 0,
              round((nD * col("sxy") - col("sx") * col("sy")) /
                (sqrt(vx) * sqrt(vy)), 6)).as("autocorr"))
          .orderBy("lag")
      },
      s"""WITH bk AS (SELECT CAST(epoch_us(ts) AS BIGINT) // 60000000 AS b,
         |    CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY b),
         |lg AS (SELECT CAST(unnest([1, 2, 3]) AS BIGINT) AS lag),
         |pr AS (SELECT lg.lag, x.cnt AS x, y.cnt AS y
         |  FROM lg CROSS JOIN bk x JOIN bk y ON y.b = x.b + lg.lag),
         |st AS (SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |    ${dsumSql("x")} AS sx, ${dsumSql("y")} AS sy,
         |    ${dsumSql("x*y")} AS sxy, ${dsumSql("x*x")} AS sx2,
         |    ${dsumSql("y*y")} AS sy2
         |  FROM pr GROUP BY lag)
         |SELECT lag, n_pairs,
         |  CASE WHEN CAST(n_pairs AS DOUBLE) * sx2 - sx * sx > 0
         |        AND CAST(n_pairs AS DOUBLE) * sy2 - sy * sy > 0
         |  THEN round((CAST(n_pairs AS DOUBLE) * sxy - sx * sy)
         |    / (sqrt(CAST(n_pairs AS DOUBLE) * sx2 - sx * sx)
         |       * sqrt(CAST(n_pairs AS DOUBLE) * sy2 - sy * sy)), 6) END AS autocorr
         |FROM st ORDER BY lag""".stripMargin),

    // Hour-of-day seasonal index — the third time-series lens next to
    // ACF (periodicity) and CUSUM (level shifts): per hour h, the event
    // share relative to a uniform clock (index = n_h·24/total, in ppm —
    // the multiplicative seasonal factor a forecaster divides out, and
    // the load-shape input to capacity planning). Exact BIGINT; the only
    // window is `sum() over ()` on the ≤24-row hour table. Both engines
    // read the same UTC wall-clock hour (Spark under the pinned UTC
    // session timezone, DuckDB on the naive timestamp).
    "ts_seasonality" -> QueryDef(
      (s, d) => {
        t(s, d, "events")
          .groupBy(hour(col("ts")).cast("long").as("hod"))
          .agg(count(lit(1)).as("n"))
          .withColumn("index_ppm",
            expr("(n * 24 * 1000000) div sum(n) over ()"))
          .orderBy("hod")
      },
      """SELECT CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hod,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  (CAST(COUNT(*) AS BIGINT) * 24 * 1000000)
        |    // CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS index_ppm
        |FROM events GROUP BY hod ORDER BY hod""".stripMargin),

    // CUSUM changepoint detection on the same per-minute rate series
    // (Page 1954): deviations kept EXACT by clearing the mean's
    // denominator — dev·T = T·cnt − S (T buckets, S total events; the
    // devs sum to zero by construction) — cumulative-summed in bucket
    // order; the changepoint is the bucket where |cusum| peaks (min-b
    // tie-break). All BIGINT; the only window runs on the minute-count
    // table (one row per minute of history — ~526k rows/year at ANY
    // event volume; past that the two-level prefix-sum discipline
    // applies), never on events.
    "ts_changepoint" -> QueryDef(
      (s, d) => Windows.cusumChangepoint(
        Windows.minuteCounts(t(s, d, "events"))),
      """WITH bk AS (SELECT CAST(epoch_us(ts) AS BIGINT) // 60000000 AS b,
        |    CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY b),
        |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS t,
        |    CAST(SUM(cnt) AS BIGINT) AS s FROM bk),
        |c AS (SELECT b, t, s,
        |    CAST(SUM(t * cnt - s) OVER (ORDER BY b
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cusum_t
        |  FROM bk CROSS JOIN st)
        |SELECT b AS cp_bucket, t AS n_buckets, s AS total_events,
        |  abs(cusum_t) AS max_abs_cusum_t
        |FROM c ORDER BY abs(cusum_t) DESC, b LIMIT 1""".stripMargin),

    // Conversion-latency percentiles: exact interpolated p25/p50/p90 of
    // the first-view → first-purchase delay over converted users — the
    // time-to-convert read-out that turns event_funnel's step counts
    // into an SLA ("half of buyers convert within X hours"). First-touch
    // times are combinable per-user min-aggs in exact micros; the rank
    // over converted users uses the two-level prefix discipline (hour-
    // bucket windows partition-parallel, offset table ≤ latency-range
    // hours); quantile interpolation spelled identically on both engines
    // (the quantile_cont ladder).
    "funnel_latency" -> QueryDef(
      (s, d) => {
        val f = t(s, d, "events").groupBy("user_id").agg(
          min(when(col("event_type") === "view",
            expr("unix_micros(ts)"))).as("v_us"),
          min(when(col("event_type") === "purchase",
            expr("unix_micros(ts)"))).as("p_us"))
        val converted = col("v_us").isNotNull && col("p_us").isNotNull &&
          col("p_us") >= col("v_us")
        val conv = f.filter(converted)
          .select((col("p_us") - col("v_us")).as("lat"))
          .withColumn("b", expr("lat div 3600000000"))
        val wIn = Window.partitionBy("b").orderBy("lat")
        val inB = conv.withColumn("r", row_number().over(wIn).cast("long"))
        val bTot = conv.groupBy("b").agg(count(lit(1)).as("t"))
        val wOff = Window.orderBy("b").rowsBetween(Long.MinValue, -1)
        val offs = bTot
          .withColumn("o", coalesce(sum(col("t")).over(wOff), lit(0L)))
          .select("b", "o")
        val ranked = inB.join(broadcast(offs), "b")
          .select((col("o") + col("r")).as("rk"), col("lat"))
        val stats = f.agg(
          sum(when(col("v_us").isNotNull, 1L).otherwise(0L)).as("n_viewed"),
          sum(when(converted, 1L).otherwise(0L)).as("n_converted"))
        val probes = stats
          .select(col("n_viewed"), col("n_converted"),
            explode(array(lit(0.25), lit(0.5), lit(0.9))).as("p"))
          .withColumn("pos", (col("n_converted") - 1).cast("double") * col("p"))
          .withColumn("lo_rk", floor(col("pos")).cast("long") + 1)
          .withColumn("hi_rk", ceil(col("pos")).cast("long") + 1)
        probes
          .join(ranked.select(col("rk").as("lo_rk"), col("lat").as("lo_v")), Seq("lo_rk"))
          .join(ranked.select(col("rk").as("hi_rk"), col("lat").as("hi_v")), Seq("hi_rk"))
          .select(col("p"), col("n_viewed"), col("n_converted"),
            round((col("lo_v") + (col("hi_v") - col("lo_v")) *
              (col("pos") - floor(col("pos")))) / lit(1e6), 6).as("q_lat_sec"))
          .orderBy("p")
      },
      """WITH f AS (SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS v_us,
        |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS p_us
        |  FROM events GROUP BY user_id),
        |conv AS (SELECT p_us - v_us AS lat FROM f
        |  WHERE v_us IS NOT NULL AND p_us IS NOT NULL AND p_us >= v_us),
        |rkd AS (SELECT lat, CAST(row_number() OVER (ORDER BY lat) AS BIGINT) AS rk FROM conv),
        |st AS (SELECT
        |    CAST(SUM(CASE WHEN v_us IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_viewed,
        |    CAST(SUM(CASE WHEN v_us IS NOT NULL AND p_us IS NOT NULL AND p_us >= v_us
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
        |  FROM f),
        |probes AS (SELECT n_viewed, n_converted, p,
        |    CAST(n_converted - 1 AS DOUBLE) * p AS pos,
        |    CAST(floor(CAST(n_converted - 1 AS DOUBLE) * p) AS BIGINT) + 1 AS lo_rk,
        |    CAST(ceil(CAST(n_converted - 1 AS DOUBLE) * p) AS BIGINT) + 1 AS hi_rk
        |  FROM st, (SELECT CAST(unnest([0.25, 0.5, 0.9]) AS DOUBLE) AS p))
        |SELECT pr.p, pr.n_viewed, pr.n_converted,
        |  round((lo.lat + (hi.lat - lo.lat) * (pr.pos - floor(pr.pos))) / 1e6, 6) AS q_lat_sec
        |FROM probes pr JOIN rkd lo ON lo.rk = pr.lo_rk
        |JOIN rkd hi ON hi.rk = pr.hi_rk
        |ORDER BY pr.p""".stripMargin),

    // Lower weighted median of line price weighted by quantity, per
    // return flag — the robust-center primitive for skewed monetary
    // data (Edgeworth 1888): smallest price p with cumWeight(≤p) ≥
    // totalWeight/2, decided by the INTEGER comparison 2·cum ≥ tot (no
    // division anywhere). Quantities are exact integers stored as
    // doubles; both engines cast to BIGINT first. Rows collapse to the
    // (flag, price) weight table before any window; the cumulative sum
    // uses the two-level prefix discipline (price-bucket windows are
    // partition-parallel; the offset table is flags × ~price-range/1000
    // rows).
    "weighted_median" -> QueryDef(
      (s, d) => {
        val base = t(s, d, "lineitem")
          .groupBy(col("l_returnflag").as("flag"),
            col("l_extendedprice").as("price"))
          .agg(sum(col("l_quantity").cast("long")).as("w"))
          .withColumn("b", floor(col("price") / 1000).cast("long"))
        val wIn = Window.partitionBy("flag", "b").orderBy("price")
          .rowsBetween(Long.MinValue, 0)
        val inB = base.withColumn("r", sum(col("w")).over(wIn))
        val bTot = base.groupBy("flag", "b").agg(sum(col("w")).as("t"))
        val wOff = Window.partitionBy("flag").orderBy("b")
          .rowsBetween(Long.MinValue, -1)
        val offs = bTot
          .withColumn("o", coalesce(sum(col("t")).over(wOff), lit(0L)))
          .select("flag", "b", "o")
        val tot = base.groupBy("flag").agg(sum(col("w")).as("total_weight"))
        inB.join(broadcast(offs), Seq("flag", "b"))
          .join(broadcast(tot), "flag")
          .filter((col("o") + col("r")) * 2 >= col("total_weight"))
          .groupBy(col("flag"), col("total_weight"))
          .agg(min(col("price")).as("median_price"))
          .select(col("flag").as("l_returnflag"), col("median_price"),
            col("total_weight"))
          .orderBy("l_returnflag")
      },
      """WITH base AS (SELECT l_returnflag AS flag, l_extendedprice AS price,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |cum AS (SELECT flag, price,
        |    CAST(SUM(w) OVER (PARTITION BY flag ORDER BY price
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cw
        |  FROM base),
        |tot AS (SELECT flag, CAST(SUM(w) AS BIGINT) AS tw FROM base GROUP BY flag)
        |SELECT c.flag AS l_returnflag, MIN(price) AS median_price,
        |  tw AS total_weight
        |FROM cum c JOIN tot USING (flag) WHERE 2 * cw >= tw
        |GROUP BY c.flag, tw ORDER BY l_returnflag""".stripMargin),

    // Pearson chi-square independence test between event type and
    // hour-of-day (Pearson 1900) — "is traffic mix stable across the
    // day?", the categorical companion to ks_drift's continuous test.
    // Events collapse to the ≤(types × 24)-cell contingency table FIRST
    // (one combinable groupBy); expected counts E = rowTot·colTot/N as
    // doubles from exact BIGINTs (identical op sequence both engines),
    // per-cell terms rounded to 6 dp and summed EXACTLY as DECIMAL(18,6)
    // so the statistic is accumulation-order-independent.
    "chi2_independence" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.types.DecimalType
        val cells = t(s, d, "events")
          .groupBy(col("event_type"), hour(col("ts")).cast("long").as("hod"))
          .agg(count(lit(1)).as("o"))
        val rt = cells.groupBy("event_type").agg(sum(col("o")).as("rt"))
        val ct = cells.groupBy("hod").agg(sum(col("o")).as("ct"))
        val n = cells.agg(sum(col("o")).as("n"),
          countDistinct(col("event_type")).as("r"),
          countDistinct(col("hod")).as("c"))
        val term = cells.join(broadcast(rt), "event_type")
          .join(broadcast(ct), "hod").crossJoin(broadcast(n))
          .withColumn("e", col("rt").cast("double") * col("ct").cast("double") /
            col("n").cast("double"))
          .withColumn("t6", round((col("o").cast("double") - col("e")) *
            (col("o").cast("double") - col("e")) / col("e"), 6)
            .cast(DecimalType(18, 6)))
        term.groupBy("n", "r", "c")
          .agg(sum(col("t6")).cast("double").as("chi2"))
          .select(col("n"), col("r").as("n_types"), col("c").as("n_hours"),
            ((col("r") - 1) * (col("c") - 1)).as("dof"), col("chi2"))
      },
      """WITH cells AS (SELECT event_type,
        |    CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hod,
        |    CAST(COUNT(*) AS BIGINT) AS o
        |  FROM events GROUP BY event_type, hod),
        |rt AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS rt FROM cells GROUP BY event_type),
        |ct AS (SELECT hod, CAST(SUM(o) AS BIGINT) AS ct FROM cells GROUP BY hod),
        |ns AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
        |    CAST(COUNT(DISTINCT event_type) AS BIGINT) AS r,
        |    CAST(COUNT(DISTINCT hod) AS BIGINT) AS c
        |  FROM cells),
        |term AS (SELECT n, r, c,
        |    CAST(round((CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
        |      / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS DECIMAL(18,6)) AS t6
        |  FROM cells JOIN rt USING (event_type) JOIN ct USING (hod) CROSS JOIN ns)
        |SELECT n, r AS n_types, c AS n_hours, (r - 1) * (c - 1) AS dof,
        |  CAST(SUM(t6) AS DOUBLE) AS chi2
        |FROM term GROUP BY n, r, c""".stripMargin),

    // Exact two-sample Kolmogorov–Smirnov drift test (click vs purchase
    // value distributions) — the distribution-level drift gate a feature
    // pipeline runs between cohorts/snapshots. ECDF differences compared
    // in exact integer units (cum₁·n₂ − cum₂·n₁, DECIMAL(38,0) products);
    // the two-level prefix-sum discipline keeps every window partition-
    // parallel except the ≤(value-range)-row bucket-offset table. The
    // 5% decision replays Smirnov's asymptotic critical value on both
    // engines from the same rounded doubles.
    "ks_drift" -> QueryDef(
      (s, d) => Windows.ksDrift(t(s, d, "events")),
      """WITH pts AS (SELECT value,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS c2
        |  FROM events WHERE event_type IN ('click', 'purchase') GROUP BY value),
        |cum AS (SELECT
        |    CAST(SUM(c1) OVER (ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS f1,
        |    CAST(SUM(c2) OVER (ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS f2
        |  FROM pts),
        |ns AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2 FROM pts),
        |d AS (SELECT n1, n2,
        |    CAST(MAX(abs(CAST(f1 AS DECIMAL(38,0)) * n2 - CAST(f2 AS DECIMAL(38,0)) * n1)) AS BIGINT) AS ks_units
        |  FROM cum CROSS JOIN ns GROUP BY n1, n2)
        |SELECT n1, n2, ks_units,
        |  round(CAST(ks_units AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 6) AS ks,
        |  round(1.358 * sqrt(CAST(n1 + n2 AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))), 6) AS crit_05,
        |  round(CAST(ks_units AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 6)
        |    > round(1.358 * sqrt(CAST(n1 + n2 AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))), 6) AS reject_05
        |FROM d""".stripMargin),

    // Exact Mann–Whitney U rank-sum test (Mann & Whitney 1947) between
    // the click and purchase value samples — the rank-based drift gate
    // (location shift) beside ks_drift's max-ECDF gap. Midranks in
    // integer 2x units over the SAME collapsed per-value count table
    // (the pooled sort rides the bounded value DOMAIN, two-level bucket
    // prefix for the strict counts); the tie-corrected normal z is the
    // only IEEE step, spelled identically on both engines.
    "mann_whitney" -> QueryDef(
      (s, d) => Windows.mannWhitney(t(s, d, "events")),
      """WITH pts AS (SELECT value,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS c2
        |  FROM events WHERE event_type IN ('click', 'purchase') GROUP BY value),
        |r AS (SELECT c1, c2, c1 + c2 AS g,
        |    COALESCE(CAST(SUM(c1 + c2) OVER (ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cb
        |  FROM pts),
        |a AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2,
        |    CAST(SUM(CAST(c1 AS DECIMAL(38,0)) * (2 * cb + g + 1)) AS BIGINT) AS r1_2,
        |    CAST(SUM(g * g * g - g) AS BIGINT) AS tie_units
        |  FROM r),
        |u AS (SELECT n1, n2, r1_2 - n1 * (n1 + 1) AS u1_2, tie_units FROM a)
        |SELECT n1, n2, u1_2, 2 * n1 * n2 - u1_2 AS u2_2, tie_units,
        |  round((CAST(u1_2 AS DOUBLE) - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) /
        |    (2.0 * sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0 *
        |      (CAST(n1 + n2 + 1 AS DOUBLE) - CAST(tie_units AS DOUBLE) /
        |        (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 - 1 AS DOUBLE))))), 6) AS z,
        |  abs(round((CAST(u1_2 AS DOUBLE) - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) /
        |    (2.0 * sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0 *
        |      (CAST(n1 + n2 + 1 AS DOUBLE) - CAST(tie_units AS DOUBLE) /
        |        (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 - 1 AS DOUBLE))))), 6)) > 1.96 AS reject_05
        |FROM u""".stripMargin),

    // Top-20 three-step user journeys (event-type trigrams per user in
    // event-time order) — the path-mining / clickstream-analysis
    // primitive behind "what do users do before purchasing?". The lead
    // window partitions by user (partition-parallel, the
    // event_transitions discipline — no global window); trigram counting
    // is one combinable groupBy over the ≤|types|³ path table.
    // Deterministic (n desc, e0, e1, e2) cut. NINTH streaming twin
    // `Windows.PathView`: per-user 2-event-tail state, each trigram
    // counted once in the batch its third event arrives (PathStreamSpec
    // proves per-prefix equality incl. splits cutting a trigram across
    // batches).
    "path_mining" -> QueryDef(
      (s, d) => Windows.pathTopk(t(s, d, "events")),
      """WITH p AS (SELECT event_type AS e0,
        |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e1,
        |    lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2
        |  FROM events)
        |SELECT e0, e1, e2, CAST(COUNT(*) AS BIGINT) AS n
        |FROM p WHERE e2 IS NOT NULL
        |GROUP BY e0, e1, e2 ORDER BY n DESC, e0, e1, e2 LIMIT 20""".stripMargin),

    // Seasonal-residual anomaly screen: the top-20 minutes whose event
    // count deviates most from their hour-of-day seasonal profile —
    // ts_seasonality's profile turned into a detector (the monitoring
    // "this Tuesday 3 AM spike" alarm). Events collapse to the bounded
    // per-minute count table FIRST (the ts_changepoint discipline —
    // minute count rides the time RANGE, not the event decade); the
    // 24-row profile carries exact BIGINT power sums (n·Σx² − (Σx)²
    // variance ladder, the agg_stats/outlier_zscore form) and broadcast-
    // joins back. One IEEE z expression, spelled identically both
    // engines; deterministic (|z| desc, minute) cut.
    "ts_anomaly_seasonal" -> QueryDef(
      (s, d) => {
        val minutes = t(s, d, "events")
          .groupBy(date_trunc("minute", col("ts")).as("minute"))
          .agg(count(lit(1)).as("cnt"))
        val prof = minutes
          .groupBy(hour(col("minute")).cast("long").as("hod"))
          .agg(count(lit(1)).as("nm"), sum(col("cnt")).as("s"),
            sum(col("cnt") * col("cnt")).as("ss"))
        val d8 = (c: org.apache.spark.sql.Column) => c.cast("double")
        minutes.withColumn("hod", hour(col("minute")).cast("long"))
          .join(broadcast(prof), "hod")
          // a single-minute or constant-count hour has no defined profile
          // (zero variance → 0/0): exclude it in exact integers
          .filter(col("nm") > lit(1L) &&
            col("nm") * col("ss") - col("s") * col("s") > lit(0L))
          .withColumn("z", round(
            (d8(col("cnt")) - d8(col("s")) / d8(col("nm"))) /
              sqrt(d8(col("nm") * col("ss") - col("s") * col("s")) /
                (d8(col("nm")) * d8(col("nm") - lit(1L)))), 6))
          .select(col("minute"), col("hod"), col("cnt"), col("z"))
          .orderBy(abs(col("z")).desc, col("minute"))
          .limit(20)
      },
      """WITH m AS (SELECT date_trunc('minute', ts) AS minute,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1),
        |prof AS (SELECT CAST(EXTRACT(hour FROM minute) AS BIGINT) AS hod,
        |    CAST(COUNT(*) AS BIGINT) AS nm, CAST(SUM(cnt) AS BIGINT) AS s,
        |    CAST(SUM(cnt * cnt) AS BIGINT) AS ss
        |  FROM m GROUP BY 1)
        |SELECT minute, hod, cnt,
        |  round((CAST(cnt AS DOUBLE) - CAST(s AS DOUBLE) / CAST(nm AS DOUBLE)) /
        |    sqrt(CAST(nm * ss - s * s AS DOUBLE) /
        |      (CAST(nm AS DOUBLE) * CAST(nm - 1 AS DOUBLE))), 6) AS z
        |FROM m JOIN prof ON prof.hod = CAST(EXTRACT(hour FROM m.minute) AS BIGINT)
        |WHERE nm > 1 AND nm * ss - s * s > 0
        |ORDER BY abs(round((CAST(cnt AS DOUBLE) - CAST(s AS DOUBLE) / CAST(nm AS DOUBLE)) /
        |    sqrt(CAST(nm * ss - s * s AS DOUBLE) /
        |      (CAST(nm AS DOUBLE) * CAST(nm - 1 AS DOUBLE))), 6)) DESC, minute
        |LIMIT 20""".stripMargin),

    // Approximate distinct users over a sliding 3-hour window via
    // register-level HLL merge (Flajolet et al. 2007 §5: sketches of
    // unions = elementwise register max) — the streaming-dashboard
    // "unique visitors last 3 h, every hour" panel, where the exact
    // answer re-scans three hours of keys per window and the sketch
    // path merges three 256-register tables. Per-hour registers build
    // once from the keys; each register row then fans out to the ≤3
    // windows it serves (never the raw keys), windows anchored at hours
    // that exist. The exact per-window distinct rides along as the
    // calibration column (the sketch_cms_topk discipline — at 100 TB it
    // is the harness, not the scale path). Estimates 4 dp from the same
    // replayed constants as sketch_hll_replay.
    "sketch_hll_sliding" -> QueryDef(
      (s, d) => {
        import graft.ops.Sketches
        val win = 3
        val ev = t(s, d, "events")
          .select(expr("unix_micros(ts) div 3600000000").as("ih"), col("user_id"))
        val hrs = ev.select(col("ih")).distinct()
        def toWindows(df: org.apache.spark.sql.DataFrame, src: String) = df
          .select(explode(array((0 until win).map(i =>
            col(src) + lit(i.toLong)): _*)).as("w") +:
            df.columns.filter(_ != src).map(col).toSeq: _*)
          .join(broadcast(hrs.select(col("ih").as("w"))), "w")
        val wreg = toWindows(Sketches.hllRegisters(ev, "ih", "user_id"), "grp")
          .groupBy(col("w").as("grp"), col("b")).agg(max(col("r")).as("r"))
        val exact = toWindows(ev.distinct(), "ih")
          .groupBy("w").agg(countDistinct(col("user_id")).as("n_exact"))
        Sketches.hllEstimate(wreg)
          .join(exact, col("grp") === col("w"))
          .select(col("grp").as("w_end"), col("n_exact"), col("v_zero"),
            col("z_scaled"), col("est_hll"))
          .orderBy("w_end")
      },
      graft.ops.Sketches.hllSlidingOracleSql(3)),

    // Maximum drawdown of the revenue-vs-run-rate curve (Magdon-Ismail
    // & Atiya 2004's statistic applied where it is non-trivial: raw
    // cumulative revenue is monotone, so its drawdown is identically 0
    // — the series that can FALL is the cumulative DEVIATION from the
    // overall daily run-rate, the "how far behind plan did we get, at
    // worst?" monitoring question). Exactness: the mean's denominator
    // is CLEARED (the ts_changepoint trick) — dev·N = cents·N − total,
    // an integer series summing to exactly 0 — and cumulative sum,
    // running peak and their difference stay BIGINT; only the display
    // division (units → dollars) is IEEE. Windows run over the bounded
    // DAY table, never order rows. Deterministic (drawdown desc, day)
    // trough pick.
    "ts_max_drawdown" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.types.DecimalType
        val daily = t(s, d, "orders")
          .groupBy(to_date(col("o_orderdate")).as("day"))
          // the rfm cents ladder: exact DECIMAL sum, THEN ×100 — a
          // per-row double×100 cast truncates in Spark but rounds in
          // DuckDB
          .agg((sum(col("o_totalprice").cast(DecimalType(18, 2))) * 100)
            .cast("long").as("cents"))
        val tot = daily.agg(sum(col("cents")).as("total"),
          count(lit(1)).as("n_days"))
        // cum and peak ride the two-level prefix discipline (VERDICT r12
        // #4): the day table grows with the time span, so neither running
        // aggregate may serialize it through one window task — the only
        // global windows are the ≤1025-row bucket-offset frames. The
        // epoch-day long is the range-bucketable order key (same order as
        // `day`).
        val dev = daily.crossJoin(broadcast(tot))
          .withColumn("dev_units", col("cents") * col("n_days") - col("total"))
          .withColumn("__ud", expr("CAST(unix_date(day) AS BIGINT)"))
        // fused sum+peak: one exchange/scan/broadcast instead of the
        // chained helpers' two (the r13 0.6→2.1 s fixed-overhead
        // regression; equivalence pinned in WindowsOpsSpec)
        Windows.twoLevelPrefixSumMax(dev, "__ud", "dev_units", "cum", "peak")
          .drop("__ud")
          .withColumn("dd_units", col("peak") - col("cum"))
          .orderBy(col("dd_units").desc, col("day"))
          .limit(1)
          .select(col("day").as("trough_day"), col("n_days"), col("dd_units"),
            round(col("dd_units").cast("double") /
              (lit(100.0) * col("n_days").cast("double")), 2).as("drawdown"))
      },
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |tt AS (SELECT CAST(SUM(cents) AS BIGINT) AS total,
        |    CAST(COUNT(*) AS BIGINT) AS n_days FROM daily),
        |c AS (SELECT day, n_days,
        |    CAST(SUM(cents * n_days - total) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM daily CROSS JOIN tt),
        |p AS (SELECT day, n_days, cum,
        |    CAST(MAX(cum) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS peak
        |  FROM c)
        |SELECT day AS trough_day, n_days, peak - cum AS dd_units,
        |  round(CAST(peak - cum AS DOUBLE) / (100.0 * CAST(n_days AS DOUBLE)), 2) AS drawdown
        |FROM p ORDER BY dd_units DESC, day LIMIT 1""".stripMargin),

    // Inter-purchase cadence: the distribution of days between a
    // customer's consecutive orders — the replenishment-cycle curve
    // behind "when is a customer overdue?" (the classic BTYD/CLV input).
    // Per-customer gaps from a customer-partitioned lead window
    // (partition-parallel, the event_transitions discipline); the
    // distribution collapses to the bounded gap-day DOMAIN before the
    // one cumulative window (the ks_drift argument: day gaps ride the
    // calendar, not the order decade); CDF is one IEEE division of
    // exact BIGINTs. Deterministic by gap.
    "purchase_cadence" -> QueryDef(
      (s, d) => {
        val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
        val gaps = t(s, d, "orders")
          .withColumn("nxt", lead(col("o_orderdate"), 1).over(w))
          .filter(col("nxt").isNotNull)
          .select(datediff(col("nxt"), col("o_orderdate")).cast("long").as("gap_days"))
          .groupBy("gap_days").agg(count(lit(1)).as("n"))
        val tot = gaps.agg(sum(col("n")).as("total"))
        val wc = Window.orderBy("gap_days").rowsBetween(Long.MinValue, 0)
        gaps.withColumn("cum", sum(col("n")).over(wc))
          .crossJoin(broadcast(tot))
          .select(col("gap_days"), col("n"),
            round(col("cum").cast("double") / col("total"), 6).as("cdf"))
          .orderBy("gap_days")
      },
      """WITH g AS (SELECT CAST(date_diff('day', o_orderdate,
        |      lead(o_orderdate) OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate, o_orderkey)) AS BIGINT) AS gap_days
        |  FROM orders),
        |h AS (SELECT gap_days, CAST(COUNT(*) AS BIGINT) AS n FROM g
        |      WHERE gap_days IS NOT NULL GROUP BY gap_days),
        |c AS (SELECT gap_days, n,
        |    CAST(SUM(n) OVER (ORDER BY gap_days
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM h),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM h)
        |SELECT gap_days, n, round(CAST(cum AS DOUBLE) / total, 6) AS cdf
        |FROM c CROSS JOIN t ORDER BY gap_days""".stripMargin),

    // Rolling N-day retention: of the users active on day d, the share
    // active again within the next 7 days — the day-over-day engagement
    // curve (retention_cohort's signup-anchored matrix answers "how do
    // cohorts age", this answers "is stickiness drifting this week").
    // Activity collapses to the distinct (day, user) table FIRST; the
    // retained check is ONE self-join on user with a 1..7-day gap
    // window, collapsed to per-day counts; rate is one IEEE division of
    // exact BIGINTs. Deterministic by day.
    "rolling_retention" -> QueryDef(
      (s, d) => {
        val du = t(s, d, "events")
          .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        val ret = du.join(
            du.select(col("user_id"), col("day").as("day2")), "user_id")
          .filter(datediff(col("day2"), col("day")).between(1, 7))
          .select(col("user_id"), col("day")).distinct()
          .groupBy("day").agg(count(lit(1)).as("n_retained"))
        du.groupBy("day").agg(count(lit(1)).as("n_active"))
          .join(ret, Seq("day"), "left")
          .select(col("day"), col("n_active"),
            coalesce(col("n_retained"), lit(0L)).as("n_retained"),
            round(coalesce(col("n_retained"), lit(0L)).cast("double") /
              col("n_active"), 6).as("retention_7d"))
          .orderBy("day")
      },
      """WITH du AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |ret AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS n_retained FROM (
        |    SELECT DISTINCT a.user_id, a.day
        |    FROM du a JOIN du b ON a.user_id = b.user_id
        |    WHERE date_diff('day', a.day, b.day) BETWEEN 1 AND 7)
        |  GROUP BY day),
        |act AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS n_active FROM du GROUP BY day)
        |SELECT act.day, n_active, COALESCE(n_retained, 0) AS n_retained,
        |  round(CAST(COALESCE(n_retained, 0) AS DOUBLE) / n_active, 6) AS retention_7d
        |FROM act LEFT JOIN ret ON ret.day = act.day
        |ORDER BY act.day""".stripMargin),

    // Cross-correlation function between the hourly click and purchase
    // rates at lags −2..+2 (Box & Jenkins 1970 §11: the CCF — "do
    // clicks LEAD purchases?" — ts_autocorr's two-series sibling; the
    // lag with peak r is the action-to-conversion delay a forecaster
    // regresses on). Series align by an exact hour-index JOIN (gap
    // hours drop out of the pair, never slide it — the
    // ts_snaive_backtest discipline); Pearson r from exact BIGINT power
    // sums in one IEEE expression (the graph_assortativity ladder).
    "ts_cross_corr" -> QueryDef(
      (s, d) => {
        val hs = t(s, d, "events")
          .groupBy(expr("unix_micros(ts) div 3600000000").as("ih"))
          .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("c"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("p"))
        val lags = hs.withColumn("lag",
          explode(array((-2 to 2).map(l => lit(l.toLong)): _*)))
        val joined = lags.join(
          hs.select(col("ih").as("jh"), col("p").as("pj")),
          col("jh") === col("ih") + col("lag"))
        val d8 = (c: org.apache.spark.sql.Column) => c.cast("double")
        joined.groupBy("lag")
          .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"),
            sum(col("pj")).as("sp"), sum(col("c") * col("pj")).as("scp"),
            sum(col("c") * col("c")).as("sc2"),
            sum(col("pj") * col("pj")).as("sp2"))
          .select(col("lag"), col("n"),
            round((d8(col("n")) * d8(col("scp")) - d8(col("sc")) * d8(col("sp"))) /
              (sqrt(d8(col("n")) * d8(col("sc2")) - d8(col("sc")) * d8(col("sc"))) *
                sqrt(d8(col("n")) * d8(col("sp2")) - d8(col("sp")) * d8(col("sp")))), 6)
              .as("r"))
          .orderBy("lag")
      },
      """WITH hs AS (SELECT epoch_us(ts) // 3600000000 AS ih,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS p
        |  FROM events GROUP BY 1),
        |lg AS (SELECT ih, c, CAST(unnest([-2, -1, 0, 1, 2]) AS BIGINT) AS lag FROM hs),
        |j AS (SELECT lag, a.c, b.p AS pj FROM lg a JOIN hs b ON b.ih = a.ih + a.lag),
        |agg AS (SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(c) AS BIGINT) AS sc, CAST(SUM(pj) AS BIGINT) AS sp,
        |    CAST(SUM(c * pj) AS BIGINT) AS scp,
        |    CAST(SUM(c * c) AS BIGINT) AS sc2, CAST(SUM(pj * pj) AS BIGINT) AS sp2
        |  FROM j GROUP BY lag)
        |SELECT lag, n,
        |  round((CAST(n AS DOUBLE) * CAST(scp AS DOUBLE) - CAST(sc AS DOUBLE) * CAST(sp AS DOUBLE)) /
        |    (sqrt(CAST(n AS DOUBLE) * CAST(sc2 AS DOUBLE) - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)) *
        |     sqrt(CAST(n AS DOUBLE) * CAST(sp2 AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))), 6) AS r
        |FROM agg ORDER BY lag""".stripMargin),

    // Seasonal-naive forecast backtest (Hyndman & Athanasopoulos, fpp3
    // §5.2: the benchmark every real forecaster must beat): predict each
    // hour's event count by the same hour one day earlier (snaive_24)
    // and by the previous hour (naive_1), score both with MAE and bias —
    // the capacity-planning "is traffic predictable day-over-day?"
    // question, and the baseline row a model-evaluation pipeline joins
    // its candidates against. The lag is an exact-micros JOIN, not a
    // row-lag — a missing hour (zero events) must not slide the
    // alignment. Errors are exact BIGINTs; the two metric divisions are
    // the only IEEE steps, spelled identically both engines.
    // Theil–Sen robust trend estimator over the hourly event counts
    // (Theil 1950 / Sen 1968): the (lower weighted) median of all
    // pairwise slopes — the outlier-immune answer to "is traffic
    // growing?", where an OLS slope (regr_slope's ladder) chases one
    // spike. Slopes are IEEE divisions of exact BIGINTs rounded to 1e-6
    // resolution, then COLLAPSED by value so the median runs on the
    // bounded slope DOMAIN via the weighted_median two-level prefix
    // machinery. Work is bounded at ANY time range: hours are strided
    // down to ≤2048 sample points first (deterministic ihr % stride
    // filter, the SimQueryCap discipline), so the pair table never
    // exceeds ~2M rows however many years the stream spans.
    "ts_theil_sen" -> QueryDef(
      (s, d) => {
        val hoursDf = t(s, d, "events")
          .groupBy(date_trunc("hour", col("ts")).as("hour"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("ih", expr("unix_micros(hour) div 3600000000"))
        val stats = hoursDf.agg(min(col("ih")).as("ih0"),
          count(lit(1)).as("n_hours"))
        val sampled = hoursDf.crossJoin(broadcast(stats))
          .withColumn("ihr", col("ih") - col("ih0"))
          .withColumn("stride", expr("(n_hours + 2047L) div 2048L"))
          .filter(col("ihr") % col("stride") === 0)
          .select(col("ihr"), col("cnt"), col("n_hours"), col("stride"))
        val pairs = sampled.alias("a")
          .join(sampled.select(col("ihr").as("jhr"), col("cnt").as("jcnt")),
            col("jhr") > col("ihr"))
          // the when-guard makes the division TOTAL: downstream joins on
          // derived keys make Catalyst infer isnotnull constraints whose
          // pushed evaluation can reorder ahead of the jhr > ihr join
          // conjunct, and an unguarded ANSI division then throws
          // DIVIDE_BY_ZERO on the very pairs the condition excludes
          .select(col("n_hours"), col("stride"),
            when(col("jhr") > col("ihr"),
              round((col("jcnt") - col("cnt")).cast("double") /
                (col("jhr") - col("ihr")).cast("double"), 6)).as("slope6"))
        val base = pairs.groupBy("n_hours", "stride", "slope6")
          .agg(count(lit(1)).as("w"))
          .withColumn("b", floor(col("slope6")).cast("long"))
        val wIn = Window.partitionBy("b").orderBy("slope6")
          .rowsBetween(Long.MinValue, 0)
        val inB = base.withColumn("r", sum(col("w")).over(wIn))
        val bTot = base.groupBy("b").agg(sum(col("w")).as("t"))
        val wOff = Window.orderBy("b").rowsBetween(Long.MinValue, -1)
        val offs = bTot
          .withColumn("o", coalesce(sum(col("t")).over(wOff), lit(0L)))
          .select("b", "o")
        val tot = base.agg(sum(col("w")).as("n_pairs"))
        inB.join(broadcast(offs), "b").crossJoin(broadcast(tot))
          .filter((col("o") + col("r")) * 2 >= col("n_pairs"))
          .groupBy(col("n_hours"), col("stride"), col("n_pairs"))
          .agg(min(col("slope6")).as("slope_per_hour"))
          .select(col("n_hours"), col("stride"), col("n_pairs"),
            col("slope_per_hour"),
            round(col("slope_per_hour") * 24, 6).as("slope_per_day"))
      },
      """WITH h AS (SELECT date_trunc('hour', ts) AS hour,
        |    CAST(COUNT(*) AS BIGINT) AS cnt,
        |    epoch_us(date_trunc('hour', ts)) // 3600000000 AS ih
        |  FROM events GROUP BY 1),
        |st AS (SELECT MIN(ih) AS ih0, CAST(COUNT(*) AS BIGINT) AS n_hours FROM h),
        |sam AS (SELECT ih - ih0 AS ihr, cnt, n_hours,
        |    (n_hours + 2047) // 2048 AS stride
        |  FROM h CROSS JOIN st
        |  WHERE (ih - ih0) % ((n_hours + 2047) // 2048) = 0),
        |pr AS (SELECT a.n_hours, a.stride,
        |    round(CAST(b.cnt - a.cnt AS DOUBLE) / CAST(b.ihr - a.ihr AS DOUBLE), 6) AS slope6
        |  FROM sam a JOIN sam b ON b.ihr > a.ihr),
        |base AS (SELECT n_hours, stride, slope6, CAST(COUNT(*) AS BIGINT) AS w
        |  FROM pr GROUP BY 1, 2, 3),
        |cum AS (SELECT n_hours, stride, slope6,
        |    CAST(SUM(w) OVER (ORDER BY slope6
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cw
        |  FROM base),
        |tot AS (SELECT CAST(SUM(w) AS BIGINT) AS n_pairs FROM base)
        |SELECT n_hours, stride, n_pairs, MIN(slope6) AS slope_per_hour,
        |  round(MIN(slope6) * 24, 6) AS slope_per_day
        |FROM cum CROSS JOIN tot WHERE 2 * cw >= n_pairs
        |GROUP BY n_hours, stride, n_pairs""".stripMargin),

    "ts_snaive_backtest" -> QueryDef(
      (s, d) => {
        val hoursDf = t(s, d, "events")
          .groupBy(date_trunc("hour", col("ts")).as("hour"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("hu", unix_micros(col("hour")))
        def model(name: String, lagMicros: Long) = hoursDf.alias("a")
          .join(hoursDf.select(col("hu").as("phu"), col("cnt").as("pred")),
            col("hu") === col("phu") + lit(lagMicros))
          .withColumn("err", col("cnt") - col("pred"))
          .agg(count(lit(1)).as("n_hours"),
            sum(abs(col("err"))).as("abs_err_sum"),
            sum(col("err")).as("err_sum"))
          .select(lit(name).as("model"), col("n_hours"), col("abs_err_sum"),
            round(col("abs_err_sum").cast("double") / col("n_hours"), 6).as("mae"),
            round(col("err_sum").cast("double") / col("n_hours"), 6).as("bias"))
        model("naive_1", 3600000000L)
          .unionByName(model("snaive_24", 86400000000L))
          .orderBy("model")
      },
      """WITH h AS (SELECT date_trunc('hour', ts) AS hour,
        |    CAST(COUNT(*) AS BIGINT) AS cnt, epoch_us(date_trunc('hour', ts)) AS hu
        |  FROM events GROUP BY 1),
        |j AS (SELECT 'naive_1' AS model, a.cnt - p.cnt AS err
        |      FROM h a JOIN h p ON a.hu = p.hu + 3600000000
        |      UNION ALL
        |      SELECT 'snaive_24', a.cnt - p.cnt
        |      FROM h a JOIN h p ON a.hu = p.hu + 86400000000)
        |SELECT model, CAST(COUNT(*) AS BIGINT) AS n_hours,
        |  CAST(SUM(abs(err)) AS BIGINT) AS abs_err_sum,
        |  round(CAST(SUM(abs(err)) AS DOUBLE) / COUNT(*), 6) AS mae,
        |  round(CAST(SUM(err) AS DOUBLE) / COUNT(*), 6) AS bias
        |FROM j GROUP BY model ORDER BY model""".stripMargin)
  )
}
