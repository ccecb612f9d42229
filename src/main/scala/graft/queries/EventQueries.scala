package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Event-stream analytics over the `events` table (SURVEY.md §2c): tumbling
 * windows, gap sessionization, JSON prop extraction, daily actives. These are
 * the batch twins of the Structured Streaming pipelines in
 * [[graft.streaming.Streams]] — identical logical shape, so results agree
 * (tested in StreamingSpec).
 *
 * Oracle-parity: sums over `value` go through DECIMAL(12,2) so the
 * aggregation is order-independent and exact; timestamps stay at native
 * microsecond precision in both engines (session TZ pinned UTC).
 */
object EventQueries {

  private def ev(s: SparkSession, d: String) = Tables.events(s, d)

  /** Epoch microseconds for either timestamp flavor: `unix_micros` only
    * accepts TIMESTAMP (ltz), but the testdata parquet can carry
    * `isAdjustedToUTC=false` (read as TIMESTAMP_NTZ). With the session TZ
    * pinned UTC the ntz->ltz cast is instant-preserving, and on an
    * already-ltz column it is a no-op — same epoch either way. */
  private def epochUs(c: org.apache.spark.sql.Column) =
    unix_micros(c.cast("timestamp_ltz"))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Tumbling 1-hour windows per event type — the streaming-window shape
    // (window() produces the same buckets Structured Streaming would).
    "e1_hourly_agg" -> ((s, d) =>
      ev(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
             expr("CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE)").as("sum_value"))
        .select(col("w.start").as("hour"), col("event_type"), col("n"), col("sum_value"))),

    // RATE ANOMALY (e11, r11): per-type hourly event rates flagged against
    // the TRAILING 24-hour mean — the ops-monitoring / data-quality gate a
    // pipeline runs over its own ingest (a scraper going hot, a source
    // flooding). All arithmetic is exact: integer counts, one IEEE division
    // for the trailing mean, so flags are bit-identical across engines (no
    // stddev/libm). First hours with an empty trail are unflaggable →
    // anomaly coalesces false.
    //
    // 100 TB notes: the hourly pre-aggregate collapses the event stream
    // map-side FIRST (one shuffle keyed (hour, type)); the window then runs
    // over hours × types — bounded rows (a decade is <90k hours/type), so
    // the per-type window sort is trivially small no matter the event
    // volume. Never window the raw events.
    "e11_rate_anomaly" -> ((s, d) => rateAnomalyOf(ev(s, d))),

    // Gap-based sessionization (30-min inactivity): lag + cumulative sum —
    // the classic batch formulation of session windows.
    "e2_sessions" -> ((s, d) => {
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      // integer microsecond arithmetic: exact on both engines (no float gap)
      val newSession = when(
        epochUs(col("ts")) - lag(epochUs(col("ts")), 1).over(byUser) > 1800L * 1000000L, 1)
        .otherwise(when(lag(col("ts"), 1).over(byUser).isNull, 1).otherwise(0))
      ev(s, d)
        .withColumn("new_s", newSession)
        .withColumn("session_id", sum(col("new_s")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
             min("ts").as("session_start"),
             max("ts").as("session_end"))
    }),

    // JSON prop extraction + rollup per event type.
    "e3_json_stats" -> ((s, d) =>
      ev(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"), max("k").as("max_k"))),

    // Typed JSON parsing with an explicit schema (from_json -> struct),
    // complementing e3's path-based get_json_object.
    "e5_from_json" -> ((s, d) =>
      ev(s, d)
        .select(col("event_id"),
          from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT")).as("p"))
        .select(col("event_id"), col("p.k").as("k"))
        .where(col("k") >= 50)),

    // Native session windows (Spark's session_window) — same 30-min gap
    // semantics as e2's lag/cumsum formulation, structured-streaming-ready.
    "e6_session_window" -> ((s, d) =>
      ev(s, d)
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), min("ts").as("session_start"), max("ts").as("session_end"))
        .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))),

    // AS-OF JOIN (operator Spark lacks natively): each event matched to the
    // user's latest order at-or-before the event time. The scalable
    // formulation — tag + UNION both sides, one shuffle+sort per user,
    // last-non-null carry-forward over the time-ordered window — instead of
    // a skew-prone range join (no per-key cross product anywhere).
    "a1_asof_join" -> ((s, d) => {
      val events = ev(s, d).select(
        col("user_id"), col("ts"),
        col("event_id"), lit(null).cast("long").as("o_orderkey"), lit(1).as("kind"))
      val orders = Tables.orders(s, d).select(
        col("o_custkey").as("user_id"), col("o_orderdate").as("ts"),
        lit(null).cast("long").as("event_id"), col("o_orderkey"), lit(0).as("kind"))
      // ties: an order exactly at the event time counts (kind 0 sorts first);
      // equal-time orders resolve to the max o_orderkey (last in sort order)
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("kind").asc, col("o_orderkey").asc_nulls_last)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events.unionByName(orders)
        .withColumn("asof_orderkey", last(col("o_orderkey"), ignoreNulls = true).over(w))
        .where(col("kind") === 1)
        .select(col("event_id"), col("user_id"), col("ts"), col("asof_orderkey"))
    }),

    // HOPPING (sliding) windows: 1-hour windows every 15 minutes — each
    // event lands in exactly 4 overlapping windows (window() generates the
    // slide set per row; the explode is window_len/slide = 4×, then a plain
    // two-phase hash aggregate — partial map-side combine keeps the shuffle
    // at O(distinct windows × types), not O(events × 4), the
    // structured-streaming-compatible shape for rate dashboards).
    "e8_hopping_window" -> ((s, d) =>
      ev(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("window_start"), col("event_type"), col("n"))),

    // COHORT RETENTION: users grouped by first-active day, counted per
    // days-since-cohort offset — the standard growth-analytics matrix.
    // Shape: ONE explicit user_id exchange serves the whole pipeline — a
    // bare distinct() would hash by (user_id, day), which satisfies neither
    // the per-user min nor the join, costing two more full shuffles of the
    // daily stream; partitioning by user_id up front satisfies all three
    // (hash(user_id) clusters every distribution keyed on a superset).
    // No self-join of the raw event stream anywhere.
    "e9_retention" -> ((s, d) => {
      val daily = ev(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .repartition(col("user_id"))
        .distinct()
      val first = daily.groupBy("user_id").agg(min("day").as("cohort"))
      daily.join(first, "user_id")
        .groupBy(col("cohort"), datediff(col("day"), col("cohort")).as("day_n"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .select(col("cohort"), col("day_n"), col("n_users"))
    }),

    // Daily active users + event volume.
    "e4_daily_users" -> ((s, d) =>
      ev(s, d)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(countDistinct(col("user_id")).as("n_users"),
             count(lit(1)).as("n_events"))),

    // RANGE JOIN (pure non-equi: no shared key) — every event inside any
    // error-incident window [error ts, +10 min). Naive `ts BETWEEN
    // start AND end` plans a BroadcastNestedLoopJoin: O(events × windows)
    // comparisons, dead at scale. The Spark-native scale path is BIN
    // BUCKETING: quantize time into bins of exactly the window length, so
    // every window spans ≤ 2 bins and every event exactly 1 — explode the
    // window to its (≤2) bins, equi-join on the bin, then verify the precise
    // range. Shuffles O(events + 2·windows) rows by bin; pairs can't
    // duplicate (an event has ONE bin), so no dedup pass. Time-skew (a hot
    // bin during an event storm) AQE-splits like any hot equi-key; wider
    // windows = window_len/bin_len bins per window, same plan
    // (PlanSpec: no BroadcastNestedLoopJoin / CartesianProduct).
    "e7_range_join" -> ((s, d) => {
      val binUs = 600L * 1000000L // bin = window length (10 min), microseconds
      val e = ev(s, d)
      val inc = e.where(col("event_type") === "error" && col("event_id") % 50 === 0)
        .select(col("event_id").as("incident_id"), col("ts").as("w_start"),
          (col("ts") + expr("INTERVAL 10 MINUTES")).as("w_end"))
      val ibins = inc.select(col("incident_id"), col("w_start"), col("w_end"),
        explode(array_distinct(array(
          floor(epochUs(col("w_start")) / binUs),
          floor(epochUs(col("w_end")) / binUs)))).as("bin"))
      val ebins = e.select(col("event_id"), col("ts"),
        floor(epochUs(col("ts")) / binUs).as("bin"))
      ebins.join(ibins, "bin")
        .where(col("ts") >= col("w_start") && col("ts") < col("w_end"))
        .select(col("incident_id"), col("event_id"), col("ts"))
    }),

    // FUNNEL (e10, r08): strictly-ordered view -> click -> purchase
    // conversion per user — the standard product-analytics sequence match.
    // Formulated as a chain of per-user first-time aggregates (t1 = first
    // view; t2 = first click AFTER t1; t3 = first purchase AFTER t2): each
    // stage is a type-filtered scan joined to the previous stage's
    // 1-row-per-user frame, then a map-side-combinable MIN. Every join and
    // groupBy in the chain is keyed on user_id, so Spark reuses ONE hash
    // exchange per stage input and the stage frames (O(users) rows) never
    // re-shuffle the event stream. No window over all events per user, no
    // collect_list of a user's history — state per stage is one timestamp.
    "e10_funnel" -> ((s, d) => funnelOf(ev(s, d)))
  )

  /** Strictly-ordered 3-stage funnel over an (user_id, ts, event_type)
    * stream — parametric for the planted-fixture spec and the streaming
    * property spec; see the e10 notes. */
  private[graft] def funnelOf(e: DataFrame): DataFrame = {
    import graft.Checkpoints.EagerOps
    def firstAfter(etype: String, prev: DataFrame, prevTs: String, out: String) =
      e.where(col("event_type") === etype)
        .join(prev.select(col("user_id"), col(prevTs)), "user_id")
        .where(col("ts") > col(prevTs))
        .groupBy("user_id").agg(min("ts").as(out))
    // r18 (guide §7.2): v and c each feed TWO consumers (the next stage's
    // join and the final stage_reached assembly) — unstaged, the funnel
    // tree embedded SIX event scans (each stage's subtree re-contains its
    // predecessors'); staged, the events table is scanned exactly once per
    // stage filter (3 scans) and the per-user stage tables are block reads.
    val v = e.where(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t1"))
      .eagerCheckpoint()
    val c = firstAfter("click", v, "t1", "t2").eagerCheckpoint()
    val p = firstAfter("purchase", c, "t2", "t3")
    v.join(c.select("user_id", "t2"), Seq("user_id"), "left")
      .join(p.select("user_id", "t3"), Seq("user_id"), "left")
      .select(col("user_id"),
        when(col("t3").isNotNull, 3)
          .when(col("t2").isNotNull, 2)
          .otherwise(1).as("stage_reached"))
  }

  /** e11 trailing window length (hours) and burst multiplier — shared with
    * the streaming twin ([[graft.streaming.Streams.rateAnomalyStream]]). */
  private[graft] val TrailHours = 24
  private[graft] val BurstFactor = 2.0

  /** The e11 pipeline on any events frame (parametric for the planted-burst
    * spec): hourly (type, hour) counts, trailing-[[TrailHours]] WALL-CLOCK
    * mean — a RANGE frame over the integer epoch-hour ending one hour back
    * (ADVICE r11: a ROWS frame would span the last 24 *present* hours, so
    * after a quiet gap the "trailing day" silently reached back to
    * arbitrarily stale hours). Zero-event hours still emit no row (nothing
    * to flag there), but every emitted hour's trail now covers exactly the
    * preceding 24 wall-clock hours: a burst right after a >24 h silence has
    * an empty trail and is unflaggable (trail_avg null → false), not
    * compared against last week's rates. Flag when the hour runs past
    * [[BurstFactor]] × the trailing mean. */
  private[queries] def rateAnomalyOf(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"), col("w.start").as("hour"), col("n"))
    val trail = Window.partitionBy("event_type").orderBy(col("eh"))
      .rangeBetween(-TrailHours, -1)
    hourly
      .withColumn("eh", floor(epochUs(col("hour")) / (3600L * 1000000L)))
      .select(col("event_type"), col("hour"), col("n"),
        avg(col("n")).over(trail).as("trail_avg"))
      .withColumn("is_anomaly",
        coalesce(col("n") > lit(BurstFactor) * col("trail_avg"), lit(false)))
  }

  val oracles: Map[String, String] = Map(
    "e1_hourly_agg" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    // e11: integer counts + one IEEE division (avg over the frame) — no
    // stddev/libm, so flags match bit-for-bit. RANGE over the integer
    // epoch-hour = true wall-clock trailing day (ADVICE r11), same frame
    // as the Spark side's rangeBetween.
    "e11_rate_anomaly" ->
      s"""WITH h AS (
         |  SELECT event_type, date_trunc('hour', ts) AS hour,
         |         epoch_us(date_trunc('hour', ts)) // 3600000000 AS eh, COUNT(*) AS n
         |  FROM events GROUP BY 1, 2, 3),
         |t AS (
         |  SELECT event_type, hour, n,
         |    avg(n) OVER (PARTITION BY event_type ORDER BY eh
         |                 RANGE BETWEEN $TrailHours PRECEDING AND 1 PRECEDING) AS trail_avg
         |  FROM h)
         |SELECT event_type, hour, n, trail_avg,
         |       coalesce(n > $BurstFactor * trail_avg, false) AS is_anomaly
         |FROM t""".stripMargin,

    "e2_sessions" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL THEN 1
        |         WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000 THEN 1
        |         ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  -- CAST: DuckDB SUM(int) is HUGEINT, which renders as float through
        |  -- the comparator; BIGINT matches Spark's window-sum type exactly.
        |  SELECT user_id, ts,
        |    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |       MIN(ts) AS session_start, MAX(ts) AS session_end
        |FROM sess GROUP BY user_id, session_id""".stripMargin,

    "e3_json_stats" ->
      """SELECT event_type, COUNT(*) AS n,
        |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
        |       CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k
        |FROM events GROUP BY event_type""".stripMargin,

    "e5_from_json" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS INT) >= 50""".stripMargin,

    "e6_session_window" ->
      """WITH flagged AS (
        |  -- >= (not >): Spark's session_window end is EXCLUSIVE — an event at
        |  -- exactly lastTs + 30min starts a new session. e2's lag/cumsum
        |  -- formulation intentionally keeps the strict-> boundary on both
        |  -- engines; only this native-session-window twin uses >=.
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL THEN 1
        |         WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800 * 1000000 THEN 1
        |         ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, ts,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged)
        |SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
        |       COUNT(*) AS n_events
        |FROM sess GROUP BY user_id, sid""".stripMargin,

    // The oracle states the range join declaratively (DuckDB's optimizer has
    // a native IEJoin for this); the Spark side proves the binned equi-join
    // produces the identical pair set.
    "e7_range_join" ->
      """WITH inc AS (
        |  SELECT event_id AS incident_id, ts AS w_start,
        |         ts + INTERVAL 10 MINUTE AS w_end
        |  FROM events WHERE event_type = 'error' AND event_id % 50 = 0)
        |SELECT i.incident_id, e.event_id, e.ts
        |FROM events e JOIN inc i
        |  ON e.ts >= i.w_start AND e.ts < i.w_end""".stripMargin,

    "a1_asof_join" ->
      """WITH u AS (
        |  SELECT user_id, ts, event_id, CAST(NULL AS BIGINT) AS o_orderkey, 1 AS kind
        |  FROM events
        |  UNION ALL
        |  SELECT o_custkey AS user_id, o_orderdate AS ts,
        |         CAST(NULL AS BIGINT) AS event_id, o_orderkey, 0 AS kind
        |  FROM orders)
        |SELECT event_id, user_id, ts, asof_orderkey FROM (
        |  SELECT user_id, ts, event_id, kind,
        |    last_value(o_orderkey IGNORE NULLS) OVER (
        |      PARTITION BY user_id
        |      ORDER BY ts ASC, kind ASC, o_orderkey ASC NULLS LAST
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_orderkey
        |  FROM u)
        |WHERE kind = 1""".stripMargin,

    // each event expands to its 4 slide-aligned windows: start =
    // (floor(ts/15min) − j)·15min for j in 0..3 — exactly Spark's
    // epoch-aligned window(ts, '1 hour', '15 minutes') set.
    "e8_hopping_window" ->
      """SELECT make_timestamp((epoch_us(ts) // 900000000 - j) * 900000000)
        |         AS window_start,
        |       event_type, COUNT(*) AS n
        |FROM events, range(4) t(j)
        |GROUP BY 1, 2""".stripMargin,

    "e9_retention" ->
      """WITH daily AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |firstd AS (SELECT user_id, MIN(day) AS cohort FROM daily GROUP BY user_id)
        |SELECT cohort, CAST(datediff('day', cohort, day) AS INT) AS day_n,
        |       COUNT(DISTINCT daily.user_id) AS n_users
        |FROM daily JOIN firstd ON daily.user_id = firstd.user_id
        |GROUP BY 1, 2""".stripMargin,

    "e4_daily_users" ->
      """SELECT CAST(ts AS DATE) AS day,
        |       COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
        |FROM events GROUP BY 1""".stripMargin,

    // strict ordering (>) at every stage, exactly as the engine's chain
    "e10_funnel" ->
      """WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events
        |           WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, MIN(e.ts) AS t2
        |      FROM events e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
        |p AS (SELECT e.user_id, MIN(e.ts) AS t3
        |      FROM events e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
        |SELECT v.user_id AS user_id,
        |  CASE WHEN p.t3 IS NOT NULL THEN 3
        |       WHEN c.t2 IS NOT NULL THEN 2
        |       ELSE 1 END AS stage_reached
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |       LEFT JOIN p ON v.user_id = p.user_id""".stripMargin
  )
}
