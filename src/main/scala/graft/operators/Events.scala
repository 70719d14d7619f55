package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Event-pipeline semantics of the reference, re-expressed over the
  * `events` testdata table:
  *
  *  - whitelist filtering + type routing   (reference process_events.go:49-61,
  *    119-145 — events matched against a type whitelist and dispatched)
  *  - JSON attribute parsing               (db.go:842-937 — `[{key,value}]`
  *    payloads parsed into typed columns; here via native `from_json`)
  *  - latest-wins upsert                   (db.go:1171-1175 ON CONFLICT DO
  *    UPDATE on last_commit_values; = argmax window per key)
  *  - first-wins insert-ignore             (db.go:744-747 ON CONFLICT DO
  *    NOTHING on events; = min-by per key)
  *  - EMA maintenance                      (db.go:1334-1339 ema_scores)
  *  - sessionization / running totals      (tokenomics-style time series,
  *    db.go:1352-1410)
  *
  * All window operators partition by a key (user) so state is bounded per
  * key and the shuffle is a clean hash partition — no global windows except
  * the day-level running total whose domain (days) is tiny by construction.
  */
object Events {

  /** Whitelist + route: drop non-whitelisted types, map to categories,
    * aggregate per category. Mirrors FilterEvents + the insertEvents
    * dispatch (db.go:691-740).
    */
  def routeCounts(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val category = when(col("event_type").isin("click", "view"), "engagement")
      .when(col("event_type").isin("purchase", "signup"), "conversion")
    e.select(category.as("category"), col("user_id"), col("value"))
      .filter(col("category").isNotNull)
      .groupBy(col("category"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        round(sum(col("value")), 2).as("total_value"))
      .orderBy("category")
  }

  val routeCountsOracle: String =
    """SELECT CASE WHEN event_type IN ('click', 'view') THEN 'engagement'
                   WHEN event_type IN ('purchase', 'signup') THEN 'conversion' END AS category,
       count(*) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       round(sum(value), 2) AS total_value
       FROM events
       WHERE event_type IN ('click', 'view', 'purchase', 'signup')
       GROUP BY 1 ORDER BY 1"""

  /** Native JSON attribute extraction (schema'd `from_json`, codegen'd —
    * no string UDFs), bucketed aggregation over the extracted key.
    */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame = {
    // from_json is the one CPU-heavy per-row projection over this table —
    // fan the scan out before it so the parse parallelizes (see Tables.fanout).
    val e = Tables.fanout(Tables.events(spark, dir))
    val props = from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
    e.select(props.getField("k").as("k"), col("value"))
      .select(floor(col("k") / 10).as("k_bucket"), col("value"))
      .groupBy(col("k_bucket"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .withColumn("avg_value", floor(col("total_value") / col("n_events") * 1e4) / 1e4)
      .orderBy("k_bucket")
  }

  val jsonExtractOracle: String =
    """SELECT CAST(floor(CAST(json_extract_string(props, '$.k') AS INT) / 10) AS BIGINT) AS k_bucket,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value,
       floor(round(sum(value), 2) / count(*) * 1e4) / 1e4 AS avg_value
       FROM events GROUP BY 1 ORDER BY 1"""

  /** Latest-wins upsert per key (ON CONFLICT DO UPDATE semantics): the
    * newest event per user wins. Event ids are assigned in timestamp order,
    * so ordering by id avoids cross-engine sub-microsecond timestamp
    * comparisons. A two-phase `max_by` hash aggregate, not a window: each
    * map partition forwards one candidate per user, so a hot user (a 10⁹-
    * event bot key) costs O(partitions) after the map side instead of one
    * reducer sorting its full history — same shape as [[dedupFirst]].
    */
  def latestPerUser(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    // ONE max_by over a payload struct, not one aggregate per output
    // column: independent max_by calls resolve an event_id tie
    // independently, composing a (type, value) pair that never existed
    // as one physical event. The full (id, type, value) ordering struct
    // also makes the tie itself deterministic.
    val payload = struct(col("event_id"), col("event_type"), col("value"))
    e.groupBy(col("user_id"))
      .agg(max_by(payload, payload).as("last"))
      .select(col("user_id"),
        col("last.event_id").as("last_event_id"),
        col("last.event_type").as("last_type"),
        round(col("last.value"), 2).as("last_value"))
      .orderBy("user_id")
  }

  val latestPerUserOracle: String =
    """SELECT user_id, event_id AS last_event_id, event_type AS last_type,
       round(value, 2) AS last_value
       FROM (SELECT *, row_number() OVER (PARTITION BY user_id
               ORDER BY event_id DESC, event_type DESC, value DESC) AS rn
             FROM events) WHERE rn = 1 ORDER BY user_id"""

  /** First-wins insert-ignore per (user, type) key (ON CONFLICT DO NOTHING):
    * keep the first event, count the ignored duplicates.
    */
  def dedupFirst(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    // Same single-struct discipline as [[latestPerUser]]: id and value
    // come from ONE physical row even under duplicate event_ids.
    val payload = struct(col("event_id"), col("value"))
    e.groupBy(col("user_id"), col("event_type"))
      .agg(
        min_by(payload, payload).as("first"),
        (count(lit(1)) - 1).as("n_ignored"))
      .select(col("user_id"), col("event_type"),
        col("first.event_id").as("first_event_id"),
        round(col("first.value"), 2).as("first_value"),
        col("n_ignored"))
      .orderBy("user_id", "event_type")
  }

  val dedupFirstOracle: String =
    """SELECT user_id, event_type, event_id AS first_event_id,
       round(value, 2) AS first_value, n_ignored
       FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
               ORDER BY event_id, value) AS rn,
               count(*) OVER (PARTITION BY user_id, event_type) - 1 AS n_ignored
             FROM events) WHERE rn = 1 ORDER BY user_id, event_type"""

  /** Gap-based sessionization: a >30-minute silence starts a new session.
    * Timestamps are compared at whole-second resolution on both engines
    * (parquet stores nanoseconds; Spark reads microseconds — truncating to
    * seconds makes the session boundaries engine-portable).
    *
    * Hot-key residual (SURVEY §5): the gap test needs each user's events
    * in time order, so one user's full history sorts on one reducer —
    * unlike the argmax upserts, an order-dependent fold cannot become a
    * commutative aggregate. A 10⁹-event bot key serializes there; the
    * bounds are re-keying by (user, day) when session semantics allow a
    * day cut (browseAbandon does), or the streaming `session_window` /
    * `flatMapGroupsWithState` path (EventStream), whose state is bounded
    * by the watermark horizon instead of the key's history.
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("sec"))
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    val gap = col("sec") - lag(col("sec"), 1).over(byUser)
    val sessions = e
      .withColumn("new_session", when(gap.isNull || gap > 1800, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"), (max(col("sec")) - min(col("sec"))).as("dur_sec"))
    sessions
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"),
        max(col("n_events")).as("max_session_events"),
        (floor(sum(col("n_events")) / count(lit(1)) * 1e4) / 1e4).as("avg_session_events"),
        sum(col("dur_sec")).as("total_session_sec"))
      .orderBy("user_id")
  }

  val sessionizeOracle: String =
    """WITH e AS (SELECT user_id, event_id, epoch_us(ts) // 1000000 AS sec FROM events),
       flagged AS (
         SELECT user_id, event_id, sec,
           CASE WHEN sec - lag(sec) OVER (PARTITION BY user_id ORDER BY event_id) > 1800
                  OR lag(sec) OVER (PARTITION BY user_id ORDER BY event_id) IS NULL
                THEN 1 ELSE 0 END AS new_session
         FROM e),
       numbered AS (
         SELECT user_id, sec,
           sum(new_session) OVER (PARTITION BY user_id ORDER BY event_id
                                  ROWS UNBOUNDED PRECEDING) AS session_id
         FROM flagged),
       sessions AS (
         SELECT user_id, session_id, count(*) AS n_events,
                max(sec) - min(sec) AS dur_sec
         FROM numbered GROUP BY 1, 2)
       SELECT user_id, count(*) AS n_sessions,
              CAST(sum(n_events) AS BIGINT) AS n_events,
              CAST(max(n_events) AS BIGINT) AS max_session_events,
              floor(sum(n_events) / count(*) * 1e4) / 1e4 AS avg_session_events,
              CAST(sum(dur_sec) AS BIGINT) AS total_session_sec
       FROM sessions GROUP BY user_id ORDER BY user_id"""

  /** [[sessionize]]'s hot-key-bounded variant: the same >30-minute gap
    * rule re-keyed by (user, UTC day) — the skew mitigation the
    * sessionize Scaladoc documents, made real. A 10⁹-event bot user no
    * longer serializes its full history onto one reducer: every window
    * partition is capped at one user-DAY of events, at the documented
    * semantic cost that a session spanning midnight splits in two
    * (acceptable wherever downstream consumes daily rollups anyway —
    * exactly this output shape). Output: per (user, day) session stats.
    */
  def sessionizeDaily(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("event_id"), unix_timestamp(col("ts")).as("sec"))
    val byKey = Window.partitionBy(col("user_id"), col("day")).orderBy(col("event_id"))
    val gap = col("sec") - lag(col("sec"), 1).over(byKey)
    e.withColumn("new_session", when(gap.isNull || gap > 1800, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("new_session")).over(byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("day"), col("session_id"))
      .agg(count(lit(1)).as("n_events"), (max(col("sec")) - min(col("sec"))).as("dur_sec"))
      .groupBy(col("user_id"), col("day"))
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"),
        sum(col("dur_sec")).as("total_session_sec"))
      .orderBy("user_id", "day")
  }

  val sessionizeDailyOracle: String =
    """WITH e AS (SELECT user_id, strftime(ts, '%Y-%m-%d') AS day, event_id,
                    epoch_us(ts) // 1000000 AS sec FROM events),
       flagged AS (
         SELECT user_id, day, event_id, sec,
           CASE WHEN sec - lag(sec) OVER (PARTITION BY user_id, day ORDER BY event_id) > 1800
                  OR lag(sec) OVER (PARTITION BY user_id, day ORDER BY event_id) IS NULL
                THEN 1 ELSE 0 END AS new_session
         FROM e),
       numbered AS (
         SELECT user_id, day, sec,
           sum(new_session) OVER (PARTITION BY user_id, day ORDER BY event_id
                                  ROWS UNBOUNDED PRECEDING) AS session_id
         FROM flagged),
       sessions AS (
         SELECT user_id, day, session_id, count(*) AS n_events,
                max(sec) - min(sec) AS dur_sec
         FROM numbered GROUP BY 1, 2, 3)
       SELECT user_id, day, count(*) AS n_sessions,
              CAST(sum(n_events) AS BIGINT) AS n_events,
              CAST(sum(dur_sec) AS BIGINT) AS total_session_sec
       FROM sessions GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Daily totals + running cumulative (tokenomics-style supply series).
    * The cumulative window runs over rounded daily sums so both engines
    * accumulate identical 2-decimal increments.
    */
  def runningTotal(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).filter(col("event_type") === "purchase")
    val daily = e.groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(round(sum(col("value")), 2).as("daily_value"), count(lit(1)).as("n_purchases"))
    val w = Window.orderBy(col("day")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("cumulative_value", round(sum(col("daily_value")).over(w), 2))
      .orderBy("day")
  }

  val runningTotalOracle: String =
    """WITH daily AS (
         SELECT strftime(ts, '%Y-%m-%d') AS day, round(sum(value), 2) AS daily_value,
                count(*) AS n_purchases
         FROM events WHERE event_type = 'purchase' GROUP BY 1)
       SELECT day, daily_value, n_purchases,
              round(sum(daily_value) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING), 2)
                AS cumulative_value
       FROM daily ORDER BY day"""

  /** Per-user EMA (alpha = 0.2) over the event sequence — the `ema_scores`
    * maintenance loop as one declarative pass, via the closed form
    * ema_n = 0.8^(n−1)·v₁ + Σᵢ 0.2·0.8^(n−i)·vᵢ: one window pass assigns
    * (rank, count) per user, one hash aggregation sums the weighted terms.
    * No per-key array is ever materialized — a skewed user with millions
    * of events flows through the window sort (which spills) and an
    * incremental aggregation, instead of a collect_list that would hold
    * the whole history in one executor row.
    */
  def ema(spark: SparkSession, dir: String): DataFrame =
    emaOf(Tables.events(spark, dir))

  private[operators] def emaOf(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    events
      .select(col("user_id"), col("event_id"), col("value"))
      .withColumn("rn", row_number().over(byUser))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("user_id"))))
      .groupBy(col("user_id"))
      .agg(
        round(
          sum(
            when(col("rn") === 1, pow(lit(0.8), col("n") - 1) * col("value"))
              .otherwise(lit(0.2) * pow(lit(0.8), col("n") - col("rn")) * col("value"))),
          4).as("ema"),
        max(col("n")).as("n_events"))
      .orderBy("user_id")
  }

  /** Closed form of the same fold: ema_n = 0.8^(n-1) v_1 + Σ 0.2·0.8^(n-i) v_i. */
  val emaOracle: String =
    """WITH r AS (
         SELECT user_id, value,
                row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn,
                count(*) OVER (PARTITION BY user_id) AS n
         FROM events)
       SELECT user_id,
              round(sum(CASE WHEN rn = 1 THEN power(0.8, n - 1) * value
                             ELSE 0.2 * power(0.8, n - rn) * value END), 4) AS ema,
              CAST(max(n) AS BIGINT) AS n_events
       FROM r GROUP BY user_id ORDER BY user_id"""

  /** Z-score outlier detection per event type — the monitoring query over
    * the metric stream (which events deviate > 3σ from their type's
    * distribution). Two-pass shape: one hash aggregation produces the tiny
    * per-type (mean, stddev) frame, which joins back against the fact scan
    * — the stats side is O(|types|), a true dim, so the join broadcasts at
    * any corpus size.
    */
  def anomalies(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val stats = e.groupBy(col("event_type"))
      .agg(avg(col("value")).as("mu"), stddev_samp(col("value")).as("sigma"))
    e.join(broadcast(stats), "event_type")
      .filter(abs(col("value") - col("mu")) > lit(3) * col("sigma"))
      .select(col("event_id"), col("event_type"), col("value"),
        (floor((col("value") - col("mu")) / col("sigma") * 1e4) / 1e4).as("z"))
      .orderBy("event_id")
  }

  val anomaliesOracle: String =
    """WITH s AS (SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sigma
                  FROM events GROUP BY 1)
       SELECT event_id, event_type, value,
              floor((value - mu) / sigma * 1e4) / 1e4 AS z
       FROM events JOIN s USING (event_type)
       WHERE abs(value - mu) > 3 * sigma
       ORDER BY event_id"""

  /** Fixed-width value histogram per event type — the distribution probe
    * behind dashboards and drift monitors. Bucketing is a pure projection
    * (`floor(value / width)`), so the whole histogram is one map-side
    * partial-aggregated groupBy; bucket cardinality is bounded by the
    * value range, never the row count.
    */
  def histogram(spark: SparkSession, dir: String): DataFrame = {
    val width = 10.0
    Tables.events(spark, dir)
      .groupBy(col("event_type"),
        floor(col("value") / width).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("bucket_sum"))
      .withColumn("lo", col("bucket") * width)
      .orderBy("event_type", "bucket")
  }

  val histogramOracle: String =
    """SELECT event_type, CAST(floor(value / 10.0) AS BIGINT) AS bucket,
              count(*) AS n_events, round(sum(value), 2) AS bucket_sum,
              CAST(floor(value / 10.0) AS BIGINT) * 10.0 AS lo
       FROM events GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Per-day, per-type stats (time-bucketed multi-agg). */
  def dailyStats(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    e.groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"),
        round(min(col("value")), 2).as("min_value"),
        round(max(col("value")), 2).as("max_value"))
      .withColumn("avg_value", floor(col("total_value") / col("n_events") * 1e4) / 1e4)
      .orderBy("day", "event_type")
  }

  val dailyStatsOracle: String =
    """SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, count(*) AS n_events,
       round(sum(value), 2) AS total_value,
       round(min(value), 2) AS min_value,
       round(max(value), 2) AS max_value,
       floor(round(sum(value), 2) / count(*) * 1e4) / 1e4 AS avg_value
       FROM events GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Top-K users by total value (score-ranking shape). */
  def topkUsers(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    e.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
      .orderBy(col("total_value").desc, col("user_id"))
      .limit(10)
  }

  val topkUsersOracle: String =
    """SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value
       FROM events GROUP BY 1 ORDER BY total_value DESC, user_id LIMIT 10"""

  /** As-of join, per key: each purchase is matched to the user's most
    * recent signup at or before it. Implemented the scalable way — no
    * range-join explosion: union the two "streams" (they already share the
    * events table), then `last(..., ignoreNulls)` over an unbounded
    * preceding frame carries the latest signup id forward. One hash
    * partition by user, one sort — the same plan shape at any scale.
    */
  def asofSignup(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("last_signup_event_id",
        last(when(col("event_type") === "signup", col("event_id")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("last_signup_event_id"))
      .orderBy("user_id", "event_id")
  }

  val asofSignupOracle: String =
    """SELECT user_id, event_id, last_signup_event_id FROM (
         SELECT user_id, event_id, event_type,
           last_value(CASE WHEN event_type = 'signup' THEN event_id END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY event_id ROWS UNBOUNDED PRECEDING)
             AS last_signup_event_id
         FROM events)
       WHERE event_type = 'purchase' ORDER BY 1, 2"""

  /** 7-day moving average of daily revenue (frame-bounded window over the
    * pre-rounded daily series, so both engines average identical doubles).
    * The unpartitioned window is safe at any corpus size because it runs
    * over the AGGREGATED |days| domain, never raw events — the partial
    * daily aggregate absorbs the volume; a hot day is just one row here
    * (SURVEY §5 hot-key note).
    */
  def movingAvg(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val daily = e.groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(round(sum(col("value")), 2).as("daily_value"))
    val w = Window.orderBy(col("day")).rowsBetween(-6, Window.currentRow)
    daily
      .withColumn("ma7",
        floor(sum(col("daily_value")).over(w) / count(lit(1)).over(w) * 1e4) / 1e4)
      .orderBy("day")
  }

  val movingAvgOracle: String =
    """WITH daily AS (
         SELECT strftime(ts, '%Y-%m-%d') AS day, round(sum(value), 2) AS daily_value
         FROM events GROUP BY 1)
       SELECT day, daily_value,
         floor(sum(daily_value) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
               / count(*) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
               * 1e4) / 1e4 AS ma7
       FROM daily ORDER BY day"""

  /** Approximate distinct users per type (HyperLogLog++). Sketches are not
    * engine-portable — rows-only gate; EventsSpec bounds the error against
    * the exact count.
    */
  def hllUsers(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    e.groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        count(lit(1)).as("n_events"))
      .orderBy("event_type")
  }

  /** CUBE over (day-of-week, event_type): all four grouping combinations
    * in one pass, NULL keys labeled for comparator stability.
    */
  def cubeStats(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    e.select(date_format(col("ts"), "EEEE").as("dow"), col("event_type"), col("value"))
      .cube(col("dow"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
      .select(
        coalesce(col("dow"), lit("ALL")).as("dow"),
        coalesce(col("event_type"), lit("ALL")).as("event_type"),
        col("n_events"), col("total_value"))
      .orderBy("dow", "event_type")
  }

  val cubeStatsOracle: String =
    """SELECT coalesce(strftime(ts, '%A'), 'ALL') AS dow,
       coalesce(event_type, 'ALL') AS event_type,
       count(*) AS n_events, round(sum(value), 2) AS total_value
       FROM events GROUP BY CUBE (strftime(ts, '%A'), event_type)
       ORDER BY 1, 2"""

  /** dense_rank + lag in one window pass: per user, rank days by daily
    * total and the delta vs the previous day.
    */
  def dailyRankDelta(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    // Group on the DATE value and render the day string on the 10³×
    // smaller aggregated frame: formatting inside the grouping key ran
    // the formatter once per event (the whole query's dominant cost at
    // 10× SF, 13× scaling), and yyyy-MM-dd date order equals its string
    // order, so the windows and output are unchanged.
    val daily = e.groupBy(col("user_id"), to_date(col("ts")).as("d"))
      .agg(round(sum(col("value")), 2).as("daily_value"))
      .withColumn("day", date_format(col("d"), "yyyy-MM-dd"))
    val byDay = Window.partitionBy(col("user_id")).orderBy(col("d"))
    val byValue = Window.partitionBy(col("user_id"))
      .orderBy(col("daily_value").desc, col("d"))
    daily
      .withColumn("value_rank", dense_rank().over(byValue).cast("long"))
      .withColumn("prev_value", lag(col("daily_value"), 1).over(byDay))
      .withColumn("delta", round(col("daily_value") - coalesce(col("prev_value"), lit(0.0)), 2))
      .drop("prev_value", "d")
      .orderBy("user_id", "day")
  }

  val dailyRankDeltaOracle: String =
    """WITH daily AS (
         SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
                round(sum(value), 2) AS daily_value
         FROM events GROUP BY 1, 2)
       SELECT user_id, day, daily_value,
         dense_rank() OVER (PARTITION BY user_id ORDER BY daily_value DESC, day) AS value_rank,
         round(daily_value - coalesce(lag(daily_value) OVER (PARTITION BY user_id ORDER BY day), 0.0), 2) AS delta
       FROM daily ORDER BY user_id, day"""

  /** Cohort retention: users grouped by signup week, counted per weeks-
    * since-signup in which they were active. The self-reference is one
    * extra scan, both sides reduced before the join.
    */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val firstSeen = e.groupBy(col("user_id"))
      .agg(min(date_trunc("week", col("ts"))).as("cohort_week"))
    val activity = e.select(col("user_id"), date_trunc("week", col("ts")).as("active_week"))
      .distinct()
    // firstSeen is per-user (grows with the fact data) — no broadcast pin;
    // AQE broadcasts while it fits, shuffles on user_id beyond that.
    activity.join(firstSeen, "user_id")
      .select(
        date_format(col("cohort_week"), "yyyy-MM-dd").as("cohort"),
        // both weeks are Monday-truncated, so the day gap is an exact
        // multiple of 7
        (datediff(col("active_week"), col("cohort_week")) / 7).cast("long").as("weeks_since"))
      .groupBy(col("cohort"), col("weeks_since"))
      .agg(count(lit(1)).as("n_active_users"))
      .orderBy("cohort", "weeks_since")
  }

  val cohortRetentionOracle: String =
    """WITH f AS (SELECT user_id, min(date_trunc('week', ts)) AS cohort_week
                  FROM events GROUP BY 1),
       a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week FROM events)
       SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort,
              CAST(date_diff('day', cohort_week, active_week) // 7 AS BIGINT) AS weeks_since,
              count(*) AS n_active_users
       FROM a JOIN f USING (user_id)
       GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Funnel conversion: per user, did a purchase follow a signup? One pass
    * per key — min signup position against max purchase position — then a
    * corpus-level conversion summary.
    */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val perUser = e.groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "signup", col("event_id"))).as("first_signup"),
        max(when(col("event_type") === "purchase", col("event_id"))).as("last_purchase"))
    perUser.select(
        when(col("first_signup").isNull, "never_signed_up")
          .when(col("last_purchase").isNull, "signed_up_no_purchase")
          .when(col("last_purchase") > col("first_signup"), "converted")
          .otherwise("purchased_before_signup").as("funnel_stage"))
      .groupBy(col("funnel_stage"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("funnel_stage")
  }

  val funnelOracle: String =
    """WITH p AS (
         SELECT user_id,
           min(CASE WHEN event_type = 'signup' THEN event_id END) AS first_signup,
           max(CASE WHEN event_type = 'purchase' THEN event_id END) AS last_purchase
         FROM events GROUP BY 1)
       SELECT CASE WHEN first_signup IS NULL THEN 'never_signed_up'
                   WHEN last_purchase IS NULL THEN 'signed_up_no_purchase'
                   WHEN last_purchase > first_signup THEN 'converted'
                   ELSE 'purchased_before_signup' END AS funnel_stage,
              count(*) AS n_users
       FROM p GROUP BY 1 ORDER BY 1"""

  /** Exact decimal aggregation — the reference's NUMERIC(72,18) discipline
    * (db.go:414): values cast to a fixed-scale decimal before summation, so
    * totals are exact and engine-identical by construction (no float
    * rounding policy needed at all).
    */
  def decimalTotals(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    e.select(col("event_type"), col("value").cast("decimal(38,6)").as("dv"))
      .groupBy(col("event_type"))
      .agg(
        // exact decimal sum; emitted as double (decimal *string* forms
        // differ between engines — 101951.000000 vs 101951.0)
        round(sum(col("dv")).cast("double"), 2).as("total"),
        count(lit(1)).as("n_events"))
      .orderBy("event_type")
  }

  val decimalTotalsOracle: String =
    """SELECT event_type,
       round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 2) AS total,
       count(*) AS n_events
       FROM events GROUP BY 1 ORDER BY 1"""

  /** Pivot event types into per-user count columns. */
  def pivotTypes(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    e.groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .count()
      .na.fill(0L)
      .orderBy("user_id")
  }

  val pivotTypesOracle: String =
    """SELECT user_id,
       count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
       count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
       count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
       count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
       count(CASE WHEN event_type = 'view' THEN 1 END) AS view
       FROM events GROUP BY user_id ORDER BY user_id"""

  /** Gap-filled daily activity: a dense (user × day) spine with zero rows
    * for inactive days — the densification step reports and ML feature
    * frames need (a raw groupBy silently drops absent days). The spine is
    * generated, not scanned: the day range comes from a 1-row global
    * aggregate, `sequence()` explodes it into the bounded day domain, and
    * the user dim cross-joins the broadcast DAY list — O(users × days)
    * rows, never a function of the event count. Note the spine is NOT
    * small at scale: millions of users × 365 days is a fact-sized frame,
    * so the left join back to the per-(user, day) aggregate is left to
    * AQE — a shuffle join on (user_id, day) at scale, with no broadcast
    * pin on either side (only the 1-row day LIST is broadcast). The
    * caller bounds the user dim (here `user_id < 10`, the gate's report
    * cohort); an unbounded gap-fill over all users should densify only
    * the cohorts a report actually plots.
    */
  def gapFill(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).filter(col("user_id") < 10)
    val days = Tables.events(spark, dir)
      .agg(min(to_date(col("ts"))).as("d0"), max(to_date(col("ts"))).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day_d"))
    val users = e.select(col("user_id")).distinct()
    val spine = users.crossJoin(broadcast(days))
    val daily = e.groupBy(col("user_id"), to_date(col("ts")).as("day_d"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
    spine.join(daily, Seq("user_id", "day_d"), "left")
      .select(
        col("user_id"),
        date_format(col("day_d"), "yyyy-MM-dd").as("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("total_value"), lit(0.0)).as("total_value"))
      .orderBy("user_id", "day")
  }

  val gapFillOracle: String =
    """WITH b AS (SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
                  FROM events),
       days AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
                  AS day_d FROM b),
       u AS (SELECT DISTINCT user_id FROM events WHERE user_id < 10),
       daily AS (SELECT user_id, CAST(ts AS DATE) AS day_d,
                   count(*) AS n, round(sum(value), 2) AS tv
                 FROM events WHERE user_id < 10 GROUP BY 1, 2)
       SELECT u.user_id, strftime(days.day_d, '%Y-%m-%d') AS day,
              CAST(coalesce(daily.n, 0) AS BIGINT) AS n_events,
              coalesce(daily.tv, 0.0) AS total_value
       FROM u CROSS JOIN days
       LEFT JOIN daily ON daily.user_id = u.user_id AND daily.day_d = days.day_d
       ORDER BY 1, 2"""

  /** Per-user lifecycle summary: first/last activity, active days, tenure
    * and intensity — the account-level rollup the reference's per-actor
    * tables serve (addresses first/last seen). One hash aggregation over
    * the event scan; active days is a count-distinct on the date, which
    * Spark plans as a two-phase partial aggregate on (user, day).
    */
  def userLifecycle(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    e.groupBy(col("user_id"))
      .agg(
        date_format(min(col("ts")), "yyyy-MM-dd").as("first_day"),
        date_format(max(col("ts")), "yyyy-MM-dd").as("last_day"),
        countDistinct(to_date(col("ts"))).as("active_days"),
        count(lit(1)).as("n_events"),
        (datediff(to_date(max(col("ts"))), to_date(min(col("ts")))) + 1)
          .cast("long").as("span_days"))
      .withColumn("events_per_active_day",
        floor(col("n_events") / col("active_days") * 1e4) / 1e4)
      .orderBy("user_id")
  }

  val userLifecycleOracle: String =
    """SELECT user_id,
       strftime(min(ts), '%Y-%m-%d') AS first_day,
       strftime(max(ts), '%Y-%m-%d') AS last_day,
       CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS active_days,
       count(*) AS n_events,
       CAST(date_diff('day', min(CAST(ts AS DATE)), max(CAST(ts AS DATE))) + 1
            AS BIGINT) AS span_days,
       floor(count(*) * 1.0 / count(DISTINCT CAST(ts AS DATE)) * 1e4) / 1e4
         AS events_per_active_day
       FROM events GROUP BY user_id ORDER BY user_id"""

  /** Interval context join: for every purchase, how many views the same
    * user made in the preceding hour — the event-context feature an
    * attribution or recommendation pipeline derives. The range predicate
    * rides on a user_id equi-join (never a cross product): both sides
    * shuffle once on user_id and the time window filters within the
    * joined key group, whose size is bounded per user. Purchases with no
    * preceding views survive the left join with a zero count.
    */
  def purchaseContext(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("pts"))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id").as("v_uid"), col("ts").as("vts"))
    purchases.join(views,
        col("user_id") === col("v_uid") &&
          col("vts") >= col("pts") - expr("INTERVAL 1 HOUR") &&
          col("vts") < col("pts"),
        "left")
      .groupBy(col("purchase_id"))
      .agg(count(col("vts")).as("n_views_1h"))
      .orderBy("purchase_id")
  }

  val purchaseContextOracle: String =
    """SELECT p.event_id AS purchase_id, count(v.ts) AS n_views_1h
       FROM events p
       LEFT JOIN events v
         ON v.user_id = p.user_id AND v.event_type = 'view'
        AND v.ts >= p.ts - INTERVAL 1 HOUR AND v.ts < p.ts
       WHERE p.event_type = 'purchase'
       GROUP BY 1 ORDER BY 1"""

  /** Approximate per-type value quantiles via `approx_percentile`
    * (Greenwald-Khanna sketch): the mergeable-summary path for quantiles
    * at 100 TB, where the exact `percentile` (used by text_len_quantiles
    * on a bounded domain) would buffer whole groups. The sketch is
    * partial-aggregated map-side and merged — O(1/ε log εN) state per
    * group, never the group's row count. No SQL oracle (sketch internals
    * are not engine-portable); EventsSpec bounds each approximate
    * quantile's RANK error against the exact distribution — the guarantee
    * the sketch actually makes.
    */
  def valueQuantilesApprox(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        (floor(approx_percentile(col("value"), lit(0.5), lit(1000)) * 1e4) / 1e4)
          .as("p50"),
        (floor(approx_percentile(col("value"), lit(0.95), lit(1000)) * 1e4) / 1e4)
          .as("p95"),
        (floor(approx_percentile(col("value"), lit(0.99), lit(1000)) * 1e4) / 1e4)
          .as("p99"))
      .orderBy("event_type")

  /** Trailing 7-day distinct active users per day — the rolling-DAU
    * dashboard metric. A distinct-over-range window doesn't exist in any
    * engine, and a day-spine range join would nested-loop; instead the
    * event stream is first reduced to distinct (user, day) pairs (one
    * shuffle, and the frame every later step runs on), then each pair
    * projects the ≤ 7 report days it contributes to (`sequence` explode —
    * a pure projection, no join), and one count-distinct aggregation
    * finishes. At 100 TB the 7× fanout applies to the distinct-pair
    * frame, not the raw events. For sketch-sized state instead of exact
    * counts, ev_hll_users is the approximate variant of the same rollup.
    */
  def rollingDau(spark: SparkSession, dir: String): DataFrame = {
    val ud = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("d"), col("user_id")).distinct()
    val bounds = ud.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    ud.select(col("user_id"), explode(sequence(col("d"), date_add(col("d"), 6))).as("rd"))
      .crossJoin(broadcast(bounds))
      .filter(col("rd").between(col("d0"), col("d1")))
      .groupBy(date_format(col("rd"), "yyyy-MM-dd").as("day"))
      .agg(countDistinct(col("user_id")).as("dau_7d"))
      .orderBy("day")
  }

  val rollingDauOracle: String =
    """WITH ud AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
       b AS (SELECT min(d) AS d0, max(d) AS d1 FROM ud),
       f AS (SELECT user_id,
               CAST(unnest(generate_series(d, d + INTERVAL 6 DAY,
                                           INTERVAL 1 DAY)) AS DATE) AS rd
             FROM ud)
       SELECT strftime(rd, '%Y-%m-%d') AS day,
              CAST(count(DISTINCT user_id) AS BIGINT) AS dau_7d
       FROM f, b WHERE rd BETWEEN b.d0 AND b.d1
       GROUP BY 1 ORDER BY 1"""

  /** Days ranked into quartile buckets by total daily value (the
    * "which days carry the volume" report). `ntile` needs a global sort,
    * so it runs strictly AFTER the per-day aggregation — the window input
    * is the bounded day domain (one row per calendar day, regardless of
    * event volume), the same bounded-domain rule every other global
    * window here follows. Totals are summed as exact integer cents so the
    * sort order (and hence bucket boundaries) is engine-portable — a
    * double sum's last bits are fold-order-dependent, and ntile turns a
    * 1-ulp difference into a different bucket. Reference analog: the
    * per-day tokenomics ranking the DB serves off daily aggregates.
    */
  def dayQuartiles(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(spark, dir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
    daily
      .withColumn("bucket",
        ntile(4).over(Window.orderBy(col("cents"), col("day"))))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_days"),
        (min(col("cents")) / 100.0).as("min_total"),
        (max(col("cents")) / 100.0).as("max_total"))
      .orderBy("bucket")
  }

  val dayQuartilesOracle: String =
    """WITH daily AS (
         SELECT strftime(ts, '%Y-%m-%d') AS day,
                CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
         FROM events GROUP BY 1),
       ranked AS (
         SELECT *, ntile(4) OVER (ORDER BY cents, day) AS bucket FROM daily)
       SELECT bucket, CAST(count(*) AS BIGINT) AS n_days,
              min(cents) / 100.0 AS min_total,
              max(cents) / 100.0 AS max_total
       FROM ranked GROUP BY 1 ORDER BY 1"""

  /** Explicit GROUPING SETS — the (type × day), (type), (grand total)
    * rollup in ONE aggregation pass (Spark expands the sets below a
    * single Aggregate; each input row is partial-aggregated map-side for
    * every set it belongs to, so there is still exactly one shuffle).
    * Complements q_rollup/ev_cube_stats: sets here are hand-picked, not
    * the full lattice. `grouping(...)` flags distinguish "NULL because
    * rolled up" from a genuine NULL, exactly as in ANSI SQL.
    */
  def groupingSetsStats(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("value"))
    ev.groupingSets(
        Seq(Seq(col("event_type"), col("day")), Seq(col("event_type")), Seq()),
        col("event_type"), col("day"))
      .agg(
        // grouping() flags are only resolvable inside the Aggregate node
        (grouping(col("event_type")) * 2 + grouping(col("day")))
          .cast("int").as("gid"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .select(
        coalesce(col("event_type"), lit("ALL")).as("event_type"),
        coalesce(col("day"), lit("ALL")).as("day"),
        col("gid"), col("n_events"), col("total_value"))
      .orderBy(col("gid"), col("event_type"), col("day"))
  }

  /** Events labelled by data-derived value bands via a RANGE join — the
    * "which irregular bucket does each reading fall in" shape (rate
    * tiers, SLA bands, per-topic score brackets). Bands here are 8
    * equal-width slices of each type's [min, max] so the oracle can
    * rebuild them; the JOIN itself is the general mechanism:
    * [[Scale.rangeJoinBucketed]] turns the non-equi `value ∈ [lo, hi)`
    * predicate into a hash equi-join on fixed-width integer buckets
    * (nested-loop → hash; see Scale.scala for the cost model). Band
    * boundaries stay as raw IEEE doubles computed by the identical
    * expression tree in both engines, so the residual comparisons agree
    * bit-for-bit.
    */
  def bandJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("event_type"), col("value"))
    val bands = ev.groupBy(col("event_type"))
      .agg(min(col("value")).as("mn"), max(col("value")).as("mx"))
      .select(col("event_type"),
        explode(sequence(lit(1), lit(8))).as("band_id"), col("mn"), col("mx"))
      .select(col("event_type"), col("band_id").cast("long").as("band_id"),
        (col("mn") + (col("band_id") - 1) * ((col("mx") - col("mn")) / lit(8.0)))
          .as("lo"),
        when(col("band_id") === 8, col("mx") + lit(1.0))
          .otherwise(col("mn") + col("band_id") * ((col("mx") - col("mn")) / lit(8.0)))
          .as("hi"))
    Scale.rangeJoinBucketed(ev, "value", bands, "lo", "hi",
        width = 25.0, keys = Seq("event_type"))
      .groupBy(col("event_type"), col("band_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("band_sum"))
      .orderBy("event_type", "band_id")
  }

  /** Per-type inter-arrival statistics: for consecutive events of the
    * same (user, type), the gap in whole seconds — the stream-cadence
    * profile behind rate alerting and session-gap tuning. One per-key
    * lag window feeding one hash aggregation; gaps are floored to
    * integer seconds and averaged over exact integer sums, so the
    * result is reduction-order-free and engine-exact.
    */
  def interEvent(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_timestamp(col("ts")).as("sec"))
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("event_id"))
    e.withColumn("gap", col("sec") - lag(col("sec"), 1).over(w))
      .filter(col("gap").isNotNull)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_gaps"),
        min(col("gap")).as("min_gap_s"),
        max(col("gap")).as("max_gap_s"),
        (floor(sum(col("gap")) * lit(1e4) / count(lit(1))) / lit(1e4)).as("avg_gap_s"))
      .orderBy("event_type")
  }

  val interEventOracle: String =
    """WITH g AS (
         SELECT event_type,
                CAST(floor(epoch(ts)) AS BIGINT)
                  - lag(CAST(floor(epoch(ts)) AS BIGINT))
                      OVER (PARTITION BY user_id, event_type
                            ORDER BY event_id) AS gap
         FROM events)
       SELECT event_type, count(*) AS n_gaps,
              min(gap) AS min_gap_s, max(gap) AS max_gap_s,
              floor(CAST(sum(gap) AS BIGINT) * 1e4 / count(*)) / 1e4
                AS avg_gap_s
       FROM g WHERE gap IS NOT NULL
       GROUP BY 1 ORDER BY 1"""

  /** Event-type Markov transition matrix: counts and row-normalized
    * probabilities of consecutive (prev → next) event types per user —
    * the sequence-structure profile behind session modeling and
    * anomaly detection on event streams. One per-user window (lag on the
    * in-stream order key) feeding one hash aggregation; the normalizing
    * window runs on the AGGREGATED frame, whose domain is |types|² rows —
    * bounded regardless of corpus size.
    */
  def transitionMatrix(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    val pairs = e.withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
    val agg = pairs.groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val norm = Window.partitionBy(col("prev_type"))
    agg
      .withColumn("p", floor(col("n") * lit(1e4) / sum(col("n")).over(norm)) / lit(1e4))
      .select(col("prev_type"), col("event_type").as("next_type"), col("n"), col("p"))
      .orderBy("prev_type", "next_type")
  }

  val transitionMatrixOracle: String =
    """WITH s AS (
         SELECT event_type,
                lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id)
                  AS prev_type
         FROM events),
       a AS (SELECT prev_type, event_type AS next_type, count(*) AS n
             FROM s WHERE prev_type IS NOT NULL GROUP BY 1, 2)
       SELECT prev_type, next_type, n,
              floor(n * 1e4 / sum(n) OVER (PARTITION BY prev_type)) / 1e4 AS p
       FROM a ORDER BY 1, 2"""

  /** Last-touch attribution: each purchase is credited to the nearest
    * PRECEDING non-purchase event of the same user (the classic
    * marketing-attribution rule), rolled up to channel totals. The
    * carry-forward is `last(..., ignoreNulls)` over an unbounded-
    * preceding row frame — per-user state, one shuffle, no self-join;
    * purchases with no prior activity credit "none".
    */
  def attribution(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val attributed = e
      .withColumn("attr", last(
        when(col("event_type") =!= "purchase", col("event_type")),
        ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(coalesce(col("attr"), lit("none")).as("attributed_type"))
    val total = Window.partitionBy(lit(1))
    attributed.groupBy(col("attributed_type"))
      .agg(count(lit(1)).as("n_purchases"))
      .withColumn("share",
        floor(col("n_purchases") * lit(1e4) / sum(col("n_purchases")).over(total)) / lit(1e4))
      .orderBy("attributed_type")
  }

  val attributionOracle: String =
    """WITH s AS (
         SELECT event_type,
                last_value(CASE WHEN event_type <> 'purchase'
                                THEN event_type END IGNORE NULLS)
                  OVER (PARTITION BY user_id ORDER BY event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  AS attr
         FROM events),
       p AS (SELECT coalesce(attr, 'none') AS attributed_type
             FROM s WHERE event_type = 'purchase')
       SELECT attributed_type, count(*) AS n_purchases,
              floor(count(*) * 1e4 / sum(count(*)) OVER ()) / 1e4 AS share
       FROM p GROUP BY 1 ORDER BY 1"""

  /** Sequence pattern per (user, day): a "browse session" is a user-day
    * with ≥3 views; it CONVERTS if any purchase follows the 3rd view in
    * event order. The per-key sequence logic runs on a bounded
    * `collect_list` (events per user-day, not per user — the grouping key
    * includes the day precisely so no reducer ever holds an unbounded
    * history) sorted in-row; the daily rollup keeps the conversion ratio
    * as exact integer counts divided once at the output edge.
    * Reference analog: the multi-step inference→forecast→score ordering
    * checks the indexer applies within a block's messages.
    */
  def browseAbandon(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("event_id"))
    val perUserDay = e.groupBy(col("user_id"), col("day"))
      .agg(
        sort_array(collect_list(when(col("event_type") === "view",
          col("event_id")))).as("views"),
        max(when(col("event_type") === "purchase", col("event_id")))
          .as("last_purchase"))
      .filter(size(col("views")) >= 3)
      .select(col("day"),
        (col("last_purchase") > element_at(col("views"), 3))
          .as("converted"))
    perUserDay.groupBy(col("day"))
      .agg(
        count(lit(1)).as("n_browse"),
        sum(when(col("converted"), 1L).otherwise(0L)).as("n_converted"))
      .select(col("day"), col("n_browse"), col("n_converted"),
        (floor(col("n_converted") / col("n_browse") * 1e4) / 1e4)
          .as("conversion"))
      .orderBy("day")
  }

  val browseAbandonOracle: String =
    """WITH ud AS (
         SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
                list_sort(list(event_id) FILTER (event_type = 'view')) AS views,
                max(event_id) FILTER (event_type = 'purchase') AS last_purchase
         FROM events GROUP BY 1, 2),
       b AS (
         SELECT day, (last_purchase > views[3]) AS converted
         FROM ud WHERE len(views) >= 3)
       SELECT day, count(*) AS n_browse,
              CAST(sum(CASE WHEN converted THEN 1 ELSE 0 END) AS BIGINT)
                AS n_converted,
              floor(sum(CASE WHEN converted THEN 1 ELSE 0 END) * 1.0
                    / count(*) * 1e4) / 1e4 AS conversion
       FROM b GROUP BY 1 ORDER BY 1"""

  val bandJoinOracle: String =
    """WITH s AS (
         SELECT event_type, min(value) AS mn, max(value) AS mx
         FROM events GROUP BY 1),
       bands AS (
         SELECT event_type, i AS band_id,
                mn + (i - 1) * ((mx - mn) / 8.0) AS lo,
                CASE WHEN i = 8 THEN mx + 1.0
                     ELSE mn + i * ((mx - mn) / 8.0) END AS hi
         FROM s, generate_series(1, 8) AS g(i))
       SELECT e.event_type, band_id,
              CAST(count(*) AS BIGINT) AS n_events,
              round(sum(e.value), 2) AS band_sum
       FROM events e
       JOIN bands b ON e.event_type = b.event_type
                   AND e.value >= b.lo AND e.value < b.hi
       GROUP BY 1, 2 ORDER BY 1, 2"""

  val groupingSetsOracle: String =
    """SELECT coalesce(event_type, 'ALL') AS event_type,
              coalesce(day, 'ALL') AS day,
              CAST(GROUPING(event_type) * 2 + GROUPING(day) AS INT) AS gid,
              CAST(count(*) AS BIGINT) AS n_events,
              round(sum(value), 2) AS total_value
       FROM (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, value
             FROM events)
       GROUP BY GROUPING SETS ((event_type, day), (event_type), ())
       ORDER BY gid, event_type, day"""
}
