package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.OpsUtil._

/** Batch analytics over the `events` stream table: tumbling windows,
  * sessionization, JSON extraction, daily actives. The streaming
  * equivalents (watermark + windowed agg over readStream) live in
  * graft.streaming and are asserted equal to these batch results in
  * StreamingSpec — keeping the declared queries DuckDB-checkable
  * (SURVEY.md §2.3 Streaming).
  *
  * Time arithmetic is done in epoch milliseconds (BIGINT) on both
  * engines — no float time math, no timezone ambiguity (session TZ is
  * pinned to UTC).
  */
object EventOps {

  /** Tumbling 1-hour windows: count + exact value sum per (hour,
    * event_type). Single shuffle; at scale the input would be
    * date-partitioned so the scan prunes to the queried range. */
  def hourly(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .groupBy(date_trunc("hour", col("ts")).as("hr"), col("event_type"))
      .agg(count("*").as("n"), dsum(col("value")).as("total_value"))
      .orderBy("hr", "event_type")

  def hourlySql: String =
    """SELECT date_trunc('hour', ts) AS hr, event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY hr, event_type""".stripMargin

  /** Sessionization: per-user sessions split on 30-minute inactivity
    * gaps (lag + cumulative-sum of gap flags), then per-session stats.
    * Two window passes over one user-partitioned shuffle; in
    * Structured Streaming this is the mapGroupsWithState shape (see
    * graft.streaming.SessionizeStream). */
  def sessions(spark: SparkSession, d: String): DataFrame = {
    val evs = Tables.events(spark, d)
      .select(col("user_id"), col("event_id"), col("value"),
        unix_millis(col("ts")).as("ts_ms"))
      .withColumn("prev_ms", lag(col("ts_ms"), 1).over(
        Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))))
      .withColumn("new_sess",
        when(col("prev_ms").isNull || col("ts_ms") - col("prev_ms") > 30L * 60 * 1000, 1)
          .otherwise(0))
      .withColumn("session_seq", sum(col("new_sess")).over(
        Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    evs.groupBy("user_id", "session_seq")
      .agg(
        count("*").as("n_events"),
        min(col("ts_ms")).as("start_ms"),
        max(col("ts_ms")).as("end_ms"),
        dsum(col("value")).as("total_value"))
      .orderBy("user_id", "session_seq")
  }

  /** The gap-rule sessionization CTE chain ending in `sessions`
    * (per-event rows tagged with session_seq) — shared by
    * [[sessionsSql]] and the interval-join oracle
    * [[sessionOverlapSql]]. */
  private def sessionsCteSql: String =
    """evs AS (
      |  SELECT user_id, event_id, value, epoch_ms(ts) AS ts_ms,
      |    LAG(epoch_ms(ts), 1) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS prev_ms
      |  FROM events),
      |flagged AS (
      |  SELECT *, CASE WHEN prev_ms IS NULL OR ts_ms - prev_ms > 30*60*1000
      |                 THEN 1 ELSE 0 END AS new_sess
      |  FROM evs),
      |sessions AS (
      |  SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      |  FROM flagged)""".stripMargin

  def sessionsSql: String =
    s"""WITH $sessionsCteSql
      |SELECT user_id, session_seq, COUNT(*) AS n_events,
      |  MIN(ts_ms) AS start_ms, MAX(ts_ms) AS end_ms,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      |FROM sessions GROUP BY user_id, session_seq
      |ORDER BY user_id, session_seq""".stripMargin

  private val OverlapBinMs = 3600000L // 1-hour bins for the interval join

  /** Interval (range-overlap) self-join at scale: per-session
    * concurrency — how many OTHER sessions (any user) overlap each
    * session in time. Spark has no native interval join, and the
    * naive formulation (inequality-only join condition) degenerates
    * to a nested-loop over the cross product — so the join is
    * DECLARED with the [[graft.functions.RangeOverlap]] predicate and
    * [[graft.plans.RewriteRangeOverlapJoin]] (installed here, once
    * per session) plans it as the binned equi-join: each interval
    * explodes to the 1-hour bins it spans, candidates meet on bin
    * equality (ordinary shuffled equi-join, AQE-skew-splittable),
    * and the residual filter applies the exact predicate plus the
    * one-canonical-bin condition, so every overlapping pair survives
    * exactly once — no distinct pass. The DuckDB oracle runs its
    * native IEJoin over the raw inequality instead — two different
    * algorithms agreeing on every count.
    *
    * Overlap is closed-interval ([s1,e1] ∩ [s2,e2] ≠ ∅ ⇔ s1 ≤ e2 ∧
    * s2 ≤ e1); a session never counts itself. */
  def sessionOverlap(spark: SparkSession, d: String): DataFrame = {
    graft.plans.GraftPlans.install(spark)
    val s = sessions(spark, d)
      .select(col("user_id"), col("session_seq"), col("start_ms"), col("end_ms"))
    val a = s.select(col("user_id").as("u1"), col("session_seq").as("q1"),
      col("start_ms").as("s1"), col("end_ms").as("e1"))
    val b = s.select(col("user_id").as("u2"), col("session_seq").as("q2"),
      col("start_ms").as("s2"), col("end_ms").as("e2"))
    val pairs = a.join(b,
      graft.functions.RangeOverlap.range_overlap(
        col("s1"), col("e1"), col("s2"), col("e2"), OverlapBinMs) &&
        (col("u1") =!= col("u2") || col("q1") =!= col("q2")))
    val cnt = pairs.groupBy(col("u1").as("user_id"), col("q1").as("session_seq"))
      .agg(count(lit(1)).as("n_concurrent"))
    s.join(cnt, Seq("user_id", "session_seq"), "left_outer")
      .select(col("user_id"), col("session_seq"), col("start_ms"), col("end_ms"),
        coalesce(col("n_concurrent"), lit(0L)).as("n_concurrent"))
      .orderBy("user_id", "session_seq")
  }

  // The oracle expresses the SAME semantics as a raw inequality join
  // (DuckDB plans an IEJoin) — deliberately NOT the binned rewrite,
  // so the bin/dedup plumbing is checked against an independent
  // algorithm, not replayed.
  def sessionOverlapSql: String =
    s"""WITH $sessionsCteSql,
       |s AS (
       |  SELECT user_id, session_seq, MIN(ts_ms) AS start_ms, MAX(ts_ms) AS end_ms
       |  FROM sessions GROUP BY user_id, session_seq),
       |cnt AS (
       |  SELECT a.user_id, a.session_seq, COUNT(*) AS n_concurrent
       |  FROM s a JOIN s b
       |    ON a.start_ms <= b.end_ms AND b.start_ms <= a.end_ms
       |   AND (a.user_id <> b.user_id OR a.session_seq <> b.session_seq)
       |  GROUP BY a.user_id, a.session_seq)
       |SELECT s.user_id, s.session_seq, s.start_ms, s.end_ms,
       |  COALESCE(c.n_concurrent, 0) AS n_concurrent
       |FROM s LEFT JOIN cnt c
       |  ON c.user_id = s.user_id AND c.session_seq = s.session_seq
       |ORDER BY s.user_id, s.session_seq""".stripMargin

  /** Semi-structured extraction: pull `k` out of the JSON `props`
    * column, aggregate per event type. JSON parsing stays inside
    * codegen (get_json_object), no UDF. */
  def jsonExtract(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(col("k")).as("n"), sum(col("k")).as("sum_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")

  def jsonExtractSql: String =
    """SELECT event_type, COUNT(k) AS n, CAST(SUM(k) AS BIGINT) AS sum_k, MAX(k) AS max_k
      |FROM (SELECT event_type,
      |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |      FROM events) t
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Conversion funnel: per user, first signup and first purchase at
    * or after it; aggregated into per-day cohort conversion. Two
    * small aggregations + one join on user_id. */
  def funnel(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
    val signup = ev.where(col("event_type") === "signup")
      .groupBy("user_id").agg(min(unix_millis(col("ts"))).as("signup_ms"))
    val purchase = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), unix_millis(col("ts")).as("p_ms"))
    // the at-or-after condition lives in the JOIN, not a post-filter:
    // a user whose purchases all precede signup must still appear
    // (unconverted), which a post-filter would drop
    signup.join(purchase,
        signup("user_id") === purchase("user_id")
          && purchase("p_ms") >= signup("signup_ms"), "left_outer")
      .groupBy(signup("user_id"), col("signup_ms"))
      .agg(min(col("p_ms")).as("first_purchase_ms"))
      .select(signup("user_id"), col("signup_ms"), col("first_purchase_ms"),
        col("first_purchase_ms").isNotNull.as("converted"))
      .orderBy("user_id")
  }

  def funnelSql: String =
    """WITH s AS (
      |  SELECT user_id, MIN(epoch_ms(ts)) AS signup_ms FROM events
      |  WHERE event_type = 'signup' GROUP BY user_id),
      |p AS (
      |  SELECT user_id, epoch_ms(ts) AS p_ms FROM events
      |  WHERE event_type = 'purchase')
      |SELECT s.user_id, s.signup_ms, MIN(p.p_ms) AS first_purchase_ms,
      |  MIN(p.p_ms) IS NOT NULL AS converted
      |FROM s LEFT JOIN p ON s.user_id = p.user_id AND p.p_ms >= s.signup_ms
      |GROUP BY s.user_id, s.signup_ms
      |ORDER BY s.user_id""".stripMargin

  /** Daily actives: exact distinct users per day + event volume.
    * countDistinct is the exact path; the approx_count_distinct
    * variant (no oracle — HLL internals differ per engine) is
    * exercised in EventSpec. */
  def dailyActive(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(countDistinct(col("user_id")).as("dau"), count("*").as("n_events"))
      .orderBy("day")

  def dailyActiveSql: String =
    """SELECT CAST(ts AS DATE) AS day, COUNT(DISTINCT user_id) AS dau,
      |  COUNT(*) AS n_events
      |FROM events GROUP BY 1 ORDER BY day""".stripMargin

  /** Partition-pruned week-window aggregate over the DATE-PARTITIONED
    * events layout ([[graft.sources.PartitionedTables.eventsByDay]]):
    * the literal date range reaches the scan as a PARTITION filter, so
    * only 7 of the 30 `event_date=` directories are even listed — the
    * 100 TB-critical behavior a single-file table can't exhibit
    * (PlanSpec pins PartitionFilters + the 7-file scan). The oracle
    * replays the same window off the raw events table. */
  def prunedWindow(spark: SparkSession, d: String): DataFrame =
    graft.sources.PartitionedTables.eventsByDay(spark, d)
      .where(col("event_date").between(lit("2024-01-08"), lit("2024-01-14")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .orderBy("event_type")

  def prunedWindowSql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      |FROM events
      |WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-08' AND DATE '2024-01-14'
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** DYNAMIC partition pruning over the date-partitioned layout — the
    * runtime twin of [[prunedWindow]]: there the pruning dates are
    * literals the optimizer sees, here they are the top-3 revenue
    * days, known only after aggregating the fact — the "join the
    * fact to a filtered dim" shape every star-schema workload runs.
    * Spark broadcasts the filtered dim, evaluates it as a DPP
    * subquery INSIDE the fact scan's partition filters, and lists
    * only the 3 matching `event_date=` directories of 30 — at 100 TB
    * the difference between scanning 3 days and a month. ScaleSpec
    * pins the dynamicpruning filter in the plan and the 3-partition
    * scan metric. Ties on daily revenue break by day (exact DECIMAL
    * totals), so both engines pick the same 3 days and the result is
    * hash-stable. */
  def dppTopDays(spark: SparkSession, d: String): DataFrame = {
    val fact = graft.sources.PartitionedTables.eventsByDay(spark, d)
    val topDays = Tables.events(spark, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(col("value").cast("decimal(18,6)")).as("tot"))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("tot").desc, col("day"))))
      .where(col("rk") <= 3)
      .select(col("day"))
    fact.join(broadcast(topDays), fact("event_date") === topDays("day"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), OpsUtil.dsum(col("value")).as("total_value"))
      .orderBy("event_type")
  }

  def dppTopDaysSql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |    SUM(CAST(value AS DECIMAL(18,6))) AS tot
      |  FROM events GROUP BY 1),
      |top3 AS (
      |  SELECT day FROM (
      |    SELECT day, row_number() OVER (ORDER BY tot DESC, day) AS rk
      |    FROM daily) WHERE rk <= 3)
      |SELECT e.event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      |FROM events e JOIN top3 t ON CAST(e.ts AS DATE) = t.day
      |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin

  /** Day-of-week × hour-of-day activity profile — the calendar-grid
    * aggregation behind "when is traffic" dashboards, exercising the
    * calendar extraction functions (dayofweek/hour) the rest of the
    * surface doesn't. Single partial-aggregated shuffle to ≤168 rows
    * at any scale. */
  def dowProfile(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .groupBy(dayofweek(col("ts")).as("dow"), hour(col("ts")).as("hr"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("dow", "hr")

  def dowProfileSql: String =
    """SELECT dayofweek(ts) + 1 AS dow, hour(ts) AS hr, COUNT(*) AS n,
      |  COUNT(DISTINCT user_id) AS n_users
      |FROM events GROUP BY 1, 2 ORDER BY dow, hr""".stripMargin

  /** Trailing-7-day rolling event volume per day — the RANGE-frame
    * window the rest of the surface doesn't exercise (sessions/ranks
    * use ROW frames, hourly/daily use tumbling group-bys). The frame
    * is `RANGE BETWEEN 6 PRECEDING AND CURRENT ROW` over the integer
    * epoch-day, so days missing from the data correctly shrink the
    * trailing window (a ROWS frame would silently span gaps).
    *
    * Scale shape: the corpus reduces to ≤|days| rows FIRST (one
    * partial-aggregated shuffle); the range window then runs over
    * that tiny table — an unpartitioned window over |days| rows, the
    * mixWeights precedent, NOT a window over raw events. At 100 TB
    * the daily aggregate is still only a few thousand rows. */
  def rolling7d(spark: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(spark, d)
      .groupBy(to_date(col("ts")).as("day"))
      // keep the day sum DECIMAL through the window so the 7-day total
      // is exact (order-independent) and only THEN becomes a double —
      // the dsum pattern, with the double cast hoisted past the window
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).as("day_value"))
      .withColumn("epoch_day", datediff(col("day"), lit("1970-01-01").cast("date")))
    val w7 = Window.orderBy(col("epoch_day")).rangeBetween(-6, 0)
    daily
      .select(col("day"), col("n_events"),
        sum(col("n_events")).over(w7).as("n_7d"),
        sum(col("day_value")).over(w7).cast("double").as("value_7d"))
      .orderBy("day")
  }

  // CAST(... AS BIGINT): DuckDB promotes integer SUMs (plain and
  // windowed) to HUGEINT, which hash-diverges from Spark's LongType
  // even when every value matches. The decimal window sum mirrors the
  // Spark plan exactly — one decimal→double cast after the window.
  def rolling7dSql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events,
      |    SUM(CAST(value AS DECIMAL(18,6))) AS day_value,
      |    datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS epoch_day
      |  FROM events GROUP BY 1, 4)
      |SELECT day, n_events,
      |  CAST(SUM(n_events) OVER w7 AS BIGINT) AS n_7d,
      |  CAST(SUM(day_value) OVER w7 AS DOUBLE) AS value_7d
      |FROM daily
      |WINDOW w7 AS (ORDER BY epoch_day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
      |ORDER BY day""".stripMargin

  /** Day-N retention cohorts: users grouped by first-active day, with
    * day-1 and day-7 return counts and rates — the standard
    * product-analytics cohort table. Shape at scale: one distinct on
    * (user, day), one min-per-user, one join back keyed on user_id
    * (co-partitioned with the distinct — no extra corpus shuffle),
    * final small agg by cohort day. The conditional `countDistinct(
    * when(...))` computes every offset in ONE pass instead of one
    * self-join per offset. */
  def retention(spark: SparkSession, d: String): DataFrame = {
    val active = Tables.events(spark, d)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val firsts = active.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    firsts.join(active, Seq("user_id"))
      .groupBy(col("cohort_day"))
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(when(datediff(col("day"), col("cohort_day")) === 1,
          col("user_id"))).as("d1_retained"),
        countDistinct(when(datediff(col("day"), col("cohort_day")) === 7,
          col("user_id"))).as("d7_retained"))
      .select(col("cohort_day"), col("n_users"), col("d1_retained"), col("d7_retained"),
        round(col("d1_retained").cast("double") / col("n_users"), 9).as("d1_rate"),
        round(col("d7_retained").cast("double") / col("n_users"), 9).as("d7_rate"))
      .orderBy("cohort_day")
  }

  def retentionSql: String =
    """WITH active AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |firsts AS (
      |  SELECT user_id, MIN(day) AS cohort_day FROM active GROUP BY user_id),
      |cohorts AS (
      |  SELECT f.cohort_day,
      |    COUNT(DISTINCT a.user_id) AS n_users,
      |    COUNT(DISTINCT CASE WHEN date_diff('day', f.cohort_day, a.day) = 1
      |      THEN a.user_id END) AS d1_retained,
      |    COUNT(DISTINCT CASE WHEN date_diff('day', f.cohort_day, a.day) = 7
      |      THEN a.user_id END) AS d7_retained
      |  FROM firsts f JOIN active a ON a.user_id = f.user_id
      |  GROUP BY f.cohort_day)
      |SELECT cohort_day, n_users, d1_retained, d7_retained,
      |  round(CAST(d1_retained AS DOUBLE) / n_users, 9) AS d1_rate,
      |  round(CAST(d7_retained AS DOUBLE) / n_users, 9) AS d7_rate
      |FROM cohorts ORDER BY cohort_day""".stripMargin

  /** Calendar densification (gap fill): daily counts joined onto the
    * full generated day range, zero-filled — the time-series shape
    * where silent days must EXIST as rows (forecasting/monitoring
    * input). Everything after the first aggregate is
    * days-of-history-sized — the generated calendar and the left join
    * never touch event cardinality, so the plan scales with the
    * calendar, not the corpus. */
  def gapFillDaily(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count("*").as("n"))
    val cal = ev.agg(min("day").as("lo"), max("day").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("day"))
    cal.join(ev, Seq("day"), "left_outer")
      .select(col("day"), coalesce(col("n"), lit(0L)).as("n"))
      .orderBy("day")
  }

  def gapFillDailySql: String =
    """WITH ev AS (
      |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
      |  FROM events GROUP BY 1),
      |cal AS (
      |  SELECT CAST(UNNEST(generate_series(
      |    (SELECT MIN(day) FROM ev), (SELECT MAX(day) FROM ev),
      |    INTERVAL 1 DAY)) AS DATE) AS day)
      |SELECT cal.day, COALESCE(ev.n, 0) AS n
      |FROM cal LEFT JOIN ev USING (day) ORDER BY day""".stripMargin

  /** HLL sketch re-aggregation: per-(week, day) user sketches unioned
    * into weekly distinct-user estimates — the precompute-partials
    * pattern that makes 100 TB distinct counting incremental (daily
    * sketches are KB-sized and mergeable; the raw corpus is read once
    * per day, never re-read per rollup window). Like agg_approx, the
    * declared face carries the exact companion and a within-bound
    * flag: sketch internals are engine-specific, the error contract
    * is not (HLL at default lgConfigK=12 is ~1.6% standard error;
    * 5% is a ≳3σ bound). */
  def hllWeekly(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
      .select(date_trunc("week", col("ts")).cast("date").as("week"),
        to_date(col("ts")).as("day"), col("user_id"))
    val daily = ev.groupBy(col("week"), col("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val weekly = daily.groupBy(col("week"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val exact = ev.groupBy(col("week"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    weekly.join(exact, Seq("week"))
      .select(col("week"), col("exact_users"),
        (abs(col("est") - col("exact_users")) <=
          col("exact_users") * 0.05).as("within_5pct"))
      .orderBy("week")
  }

  def hllWeeklySql: String =
    """SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
      |  COUNT(DISTINCT user_id) AS exact_users, TRUE AS within_5pct
      |FROM events GROUP BY 1 ORDER BY week""".stripMargin

  /** Volume-anomaly detection: each day's event count z-scored
    * against its OWN trailing 14-day baseline (current day excluded —
    * a self-including window dilutes the very spike it should flag),
    * anomalous when |z| > 2 with ≥ 7 baseline days and nonzero
    * variance. Cross-engine determinism: the baseline moments are
    * EXACT integer window sums (count, Σn, Σn² — order-independent);
    * the float math happens once, in a fixed expression order, on
    * those exact inputs, then rounds to 9 decimals. The window is
    * days-of-history-sized (runs after the daily aggregate), so the
    * unpartitioned frame never sees event cardinality. */
  def anomalyDays(spark: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(spark, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("epoch_day",
        datediff(col("day"), lit("1970-01-01").cast("date")))
    val w = Window.orderBy(col("epoch_day")).rangeBetween(-14, -1)
    daily
      .select(col("day"), col("n"),
        count(lit(1)).over(w).as("m"),
        sum(col("n")).over(w).as("s1"),
        // decimal BEFORE the multiply: long*long would wrap silently
        // past ~3e9 events/day (and DuckDB errors where Spark wraps —
        // an engine divergence, not just a wrong number)
        sum(col("n").cast("decimal(19,0)") * col("n").cast("decimal(19,0)"))
          .over(w).as("s2"))
      .withColumn("mean", col("s1").cast("double") / col("m"))
      .withColumn("variance",
        col("s2").cast("double") / col("m") - col("mean") * col("mean"))
      .withColumn("z", when(col("m") >= 7 && col("variance") > 0,
        round((col("n").cast("double") - col("mean")) / sqrt(col("variance")), 9)))
      .select(col("day"), col("n").as("n_events"),
        col("m").cast("long").as("n_baseline_days"), col("z"),
        coalesce(abs(col("z")) > 2, lit(false)).as("is_anomaly"))
      .orderBy("day")
  }

  def anomalyDaysSql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n,
      |    datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS epoch_day
      |  FROM events GROUP BY 1, 3),
      |base AS (
      |  SELECT day, n,
      |    COUNT(*) OVER w AS m,
      |    SUM(n) OVER w AS s1,
      |    SUM(CAST(n AS DECIMAL(19,0)) * CAST(n AS DECIMAL(19,0))) OVER w AS s2
      |  FROM daily
      |  WINDOW w AS (ORDER BY epoch_day RANGE BETWEEN 14 PRECEDING AND 1 PRECEDING)),
      |scored AS (
      |  SELECT day, n, m,
      |    CAST(s1 AS DOUBLE) / m AS mean,
      |    CAST(s2 AS DOUBLE) / m - (CAST(s1 AS DOUBLE) / m) * (CAST(s1 AS DOUBLE) / m) AS variance
      |  FROM base)
      |SELECT day, n AS n_events, CAST(m AS BIGINT) AS n_baseline_days,
      |  CASE WHEN m >= 7 AND variance > 0
      |    THEN round((CAST(n AS DOUBLE) - mean) / sqrt(variance), 9) END AS z,
      |  COALESCE(abs(CASE WHEN m >= 7 AND variance > 0
      |    THEN round((CAST(n AS DOUBLE) - mean) / sqrt(variance), 9) END) > 2,
      |    FALSE) AS is_anomaly
      |FROM scored ORDER BY day""".stripMargin

  /** KMV distinct-user sketch per event type ([[graft.functions.KmvAgg]]).
    * Where `agg_hll_merge` proves the mergeable-partials pattern with
    * Spark's built-in HLL (engine-specific registers → only the error
    * CONTRACT is declared), KMV's state is an order statistic of a
    * deterministic hash — partition-independent — so the raw sketch
    * (kth-smallest hash, estimate) goes under the hash gate itself and
    * DuckDB replays it exactly with a rank-K window over the shared
    * xhash60. Shuffle carries ≤ 32 longs per group vs countDistinct's
    * every-distinct-value; the exact companion rides along to show the
    * estimate's accuracy in the result. */
  def kmvUsers(spark: SparkSession, d: String): DataFrame = {
    import graft.ops.OpsUtil.xhash60
    Tables.events(spark, d)
      .select(col("event_type"),
        xhash60(col("user_id").cast("string"), 0).as("h"),
        col("user_id"))
      .groupBy(col("event_type"))
      .agg(graft.functions.KmvAgg.kmv_distinct(col("h")).as("sk"),
        countDistinct(col("user_id")).as("n_exact"))
      .select(col("event_type"), col("n_exact"),
        col("sk.n_held").as("n_held"),
        col("sk.kth_hash").as("kth_hash"),
        col("sk.est_distinct").as("est_distinct"))
      .orderBy("event_type")
  }

  def kmvUsersSql: String = {
    val K = graft.functions.KmvAgg.K
    // n_exact counts distinct USER IDs (matching Spark's
    // countDistinct(user_id)), not distinct hashes: the sketch columns
    // (n_held/kth_hash/est_distinct) live in 60-bit hash space like
    // the engine's KMV state does, but the exact companion must not
    // silently inherit the hash's collision behavior — a colliding
    // user pair would shift nd while countDistinct stays truthful.
    s"""WITH ex AS (
       |  SELECT event_type, COUNT(DISTINCT user_id) AS n_ex
       |  FROM events GROUP BY event_type),
       |h AS (
       |  SELECT DISTINCT event_type,
       |    ${OpsUtil.xhash60Sql("user_id", 0)} AS h
       |  FROM events),
       |r AS (
       |  SELECT event_type, h,
       |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
       |    count(*) OVER (PARTITION BY event_type) AS nd
       |  FROM h)
       |SELECT r.event_type, CAST(MAX(ex.n_ex) AS BIGINT) AS n_exact,
       |  CAST(least(nd, $K) AS BIGINT) AS n_held,
       |  MAX(CASE WHEN rn = $K THEN h END) AS kth_hash,
       |  CAST(CASE WHEN nd < $K THEN nd
       |    ELSE (CAST(${K - 1} AS HUGEINT) * CAST(1152921504606846976 AS HUGEINT))
       |         // MAX(CASE WHEN rn = $K THEN h END) END AS BIGINT) AS est_distinct
       |FROM r JOIN ex ON r.event_type = ex.event_type
       |GROUP BY r.event_type, nd ORDER BY r.event_type""".stripMargin
  }

  /** Bloom-filter membership sketch per event type
    * ([[graft.functions.BloomAgg]]) — the mergeable-union companion to
    * [[kmvUsers]]' order-statistic sketch: 16 longs of OR-merged bit
    * state per group cross the shuffle instead of the distinct user
    * set, and the popcount (partition-schedule-independent, so it
    * goes straight under the hash gate; DuckDB replays it as
    * COUNT(DISTINCT md5-position)) feeds the two standard
    * diagnostics: the fill-inversion cardinality estimate
    * −(M/K)·ln(1−bits/M) and the current false-positive rate
    * (bits/M)^K — cubed by explicit multiplication, not pow(), so
    * both engines run the identical float ops. The exact distinct
    * count rides along to score the estimate. */
  def bloomUsers(spark: SparkSession, d: String): DataFrame = {
    import graft.functions.BloomAgg
    val m = BloomAgg.M.toDouble
    val fill = col("bits_set").cast("double") / lit(m)
    Tables.events(spark, d)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_exact"),
        BloomAgg.bloom_bits(col("user_id").cast("string")).as("bits_set"))
      .select(col("event_type"), col("n_exact"), col("bits_set"),
        // saturation guard (identical in the oracle): at bits_set = M
        // the fill inversion is ln(0) and the estimate is unbounded —
        // NULL, not an engine-specific -Inf/error (M is sized so this
        // never fires on a sane corpus; see BloomAgg.M)
        when(col("bits_set") === lit(BloomAgg.M.toLong), lit(null).cast("double"))
          .otherwise(round(lit(-m / BloomAgg.K) * log(lit(1.0) - fill), 6))
          .as("est_n"),
        round(fill * fill * fill, 9).as("fpp"))
      .orderBy("event_type")
  }

  def bloomUsersSql: String = {
    val (m, k) = (graft.functions.BloomAgg.M, graft.functions.BloomAgg.K)
    s"""WITH el AS (SELECT DISTINCT event_type, CAST(user_id AS VARCHAR) AS u
       |  FROM events),
       |pos AS (
       |  SELECT event_type,
       |    ('0x' || substr(md5(u), 8*r + 1, 8))::BIGINT % $m AS p
       |  FROM el CROSS JOIN (SELECT unnest(range(0, $k)) AS r) ks),
       |b AS (SELECT event_type, COUNT(DISTINCT p) AS bits FROM pos GROUP BY 1),
       |ex AS (SELECT event_type, COUNT(DISTINCT user_id) AS n FROM events GROUP BY 1)
       |SELECT b.event_type, CAST(ex.n AS BIGINT) AS n_exact,
       |  CAST(b.bits AS BIGINT) AS bits_set,
       |  CASE WHEN b.bits = $m THEN CAST(NULL AS DOUBLE)
       |       ELSE round(-($m.0 / $k) * ln(1.0 - CAST(b.bits AS DOUBLE) / $m), 6)
       |  END AS est_n,
       |  round((CAST(b.bits AS DOUBLE) / $m) * (CAST(b.bits AS DOUBLE) / $m)
       |    * (CAST(b.bits AS DOUBLE) / $m), 9) AS fpp
       |FROM b JOIN ex ON b.event_type = ex.event_type
       |ORDER BY b.event_type""".stripMargin
  }

  /** Lag-7 autocorrelation of the daily event count — the seasonality
    * probe next to [[anomalyDays]]' spike detector: r ≈ 1 means a
    * strong weekly rhythm, ≈ 0 none. The series pairs with itself via
    * a calendar self-join (day = day−7 — exact date equality, no
    * window frame to misalign over gaps), and the correlation builds
    * from raw moments summed EXACTLY (counts and decimal products),
    * so the one double expression at the end is bit-identical in both
    * engines. The daily aggregate is days-of-history-sized; the join
    * and moments never see event cardinality. */
  def autocorrWeekly(spark: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(spark, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val pairs = daily.select(col("day"), col("n").as("x"))
      .join(daily.select((col("day") + expr("INTERVAL 7 DAYS")).as("day"),
        col("n").as("y")), Seq("day"))
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(19,0)")
    pairs.agg(
        count(lit(1)).as("m"),
        sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(dec(col("x")) * dec(col("y"))).cast("double").as("sxy"),
        sum(dec(col("x")) * dec(col("x"))).cast("double").as("sxx"),
        sum(dec(col("y")) * dec(col("y"))).cast("double").as("syy"))
      .select(col("m"),
        round((col("sxy") - col("sx").cast("double") * col("sy") / col("m")) /
          sqrt((col("sxx") - col("sx").cast("double") * col("sx") / col("m")) *
            (col("syy") - col("sy").cast("double") * col("sy") / col("m"))), 9)
          .as("r7"))
  }

  def autocorrWeeklySql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n FROM events GROUP BY 1),
      |pairs AS (
      |  SELECT a.n AS x, b.n AS y
      |  FROM daily a JOIN daily b ON a.day = b.day + INTERVAL 7 DAY),
      |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
      |  CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |  CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS DOUBLE) AS sxy,
      |  CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) AS DOUBLE) AS sxx,
      |  CAST(SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS DOUBLE) AS syy
      |  FROM pairs)
      |SELECT m,
      |  round((sxy - CAST(sx AS DOUBLE) * sy / m) /
      |    sqrt((sxx - CAST(sx AS DOUBLE) * sx / m) *
      |         (syy - CAST(sy AS DOUBLE) * sy / m)), 9) AS r7
      |FROM s""".stripMargin

  /** KMV sketch ALGEBRA — the a-not-b estimator: |viewers ∖
    * big-buyers| estimated from two K-bounded sketches alone, never
    * re-touching the corpus. Theory (theta-sketch difference,
    * Dalvi/Dasgupta et al. lineage): with θ = min(θ_A, θ_B), every
    * retained A-hash below θ lies in BOTH sketches' fully-retained
    * region, so membership-in-B tests are EXACT there, and the
    * A-not-B survivors scale by 2⁶⁰/θ like any KMV count. Below-K
    * sketches retain their whole set (θ = 2⁶⁰), making the estimate
    * degrade gracefully to the exact answer. All set work happens on
    * two ≤32-long arrays in one crossJoin of three 1-row frames; the
    * exact companion rides along to show the error. Float math is one
    * double divide+multiply+floor on exactly-converted longs —
    * bit-identical in both engines. */
  def kmvDiff(spark: SparkSession, d: String): DataFrame = {
    import graft.functions.KmvAgg
    import graft.ops.OpsUtil.xhash60
    val ev = Tables.events(spark, d)
    val viewers = ev.where(col("event_type") === "view")
      .select(xhash60(col("user_id").cast("string"), 0).as("h"), col("user_id"))
    val buyers = ev.where(col("event_type") === "purchase" && col("value") > 150)
      .select(xhash60(col("user_id").cast("string"), 0).as("h"), col("user_id"))
    val skV = viewers.agg(KmvAgg.kmv_distinct(col("h")).as("sk"))
      .select(col("sk.n_held").as("n_view_held"),
        col("sk.kth_hash").as("kth_v"), col("sk.hashes").as("hv"))
    val skB = buyers.agg(KmvAgg.kmv_distinct(col("h")).as("sk"))
      .select(col("sk.n_held").as("n_buy_held"),
        col("sk.kth_hash").as("kth_b"), col("sk.hashes").as("hb"))
    val exact = viewers.select("user_id").distinct()
      .join(buyers.select("user_id").distinct(), Seq("user_id"), "left_anti")
      .agg(count(lit(1)).as("exact_diff"))
    val full = lit(1152921504606846976L) // 2^60: sketch holds the whole set
    skV.crossJoin(skB).crossJoin(exact)
      .withColumn("theta",
        least(coalesce(col("kth_v"), full), coalesce(col("kth_b"), full)))
      .withColumn("diff_held",
        size(filter(col("hv"),
          x => x < col("theta") && !array_contains(col("hb"), x))).cast("long"))
      .select(col("n_view_held"), col("n_buy_held"), col("theta"),
        col("diff_held"),
        floor(col("diff_held").cast("double") *
          (lit(1152921504606846976.0) / col("theta").cast("double")))
          .cast("long").as("est_diff"),
        col("exact_diff"))
  }

  def kmvDiffSql: String = {
    val K = graft.functions.KmvAgg.K
    val full = "1152921504606846976"
    def hash(c: String) = OpsUtil.xhash60Sql(c, 0)
    s"""WITH va AS (SELECT DISTINCT ${hash("user_id")} AS h
       |  FROM events WHERE event_type = 'view'),
       |ba AS (SELECT DISTINCT ${hash("user_id")} AS h
       |  FROM events WHERE event_type = 'purchase' AND value > 150),
       |vk AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM va),
       |bk AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM ba),
       |kv AS (SELECT COALESCE(MAX(CASE WHEN rn = $K THEN h END), $full) AS kth,
       |         CAST(COUNT(*) AS BIGINT) AS n FROM vk WHERE rn <= $K),
       |kb AS (SELECT COALESCE(MAX(CASE WHEN rn = $K THEN h END), $full) AS kth,
       |         CAST(COUNT(*) AS BIGINT) AS n FROM bk WHERE rn <= $K),
       |th AS (SELECT least(kv.kth, kb.kth) AS theta FROM kv, kb),
       |dh AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM vk, th
       |  WHERE vk.rn <= $K AND vk.h < th.theta
       |    AND NOT EXISTS (SELECT 1 FROM bk WHERE bk.rn <= $K AND bk.h = vk.h)),
       |ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM (
       |  SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
       |  EXCEPT
       |  SELECT DISTINCT user_id FROM events
       |  WHERE event_type = 'purchase' AND value > 150) t)
       |SELECT kv.n AS n_view_held, kb.n AS n_buy_held, th.theta AS theta,
       |  dh.c AS diff_held,
       |  CAST(floor(CAST(dh.c AS DOUBLE) *
       |    ($full.0 / CAST(th.theta AS DOUBLE))) AS BIGINT) AS est_diff,
       |  ex.c AS exact_diff
       |FROM kv, kb, th, dh, ex""".stripMargin
  }

  /** RFM segmentation — recency (days since last event, relative to
    * the corpus max date), frequency (event count), monetary
    * (purchase value) per user, each quartile-bucketed. The canonical
    * implementation is three unpartitioned `ntile(4)` windows — a
    * GLOBAL SORT of the user table per dimension, three times; this
    * writes the scale form instead: quartile CUTPOINTS from one
    * 1-row aggregate, broadcast back, bucket-by-comparison (the
    * [[RelationalOps.equidepthPrice]] pattern ×3 in a single pass).
    * Output is the 4×4×4 segment-count cube. Metrics are exact
    * (integer days/counts, decimal-summed purchases), so the
    * interpolated cutpoints and bucket assignments are bit-identical
    * cross-engine. */
  def rfmSegments(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
    val maxDay = ev.agg(max(to_date(col("ts"))).as("max_day"))
    val m = ev.crossJoin(broadcast(maxDay))
      .groupBy(col("user_id"))
      .agg(
        min(datediff(col("max_day"), to_date(col("ts")))).as("recency"),
        count(lit(1)).as("frequency"),
        sum(when(col("event_type") === "purchase",
          col("value").cast("decimal(18,6)"))
          .otherwise(lit(0).cast("decimal(18,6)"))).cast("double").as("monetary"))
      .localCheckpoint(false) // feeds cutpoints AND bucketing: one pass
    // Cutpoints rounded to 9 decimals before the comparison bucketing
    // (the repo's cross-engine float recipe): the inputs are exact, but
    // percentile vs quantile_cont INTERPOLATION arithmetic is each
    // engine's own — a last-ulp divergence would flip the bucket of any
    // value landing between the two cutpoint versions.
    val cuts = m.agg(
      expr("transform(percentile(recency, array(0.25,0.5,0.75)), x -> round(x, 9))").as("cr"),
      expr("transform(percentile(frequency, array(0.25,0.5,0.75)), x -> round(x, 9))").as("cf"),
      expr("transform(percentile(monetary, array(0.25,0.5,0.75)), x -> round(x, 9))").as("cm"))
    m.crossJoin(broadcast(cuts))
      .select(
        (size(filter(col("cr"), x => x < col("recency"))) + 1).cast("long").as("r"),
        (size(filter(col("cf"), x => x < col("frequency"))) + 1).cast("long").as("f"),
        (size(filter(col("cm"), x => x < col("monetary"))) + 1).cast("long").as("m"))
      .groupBy(col("r"), col("f"), col("m"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("r", "f", "m")
  }

  def rfmSegmentsSql: String =
    """WITH m AS (
      |  SELECT user_id,
      |    datediff('day', CAST(MAX(ts) AS DATE),
      |      (SELECT CAST(MAX(ts) AS DATE) FROM events)) AS recency,
      |    COUNT(*) AS frequency,
      |    CAST(SUM(CASE WHEN event_type = 'purchase'
      |      THEN CAST(value AS DECIMAL(18,6))
      |      ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS monetary
      |  FROM events GROUP BY user_id),
      |cuts AS (
      |  SELECT list_transform(quantile_cont(recency, [0.25, 0.5, 0.75]),
      |      x -> round(x, 9)) AS cr,
      |    list_transform(quantile_cont(frequency, [0.25, 0.5, 0.75]),
      |      x -> round(x, 9)) AS cf,
      |    list_transform(quantile_cont(monetary, [0.25, 0.5, 0.75]),
      |      x -> round(x, 9)) AS cm
      |  FROM m)
      |SELECT CAST(1 + len(list_filter(cuts.cr, x -> x < m.recency)) AS BIGINT) AS r,
      |  CAST(1 + len(list_filter(cuts.cf, x -> x < m.frequency)) AS BIGINT) AS f,
      |  CAST(1 + len(list_filter(cuts.cm, x -> x < m.monetary)) AS BIGINT) AS m,
      |  COUNT(*) AS n_users
      |FROM m, cuts GROUP BY 1, 2, 3 ORDER BY r, f, m""".stripMargin

  /** Top event-path trigrams — the sequence-mining companion to
    * [[markovTransitions]]' first-order matrix: full 3-step paths
    * ranked by frequency (funnels the transition matrix factorizes
    * away). `lead` ×2 inside the ONE user-keyed window shuffle every
    * per-user sequence op shares; the path counts re-aggregate onto a
    * ≤|types|³ key space map-side; top-10 is TakeOrdered. */
  def pathTrigrams(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms"), col("event_id"))
    Tables.events(spark, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("ts_ms"))
      .withColumn("t2", lead(col("event_type"), 1).over(w))
      .withColumn("t3", lead(col("event_type"), 2).over(w))
      .where(col("t2").isNotNull && col("t3").isNotNull)
      .groupBy(col("event_type").as("s1"), col("t2").as("s2"), col("t3").as("s3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("s1"), col("s2"), col("s3"))
      .limit(10)
  }

  def pathTrigramsSql: String =
    """WITH seq AS (
      |  SELECT event_type AS s1,
      |    lead(event_type, 1) OVER w AS s2,
      |    lead(event_type, 2) OVER w AS s3
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id))
      |SELECT s1, s2, s3, COUNT(*) AS n
      |FROM seq WHERE s2 IS NOT NULL AND s3 IS NOT NULL
      |GROUP BY 1, 2, 3
      |ORDER BY n DESC, s1, s2, s3 LIMIT 10""".stripMargin

  /** First-order Markov transition matrix over each user's event
    * sequence: P(next_type | prev_type) estimated from adjacent-pair
    * counts — the behavioral-model companion to [[sessions]] (same
    * per-user lag ordering: ts millis, event_id tiebreak). Sequence
    * work happens inside ONE window shuffle on user_id; the pair
    * counts then re-aggregate onto a ≤|types|² key space with
    * map-side combine, so the transition table is dimension-sized no
    * matter the event cardinality. Probabilities divide two exact
    * window-summed longs (one IEEE division, rounded to 9), so both
    * engines emit identical doubles. */
  def markovTransitions(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms"), col("event_id"))
    val pairs = Tables.events(spark, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("ts_ms"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .where(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
    pairs
      .withColumn("n_from",
        sum(col("n")).over(Window.partitionBy(col("prev_type"))))
      .select(col("prev_type"), col("next_type"), col("n"),
        round(col("n").cast("double") / col("n_from"), 9).as("p"))
      .orderBy("prev_type", "next_type")
  }

  def markovTransitionsSql: String =
    """WITH seq AS (
      |  SELECT event_type,
      |    lag(event_type) OVER
      |      (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS prev_type
      |  FROM events),
      |pairs AS (
      |  SELECT prev_type, event_type AS next_type, COUNT(*) AS n
      |  FROM seq WHERE prev_type IS NOT NULL
      |  GROUP BY prev_type, event_type)
      |SELECT prev_type, next_type, n,
      |  round(CAST(n AS DOUBLE) /
      |    SUM(n) OVER (PARTITION BY prev_type), 9) AS p
      |FROM pairs ORDER BY prev_type, next_type""".stripMargin

  /** EWMA (α = 0.5) of the daily event count — the trend smoother
    * next to [[anomalyDays]]' spike detector and [[autocorrWeekly]]'s
    * seasonality probe. α is HALF deliberately: every weight 2^-(j+1)
    * is a dyadic rational, so term = count · 2^(19-j) is an exact
    * BIGINT, the 20-term lookback sums exactly, and the final ÷ 2^20
    * is an exact double — zero float accumulation, zero rounding,
    * bit-identical cross-engine BY CONSTRUCTION (no round-to-9 crutch
    * needed). The lookback is calendar-based (a gap day decays the
    * average like an observed zero) and truncates at 20 days, where
    * the discarded tail weight is < 1e-6 of the total. Scale shape:
    * the daily aggregate is days-of-history-sized; the 20-day range
    * self-join and the weighted sum never see event cardinality
    * ([[autocorrWeekly]]'s exact pattern). */
  def ewmaDaily(spark: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(spark, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val hist = daily.select(col("day").as("day2"), col("n").as("n2"))
    daily.join(hist,
        col("day2").between(date_sub(col("day"), 19), col("day")))
      .groupBy(col("day"))
      .agg(max(col("n")).as("n"),
        (sum(expr("shiftleft(CAST(1 AS BIGINT), 19 - datediff(day, day2)) * n2"))
          / lit(1048576.0)).as("ewma"))
      .orderBy("day")
  }

  def ewmaDailySql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n FROM events GROUP BY 1)
      |SELECT d1.day, MAX(d1.n) AS n,
      |  CAST(SUM(d2.n * (CAST(1 AS BIGINT)
      |    << (19 - datediff('day', d2.day, d1.day)))) AS BIGINT)
      |    / 1048576.0 AS ewma
      |FROM daily d1 JOIN daily d2
      |  ON d2.day BETWEEN d1.day - 19 AND d1.day
      |GROUP BY d1.day ORDER BY d1.day""".stripMargin

  /** Brown's DOUBLE exponential smoothing (trend-adjusted) of the
    * daily event count — [[ewmaDaily]]'s level tracker lags a
    * trending series by construction; smoothing the smooth (s2) and
    * extrapolating 2·s1 − s2 removes that lag. Exactness is the same
    * dyadic trick applied TWICE: s1 stays a scaled BIGINT
    * (weights 2^(15−j), denominator 2^16) rather than a double, so
    * the second pass can weight those integers again — s2's scaled
    * sum is still an exact BIGINT with denominator 2^32, and s1, s2,
    * and the trend are all exact dyadic doubles, bit-identical
    * cross-engine with no rounding crutch. The 16-day truncation's
    * discarded tail is < 2^-16 of the kernel. Overflow headroom:
    * s2_scaled ≤ 16 · n_max · 2^32 — safe in BIGINT until ~10^8
    * events/day (documented bound, loud past it via [[OpsUtil]]
    * conventions). Scale shape: two cascaded calendar-bounded range
    * self-joins over the days-of-history-sized daily aggregate —
    * event cardinality is touched exactly once, in the first
    * map-side-combined groupBy. */
  def demaDaily(spark: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(spark, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val hist = daily.select(col("day").as("day2"), col("n").as("n2"))
    val s1 = daily.join(hist,
        col("day2").between(date_sub(col("day"), 15), col("day")))
      .groupBy(col("day"))
      .agg(max(col("n")).as("n"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), 15 - datediff(day, day2)) * n2"))
          .as("s1_scaled"))
    val s1hist = s1.select(col("day").as("day2"), col("s1_scaled").as("s1b"))
    s1.join(s1hist,
        col("day2").between(date_sub(col("day"), 15), col("day")))
      .groupBy(col("day"))
      .agg(max(col("n")).as("n"), max(col("s1_scaled")).as("s1_scaled"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), 15 - datediff(day, day2)) * s1b"))
          .as("s2_scaled"))
      .select(col("day"), col("n"),
        (col("s1_scaled") / lit(65536.0)).as("s1"),
        (col("s2_scaled") / lit(4294967296.0)).as("s2"),
        (lit(2) * (col("s1_scaled") / lit(65536.0))
          - col("s2_scaled") / lit(4294967296.0)).as("trend"))
      .orderBy("day")
  }

  def demaDailySql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n FROM events GROUP BY 1),
      |s1 AS (
      |  SELECT d1.day, MAX(d1.n) AS n,
      |    CAST(SUM(d2.n * (CAST(1 AS BIGINT)
      |      << (15 - datediff('day', d2.day, d1.day)))) AS BIGINT) AS s1_scaled
      |  FROM daily d1 JOIN daily d2 ON d2.day BETWEEN d1.day - 15 AND d1.day
      |  GROUP BY d1.day),
      |s2 AS (
      |  SELECT a.day, MAX(a.n) AS n, MAX(a.s1_scaled) AS s1_scaled,
      |    CAST(SUM(b.s1_scaled * (CAST(1 AS BIGINT)
      |      << (15 - datediff('day', b.day, a.day)))) AS BIGINT) AS s2_scaled
      |  FROM s1 a JOIN s1 b ON b.day BETWEEN a.day - 15 AND a.day
      |  GROUP BY a.day)
      |SELECT day, n,
      |  s1_scaled / 65536.0 AS s1,
      |  s2_scaled / 4294967296.0 AS s2,
      |  2 * (s1_scaled / 65536.0) - s2_scaled / 4294967296.0 AS trend
      |FROM s2 ORDER BY day""".stripMargin

  /** Distribution drift between the corpus's first and second time
    * halves: per-event-type counts, probabilities, and the per-type
    * KL-divergence contribution P·ln(P/Q) — the monitoring primitive
    * behind every "did the traffic mix shift?" alert (summing kl_term
    * gives D_KL(first‖second)). The midpoint cut and both halves'
    * totals ride a broadcast 1-row bounds aggregate (the [[rfmSegments]]
    * pattern — no driver action); counts are exact, the probabilities
    * divide exact integers, and the one ln per type is rounded to 9
    * (the cross-engine float recipe). */
  def driftHalves(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
      .select(col("event_type"), unix_millis(col("ts")).as("ms"))
    val b = ev.agg(min(col("ms")).as("lo"), max(col("ms")).as("hi"))
    val tagged = ev.crossJoin(broadcast(b))
      .select(col("event_type"),
        (col("ms") >= col("lo") +
          ((col("hi") - col("lo")) / lit(2)).cast("long")).cast("int").as("half"))
    val c = tagged.groupBy(col("event_type"))
      .agg(sum(when(col("half") === 0, 1L).otherwise(0L)).as("n1"),
        sum(when(col("half") === 1, 1L).otherwise(0L)).as("n2"))
    val tot = c.agg(sum(col("n1")).as("t1"), sum(col("n2")).as("t2"))
    // zero-count guards (identical in the oracle): P=0 contributes 0
    // to D_KL by the 0·ln(0)=0 convention, and a type absent from the
    // second half has an infinite term — emitted as NULL, not +Inf,
    // so the hash gate never compares engine-specific Inf/NaN prints
    c.crossJoin(broadcast(tot))
      .select(col("event_type"), col("n1"), col("n2"),
        round(col("n1").cast("double") / col("t1"), 9).as("p1"),
        round(col("n2").cast("double") / col("t2"), 9).as("p2"),
        when(col("n1") === 0, lit(0.0))
          .when(col("n2") === 0, lit(null).cast("double"))
          .otherwise(round((col("n1").cast("double") / col("t1")) *
            log((col("n1").cast("double") / col("t1")) /
              (col("n2").cast("double") / col("t2"))), 9)).as("kl_term"))
      .orderBy("event_type")
  }

  def driftHalvesSql: String =
    """WITH b AS (SELECT MIN(epoch_ms(ts)) AS lo, MAX(epoch_ms(ts)) AS hi FROM events),
      |tagged AS (
      |  SELECT event_type,
      |    CASE WHEN epoch_ms(ts) < (SELECT lo + (hi - lo) // 2 FROM b)
      |         THEN 0 ELSE 1 END AS half
      |  FROM events),
      |c AS (
      |  SELECT event_type,
      |    SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS n1,
      |    SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS n2
      |  FROM tagged GROUP BY event_type),
      |tot AS (SELECT SUM(n1) AS t1, SUM(n2) AS t2 FROM c)
      |SELECT event_type, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
      |  round(CAST(n1 AS DOUBLE) / t1, 9) AS p1,
      |  round(CAST(n2 AS DOUBLE) / t2, 9) AS p2,
      |  CASE WHEN n1 = 0 THEN CAST(0.0 AS DOUBLE)
      |       WHEN n2 = 0 THEN CAST(NULL AS DOUBLE)
      |       ELSE round((CAST(n1 AS DOUBLE) / t1) *
      |         ln((CAST(n1 AS DOUBLE) / t1) / (CAST(n2 AS DOUBLE) / t2)), 9)
      |  END AS kl_term
      |FROM c, tot ORDER BY event_type""".stripMargin

  /** CUSUM changepoint score of the daily event count — the
    * level-shift detector next to [[anomalyDays]]' pointwise z-spike:
    * a sustained small drift that never trips a z-threshold
    * accumulates here. Uses the classic identity
    * S_t = P_t − min_{j≤t} P_j (prefix sums of deviations minus
    * their running minimum) instead of the recursive
    * max(0, S+x−k) form — the identity is two plain windows, and by
    * scaling deviations to x_t·D − total EVERY intermediate is an
    * exact BIGINT: no float enters until the final division, which
    * both engines perform on identical operands. Day-count-sized
    * data throughout ([[autocorrWeekly]]'s shape). */
  def cusumDaily(spark: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(spark, d)
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("n"))
    val s = daily.agg(count(lit(1)).as("dcount"), sum(col("n")).as("total"))
    val wAll = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    daily.crossJoin(broadcast(s))
      .withColumn("dev", col("n") * col("dcount") - col("total"))
      .withColumn("pref", sum(col("dev")).over(wAll))
      .withColumn("sc", col("pref") - min(col("pref")).over(wAll))
      .select(col("day"), col("n"),
        round(col("sc").cast("double") / col("dcount"), 6).as("cusum"))
      .orderBy("day")
  }

  def cusumDailySql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n FROM events GROUP BY 1),
      |s AS (SELECT COUNT(*) AS dcount, SUM(n) AS total FROM daily),
      |d AS (SELECT day, n,
      |  n * (SELECT dcount FROM s) - (SELECT total FROM s) AS dev FROM daily),
      |p AS (SELECT day, n, SUM(dev) OVER (ORDER BY day) AS pref FROM d),
      |c AS (SELECT day, n, pref - MIN(pref) OVER (ORDER BY day) AS sc FROM p)
      |SELECT day, CAST(n AS BIGINT) AS n,
      |  round(CAST(sc AS DOUBLE) / (SELECT dcount FROM s), 6) AS cusum
      |FROM c ORDER BY day""".stripMargin

  /** High-value purchase threshold shared by [[survivalKm]] and
    * [[abTest]]: picks an event rare enough to carry signal (21% of
    * users at sf0.01; "any purchase" saturates at 100% on this
    * corpus and degenerates both estimators). */
  private val HighValue = 200

  /** Kaplan–Meier estimator of time-to-first-high-value-purchase —
    * THE survival-analysis primitive (churn/conversion curves),
    * distinct from every moment-based statistic in the suite because
    * it handles CENSORING: a user who never converts contributes
    * risk-set mass up to their observation end instead of being
    * dropped (which would bias the curve) or counted as converted at
    * the horizon (worse). S(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ) over event
    * times; the product is computed as exp of a decimal-summed
    * per-time rounded ln — fixed order, deterministic cross-engine.
    * Scale shape: the per-user reduction is one groupBy; everything
    * after lives on the ≤|distinct durations| table, so the
    * unpartitioned windows scan dozens of rows, not users
    * ([[anomalyDays]]' pattern). */
  def survivalKm(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
    val firstEv = ev.groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("d0"))
    val firstBuy = ev
      .where(col("event_type") === "purchase" && col("value") > HighValue)
      .groupBy(col("user_id")).agg(min(to_date(col("ts"))).as("db"))
    val maxDay = ev.agg(max(to_date(col("ts"))).as("dmax"))
    val life = firstEv.join(firstBuy, Seq("user_id"), "left")
      .crossJoin(broadcast(maxDay))
      .select(
        when(col("db").isNull, datediff(col("dmax"), col("d0")))
          .otherwise(datediff(col("db"), col("d0"))).as("t"),
        when(col("db").isNull, 0L).otherwise(1L).as("ev"))
    val nTotal = life.agg(count(lit(1)).as("n"))
    val atT = life.groupBy(col("t"))
      .agg(sum(col("ev")).as("d"), count(lit(1)).as("leaving"))
    val wPrev = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val risk = atT.crossJoin(broadcast(nTotal))
      .withColumn("n_risk",
        col("n") - coalesce(sum(col("leaving")).over(wPrev), lit(0L)))
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, 0)
    risk.where(col("d") > 0 && col("d") < col("n_risk"))
      .withColumn("lf",
        round(log(lit(1.0) - col("d").cast("double") / col("n_risk")), 9))
      .withColumn("survival",
        round(exp(sum(col("lf").cast("decimal(28,12)")).over(wCum)
          .cast("double")), 6))
      .select(col("t").cast("long").as("t"), col("d").cast("long").as("d"),
        col("n_risk").cast("long").as("n_risk"), col("survival"))
      .orderBy("t")
  }

  def survivalKmSql: String =
    s"""WITH first_ev AS (
       |  SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id),
       |first_buy AS (
       |  SELECT user_id, MIN(CAST(ts AS DATE)) AS db FROM events
       |  WHERE event_type = 'purchase' AND value > $HighValue GROUP BY user_id),
       |life AS (
       |  SELECT f.user_id,
       |    CASE WHEN b.db IS NULL
       |         THEN datediff('day', f.d0, (SELECT MAX(CAST(ts AS DATE)) FROM events))
       |         ELSE datediff('day', f.d0, b.db) END AS t,
       |    CASE WHEN b.db IS NULL THEN 0 ELSE 1 END AS ev
       |  FROM first_ev f LEFT JOIN first_buy b ON b.user_id = f.user_id),
       |n_total AS (SELECT COUNT(*) AS n FROM life),
       |at_t AS (SELECT t, SUM(ev) AS d, COUNT(*) AS leaving FROM life GROUP BY t),
       |risk AS (
       |  SELECT t, d,
       |    (SELECT n FROM n_total)
       |      - COALESCE(SUM(leaving) OVER (ORDER BY t
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
       |  FROM at_t),
       |f AS (
       |  SELECT t, d, n_risk, round(ln(1.0 - CAST(d AS DOUBLE) / n_risk), 9) AS lf
       |  FROM risk WHERE d > 0 AND d < n_risk),
       |km AS (
       |  SELECT t, d, n_risk,
       |    round(exp(CAST(SUM(CAST(lf AS DECIMAL(28,12))) OVER (ORDER BY t)
       |      AS DOUBLE)), 6) AS survival
       |  FROM f)
       |SELECT CAST(t AS BIGINT) AS t, CAST(d AS BIGINT) AS d,
       |  CAST(n_risk AS BIGINT) AS n_risk, survival
       |FROM km ORDER BY t""".stripMargin

  /** Two-proportion z-test between deterministic experiment arms
    * (user_id parity — the hash-bucketing every real experimentation
    * platform uses, minus the salt): conversion = any high-value
    * purchase. One per-user reduction, one 2-row arm aggregate, one
    * pooled-variance z on exact integers — the canonical A/B readout
    * as a declared query, and the statistical companion to
    * [[driftHalves]]' distribution monitor. */
  def abTest(spark: SparkSession, d: String): DataFrame = {
    val arms = Tables.events(spark, d)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase" &&
        col("value") > HighValue, 1L).otherwise(0L)).as("conv"))
      .select((col("user_id") % 2).as("arm"), col("conv"))
    val agg = arms.groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("conv")).as("x"))
    val w = agg.agg(
      max(when(col("arm") === 0, col("n"))).as("n0"),
      max(when(col("arm") === 0, col("x"))).as("x0"),
      max(when(col("arm") === 1, col("n"))).as("n1"),
      max(when(col("arm") === 1, col("x"))).as("x1"))
    val p0 = col("x0").cast("double") / col("n0")
    val p1 = col("x1").cast("double") / col("n1")
    val pp = (col("x0") + col("x1")).cast("double") / (col("n0") + col("n1"))
    w.select(
      col("n0").as("n_control"), col("x0").as("conv_control"),
      col("n1").as("n_treat"), col("x1").as("conv_treat"),
      round(p0, 9).as("p_control"), round(p1, 9).as("p_treat"),
      round((p1 - p0) /
        sqrt(pp * (lit(1.0) - pp) *
          (lit(1.0) / col("n0") + lit(1.0) / col("n1"))), 9).as("z"))
  }

  def abTestSql: String =
    s"""WITH arms AS (
       |  SELECT user_id, user_id % 2 AS arm,
       |    MAX(CASE WHEN event_type = 'purchase' AND value > $HighValue
       |        THEN 1 ELSE 0 END) AS conv
       |  FROM events GROUP BY user_id),
       |agg AS (SELECT arm, COUNT(*) AS n, SUM(conv) AS x FROM arms GROUP BY arm),
       |w AS (
       |  SELECT
       |    MAX(CASE WHEN arm = 0 THEN n END) AS n0,
       |    MAX(CASE WHEN arm = 0 THEN x END) AS x0,
       |    MAX(CASE WHEN arm = 1 THEN n END) AS n1,
       |    MAX(CASE WHEN arm = 1 THEN x END) AS x1
       |  FROM agg)
       |SELECT CAST(n0 AS BIGINT) AS n_control, CAST(x0 AS BIGINT) AS conv_control,
       |  CAST(n1 AS BIGINT) AS n_treat, CAST(x1 AS BIGINT) AS conv_treat,
       |  round(CAST(x0 AS DOUBLE) / n0, 9) AS p_control,
       |  round(CAST(x1 AS DOUBLE) / n1, 9) AS p_treat,
       |  round((CAST(x1 AS DOUBLE) / n1 - CAST(x0 AS DOUBLE) / n0) /
       |    sqrt((CAST(x0 + x1 AS DOUBLE) / (n0 + n1))
       |      * (1.0 - CAST(x0 + x1 AS DOUBLE) / (n0 + n1))
       |      * (1.0 / n0 + 1.0 / n1)), 9) AS z
       |FROM w""".stripMargin

  /** Benford first-digit profile of the event `value` column — the
    * classic fabricated-data / instrumentation-bug diagnostic: natural
    * multiplicative quantities put ~30.1% of first digits at 1; a
    * uniform RNG or a capped field shows up instantly as a flat or
    * truncated profile. The digit is extracted WITHOUT float
    * formatting (each engine prints doubles its own way): the value
    * goes through DECIMAL(18,6), scales to an exact integer, and the
    * first digit comes off the integer's decimal string — identical
    * in both engines by construction. One groupBy onto ≤9 keys; the
    * expected-p constants are one rounded ln ratio per digit. */
  def benfordValues(spark: SparkSession, d: String): DataFrame = {
    val pos = Tables.events(spark, d)
      .where(col("value") > 0)
      .select((col("value").cast("decimal(18,6)") * lit(1000000))
        .cast("bigint").as("iv"))
    val c = pos.select(substring(col("iv").cast("string"), 1, 1)
        .cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val tot = c.agg(sum(col("n")).cast("double").as("t"))
    c.crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        round(col("n") / col("t"), 9).as("p"),
        round(log(lit(1.0) + lit(1.0) / col("digit")) / log(lit(10.0)), 9)
          .as("benford_p"))
      .orderBy("digit")
  }

  def benfordValuesSql: String =
    """WITH pos AS (
      |  SELECT CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS iv
      |  FROM events WHERE value > 0),
      |dig AS (
      |  SELECT CAST(substr(CAST(iv AS VARCHAR), 1, 1) AS INT) AS digit FROM pos),
      |c AS (SELECT digit, COUNT(*) AS n FROM dig GROUP BY digit),
      |tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS t FROM c)
      |SELECT digit, CAST(n AS BIGINT) AS n,
      |  round(n / t, 9) AS p,
      |  round(ln(1.0 + 1.0 / digit) / ln(10.0), 9) AS benford_p
      |FROM c, tot ORDER BY digit""".stripMargin

  /** Event-type co-occurrence cosine over (user, day) incidence — the
    * item-item collaborative-filtering primitive: how strongly two
    * event types light up together in the same user-day. Incidence is
    * BINARY and day-granular (plain per-user incidence saturates: at
    * any realistic history length every user eventually touches every
    * type and all cosines hit 1.0). Scale shape: the distinct
    * (user, day, type) table shuffles once on its natural key; the
    * pair self-join is an equi-join on (user_id, day) whose per-row
    * fan-out is bounded by |types|² — never a cross join — and the
    * pair counts re-aggregate onto a ≤ |types|² key space map-side.
    * The per-type marginals are a |types|-row broadcast. Cosines are
    * exact-integer ratios through one sqrt, rounded to 9. */
  def cooccurTypes(spark: SparkSession, d: String): DataFrame = {
    val inc = Tables.events(spark, d)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("event_type"))
      .distinct()
    val n = inc.groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
    val a = inc.select(col("user_id"), col("day"), col("event_type").as("ta"))
    val bb = inc.select(col("user_id"), col("day"), col("event_type").as("tb"))
    val pairs = a.join(bb, Seq("user_id", "day"))
      .where(col("ta") < col("tb"))
      .groupBy(col("ta"), col("tb"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(n.select(col("event_type").as("ta"), col("cnt").as("n_a"))), Seq("ta"))
      .join(broadcast(n.select(col("event_type").as("tb"), col("cnt").as("n_b"))), Seq("tb"))
      .select(col("ta"), col("tb"), col("n_both"), col("n_a"), col("n_b"),
        round(col("n_both").cast("double") /
          sqrt(col("n_a").cast("double") * col("n_b")), 9).as("cosine"))
      .orderBy("ta", "tb")
  }

  def cooccurTypesSql: String =
    """WITH inc AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type FROM events),
      |n AS (SELECT event_type, COUNT(*) AS cnt FROM inc GROUP BY event_type),
      |pairs AS (
      |  SELECT a.event_type AS ta, b.event_type AS tb, COUNT(*) AS n_both
      |  FROM inc a JOIN inc b ON a.user_id = b.user_id AND a.day = b.day
      |    AND a.event_type < b.event_type
      |  GROUP BY 1, 2)
      |SELECT ta, tb, CAST(n_both AS BIGINT) AS n_both,
      |  CAST(na.cnt AS BIGINT) AS n_a, CAST(nb.cnt AS BIGINT) AS n_b,
      |  round(n_both / sqrt(CAST(na.cnt AS DOUBLE) * nb.cnt), 9) AS cosine
      |FROM pairs JOIN n na ON na.event_type = ta JOIN n nb ON nb.event_type = tb
      |ORDER BY ta, tb""".stripMargin

  /** Rolling 7-day distinct users (WAU) per day, with same-day DAU and
    * the DAU/WAU stickiness ratio — the engagement dashboard's
    * headline trio. Distinct-over-a-sliding-window can't ride a plain
    * window frame (COUNT(DISTINCT) isn't frame-able), so the scale
    * shape is: dedupe once to (day, user) — the only event-sized
    * pass — then a 7-day calendar-range join against the
    * days-of-history-sized day list (broadcast), re-dedupe onto
    * (day, user), count. Everything after the first dedupe is
    * (days × active-users)-sized, never event-sized. */
  def wauRolling(spark: SparkSession, d: String): DataFrame = {
    val du = Tables.events(spark, d)
      .select(to_date(col("ts")).as("aday"), col("user_id")).distinct()
      .localCheckpoint(false) // read three times (days, window, dau)
    val days = du.select(col("aday").as("day")).distinct()
    val wau = du.join(broadcast(days),
        col("aday").between(date_sub(col("day"), 6), col("day")))
      .select(col("day"), col("user_id")).distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("wau"))
    val dau = du.groupBy(col("aday").as("day")).agg(count(lit(1)).as("dau"))
    dau.join(wau, Seq("day"))
      .select(col("day"), col("dau"), col("wau"),
        round(col("dau").cast("double") / col("wau"), 9).as("stickiness"))
      .orderBy("day")
  }

  def wauRollingSql: String =
    """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
      |days AS (SELECT DISTINCT day FROM du),
      |win AS (
      |  SELECT d.day, du.user_id
      |  FROM days d JOIN du ON du.day BETWEEN d.day - 6 AND d.day
      |  GROUP BY d.day, du.user_id),
      |wau AS (SELECT day, COUNT(*) AS wau FROM win GROUP BY day),
      |dau AS (SELECT day, COUNT(*) AS dau FROM du GROUP BY day)
      |SELECT d.day, CAST(dau.dau AS BIGINT) AS dau, CAST(wau.wau AS BIGINT) AS wau,
      |  round(CAST(dau.dau AS DOUBLE) / wau.wau, 9) AS stickiness
      |FROM days d JOIN dau ON dau.day = d.day JOIN wau ON wau.day = d.day
      |ORDER BY d.day""".stripMargin

  /** SCD Type-2 history build — change-data-capture compaction, the
    * interval-building half of the ingest pair ([[graft.ops
    * .TrainingPrepOps.mergeUpsert]] is the overwrite half): each
    * user's event stream, ordered by (ts, event_id), collapses into
    * runs of consecutive equal event_type, emitted as validity
    * intervals (valid_from = run start, valid_to = next run's start,
    * open-ended + is_current on the last). This is how a warehouse
    * derives dimension history from a raw change log. Shape: one
    * user-partitioned shuffle carries the lag, the run segmentation
    * (cumulative change-flag sum), the per-run aggregate, and the
    * lead — four window/agg passes over the SAME partitioning, so
    * Catalyst plans a single exchange; everything is exact integers
    * and timestamps, no float anywhere. */
  def scd2History(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val seg = Tables.events(spark, d)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .withColumn("run",
        sum(when(col("prev").isNull || col("prev") =!= col("event_type"), 1L)
          .otherwise(0L)).over(w))
    val runs = seg.groupBy(col("user_id"), col("run"))
      .agg(max(col("event_type")).as("event_type"), // constant within a run
        min(col("ts")).as("valid_from"),
        count(lit(1)).as("n_events"))
    val w2 = Window.partitionBy(col("user_id")).orderBy(col("run"))
    // end-of-time sentinel, not NULL: open intervals stay
    // BETWEEN-queryable, and the gate never compares NULL timestamps
    // (engines disagree on NaT equality). NOT year 9999: any reader
    // that narrows parquet timestamps to int64 nanoseconds (Arrow's
    // datetime64[ns]) wraps 9999-12-31 to year 1816; 2200-01-01 is
    // far past any generated event yet well inside the ns range
    // (max 2262-04-11).
    val eot = to_timestamp(lit("2200-01-01 00:00:00"))
    runs
      .withColumn("next_from", lead(col("valid_from"), 1).over(w2))
      .select(col("user_id"), col("event_type"), col("valid_from"),
        coalesce(col("next_from"), eot).as("valid_to"), col("n_events"),
        col("next_from").isNull.as("is_current"))
      .orderBy("user_id", "valid_from")
  }

  def scd2HistorySql: String =
    """WITH o AS (
      |  SELECT user_id, event_type, ts, event_id,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events),
      |seg AS (
      |  SELECT user_id, event_type, ts,
      |    SUM(CASE WHEN prev IS NULL OR prev <> event_type THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS run
      |  FROM o),
      |runs AS (
      |  SELECT user_id, run, MAX(event_type) AS event_type,
      |    MIN(ts) AS valid_from, COUNT(*) AS n_events
      |  FROM seg GROUP BY user_id, run)
      |SELECT user_id, event_type, valid_from,
      |  COALESCE(lead(valid_from) OVER (PARTITION BY user_id ORDER BY run),
      |    TIMESTAMP '2200-01-01 00:00:00') AS valid_to,
      |  CAST(n_events AS BIGINT) AS n_events,
      |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY run) IS NULL AS is_current
      |FROM runs ORDER BY user_id, valid_from""".stripMargin

  /** Inter-arrival cadence per event type: the gap distribution
    * between a user's CONSECUTIVE events of the same type ("how often
    * does a user purchase"), summarized as exact-integer millisecond
    * percentiles. Quantiles are the rank-statistic recipe (row_number
    * over a (gap, user, event) TOTAL order, pick the floor-indexed
    * rank) so both engines select the identical element — no
    * interpolation, no float. Shape: the lag rides a (user, type)
    * partition; everything downstream is |types|-keyed. */
  def interarrival(spark: SparkSession, d: String): DataFrame = {
    // microseconds, not millis: unix_micros is injective on the µs
    // timestamps, so ordering by (us, event_id) IS (ts, event_id)
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("us"), col("event_id"))
    val gaps = Tables.events(spark, d)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
      .where(col("gap_us").isNotNull)
    val wr = Window.partitionBy(col("event_type"))
      .orderBy(col("gap_us"), col("user_id"), col("event_id"))
    val wn = Window.partitionBy(col("event_type"))
    gaps
      .withColumn("rn", row_number().over(wr))
      .withColumn("n", count(lit(1)).over(wn))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n_gaps"),
        // `div`, not `/`: Spark's `/` on longs is double division
        max(when(col("rn") === expr("(n - 1) div 2 + 1"), col("gap_us"))).as("p50_us"),
        max(when(col("rn") === expr("((n - 1) * 9) div 10 + 1"), col("gap_us"))).as("p90_us"),
        sum(col("gap_us")).as("sum_us"))
      .select(col("event_type"), col("n_gaps"), col("p50_us"), col("p90_us"),
        round(col("sum_us").cast("double") / col("n_gaps"), 6).as("mean_us"))
      .orderBy("event_type")
  }

  def interarrivalSql: String =
    """WITH g AS (
      |  SELECT user_id, event_type, event_id,
      |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
      |      PARTITION BY user_id, event_type ORDER BY ts, event_id) AS gap_us
      |  FROM events),
      |gg AS (SELECT event_type, gap_us, user_id, event_id
      |  FROM g WHERE gap_us IS NOT NULL),
      |rk AS (
      |  SELECT event_type, gap_us,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY gap_us, user_id, event_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM gg)
      |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_gaps,
      |  CAST(MAX(CASE WHEN rn = (n-1)//2 + 1 THEN gap_us END) AS BIGINT) AS p50_us,
      |  CAST(MAX(CASE WHEN rn = ((n-1)*9)//10 + 1 THEN gap_us END) AS BIGINT) AS p90_us,
      |  round(CAST(SUM(gap_us) AS DOUBLE) / MAX(n), 6) AS mean_us
      |FROM rk GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Power-law (Zipf-tail) exponent of per-user activity, per event
    * type — the heavy-tail diagnostic for traffic mixes (α near 1:
    * extremely heavy tail; α ≥ 2-3: light): the continuous MLE
    * α = 1 + n / Σ ln(xᵤ / ½) with x_min = 1 (Clauset/Shalizi/Newman
    * form). The per-user ln is quantized to 9 decimals and summed as
    * DECIMAL so the Σ — the only float reduction — is order-free;
    * both engines then divide the same two exact numbers. Shape: one
    * (type, user) aggregate, then |types| keys. */
  def powerlawAlpha(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("x"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"),
        round(lit(1.0) + count(lit(1)) /
          sum(round(log(lit(2.0) * col("x")), 9).cast("decimal(18,9)"))
            .cast("double"), 6).as("alpha"))
      .orderBy("event_type")

  def powerlawAlphaSql: String =
    """WITH ua AS (
      |  SELECT event_type, user_id, COUNT(*) AS x FROM events GROUP BY 1, 2)
      |SELECT event_type, COUNT(*) AS n_users,
      |  round(1.0 + COUNT(*) /
      |    CAST(SUM(CAST(round(ln(2.0 * x), 9) AS DECIMAL(18,9))) AS DOUBLE),
      |    6) AS alpha
      |FROM ua GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Gini coefficient of per-user activity, per event type — the
    * inequality audit behind [[powerLawAlpha]]'s tail exponent: one
    * number for "how concentrated is this event stream on its
    * heaviest users". Computed from the classic rank formula
    * G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) over ascending-sorted
    * per-user counts — but WITHOUT ranking users: equal counts form a
    * tie block whose rank-sum is closed-form (c·prev + c(c+1)/2, an
    * exact integer since c(c+1) is even), so the window runs over
    * DISTINCT activity levels per type (bounded by the max per-user
    * count — thousands at any corpus size), never over the users
    * themselves. A per-row ROW_NUMBER over 10⁹ users in one window
    * partition is exactly the plan this avoids. Everything up to the
    * final division is BIGINT-exact in both engines (documented
    * bound: Σ i·xᵢ < 2⁶³, i.e. n·Σx < 9.2e18 — ANSI mode faults
    * loudly past it); the single double division of exact integers is
    * bit-identical cross-engine with no rounding crutch. */
  def giniActivity(spark: SparkSession, d: String): DataFrame =
    giniOnCounts(Tables.events(spark, d)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("x")))

  /** The tie-block rank-sum core over (event_type, user_id, x) —
    * testable on crafted count tables. */
  private[ops] def giniOnCounts(perUser: DataFrame): DataFrame = {
    val blocks = perUser
      .groupBy(col("event_type"), col("x"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    blocks
      .withColumn("prev", coalesce(sum(col("c")).over(w), lit(0L)))
      .groupBy(col("event_type"))
      .agg(sum(col("c")).as("n_users"),
        sum(col("x") * col("c")).as("total_events"),
        sum(col("x") * (col("c") * col("prev") + expr("c * (c + 1) div 2"))).as("s"))
      .select(col("event_type"), col("n_users"), col("total_events"),
        ((lit(2L) * col("s") - (col("n_users") + lit(1L)) * col("total_events")).cast("double")
          / (col("n_users") * col("total_events")).cast("double")).as("gini"))
      .orderBy("event_type")
  }

  def giniActivitySql: String =
    """WITH per_user AS (
      |  SELECT event_type, user_id, COUNT(*) AS x FROM events GROUP BY 1, 2),
      |blocks AS (
      |  SELECT event_type, x, COUNT(*) AS c FROM per_user GROUP BY 1, 2),
      |pref AS (
      |  SELECT event_type, x, c,
      |    CAST(COALESCE(SUM(c) OVER (PARTITION BY event_type ORDER BY x
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prev
      |  FROM blocks)
      |SELECT event_type, CAST(SUM(c) AS BIGINT) AS n_users,
      |  CAST(SUM(x * c) AS BIGINT) AS total_events,
      |  CAST(2 * SUM(x * (c * prev + c * (c + 1) // 2))
      |       - (SUM(c) + 1) * SUM(x * c) AS DOUBLE)
      |    / CAST(SUM(c) * SUM(x * c) AS DOUBLE) AS gini
      |FROM pref GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Peak session concurrency per day — the capacity-planning sweep
    * line: sessions ([[sessions]]' 30-minute gap rule) become
    * ±1 boundary deltas (closed intervals: the −1 lands at
    * end_ms + 1, and same-millisecond starts order before ends via
    * `delta DESC`, so a session starting exactly when another ends
    * counts as concurrent), and the running sum of deltas at each
    * boundary is the live-session count. The prefix sum is TWO-LEVEL
    * so no window ever spans the data: deltas aggregate per hour
    * (map-side combined), the carry-in prefix runs over the
    * HOURS-sized relation (calendar-sized, the [[ewmaDaily]] stance
    * on its single partition), and the within-hour running sum is an
    * ordinary hour-partitioned window — the textbook distributed
    * scan decomposition. The hour→carry lookup broadcasts (hours of
    * history, not data). All-integer arithmetic end to end; the
    * per-day max is order-independent across equal-(ms,delta) ties
    * because their partial-sum multiset is permutation-invariant. */
  def concurrencyDaily(spark: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
    val sess = Tables.events(spark, d)
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ts_ms"))
      .withColumn("prev_ms", lag(col("ts_ms"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ms").isNull || col("ts_ms") - col("prev_ms") > 30L * 60 * 1000, 1)
          .otherwise(0))
      .withColumn("session_seq", sum(col("new_sess")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_seq")
      .agg(min(col("ts_ms")).as("start_ms"), max(col("ts_ms")).as("end_ms"))
    concurrencyOnSessions(sess)
  }

  /** The two-level sweep-line core over (start_ms, end_ms) intervals —
    * testable on crafted session tables. */
  private[ops] def concurrencyOnSessions(sess: DataFrame): DataFrame = {
    // boundary deltas feed three consumers (hourly sums + the runs
    // join) — materialize once, not three session builds
    val deltas = sess.select(col("start_ms").as("ms"), lit(1L).as("delta"))
      .union(sess.select((col("end_ms") + 1L).as("ms"), lit(-1L).as("delta")))
      .localCheckpoint(false)
    val carry = deltas.groupBy(expr("ms div 3600000").as("hr"))
      .agg(sum(col("delta")).as("dsumh"))
      .withColumn("carry_in", coalesce(sum(col("dsumh")).over(
        Window.orderBy(col("hr")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("hr"), col("carry_in"))
    deltas
      .join(broadcast(carry), expr("(ms div 3600000) = hr"))
      .withColumn("conc", col("carry_in") + sum(col("delta")).over(
        Window.partitionBy(col("hr")).orderBy(col("ms").asc, col("delta").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(to_date(timestamp_millis(col("ms"))).as("day"))
      .agg(max(col("conc")).as("max_concurrent"))
      .orderBy("day")
  }

  def concurrencyDailySql: String =
    """WITH evs AS (
      |  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
      |    LAG(epoch_ms(ts), 1) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS prev_ms
      |  FROM events),
      |flagged AS (
      |  SELECT *, CASE WHEN prev_ms IS NULL OR ts_ms - prev_ms > 30*60*1000
      |                 THEN 1 ELSE 0 END AS new_sess
      |  FROM evs),
      |tagged AS (
      |  SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      |  FROM flagged),
      |sess AS (
      |  SELECT user_id, session_seq, MIN(ts_ms) AS start_ms, MAX(ts_ms) AS end_ms
      |  FROM tagged GROUP BY 1, 2),
      |deltas AS (
      |  SELECT start_ms AS ms, 1 AS delta FROM sess
      |  UNION ALL
      |  SELECT end_ms + 1 AS ms, -1 AS delta FROM sess),
      |carry AS (
      |  SELECT hr, CAST(COALESCE(SUM(dsumh) OVER (ORDER BY hr
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS carry_in
      |  FROM (SELECT ms // 3600000 AS hr, SUM(delta) AS dsumh FROM deltas GROUP BY 1)),
      |runs AS (
      |  SELECT d.ms, c.carry_in + SUM(d.delta) OVER (
      |      PARTITION BY d.ms // 3600000 ORDER BY d.ms ASC, d.delta DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
      |  FROM deltas d JOIN carry c ON c.hr = d.ms // 3600000)
      |SELECT CAST(make_timestamp(ms * 1000) AS DATE) AS day,
      |  CAST(MAX(conc) AS BIGINT) AS max_concurrent
      |FROM runs GROUP BY 1 ORDER BY day""".stripMargin

  /** Time-constrained conversion funnel — `evt_funnel` counts users
    * who EVER progressed view→click→purchase; real funnels bound each
    * step by a window (here 24 h): first view, first click within
    * 24 h AFTER it, first purchase within 24 h after THAT click.
    * Emits one row per stage with the surviving-user count.
    *
    * Scale shape: each stage is a per-user min-aggregation — events
    * filter by type at the SCAN (predicate pushed to parquet), shuffle
    * once on user_id, and the stage tables that flow forward are
    * USER-sized, not event-sized; the three user_id shuffles share one
    * partitioning so the joins after stage 1 co-locate without
    * exchange. No windows over raw events, no per-user event arrays —
    * state per user is a single timestamp. Counts are exact integers;
    * timestamps compare exactly (micros). */
  def funnelWindow(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
    def typed(t: String) = ev.where(col("event_type") === t)
      .select(col("user_id"), col("ts"))
    val s1 = typed("view").groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = typed("click").join(s1, Seq("user_id"))
      .where(col("ts") > col("t1") &&
        col("ts") <= col("t1") + expr("INTERVAL 24 HOURS"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val s3 = typed("purchase").join(s2, Seq("user_id"))
      .where(col("ts") > col("t2") &&
        col("ts") <= col("t2") + expr("INTERVAL 24 HOURS"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    val one = s1.agg(count(lit(1)).as("n_users"))
      .select(lit(1).as("stage"), lit("view").as("step"), col("n_users"))
    val two = s2.agg(count(lit(1)).as("n_users"))
      .select(lit(2).as("stage"), lit("click_24h").as("step"), col("n_users"))
    val three = s3.agg(count(lit(1)).as("n_users"))
      .select(lit(3).as("stage"), lit("purchase_24h").as("step"), col("n_users"))
    one.unionAll(two).unionAll(three).orderBy(col("stage"))
  }

  def funnelWindowSql: String =
    """WITH s1 AS (
      |  SELECT user_id, min(ts) AS t1 FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |s2 AS (
      |  SELECT e.user_id, min(e.ts) AS t2 FROM events e
      |  JOIN s1 ON e.user_id = s1.user_id
      |  WHERE e.event_type = 'click' AND e.ts > s1.t1
      |    AND e.ts <= s1.t1 + INTERVAL 24 HOUR GROUP BY 1),
      |s3 AS (
      |  SELECT e.user_id, min(e.ts) AS t3 FROM events e
      |  JOIN s2 ON e.user_id = s2.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      |    AND e.ts <= s2.t2 + INTERVAL 24 HOUR GROUP BY 1)
      |SELECT 1 AS stage, 'view' AS step, COUNT(*) AS n_users FROM s1
      |UNION ALL SELECT 2, 'click_24h', COUNT(*) FROM s2
      |UNION ALL SELECT 3, 'purchase_24h', COUNT(*) FROM s3
      |ORDER BY stage""".stripMargin

  /** Longest consecutive-day activity streak per user, reported as a
    * distribution (`streak_len` → how many users peak at exactly that
    * streak) — the gaps-and-islands idiom the analytics suite lacked:
    * `day − row_number()` is constant within a consecutive run, so one
    * window + one groupBy finds every island with no self-join.
    *
    * Scale shape: the raw event stream reduces to DISTINCT
    * (user, day) FIRST — everything after is bounded by users ×
    * calendar days, not by events. The window partitions by user_id
    * (no global sort, reuses the distinct's hash partitioning), and
    * the final histogram is day-count-sized. Integers end-to-end. */
  def streaks(spark: SparkSession, d: String): DataFrame = {
    val days = Tables.events(spark, d)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val isl = days.withColumn("rn",
        row_number().over(Window.partitionBy(col("user_id")).orderBy(col("day"))))
      .select(col("user_id"), expr("date_sub(day, rn)").as("grp"))
    val best = isl.groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id")).agg(max(col("len")).as("best_streak"))
    best.groupBy(col("best_streak").as("streak_len"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("streak_len"))
  }

  def streaksSql: String =
    """WITH days AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |isl AS (
      |  SELECT user_id,
      |    day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS INT) AS grp
      |  FROM days),
      |best AS (
      |  SELECT user_id, MAX(len) AS best_streak
      |  FROM (SELECT user_id, grp, COUNT(*) AS len FROM isl GROUP BY 1, 2)
      |  GROUP BY 1)
      |SELECT best_streak AS streak_len, COUNT(*) AS n_users
      |FROM best GROUP BY 1 ORDER BY streak_len""".stripMargin

  /** Theil–Sen robust trend slope over the daily event counts — the
    * outlier-proof alternative to least squares (one corrupted day
    * moves OLS arbitrarily; the median pairwise slope has a 29 %
    * breakdown point). Median by EXACT rank selection (rows
    * ⌊(n+1)/2⌋ and ⌊(n+2)/2⌋, decimal-averaged), not an interpolating
    * percentile whose tie-breaking differs across engines.
    *
    * Scale shape: events reduce to one row per DAY first, so the
    * all-pairs slope join and the rank window run on a calendar-
    * bounded table (30 days → 435 pairs) at ANY data scale — the
    * quadratic stage and the single-partition window are day-sized by
    * construction, never event-sized. Slopes divide exact integers
    * (IEEE-identical cross-engine), rounded 9. */
  def theilSen(spark: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(spark, d)
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("c"))
    val pr = daily.as("a").join(daily.as("b"), col("b.day") > col("a.day"))
      .select(round((col("b.c") - col("a.c")).cast("double") /
        datediff(col("b.day"), col("a.day")), 9).as("slope"))
    val rk = pr
      .withColumn("r", row_number().over(Window.orderBy(col("slope"))))
      .crossJoin(broadcast(pr.agg(count(lit(1)).as("n"))))
    val med = rk
      .where(col("r") === expr("(n + 1) div 2") ||
        col("r") === expr("(n + 2) div 2"))
      .agg(max(col("n")).as("n_pairs"),
        round(sum(col("slope").cast("decimal(18,9)")).cast("double") /
          count(lit(1)), 9).as("slope_med"))
    val nd = daily.agg(count(lit(1)).as("n_days"))
    med.crossJoin(broadcast(nd))
      .select(col("n_days"), col("n_pairs"), col("slope_med"))
  }

  def theilSenSql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS c FROM events GROUP BY 1),
      |pr AS (
      |  SELECT round(CAST(b.c - a.c AS DOUBLE) / (b.day - a.day), 9) AS slope
      |  FROM daily a JOIN daily b ON b.day > a.day),
      |rk AS (SELECT slope, row_number() OVER (ORDER BY slope) AS r,
      |    COUNT(*) OVER () AS n FROM pr)
      |SELECT (SELECT COUNT(*) FROM daily) AS n_days, MAX(n) AS n_pairs,
      |  round(CAST(SUM(CAST(slope AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*), 9)
      |    AS slope_med
      |FROM rk WHERE r = (n + 1) // 2 OR r = (n + 2) // 2""".stripMargin

  /** Lorenz/Pareto concentration curve of user activity — the decile
    * view behind `evt_gini`'s single number: users ranked by event
    * count (heaviest first), split into 10 equal-population deciles,
    * each reported with its user count, event total, and share. The
    * "do 10 % of users generate 80 % of traffic" readout.
    *
    * Scale shape: events reduce to one row per USER first; the global
    * rank window runs on the user-count table (never events), and the
    * decile assignment is pure integer arithmetic ((r−1)·10 ÷ n) so
    * both engines bucket identically — no ntile(), whose remainder
    * distribution is engine-defined. Shares divide exact integers. */
  def paretoUsers(spark: SparkSession, d: String): DataFrame = {
    val uc = Tables.events(spark, d)
      .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
    val tot = uc.agg(count(lit(1)).as("nu"), sum(col("c")).as("tot"))
    val rk = uc.withColumn("r",
        row_number().over(Window.orderBy(col("c").desc, col("user_id"))))
      .crossJoin(broadcast(tot))
    rk.select(expr("(r - 1) * 10 div nu").as("decile"), col("c"), col("tot"))
      .withColumn("decile", (col("decile") + 1).cast("int"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_users"), sum(col("c")).as("n_events"),
        round(sum(col("c")).cast("double") / max(col("tot")), 9).as("share"))
      .orderBy(col("decile"))
  }

  def paretoUsersSql: String =
    """WITH uc AS (
      |  SELECT user_id, COUNT(*) AS c FROM events GROUP BY 1),
      |rk AS (SELECT c, row_number() OVER (ORDER BY c DESC, user_id) AS r,
      |    COUNT(*) OVER () AS nu, SUM(c) OVER () AS tot FROM uc)
      |SELECT CAST(((r - 1) * 10) // nu + 1 AS INT) AS decile,
      |  COUNT(*) AS n_users, CAST(SUM(c) AS BIGINT) AS n_events,
      |  round(CAST(SUM(c) AS DOUBLE) / MAX(tot), 9) AS share
      |FROM rk GROUP BY 1 ORDER BY 1""".stripMargin

  /** Cohort lifetime value — `evt_retention`'s monetary face: users
    * cohorted by first-seen week, each (cohort, age-in-weeks) cell
    * reporting active users, events, and value total. Weeks come
    * from epoch-day arithmetic against the pinned Monday anchor
    * (the `evt_seasonal` recipe), cohort ids normalized to 0-based.
    *
    * Scale shape: one per-user first-seen aggregate, one event-scale
    * join back on user_id (both sides hash-partitioned on the same
    * key), then a cells-bounded aggregate (cohorts × ages). Value
    * sums through DECIMAL. */
  def cohortLtv(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
    val firsts = ev.groupBy(col("user_id")).agg(min(to_date(col("ts"))).as("d0"))
    val j = ev.join(firsts, Seq("user_id"))
      .select(col("user_id"), col("value"),
        expr("datediff(d0, DATE'2000-01-03') div 7").as("cw"),
        (expr("datediff(CAST(ts AS DATE), DATE'2000-01-03') div 7") -
          expr("datediff(d0, DATE'2000-01-03') div 7")).as("age_week"))
    val minCw = j.agg(min(col("cw")).as("min_cw"))
    j.crossJoin(broadcast(minCw))
      .groupBy((col("cw") - col("min_cw")).as("cohort_week"), col("age_week"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"),
        OpsUtil.dsum(col("value")).as("total_value"))
      .orderBy("cohort_week", "age_week")
  }

  def cohortLtvSql: String =
    """WITH firsts AS (
      |  SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events GROUP BY 1),
      |j AS (
      |  SELECT e.user_id, e.value,
      |    CAST(f.d0 - DATE '2000-01-03' AS INT) // 7 AS cw,
      |    (CAST(CAST(e.ts AS DATE) - DATE '2000-01-03' AS INT) // 7)
      |      - (CAST(f.d0 - DATE '2000-01-03' AS INT) // 7) AS age_week
      |  FROM events e JOIN firsts f USING (user_id))
      |SELECT cw - (SELECT MIN(cw) FROM j) AS cohort_week, age_week,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      |FROM j GROUP BY 1, 2 ORDER BY cohort_week, age_week""".stripMargin

  /** Holt linear-trend smoothing + 7-day forecast over the daily
    * series with dyadic α = β = ½ — the forecasting face next to
    * `evt_dema`'s smoothing (level AND explicit trend state, plus the
    * h-step-ahead readout ŷ = ℓ + h·b a capacity planner consumes).
    *
    * Scale shape: events reduce to daily counts, then the ENTIRE
    * recursion runs as one `aggregate` fold over the 30-element
    * day array on a single row — day-bounded by construction, the
    * right home for inherently sequential state (no per-round jobs,
    * no driver loop). Each step rounds ℓ and b at 9, so both engines
    * fold bit-identical values (the emb_kmeans_loop stance without
    * the unrolled CTE — DuckDB replays the same fold via
    * list_reduce). Init: ℓ₀ = x₂, b₀ = x₂ − x₁. */
  def holtForecast(spark: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(spark, d)
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("c"))
    val ser = daily
      .agg(array_sort(collect_list(struct(col("day"), col("c")))).as("s"))
      .select(transform(col("s"), e => e.getField("c").cast("double")).as("xs"))
      .where(size(col("xs")) >= 3)
    def fld(a: org.apache.spark.sql.Column, f: String) = a.getField(f)
    val st = ser.select(size(col("xs")).cast("long").as("n_days"),
      aggregate(
        slice(col("xs"), lit(3), size(col("xs")) - 2),
        struct(element_at(col("xs"), 2).as("l"),
          (element_at(col("xs"), 2) - element_at(col("xs"), 1)).as("b")),
        // b' in the algebraically expanded form (x − ℓ + 3b)/4, NOT
        // via ℓ' reuse: DuckDB's list_reduce overwrites acc fields
        // in place as struct fields evaluate, so any cross-engine
        // fold must keep each field a pure function of the OLD state
        (acc, x) => struct(
          round((x + fld(acc, "l") + fld(acc, "b")) / 2, 9).as("l"),
          round((x - fld(acc, "l") + lit(3) * fld(acc, "b")) / 4, 9).as("b"))).as("st"))
    st.select(col("n_days"), col("st.l").as("l"), col("st.b").as("b"),
        explode(sequence(lit(1), lit(7))).as("h"))
      .select(col("h").cast("int").as("h"),
        round(col("l") + col("h") * col("b"), 9).as("forecast"),
        round(col("l"), 9).as("level"), round(col("b"), 9).as("trend"),
        col("n_days"))
      .orderBy("h")
  }

  def holtForecastSql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS c FROM events GROUP BY 1),
      |ser AS (SELECT list(c ORDER BY day) AS xs, COUNT(*) AS nd FROM daily),
      |fold AS (
      |  -- list (not struct) accumulator: DuckDB's list_reduce
      |  -- mutates a struct acc field-by-field mid-lambda; the list
      |  -- constructor builds fresh state from the OLD acc
      |  SELECT nd,
      |    list_reduce(
      |      list_prepend(CAST([xs[2], xs[2] - xs[1]] AS DOUBLE[]),
      |        list_transform(xs[3:], v -> CAST([v, 0.0] AS DOUBLE[]))),
      |      (acc, e) -> [round((e[1] + acc[1] + acc[2]) / 2, 9),
      |                   round((e[1] - acc[1] + 3 * acc[2]) / 4, 9)]) AS st
      |  FROM ser WHERE nd >= 3)
      |SELECT CAST(h AS INT) AS h, round(st[1] + h * st[2], 9) AS forecast,
      |  round(st[1], 9) AS level, round(st[2], 9) AS trend,
      |  CAST(nd AS BIGINT) AS n_days
      |FROM fold, unnest([1, 2, 3, 4, 5, 6, 7]) AS t(h) ORDER BY h""".stripMargin

  /** MAD-based robust anomaly screen over the daily series — the
    * outlier-proof twin of `evt_anomaly` (whose mean ± 2σ gate a
    * single extreme day corrupts): score = (c − median) /
    * (1.4826·MAD), flagged at |score| > 3. Both medians use the
    * exact-rank selection recipe (`evt_theilsen`): rows ⌊(n+1)/2⌋ and
    * ⌊(n+2)/2⌋ of the ordered set, integer-sum-averaged — never an
    * interpolating percentile.
    *
    * Scale shape: one event-scale aggregation to daily counts; both
    * median selections and the scoring run on the calendar-bounded
    * day table (two 1-row broadcast scalars). Deviations are exact
    * (integer c, median ends in .0/.5 — exact doubles); scores round
    * at 9 and the flag compares the ROUNDED score, so both engines
    * gate identically. */
  def anomalyMad(spark: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(spark, d)
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("c"))
    def medianOf(df: DataFrame, v: String, tieCol: String): DataFrame = {
      val rk = df.withColumn("r",
          row_number().over(Window.orderBy(col(v), col(tieCol))))
        .crossJoin(broadcast(df.agg(count(lit(1)).as("n"))))
      // `div`, not `/`: column `/` is FLOAT division, and (n+1)/2 at
      // even n (15.5) matches no integer rank — half the median pair
      // would silently drop
      rk.where(col("r") === expr("(n + 1) div 2") ||
          col("r") === expr("(n + 2) div 2"))
        .agg((sum(col(v)).cast("double") / count(lit(1))).as("med"))
    }
    val medc = medianOf(daily, "c", "day")
    val dev = daily.crossJoin(broadcast(medc))
      .withColumn("ad", abs(col("c") - col("med")))
    val madv = medianOf(dev.select(col("ad"), col("day")), "ad", "day")
      .select(col("med").as("mad"))
    dev.crossJoin(broadcast(madv))
      .select(col("day"), col("c"), round(col("med"), 9).as("med"),
        round(col("mad"), 9).as("mad"),
        when(col("mad") > 0,
          round((col("c") - col("med")) / (lit(1.4826) * col("mad")), 9))
          .as("score"))
      .withColumn("is_anomaly",
        when(col("score").isNotNull, abs(col("score")) > 3.0))
      .orderBy(col("day"))
  }

  def anomalyMadSql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS c FROM events GROUP BY 1),
      |medc AS (SELECT CAST(SUM(c) AS DOUBLE) / COUNT(*) AS med FROM (
      |    SELECT c, row_number() OVER (ORDER BY c, day) AS r,
      |      COUNT(*) OVER () AS n FROM daily)
      |  WHERE r = (n + 1) // 2 OR r = (n + 2) // 2),
      |dev AS (SELECT day, c, med, abs(c - med) AS ad FROM daily, medc),
      |madv AS (SELECT CAST(SUM(ad) AS DOUBLE) / COUNT(*) AS mad FROM (
      |    SELECT ad, row_number() OVER (ORDER BY ad, day) AS r,
      |      COUNT(*) OVER () AS n FROM dev)
      |  WHERE r = (n + 1) // 2 OR r = (n + 2) // 2)
      |SELECT day, c, round(med, 9) AS med, round(mad, 9) AS mad,
      |  CASE WHEN mad > 0
      |       THEN round((c - med) / (1.4826 * mad), 9) END AS score,
      |  CASE WHEN mad > 0
      |       THEN abs(round((c - med) / (1.4826 * mad), 9)) > 3.0 END AS is_anomaly
      |FROM dev, madv ORDER BY day""".stripMargin

  /** Additive seasonal decomposition (STL-lite) of the daily event
    * series: trend = centered 7-day moving average (emitted only
    * where the full window exists), seasonal = day-of-week mean of
    * the detrended series, residual = the rest. The classic
    * trend/seasonality/noise split `evt_dema`/`evt_dow_profile` each
    * show one axis of.
    *
    * Scale shape: one event-scale aggregation to daily counts, then
    * every window/join is calendar-sized. Day-of-week comes from
    * epoch-day arithmetic (datediff mod 7 against a pinned Monday
    * anchor), not locale-dependent dayofweek(); trend divides an
    * exact integer 7-day sum, seasonal means go through
    * DECIMAL(18,9), every emitted double rounds at 9. */
  def seasonalDecompose(spark: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(spark, d)
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("c"))
    val w = Window.orderBy(col("day")).rowsBetween(-3, 3)
    val tr = daily
      .withColumn("trend", when(count(lit(1)).over(w) === 7,
        round(sum(col("c")).over(w).cast("double") / 7, 9)))
      .where(col("trend").isNotNull)
      .withColumn("detr", round(col("c") - col("trend"), 9))
      .withColumn("dow", datediff(col("day"), lit("2000-01-03")) % 7)
    val sidx = tr.groupBy(col("dow"))
      .agg(round(sum(col("detr").cast("decimal(18,9)")).cast("double") /
        count(lit(1)), 9).as("seasonal"))
    tr.join(broadcast(sidx), Seq("dow"))
      .select(col("day"), col("c").as("n_events"), col("trend"),
        col("seasonal"), round(col("detr") - col("seasonal"), 9).as("resid"))
      .orderBy(col("day"))
  }

  /** Declared query `evt_ols`: ordinary least squares of daily event
    * volume on the day index — slope, intercept and R² of the
    * activity trend line, the parametric sibling of [[theilSen]].
    *
    * Scale shape: events reduce to one row per DAY first; the normal
    * equations then consume five exact BIGINT power sums of that
    * day-count table (x = day offset from the corpus min, an integer
    * in both engines), so the only floating steps are two final
    * divisions and one multiply, written in the same operand order in
    * the DuckDB twin. R² is composed as (num/den)·(num/deny) — two
    * double quotients of exact integers — instead of num²/(den·deny),
    * whose num² overflows BIGINT long before the quotients lose a
    * ulp. */
  def ols(spark: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(spark, d)
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("y"))
    val d0 = daily.agg(min(col("day")).as("d0"))
    val s = daily.crossJoin(broadcast(d0))
      .select(datediff(col("day"), col("d0")).cast("long").as("x"), col("y"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"))
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    val den = col("n") * col("sxx") - col("sx") * col("sx")
    val dny = col("n") * col("syy") - col("sy") * col("sy")
    s.select(col("n").as("n_days"),
      round(num.cast("double") / den, 9).as("slope"),
      round((col("sy") * col("sxx") - col("sx") * col("sxy")).cast("double") / den, 9)
        .as("intercept"),
      round((num.cast("double") / den) * (num.cast("double") / dny), 9).as("r2"))
  }

  def olsSql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS y FROM events GROUP BY 1),
      |xy AS (
      |  SELECT CAST(day - (SELECT MIN(day) FROM daily) AS BIGINT) AS x, y FROM daily),
      |s AS (
      |  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy,
      |         SUM(x*x) AS sxx, SUM(y*y) AS syy FROM xy)
      |SELECT n AS n_days,
      |  round(CAST(n*sxy - sx*sy AS DOUBLE) / (n*sxx - sx*sx), 9) AS slope,
      |  round(CAST(sy*sxx - sx*sxy AS DOUBLE) / (n*sxx - sx*sx), 9) AS intercept,
      |  round((CAST(n*sxy - sx*sy AS DOUBLE) / (n*sxx - sx*sx))
      |      * (CAST(n*sxy - sx*sy AS DOUBLE) / (n*syy - sy*sy)), 9) AS r2
      |FROM s""".stripMargin

  def seasonalDecomposeSql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS c FROM events GROUP BY 1),
      |tr AS (SELECT day, c,
      |    CASE WHEN COUNT(*) OVER w = 7
      |      THEN round(CAST(SUM(c) OVER w AS DOUBLE) / 7, 9) END AS trend
      |  FROM daily WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      |dt AS (SELECT day, c, trend, round(c - trend, 9) AS detr,
      |    CAST(day - DATE '2000-01-03' AS INT) % 7 AS dow
      |  FROM tr WHERE trend IS NOT NULL),
      |sidx AS (SELECT dow,
      |    round(CAST(SUM(CAST(detr AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*), 9)
      |      AS seasonal
      |  FROM dt GROUP BY 1)
      |SELECT day, c AS n_events, trend, seasonal,
      |  round(detr - seasonal, 9) AS resid
      |FROM dt JOIN sidx USING (dow) ORDER BY day""".stripMargin

  /** Gradient steps and learning rate for the in-engine logistic
    * regression. Three steps is declared semantics (the
    * [[graft.ops.GraphOps.pagerank]] fixed-round stance): the oracle
    * unrolls exactly three. */
  private val LrSteps = 3
  private val LrRate = 0.5

  /** Logistic regression TRAINED INSIDE THE ENGINE — the
    * quality-classifier shape every curation pipeline eventually
    * needs (fastText-style keep/drop models): per-user behavioral
    * features (log-counts of clicks/views/errors), label = purchased,
    * [[LrSteps]] full-batch gradient-descent steps from w = 0, then
    * the trained weights and training accuracy. Each step is ONE
    * aggregate over users with the 4-dim weight vector broadcast —
    * the classic distributed-GD shape: O(features) driver state,
    * O(n) map work, O(features · partitions) shuffle.
    *
    * Cross-engine determinism: features quantize ln(1+count) at 1e-6
    * by the floor recipe; each σ quantizes at 1e-6; every gradient
    * term quantizes to an INTEGER at 1e-6 scale and sums as BIGINT
    * (the [[graft.ops.SimilarityOps.embPca2]] discipline — engine
    * round() implementations disagree at half-boundaries, floor over
    * identical IEEE products doesn't); weight updates are identical
    * double expressions. Prediction compares z ≥ 0 (≡ σ ≥ 0.5)
    * without materializing σ. */
  def logreg(spark: SparkSession, d: String): DataFrame = {
    def q6(c: org.apache.spark.sql.Column) =
      floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    val feats = Tables.events(spark, d)
      .groupBy(col("user_id"))
      .agg(
        q6(log(lit(1.0) + sum(when(col("event_type") === "click", 1L).otherwise(0L))))
          .as("x1"),
        q6(log(lit(1.0) + sum(when(col("event_type") === "view", 1L).otherwise(0L))))
          .as("x2"),
        q6(log(lit(1.0) + sum(when(col("event_type") === "error", 1L).otherwise(0L))))
          .as("x3"),
        // label: converted at high value (the [[abTest]] conversion
        // definition) — plain "ever purchased" saturates to all-1s on
        // this corpus and trains nothing
        max(when(col("event_type") === "purchase" && col("value") > HighValue,
          1L).otherwise(0L)).cast("double").as("y"))
      .localCheckpoint(false) // one feature build feeds all steps
    def z(w: Seq[org.apache.spark.sql.Column]) =
      w(0) + w(1) * col("x1") + w(2) * col("x2") + w(3) * col("x3")
    def sigma(w: Seq[org.apache.spark.sql.Column]) =
      q6(lit(1.0) / (lit(1.0) + exp(-z(w))))
    // one GD step: w' = w + lr · Σ(y−σ)x / n, gradient terms integer-
    // quantized at 1e6 (term ≤ ln-scale · 1e6, BIGINT headroom to
    // ~1e12 users)
    def step(w: Seq[Double]): Seq[Double] = {
      val wc = w.map(lit)
      val resid = col("y") - sigma(wc)
      val g = feats.agg(
        count(lit(1)).as("n"),
        sum(floor(resid * lit(1e6) + lit(0.5))).as("g0"),
        sum(floor(resid * col("x1") * lit(1e6) + lit(0.5))).as("g1"),
        sum(floor(resid * col("x2") * lit(1e6) + lit(0.5))).as("g2"),
        sum(floor(resid * col("x3") * lit(1e6) + lit(0.5))).as("g3"))
        .collect()(0) // 1-row driver scalar per step, the kmeans-loop bound
      val n = g.getLong(0).toDouble
      w.zipWithIndex.map { case (wj, j) =>
        wj + LrRate * (g.getLong(1 + j).toDouble / 1e6 / n)
      }
    }
    val w = (1 to LrSteps).foldLeft(Seq(0.0, 0.0, 0.0, 0.0))((acc, _) => step(acc))
    val wc = w.map(lit)
    feats.agg(
        count(lit(1)).as("n_users"),
        sum(col("y").cast("long")).as("n_pos"),
        (floor(sum(when((z(wc) >= 0) === (col("y") === 1.0), 1L).otherwise(0L))
          .cast("double") / count(lit(1)) * lit(1e9) + lit(0.5)) / lit(1e9))
          .as("train_accuracy"))
      .select(col("n_users"), col("n_pos"),
        q6(wc(0)).as("w0"), q6(wc(1)).as("w1"),
        q6(wc(2)).as("w2"), q6(wc(3)).as("w3"),
        col("train_accuracy"))
  }

  /** Exact ROC AUC (Mann–Whitney U with midranks) of the simplest
    * behavioral score — clicks per user — against the high-value-
    * conversion label: the model-free discrimination baseline every
    * trained ranker ([[logreg]]) must beat, computed EXACTLY. The
    * midrank identity keeps everything integer: grouping users by
    * score, each tie block contributes c_pos · (2·c_below + c_eq + 1)
    * to twice the positive rank-sum, so
    * AUC = (Σ − n_pos(n_pos+1)) / (2·n_pos·n_neg) is a ratio of exact
    * BIGINTs — no per-row ranks, no floating aggregation.
    *
    * Scale shape: one user reduction, one score-keyed aggregate, and
    * a running sum over the DISTINCT-SCORE table (score-cardinality
    * rows — bounded by max clicks/user, never |users|), then a 3-sum
    * reduction. Degenerate labels (no positives or no negatives)
    * yield NULL in both engines. */
  def aucClicks(spark: SparkSession, d: String): DataFrame = {
    val users = Tables.events(spark, d)
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("s"),
        max(when(col("event_type") === "purchase" && col("value") > HighValue,
          1L).otherwise(0L)).as("y"))
    val byScore = users.groupBy(col("s"))
      .agg(count(lit(1)).as("c"), sum(col("y")).as("cp"))
    val w = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val agg = byScore
      .withColumn("cl", coalesce(sum(col("c")).over(w), lit(0L)))
      .agg(sum(col("cp") * (lit(2) * col("cl") + col("c") + 1)).as("s2r"),
        sum(col("cp")).as("np"), sum(col("c")).as("n"))
    val nn = col("n") - col("np")
    agg.select(col("np").as("n_pos"), nn.as("n_neg"),
      when(col("np") === 0 || nn === 0, lit(null).cast("double"))
        .otherwise(floor((col("s2r") - col("np") * (col("np") + 1)).cast("double")
          / (lit(2) * col("np") * nn).cast("double") * lit(1e9) + lit(0.5)) / lit(1e9))
        .as("auc"))
  }

  def aucClicksSql: String =
    s"""WITH users AS (
       |  SELECT user_id,
       |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS s,
       |    MAX(CASE WHEN event_type = 'purchase' AND value > $HighValue
       |        THEN 1 ELSE 0 END) AS y
       |  FROM events GROUP BY user_id),
       |by_score AS (
       |  SELECT s, COUNT(*) AS c, SUM(y) AS cp FROM users GROUP BY s),
       |ranked AS (
       |  SELECT c, cp, COALESCE(SUM(c) OVER (ORDER BY s
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cl
       |  FROM by_score),
       |agg AS (
       |  SELECT SUM(cp * (2 * cl + c + 1)) AS s2r, SUM(cp) AS np, SUM(c) AS n
       |  FROM ranked)
       |SELECT CAST(np AS BIGINT) AS n_pos, CAST(n - np AS BIGINT) AS n_neg,
       |  CASE WHEN np = 0 OR n - np = 0 THEN CAST(NULL AS DOUBLE)
       |    ELSE floor(CAST(s2r - np * (np + 1) AS DOUBLE)
       |      / CAST(2 * np * (n - np) AS DOUBLE) * 1e9 + 0.5) / 1e9
       |  END AS auc
       |FROM agg""".stripMargin

  /** Difference-in-differences — the quasi-experimental estimator for
    * when you didn't get to randomize: per (arm × before/after) mean
    * event value, DiD = (treat_after − treat_before) −
    * (control_after − control_before), which nets out both the
    * pre-existing arm gap and the common time trend. Arms are the
    * [[abTest]] user-parity split; the period boundary is
    * min(day) + 15 — derived from the data, not wall clock, so the
    * query is deterministic at any SF. Cell sums go through
    * DECIMAL(18,6); the estimator is an identical double expression
    * over four exact means, floor-quantized; an empty cell yields
    * NULL DiD in both engines.
    *
    * Scale shape: one 1-row min-date scalar (broadcast), one scan
    * reduced onto 4 cells — nothing downstream exceeds four rows. */
  def didValue(spark: SparkSession, d: String): DataFrame = {
    def f9(c: org.apache.spark.sql.Column) =
      floor(c * lit(1e9) + lit(0.5)) / lit(1e9)
    val ev = Tables.events(spark, d)
      .select((col("user_id") % 2).as("arm"), to_date(col("ts")).as("day"),
        col("value"))
    val cut = ev.agg(date_add(min(col("day")), 15).as("cut"))
    val cells = ev.crossJoin(broadcast(cut))
      .select(col("arm"), (col("day") >= col("cut")).as("after"), col("value"))
      .groupBy(col("arm"), col("after"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sx"))
    def cell(arm: Int, after: Boolean, c: String) =
      max(when(col("arm") === arm && col("after") === after, col(c)))
    val w = cells.agg(
      cell(0, after = false, "n").as("n00"), cell(0, after = false, "sx").as("s00"),
      cell(0, after = true, "n").as("n01"), cell(0, after = true, "sx").as("s01"),
      cell(1, after = false, "n").as("n10"), cell(1, after = false, "sx").as("s10"),
      cell(1, after = true, "n").as("n11"), cell(1, after = true, "sx").as("s11"))
    def m(s: String, n: String) = col(s) / col(n)
    val anyEmpty = col("n00").isNull || col("n01").isNull ||
      col("n10").isNull || col("n11").isNull
    w.select(
      coalesce(col("n00"), lit(0L)).as("n_ctl_before"),
      coalesce(col("n01"), lit(0L)).as("n_ctl_after"),
      coalesce(col("n10"), lit(0L)).as("n_trt_before"),
      coalesce(col("n11"), lit(0L)).as("n_trt_after"),
      f9(m("s00", "n00")).as("mean_ctl_before"),
      f9(m("s01", "n01")).as("mean_ctl_after"),
      f9(m("s10", "n10")).as("mean_trt_before"),
      f9(m("s11", "n11")).as("mean_trt_after"),
      when(anyEmpty, lit(null).cast("double"))
        .otherwise(f9((m("s11", "n11") - m("s10", "n10")) -
          (m("s01", "n01") - m("s00", "n00")))).as("did"))
  }

  def didValueSql: String = {
    def m(k: String) = s"(s$k / n$k)"
    s"""WITH ev AS (
       |  SELECT user_id % 2 AS arm, CAST(ts AS DATE) AS day, value
       |  FROM events),
       |cut AS (SELECT MIN(day) + 15 AS cut FROM ev),
       |cells AS (
       |  SELECT arm, day >= (SELECT cut FROM cut) AS after, COUNT(*) AS n,
       |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sx
       |  FROM ev GROUP BY 1, 2),
       |w AS (
       |  SELECT
       |    MAX(CASE WHEN arm = 0 AND NOT after THEN n END) AS n00,
       |    MAX(CASE WHEN arm = 0 AND NOT after THEN sx END) AS s00,
       |    MAX(CASE WHEN arm = 0 AND after THEN n END) AS n01,
       |    MAX(CASE WHEN arm = 0 AND after THEN sx END) AS s01,
       |    MAX(CASE WHEN arm = 1 AND NOT after THEN n END) AS n10,
       |    MAX(CASE WHEN arm = 1 AND NOT after THEN sx END) AS s10,
       |    MAX(CASE WHEN arm = 1 AND after THEN n END) AS n11,
       |    MAX(CASE WHEN arm = 1 AND after THEN sx END) AS s11
       |  FROM cells)
       |SELECT
       |  CAST(COALESCE(n00, 0) AS BIGINT) AS n_ctl_before,
       |  CAST(COALESCE(n01, 0) AS BIGINT) AS n_ctl_after,
       |  CAST(COALESCE(n10, 0) AS BIGINT) AS n_trt_before,
       |  CAST(COALESCE(n11, 0) AS BIGINT) AS n_trt_after,
       |  floor(${m("00")} * 1e9 + 0.5) / 1e9 AS mean_ctl_before,
       |  floor(${m("01")} * 1e9 + 0.5) / 1e9 AS mean_ctl_after,
       |  floor(${m("10")} * 1e9 + 0.5) / 1e9 AS mean_trt_before,
       |  floor(${m("11")} * 1e9 + 0.5) / 1e9 AS mean_trt_after,
       |  CASE WHEN n00 IS NULL OR n01 IS NULL OR n10 IS NULL OR n11 IS NULL
       |    THEN CAST(NULL AS DOUBLE)
       |    ELSE floor(((${m("11")} - ${m("10")}) - (${m("01")} - ${m("00")}))
       |      * 1e9 + 0.5) / 1e9
       |  END AS did
       |FROM w""".stripMargin
  }

  /** Welch's two-sample t — the means companion to [[abTest]]'s
    * two-proportion z: per-user total spend compared across the same
    * user_id-parity arms, unequal variances assumed (the realistic
    * default; pooling is the textbook mistake). Moments are exact:
    * per-user totals and per-arm Σx go through DECIMAL(18,6), Σx²
    * through DECIMAL(38,6) (squares of 4-digit spends times 1e6+ users
    * overflow (18,6)); the t statistic and Welch–Satterthwaite df are
    * identical double expressions over those exact pieces, quantized
    * by the floor recipe. One user reduction, one 2-key aggregate, a
    * 1-row pivot — nothing downstream exceeds two rows. Arms with
    * n ≤ 1 yield NULL t/df in both engines. */
  def ttestValue(spark: SparkSession, d: String): DataFrame = {
    def f9(c: org.apache.spark.sql.Column) =
      floor(c * lit(1e9) + lit(0.5)) / lit(1e9)
    val users = Tables.events(spark, d)
      .groupBy(col("user_id"))
      .agg(dsum(col("value")).as("x"))
      .select((col("user_id") % 2).as("arm"), col("x"))
    val arms = users.groupBy(col("arm"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(18,6)")).cast("double").as("sx"),
        sum((col("x") * col("x")).cast("decimal(38,6)")).cast("double").as("sxx"))
    val w = arms.agg(
      max(when(col("arm") === 0, col("n"))).as("n0"),
      max(when(col("arm") === 0, col("sx"))).as("sx0"),
      max(when(col("arm") === 0, col("sxx"))).as("sxx0"),
      max(when(col("arm") === 1, col("n"))).as("n1"),
      max(when(col("arm") === 1, col("sx"))).as("sx1"),
      max(when(col("arm") === 1, col("sxx"))).as("sxx1"))
    def mean(sx: String, n: String) = col(sx) / col(n)
    def varOf(sxx: String, sx: String, n: String) =
      (col(sxx) - col(sx) * col(sx) / col(n)) / (col(n) - 1)
    val se2 = varOf("sxx0", "sx0", "n0") / col("n0") +
      varOf("sxx1", "sx1", "n1") / col("n1")
    val a0 = varOf("sxx0", "sx0", "n0") / col("n0")
    val a1 = varOf("sxx1", "sx1", "n1") / col("n1")
    w.select(col("n0"), col("n1"),
      f9(mean("sx0", "n0")).as("mean0"), f9(mean("sx1", "n1")).as("mean1"),
      when(col("n0") <= 1 || col("n1") <= 1, lit(null).cast("double"))
        .otherwise(f9((mean("sx1", "n1") - mean("sx0", "n0")) / sqrt(se2)))
        .as("t"),
      when(col("n0") <= 1 || col("n1") <= 1, lit(null).cast("double"))
        .otherwise(f9((a0 + a1) * (a0 + a1) /
          (a0 * a0 / (col("n0") - 1) + a1 * a1 / (col("n1") - 1)))).as("df"))
  }

  def ttestValueSql: String = {
    def v(k: Int) = s"((sxx$k - sx$k * sx$k / n$k) / (n$k - 1))"
    def a(k: Int) = s"(${v(k)} / n$k)"
    s"""WITH users AS (
       |  SELECT user_id % 2 AS arm,
       |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS x
       |  FROM events GROUP BY user_id),
       |arms AS (
       |  SELECT arm, COUNT(*) AS n,
       |    CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS sx,
       |    CAST(SUM(CAST(x * x AS DECIMAL(38,6))) AS DOUBLE) AS sxx
       |  FROM users GROUP BY arm),
       |w AS (
       |  SELECT
       |    MAX(CASE WHEN arm = 0 THEN n END) AS n0,
       |    MAX(CASE WHEN arm = 0 THEN sx END) AS sx0,
       |    MAX(CASE WHEN arm = 0 THEN sxx END) AS sxx0,
       |    MAX(CASE WHEN arm = 1 THEN n END) AS n1,
       |    MAX(CASE WHEN arm = 1 THEN sx END) AS sx1,
       |    MAX(CASE WHEN arm = 1 THEN sxx END) AS sxx1
       |  FROM arms)
       |SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
       |  floor(sx0 / n0 * 1e9 + 0.5) / 1e9 AS mean0,
       |  floor(sx1 / n1 * 1e9 + 0.5) / 1e9 AS mean1,
       |  CASE WHEN n0 <= 1 OR n1 <= 1 THEN CAST(NULL AS DOUBLE)
       |    ELSE floor((sx1 / n1 - sx0 / n0) / sqrt(${a(0)} + ${a(1)})
       |      * 1e9 + 0.5) / 1e9
       |  END AS t,
       |  CASE WHEN n0 <= 1 OR n1 <= 1 THEN CAST(NULL AS DOUBLE)
       |    ELSE floor((${a(0)} + ${a(1)}) * (${a(0)} + ${a(1)})
       |      / (${a(0)} * ${a(0)} / (n0 - 1) + ${a(1)} * ${a(1)} / (n1 - 1))
       |      * 1e9 + 0.5) / 1e9
       |  END AS df
       |FROM w""".stripMargin
  }

  /** Decision threshold for [[prfClicks]] (clicks ≥ this predicts
    * conversion). */
  private val PrfThreshold = 3

  /** Thresholded classifier evaluation — confusion counts and
    * precision/recall/F1 of the rule "clicks ≥ [[PrfThreshold]]"
    * against the high-value-conversion label: the operating-point
    * companion to [[aucClicks]] (which scores the ranking; this
    * scores one deployable cut). Counts are exact BIGINTs from a
    * single user-keyed reduction + one 4-way conditional aggregate;
    * F1 uses the integer form 2·tp / (2·tp + fp + fn); ratios
    * quantize by the floor recipe; zero denominators yield NULL in
    * both engines. */
  def prfClicks(spark: SparkSession, d: String): DataFrame = {
    def f9(c: org.apache.spark.sql.Column) =
      floor(c * lit(1e9) + lit(0.5)) / lit(1e9)
    val users = Tables.events(spark, d)
      .groupBy(col("user_id"))
      .agg((sum(when(col("event_type") === "click", 1L).otherwise(0L)) >=
        PrfThreshold).as("pred"),
        (max(when(col("event_type") === "purchase" && col("value") > HighValue,
          1L).otherwise(0L)) === 1).as("y"))
    val cells = users.agg(
      sum(when(col("pred") && col("y"), 1L).otherwise(0L)).as("tp"),
      sum(when(col("pred") && !col("y"), 1L).otherwise(0L)).as("fp"),
      sum(when(!col("pred") && col("y"), 1L).otherwise(0L)).as("fn"),
      sum(when(!col("pred") && !col("y"), 1L).otherwise(0L)).as("tn"))
    cells.select(lit(PrfThreshold.toLong).as("threshold"),
      col("tp"), col("fp"), col("fn"), col("tn"),
      when(col("tp") + col("fp") === 0, lit(null).cast("double"))
        .otherwise(f9(col("tp").cast("double") / (col("tp") + col("fp"))))
        .as("precision"),
      when(col("tp") + col("fn") === 0, lit(null).cast("double"))
        .otherwise(f9(col("tp").cast("double") / (col("tp") + col("fn"))))
        .as("recall"),
      when(lit(2) * col("tp") + col("fp") + col("fn") === 0,
        lit(null).cast("double"))
        .otherwise(f9((lit(2) * col("tp")).cast("double")
          / (lit(2) * col("tp") + col("fp") + col("fn")))).as("f1"))
  }

  def prfClicksSql: String =
    s"""WITH users AS (
       |  SELECT user_id,
       |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
       |      >= $PrfThreshold AS pred,
       |    MAX(CASE WHEN event_type = 'purchase' AND value > $HighValue
       |        THEN 1 ELSE 0 END) = 1 AS y
       |  FROM events GROUP BY user_id),
       |cells AS (
       |  SELECT
       |    SUM(CASE WHEN pred AND y THEN 1 ELSE 0 END) AS tp,
       |    SUM(CASE WHEN pred AND NOT y THEN 1 ELSE 0 END) AS fp,
       |    SUM(CASE WHEN NOT pred AND y THEN 1 ELSE 0 END) AS fn,
       |    SUM(CASE WHEN NOT pred AND NOT y THEN 1 ELSE 0 END) AS tn
       |  FROM users)
       |SELECT CAST($PrfThreshold AS BIGINT) AS threshold,
       |  CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       |  CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
       |  CASE WHEN tp + fp = 0 THEN CAST(NULL AS DOUBLE)
       |    ELSE floor(CAST(tp AS DOUBLE) / (tp + fp) * 1e9 + 0.5) / 1e9
       |  END AS precision,
       |  CASE WHEN tp + fn = 0 THEN CAST(NULL AS DOUBLE)
       |    ELSE floor(CAST(tp AS DOUBLE) / (tp + fn) * 1e9 + 0.5) / 1e9
       |  END AS recall,
       |  CASE WHEN 2 * tp + fp + fn = 0 THEN CAST(NULL AS DOUBLE)
       |    ELSE floor(CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn) * 1e9 + 0.5)
       |      / 1e9
       |  END AS f1
       |FROM cells""".stripMargin

  /** DuckDB replay of [[logreg]]: the identical feature build, then
    * [[LrSteps]] unrolled gradient CTEs (w_k 1-row tables referenced
    * as scalar subqueries), the same floor-quantized σ/gradient/
    * accuracy arithmetic. */
  def logregSql: String = {
    def q6(e: String) = s"floor(($e) * 1e6 + 0.5) / 1e6"
    def cnt(t: String) = s"SUM(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END)"
    def w(k: Int, j: Int) = s"(SELECT w$j FROM w${k}t)"
    def zx(k: Int) =
      s"(${w(k, 0)} + ${w(k, 1)} * x1 + ${w(k, 2)} * x2 + ${w(k, 3)} * x3)"
    def sigma(k: Int) = q6(s"1.0 / (1.0 + exp(-${zx(k)}))")
    def gterm(k: Int, x: String) = {
      val m = if (x.isEmpty) "" else s" * $x"
      s"SUM(CAST(floor((y - ${sigma(k)})$m * 1e6 + 0.5) AS BIGINT))"
    }
    val steps = (1 to LrSteps).map { k =>
      s"""g$k AS MATERIALIZED (
         |  SELECT COUNT(*) AS n, ${gterm(k - 1, "")} AS g0,
         |    ${gterm(k - 1, "x1")} AS g1, ${gterm(k - 1, "x2")} AS g2,
         |    ${gterm(k - 1, "x3")} AS g3
         |  FROM feats),
         |w${k}t AS MATERIALIZED (
         |  SELECT ${w(k - 1, 0)} + $LrRate * (CAST(g0 AS DOUBLE) / 1e6 / n) AS w0,
         |         ${w(k - 1, 1)} + $LrRate * (CAST(g1 AS DOUBLE) / 1e6 / n) AS w1,
         |         ${w(k - 1, 2)} + $LrRate * (CAST(g2 AS DOUBLE) / 1e6 / n) AS w2,
         |         ${w(k - 1, 3)} + $LrRate * (CAST(g3 AS DOUBLE) / 1e6 / n) AS w3
         |  FROM g$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH feats AS MATERIALIZED (
       |  SELECT user_id,
       |    ${q6(s"ln(1.0 + ${cnt("click")})")} AS x1,
       |    ${q6(s"ln(1.0 + ${cnt("view")})")} AS x2,
       |    ${q6(s"ln(1.0 + ${cnt("error")})")} AS x3,
       |    CAST(MAX(CASE WHEN event_type = 'purchase' AND value > $HighValue
       |      THEN 1 ELSE 0 END) AS DOUBLE) AS y
       |  FROM events GROUP BY user_id),
       |w0t AS (SELECT CAST(0.0 AS DOUBLE) AS w0, CAST(0.0 AS DOUBLE) AS w1,
       |        CAST(0.0 AS DOUBLE) AS w2, CAST(0.0 AS DOUBLE) AS w3),
       |$steps
       |SELECT COUNT(*) AS n_users,
       |  CAST(SUM(CAST(y AS BIGINT)) AS BIGINT) AS n_pos,
       |  ${q6(w(LrSteps, 0))} AS w0, ${q6(w(LrSteps, 1))} AS w1,
       |  ${q6(w(LrSteps, 2))} AS w2, ${q6(w(LrSteps, 3))} AS w3,
       |  floor(CAST(SUM(CASE WHEN (${zx(LrSteps)} >= 0) = (y = 1.0)
       |      THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) * 1e9 + 0.5) / 1e9
       |    AS train_accuracy
       |FROM feats""".stripMargin
  }

  /** Position-based (U-shaped) multi-touch attribution — the
    * marketing-analytics allocator that splits each purchase's value
    * across the clicks that preceded it: 40% to the first touch, 40%
    * to the last, 20% shared equally by the middles (100% / 50-50 for
    * one / two touches), summarized by the touch's day of week. The
    * batch complement to the streaming last-touch join
    * ([[graft.streaming.EventStreams.attribution]]) — same
    * click→purchase substrate, the full credit model instead of
    * winner-takes-all.
    *
    * Scale shape: one user-keyed equi-join (clicks × purchases per
    * user, each side pre-filtered by type — the [[funnel]] fan-out
    * bound), a per-purchase window over that purchase's own touches
    * (never more rows than the user's click count), and a ≤7-key
    * aggregate. Shares are small exact rationals evaluated as
    * identical double expressions in both engines; per-touch credits
    * round at 9 and sum through DECIMAL(18,9) ([[OpsUtil.dsum]]
    * contract). */
  def attrPositional(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("pid"),
        col("ts").as("pts"), col("value"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("cid"), col("ts").as("cts"))
    val touches = purchases.join(clicks, Seq("user_id"))
      .where(col("cts") < col("pts") &&
        col("cts") >= col("pts") - expr("INTERVAL 7 DAYS"))
    val w = Window.partitionBy(col("pid")).orderBy(col("cts"), col("cid"))
    val scored = touches
      .select(col("pid"), col("value"), col("cts"),
        row_number().over(w).as("rn"),
        count(lit(1)).over(Window.partitionBy(col("pid"))).as("n"))
      .select(col("cts"),
        round(col("value") * when(col("n") === 1, lit(1.0))
          .when(col("n") === 2, lit(0.5))
          .when(col("rn") === 1 || col("rn") === col("n"), lit(0.4))
          .otherwise(lit(0.2) / (col("n") - 2)), 9).as("credit"))
    scored.groupBy(dayofweek(col("cts")).as("dow"))
      .agg(count(lit(1)).as("n_touches"),
        round(sum(col("credit").cast("decimal(18,9)")).cast("double"), 9)
          .as("credited_value"))
      .orderBy("dow")
  }

  def attrPositionalSql: String =
    """WITH p AS (
      |  SELECT user_id, event_id AS pid, ts AS pts, value
      |  FROM events WHERE event_type = 'purchase'),
      |c AS (
      |  SELECT user_id, event_id AS cid, ts AS cts
      |  FROM events WHERE event_type = 'click'),
      |t AS (
      |  SELECT p.pid, p.value, c.cts,
      |    ROW_NUMBER() OVER (PARTITION BY p.pid ORDER BY c.cts, c.cid) AS rn,
      |    COUNT(*) OVER (PARTITION BY p.pid) AS n
      |  FROM p JOIN c ON c.user_id = p.user_id
      |  WHERE c.cts < p.pts AND c.cts >= p.pts - INTERVAL 7 DAY),
      |s AS (
      |  SELECT cts, round(value * (CASE
      |    WHEN n = 1 THEN CAST(1.0 AS DOUBLE)
      |    WHEN n = 2 THEN CAST(0.5 AS DOUBLE)
      |    WHEN rn = 1 OR rn = n THEN CAST(0.4 AS DOUBLE)
      |    ELSE CAST(0.2 AS DOUBLE) / (n - 2) END), 9) AS credit
      |  FROM t)
      |SELECT dayofweek(cts) + 1 AS dow, COUNT(*) AS n_touches,
      |  round(CAST(SUM(CAST(credit AS DECIMAL(18,9))) AS DOUBLE), 9)
      |    AS credited_value
      |FROM s GROUP BY 1 ORDER BY dow""".stripMargin

  /** Seasonal-naive forecast backtest — the rolling-origin evaluation
    * every forecasting pipeline runs before trusting a model: predict
    * each day's per-type event count with the count 7 days earlier,
    * score only days where that predecessor exists (an equi-join on
    * (type, day−7), NOT lag(7) — with gaps, the 7th-previous ROW is
    * not the day a week ago), and report per-type MAE and MAPE. The
    * companion to [[holt]]/[[seasonalDecompose]] (which fit); this
    * measures, and the measured baseline is what any fancier model
    * must beat.
    *
    * Scale shape: one scan reduces events to (type × day) counts;
    * everything after — self-join on the shifted day, two-level
    * aggregate — is day-count-sized. Errors are exact BIGINTs; MAE
    * divides two exact integers; per-day MAPE terms round at 9 and
    * sum through DECIMAL(18,9) ([[OpsUtil.dsum]] contract). */
  def backtest(spark: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(spark, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
    val pred = daily.select(col("event_type"),
      date_add(col("day"), 7).as("day"), col("c").as("c_pred"))
    val scored = daily.join(pred, Seq("event_type", "day"))
      .select(col("event_type"),
        abs(col("c") - col("c_pred")).as("err"),
        round(abs(col("c") - col("c_pred")).cast("double") / col("c"), 9)
          .as("ape"))
    scored.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        round(sum(col("err")).cast("double") / count(lit(1)), 9).as("mae"),
        round(sum(col("ape").cast("decimal(18,9)")).cast("double") /
          count(lit(1)), 9).as("mape"))
      .orderBy("event_type")
  }

  def backtestSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS c
      |  FROM events GROUP BY 1, 2),
      |scored AS (
      |  SELECT a.event_type, abs(a.c - p.c) AS err,
      |    round(CAST(abs(a.c - p.c) AS DOUBLE) / a.c, 9) AS ape
      |  FROM daily a
      |  JOIN daily p ON p.event_type = a.event_type
      |              AND p.day = a.day - 7)
      |SELECT event_type, COUNT(*) AS n_days,
      |  round(CAST(SUM(err) AS DOUBLE) / COUNT(*), 9) AS mae,
      |  round(CAST(SUM(CAST(ape AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*), 9)
      |    AS mape
      |FROM scored GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Resamples for the Poisson bootstrap. */
  private val BootB = 100
  /** Cumulative Poisson(1) CDF × 1e9, floored — the inverse-CDF
    * thresholds that turn a uniform 0..1e9 hash draw into a
    * deterministic Poisson(1) weight. Literal integers so both
    * engines run the identical comparison chain. */
  private val BootCdf = Seq(367879441L, 735758882L, 919698602L,
    981011843L, 996340153L)

  /** Poisson-bootstrap 95% CI for the mean event value — THE
    * cluster-scale bootstrap (Chamandy et al., "Estimating Uncertainty
    * for Massive Data Streams", and the bag-of-little-bootstraps
    * lineage): instead of materializing B resampled copies, each row
    * draws B independent Poisson(1) multiplicities, so one scan
    * computes all B resample means. Here the draws are DETERMINISTIC —
    * w(row, b) = inverse-CDF of Poisson(1) applied to
    * xhash60(event_id:b) — which makes the whole statistic exactly
    * replayable by the oracle (the [[OpsUtil.xhash60]] stance: no RNG,
    * no seed plumbing, bit-identical on any cluster).
    *
    * Scale shape: explode ×[[BootB]] then map-side combine onto B
    * keys — shuffle traffic is O(B · partitions), never O(B · N); the
    * rank-pick window runs over exactly B rows (driver-scale by
    * construction, ordered (mb, b) so ties are deterministic).
    * Resample sums go through DECIMAL(18,6) ([[OpsUtil.dsum]]
    * contract). CI bounds are nearest-rank percentiles: rank
    * ⌈0.025·B⌉ = 3 and ⌈0.975·B⌉ = 98 of the sorted resample means. */
  def bootstrap(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
      .select(col("event_id").cast("string").as("id"), col("value"))
    val u = xhash60(concat(col("id"), lit(":"), col("b").cast("string")), 11) %
      lit(1000000000L)
    val w = BootCdf.zipWithIndex
      .foldLeft(when(lit(false), lit(0L))) { case (acc, (thr, k)) =>
        acc.when(u < thr, k.toLong)
      }.otherwise(BootCdf.size.toLong)
    val means = ev
      .select(col("id"), col("value"),
        explode(sequence(lit(0), lit(BootB - 1))).as("b"))
      .select(col("b"), w.as("w"), col("value"))
      .groupBy(col("b"))
      .agg((sum((col("w") * col("value")).cast("decimal(18,6)")).cast("double") /
        sum(col("w"))).as("mb"))
    val ranked = means.select(col("mb"),
      row_number().over(Window.orderBy(col("mb"), col("b"))).as("rk"))
    val ci = ranked.agg(
      max(when(col("rk") === 3, col("mb"))).as("lo"),
      max(when(col("rk") === BootB - 2, col("mb"))).as("hi"))
    Tables.events(spark, d)
      .agg(count(lit(1)).as("n_events"),
        round(davg(col("value")), 9).as("mean_value"))
      .crossJoin(broadcast(ci))
      .select(col("n_events"), col("mean_value"),
        round(col("lo"), 9).as("ci_lo"), round(col("hi"), 9).as("ci_hi"))
  }

  def bootstrapSql: String = {
    val u = xhash60Sql("id || ':' || CAST(b AS VARCHAR)", 11)
    val w = BootCdf.zipWithIndex
      .map { case (thr, k) => s"WHEN u < $thr THEN $k" }
      .mkString("CASE ", " ", s" ELSE ${BootCdf.size} END")
    s"""WITH ev AS (SELECT CAST(event_id AS VARCHAR) AS id, value FROM events),
       |ex AS (
       |  SELECT b, value, $u % 1000000000 AS u
       |  FROM ev, range($BootB) t(b)),
       |means AS (
       |  SELECT b, CAST(SUM(CAST(w * value AS DECIMAL(18,6))) AS DOUBLE)
       |    / SUM(w) AS mb
       |  FROM (SELECT b, value, $w AS w FROM ex) GROUP BY b),
       |ranked AS (
       |  SELECT mb, ROW_NUMBER() OVER (ORDER BY mb, b) AS rk FROM means),
       |ci AS (
       |  SELECT MAX(CASE WHEN rk = 3 THEN mb END) AS lo,
       |         MAX(CASE WHEN rk = ${BootB - 2} THEN mb END) AS hi FROM ranked),
       |base AS (
       |  SELECT COUNT(*) AS n_events,
       |    round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value), 9)
       |      AS mean_value
       |  FROM events)
       |SELECT n_events, mean_value,
       |  round(lo, 9) AS ci_lo, round(hi, 9) AS ci_hi
       |FROM base, ci""".stripMargin
  }
}
