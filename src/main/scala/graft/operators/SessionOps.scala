package graft.operators

import graft._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** V6: sessionization of the events stream by user — gap-based session
  * assignment via lag() + running sum, the batch form; the streaming form
  * (`session_window` with watermark) lives in graft.streaming.
  *
  * Scale notes: one shuffle on user_id, then a sorted window pass —
  * the canonical sessionization plan. Skewed users are the risk at
  * 100 TB; AQE skew handling or a two-level (user_id, day) pre-split
  * caps partition size.
  */
object SessionOps extends QueryModule {
  private val GapUs: Long = 30L * 60 * 1000 * 1000 // 30 min session gap

  /** THE 30-min-gap session assignment — one Spark spelling shared by
    * v6 sessionize and u7 attribution (u7's doc claims "same gap,
    * same keys"; the gap-marking block existed as two copies that a
    * session-rule tweak could silently desynchronize — round-10
    * review, the userFirsts/firstsCte discipline). Appends
    * `session_idx` to the frame; the window orders by
    * (ts_us, event_id) per user. */
  private def withSessionIdx(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    ev.withColumn("prev_ts", lag(col("ts_us"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          col("ts_us") - col("prev_ts") > GapUs, 1).otherwise(0))
      .withColumn("session_idx",
        sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
  }

  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val marked = withSessionIdx(Tables.events(spark, dir))
    marked.groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"),
        Exact.sumExact(col("value")).as("total_value"))
      .orderBy(col("user_id"), col("session_idx"))
  }

  /** U3: funnel / cohort conversion — per user, the first `view` and
    * the first purchase STRICTLY AFTER it (a purchase that predates
    * the first view does not convert that view, but a later one
    * does); cohorted by first-view day with the integer-exact
    * conversion ratio. The named product-analytics workload
    * (view→purchase funnel) on the same events table. Scale: the
    * first-view aggregate, one user-keyed join of the purchases
    * against it (filter before the re-aggregate, so only
    * post-first-view purchases shuffle twice), and the tiny cohort
    * agg — all keyed, all partial-aggregated, linear. */
  /** THE u3/u6 conversion convention, in one place: per-user first view
    * and first LATER purchase. All-NULL-ts viewers are dropped (a NULL
    * first_view would cohort to a NULL day, which the two engines ORDER
    * differently — Spark NULLS FIRST, DuckDB NULLS LAST); the purchase
    * aggregate groups by (user_id, first_view) so first_view survives
    * WITHOUT a re-join (the two frames are co-partitioned on user_id
    * anyway, but u6 then needs no join at all). The oracle twin is
    * [[firstsCte]] — a convention tweak must touch BOTH. */
  private def userFirsts(ev: DataFrame): (DataFrame, DataFrame) = {
    val firstView = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"))
      .agg(min(col("ts_us")).as("first_view"))
      .filter(col("first_view").isNotNull)
    val firstConv = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"))
      .join(firstView, Seq("user_id"))
      .filter(col("ts_us") > col("first_view"))
      .groupBy(col("user_id"), col("first_view"))
      .agg(min(col("ts_us")).as("first_conv"))
    (firstView, firstConv)
  }

  /** DuckDB spelling of [[userFirsts]] (shared by u3 and u6). */
  private val firstsCte: String =
    """fv AS (SELECT user_id, min(epoch_us(ts)) AS first_view
      |       FROM events WHERE event_type = 'view' GROUP BY 1
      |       HAVING min(epoch_us(ts)) IS NOT NULL),
      | fc AS (SELECT e.user_id, fv.first_view,
      |         min(epoch_us(e.ts)) AS first_conv
      |        FROM events e JOIN fv ON e.user_id = fv.user_id
      |        WHERE e.event_type = 'purchase'
      |          AND epoch_us(e.ts) > fv.first_view
      |        GROUP BY 1, 2)""".stripMargin

  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val (firstView, firstConv) = userFirsts(Tables.events(spark, dir))
    firstView.join(firstConv.select(col("user_id"), col("first_conv")),
        Seq("user_id"), "left")
      .withColumn("cohort_day", expr("first_view div 86400000000"))
      .groupBy(col("cohort_day"))
      .agg(count(lit(1)).as("n_viewers"),
        sum(when(col("first_conv").isNotNull, 1L).otherwise(0L))
          .as("n_converted"))
      .withColumn("conversion",
        Exact.ratio6(col("n_converted"), col("n_viewers")))
      .orderBy(col("cohort_day"))
  }

  private val funnelSql: String =
    s"""WITH $firstsCte,
       | c AS (SELECT fv.first_view // 86400000000 AS cohort_day,
       |        (fc.first_conv IS NOT NULL) AS conv
       |       FROM fv LEFT JOIN fc ON fv.user_id = fc.user_id)
       |SELECT cohort_day, CAST(count(*) AS BIGINT) AS n_viewers,
       | CAST(sum(CASE WHEN conv THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
       | ${OracleSql.ratio6("sum(CASE WHEN conv THEN 1 ELSE 0 END)",
            "count(*)")} AS conversion
       |FROM c GROUP BY 1 ORDER BY 1""".stripMargin

  /** U6: conversion-lag distribution — the companion metric to U3's
    * funnel: among converting users (first view → first LATER purchase,
    * u3's exact convention), how long did conversion take. Exact
    * p50/p90 of the lag in seconds plus min/max and a floored integer
    * mean, per first-view-day cohort. The SAME [[userFirsts]] frames u3
    * uses (the purchase aggregate carries first_view through, so no
    * re-join), then the tiny cohort percentile agg — the lag COLUMN
    * derives in-plan, no extra pass. Lags are floored to whole
    * seconds first: exact integer inputs keep the interpolated
    * percentile bit-identical across engines. */
  def conversionLag(spark: SparkSession, dir: String): DataFrame = {
    val (_, firstConv) = userFirsts(Tables.events(spark, dir))
    firstConv
      .withColumn("cohort_day", expr("first_view div 86400000000"))
      .withColumn("lag_s",
        expr("(first_conv - first_view) div 1000000"))
      .groupBy(col("cohort_day"))
      .agg(count(lit(1)).as("n_converted"),
        min(col("lag_s")).as("min_lag_s"),
        max(col("lag_s")).as("max_lag_s"),
        round(percentile(col("lag_s"), lit(0.5)), 6).as("p50_lag_s"),
        round(percentile(col("lag_s"), lit(0.9)), 6).as("p90_lag_s"),
        // integer mean, floored to whole seconds: lag_s is exact, so no
        // decimal machinery (whose 1e6 micro-scaling overflows DuckDB's
        // DECIMAL(18) once a cohort's lag-sum passes ~1e12)
        Exact.intDiv(sum(col("lag_s")), count(lit(1))).as("avg_lag_s"))
      .orderBy(col("cohort_day"))
  }

  private val convLagSql: String =
    s"""WITH $firstsCte,
       | l AS (SELECT first_view // 86400000000 AS cohort_day,
       |        (first_conv - first_view) // 1000000 AS lag_s
       |       FROM fc)
       |SELECT cohort_day, CAST(count(*) AS BIGINT) AS n_converted,
       | CAST(min(lag_s) AS BIGINT) AS min_lag_s,
       | CAST(max(lag_s) AS BIGINT) AS max_lag_s,
       | round(quantile_cont(lag_s, 0.5), 6) AS p50_lag_s,
       | round(quantile_cont(lag_s, 0.9), 6) AS p90_lag_s,
       | CAST(sum(lag_s) // count(*) AS BIGINT) AS avg_lag_s
       |FROM l GROUP BY 1 ORDER BY 1""".stripMargin

  /** U4: day-N retention — per first-activity-day cohort, the share of
    * users active again exactly N days later (N = 1, 7): the standard
    * retention matrix slice next to U3's funnel. Scale shape: distinct
    * (user, day) pairs (partial-agg'd), the per-user cohort min, then
    * per-user retention FLAGS via conditional max — no countDistinct,
    * so no Expand of the activity rows — and the tiny cohort agg. */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(spark, dir)
      .select(col("user_id"), expr("ts_us div 86400000000").as("day"))
      .distinct()
    val cohort = days.groupBy(col("user_id")).agg(min(col("day")).as("c"))
    val perUser = days.join(cohort, Seq("user_id"))
      .groupBy(col("user_id"), col("c"))
      .agg(max(when(col("day") === col("c") + 1, 1L).otherwise(0L)).as("r1"),
        max(when(col("day") === col("c") + 7, 1L).otherwise(0L)).as("r7"))
    perUser.groupBy(col("c").as("cohort_day"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("r1")).as("n_d1"), sum(col("r7")).as("n_d7"))
      .withColumn("d1_retention", Exact.ratio6(col("n_d1"), col("n_users")))
      .withColumn("d7_retention", Exact.ratio6(col("n_d7"), col("n_users")))
      .orderBy(col("cohort_day"))
  }

  private val retentionSql: String =
    s"""WITH days AS (SELECT DISTINCT user_id,
       |        epoch_us(ts) // 86400000000 AS day FROM events),
       | c AS (SELECT user_id, min(day) AS c FROM days GROUP BY 1),
       | pu AS (SELECT days.user_id, c.c,
       |         max(CASE WHEN day = c + 1 THEN 1 ELSE 0 END) AS r1,
       |         max(CASE WHEN day = c + 7 THEN 1 ELSE 0 END) AS r7
       |        FROM days JOIN c ON days.user_id = c.user_id
       |        GROUP BY 1, 2)
       |SELECT c AS cohort_day, CAST(count(*) AS BIGINT) AS n_users,
       | CAST(sum(r1) AS BIGINT) AS n_d1, CAST(sum(r7) AS BIGINT) AS n_d7,
       | ${OracleSql.ratio6("sum(r1)", "count(*)")} AS d1_retention,
       | ${OracleSql.ratio6("sum(r7)", "count(*)")} AS d7_retention
       |FROM pu GROUP BY 1 ORDER BY 1""".stripMargin

  /** Time-range shard width for the w8 sweep (1 day in µs): local
    * windows hold one day of one type's boundary points; the per-shard
    * offsets frame is ≤ #days rows per type. A 100 TB run narrows this
    * (hour/minute shards) to keep local windows in memory — offsets
    * stay a tiny frame either way. */
  private val SweepShardUs: Long = 86400L * 1000000

  /** W8: max concurrency — how many intervals (event start → start +
    * duration) are in flight at once, per type: the "spans in flight" /
    * connection-pool-sizing question. Sweep-line: every interval emits
    * (+1 at start, −1 at end), the running sum over (t, d, event_id)
    * order is the live count, its max is the answer. Ends sort before
    * starts at the same instant (d asc) — half-open intervals.
    *
    * The running sum is NOT one global window (a whole type through one
    * task): v15's distributed prefix-sum — order-preserving time-range
    * shards cumsum locally, per-shard totals get exclusive offsets in a
    * bounded per-type frame, and offset + local = the exact global
    * running sum, row for row; the oracle states the single-window
    * form. */
  def maxConcurrency(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val pts = e.select(col("event_type"), col("ts_us").as("t"),
        lit(1).as("d"), col("event_id"))
      .unionAll(e.select(col("event_type"),
        (col("ts_us") + floor(col("value") * 1000000).cast("long")).as("t"),
        lit(-1).as("d"), col("event_id")))
      .withColumn("shard", expr(s"t div $SweepShardUs"))
    val local = pts.withColumn("lrun",
      sum(col("d")).over(Window.partitionBy(col("event_type"), col("shard"))
        .orderBy(col("t"), col("d"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val offsets = pts.groupBy(col("event_type"), col("shard"))
      .agg(sum(col("d")).as("stot"))
      .withColumn("off", coalesce(
        sum(col("stot")).over(Window.partitionBy(col("event_type"))
          .orderBy(col("shard")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("event_type"), col("shard"), col("off"))
    local.join(offsets, Seq("event_type", "shard"))
      .withColumn("run", col("off") + col("lrun"))
      .groupBy(col("event_type"))
      .agg(max(col("run")).as("max_concurrency"),
        Exact.intDiv(count(lit(1)), lit(2L)).as("n_intervals"))
      .orderBy(col("event_type"))
  }

  private val sweepSql: String =
    """WITH pts AS (
      |  SELECT event_type, epoch_us(ts) AS t, 1 AS d, event_id FROM events
      |  UNION ALL
      |  SELECT event_type,
      |   epoch_us(ts) + CAST(floor(value * 1000000) AS BIGINT), -1, event_id
      |  FROM events),
      | r AS (SELECT event_type,
      |        sum(d) OVER (PARTITION BY event_type
      |          ORDER BY t, d, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      |       FROM pts)
      |SELECT event_type, CAST(max(run) AS BIGINT) AS max_concurrency,
      | CAST(count(*) // 2 AS BIGINT) AS n_intervals
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin

  /** W9: session path mining — the top event-type trigrams walked
    * INSIDE a session ("what do users do next", the journey report a
    * product dashboard derives from v6's sessions): lead×2 over the
    * per-user time order, a trigram qualifies only when BOTH hops stay
    * within the session gap. One user-keyed window shuffle
    * (high-cardinality key) + a path-keyed count + TakeOrdered top-10 —
    * no self-joins (the naive 3-way join form is quadratic per user). */
  def pathNgrams(spark: SparkSession, dir: String, n: Int = 10): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts_us"),
        col("event_id"))
      .withColumn("t2", lead(col("event_type"), 1).over(w))
      .withColumn("ts2", lead(col("ts_us"), 1).over(w))
      .withColumn("t3", lead(col("event_type"), 2).over(w))
      .withColumn("ts3", lead(col("ts_us"), 2).over(w))
      .filter(col("t3").isNotNull &&
        col("ts2") - col("ts_us") <= GapUs && col("ts3") - col("ts2") <= GapUs)
      .select(concat_ws(">", col("event_type"), col("t2"), col("t3"))
        .as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(n)
  }

  private val pathSql: String =
    s"""WITH l AS (
      | SELECT event_type AS t1,
      |  lead(event_type, 1) OVER w AS t2,
      |  lead(epoch_us(ts), 1) OVER w - epoch_us(ts) AS g2,
      |  lead(event_type, 2) OVER w AS t3,
      |  lead(epoch_us(ts), 2) OVER w - lead(epoch_us(ts), 1) OVER w AS g3
      | FROM events
      | WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
      |SELECT t1 || '>' || t2 || '>' || t3 AS path,
      | CAST(count(*) AS BIGINT) AS n
      |FROM l
      |WHERE t3 IS NOT NULL AND g2 <= $GapUs AND g3 <= $GapUs
      |GROUP BY 1 ORDER BY n DESC, path LIMIT 10""".stripMargin

  /** U7: purchase attribution — each purchase credited to its session's
    * ENTRY event type (first-touch) crossed with the immediately
    * preceding in-session touch (coalesced to 'direct' for
    * session-opening purchases): the marketing-attribution matrix that
    * decides channel spend, built on v6's session assignment (same gap,
    * same (user, session) keys). Two layered windows on the SAME
    * (user_id)-ordered exchange — session marking, then first/lag
    * within (user, session) — so the whole derivation costs v6's one
    * shuffle; the output aggregate is ≤ types² rows. Purchase mass is
    * decimal-exact. */
  def attribution(spark: SparkSession, dir: String): DataFrame = {
    val sessed = withSessionIdx(Tables.events(spark, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("ts_us"), col("value")))
      .withColumnRenamed("session_idx", "sess")
    val wS = Window.partitionBy(col("user_id"), col("sess"))
      .orderBy(col("ts_us"), col("event_id"))
    sessed
      .withColumn("entry_type", first(col("event_type")).over(wS))
      .withColumn("prev_type", lag(col("event_type"), 1).over(wS))
      .filter(col("event_type") === "purchase")
      .groupBy(col("entry_type"),
        coalesce(col("prev_type"), lit("direct")).as("prev_type"))
      .agg(count(lit(1)).as("n_purchases"),
        round(Exact.sumExact(col("value")), 6).as("purchase_mass"))
      .orderBy(col("entry_type"), col("prev_type"))
  }

  private lazy val attributionSql: String =
    s"""WITH m AS (
       |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
       |   value,
       |   CASE WHEN lag(epoch_us(ts), 1) OVER w IS NULL OR
       |     epoch_us(ts) - lag(epoch_us(ts), 1) OVER w > $GapUs
       |     THEN 1 ELSE 0 END AS new_sess
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
       | s AS (
       |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id
       |    ORDER BY ts_us, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
       |  FROM m),
       | a AS (
       |  SELECT event_type, value,
       |   first_value(event_type) OVER ws AS entry_type,
       |   lag(event_type, 1) OVER ws AS prev_type
       |  FROM s
       |  WINDOW ws AS (PARTITION BY user_id, sess
       |                ORDER BY ts_us, event_id))
       |SELECT entry_type, coalesce(prev_type, 'direct') AS prev_type,
       | CAST(count(*) AS BIGINT) AS n_purchases,
       | round(${OracleSql.sumExact("value")}, 6) AS purchase_mass
       |FROM a WHERE event_type = 'purchase'
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** U10: next-event Markov transition matrix — per (from, to) event
    * type: pair count and the row-normalized transition probability.
    * The product-analytics complement of w9's top-k path n-grams: the
    * full first-order model of where users go next. One user-keyed
    * window (lead) for the consecutive pairs, one (from,to) partial-agg
    * shuffle, probabilities via a window over the TYPES²-bounded
    * aggregate frame — never over raw rows. */
  def markovTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val counts = Tables.events(spark, dir)
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .select(col("event_type").as("from_type"), col("to_type"))
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("p", Exact.ratio6(col("n"),
        sum(col("n")).over(Window.partitionBy(col("from_type")))))
      .orderBy(col("from_type"), col("to_type"))
  }

  private val markovSql: String =
    s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
       |            event_type FROM events),
       | p AS (SELECT event_type AS from_type,
       |   lead(event_type) OVER (PARTITION BY user_id
       |     ORDER BY ts_us, event_id) AS to_type
       |  FROM e),
       | c AS (SELECT from_type, to_type, count(*) AS n FROM p
       |       WHERE to_type IS NOT NULL GROUP BY 1, 2)
       |SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
       | ${OracleSql.ratio6("n", "sum(n) OVER (PARTITION BY from_type)")}
       |   AS p
       |FROM c ORDER BY 1, 2""".stripMargin

  /** U11: cohort retention matrix — the full weekly cohort triangle u4's
    * two-point retention summarizes: users cohorted by epoch-week of
    * first activity (integer ts_s div 604800 — no calendar semantics to
    * disagree on), each (cohort, offset) cell counting the cohort
    * members active that week with the integer-exact retention share.
    * Two user-keyed aggregates + one join; output bounded at weeks²
    * cells; cohort sizes broadcast back. */
  def cohortMatrix(spark: SparkSession, dir: String): DataFrame = {
    val wkEvents = Tables.events(spark, dir)
      .select(col("user_id"), expr("ts_s div 604800").as("wk"))
    val firstWk = wkEvents.groupBy(col("user_id"))
      .agg(min(col("wk")).as("cohort_wk"))
    val sizes = firstWk.groupBy(col("cohort_wk"))
      .agg(count(lit(1)).as("cohort_n"))
    // (user_id, wk) is distinct by construction and firstWk is one row
    // per user, so a plain count is exact — countDistinct would pay a
    // second distinct-aggregate pass over the event-scale frame
    wkEvents.distinct()
      .join(firstWk, Seq("user_id"))
      .groupBy(col("cohort_wk"), col("wk"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), Seq("cohort_wk"))
      .select(col("cohort_wk"),
        (col("wk") - col("cohort_wk")).as("week_offset"),
        col("n_active"), col("cohort_n"),
        Exact.ratio6(col("n_active"), col("cohort_n")).as("retention"))
      .orderBy(col("cohort_wk"), col("week_offset"))
  }

  private val cohortMatrixSql: String =
    s"""WITH e AS (SELECT user_id,
       |            (epoch_us(ts) // 1000000) // 604800 AS wk FROM events),
       | f AS (SELECT user_id, min(wk) AS cohort_wk FROM e GROUP BY 1),
       | z AS (SELECT cohort_wk, count(*) AS cohort_n FROM f GROUP BY 1),
       | a AS (SELECT DISTINCT user_id, wk FROM e),
       | m AS (SELECT f.cohort_wk, a.wk,
       |        count(DISTINCT a.user_id) AS n_active
       |       FROM a JOIN f USING (user_id) GROUP BY 1, 2)
       |SELECT m.cohort_wk, m.wk - m.cohort_wk AS week_offset,
       | CAST(n_active AS BIGINT) AS n_active,
       | CAST(cohort_n AS BIGINT) AS cohort_n,
       | ${OracleSql.ratio6("n_active", "cohort_n")} AS retention
       |FROM m JOIN z USING (cohort_wk)
       |ORDER BY 1, 2""".stripMargin

  /** U12 regularity gate: flag when the squared coefficient of
    * variation of a user's inter-arrival gaps falls below 1/10 —
    * human traffic is bursty (exponential gaps have CV² ≈ 1),
    * schedulers and replay scripts tick (CV² → 0). */
  val BotCv2Den = 10L
  /** Minimum gaps before the CV² is meaningful. */
  val BotMinGaps = 5L

  /** U12: bot / automation detection — the behavioral gate next to
    * u10's transition matrix: per user, inter-arrival-gap count, mean
    * gap and squared coefficient of variation, flagged when timing is
    * too REGULAR to be human. All-integer: gaps are epoch-second
    * diffs; CV² = (n·Σg² − (Σg)²)/(Σg)² compares to 1/[[BotCv2Den]]
    * by cross-multiplication (DECIMAL(38) — n·Σg² is quartic in the
    * horizon and leaves Long around 2M same-user events), so no
    * division decides a flag. Scale: one lag window PARTITIONED BY
    * user (high-cardinality key — the u10 shape, never a constant
    * partition) + one user-keyed aggregate; output is one row per
    * qualifying user. */
  def botDetection(spark: SparkSession, dir: String): DataFrame =
    botDetectionOf(Tables.events(spark, dir))

  /** [[botDetection]]'s core over any events-shaped frame — public so
    * the spec can plant a metronome user (organic traffic is bursty,
    * which a detection test must not rely on). */
  private[graft] def botDetectionOf(e: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def d(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      c.cast(DecimalType(38, 0))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val gaps = e
      .withColumn("prev_s", lag(col("ts_s"), 1).over(w))
      .filter(col("prev_s").isNotNull)
      .select(col("user_id"), (col("ts_s") - col("prev_s")).as("g"))
    gaps.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("g")).as("sg"),
        sum(d(col("g")) * d(col("g"))).as("sg2"))
      .filter(col("n_gaps") >= BotMinGaps && col("sg") > 0L)
      .select(col("user_id"), col("n_gaps"),
        Exact.ratio6(col("sg"), col("n_gaps")).as("mean_gap_s"),
        Exact.ratio6Dec(
          d(col("n_gaps")) * col("sg2") - d(col("sg")) * d(col("sg")),
          d(col("sg")) * d(col("sg"))).as("cv2"),
        ((d(col("n_gaps")) * col("sg2") - d(col("sg")) * d(col("sg")))
          * BotCv2Den < d(col("sg")) * d(col("sg"))).as("is_bot"))
      .orderBy(col("user_id"))
  }

  private lazy val botDetectionSql: String =
    s"""WITH g AS (SELECT user_id,
       |  epoch_us(ts)//1000000 -
       |    lag(epoch_us(ts)//1000000, 1) OVER (PARTITION BY user_id
       |      ORDER BY epoch_us(ts), event_id) AS g
       |  FROM events),
       | a AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
       |        CAST(sum(g) AS BIGINT) AS sg,
       |        sum(g::HUGEINT * g) AS sg2
       |       FROM g WHERE g IS NOT NULL GROUP BY 1)
       |SELECT user_id, n_gaps,
       | ${OracleSql.ratio6("sg", "n_gaps")} AS mean_gap_s,
       | ${OracleSql.ratio6Huge("n_gaps::HUGEINT * sg2 - sg::HUGEINT * sg",
          "sg::HUGEINT * sg")} AS cv2,
       | (n_gaps::HUGEINT * sg2 - sg::HUGEINT * sg) * $BotCv2Den
       |   < sg::HUGEINT * sg AS is_bot
       |FROM a WHERE n_gaps >= $BotMinGaps AND sg > 0
       |ORDER BY user_id""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("u12_bot_detection",
      "U12 bot/automation detection: per-user inter-arrival gap count, " +
        "mean and squared coefficient of variation, flagged when " +
        "timing is too regular to be human — all-integer " +
        "cross-multiplied compare, one user-keyed lag window + one " +
        "keyed aggregate",
      botDetection, Some(botDetectionSql)),
    GraftQuery("u10_markov_transitions",
      "U10 next-event Markov transition matrix: consecutive-pair " +
        "counts per user (one lead window) row-normalized to " +
        "transition probabilities over the types^2-bounded aggregate",
      markovTransitions, Some(markovSql)),
    GraftQuery("u11_cohort_matrix",
      "U11 weekly cohort retention triangle: epoch-week cohorts, " +
        "per-(cohort, offset) active share, integer-exact ratios — " +
        "two user-keyed aggregates, broadcast cohort sizes",
      cohortMatrix, Some(cohortMatrixSql)),
    GraftQuery("u7_attribution",
      "U7 purchase attribution: session entry type x previous in-" +
        "session touch (first-touch/last-touch matrix on v6's session " +
        "assignment; one user-keyed shuffle, output <= types^2 rows)",
      attribution, Some(attributionSql)),
    GraftQuery("w9_path_ngrams",
      "W9 session path mining: top event-type trigrams within the " +
        "session gap via lead-squared window (no per-user self-join)",
      (s, d) => pathNgrams(s, d), Some(pathSql)),
    GraftQuery("w8_max_concurrency",
      "W8 interval max-concurrency per type: sweep-line running sum " +
        "via the sharded distributed prefix-sum (no whole-type global " +
        "window); oracle states the single-window form",
      maxConcurrency, Some(sweepSql)),
    GraftQuery("u6_conversion_lag",
      "U6 conversion-lag distribution per cohort: exact p50/p90 + " +
        "min/max/exact-mean of first-view to first-later-purchase " +
        "time (u3's convention; integer-second lags keep percentiles " +
        "bit-identical)",
      conversionLag, Some(convLagSql)),
    GraftQuery("u4_retention",
      "U4 day-N retention matrix slice: per first-day cohort, share of " +
        "users active exactly 1 and 7 days later (per-user flags, no " +
        "countDistinct Expand)",
      retention, Some(retentionSql)),
    GraftQuery("u3_funnel",
      "U3 funnel/cohort conversion: first view -> first later purchase " +
        "per user, cohorted by first-view day (two keyed aggs, no " +
        "window; integer-exact conversion ratio)",
      funnel, Some(funnelSql)),
    GraftQuery("v6_sessionization",
      "V6 gap-based sessionization (30 min) via lag + running sum",
      sessionize,
      Some(s"""WITH m AS (
              |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
              |   CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
              |     OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > $GapUs
              |    THEN 1 ELSE 0 END AS new_sess
              |  FROM events
              |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
              | s AS (
              |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id
              |    ORDER BY ts_us, event_id
              |    ROWS UNBOUNDED PRECEDING) AS session_idx
              |  FROM m)
              |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
              | CAST(count(*) AS BIGINT) AS n_events,
              | min(ts_us) AS start_us, max(ts_us) AS end_us,
              | ${OracleSql.sumExact("value")} AS total_value
              |FROM s GROUP BY 1,2 ORDER BY 1,2""".stripMargin)))
}
