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

  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val marked = Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts_us"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          col("ts_us") - col("prev_ts") > GapUs, 1).otherwise(0))
      .withColumn("session_idx",
        sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
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
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    // guard all-NULL-ts viewers: a NULL first_view would cohort to a
    // NULL day, which the two engines ORDER differently (Spark NULLS
    // FIRST, DuckDB NULLS LAST) — drop them on both sides instead
    val firstView = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"))
      .agg(min(col("ts_us")).as("first_view"))
      .filter(col("first_view").isNotNull)
    val firstConv = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"))
      .join(firstView, Seq("user_id"))
      .filter(col("ts_us") > col("first_view"))
      .groupBy(col("user_id"))
      .agg(min(col("ts_us")).as("first_conv"))
    firstView.join(firstConv, Seq("user_id"), "left")
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
    s"""WITH fv AS (SELECT user_id, min(epoch_us(ts)) AS first_view
       |            FROM events WHERE event_type = 'view' GROUP BY 1
       |            HAVING min(epoch_us(ts)) IS NOT NULL),
       | fc AS (SELECT e.user_id, min(epoch_us(e.ts)) AS first_conv
       |        FROM events e JOIN fv ON e.user_id = fv.user_id
       |        WHERE e.event_type = 'purchase'
       |          AND epoch_us(e.ts) > fv.first_view
       |        GROUP BY 1),
       | c AS (SELECT fv.first_view // 86400000000 AS cohort_day,
       |        (fc.first_conv IS NOT NULL) AS conv
       |       FROM fv LEFT JOIN fc ON fv.user_id = fc.user_id)
       |SELECT cohort_day, CAST(count(*) AS BIGINT) AS n_viewers,
       | CAST(sum(CASE WHEN conv THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
       | ${OracleSql.ratio6("sum(CASE WHEN conv THEN 1 ELSE 0 END)",
            "count(*)")} AS conversion
       |FROM c GROUP BY 1 ORDER BY 1""".stripMargin

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

  val queries: Seq[GraftQuery] = Seq(
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
