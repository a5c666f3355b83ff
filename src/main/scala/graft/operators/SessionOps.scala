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

  val queries: Seq[GraftQuery] = Seq(
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
