package graft.operators

import graft._
import graft.spans.TraceService
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType

/** Oracle bridge for the span-native library: deterministically map the
  * `events` table into the span schema, then run the REAL
  * [[TraceService]] code paths and oracle-check their results. This puts
  * the library's own operators (not just the events-mapped shapes in
  * [[EventOps]]) behind the driver's DuckDB gate.
  *
  * Mapping (pure, SQL-expressible): one span per event; trace = user;
  * service = user_id mod 5; duration = value ms as ns; an `exception`
  * event attaches when event_type='error'. No parent ids are synthesized
  * (the dependency self-join is covered by t05 + TraceServiceSpec).
  */
object SpanNativeOps extends QueryModule {

  /** events → SpanSchema rows. */
  def eventsAsSpans(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      concat(lit("trace-"), col("user_id")).as("trace_id"),
      concat(lit("span-"), col("event_id")).as("span_id"),
      lit("").as("parent_span_id"),
      lit(0).as("flags"),
      col("event_type").as("name"),
      col("ts").as("start_time_unix_nano"),
      // floor() before the long cast: Spark's double->long cast truncates
      // while DuckDB's rounds — floor on both sides pins the value
      (col("ts") + floor(col("value") * 1000000).cast("long"))
        .as("end_time_unix_nano"),
      floor(col("value") * 1000000).cast("long").as("duration_ns"),
      concat(lit("svc-"), pmod(col("user_id"), lit(5))).as("scope_name"),
      lit("").as("resource_schema_url"),
      map(lit("service.name"),
        concat(lit("svc-"), pmod(col("user_id"), lit(5))))
        .as("resource_attributes"),
      map(lit("k"), get_json_object(col("props"), "$.k"))
        .as("span_attributes"),
      when(col("event_type") === "error",
        array(struct(col("ts").as("time_unix_nano"),
          lit("exception").as("name"),
          map(lit("exception.type"), lit("Error")).as("attributes"))))
        .otherwise(array().cast(ArrayType(graft.spans.SpanSchema.eventType)))
        .as("events"))

  private def svc(spark: SparkSession, dir: String) =
    new TraceService(eventsAsSpans(spark, dir))

  /** events → spans with a SYNTHESIZED parent tree (heap-shaped): rank
    * events within each user by (ts_us, event_id); span rank r parents
    * onto rank r div 2, rank 1 is the root. Every trace gets a
    * deterministic SQL-expressible tree of depth ⌈log₂ n⌉, which puts
    * [[TraceService.spanDepths]]'s BFS behind a recursive-CTE oracle
    * over the same construction (ranking on ts_us, not raw ns, because
    * the oracle's epoch_us() truncates — ns-order would break µs ties
    * differently). Only the four columns spanDepths reads are mapped. */
  def eventsAsTreeSpans(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("r", row_number().over(w))
      .select(
        concat(lit("trace-"), col("user_id")).as("trace_id"),
        concat(lit("s"), col("r")).as("span_id"),
        when(col("r") === 1, "")
          .otherwise(concat(lit("s"), expr("r div 2"))).as("parent_span_id"),
        floor(col("value") * 1000000).cast("long").as("duration_ns"))
  }

  /** TraceService.spanDepths (BFS depth + critical path) through the
    * oracle, over the synthesized heap tree. */
  def spanCriticalPath(spark: SparkSession, dir: String): DataFrame =
    new TraceService(eventsAsTreeSpans(spark, dir)).spanDepthsAuto()

  /** TraceService.endpointLatencies through the oracle. */
  def spanLatencies(spark: SparkSession, dir: String): DataFrame = {
    val df = svc(spark, dir).endpointLatencies()
    df.select(col("name"), col("scope_name"), col("avg_ns"),
      round(col("p50_ns"), 6).as("p50_ns"),
      round(col("p90_ns"), 6).as("p90_ns"),
      col("min_ns"), col("max_ns"), col("n"))
  }

  /** TraceService.services (map element_at + distinct) through the oracle. */
  def spanServices(spark: SparkSession, dir: String): DataFrame =
    svc(spark, dir).services()

  /** TraceService.errorCounts (exists() over the events array) through
    * the oracle. */
  def spanErrorSeries(spark: SparkSession, dir: String): DataFrame =
    // bounds DERIVED from the one EventWindow definition (this main-
    // source call and its oracle previously hardcoded them, so a
    // testdata window shift would have zero-filled the whole series
    // with the hash gate still green — round-10 review; specs alone
    // deliberately re-hardcode to stay independent)
    svc(spark, dir).errorCounts(
      EventWindow.StartS * 1000000000L, EventWindow.EndS * 1000000000L)

  private val durNs = "CAST(floor(value*1000000) AS BIGINT)"

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("tn_span_latencies",
      "span-native TraceService.endpointLatencies over mapped events " +
        "(api/service.go:315-363)",
      spanLatencies,
      Some(s"""SELECT event_type AS name,
              | 'svc-' || (user_id % 5) AS scope_name,
              | ${OracleSql.avgExact(s"CAST($durNs // 1000 AS DOUBLE)")} * 1000 AS avg_ns,
              | round(quantile_cont($durNs, 0.5),6) AS p50_ns,
              | round(quantile_cont($durNs, 0.9),6) AS p90_ns,
              | min($durNs) AS min_ns, max($durNs) AS max_ns,
              | CAST(count(*) AS BIGINT) AS n
              |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin)),
    GraftQuery("tn_span_services",
      "span-native TraceService.services: distinct element_at over the " +
        "resource-attribute map (api/service.go:1540-1570)",
      spanServices,
      Some("""SELECT DISTINCT 'svc-' || (user_id % 5) AS service_name
             |FROM events ORDER BY 1""".stripMargin)),
    GraftQuery("u5_critical_path",
      "U5 span-tree depth + critical path via level-synchronous BFS " +
        "(TraceService.spanDepths over the synthesized heap tree; " +
        "oracle = recursive CTE over the same construction)",
      spanCriticalPath,
      Some(s"""WITH RECURSIVE rk AS (
              |  SELECT user_id, $durNs AS dur,
              |   row_number() OVER (PARTITION BY user_id
              |     ORDER BY epoch_us(ts), event_id) AS r
              |  FROM events),
              | d AS (
              |  SELECT user_id, r, 1 AS depth, dur AS path_ns
              |  FROM rk WHERE r = 1
              |  UNION ALL
              |  SELECT c.user_id, c.r, d.depth + 1, d.path_ns + c.dur
              |  FROM rk c JOIN d ON c.user_id = d.user_id
              |   AND c.r // 2 = d.r AND c.r > 1)
              |SELECT 'trace-' || user_id AS trace_id,
              | CAST(max(depth) AS INT) AS max_depth,
              | CAST(count(*) AS BIGINT) AS n_spans,
              | CAST(max(path_ns) AS BIGINT) AS critical_path_ns
              |FROM d GROUP BY 1 ORDER BY 1""".stripMargin)),
    GraftQuery("tn_span_error_series",
      "span-native TraceService.errorCounts: exists(events,'exception') " +
        "bucketed + zero-filled (api/service.go:1240-1297)",
      spanErrorSeries,
      Some(s"""WITH f AS (SELECT unnest(generate_series(
              |   ${EventWindow.StartS - EventWindow.StartS % 172800L},
              |   ${EventWindow.EndS}, 172800)) AS bucket_s),
              | c AS (SELECT (epoch_us(ts)//1000000) - (epoch_us(ts)//1000000) % 172800 AS b,
              |        sum(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS n
              |       FROM events
              |       WHERE epoch_us(ts)//1000000
              |        BETWEEN ${EventWindow.StartS} AND ${EventWindow.EndS}
              |       GROUP BY 1)
              |SELECT f.bucket_s, CAST(coalesce(c.n,0) AS BIGINT) AS n_errors
              |FROM f LEFT JOIN c ON f.bucket_s=c.b ORDER BY 1""".stripMargin)))
}
