package graft

import graft.spans.SpanSchema
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** The canonical hand-built trace from FIXTURES.md §B: 3 services
  * (gateway → users → db), 5 spans across 2 traces, one span carrying an
  * `exception` event and a `db.statement` attribute — the minimal shape
  * making dependency edges, root/child filters, issue counting, waterfall
  * geometry and error flags all non-trivial.
  */
object SpanFixtures {
  private val Base = 1704067200000000000L // 2024-01-01T00:00:00Z ns

  private def span(traceId: String, spanId: String, parent: String,
      name: String, service: String, startOffsetMs: Long, durMs: Long,
      spanAttrs: Map[String, String] = Map.empty,
      events: Seq[Row] = Seq.empty): Row = {
    val start = Base + startOffsetMs * 1000000L
    val end = start + durMs * 1000000L
    Row(traceId, spanId, parent, 1, name, start, end, end - start,
      s"scope-$service", service, "resource-1", "https://example/schema",
      Map("service.name" -> service), spanAttrs, events)
  }

  private def event(offsetMs: Long, name: String,
      attrs: Map[String, String]): Row =
    Row(Base + offsetMs * 1000000L, name, attrs)

  val rows: Seq[Row] = Seq(
    span("T1", "s1", "", "GET /users", "gateway", 0, 100),
    span("T1", "s2", "s1", "lookup", "users", 5, 60),
    span("T1", "s3", "s2", "SELECT users", "db", 10, 40,
      Map("db.statement" -> "SELECT * FROM users"),
      Seq(event(15, "exception", Map(
        "exception.type" -> "SQLException",
        "exception.message" -> "deadlock",
        "exception.stacktrace" -> "at db.Query")))),
    span("T1", "s4", "s1", "auth", "gateway", 70, 10),
    span("T2", "s5", "", "GET /profile", "users", 200, 20))

  def spans(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), SpanSchema.schema)
}
