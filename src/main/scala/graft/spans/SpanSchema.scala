package graft.spans

import org.apache.spark.sql.types._

/** The engine's span data model (SURVEY §1.2): one wide denormalized row
  * per span, mirroring the reference's `denormalized_span`
  * (reference db/clickhouse.go:86-110, Go mirror utils/utils.go:138-158)
  * with the idiomatic-Spark remodel: attributes are MAP<STRING,STRING>
  * instead of ClickHouse-Nested parallel key/value arrays, and events fold
  * their per-event attributes into the event struct. This removes the
  * reference's array-zipping round-trips (api/service.go:296-308) and its
  * pair-unaligned has()/has() matching bug (api/service.go:742-751).
  *
  * Times are Int64 nanoseconds (collector stringifies per
  * collector/service.go:184-237); `duration_ns` is materialized at ingest
  * like the reference's MATERIALIZED column (db/clickhouse.go:94).
  */
object SpanSchema {
  val attrMap: MapType = MapType(StringType, StringType, valueContainsNull = true)

  val eventType: StructType = StructType(Seq(
    StructField("time_unix_nano", LongType),
    StructField("name", StringType),
    StructField("attributes", attrMap)))

  val schema: StructType = StructType(Seq(
    StructField("trace_id", StringType),
    StructField("span_id", StringType),
    StructField("parent_span_id", StringType), // '' => root span
    StructField("flags", IntegerType),
    StructField("name", StringType),
    StructField("start_time_unix_nano", LongType),
    StructField("end_time_unix_nano", LongType),
    StructField("duration_ns", LongType),
    // scope_id/resource_id complete the reference's 16 denormalized
    // columns (db/clickhouse.go:95-97). Its live writer leaves them as
    // zero UUIDs (utils/types.go:44-46, never assigned on the
    // denormalized path; the dead normalized path uses random UUIDs,
    // controller.go:233,259) — here they are deterministic content
    // hashes in UUID format (OtlpIngest.withDerivedIds): same
    // scope/resource always gets the same id, with zero cross-executor
    // coordination and stable replays.
    StructField("scope_id", StringType),
    StructField("scope_name", StringType), // used as service name
    StructField("resource_id", StringType),
    StructField("resource_schema_url", StringType),
    StructField("resource_attributes", attrMap),
    StructField("span_attributes", attrMap),
    StructField("events", ArrayType(eventType))))

  val columns: Seq[String] = schema.fields.map(_.name).toSeq
}
