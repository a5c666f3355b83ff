package graft.spans

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** OTLP trace ingestion (SURVEY §2.A A1-A4): OTLP/JSON
  * `ExportTraceServiceRequest` documents → one denormalized row per span.
  *
  * Mirrors the reference collector's behavior Spark-first:
  *  - A2: accepts both the current `scopeSpans` form and the legacy
  *    `instrumentationLibrarySpans` form incl. `{Value:{StringValue:..}}`
  *    wrapped attribute values (reference collector/controller.go:54-70,
  *    97-223) — handled by schema-level coalesce, no JSON text surgery.
  *  - A3: flattens resource → scope → span → events via `explode` and
  *    stringifies attribute values with the reference's rules
  *    (collector/service.go:184-237): string kept; int/double/bool
  *    rendered; all-string arrays comma-joined, mixed arrays JSON;
  *    kvlist JSON; bytes stay base64 (OTLP/JSON already base64s bytes).
  *  - ids: OTLP/JSON carries hex ids; the reference stores base64 of the
  *    raw bytes (collector/service.go:273-275) — hex ids are re-encoded
  *    to base64 to match.
  *  - A4: [[writeSpans]] materializes `duration_ns` (db/clickhouse.go:94)
  *    and appends date-partitioned parquet — the clustering analog of the
  *    reference's MergeTree ORDER BY (start_time, trace_id)
  *    (db/clickhouse.go:107-109): partition pruning + row-group min/max
  *    stats give the same time-range skipping at scale.
  *
  * Everything here is `functions._` expressions — the whole ingest is one
  * codegen'd projection pipeline, no UDFs.
  */
object OtlpIngest {

  // ---- OTLP/JSON schema (protojson shape; int64s arrive as strings) ----

  /** Scalar branch of AnyValue, plus the legacy Go-marshalled
    * `{Value:{StringValue:..}}` wrapper fields. */
  private val scalarValue: StructType = StructType(Seq(
    StructField("stringValue", StringType),
    StructField("intValue", StringType),
    StructField("doubleValue", DoubleType),
    StructField("boolValue", BooleanType),
    StructField("bytesValue", StringType)))

  private val legacyWrapper: StructType = StructType(Seq(
    StructField("StringValue", StringType),
    StructField("IntValue", StringType),
    StructField("DoubleValue", DoubleType),
    StructField("BoolValue", BooleanType)))

  private val anyValue: StructType = StructType(
    scalarValue.fields.toSeq ++ Seq(
      StructField("arrayValue",
        StructType(Seq(StructField("values", ArrayType(scalarValue))))),
      StructField("kvlistValue", StructType(Seq(StructField("values",
        ArrayType(StructType(Seq(
          StructField("key", StringType),
          StructField("value", scalarValue)))))))),
      StructField("Value", legacyWrapper)))

  private val keyValue: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("value", anyValue)))

  private val spanJson: StructType = StructType(Seq(
    StructField("traceId", StringType),
    StructField("spanId", StringType),
    StructField("parentSpanId", StringType),
    StructField("flags", IntegerType),
    StructField("name", StringType),
    StructField("startTimeUnixNano", StringType),
    StructField("endTimeUnixNano", StringType),
    StructField("attributes", ArrayType(keyValue)),
    StructField("events", ArrayType(StructType(Seq(
      StructField("timeUnixNano", StringType),
      StructField("name", StringType),
      StructField("attributes", ArrayType(keyValue))))))))

  private val scopeSpansJson: StructType = StructType(Seq(
    StructField("scope", StructType(Seq(StructField("name", StringType)))),
    StructField("instrumentationLibrary",
      StructType(Seq(StructField("name", StringType)))),
    StructField("spans", ArrayType(spanJson))))

  /** Top-level ExportTraceServiceRequest schema (both generations). */
  val requestSchema: StructType = StructType(Seq(
    StructField("resourceSpans", ArrayType(StructType(Seq(
      StructField("resource", StructType(Seq(
        StructField("attributes", ArrayType(keyValue))))),
      StructField("schemaUrl", StringType),
      StructField("scopeSpans", ArrayType(scopeSpansJson)),
      StructField("instrumentationLibrarySpans", ArrayType(scopeSpansJson))))))))

  // ---- attribute stringification (collector/service.go:184-237) ----

  private def scalarToString(v: Column): Column =
    coalesce(
      v.getField("stringValue"),
      v.getField("intValue"),
      v.getField("doubleValue").cast(StringType),
      v.getField("boolValue").cast(StringType),
      v.getField("bytesValue"))

  /** AnyValue → String per the reference's rules, legacy wrappers included. */
  def valueToString(v: Column): Column = {
    val arr = v.getField("arrayValue").getField("values")
    val allStrings =
      forall(arr, x => x.getField("stringValue").isNotNull)
    val legacy = v.getField("Value")
    coalesce(
      scalarToString(v),
      // legacy {Value:{StringValue:..}} wrapper (controller.go:97-223)
      legacy.getField("StringValue"),
      legacy.getField("IntValue"),
      legacy.getField("DoubleValue").cast(StringType),
      legacy.getField("BoolValue").cast(StringType),
      // array: comma-join if all-string else JSON (service.go:197-217)
      when(arr.isNotNull,
        when(allStrings,
          array_join(transform(arr, _.getField("stringValue")), ","))
          .otherwise(to_json(transform(arr, scalarToString(_))))),
      // kvlist → JSON object (service.go:218-225)
      when(v.getField("kvlistValue").getField("values").isNotNull,
        to_json(map_from_entries(
          transform(v.getField("kvlistValue").getField("values"),
            kv => struct(kv.getField("key"),
              scalarToString(kv.getField("value"))))))))
  }

  /** Array<KeyValue> → ARRAY<STRUCT<key,value:STRING>> entries; null
    * array → empty. */
  private def attrEntries(attrs: Column): Column = {
    val entryType = ArrayType(StructType(Seq(
      StructField("key", StringType), StructField("value", StringType))))
    when(attrs.isNull, array().cast(entryType))
      .otherwise(transform(
        // a malformed attribute object without "key" parses to
        // key=null (legal JSON, invalid wire data) and would throw
        // "Cannot use null as map key" inside the lastWinsMap fold —
        // the kill-the-whole-ingest class that helper exists to
        // prevent, and under streaming the poison doc replays forever
        // (round-10 review); drop the entry instead
        filter(attrs, kv => kv.getField("key").isNotNull),
        kv => struct(
          kv.getField("key").as("key"),
          valueToString(kv.getField("value")).as("value"))))
  }

  /** Entry array → map with LAST-entry-wins per key (Go-map overwrite
    * semantics for repeated keys WITHIN one attribute list — legal on
    * the wire, and what the protobuf path's Map building already does
    * silently). map_from_entries would throw DUPLICATE_MAP_KEY under
    * Spark's default EXCEPTION dedup policy and kill the whole ingest;
    * the aggregate fold evaluates the (stringified) entries array ONCE
    * and rebuilds only the small accumulator map per element. */
  private def lastWinsMap(entries: Column): Column =
    aggregate(entries,
      map().cast(MapType(StringType, StringType)),
      (acc, e) => map_concat(
        map_filter(acc, (k, _) => k =!= e.getField("key")),
        map(e.getField("key"), e.getField("value"))))

  /** Array<KeyValue> → MAP<STRING,STRING>; null array → empty map;
    * repeated keys last-wins. */
  def attrsToMap(attrs: Column): Column =
    lastWinsMap(attrEntries(attrs))

  /** Legacy-request merge of span attrs INTO resource attrs with the
    * reference's Go-map overwrite semantics (controller.go:199-207): a
    * key present in both takes the SPAN value. Built from entry arrays —
    * resource entries shadowed by a span key are dropped before
    * map_from_entries, so the merge never trips Spark's default
    * `spark.sql.mapKeyDedupPolicy=EXCEPTION` (map_concat of the two maps
    * threw "duplicate map key" for exactly the keys the reference
    * deliberately duplicates, e.g. service.name). */
  def mergeAttrsLastWins(resAttrs: Column, spanAttrs: Column): Column = {
    val span = attrsToMap(spanAttrs)
    val res = attrsToMap(resAttrs)
    map_concat(
      map_filter(res, (k, _) => !array_contains(map_keys(span), k)),
      span)
  }

  /** Hex OTLP/JSON ids → base64-of-bytes, matching the reference's stored
    * form (collector/service.go:273-275); non-hex ids pass through. */
  def idToBase64(id: Column): Column =
    when(id.isNull || id === "", lit(""))
      .otherwise(when(id.rlike("^[0-9a-fA-F]+$") && length(id) % 2 === 0,
        base64(unhex(id))).otherwise(id))

  // ---- derived scope/resource ids ----

  /** Deterministic UUID-format id from content (md5 → 8-4-4-4-12 groups).
    * The reference's denormalized writer leaves scope_id/resource_id as
    * zero UUIDs (utils/types.go:44-46 — never assigned on the live path);
    * its dead normalized path draws RANDOM uuids per request
    * (controller.go:233,259). Content-derived ids keep the row
    * byte-complete and are the right call at scale: the same
    * scope/resource hashes to the same id on every executor and every
    * replay, no coordination, and downstream joins on scope_id actually
    * mean something. */
  def contentUuid(parts: Column*): Column = {
    val h = md5(concat_ws("\u0000", parts: _*))
    concat_ws("-", substring(h, 1, 8), substring(h, 9, 4),
      substring(h, 13, 4), substring(h, 17, 4), substring(h, 21, 12))
  }

  /** Order-insensitive canonical text of an attr map (sorted k=v lines),
    * so the id does not depend on map entry order. */
  private def canonicalAttrs(m: Column): Column =
    array_join(array_sort(transform(map_entries(m),
      e => concat(e.getField("key"), lit("="),
        coalesce(e.getField("value"), lit(""))))), "\n")

  /** Populate scope_id/resource_id from scope name and resource identity
    * (schema url + canonical attrs). Works on any frame with those
    * columns — both the JSON and protobuf ingest paths route through it.
    * `resourceIdentity` overrides the attr map the resource hash reads:
    * the JSON path passes its PRE-merge resource attrs, because legacy
    * requests fold each span's own attrs into `resource_attributes` and
    * hashing the merged map would give spans of one resource different
    * resource_ids. */
  def withDerivedIds(spans: DataFrame,
      resourceIdentity: Option[Column] = None): DataFrame = {
    val identity = resourceIdentity.getOrElse(col("resource_attributes"))
    spans
      .withColumn("scope_id",
        contentUuid(lit("scope"), coalesce(col("scope_name"), lit(""))))
      .withColumn("resource_id", contentUuid(lit("resource"),
        coalesce(col("resource_schema_url"), lit("")),
        canonicalAttrs(identity)))
  }

  // ---- A2+A3: parse + flatten ----

  /** Parse a Dataset of OTLP/JSON request documents and flatten to the
    * span table (one row per span). */
  def fromJson(requests: Dataset[String]): DataFrame = {
    val parsed = requests.toDF("raw")
      .select(from_json(col("raw"), requestSchema).as("req"))
    flatten(parsed.select(col("req.resourceSpans").as("resourceSpans")))
  }

  /** Flatten parsed OTLP structs → SpanSchema rows. */
  def flatten(parsed: DataFrame): DataFrame = {
    val legacy = col("rs.instrumentationLibrarySpans")
    // scopeSpans wins only when it actually CARRIES spans: a
    // migration-era exporter may emit BOTH fields (receivers were
    // required to accept either), and (a) spans read from scopeSpans
    // must not get the legacy attr-merge semantics, (b) an
    // empty-but-non-null scopeSpans beside populated legacy spans
    // must not silently drop every span (round-10 review) — is_legacy
    // now derives from which branch actually supplied the spans
    val useScope =
      col("rs.scopeSpans").isNotNull && size(col("rs.scopeSpans")) > 0
    parsed
      .select(explode(col("resourceSpans")).as("rs"))
      .select(
        col("rs.resource.attributes").as("res_attrs"),
        col("rs.schemaUrl").as("resource_schema_url"),
        (!useScope && legacy.isNotNull).as("is_legacy"),
        explode(when(useScope, col("rs.scopeSpans")).otherwise(legacy))
          .as("ss"))
      .select(
        col("res_attrs"), col("resource_schema_url"), col("is_legacy"),
        coalesce(col("ss.scope.name"),
          col("ss.instrumentationLibrary.name")).as("scope_name"),
        explode(col("ss.spans")).as("sp"))
      .select(
        idToBase64(col("sp.traceId")).as("trace_id"),
        idToBase64(col("sp.spanId")).as("span_id"),
        idToBase64(col("sp.parentSpanId")).as("parent_span_id"),
        coalesce(col("sp.flags"), lit(0)).as("flags"),
        col("sp.name").as("name"),
        col("sp.startTimeUnixNano").cast(LongType).as("start_time_unix_nano"),
        col("sp.endTimeUnixNano").cast(LongType).as("end_time_unix_nano"),
        (col("sp.endTimeUnixNano").cast(LongType) -
          col("sp.startTimeUnixNano").cast(LongType)).as("duration_ns"),
        col("scope_name"),
        coalesce(col("resource_schema_url"), lit("")).as("resource_schema_url"),
        // legacy requests merge span attrs into resource attrs, span
        // value winning on shared keys (controller.go:54-70,199-207)
        when(col("is_legacy"),
          mergeAttrsLastWins(col("res_attrs"), col("sp.attributes")))
          .otherwise(attrsToMap(col("res_attrs"))).as("resource_attributes"),
        attrsToMap(col("sp.attributes")).as("span_attributes"),
        // pre-merge resource identity for resource_id derivation
        attrsToMap(col("res_attrs")).as("__res_identity"),
        coalesce(transform(col("sp.events"), e => struct(
          e.getField("timeUnixNano").cast(LongType).as("time_unix_nano"),
          e.getField("name").as("name"),
          attrsToMap(e.getField("attributes")).as("attributes"))),
          array().cast(ArrayType(SpanSchema.eventType))).as("events"))
      .transform(withDerivedIds(_, Some(col("__res_identity"))))
      .select(SpanSchema.columns.map(col): _*)
  }

  // ---- A4: sink ----

  /** Writer tasks per date — bounds files/partition while keeping
    * write parallelism (see [[writeSpans]]). */
  val WriteTasksPerDate = 8

  /** Append the span table as date-partitioned parquet. Partitioning by
    * event date + parquet min/max stats replaces the reference's MergeTree
    * time clustering (db/clickhouse.go:107-109) for range pruning.
    * The repartition is SALTED by trace hash: live telemetry batches
    * are overwhelmingly single-date, so repartition(date) alone
    * funnels each micro-batch through ONE writer task (zero
    * parallelism, straggler/OOM at the volumes this path claims —
    * round-10 review); date+salt keeps ≤[[WriteTasksPerDate]] files
    * per (batch, date) with parallel writers. */
  def writeSpans(spans: DataFrame, path: String): Unit =
    spans
      .withColumn("date",
        to_date(timestamp_micros(expr("start_time_unix_nano div 1000"))))
      .repartition(col("date"),
        pmod(xxhash64(col("trace_id")), lit(WriteTasksPerDate)))
      .write.mode("append").partitionBy("date").parquet(path)

  def readSpans(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
