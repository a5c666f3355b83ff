package graft.spans

/** Example OTLP/JSON payloads (the two request generations the reference
  * collector accepts, collector/controller.go:45-77,97-223) used by the
  * ingest smoke query and the ingest specs. Covers every attribute value
  * kind the reference stringifies (collector/service.go:184-237).
  */
object OtlpExamples {

  /** Current `scopeSpans` form; all AnyValue kinds present. */
  val current: String =
    """{"resourceSpans":[{"resource":{"attributes":[
      |{"key":"service.name","value":{"stringValue":"gateway"}},
      |{"key":"count","value":{"intValue":"42"}},
      |{"key":"ratio","value":{"doubleValue":0.5}},
      |{"key":"ok","value":{"boolValue":true}},
      |{"key":"tags","value":{"arrayValue":{"values":[{"stringValue":"a"},{"stringValue":"b"}]}}},
      |{"key":"mixed","value":{"arrayValue":{"values":[{"stringValue":"a"},{"intValue":"1"}]}}},
      |{"key":"meta","value":{"kvlistValue":{"values":[{"key":"k","value":{"stringValue":"v"}}]}}},
      |{"key":"blob","value":{"bytesValue":"aGVsbG8="}}
      |]},"schemaUrl":"https://opentelemetry.io/schemas/1.24.0",
      |"scopeSpans":[{"scope":{"name":"gateway"},"spans":[
      |{"traceId":"0a0b0c0d","spanId":"01020304","parentSpanId":"",
      | "flags":1,"name":"GET /users",
      | "startTimeUnixNano":"1704067200000000000",
      | "endTimeUnixNano":"1704067200100000000",
      | "attributes":[{"key":"http.method","value":{"stringValue":"GET"}}],
      | "events":[{"timeUnixNano":"1704067200050000000","name":"exception",
      |   "attributes":[{"key":"exception.type","value":{"stringValue":"IOException"}},
      |                 {"key":"exception.message","value":{"stringValue":"boom"}}]}]},
      |{"traceId":"0a0b0c0d","spanId":"05060708","parentSpanId":"01020304",
      | "flags":1,"name":"SELECT users",
      | "startTimeUnixNano":"1704067200010000000",
      | "endTimeUnixNano":"1704067200090000000",
      | "attributes":[{"key":"db.statement","value":{"stringValue":"SELECT 1"}}],
      | "events":[]}
      |]}]}]}""".stripMargin.replace("\n", "")

  /** Legacy `instrumentationLibrarySpans` form with Go-marshalled
    * `{Value:{StringValue:..}}` wrapped attribute values. */
  val legacy: String =
    """{"resourceSpans":[{"resource":{"attributes":[
      |{"key":"service.name","value":{"Value":{"StringValue":"legacy-svc"}}}
      |]},
      |"instrumentationLibrarySpans":[{"instrumentationLibrary":{"name":"legacy-lib"},
      |"spans":[
      |{"traceId":"aabbccdd","spanId":"11223344","parentSpanId":"",
      | "name":"POST /orders",
      | "startTimeUnixNano":"1704067300000000000",
      | "endTimeUnixNano":"1704067300200000000",
      | "attributes":[{"key":"http.status_code","value":{"Value":{"IntValue":"500"}}},
      |   {"key":"service.name","value":{"Value":{"StringValue":"legacy-span-svc"}}}],
      | "events":[]}
      |]}]}]}""".stripMargin.replace("\n", "")

  val all: Seq[String] = Seq(current, legacy)
}
