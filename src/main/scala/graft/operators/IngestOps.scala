package graft.operators

import graft._
import graft.spans.{OtlpExamples, OtlpIngest}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** OTLP ingest as a registry entry (SURVEY §2.A A2+A3): parse both OTLP
  * request generations from [[OtlpExamples]] and emit the flattened span
  * table. Input is embedded JSON (not a parquet table), so there is no
  * DuckDB oracle — the driver records a rows-only check; the value-level
  * assertions live in OtlpIngestSpec.
  */
object IngestOps extends QueryModule {

  def otlpIngest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    OtlpIngest.fromJson(spark.createDataset(OtlpExamples.all))
      .select(col("trace_id"), col("span_id"), col("parent_span_id"),
        col("name"), col("scope_name"), col("duration_ns"),
        size(col("events")).as("n_events"),
        size(map_keys(col("resource_attributes"))).as("n_res_attrs"),
        element_at(col("resource_attributes"), "service.name")
          .as("service_name"))
      .orderBy(col("trace_id"), col("span_id"))
  }

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("a2a3_otlp_ingest",
      "A2+A3 OTLP JSON (current+legacy) parse, normalize, flatten " +
        "(collector/controller.go:45-223, collector/service.go:100-237)",
      otlpIngest, None))
}
