package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (TESTDATA.md /
  * FIXTURES.md). All paths are `$dir/$name.parquet`.
  *
  * `events.ts` is written as parquet TIMESTAMP(NANOS) which Spark reads as
  * a LongType of nanoseconds-since-epoch (requires
  * `spark.sql.legacy.parquet.nanosAsLong=true`, set by [[GraftSession]]).
  * The DuckDB oracle truncates the same value to microseconds, so every
  * time expression here works on `ts div 1000` (µs, floor division —
  * verified to match DuckDB's truncation).
  */
/** The driver testdata's event-time window (TESTDATA.md §events): the
  * epoch-second range every series endpoint buckets over and the layout
  * operators quantize against. One definition — SeriesOps/LayoutOps
  * derive from here (specs deliberately re-hardcode to stay independent). */
object EventWindow {
  val StartS = 1704067200L // 2024-01-01T00:00:00Z
  val EndS = 1706659200L // 2024-01-31T00:00:00Z
}

object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** events with derived µs/s epoch columns (oracle-compatible, see above). */
  def events(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("ts_s", expr("ts div 1000000000"))
}
