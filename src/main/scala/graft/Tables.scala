package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (TESTDATA.md /
  * FIXTURES.md). All paths are `$dir/$name.parquet`.
  *
  * `events.ts` has shipped in two physical forms across testdata
  * generations: parquet TIMESTAMP(NANOS), which Spark reads as a LongType
  * of nanoseconds-since-epoch (under `spark.sql.legacy.parquet.nanosAsLong`,
  * set by [[GraftSession]]), and parquet timestamp[us], which Spark reads
  * as TIMESTAMP_NTZ. All downstream operators are written against the
  * ns-long form, so [[Tables.normalizeTsNs]] canonicalizes `ts` to
  * nanoseconds-since-epoch LongType at load. The DuckDB oracle reads the
  * same parquet as a TIMESTAMP either way (NANOS truncates to µs), so the
  * oracle SQL's `epoch_us(ts)` equals our `ts div 1000` exactly.
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

  /** Canonicalize an events-shaped frame's `ts` to nanoseconds-since-epoch
    * LongType (see the header note: the driver has generated both ns-long
    * and timestamp[us] physical forms). The session timezone is pinned to
    * UTC by [[GraftSession]], so the NTZ→TIMESTAMP cast is epoch-exact.
    * Works on streaming frames too (type dispatch is on the static schema). */
  def normalizeTsNs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case org.apache.spark.sql.types.LongType => df
    case org.apache.spark.sql.types.TimestampNTZType =>
      df.withColumn("ts",
        unix_micros(col("ts").cast(org.apache.spark.sql.types.TimestampType)) *
          lit(1000L))
    case _: org.apache.spark.sql.types.TimestampType =>
      df.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
    case other => throw new IllegalArgumentException(
      s"events.ts: expected ns-long or timestamp, got $other")
  }

  /** THE derived µs/s epoch columns over a normalized ns-long `ts` —
    * one spelling for batch (events/eventsSplit) and streaming
    * (StreamingOps.eventsStream) consumers alike (review finding,
    * round 8: a third copy had appeared in a streaming entry). */
  def withEpochCols(df: DataFrame): DataFrame = df
    .withColumn("ts_us", expr("ts div 1000"))
    .withColumn("ts_s", expr("ts div 1000000000"))

  /** events with derived µs/s epoch columns (oracle-compatible, see above). */
  def events(spark: SparkSession, dir: String): DataFrame =
    withEpochCols(normalizeTsNs(table(spark, dir, "events")))

  /** events restricted to ts ≥/< an epoch-second cutoff, with the
    * comparison phrased against the PHYSICAL `ts` column (typed literal
    * per generation form) BEFORE normalization — a predicate on the
    * derived ns-long would never reach the parquet reader, while this
    * one lands in PushedFilters and prunes row groups. The incremental
    * family (w19) depends on exactly this: reading the delta must not
    * cost a history scan. */
  def eventsFrom(spark: SparkSession, dir: String, fromS: Long): DataFrame =
    eventsSplit(spark, dir, fromS, after = true)

  def eventsUntil(spark: SparkSession, dir: String, untilS: Long): DataFrame =
    eventsSplit(spark, dir, untilS, after = false)

  private def eventsSplit(spark: SparkSession, dir: String, s: Long,
      after: Boolean): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = table(spark, dir, "events")
    val bound: Column = raw.schema("ts").dataType match {
      case LongType => lit(s * 1000000000L)
      case TimestampNTZType => lit(java.time.LocalDateTime
        .ofEpochSecond(s, 0, java.time.ZoneOffset.UTC))
      case _: TimestampType => lit(java.time.Instant.ofEpochSecond(s))
      case other => throw new IllegalArgumentException(
        s"events.ts: expected ns-long or timestamp, got $other")
    }
    val cut = if (after) col("ts") >= bound else col("ts") < bound
    withEpochCols(normalizeTsNs(raw.filter(cut)))
  }
}
