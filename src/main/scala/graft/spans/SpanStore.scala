package graft.spans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed span-store layout for co-located joins (SURVEY §4 / prompt
  * "minimize shuffles"): bucketing both sides of the hot self-joins
  * (dependency edges on span ids, per-trace rollups on trace_id) by the
  * join key lets Spark plan the join with ZERO shuffle — each bucket
  * pairs with its counterpart directly. At 100 TB this converts the two
  * biggest exchanges in the workload into local sort-merge joins.
  *
  * Bucketed tables go through the session catalog (`saveAsTable`);
  * the date-partitioned parquet path ([[OtlpIngest.writeSpans]]) remains
  * the plain-files layout.
  */
object SpanStore {
  /** Write the span table bucketed+sorted by trace_id. Idempotent: drops
    * the table and any orphaned managed location first (an in-memory
    * catalog forgets tables between sessions but the warehouse dir
    * persists). */
  def writeBucketed(spans: DataFrame, table: String,
      buckets: Int = 32): Unit = {
    val spark = spans.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(s"$warehouse/$table")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    spans.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, "trace_id")
      .sortBy("trace_id")
      .saveAsTable(table)
  }

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Per-trace rollup on the bucketed table — same shape as
    * TraceService.traceList but with both aggregation and self-join
    * consuming the bucket layout (no Exchange in the plan). */
  def bucketedTraceList(spark: SparkSession, table: String): DataFrame =
    new TraceService(readTable(spark, table)).traceList()

  /** Compact one date partition of the plain-files store: streaming
    * micro-batch appends leave many small files per partition (one per
    * foreachBatch x writer task); periodic compaction rewrites the
    * partition into `targetFiles` files. Partition-scoped so the rewrite
    * touches one date at a time — the only safe granularity while ingest
    * keeps appending to newer dates. */
  def compactPartition(spark: SparkSession, path: String, date: String,
      targetFiles: Int = 1): Unit = {
    val partDir = s"$path/date=$date"
    val tmp = s"$path/.compact-$date"
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.read.parquet(partDir).coalesce(targetFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    fs.delete(new Path(partDir), true)
    fs.rename(new Path(tmp), new Path(partDir))
  }

  /** Retention: drop whole date partitions older than `keepDays` relative
    * to the newest partition — the analog of a ClickHouse TTL, done at
    * directory granularity so expiry is O(partitions), not a data
    * rewrite. Returns the dropped dates. */
  def expire(spark: SparkSession, path: String, keepDays: Int): Seq[String] = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(new Path(path))
      .filter(_.getPath.getName.startsWith("date="))
      .map(_.getPath.getName.stripPrefix("date=")).sorted
    if (parts.isEmpty) return Seq.empty
    val newest = java.time.LocalDate.parse(parts.last)
    val dropped = parts.filter(d =>
      java.time.LocalDate.parse(d).isBefore(newest.minusDays(keepDays.toLong)))
    dropped.foreach(d => fs.delete(new Path(s"$path/date=$d"), true))
    dropped.toSeq
  }

  /** Files per date partition (compaction-health introspection). */
  def partitionFileCounts(spark: SparkSession, path: String): Map[String, Int] = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new Path(path))
      .filter(_.getPath.getName.startsWith("date="))
      .map { p =>
        p.getPath.getName.stripPrefix("date=") ->
          fs.listStatus(p.getPath).count(_.getPath.getName.endsWith(".parquet"))
      }.toMap
  }
}
