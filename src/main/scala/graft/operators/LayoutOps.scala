package graft.operators

import graft._
import graft.functions.ZOrderFunctions.z_value
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout (SURVEY §2.V north-star, the storage
  * side of corpus curation): Z-order clustering of a table on two
  * dimensions so parquet min-max statistics prune box queries on EITHER
  * dimension — the Delta/Iceberg `OPTIMIZE ZORDER` capability, built
  * from Spark primitives.
  *
  * Mechanics: quantize each dimension to a 16-bit code over its bounds,
  * interleave the codes into a Morton key ([[graft.functions.ZValue]],
  * codegen'd), `repartitionByRange` on the key (one shuffle, contiguous
  * key ranges per file) and sort within partitions before writing. Rows
  * close in both dimensions land in the same few files, so every file's
  * (min,max) envelope on BOTH columns is tight: the scan's ordinary
  * predicate pushdown then skips most files/row-groups — no index
  * structure, no read-path changes. A single-column sort gives the same
  * effect for one dimension and destroys it for the other; the Z-curve
  * splits the benefit across both (LayoutSpec measures exactly this).
  *
  * At 100 TB this is the difference between a box query scanning ~TBs
  * and ~GBs: layout is the only "index" a data lake has. The write is
  * one range-shuffle of the data — the same cost class as any compaction
  * pass, amortized over every subsequent scan. Dimension bounds come
  * from table stats (here: the published series window for time, one
  * cheap min/max agg for the id dimension — what OPTIMIZE reads from
  * table metadata).
  */
object LayoutOps extends QueryModule {

  // The testdata event window ([[graft.EventWindow]], the same range the
  // reference's series endpoints bucket over) — reused as the
  // time-dimension bounds and the query box anchor.
  private val Start = EventWindow.StartS
  private val End = EventWindow.EndS
  private val Day = 86400L
  // 3-day x 5-user box for the registered pruning query
  private val TsLo = Start + 12 * Day
  private val TsHi = Start + 15 * Day
  private val UserLo = 0L
  private val UserHi = 4L

  /** Quantize a long column to a 16-bit code over [lo, hi], clamped;
    * NULL stays NULL (so the Morton key is NULL and those rows sort
    * together, matching [[graft.functions.ZValue]]'s NULL contract —
    * Spark's greatest/least would otherwise silently absorb the NULL
    * into code 0 and pollute the origin file's min-max envelope).
    *
    * The clamp happens BEFORE the scale so the product stays within
    * 65535*(hi-lo): scaling first would let an out-of-range value
    * overflow Long and wrap to code 0 instead of 65535. Requires
    * hi-lo < Long.MaxValue/65535 (~1.4e14 — e.g. 4.4M years in
    * seconds), which every physical dimension satisfies. */
  def q16(c: Column, lo: Long, hi: Long): Column = {
    require(hi - lo < Long.MaxValue / 65535L,
      s"q16 span $lo..$hi too wide for 16-bit Long-space quantization")
    val span = math.max(hi - lo, 1L)
    val clamped = least(greatest(c, lit(lo)), lit(hi))
    when(c.isNotNull, (clamped - lo) * 65535L / span).cast("int")
  }

  /** Z-order `df` by two quantized long dimensions and write `nFiles`
    * range-partitioned, internally sorted parquet files at `out`. */
  def zOrderWrite(df: DataFrame, d1: Column, b1: (Long, Long),
      d2: Column, b2: (Long, Long), out: String, nFiles: Int): Unit =
    df.withColumn("_z",
        z_value(q16(d1, b1._1, b1._2), q16(d2, b2._1, b2._2)))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(out)

  /** V12: re-cluster events by (ts, user) and answer a 2-D box query
    * from the clustered copy. The result is layout-invariant (the oracle
    * computes it from the original table); the pruning effect of the
    * layout is pinned in LayoutSpec via per-file min-max envelopes. */
  private def boxAgg(df: DataFrame): DataFrame =
    df.filter(col("ts_s") >= TsLo && col("ts_s") < TsHi &&
        col("user_id").between(UserLo, UserHi))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        Exact.microSum(col("value")).as("sum_value_micro"))

  def zorderPrune(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("ts_s"), col("user_id"), col("value"))
    val ub = ev.agg(min(col("user_id")), max(col("user_id"))).head()
    // empty table / all-NULL ids: nothing to cluster — answer the box
    // query directly (same layout-invariant result, no crash)
    if (ub.isNullAt(0)) return boxAgg(ev)
    val out = java.nio.file.Files.createTempDirectory("graft-zorder")
    val path = s"$out/events_z"
    // materialize the 1-row aggregate eagerly so the per-run clustered
    // copy can be deleted before returning (same convention as the
    // per-run Derby database in graft.sinks)
    try {
      zOrderWrite(ev, col("ts_s"), (Start, End),
        col("user_id"), (ub.getLong(0), ub.getLong(1)), path, 16)
      val agg = boxAgg(spark.read.parquet(path))
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(agg.collect().toSeq.asJava, agg.schema)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(out.toString)).deleteRecursively()
    }
  }

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("v12_zorder_prune",
      "V12 Z-order layout: re-cluster events on (ts, user), box query " +
        "answered from the clustered copy (pruning pinned in LayoutSpec)",
      zorderPrune,
      Some(s"""SELECT CAST(count(*) AS BIGINT) AS n,
              | CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
              | CAST(${OracleSql.microSum("value")} AS BIGINT) AS sum_value_micro
              |FROM events
              |WHERE epoch_us(ts)//1000000 >= $TsLo
              |  AND epoch_us(ts)//1000000 < $TsHi
              |  AND user_id BETWEEN $UserLo AND $UserHi""".stripMargin)))
}
