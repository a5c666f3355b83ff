package graft.operators

import graft._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** OLAP grouping shapes the reference never issues (its dashboards are
  * all flat GROUP BYs — SURVEY §2.D) but any analytics engine serving
  * the same dashboards is asked for immediately: grouping-sets rollups
  * (subtotals + grand total in one pass) and pivoted crosstabs.
  *
  * Scale notes: ROLLUP compiles to ONE scan + one Expand(levels) +
  * one shuffle on the padded group key — the subtotal levels ride the
  * same partial-aggregation pass as the leaf level, not one job per
  * level. Honest cost: Expand multiplies the scanned rows by
  * levels+1 (×3 here) BEFORE the partial agg absorbs them; when that
  * multiplier bites at extreme scale, the subtotals should instead be
  * re-aggregated FROM the (tiny) leaf aggregate in a second step —
  * the leaf output here is ≤ flags×statuses rows, so the two-pass
  * form costs one scan plus noise. Pivot with an explicit value list skips the distinct-values
  * discovery job and plans as (key,type) count → pivotfirst(key):
  * two keyed map-side-combined exchanges, the second over only
  * key×type rows — at 100 TB both operators cost what the flat
  * aggregate costs plus a constant factor.
  */
object OlapOps extends QueryModule {

  /** W4: ROLLUP aggregate — per (returnflag, linestatus) leaf counts
    * plus per-flag subtotals and the grand total in one pass. `gid`
    * (grouping(flag)*2 + grouping(status)) disambiguates a genuine NULL
    * group value from a rolled-up level, and the ORDER BY coalesces the
    * nullable keys so both engines use the same total order (Spark
    * sorts NULLS FIRST, DuckDB NULLS LAST). */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        round(Exact.sumExact(col("l_quantity")), 6).as("sum_qty"),
        (grouping(col("l_returnflag")) * 2 +
          grouping(col("l_linestatus"))).cast("int").as("gid"))
      .orderBy(col("gid"), coalesce(col("l_returnflag"), lit("")),
        coalesce(col("l_linestatus"), lit("")))

  private val rollupSql: String =
    s"""SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
       | round(${OracleSql.sumExact("l_quantity")},6) AS sum_qty,
       | CAST(GROUPING(l_returnflag)*2 + GROUPING(l_linestatus) AS INT) AS gid
       |FROM lineitem
       |GROUP BY ROLLUP (l_returnflag, l_linestatus)
       |ORDER BY gid, coalesce(l_returnflag,''), coalesce(l_linestatus,'')""".stripMargin

  /** The event types present in the testdata (TESTDATA.md §events);
    * pivoting over an EXPLICIT value list keeps the plan a single
    * groupBy — Spark otherwise runs a distinct-values job first. */
  val EventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  /** W5: pivoted crosstab — events per (day × event_type), one column
    * per type. Missing (day, type) combos are 0 (Spark's pivot yields
    * NULL there; the oracle's filtered counts yield 0 — coalesced). */
  def pivotCounts(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.events(spark, dir)
      .withColumn("day", expr("ts_us div 86400000000"))
      .groupBy(col("day"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
    EventTypes.foldLeft(p)((acc, t) =>
      acc.withColumn(t, coalesce(col(t), lit(0L))))
      .orderBy(col("day"))
  }

  private val pivotSql: String = {
    val cols = EventTypes.map(t =>
      s"CAST(count(*) FILTER (WHERE event_type = '$t') AS BIGINT) AS \"$t\"")
      .mkString(",\n ")
    s"""SELECT epoch_us(ts) // 86400000000 AS day,
       | $cols
       |FROM events GROUP BY 1 ORDER BY day""".stripMargin
  }

  /** W13: CUBE aggregate — all four grouping sets over
    * (event_type, day): leaf, per-type, per-day, grand total in ONE
    * scan (Expand ×4 riding the partial agg — same plan family as W4,
    * plus the cross-dimension set a ROLLUP hierarchy cannot express;
    * the same extreme-scale note applies: re-aggregate subtotal sets
    * from the leaf aggregate when the Expand multiplier bites). gid
    * = grouping(type)*2 + grouping(day); value mass decimal-exact. */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("day",
        Exact.intDiv(col("ts_s") - EventWindow.StartS, lit(86400L)))
      .cube(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"),
        round(Exact.sumExact(col("value")), 6).as("sum_v"),
        (grouping(col("event_type")) * 2 + grouping(col("day")))
          .cast("int").as("gid"))
      .orderBy(col("gid"), coalesce(col("event_type"), lit("")),
        coalesce(col("day"), lit(-1L)))

  private val cubeSql: String =
    s"""SELECT event_type,
       | (epoch_us(ts)//1000000 - ${EventWindow.StartS}) // 86400 AS day,
       | CAST(count(*) AS BIGINT) AS n,
       | round(${OracleSql.sumExact("value")}, 6) AS sum_v,
       | CAST(GROUPING(event_type)*2 + GROUPING(day) AS INT) AS gid
       |FROM events
       |GROUP BY CUBE (event_type, day)
       |ORDER BY gid, coalesce(event_type,''), coalesce(day,-1)""".stripMargin

  /** W13b: the extreme-scale CUBE form the w13 scaladoc prescribes —
    * ONE scan computes the leaf (type, day) aggregate (no Expand), and
    * every subtotal set (per-type, per-day, grand) is re-aggregated
    * from that tiny leaf frame (≤ types×days rows), materialized once
    * via localCheckpoint so the union's four branches cannot re-scan
    * events. Value mass is carried as DECIMAL(18,6) sums — decimal
    * re-aggregation is exact, so every level reproduces w13's
    * Exact.sumExact doubles bit-for-bit and the entry shares w13's
    * oracle unchanged (the v36b convention: the scale twin stays on
    * the oracle). Expand ×4 → 1 scan + 3 re-aggs of a bounded frame. */
  def cubeLeafReagg(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val leaf = Tables.events(spark, dir)
      .withColumn("day",
        Exact.intDiv(col("ts_s") - EventWindow.StartS, lit(86400L)))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 6))).as("sv"))
      .localCheckpoint()
    val l0 = leaf.select(col("event_type"), col("day"), col("n"),
      col("sv"), lit(0).as("gid"))
    val byType = leaf.groupBy(col("event_type"))
      .agg(sum(col("n")).as("n"), sum(col("sv")).as("sv"))
      .select(col("event_type"), lit(null).cast("long").as("day"),
        col("n"), col("sv"), lit(1).as("gid"))
    val byDay = leaf.groupBy(col("day"))
      .agg(sum(col("n")).as("n"), sum(col("sv")).as("sv"))
      .select(lit(null).cast("string").as("event_type"), col("day"),
        col("n"), col("sv"), lit(2).as("gid"))
    val grand = leaf
      .agg(sum(col("n")).as("n"), sum(col("sv")).as("sv"))
      .select(lit(null).cast("string").as("event_type"),
        lit(null).cast("long").as("day"), col("n"), col("sv"),
        lit(3).as("gid"))
    l0.unionByName(byType).unionByName(byDay).unionByName(grand)
      .select(col("event_type"), col("day"),
        col("n").cast("long").as("n"),
        round(col("sv").cast("double"), 6).as("sum_v"),
        col("gid").cast("int").as("gid"))
      .orderBy(col("gid"), coalesce(col("event_type"), lit("")),
        coalesce(col("day"), lit(-1L)))
  }

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("w13_cube",
      "W13 CUBE grouping sets: leaf + per-type + per-day + grand total " +
        "in one scan (Expand x4 on the partial agg; gid disambiguates " +
        "grouped-out NULLs)",
      cubeAgg, Some(cubeSql)),
    GraftQuery("w13b_cube_leaf_reagg",
      "W13b extreme-scale CUBE twin: leaf aggregate once (NO Expand), " +
        "subtotal sets + grand total re-aggregated from the bounded " +
        "leaf frame; decimal sums keep every level bit-identical to " +
        "w13 -> same oracle",
      cubeLeafReagg, Some(cubeSql)),
    GraftQuery("w4_rollup_agg",
      "W4 ROLLUP grouping sets: leaf + subtotal + grand-total levels in " +
        "ONE scan/shuffle (Expand rides the partial agg); gid " +
        "disambiguates rolled-up NULLs",
      rollupAgg, Some(rollupSql)),
    GraftQuery("w5_pivot",
      "W5 pivoted crosstab: day x event_type counts via pivot with an " +
        "explicit value list (no distinct-values discovery job; " +
        "two-stage keyed agg, second stage over day x type rows only)",
      pivotCounts, Some(pivotSql)))
}
