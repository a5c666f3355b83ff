package graft

import graft.operators.JoinOps
import org.apache.spark.sql.functions._

/** W1 as-of join and W2 range join: each checked against a naive
  * quadratic formulation on sf0.001 (the oracle covers sf0.01; these
  * pin the SEMANTICS against an independently-written plan so a
  * refactor of the union-window / bucket trick can't silently drift). */
class JoinSpec extends SparkSpec {

  test("W1 as-of join equals the naive all-prior-pairs rank-1 join") {
    val ev = Tables.events(spark, sf0001)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pe"), col("user_id").as("pu"),
        col("ts_us").as("pt"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("ve"), col("user_id").as("vu"),
        col("ts_us").as("vt"), round(col("value"), 6).as("vv"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("pe"))
      .orderBy(col("vt").desc, col("ve").desc)
    val best = p.join(v, col("vu") === col("pu") && col("vt") <= col("pt"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("pe"), col("ve"), col("vt"), col("vv"))
    val naive = p.join(best, Seq("pe"), "left")
      .select(col("pe").as("event_id"), col("pu").as("user_id"),
        col("pt").as("ts_us"), col("ve").as("view_event_id"),
        col("vt").as("view_ts_us"), col("vv").as("view_value"))
    val got = JoinOps.asofJoin(spark, sf0001)
    assert(got.count() === p.count()) // left semantics: every purchase
    assert(got.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(got).count() === 0)
    // at least one purchase has a prior view and at least one enriched
    // row is non-null at this SF (guards a degenerate all-NULL pass)
    assert(got.filter(col("view_event_id").isNotNull).count() > 0)
  }

  test("W2 range join equals the naive theta-join aggregate") {
    val ev = Tables.events(spark, sf0001)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts_us"))
    val err = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("ts_us").as("err_ts"))
    val naive = err.join(ev,
        abs(col("ts_us") - col("err_ts")) <= JoinOps.RangeHalfUs &&
          col("event_id") =!= col("err_id"))
      .groupBy(col("err_id"), col("err_ts"))
      .agg(count(lit(1)).as("n_nearby"),
        countDistinct(col("user_id")).as("n_users"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .as("n_errors"))
    val got = JoinOps.rangeJoin(spark, sf0001)
    assert(got.count() > 0)
    assert(got.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(got).count() === 0)
  }

  test("W2 intervals span at most two buckets") {
    // bucket width >= interval length is the invariant that bounds the
    // explode fanout; guard the constants against a careless retune
    assert(JoinOps.RangeBucketUs >= 2 * JoinOps.RangeHalfUs)
  }
}
