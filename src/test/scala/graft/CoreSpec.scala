package graft

import org.apache.spark.sql.functions._

/** Smoke-level correctness for the first operator slice; the deep
  * end-to-end check is the driver's DuckDB oracle (tools/check.py locally).
  */
class CoreSpec extends SparkSpec {

  test("flagship endpoint latencies: groups and schema") {
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(df.columns.toSeq == Seq("l_returnflag", "l_linestatus",
      "avg_price", "min_price", "max_price", "p50_price", "p90_price",
      "p99_price", "n"))
    // groups are unique and sorted
    val keys = rows.map(r => (r.getString(0), r.getString(1))).toSeq
    assert(keys == keys.sorted && keys.distinct == keys)
  }

  test("every registered query runs on sf0.001 and is deterministic-shaped") {
    SparkEntry.all.foreach { q =>
      val df = q.run(spark, sf0001)
      val n = df.count()
      assert(n >= 0, s"${q.id} failed")
      withClue(q.id) { assert(df.columns.distinct.length == df.columns.length) }
    }
  }

  test("query ids are unique and every oracle key has a query") {
    val ids = SparkEntry.all.map(_.id)
    assert(ids.distinct.length == ids.length)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("zero-filled count series covers the dense grid with no gaps") {
    val df = SparkEntry.queries("t10_trace_counts")(spark, sf0001)
    val buckets = df.select("bucket_s").collect().map(_.getLong(0))
    assert(buckets.length == 16)
    assert(buckets.sliding(2).forall(p => p(1) - p(0) == 172800L))
    // total events in window == sum of series
    val total = df.agg(sum("n")).collect().head.getLong(0)
    val expected = Tables.events(spark, sf0001)
      .filter(col("ts_s").between(1704067200L, 1706659200L)).count()
    assert(total == expected)
  }

  test("trace list issues: value > 2*group-avg counted per trace") {
    val df = SparkEntry.queries("t08_trace_list")(spark, sf0001)
    val ev = Tables.events(spark, sf0001)
      .select("user_id", "value").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val byUser = ev.groupBy(_._1)
    val expected = byUser.map { case (u, vs) =>
      val avg = vs.map(_._2).sum / vs.length
      u -> vs.count(_._2 > 2 * avg)
    }
    df.collect().foreach { r =>
      val u = r.getLong(0)
      // FP tolerance: the engine's exact-decimal avg may differ from this
      // naive double sum by an ulp; issue counts still must be close.
      assert(math.abs(r.getLong(4) - expected(u)) <= 0)
    }
  }
}
