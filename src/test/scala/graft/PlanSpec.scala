package graft

import org.apache.spark.sql.DataFrame

/** Physical-plan regression guards: the scale-critical plan shapes
  * (pushdown, broadcast, top-k, partial aggregation) must survive
  * refactors — a correct-but-full-scan plan is a regression even when
  * results match. */
class PlanSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.toString

  private def q(id: String): DataFrame = SparkEntry.queries(id)(spark, sf0001)

  test("equality filters reach the parquet scan (PushedFilters)") {
    val p = plan(q("t02_service_traces"))
    assert(p.contains("PushedFilters") && p.contains("EqualTo(event_type,click)"), p)
  }

  test("top-k compiles to TakeOrderedAndProject, not a global sort") {
    val p = plan(q("t01_top_slow_traces"))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("dim joins broadcast (no shuffle of the fact side)") {
    val p = plan(q("c3_dim_join"))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("grouped aggregation is partial -> final (map-side combine)") {
    val p = plan(q("t04_endpoint_latencies"))
    assert(p.contains("partial_"), p)
  }

  test("scan prunes columns to what the query reads") {
    val p = plan(q("b1_projection"))
    // only the three projected columns reach ReadSchema
    assert(p.contains("ReadSchema"), p)
    assert(!p.contains("l_shipdate"), p)
    assert(!p.contains("l_returnflag"), p)
  }
}
