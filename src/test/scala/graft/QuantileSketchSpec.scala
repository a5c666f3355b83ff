package graft

import graft.functions.{CentroidDigest, QuantileSketch}
import org.apache.spark.sql.functions._

/** Mergeable quantile sketch: accuracy vs exact percentile, merge
  * associativity, streaming usability. */
class QuantileSketchSpec extends SparkSpec {

  test("sketch percentiles within 1% of exact on lineitem") {
    val li = Tables.lineitem(spark, sf0001)
    val both = li.groupBy(col("l_returnflag")).agg(
      percentile(col("l_extendedprice"), lit(0.5)).as("exact50"),
      QuantileSketch.percentile_sketch(col("l_extendedprice"), 0.5)
        .as("sk50"),
      percentile(col("l_extendedprice"), lit(0.95)).as("exact95"),
      QuantileSketch.percentile_sketch(col("l_extendedprice"), 0.95)
        .as("sk95"))
    both.collect().foreach { r =>
      val (e50, s50) = (r.getDouble(1), r.getDouble(2))
      val (e95, s95) = (r.getDouble(3), r.getDouble(4))
      assert(math.abs(s50 - e50) / e50 < 0.01, s"p50 $s50 vs $e50")
      assert(math.abs(s95 - e95) / e95 < 0.01, s"p95 $s95 vs $e95")
    }
  }

  test("digest merge is order-insensitive and bounded") {
    val vs = (1 to 10000).map(_.toDouble)
    val (a, b, c) = (CentroidDigest(128), CentroidDigest(128),
      CentroidDigest(128))
    vs.take(3000).foreach(a.add(_))
    vs.slice(3000, 7000).reverse.foreach(b.add(_))
    vs.drop(7000).foreach(c.add(_))
    a.addAll(b); a.addAll(c)
    a.compact()
    assert(a.total === 10000L)
    assert(a.means.length <= 2 * 128 + 1) // greedy packing bound
    assert(math.abs(a.quantile(0.5) - 5000.5) / 5000.5 < 0.01)
    assert(math.abs(a.quantile(0.99) - 9900.0) / 9900.0 < 0.01)
  }

  test("sketch works in a streaming aggregation (complete mode)") {
    val stream = graft.streaming.StreamingOps.eventsStream(spark, sf0001)
    val agg = stream.groupBy(col("event_type"))
      .agg(QuantileSketch.percentile_sketch(col("value"), 0.9).as("p90"))
    val out = graft.streaming.StreamingOps.runToBatch(spark, agg,
      s"sketch_${System.nanoTime()}")
    val got = out.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = Tables.events(spark, sf0001).groupBy(col("event_type"))
      .agg(percentile(col("value"), lit(0.9)).as("p90"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    got.foreach { case (k, v) =>
      assert(math.abs(v - exact(k)) / exact(k) < 0.02, s"$k: $v vs ${exact(k)}")
    }
  }
}
