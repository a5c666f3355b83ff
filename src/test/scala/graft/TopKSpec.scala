package graft

import graft.plans.TopKPerKey
import org.apache.spark.sql.functions._

/** The native per-key top-k operator (plans/TopKPerKey.scala): result
  * equivalence against the window form, the plan shape it exists for
  * (no sort, one exchange, heap passes on both sides of it), and the
  * heap edge cases. */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def execPlan(df: org.apache.spark.sql.DataFrame): String =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.toString

  test("v8b native cap == v8 window cap, row for row") {
    val a = nlp.TextOps.perSourceCap(spark, sf0001).collect().toSeq
    val b = nlp.TextOps.perSourceCapNative(spark, sf0001).collect().toSeq
    assert(a === b)
  }

  test("the native plan has heap passes astride ONE exchange — " +
    "no Sort, no rank column, no WindowGroupLimit below it") {
    val df = TopKPerKey.topK(
      Tables.documents(spark, sf0001).select(col("source"), col("doc_id")),
      Seq("source"), Seq("doc_id"), 20)
    df.collect() // let AQE finalize
    // AQE's toString repeats the tree under "== Initial Plan ==" —
    // assert on the finalized section only
    val p = execPlan(df).split("== Initial Plan ==").head
    assert(p.contains("TopKPerKeyPartial"), p)
    assert(p.contains("TopKPerKeyFinal"), p)
    assert(p.sliding("TopKPerKeyPartial".length).count(
      _ == "TopKPerKeyPartial") == 1, p)
    assert(!p.contains("Sort ["), p)
    assert(!p.contains("WindowGroupLimit"), p)
    assert(!p.contains("row_number"), p)
    // exactly one shuffle: partial output -> clustered final
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1, p)
    assert("Exchange".r.findAllIn(p).length == 1, p)
  }

  test("v45 hard negatives ride the native operator: TopKPerKey in the " +
    "plan, and the window only ranks the k*labels survivors") {
    val df = sim.SimilarityOps.hardNegatives(spark, sf0001)
    df.collect()
    val p = execPlan(df).split("== Initial Plan ==").head
    assert(p.contains("TopKPerKeyPartial"), p)
    assert(p.contains("TopKPerKeyFinal"), p)
    // the rank window exists but sits ABOVE the final heap — the full
    // candidate fan-out never reaches a sort
    assert(p.indexOf("Window") < p.indexOf("TopKPerKeyFinal"), p)
  }

  test("v48 stratified sample rides the native operator and keeps " +
    "exactly n per stratum") {
    val df = nlp.MixOps.stratifiedSample(spark, sf0001)
    val rows = df.collect()
    val p = execPlan(df).split("== Initial Plan ==").head
    assert(p.contains("TopKPerKeyFinal"), p)
    val perSource = rows.groupBy(_.getString(0)).values.map(_.length)
    assert(perSource.forall(_ == nlp.MixOps.StratumSampleN))
  }

  test("k larger than every group keeps all rows") {
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("k", "v")
    val got = TopKPerKey.topK(df, Seq("k"), Seq("v"), 100)
      .orderBy("k", "v").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === Seq(("a", 1L), ("a", 2L), ("b", 3L)))
  }

  test("keeps exactly the k smallest per key under any partitioning") {
    val rows = for (k <- 'a' to 'e'; v <- 1L to 97L) yield (k.toString, v)
    val scrambled = scala.util.Random.shuffle(rows).toDF("k", "v")
      .repartition(13)
    val got = TopKPerKey.topK(scrambled, Seq("k"), Seq("v"), 5)
      .orderBy("k", "v").collect().map(r => (r.getString(0), r.getLong(1)))
    val want = for (k <- 'a' to 'e'; v <- 1L to 5L) yield (k.toString, v)
    assert(got.toSeq === want)
  }

  test("a NULL key is its own group, like groupBy") {
    val df = Seq((Some("a"), 1L), (None, 2L), (None, 3L), (None, 4L))
      .toDF("k", "v")
    val got = TopKPerKey.topK(df, Seq("k"), Seq("v"), 2)
      .collect().map(r => (Option(r.getString(0)), r.getLong(1))).toSet
    assert(got === Set((Some("a"), 1L), (None, 2L), (None, 3L)))
  }

  test("empty input stays empty; k <= 0 is rejected at construction") {
    val df = Seq.empty[(String, Long)].toDF("k", "v")
    assert(TopKPerKey.topK(df, Seq("k"), Seq("v"), 3).collect().isEmpty)
    intercept[IllegalArgumentException] {
      TopKPerKey.topK(df, Seq("k"), Seq("v"), 0)
    }
    intercept[IllegalArgumentException] {
      TopKPerKey.topK(df, Seq("nope"), Seq("v"), 3)
    }
  }

  test("multi-column ordering ranks lexicographically") {
    val df = Seq(("a", 2L, 1L), ("a", 1L, 9L), ("a", 1L, 3L), ("a", 3L, 0L))
      .toDF("k", "v1", "v2")
    val got = TopKPerKey.topK(df, Seq("k"), Seq("v1", "v2"), 2)
      .orderBy("v1", "v2").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 3L), (1L, 9L)))
  }
}
