package graft

import graft.functions.{FreqSketch, FreqSummary}
import org.apache.spark.sql.functions._

/** Misra-Gries heavy-hitters guarantees on the LOSSY path (cardinality
  * above k) plus mergeability across partitionings. */
class FreqSketchSpec extends SparkSpec {

  // skewed synthetic stream: one heavy item (30%), one medium (10%),
  // 500 distinct light items sharing the rest
  private def skewed: Seq[String] = {
    val n = 10000
    (0 until n).map { i =>
      if (i % 10 < 3) "heavy"
      else if (i % 10 == 3) "medium"
      else s"light_${i % 500}"
    }
  }

  test("driver-side summary: guarantees hold past the counter limit") {
    val s = FreqSummary(16)
    skewed.foreach(s.add(_))
    assert(s.counts.size <= 16)
    val top = s.top(5).toMap
    val bound = s.maxErr
    assert(bound <= s.n / (16 + 1) + 1, s"err bound $bound")
    // the 30% item survives 502 distinct keys through 16 counters
    assert(top.contains("heavy"))
    // estimate underestimates by at most the tracked bound
    val trueHeavy = skewed.count(_ == "heavy")
    assert(top("heavy") <= trueHeavy)
    assert(top("heavy") >= trueHeavy - bound)
  }

  test("distributed: merge across partitionings keeps the guarantees") {
    import spark.implicits._
    val df = skewed.toDF("item")
    for (parts <- Seq(1, 7, 32)) {
      val rows = df.repartition(parts)
        .agg(FreqSketch.freq_sketch(col("item"), k = 16, topM = 3).as("t"))
        .select(explode(col("t")).as("hh"))
        .select(col("hh.item"), col("hh.est"), col("hh.err_bound"))
        .collect()
      val byItem = rows.map(r =>
        r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(byItem.contains("heavy"), s"parts=$parts: ${byItem.keys}")
      val (est, bound) = byItem("heavy")
      val trueHeavy = skewed.count(_ == "heavy").toLong
      assert(est <= trueHeavy && est >= trueHeavy - bound,
        s"parts=$parts est=$est bound=$bound true=$trueHeavy")
      // merged bound stays within the additive mergeable-summaries limit
      assert(bound <= skewed.size / (16 + 1) * parts.toLong + parts,
        s"parts=$parts bound=$bound")
    }
  }

  test("exact when cardinality <= k: matches the full groupBy") {
    import spark.implicits._
    val df = Seq.tabulate(1000)(i => s"t${i % 5}").toDF("item")
    val sk = df.repartition(8)
      .agg(FreqSketch.freq_sketch(col("item"), k = 64).as("t"))
      .select(explode(col("t")).as("hh"))
      .select(col("hh.item"), col("hh.est"), col("hh.err_bound"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val exact = df.groupBy("item").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sk.foreach { case (item, est, bound) =>
      assert(bound === 0L)
      assert(est === exact(item))
    }
    assert(sk.length === 5)
  }
}
