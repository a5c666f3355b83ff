package graft

import graft.functions.VectorFunctions.dot_product
import org.apache.spark.sql.functions._

/** Custom Catalyst expression semantics: interpreted + codegen paths,
  * null handling, length mismatch. */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("dot_product equals the composed zip_with/aggregate form") {
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.5, -0.5), Seq(2.0, 2.0))).toDF("a", "b")
    val got = df.select(dot_product(col("a"), col("b"))).collect()
      .map(_.getDouble(0)).toSeq
    val ref = df.select(aggregate(zip_with(col("a"), col("b"),
      (x, y) => x * y), lit(0.0), (acc, x) => acc + x)).collect()
      .map(_.getDouble(0)).toSeq
    assert(got === ref)
    assert(got === Seq(32.0, 0.0))
  }

  test("dot_product: null input -> null, shorter array bounds the loop") {
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0))),
      (None: Option[Seq[Double]], Some(Seq(1.0)))).toDF("a", "b")
    val rows = df.select(dot_product(col("a"), col("b"))).collect()
    assert(rows(0).getDouble(0) === 3.0)
    assert(rows(1).isNullAt(0))
  }

  test("FuseDotProduct rule rewrites the composed HOF form") {
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
      .select(aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("dot"))
    val classic = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    val before = classic.queryExecution.analyzed
    val after = graft.plans.FuseDotProduct(before)
    def hasDot(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      p.expressions.exists(_.exists(
        _.isInstanceOf[graft.functions.DotProduct]))
    assert(!hasDot(before))
    assert(hasDot(after), s"rule did not fire on:\n$before")
  }

  test("FuseDotProduct leaves non-matching aggregates alone") {
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
      .select(aggregate(zip_with(col("a"), col("b"), (x, y) => x + y),
        lit(0.0), (acc, x) => acc + x).as("notdot"))
    val classic = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    val after = graft.plans.FuseDotProduct(classic.queryExecution.analyzed)
    assert(!after.expressions.exists(_.exists(
      _.isInstanceOf[graft.functions.DotProduct])))
  }

  test("simhash64: majority bit votes with ties set") {
    import graft.functions.SimHashFunctions.simhash64
    val df = Seq(
      Seq(1L, 1L, 2L),       // bit0: 2/3 set -> 1; bit1: 1/3 -> 0
      Seq(3L, 0L),           // ties (1/2) count as set -> bits 0,1 set
      Seq.empty[Long]).toDF("hs")
    val got = df.select(simhash64(col("hs"))).collect().map(_.getLong(0))
    assert(got(0) === 1L)
    assert(got(1) === 3L)
    // empty array: every count ties at 0*2 >= 0 -> all bits set (documented)
    assert(got(2) === -1L)
  }

  test("dot_product rejects non-double arrays at analysis time") {
    val df = Seq((Seq(1, 2), Seq(3, 4))).toDF("a", "b")
    intercept[Exception] {
      df.select(dot_product(col("a"), col("b"))).collect()
    }
  }
}
