package graft

import graft.functions.{DotProduct, ShingleHashes, ShingleStrings,
  SimHash64, ZValue}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's custom Catalyst
  * expressions as SQL functions, so `spark.sql("SELECT dot_product(a,b)")`
  * works next to the Column API. Install with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  * ([[graft.functions.MarkerCounts]] stays Column-API-only: its
  * dictionary set is constructor config, not an expression child.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(name: String, clazz: Class[_],
      build: Seq[Expression] => Expression) =
    (new FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name),
      build)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(fn("dot_product", classOf[DotProduct],
      c => DotProduct(c(0), c(1))))
    ext.injectFunction(fn("simhash64", classOf[SimHash64],
      c => SimHash64(c(0))))
    ext.injectFunction(fn("shingle_hashes", classOf[ShingleHashes],
      c => ShingleHashes(c(0))))
    ext.injectFunction(fn("shingle_strings", classOf[ShingleStrings],
      c => ShingleStrings(c(0))))
    ext.injectFunction(fn("z_value", classOf[ZValue],
      c => ZValue(c(0), c(1))))
    // rewrite composed aggregate(zip_with(a,b,*),0,+) into the fused kernel
    ext.injectOptimizerRule(_ => graft.plans.FuseDotProduct)
  }
}
