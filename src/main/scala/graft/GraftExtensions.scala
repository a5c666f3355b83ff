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
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    // rewrite composed aggregate(zip_with(a,b,*),0,+) into the fused kernel
    ext.injectOptimizerRule(_ => graft.plans.FuseDotProduct)
    // plan the native per-key top-k node (partial/final heap passes)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
  }
}

object GraftExtensions {
  type FunctionDescription = (FunctionIdentifier, ExpressionInfo,
    Seq[Expression] => Expression)

  private def fn(name: String, clazz: Class[_], arity: Int,
      build: Seq[Expression] => Expression): FunctionDescription =
    (new FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name),
      (c: Seq[Expression]) => {
        if (c.length != arity) throw new IllegalArgumentException(
          s"$name expects $arity argument(s), got ${c.length}")
        build(c)
      })

  /** The injected SQL function suite — public so tests (and alternative
    * registration paths) drive the SAME builders `apply` injects. */
  val functions: Seq[FunctionDescription] = Seq(
    fn("dot_product", classOf[DotProduct], 2, c => DotProduct(c(0), c(1))),
    fn("simhash64", classOf[SimHash64], 1, c => SimHash64(c(0))),
    fn("shingle_hashes", classOf[ShingleHashes], 1,
      c => ShingleHashes(c(0))),
    fn("shingle_strings", classOf[ShingleStrings], 1,
      c => ShingleStrings(c(0))),
    fn("z_value", classOf[ZValue], 2, c => ZValue(c(0), c(1))))
}
