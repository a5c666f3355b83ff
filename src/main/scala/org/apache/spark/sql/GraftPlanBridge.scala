package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway a whole-operator extension needs:
  * `Dataset.ofRows` (the constructor every built-in DataFrame method
  * funnels through) is package-private, so wrapping a custom
  * [[LogicalPlan]] — e.g. [[graft.plans.TopKPerKey]] — into a user-facing
  * DataFrame requires this one-line bridge in the `org.apache.spark.sql`
  * package. Standard practice for Spark extension libraries; nothing
  * else in graft lives outside the `graft` namespace, and no Spark
  * internals are modified — this only re-exports a constructor.
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
