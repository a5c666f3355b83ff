package graft

import org.apache.spark.sql.SparkSession

/** SQL-surface convenience: register every testdata table (plus the
  * µs/s-derived events view) as temp views so users can drive the engine
  * with `spark.sql(...)` next to the DataFrame API.
  */
object GraftCatalog {
  def registerViews(spark: SparkSession, dir: String): Unit = {
    Tables.names.foreach { n =>
      Tables.table(spark, dir, n).createOrReplaceTempView(n)
    }
    Tables.events(spark, dir).createOrReplaceTempView("events_ts")
  }
}
