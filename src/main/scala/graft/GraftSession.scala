package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the configs every graft entry point (Verify, Bench,
  * tests) needs. Mirrors the reference's fixed runtime knobs
  * (reference db/clickhouse.go:13-27 — timeouts/compression are ClickHouse's;
  * our equivalents are Spark conf) and the oracle-parity requirements:
  * UTC session, ns-as-long parquet reads, shuffle partitions sized to cores
  * rather than the 200 default.
  */
object GraftSession {
  def local(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"),
            appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Configs to apply when someone else builds the session (Verify/Bench). */
  val requiredConfs: Map[String, String] = Map(
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.legacy.parquet.nanosAsLong" -> "true")
}
