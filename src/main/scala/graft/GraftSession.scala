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
  def local(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
            appName: String = "graft"): SparkSession = {
    // oracle-parity confs come from THE one list below (Verify/Bench
    // iterate it too) — local() previously re-hardcoded them inline,
    // so a conf added to requiredConfs took effect on the grading
    // path but silently not on local()-built sessions (round-10
    // review); only session-specific extras are spelled here
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft-warehouse")
      .config("spark.ui.enabled", "false")
    requiredConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Configs to apply when someone else builds the session (Verify/Bench).
    * `spark.sql.extensions` is a static conf, so the custom SQL functions
    * and the FuseDotProduct optimizer rule install on EVERY graft
    * session, not just test sessions that register them by hand. */
  val requiredConfs: Map[String, String] = Map(
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.extensions" -> "graft.GraftExtensions") ++
    // Shuffle/broadcast/block-manager scratch on tmpfs when the host
    // offers one (the streaming drives' shmCheckpointRoot discipline,
    // applied to batch): java.io.tmpdir here is disk-backed ext4, so
    // every shuffle map output paid file-system journaling that a
    // local-mode run never needs durable. Spark creates and removes
    // its own blockmgr-*/spark-* subdirs; the pid suffix keeps
    // concurrent graft processes (driver + builder) apart. Cluster
    // deployments set their own spark.local.dir — this only fills the
    // local-mode default.
    (if (new java.io.File("/dev/shm").canWrite)
      Map("spark.local.dir" -> graft.util.TempArtifacts.register(
        s"/dev/shm/graft_local_${ProcessHandle.current().pid()}"))
    else Map.empty[String, String])

  /** Query timeout — the analog of the reference's ClickHouse
    * `max_execution_time: 60` ceiling (db/clickhouse.go:20-22): run the
    * action in a job group and cancel the group when the deadline
    * passes. Returns None on timeout. */
  def runWithTimeout[T](spark: SparkSession, timeoutSeconds: Long,
      groupId: String)(action: => T): Option[T] = {
    val sc = spark.sparkContext
    sc.setJobGroup(groupId, s"graft timeout ${timeoutSeconds}s",
      interruptOnCancel = true)
    val canceller = new Thread(() => {
      try {
        Thread.sleep(timeoutSeconds * 1000)
        // AndFutureJobs: an AQE query runs one job per stage, and a
        // deadline firing BETWEEN stage jobs would make the plain
        // cancelJobGroup a no-op — the remaining stages then run
        // arbitrarily past the ceiling (round-10 review)
        sc.cancelJobGroupAndFutureJobs(groupId)
      } catch { case _: InterruptedException => () }
    })
    canceller.setDaemon(true)
    canceller.start()
    // cancellation can surface WRAPPED (awaitResult and friends put
    // the cancelled job in the cause chain) — walk it instead of
    // trusting the top message
    def cancelled(t: Throwable, depth: Int = 8): Boolean =
      t != null && depth > 0 &&
        ((t.isInstanceOf[org.apache.spark.SparkException] &&
          t.getMessage != null && t.getMessage.contains("cancelled")) ||
          cancelled(t.getCause, depth - 1))
    try Some(action)
    catch { case e: Throwable if cancelled(e) => None }
    finally {
      canceller.interrupt()
      sc.clearJobGroup()
    }
  }
}
