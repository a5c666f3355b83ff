package graft.util

/** One process-wide ledger of per-process /tmp artifacts (ingest
  * fixtures, bucket tables, IVF indexes/pair dumps, inverted indexes)
  * with a single JVM shutdown hook deleting them all — instead of one
  * ad-hoc hook per module, or none. Callers [[register]] the path
  * BEFORE starting the write, so a JVM exit mid-build still cleans the
  * partial directory. Registration is idempotent and never deletes
  * during the run (oracle SQL and already-planned readers reference
  * these paths until exit). */
object TempArtifacts {
  private val paths = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  Runtime.getRuntime.addShutdownHook(new Thread(() =>
    paths.forEach { p =>
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(new java.io.File(p))
    }))

  /** Record `path` for deletion at JVM exit; returns it for chaining. */
  def register(path: String): String = {
    paths.add(path)
    path
  }

  /** Root for the small per-process artifacts above plus the
    * cross-process memo/index stores: tmpfs when the host offers one
    * (round 12 — the GraftSession `spark.local.dir` convention applied
    * to our own artifact I/O: java.io.tmpdir here is disk-backed ext4,
    * so every tiny parquet memo/fixture write paid file-system
    * journaling, and v25's 64-file fragmentation fixture paid it 64
    * times), else java.io.tmpdir unchanged. Cluster deployments never
    * see this path — these artifacts are local-mode scratch. */
  lazy val fastBase: String = {
    val shm = new java.io.File("/dev/shm")
    // Capacity probe (round-13 ADVICE): tmpfs is typically capped at
    // 50% of RAM, and the artifacts routed here include bucketed table
    // copies and stored indexes that grow with the bench SF. Demand
    // comfortable headroom (16 GiB ≫ the ×100 artifact budget measured
    // in SCALING.md) before preferring it, and honor an explicit
    // opt-out, so a constrained host degrades to the disk-backed
    // tmpdir instead of ENOSPC mid-run.
    val wantTmpfs = !sys.env.contains("SPARK_GRAFT_NO_TMPFS") &&
      shm.isDirectory && shm.canWrite &&
      shm.getUsableSpace >= (16L << 30)
    if (wantTmpfs) "/dev/shm" else sys.props("java.io.tmpdir")
  }
}
