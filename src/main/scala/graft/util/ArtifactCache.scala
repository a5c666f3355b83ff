package graft.util

/** Once-per-(kind, dir) stored-artifact builder — THE index-build
  * idiom (previously copied as three private FutureTask caches in
  * RankOps/PqOps): `computeIfAbsent` only ALLOCATES the inert task,
  * the multi-stage Spark build runs outside the map's bin lock via
  * `FutureTask.run()` (a no-op for every caller but the first), paths
  * are pid+counter-suffixed (never a 32-bit hash — the round-3
  * fixture-clobber class) and registered for exit-time cleanup BEFORE
  * the build so a JVM kill cannot leak a partial directory. */
object ArtifactCache {
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (String, String), java.util.concurrent.FutureTask[String]]()
  private val seq = new java.util.concurrent.atomic.AtomicInteger()

  def cached(kind: String, dir: String)(build: String => Unit): String = {
    val task = cache.computeIfAbsent((kind, dir),
      _ => new java.util.concurrent.FutureTask(() => {
        val path = TempArtifacts.register(
          s"${sys.props("java.io.tmpdir")}/graft_${kind}_" +
            s"${ProcessHandle.current().pid()}_${seq.getAndIncrement()}")
        build(path)
        path
      }))
    task.run()
    try task.get()
    catch {
      case e: java.util.concurrent.ExecutionException =>
        // a failed build must not poison the key forever: evict so a
        // later caller retries (a fresh pid+seq path — the partial
        // directory is already registered for exit-time cleanup), and
        // surface the build's own exception, not the wrapper
        cache.remove((kind, dir), task)
        throw e.getCause
    }
  }

  /** Snapshot of a directory's parquet part files (path → length) —
    * the append-contract witness: a delta write must leave every base
    * file present byte-identical in place. */
  def parquetListing(root: String): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(root))
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getPath -> f.length()).toMap
  }
}
