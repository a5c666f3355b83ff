package graft.util

/** Once-per-process side-effect guard for the registry entries that
  * materialize a fixture/index/layout under a pid-suffixed tmp path and
  * then reference it from static oracle SQL: the write must happen
  * exactly once per process (a second `mode("overwrite")` write swaps
  * part-file names under already-planned readers — the round-3
  * ContractSpec FILE_NOT_EXIST failure), and every caller in one
  * process must ask for the SAME source data dir, or the artifact would
  * silently describe different data than the caller assumes (every
  * runner — Verify, Bench, the test JVM — uses a single SF per
  * process).
  *
  * @param what label for the per-process violation message
  */
final class OncePerProcess(what: String) {
  @volatile private var writtenFor: String = null

  /** Run `write` iff nothing ran yet this process; then require every
    * call (first included) agrees on `dir`. */
  def ensure(dir: String)(write: => Unit): Unit = {
    if (writtenFor == null) synchronized {
      if (writtenFor == null) {
        write
        writtenFor = dir
      }
    }
    require(writtenFor == dir,
      s"$what is per-process: written from $writtenFor, now asked for $dir")
  }
}
