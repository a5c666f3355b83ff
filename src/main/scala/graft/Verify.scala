package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    GraftSession.requiredConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // optional comma-separated substring filter for local iteration
    // (the driver never sets it: full dump)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').toSeq).getOrElse(Seq.empty)
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.isEmpty || only.exists(name.contains) }
    // Failures must be VISIBLE, not just absent: round 5's testdata schema
    // change broke every events-based entry, and because a failed entry
    // simply produced no dump, the driver's correctness report silently
    // shrank from 154 rows to 82 all-green ones. verify_errors.json makes
    // a skipped entry a first-class artifact the driver/judge can see.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = errors
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/verify_errors.json"), errJson)
    // mirror into the repo so the artifact survives even if the driver only
    // collects stdout + the named correctness file (path overridable so a
    // checkout elsewhere doesn't silently lose the mirror — best-effort
    // either way)
    try Files.writeString(Paths.get(sys.env.getOrElse(
      "SPARK_GRAFT_REPO_DIR", "/root/repo"), "VERIFY_ERRORS.json"), errJson)
    catch { case _: Throwable => () }
    spark.stop()
  }
}
