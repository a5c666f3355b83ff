package graft.util

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic scale blow-up of the hot tables (documents / embeddings /
  * events) for measured scale evidence — the round-8 verdict's gap #2:
  * every "designed for 100 TB" claim was verified at sf0.1 only, so
  * nothing demonstrated the scaling EXPONENT. `blowUp` writes a
  * ×factor copy of a testdata dir where each copy k is made DISTINCT
  * (salted), so duplicate/near-duplicate density and join hit-rates
  * stay constant and a heavy entry's work should scale ≈ linearly in
  * factor — exactly the property ScaleSpec pins (on deterministic work
  * counts) and ScaleBench measures (wall-clock, SCALING.md).
  *
  * Salting, per copy k (k = 0 is the identity copy):
  *  - documents: every word gets a `~k` suffix — every shingle/window
  *    hash differs across copies (constant dup density for exact,
  *    MinHash, SimHash, winnowing AND span-scrub ledgers), while word
  *    counts and length distributions are preserved. doc_id offset by
  *    k·1e8.
  *  - embeddings: the vector is ROTATED by k positions, composed (for
  *    k >= 64, where the rotation would repeat) with a deterministic
  *    per-group sign flip of ~half the coordinates — norm and
  *    coordinate distribution preserved, but copies are not mutual
  *    near-neighbours at ANY factor, so ANN candidate density stays
  *    constant. vec_id offset by k·1e8.
  *  - events: event_id/user_id offset by k·1e12/1e9 — user cardinality
  *    scales with the corpus (sessionization, per-user state and
  *    group-bys see ×factor KEYS, not ×factor rows per key); the time
  *    axis is left alone, matching a deployment whose traffic grows at
  *    constant history length.
  *
  * Every blown table is written as a SINGLE parquet file named
  * `<table>.parquet` (the testdata convention — the streaming entries
  * glob on exactly that leaf name); the seven cold tables are
  * hardlinked from the source dir unchanged. */
object ScaleData {

  def blowUp(spark: SparkSession, srcDir: String, outDir: String,
      factor: Int): String = {
    require(factor >= 1, s"factor $factor")
    val out = new java.io.File(outDir)
    java.nio.file.Files.createDirectories(out.toPath)

    def salted(table: String)(salt: (DataFrame, Int) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$srcDir/$table.parquet")
      val all = (0 until factor)
        .map(k => salt(base, k))
        .reduce(_ unionByName _)
      writeSingleFile(all, s"$outDir/$table.parquet")
    }

    salted("documents") { (d, k) =>
      d.select(
        (col("doc_id") + lit(k.toLong * 100000000L)).as("doc_id"),
        (if (k == 0) col("text")
         else array_join(transform(split(col("text"), " "),
           w => concat(w, lit(s"~$k"))), " ")).as("text"),
        col("lang"), col("source"),
        (if (k == 0) col("n_chars")
         else length(array_join(transform(split(col("text"), " "),
           w => concat(w, lit(s"~$k"))), " ")).cast("long")).as("n_chars"))
    }
    salted("embeddings") { (e, k) =>
      val d = size(col("embedding"))
      val r = pmod(lit(k), d)
      val rotated =
        if (k == 0) col("embedding")
        else concat(
          slice(col("embedding"), r + lit(1), d - r),
          slice(col("embedding"), lit(1), r))
      // The rotation repeats every D copies (k and k+D rotate
      // identically, D = 64 in the testdata), so beyond k >= 64 it is
      // composed with a deterministic pseudo-random SIGN pattern keyed
      // by the copy group g = k/64: coordinate i is negated iff
      // murmur3(g, i) is odd. Norm and coordinate distribution are
      // preserved; copies in different groups have expected cosine ~0
      // (about half the coordinates flip), so the "copies are not
      // mutual near-neighbours / constant ANN density" invariant holds
      // at every factor, not just factor <= 64. Copies 1..63 keep the
      // pure rotation so the pinned ScaleSpec x8 work counts and all
      // prior <=x10 measurements are unchanged.
      val g = k / 64
      val vec =
        if (g == 0) rotated
        else transform(rotated,
          (x, i) => when(pmod(hash(lit(g), i), lit(2)) === lit(1),
            negate(x)).otherwise(x))
      e.select(
        (col("vec_id") + lit(k.toLong * 100000000L)).as("vec_id"),
        vec.as("embedding"),
        col("label"))
    }
    salted("events") { (ev, k) =>
      ev.select(
        (col("event_id") + lit(k.toLong * 1000000000000L)).as("event_id"),
        col("ts"),
        (col("user_id") + lit(k.toLong * 1000000000L)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }

    Tables.names.filterNot(
        Seq("documents", "embeddings", "events").contains).foreach { t =>
      val dst = java.nio.file.Paths.get(outDir, s"$t.parquet")
      if (!java.nio.file.Files.exists(dst))
        java.nio.file.Files.createLink(
          dst, java.nio.file.Paths.get(srcDir, s"$t.parquet")): Unit
    }
    outDir
  }

  /** Write `df` as ONE parquet file at exactly `destFile` (the testdata
    * single-file layout the streaming glob readers require). */
  private def writeSingleFile(df: DataFrame, destFile: String): Unit = {
    val tmp = s"${destFile}_tmpdir"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet"))
      .getOrElse(sys.error(s"no part file under $tmp"))
    val dest = java.nio.file.Paths.get(destFile)
    java.nio.file.Files.deleteIfExists(dest)
    java.nio.file.Files.move(part.toPath, dest): Unit
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(new java.io.File(tmp))
  }
}
