package graft

import org.apache.spark.sql.functions._

/** Diagnostic main for the st19 ledger-build scaling work (round 9) —
  * times each stage of the duplicated-window ledger at a given dir.
  * Not a registry entry; never run by the driver. */
object DiagLedger {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_blown10")
    val spark = GraftSession.local()
    def t[A](label: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"== $label: ${(System.nanoTime() - s) / 1e9}%.1f s"); r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), split(lower(col("text")), " ").as("w"))
    println("docs=" + t("docs count")(docs.count()))
    println("words=" + t("total words")(
      docs.agg(sum(size(col("w")))).first().getLong(0)))
    val W = 8
    val wins0 = docs.filter(size(col("w")) >= W)
      .select(col("doc_id"), col("w"),
        explode(sequence(lit(1), size(col("w")) - (W - 1))).as("s"))
      .select(col("doc_id"), col("s"),
        md5(array_join(slice(col("w"), col("s"), lit(W)), " ")).as("h"))
    println("windows=" + t("window explode+md5")(wins0.count()))
    val wins = wins0.groupBy(col("h"))
      .agg(min(col("doc_id")).as("keep_doc"), count(lit(1)).as("n_occ"))
      .filter(col("n_occ") >= 2).select(col("h"), col("keep_doc"))
    val l = t("wins agg")(wins.count())
    println(s"L=$l")
    val pfx = if (l <= 4096L) 2 else if (l <= 65536L) 3 else 4
    val nB = 1 << (4 * pfx)
    t("bucketed one-row build") {
      wins.withColumn("b",
          conv(substring(col("h"), 1, pfx), 16, 10).cast("int"))
        .groupBy(col("b")).agg(array_sort(collect_list(
          struct(col("h"), col("keep_doc")))).as("es"))
        .agg(map_from_entries(
          collect_list(struct(col("b"), col("es")))).as("m"))
        .withColumn("dupB", transform(sequence(lit(0), lit(nB - 1)), b =>
          coalesce(element_at(col("m"), b.cast("int")),
            array().cast("array<struct<h:string,keep_doc:bigint>>"))))
        .select(col("dupB")).collect()
    }
    spark.stop()
  }
}

/** Second diagnostic: time the IN-ROW scrub pieces (st19's spelling)
  * over a dir, batch-side, stage by stage. */
object DiagInRow {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_blown10")
    val spark = GraftSession.local()
    def t[A](label: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"== $label: ${(System.nanoTime() - s) / 1e9}%.1f s"); r
    }
    val docs0 = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("text").isNotNull)
      .repartition(32)
      .select(col("doc_id"), split(lower(col("text")), " ").as("w"))
    t("scan+split only")(docs0.agg(sum(size(col("w")))).first())
    val bc = t("ledger build+broadcast")(
      graft.dedup.DiagSeam.ledgerBroadcast(spark, dir))
    val sr = docs0.withColumn("sr",
      graft.functions.ScrubFunctions.scrub_report(
        col("w"), col("doc_id"), bc, 8))
      .select(col("sr.n_removed"))
    t("scrub_report full")(sr.agg(sum(col("n_removed"))).first())
    t("scrub_report again")(sr.agg(sum(col("n_removed"))).first())
    spark.stop()
  }
}
