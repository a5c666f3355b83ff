package graft.nlp

import graft._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data assembly operators over the `documents` table: the two
  * steps that sit between a curated corpus (V13) and a training run —
  * choosing HOW MUCH of each source to take (V14, the mix) and laying
  * the chosen documents out into context-window-sized units (V15,
  * packing). Neither exists in the reference (its pipeline ends at
  * queries); both are standard large-corpus pipeline stages and both
  * are expressed as single-window plans so the oracle can recompute
  * them exactly.
  *
  * Scale design: every operator here is one shuffle on `source` (the
  * natural pipeline partitioning — at 100 TB a source is itself
  * partitioned, and the same plan runs per source-shard with the window
  * key extended by the shard id). No driver-side state, no collect, no
  * UDFs — plain window + aggregate plans that AQE can size.
  */
object MixOps extends QueryModule {

  // ---- V14: deterministic stratified sample mix ----

  /** Per-source sampling fraction: source srcN takes weight 2^-(N mod 4)
    * — i.e. 1, 1/2, 1/4, 1/8 — standing in for the "mix weights" table
    * a real training-data pipeline attaches to its sources. */
  private def mixExp: Column =
    pmod(expr("CAST(substring(source, 4) AS INT)"), lit(4))

  /** V14: deterministic stratified mix — take ceil(frac_g · n_g) docs
    * from each source, chosen in a pseudorandom-but-engine-agnostic
    * order (md5 of a salted doc id, unique-keyed by doc_id). The usual
    * `sample()`/`sampleBy()` draw is seeded RNG — irreproducible across
    * engines and unstable under repartitioning; hash-order selection
    * gives the same sample on ANY engine at ANY parallelism, which is
    * what makes a training mix auditable. One shuffle on source; the
    * row_number window and the count are the same partitioning. */
  def sampleMix(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(md5(concat(lit("mix"), col("doc_id").cast("string"))),
        col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), mixExp.as("m"))
      .withColumn("rk", row_number().over(w))
      .withColumn("n_g", count(lit(1)).over(Window.partitionBy(col("source"))))
      .filter(col("rk") <=
        ceil(col("n_g") * pow(lit(2.0), -col("m"))).cast("long"))
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))
  }

  private val sampleMixSql: String =
    """WITH s AS (
      | SELECT doc_id, source,
      |  CAST(substr(source, 4) AS INT) % 4 AS m,
      |  row_number() OVER (PARTITION BY source
      |    ORDER BY md5('mix' || CAST(doc_id AS VARCHAR)), doc_id) AS rk,
      |  count(*) OVER (PARTITION BY source) AS n_g
      | FROM documents)
      |SELECT doc_id, source FROM s
      |WHERE rk <= ceil(n_g * power(2.0, -m))
      |ORDER BY doc_id""".stripMargin

  // ---- V15: context-window token packing ----

  /** Tokens per pack — the "context window" the packer fills. */
  val PackTokens = 256

  /** V15: sequence packing — lay each source's documents end-to-end in
    * doc_id order and cut packs every [[PackTokens]] whitespace tokens:
    * a document belongs to the pack its FIRST token falls in (streaming
    * fill — a straddling document is not split, so a pack can overrun
    * by less than one document; the bin-packing variant that reorders
    * documents for tighter fill is not reproducible incrementally,
    * which is why production packers stream-fill too). Null text packs
    * as 0 tokens. One window (running sum per source, framed to
    * PRECEDING rows so the current document's own length cannot move
    * it) + one aggregation on the same key. */
  def tokenPacking(spark: SparkSession, dir: String): DataFrame = {
    val toks = when(col("text").isNotNull,
      size(split(lower(col("text")), " "))).otherwise(0)
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), toks.cast("long").as("toks"))
      .withColumn("cum", coalesce(sum(col("toks")).over(w), lit(0L)))
      .withColumn("pack_id",
        floor(col("cum") / lit(PackTokens.toDouble)).cast("long"))
      .groupBy(col("source"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).as("pack_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("source"), col("pack_id"))
  }

  private val tokenPackingSql: String =
    s"""WITH d AS (
       | SELECT source, doc_id,
       |  CAST(coalesce(len(string_split(lower(text), ' ')), 0) AS BIGINT)
       |    AS toks
       | FROM documents),
       |c AS (
       | SELECT source, doc_id, toks,
       |  CAST(coalesce(sum(toks) OVER (PARTITION BY source ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |    AS cum
       | FROM d)
       |SELECT source, CAST(floor(cum / ${PackTokens}.0) AS BIGINT) AS pack_id,
       | CAST(count(*) AS BIGINT) AS n_docs,
       | CAST(sum(toks) AS BIGINT) AS pack_tokens,
       | min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM c GROUP BY source, pack_id
       |ORDER BY source, pack_id""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("v14_sample_mix",
      "V14 deterministic stratified mix: per-source fraction 2^-(N%4), " +
        "hash-order selection (engine- and parallelism-independent " +
        "sample, unlike seeded RNG)",
      sampleMix, Some(sampleMixSql)),
    GraftQuery("v15_token_packing",
      s"V15 sequence packing: stream-fill docs into $PackTokens-token " +
        "packs per source (running-sum window; straddlers stay whole)",
      tokenPacking, Some(tokenPackingSql)))
}
