package graft.util

import org.apache.spark.sql.DataFrame

/** Scale-adaptive scan spreading for heavy per-row pipelines.
  *
  * The driver testdata ships each table as ONE single-row-group parquet
  * file, so a scan plans exactly one task and everything fused into the
  * scan stage (the v7 family's PNG synth+decode `mapPartitions`) runs
  * on one core of however many the session has (guide §2.5: input
  * skew from an unsplittable file — "repartition immediately after the
  * read"). [[toCores]] inserts that repartition ONLY when the planned
  * scan has fewer tasks than the session's default parallelism, so at
  * deployment scale — where the input is thousands of row groups and
  * the scan already spreads — it is a no-op and no extra exchange is
  * paid. The round-robin exchange carries the NARROW pre-synth
  * projection (ids + lengths, not payloads), so the shuffle is a few
  * bytes per row; rows-to-partitions assignment is deterministic
  * (sort-before-repartition, Spark's default) and every downstream
  * per-row output is order-independent, so results are unchanged.
  */
object Spread {
  // The partition probe (df.rdd) compiles a separate physical plan per
  // invocation; the callers construct the SAME (table, dir) frame many
  // times per process, so the probed count is memoized per semantically
  // equal logical plan (round-13 ADVICE). The probe reflects the
  // pre-AQE scan split by design: it asks "can this INPUT spread on its
  // own", which is a property of the file layout, not of AQE coalescing.
  private val plannedParts =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Integer]()

  /** Repartition `df` round-robin to the session's default parallelism
    * iff its planned execution has fewer partitions than that — i.e.
    * iff the input cannot spread on its own. */
  def toCores(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val key = (System.identityHashCode(df.sparkSession),
      df.queryExecution.logical.semanticHash())
    val planned = plannedParts.computeIfAbsent(key,
      _ => Integer.valueOf(df.rdd.getNumPartitions))
    if (planned < target) df.repartition(target) else df
  }
}
