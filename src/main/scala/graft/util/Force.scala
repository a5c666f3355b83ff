package graft.util

import org.apache.spark.sql.DataFrame

/** Forces FULL computation of a plan and returns its row count — the
  * benchmark action [[graft.Bench]] and [[graft.ScaleBench]] time.
  *
  * `df.count()` is NOT a benchmark action: Catalyst rewrites the plan
  * UNDER the count aggregate — column pruning drops every computed
  * column (a map-only transform times as a metadata-only parquet
  * count), and the duplicate-agnostic-aggregate rules eliminate whole
  * operators (a left join whose right side is an aggregate keyed
  * unique on the join key vanishes entirely: the v50 SemDeDup family
  * "measured" 0.5 s at ×100 under count() while the actual pair work
  * — what Verify computes and DuckDB hash-checks — runs 174 s; found
  * round 12). Those rewrites are exactly what a user's `SELECT
  * count(*)` SHOULD get, but the bench's contract is the cost of the
  * query the driver hashes, not the cost of its cheapest
  * row-count-preserving abstraction.
  *
  * `queryExecution.toRdd` compiles the UNMODIFIED plan (no count on
  * top → no count-driven pruning or join elimination) and draining it
  * materializes every output column of every operator — Tungsten
  * builds complete UnsafeRows on `next()`, there is no per-column
  * laziness — with none of `collect()`'s driver transfer and none of
  * `Dataset.foreach`'s per-row Row deserialization. */
object Force {
  def rows(df: DataFrame): Long =
    df.queryExecution.toRdd.mapPartitions { it =>
      var n = 0L
      while (it.hasNext) { it.next(); n += 1 }
      Iterator.single(n)
    }.fold(0L)(_ + _)
}
