package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join utility for 100 TB runs: salted equi-join.
  *
  * AQE's skew-join split (on by default in [[graft.GraftSession]]) handles
  * most skew at runtime; salting is the static fallback when one hot key
  * dominates a shuffle so badly that even split partitions overflow (the
  * classic hot-trace / hot-user case for the dependency self-join C1 and
  * the sessionization shuffle V6).
  *
  * The build side explodes each row into `saltBuckets` copies keyed by
  * (key, salt); the probe side tags each row with a random-but-
  * deterministic salt derived from a high-cardinality column, so the hot
  * key's rows spread across `saltBuckets` reducers.
  */
object Skew {
  /** Salted inner equi-join of `probe` and `build` on `key`.
    * `probeSaltSource` must be a high-cardinality probe-side column
    * (e.g. an id) — salt is derived from it deterministically so results
    * are reproducible. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      probeSaltSource: Column, saltBuckets: Int = 8): DataFrame = {
    // the working column must not clobber caller data: a pre-existing
    // __salt (e.g. a previous salted stage that kept it) would be
    // overwritten and then silently DROPPED (round-10 review)
    require(!probe.columns.contains("__salt") &&
      !build.columns.contains("__salt"),
      "saltedJoin inputs must not already carry a __salt column")
    val salted = probe.withColumn("__salt",
      pmod(hash(probeSaltSource), lit(saltBuckets)))
    val exploded = build.withColumn("__salt",
      explode(array((0 until saltBuckets).map(lit): _*)))
    salted.join(exploded, Seq(key, "__salt")).drop("__salt")
  }
}
