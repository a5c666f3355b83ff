package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Determinism helpers for double aggregation.
  *
  * Spark's partial (map-side) aggregation sums doubles in partition order,
  * which is nondeterministic and drifts from DuckDB's sequential sum by a
  * few ulps — enough to flip a rounded 6th decimal on large sums. Routing
  * the sum through DecimalType(18,6) makes it exact and order-independent
  * in BOTH engines; the final cast back to double is then bit-identical.
  * The matching oracle-SQL shapes live in [[OracleSql]].
  */
object Exact {
  /** Order-independent exact sum of a double column, returned as double. */
  def sumExact(c: Column): Column =
    sum(c.cast(DecimalType(18, 6))).cast(DoubleType)

  /** Deterministic mean: exact decimal sum / count, rounded to 6 decimals. */
  def avgExact(c: Column): Column =
    round(sumExact(c) / count(lit(1)), 6)

  /** Unrounded deterministic mean (for use inside further arithmetic that
    * must match the oracle formula shape exactly). */
  def avgExactRaw(c: Column): Column = sumExact(c) / count(lit(1))
}

/** The DuckDB-side spellings of the [[Exact]] aggregates, for oracle SQL. */
object OracleSql {
  /** round(<exact decimal sum of col>, 6) as double */
  def sumExact(col: String): String =
    s"CAST(sum(CAST($col AS DECIMAL(18,6))) AS DOUBLE)"
  def avgExact(col: String): String =
    s"round(${sumExact(col)}/count(*), 6)"
  def avgExactRaw(col: String): String =
    s"${sumExact(col)}/count(*)"
}
