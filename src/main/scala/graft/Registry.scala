package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine operator.
  *
  * @param id     stable key, referenced from SURVEY.md §2 coverage table
  * @param doc    one-line description + reference citation (file:line)
  * @param run    (session, testdata dir) => result DataFrame. Results must be
  *               deterministic: every ORDER BY carries a unique tie-breaker,
  *               float outputs are rounded, aggregates over doubles go through
  *               [[Exact]] decimal-exact summation so partition order cannot
  *               change the result.
  * @param oracle equivalent DuckDB SQL over the same parquet tables (bare
  *               table names, e.g. `FROM lineitem`). None => the driver
  *               records a weaker rows-only check (non-SQL-expressible ops).
  */
final case class GraftQuery(
    id: String,
    doc: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

trait QueryModule {
  def queries: Seq[GraftQuery]
}
