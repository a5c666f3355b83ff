package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.dedup.DedupOps
import graft.mm.MultimodalOps
import graft.nlp.{CurationDagOps, MixOps, ProbeOps, RankOps, RankQaOps,
  ScoreQaOps, TextOps}
import graft.sim.{ClusterOps, FusionOps, PcaOps, PqOps, SimilarityOps}
import graft.sources.SourceOps
import graft.streaming.StreamingOps

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every operator from SURVEY.md §2 registers one [[GraftQuery]] in a
  * [[QueryModule]]; this object is just the assembly point.
  */
object SparkEntry {
  private def modules: Seq[QueryModule] = Seq(
    Relational, EventOps, SeriesOps, SearchOps, IngestOps, SessionOps,
    SpanNativeOps, LayoutOps, JoinOps, CdcOps, OlapOps, GraphOps, StatsOps,
    QualityOps, SourceOps,
    TextOps, RankOps, MixOps, ScoreQaOps, RankQaOps, CurationDagOps,
    ProbeOps, DedupOps, SimilarityOps,
    ClusterOps, PqOps, FusionOps, PcaOps,
    MultimodalOps,
    StreamingOps)

  /** All registered operators, in module order. */
  def all: Seq[GraftQuery] = modules.flatMap(_.queries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * D1/T4 grouped-percentile aggregation (SURVEY §7 PR 1). */
  def entry(spark: SparkSession): DataFrame =
    Relational.endpointLatencies(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.id -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.id -> _)).toMap
}
