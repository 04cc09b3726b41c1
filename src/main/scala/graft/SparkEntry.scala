package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are grouped per operator family under [[graft.queries]];
  * each family exposes a `queries` map and a column-aligned DuckDB
  * `oracles` map. Names are stable: `qNN_<operator>`.
  */
object SparkEntry {

  private val batches: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (RelationalQueries.queries, RelationalQueries.oracles),
      (MatchingQueries.queries, MatchingQueries.oracles),
      (TextQueries.queries, TextQueries.oracles),
      (VectorQueries.queries, VectorQueries.oracles),
      (EventQueries.queries, EventQueries.oracles),
      (DedupQueries.queries, DedupQueries.oracles),
      (ScalarQueries.queries, ScalarQueries.oracles),
      (ParityQueries.queries, ParityQueries.oracles),
      (MlQueries.queries, MlQueries.oracles),
      (MiscQueries.queries, MiscQueries.oracles),
      (SourceQueries.queries, SourceQueries.oracles),
      (NlpQueries.queries, NlpQueries.oracles),
      (PipelineQueries.queries, PipelineQueries.oracles),
    )

  /** Flagship: full entity-matching pipeline on sf0.001 (candidates →
    * scores → filters → normalisation); driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    MatchingQueries.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    batches.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → rows-only check. */
  def oracleSql: Map[String, String] =
    batches.map(_._2).reduce(_ ++ _)
}
