package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (and the scale
  * extensions) is exposed as a named query over the driver testdata
  * dir, with a DuckDB-runnable oracle where the semantics are
  * SQL-expressible (otherwise the driver records a rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Gold-mart shape: fact ⟕ dim ⟕ dim with grouped SUM (SURVEY §7.2). */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.q19GoldChargeSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2, plus the
    * LLM-data-pipeline extension surface (dedup / ANN / text stats /
    * multimodal). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.defs ++ graft.queries.GoldMarts.defs ++
      graft.queries.LlmPipeline.defs ++ graft.queries.NearDup.defs ++
      graft.queries.EventAnalytics.defs ++ graft.queries.Analytics.defs ++
      graft.queries.Profiling.defs ++ graft.queries.Curation.defs ++
      graft.queries.Graph.defs ++ graft.queries.Relevance.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++ graft.queries.GoldMarts.oracles ++
      graft.queries.LlmPipeline.oracles ++ graft.queries.NearDup.oracles ++
      graft.queries.EventAnalytics.oracles ++ graft.queries.Analytics.oracles ++
      graft.queries.Profiling.oracles ++ graft.queries.Curation.oracles ++
      graft.queries.Graph.oracles ++ graft.queries.Relevance.oracles
}
