package graft

import graft.ccf.CCF
import graft.graph.GraphBuilders
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates every operator family's queries + DuckDB oracles. */
object SparkEntry {

  /** Flagship (SURVEY.md §7.2): CCF connected components over the co-purchase
    * part graph at sf0.001 — scan → self-join → CCF fixpoint → membership
    * rollup. Non-empty by construction. */
  def entry(spark: SparkSession): DataFrame = {
    val edges = GraphBuilders.copurchaseEdges(spark, "/root/testdata/sf0.001")
    val result = CCF.run(edges)
    CCF.membership(result.assignments)
      .select(col("component"), size(col("members")).as("n_members"), col("members"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.GraphQueries.defs ++
      graft.queries.RelationalQueries.defs ++
      graft.queries.TextQueries.defs ++
      graft.queries.DedupQueries.defs ++
      graft.queries.SimilarityQueries.defs ++
      graft.queries.EventQueries.defs ++
      graft.queries.MultimodalQueries.defs ++
      graft.queries.CurationQueries.defs ++
      graft.queries.PipelineQueries.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.GraphQueries.oracles ++
      graft.queries.RelationalQueries.oracles ++
      graft.queries.TextQueries.oracles ++
      graft.queries.DedupQueries.oracles ++
      graft.queries.SimilarityQueries.oracles ++
      graft.queries.EventQueries.oracles ++
      graft.queries.MultimodalQueries.oracles ++
      graft.queries.CurationQueries.oracles ++
      graft.queries.PipelineQueries.oracles
}
