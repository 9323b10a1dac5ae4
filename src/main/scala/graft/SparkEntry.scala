package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{DecisionSupportQueries, DedupQueries, EventQueries, ExtendedQueries, MediaQueries, PipelineQueries, RelationalQueries, SamplingQueries, SeriesQueries, SupplyChainQueries, TextAnalysisQueries, VectorQueries, WarehouseQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator catalog (one entry per implemented
  * operator from SURVEY.md §2); `oracleSql` holds the DuckDB-equivalent SQL
  * for every SQL-expressible entry. Column names are aliased identically on
  * both sides (the driver's compare sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.defs ++ PipelineQueries.defs ++ VectorQueries.defs ++
      DedupQueries.defs ++ TextAnalysisQueries.defs ++ EventQueries.defs ++
      MediaQueries.defs ++ ExtendedQueries.defs ++ SamplingQueries.defs ++
      DecisionSupportQueries.defs ++ WarehouseQueries.defs ++
      SeriesQueries.defs ++ SupplyChainQueries.defs

  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ PipelineQueries.oracles ++
      VectorQueries.oracles ++ DedupQueries.oracles ++
      TextAnalysisQueries.oracles ++ EventQueries.oracles ++
      MediaQueries.oracles ++ ExtendedQueries.oracles ++
      SamplingQueries.oracles ++ DecisionSupportQueries.oracles ++
      WarehouseQueries.oracles ++ SeriesQueries.oracles ++
      SupplyChainQueries.oracles
}
