package graft

import graft.graph.CodeGraph
import graft.query.Lookups
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001 (driver smoke-checks
    * rows>0): the README demo shape — "who calls N3, two hops" —
    * anchor + incoming traversal + workspace-filtered packaging
    * (reference `/root/reference/README.md:28-38`).
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    Lookups.findCallers(CodeGraph.edges(spark, d), CodeGraph.nodeBlocks(spark, d),
      "N3", maxDepth = 2, workspace = "tpch")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Queries.oracles
}
