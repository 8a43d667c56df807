package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Pure registry: the operator implementations live in `graft.ops.*`, the
  * DuckDB oracle strings in `graft.oracle.OracleSql`. Keys here ARE the
  * declared contract (SURVEY.md §2) that the driver's correctness gate
  * iterates.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.aggPricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational.queries ++ ops.GraphOps.queries ++ ops.LlmOps.queries ++
      ops.StreamingOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    oracle.OracleSql.sql ++ oracle.GraphOracle.sql ++ oracle.LlmOracle.sql ++
      oracle.StreamingOracle.sql
}
