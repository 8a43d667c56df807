package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Relational operator surface (SURVEY.md §2.1–§2.5).
  *
  * Every op is a pure `(SparkSession, String) => DataFrame` over the parquet
  * tables; plans are fully declarative so Catalyst does pushdown / pruning /
  * join selection / AQE. Hash-match discipline (SURVEY.md §2.9): total-order
  * ORDER BY with a unique tie-break, decimal-exact accumulation for money
  * sums (order-independent, so local[4] and a 1000-executor cluster produce
  * bit-identical output), ms-truncated epoch longs for any `events.ts`
  * derived value (parquet stores ns; Spark truncates to µs, DuckDB keeps ns).
  */
object Relational {

  /** Exact, shuffle-order-independent money sum. Per-row scale-to-integer
    * (`round(x*10000)`: Spark's HALF_UP and DuckDB's C `round` agree —
    * round-half-away-from-zero evaluated on the identical IEEE double),
    * exact long accumulation, divide back. Identical result on Spark and
    * DuckDB regardless of partitioning — per-row `CAST(double AS DECIMAL)`
    * is NOT portable (Spark rounds the exact decimal expansion, DuckDB
    * rounds in double arithmetic; verified 1e-4 drift at sf0.001).
    */
  def msum(c: Column): Column =
    sum(round(c * lit(10000)).cast("long")).cast("double") / lit(10000.0)

  type Q = (SparkSession, String) => DataFrame

  // ===== §2.4 aggregations =====

  /** TPC-H Q1 shape — the flagship `entry` query.
    * One pass over lineitem: pruned scan -> pushed filter -> partial+final
    * hash agg (map-side combine is automatic) -> tiny sort. No shuffle other
    * than the 4-group aggregate exchange; scales linearly in input.
    */
  val aggPricing: Q = (s, dir) => {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" <= to_timestamp(lit("1998-09-02 00:00:00")))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity").as("sum_qty"), // integer-valued doubles: exact in any order
        msum($"l_extendedprice").as("sum_base_price"),
        msum($"l_extendedprice" * (lit(1) - $"l_discount")).as("sum_disc_price"),
        msum($"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax")).as("sum_charge"),
        (sum($"l_quantity") / count(lit(1))).as("avg_qty"),
        (msum($"l_extendedprice") / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val queries: Map[String, Q] = Map(
    "agg_pricing" -> aggPricing
  )
}
