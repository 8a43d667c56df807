package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Ckpt.CkptOps

/** Distributed total-order scans: global rank / ntile / exclusive prefix
  * aggregates WITHOUT the single-partition `WindowExec` that
  * `Window.orderBy(...)` (no partitionBy) plans to.
  *
  * The classic two-phase parallel prefix:
  *   1. `repartitionByRange` on the order key — the same range exchange a
  *      global `orderBy` uses, so partition i's keys all precede partition
  *      j's for i < j, and every partition is a contiguous slice of the
  *      total order.
  *   2. a PARTITIONED window (keyed by the materialized partition id)
  *      computes each row's local rank / local exclusive prefix — fully
  *      parallel across the P slices.
  *   3. the per-slice totals (P rows, P = shuffle partitions) are folded
  *      into per-slice exclusive offsets with a broadcast non-equi self
  *      join (P² pairs on a P-row frame — driver-free, trivially small),
  *      and a broadcast hash join stitches offset + local into the global
  *      answer.
  *
  * At 100 TB this is exactly how a distributed sort scales: one range
  * shuffle sized by `spark.sql.shuffle.partitions`, then per-slice work —
  * no operator ever sees more than one slice. The frame is eagerly
  * checkpointed after step 2 because steps 3a/3b consume it twice and the
  * range boundaries are SAMPLED: two independent executions of the range
  * exchange could disagree on boundaries, desynchronizing the offsets from
  * the rows they offset. The checkpoint pins one materialization (and is
  * how the multi-consumer frames elsewhere in this repo already handle
  * lineage reuse).
  *
  * The order columns passed in must form a TOTAL order (include a unique
  * tie-break) — same contract a deterministic global window has.
  */
object DistScan {

  private val PID = "__ds_pid"
  private val LRN = "__ds_lrn"
  private val VAL = "__ds_val"
  private val LOC = "__ds_loc"
  private val OFF = "__ds_off"

  private def slices(df: DataFrame): Int =
    df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt

  /** `df` plus a 1-based BIGINT global-rank column `out` over the total
    * order `order` — the scalable spelling of
    * `row_number().over(Window.orderBy(order))`.
    */
  def withGlobalRank(df: DataFrame, out: String, order: Column*): DataFrame = {
    val local = df.repartitionByRange(slices(df), order: _*)
      .withColumn(PID, spark_partition_id())
      .withColumn(LRN, row_number().over(
        Window.partitionBy(col(PID)).orderBy(order: _*)).cast("long"))
      .cp()
    val counts = local.groupBy(col(PID)).agg(count(lit(1)).as("__c"))
    val offs = counts.as("a")
      .join(counts.as("b"), col(s"b.$PID") < col(s"a.$PID"), "left")
      .groupBy(col(s"a.$PID").as(PID))
      .agg(coalesce(sum(col("b.__c")), lit(0L)).as(OFF))
    local.join(broadcast(offs), Seq(PID))
      .withColumn(out, col(OFF) + col(LRN))
      .drop(PID, LRN, OFF)
  }

  /** Exact BIGINT floor division for non-negative operands: the numerator
    * is reduced to an exact multiple first, so the double division in `/`
    * is exact and the cast can't truncate a half-ulp miss.
    */
  private def idiv(a: Column, b: Column): Column =
    ((a - a % b) / b).cast("long")

  /** SQL-standard `ntile(k)` bucket from a 1-based global rank: with n
    * rows, the first `n mod k` buckets take `n div k + 1` rows, the rest
    * `n div k` — DuckDB/Spark/ISO semantics, derived arithmetically so no
    * global window is needed. Guard order matters: when n < k every bucket
    * holds ≤ 1 row and the quotient `q` is 0 (the per-row `when` keeps the
    * q-divisor branch unevaluated for those rows).
    */
  def ntileOfRank(rank: Column, n: Column, k: Int): Column = {
    val kL = lit(k.toLong)
    val q = idiv(n, kL)
    val r = n % kL
    val boundary = r * (q + 1L)
    when(n < k, rank)
      .when(rank <= boundary, idiv(rank - 1L, q + 1L) + 1L)
      .otherwise(r + idiv(rank - 1L - boundary, q) + 1L)
  }

  /** `df` plus `out` = EXCLUSIVE prefix aggregate of `value` over the
    * total order: for each row, `kind` ("sum" | "max" | "min") of `value`
    * over all strictly-preceding rows, NULL when none precede — the
    * scalable spelling of
    * `agg(value).over(Window.orderBy(order).rowsBetween(unboundedPreceding, -1))`.
    */
  def withPrefixAgg(df: DataFrame, out: String, value: Column, kind: String,
                    order: Column*): DataFrame = {
    val aggF: Column => Column = kind match {
      case "sum" => sum
      case "max" => max
      case "min" => min
      case other => throw new IllegalArgumentException(s"kind: $other")
    }
    // greatest/least skip NULLs (empty-frame slices); sum needs the
    // explicit both-null guard to keep the empty-prefix NULL contract.
    val combine: (Column, Column) => Column = kind match {
      case "sum" => (a, b) =>
        when(a.isNull && b.isNull, lit(null)).otherwise(
          coalesce(a, lit(0L)) + coalesce(b, lit(0L)))
      case "max" => (a, b) => greatest(a, b)
      case _     => (a, b) => least(a, b)
    }
    val local = df.withColumn(VAL, value)
      .repartitionByRange(slices(df), order: _*)
      .withColumn(PID, spark_partition_id())
      .withColumn(LOC, aggF(col(VAL)).over(
        Window.partitionBy(col(PID)).orderBy(order: _*)
          .rowsBetween(Window.unboundedPreceding, -1)))
      .cp()
    val tot = local.groupBy(col(PID)).agg(aggF(col(VAL)).as("__t"))
    val offs = tot.as("a")
      .join(tot.as("b"), col(s"b.$PID") < col(s"a.$PID"), "left")
      .groupBy(col(s"a.$PID").as(PID))
      .agg(aggF(col("b.__t")).as(OFF))
    local.join(broadcast(offs), Seq(PID))
      .withColumn(out, combine(col(OFF), col(LOC)))
      .drop(PID, VAL, LOC, OFF)
  }
}
