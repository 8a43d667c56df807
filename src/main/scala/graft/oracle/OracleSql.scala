package graft.oracle

/** DuckDB oracle SQL, one entry per oracle-checked key in
  * `graft.SparkEntry.queries` (SURVEY.md §2). The driver materializes each
  * `{sfDir}/{table}.parquet` as a DuckDB view named `{table}` and
  * hash-compares against our parquet dump (columns sorted by name, so
  * aliases must match the Spark side EXACTLY; row order is preserved, so
  * every query ends in a total-order ORDER BY).
  *
  * Dialect discipline (SURVEY.md §2.9): money sums scale-to-integer per row
  * (`round(x*10000)` — identical half-away-from-zero rounding on the same
  * IEEE double in both engines), accumulate exactly, divide back (per-row
  * `CAST(double AS DECIMAL)` is NOT portable — verified drift); `events.ts`
  * is parquet timestamp[ns] — always reduce through epoch_ms before
  * comparing/aggregating; integer sums cast to BIGINT or DOUBLE (DuckDB
  * sum(BIGINT) widens to HUGEINT).
  */
object OracleSql {

  val sql: Map[String, String] = Map(
    "agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(round(l_extendedprice * 10000) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_base_price,
        |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_disc_price,
        |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 10000) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_charge,
        |  sum(l_quantity) / count(*) AS avg_qty,
        |  CAST(sum(CAST(round(l_extendedprice * 10000) AS BIGINT)) AS DOUBLE) / 10000.0 / count(*) AS avg_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
