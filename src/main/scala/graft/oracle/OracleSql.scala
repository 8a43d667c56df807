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
  * sum(BIGINT) widens to HUGEINT); NULL sort order differs (Spark NULLS
  * FIRST asc, DuckDB NULLS LAST) — coalesce group keys or spell NULLS
  * FIRST/LAST explicitly.
  */
object OracleSql {

  /** DuckDB spelling of the portable exact money sum. */
  private def msum(expr: String): String =
    s"CAST(sum(CAST(round(($expr) * 10000) AS BIGINT)) AS DOUBLE) / 10000.0"

  /** Spark∩DuckDB shared-dialect SQL: the same text is executed by
    * `spark.sql` (ops.Relational.sqlQ3/Q5) AND shipped as the oracle —
    * one source of truth, zero drift.
    */
  val Q3: String =
    s"""WITH rev AS (
       |  SELECT l_orderkey,
       |    CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT) AS sr
       |  FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  WHERE c_mktsegment = 'BUILDING'
       |    AND o_orderdate < TIMESTAMP '1997-06-01 00:00:00')
       |SELECT l_orderkey, CAST(sum(sr) AS DOUBLE) / 10000.0 AS revenue
       |FROM rev GROUP BY l_orderkey
       |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  val Q5: String =
    s"""SELECT n_name,
       |  ${msum("l_extendedprice * (1 - l_discount)")} AS revenue
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  /** TPC-H-Q7-shaped volume-shipping query (two-nation trade flows by ship
    * year, symmetric nation-pair disjunction — the classic OR-of-conjuncts
    * predicate that must NOT break the join into a cartesian). EXTRACT YEAR
    * is cast to BIGINT on both engines (Spark year() is INT, DuckDB's is
    * BIGINT).
    */
  val Q7: String =
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |  CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
       |  ${msum("l_extendedprice * (1 - l_discount)")} AS revenue
       |FROM lineitem
       |JOIN orders ON o_orderkey = l_orderkey
       |JOIN supplier ON s_suppkey = l_suppkey
       |JOIN customer ON c_custkey = o_custkey
       |JOIN nation n1 ON s_nationkey = n1.n_nationkey
       |JOIN nation n2 ON c_nationkey = n2.n_nationkey
       |WHERE ((n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_10')
       |    OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_12'))
       |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
       |GROUP BY 1, 2, 3
       |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** TPC-H-Q10-shaped returned-items report: top-20 customers by revenue
    * lost to returns in one quarter.
    */
  val Q10: String =
    s"""SELECT c_custkey, c_name,
       |  ${msum("l_extendedprice * (1 - l_discount)")} AS revenue,
       |  c_acctbal, n_name
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
       |  AND l_returnflag = 'R'
       |GROUP BY c_custkey, c_name, c_acctbal, n_name
       |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** Q14-shaped promo revenue share by ship month (shared dialect: runs
    * verbatim on Spark AND DuckDB). The share is a DOUBLE/DOUBLE division
    * of two exact scaled-BIGINT sums — identical IEEE operands on both
    * engines, so no rounding is needed for the hash match.
    */
  val Q14: String =
    """WITH pr AS (
      |  SELECT CAST(extract(year FROM l_shipdate) * 100
      |           + extract(month FROM l_shipdate) AS BIGINT) AS ym,
      |    CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT) AS sr,
      |    CASE WHEN p_type = 'PROMO' THEN 1 ELSE 0 END AS is_promo
      |  FROM lineitem JOIN part ON l_partkey = p_partkey)
      |SELECT ym,
      |  CAST(sum(sr * is_promo) AS DOUBLE) / 10000.0 AS promo_revenue,
      |  CAST(sum(sr) AS DOUBLE) / 10000.0 AS total_revenue,
      |  CAST(sum(sr * is_promo) AS DOUBLE) / CAST(sum(sr) AS DOUBLE) AS promo_share
      |FROM pr GROUP BY ym ORDER BY ym""".stripMargin

  /** Q18-shaped large-volume customers (shared dialect). l_quantity is an
    * integral double (1..50), so sum() is exact in any order; the BIGINT
    * cast is portable on exactly-integral values.
    */
  val Q18: String =
    """SELECT c_name, o_orderkey, o_totalprice,
      |  CAST(sum(l_quantity) AS BIGINT) AS total_qty
      |FROM orders
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_name, o_orderkey, o_totalprice
      |HAVING sum(l_quantity) > 120
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  /** Q19-shaped disjunctive brand/size/quantity revenue (shared dialect,
    * adapted: this lineitem has no shipmode/container). Single aggregate
    * row — order-stable by construction.
    */
  val Q19: String =
    s"""SELECT CAST(count(*) AS BIGINT) AS n_lines,
       |  ${msum("l_extendedprice * (1 - l_discount)")} AS revenue
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE (p_brand = 'Brand#4'  AND p_size BETWEEN 1  AND 15 AND l_quantity BETWEEN 1  AND 20)
       |   OR (p_brand = 'Brand#19' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
       |   OR (p_brand = 'Brand#2'  AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 45)""".stripMargin

  val sql: Map[String, String] = Map(
    "sql_q3" -> Q3,
    "sql_q5" -> Q5,
    "sql_q7" -> Q7,
    "sql_q10" -> Q10,
    "sql_q14" -> Q14,
    "sql_q18" -> Q18,
    "sql_q19" -> Q19,
    // event_date <= 2024-01-15 on the partitioned journal is exactly
    // ts < 2024-01-16 00:00 UTC on the raw table
    "src_partitioned" ->
      s"""SELECT epoch_ms(ts) // 86400000 AS day, count(*) AS n,
         |  ${msum("value")} AS sum_value
         |FROM events
         |WHERE epoch_ms(ts) < epoch_ms(TIMESTAMP '2024-01-16 00:00:00')
         |GROUP BY 1 ORDER BY day""".stripMargin,

    "win_pareto" ->
      """WITH rev AS (
        |  SELECT l_partkey AS p,
        |    CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS r
        |  FROM lineitem GROUP BY 1),
        |tot AS (SELECT CAST(sum(r) AS BIGINT) AS t FROM rev),
        |rk AS (SELECT p, r,
        |  CAST(row_number() OVER (ORDER BY r DESC, p) AS BIGINT) AS rn,
        |  CAST(sum(r) OVER (ORDER BY r DESC, p ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM rev)
        |SELECT p, CAST(r AS DOUBLE) / 10000.0 AS revenue, rn,
        |  round(CAST(cum AS DOUBLE) / CAST(t AS DOUBLE), 4) AS cum_share
        |FROM rk, tot WHERE cum * 5 <= t * 4
        |ORDER BY rn""".stripMargin,

    "agg_retention" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_ms(ts) // 86400000 AS d FROM events),
        |su AS (SELECT user_id, min(d) AS d0 FROM ev GROUP BY 1)
        |SELECT su.d0 AS cohort_day, ev.d - su.d0 AS day_offset,
        |  count(DISTINCT ev.user_id) AS n_users
        |FROM ev JOIN su USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin,

    "win_sessionize" ->
      """WITH ev AS (SELECT user_id, epoch_ms(ts) AS tms, event_id FROM events),
        |g AS (SELECT user_id, tms, event_id,
        |  CASE WHEN lag(tms) OVER (PARTITION BY user_id ORDER BY tms, event_id) IS NULL
        |         OR tms - lag(tms) OVER (PARTITION BY user_id ORDER BY tms, event_id) > 1800000
        |       THEN 1 ELSE 0 END AS brk FROM ev),
        |s AS (SELECT user_id, tms,
        |  sum(brk) OVER (PARTITION BY user_id ORDER BY tms, event_id
        |                 ROWS UNBOUNDED PRECEDING) AS session_seq FROM g)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        |  count(*) AS n_events, min(tms) AS start_ms,
        |  max(tms) - min(tms) AS dur_ms
        |FROM s GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin,
    "win_rank_change" ->
      """WITH rev AS (
        |  SELECT l_partkey AS p, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
        |    CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS r
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  GROUP BY 1, 2),
        |rk AS (
        |  SELECT p, yr, row_number() OVER (PARTITION BY yr ORDER BY r DESC, p) AS rnk
        |  FROM rev)
        |SELECT a.p, a.rnk AS rank_1996, b.rnk AS rank_1997, a.rnk - b.rnk AS moved
        |FROM rk a JOIN rk b ON a.p = b.p AND a.yr = 1996 AND b.yr = 1997
        |ORDER BY abs(a.rnk - b.rnk) DESC, a.p""".stripMargin,

    "agg_histogram" ->
      """SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
        |  count(*) AS n, min(o_totalprice) AS min_price,
        |  max(o_totalprice) AS max_price
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,

    "agg_funnel" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN epoch_ms(ts) END) AS t_view,
        |    min(CASE WHEN event_type = 'click' THEN epoch_ms(ts) END) AS t_click,
        |    min(CASE WHEN event_type = 'purchase' THEN epoch_ms(ts) END) AS t_purchase
        |  FROM events GROUP BY user_id)
        |SELECT count(*) AS n_users,
        |  count(CASE WHEN t_view IS NOT NULL THEN 1 END) AS n_view,
        |  count(CASE WHEN t_click > t_view THEN 1 END) AS n_view_click,
        |  count(CASE WHEN t_purchase > t_click AND t_click > t_view THEN 1 END) AS n_funnel
        |FROM pu""".stripMargin,
    // ===== §2.1 scans =====
    "scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 100""".stripMargin,

    "scan_pruned" ->
      """SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_date
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-04-01 00:00:00'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "src_json_props" ->
      s"""SELECT CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k,
         |  count(*) AS cnt, ${msum("value")} AS sum_value
         |FROM events GROUP BY 1 ORDER BY k""".stripMargin,

    "sink_parquet" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
        |FROM orders WHERE o_totalprice > 300000
        |ORDER BY o_orderkey""".stripMargin,

    "sink_partitioned" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY o_orderkey""".stripMargin,

    "sink_merge_upsert" ->
      """WITH cur AS (
        |  SELECT o_custkey AS ck, count(*) AS n0,
        |    CAST(sum(CAST(round(o_totalprice * 10000) AS BIGINT)) AS BIGINT) AS t0
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  GROUP BY 1),
        |upd AS (
        |  SELECT o_custkey AS uk, count(*) AS n1,
        |    CAST(sum(CAST(round(o_totalprice * 10000) AS BIGINT)) AS BIGINT) AS t1
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  GROUP BY 1)
        |SELECT coalesce(ck, uk) AS custkey,
        |  coalesce(n0, 0) + coalesce(n1, 0) AS n_orders,
        |  CAST(coalesce(t0, 0) + coalesce(t1, 0) AS DOUBLE) / 10000.0 AS total_price,
        |  CASE WHEN ck IS NULL THEN 'inserted'
        |       WHEN uk IS NULL THEN 'unchanged'
        |       ELSE 'updated' END AS merge_action
        |FROM cur FULL OUTER JOIN upd ON ck = uk
        |ORDER BY custkey""".stripMargin,

    // ===== §2.2 filters / projections =====
    "filter_basic" ->
      """SELECT l_orderkey, l_linenumber, l_suppkey, l_quantity, l_returnflag, l_linestatus
        |FROM lineitem
        |WHERE l_quantity BETWEEN 10 AND 30
        |  AND l_suppkey IN (1, 2, 3)
        |  AND (nullif(l_returnflag, 'N') IS NOT DISTINCT FROM 'A' OR l_linestatus = 'O')
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "filter_like" ->
      """SELECT p_partkey, p_name, p_brand, p_type
        |FROM part
        |WHERE p_type LIKE 'ECO%' OR regexp_matches(p_name, 'widget$')
        |ORDER BY p_partkey""".stripMargin,

    "project_expr" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1 - l_discount) AS disc_price,
        |  l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
        |  CASE WHEN l_returnflag = 'A' THEN 'returned'
        |       WHEN l_returnflag = 'N' THEN 'ok'
        |       ELSE 'other' END AS flag_desc
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    // ===== §2.3 joins =====
    "join_inner_hash" ->
      """SELECT o_orderkey, l_linenumber, o_custkey, l_quantity, o_orderstatus
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY o_orderkey, l_linenumber""".stripMargin,

    "join_broadcast" ->
      s"""SELECT r_name, n_name, count(*) AS n_cust, ${msum("c_acctbal")} AS sum_acctbal
         |FROM customer
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "join_outer_left" ->
      """SELECT o_orderkey, o_orderpriority, count(l_orderkey) AS n_big
        |FROM orders LEFT JOIN lineitem
        |  ON l_orderkey = o_orderkey AND l_quantity > 45
        |GROUP BY o_orderkey, o_orderpriority
        |ORDER BY o_orderkey""".stripMargin,

    "join_outer_full" ->
      """WITH o AS (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 400000)
        |SELECT coalesce(c_custkey, o_custkey) AS custkey,
        |  CASE WHEN c_custkey IS NOT NULL AND o_custkey IS NOT NULL THEN 'both'
        |       WHEN c_custkey IS NOT NULL THEN 'left_only'
        |       ELSE 'right_only' END AS side
        |FROM customer FULL OUTER JOIN o ON c_custkey = o_custkey
        |ORDER BY custkey""".stripMargin,

    "join_semi" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,

    "join_anti" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,

    "join_theta_range" ->
      """SELECT e1.event_id AS id1, e2.event_id AS id2, e1.user_id AS user_id,
        |  epoch_ms(e2.ts) - epoch_ms(e1.ts) AS delta_ms
        |FROM events e1 JOIN events e2
        |  ON e1.user_id = e2.user_id
        | AND epoch_ms(e2.ts) > epoch_ms(e1.ts)
        | AND epoch_ms(e2.ts) <= epoch_ms(e1.ts) + 3600000
        |ORDER BY id1, id2""".stripMargin,

    "join_skew_salted" ->
      """WITH dim(flag, flag_desc) AS (
        |  VALUES ('A', 'returned'), ('N', 'ok'), ('R', 'refunded'))
        |SELECT l_returnflag AS flag, flag_desc, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem JOIN dim ON l_returnflag = dim.flag
        |GROUP BY 1, 2 ORDER BY flag""".stripMargin,

    "win_running_distinct" ->
      """WITH li AS (
        |  SELECT l_suppkey, l_partkey, l_shipdate, l_orderkey, l_linenumber,
        |    CASE WHEN row_number() OVER (PARTITION BY l_suppkey, l_partkey
        |      ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey) = 1 THEN 1 ELSE 0 END AS first_seen
        |  FROM lineitem)
        |SELECT l_suppkey, l_orderkey, l_linenumber, l_partkey,
        |  CAST(sum(first_seen) OVER (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey) AS BIGINT)
        |    AS distinct_parts_so_far
        |FROM li WHERE l_suppkey <= 20
        |ORDER BY l_suppkey, l_orderkey, l_linenumber, l_partkey""".stripMargin,

    "agg_median_mode" ->
      """WITH med AS (
        |  SELECT o_orderpriority,
        |    round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
        |    count(*) AS n
        |  FROM orders GROUP BY 1),
        |mode_t AS (
        |  SELECT o_orderpriority, o_orderstatus AS mode_status, c AS mode_n FROM (
        |    SELECT o_orderpriority, o_orderstatus, count(*) AS c,
        |      row_number() OVER (PARTITION BY o_orderpriority
        |        ORDER BY count(*) DESC, o_orderstatus) AS rn
        |    FROM orders GROUP BY 1, 2) t
        |  WHERE rn = 1)
        |SELECT med.o_orderpriority, median_price, n, mode_status, mode_n
        |FROM med JOIN mode_t ON med.o_orderpriority = mode_t.o_orderpriority
        |ORDER BY med.o_orderpriority""".stripMargin,

    "src_csv" ->
      """SELECT c_custkey, c_name, n_name, c_acctbal, c_mktsegment
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY c_custkey""".stripMargin,

    // the Spark side round-trips supplier through JSON scratch first; a
    // lossless round-trip must hash-match the original parquet
    "src_json" ->
      """SELECT s_suppkey, s_name, n_name, s_acctbal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |ORDER BY s_suppkey""".stripMargin,

    "join_theta_rule" ->
      """WITH e AS (SELECT event_id, epoch_ms(ts) AS t FROM events)
        |SELECT a.t // 3600000 AS hour, count(*) AS n_pairs,
        |  CAST(sum(b.t - a.t) AS BIGINT) AS sum_delta_ms
        |FROM e a JOIN e b ON b.t > a.t AND b.t <= a.t + 600000
        |GROUP BY 1 ORDER BY hour""".stripMargin,

    "join_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,

    "join_asof" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, event_type FROM events),
        |clicks AS (
        |  SELECT user_id, ts_ms, max(event_id) AS click_id
        |  FROM e WHERE event_type = 'click' GROUP BY 1, 2),
        |purchases AS (
        |  SELECT event_id AS purchase_id, user_id, ts_ms
        |  FROM e WHERE event_type = 'purchase')
        |SELECT p.purchase_id, p.user_id, p.ts_ms AS purchase_ts_ms,
        |  c.click_id, c.ts_ms AS click_ts_ms, p.ts_ms - c.ts_ms AS gap_ms
        |FROM purchases p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND c.ts_ms <= p.ts_ms
        |ORDER BY purchase_id""".stripMargin,

    "join_asof_fwd" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, event_type FROM events),
        |clicks AS (
        |  SELECT user_id, ts_ms, max(event_id) AS click_id
        |  FROM e WHERE event_type = 'click' GROUP BY 1, 2),
        |purchases AS (
        |  SELECT event_id AS purchase_id, user_id, ts_ms
        |  FROM e WHERE event_type = 'purchase')
        |SELECT p.purchase_id, p.user_id, p.ts_ms AS purchase_ts_ms,
        |  c.click_id, c.ts_ms AS click_ts_ms, c.ts_ms - p.ts_ms AS gap_ms
        |FROM purchases p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND c.ts_ms >= p.ts_ms
        |ORDER BY purchase_id""".stripMargin,

    // identical semantics through the custom physical operator — same oracle
    "join_asof_exec" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, event_type FROM events),
        |clicks AS (
        |  SELECT user_id, ts_ms, max(event_id) AS click_id
        |  FROM e WHERE event_type = 'click' GROUP BY 1, 2),
        |purchases AS (
        |  SELECT event_id AS purchase_id, user_id, ts_ms
        |  FROM e WHERE event_type = 'purchase')
        |SELECT p.purchase_id, p.user_id, p.ts_ms AS purchase_ts_ms,
        |  c.click_id, c.ts_ms AS click_ts_ms, p.ts_ms - c.ts_ms AS gap_ms
        |FROM purchases p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND c.ts_ms <= p.ts_ms
        |ORDER BY purchase_id""".stripMargin,

    "agg_topk_group" ->
      """SELECT c_mktsegment, rnk, c_custkey, c_acctbal FROM (
        |  SELECT c_mktsegment, c_custkey, c_acctbal,
        |    CAST(row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rnk
        |  FROM customer) t
        |WHERE rnk <= 3 ORDER BY c_mktsegment, rnk""".stripMargin,

    // ===== §2.4 aggregations =====
    "agg_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  sum(l_quantity) AS sum_qty,
         |  ${msum("l_extendedprice")} AS sum_base_price,
         |  ${msum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
         |  ${msum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
         |  sum(l_quantity) / count(*) AS avg_qty,
         |  ${msum("l_extendedprice")} / count(*) AS avg_price,
         |  count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "agg_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "agg_rollup" ->
      s"""SELECT grouping(n_name, c_mktsegment) AS gid,
         |  coalesce(n_name, '(all)') AS nation,
         |  coalesce(c_mktsegment, '(all)') AS segment,
         |  count(*) AS n, ${msum("c_acctbal")} AS sum_bal
         |FROM customer JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY ROLLUP (n_name, c_mktsegment)
         |ORDER BY gid, nation, segment""".stripMargin,

    "agg_cube" ->
      """SELECT grouping(l_returnflag, l_linestatus) AS gid,
        |  coalesce(l_returnflag, '(all)') AS returnflag,
        |  coalesce(l_linestatus, '(all)') AS linestatus,
        |  count(*) AS n, sum(l_quantity) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY gid, returnflag, linestatus""".stripMargin,

    "agg_grouping_sets" ->
      """SELECT grouping(n_name) AS g_nation, grouping(c_mktsegment) AS g_seg,
        |  coalesce(n_name, '(all)') AS nation,
        |  coalesce(c_mktsegment, '(all)') AS segment,
        |  count(*) AS n
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
        |ORDER BY g_nation, g_seg, nation, segment""".stripMargin,

    "agg_filtered" ->
      """SELECT o_orderstatus,
        |  CAST(sum(CAST(round(o_totalprice * 10000) AS BIGINT))
        |       FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE) / 10000.0 AS urgent_total,
        |  count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "agg_stats" ->
      """SELECT o_orderstatus,
        |  min(o_totalprice) AS min_price,
        |  max(o_totalprice) AS max_price,
        |  round(stddev_samp(o_totalprice), 4) AS sd_price,
        |  round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "agg_pivot" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        |  count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
        |  count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "agg_corr" ->
      """SELECT l_returnflag,
        |  round(corr(l_extendedprice / 1000.0, l_quantity), 4) AS corr_pq,
        |  round(covar_samp(l_extendedprice / 1000.0, l_quantity), 4) AS covar_pq,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "agg_listagg" ->
      """SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,

    "agg_collect_set" ->
      """SELECT o_orderpriority,
        |  array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "win_percent_cume" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_mktsegment, c_acctbal, c_custkey""".stripMargin,

    "join_exists_subquery" ->
      """SELECT s_suppkey, s_name
        |FROM supplier
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_suppkey = s_suppkey AND l_quantity >= 49)
        |ORDER BY s_suppkey""".stripMargin,

    "scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |WHERE o_totalprice >
        |  (SELECT CAST(sum(CAST(round(o_totalprice * 10000) AS BIGINT)) AS DOUBLE)
        |     / 10000.0 / count(*) FROM orders)
        |ORDER BY o_orderkey""".stripMargin,

    // ===== §2.5 windows / sorts / set ops =====
    "win_rank" ->
      """SELECT c_nationkey, c_custkey, c_acctbal, rn, rnk, drnk FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |    row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn,
        |    rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS rnk,
        |    dense_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS drnk
        |  FROM customer) t
        |WHERE rn <= 3 ORDER BY c_nationkey, rn""".stripMargin,

    "win_lag_lead" ->
      """SELECT user_id, event_id, ts_ms,
        |  ts_ms - lag(ts_ms, 1) OVER w AS delta_ms,
        |  lead(value, 1) OVER w AS next_value
        |FROM (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, value FROM events) t
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)
        |ORDER BY user_id, ts_ms, event_id""".stripMargin,

    "win_frame_rows" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(l_shipdate AS DATE) AS ship_date,
        |  sum(l_quantity) OVER (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
        |FROM lineitem
        |ORDER BY l_suppkey, ship_date, l_orderkey, l_linenumber""".stripMargin,

    "win_frame_range" ->
      """WITH daily AS (
        |  SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day_n,
        |    sum(CAST(round(o_totalprice * 10000) AS BIGINT)) AS scaled_total
        |  FROM orders GROUP BY 1)
        |SELECT day_n,
        |  CAST(scaled_total AS DOUBLE) / 10000.0 AS day_total,
        |  CAST(sum(scaled_total) OVER w AS DOUBLE) / 10000.0 AS mov_total,
        |  count(*) OVER w AS n_days
        |FROM daily
        |WINDOW w AS (ORDER BY day_n RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY day_n""".stripMargin,

    "win_ntile_firstlast" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal,
        |  ntile(4) OVER w AS quartile,
        |  first_value(c_name) OVER wf AS richest,
        |  last_value(c_name) OVER wf AS poorest
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey),
        |  wf AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY c_mktsegment, c_acctbal DESC, c_custkey""".stripMargin,

    "sort_multikey" ->
      """SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg_or_null, c_acctbal
        |FROM customer
        |ORDER BY seg_or_null DESC NULLS LAST, c_acctbal DESC, c_custkey""".stripMargin,

    "topk_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""".stripMargin,

    "set_union_all" ->
      """SELECT * FROM (
        |  SELECT l_orderkey, l_linenumber, 'A' AS src FROM lineitem WHERE l_returnflag = 'A'
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'B' AS src FROM lineitem WHERE l_linestatus = 'O') t
        |ORDER BY l_orderkey, l_linenumber, src""".stripMargin,

    "set_union_distinct" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        |UNION
        |SELECT c_custkey FROM customer WHERE c_acctbal > 9000
        |ORDER BY c_custkey""".stripMargin,

    "set_intersect" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        |INTERSECT
        |SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        |ORDER BY c_custkey""".stripMargin,

    "set_except" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        |EXCEPT
        |SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        |ORDER BY c_custkey""".stripMargin
  )
}
