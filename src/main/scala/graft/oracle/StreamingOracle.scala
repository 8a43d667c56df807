package graft.oracle

/** DuckDB oracle SQL for the streaming batch twins (SURVEY.md §2.8).
  * Window starts are expressed as epoch-ms integer arithmetic — the portable
  * reduction of the ns-precision event timestamps — which is exactly what
  * Spark's epoch-aligned window()/session_window() produce after
  * unix_millis. Session semantics: a new session starts when the gap is
  * >= 30 min (Spark merges only strictly-inside-the-gap events; end is
  * exclusive). stream_late_data has no oracle (watermark progression is a
  * streaming-runtime behavior, asserted in StreamingSpec).
  */
object StreamingOracle {

  private def msum(expr: String): String =
    s"CAST(sum(CAST(round(($expr) * 10000) AS BIGINT)) AS DOUBLE) / 10000.0"

  /** Shared between its own map row and the state_pit_lookup wrapper. */
  private val scd2Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_ms(ts) AS tms, event_id,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS prev
      |  FROM events),
      |chg AS (
      |  SELECT user_id, event_type, tms, event_id FROM e
      |  WHERE prev IS NULL OR event_type <> prev)
      |SELECT user_id, event_type,
      |  CAST(tms AS BIGINT) AS valid_from,
      |  CAST(coalesce(lead(tms) OVER (PARTITION BY user_id ORDER BY tms, event_id), -1) AS BIGINT) AS valid_to,
      |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY tms, event_id) AS BIGINT) AS version
      |FROM chg
      |ORDER BY user_id, version""".stripMargin

  val sql: Map[String, String] = Map(
    // 2x2 (transaction x valid) cutoff grid over the journal; latest-valid
    // per user via max-struct, exact scaled sums
    "state_bitemporal" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ms,
        |    CAST(round(value * 10000) AS BIGINT) AS vs
        |  FROM events),
        |bounds AS (SELECT max(event_id) AS mid, max(ms) AS mms FROM ev),
        |grid AS (
        |  SELECT 'tx_half' AS txl, mid // 2 AS txc, 'v_14d' AS vl,
        |    mms - 1209600000 AS vc FROM bounds
        |  UNION ALL SELECT 'tx_half', mid // 2, 'v_7d',
        |    mms - 604800000 FROM bounds
        |  UNION ALL SELECT 'tx_full', mid, 'v_14d',
        |    mms - 1209600000 FROM bounds
        |  UNION ALL SELECT 'tx_full', mid, 'v_7d',
        |    mms - 604800000 FROM bounds),
        |peru AS (
        |  SELECT txl, vl, user_id, count(*) AS n,
        |    max({'ms': ms, 'event_id': event_id, 'vs': vs}).vs AS lastv
        |  FROM ev JOIN grid ON event_id <= txc AND ms <= vc
        |  GROUP BY 1, 2, 3)
        |SELECT txl, vl, count(*) AS n_users,
        |  CAST(sum(n) AS BIGINT) AS visible_events,
        |  CAST(sum(lastv) AS DOUBLE) / 10000.0 AS sum_last_value
        |FROM peru GROUP BY 1, 2 ORDER BY txl, vl""".stripMargin,

    // the CEP walk relationalized: "latest view strictly before me" is the
    // 1-PRECEDING running max over the (ts, event_id)-ordered user stream
    "stream_cep_sequence" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ms(ts) AS ms, event_id, event_type
        |  FROM events WHERE event_type IN ('view', 'purchase')),
        |w AS (
        |  SELECT user_id, ms, event_type,
        |    max(CASE WHEN event_type = 'view' THEN ms END) OVER
        |      (PARTITION BY user_id ORDER BY ms, event_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lv
        |  FROM e)
        |SELECT user_id,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_views,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_purchases,
        |  CAST(sum(CASE WHEN event_type = 'purchase' AND lv IS NOT NULL
        |    AND ms - lv <= 1800000 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_matched,
        |  CAST(sum(CASE WHEN event_type = 'purchase' AND lv IS NOT NULL
        |    AND ms - lv <= 1800000 THEN ms - lv ELSE 0 END) AS BIGINT)
        |    AS sum_gap_ms
        |FROM w GROUP BY 1 ORDER BY user_id""".stripMargin,

    "stream_anomaly" ->
      """WITH c AS (
        |  SELECT (epoch_ms(ts) // 300000) * 300000 AS ws_ms, event_type,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type, count(*) AS nw, CAST(sum(n) AS BIGINT)
        |      AS sn,
        |    CAST(sum(n * n) AS BIGINT) AS qn
        |  FROM c GROUP BY 1),
        |j AS (
        |  SELECT c.ws_ms, c.event_type, c.n,
        |    c.n * st.nw - st.sn AS a, st.nw * st.qn - st.sn * st.sn AS b
        |  FROM c JOIN st ON c.event_type = st.event_type)
        |SELECT ws_ms, event_type, CAST(n AS BIGINT) AS n,
        |  floor(CAST(a AS DOUBLE) / sqrt(CAST(b AS DOUBLE)) * 10000.0
        |    + 0.5) / 10000.0 AS z
        |FROM j WHERE a * a > b * 4 AND b > 0
        |ORDER BY event_type, ws_ms""".stripMargin,

    "stream_throttle" ->
      """WITH c AS (
        |  SELECT (epoch_ms(ts) // 60000) * 60000 AS ws_ms, user_id,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(n) AS BIGINT) AS n_events,
        |  CAST(sum(least(n, 3)) AS BIGINT) AS n_admitted,
        |  CAST(sum(n) - sum(least(n, 3)) AS BIGINT) AS n_rejected,
        |  count(*) AS n_windows
        |FROM c GROUP BY user_id ORDER BY user_id""".stripMargin,

    "stream_topk" ->
      """WITH w AS (
        |  SELECT (epoch_ms(ts) // 300000) * 300000 AS ws_ms, event_type,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT ws_ms, event_type, n,
        |    row_number() OVER (PARTITION BY ws_ms ORDER BY n DESC, event_type) AS rnk
        |  FROM w)
        |SELECT ws_ms, CAST(rnk AS BIGINT) AS rnk, event_type, n
        |FROM r WHERE rnk <= 3 ORDER BY ws_ms, rnk""".stripMargin,

    "stream_tumbling" ->
      s"""SELECT (epoch_ms(ts) // 300000) * 300000 AS ws_ms, event_type,
         |  count(*) AS n, ${msum("value")} AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY ws_ms, event_type""".stripMargin,

    "stream_distinct_exact" ->
      """WITH wu AS (
        |  SELECT (epoch_ms(ts) // 600000) * 600000 AS ws_ms, user_id
        |  FROM events GROUP BY 1, 2)
        |SELECT ws_ms, count(*) AS n_users FROM wu
        |GROUP BY 1 ORDER BY ws_ms""".stripMargin,

    "stream_sliding" ->
      """SELECT (epoch_ms(ts) // 300000 - k) * 300000 AS ws_ms, event_type,
        |  count(*) AS n
        |FROM events, (VALUES (0), (1)) t(k)
        |GROUP BY 1, 2 ORDER BY ws_ms, event_type""".stripMargin,

    "stream_session" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ms FROM events),
        |x AS (
        |  SELECT user_id, ms,
        |    CASE WHEN lag(ms) OVER w IS NULL
        |           OR ms - lag(ms) OVER w >= 1800000 THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms)),
        |y AS (
        |  SELECT user_id, ms,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ms
        |                   ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM x)
        |SELECT user_id, min(ms) AS start_ms, max(ms) + 1800000 AS end_ms,
        |  count(*) AS n_events
        |FROM y GROUP BY user_id, sid
        |ORDER BY user_id, start_ms""".stripMargin,

    "stream_dedup" ->
      """SELECT user_id, event_type, min(epoch_ms(ts)) AS first_ts_ms,
        |  count(*) - 1 AS n_dropped
        |FROM events GROUP BY 1, 2 ORDER BY user_id, event_type""".stripMargin,

    "stream_edge_upsert" ->
      s"""SELECT user_id, CAST(json_extract_string(props, '$$.k') AS BIGINT) AS item,
         |  count(*) AS n_events, ${msum("value")} AS weight,
         |  max(epoch_ms(ts)) AS last_ts_ms
         |FROM events GROUP BY 1, 2 ORDER BY user_id, item""".stripMargin,

    // degree read over the folded edge state: per-edge scaled-long weight
    // accumulators sum exactly per user (one divide at the end)
    // snapshot-pair degree delta: per-user distinct-item degree + event
    // count at T1/T2 prefixes, emit only moved users
    "graph_degree_delta" ->
      """WITH m AS (SELECT max(epoch_ms(ts)) AS mx FROM events),
        |ea AS (SELECT user_id,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
        |    count(*) AS n
        |  FROM events, m WHERE epoch_ms(ts) <= m.mx - 7200000
        |  GROUP BY 1, 2),
        |eb AS (SELECT user_id,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
        |    count(*) AS n
        |  FROM events, m WHERE epoch_ms(ts) <= m.mx - 3600000
        |  GROUP BY 1, 2),
        |a AS (SELECT user_id, count(*) AS d, CAST(sum(n) AS BIGINT) AS n
        |  FROM ea GROUP BY 1),
        |b AS (SELECT user_id, count(*) AS d, CAST(sum(n) AS BIGINT) AS n
        |  FROM eb GROUP BY 1)
        |SELECT b.user_id,
        |  CAST(coalesce(a.d, 0) AS BIGINT) AS d_t1, b.d AS d_t2,
        |  CAST(b.d - coalesce(a.d, 0) AS BIGINT) AS d_delta,
        |  CAST(coalesce(a.n, 0) AS BIGINT) AS n_t1, b.n AS n_t2
        |FROM b LEFT JOIN a ON b.user_id = a.user_id
        |WHERE a.d IS NULL OR b.d <> a.d OR b.n <> a.n
        |ORDER BY b.user_id""".stripMargin,

    "stream_degree_topk" ->
      """WITH st AS (
        |  SELECT user_id,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
        |    count(*) AS n_events,
        |    CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS ws,
        |    max(epoch_ms(ts)) AS last_ts_ms
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id, count(*) AS degree,
        |  CAST(sum(n_events) AS BIGINT) AS n_events,
        |  CAST(sum(ws) AS DOUBLE) / 10000.0 AS weight,
        |  max(last_ts_ms) AS last_ts_ms
        |FROM st GROUP BY 1
        |ORDER BY degree DESC, user_id LIMIT 20""".stripMargin,

    // journal replay as-of T = max(ts) - 1 h: same fold, prefix-filtered
    "state_gc_tombstones" ->
      """WITH last AS (
        |  SELECT user_id, max(epoch_ms(ts) // 86400000) AS last_d
        |  FROM events GROUP BY 1),
        |h AS (SELECT max(last_d) AS maxd FROM last),
        |b AS (
        |  SELECT CASE WHEN maxd - last_d <= 3 THEN 'live'
        |    WHEN maxd - last_d <= 7 THEN 'idle' ELSE 'tombstone' END
        |    AS bucket, maxd - last_d AS idle
        |  FROM last, h)
        |SELECT bucket, count(*) AS n_users,
        |  CAST(max(idle) AS BIGINT) AS max_idle_days
        |FROM b GROUP BY 1 ORDER BY bucket""".stripMargin,

    "stream_compact_latest" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ms(ts) AS ms, event_id, event_type,
        |    CAST(round(value * 10000) AS BIGINT) AS v
        |  FROM events),
        |r AS (
        |  SELECT user_id, ms, event_id, event_type, v,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ms DESC, event_id DESC) AS rn
        |  FROM e)
        |SELECT user_id, ms AS last_ms, event_id AS last_event_id,
        |  event_type AS last_type, CAST(v AS DOUBLE) / 10000.0 AS last_value
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "state_compact_latest" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ms(ts) AS ms, event_id, event_type,
        |    CAST(round(value * 10000) AS BIGINT) AS v
        |  FROM events),
        |r AS (
        |  SELECT user_id, ms, event_id, event_type, v,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ms DESC, event_id DESC) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS n_versions
        |  FROM e)
        |SELECT user_id, CAST(n_versions AS BIGINT) AS n_versions,
        |  ms AS last_ms, event_id AS last_event_id, event_type AS last_type,
        |  CAST(v AS DOUBLE) / 10000.0 AS last_value
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "state_asof" ->
      s"""WITH m AS (SELECT max(epoch_ms(ts)) AS mx FROM events)
         |SELECT user_id, CAST(json_extract_string(props, '$$.k') AS BIGINT) AS item,
         |  count(*) AS n_events, ${msum("value")} AS weight,
         |  max(epoch_ms(ts)) AS last_ts_ms
         |FROM events, m
         |WHERE epoch_ms(ts) <= m.mx - 3600000
         |GROUP BY 1, 2 ORDER BY user_id, item""".stripMargin,

    "state_diff" ->
      s"""WITH m AS (SELECT max(epoch_ms(ts)) AS mx FROM events),
         |a AS (SELECT user_id, CAST(json_extract_string(props, '$$.k') AS BIGINT) AS item,
         |    count(*) AS n, ${msum("value")} AS w
         |  FROM events, m WHERE epoch_ms(ts) <= m.mx - 7200000 GROUP BY 1, 2),
         |b AS (SELECT user_id, CAST(json_extract_string(props, '$$.k') AS BIGINT) AS item,
         |    count(*) AS n, ${msum("value")} AS w
         |  FROM events, m WHERE epoch_ms(ts) <= m.mx - 3600000 GROUP BY 1, 2)
         |SELECT b.user_id, b.item,
         |  COALESCE(a.n, 0) AS n_t1, b.n AS n_t2,
         |  COALESCE(a.w, 0.0) AS w_t1, b.w AS w_t2
         |FROM b LEFT JOIN a ON b.user_id = a.user_id AND b.item = a.item
         |WHERE a.n IS NULL OR b.n <> a.n
         |ORDER BY b.user_id, b.item""".stripMargin,

    "state_scd2" -> scd2Sql,

    "state_pit_lookup" ->
      s"""SELECT user_id, event_type, version, valid_from
         |FROM ($scd2Sql) t
         |WHERE valid_from <= 1705276800000
         |  AND (valid_to = -1 OR valid_to > 1705276800000)
         |ORDER BY user_id""".stripMargin,

    "stream_enrich" ->
      s"""SELECT (epoch_ms(e.ts) // 3600000) * 3600000 AS ws_ms,
         |  c.c_mktsegment AS segment, e.event_type,
         |  count(*) AS n, ${msum("e.value")} AS sum_value
         |FROM events e JOIN customer c ON e.user_id = c.c_custkey
         |GROUP BY 1, 2, 3 ORDER BY ws_ms, segment, event_type""".stripMargin,

    "stream_stateful_fold" ->
      s"""SELECT user_id, count(*) AS n_events,
         |  ${msum("value")} AS sum_value,
         |  max(epoch_ms(ts)) AS last_ts_ms
         |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    // stream-stream attribution join twin: both engines evaluate the
    // 30-minute range condition on ms-truncated times
    "stream_join" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, event_type
        |  FROM events),
        |c AS (SELECT user_id AS c_user, ts_ms AS c_ts, event_id AS click_id
        |  FROM e WHERE event_type = 'click'),
        |p AS (SELECT event_id AS purchase_id, user_id, ts_ms AS p_ts
        |  FROM e WHERE event_type = 'purchase')
        |SELECT purchase_id, click_id, user_id,
        |  p_ts AS purchase_ts_ms, c_ts AS click_ts_ms
        |FROM p JOIN c ON user_id = c_user
        |  AND c_ts <= p_ts AND c_ts >= p_ts - 1800000
        |ORDER BY purchase_id, click_id""".stripMargin,

    "stream_outer_join" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, event_type
        |  FROM events),
        |c AS (SELECT user_id AS c_user, ts_ms AS c_ts, event_id AS click_id
        |  FROM e WHERE event_type = 'click'),
        |p AS (SELECT event_id AS purchase_id, user_id, ts_ms AS p_ts
        |  FROM e WHERE event_type = 'purchase')
        |SELECT purchase_id, click_id, user_id,
        |  p_ts AS purchase_ts_ms, c_ts AS click_ts_ms
        |FROM p LEFT JOIN c ON user_id = c_user
        |  AND c_ts <= p_ts AND c_ts >= p_ts - 1800000
        |ORDER BY purchase_id, click_id""".stripMargin
  )
}
