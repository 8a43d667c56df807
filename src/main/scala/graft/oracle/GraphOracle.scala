package graft.oracle

/** DuckDB oracle SQL for the graph operators (SURVEY.md §2.6). Same
  * discipline as [[OracleSql]]: total-order ORDER BY, BIGINT casts where
  * DuckDB widens (sum(BIGINT) → HUGEINT), round(…,4) on float aggregates,
  * `epoch_ms` to reduce the ns-precision event timestamps.
  *
  * The iterative fixpoints (graph_cc, graph_sssp) are expressed as bounded
  * `WITH RECURSIVE` min-label / min-depth propagation — semantically the
  * fixpoint GraphX Pregel computes. PageRank/PPR are unrolled fixed-iteration
  * CTE chains over exact scaled-integer arithmetic (see [[pagerankSql]]) —
  * the float variants would not be hash-stable, the integer ones are.
  */
object GraphOracle {

  /** Shared CTE text: customer->part weighted edges. */
  private val edgesCte =
    """e AS (SELECT o_custkey AS src, l_partkey AS dst, count(*) AS w
      |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      |  GROUP BY 1, 2)""".stripMargin

  /** Shared CTE text: canonical co-purchase pairs with shared-order count. */
  // cp is referenced 2-6× by most graph oracles (both edge directions,
  // degree frames, scalar count subqueries); MATERIALIZED evaluates the
  // lineitem self-join once per query instead of once per reference —
  // identical rows/values, evaluation strategy only.
  private val copurchaseCte =
    """lp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
      |cp AS MATERIALIZED (SELECT x.p AS a, y.p AS b, count(*) AS w
      |  FROM lp x JOIN lp y ON x.ok = y.ok AND x.p < y.p
      |  GROUP BY 1, 2)""".stripMargin

  /** Unrolled fixed-iteration PageRank (10 CTE blocks, generated): the Spark
    * side iterates exact scaled-BIGINT arithmetic (mass = 1e12), and `//` on
    * non-negative integers is the same truncating division as Spark's `div`,
    * so each iteration is bit-identical — float PageRank could never be
    * hash-stable, integer PageRank is. `reset` is the per-vertex teleport
    * term: uniform for global PageRank, all-at-source for personalized.
    */
  private def pagerankSql(reset: String, r0: String): String = {
    val base =
      s"""WITH parts AS (SELECT p_partkey AS part FROM part),
         |lp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
         |e0 AS (SELECT x.p AS a, y.p AS b FROM lp x JOIN lp y ON x.ok = y.ok AND x.p < y.p
         |  GROUP BY 1, 2),
         |e AS (SELECT a AS src, b AS dst FROM e0 UNION ALL SELECT b, a FROM e0),
         |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
         |ed AS (SELECT e.src, e.dst, deg.deg FROM e JOIN deg ON e.src = deg.src),
         |n AS (SELECT count(*) AS n FROM parts),
         |r0 AS ($r0)""".stripMargin
    val iters = (1 to 10).map { i =>
      s"""c$i AS (SELECT ed.dst AS part, CAST(SUM(r${i - 1}.r // ed.deg) AS BIGINT) AS csum
         |  FROM ed JOIN r${i - 1} ON ed.src = r${i - 1}.part GROUP BY ed.dst),
         |r$i AS (SELECT p.part,
         |  CAST($reset + COALESCE(c$i.csum, 0) * 85 // 100 AS BIGINT) AS r
         |  FROM parts p CROSS JOIN n LEFT JOIN c$i ON p.part = c$i.part)""".stripMargin
    }.mkString(",\n")
    s"$base,\n$iters\nSELECT part, r AS rank_scaled FROM r10 ORDER BY rank_scaled DESC, part LIMIT 20"
  }

  /** Unrolled 6-round Bellman-Ford (min-plus), exact BIGINT — same
    * generation trick as [[pagerankSql]].
    */
  private val wssspSql: String = {
    val base =
      s"""WITH $copurchaseCte,
         |e2 AS (SELECT a, b, w FROM cp UNION ALL SELECT b, a, w FROM cp),
         |d0 AS (SELECT CAST(1 AS BIGINT) AS id, CAST(0 AS BIGINT) AS d)""".stripMargin
    val rounds = (1 to 6).map { i =>
      s"""d$i AS (SELECT id, CAST(min(d) AS BIGINT) AS d FROM (
         |  SELECT id, d FROM d${i - 1}
         |  UNION ALL
         |  SELECT e2.b AS id, d${i - 1}.d + e2.w AS d
         |  FROM d${i - 1} JOIN e2 ON e2.a = d${i - 1}.id) t GROUP BY id)""".stripMargin
    }.mkString(",\n")
    s"$base,\n$rounds\nSELECT id AS part, d AS wdist FROM d6 ORDER BY part"
  }

  /** Unrolled 4-step deterministic min-md5 random walk — the same
    * generation trick as [[wssspSql]]; each step's choice is the neighbor
    * minimizing md5(walk‖step‖neighbor), tie-break neighbor id (ties are
    * md5-collision-impossible in practice but the ORDER BY carries the
    * same tie key as the Spark max-struct anyway).
    */
  /** graph_matching_greedy: 4 unrolled mutual-proposal rounds; proposals
    * are row_number argmax by (w DESC, u), matched vertices leave via
    * NOT IN before the next round.
    */
  private val matchingGreedySql: String = {
    val base =
      s"""WITH $copurchaseCte,
         |e0 AS MATERIALIZED (
         |  SELECT a, b, CAST(w AS BIGINT) AS w FROM cp
         |  UNION ALL SELECT b, a, CAST(w AS BIGINT) AS w FROM cp)"""
        .stripMargin
    val rounds = (1 to 4).map { i =>
      s"""b$i AS (
         |  SELECT v, u, w FROM (
         |    SELECT a AS v, b AS u, w,
         |      row_number() OVER (PARTITION BY a ORDER BY w DESC, b) AS rn
         |    FROM e${i - 1}) WHERE rn = 1),
         |m$i AS MATERIALIZED (
         |  SELECT p1.v AS a, p1.u AS b, p1.w AS w,
         |    CAST($i AS BIGINT) AS round
         |  FROM b$i p1 JOIN b$i p2
         |    ON p1.v = p2.u AND p2.v = p1.u AND p1.v < p2.v),
         |e$i AS MATERIALIZED (
         |  SELECT * FROM e${i - 1}
         |  WHERE a NOT IN (SELECT a FROM m$i UNION ALL SELECT b FROM m$i)
         |    AND b NOT IN (SELECT a FROM m$i UNION ALL SELECT b FROM m$i))"""
        .stripMargin
    }.mkString(",\n")
    val sel = (1 to 4).map(i => s"SELECT a, b, w, round FROM m$i")
      .mkString("\nUNION ALL ")
    s"$base,\n$rounds\n$sel\nORDER BY a"
  }

  private val node2vecSql: String = {
    val base =
      s"""WITH $copurchaseCte,
         |e2 AS (SELECT a, b FROM cp UNION ALL SELECT b, a FROM cp),
         |seeds AS (SELECT a AS walk FROM (
         |  SELECT a, count(*) AS d FROM e2 GROUP BY 1) t
         |  ORDER BY d DESC, a LIMIT 4),
         |w0 AS (SELECT walk, walk AS node,
         |  CAST(-1 AS BIGINT) AS prev FROM seeds)""".stripMargin
    val steps = (1 to 4).map { i =>
      s"""w$i AS (SELECT walk, b AS node, v AS prev FROM (
         |  SELECT w.walk, w.node AS v, e2.b,
         |    row_number() OVER (PARTITION BY w.walk ORDER BY
         |      (CASE WHEN e2.b = w.prev THEN 2
         |            WHEN m.b IS NOT NULL THEN 1 ELSE 0 END),
         |      md5(CAST(w.walk AS VARCHAR) || '_' || '$i' || '_' ||
         |        CAST(e2.b AS VARCHAR)), e2.b) AS rn
         |  FROM w${i - 1} w JOIN e2 ON e2.a = w.node
         |  LEFT JOIN e2 m ON m.a = w.prev AND m.b = e2.b) t
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    val sel = (0 to 4)
      .map(i => s"SELECT walk, CAST($i AS BIGINT) AS step, node FROM w$i")
      .mkString("\nUNION ALL ")
    s"$base,\n$steps\n$sel\nORDER BY walk, step"
  }

  private val randomWalkSql: String = {
    val base =
      s"""WITH $copurchaseCte,
         |e2 AS (SELECT a, b FROM cp UNION ALL SELECT b, a FROM cp),
         |seeds AS (SELECT a AS walk FROM (
         |  SELECT a, count(*) AS d FROM e2 GROUP BY 1) t
         |  ORDER BY d DESC, a LIMIT 4),
         |w0 AS (SELECT walk, walk AS node FROM seeds)""".stripMargin
    val steps = (1 to 4).map { i =>
      s"""w$i AS (SELECT walk, b AS node FROM (
         |  SELECT w.walk, e2.b,
         |    row_number() OVER (PARTITION BY w.walk ORDER BY
         |      md5(CAST(w.walk AS VARCHAR) || '_' || '$i' || '_' ||
         |        CAST(e2.b AS VARCHAR)), e2.b) AS rn
         |  FROM w${i - 1} w JOIN e2 ON e2.a = w.node) t
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    val sel = (0 to 4)
      .map(i => s"SELECT walk, CAST($i AS BIGINT) AS step, node FROM w$i")
      .mkString("\nUNION ALL ")
    s"$base,\n$steps\n$sel\nORDER BY walk, step"
  }

  /** Unrolled 10-iteration BATCH personalized PageRank: the source key `s`
    * rides every CTE; the per-iteration reset row is re-injected by a
    * UNION ALL (support-sparse state, matching the Spark side's absence-
    * means-zero representation). Same generation trick as [[pagerankSql]].
    */
  private val pprBatchSql: String = {
    val srcVals = (1 to 5).map(i => s"($i)").mkString(", ")
    val base =
      s"""WITH lp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
         |e0 AS (SELECT x.p AS a, y.p AS b FROM lp x JOIN lp y ON x.ok = y.ok AND x.p < y.p
         |  GROUP BY 1, 2),
         |e AS MATERIALIZED (SELECT a AS src, b AS dst FROM e0 UNION ALL SELECT b, a FROM e0),
         |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
         |ed AS MATERIALIZED (SELECT e.src, e.dst, deg.deg FROM e JOIN deg ON e.src = deg.src),
         |srcs AS MATERIALIZED (SELECT CAST(s AS BIGINT) AS s FROM (VALUES $srcVals) AS t(s)),
         |r0 AS (SELECT s, s AS part, CAST(1000000000000 AS BIGINT) AS r FROM srcs)""".stripMargin
    // ed is hit once per unrolled iteration and r_i chains 10 deep — plain
    // CTEs redo the lineitem self-join 10× (r14: 87 s); MATERIALIZED pins
    // each frame to one evaluation, values bit-identical.
    val iters = (1 to 10).map { i =>
      s"""c$i AS (SELECT r.s, ed.dst AS part, CAST(SUM(r.r // ed.deg) AS BIGINT) AS csum
         |  FROM ed JOIN r${i - 1} r ON ed.src = r.part GROUP BY 1, 2),
         |r$i AS MATERIALIZED (SELECT s, part, CAST(SUM(rc) AS BIGINT) AS r FROM (
         |  SELECT s, part, csum * 85 // 100 AS rc FROM c$i
         |  UNION ALL SELECT s, s AS part, CAST(150000000000 AS BIGINT) AS rc FROM srcs) u
         |  GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |$iters
       |SELECT s AS src, part, r AS rank_scaled FROM (
       |  SELECT s, part, r,
       |    row_number() OVER (PARTITION BY s ORDER BY r DESC, part) AS rn
       |  FROM r10) t
       |WHERE rn <= 5
       |ORDER BY src, rank_scaled DESC, part""".stripMargin
  }

  /** Unrolled 4-round synchronous min-tie-break label propagation — per
    * round: neighbor-label histogram, row_number argmax (count desc, label
    * asc), isolated vertices keep their label via LEFT JOIN + COALESCE.
    */
  /** The LPA label chain (4 rounds) as reusable CTEs ending at `l4` —
    * shared by graph_lpa and graph_modularity so both oracles derive the
    * identical partition.
    */
  private val lpaCtes: String = {
    val base =
      s"""WITH $copurchaseCte,
         |e2 AS (SELECT a, b FROM cp UNION ALL SELECT b, a FROM cp),
         |l0 AS (SELECT p_partkey AS id, p_partkey AS lbl FROM part)""".stripMargin
    val rounds = (1 to 4).map { i =>
      s"""h$i AS (SELECT e2.b AS v, l.lbl AS lbl, count(*) AS c
         |  FROM e2 JOIN l${i - 1} l ON e2.a = l.id GROUP BY 1, 2),
         |t$i AS (SELECT v, lbl FROM (
         |  SELECT v, lbl, row_number() OVER (PARTITION BY v ORDER BY c DESC, lbl) AS rn
         |  FROM h$i) x WHERE rn = 1),
         |l$i AS (SELECT l.id, COALESCE(t$i.lbl, l.lbl) AS lbl
         |  FROM l${i - 1} l LEFT JOIN t$i ON l.id = t$i.v)""".stripMargin
    }.mkString(",\n")
    s"$base,\n$rounds"
  }

  private val lpaSql: String =
    s"$lpaCtes\nSELECT id AS part, lbl AS community FROM l4 ORDER BY part"

  /** The 8-landmark bounded-BFS frame (recursive, node-dedup per source)
    * ending at `md` = min hop per (src, node) — shared by
    * graph_closeness, graph_eccentricity and graph_hop_histogram so all
    * three derive from the identical traversal.
    */
  /** Full statements shared between their own map rows and the
    * graph_small_world composition.
    */
  private lazy val clusteringCoeffSql: String =
    s"""WITH $copurchaseCte,
       |bdir AS (SELECT a, b FROM cp UNION ALL SELECT b, a FROM cp),
       |deg AS (SELECT a, count(*) AS d FROM bdir GROUP BY a),
       |tri AS (
       |  SELECT count(*) AS n_triangles FROM cp e1
       |    JOIN cp e2 ON e2.a = e1.b
       |    JOIN cp e3 ON e3.a = e1.a AND e3.b = e2.b),
       |wed AS (SELECT CAST(sum(d * (d - 1)) // 2 AS BIGINT) AS n_wedges FROM deg)
       |SELECT n_triangles, n_wedges,
       |  floor(3 * n_triangles / n_wedges * 10000.0 + 0.5) / 10000.0 AS global_cc
       |FROM tri, wed""".stripMargin

  private lazy val avgPathLengthSql: String =
    s"""$landmarkBfsCtes
       |SELECT count(*) AS n_pairs, CAST(sum(d) AS BIGINT) AS sum_hops,
       |  CAST(max(d) AS BIGINT) AS diameter_lb,
       |  floor(CAST(sum(d) AS DOUBLE) / CAST(count(*) AS DOUBLE)
       |    * 10000.0 + 0.5) / 10000.0 AS mean_hops
       |FROM md WHERE d > 0""".stripMargin

  // e2 and md are each referenced once per unrolled Brandes level — left
  // plain, DuckDB re-inlines the recursive BFS per reference and the whole
  // chain re-expands exponentially (the r14 driver compare spent 156 s on
  // graph_edge_betweenness alone). MATERIALIZED pins one evaluation each,
  // same rows, same values — evaluation strategy only (§2.9 discipline).
  private val landmarkBfsCtes: String =
    s"""WITH RECURSIVE $copurchaseCte,
       |e2 AS MATERIALIZED (SELECT a, b FROM cp UNION ALL SELECT b, a FROM cp),
       |lm AS MATERIALIZED (SELECT p_partkey AS src FROM part ORDER BY 1 LIMIT 8),
       |bfs(src, node, d) AS (
       |  SELECT src, src, 0 FROM lm
       |  UNION
       |  SELECT bfs.src, e2.b, bfs.d + 1 FROM bfs JOIN e2 ON e2.a = bfs.node
       |  WHERE bfs.d < 6),
       |md AS MATERIALIZED (SELECT src, node, min(d) AS d FROM bfs GROUP BY 1, 2)""".stripMargin

  /** graph_harmonic: Σ over the 8 landmarks of round(1e9/d) per reached
    * node — each term nano-quantized BEFORE the fold (1e9/d for d in 1..6
    * rounds unambiguously), so the sum is an exact BIGINT in any order.
    */
  private val harmonicSql: String =
    s"""$landmarkBfsCtes
       |SELECT node AS part, count(*) AS n_sources,
       |  CAST(sum(CAST(round(1000000000.0 / CAST(d AS DOUBLE)) AS BIGINT))
       |    AS BIGINT) AS harmonic_nano,
       |  CAST(CAST(sum(CAST(round(1000000000.0 / CAST(d AS DOUBLE))
       |    AS BIGINT)) AS BIGINT) AS DOUBLE) / 1.0e9 AS harmonic
       |FROM md WHERE d > 0 GROUP BY node ORDER BY part""".stripMargin

  /** graph_edge_anomaly: configuration-model lift per w≥3 edge —
    * ONE exact integer division (w·2m·1e6 // deg_a·deg_b), top-20.
    */
  private val edgeAnomalySql: String =
    s"""WITH $copurchaseCte,
       |deg AS (SELECT v, CAST(sum(w) AS BIGINT) AS dw FROM (
       |  SELECT a AS v, w FROM cp UNION ALL SELECT b, w FROM cp) u
       |  GROUP BY 1),
       |m2t AS (SELECT CAST(sum(w) * 2 AS BIGINT) AS m2 FROM cp)
       |SELECT a, b, w, da, db,
       |  CAST((w * m2 * 1000000) // (da * db) AS BIGINT) AS lift_ppm
       |FROM (
       |  SELECT cp.a, cp.b, CAST(cp.w AS BIGINT) AS w,
       |    x.dw AS da, y.dw AS db, m2
       |  FROM cp JOIN deg x ON cp.a = x.v JOIN deg y ON cp.b = y.v, m2t
       |  WHERE cp.w >= 3)
       |ORDER BY lift_ppm DESC, a, b LIMIT 20""".stripMargin

  /** Landmark Brandes betweenness, unrolled per level over the
    * [[landmarkBfsCtes]] frame: σ path counts s1..s6 chain forward
    * (σ_h(node) = Σ preds' σ_{h-1}), then micro-quantized dependencies
    * d5..d1 chain backward — each contribution is the same fixed double
    * tree as the Spark op (`floor(σv/σw · (1e6+δw) + 0.5)`), summed in
    * BIGINT so accumulation order can't drift.
    */
  /** Shared by graph_betweenness and graph_edge_betweenness: landmark
    * BFS, σ forward chain s0..s6, micro-quantized δ backward chain
    * d6..d1 (see [[betweennessSql]]'s docstring for the arithmetic).
    */
  private val brandesCtes: String = {
    // every σ/δ frame is referenced 2-3× by the next level (sv, sw, dw,
    // NOT-IN) — plain CTEs re-expand the whole chain per reference
    // (branching ~3 per level ⇒ hundreds of BFS re-evaluations; the r14
    // driver compare burned 156 s + 100 s here). MATERIALIZED = evaluate
    // once, bit-identical values.
    val sigma = (1 to 6).map { h =>
      s"""s$h AS MATERIALIZED (
         |  SELECT md.src, md.node, CAST(sum(sp.sigma) AS BIGINT) AS sigma
         |  FROM md JOIN e2 ON e2.b = md.node
         |  JOIN s${h - 1} sp ON sp.src = md.src AND sp.node = e2.a
         |  WHERE md.d = $h GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    val deltas = (5 to 1 by -1).map { h =>
      s"""c$h AS MATERIALIZED (
         |  SELECT sv.src, sv.node AS v,
         |    CAST(sum(CAST(floor(CAST(sv.sigma AS DOUBLE) /
         |      CAST(sw.sigma AS DOUBLE) *
         |      CAST(1000000 + dw.delta AS DOUBLE) + 0.5) AS BIGINT))
         |      AS BIGINT) AS delta
         |  FROM e2
         |  JOIN s$h sv ON sv.node = e2.a
         |  JOIN s${h + 1} sw ON sw.src = sv.src AND sw.node = e2.b
         |  JOIN d${h + 1} dw ON dw.src = sv.src AND dw.node = sw.node
         |  GROUP BY 1, 2),
         |d$h AS MATERIALIZED (
         |  SELECT sv.src, sv.node,
         |    CAST(coalesce(c.delta, 0) AS BIGINT) AS delta
         |  FROM s$h sv LEFT JOIN c$h c
         |    ON c.src = sv.src AND c.v = sv.node)""".stripMargin
    }.mkString(",\n")
    s"""$landmarkBfsCtes,
       |s0 AS MATERIALIZED (SELECT src, src AS node, CAST(1 AS BIGINT) AS sigma FROM lm),
       |$sigma,
       |d6 AS MATERIALIZED (SELECT src, node, CAST(0 AS BIGINT) AS delta
       |  FROM md WHERE d = 6),
       |$deltas""".stripMargin
  }

  private val betweennessSql: String = {
    val union = (1 to 6).map(h =>
      s"SELECT src, node, delta FROM d$h").mkString("\n|  UNION ALL ")
    s"""$brandesCtes,
       |allv AS ($union)
       |SELECT node AS part, count(*) AS n_sources,
       |  CAST(sum(delta) AS BIGINT) AS bt_micro,
       |  CAST(CAST(sum(delta) AS BIGINT) AS DOUBLE) / 1.0e6 AS betweenness
       |FROM allv GROUP BY 1 ORDER BY part""".stripMargin
  }

  /** Girvan–Newman edge betweenness over the same Brandes frames: every
    * shortest-path DAG edge v→w (level h → h+1, h = 0..5) earns the
    * identical micro-quantized credit floor(σv/σw·(1e6+δw)+0.5), folded
    * to canonical undirected edges, top-20.
    */
  private val edgeBetweennessSql: String = {
    val credits = (0 to 5).map { h =>
      s"""ec$h AS (
         |  SELECT sv.src, e2.a AS va, e2.b AS wb,
         |    CAST(floor(CAST(sv.sigma AS DOUBLE) /
         |      CAST(sw.sigma AS DOUBLE) *
         |      CAST(1000000 + dw.delta AS DOUBLE) + 0.5) AS BIGINT) AS c
         |  FROM e2
         |  JOIN s$h sv ON sv.node = e2.a
         |  JOIN s${h + 1} sw ON sw.src = sv.src AND sw.node = e2.b
         |  JOIN d${h + 1} dw ON dw.src = sv.src AND dw.node = sw.node)""".stripMargin
    }.mkString(",\n")
    val union = (0 to 5).map(h =>
      s"SELECT va, wb, c FROM ec$h").mkString("\n|  UNION ALL ")
    s"""$brandesCtes,
       |$credits,
       |alle AS ($union)
       |SELECT least(va, wb) AS a, greatest(va, wb) AS b,
       |  count(*) AS n_contribs, CAST(sum(c) AS BIGINT) AS eb_micro,
       |  CAST(CAST(sum(c) AS BIGINT) AS DOUBLE) / 1.0e6 AS edge_betweenness
       |FROM alle GROUP BY 1, 2
       |ORDER BY eb_micro DESC, a, b LIMIT 20""".stripMargin
  }

  /** Unrolled 6-step md5-argmin walks (2 per top-8 hub) + the distance-≤2
    * skip-gram pair fold — graph_walk_pairs' oracle.
    */
  private val walkPairsSql: String = {
    val steps = (1 to 6).map { t =>
      s"""s$t AS (SELECT walk, node FROM (
         |  SELECT w.walk, e2.b AS node,
         |    row_number() OVER (PARTITION BY w.walk
         |      ORDER BY md5(w.walk || '_${t}_' || CAST(e2.b AS VARCHAR)),
         |        e2.b) AS rn
         |  FROM s${t - 1} w JOIN e2 ON e2.a = w.node) x
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    val union = (0 to 6).map(t =>
      s"SELECT walk, CAST($t AS BIGINT) AS step, node FROM s$t")
      .mkString("\n|  UNION ALL ")
    s"""WITH $copurchaseCte,
       |e2 AS MATERIALIZED (SELECT a, b FROM cp UNION ALL SELECT b, a FROM cp),
       |deg AS (SELECT a, count(*) AS d FROM e2 GROUP BY 1),
       |seeds AS (SELECT a AS seed FROM deg ORDER BY d DESC, a LIMIT 8),
       |s0 AS (SELECT CAST(seed AS VARCHAR) || '_' || CAST(widx AS VARCHAR)
       |    AS walk, seed AS node
       |  FROM seeds, (SELECT unnest([0, 1]) AS widx) t),
       |$steps,
       |allw AS MATERIALIZED ($union)
       |SELECT least(x.node, y.node) AS a, greatest(x.node, y.node) AS b,
       |  count(*) AS n_pairs
       |FROM allw x JOIN allw y ON x.walk = y.walk
       |  AND y.step > x.step AND y.step <= x.step + 2
       |WHERE x.node <> y.node
       |GROUP BY 1, 2
       |ORDER BY n_pairs DESC, a, b LIMIT 20""".stripMargin
  }

  private val modularitySql: String =
    s"""$lpaCtes,
       |lbl AS (SELECT id, lbl AS community FROM l4),
       |m2t AS (SELECT CAST(sum(w) * 2 AS BIGINT) AS m2 FROM cp),
       |deg AS (SELECT v, CAST(sum(w) AS BIGINT) AS d FROM (
       |  SELECT a AS v, w FROM cp UNION ALL SELECT b, w FROM cp) u
       |  GROUP BY 1),
       |degc AS (SELECT community, CAST(sum(d) AS BIGINT) AS dc,
       |    count(*) AS n_nodes
       |  FROM deg JOIN lbl ON v = id GROUP BY 1),
       |inc AS (SELECT la.community AS community, CAST(sum(w) AS BIGINT) AS iw
       |  FROM cp JOIN lbl la ON cp.a = la.id JOIN lbl lb ON cp.b = lb.id
       |  WHERE la.community = lb.community GROUP BY 1),
       |fin AS (SELECT degc.community AS community, n_nodes,
       |    coalesce(iw, 0) AS iw, dc, m2
       |  FROM degc LEFT JOIN inc ON degc.community = inc.community, m2t)
       |SELECT community, n_nodes, iw AS in_w, dc AS deg_w,
       |  CAST(CAST(floor((CAST(iw * 2 AS DOUBLE) / CAST(m2 AS DOUBLE)
       |    - (CAST(dc AS DOUBLE) / CAST(m2 AS DOUBLE)) *
       |      (CAST(dc AS DOUBLE) / CAST(m2 AS DOUBLE))) * 1.0e9 + 0.5)
       |    AS BIGINT) AS DOUBLE) / 1.0e9 AS q_contrib
       |FROM fin ORDER BY community""".stripMargin

  /** Unrolled 3-sweep deterministic Louvain (the graph_lpa trick applied
    * to modularity-optimizing moves): per sweep, community degree totals,
    * per-node adjacent-community weights, exact HUGEINT move gains
    * 2m·(k_ic − k_ia) − k_i·(tot_c − tot_a + k_i) (the Spark side widens
    * to DECIMAL(38,0) — identical integer values), best strictly-positive
    * gain wins with ties to the smallest community id. The tail is
    * [[modularitySql]]'s Q decomposition over the final labels.
    */
  private val louvainLevel1Ctes: String = {
    // every multiply-referenced CTE is MATERIALIZED: DuckDB inlines plain
    // CTEs per reference, and the 5 references/sweep to l{i-1} would
    // otherwise re-evaluate the whole chain exponentially (the probe ran
    // >15 min at sf0.01 un-materialized, <5 s materialized)
    val base =
      s"""WITH $copurchaseCte,
         |cpm AS MATERIALIZED (SELECT a, b, w FROM cp),
         |bdir AS MATERIALIZED (
         |  SELECT a, b, w FROM cpm UNION ALL SELECT b, a, w FROM cpm),
         |degk AS MATERIALIZED (SELECT a AS id, CAST(sum(w) AS BIGINT) AS k
         |  FROM bdir GROUP BY 1),
         |m2t AS MATERIALIZED (
         |  SELECT CAST(sum(w) * 2 AS BIGINT) AS m2 FROM cpm),
         |l0 AS MATERIALIZED (SELECT p.p_partkey AS id, p.p_partkey AS c,
         |    coalesce(degk.k, 0) AS k
         |  FROM part p LEFT JOIN degk ON degk.id = p.p_partkey)""".stripMargin
    val rounds = (1 to 3).map { i =>
      s"""tot$i AS MATERIALIZED (SELECT c, CAST(sum(k) AS BIGINT) AS tot
         |  FROM l${i - 1} GROUP BY 1),
         |kic$i AS MATERIALIZED (SELECT bdir.a AS id, l.c AS nc,
         |    CAST(sum(w) AS BIGINT) AS kic
         |  FROM bdir JOIN l${i - 1} l ON bdir.b = l.id GROUP BY 1, 2),
         |kia$i AS MATERIALIZED (SELECT kc.id, kc.kic AS kia
         |  FROM kic$i kc JOIN l${i - 1} l ON kc.id = l.id AND kc.nc = l.c),
         |cand$i AS MATERIALIZED (
         |  SELECT kc.id, kc.nc,
         |    CAST(m2 AS HUGEINT) * (kc.kic - coalesce(ka.kia, 0))
         |      - CAST(l.k AS HUGEINT) * (tc.tot - ta.tot + l.k) AS gain
         |  FROM kic$i kc
         |  JOIN l${i - 1} l ON kc.id = l.id
         |  JOIN tot$i tc ON tc.c = kc.nc
         |  JOIN tot$i ta ON ta.c = l.c
         |  LEFT JOIN kia$i ka ON ka.id = kc.id
         |  CROSS JOIN m2t
         |  WHERE kc.nc <> l.c),
         |best$i AS MATERIALIZED (SELECT id, nc FROM (
         |  SELECT id, nc,
         |    row_number() OVER (PARTITION BY id ORDER BY gain DESC, nc) AS rn
         |  FROM cand$i WHERE gain > 0) x WHERE rn = 1),
         |l$i AS MATERIALIZED (SELECT l.id, coalesce(b.nc, l.c) AS c, l.k
         |  FROM l${i - 1} l LEFT JOIN best$i b ON l.id = b.id)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |$rounds,
       |lbl AS MATERIALIZED (SELECT id, c AS community FROM l3)""".stripMargin
  }

  private val louvainSql: String =
    s"""$louvainLevel1Ctes,
       |deg AS (SELECT v, CAST(sum(w) AS BIGINT) AS d FROM (
       |  SELECT a AS v, w FROM cpm UNION ALL SELECT b, w FROM cpm) u
       |  GROUP BY 1),
       |degc AS (SELECT community, CAST(sum(d) AS BIGINT) AS dc,
       |    count(*) AS n_nodes
       |  FROM deg JOIN lbl ON v = id GROUP BY 1),
       |inc AS (SELECT la.community AS community, CAST(sum(w) AS BIGINT) AS iw
       |  FROM cpm JOIN lbl la ON cpm.a = la.id JOIN lbl lb ON cpm.b = lb.id
       |  WHERE la.community = lb.community GROUP BY 1),
       |fin AS (SELECT degc.community AS community, n_nodes,
       |    coalesce(iw, 0) AS iw, dc, m2
       |  FROM degc LEFT JOIN inc ON degc.community = inc.community, m2t)
       |SELECT community, n_nodes, iw AS in_w, dc AS deg_w,
       |  CAST(CAST(floor((CAST(iw * 2 AS DOUBLE) / CAST(m2 AS DOUBLE)
       |    - (CAST(dc AS DOUBLE) / CAST(m2 AS DOUBLE)) *
       |      (CAST(dc AS DOUBLE) / CAST(m2 AS DOUBLE))) * 1.0e9 + 0.5)
       |    AS BIGINT) AS DOUBLE) / 1.0e9 AS q_contrib
       |FROM fin ORDER BY community""".stripMargin

  /** Multi-level Louvain: [[louvainLevel1Ctes]]'s labels, then the graph
    * coarsens by community (inter-community edges + intra weight as a
    * self-loop), 3 more unrolled sweeps run on the coarse graph (the
    * self-loop feeds 2s into the supernode degree; 2m is coarsening-
    * invariant so m2t carries over verbatim), labels project back, and
    * both levels report the ORIGINAL-graph partition Q with per-community
    * contributions nano-quantized to BIGINT before the exact sum.
    */
  private val louvainMultiSql: String = {
    val coarsen =
      s"""cmap AS MATERIALIZED (
         |  SELECT la.community AS ca, lb.community AS cb, w
         |  FROM cpm JOIN lbl la ON cpm.a = la.id JOIN lbl lb ON cpm.b = lb.id),
         |inter AS MATERIALIZED (
         |  SELECT least(ca, cb) AS a, greatest(ca, cb) AS b,
         |    CAST(sum(w) AS BIGINT) AS w
         |  FROM cmap WHERE ca <> cb GROUP BY 1, 2),
         |selfw AS MATERIALIZED (
         |  SELECT ca AS id, CAST(sum(w) AS BIGINT) AS s
         |  FROM cmap WHERE ca = cb GROUP BY 1),
         |bdir2 AS MATERIALIZED (
         |  SELECT a, b, w FROM inter UNION ALL SELECT b, a, w FROM inter),
         |degk2 AS MATERIALIZED (
         |  SELECT coalesce(p.id, selfw.id) AS id,
         |    CAST(coalesce(p.pk, 0) + 2 * coalesce(selfw.s, 0) AS BIGINT) AS k
         |  FROM (SELECT a AS id, CAST(sum(w) AS BIGINT) AS pk
         |        FROM bdir2 GROUP BY 1) p
         |  FULL JOIN selfw ON p.id = selfw.id),
         |g0 AS MATERIALIZED (
         |  SELECT v.part AS id, v.part AS c, coalesce(degk2.k, 0) AS k
         |  FROM (SELECT DISTINCT community AS part FROM lbl) v
         |  LEFT JOIN degk2 ON degk2.id = v.part)""".stripMargin
    val rounds2 = (1 to 3).map { i =>
      s"""t2_$i AS MATERIALIZED (SELECT c, CAST(sum(k) AS BIGINT) AS tot
         |  FROM g${i - 1} GROUP BY 1),
         |kc2_$i AS MATERIALIZED (SELECT bdir2.a AS id, l.c AS nc,
         |    CAST(sum(w) AS BIGINT) AS kic
         |  FROM bdir2 JOIN g${i - 1} l ON bdir2.b = l.id GROUP BY 1, 2),
         |ka2_$i AS MATERIALIZED (SELECT kc.id, kc.kic AS kia
         |  FROM kc2_$i kc JOIN g${i - 1} l ON kc.id = l.id AND kc.nc = l.c),
         |cd2_$i AS MATERIALIZED (
         |  SELECT kc.id, kc.nc,
         |    CAST(m2 AS HUGEINT) * (kc.kic - coalesce(ka.kia, 0))
         |      - CAST(l.k AS HUGEINT) * (tc.tot - ta.tot + l.k) AS gain
         |  FROM kc2_$i kc
         |  JOIN g${i - 1} l ON kc.id = l.id
         |  JOIN t2_$i tc ON tc.c = kc.nc
         |  JOIN t2_$i ta ON ta.c = l.c
         |  LEFT JOIN ka2_$i ka ON ka.id = kc.id
         |  CROSS JOIN m2t
         |  WHERE kc.nc <> l.c),
         |bs2_$i AS MATERIALIZED (SELECT id, nc FROM (
         |  SELECT id, nc,
         |    row_number() OVER (PARTITION BY id ORDER BY gain DESC, nc) AS rn
         |  FROM cd2_$i WHERE gain > 0) x WHERE rn = 1),
         |g$i AS MATERIALIZED (SELECT l.id, coalesce(b.nc, l.c) AS c, l.k
         |  FROM g${i - 1} l LEFT JOIN bs2_$i b ON l.id = b.id)""".stripMargin
    }.mkString(",\n")
    def qCte(name: String, lblCte: String): String =
      s"""$name AS (
         |  SELECT CAST(floor((CAST(coalesce(iw, 0) * 2 AS DOUBLE)
         |      / CAST(m2 AS DOUBLE)
         |    - (CAST(dc AS DOUBLE) / CAST(m2 AS DOUBLE)) *
         |      (CAST(dc AS DOUBLE) / CAST(m2 AS DOUBLE))) * 1.0e9 + 0.5)
         |    AS BIGINT) AS qn
         |  FROM (SELECT community, CAST(sum(d) AS BIGINT) AS dc
         |        FROM degv JOIN $lblCte ON v = id GROUP BY 1) degc
         |  LEFT JOIN (SELECT la.community AS community,
         |        CAST(sum(w) AS BIGINT) AS iw
         |      FROM cpm JOIN $lblCte la ON cpm.a = la.id
         |        JOIN $lblCte lb ON cpm.b = lb.id
         |      WHERE la.community = lb.community GROUP BY 1) inc
         |    ON degc.community = inc.community, m2t)""".stripMargin
    s"""$louvainLevel1Ctes,
       |$coarsen,
       |$rounds2,
       |lbl2 AS MATERIALIZED (
       |  SELECT lbl.id, g3.c AS community FROM lbl JOIN g3 ON lbl.community = g3.id),
       |degv AS MATERIALIZED (SELECT v, CAST(sum(w) AS BIGINT) AS d FROM (
       |  SELECT a AS v, w FROM cpm UNION ALL SELECT b, w FROM cpm) u
       |  GROUP BY 1),
       |${qCte("q1", "lbl")},
       |${qCte("q2", "lbl2")}
       |SELECT * FROM (
       |  SELECT CAST(1 AS BIGINT) AS level, count(*) AS n_communities,
       |    CAST(CAST(sum(qn) AS BIGINT) AS DOUBLE) / 1.0e9 AS q FROM q1
       |  UNION ALL
       |  SELECT CAST(2 AS BIGINT), count(*),
       |    CAST(CAST(sum(qn) AS BIGINT) AS DOUBLE) / 1.0e9 FROM q2) f
       |ORDER BY level""".stripMargin
  }

  /** Three-level Louvain dendrogram: [[louvainLevel1Ctes]]'s labels, then
    * TWO coarsen+sweep levels generated from one parameterized template
    * (coarsen: inter-community edges, intra weight + carried self-loops
    * folded into the supernode self-loop; sweeps: the rounds2 gain
    * algebra verbatim, HUGEINT ↔ DECIMAL(38,0)). The early-stop on the
    * Spark side is output-identical to this fully unrolled chain (a move
    * fixpoint coarsens and sweeps as the identity). Output = the
    * flattened community path per original vertex.
    */
  private val louvainDendroSql: String = {
    def coarsen(pfx: String, edges: String, self: Option[String],
                lblCte: String, lblCol: String): String = {
      val selfCtes = self match {
        case None =>
          s"""sf$pfx AS MATERIALIZED (
             |  SELECT ca AS id, CAST(sum(w) AS BIGINT) AS s
             |  FROM cmap$pfx WHERE ca = cb GROUP BY 1)""".stripMargin
        case Some(sl) =>
          s"""sfa$pfx AS (SELECT ca AS id, CAST(sum(w) AS BIGINT) AS s
             |  FROM cmap$pfx WHERE ca = cb GROUP BY 1),
             |sfc$pfx AS (SELECT l.$lblCol AS id,
             |    CAST(sum(sl.s) AS BIGINT) AS s
             |  FROM $sl sl JOIN $lblCte l ON sl.id = l.id GROUP BY 1),
             |sf$pfx AS MATERIALIZED (
             |  SELECT coalesce(a.id, c.id) AS id,
             |    CAST(coalesce(a.s, 0) + coalesce(c.s, 0) AS BIGINT) AS s
             |  FROM sfa$pfx a FULL JOIN sfc$pfx c ON a.id = c.id)""".stripMargin
      }
      s"""cmap$pfx AS MATERIALIZED (
         |  SELECT la.$lblCol AS ca, lb.$lblCol AS cb, w
         |  FROM $edges e JOIN $lblCte la ON e.a = la.id
         |    JOIN $lblCte lb ON e.b = lb.id),
         |ie$pfx AS MATERIALIZED (
         |  SELECT least(ca, cb) AS a, greatest(ca, cb) AS b,
         |    CAST(sum(w) AS BIGINT) AS w
         |  FROM cmap$pfx WHERE ca <> cb GROUP BY 1, 2),
         |$selfCtes,
         |bd$pfx AS MATERIALIZED (
         |  SELECT a, b, w FROM ie$pfx UNION ALL SELECT b, a, w FROM ie$pfx),
         |dk$pfx AS MATERIALIZED (
         |  SELECT coalesce(p.id, s.id) AS id,
         |    CAST(coalesce(p.pk, 0) + 2 * coalesce(s.s, 0) AS BIGINT) AS k
         |  FROM (SELECT a AS id, CAST(sum(w) AS BIGINT) AS pk
         |        FROM bd$pfx GROUP BY 1) p
         |  FULL JOIN sf$pfx s ON p.id = s.id),
         |${pfx}0 AS MATERIALIZED (
         |  SELECT v.part AS id, v.part AS c, coalesce(dk$pfx.k, 0) AS k
         |  FROM (SELECT DISTINCT $lblCol AS part FROM $lblCte) v
         |  LEFT JOIN dk$pfx ON dk$pfx.id = v.part)""".stripMargin
    }
    def sweeps(pfx: String): String = (1 to 3).map { i =>
      s"""t$pfx$i AS MATERIALIZED (SELECT c, CAST(sum(k) AS BIGINT) AS tot
         |  FROM $pfx${i - 1} GROUP BY 1),
         |kc$pfx$i AS MATERIALIZED (SELECT bd$pfx.a AS id, l.c AS nc,
         |    CAST(sum(w) AS BIGINT) AS kic
         |  FROM bd$pfx JOIN $pfx${i - 1} l ON bd$pfx.b = l.id GROUP BY 1, 2),
         |ka$pfx$i AS MATERIALIZED (SELECT kc.id, kc.kic AS kia
         |  FROM kc$pfx$i kc JOIN $pfx${i - 1} l
         |    ON kc.id = l.id AND kc.nc = l.c),
         |cd$pfx$i AS MATERIALIZED (
         |  SELECT kc.id, kc.nc,
         |    CAST(m2 AS HUGEINT) * (kc.kic - coalesce(ka.kia, 0))
         |      - CAST(l.k AS HUGEINT) * (tc.tot - ta.tot + l.k) AS gain
         |  FROM kc$pfx$i kc
         |  JOIN $pfx${i - 1} l ON kc.id = l.id
         |  JOIN t$pfx$i tc ON tc.c = kc.nc
         |  JOIN t$pfx$i ta ON ta.c = l.c
         |  LEFT JOIN ka$pfx$i ka ON ka.id = kc.id
         |  CROSS JOIN m2t
         |  WHERE kc.nc <> l.c),
         |bs$pfx$i AS MATERIALIZED (SELECT id, nc FROM (
         |  SELECT id, nc,
         |    row_number() OVER (PARTITION BY id ORDER BY gain DESC, nc) AS rn
         |  FROM cd$pfx$i WHERE gain > 0) x WHERE rn = 1),
         |$pfx$i AS MATERIALIZED (SELECT l.id, coalesce(b.nc, l.c) AS c, l.k
         |  FROM $pfx${i - 1} l LEFT JOIN bs$pfx$i b ON l.id = b.id)""".stripMargin
    }.mkString(",\n")
    s"""$louvainLevel1Ctes,
       |${coarsen("g", "cpm", None, "lbl", "community")},
       |${sweeps("g")},
       |${coarsen("h", "ieg", Some("sfg"), "g3", "c")},
       |${sweeps("h")}
       |SELECT lbl.id AS id, lbl.community AS c1, g3.c AS c2, h3.c AS c3
       |FROM lbl JOIN g3 ON lbl.community = g3.id JOIN h3 ON g3.c = h3.id
       |ORDER BY id""".stripMargin
  }

  /** Generated k-level traversal oracle — the khop_2/khop_3 shape with the
    * level chain unrolled to any k (matches the frontier-expansion
    * `GraphAlgebra.khopK`, whose min-hop labeling is identical to this
    * full re-expansion).
    */
  private def khopSql(k: Int, cohortPred: String): String = {
    val levels = new StringBuilder(
      "p1 AS (SELECT DISTINCT dst FROM e JOIN cohort USING (src))")
    for (i <- 2 to k) {
      levels.append(s",\nc$i AS (SELECT DISTINCT src FROM e JOIN p${i - 1} USING (dst))")
      levels.append(s",\np$i AS (SELECT DISTINCT dst FROM e JOIN c$i USING (src))")
    }
    val joins = (1 until k).map(i =>
      s"LEFT JOIN (SELECT dst, $i AS h FROM p$i) h$i ON p$k.dst = h$i.dst").mkString("\n")
    val coal = ((1 until k).map(i => s"h$i.h") :+ s"$k").mkString(", ")
    s"""WITH $edgesCte,
       |cohort AS (SELECT c_custkey AS src FROM customer WHERE $cohortPred),
       |$levels
       |SELECT p$k.dst AS part, CAST(coalesce($coal) AS BIGINT) AS hop
       |FROM p$k
       |$joins
       |ORDER BY part""".stripMargin
  }

  /** Unrolled fixed-round k-truss peel: per round, per-edge triangle
    * support over the CURRENT survivor set via the wedge join (the
    * semantic spec; the Spark plan uses adjacency arrays +
    * `array_intersect` — identical counts since neighbor sets are
    * distinct), keep edges with support ≥ k−2. Final pass reports the true
    * support over the last survivor set, support-0 edges kept via LEFT
    * JOIN (the Spark side's array_intersect yields 0 for them naturally).
    */
  private def ktrussSql(k: Int, rounds: Int): String = {
    val base =
      s"""WITH $copurchaseCte,
         |e0 AS MATERIALIZED (SELECT a, b FROM cp)""".stripMargin
    val its = (1 to rounds).map { i =>
      val p = i - 1
      s"""b$p AS MATERIALIZED (SELECT a, b FROM e$p UNION ALL SELECT b, a FROM e$p),
         |s$i AS (SELECT e.a, e.b, count(*) AS sup
         |  FROM e$p e JOIN b$p x ON x.a = e.a JOIN b$p y ON y.a = e.b AND y.b = x.b
         |  GROUP BY e.a, e.b),
         |e$i AS MATERIALIZED (SELECT a, b FROM s$i WHERE sup >= ${k - 2})""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |$its,
       |bf AS (SELECT a, b FROM e$rounds UNION ALL SELECT b, a FROM e$rounds),
       |sf AS (SELECT e.a, e.b, count(*) AS sup
       |  FROM e$rounds e JOIN bf x ON x.a = e.a JOIN bf y ON y.a = e.b AND y.b = x.b
       |  GROUP BY e.a, e.b)
       |SELECT e.a, e.b, CAST(coalesce(sf.sup, 0) AS BIGINT) AS support
       |FROM e$rounds e LEFT JOIN sf ON e.a = sf.a AND e.b = sf.b
       |ORDER BY e.a, e.b""".stripMargin
  }

  /** Unrolled fixed-round k-core peel. Each round references the previous
    * survivor set twice (both edge endpoints), so every per-round CTE is
    * MATERIALIZED — without it DuckDB inlines the chain and the plan
    * doubles per round (2^R blowup; verified: the naive spelling never
    * finishes at 8 rounds, the materialized one runs in under a second).
    */
  private def kcoreSql(k: Int, rounds: Int): String = {
    val base =
      s"""WITH $copurchaseCte,
         |e2 AS MATERIALIZED (SELECT a, b FROM cp UNION ALL SELECT b, a FROM cp),
         |v0 AS MATERIALIZED (SELECT DISTINCT a AS id FROM e2)""".stripMargin
    val its = (1 to rounds).map { i =>
      s"""d$i AS (SELECT e2.a AS id, count(*) AS deg
         |  FROM e2 JOIN v${i - 1} x ON e2.a = x.id JOIN v${i - 1} y ON e2.b = y.id
         |  GROUP BY 1),
         |v$i AS MATERIALIZED (SELECT id FROM d$i WHERE deg >= $k)""".stripMargin
    }.mkString(",\n")
    // final pass mirrors the op: true induced degree over the LAST
    // survivor set (the loop's d$rounds measures against v${rounds-1})
    s"""$base,
       |$its,
       |df AS (SELECT e2.a AS id, count(*) AS deg
       |  FROM e2 JOIN v$rounds x ON e2.a = x.id JOIN v$rounds y ON e2.b = y.id
       |  GROUP BY 1)
       |SELECT v.id AS part, coalesce(df.deg, 0) AS deg
       |FROM v$rounds v LEFT JOIN df ON v.id = df.id ORDER BY part""".stripMargin
  }

  /** Nested unrolled peels for the core-number profile: level L peels the
    * PREVIOUS level's survivor-induced canonical edges at k ∈
    * {16,48,64,72}, 6 rounds each — the [[kcoreSql]] round shape chained, every
    * multiply-referenced frame MATERIALIZED.
    */
  private val coreNumberSql: String = {
    val ks = Seq(16, 48, 64, 72)
    val levels = ks.zipWithIndex.map { case (k, li) =>
      val l = li + 1
      val rounds = (1 to 6).map { i =>
        s"""d${l}_$i AS (SELECT e.a AS id, count(*) AS deg
           |  FROM b$l e JOIN sv${l}_${i - 1} x ON e.a = x.id
           |  JOIN sv${l}_${i - 1} y ON e.b = y.id GROUP BY 1),
           |sv${l}_$i AS MATERIALIZED (SELECT id FROM d${l}_$i WHERE deg >= $k)""".stripMargin
      }.mkString(",\n")
      s"""b$l AS MATERIALIZED (
         |  SELECT a, b FROM cp$li UNION ALL SELECT b, a FROM cp$li),
         |sv${l}_0 AS MATERIALIZED (SELECT DISTINCT a AS id FROM b$l),
         |$rounds,
         |cp$l AS MATERIALIZED (SELECT c.a, c.b FROM cp$li c
         |  JOIN sv${l}_6 x ON c.a = x.id JOIN sv${l}_6 y ON c.b = y.id)""".stripMargin
    }.mkString(",\n")
    val lvlUnion = ks.zipWithIndex.map { case (k, li) =>
      s"SELECT id, CAST($k AS BIGINT) AS lvl FROM sv${li + 1}_6"
    }.mkString("\n|  UNION ALL ")
    s"""WITH $copurchaseCte,
       |cp0 AS MATERIALIZED (SELECT a, b FROM cp),
       |verts AS MATERIALIZED (SELECT DISTINCT a AS id FROM
       |  (SELECT a FROM cp0 UNION ALL SELECT b FROM cp0) u(a)),
       |$levels,
       |lv AS ($lvlUnion),
       |mx AS (SELECT id, max(lvl) AS core_level FROM lv GROUP BY 1)
       |SELECT verts.id AS part, coalesce(mx.core_level, 0) AS core_level
       |FROM verts LEFT JOIN mx ON verts.id = mx.id ORDER BY part""".stripMargin
  }

  /** BFS + min-parent pointers + a recursive walk back from the
    * largest-id reachable vertex — the path-TRACE oracle (the op's
    * deterministic min-id parent rule makes exactly one path the answer).
    */
  private val pathTraceSql: String =
    s"""WITH RECURSIVE $copurchaseCte,
       |e2 AS MATERIALIZED (SELECT a, b FROM cp UNION ALL SELECT b, a FROM cp),
       |bfs(node, d) AS (
       |  SELECT CAST(1 AS BIGINT), 0
       |  UNION
       |  SELECT e2.b, bfs.d + 1 FROM bfs JOIN e2 ON e2.a = bfs.node
       |  WHERE bfs.d < 6),
       |md AS MATERIALIZED (SELECT node, min(d) AS d FROM bfs GROUP BY 1),
       |tgt AS (SELECT max(node) AS tid FROM md),
       |par AS MATERIALIZED (
       |  SELECT db.node AS v, db.d AS dv, min(e2.a) AS parent
       |  FROM e2 JOIN md db ON e2.b = db.node JOIN md da ON e2.a = da.node
       |  WHERE da.d = db.d - 1 GROUP BY 1, 2),
       |walk(part, step) AS (
       |  SELECT tid, (SELECT d FROM md WHERE node = tid) FROM tgt
       |  UNION ALL
       |  SELECT par.parent, walk.step - 1
       |  FROM walk JOIN par ON par.v = walk.part AND par.dv = walk.step
       |  WHERE walk.step > 0)
       |SELECT part, CAST(step AS BIGINT) AS step FROM walk
       |ORDER BY step""".stripMargin

  /** Joint power-of-two degree histogram: the bucket is an exact
    * powers-table join (no float log2 — libm drift), cells keyed
    * (lo, hi).
    */
  private val degreeJointSql: String =
    s"""WITH $copurchaseCte,
       |cpm AS MATERIALIZED (SELECT a, b FROM cp),
       |deg AS MATERIALIZED (SELECT v, count(*) AS d FROM (
       |  SELECT a AS v FROM cpm UNION ALL SELECT b FROM cpm) u GROUP BY 1),
       |powers AS (SELECT CAST(range AS BIGINT) AS p,
       |  CAST(1 AS BIGINT) << range AS pw FROM range(0, 31)),
       |bucketed AS MATERIALIZED (SELECT v, max(p) AS bkt
       |  FROM deg JOIN powers ON pw <= d GROUP BY 1)
       |SELECT least(ba.bkt, bb.bkt) AS bucket_lo,
       |  greatest(ba.bkt, bb.bkt) AS bucket_hi, count(*) AS n_edges
       |FROM cpm JOIN bucketed ba ON cpm.a = ba.v
       |JOIN bucketed bb ON cpm.b = bb.v
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Per-edge embeddedness via the wedge join (the ktruss oracle's
    * semantic spec for common-neighbor support), exact integer ppm
    * Jaccard, top-20.
    */
  private val edgeEmbeddednessSql: String =
    s"""WITH $copurchaseCte,
       |cpm AS MATERIALIZED (SELECT a, b FROM cp),
       |bdir AS MATERIALIZED (SELECT a, b FROM cpm UNION ALL SELECT b, a FROM cpm),
       |deg AS MATERIALIZED (SELECT a AS v, count(*) AS d FROM bdir GROUP BY 1),
       |supp AS (SELECT cpm.a, cpm.b, count(*) AS common
       |  FROM cpm JOIN bdir x ON x.a = cpm.a JOIN bdir y ON y.a = cpm.b
       |    AND y.b = x.b
       |  GROUP BY 1, 2),
       |alle AS (SELECT cpm.a, cpm.b, coalesce(supp.common, 0) AS common,
       |    da.d AS da, db.d AS db
       |  FROM cpm LEFT JOIN supp ON cpm.a = supp.a AND cpm.b = supp.b
       |  JOIN deg da ON cpm.a = da.v JOIN deg db ON cpm.b = db.v)
       |SELECT a, b, common, da, db,
       |  CASE WHEN da + db - 2 - common > 0
       |    THEN common * 1000000 // (da + db - 2 - common)
       |    ELSE 1000000 END AS jac_ppm
       |FROM alle ORDER BY jac_ppm DESC, a, b LIMIT 20""".stripMargin

  /** Per-vertex local clustering via the wedge-join supports (the
    * ktruss/embeddedness semantic spec), zero-support edges kept through
    * a LEFT JOIN so both engines rank the identical vertex set.
    */
  private val localCcSql: String =
    s"""WITH $copurchaseCte,
       |cpm AS MATERIALIZED (SELECT a, b FROM cp),
       |bdir AS MATERIALIZED (SELECT a, b FROM cpm UNION ALL SELECT b, a FROM cpm),
       |deg AS MATERIALIZED (SELECT a AS v, count(*) AS d FROM bdir GROUP BY 1),
       |supp AS (SELECT cpm.a, cpm.b, count(*) AS common
       |  FROM cpm JOIN bdir x ON x.a = cpm.a JOIN bdir y ON y.a = cpm.b
       |    AND y.b = x.b
       |  GROUP BY 1, 2),
       |sup0 AS (SELECT cpm.a, cpm.b, coalesce(supp.common, 0) AS sup
       |  FROM cpm LEFT JOIN supp ON cpm.a = supp.a AND cpm.b = supp.b),
       |perv AS (SELECT v, CAST(sum(sup) AS BIGINT) AS s2 FROM (
       |  SELECT a AS v, sup FROM sup0 UNION ALL SELECT b, sup FROM sup0) u
       |  GROUP BY 1)
       |SELECT perv.v AS part, deg.d AS degree,
       |  CAST(s2 // 2 AS BIGINT) AS n_triangles,
       |  CAST(s2 * 1000000 // (deg.d * (deg.d - 1)) AS BIGINT) AS cc_ppm
       |FROM perv JOIN deg ON perv.v = deg.v
       |WHERE deg.d >= 2
       |ORDER BY cc_ppm DESC, part LIMIT 20""".stripMargin

  /** Unrolled 6-iteration integer HITS (hubs & authorities on the
    * bipartite purchase graph): each half-step max-normalizes by a
    * truncating division — identical floor semantics on both engines, so
    * the chain is bit-identical. Every per-round CTE is referenced twice
    * (the raw scores by the max probe AND the normalize) → MATERIALIZED,
    * same as [[kcoreSql]].
    */
  private val hitsSql: String = {
    val S = "1000000000000"
    val base =
      s"""WITH e AS MATERIALIZED (
         |  SELECT o_custkey AS src, l_partkey AS dst
         |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
         |  GROUP BY 1, 2),
         |h0 AS MATERIALIZED (SELECT DISTINCT src AS id, CAST($S AS BIGINT) AS x FROM e)""".stripMargin
    val its = (1 to 6).map { i =>
      s"""ar$i AS MATERIALIZED (SELECT e.dst AS id, CAST(sum(h.x) AS BIGINT) AS xr
         |  FROM e JOIN h${i - 1} h ON e.src = h.id GROUP BY 1),
         |qa$i AS (SELECT greatest(CAST(1 AS BIGINT), CAST(max(xr) // $S AS BIGINT)) AS q FROM ar$i),
         |a$i AS MATERIALIZED (SELECT id, CAST(xr // q AS BIGINT) AS x FROM ar$i, qa$i),
         |hr$i AS MATERIALIZED (SELECT e.src AS id, CAST(sum(a.x) AS BIGINT) AS xr
         |  FROM e JOIN a$i a ON e.dst = a.id GROUP BY 1),
         |qh$i AS (SELECT greatest(CAST(1 AS BIGINT), CAST(max(xr) // $S AS BIGINT)) AS q FROM hr$i),
         |h$i AS MATERIALIZED (SELECT id, CAST(xr // q AS BIGINT) AS x FROM hr$i, qh$i)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |$its,
       |ta AS (SELECT 'p' AS side, id, x AS score_scaled FROM a6
       |       ORDER BY x DESC, id LIMIT 20),
       |th AS (SELECT 'c' AS side, id, x AS score_scaled FROM h6
       |       ORDER BY x DESC, id LIMIT 20)
       |SELECT side, id, score_scaled FROM (
       |  SELECT * FROM ta UNION ALL SELECT * FROM th)
       |ORDER BY side, score_scaled DESC, id""".stripMargin
  }

  /** Unrolled 6-iteration integer eigenvector centrality on the undirected
    * co-purchase graph — the [[hitsSql]] machinery with one frame.
    */
  private val eigenSql: String = {
    val S = "1000000000000"
    val base =
      s"""WITH $copurchaseCte,
         |e2 AS MATERIALIZED (SELECT a, b FROM cp UNION ALL SELECT b, a FROM cp),
         |x0 AS MATERIALIZED (SELECT DISTINCT a AS id, CAST($S AS BIGINT) AS x FROM e2)""".stripMargin
    val its = (1 to 6).map { i =>
      s"""xr$i AS MATERIALIZED (SELECT e2.a AS id, CAST(sum(x.x) AS BIGINT) AS xr
         |  FROM e2 JOIN x${i - 1} x ON e2.b = x.id GROUP BY 1),
         |q$i AS (SELECT greatest(CAST(1 AS BIGINT), CAST(max(xr) // $S AS BIGINT)) AS q FROM xr$i),
         |x$i AS MATERIALIZED (SELECT id, CAST(xr // q AS BIGINT) AS x FROM xr$i, q$i)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |$its
       |SELECT id AS part, x AS score_scaled FROM x6
       |ORDER BY score_scaled DESC, part LIMIT 20""".stripMargin
  }

  /** Shared CTE prefix of the graph_scc / graph_bowtie / graph_condensation
    * family: the directed transition backbone (lead over (ln, p) within
    * each order, hash-coarsened to 512 cells, w ≥ 2), full pairwise
    * reachability, and the min-mutual-reach SCC labeling `sccl(v, scc)`.
    */
  private val sccCtes: String =
    """WITH RECURSIVE lp AS (
      |  SELECT l_orderkey AS ok, l_linenumber AS ln,
      |    l_partkey % 512 AS p
      |  FROM lineitem),
      |t AS (
      |  SELECT p, lead(p) OVER (PARTITION BY ok ORDER BY ln, p) AS np
      |  FROM lp),
      |e0 AS (
      |  SELECT p AS s, np AS d, count(*) AS w
      |  FROM t WHERE np IS NOT NULL AND np <> p
      |  GROUP BY 1, 2),
      |e AS MATERIALIZED (SELECT s, d FROM e0 WHERE w >= 2),
      |reach0(s, d) AS (
      |  SELECT s, d FROM e
      |  UNION
      |  SELECT r.s, e.d FROM reach0 r JOIN e ON r.d = e.s),
      |-- the recursive closure can't carry MATERIALIZED itself; pin it
      |-- through a materialized alias so its 2-4 downstream references
      |-- (mutual twice, bowtie's in/out probes) evaluate it once
      |reach AS MATERIALIZED (SELECT s, d FROM reach0),
      |mutual AS (
      |  SELECT a.s AS v, a.d AS m
      |  FROM reach a JOIN reach b ON a.s = b.d AND a.d = b.s),
      |verts AS (SELECT s AS v FROM e UNION SELECT d FROM e),
      |sccl AS MATERIALIZED (
      |  SELECT v.v,
      |    coalesce(min(CASE WHEN mu.m < v.v THEN mu.m END), v.v) AS scc
      |  FROM verts v LEFT JOIN mutual mu ON mu.v = v.v
      |  GROUP BY 1)""".stripMargin

  val sql: Map[String, String] = Map(
    "graph_scc" ->
      s"""$sccCtes
         |SELECT v AS part, scc FROM sccl ORDER BY part""".stripMargin,

    // exact-integer truncated Katz: 4 unrolled walk-count rounds (the
    // eigencentrality CTE shape), katz*256 = 256 + 64p1 + 16p2 + 4p3 + p4
    "graph_katz" ->
      s"""WITH $copurchaseCte,
         |e2 AS MATERIALIZED (SELECT a, b FROM cp UNION ALL SELECT b, a FROM cp),
         |p0 AS MATERIALIZED (SELECT DISTINCT a AS id, CAST(1 AS BIGINT) AS p FROM e2),
         |p1 AS MATERIALIZED (SELECT e2.a AS id, CAST(sum(p.p) AS BIGINT) AS p
         |  FROM e2 JOIN p0 p ON e2.b = p.id GROUP BY 1),
         |p2 AS MATERIALIZED (SELECT e2.a AS id, CAST(sum(p.p) AS BIGINT) AS p
         |  FROM e2 JOIN p1 p ON e2.b = p.id GROUP BY 1),
         |p3 AS MATERIALIZED (SELECT e2.a AS id, CAST(sum(p.p) AS BIGINT) AS p
         |  FROM e2 JOIN p2 p ON e2.b = p.id GROUP BY 1),
         |p4 AS MATERIALIZED (SELECT e2.a AS id, CAST(sum(p.p) AS BIGINT) AS p
         |  FROM e2 JOIN p3 p ON e2.b = p.id GROUP BY 1)
         |SELECT p0.id AS part,
         |  CAST(256 + 64 * p1.p + 16 * p2.p + 4 * p3.p + p4.p AS BIGINT)
         |    AS katz_scaled
         |FROM p0 JOIN p1 ON p0.id = p1.id JOIN p2 ON p0.id = p2.id
         |  JOIN p3 ON p0.id = p3.id JOIN p4 ON p0.id = p4.id
         |ORDER BY katz_scaled DESC, part LIMIT 20""".stripMargin,

    // node2vec p/q bias as a class rank (out 0 < in 1 < return 2) ahead of
    // the hash tiebreak; the in-triangle mark is a LEFT JOIN on (prev, b)
    "graph_node2vec_walks" -> node2vecSql,

    // 4 synchronous mutual-proposal rounds, argmax by (w DESC, u)
    "graph_matching_greedy" -> matchingGreedySql,

    // first-touch collapse before pairing; time-respecting 7-day band
    "graph_temporal_reach" ->
      """WITH tx AS (
        |  SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
        |    user_id AS u, min(epoch_ms(ts)) AS ms
        |  FROM events
        |  WHERE json_extract_string(props, '$.k') IS NOT NULL
        |  GROUP BY 1, 2)
        |SELECT a.u AS user_id, count(DISTINCT b.u) AS reach,
        |  count(*) AS n_paths
        |FROM tx a JOIN tx b ON a.item = b.item
        |  AND b.ms > a.ms AND b.ms <= a.ms + 604800000
        |  AND a.u <> b.u
        |GROUP BY 1 ORDER BY reach DESC, n_paths DESC, user_id
        |LIMIT 20""".stripMargin,

    // overlap/cosine link scores on the jaccard pair stream; >= 3 common
    // floor keeps the leaderboard off single-cooccurrence noise
    "graph_overlap" ->
      s"""WITH $edgesCte,
         |deg AS (SELECT dst AS p, count(*) AS d FROM e GROUP BY dst),
         |pairs AS (
         |  SELECT e1.dst AS p1, e2.dst AS p2, count(*) AS common
         |  FROM e e1 JOIN e e2 ON e1.src = e2.src AND e1.dst < e2.dst
         |  GROUP BY 1, 2)
         |SELECT pairs.p1, pairs.p2, common,
         |  floor(CAST(common AS DOUBLE) /
         |    CAST(least(d1.d, d2.d) AS DOUBLE) * 10000.0 + 0.5) / 10000.0
         |    AS overlap,
         |  floor(CAST(common AS DOUBLE) /
         |    sqrt(CAST(d1.d AS DOUBLE) * CAST(d2.d AS DOUBLE))
         |    * 10000.0 + 0.5) / 10000.0 AS cosine
         |FROM pairs
         |JOIN deg d1 ON pairs.p1 = d1.p
         |JOIN deg d2 ON pairs.p2 = d2.p
         |WHERE common >= 3
         |ORDER BY overlap DESC, cosine DESC, pairs.p1, pairs.p2
         |LIMIT 20""".stripMargin,

    "graph_attack_tolerance" ->
      s"""WITH RECURSIVE $copurchaseCte,
         |und AS MATERIALIZED (SELECT a, b FROM cp WHERE w >= 2),
         |-- DISTINCT over UNION ALL, not bare UNION: under WITH RECURSIVE
         |-- DuckDB 1.0 treats a two-branch UNION CTE as recursive-shaped
         |-- and skips the dedup (measured 2x vertex count)
         |verts AS MATERIALIZED (SELECT DISTINCT v FROM (
         |  SELECT a AS v FROM und UNION ALL SELECT b FROM und)),
         |deg AS (
         |  SELECT v, count(*) AS dg FROM (
         |    SELECT a AS v FROM und UNION ALL SELECT b FROM und)
         |  GROUP BY 1),
         |hubs AS MATERIALIZED (SELECT v FROM deg ORDER BY dg DESC, v LIMIT 8),
         |e1 AS MATERIALIZED (SELECT a, b FROM und
         |  UNION ALL SELECT b, a FROM und),
         |-- both floods seed from LOCAL-MIN nodes only (graph_percolation's
         |-- value-preserving rewrite: a component's global min is a local
         |-- min and floods everything, so min(label) per node — and hence
         |-- the giant-size rollups — are bit-identical)
         |seed1 AS MATERIALIZED (SELECT v FROM verts vt
         |  WHERE NOT EXISTS (SELECT 1 FROM e1
         |    WHERE e1.a = vt.v AND e1.b < vt.v)),
         |r1(node, label) AS (
         |  SELECT v, v FROM seed1
         |  UNION
         |  SELECT e1.b, r1.label FROM r1 JOIN e1 ON e1.a = r1.node),
         |g1 AS (
         |  SELECT max(cnt) AS giant_before FROM (
         |    SELECT count(*) AS cnt FROM (
         |      SELECT node, min(label) AS comp FROM r1 GROUP BY node)
         |    GROUP BY comp)),
         |und2 AS (
         |  SELECT a, b FROM und
         |  WHERE a NOT IN (SELECT v FROM hubs)
         |    AND b NOT IN (SELECT v FROM hubs)),
         |v2 AS MATERIALIZED (SELECT v FROM verts WHERE v NOT IN (SELECT v FROM hubs)),
         |e2 AS MATERIALIZED (SELECT a, b FROM und2
         |  UNION ALL SELECT b, a FROM und2),
         |seed2 AS MATERIALIZED (SELECT v FROM v2 vt
         |  WHERE NOT EXISTS (SELECT 1 FROM e2
         |    WHERE e2.a = vt.v AND e2.b < vt.v)),
         |r2(node, label) AS (
         |  SELECT v, v FROM seed2
         |  UNION
         |  SELECT e2.b, r2.label FROM r2 JOIN e2 ON e2.a = r2.node),
         |g2 AS (
         |  SELECT max(cnt) AS giant_after FROM (
         |    SELECT count(*) AS cnt FROM (
         |      SELECT node, min(label) AS comp FROM r2 GROUP BY node)
         |    GROUP BY comp)),
         |nv AS (SELECT count(*) AS n_vertices FROM verts),
         |ne AS (SELECT count(*) AS n_edges FROM und)
         |SELECT n_vertices, n_edges,
         |  CAST(giant_before AS BIGINT) AS giant_before,
         |  CAST(giant_after AS BIGINT) AS giant_after,
         |  CASE WHEN giant_before > 0 THEN
         |    floor(CAST(giant_after AS DOUBLE) /
         |      CAST(giant_before AS DOUBLE) * 10000.0 + 0.5) / 10000.0
         |    END AS retained_share
         |FROM nv, ne, g1, g2""".stripMargin,

    "graph_temporal_density" ->
      """WITH lp AS (
        |  SELECT DISTINCT year(l_shipdate) * 100 + month(l_shipdate)
        |      AS ym,
        |    l_orderkey AS ok, l_partkey AS p
        |  FROM lineitem),
        |e AS (
        |  SELECT DISTINCT x.ym, x.p AS a, y.p AS b
        |  FROM lp x JOIN lp y
        |    ON x.ym = y.ym AND x.ok = y.ok AND x.p < y.p),
        |ec AS (SELECT ym, count(*) AS n_edges FROM e GROUP BY 1),
        |vc AS (
        |  SELECT ym, count(*) AS n_parts
        |  FROM (SELECT DISTINCT ym, p FROM lp) GROUP BY 1)
        |SELECT vc.ym, n_parts, coalesce(n_edges, 0) AS n_edges,
        |  CASE WHEN n_parts > 1 THEN
        |    floor(2.0 * CAST(coalesce(n_edges, 0) AS DOUBLE) /
        |      (CAST(n_parts AS DOUBLE) * CAST(n_parts - 1 AS DOUBLE))
        |      * 10000.0 + 0.5) / 10000.0 END AS density
        |FROM vc LEFT JOIN ec ON ec.ym = vc.ym
        |ORDER BY vc.ym""".stripMargin,

    "graph_simrank" -> {
      // 3 unrolled iterations of the integer-quantized SimRank update —
      // generated by the same loop shape as GraphOps.graphSimrank
      val its = (1 to 3).map { k =>
        s"""s$k AS (
           |  SELECT q.x AS a, q.y AS b,
           |    (4 * q.ssum) // (5 * dx.n * dy.n) AS sq
           |  FROM (SELECT ex.src AS x, ey.src AS y, sum(sp.sq) AS ssum
           |        FROM e ex JOIN s${k - 1} sp ON sp.a = ex.dst
           |        JOIN e ey ON ey.dst = sp.b
           |        WHERE ex.src <> ey.src GROUP BY 1, 2) q
           |  JOIN deg dx ON dx.v = q.x JOIN deg dy ON dy.v = q.y
           |  WHERE (4 * q.ssum) // (5 * dx.n * dy.n) > 0
           |  UNION ALL
           |  SELECT v, v, CAST(1000000000 AS BIGINT) FROM deg)""".stripMargin
      }.mkString(",\n")
      s"""WITH lp AS (
         |  SELECT DISTINCT l_orderkey AS ok, l_partkey % 64 AS p
         |  FROM lineitem),
         |und AS (
         |  SELECT x.p AS a, y.p AS b
         |  FROM lp x JOIN lp y ON x.ok = y.ok AND x.p < y.p
         |  GROUP BY 1, 2 HAVING count(*) >= 2),
         |e AS (SELECT a AS src, b AS dst FROM und
         |  UNION ALL SELECT b, a FROM und),
         |deg AS (SELECT src AS v, count(*) AS n FROM e GROUP BY 1),
         |s0 AS (SELECT v AS a, v AS b, CAST(1000000000 AS BIGINT) AS sq
         |  FROM deg),
         |$its
         |SELECT a, b, CAST(sq AS DOUBLE) / 1000000000.0 AS simrank
         |FROM s3 WHERE a < b
         |ORDER BY simrank DESC, a, b LIMIT 20""".stripMargin
    },

    "graph_motifs" ->
      """WITH lp AS (
        |  SELECT l_orderkey AS ok, l_linenumber AS ln,
        |    l_partkey % 512 AS p
        |  FROM lineitem),
        |t AS (
        |  SELECT p, lead(p) OVER (PARTITION BY ok ORDER BY ln, p) AS np
        |  FROM lp),
        |e0 AS (
        |  SELECT p AS s, np AS d, count(*) AS w
        |  FROM t WHERE np IS NOT NULL AND np <> p
        |  GROUP BY 1, 2),
        |e AS (SELECT s, d FROM e0 WHERE w >= 2),
        |p2 AS (
        |  SELECT x.s AS a, x.d AS b, y.d AS c
        |  FROM e x JOIN e y ON x.d = y.s AND x.s <> y.d),
        |ffl AS (
        |  SELECT count(*) AS n_ffl FROM p2
        |  WHERE EXISTS (SELECT 1 FROM e z WHERE z.s = p2.a AND z.d = p2.c)),
        |cyc AS (
        |  SELECT count(*) AS n_cycle3 FROM p2
        |  WHERE a < b AND a < c AND EXISTS
        |    (SELECT 1 FROM e z WHERE z.s = p2.c AND z.d = p2.a)),
        |rcp AS (
        |  SELECT count(*) AS n_reciprocal FROM e x
        |  WHERE x.s < x.d AND EXISTS
        |    (SELECT 1 FROM e y WHERE y.s = x.d AND y.d = x.s)),
        |tot AS (SELECT count(*) AS n_edges FROM e)
        |SELECT n_edges, n_ffl, n_cycle3, n_reciprocal
        |FROM tot, ffl, cyc, rcp""".stripMargin,

    "graph_bowtie" ->
      s"""$sccCtes,
         |core AS (
         |  SELECT scc FROM (SELECT scc, count(*) AS sz FROM sccl GROUP BY 1)
         |  ORDER BY sz DESC, scc LIMIT 1),
         |cls AS (
         |  SELECT s.v AS part,
         |    CASE WHEN s.scc = (SELECT scc FROM core) THEN 'core'
         |      WHEN EXISTS (SELECT 1 FROM reach r JOIN sccl c ON c.v = r.d
         |        WHERE r.s = s.v AND c.scc = (SELECT scc FROM core))
         |        THEN 'in'
         |      WHEN EXISTS (SELECT 1 FROM reach r JOIN sccl c ON c.v = r.s
         |        WHERE r.d = s.v AND c.scc = (SELECT scc FROM core))
         |        THEN 'out'
         |      ELSE 'other' END AS cls
         |  FROM sccl s)
         |SELECT cls, count(*) AS n_cells, min(part) AS min_cell
         |FROM cls GROUP BY 1 ORDER BY 1""".stripMargin,

    "graph_condensation" ->
      s"""$sccCtes,
         |ce AS MATERIALIZED (
         |  SELECT DISTINCT a.scc AS src, b.scc AS dst
         |  FROM e JOIN sccl a ON a.v = e.s JOIN sccl b ON b.v = e.d
         |  WHERE a.scc <> b.scc),
         |nodes AS (SELECT scc, count(*) AS n_members FROM sccl GROUP BY 1),
         |lvl(node, l) AS (
         |  SELECT scc, 0 FROM nodes
         |  UNION
         |  SELECT ce.dst, r.l + 1 FROM lvl r JOIN ce ON ce.src = r.node),
         |lev AS (SELECT node, max(l) AS level FROM lvl GROUP BY 1),
         |od AS (SELECT src, count(*) AS n_succ FROM ce GROUP BY 1)
         |SELECT n.scc, n.n_members, CAST(lev.level AS BIGINT) AS level,
         |  coalesce(od.n_succ, CAST(0 AS BIGINT)) AS n_succ
         |FROM nodes n JOIN lev ON lev.node = n.scc
         |LEFT JOIN od ON od.src = n.scc
         |ORDER BY n.scc""".stripMargin,

    "graph_eccentricity" ->
      s"""$landmarkBfsCtes
         |SELECT node AS part, count(*) AS n_sources,
         |  CAST(max(d) AS BIGINT) AS ecc_lb
         |FROM md GROUP BY 1 ORDER BY part""".stripMargin,

    "graph_betweenness" -> betweennessSql,
    "graph_edge_betweenness" -> edgeBetweennessSql,
    "graph_harmonic" -> harmonicSql,
    "graph_edge_anomaly" -> edgeAnomalySql,

    // circuit rank: E − V + C over the w≥2 subgraph, V = all parts —
    // the same recursive min-label CC frame as graph_cc, then counts
    "graph_circuit_rank" ->
      s"""WITH RECURSIVE $copurchaseCte,
         |e2 AS MATERIALIZED (SELECT a, b FROM cp WHERE w >= 2
         |       UNION ALL SELECT b, a FROM cp WHERE w >= 2),
         |seed AS MATERIALIZED (
         |  SELECT p_partkey AS node FROM part p
         |  WHERE NOT EXISTS (SELECT 1 FROM e2
         |    WHERE e2.a = p.p_partkey AND e2.b < p.p_partkey)),
         |reach(node, label) AS (
         |  SELECT node, node FROM seed
         |  UNION
         |  SELECT e2.b, reach.label FROM reach JOIN e2 ON e2.a = reach.node),
         |lab AS (SELECT node, min(label) AS comp FROM reach GROUP BY node)
         |SELECT count(*) AS n_vertices,
         |  (SELECT count(*) FROM cp WHERE w >= 2) AS n_edges,
         |  count(DISTINCT comp) AS n_components,
         |  (SELECT count(*) FROM cp WHERE w >= 2) - count(*)
         |    + count(DISTINCT comp) AS circuit_rank
         |FROM lab""".stripMargin,

    // dominating set: one synchronous election round — every vertex picks
    // the min-(md5 priority, id) member of its closed neighborhood
    "graph_dominating_set" -> {
      def p(col: String): String =
        s"CAST('0x' || substr(md5(CAST($col AS VARCHAR)), 1, 8) AS BIGINT)"
      s"""WITH $copurchaseCte,
         |e2 AS MATERIALIZED (SELECT a, b FROM cp WHERE w >= 2
         |       UNION ALL SELECT b, a FROM cp WHERE w >= 2),
         |closed AS (
         |  SELECT a AS v, b AS u FROM e2
         |  UNION ALL SELECT p_partkey, p_partkey FROM part),
         |elect AS (
         |  SELECT v, min({'p': ${p("u")}, 'u': u}).u AS dominator
         |  FROM closed GROUP BY 1),
         |doms AS (SELECT DISTINCT dominator AS v FROM elect)
         |SELECT e.v AS part, e.dominator,
         |  e.v IN (SELECT v FROM doms) AS is_dominator
         |FROM elect e ORDER BY part""".stripMargin
    },
    "graph_walk_pairs" -> walkPairsSql,

    // neighborhood property rollup: scaled-long price sum, one quantized
    // divide for the mean, order-free max
    "graph_neighbor_props" ->
      s"""WITH $copurchaseCte,
         |bothd AS (SELECT a, b, w FROM cp UNION ALL SELECT b, a, w FROM cp)
         |SELECT a AS part, count(*) AS n_neighbors,
         |  CAST(sum(w) AS BIGINT) AS w_total,
         |  CAST(sum(CAST(round(p_retailprice * 10000) AS BIGINT)) AS DOUBLE)
         |    / 10000.0 AS price_sum,
         |  floor(CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT))
         |      AS DOUBLE) / (100.0 * CAST(count(*) AS DOUBLE))
         |    * 10000.0 + 0.5) / 10000.0 AS price_mean,
         |  max(p_retailprice) AS price_max
         |FROM bothd JOIN part ON p_partkey = b
         |GROUP BY 1 ORDER BY part""".stripMargin,

    "graph_weight_dist" ->
      s"""WITH $copurchaseCte,
         |hist AS (SELECT w, count(*) AS n_edges FROM cp GROUP BY 1),
         |tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM cp)
         |SELECT w, n_edges,
         |  floor(CAST(w * n_edges AS DOUBLE) / CAST(tw AS DOUBLE)
         |    * 10000.0 + 0.5) / 10000.0 AS mass_share
         |FROM hist, tot ORDER BY w""".stripMargin,

    "graph_avg_path_length" -> avgPathLengthSql,

    "graph_closeness" ->
      s"""$landmarkBfsCtes
         |SELECT node AS part, count(*) AS n_reached,
         |  CAST(sum((2000000000 + d) // (2 * d)) AS BIGINT) AS harmonic_nano
         |FROM md WHERE d > 0 GROUP BY 1 ORDER BY part""".stripMargin,

    // the closeness frame globally folded: exact round(1e9/d) integers,
    // one final mean (r14 wave B)
    "graph_global_efficiency" ->
      s"""$landmarkBfsCtes
         |SELECT count(*) AS n_pairs,
         |  floor(CAST(sum((2000000000 + d) // (2 * d)) AS DOUBLE) / 1.0e9
         |    / CAST(count(*) AS DOUBLE) * 10000.0 + 0.5) / 10000.0
         |    AS global_efficiency
         |FROM md WHERE d > 0""".stripMargin,

    "graph_hop_histogram" ->
      s"""$landmarkBfsCtes,
         |h AS (SELECT CAST(d AS BIGINT) AS hop, count(*) AS n_pairs FROM md
         |  WHERE d > 0 GROUP BY 1),
         |c AS (
         |  SELECT hop, n_pairs,
         |    CAST(sum(n_pairs) OVER (ORDER BY hop
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS cum,
         |    CAST(sum(n_pairs) OVER () AS BIGINT) AS tot
         |  FROM h)
         |SELECT hop, n_pairs,
         |  floor(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) * 10000.0 + 0.5)
         |    / 10000.0 AS cum_share
         |FROM c ORDER BY hop""".stripMargin,

    "graph_hits" -> hitsSql,
    "graph_eigencentrality" -> eigenSql,
    "graph_kcore" -> kcoreSql(68, 6),
    "graph_core_number" -> coreNumberSql,
    "graph_path_trace" -> pathTraceSql,
    "graph_degree_joint" -> degreeJointSql,
    "graph_edge_embeddedness" -> edgeEmbeddednessSql,
    "graph_local_cc" -> localCcSql,
    "graph_ktruss" -> ktrussSql(12, 3),

    "graph_ego_net" ->
      s"""WITH $copurchaseCte,
         |nb AS (SELECT b AS id FROM cp WHERE a = 1
         |       UNION SELECT a FROM cp WHERE b = 1),
         |v AS (SELECT id FROM nb UNION SELECT 1)
         |SELECT cp.a, cp.b, cp.w FROM cp
         |JOIN v x ON cp.a = x.id
         |JOIN v y ON cp.b = y.id
         |ORDER BY cp.a, cp.b""".stripMargin,

    // per-term integer scaling makes the float AA sum order-independent;
    // ln(integer deg) is the identical IEEE double on both engines
    "graph_adamic_adar" ->
      s"""WITH $edgesCte,
         |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
         |t AS (SELECT e1.dst AS p1, e2.dst AS p2,
         |    CAST(round(1000000000.0 / ln(deg.deg)) AS BIGINT) AS tt
         |  FROM e e1
         |  JOIN e e2 ON e1.src = e2.src AND e1.dst < e2.dst
         |  JOIN deg ON deg.src = e1.src),
         |a AS (SELECT p1, p2, CAST(sum(tt) AS BIGINT) AS aa_scaled,
         |    count(*) AS common FROM t GROUP BY 1, 2)
         |SELECT p1, p2, common, CAST(aa_scaled AS DOUBLE) / 1000000000.0 AS aa
         |FROM a ORDER BY aa_scaled DESC, p1, p2 LIMIT 20""".stripMargin,

    "graph_reciprocity" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey, l_linenumber, l_partkey
        |  FROM lineitem),
        |seq AS (
        |  SELECT DISTINCT l_partkey AS src, nxt AS dst FROM (
        |    SELECT l_partkey,
        |      lead(l_partkey, 1) OVER (PARTITION BY l_orderkey
        |        ORDER BY l_linenumber, l_partkey) AS nxt
        |    FROM li) t
        |  WHERE nxt IS NOT NULL AND nxt <> l_partkey),
        |r AS (
        |  SELECT count(*) AS n_reciprocal FROM seq
        |  WHERE EXISTS (SELECT 1 FROM seq s2
        |    WHERE s2.src = seq.dst AND s2.dst = seq.src)),
        |n AS (SELECT count(*) AS n_edges FROM seq)
        |SELECT n_edges, n_reciprocal,
        |  floor(CAST(n_reciprocal AS DOUBLE) / CAST(n_edges AS DOUBLE)
        |    * 10000.0 + 0.5) / 10000.0 AS reciprocity
        |FROM n, r""".stripMargin,

    "graph_butterflies" ->
      s"""WITH $edgesCte,
         |c AS (
         |  SELECT e1.dst AS p1, e2.dst AS p2, count(*) AS cn
         |  FROM e e1 JOIN e e2 ON e1.src = e2.src AND e1.dst < e2.dst
         |  GROUP BY 1, 2)
         |SELECT count(*) AS n_part_pairs,
         |  CAST(sum((cn * (cn - 1)) // 2) AS BIGINT) AS n_butterflies,
         |  CAST(max(cn) AS BIGINT) AS max_common
         |FROM c""".stripMargin,

    "graph_degree_gini" ->
      s"""WITH $copurchaseCte,
         |e2 AS (SELECT a, b FROM cp UNION ALL SELECT b, a FROM cp),
         |deg AS (SELECT a, count(*) AS d FROM e2 GROUP BY 1),
         |bv AS (SELECT d, count(*) AS m FROM deg GROUP BY 1),
         |c AS (
         |  SELECT d, m,
         |    CAST(coalesce(sum(m) OVER (ORDER BY d
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS cb
         |  FROM bv),
         |agg AS (
         |  SELECT CAST(sum(m) AS BIGINT) AS n,
         |    CAST(sum(d * m) AS BIGINT) AS sx,
         |    CAST(sum(d * (cb * m + (m * (m + 1)) // 2)) AS BIGINT)
         |      AS six
         |  FROM c)
         |SELECT n AS n_nodes,
         |  floor(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) * 10000.0 + 0.5)
         |    / 10000.0 AS mean_degree,
         |  floor((2.0 * CAST(six AS DOUBLE) -
         |    CAST(n + 1 AS DOUBLE) * CAST(sx AS DOUBLE)) /
         |    (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)) * 10000.0 + 0.5)
         |    / 10000.0 AS degree_gini
         |FROM agg""".stripMargin,

    "graph_local_bridges" ->
      s"""WITH $copurchaseCte,
         |e2 AS (SELECT a, b FROM cp UNION ALL SELECT b, a FROM cp),
         |s AS (
         |  SELECT cp.a AS a, cp.b AS b, count(*) AS sup
         |  FROM cp
         |  JOIN e2 x ON x.a = cp.a
         |  JOIN e2 y ON y.a = cp.b AND y.b = x.b
         |  GROUP BY 1, 2)
         |SELECT count(*) AS n_edges,
         |  CAST(sum(CASE WHEN s.sup IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_local_bridges,
         |  floor(CAST(sum(CASE WHEN s.sup IS NULL THEN 1 ELSE 0 END)
         |    AS DOUBLE) / CAST(count(*) AS DOUBLE) * 10000.0 + 0.5)
         |    / 10000.0 AS bridge_share
         |FROM cp LEFT JOIN s ON cp.a = s.a AND cp.b = s.b""".stripMargin,

    "graph_pref_attachment" ->
      s"""WITH $edgesCte,
         |pdeg AS (SELECT dst, count(*) AS pd FROM e GROUP BY 1),
         |c AS (SELECT e1.dst AS p1, e2.dst AS p2, count(*) AS common
         |  FROM e e1 JOIN e e2 ON e1.src = e2.src AND e1.dst < e2.dst
         |  GROUP BY 1, 2)
         |SELECT p1, p2, common,
         |  CAST(d1.pd * d2.pd AS BIGINT) AS pa_score
         |FROM c JOIN pdeg d1 ON c.p1 = d1.dst
         |JOIN pdeg d2 ON c.p2 = d2.dst
         |ORDER BY pa_score DESC, p1, p2 LIMIT 20""".stripMargin,

    "graph_random_walk" -> randomWalkSql,

    "graph_wsssp" -> wssspSql,
    "graph_ppr_batch" -> pprBatchSql,
    "graph_lpa" -> lpaSql,
    "graph_modularity" -> modularitySql,
    "graph_louvain" -> louvainSql,
    "graph_louvain_multi" -> louvainMultiSql,
    "graph_louvain_dendro" -> louvainDendroSql,

    // the matchPattern template replayed as explicit joins: per-edge
    // predicates, injective bindings, weights exported per template edge
    "graph_match_pattern" ->
      s"""WITH $copurchaseCte,
         |e AS MATERIALIZED (
         |  SELECT a AS src, b AS dst, CAST(w AS BIGINT) AS w FROM cp)
         |SELECT x.src AS a, x.dst AS b, y.dst AS c,
         |  x.w AS w_ab, y.w AS w_bc, z.w AS w_ac,
         |  x.w + y.w + z.w AS w_total
         |FROM e x
         |JOIN e y ON y.src = x.dst AND x.w >= 2 AND y.w >= 2
         |JOIN e z ON z.src = x.src AND z.dst = y.dst
         |WHERE x.src <> x.dst AND y.dst <> x.src AND y.dst <> x.dst
         |ORDER BY w_total DESC, a, b, c LIMIT 20""".stripMargin,

    // the 4-edge / var-length template replayed as unrolled-hop joins:
    // min-hop reach over the w>=3 subgraph (hop-2 pairs minus hop-1
    // pairs), then the same bind-order injectivity filters
    "graph_match_var" ->
      s"""WITH $copurchaseCte,
         |e AS MATERIALIZED (
         |  SELECT a AS src, b AS dst, CAST(w AS BIGINT) AS w FROM cp),
         |b3 AS (SELECT DISTINCT src, dst FROM e WHERE w >= 2),
         |r2 AS (
         |  SELECT x.src, y.dst FROM b3 x JOIN b3 y ON y.src = x.dst
         |  GROUP BY x.src, y.dst),
         |reach AS (
         |  SELECT src, dst, CAST(1 AS BIGINT) AS hops FROM b3
         |  UNION ALL
         |  SELECT r2.src, r2.dst, CAST(2 AS BIGINT) AS hops FROM r2
         |  WHERE NOT EXISTS (SELECT 1 FROM b3
         |    WHERE b3.src = r2.src AND b3.dst = r2.dst))
         |SELECT e1.src AS a, e1.dst AS b, rv.dst AS c, e3.dst AS d,
         |  e1.w AS w_ab, rv.hops AS hops_bc, e3.w AS w_cd, e4.w AS w_ad,
         |  e1.w + e3.w + e4.w AS w_total
         |FROM e e1
         |JOIN reach rv ON rv.src = e1.dst
         |JOIN e e3 ON e3.src = rv.dst AND e3.w >= 2
         |JOIN e e4 ON e4.src = e1.src AND e4.dst = e3.dst
         |WHERE e1.w >= 3
         |  AND e1.src <> e1.dst
         |  AND rv.dst <> e1.src AND rv.dst <> e1.dst
         |  AND e3.dst <> e1.src AND e3.dst <> e1.dst AND e3.dst <> rv.dst
         |ORDER BY w_total DESC, a, b, c, d LIMIT 20""".stripMargin,

    "graph_bfs_tree" ->
      s"""WITH $copurchaseCte,
         |e2 AS (SELECT a, b FROM cp UNION ALL SELECT b, a FROM cp),
         |f0 AS (SELECT p_partkey AS node FROM part WHERE p_partkey < 5),
         |n1 AS (
         |  SELECT b AS node, CAST(min(a) AS BIGINT) AS parent
         |  FROM e2 JOIN f0 ON e2.a = f0.node
         |  WHERE b NOT IN (SELECT node FROM f0)
         |  GROUP BY b),
         |n2 AS (
         |  SELECT b AS node, CAST(min(a) AS BIGINT) AS parent
         |  FROM e2 JOIN n1 ON e2.a = n1.node
         |  WHERE b NOT IN (SELECT node FROM f0)
         |    AND b NOT IN (SELECT node FROM n1)
         |  GROUP BY b)
         |SELECT node, CAST(0 AS BIGINT) AS hop,
         |  CAST(NULL AS BIGINT) AS parent FROM f0
         |UNION ALL SELECT node, 1, parent FROM n1
         |UNION ALL SELECT node, 2, parent FROM n2
         |ORDER BY node""".stripMargin,

    "graph_triangle_sample" ->
      s"""WITH $copurchaseCte,
         |e AS (SELECT a, b FROM cp),
         |sm AS (
         |  SELECT a, b FROM e
         |  WHERE CAST('0x' || substr(md5(CAST(a AS VARCHAR) || '_' ||
         |    CAST(b AS VARCHAR)), 1, 4) AS BIGINT) % 4 = 0),
         |tx AS (SELECT CAST(count(*) AS BIGINT) AS n_exact
         |  FROM e e1 JOIN e e2 ON e2.a = e1.b
         |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
         |ts AS (SELECT CAST(count(*) AS BIGINT) AS n_tri_sampled
         |  FROM sm e1 JOIN sm e2 ON e2.a = e1.b
         |  JOIN sm e3 ON e3.a = e1.a AND e3.b = e2.b),
         |ne AS (SELECT count(*) AS n_edges FROM e),
         |ns AS (SELECT count(*) AS n_edges_sampled FROM sm)
         |SELECT n_edges, n_edges_sampled, n_tri_sampled,
         |  n_tri_sampled * 64 AS estimate, n_exact,
         |  CASE WHEN n_exact > 0 THEN
         |    floor(CAST(n_tri_sampled * 64 - n_exact AS DOUBLE) /
         |      CAST(n_exact AS DOUBLE) * 10000.0 + 0.5) / 10000.0
         |  END AS rel_err
         |FROM ne, ns, ts, tx""".stripMargin,

    "graph_transitivity" ->
      s"""WITH $copurchaseCte,
         |deg AS (SELECT v, count(*) AS deg FROM (
         |  SELECT a AS v FROM cp UNION ALL SELECT b FROM cp) u GROUP BY 1),
         |wed AS (SELECT CAST(CAST(sum(deg * (deg - 1)) AS DOUBLE) / 2
         |  AS BIGINT) AS n_wedges FROM deg),
         |tri AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles
         |  FROM cp e1 JOIN cp e2 ON e2.a = e1.b
         |  JOIN cp e3 ON e3.a = e1.a AND e3.b = e2.b)
         |SELECT n_wedges, n_triangles,
         |  CASE WHEN n_wedges > 0 THEN
         |    floor(CAST(n_triangles * 3 AS DOUBLE) /
         |      CAST(n_wedges AS DOUBLE) * 10000.0 + 0.5) / 10000.0 END
         |    AS transitivity
         |FROM wed, tri""".stripMargin,

    "graph_knn_degree" ->
      s"""WITH $copurchaseCte,
         |bd AS (SELECT a AS u, b AS v FROM cp
         |  UNION ALL SELECT b, a FROM cp),
         |deg AS (SELECT u, count(*) AS deg FROM bd GROUP BY 1),
         |pn AS (
         |  SELECT bd.u AS u, CAST(sum(dv.deg) AS BIGINT) AS snd
         |  FROM bd JOIN deg dv ON bd.v = dv.u
         |  GROUP BY 1)
         |SELECT deg.deg AS k, count(*) AS n_nodes,
         |  floor(CAST(sum(snd) AS DOUBLE) /
         |    CAST(deg.deg * count(*) AS DOUBLE) * 10000.0 + 0.5) / 10000.0
         |    AS knn
         |FROM pn JOIN deg ON pn.u = deg.u
         |GROUP BY deg.deg ORDER BY k""".stripMargin,

    "graph_rich_club" ->
      s"""WITH $copurchaseCte,
         |deg AS (SELECT v, count(*) AS deg FROM (
         |  SELECT a AS v FROM cp UNION ALL SELECT b FROM cp) u GROUP BY 1),
         |ks AS (SELECT unnest([2, 4, 8, 16]) AS k),
         |nodes AS (SELECT k, count(*) AS n_club FROM deg, ks
         |  WHERE deg >= k GROUP BY 1),
         |ec AS (SELECT k, count(*) AS e_club
         |  FROM cp JOIN deg da ON cp.a = da.v JOIN deg db ON cp.b = db.v, ks
         |  WHERE da.deg >= k AND db.deg >= k GROUP BY 1)
         |SELECT CAST(ks.k AS BIGINT) AS k, coalesce(n_club, 0) AS n_club,
         |  coalesce(e_club, 0) AS e_club,
         |  CASE WHEN coalesce(n_club, 0) >= 2 THEN
         |    floor(CAST(coalesce(e_club, 0) * 2 AS DOUBLE) /
         |      (CAST(n_club AS DOUBLE) * CAST(n_club - 1 AS DOUBLE))
         |      * 10000.0 + 0.5) / 10000.0 END AS phi
         |FROM ks LEFT JOIN nodes ON ks.k = nodes.k
         |  LEFT JOIN ec ON ks.k = ec.k ORDER BY k""".stripMargin,
    "graph_khop_4" -> khopSql(4, "c_mktsegment = 'AUTOMOBILE'"),
    "graph_pagerank" -> pagerankSql(
      reset = "15000000000000 // (n.n * 100)",
      r0 = "SELECT part, CAST(1000000000000 // n.n AS BIGINT) AS r FROM parts, n"),

    "graph_ppr" -> pagerankSql(
      reset = "CASE WHEN p.part = 1 THEN 150000000000 ELSE 0 END",
      r0 = "SELECT part, CAST(CASE WHEN part = 1 THEN 1000000000000 ELSE 0 END AS BIGINT) AS r FROM parts"),

    "graph_edge_filter" ->
      """SELECT user_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
        |  count(*) AS n,
        |  CAST(sum(CAST(round((value) * 10000) AS BIGINT)) AS DOUBLE) / 10000.0 AS weight
        |FROM events WHERE event_type = 'click'
        |GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY user_id, item""".stripMargin,

    "graph_build_edges" ->
      """SELECT o_custkey AS src, l_partkey AS dst, count(*) AS w
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |GROUP BY 1, 2 ORDER BY src, dst""".stripMargin,

    "graph_degree" ->
      s"""WITH $edgesCte
         |SELECT * FROM (
         |  SELECT 'c' AS side, src AS vertex, count(*) AS degree,
         |    CAST(sum(w) AS BIGINT) AS strength
         |  FROM e GROUP BY src
         |  UNION ALL
         |  SELECT 'p' AS side, dst AS vertex, count(*) AS degree,
         |    CAST(sum(w) AS BIGINT) AS strength
         |  FROM e GROUP BY dst) t
         |ORDER BY side, vertex""".stripMargin,

    "graph_neighbors_1hop" ->
      s"""WITH $edgesCte
         |SELECT dst, p_name, w
         |FROM e JOIN part ON p_partkey = dst
         |WHERE src = 1 ORDER BY dst""".stripMargin,

    "graph_topk_per_node" ->
      s"""WITH $edgesCte,
         |cohort AS (SELECT c_custkey AS src FROM customer WHERE c_nationkey = 1),
         |ranked AS (
         |  SELECT e.src, e.dst, e.w,
         |    row_number() OVER (PARTITION BY e.src ORDER BY e.w DESC, e.dst) AS rn
         |  FROM e JOIN cohort ON e.src = cohort.src)
         |SELECT src, CAST(rn AS BIGINT) AS rnk, dst, CAST(w AS BIGINT) AS w
         |FROM ranked WHERE rn <= 3
         |ORDER BY src, rnk""".stripMargin,

    "graph_khop_2" ->
      s"""WITH $edgesCte,
         |cohort AS (SELECT c_custkey AS src FROM customer WHERE c_mktsegment = 'BUILDING'),
         |p1 AS (SELECT DISTINCT dst FROM e JOIN cohort USING (src)),
         |c2 AS (SELECT DISTINCT src FROM e JOIN p1 USING (dst)),
         |p2 AS (SELECT DISTINCT dst FROM e JOIN c2 USING (src))
         |SELECT p2.dst AS part, CAST(coalesce(h.h1, 2) AS BIGINT) AS hop
         |FROM p2 LEFT JOIN (SELECT dst, 1 AS h1 FROM p1) h ON p2.dst = h.dst
         |ORDER BY part""".stripMargin,

    "graph_khop_3" ->
      s"""WITH $edgesCte,
         |cohort AS (SELECT c_custkey AS src FROM customer WHERE c_mktsegment = 'MACHINERY'),
         |p1 AS (SELECT DISTINCT dst FROM e JOIN cohort USING (src)),
         |c2 AS (SELECT DISTINCT src FROM e JOIN p1 USING (dst)),
         |p2 AS (SELECT DISTINCT dst FROM e JOIN c2 USING (src)),
         |c3 AS (SELECT DISTINCT src FROM e JOIN p2 USING (dst)),
         |p3 AS (SELECT DISTINCT dst FROM e JOIN c3 USING (src))
         |SELECT p3.dst AS part, CAST(coalesce(h1.h, h2.h, 3) AS BIGINT) AS hop
         |FROM p3
         |LEFT JOIN (SELECT dst, 1 AS h FROM p1) h1 ON p3.dst = h1.dst
         |LEFT JOIN (SELECT dst, 2 AS h FROM p2) h2 ON p3.dst = h2.dst
         |ORDER BY part""".stripMargin,

    "graph_triangles" ->
      s"""WITH $copurchaseCte
         |SELECT
         |  (SELECT count(*) FROM cp e1
         |     JOIN cp e2 ON e2.a = e1.b
         |     JOIN cp e3 ON e3.a = e1.a AND e3.b = e2.b) AS n_triangles,
         |  (SELECT count(*) FROM cp) AS n_edges""".stripMargin,

    "graph_common_neighbors" ->
      s"""WITH $edgesCte
         |SELECT e1.dst AS p1, e2.dst AS p2, count(*) AS common
         |FROM e e1 JOIN e e2 ON e1.src = e2.src AND e1.dst < e2.dst
         |GROUP BY 1, 2
         |ORDER BY common DESC, p1, p2 LIMIT 20""".stripMargin,

    "graph_jaccard_nodes" ->
      s"""WITH $edgesCte,
         |deg AS (SELECT dst AS p, count(*) AS d FROM e GROUP BY dst),
         |pairs AS (
         |  SELECT e1.dst AS p1, e2.dst AS p2, count(*) AS common
         |  FROM e e1 JOIN e e2 ON e1.src = e2.src AND e1.dst < e2.dst
         |  GROUP BY 1, 2)
         |SELECT pairs.p1, pairs.p2, common,
         |  round(common / (d1.d + d2.d - common), 4) AS jac
         |FROM pairs
         |JOIN deg d1 ON pairs.p1 = d1.p
         |JOIN deg d2 ON pairs.p2 = d2.p
         |ORDER BY jac DESC, pairs.p1, pairs.p2 LIMIT 20""".stripMargin,

    "graph_clustering_coeff" -> clusteringCoeffSql,

    // the outer co-purchase copy is renamed lp0/cp0: the two embedded
    // subqueries carry their own MATERIALIZED `cp`, and DuckDB rejects an
    // outer materialized CTE shadowed by an inner one of the same name
    // (inner-vs-inner is fine — probed on 1.0.0)
    "graph_small_world" ->
      s"""WITH cc AS (SELECT global_cc FROM ($clusteringCoeffSql) t1),
         |apl AS (SELECT mean_hops FROM ($avgPathLengthSql) t2),
         |lp0 AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
         |  FROM lineitem),
         |cp0 AS MATERIALIZED (SELECT x.p AS a, y.p AS b
         |  FROM lp0 x JOIN lp0 y ON x.ok = y.ok AND x.p < y.p
         |  GROUP BY 1, 2),
         |nm AS (
         |  SELECT (SELECT count(DISTINCT v) FROM (
         |     SELECT a AS v FROM cp0 UNION ALL SELECT b FROM cp0) u) AS n,
         |    (SELECT count(*) FROM cp0) AS m)
         |SELECT n, m, global_cc, mean_hops,
         |  floor((global_cc / ((2.0 * CAST(m AS DOUBLE) /
         |    CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))) /
         |    (mean_hops / (ln(CAST(n AS DOUBLE)) /
         |      ln(2.0 * CAST(m AS DOUBLE) / CAST(n AS DOUBLE))))
         |    * 10000.0 + 0.5) / 10000.0 AS sigma
         |FROM nm, cc, apl""".stripMargin,

    "graph_assortativity" ->
      s"""WITH $copurchaseCte,
         |bdir AS (SELECT a, b FROM cp UNION ALL SELECT b, a FROM cp),
         |deg AS (SELECT a, count(*) AS d FROM bdir GROUP BY a)
         |SELECT round(corr(d1.d, d2.d), 4) AS assortativity,
         |  count(*) AS n_dir_edges
         |FROM bdir e
         |JOIN deg d1 ON e.a = d1.a
         |JOIN deg d2 ON e.b = d2.a""".stripMargin,

    "graph_degree_dist" ->
      s"""WITH $copurchaseCte,
         |bdir AS (SELECT a, b FROM cp UNION ALL SELECT b, a FROM cp),
         |deg AS (SELECT a, count(*) AS d FROM bdir GROUP BY a)
         |SELECT d, count(*) AS n_nodes FROM deg GROUP BY d ORDER BY d""".stripMargin,

    "graph_common_neighbors_approx" ->
      s"""WITH $edgesCte,
         |samp AS (
         |  SELECT src, dst FROM (
         |    SELECT src, dst, row_number() OVER (
         |      PARTITION BY src
         |      ORDER BY md5(src::VARCHAR || '#' || dst::VARCHAR), dst) AS rn
         |    FROM e) t
         |  WHERE rn <= 48),
         |cands AS (
         |  SELECT e1.dst AS p1, e2.dst AS p2
         |  FROM samp e1 JOIN samp e2 ON e1.src = e2.src AND e1.dst < e2.dst
         |  GROUP BY 1, 2 HAVING count(*) >= 2)
         |SELECT c.p1, c.p2, count(*) AS common
         |FROM cands c
         |JOIN e a1 ON a1.dst = c.p1
         |JOIN e a2 ON a2.dst = c.p2 AND a2.src = a1.src
         |GROUP BY 1, 2
         |ORDER BY common DESC, c.p1, c.p2 LIMIT 20""".stripMargin,

    "graph_jaccard_approx" ->
      s"""WITH $edgesCte,
         |samp AS (
         |  SELECT src, dst FROM (
         |    SELECT src, dst, row_number() OVER (
         |      PARTITION BY src
         |      ORDER BY md5(src::VARCHAR || '#' || dst::VARCHAR), dst) AS rn
         |    FROM e) t
         |  WHERE rn <= 48),
         |cands AS (
         |  SELECT e1.dst AS p1, e2.dst AS p2
         |  FROM samp e1 JOIN samp e2 ON e1.src = e2.src AND e1.dst < e2.dst
         |  GROUP BY 1, 2 HAVING count(*) >= 2),
         |deg AS (SELECT dst AS p, count(*) AS d FROM e GROUP BY dst),
         |verified AS (
         |  SELECT c.p1, c.p2, count(*) AS common
         |  FROM cands c
         |  JOIN e a1 ON a1.dst = c.p1
         |  JOIN e a2 ON a2.dst = c.p2 AND a2.src = a1.src
         |  GROUP BY 1, 2)
         |SELECT v.p1, v.p2, common,
         |  floor(common / (d1.d + d2.d - common) * 10000.0 + 0.5) / 10000.0 AS jac
         |FROM verified v
         |JOIN deg d1 ON v.p1 = d1.p
         |JOIN deg d2 ON v.p2 = d2.p
         |ORDER BY jac DESC, v.p1, v.p2 LIMIT 20""".stripMargin,

    "graph_recommend" ->
      s"""WITH $copurchaseCte,
         |e2 AS (SELECT a, b FROM cp UNION ALL SELECT b, a FROM cp),
         |direct AS (SELECT b AS part FROM e2 WHERE a = 1),
         |two_hop AS (
         |  SELECT y.b AS part, count(*) AS paths
         |  FROM e2 x JOIN e2 y ON x.b = y.a
         |  WHERE x.a = 1 AND y.b <> 1
         |  GROUP BY y.b)
         |SELECT part, paths FROM two_hop
         |WHERE part NOT IN (SELECT part FROM direct)
         |ORDER BY paths DESC, part LIMIT 20""".stripMargin,

    "graph_tag_similarity" ->
      """WITH cohort AS (SELECT c_custkey FROM customer WHERE c_nationkey = 1),
        |tags AS (
        |  SELECT o_custkey AS cust, p_brand AS tag,
        |    CAST(sum(l_quantity) AS BIGINT) AS w
        |  FROM orders
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |  JOIN cohort ON o_custkey = c_custkey
        |  JOIN part ON p_partkey = l_partkey
        |  GROUP BY 1, 2)
        |SELECT t1.cust AS c1, t2.cust AS c2,
        |  CAST(sum(t1.w * t2.w) AS BIGINT) AS dot
        |FROM tags t1 JOIN tags t2 ON t1.tag = t2.tag AND t1.cust < t2.cust
        |GROUP BY 1, 2
        |ORDER BY dot DESC, c1, c2 LIMIT 20""".stripMargin,

    "graph_tag_similarity_approx" ->
      """WITH cohort AS (SELECT c_custkey FROM customer WHERE c_nationkey = 1),
        |tags AS (
        |  SELECT o_custkey AS cust, p_brand AS tag,
        |    CAST(sum(l_quantity) AS BIGINT) AS w
        |  FROM orders
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |  JOIN cohort ON o_custkey = c_custkey
        |  JOIN part ON p_partkey = l_partkey
        |  GROUP BY 1, 2),
        |samp AS (SELECT tag, cust FROM (
        |  SELECT tag, cust,
        |    row_number() OVER (PARTITION BY tag ORDER BY w DESC, cust) AS rn
        |  FROM tags) t WHERE rn <= 48),
        |cands AS (SELECT DISTINCT t1.cust AS c1, t2.cust AS c2
        |  FROM samp t1 JOIN samp t2 ON t1.tag = t2.tag AND t1.cust < t2.cust)
        |SELECT c.c1, c.c2, CAST(sum(x.w * y.w) AS BIGINT) AS dot
        |FROM cands c
        |JOIN tags x ON x.cust = c.c1
        |JOIN tags y ON y.cust = c.c2 AND y.tag = x.tag
        |GROUP BY 1, 2
        |ORDER BY dot DESC, c1, c2 LIMIT 20""".stripMargin,

    "graph_tag_profile" ->
      """SELECT o_custkey AS cust, p_brand AS tag,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
        |FROM orders
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN part ON p_partkey = l_partkey
        |GROUP BY 1, 2 ORDER BY cust, tag""".stripMargin,

    // four unrolled Luby rounds: portable md5 priorities, min-ROW
    // neighbor fold, winner+neighbor deactivation (r14 wave C)
    "graph_mis" -> {
      def p(col: String): String =
        s"CAST('0x' || substr(md5(CAST($col AS VARCHAR)), 1, 8) AS BIGINT)"
      val rounds = (1 to 4).map { r =>
        s"""nb$r AS MATERIALIZED (
           |  SELECT e2.a AS v, e2.b AS u FROM e2
           |  JOIN a${r - 1} x ON e2.a = x.v
           |  JOIN a${r - 1} y ON e2.b = y.v),
           |mn$r AS MATERIALIZED (
           |  SELECT v, min({'p': ${p("u")}, 'u': u}) AS mn
           |  FROM nb$r GROUP BY 1),
           |win$r AS MATERIALIZED (
           |  SELECT x.v FROM a${r - 1} x LEFT JOIN mn$r ON x.v = mn$r.v
           |  WHERE mn$r.mn IS NULL
           |    OR {'p': ${p("x.v")}, 'u': x.v} < mn$r.mn),
           |de$r AS (
           |  SELECT v FROM win$r
           |  UNION
           |  SELECT nb$r.v FROM nb$r JOIN win$r w ON nb$r.u = w.v),
           |a$r AS MATERIALIZED (
           |  SELECT v FROM a${r - 1} EXCEPT SELECT v FROM de$r)""".stripMargin
      }.mkString(",\n")
      s"""WITH $copurchaseCte,
         |e AS (SELECT a, b FROM cp WHERE w >= 2),
         |e2 AS MATERIALIZED (
         |  SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
         |a0 AS MATERIALIZED (SELECT p_partkey AS v FROM part),
         |$rounds,
         |mis AS (SELECT v FROM win1 UNION SELECT v FROM win2
         |  UNION SELECT v FROM win3 UNION SELECT v FROM win4)
         |SELECT p_partkey AS part,
         |  CASE WHEN p_partkey IN (SELECT v FROM mis) THEN 'mis'
         |       WHEN p_partkey IN (SELECT v FROM a4) THEN 'undecided'
         |       ELSE 'dominated' END AS status
         |FROM part ORDER BY part""".stripMargin
    },

    // three recursive min-label closures over shrinking w-thresholded
    // subgraphs (r14 wave B)
    "graph_percolation" -> {
      // r14 driver compare: 90 s. Two rewrites, both value-preserving:
      // (a) e$t MATERIALIZED (the recursion re-derives a plain CTE per
      // step); (b) seed the label flood from LOCAL-MIN nodes only (id
      // smaller than every neighbor's). A component's global min is
      // always a local min and floods the whole component, and every
      // label is a component member's id ≥ that min, so min(label) per
      // node — and hence comp/sz/giant rows — is bit-identical while the
      // (node,label) pair space shrinks by ~the mean-degree factor.
      // Isolated nodes are local minima vacuously, so coverage of every
      // part row is preserved.
      val per = Seq(1, 2, 4).map { t =>
        s"""e$t AS MATERIALIZED (SELECT a, b FROM cp WHERE w >= $t
           |       UNION ALL SELECT b, a FROM cp WHERE w >= $t),
           |seed$t AS MATERIALIZED (
           |  SELECT p_partkey AS node FROM part p
           |  WHERE NOT EXISTS (SELECT 1 FROM e$t
           |    WHERE e$t.a = p.p_partkey AND e$t.b < p.p_partkey)),
           |reach$t(node, label) AS (
           |  SELECT node, node FROM seed$t
           |  UNION
           |  SELECT e$t.b, reach$t.label
           |  FROM reach$t JOIN e$t ON e$t.a = reach$t.node),
           |comp$t AS (SELECT node, min(label) AS c FROM reach$t GROUP BY 1),
           |sz$t AS (SELECT c, count(*) AS sz FROM comp$t GROUP BY 1),
           |row$t AS (
           |  SELECT CAST($t AS BIGINT) AS w_min,
           |    (SELECT count(*) FROM cp WHERE w >= $t) AS n_edges,
           |    count(*) AS n_components,
           |    CAST(max(sz) AS BIGINT) AS giant_size,
           |    floor(CAST(max(sz) AS DOUBLE) / CAST(sum(sz) AS DOUBLE)
           |      * 10000.0 + 0.5) / 10000.0 AS giant_share
           |  FROM sz$t)""".stripMargin
      }.mkString(",\n")
      s"""WITH RECURSIVE $copurchaseCte,
         |$per
         |SELECT * FROM row1 UNION ALL SELECT * FROM row2
         |UNION ALL SELECT * FROM row4
         |ORDER BY w_min""".stripMargin
    },

    "graph_cc" ->
      s"""WITH RECURSIVE $copurchaseCte,
         |e2 AS MATERIALIZED (SELECT a, b FROM cp WHERE w >= 2
         |       UNION ALL SELECT b, a FROM cp WHERE w >= 2),
         |seed AS MATERIALIZED (
         |  SELECT p_partkey AS node FROM part p
         |  WHERE NOT EXISTS (SELECT 1 FROM e2
         |    WHERE e2.a = p.p_partkey AND e2.b < p.p_partkey)),
         |reach(node, label) AS (
         |  SELECT node, node FROM seed
         |  UNION
         |  SELECT e2.b, reach.label FROM reach JOIN e2 ON e2.a = reach.node)
         |SELECT node AS part, min(label) AS comp
         |FROM reach GROUP BY node ORDER BY part""".stripMargin,

    // same fixpoint, pure-DataFrame implementation — same oracle
    "graph_cc_df" ->
      s"""WITH RECURSIVE $copurchaseCte,
         |e2 AS MATERIALIZED (SELECT a, b FROM cp WHERE w >= 2
         |       UNION ALL SELECT b, a FROM cp WHERE w >= 2),
         |seed AS MATERIALIZED (
         |  SELECT p_partkey AS node FROM part p
         |  WHERE NOT EXISTS (SELECT 1 FROM e2
         |    WHERE e2.a = p.p_partkey AND e2.b < p.p_partkey)),
         |reach(node, label) AS (
         |  SELECT node, node FROM seed
         |  UNION
         |  SELECT e2.b, reach.label FROM reach JOIN e2 ON e2.a = reach.node)
         |SELECT node AS part, min(label) AS comp
         |FROM reach GROUP BY node ORDER BY part""".stripMargin,

    "graph_path_count" -> {
      val sigma = (1 to 6).map { h =>
        s"""s$h AS MATERIALIZED (
           |  SELECT md.node, CAST(sum(sp.sigma) AS BIGINT) AS sigma
           |  FROM md JOIN e2 ON e2.b = md.node
           |  JOIN s${h - 1} sp ON sp.node = e2.a
           |  WHERE md.d = $h GROUP BY 1)""".stripMargin
      }.mkString(",\n")
      val union = (0 to 6).map(h =>
        s"SELECT node, sigma FROM s$h").mkString("\n|  UNION ALL ")
      s"""WITH RECURSIVE $copurchaseCte,
         |e2 AS MATERIALIZED (SELECT a, b FROM cp UNION ALL SELECT b, a FROM cp),
         |bfs(node, d) AS (
         |  SELECT CAST(1 AS BIGINT) AS node, 0 AS d
         |  UNION
         |  SELECT e2.b, bfs.d + 1 FROM bfs JOIN e2 ON e2.a = bfs.node
         |  WHERE bfs.d < 6),
         |md AS MATERIALIZED (SELECT node, min(d) AS d FROM bfs GROUP BY 1),
         |s0 AS (SELECT CAST(1 AS BIGINT) AS node,
         |  CAST(1 AS BIGINT) AS sigma),
         |$sigma,
         |sg AS ($union)
         |SELECT md.node AS part, CAST(md.d AS BIGINT) AS dist, sg.sigma
         |FROM md JOIN sg ON sg.node = md.node
         |ORDER BY part""".stripMargin
    },

    "graph_cc_sizes" ->
      s"""WITH RECURSIVE $copurchaseCte,
         |e2 AS MATERIALIZED (SELECT a, b FROM cp WHERE w >= 2
         |       UNION ALL SELECT b, a FROM cp WHERE w >= 2),
         |seed AS MATERIALIZED (
         |  SELECT p_partkey AS node FROM part p
         |  WHERE NOT EXISTS (SELECT 1 FROM e2
         |    WHERE e2.a = p.p_partkey AND e2.b < p.p_partkey)),
         |reach(node, label) AS (
         |  SELECT node, node FROM seed
         |  UNION
         |  SELECT e2.b, reach.label FROM reach JOIN e2 ON e2.a = reach.node),
         |comp AS (SELECT node, min(label) AS comp FROM reach GROUP BY node),
         |sz AS (SELECT comp, count(*) AS size FROM comp GROUP BY 1)
         |SELECT CAST(size AS BIGINT) AS size, count(*) AS n_components
         |FROM sz GROUP BY 1 ORDER BY 1""".stripMargin,

    "graph_sssp" ->
      s"""WITH RECURSIVE $copurchaseCte,
         |e2 AS (SELECT a, b FROM cp UNION ALL SELECT b, a FROM cp),
         |bfs(node, d) AS (
         |  SELECT CAST(1 AS BIGINT) AS node, 0 AS d
         |  UNION
         |  SELECT e2.b, bfs.d + 1 FROM bfs JOIN e2 ON e2.a = bfs.node
         |  WHERE bfs.d < 6)
         |SELECT node AS part, CAST(min(d) AS BIGINT) AS dist
         |FROM bfs GROUP BY node ORDER BY part""".stripMargin,

    // same BFS, pure-DataFrame frontier-expansion implementation — same oracle
    "graph_sssp_df" ->
      s"""WITH RECURSIVE $copurchaseCte,
         |e2 AS (SELECT a, b FROM cp UNION ALL SELECT b, a FROM cp),
         |bfs(node, d) AS (
         |  SELECT CAST(1 AS BIGINT) AS node, 0 AS d
         |  UNION
         |  SELECT e2.b, bfs.d + 1 FROM bfs JOIN e2 ON e2.a = bfs.node
         |  WHERE bfs.d < 6)
         |SELECT node AS part, CAST(min(d) AS BIGINT) AS dist
         |FROM bfs GROUP BY node ORDER BY part""".stripMargin,

    // decayed weight = exact cent quantization × per-day exp quantization,
    // summed as exact BIGINTs — one correctly-rounded division at the end;
    // the exp never meets a decimal round() (see the op docstring).
    "graph_trending" ->
      """WITH e AS (
        |  SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
        |    epoch_ms(ts) // 86400000 AS day, value
        |  FROM events),
        |m AS (SELECT max(day) AS max_day FROM e)
        |SELECT item,
        |  round(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT) *
        |            CAST(floor(exp((day - max_day) / 7.0) * 1.0e8 + 0.5) AS BIGINT)) / 1.0e10, 4) AS score,
        |  count(*) AS n
        |FROM e, m GROUP BY item
        |ORDER BY score DESC, item LIMIT 20""".stripMargin
  )
}
