package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.graph.GraphBridge
import graft.ops.GraphOps

class GraphSpec extends SparkSpec {

  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, sf)

  private def df(pairs: Seq[(Long, Long)], names: (String, String)): DataFrame = {
    import spark.implicits._
    pairs.toDF(names._1, names._2)
  }

  // --- golden fixtures (SURVEY.md §5.2): path 1-2-3, pair 5-6, singleton 9 ---
  private val fixtureV = Seq(1L, 2L, 3L, 5L, 6L, 9L)
  private val fixtureE = Seq((1L, 2L), (2L, 3L), (5L, 6L))

  test("GraphBridge.connectedComponents: min-label components on fixture") {
    import spark.implicits._
    val v = fixtureV.toDF("id")
    val comps = GraphBridge.connectedComponents(spark, v, df(fixtureE, ("a", "b")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L, 9L -> 9L))
  }

  test("GraphBridge.shortestHops: BFS depths on fixture (undirected)") {
    import spark.implicits._
    val v = fixtureV.toDF("id")
    val both = fixtureE ++ fixtureE.map(_.swap)
    val d = GraphBridge.shortestHops(spark, v, df(both, ("a", "b")), src = 1L, maxHops = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d === Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("graph_cc: labels are min ids and constant across every edge") {
    import spark.implicits._
    val comps = q("graph_cc").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    comps.foreach { case (part, comp) => assert(comp <= part) }
    GraphOps.copurchase(spark, sf).filter($"w" >= 2).select($"a", $"b")
      .collect().foreach { r =>
        assert(comps(r.getLong(0)) === comps(r.getLong(1)),
          s"edge ${r.getLong(0)}-${r.getLong(1)} crosses components")
      }
  }

  test("graph_sssp: source at 0, neighbors of source at 1, dist <= 6") {
    import spark.implicits._
    val d = q("graph_sssp").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d(1L) === 0L)
    val nbrs = GraphOps.copurchase(spark, sf)
      .filter($"a" === 1 || $"b" === 1).collect()
      .map(r => if (r.getLong(0) == 1L) r.getLong(1) else r.getLong(0))
    nbrs.foreach(n => assert(d(n) === 1L, s"neighbor $n of source not at dist 1"))
    d.values.foreach(v => assert(v >= 0 && v <= 6))
  }

  test("graph_triangles: matches GraphX TriangleCount on the same graph") {
    import spark.implicits._
    import org.apache.spark.graphx.{Edge, Graph}
    val ours = q("graph_triangles").collect().head.getLong(0)
    val cp = GraphOps.copurchase(spark, sf).select($"a", $"b")
    val eRDD = cp.rdd.map(r => Edge(r.getLong(0), r.getLong(1), 1))
    val g = Graph.fromEdges(eRDD, 1)
    val gx = g.triangleCount().vertices.map(_._2.toLong).sum() / 3
    assert(ours === gx.toLong, s"ours=$ours graphx=$gx")
  }

  test("graph_sssp_df: DataFrame frontier BFS equals GraphX ShortestPaths") {
    val graphx = q("graph_sssp").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val df = q("graph_sssp_df").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(df === graphx)
  }

  test("graph_pagerank: integer power iteration tracks GraphX staticPageRank") {
    import spark.implicits._
    val rows = q("graph_pagerank").collect()
    val ours = rows.map(_.getLong(0)).toSeq
    // independent float path: the GraphX Pregel implementation (the library
    // surface for graphs too big for a 10-deep DataFrame lineage)
    val cp = GraphOps.copurchase(spark, sf).select($"a", $"b")
    val both = cp.unionAll(cp.select($"b".as("a"), $"a".as("b")))
    val graphx = graph.GraphBridge.pageRank(
        spark, Tables.part(spark, sf).select($"p_partkey"), both, iters = 10)
      .orderBy($"rank".desc, $"id").limit(10).collect().map(_.getLong(0)).toSet
    val overlap = ours.take(5).count(graphx.contains)
    assert(overlap >= 3, s"top-5 integer ranks $ours vs GraphX top-10 $graphx")
    // rank mass is conserved up to integer-truncation loss: top rank must
    // stay a sane fraction of the 1e12 total
    val top = rows.map(_.getLong(1))
    assert(top.head > 0L && top.head < PrTotalMass)
    assert(top.zip(top.tail).forall { case (a, b) => a >= b })
  }

  private val PrTotalMass = 1000000000000L

  test("graph_ppr: the personalization source tops its own ranking") {
    val rows = q("graph_ppr").collect()
    assert(rows.nonEmpty)
    assert(rows.head.getLong(0) === 1L, s"source should rank first, got ${rows.head}")
    val ranks = rows.map(r => r.getLong(r.fieldIndex("rank_scaled")))
    assert(ranks.zip(ranks.tail).forall { case (a, b) => a >= b })
  }

  test("GraphAlgebra.labelPropagation: hand-computed 4-round labels on the fixture") {
    import spark.implicits._
    val v = fixtureV.toDF("part")
    val labels = graft.api.GraphAlgebra
      .labelPropagation(v, df(fixtureE, ("a", "b")), rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // synchronous LPA oscillates with period 2 on bipartite structures; at
    // the even round the path 1-2-3 sits at {1:1, 2:2, 3:1} (endpoints took
    // the middle's label and gave it theirs twice over), the pair and the
    // singleton hold their own labels
    assert(labels === Map(1L -> 1L, 2L -> 2L, 3L -> 1L, 5L -> 5L, 6L -> 6L, 9L -> 9L))
  }

  test("graph_lpa: every community label is an existing part id") {
    import spark.implicits._
    val rows = q("graph_lpa")
    assert(rows.count() > 0)
    val orphans = rows.join(
      graft.Tables.part(spark, sf).select($"p_partkey".as("community")),
      Seq("community"), "left_anti").count()
    assert(orphans === 0L, s"$orphans labels are not vertex ids")
  }

  test("graph_ppr_batch: each source tops its own ranking, 5 rows per source") {
    val rows = q("graph_ppr_batch").collect()
    val bySrc = rows.groupBy(_.getLong(0))
    assert(bySrc.keySet === Set(1L, 2L, 3L, 4L, 5L))
    bySrc.foreach { case (src, rs) =>
      assert(rs.length === 5, s"source $src: ${rs.length} rows")
      assert(rs.head.getLong(1) === src, s"source $src should top its own ranking")
    }
  }

  test("graph_jaccard_nodes: jaccard bounded by 1 and consistent with counts") {
    q("graph_jaccard_nodes").collect().foreach { r =>
      val j = r.getDouble(r.fieldIndex("jac"))
      assert(j > 0 && j <= 1.0)
    }
  }

  test("graph_khop_2: hops are 1 or 2 and hop-1 set equals cohort purchases") {
    import spark.implicits._
    val rows = q("graph_khop_2").collect()
    rows.foreach(r => assert(Set(1L, 2L).contains(r.getLong(1))))
    val adj = GraphOps.edges(spark, sf)
    val p1 = adj.join(
        Tables.customer(spark, sf).filter($"c_mktsegment" === "BUILDING")
          .select($"c_custkey".as("src")), "src")
      .select($"dst").distinct().collect().map(_.getLong(0)).toSet
    val got1 = rows.filter(_.getLong(1) == 1L).map(_.getLong(0)).toSet
    assert(got1 === p1)
  }

  test("graph_degree: customer-side degrees sum to edge count") {
    val rows = q("graph_degree").collect()
    val cDeg = rows.filter(_.getString(0) == "c").map(r => r.getLong(r.fieldIndex("degree"))).sum
    val pDeg = rows.filter(_.getString(0) == "p").map(r => r.getLong(r.fieldIndex("degree"))).sum
    val edges = GraphOps.edges(spark, sf).count()
    assert(cDeg === edges)
    assert(pDeg === edges)
  }

  test("graph_trending: scores are positive and descending") {
    val scores = q("graph_trending").collect().map(r => r.getDouble(r.fieldIndex("score")))
    assert(scores.nonEmpty)
    assert(scores.zip(scores.tail).forall { case (x, y) => x >= y })
  }

  test("graph_trending: exp quantization sits far from its floor boundary (cross-libm margin pin)") {
    import spark.implicits._
    // qexp = floor(exp(Δ/7)·1e8 + 0.5): deterministic across libms only
    // if each distinct Δ's scaled value is far from an integer boundary
    // (drift ≤ ~5e-8 scaled). Measured at the driver gate's sf0.01.
    def margin(x: Double): Double = { val f = x - math.floor(x); math.min(f, 1.0 - f) }
    val gate = "/root/testdata/sf0.01"
    val days = Tables.events(spark, gate)
      .select(expr("unix_millis(ts) div 86400000").as("day"))
    val maxDay = days.agg(max($"day")).collect()(0).getLong(0)
    val deltas = days.select(($"day" - maxDay).as("d")).distinct().collect().map(_.getLong(0))
    val m = deltas.map(d => margin(math.exp(d / 7.0) * 1e8 + 0.5)).min
    assert(m > 1e-4, s"qexp margin $m")
    // the value centi-quantization is a basic-op floor (zero cross-libm
    // risk) — assert the data really is 2-decimal so it stays EXACT
    val vals = Tables.events(spark, gate).select($"value").distinct().collect().map(_.getDouble(0))
    val mv = vals.map(v => margin(v * 100.0 + 0.5)).min
    assert(mv > 0.49, s"value not 2-decimal currency: margin $mv")
  }

  test("graph_kcore: fixed-round peel is converged, members verified by induced degree") {
    // registry k=68: at sf0.001 the peel cascades 188→183→178→177→176 and
    // membership is stable from round 5 on (verified against DuckDB). The
    // emitted degree is recomputed over the FINAL survivor set (r7: the
    // post-loop pass added per r6 ADVICE), so (id, deg) is exact at any
    // converged rounds — the fixpoint pin rounds=6 ≡ rounds=7 covers both
    // membership and degree.
    val r7 = GraphOps.kcoreFixed(spark, sf, k = 68, rounds = 7).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val r6 = q("graph_kcore").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(r6 === r7, "peel must reach its fixpoint within the fixed rounds")
    assert(r6.nonEmpty)
    // independent verification: recompute each member's degree within the
    // member set from the raw pair list
    val members = r6.map(_._1)
    val cp = GraphOps.copurchase(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val induced = cp.filter(e => members(e._1) && members(e._2))
    val deg = induced.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .map { case (v, xs) => (v, xs.length.toLong) }
    assert(r6.forall { case (v, d) => deg.getOrElse(v, 0L) == d && d >= 68L })
  }

  test("graph_core_number: levels are the true nested fixpoints, verified by a JVM peel") {
    import spark.implicits._
    val got = q("graph_core_number").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty)
    val cp = GraphOps.copurchase(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // JVM reference: peel each level to its TRUE fixpoint (nested, like
    // the op) — also pins that 6 fixed rounds per level converged
    var pairs = cp
    var expect = cp.flatMap(e => Seq(e._1, e._2)).distinct
      .map(_ -> 0L).toMap
    for (k <- Seq(16, 48, 64, 72)) {
      var alive = pairs.flatMap(e => Seq(e._1, e._2)).toSet
      var changed = true
      while (changed) {
        val deg = pairs.filter(e => alive(e._1) && alive(e._2))
          .flatMap(e => Seq(e._1, e._2)).groupBy(identity)
          .map { case (v, xs) => (v, xs.length) }
        val next = alive.filter(v => deg.getOrElse(v, 0) >= k)
        changed = next != alive
        alive = next
      }
      pairs = pairs.filter(e => alive(e._1) && alive(e._2))
      alive.foreach(v => expect += v -> k.toLong)
    }
    assert(got === expect, "core levels must match the nested JVM fixpoints")
    // the profile found real stratification on this graph
    assert(got.values.toSet.size > 1, "all nodes at one level — degenerate")
  }

  test("kcorePeel equals a JVM brute-force peel on random graphs (3 seeds)") {
    import spark.implicits._
    for (seed <- Seq(7L, 42L, 1234L)) {
      val rnd = new scala.util.Random(seed)
      val n = 10 + rnd.nextInt(5)
      val pairs = (for {
        a <- 0 until n; b <- (a + 1) until n if rnd.nextDouble() < 0.35
      } yield (a.toLong, b.toLong)).distinct
      val k = 2 + rnd.nextInt(2)
      // JVM reference: peel to the true fixpoint
      var alive = pairs.flatMap(e => Seq(e._1, e._2)).toSet
      var changed = true
      while (changed) {
        val deg = pairs.filter(e => alive(e._1) && alive(e._2))
          .flatMap(e => Seq(e._1, e._2)).groupBy(identity)
          .map { case (v, xs) => (v, xs.length) }
        val next = alive.filter(v => deg.getOrElse(v, 0) >= k)
        changed = next != alive
        alive = next
      }
      val expect = pairs.filter(e => alive(e._1) && alive(e._2))
        .flatMap(e => Seq(e._1, e._2)).groupBy(identity)
        .map { case (v, xs) => (v, xs.length.toLong) }.toSet
      // n rounds always suffice: each non-converged round removes >= 1 vertex
      val got = GraphOps.kcorePeel(pairs.toDF("a", "b"), k, rounds = n).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expect, s"seed=$seed n=$n k=$k")
    }
  }

  test("graph_hits: fixture scores recompute exactly via JVM integer arithmetic") {
    val S = 1000000000000L
    val rows = q("graph_hits").collect()
    assert(rows.length === 40)
    // pure-JVM mirror of the 6-iteration integer recurrence
    val e = GraphOps.edges(spark, sf).collect().map(r => (r.getLong(0), r.getLong(1)))
    var h = e.map(_._1).distinct.map(c => c -> S).toMap
    var a = Map.empty[Long, Long]
    def norm(m: Map[Long, Long]): Map[Long, Long] = {
      val qd = math.max(1L, m.values.max / S)
      m.map { case (k, v) => k -> v / qd }
    }
    for (_ <- 1 to 6) {
      a = norm(e.groupBy(_._2).map { case (p, es) => p -> es.map(x => h(x._1)).sum })
      h = norm(e.groupBy(_._1).map { case (c, es) => c -> es.map(x => a(x._2)).sum })
    }
    rows.foreach { r =>
      val ref = if (r.getString(0) == "p") a else h
      assert(ref(r.getLong(1)) === r.getLong(2),
        s"${r.getString(0)}/${r.getLong(1)}")
    }
    // and the top-20 cut is the true ordering of the reference scores
    val topP = a.toSeq.sortBy { case (id, x) => (-x, id) }.take(20).map(_._1)
    assert(rows.filter(_.getString(0) == "p").map(_.getLong(1)).toSeq === topP
      .sortBy(id => (-a(id), id)))
  }

  test("graph_eigencentrality: fixture scores recompute via JVM integer arithmetic") {
    val S = 1000000000000L
    val rows = q("graph_eigencentrality").collect()
    assert(rows.length === 20)
    val cp = GraphOps.copurchase(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val e2 = cp ++ cp.map(e => (e._2, e._1))
    var x = e2.map(_._1).distinct.map(_ -> S).toMap
    for (_ <- 1 to 6) {
      val raw = e2.groupBy(_._1).map { case (a, es) => a -> es.map(e => x(e._2)).sum }
      val qd = math.max(1L, raw.values.max / S)
      x = raw.map { case (k, v) => k -> v / qd }
    }
    rows.foreach { r => assert(x(r.getLong(0)) === r.getLong(1)) }
    val top = x.toSeq.sortBy { case (id, v) => (-v, id) }.take(20).map(_._1)
    assert(rows.map(_.getLong(0)).toSeq === top)
  }

  test("graph_ego_net: exactly the induced edges of the seed's 1-hop ball") {
    val rows = q("graph_ego_net").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows.nonEmpty)
    val cp = GraphOps.copurchase(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ball = cp.collect {
      case (a, b, _) if a == 1L => b
      case (a, b, _) if b == 1L => a
    }.toSet + 1L
    val induced = cp.filter(e => ball(e._1) && ball(e._2)).toSet
    assert(rows === induced)
    // the seed's own edges are a subset (seed is in the ball)
    assert(cp.filter(e => e._1 == 1L || e._2 == 1L).toSet.subsetOf(rows))
  }

  test("graph_eccentricity: max-fold over the same landmark distances as closeness") {
    import spark.implicits._
    val ecc = q("graph_eccentricity").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(ecc.nonEmpty)
    val lm = Tables.part(spark, sf).select("p_partkey").collect()
      .map(_.getLong(0)).sorted.take(8)
    val cpDf = graft.ops.GraphOps.copurchase(spark, sf).select($"a", $"b")
    val both = cpDf.unionAll(cpDf.select($"b".as("a"), $"a".as("b")))
    val perSource = lm.flatMap { src =>
      graft.api.GraphAlgebra.bfsHops(both, src, 6).collect()
        .map(r => (src, r.getLong(0), r.getLong(1)))
    }
    val exp = perSource.groupBy(_._2).map { case (id, xs) =>
      id -> (xs.length.toLong, xs.map(_._3).max)
    }
    assert(ecc === exp)
    // landmarks themselves appear with their self-distance 0 counted
    lm.foreach(l => assert(ecc.contains(l)))
  }

  test("graph_closeness: one multi-source pass equals 8 single-source BFS runs") {
    import spark.implicits._
    val got = q("graph_closeness").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.nonEmpty)
    // landmark set = 8 smallest part ids
    val lm = Tables.part(spark, sf).select("p_partkey").collect()
      .map(_.getLong(0)).sorted.take(8)
    // per-landmark single-source BFS through the already-proven bfsHops
    val cpDf = graft.ops.GraphOps.copurchase(spark, sf).select($"a", $"b")
    val both = cpDf.unionAll(cpDf.select($"b".as("a"), $"a".as("b")))
    val perSource = lm.flatMap { src =>
      graft.api.GraphAlgebra.bfsHops(both, src, 6).collect()
        .map(r => (src, r.getLong(0), r.getLong(1)))
    }
    val exp = perSource.filter(_._3 > 0).groupBy(_._2).map { case (id, xs) =>
      id -> (xs.length.toLong,
        xs.map(x => (2000000000L + x._3) / (2L * x._3)).sum)
    }
    assert(got === exp)
    // a landmark's own row (if present) counts only OTHER landmarks
    got.foreach { case (_, (n, _)) => assert(n >= 1L && n <= 8L) }
  }

  test("graph_hop_histogram: pair counts reconcile with closeness/eccentricity reach") {
    import spark.implicits._
    val rows = q("graph_hop_histogram").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(rows.nonEmpty && rows.forall(r => r._1 >= 1 && r._1 <= 6))
    // total pairs equal the closeness op's reach (same traversal, d > 0)
    val reach = q("graph_closeness").collect().map(_.getLong(1)).sum
    assert(rows.map(_._2).sum === reach)
    // cum_share monotone to 1.0; quantization recomputes
    var cum = 0L
    val tot = rows.map(_._2).sum
    rows.foreach { case (_, n, share) =>
      cum += n
      assert(share === math.floor(cum.toDouble / tot * 10000.0 + 0.5) / 10000.0)
    }
    assert(rows.last._3 === 1.0)
  }

  test("graph_bfs_tree: parents are valid previous-level neighbors; levels partition reachability") {
    import spark.implicits._
    val rows = q("graph_bfs_tree").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(rows.nonEmpty)
    val edges = graft.ops.GraphOps.copurchase(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = (edges ++ edges.map(e => (e._2, e._1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val seeds = Tables.part(spark, sf).select($"p_partkey").collect()
      .map(_.getLong(0)).filter(_ < 5).toSet
    // JVM BFS with min-parent rule
    val l0 = seeds
    val l1 = l0.flatMap(adj.getOrElse(_, Set.empty)) -- l0
    val l2 = l1.flatMap(adj.getOrElse(_, Set.empty)) -- l0 -- l1
    val byHop = rows.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byHop.getOrElse(0L, Set.empty) === l0)
    assert(byHop.getOrElse(1L, Set.empty) === l1)
    assert(byHop.getOrElse(2L, Set.empty) === l2)
    rows.foreach { case (node, hop, parent) =>
      if (hop == 0L) assert(parent.isEmpty)
      else {
        val prev = if (hop == 1L) l0 else l1
        val expParent = adj(node).intersect(prev).min
        assert(parent === Some(expParent), s"node $node parent")
      }
    }
  }

  test("graph_triangle_sample: deterministic sample recomputes; estimate scales by 64") {
    import spark.implicits._
    val r = q("graph_triangle_sample").collect().head
    val (ne, ns, ts0, est, exact) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(est === ts0 * 64)
    assert(exact === q("graph_triangles").collect().head.getLong(0))
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val edges = graft.ops.GraphOps.copurchase(spark, sf).collect()
      .map(row => (row.getLong(0), row.getLong(1)))
    assert(ne === edges.length.toLong)
    val sampled = edges.filter { case (a, b) =>
      java.lang.Long.parseLong(md5hex(s"${a}_$b").substring(0, 4), 16) % 4 == 0
    }
    assert(ns === sampled.length.toLong, "sampled edge count")
    // sampled triangle count recomputes on the sampled simple graph
    val sset = sampled.toSet
    val adj = sampled.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expTs = sampled.map { case (a, b) =>
      (adj.getOrElse(a, Set.empty) & adj.getOrElse(b, Set.empty)).size.toLong
    }.sum
    assert(ts0 === expTs, "sampled triangles")
    assert(r.getDouble(5) ===
      math.floor((est - exact).toDouble / exact * 10000.0 + 0.5) / 10000.0)
  }

  test("graph_transitivity: closed-wedge ratio reconciles with graph_triangles and degrees") {
    import spark.implicits._
    val r = q("graph_transitivity").collect()
    assert(r.length === 1)
    val (wedges, tris) = (r.head.getLong(0), r.head.getLong(1))
    // triangles agree with the standalone graph_triangles op
    val triOp = q("graph_triangles").collect().head.getLong(0)
    assert(tris === triOp)
    // wedges recompute from degrees
    val edges = graft.ops.GraphOps.copurchase(spark, sf).collect()
      .map(row => (row.getLong(0), row.getLong(1)))
    val deg = (edges.map(_._1) ++ edges.map(_._2))
      .groupBy(identity).view.mapValues(_.length.toLong)
    val expWed = deg.values.map(d => d * (d - 1) / 2).sum
    assert(wedges === expWed)
    if (wedges > 0) {
      val t = r.head.getDouble(2)
      assert(t === math.floor(tris * 3.0 / wedges * 10000.0 + 0.5) / 10000.0)
      assert(t >= 0.0 && t <= 1.0)
    }
  }

  test("graph_knn_degree: average neighbor degree per class recomputes exactly") {
    import spark.implicits._
    val rows = q("graph_knn_degree").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows.nonEmpty)
    val edges = graft.ops.GraphOps.copurchase(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = (edges ++ edges.map(e => (e._2, e._1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSeq).toMap
    val deg = adj.view.mapValues(_.length.toLong).toMap
    val byK = adj.toSeq.map { case (u, nbrs) =>
      (deg(u), nbrs.map(deg).sum)
    }.groupBy(_._1)
    assert(rows.keySet === byK.keySet)
    byK.foreach { case (k, xs) =>
      val (gn, gknn) = rows(k)
      assert(gn === xs.length.toLong, s"k=$k n_nodes")
      val snd = xs.map(_._2).sum
      assert(gknn === math.floor(snd.toDouble / (k * xs.length).toDouble
        * 10000.0 + 0.5) / 10000.0, s"k=$k knn")
    }
  }

  test("graph_rich_club: phi(k) recomputes from degrees; curve covers all four k") {
    import spark.implicits._
    val rows = q("graph_rich_club").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(rows.keySet === Set(2L, 4L, 8L, 16L))
    val edges = graft.ops.GraphOps.copurchase(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val deg = (edges.map(_._1) ++ edges.map(_._2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    Seq(2L, 4L, 8L, 16L).foreach { k =>
      val club = deg.filter(_._2 >= k).keySet
      val e = edges.count(p => club(p._1) && club(p._2)).toLong
      val (gn, ge, gp) = rows(k)
      assert(gn === club.size.toLong, s"k=$k n_club")
      assert(ge === e, s"k=$k e_club")
      val expPhi = if (club.size >= 2)
        Some(math.floor((e * 2).toDouble /
          (club.size.toDouble * (club.size - 1).toDouble) * 10000.0 + 0.5) / 10000.0)
      else None
      assert(gp === expPhi, s"k=$k phi")
    }
    // a rich club is at least as dense as the graph at large (weak check:
    // phi is a valid density)
    rows.values.flatMap(_._3).foreach(p => assert(p >= 0.0 && p <= 1.0))
  }

  test("graph_modularity: per-community contributions recompute from LPA labels and edges") {
    import spark.implicits._
    val rows = q("graph_modularity").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toMap
    assert(rows.nonEmpty)
    val lbl = q("graph_lpa").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = graft.ops.GraphOps.copurchase(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val m2 = edges.map(_._3).sum * 2
    val deg = (edges.map(e => e._1 -> e._3) ++ edges.map(e => e._2 -> e._3))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val degC = deg.toSeq.map { case (v, d) => lbl(v) -> d }.groupBy(_._1)
      .view.mapValues(xs => (xs.length.toLong, xs.map(_._2).sum)).toMap
    val inC = edges.filter(e => lbl(e._1) == lbl(e._2))
      .groupBy(e => lbl(e._1)).view.mapValues(_.map(_._3).sum).toMap
    assert(rows.keySet === degC.keySet)
    rows.foreach { case (c, (nNodes, inW, degW, qc)) =>
      val (en, ed) = degC(c)
      assert(nNodes === en, s"community $c n_nodes")
      assert(degW === ed, s"community $c deg_w")
      assert(inW === inC.getOrElse(c, 0L), s"community $c in_w")
      val tree = ((inW * 2).toDouble / m2.toDouble -
        (degW.toDouble / m2.toDouble) * (degW.toDouble / m2.toDouble))
      assert(qc === math.floor(tree * 1.0e9 + 0.5) / 1.0e9, s"community $c q")
    }
    // degrees across communities account for every edge end; Q is sane
    assert(rows.values.map(_._3).sum === m2)
    val q0 = rows.values.map(_._4).sum
    assert(q0 >= -0.5 && q0 <= 1.0, s"modularity $q0")
  }

  test("graph_louvain: optimizer beats (or ties) the LPA vote on modularity, and Q recomputes") {
    import spark.implicits._
    val rows = q("graph_louvain").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toMap
    assert(rows.nonEmpty)
    // the decomposition must recompute from the louvainMoves labels —
    // same replay as the graph_modularity spec, different partition
    val lbl = graft.api.GraphAlgebra.louvainMoves(
        spark.read.parquet(s"$sf/part.parquet").select($"p_partkey".as("part")),
        graft.ops.GraphOps.copurchase(spark, sf), rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = graft.ops.GraphOps.copurchase(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val m2 = edges.map(_._3).sum * 2
    val deg = (edges.map(e => e._1 -> e._3) ++ edges.map(e => e._2 -> e._3))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val degC = deg.toSeq.map { case (v, d) => lbl(v) -> d }.groupBy(_._1)
      .view.mapValues(xs => (xs.length.toLong, xs.map(_._2).sum)).toMap
    val inC = edges.filter(e => lbl(e._1) == lbl(e._2))
      .groupBy(e => lbl(e._1)).view.mapValues(_.map(_._3).sum).toMap
    assert(rows.keySet === degC.keySet)
    rows.foreach { case (c, (nNodes, inW, degW, qc)) =>
      val (en, ed) = degC(c)
      assert(nNodes === en, s"community $c n_nodes")
      assert(degW === ed, s"community $c deg_w")
      assert(inW === inC.getOrElse(c, 0L), s"community $c in_w")
      val tree = ((inW * 2).toDouble / m2.toDouble -
        (degW.toDouble / m2.toDouble) * (degW.toDouble / m2.toDouble))
      assert(qc === math.floor(tree * 1.0e9 + 0.5) / 1.0e9, s"community $c q")
    }
    // the point of the op: the gain-driven moves reach at least the Q of
    // the LPA frequency vote on the identical graph
    val qLouvain = rows.values.map(_._4).sum
    val qLpa = q("graph_modularity").collect().map(_.getDouble(4)).sum
    assert(qLouvain >= qLpa,
      s"louvain Q $qLouvain < LPA Q $qLpa — the optimizer lost to the vote")
    // and it found real structure, not one blob / all singletons
    assert(rows.size > 1 && rows.size < lbl.size)
  }

  test("graph_louvain_multi: level 2 improves (or ties) level 1's Q and compresses") {
    val rows = q("graph_louvain_multi").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows.keySet === Set(1L, 2L))
    val (n1, q1) = rows(1L)
    val (n2, q2) = rows(2L)
    // the aggregation phase's point: coarse-graph moves may only merge
    // communities whose union raises Q — never lose ground
    assert(q2 >= q1, s"level-2 Q $q2 < level-1 Q $q1")
    assert(n2 <= n1, s"level 2 has MORE communities ($n2) than level 1 ($n1)")
    // level 1 must agree with the one-level op's decomposition exactly
    val oneLevel = q("graph_louvain").collect()
    assert(n1 === oneLevel.length.toLong)
    val q1FromOp = oneLevel.map(_.getDouble(4)).sum
    assert(math.abs(q1 - q1FromOp) < 1e-6,
      s"level-1 Q $q1 != one-level op's decomposition sum $q1FromOp")
    // and the second level actually found structure on this graph
    assert(q2 > -0.5 && q2 <= 1.0)
  }

  test("graph_louvain_dendro: valid hierarchy, monotone per-level Q, multi-agreement") {
    val rows = q("graph_louvain_dendro").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // a DENDROGRAM: each level refines the next — c1 determines c2, c2
    // determines c3 (one parent per child, no crossing)
    assert(rows.groupBy(_._2).values.forall(_.map(_._3).distinct.length == 1))
    assert(rows.groupBy(_._3).values.forall(_.map(_._4).distinct.length == 1))
    // level 1 and 2 agree with graph_louvain_multi's machinery: same
    // community counts as the 2-level op reports
    val multi = q("graph_louvain_multi").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.map(_._2).distinct.length.toLong === multi(1L))
    assert(rows.map(_._3).distinct.length.toLong === multi(2L))
    // per-level modularity is MONOTONE non-decreasing up the hierarchy
    // (coarse-graph moves only take strictly-positive exact-integer gains)
    val edges = graft.ops.GraphOps.copurchase(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val m2 = edges.map(_._3).sum * 2
    val deg = (edges.map(e => e._1 -> e._3) ++ edges.map(e => e._2 -> e._3))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    def qOf(lbl: Map[Long, Long]): Double = {
      val degC = deg.toSeq.map { case (v, d) => lbl(v) -> d }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum)
      val inC = edges.filter(e => lbl(e._1) == lbl(e._2))
        .groupBy(e => lbl(e._1)).view.mapValues(_.map(_._3).sum).toMap
      degC.map { case (c, dc) =>
        (inC.getOrElse(c, 0L) * 2).toDouble / m2.toDouble -
          (dc.toDouble / m2.toDouble) * (dc.toDouble / m2.toDouble)
      }.sum
    }
    val q1 = qOf(rows.map(t => t._1 -> t._2).toMap)
    val q2 = qOf(rows.map(t => t._1 -> t._3).toMap)
    val q3 = qOf(rows.map(t => t._1 -> t._4).toMap)
    assert(q2 >= q1 - 1e-12, s"level-2 Q $q2 < level-1 Q $q1")
    assert(q3 >= q2 - 1e-12, s"level-3 Q $q3 < level-2 Q $q2")
  }

  test("louvainDendrogram early-stop is output-identical and schema-stable on a fixture") {
    import spark.implicits._
    // two disconnected 3-cliques: each collapses to one community in the
    // level-1 sweeps, then level 2 has no inter edges and no positive
    // gain — the move FIXPOINT, so levels 3-4 are copy-forward
    val e = Seq((1L, 2L, 5L), (1L, 3L, 5L), (2L, 3L, 5L),
      (4L, 5L, 5L), (4L, 6L, 5L), (5L, 6L, 5L))
      .toDF("a", "b", "w")
    val v = (1L to 6L).toDF("part")
    val d = graft.api.GraphAlgebra.louvainDendrogram(v, e, levels = 4,
        rounds = 3)
      .orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(d.length === 6)
    // two communities, stable through all four levels (fixpoint copy-
    // forward keeps the declared schema and the converged labels)
    val byC1 = d.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byC1.values.toSet === Set(Set(1L, 2L, 3L), Set(4L, 5L, 6L)))
    assert(d.forall(t => t._3 == t._2 && t._4 == t._2 && t._5 == t._2))
  }

  /** In-JVM reference Brandes with the op's EXACT quantized arithmetic:
    * level-synchronous BFS σ counts, then backward micro-quantized δ via
    * the identical double tree floor(σv/σw·(1e6+δw)+0.5).
    */
  private def refBrandes(adj: Map[Long, Seq[Long]], src: Long, maxHops: Int)
      : Map[Long, (Long, Long, Long)] = {
    val dist = scala.collection.mutable.Map(src -> 0L)
    val sigma = scala.collection.mutable.Map(src -> 1L)
    val levels = scala.collection.mutable.Map(0L -> Seq(src))
    var frontier = Seq(src)
    var h = 1L
    while (frontier.nonEmpty && h <= maxHops) {
      val next = scala.collection.mutable.Map[Long, Long]()
      for (v <- frontier; w <- adj.getOrElse(v, Nil) if !dist.contains(w))
        next(w) = next.getOrElse(w, 0L) + sigma(v)
      for ((w, sg) <- next) { dist(w) = h; sigma(w) = sg }
      frontier = next.keys.toSeq
      if (frontier.nonEmpty) levels(h) = frontier
      h += 1
    }
    val delta = scala.collection.mutable.Map[Long, Long]()
    val hmax = levels.keys.max
    levels(hmax).foreach(v => delta(v) = 0L)
    for (lev <- (hmax - 1) to 1L by -1L; v <- levels(lev)) {
      delta(v) = adj.getOrElse(v, Nil)
        .filter(w => dist.get(w).contains(lev + 1))
        .map(w => math.floor(sigma(v).toDouble / sigma(w).toDouble *
          (1000000L + delta(w)).toDouble + 0.5).toLong)
        .sum
    }
    dist.keys.filter(_ != src)
      .map(v => v -> ((dist(v), sigma(v), delta(v)))).toMap
  }

  test("graph_betweenness machinery equals in-JVM Brandes on a fixture graph") {
    import spark.implicits._
    // deterministic sparse graph: ring + chords → multiple equal-length
    // shortest paths, so σ > 1 and fractional dependencies exercise the
    // quantization
    val n = 24
    val ring = (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong))
    val chords = (0 until n by 3).map(i => (i.toLong, ((i + 7) % n).toLong))
    val pairs = (ring ++ chords).map { case (a, b) =>
      if (a < b) (a, b) else (b, a)
    }.distinct
    val both = pairs.toDF("a", "b")
      .unionAll(pairs.map(_.swap).toDF("a", "b"))
    val adj = (pairs ++ pairs.map(_.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2) }
    val sources = Seq(0L, 5L, 11L).toDF("src")
    val sigma = api.GraphAlgebra.multiBfsSigma(both, sources, maxHops = 6)
    val deltas = api.GraphAlgebra.brandesDeltas(both, sigma)
    val got = deltas.as("d")
      .join(sigma.as("g"), $"d.src" === $"g.src" && $"d.id" === $"g.id")
      .select($"d.src", $"d.id", $"g.dist", $"g.sigma", $"d.delta")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val want = (for {
      s <- Seq(0L, 5L, 11L)
      (v, t) <- refBrandes(adj, s, 6)
    } yield (s, v) -> t).toMap
    assert(got === want)
    // and the registry op runs with a sane shape on the sf fixture
    val op = q("graph_betweenness").collect()
    assert(op.nonEmpty)
    assert(op.forall(_.getLong(2) >= 0L), "negative betweenness credit")
  }
}
