package graft

import org.apache.spark.sql.functions._

/** Independent JVM cross-checks for round-15 work (the SURVEY.md §5
  * two-witness discipline, same as Round11Spec..Round14Spec).
  */
class Round15Spec extends SparkSpec {

  test("graph_mst_boruvka equals a local Kruskal under the identical total order; spanning + acyclic") {
    import spark.implicits._
    val got = SparkEntry.queries("graph_mst_boruvka")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // independent witness: Kruskal with union-find under the same
    // (-w, a, b) lexicographic order — the unique max spanning forest
    val edges = graft.ops.GraphOps.copurchase(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val want = scala.collection.mutable.Set[(Long, Long, Long)]()
    edges.sortBy { case (a, b, w) => (-w, a, b) }.foreach { case (a, b, w) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { parent(ra) = rb; want += ((a, b, w)) }
    }
    assert(got === want.toSet)
    // spanning forest invariants: |F| = |V| - #components, acyclic by
    // construction of the witness (got === want implies it for the op)
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val nComp = verts.map(find).distinct.length
    assert(got.size === verts.length - nComp)
  }

  test("boruvkaForest distributed rounds (forced tiny bounds) match the round-0 local fast path") {
    import spark.implicits._
    val edges = graft.ops.GraphOps.copurchase(spark, sf)
      .select($"a", $"b", (-$"w").as("w"))
    // default bounds at sf0.001 take the round-0 local-Kruskal fast path;
    // forcing every bound to 1 exercises the full distributed machinery
    // (pair collapse, per-component min pick, distributed CC contraction)
    // — the MSF is unique under the strict (w, a, b) order, so the two
    // paths must return the exact same edge set
    def toSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val fast = toSet(graft.api.GraphAlgebra.boruvkaForest(edges))
    val dist = toSet(graft.api.GraphAlgebra.boruvkaForest(
      edges, localFinishMax = 1L, localContractMax = 1L))
    assert(dist === fast)
    // and the hybrid local-contract path (union-find relabel, no CC)
    val hyb = toSet(graft.api.GraphAlgebra.boruvkaForest(
      edges, localFinishMax = 1L, localContractMax = 1000000L))
    assert(hyb === fast)
  }

  test("graph_harmonic / graph_edge_anomaly: exact-integer invariants") {
    import spark.implicits._
    val h = SparkEntry.queries("graph_harmonic")(spark, sf).collect()
    assert(h.nonEmpty)
    h.foreach { r =>
      val (n, nano) = (r.getLong(1), r.getLong(2))
      // each of the n landmark terms is round(1e9/d), d in 1..6
      assert(nano >= n * 166666667L && nano <= n * 1000000000L)
      assert(math.abs(r.getDouble(3) - nano / 1.0e9) < 1e-12)
    }
    val ea = SparkEntry.queries("graph_edge_anomaly")(spark, sf).collect()
    assert(ea.length <= 20 && ea.nonEmpty)
    val lifts = ea.map(_.getLong(5))
    assert(lifts.zip(lifts.tail).forall { case (x, y) => x >= y },
      "lift_ppm must be non-increasing")
    ea.foreach { r =>
      assert(r.getLong(2) >= 3L, "w >= 3 pre-filter")
      assert(r.getLong(5) >= 0L)
    }
  }

  test("agg_wilcoxon_signed: bitwise JVM recompute of the bucketed signed-rank z") {
    import spark.implicits._
    val got = SparkEntry.queries("agg_wilcoxon_signed")(spark, sf).collect()(0)
    // independent JVM replay: per-user half-month Σq diffs, bucket, rank
    val ev = Tables.events(spark, sf)
      .select($"user_id", dayofmonth($"ts").as("dom"),
        round($"value" * 10000).cast("long").as("q"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val ds = ev.groupBy(_._1).values.flatMap { rows =>
      val (h1, h2) = rows.partition(_._2 <= 15)
      if (h1.isEmpty || h2.isEmpty) None
      else {
        val d = h2.map(_._3).sum - h1.map(_._3).sum
        if (d == 0) None else Some(d)
      }
    }.toSeq
    val byB = ds.groupBy(d => (math.abs(d) - 1) / 100)
      .map { case (b, xs) => (b, xs.size.toLong, xs.count(_ > 0).toLong) }
      .toSeq.sortBy(_._1)
    var cum = 0L; var n = 0L; var w2 = 0L; var ts = 0L
    byB.foreach { case (_, c, cpos) =>
      cum += c
      val r2 = 2L * (cum - c) + c + 1
      n += c; w2 += cpos * r2; ts += c * c * c - c
    }
    val z = (w2.toDouble / 2.0 - n.toDouble * (n.toDouble + 1.0) / 4.0) /
      math.sqrt(n.toDouble * (n.toDouble + 1.0) * (2.0 * n.toDouble + 1.0)
        / 24.0 - ts.toDouble / 48.0)
    assert(got.getLong(0) === n)
    assert(got.getDouble(1) === w2.toDouble / 2.0)
    assert(got.getDouble(2) ===
      math.floor(z * 10000.0 + 0.5) / 10000.0)
  }

  test("r15 stats wave: mood/kendall_w/hypergeom invariants") {
    import spark.implicits._
    val mm = SparkEntry.queries("agg_mood_median")(spark, sf).collect()(0)
    assert(mm.getLong(4) === mm.getLong(1) - 1) // df = k - 1
    assert(mm.getDouble(3) >= 0.0)                      // chi2 >= 0
    assert(mm.getLong(2) < mm.getLong(0))               // above < n (median splits)
    val kw = SparkEntry.queries("agg_kendall_w")(spark, sf).collect()(0)
    val (w, chi2) = (kw.getDouble(2), kw.getDouble(3))
    assert(w >= -0.0001 && w <= 1.0001, s"W=$w outside [0,1]")
    val expChi = kw.getLong(0).toDouble * (kw.getLong(1) - 1).toDouble * w
    assert(math.abs(chi2 - expChi) < 0.01)
    val hg = SparkEntry.queries("agg_hypergeom_test")(spark, sf).collect()(0)
    assert(hg.getLong(1) + hg.getLong(2) + hg.getLong(3) + hg.getLong(4)
      === hg.getLong(0))
    assert(hg.getDouble(6) <= 0.0) // log10 of a pmf
    // the Stirling ln-factorial tree is <1e-9 off exact ln(k!) even at k=0
    def lnStir(z: Double): Double =
      (z - 0.5) * math.log(z) - z + 0.5 * math.log(2.0 * math.Pi) +
        1.0 / (12.0 * z) - 1.0 / (360.0 * z * z * z) +
        1.0 / (1260.0 * math.pow(z, 5))
    def lfact(n: Long): Double = {
      val x = n.toDouble
      lnStir(x + 7.0) - math.log((x + 1.0) * (x + 2.0) * (x + 3.0) *
        (x + 4.0) * (x + 5.0) * (x + 6.0))
    }
    (0L to 20L).foreach { k =>
      val exact = (1L to k).map(i => math.log(i.toDouble)).sum
      assert(math.abs(lfact(k) - exact) < 1e-9, s"lfact($k)")
    }
  }

  test("r15 post-hoc wave: cronbach/partial_corr/tukey/dunn invariants") {
    import spark.implicits._
    val ca = SparkEntry.queries("agg_cronbach_alpha")(spark, sf).collect()(0)
    assert(ca.getLong(1) >= 2L)             // k items
    assert(ca.getDouble(2) <= 1.0001)       // alpha <= 1 by construction
    val pc = SparkEntry.queries("agg_partial_corr")(spark, sf).collect()(0)
    (1 to 4).foreach(i =>
      assert(math.abs(pc.getDouble(i)) <= 1.0001, s"col $i out of [-1,1]"))
    // JVM replay of the full partial-corr tree from the daily triple
    val daily = Tables.events(spark, sf)
      .select((unix_millis($"ts") / lit(86400000L)).cast("long").as("d"),
        $"event_type", round($"value" * 10000).cast("long").as("q"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1).map { case (_, rs) =>
        (rs.filter(_._2 == "click").map(_._3).sum,
          rs.filter(_._2 == "purchase").map(_._3).sum, rs.size.toLong)
      }.toSeq
    val n = daily.size.toDouble
    def r(sa: Double, sb: Double, sab: Double, saa: Double,
          sbb: Double): Double =
      (n * sab - sa * sb) / math.sqrt((n * saa - sa * sa) * (n * sbb - sb * sb))
    val (sx, sy, sz) = (daily.map(_._1).sum.toDouble,
      daily.map(_._2).sum.toDouble, daily.map(_._3).sum.toDouble)
    def bi(f: ((Long, Long, Long)) => (BigInt, BigInt)): Double =
      daily.map { t => val (a, b) = f(t); a * b }.sum.toDouble
    val rxy = r(sx, sy, bi(t => (BigInt(t._1), BigInt(t._2))),
      bi(t => (BigInt(t._1), BigInt(t._1))), bi(t => (BigInt(t._2), BigInt(t._2))))
    val rxz = r(sx, sz, bi(t => (BigInt(t._1), BigInt(t._3))),
      bi(t => (BigInt(t._1), BigInt(t._1))), bi(t => (BigInt(t._3), BigInt(t._3))))
    val ryz = r(sy, sz, bi(t => (BigInt(t._2), BigInt(t._3))),
      bi(t => (BigInt(t._2), BigInt(t._2))), bi(t => (BigInt(t._3), BigInt(t._3))))
    def p4(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    assert(pc.getDouble(1) === p4(rxy))
    assert(pc.getDouble(4) === p4((rxy - rxz * ryz) /
      math.sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz))))
    val th = SparkEntry.queries("agg_tukey_hsd")(spark, sf).collect()
    assert(th.length === 21)                          // 7 choose 2
    assert(th.forall(_.getDouble(5) >= 0.0))          // q >= 0
    val dn = SparkEntry.queries("agg_dunn_test")(spark, sf).collect()
    assert(dn.length === 10)                          // 5 choose 2
    assert(dn.forall(r2 => !r2.getDouble(4).isNaN))
  }

  test("graph_circuit_rank / graph_dominating_set invariants") {
    import spark.implicits._
    val cr = SparkEntry.queries("graph_circuit_rank")(spark, sf).collect()(0)
    val (v, e, c, rank) =
      (cr.getLong(0), cr.getLong(1), cr.getLong(2), cr.getLong(3))
    assert(rank === e - v + c && rank >= 0)
    // cross-check V and C against the independently-graded cc labeling
    val cc = SparkEntry.queries("graph_cc_df")(spark, sf).collect()
    assert(v === cc.length.toLong)
    assert(c === cc.map(_.getLong(1)).distinct.length.toLong)
    val ds = SparkEntry.queries("graph_dominating_set")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val doms = ds.filter(_._3).map(_._1).toSet
    assert(ds.forall { case (_, d, _) => doms.contains(d) },
      "every elected dominator is flagged")
    assert(ds.map(_._2).toSet.subsetOf(doms))
    // validity: every vertex's dominator is in its closed neighborhood
    val adj = graft.ops.GraphOps.copurchase(spark, sf)
      .filter($"w" >= 2).select($"a", $"b").collect()
      .flatMap(r => Seq(r.getLong(0) -> r.getLong(1),
        r.getLong(1) -> r.getLong(0)))
      .groupBy(_._1).map { case (k2, vs) => k2 -> vs.map(_._2).toSet }
    assert(ds.forall { case (p, d, _) =>
      d == p || adj.getOrElse(p, Set.empty[Long]).contains(d) })
  }

  test("win_twap / win_beta_rolling: exact-integer recompute on a sample") {
    import spark.implicits._
    val tw = SparkEntry.queries("win_twap")(spark, sf).collect()
    assert(tw.nonEmpty)
    // JVM replay of one (user, day) group picked deterministically
    val (u0, d0) = (tw.head.getLong(0), tw.head.getLong(1))
    val evs = Tables.events(spark, sf)
      .select($"user_id", (unix_millis($"ts") / lit(86400000L)).cast("long")
        .as("d"), unix_millis($"ts").as("ms"), $"event_id",
        round($"value" * 10000).cast("long").as("q"))
      .filter($"user_id" === u0 && $"d" === d0)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2))
    val gaps = evs.zip(evs.drop(1)).map { case ((t1, _, q), (t2, _, _)) =>
      (q, t2 - t1) }
    val (num, den) = (gaps.map(g => g._1 * g._2).sum, gaps.map(_._2).sum)
    assert(tw.head.getLong(2) === evs.length.toLong)
    assert(tw.head.getDouble(3) ===
      math.floor(num.toDouble / den.toDouble / 10000.0 * 10000.0 + 0.5)
        / 10000.0)
    val br = SparkEntry.queries("win_beta_rolling")(spark, sf).collect()
    assert(br.nonEmpty)
    assert(br.forall(r => r.getLong(2) >= 1L && r.getLong(2) <= 7L))
  }

  test("Gdpr.purgePath keeps NULL-key rows (purge deletes exactly pred IS TRUE)") {
    import spark.implicits._
    import graft.api.Gdpr
    val p = graft.Scratch.dir("spec_gdpr_null_keys")
    // 3 purgeable keys, 4 survivors, 2 NULL-key rows — the nulls are NOT
    // in the requested cohort and must survive the rewrite (ADVICE r14:
    // !pred over a NULL pred used to silently drop them)
    Seq[(java.lang.Long, String)]((0L, "a"), (5L, "b"), (10L, "c"),
      (1L, "d"), (2L, "e"), (3L, "f"), (4L, "g"),
      (null, "h"), (null, "i"))
      .toDF("user_id", "payload")
      .write.mode("overwrite").parquet(s"$p/store")
    val (before, after) = Gdpr.purgePath(spark, s"$p/store",
      col("user_id") % 5 === 0)
    assert(before === 9L && after === 6L)
    val left = spark.read.parquet(s"$p/store")
    assert(left.filter($"user_id".isNull).count() === 2L,
      "NULL-key rows must survive a keyed purge")
    assert(left.filter($"user_id" % 5 === 0).count() === 0L)
  }

  test("agg_quantile_merge: merged read inside the exact [p-2/K, p+2/K] bracket; rollup touches only anchors") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val K = 64
    val rows = SparkEntry.queries("agg_quantile_merge")(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq === Seq(0.5, 0.9, 0.99))
    // exact quantile brackets at p ± 2/K (the equi-depth merge rank bound)
    val ev = Tables.events(spark, sf)
      .select($"value").as[Double].collect().sorted
    def exactQ(p: Double): Double = {
      val r = (p.min(1.0).max(0.0)) * (ev.length - 1)
      val lo = r.toInt
      if (lo + 1 < ev.length) ev(lo) + (r - lo) * (ev(lo + 1) - ev(lo))
      else ev(ev.length - 1)
    }
    rows.foreach { case (p, est, exact, nRows, nAnchors) =>
      assert(nRows === ev.length.toLong)
      val (lo, hi) = (exactQ(p - 2.0 / K), exactQ(p + 2.0 / K))
      assert(est >= lo && est <= hi,
        s"p=$p merged=$est outside exact bracket [$lo, $hi]")
      // the op's own exact column matches the reference interpolation
      assert(math.abs(exact - exactQ(p)) < 1e-9)
      // rollup state = n_days x K anchors, never the fact rows
      val nDays = Tables.events(spark, sf)
        .select((unix_millis($"ts") / lit(86400000L)).cast("long"))
        .distinct().count()
      assert(nAnchors === nDays * K)
      // the compression claim (anchors << facts) needs n_day >> K; at
      // sf0.001 a day holds ~33 events so the spine is legitimately
      // larger — only assert it when the data is big enough to show it
      if (nRows > nDays * K * 2) assert(nAnchors < nRows)
    }
    // deterministic across invocations (stored-artifact contract)
    val again = SparkEntry.queries("agg_quantile_merge")(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    assert(again.toSeq === rows.map(t => (t._1, t._2)).toSeq)
  }

  test("knnSearch distributed adjacency is result-identical to a full-collect reference walk") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.expr.FloatVec
    // the production path now gathers neighbor lists per round with a
    // pushed-down IN(beam) scan (VERDICT r14 #2); this witness re-runs
    // the same deterministic beam walk over a driver-collected adjacency
    // and demands the identical top-k — proving the distribution change
    // touched the execution shape only
    val e = graft.api.VectorIndex.index(
      Tables.embeddings(spark, sf), $"vec_id", $"embedding").cache()
    val g = graft.ops.LlmOps.knnGraphFor(spark, sf)
    val entries = (0L until 500L by 50L)
    val (probeId, k, beam, rounds) = (42L, 5, 24, 8)
    val got = graft.api.VectorIndex
      .knnSearch(e, g, probeId, k, beam, rounds, entries)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

    // reference: full adjacency on the driver, same walk
    val und = g.select($"src", $"dst").collect()
      .flatMap(r => Seq(r.getLong(0) -> r.getLong(1),
        r.getLong(1) -> r.getLong(0)))
      .groupBy(_._1).map { case (u, vs) => u -> vs.map(_._2).distinct.toSeq }
    val probe = e.filter($"vec_id" === probeId).limit(1)
      .select($"embedding".as("pe"), $"nrm".as("pn"))
    val allCos = e.crossJoin(broadcast(probe)).filter($"vec_id" =!= probeId)
      .select($"vec_id", round(FloatVec.floatDot($"embedding", $"pe") /
        ($"nrm" * $"pn"), 6).as("cos"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def top(ids: Seq[Long], n: Int): Seq[Long] =
      ids.distinct.filter(allCos.contains).sortBy(i => (-allCos(i), i)).take(n)
    var cur = top(entries.filter(_ != probeId), beam)
    for (_ <- 1 to rounds) {
      val cand = (cur ++ cur.flatMap(u => und.getOrElse(u, Seq.empty[Long])))
        .distinct.filter(_ != probeId)
      cur = top(cand, beam)
    }
    val want = top(cur, k).map(i => (i, allCos(i)))
    assert(got === want)
  }

  test("Gdpr.purgePath crash windows: store survives interruption on either side of the swap") {
    import spark.implicits._
    import graft.api.Gdpr
    import org.apache.hadoop.fs.Path
    val p = graft.Scratch.dir("spec_gdpr_crash")
    val fs = new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def write(rows: Seq[(Long, String)], where: String): Unit =
      rows.toDF("user_id", "payload").write.mode("overwrite").parquet(where)
    val full = Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d"))

    // window 1: crash AFTER the temp store is fully committed but BEFORE
    // the target delete — simulated as: complete tmp + intact target.
    // The next purge must discard the stale tmp and redo from the
    // untouched original (never double-apply or lose rows).
    write(full, s"$p/store")
    write(full.filter(_._1 != 0L), s"$p/store.purge-tmp")
    val (b1, a1) = Gdpr.purgePath(spark, s"$p/store", col("user_id") === 1L)
    assert(b1 === 4L && a1 === 3L)
    assert(spark.read.parquet(s"$p/store").select("user_id")
      .as[Long].collect().sorted.toSeq === Seq(0L, 2L, 3L))

    // window 2: crash BETWEEN the target delete and the rename —
    // simulated as: complete tmp, MISSING target. The recovery step must
    // finish the swap; the purge then applies on the recovered store.
    write(full.filter(_._1 != 3L), s"$p/store2.purge-tmp")
    assert(!fs.exists(new Path(s"$p/store2")))
    val (b2, a2) = Gdpr.purgePath(spark, s"$p/store2", col("user_id") === 2L)
    assert(b2 === 3L && a2 === 2L, "recovery must surface the committed tmp")
    assert(spark.read.parquet(s"$p/store2").select("user_id")
      .as[Long].collect().sorted.toSeq === Seq(0L, 1L))
    assert(!fs.exists(new Path(s"$p/store2.purge-tmp")))
  }

  test("graph_core_number: chained shared-adjacency peel equals fresh per-level kcore calls") {
    import spark.implicits._
    import graft.api.Ckpt._
    val got = SparkEntry.queries("graph_core_number")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the pre-r15 spelling: a fresh kcore() per level on the materialized
    // induced edge frame
    val cp = graft.ops.GraphOps.copurchase(spark, sf).select($"a", $"b").cp()
    var pairs = cp
    val want = scala.collection.mutable.Map[Long, Long]()
    cp.select($"a").unionAll(cp.select($"b")).distinct().collect()
      .foreach(r => want(r.getLong(0)) = 0L)
    for (k <- Seq(16, 48, 64, 72)) {
      val surv = graft.api.GraphAlgebra.kcore(pairs, k, rounds = 6)
        .select($"part".as("id")).cp()
      surv.collect().foreach(r => want(r.getLong(0)) = k.toLong)
      pairs = pairs
        .join(surv.select($"id".as("a")), Seq("a"), "left_semi")
        .join(surv.select($"id".as("b")), Seq("b"), "left_semi")
        .cp()
    }
    assert(got === want.toMap)
  }

  test("louvainMovesAuto: local fast path bit-equal to forced-distributed on the multi level-2 input") {
    import spark.implicits._
    import graft.api.GraphAlgebra
    import graft.api.Ckpt._
    // the exact level-2 input graph_louvain_multi builds: level-1 labels,
    // coarsened inter edges + self-loops
    val cp = graft.ops.GraphOps.copurchase(spark, sf).cp()
    val verts = Tables.part(spark, sf).select($"p_partkey".as("part"))
    val l1 = GraphAlgebra.louvainMoves(verts, cp, rounds = 3).cp()
    val (e2r, s2, v2) = GraphAlgebra.louvainCoarsen(cp, None, l1)
    val e2 = e2r.cp()
    val viaLocal = GraphAlgebra.louvainMovesAuto(v2, e2, rounds = 3,
        selfLoops = Some(s2))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaDist = GraphAlgebra.louvainMovesAuto(v2, e2, rounds = 3,
        selfLoops = Some(s2), localMax = 0L) // force the distributed sweeps
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaLocal === viaDist)
  }
}
