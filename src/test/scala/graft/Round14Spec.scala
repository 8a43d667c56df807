package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Independent JVM cross-checks for round-14 operators (the SURVEY.md §5
  * two-witness discipline, same as Round11Spec..Round13Spec).
  */
class Round14Spec extends SparkSpec {

  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, sf)

  test("sink_gdpr_purge_deep: no purged key survives in ANY artifact file; control store untouched") {
    import spark.implicits._
    val report = q("sink_gdpr_purge_deep").collect()
      .map(r => r.getString(0) ->
        (r.getBoolean(1), r.getLong(2), r.getLong(3))).toMap
    assert(report.keySet === Set("journal", "mview_user_day", "edge_state",
      "mview_hourly"))
    // the artifact tree lives under the op's memoized scratch root — walk
    // EVERY store and prove the cohort is gone from each file tree
    // only THIS dataset's artifact dir (scratch persists across JVMs and
    // names are digest-keyed per dataset path)
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(sf.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val dirs = Seq(java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft-scratch",
      s"sink_gdpr_purge_deep_$digest").toString)
    assert(new java.io.File(dirs.head).isDirectory,
      "purge_deep artifact root not found")
    for (d <- dirs;
         store <- Seq("journal", "mview_user_day", "edge_state")) {
      val df = spark.read.parquet(s"$d/$store")
      assert(df.filter($"user_id" % 97 === 0).count() === 0L,
        s"purged keys survive in $store")
      assert(df.count() === report(store)._3, s"$store count vs report")
    }
    // the user-less control store keeps every row (hadKey = false path)
    for (d <- dirs) {
      assert(spark.read.parquet(s"$d/mview_hourly").count() ===
        report("mview_hourly")._2)
      assert(!report("mview_hourly")._1)
    }
    // report internal consistency: purged rows only from user-keyed stores
    assert(report("journal")._2 > report("journal")._3,
      "fixture has no purge cohort — user_id % 97 never 0?")
  }

  /** Per-type daily micro-return series replayed in plain Scala (the
    * win_garch replay's front half).
    */
  private def replayReturns(): Map[String, Seq[Long]] = {
    import org.apache.spark.sql.functions.unix_millis
    import spark.implicits._
    Tables.events(spark, sf)
      .select($"event_type", unix_millis($"ts"), $"value").collect()
      .map(r => ((r.getString(0), r.getLong(1) / 86400000L),
        math.round(r.getDouble(2) * 100)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      .groupBy(_._1._1).map { case (g, m) =>
        val series = m.toSeq.map { case ((_, d), c) => (d, c) }.sortBy(_._1)
        g -> series.zip(series.tail).collect {
          case ((_, pc), (_, c)) if pc > 0 =>
            // BigInt floor-division replay of Spark/DuckDB integer div
            val num = BigInt(c - pc) * 1000000
            (num / BigInt(pc)).toLong
        }
      }
  }

  private def p4(x: Double): Double = math.floor(x * 10000.0 + 0.5) / 10000.0

  /** Sample ACF at lag k with the op's exact-moment single-mean formula. */
  private def acf(rs: Seq[Long], k: Int): Double = {
    val n = rs.length
    val rbar = rs.map(BigInt(_)).sum.toDouble / n
    val den = rs.map(r => BigInt(r) * r).sum.toDouble - n * rbar * rbar
    val pairs = rs.dropRight(k).zip(rs.drop(k))
    (pairs.map { case (a, b) => BigInt(a) * b }.sum.toDouble -
      rbar * (pairs.map(_._1.toDouble).sum + pairs.map(_._2.toDouble).sum) +
      (n - k).toDouble * rbar * rbar) / den
  }

  test("agg_ljung_box equals a plain-Scala exact-moment ACF replay") {
    val rets = replayReturns()
    val got = q("agg_ljung_box").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet === rets.keySet)
    for ((g, rs) <- rets) {
      val n = rs.length
      val rhos = (1 to 5).map(k => acf(rs, k))
      val lb = rhos.zipWithIndex
        .map { case (rho, i) => rho * rho / (n - (i + 1)).toDouble }
        .sum * n * (n + 2.0)
      val row = got(g)
      assert(row.getLong(1) === n.toLong)
      assert(row.getDouble(2) === p4(rhos(0)), s"$g rho1")
      assert(row.getDouble(3) === p4(rhos(1)), s"$g rho2")
      assert(row.getDouble(4) === p4(rhos(4)), s"$g rho5")
      assert(math.abs(row.getDouble(5) - p4(lb)) < 2e-4, s"$g lb")
      assert(row.getBoolean(6) === (lb > 11.0705), s"$g flag")
    }
  }

  test("agg_yule_walker: AR(2) coefficients solve from the replayed ACF") {
    val rets = replayReturns()
    val got = q("agg_yule_walker").collect()
      .map(r => r.getString(0) -> r).toMap
    for ((g, rs) <- rets) {
      val (r1, r2) = (acf(rs, 1), acf(rs, 2))
      val phi1 = r1 * (1.0 - r2) / (1.0 - r1 * r1)
      val phi2 = (r2 - r1 * r1) / (1.0 - r1 * r1)
      val row = got(g)
      assert(row.getDouble(4) === p4(phi1), s"$g phi1")
      assert(row.getDouble(5) === p4(phi2), s"$g phi2")
      assert(math.abs(row.getDouble(6) -
        p4(1.0 - phi1 * r1 - phi2 * r2)) < 2e-4, s"$g innov")
    }
  }

  test("agg_durbin_watson equals a plain-Scala OLS-residual replay") {
    import org.apache.spark.sql.functions.unix_millis
    import spark.implicits._
    val ys = Tables.lineitem(spark, sf)
      .select(unix_millis($"l_shipdate".cast("timestamp")),
        $"l_extendedprice", $"l_discount").collect()
      .map(r => (r.getLong(0) / 86400000L,
        math.round(r.getDouble(1) * (1 - r.getDouble(2)) * 100)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy(_._1).map(_._2)
    val n = ys.length
    val xs = (1 to n).map(_.toLong)
    val (sx, sy) = (xs.sum, ys.map(BigInt(_)).sum)
    val sxx = xs.map(x => x * x).sum
    val sxy = xs.zip(ys).map { case (x, y) => BigInt(x) * y }.sum
    val b = (n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
      (n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble)
    val a = (sy.toDouble - b * sx.toDouble) / n.toDouble
    val es = xs.zip(ys).map { case (x, y) =>
      math.floor(y.toDouble - (a + b * x.toDouble) + 0.5).toLong }
    val see = es.map(e => BigInt(e) * e).sum.toDouble
    val sdd = es.zip(es.tail)
      .map { case (p, e) => BigInt(e - p) * (e - p) }.sum.toDouble
    val row = q("agg_durbin_watson").collect().head
    assert(row.getLong(0) === n.toLong)
    assert(row.getDouble(1) === p4(sdd / see))
    assert(row.getDouble(2) === p4(1.0 - sdd / see / 2.0))
    // DW lives in [0, 4]; positive-autocorrelation data sits below 2
    assert(row.getDouble(1) > 0.0 && row.getDouble(1) < 4.0)
  }

  test("agg_atkinson: index in [0,1), zero only under perfect equality") {
    val rows = q("agg_atkinson").collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val a = r.getDouble(3)
      assert(a >= 0.0 && a < 1.0, s"${r.getString(0)} atkinson $a")
      assert(r.getLong(1) > 0 && r.getDouble(2) > 0)
    }
  }

  test("louvainMovesLocal is bit-equal to the distributed louvainMoves") {
    import spark.implicits._
    import graft.api.GraphAlgebra
    // the real coarse graph from the dendro's own level-1 labels — the
    // exact input shape the local path serves (incl. self-loops)
    val cp = graft.ops.GraphOps.copurchase(spark, sf)
    val verts = Tables.part(spark, sf).select($"p_partkey".as("part"))
    val l1 = GraphAlgebra.louvainMoves(verts, cp, rounds = 3)
    val (e2, s2, v2) = GraphAlgebra.louvainCoarsen(cp, None, l1)
    val dist = GraphAlgebra.louvainMoves(v2, e2, rounds = 3,
        selfLoops = Some(s2))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val es = e2.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2))).toSeq
    val sl = s2.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val vs = v2.collect().map(_.getLong(0)).toSeq
    val local = GraphAlgebra.louvainMovesLocal(vs, es, sl, rounds = 3)
    assert(local === dist)
  }

  test("graph_mis: independence, maximality over the decided region, deterministic") {
    import spark.implicits._
    val status = q("graph_mis").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val mis = status.collect { case (v, "mis") => v }.toSet
    val undecided = status.collect { case (v, "undecided") => v }.toSet
    val edges = graft.ops.GraphOps.copurchase(spark, sf)
      .filter($"w" >= 2).select($"a", $"b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // INDEPENDENCE: no edge joins two MIS vertices
    assert(!edges.exists(e => mis(e._1) && mis(e._2)),
      "two adjacent vertices both in the MIS")
    // MAXIMALITY over the decided region: every dominated vertex has an
    // MIS neighbor (that is what dominated MEANS under the protocol)
    val nbrs = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    status.collect { case (v, "dominated") => v }.foreach { v =>
      assert(nbrs.getOrElse(v, Set.empty).exists(mis),
        s"dominated vertex $v has no MIS neighbor")
    }
    // the 4 declared rounds decide the overwhelming mass on this graph
    assert(undecided.size * 20 <= status.size,
      s"${undecided.size} of ${status.size} undecided after 4 Luby rounds")
    // vertices untouched by any w>=2 edge are isolated -> always MIS
    val touched = edges.flatMap(e => Seq(e._1, e._2)).toSet
    status.collect { case (v, st) if !touched(v) => st }
      .foreach(st => assert(st === "mis"))
  }

  test("round-14 ops: condition-less joins bounded, windows bounded or on the day spine") {
    import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, Join, Window => LWindow}
    // agg_durbin_watson / agg_granger / agg_page_hinkley ride the
    // documented day-spine exception (global window over a bounded-by-
    // construction calendar spine, the agg_chow_test posture)
    val keys = Seq("agg_ljung_box", "agg_engle_arch", "agg_yule_walker",
      "agg_atkinson", "graph_match_var", "graph_louvain_dendro",
      "stream_minhash_idx", "sink_gdpr_purge_deep", "llm_ann_knngraph",
      "agg_cochran_q", "agg_poisson_rate", "win_aroon",
      "graph_global_efficiency", "graph_percolation",
      "agg_mcnemar", "llm_gopher_rules", "graph_mis")
    for (k <- keys) {
      val plan = SparkEntry.queries(k)(spark, sf).queryExecution.optimizedPlan
      plan.collect { case j: Join if j.condition.isEmpty => j }.foreach { j =>
        val bounded = Seq(j.left, j.right).exists(_.maxRows.exists(_ <= 8L))
        assert(bounded, s"$k plans a condition-less join with no " +
          s"provably-bounded side:\n$j")
      }
      val unboundedW = plan.collect {
        case w: LWindow if w.partitionSpec.isEmpty &&
          w.collect { case g: GlobalLimit => g }.isEmpty => w
      }
      assert(unboundedW.isEmpty,
        s"$k plans ${unboundedW.size} unpartitioned Window node(s) over " +
          "an unlimited frame")
    }
  }

  test("Gdpr.purgeArtifacts generalizes to ANY keyed store (doc-keyed signature copy)") {
    import spark.implicits._
    import graft.api.{Gdpr, TextPipeline}
    // copy the minhash signature frame into a private scratch store and
    // purge it by doc_id — the derived-index case the journal purge misses
    val sig = TextPipeline.minhashSignatures(
      Tables.documents(spark, sf), $"doc_id", $"text")
    val p = graft.Scratch.dir("spec_gdpr_sig_copy")
    sig.write.mode("overwrite").parquet(s"$p/sig")
    // a second, key-less store must be reported but never rewritten
    sig.groupBy($"n").count().write.mode("overwrite").parquet(s"$p/hist")
    val before = spark.read.parquet(s"$p/hist").collect()
      .map(_.toString).sorted.toSeq
    val res = Gdpr.purgeArtifacts(spark, Seq(s"$p/sig", s"$p/hist"),
      "doc_id", k => k % 5 === 0)
    val bySuffix = res.map(r => r.path.split('/').last -> r).toMap
    assert(bySuffix("sig").hadKey && !bySuffix("hist").hadKey)
    val after = spark.read.parquet(s"$p/sig")
    assert(after.filter($"doc_id" % 5 === 0).count() === 0L)
    assert(after.count() === bySuffix("sig").nAfter)
    assert(bySuffix("sig").nBefore === sig.count())
    // untouched store is bit-identical
    assert(spark.read.parquet(s"$p/hist").collect()
      .map(_.toString).sorted.toSeq === before)
  }
}
