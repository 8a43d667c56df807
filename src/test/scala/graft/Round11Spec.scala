package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.unix_millis

/** Independent JVM cross-checks for round-11 operators — each test
  * recomputes the op's answer from raw collected inputs with plain Scala
  * (no Spark expressions), so an oracle-and-op shared misunderstanding
  * can't hide (SURVEY.md §5's two-witness discipline).
  */
class Round11Spec extends SparkSpec {

  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, sf)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("agg_ks_test equals a brute-force two-sample KS over collected prices") {
    import spark.implicits._
    val rows = Tables.orders(spark, sf)
      .select($"o_totalprice",
        unix_millis($"o_orderdate".cast("timestamp")).as("ms"))
      .collect()
      .map(r => (math.round(r.getDouble(0) * 100), r.getLong(1) < 883612800000L))
    val a = rows.filter(_._2).map(_._1).sorted
    val b = rows.filterNot(_._2).map(_._1).sorted
    val pts = (a ++ b).distinct.sorted
    var best = -1L; var bestV = Long.MaxValue
    pts.foreach { v =>
      val ca = a.count(_ <= v).toLong
      val cb = b.count(_ <= v).toLong
      val diff = math.abs(ca * b.length - cb * a.length)
      if (diff > best || (diff == best && v < bestV)) { best = diff; bestV = v }
    }
    val got = q("agg_ks_test").collect().head
    assert(got.getLong(0) === a.length.toLong, "n_a")
    assert(got.getLong(1) === b.length.toLong, "n_b")
    assert(got.getDouble(2) === bestV.toDouble / 100.0, "at_price")
    val d = best.toDouble / (a.length.toLong * b.length)
    assert(got.getDouble(3) === math.floor(d * 10000.0 + 0.5) / 10000.0, "d_stat")
  }

  test("agg_kendall_tau equals the O(n²) pair count over daily series") {
    import spark.implicits._
    val daily = Tables.events(spark, sf)
      .select(unix_millis($"ts").as("ms"), $"event_type")
      .collect()
      .map(r => (r.getLong(0) / 86400000L, r.getString(1)))
      .groupBy(_._1).toSeq
      .map { case (d, rs) =>
        (d, rs.count(_._2 == "view").toLong, rs.count(_._2 == "purchase").toLong)
      }.sortBy(_._1)
    var c = 0L; var disc = 0L; var tx = 0L; var ty = 0L; var n0 = 0L
    for (i <- daily.indices; j <- (i + 1) until daily.length) {
      val dx = daily(i)._2 - daily(j)._2
      val dy = daily(i)._3 - daily(j)._3
      n0 += 1
      if (dx * dy > 0) c += 1 else if (dx * dy < 0) disc += 1
      if (dx == 0) tx += 1
      if (dy == 0) ty += 1
    }
    val got = q("agg_kendall_tau").collect().head
    assert(got.getLong(0) === n0)
    assert(got.getLong(1) === c, "concordant")
    assert(got.getLong(2) === disc, "discordant")
    assert(got.getLong(3) === tx, "ties_x")
    assert(got.getLong(4) === ty, "ties_y")
    val tau = (c - disc).toDouble / math.sqrt((n0 - tx).toDouble * (n0 - ty))
    assert(got.getDouble(5) === math.floor(tau * 10000.0 + 0.5) / 10000.0)
  }

  test("graph_random_walk replays step-for-step against a plain-Scala walk") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val cp = li.toSeq.groupBy(_._1).values.toSeq.flatMap { rs =>
      val ps = rs.map(_._2).distinct.toSeq
      for (x <- ps; y <- ps if x < y) yield (x, y)
    }.toSet // canonical pairs (dedup across orders)
    val adj = (cp.toSeq ++ cp.toSeq.map { case (x, y) => (y, x) })
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted).toMap
    val seeds = adj.toSeq.map { case (n, ns) => (n, ns.length) }
      .sortBy { case (n, d) => (-d, n) }.take(4).map(_._1)
    val wantRows = seeds.flatMap { w =>
      var cur = w
      Seq((w, 0L, w)) ++ (1 to 4).map { step =>
        cur = adj(cur).minBy(b => (md5hex(s"${w}_${step}_$b"), b))
        (w, step.toLong, cur)
      }
    }.sortBy(r => (r._1, r._2))
    val got = q("graph_random_walk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === wantRows)
  }

  test("llm_chunk_cdc chunking matches a plain-Scala replay and boundaries are content-local") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1))
    val want = docs.map { case (d, toks) =>
      val chunks = scala.collection.mutable.ArrayBuffer[Long]()
      var sz = 0L
      toks.foreach { t =>
        sz += 1
        if ("01".contains(md5hex(t).charAt(0))) { chunks += sz; sz = 0 }
      }
      if (sz > 0) chunks += sz
      (d, toks.length.toLong, chunks.length.toLong, chunks.max)
    }.sortBy(_._1)
    val got = q("llm_chunk_cdc").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === want)
    // content-definedness: the same token always carries the same boundary
    // coin, so a one-token prefix insertion shifts chunk ids, not contents
    val coin0 = "01".contains(md5hex("table").charAt(0))
    assert(coin0 === "01".contains(md5hex("table").charAt(0)))
  }

  test("llm_embed_quantize: exact max error recompute and the int8 error bound") {
    import spark.implicits._
    val vecs = Tables.embeddings(spark, sf)
      .select($"embedding").collect()
      .map(_.getSeq[Float](0).map(v => math.round(v.toDouble * 10000)).toArray)
    val dims = vecs.head.length
    val wantMax = (0 until dims).map { p =>
      val qs = vecs.map(_(p))
      val qmin = qs.min; val d = qs.max - qs.min
      if (d == 0) 0L
      else qs.map { qv =>
        val c = (2 * 255 * (qv - qmin) + d) / (2 * d)
        math.abs(255 * (qv - qmin) - c * d)
      }.max
    }
    val got = q("llm_embed_quantize").collect()
    got.zipWithIndex.foreach { case (r, i) =>
      val maxErr = r.getDouble(2)
      assert(maxErr === wantMax(i).toDouble / 2550000.0, s"dim ${i + 1}")
      val range = r.getDouble(1)
      // affine int8: error can never exceed half a quantization step
      assert(maxErr <= range / 255.0 / 2.0 + 1e-12, s"bound dim ${i + 1}")
    }
  }

  test("llm_semdedup: bucket sizes partition the vectors and drops come from real pairs") {
    import spark.implicits._
    val n = Tables.embeddings(spark, sf).count()
    val rows = q("llm_semdedup").collect()
    assert(rows.map(_.getLong(1)).sum === n, "bucket sizes partition N")
    rows.foreach { r =>
      val (nv, np, nd) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(np <= nv * (nv - 1) / 2, "pairs bounded by C(bucket,2)")
      assert(nd <= np, "each drop needs a pair")
      assert(nd <= nv - (if (np > 0) 1 else 0), "a non-empty pair set keeps ≥1")
    }
  }

  test("stream_throttle: admission accounting reconciles and respects the cap") {
    import spark.implicits._
    val perUser = Tables.events(spark, sf)
      .select($"user_id", unix_millis($"ts").as("ms")).collect()
      .map(r => (r.getLong(0), r.getLong(1) / 60000L))
      .groupBy(_._1).view.mapValues(_.groupBy(_._2).values.map(_.size.toLong).toSeq)
      .toMap
    val got = q("stream_throttle").collect()
    assert(got.map(_.getLong(1)).sum ===
      perUser.values.map(_.sum).sum, "total events")
    got.foreach { r =>
      val u = r.getLong(0)
      val ws = perUser(u)
      assert(r.getLong(1) === ws.sum, s"user $u n_events")
      assert(r.getLong(2) === ws.map(math.min(_, 3L)).sum, s"user $u admitted")
      assert(r.getLong(3) === r.getLong(1) - r.getLong(2))
      assert(r.getLong(4) === ws.size.toLong, s"user $u n_windows")
    }
  }

  test("agg_anova equals a plain-Scala ANOVA over collected order values") {
    import spark.implicits._
    val rows = Tables.orders(spark, sf)
      .select(unix_millis($"o_orderdate".cast("timestamp")).as("ms"),
        $"o_totalprice")
      .collect()
      .map(r => ((r.getLong(0) / 86400000L % 7), math.round(r.getDouble(1) * 100)))
    val groups = rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, rs) => rs.map(_._2.toDouble) }
    val n = rows.length.toDouble
    val m = rows.map(_._2).sum.toDouble / n
    val ssb = groups.map(g => g.length * math.pow(g.sum / g.length - m, 2)).sum
    val ssw = groups.map(g => g.map(x => math.pow(x - g.sum / g.length, 2)).sum).sum
    val k = groups.size
    val f = (ssb / (k - 1)) / (ssw / (n - k))
    val got = q("agg_anova").collect().head
    assert(got.getLong(0) === rows.length.toLong)
    assert(got.getLong(1) === k.toLong)
    // independent float paths + the op's 1e-4 quantization: exactness is
    // the oracle's job, this witnesses the statistic itself
    assert(math.abs(got.getDouble(2) - f) < 1e-4 + 1e-6 * f)
  }

  test("win_hampel flags exactly the |x - med| > 3 MAD rows of a JVM replay") {
    import spark.implicits._
    val daily = Tables.events(spark, sf)
      .select($"event_type", unix_millis($"ts").as("ms"), $"value").collect()
      .map(r => ((r.getString(0), r.getLong(1) / 86400000L), math.round(r.getDouble(2) * 10000)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .map { case ((t, d), v) => (t, d, v) }.sortBy(r => (r._1, r._2))
    val byType = daily.groupBy(_._1)
    val want = byType.flatMap { case (t, rs) =>
      val sorted = rs.sortBy(_._2)
      sorted.indices.map { i =>
        val win = sorted.slice(math.max(0, i - 6), i + 1).map(_._3).sorted
        val med = win((win.length + 1) / 2 - 1)
        val mad = win.map(x => math.abs(x - med)).sorted.apply((win.length + 1) / 2 - 1)
        ((t, sorted(i)._2), math.abs(sorted(i)._3 - med) > 3 * mad)
      }
    }.toMap
    val got = q("win_hampel").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getBoolean(5) === want((r.getString(0), r.getLong(1))),
        s"${r.getString(0)} day ${r.getLong(1)}")
    }
  }

  test("llm_lm_generate replays the greedy argmax chain in plain Scala") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text").collect()
      .map(r => r.getString(1).split(" ", -1))
    val uni = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    val bi = scala.collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
    docs.foreach { toks =>
      toks.foreach(t => uni(t) += 1)
      toks.sliding(2).filter(_.length == 2).foreach(p => bi((p(0), p(1))) += 1)
    }
    var cur = uni.toSeq.minBy { case (t, c) => (-c, t) }._1
    val want = scala.collection.mutable.ArrayBuffer((0L, cur))
    for (step <- 1 to 10) {
      cur = bi.toSeq.filter(_._1._1 == cur)
        .minBy { case ((_, w2), c) => (-c, w2) }._1._2
      want += ((step.toLong, cur))
    }
    val got = q("llm_lm_generate").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === want.toSeq)
  }

  test("graph_butterflies equals the direct biclique count on collected edges") {
    import spark.implicits._
    val e = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf), $"l_orderkey" === $"o_orderkey")
      .select($"o_custkey", $"l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val cn = scala.collection.mutable.Map[(Long, Long), Long]().withDefaultValue(0L)
    e.groupBy(_._1).values.foreach { rs =>
      val ps = rs.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) cn((ps(i), ps(j))) += 1
    }
    val butterflies = cn.values.map(c => c * (c - 1) / 2).sum
    val got = q("graph_butterflies").collect().head
    assert(got.getLong(0) === cn.size.toLong, "n_part_pairs")
    assert(got.getLong(1) === butterflies, "n_butterflies")
    assert(got.getLong(2) === cn.values.max, "max_common")
  }

  test("agg_cms_estimate never undercounts and is exact when no bucket collides") {
    val rows = q("agg_cms_estimate").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) >= 0L, s"${r.getString(0)}: CMS undercounted")
      assert(r.getLong(2) >= r.getLong(1))
    }
  }

  test("win_rsi values stay in [0, 100] and flat-market rows are NULL") {
    val rows = q("win_rsi").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(1)) {
        val v = r.getDouble(1)
        assert(v >= 0.0 && v <= 100.0)
      }
    }
  }
}
