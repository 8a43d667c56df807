package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.unix_millis

/** Independent JVM cross-checks for the round-13 wave-I statistics
  * operators — plain-Scala replays from raw collected inputs (the
  * SURVEY.md §5 two-witness discipline, same as Round11/12/13Spec).
  */
class Round13bSpec extends SparkSpec {

  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, sf)

  private def p4(x: Double): Double = math.floor(x * 10000.0 + 0.5) / 10000.0

  /** (event_type, quantized value) rows, the shared input of the two
    * rank-based tests.
    */
  private lazy val gq: Array[(String, Long)] = {
    import spark.implicits._
    Tables.events(spark, sf)
      .select($"event_type", $"value").collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 10000)))
  }

  test("agg_kruskal_wallis equals a plain-Scala rank computation") {
    // average ranks with ties over the pooled sample
    val byQ = gq.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val qsSorted = byQ.keys.toSeq.sorted
    var cum = 0L
    val r2 = qsSorted.map { v =>
      cum += byQ(v); v -> (2 * (cum - byQ(v)) + byQ(v) + 1)
    }.toMap
    val n = gq.length.toLong
    val perG = gq.groupBy(_._1).view.mapValues { xs =>
      (xs.length.toLong, xs.map(x => r2(x._2)).sum)
    }.toMap
    val k = perG.size
    val rsum = perG.keys.toSeq.sorted
      .foldLeft(0.0) { (acc, g) =>
        val (ng, r2g) = perG(g)
        acc + r2g.toDouble * r2g.toDouble / (4.0 * ng.toDouble)
      }
    val h = 12.0 / (n.toDouble * (n.toDouble + 1.0)) * rsum -
      3.0 * (n.toDouble + 1.0)
    val tiesum = byQ.values.map(c => c * c * c - c).sum
    val cadj = 1.0 - tiesum.toDouble /
      (n.toDouble * n.toDouble * n.toDouble - n.toDouble)
    val row = q("agg_kruskal_wallis").collect().head
    assert(row.getLong(0) === n && row.getLong(1) === k.toLong)
    assert(row.getDouble(2) === p4(h))
    assert(row.getDouble(3) === p4(h / cadj))
    // eta^2_H = (H-k+1)/(n-k); epsilon^2 = H*(n+1)/(n^2-1)
    assert(row.getDouble(4) === p4((h - k + 1.0) / (n.toDouble - k)))
    assert(row.getDouble(5) === p4(
      h * (n.toDouble + 1.0) / (n.toDouble * n.toDouble - 1.0)))
    // with 5 groups on real data H must be a positive finite statistic
    assert(row.getDouble(2) > 0.0)
  }

  test("agg_levene equals a plain-Scala Brown-Forsythe computation") {
    val groups = gq.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    // lower weighted median: smallest q with 2*cum >= ng
    val med = groups.map { case (g, vs) =>
      g -> vs((vs.length - 1) / 2)
    }
    val z = gq.map { case (g, v) => (g, math.abs(v - med(g))) }
    val n = z.length.toLong
    val s = z.map(_._2).sum
    val m = s.toDouble / n.toDouble
    val perG = z.groupBy(_._1).view.mapValues { xs =>
      val ng = xs.length.toLong
      val sz = xs.map(_._2).sum
      val szz = xs.map(x => BigInt(x._2) * x._2).sum
      (ng, sz, szz)
    }.toMap
    val k = perG.size
    var ssb = 0.0; var ssw = 0.0
    for (g <- perG.keys.toSeq.sorted) {
      val (ng, sz, szz) = perG(g)
      val mg = sz.toDouble / ng.toDouble
      ssb += ng.toDouble * (mg - m) * (mg - m)
      ssw += szz.toDouble - sz.toDouble * sz.toDouble / ng.toDouble
    }
    val f = (ssb / (k - 1).toDouble) / (ssw / (n - k).toDouble)
    val row = q("agg_levene").collect().head
    assert(row.getLong(0) === n && row.getLong(1) === k.toLong)
    assert(row.getDouble(2) === p4(f))
  }

  test("agg_jarque_bera equals a plain-Scala moment computation") {
    import spark.implicits._
    val daily = Tables.events(spark, sf)
      .select($"event_type", unix_millis($"ts"), $"value").collect()
      .map(r => ((r.getString(0), r.getLong(1) / 86400000L),
        math.round(r.getDouble(2) * 100)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val expect = daily.keys.map(_._1).toSeq.distinct.sorted.map { g =>
      val series = daily.collect { case ((gg, d), c) if gg == g => (d, c) }
        .toSeq.sortBy(_._1).map(_._2)
      val rs = series.zip(series.tail).collect {
        case (pc, c) if pc > 0 => (c - pc) * 1000000L / pc
      }
      val n = rs.length.toDouble
      val m = rs.sum.toDouble / n
      def e(p: Int): Double = rs.map(r => BigInt(r).pow(p)).sum.toDouble / n
      val (e2, e3, e4) = (e(2), e(3), e(4))
      val m2 = e2 - m * m
      val m3 = e3 - 3.0 * m * e2 + 2.0 * m * m * m
      val m4 = e4 - 4.0 * m * e3 + 6.0 * m * m * e2 - 3.0 * m * m * m * m
      val g1 = m3 / (m2 * math.sqrt(m2))
      val g2 = m4 / (m2 * m2) - 3.0
      val jb = n / 6.0 * (g1 * g1 + g2 * g2 / 4.0)
      (g, rs.length.toLong, p4(g1), p4(g2), p4(jb), jb < 5.991)
    }
    val got = q("agg_jarque_bera").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getBoolean(5))).toSeq
    assert(got === expect)
  }

  test("win_obv equals a plain-Scala signed-volume walk") {
    import spark.implicits._
    val daily = Tables.events(spark, sf)
      .select($"event_type", unix_millis($"ts"), $"value").collect()
      .map(r => ((r.getString(0), r.getLong(1) / 86400000L),
        (math.round(r.getDouble(2) * 100), 1L)))
      .groupBy(_._1).view.mapValues(xs =>
        (xs.map(_._2._1).sum, xs.map(_._2._2).sum)).toMap
    val expect = daily.keys.map(_._1).toSeq.distinct.sorted.flatMap { g =>
      val series = daily.collect { case ((gg, d), rc) if gg == g => (d, rc) }
        .toSeq.sortBy(_._1)
      var obv = 0L; var prev = Option.empty[Long]
      series.map { case (d, (rev, vol)) =>
        val sv = prev match {
          case Some(p) if rev > p => vol
          case Some(p) if rev < p => -vol
          case _                  => 0L
        }
        obv += sv; prev = Some(rev)
        (g, d, rev.toDouble / 100.0, vol, obv)
      }
    }
    val got = q("win_obv").collect().map(r => (r.getString(0), r.getLong(1),
      r.getDouble(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got === expect)
  }

  test("win_ichimoku cloud verdicts are exact-integer and shift 26 days") {
    import spark.implicits._
    val daily = Tables.orders(spark, sf)
      .select(unix_millis($"o_orderdate".cast("timestamp")), $"o_totalprice")
      .collect()
      .map(r => (r.getLong(0) / 86400000L, math.round(r.getDouble(1) * 100)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    val ps = daily.map(_._2)
    def mid2(i: Int, nd: Int): Long = {
      val w = ps.slice(math.max(0, i - nd + 1), i + 1)
      w.max + w.min
    }
    val expect = daily.indices.drop(26).map { i =>
      val (d, p) = daily(i)
      val spanA4 = mid2(i - 26, 9) + mid2(i - 26, 26)
      val spanB2 = mid2(i - 26, 52)
      (d, 4 * p > math.max(spanA4, 2 * spanB2), p > daily(i - 26)._2)
    }
    val got = q("win_ichimoku").collect()
      .map(r => (r.getLong(0), r.getBoolean(6), r.getBoolean(7))).toSeq
    assert(got === expect)
    // the cloud splits the series: some days above, some not
    assert(got.exists(_._2) && got.exists(!_._2))
  }

  test("win_keltner bands contain most closes and EMA matches a Scala fold") {
    val rows = q("win_keltner").collect()
    assert(rows.nonEmpty)
    // band sandwich: lower < ema < upper everywhere (atr > 0 on real data)
    assert(rows.forall(r => r.getDouble(5) < r.getDouble(2) &&
      r.getDouble(2) < r.getDouble(4)))
    // break flags agree with the band columns they were derived from
    assert(rows.forall(r => r.getBoolean(6) === (r.getDouble(1) > r.getDouble(4))
      && r.getBoolean(7) === (r.getDouble(1) < r.getDouble(5))))
    // EMA replay on the last row: fold the last 20 closes, rebuilt from
    // the raw tape (the output column is already /100-divided — rebuilding
    // cents from it would round twice)
    import spark.implicits._
    val closes = Tables.events(spark, sf)
      .select(unix_millis($"ts"), $"event_id", $"value").collect()
      .map(r => (r.getLong(0) / 86400000L,
        (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 100))))
      .groupBy(_._1).view.mapValues(_.map(_._2).max._3)
      .toSeq.sortBy(_._1).map(_._2.toDouble)
    val tail20 = closes.takeRight(20)
    val ema = tail20.tail.foldLeft(tail20.head)((acc, x) =>
      acc * 19.0 / 21.0 + x * 2.0 / 21.0)
    assert(rows.last.getDouble(2) === ema / 100.0)
  }

  test("graph_katz equals a plain-Scala attenuated walk count") {
    import spark.implicits._
    val lp = Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val undirected: Set[(Long, Long)] =
      lp.toSeq.groupBy(_._1).values.flatMap { xs =>
        val ps = xs.map(_._2).distinct
        for (a <- ps; b <- ps if a != b) yield (a, b)
      }.toSet
    val adj = undirected.toSeq.groupBy(_._1).view
      .mapValues(_.map(_._2)).toMap
    var p: Map[Long, Long] = adj.keys.map(_ -> 1L).toMap
    var acc: Map[Long, Long] = adj.keys.map(_ -> 256L).toMap
    for (wk <- Seq(64L, 16L, 4L, 1L)) {
      p = adj.map { case (i, ns) => i -> ns.map(p).sum }
      acc = acc.map { case (i, a) => i -> (a + wk * p(i)) }
    }
    val expect = acc.toSeq.sortBy { case (id, a) => (-a, id) }.take(20)
    val got = q("graph_katz").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === expect.map { case (id, a) => (id, a) })
  }

  test("graph_overlap equals a plain-Scala pair computation") {
    import spark.implicits._
    val edges = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_custkey", $"l_partkey").count()
      .select($"o_custkey", $"l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val deg = edges.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pairs = edges.toSeq.groupBy(_._1).values.flatMap { xs =>
      val ps = xs.map(_._2)
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.toSeq.groupBy(identity).view.mapValues(_.length.toLong).toSeq
    val expect = pairs.collect { case ((a, b), c) if c >= 3 =>
      val ov = p4(c.toDouble / math.min(deg(a), deg(b)).toDouble)
      val cos = p4(c.toDouble / math.sqrt(deg(a).toDouble * deg(b).toDouble))
      (a, b, c, ov, cos)
    }.sortBy { case (a, b, _, ov, cos) => (-ov, -cos, a, b) }.take(20)
    val got = q("graph_overlap").collect().map(r => (r.getLong(0),
      r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toSeq
    assert(got === expect)
  }

  test("llm_kneser_ney equals a plain-Scala KN computation") {
    import spark.implicits._
    val bi = Tables.documents(spark, sf).select($"text").collect()
      .map(_.getString(0).trim.split(" ").toSeq)
      .filter(_.length >= 2)
      .flatMap(ts => ts.zip(ts.tail))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val ctx = bi.groupBy(_._1._1).view
      .mapValues(m => (m.values.sum, m.size.toLong)).toMap
    val cont = bi.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
    val nt = bi.size.toLong
    val expect = bi.toSeq.map { case ((w1, w2), cb) =>
      val (cw1, n1p) = ctx(w1)
      val p = p4((((4 * cb - 3) * nt + 3 * n1p * cont(w2)).toDouble) /
        ((4 * cw1 * nt).toDouble))
      (w1, w2, cb, p)
    }.sortBy { case (w1, w2, _, p) => (-p, w1, w2) }.take(20)
    val got = q("llm_kneser_ney").collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got === expect)
    // probabilities are probabilities
    assert(got.forall(x => x._4 > 0.0 && x._4 <= 1.0))
  }

  test("llm_pii_scrub equals a plain-Scala regex replay and finds ids") {
    import spark.implicits._
    val amount = "[0-9]+\\.[0-9][0-9]"
    val custid = "Customer#[0-9]+"
    val digits = "[0-9]{3,}"
    val nat = Tables.nation(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val rows = Tables.customer(spark, sf)
      .select($"c_nationkey", $"c_name", $"c_acctbal".cast("string"),
        $"c_mktsegment").collect()
      .map { r =>
        val blob = Seq(r.getString(1), r.getString(2), r.getString(3))
          .mkString(" ")
        val r1 = blob.replaceAll(amount, "[AMOUNT]")
        val r2 = r1.replaceAll(custid, "[ID]")
        val r3 = r2.replaceAll(digits, "[NUM]")
        (nat(r.getInt(0)),
          (1L, amount.r.findAllIn(blob).length.toLong,
            custid.r.findAllIn(r1).length.toLong,
            digits.r.findAllIn(r2).length.toLong,
            blob.length.toLong, (blob.length - r3.length).toLong))
      }
    val expect = rows.groupBy(_._1).view.mapValues { xs =>
      val vs = xs.map(_._2)
      (vs.map(_._1).sum, vs.map(_._2).sum, vs.map(_._3).sum,
        vs.map(_._4).sum, vs.map(_._6).sum,
        p4(vs.map(_._6).sum.toDouble / vs.map(_._5).sum.toDouble))
    }.toSeq.sortBy(_._1)
    val got = q("llm_pii_scrub").collect().map(r => (r.getString(0),
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getDouble(6)))).toSeq
    assert(got === expect)
    // the scrub actually fires: every customer row has an amount + an id
    assert(got.map(_._2._2).sum > 0 && got.map(_._2._3).sum > 0)
  }

  test("llm_embed_pca equals a plain-Scala exact power iteration") {
    import spark.implicits._
    // half-AWAY-from-zero like Spark/DuckDB round() (math.round is half-up
    // and would disagree on negative exact halves)
    def rz(x: Double): Long =
      if (x < 0) -math.round(-x) else math.round(x)
    val vecs = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").collect()
      .map(_.getSeq[Float](1).toArray.map(v => rz(v.toDouble * 1000000)))
    val d = vecs.head.length
    val n = vecs.length.toLong
    val s = Array.tabulate(d)(j => vecs.map(_(j)).sum)
    val c = Array.tabulate(d, d) { (j, k) =>
      val sjk = vecs.map(v => BigInt(v(j)) * v(k)).sum
      ((BigInt(n) * sjk - BigInt(s(j)) * s(k)) / BigInt(1000000000)).toLong
    }
    var x = Array.fill(d)(1000000L)
    for (_ <- 1 to 3) {
      val w = Array.tabulate(d)(j => (0 until d).map(k => c(j)(k) * x(k)).sum)
      val qd = math.max(1L, w.map(math.abs).max / 1000000L)
      x = w.map(_ / qd)
    }
    val num = (for (j <- 0 until d; k <- 0 until d)
      yield BigInt(x(j)) * x(k) * c(j)(k)).sum
    val den = x.map(v => v * v).sum
    val tr = (0 until d).map(j => c(j)(j)).sum
    val ev = p4(num.toDouble / den.toDouble / tr.toDouble)
    val got = q("llm_embed_pca").collect()
    assert(got.map(_.getLong(0)).toSeq === (0 until d).map(_.toLong))
    assert(got.map(_.getLong(1)).toSeq === x.toSeq)
    assert(got.forall(_.getDouble(2) === ev))
    assert(ev > 0.0 && ev <= 1.0)
  }

  test("agg_newey_west equals a plain-Scala HAC computation") {
    import spark.implicits._
    val days = Tables.lineitem(spark, sf)
      .select(unix_millis($"l_shipdate".cast("timestamp")),
        $"l_extendedprice", $"l_discount").collect()
      .map(r => (r.getLong(0) / 86400000L,
        math.round(r.getDouble(1) * (1 - r.getDouble(2)) * 100)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val n = days.size.toDouble
    val m = days.values.sum.toDouble / n
    val gammas = (0L to 5L).map { l =>
      val pairs = days.collect {
        case (d, x) if days.contains(d + l) => (x, days(d + l))
      }.toSeq
      val sxy = pairs.map { case (a, b) => BigInt(a) * b }.sum
      val sl = pairs.map(_._1).sum
      val sr = pairs.map(_._2).sum
      (sxy.toDouble - m * (sl + sr).toDouble +
        pairs.length.toDouble * m * m) / (n * 1.0e4)
    }
    val lrv = gammas.zipWithIndex.foldLeft(0.0) { case (acc, (g, l)) =>
      acc + (if (l == 0) g else 2.0 * (1.0 - l / 6.0) * g)
    }
    val row = q("agg_newey_west").collect().head
    assert(row.getLong(0) === days.size.toLong)
    assert(row.getDouble(1) === p4(gammas.head))
    assert(row.getDouble(2) === p4(lrv))
    assert(row.getDouble(3) === p4(lrv / gammas.head))
    assert(row.getDouble(4) === p4(math.sqrt(math.abs(lrv) / n)))
  }
}
