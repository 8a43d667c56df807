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
    assert(row.getDouble(4) === p4((h - k + 1.0) / (n.toDouble - k)))
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
