package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.unix_millis

/** Independent JVM cross-checks for the round-13 wave-III operators —
  * plain-Scala replays from raw collected inputs (the SURVEY.md §5
  * two-witness discipline).
  */
class Round13dSpec extends SparkSpec {

  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, sf)

  private def p4(x: Double): Double = math.floor(x * 10000.0 + 0.5) / 10000.0

  test("agg_cointegration equals a plain-Scala Engle-Granger replay") {
    import spark.implicits._
    val byDay = Tables.events(spark, sf)
      .filter($"event_type".isin("click", "purchase"))
      .select($"event_type", unix_millis($"ts"), $"value").collect()
      .map(r => ((r.getLong(1) / 86400000L, r.getString(0)),
        math.round(r.getDouble(2) * 100)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val days = byDay.keys.map(_._1).toSeq.distinct.sorted.flatMap { d =>
      for (x <- byDay.get((d, "click")); y <- byDay.get((d, "purchase")))
        yield (d, x, y)
    }
    val n = days.length.toDouble
    val sx = days.map(_._2).sum.toDouble
    val sy = days.map(_._3).sum.toDouble
    val sxx = days.map(t => BigInt(t._2) * t._2).sum.toDouble
    val sxy = days.map(t => BigInt(t._2) * t._3).sum.toDouble
    val b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val a = (sy - b * sx) / n
    val eq = days.map(t =>
      math.floor((t._3.toDouble - a - b * t._2.toDouble) * 100.0 + 0.5)
        .toLong)
    val pairs = eq.zip(eq.tail).map { case (pe, e) => (pe, e - pe) }
    val m = pairs.length.toDouble
    val s1 = pairs.map(p => BigInt(p._1) * p._1).sum.toDouble
    val s2 = pairs.map(p => BigInt(p._1) * p._2).sum.toDouble
    val s3 = pairs.map(p => BigInt(p._2) * p._2).sum.toDouble
    val rho = s2 / s1
    val t = rho / math.sqrt(((s3 - rho * s2) / (m - 1.0)) / s1)
    val row = q("agg_cointegration").collect().head
    assert(row.getLong(0) === days.length.toLong)
    assert(row.getDouble(1) === p4(b))
    assert(row.getDouble(2) === p4(a / 100.0))
    assert(row.getDouble(3) === p4(rho))
    assert(row.getDouble(4) === p4(t))
    assert(row.getBoolean(5) === (t < -3.34))
  }

  test("win_garch equals a plain-Scala truncated variance fold") {
    import spark.implicits._
    val daily = Tables.events(spark, sf)
      .select($"event_type", unix_millis($"ts"), $"value").collect()
      .map(r => ((r.getString(0), r.getLong(1) / 86400000L),
        math.round(r.getDouble(2) * 100)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val expect = daily.keys.map(_._1).toSeq.distinct.sorted.flatMap { g =>
      val series = daily.collect { case ((gg, d), c) if gg == g => (d, c) }
        .toSeq.sortBy(_._1)
      val rs = series.zip(series.tail).collect {
        case ((_, pc), (d, c)) if pc > 0 => (d, (c - pc) * 1000000L / pc)
      }
      val vbar = rs.map(r => BigInt(r._2) * r._2).sum.toDouble /
        rs.length.toDouble / 1.0e12
      rs.indices.map { i =>
        // one-step-ahead: fold the PRIOR 30 returns, never rs(i) itself
        val win = rs.slice(math.max(0, i - 30), i)
          .map(_._2.toDouble / 1.0e6)
        val s2 = win.foldLeft(vbar)((acc, x) =>
          0.05 * vbar + 0.1 * x * x + 0.85 * acc)
        (g, rs(i)._1, p4(rs(i)._2.toDouble / 1.0e6), p4(math.sqrt(s2)),
          s2 > 2.0 * vbar)
      }
    }
    val got = q("win_garch").collect().map(r => (r.getString(0),
      r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4))).toSeq
    assert(got === expect)
  }

  test("agg_chow_test equals a plain-Scala split-OLS replay") {
    import spark.implicits._
    val ys = Tables.lineitem(spark, sf)
      .select(unix_millis($"l_shipdate".cast("timestamp")),
        $"l_extendedprice", $"l_discount").collect()
      .map(r => (r.getLong(0) / 86400000L,
        math.round(r.getDouble(1) * (1 - r.getDouble(2)) * 100)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy(_._1).map(_._2)
    val n = ys.length
    val h = n / 2
    def rss(seg: Seq[(Long, Long)]): Double = {
      val sn = seg.length.toDouble
      val sx = seg.map(_._1).sum.toDouble
      val sy = seg.map(_._2).sum.toDouble
      val sxx = seg.map(t => t._1 * t._1).sum.toDouble
      val sxy = seg.map(t => BigInt(t._1) * t._2).sum.toDouble
      val syy = seg.map(t => BigInt(t._2) * t._2).sum.toDouble
      val b = (sn * sxy - sx * sy) / (sn * sxx - sx * sx)
      val a = (sy - b * sx) / sn
      (syy - a * sy - b * sxy) / 1.0e4
    }
    val xy = ys.zipWithIndex.map { case (y, i) => ((i + 1).toLong, y) }
    val (rp, r1, r2) = (rss(xy), rss(xy.take(h)), rss(xy.drop(h)))
    val f = ((rp - r1 - r2) / 2.0) / ((r1 + r2) / (n - 4.0))
    val row = q("agg_chow_test").collect().head
    assert(row.getLong(0) === n.toLong && row.getLong(1) === h.toLong)
    assert(row.getDouble(2) === p4(f))
    assert(row.getBoolean(3) === (f > 3.0))
  }

  test("graph_node2vec_walks equals a plain-Scala biased walk replay") {
    import spark.implicits._
    val lp = Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges: Set[(Long, Long)] =
      lp.toSeq.groupBy(_._1).values.flatMap { xs =>
        val ps = xs.map(_._2).distinct
        for (a <- ps; b <- ps if a != b) yield (a, b)
      }.toSet
    val adj = edges.toSeq.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val seeds = adj.view.mapValues(_.length).toSeq
      .sortBy { case (a, d) => (-d, a) }.take(4).map(_._1)
    val expect = seeds.flatMap { w =>
      var node = w; var prev = -1L
      (0 to 4).map { step =>
        if (step == 0) (w, 0L, node)
        else {
          val next = adj(node).map { b =>
            val cls =
              if (b == prev) 2
              else if (edges.contains((prev, b))) 1
              else 0
            (cls, md5hex(s"${w}_${step}_$b"), b)
          }.min
          prev = node; node = next._3
          (w, step.toLong, node)
        }
      }
    }.sortBy(t => (t._1, t._2))
    val got = q("graph_node2vec_walks").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expect)
    // the bias must actually bite: at least one step diverges from the
    // unbiased hash-greedy walk on the same seeds
    val unbiased = seeds.flatMap { w =>
      var node = w
      (1 to 4).map { step =>
        node = adj(node).map(b => (md5hex(s"${w}_${step}_$b"), b)).min._2
        (w, step.toLong, node)
      }
    }.toSet
    assert(!expect.filter(_._2 > 0).forall(unbiased.contains))
  }

  test("llm_rouge_pairs equals an exhaustive plain-Scala LCS replay") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1).trim))
    def lcs(a: Array[String], b: Array[String]): Long = {
      val prev = new Array[Int](b.length + 1)
      val cur = new Array[Int](b.length + 1)
      for (i <- a.indices) {
        for (j <- b.indices)
          cur(j + 1) =
            if (a(i) == b(j)) prev(j) + 1
            else math.max(prev(j + 1), cur(j))
        System.arraycopy(cur, 0, prev, 0, cur.length)
      }
      prev(b.length).toLong
    }
    def sig(t: String): String =
      t.split(" ").take(8).map(_.length).mkString(",")
    val expect = docs.toSeq.groupBy(d => sig(d._2)).values.flatMap { ds =>
      for {
        (ia, ta) <- ds; (ib, tb) <- ds if ia < ib
      } yield {
        val (xa, xb) = (ta.split(" ").filter(_.nonEmpty),
          tb.split(" ").filter(_.nonEmpty))
        val l = lcs(xa, xb)
        (ia, ib, l, p4(2.0 * l / (xa.length + xb.length).toDouble))
      }
    }.toSeq.sortBy { case (a, b, _, f) => (-f, a, b) }.take(20)
    val got = q("llm_rouge_pairs").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got === expect)
    assert(got.nonEmpty && got.forall(x => x._4 > 0.0 && x._4 <= 1.0))
  }
}
