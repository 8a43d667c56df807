package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.unix_millis

/** Independent JVM cross-checks for the round-13 wave-V operators —
  * plain-Scala replays from raw collected inputs (the SURVEY.md §5
  * two-witness discipline).
  */
class Round13fSpec extends SparkSpec {

  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, sf)

  private def p4(x: Double): Double = math.floor(x * 10000.0 + 0.5) / 10000.0

  /** (day, click cents, purchase cents) for days where both tapes print. */
  private lazy val xyDays: Seq[(Long, Long, Long)] = {
    import spark.implicits._
    val cells = Tables.events(spark, sf)
      .filter($"event_type".isin("click", "purchase"))
      .select($"event_type", unix_millis($"ts"), $"value").collect()
      .map(r => ((r.getLong(1) / 86400000L, r.getString(0)),
        math.round(r.getDouble(2) * 100)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    cells.keys.map(_._1).toSeq.distinct.sorted.flatMap { d =>
      for (x <- cells.get((d, "click")); y <- cells.get((d, "purchase")))
        yield (d, x, y)
    }
  }

  test("agg_tail_dependence equals a plain-Scala order-statistic replay") {
    val days = xyDays
    val n = days.length
    val k = (n * 5 + 99) / 100
    def topSet(f: ((Long, Long, Long)) => Long, desc: Boolean): Set[Long] =
      days.sortBy(t => (if (desc) -f(t) else f(t), t._1)).take(k)
        .map(_._1).toSet
    val ju = (topSet(_._2, desc = true) intersect
      topSet(_._3, desc = true)).size
    val jl = (topSet(_._2, desc = false) intersect
      topSet(_._3, desc = false)).size
    val row = q("agg_tail_dependence").collect().head
    assert(row.getLong(0) === n.toLong && row.getLong(1) === k.toLong)
    assert(row.getDouble(2) === p4(ju.toDouble / k))
    assert(row.getDouble(3) === p4(jl.toDouble / k))
    assert(row.getDouble(4) === p4(k.toDouble / n))
  }

  test("agg_transfer_entropy equals a plain-Scala triple-count replay") {
    val days = xyDays
    val xs = days.zip(days.tail).map { case ((_, px, _), (_, x, _)) =>
      (x - px).sign }
    val ys = days.zip(days.tail).map { case ((_, _, py), (_, _, y)) =>
      (y - py).sign }
    val triples = (1 until xs.length).map(i =>
      (ys(i), ys(i - 1), xs(i - 1), xs(i)))
    def te(ts: Seq[(Long, Long, Long)]): (Long, Long) = {
      val c3 = ts.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val c2 = ts.groupBy(t => (t._2, t._3)).view
        .mapValues(_.length.toLong).toMap
      val cy = ts.groupBy(t => (t._1, t._2)).view
        .mapValues(_.length.toLong).toMap
      val c1 = ts.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val teq = c3.map { case ((yt, y1, x1), c) =>
        c * math.floor(math.log(
          (c * c1(y1)).toDouble / (c2((y1, x1)) * cy((yt, y1))).toDouble)
          * 1.0e9 + 0.5).toLong
      }.sum
      (ts.length.toLong, teq)
    }
    val (n, teq) = te(triples.map(t => (t._1, t._2, t._3)))
    val (n2, teq2) = te(triples.map(t => (t._4, t._3, t._2)))
    val row = q("agg_transfer_entropy").collect().head
    assert(row.getLong(0) === n)
    assert(row.getDouble(1) === p4(teq.toDouble / (n * 1.0e9)))
    assert(row.getDouble(2) === p4(teq2.toDouble / (n2 * 1.0e9)))
    assert(row.getBoolean(3) === (teq - teq2 > 0))
  }

  test("agg_capm equals a plain-Scala per-type regression replay") {
    import spark.implicits._
    val daily = Tables.events(spark, sf)
      .select($"event_type", unix_millis($"ts"), $"value").collect()
      .map(r => ((r.getString(0), r.getLong(1) / 86400000L),
        math.round(r.getDouble(2) * 100)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val mktSeries = daily.toSeq.map { case ((_, d), c) => (d, c) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy(_._1)
    val rm = mktSeries.zip(mktSeries.tail).collect {
      case ((_, pm), (d, mc)) if pm > 0 => d -> (mc - pm) * 1000000L / pm
    }.toMap
    val expect = daily.keys.map(_._1).toSeq.distinct.sorted.map { g =>
      val series = daily.collect { case ((gg, d), c) if gg == g => (d, c) }
        .toSeq.sortBy(_._1)
      val pairs = series.zip(series.tail).collect {
        case ((_, pc), (d, c)) if pc > 0 && rm.contains(d) =>
          ((c - pc) * 1000000L / pc, rm(d))
      }
      val n = pairs.length.toDouble
      val si = pairs.map(_._1).sum.toDouble
      val sm = pairs.map(_._2).sum.toDouble
      val smm = pairs.map(p => BigInt(p._2) * p._2).sum.toDouble
      val sii = pairs.map(p => BigInt(p._1) * p._1).sum.toDouble
      val sim = pairs.map(p => BigInt(p._1) * p._2).sum.toDouble
      val beta = (n * sim - si * sm) / (n * smm - sm * sm)
      val alpha = (si - beta * sm) / n / 1.0e6
      val r = (n * sim - si * sm) /
        math.sqrt((n * smm - sm * sm) * (n * sii - si * si))
      (g, pairs.length.toLong, p4(beta), p4(alpha), p4(r * r))
    }
    val got = q("agg_capm").collect().map(r => (r.getString(0), r.getLong(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4))).toSeq
    assert(got === expect)
    // the market leg must explain SOMETHING somewhere
    assert(got.exists(_._5 > 0.02))
  }

  test("llm_score_auc equals a plain-Scala rank-AUC replay") {
    import spark.implicits._
    val stop = Set("the", "of", "and", "to", "in", "a", "is", "that",
      "for", "it")
    val scored = Tables.documents(spark, sf)
      .select($"lang", $"text").collect()
      .map { r =>
        val toks = r.getString(1).trim.split(" ")
        (r.getString(0) == "en",
          toks.count(stop.contains).toLong * 1000000L / toks.length)
      }
    val byQ = scored.groupBy(_._2).view.mapValues { xs =>
      (xs.length.toLong, xs.count(_._1).toLong) }.toSeq.sortBy(_._1)
    var cum = 0L; var rpos2 = 0L
    for ((_, (c, cp)) <- byQ) {
      cum += c
      rpos2 += cp * (2 * (cum - c) + c + 1)
    }
    val npos = scored.count(_._1).toLong
    val nneg = scored.length - npos
    val auc = (rpos2 - npos * (npos + 1)).toDouble / (2.0 * npos * nneg)
    val row = q("llm_score_auc").collect().head
    assert(row.getLong(0) === npos && row.getLong(1) === nneg)
    assert(row.getDouble(2) === p4(auc))
    assert(row.getDouble(3) === p4((rpos2 - npos * (npos + 1)).toDouble /
      (npos.toDouble * nneg.toDouble) - 1.0))
  }
}
