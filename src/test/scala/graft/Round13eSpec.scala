package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.unix_millis

/** Independent JVM cross-checks for the round-13 wave-IV operators —
  * plain-Scala replays from raw collected inputs (the SURVEY.md §5
  * two-witness discipline).
  */
class Round13eSpec extends SparkSpec {

  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, sf)

  private def p4(x: Double): Double = math.floor(x * 10000.0 + 0.5) / 10000.0

  private lazy val dailyRevVol: Seq[(Long, Long, Long)] = {
    import spark.implicits._
    Tables.events(spark, sf)
      .select(unix_millis($"ts"), $"value").collect()
      .map(r => (r.getLong(0) / 86400000L, math.round(r.getDouble(1) * 100)))
      .groupBy(_._1).view
      .mapValues(xs => (xs.map(_._2).sum, xs.length.toLong)).toSeq
      .map { case (d, (rev, vol)) => (d, rev, vol) }.sortBy(_._1)
  }

  test("agg_spearman equals a plain-Scala doubled-rank replay") {
    val days = dailyRevVol
    def ranks2(vs: Seq[Long]): Map[Long, Long] = {
      val sorted = vs.sorted
      vs.distinct.map { v =>
        val lo = sorted.indexOf(v) + 1 // min rank of the tie block
        val t = sorted.count(_ == v)
        v -> (2L * lo + t - 1)
      }.toMap
    }
    val ra = ranks2(days.map(_._2)); val rb = ranks2(days.map(_._3))
    val xs = days.map(d => ra(d._2)); val ys = days.map(d => rb(d._3))
    val n = days.length.toDouble
    def corr(xs: Seq[Long], ys: Seq[Long], exact: Boolean): Double = {
      val sx = xs.sum.toDouble; val sy = ys.sum.toDouble
      val sxx = xs.map(x => BigInt(x) * x).sum.toDouble
      val syy = ys.map(y => BigInt(y) * y).sum.toDouble
      val sxy = xs.zip(ys).map { case (x, y) => BigInt(x) * y }.sum.toDouble
      (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    }
    val row = q("agg_spearman").collect().head
    assert(row.getLong(0) === days.length.toLong)
    assert(row.getDouble(1) === p4(corr(xs, ys, exact = true)))
    assert(row.getDouble(2) ===
      p4(corr(days.map(_._2), days.map(_._3), exact = false)))
    // revenue and volume must co-move on real data
    assert(row.getDouble(1) > 0.3)
  }

  test("agg_friedman equals a plain-Scala within-day rank replay") {
    import spark.implicits._
    val cells = Tables.events(spark, sf)
      .select($"event_type", unix_millis($"ts"), $"value").collect()
      .map(r => ((r.getLong(1) / 86400000L, r.getString(0)),
        math.round(r.getDouble(2) * 100)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val k = 5
    val byDay = cells.toSeq.map { case ((d, g), v) => (d, g, v) }
      .groupBy(_._1).filter(_._2.size == k)
    val n = byDay.size.toLong
    var tsum = 0L
    val r2ByG = scala.collection.mutable.Map.empty[String, Long]
    for ((_, rows) <- byDay) {
      val vs = rows.map(_._3).sorted
      for ((_, g, v) <- rows) {
        val lo = vs.indexOf(v) + 1
        val t = vs.count(_ == v)
        r2ByG(g) = r2ByG.getOrElse(g, 0L) + (2L * lo + t - 1)
      }
      tsum += vs.distinct.map(v => { val t = vs.count(_ == v).toLong
        t * t * t - t }).sum
    }
    val r2tot = r2ByG.values.sum
    val s4k2 = r2ByG.values.map(r => {
      val z = k * r - r2tot; BigInt(z) * z }).sum.toLong
    val sexact = s4k2.toDouble / (4.0 * k * k)
    val den = (n * n * k * (k * k - 1) - n * tsum).toDouble
    val w = 12.0 * sexact / den
    val chi2 = n.toDouble * (k - 1).toDouble * w
    val row = q("agg_friedman").collect().head
    assert(row.getLong(0) === n && row.getLong(1) === k.toLong)
    assert(row.getDouble(2) === p4(w))
    assert(row.getDouble(3) === p4(chi2))
    assert(row.getBoolean(4) === (chi2 > 9.488))
  }

  test("win_adx equals a plain-Scala directional-movement replay") {
    import spark.implicits._
    val daily = Tables.events(spark, sf)
      .select(unix_millis($"ts"), $"event_id", $"value").collect()
      .map(r => (r.getLong(0) / 86400000L,
        (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 100))))
      .groupBy(_._1).view.mapValues { xs =>
        val vs = xs.map(_._2)
        (vs.map(_._3).min, vs.map(_._3).max, vs.max._3)
      }.toSeq.sortBy(_._1)
    val dm = daily.zip(daily.tail).map {
      case ((_, (pl, ph, pc)), (d, (lo, hi, _))) =>
        val up = math.max(hi - ph, 0L); val dn = math.max(pl - lo, 0L)
        (d, if (up > dn) up else 0L, if (dn > up) dn else 0L,
          Seq(hi - lo, math.abs(hi - pc), math.abs(lo - pc)).max)
    }
    val rows = dm.indices.flatMap { i =>
      val w = dm.slice(math.max(0, i - 13), i + 1)
      val sp = w.map(_._2).sum; val sm = w.map(_._3).sum
      val st = w.map(_._4).sum
      if (st > 0 && sp + sm > 0)
        Some((dm(i)._1, sp, sm, st,
          math.abs(sp - sm) * 100000000L / (sp + sm)))
      else None
    }
    val expect = rows.indices.map { i =>
      val w = rows.slice(math.max(0, i - 13), i + 1)
      val adxq = w.map(_._5).sum.toDouble / w.length.toDouble
      val (d, sp, sm, st, dxq) = rows(i)
      (d, p4(100.0 * sp / st), p4(100.0 * sm / st),
        p4(dxq.toDouble / 1.0e6), p4(adxq / 1.0e6))
    }
    val got = q("win_adx").collect().map(r => (r.getLong(0), r.getDouble(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4))).toSeq
    assert(got === expect)
  }

  test("llm_mmr_select equals a plain-Scala greedy MMR replay") {
    import spark.implicits._
    def rz(x: Double): Long =
      if (x < 0) -math.round(-x) else math.round(x)
    val vecs = Tables.embeddings(spark, sf)
      .select($"vec_id", $"label", $"embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).toArray.map(v => rz(v.toDouble * 1000000))))
    val zeros = vecs.filter(_._2 == 0)
    val d = vecs.head._3.length
    val qv = Array.tabulate(d)(j => zeros.map(_._3(j)).sum / zeros.length)
    def dot(a: Array[Long], b: Array[Long]): Long =
      (0 until d).map(j => a(j) * b(j)).sum
    val rel = vecs.map(v => (v._1, dot(qv, v._3), v._3))
    val pool = rel.sortBy { case (id, r, _) => (-r, id) }.take(64)
    var selected = Vector.empty[(Long, Long, Long, Long)] // pick,id,rel,maxsim
    for (pick <- 1 to 8) {
      val chosen =
        if (pick == 1) { val h = pool.head; (h._1, h._2, 0L) }
        else {
          pool.filterNot(p => selected.exists(_._2 == p._1)).map { c =>
            val ms = selected.map(s =>
              dot(c._3, pool.find(_._1 == s._2).get._3)).max
            (c._1, c._2, ms)
          }.minBy { case (id, r, ms) => (-(r - ms), id) }
        }
      selected :+= ((pick.toLong, chosen._1, chosen._2, chosen._3))
    }
    val expect = selected.map { case (p, id, r, ms) => (p, id, r, ms, r - ms) }
    val got = q("llm_mmr_select").collect().map(r => (r.getLong(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got === expect)
    // diversity bites: the 8 picks are not simply the top-8 by relevance
    val top8 = pool.take(8).map(_._1).toSet
    assert(expect.map(_._2).toSet != top8)
  }
}
