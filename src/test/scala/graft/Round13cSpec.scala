package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{get_json_object, unix_millis}

/** Independent JVM cross-checks for the round-13 wave-II operators —
  * plain-Scala replays from raw collected inputs (the SURVEY.md §5
  * two-witness discipline).
  */
class Round13cSpec extends SparkSpec {

  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, sf)

  private def p4(x: Double): Double = math.floor(x * 10000.0 + 0.5) / 10000.0

  test("win_amihud equals a plain-Scala quantized-illiquidity replay") {
    import spark.implicits._
    val daily = Tables.events(spark, sf)
      .select($"event_type", unix_millis($"ts"), $"value").collect()
      .map(r => ((r.getString(0), r.getLong(1) / 86400000L),
        (math.round(r.getDouble(2) * 100), 1L)))
      .groupBy(_._1).view.mapValues(xs =>
        (xs.map(_._2._1).sum, xs.map(_._2._2).sum)).toMap
    val expect = daily.keys.map(_._1).toSeq.distinct.sorted.map { g =>
      val series = daily.collect { case ((gg, d), rv) if gg == g => (d, rv) }
        .toSeq.sortBy(_._1)
      val amqs = series.zip(series.tail).collect {
        case ((_, (pr, _)), (_, (rev, vol))) if pr > 0 =>
          math.abs((rev - pr) * 1000000L) / pr * 1000L / vol
      }
      (g, amqs.length.toLong,
        p4(amqs.sum.toDouble / amqs.length.toDouble / 1.0e9),
        p4(amqs.max.toDouble / 1.0e9))
    }
    val got = q("win_amihud").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(got === expect)
  }

  test("win_range_vol equals a plain-Scala OHLC-estimator replay") {
    import spark.implicits._
    val rows = Tables.events(spark, sf)
      .select($"event_type", unix_millis($"ts"), $"event_id", $"value")
      .collect()
      .map(r => ((r.getString(0), r.getLong(1) / 86400000L),
        (r.getLong(1), r.getLong(2), math.round(r.getDouble(3) * 100))))
      .groupBy(_._1).view.mapValues { xs =>
        val vs = xs.map(_._2)
        (vs.map(_._3).min, vs.map(_._3).max, vs.min._3, vs.max._3)
      }.toMap
    val expect = rows.keys.map(_._1).toSeq.distinct.sorted.map { g =>
      val days = rows.collect {
        case ((gg, _), ohlc) if gg == g && ohlc._1 > 0 && ohlc._3 > 0 => ohlc
      }.toSeq
      val hl = days.map { case (lo, hi, _, _) =>
        val l = math.log(hi.toDouble / lo.toDouble)
        math.floor(l * l * 1.0e9 + 0.5).toLong
      }
      val co = days.map { case (_, _, op, cl) =>
        val l = math.log(cl.toDouble / op.toDouble)
        math.floor(l * l * 1.0e9 + 0.5).toLong
      }
      val n = days.length.toDouble
      val mhl = hl.sum.toDouble / n / 1.0e9
      val mco = co.sum.toDouble / n / 1.0e9
      (g, days.length.toLong,
        p4(math.sqrt(mhl / (4.0 * math.log(2.0)))),
        p4(math.sqrt(math.max(0.0,
          0.5 * mhl - (2.0 * math.log(2.0) - 1.0) * mco))))
    }
    val got = q("win_range_vol").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(got === expect)
  }

  test("agg_hurst equals a plain-Scala rescaled-range replay") {
    import spark.implicits._
    val xs = Tables.lineitem(spark, sf)
      .select(unix_millis($"l_shipdate".cast("timestamp")),
        $"l_extendedprice", $"l_discount").collect()
      .map(r => (r.getLong(0) / 86400000L,
        math.round(r.getDouble(1) * (1 - r.getDouble(2)) * 100)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy(_._1).map(_._2)
    def meanRs(bn: Int): (Long, Double) = {
      val blocks = xs.grouped(bn).filter(_.length == bn).toSeq
      val rsqs = blocks.flatMap { b =>
        val sb = b.sum
        val sq = b.map(x => BigInt(x) * x).sum
        val vp = BigInt(bn) * sq - BigInt(sb) * sb
        if (vp > 0) {
          val cums = b.scanLeft(0L)(_ + _).tail
          val zs = cums.zipWithIndex.map { case (c, i) =>
            bn * c - (i + 1) * sb
          }
          Some(math.floor((zs.max - zs.min).toDouble /
            math.sqrt(vp.toDouble) * 1.0e9 + 0.5).toLong)
        } else None
      }
      (rsqs.length.toLong,
        rsqs.sum.toDouble / rsqs.length.toDouble / 1.0e9)
    }
    val per = Seq(16, 32, 64).map(bn => (bn.toLong, meanRs(bn)))
    val hurst = (math.log(per(2)._2._2) - math.log(per(0)._2._2)) /
      (2.0 * math.log(2.0))
    val expect = per.map { case (bn, (nb, m)) =>
      (bn, nb, p4(m), p4(hurst))
    }
    val got = q("agg_hurst").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(got === expect)
    // revenue series should not read as strongly mean-reverting noise
    assert(got.head._4 > 0.0 && got.head._4 < 1.2)
  }

  test("graph_temporal_reach equals a plain-Scala time-respecting replay") {
    import spark.implicits._
    val tx = Tables.events(spark, sf)
      .select($"user_id", get_json_object($"props", "$.k").cast("long"),
        unix_millis($"ts")).collect()
      .collect { case r if !r.isNullAt(1) =>
        ((r.getLong(1), r.getLong(0)), r.getLong(2)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toSeq
      .map { case ((item, u), ms) => (item, u, ms) }
    val pairs = tx.groupBy(_._1).values.flatMap { xs =>
      for {
        (_, ua, ta) <- xs; (_, ub, tb) <- xs
        if ua != ub && tb > ta && tb <= ta + 604800000L
      } yield (ua, ub)
    }.toSeq
    val expect = pairs.groupBy(_._1).view.mapValues(bs =>
      (bs.map(_._2).distinct.length.toLong, bs.length.toLong)).toSeq
      .map { case (u, (r, n)) => (u, r, n) }
      .sortBy { case (u, r, n) => (-r, -n, u) }.take(20)
    val got = q("graph_temporal_reach").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expect)
    assert(got.nonEmpty && got.head._2 > 0)
  }

  test("state_bitemporal: later transaction cutoffs reveal more state") {
    val rows = q("state_bitemporal").collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(rows.size === 4)
    for (vl <- Seq("v_14d", "v_7d")) {
      val half = rows(("tx_half", vl)); val full = rows(("tx_full", vl))
      // the full journal can only see MORE: users and events monotone up
      assert(full._1 >= half._1 && full._2 > half._2)
    }
    for (txl <- Seq("tx_half", "tx_full")) {
      val v14 = rows((txl, "v_14d")); val v7 = rows((txl, "v_7d"))
      assert(v7._2 >= v14._2)
    }
  }

  test("llm_watermark_detect equals a plain-Scala md5 green-list replay") {
    import spark.implicits._
    val md = java.security.MessageDigest.getInstance("MD5")
    def green(tok: String): Long = {
      val h = md.digest(("wm1" + tok).getBytes("UTF-8"))
      if (((h(0) >> 4) & 0xf) < 8) 1L else 0L
    }
    val expect = Tables.documents(spark, sf)
      .select($"doc_id", $"text").collect()
      .map { r =>
        val toks = r.getString(1).trim.split(" ").filter(_.nonEmpty)
        val n = toks.length.toLong
        val g = toks.map(green).sum
        val z = (2 * g - n).toDouble / math.sqrt(n.toDouble)
        (r.getLong(0), n, g, p4(z), z > 2.0)
      }.sortBy(_._1).toSeq
    val got = q("llm_watermark_detect").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4))).toSeq
    assert(got === expect)
    // unwatermarked synthetic text: overwhelmingly z below the flag line
    assert(got.count(_._5) * 10 < got.length)
  }
}
