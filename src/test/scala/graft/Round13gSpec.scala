package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.unix_millis

/** Independent JVM cross-checks for the round-13 wave-VI operators —
  * plain-Scala replays from raw collected inputs (the SURVEY.md §5
  * two-witness discipline).
  */
class Round13gSpec extends SparkSpec {

  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, sf)

  private def p4(x: Double): Double = math.floor(x * 10000.0 + 0.5) / 10000.0

  test("graph_matching_greedy equals a plain-Scala mutual-proposal replay") {
    import spark.implicits._
    val lp = Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val wmap = lp.toSeq.groupBy(_._1).values.flatMap { xs =>
      val ps = xs.map(_._2).distinct
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.toSeq.groupBy(identity).view.mapValues(_.length.toLong).toMap
    var e2: Map[Long, Seq[(Long, Long)]] = wmap.toSeq
      .flatMap { case ((a, b), w) => Seq((a, (b, w)), (b, (a, w))) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long)]
    for (round <- 1 to 4) {
      val best = e2.map { case (v, ns) =>
        v -> ns.minBy { case (u, w) => (-w, u) }
      }
      val matched = best.collect {
        case (v, (u, w)) if v < u && best.get(u).exists(_._1 == v) =>
          (v, u, w, round.toLong)
      }.toSeq
      out ++= matched
      val mv = matched.flatMap(m => Seq(m._1, m._2)).toSet
      e2 = e2.collect { case (v, ns) if !mv.contains(v) =>
        v -> ns.filterNot(n => mv.contains(n._1))
      }.filter(_._2.nonEmpty)
    }
    val expect = out.sortBy(_._1).toSeq
    val got = q("graph_matching_greedy").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expect)
    // a matching is a matching: no vertex appears twice
    val vs = got.flatMap(m => Seq(m._1, m._2))
    assert(vs.distinct.length === vs.length)
  }

  test("sink_gdpr_purge: the purged copy holds exactly the non-cohort rows") {
    import spark.implicits._
    val rows = Tables.events(spark, sf)
      .select(unix_millis($"ts"), $"user_id").collect()
      .map(r => (r.getLong(0) / 86400000L, r.getLong(1)))
    val expect = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (d, xs) =>
      val purged = xs.filter(_._2 % 97 == 0)
      (d, (xs.length - purged.length).toLong, purged.length.toLong,
        purged.map(_._2).distinct.length.toLong)
    }
    val got = q("sink_gdpr_purge").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expect)
    // the cohort exists on this data — the purge is not vacuous
    assert(got.map(_._3).sum > 0)
  }

  test("llm_collocations_llr equals a plain-Scala Dunning LLR replay") {
    import spark.implicits._
    val bi = Tables.documents(spark, sf).select($"text").collect()
      .map(_.getString(0).trim.split(" ").toSeq)
      .filter(_.length >= 2)
      .flatMap(ts => ts.zip(ts.tail))
    val n = bi.length.toLong
    val ma = bi.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val mb = bi.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    def lq(k: Long, row: Long, col: Long): Long =
      if (k > 0)
        math.floor(k.toDouble *
          math.log((k.toDouble * n) / (row.toDouble * col.toDouble)) *
          1.0e9 + 0.5).toLong
      else 0L
    val expect = bi.groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .map { case ((a, b), k11) =>
        val (ca, cb) = (ma(a), mb(b))
        val llrq = 2 * (lq(k11, ca, cb) + lq(ca - k11, ca, n - cb) +
          lq(cb - k11, n - ca, cb) + lq(n - ca - cb + k11, n - ca, n - cb))
        (a, b, k11, p4(llrq.toDouble / 1.0e9))
      }.sortBy { case (a, b, _, l) => (-l, a, b) }.take(20)
    val got = q("llm_collocations_llr").collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got === expect)
    assert(got.head._4 > 0.0)
  }

  test("win_sortino equals a plain-Scala downside-deviation replay") {
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
      val s2 = rs.map(r => BigInt(r) * r).sum.toDouble
      val sd2 = rs.map(r => { val d0 = math.min(r, 0L); BigInt(d0) * d0 })
        .sum.toDouble
      val sig = math.sqrt(s2 / n - m * m)
      (g, rs.length.toLong, p4(m / 1.0e6), p4(m / sig),
        if (sd2 > 0) Some(p4(m / math.sqrt(sd2 / n))) else None)
    }
    val got = q("win_sortino").collect().map(r => (r.getString(0),
      r.getLong(1), r.getDouble(2), r.getDouble(3),
      if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toSeq
    assert(got === expect)
  }

  test("llm_nb_classify equals a plain-Scala Naive Bayes replay") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"source", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).trim.split(" ").filter(_.nonEmpty).toSeq))
    val (train, test) = docs.partition(d => (d._1 / 20) % 2 == 0)
    val cts = train.flatMap(d => d._3.map(t => (t, d._2)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cs = train.flatMap(d => d._3.map(_ => d._2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val vocab = train.flatMap(_._3).distinct.toSet
    val v = vocab.size.toLong
    val nd = train.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nTrain = train.length.toLong
    val sources = cs.keys.toSeq.sorted
    def lq(x: Double): Long = math.floor(x * 1.0e9 + 0.5).toLong
    val pq = sources.map(s0 =>
      s0 -> lq(math.log(nd(s0).toDouble / nTrain.toDouble))).toMap
    val tsq = (for (t <- vocab.toSeq; s0 <- sources) yield (t, s0) ->
      lq(math.log((cts.getOrElse((t, s0), 0L) + 1).toDouble /
        (cs(s0) + v).toDouble))).toMap
    val preds = test.flatMap { case (id, _, toks) =>
      val seen = toks.filter(vocab.contains)
      if (seen.isEmpty) None
      else Some(id -> sources.map { s0 =>
        (-(seen.map(t => tsq((t, s0))).sum + pq(s0)), s0)
      }.min._2)
    }.toMap
    // all-OOV docs stay in the denominator (no prediction = incorrect)
    // and are surfaced in n_unclassified
    val expect = test
      .groupBy(_._2).toSeq.sortBy(_._1).map { case (s0, xs) =>
        val correct = xs.count(d => preds.get(d._1).contains(s0)).toLong
        val unclassified = xs.count(d => !preds.contains(d._1)).toLong
        (s0, xs.length.toLong, correct, unclassified,
          p4(correct.toDouble / xs.length.toDouble))
      }
    val got = q("llm_nb_classify").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got === expect)
    // every source appears in both halves under the block split
    assert(got.length === nd.size)
  }
}
