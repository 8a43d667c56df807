package graft

import org.apache.spark.sql.DataFrame

/** Independent JVM cross-checks for round-10 operators — each test
  * recomputes the op's answer from raw collected inputs with plain Scala
  * (no Spark expressions), so an oracle-and-op shared misunderstanding
  * can't hide (SURVEY.md §5's two-witness discipline).
  */
class Round10Spec extends SparkSpec {

  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, sf)

  test("win_concurrency_peak equals a brute-force sweep over the session intervals") {
    import spark.implicits._
    // rebuild sessions in plain Scala from raw events
    val ev = Tables.events(spark, sf)
      .select($"user_id", $"event_id", org.apache.spark.sql.functions.unix_millis($"ts").as("ms"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val sessions = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      val buf = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      var start = sorted.head._3; var end = sorted.head._3
      sorted.tail.foreach { r =>
        if (r._3 - end > 1800000L) { buf += ((start, end)); start = r._3 }
        end = r._3
      }
      buf += ((start, end))
      buf
    }
    // brute force: concurrency at each boundary, starts before ends on ties
    val deltas = sessions.flatMap { case (s0, e0) => Seq((s0, 1L), (e0, -1L)) }
      .sortBy { case (ms, d) => (ms, -d) }
    var cur = 0L; var peak = -1L; var peakMs = Long.MaxValue
    deltas.foreach { case (ms, d) =>
      cur += d
      if (cur > peak) { peak = cur; peakMs = ms }
    }
    val got = q("win_concurrency_peak").collect().head
    assert(got.getLong(0) === 2L * sessions.size, "n_boundaries")
    assert(got.getLong(1) === peak, "peak_concurrency")
    assert(got.getLong(2) === peakMs, "peak_ms (earliest peak)")
  }

  test("llm_span_corruption: every span fits, matches the hash coin, none missing") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split(" ", -1)).toMap
    def coin(doc: Long, i: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$doc:$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 4)
      java.lang.Long.parseLong(hex, 16) % 8 == 0
    }
    val want = docs.toSeq.flatMap { case (d, toks) =>
      if (toks.length < 3) Nil
      else (1L to (toks.length - 2).toLong).filter(i => coin(d, i))
        .map(i => (d, i, toks.slice(i.toInt - 1, i.toInt + 2).mkString(" ")))
    }.toSet
    val got = q("llm_span_corruption").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3))).toSet
    assert(got === want)
    assert(want.nonEmpty, "fixture should schedule some spans")
  }

  test("mm_tile_grid: per-doc tile areas partition the stub image exactly") {
    import spark.implicits._
    val dims = Tables.documents(spark, sf)
      .select($"doc_id", org.apache.spark.sql.functions.length($"text"))
      .collect().map { r =>
        val n = r.getInt(1)
        val w = n % 64 + 1
        r.getLong(0) -> ((w.toLong, math.max(1, n / math.max(w, 1)).toLong))
      }.toMap
    val tiles = q("mm_tile_grid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val areas = tiles.groupBy(_._1).map { case (d, ts) =>
      d -> ts.map(t => t._4 * t._5).sum
    }
    dims.foreach { case (d, (w, h)) =>
      assert(areas(d) === w * h, s"doc $d tiles must partition ${w}x$h")
    }
    // no tile exceeds 16 px or drops below 1 on either axis
    assert(tiles.forall(t => t._4 >= 1 && t._4 <= 16 && t._5 >= 1 && t._5 <= 16))
  }

  test("agg_subsample_ci: coin is ~50% per replicate and the CI brackets the mean") {
    import spark.implicits._
    val row = q("agg_subsample_ci").collect().head
    val mean = row.getDouble(1); val lo = row.getDouble(2); val hi = row.getDouble(3)
    assert(lo <= hi, "ci_lo <= ci_hi")
    // the half-sample means concentrate around the population mean; at the
    // fixture's n the 5th/95th replicate means sit well within ±10%
    assert(lo > mean * 0.9 && hi < mean * 1.1,
      s"CI [$lo, $hi] should hug the mean $mean at fixture scale")
    // JVM recompute of one replicate's membership rate (deterministic coin)
    val keys = Tables.orders(spark, sf).select($"o_orderkey")
      .collect().map(_.getLong(0))
    val md = java.security.MessageDigest.getInstance("MD5")
    val inR0 = keys.count { k =>
      val hex = md.digest(s"0_$k".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 4)
      java.lang.Long.parseLong(hex, 16) % 2 == 0
    }
    val rate = inR0.toDouble / keys.length
    assert(rate > 0.4 && rate < 0.6, s"replicate-0 membership $rate should be ~0.5")
  }
}
