package graft

import org.apache.spark.sql.functions._

import graft.plans.{AsOfJoin, AsOfJoinExec}

/** The custom as-of physical operator must agree with (a) a brute-force
  * per-row reference and (b) the window-trick registry implementation, and
  * must actually plan as AsOfJoinExec.
  */
class AsOfSpec extends SparkSpec {

  private def mkFrames(rows: Seq[(Long, Long, Long)], sides: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    val l = rows.toDF("k", "t", "lv")
    val r = sides.toDF("rk", "rt", "rv")
    (l, r)
  }

  test("AsOfJoinExec plans and matches brute force on generated data") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val lrows = Seq.fill(500)((rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong, rnd.nextLong(1000)))
    val rrows = Seq.fill(300)((rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong, rnd.nextLong(1000)))
      // dedup (key, time) so the match is unique (as-of tie rule out of scope here)
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
    val (l, r) = mkFrames(lrows, rrows)
    val joined = AsOfJoin.asof(l, r, "k", "rk", "t", "rt")

    // AQE wraps the plan (children=Nil on the wrapper), so match on the
    // printed tree: AsOfJoinExec's nodeName renders as "AsOfJoin"
    val planStr = joined.queryExecution.executedPlan.toString
    assert(planStr.contains("AsOfJoin"), planStr)

    val got = joined.collect().map { row =>
      (row.getLong(0), row.getLong(1), row.getLong(2),
        if (row.isNullAt(4)) None else Some((row.getLong(3), row.getLong(4), row.getLong(5))))
    }.toSet

    val expected = lrows.map { case (k, t, lv) =>
      val cands = rrows.filter(c => c._1 == k && c._2 <= t)
      val best = if (cands.isEmpty) None else Some(cands.maxBy(_._2))
      (k, t, lv, best)
    }.toSet
    assert(got === expected)
  }

  test("AsOfJoinExec agrees with the window-trick join_asof on events") {
    import spark.implicits._
    val e = Tables.events(spark, sf)
      .select($"event_id", $"user_id", unix_millis($"ts").as("ts_ms"), $"event_type")
    val clicks = e.filter($"event_type" === "click")
      .groupBy($"user_id".as("c_user"), $"ts_ms".as("c_ts"))
      .agg(max($"event_id").as("click_id"))
      .select($"c_user", $"c_ts", $"click_id")
    val purchases = e.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id", $"ts_ms")
    val custom = AsOfJoin.asof(purchases, clicks, "user_id", "c_user", "ts_ms", "c_ts")
      .select($"purchase_id", $"user_id", $"ts_ms".as("purchase_ts_ms"),
        $"click_id", $"c_ts".as("click_ts_ms"))
      .orderBy($"purchase_id")
      .collect().map(_.toSeq.map(String.valueOf)).toSeq
    val windowed = SparkEntry.queries("join_asof")(spark, sf)
      .select($"purchase_id", $"user_id", $"purchase_ts_ms", $"click_id", $"click_ts_ms")
      .collect().map(_.toSeq.map(String.valueOf)).toSeq
    assert(custom === windowed)
  }

  test("as-of matches at equal timestamps (inclusive) and resets across keys") {
    import spark.implicits._
    val l = Seq((1L, 100L, 0L), (1L, 50L, 1L), (2L, 100L, 2L)).toDF("k", "t", "lv")
    val r = Seq((1L, 100L, 7L), (1L, 40L, 8L)).toDF("rk", "rt", "rv")
    val got = AsOfJoin.asof(l, r, "k", "rk", "t", "rt")
      .collect().map(row => (row.getLong(0), row.getLong(1),
        if (row.isNullAt(5)) -1L else row.getLong(5))).toSet
    // (1,100) matches rt=100 inclusively; (1,50) matches rt=40; (2,100) no match
    assert(got === Set((1L, 100L, 7L), (1L, 50L, 8L), (2L, 100L, -1L)))
  }

  test("non-bigint key/time columns are rejected at construction") {
    import spark.implicits._
    val l = Seq((1, 100L)).toDF("k", "t") // k is IntegerType
    val r = Seq((1L, 40L)).toDF("rk", "rt")
    val ex = intercept[IllegalArgumentException] {
      AsOfJoin.asof(l, r, "k", "rk", "t", "rt")
    }
    assert(ex.getMessage.contains("must be BIGINT"))
  }

  test("NULL keys never match (DuckDB ASOF semantics)") {
    import spark.implicits._
    val l = Seq((Some(1L), Some(100L), 0L), (None, Some(100L), 1L), (Some(1L), None, 2L))
      .toDF("k", "t", "lv")
    val r = Seq((Some(1L), Some(50L), 7L), (None, Some(10L), 8L), (Some(1L), None, 9L))
      .toDF("rk", "rt", "rv")
    val got = AsOfJoin.asof(l, r, "k", "rk", "t", "rt")
      .collect().map(row => (row.getLong(2),
        if (row.isNullAt(5)) -1L else row.getLong(5))).toSet
    // only the fully non-null left row matches the fully non-null right row;
    // null-keyed rows on either side are outer/no-ops, never "key 0"
    assert(got === Set((0L, 7L), (1L, -1L), (2L, -1L)))
  }

  test("join_asof_near is the argmin merge of the backward and forward twins") {
    import spark.implicits._
    def byId(key: String): Map[Long, (Option[Long], Option[Long])] =
      SparkEntry.queries(key)(spark, sf).collect().map { r =>
        r.getLong(0) -> (
          (if (r.isNullAt(3)) None else Some(r.getLong(3))),
          (if (r.isNullAt(5)) None else Some(r.getLong(5))))
      }.toMap
    val b = byId("join_asof")
    val f = byId("join_asof_fwd")
    val near = SparkEntry.queries("join_asof_near")(spark, sf).collect().map { r =>
      r.getLong(0) -> (
        (if (r.isNullAt(3)) None else Some(r.getLong(3))),
        (if (r.isNullAt(5)) None else Some(r.getLong(5))),
        (if (r.isNullAt(6)) None else Some(r.getString(6))))
    }.toMap
    assert(near.keySet === b.keySet && near.keySet === f.keySet)
    near.foreach { case (pid, (nId, nGap, nDir)) =>
      val (bId, bGap) = b(pid)
      val (fId, fGap) = f(pid)
      // defined tie rule: backward wins on equal gaps (gap 0 included)
      val expect = (bGap, fGap) match {
        case (Some(bg), Some(fg)) =>
          if (bg <= fg) (bId, bGap, Some("b")) else (fId, fGap, Some("f"))
        case (Some(_), None) => (bId, bGap, Some("b"))
        case (None, Some(_)) => (fId, fGap, Some("f"))
        case (None, None)    => (None, None, None)
      }
      assert((nId, nGap, nDir) === expect,
        s"purchase $pid: near=($nId,$nGap,$nDir) expected $expect (b=$b, f=$f)")
    }
    assert(near.values.exists(_._3.contains("b")) &&
      near.values.exists(_._3.contains("f")),
      "fixture should exercise both directions")
    // plan shape: the two directional window frames share one user-keyed
    // sort — adding the forward candidate must not add a shuffle beyond
    // the click-dedup agg and the window partitioning
    val p = SparkEntry.queries("join_asof_near")(spark, sf)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 2, s"expected <=2 hash exchanges (agg + window), got $exchanges:\n$p")
  }
}
