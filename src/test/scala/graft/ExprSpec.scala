package graft

import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.functions._

import graft.expr.{FloatVec, ShingleGen, StableHash64}

class ExprSpec extends SparkSpec {

  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, sf)

  test("stable_hash64: matches the documented FNV-1a reference values") {
    // independent fold of the documented algorithm
    def ref(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0xcbf29ce484222325L)((h, b) =>
        (h ^ (b & 0xffL)) * 0x100000001b3L)
    FloatVec.register(spark)
    val got = spark.sql(
      "SELECT stable_hash64('hello'), stable_hash64(''), stable_hash64('graft')").head()
    assert(got.getLong(0) === ref("hello"))
    assert(got.getLong(1) === 0xcbf29ce484222325L)
    assert(got.getLong(2) === ref("graft"))
  }

  test("ShingleGen: emits exactly the sliding n-grams, in order") {
    import spark.implicits._
    val df = Seq((1L, "a b c d"), (2L, "x y"), (3L, "p q r")).toDF("id", "text")
    val rows = df.select($"id", GraftSqlBridge.column(
        ShingleGen(GraftSqlBridge.expression($"text"), 3)).as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows === Seq((1L, "a b c"), (1L, "b c d"), (3L, "p q r")))
  }

  test("MapSumAgg: equals the explode+groupBy formulation") {
    import spark.implicits._
    val viaAgg = q("graph_tag_profile").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val viaGroupBy = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf), $"l_orderkey" === $"o_orderkey")
      .join(Tables.part(spark, sf), $"l_partkey" === $"p_partkey")
      .groupBy($"o_custkey", $"p_brand")
      .agg(sum($"l_quantity".cast("long")).as("w"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(viaAgg === viaGroupBy)
  }

  test("agg_topk_group (bounded-heap Aggregator) equals the window formulation") {
    val viaAgg = q("agg_topk_group").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("c_mktsegment").orderBy(col("c_acctbal").desc, col("c_custkey"))
    val viaWin = Tables.customer(spark, sf)
      .withColumn("rnk", row_number().over(w).cast("long")).filter(col("rnk") <= 3)
      .collect()
      .map(r => (r.getString(r.fieldIndex("c_mktsegment")), r.getLong(r.fieldIndex("rnk")),
        r.getLong(r.fieldIndex("c_custkey")))).toSet
    assert(viaAgg === viaWin)
  }

  test("join_asof: every match is the latest click at or before the purchase") {
    import spark.implicits._
    val e = Tables.events(spark, sf)
      .select($"event_id", $"user_id", unix_millis($"ts").as("ms"), $"event_type")
      .collect()
    val clicks = e.filter(_.getString(3) == "click")
      .groupBy(r => (r.getLong(1), r.getLong(2)))
      .map { case ((u, ms), rs) => (u, ms, rs.map(_.getLong(0)).max) }.toSeq
    val got = q("join_asof").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (u, pMs) = (r.getLong(1), r.getLong(2))
      val eligible = clicks.filter(c => c._1 == u && c._2 <= pMs)
      if (r.isNullAt(3)) assert(eligible.isEmpty)
      else {
        val best = eligible.maxBy(c => (c._2, c._3))
        assert(r.getLong(3) === best._3, s"purchase ${r.getLong(0)}")
        assert(r.getLong(4) === best._2)
      }
    }
  }

  test("GraftExtensions wires all injection points without error") {
    // the per-session register/install paths are exercised throughout the
    // suite; this asserts the spark.sql.extensions entry point stays valid
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(ext)
  }

  test("FloatDot survives whole-stage codegen (projection runs inside a codegen stage)") {
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    import spark.implicits._
    val df = Tables.embeddings(spark, sf)
      .select(FloatVec.floatDot($"embedding", $"embedding").as("d"))
    val codegenStage = df.queryExecution.executedPlan.collectFirst {
      case w: WholeStageCodegenExec => w
    }
    assert(codegenStage.isDefined, df.queryExecution.executedPlan.toString)
    assert(df.agg(min("d")).head().getDouble(0) > 0)
  }

  test("SortedMapDot: two-pointer merge equals the explode+join dot product") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1L to 50L).map { id =>
      val tags = rnd.shuffle(('a' to 'j').toList).take(rnd.nextInt(8) + 2)
        .map(c => (c.toString, rnd.nextInt(100).toLong + 1))
      (id, tags)
    }
    val flat = rows.flatMap { case (id, ts) => ts.map(t => (id, t._1, t._2)) }
      .toDF("id", "tag", "w")
    val maps = flat.groupBy($"id")
      .agg(sort_array(collect_list(struct($"tag", $"w"))).as("m"))
    val got = maps.as("x").join(maps.as("y"), $"x.id" < $"y.id")
      .select($"x.id".as("a"), $"y.id".as("b"),
        graft.expr.MapDot.sortedMapDot($"x.m", $"y.m").as("dot"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val expected = flat.as("f1").join(flat.as("f2"),
        $"f1.tag" === $"f2.tag" && $"f1.id" < $"f2.id")
      .groupBy($"f1.id".as("a"), $"f2.id".as("b"))
      .agg(sum($"f1.w" * $"f2.w").as("dot"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // explode+join omits pairs with no shared tag; merge yields 0 there
    expected.foreach { case (k, v) => assert(got(k) === v, s"pair $k") }
    got.filterNot { case (k, _) => expected.contains(k) }
      .foreach { case (k, v) => assert(v === 0L, s"disjoint pair $k") }
  }
}
