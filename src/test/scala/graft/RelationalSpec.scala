package graft

import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  test("registry: every oracleSql key has a queries entry") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle keys without query impl: ${o.diff(q)}")
  }

  test("agg_pricing: 6 groups, exact flag/status domain, positive sums") {
    val df = SparkEntry.queries("agg_pricing")(spark, sf)
    val rows = df.collect()
    assert(rows.length === 6) // {A,N,R} x {F,O} minus impossible combos = 6 here
    val flags = rows.map(_.getString(0)).toSet
    assert(flags.subsetOf(Set("A", "N", "R")))
    rows.foreach { r =>
      assert(r.getDouble(r.fieldIndex("sum_qty")) > 0)
      assert(r.getDouble(r.fieldIndex("sum_charge")) >= r.getDouble(r.fieldIndex("sum_disc_price")))
      assert(r.getLong(r.fieldIndex("count_order")) > 0)
    }
  }

  test("agg_pricing: filter is pushed to the parquet scan") {
    val df = SparkEntry.queries("agg_pricing")(spark, sf)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters") && physical.contains("l_shipdate"),
      s"expected shipdate pushdown in plan:\n$physical")
  }

  test("entry: flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
