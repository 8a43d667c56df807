package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.api.Skew

/** Source-format round-trips (SURVEY §2.1 "csv/json sources") and the
  * skew-salting helpers (SURVEY §4).
  */
class SourceSpec extends SparkSpec {

  test("csv round-trip: write with header+schema, read back identical") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_csv_").toString + "/out"
    val orig = Tables.nation(spark, sf)
    orig.write.option("header", "true").csv(dir)
    val back = spark.read.option("header", "true")
      .schema(orig.schema).csv(dir)
    assert(back.orderBy($"n_nationkey").collect().toSeq ===
      orig.orderBy($"n_nationkey").collect().toSeq)
  }

  test("schema drift guard: events.parquet ts unit is one the loader handles, values in the documented domain") {
    import spark.implicits._
    // The driver regenerated events.parquet between rounds 8 and 9 and the
    // physical ts encoding CHANGED (TIMESTAMP(NANOS) → TIMESTAMP(MICROS)),
    // silently breaking 22 oracle rows. This guard makes the next regen fail
    // ONE spec loudly, naming the found unit, instead of failing the oracle
    // silently: (a) the footer annotation must be a unit Tables.journal
    // adapts to; (b) the normalized values must land in FIXTURES.md's
    // documented 2024 event-time domain (catches a wrong-unit divide, which
    // collapses 30 days into minutes of 1970, regardless of the annotation).
    val unit = Tables.eventsTsUnit(spark, s"$sf/events.parquet")
    assert(Set("NANOS", "MICROS", "MILLIS").contains(unit),
      s"events.parquet ts carries parquet annotation unit '$unit' — " +
        "Tables.journal only adapts to NANOS/MICROS/MILLIS; the driver " +
        "regenerated testdata with a new encoding, update Tables.scala")
    val r = Tables.events(spark, sf)
      .agg(min(year($"ts")).as("y0"), max(year($"ts")).as("y1"),
        count(lit(1)).as("n")).first()
    assert(r.getLong(2) > 0L)
    assert(r.getInt(0) >= 2020 && r.getInt(1) <= 2030,
      s"normalized events.ts spans years ${r.getInt(0)}..${r.getInt(1)} — " +
        s"outside the documented 2024 domain; the loader is decoding the " +
        s"'$unit'-annotated column with the wrong unit (FIXTURES.md events)")
  }

  test("json round-trip: nested struct survives with explicit schema") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_json_").toString + "/out"
    val orig = Tables.customer(spark, sf)
      .select($"c_custkey", struct($"c_name", $"c_acctbal").as("info"), $"c_mktsegment")
    orig.write.json(dir)
    val back = spark.read.schema(orig.schema).json(dir)
    assert(back.orderBy($"c_custkey").collect().toSeq ===
      orig.orderBy($"c_custkey").collect().toSeq)
    assert(back.select($"info.c_acctbal").schema.head.dataType.typeName === "double")
  }

  test("saltedJoin equals the plain join on a skewed key distribution") {
    import spark.implicits._
    // 90% of probe rows share key 0 — the skew scenario
    val probe = spark.range(0, 10000)
      .select((when($"id" % 10 =!= 0, $"id" % 50).otherwise(0L)).as("k"), $"id".as("v"))
    val build = spark.range(0, 50).select($"id".as("k"), ($"id" * 100).as("w"))
    val plain = probe.join(build, "k").select($"k", $"v", $"w")
    val salted = Skew.saltedJoin(probe, build, "k", salts = 8).select($"k", $"v", $"w")
    assert(salted.count() === plain.count())
    assert(salted.except(plain).count() === 0)
    assert(plain.except(salted).count() === 0)
  }

  test("saltedCount equals plain groupBy count on skewed data") {
    import spark.implicits._
    val df = spark.range(0, 20000)
      .select(when($"id" % 5 =!= 0, $"id" % 7).otherwise(0L).as("k"))
    val plain = df.groupBy($"k").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(df, "k", salts = 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }
}
