package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Canonical loaders for the driver-generated parquet tables
  * (schemas documented in FIXTURES.md; verified from parquet footers).
  *
  * All loaders take the scale-factor directory so every operator stays a pure
  * `(SparkSession, String) => DataFrame` (SURVEY.md §7). Reads go through
  * Spark's vectorized parquet reader; predicate pushdown and column pruning
  * are Catalyst's job — callers `select`/`filter` declaratively and never
  * cache here (at 100 TB these tables do not fit in memory; each query plans
  * its own pruned scan).
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = t(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to read
    * natively (PARQUET_TYPE_ILLEGAL). Reading with an explicit user schema
    * that declares `ts` as LongType makes the vectorized reader hand back the
    * raw nanos int64 — scoped to THIS read, no session-wide
    * `spark.sql.legacy.parquet.nanosAsLong` mutation (which would change how
    * every later ns-parquet read in the session resolves). Then floor to a µs
    * TimestampType — the same truncation DuckDB's epoch_ms/epoch_us apply,
    * so derived ms values hash-match (SURVEY.md §2.9 item 3).
    */
  val eventsRawSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType.fromDDL(
      "event_id BIGINT, ts BIGINT, user_id BIGINT, " +
        "event_type STRING, value DOUBLE, props STRING")

  def events(s: SparkSession, d: String): DataFrame =
    s.read.schema(eventsRawSchema).parquet(s"$d/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
