package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resilient join (SURVEY.md §4 "salting for skew"): when one probe key
  * dominates (a celebrity vertex, a null-ish default), a plain hash join
  * lands that key's entire volume on one reducer. Salting splits it:
  *
  *   - probe side: add a uniform salt in [0, salts) per row;
  *   - build side: replicate each row `salts` times, one per salt value;
  *   - join on (key, salt) — the heavy key now spreads over `salts` tasks.
  *
  * Complements AQE's skew-join splitting (which handles sort-merge joins
  * post-hoc); explicit salting also covers aggregations and older plans.
  * The salt is derived from a hash of the whole probe row, so the result is
  * independent of partitioning and run order.
  */
object Skew {

  def saltedJoin(probe: DataFrame, build: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 1, "salts must be > 1")
    val salted = probe.withColumn("_salt",
      pmod(xxhash64(struct(probe.columns.map(col): _*)), lit(salts.toLong)))
    val replicated = build
      .crossJoin(broadcast(
        build.sparkSession.range(0, salts).toDF("_salt")))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase skew-resilient aggregation: count per (key, salt) partials,
    * then merge partials per key — the heavy key's input spreads over
    * `salts` partial groups before the (tiny) final merge.
    */
  def saltedCount(df: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 1, "salts must be > 1")
    df.withColumn("_salt",
        pmod(xxhash64(struct(df.columns.map(col): _*)), lit(salts.toLong)))
      .groupBy(col(key), col("_salt")).agg(count(lit(1)).as("_partial"))
      .groupBy(col(key)).agg(sum(col("_partial")).as("n"))
  }
}
