package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Public event-analytics surface over CALLER frames — the library form of
  * the fixture-bound registry ops (`win_sessionize`, `agg_retention`,
  * `win_pareto`), so a user of the reference can run the same analytics on
  * their own tables without adopting this harness's schemas. Each method is
  * a thin column-mapping shim over the registry op's exact core, and
  * ApiSpec pins the equivalences on the fixture tables.
  */
object EventAnalytics {

  /** Gaps-and-islands sessionization: one session row per (entity, run of
    * activity with inter-event gaps ≤ gapMs). `ts` must be an epoch-ms
    * LONG column (reduce timestamps yourself — this library's portability
    * rule); `eventId` breaks timestamp ties so the session order is total.
    * Output: (user_id, session_seq, n_events, start_ms, dur_ms), one
    * user-keyed shuffle + two window passes (see the registry op's plan
    * audit in PLANS.md).
    */
  def sessionize(df: DataFrame, user: Column, tsMs: Column, eventId: Column,
                 gapMs: Long = 1800000L): DataFrame = {
    require(gapMs > 0, s"sessionize needs a positive gap (got $gapMs)")
    val ev = df.select(user.as("user_id"), tsMs.as("tms"), eventId.as("event_id"))
    graft.ops.Relational.sessionizeCore(ev, gapMs)
  }

  /** Cohort retention triangle: entities cohorted by first-activity
    * period, each cell = distinct entities of cohort p0 active at
    * p0+offset. `period` is any integer period column (epoch-day,
    * epoch-week — the caller picks the grain). Output:
    * (cohort_day, day_offset, n_users).
    */
  def retention(df: DataFrame, user: Column, period: Column): DataFrame = {
    val ev = df.select(user.as("user_id"), period.cast("long").as("d"))
    val cohort = ev.groupBy(col("user_id")).agg(min(col("d")).as("d0"))
    ev.join(cohort, "user_id")
      .groupBy(col("d0").as("cohort_day"), (col("d") - col("d0")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** Pareto / cumulative-share: members of `key` carrying the top
    * `num/den` share of Σ value, with dense rank and cumulative share.
    * The cut is exact integer arithmetic (`cum·den ≤ total·num`) over
    * scaled-long sums — no float threshold; `value` is scaled by 1e4
    * (money-style) before accumulation. Keys grow with the data (parts,
    * suppliers, users all scale linearly), so the global rank and running
    * sum over the per-key rollup are [[DistScan.withGlobalRank]] +
    * [[DistScan.withPrefixAgg]] range-partitioned scans — never a
    * single-partition window.
    */
  def paretoShare(df: DataFrame, key: Column, value: Column,
                  num: Int = 4, den: Int = 5): DataFrame = {
    require(num > 0 && den > 0 && num <= den,
      s"paretoShare needs a share in (0, 1]: got $num/$den")
    val rev = df.groupBy(key.as("p"))
      .agg(sum(round(value * lit(10000)).cast("long")).as("r"))
    val tot = rev.agg(sum(col("r")).as("t"))
    val ranked = DistScan.withGlobalRank(rev, "rn", col("r").desc, col("p"))
    val scanned = DistScan.withPrefixAgg(ranked, "__prev", col("r"), "sum",
      col("r").desc, col("p"))
    scanned
      .withColumn("cum", coalesce(col("__prev"), lit(0L)) + col("r"))
      .crossJoin(broadcast(tot))
      .filter(col("cum") * den <= col("t") * num)
      .select(col("p"), (col("r").cast("double") / 10000.0).as("revenue"), col("rn"),
        round(col("cum").cast("double") / col("t").cast("double"), 4).as("cum_share"))
  }
}
