package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fail-fast budget for EXACT all-pairs operators.
  *
  * The exact pair twins (`graph_common_neighbors`, `graph_jaccard_nodes`,
  * `graph_tag_similarity`, `graph_adamic_adar`, `llm_dedup_near`,
  * `llm_ngram_jaccard`) materialize a blocked self-join whose output is
  * quadratic in the per-block row count: correct and measured at sf0.1,
  * but one 100×-degree hub block costs 10,000× its share at cluster scale.
  * Each has a bounded `_approx`/LSH sibling shipping next to it; this guard
  * turns "correct today, quadratic at 100×" into an explicit contract — the
  * exact op computes its OWN pair-stream size up front (one cheap
  * histogram aggregation over the pre-pair input, Σ c·(c−1)/2 over block
  * sizes — the same quantity ScaleSpec's plan-metric ceilings pin) and
  * raises with a pointer to the bounded sibling when it exceeds the budget,
  * BEFORE the quadratic join runs.
  *
  * The check is part of the PLAN, not a driver-side action: the 1-row pair
  * count cross-joins (broadcast) onto the pre-pair input and an
  * `assert_true` filter gates every input row, so operators stay lazy
  * DataFrames (ScaleSpec's no-collect contract) and the guard works
  * unchanged on a 1000-executor cluster — the input side fails on its first
  * row, which at most costs the histogram aggregation. Catalyst pushes the
  * single-sided predicate to the 1-row side, so the steady-state overhead
  * under budget is one scan of the pre-pair input plus a broadcast of one
  * row.
  *
  * Budget default is 1e9 pairs (≈75× the largest sf0.1 stream): far above
  * anything the local harness produces, and hit right around the scale
  * where an exact quadratic twin stops being a sane choice. Override with
  * `-Dgraft.pairs.max=N`.
  */
object PairBudget {

  /** Pairs the exact twins may materialize before the plan refuses and
    * points at the bounded sibling. `-Dgraft.pairs.max` overrides.
    */
  def maxPairs: Long =
    sys.props.get("graft.pairs.max").map(_.toLong).getOrElse(1000000000L)

  /** Gate `preJoin` — the deduplicated input of a blocked self-join —
    * behind the exact pair budget. `blockKeys` are the equi-join (blocking)
    * columns: the pair stream of the self-join is exactly
    * Σ_block c·(c−1)/2, computed here with one aggregation. Empty
    * `blockKeys` means one global block (an unblocked all-pairs join:
    * C(n,2)).
    *
    * Row-preserving under budget (the always-true filter and the dropped
    * helper column leave data, schema and order alone); raises
    * `SparkException`-wrapped `"<opKey>: ... use <alternative>"` on the
    * first input row when over budget.
    */
  def gate(preJoin: DataFrame, blockKeys: Seq[Column], opKey: String,
           alternative: String, budget: Long = maxPairs): DataFrame = {
    val hist =
      if (blockKeys.isEmpty) preJoin.agg(count(lit(1)).as("c"))
      else preJoin.groupBy(blockKeys: _*).agg(count(lit(1)).as("c"))
    // DOUBLE, not BIGINT: c·(c−1)/2 wraps negative past c ≈ 3.04e9 and a
    // wrapped Σ would make the guard fail OPEN at exactly the scale it
    // exists for; double loses integer precision past 2^53 but the
    // comparison only needs magnitude, and it cannot overflow
    val np = hist.agg(coalesce(
      sum(col("c").cast("double") * (col("c").cast("double") - 1d) / 2d),
      lit(0d)).as("graft_np"))
    preJoin.crossJoin(broadcast(np))
      .filter(assert_true(col("graft_np") <= lit(budget.toDouble),
        concat(lit(s"$opKey: exact pair stream of "),
          col("graft_np").cast("decimal(38,0)").cast("string"),
          lit(s" candidate pairs exceeds budget $budget - use $alternative" +
            s" or raise -Dgraft.pairs.max"))).isNull)
      .drop("graft_np")
  }

  /** Gate `left` behind the BANDED-join pair budget (the r8 incident this
    * exists for: a collapsed/degenerate time distribution put every event
    * in one band and the `join_theta_*` family silently materialized a
    * quadratic candidate stream — 333,624 rows and 186 s where the healthy
    * domain yields 884 rows in under a second; [[gate]] never covered band
    * blocks). The candidate-pair stream of a band join is
    * Σ over matching blocks of cl(keys, b) · cr(keys, b′) for |b − b′| ≤
    * `spread` — two tiny histogram aggregations plus a histogram-sized
    * join, computed BEFORE the quadratic join runs, gating the plan with
    * the same broadcast + `assert_true` contract as [[gate]] (lazy, no
    * driver action, works unchanged on a 1000-executor cluster).
    *
    * `keys` are the extra equi (blocking) column NAMES, present under the
    * same names on both inputs; `leftBand`/`rightBand` are the band
    * expressions over each input; `spread` covers the band-explosion width
    * of the rewrite being guarded (1 for the ±1 explode of
    * `join_theta_range`, 2 for [[graft.plans.BandRangeJoinRule]]'s ±2
    * widening).
    */
  def gateBanded(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftBand: Column, rightBand: Column, spread: Int,
      opKey: String, alternative: String, budget: Long = maxPairs): DataFrame = {
    val lh = left.groupBy(keys.map(col) :+ leftBand.as("graft_bl"): _*)
      .agg(count(lit(1)).cast("double").as("graft_cl"))
    // |band − band′| ≤ spread spelled as an EQUI join (explode the right
    // histogram into its 2·spread+1 candidate bands): the gated ops pin
    // "no nested-loop join in the plan", and the guard must not be the one
    // node that violates it
    val rh = right.groupBy(keys.map(col) :+ rightBand.as("graft_br"): _*)
      .agg(count(lit(1)).cast("double").as("graft_cr"))
      .select(keys.map(k => col(k).as(s"graft_rk_$k")) ++
        Seq(col("graft_br"), col("graft_cr")): _*)
      .withColumn("graft_bcand",
        explode(array((-spread to spread).map(d => col("graft_br") + lit(d.toLong)): _*)))
    val joinCond = keys
      .map(k => lh(k) === rh(s"graft_rk_$k"))
      .foldLeft(col("graft_bl") === rh("graft_bcand"))(_ && _)
    // constant-key broadcast hash join (not crossJoin → BNLJ) for the same
    // reason as above. A literal key would constant-fold to `true` and
    // degrade right back to a nested-loop join, so the zero is built from a
    // non-foldable expression (spark_partition_id is non-foldable; ·0 makes
    // it the constant 0 on every row of both sides)
    val zero = spark_partition_id().cast("long") * lit(0L)
    val np = lh.join(rh, joinCond)
      .agg(coalesce(sum(col("graft_cl") * col("graft_cr")), lit(0d)).as("graft_np"))
      .withColumn("graft_one", zero)
    left.withColumn("graft_one", zero)
      .join(broadcast(np), "graft_one")
      .filter(assert_true(col("graft_np") <= lit(budget.toDouble),
        concat(lit(s"$opKey: banded pair stream of "),
          col("graft_np").cast("decimal(38,0)").cast("string"),
          lit(s" candidate pairs exceeds budget $budget - the band/time " +
            s"distribution is degenerate for this window; use $alternative" +
            s" or raise -Dgraft.pairs.max"))).isNull)
      .drop("graft_np", "graft_one")
  }
}
