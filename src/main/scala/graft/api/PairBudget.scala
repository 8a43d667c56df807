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
}
