package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: dump explain("formatted") for representative registry
  * queries (feeds PLANS.md — the plan-review artifact).
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val keys = if (args.length > 1) args.drop(1).toSeq else Seq(
      "scan_pruned", "agg_pricing", "join_broadcast", "join_theta_range",
      "join_asof", "graph_triangles", "llm_sim_join", "llm_dedup_minhash",
      "topk_limit")
    keys.foreach { k =>
      println(s"\n===== $k =====")
      graft.SparkEntry.queries(k)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
