package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: time the heavy graph/LLM queries in isolation at the
  * driver's bench parallelism (SPARK_GRAFT_CPUS, default 32).
  */
object ProfileGraph {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    time("warmup copurchase.count")(graft.ops.GraphOps.copurchase(spark, sfDir).count())
    val keys = if (args.length > 1) args.drop(1).toSeq else Seq(
      "graph_pagerank", "graph_ppr", "graph_jaccard_nodes",
      "graph_tag_similarity", "graph_sssp", "graph_cc", "graph_common_neighbors")
    keys.foreach(k => time(k)(graft.SparkEntry.queries(k)(spark, sfDir).count()))
    spark.stop()
  }
}
