package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: compare jaccard pair-agg formulations at bench parallelism.
  *
  * MEASURED CONCLUSION (2026-08-12, sf0.1, 32 cpus): packing the pair key
  * into one long (shiftleft 32) does NOT beat the two-column groupBy — warm
  * runs: current 3.3s vs packed 4.4s. The 9-10s jaccard readings in bench
  * logs are cold-start/machine noise (same query cold 7.5s, warm 3.3s).
  * Keep the two-column formulation.
  */
object ProfileJac {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    time("warmup")(graft.ops.GraphOps.edges(spark, sfDir).count())
    time("current graph_jaccard_nodes")(
      graft.SparkEntry.queries("graph_jaccard_nodes")(spark, sfDir).count())
    // variant: packed single-long pair key through the aggregation
    val adj = graft.ops.GraphOps.edges(spark, sfDir).select($"src", $"dst")
    val deg = adj.groupBy($"dst".as("p")).agg(count(lit(1)).as("d"))
    val adjd = adj.join(broadcast(deg), $"dst" === $"p").select($"src", $"dst", $"d")
    val packed = adjd.as("e1")
      .join(adjd.as("e2"), $"e1.src" === $"e2.src" && $"e1.dst" < $"e2.dst")
      .select((shiftleft($"e1.dst", 32) + $"e2.dst").as("pk"),
        $"e1.d".as("d1"), $"e2.d".as("d2"))
      .groupBy($"pk")
      .agg(count(lit(1)).as("common"), max($"d1").as("d1"), max($"d2").as("d2"))
      .select(shiftright($"pk", 32).as("p1"), ($"pk".bitwiseAND(0xffffffffL)).as("p2"),
        $"common", $"d1", $"d2")
      .withColumn("jac", round($"common" / ($"d1" + $"d2" - $"common"), 4))
      .orderBy($"jac".desc, $"p1", $"p2")
      .limit(20)
    time("packed-key variant")(packed.count())
    time("packed-key variant again")(packed.count())
    time("current again")(
      graft.SparkEntry.queries("graph_jaccard_nodes")(spark, sfDir).count())
    spark.stop()
  }
}
