package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: break down the GraphX-op cost — co-purchase build vs
  * RDD conversion + Pregel.
  */
object ProfileGraph {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    time("copurchase.count")(graft.ops.GraphOps.copurchase(spark, sfDir).count())
    time("copurchase.count (2nd)")(graft.ops.GraphOps.copurchase(spark, sfDir).count())
    time("graph_pagerank")(graft.SparkEntry.queries("graph_pagerank")(spark, sfDir).count())
    time("graph_sssp")(graft.SparkEntry.queries("graph_sssp")(spark, sfDir).count())
    time("graph_cc")(graft.SparkEntry.queries("graph_cc")(spark, sfDir).count())
    spark.stop()
  }
}
