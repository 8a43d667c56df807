package graft.tools

import org.apache.spark.sql.SparkSession

/** Cold-vs-warm probe for the memoized kNN-graph ANN: first invocation
  * pays the offline graph build, the second serves from the JVM memo —
  * the split Bench's warmup relies on.
  */
object ProfileKnn {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String): Unit = {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries("llm_ann_knngraph")(spark, dir).collect().length
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    time("cold")
    time("warm")
    time("warm2")
    spark.stop()
  }
}
