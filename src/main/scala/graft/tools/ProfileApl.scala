package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.api.Ckpt._

/** Dev utility: sub-step cost of graph_avg_path_length and
  * graph_eigencentrality (the two rows pinned 2× low since r13) at bench
  * parallelism — separates the co-purchase build, the checkpoint, and the
  * per-iteration traversal cost.
  */
object ProfileApl {
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
    val cp = graft.ops.GraphOps.copurchase(spark, sfDir).select($"a", $"b")
    val both = cp.unionAll(cp.select($"b".as("a"), $"a".as("b")))
    time("warm copurchaseBoth.count")(both.count())
    for (round <- 1 to 2) {
      val adj = time(s"r$round adj cp()")(both.cp())
      val lm8 = graft.Tables.part(spark, sfDir).select($"p_partkey")
        .orderBy($"p_partkey").limit(8).select($"p_partkey".as("src"))
      var dist = time(s"r$round seed cp()")(
        lm8.select($"src", $"src".as("id"), lit(0L).as("dist")).cp())
      var frontier = dist.select($"src", $"id")
      var n = frontier.count()
      var h = 1L
      while (h <= 6 && n > 0) {
        val next = time(s"r$round hop $h expand+anti") {
          adj.join(broadcast(frontier.withColumnRenamed("id", "idf")),
              $"a" === $"idf")
            .select($"src", $"b".as("id")).distinct()
            .join(dist.select($"src", $"id"), Seq("src", "id"), "left_anti")
            .cp()
        }
        n = time(s"r$round hop $h count")(next.count())
        println(s"  frontier=$n")
        if (n > 0) {
          dist = time(s"r$round hop $h fold")(
            dist.unionAll(next.select($"src", $"id", lit(h).as("dist"))).cp())
          frontier = next.select($"src", $"id")
          h += 1
        }
      }
    }
    spark.stop()
  }
}
