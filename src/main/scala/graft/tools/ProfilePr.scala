package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: phase-by-phase cost of the integer PageRank iteration. */
object ProfilePr {
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
    val cp = time("copurchase")(graft.ops.GraphOps.copurchase(spark, sfDir).select($"a", $"b"))
    time("copurchase.count")(println("  cp rows = " + cp.count()))
    val both = cp.unionAll(cp.select($"b".as("a"), $"a".as("b")))
    val deg = both.groupBy($"a".as("v")).agg(count(lit(1)).as("deg"))
    val ed = time("ed.localCheckpoint") {
      both.join(deg, $"a" === $"v").select($"a".as("esrc"), $"b".as("edst"), $"deg")
        .localCheckpoint()
    }
    println("  ed rows = " + ed.count())
    var ranks = deg.select($"v".as("part"), lit(1000000000000L).as("r")).localCheckpoint()
    println("  ranks rows = " + ranks.count())
    for (i <- 1 to 10) {
      ranks = time(s"iter $i") {
        ed.join(broadcast(ranks), $"esrc" === $"part")
          .groupBy($"edst").agg(sum(expr("r div deg")).as("csum"))
          .select($"edst".as("part"), expr("csum * 85 div 100").as("r"))
          .localCheckpoint()
      }
    }
    spark.stop()
  }
}
