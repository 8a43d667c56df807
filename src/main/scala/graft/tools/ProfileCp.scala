package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: sub-step cost of the co-purchase build at bench parallelism. */
object ProfileCp {
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
    val li = graft.Tables.lineitem(spark, sfDir)
    time("warm scan")(li.count())
    time("scan again")(li.count())
    val lp = li.select($"l_orderkey".as("ok"), $"l_partkey".as("p")).distinct()
    time("distinct")(println("  lp = " + lp.count()))
    time("distinct again")(lp.count())
    val pairs = lp.as("x").join(lp.as("y"), $"x.ok" === $"y.ok" && $"x.p" < $"y.p")
    time("self-join")(println("  pairs = " + pairs.count()))
    val cp = pairs.groupBy($"x.p".as("a"), $"y.p".as("b")).agg(count(lit(1)).as("w"))
    time("full copurchase")(println("  cp = " + cp.count()))
    time("full copurchase again")(cp.count())
    cp.explain("formatted")
  }
}
