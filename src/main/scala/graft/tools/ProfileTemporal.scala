package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.api.Ckpt._

/** Sub-step cost of graph_temporal_reach at bench parallelism (r16: the
  * op is top-4 in the sweep; VERDICT #7 asks for a first-touch-stream
  * profile before any restructure).
  */
object ProfileTemporal {
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
    spark.range(1000).count()
    graft.Tables.lineitem(spark, sfDir).groupBy($"l_returnflag").count().count()
    for (rep <- 1 to 2) {
      println(s"== rep $rep")
      val events = graft.Tables.events(spark, sfDir)
      time("events scan count")(events.count())
      val txRaw = events
        .select($"user_id".as("u"),
          get_json_object($"props", "$.k").cast("long").as("item"),
          unix_millis($"ts").as("ms"))
        .filter($"item".isNotNull)
        .groupBy($"item", $"u").agg(min($"ms").as("ms"))
      val tx = time("tx rollup cp")(txRaw.cp())
      val g1 = time("budget gate agg (first row)")(
        graft.api.PairBudget.gate(tx, Seq($"item"),
          "graph_temporal_reach", "graph_temporal_density"))
      val joined = g1.as("a")
        .join(tx.as("b"), $"a.item" === $"b.item" &&
          $"b.ms" > $"a.ms" && $"b.ms" <= $"a.ms" + 604800000L &&
          $"a.u" =!= $"b.u")
        .groupBy($"a.u".as("user_id"), $"b.u".as("bu"))
        .agg(count(lit(1)).as("np"))
      time("pair join + (a,b) agg")(joined.count())
      val fin = joined
        .groupBy($"user_id")
        .agg(count(lit(1)).as("reach"), sum($"np").as("n_paths"))
        .orderBy($"reach".desc, $"n_paths".desc, $"user_id")
        .limit(20)
      time("full op count")(fin.count())
    }
    spark.stop()
  }
}
