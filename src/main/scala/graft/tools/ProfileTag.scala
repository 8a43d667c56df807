package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: phase cost of graph_tag_similarity at bench parallelism. */
object ProfileTag {
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
    time("warmup")(graft.Tables.lineitem(spark, sfDir).count())
    val cohort = graft.Tables.customer(spark, sfDir)
      .filter($"c_nationkey" === 1).select($"c_custkey")
    time("cohort")(println("  n = " + cohort.count()))
    val tags = graft.Tables.orders(spark, sfDir)
      .join(graft.Tables.lineitem(spark, sfDir), $"l_orderkey" === $"o_orderkey")
      .join(cohort, $"o_custkey" === $"c_custkey")
      .join(broadcast(graft.Tables.part(spark, sfDir).select($"p_partkey", $"p_brand")),
        $"l_partkey" === $"p_partkey")
      .groupBy($"o_custkey".as("cust"), $"p_brand".as("tag"))
      .agg(sum($"l_quantity").cast("long").as("w"))
    time("tags agg")(println("  tags = " + tags.count()))
    val maps = tags.groupBy($"cust")
      .agg(map_from_entries(collect_list(struct($"tag", $"w"))).as("m"))
    time("maps")(println("  maps = " + maps.count()))
    val pairs = maps.as("t1").join(broadcast(maps.as("t2")), $"t1.cust" < $"t2.cust")
      .select($"t1.cust".as("c1"), $"t2.cust".as("c2"),
        aggregate(
          map_values(map_zip_with($"t1.m", $"t2.m",
            (_, v1, v2) => coalesce(v1, lit(0L)) * coalesce(v2, lit(0L)))),
          lit(0L), (acc, x) => acc + x).as("dot"))
      .filter($"dot" > 0)
    time("pairs+dot+topk")(pairs.orderBy($"dot".desc, $"c1", $"c2").limit(20).collect())
    time("full op")(graft.SparkEntry.queries("graph_tag_similarity")(spark, sfDir).count())
    spark.stop()
  }
}
