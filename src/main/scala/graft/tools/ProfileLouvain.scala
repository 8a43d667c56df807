package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.api.Ckpt._

/** Dev utility: sub-step cost of graph_louvain at bench parallelism —
  * separates the co-purchase build, the cpByKey, the degree/2m prep, each
  * move round, and the Q rollup (r15 optimization round: the louvain trio
  * is the #1 pinned family).
  */
object ProfileLouvain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("GRAFT_AQE", "true"))
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warmup (bench does the same)
    spark.range(1000).count()
    graft.Tables.lineitem(spark, sfDir).groupBy($"l_returnflag").count().count()
    for (rep <- 1 to 2) {
      println(s"== rep $rep")
      val t0 = System.nanoTime()
      val pairs = graft.ops.GraphOps.copurchase(spark, sfDir)
      val cp = pairs.select(col("a"), col("b"), col("w"))
      val both = time("cpByKey(both)")(graft.api.Ckpt.cpByKey(
        cp.unionAll(cp.select(col("b").as("a"), col("a").as("b"), col("w"))),
        col("a")))
      val deg = time("deg cp()")(
        both.groupBy(col("a").as("id")).agg(sum(col("w")).as("k")).cp())
      val m2 = cp.agg((sum(col("w")) * 2).as("m2"))
      var labels = time("labels cp()")(
        graft.Tables.part(spark, sfDir).select($"p_partkey".as("part"))
          .select(col("part").as("id"), col("part").as("c"))
          .join(deg, Seq("id"), "left")
          .select(col("id"), col("c"), coalesce(col("k"), lit(0L)).as("k"))
          .cp())
      val nV = time("labels count")(labels.count())
      val dec = (x: org.apache.spark.sql.Column) => x.cast("decimal(19,0)")
      val dec38 = (x: org.apache.spark.sql.Column) => x.cast("decimal(38,0)")
      for (r <- 1 to 3) {
        labels = time(s"round $r") {
          val tot = labels.groupBy(col("c")).agg(sum(col("k")).as("tot"))
          val kic = both
            .join(graft.api.GraphAlgebra.hintedFrame(
              labels.select(col("id").as("b"), col("c").as("nc")), nV), Seq("b"))
            .groupBy(col("a").as("id"), col("nc"))
            .agg(sum(col("w")).as("kic"))
          val folded = kic
            .join(graft.api.GraphAlgebra.hintedFrame(labels, nV), Seq("id"))
            .join(graft.api.GraphAlgebra.hintedFrame(
              tot.select(col("c").as("nc"), col("tot").as("tot_c")), nV), Seq("nc"))
            .crossJoin(broadcast(m2))
            .groupBy(col("id"), col("c"), col("k"), col("m2"))
            .agg(
              max(when(col("nc") =!= col("c"),
                struct((dec38(col("m2")) * dec(col("kic")) -
                  dec38(col("k")) * dec(col("tot_c"))).as("score"),
                  (-col("nc")).as("neg")))).as("m"),
              max(when(col("nc") === col("c"), col("kic"))).as("kia"))
          val scored = folded
            .filter(col("m").isNotNull)
            .join(graft.api.GraphAlgebra.hintedFrame(
              tot.select(col("c"), col("tot").as("tot_a")), nV), Seq("c"))
            .filter(col("m.score") >
              dec38(col("m2")) * dec(coalesce(col("kia"), lit(0L))) -
                dec38(col("k")) * (dec(col("tot_a")) - dec(col("k"))))
            .select(col("id"), (-col("m.neg")).as("newc"))
          labels.join(scored, Seq("id"), "left")
            .select(col("id"), coalesce(col("newc"), col("c")).as("c"), col("k"))
            .cp()
        }
      }
      println(f"total: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
