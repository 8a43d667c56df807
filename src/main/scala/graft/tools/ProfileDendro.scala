package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timing probe for graph_louvain_dendro (r14 bench outlier). */
object ProfileDendro {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.api.GraphAlgebra._
    import graft.api.Ckpt._
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val verts = spark.read.parquet(s"$dir/part.parquet")
      .select(col("p_partkey").as("part"))
    val pairs = t("copurchase cp")(
      graft.ops.GraphOps.copurchase(spark, dir).cp())
    val l1 = t("level1 moves")(louvainMoves(verts, pairs, 3).cp())
    val (e2, s2, v2) = t("coarsen1") {
      val r = louvainCoarsen(pairs, None, l1)
      (r._1.cp(), r._2.cp(), r._3.cp())
    }
    println("coarse sizes: " + e2.count() + " edges, " + v2.count() + " verts")
    val l2 = t("level2 moves")(louvainMoves(v2, e2, 3, selfLoops = Some(s2)).cp())
    t("converged check")(l2.filter(col("community") =!= col("id")).isEmpty)
    val (e3, s3, v3) = t("coarsen2") {
      val r = louvainCoarsen(e2, Some(s2), l2)
      (r._1.cp(), r._2.cp(), r._3.cp())
    }
    println("coarse2 sizes: " + e3.count() + " edges, " + v3.count() +
      " verts, self " + s3.count())
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val l3x = t("level3 r3 NO codegen")(louvainMoves(v3, e3, 3, selfLoops = Some(s3)).cp())
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val l3y = t("level3 r3 NO AQE")(louvainMoves(v3, e3, 3, selfLoops = Some(s3)).cp())
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    val l3 = t("level3 moves r3")(louvainMoves(v3, e3, 3, selfLoops = Some(s3)).cp())
    t("dendro join + sort") {
      l1.select(col("id"), col("community").as("c1"))
        .join(l2.select(col("id").as("c1"), col("community").as("c2")), Seq("c1"))
        .join(l3.select(col("id").as("c2"), col("community").as("c3")), Seq("c2"))
        .orderBy("id").collect().length
    }
    spark.stop()
  }
}
