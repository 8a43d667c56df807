package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: sub-step cost of graph_mst_boruvka at bench parallelism —
  * separates the co-purchase build, the cp() materialization, the pairMin
  * collapse, the collect, and the local Kruskal.
  */
object ProfileMst {
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
    val cp = graft.ops.GraphOps.copurchase(spark, sfDir)
    time("copurchase.count")(println("  edges=" + cp.count()))
    val neg = cp.select($"a", $"b", (-$"w").as("w"))
    import graft.api.Ckpt._
    val e = time("e cp()")(
      neg.select($"a", $"b", $"w".cast("long").as("w")).cp())
    val lab = time("lab cp()")(
      e.select($"a".as("v")).unionAll(e.select($"b".as("v")))
        .distinct().select($"v", $"v".as("c")).cp())
    time("lab.count")(println("  verts=" + lab.count()))
    val el = e
      .join(lab.select($"v".as("a2"), $"c".as("ca")), $"a" === $"a2")
      .join(lab.select($"v".as("b2"), $"c".as("cb")), $"b" === $"b2")
      .filter($"ca" =!= $"cb")
    val k = struct($"w", $"a", $"b", $"ca", $"cb")
    val pairMin = el
      .select(least($"ca", $"cb").as("pa"), greatest($"ca", $"cb").as("pb"),
        k.as("k"))
      .groupBy($"pa", $"pb").agg(min($"k").as("k"))
      .select($"k.w".as("w"), $"k.a".as("a"), $"k.b".as("b"),
        $"k.ca".as("ca"), $"k.cb".as("cb"))
    val pm = time("pairMin cp()")(pairMin.cp())
    time("pairMin.count")(println("  pairs=" + pm.count()))
    val rows = time("collect")(
      pm.select($"w", $"a", $"b", $"ca", $"cb").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))))
    time("sort+kruskal") {
      val sorted = rows.sortBy { case (w, a, b, _, _) => (w, a, b) }
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      var n = 0
      sorted.foreach { case (_, _, _, ca, cb) =>
        val (ra, rb) = (find(ca), find(cb))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb; n += 1 }
      }
      println("  forest=" + n)
    }
    spark.stop()
  }
}
