package graft.graph

import org.apache.spark.graphx.{Edge, Graph, VertexId}
import org.apache.spark.graphx.lib.ShortestPaths
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** The engine's ONLY GraphX import site (SURVEY.md §3.2): DataFrames in,
  * DataFrames out. Iterative whole-graph algorithms (Pregel supersteps) are
  * the one workload that genuinely leaves Catalyst — everything hop-bounded
  * stays in `ops.GraphOps` as joins.
  *
  * Scale posture: vertex/edge RDDs are built straight from the DataFrame's
  * partitions (no collect); Pregel shuffles per superstep like any RDD join,
  * so the same code runs on a 1000-executor cluster. Inputs are assumed
  * directed; callers double the edge list for undirected semantics where the
  * algorithm is direction-sensitive (SSSP, PageRank). GraphX's
  * ConnectedComponents is already direction-agnostic.
  */
object GraphBridge {

  /** (id) DF + (src, dst) DF -> GraphX graph. Long columns expected. */
  private def toGraph(vertices: DataFrame, edges: DataFrame): Graph[Int, Int] = {
    val vRDD = vertices.rdd.map(r => (r.getLong(0), 1))
    val eRDD = edges.rdd.map(r => Edge(r.getLong(0), r.getLong(1), 1))
    Graph(vRDD, eRDD, defaultVertexAttr = 1,
      edgeStorageLevel = StorageLevel.MEMORY_AND_DISK,
      vertexStorageLevel = StorageLevel.MEMORY_AND_DISK)
  }

  /** Connected components (undirected; GraphX propagates both ways).
    * Output (id, comp) where comp = min vertex id in the component — the
    * same labeling a min-label fixpoint (the DuckDB recursive oracle)
    * produces.
    */
  def connectedComponents(s: SparkSession, vertices: DataFrame, edges: DataFrame): DataFrame = {
    import s.implicits._
    toGraph(vertices, edges).connectedComponents()
      .vertices.map { case (id, comp) => (id, comp) }
      .toDF("id", "comp")
  }

  /** Unweighted shortest hop count from `src` (Pregel via ShortestPaths),
    * capped at `maxHops`. Pass a doubled edge list for undirected graphs.
    * Output (id, dist), reachable vertices only.
    */
  def shortestHops(s: SparkSession, vertices: DataFrame, edges: DataFrame,
                   src: Long, maxHops: Int): DataFrame = {
    import s.implicits._
    ShortestPaths.run(toGraph(vertices, edges), Seq(src))
      .vertices
      .flatMap { case (id, spmap) => spmap.get(src).map(d => (id, d.toLong)) }
      .toDF("id", "dist")
      .filter($"dist" <= maxHops)
  }

  /** Static PageRank, fixed iteration count (deterministic superstep count;
    * values still float-order sensitive, so callers must not oracle-check
    * raw ranks). Pass a doubled edge list for undirected graphs.
    * Output (id, rank).
    */
  def pageRank(s: SparkSession, vertices: DataFrame, edges: DataFrame,
               iters: Int, resetProb: Double = 0.15): DataFrame = {
    import s.implicits._
    toGraph(vertices, edges).staticPageRank(iters, resetProb)
      .vertices.map { case (id, r) => (id, r) }
      .toDF("id", "rank")
  }
}
