package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expr.FloatVec

/** Public similarity-search API over any (id, array<float> embedding)
  * frame. Norms are computed once per row; every pair evaluation is one
  * codegen'd float_dot. `ops.LlmOps` instantiates these over the
  * `embeddings` fixture.
  */
object VectorIndex {

  /** (id, embedding, nrm): the indexed form — compute once, reuse. */
  def index(vecs: DataFrame, id: Column, embedding: Column): DataFrame =
    vecs.select(id.as("vec_id"), embedding.as("embedding"))
      .withColumn("nrm", sqrt(FloatVec.floatDot(col("embedding"), col("embedding"))))

  /** Exact top-k cosine neighbors of the probe id (brute force over the
    * index; probe is a broadcast single row).
    */
  def topK(indexed: DataFrame, probeId: Long, k: Int): DataFrame = {
    val probe = indexed.filter(col("vec_id") === probeId)
      .select(col("embedding").as("pe"), col("nrm").as("pn"))
    indexed.filter(col("vec_id") =!= probeId).crossJoin(broadcast(probe))
      .select(col("vec_id"),
        round(FloatVec.floatDot(col("embedding"), col("pe")) / (col("nrm") * col("pn")), 4)
          .as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** All-pairs cosine ≥ tau within blocks (the blocking column bounds the
    * pair space — label, cluster id, LSH band…).
    */
  def simJoin(indexed: DataFrame, block: DataFrame, tau: Double): DataFrame = {
    val e = indexed.join(block, "vec_id")
    e.as("x").join(e.as("y"),
        col("x.block") === col("y.block") && col("x.vec_id") < col("y.vec_id"))
      .withColumn("rcos", round(
        FloatVec.floatDot(col("x.embedding"), col("y.embedding")) /
          (col("x.nrm") * col("y.nrm")), 4))
      .filter(col("rcos") >= tau)
      .select(col("x.vec_id").as("p1"), col("y.vec_id").as("p2"),
        col("x.block").as("block"), col("rcos").as("cos"))
  }

  /** IVF assignment: nearest centroid per vector (centroids = a small
    * indexed frame with cid/ce/cn columns; broadcast).
    */
  def ivfAssign(indexed: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cid"))
    indexed.crossJoin(broadcast(centroids))
      .withColumn("ccos", round(
        FloatVec.floatDot(col("embedding"), col("ce")) / (col("nrm") * col("cn")), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cid"), col("embedding"), col("nrm"))
  }

  /** Cluster-pruned ANN: search the probe's cluster only. */
  def ivfSearch(assigned: DataFrame, probeId: Long, k: Int): DataFrame = {
    val probe = assigned.filter(col("vec_id") === probeId)
      .select(col("cid").as("pcid"), col("embedding").as("pe"), col("nrm").as("pn"))
    assigned.join(broadcast(probe), col("cid") === col("pcid"))
      .filter(col("vec_id") =!= probeId)
      .select(col("vec_id"), col("cid").cast("long").as("cid"),
        round(FloatVec.floatDot(col("embedding"), col("pe")) / (col("nrm") * col("pn")), 4)
          .as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }
}
