package graft.api

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Ckpt._

/** Right-to-be-forgotten sweep across a deployment's PERSISTED artifacts —
  * the compliance reality at 100 TB: purging the source journal is not
  * enough; every DERIVED store (materialized views, per-entity state,
  * signature/feature indexes, scratch round-trips) that carries the
  * subject's key must be rewritten too, or the data outlives the request.
  *
  * The sweep is schema-driven: each path is read, and a dataset is
  * rewritten only when it actually carries the key column — so one purge
  * call can be pointed at a whole artifact tree without per-store wiring.
  * Rewrites filter-and-overwrite in place (the frame is eagerly
  * materialized first, so reading and overwriting the same path cannot
  * self-conflict); partitioned stores keep their layout because the
  * filter prunes row groups, not directories. Cost per store tracks the
  * store's own size — the journal dominates, the derived stores are
  * rollup-sized.
  */
object Gdpr {

  /** Purge result for one artifact path. */
  case class PurgeResult(path: String, hadKey: Boolean, nBefore: Long,
                         nAfter: Long)

  /** Rewrite one parquet dataset dropping every row where `pred` holds.
    * Returns (rowsBefore, rowsAfter). The caller owns transactionality:
    * this is an overwrite, crash-safe at the parquet-commit level only.
    */
  def purgePath(s: SparkSession, path: String, pred: Column): (Long, Long) = {
    val df = s.read.parquet(path)
    val keep = df.filter(!pred).cp()
    val (before, after) = (df.count(), keep.count())
    keep.write.mode("overwrite").parquet(path)
    (before, after)
  }

  /** Sweep `paths`, purging rows where `keyCol` satisfies `pred` from
    * every dataset that carries that column; datasets without the column
    * are reported untouched (hadKey = false), never rewritten.
    */
  def purgeArtifacts(s: SparkSession, paths: Seq[String], keyCol: String,
                     pred: Column => Column): Seq[PurgeResult] =
    paths.map { p =>
      val df = s.read.parquet(p)
      if (df.columns.contains(keyCol)) {
        val (b, a) = purgePath(s, p, pred(col(keyCol)))
        PurgeResult(p, hadKey = true, b, a)
      } else PurgeResult(p, hadKey = false, df.count(), df.count())
    }
}
