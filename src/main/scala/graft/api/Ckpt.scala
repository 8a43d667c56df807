package graft.api

import org.apache.spark.sql.{Column, DataFrame}

/** Lineage truncation for the iterative family (PageRank/HITS/eigen/CC/
  * k-core/SSSP loops and the multi-consumer frames of the pair ops).
  *
  * Default is `localCheckpoint()`: eager, no configuration, and the right
  * cost model on the local harness — but it pins RDD blocks to the
  * executors that computed them, so a lost executor loses the lineage-
  * truncated state with no way to recompute it. That is the wrong
  * durability story for a multi-hour 100 TB cluster run. Setting
  * `-Dgraft.checkpoint.dir=<hdfs-or-dfs-path>` switches every call site to
  * RELIABLE `checkpoint()` into that directory (the SparkContext checkpoint
  * dir is initialized lazily from the property on first use): executor loss
  * then costs a re-read from the DFS, not a job failure. Results are
  * bit-identical on either path — both truncate lineage; only the storage
  * contract changes (ApiSpec pins one iterative op across the two paths).
  */
object Ckpt {

  /** Reliable-checkpoint directory, if the deployment set one.
    *
    * Cleanup contract: `SparkContext.setCheckpointDir` creates a fresh
    * UUID subdirectory under this path per JVM, and checkpointed data
    * accumulates there for the life of the application. A long-running
    * deployment should either enable
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (best-effort
    * GC-driven deletion) or sweep the directory between runs.
    */
  def dir: Option[String] = sys.props.get("graft.checkpoint.dir")

  /** The `graft.checkpoint.dir` value this object last applied to the
    * SparkContext — lets [[CkptOps.cp]] notice when the context's dir was
    * set by someone else (a test, the deployment) or when the property
    * changed, instead of silently deferring to a stale dir.
    */
  @volatile private var appliedDir: Option[String] = None

  /** Checkpoint `df` hash-partitioned on `cols`, PRESERVING the
    * partitioning in the checkpointed plan — the iterative family's
    * pre-partitioning primitive (each loop step's aggregation then
    * inherits the clustering through a broadcast join and runs
    * exchange-free; ScaleSpec pins the mechanism).
    *
    * Why AQE is scoped off for the materialization: a checkpointed
    * Dataset captures `executedPlan.outputPartitioning`, and under AQE
    * that node is the adaptive wrapper, whose partitioning is UNKNOWN at
    * capture time — the checkpoint then silently forgets the layout and
    * every iteration re-inserts the exchange this call exists to hoist
    * (verified empirically: the ScaleSpec mechanism test fails with a
    * re-inserted `Exchange hashpartitioning` if the frame materializes
    * adaptively). With AQE off for just this eager materialization the
    * physical plan is a plain shuffle whose HashPartitioning survives the
    * capture; the loop's state frames still plan adaptively.
    */
  def cpByKey(df: DataFrame, cols: Column*): DataFrame =
    // serialized on this object: the AQE toggle is session-global, so two
    // concurrent cpByKey calls could otherwise clobber each other's
    // restore value. Queries planned concurrently on the same session by
    // OTHER threads still see AQE off for the duration of this eager
    // materialization — callers sharing a session across threads should
    // not plan during cpByKey (the registry's ops are single-threaded per
    // query, so the harness never hits this).
    Ckpt.synchronized {
      val conf = df.sparkSession.conf
      val old = conf.get("spark.sql.adaptive.enabled")
      conf.set("spark.sql.adaptive.enabled", "false")
      try new CkptOps(df.repartition(cols: _*)).cp()
      finally conf.set("spark.sql.adaptive.enabled", old)
    }

  implicit class CkptOps(private val df: DataFrame) extends AnyVal {

    /** Eager lineage truncation: `localCheckpoint()` by default, reliable
      * `checkpoint()` under `-Dgraft.checkpoint.dir` (see [[Ckpt]]).
      */
    def cp(): DataFrame = Ckpt.dir match {
      case Some(d) =>
        val sc = df.sparkSession.sparkContext
        // (re-)apply whenever the configured dir is not the one THIS
        // object applied — a dir pre-set by a test or the deployment must
        // not silently override -Dgraft.checkpoint.dir. getCheckpointDir
        // can't be compared directly (setCheckpointDir appends a UUID
        // subdir), hence the appliedDir bookkeeping.
        Ckpt.synchronized {
          if (!Ckpt.appliedDir.contains(d) || sc.getCheckpointDir.isEmpty) {
            sc.setCheckpointDir(d)
            Ckpt.appliedDir = Some(d)
          }
        }
        df.checkpoint()
      case None => df.localCheckpoint()
    }
  }
}
