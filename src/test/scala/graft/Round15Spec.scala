package graft

import org.apache.spark.sql.functions._

/** Independent JVM cross-checks for round-15 work (the SURVEY.md §5
  * two-witness discipline, same as Round11Spec..Round14Spec).
  */
class Round15Spec extends SparkSpec {

  test("Gdpr.purgePath keeps NULL-key rows (purge deletes exactly pred IS TRUE)") {
    import spark.implicits._
    import graft.api.Gdpr
    val p = graft.Scratch.dir("spec_gdpr_null_keys")
    // 3 purgeable keys, 4 survivors, 2 NULL-key rows — the nulls are NOT
    // in the requested cohort and must survive the rewrite (ADVICE r14:
    // !pred over a NULL pred used to silently drop them)
    Seq[(java.lang.Long, String)]((0L, "a"), (5L, "b"), (10L, "c"),
      (1L, "d"), (2L, "e"), (3L, "f"), (4L, "g"),
      (null, "h"), (null, "i"))
      .toDF("user_id", "payload")
      .write.mode("overwrite").parquet(s"$p/store")
    val (before, after) = Gdpr.purgePath(spark, s"$p/store",
      col("user_id") % 5 === 0)
    assert(before === 9L && after === 6L)
    val left = spark.read.parquet(s"$p/store")
    assert(left.filter($"user_id".isNull).count() === 2L,
      "NULL-key rows must survive a keyed purge")
    assert(left.filter($"user_id" % 5 === 0).count() === 0L)
  }

  test("Gdpr.purgePath crash windows: store survives interruption on either side of the swap") {
    import spark.implicits._
    import graft.api.Gdpr
    import org.apache.hadoop.fs.Path
    val p = graft.Scratch.dir("spec_gdpr_crash")
    val fs = new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def write(rows: Seq[(Long, String)], where: String): Unit =
      rows.toDF("user_id", "payload").write.mode("overwrite").parquet(where)
    val full = Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d"))

    // window 1: crash AFTER the temp store is fully committed but BEFORE
    // the target delete — simulated as: complete tmp + intact target.
    // The next purge must discard the stale tmp and redo from the
    // untouched original (never double-apply or lose rows).
    write(full, s"$p/store")
    write(full.filter(_._1 != 0L), s"$p/store.purge-tmp")
    val (b1, a1) = Gdpr.purgePath(spark, s"$p/store", col("user_id") === 1L)
    assert(b1 === 4L && a1 === 3L)
    assert(spark.read.parquet(s"$p/store").select("user_id")
      .as[Long].collect().sorted.toSeq === Seq(0L, 2L, 3L))

    // window 2: crash BETWEEN the target delete and the rename —
    // simulated as: complete tmp, MISSING target. The recovery step must
    // finish the swap; the purge then applies on the recovered store.
    write(full.filter(_._1 != 3L), s"$p/store2.purge-tmp")
    assert(!fs.exists(new Path(s"$p/store2")))
    val (b2, a2) = Gdpr.purgePath(spark, s"$p/store2", col("user_id") === 2L)
    assert(b2 === 3L && a2 === 2L, "recovery must surface the committed tmp")
    assert(spark.read.parquet(s"$p/store2").select("user_id")
      .as[Long].collect().sorted.toSeq === Seq(0L, 1L))
    assert(!fs.exists(new Path(s"$p/store2.purge-tmp")))
  }
}
