package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Independent JVM cross-checks for round-14 operators (the SURVEY.md §5
  * two-witness discipline, same as Round11Spec..Round13Spec).
  */
class Round14Spec extends SparkSpec {

  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, sf)

  test("sink_gdpr_purge_deep: no purged key survives in ANY artifact file; control store untouched") {
    import spark.implicits._
    val report = q("sink_gdpr_purge_deep").collect()
      .map(r => r.getString(0) ->
        (r.getBoolean(1), r.getLong(2), r.getLong(3))).toMap
    assert(report.keySet === Set("journal", "mview_user_day", "edge_state",
      "mview_hourly"))
    // the artifact tree lives under the op's memoized scratch root — walk
    // EVERY store and prove the cohort is gone from each file tree
    // only THIS dataset's artifact dir (scratch persists across JVMs and
    // names are digest-keyed per dataset path)
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(sf.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val dirs = Seq(java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft-scratch",
      s"sink_gdpr_purge_deep_$digest").toString)
    assert(new java.io.File(dirs.head).isDirectory,
      "purge_deep artifact root not found")
    for (d <- dirs;
         store <- Seq("journal", "mview_user_day", "edge_state")) {
      val df = spark.read.parquet(s"$d/$store")
      assert(df.filter($"user_id" % 97 === 0).count() === 0L,
        s"purged keys survive in $store")
      assert(df.count() === report(store)._3, s"$store count vs report")
    }
    // the user-less control store keeps every row (hadKey = false path)
    for (d <- dirs) {
      assert(spark.read.parquet(s"$d/mview_hourly").count() ===
        report("mview_hourly")._2)
      assert(!report("mview_hourly")._1)
    }
    // report internal consistency: purged rows only from user-keyed stores
    assert(report("journal")._2 > report("journal")._3,
      "fixture has no purge cohort — user_id % 97 never 0?")
  }

  test("Gdpr.purgeArtifacts generalizes to ANY keyed store (doc-keyed signature copy)") {
    import spark.implicits._
    import graft.api.{Gdpr, TextPipeline}
    // copy the minhash signature frame into a private scratch store and
    // purge it by doc_id — the derived-index case the journal purge misses
    val sig = TextPipeline.minhashSignatures(
      Tables.documents(spark, sf), $"doc_id", $"text")
    val p = graft.Scratch.dir("spec_gdpr_sig_copy")
    sig.write.mode("overwrite").parquet(s"$p/sig")
    // a second, key-less store must be reported but never rewritten
    sig.groupBy($"n").count().write.mode("overwrite").parquet(s"$p/hist")
    val before = spark.read.parquet(s"$p/hist").collect()
      .map(_.toString).sorted.toSeq
    val res = Gdpr.purgeArtifacts(spark, Seq(s"$p/sig", s"$p/hist"),
      "doc_id", k => k % 5 === 0)
    val bySuffix = res.map(r => r.path.split('/').last -> r).toMap
    assert(bySuffix("sig").hadKey && !bySuffix("hist").hadKey)
    val after = spark.read.parquet(s"$p/sig")
    assert(after.filter($"doc_id" % 5 === 0).count() === 0L)
    assert(after.count() === bySuffix("sig").nAfter)
    assert(bySuffix("sig").nBefore === sig.count())
    // untouched store is bit-identical
    assert(spark.read.parquet(s"$p/hist").collect()
      .map(_.toString).sorted.toSeq === before)
  }
}
