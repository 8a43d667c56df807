package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expr.FloatVec

class LlmSpec extends SparkSpec {

  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, sf)

  test("FloatDot: matches an independent double fold, interpreted and codegen'd") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sf).limit(20)
      .withColumn("fast", FloatVec.floatDot($"embedding", $"embedding"))
      .withColumn("slow", expr(
        "aggregate(embedding, CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"))
    e.collect().foreach { r =>
      assert(r.getDouble(r.fieldIndex("fast")) === r.getDouble(r.fieldIndex("slow")))
    }
  }

  test("float_dot registers as a SQL function") {
    FloatVec.register(spark)
    Tables.embeddings(spark, sf).createOrReplaceTempView("emb_sql")
    val n = spark.sql(
      "SELECT float_dot(embedding, embedding) AS d FROM emb_sql WHERE vec_id < 5")
      .collect()
    assert(n.length === 5 && n.forall(_.getDouble(0) > 0))
  }

  test("llm_dedup_exact is idempotent: dedup of deduped keep-set is itself") {
    val once = q("llm_dedup_exact").collect()
    assert(once.length === once.map(_.getString(1)).distinct.length)
    assert(once.map(r => r.getLong(r.fieldIndex("n_dups"))).forall(_ >= 1))
  }

  test("llm_dedup_minhash candidates are a superset of high-jaccard near pairs") {
    // every j >= 0.6 pair (near) must also be caught by MinHash-LSH at >= 0.5
    val near = q("llm_dedup_near").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = q("llm_dedup_minhash").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = near.diff(mh)
    assert(missed.isEmpty, s"LSH missed high-sim pairs: $missed")
  }

  test("llm_dedup_cluster from banded candidates equals clustering the exact edges") {
    import spark.implicits._
    // the op consumes banded-minhash candidate edges (the 100 TB shape);
    // pin it to the clustering of the brute-force exact >= 0.6 edge set —
    // a band-miss on any real near-dup pair would split a component here
    val exactEdges = q("llm_dedup_near")
      .select($"d1".as("a"), $"d2".as("b"))
    val vertices = Tables.documents(spark, sf).select($"doc_id".as("part"))
    val expected = api.GraphAlgebra.connectedComponentsDf(vertices, exactEdges)
      .select($"id", $"comp").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val got = q("llm_dedup_cluster").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got === expected)
  }

  test("llm_dedup_simhash: near-identical docs have small hamming distance") {
    import spark.implicits._
    val sim = q("llm_dedup_simhash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the known near-dup pairs (jaccard >= 0.6) should sit close in simhash space
    val near = q("llm_dedup_near").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(near.nonEmpty)
    val dists = near.map { case (a, b) => java.lang.Long.bitCount(sim(a) ^ sim(b)) }
    assert(dists.count(_ <= 12) >= dists.length / 2,
      s"simhash distances of near-dups too large: ${dists.toSeq}")
  }

  test("llm_sim_search: cosine in [-1,1], self excluded, descending") {
    val rows = q("llm_sim_search").collect()
    assert(rows.length === 10)
    val cs = rows.map(r => r.getDouble(r.fieldIndex("cos")))
    assert(cs.forall(c => c >= -1.0001 && c <= 1.0001))
    assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    assert(!rows.map(_.getLong(0)).contains(0L))
  }

  test("llm_sim_join: pairs symmetric-canonical and above threshold") {
    q("llm_sim_join").collect().foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(r.fieldIndex("cos")) >= 0.3)
    }
  }

  test("llm_ann_ivf: returns 5 cluster-local neighbors of the probe") {
    val rows = q("llm_ann_ivf").collect()
    assert(rows.length === 5)
    assert(rows.map(r => r.getLong(r.fieldIndex("cid"))).distinct.length === 1)
  }

  test("llm_ann_knngraph: recall at least IVFPQ's at the same shortlist, exact cosines, deterministic") {
    import spark.implicits._
    val rows = q("llm_ann_knngraph").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    assert(rows.length === 5)
    // cosines are the EXACT scores, descending with the declared tie order
    val byScore = rows.map(t => (-t._2, t._1))
    assert(byScore.zip(byScore.tail).forall { case (a, b) =>
      a._1 < b._1 || (a._1 == b._1 && a._2 < b._2) })
    import graft.expr.FloatVec
    val e = graft.api.VectorIndex.index(
      Tables.embeddings(spark, sf), $"vec_id", $"embedding")
    val probe = e.filter($"vec_id" === 42)
      .select($"embedding".as("pe"), $"nrm".as("pn"))
    val exact = e.crossJoin(broadcast(probe)).filter($"vec_id" =!= 42)
      .select($"vec_id", round(FloatVec.floatDot($"embedding", $"pe") /
        ($"nrm" * $"pn"), 6).as("cos"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { case (id, cos, _) => assert(cos === exact(id)) }
    // the graph tier's bar: recall@5 vs the exact top-10 at least matches
    // llm_ann_ivfpq's first-5 shortlist rows on the same corpus
    val exact10 = exact.toSeq.sortBy(t => (-t._2, t._1)).take(10)
      .map(_._1).toSet
    rows.foreach { case (id, _, flag) => assert(flag === exact10(id)) }
    val recallKnn = rows.count(_._3).toDouble / 5.0
    val ivfpq5 = q("llm_ann_ivfpq").collect().take(5)
    val recallIvfPq = ivfpq5.map(r =>
      r.getLong(r.fieldIndex("in_exact10"))).sum.toDouble / 5.0
    assert(recallKnn >= recallIvfPq,
      s"kNN-graph recall $recallKnn < IVFPQ shortlist-5 recall $recallIvfPq")
    // run-to-run determinism (memoized graph + deterministic beam)
    assert(q("llm_ann_knngraph").collect().map(_.toString).toSeq ===
      rows.map(t => s"[${t._1},${t._2},${t._3}]").toSeq)
    // the memoized graph artifact respects the declared out-degree cap
    val g = graft.ops.LlmOps.knnGraphFor(spark, sf)
    val deg = g.groupBy($"src").count().agg(max("count")).head().getLong(0)
    assert(deg <= 12L)
  }

  test("llm_tfidf_topk: 3 ranked terms per source, scores descending in rank") {
    val rows = q("llm_tfidf_topk").collect()
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.length === 3)
      val byRank = rs.sortBy(_.getLong(rs.head.fieldIndex("rnk")))
      val scores = byRank.map(_.getDouble(byRank.head.fieldIndex("score")))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("llm_quality_score: ratios are in [0,1] and quality bounded") {
    q("llm_quality_score").collect().foreach { r =>
      val sr = r.getDouble(r.fieldIndex("stop_ratio"))
      val quality = r.getDouble(r.fieldIndex("quality"))
      assert(sr >= 0 && sr <= 1)
      assert(quality >= 0 && quality <= 1.0001)
    }
  }

  test("llm_repetition_filter: signals recompute exactly in the JVM per document") {
    import spark.implicits._
    val byId = q("llm_repetition_filter").collect()
      .map(r => r.getLong(r.fieldIndex("doc_id")) -> r).toMap
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(_._2.split(" ", -1).length >= 3)
    assert(byId.size === docs.length)
    for ((id, text) <- docs.take(60)) {
      val ts = text.split(" ", -1).toSeq
      val nt = ts.length.toLong
      val b2 = ts.sliding(2).map(_.mkString(" ")).toSeq
      val b3 = ts.sliding(3).map(_.mkString(" ")).toSeq
      val dup2 = (b2.length - b2.distinct.length).toLong
      val dup3 = (b3.length - b3.distinct.length).toLong
      val topw = ts.groupBy(identity).values.map(_.length).max.toLong
      val r = byId(id)
      assert(r.getLong(r.fieldIndex("nt")) === nt)
      assert(r.getLong(r.fieldIndex("dup2")) === dup2, s"doc $id")
      assert(r.getLong(r.fieldIndex("dup3")) === dup3, s"doc $id")
      assert(r.getLong(r.fieldIndex("topw")) === topw, s"doc $id")
      val expectFlag = if (dup2 * 5 > nt - 1 || topw * 10 > nt * 3) 1L else 0L
      assert(r.getLong(r.fieldIndex("repetitive")) === expectFlag, s"doc $id")
      assert(r.getDouble(r.fieldIndex("dup2_frac")) ===
        math.floor(dup2.toDouble / (nt - 1) * 10000.0 + 0.5) / 10000.0)
    }
  }

  test("llm_winnowing: fingerprints recompute exactly in the JVM (window-min selection)") {
    import spark.implicits._
    val got = q("llm_winnowing").collect()
      .groupBy(r => r.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(_._2.split(" ", -1).length >= 6)
    assert(got.size === docs.length)
    for ((id, text) <- docs.take(60)) {
      val ts = text.split(" ", -1).toSeq
      val hs = ts.sliding(3).map { kg =>
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(kg.mkString(" ").getBytes("UTF-8"))
        java.lang.Long.parseLong(md5.take(4).map(b => f"$b%02x").mkString, 16)
      }.toSeq
      val expect = hs.sliding(4).map(_.min).toSet
      assert(got(id) === expect, s"doc $id")
    }
  }

  test("llm_importance_resample: selection matches the JVM threshold recompute") {
    import spark.implicits._
    val kept = q("llm_importance_resample").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val docs = Tables.documents(spark, sf).select($"doc_id", $"source", $"n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySrc = docs.groupBy(_._2)
    val wq = bySrc.view.mapValues(ds =>
      math.floor(math.sqrt(ds.map(_._3).sum.toDouble) * 1000.0 + 0.5).toLong).toMap
    val swq = wq.values.sum
    val nd = docs.length.toLong
    val thr = bySrc.view.mapValues { ds =>
      val r = math.min(1.0,
        (nd / 2.0) * (wq(ds.head._2).toDouble / swq) / ds.length)
      math.floor(r * 1000000.0).toLong
    }.toMap
    val expect = docs.filter { case (id, src, _) =>
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(md5.take(4).map(b => f"$b%02x").mkString, 16) %
        1000000L < thr(src)
    }.map(t => (t._1, t._2)).toSet
    assert(kept === expect)
    // the α = 0.5 budget lands near half the corpus
    assert(kept.size > docs.length / 3 && kept.size < docs.length * 2 / 3)
  }

  test("TextPipeline.winnowing generic (k, w): denser windows select a superset") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).limit(40)
    val std = graft.api.TextPipeline.winnowing(docs, $"doc_id", $"text", k = 3, w = 4)
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    // w = 1 selects EVERY k-gram hash — a superset of any larger window's picks
    val all = graft.api.TextPipeline.winnowing(docs, $"doc_id", $"text", k = 3, w = 1)
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(std.nonEmpty)
    std.foreach { case (id, fps) => assert(fps.subsetOf(all(id)), s"doc $id") }
    // k = 2 hashes different shingles: fingerprints exist and docs with >= 2
    // tokens qualify (k + w - 1 = 3)
    val k2 = graft.api.TextPipeline.winnowing(docs, $"doc_id", $"text", k = 2, w = 2)
    assert(k2.select($"doc_id").distinct().count() >=
      std.size.toLong)
  }

  test("llm_overlap_matrix: full source-pair matrix with consistent bounds") {
    import spark.implicits._
    val rows = q("llm_overlap_matrix").collect()
    val nSources = Tables.documents(spark, sf).select($"source").distinct().count()
    // every source pair shares at least one shingle in this corpus → full matrix
    assert(rows.length === (nSources * (nSources - 1) / 2).toInt)
    rows.foreach { r =>
      val shared = r.getLong(r.fieldIndex("shared"))
      val n1 = r.getLong(r.fieldIndex("n1"))
      val n2 = r.getLong(r.fieldIndex("n2"))
      assert(r.getString(r.fieldIndex("src1")) < r.getString(r.fieldIndex("src2")))
      assert(shared >= 0 && shared <= math.min(n1, n2))
      assert(r.getDouble(r.fieldIndex("jaccard")) ===
        math.floor(shared.toDouble / (n1 + n2 - shared) * 10000.0 + 0.5) / 10000.0)
    }
  }

  test("mm_decode_stub: sha matches Spark's native sha2 over the same bytes") {
    import spark.implicits._
    val ours = q("mm_decode_stub").select($"doc_id", $"sha")
    val native = Tables.documents(spark, sf)
      .select($"doc_id", sha2($"text".cast("binary"), 256).as("sha2"))
    val joined = ours.join(native, "doc_id")
      .filter($"sha" =!= $"sha2").count()
    assert(joined === 0)
  }

  test("llm_sim_search plan: probe is broadcast, scan is pruned to used columns") {
    val p = q("llm_sim_search").queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }

  test("fn batteries return full-table row counts") {
    val docs = Tables.documents(spark, sf).count()
    assert(q("fn_string").count() === docs)
    assert(q("llm_token_count").count() === docs)
    assert(q("fn_date").count() === Tables.orders(spark, sf).count())
    assert(q("fn_array").count() === Tables.embeddings(spark, sf).count() * 3)
  }

  /** Exact brute-force (vec_id -> rounded cos to probe 42), the referee for
    * both ANN variants.
    */
  private def bruteCos(): Map[Long, Double] = {
    import spark.implicits._
    import graft.expr.FloatVec
    import org.apache.spark.sql.functions._
    val e = Tables.embeddings(spark, sf)
      .withColumn("nrm", sqrt(FloatVec.floatDot($"embedding", $"embedding")))
    val probe = e.filter($"vec_id" === 42)
      .select($"embedding".as("pe"), $"nrm".as("pn"))
    e.filter($"vec_id" =!= 42).crossJoin(broadcast(probe))
      .select($"vec_id",
        round(FloatVec.floatDot($"embedding", $"pe") / ($"nrm" * $"pn"), 4).as("cos"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  test("llm_ann_kmeans: deterministic, 5 rows, cosines agree with brute force") {
    val r1 = q("llm_ann_kmeans").collect()
    val r2 = q("llm_ann_kmeans").collect()
    assert(r1.map(_.toSeq).toSeq === r2.map(_.toSeq).toSeq, "k-means ANN not deterministic")
    assert(r1.length === 5)
    val brute = bruteCos()
    r1.foreach { r =>
      assert(brute(r.getLong(0)) === r.getDouble(r.fieldIndex("cos")))
    }
    val cs = r1.map(_.getDouble(r1.head.fieldIndex("cos")))
    assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
  }

  test("llm_dedup_simhash_pairs: banded candidates recover exactly the brute-force pairs") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val banded = q("llm_dedup_simhash_pairs").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sig = q("llm_dedup_simhash")
    val brute = sig.as("x").join(sig.as("y"), $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id", $"y.doc_id",
        bit_count($"x.simhash".bitwiseXOR($"y.simhash")).cast("long").as("h"))
      .filter($"h" <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // pigeonhole: hamming <= 3 over 4 disjoint 16-bit bands forces >= 1
    // exact band match, so the banded set must EQUAL brute force
    assert(banded === brute)
    assert(banded.nonEmpty, "fixture should contain at least one near-identical pair")
  }

  test("llm_ann_lsh: bucket-local results with exact cosines") {
    val rows = q("llm_ann_lsh").collect()
    assert(rows.length === 5)
    assert(rows.map(_.getLong(rows.head.fieldIndex("bucket"))).distinct.length === 1,
      "results crossed buckets")
    val brute = bruteCos()
    rows.foreach { r =>
      assert(brute(r.getLong(0)) === r.getDouble(r.fieldIndex("cos")))
    }
  }

  test("llm_collocations: counts recompute exactly; JVM PMI pinned from the count vector") {
    import spark.implicits._
    val rows = q("llm_collocations").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(rows.head.fieldIndex("n_pair")) >= 20L))
    // independent recomputation: token/bigram counts from plain scala
    val texts = Tables.documents(spark, sf).select($"text").collect().map(_.getString(0))
    val uni = texts.flatMap(_.split(" ", -1)).groupBy(identity).map { case (t, xs) => (t, xs.length.toLong) }
    val bis = texts.flatMap { t =>
      val ts = t.split(" ", -1)
      if (ts.length < 2) Nil else ts.sliding(2).map(p => (p(0), p(1))).toSeq
    }
    val nbExp = bis.length.toLong
    val ntExp = uni.values.sum
    val bc = bis.groupBy(identity).map { case (p, xs) => (p, xs.length.toLong) }
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val (c, ca, cb, nt, nb) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(bc((a, b)) === c)
      assert(ca === uni(a) && cb === uni(b) && nt === ntExp && nb === nbExp)
      // PMI is pinned HERE (JVM recompute), deliberately not in the
      // oracle-hashed projection: cross-libm ln ulp drift flips round(·,4).
      val pmi = math.log(c.toDouble * nt * nt / (nb.toDouble * ca * cb))
      val expect = math.log(c.toDouble * ntExp * ntExp / (nbExp.toDouble * uni(a) * uni(b)))
      assert(java.lang.Double.doubleToLongBits(pmi) === java.lang.Double.doubleToLongBits(expect))
      assert(!pmi.isNaN && !pmi.isInfinite)
    }
  }

  test("transcendental quantizations sit far from their floor boundaries (cross-libm margin pin)") {
    import spark.implicits._
    // floor(f(x)·scale + 0.5) is deterministic across libms only if the
    // scaled value is farther from an integer boundary than the possible
    // ulp drift (≤ ~1e-11 scaled for every op below). Pin the actual
    // margins on this data so a silent data/scale change that erodes the
    // margin fails loudly instead of red-rowing the driver gate.
    def margin(x: Double): Double = { val f = x - math.floor(x); math.min(f, 1.0 - f) }
    // measure at the DRIVER GATE's scale factor (sf0.01), not the spec sf
    val sf = "/root/testdata/sf0.01"
    // fn_math lg_milli: ln(price)·1e3 + 0.5
    val prices = Tables.orders(spark, sf).select($"o_totalprice").distinct()
      .collect().map(_.getDouble(0))
    val mLg = prices.map(p => margin(math.log(p) * 1e3 + 0.5)).min
    assert(mLg > 1e-9, s"fn_math lg_milli margin $mLg")
    // llm_unigram_logprob sc: -ln(c/n)·1e9 + 0.5 over the distinct counts
    val tok = Tables.documents(spark, sf)
      .select(explode(split(trim($"text"), " ")).as("t"))
    val n = tok.count()
    val cs = tok.groupBy($"t").count().select($"count").distinct()
      .collect().map(_.getLong(0))
    val mUni = cs.map(c => margin(-math.log(c.toDouble / n) * 1e9 + 0.5)).min
    assert(mUni > 1e-5, s"unigram sc margin $mUni")
    // llm_tfidf_topk isc: ln(ns/dfc)·1e9 + 0.5 over the distinct doc-frequencies
    val src = Tables.documents(spark, sf)
      .select($"source", explode(split($"text", " ")).as("term"))
      .groupBy($"source", $"term").count()
    val ns = Tables.documents(spark, sf).select($"source").distinct().count()
    val dfcs = src.groupBy($"term").count().select($"count").distinct()
      .collect().map(_.getLong(0))
    val mIdf = dfcs.map(d => margin(math.log(ns.toDouble / d) * 1e9 + 0.5)).min
    assert(mIdf > 1e-5, s"tfidf isc margin $mIdf")
  }

  test("llm_perplexity_filter keeps exactly the middle surprise quartiles") {
    import spark.implicits._
    val kept = q("llm_perplexity_filter").collect()
    val total = Tables.documents(spark, sf).count()
    // ntile(4) sizes differ by at most 1; middle-two keep is half ±1
    assert(math.abs(kept.length - total / 2.0) <= 1.0)
    assert(kept.forall(r => Set(2L, 3L).contains(r.getLong(r.fieldIndex("q")))))
    // cross-op pin: scores must equal the unigram-logprob scorer's output
    val scores = q("llm_unigram_logprob").collect()
      .map(r => r.getLong(0) -> r.getDouble(r.fieldIndex("avg_surprise"))).toMap
    kept.foreach { r =>
      assert(r.getDouble(r.fieldIndex("avg_surprise")) === scores(r.getLong(0)))
    }
  }

  test("llm_decontaminate_bloom equals the exact containment join (no prefilter)") {
    import spark.implicits._
    import org.apache.spark.sql.GraftSqlBridge
    val got = q("llm_decontaminate_bloom").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute-force twin: exact shingle intersection with NO bloom stage —
    // any bucket-prefilter false NEGATIVE (impossible by construction:
    // equal strings hash equal) or surviving false positive would differ
    val ex = Tables.documents(spark, sf)
      .filter(size(split($"text", " ")) >= 3)
      .select($"doc_id", $"source", GraftSqlBridge.column(
        graft.expr.ShingleGen(GraftSqlBridge.expression($"text"), 3)).as("s"))
      .distinct()
    val ev = ex.filter($"source" === "src0").select($"doc_id".as("eval_id"), $"s")
    val tr = ex.filter($"source" =!= "src0").select($"doc_id".as("train_id"), $"s")
    val exact = tr.join(ev, "s")
      .groupBy($"train_id", $"eval_id").agg(count(lit(1)).as("common"))
      .filter($"common" >= 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === exact)
    assert(got.nonEmpty, "fixture should contain at least one contaminated pair")
  }

  test("llm_interleave_mix: dense positions, per-source doc order, weight-proportional prefix") {
    import spark.implicits._
    val rows = q("llm_interleave_mix").collect()
    // dense 1..200 position ordinals in output order
    assert(rows.map(_.getLong(0)).toSeq === (1L to 200L))
    // within every source the emitted docs are a doc_id-ascending
    // subsequence (the schedule never reorders a source's own stream)
    rows.groupBy(_.getString(1)).foreach { case (src, rs) =>
      val ids = rs.sortBy(_.getLong(0)).map(_.getLong(2)).toSeq
      assert(ids === ids.sorted, s"$src emitted out of doc_id order: $ids")
    }
    // proportionality: weight-4 sources (idx mod 4 == 3) must dominate
    // weight-1 sources (idx mod 4 == 0) in the prefix by well over 2x
    // (exact schedule ratio is 4x; the prefix boundary blurs the tail)
    def weightOf(src: String): Long = 1L + src.drop(3).toLong % 4
    val byW = rows.groupBy(r => weightOf(r.getString(1))).view.mapValues(_.length)
    assert(byW(4L) > 2.5 * byW(1L),
      s"weight-4 sources got ${byW(4L)} of 200 vs weight-1 ${byW(1L)} — schedule not proportional")
    // virtual time is non-decreasing along the schedule
    val vts = rows.map(_.getLong(3)).toSeq
    assert(vts === vts.sorted, "vt must be non-decreasing in position order")
  }

  test("fn_regex: devoweling, word counting, and color matching agree with the source") {
    val rows = q("fn_regex").collect()
    assert(rows.nonEmpty)
    val names = Tables.part(spark, sf).select("p_partkey", "p_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val name = names(r.getLong(0))
      assert(!r.getString(r.fieldIndex("devoweled")).exists("aeiou".contains(_)))
      assert(name.startsWith(r.getString(r.fieldIndex("head_word"))))
      assert(r.getLong(r.fieldIndex("n_words")) ===
        "[a-z]+".r.findAllIn(name).length)
      assert(r.getBoolean(r.fieldIndex("has_color")) ===
        "red|blue|green".r.findFirstIn(name).isDefined)
    }
  }

  test("llm_dup_ngram_spans: matches a JVM sliding-window brute force") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).trim.split(" ", -1).toSeq))
    val grams = docs.flatMap { case (id, ts) =>
      if (ts.length >= 8) ts.sliding(8).map(w => (id, w.mkString(" "))) else Iterator.empty
    }
    val dup = grams.groupBy(_._2).filter(_._2.map(_._1).distinct.size >= 2).keySet
    val exp = grams.groupBy(_._1).map { case (id, gs) =>
      val total = gs.size.toLong
      val d = gs.count(g => dup(g._2)).toLong
      id -> (total, d, math.floor(d.toDouble / total * 10000.0 + 0.5) / 10000.0)
    }
    val got = q("llm_dup_ngram_spans").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got === exp)
    assert(dup.nonEmpty, "fixture should contain at least one cross-doc duplicated 8-gram")
  }

  test("llm_bm25_topk: matches a JVM integer-rational BM25 recompute") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).trim.split(" ", -1).toSeq))
    val lens = docs.map { case (id, ts) => id -> ts.length.toLong }.toMap
    val nd = docs.length.toLong
    val tt = lens.values.sum
    val df = docs.flatMap { case (id, ts) => ts.distinct.map(t => (t, id)) }
      .groupBy(_._1).map { case (t, xs) => t -> xs.size.toLong }
    val terms = df.toSeq.sortBy { case (t, d) => (-d, t) }.take(3)
    val idf = terms.map { case (t, d) =>
      t -> math.floor(math.log((2.0 * nd - 2 * d + 1) / (2 * d + 1) + 1) * 1e9 + 0.5).toLong
    }.toMap
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp = docs.flatMap { case (id, ts) =>
      val tfs = idf.keySet.toSeq.map(t => t -> ts.count(_ == t).toLong)
        .filter(_._2 > 0)
      if (tfs.isEmpty) None
      else {
        val s = tfs.map { case (t, tf) =>
          idf(t) * ((44L * tf * tt * 1000000L) / (20L * tf * tt + 6L * tt + 18L * lens(id) * nd))
        }.sum
        Some((id, tfs.size.toLong, r4(s / 1e15)))
      }
    }.sortBy { case (id, _, sc) => (-sc, id) }.take(20).toSeq
    val got = q("llm_bm25_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === exp)
    assert(got.size === 20)
  }

  test("llm_fuzzy_join: length-band blocking loses no pair vs all-pairs JVM edit distance") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val names = Tables.part(spark, sf).select("p_name").distinct()
      .collect().map(_.getString(0))
    val exp = (for {
      a <- names; b <- names
      if a < b && lev(a, b) <= 2 // NO length band: every admissible pair
    } yield (a, b, lev(a, b).toLong)).toSet
    val got = q("llm_fuzzy_join").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got === exp)
    assert(got.nonEmpty, "fixture should contain at least one lev<=2 name pair")
  }

  test("llm_entropy_rate: quantized MLE fold matches a JVM recompute; bounded by ln(V)") {
    val r = q("llm_entropy_rate").collect()
    assert(r.length === 1)
    val bi = Tables.documents(spark, sf).select("text").collect()
      .map(_.getString(0).trim.split(" ", -1).toSeq).filter(_.length >= 2)
      .flatMap(ts => ts.sliding(2).map(p => (p(0), p(1))))
    val cb = bi.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cu = bi.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val n = bi.length.toLong
    val sum = cb.map { case ((w1, _), c) =>
      c * math.floor(-math.log(c.toDouble / cu(w1)) * 1e9 + 0.5).toLong
    }.sum
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r(0).getLong(0) === n)
    assert(r(0).getLong(1) === cb.size.toLong)
    assert(r(0).getDouble(2) === r4(sum.toDouble / (n * 1e9)))
    // entropy rate is bounded by the history-conditional support
    val vocab = (bi.map(_._1) ++ bi.map(_._2)).distinct.size
    assert(r(0).getDouble(2) >= 0.0 && r(0).getDouble(2) <= math.log(vocab.toDouble))
  }

  test("llm_bigram_logprob: smoothed conditional surprise matches a JVM recompute") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).trim.split(" ", -1).toSeq))
      .filter(_._2.length >= 2)
    val bi = docs.flatMap { case (id, ts) =>
      ts.sliding(2).map(p => (id, p(0), p(1)))
    }
    val cb = bi.groupBy(p => (p._2, p._3)).view.mapValues(_.length.toLong).toMap
    val cu = bi.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val v = (bi.map(_._2) ++ bi.map(_._3)).distinct.length.toLong
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp = bi.groupBy(_._1).map { case (id, xs) =>
      val s = xs.map { case (_, w1, w2) =>
        math.floor(-math.log((cb((w1, w2)) + 1).toDouble /
          (cu(w1) + v)) * 1e9 + 0.5).toLong
      }.sum
      id -> (xs.length.toLong, r4(s.toDouble / (xs.length * 1e9)))
    }
    val got = q("llm_bigram_logprob").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got === exp)
    assert(got.nonEmpty)
    // a repeated bigram is CHEAPER than a novel one under the same history
    val pRepeated = (2.0 + 1) / (10 + v) // sanity of the smoothing direction
    assert(-math.log(pRepeated) < -math.log(1.0 / (10 + v)))
  }

  test("llm_dedup_paragraph: keep-first chunk accounting matches a JVM scan") {
    def md5hex(x: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(x.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).trim.split(" ", -1).toSeq))
      .filter(_._2.nonEmpty)
    val chunks = docs.flatMap { case (id, ts) =>
      ts.grouped(20).map(c => (id, md5hex(c.mkString(" ")), c.length.toLong))
    }
    val minted = chunks.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
    val exp = chunks.groupBy(_._1).map { case (id, cs) =>
      val kept = cs.filter(c => minted(c._2) == id)
      val keptTok = if (kept.isEmpty) None else Some(kept.map(_._3).sum)
      id -> (cs.size.toLong, kept.size.toLong, keptTok, cs.map(_._3).sum,
        math.floor(kept.size.toDouble / cs.size * 10000.0 + 0.5) / 10000.0)
    }
    val got = q("llm_dedup_paragraph").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getLong(4),
        r.getDouble(5))).toMap
    assert(got === exp)
    assert(exp.values.exists(v => v._2 < v._1),
      "fixture should contain at least one cut (duplicated) chunk")
  }

  test("llm_train_val_split: buckets are deterministic, exhaustive, and ~13:2:1") {
    val rows = q("llm_train_val_split").collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(rows.nonEmpty)
    def md5hex(x: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(x.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val exp = docs.groupBy { case (id, src, _) =>
      val h = md5hex(id.toString).charAt(0)
      (src, if (h < 'd') "train" else if (h < 'f') "val" else "test")
    }.map { case (k, xs) => k -> (xs.length.toLong, xs.map(_._3).sum) }
    assert(rows === exp)
    // every doc lands in exactly one bucket
    assert(rows.values.map(_._1).sum === docs.length.toLong)
    // train dominates globally (the 13/16 slice)
    val bySplit = rows.toSeq.groupBy(_._1._2).view
      .mapValues(_.map(_._2._1).sum).toMap
    assert(bySplit("train") > bySplit.getOrElse("val", 0L) &&
      bySplit("train") > bySplit.getOrElse("test", 0L))
  }

  test("fn_struct: field carving agrees with the flat source columns") {
    val rows = q("fn_struct").collect()
    assert(rows.nonEmpty)
    val src = Tables.part(spark, sf)
      .select("p_partkey", "p_brand", "p_size", "p_retailprice", "p_type")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getAs[Number](2).longValue(), r.getDouble(3),
          r.getString(4))).toMap
    rows.foreach { r =>
      val (brand, sz, price, ptype) = src(r.getLong(0))
      assert(r.getString(1) === brand)
      assert(r.getLong(2) === sz + 1)
      assert(r.getBoolean(3) === (price > 1500.0))
      assert(r.getString(4) === ptype)
    }
  }

  test("llm_minhash_calibration: est/exact/err recompute in the JVM; candidates = banded set") {
    val got = q("llm_minhash_calibration").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(got.nonEmpty)
    def md5hex(x: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(x.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).toSeq))
      .filter(_._2.length >= 3)
      .map { case (id, ts) => id -> ts.sliding(3).map(_.mkString(" ")).toSet }
    val sig = docs.map { case (id, sh) =>
      id -> (0 to 7).map(i => sh.map(s => md5hex(i.toString + s)).min)
    }.toMap
    val bandsOf = (h: IndexedSeq[String]) =>
      Seq(h(0) + h(1), h(2) + h(3), h(4) + h(5), h(6) + h(7))
    val exp = (for {
      (d1, s1) <- docs; (d2, s2) <- docs
      if d1 < d2
      if bandsOf(sig(d1).toIndexedSeq).zip(bandsOf(sig(d2).toIndexedSeq))
        .exists(p => p._1 == p._2)
      common = (s1 & s2).size
      if common > 0
    } yield {
      val nm = sig(d1).zip(sig(d2)).count(p => p._1 == p._2).toLong
      val j = common.toDouble / (s1.size + s2.size - common)
      def p4(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
      (d1, d2) -> (nm, p4(nm.toDouble / 8), p4(j), p4(math.abs(nm.toDouble / 8 - j)))
    }).toMap
    assert(got === exp)
    // the estimator must be well calibrated somewhere: at least one
    // candidate with full signature agreement and high exact Jaccard
    assert(got.values.exists(v => v._1 == 8L && v._3 >= 0.5))
  }

  test("llm_containment_join: directed pairs match a JVM shingle-set scan") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).toSeq))
      .filter(_._2.length >= 3)
      .map { case (id, ts) => id -> ts.sliding(3).map(_.mkString(" ")).toSet }
    val exp = (for {
      (da, sa) <- docs; (db, sb) <- docs
      if da != db
      common = (sa & sb).size
      if common > 0
      c = math.floor(common.toDouble / sa.size * 10000.0 + 0.5) / 10000.0
      if c >= 0.8
    } yield (da, db, common.toLong, sa.size.toLong, c)).toSet
    val got = q("llm_containment_join").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    assert(got === exp)
    assert(got.nonEmpty, "fixture should contain a >=0.8 containment pair")
    // directed semantics: the denominator is the SUB side's set size (the
    // JVM-scan equality above proves it bitwise); mirror rows, when both
    // directions pass the threshold, must carry EACH side's own n_sub
    got.foreach { case (a, b, common, nSub, c) =>
      assert(common <= nSub && c >= 0.8 && c <= 1.0)
      got.find(p => p._1 == b && p._2 == a).foreach { m =>
        assert(m._3 === common, "mirror pair must share the intersection")
      }
    }
  }

  test("llm_ngram_novelty: first-occurrence accounting matches a JVM scan") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).trim.split(" ", -1).toSeq))
    val grams = docs.flatMap { case (id, ts) =>
      if (ts.length >= 5) ts.sliding(5).map(w => (id, w.mkString(" ")))
      else Iterator.empty
    }
    val firstDoc = grams.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
    val exp = grams.groupBy(_._1).map { case (id, gs) =>
      val total = gs.size.toLong
      val novel = gs.count(g => firstDoc(g._2) == id).toLong
      id -> (total, novel,
        math.floor(novel.toDouble / total * 10000.0 + 0.5) / 10000.0)
    }
    val got = q("llm_ngram_novelty").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got === exp)
    // the earliest doc with any grams mints everything it contains
    val firstId = exp.keys.min
    assert(got(firstId)._3 === 1.0, "earliest doc must be fully novel")
  }

  test("llm_zipf_slope: quantized least squares matches a JVM recompute; margins pinned") {
    val toks = Tables.documents(spark, sf).select("text").collect()
      .flatMap(_.getString(0).trim.split(" ", -1))
    val ranked = toks.groupBy(identity).map { case (t, xs) => (t, xs.length.toLong) }
      .toSeq.sortBy { case (t, f) => (-f, t) }
    def quant(v: Double): Long = math.floor(math.log(v) * 1e6 + 0.5).toLong
    val pts = ranked.zipWithIndex.map { case ((_, f), i) =>
      (quant(i + 1.0), quant(f.toDouble))
    }
    val n = pts.length.toLong
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    val intercept = (sy.toDouble - slope * sx.toDouble) / n.toDouble / 1e6
    val r = q("llm_zipf_slope").collect()
    assert(r.length === 1)
    def bits(x: Double) = java.lang.Double.doubleToLongBits(x)
    assert(r(0).getLong(0) === n)
    assert(bits(r(0).getDouble(1)) === bits(slope))
    assert(bits(r(0).getDouble(2)) === bits(intercept))
    assert(slope < 0.0, "rank-frequency slope must be negative")
    // cross-libm margin pin at the DRIVER GATE's sf (sf0.01): both ln
    // quantizations must sit far from their floor boundaries
    def margin(x: Double): Double = { val f = x - math.floor(x); math.min(f, 1.0 - f) }
    val gateToks = Tables.documents(spark, "/root/testdata/sf0.01").select("text")
      .collect().flatMap(_.getString(0).trim.split(" ", -1))
    val gateFreqs = gateToks.groupBy(identity).map(_._2.length.toLong).toSeq
    val mF = gateFreqs.map(f => margin(math.log(f.toDouble) * 1e6 + 0.5)).min
    assert(mF > 1e-6, s"zipf ln(freq) margin $mF")
    val mR = (1 to gateFreqs.size).map(r => margin(math.log(r.toDouble) * 1e6 + 0.5)).min
    assert(mR > 1e-6, s"zipf ln(rank) margin $mR")
  }

  test("llm_source_cap: at most 10 per source, ranks contiguous, equals a JVM top-K") {
    import spark.implicits._
    val got = q("llm_source_cap").collect()
      .map(r => (r.getString(1), r.getLong(3).toInt, r.getLong(0), r.getLong(2)))
    assert(got.nonEmpty)
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"source", $"n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val exp = docs.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
      ds.sortBy(d => (-d._3, d._1)).take(10).zipWithIndex
        .map { case (d, i) => (src, i + 1, d._1, d._3) }.toSeq
    }.toSet
    assert(got.toSet === exp)
    got.groupBy(_._1).foreach { case (src, rs) =>
      assert(rs.length <= 10)
      assert(rs.map(_._2).sorted.toSeq === (1 to rs.length).toSeq, src)
    }
  }

  test("llm_hapax_ratio: per-lang type/hapax counts match a JVM recompute") {
    import spark.implicits._
    val got = q("llm_hapax_ratio").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got.nonEmpty)
    val freqs = Tables.documents(spark, sf).select($"lang", $"text").collect()
      .flatMap(r => r.getString(1).split(" ", -1).map(r.getString(0) -> _))
      .groupBy(identity).view.mapValues(_.length).toSeq
      .groupBy(_._1._1)
    freqs.foreach { case (lang, tf) =>
      val types = tf.length.toLong
      val hapax = tf.count(_._2 == 1).toLong
      val (gt, gh, gr) = got(lang)
      assert(gt === types, s"$lang types")
      assert(gh === hapax, s"$lang hapax")
      assert(gr === math.floor(hapax.toDouble / types * 10000.0 + 0.5) / 10000.0)
    }
    assert(got.keySet === freqs.keySet)
  }

  test("llm_vocab_growth: bucket curve reconciles with corpus totals and first occurrences") {
    import spark.implicits._
    val got = q("llm_vocab_growth").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(got.nonEmpty && got.length <= 10)
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    val lim = docs.map(_._1).max + 1
    val toksByBucket = docs.groupBy(d => d._1 * 10 / lim).view
      .mapValues(_.map(_._2.length.toLong).sum).toMap
    val firstDoc = docs.flatMap { case (id, ts) => ts.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val newByBucket = firstDoc.values.groupBy(fd => fd * 10 / lim).view
      .mapValues(_.size.toLong).toMap
    got.foreach { case (b, nt, _, nw, _) =>
      assert(nt === toksByBucket(b), s"bucket $b tokens")
      assert(nw === newByBucket.getOrElse(b, 0L), s"bucket $b new types")
    }
    // cumulative columns reconcile: final row equals corpus totals
    assert(got.last._3 === docs.map(_._2.length.toLong).sum)
    assert(got.last._5 === firstDoc.size.toLong)
    assert(got.map(_._2).sum === got.last._3)
    assert(got.map(_._4).sum === got.last._5)
  }

  test("llm_js_divergence: per-pair fold matches a bitwise JVM recompute; bounded by ln 2") {
    import spark.implicits._
    val got = q("llm_js_divergence").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got.nonEmpty)
    val cnt = Tables.documents(spark, sf).select($"source", $"text").collect()
      .flatMap(r => r.getString(1).split(" ", -1).map(r.getString(0) -> _))
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .map { case ((src, tok), c) => (src, tok, c) }
    val bySrc = cnt.groupBy(_._1).view
      .mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    val sources = bySrc.keys.toSeq.sorted
    var checked = 0
    for (a <- sources; b <- sources if a < b) {
      val (ca, cb) = (bySrc(a), bySrc(b))
      val (ta, tb) = (ca.values.sum.toDouble, cb.values.sum.toDouble)
      val union = ca.keySet ++ cb.keySet
      val sq = union.toSeq.map { t =>
        val p = ca.getOrElse(t, 0L).toDouble / ta
        val qq = cb.getOrElse(t, 0L).toDouble / tb
        val m = (p + qq) / 2.0
        val term = (if (p > 0) p * math.log(p / m) else 0.0) +
          (if (qq > 0) qq * math.log(qq / m) else 0.0)
        math.floor(term * 0.5 * 1.0e9 + 0.5).toLong
      }.sum
      val (gn, gj) = got((a, b))
      assert(gn === union.size.toLong, s"($a,$b) n_terms")
      def bits(d: Double) = java.lang.Double.doubleToLongBits(d)
      assert(bits(gj) === bits(sq.toDouble / 1.0e9), s"($a,$b) jsd")
      assert(gj >= -1e-6 && gj <= math.log(2.0) + 1e-6, s"($a,$b) bound")
      checked += 1
    }
    assert(checked === got.size)
  }

  test("llm_embed_outliers: centroid distances recompute bitwise; top-5 per label") {
    import spark.implicits._
    val got = q("llm_embed_outliers").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty)
    val vecs = Tables.embeddings(spark, sf)
      .select($"vec_id", $"label".cast("long"), $"embedding").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Float](2).toArray))
    val byLabel = vecs.groupBy(_._2)
    val expTop = byLabel.toSeq.flatMap { case (label, vs) =>
      val dim = vs.head._3.length
      val cent = (0 until dim).map { i =>
        val cs = vs.map(v => BigDecimal(v._3(i).toDouble * 10000)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).sum
        cs.toDouble / (vs.length.toDouble * 10000.0)
      }
      val d2 = vs.map { case (id, _, arr) =>
        val q = (0 until dim).map { i =>
          val t = arr(i).toDouble - cent(i)
          math.floor(t * t * 1.0e9 + 0.5).toLong
        }.sum
        (id, q)
      }
      d2.sortBy(x => (-x._2, x._1)).take(5).zipWithIndex.map {
        case ((id, q), i) => (label, (i + 1).toLong, id, q.toDouble / 1.0e9)
      }.toSeq
    }.toSet
    assert(got.toSet === expTop)
    got.groupBy(_._1).foreach { case (l, rs) =>
      assert(rs.length === 5, s"label $l rows")
      assert(rs.map(_._2).sorted.toSeq === (1L to 5L), s"label $l ranks")
    }
  }

  test("llm_lang_confusion: matrix reconciles with llm_lang_id cell-for-cell") {
    import spark.implicits._
    val got = q("llm_lang_confusion").collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(got.nonEmpty)
    val pred = q("llm_lang_id").collect()
      .map(r => (r.getString(1), r.getString(2)))
    val cells = pred.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rowTot = cells.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    assert(got.keySet === cells.keySet)
    cells.foreach { case (k, n) =>
      assert(got(k)._1 === n, k)
      assert(got(k)._2 ===
        math.floor(n.toDouble / rowTot(k._1) * 10000.0 + 0.5) / 10000.0, k)
    }
    // diagonal dominance sanity: overall accuracy is above chance (1/5)
    val correct = cells.collect { case ((a, p), n) if a == p => n }.sum
    assert(correct.toDouble / pred.length > 0.2, "classifier below chance")
  }

  test("llm_min_token_freq: per-doc rarest token matches a JVM frequency argmin") {
    import spark.implicits._
    val got = q("llm_min_token_freq").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got.nonEmpty)
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    val freq = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.length.toLong).toMap
    docs.foreach { case (id, toks) =>
      val dist = toks.distinct
      val (mf, tk) = dist.map(t => (freq(t), t)).min
      val (gn, gf, gt) = got(id)
      assert(gn === dist.length.toLong, s"doc $id distinct")
      assert(gf === mf, s"doc $id min freq")
      assert(gt === tk, s"doc $id rarest")
    }
    assert(got.size === docs.length)
  }

  test("llm_kwic: every 'dup' occurrence appears with its clamped ±3 context") {
    import spark.implicits._
    val got = q("llm_kwic").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1))
    val exp = docs.flatMap { case (id, ts) =>
      ts.zipWithIndex.collect { case ("dup", i) =>
        val a = math.max(0, i - 3); val b = math.min(ts.length - 1, i + 3)
        (id, (i + 1).toLong, ts.slice(a, b + 1).mkString(" "))
      }.toSeq
    }
    assert(got.toSeq.sorted === exp.toSeq.sorted)
    assert(got.nonEmpty, "keyword 'dup' should occur at spec sf")
    got.foreach { case (_, _, ctx) => assert(ctx.split(" ", -1).contains("dup")) }
  }

  test("llm_ngram_coverage: eval 3-gram coverage matches a JVM set intersection") {
    import spark.implicits._
    val r = q("llm_ngram_coverage").collect().head
    val docs = Tables.documents(spark, sf).select($"source", $"text").collect()
      .map(x => x.getString(0) -> x.getString(1).split(" ", -1))
      .filter(_._2.length >= 3)
    def tri(ts: Array[String]): Iterator[String] =
      ts.sliding(3).map(_.mkString(" "))
    val ev = docs.filter(_._1 == "src0").flatMap(d => tri(d._2)).toSet
    val tr = docs.filter(_._1 != "src0").flatMap(d => tri(d._2)).toSet
    val covered = (ev & tr).size.toLong
    assert(r.getLong(0) === ev.size.toLong)
    assert(r.getLong(1) === covered)
    assert(r.getDouble(2) ===
      math.floor(covered.toDouble / ev.size * 10000.0 + 0.5) / 10000.0)
    assert(covered > 0, "fixture slices should overlap on some 3-grams")
  }

  test("llm_skipgram_pairs: distance-weighted top-30 matches a JVM window scan") {
    import spark.implicits._
    val got = q("llm_skipgram_pairs").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getDouble(4)))
    assert(got.length === 30)
    val docs = Tables.documents(spark, sf).select($"text").collect()
      .map(_.getString(0).split(" ", -1))
    val counts = scala.collection.mutable.Map[(String, String), (Long, Long)]()
    docs.foreach { ts =>
      for (i <- ts.indices; d <- 1 to 2 if i + d < ts.length) {
        val k = (ts(i), ts(i + d))
        val (n, wt) = counts.getOrElse(k, (0L, 0L))
        counts(k) = (n + 1, wt + (if (d == 1) 2L else 1L))
      }
    }
    val exp = counts.toSeq
      .sortBy { case ((w1, w2), (_, wt)) => (-wt, w1, w2) }.take(30)
      .zipWithIndex.map { case (((w1, w2), (n, wt)), i) =>
        ((i + 1).toLong, w1, w2, n, wt.toDouble / 2.0)
      }
    assert(got.toSeq === exp)
    // weights dominate counts only through the distance rule
    got.foreach { case (_, _, _, n, wgt) =>
      assert(wgt <= n.toDouble && wgt >= n.toDouble / 2.0)
    }
  }

  test("llm_pref_pairs: adjacent-rank pairing recomputes; chosen is never shorter") {
    import spark.implicits._
    val got = q("llm_pref_pairs").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.nonEmpty)
    val docs = Tables.documents(spark, sf)
      .select($"source", $"doc_id", $"n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val exp = docs.groupBy(_._1).toSeq.flatMap { case (src, ds) =>
      val ranked = ds.sortBy(d => (-d._3, d._2))
      ranked.zip(ranked.tail).zipWithIndex.map { case ((a, b), i) =>
        (src, (i + 1).toLong, a._2, b._2, a._3 - b._3)
      }.toSeq
    }
    assert(got.toSet === exp.toSet)
    got.foreach { case (_, _, _, _, gap) => assert(gap >= 0L, "chosen shorter than rejected") }
    // each source emits n-1 pairs
    val perSource = docs.groupBy(_._1).view.mapValues(_.length).toMap
    got.groupBy(_._1).foreach { case (src, ps) =>
      assert(ps.length === perSource(src) - 1, src)
    }
  }

  test("mm_chunk_manifest: chunks tile every payload exactly; hashes recompute") {
    import spark.implicits._
    val got = q("mm_chunk_manifest").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(got.nonEmpty)
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val exp = docs.flatMap { case (id, t) =>
      t.grouped(64).zipWithIndex.map { case (chunk, i) =>
        (id, (i + 1).toLong, i.toLong * 64, chunk.length.toLong, md5hex(chunk))
      }.toSeq
    }
    assert(got.toSet === exp.toSet)
    // chunks reassemble: per doc, sizes sum to the payload length and
    // offsets are contiguous
    got.groupBy(_._1).foreach { case (id, cs) =>
      val sorted = cs.sortBy(_._2)
      assert(sorted.map(_._4).sum === docs.toMap.apply(id).length.toLong, s"doc $id")
      sorted.zipWithIndex.foreach { case (c, i) => assert(c._3 === i.toLong * 64) }
    }
  }

  test("mm_payload_dedup: savings ledger reconciles with exact duplicate groups") {
    import spark.implicits._
    val r = q("mm_payload_dedup").collect().head
    val texts = Tables.documents(spark, sf).select($"text").collect().map(_.getString(0))
    val groups = texts.groupBy(identity).values.map(_.length.toLong).toSeq
    assert(r.getLong(0) === texts.length.toLong)
    assert(r.getLong(1) === groups.length.toLong)
    assert(r.getLong(2) === groups.filter(_ >= 2).sum)
    assert(r.getLong(3) === texts.map(_.length.toLong).sum)
    val saved = texts.groupBy(identity).map { case (t, xs) =>
      (xs.length - 1).toLong * t.length
    }.sum
    assert(r.getLong(4) === saved)
    assert(r.getLong(3) - r.getLong(4) ===
      texts.distinct.map(_.length.toLong).sum, "store size after dedup")
  }

  test("llm_dataset_card: every card column recomputes from the corpus") {
    import spark.implicits._
    val r = q("llm_dataset_card").collect().head
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text", $"lang", $"source", $"n_chars").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getString(2), x.getString(3), x.getLong(4)))
    val toks = docs.flatMap(_._2.split(" ", -1))
    assert(r.getLong(0) === docs.length.toLong)
    assert(r.getLong(1) === docs.map(_._4).distinct.length.toLong)
    assert(r.getLong(2) === docs.map(_._3).distinct.length.toLong)
    assert(r.getLong(3) === toks.length.toLong)
    assert(r.getLong(4) === toks.distinct.length.toLong)
    assert(r.getDouble(5) ===
      math.floor(toks.length.toDouble / docs.length * 10000.0 + 0.5) / 10000.0)
    val sorted = docs.map(d => (d._5, d._1)).sorted
    assert(r.getLong(6) === sorted((docs.length + 1) / 2 - 1)._1)
    val dupDocs = docs.groupBy(_._2).values.filter(_.length >= 2).map(_.length.toLong).sum
    assert(r.getLong(7) === dupDocs)
  }

  test("llm_hash_embed: signed 64-bucket hashing recomputes; audit columns consistent") {
    import spark.implicits._
    val got = q("llm_hash_embed").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
      .toMap
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    docs.foreach { case (id, toks) =>
      val cells = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      toks.foreach { t =>
        val h = java.lang.Long.parseLong(md5hex(t).substring(0, 8), 16)
        val sgn = if ((h / 64) % 2 == 0) 1L else -1L
        cells(h % 64) += sgn
      }
      val nz = cells.toSeq.filter(_._2 != 0L)
      if (nz.isEmpty) assert(!got.contains(id), s"doc $id should drop")
      else {
        val (nnz, l2, tb, tw) = got(id)
        assert(nnz === nz.length.toLong, s"doc $id nnz")
        assert(l2 === math.sqrt(nz.map(c => c._2 * c._2).sum.toDouble), s"doc $id l2")
        val (eb, ew) = nz.map(c => (c._1, math.abs(c._2)))
          .minBy { case (b, a) => (-a, b) }
        assert(tb === eb, s"doc $id top bucket")
        assert(tw === ew, s"doc $id top weight")
      }
    }
  }

  test("fn_codec: hashes match JVM digests; base64 round-trip holds for every row") {
    import spark.implicits._
    val got = q("fn_codec").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getString(3),
        r.getString(4), r.getLong(5))).toMap
    assert(got.nonEmpty)
    def digest(alg: String, s: String): String =
      java.security.MessageDigest.getInstance(alg)
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val names = Tables.part(spark, sf).select($"p_partkey", $"p_name").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    names.foreach { case (k, n) =>
      val (hx, b64, sha, m5, rt) = got(k)
      assert(hx === n.getBytes("UTF-8").map("%02x".format(_)).mkString, s"part $k hex")
      assert(b64 === java.util.Base64.getEncoder.encodeToString(n.getBytes("UTF-8")))
      assert(sha === digest("SHA-256", n), s"part $k sha")
      assert(m5 === digest("MD5", n), s"part $k md5")
      assert(rt === 1L, s"part $k roundtrip")
    }
    assert(got.size === names.length)
  }

  test("llm_bpe_first_merge: top-20 char-pair counts match a JVM recompute") {
    import spark.implicits._
    val got = q("llm_bpe_first_merge").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.length === 20)
    val toks = Tables.documents(spark, sf).select($"text").collect()
      .flatMap(_.getString(0).split(" ", -1)).filter(_.length >= 2)
    val counts = toks.flatMap(t => t.sliding(2))
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
    val exp = counts.sortBy { case (p, c) => (-c, p) }.take(20).zipWithIndex
      .map { case ((p, c), i) => ((i + 1).toLong, p, c) }
    assert(got.toSeq === exp)
    // ranks strictly ordered by count desc
    assert(got.map(_._3).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
  }

  test("llm_spatial_grid: grid-blocked pairs equal the brute-force neighborhood exactly") {
    import spark.implicits._
    val got = q("llm_spatial_grid").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(got.nonEmpty)
    val pts = Tables.embeddings(spark, sf)
      .select($"vec_id", $"label".cast("long"), $"embedding").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Float](2).head.toDouble, r.getSeq[Float](2)(1).toDouble))
    val pairs = for {
      a <- pts; b <- pts if a._1 < b._1
      d2 = (a._3 - b._3) * (a._3 - b._3) + (a._4 - b._4) * (a._4 - b._4)
      if d2 <= 4.0e-4
    } yield (math.min(a._2, b._2), math.max(a._2, b._2),
      math.floor(d2 * 1.0e9 + 0.5).toLong)
    val exp = pairs.groupBy(p => (p._1, p._2)).view.mapValues { xs =>
      (xs.length.toLong, xs.map(_._3).min.toDouble / 1.0e9)
    }.toMap
    assert(got === exp)
  }

  test("llm_template_detect: prefix-8 length-signature clusters recompute; members sorted") {
    import spark.implicits._
    val got = q("llm_template_detect").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got.nonEmpty)
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) ->
        md5hex(r.getString(1).split(" ", -1).take(8).map(_.length).mkString(",")))
    val exp = docs.groupBy(_._2).filter(_._2.length >= 2).map { case (sig, ds) =>
      val ids = ds.map(_._1).sorted
      sig -> (ids.length.toLong, ids.min, ids.mkString(","))
    }
    assert(got === exp)
    // clusters partition docs: no doc in two clusters (md5 keyed — trivial but pinned)
    assert(got.values.map(_._1).sum ===
      docs.groupBy(_._2).filter(_._2.length >= 2).map(_._2.length.toLong).sum)
  }

  test("llm_span_mask: md5 schedule recomputes; rate near 15%; positions consistent") {
    import spark.implicits._
    val got = q("llm_span_mask").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4)))
      .toMap
    assert(got.nonEmpty)
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).length)
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    var totTok = 0L; var totMask = 0L
    docs.foreach { case (id, nTok) =>
      val masked = (1 to nTok).filter(p => md5hex(s"$id:$p").substring(0, 2) < "27")
      val (gn, gm, gr, gp) = got(id)
      assert(gn === nTok.toLong, s"doc $id tokens")
      assert(gm === masked.length.toLong, s"doc $id masked")
      assert(gr === math.floor(masked.length.toDouble / nTok * 10000.0 + 0.5) / 10000.0)
      assert(gp === masked.mkString(","), s"doc $id positions")
      totTok += nTok; totMask += masked.length
    }
    assert(got.size === docs.length)
    // the 39/256 schedule lands near 15% over the corpus
    val rate = totMask.toDouble / totTok
    assert(rate > 0.10 && rate < 0.20, s"corpus mask rate $rate")
  }

  test("llm_mad_outliers: lower-median/MAD flags match a JVM recompute") {
    import spark.implicits._
    val got = q("llm_mad_outliers").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"source", $"n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def lowerMedian(xs: Seq[(Long, Long)]): Long = {
      // (sortKey, docId) pairs sorted by (value, doc_id); rank (n+1)/2
      val sorted = xs.sortBy(identity)
      sorted((xs.length + 1) / 2 - 1)._1
    }
    val exp = docs.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
      val med = lowerMedian(ds.map(d => (d._3, d._1)).toSeq)
      val devs = ds.map(d => (d._1, d._3, math.abs(d._3 - med)))
      val mad = lowerMedian(devs.map(d => (d._3, d._1)).toSeq)
      devs.filter(d => d._3 * 2 > mad * 3)
        .map(d => (d._1, src, d._2, med, mad)).toSeq
    }.toSet
    assert(got.toSet === exp)
    assert(exp.nonEmpty, "threshold should flag some docs at spec sf")
  }

  test("llm_containment_join_banded equals the exact twin on the fixture corpus") {
    // the banded front end's declared posture: identical output where the
    // corpus's containment pairs sit above the calibration-fed recall
    // floor — which the fixture's do (any drop here means the banding or
    // the threshold feed regressed, not noise)
    def rows(k: String) = SparkEntry.queries(k)(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    val exact = rows("llm_containment_join")
    val banded = rows("llm_containment_join_banded")
    assert(exact.nonEmpty, "fixture should contain containment pairs")
    assert(banded === exact)
  }
}
