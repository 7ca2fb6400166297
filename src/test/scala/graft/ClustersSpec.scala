package graft

import org.apache.spark.sql.functions._

import graft.ext.{Clusters, Sampling, TfIdf}

/** Connected components, TF-IDF and hash sampling operators. */
class ClustersSpec extends SparkSpec {

  test("connected components: chain, triangle, singleton pair, transitivity") {
    import spark.implicits._
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("id_a", "id_b")
    val cc = Clusters.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connected components fails loudly when maxIter is too small") {
    import spark.implicits._
    // a 5-node chain has diameter 4; 2 propagation rounds cannot
    // settle it — partial labels must throw, not silently split the
    // component across several cluster ids
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      Clusters.connectedComponents(chain, "id_a", "id_b", maxIter = 2)
    }
    // the same graph converges with room to iterate
    val cc = Clusters.connectedComponents(chain, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.values.toSet === Set(1L))
  }

  test("connected components sizing launches no count() job (stats-based)") {
    import spark.implicits._
    val sites = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        sites.add(Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .getOrElse(""))
    }
    org.apache.spark.graft.TestBus.drain(spark.sparkContext)
    spark.sparkContext.addSparkListener(listener)
    try {
      val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
      Clusters.connectedComponents(pairs, "id_a", "id_b")
        .write.format("noop").mode("overwrite").save()
      org.apache.spark.graft.TestBus.drain(spark.sparkContext)
      val counts = sites.toArray(Array.empty[String]).toSeq
        .filter(_.startsWith("count at Clusters"))
      assert(counts.isEmpty,
        s"edge sizing must read plan stats, not run count(): $counts")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("connected components converge on a long path (diameter > 2)") {
    import spark.implicits._
    val pairs = (1L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cc = Clusters.connectedComponents(pairs, "id_a", "id_b")
    assert(cc.select("cluster").distinct().count() === 1)
    assert(cc.agg(min("cluster")).head().getLong(0) === 1L)
    assert(cc.count() === 12)
  }

  test("tf-idf: corpus-wide term scores below distinctive terms") {
    import spark.implicits._
    val docs = Seq(
      (1L, "common alpha alpha"),
      (2L, "common beta"),
      (3L, "common gamma")).toDF("doc_id", "text")
    val top = TfIdf.topTerms(docs, "doc_id", "text", k = 1)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // 'common' appears in every doc -> idf 0; the distinctive term wins
    assert(top === Map(1L -> "alpha", 2L -> "beta", 3L -> "gamma"))
  }

  test("kmeans: separable synthetic clusters stay put, deterministic") {
    import spark.implicits._
    // two well-separated directions in 4-d; init labels already correct
    val rows = (0 until 20).map { i =>
      val cl = i % 2
      val base = if (cl == 0) Seq(1.0f, 0.0f, 0.0f, 0.0f) else Seq(0.0f, 0.0f, 1.0f, 0.0f)
      val jitter = (i % 5) * 0.01f
      (i.toLong, cl.toLong, base.map(_ + jitter))
    }
    val df = rows.toDF("vec_id", "label", "embedding")
    val fit1 = graft.ext.KMeans.fit(df, "vec_id", "embedding", "label", iters = 2)
    val got = fit1.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === rows.map(r => r._1 -> r._2).toMap)
    // deterministic across runs
    val fit2 = graft.ext.KMeans.fit(df, "vec_id", "embedding", "label", iters = 2)
    assert(fit1.exceptAll(fit2).isEmpty && fit2.exceptAll(fit1).isEmpty)
  }

  test("bm25: rare distinctive term outranks ubiquitous term") {
    import spark.implicits._
    val docs = Seq(
      (1L, "common common alpha"),
      (2L, "common beta beta beta"),
      (3L, "common gamma")).toDF("doc_id", "text")
    val top = graft.ext.TfIdf.bm25TopTerms(docs, "doc_id", "text", k = 1)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(top === Map(1L -> "alpha", 2L -> "beta", 3L -> "gamma"))
  }

  test("hash sample: deterministic, nested across rates, rate in ballpark") {
    val ev = Tables.events(spark, sf)
    val s10 = Sampling.sample(ev, col("event_id"), lit("19"))
    val s50 = Sampling.sample(ev, col("event_id"), lit("7f"))
    // repeatable
    assert(s10.count() === Sampling.sample(ev, col("event_id"), lit("19")).count())
    // nested: the 10% sample is a subset of the 50% sample
    assert(s10.join(s50, Seq("event_id"), "left_anti").isEmpty)
    // rate ballpark: 26/256 = 10.2% with binomial wiggle
    val rate = s10.count().toDouble / ev.count()
    assert(rate > 0.06 && rate < 0.15, s"rate $rate")
  }
}
