package graft

/** Storage-lifetime contract: engine queries must leave NOTHING in the
  * session CacheManager after they run — a long-lived session serving
  * many queries would otherwise accumulate storage memory until
  * eviction thrash. Materialization barriers inside operators use
  * localCheckpoint (GC-released blocks), never an unpersisted
  * `.cache()`.
  */
class CacheHygieneSpec extends SparkSpec {

  // every query that historically cached (jaccard posting index,
  // corpus-pipeline clean layer, minhash signatures, k-means corpus,
  // dq report) plus the ANN paths that must not pin the corpus
  private val names = Seq("dedup_ngram_jaccard", "corpus_pipeline",
    "dedup_minhash_lsh", "dedup_minhash_fast", "kmeans_embeddings",
    "dedup_semantic", "similarity_ivf", "dq_summary",
    // the r14 count+model scoring family: their tokenize/count pass is
    // a dual-route localCheckpoint, never an unpersisted cache()
    "text_bm25", "text_tfidf", "text_perplexity", "select_dsir")

  test("queries leave the session CacheManager empty") {
    // other suites share the session and may cache test-local frames;
    // start from a clean slate so the assertion isolates THESE queries
    spark.sharedState.cacheManager.clearCache()
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      df.write.format("noop").mode("overwrite").save()
      assert(spark.sharedState.cacheManager.isEmpty,
        s"$name left entries in the CacheManager")
    }
  }
}
