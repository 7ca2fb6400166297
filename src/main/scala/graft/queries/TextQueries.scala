package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Clusters, Dedup, Dsir, HeavyHitters, Pack, PpJoin, Sampling, TfIdf}
import graft.functions.{SimHash, Text}
import graft.operators.Versioned

/** Text-analysis and deduplication surface over the `documents` corpus
  * (north-star extensions: token statistics, quality signals, language
  * ID, fingerprinting, exact + MinHash/LSH + SimHash + n-gram-Jaccard
  * dedup). All per-document computation is builtin-function column
  * work — map-only, codegen'd, shuffle-free; only candidate joins
  * shuffle, and those move (id, bucket) pairs, not documents.
  */
object TextQueries {

  type Q = (SparkSession, String) => DataFrame

  private val stopwords = Seq("the", "a", "or", "and", "of", "to", "in")
  private val langMarkers = Map(
    "en" -> Seq("the", "and", "or"),
    "de" -> Seq("der", "und", "nicht"),
    "fr" -> Seq("le", "et", "la"),
    "es" -> Seq("el", "y", "los"))

  /** Token counts, distinct tokens, mean token length, stopword count
    * and a BPE-ish subword estimate per document.
    */
  def textStats(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val toks = Text.tokens(col("text"))
    docs.select(
        col("doc_id"), col("lang"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_distinct_tokens"),
        round(Text.avgTokenLen(col("text"), toks), 4).as("avg_token_len"),
        Text.countIn(toks, stopwords).cast("long").as("n_stopwords"),
        Text.approxBpeTokenCount(toks).as("bpe_tokens"))
      // sort-sampling rule (see textRedact): kernel would run twice
      // under the sort (30× A/B 1.10 → 0.88 s, ProfileSortFamily)
      .localCheckpoint()
      .orderBy("doc_id")
  }

  /** Marker-word language ID: per-language stopword-hit scores and the
    * deterministic argmax (alphabetically-first language wins ties).
    */
  def textLangid(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val toks = Text.tokens(col("text"))
    val scores = Text.langScores(toks, langMarkers)
    docs.select(
        col("doc_id"), col("lang"),
        scores("en").cast("long").as("s_en"),
        scores("de").cast("long").as("s_de"),
        scores("fr").cast("long").as("s_fr"),
        scores("es").cast("long").as("s_es"),
        Text.argmaxLang(scores).as("lang_pred"))
      // sort-sampling rule (30× A/B 0.85 → 0.76 s, ProfileSortFamily)
      .localCheckpoint()
      .orderBy("doc_id")
  }

  /** Document fingerprints: full-content hash, min-shingle hash and
    * winnowed fingerprint count (rolling local-min selection).
    */
  def textFingerprint(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val fp = Text.fingerprint(Text.shingles(Text.tokens(col("text")), 3), 4)
    docs.select(
        col("doc_id"),
        md5(col("text")).as("content_hash"),
        fp.getField("min_shingle_hash").as("min_shingle_hash"),
        fp.getField("n_winnow").as("n_winnow"))
      // sort-sampling rule (30× A/B 0.75 → 0.66 s, ProfileSortFamily)
      .localCheckpoint()
      .orderBy("doc_id")
  }

  /** Exact dedup by content hash (hash-groupBy keep-min-id). */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Dedup.exact(Tables.documents(spark, dir), "doc_id", "text")
      .select("keep_id", "n_copies", "content_hash")
      .orderBy("keep_id")

  /** Substring-level exact dedup: strip every token span of length
    * >= 8 occurring at least twice across the corpus
    * ([[Dedup.removeRepeatedSpans]] — the suffix-array repeated-span
    * pass as bucketed k-gram counting). The oracle replays the same
    * k-gram/count/cover derivation in SQL.
    */
  def dedupSubstring(spark: SparkSession, dir: String): DataFrame =
    Dedup.removeRepeatedSpans(Tables.documents(spark, dir),
      "doc_id", "text", 8)
      .orderBy("doc_id")

  /** Keep-first-occurrence variant of the repeated-span pass: the
    * corpus-global first occurrence (min (doc_id, pos)) of each
    * repeated 8-gram survives unmarked, so one copy of every repeated
    * span keeps its text — the survivor policy production corpora
    * ship with.
    */
  def dedupSubstringKeepfirst(spark: SparkSession, dir: String): DataFrame =
    Dedup.removeRepeatedSpans(Tables.documents(spark, dir),
      "doc_id", "text", 8, keepFirst = true)
      .orderBy("doc_id")

  /** SimHash signatures for all documents. */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashSignatures(Tables.documents(spark, dir), "doc_id", "text")
      .orderBy("doc_id")

  /** Full MinHash → LSH bands → candidate pairs → exact-Jaccard verify
    * pipeline (16 hashes, 4 bands of 4).
    */
  def dedupMinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    // materialized once (localCheckpoint, not cache): the signature
    // tree is consumed three times (band explode + both sides of the
    // verify join); without a barrier Catalyst inlines and
    // re-evaluates the 16-hash minhash per consumer. Checkpoint blocks
    // release on GC, so nothing lingers in the session CacheManager.
    val banded = Dedup.minhashBands(Tables.documents(spark, dir), "doc_id", "text")
      .localCheckpoint()
    val cands = Dedup.minhashCandidatesGrouped(banded, "doc_id")
    Dedup.verifyJaccard(cands, banded, "doc_id")
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy("id_a", "id_b")
  }

  /** Production-hash variant of the LSH pipeline: seeded polynomial
    * minhash family (pure integer math in one codegen'd loop, ~10x
    * cheaper than md5) — same structure, and still exactly
    * oracle-gated: DuckDB reproduces the polynomial signatures
    * bit-for-bit via `list_reduce` over codepoints.
    */
  def dedupMinhashFast(spark: SparkSession, dir: String): DataFrame = {
    val banded = Dedup.minhashBands(Tables.documents(spark, dir), "doc_id", "text",
        fastHash = true)
      .localCheckpoint()
    val cands = Dedup.minhashCandidatesGrouped(banded, "doc_id")
    Dedup.verifyJaccard(cands, banded, "doc_id")
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy("id_a", "id_b")
  }

  /** Exact n-gram Jaccard near-dup pairs, blocked by `source`
    * (bounded O(n^2) per block; the unblocked path is the LSH query).
    */
  def dedupNgramJaccard(spark: SparkSession, dir: String): DataFrame =
    Dedup.jaccardPairsBlocked(Tables.documents(spark, dir), "doc_id", "text",
        blockCol = "source", shingleN = 3, minJaccard = 0.5)
      .orderBy("id_a", "id_b")

  /** Near-dup pairs → connected components → canonical-per-cluster:
    * the step that turns pairwise dedup output into "keep this doc,
    * drop those" decisions. Iterative min-label propagation (see
    * [[graft.ext.Clusters]]); gated against a DuckDB recursive-CTE
    * transitive closure.
    */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.jaccardPairsBlocked(Tables.documents(spark, dir),
      "doc_id", "text", blockCol = "source", shingleN = 3, minJaccard = 0.5)
    Clusters.connectedComponents(pairs, "id_a", "id_b")
      .select(col("node").as("doc_id"), col("cluster").as("cluster_id"),
        (col("node") === col("cluster")).as("is_canonical"))
      .orderBy("doc_id")
  }

  /** Top-3 TF-IDF terms per document (quality/topicality signal). */
  def textTfidf(spark: SparkSession, dir: String): DataFrame =
    TfIdf.topTerms(Tables.documents(spark, dir), "doc_id", "text", k = 3)
      // sort-sampling rule: the sort would re-run the scoring stage
      // (30× A/B 1.46 → 1.27 s, ProfileSortFamily; bm25's same shape
      // measured a tie and stays lazy)
      .localCheckpoint()
      .orderBy("doc_id", "rank")

  /** Top-3 BM25 terms per document (saturating, length-normalized). */
  def textBm25(spark: SparkSession, dir: String): DataFrame =
    TfIdf.bm25TopTerms(Tables.documents(spark, dir), "doc_id", "text", k = 3)
      .orderBy("doc_id", "rank")

  /** Corpus cleaning: adjacent-repeat collapse + PII/noise scrub
    * (URL/email/digit-run placeholders) — the normalization pass run
    * before dedup. Map-only, zero shuffle.
    */
  def textClean(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val toks = Text.tokens(col("text"))
    val kept = Text.collapseRepeats(toks)
    docs.select(
        col("doc_id"),
        Text.scrub(concat_ws(" ", kept)).as("clean_text"),
        (size(toks) - size(kept)).cast("long").as("n_removed"))
      // sort-sampling rule: the collapse+scrub kernel outweighs even
      // this row's large output bytes (30× A/B 1.36 → 1.11 s,
      // ProfileSortFamily)
      .localCheckpoint()
      .orderBy("doc_id")
  }

  /** Gopher-style quality scoring: repetition / lexical-diversity /
    * stopword-density features, hard filter flags, and a fixed-weight
    * logistic score — the quality-filtering stage of corpus assembly.
    * Features are rounded before the sigmoid so the score is a pure
    * function of engine-portable inputs. Map-only, zero shuffle.
    */
  def textQuality(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val n = col("_st.n_tokens").cast("double")
    val linear = lit(-2.0) +
      lit(4.0) * col("distinct_ratio") + lit(8.0) * col("stop_ratio") -
      lit(6.0) * col("dup_ratio") + lit(0.005) * col("n_tokens")
    docs
      .select(col("doc_id"),
        Text.tokenStats(Text.tokens(col("text")), stopwords).as("_st"))
      .select(
        col("doc_id"),
        col("_st.n_tokens").as("n_tokens"),
        round(col("_st.n_distinct") / n, 6).as("distinct_ratio"),
        round(col("_st.n_stop") / n, 6).as("stop_ratio"),
        round(col("_st.n_repeat") / n, 6).as("dup_ratio"))
      .withColumn("quality_score",
        round(lit(1.0) / (lit(1.0) + exp(-linear)), 4))
      .withColumn("keep",
        col("n_tokens") >= 30 && col("distinct_ratio") >= 0.3 &&
          col("stop_ratio") >= 0.01)
      .orderBy("doc_id")
  }

  /** Sequence packing into 256-token training chunks, sharded by
    * source ([[graft.ext.Pack]]): per-shard prefix-sum offsets, no
    * global sort.
    */
  def packSequences(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    Pack.sequences(docs, "doc_id", size(Text.tokens(col("text"))),
        "source", budget = 256)
      .select("doc_id", "source", "n_tokens", "start_offset",
        "chunk_idx", "chunk_id")
      // sort-sampling rule (30× A/B 0.90 → 0.82 s, ProfileSortFamily)
      .localCheckpoint()
      .orderBy("doc_id")
  }

  /** Domain-balancing quota: at most 5 docs per source, selected in
    * hash order ([[graft.ext.Sampling.quotaPerGroup]]).
    */
  def sampleQuota(spark: SparkSession, dir: String): DataFrame =
    Sampling.quotaPerGroup(Tables.documents(spark, dir), col("doc_id"),
        "source", quota = 5)
      .select("doc_id", "source", "sample_rank")
      .orderBy("doc_id")

  /** Sliding-window chunking of documents into 32-token windows with
    * 8-token overlap ([[graft.ext.Pack.chunkDocuments]]).
    */
  def chunkDocuments(spark: SparkSession, dir: String): DataFrame =
    Pack.chunkDocuments(Tables.documents(spark, dir), "doc_id",
        Text.tokens(col("text")), maxTokens = 32, overlap = 8)
      .orderBy("doc_id", "chunk_idx")

  /** Data mixing: per-source epoch weights (src0 ≈ 2.1 epochs, src1 ≈
    * 0.5, rest ≈ 1.25) materialized as deterministic row repetition
    * ([[graft.ext.Sampling.mixWeighted]]).
    */
  def mixWeighted(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val base = when(col("source") === "src0", 2)
      .when(col("source") === "src1", 0).otherwise(1)
    val thr = when(col("source") === "src0", lit("19"))
      .when(col("source") === "src1", lit("7f")).otherwise(lit("3f"))
    Sampling.mixWeighted(docs, col("doc_id"), base, thr)
      .select("doc_id", "source", "epoch")
      .orderBy("doc_id", "epoch")
  }

  /** Temperature mixing over the (skewed) language distribution:
    * alpha = 0.5 boosts rare languages and downsamples the dominant
    * one while keeping the expected corpus size
    * ([[graft.ext.Sampling.mixTemperature]]).
    */
  def mixTemperature(spark: SparkSession, dir: String): DataFrame =
    Sampling.mixTemperature(Tables.documents(spark, dir), col("doc_id"),
        "lang", alpha = 0.5)
      .select("doc_id", "lang", "epoch")
      .orderBy("doc_id", "epoch")

  /** Benchmark decontamination: shared-shingle counts of training docs
    * (sources ≠ src0) against the benchmark set (src0)
    * ([[graft.ext.Dedup.contamination]]).
    */
  def decontaminate(spark: SparkSession, dir: String): DataFrame =
    Dedup.contamination(Tables.documents(spark, dir), "doc_id", "text",
        col("source") === "src0", shingleN = 3)
      .orderBy("doc_id")

  /** Leakage-safe train/test split: near-dup clusters land on the same
    * side (split key = the connected-component id, singletons cluster
    * to themselves), so test docs never have a training near-duplicate.
    */
  def splitLeakageSafe(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val pairs = Dedup.jaccardPairsBlocked(docs, "doc_id", "text",
      blockCol = "source", shingleN = 3, minJaccard = 0.5)
    val clusters = Clusters.connectedComponents(pairs, "id_a", "id_b")
      .select(col("node").as("doc_id"), col("cluster").as("cluster_id"))
    docs.select("doc_id").join(clusters, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("is_test", Sampling.isTest(col("cluster_id"), "28"))
      .orderBy("doc_id")
  }

  /** Incremental dedup: docs with doc_id % 5 == 0 arrive as the new
    * batch, the rest are the already-deduped corpus; each batch doc is
    * matched exactly (content hash) and nearly (blocked Jaccard)
    * against the corpus only ([[graft.ext.Dedup.incrementalDedup]]).
    */
  def dedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    Dedup.incrementalDedup(
        corpus = docs.filter(col("doc_id") % 5 =!= 0),
        batch = docs.filter(col("doc_id") % 5 === 0),
        "doc_id", "text", blockCol = "source", shingleN = 3,
        minJaccard = 0.5)
      .orderBy("doc_id")
  }

  /** The production dedup-index lifecycle, completing the persisted-
    * index family (IVF centroids, PQ codebooks — and now the MinHash
    * LSH band postings): the corpus's (band_idx, band_key, c_id)
    * posting index is built ONCE and persisted as a versioned table;
    * each arriving batch computes only its OWN signatures and joins
    * the persisted postings — the corpus is never re-signed (its text
    * is re-read only to verify the candidate pairs, candidate-bounded).
    * At 100 TB this is the only affordable shape: signing the corpus
    * is the expensive pass, and it happens once per index version, not
    * once per batch.
    */
  def dedupLshIndex(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    // build-once-per-corpus-version, memoized per process: the
    // streaming arrival path (`streaming_dedup_lsh`) probes the SAME
    // persisted index through the SAME per-batch operator, so this
    // oracle gates both and neither path re-signs the corpus
    val idx = Dedup.persistedLshIndex(spark, dir, corpus, "doc_id", "text")
    Dedup.lshIndexProbe(idx, corpus, batch, "doc_id", "text")
      .orderBy("doc_id")
  }

  /** Vocabulary induction: top-50 terms by corpus frequency (ties
    * broken alphabetically) with document frequency — the seed of
    * tokenizer training. The heavy part is the distributed term
    * aggregation; the ranking is a distributed top-k
    * (TakeOrderedAndProject), never a global sort, and the final
    * row_number window runs over just the k survivors.
    */
  def vocabTopk(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("term"))
      // same empty-pseudo-term guard as TfIdf/Bpe (split("", " ") =
      // [""] — an empty doc must not mint a "" vocab entry)
      .filter(length(col("term")) >= 1)
    val agg = toks.groupBy("term")
      .agg(count(lit(1)).as("cf"), countDistinct(col("doc_id")).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cf").desc, col("term"))
    agg.orderBy(col("cf").desc, col("term")).limit(50)
      .withColumn("rank", row_number().over(w).cast("long"))
      .orderBy("rank")
  }

  /** Heavy hitters: tokens holding more than 1/200 of all token
    * positions — per-partition Misra–Gries candidates + one exact
    * verification pass, so the result is exact without a full-domain
    * shuffle (see [[graft.ext.HeavyHitters]]).
    */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, dir)
      .select(explode(Text.tokens(col("text"))).as("item")).as[String]
    HeavyHitters.frequentItems(toks, 200).orderBy("item")
  }

  /** The corpus-assembly DAG end-to-end, as one declarative plan:
    * clean (repeat collapse + scrub) → quality filter (hard flags on
    * the cleaned text) → exact dedup (keep min id per content hash) →
    * per-domain quota (hash-ordered cap) → sequence packing. Each
    * stage is the already-gated operator; composing them in one query
    * lets Catalyst pipeline the map-side stages and share the scan —
    * the per-stage shuffles (dedup hash, quota window, pack window)
    * are the only exchanges in the plan.
    */
  def corpusPipeline(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    val cleaned = docs.select(col("doc_id"), col("source"),
      Text.scrub(concat_ws(" ", Text.collapseRepeats(Text.tokens(col("text")))))
        .as("clean_text"))
    val n = col("_st.n_tokens").cast("double")
    // native one-pass feature extraction (graft_textstats) + a
    // materialization barrier (localCheckpoint — GC-released, unlike a
    // cache entry): filter pushdown and project collapsing would
    // otherwise inline the regex-scrub chain into every downstream
    // consumer (measured 7 copies in the plan, ~5s at sf0.1).
    // Materializing the clean layer once is also the 100 TB shape — a
    // corpus pipeline persists its cleaned corpus, it doesn't
    // re-derive it per downstream op.
    // the content hash is extracted WITH the features so clean_text
    // itself is dropped before any exchange — the windows downstream
    // shuffle skinny (id, source, hash, counts) rows, never documents
    val featured = cleaned
      .withColumn("_st", Text.tokenStats(Text.tokens(col("clean_text")), stopwords))
      .select(col("doc_id"), col("source"), md5(col("clean_text")).as("_h"),
        col("_st.n_tokens").as("n_tokens"),
        round(col("_st.n_distinct") / n, 6).as("distinct_ratio"),
        round(col("_st.n_stop") / n, 6).as("stop_ratio"))
      .localCheckpoint()
    val qual = featured
      .filter(col("n_tokens") >= 20 && col("distinct_ratio") >= 0.3 &&
        col("stop_ratio") >= 0.01)
    val deduped = qual
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("_h")).orderBy("doc_id")))
      .filter(col("_rn") === 1).drop("_rn", "_h")
    val capped = Sampling.quotaPerGroup(deduped, col("doc_id"), "source", 20)
    Pack.sequences(capped, "doc_id", col("n_tokens"), "source", budget = 256)
      .select("doc_id", "source", "n_tokens", "chunk_id")
      .orderBy("doc_id")
  }

  /** Edit-distance near-dup pairs on 40-char prefixes within source
    * blocks ([[graft.ext.Dedup.fuzzyPairsBlocked]]).
    */
  def dedupFuzzy(spark: SparkSession, dir: String): DataFrame =
    Dedup.fuzzyPairsBlocked(Tables.documents(spark, dir), "doc_id", "text",
        blockCol = "source", prefixLen = 40, maxDist = 12)
      .orderBy("id_a", "id_b")

  /** Collocation mining: adjacent-bigram PMI over the corpus. The
    * bigram and marginal counts are exact integers (one hash agg each,
    * partial-aggregated before their shuffles; the marginals and the
    * grand total are broadcast back); the single `ln` at scoring time
    * is the only floating-point step. Ranked on `round(pmi, 9)` with
    * (w1, w2) tie-breaks for a cross-engine-stable top 50.
    */
  def textCollocations(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = col("_t")
    val bg = Tables.documents(spark, dir)
      .select(Text.tokens(col("text")).as("_t"))
      .filter(size(t) >= 2)
      .select(explode(arrays_zip(
        slice(t, lit(1), size(t) - 1).as("w1"),
        slice(t, lit(2), size(t) - 1).as("w2"))).as("_bg"))
      .select(col("_bg.w1"), col("_bg.w2"))
    // materialized ONCE (r21): c12 feeds four consumers (the scored
    // stream, both marginal tables, the total) and the static plan
    // embeds the scan→tokenize→explode→count subtree under each —
    // AQE stage reuse does NOT collapse them at runtime (A/B:
    // ProfileCollocReuse, 0.89 → 0.67 s median, pairwise-consistent).
    // c12 is bigram-TYPE-grained — vocab-bounded, far smaller than the
    // corpus — so the checkpoint is the cheap side, and the corpus is
    // tokenized once instead of four times (the 100 TB lever).
    // Cluster deployment: localCheckpoint truncates lineage onto
    // executor-local blocks (executor loss ⇒ job re-run, not
    // recompute) — see COVERAGE "Materialization barriers".
    val c12 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .localCheckpoint()
    val cL = c12.groupBy("w1").agg(sum("c12").as("c1"))
    val cR = c12.groupBy("w2").agg(sum("c12").as("c2"))
    val n = c12.agg(sum("c12").as("n"))
    val scored = c12
      .join(broadcast(cL), "w1").join(broadcast(cR), "w2")
      .crossJoin(broadcast(n))
      .filter(col("c12") >= 5)
      .withColumn("_pmi", log((col("c12") * col("n")).cast("double") /
        (col("c1") * col("c2")).cast("double")))
    val w = Window.orderBy(round(col("_pmi"), 9).desc, col("w1"), col("w2"))
    scored.orderBy(round(col("_pmi"), 9).desc, col("w1"), col("w2")).limit(50)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col("w1"), col("w2"), col("c12"),
        round(col("_pmi"), 6).as("pmi"))
      .orderBy("rank")
  }

  /** Bigram-LM perplexity scoring — the KenLM-style quality signal of
    * corpus curation: train an add-one-smoothed bigram model on the
    * corpus itself (distributed count aggregation), then score every
    * document by its average per-bigram negative log-likelihood. High
    * avg_nll = improbable under the corpus model = noise/outlier text.
    *
    * Round-16 scale shape (tightened from r14's count+model): ONE
    * tokenize pass produces per-doc `graft_bigram_counts` arrays
    * (persisted — the model build and the scoring pass both read it,
    * the corpus is never re-tokenized); the model is ONE vocab-grain
    * exchange (groupBy bg) whose one-row fold derives BOTH the
    * context table and the vocabulary size from the collected bigram
    * table ([[graft.plans.PerplexityModel]]) and broadcasts back (J3
    * pattern); scoring happens map-side in the
    * native [[graft.plans.PerplexityScore]] expression via binary
    * search over the sorted model arrays. Nothing document-grain ever
    * shuffles — the composed form ([[textPerplexityComposed]], the
    * equality twin) moved the full bigram stream through a join and a
    * per-doc re-aggregation. Everything is exact integer counts until
    * the final ln/avg, which rounds to 4 decimals on both engines.
    */
  def textPerplexity(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val toks = Text.tokens(col("text"))
    // localCheckpoint (GC-released, never an unpersisted cache) — the
    // lazy/materialize boundary in this family is consumer count ×
    // pass cost vs array bytes: tfidf/dsir recompute their cheap count
    // pass under TWO consumers and measured faster lazy, but this pass
    // is the family's most expensive kernel (bigram hashmap + concat
    // per token); even at TWO consumers the 30× A/B kept the
    // checkpoint ahead (1.43 s ckpt vs 1.74 lazy, ProfilePerplexFuse).
    // The checkpoint carries ONLY doc_id + the bigram arrays + the
    // solo-token column — the r15 term_counts kernel and its tc array
    // bytes are gone entirely, because the vocabulary is DERIVABLE:
    // every token of a ≥2-token document appears as the w1 or w2 of
    // one of its bigrams, and 1-token documents contribute exactly
    // their solo token (a tiny collect_set supplement, no exchange).
    val pc = docs.select(col("doc_id"),
        call_function("graft_bigram_counts", toks).as("bc"),
        when(size(toks) === 1, element_at(toks, 1)).as("solo"))
      .localCheckpoint()
    // ONE imperative-aggregate exchange (graft_bigram_table, a
    // TypedImperativeAggregate merging per-partition bigram maps) with
    // the solo-token collect_set riding the SAME fold — replaces the
    // r16 two-exchange chain (explode → vocab-grain groupBy → one-task
    // collect_list+sort) and its crossJoin barrier. The COMPLETE model
    // then derives inside the one-row fold: graft_perplexity_model
    // walks the bg-sorted c2 array once, emitting the context table
    // (c1(w1) = prefix-contiguous sum of the global bigram table) and
    // the vocab size (|{w1}∪{w2}∪solo|). Measured at 30× alternating
    // A/B (ProfilePerplexPhases, equality-pinned): model fold 0.55 s
    // (two-exchange) → 0.48 s steady (TIA); the r15/r16 negatives
    // (derived-c1 table chain 2× slower, transform+concat fusion
    // slower) stay recorded in ProfilePerplexVariants/Fuse.
    val model = pc
      .agg(call_function("graft_bigram_table", col("bc")).as("c2arr"),
        collect_set(col("solo")).as("sup"))
      .select(call_function("graft_perplexity_model",
        col("c2arr"), col("sup")).as("model"))
    // the 20-byte/doc scored rows are materialized BEFORE the
    // contract's global sort: range partitioning runs a SAMPLING job
    // over its child, which would otherwise re-execute the whole
    // broadcast+scoring stage a second time (measured: sort over the
    // lazy scored child 1.08 s vs 0.84 s over the checkpointed rows
    // at 30×, ProfilePerplexSplit)
    pc.crossJoin(broadcast(model))
      .select(col("doc_id"),
        call_function("graft_perplexity", col("bc"), col("model")).as("s"))
      .select(col("doc_id"),
        coalesce(col("s.n_bigrams"), lit(0L)).as("n_bigrams"),
        col("s.avg_nll").as("avg_nll"))
      .localCheckpoint()
      .orderBy("doc_id")
  }

  /** The exploded-bigram + model-join form of [[textPerplexity]] — the
    * derivation the DuckDB oracle replays, kept as the equality twin
    * for the native rewrite's spec and scale A/B.
    */
  private[graft] def textPerplexityComposed(spark: SparkSession,
      dir: String): DataFrame = {
    val t = col("_t")
    val docs = Tables.documents(spark, dir)
    val toks = docs.select(col("doc_id"), Text.tokens(col("text")).as("_t"))
    val bg = toks.filter(size(t) >= 2)
      .select(col("doc_id"), explode(arrays_zip(
        slice(t, lit(1), size(t) - 1).as("w1"),
        slice(t, lit(2), size(t) - 1).as("w2"))).as("_bg"))
      .select(col("doc_id"), col("_bg.w1").as("w1"),
        concat_ws(" ", col("_bg.w1"), col("_bg.w2")).as("bg"))
    val c2 = bg.groupBy("bg").agg(count(lit(1)).as("_c2"))
    val c1 = bg.groupBy("w1").agg(count(lit(1)).as("_c1"))
    val v = toks.select(explode(t).as("_tok"))
      .agg(countDistinct(col("_tok")).as("_vs"))
    val scored = bg
      .join(c2, "bg").join(c1, "w1")
      .crossJoin(broadcast(v))
      .withColumn("_lp", log((col("_c2") + lit(1)).cast("double") /
        (col("_c1") + col("_vs")).cast("double")))
    val agg = scored.groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(-sum(col("_lp")) / count(lit(1)), 4).as("avg_nll"))
    docs.select(col("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"), col("avg_nll"))
      .orderBy("doc_id")
  }

  /** PII redaction over the corpus ([[Text.redactPii]]): the synthetic
    * corpus carries no PII, so deterministic spans (an email, a phone,
    * an IP derived from doc_id) are injected first — the redaction
    * behavior, not the injection, is the operator under test. Map-only,
    * zero shuffle; match counts come from the pre-redaction text.
    */
  def textRedact(spark: SparkSession, dir: String): DataFrame = {
    val injected = concat(col("text"),
      lit(" contact u"), col("doc_id"), lit("@mail.example or +1-555-"),
      lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
      lit(" ip 10.0."), pmod(col("doc_id"), lit(256)), lit(".7"))
    // materialized before the contract sort: range partitioning's
    // sampling job would re-run the triple-regex kernel a second time
    // (30× A/B: 2.58 → 1.72 s median, ProfileSortCkpt, equality-pinned)
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        regexp_count(injected, lit(Text.EmailRe)).cast("long").as("n_emails"),
        regexp_count(injected, lit(Text.PhoneRe)).cast("long").as("n_phones"),
        regexp_count(injected, lit(Text.Ipv4Re)).cast("long").as("n_ips"),
        Text.redactPii(injected).as("redacted"))
      .localCheckpoint()
      .orderBy("doc_id")
  }

  /** Gopher-style repetition signals: most-frequent word / bigram /
    * trigram mass fractions and the duplicate-trigram fraction per
    * document. The statistics never cross documents, so they are
    * computed per ROW by the one-pass native expression
    * [[graft.plans.GramRepetitionStats]] (`graft_gram_stats`) — a
    * zero-shuffle projection. The composed explode → (doc, n, gram)
    * shuffle-count form this replaced ([[textRepetitionComposed]],
    * kept as the spec twin) moved ~3× the token volume through an
    * exchange to aggregate a per-document quantity — at 10× the
    * corpus the projection form measured ~4× faster, and at 100 TB
    * the exchange it deletes would be the operator's entire cost.
    * Fractions are exact-integer divisions (engine-portable).
    */
  def textRepetition(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      // explode-form parity: a null/empty token array produced no gram
      // rows there, so the document was absent from the grouped result
      .filter(col("w").isNotNull && size(col("w")) >= 1)
      .select(col("doc_id"),
        call_function("graft_gram_stats", col("w")).as("s"))
      .select(col("doc_id"),
        col("s.n_words").as("n_words"),
        (col("s.m1").cast("double") / col("s.n_words")).as("top_word_frac"),
        (col("s.m2").cast("double") / col("s.t2")).as("top_bigram_frac"),
        (col("s.m3").cast("double") / col("s.t3")).as("top_trigram_frac"),
        (col("s.d3").cast("double") / col("s.t3")).as("dup_trigram_frac"))
      // sort-sampling rule (30× A/B 0.78 → 0.67 s, ProfileSortFamily)
      .localCheckpoint()
      .orderBy("doc_id")
  }

  /** The composed (explode + shuffle-count) form of [[textRepetition]]
    * — the derivation the DuckDB oracle replays, kept as the equality
    * twin for the native expression's spec and A/B profile.
    */
  private[graft] def textRepetitionComposed(spark: SparkSession,
      dir: String): DataFrame = {
    // project the token array ONCE: n-gram lambdas below index into it
    // per element, and indexing an attribute is O(1) while indexing the
    // `split(...)` expression would re-split the document per element
    // (O(len²) per doc — measured 27 s → 2 s at sf0.1)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
    val w = col("w")
    def gram(n: Int): Column = {
      val g = transform(sequence(lit(1), size(w) - lit(n - 1)), i =>
        struct(lit(n).as("n"),
          concat_ws(" ", (0 until n).map(k => element_at(w, i + lit(k))): _*)
            .as("gram")))
      if (n == 1) g
      else when(size(w) >= lit(n), g)
        .otherwise(expr("CAST(array() AS array<struct<n:int,gram:string>>)"))
    }
    docs
      .select(col("doc_id"),
        explode(concat(gram(1), gram(2), gram(3))).as("g"))
      .select(col("doc_id"), col("g.n").as("n"), col("g.gram").as("gram"))
      .groupBy(col("doc_id"), col("n"), col("gram"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"), col("n"))
      .agg(max(col("c")).as("top"), sum(col("c")).as("tot"),
        sum(when(col("c") >= 2, col("c")).otherwise(0L)).as("dup"))
      .groupBy(col("doc_id"))
      .agg(
        max(when(col("n") === 1, col("tot"))).as("n_words"),
        max(when(col("n") === 1, col("top"))).as("_m1"),
        max(when(col("n") === 2, col("top"))).as("_m2"),
        max(when(col("n") === 2, col("tot"))).as("_t2"),
        max(when(col("n") === 3, col("top"))).as("_m3"),
        max(when(col("n") === 3, col("tot"))).as("_t3"),
        max(when(col("n") === 3, col("dup"))).as("_d3"))
      .select(col("doc_id"), col("n_words"),
        (col("_m1").cast("double") / col("n_words")).as("top_word_frac"),
        (col("_m2").cast("double") / col("_t2")).as("top_bigram_frac"),
        (col("_m3").cast("double") / col("_t3")).as("top_trigram_frac"),
        (col("_d3").cast("double") / col("_t3")).as("dup_trigram_frac"))
      .orderBy("doc_id")
  }

  /** Shingling through the custom Generator
    * ([[graft.plans.ShingleExplode]], `graft_shingle_explode`) — one
    * row per shingle straight out of the generate loop, no
    * intermediate per-document array materialized the way
    * `explode(graft_shingles(...))` does it. Per-source shingle mass
    * and vocabulary; the oracle replays the identical shingle
    * derivation (3-gram, whole-text fallback) in SQL.
    */
  def shingleExplode(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"),
        call_function("graft_shingle_explode",
          graft.functions.Text.tokens(col("text")), lit(3)).as("shingle"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("total_shingles"),
        count_distinct(col("shingle")).as("distinct_shingles"))
      .orderBy("source")

  /** PPJoin prefix-filtered GLOBAL Jaccard dedup — same 3-gram shingle
    * sets as `dedup_ngram_jaccard` but corpus-wide (no blocking
    * column) and candidate-pruned by the prefix filter instead: exact
    * results at ~0.6% of the all-pairs candidate space at sf0.01
    * (the pruning is provably lossless — see [[graft.ext.PpJoin]]).
    */
  def dedupPpjoin(spark: SparkSession, dir: String): DataFrame =
    PpJoin.pairs(Tables.documents(spark, dir), "doc_id", "text",
        shingleN = 3, minJaccard = 0.5)
      .orderBy("id_a", "id_b")

  /** DSIR data selection: hashed-unigram importance scores against the
    * `src0` target slice, top-20% selection at the exact score
    * quantile ([[graft.ext.Dsir]]).
    */
  def selectDsir(spark: SparkSession, dir: String): DataFrame =
    Dsir.scoreAndSelect(Tables.documents(spark, dir), "doc_id", "text",
        isTarget = col("source") === "src0", quantile = 0.8)
      .orderBy("doc_id")

  /** Token-budget corpus selection: the best-scoring documents (score
    * = n_chars, ties by id) whose running token total fits half the
    * corpus's tokens — the pretraining-mix constraint, computed as a
    * two-level distributed prefix sum (range partition + local cumsum
    * + driver offsets of partition totals; no global sort, no
    * single-partition window — [[graft.ext.Sampling.selectTokenBudget]]).
    * The budget itself is a 1-row aggregate (the watermark-style
    * parameter pre-pass).
    */
  def selectTokenBudget(spark: SparkSession, dir: String): DataFrame = {
    // tokenize ONCE: the checkpoint is 3 longs per doc (≪ the text),
    // and BOTH consumers — the 1-row budget pre-pass and the two-level
    // selection — read it; without the barrier the budget head() and
    // the selection would each re-run the tokenizer over the corpus
    val t = Tables.documents(spark, dir).select(col("doc_id"),
        col("n_chars"),
        size(Text.tokens(col("text"))).cast("long").as("n_tokens"))
      .localCheckpoint()
    val budget = t.agg(sum(col("n_tokens"))).head().getLong(0) / 2
    Sampling.selectTokenBudget(t, "doc_id", "n_chars", "n_tokens", budget)
      .orderBy("doc_id")
  }

  /** BPE tokenizer-training statistic ([[graft.ext.Bpe]]): the top-20
    * adjacent character pairs by frequency-weighted count over the
    * distinct-word table — what the first BPE merge is chosen from.
    * The corpus is touched exactly once (the word-count groupBy);
    * pair counting runs on the vocab-sized word table, and the
    * ranking is a distributed top-k over the pair aggregate (the
    * `vocab_topk` idiom: TakeOrderedAndProject + a window over just
    * the k survivors).
    */
  def bpeMerges(spark: SparkSession, dir: String): DataFrame = {
    val pairs = graft.ext.Bpe.pairCounts(
      graft.ext.Bpe.wordCounts(Tables.documents(spark, dir), "text"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("pair_count").desc, col("pair"))
    pairs.orderBy(col("pair_count").desc, col("pair")).limit(20)
      .withColumn("rank", row_number().over(w).cast("long"))
      .orderBy("rank")
  }

  /** Full iterative BPE merge training
    * ([[graft.ext.Bpe.trainMerges]]): three rounds of
    * argmax-pair → apply-merge over the vocab-sized wrapped word
    * table — the loop `bpe_merges` computes the first statistic of,
    * run to an actual merge list. The corpus is scanned once; each
    * round is one vocab-sized aggregation + one map-only replace; the
    * driver holds only the three winning merges. The oracle unrolls
    * the identical rounds as chained CTEs with scalar-subquery
    * replaces over the same chr(28)/chr(29) symbol-boundary encoding.
    */
  def bpeTrain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (merges, _) = graft.ext.Bpe.trainMerges(
      Tables.documents(spark, dir), "text", iters = 3)
    merges.toDF("iter", "symbol_a", "symbol_b", "pair_count")
      .orderBy("iter")
  }

  /** The trained tokenizer's vocabulary: top-20 subwords by corpus
    * frequency AFTER the three [[bpeTrain]] merges — the application
    * side of BPE training (what the tokenizer's vocab file starts
    * from). Distributed top-k over the exploded final vocab (the
    * `vocab_topk` idiom).
    */
  def bpeVocab(spark: SparkSession, dir: String): DataFrame = {
    val (_, words) = graft.ext.Bpe.trainMerges(
      Tables.documents(spark, dir), "text", iters = 3)
    val agg = graft.ext.Bpe.subwordCounts(words)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("subword"))
    agg.orderBy(col("n").desc, col("subword")).limit(20)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select("rank", "subword", "n")
      .orderBy("rank")
  }

  /** The APPLICATION side of the trained tokenizer: per-document
    * tokenized length under the 3-merge BPE vocab — the statistic
    * token-budget selection should run on (a whitespace token count
    * under-prices rare-word-heavy documents; the budget a trainer pays
    * is BPE tokens). Shape at 100 TB: the word → subword-count map is
    * VOCAB-sized (Heaps' law), so it broadcasts; the corpus pass is
    * one explode + broadcast join + per-doc sum — map-side only, no
    * corpus shuffle beyond the doc_id agg.
    */
  def bpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val (_, words) = graft.ext.Bpe.trainMerges(docs, "text", iters = 3)
    // stripping the boundary chars recovers the RAW word (merges
    // preserve character content), so the map key is unique per word
    val map = words.select(
      translate(col("w"), graft.ext.Bpe.Open + graft.ext.Bpe.Close, "")
        .as("word"),
      size(split(expr("substring(w, 2, length(w) - 2)"),
        s"${graft.ext.Bpe.Close}${graft.ext.Bpe.Open}"))
        .cast("long").as("n_sym"))
    val perDoc = docs
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("word"))
      .filter(length(col("word")) >= 1)
      .join(broadcast(map), Seq("word")) // every corpus word is in the vocab
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("n_sym")).as("n_bpe_tokens"))
    // empty/null-text docs still get a (0, 0) row
    docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"))
      .orderBy("doc_id")
  }

  /** Kneser–Ney count tables — the LM-training producer side
    * complementing [[textPerplexity]]'s scoring side (Kneser & Ney
    * 1995; the KN unigram backoff weights a word by how many DISTINCT
    * contexts it follows, not how often it occurs — "Francisco" is
    * frequent but only ever follows "San"). Top-30 words by
    * continuation count N1+(·,w) with the raw unigram count and the
    * KN continuation probability N1+(·,w) / |distinct bigrams|.
    *
    * Scale shape: one corpus pass explodes bigrams, `countDistinct`
    * over (w1,w2) is a partial-agg'd distinct on short string pairs,
    * the probability denominator is a 1-row broadcast aggregate, and
    * the ranking is the distributed top-k idiom.
    */
  def lmKnCounts(spark: SparkSession, dir: String): DataFrame = {
    val t = col("_t")
    val toks = Tables.documents(spark, dir)
      .select(Text.tokens(col("text")).as("_t"))
    val bg = toks.filter(size(t) >= 2)
      .select(explode(arrays_zip(
        slice(t, lit(1), size(t) - 1).as("w1"),
        slice(t, lit(2), size(t) - 1).as("w2"))).as("_bg"))
      .select(col("_bg.w1").as("w1"), col("_bg.w2").as("w2"))
    // ONE bigram-TYPE table serves both KN statistics (r21): the
    // continuation count per word is `distinct w1 per w2` = the ROW
    // count per w2 of the distinct-bigram table, and the normalizer is
    // that table's total row count. Building `types` once (vocab²-
    // bounded, the cheap side to checkpoint) replaces a token-grained
    // countDistinct shuffle PLUS a second full tokenize+explode pass
    // for the normalizer — AQE stage reuse does not collapse the
    // duplicated subtrees (measured on the sibling shape,
    // ProfileCollocReuse). Exact integer counts either way. Cluster
    // deployment: lineage-truncating barrier — COVERAGE
    // "Materialization barriers".
    val types = bg.distinct().localCheckpoint()
    val cont = types.groupBy(col("w2").as("word"))
      .agg(count(lit(1)).as("cont_count"))
    val uni = toks.select(explode(t).as("word"))
      .groupBy("word").agg(count(lit(1)).as("uni_count"))
    val totalBigrams = types.agg(count(lit(1)).as("_nb"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cont_count").desc, col("word"))
    cont.join(uni, "word")
      .crossJoin(broadcast(totalBigrams))
      .orderBy(col("cont_count").desc, col("word")).limit(30)
      .select(col("word"), col("cont_count"), col("uni_count"),
        round(col("cont_count").cast("double") / col("_nb"), 6)
          .as("kn_prob"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .orderBy("rank")
  }

  /** Deterministic global corpus shuffle into 100-document training
    * shards ([[graft.ext.Sampling.shuffleShards]]): pseudorandom but
    * reproducible positions from md5("e0|doc_id"), global rank via the
    * two-level prefix pattern (no global sort, no single-partition
    * window). The oracle IS the naive global window — the distributed
    * rank must be bit-identical to it.
    */
  def corpusShuffle(spark: SparkSession, dir: String): DataFrame =
    Sampling.shuffleShards(Tables.documents(spark, dir), "doc_id",
        docsPerShard = 100, seed = "e0")
      .orderBy("doc_id")

  /** The ON-DISK shard contract ([[graft.ext.Sampling.writeShards]]):
    * materialize the shuffled corpus as `shard=N` parquet dirs, then
    * read the layout back and gate it BY VALUE against the same window
    * oracle as `corpus_shuffle` — `file_pos` is the row's physical
    * index within its file (parquet `_metadata.row_index`, an observed
    * fact of the written bytes, not a recomputation) and must equal
    * `pos_in_shard`; `n_files` counts distinct files under each shard
    * dir and must be 1. A wrong in-file order, a split shard, or a
    * bad coordinate join-back all shift these values and break the
    * hash match. The on-disk layout IS the data-loader interface: one
    * file per shard (shard-parallel workers), in-file order = sample
    * order (sequential read, no re-sort).
    */
  def shardLayout(spark: SparkSession, dir: String): DataFrame = {
    val tmp = Files.createTempDirectory("graft-shardlayout")
      .resolve("shards").toString
    Sampling.writeShards(
      Tables.documents(spark, dir).select("doc_id", "source", "n_chars"),
      "doc_id", tmp, docsPerShard = 100, seed = "e0")
    val back = spark.read.parquet(tmp).select(
      col("shard").cast("long").as("shard"),
      col("doc_id"), col("source"), col("n_chars"), col("pos_in_shard"),
      col("_metadata.row_index").as("file_pos"),
      col("_metadata.file_path").as("_f"))
    // |shards| = |corpus|/docsPerShard rows — an aggregate over file
    // METADATA, broadcast back onto the per-document rows
    val filesPerShard = back.groupBy(col("shard"))
      .agg(countDistinct(col("_f")).as("n_files"))
    back.drop("_f")
      .join(broadcast(filesPerShard), Seq("shard"))
      .orderBy("doc_id")
  }

  /** Mixture-weighted corpus order ([[graft.ext.Sampling
    * .mixtureShards]]): `src0` documents weighted 3×, everything else
    * 1× — any prefix of the shard order then samples src0 at 3:1 odds
    * per document. Exponential-race keys (ln(u)/w, the
    * `sample_weighted` idiom) make the weighted order deterministic
    * and SQL-replayable; the oracle is the global window over the
    * same keys.
    */
  def mixtureShards(spark: SparkSession, dir: String): DataFrame =
    Sampling.mixtureShards(
        Tables.documents(spark, dir).withColumn("_w",
          when(col("source") === "src0", 3.0).otherwise(1.0)),
        "doc_id", "_w", docsPerShard = 100, seed = "m0")
      .orderBy("doc_id")

  val defs: Map[String, Q] = Map(
    "mixture_shards" -> (mixtureShards _),
    "corpus_shuffle" -> (corpusShuffle _),
    "shard_layout" -> (shardLayout _),
    "bpe_merges" -> (bpeMerges _),
    "bpe_train" -> (bpeTrain _),
    "bpe_vocab" -> (bpeVocab _),
    "bpe_encode" -> (bpeEncode _),
    "lm_kn_counts" -> (lmKnCounts _),
    "select_token_budget" -> (selectTokenBudget _),
    "dedup_ppjoin" -> (dedupPpjoin _),
    "select_dsir" -> (selectDsir _),
    "dedup_lsh_index" -> (dedupLshIndex _),
    "shingle_explode" -> (shingleExplode _),
    "text_repetition" -> (textRepetition _),
    "text_collocations" -> (textCollocations _),
    "text_perplexity" -> (textPerplexity _),
    "text_redact" -> (textRedact _),
    "dedup_fuzzy" -> (dedupFuzzy _),
    "corpus_pipeline" -> (corpusPipeline _),
    "dedup_incremental" -> (dedupIncremental _),
    "heavy_hitters" -> (heavyHitters _),
    "vocab_topk" -> (vocabTopk _),
    "chunk_documents" -> (chunkDocuments _),
    "mix_weighted" -> (mixWeighted _),
    "mix_temperature" -> (mixTemperature _),
    "decontaminate" -> (decontaminate _),
    "split_leakage_safe" -> (splitLeakageSafe _),
    "text_clean" -> (textClean _),
    "text_quality" -> (textQuality _),
    "pack_sequences" -> (packSequences _),
    "sample_quota" -> (sampleQuota _),
    "text_stats" -> (textStats _),
    "text_tfidf" -> (textTfidf _),
    "text_bm25" -> (textBm25 _),
    "dedup_clusters" -> (dedupClusters _),
    "text_langid" -> (textLangid _),
    "text_fingerprint" -> (textFingerprint _),
    "dedup_exact" -> (dedupExact _),
    "dedup_substring" -> (dedupSubstring _),
    "dedup_substring_keepfirst" -> (dedupSubstringKeepfirst _),
    "dedup_simhash" -> (dedupSimhash _),
    "dedup_minhash_lsh" -> (dedupMinhashLsh _),
    "dedup_minhash_fast" -> (dedupMinhashFast _),
    "dedup_ngram_jaccard" -> (dedupNgramJaccard _))

  private val shingleCte =
    """sh AS (SELECT doc_id, source,
      |  list_distinct(CASE WHEN len(string_split(text, ' ')) >= 3
      |    THEN list_transform(generate_series(1, len(string_split(text, ' ')) - 2),
      |      i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))
      |    ELSE [array_to_string(string_split(text, ' '), ' ')] END) AS s
      |  FROM documents)""".stripMargin

  /** Shared CTE chain of the iterative-BPE oracles: wrapped vocab +
    * three unrolled merge rounds (pair counts -> argmax -> scalar-
    * subquery replace), over the chr(28)/chr(29) symbol-boundary
    * encoding [[graft.ext.Bpe]] documents. Ends open (consumers append
    * their final CTE/SELECT). The replace arguments are coalesced to
    * the no-op chr(28)->chr(28) when a round's argmax CTE is EMPTY
    * (vocab exhausted before round 3): a NULL pattern would otherwise
    * null out EVERY word and bpe_vocab would return an empty
    * vocabulary where the Spark loop stops cleanly with the real one.
    */
  private def bpeRoundCtes: String = {
    def round(i: Int) = {
      val prev = s"w${i - 1}"
      s"""s$i AS (SELECT wf, string_split(substr(w, 2, len(w) - 2),
         |    chr(29) || chr(28)) AS s FROM $prev),
         |p$i AS (SELECT s[i] AS a, s[i + 1] AS b,
         |    CAST(sum(wf) AS BIGINT) AS cnt
         |  FROM (SELECT wf, s, unnest(generate_series(1, len(s) - 1)) AS i
         |    FROM s$i) t
         |  GROUP BY 1, 2),
         |b$i AS (SELECT a, b, cnt FROM p$i ORDER BY cnt DESC, a, b LIMIT 1),
         |w$i AS (SELECT replace(w,
         |    coalesce(chr(28) || (SELECT a FROM b$i) || chr(29) ||
         |      chr(28) || (SELECT b FROM b$i) || chr(29), chr(28)),
         |    coalesce(chr(28) || (SELECT a FROM b$i) ||
         |      (SELECT b FROM b$i) || chr(29), chr(28))) AS w, wf
         |  FROM $prev),""".stripMargin
    }
    s"""wc AS (SELECT word, CAST(count(*) AS BIGINT) AS wf
       |  FROM (SELECT unnest(string_split(text, ' ')) AS word
       |    FROM documents)
       |  WHERE len(word) >= 1 GROUP BY word),
       |w0 AS (SELECT regexp_replace(word, '(.)',
       |    chr(28) || '\\1' || chr(29), 'g') AS w, wf FROM wc),
       |${round(1)}
       |${round(2)}
       |${round(3)}""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // The weighted order replayed as one global window over the same
    // exponential keys (ln/division double math matches across
    // engines — the sample_weighted precedent).
    "mixture_shards" ->
      """WITH h AS (SELECT doc_id,
        |    CASE WHEN source = 'src0' THEN 3.0 ELSE 1.0 END AS w,
        |    substr(md5(concat('m0|', CAST(doc_id AS VARCHAR))), 1, 15)
        |      AS hs
        |  FROM documents),
        |k AS (SELECT doc_id,
        |    ln((CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(generate_series(1, 15), i ->
        |          CAST(strpos('0123456789abcdef', substr(hs, i, 1)) - 1
        |            AS BIGINT))), (a, x) -> a * 16 + x) AS DOUBLE) + 1.0)
        |      / 1.152921504606847e18) / w AS mk
        |  FROM h),
        |r AS (SELECT doc_id, mk,
        |    row_number() OVER (ORDER BY mk DESC, doc_id) - 1 AS pos
        |  FROM k)
        |SELECT doc_id, round(mk, 6) AS mix_key,
        |  CAST(pos // 100 AS BIGINT) AS shard,
        |  CAST(pos % 100 AS BIGINT) AS pos_in_shard
        |FROM r ORDER BY doc_id""".stripMargin,
    // KN continuation counts replayed serially: bigrams via
    // list_zip(word[1:-1], word[2:]), distinct-left-context count per
    // word, unigram counts, the distinct-bigram denominator, top-30.
    "lm_kn_counts" ->
      """WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
        |bg AS (SELECT u.w[1] AS w1, u.w[2] AS w2 FROM (
        |    SELECT unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS w
        |    FROM toks WHERE len(t) >= 2) u),
        |cont AS (SELECT w2 AS word,
        |    CAST(count(DISTINCT w1) AS BIGINT) AS cont_count
        |  FROM bg GROUP BY w2),
        |uni AS (SELECT word, count(*) AS uni_count FROM (
        |    SELECT unnest(t) AS word FROM toks) GROUP BY word),
        |nb AS (SELECT count(*) AS _nb FROM
        |    (SELECT DISTINCT w1, w2 FROM bg))
        |SELECT word, cont_count, uni_count,
        |  round(cont_count / _nb, 6) AS kn_prob,
        |  row_number() OVER (ORDER BY cont_count DESC, word) AS rank
        |FROM cont JOIN uni USING (word), nb
        |ORDER BY cont_count DESC, word LIMIT 30""".stripMargin,
    // BPE first-merge statistic replayed serially: word counts →
    // per-word adjacent 2-grams weighted by word frequency → top-20.
    // sum(BIGINT) is HUGEINT in DuckDB — cast back to BIGINT.
    "bpe_merges" ->
      """WITH w AS (SELECT word, count(*) AS wf FROM (
        |    SELECT unnest(string_split(text, ' ')) AS word
        |    FROM documents) WHERE len(word) >= 1 GROUP BY word),
        |p AS (SELECT substr(word, i, 2) AS pair,
        |    CAST(sum(wf) AS BIGINT) AS pair_count
        |  FROM (SELECT word, wf,
        |      unnest(generate_series(1, len(word) - 1)) AS i
        |    FROM w WHERE len(word) >= 2)
        |  GROUP BY 1)
        |SELECT pair, pair_count,
        |  row_number() OVER (ORDER BY pair_count DESC, pair) AS rank
        |FROM p ORDER BY pair_count DESC, pair LIMIT 20""".stripMargin,
    // the identical three merge rounds, unrolled as CTEs; the last
    // comma-terminated CTE chain gets a no-op terminal CTE
    "bpe_train" ->
      (s"WITH $bpeRoundCtes\nfin AS (SELECT 1)\n" +
        """SELECT * FROM (
          |  SELECT CAST(1 AS BIGINT) AS iter, a AS symbol_a,
          |    b AS symbol_b, cnt AS pair_count FROM b1
          |  UNION ALL SELECT 2, a, b, cnt FROM b2
          |  UNION ALL SELECT 3, a, b, cnt FROM b3) t
          |ORDER BY iter""".stripMargin),
    "bpe_vocab" ->
      (s"WITH $bpeRoundCtes\n" +
        """sw AS (SELECT unnest(string_split(substr(w, 2, len(w) - 2),
          |    chr(29) || chr(28))) AS subword, wf FROM w3),
          |agg AS (SELECT subword, CAST(sum(wf) AS BIGINT) AS n
          |  FROM sw GROUP BY 1),
          |r AS (SELECT subword, n, CAST(row_number() OVER (
          |    ORDER BY n DESC, subword) AS BIGINT) AS rank FROM agg)
          |SELECT rank, subword, n FROM r WHERE rank <= 20
          |ORDER BY rank""".stripMargin),
    // Tokenized length under the trained vocab: strip the boundary
    // chars of the final wrapped vocab to recover each raw word, count
    // its symbols, join back over the corpus tokens.
    "bpe_encode" ->
      (s"WITH $bpeRoundCtes\n" +
        """map AS (SELECT replace(replace(w, chr(28), ''), chr(29), '')
          |    AS word,
          |  CAST(len(string_split(substr(w, 2, len(w) - 2),
          |    chr(29) || chr(28))) AS BIGINT) AS n_sym FROM w3),
          |dt AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
          |  FROM documents),
          |dtf AS (SELECT doc_id, word FROM dt WHERE len(word) >= 1),
          |per AS (SELECT t.doc_id,
          |    CAST(count(*) AS BIGINT) AS n_words,
          |    CAST(sum(m.n_sym) AS BIGINT) AS n_bpe_tokens
          |  FROM dtf t JOIN map m USING (word) GROUP BY t.doc_id)
          |SELECT d.doc_id,
          |  CAST(coalesce(p.n_words, 0) AS BIGINT) AS n_words,
          |  CAST(coalesce(p.n_bpe_tokens, 0) AS BIGINT) AS n_bpe_tokens
          |FROM documents d LEFT JOIN per p USING (doc_id)
          |ORDER BY d.doc_id""".stripMargin),
    // The written layout replayed from first principles: the same
    // md5 window as corpus_shuffle supplies the expected coordinates,
    // and the physical facts the Spark side OBSERVES from the parquet
    // bytes (in-file row index, files per shard dir) must equal the
    // contract's constants — file_pos = pos_in_shard, n_files = 1.
    "shard_layout" ->
      """WITH h AS (SELECT doc_id, source, n_chars,
        |    substr(md5(concat('e0|', CAST(doc_id AS VARCHAR))), 1, 15)
        |      AS hs
        |  FROM documents),
        |k AS (SELECT doc_id, source, n_chars,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(generate_series(1, 15), i ->
        |        CAST(strpos('0123456789abcdef', substr(hs, i, 1)) - 1
        |          AS BIGINT))), (a, x) -> a * 16 + x) AS sk
        |  FROM h),
        |r AS (SELECT doc_id, source, n_chars,
        |    row_number() OVER (ORDER BY sk, doc_id) - 1 AS pos
        |  FROM k)
        |SELECT CAST(pos // 100 AS BIGINT) AS shard, doc_id, source,
        |  n_chars,
        |  CAST(pos % 100 AS BIGINT) AS pos_in_shard,
        |  CAST(pos % 100 AS BIGINT) AS file_pos,
        |  CAST(1 AS BIGINT) AS n_files
        |FROM r ORDER BY doc_id""".stripMargin,
    // The two-level distributed rank must be bit-identical to the
    // serial global numbering (same md5-hex-to-int idiom as
    // sample_weighted's oracle).
    "corpus_shuffle" ->
      """WITH h AS (SELECT doc_id,
        |    substr(md5(concat('e0|', CAST(doc_id AS VARCHAR))), 1, 15)
        |      AS hs
        |  FROM documents),
        |k AS (SELECT doc_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(generate_series(1, 15), i ->
        |        CAST(strpos('0123456789abcdef', substr(hs, i, 1)) - 1
        |          AS BIGINT))), (a, x) -> a * 16 + x) AS shuffle_key
        |  FROM h),
        |r AS (SELECT doc_id, shuffle_key,
        |    row_number() OVER (ORDER BY shuffle_key, doc_id) - 1 AS pos
        |  FROM k)
        |SELECT doc_id, shuffle_key,
        |  CAST(pos // 100 AS BIGINT) AS shard,
        |  CAST(pos % 100 AS BIGINT) AS pos_in_shard
        |FROM r ORDER BY doc_id""".stripMargin,
    // replays the selection as a plain windowed cumsum — the oracle
    // proves the two-level prefix sum equals the single-window answer
    "select_token_budget" ->
      """WITH t AS (SELECT doc_id, n_chars,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |b AS (SELECT CAST(sum(n_tokens) // 2 AS BIGINT) AS budget FROM t),
        |c AS (SELECT doc_id, n_chars, n_tokens,
        |    CAST(sum(n_tokens) OVER (ORDER BY n_chars DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum_tokens
        |  FROM t)
        |SELECT doc_id, n_chars, n_tokens, cum_tokens
        |FROM c, b WHERE cum_tokens <= budget
        |ORDER BY doc_id""".stripMargin,
    // Replays the persisted-index LSH probe: identical md5 minhash
    // signatures and 4x4 banding for corpus AND batch, band-bucket
    // join restricted to batch-vs-corpus, exact Jaccard verify,
    // per-batch-doc aggregation. Identical derivation to
    // dedup_minhash_lsh's — the persisted index changes WHERE the
    // postings live, not what they contain.
    "dedup_lsh_index" ->
      s"""WITH $shingleCte,
        |sig AS (SELECT doc_id, s,
        |  list_transform(generate_series(0, 15),
        |    i -> list_min(list_transform(s, x -> md5(i || '|' || x)))) AS g
        |  FROM sh),
        |bands AS (SELECT doc_id, b,
        |    md5(array_to_string(g[4*b+1:4*b+4], '|')) AS bk
        |  FROM sig, generate_series(0, 3) gs(b)),
        |cand AS (SELECT DISTINCT bb.doc_id, cc.doc_id AS c_id
        |  FROM bands bb JOIN bands cc ON bb.b = cc.b AND bb.bk = cc.bk
        |  WHERE bb.doc_id % 5 = 0 AND cc.doc_id % 5 <> 0),
        |near AS (SELECT cand.doc_id, cand.c_id
        |  FROM cand JOIN sh sa ON sa.doc_id = cand.doc_id
        |    JOIN sh sb ON sb.doc_id = cand.c_id
        |  WHERE round(CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE) /
        |    (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))), 4)
        |    >= 0.5),
        |agg AS (SELECT doc_id, min(c_id) AS lsh_match, count(*) AS n_lsh
        |  FROM near GROUP BY doc_id)
        |SELECT d.doc_id, a.lsh_match, coalesce(a.n_lsh, 0) AS n_lsh
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 0) d
        |LEFT JOIN agg a USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // Replays the full PPJoin derivation: canonical (df, token) sort,
    // prefix slice L = sz - ceil(t*sz) + 1, prefix self-join with the
    // symmetric length filter, exact intersect verify. Because the
    // pruning is lossless, this equals the unpruned all-pairs answer —
    // the oracle proves the prefix filter dropped nothing.
    "dedup_ppjoin" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS wd FROM documents),
        |s AS (SELECT doc_id, list_distinct(CASE WHEN len(wd) >= 3
        |    THEN list_transform(generate_series(1, len(wd) - 2),
        |      i -> array_to_string(wd[i:i+2], ' '))
        |    ELSE [array_to_string(wd, ' ')] END) AS toks FROM w),
        |p AS (SELECT doc_id, unnest(toks) AS tok FROM s),
        |d AS (SELECT tok, count(*) AS dfreq FROM p GROUP BY tok),
        |st AS (SELECT p.doc_id, list(p.tok ORDER BY d.dfreq, p.tok) AS stoks,
        |    count(*) AS sz
        |  FROM p JOIN d USING (tok) GROUP BY p.doc_id),
        |pre AS (SELECT doc_id, sz,
        |    unnest(stoks[1 : CAST(sz - ceil(0.5 * sz) + 1 AS INT)]) AS ptok
        |  FROM st),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM pre a JOIN pre b ON a.ptok = b.ptok AND a.doc_id < b.doc_id
        |  WHERE b.sz >= ceil(0.5 * a.sz) AND a.sz >= ceil(0.5 * b.sz)),
        |v AS (SELECT id_a, id_b, len(list_intersect(x.stoks, y.stoks)) AS inter,
        |    x.sz AS sza, y.sz AS szb
        |  FROM cand JOIN st x ON x.doc_id = cand.id_a
        |    JOIN st y ON y.doc_id = cand.id_b)
        |SELECT id_a, id_b,
        |  round(CAST(inter AS DOUBLE) / (sza + szb - inter), 4) AS jaccard
        |FROM v
        |WHERE round(CAST(inter AS DOUBLE) / (sza + szb - inter), 4) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,
    // Replays the DSIR scoring: md5 bucket hash, add-1 smoothed bucket
    // probabilities for target vs raw, per-bucket micro-int log ratio,
    // BIGINT per-doc sums, exact quantile threshold.
    "select_dsir" ->
      """WITH p AS (SELECT doc_id, source,
        |    unnest(string_split(coalesce(text, ''), ' ')) AS tok
        |  FROM documents),
        |b AS (SELECT doc_id, source, substring(md5(tok), 1, 2) AS bucket FROM p),
        |cnt AS (SELECT bucket, count(*) AS cr,
        |    sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS ct
        |  FROM b GROUP BY bucket),
        |tot AS (SELECT sum(cr) AS nr, sum(ct) AS nt FROM cnt),
        |lr AS (SELECT bucket,
        |    CAST(round(1e6 * (ln((ct + 1.0) / (tot.nt + 256.0))
        |      - ln((cr + 1.0) / (tot.nr + 256.0)))) AS BIGINT) AS lrm
        |  FROM cnt, tot),
        |sc AS (SELECT b.doc_id, sum(lr.lrm) AS sm
        |  FROM b JOIN lr USING (bucket) GROUP BY b.doc_id),
        |thr AS (SELECT quantile_cont(sm, 0.8) AS t FROM sc)
        |SELECT doc_id, round(sm / 1e6, 6) AS score,
        |  CASE WHEN sm >= thr.t THEN 1 ELSE 0 END AS selected
        |FROM sc, thr ORDER BY doc_id""".stripMargin,
    // Mirrors shingleExplode: identical 3-gram derivation with the
    // whole-text fallback, counted per source.
    "shingle_explode" ->
      """WITH t AS (SELECT source, string_split(text, ' ') AS w
        |  FROM documents),
        |s AS (SELECT source, unnest(CASE WHEN len(w) >= 3
        |    THEN list_transform(generate_series(1, len(w) - 2),
        |      i -> array_to_string(w[i:i+2], ' '))
        |    ELSE [array_to_string(w, ' ')] END) AS shingle
        |  FROM t)
        |SELECT source, count(*) AS total_shingles,
        |  count(DISTINCT shingle) AS distinct_shingles
        |FROM s GROUP BY 1 ORDER BY source""".stripMargin,
    // Mirrors textRepetition: one n-gram stream for n ∈ {1,2,3}, count
    // per (doc, n, gram), then top/total/duplicate mass fractions.
    "text_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g AS (
        |  SELECT doc_id, 1 AS n, unnest(w) AS gram FROM t
        |  UNION ALL
        |  SELECT doc_id, 2 AS n,
        |    unnest(list_transform(generate_series(1, len(w) - 1),
        |      i -> w[i] || ' ' || w[i + 1])) AS gram
        |  FROM t WHERE len(w) >= 2
        |  UNION ALL
        |  SELECT doc_id, 3 AS n,
        |    unnest(list_transform(generate_series(1, len(w) - 2),
        |      i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS gram
        |  FROM t WHERE len(w) >= 3),
        |c AS (SELECT doc_id, n, gram, count(*) AS c FROM g GROUP BY 1, 2, 3),
        |s AS (SELECT doc_id, n, max(c) AS top, CAST(sum(c) AS BIGINT) AS tot,
        |        CAST(coalesce(sum(c) FILTER (WHERE c >= 2), 0) AS BIGINT) AS dup
        |      FROM c GROUP BY 1, 2)
        |SELECT doc_id,
        |  max(CASE WHEN n = 1 THEN tot END) AS n_words,
        |  CAST(max(CASE WHEN n = 1 THEN top END) AS DOUBLE)
        |    / max(CASE WHEN n = 1 THEN tot END) AS top_word_frac,
        |  CAST(max(CASE WHEN n = 2 THEN top END) AS DOUBLE)
        |    / max(CASE WHEN n = 2 THEN tot END) AS top_bigram_frac,
        |  CAST(max(CASE WHEN n = 3 THEN top END) AS DOUBLE)
        |    / max(CASE WHEN n = 3 THEN tot END) AS top_trigram_frac,
        |  CAST(max(CASE WHEN n = 3 THEN dup END) AS DOUBLE)
        |    / max(CASE WHEN n = 3 THEN tot END) AS dup_trigram_frac
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Mirrors textPerplexity: add-one bigram LM trained on the corpus,
    // per-doc average negative log-likelihood; counts exact, ln/round
    // only at the end.
    "text_perplexity" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |bg AS (
        |  SELECT doc_id, l[i] AS w1, l[i] || ' ' || l[i + 1] AS bg
        |  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l) - 1)) AS i
        |        FROM t WHERE len(l) >= 2)
        |), c2 AS (SELECT bg, count(*) AS c2 FROM bg GROUP BY 1),
        |c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
        |v AS (SELECT count(DISTINCT tok) AS vs
        |      FROM (SELECT unnest(l) AS tok FROM t)),
        |sc AS (
        |  SELECT b.doc_id,
        |    ln((c2.c2 + 1)::DOUBLE / (c1.c1 + v.vs)::DOUBLE) AS lp
        |  FROM bg b JOIN c2 USING (bg) JOIN c1 USING (w1) CROSS JOIN v),
        |agg AS (
        |  SELECT doc_id, count(*) AS n_bigrams,
        |    round(-sum(lp) / count(*), 4) AS avg_nll
        |  FROM sc GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(COALESCE(agg.n_bigrams, 0) AS BIGINT) AS n_bigrams, agg.avg_nll
        |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "text_collocations" ->
      """WITH t AS (SELECT string_split(text, ' ') AS l FROM documents),
        |bg AS (
        |  SELECT l[i] AS w1, l[i + 1] AS w2
        |  FROM (SELECT l, unnest(generate_series(1, len(l) - 1)) AS i
        |        FROM t WHERE len(l) >= 2)
        |), c AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
        |m AS (SELECT w1, w2, c12,
        |    sum(c12) OVER (PARTITION BY w1) AS c1,
        |    sum(c12) OVER (PARTITION BY w2) AS c2,
        |    sum(c12) OVER () AS n FROM c),
        |s AS (SELECT w1, w2, c12,
        |    ln(CAST(c12 * n AS DOUBLE) / CAST(c1 * c2 AS DOUBLE)) AS pmi
        |  FROM m WHERE c12 >= 5)
        |SELECT CAST(row_number() OVER (ORDER BY round(pmi, 9) DESC, w1, w2)
        |    AS BIGINT) AS rank,
        |  w1, w2, c12, round(pmi, 6) AS pmi
        |FROM s ORDER BY rank LIMIT 50""".stripMargin,
    "text_redact" ->
      """WITH inj AS (SELECT doc_id,
        |  text || ' contact u' || CAST(doc_id AS VARCHAR)
        |    || '@mail.example or +1-555-'
        |    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |    || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7' AS s
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(s,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(s,
        |    '\+[0-9]{1,2}-[0-9]{3}-[0-9]{3,6}')) AS BIGINT) AS n_phones,
        |  CAST(len(regexp_extract_all(s,
        |    '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS BIGINT) AS n_ips,
        |  regexp_replace(regexp_replace(regexp_replace(s,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\+[0-9]{1,2}-[0-9]{3}-[0-9]{3,6}', '<PHONE>', 'g'),
        |    '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g') AS redacted
        |FROM inj ORDER BY doc_id""".stripMargin,
    "dedup_fuzzy" ->
      """WITH p AS (SELECT doc_id, source, substr(text, 1, 40) AS pf
        |  FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(levenshtein(a.pf, b.pf) AS BIGINT) AS edit_dist
        |FROM p a JOIN p b ON a.source = b.source AND a.doc_id < b.doc_id
        |WHERE levenshtein(a.pf, b.pf) <= 12
        |ORDER BY id_a, id_b""".stripMargin,
    "corpus_pipeline" ->
      """WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS l
        |  FROM documents),
        |k AS (SELECT doc_id, source,
        |  list_filter(list_transform(generate_series(1, len(l)), i ->
        |    CASE WHEN l[i] IS DISTINCT FROM l[i-1] THEN l[i] END),
        |    v -> v IS NOT NULL) AS kept
        |  FROM t),
        |c AS (SELECT doc_id, source,
        |  regexp_replace(regexp_replace(regexp_replace(
        |    array_to_string(kept, ' '),
        |    'https?://[^ ]+', '<URL>', 'g'),
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
        |    '[0-9]{7,}', '<NUM>', 'g') AS clean_text
        |  FROM k),
        |q AS (SELECT doc_id, source, clean_text,
        |  string_split(clean_text, ' ') AS cl FROM c),
        |f AS (SELECT doc_id, source, clean_text,
        |  CAST(len(cl) AS BIGINT) AS n_tokens,
        |  round(CAST(len(list_distinct(cl)) AS DOUBLE) / len(cl), 6)
        |    AS distinct_ratio,
        |  round(CAST(len(list_filter(cl,
        |    x -> x IN ('the','a','or','and','of','to','in'))) AS DOUBLE)
        |    / len(cl), 6) AS stop_ratio
        |  FROM q),
        |g AS (SELECT * FROM f WHERE n_tokens >= 20
        |  AND distinct_ratio >= 0.3 AND stop_ratio >= 0.01),
        |d AS (SELECT * FROM (SELECT g.*, row_number() OVER (
        |    PARTITION BY md5(clean_text) ORDER BY doc_id) AS rn FROM g)
        |  WHERE rn = 1),
        |s AS (SELECT * FROM (SELECT d.doc_id, d.source, d.n_tokens,
        |    row_number() OVER (PARTITION BY d.source
        |      ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS srank
        |    FROM d)
        |  WHERE srank <= 20),
        |o AS (SELECT doc_id, source, n_tokens,
        |  CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY source
        |    ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |    AS start_offset
        |  FROM s)
        |SELECT doc_id, source, n_tokens,
        |  source || '_' ||
        |    CAST(CAST(floor(start_offset / 256) AS BIGINT) AS VARCHAR)
        |    AS chunk_id
        |FROM o ORDER BY doc_id""".stripMargin,
    "dedup_incremental" ->
      s"""WITH $shingleCte,
        |b AS (SELECT doc_id, source, s FROM sh WHERE doc_id % 5 = 0),
        |c AS (SELECT doc_id, source, s FROM sh WHERE doc_id % 5 <> 0),
        |ex AS (SELECT a.doc_id, min(x.doc_id) AS exact_match
        |  FROM documents a JOIN documents x ON md5(a.text) = md5(x.text)
        |    AND x.doc_id % 5 <> 0
        |  WHERE a.doc_id % 5 = 0 GROUP BY 1),
        |nr AS (SELECT b.doc_id, min(c.doc_id) AS near_match,
        |    count(*) AS n_near
        |  FROM b JOIN c ON b.source = c.source AND
        |    round(CAST(len(list_intersect(b.s, c.s)) AS DOUBLE) /
        |      (len(b.s) + len(c.s) - len(list_intersect(b.s, c.s))), 4)
        |      >= 0.5
        |  GROUP BY 1)
        |SELECT d.doc_id, ex.exact_match, nr.near_match,
        |  CAST(COALESCE(nr.n_near, 0) AS BIGINT) AS n_near
        |FROM documents d
        |  LEFT JOIN ex ON d.doc_id = ex.doc_id
        |  LEFT JOIN nr ON d.doc_id = nr.doc_id
        |WHERE d.doc_id % 5 = 0 ORDER BY d.doc_id""".stripMargin,
    "heavy_hitters" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS item
        |  FROM documents),
        |n AS (SELECT count(*) AS c FROM t)
        |SELECT item, count(*) AS freq FROM t CROSS JOIN n
        |GROUP BY item, n.c HAVING count(*) * 200 > n.c
        |ORDER BY item""".stripMargin,
    "vocab_topk" ->
      """WITH t0 AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |t AS (SELECT * FROM t0 WHERE len(term) >= 1),
        |a AS (SELECT term, count(*) AS cf, count(DISTINCT doc_id) AS df
        |  FROM t GROUP BY 1),
        |r AS (SELECT term, cf, df,
        |  CAST(row_number() OVER (ORDER BY cf DESC, term) AS BIGINT) AS rank
        |  FROM a)
        |SELECT term, cf, df, rank FROM r WHERE rank <= 50
        |ORDER BY rank""".stripMargin,
    "chunk_documents" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |c AS (SELECT doc_id, l,
        |  unnest(generate_series(1, greatest(len(l) - 8, 1), 24)) AS s
        |  FROM t)
        |SELECT doc_id,
        |  CAST((s - 1) // 24 AS BIGINT) AS chunk_idx,
        |  array_to_string(l[s:s+31], ' ') AS chunk_text,
        |  CAST(least(len(l) - s + 1, 32) AS BIGINT) AS n_chunk_tokens
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    // Replays p^alpha temperature weights: integer counts, group-
    // sorted list_reduce fold for Z (the exact float-order twin of the
    // Spark side's sorted HOF fold), round(,6) rate snap, integer
    // md5-bucket threshold, deterministic repetition.
    "mix_temperature" ->
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |tot AS (SELECT sum(n) AS total,
        |  list_reduce(list(pow(n, 0.5) ORDER BY lang), (a, b) -> a + b) AS z
        |  FROM c),
        |w AS (SELECT lang, CAST(floor(r) AS INT) AS base,
        |    CAST(floor((r - floor(r)) * 256) AS INT) AS thr
        |  FROM (SELECT lang, round(total * pow(n, 0.5) / (z * n), 6) AS r
        |    FROM c, tot)),
        |d AS (SELECT doc_id, d.lang, w.base +
        |    CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))::INTEGER
        |      < w.thr THEN 1 ELSE 0 END AS reps
        |  FROM documents d JOIN w USING (lang))
        |SELECT doc_id, lang, CAST(unnest(range(1, reps + 1)) AS BIGINT) AS epoch
        |FROM d WHERE reps >= 1 ORDER BY doc_id, epoch""".stripMargin,
    "mix_weighted" ->
      """WITH w AS (SELECT doc_id, source,
        |  CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 0 ELSE 1 END +
        |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <=
        |    CASE source WHEN 'src0' THEN '19' WHEN 'src1' THEN '7f'
        |      ELSE '3f' END
        |  THEN 1 ELSE 0 END AS reps
        |  FROM documents)
        |SELECT doc_id, source,
        |  CAST(unnest(generate_series(1, reps)) AS BIGINT) AS epoch
        |FROM w ORDER BY doc_id, epoch""".stripMargin,
    "decontaminate" ->
      s"""WITH $shingleCte,
        |bm AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE source = 'src0'),
        |tr AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE source <> 'src0')
        |SELECT tr.doc_id, count(*) AS n_shared
        |FROM tr JOIN bm USING (g)
        |GROUP BY tr.doc_id ORDER BY doc_id""".stripMargin,
    "split_leakage_safe" ->
      s"""WITH RECURSIVE $shingleCte,
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
        |  WHERE round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
        |    (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4) >= 0.5),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach(node, r) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.src, reach.r FROM edges e JOIN reach ON reach.node = e.dst),
        |cl AS (SELECT node, min(r) AS cluster_id FROM reach GROUP BY node)
        |SELECT d.doc_id,
        |  COALESCE(cl.cluster_id, d.doc_id) AS cluster_id,
        |  substr(md5(CAST(COALESCE(cl.cluster_id, d.doc_id) AS VARCHAR)), 1, 2)
        |    <= '28' AS is_test
        |FROM documents d LEFT JOIN cl ON d.doc_id = cl.node
        |ORDER BY d.doc_id""".stripMargin,
    "text_clean" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |k AS (SELECT doc_id, l,
        |  list_filter(list_transform(generate_series(1, len(l)), i ->
        |    CASE WHEN l[i] IS DISTINCT FROM l[i-1] THEN l[i] END),
        |    v -> v IS NOT NULL) AS kept
        |  FROM t)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(
        |    array_to_string(kept, ' '),
        |    'https?://[^ ]+', '<URL>', 'g'),
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
        |    '[0-9]{7,}', '<NUM>', 'g') AS clean_text,
        |  CAST(len(l) - len(kept) AS BIGINT) AS n_removed
        |FROM k ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |k AS (SELECT doc_id, l,
        |  list_filter(list_transform(generate_series(1, len(l)), i ->
        |    CASE WHEN l[i] IS DISTINCT FROM l[i-1] THEN l[i] END),
        |    v -> v IS NOT NULL) AS kept
        |  FROM t),
        |f AS (SELECT doc_id,
        |  CAST(len(l) AS BIGINT) AS n_tokens,
        |  round(CAST(len(list_distinct(l)) AS DOUBLE) / len(l), 6) AS distinct_ratio,
        |  round(CAST(len(list_filter(l, x -> x IN ('the','a','or','and','of','to','in')))
        |    AS DOUBLE) / len(l), 6) AS stop_ratio,
        |  round(CAST(len(l) - len(kept) AS DOUBLE) / len(l), 6) AS dup_ratio
        |  FROM k)
        |SELECT doc_id, n_tokens, distinct_ratio, stop_ratio, dup_ratio,
        |  round(1.0 / (1.0 + exp(-(-2.0 + 4.0 * distinct_ratio +
        |    8.0 * stop_ratio - 6.0 * dup_ratio + 0.005 * n_tokens))), 4)
        |    AS quality_score,
        |  (n_tokens >= 30 AND distinct_ratio >= 0.3 AND stop_ratio >= 0.01)
        |    AS keep
        |FROM f ORDER BY doc_id""".stripMargin,
    "pack_sequences" ->
      """WITH t AS (SELECT doc_id, source,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |o AS (SELECT doc_id, source, n_tokens,
        |  CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY source
        |    ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |    AS start_offset
        |  FROM t)
        |SELECT doc_id, source, n_tokens, start_offset,
        |  CAST(floor(start_offset / 256) AS BIGINT) AS chunk_idx,
        |  source || '_' ||
        |    CAST(CAST(floor(start_offset / 256) AS BIGINT) AS VARCHAR)
        |    AS chunk_id
        |FROM o ORDER BY doc_id""".stripMargin,
    "sample_quota" ->
      """SELECT doc_id, source, sample_rank FROM (
        |  SELECT doc_id, source,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
        |      AS sample_rank
        |  FROM documents)
        |WHERE sample_rank <= 5 ORDER BY doc_id""".stripMargin,
    "dedup_clusters" ->
      s"""WITH RECURSIVE $shingleCte,
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
        |  WHERE round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
        |    (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4) >= 0.5),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach(node, r) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.src, reach.r FROM edges e JOIN reach ON reach.node = e.dst)
        |SELECT node AS doc_id, min(r) AS cluster_id,
        |  (node = min(r)) AS is_canonical
        |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin,
    "text_tfidf" ->
      """WITH toks0 AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |toks AS (SELECT * FROM toks0 WHERE len(term) >= 1),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
        |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, df.df, n.n_docs,
        |    round(tf.tf * ln(n.n_docs / df.df), 6) AS tfidf
        |  FROM tf JOIN df USING (term) CROSS JOIN n),
        |ranked AS (
        |  SELECT doc_id, term, tfidf, CAST(row_number() OVER (
        |    PARTITION BY doc_id
        |    ORDER BY round(tfidf, 9) DESC, term ASC) AS BIGINT) AS rank
        |  FROM scored)
        |SELECT doc_id, rank, term, tfidf FROM ranked
        |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "text_bm25" ->
      """WITH toks0 AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |toks AS (SELECT * FROM toks0 WHERE len(term) >= 1),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
        |dl AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
        |  FROM documents),
        |stats AS (SELECT (SELECT count(DISTINCT doc_id) FROM documents) AS n_docs,
        |                 (SELECT avg(dl) FROM dl) AS avgdl),
        |scored AS (
        |  SELECT tf.doc_id, tf.term,
        |    round(ln((n_docs - df + 0.5) / (df + 0.5) + 1) * (tf * 2.2) /
        |      (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)), 6) AS bm25
        |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats),
        |ranked AS (
        |  SELECT doc_id, term, bm25, CAST(row_number() OVER (
        |    PARTITION BY doc_id
        |    ORDER BY round(bm25, 9) DESC, term ASC) AS BIGINT) AS rank
        |  FROM scored)
        |SELECT doc_id, rank, term, bm25 FROM ranked
        |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "text_stats" ->
      """WITH t AS (SELECT doc_id, lang, text, string_split(text, ' ') AS toks
        |           FROM documents)
        |SELECT doc_id, lang,
        |  CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens,
        |  round((length(text) - (len(toks) - 1)) / CAST(len(toks) AS DOUBLE), 4)
        |    AS avg_token_len,
        |  CAST(len(list_filter(toks, x -> x IN
        |    ('the','a','or','and','of','to','in'))) AS BIGINT) AS n_stopwords,
        |  CAST(list_sum(list_transform(toks,
        |    x -> 1 + CAST(floor((length(x) - 1) / 6.0) AS BIGINT))) AS BIGINT)
        |    AS bpe_tokens
        |FROM t ORDER BY doc_id""".stripMargin,
    "text_langid" ->
      """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT doc_id, lang,
        |  CAST(len(list_filter(toks, x -> x IN ('the','and','or'))) AS BIGINT) AS s_en,
        |  CAST(len(list_filter(toks, x -> x IN ('der','und','nicht'))) AS BIGINT) AS s_de,
        |  CAST(len(list_filter(toks, x -> x IN ('le','et','la'))) AS BIGINT) AS s_fr,
        |  CAST(len(list_filter(toks, x -> x IN ('el','y','los'))) AS BIGINT) AS s_es
        |  FROM t)
        |SELECT doc_id, lang, s_en, s_de, s_fr, s_es,
        |  CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
        |       WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
        |       WHEN s_es >= s_fr THEN 'es'
        |       ELSE 'fr' END AS lang_pred
        |FROM s ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
        |h AS (SELECT doc_id, text,
        |  list_transform(
        |    CASE WHEN len(toks) >= 3
        |      THEN list_transform(generate_series(1, len(toks) - 2),
        |        i -> array_to_string(toks[i:i+2], ' '))
        |      ELSE [array_to_string(toks, ' ')] END,
        |    s -> md5(s)) AS hs
        |  FROM t)
        |SELECT doc_id, md5(text) AS content_hash,
        |  list_min(hs) AS min_shingle_hash,
        |  CAST(len(list_distinct(
        |    CASE WHEN len(hs) >= 4
        |      THEN list_transform(generate_series(1, len(hs) - 3),
        |        i -> list_min(hs[i:i+3]))
        |      ELSE [list_min(hs)] END)) AS BIGINT) AS n_winnow
        |FROM h ORDER BY doc_id""".stripMargin,
    "dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies,
        |  md5(text) AS content_hash
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin,
    // Mirrors dedupSubstringKeepfirst: as dedup_substring, but the
    // min-(doc_id, pos) occurrence of each repeated gram is unmarked —
    // the survivor copy keeps its text.
    "dedup_substring_keepfirst" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS t
        |  FROM documents),
        |kg AS (
        |  SELECT doc_id, i - 1 AS pos, array_to_string(t[i:i+7], ' ') AS g
        |  FROM toks, unnest(generate_series(1, len(t) - 7)) s(i)),
        |rep AS (SELECT g FROM kg GROUP BY g HAVING count(*) >= 2),
        |marked AS (
        |  SELECT doc_id, pos FROM (
        |    SELECT kg.doc_id, kg.pos,
        |      row_number() OVER (PARTITION BY g
        |        ORDER BY kg.doc_id, kg.pos) AS rn
        |    FROM kg JOIN rep USING (g)) WHERE rn > 1),
        |covered AS (
        |  SELECT DISTINCT doc_id, pos + j AS idx
        |  FROM marked, unnest(generate_series(0, 7)) u(j)),
        |tokidx AS (
        |  SELECT doc_id, i - 1 AS idx, t[i] AS tok
        |  FROM toks, unnest(generate_series(1, len(t))) s(i)),
        |kept AS (
        |  SELECT ti.doc_id, ti.idx, ti.tok FROM tokidx ti
        |  WHERE NOT EXISTS (SELECT 1 FROM covered c
        |    WHERE c.doc_id = ti.doc_id AND c.idx = ti.idx))
        |SELECT t.doc_id,
        |  CAST(len(t.t) AS BIGINT) AS n_tokens,
        |  CAST(len(t.t) - count(k.idx) AS BIGINT) AS n_removed,
        |  coalesce(string_agg(k.tok, ' ' ORDER BY k.idx), '') AS clean_text
        |FROM toks t LEFT JOIN kept k USING (doc_id)
        |GROUP BY t.doc_id, len(t.t)
        |ORDER BY t.doc_id""".stripMargin,
    // Mirrors dedupSubstring: 8-gram occurrences, repeated = count>=2,
    // covered token indices, kept tokens re-joined in order.
    "dedup_substring" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS t
        |  FROM documents),
        |kg AS (
        |  SELECT doc_id, i - 1 AS pos, array_to_string(t[i:i+7], ' ') AS g
        |  FROM toks, unnest(generate_series(1, len(t) - 7)) s(i)),
        |rep AS (SELECT g FROM kg GROUP BY g HAVING count(*) >= 2),
        |marked AS (SELECT kg.doc_id, kg.pos FROM kg JOIN rep USING (g)),
        |covered AS (
        |  SELECT DISTINCT doc_id, pos + j AS idx
        |  FROM marked, unnest(generate_series(0, 7)) u(j)),
        |tokidx AS (
        |  SELECT doc_id, i - 1 AS idx, t[i] AS tok
        |  FROM toks, unnest(generate_series(1, len(t))) s(i)),
        |kept AS (
        |  SELECT ti.doc_id, ti.idx, ti.tok FROM tokidx ti
        |  WHERE NOT EXISTS (SELECT 1 FROM covered c
        |    WHERE c.doc_id = ti.doc_id AND c.idx = ti.idx))
        |SELECT t.doc_id,
        |  CAST(len(t.t) AS BIGINT) AS n_tokens,
        |  CAST(len(t.t) - count(k.idx) AS BIGINT) AS n_removed,
        |  coalesce(string_agg(k.tok, ' ' ORDER BY k.idx), '') AS clean_text
        |FROM toks t LEFT JOIN kept k USING (doc_id)
        |GROUP BY t.doc_id, len(t.t)
        |ORDER BY t.doc_id""".stripMargin,
    "dedup_simhash" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |              FROM documents),
        |bits AS (SELECT doc_id, j,
        |    sum(CASE WHEN substr(md5(tok), j, 1) >= '8' THEN 1 ELSE -1 END) AS v
        |  FROM toks, generate_series(1, 32) t(j) GROUP BY doc_id, j)
        |SELECT doc_id,
        |  string_agg(CASE WHEN v > 0 THEN '1' ELSE '0' END, '' ORDER BY j)
        |    AS simhash32
        |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "dedup_minhash_lsh" ->
      s"""WITH $shingleCte,
        |sig AS (SELECT doc_id, s,
        |  list_transform(generate_series(0, 15),
        |    i -> list_min(list_transform(s, x -> md5(i || '|' || x)))) AS g
        |  FROM sh),
        |bands AS (SELECT doc_id, b,
        |    md5(array_to_string(g[4*b+1:4*b+4], '|')) AS bk
        |  FROM sig, generate_series(0, 3) gs(b)),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
        |  FROM bands a JOIN bands c ON a.b = c.b AND a.bk = c.bk
        |    AND a.doc_id < c.doc_id)
        |SELECT id_a, id_b,
        |  round(CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE) /
        |    (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))), 4) AS jaccard
        |FROM cand
        |JOIN sh sa ON sa.doc_id = id_a
        |JOIN sh sb ON sb.doc_id = id_b
        |ORDER BY id_a, id_b""".stripMargin,
    "dedup_minhash_fast" ->
      s"""WITH $shingleCte,
        |cps AS (SELECT doc_id, s,
        |  list_transform(s, x -> list_transform(string_split(x, ''),
        |    c -> CAST(unicode(c) AS BIGINT))) AS scps
        |  FROM sh),
        |sig AS (SELECT doc_id, s,
        |  list_transform(generate_series(0, 15), i ->
        |    list_min(list_transform(scps, cp ->
        |      list_reduce(list_prepend(CAST(i + 1 AS BIGINT), cp),
        |        (h, c) -> (h * 131 + c) % 1000000007)))) AS g
        |  FROM cps),
        |bands AS (SELECT doc_id, b,
        |    md5(array_to_string(list_transform(g[4*b+1:4*b+4],
        |      x -> CAST(x AS VARCHAR)), '|')) AS bk
        |  FROM sig, generate_series(0, 3) gs(b)),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
        |  FROM bands a JOIN bands c ON a.b = c.b AND a.bk = c.bk
        |    AND a.doc_id < c.doc_id)
        |SELECT id_a, id_b,
        |  round(CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE) /
        |    (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))), 4) AS jaccard
        |FROM cand
        |JOIN sh sa ON sa.doc_id = id_a
        |JOIN sh sb ON sb.doc_id = id_b
        |ORDER BY id_a, id_b""".stripMargin,
    "dedup_ngram_jaccard" ->
      s"""WITH $shingleCte
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
        |    (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4) AS jaccard
        |FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
        |WHERE round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
        |    (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin)
}
