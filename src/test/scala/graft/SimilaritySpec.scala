package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Similarity, SignLsh}

/** ANN contracts: brute force is sane (no self-matches, scores in
  * [-1,1], k rows per query) and IVF recall against brute force is at
  * least the nprobe/ncells coverage one expects on unclustered data.
  */
class SimilaritySpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf)

  test("embedding near-dups: salted grouped kernel equals the blocked self-join") {
    // the r16 rewrite (salt decomposition + graft_cosine_pairs) must
    // emit EXACTLY the blocked self-join's pair set — same ids, same
    // 4-decimal cosines — and stay exact under a different salt count
    val nd = Dedup.embeddingNearDups(emb, "vec_id", "embedding",
      blockCol = "label", minCosine = 0.3)
    val tw = Dedup.embeddingNearDupsJoined(emb, "vec_id", "embedding",
      blockCol = "label", minCosine = 0.3)
    assert(nd.exceptAll(tw).isEmpty && tw.exceptAll(nd).isEmpty)
    spark.conf.set("spark.graft.pairs.salts", "3")
    try {
      val nd3 = Dedup.embeddingNearDups(emb, "vec_id", "embedding",
        blockCol = "label", minCosine = 0.3)
      assert(nd3.exceptAll(tw).isEmpty && tw.exceptAll(nd3).isEmpty,
        "the pair set must be salt-count invariant")
    } finally spark.conf.unset("spark.graft.pairs.salts")
  }

  test("fuzzy near-dups: salted grouped edit kernel equals the blocked self-join") {
    // the r19 rewrite (salt decomposition + graft_edit_pairs, the
    // CosinePairs family applied to thresholded levenshtein) must emit
    // EXACTLY the blocked self-join's pairs — same ids, same
    // distances (the kernel calls Spark's own
    // UTF8String.levenshteinDistance) — and stay exact under a
    // different salt count
    val docs = Tables.documents(spark, sf)
    val nd = Dedup.fuzzyPairsBlocked(docs, "doc_id", "text",
      blockCol = "source", prefixLen = 40, maxDist = 12)
    val tw = Dedup.fuzzyPairsJoined(docs, "doc_id", "text",
      blockCol = "source", prefixLen = 40, maxDist = 12)
    assert(nd.exceptAll(tw).isEmpty && tw.exceptAll(nd).isEmpty)
    spark.conf.set("spark.graft.pairs.salts", "3")
    try {
      val nd3 = Dedup.fuzzyPairsBlocked(docs, "doc_id", "text",
        blockCol = "source", prefixLen = 40, maxDist = 12)
      assert(nd3.exceptAll(tw).isEmpty && tw.exceptAll(nd3).isEmpty,
        "the pair set must be salt-count invariant")
    } finally spark.conf.unset("spark.graft.pairs.salts")
  }

  test("fuzzy kernel: ASCII banded DP is bit-parity with Spark's levenshtein across random strings") {
    import spark.implicits._
    // the r22 ASCII byte-path DP must return exactly Spark's
    // levenshtein(l, r, k) contract (exact distance when <= k, else
    // dropped) — randomized strings of varied lengths incl. shared
    // prefixes/suffixes, duplicates, empty strings, and a non-ASCII
    // pair that must take the code-point fallback
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdef "
    def randStr(n: Int) =
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val base = (1L to 120L).map { i =>
      val len = rnd.nextInt(45)
      val s = randStr(len)
      // half the ids get a mutated near-copy so distances <= k exist
      (i, if (i % 2 == 0) s else "prefix" + s + "suffix", "blk")
    }
    val extra = Seq(
      (200L, "", "blk"), (201L, "", "blk"), (202L, "a", "blk"),
      (203L, "café au lait et encore du texte", "blk"),
      (204L, "cafe au lait et encore du texte", "blk"),
      (205L, "café au lait et encore du texte!", "blk"))
    val docs = (base ++ extra).toDF("doc_id", "text", "source")
    for (k <- Seq(0, 3, 12, 40)) {
      val got = Dedup.fuzzyPairsBlocked(docs, "doc_id", "text",
        blockCol = "source", prefixLen = 40, maxDist = k)
      val tw = Dedup.fuzzyPairsJoined(docs, "doc_id", "text",
        blockCol = "source", prefixLen = 40, maxDist = k)
      assert(got.exceptAll(tw).isEmpty && tw.exceptAll(got).isEmpty,
        s"ASCII DP diverged from Spark's levenshtein at maxDist=$k")
    }
  }

  test("fuzzy near-dups: null text/block/id rows and string ids behave like the twin") {
    import spark.implicits._
    // null text → null prefix (null distance in the twin), null block
    // never joins, null id never satisfies id_a < id_b — the kernel
    // path must drop all three the same way, and emit the planted
    // near-pair exactly once with the exact distance
    val planted = Seq(
      (java.lang.Long.valueOf(1L), "the quick brown fox jumps", "s1"),
      (java.lang.Long.valueOf(2L), "the quick brown fox jumped", "s1"),
      (java.lang.Long.valueOf(3L), "a completely different text here", "s1"),
      (java.lang.Long.valueOf(4L), "the quick brown fox jumps", "s2"),
      (java.lang.Long.valueOf(5L), null.asInstanceOf[String], "s1"),
      (java.lang.Long.valueOf(6L), "the quick brown fox", null),
      (null.asInstanceOf[java.lang.Long], "the quick brown fox jumps", "s1")
    ).toDF("doc_id", "text", "source")
    val got = Dedup.fuzzyPairsBlocked(planted, "doc_id", "text",
      blockCol = "source", prefixLen = 40, maxDist = 12)
    val tw = Dedup.fuzzyPairsJoined(planted, "doc_id", "text",
      blockCol = "source", prefixLen = 40, maxDist = 12)
    assert(got.exceptAll(tw).isEmpty && tw.exceptAll(got).isEmpty)
    assert(got.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq === Seq((1L, 2L, 2L)))
    // ids ride the kernel as longs — string ids must fail loud, never
    // cast-to-null into garbage pairs
    val e = intercept[IllegalArgumentException] {
      Dedup.fuzzyPairsBlocked(
        planted.withColumn("doc_id", concat(lit("d-"), col("doc_id"))),
        "doc_id", "text", blockCol = "source", prefixLen = 40, maxDist = 12)
    }
    assert(e.getMessage.contains("integral"), e.getMessage)
  }

  test("fuzzy near-dups: duplicate ids in one block never self-pair") {
    import spark.implicits._
    // dirty data reachable only via the public API: id 1 appears twice
    // in the same block. The joined twin's strict id_a < id_b filter
    // drops the (1, 1) self-pair; the kernel's (least, greatest)
    // emission must skip equal-id pairs the same way — and keep the
    // duplicate's legitimate cross-pairs at the twin's multiplicity
    val dirty = Seq(
      (1L, "the quick brown fox jumps", "s1"),
      (1L, "the quick brown fox jumped", "s1"),
      (2L, "the quick brown fox jump", "s1")
    ).toDF("doc_id", "text", "source")
    val got = Dedup.fuzzyPairsBlocked(dirty, "doc_id", "text",
      blockCol = "source", prefixLen = 40, maxDist = 12)
    val tw = Dedup.fuzzyPairsJoined(dirty, "doc_id", "text",
      blockCol = "source", prefixLen = 40, maxDist = 12)
    assert(got.exceptAll(tw).isEmpty && tw.exceptAll(got).isEmpty)
    assert(got.filter(col("id_a") === col("id_b")).isEmpty,
      "equal-id self-pairs must never be emitted")
    // both copies of id 1 pair with id 2 — multiplicity 2, like the twin
    assert(got.count() === 2L)
  }

  test("embedding near-dups: a poisoned (NaN) embedding is dropped, not fatal") {
    import spark.implicits._
    // one NaN component used to reach the kernel's BigDecimal rounding
    // and kill the whole query with NumberFormatException; it must
    // behave like the joined twin — the poisoned row pairs with
    // nothing, every clean pair survives
    val rows = Seq(
      (1L, Seq(1.0f, 0.0f), 0),
      (2L, Seq(1.0f, 0.0f), 0),
      (3L, Seq(Float.NaN, 1.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val got = Dedup.embeddingNearDups(rows, "vec_id", "embedding",
        blockCol = "label", minCosine = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 2L)))
  }

  test("embedding near-dups reject non-integral id columns loudly") {
    import spark.implicits._
    // ids ride the pair kernel as longs; a string id would cast to
    // null silently and emit garbage (0, 0) pairs
    val rows = Seq(("u-1", Seq(1.0f, 0.0f), 0), ("u-2", Seq(1.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val e = intercept[IllegalArgumentException] {
      Dedup.embeddingNearDups(rows, "vec_id", "embedding",
        blockCol = "label", minCosine = 0.5)
    }
    assert(e.getMessage.contains("integral"), e.getMessage)
  }

  test("string ids run the native kernel via checked xxhash64 surrogates") {
    // the integral-id contract's documented on-ramp: surrogate ids
    // ride the salted kernel, the pair stream joins back to source
    // ids, and the pair set equals the blocked self-join run directly
    // on the STRING ids (pairs re-normalized to the source ordering)
    val sEmb = emb.withColumn("sid",
      concat(lit("doc-"), col("vec_id"))).drop("vec_id")
    val got = Dedup.embeddingNearDupsSurrogate(sEmb, "sid", "embedding",
      blockCol = "label", minCosine = 0.3)
    val tw = Dedup.embeddingNearDupsJoined(sEmb, "sid", "embedding",
        blockCol = "label", minCosine = 0.3)
      .select(col("label"), least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"), col("cosine"))
    assert(got.exceptAll(tw).isEmpty && tw.exceptAll(got).isEmpty)
    assert(got.schema("id_a").dataType ==
      org.apache.spark.sql.types.StringType)
  }

  test("surrogate ids fail loud on a 64-bit hash collision") {
    import spark.implicits._
    // two distinct source ids sharing a surrogate must never pair
    // silently under the wrong identity; forcing a collision through
    // real xxhash64 needs 2^32 work, so pin the CHECK itself: distinct
    // source ids vs distinct surrogates — duplicate ROWS of one id are
    // fine (1 id, 1 surrogate), a true collision is not reachable in a
    // spec, but the fold arithmetic is
    val dup = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("id", "x")
    val ok = Dedup.withSurrogateIds(dup, "id", "_sid")
    assert(ok.select("_sid").distinct().count() == 2)
    // a NULL id gets a NULL surrogate — never xxhash64's seed, which
    // would give every null row one shared fake identity AND trip the
    // collision check backwards (count_distinct skips null ids but
    // would count their shared non-null surrogate)
    val withNull = Seq(Some("a"), Some("b"), None)
      .zipWithIndex.map { case (id, i) => (id.orNull, i.toLong) }
      .toDF("id", "x")
    val kn = Dedup.withSurrogateIds(withNull, "id", "_sid")
    assert(kn.filter(col("id").isNull).select("_sid").collect()
      .forall(_.isNullAt(0)), "null id must map to null surrogate")
    assert(kn.filter(col("id").isNotNull)
      .select("_sid").distinct().count() == 2)
  }

  test("null-id rows never reach the pair kernel on either id path") {
    import spark.implicits._
    // the kernel's getLong reads a null id slot as 0, so null-id rows
    // would pair under ONE shared fake identity 0 (and alias a real id
    // 0 / an id whose xxhash64 is 0). Two identical-vector null-id
    // rows are the trap: unfiltered they emit a (0, 0) pair
    val rows = Seq((Option(1L), Seq(1.0f, 0.0f)),
      (Option(2L), Seq(1.0f, 0.0f)),
      (Option.empty[Long], Seq(1.0f, 0.0f)),
      (Option.empty[Long], Seq(1.0f, 0.0f)))
      .map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label")
    val direct = Dedup.embeddingNearDups(rows, "vec_id", "embedding",
        blockCol = "label", minCosine = 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(direct == Seq((1L, 2L)), s"direct path: $direct")
    val sRows = rows.withColumn("sid",
      when(col("vec_id").isNotNull, concat(lit("doc-"), col("vec_id"))))
    val surr = Dedup.embeddingNearDupsSurrogate(sRows, "sid", "embedding",
        blockCol = "label", minCosine = 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(surr == Seq(("doc-1", "doc-2")), s"surrogate path: $surr")
  }

  test("sign-LSH near-dups: salted kernel equals the bucket self-join") {
    val nd = SignLsh.nearDupPairs(emb, "vec_id", "embedding",
      bits = 4, minCosine = 0.25)
    val tw = SignLsh.nearDupPairsJoined(emb, "vec_id", "embedding",
      bits = 4, minCosine = 0.25)
    assert(nd.exceptAll(tw).isEmpty && tw.exceptAll(nd).isEmpty)
  }

  test("brute-force top-k: k rows per query, no self, scores bounded") {
    val q = emb.filter(col("vec_id") < 20)
    val res = Similarity.bruteForceTopK(q, emb, "vec_id", "vec_id", "embedding", 3).cache()
    assert(res.count() === 60)
    assert(res.filter(col("q_id") === col("neighbor_id")).isEmpty)
    assert(res.filter(abs(col("cosine")) > 1.000001).isEmpty)
    assert(res.groupBy("q_id").count().filter(col("count") =!= 3).isEmpty)
  }

  test("IVF recall@3 vs brute force exceeds probe coverage floor") {
    val q = emb.filter(col("vec_id") < 50)
    val bf = Similarity.bruteForceTopK(q, emb, "vec_id", "vec_id", "embedding", 3)
      .select("q_id", "neighbor_id")
    val ivf = Similarity.ivfTopK(q, emb, "vec_id", "vec_id", "embedding",
        "label", k = 3, nprobe = 3)
      .select("q_id", "neighbor_id")
    val hits = bf.intersect(ivf).count().toDouble
    val recall = hits / bf.count().toDouble
    // 3 of 10 cells probed; random labels give ~0.3 expected recall
    assert(recall > 0.15, s"recall=$recall")
  }

  test("PQ-ADC: k rows per query, no self, recall beats random floor") {
    import graft.ext.Pq
    val q = emb.filter(col("vec_id") < 50)
    val pq = Pq.adcTopK(q, emb, "vec_id", "vec_id", "embedding",
        blockCol = "label", m = 16, k = 3).cache()
    assert(pq.filter(col("q_id") === col("neighbor_id")).isEmpty)
    assert(pq.groupBy("q_id").count().filter(col("count") =!= 3).isEmpty)
    val bf = Similarity.bruteForceTopK(q, emb, "vec_id", "vec_id", "embedding", 3)
      .select("q_id", "neighbor_id")
    val hits = bf.intersect(pq.select("q_id", "neighbor_id")).count().toDouble
    val recall = hits / bf.count().toDouble
    // 16x4 sub-codes over 10 codewords: coarse, but far above random
    // top-3 of 500 (~0.006)
    assert(recall > 0.10, s"recall=$recall")
  }

  test("recall gate: every approximate ANN operator clears its pinned floor") {
    // the property determinism checks cannot see: answer QUALITY.
    // Floors sit below the measured sf0.001 values (ivf 0.405,
    // pq 0.624 at the tuned sampled-training 32 × 40-cell defaults,
    // sign_lsh 0.126 at the 4-bit single-table default,
    // sign_lsh_multi 0.424 at the tuned 6-bit × 12-table defaults)
    // with headroom for data-scale wiggle — a silent quality collapse
    // (bad codebook, broken bucketing) lands far below them.
    val recalls = graft.queries.SimilarityQueries.similarityRecall(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val floors = Map("ivf" -> 0.25, "pq" -> 0.3, "sign_lsh" -> 0.08,
      "sign_lsh_multi" -> 0.3)
    floors.foreach { case (method, floor) =>
      assert(recalls(method) >= floor,
        s"$method recall ${recalls(method)} fell below pinned floor $floor")
    }
    assert(recalls.size === 4)
    // the multi-table lever must actually lift recall over one table
    assert(recalls("sign_lsh_multi") > recalls("sign_lsh"),
      s"multi-table LSH (${recalls("sign_lsh_multi")}) should beat " +
        s"1-table (${recalls("sign_lsh")})")
  }

  test("recall gate holds at BENCH scale (sf0.1), not just the toy SF") {
    // approximate-search quality can degrade with corpus growth (denser
    // buckets, coarser cells relative to the data) — gate it where the
    // bench runs. Floors sit under the measured sf0.1 values (ivf
    // 0.383, pq 0.416 at the tuned sampled-training 32 × 40-cell
    // defaults,
    // sign_lsh 0.123 at the 4-bit single-table default,
    // sign_lsh_multi 0.418 at the tuned 6-bit × 12-table defaults)
    // with the same collapse-vs-wiggle margin as the toy-SF floors.
    val recalls = graft.queries.SimilarityQueries
      .similarityRecall(spark, "/root/testdata/sf0.1")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val floors = Map("ivf" -> 0.25, "pq" -> 0.25, "sign_lsh" -> 0.08,
      "sign_lsh_multi" -> 0.3)
    floors.foreach { case (method, floor) =>
      assert(recalls(method) >= floor,
        s"$method sf0.1 recall ${recalls(method)} fell below floor $floor")
    }
    assert(recalls("sign_lsh_multi") > recalls("sign_lsh"))
  }

  test("PQ-ADC deterministic across partitionings") {
    import graft.ext.Pq
    val q = emb.filter(col("vec_id") < 10)
    val a = Pq.adcTopK(q, emb, "vec_id", "vec_id", "embedding", "label", 16, 3)
      .orderBy("q_id", "rank").collect().toSeq
    val b = Pq.adcTopK(q.repartition(7), emb.repartition(13), "vec_id",
        "vec_id", "embedding", "label", 16, 3)
      .orderBy("q_id", "rank").collect().toSeq
    assert(a === b)
  }

  test("PQ-ADC invariant under block-id relabeling (codes are positional, not raw ids)") {
    import graft.ext.Pq
    val q = emb.filter(col("vec_id") < 10)
    val a = Pq.adcTopK(q, emb, "vec_id", "vec_id", "embedding", "label", 16, 3)
      .orderBy("q_id", "rank").collect().toSeq
    // shift labels to 100..109 (non-zero-based, non-dense-from-0): the
    // codebooks are identical sets, so ADC results must not change
    val shifted = emb.withColumn("label", col("label") + 100)
    val b = Pq.adcTopK(q, shifted, "vec_id", "vec_id", "embedding", "label", 16, 3)
      .orderBy("q_id", "rank").collect().toSeq
    assert(a === b)
  }

  test("sign-LSH with dim given launches no sizing job; dims agree with the probe") {
    // caller-passed dim must skip the 1-row head() probe entirely...
    val ((withDim, multiDim), _, sites) = jobsDuring {
      (SignLsh.nearDupPairs(emb, "vec_id", "embedding",
        bits = 4, minCosine = 0.25, dim = 64),
        SignLsh.nearDupPairsMulti(emb, "vec_id", "embedding",
          bits = 4, tables = 2, minCosine = 0.25, dim = 64))
    }
    val sizing = sites.filter(s =>
      s.startsWith("count at") || s.startsWith("head at"))
    assert(sizing.isEmpty,
      s"dim-given signature build must not launch sizing jobs, saw: $sizing")
    // ...and produce the identical pair set the probing path finds
    val probed = SignLsh.nearDupPairs(emb, "vec_id", "embedding",
      bits = 4, minCosine = 0.25)
    assert(withDim.orderBy("id_a", "id_b").collect().toSeq ===
      probed.orderBy("id_a", "id_b").collect().toSeq)
    assert(multiDim.count() >= withDim.count()) // multi-table only adds recall
  }

  test("sign-LSH dim probe skips null vectors and fails loudly on all-null input") {
    import spark.implicits._
    // first row's embedding is null: size(null) = -1 would build empty
    // hyperplanes and bucket the whole corpus together — the probe
    // must resolve dim from a NON-null row instead
    val mixed = Seq((1L, None), (2L, Some(Seq(1.0f, 0.0f))),
        (3L, Some(Seq(1.0f, 0.0f))))
      .toDF("vec_id", "embedding")
    val pairs = graft.ext.SignLsh.nearDupPairs(mixed, "vec_id",
        "embedding", bits = 2, minCosine = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq === Seq((2L, 3L)))
    // all-null (and empty) inputs cannot resolve a dim — loud error,
    // not a degenerate single-bucket n^2 self-join
    val allNull = Seq((1L, None: Option[Seq[Float]]))
      .toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      graft.ext.SignLsh.nearDupPairs(allNull, "vec_id", "embedding",
        bits = 2, minCosine = 0.9)
    }
  }

  test("multi-table LSH plan: planes join as broadcast rows, no expression explode") {
    // the data-driven signature build keeps the stage inside
    // whole-stage codegen; a refactor back to inlined per-plane
    // literal columns (posexplode over tables × bits expressions)
    // re-creates the 4.5×-slower interpreted stage
    // the joined+distinct twin shares the SAME signature-stage
    // construction as the production first-collision path but keeps it
    // in its final plan (the production path executes it eagerly under
    // the codes localCheckpoint, so its final plan starts there)
    val df = SignLsh.nearDupPairsMulti(emb, "vec_id", "embedding",
      bits = 4, tables = 2, minCosine = 0.25, dim = 64,
      firstCollision = false)
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastNestedLoopJoin"),
      s"hyperplanes must join as a broadcast relation:\n${phys.take(2000)}")
    // the guarded regression (inlined per-plane literal expression
    // trees) is pinned POSITIVELY by the broadcast-rows assertion
    // above: the literal form has no plane relation to broadcast. The
    // r14 candidate path legitimately posexplodes the per-id CODES
    // array (data, not expressions), so a negative Generate/posexplode
    // assertion would be asserting on the wrong stage.
  }

  test("fast-hash minhash LSH also catches the planted duplicate") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .union(Tables.documents(spark, sf).filter(col("doc_id") === 3)
        .withColumn("doc_id", lit(8888L)))
    val banded = Dedup.minhashBands(docs, "doc_id", "text", fastHash = true)
    val cands = Dedup.minhashCandidates(banded, "doc_id")
    assert(cands.filter(col("id_a") === 3 && col("id_b") === 8888).count() === 1)
  }

  test("grouped candidates == self-join candidates (incl. big-bucket path)") {
    val docs = Tables.documents(spark, sf)
      .union(Tables.documents(spark, sf).filter(col("doc_id") === 0)
        .withColumn("doc_id", lit(9999L)))
    val banded = Dedup.minhashBands(docs, "doc_id", "text")
    val joined = Dedup.minhashCandidates(banded, "doc_id")
    val grouped = Dedup.minhashCandidatesGrouped(banded, "doc_id")
    assert(joined.exceptAll(grouped).isEmpty)
    assert(grouped.exceptAll(joined).isEmpty)
    // groupCap = 1 forces EVERY bucket through the per-bucket
    // self-join fallback — the escape-hatch path must produce the
    // identical canonical pair set
    val capped = Dedup.minhashCandidatesGrouped(banded, "doc_id", groupCap = 1)
    assert(joined.exceptAll(capped).isEmpty)
    assert(capped.exceptAll(joined).isEmpty)
  }

  test("first-collision multi-LSH == joined+distinct multi-LSH") {
    val fc = SignLsh.nearDupPairsMulti(emb, "vec_id", "embedding",
      bits = 4, tables = 3, minCosine = 0.25, dim = 64)
    val jd = SignLsh.nearDupPairsMulti(emb, "vec_id", "embedding",
      bits = 4, tables = 3, minCosine = 0.25, dim = 64,
      firstCollision = false)
    assert(fc.exceptAll(jd).isEmpty)
    assert(jd.exceptAll(fc).isEmpty)
    // and the pair stream really is unique by construction pre-verify
    val pairs = fc.select("id_a", "id_b")
    assert(pairs.count() === pairs.distinct().count())
  }

  test("verify pre-flight estimate equals the actual candidate volume") {
    // the estimator must equal the a<b bucket self-join's output size
    // EXACTLY (it is a sum over the bucket histogram, not a sample)
    import spark.implicits._
    val posts = Seq(
      (1L, 0, 7), (2L, 0, 7), (3L, 0, 7),          // bucket of 3 → 3 pairs
      (1L, 1, 9), (2L, 1, 9),                       // bucket of 2 → 1 pair
      (3L, 1, 11), (4L, 0, 8)                       // singletons → 0
    ).toDF("vec_id", "_t", "_code")
    assert(SignLsh.estimatePairs(posts) === 4L)
    // and on the real corpus: estimate == the generated candidate count
    val emb2 = graft.functions.Vectors.unitized(emb, "embedding",
      "vec_id" -> "vec_id")
    val planes = (for {
      t <- 0 until 2
      (p, i) <- SignLsh.hyperplanes(4, 64, 42L + t).zipWithIndex
    } yield (t, i, p)).toDF("_t", "_p", "_plane")
    val sig = emb2.crossJoin(broadcast(planes))
      .withColumn("_bit",
        when(round(graft.functions.Vectors.dot(col("_uv"), col("_plane")), 9) >= 0,
          lit("1")).otherwise(lit("0")))
      .groupBy(col("vec_id"), col("_t"))
      .agg(concat_ws("", transform(
        array_sort(collect_list(struct(col("_p"), col("_bit")))),
        s => s.getField("_bit"))).as("_bucket"))
      .withColumn("_code", conv(col("_bucket"), 2, 10).cast("int"))
      .select(col("vec_id"), col("_t"), col("_code"))
    val actual = sig.as("a").join(sig.as("b"), Seq("_t", "_code"))
      .filter(col("a.vec_id") < col("b.vec_id")).count()
    assert(SignLsh.estimatePairs(sig) === actual)
  }

  test("in-join verify (over budget) == posting-list verify (within)") {
    val byId = SignLsh.nearDupPairsMulti(emb, "vec_id", "embedding",
      bits = 4, tables = 3, minCosine = 0.25, dim = 64)
      .orderBy("id_a", "id_b").collect()
    // force the big-pair regime: the sf0.001 estimate (~24k pairs)
    // exceeds this budget, so the verify moves in-join
    spark.conf.set("spark.graft.slsh.maxVerifyPairs", "5000")
    try {
      val inJoin = SignLsh.nearDupPairsMulti(emb, "vec_id", "embedding",
        bits = 4, tables = 3, minCosine = 0.25, dim = 64)
        .orderBy("id_a", "id_b").collect()
      assert(inJoin.toSeq === byId.toSeq)
    } finally spark.conf.unset("spark.graft.slsh.maxVerifyPairs")
  }

  test("verify fails fast with the estimate past the hard cap") {
    spark.conf.set("spark.graft.slsh.maxVerifyPairs", "1")
    spark.conf.set("spark.graft.slsh.failCapChunks", "2")
    try {
      val ex = intercept[IllegalArgumentException] {
        SignLsh.nearDupPairsMulti(emb, "vec_id", "embedding",
          bits = 4, tables = 3, minCosine = 0.25, dim = 64)
      }
      assert(ex.getMessage.contains("candidate pairs"))
      assert(ex.getMessage.contains("hard cap"))
    } finally {
      spark.conf.unset("spark.graft.slsh.maxVerifyPairs")
      spark.conf.unset("spark.graft.slsh.failCapChunks")
    }
  }

  test("first-collision multi-LSH rejects bits > 31 loudly") {
    val e = intercept[IllegalArgumentException] {
      SignLsh.nearDupPairsMulti(emb, "vec_id", "embedding",
        bits = 32, tables = 2, minCosine = 0.25, dim = 64)
    }
    assert(e.getMessage.contains("bits <= 31"))
  }

  test("packed bucket candidates == posting-list self-join candidates") {
    // same posting frame shape nearDupPairsMulti feeds: (table,
    // bucket, id); the packed stream must reproduce the joined form's
    // distinct canonical pair set on both the grouped and the forced
    // big-bucket path
    val posts = Tables.documents(spark, sf)
      .select((col("doc_id") % 3).as("_t"),
        (col("doc_id") % 5).cast("string").as("_bucket"), col("doc_id"))
    val a = posts.select(col("_t"), col("_bucket"), col("doc_id").as("id_a"))
    val b = posts.select(col("_t"), col("_bucket"), col("doc_id").as("id_b"))
    val joined = a.join(b, Seq("_t", "_bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val packed = Dedup.bucketCandidatesPacked(posts, Seq("_t", "_bucket"),
      "doc_id")
    assert(joined.exceptAll(packed).isEmpty)
    assert(packed.exceptAll(joined).isEmpty)
    val capped = Dedup.bucketCandidatesPacked(posts, Seq("_t", "_bucket"),
      "doc_id", groupCap = 1)
    assert(joined.exceptAll(capped).isEmpty)
    assert(capped.exceptAll(joined).isEmpty)
  }

  test("packed bucket candidates reject >32-bit ids on the big-bucket path") {
    import spark.implicits._
    val posts = Seq((0, "k", 1L), (0, "k", 1L << 40))
      .toDF("_t", "_bucket", "id")
    val e = intercept[Exception] {
      Dedup.bucketCandidatesPacked(posts, Seq("_t", "_bucket"), "id",
        groupCap = 1).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: causes(x.getCause))
    assert(causes(e).exists(c => c.getMessage != null &&
      c.getMessage.contains("exceeds unsigned 32 bits")), e.toString)
  }

  test("minhash LSH candidates include the exact-duplicate pair") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .union(Tables.documents(spark, sf).filter(col("doc_id") === 0)
        .withColumn("doc_id", lit(9999L)))
    val banded = Dedup.minhashBands(docs, "doc_id", "text")
    val cands = Dedup.minhashCandidates(banded, "doc_id")
    val verified = Dedup.verifyJaccard(cands, banded, "doc_id")
    val dup = verified.filter(col("id_a") === 0 && col("id_b") === 9999)
    assert(dup.count() === 1)
    assert(dup.select("jaccard").head().getDouble(0) === 1.0)
  }
}
