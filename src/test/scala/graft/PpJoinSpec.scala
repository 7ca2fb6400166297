package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dsir, PpJoin}
import graft.functions.Text

/** PPJoin prefix-filtered similarity join: lossless pruning (result ==
  * brute-force all-pairs), real candidate reduction, and the DSIR
  * selection invariants.
  */
class PpJoinSpec extends SparkSpec {

  test("ppjoin equals brute-force all-pairs Jaccard (no false negatives)") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val got = PpJoin.pairs(docs, "doc_id", "text", shingleN = 3,
        minJaccard = 0.5)
      .orderBy("id_a", "id_b")
      .as[(Long, Long, Double)].collect().toSeq

    // brute force on the same shingle sets — the unpruned ground truth
    val sets = docs.select(col("doc_id"),
      array_distinct(Text.shingles(Text.tokens(col("text")), 3)).as("s"))
    val a = sets.select(col("doc_id").as("id_a"), col("s").as("sa"))
    val b = sets.select(col("doc_id").as("id_b"), col("s").as("sb"))
    val want = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("_i", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("j", round(col("_i").cast("double") /
        (size(col("sa")) + size(col("sb")) - col("_i")).cast("double"), 4))
      .filter(col("j") >= 0.5)
      .select(col("id_a"), col("id_b"), col("j"))
      .orderBy("id_a", "id_b")
      .as[(Long, Long, Double)].collect().toSeq

    assert(got === want)
    assert(got.nonEmpty, "testdata should contain near-duplicate docs")
  }

  test("prefix filter prunes the candidate space hard") {
    val docs = Tables.documents(spark, sf)
    val n = docs.count()
    val allPairs = n * (n - 1) / 2
    // same canonical sets the operator builds (private) — rebuild via
    // the public path: candidates are bounded above by verified-pairs'
    // join input, so measure through the package-private hook
    val sets = {
      val post = docs.select(col("doc_id").as("_id"),
        explode(array_distinct(
          Text.shingles(Text.tokens(col("text")), 3))).as("_tok"))
      val dfreq = post.groupBy("_tok").agg(count(lit(1)).as("_df"))
      post.join(dfreq, "_tok").groupBy(col("_id"))
        .agg(array_sort(collect_list(struct(col("_df"), col("_tok")))).as("_st"))
        .select(col("_id"),
          transform(col("_st"), s => s.getField("_tok")).as("_stoks"))
        .withColumn("_sz", size(col("_stoks")))
    }
    val cands = PpJoin.candidates(sets, 0.5).count()
    assert(cands < allPairs / 20,
      s"prefix filter left $cands of $allPairs pairs — pruning too weak")
  }

  test("dsir: selection fraction, partition invariance, target affinity") {
    val docs = Tables.documents(spark, sf)
    val out = Dsir.scoreAndSelect(docs, "doc_id", "text",
      isTarget = col("source") === "src0", quantile = 0.8)
    val rows = out.collect()
    val n = rows.length
    val sel = rows.count(_.getInt(2) == 1)
    assert(n === docs.count())
    // >= threshold keeps AT LEAST the top 20% (ties can widen it)
    assert(sel >= n / 5 && sel <= n / 2, s"selected $sel of $n")

    // scores are BIGINT-sum deterministic: invariant under partitioning
    val re = Dsir.scoreAndSelect(docs.repartition(13), "doc_id", "text",
      isTarget = col("source") === "src0", quantile = 0.8)
    assert(re.orderBy("doc_id").collect().toSeq ===
      out.orderBy("doc_id").collect().toSeq)

    // planted check: a corpus whose target slice has a distinct
    // vocabulary must score target-like docs above the rest
    import spark.implicits._
    val planted = (
      (0L until 40L).map(i => (i, "alpha beta gamma delta " * 5, "tgt")) ++
      (40L until 80L).map(i => (i, "omega psi chi phi " * 5, "other")) ++
      (80L until 90L).map(i => (i, "alpha beta gamma delta " * 5, "other"))
    ).toDF("id", "text", "src")
    val scored = Dsir.scoreAndSelect(planted, "id", "text",
        isTarget = col("src") === "tgt", quantile = 0.8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val tgtLike = (80L until 90L).map(scored)
    val other = (40L until 80L).map(scored)
    assert(tgtLike.min > other.max,
      "target-vocabulary docs must outscore off-target docs")
  }
}
