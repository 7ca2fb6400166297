package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** A/B for the r20 PPJoin sets-build attack (VERDICT r19 #1): the
  * canonical-set build is the dominant phase at scale (~3.7 s median
  * at x10 after the r19 sort sweep). Hypotheses measured here, against
  * the production shape, alternating reps so host drift hits both:
  *
  *  A  production `PpJoin.pairs` (string-keyed canonical build; verify
  *     sides re-sort the checkpointed canonical arrays).
  *  B  hash-keyed build: postings carry `xxhash64(tok)` (8-byte keys
  *     through the dfreq groupBy, the df join and the per-doc
  *     canonical sort — struct(long, long) compares instead of
  *     struct(long, string)); the checkpoint stores only PREFIX hashes
  *     (the slice the candidate stage consumes) + sz; verify sides are
  *     rebuilt MAP-SIDE from the parquet scan (shingle + one lex
  *     sort_array per doc, no checkpoint storage, no canonical-array
  *     re-sort). Hash collisions can only merge df counts (a different
  *     but still global canonical order — prefix filter stays lossless)
  *     or duplicate a posting (candidates are distinct()'d); the exact
  *     string-overlap verify is untouched, so the final pair set is
  *     IDENTICAL (cross-checked below).
  *
  * Sub-phase timings locate where any delta comes from.
  * Output: one JSON line; medians over GRAFT_AB_RUNS alternating runs.
  */
object ProfilePpSetsBuild {

  /** The B candidate end-to-end, assembled from production pieces
    * (PrefixPairsNode unchanged — LongType is binary-stable). Hybrid
    * of the two r20 measurements: the pure-hash form won x10 (2.53 vs
    * 3.93 s sets build) but lost sf0.1 by ~0.5 s because it shingles
    * the corpus three times (postings + both verify sides). Here the
    * corpus is shingled ONCE into a checkpointed lex-sorted sets
    * frame; the postings derive from it by explode (order irrelevant
    * for df counting), and the verify sides read it directly with no
    * per-side re-sort.
    */
  def pairsHash(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, minJaccard: Double): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    import org.apache.spark.sql.types.LongType
    val spark = docs.sparkSession
    val lex = docs.select(col(idCol).as("_id"),
        sort_array(array_distinct(
          Text.shingles(Text.tokens(col(textCol)), shingleN))).as("_lex"))
      .withColumn("_sz", size(col("_lex")))
      .localCheckpoint()
    val post = lex
      .select(col("_id"), explode(col("_lex")).as("_tok"))
      .select(col("_id"), xxhash64(col("_tok")).as("_h"))
    val dfreq = post.groupBy("_h").agg(count(lit(1)).as("_df"))
    val sets = post.join(dfreq, "_h")
      .groupBy(col("_id"))
      .agg(sort_array(collect_list(struct(col("_df"), col("_h")))).as("_st"))
      .select(col("_id"),
        transform(col("_st"), s => s.getField("_h")).as("_shs"))
      .withColumn("_sz", size(col("_shs")))
      .select(col("_id"), col("_sz"),
        slice(col("_shs"), lit(1),
          (col("_sz") - ceil(lit(minJaccard) * col("_sz")) + 1).cast("int"))
          .as("_pref"))
      .localCheckpoint()
    val pre = sets
      .select(col("_id"), col("_sz"),
        posexplode(col("_pref")).as(Seq("_p", "_ptok")))
      .filter(col("_ptok").isNotNull && col("_id").isNotNull)
      .select(col("_ptok"), col("_id"), col("_sz"), col("_p"))
    val node = graft.plans.PrefixPairsNode(minJaccard,
      pre.queryExecution.analyzed,
      AttributeReference("id_a", LongType, nullable = false)(),
      AttributeReference("id_b", LongType, nullable = false)())
    val cands = org.apache.spark.sql.graft.PlanDsl.ofRows(spark, node)
      .distinct()
    val xa = lex.select(col("_id").as("id_a"), col("_lex").as("_ta"),
        col("_sz").as("_verify_sza"))
      .hint("shuffle_hash")
    val xb = lex.select(col("_id").as("id_b"), col("_lex").as("_tb"),
        col("_sz").as("_verify_szb"))
      .hint("shuffle_hash")
    val tq = minJaccard - 5e-5
    val req = ceil(lit(tq / (1.0 + tq)) *
      (col("_verify_sza") + col("_verify_szb")) - lit(1e-9))
    cands
      .join(xa, "id_a").join(xb, "id_b")
      .withColumn("_inter",
        call_function("graft_sorted_overlap", col("_ta"), col("_tb"), req))
      .withColumn("jaccard", round(col("_inter").cast("double") /
        (col("_verify_sza") + col("_verify_szb") - col("_inter"))
          .cast("double"), 4))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** The r19 production shape, frozen here as the A/B baseline after
    * the hybrid landed in [[graft.ext.PpJoin.pairs]] (an A/B of
    * production-vs-tool would otherwise compare the hybrid to itself):
    * string-keyed canonical build, verify sides re-sorting the
    * checkpointed canonical arrays per side.
    */
  def pairsOld(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, minJaccard: Double): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    import org.apache.spark.sql.types.LongType
    val spark = docs.sparkSession
    val post = docs.select(col(idCol).as("_id"),
      explode(array_distinct(
        Text.shingles(Text.tokens(col(textCol)), shingleN))).as("_tok"))
    val dfreq = post.groupBy("_tok").agg(count(lit(1)).as("_df"))
    val sets = post.join(dfreq, "_tok")
      .groupBy(col("_id"))
      .agg(sort_array(collect_list(struct(col("_df"), col("_tok")))).as("_st"))
      .select(col("_id"),
        transform(col("_st"), s => s.getField("_tok")).as("_stoks"))
      .withColumn("_sz", size(col("_stoks")))
      .localCheckpoint()
    val pre = sets.select(col("_id"), col("_sz"),
        posexplode(slice(col("_stoks"), lit(1),
          (col("_sz") - ceil(lit(minJaccard) * col("_sz")) + 1).cast("int")))
          .as(Seq("_p", "_ptok")))
      .filter(col("_ptok").isNotNull && col("_id").isNotNull)
      .select(col("_ptok"), col("_id"), col("_sz"), col("_p"))
    val node = graft.plans.PrefixPairsNode(minJaccard,
      pre.queryExecution.analyzed,
      AttributeReference("id_a", LongType, nullable = false)(),
      AttributeReference("id_b", LongType, nullable = false)())
    val cands = org.apache.spark.sql.graft.PlanDsl.ofRows(spark, node)
      .distinct()
    val xa = sets.select(col("_id").as("id_a"),
        sort_array(col("_stoks")).as("_ta"), col("_sz").as("_verify_sza"))
      .hint("shuffle_hash")
    val xb = sets.select(col("_id").as("id_b"),
        sort_array(col("_stoks")).as("_tb"), col("_sz").as("_verify_szb"))
      .hint("shuffle_hash")
    val tq = minJaccard - 5e-5
    val req = ceil(lit(tq / (1.0 + tq)) *
      (col("_verify_sza") + col("_verify_szb")) - lit(1e-9))
    cands
      .join(xa, "id_a").join(xb, "id_b")
      .withColumn("_inter",
        call_function("graft_sorted_overlap", col("_ta"), col("_tb"), req))
      .withColumn("jaccard", round(col("_inter").cast("double") /
        (col("_verify_sza") + col("_verify_szb") - col("_inter"))
          .cast("double"), 4))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("GRAFT_AB_RUNS", "5").toInt
    val spark = Harness.session()
    val docs = graft.Tables.documents(spark, sfDir)

    def noop(f: => DataFrame): Double =
      Harness.time(f.write.format("noop").mode("overwrite").save())
    def med(a: Seq[Double]) = a.sorted.apply((a.length - 1) / 2)

    // exactness cross-check first (also warms both shapes):
    // A = the frozen r19 string-keyed baseline, B = landed production
    val a0 = pairsOld(docs, "doc_id", "text", 3, 0.5)
    val b0 = graft.ext.PpJoin.pairs(docs, "doc_id", "text", 3, 0.5)
    val onlyA = a0.exceptAll(b0).count()
    val onlyB = b0.exceptAll(a0).count()
    require(onlyA == 0 && onlyB == 0,
      s"hash-keyed pairs diverge: onlyA=$onlyA onlyB=$onlyB")

    // alternating full-query reps
    val fa = new scala.collection.mutable.ArrayBuffer[Double]
    val fb = new scala.collection.mutable.ArrayBuffer[Double]
    (1 to runs).foreach { _ =>
      fa += noop(pairsOld(docs, "doc_id", "text", 3, 0.5))
      fb += noop(graft.ext.PpJoin.pairs(docs, "doc_id", "text", 3, 0.5))
    }

    // sub-phases (alternating)
    val pPost = new scala.collection.mutable.ArrayBuffer[Double]
    val pSetsA = new scala.collection.mutable.ArrayBuffer[Double]
    val pSetsB = new scala.collection.mutable.ArrayBuffer[Double]
    val pLex = new scala.collection.mutable.ArrayBuffer[Double]
    val base = docs.select(col("doc_id").as("_id"),
      array_distinct(Text.shingles(Text.tokens(col("text")), 3)).as("_toks"))
    (1 to runs).foreach { _ =>
      // raw posting materialization (the map-side shingle cost — the
      // current build runs this pipeline TWICE, dfreq + join branches)
      pPost += noop(base.select(col("_id"), explode(col("_toks")).as("_tok")))
      pSetsA += Harness.time { // the r19 string-keyed build
        val post = base.select(col("_id"), explode(col("_toks")).as("_tok"))
        val dfreq = post.groupBy("_tok").agg(count(lit(1)).as("_df"))
        post.join(dfreq, "_tok")
          .groupBy(col("_id"))
          .agg(sort_array(collect_list(struct(col("_df"), col("_tok"))))
            .as("_st"))
          .select(col("_id"),
            transform(col("_st"), s => s.getField("_tok")).as("_stoks"))
          .withColumn("_sz", size(col("_stoks")))
          .localCheckpoint()
      }
      pSetsB += Harness.time( // landed: one lex pass + hash canonical
        graft.ext.PpJoin.canonicalSets(docs, "doc_id", "text", 3))
      // map-side lex verify side (runs twice per B query, xa + xb)
      pLex += noop(base.select(col("_id"), sort_array(col("_toks")).as("_t"),
        size(col("_toks")).as("_sz")))
    }

    println(f"""{"sf":"$sfDir","full_a_med":${med(fa.toSeq)}%.2f,"full_b_med":${med(fb.toSeq)}%.2f,"post_med":${med(pPost.toSeq)}%.2f,"sets_a_med":${med(pSetsA.toSeq)}%.2f,"sets_b_med":${med(pSetsB.toSeq)}%.2f,"lex_med":${med(pLex.toSeq)}%.2f,"full_a":[${fa.map(x => f"$x%.2f").mkString(",")}],"full_b":[${fb.map(x => f"$x%.2f").mkString(",")}],"sets_a":[${pSetsA.map(x => f"$x%.2f").mkString(",")}],"sets_b":[${pSetsB.map(x => f"$x%.2f").mkString(",")}]}""")
    spark.stop()
  }
}
