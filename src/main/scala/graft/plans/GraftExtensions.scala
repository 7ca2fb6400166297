package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension points. Registers the native functions so they are
  * callable from SQL and via `call_function`:
  *
  *  - `graft_dot(a, b)` — codegen'd [[DotProduct]]
  *
  * Two registration paths: [[GraftExtensions]] for
  * `spark.sql.extensions=graft.plans.GraftExtensions` at session build
  * (the production cluster path), and [[registerOn]] for an existing
  * session (tests / driver-owned sessions).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.dotFunction)
    e.injectFunction(GraftExtensions.pqAdcFunction)
    e.injectFunction(GraftExtensions.minhashFunction)
    e.injectFunction(GraftExtensions.shinglesFunction)
    e.injectFunction(GraftExtensions.fingerprintFunction)
    e.injectFunction(GraftExtensions.simhashFunction)
    e.injectFunction(GraftExtensions.hllRegFunction)
    e.injectFunction(GraftExtensions.collapseFunction)
    e.injectFunction(GraftExtensions.textstatsFunction)
    e.injectFunction(GraftExtensions.gramStatsFunction)
    e.injectFunction(GraftExtensions.sortedPairsFunction)
    e.injectFunction(GraftExtensions.sortedPairsPackedFunction)
    e.injectFunction(GraftExtensions.firstCollisionFunction)
    e.injectFunction(GraftExtensions.bloomPosFunction)
    e.injectFunction(GraftExtensions.bloomMightFunction)
    e.injectFunction(GraftExtensions.hllAggFunction)
    e.injectFunction(GraftExtensions.bigramTableFunction)
    e.injectFunction(GraftExtensions.shingleExplodeFunction)
    e.injectFunction(GraftExtensions.removeSpansFunction)
    e.injectFunction(GraftExtensions.termCountsFunction)
    e.injectFunction(GraftExtensions.bigramCountsFunction)
    e.injectFunction(GraftExtensions.bm25TopKFunction)
    e.injectFunction(GraftExtensions.perplexityFunction)
    e.injectFunction(GraftExtensions.prefixC1Function)
    e.injectFunction(GraftExtensions.perplexityModelFunction)
    e.injectFunction(GraftExtensions.cosinePairsFunction)
    e.injectFunction(GraftExtensions.assignNearestFunction)
    e.injectFunction(GraftExtensions.tfidfTopKFunction)
    e.injectFunction(GraftExtensions.dsirBucketsFunction)
    e.injectFunction(GraftExtensions.dsirScoreFunction)
    e.injectFunction(GraftExtensions.sortableBitsFunction)
    e.injectFunction(GraftExtensions.sortedOverlapFunction)
    e.injectFunction(GraftExtensions.editPairsFunction)
    e.injectPlannerStrategy(_ => AsofJoinStrategy)
    e.injectPlannerStrategy(_ => PrefixPairsStrategy)
    // the optimizer rule must ride the production path too: without it
    // a cluster configured via spark.sql.extensions would run the
    // rn=1-window form at full shuffle width — the exact regression
    // the rewrite exists to prevent (registerOn adds the same rule via
    // experimental.extraOptimizations)
    e.injectOptimizerRule(_ => LatestWindowToMaxBy)
  }
}

object GraftExtensions {

  private val dotFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    (children: Seq[Expression]) => {
      requireArity(children, 2, "graft_dot(a, b)")
      DotProduct(children(0), children(1))
    })

  private val pqAdcFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_pq_adc"),
    new ExpressionInfo(classOf[PqAdc].getName, "graft_pq_adc"),
    (children: Seq[Expression]) => {
      requireArity(children, 2, "graft_pq_adc(codes, lut)")
      PqAdc(children(0), children(1))
    })

  /** `graft_minhash(shingles, k, family)` — k and family must be
    * literals (they shape the output schema).
    */
  private def buildMinhash(children: Seq[Expression]): Expression = {
    requireArity(children, 3, "graft_minhash(shingles, k, family)")
    import org.apache.spark.sql.catalyst.expressions.Literal
    val k = children(1) match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"graft_minhash: numHashes must be an int literal, got $other")
    }
    val fam = children(2) match {
      case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
      case other => throw new IllegalArgumentException(
        s"graft_minhash: family must be a string literal, got $other")
    }
    MinHashSignature(children(0), k, fam)
  }

  private val minhashFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_minhash"),
    new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
    buildMinhash _)

  /** `graft_shingles(tokens, n)` — n must be an int literal. */
  private def buildShingles(children: Seq[Expression]): Expression = {
    requireArity(children, 2, "graft_shingles(tokens, n)")
    import org.apache.spark.sql.catalyst.expressions.Literal
    val n = children(1) match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"graft_shingles: n must be an int literal, got $other")
    }
    Shingles(children(0), n)
  }

  private val shinglesFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_shingles"),
    new ExpressionInfo(classOf[Shingles].getName, "graft_shingles"),
    buildShingles _)

  /** `graft_textstats(tokens, stopwords...)` — stopwords as trailing
    * string literals (they parameterize the expression, not the rows).
    */
  private def buildTextStats(children: Seq[Expression]): Expression = {
    if (children.isEmpty) throw new IllegalArgumentException(
      "graft_textstats(tokens, stopwords...) takes at least 1 argument, got 0")
    import org.apache.spark.sql.catalyst.expressions.Literal
    val words = children.tail.map {
      case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
      case other => throw new IllegalArgumentException(
        s"graft_textstats: stopwords must be string literals, got $other")
    }
    TextStats(children.head, words)
  }

  private val hllRegFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_hll_reg"),
    new ExpressionInfo(classOf[HllReg].getName, "graft_hll_reg"),
    (children: Seq[Expression]) => {
      requireArity(children, 1, "graft_hll_reg(value)")
      HllReg(children.head)
    })

  private val simhashFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_simhash"),
    new ExpressionInfo(classOf[SimHashExpr].getName, "graft_simhash"),
    (children: Seq[Expression]) => {
      requireArity(children, 1, "graft_simhash(tokens)")
      SimHashExpr(children.head)
    })

  private val fingerprintFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_fingerprint"),
    new ExpressionInfo(classOf[Fingerprint].getName, "graft_fingerprint"),
    (children: Seq[Expression]) => {
      requireArity(children, 2, "graft_fingerprint(shingles, window)")
      Fingerprint(children(0), children(1))
    })

  private val collapseFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_collapse"),
    new ExpressionInfo(classOf[CollapseRepeats].getName, "graft_collapse"),
    (children: Seq[Expression]) => {
      requireArity(children, 1, "graft_collapse(tokens)")
      CollapseRepeats(children.head)
    })

  private val textstatsFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_textstats"),
    new ExpressionInfo(classOf[TextStats].getName, "graft_textstats"),
    buildTextStats _)

  private val gramStatsFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_gram_stats"),
    new ExpressionInfo(classOf[GramRepetitionStats].getName, "graft_gram_stats"),
    (children: Seq[Expression]) => {
      requireArity(children, 1, "graft_gram_stats(tokens)")
      GramRepetitionStats(children.head)
    })

  private val sortedPairsFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_sorted_pairs"),
    new ExpressionInfo(classOf[SortedPairs].getName, "graft_sorted_pairs"),
    (children: Seq[Expression]) => {
      requireArity(children, 1, "graft_sorted_pairs(sorted_bigint_array)")
      SortedPairs(children.head)
    })

  private val firstCollisionFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_first_collision"),
    new ExpressionInfo(classOf[FirstCollision].getName,
      "graft_first_collision"),
    (children: Seq[Expression]) => {
      requireArity(children, 2, "graft_first_collision(codes_a, codes_b)")
      FirstCollision(children(0), children(1))
    })

  private val sortedPairsPackedFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_sorted_pairs_packed"),
    new ExpressionInfo(classOf[SortedPairsPacked].getName,
      "graft_sorted_pairs_packed"),
    (children: Seq[Expression]) => {
      requireArity(children, 1,
        "graft_sorted_pairs_packed(sorted_bigint_array)")
      SortedPairsPacked(children.head)
    })

  /** Analysis-time arity check — a wrong argument count must surface
    * as a readable error naming the signature, not an
    * IndexOutOfBoundsException from children(i).
    */
  private def requireArity(children: Seq[Expression], n: Int,
      sig: String): Unit =
    if (children.length != n) throw new IllegalArgumentException(
      s"$sig takes $n arguments, got ${children.length}")

  private def intLit(e: Expression, fn: String, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be an int literal, got $other")
  }

  /** `graft_bloom_pos(key, mBits, numHashes)` — sizes are literals. */
  private def buildBloomPos(children: Seq[Expression]): Expression = {
    requireArity(children, 3, "graft_bloom_pos(key, mBits, numHashes)")
    BloomPositions(children(0),
      intLit(children(1), "graft_bloom_pos", "mBits"),
      intLit(children(2), "graft_bloom_pos", "numHashes"))
  }

  /** `graft_bloom_might(key, bits, numHashes)` — bits is the binary
    * literal carrying the built filter (held as a plan reference, not
    * inlined into generated source).
    */
  private def buildBloomMight(children: Seq[Expression]): Expression = {
    requireArity(children, 3, "graft_bloom_might(key, bits, numHashes)")
    import org.apache.spark.sql.catalyst.expressions.Literal
    val bits = children(1) match {
      case Literal(b: Array[Byte], org.apache.spark.sql.types.BinaryType) => b
      case other => throw new IllegalArgumentException(
        s"graft_bloom_might: bits must be a binary literal, got $other")
    }
    BloomMightContain(children(0), bits,
      intLit(children(2), "graft_bloom_might", "numHashes"))
  }

  private val bloomPosFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_bloom_pos"),
    new ExpressionInfo(classOf[BloomPositions].getName, "graft_bloom_pos"),
    buildBloomPos _)

  private val bloomMightFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_bloom_might"),
    new ExpressionInfo(classOf[BloomMightContain].getName, "graft_bloom_might"),
    buildBloomMight _)

  /** `graft_hll(value_string)` — the analyzer wraps the returned
    * AggregateFunction in its AggregateExpression.
    */
  private val hllAggFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_hll"),
    new ExpressionInfo(classOf[HllAgg].getName, "graft_hll"),
    (children: Seq[Expression]) => {
      requireArity(children, 1, "graft_hll(value)")
      HllAgg(children.head)
    })

  /** `graft_bigram_table(bc)` — imperative aggregate; the analyzer
    * wraps it in its AggregateExpression.
    */
  private val bigramTableFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_bigram_table"),
    new ExpressionInfo(classOf[BigramTableAgg].getName, "graft_bigram_table"),
    (children: Seq[Expression]) => {
      requireArity(children, 1, "graft_bigram_table(bc)")
      // the builder runs at analysis time on the driver, so the knob
      // rides the expression to executors as a constructor value
      val cap = org.apache.spark.sql.internal.SQLConf.get
        .getConfString(BigramTableAgg.VocabCapKey,
          BigramTableAgg.DefaultVocabCap.toString).toLong
      BigramTableAgg(children.head, vocabCap = cap)
    })

  /** `graft_shingle_explode(tokens, n)` — generator; n is a literal. */
  private def buildShingleExplode(children: Seq[Expression]): Expression = {
    requireArity(children, 2, "graft_shingle_explode(tokens, n)")
    ShingleExplode(children(0),
      intLit(children(1), "graft_shingle_explode", "n"))
  }

  private val shingleExplodeFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_shingle_explode"),
    new ExpressionInfo(classOf[ShingleExplode].getName, "graft_shingle_explode"),
    buildShingleExplode _)

  /** `graft_remove_spans(tokens, positions, k)` — k is a literal. */
  private def buildRemoveSpans(children: Seq[Expression]): Expression = {
    requireArity(children, 3, "graft_remove_spans(tokens, positions, k)")
    RemoveSpans(children(0), children(1),
      intLit(children(2), "graft_remove_spans", "k"))
  }

  private val removeSpansFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_remove_spans"),
    new ExpressionInfo(classOf[RemoveSpans].getName, "graft_remove_spans"),
    buildRemoveSpans _)

  private val termCountsFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_term_counts"),
    new ExpressionInfo(classOf[TermCounts].getName, "graft_term_counts"),
    (children: Seq[Expression]) => {
      requireArity(children, 1, "graft_term_counts(tokens)")
      TermCounts(children.head)
    })

  private val bigramCountsFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_bigram_counts"),
    new ExpressionInfo(classOf[BigramCounts].getName, "graft_bigram_counts"),
    (children: Seq[Expression]) => {
      requireArity(children, 1, "graft_bigram_counts(tokens)")
      BigramCounts(children.head)
    })

  private def doubleLit(e: Expression, fn: String, what: String): Double =
    e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Double, _) => v
      case other => throw new IllegalArgumentException(
        s"$fn: $what must be a double literal, got $other")
    }

  /** `graft_bm25_topk(tc, dl, model, k, k1, b)` — k/k1/b literals. */
  private def buildBm25TopK(children: Seq[Expression]): Expression = {
    requireArity(children, 6, "graft_bm25_topk(tc, dl, model, k, k1, b)")
    Bm25TopK(children(0), children(1), children(2),
      intLit(children(3), "graft_bm25_topk", "k"),
      doubleLit(children(4), "graft_bm25_topk", "k1"),
      doubleLit(children(5), "graft_bm25_topk", "b"))
  }

  private val bm25TopKFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_bm25_topk"),
    new ExpressionInfo(classOf[Bm25TopK].getName, "graft_bm25_topk"),
    buildBm25TopK _)

  private val perplexityFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_perplexity"),
    new ExpressionInfo(classOf[PerplexityScore].getName, "graft_perplexity"),
    (children: Seq[Expression]) => {
      requireArity(children, 2, "graft_perplexity(bc, model)")
      PerplexityScore(children(0), children(1))
    })

  private val prefixC1Function: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_prefix_c1"),
    new ExpressionInfo(classOf[PrefixContextCounts].getName, "graft_prefix_c1"),
    (children: Seq[Expression]) => {
      requireArity(children, 1, "graft_prefix_c1(c2arr)")
      PrefixContextCounts(children.head)
    })

  private val cosinePairsFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_cosine_pairs"),
    new ExpressionInfo(classOf[CosinePairs].getName, "graft_cosine_pairs"),
    (children: Seq[Expression]) => {
      requireArity(children, 4, "graft_cosine_pairs(a, b, same, minCosine)")
      CosinePairs(children(0), children(1), children(2),
        doubleLit(children(3), "graft_cosine_pairs", "minCosine"))
    })

  private val perplexityModelFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_perplexity_model"),
    new ExpressionInfo(classOf[PerplexityModel].getName, "graft_perplexity_model"),
    (children: Seq[Expression]) => {
      requireArity(children, 2, "graft_perplexity_model(c2arr, sup)")
      PerplexityModel(children(0), children(1))
    })

  private val dsirBucketsFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dsir_buckets"),
    new ExpressionInfo(classOf[DsirBuckets].getName, "graft_dsir_buckets"),
    (children: Seq[Expression]) => {
      requireArity(children, 1, "graft_dsir_buckets(tokens)")
      DsirBuckets(children.head)
    })

  private val dsirScoreFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dsir_score"),
    new ExpressionInfo(classOf[DsirScore].getName, "graft_dsir_score"),
    (children: Seq[Expression]) => {
      requireArity(children, 2, "graft_dsir_score(bcnts, lrarr)")
      DsirScore(children(0), children(1))
    })

  private val sortableBitsFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_sortable_bits"),
    new ExpressionInfo(classOf[SortableBits].getName, "graft_sortable_bits"),
    (children: Seq[Expression]) => {
      requireArity(children, 1, "graft_sortable_bits(v)")
      SortableBits(children.head)
    })

  private val sortedOverlapFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_sorted_overlap"),
    new ExpressionInfo(classOf[SortedOverlap].getName, "graft_sorted_overlap"),
    (children: Seq[Expression]) => {
      requireArity(children, 3, "graft_sorted_overlap(a, b, req)")
      SortedOverlap(children(0), children(1), children(2))
    })

  /** `graft_edit_pairs(a, b, same, maxDist)` — maxDist is a literal
    * (it parameterizes the banded DP, plan-time fixed like
    * graft_cosine_pairs' threshold).
    */
  private val editPairsFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_edit_pairs"),
    new ExpressionInfo(classOf[EditPairs].getName, "graft_edit_pairs"),
    (children: Seq[Expression]) => {
      requireArity(children, 4, "graft_edit_pairs(a, b, same, maxDist)")
      val k = intLit(children(3), "graft_edit_pairs", "maxDist")
      require(k >= 0, s"graft_edit_pairs: maxDist must be >= 0, got $k")
      EditPairs(children(0), children(1), children(2), k)
    })

  /** `graft_tfidf_topk(tc, model, k)` — k is a literal. */
  private val tfidfTopKFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_tfidf_topk"),
    new ExpressionInfo(classOf[TfIdfTopK].getName, "graft_tfidf_topk"),
    (children: Seq[Expression]) => {
      requireArity(children, 3, "graft_tfidf_topk(tc, model, k)")
      TfIdfTopK(children(0), children(1),
        intLit(children(2), "graft_tfidf_topk", "k"))
    })

  private val assignNearestFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_assign_nearest"),
    new ExpressionInfo(classOf[AssignNearest].getName, "graft_assign_nearest"),
    (children: Seq[Expression]) => {
      requireArity(children, 2, "graft_assign_nearest(uv, cents)")
      AssignNearest(children(0), children(1))
    })

  /** Idempotent registration on an already-built session. Builders are
    * the SAME values the injectFunction path ships — the arity checks
    * (requireArity's readable signature errors) must not differ
    * between the two registration paths.
    */
  def registerOn(spark: SparkSession): Unit = {
    Seq(dotFunction, pqAdcFunction, minhashFunction, shinglesFunction,
        fingerprintFunction, simhashFunction, hllRegFunction,
        collapseFunction, textstatsFunction, gramStatsFunction,
        sortedPairsFunction, sortedPairsPackedFunction,
        firstCollisionFunction, bloomPosFunction,
        bloomMightFunction, hllAggFunction, bigramTableFunction,
        shingleExplodeFunction,
        removeSpansFunction, termCountsFunction, bigramCountsFunction,
        bm25TopKFunction, perplexityFunction, prefixC1Function,
        perplexityModelFunction, cosinePairsFunction, assignNearestFunction,
        tfidfTopKFunction, dsirBucketsFunction, dsirScoreFunction,
        sortableBitsFunction, sortedOverlapFunction, editPairsFunction)
      .foreach { case (ident, _, builder) =>
        spark.sessionState.functionRegistry.createOrReplaceTempFunction(
          ident.funcName, builder, "built-in")
      }
    if (!spark.experimental.extraOptimizations.contains(LatestWindowToMaxBy))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ LatestWindowToMaxBy
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
    if (!spark.experimental.extraStrategies.contains(PrefixPairsStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ PrefixPairsStrategy
  }
}
