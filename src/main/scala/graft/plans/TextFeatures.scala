package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native text-cleaning/feature expressions — the per-document hot
  * path of the corpus queries (cleaning, quality scoring, the
  * end-to-end pipeline), fused into WholeStageCodegen. The builtin
  * higher-order-function formulations (`filter`/`transform` lambdas)
  * evaluate interpreted, one lambda frame per token; these compute the
  * same results in one tight loop per row and are spec-checked equal
  * to the HOF forms (`TextFeaturesSpec`).
  */

/** Adjacent-repeat collapse: keeps each element not (null-safe) equal
  * to its predecessor. Semantics identical to
  * `filter(toks, (t, i) -> NOT (t <=> get(toks, i - 1)))`.
  */
case class CollapseRepeats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_collapse expects array<string>, got $t")
    }

  override def dataType: DataType =
    ArrayType(StringType,
      child.dataType.asInstanceOf[ArrayType].containsNull)

  override def nullable: Boolean = child.nullable

  override def nullSafeEval(v: Any): Any =
    CollapseRepeats.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.CollapseRepeats.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): CollapseRepeats =
    copy(child = newChild)
}

object CollapseRepeats {
  def compute(toks: ArrayData): GenericArrayData = {
    val m = toks.numElements()
    val out = new java.util.ArrayList[Any](m)
    var prev: UTF8String = null
    var prevNull = false
    var i = 0
    while (i < m) {
      if (toks.isNullAt(i)) {
        // null token: equal to a preceding null (null-safe), kept after
        // a non-null (and as the first element)
        if (i == 0 || !prevNull) out.add(null)
        prev = null; prevNull = true
      } else {
        val t = toks.getUTF8String(i)
        if (i == 0 || prevNull || !t.equals(prev)) out.add(t)
        prev = t; prevNull = false
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** One-pass token statistics: n_tokens, n_distinct, n_stop (membership
  * in a fixed word set) and n_repeat (tokens equal to their
  * predecessor — what [[CollapseRepeats]] would drop). Equals the
  * four-HOF formulation at a fraction of the cost; null tokens count
  * toward n_tokens only (parity with `array_distinct`/`filter` count
  * semantics is spec-checked on null-free corpus tokens).
  */
case class TextStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_textstats expects array<string>, got $t")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("n_repeat", LongType, nullable = false)))

  override def nullable: Boolean = child.nullable

  @transient private lazy val stopSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](stopwords.size * 2)
    stopwords.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(v: Any): Any =
    TextStats.compute(v.asInstanceOf[ArrayData], stopSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopSet", stopSet,
      classOf[java.util.HashSet[UTF8String]].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.TextStats.compute($c, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

/** One-pass n-gram repetition statistics (the Gopher signals): for
  * each of n = 1, 2, 3, the most-frequent-gram count, the total gram
  * count and (trigrams) the duplicate mass Σ count·[count ≥ 2] — per
  * document, in one traversal with a local hash count per order. The
  * composed form (struct-array explode → (doc, n, gram) shuffle count
  * → two re-aggregations) moves ~3× the token volume through an
  * exchange to compute a quantity that never crosses documents; this
  * keeps it a zero-shuffle projection (`TextQueries.textRepetition`),
  * exchange-free at any corpus size.
  *
  * Gram text is `UTF8String.concatWs(" ", ...)` — byte-identical to
  * the composed `concat_ws(" ", w[i], ...)` including its null-token
  * skipping. Orders with no grams (fewer tokens than n) yield null
  * stats, mirroring the absent groups of the aggregated form.
  */
case class GramRepetitionStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_gram_stats expects array<string>, got $t")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("m1", LongType, nullable = false),
    StructField("m2", LongType, nullable = true),
    StructField("t2", LongType, nullable = true),
    StructField("m3", LongType, nullable = true),
    StructField("t3", LongType, nullable = true),
    StructField("d3", LongType, nullable = true)))

  override def nullable: Boolean = child.nullable

  override def nullSafeEval(v: Any): Any =
    GramRepetitionStats.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.GramRepetitionStats.compute($c);")

  override protected def withNewChildInternal(
      newChild: Expression): GramRepetitionStats = copy(child = newChild)
}

object GramRepetitionStats {
  private val Space = UTF8String.fromString(" ")

  def compute(toks: ArrayData): InternalRow = {
    val len = toks.numElements()
    val arr = new Array[UTF8String](len)
    var i = 0
    while (i < len) {
      arr(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      i += 1
    }
    // (top, dup) for one gram order; tot is len - n + 1 by construction
    def stats(n: Int): (Long, Long) = {
      val counts = new java.util.HashMap[UTF8String, Array[Long]](
        Math.max(16, (len - n + 1) * 2))
      var j = 0
      while (j <= len - n) {
        // concatWs skips nulls and never returns null — exactly the
        // composed concat_ws(" ", ...) gram text
        val g =
          if (n == 1) { if (arr(j) == null) UTF8String.EMPTY_UTF8 else arr(j) }
          else if (n == 2) UTF8String.concatWs(Space, arr(j), arr(j + 1))
          else UTF8String.concatWs(Space, arr(j), arr(j + 1), arr(j + 2))
        val c = counts.get(g)
        if (c == null) counts.put(g, Array(1L)) else c(0) += 1L
        j += 1
      }
      var top = 0L
      var dup = 0L
      val it = counts.values().iterator()
      while (it.hasNext) {
        val c = it.next()(0)
        if (c > top) top = c
        if (c >= 2L) dup += c
      }
      (top, dup)
    }
    val (m1, _) = stats(1)
    val row = new Array[Any](7)
    row(0) = len.toLong // n_words = unigram total
    row(1) = m1
    if (len >= 2) {
      val (m2, _) = stats(2)
      row(2) = m2; row(3) = (len - 1).toLong
    }
    if (len >= 3) {
      val (m3, d3) = stats(3)
      row(4) = m3; row(5) = (len - 2).toLong; row(6) = d3
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(row)
  }
}

object TextStats {
  def compute(toks: ArrayData,
      stop: java.util.HashSet[UTF8String]): InternalRow = {
    val m = toks.numElements()
    val seen = new java.util.HashSet[UTF8String](Math.max(16, m * 2))
    var nStop = 0L
    var nRepeat = 0L
    var prev: UTF8String = null
    var prevNull = false
    var sawNull = false
    var i = 0
    while (i < m) {
      if (toks.isNullAt(i)) {
        if (i > 0 && prevNull) nRepeat += 1
        sawNull = true; prev = null; prevNull = true
      } else {
        val t = toks.getUTF8String(i)
        if (i > 0 && !prevNull && t.equals(prev)) nRepeat += 1
        if (stop.contains(t)) nStop += 1
        seen.add(t)
        prev = t; prevNull = false
      }
      i += 1
    }
    val nDistinct = seen.size().toLong + (if (sawNull) 1L else 0L)
    InternalRow(m.toLong, nDistinct, nStop, nRepeat)
  }
}
