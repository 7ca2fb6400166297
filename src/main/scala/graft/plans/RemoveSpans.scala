package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `graft_remove_spans(tokens, positions, k)` — drop every token
  * covered by a span `[p, p + k)` for any `p` in `positions`
  * (ascending sort required; the caller's `sort_array` provides it).
  * The workhorse of substring-level exact dedup: `positions` are the
  * start offsets of k-grams known to repeat elsewhere in the corpus,
  * so the kept tokens are exactly the text outside every repeated
  * span of length >= k.
  *
  * One linear two-pointer sweep per document (tokens pointer + marks
  * pointer, a running covered-until watermark), fused into
  * WholeStageCodegen — vs the O(tokens x marks) membership test a
  * higher-order-function formulation would evaluate interpreted.
  */
case class RemoveSpans(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType, _)) if k > 0 =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_remove_spans expects (array<string>, array<int>, k > 0), got ($l, $r, $k)")
    }

  override def dataType: DataType = left.dataType

  override def prettyName: String = "graft_remove_spans"

  override def nullSafeEval(toks: Any, marks: Any): Any =
    RemoveSpans.compute(toks.asInstanceOf[ArrayData],
      marks.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, m) =>
      s"${ev.value} = graft.plans.RemoveSpans.compute($t, $m, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RemoveSpans =
    copy(left = newLeft, right = newRight)
}

object RemoveSpans {
  /** `marks` must be ascending; null marks are skipped. */
  def compute(toks: ArrayData, marks: ArrayData, k: Int): GenericArrayData = {
    val n = toks.numElements()
    val m = marks.numElements()
    val out = new java.util.ArrayList[Any](n)
    var j = 0
    var coveredUntil = -1
    var i = 0
    while (i < n) {
      while (j < m && (marks.isNullAt(j) || marks.getInt(j) <= i)) {
        if (!marks.isNullAt(j)) {
          val end = marks.getInt(j) + k - 1
          if (end > coveredUntil) coveredUntil = end
        }
        j += 1
      }
      if (i > coveredUntil)
        out.add(if (toks.isNullAt(i)) null else toks.getUTF8String(i))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
