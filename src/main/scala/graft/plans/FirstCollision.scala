package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** First index at which two int arrays agree (-1 if none) — the
  * multi-table LSH "first collision" test, codegen'd so it can run on
  * hundreds of millions of in-flight candidate pairs without breaking
  * whole-stage codegen (the HOF formulation `exists(zip_with(...))` is
  * CodegenFallback).
  *
  * Why it exists (the scale story): a pair of near-identical vectors
  * collides in MANY of the `tables` hash tables, so the bucket
  * self-join generates the same pair up to `tables` times and the
  * composed plan pays a corpus-pair-sized `distinct` exchange to
  * dedup. Keeping each pair ONLY in its first colliding table
  * (`graft_first_collision(codes_a, codes_b) = t`) makes the generated
  * stream unique BY CONSTRUCTION: the dedup happens map-side inside
  * the join's codegen stage against two vocab-of-tables-sized code
  * arrays riding the postings, and the pair-grain exchange disappears
  * from the plan. Standard LSH practice (e.g. the multi-probe/LSH
  * forest literature); exactness holds because bucket codes are
  * bijective with bucket bit-strings for bits <= 31.
  */
case class FirstCollision(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_first_collision expects (array<int>, array<int>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    FirstCollision.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.FirstCollision.compute($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): FirstCollision = copy(newLeft, newRight)
}

object FirstCollision {
  def compute(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    while (i < n) {
      // null elements never collide (a null code would otherwise
      // equal-match and silently drop real pairs)
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getInt(i) == b.getInt(i))
        return i
      i += 1
    }
    -1
  }
}
