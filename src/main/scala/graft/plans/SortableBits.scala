package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** `graft_sortable_bits(v)` — the IEEE-754 order isomorphism from
  * `double` to signed `long`: for any two doubles,
  * `java.lang.Double.compare(a, b) < 0  ⇔  f(a) < f(b)`.
  *
  * `f(v) = bits ^ ((bits >> 63) & Long.MaxValue)` with
  * `bits = doubleToLongBits(v)`: non-negative doubles keep their bit
  * pattern (already ascending), negative doubles get their magnitude
  * bits flipped so "more negative" maps lower, and the canonicalized
  * NaN lands above +Infinity — exactly the `Double.compare` total
  * order (`-0.0` maps to −1, just below `+0.0`'s 0, matching the
  * comparator's `-0.0 < 0.0`).
  *
  * The isomorphism is what lets [[graft.ext.Quantiles]] build its
  * (group, slice) histogram WITHOUT a prior (min, max) pass: a slice
  * is just the top bits of `f(v)` (`shiftright(f, 52 − binadeBits)`
  * keeps sign + exponent + `binadeBits` mantissa bits), monotone by
  * construction at every granularity, and refinable in place by
  * shifting fewer bits — no data-dependent slice width anywhere.
  */
case class SortableBits(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_sortable_bits expects double, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val b = java.lang.Double.doubleToLongBits(input.asInstanceOf[Double])
    b ^ ((b >> 63) & Long.MaxValue)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.freshName("b")
      s"""
         |long $b = Double.doubleToLongBits($c);
         |${ev.value} = $b ^ (($b >> 63) & 0x7fffffffffffffffL);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SortableBits =
    copy(child = newChild)

  override def prettyName: String = "graft_sortable_bits"
}
