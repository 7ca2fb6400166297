package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All ordered element pairs (i < j by POSITION) of a bigint array as
  * one codegen'd pass — the market-basket pair fan-out. Fed a sorted
  * distinct basket (`sort_array(collect_set(...))`), positional order
  * IS value order, so every emitted pair is canonical (part_a <
  * part_b) with no post-filter. Semantics identical to the HOF
  * formulation (`flatten(transform(a, (x, i) -> transform(slice(a,
  * i+2, n-i-1), y -> struct(x, y))))`), but HOFs are CodegenFallback —
  * the nested lambda frames and per-element slice allocations run
  * interpreted and break whole-stage codegen for the whole projection;
  * this stays fused. O(b²) per basket is the bounded-blocking shape:
  * baskets are order-sized (single digits), never corpus-sized.
  */
case class SortedPairs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
      case ArrayType(LongType, true) => TypeCheckResult.TypeCheckFailure(
        "graft_sorted_pairs expects an array with non-null elements " +
          "(compute reads primitives — a null element would silently " +
          "become 0); produce the basket via sort_array(collect_set(...))")
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_sorted_pairs expects array<bigint>, got $t")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("part_a", LongType, nullable = false),
    StructField("part_b", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = child.nullable

  override def nullSafeEval(v: Any): Any =
    SortedPairs.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SortedPairs.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SortedPairs =
    copy(child = newChild)
}

object SortedPairs {
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      val a = arr.getLong(i)
      var j = i + 1
      while (j < n) {
        out(k) = new GenericInternalRow(
          Array[Any](a, arr.getLong(j)): Array[Any])
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** [[SortedPairs]] with each pair PACKED into one bigint
  * (`a << 32 | b`; both members must fit unsigned 32 bits — enforced
  * loudly, since a silent wrap would alias distinct pairs). The point
  * is the aggregation that follows the explode: a single-long group
  * key stays on Spark's primitive fixed-width hash-map fast path and
  * ships 8 bytes per pair through the exchange, where the struct form
  * pays per-pair row allocation, a 16-byte-plus-header key, and the
  * generic map. Unpack with `shiftright(p, 32)` / `p & 0xFFFFFFFF`;
  * UNSIGNED packed order = (part_a, part_b) lexicographic order —
  * members past 2^31 pack to negative longs, so an order-sensitive
  * consumer must compare unsigned (`p ^ Long.MinValue` under a signed
  * sort, as `copurchase_pairs` does); equality consumers (dedup via
  * distinct/groupBy) need no correction at any width.
  */
case class SortedPairsPacked(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
      case ArrayType(LongType, true) => TypeCheckResult.TypeCheckFailure(
        "graft_sorted_pairs_packed expects an array with non-null " +
          "elements; produce the basket via sort_array(collect_set(...))")
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_sorted_pairs_packed expects array<bigint>, got $t")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = child.nullable

  override def nullSafeEval(v: Any): Any =
    SortedPairsPacked.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SortedPairsPacked.compute($c);")

  override protected def withNewChildInternal(
      newChild: Expression): SortedPairsPacked = copy(child = newChild)
}

object SortedPairsPacked {
  private final val Max32 = 0xFFFFFFFFL

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      val a = arr.getLong(i)
      if (a < 0L || a > Max32) throw new IllegalArgumentException(
        s"graft_sorted_pairs_packed: element $a exceeds unsigned 32 bits")
      var j = i + 1
      while (j < n) {
        val b = arr.getLong(j)
        if (b < 0L || b > Max32) throw new IllegalArgumentException(
          s"graft_sorted_pairs_packed: element $b exceeds unsigned 32 bits")
        out(k) = (a << 32) | b
        k += 1
        j += 1
      }
      i += 1
    }
    // fromPrimitiveArray keeps the longs unboxed (GenericArrayData's
    // Array[Long] constructor boxes every element — measured 2.3×
    // slower end-to-end on a 234M-pair candidate stage)
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
}
