package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bloom-filter expressions for semi-join pruning (see
  * [[graft.operators.BloomPrune]] for the operator and the scale
  * rationale). Both sides of the protocol are codegen'd native
  * expressions sharing one splitmix64-based double-hashing scheme:
  *
  *  - [[BloomPositions]] (build side): the `numHashes` bit positions
  *    of a key — exploded and OR-folded into the bitset by a plain
  *    aggregation, so the filter is built distributed, in one pass,
  *    order-independently.
  *  - [[BloomMightContain]] (probe side): bit-test of a key against
  *    the broadcast bitset (a plan reference object, not an inlined
  *    literal) — false positives possible, false negatives never, so
  *    a downstream exact join keeps results identical.
  *
  * Arithmetic wraps in Java semantics inside the expression, immune to
  * the session's ANSI overflow checking — one reason this is an
  * `Expression` and not a Column formula.
  */
object BloomHash {

  /** splitmix64 finalizer — full-avalanche 64-bit mix. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** i-th probe position of value v in an m-bit filter (double
    * hashing: h1 + i·h2, h2 forced odd).
    */
  def position(v: Long, i: Int, mBits: Int): Int = {
    val h1 = mix(v)
    val h2 = mix(v ^ 0x5851f42d4c957f2dL) | 1L
    (((h1 + i * h2) & Long.MaxValue) % mBits).toInt
  }

  /** Called from generated code (probe side). */
  def mightContain(bits: Array[Byte], numHashes: Int, v: Long): Boolean = {
    val m = bits.length << 3
    var i = 0
    while (i < numHashes) {
      val p = position(v, i, m)
      if (((bits(p >>> 3) >> (p & 7)) & 1) == 0) return false
      i += 1
    }
    true
  }

  /** Called from generated code (build side). */
  def positions(v: Long, mBits: Int, numHashes: Int): GenericArrayData = {
    val out = new Array[Int](numHashes)
    var i = 0
    while (i < numHashes) {
      out(i) = position(v, i, mBits)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_bloom_pos(key, mBits, numHashes)` → array<int>. */
case class BloomPositions(child: Expression, mBits: Int, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType if mBits > 0 && (mBits & 63) == 0 && numHashes > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_pos expects (bigint, mBits multiple of 64 > 0, k > 0), got ($t, $mBits, $numHashes)")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullable: Boolean = child.nullable

  override def nullSafeEval(v: Any): Any =
    BloomHash.positions(v.asInstanceOf[Long], mBits, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.BloomHash.positions($c, $mBits, $numHashes);")

  override def prettyName: String = "graft_bloom_pos"

  override protected def withNewChildInternal(newChild: Expression): BloomPositions =
    copy(child = newChild)
}

/** `graft_bloom_might(key, bits, numHashes)` → boolean. */
case class BloomMightContain(child: Expression, bits: Array[Byte], numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType if bits.nonEmpty && numHashes > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_might expects (bigint, non-empty bits, k > 0), got $t")
  }

  override def dataType: DataType = BooleanType

  override def nullable: Boolean = child.nullable

  override def nullSafeEval(v: Any): Any =
    BloomHash.mightContain(bits, numHashes, v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBits", bits, "byte[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.BloomHash.mightContain($ref, $numHashes, $c);")
  }

  override def prettyName: String = "graft_bloom_might"

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
