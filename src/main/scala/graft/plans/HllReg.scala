package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native HLL register derivation: `graft_hll_reg(value)` =
  * `struct(bucket, rho)` where `bucket` is the first md5 byte (m=256)
  * and `rho` is 1 + the number of leading zero BITS of the next 40
  * bits (nibbles 2..11), capped at 41 for an all-zero tail — exactly
  * the [[graft.ext.Hll]] hex-string derivation
  * (`conv(substring(hex,1,2),16,10)` bucket; regex zero-strip + CASE
  * rho), which the DuckDB oracle replays in SQL.
  *
  * Spec-checked bit-equal to that hex form. The point is the hot
  * per-row path: the declarative derivation references the md5 hex in
  * FIVE sub-expressions (bucket conv, regex strip, two lengths, CASE
  * on the first surviving digit) that the aggregate's projection does
  * not reliably share, measured ~4 s of the 5 s `approx_distinct`
  * total at bench sf0.1 — here it is one digest + two integer ops.
  *
  * NULL on null input ([[graft.ext.Hll.registers]] filters nulls
  * first, matching COUNT(DISTINCT)).
  */
case class HllReg(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_hll_reg expects string, got $t")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("bucket", IntegerType, nullable = false),
    StructField("rho", IntegerType, nullable = false)))

  override def nullable: Boolean = child.nullable

  override def prettyName: String = "graft_hll_reg"

  override def nullSafeEval(v: Any): Any =
    HllReg.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.HllReg.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): HllReg =
    copy(child = newChild)
}

object HllReg {

  def compute(v: UTF8String): InternalRow = {
    // ONE shared derivation with the imperative [[HllAgg]] sketch
    // ([[Md5Util.bucketRho]]) — the two register paths are gated by
    // the same oracle and must stay bit-identical by construction
    val br = Md5Util.bucketRho(Md5Util.digest(v.getBytes))
    new GenericInternalRow(Array[Any](br >>> 8, br & 0xff))
  }
}
