package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `graft_shingle_explode(tokens, n)` — word n-gram shingling as a
  * custom `Generator` (the UDTF extension tier): one row in, one row
  * per shingle out, WITHOUT materializing the intermediate
  * `array<string>` that `explode(graft_shingles(...))` builds per
  * document first. Implements `CollectionGenerator`, so `GenerateExec`
  * runs it inside whole-stage codegen exactly like the builtin
  * `explode` — the generated loop walks the shingle collection in
  * place.
  *
  * Semantics are [[Shingles]]' (concat_ws null-skip, shorter-than-n
  * whole-text fallback); `ShingleExplodeSpec` pins generator ==
  * explode-of-expression equality, and the `shingle_explode` query is
  * oracle-gated on the same SQL shingle derivation the dedup oracles
  * replay.
  */
case class ShingleExplode(child: Expression, n: Int)
    extends UnaryExpression with CollectionGenerator {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) if n > 0 => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_shingle_explode expects (array<string>, n > 0), got ($t, $n)")
    }

  override def elementSchema: StructType =
    StructType(StructField("shingle", StringType, nullable = false) :: Nil)

  override val inline: Boolean = false
  override val position: Boolean = false

  override def collectionType: DataType = ArrayType(StringType, containsNull = false)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val arr = Shingles.compute(v.asInstanceOf[ArrayData], n)
      val out = new Array[InternalRow](arr.numElements())
      var i = 0
      while (i < out.length) {
        out(i) = new GenericInternalRow(Array[Any](arr.get(i, StringType)))
        i += 1
      }
      out
    }
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    // GenerateExec consumes the collection form: emit the shingle array
    // (same generated body as Shingles) and let the generate loop walk it
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.Shingles.compute($c, $n);")
  }

  override def prettyName: String = "graft_shingle_explode"

  override protected def withNewChildInternal(newChild: Expression): ShingleExplode =
    copy(child = newChild)
}
