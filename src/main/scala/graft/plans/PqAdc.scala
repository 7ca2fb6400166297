package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native PQ asymmetric-distance sum: `graft_pq_adc(codes, lut)` =
  * Σ_s lut[s][codes[s]] over the subspaces in ascending index order
  * (bit-reproducible float summation, like [[DotProduct]]).
  *
  * This replaces the unrolled m-term
  * `element_at(element_at(lut, s+1), codes[s]+1) + …` chain the probe
  * originally built: at m = 32 that chain generates ~64 `element_at`
  * call sites in one method, far past Janino/JIT method limits, so the
  * ENTIRE probe stage silently fell out of whole-stage codegen and
  * scored pairs interpreted (~6 µs/pair measured at sf0.1 — the whole
  * reason `similarity_pq` sat above the 2× DuckDB gate). One tiny loop
  * expression keeps the stage compiled.
  *
  * NULL on: either argument NULL, length mismatch, a NULL element, or
  * an out-of-range code — the lenient element_at semantics; valid
  * encodings never hit these.
  */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_pq_adc expects (array<int>, array<array<double>>), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_pq_adc"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val codes = l.asInstanceOf[ArrayData]
    val lut = r.asInstanceOf[ArrayData]
    val n = codes.numElements()
    if (n != lut.numElements()) return null
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (codes.isNullAt(i) || lut.isNullAt(i)) return null
      val c = codes.getInt(i)
      val sub = lut.getArray(i)
      if (c < 0 || c >= sub.numElements() || sub.isNullAt(c)) return null
      sum += sub.getDouble(c)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val sub = ctx.freshName("sub")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = $codes.numElements();
         |double $sum = 0.0;
         |if ($n != $lut.numElements()) { ${ev.isNull} = true; }
         |else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($codes.isNullAt($i) || $lut.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    int $c = $codes.getInt($i);
         |    org.apache.spark.sql.catalyst.util.ArrayData $sub = $lut.getArray($i);
         |    if ($c < 0 || $c >= $sub.numElements() || $sub.isNullAt($c)) { ${ev.isNull} = true; break; }
         |    $sum += $sub.getDouble($c);
         |  }
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}
