package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 32-bit SimHash: `graft_simhash(tokens)` = the 32-char
  * '0'/'1' signature where each token votes +1/-1 per bit by its md5
  * hex digit (digit >= '8' — i.e. the nibble's high bit — votes +1)
  * and a signature bit is '1' where the vote total is positive.
  *
  * Semantics are IDENTICAL to [[graft.functions.SimHash.simhash32]]'s
  * builtin-HOF fold (spec-checked equal), including the quirk that a
  * NULL token votes -1 on every bit (md5(null) is null, so the HOF's
  * `when(h.substr >= '8', 1).otherwise(-1)` takes the otherwise
  * branch) — but computed in ONE native loop over the digest's
  * nibbles: the HOF form evaluates an interpreted lambda fold with a
  * fresh 32-element array per token (measured 9.2 s at bench sf0.1
  * where this expression runs in well under a second).
  */
case class SimHashExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_simhash expects array<string>, got $t")
    }

  override def dataType: DataType = StringType

  // HOF-parity on NULL input too: `concat_ws("", transform(NULL, ...))`
  // is the EMPTY STRING (concat_ws skips null arguments), never null —
  // a null-text document's signature groups under '' on both the old
  // fold and this expression, so the result is never null
  override def nullable: Boolean = false

  override def prettyName: String = "graft_simhash"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) UTF8String.EMPTY_UTF8
    else SimHashExpr.compute(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        org.apache.spark.unsafe.types.UTF8String ${ev.value} =
          ${childGen.isNull}
            ? org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8
            : graft.plans.SimHashExpr.compute(${childGen.value});
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

object SimHashExpr {

  def compute(toks: ArrayData): UTF8String = {
    val n = toks.numElements()
    val votes = new Array[Int](32)
    val md = Md5Util.local.get()
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) {
        // HOF-parity: a null token's null digest fails every >= '8'
        // predicate, so it votes -1 on all bits
        var j = 0
        while (j < 32) { votes(j) -= 1; j += 1 }
      } else {
        md.reset()
        val d = md.digest(toks.getUTF8String(i).getBytes)
        var j = 0
        while (j < 16) {
          val b = d(j) & 0xff
          if ((b & 0x80) != 0) votes(2 * j) += 1 else votes(2 * j) -= 1
          if ((b & 0x08) != 0) votes(2 * j + 1) += 1 else votes(2 * j + 1) -= 1
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[Byte](32)
    var j = 0
    while (j < 32) {
      out(j) = if (votes(j) > 0) '1'.toByte else '0'.toByte
      j += 1
    }
    UTF8String.fromBytes(out)
  }
}
