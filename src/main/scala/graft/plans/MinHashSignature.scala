package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whole MinHash signature in one codegen'd pass — the hot loop of the
  * near-duplicate pipeline computed without per-element lambda frames
  * or the 16 intermediate arrays the HOF formulation
  * (`transform(sequence(...), i -> array_min(transform(set, s ->
  * hash(i, s))))`) allocates per row.
  *
  * Two hash families, both engine-portable (a DuckDB oracle computes
  * bit-identical signatures):
  *
  *  - `md5`: element i = lexicographic min over the shingle set of
  *    `md5(i || '|' || shingle)` as 32-hex — byte-identical to the
  *    builtin-HOF md5 family, so existing oracles keep matching.
  *  - `poly`: element i = numeric min of the seeded polynomial hash
  *    `fold(codepoints(s), h0 = i + 1, h -> (h * 131 + cp) mod 1e9+7)`
  *    — one codepoint decode per shingle then pure integer math, the
  *    production-fast family, reproducible in SQL via
  *    `list_reduce(list_prepend(i + 1, codepoints), ...)`.
  */
case class MinHashSignature(child: Expression, numHashes: Int, family: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, family) match {
      case (ArrayType(StringType, _), "md5" | "poly") if numHashes > 0 =>
        TypeCheckResult.TypeCheckSuccess
      case (t, f) => TypeCheckResult.TypeCheckFailure(
        s"graft_minhash expects (array<string>, k > 0, 'md5'|'poly'), got ($t, $numHashes, '$f')")
    }

  override def dataType: DataType = family match {
    case "md5" => ArrayType(StringType, containsNull = true)
    case _     => ArrayType(LongType, containsNull = true)
  }

  override def nullable: Boolean = child.nullable

  // seed prefixes ("0|", "1|", ...) precomputed once per plan
  @transient private lazy val md5Prefixes: Array[Array[Byte]] =
    Array.tabulate(numHashes)(i => (i.toString + "|").getBytes("UTF-8"))

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    if (family == "md5") MinHashSignature.md5Signature(arr, md5Prefixes)
    else MinHashSignature.polySignature(arr, numHashes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mod = "graft.plans.MinHashSignature"
    if (family == "md5") {
      val pref = ctx.addReferenceObj("md5Prefixes", md5Prefixes, "byte[][]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = $mod.md5Signature($c, $pref);")
    } else {
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = $mod.polySignature($c, $numHashes);")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {

  final val PolyMod = 1000000007L
  final val PolyMult = 131L

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val hexDigits = "0123456789abcdef".getBytes

  private def md5Hex(prefix: Array[Byte], s: Array[Byte]): UTF8String = {
    val d = md5Local.get()
    d.reset()
    d.update(prefix)
    d.update(s)
    val out = d.digest()
    val hex = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      hex(2 * i) = hexDigits((out(i) >> 4) & 0xf)
      hex(2 * i + 1) = hexDigits(out(i) & 0xf)
      i += 1
    }
    UTF8String.fromBytes(hex)
  }

  /** Called from generated code: one invocation per row, tight loops
    * inside (shingles outer, seeds inner, min tracked in place).
    */
  def md5Signature(arr: ArrayData, prefixes: Array[Array[Byte]]): GenericArrayData = {
    val k = prefixes.length
    val mins = new Array[Any](k)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val sb = arr.getUTF8String(j).getBytes
        var i = 0
        while (i < k) {
          val h = md5Hex(prefixes(i), sb)
          val cur = mins(i).asInstanceOf[UTF8String]
          if (cur == null || h.compareTo(cur) < 0) mins(i) = h
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  /** Poly family: decode each shingle's codepoints once, then fold the
    * integer hash for every seed over the decoded buffer.
    */
  def polySignature(arr: ArrayData, k: Int): GenericArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var seen = false
    val n = arr.numElements()
    var buf = new Array[Int](64)
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        seen = true
        val str = arr.getUTF8String(j).toString
        var len = 0
        var p = 0
        while (p < str.length) {
          val cp = str.codePointAt(p)
          if (len == buf.length) buf = java.util.Arrays.copyOf(buf, len * 2)
          buf(len) = cp
          len += 1
          p += Character.charCount(cp)
        }
        var i = 0
        while (i < k) {
          var h = (i + 1).toLong
          var q = 0
          while (q < len) {
            h = (h * PolyMult + buf(q)) % PolyMod
            q += 1
          }
          if (h < mins(i)) mins(i) = h
          i += 1
        }
      }
      j += 1
    }
    if (!seen) new GenericArrayData(new Array[Any](k)) // all-null, as list_min([]) = NULL
    else new GenericArrayData(mins)
  }
}
