package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Brute-force cosine pair kernel for salted block decomposition:
  * `graft_cosine_pairs(a, b, same, minCosine)` with
  * `a`/`b: array<struct<id: long, v: array<double>>>` (unit vectors)
  * emits `array<struct<id_a, id_b, cosine>>` — all pairs whose dot
  * (= cosine on unit vectors, rounded to 4 decimals exactly like
  * Spark's `round`) meets the threshold. `same = true` pairs within
  * `a` only (each unordered pair once); otherwise the full `a × b`
  * cross. Pair ids are emitted (least, greatest), matching the
  * `id_a < id_b` join contract of the composed form.
  *
  * The point is the inner loop: vectors are unpacked ONCE per group
  * into primitive double arrays, so the n²/2 dot products run as
  * tight scalar math instead of per-pair join-row machinery — the
  * composed blocked self-join measured ~2 µs/pair at 30× (the join
  * row construction + array deref per pair), ~40× the arithmetic
  * cost. Group sizes are bounded by the SALT decomposition upstream
  * ([[graft.ext.Dedup.embeddingNearDups]]), which also restores
  * parallelism the |blocks|-key join capped.
  */
case class CosinePairs(first: Expression, second: Expression,
    third: Expression, minCosine: Double)
  extends TernaryExpression {

  private def okList(t: DataType): Boolean = t match {
    case ArrayType(StructType(Array(StructField(_, LongType, _, _),
      StructField(_, ArrayType(DoubleType, _), _, _))), _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okList(first.dataType) && okList(second.dataType) &&
        third.dataType == BooleanType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_cosine_pairs expects (array<struct<id, v>>, " +
        "array<struct<id, v>>, boolean, double-literal), got " +
        s"(${first.dataType}, ${second.dataType}, ${third.dataType})")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("id_b", LongType, nullable = false),
    StructField("cosine", DoubleType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable

  override protected def nullSafeEval(a: Any, b: Any, s: Any): Any =
    CosinePairs.compute(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], s.asInstanceOf[Boolean], minCosine)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, s) =>
      s"${ev.value} = graft.plans.CosinePairs.compute($a, $b, $s, " +
        s"${minCosine});")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): CosinePairs =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object CosinePairs {

  private def unpack(arr: ArrayData): (Array[Long], Array[Array[Double]]) = {
    val n = arr.numElements()
    val ids = new Array[Long](n)
    val vs = new Array[Array[Double]](n)
    var i = 0
    while (i < n) {
      val e = arr.getStruct(i, 2)
      ids(i) = e.getLong(0)
      vs(i) = e.getArray(1).toDoubleArray()
      i += 1
    }
    (ids, vs)
  }

  private def round4(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  def compute(aArr: ArrayData, bArr: ArrayData, same: Boolean,
      minCos: Double): GenericArrayData = {
    val (aIds, aVs) = unpack(aArr)
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    def emit(ida: Long, idb: Long, va: Array[Double],
        vb: Array[Double]): Unit = {
      var d = 0.0
      var k = 0
      val dim = va.length
      while (k < dim) { d += va(k) * vb(k); k += 1 }
      // a non-finite dot (a NaN/Inf component survived normalization)
      // is never a near-duplicate: BigDecimal.valueOf throws on it,
      // and one poisoned embedding must not kill the whole query —
      // treat it as below threshold, like the joined twin whose
      // round() yields NaN that the threshold filter drops
      if (java.lang.Double.isFinite(d)) {
        val c = round4(d)
        if (c >= minCos) {
          out += new GenericInternalRow(Array[Any](
            Math.min(ida, idb), Math.max(ida, idb), c))
        }
      }
    }
    if (same) {
      var i = 0
      while (i < aIds.length) {
        var j = i + 1
        while (j < aIds.length) {
          emit(aIds(i), aIds(j), aVs(i), aVs(j))
          j += 1
        }
        i += 1
      }
    } else {
      val (bIds, bVs) = unpack(bArr)
      var i = 0
      while (i < aIds.length) {
        var j = 0
        while (j < bIds.length) {
          emit(aIds(i), bIds(j), aVs(i), bVs(j))
          j += 1
        }
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }
}
