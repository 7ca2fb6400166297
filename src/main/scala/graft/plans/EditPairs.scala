package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Brute-force thresholded-edit-distance pair kernel for salted block
  * decomposition: `graft_edit_pairs(a, b, same, maxDist)` with
  * `a`/`b: array<struct<id: long, p: string>>` emits
  * `array<struct<id_a, id_b, edit_dist>>` — all pairs whose banded
  * Levenshtein distance is at most `maxDist`. `same = true` pairs
  * within `a` only (each unordered pair once); otherwise the full
  * `a × b` cross. Pair ids are emitted (least, greatest), and pairs
  * whose two ids are EQUAL are skipped — matching the joined form's
  * strict `id_a < id_b` filter even when duplicate ids appear in one
  * block (reachable only via the public `fuzzyPairsBlocked` API on
  * dirty data; all engine callers feed unique ids).
  *
  * Same family as [[CosinePairs]] (the r16 embedding rewrite, salted
  * upstream by [[graft.ext.Dedup.fuzzyPairsBlocked]]): strings are
  * unpacked ONCE per group, and the n²/2 distance calls run in a
  * tight loop instead of per-pair join-row machinery, which the r16
  * profiling measured at ~2 µs/pair — several times the banded DP's
  * own cost on 40-char prefixes. The distance itself is Spark's OWN
  * `UTF8String.levenshteinDistance(other, threshold)` (the exact
  * function the `levenshtein(l, r, k)` expression evaluates), so the
  * kernel is bit-parity with the joined twin by construction,
  * including the code-point semantics and the −1 above-threshold
  * early exit.
  */
case class EditPairs(first: Expression, second: Expression,
    third: Expression, maxDist: Int)
  extends TernaryExpression {

  private def okList(t: DataType): Boolean = t match {
    case ArrayType(StructType(Array(StructField(_, LongType, _, _),
      StructField(_, StringType, _, _))), _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okList(first.dataType) && okList(second.dataType) &&
        third.dataType == BooleanType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_edit_pairs expects (array<struct<id, p>>, " +
        "array<struct<id, p>>, boolean, int-literal), got " +
        s"(${first.dataType}, ${second.dataType}, ${third.dataType})")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("id_b", LongType, nullable = false),
    StructField("edit_dist", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable

  override protected def nullSafeEval(a: Any, b: Any, s: Any): Any =
    EditPairs.compute(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], s.asInstanceOf[Boolean], maxDist)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, s) =>
      s"${ev.value} = graft.plans.EditPairs.compute($a, $b, $s, " +
        s"${maxDist});")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): EditPairs =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "graft_edit_pairs"
}

object EditPairs {

  private def unpack(arr: ArrayData): (Array[Long], Array[UTF8String]) = {
    val n = arr.numElements()
    val ids = new Array[Long](n)
    val ps = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      val e = arr.getStruct(i, 2)
      ids(i) = e.getLong(0)
      // clone: getUTF8String may point into a buffer the row iterator
      // reuses, and the kernel holds every group string for the whole
      // n² loop (CosinePairs' toDoubleArray copies for the same reason)
      ps(i) = e.getUTF8String(1).clone()
      i += 1
    }
    (ids, ps)
  }

  def compute(aArr: ArrayData, bArr: ArrayData, same: Boolean,
      maxDist: Int): GenericArrayData = {
    val (aIds, aPs) = unpack(aArr)
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    def emit(ida: Long, idb: Long, pa: UTF8String, pb: UTF8String): Unit = {
      // the joined twin filters id_a < id_b strictly: equal ids
      // (duplicate ids in one block) must not self-pair
      if (ida == idb) return
      val d = pa.levenshteinDistance(pb, maxDist)
      if (d >= 0) {
        out += new GenericInternalRow(Array[Any](
          Math.min(ida, idb), Math.max(ida, idb), d.toLong))
      }
    }
    if (same) {
      var i = 0
      while (i < aIds.length) {
        var j = i + 1
        while (j < aIds.length) {
          emit(aIds(i), aIds(j), aPs(i), aPs(j))
          j += 1
        }
        i += 1
      }
    } else {
      val (bIds, bPs) = unpack(bArr)
      var i = 0
      while (i < aIds.length) {
        var j = 0
        while (j < bIds.length) {
          emit(aIds(i), bIds(j), aPs(i), bPs(j))
          j += 1
        }
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }
}
