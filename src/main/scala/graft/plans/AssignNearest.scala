package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Nearest-centroid assignment for one vector against the 1-row
  * broadcast centroid model `array<struct<cluster, centroid:
  * array<double>>>` (cluster-sorted via `sort_array(collect_list(...))`)
  * — the k-means/SemDeDup hot path.
  *
  * The composed form expanded every vector into k centroid rows
  * (`crossJoin(broadcast(centroids))`) and ranked them back down with
  * a `row_number` window — a k× row blowup followed by a full
  * vector-grain exchange+sort PER ITERATION, just to compute a
  * quantity that never leaves the row. This computes the argmax in
  * one map-side pass: cosine against each centroid (identical
  * association order to `Vectors.cosine` = `dot(a,b) / (norm(a) *
  * norm(b))`, left-to-right sums), ranked by the window's exact key
  * (`round(sim, 9) DESC, cluster ASC` — the model array is
  * cluster-sorted and ties keep the FIRST strictly-greater hit, and
  * NaN ranks greatest exactly like Spark's descending double order).
  * Returns `struct(cluster, similarity)` with similarity rounded to 6
  * like the composed output; null when the model is empty (the
  * composed join would have dropped the row — callers filter).
  */
case class AssignNearest(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _),
            ArrayType(StructType(Array(_,
              StructField(_, ArrayType(DoubleType, _), _, _))), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        "graft_assign_nearest expects (array<double>, " +
          s"array<struct<cluster, centroid array<double>>>), got ($l, $r)")
    }

  private lazy val clusterField: StructField = right.dataType
    .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType].fields(0)

  override def dataType: DataType = StructType(Seq(
    StructField("cluster", clusterField.dataType, clusterField.nullable),
    StructField("similarity", DoubleType, nullable = true)))

  override def nullable: Boolean = true

  override def nullSafeEval(u: Any, cents: Any): Any =
    AssignNearest.compute(u.asInstanceOf[ArrayData],
      cents.asInstanceOf[ArrayData], clusterField.dataType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ctype = ctx.addReferenceObj("ctype", clusterField.dataType,
      classOf[DataType].getName)
    nullSafeCodeGen(ctx, ev, (u, cents) => s"""
       |${ev.value} = graft.plans.AssignNearest.compute($u, $cents, $ctype);
       |${ev.isNull} = ${ev.value} == null;
       |""".stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): AssignNearest =
    copy(left = newLeft, right = newRight)
}

object AssignNearest {

  private def dot(a: ArrayData, b: ArrayData, n: Int): Double = {
    var sum = 0.0
    var i = 0
    while (i < n) { sum += a.getDouble(i) * b.getDouble(i); i += 1 }
    sum
  }

  /** Spark's round(x, s) double semantics: NaN/Infinity pass through. */
  private def round(x: Double, s: Int): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(s, java.math.RoundingMode.HALF_UP).doubleValue()

  def compute(u: ArrayData, cents: ArrayData, ctype: DataType): InternalRow = {
    val k = cents.numElements()
    if (k == 0) return null
    val dim = u.numElements()
    val normU = Math.sqrt(dot(u, u, dim))
    var bestIdx = -1
    var bestKey = 0.0
    var bestRaw = 0.0
    var j = 0
    while (j < k) {
      val c = cents.getStruct(j, 2).getArray(1)
      if (c.numElements() == dim) { // length mismatch = null sim, never wins
        val sim = dot(u, c, dim) / (normU * Math.sqrt(dot(c, c, dim)))
        val key = round(sim, 9)
        // Double.compare ranks NaN greatest — Spark's DESC double order
        if (bestIdx < 0 || java.lang.Double.compare(key, bestKey) > 0) {
          bestIdx = j; bestKey = key; bestRaw = sim
        }
      }
      j += 1
    }
    if (bestIdx < 0) return null
    new GenericInternalRow(Array[Any](
      cents.getStruct(bestIdx, 2).get(0, ctype), round(bestRaw, 6)))
  }
}
