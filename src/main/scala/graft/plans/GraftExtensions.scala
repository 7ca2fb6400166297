package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension points. Registers the native functions so they are
  * callable from SQL and via `call_function`:
  *
  *  - `graft_dot(a, b)` — codegen'd [[DotProduct]]
  *
  * Two registration paths: [[GraftExtensions]] for
  * `spark.sql.extensions=graft.plans.GraftExtensions` at session build
  * (the production cluster path), and [[registerOn]] for an existing
  * session (tests / driver-owned sessions).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.dotFunction)
  }
}

object GraftExtensions {

  private val dotFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    (children: Seq[Expression]) => DotProduct(children(0), children(1)))

  /** Idempotent registration on an already-built session. */
  def registerOn(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    if (!spark.experimental.extraOptimizations.contains(LatestWindowToMaxBy))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ LatestWindowToMaxBy
  }
}
