package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.MaxBy
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite the "keep the first row per key" window
  * idiom —
  *
  * {{{
  *   Project [cols...]
  *   +- Filter (rn = 1)
  *      +- Window [row_number() OVER (PARTITION BY k ORDER BY o DESC...) AS rn]
  * }}}
  *
  * — into a `max_by(struct(cols), struct(o...))` aggregation. The
  * window form shuffles and sorts EVERY row; the aggregate form
  * partially aggregates map-side, so one row per (key, partition)
  * crosses the wire — the difference between a terabyte shuffle and a
  * megabyte one on the reference's dedup-to-latest layer
  * (`/root/reference/dbt/models/int/int_metar_latest.sql:9-38`, the
  * pattern users naturally write in SQL).
  *
  * Guards: single row_number window expression, filter `= 1` on it,
  * all order directions descending (first-in-order == max), outer
  * project referencing only pass-through attributes. Ties are
  * arbitrary in both forms, so the rewrite does not change the
  * determinism contract. Output attribute ids are preserved so parent
  * operators resolve unchanged.
  *
  * Activate per session via
  * `spark.experimental.extraOptimizations ++= Seq(LatestWindowToMaxBy)`
  * (done by [[GraftExtensions.registerOn]]).
  */
object LatestWindowToMaxBy extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case Project(projectList,
        Filter(EqualTo(rnRef: AttributeReference, Literal(1, IntegerType)),
          Window(Seq(rnAlias @ Alias(
            WindowExpression(RowNumber(), WindowSpecDefinition(part, order, _)), _)),
          _, _, child, _)))
        if rnRef.exprId == rnAlias.exprId &&
          order.nonEmpty && order.forall(_.direction == Descending) &&
          part.nonEmpty && part.forall(_.isInstanceOf[AttributeReference]) &&
          projectList.forall(_.isInstanceOf[AttributeReference]) &&
          projectList.forall(a => child.outputSet.contains(a.asInstanceOf[AttributeReference])) =>

      // Spark's InsertWindowGroupLimit may already have added a partial
      // top-1 node below the window; the aggregate subsumes it (and it
      // would pay a per-partition sort), so strip it.
      val realChild = child match {
        case WindowGroupLimit(_, _, RowNumber(), 1, c) => c
        case other => other
      }
      val payload = CreateNamedStruct(
        realChild.output.flatMap(a => Seq(Literal(a.name), a)))
      val ordering = CreateNamedStruct(
        order.zipWithIndex.flatMap { case (so, i) => Seq(Literal(s"_o$i"), so.child) })
      val latest = Alias(
        MaxBy(payload, ordering).toAggregateExpression(), "_latest")()
      val agg = Aggregate(part,
        Seq(latest) ++ part.map(_.asInstanceOf[NamedExpression]), realChild)

      val latestRef = latest.toAttribute
      val fieldIndex = realChild.output.map(_.exprId).zipWithIndex.toMap
      val rebuilt = projectList.map { ne =>
        val a = ne.asInstanceOf[AttributeReference]
        Alias(
          GetStructField(latestRef, fieldIndex(a.exprId), Some(a.name)),
          a.name)(exprId = a.exprId, qualifier = a.qualifier)
      }
      Project(rebuilt, agg)
  }
}
