package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{MaxBy, MinBy}
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
  * The ascending form rewrites to `min_by` symmetrically.
  *
  * Guards: single row_number window expression, filter `= 1` on it,
  * all order directions equal — descending → max_by, ascending →
  * min_by — with the DEFAULT null ordering for that direction (DESC
  * NULLS LAST / ASC NULLS FIRST). Both defaults coincide with how
  * struct comparison orders null fields (null smallest), so the
  * kept row matches the window form even when order columns are null;
  * a non-default null ordering (e.g. DESC NULLS FIRST) would keep a
  * null-ordered row in the window form but the max non-null row in the
  * aggregate form, so it is NOT rewritten. Order expressions must be
  * deterministic (a non-deterministic order makes the window row a
  * different sample than the aggregate's — neither "wrong", but the
  * rewrite must not change which). The outer project may reference
  * only pass-through attributes. Ties are arbitrary in both forms, so
  * the rewrite does not change the determinism contract. Output
  * attribute ids are preserved so parent operators resolve unchanged.
  *
  * Activate per session via
  * `spark.experimental.extraOptimizations ++= Seq(LatestWindowToMaxBy)`
  * (done by [[GraftExtensions.registerOn]]).
  */
object LatestWindowToMaxBy extends Rule[LogicalPlan] {

  private def defaultNulls(so: SortOrder): Boolean = so.direction match {
    case Descending => so.nullOrdering == NullsLast
    case Ascending  => so.nullOrdering == NullsFirst
  }

  /** An order expression is only safe to move into min_by/max_by if it
    * is deterministic — including when the analyzer has pre-projected
    * it below the window (`_w0 = rand(...)` makes the SortOrder child a
    * plain, "deterministic" attribute), so attributes are resolved one
    * projection deep before deciding.
    */
  private def orderDeterministic(e: Expression, child: LogicalPlan): Boolean = {
    lazy val aliased: Map[ExprId, Expression] = child match {
      case Project(pl, _) =>
        pl.collect { case a: Alias => a.exprId -> a.child }.toMap
      case WindowGroupLimit(_, _, _, _, Project(pl, _)) =>
        pl.collect { case a: Alias => a.exprId -> a.child }.toMap
      case _ => Map.empty
    }
    e.deterministic && e.references.forall(ar => aliased.get(ar.exprId).forall(_.deterministic))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case Project(projectList,
        Filter(EqualTo(rnRef: AttributeReference, Literal(1, IntegerType)),
          Window(Seq(rnAlias @ Alias(
            WindowExpression(RowNumber(), WindowSpecDefinition(part, order, _)), _)),
          _, _, child, _)))
        if rnRef.exprId == rnAlias.exprId &&
          order.nonEmpty &&
          (order.forall(_.direction == Descending) ||
            order.forall(_.direction == Ascending)) &&
          order.forall(defaultNulls) &&
          order.forall(so => orderDeterministic(so.child, child)) &&
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
      val aggFn =
        if (order.head.direction == Descending) MaxBy(payload, ordering)
        else MinBy(payload, ordering)
      val latest = Alias(aggFn.toAggregateExpression(), "_latest")()
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
