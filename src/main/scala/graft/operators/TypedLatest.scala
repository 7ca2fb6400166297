package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` form of latest-per-key (SURVEY §2.11 extension
  * plan: `Aggregator[IN, BUF, OUT]` for custom aggregates on typed
  * `Dataset`s) — same semantics as [[LatestPerKey]]'s `max_by`, with
  * compile-time row types; use with
  * `ds.groupByKey(_.key).agg(TypedLatest.of[T](orderingFn).toColumn)`.
  *
  * The buffer is a single Option[T]: partial aggregation keeps one
  * candidate per map partition, so the shuffle carries one row per
  * (key, partition) — identical scale shape to the untyped path.
  */
object TypedLatest {

  def of[T >: Null <: AnyRef: Encoder](newer: (T, T) => T): Aggregator[T, T, T] =
    new Aggregator[T, T, T] {
      override def zero: T = null
      override def reduce(b: T, a: T): T = if (b == null) a else newer(b, a)
      override def merge(b1: T, b2: T): T =
        if (b1 == null) b2 else if (b2 == null) b1 else newer(b1, b2)
      override def finish(r: T): T = r
      override def bufferEncoder: Encoder[T] = implicitly[Encoder[T]]
      override def outputEncoder: Encoder[T] = implicitly[Encoder[T]]
    }
}
