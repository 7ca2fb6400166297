package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Strategy-adaptive dimension join — the sizing decision a user
  * shouldn't hand-tune per query:
  *
  *  - dim fits the broadcast budget → `broadcast()` hash join, fact
  *    side never shuffles;
  *  - dim too large to broadcast as rows → bloom-prefiltered shuffle
  *    join ([[BloomPrune]]): the dim's keys broadcast as a bitset
  *    (~16 bits/key), the fact side shrinks to the dim's selectivity
  *    BEFORE the exchange, and the exact join finishes.
  *
  * Both paths return identical results (the bloom path admits false
  * positives only, removed by the join) — `JoinsSpec` pins the plan
  * shape per regime and the cross-regime equality.
  *
  * Sizing comes from Catalyst plan statistics (CBO row counts when
  * available, else file-size ÷ schema row width), so the regime
  * decision costs ZERO Spark jobs — no `count()` action per call. The
  * estimate errs conservatively: an underestimated row count only
  * shrinks the bloom (higher fpp, still correct); an overestimate only
  * skips a broadcast that barely fit. Broadcast-side bound: `dim` up
  * to `broadcastRowLimit` estimated rows is materialized on every
  * executor — callers joining genuinely large dims rely on the bloom
  * regime, never row broadcast.
  */
object Joins {

  private def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Estimated row count from the optimized plan's statistics — CBO
    * rowCount when present, else sizeInBytes over the schema's default
    * row width. Never launches a job.
    */
  private[operators] def estimatedRows(df: DataFrame): Long = {
    val stats = df.queryExecution.optimizedPlan.stats
    stats.rowCount.map(_.min(BigInt(Long.MaxValue)).toLong).getOrElse {
      val width = df.schema.fields.map(_.dataType.defaultSize.toLong).sum.max(1L)
      (stats.sizeInBytes / width).min(BigInt(Long.MaxValue)).toLong.max(1L)
    }
  }

  def dimJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, broadcastRowLimit: Long = 1L << 20): DataFrame = {
    val n = estimatedRows(dim)
    val small = n <= broadcastRowLimit
    // bloom hashes bigint keys only — casting a non-integral key (on
    // EITHER side: a string/double fact key long-casts lossily too)
    // would null or truncate and turn into false NEGATIVES, so such
    // pairs skip the prefilter and take the plain shuffle join
    val bloomable = integral(dim.schema(dimKey).dataType) &&
      integral(fact.schema(factKey).dataType)
    val probe =
      if (small || !bloomable) fact
      else fact.filter(BloomPrune.mightContain(fact(factKey),
        BloomPrune.build(dim, dimKey, BloomPrune.sizeBits(n))))
    val d = if (small) broadcast(dim) else dim
    // same-named keys would be ambiguous after the join: USING form
    // (which also dedups the key column)
    if (factKey == dimKey) probe.join(d, Seq(factKey))
    else probe.join(d, probe(factKey) === d(dimKey))
  }
}
