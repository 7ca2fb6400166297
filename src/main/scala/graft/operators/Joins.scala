package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  * shape per regime and the cross-regime equality. The one dim pass
  * for `count()` is the price of the decision; at 100 TB feed it from
  * table statistics instead.
  */
object Joins {

  def dimJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, broadcastRowLimit: Long = 1L << 20): DataFrame = {
    val n = dim.count()
    val small = n <= broadcastRowLimit
    val integralKey = dim.schema(dimKey).dataType match {
      case org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.ByteType => true
      case _ => false
    }
    // bloom hashes bigint keys only — casting a non-integral key would
    // null out and turn into false NEGATIVES, so such dims skip the
    // prefilter and take the plain shuffle join
    val probe =
      if (small || !integralKey) fact
      else fact.filter(BloomPrune.mightContain(fact(factKey),
        BloomPrune.build(dim, dimKey, BloomPrune.sizeBits(n))))
    val d = if (small) broadcast(dim) else dim
    // same-named keys would be ambiguous after the join: USING form
    // (which also dedups the key column)
    if (factKey == dimKey) probe.join(d, Seq(factKey))
    else probe.join(d, probe(factKey) === d(dimKey))
  }
}
