package graft

import org.apache.spark.sql.functions._

import graft.operators.BloomPrune
import graft.plans.BloomHash

/** Bloom semi-join pruning: no false negatives (the correctness
  * contract), bounded false positives (the efficiency contract),
  * deterministic distributed build, and codegen/interpreted agreement.
  */
class BloomSpec extends SparkSpec {

  test("no false negatives; distributed build is deterministic") {
    import spark.implicits._
    val keys = (0L until 1000L).toDF("k")
    val m = BloomPrune.sizeBits(1000)
    val bits = BloomPrune.build(keys, "k", m)
    assert(bits.length === m / 8)
    // every inserted key passes, both through the engine and on the driver
    assert(keys.filter(BloomPrune.mightContain(col("k"), bits)).count() === 1000)
    assert((0L until 1000L).forall(BloomHash.mightContain(bits, 5, _)))
    // rebuild from a differently-partitioned frame: identical bytes
    val bits2 = BloomPrune.build(keys.repartition(7), "k", m)
    assert(java.util.Arrays.equals(bits, bits2))
  }

  test("false positive rate stays near the design point") {
    import spark.implicits._
    val keys = (0L until 1000L).toDF("k")
    val bits = BloomPrune.build(keys, "k", BloomPrune.sizeBits(1000))
    val probes = (1000000L until 1020000L)
    val fp = probes.count(BloomHash.mightContain(bits, 5, _))
    // 16 bits/key, k=5 -> fpp well under 1%
    assert(fp.toDouble / probes.size < 0.01, s"$fp false positives")
  }

  test("engine evaluation agrees with the driver-side reference") {
    import spark.implicits._
    val keys = (0L until 500L).toDF("k")
    val bits = BloomPrune.build(keys, "k", 8192)
    val probes = (0L until 5000L).toDF("k")
    val engine = probes.filter(BloomPrune.mightContain(col("k"), bits))
      .as[Long].collect().toSet
    val driver = (0L until 5000L).filter(BloomHash.mightContain(bits, 5, _)).toSet
    assert(engine === driver)
  }

  test("bloom-prefiltered join returns exactly the plain join") {
    import spark.implicits._
    val fact = (0L until 10000L).map(i => (i % 400, i)).toDF("k", "v")
    val dim = (0L until 100L).map(i => i * 4).toDF("k") // every 4th key
    val bits = BloomPrune.build(dim, "k", BloomPrune.sizeBits(100))
    val pre = fact.filter(BloomPrune.mightContain(col("k"), bits))
    // the prefilter dropped most non-matching rows already
    assert(pre.count() < fact.count() / 2)
    val a = pre.join(dim, "k").agg(count(lit(1)), sum("v")).head()
    val b = fact.join(dim, "k").agg(count(lit(1)), sum("v")).head()
    assert(a === b)
  }
}
