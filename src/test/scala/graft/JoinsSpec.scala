package graft

import org.apache.spark.sql.functions._

import graft.operators.Joins

/** Adaptive dim join: broadcast regime vs bloom regime, identical
  * results, correct plan shape per regime.
  */
class JoinsSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("small dim broadcasts; large dim goes through the bloom prefilter") {
    import spark.implicits._
    // range-backed frames: a LocalRelation would let the optimizer
    // constant-fold the bloom filter away before the plan is visible
    val fact = spark.range(0, 5000)
      .select((col("id") % 250).as("fk"), col("id").as("v"))
    val dim = spark.range(0, 50)
      .select((col("id") * 5).as("dk"), concat(lit("d"), col("id")).as("name"))

    val small = Joins.dimJoin(fact, dim, "fk", "dk")
    assert(plan(small).contains("BroadcastHashJoin"))
    assert(!plan(small).contains("graft_bloom_might"))

    val large = Joins.dimJoin(fact, dim, "fk", "dk", broadcastRowLimit = 0)
    assert(plan(large).contains("graft_bloom_might"))

    // identical results either way
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("fk", "v", "name").orderBy("fk", "v").collect().toSeq
    assert(rows(small) === rows(large))
    assert(small.count() === fact.filter(col("fk") % 5 === 0).count())
  }

  test("byte cap vetoes the broadcast regime even when the row estimate is small") {
    // a dim whose row estimate passes the row limit but whose plan-stat
    // byte size exceeds the cap must take the bloom/shuffle regime —
    // guards against the width heuristic under-counting rows
    val fact = spark.range(0, 1000)
      .select((col("id") % 50).as("fk"), col("id").as("v"))
    val dim = spark.range(0, 50)
      .select(col("id").as("dk"), concat(lit("d"), col("id")).as("name"))
    assert(Joins.estimatedRows(dim) <= (1L << 20))

    val capped = Joins.dimJoin(fact, dim, "fk", "dk", broadcastByteLimit = 0)
    assert(plan(capped).contains("graft_bloom_might"),
      "oversized-by-bytes dim must not broadcast")
    val uncapped = Joins.dimJoin(fact, dim, "fk", "dk")
    assert(plan(uncapped).contains("BroadcastHashJoin"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("fk", "v", "name").orderBy("fk", "v").collect().toSeq
    assert(rows(capped) === rows(uncapped))
  }

  test("same-named keys join via USING — no ambiguous references") {
    val fact = spark.range(0, 100)
      .select((col("id") % 10).as("k"), col("id").as("v"))
    val dim = spark.range(0, 5).select(col("id").as("k"),
      concat(lit("d"), col("id")).as("name"))
    val a = Joins.dimJoin(fact, dim, "k", "k")
    val b = Joins.dimJoin(fact, dim, "k", "k", broadcastRowLimit = 0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "v", "name").orderBy("k", "v").collect().toSeq
    assert(rows(a) === rows(b))
    assert(a.count() === 50)
  }

  test("regime decision launches zero Spark jobs (stats-based sizing, no count)") {
    val started = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        started.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val fact = spark.range(0, 1000)
        .select((col("id") % 10).as("fk"), col("id").as("v"))
      val dim = spark.range(0, 10)
        .select(col("id").as("dk"), concat(lit("d"), col("id")).as("name"))
      val joined = Joins.dimJoin(fact, dim, "fk", "dk") // broadcast regime
      org.apache.spark.graft.TestBus.drain(spark.sparkContext)
      assert(started.get() === 0,
        "building the dimJoin plan must not run a sizing job")
      assert(joined.count() === 1000)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("integral dim key + non-integral fact key also skips the bloom prefilter") {
    // the bloom would cast the STRING fact key to long (nulls) — false
    // negatives; the guard must check both sides' types
    val fact = spark.range(0, 100)
      .select(concat(lit(""), col("id") % 5).as("fk"), col("id").as("v"))
    val dim = spark.range(0, 5)
      .select(col("id").as("dk"), concat(lit("d"), col("id")).as("name"))
    val out = Joins.dimJoin(fact, dim, "fk", "dk", broadcastRowLimit = 0)
    assert(!plan(out).contains("graft_bloom_might"))
    assert(out.count() === 100)
  }

  test("non-integral keys skip the bloom prefilter instead of corrupting results") {
    val fact = spark.range(0, 100)
      .select(concat(lit("k"), col("id") % 10).as("fk"), col("id").as("v"))
    val dim = spark.range(0, 5)
      .select(concat(lit("k"), col("id")).as("dk"),
        concat(lit("d"), col("id")).as("name"))
    // broadcastRowLimit = 0 forces the large-dim path; string keys must
    // fall back to the plain join, NOT an always-empty bloom filter
    val out = Joins.dimJoin(fact, dim, "fk", "dk", broadcastRowLimit = 0)
    assert(out.count() === 50)
    assert(!plan(out).contains("graft_bloom_might"))
  }
}
