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
}
