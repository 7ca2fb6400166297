package graft

import org.apache.spark.sql.functions._

/** Custom Generator tier: graft_shingle_explode must emit exactly the
  * rows explode(graft_shingles(...)) emits, run inside GenerateExec
  * (whole-stage codegen path), and handle edge inputs like the
  * expression does.
  */
class ShingleExplodeSpec extends SparkSpec {

  test("generator == explode of the shingle expression") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "x y"),          // shorter than n: whole-text fallback
      (3L, "one two three"),
      (4L, "")).toDF("id", "text")
    val gen = docs.select(col("id"),
        call_function("graft_shingle_explode", split(col("text"), " "), lit(3))
          .as("shingle"))
      .orderBy("id", "shingle").collect().map(r => (r.getLong(0), r.getString(1)))
    val ref = docs.select(col("id"),
        explode(call_function("graft_shingles", split(col("text"), " "), lit(3)))
          .as("shingle"))
      .orderBy("id", "shingle").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(gen.toSeq === ref.toSeq)
    // sanity: 5 tokens -> 3 shingles; 2 tokens -> 1 fallback
    assert(gen.count(_._1 == 1L) === 3)
    assert(gen.count(_._1 == 2L) === 1)
  }

  test("the generator plans as a Generate over the scan") {
    val docs = Tables.documents(spark, sf)
    val p = docs.select(call_function("graft_shingle_explode",
        split(col("text"), " "), lit(3)).as("s"))
      .queryExecution.executedPlan.toString
    assert(p.contains("Generate"), p.take(400))
    assert(p.contains("graft_shingle_explode"), p.take(400))
  }
}
