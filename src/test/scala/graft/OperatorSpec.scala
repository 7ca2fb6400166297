package graft

import org.apache.spark.sql.functions._

import graft.operators.LatestPerKey
import graft.quality.Checks

/** Operator-level contracts: max_by and window latest-per-key agree,
  * quality checks count violations correctly.
  */
class OperatorSpec extends SparkSpec {

  test("LatestPerKey max_by path == window path on real data") {
    val ev = Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type", "value")
    val a = LatestPerKey(ev, Seq("user_id"), Seq("ts", "event_id"))
    val b = LatestPerKey.viaWindow(ev, Seq("user_id"), Seq("ts", "event_id"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("quality checks count violations") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), "en"), (Some(1L), "xx"), (None, "de")
    ).toDF("id", "lang")
    def v(r: org.apache.spark.sql.DataFrame): Long = r.head().getLong(1)
    assert(v(Checks.notNull(df, "id", "c")) === 1L)
    assert(v(Checks.unique(df, "id", "c")) === 1L) // two non-null rows, one key
    assert(v(Checks.acceptedValues(df, "lang", Seq("en", "de"), "c")) === 1L)
    assert(v(Checks.expression(df, col("lang") === "xx", "c")) === 1L)
    val parent = Seq(1L).toDF("pid")
    assert(v(Checks.relationships(
      df.filter(col("id").isNotNull), "id", parent, "pid", "c")) === 0L)
    intercept[AssertionError] {
      Checks.enforce(Seq(Checks.notNull(df, "id", "c")))
    }
  }

  test("simhash of identical docs has hamming distance 0, disjoint docs differ") {
    import spark.implicits._
    import graft.functions.{SimHash, Text}
    val df = Seq(
      ("a", "the quick brown fox jumps over the lazy dog"),
      ("b", "the quick brown fox jumps over the lazy dog"),
      ("c", "entirely different words compose this unrelated sentence here")
    ).toDF("id", "text")
      .withColumn("sh", SimHash.simhash32(Text.tokens(col("text"))))
    val m = df.collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(m("a") === m("b"))
    assert(m("a") !== m("c"))
    val d = df.as("x").crossJoin(df.as("y"))
      .filter(col("x.id") === "a" && col("y.id") === "c")
      .select(SimHash.hammingDistance(col("x.sh"), col("y.sh"))).head().getInt(0)
    assert(d > 0 && d <= 32)
  }

  test("winnow and shingles handle short documents") {
    import spark.implicits._
    import graft.functions.Text
    val df = Seq(("a", "one two"), ("b", "one two three four five")).toDF("id", "text")
      .withColumn("sh", Text.shingles(Text.tokens(col("text")), 3))
      .withColumn("win", Text.winnow(transform(col("sh"), s => md5(s)), 4))
    val rows = df.orderBy("id").collect()
    assert(rows(0).getSeq[String](2) === Seq("one two")) // whole-text shingle
    assert(rows(0).getSeq[String](3).length === 1)
    assert(rows(1).getSeq[String](2).length === 3) // 5 tokens -> 3 shingles
  }
}
