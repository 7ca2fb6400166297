package graft

import org.apache.spark.sql.functions._

import graft.functions.Text

/** Native codegen'd text expressions vs their builtin-HOF
  * formulations: byte-identical on the corpus.
  */
class TextFeaturesSpec extends SparkSpec {
  import spark.implicits._

  private val stop = Seq("the", "a", "or", "and", "of", "to", "in")

  test("graft_collapse equals the HOF collapse on the corpus") {
    val docs = Tables.documents(spark, sf)
    val toks = Text.tokens(col("text"))
    val d = docs.select(
        Text.collapseRepeats(toks).as("nat"),
        Text.collapseRepeatsHof(toks).as("hof"))
      .filter(not(col("nat") <=> col("hof"))).count()
    assert(d == 0)
  }

  test("graft_collapse handles empties, singletons and null runs") {
    val df = Seq(
      (Seq("a", "a"), Seq("a")),
      (Seq("a"), Seq("a")),
      (Seq[String](), Seq[String]()),
      (Seq("a", null, null, "a", "a"), Seq("a", null, "a")))
      .toDF("in", "want")
    val bad = df.select(Text.collapseRepeats(col("in")).as("got"), col("want"))
      .filter(not(col("got") <=> col("want"))).count()
    assert(bad == 0)
  }

  test("graft_textstats equals the HOF counts on the corpus") {
    val docs = Tables.documents(spark, sf)
    val toks = Text.tokens(col("text"))
    val st = Text.tokenStats(toks, stop)
    val d = docs.select(
        st.getField("n_tokens").as("a1"),
        st.getField("n_distinct").as("a2"),
        st.getField("n_stop").as("a3"),
        st.getField("n_repeat").as("a4"),
        size(toks).cast("long").as("b1"),
        size(array_distinct(toks)).cast("long").as("b2"),
        Text.countIn(toks, stop).cast("long").as("b3"),
        (size(toks) - size(Text.collapseRepeatsHof(toks))).cast("long").as("b4"))
      .filter(col("a1") =!= col("b1") || col("a2") =!= col("b2") ||
        col("a3") =!= col("b3") || col("a4") =!= col("b4")).count()
    assert(d == 0)
  }

  test("native text expressions stay inside whole-stage codegen") {
    val p = graft.queries.TextQueries.textQuality(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("ArrayFilter"), p.take(400))
  }
}
