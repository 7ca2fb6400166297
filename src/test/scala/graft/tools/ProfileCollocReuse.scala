package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Does `text_collocations` re-run the bigram build 4× (c12 feeds the
  * scored stream, both marginal tables, and the total), or does AQE
  * stage reuse collapse the identical shuffle subtrees at runtime?
  * The static plan shows 4 independent scan→tokenize→explode→count
  * subtrees and no ReusedExchange; this A/Bs the production query
  * against a variant whose c12 is materialized once
  * (localCheckpoint), with result equality cross-checked first. If
  * the checkpoint wins, AQE reuse is NOT collapsing the subtrees and
  * the production shape should materialize; a wash means runtime
  * reuse already does it and the static plan is misleading.
  */
object ProfileCollocReuse {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("GRAFT_AB_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("GRAFT_AB_RUNS", "5").toInt
    val spark = Harness.session()
    import graft.queries.TextQueries

    def prod(): DataFrame =
      graft.SparkEntry.queries("text_collocations")(spark, sf)

    def ckpt(): DataFrame = {
      val t = col("_t")
      val bg = graft.Tables.documents(spark, sf)
        .select(graft.functions.Text.tokens(col("text")).as("_t"))
        .filter(size(t) >= 2)
        .select(explode(arrays_zip(
          slice(t, lit(1), size(t) - 1).as("w1"),
          slice(t, lit(2), size(t) - 1).as("w2"))).as("_bg"))
        .select(col("_bg.w1"), col("_bg.w2"))
      val c12 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
        .localCheckpoint()
      val cL = c12.groupBy("w1").agg(sum("c12").as("c1"))
      val cR = c12.groupBy("w2").agg(sum("c12").as("c2"))
      val n = c12.agg(sum("c12").as("n"))
      val scored = c12
        .join(broadcast(cL), "w1").join(broadcast(cR), "w2")
        .crossJoin(broadcast(n))
        .filter(col("c12") >= 5)
        .withColumn("_pmi", log((col("c12") * col("n")).cast("double") /
          (col("c1") * col("c2")).cast("double")))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(round(col("_pmi"), 9).desc, col("w1"), col("w2"))
      scored.orderBy(round(col("_pmi"), 9).desc, col("w1"), col("w2"))
        .limit(50)
        .withColumn("rank", row_number().over(w).cast("long"))
        .select(col("rank"), col("w1"), col("w2"), col("c12"),
          round(col("_pmi"), 6).as("pmi"))
        .orderBy("rank")
    }

    require(prod().collect().toSeq == ckpt().collect().toSeq,
      "checkpoint variant diverges")
    def noop(f: => DataFrame): Double =
      Harness.time(f.write.format("noop").mode("overwrite").save())
    def med(a: Seq[Double]) = a.sorted.apply((a.length - 1) / 2)
    val c0 = graft.Bench.canary(spark, 32)
    val p = new scala.collection.mutable.ArrayBuffer[Double]
    val k = new scala.collection.mutable.ArrayBuffer[Double]
    (1 to runs).foreach { _ => p += noop(prod()); k += noop(ckpt()) }
    val c1 = graft.Bench.canary(spark, 32)
    println(f"""{"canary":[$c0%.3f,$c1%.3f],"prod_med":${med(p.toSeq)}%.2f,"ckpt_med":${med(k.toSeq)}%.2f,"prod":[${p.map(x => f"$x%.2f").mkString(",")}],"ckpt":[${k.map(x => f"$x%.2f").mkString(",")}]}""")
    spark.stop()
  }
}
