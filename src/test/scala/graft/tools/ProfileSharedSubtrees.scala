package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Paired A/B for the r21 shared-subtree materializations beyond
  * text_collocations (ProfileCollocReuse): the PRE-change forms of
  * `retention_cohorts` (cells subtree embedded under both consumers)
  * and `lm_kn_counts` (token-grained countDistinct + a second
  * tokenize pass for the normalizer) reconstructed inline, alternated
  * against the production forms, result equality cross-checked first.
  */
object ProfileSharedSubtrees {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("GRAFT_AB_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("GRAFT_AB_RUNS", "5").toInt
    val spark = Harness.session()

    def oldRetention(): DataFrame = {
      val ev = graft.Tables.events(spark, sf)
        .select(col("user_id"), to_date(col("ts")).as("d"))
      val first = ev.groupBy(col("user_id")).agg(min(col("d")).as("first_d"))
      val cells = ev.join(first, "user_id")
        .select(
          date_format(date_trunc("week", col("first_d")), "yyyy-MM-dd")
            .as("cohort_week"),
          expr("CAST(datediff(d, first_d) div 7 AS BIGINT)").as("week_offset"),
          col("user_id"))
        .distinct()
        .groupBy(col("cohort_week"), col("week_offset"))
        .agg(count(lit(1)).as("n_active"))
      val sizes = cells.filter(col("week_offset") === 0)
        .select(col("cohort_week"), col("n_active").as("cohort_size"))
      cells.join(broadcast(sizes), "cohort_week")
        .select(col("cohort_week"), col("week_offset"), col("n_active"),
          col("cohort_size"),
          (col("n_active").cast("double") / col("cohort_size")).as("retention"))
        .orderBy("cohort_week", "week_offset")
    }

    def oldKn(): DataFrame = {
      val t = col("_t")
      val toks = graft.Tables.documents(spark, sf)
        .select(graft.functions.Text.tokens(col("text")).as("_t"))
      val bg = toks.filter(size(t) >= 2)
        .select(explode(arrays_zip(
          slice(t, lit(1), size(t) - 1).as("w1"),
          slice(t, lit(2), size(t) - 1).as("w2"))).as("_bg"))
        .select(col("_bg.w1").as("w1"), col("_bg.w2").as("w2"))
      val cont = bg.groupBy(col("w2").as("word"))
        .agg(countDistinct(col("w1")).as("cont_count"))
      val uni = toks.select(explode(t).as("word"))
        .groupBy("word").agg(count(lit(1)).as("uni_count"))
      val totalBigrams = bg.select(col("w1"), col("w2")).distinct()
        .agg(count(lit(1)).as("_nb"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("cont_count").desc, col("word"))
      cont.join(uni, "word")
        .crossJoin(broadcast(totalBigrams))
        .orderBy(col("cont_count").desc, col("word")).limit(30)
        .select(col("word"), col("cont_count"), col("uni_count"),
          round(col("cont_count").cast("double") / col("_nb"), 6)
            .as("kn_prob"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .orderBy("rank")
    }

    def newRetention(): DataFrame =
      graft.SparkEntry.queries("retention_cohorts")(spark, sf)
    def newKn(): DataFrame =
      graft.SparkEntry.queries("lm_kn_counts")(spark, sf)

    require(oldRetention().collect().toSeq == newRetention().collect().toSeq,
      "retention forms diverge")
    require(oldKn().collect().toSeq == newKn().collect().toSeq,
      "kn forms diverge")

    def noop(f: => DataFrame): Double =
      Harness.time(f.write.format("noop").mode("overwrite").save())
    def med(a: Seq[Double]) = a.sorted.apply((a.length - 1) / 2)
    val c0 = graft.Bench.canary(spark, 32)
    val ro = new scala.collection.mutable.ArrayBuffer[Double]
    val rn = new scala.collection.mutable.ArrayBuffer[Double]
    val ko = new scala.collection.mutable.ArrayBuffer[Double]
    val kn = new scala.collection.mutable.ArrayBuffer[Double]
    (1 to runs).foreach { _ =>
      ro += noop(oldRetention()); rn += noop(newRetention())
      ko += noop(oldKn()); kn += noop(newKn())
    }
    val c1 = graft.Bench.canary(spark, 32)
    println(f"""{"canary":[$c0%.3f,$c1%.3f],"retention_old_med":${med(ro.toSeq)}%.2f,"retention_new_med":${med(rn.toSeq)}%.2f,"kn_old_med":${med(ko.toSeq)}%.2f,"kn_new_med":${med(kn.toSeq)}%.2f,"retention_old":[${ro.map(x => f"$x%.2f").mkString(",")}],"retention_new":[${rn.map(x => f"$x%.2f").mkString(",")}],"kn_old":[${ko.map(x => f"$x%.2f").mkString(",")}],"kn_new":[${kn.map(x => f"$x%.2f").mkString(",")}]}""")
    spark.stop()
  }
}
