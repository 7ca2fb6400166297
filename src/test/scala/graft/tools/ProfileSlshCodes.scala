package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** A/B for the multi-table sign-LSH bucket-code build (VERDICT r20
  * #6, the PPJoin hash-key discipline applied to SignLsh): the former
  * signature stage built per-(id, table) bit-STRINGS
  * (collect_list(struct(int, string)) + sort_array + concat_ws), then
  * parsed them back to ints with conv(·, 2, 10) — three non-codegen
  * aggregation steps and string payloads through the (id, t) exchange.
  * The reworked build sums the plane's bit weight (2^(bits-1-p))
  * directly: one codegen'd LongType sum, 8-byte values on the
  * exchange, bijectively the same codes.
  *
  * Times (alternating reps, canary at both ends):
  *  - codes stage alone, old (string) vs new (sum) form;
  *  - the full declared query (`dedup_embedding_lsh_multi` shape)
  *    through each codes form.
  * Cross-checks exact equality of the codes frames before timing.
  */
object ProfileSlshCodes {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("GRAFT_AB_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("GRAFT_AB_RUNS", "5").toInt
    val spark = Harness.session()
    val bits = 6; val tables = 12; val d = 64
    val emb = graft.Tables.embeddings(spark, dir)

    val e = Vectors.unitized(emb, "embedding", "vec_id" -> "vec_id")
      .withColumnRenamed("_uv", "_u")
    val planes = {
      import spark.implicits._
      (for {
        t <- 0 until tables
        (p, i) <- graft.ext.SignLsh.hyperplanes(bits, d, 42L + t).zipWithIndex
      } yield (t, i, 1L << (bits - 1 - i), p)).toDF("_t", "_p", "_w", "_plane")
    }
    def planeRows = e.select(col("vec_id"), col("_u"))
      .crossJoin(broadcast(planes))

    // old: bit-strings, then conv() back to ints
    def codesOld(): DataFrame = planeRows
      .withColumn("_bit",
        when(round(Vectors.dot(col("_u"), col("_plane")), 9) >= 0, lit("1"))
          .otherwise(lit("0")))
      .groupBy(col("vec_id"), col("_t"))
      .agg(concat_ws("", transform(
        sort_array(collect_list(struct(col("_p"), col("_bit")))),
        s => s.getField("_bit"))).as("_bucket"))
      .withColumn("_code", conv(col("_bucket"), 2, 10).cast("int"))
      .groupBy(col("vec_id"))
      .agg(transform(sort_array(collect_list(struct(col("_t"), col("_code")))),
        s => s.getField("_code")).as("_codes"))

    // new: weighted-sum codes, no strings anywhere
    def codesNew(): DataFrame = planeRows
      .groupBy(col("vec_id"), col("_t"))
      .agg(sum(when(
        round(Vectors.dot(col("_u"), col("_plane")), 9) >= 0, col("_w"))
        .otherwise(lit(0L))).cast("int").as("_code"))
      .groupBy(col("vec_id"))
      .agg(transform(sort_array(collect_list(struct(col("_t"), col("_code")))),
        s => s.getField("_code")).as("_codes"))

    // exact equality of the two codes frames (also warms both paths)
    require(codesOld().exceptAll(codesNew()).isEmpty
        && codesNew().exceptAll(codesOld()).isEmpty,
      "codes forms diverge")

    // plans/r21 evidence: the codes build is behind a localCheckpoint
    // in the declared query, so ITS plan is the one the rework changes
    if (sys.env.contains("GRAFT_AB_EXPLAIN")) {
      println("===== codes plan: OLD (bit-string + conv) =====")
      codesOld().explain("formatted")
      println("===== codes plan: NEW (weighted sum) =====")
      codesNew().explain("formatted")
      spark.stop(); return
    }

    def full(): DataFrame = graft.ext.SignLsh.nearDupPairsMulti(
        emb, "vec_id", "embedding", bits = bits, tables = tables,
        minCosine = 0.25, dim = d)
      .orderBy("id_a", "id_b")

    def noop(f: => DataFrame): Double =
      Harness.time(f.write.format("noop").mode("overwrite").save())
    def med(a: Seq[Double]) = a.sorted.apply((a.length - 1) / 2)

    noop(full()) // warm the full path
    val c0 = graft.Bench.canary(spark, 32)
    val tOld = new scala.collection.mutable.ArrayBuffer[Double]
    val tNew = new scala.collection.mutable.ArrayBuffer[Double]
    val tFull = new scala.collection.mutable.ArrayBuffer[Double]
    (1 to runs).foreach { _ =>
      tOld += noop(codesOld())
      tNew += noop(codesNew())
      tFull += noop(full())
    }
    val c1 = graft.Bench.canary(spark, 32)

    println(f"""{"dir":"$dir","canary":[$c0%.3f,$c1%.3f],"codes_old_med":${med(tOld.toSeq)}%.2f,"codes_new_med":${med(tNew.toSeq)}%.2f,"full_med":${med(tFull.toSeq)}%.2f,"codes_old":[${tOld.map(x => f"$x%.2f").mkString(",")}],"codes_new":[${tNew.map(x => f"$x%.2f").mkString(",")}],"full":[${tFull.map(x => f"$x%.2f").mkString(",")}]}""")
    spark.stop()
  }
}
