package graft.tools

/** A/B for the r19 fuzzy-dedup rewrite: the salted grouped edit
  * kernel ([[graft.plans.EditPairs]] via `Dedup.fuzzyPairsBlocked`)
  * vs the blocked self-join twin (`fuzzyPairsJoined`), on the
  * dedup_fuzzy production shape (documents, source blocks, 40-char
  * prefixes, maxDist 12). Equality asserted before timing;
  * alternating reps.
  */
object ProfileEditPairs {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("GRAFT_AB_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("GRAFT_AB_REPS", "4").toInt
    val spark = Harness.session()
    val docs = graft.Tables.documents(spark, dir).localCheckpoint()
    docs.count()

    def kernel() = graft.ext.Dedup.fuzzyPairsBlocked(docs, "doc_id",
      "text", "source", 40, 12)
    def joined() = graft.ext.Dedup.fuzzyPairsJoined(docs, "doc_id",
      "text", "source", 40, 12)

    // the 30× equality pass costs two extra full runs of EACH variant
    // per exceptAll direction — sf0.1 equality (always on) plus the
    // SimilaritySpec parity gates pin exactness; skip at scale with
    // GRAFT_AB_SKIP_EQ=1
    if (sys.env.get("GRAFT_AB_SKIP_EQ").isEmpty)
      require(kernel().exceptAll(joined()).isEmpty &&
        joined().exceptAll(kernel()).isEmpty, "variants disagree")

    def noop(f: org.apache.spark.sql.DataFrame): Double =
      Harness.time(f.write.format("noop").mode("overwrite").save())
    // kernel-only mode (GRAFT_AB_KERNEL_ONLY): at 30x the joined twin
    // costs ~3x the kernel per rep — skip it when the question is
    // old-kernel vs new-kernel across checkouts
    if (sys.env.get("GRAFT_AB_KERNEL_ONLY").nonEmpty) {
      noop(kernel())
      val t = (1 to reps).map(_ => noop(kernel()))
      def medK(a: Seq[Double]) = a.sorted.apply((a.length - 1) / 2)
      println(f"""{"dir":"$dir","kernel_only_med":${medK(t)}%.2f,"kernel":[${t.map(x => f"$x%.2f").mkString(",")}]}""")
      spark.stop()
      return
    }
    noop(kernel()); noop(joined()) // warm
    val tK = collection.mutable.ArrayBuffer.empty[Double]
    val tJ = collection.mutable.ArrayBuffer.empty[Double]
    (1 to reps).foreach { _ => tK += noop(kernel()); tJ += noop(joined()) }
    def med(a: Seq[Double]) = a.sorted.apply((a.length - 1) / 2)
    def fmt(a: Seq[Double]) = a.map(x => f"$x%.2f").mkString(",")
    println(f"""{"dir":"$dir","kernel_med":${med(tK.toSeq)}%.2f,"joined_med":${med(tJ.toSeq)}%.2f,"kernel":[${fmt(tK.toSeq)}],"joined":[${fmt(tJ.toSeq)}]}""")
    spark.stop()
  }
}
