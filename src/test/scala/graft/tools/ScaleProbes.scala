package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Probe-time scaling of the three persisted-index lifecycles
  * (round-10 verdict #4): at 1x/3x/10x of the sf0.1 corpus (the
  * ScaleCurve replication dirs), time the once-per-corpus-version
  * BUILD and the per-batch PROBE separately. The 100 TB posture is
  * "build scales with corpus, probe scales with batch x posting
  * bucket" — a super-linear probe row means a plan defect.
  *
  * Constants mirror queries/SimilarityQueries (private there): m=32,
  * dim=64, trainHex="32", cell = label*4 + vec_id%4.
  */
object ScaleProbes {
  def main(args: Array[String]): Unit = {
    val root = sys.env.getOrElse("GRAFT_SCALE_ROOT", "/tmp/graft-scale")
    val factors = sys.env.getOrElse("GRAFT_SCALE_FACTORS", "1,3,10")
      .split(",").map(_.trim.toInt).toSeq
    val spark = graft.GraftSession.local(32)
    import graft.ext.{Dedup, Pq, Sampling, Similarity}
    import graft.operators.Versioned

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)

    spark.read.parquet(s"$root/x1/documents.parquet").count() // warm JVM

    factors.foreach { m =>
      val dir = s"$root/x$m"
      val docs = graft.Tables.documents(spark, dir)
      val emb = graft.Tables.embeddings(spark, dir)
      val nDocs = docs.count(); val nVec = emb.count()

      // --- MinHash LSH posting index
      val corpus = docs.filter(col("doc_id") % 5 =!= 0)
      val batch = docs.filter(col("doc_id") % 5 === 0)
      val lshBuild = time {
        noop(Dedup.persistedLshIndex(spark, dir, corpus, "doc_id", "text"))
      }
      val idx = Dedup.persistedLshIndex(spark, dir, corpus, "doc_id", "text")
      val lshProbe = med((1 to 3).map(_ =>
        time(noop(Dedup.lshIndexProbe(idx, corpus, batch, "doc_id", "text")))))

      // --- IVF
      val ivfRoot = Files.createTempDirectory("graft-scale-ivf").toString
      val ivfBuild = time {
        Versioned.write(spark, s"$ivfRoot/centroids",
          Similarity.trainCentroids(emb, "embedding", "label"))
      }
      val cent = Versioned.read(spark, s"$ivfRoot/centroids")
      val ivfProbe = med((1 to 3).map(_ => time(noop(
        Similarity.ivfProbe(emb.filter(col("vec_id") < 100), emb, "vec_id",
          "vec_id", "embedding", "label", cent, k = 3, nprobe = 3)))))

      // --- PQ
      val pqRoot = Files.createTempDirectory("graft-scale-pq").toString
      val cells = emb.withColumn("_pqcell",
        col("label") * 4 + pmod(col("vec_id"), lit(4)))
      val pqBuild = time {
        val codebook = Pq.trainCodebook(
          Sampling.sample(cells, col("vec_id"), lit("32")),
          "embedding", "_pqcell", 32, 64)
        Versioned.write(spark, s"$pqRoot/codebook", codebook)
        Versioned.write(spark, s"$pqRoot/codes",
          Pq.encode(emb, "vec_id", "embedding",
            Versioned.read(spark, s"$pqRoot/codebook"), 32, 64))
      }
      val cb = Versioned.read(spark, s"$pqRoot/codebook")
      val codes = Versioned.read(spark, s"$pqRoot/codes")
      val pqProbe = med((1 to 3).map(_ => time(noop(
        Pq.adcProbe(emb.filter(col("vec_id") < 100), "vec_id", "embedding",
          cb, codes, 32, 64, k = 3)))))

      println(f"""{"scale":$m,"docs":$nDocs,"vecs":$nVec,"lsh_build":$lshBuild%.2f,"lsh_probe":$lshProbe%.2f,"ivf_build":$ivfBuild%.2f,"ivf_probe":$ivfProbe%.2f,"pq_build":$pqBuild%.2f,"pq_probe":$pqProbe%.2f}""")
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
