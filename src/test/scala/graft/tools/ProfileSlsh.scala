package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
// scratch profiler, not committed
object ProfileSlsh {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.prepare(spark)
    val dir = "/root/testdata/sf0.1"
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PHASE $name%-28s ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    t("warmup-batch") { spark.read.parquet(s"$dir/lineitem.parquet").count() }
    val docs = graft.Tables.documents(spark, dir)
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    t("index-build") { graft.ext.Dedup.persistedLshIndex(spark, dir, corpus, "doc_id", "text").count() }
    t("doc-staging") { graft.streaming.Streams.documentsStream(spark, dir, 3) }
    t("full-query-1") { graft.queries.PipelineQueries.streamingDedupLsh(spark, dir).count() }
    t("full-query-2") { graft.queries.PipelineQueries.streamingDedupLsh(spark, dir).count() }
    t("full-query-3") { graft.queries.PipelineQueries.streamingDedupLsh(spark, dir).count() }
    spark.stop()
  }
}
