package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ext.Multimodal
import graft.metar.{MetarFixture, Normalize}
import graft.pipeline.Medallion
import graft.quality.Anomaly
import graft.sources.CheckWxSource

/** End-to-end pipeline pieces: HTTP source unwrapping, medallion DAG
  * idempotence, schema-drift detection, multimodal batch plumbing.
  */
class PipelineSpec extends SparkSpec {

  test("CheckWx source unwraps data[] and feeds Normalize (S1)") {
    val src = CheckWxSource.fixture(MetarFixture.docs)
    val raw = src.fetchDecoded(spark, Seq("UUEE", "UUDD"))
    assert(raw.count() === 5)
    val flat = Normalize(raw)
    assert(flat.select("icao").distinct().count() === 4)
  }

  test("CheckWx source: empty data array short-circuits (F5)") {
    val src = CheckWxSource.fixture(Nil)
    assert(src.fetchDecoded(spark, Seq("UUEE")).isEmpty)
  }

  test("medallion re-run is a no-op (replay idempotence)") {
    val root = Files.createTempDirectory("graft-medallion-test").toString
    val first = Medallion.run(spark, sf, root).orderBy("user_id", "day").collect()
    val second = Medallion.run(spark, sf, root).orderBy("user_id", "day").collect()
    assert(first.sameElements(second))
  }

  test("schema diff detects added/removed/retyped columns (Q6)") {
    import spark.implicits._
    val before = Anomaly.schemaSnapshot(Seq((1L, "a")).toDF("id", "x"))
    val after = Anomaly.schemaSnapshot(Seq((1, "a", 0.5)).toDF("id", "x", "y"))
    val diff = Anomaly.schemaDiff(before, after)
    assert(diff === Seq("added:y", "retyped:id:bigint->int"))
  }

  test("multimodal features: batch boundaries don't change results") {
    import spark.implicits._
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sf))
      .as[Multimodal.MediaRow]
    val small = Multimodal.extractFeatures(media, Multimodal.StubDecoder, batchSize = 7)
      .toDF().drop("features")
    val big = Multimodal.extractFeatures(media, Multimodal.StubDecoder, batchSize = 512)
      .toDF().drop("features")
    assert(small.exceptAll(big).isEmpty && big.exceptAll(small).isEmpty)
    assert(small.count() === 500)
  }

  test("anomaly stats flag an injected outlier slice (Q7)") {
    import spark.implicits._
    val base = (1 to 300).map(i => (i % 30, 10.0 + (i % 7) * 0.1))
    val outlier = (1 to 10).map(_ => (99, 10000.0))
    val df = (base ++ outlier).toDF("slice", "v")
    val stats = Anomaly.columnStats(df, "v", "slice")
    assert(stats.filter(col("is_anomaly")).select("slice").head().getInt(0) === 99)
  }
}
