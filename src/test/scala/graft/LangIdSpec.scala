package graft

import org.apache.spark.sql.functions._

import graft.functions.LangProfiles

/** Trigram language ID on real multilingual sentences (the synthetic
  * corpus is language-less word soup, so quality is asserted here).
  */
class LangIdSpec extends SparkSpec {

  test("trigram profiles identify natural-language samples") {
    import spark.implicits._
    val samples = Seq(
      ("en", "the quick brown fox jumps over the lazy dog and runs into the forest"),
      ("de", "der schnelle braune fuchs springt ueber den faulen hund und rennt in der wald"),
      ("fr", "le renard brun rapide saute par dessus le chien paresseux dans la foret que nous aimons"),
      ("es", "el rapido zorro marron salta sobre el perro perezoso que duerme en la casa de los amigos"))
      .toDF("expected", "text")
      .withColumn("pred", LangProfiles.predict(col("text")))
    val wrong = samples.filter(col("pred") =!= col("expected"))
    assert(wrong.isEmpty, wrong.collect().mkString(", "))
  }

  test("short text degrades gracefully (no crash, some prediction)") {
    import spark.implicits._
    val p = Seq(("x", "ab")).toDF("id", "text")
      .select(LangProfiles.predict(col("text"))).head().getString(0)
    assert(Set("en", "de", "fr", "es").contains(p))
  }
}
