package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Character-trigram language identification for real-world text: each
  * language carries a tiny profile of its most characteristic
  * trigrams; a document's score per language is the count of profile
  * trigrams it contains, and the prediction is the deterministic
  * argmax (alphabetically-first code wins ties — same tie rule as the
  * marker-word variant in [[Text]]).
  *
  * Profiles are derived from public frequency tables of function-word
  * n-grams. Scoring is `size(filter(...))` over the document's padded
  * trigram set — builtin-only, map-side, no shuffle; the profile is a
  * compile-time literal array so it broadcasts inside the plan.
  */
object LangProfiles {

  /** Most-frequent characteristic trigrams (space-padded word
    * boundaries marked with '_').
    */
  val profiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("_th", "the", "he_", "ing", "ng_", "and", "nd_", "_of",
      "of_", "ed_", "_to", "to_", "_in", "ion", "on_"),
    "de" -> Seq("_de", "der", "er_", "ein", "ich", "ch_", "sch", "die",
      "ie_", "und", "nd_", "_un", "en_", "ung", "cht"),
    "fr" -> Seq("_de", "de_", "es_", "le_", "_le", "ent", "nt_", "la_",
      "_la", "ion", "on_", "que", "ue_", "_qu", "les"),
    "es" -> Seq("_de", "de_", "os_", "la_", "_la", "el_", "_el", "que",
      "ue_", "_qu", "ion", "cio", "ado", "es_", "ent"))

  /** Padded character trigrams of a text column ('_' = word boundary).
    * For long documents bind the padded text to a real column first so
    * the normalization isn't re-evaluated per trigram.
    */
  def trigramsOf(text: Column): Column = {
    val padded = concat(lit("_"), regexp_replace(lower(text), " ", "_"), lit("_"))
    array_distinct(
      when(length(padded) >= 3,
        transform(sequence(lit(1), length(padded) - 2),
          i => padded.substr(i, lit(3))))
        .otherwise(array(padded)))
  }

  def scoreFor(trigrams: Column, lang: String): Column =
    Text.countIn(trigrams, profiles(lang))

  /** Predicted language code over the built-in profiles. */
  def predict(text: Column): Column = {
    val tg = trigramsOf(text)
    Text.argmaxLang(profiles.keys.map(l => l -> scoreFor(tg, l)).toMap)
  }
}
