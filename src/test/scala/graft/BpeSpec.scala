package graft

import org.apache.spark.sql.functions._

import graft.ext.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("pair counts are frequency-weighted adjacent 2-grams") {
    // "abab" occurs 2x -> pairs ab, ba, ab each weighted 2
    // "ab"   occurs 3x -> pair ab weighted 3
    // "x"    occurs 1x -> too short, no pairs (but counted as a word)
    val docs = Seq("abab ab x", "abab ab", "ab").toDF("text")
    val words = Bpe.wordCounts(docs, "text")
    assert(words.collect().map(r => (r.getString(0), r.getLong(1))).toMap ===
      Map("abab" -> 2L, "ab" -> 3L, "x" -> 1L))
    val pairs = Bpe.pairCounts(words).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // ab: 2 (in abab, twice) * 2 + 3 = 7; ba: 1 * 2 = 2
    assert(pairs === Map("ab" -> 7L, "ba" -> 2L))
  }

  test("bpe_merges ranks pairs by weighted count and is a distributed top-k") {
    val q = graft.queries.TextQueries.bpeMerges(spark, sf)
    val rows = q.collect()
    assert(rows.length === 20)
    assert(rows.map(_.getLong(2)).toSeq === (1L to 20L))
    // ranks follow (count desc, pair asc)
    val sorted = rows.sortBy(r => (-r.getLong(1), r.getString(0)))
    assert(sorted.map(_.getLong(2)).toSeq === (1L to 20L))
    // the corpus-scale ranking never global-sorts the pair table
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p.take(600))
  }
}
