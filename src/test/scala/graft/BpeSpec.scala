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

  test("iterative merges: argmax trajectory, merged symbols re-merge, ties break lexicographically") {
    // words: aa:1, ab:2, b:1 -> round 1 pairs (a,a):1 (a,b):2 -> merge
    // (a,b); round 2 only (a,a):1 remains; round 3 has no pairs left
    val docs = Seq("aa ab", "ab b").toDF("text")
    val (merges, words) = Bpe.trainMerges(docs, "text", iters = 3)
    assert(merges === Seq((1L, "a", "b", 2L), (2L, "a", "a", 1L)))
    val sub = Bpe.subwordCounts(words).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(sub === Map("aa" -> 1L, "ab" -> 2L, "b" -> 1L))
    // a MERGED symbol participates in later rounds: abc -> (a,b) tie
    // beats (b,c) lexicographically, then (ab,c) merges the merged
    // symbol with its neighbor
    val (m2, w2) = Bpe.trainMerges(Seq("abc abc abc").toDF("text"),
      "text", iters = 3)
    assert(m2 === Seq((1L, "a", "b", 3L), (2L, "ab", "c", 3L)))
    assert(Bpe.subwordCounts(w2).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap === Map("abc" -> 3L))
    // CONSECUTIVE occurrences merge independently (left-to-right
    // non-overlapping): abab -> (ab)(ab) in round 1, then one symbol
    val (m3, w3) = Bpe.trainMerges(Seq("abab").toDF("text"),
      "text", iters = 2)
    assert(m3 === Seq((1L, "a", "b", 2L), (2L, "ab", "ab", 1L)))
    assert(Bpe.subwordCounts(w3).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap === Map("abab" -> 1L))
  }

  test("control/line-terminator chars in a token fail loudly, not silently corrupt") {
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    // the reserved boundary chars themselves
    val e = intercept[Exception] {
      Bpe.trainMerges(Seq("ok bad\u001ctoken").toDF("text"), "text", 1)
    }
    assert(msgs(e).exists(_.contains("control or line-terminator")))
    // U+0085 NEL: can survive tokenization, and Java regex vs DuckDB
    // RE2 disagree on whether '.' matches it — must be rejected up
    // front, not surface as an oracle hash mismatch
    val e2 = intercept[Exception] {
      Bpe.trainMerges(Seq("ok bad\u0085token").toDF("text"), "text", 1)
    }
    assert(msgs(e2).exists(_.contains("control or line-terminator")))
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

  test("bpe_encode broadcasts the vocab map; lengths bound sanely") {
    val q = graft.queries.TextQueries.bpeEncode(spark, sf)
    // the word -> subword-count map is vocab-sized: it must reach the
    // corpus join as a broadcast, never a corpus-wide shuffle
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    // every word is >= 1 symbol, so BPE length bounds the word count;
    // merges only shrink symbol counts, never below one per word
    val bad = q.filter(col("n_bpe_tokens") < col("n_words")).count()
    assert(bad === 0)
    assert(q.filter(col("n_words") > 0).count() > 0)
  }
}
