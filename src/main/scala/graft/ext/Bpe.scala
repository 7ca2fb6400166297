package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The corpus-scale step of BPE tokenizer training (Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword
  * Units"): compress the corpus to a (word, frequency) table, then
  * count adjacent symbol pairs over the DISTINCT words weighted by
  * their frequencies — the statistic the first merge is chosen from.
  *
  * Scale architecture: BPE training touches the corpus exactly once
  * (the word-count groupBy — a shuffle of (word, partial count) pairs
  * with map-side combine). Everything after operates on the
  * vocab-sized word table (≪ corpus, Heaps' law), which is why BPE
  * trains in minutes on corpora that take hours to scan: iterations
  * 2..N re-pair only words containing the previous merge, never the
  * corpus. This module computes the corpus pass + the first pair
  * statistic distributedly; the ranking is a distributed top-k
  * (TakeOrderedAndProject), never a global sort.
  */
object Bpe {

  /** Frequency-weighted word table: one row per distinct word. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(graft.functions.Text.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy("word").agg(count(lit(1)).as("wf"))

  /** Adjacent character-pair counts over the word table, each pair
    * weighted by its word's corpus frequency. A word of length L
    * contributes its L-1 adjacent 2-grams (`substr(word, i, 2)` IS
    * the pair) — map-side explode over vocab-sized input, one
    * partial-agg'd shuffle of (pair, partial sum).
    */
  def pairCounts(words: DataFrame): DataFrame =
    words.filter(length(col("word")) >= 2)
      .select(col("wf"), explode(
        transform(sequence(lit(1), length(col("word")) - 1),
          i => col("word").substr(i, lit(2)))).as("pair"))
      .groupBy("pair").agg(sum(col("wf")).as("pair_count"))
}
