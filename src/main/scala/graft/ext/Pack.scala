package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed token-budget training
  * chunks — the step that turns a cleaned corpus into dense
  * fixed-length context windows for LLM training (concatenate the
  * token stream, cut every `budget` tokens, place each document at
  * its stream offset).
  *
  * The stream is sharded (by `shardCol` — source/domain here, a hash
  * bucket in general): offsets are prefix sums *within a shard*, so
  * the only shuffle is the window's hash-partition on the shard key
  * and no global sort ever happens. At 100 TB each shard packs
  * independently on its own executor — embarrassingly parallel across
  * shards, deterministic (offsets are a pure function of the sorted
  * ids), and incremental-friendly (appending a shard never renumbers
  * the others).
  */
object Pack {

  /** One row per document: its token count, exclusive prefix offset in
    * the shard's token stream, and the chunk index / id its first
    * token lands in.
    */
  def sequences(df: DataFrame, idCol: String, tokensCol: Column,
      shardCol: String, budget: Int): DataFrame = {
    val w = Window.partitionBy(shardCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol), col(shardCol), tokensCol.cast("long").as("n_tokens"))
      .withColumn("start_offset",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("chunk_idx",
        floor(col("start_offset") / lit(budget)).cast("long"))
      .withColumn("chunk_id",
        concat(col(shardCol), lit("_"), col("chunk_idx").cast("string")))
  }

  /** Sliding-window chunking of individual documents: split each
    * document's token array into windows of `maxTokens` tokens
    * advancing by `maxTokens - overlap` — the long-document step
    * (context-window splitting for pretraining, passage chunking for
    * retrieval). A trailing window is emitted only if it starts within
    * the document, so short documents yield exactly one chunk.
    *
    * Pure per-row explode — map-only, zero shuffle, and output size is
    * input tokens × (1 + overlap/stride), a constant factor known in
    * advance.
    */
  def chunkDocuments(df: DataFrame, idCol: String, textToks: Column,
      maxTokens: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap $overlap must be in [0, maxTokens)")
    val stride = maxTokens - overlap
    df.select(col(idCol), textToks.as("_toks"))
      .select(col(idCol), col("_toks"),
        posexplode(sequence(lit(1),
          greatest(size(col("_toks")) - overlap, lit(1)), lit(stride)))
          .as(Seq("chunk_idx", "_start")))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        concat_ws(" ", slice(col("_toks"), col("_start"), lit(maxTokens)))
          .as("chunk_text"),
        least(size(col("_toks")) - col("_start") + 1, lit(maxTokens))
          .cast("long").as("n_chunk_tokens"))
  }
}
