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
}
