package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Exact frequent-item mining at stream scale: Misra–Gries summaries
  * per partition generate a candidate set, then one exact counting
  * pass over just the candidates confirms. The MG merge property makes
  * the candidate union a GUARANTEED superset of the true heavy
  * hitters: an item with global frequency > n/k must exceed its local
  * n_p/k share in at least one partition (pigeonhole), and
  * per-partition MG with k counters surfaces every such item. So the
  * verified output is EXACT — `{item : freq(item) * k > n}` — while
  * the sketch pass keeps state at k counters per task, never a full
  * hash-aggregate of the (possibly billions-cardinality) item domain.
  *
  * Scale shape: pass 1 is map-only (k-bounded state, emits ≤ k
  * candidates per partition); pass 2 semi-joins the broadcast
  * candidate set (≤ partitions × k rows) and hash-aggregates only
  * matching rows. The full-domain groupBy this replaces shuffles every
  * distinct item; this shuffles only survivors.
  */
object HeavyHitters {

  /** @return (item, freq) for items with freq * k > total count; exact. */
  def frequentItems(items: Dataset[String], k: Int): DataFrame = {
    import items.sparkSession.implicits._
    // pass 1 emits each partition's MG candidates PLUS its row count —
    // the total rides along with the sketch, so the input is scanned
    // exactly twice (sketch + verify), never a third time just to count
    val pass1 = items.mapPartitions { it =>
      val c = scala.collection.mutable.HashMap.empty[String, Long]
      var n = 0L
      it.foreach { x =>
        n += 1
        c.get(x) match {
          case Some(v) => c.update(x, v + 1)
          case None if c.size < k => c.update(x, 1L)
          case None => // decrement-all step: amortized O(1) per element
            c.mapValuesInPlace((_, v) => v - 1)
            c.filterInPlace((_, v) => v > 0)
        }
      }
      c.keysIterator.map(x => (x, 0L, false)) ++ Iterator(("", n, true))
    }.toDF("item", "cnt", "is_count")
      .localCheckpoint() // ≤ k+1 rows per partition; pins pass 1's scan
    val candidates = pass1.filter(!col("is_count")).select("item").distinct()
    val total = pass1.filter(col("is_count")).agg(sum(col("cnt")).as("_n"))
    items.toDF("item")
      // NULL-SAFE semi join: a null item counts toward n and can be a
      // true heavy hitter (the MG map tracks it like any value), but a
      // plain equi-join would drop it here (null = null is never true)
      // and silently omit it from the "exact" output
      .join(broadcast(candidates.withColumnRenamed("item", "_cand")),
        col("item") <=> col("_cand"), "left_semi")
      .groupBy("item").agg(count(lit(1)).as("freq"))
      .crossJoin(broadcast(total))
      .filter(col("freq") * k > col("_n"))
      .select(col("item"), col("freq"))
  }
}
