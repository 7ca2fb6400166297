package graft.operators

import org.apache.spark.sql.SparkSession

/** The ONE owner of the temporarily-resized
  * `spark.sql.shuffle.partitions` pattern the iterative/streaming
  * operators use (graph rounds, PQ index builds, micro-batch state
  * sizing): the setting is SESSION-GLOBAL, so save → set → run →
  * restore windows from two threads can interleave and leave the
  * session permanently at a shrunken width (A saves 32, B saves A's 4,
  * A restores 32, B "restores" 4 — forever). A JVM-wide lock around
  * the whole window makes the mutation atomic per session process.
  *
  * Honest limits, documented rather than hidden: (1) a concurrent
  * query that does NOT use this helper still plans at the shrunken
  * width while a sized window is open — per-operation width simply is
  * not expressible through the session conf, which is why every sized
  * width here only ever SHRINKS toward graph-sized shuffles whose
  * tasks are cheap anyway; (2) a DataFrame returned lazily from inside
  * the window executes at whatever the conf is at ACTION time — sizing
  * is only guaranteed for work materialized inside `f`; (3) a sized
  * window must NOT be opened from inside a `foreachBatch` body while
  * the enclosing stream was itself started inside a sized window on
  * the SAME session — the outer holder is blocked in
  * `awaitTermination` waiting on the micro-batch thread, so the inner
  * acquisition can never succeed. Rather than deadlocking forever,
  * acquisition is bounded: after `graft.shuffleWidth.lockTimeoutSec`
  * (default 600 s) it fails with an error naming this constraint.
  *
  * The lock is PER SESSION (weak-keyed, so dropped sessions do not
  * leak): unrelated SparkSessions never serialize on each other, and
  * the lock is reentrant for same-thread nesting.
  */
object ShuffleWidth {
  private val locks = new java.util.WeakHashMap[SparkSession, java.util.concurrent.locks.ReentrantLock]()
  private val Key = "spark.sql.shuffle.partitions"

  private def lockFor(spark: SparkSession) = locks.synchronized {
    var l = locks.get(spark)
    if (l == null) { l = new java.util.concurrent.locks.ReentrantLock(); locks.put(spark, l) }
    l
  }

  /** Session shuffle width, parsed defensively (a non-numeric value —
    * some platforms ship "auto" — falls back to Spark's default 200
    * instead of throwing mid-operator).
    */
  def session(spark: SparkSession): Long =
    scala.util.Try(spark.conf.get(Key).toLong).getOrElse(200L)

  /** Run `f` with the shuffle width set to `target(currentWidth)`
    * (floored at 1), atomically restoring the previous value after.
    */
  def withWidth[A](spark: SparkSession, target: Long => Long)(f: => A): A = {
    val lock = lockFor(spark)
    val timeoutSec =
      scala.util.Try(spark.conf.get("graft.shuffleWidth.lockTimeoutSec").toLong).getOrElse(600L)
    if (!lock.tryLock(timeoutSec, java.util.concurrent.TimeUnit.SECONDS))
      throw new IllegalStateException(
        s"ShuffleWidth.withWidth could not acquire this session's width lock within ${timeoutSec}s. " +
          "Another thread holds a sized window open on the same SparkSession. If that holder is " +
          "legitimately long-running, raise graft.shuffleWidth.lockTimeoutSec; but if this call " +
          "came from a foreachBatch body while the enclosing stream was itself started inside a " +
          "sized window, the holder is blocked in awaitTermination on this very micro-batch and " +
          "no timeout can help — size the batch work before starting the stream, or use a " +
          "separate session.")
    try {
      val saved = spark.conf.get(Key)
      spark.conf.set(Key, math.max(1L, target(session(spark))).toString)
      try f finally spark.conf.set(Key, saved)
    } finally lock.unlock()
  }
}
