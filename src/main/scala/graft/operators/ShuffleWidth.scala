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
  * is only guaranteed for work materialized inside `f`.
  */
object ShuffleWidth {
  private val lock = new Object
  private val Key = "spark.sql.shuffle.partitions"

  /** Session shuffle width, parsed defensively (a non-numeric value —
    * some platforms ship "auto" — falls back to Spark's default 200
    * instead of throwing mid-operator).
    */
  def session(spark: SparkSession): Long =
    scala.util.Try(spark.conf.get(Key).toLong).getOrElse(200L)

  /** Run `f` with the shuffle width set to `target(currentWidth)`
    * (floored at 1), atomically restoring the previous value after.
    */
  def withWidth[A](spark: SparkSession, target: Long => Long)(f: => A): A =
    lock.synchronized {
      val saved = spark.conf.get(Key)
      spark.conf.set(Key, math.max(1L, target(session(spark))).toString)
      try f finally spark.conf.set(Key, saved)
    }
}
