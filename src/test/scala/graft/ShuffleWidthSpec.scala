package graft

import graft.operators.ShuffleWidth

/** The sized-width window's locking contract: reentrant for the owner
  * thread, bounded (readable error, not a permanent deadlock) for a
  * cross-thread acquisition that cannot succeed — the foreachBatch-
  * inside-a-sized-stream shape the round-10 advice flagged.
  */
class ShuffleWidthSpec extends SparkSpec {

  test("same-thread nesting is reentrant and restores the outer width") {
    val before = ShuffleWidth.session(spark)
    ShuffleWidth.withWidth(spark, _ => 8L) {
      assert(ShuffleWidth.session(spark) === 8L)
      ShuffleWidth.withWidth(spark, _ => 4L) {
        assert(ShuffleWidth.session(spark) === 4L)
      }
      assert(ShuffleWidth.session(spark) === 8L)
    }
    assert(ShuffleWidth.session(spark) === before)
  }

  test("cross-thread acquisition under a held window fails readably, not forever") {
    spark.conf.set("graft.shuffleWidth.lockTimeoutSec", "1")
    try {
      @volatile var caught: Throwable = null
      ShuffleWidth.withWidth(spark, _ => 8L) {
        val t = new Thread(() =>
          try ShuffleWidth.withWidth(spark, _ => 4L)(())
          catch { case e: Throwable => caught = e })
        t.start()
        t.join(10000)
        assert(!t.isAlive, "contending thread must not hang past the timeout")
      }
      assert(caught != null)
      assert(caught.isInstanceOf[IllegalStateException])
      assert(caught.getMessage.contains("foreachBatch"))
    } finally spark.conf.unset("graft.shuffleWidth.lockTimeoutSec")
  }
}
