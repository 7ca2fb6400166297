package graft

import java.nio.file.{Files, Paths}

import graft.operators.Persisted

/** Lifecycle contract of the persisted-artifact helper: recursive
  * partition-aware signatures (a regenerated file ANYWHERE under a
  * table dir invalidates), build-once/attach-everywhere through the
  * Hadoop FS API, and a configurable artifact root.
  */
class PersistedSpec extends SparkSpec {

  private def write(p: String, bytes: Int): Unit = {
    // staging/base paths come back scheme-qualified from the Hadoop FS
    // helper; java.nio would treat "file:" as a relative component
    val path = Paths.get(p.stripPrefix("file:"))
    Files.createDirectories(path.getParent)
    Files.write(path, Array.fill[Byte](bytes)(7))
  }

  test("signature walks partitioned directories recursively") {
    val dir = Files.createTempDirectory("graft-psig").toString
    write(s"$dir/day=2024-01-01/part-0.parquet", 10)
    write(s"$dir/day=2024-01-02/part-0.parquet", 10)
    val s1 = Persisted.signature(spark, Seq("x"), Seq(dir))
    assert(s1 == Persisted.signature(spark, Seq("x"), Seq(dir)),
      "signature must be deterministic")
    // regenerate ONE nested leaf (different size): the key must move —
    // a top-level-only listing would see zero files and stay constant
    write(s"$dir/day=2024-01-02/part-0.parquet", 11)
    val s2 = Persisted.signature(spark, Seq("x"), Seq(dir))
    assert(s1 != s2, "a nested file change must invalidate the signature")
    // a NEW partition directory must also move the key
    write(s"$dir/day=2024-01-03/part-0.parquet", 10)
    assert(Persisted.signature(spark, Seq("x"), Seq(dir)) != s2)
  }

  test("signature separates identity parts unambiguously") {
    assert(Persisted.signature(spark, Seq("a|b")) !=
      Persisted.signature(spark, Seq("a", "b")))
  }

  test("ensure builds once and re-attaches under a configured root") {
    val artRoot = Files.createTempDirectory("graft-proot").toString
    spark.conf.set("spark.graft.persisted.root", s"file:$artRoot")
    try {
      var builds = 0
      def run(): String = Persisted.ensure(spark, "spec-artifact", "s1") {
        staging =>
          builds += 1
          // a Spark write against the staging path exercises the same
          // Hadoop-FS path discipline production builds use
          spark.range(3).write.parquet(s"$staging/data")
      }
      val first = run()
      assert(builds == 1)
      assert(first.contains(artRoot), s"artifact must land under the " +
        s"configured root, got $first")
      assert(spark.read.parquet(s"$first/data").count() == 3)
      val second = run()
      assert(builds == 1, "a complete artifact must re-attach, not rebuild")
      assert(second == first)
    } finally spark.conf.unset("spark.graft.persisted.root")
  }

  test("a partial artifact (no _DONE) is never attachable") {
    val artRoot = Files.createTempDirectory("graft-proot2").toString
    spark.conf.set("spark.graft.persisted.root", s"file:$artRoot")
    try {
      // simulate a crashed build: base exists, no _DONE
      write(s"$artRoot/spec-partial-s1/data.bin", 4)
      var builds = 0
      intercept[java.io.IOException] {
        // the fresh build completes but cannot publish over the
        // unfinished dir — fail loud, never silently attach or destroy
        Persisted.ensure(spark, "spec-partial", "s1") { staging =>
          builds += 1
          write(s"$staging/data.bin", 8)
        }
      }
      assert(builds == 1)
    } finally spark.conf.unset("spark.graft.persisted.root")
  }
}
