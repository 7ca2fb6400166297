package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Build-once, attach-everywhere staging for immutable derived
  * artifacts (bucketed layouts, medallion bases, LSH/IVF/PQ indexes):
  * the artifact lives under a SIGNATURE-KEYED directory, the first
  * process after a corpus change builds it into a private staging dir
  * and atomically publishes, and every later call — in this process
  * or any other — re-attaches to the finished artifact. A concurrent
  * first-builder loses the rename race cleanly and discards its
  * staging; a partial build (no `_DONE`) is never attachable.
  *
  * This is the `join_bucketed` lifecycle contract extracted once: the
  * recurring cost of a derived artifact is USING it, and only the
  * first process after its inputs change pays the build.
  *
  * All paths go through the Hadoop FS API (like [[Versioned]] and
  * [[MergeWriter]]), so the artifact root can be HDFS/S3/local alike —
  * set `spark.graft.persisted.root` to the shared location; it
  * defaults to the local tmpdir for single-machine runs. Staging dirs
  * are created UNDER the root so the publish rename is a same-FS
  * metadata operation, never a copy.
  */
object Persisted {

  /** Artifact root: `spark.graft.persisted.root` when set (any Hadoop
    * FS URI — `hdfs://…`, `s3a://…`, `file:/…`), else the local
    * tmpdir. At 100 TB this is the derived-table area of the lake and
    * the publish rename is a metastore-grade pointer swap.
    */
  def root(spark: SparkSession): Path = new Path(
    spark.conf.getOption("spark.graft.persisted.root")
      .getOrElse("file:" + sys.props("java.io.tmpdir")))

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** CRC signature of arbitrary identity parts plus the RECURSIVE
    * data-file listings (root-relative path + size + mtime, sorted) of
    * the given table directories — file-content-change invalidates,
    * directory stat quirks don't (the r13 ADVICE lesson: directory
    * length/mtime are filesystem-dependent and effectively constant).
    * The walk is recursive so a hive-partitioned table (a directory of
    * `day=…` subdirectories) contributes every leaf file: a
    * regenerated partitioned corpus can never alias to the stale
    * signature a top-level-only listing would produce.
    */
  def signature(spark: SparkSession, parts: Seq[String],
      tableDirs: Seq[String] = Nil): String = {
    val crc = new java.util.zip.CRC32
    // length-prefixed so part boundaries are unambiguous: a plain
    // separator would let ["a|b"] and ["a","b"] alias to one signature
    parts.foreach(p => crc.update(s"${p.length}:$p|".getBytes("UTF-8")))
    tableDirs.foreach { t =>
      val f = fs(spark, new Path(t))
      val dir = f.makeQualified(new Path(t))
      crc.update(dir.toString.getBytes("UTF-8"))
      if (f.exists(dir)) {
        val prefix = dir.toString
        val it = f.listFiles(dir, true)
        val entries = scala.collection.mutable.ArrayBuffer.empty[String]
        while (it.hasNext) {
          val st = it.next()
          val rel = st.getPath.toString.stripPrefix(prefix).stripPrefix("/")
          entries += s"|$rel|${st.getLen}|${st.getModificationTime}"
        }
        entries.sorted.foreach(e => crc.update(e.getBytes("UTF-8")))
      }
    }
    java.lang.Long.toHexString(crc.getValue)
  }

  /** Return the persisted dir for (`label`, `sig`), running `build`
    * against a private staging dir (a path string on the artifact
    * root's filesystem) and atomically publishing it if no complete
    * artifact exists yet.
    */
  def ensure(spark: SparkSession, label: String, sig: String)
      (build: String => Unit): String = {
    val base = new Path(root(spark), s"$label-$sig")
    val f = fs(spark, base)
    val done = new Path(base, "_DONE")
    if (!f.exists(done)) {
      val staging = new Path(root(spark),
        s"$label-$sig-stage-${java.util.UUID.randomUUID()}")
      f.mkdirs(staging)
      build(staging.toString)
      f.create(new Path(staging, "_DONE"), true).close()
      // publish: same-FS rename (staging lives under the root). A lost
      // race — the winner's complete artifact already in place — may
      // discard the staging; any other failure must not silently
      // destroy the one complete build.
      var won = false
      if (!f.exists(base)) {
        won = f.rename(staging, base)
        // HDFS/local-fallback rename semantics NEST src under an
        // existing dst directory: if a concurrent winner published
        // between the exists check and the rename, our staging landed
        // INSIDE base — undo the nesting and fall through to attach.
        val nested = new Path(base, staging.getName)
        if (won && f.exists(nested)) {
          f.delete(nested, true)
          won = false
        }
      }
      if (!won) {
        if (f.exists(done)) {
          if (f.exists(staging)) f.delete(staging, true)
        } else throw new java.io.IOException(
          s"cannot publish persisted artifact '$label' to $base")
      }
    }
    base.toString
  }
}
