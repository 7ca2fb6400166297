package graft.operators

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
  * first process after its inputs change pays the build. At 100 TB
  * the "directory" is a table location and the rename is a metastore
  * pointer swap; the signature discipline is identical.
  */
object Persisted {

  /** CRC signature of arbitrary identity parts plus the DATA-FILE
    * listings (name + size + mtime, sorted) of the given table
    * directories — file-content-change invalidates, directory stat
    * quirks don't (the r13 ADVICE lesson: directory length/mtime are
    * filesystem-dependent and effectively constant).
    */
  def signature(parts: Seq[String], tableDirs: Seq[String] = Nil): String = {
    val crc = new java.util.zip.CRC32
    // length-prefixed so part boundaries are unambiguous: a plain
    // separator would let ["a|b"] and ["a","b"] alias to one signature
    parts.foreach(p => crc.update(s"${p.length}:$p|".getBytes("UTF-8")))
    tableDirs.foreach { t =>
      val d = new java.io.File(t)
      crc.update(d.getAbsolutePath.getBytes("UTF-8"))
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(_.isFile).sortBy(_.getName)
        .foreach { f =>
          crc.update(s"|${f.getName}|${f.length}|${f.lastModified}"
            .getBytes("UTF-8"))
        }
    }
    java.lang.Long.toHexString(crc.getValue)
  }

  /** Return the persisted dir for (`label`, `sig`), running `build`
    * against a private staging dir and atomically publishing it if no
    * complete artifact exists yet.
    */
  def ensure(label: String, sig: String)
      (build: java.io.File => Unit): String = {
    val base = new java.io.File(
      sys.props("java.io.tmpdir"), s"$label-$sig")
    if (!new java.io.File(base, "_DONE").exists()) {
      val staging = java.nio.file.Files
        .createTempDirectory(s"$label-$sig-stage").toFile
      build(staging)
      new java.io.File(staging, "_DONE").createNewFile()
      try java.nio.file.Files.move(staging.toPath, base.toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch {
        case e: java.nio.file.FileSystemException =>
          // ONLY a lost race (winner's complete artifact in place) may
          // discard the staging; any other move failure (I/O error,
          // cross-filesystem tmpdir) must not silently destroy the one
          // complete build
          if (new java.io.File(base, "_DONE").exists()) {
            import scala.reflect.io.Directory
            new Directory(staging).deleteRecursively()
          } else throw e
      }
    }
    base.toString
  }
}
