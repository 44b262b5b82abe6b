package graft.queries

/** tmpfs-backed scratch root for the streaming-store gates: the folds
  * write/read hundreds of small bucket files per trigger and the
  * box's virtual disk turns that into I/O wait, so prefer /dev/shm.
  * Cleanup runs in the finally of ONE shared helper (the gates
  * repeated it verbatim): the walk stream is closed, and both
  * IOException and the UncheckedIOException that Files.walk's lazy
  * iteration throws are swallowed — a vanished temp entry must never
  * replace the gate's real result (or its real exception). Callers
  * MUST materialize (localCheckpoint/collect) before returning: tmpfs
  * is RAM and the store is gone when body exits.
  */
private[queries] object GateTmp {

  def withStore[T](prefix: String)(body: String => T): T = {
    val shm = new java.io.File("/dev/shm")
    val root = if (shm.isDirectory)
        java.nio.file.Files.createTempDirectory(shm.toPath, prefix)
      else java.nio.file.Files.createTempDirectory(prefix)
    try body(root.toString)
    finally {
      import scala.jdk.CollectionConverters._
      try {
        val walk = java.nio.file.Files.walk(root)
        try walk.iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
        finally walk.close()
      } catch {
        case _: java.io.IOException | _: java.io.UncheckedIOException => ()
      }
    }
  }
}
