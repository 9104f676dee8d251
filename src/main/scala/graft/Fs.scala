package graft

/** Local-filesystem helpers for the staging/sink directories the
  * streaming replays and warehouse round-trips use under /tmp. */
object Fs {

  /** Best-effort recursive delete. The walk stream is closed explicitly
    * (it holds an OS directory handle until GC otherwise) and per-file
    * failures are tolerated — cleanup runs on finally paths where a
    * throw would mask the original exception. */
  def deleteRecursively(path: String): Unit = {
    import java.nio.file.{Files, Path, Paths}
    val p = Paths.get(path)
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach { f =>
          try Files.deleteIfExists(f)
          catch { case _: java.io.IOException => () }
        }
      finally walk.close()
    }
  }
}
