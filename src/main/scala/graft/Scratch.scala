package graft

/** Per-JVM scratch directories for queries that exercise persisted
  * state (seen-id ledgers, card ledgers, ANN indexes, resumable model
  * state). Bench runs each query 2-3x per suite, so per-invocation
  * temp dirs multiply; every directory handed out here is registered
  * once for recursive deletion at JVM exit, so repeated suite runs do
  * not accumulate parquet partials on disk. Deletion is best-effort
  * (a file pinned by a late executor thread is skipped, never
  * thrown) — the JVM is exiting either way.
  */
object Scratch {

  private val dirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]

  // registered at most once, on first use
  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      dirs.forEach(p => deleteRecursively(p))
    }, "graft-scratch-cleanup"))

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    try {
      val walk = java.nio.file.Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach { f =>
          try { java.nio.file.Files.deleteIfExists(f); () }
          catch { case _: Exception => () }
        }
      finally walk.close()
    } catch { case _: Exception => () }

  /** Create a fresh temp directory that will be removed (recursively)
    * when this JVM exits. */
  def dir(prefix: String): String = {
    hookInstalled
    val p = java.nio.file.Files.createTempDirectory(prefix)
    dirs.add(p)
    p.toString
  }
}
