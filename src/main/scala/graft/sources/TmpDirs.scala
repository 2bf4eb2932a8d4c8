package graft.sources

/** JVM-exit cleanup for the per-process scratch dirs the format-roundtrip
  * queries write (q36 ORC, q38 bucketed tables, q41 JSONL, the streaming
  * stage dirs): each run writes under a pid-suffixed path — collision-free
  * across concurrent JVMs — and registers it here so repeated
  * Verify/Bench invocations do not accumulate dead copies in /tmp (the
  * round-5 advisor finding, closed for every scratch writer).
  */
object TmpDirs {
  private val registered = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  @volatile private var hooked = false

  /** Register `dir` for recursive deletion at JVM exit; returns `dir`. */
  def scratch(dir: String): String = {
    if (registered.add(dir) && !hooked) synchronized {
      if (!hooked) {
        Runtime.getRuntime.addShutdownHook(new Thread(() => {
          registered.forEach(d => deleteRecursively(java.nio.file.Paths.get(d)))
        }, "graft-tmp-cleanup"))
        hooked = true
      }
    }
    dir
  }

  /** Delete `dir` NOW (and unregister it). For per-run sinks whose
    * consumers are fully materialized (localCheckpoint) before return:
    * corpus-shaped indexes (n31's dc, n33's dp) should not wait for the
    * shutdown hook — a multi-pass bench otherwise accumulates one copy
    * per pass in /tmp and skews the tmp_mb probe (ADVICE r15). The
    * shutdown hook remains the backstop for dirs never purged.
    */
  def purge(dir: String): Unit = {
    registered.remove(dir)
    deleteRecursively(java.nio.file.Paths.get(dir))
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    try {
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        val walk = java.nio.file.Files.walk(p)
        val files =
          try walk.iterator().asScala.toSeq.reverse
          finally walk.close() // the walk holds directory handles until closed
        files.foreach(f => java.nio.file.Files.deleteIfExists(f))
      }
    } catch { case _: Exception => () } // exit path: best-effort only
}
