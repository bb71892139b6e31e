package graft.util

import java.nio.file.{Files, Path}

/** Scratch directories for queries that materialize intermediates
  * (snapshot layouts, signature tables, stream inputs). Every directory is
  * registered for recursive deletion at JVM exit, so repeated
  * bench/verify invocations in one process don't accumulate unbounded
  * /tmp usage (each invocation still gets a FRESH dir — overwrite-in-place
  * would race the readers of a previous invocation's plan).
  */
object Scratch {

  private val registered = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    registered.forEach { p =>
      try {
        if (Files.exists(p)) {
          val walk = Files.walk(p)
          try walk.sorted(java.util.Comparator.reverseOrder())
            .forEach(f => { try Files.delete(f) catch { case _: Exception => () } })
          finally walk.close()
        }
      } catch { case _: Exception => () }
    }
  }))

  /** A fresh scratch directory, deleted recursively at JVM exit. */
  def dir(tag: String): String = {
    val p = Files.createTempDirectory(s"graft_$tag")
    registered.add(p)
    p.toFile.getAbsolutePath
  }
}
