package graft.util

import java.nio.file.{Files, Path}

/** JVM-scoped scratch directories for operators that need an on-disk
  * store as part of their hard signal (A36 `g_store_diff` writes three
  * GraphStore snapshots per execution). A bare
  * `Files.createTempDirectory` per invocation accrues unbounded /tmp
  * disk across bench reps and rounds (the round-7 advice finding);
  * every issued directory is deleted on JVM exit (shutdown hook), so
  * no run leaves orphans behind.
  *
  * ALL deletion is deferred to the hook. An earlier revision eagerly
  * reclaimed dirs more than 8 generations old, relying on an
  * UNENFORCED contract that callers consume each store before
  * requesting the next — a lazily-evaluated DataFrame over an evicted
  * store would have read a vanished directory (the round-8 advice
  * finding). Exit-time-only cleanup keeps every issued dir readable
  * for the JVM's life; the disk bound is the per-process store count
  * (g_store_diff: 3 small snapshots per execution), which the
  * shutdown hook reclaims in full.
  */
object Scratch {

  private val issued = new java.util.ArrayDeque[Path]()

  /** Deepest-first, stream-closing, best-effort recursive delete —
    * shared by the shutdown hook and callers with their own scratch
    * lifecycle (StreamReplay's per-query checkpoints), so unclosed
    * Files.walk handles don't pile up between GC cycles. */
  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      // deepest-first walk; best-effort (scratch cleanup must never
      // fail the operator that triggered it)
      try {
        val stream = Files.walk(p)
        try stream.sorted(java.util.Comparator.reverseOrder())
          .forEach(q => try Files.deleteIfExists(q) catch { case _: java.io.IOException => () })
        finally stream.close()
      } catch { case _: java.io.IOException => () }
    }

  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      issued.synchronized { issued.forEach(deleteRecursively) },
      "graft-scratch-cleanup"))
  }

  /** A fresh scratch directory under java.io.tmpdir, registered for
    * exit-time cleanup. */
  def dir(prefix: String): Path = issued.synchronized {
    val p = Files.createTempDirectory(prefix)
    issued.addLast(p)
    p
  }
}
