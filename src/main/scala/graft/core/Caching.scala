package graft.core

import org.apache.spark.sql.DataFrame

/** Persist-ownership contract for multi-pass helpers.
  *
  * Helpers that cache intermediates they read more than once (recursion
  * frontiers, LSH signatures, IVF cell assignments) must not leak that
  * storage into the caller's session: they materialize their (small)
  * output, then release the intermediates — which at that point are only
  * reachable through the output's lineage.
  *
  * NB: the RETURNED frame is persisted; callers that keep it long-term own
  * its release (`unpersist()` or `spark.catalog.clearCache()`). One-shot
  * callers (the differential queries, Bench) write/collect it immediately
  * and the storage is dropped with the session.
  */
object Caching {

  def materializeAndRelease(out: DataFrame, intermediates: Seq[DataFrame]): DataFrame = {
    val result = out.persist()
    // a failed materialize must release EVERYTHING it pinned — the caller
    // never receives `result`, so nothing else can (helpers run inside
    // repeating ticks; an orphan per failure accumulates)
    try result.count()
    catch {
      case e: Throwable =>
        result.unpersist(blocking = false)
        intermediates.foreach(_.unpersist(blocking = false))
        throw e
    }
    intermediates.foreach(_.unpersist(blocking = false))
    result
  }

  /** Session-scoped scratch space: every staging dir (SequenceFile dumps,
    * stream checkpoints/feeds) lives under ONE per-JVM root removed by a
    * shutdown hook — repeated gate runs must not accumulate /tmp. */
  lazy val scratchRoot: java.nio.file.Path = {
    val root = java.nio.file.Files.createTempDirectory("graft-scratch-")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(root.toFile)))
    root
  }

  def scratchDir(prefix: String): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory(scratchRoot, prefix)

  private def deleteRecursively(f: java.io.File): Unit = {
    // never follow symlinks: staging dirs may link to SOURCE datasets
    // (e.g. the e4 events.parquet link) — delete the link, not the target
    if (f.isDirectory && !java.nio.file.Files.isSymbolicLink(f.toPath))
      Option(f.listFiles).toSeq.flatten.foreach(deleteRecursively)
    f.delete()
    ()
  }
}
