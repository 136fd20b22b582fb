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

  /** Release a frame pinned by persist() OR localCheckpoint().
    *
    * The two pin mechanisms need DIFFERENT releases, and each one's
    * release breaks the other:
    *  - a localCheckpoint's storage lives on the checkpointed RDD
    *    itself, which the CacheManager never sees — Dataset.unpersist
    *    on such a frame frees nothing, so iterative loops accumulate a
    *    corpus copy per round until driver GC + ContextCleaner catch
    *    up (the round-12 review finding). The release is
    *    `LogicalRDD.rdd.unpersist`.
    *  - conversely, calling Dataset.unpersist alongside is NOT a
    *    harmless no-op there: uncacheQuery matches cached entries by
    *    NORMALIZED plan, under which distinct checkpoint generations of
    *    the same loop compare equal — measured in DataOpsSpec's
    *    dupClusters tests, it invalidated the LIVE round's checkpoint
    *    blocks while releasing the previous round's
    *    (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND on the next iteration).
    * Only call once the last consumer of the frame has materialized:
    * a localCheckpoint has no lineage to recompute from. */
  def free(df: DataFrame): Unit = df.queryExecution.logical match {
    case lr: org.apache.spark.sql.execution.LogicalRDD =>
      lr.rdd.unpersist(blocking = false)
    case _ => df.unpersist(blocking = false)
  }

  def materializeAndRelease(out: DataFrame, intermediates: Seq[DataFrame]): DataFrame = {
    val result = out.persist()
    // a failed materialize must release EVERYTHING it pinned — the caller
    // never receives `result`, so nothing else can (helpers run inside
    // repeating ticks; an orphan per failure accumulates)
    try result.count()
    catch {
      case e: Throwable =>
        result.unpersist(blocking = false)
        intermediates.foreach(free)
        throw e
    }
    intermediates.foreach(free)
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

  def deleteRecursively(f: java.io.File): Unit = {
    // never follow symlinks: staging dirs may link to SOURCE datasets
    // (e.g. the e4 events.parquet link) — delete the link, not the target
    if (f.isDirectory && !java.nio.file.Files.isSymbolicLink(f.toPath))
      Option(f.listFiles).toSeq.flatten.foreach(deleteRecursively)
    f.delete()
    ()
  }
}
