package graft.pipeline

import org.apache.spark.sql.Dataset

/** Lineage truncation for iterative / cache-releasing operators.
  *
  * `localCheckpoint(true)` snapshots a frame to EXECUTOR-LOCAL,
  * non-replicated blocks. That is the right call in local mode (one
  * JVM, nothing to lose; the ContextCleaner frees the blocks when the
  * frame is dropped), but on a real cluster an executor loss — or a
  * dynamic-allocation decommission — makes the snapshotted frame
  * unrecoverable: the lineage that could recompute the lost blocks was
  * exactly what we truncated. [[LineageOps.cutLineage]] therefore
  * upgrades to a RELIABLE `checkpoint` (written to the configured
  * checkpoint dir — HDFS / object store on a cluster — and so immune
  * to executor loss) whenever the session has one configured
  * (`sparkContext.setCheckpointDir`, which any cluster deployment
  * should set), and only falls back to the executor-local form when
  * none is. Both forms are eager and truncate the logical plan to a
  * scan of materialized blocks, so the iterative-loop O(1)-lineage
  * argument is identical either way.
  */
object Lineage {
  implicit final class LineageOps[T](private val ds: Dataset[T]) extends AnyVal {
    /** Eagerly materialize and truncate lineage — reliably when a
      * checkpoint dir is configured, executor-locally otherwise. */
    def cutLineage(): Dataset[T] =
      if (ds.sparkSession.sparkContext.getCheckpointDir.isDefined)
        ds.checkpoint(eager = true)
      else ds.localCheckpoint(true)
  }
}
