package graft

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Lineage-cut "pin" with a selectable durability mode — THE materialization
  * primitive for every iterative / multi-consumer operator in the engine
  * (BPE rounds, k-means Lloyd steps, large-star/small-star CC, the
  * semanticDedup normalized projection, …). A pin must cut lineage (the
  * iterative plans grow without bound otherwise) and materialize once for
  * N consumers; the two modes trade how the materialized blocks survive
  * executor loss:
  *
  *   - default (`graft.pin.reliable` unset/false): `localCheckpoint` —
  *     blocks live in executor storage memory/disk, zero extra I/O. Fast,
  *     but BY CONTRACT Spark does not recompute lost local checkpoints:
  *     losing an executor mid-job is terminal for the query (demonstrated
  *     in FETCHFAIL_evidence.log — q_dedup_prefix died on
  *     STAGE_MATERIALIZATION_MULTIPLE_FAILURES after an executor kill).
  *     The right default for a single JVM, where "executor loss" == "the
  *     whole process died anyway".
  *
  *   - reliable (`graft.pin.reliable=true`): `Dataset.checkpoint` to the
  *     checkpoint directory (`graft.pin.dir` if the SparkContext has none
  *     set — on a cluster this must be a DFS path visible to every
  *     executor). Blocks become FILES: executor loss costs a re-read, not
  *     a job restart, matching the reference's fault model where shuffle
  *     loss is a task-level retry, not a job-level one (reference:
  *     sp/Rehash.java:224-291 retries at the network layer). The input is
  *     persisted MEMORY_AND_DISK around the checkpoint so the checkpoint
  *     write job reads cached blocks instead of recomputing the whole plan
  *     (RDD.checkpoint's documented second computation), then unpersisted.
  *
  * Reliable mode is always EAGER (the write is the pin); the `eager` flag
  * only controls the localCheckpoint path, where laziness lets plan-only
  * consumers (PlanDump) build without executing. At 100 TB the conf to set
  * alongside is `spark.cleaner.referenceTracking.cleanCheckpoints=true` so
  * checkpoint files of GC'd plans are reaped during long multi-pin jobs.
  */
object Pinned {

  /** Runtime conf key selecting the reliable mode. */
  val ReliableKey = "graft.pin.reliable"

  /** Runtime conf key for the checkpoint dir used when the SparkContext has
    * none set (single-box convenience; clusters should `setCheckpointDir`
    * to a DFS path themselves).
    */
  val DirKey = "graft.pin.dir"

  def pin[T](ds: Dataset[T], eager: Boolean): Dataset[T] = {
    val spark = ds.sparkSession
    val reliable =
      spark.conf.getOption(ReliableKey).exists(_.trim.equalsIgnoreCase("true"))
    if (!reliable) ds.localCheckpoint(eager)
    else {
      val sc = spark.sparkContext
      if (sc.getCheckpointDir.isEmpty) {
        val dir = spark.conf.getOption(DirKey).getOrElse(
          new java.io.File(sys.props("java.io.tmpdir"), s"graft-pins-${sc.applicationId}")
            .getAbsolutePath)
        sc.setCheckpointDir(dir)
      }
      ds.persist(StorageLevel.MEMORY_AND_DISK)
      try ds.checkpoint(eager = true)
      finally ds.unpersist(blocking = false)
    }
  }

  /** `df.pinned(eager)` — call-site syntax for [[pin]]. Named `pinned` (not
    * `pin`) to stay visually distinct from the streaming watermark-pin idiom
    * (`graft.streaming.Pin.keep`).
    */
  implicit final class PinnedOps[T](private val ds: Dataset[T]) extends AnyVal {
    def pinned(eager: Boolean = true): Dataset[T] = Pinned.pin(ds, eager)
  }
}
