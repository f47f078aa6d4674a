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
  *     checkpoint directory. Blocks become FILES: executor loss costs a
  *     re-read, not a job restart, matching the reference's fault model
  *     where shuffle loss is a task-level retry, not a job-level one
  *     (reference: sp/Rehash.java:224-291 retries at the network layer).
  *     The input is persisted MEMORY_AND_DISK around the checkpoint so the
  *     checkpoint write job reads cached blocks instead of recomputing the
  *     whole plan (RDD.checkpoint's documented second computation), then
  *     unpersisted — unless the caller already cached the same plan, in
  *     which case the pair is skipped so the pin never evicts a cache it
  *     does not own (CacheManager matches by logical plan, so an
  *     unconditional unpersist here would drop the caller's blocks too).
  *
  * Reliable mode needs a checkpoint dir EVERY EXECUTOR CAN READ. The
  * resolution order: (1) `sc.setCheckpointDir(...)` if the application
  * already set one; (2) the `graft.pin.dir` runtime conf; (3) on a
  * single-box master only (`local[*]` / `local-cluster[...]`, where every
  * executor JVM shares one filesystem), a `java.io.tmpdir` fallback. On a
  * distributed master there is NO fallback — pin() fails fast instead,
  * because a driver-local tmp path silently becomes per-NODE /tmp: each
  * executor writes its own checkpoint part files locally, the post-loss
  * re-read on a different node hits missing files, and the "reliable" mode
  * dies exactly when it was supposed to save the job (Spark itself merely
  * logs a warning). Cluster recipe:
  * `spark.sparkContext.setCheckpointDir("hdfs://.../graft-pins")` (or
  * `--conf graft.pin.dir=<DFS path>`) before the first pin.
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

  /** Resolve the checkpoint dir for a reliable pin when the SparkContext has
    * none set: `graft.pin.dir` if given; otherwise a java.io.tmpdir fallback
    * ONLY when every executor shares this box's filesystem (`local[*]` /
    * `local-cluster[...]`). A distributed master with neither source fails
    * fast — see the class scaladoc for why per-node /tmp is data-loss-shaped
    * there. Factored out of [[pin]] so the refusal is testable without a
    * real cluster.
    */
  private[graft] def resolveCheckpointDir(
      master: String,
      isLocal: Boolean,
      applicationId: String,
      confDir: Option[String]): String = confDir.getOrElse {
    require(isLocal || master.startsWith("local-cluster"),
      s"$ReliableKey=true on master '$master' requires a checkpoint dir " +
        "visible to every executor: call SparkContext.setCheckpointDir" +
        s"(<DFS path>) or set $DirKey. Refusing the java.io.tmpdir " +
        "fallback — on a cluster it resolves to per-node /tmp, so " +
        "executors checkpoint to files no other node can read and " +
        "recovery fails exactly when an executor is lost.")
    new java.io.File(sys.props("java.io.tmpdir"), s"graft-pins-$applicationId")
      .getAbsolutePath
  }

  def pin[T](ds: Dataset[T], eager: Boolean): Dataset[T] = {
    val spark = ds.sparkSession
    val reliable =
      spark.conf.getOption(ReliableKey).exists(_.trim.equalsIgnoreCase("true"))
    if (!reliable) ds.localCheckpoint(eager)
    else {
      val sc = spark.sparkContext
      if (sc.getCheckpointDir.isEmpty)
        sc.setCheckpointDir(resolveCheckpointDir(
          sc.master, sc.isLocal, sc.applicationId, spark.conf.getOption(DirKey)))
      // Dataset.storageLevel consults the session CacheManager by logical
      // plan — non-NONE means the CALLER (or an equivalent plan elsewhere)
      // already holds a cache entry, and persist/unpersist here would evict
      // it out from under them. Their blocks serve the checkpoint read just
      // as well, so only wrap when no entry exists.
      val preCached = ds.storageLevel != StorageLevel.NONE
      if (!preCached) ds.persist(StorageLevel.MEMORY_AND_DISK)
      try ds.checkpoint(eager = true)
      finally if (!preCached) ds.unpersist(blocking = false)
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
