package graft.sources

import java.util.concurrent.atomic.AtomicReference
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast
import graft.Pinned.PinnedOps

/** Periodically-refreshed lookup table with snapshot-consistent reads — the
  * reference's `DimensionTable`/`RdsDimensionTable` capability
  * (sp/dimension/DimensionTable.java:8-58, RdsDimensionTable.java:73-145).
  *
  * Design mapping:
  *   - the reference reloads `SELECT cols FROM t` on a scheduler thread and
  *     publishes a volatile `TableIndex` snapshot; readers must take ONE
  *     snapshot per operation (`curTable()` contract). Here `current()`
  *     returns an immutable pinned DataFrame reference from an
  *     AtomicReference — same contract, and the hash `Index` the reference
  *     builds by hand is what Spark's broadcast hash join builds internally.
  *   - refresh is pull-based with a staleness bound instead of a background
  *     thread: the first `current()` past the interval reloads. (In a
  *     `foreachBatch` streaming loop that is once per micro-batch — the
  *     refresh cadence the reference's scheduler approximates; no threads to
  *     leak on executors.) `refreshNow()` forces a reload for tests/ops.
  *
  * Scale: `enrich` broadcasts the snapshot — a stream–static broadcast join
  * per micro-batch, the standard way to join a 100 TB stream against a small
  * dimension without shuffling the stream.
  */
class DimensionTable(loader: () => DataFrame, refreshIntervalMs: Long) {

  private case class Snap(df: DataFrame, loadedAt: Long)
  private val snap = new AtomicReference[Snap](null)

  /** Load + PIN: eager pin (graft.Pinned) — materializes the rows as block-
    * manager data and CUTS LINEAGE, so the snapshot keeps serving even if
    * the source is rewritten mid-operation. (persist() is not enough:
    * writing over the source path re-caches by path and re-reads.) The
    * reference's snapshot is an in-memory Table for exactly this reason
    * (DimensionTable.java:27-50). On block loss the next refresh reloads —
    * the same recovery a scheduled reload gives the reference.
    */
  private def load(now: Long): Snap =
    Snap(loader().pinned(true), now)

  /** Pinned snapshot; reloads at most once per interval. Callers must hold
    * the returned value for the whole operation (curTable() contract,
    * DimensionTable.java:27-50).
    */
  def current(): DataFrame = {
    val now = System.currentTimeMillis()
    val s = snap.get()
    if (s == null || now - s.loadedAt >= refreshIntervalMs) {
      val fresh = load(now)
      snap.compareAndSet(s, fresh) // lose the race → someone else refreshed
    }
    snap.get().df
  }

  def refreshNow(): DataFrame = {
    snap.set(load(System.currentTimeMillis()))
    snap.get().df
  }

  /** Left-join a (micro-)batch against the pinned snapshot via broadcast —
    * the reference's stream `leftJoin(dim)` (Top100Test.java:151-167).
    */
  def enrich(batch: DataFrame, keys: Seq[String], joinType: String = "left"): DataFrame =
    batch.join(broadcast(current()), keys, joinType)
}

object DimensionTable {
  /** Dimension from a path re-read (parquet warehouse table — the
    * OdpsDimensionTable shape, sp/dimension/OdpsDimensionTable.java:33-192).
    */
  def fromPath(spark: org.apache.spark.sql.SparkSession, path: String,
      refreshIntervalMs: Long = 60000L): DimensionTable =
    new DimensionTable(() => spark.read.parquet(path), refreshIntervalMs)

  /** Dimension from a JDBC query (RdsDimensionTable shape). */
  def fromJdbc(spark: org.apache.spark.sql.SparkSession, url: String, table: String,
      props: java.util.Properties = new java.util.Properties,
      refreshIntervalMs: Long = 60000L): DimensionTable =
    new DimensionTable(() => spark.read.jdbc(url, table, props), refreshIntervalMs)
}
