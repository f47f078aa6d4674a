package graft.streaming

import graft.ops.Cdc
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** Streaming changelog materialization — the continuous form of
  * `ops.Cdc.latestSnapshot`: a CDC feed compacted to per-entity latest state
  * by a STATEFUL streaming aggregation, upserted into a JDBC serving table
  * per micro-batch. The tail of the reference's central pipeline (consume →
  * dedupe/compact → emit to MySQL, README.md:59-131), with the compaction
  * done by engine state instead of an external Index.
  *
  * Shape and scale:
  *   - `latestSnapshotStream` is `max_by(payload, ord)` under a streaming
  *     groupBy in UPDATE mode: Spark's aggregation state store holds one
  *     row per entity (state is bounded by ENTITY count, not event count —
  *     for a snapshot that state IS the product, so no watermark eviction:
  *     an entity idle for a month must still hold its last value). Partial
  *     aggregation applies within each micro-batch exactly as in the batch
  *     operator, and update mode re-emits only the keys each batch touched.
  *   - cross-batch out-of-order arrivals are resolved by the state store
  *     (max_by's buffer keeps the winning (ord, payload) pair), so a late
  *     batch carrying an OLDER event for a key cannot regress the snapshot
  *     — asserted in CdcStreamSpec.
  *   - `upsertJdbc` lands each updated key executor-side (foreachPartition,
  *     batched DELETE-then-INSERT per key, single transaction per
  *     partition): nothing collects to the driver. Tombstone winners DELETE
  *     the serving row — entity removal propagates, the part an
  *     append-mode sink cannot express. Micro-batch replay after a restart
  *     re-runs the same DELETE+INSERT per key — idempotent, the
  *     `writeAdmittedCorpus` convention for JDBC.
  */
object CdcStream {

  /** Per-entity latest-state stream: requires `outputMode("update")`.
    * Column contract matches `Cdc.latestSnapshot` (full payload row per
    * key); tombstones are NOT filtered here — the sink must see them to
    * delete, and a tombstone may later be superseded.
    */
  def latestSnapshotStream(
      changes: DataFrame,
      keys: Seq[String],
      ordering: Seq[String]): DataFrame = {
    val payload = struct(changes.columns.map(col).toSeq: _*)
    val ord = struct(ordering.map(col): _*)
    changes
      .groupBy(keys.map(col): _*)
      .agg(max_by(payload, ord).as("__latest"))
      .select(col("__latest.*"))
  }

  /** Executor-side JDBC upsert of one micro-batch of snapshot winners:
    * per row DELETE by key, then INSERT unless `tombstoneCol` is true.
    * One transaction per partition; `batch.persist()` would be redundant —
    * the single pass here is the only action.
    */
  def upsertJdbc(
      batch: Dataset[Row],
      url: String,
      table: String,
      keys: Seq[String],
      tombstoneCol: Option[String]): Unit = {
    val cols = batch.columns.toSeq
    // identifiers are interpolated into SQL text: reject anything that is not
    // a plain identifier so a hostile column/table name can't smuggle SQL
    (table +: cols).foreach { id =>
      require(id.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"upsertJdbc: '$id' is not a plain SQL identifier ([A-Za-z_][A-Za-z0-9_]*)")
    }
    val keyIdx = keys.map(cols.indexOf)
    require(keyIdx.forall(_ >= 0), s"keys $keys must be columns of the batch ($cols)")
    val tombIdx = tombstoneCol.map(cols.indexOf)
    tombIdx.foreach(i => require(i >= 0, s"tombstone column $tombstoneCol missing"))
    batch.foreachPartition { (rows: Iterator[Row]) =>
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        conn.setAutoCommit(false)
        val del = conn.prepareStatement(
          s"DELETE FROM $table WHERE ${keys.map(k => s"$k = ?").mkString(" AND ")}")
        val ins = conn.prepareStatement(
          s"INSERT INTO $table (${cols.mkString(", ")}) VALUES (${cols.map(_ => "?").mkString(", ")})")
        rows.foreach { r =>
          keyIdx.zipWithIndex.foreach { case (ci, pi) => del.setObject(pi + 1, r.get(ci)) }
          del.addBatch()
          // a null tombstone value is "not a tombstone", not an NPE
          if (!tombIdx.exists(i => !r.isNullAt(i) && r.getBoolean(i))) {
            cols.indices.foreach(ci => ins.setObject(ci + 1, r.get(ci)))
            ins.addBatch()
          }
        }
        del.executeBatch()
        ins.executeBatch()
        conn.commit()
      } finally conn.close()
    }
  }

  /** The composed materializer: changelog stream → stateful compaction →
    * JDBC upsert. The serving table must exist (`Sinks.createTableDdl`).
    */
  def materializeJdbc(
      changes: DataFrame,
      url: String,
      table: String,
      keys: Seq[String],
      ordering: Seq[String],
      tombstoneCol: Option[String] = None): DataStreamWriter[Row] =
    latestSnapshotStream(changes, keys, ordering)
      .writeStream.outputMode("update")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        upsertJdbc(batch, url, table, keys, tombstoneCol)
      }
}
