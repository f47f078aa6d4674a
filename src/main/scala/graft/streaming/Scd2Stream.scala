package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Streaming SCD-2 materialization — the continuous form of `ops.Cdc.scd2`
  * (round-11 verdict item 5): the CDC family's interval half. Where
  * `CdcStream.latestSnapshotStream` compacts a changelog to per-entity
  * LATEST state, this maintains the full slowly-changing-dimension type-2
  * interval table: every change version carries
  * [`effective_from`, `effective_to`) with the open latest flagged
  * `is_current`, and each new change CLOSES the previously-open interval
  * and opens its own — including a change that arrives out of order and
  * must split an interval mid-history (close the predecessor at the late
  * row's time, point the late row at the old successor).
  *
  * Shape and scale:
  *   - per-entity state is the version list STILL MUTABLE under the
  *     watermark: a version whose successor's time is already behind the
  *     watermark can never gain a new successor-side neighbor (any row that
  *     would insert before that successor is watermark-late and dropped
  *     before the operator — the D2 contract), so the state prunes to a
  *     suffix of length O(change rate × watermark delay) + 1 per entity,
  *     independent of history length; the full history lives only in the
  *     serving table.
  *   - update mode: a micro-batch re-emits exactly the interval rows it
  *     changed — each inserted/replaced version plus the predecessor whose
  *     `effective_to` it moved. The JDBC sink upserts by
  *     (keys, tiebreak, effective_from) via the same executor-side
  *     DELETE+INSERT transaction as `CdcStream.upsertJdbc`; micro-batch
  *     replay after a restart repeats the same upserts — idempotent.
  *   - a duplicate (time, tiebreak) arrival REPLACES its version (the
  *     AsOfStream equal-time convention), so at-least-once upstream
  *     delivery cannot duplicate history; `tiebreak` must be unique within
  *     (keys, time) — the batch operator's exact contract. If two DIFFERENT
  *     payloads share (time, tiebreak) inside one micro-batch the winner is
  *     a deterministic total order on the payload (see `step`), never the
  *     group-iterator order.
  *
  * Event time is epoch-millis (`__time__` convention); TimestampType
  * columns are normalized via `unix_millis` (the AsOfStream rule — a bare
  * long cast would coarsen to seconds). `effective_from`/`effective_to`
  * are therefore BIGINT ms: equal to batch `Cdc.scd2` output whenever
  * `tsCol` is already the engine's BIGINT ms event time (Scd2StreamSpec
  * asserts stream == batch over the full log, disorder included).
  */
object Scd2Stream {

  /** One micro-batch step, pure for unit testing. `versions` is the
    * time-sorted state, `incoming` this batch's arrivals (each (timeMs,
    * payload)); `tbOf` reads the tiebreak from a payload row. Returns
    * (changed indices into the merged list — the rows to re-emit,
    * merged version list, evictable prefix length under `wm`).
    * The caller emits first, then drops the prefix.
    */
  def step(
      versions: IndexedSeq[(Long, Row)],
      incoming: Seq[(Long, Row)],
      wm: Long,
      tbOf: Row => Any): (Seq[Int], IndexedSeq[(Long, Row)], Int) = {
    def cmp(a: Any, b: Any): Int =
      if (a == null || b == null)
        throw new IllegalArgumentException("scd2Stream: null tiebreak")
      else a.asInstanceOf[Comparable[Any]].compareTo(b)
    implicit val ord: Ordering[(Long, Row)] = new Ordering[(Long, Row)] {
      def compare(x: (Long, Row), y: (Long, Row)): Int = {
        val c = java.lang.Long.compare(x._1, y._1)
        if (c != 0) c else cmp(tbOf(x._2), tbOf(y._2))
      }
    }
    def key(v: (Long, Row)) = (v._1, tbOf(v._2))
    val oldKeys = versions.iterator.map(key).toSet
    // Same-(t,tb) arrivals within one batch dedup to ONE winner, chosen by a
    // total order on the rendered payload (lexicographic max) — NOT iterator
    // order, which is shuffle-partition-order dependent and could flip
    // between two different payloads across micro-batch replays. With
    // at-least-once upstream delivery the duplicates are byte-identical and
    // the choice is moot; when they genuinely differ the winner is at least
    // replay-stable.
    val dedupIn = incoming.foldLeft(Map.empty[(Long, Any), (Long, Row)]) {
      (m, v) =>
        val k = key(v)
        m.get(k) match {
          case Some(prev) if prev._2.toString >= v._2.toString => m
          case _ => m.updated(k, v)
        }
    }
    val inKeys = dedupIn.keySet
    val newKeys = inKeys.filterNot(oldKeys)
    val merged = (versions.filterNot(v => inKeys(key(v))) ++ dedupIn.values)
      .sorted.toIndexedSeq
    val changed = merged.indices.filter { i =>
      inKeys(key(merged(i))) ||
        (i + 1 < merged.length && newKeys(key(merged(i + 1))))
    }
    // evictable prefix: successor already strictly behind the watermark
    var evict = 0
    while (evict + 1 < merged.length && merged(evict + 1)._1 < wm) evict += 1
    (changed, merged, evict)
  }

  /** The update-mode stream of changed interval rows: all input columns ++
    * (effective_from, effective_to, is_current). Downstream must use
    * `outputMode("update")`; upsert key = (keys, tiebreak, effective_from).
    */
  def scd2Stream(
      changes: DataFrame,
      keys: Seq[String],
      tsCol: String,
      tiebreak: String,
      watermarkDelay: String = "10 seconds"): DataFrame = {
    val cols = changes.columns.toSeq
    val streaming = changes.isStreaming
    val keySchema = StructType(keys.map(k => changes.schema(k)).toArray)
    val paySchema = StructType(cols.filterNot(keys.contains).map(c => changes.schema(c)).toArray)
    val stateSchema = StructType(Seq(StructField("vs", ArrayType(StructType(Seq(
      StructField("t", LongType), StructField("v", paySchema)))))))
    val outSchema = StructType(
      (keys.map(k => changes.schema(k)) ++ paySchema.fields ++ Seq(
        StructField("effective_from", LongType, nullable = false),
        StructField("effective_to", LongType, nullable = true),
        StructField("is_current", BooleanType, nullable = false))).toArray)
    val keyEnc: Encoder[Row] = Encoders.row(keySchema)
    val stateEnc: Encoder[Row] = Encoders.row(stateSchema)
    val outEnc: Encoder[Row] = Encoders.row(outSchema)

    val toMillis: Column = changes.schema(tsCol).dataType match {
      case TimestampType => unix_millis(col(tsCol))
      case _ => col(tsCol).cast("long")
    }
    val payCols = cols.filterNot(keys.contains)
    val tbIdx = payCols.indexOf(tiebreak)
    require(tbIdx >= 0, s"scd2Stream: tiebreak '$tiebreak' must be a non-key column")
    val tagged = changes.select(
      struct(keys.map(col): _*).as("__k"),
      toMillis.as("__t"),
      struct(payCols.map(col): _*).as("__v"))
      .withColumn("__eventTime", timestamp_millis(col("__t")))
    val watermarked =
      if (streaming) tagged.withWatermark("__eventTime", watermarkDelay) else tagged

    val func = (k: Row, it: Iterator[Row], state: GroupState[Row]) => {
      val wm = if (streaming) state.getCurrentWatermarkMs() else Long.MinValue
      val incoming = it.map(r => (r.getLong(1), r.getStruct(2))).toSeq
      val versions0 = state.getOption
        .map(_.getSeq[Row](0).map(r => (r.getLong(0), r.getStruct(1))).toIndexedSeq)
        .getOrElse(IndexedSeq.empty[(Long, Row)])
      val (changed, merged, evict) = step(versions0, incoming, wm, _.get(tbIdx))
      val out = changed.map { i =>
        val (t, v) = merged(i)
        val to: Any = if (i + 1 < merged.length) merged(i + 1)._1 else null
        Row.fromSeq(k.toSeq ++ v.toSeq ++ Seq(t, to, i == merged.length - 1))
      }
      state.update(Row(merged.drop(evict).map { case (t, v) => Row(t, v) }))
      out.iterator
    }
    // EventTimeTimeout is LOAD-BEARING, not a wake mechanism (no timeout is
    // ever set): FlatMapGroupsWithStateExec drops watermark-late input rows
    // ONLY under EventTimeTimeout. The state eviction in `step` (prefix whose
    // successor is behind the watermark) is sound only if a row older than
    // the watermark never reaches the operator — under NoTimeout it WOULD be
    // processed against the truncated version list, yielding overlapping
    // intervals. Batch path keeps NoTimeout (no watermark exists there).
    val timeoutConf =
      if (streaming) GroupStateTimeout.EventTimeTimeout() else GroupStateTimeout.NoTimeout()
    watermarked
      .groupByKey((r: Row) => r.getStruct(0))(keyEnc)
      .flatMapGroupsWithState[Row, Row](OutputMode.Update(), timeoutConf)(func)(stateEnc, outEnc)
      .select((keys ++ payCols ++ Seq("effective_from", "effective_to", "is_current")).map(col): _*)
  }

  /** The composed materializer: changelog stream → interval maintenance →
    * JDBC upsert keyed (keys, tiebreak, effective_from). The serving table
    * must exist with the output schema.
    */
  def materializeJdbc(
      changes: DataFrame,
      url: String,
      table: String,
      keys: Seq[String],
      tsCol: String,
      tiebreak: String,
      watermarkDelay: String = "10 seconds"): DataStreamWriter[Row] =
    scd2Stream(changes, keys, tsCol, tiebreak, watermarkDelay)
      .writeStream.outputMode("update")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        CdcStream.upsertJdbc(batch, url, table,
          keys ++ Seq(tiebreak, "effective_from"), tombstoneCol = None)
      }
}
