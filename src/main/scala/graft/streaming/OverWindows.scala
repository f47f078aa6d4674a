package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming trailing-frame over-windows — the one operator family Spark has
  * no built-in for (no streaming OVER), and the genuinely custom stateful
  * code in this engine (SURVEY §4.2).
  *
  * Reference semantics re-expressed:
  *   - `OverWindowByDuration` (window/OverWindowByDuration.java:29-98,
  *     InThreadOverWindow.java:18-105): per row, aggregate over the trailing
  *     event-time frame `(t - size, t]` of the same key; rows older than the
  *     frame of the newest row are evicted from state.
  *   - `OverWindowBySize` (window/OverWindowBySize.java:32-98): per row,
  *     aggregate over the last N rows of the key (arrival order within key,
  *     FIFO eviction beyond N).
  *
  * Implementation: `flatMapGroupsWithState` over a per-key sorted buffer —
  * Spark's state store supplies exactly what the reference hand-built with
  * `SlideTable`/`SortedTable` (SlideTableByColumn.java:10-163): durable
  * per-key ordered state with eviction. State stays O(frame) per key; keys
  * distribute across executors by hash — the 1000-executor layout is the
  * same plan with more partitions.
  *
  * Works identically on batch Datasets via `flatMapGroups` (used by the
  * specs to cross-check against `WindowsBatch`'s SQL-window formulation).
  */
object OverWindows {

  case class Event(key: Long, time: Long, value: Double)
  case class OverOut(key: Long, time: Long, value: Double, n: Long, sum: Double, min: Double, max: Double)

  /** Per-key state: `rows` = already-final frame context (time-sorted),
    * `pend` = the reorder buffer — arrivals the watermark has not yet
    * passed, whose frames are not final (an equal-or-earlier-time peer may
    * still legally arrive in a later micro-batch).
    */
  case class Buffer(rows: List[Event], pend: List[Event])

  private def stats(frame: Seq[Event], e: Event): OverOut = {
    var n = 0L; var sum = 0.0
    var mn = Double.PositiveInfinity; var mx = Double.NegativeInfinity
    frame.foreach { r =>
      n += 1; sum += r.value
      if (r.value < mn) mn = r.value
      if (r.value > mx) mx = r.value
    }
    OverOut(e.key, e.time, e.value, n, sum, mn, mx)
  }

  /** One drain step for the duration frame: `ripe` events (watermark-final,
    * already in (time, value) order) are merged with the retained frame
    * context and emitted with frame = rows of the key with time in
    * (t - sizeMs, t]. Retained context = rows a FUTURE event could still
    * frame: future arrivals have time >= wm, so only rows with
    * time > wm - sizeMs survive.
    *
    * Frame bounds come from binary search over the time-sorted buffer —
    * O((b+s)·log) per batch instead of O(b·s) — the same structure the
    * reference's `SortedTable.countLessThan` gives its windows
    * (SortedTableByTimeTest.java:13-60, SlideTableByColumn.java:64-126).
    */
  private[streaming] def durationStep(sizeMs: Long)(
      history: List[Event], ripe: Seq[Event], wm: Long): (Seq[OverOut], List[Event]) = {
    val all = (history ++ ripe).sortBy(e => (e.time, e.value)).toIndexedSeq
    val times = all.map(_.time)
    val out = ripe.map { e =>
      stats(all.slice(
        ReorderBuffer.upperBound(times, e.time - sizeMs),
        ReorderBuffer.upperBound(times, e.time)), e)
    }
    val kept =
      if (wm == Long.MaxValue) Nil // batch: nothing can still arrive
      else all.drop(ReorderBuffer.upperBound(times, wm - sizeMs)).toList
    (out, kept)
  }

  /** One drain step for the count frame: emit stats over the trailing
    * `n` rows (by (time, value) order within the key — all history rows
    * precede all ripe rows in time, so appending preserves the order),
    * keep only the last n-1 rows as future-frame context.
    */
  private[streaming] def sizeStep(n: Int)(
      history: List[Event], ripe: Seq[Event], wm: Long): (Seq[OverOut], List[Event]) = {
    var window = history.toVector
    val out = ripe.map { e =>
      window = (window :+ e).takeRight(n)
      stats(window, e)
    }
    (out, window.takeRight(n - 1).toList)
  }

  /** Event plus the TimestampType column the watermark is declared on.
    * (Public: encoder codegen can't construct private classes.)
    */
  case class TsEvent(key: Long, time: Long, value: Double, eventTime: java.sql.Timestamp)

  /** Default reorder/lateness bound — same 1 s the reference uses for its
    * watermark reorder buffer (window/TimeWindow.java:32).
    */
  val DefaultWatermark = "1 second"

  /** Stateful runner: ReorderBuffer drain (STRICT maturity — a frame
    * includes equal-time peers, so an event's row is final only once the
    * watermark is strictly past its own time) + watermark-driven state
    * expiry.
    *
    * Per-row frames are computed in EVENT-TIME order once the watermark
    * passes each event — the reference's watermark reorder-buffer semantics
    * (window/TimeWindow.java:72-136) — so an older event arriving in a
    * LATER micro-batch (legal within the allowed lateness) lands in the
    * frames of every event that follows it, and the emitted rows equal the
    * batch formulation bit-for-bit for ANY admissible arrival order
    * (ReorderLawSpec). The cost is emission latency of about the watermark
    * delay — the same trade Spark's own append-mode windowed aggregates
    * make, and the trade the reference makes inside its windows.
    *
    * The reference drops a key's per-partition window table once it drains
    * (window/OverWindowByDuration.java:29-98 eviction); here the equivalent
    * is an `EventTimeTimeout`: with events pending the timeout fires when
    * the watermark can mature the earliest one, otherwise it is an idle-GC
    * horizon at `lastEventTime + expireMs`. Without the GC, a churning key
    * space (user_id at 100 TB) grows state without bound — idle keys would
    * pin their last frame forever.
    *
    * Late rows (behind `watermarkDelay`) are dropped by the exec, matching
    * the documented D2 late-row contract.
    */
  private def runStateful(
      events: Dataset[Event],
      step: (List[Event], Seq[Event], Long) => (Seq[OverOut], List[Event]),
      expireMs: Long,
      watermarkDelay: String,
      heartbeat: Option[DataFrame]): Dataset[OverOut] = {
    import events.sparkSession.implicits._
    implicit val foldOrder: Ordering[Event] = Ordering.by(e => (e.time, e.value))
    if (!events.isStreaming) {
      // Batch execution: the whole key arrives in one call; wm = MaxValue
      // ripens everything and no frame context needs to survive.
      events
        .groupByKey(_.key)
        .flatMapGroupsWithState[Buffer, OverOut](
          OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
          (_: Long, it: Iterator[Event], state: GroupState[Buffer]) =>
            val (ripe, _) = ReorderBuffer.drain(Nil, it, Long.MaxValue, (_: Event).time, strict = true)
            step(Nil, ripe, Long.MaxValue)._1.iterator
        }
    } else {
      // Heartbeat rows (D3 noDataDelay) advance the watermark through the
      // shared pinned-above-the-watermark filter, so pending reorder-buffer
      // rows mature during input silence — then never reach the state op.
      StreamWindows.watermarked(
        events.withColumn("eventTime", timestamp_millis(col("time"))),
        "eventTime", watermarkDelay, heartbeat)
        .as[TsEvent]
        .groupByKey(_.key)
        .flatMapGroupsWithState[Buffer, OverOut](
          OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
          (_: Long, it: Iterator[TsEvent], state: GroupState[Buffer]) =>
            val wm = state.getCurrentWatermarkMs()
            val prev = state.getOption.getOrElse(Buffer(Nil, Nil))
            val incoming =
              if (state.hasTimedOut) Iterator.empty[Event]
              else it.map(t => Event(t.key, t.time, t.value))
            val (ripe, wait) =
              ReorderBuffer.drain(prev.pend, incoming, wm, (_: Event).time, strict = true)
            if (state.hasTimedOut && ripe.isEmpty && wait.isEmpty) {
              // Pure idle-GC firing: the watermark passed the expiry horizon
              // with nothing pending — no future row can still frame this
              // key's rows.
              state.remove()
              Iterator.empty
            } else {
              val (out, kept) = step(prev.rows, ripe, wm)
              if (kept.isEmpty && wait.isEmpty) state.remove()
              else {
                state.update(Buffer(kept, wait))
                val idleAt =
                  if (kept.isEmpty) wm + expireMs
                  else kept.iterator.map(_.time).max + expireMs
                state.setTimeoutTimestamp(
                  ReorderBuffer.wakeAt(wait.map(_.time), wm, strict = true, orElse = idleAt))
              }
              out.iterator
            }
        }
    }
  }

  /** The event-time column name a `heartbeat` DataFrame must carry (e.g.
    * `StreamWindows.heartbeatRate(spark, OverWindows.HeartbeatTs)`) for the
    * D3 idle-advance: heartbeat rows move the watermark during input
    * silence — maturing buffered rows and expiring idle keys — and are
    * filtered before the state operator.
    */
  val HeartbeatTs = "eventTime"

  /** Streaming RANGE BETWEEN (size-1) PRECEDING AND CURRENT ROW.
    * State for a key expires once the watermark passes its newest row + size.
    */
  def byDuration(
      events: Dataset[Event],
      sizeMs: Long,
      watermarkDelay: String = DefaultWatermark,
      heartbeat: Option[DataFrame] = None): Dataset[OverOut] =
    runStateful(events, durationStep(sizeMs), sizeMs, watermarkDelay, heartbeat)

  /** Streaming ROWS BETWEEN (n-1) PRECEDING AND CURRENT ROW.
    * Count frames have no intrinsic duration, so idle keys expire after
    * `idleTimeoutMs` of event-time silence (default 1 h).
    */
  def bySize(
      events: Dataset[Event],
      n: Int,
      idleTimeoutMs: Long = 3600000L,
      watermarkDelay: String = DefaultWatermark,
      heartbeat: Option[DataFrame] = None): Dataset[OverOut] =
    runStateful(events, sizeStep(n), idleTimeoutMs, watermarkDelay, heartbeat)

  /** Batch equivalents via flatMapGroups — same step functions, no state
    * (whole key group in one call). Used to cross-check streaming results.
    */
  def byDurationBatch(events: Dataset[Event], sizeMs: Long): Dataset[OverOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key).flatMapGroups { (_: Long, it: Iterator[Event]) =>
      durationStep(sizeMs)(Nil, it.toVector.sortBy(e => (e.time, e.value)), Long.MaxValue)._1.iterator
    }
  }

  def bySizeBatch(events: Dataset[Event], n: Int): Dataset[OverOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key).flatMapGroups { (_: Long, it: Iterator[Event]) =>
      sizeStep(n)(Nil, it.toVector.sortBy(e => (e.time, e.value)), Long.MaxValue)._1.iterator
    }
  }

  /** Adapter from a raw events DataFrame (key/time/value columns). */
  def fromDf(df: DataFrame, key: String, time: String, value: String): Dataset[Event] = {
    import df.sparkSession.implicits._
    df.select(col(key).cast("long").as("key"), col(time).cast("long").as("time"),
      col(value).cast("double").as("value")).as[Event]
  }
}
