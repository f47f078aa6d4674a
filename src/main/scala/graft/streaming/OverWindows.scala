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
  case class Buffer(rows: List[Event])

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

  /** One micro-batch step for the duration frame: merge, sort, emit one
    * output row per input row (frame = rows of the key with time in
    * (t - sizeMs, t]), evict state older than (maxTime - sizeMs].
    *
    * Frame bounds come from binary search over the time-sorted buffer —
    * O((b+s)·log) per batch instead of O(b·s) — the same structure the
    * reference's `SortedTable.countLessThan` gives its windows
    * (SortedTableByTimeTest.java:13-60, SlideTableByColumn.java:64-126).
    */
  private[streaming] def durationStep(
      sizeMs: Long)(buffered: List[Event], incoming: Iterator[Event]): (Iterator[OverOut], Buffer) = {
    val newEvents = incoming.toVector.sortBy(e => (e.time, e.value))
    val all = (buffered ++ newEvents).sortBy(e => (e.time, e.value)).toIndexedSeq
    val times = all.map(_.time)
    // first index with times(i) > t (upper bound)
    def upperBound(t: Long): Int = {
      var lo = 0; var hi = times.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (times(mid) <= t) lo = mid + 1 else hi = mid
      }
      lo
    }
    val out = newEvents.map { e =>
      stats(all.slice(upperBound(e.time - sizeMs), upperBound(e.time)), e)
    }
    val kept =
      if (all.isEmpty) all
      else all.drop(upperBound(times.last - sizeMs))
    (out.iterator, Buffer(kept.toList))
  }

  /** One micro-batch step for the count frame: emit stats over the trailing
    * `n` rows (by (time, value) order within the key), keep only the last
    * n-1 rows in state.
    */
  private[streaming] def sizeStep(
      n: Int)(buffered: List[Event], incoming: Iterator[Event]): (Iterator[OverOut], Buffer) = {
    val newEvents = incoming.toVector.sortBy(e => (e.time, e.value))
    var window = buffered.toVector
    val out = newEvents.map { e =>
      window = (window :+ e).takeRight(n)
      stats(window, e)
    }
    (out.iterator, Buffer(window.takeRight(n - 1).toList))
  }

  /** Event plus the TimestampType column the watermark is declared on.
    * (Public: encoder codegen can't construct private classes.)
    */
  case class TsEvent(key: Long, time: Long, value: Double, eventTime: java.sql.Timestamp)

  /** Default reorder/lateness bound — same 1 s the reference uses for its
    * watermark reorder buffer (window/TimeWindow.java:32).
    */
  val DefaultWatermark = "1 second"

  /** Stateful runner with watermark-driven state expiry.
    *
    * The reference drops a key's per-partition window table once it drains
    * (window/OverWindowByDuration.java:29-98 eviction); here the equivalent is
    * an `EventTimeTimeout`: each update arms a timeout at
    * `lastEventTime + expireMs`, and when the watermark passes it the key's
    * buffer is removed from the state store. Without this, a churning key
    * space (user_id at 100 TB) grows state without bound — idle keys would
    * pin their last frame forever.
    *
    * Late rows (behind `watermarkDelay`) are dropped by the exec, matching
    * the documented D4 delta for the other streaming windows.
    */
  private def runStateful(
      events: Dataset[Event],
      step: (List[Event], Iterator[Event]) => (Iterator[OverOut], Buffer),
      expireMs: Long,
      watermarkDelay: String): Dataset[OverOut] = {
    import events.sparkSession.implicits._
    if (!events.isStreaming) {
      // Batch execution: the whole key arrives in one call and timeouts never
      // fire, so state bookkeeping is a no-op — keep the simple path.
      events
        .groupByKey(_.key)
        .flatMapGroupsWithState[Buffer, OverOut](
          OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
          (_: Long, it: Iterator[Event], state: GroupState[Buffer]) =>
            val buffered = state.getOption.map(_.rows).getOrElse(Nil)
            val (out, next) = step(buffered, it)
            state.update(next)
            out
        }
    } else {
      events
        .withColumn("eventTime", timestamp_millis(col("time")))
        .withWatermark("eventTime", watermarkDelay)
        .as[TsEvent]
        .groupByKey(_.key)
        .flatMapGroupsWithState[Buffer, OverOut](
          OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
          (_: Long, it: Iterator[TsEvent], state: GroupState[Buffer]) =>
            if (state.hasTimedOut) {
              // Watermark passed lastEventTime + expireMs with no new rows:
              // no future row can still see this frame — drop it.
              state.remove()
              Iterator.empty
            } else {
              val buffered = state.getOption.map(_.rows).getOrElse(Nil)
              val (out, next) =
                step(buffered, it.map(t => Event(t.key, t.time, t.value)))
              if (next.rows.isEmpty) state.remove()
              else {
                state.update(next)
                val lastTime = next.rows.iterator.map(_.time).max
                // Timeout must be strictly later than the current watermark
                // (another key may have advanced it past this key's frame).
                state.setTimeoutTimestamp(
                  math.max(lastTime + expireMs, state.getCurrentWatermarkMs() + 1))
              }
              out
            }
        }
    }
  }

  /** Streaming RANGE BETWEEN (size-1) PRECEDING AND CURRENT ROW.
    * State for a key expires once the watermark passes its newest row + size.
    */
  def byDuration(
      events: Dataset[Event],
      sizeMs: Long,
      watermarkDelay: String = DefaultWatermark): Dataset[OverOut] =
    runStateful(events, durationStep(sizeMs), sizeMs, watermarkDelay)

  /** Streaming ROWS BETWEEN (n-1) PRECEDING AND CURRENT ROW.
    * Count frames have no intrinsic duration, so idle keys expire after
    * `idleTimeoutMs` of event-time silence (default 1 h).
    */
  def bySize(
      events: Dataset[Event],
      n: Int,
      idleTimeoutMs: Long = 3600000L,
      watermarkDelay: String = DefaultWatermark): Dataset[OverOut] =
    runStateful(events, sizeStep(n), idleTimeoutMs, watermarkDelay)

  /** Batch equivalents via flatMapGroups — same step functions, no state
    * (whole key group in one call). Used to cross-check streaming results.
    */
  def byDurationBatch(events: Dataset[Event], sizeMs: Long): Dataset[OverOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key).flatMapGroups { (_: Long, it: Iterator[Event]) =>
      durationStep(sizeMs)(Nil, it)._1
    }
  }

  def bySizeBatch(events: Dataset[Event], n: Int): Dataset[OverOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key).flatMapGroups { (_: Long, it: Iterator[Event]) =>
      sizeStep(n)(Nil, it)._1
    }
  }

  /** Adapter from a raw events DataFrame (key/time/value columns). */
  def fromDf(df: DataFrame, key: String, time: String, value: String): Dataset[Event] = {
    import df.sparkSession.implicits._
    df.select(col(key).cast("long").as("key"), col(time).cast("long").as("time"),
      col(value).cast("double").as("value")).as[Event]
  }
}
