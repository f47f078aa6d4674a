package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Row-emitting event-time window UDFs — the reference's
  * `TimeWindowFunction.transform(key, rows, start, end) → List<rows>`
  * (function/TimeWindowFunction.java:7-11) and `AggTimeWindowFunction`
  * (one row per window, AggTimeWindowFunction.java:7-10), applied to
  * tumbling/hopping/session windows (window/SlideWindow.java:105-383,
  * SessionWindow.java:29-129).
  *
  * Spark's built-in `window()` aggregation returns ONE row per group and only
  * through aggregate functions — a window UDF that sees ALL rows of the
  * window and emits N rows needs custom state (SURVEY §4.2 row 1). Engine:
  *
  *   1. window assignment as COLUMN-level explode (the watermark attribute
  *      must flow unbroken into the stateful operator — a typed flatMap
  *      would sever it);
  *   2. `groupByKey((key, windowStart))` → `flatMapGroupsWithState` with
  *      EventTimeTimeout: rows buffer in state; when the WATERMARK passes
  *      the window end, the state times out, the user function runs over the
  *      complete time-sorted window, its rows are emitted, state is dropped.
  *
  * Session variant implements the REFERENCE's close rule — a session breaks
  * when the gap is ≥ timeout (SessionWindow.java:63-77) — which differs from
  * `session_window()` by 1 ms at the exact boundary (DELTAS.md D5).
  *
  * Scale: state is partitioned by (key, window) — hot keys spread across
  * windows; eviction is watermark-driven like the built-in operator. Late
  * rows beyond the watermark are dropped (DELTAS.md D2).
  */
object WindowedTransform {

  import OverWindows.Event

  case class WinKey(key: Long, ws: Long)
  case class WRow(ws: Long, key: Long, time: Long, value: Double)
  case class WinBuf(rows: List[Event])

  /** Columns (tsCol TimestampType, keyCol, valueCol) → watermarked, window-
    * assigned typed rows. Window starts: `(t/slide - k)*slide, k < size/slide`
    * — the reference's `t/size*size` alignment generalized to hops.
    */
  private def assigned(
      df: DataFrame, tsCol: String, keyCol: String, valueCol: String,
      watermark: String, sizeMs: Long, slideMs: Long): Dataset[WRow] = {
    import df.sparkSession.implicits._
    val hops = sizeMs / slideMs
    df.withWatermark(tsCol, watermark)
      .select(
        explode(expr(
          s"transform(sequence(0, ${hops - 1}), " +
            s"k -> (unix_millis($tsCol) div $slideMs - k) * ${slideMs}L)")).as("ws"),
        col(keyCol).cast("long").as("key"),
        unix_millis(col(tsCol)).as("time"),
        col(valueCol).cast("double").as("value"),
        col(tsCol)) // keep the watermark attribute flowing into the stateful op
      .as[WRow]
  }

  /** Defeat the stateful operator's late-row drop so every row reaches the
    * handler (the `recoverLate` mechanism, shared by slide and session).
    *
    * INTERNAL-CONTRACT PIN (verified on Spark 4.1.2): the stateful exec
    * finds its late-row filter by scanning input attributes for
    * `EventTimeWatermark.delayKey` metadata — an internal Catalyst
    * convention, not public API. If a Spark upgrade changes it, late rows
    * silently drop again; the loud gates are the WindowedTransformSpec and
    * EagerFireSpec recoverLate cases, which feed far-behind-watermark rows
    * and FAIL unless they reach the handler. Re-verify on any Spark bump.
    */
  private def lateProof(base: Dataset[WRow], tsCol: String): Dataset[WRow] = {
    import base.sparkSession.implicits._
    val md = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong(org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark.delayKey, 0L)
      .build()
    base.select(col("ws"), col("key"), col("time"), col("value"),
      // year 9999: never behind any watermark, so nothing is filtered
      timestamp_millis(lit(253402300800000L)).as(tsCol, md)).as[WRow]
  }

  /** Apply `fn(key, windowStart, windowEnd, rowsSortedByTime)` to every
    * closed hopping window; `fn` may emit any number of output rows.
    *
    * `recoverLate = false` (default): rows behind the watermark are dropped —
    * Spark's standard contract (DELTAS.md D2). `recoverLate = true` restores
    * the reference's behavior (SlideWindow.java:345-366, 254-261): a row whose
    * window already fired is NOT dropped; the window function runs over just
    * that row and the result is emitted immediately — one single-element
    * window per late row. Mechanism: the stateful operator locates its
    * late-row filter via the watermark-tagged event-time attribute in its
    * input, so the real one is swapped for a far-future constant carrying the
    * same watermark metadata — the filter never trips, every row reaches the
    * handler (the watermark itself still advances at the upstream watermark
    * node and still drives timeouts), and the handler routes rows of
    * already-fired windows to the singleton-emit branch.
    */
  def slide[O: Encoder](
      df: DataFrame, tsCol: String, keyCol: String, valueCol: String,
      sizeMs: Long, slideMs: Long,
      watermark: String = StreamWindows.DefaultWatermark,
      recoverLate: Boolean = false)(
      fn: (Long, Long, Long, Seq[Event]) => Seq[O]): Dataset[O] = {
    require(sizeMs % slideMs == 0, "size must be a multiple of slide")
    import df.sparkSession.implicits._
    val base = assigned(df, tsCol, keyCol, valueCol, watermark, sizeMs, slideMs)
    val input = if (recoverLate) lateProof(base, tsCol) else base
    input
      .groupByKey(r => WinKey(r.key, r.ws))
      .flatMapGroupsWithState[WinBuf, O](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (wk: WinKey, it: Iterator[WRow], state: GroupState[WinBuf]) =>
          if (state.hasTimedOut) {
            val rows = state.get.rows.sortBy(e => (e.time, e.value))
            state.remove()
            fn(wk.key, wk.ws, wk.ws + sizeMs, rows).iterator
          } else {
            val incoming = it.map(r => Event(r.key, r.time, r.value)).toList
            if (recoverLate && !state.exists &&
                wk.ws + sizeMs <= state.getCurrentWatermarkMs()) {
              // D2 recovery: this window fired already (no state, end behind
              // the watermark) — emit each late row as its own window now.
              incoming.iterator.flatMap(e =>
                fn(wk.key, wk.ws, wk.ws + sizeMs, Seq(e)))
            } else {
              val buffered = state.getOption.map(_.rows).getOrElse(Nil)
              state.update(WinBuf(buffered ++ incoming))
              // fire when the watermark passes the window end; if already past
              // (late-but-admitted rows), fire at the next tick
              state.setTimeoutTimestamp(
                math.max(wk.ws + sizeMs, state.getCurrentWatermarkMs() + 1))
              Iterator.empty
            }
          }
      }
  }

  def tumble[O: Encoder](
      df: DataFrame, tsCol: String, keyCol: String, valueCol: String, sizeMs: Long,
      watermark: String = StreamWindows.DefaultWatermark,
      recoverLate: Boolean = false)(
      fn: (Long, Long, Long, Seq[Event]) => Seq[O]): Dataset[O] =
    slide(df, tsCol, keyCol, valueCol, sizeMs, sizeMs, watermark, recoverLate)(fn)

  /** D1 opt-in (round-11 verdict item 8): the reference's per-EVENT firing
    * cadence (SlideWindow.java:238-261 — the first row past a window's end
    * triggers emission), re-expressed at micro-batch granularity as the
    * composition watermark = "0 seconds" + recoverLate:
    *
    *   - delay-0 watermark = max event time seen: the trigger that carries
    *     the first row past the window end advances the watermark to that
    *     row's time, and Spark's no-data micro-batch then fires the timeout
    *     in the SAME trigger round — the window emits on arrival of its
    *     closing event, not a watermark-delay later. (A key silent in that
    *     round still fires: the watermark is global, exactly like the
    *     reference's shared clock.)
    *   - any row arriving AFTER its window fired gets a single-element
    *     window immediately — the reference's own late-row rule
    *     (SlideWindow.java:345-366), which per-event firing makes the
    *     common disorder path: with zero allowed lateness, cross-batch
    *     disorder IS lateness.
    *
    * The residual, irreducible delta: events are delivered in micro-batch
    * quanta, so "first row past the end" resolves per trigger, not per row —
    * in-batch disorder is absorbed (rows sort at the fire), where the
    * reference would have emitted mid-batch. Window CONTENTS and bounds are
    * identical either way (EagerFireSpec pins the cadence and the recovery).
    * For production pipelines the default watermark grades remain the right
    * contract; this mode exists so a reference program's observable firing
    * schedule has a runnable counterpart (DELTAS.md D1).
    */
  def eagerSlide[O: Encoder](
      df: DataFrame, tsCol: String, keyCol: String, valueCol: String,
      sizeMs: Long, slideMs: Long)(
      fn: (Long, Long, Long, Seq[Event]) => Seq[O]): Dataset[O] =
    slide(df, tsCol, keyCol, valueCol, sizeMs, slideMs,
      watermark = "0 seconds", recoverLate = true)(fn)

  /** Tumbling form of [[eagerSlide]]. */
  def eagerTumble[O: Encoder](
      df: DataFrame, tsCol: String, keyCol: String, valueCol: String, sizeMs: Long)(
      fn: (Long, Long, Long, Seq[Event]) => Seq[O]): Dataset[O] =
    eagerSlide(df, tsCol, keyCol, valueCol, sizeMs, sizeMs)(fn)

  /** Gap-based session with full-row access and N output rows per session;
    * bounds = [first, last + gap), reference close rule (gap ≥ timeout).
    */
  def session[O: Encoder](
      df: DataFrame, tsCol: String, keyCol: String, valueCol: String,
      gapMs: Long,
      watermark: String = StreamWindows.DefaultWatermark,
      recoverLate: Boolean = false)(
      fn: (Long, Long, Long, Seq[Event]) => Seq[O]): Dataset[O] = {
    import df.sparkSession.implicits._
    val base = assigned(df, tsCol, keyCol, valueCol, watermark, gapMs, gapMs)
    val input = if (recoverLate) lateProof(base, tsCol) else base
    input
      .groupByKey(_.key)
      .flatMapGroupsWithState[WinBuf, O](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Long, it: Iterator[WRow], state: GroupState[WinBuf]) =>
          if (state.hasTimedOut) {
            val wm = state.getCurrentWatermarkMs()
            val rows = state.get.rows.sortBy(e => (e.time, e.value))
            val sessions = splitSessions(rows, gapMs)
            val (closed, open) = sessions.partition(s => s.last.time + gapMs <= wm)
            if (open.isEmpty) state.remove()
            else {
              state.update(WinBuf(open.flatten.toList))
              // re-arm for the EARLIEST still-open session's close time —
              // keyed on the latest it would wait out a continuous stream
              state.setTimeoutTimestamp(math.max(open.head.last.time + gapMs, wm + 1))
            }
            closed.iterator.flatMap(s => fn(key, s.head.time, s.last.time + gapMs, s))
          } else {
            val wm = state.getCurrentWatermarkMs()
            val buffered = state.getOption.map(_.rows).getOrElse(Nil)
            val all = (buffered ++ it.map(r => Event(r.key, r.time, r.value)))
              .sortBy(e => (e.time, e.value))
            val sessions = splitSessions(all, gapMs)
            // recoverLate: a late-but-admitted row may complete (or BE) a
            // session that is already closed under the current watermark —
            // emit those in the delivering trigger, exactly like slide's
            // singleton branch, and keep only the open suffix in state. A
            // late row within gap of a still-open session merges into it
            // (the reference's TreeMap insert), so recovery degrades to a
            // singleton only when no live session can absorb the row.
            val (closed, open) =
              if (recoverLate) sessions.partition(s => s.last.time + gapMs <= wm)
              else (Seq.empty[Seq[Event]], sessions)
            if (open.isEmpty) { if (state.exists) state.remove() }
            else {
              state.update(WinBuf(open.flatten.toList))
              state.setTimeoutTimestamp(
                math.max(open.head.last.time + gapMs, wm + 1))
            }
            closed.iterator.flatMap(s => fn(key, s.head.time, s.last.time + gapMs, s))
          }
      }
  }

  /** Session form of the D1 opt-in (see [[eagerSlide]]): delay-0 watermark
    * makes a session close in the trigger that delivers the first row past
    * `last + gap` (the reference's end-time-TreeMap eager close,
    * SessionWindow.java:29-129), and `recoverLate` gives a row arriving
    * after its session already closed an immediate session of its own —
    * merged into a live session when one can still absorb it.
    */
  def eagerSession[O: Encoder](
      df: DataFrame, tsCol: String, keyCol: String, valueCol: String, gapMs: Long)(
      fn: (Long, Long, Long, Seq[Event]) => Seq[O]): Dataset[O] =
    session(df, tsCol, keyCol, valueCol, gapMs,
      watermark = "0 seconds", recoverLate = true)(fn)

  /** Split time-sorted rows into sessions; break when gap >= gapMs
    * (reference rule, SessionWindow.java:63-77).
    */
  private[streaming] def splitSessions(sorted: Seq[Event], gapMs: Long): Seq[Seq[Event]] =
    sorted.foldLeft(Vector.empty[Vector[Event]]) { (acc, e) =>
      acc.lastOption match {
        case Some(cur) if e.time - cur.last.time < gapMs => acc.init :+ (cur :+ e)
        case _ => acc :+ Vector(e)
      }
    }
}
