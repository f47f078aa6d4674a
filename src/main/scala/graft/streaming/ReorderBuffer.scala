package graft.streaming

import scala.collection.mutable.ArrayBuffer

/** The ONE watermark-horizon reorder discipline shared by every stateful
  * event-time operator in this engine (FunnelStream, AnomalyStream,
  * AsOfStream, OverWindows) — the Spark-side re-expression of the
  * reference's watermark reorder buffer (window/TimeWindow.java:72-136,
  * which holds arrivals and releases them to the window in event-time order
  * once the watermark passes).
  *
  * Contract: events AHEAD of the watermark wait in state; once the
  * watermark passes them they fold into the operator in a deterministic
  * total order (the batch formulation's exact ORDER BY). Under that
  * discipline ANY arrival order of the same events — any assignment to
  * micro-batches that Spark's late-row filter admits — produces the same
  * output rows (the disorder law, pinned by ReorderLawSpec for all four
  * operators). Rows behind the watermark are dropped by Spark's standard
  * late-row contract before they reach the operator (DELTAS.md D2).
  *
  * Maturity has two grades:
  *   - STRICT (`time < wm`): an event is released only once the watermark
  *     is strictly past its own timestamp. Required whenever an equal-time
  *     arrival could still change the event's OWN output row (over-window
  *     frames include `t' == t`; an as-of right at exactly the left's time
  *     is a legal match) — Spark admits rows with eventTime == watermark,
  *     so at `wm == t` the event is not yet final.
  *   - LAX (`time <= wm`): release at the watermark. Sufficient when
  *     equal-time peers cannot change an emitted row, only their own.
  *
  * Buffer size is rate x allowed-lateness per key — the watermark horizon —
  * independent of stream length; the state-bound specs pin this.
  *
  * Disorder policy per stateful operator (the engine's full inventory):
  *   - drain()-based, STRICT: OverWindows (per-row frames), FunnelStream,
  *     AnomalyStream — incremental folds whose per-event output depends on
  *     everything at-or-before it.
  *   - mergeSorted()-based, strict maturity: AsOfStream — sorted-array
  *     state rebuilt at most once per batch.
  *   - accumulate-then-sort-at-fire: WindowedTransform (tumble/slide/
  *     session row-emitting UDFs) — windows fire once whole, so rows may
  *     buffer unordered and sort at the firing; same law, cheaper form.
  *   - natively order-safe: StreamWindows aggregates (Spark's windowed agg
  *     state is commutative), IntervalJoinStream (symmetric hash join),
  *     CdcStream (max_by lattice), HllStream/RollupStream (merges).
  *   - order-SENSITIVE by contract: HeavyHitterStream (Misra-Gries counter
  *     CONTENTS vary with arrival order inside the error bound — the
  *     guarantee is the bound, not bit-equality), CorpusIngest admission
  *     ("first seen wins" is arrival-order by design, like any online
  *     admission gate; its soak/idempotence specs cover the contract).
  */
object ReorderBuffer {

  /** Fold `buffered` state plus `incoming` arrivals at watermark `wm` into
    * (ripe, wait): `ripe` sorted by `ord` (the deterministic fold order),
    * `wait` retained for a later batch. `strict` selects the maturity grade
    * (see class doc).
    */
  def drain[E](
      buffered: List[E],
      incoming: Iterator[E],
      wm: Long,
      timeOf: E => Long,
      strict: Boolean)(implicit ord: Ordering[E]): (Seq[E], List[E]) = {
    val all = buffered ++ incoming
    val (ripe, wait) =
      if (strict) all.partition(timeOf(_) < wm)
      else all.partition(timeOf(_) <= wm)
    (ripe.sorted(ord), wait)
  }

  /** The event-time timeout that continues the drain: fire as soon as the
    * watermark can have matured the earliest waiting event (strictly past
    * it when `strict`), clamped strictly ahead of the current watermark —
    * Spark rejects timeout timestamps at or behind it (another key may have
    * advanced the watermark past this key's horizon). With nothing waiting,
    * fall back to `orElse` (the operator's own deadline: a funnel window
    * shut, an idle-state GC horizon).
    */
  def wakeAt(waitTimes: Iterable[Long], wm: Long, strict: Boolean, orElse: => Long): Long = {
    val base =
      if (waitTimes.isEmpty) orElse
      else if (strict) waitTimes.min + 1
      else waitTimes.min
    math.max(base, wm + 1)
  }

  /** Single-pass merge of two time-sorted buffers — the array-state variant
    * of the same discipline, for operators whose state is a sorted array
    * rebuilt at most once per micro-batch (AsOfStream). `incoming` must be
    * sorted by time (stable for equal times). `replaceEqual` makes an
    * incoming equal-time element REPLACE the buffered one (newest arrival
    * wins — the "unique per (key, time)" right-side contract); otherwise
    * equal-time duplicates are kept, buffered-first.
    */
  def mergeSorted[E](
      state: IndexedSeq[(Long, E)],
      incoming: IndexedSeq[(Long, E)],
      replaceEqual: Boolean): IndexedSeq[(Long, E)] = {
    val out = new ArrayBuffer[(Long, E)](state.length + incoming.length)
    def push(e: (Long, E)): Unit =
      if (replaceEqual && out.nonEmpty && out.last._1 == e._1) out(out.length - 1) = e
      else out += e
    var i = 0; var j = 0
    while (i < state.length || j < incoming.length) {
      if (j >= incoming.length) { push(state(i)); i += 1 }
      else if (i >= state.length) { push(incoming(j)); j += 1 }
      else if (state(i)._1 < incoming(j)._1) { push(state(i)); i += 1 }
      else if (state(i)._1 > incoming(j)._1) { push(incoming(j)); j += 1 }
      else if (replaceEqual) { i += 1 } // equal time: buffered row gives way
      else { push(state(i)); i += 1 }
    }
    out.toIndexedSeq
  }

  /** First index in time-sorted `times` with `times(i) > t` — the shared
    * frame/floor binary search (the reference's SortedTable.countLessThan,
    * SlideTableByColumn.java:64-126).
    */
  def upperBound(times: IndexedSeq[Long], t: Long): Int = {
    var lo = 0; var hi = times.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (times(mid) <= t) lo = mid + 1 else hi = mid
    }
    lo
  }
}
