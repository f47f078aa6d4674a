package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ordered funnel — the unbounded twin of `ops.Behavior.funnel`,
  * with identical stage semantics: stage-k time is the earliest stage-k
  * event strictly after stage-(k-1), every stage capped at `windowMs` after
  * entry. A funnel RESOLVES when it converts (final stage lands) or its
  * conversion window shuts; one append row per resolved funnel. Unlike the
  * one-shot batch query, the stream then RE-ENTERS the user at their next
  * entry event — funnel n+1 starts strictly after funnel n's resolution —
  * so a long-lived stream reports every conversion cycle. The FIRST funnel
  * per user is exactly the batch answer (FunnelStreamSpec pins this).
  *
  * Resolution boundaries are decided only by event times — the fold emits
  * and restarts the stage machine mid-drain when an event crosses the open
  * window's deadline — so the emitted rows are identical for ANY batching
  * of the same input (batch-boundary independence is spec'd).
  *
  * Out-of-order arrival is handled the way WindowedTransform buffers window
  * rows: events ahead of the watermark wait in state and fold into the
  * machine in (time, type) order once the watermark passes them — any
  * arrival order within the allowed lateness gives the same rows. Rows
  * behind the watermark are dropped by Spark's standard late-row contract
  * (DELTAS.md D2).
  *
  * State per user is four optional longs plus the reorder buffer, which
  * only ever holds events inside the watermark horizon (rate × lateness
  * bound, same argument as WindowedTransform); users with no open funnel
  * and nothing buffered are GC'd after one idle horizon. Hash-partitioned
  * by user like every stateful op here; hot users cost four longs, never
  * an event list beyond the lateness window.
  */
object FunnelStream {

  case class FEvent(user: Long, etype: String, time: Long)
  case class FunnelState(
      buffer: List[FEvent],
      t1: Option[Long], t2: Option[Long], t3: Option[Long], t4: Option[Long])
  case class FunnelResult(
      user_id: Long, t_signup: Long, t_view: Option[Long],
      t_click: Option[Long], t_purchase: Option[Long], stage: Int)

  val DefaultStages: Seq[String] = Seq("signup", "view", "click", "purchase")

  /** Greedy stage advance over a time-ordered event — equals the batch
    * nested-min semantics exactly when events are folded in time order:
    * the first stage-k event strictly after t_(k-1) IS the minimum.
    */
  private def step(st: FunnelState, ev: FEvent, stages: Seq[String], windowMs: Long): FunnelState = {
    def inWin = st.t1.exists(t1 => ev.time <= t1 + windowMs)
    ev.etype match {
      case t if t == stages(0) && st.t1.isEmpty => st.copy(t1 = Some(ev.time))
      case t if t == stages(1) && st.t2.isEmpty && st.t1.exists(ev.time > _) && inWin =>
        st.copy(t2 = Some(ev.time))
      case t if t == stages(2) && st.t3.isEmpty && st.t2.exists(ev.time > _) && inWin =>
        st.copy(t3 = Some(ev.time))
      case t if t == stages(3) && st.t4.isEmpty && st.t3.exists(ev.time > _) && inWin =>
        st.copy(t4 = Some(ev.time))
      case _ => st
    }
  }

  private def result(user: Long, st: FunnelState): Option[FunnelResult] =
    st.t1.map { t1 =>
      val stage = if (st.t4.isDefined) 4 else if (st.t3.isDefined) 3
        else if (st.t2.isDefined) 2 else 1
      FunnelResult(user, t1, st.t2, st.t3, st.t4, stage)
    }

  /** `df` needs (tsCol: TimestampType, userCol: numeric, typeCol: string). */
  def funnel(
      df: DataFrame, tsCol: String, userCol: String, typeCol: String,
      windowMs: Long, watermark: String = StreamWindows.DefaultWatermark,
      stages: Seq[String] = DefaultStages): Dataset[FunnelResult] = {
    import df.sparkSession.implicits._
    require(stages.size == 4, "four-stage funnel")

    val typed = df.withWatermark(tsCol, watermark)
      .select(col(userCol).cast("long").as("user"), col(typeCol).as("etype"),
        unix_millis(col(tsCol)).as("time"),
        col(tsCol)) // keep the watermark attribute flowing into the stateful op
      .as[FEvent]

    implicit val foldOrder: Ordering[FEvent] = Ordering.by(e => (e.time, e.etype))
    typed.groupByKey(_.user)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[FEvent], gs: GroupState[FunnelState]) =>
          val empty = FunnelState(Nil, None, None, None, None)
          val wm = gs.getCurrentWatermarkMs()
          val prev = gs.getOption.getOrElse(empty)
          // Timeout invocations carry no rows; data invocations fold new
          // arrivals into the same reorder buffer either way. STRICT
          // maturity: an equal-time peer folding earlier in (time, etype)
          // order could still arrive while wm == time.
          val (ripe, wait) = ReorderBuffer.drain(
            prev.buffer, if (gs.hasTimedOut) Iterator.empty else rows,
            wm, (_: FEvent).time, strict = true)

          // Drain in time order; emit-and-restart whenever an event crosses
          // the open window's deadline or lands the final stage — so the
          // emitted sequence depends only on event times, never on which
          // micro-batch delivered them.
          val out = List.newBuilder[FunnelResult]
          var st = prev.copy(buffer = Nil)
          for (ev <- ripe) {
            if (st.t1.exists(t1 => ev.time > t1 + windowMs)) {
              out ++= result(user, st); st = empty
            }
            st = step(st, ev, stages, windowMs)
            if (st.t4.isDefined) { out ++= result(user, st); st = empty }
          }
          // The watermark itself can shut the open window with no event.
          if (st.t1.exists(_ + windowMs <= wm)) { out ++= result(user, st); st = empty }
          st = st.copy(buffer = wait)

          if (st.t1.isEmpty && st.buffer.isEmpty) {
            // No open funnel, nothing pending: drop state now (resolution
            // just emitted) or at the idle horizon (sentinel GC).
            gs.remove()
          } else {
            gs.update(st)
            // Wake at the earliest of: the open funnel's window shutting,
            // or the watermark maturing the earliest buffered event —
            // whichever resolves something first (clamped ahead of the
            // watermark; no open funnel and an empty buffer GC at one idle
            // horizon).
            val deadline = st.t1.map(_ + windowMs).getOrElse(wm + windowMs)
            val wake =
              if (st.buffer.isEmpty) deadline
              else math.min(deadline,
                ReorderBuffer.wakeAt(st.buffer.map(_.time), wm, strict = true, orElse = deadline))
            gs.setTimeoutTimestamp(wake max (wm + 1))
          }
          out.result().iterator
      }
  }
}
