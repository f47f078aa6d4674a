package graft.streaming

import graft.ops.Behavior
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming rolling z-score anomaly detection — the unbounded twin of
  * `ops.Behavior.anomalies`, with identical semantics: an event is scored
  * against the SAME USER's trailing `frame` values (current row excluded),
  * fires at `|z| >= zThreshold` once `minN` priors with positive variance
  * exist. Emitted rows are bit-identical to the batch op over the same
  * events (AnomalyStreamSpec pins this, including the rounded-z boundary),
  * because the fold replays the batch arithmetic exactly: integer micro-unit
  * moments, then the one documented IEEE z expression with HALF_UP rounding.
  *
  * Out-of-order arrival uses the FunnelStream reorder-buffer contract:
  * events ahead of the watermark wait in state and fold in (time, id) order
  * — the batch window's exact ORDER BY — once the watermark passes them, so
  * any arrival order within the allowed lateness emits the same rows, and
  * emission is micro-batch-boundary independent. Rows behind the watermark
  * are dropped by Spark's standard late-row contract.
  *
  * State per user is the trailing-value ring (≤ `frame` longs — the batch
  * window made resident, which is the point: the trailing frame IS the
  * streaming state) plus the reorder buffer (watermark-horizon bounded).
  * History is retained while the user is live — dropping it would diverge
  * from batch for returning users; cap the key domain upstream if needed
  * (the same policy knob as any keyed-state op).
  */
object AnomalyStream {

  case class AEvent(user: Long, id: Long, time: Long, v: Long)
  case class AnomalyState(buffer: List[AEvent], hist: List[Long])
  case class AnomalyRow(event_id: Long, user_id: Long, ms: Long, v_e4: Long, n: Long, z: Double)

  /** The batch op's z, replayed scalar-for-scalar: Spark's Round(double)
    * is java BigDecimal.valueOf + HALF_UP.
    */
  private def zOf(n: Long, v: Long, s: Long, ss: Long): Double = {
    val raw = (n * v - s).toDouble * math.sqrt((n - 1).toDouble / n.toDouble) /
      math.sqrt((n * ss - s * s).toDouble)
    java.math.BigDecimal.valueOf(raw)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  /** `df` needs (tsCol: TimestampType, userCol/idCol: numeric, valueCol: double). */
  def anomalies(
      df: DataFrame, tsCol: String, userCol: String, idCol: String, valueCol: String,
      frame: Int = Behavior.AnomalyFrame, minN: Int = Behavior.AnomalyMinN,
      zThreshold: Double = Behavior.AnomalyZ,
      watermark: String = StreamWindows.DefaultWatermark): Dataset[AnomalyRow] = {
    import df.sparkSession.implicits._

    val typed = df.withWatermark(tsCol, watermark)
      .select(col(userCol).cast("long").as("user"), col(idCol).cast("long").as("id"),
        unix_millis(col(tsCol)).as("time"),
        // the exact ingest expression of the batch op — micro-units are
        // assigned by Spark's codegen round, not by JVM-side arithmetic
        expr(s"cast(round($valueCol * 10000) as bigint)").as("v"),
        col(tsCol)) // keep the watermark attribute flowing into the stateful op
      .as[AEvent]

    implicit val foldOrder: Ordering[AEvent] = Ordering.by(e => (e.time, e.id))
    typed.groupByKey(_.user)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[AEvent], gs: GroupState[AnomalyState]) =>
          val prev = gs.getOption.getOrElse(AnomalyState(Nil, Nil))
          val wm = gs.getCurrentWatermarkMs()
          // STRICT maturity: an equal-time peer folding before this event in
          // (time, id) order could still arrive while wm == time.
          val (ripe, wait) = ReorderBuffer.drain(
            prev.buffer, if (gs.hasTimedOut) Iterator.empty else rows,
            wm, (_: AEvent).time, strict = true)

          val out = List.newBuilder[AnomalyRow]
          var hist = prev.hist // newest-first trailing values, ≤ frame of them
          for (ev <- ripe) {
            val n = hist.size.toLong
            if (n >= minN) {
              val s = hist.sum
              val ss = hist.foldLeft(0L)((acc, x) => acc + x * x)
              if (n * ss - s * s > 0) {
                val z = zOf(n, ev.v, s, ss)
                if (math.abs(z) >= zThreshold)
                  out += AnomalyRow(ev.id, user, ev.time, ev.v, n, z)
              }
            }
            hist = (ev.v :: hist).take(frame)
          }

          gs.update(AnomalyState(wait, hist))
          if (wait.nonEmpty) {
            // ripen the earliest buffered event as soon as the watermark
            // is strictly past it (clamped ahead of the watermark)
            gs.setTimeoutTimestamp(
              ReorderBuffer.wakeAt(wait.map(_.time), wm, strict = true, orElse = wm + 1))
          }
          out.result().iterator
      }
  }
}
