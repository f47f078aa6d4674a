package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join: pair left events with every right event of
  * the same key whose event time falls in `[l.ts − lowerMs, l.ts + upperMs]`
  * — the "all matches in a time range" complement to `AsOfStream` (which
  * keeps only the single latest match; see its scaladoc for why that needs
  * custom state). This shape Spark's native stream-stream join DOES express,
  * so the operator stays declarative and inherits watermark state cleanup
  * for free — no custom `GroupState`, no hand-rolled buffers.
  *
  * Semantics (reference has no stream-stream join; SURVEY §2.5's joins are
  * batch/dimension — this extends the inventory the SURVEY §6 way):
  *
  *   - INNER: a pair emits as soon as both rows have arrived, whatever
  *     micro-batch each landed in — the engine buffers both sides in state.
  *   - LEFT OUTER: an unmatched left null-pads only once the watermark
  *     proves no future right can still match (wm past `l.ts + upperMs`);
  *     until then it stays buffered, so no retraction is ever needed.
  *
  * Scale shape: state per side is bounded by `watermarkDelay + the interval
  * span` of rows per key — the range condition bounds BOTH event-time
  * columns, which is exactly what lets the streaming planner derive state
  * watermarks and evict; an unbounded (single-sided) condition would grow
  * state forever and Spark would reject outer mode. The join itself is a
  * keyed symmetric hash join partitioned on the key — at 100 TB/day the
  * shuffle carries each event once, and state stays O(delay × rate/key).
  *
  * Key columns must be named differently on the two sides (`leftKey` /
  * `rightKey`) so the output carries both unambiguously — the caller picks
  * the names, mirroring the reference's join rename maps (GTable §2.5).
  */
object IntervalJoinStream {

  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      lowerMs: Long,
      upperMs: Long,
      watermarkDelay: String,
      joinType: String = "inner"): DataFrame = {
    require(lowerMs >= 0 && upperMs >= 0, "interval bounds are non-negative spans")
    require(leftKey != rightKey && leftTs != rightTs,
      "left/right key and time columns must have distinct names")
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = right.withWatermark(rightTs, watermarkDelay)
    val cond = col(leftKey) === col(rightKey) &&
      col(rightTs) >= col(leftTs) - expr(s"INTERVAL $lowerMs MILLISECONDS") &&
      col(rightTs) <= col(leftTs) + expr(s"INTERVAL $upperMs MILLISECONDS")
    l.join(r, cond, joinType)
  }
}
