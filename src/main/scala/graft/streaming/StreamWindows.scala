package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time windows for unbounded input — the Spark-first expression of the
  * reference's streaming window operators (SURVEY §2.8).
  *
  * Semantics mapping (reference → here):
  *   - `SlideWindow`/`TumbleWindow` (window/SlideWindow.java:105-383,
  *     TumbleWindow.java:10-50): epoch-aligned `[start, start+size)` hopping
  *     windows — `window()` has identical alignment (`t/size*size`,
  *     SlideWindow.java:256,339).
  *   - `SessionWindow` (window/SessionWindow.java:29-129): per-key gap
  *     sessions, window = `[first, last+gap)` — `session_window()`.
  *   - watermark-as-reorder-buffer (window/TimeWindow.java:72-136, default
  *     1000 ms): `withWatermark` bounds lateness the same way; Spark sorts
  *     within the state store rather than in a TreeMap buffer.
  *
  * Documented semantic deltas (accepted, SURVEY §7.3):
  *   - firing cadence is per micro-batch, not per-event;
  *   - rows later than the watermark are dropped, not emitted as
  *     single-element windows (SlideWindow.java:345-366);
  *   - idle-time advance (`noDataDelay`, TimeWindow.java:25-31) has no
  *     event-time equivalent in Spark — use a processing-time trigger if
  *     emission on silence is required.
  *
  * Scale: windowed aggregation is partial+final over a shuffle on
  * (key, window); state eviction is watermark-driven — both are exactly the
  * 1000-executor-safe shapes.
  */
object StreamWindows {

  val DefaultWatermark = "1 second" // reference default, TimeWindow.java:32

  /** Hopping (slide < size) or tumbling (slide == size) event-time window
    * aggregation. `ts` must be a TimestampType column.
    */
  def slide(
      df: DataFrame,
      ts: String,
      size: String,
      slide: String,
      keys: Seq[String],
      aggs: Seq[Column],
      watermark: String = DefaultWatermark): DataFrame = {
    val out = df.withWatermark(ts, watermark)
      .groupBy(window(col(ts), size, slide).as("w") +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    out.select(
      unix_millis(col("w.start")).as("window_start") +:
        unix_millis(col("w.end")).as("window_end") +:
        out.columns.filter(_ != "w").map(col).toSeq: _*)
  }

  def tumble(
      df: DataFrame,
      ts: String,
      size: String,
      keys: Seq[String],
      aggs: Seq[Column],
      watermark: String = DefaultWatermark): DataFrame =
    slide(df, ts, size, size, keys, aggs, watermark)

  /** Gap-based session window; window = [first event, last event + gap). */
  def session(
      df: DataFrame,
      ts: String,
      gap: String,
      keys: Seq[String],
      aggs: Seq[Column],
      watermark: String = DefaultWatermark): DataFrame = {
    val out = df.withWatermark(ts, watermark)
      .groupBy(session_window(col(ts), gap).as("w") +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    out.select(
      unix_millis(col("w.start")).as("session_start") +:
        unix_millis(col("w.end")).as("session_end") +:
        out.columns.filter(_ != "w").map(col).toSeq: _*)
  }
}
