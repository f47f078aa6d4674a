package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  *   - idle-time advance (`noDataDelay`, TimeWindow.java:25-31): pass a
  *     `heartbeat` stream (see `heartbeatRate`) — heartbeat rows advance the
  *     watermark, then are filtered before grouping, so windows close during
  *     input silence without contributing rows (DELTAS D3, implemented).
  *
  * Scale: windowed aggregation is partial+final over a shuffle on
  * (key, window); state eviction is watermark-driven — both are exactly the
  * 1000-executor-safe shapes.
  */
object StreamWindows {

  val DefaultWatermark = "1 second" // reference default, TimeWindow.java:32

  private val HbCol = "__heartbeat__"

  /** Production heartbeat stream for the D3 idle-advance (reference
    * `noDataDelay`, TimeWindow.java:25-31): a rate source carrying only the
    * current wall-clock time as the event-time column. Union it via the
    * `heartbeat` parameter of slide/tumble/session; its rows move the
    * watermark forward during input silence and never reach the aggregation.
    *
    * Constraint (matches the reference, whose noDataDelay also uses wall
    * clock): event times must track wall clock within the watermark delay.
    * A stream replaying the past would have its live rows dropped as late
    * because wall-clock heartbeats race the watermark ahead of the data —
    * for replay, drive the heartbeat from the source itself (e.g. a side
    * stream of max observed event time) instead of `heartbeatRate`.
    */
  def heartbeatRate(spark: SparkSession, ts: String, rowsPerSecond: Int = 1): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString)
      .load()
      .select(col("timestamp").as(ts))

  /** Union heartbeat rows (null data columns, marked), declare the watermark
    * over the union, then filter the marks back out: heartbeat timestamps
    * pass through the watermark operator — advancing event time — but no
    * heartbeat row survives to the grouping.
    *
    * The mark filter MUST be non-deterministic: Catalyst's
    * PushPredicateThroughNonJoin pushes any deterministic predicate below the
    * EventTimeWatermark node, which would remove heartbeat rows before the
    * watermark stats collector ever sees them — turning the idle-advance into
    * a silent no-op. `asNondeterministic()` pins the filter above the
    * watermark; the cost is one boolean call per row, only on this path.
    */
  private val dropHeartbeats = udf((hb: Boolean) => !hb).asNondeterministic()

  /** Public so every event-time stateful operator (windows here, the
    * over-window family, custom pipelines) shares ONE idle-advance
    * implementation — the D3 `noDataDelay` counterpart.
    */
  def watermarked(
      df: DataFrame, ts: String, watermark: String, heartbeat: Option[DataFrame]): DataFrame =
    heartbeat match {
      case None => df.withWatermark(ts, watermark)
      case Some(hb) =>
        val hbRows = hb.select(
          df.schema.fields.map { f =>
            if (f.name == ts) col(ts) else lit(null).cast(f.dataType).as(f.name)
          }.toIndexedSeq :+ lit(true).as(HbCol): _*)
        df.withColumn(HbCol, lit(false))
          .unionByName(hbRows)
          .withWatermark(ts, watermark)
          .filter(dropHeartbeats(col(HbCol)))
          .drop(HbCol)
    }

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
      watermark: String = DefaultWatermark,
      heartbeat: Option[DataFrame] = None): DataFrame = {
    val out = watermarked(df, ts, watermark, heartbeat)
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
      watermark: String = DefaultWatermark,
      heartbeat: Option[DataFrame] = None): DataFrame =
    slide(df, ts, size, size, keys, aggs, watermark, heartbeat)

  /** Gap-based session window; window = [first event, last event + gap). */
  def session(
      df: DataFrame,
      ts: String,
      gap: String,
      keys: Seq[String],
      aggs: Seq[Column],
      watermark: String = DefaultWatermark,
      heartbeat: Option[DataFrame] = None): DataFrame = {
    val out = watermarked(df, ts, watermark, heartbeat)
      .groupBy(session_window(col(ts), gap).as("w") +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    out.select(
      unix_millis(col("w.start")).as("session_start") +:
        unix_millis(col("w.end")).as("session_end") +:
        out.columns.filter(_ != "w").map(col).toSeq: _*)
  }
}
