package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch expression of the reference's event-time window operators, run over
  * the `events` table. Same window semantics the streaming module
  * (graft.streaming) applies to unbounded input — Spark's `window()` /
  * `session_window()` functions are shared between batch and streaming plans,
  * which is exactly why we use them: one definition, two execution modes.
  *
  * Reference semantics encoded here:
  *   - SlideWindow/TumbleWindow alignment `t/size*size`, bounds `[start,
  *     start+size)` (reference: window/SlideWindow.java:256,339) — matches
  *     Spark's epoch-aligned `window()`.
  *   - SessionWindow: close after `timeout` of per-key silence, window =
  *     `[first, last+timeout)` (reference: window/SessionWindow.java:29-129)
  *     — matches `session_window()` (end = last event + gap).
  *   - OverWindowByDuration: trailing event-time frame `(t-size, t]`
  *     (reference: window/OverWindowByDuration.java:29-98) —
  *     `rangeBetween(-(size-1), 0)` over the BIGINT millis column.
  *   - OverWindowBySize: trailing count frame of the last N rows
  *     (reference: window/OverWindowBySize.java:32-98) —
  *     `rowsBetween(-(N-1), 0)`.
  *
  * Scale notes: all five are single-shuffle plans (hash by key / partition
  * key). The window() struct is computed map-side; sessionization is Spark's
  * native merging session agg, which handles the sort within partitions.
  * Double sums are rounded; min/max/count are order-insensitive.
  */
object WindowsBatch {

  val TumbleMs: Long = 6L * 3600 * 1000
  val SlideMs: Long = 3L * 3600 * 1000
  val SessionGapMs: Long = 8L * 3600 * 1000
  val TrailMs: Long = 24L * 3600 * 1000
  val TrailRows = 3

  def tumble(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts_t"), "6 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(unix_millis(col("w.start")).as("ws"), col("event_type"), col("n"), col("sum_value"))

  def slide(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts_t"), "6 hours", "3 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(unix_millis(col("w.start")).as("ws"), col("event_type"), col("n"), col("sum_value"))

  def session(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts_t"), "8 hours").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"), unix_millis(col("w.start")).as("session_start"),
        unix_millis(col("w.end")).as("session_end"), col("n"), col("sum_value"))

  def overByDuration(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("__time__"))
      .rangeBetween(-(TrailMs - 1), 0)
    events.select(col("event_id"), col("user_id"), col("__time__"),
      count(lit(1)).over(w).as("n_24h"),
      round(max(col("value")).over(w), 6).as("max_24h"),
      round(min(col("value")).over(w), 6).as("min_24h"))
  }

  def overBySize(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("__time__"), col("event_id"))
      .rowsBetween(-(TrailRows - 1), 0)
    events.select(col("event_id"), col("user_id"), col("__time__"),
      count(lit(1)).over(w).as("n_last3"),
      round(sum(col("value")).over(w), 2).as("sum_last3"),
      round(max(col("value")).over(w), 6).as("max_last3"))
  }

  /** Cumulate window (Flink's CUMULATE TVF — public Flink SQL semantics,
    * absent from both the reference and Spark's built-ins): a day-aligned
    * window reported at every `CumStepMs` checkpoint, each report covering
    * [day_start, day_start + k·step). The early-firing "progress toward the
    * daily total" shape dashboards want.
    *
    * Implemented by fanning each event into the (size/step − offset) step
    * windows it belongs to — map-side explode of ≤ size/step tiny structs
    * (like the slide oracle's k-fan), then ONE hash agg. No window
    * functions, no second shuffle; the last step's row is exactly the
    * tumble row (spec'd).
    */
  def cumulate(events: DataFrame): DataFrame = {
    val steps = (CumSizeMs / CumStepMs).toInt
    events
      .select(col("event_type"), col("value"),
        expr(s"__time__ div ${CumSizeMs}L * ${CumSizeMs}L").as("ws"), col("__time__"))
      .select(col("event_type"), col("value"), col("ws"),
        explode(expr(
          s"filter(transform(sequence(1, $steps), k -> ws + k * ${CumStepMs}L)," +
            " e -> __time__ < e)")).as("we"))
      .groupBy(col("ws"), col("we"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
  }

  val CumSizeMs: Long = 24L * 3600 * 1000
  val CumStepMs: Long = 6L * 3600 * 1000

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_window_cumulate" -> ((s, d) => cumulate(Tables.events(s, d))),
    "q_window_tumble" -> ((s, d) => tumble(Tables.events(s, d))),
    "q_window_slide" -> ((s, d) => slide(Tables.events(s, d))),
    "q_window_session" -> ((s, d) => session(Tables.events(s, d))),
    "q_over_duration" -> ((s, d) => overByDuration(Tables.events(s, d))),
    "q_over_size" -> ((s, d) => overBySize(Tables.events(s, d))))

  // DuckDB mirrors over epoch-ms BIGINT time.
  private val msSql = "epoch_ms(ts)"

  val oracleSql: Map[String, String] = Map(
    "q_window_cumulate" ->
      s"""WITH x AS (SELECT event_type, value,
         |  ($msSql // $CumSizeMs) * $CumSizeMs AS ws, $msSql AS ms FROM events),
         |e AS (SELECT event_type, value, ws, ws + k.k * $CumStepMs AS we
         |      FROM x, (SELECT unnest(range(1, ${CumSizeMs / CumStepMs + 1})) AS k) k
         |      WHERE ms < ws + k.k * $CumStepMs)
         |SELECT ws, we, event_type, count(*) AS n, round(sum(value), 2) AS sum_value
         |FROM e GROUP BY 1, 2, 3""".stripMargin,

    "q_window_tumble" ->
      s"""SELECT ($msSql // $TumbleMs) * $TumbleMs AS ws, event_type,
         |  count(*) AS n, round(sum(value), 2) AS sum_value
         |FROM events GROUP BY 1, 2""".stripMargin,

    // Every event belongs to exactly size/slide = 2 sliding windows:
    // ws = (floor(t/slide) - k) * slide for k in 0..1.
    "q_window_slide" ->
      s"""WITH x AS (SELECT event_type, value,
         |  ($msSql // $SlideMs - k.k) * $SlideMs AS ws
         |  FROM events, (SELECT unnest(range(2)) AS k) k)
         |SELECT ws, event_type, count(*) AS n, round(sum(value), 2) AS sum_value
         |FROM x GROUP BY 1, 2""".stripMargin,

    // Gaps-and-islands sessionization; session end = last event + gap,
    // matching Spark's session_window and the reference's
    // `[firstTime, lastTime+timeout)` (SessionWindow.java:109-116).
    "q_window_session" ->
      s"""WITH e AS (SELECT user_id, $msSql AS ms, value FROM events),
         |g AS (SELECT user_id, ms, value,
         |        CASE WHEN ms - lag(ms) OVER (PARTITION BY user_id ORDER BY ms) > $SessionGapMs
         |             OR lag(ms) OVER (PARTITION BY user_id ORDER BY ms) IS NULL
         |        THEN 1 ELSE 0 END AS brk
         |      FROM e),
         |s AS (SELECT user_id, ms, value,
         |        sum(brk) OVER (PARTITION BY user_id ORDER BY ms
         |                       ROWS UNBOUNDED PRECEDING) AS sid
         |      FROM g)
         |SELECT user_id, min(ms) AS session_start, max(ms) + $SessionGapMs AS session_end,
         |  count(*) AS n, round(sum(value), 2) AS sum_value
         |FROM s GROUP BY user_id, sid""".stripMargin,

    "q_over_duration" ->
      s"""SELECT event_id, user_id, $msSql AS __time__,
         |  count(*) OVER w AS n_24h,
         |  round(max(value) OVER w, 6) AS max_24h,
         |  round(min(value) OVER w, 6) AS min_24h
         |FROM events
         |WINDOW w AS (PARTITION BY user_id ORDER BY $msSql
         |             RANGE BETWEEN ${TrailMs - 1} PRECEDING AND CURRENT ROW)""".stripMargin,

    "q_over_size" ->
      s"""SELECT event_id, user_id, $msSql AS __time__,
         |  count(*) OVER w AS n_last3,
         |  round(sum(value) OVER w, 2) AS sum_last3,
         |  round(max(value) OVER w, 6) AS max_last3
         |FROM events
         |WINDOW w AS (PARTITION BY user_id ORDER BY $msSql, event_id
         |             ROWS BETWEEN ${TrailRows - 1} PRECEDING AND CURRENT ROW)""".stripMargin)
}
