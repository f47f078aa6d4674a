package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Range (interval) join: match left rows to right intervals containing
  * their timestamp — `l.t in [r.start, r.end)` — without the quadratic
  * theta-join Spark would otherwise plan (BroadcastNestedLoopJoin comparing
  * every row against every interval).
  *
  * The scale-safe shape is BUCKETING: pick a bucket width near the typical
  * interval length, explode each interval into the buckets it covers (a
  * bounded, usually small fan-out), tag each left row with its single
  * bucket, equi-join on (keys..., bucket), and post-filter the exact
  * containment. The join is then an ordinary hash/sort-merge equi-join a
  * 1000-executor shuffle handles; cost scales with rows × (interval/bucket),
  * not rows × intervals. Intervals much longer than `bucketMs` multiply the
  * fan-out — callers pick the bucket to bound it, and the fan-out is plain
  * `sequence()`, never a driver loop.
  *
  * The reference has no interval operator (its windows assign rows to
  * GENERATED windows; this joins rows to ARBITRARY interval rows).
  */
object RangeJoin {

  /** Inner range join. `keys` are additional equi-join columns (the common
    * case: interval tables are per-entity). Right columns are kept as-is;
    * both sides' key columns merge. Output = left columns ++ right non-key
    * columns.
    */
  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      leftTime: String,
      startCol: String,
      endCol: String,
      bucketMs: Long,
      keys: Seq[String] = Nil): DataFrame = {
    require(bucketMs > 0, "bucketMs must be positive")
    val b = "__bucket"
    // FLOOR division, not `div` (which truncates toward zero): with negative
    // timestamps truncation assigns t = -5 and an interval starting at -10 to
    // DIFFERENT buckets and the equi-join silently misses the match.
    def fdiv(e: String): String =
      s"(($e) div $bucketMs - (CASE WHEN ($e) % $bucketMs < 0 THEN 1 ELSE 0 END))"
    val taggedLeft = left.withColumn(b, expr(fdiv(leftTime)))
    val explodedRight = right
      // a malformed interval (end <= start) contains nothing — and unguarded
      // it would explode a DESCENDING sequence (Spark auto-steps -1), fanning
      // out rows the containment filter then discards; a corrupt far-negative
      // end could fan out millions. Dropping such rows is semantics-preserving.
      .filter(col(endCol) > col(startCol))
      .withColumn(
        b,
        explode(sequence(
          expr(fdiv(startCol)),
          expr(fdiv(s"$endCol - 1")))))
    taggedLeft
      .join(explodedRight, keys :+ b)
      .filter(col(leftTime) >= col(startCol) && col(leftTime) < col(endCol))
      .drop(b)
  }

  /** Interval × interval OVERLAP join: pairs where `[l.start, l.end)` and
    * `[r.start, r.end)` intersect — the feature-pipeline primitive behind
    * "which campaigns ran during this session", downtime attribution, and
    * label-window × observation-window joins. Spark plans the raw
    * `l.start < r.end AND r.start < l.end` predicate as a nested-loop join;
    * this is the grid-bucketed equi-join form that shuffles instead.
    *
    * Shape: BOTH sides explode into the grid cells they cover (fan =
    * len/bucket + 1 each), equi-join on (keys..., cell), post-filter the
    * exact overlap. A pair overlapping k shared cells would emit k times;
    * the OWNERSHIP rule dedups without a distinct-shuffle: the overlap's
    * start `max(l.start, r.start)` lies inside both intervals, so exactly
    * one shared cell contains it — emit the pair only from that cell. The
    * dedup is a map-side filter, not an extra exchange.
    *
    * 100 TB: cost = rows × (interval/bucket) on each side, an ordinary
    * shuffled equi-join; nothing is quadratic in either input. Callers pick
    * `bucketMs` near the typical interval length to bound the fan.
    */
  def overlapJoin(
      left: DataFrame,
      right: DataFrame,
      lStart: String, lEnd: String,
      rStart: String, rEnd: String,
      bucketMs: Long,
      keys: Seq[String] = Nil): DataFrame = {
    require(bucketMs > 0, "bucketMs must be positive")
    val b = "__cell"
    def fdiv(e: String): String =
      s"(($e) div $bucketMs - (CASE WHEN ($e) % $bucketMs < 0 THEN 1 ELSE 0 END))"
    def fan(df: DataFrame, s: String, e: String): DataFrame = df
      .filter(col(e) > col(s)) // empty/corrupt intervals contain nothing
      .withColumn(b, explode(sequence(expr(fdiv(s)), expr(fdiv(s"$e - 1")))))
    fan(left, lStart, lEnd)
      .join(fan(right, rStart, rEnd), keys :+ b)
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      .filter(col(b) === expr(fdiv(s"greatest($lStart, $rStart)")))
      .drop(b)
  }

  /** Demo: attribute every event to its 8h-gap session interval (sessions
    * from `WindowsBatch.session` — a genuinely derived interval table, one
    * row per (user, session)). Every event lands in exactly one session by
    * construction. Bucket = the session gap, so fan-out per interval is
    * session-length/gap + 1 (~1-2 here).
    */
  def eventsWithSession(events: DataFrame): DataFrame = {
    val sessions = WindowsBatch.session(events)
      .select(col("user_id"), col("session_start"), col("session_end"))
    rangeJoin(
      events.select(col("event_id"), col("user_id"), col("__time__")),
      sessions, "__time__", "session_start", "session_end",
      bucketMs = WindowsBatch.SessionGapMs, keys = Seq("user_id"))
      .select(col("event_id"), col("user_id"), col("__time__").as("t"),
        col("session_start"), col("session_end"))
  }

  /** Demo: user sessions × per-type daily activity spans. The span table
    * (one `[first, last+1)` interval per (event_type, UTC day) with events)
    * is |types|·days rows — dimension-sized at any corpus scale, so Spark
    * broadcasts it and the overlap join is map-side; the session side never
    * re-shuffles. `overlap_ms` = width of the intersection.
    */
  def sessionTypeOverlaps(events: DataFrame): DataFrame = {
    val DayMs = 86400000L
    val sessions = WindowsBatch.session(events)
      .select(col("user_id"), col("session_start"), col("session_end"))
    val spans = events
      .groupBy(expr(s"__time__ div $DayMs").as("day"), col("event_type"))
      .agg(min(col("__time__")).as("span_start"),
        (max(col("__time__")) + lit(1L)).as("span_end"))
    overlapJoin(sessions, spans,
      "session_start", "session_end", "span_start", "span_end", bucketMs = DayMs)
      .select(col("user_id"), col("session_start"), col("event_type"), col("day"),
        (least(col("session_end"), col("span_end"))
          - greatest(col("session_start"), col("span_start"))).as("overlap_ms"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_range" -> ((s, d) => eventsWithSession(Tables.events(s, d))),
    "q_join_overlap" -> ((s, d) => sessionTypeOverlaps(Tables.events(s, d))))

  val oracleSql: Map[String, String] = Map(
    "q_join_range" ->
      s"""WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS ms FROM events),
         |g AS (SELECT user_id, ms,
         |        CASE WHEN ms - lag(ms) OVER (PARTITION BY user_id ORDER BY ms) > ${WindowsBatch.SessionGapMs}
         |             OR lag(ms) OVER (PARTITION BY user_id ORDER BY ms) IS NULL
         |        THEN 1 ELSE 0 END AS brk
         |      FROM e),
         |si AS (SELECT user_id, ms,
         |        sum(brk) OVER (PARTITION BY user_id ORDER BY ms
         |                       ROWS UNBOUNDED PRECEDING) AS sid
         |      FROM g),
         |sess AS (SELECT user_id, min(ms) AS session_start,
         |           max(ms) + ${WindowsBatch.SessionGapMs} AS session_end
         |         FROM si GROUP BY user_id, sid)
         |SELECT e.event_id, e.user_id, e.ms AS t, s.session_start, s.session_end
         |FROM e JOIN sess s ON e.user_id = s.user_id
         |  AND e.ms >= s.session_start AND e.ms < s.session_end""".stripMargin,
    "q_join_overlap" ->
      s"""WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
         |g AS (SELECT user_id, ms,
         |        CASE WHEN ms - lag(ms) OVER (PARTITION BY user_id ORDER BY ms) > ${WindowsBatch.SessionGapMs}
         |             OR lag(ms) OVER (PARTITION BY user_id ORDER BY ms) IS NULL
         |        THEN 1 ELSE 0 END AS brk
         |      FROM e),
         |si AS (SELECT user_id, ms,
         |        sum(brk) OVER (PARTITION BY user_id ORDER BY ms
         |                       ROWS UNBOUNDED PRECEDING) AS sid
         |      FROM g),
         |sess AS (SELECT user_id, min(ms) AS session_start,
         |           max(ms) + ${WindowsBatch.SessionGapMs} AS session_end
         |         FROM si GROUP BY user_id, sid),
         |spans AS (SELECT ms // 86400000 AS day, event_type,
         |            min(ms) AS span_start, max(ms) + 1 AS span_end
         |          FROM e GROUP BY 1, 2)
         |SELECT s.user_id, s.session_start, p.event_type, p.day,
         |  least(s.session_end, p.span_end) - greatest(s.session_start, p.span_start) AS overlap_ms
         |FROM sess s JOIN spans p
         |  ON s.session_start < p.span_end AND p.span_start < s.session_end""".stripMargin)
}
