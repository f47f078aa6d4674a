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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_range" -> ((s, d) => eventsWithSession(Tables.events(s, d))))

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
         |  AND e.ms >= s.session_start AND e.ms < s.session_end""".stripMargin)
}
