package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (time-travel) join: for every left row, attach the single right row
  * with the greatest right-time <= left-time within the same key — "the
  * latest state known at event time". The reference has no such operator
  * (its nearest is the refresh-pinned dimension join, SURVEY §2.2, which is
  * as-of NOW rather than as-of each row's time).
  *
  * Implementation is the scale-safe union+window formulation, NOT a range
  * join: tag both inputs, union, and propagate the right side's values down
  * each key's timeline with `last(ignoreNulls) OVER (... ROWS UNBOUNDED
  * PRECEDING)`. Cost = ONE shuffle on the key + a per-partition sort —
  * identical shape to a sort-merge join — where a naive `l.t >= r.t` theta
  * join explodes to |matches| rows per key before picking the max. At 100 TB
  * the window never materializes more than its running state per key; hot
  * keys fall under the same salting/AQE-skew story as any keyed shuffle.
  *
  * Ties (equal left/right time) match the right row — DuckDB ASOF JOIN
  * semantics (l.t >= r.t), which the oracle uses natively.
  */
object AsOf {

  /** Left rows get `valueCols` (suffixed) and the right event time
    * (`<rightTime><suffix>`) from the latest right row at-or-before their
    * time; unmatched left rows keep nulls (LEFT semantics). Right rows must
    * be unique per (keys, rightTime) — pre-aggregate if not, or the choice
    * among equal-time rows is undefined in any engine.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      valueCols: Seq[String],
      suffix: String = "_r"): DataFrame = {
    val leftCols = left.columns.toSeq
    val sideT = "__asof_t"
    val sideFlag = "__asof_left"
    val rvT = "__asof_rv"
    val sideVals = valueCols :+ rightTime

    // One STRUCT per right row, not per-column carries: the struct is
    // non-null for every right row even when individual value columns are
    // null, so `last(ignoreNulls)` elects a single right row atomically —
    // per-column carries could stitch values (and the carried rightTime)
    // from DIFFERENT right rows when value columns are nullable.
    val taggedRight = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as(sideT), lit(false).as(sideFlag)) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(sideVals.map(col): _*).as(rvT): _*)
    val taggedLeft = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as(sideT), lit(true).as(sideFlag)) ++
        leftCols.filterNot(keys.contains).map(col) :+
        lit(null).cast(taggedRight.schema(rvT).dataType).as(rvT): _*)

    // Right rows sort BEFORE left rows at equal time (false < true), so an
    // equal-time right row is visible to the left row — ASOF `>=` semantics.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(sideT).asc, col(sideFlag).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = taggedLeft.unionByName(taggedRight)
      .withColumn(rvT, last(col(rvT), ignoreNulls = true).over(w))
    filled.filter(col(sideFlag))
      .select(leftCols.map(col) ++
        sideVals.map(c => col(rvT)(c).as(c + suffix)): _*)
  }

  /** Demo query: each click event annotated with the user's most recent
    * error value at click time. Error rows are pre-aggregated to one per
    * (user, time) so the as-of choice is well-defined.
    */
  def clicksWithLastError(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("__time__"), col("value"))
    val errors = events.filter(col("event_type") === "error")
      .groupBy(col("user_id"), col("__time__").as("err_time"))
      .agg(round(max(col("value")), 2).as("err_value"))
    asofJoin(clicks, errors, Seq("user_id"), "__time__", "err_time", Seq("err_value"))
      .select(col("event_id"), col("user_id"), col("__time__").as("t"),
        round(col("value"), 2).as("value"),
        col("err_value_r").as("err_value"), col("err_time_r").as("err_time"))
  }

  /** As-of join with a max-staleness bound — the feature-store
    * point-in-time contract ("the latest feature value, but only if it is
    * fresh enough"): same single-shuffle union+window join, then matches
    * older than `toleranceMs` are nulled as if absent. The post-gate is
    * map-only over the joined rows; no second pass, no extra shuffle.
    */
  def asofJoinWithin(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, valueCols: Seq[String],
      toleranceMs: Long, suffix: String = "_r"): DataFrame = {
    val joined = asofJoin(left, right, keys, leftTime, rightTime, valueCols, suffix)
    val fresh = col(leftTime) - col(rightTime + suffix) <= toleranceMs
    (valueCols :+ rightTime).map(_ + suffix).foldLeft(joined) { (df, c) =>
      df.withColumn(c, when(fresh, col(c)))
    }
  }

  /** NEAREST-event join: attach the right row temporally closest to each
    * left row (looking BOTH ways) within `toleranceMs`, ties preferring the
    * backward (at-or-before) match — sensor/log alignment semantics, where
    * plain as-of silently picks a stale reading over a fresher one that
    * arrived just after. Equal-time rights count as backward with Δ=0.
    *
    * Same single-shuffle union+window shape as [[asofJoin]]: ONE exchange
    * on the key serves two frames over the same sort — `last(ignoreNulls)
    * ROWS UNBOUNDED PRECEDING` (backward carry) and `first(ignoreNulls)
    * ROWS UNBOUNDED FOLLOWING` (forward carry) — then a map-side argmin
    * picks the direction. No second join, no candidate fan-out, per-key
    * window state is two scalars at any scale.
    */
  def nearestJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      valueCols: Seq[String],
      toleranceMs: Long,
      suffix: String = "_r"): DataFrame = {
    require(toleranceMs >= 0, "toleranceMs must be non-negative")
    val leftCols = left.columns.toSeq
    val sideT = "__near_t"
    val sideFlag = "__near_left"
    val rvT = "__near_rv"
    val sideVals = valueCols :+ rightTime

    // One STRUCT carry per direction (see asofJoin): elects a single right
    // row atomically per direction, so nullable right value columns can
    // never mix values — or the tolerance-checked rightTime — across rows.
    val taggedRight = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as(sideT), lit(false).as(sideFlag)) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(sideVals.map(col): _*).as(rvT): _*)
    val taggedLeft = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as(sideT), lit(true).as(sideFlag)) ++
        leftCols.filterNot(keys.contains).map(col) :+
        lit(null).cast(taggedRight.schema(rvT).dataType).as(rvT): _*)

    // Right rows sort before left rows at equal time, so the backward frame
    // sees an equal-time right (>= semantics) and the forward frame starts
    // strictly after it — Δ=0 is claimed exactly once, as backward.
    val ord = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(sideT).asc, col(sideFlag).asc)
    val wB = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = taggedLeft.unionByName(taggedRight)
      .withColumn("__b", last(col(rvT), ignoreNulls = true).over(wB))
      .withColumn("__f", first(col(rvT), ignoreNulls = true).over(wF))
    val tB = col("__b")(rightTime)
    val tF = col("__f")(rightTime)
    val t = col(sideT)
    val backOk = tB.isNotNull && (t - tB <= toleranceMs)
    val fwdOk = tF.isNotNull && (tF - t <= toleranceMs)
    // backward wins when in-tolerance and at least as close as the forward
    val useB = backOk && (!fwdOk || (t - tB) <= (tF - t))
    filled.filter(col(sideFlag))
      .select(leftCols.map(col) ++ sideVals.map(c =>
        when(useB, col("__b")(c)).when(fwdOk, col("__f")(c)).as(c + suffix)): _*)
  }

  val AsofToleranceMs: Long = 24L * 3600 * 1000

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_asof" -> ((s, d) => clicksWithLastError(Tables.events(s, d))),
    "q_join_asof_tol" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("__time__"))
      val errors = ev.filter(col("event_type") === "error")
        .groupBy(col("user_id"), col("__time__").as("err_time"))
        .agg(round(max(col("value")), 2).as("err_value"))
      asofJoinWithin(clicks, errors, Seq("user_id"), "__time__", "err_time",
        Seq("err_value"), AsofToleranceMs)
        .select(col("event_id"), col("user_id"), col("__time__").as("t"),
          col("err_value_r").as("err_value"), col("err_time_r").as("err_time"))
    }),
    "q_join_nearest" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("__time__"))
      val errors = ev.filter(col("event_type") === "error")
        .groupBy(col("user_id"), col("__time__").as("err_time"))
        .agg(round(max(col("value")), 2).as("err_value"))
      nearestJoin(clicks, errors, Seq("user_id"), "__time__", "err_time",
        Seq("err_value"), AsofToleranceMs)
        .select(col("event_id"), col("user_id"), col("__time__").as("t"),
          col("err_value_r").as("err_value"), col("err_time_r").as("err_time"))
    }))

  val oracleSql: Map[String, String] = Map(
    "q_join_asof" ->
      """WITH l AS (SELECT event_id, user_id, epoch_ms(ts) AS t, round(value, 2) AS value
        |           FROM events WHERE event_type = 'click'),
        |r AS (SELECT user_id, epoch_ms(ts) AS err_time, round(max(value), 2) AS err_value
        |      FROM events WHERE event_type = 'error' GROUP BY 1, 2)
        |SELECT l.event_id, l.user_id, l.t, l.value, r.err_value, r.err_time
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.t >= r.err_time""".stripMargin,

    "q_join_asof_tol" ->
      s"""WITH l AS (SELECT event_id, user_id, epoch_ms(ts) AS t
         |           FROM events WHERE event_type = 'click'),
         |r AS (SELECT user_id, epoch_ms(ts) AS err_time, round(max(value), 2) AS err_value
         |      FROM events WHERE event_type = 'error' GROUP BY 1, 2),
         |j AS (SELECT l.event_id, l.user_id, l.t, r.err_value, r.err_time
         |      FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.t >= r.err_time)
         |SELECT event_id, user_id, t,
         |  CASE WHEN t - err_time <= $AsofToleranceMs THEN err_value END AS err_value,
         |  CASE WHEN t - err_time <= $AsofToleranceMs THEN err_time END AS err_time
         |FROM j""".stripMargin,

    // independent quadratic-candidate formulation: every in-tolerance error
    // ranked by (|Δ|, backward-first) — must equal the two-frame window pick
    "q_join_nearest" ->
      s"""WITH l AS (SELECT event_id, user_id, epoch_ms(ts) AS t
         |           FROM events WHERE event_type = 'click'),
         |r AS (SELECT user_id, epoch_ms(ts) AS err_time, round(max(value), 2) AS err_value
         |      FROM events WHERE event_type = 'error' GROUP BY 1, 2),
         |cand AS (SELECT l.event_id, l.user_id, l.t, r.err_value, r.err_time,
         |           abs(r.err_time - l.t) AS ad,
         |           CASE WHEN r.err_time <= l.t THEN 0 ELSE 1 END AS dir
         |         FROM l JOIN r ON r.user_id = l.user_id
         |           AND abs(r.err_time - l.t) <= $AsofToleranceMs),
         |p AS (SELECT *, row_number() OVER (PARTITION BY event_id
         |        ORDER BY ad, dir) AS rn FROM cand)
         |SELECT event_id, user_id, t, err_value, err_time FROM p WHERE rn = 1
         |UNION ALL
         |SELECT l.event_id, l.user_id, l.t, NULL::DOUBLE, NULL::BIGINT
         |FROM l WHERE NOT EXISTS (SELECT 1 FROM cand WHERE cand.event_id = l.event_id)""".stripMargin)
}
