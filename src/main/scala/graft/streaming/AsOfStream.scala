package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of join: enrich a left event stream with the latest right
  * event at-or-before each left row's EVENT time, per key — `ops.AsOf`'s
  * semantics under Structured Streaming. Spark's built-in stream-stream
  * joins can't express "the single latest match" (they emit every row in a
  * time range); the reference's dimension join (SURVEY §2.2) is the
  * processing-time approximation. This operator is event-time exact for any
  * arrival order within the watermark:
  *
  *   - state per key = the right rows that some future left row could still
  *     select: everything newer than the watermark, plus ONE floor row (the
  *     newest right at-or-below the watermark) — any left row not yet seen
  *     has event time >= watermark, so older rights are unreachable;
  *   - each micro-batch replays its rows in event-time order (right before
  *     left at ties — the ASOF `>=` convention), so intra-batch disorder and
  *     cross-batch disorder resolve identically to the batch operator.
  *
  * State is O(rights within watermark delay) per key, evicted every batch;
  * fully idle keys are dropped by event-time timeout like `OverWindows`.
  */
object AsOfStream {

  case class L(key: Long, time: Long, value: Double)
  case class R(key: Long, time: Long, rvalue: Double)
  case class Out(key: Long, time: Long, value: Double,
      rTime: Option[Long], rValue: Option[Double])

  /** Union row: left and right streams interleaved, tagged. */
  case class Ev(key: Long, time: Long, isLeft: Boolean, value: Double,
      eventTime: java.sql.Timestamp)
  case class St(rights: List[(Long, Double)]) // ascending by time

  private def step(evs: Seq[Ev], buffered: List[(Long, Double)],
      watermarkMs: Long): (Seq[Out], List[(Long, Double)]) = {
    var rights = buffered
    val out = evs.sortBy(e => (e.time, e.isLeft)).flatMap { e =>
      if (!e.isLeft) {
        // insert keeping ascending time order (duplicates: newest wins later)
        val (lo, hi) = rights.partition(_._1 <= e.time)
        rights = lo ++ ((e.time, e.value) :: hi)
        None
      } else {
        val m = rights.iterator.takeWhile(_._1 <= e.time)
          .foldLeft(Option.empty[(Long, Double)])((_, r) => Some(r))
        Some(Out(e.key, e.time, e.value, m.map(_._1), m.map(_._2)))
      }
    }
    // evict rights no future left (time >= watermark) can select: all but
    // the newest of those at-or-below the watermark
    val (old, fresh) = rights.partition(_._1 <= watermarkMs)
    (out, old.lastOption.toList ++ fresh)
  }

  def join(
      left: Dataset[L],
      right: Dataset[R],
      watermarkDelay: String = "1 second",
      idleTimeoutMs: Long = 3600000L): Dataset[Out] = {
    val spark = left.sparkSession
    import spark.implicits._
    val tagged = left
      .select(col("key"), col("time"), lit(true).as("isLeft"), col("value"),
        timestamp_millis(col("time")).as("eventTime"))
      .unionByName(right.select(col("key"), col("time"), lit(false).as("isLeft"),
        col("rvalue").as("value"), timestamp_millis(col("time")).as("eventTime")))
      .withWatermark("eventTime", watermarkDelay)
      .as[Ev]
    tagged
      .groupByKey(_.key)
      .flatMapGroupsWithState[St, Out](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: Long, it: Iterator[Ev], state: GroupState[St]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val wm = state.getCurrentWatermarkMs()
            val (out, rights) =
              step(it.toSeq, state.getOption.map(_.rights).getOrElse(Nil), wm)
            if (rights.isEmpty) state.remove()
            else {
              state.update(St(rights))
              state.setTimeoutTimestamp(
                math.max(rights.last._1 + idleTimeoutMs, wm + 1))
            }
            out.iterator
          }
      }
  }
}
