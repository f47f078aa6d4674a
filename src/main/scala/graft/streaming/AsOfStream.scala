package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Streaming as-of join: enrich a left event stream with the latest right
  * event at-or-before each left row's EVENT time, per key — `ops.AsOf`'s
  * semantics under Structured Streaming, with `ops.AsOf.asofJoin`'s generic
  * signature (DataFrames + key/time/value column names; state and output are
  * Row-encoded against schemas derived from the inputs). Spark's built-in
  * stream-stream joins can't express "the single latest match" (they emit
  * every row in a time range); the reference's dimension join (SURVEY §2.2)
  * is the processing-time approximation.
  *
  * Event-time exactness for ANY arrival order within the watermark — in
  * particular a right row arriving in a LATER micro-batch than the left row
  * it should match:
  *
  *   - LEFT rows buffer in state and emit only once the watermark passes
  *     strictly beyond their event time: at that point every right at-or-
  *     before the left's time has either arrived or is late-dropped by the
  *     watermark filter, so the match is final. (Emitting lefts eagerly in
  *     their arrival batch — the round-5 behavior — silently missed rights
  *     that lagged by one trigger.)
  *   - RIGHT state per key = everything a pending or future left could still
  *     select: rights newer than the watermark, plus ONE floor row (the
  *     newest right at-or-below the watermark) that dominates all older
  *     rights for every remaining left.
  *
  * Both buffers are time-sorted arrays maintained by single-pass sorted
  * MERGE per micro-batch (O((state+batch)·log batch), never a per-row
  * rebuild); matching is a binary floor-search. State is O(watermark delay)
  * per key, evicted every batch; idle keys expire by event-time timeout.
  *
  * The cost of exactness is latency: a left emits when the watermark passes
  * it, i.e. about `watermarkDelay` after its event time — the same trade
  * Spark's own append-mode windowed aggregates make. The watermark is
  * computed over the UNION of both streams, so `watermarkDelay` must cover
  * the worst cross-stream lag.
  */
object AsOfStream {

  /** One micro-batch step, pure for unit testing. `newEvents` are
    * (time, isLeft, payload); `pending`/`rights` are the time-sorted state
    * buffers; equal-time rights replace (newest arrival wins — same
    * "unique per (keys, time)" contract as the batch operator). Returns
    * (matured outputs in time order, remaining pending lefts, kept rights).
    */
  private[streaming] def step(
      newEvents: Seq[(Long, Boolean, Row)],
      pending0: IndexedSeq[(Long, Row)],
      rights0: IndexedSeq[(Long, Row)],
      wm: Long): (Seq[(Long, Row, Option[Row])], IndexedSeq[(Long, Row)], IndexedSeq[(Long, Row)]) = {

    val inLefts = newEvents.iterator.collect { case (t, true, p) => (t, p) }
      .toArray.sortBy(_._1)
    val inRights = newEvents.iterator.collect { case (t, false, p) => (t, p) }
      .toArray.sortBy(_._1) // stable: equal-time keeps arrival order

    // rights: replace on equal time (incoming / later-arrival wins — the
    // "unique per (key, time)" right-side contract); pending lefts: keep
    // equal-time duplicates, buffered-first (distinct lefts may share a time)
    val rights = ReorderBuffer.mergeSorted(rights0, inRights.toIndexedSeq, replaceEqual = true)
    val pending = ReorderBuffer.mergeSorted(pending0, inLefts.toIndexedSeq, replaceEqual = false)

    val rightTimes = rights.map(_._1)
    def upperBound(t: Long): Int = ReorderBuffer.upperBound(rightTimes, t)

    // mature lefts with t STRICTLY below the watermark: any right <= t that
    // the watermark would still accept has arrived (ties at t == wm wait one
    // more advance, because a right at exactly t may still be accepted)
    val matureN = {
      var n = 0
      while (n < pending.length && pending(n)._1 < wm) n += 1
      n
    }
    val out = (0 until matureN).map { idx =>
      val (t, lv) = pending(idx)
      val ub = upperBound(t)
      (t, lv, if (ub == 0) None else Some(rights(ub - 1)._2))
    }

    // evict rights no remaining left (all have t >= wm) can distinguish:
    // everything below the newest right at-or-below the watermark
    val keepFrom = math.max(0, upperBound(wm) - 1)
    (out, pending.drop(matureN).toIndexedSeq, rights.drop(keepFrom).toIndexedSeq)
  }

  /** As-of join `left` with `right` on `keys`: each left row gains
    * `valueCols` and `rightTime` (suffixed) from the latest right row with
    * `rightTime <= leftTime` in the same key, nulls if none (LEFT
    * semantics, ties match — exactly `ops.AsOf.asofJoin`). Works on
    * streaming inputs (watermark-exact, see class doc) and on batch inputs
    * (same code path, everything matures — the specs cross-check it against
    * the batch operator).
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      valueCols: Seq[String],
      suffix: String = "_r",
      watermarkDelay: String = "1 second",
      idleTimeoutMs: Long = 3600000L): DataFrame = {
    val leftCols = left.columns.toSeq
    val leftNonKey = leftCols.filterNot(keys.contains)
    val rightVals = (valueCols :+ rightTime).map(_ + suffix)
    val streaming = left.isStreaming || right.isStreaming

    val keySchema = StructType(keys.map(k => left.schema(k)).toArray)
    val lvSchema = StructType(leftNonKey.map(c => left.schema(c)).toArray)
    val rvSchema = StructType((valueCols :+ rightTime).map(c => right.schema(c)).toArray)
    val stateSchema = StructType(Seq(
      StructField("pend", ArrayType(StructType(Seq(
        StructField("t", LongType), StructField("lv", lvSchema))))),
      StructField("rts", ArrayType(StructType(Seq(
        StructField("t", LongType), StructField("rv", rvSchema)))))))
    val outSchema = StructType(
      (keys.map(k => left.schema(k)) ++ leftNonKey.map(c => left.schema(c)) ++
        rvSchema.fields.zip(rightVals).map { case (f, n) =>
          StructField(n, f.dataType, nullable = true)
        }).toArray)

    val keyEnc: Encoder[Row] = Encoders.row(keySchema)
    val stateEnc: Encoder[Row] = Encoders.row(stateSchema)
    val outEnc: Encoder[Row] = Encoders.row(outSchema)

    // Event time → epoch MILLIS. A bare cast("long") on a TimestampType
    // column yields epoch SECONDS, silently coarsening event time to 1 s and
    // diverging from batch `ops.AsOf.asofJoin` (which orders on the raw
    // column with sub-second precision) — timestamps go through unix_millis
    // instead. Integral columns pass through in the caller's own unit.
    def toMillis(df: DataFrame, c: String): Column = df.schema(c).dataType match {
      case TimestampType => unix_millis(col(c))
      case _ => col(c).cast("long")
    }
    val taggedLeft = left.select(
      struct(keys.map(col): _*).as("__k"),
      toMillis(left, leftTime).as("__t"),
      lit(true).as("__isleft"),
      struct(leftNonKey.map(col): _*).as("__lv"),
      lit(null).cast(rvSchema).as("__rv"))
    val taggedRight = right.select(
      struct(keys.map(col): _*).as("__k"),
      toMillis(right, rightTime).as("__t"),
      lit(false).as("__isleft"),
      lit(null).cast(lvSchema).as("__lv"),
      struct((valueCols :+ rightTime).map(col): _*).as("__rv"))
    val union = taggedLeft.unionByName(taggedRight)
      .withColumn("__eventTime", timestamp_millis(col("__t")))
    val watermarked =
      if (streaming) union.withWatermark("__eventTime", watermarkDelay) else union

    def decode(s: Row, idx: Int): IndexedSeq[(Long, Row)] =
      s.getSeq[Row](idx).map(r => (r.getLong(0), r.getStruct(1))).toIndexedSeq
    def encode(pend: IndexedSeq[(Long, Row)], rts: IndexedSeq[(Long, Row)]): Row =
      Row(pend.map { case (t, r) => Row(t, r) }, rts.map { case (t, r) => Row(t, r) })
    val rvNulls: Seq[Any] = Seq.fill(rvSchema.length)(null)

    val func = (k: Row, it: Iterator[Row], state: GroupState[Row]) => {
      val wm = if (streaming) state.getCurrentWatermarkMs() else Long.MaxValue
      val events = it.map(r => (r.getLong(1), r.getBoolean(2),
        if (r.getBoolean(2)) r.getStruct(3) else r.getStruct(4))).toSeq
      val (pending0, rights0) = state.getOption
        .map(s => (decode(s, 0), decode(s, 1)))
        .getOrElse((IndexedSeq.empty[(Long, Row)], IndexedSeq.empty[(Long, Row)]))
      val (out, pending, rights) = step(events, pending0, rights0, wm)
      if (pending.isEmpty && rights.isEmpty) { if (state.exists) state.remove() }
      else {
        state.update(encode(pending, rights))
        if (streaming) {
          // wake when the watermark is strictly past the oldest pending
          // left (its maturity grade); a key with only rights expires
          // after idleTimeoutMs of silence
          val at = ReorderBuffer.wakeAt(
            pending.headOption.map(_._1), wm, strict = true,
            orElse = rights.last._1 + idleTimeoutMs)
          state.setTimeoutTimestamp(at)
        }
      }
      out.iterator.map { case (_, lv, rv) =>
        Row.fromSeq(k.toSeq ++ lv.toSeq ++ rv.map(_.toSeq).getOrElse(rvNulls))
      }
    }

    val timeoutConf =
      if (streaming) GroupStateTimeout.EventTimeTimeout() else GroupStateTimeout.NoTimeout()
    watermarked
      .groupByKey((r: Row) => r.getStruct(0))(keyEnc)
      .flatMapGroupsWithState[Row, Row](OutputMode.Append(), timeoutConf)(func)(stateEnc, outEnc)
      .select((leftCols ++ rightVals).map(col): _*)
  }
}
