package graft.streaming

import graft.SparkSpec
import graft.ops.Behavior
import graft.sources.Sources
import org.apache.spark.sql.DataFrame

case class VEvent(ts: java.sql.Timestamp, user: Long, id: Long, value: Double)

/** Streaming anomaly detection vs the batch op: same rows, bit-identical z,
  * under any micro-batching and intra-batch disorder.
  */
class AnomalyStreamSpec extends SparkSpec {

  import spark.implicits._

  private def e(ms: Long, user: Long, id: Long, v: Double) =
    VEvent(new java.sql.Timestamp(ms), user, id, v)

  private def runStream(batches: Seq[Seq[VEvent]], name: String): Seq[AnomalyStream.AnomalyRow] = {
    val src = Sources.memoryStream[VEvent](spark)
    val out = AnomalyStream.anomalies(src.toDS().toDF(), "ts", "user", "id", "value",
      watermark = "1 hour")
    val q = out.writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => src.addData(b); q.processAllAvailable() }
      // flush: advance the watermark far past every buffered event
      src.addData(Seq(e(1000L * 3600 * 1000, -1L, -1L, 0.0)))
      q.processAllAvailable()
      spark.table(name).as[AnomalyStream.AnomalyRow].collect().toSeq
    } finally q.stop()
  }

  private def batchRows(evs: Seq[VEvent]): Seq[AnomalyStream.AnomalyRow] =
    Behavior.anomalies(
      evs.map(v => (v.id, v.user, v.ts.getTime, v.value)).toDF("event_id", "user_id", "__time__", "value"))
      .as[AnomalyStream.AnomalyRow].collect().toSeq

  // two users: one noisy history + spike, one with an interleaved dip; ids
  // give total order inside equal timestamps
  private val fixture: Seq[VEvent] = {
    val noisy = (1 to 12).map(i => e(i * 60000L, 1L, i.toLong, if (i % 2 == 0) 9.0 else 11.0))
    val spike = Seq(e(13 * 60000L, 1L, 13L, 120.0), e(14 * 60000L, 1L, 14L, 10.0))
    val other = (1 to 10).map(i => e(i * 70000L, 2L, 100L + i, 50.0 + (i % 3))) ++
      Seq(e(11 * 70000L, 2L, 111L, 0.5))
    noisy ++ spike ++ other
  }

  test("streaming rows == batch rows, z bit-identical") {
    val got = runStream(Seq(fixture), "anom_eq").sortBy(_.event_id)
    val want = batchRows(fixture).sortBy(_.event_id)
    assert(want.nonEmpty, "fixture must actually fire")
    assert(got == want)
  }

  test("emission is micro-batch-boundary independent") {
    val a = runStream(Seq(fixture), "anom_one").sortBy(_.event_id)
    val b = runStream(fixture.grouped(4).toSeq, "anom_many").sortBy(_.event_id)
    assert(a == b)
  }

  test("intra-batch disorder folds in event-time order") {
    val shuffled = fixture.reverse
    val got = runStream(Seq(shuffled), "anom_dis").sortBy(_.event_id)
    assert(got == batchRows(fixture).sortBy(_.event_id))
  }

  test("trailing state is capped at the frame size") {
    // 100 events; history ring must hold at most AnomalyFrame values — the
    // 101st event's n is exactly frame, not 100
    val evs = (1 to 100).map(i => e(i * 60000L, 3L, i.toLong, if (i % 2 == 0) 9.0 else 11.0)) :+
      e(101 * 60000L, 3L, 101L, 99.0)
    val got = runStream(Seq(evs), "anom_cap")
    val spike = got.filter(_.event_id == 101L)
    assert(spike.map(_.n) == Seq(Behavior.AnomalyFrame.toLong))
  }
}
