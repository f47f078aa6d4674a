package graft.streaming

import graft.SparkSpec
import graft.sources.Sources

case class RankedOut(key: Long, ws: Long, we: Long, time: Long, value: Double, rk: Int)
case class SessionOut(key: Long, start: Long, end: Long, n: Int)

/** Row-emitting window UDF semantics with hand-placed timestamps, mirroring
  * the reference's SlideWindowTest/SessionWindowTest scenarios: the UDF sees
  * every row of the closed window and emits N rows; windows fire when the
  * watermark passes their end.
  */
class WindowedTransformSpec extends SparkSpec {

  private def ev(ms: Long, key: Long, v: Double) =
    StreamEvent(new java.sql.Timestamp(ms), key.toString, v)

  test("tumble transform: UDF sees the whole window, emits one ranked row per input") {
    import spark.implicits._
    val src = Sources.memoryStream[StreamEvent](spark)
    val out = WindowedTransform.tumble[RankedOut](
      src.toDS().toDF(), "ts", "key", "v", 10000) { (key, ws, we, rows) =>
      rows.sortBy(-_.value).zipWithIndex.map { case (e, i) =>
        RankedOut(key, ws, we, e.time, e.value, i + 1)
      }
    }
    val q = out.writeStream.format("memory").queryName("wt1").outputMode("append").start()
    try {
      src.addData(Seq(ev(1000, 1, 5.0), ev(3000, 1, 9.0), ev(9000, 1, 7.0)))
      q.processAllAvailable()
      assert(spark.table("wt1").count() == 0, "window must not fire before watermark passes end")
      src.addData(Seq(ev(30000, 1, 1.0))) // watermark -> 29s, closes [0,10s)
      q.processAllAvailable()
      val rows = spark.table("wt1").as[RankedOut].collect().sortBy(_.rk)
      assert(rows.length == 3)
      assert(rows.forall(r => r.ws == 0L && r.we == 10000L))
      assert(rows.map(r => (r.value, r.rk)).toSeq == Seq((9.0, 1), (7.0, 2), (5.0, 3)))
    } finally q.stop()
  }

  test("slide transform: event participates in size/slide windows") {
    import spark.implicits._
    val src = Sources.memoryStream[StreamEvent](spark)
    val out = WindowedTransform.slide[RankedOut](
      src.toDS().toDF(), "ts", "key", "v", 10000, 5000) { (key, ws, we, rows) =>
      rows.map(e => RankedOut(key, ws, we, e.time, e.value, rows.length))
    }
    val q = out.writeStream.format("memory").queryName("wt2").outputMode("append").start()
    try {
      src.addData(Seq(ev(7000, 1, 1.0)))
      q.processAllAvailable()
      src.addData(Seq(ev(40000, 1, 2.0)))
      q.processAllAvailable()
      val wins = spark.table("wt2").as[RankedOut].collect()
        .filter(_.time == 7000L).map(r => (r.ws, r.we)).sorted
      assert(wins.toSeq == Seq((0L, 10000L), (5000L, 15000L)))
    } finally q.stop()
  }

  test("recoverLate emits a single-element window for past-watermark rows (D2)") {
    import spark.implicits._
    val src = Sources.memoryStream[StreamEvent](spark)
    val out = WindowedTransform.tumble[RankedOut](
      src.toDS().toDF(), "ts", "key", "v", 10000, recoverLate = true) {
      (key, ws, we, rows) =>
        rows.sortBy(-_.value).zipWithIndex.map { case (e, i) =>
          RankedOut(key, ws, we, e.time, e.value, i + 1)
        }
    }
    val q = out.writeStream.format("memory").queryName("wt_late").outputMode("append").start()
    try {
      src.addData(Seq(ev(1000, 1, 5.0), ev(3000, 1, 9.0)))
      q.processAllAvailable()
      src.addData(Seq(ev(30000, 1, 1.0))) // watermark -> 29s, closes [0,10s)
      q.processAllAvailable()
      assert(spark.table("wt_late").as[RankedOut].collect().count(_.ws == 0L) == 2)
      // hand-placed LATE row: t=2s is far behind the 29s watermark and its
      // window [0,10s) already fired — the reference emits it as its own
      // single-element window instead of dropping it
      src.addData(Seq(ev(2000, 1, 4.0)))
      q.processAllAvailable()
      val late = spark.table("wt_late").as[RankedOut].collect()
        .filter(r => r.ws == 0L && r.time == 2000L)
      // THE GATE for the EventTimeWatermark.delayKey metadata pin
      // (WindowedTransform.slide): if a Spark upgrade changes the internal
      // late-filter contract, the late row silently drops and THIS fails.
      assert(late.length == 1,
        "late row must surface as a recovered window — the delayKey metadata " +
          "trick no longer delivers behind-watermark rows on this Spark version")
      assert(late.head.value == 4.0 && late.head.rk == 1,
        "recovered window contains exactly the late row")
      // on-time flow is unaffected: later windows still fire normally
      src.addData(Seq(ev(60000, 1, 2.0)))
      q.processAllAvailable()
      assert(spark.table("wt_late").as[RankedOut].collect().exists(_.ws == 30000L))
    } finally q.stop()
  }

  test("session transform: reference gap semantics, [first, last+gap) bounds") {
    import spark.implicits._
    val src = Sources.memoryStream[StreamEvent](spark)
    val out = WindowedTransform.session[SessionOut](
      src.toDS().toDF(), "ts", "key", "v", 5000) { (key, start, end, rows) =>
      Seq(SessionOut(key, start, end, rows.length))
    }
    val q = out.writeStream.format("memory").queryName("wt3").outputMode("append").start()
    try {
      // NB: start at t=100s — a t=0 event ties with the initial watermark (0)
      // and is discarded as late, which is Spark's contract, not a bug here.
      src.addData(Seq(ev(100000, 7, 1.0), ev(103000, 7, 1.0), ev(106000, 7, 1.0)))
      q.processAllAvailable()
      src.addData(Seq(ev(120000, 7, 1.0)))
      q.processAllAvailable()
      src.addData(Seq(ev(160000, 99, 1.0))) // other key: advances watermark, closes key 7
      q.processAllAvailable()
      val sess = spark.table("wt3").as[SessionOut].collect()
        .filter(_.key == 7L).sortBy(_.start)
      assert(sess.map(s => (s.start, s.end, s.n)).toSeq ==
        Seq((100000L, 111000L, 3), (120000L, 125000L, 1)))
    } finally q.stop()
  }

  test("splitSessions breaks when the gap reaches the timeout (reference rule)") {
    import graft.streaming.OverWindows.Event
    val rows = Seq(Event(1, 0, 1), Event(1, 4000, 1), Event(1, 9001, 1), Event(1, 20000, 1))
    val s = WindowedTransform.splitSessions(rows, 5000)
    // 9001 - 4000 = 5001 >= 5000 -> breaks (SessionWindow.java:63-77)
    assert(s.map(_.map(_.time)) == Seq(Seq(0L, 4000L), Seq(9001L), Seq(20000L)))
  }
}
