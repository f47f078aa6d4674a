package graft.streaming

import graft.SparkSpec
import graft.sources.Sources

/** D1 cadence pin: `eagerTumble` fires a window in the SAME trigger round
  * that delivers its closing event (the reference's per-event firing,
  * SlideWindow.java:238-261), and a row arriving after its window fired
  * emits a single-element window immediately (SlideWindow.java:345-366) —
  * the two halves of the reference's observable schedule.
  */
class EagerFireSpec extends SparkSpec {

  private def ev(ms: Long, key: Long, v: Double) =
    StreamEvent(new java.sql.Timestamp(ms), key.toString, v)

  test("eager mode: window fires on arrival of its closing event, late row gets a singleton") {
    import spark.implicits._
    val src = Sources.memoryStream[StreamEvent](spark)
    val out = WindowedTransform.eagerTumble[RankedOut](
      src.toDS().toDF(), "ts", "key", "v", 10000) { (key, ws, we, rows) =>
      rows.sortBy(-_.value).zipWithIndex.map { case (e, i) =>
        RankedOut(key, ws, we, e.time, e.value, i + 1)
      }
    }
    val q = out.writeStream.format("memory").queryName("eager1").outputMode("append").start()
    try {
      // rows inside [0,10s): nothing past the end yet -> no fire
      src.addData(Seq(ev(1000, 1, 5.0), ev(3000, 1, 9.0), ev(9000, 2, 7.0)))
      q.processAllAvailable()
      assert(spark.table("eager1").count() == 0, "no row past the end: must not fire")

      // the CLOSING event: t=12000 is the first row past 10s. No watermark
      // delay to wait out — both keys' [0,10s) windows fire in this round.
      src.addData(Seq(ev(12000, 1, 2.0)))
      q.processAllAvailable()
      val fired = spark.table("eager1").as[RankedOut].collect()
      assert(fired.length == 3, s"both keys' windows fire on the closing event, got ${fired.toSeq}")
      assert(fired.filter(_.key == 1).map(r => (r.value, r.rk)).sortBy(_._2).toSeq ==
        Seq((9.0, 1), (5.0, 2)))
      assert(fired.filter(_.key == 2).map(r => (r.value, r.rk)).toSeq == Seq((7.0, 1)))

      // disorder after the fire = lateness under per-event cadence: the
      // reference's single-element-window rule applies immediately
      src.addData(Seq(ev(2000, 1, 4.0)))
      q.processAllAvailable()
      val late = spark.table("eager1").as[RankedOut].collect().filter(_.value == 4.0)
      assert(late.toSeq == Seq(RankedOut(1, 0, 10000, 2000, 4.0, 1)),
        "late row must emit its own [0,10s) singleton window")
    } finally q.stop()
  }

  test("eager session: gap close fires in the delivering trigger; late row = singleton or live-merge") {
    import spark.implicits._
    val src = Sources.memoryStream[StreamEvent](spark)
    val out = WindowedTransform.eagerSession[RankedOut](
      src.toDS().toDF(), "ts", "key", "v", 5000) { (key, ws, we, rows) =>
      rows.sortBy(-_.value).zipWithIndex.map { case (e, i) =>
        RankedOut(key, ws, we, e.time, e.value, i + 1)
      }
    }
    val q = out.writeStream.format("memory").queryName("eagerSess").outputMode("append").start()
    try {
      def rows() = spark.table("eagerSess").as[RankedOut].collect().toSeq

      // one live session {1000, 3000}: nothing past last+gap yet -> no fire
      src.addData(Seq(ev(1000, 1, 5.0), ev(3000, 1, 9.0)))
      q.processAllAvailable()
      assert(rows().isEmpty, "session still open: must not fire")

      // closing event: t=9000 sits gap past 3000, so [1000, 8000) fires in
      // THIS trigger round (delay-0 watermark + same-round timeout)
      src.addData(Seq(ev(9000, 1, 2.0)))
      q.processAllAvailable()
      val fired = rows()
      assert(fired.map(r => (r.ws, r.we, r.value, r.rk)).sortBy(_._4) ==
        Seq((1000L, 8000L, 9.0, 1), (1000L, 8000L, 5.0, 2)),
        s"gap close must fire [1000,8000) on the closing event, got $fired")

      // late row whose own session is already closed under the watermark
      // and out of gap range of the live {9000} session: immediate singleton
      src.addData(Seq(ev(2000, 1, 4.0)))
      q.processAllAvailable()
      assert(rows().filter(_.value == 4.0) == Seq(RankedOut(1, 2000, 7000, 2000, 4.0, 1)),
        "orphan late row must emit its own [2000,7000) singleton session")

      // late row WITHIN gap of the live session: merges (reference TreeMap
      // insert), extending the session's start — no emission yet
      src.addData(Seq(ev(5000, 1, 6.0)))
      q.processAllAvailable()
      assert(rows().length == 3, "mergeable late row must not fire anything")

      // next closing event fires the merged session with the late row IN it
      src.addData(Seq(ev(20000, 1, 1.0)))
      q.processAllAvailable()
      val merged = rows().filter(_.ws == 5000L)
      assert(merged.map(r => (r.we, r.value, r.rk)).sortBy(_._3) ==
        Seq((14000L, 6.0, 1), (14000L, 2.0, 2)),
        s"merged session [5000,14000) must contain the recovered late row, got $merged")
    } finally q.stop()
  }
}
