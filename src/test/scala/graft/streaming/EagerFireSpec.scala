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
}
