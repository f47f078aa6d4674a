package graft.streaming

import graft.SparkSpec
import graft.sources.Sources
import org.apache.spark.sql.functions._

/** Event-time window semantics over a deterministic MemoryStream, mirroring
  * the reference's SlideWindowTest/SessionWindowTest scenarios: epoch-aligned
  * [start, start+size) bounds, hand-placed timestamps, watermark-driven
  * emission (a flush event advances the watermark to finalize windows).
  */
case class StreamEvent(ts: java.sql.Timestamp, key: String, v: Double)

class StreamWindowsSpec extends SparkSpec {

  private type E = StreamEvent
  private def e(ms: Long, key: String, v: Double) = StreamEvent(new java.sql.Timestamp(ms), key, v)

  private def run(events: Seq[E], flushMs: Long,
      build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      name: String): Seq[org.apache.spark.sql.Row] = {
    import spark.implicits._
    val src = Sources.memoryStream[E](spark)
    val q = build(src.toDS().toDF())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      src.addData(events)
      q.processAllAvailable()
      src.addData(Seq(e(flushMs, "__flush__", 0.0))) // advance watermark
      q.processAllAvailable()
      spark.table(name).collect().toSeq
    } finally q.stop()
  }

  test("tumble: epoch-aligned [start, start+size) windows per key") {
    // 10s windows; events at 1s, 9s land in [0,10s); 11s lands in [10s,20s)
    val rows = run(
      Seq(e(1000, "a", 1.0), e(9000, "a", 2.0), e(11000, "a", 3.0)),
      60000,
      df => StreamWindows.tumble(df, "ts", "10 seconds", Seq("key"),
        Seq(count(lit(1)).as("n"), sum(col("v")).as("s"))),
      "tumble1").filter(_.getAs[String]("key") == "a")
    val got = rows.map(r => (r.getAs[Long]("window_start"), r.getAs[Long]("window_end"),
      r.getAs[Long]("n"), r.getAs[Double]("s"))).sortBy(_._1)
    assert(got == Seq((0L, 10000L, 2L, 3.0), (10000L, 20000L, 1L, 3.0)))
  }

  test("slide: size 10s / slide 5s -> each event in two windows") {
    val rows = run(
      Seq(e(7000, "a", 1.0)),
      60000,
      df => StreamWindows.slide(df, "ts", "10 seconds", "5 seconds", Seq("key"),
        Seq(count(lit(1)).as("n"))),
      "slide1").filter(_.getAs[String]("key") == "a")
    val got = rows.map(r => (r.getAs[Long]("window_start"), r.getAs[Long]("window_end"))).sortBy(_._1)
    assert(got == Seq((0L, 10000L), (5000L, 15000L)))
  }

  test("session: gap closes after silence; window = [first, last+gap)") {
    // gap 5s: events at 0, 3s, 6s chain into one session [0, 11s);
    // event at 20s opens a second session [20s, 25s)
    val rows = run(
      Seq(e(0, "u", 1.0), e(3000, "u", 1.0), e(6000, "u", 1.0), e(20000, "u", 1.0)),
      90000,
      df => StreamWindows.session(df, "ts", "5 seconds", Seq("key"),
        Seq(count(lit(1)).as("n"))),
      "sess1").filter(_.getAs[String]("key") == "u")
    val got = rows.map(r => (r.getAs[Long]("session_start"), r.getAs[Long]("session_end"),
      r.getAs[Long]("n"))).sortBy(_._1)
    assert(got == Seq((0L, 11000L, 3L), (20000L, 25000L, 1L)))
  }

  test("heartbeat: window closes on an idle stream (D3 noDataDelay)") {
    // One data row at 1s into a 10s tumble window, then NO further data rows:
    // only heartbeat rows arrive. The heartbeats must advance the watermark
    // past 10s so the [0,10s) window emits — and must not appear in the
    // output themselves (they carry null keys and are filtered post-watermark).
    import spark.implicits._
    val src = Sources.memoryStream[E](spark)
    val hb = Sources.memoryStream[E](spark)
    val q = StreamWindows.tumble(src.toDS().toDF(), "ts", "10 seconds", Seq("key"),
        Seq(count(lit(1)).as("n"), sum(col("v")).as("s")),
        heartbeat = Some(hb.toDS().toDF().select(col("ts"))))
      .writeStream.format("memory").queryName("hb1").outputMode("append").start()
    try {
      src.addData(Seq(e(1000, "a", 5.0)))
      q.processAllAvailable()
      assert(spark.table("hb1").isEmpty, "window must stay open before any heartbeat")
      hb.addData(Seq(e(60000, "", 0.0))) // heartbeat-only micro-batch
      q.processAllAvailable()
      hb.addData(Seq(e(61000, "", 0.0))) // second tick lets the advanced watermark evict state
      q.processAllAvailable()
      val got = spark.table("hb1").collect().toSeq.map(r =>
        (r.getAs[Long]("window_start"), r.getAs[Long]("window_end"),
          r.getAs[String]("key"), r.getAs[Long]("n"), r.getAs[Double]("s")))
      assert(got == Seq((0L, 10000L, "a", 1L, 5.0)))
    } finally q.stop()
  }

  test("watermark: reorder within bound is absorbed, like the reference's buffer") {
    // default 1s watermark; out-of-order events 1.2s/0.8s in one batch still
    // land in their correct windows (TimeWindowTest.java:29-64 semantics)
    val rows = run(
      Seq(e(1200, "a", 1.0), e(800, "a", 2.0)),
      60000,
      df => StreamWindows.tumble(df, "ts", "1 second", Seq("key"),
        Seq(sum(col("v")).as("s"))),
      "wm1").filter(_.getAs[String]("key") == "a")
    val got = rows.map(r => (r.getAs[Long]("window_start"), r.getAs[Double]("s"))).sortBy(_._1)
    assert(got == Seq((0L, 2.0), (1000L, 1.0)))
  }
}
