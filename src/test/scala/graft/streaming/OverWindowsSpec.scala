package graft.streaming

import graft.SparkSpec
import graft.sources.Sources
import graft.streaming.OverWindows.{Event, OverOut}

/** Streaming over-window semantics with hand-placed event times, mirroring
  * the reference's deterministic window tests (SlideWindowTest.java:24-164
  * style): exact per-row trailing frames, state eviction across
  * micro-batches, and streaming == batch equivalence.
  */
class OverWindowsSpec extends SparkSpec {

  private def runStream(
      batches: Seq[Seq[Event]],
      build: org.apache.spark.sql.Dataset[Event] => org.apache.spark.sql.Dataset[OverOut],
      name: String): Seq[OverOut] = {
    import spark.implicits._
    val src = Sources.memoryStream[Event](spark)
    val q = build(src.toDS())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => src.addData(b); q.processAllAvailable() }
      spark.table(name).as[OverOut].collect().toSeq
    } finally q.stop()
  }

  test("byDuration: trailing (t-size, t] frame per key, across micro-batches") {
    // key 1: times 0, 500, 1000, 1600 with size 1000
    //   frames: {0}, {0,500}, {500,1000} (0 evicted: 1000-1000=0 not > 0), {1000,1600}
    val out = runStream(
      Seq(
        Seq(Event(1, 0, 10.0), Event(1, 500, 20.0)),
        Seq(Event(1, 1000, 30.0), Event(1, 1600, 40.0))),
      ds => OverWindows.byDuration(ds, 1000), "dur1")
      .sortBy(_.time)
    assert(out.map(o => (o.time, o.n, o.sum)) == Seq(
      (0L, 1L, 10.0), (500L, 2L, 30.0), (1000L, 2L, 50.0), (1600L, 2L, 70.0)))
  }

  test("byDuration: state evicts rows older than newest frame") {
    val out = runStream(
      Seq(
        Seq(Event(7, 0, 1.0)),
        Seq(Event(7, 5000, 2.0)), // far later: 0 must be long gone
        Seq(Event(7, 5500, 3.0))),
      ds => OverWindows.byDuration(ds, 1000), "dur2")
      .sortBy(_.time)
    assert(out.map(o => (o.time, o.n, o.sum)) == Seq(
      (0L, 1L, 1.0), (5000L, 1L, 2.0), (5500L, 2L, 5.0)))
  }

  test("bySize: trailing N-row frame, FIFO eviction across batches") {
    val out = runStream(
      Seq(
        Seq(Event(2, 100, 1.0), Event(2, 200, 2.0)),
        Seq(Event(2, 300, 3.0), Event(2, 400, 4.0))),
      ds => OverWindows.bySize(ds, 3), "size1")
      .sortBy(_.time)
    assert(out.map(o => (o.time, o.n, o.sum, o.max)) == Seq(
      (100L, 1L, 1.0, 1.0), (200L, 2L, 3.0, 2.0),
      (300L, 3L, 6.0, 3.0), (400L, 3L, 9.0, 4.0)))
  }

  test("keys are independent") {
    val out = runStream(
      Seq(Seq(Event(1, 0, 5.0), Event(2, 0, 7.0), Event(1, 100, 5.0))),
      ds => OverWindows.bySize(ds, 10), "keys1")
    assert(out.filter(_.key == 2).map(_.n) == Seq(1L))
    assert(out.filter(_.key == 1).map(_.n).sorted == Seq(1L, 2L))
  }

  test("streaming equals batch on the events table sample") {
    import spark.implicits._
    val ev = OverWindows.fromDf(
      graft.Tables.events(spark, sf()).limit(200), "user_id", "__time__", "value")
    val batch = OverWindows.byDurationBatch(ev, 3600000).collect().toSet
    val streamed = runStream(Seq(ev.collect().toSeq), ds => OverWindows.byDuration(ds, 3600000), "eq1").toSet
    assert(streamed == batch)
  }
}
