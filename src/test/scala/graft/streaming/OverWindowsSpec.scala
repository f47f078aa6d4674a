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

  // NOTE: times start at 1, not 0 — once a watermark is declared (for state
  // expiry), the exec drops rows with eventTime <= watermark, and the initial
  // watermark is epoch 0. Real epoch-ms event times are unaffected.
  test("byDuration: trailing (t-size, t] frame per key, across micro-batches") {
    // key 1: times 1, 500, 1000, 1600 with size 1000
    //   frames: {1}, {1,500}, {1,500,1000} ((0,1000]), {1000,1600}
    val out = runStream(
      Seq(
        Seq(Event(1, 1, 10.0), Event(1, 500, 20.0)),
        Seq(Event(1, 1000, 30.0), Event(1, 1600, 40.0))),
      ds => OverWindows.byDuration(ds, 1000), "dur1")
      .sortBy(_.time)
    assert(out.map(o => (o.time, o.n, o.sum)) == Seq(
      (1L, 1L, 10.0), (500L, 2L, 30.0), (1000L, 3L, 60.0), (1600L, 2L, 70.0)))
  }

  test("byDuration: state evicts rows older than newest frame") {
    val out = runStream(
      Seq(
        Seq(Event(7, 1, 1.0)),
        Seq(Event(7, 5000, 2.0)), // far later: 0 must be long gone
        Seq(Event(7, 5500, 3.0))),
      ds => OverWindows.byDuration(ds, 1000), "dur2")
      .sortBy(_.time)
    assert(out.map(o => (o.time, o.n, o.sum)) == Seq(
      (1L, 1L, 1.0), (5000L, 1L, 2.0), (5500L, 2L, 5.0)))
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
      Seq(Seq(Event(1, 1, 5.0), Event(2, 1, 7.0), Event(1, 100, 5.0))),
      ds => OverWindows.bySize(ds, 10), "keys1")
    assert(out.filter(_.key == 2).map(_.n) == Seq(1L))
    assert(out.filter(_.key == 1).map(_.n).sorted == Seq(1L, 2L))
  }

  test("idle key state expires once the watermark passes lastTime + size") {
    import spark.implicits._
    val src = Sources.memoryStream[Event](spark)
    val q = OverWindows.byDuration(src.toDS(), 1000, watermarkDelay = "0 milliseconds")
      .writeStream.format("memory").queryName("exp1").outputMode("append").start()
    try {
      // key 1 then only key 2: watermark (driven by key 2) must evict key 1.
      src.addData(Seq(Event(1, 10, 1.0))); q.processAllAvailable()
      src.addData(Seq(Event(2, 100000, 2.0))); q.processAllAvailable()
      src.addData(Seq(Event(2, 200000, 3.0))); q.processAllAvailable()
      src.addData(Seq(Event(2, 300000, 4.0))); q.processAllAvailable()
      val stateRows = q.recentProgress.toSeq
        .flatMap(p => p.stateOperators.headOption.map(_.numRowsTotal))
      assert(stateRows.max == 2, s"both keys were in state at some point: $stateRows")
      assert(stateRows.last == 1, s"idle key 1 should have been evicted: $stateRows")
      val out = spark.table("exp1").as[OverOut].collect().toSeq.sortBy(_.time)
      assert(out.map(o => (o.key, o.n, o.sum)) ==
        Seq((1L, 1L, 1.0), (2L, 1L, 2.0), (2L, 1L, 3.0), (2L, 1L, 4.0)))
    } finally q.stop()
  }

  test("over-window runs on the RocksDB state store") {
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", graft.GraftSession.RocksDbProvider)
    try {
      val src = Sources.memoryStream[Event](spark)
      val q = OverWindows.bySize(src.toDS(), 2)
        .writeStream.format("memory").queryName("rocks1").outputMode("append").start()
      try {
        src.addData(Seq(Event(1, 5, 1.0), Event(1, 10, 2.0))); q.processAllAvailable()
        src.addData(Seq(Event(1, 20, 3.0))); q.processAllAvailable()
        val out = spark.table("rocks1").as[OverOut].collect().toSeq.sortBy(_.time)
        assert(out.map(o => (o.n, o.sum)) == Seq((1L, 1.0), (2L, 3.0), (2L, 5.0)))
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
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
