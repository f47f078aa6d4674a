package graft.streaming

import graft.SparkSpec
import graft.sources.Sources
import graft.streaming.OverWindows.{Event, OverOut}

/** Streaming over-window semantics with hand-placed event times, mirroring
  * the reference's deterministic window tests (SlideWindowTest.java:24-164
  * style): exact per-row trailing frames, watermark reorder-buffer emission
  * (rows emit once the watermark is strictly past them, in event-time
  * order), state eviction across micro-batches, and streaming == batch
  * equivalence under cross-batch DISORDER.
  */
class OverWindowsSpec extends SparkSpec {

  /** Sentinel far-future event on an unused key: advances the watermark so
    * every real event matures. Its own row never emits (the watermark never
    * passes it), so assertions filter key >= 0.
    */
  private val FlushKey = -1L
  private def flush(ms: Long = 4000000000000000L) = Event(FlushKey, ms, 0.0)

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
      src.addData(Seq(flush())); q.processAllAvailable()
      spark.table(name).as[OverOut].collect().toSeq.filter(_.key >= 0)
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

  test("byDuration: state evicts rows older than any future frame") {
    val out = runStream(
      Seq(
        Seq(Event(7, 1, 1.0)),
        Seq(Event(7, 5000, 2.0)), // far later: 1 must be long gone
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

  test("cross-batch OUT-OF-ORDER arrival: streaming equals batch bit-for-bit") {
    import spark.implicits._
    // Disorder the watermark must absorb: 1500 arrives AFTER 3000 (one
    // micro-batch later), 1000 arrives two batches after 2000 — all within
    // the 10 s allowed lateness. The eager round-10 semantics emitted 2000's
    // and 3000's frames without 1500/1000; the reorder buffer must hold
    // every row until the watermark passes it and fold in event-time order,
    // reproducing the batch frames exactly.
    val events = Seq(
      Event(1, 1000, 1.0), Event(1, 1500, 2.0), Event(1, 2000, 3.0),
      Event(1, 2500, 4.0), Event(1, 3000, 5.0),
      Event(2, 1200, 10.0), Event(2, 2200, 20.0))
    val batches = Seq(
      Seq(Event(1, 2000, 3.0), Event(1, 3000, 5.0), Event(2, 2200, 20.0)),
      Seq(Event(1, 1500, 2.0)), // older than already-arrived 3000
      Seq(Event(1, 1000, 1.0), Event(1, 2500, 4.0), Event(2, 1200, 10.0)))

    for ((build, batchEq, name) <- Seq(
      ((ds: org.apache.spark.sql.Dataset[Event]) => OverWindows.byDuration(ds, 1000, "10 seconds"),
        OverWindows.byDurationBatch(events.toDS(), 1000), "ooo_dur"),
      ((ds: org.apache.spark.sql.Dataset[Event]) => OverWindows.bySize(ds, 3, watermarkDelay = "10 seconds"),
        OverWindows.bySizeBatch(events.toDS(), 3), "ooo_size"))) {
      val streamed = runStream(batches, build, name)
      assert(streamed.toSet == batchEq.collect().toSet,
        s"$name: streaming under disorder must equal the batch frames")
      assert(streamed.size == events.size, s"$name: one output row per input row")
    }
  }

  test("in-order single-batch feed equals batch too (no disorder edge)") {
    import spark.implicits._
    val events = (1 to 20).map(i => Event(1, i * 400L, i.toDouble))
    val streamed = runStream(Seq(events),
      ds => OverWindows.byDuration(ds, 1000), "inorder1")
    assert(streamed.toSet == OverWindows.byDurationBatch(events.toDS(), 1000).collect().toSet)
  }

  test("reorder buffer is watermark-horizon bounded; frame context is frame-bounded") {
    // Pure drain-loop property over the step functions: stream 200 events
    // through advancing watermarks; after every drain, pending holds only
    // rows the watermark has not strictly passed, and the kept frame
    // context only rows a future frame can still reach.
    val sizeMs = 1000L
    implicit val ord: Ordering[Event] = Ordering.by(e => (e.time, e.value))
    val events = (1 to 200).map(i => Event(1, i * 100L, i.toDouble))
    var hist: List[Event] = Nil
    var pend: List[Event] = Nil
    var emitted = 0
    events.grouped(20).zipWithIndex.foreach { case (batch, i) =>
      val wm = i * 2000L // lags the newest event, as a real watermark does
      val (ripe, wait) = ReorderBuffer.drain(pend, batch.iterator, wm, (_: Event).time, strict = true)
      val (out, kept) = OverWindows.durationStep(sizeMs)(hist, ripe, wm)
      emitted += out.size
      hist = kept; pend = wait
      assert(pend.forall(_.time >= wm), "pending holds only unmatured rows")
      assert(hist.forall(_.time > wm - sizeMs), "context holds only future-reachable rows")
      assert(hist.size + pend.size <= events.size)
    }
    val (ripe, _) = ReorderBuffer.drain(pend, Iterator.empty, Long.MaxValue, (_: Event).time, strict = true)
    emitted += OverWindows.durationStep(sizeMs)(hist, ripe, Long.MaxValue)._1.size
    assert(emitted == events.size, "every event emits exactly once across the drains")
  }

  test("heartbeat idle-advance (D3): a stalled stream still matures buffered rows") {
    import spark.implicits._
    val src = Sources.memoryStream[Event](spark)
    val hb = Sources.memoryStream[java.sql.Timestamp](spark)
    val q = OverWindows.byDuration(src.toDS(), 1000, "1 second",
      heartbeat = Some(hb.toDS().toDF(OverWindows.HeartbeatTs)))
      .writeStream.format("memory").queryName("hb_over").outputMode("append").start()
    try {
      src.addData(Seq(Event(1, 5000, 1.0), Event(1, 5600, 2.0)))
      q.processAllAvailable()
      assert(spark.table("hb_over").isEmpty,
        "rows are buffered while the watermark lags (no further data)")
      // data stream stalls; only a heartbeat arrives and pushes the
      // watermark past both rows (wm = 60000 - 1000)
      hb.addData(Seq(new java.sql.Timestamp(60000L)))
      q.processAllAvailable()
      val out = spark.table("hb_over").as[OverOut].collect().toSeq.sortBy(_.time)
      assert(out.map(o => (o.time, o.n, o.sum)) == Seq((5000L, 1L, 1.0), (5600L, 2L, 3.0)),
        "heartbeat-only batch matures the reorder buffer with correct frames")
    } finally q.stop()
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
      // sentinel on key 3 matures key 2's last row and GCs key 2
      src.addData(Seq(Event(3, 400000, 0.0))); q.processAllAvailable()
      val stateRows = q.recentProgress.toSeq
        .flatMap(p => p.stateOperators.headOption.map(_.numRowsTotal))
      assert(stateRows.max == 2, s"at most two keys in state at any point: $stateRows")
      assert(stateRows.last == 1, s"drained keys 1 and 2 must be evicted (only the sentinel stays): $stateRows")
      val out = spark.table("exp1").as[OverOut].collect().toSeq
        .filter(_.key < 3).sortBy(_.time)
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
        src.addData(Seq(Event(1, 5000, 1.0), Event(1, 10000, 2.0))); q.processAllAvailable()
        src.addData(Seq(Event(1, 20000, 3.0))); q.processAllAvailable()
        src.addData(Seq(flush())); q.processAllAvailable()
        val out = spark.table("rocks1").as[OverOut].collect().toSeq
          .filter(_.key >= 0).sortBy(_.time)
        assert(out.map(o => (o.n, o.sum)) == Seq((1L, 1.0), (2L, 3.0), (2L, 5.0)))
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("streaming equals batch on the events table sample") {
    import spark.implicits._
    val ev = OverWindows.fromDf(
      graft.Tables.events(spark, sf()).limit(200), "user_id", "__time__", "value")
    val batch = OverWindows.byDurationBatch(ev, 3600000).collect().toSet
    val streamed = runStream(Seq(ev.collect().toSeq),
      ds => OverWindows.byDuration(ds, 3600000), "eq1").toSet
    assert(streamed == batch)
  }
}
