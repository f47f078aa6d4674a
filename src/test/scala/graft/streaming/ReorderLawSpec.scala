package graft.streaming

import scala.util.Random

import graft.SparkSpec
import graft.sources.Sources
import org.apache.spark.sql.functions._
import graft.streaming.OverWindows.{Event, OverOut}

// Top-level so spark.implicits can derive Encoders (local case classes can't).
case class LawVE(ts: java.sql.Timestamp, user_id: Long, event_id: Long, value: Double)
case class LawL(k: Long, t: Long, tag: String)
case class LawR(k: Long, rt: Long, rv: Double)

/** The disorder law for the shared ReorderBuffer and every stateful
  * event-time operator built on it (OverWindows, FunnelStream,
  * AnomalyStream, AsOfStream): ANY arrival order of the same events — any
  * assignment to micro-batches the watermark admits — produces the same
  * output rows as the in-order feed. Pure drain laws run over seeded random
  * permutations; each operator then gets an end-to-end shuffled-arrival run
  * compared row-for-row against its in-order run.
  */
class ReorderLawSpec extends SparkSpec {

  // ---------- pure ReorderBuffer laws (no streams) ----------

  test("drain law: any admissible batching/permutation yields the sorted whole, each ripe slice final") {
    case class E(t: Long, id: Int)
    implicit val ord: Ordering[E] = Ordering.by(e => (e.t, e.id))
    val rnd = new Random(42)
    for (trial <- 1 to 20) {
      val events = (1 to 100).map(i => E(rnd.between(1L, 5000L), i))
      // watermark path: non-decreasing, ends past everything
      val wms = (1 to 5).scanLeft(0L)((w, _) => w + rnd.between(0L, 2000L)).tail :+ Long.MaxValue
      // admissible arrival: an event may arrive in any batch whose watermark
      // (at arrival) has not passed it — Spark's late filter guarantees this
      val batches = events.groupBy { e =>
        val legal = wms.indices.filter(i => i == 0 || e.t >= wms(i - 1))
        legal(rnd.nextInt(legal.size))
      }
      var pend: List[E] = Nil
      val emitted = Seq.newBuilder[E]
      for (i <- wms.indices) {
        val arriving = rnd.shuffle(batches.getOrElse(i, Seq.empty)).iterator
        val (ripe, wait) = ReorderBuffer.drain(pend, arriving, wms(i), (_: E).t, strict = true)
        assert(ripe == ripe.sorted, s"trial $trial: ripe slice is in fold order")
        assert(ripe.forall(_.t < wms(i)), s"trial $trial: ripe rows are strictly final")
        assert(wait.forall(_.t >= wms(i)), s"trial $trial: waiting rows are unmatured")
        emitted ++= ripe
        pend = wait
      }
      assert(pend.isEmpty)
      assert(emitted.result() == events.sorted,
        s"trial $trial: concatenated drains equal the in-order whole")
    }
  }

  test("mergeSorted laws: order, replace-newest on equal time, duplicate-keeping") {
    val st = IndexedSeq((1L, "a1"), (3L, "a3"), (5L, "a5"))
    val in = IndexedSeq((2L, "b2"), (3L, "b3"), (3L, "b3x"), (6L, "b6"))
    val rep = ReorderBuffer.mergeSorted(st, in, replaceEqual = true)
    assert(rep == IndexedSeq((1L, "a1"), (2L, "b2"), (3L, "b3x"), (5L, "a5"), (6L, "b6")),
      "replaceEqual: the newest arrival wins each timestamp")
    val dup = ReorderBuffer.mergeSorted(st, in, replaceEqual = false)
    assert(dup == IndexedSeq((1L, "a1"), (2L, "b2"), (3L, "a3"), (3L, "b3"), (3L, "b3x"), (5L, "a5"), (6L, "b6")),
      "keep-duplicates: buffered-first at equal times")
    assert(ReorderBuffer.mergeSorted(IndexedSeq.empty[(Long, String)], in, replaceEqual = true)
      .map(_._1) == Seq(2L, 3L, 6L))
  }

  test("wakeAt: strictly ahead of the watermark; strict maturity needs wm past the event") {
    assert(ReorderBuffer.wakeAt(Seq(100L), wm = 50L, strict = true, orElse = 0L) == 101L)
    assert(ReorderBuffer.wakeAt(Seq(100L), wm = 50L, strict = false, orElse = 0L) == 100L)
    assert(ReorderBuffer.wakeAt(Seq(100L), wm = 200L, strict = true, orElse = 0L) == 201L,
      "clamped ahead of a watermark that already passed the event")
    assert(ReorderBuffer.wakeAt(Nil, wm = 50L, strict = true, orElse = 99999L) == 99999L)
    assert(ReorderBuffer.wakeAt(Nil, wm = 50L, strict = true, orElse = 10L) == 51L)
  }

  // ---------- end-to-end disorder runs, one per operator ----------

  /** Deterministically shuffle `events` into `nBatches` micro-batches.
    * A generous watermark delay makes every assignment admissible.
    */
  private def scatter[T](events: Seq[T], nBatches: Int, seed: Int): Seq[Seq[T]] = {
    val rnd = new Random(seed)
    val shuffled = rnd.shuffle(events)
    val sizes = Array.fill(nBatches)(0)
    shuffled.foreach(_ => sizes(rnd.nextInt(nBatches)) += 1)
    var rest = shuffled
    sizes.toSeq.map { n => val (h, t) = rest.splitAt(n); rest = t; h }
  }

  private def runOver(
      batches: Seq[Seq[Event]],
      build: org.apache.spark.sql.Dataset[Event] => org.apache.spark.sql.Dataset[OverOut],
      name: String): Set[OverOut] = {
    import spark.implicits._
    val src = Sources.memoryStream[Event](spark)
    val q = build(src.toDS())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => src.addData(b); q.processAllAvailable() }
      src.addData(Seq(Event(-1, 4000000000000000L, 0.0))); q.processAllAvailable()
      spark.table(name).as[OverOut].collect().toSet.filter(_.key >= 0)
    } finally q.stop()
  }

  test("law: OverWindows byDuration — shuffled arrival equals in-order arrival") {
    val rnd = new Random(7)
    val events = (1 to 60).map(i => Event(1 + i % 3, 1000L + rnd.between(0L, 20000L), i.toDouble))
    val inOrder = runOver(Seq(events.sortBy(_.time)),
      ds => OverWindows.byDuration(ds, 2000, "1 minute"), "law_dur_a")
    val shuffledRun = runOver(scatter(events, 4, seed = 11),
      ds => OverWindows.byDuration(ds, 2000, "1 minute"), "law_dur_b")
    assert(shuffledRun == inOrder)
    assert(inOrder.size == events.size)
  }

  private val H = 3600L * 1000

  test("law: FunnelStream — shuffled arrival equals in-order arrival") {
    import spark.implicits._
    def e(ms: Long, user: Long, etype: String) =
      StreamEvent(new java.sql.Timestamp(ms), s"$user:$etype", 0.0)
    val events = Seq(
      e(1 * H, 1, "signup"), e(2 * H, 1, "view"), e(3 * H, 1, "click"), e(4 * H, 1, "purchase"),
      e(2 * H, 2, "signup"), e(1 * H, 2, "view"), e(5 * H, 2, "view"), e(90 * H, 2, "click"),
      e(3 * H, 3, "signup"), e(3 * H + 1, 3, "view"))
    def run(batches: Seq[Seq[StreamEvent]], name: String): Set[FunnelStream.FunnelResult] = {
      val src = Sources.memoryStream[StreamEvent](spark)
      val shapedDf = src.toDS().toDF()
        .withColumn("user_id", split(col("key"), ":").getItem(0).cast("long"))
        .withColumn("event_type", split(col("key"), ":").getItem(1))
      val q = FunnelStream.funnel(shapedDf, "ts", "user_id", "event_type",
        graft.ops.Behavior.FunnelWindowMs, watermark = "100 hours")
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        batches.foreach { b => src.addData(b); q.processAllAvailable() }
        src.addData(Seq(e(100000 * H, -1L, "noop"))); q.processAllAvailable()
        spark.table(name).as[FunnelStream.FunnelResult].collect().toSet.filter(_.user_id >= 0)
      } finally q.stop()
    }
    val inOrder = run(Seq(events.sortBy(_.ts.getTime)), "law_fun_a")
    val shuffledRun = run(scatter(events, 4, seed = 23), "law_fun_b")
    assert(shuffledRun == inOrder)
    assert(inOrder.nonEmpty)
  }

  test("law: AnomalyStream — shuffled arrival equals in-order arrival") {
    import spark.implicits._
    val rnd = new Random(5)
    val events = (1 to 50).map { i =>
      val v = if (i % 17 == 0) 500.0 else rnd.between(0, 100) / 10.0
      LawVE(new java.sql.Timestamp(1000L * 60 * i), 1L, i.toLong, v)
    }
    def run(batches: Seq[Seq[LawVE]], name: String): Set[AnomalyStream.AnomalyRow] = {
      val src = Sources.memoryStream[LawVE](spark)
      val q = AnomalyStream.anomalies(src.toDS().toDF(), "ts", "user_id", "event_id", "value",
        watermark = "2 hours")
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        batches.foreach { b => src.addData(b); q.processAllAvailable() }
        src.addData(Seq(LawVE(new java.sql.Timestamp(1000L * 3600 * 1000), -1L, -1L, 0.0)))
        q.processAllAvailable()
        spark.table(name).as[AnomalyStream.AnomalyRow].collect().toSet.filter(_.user_id >= 0)
      } finally q.stop()
    }
    val inOrder = run(Seq(events.sortBy(_.ts.getTime)), "law_anom_a")
    val shuffledRun = run(scatter(events, 4, seed = 31), "law_anom_b")
    assert(shuffledRun == inOrder)
    assert(inOrder.nonEmpty, "the spike events must fire anomalies")
  }

  test("law: WindowedTransform tumble — shuffled arrival equals in-order (accumulate-then-sort form)") {
    import spark.implicits._
    // WindowedTransform realizes the discipline differently from drain():
    // rows accumulate unordered in window state and sort ONCE at fire time.
    // Same law, same proof obligation.
    val rnd = new Random(17)
    val events = (1 to 40).map(i =>
      StreamEvent(new java.sql.Timestamp(1000L + rnd.between(0L, 30000L)), (1 + i % 2).toString, i.toDouble))
    def run(batches: Seq[Seq[StreamEvent]], name: String): Set[RankedOut] = {
      val src = Sources.memoryStream[StreamEvent](spark)
      val out = WindowedTransform.tumble[RankedOut](
        src.toDS().toDF(), "ts", "key", "v", 10000, watermark = "1 minute") { (key, ws, we, rows) =>
        rows.sortBy(e => (-e.value, e.time)).zipWithIndex.map { case (e, i) =>
          RankedOut(key, ws, we, e.time, e.value, i + 1)
        }
      }
      val q = out.writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        batches.foreach { b => src.addData(b); q.processAllAvailable() }
        src.addData(Seq(StreamEvent(new java.sql.Timestamp(4000000000000000L), "-1", 0.0)))
        q.processAllAvailable()
        spark.table(name).as[RankedOut].collect().toSet.filter(_.key >= 0)
      } finally q.stop()
    }
    val inOrder = run(Seq(events.sortBy(_.ts.getTime)), "law_wt_a")
    val shuffledRun = run(scatter(events, 4, seed = 29), "law_wt_b")
    assert(shuffledRun == inOrder)
    assert(inOrder.size == events.size)
  }

  test("law: AsOfStream — shuffled arrival of both sides equals in-order arrival") {
    import spark.implicits._
    val rnd = new Random(13)
    val lefts = (1 to 30).map(i => LawL(1 + i % 2, 1000L + rnd.between(0L, 10000L), s"l$i"))
    val rights = (1 to 15).map(i => LawR(1 + i % 2, 1000L + rnd.between(0L, 10000L), i * 1.0))
    def run(lb: Seq[Seq[LawL]], rb: Seq[Seq[LawR]], name: String): Set[(Long, Long, String, Option[Double])] = {
      val lsrc = Sources.memoryStream[LawL](spark)
      val rsrc = Sources.memoryStream[LawR](spark)
      val q = AsOfStream.join(lsrc.toDS().toDF(), rsrc.toDS().toDF(),
        keys = Seq("k"), leftTime = "t", rightTime = "rt", valueCols = Seq("rv"),
        watermarkDelay = "1 minute")
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        lb.zipAll(rb, Seq.empty[LawL], Seq.empty[LawR]).foreach { case (l, r) =>
          if (l.nonEmpty) lsrc.addData(l)
          if (r.nonEmpty) rsrc.addData(r)
          q.processAllAvailable()
        }
        lsrc.addData(Seq(LawL(-1, 4000000000000000L, "flush"))); q.processAllAvailable()
        spark.table(name).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
            Option(r.get(3)).map(_.asInstanceOf[Double])))
          .filter(_._1 >= 0).toSet
      } finally q.stop()
    }
    val inOrder = run(Seq(lefts.sortBy(_.t)), Seq(rights.sortBy(_.rt)), "law_asof_a")
    val shuffledRun = run(scatter(lefts, 4, seed = 3), scatter(rights, 4, seed = 9), "law_asof_b")
    assert(shuffledRun == inOrder)
    assert(inOrder.size == lefts.size)
  }
}
