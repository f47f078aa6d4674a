package graft.streaming

import graft.SparkSpec
import graft.ops.Behavior
import graft.sources.Sources
import org.apache.spark.sql.functions._

/** Streaming funnel vs batch funnel (ops.Behavior): the FIRST funnel per
  * user equals the batch answer; later rows are re-entries. Emission is
  * independent of micro-batch boundaries; state drops on resolve.
  */
class FunnelStreamSpec extends SparkSpec {

  private val H = 3600L * 1000
  private def e(ms: Long, user: Long, etype: String) =
    StreamEvent(new java.sql.Timestamp(ms), s"$user:$etype", 0.0)

  // StreamEvent carries key as string; split into (user, type) columns.
  private def shaped(df: org.apache.spark.sql.DataFrame) = df
    .withColumn("user_id", split(col("key"), ":").getItem(0).cast("long"))
    .withColumn("event_type", split(col("key"), ":").getItem(1))

  private def runFunnel(batches: Seq[Seq[StreamEvent]], flushMs: Long,
      name: String = "funnel_out"): Seq[FunnelStream.FunnelResult] = {
    import spark.implicits._
    val src = Sources.memoryStream[StreamEvent](spark)
    val out = FunnelStream.funnel(
      shaped(src.toDS().toDF()), "ts", "user_id", "event_type", Behavior.FunnelWindowMs,
      watermark = "10 hours")
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => src.addData(b); q.processAllAvailable() }
      src.addData(Seq(e(flushMs, -1L, "noop")))
      q.processAllAvailable()
      spark.table(name).as[FunnelStream.FunnelResult].collect().toSeq
    } finally q.stop()
  }

  /** first funnel per user: the one entered at the user's min t_signup */
  private def firstFunnels(rows: Seq[FunnelStream.FunnelResult]): Map[Long, (Int, Option[Long])] =
    rows.groupBy(_.user_id).map { case (u, rs) =>
      val first = rs.minBy(_.t_signup)
      u -> (first.stage, first.t_purchase)
    }

  test("cross-batch staged conversion matches batch semantics incl. the 72h cap") {
    // user 1: full funnel across three batches; user 2: click before view
    // never counts; user 3: purchase outside the window -> stage 3;
    // user 4: no signup -> never emitted.
    val batches = Seq(
      Seq(e(10 * H, 1, "signup"), e(9 * H, 2, "click"), e(10 * H, 2, "signup"),
        e(1, 3, "signup"), e(1 * H, 3, "view"), e(5 * H, 4, "view")),
      Seq(e(11 * H, 1, "view"), e(12 * H, 2, "view"), e(11 * H, 2, "click"),
        e(2 * H, 3, "click"), e(6 * H, 4, "purchase")),
      Seq(e(12 * H, 1, "click"), e(13 * H, 1, "purchase"), e(80 * H, 3, "purchase")))
    val got = firstFunnels(runFunnel(batches, 1000 * H))
    assert(got == Map(
      1L -> (4, Some(13 * H)),
      2L -> (2, None),
      3L -> (3, None)))
  }

  // Batch-1 events for user 7 arrive out of time order (13h click before 12h
  // view in the same addData); the reorder buffer must still fold them in
  // time order: view@12h then click@13h then purchase@14h = full conversion.
  test("intra-batch disorder is folded in event-time order") {
    val got = firstFunnels(runFunnel(Seq(Seq(
      e(10 * H, 7, "signup"), e(13 * H, 7, "click"), e(12 * H, 7, "view"),
      e(14 * H, 7, "purchase"))), 1000 * H))
    assert(got == Map(7L -> (4, Some(14 * H))))
  }

  test("re-entry: a signup after resolution opens a second funnel row") {
    val rows = runFunnel(Seq(Seq(
      e(1 * H, 9, "signup"), e(2 * H, 9, "view"), e(3 * H, 9, "click"),
      e(4 * H, 9, "purchase"), // funnel 1 converts at 4h
      e(5 * H, 9, "signup"), e(6 * H, 9, "view"))), 1000 * H) // funnel 2 stalls at view
    val nine = rows.filter(_.user_id == 9).sortBy(_.t_signup)
    assert(nine.map(r => (r.t_signup, r.stage)) == Seq((1 * H, 4), (5 * H, 2)))
  }

  test("emitted rows are independent of micro-batch boundaries") {
    val evs = Seq(
      e(1 * H, 1, "signup"), e(2 * H, 1, "view"), e(80 * H, 1, "signup"),
      e(81 * H, 1, "view"), e(82 * H, 1, "click"), e(83 * H, 1, "purchase"),
      e(10 * H, 2, "signup"), e(84 * H, 2, "view"), e(85 * H, 2, "signup"),
      e(86 * H, 2, "view"))
    val whole = runFunnel(Seq(evs), 2000 * H, "fb_whole")
      .map(r => (r.user_id, r.t_signup, r.stage)).sorted
    // one event per micro-batch, fed in global time order (anything else
    // would make earlier-stamped events late once the watermark advances)
    val sliced = runFunnel(evs.sortBy(_.ts.getTime).map(Seq(_)), 2000 * H, "fb_sliced")
      .map(r => (r.user_id, r.t_signup, r.stage)).sorted
    assert(whole == sliced && whole.nonEmpty)
    // user 1: funnel 1 (1h, stage 2) window-shut at 73h, funnel 2 (80h) converts
    assert(whole.contains((1L, 1 * H, 2)) && whole.contains((1L, 80 * H, 4)))
    // user 2: view@84h is past 10h+72h -> funnel 1 stage 1; re-entry at 85h
    assert(whole.contains((2L, 10 * H, 1)) && whole.contains((2L, 85 * H, 2)))
  }

  test("state is dropped once every funnel resolves") {
    import spark.implicits._
    val src = Sources.memoryStream[StreamEvent](spark)
    val out = FunnelStream.funnel(
      shaped(src.toDS().toDF()), "ts", "user_id", "event_type", Behavior.FunnelWindowMs,
      watermark = "10 hours")
    val q = out.writeStream.format("memory").queryName("funnel_state")
      .outputMode("append").start()
    try {
      src.addData(Seq(e(1, 1, "signup"), e(1 * H, 2, "signup")))
      q.processAllAvailable()
      src.addData(Seq(e(500 * H, -1L, "noop"))) // watermark past every deadline
      q.processAllAvailable()
      src.addData(Seq(e(501 * H, -1L, "noop"))) // let the timeouts fire + GC
      q.processAllAvailable()
      src.addData(Seq(e(502 * H, -1L, "noop")))
      q.processAllAvailable()
      val st = q.lastProgress.stateOperators
      // both entered users resolved + evicted; only the live noop sentinel
      // from the final flush batch may still hold a (bufferless) state row
      assert(st.nonEmpty && st(0).numRowsTotal <= 1, s"state rows: ${st.map(_.numRowsTotal).mkString(",")}")
      assert(spark.table("funnel_state").where(col("user_id") >= 0).count() == 2)
    } finally q.stop()
  }

  test("random event sample: first streaming funnel per user == batch funnel") {
    import spark.implicits._
    val ev = graft.Tables.events(spark, sf())
      .where(col("user_id") < 30)
      .select(col("user_id"), col("event_type"), col("__time__"))
      .orderBy("__time__").collect()
      .map(r => e(r.getLong(2), r.getLong(0), r.getString(1)))
    val batchExpect = Behavior.funnel(graft.Tables.events(spark, sf())
      .where(col("user_id") < 30))
      .select("user_id", "stage", "t_purchase").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), Option(r.get(2)).map(_.asInstanceOf[Long]))).toMap
    // feed in three chunks, time-ordered across chunks
    val chunks = ev.grouped((ev.length / 3) + 1).map(_.toSeq).toSeq
    val got = firstFunnels(runFunnel(chunks, ev.last.ts.getTime + 2000L * H))
    assert(got == batchExpect)
  }
}
