package graft.streaming

import graft.SparkSpec
import graft.sources.Sources
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Stream-stream interval join semantics over deterministic MemoryStreams:
  * cross-micro-batch pairing, left-outer null-pad gated by the watermark,
  * and batch equivalence of the same declarative plan.
  */
case class LeftEv(ts: java.sql.Timestamp, k: String, lv: Long)
case class RightEv(rts: java.sql.Timestamp, rk: String, rv: Long)

class StreamIntervalJoinSpec extends SparkSpec {

  private def lt(ms: Long, k: String, v: Long) = LeftEv(new java.sql.Timestamp(ms), k, v)
  private def rt(ms: Long, k: String, v: Long) = RightEv(new java.sql.Timestamp(ms), k, v)

  // left joins rights within [l.ts - 2s, l.ts + 2s], 5s watermark
  private def build(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame,
      joinType: String) =
    IntervalJoinStream.intervalJoin(l, r, "k", "rk", "ts", "rts",
      lowerMs = 2000, upperMs = 2000, watermarkDelay = "5 seconds", joinType = joinType)
      .select(col("lv"), col("rv"))

  private def pairs(rows: Seq[Row]): Set[(Long, Option[Long])] =
    rows.map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet

  test("inner: pairs within the interval emit, including matches split across micro-batches") {
    import spark.implicits._
    val ls = Sources.memoryStream[LeftEv](spark)
    val rs = Sources.memoryStream[RightEv](spark)
    val q = build(ls.toDS().toDF(), rs.toDS().toDF(), "inner")
      .writeStream.format("memory").queryName("sij_inner").outputMode("append").start()
    try {
      // batch 1: left 10s and an in-range right 11s
      ls.addData(Seq(lt(10000, "a", 1)))
      rs.addData(Seq(rt(11000, "a", 101)))
      q.processAllAvailable()
      // batch 2: the LATE right for the batch-1 left (9s, still in range and
      // above watermark) — must pair with the left buffered in state
      rs.addData(Seq(rt(9000, "a", 102)))
      // plus an out-of-range right (13s > 10s+2s) and a wrong-key right
      rs.addData(Seq(rt(13000, "a", 103), rt(10000, "b", 104)))
      q.processAllAvailable()
      val got = pairs(spark.table("sij_inner").collect().toSeq)
      assert(got == Set((1L, Some(101L)), (1L, Some(102L))), got.toString)
    } finally q.stop()
  }

  test("left outer: unmatched left null-pads only after the watermark passes l.ts + upper") {
    import spark.implicits._
    val ls = Sources.memoryStream[LeftEv](spark)
    val rs = Sources.memoryStream[RightEv](spark)
    val q = build(ls.toDS().toDF(), rs.toDS().toDF(), "left_outer")
      .writeStream.format("memory").queryName("sij_outer").outputMode("append").start()
    try {
      ls.addData(Seq(lt(10000, "a", 1), lt(10500, "a", 2)))
      rs.addData(Seq(rt(11000, "a", 101))) // matches both lefts
      q.processAllAvailable()
      // left 2 matched; a hypothetical null-pad for some left must NOT have
      // emitted yet — watermark (min of both streams - 5s) is still behind
      val early = pairs(spark.table("sij_outer").collect().toSeq)
      assert(!early.exists(_._2.isEmpty), s"premature null-pad: $early")

      // an unmatched left, then advance BOTH watermarks far past it
      ls.addData(Seq(lt(20000, "a", 3)))
      q.processAllAvailable()
      ls.addData(Seq(lt(60000, "z", 9)))
      rs.addData(Seq(rt(60000, "z", 999)))
      q.processAllAvailable()
      val got = pairs(spark.table("sij_outer").collect().toSeq)
      assert(got.contains((3L, None)), s"expected null-padded left 3 in $got")
      assert(got.contains((1L, Some(101L))) && got.contains((2L, Some(101L))))
    } finally q.stop()
  }

  test("the same declarative plan gives identical pairs in batch") {
    import spark.implicits._
    val lb = Seq(lt(10000, "a", 1), lt(10500, "a", 2), lt(20000, "a", 3)).toDF()
    val rb = Seq(rt(11000, "a", 101), rt(9000, "a", 102), rt(13000, "a", 103),
      rt(10000, "b", 104)).toDF()
    val got = pairs(IntervalJoinStream.intervalJoin(lb, rb, "k", "rk", "ts", "rts",
      2000, 2000, "5 seconds", "left_outer").select(col("lv"), col("rv")).collect().toSeq)
    assert(got == Set((1L, Some(101L)), (1L, Some(102L)),
      (2L, Some(101L)), (2L, Some(102L)), (3L, None)))
  }

  test("state stays bounded: the plan derives state watermarks for both sides") {
    import spark.implicits._
    val ls = Sources.memoryStream[LeftEv](spark)
    val rs = Sources.memoryStream[RightEv](spark)
    val q = build(ls.toDS().toDF(), rs.toDS().toDF(), "inner")
      .writeStream.format("memory").queryName("sij_state").outputMode("append").start()
    try {
      ls.addData(Seq(lt(10000, "a", 1)))
      rs.addData(Seq(rt(11000, "a", 101)))
      q.processAllAvailable()
      // push the watermark far ahead; old state must evict
      ls.addData(Seq(lt(500000, "z", 9)))
      rs.addData(Seq(rt(500000, "z", 999)))
      q.processAllAvailable()
      ls.addData(Seq(lt(501000, "z2", 8)))
      rs.addData(Seq(rt(501000, "z2", 998)))
      q.processAllAvailable()
      val p = q.lastProgress
      val state = p.stateOperators
      assert(state.nonEmpty, "expected a stream-stream join state operator")
      // rows for ts≈10-11s are far below the watermark → evicted from state
      assert(state.head.numRowsTotal <= 4,
        s"state grew: ${state.head.numRowsTotal} rows (eviction not working)")
    } finally q.stop()
  }
}
