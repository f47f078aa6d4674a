package graft.streaming

import graft.SparkSpec
import graft.ops.Cdc
import graft.sources.Sources
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import java.nio.file.Files

class Scd2StreamSpec extends SparkSpec {

  private def withDerby(test: String => Unit): Unit = {
    val db = Files.createTempDirectory("derby-scd2").resolve("db").toString
    val url = s"jdbc:derby:$db;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      conn.createStatement().execute(
        "CREATE TABLE scd2_t (user_id BIGINT, plan VARCHAR(32), ts_ms BIGINT, " +
          "change_id BIGINT, effective_from BIGINT, effective_to BIGINT, is_current BOOLEAN)")
    } finally conn.close()
    test(url)
  }

  private def served(url: String): Set[(Long, String, Long, Option[Long], Boolean)] =
    spark.read.jdbc(url, "scd2_t", new java.util.Properties).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5)), r.getBoolean(6))).toSet

  private def batchScd2(log: Seq[(Long, String, Long, Long)]): Set[(Long, String, Long, Option[Long], Boolean)] = {
    import spark.implicits._
    Cdc.scd2(log.toDF("user_id", "plan", "ts_ms", "change_id"),
      keys = Seq("user_id"), tsCol = "ts_ms", tiebreak = "change_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5)), r.getBoolean(6))).toSet
  }

  test("streaming SCD-2 == batch scd2, out-of-order batch splits an interval mid-history") {
    import spark.implicits._
    withDerby { url =>
      val src = Sources.memoryStream[(Long, String, Long, Long)](spark)
      val changes = src.toDS().toDF("user_id", "plan", "ts_ms", "change_id")
      val q = Scd2Stream.materializeJdbc(changes, url, "scd2_t",
        keys = Seq("user_id"), tsCol = "ts_ms", tiebreak = "change_id",
        watermarkDelay = "1 hour") // admit every disorder in this spec
        .option("checkpointLocation", Files.createTempDirectory("ckp-scd2").toString)
        .start()
      try {
        val b1 = Seq((1L, "free", 100L, 10L), (1L, "pro", 300L, 11L), (2L, "free", 100L, 20L))
        src.addData(b1); q.processAllAvailable()
        assert(served(url) == batchScd2(b1))
        assert(served(url) == Set(
          (1L, "free", 100L, Some(300L), false),
          (1L, "pro", 300L, None, true),
          (2L, "free", 100L, None, true)))

        // OUT-OF-ORDER: ts 200 arrives after ts 300 was current -> must
        // close [100,300) into [100,200) + [200,300), keep pro current
        val b2 = Seq((1L, "trial", 200L, 12L))
        src.addData(b2); q.processAllAvailable()
        assert(served(url) == batchScd2(b1 ++ b2))
        assert(served(url) == Set(
          (1L, "free", 100L, Some(200L), false),
          (1L, "trial", 200L, Some(300L), false),
          (1L, "pro", 300L, None, true),
          (2L, "free", 100L, None, true)))

        // duplicate (ts, tiebreak) replays with a corrected payload: replaces
        val b3 = Seq((1L, "trial14", 200L, 12L), (2L, "pro", 400L, 21L))
        src.addData(b3); q.processAllAvailable()
        // batch equivalent of replace semantics: the log with change 12's
        // FINAL payload
        assert(served(url) == batchScd2(Seq(
          (1L, "free", 100L, 10L), (1L, "pro", 300L, 11L), (2L, "free", 100L, 20L),
          (1L, "trial14", 200L, 12L), (2L, "pro", 400L, 21L))))
        assert(served(url).contains((1L, "trial14", 200L, Some(300L), false)))
        assert(served(url).contains((2L, "pro", 400L, None, true)))
      } finally q.stop()
    }
  }

  test("watermark-late change is dropped before the operator, never splits an evicted interval") {
    import spark.implicits._
    withDerby { url =>
      val src = Sources.memoryStream[(Long, String, Long, Long)](spark)
      val changes = src.toDS().toDF("user_id", "plan", "ts_ms", "change_id")
      val q = Scd2Stream.materializeJdbc(changes, url, "scd2_t",
        keys = Seq("user_id"), tsCol = "ts_ms", tiebreak = "change_id",
        watermarkDelay = "1 second") // TIGHT delay: this spec exercises lateness
        .option("checkpointLocation", Files.createTempDirectory("ckp-scd2-late").toString)
        .start()
      try {
        // b1 advances the watermark far past the early history: after this
        // batch wm = 100_000 - 1_000 = 99_000
        val b1 = Seq((1L, "free", 100L, 10L), (1L, "pro", 300L, 11L),
          (1L, "max", 100000L, 19L))
        src.addData(b1); q.processAllAvailable()
        assert(served(url) == batchScd2(b1))

        // b2: one on-time change (triggers the eviction path for user 1: the
        // [100,300) prefix is immutable under wm=99_000 and prunes) PLUS one
        // watermark-late change at ts 200 that — were it processed against
        // the truncated version list — would open an overlapping interval.
        // EventTimeTimeout drops it before the operator (the D2 contract).
        val b2 = Seq((1L, "plus", 100500L, 13L), (1L, "trial", 200L, 12L))
        src.addData(b2); q.processAllAvailable()
        val expected = batchScd2(b1 :+ (1L, "plus", 100500L, 13L))
        assert(served(url) == expected, "late ts=200 row must be dropped, not applied")
        assert(!served(url).exists(_._2 == "trial"))
        // no overlapping intervals in the serving table
        val iv = served(url).filter(_._1 == 1L).toSeq.sortBy(_._3)
        iv.sliding(2).foreach {
          case Seq(a, b) => assert(a._4.contains(b._3), s"gap/overlap between $a and $b")
          case _ =>
        }
      } finally q.stop()
    }
  }

  test("interval state survives a restart from checkpoint (late split lands after the stop)") {
    import spark.implicits._
    withDerby { url =>
      val ckp = Files.createTempDirectory("ckp-scd2-restart").toString
      val src1 = Sources.memoryStream[(Long, String, Long, Long)](spark)
      def start(src: org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Long, Long)]) =
        Scd2Stream.materializeJdbc(
          src.toDS().toDF("user_id", "plan", "ts_ms", "change_id"), url, "scd2_t",
          keys = Seq("user_id"), tsCol = "ts_ms", tiebreak = "change_id",
          watermarkDelay = "1 hour")
          .option("checkpointLocation", ckp)
          .start()
      val q1 = start(src1)
      val b1 = Seq((1L, "free", 100L, 10L), (1L, "pro", 300L, 11L))
      try { src1.addData(b1); q1.processAllAvailable() } finally q1.stop()

      // new source + same checkpoint: state (the open version list) restores.
      // A fresh MemoryStream restarts offsets at 0, so pad it past the
      // committed offset before adding the genuinely-new batch.
      val src2 = Sources.memoryStream[(Long, String, Long, Long)](spark)
      src2.addData(Seq.empty[(Long, String, Long, Long)])
      val q2 = start(src2)
      val b2 = Seq((1L, "trial", 200L, 12L)) // splits [100,300) ACROSS the restart
      try { src2.addData(b2); q2.processAllAvailable() } finally q2.stop()
      assert(served(url) == batchScd2(b1 ++ b2))
    }
  }

  test("step: insertion re-emits the moved predecessor; replacement does not") {
    def pay(plan: String, cid: Long) = Row(plan, 0L, cid)
    val tb = (r: Row) => r.get(2)
    // empty state, two appends
    val (c1, m1, e1) = Scd2Stream.step(IndexedSeq.empty,
      Seq((100L, pay("free", 10L)), (300L, pay("pro", 11L))), Long.MinValue, tb)
    assert(c1 == Seq(0, 1) && m1.map(_._1) == IndexedSeq(100L, 300L) && e1 == 0)
    // mid-insert: emits itself AND its predecessor (whose effective_to moved)
    val (c2, m2, _) = Scd2Stream.step(m1, Seq((200L, pay("trial", 12L))), Long.MinValue, tb)
    assert(m2.map(_._1) == IndexedSeq(100L, 200L, 300L))
    assert(c2 == Seq(0, 1)) // predecessor 100 + new 200; 300 untouched
    // replacement: only the replaced version re-emits
    val (c3, m3, _) = Scd2Stream.step(m2, Seq((200L, pay("trial14", 12L))), Long.MinValue, tb)
    assert(c3 == Seq(1) && m3(1)._2.getString(0) == "trial14")
    // same-(t,tb) within one batch: deterministic winner by payload total
    // order (lexicographic max), NOT arrival order — both orders pick "b"
    val (_, m4, _) = Scd2Stream.step(IndexedSeq.empty,
      Seq((100L, pay("a", 1L)), (100L, pay("b", 1L))), Long.MinValue, tb)
    assert(m4.length == 1 && m4(0)._2.getString(0) == "b")
    val (_, m4r, _) = Scd2Stream.step(IndexedSeq.empty,
      Seq((100L, pay("b", 1L)), (100L, pay("a", 1L))), Long.MinValue, tb)
    assert(m4r.length == 1 && m4r(0)._2.getString(0) == "b")
    // BINARY payloads: the order must be value-based (hex render), not
    // Array.toString (JVM identity hash — replay-unstable). [1,3] > [1,2]
    // lexicographically in hex, from either arrival order.
    def bpay(bytes: Array[Byte], cid: Long) = Row(bytes, 0L, cid)
    val lo = bpay(Array[Byte](1, 2), 7L)
    val hi = bpay(Array[Byte](1, 3), 7L)
    Seq(Seq((100L, lo), (100L, hi)), Seq((100L, hi), (100L, lo))).foreach { in =>
      val (_, mb, _) = Scd2Stream.step(IndexedSeq.empty, in, Long.MinValue, tb)
      assert(mb.length == 1 &&
        mb(0)._2.getAs[Array[Byte]](0).toSeq == Seq[Byte](1, 3))
    }
  }

  test("step: watermark eviction prunes the immutable prefix, never the open tail") {
    def pay(cid: Long) = Row(s"p$cid", 0L, cid)
    val tb = (r: Row) => r.get(2)
    val vs = IndexedSeq((100L, pay(1)), (200L, pay(2)), (300L, pay(3)), (400L, pay(4)))
    // wm=250: succ(100)=200<250 evictable; succ(200)=300>=250 stays
    val (_, m, evict) = Scd2Stream.step(vs, Nil, 250L, tb)
    assert(evict == 1 && m.drop(evict).map(_._1) == IndexedSeq(200L, 300L, 400L))
    // wm beyond everything: all but the current version evict
    val (_, m2, evict2) = Scd2Stream.step(vs, Nil, 10000L, tb)
    assert(evict2 == 3 && m2.drop(evict2).map(_._1) == IndexedSeq(400L))
  }
}
