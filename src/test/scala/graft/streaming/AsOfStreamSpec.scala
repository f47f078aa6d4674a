package graft.streaming

import org.apache.spark.sql.Row
import graft.SparkSpec
import graft.sources.Sources

/** Generic streaming as-of join: two-column key, multi-column values,
  * Row-encoded state — including the case the round-5 operator missed: a
  * right row arriving a BATCH LATER than the left row it must match.
  */
case class Lg(k1: String, k2: Long, t: Long, v: Double, tag: String)
case class Rg(k1: String, k2: Long, rt: Long, rv: Double, rn: Long)

class AsOfStreamSpec extends SparkSpec {

  private def runScenario(queryName: String): Unit = {
    import spark.implicits._
    val lsrc = Sources.memoryStream[Lg](spark)
    val rsrc = Sources.memoryStream[Rg](spark)
    val joined = AsOfStream.join(lsrc.toDS().toDF(), rsrc.toDS().toDF(),
      keys = Seq("k1", "k2"), leftTime = "t", rightTime = "rt",
      valueCols = Seq("rv", "rn"), watermarkDelay = "5 seconds")
    val q = joined.writeStream.format("memory").queryName(queryName)
      .outputMode("append").start()
    try {
      // b1: one right, lefts straddling it out of order; watermark still 0
      rsrc.addData(Seq(Rg("a", 1, 1000, 10.0, 1)))
      lsrc.addData(Seq(Lg("a", 1, 500, 0.5, "x"), Lg("a", 1, 1500, 1.5, "y"),
        Lg("a", 1, 2000, 2.0, "z"), Lg("b", 2, 2000, 9.0, "w")))
      q.processAllAvailable()
      // b2: a right at 1800 arrives a batch AFTER the left at 2000 it must
      // match (the round-5 eager-emit bug), plus a right at 3000 the left
      // at 2000 must NOT see
      rsrc.addData(Seq(Rg("a", 1, 1800, 18.0, 2), Rg("a", 1, 3000, 30.0, 3)))
      q.processAllAvailable()
      // b3: more lefts; max event time 9000 pushes the watermark to 4000,
      // maturing everything below it
      lsrc.addData(Seq(Lg("a", 1, 4000, 4.0, "p"), Lg("a", 1, 9000, 9.9, "q")))
      q.processAllAvailable()
      // b4: flush far ahead; watermark 15000 matures the rest (the right at
      // 1000 was evicted long ago, but the floor right 3000 must survive)
      lsrc.addData(Seq(Lg("a", 1, 20000, 0.0, "flush")))
      q.processAllAvailable()

      val got = spark.table(queryName).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) ->
          ((Option(r.get(5)), Option(r.get(6)), Option(r.get(7)))))
        .toMap
      assert(got == Map(
        ("a", 1L, 500L) -> ((None, None, None)),
        ("a", 1L, 1500L) -> ((Some(10.0), Some(1L), Some(1000L))),
        ("a", 1L, 2000L) -> ((Some(18.0), Some(2L), Some(1800L))), // late-batch right matched
        ("b", 2L, 2000L) -> ((None, None, None)),
        ("a", 1L, 4000L) -> ((Some(30.0), Some(3L), Some(3000L))),
        ("a", 1L, 9000L) -> ((Some(30.0), Some(3L), Some(3000L)))))

      // column names/order mirror the batch operator's contract
      assert(spark.table(queryName).columns.toSeq ==
        Seq("k1", "k2", "t", "v", "tag", "rv_r", "rn_r", "rt_r"))

      // cross-check: identical to the batch asof operator on the same rows
      import spark.implicits._
      val leftDf = Seq(Lg("a", 1, 500, 0.5, "x"), Lg("a", 1, 1500, 1.5, "y"),
        Lg("a", 1, 2000, 2.0, "z"), Lg("b", 2, 2000, 9.0, "w"),
        Lg("a", 1, 4000, 4.0, "p"), Lg("a", 1, 9000, 9.9, "q")).toDF()
      val rightDf = Seq(Rg("a", 1, 1000, 10.0, 1), Rg("a", 1, 1800, 18.0, 2),
        Rg("a", 1, 3000, 30.0, 3)).toDF()
      val batch = graft.ops.AsOf
        .asofJoin(leftDf, rightDf, Seq("k1", "k2"), "t", "rt", Seq("rv", "rn"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) ->
          ((Option(r.get(5)), Option(r.get(6)), Option(r.get(7)))))
        .toMap
      assert(batch == got)
    } finally q.stop()
  }

  test("generic streaming asof: late-batch rights, composite key, multi values") {
    runScenario("asof_generic")
  }

  test("streaming asof runs on the RocksDB state store") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      graft.GraftSession.RocksDbProvider)
    try runScenario("asof_rocks")
    finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("batch mode through the same code path == AsOf.asofJoin") {
    import spark.implicits._
    val leftDf = Seq(Lg("a", 1, 500, 0.5, "x"), Lg("a", 1, 1500, 1.5, "y"),
      Lg("b", 2, 2000, 9.0, "w")).toDF()
    val rightDf = Seq(Rg("a", 1, 1000, 10.0, 1), Rg("b", 2, 2500, 25.0, 5)).toDF()
    val viaStream = AsOfStream.join(leftDf, rightDf,
      Seq("k1", "k2"), "t", "rt", Seq("rv", "rn")).collect().map(_.toSeq).toSet
    val viaBatch = graft.ops.AsOf.asofJoin(leftDf, rightDf,
      Seq("k1", "k2"), "t", "rt", Seq("rv", "rn")).collect().map(_.toSeq).toSet
    assert(viaStream == viaBatch && viaStream.nonEmpty)
  }

  test("step: many rights per key per batch merge in one sorted pass") {
    // 1000 rights in one batch against a buffered state — the round-5 list
    // partition/rebuild would be O(n^2); the merge is linear and the result
    // time-sorted with equal-time replacement (newest arrival wins)
    val incoming = (1 to 1000).map(i => ((i * 10).toLong, false, Row(i.toDouble))) ++
      Seq((5000L, false, Row(-1.0))) // duplicate of right at t=5000: replaces
    val pending0 = IndexedSeq((4995L, Row("left")))
    val rights0 = IndexedSeq((5L, Row(0.5)), (5000L, Row(500.0)))
    val (out, pending, rights) = AsOfStream.step(incoming, pending0, rights0, 5000L)
    // left at 4995 matured (4995 < 5000): latest right <= 4995 is t=4990
    assert(out == Seq((4995L, Row("left"), Some(Row(499.0)))))
    assert(pending.isEmpty)
    // rights sorted; eviction keeps the floor right at-or-below wm=5000 —
    // which is the duplicate t=5000, replaced by the newest arrival (-1.0)
    assert(rights.map(_._1) == rights.map(_._1).sorted)
    assert(rights.head == ((5000L, Row(-1.0))) && rights.length == 501)
  }
}
