package graft.streaming

import graft.SparkSpec
import graft.sources.Sources
import org.apache.spark.sql.functions._

/** Restart durability: a streaming query resumed from its checkpoint must
  * carry its operator state across the restart — the property that makes a
  * production ingest survive a deploy or an executor loss without
  * re-admitting duplicates. The sink is the fault-tolerant parquet file
  * sink (the memory sink refuses checkpoint recovery), so output
  * accumulates across both runs and the assertions read the final
  * directory.
  */
class CheckpointRecoverySpec extends SparkSpec {

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString

  test("near-dedup bucket state survives a restart from checkpoint") {
    import spark.implicits._
    val text = "the quick brown fox jumps over the lazy dog again and again and again"
    val src = Sources.memoryStream[NDoc](spark)
    val plan = NearDupStream.pairs(src.toDS().toDF(), watermarkDelay = "1 hour")
    val ckpt = tmp("ckpt-pairs")
    val out = tmp("out-pairs")

    val q1 = plan.writeStream.option("checkpointLocation", ckpt)
      .format("parquet").option("path", out).outputMode("append").start()
    try {
      src.addData(Seq(NDoc(ts(1000), 1L, text)))
      q1.processAllAvailable()
    } finally q1.stop()

    // restart from the same checkpoint: doc 1's signature must still be in
    // bucket state, so the post-restart duplicate pairs with it
    val q2 = plan.writeStream.option("checkpointLocation", ckpt)
      .format("parquet").option("path", out).outputMode("append").start()
    try {
      src.addData(Seq(NDoc(ts(2000), 2L, text)))
      q2.processAllAvailable()
    } finally q2.stop()

    // cumulative output across both runs: exactly the cross-restart pair —
    // which also proves run 1 emitted nothing (it had nothing to pair with)
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(4)))
    assert(got.toSeq == Seq((1L, 2L, 2L)),
      s"pre-restart doc must pair from recovered state: ${got.mkString(";")}")
  }

  test("full admission chain resumes from checkpoint: exact + near state both recovered") {
    import spark.implicits._
    val goodA = "the quick brown fox jumps over the lazy dog and the cat sleeps " +
      "in the warm sun while the dog watches the yard and is in a good mood"
    val flush = "the late evening ferry is crossing the wide bay and the distant shore " +
      "lights are slowly fading into a calm and quiet night of stars"
    spark.conf.set("spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "false")
    val src = Sources.memoryStream[SDoc](spark)
    val plan = CorpusIngest.admittedDocs(src.toDS().toDF(), watermarkDelay = "10 seconds")
    val ckpt = tmp("ckpt-chain")
    val out = tmp("out-chain")
    try {
      val q1 = plan.writeStream.option("checkpointLocation", ckpt)
        .format("parquet").option("path", out).outputMode("append").start()
      try {
        src.addData(Seq(SDoc(ts(1000), 1L, "s", goodA)))
        q1.processAllAvailable()
      } finally q1.stop()

      val q2 = plan.writeStream.option("checkpointLocation", ckpt)
        .format("parquet").option("path", out).outputMode("append").start()
      try {
        // post-restart: an exact copy and a near copy of the PRE-restart doc,
        // then a far-future long flusher to finalize admissions
        src.addData(Seq(
          SDoc(ts(2000), 2L, "s", goodA),                               // exact dup of 1
          SDoc(ts(3000), 3L, "s", goodA + " extra trailing words here"))) // near dup of 1
        q2.processAllAvailable()
        src.addData(Seq(SDoc(ts(100000000L), 99L, "s", flush)))
        q2.processAllAvailable()
      } finally q2.stop()

      val admitted = spark.read.parquet(out).collect().map(_.getLong(1)).toSet
      // doc 1's admission group was still open at the restart (the watermark
      // was below its ts when run 1 stopped): it can only have finalized
      // POST-restart, from recovered aggregation state
      assert(admitted.contains(1L),
        s"pre-restart doc must finalize from recovered agg state: $admitted")
      // ...and its duplicates must stay rejected against RECOVERED
      // exact-fingerprint and near-dup bucket state
      assert(!admitted.contains(2L) && !admitted.contains(3L),
        s"duplicates of a pre-restart doc must stay rejected: $admitted")
    } finally
      spark.conf.set("spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "true")
  }

  test("over-window reorder buffer recovers from a RocksDB checkpoint too") {
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", graft.GraftSession.RocksDbProvider)
    try {
      val src = Sources.memoryStream[OverWindows.Event](spark)
      val plan = OverWindows.byDuration(src.toDS(), sizeMs = 2000, watermarkDelay = "1 hour")
      val ckpt = tmp("ckpt-over-rocks")
      val out = tmp("out-over-rocks")
      val q1 = plan.writeStream.option("checkpointLocation", ckpt)
        .format("parquet").option("path", out).outputMode("append").start()
      try {
        src.addData(Seq(OverWindows.Event(1, 1000, 1.0), OverWindows.Event(1, 2500, 2.0)))
        q1.processAllAvailable()
      } finally q1.stop()
      val q2 = plan.writeStream.option("checkpointLocation", ckpt)
        .format("parquet").option("path", out).outputMode("append").start()
      try {
        src.addData(Seq(OverWindows.Event(1, 2000, 3.0)))
        q2.processAllAvailable()
        src.addData(Seq(OverWindows.Event(2, 4000000000000000L, 0.0)))
        q2.processAllAvailable()
      } finally q2.stop()
      val events = Seq(OverWindows.Event(1, 1000, 1.0), OverWindows.Event(1, 2500, 2.0),
        OverWindows.Event(1, 2000, 3.0))
      assert(spark.read.parquet(out).as[OverWindows.OverOut].collect().toSet.filter(_.key == 1) ==
        OverWindows.byDurationBatch(events.toDS(), 2000).collect().toSet,
        "RocksDB-recovered pending rows must yield the batch frames exactly")
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("over-window reorder buffer survives a restart: pre-restart pending rows fold in order") {
    import spark.implicits._
    val src = Sources.memoryStream[OverWindows.Event](spark)
    val plan = OverWindows.byDuration(src.toDS(), sizeMs = 2000, watermarkDelay = "1 hour")
    val ckpt = tmp("ckpt-over")
    val out = tmp("out-over")

    // run 1: two events arrive but the watermark (1 h delay) passes neither
    // — both are parked in the reorder buffer, nothing emits
    val q1 = plan.writeStream.option("checkpointLocation", ckpt)
      .format("parquet").option("path", out).outputMode("append").start()
    try {
      src.addData(Seq(OverWindows.Event(1, 1000, 1.0), OverWindows.Event(1, 2500, 2.0)))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(spark.read.parquet(out).count() == 0,
      "pre-restart rows must still be pending (watermark has not passed them)")

    // run 2, same checkpoint: an event OLDER than the buffered 2500 arrives,
    // then a far-future flush matures everything. The recovered buffer must
    // fold all three in event-time order — frames identical to batch.
    val q2 = plan.writeStream.option("checkpointLocation", ckpt)
      .format("parquet").option("path", out).outputMode("append").start()
    try {
      src.addData(Seq(OverWindows.Event(1, 2000, 3.0)))
      q2.processAllAvailable()
      src.addData(Seq(OverWindows.Event(2, 4000000000000000L, 0.0)))
      q2.processAllAvailable()
    } finally q2.stop()

    val events = Seq(OverWindows.Event(1, 1000, 1.0), OverWindows.Event(1, 2500, 2.0),
      OverWindows.Event(1, 2000, 3.0))
    val got = spark.read.parquet(out).as[OverWindows.OverOut]
      .collect().toSet.filter(_.key == 1)
    val want = OverWindows.byDurationBatch(events.toDS(), 2000).collect().toSet
    assert(got == want,
      s"recovered pending rows must yield the batch frames exactly:\n got=$got\nwant=$want")
  }
}
