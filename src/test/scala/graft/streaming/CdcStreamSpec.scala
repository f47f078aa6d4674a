package graft.streaming

import graft.{SparkSpec, Tables}
import graft.ops.Cdc
import graft.sources.Sources
import org.apache.spark.sql.functions._
import java.nio.file.Files

class CdcStreamSpec extends SparkSpec {

  private def withDerby(test: String => Unit): Unit = {
    val db = Files.createTempDirectory("derby-cdc").resolve("db").toString
    val url = s"jdbc:derby:$db;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      conn.createStatement().execute(
        "CREATE TABLE cdc_t (user_id BIGINT, event_id BIGINT, " +
          "event_type VARCHAR(32), value DOUBLE, ts_ms BIGINT, is_del BOOLEAN)")
    } finally conn.close()
    test(url)
  }

  test("streaming CDC materialization: upserts, tombstone deletes, late batches can't regress") {
    import spark.implicits._
    withDerby { url =>
      val src = Sources.memoryStream[(Long, Long, String, Double, Long)](spark)
      val changes = src.toDS().toDF("user_id", "event_id", "event_type", "value", "ts_ms")
        .withColumn("is_del", col("event_type") === "delete")
      val q = CdcStream.materializeJdbc(changes, url, "cdc_t",
        keys = Seq("user_id"), ordering = Seq("ts_ms", "event_id"),
        tombstoneCol = Some("is_del"))
        .option("checkpointLocation", Files.createTempDirectory("ckp-cdc").toString)
        .start()
      def snapshot(): Map[Long, (Long, Double)] =
        spark.read.jdbc(url, "cdc_t", new java.util.Properties).collect()
          .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
      try {
        src.addData(Seq(
          (1L, 10L, "upsert", 1.0, 100L),
          (1L, 11L, "upsert", 2.0, 200L),
          (2L, 20L, "upsert", 5.0, 100L)))
        q.processAllAvailable()
        assert(snapshot() == Map(1L -> ((11L, 2.0)), 2L -> ((20L, 5.0))))

        src.addData(Seq(
          (1L, 9L, "upsert", 0.5, 50L), // LATE: older than stored -> no regress
          (2L, 21L, "delete", 0.0, 200L), // tombstone -> row removed
          (3L, 30L, "upsert", 7.0, 100L)))
        q.processAllAvailable()
        assert(snapshot() == Map(1L -> ((11L, 2.0)), 3L -> ((30L, 7.0))))

        src.addData(Seq(
          (2L, 22L, "upsert", 6.0, 300L))) // resurrect after tombstone
        q.processAllAvailable()
        assert(snapshot() == Map(1L -> ((11L, 2.0)), 2L -> ((22L, 6.0)), 3L -> ((30L, 7.0))))
      } finally q.stop()

      // stream result == batch Cdc.latestSnapshot over the full log
      val log = Seq(
        (1L, 10L, "upsert", 1.0, 100L), (1L, 11L, "upsert", 2.0, 200L),
        (2L, 20L, "upsert", 5.0, 100L), (1L, 9L, "upsert", 0.5, 50L),
        (2L, 21L, "delete", 0.0, 200L), (3L, 30L, "upsert", 7.0, 100L),
        (2L, 22L, "upsert", 6.0, 300L))
        .toDF("user_id", "event_id", "event_type", "value", "ts_ms")
      val batch = Cdc.latestSnapshot(log, Seq("user_id"), Seq("ts_ms", "event_id"),
        isDelete = Some(col("event_type") === "delete"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
      assert(batch == snapshot())
    }
  }

  test("kill mid-stream: a batch upserted to the sink but uncommitted in the checkpoint replays idempotently") {
    import spark.implicits._
    withDerby { url =>
      val feed = Files.createTempDirectory("cdc-feed").toString
      val ckp = Files.createTempDirectory("ckp-cdc-replay").toString
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "user_id BIGINT, event_id BIGINT, event_type STRING, value DOUBLE, ts_ms BIGINT")
      def writeFeed(rows: Seq[(Long, Long, String, Double, Long)]): Unit =
        rows.toDF("user_id", "event_id", "event_type", "value", "ts_ms")
          .coalesce(1).write.mode("append").json(feed)
      def startQ() = {
        val changes = spark.readStream.schema(schema).json(feed)
          .withColumn("is_del", col("event_type") === "delete")
        CdcStream.materializeJdbc(changes, url, "cdc_t",
          keys = Seq("user_id"), ordering = Seq("ts_ms", "event_id"),
          tombstoneCol = Some("is_del"))
          .option("checkpointLocation", ckp).start()
      }
      val part1 = Seq(
        (1L, 10L, "upsert", 1.0, 100L), (1L, 11L, "upsert", 2.0, 200L),
        (2L, 20L, "upsert", 5.0, 100L))
      val part2 = Seq(
        (1L, 9L, "upsert", 0.5, 50L), // late, must lose to replayed state
        (2L, 21L, "delete", 0.0, 200L),
        (3L, 30L, "upsert", 7.0, 100L))
      writeFeed(part1)
      val q1 = startQ()
      try q1.processAllAvailable() finally { q1.stop(); q1.awaitTermination() }

      // Simulate the crash window the sink contract must survive: the
      // micro-batch reached Derby (foreachBatch ran) but the engine died
      // BEFORE writing the commit marker. Structured Streaming's recovery
      // re-runs exactly that batch from the offset log, so the DELETE+INSERT
      // upsert executes a second time against an already-upserted table.
      val commitsDir = new java.io.File(ckp, "commits")
      val newest = commitsDir.listFiles().filter(_.getName.forall(_.isDigit))
        .maxBy(_.getName.toLong)
      assert(newest.delete(), s"could not remove commit marker $newest")
      // the local FS is a ChecksumFileSystem: the marker's hidden .crc must
      // go too, or the replayed commit's rename trips over it
      new java.io.File(commitsDir, s".${newest.getName}.crc").delete()

      writeFeed(part2)
      val q2 = startQ()
      try q2.processAllAvailable() finally q2.stop()

      val rows = spark.read.jdbc(url, "cdc_t", new java.util.Properties).collect()
      // no duplicated entity after the replay (DELETE-then-INSERT per key)
      assert(rows.map(_.getLong(0)).distinct.length == rows.length,
        s"duplicate serving rows after replay: ${rows.mkString(",")}")
      val back = rows.map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
      // and the table converged to the batch-operator truth over the full log
      val batch = Cdc.latestSnapshot(
        (part1 ++ part2).toDF("user_id", "event_id", "event_type", "value", "ts_ms"),
        Seq("user_id"), Seq("ts_ms", "event_id"),
        isDelete = Some(col("event_type") === "delete"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
      assert(back == batch, s"serving table $back != batch truth $batch")
    }
  }

  test("snapshot state survives a restart from checkpoint (ordering kept across the stop)") {
    import spark.implicits._
    withDerby { url =>
      val ckp = Files.createTempDirectory("ckp-cdc-rt").toString
      def run(feed: Seq[(Long, Long, String, Double, Long)]): Unit = {
        val src = Sources.memoryStream[(Long, Long, String, Double, Long)](spark)
        val changes = src.toDS().toDF("user_id", "event_id", "event_type", "value", "ts_ms")
          .withColumn("is_del", col("event_type") === "delete")
        val q = CdcStream.materializeJdbc(changes, url, "cdc_t",
          keys = Seq("user_id"), ordering = Seq("ts_ms", "event_id"),
          tombstoneCol = Some("is_del"))
          .option("checkpointLocation", ckp).start()
        try { src.addData(feed); q.processAllAvailable() } finally q.stop()
      }
      run(Seq((1L, 10L, "upsert", 1.0, 500L)))
      // NOTE a restarted MemoryStream restarts its offsets, so the second
      // run uses a FRESH source against the SAME checkpoint dir and Derby
      // target: what must survive is the aggregation state (the max_by
      // buffer holding ts 500), which the late row below must lose to.
      run(Seq((1L, 11L, "upsert", 9.0, 100L))) // older than stored state
      val back = spark.read.jdbc(url, "cdc_t", new java.util.Properties).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
      assert(back == Map(1L -> ((10L, 1.0))),
        s"restart must keep the max_by state, got $back")
    }
  }
}
