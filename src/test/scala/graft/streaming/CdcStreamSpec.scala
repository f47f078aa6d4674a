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
