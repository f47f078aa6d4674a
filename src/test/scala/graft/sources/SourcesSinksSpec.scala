package graft.sources

import graft.SparkSpec
import graft.sinks.Sinks
import java.nio.file.Files
import org.apache.spark.sql.types._

class SourcesSinksSpec extends SparkSpec {

  test("DimensionTable pins snapshots and refreshes on demand") {
    import spark.implicits._
    val dir = Files.createTempDirectory("dim").toString
    Seq((1L, "v1")).toDF("k", "v").write.mode("overwrite").parquet(dir)
    val dim = DimensionTable.fromPath(spark, dir, refreshIntervalMs = Long.MaxValue)
    val snap1 = dim.current()
    assert(snap1.collect().map(_.getString(1)).toSeq == Seq("v1"))
    Seq((1L, "v2")).toDF("k", "v").write.mode("overwrite").parquet(dir)
    // pinned snapshot: unchanged until refresh
    assert(dim.current().collect().map(_.getString(1)).toSeq == Seq("v1"))
    dim.refreshNow()
    assert(dim.current().collect().map(_.getString(1)).toSeq == Seq("v2"))
  }

  test("DimensionTable.enrich left-joins a batch against the snapshot") {
    import spark.implicits._
    val dir = Files.createTempDirectory("dim2").toString
    Seq((1L, "one"), (2L, "two")).toDF("k", "name").write.mode("overwrite").parquet(dir)
    val dim = DimensionTable.fromPath(spark, dir)
    val batch = Seq((1L, 10.0), (3L, 30.0)).toDF("k", "x")
    val out = dim.enrich(batch, Seq("k")).collect()
    assert(out.length == 2)
    assert(out.find(_.getLong(0) == 3L).get.isNullAt(2)) // unmatched -> null padded
  }

  test("file stream source + parquet sink round-trip") {
    import spark.implicits._
    val in = Files.createTempDirectory("src").toString
    val out = Files.createTempDirectory("out").toString
    val ckp = Files.createTempDirectory("ckp").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").write.mode("overwrite").parquet(in)
    val schema = StructType(Seq(StructField("id", LongType), StructField("s", StringType)))
    val stream = Sources.fileStream(spark, in, schema)
    assert(stream.isStreaming)
    val q = Sinks.parquetSink(stream, out, ckp).start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.read.parquet(out).count() == 2)
  }

  test("auto-DDL mirrors the reference's CREATE TABLE generation") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("price", DoubleType), StructField("dec", DecimalType(18, 2))))
    val ddl = Sinks.createTableDdl("t1", schema, indexCols = Seq("id"))
    assert(ddl ==
      "CREATE TABLE IF NOT EXISTS `t1` (`id` BIGINT, `name` TEXT, `price` DOUBLE, " +
        "`dec` VARCHAR(64), INDEX idx_t1_0 (`id`))")
  }

  test("kafka options map consumeFrom/consumeTo (epoch sec) to timestamp offsets") {
    // plain start: offsets string passes through
    assert(Sources.kafkaOptions("b:9092", "t") ==
      Map("kafka.bootstrap.servers" -> "b:9092", "subscribe" -> "t",
        "startingOffsets" -> "latest"))
    // consumeFrom: replaces startingOffsets with startingTimestamp (ms);
    // strategy=latest mirrors the reference's offsetsForTimes fallback for
    // partitions with no record at/after the timestamp
    val from = Sources.kafkaOptions("b:9092", "t", consumeFromSec = 1700000000L)
    assert(from("startingTimestamp") == "1700000000000")
    assert(from("startingOffsetsByTimestampStrategy") == "latest")
    assert(!from.contains("startingOffsets"))
    // bounded replay: both ends as timestamps; ending is exclusive like the
    // reference's `time >= consumeTo` stop condition
    val bounded = Sources.kafkaOptions("b:9092", "t",
      consumeFromSec = 1700000000L, consumeToSec = 1700003600L)
    assert(bounded("startingTimestamp") == "1700000000000")
    assert(bounded("endingTimestamp") == "1700003600000")
    assert(!bounded.contains("startingOffsets"))
  }

  test("withRetry recovers after transient failures with doubling backoff") {
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    var calls = 0
    val out = Sinks.withRetry(maxAttempts = 4, backoffMs = 10, sleep = sleeps += _) {
      calls += 1
      if (calls < 3) throw new RuntimeException(s"transient $calls")
      "ok"
    }
    assert(out == "ok" && calls == 3)
    assert(sleeps.toSeq == Seq(10L, 20L)) // doubling backoff, one per failure
  }

  test("withRetry reports each failed attempt through the onFailure hook") {
    val reported = scala.collection.mutable.ArrayBuffer[(Int, Long, String)]()
    var calls = 0
    Sinks.withRetry(maxAttempts = 3, backoffMs = 10, sleep = _ => (),
      onFailure = (a, d, e) => reported += ((a, d, e.getMessage))) {
      calls += 1
      if (calls < 3) throw new RuntimeException(s"transient $calls")
      "ok"
    }
    // one report per FAILED attempt, carrying attempt #, the delay about to be
    // slept, and the exception — the reference warns per retry
    // (MysqlOutputTable.java:262-301); a silent retry hides a degrading target
    assert(reported.toSeq == Seq((1, 10L, "transient 1"), (2, 20L, "transient 2")))
  }

  test("withRetry never retries InterruptedException (shutdown passes through)") {
    var calls = 0
    var slept = false
    intercept[InterruptedException] {
      Sinks.withRetry(maxAttempts = 5, backoffMs = 1, sleep = _ => slept = true) {
        calls += 1
        throw new InterruptedException("query stopping")
      }
    }
    assert(calls == 1 && !slept, "shutdown must not sleep through backoff")
    assert(Thread.interrupted(), "interrupt flag must be restored") // also clears it
  }

  test("withRetry rethrows once attempts are exhausted") {
    var calls = 0
    val e = intercept[RuntimeException] {
      Sinks.withRetry(maxAttempts = 3, backoffMs = 1, sleep = _ => ()) {
        calls += 1
        throw new RuntimeException(s"persistent $calls")
      }
    }
    assert(calls == 3 && e.getMessage == "persistent 3")
  }

  test("jdbc sink survives a flaky target and lands all rows (embedded Derby)") {
    import spark.implicits._
    val db = Files.createTempDirectory("derby").resolve("db").toString
    val url = s"jdbc:derby:$db;create=true"
    val failures = new java.util.concurrent.atomic.AtomicInteger(0)
    val src = Sources.memoryStream[(Long, String)](spark)
    // Same shape as jdbcSink's foreachBatch, with an injected transient fault
    // on the first write attempt of each batch.
    val writer = Sinks.foreachBatchRetry(src.toDS().toDF("id", "s"),
      maxAttempts = 3, backoffMs = 1) { batch =>
      if (failures.getAndIncrement() == 0) throw new RuntimeException("db hiccup")
      batch.write.mode("append").jdbc(url, "sink_t", new java.util.Properties)
    }
    val q = writer.option("checkpointLocation",
      Files.createTempDirectory("ckp-jdbc").toString).start()
    try {
      src.addData(Seq((1L, "a"), (2L, "b")))
      q.processAllAvailable()
    } finally q.stop()
    assert(failures.get() >= 2, "first attempt should have failed and been retried")
    val back = spark.read.jdbc(url, "sink_t", new java.util.Properties)
    assert(back.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "a"), (2L, "b")))
  }

  test("jdbcSink -> Derby -> jdbcPartitioned round-trip, striped read") {
    import spark.implicits._
    val db = Files.createTempDirectory("derby-rt").resolve("db").toString
    val url = s"jdbc:derby:$db;create=true"
    val src = Sources.memoryStream[(Long, Double)](spark)
    // the REAL streaming jdbc sink (foreachBatch -> batch jdbc writer w/ retry)
    val q = Sinks.jdbcSink(src.toDS().toDF("id", "v"), url, "rt_t")
      .option("checkpointLocation", Files.createTempDirectory("ckp-rt").toString)
      .start()
    try {
      src.addData((1L to 100L).map(i => (i, i * 0.5)))
      q.processAllAvailable()
      src.addData(Seq((101L, 50.5))) // second micro-batch appends
      q.processAllAvailable()
    } finally q.stop()
    // partitioned read: 4 stripes over id — read.jdbc pushes the stripe
    // predicates into the database, the reference's hand-built LIMIT paging
    val back = Sources.jdbcPartitioned(spark, url, "rt_t", "id", 1L, 101L, 4)
    assert(back.rdd.getNumPartitions == 4, "scan must be striped")
    assert(back.count() == 101)
    assert(back.agg(org.apache.spark.sql.functions.sum("v")).head().getDouble(0) ==
      (1L to 101L).map(i => if (i == 101) 50.5 else i * 0.5).sum)
  }

  test("memory stream is the InsertableStreamTable adapter") {
    import spark.implicits._
    val src = Sources.memoryStream[(Long, String)](spark)
    val q = src.toDS().toDF("id", "s")
      .writeStream.format("memory").queryName("mem1").outputMode("append").start()
    try {
      src.addData(Seq((1L, "x"), (2L, "y")))
      q.processAllAvailable()
      assert(spark.table("mem1").count() == 2)
    } finally q.stop()
  }

  test("kafka wire-format round-trip: sink payload -> record -> source parse") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the container has no broker and no kafka connector jar, so the
    // verifiable surface is everything EITHER side of the socket: rows ->
    // (key=__time__, value=json) on the way out (KafkaOutputTable.java:37-178)
    // and (value, topic, timestamp) -> typed rows + __time__ on the way in
    // (KafkaStreamTable.java:151-178). Compose the two halves directly.
    val rows = Seq((7L, "alpha", 1700000001000L), (8L, "beta", 1700000002000L))
      .toDF("id", "name", "__time__")
    val records = Sinks.kafkaJsonPayload(rows)
    // payload drops __time__ from the value and makes it the record key
    val rec = records.collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    assert(rec.map(_._1).toSeq == Seq("1700000001000", "1700000002000"))
    assert(rec.forall(!_._2.contains("__time__")))
    // a broker would hand the consumer (value, topic, timestamp); the
    // reference's contract is record time == the key the producer set
    val wire = records.select(
      col("value"),
      lit("t1").as("topic"),
      timestamp_millis(col("key").cast("long")).as("timestamp"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val back = Sources.kafkaJsonParse(wire, schema)
      .select(col("id"), col("name"), col(Sources.TimeCol), col(Sources.TopicCol))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3))).sortBy(_._1)
    assert(back.toSeq == Seq(
      (7L, "alpha", 1700000001000L, "t1"),
      (8L, "beta", 1700000002000L, "t1")))
  }
}
