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
    // consumeFrom: replaces startingOffsets with startingTimestamp (ms)
    val from = Sources.kafkaOptions("b:9092", "t", consumeFromSec = 1700000000L)
    assert(from("startingTimestamp") == "1700000000000")
    assert(!from.contains("startingOffsets"))
    // bounded replay: both ends as timestamps; ending is exclusive like the
    // reference's `time >= consumeTo` stop condition
    val bounded = Sources.kafkaOptions("b:9092", "t",
      consumeFromSec = 1700000000L, consumeToSec = 1700003600L)
    assert(bounded("startingTimestamp") == "1700000000000")
    assert(bounded("endingTimestamp") == "1700003600000")
    assert(!bounded.contains("startingOffsets"))
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
}
