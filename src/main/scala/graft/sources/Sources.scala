package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source connectors (SURVEY §2.1). Each maps one reference source to the
  * Spark reader that owns its distribution problem:
  *
  *   - `KafkaStreamTable` (sp/input/KafkaStreamTable.java:71-255):
  *     partition-per-consumer-thread, JSON parse, timestamp offsets →
  *     `readStream.format("kafka")` + `from_json`; Spark assigns partitions
  *     to executors and tracks offsets. The reference's record-key
  *     epoch-seconds becomes `__time__` (ms), its reserved columns
  *     (`__topic__` etc., AbstractStreamTable.java:25-38) come from Kafka
  *     metadata columns.
  *   - `MysqlStreamTable` (sp/input/MysqlStreamTable.java:84-110): striped
  *     `LIMIT` pages across servers×threads → partitioned `read.jdbc`
  *     (predicate stripes computed by Spark).
  *   - `InsertableStreamTable` (sp/input/InsertableStreamTable.java:21-33):
  *     programmatic test source → `MemoryStream`.
  *   - File-based streaming (new capability): `readStream` over a directory.
  *
  * The Kafka/JDBC builders construct lazy plans only — this container has no
  * broker/database (and no kafka connector jar), so they are compile-checked
  * code paths; the file and memory sources are fully spec-tested.
  */
object Sources {

  /** Reserved stream-metadata columns, mirroring AbstractStreamTable.java:25-38. */
  val TimeCol = "__time__"
  val TopicCol = "__topic__"
  val ReceiveTimeCol = "__receive_time__"

  /** Reader options for a Kafka scan, with the reference's timestamp-bounded
    * consumption semantics (sp/input/KafkaStreamTable.java:71-110,140-166):
    * `consumeFromSec`/`consumeToSec` are epoch SECONDS (the reference's record
    * key unit; it seeks via `offsetsForTimes(consumeFrom)` and stops a
    * partition when `time >= consumeTo`).
    *
    * Mapping: `consumeFromSec` → `startingTimestamp` (Kafka resolves each
    * partition to the earliest offset with timestamp >= it — exactly
    * offsetsForTimes); `consumeToSec` → `endingTimestamp` (resolved the same
    * way, and ending offsets are exclusive, so records with
    * time >= consumeTo are excluded — the reference's stop condition).
    * `endingTimestamp` only exists for batch reads; streaming has no end.
    *
    * `startingOffsetsByTimestampStrategy=latest` matches the reference's
    * offsetsForTimes fallback: a partition with no record at/after
    * `consumeFrom` starts from its end instead of failing the query (Spark's
    * default strategy is `error`).
    */
  def kafkaOptions(
      bootstrap: String,
      topic: String,
      startingOffsets: String = "latest",
      consumeFromSec: Long = -1,
      consumeToSec: Long = -1): Map[String, String] = {
    val base = Map("kafka.bootstrap.servers" -> bootstrap, "subscribe" -> topic)
    val start =
      if (consumeFromSec >= 0)
        Map("startingTimestamp" -> (consumeFromSec * 1000L).toString,
          "startingOffsetsByTimestampStrategy" -> "latest")
      else Map("startingOffsets" -> startingOffsets)
    val end =
      if (consumeToSec >= 0) Map("endingTimestamp" -> (consumeToSec * 1000L).toString)
      else Map.empty[String, String]
    base ++ start ++ end
  }

  /** JSON-value projection shared by the streaming and bounded Kafka readers:
    * value parsed by declared schema (the reference's `columnTypeMap`),
    * record timestamp → `__time__` epoch-ms, reserved metadata columns.
    * Public because it IS the testable half of the Kafka source: everything
    * from the wire record (value, topic, timestamp) to typed rows is this
    * function; only the broker I/O itself (`format("kafka").load`) needs a
    * broker — see the round-trip spec in SourcesSinksSpec and the "Kafka
    * verification boundary" note in README.
    */
  def kafkaJsonParse(raw: DataFrame, schema: StructType): DataFrame =
    raw
      .select(
        from_json(col("value").cast("string"), schema).as("j"),
        col("topic").as(TopicCol),
        unix_millis(col("timestamp")).as(TimeCol),
        unix_millis(current_timestamp()).as(ReceiveTimeCol))
      .select(col("j.*"), col(TopicCol), col(TimeCol), col(ReceiveTimeCol))

  /** Kafka JSON stream; set `consumeFromSec` to replay from a point in time
    * (reference `consumeFrom`).
    */
  def kafkaJson(
      spark: SparkSession,
      bootstrap: String,
      topic: String,
      schema: StructType,
      startingOffsets: String = "latest",
      consumeFromSec: Long = -1): DataFrame = {
    val reader = spark.readStream.format("kafka")
    kafkaOptions(bootstrap, topic, startingOffsets, consumeFromSec).foreach {
      case (k, v) => reader.option(k, v)
    }
    kafkaJsonParse(reader.load(), schema)
  }

  /** Bounded BATCH replay of a Kafka topic between two epoch-second points —
    * the reference's `consumeFrom`/`consumeTo` pair
    * (KafkaStreamTable.java:140-166): a finite DataFrame over exactly the
    * records with consumeFrom <= time < consumeTo. The common backfill shape:
    * replay a window of the topic through the same batch operators.
    */
  def kafkaJsonBounded(
      spark: SparkSession,
      bootstrap: String,
      topic: String,
      schema: StructType,
      consumeFromSec: Long,
      consumeToSec: Long): DataFrame = {
    val reader = spark.read.format("kafka")
    kafkaOptions(bootstrap, topic, consumeFromSec = consumeFromSec, consumeToSec = consumeToSec)
      .foreach { case (k, v) => reader.option(k, v) }
    kafkaJsonParse(reader.load(), schema)
  }

  /** Partitioned JDBC scan — the reference stripes `LIMIT start,batch` pages
    * over servers×threads by hand; `read.jdbc` generates the same stripes
    * from (partitionColumn, bounds, numPartitions) and pushes them into the
    * database as WHERE clauses.
    */
  def jdbcPartitioned(
      spark: SparkSession,
      url: String,
      table: String,
      partitionColumn: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int,
      props: java.util.Properties = new java.util.Properties): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lowerBound, upperBound, numPartitions, props)

  /** Programmatic in-process stream source (InsertableStreamTable parity):
    * tests append typed rows and run micro-batches deterministically.
    */
  def memoryStream[A](spark: SparkSession)(implicit enc: org.apache.spark.sql.Encoder[A]): MemoryStream[A] =
    MemoryStream[A](spark)

  /** Directory stream of parquet files with a declared schema. */
  def fileStream(spark: SparkSession, path: String, schema: StructType, format: String = "parquet"): DataFrame =
    spark.readStream.format(format).schema(schema).load(path)
}
