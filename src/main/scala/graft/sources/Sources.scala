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

  /** Kafka JSON stream: value parsed by declared schema (the reference's
    * `columnTypeMap`), record timestamp → `__time__` epoch-ms.
    */
  def kafkaJson(
      spark: SparkSession,
      bootstrap: String,
      topic: String,
      schema: StructType,
      startingOffsets: String = "latest"): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()
      .select(
        from_json(col("value").cast("string"), schema).as("j"),
        col("topic").as(TopicCol),
        unix_millis(col("timestamp")).as(TimeCol),
        unix_millis(current_timestamp()).as(ReceiveTimeCol))
      .select(col("j.*"), col(TopicCol), col(TimeCol), col(ReceiveTimeCol))

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
