package graft.sinks

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types._

/** Sink connectors (SURVEY §2.3). The reference's sinks are queue + writer
  * threads with hand-batched writes (AbstractOutputTable.java:10-53); on
  * Spark the equivalent unit is `foreachBatch` — each micro-batch is a
  * DataFrame written by the batch writers, which already batch/retry/
  * parallelize per partition.
  */
object Sinks {

  /** MySQL-style auto-DDL: CREATE TABLE IF NOT EXISTS derived from the
    * schema, mirroring MysqlOutputTable (sp/output/MysqlOutputTable.java:
    * 56-157 builds the same statement text from column types; BIGDECIMAL
    * round-trips as VARCHAR per Type.java:47-61).
    */
  def createTableDdl(table: String, schema: StructType, indexCols: Seq[String] = Nil): String = {
    def sqlType(dt: DataType): String = dt match {
      case IntegerType => "INT"
      case LongType => "BIGINT"
      case DoubleType => "DOUBLE"
      case FloatType => "FLOAT"
      case StringType => "TEXT"
      case _: DecimalType => "VARCHAR(64)"
      case TimestampType => "TIMESTAMP"
      case DateType => "DATE"
      case BooleanType => "BOOLEAN"
      case BinaryType => "BLOB"
      case other => throw new IllegalArgumentException(s"no JDBC mapping for $other")
    }
    val cols = schema.fields.map(f => s"`${f.name}` ${sqlType(f.dataType)}").mkString(", ")
    val idx =
      if (indexCols.isEmpty) ""
      else s", INDEX idx_${table}_0 (${indexCols.map(c => s"`$c`").mkString(", ")})"
    s"CREATE TABLE IF NOT EXISTS `$table` ($cols$idx)"
  }

  /** Bounded retry with doubling backoff, the reference's writer-thread
    * resilience (MysqlOutputTable.java:262-301 catches-and-continues in the
    * writer loop; RdsDimensionTable.java:73-145 is the sleep-and-retry
    * idiom). Rethrows the last failure once attempts are exhausted so the
    * streaming query still fails loudly on a persistent outage.
    *
    * Each failed attempt is reported through `onFailure(attempt, delayMs, e)`
    * (default: a WARN log line, matching the reference's per-retry writer
    * warnings) — a silent retry hides a degrading target until it's an
    * outage. `InterruptedException` is NEVER retried: it means the streaming
    * query (or executor) is shutting down, so it is rethrown with the
    * interrupt flag restored instead of sleeping through backoff. `sleep`
    * and `onFailure` are injectable for tests.
    */
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  def defaultOnFailure(attempt: Int, delayMs: Long, e: Throwable): Unit =
    log.warn(s"write attempt $attempt failed (${e.getClass.getSimpleName}: " +
      s"${e.getMessage}); retrying in ${delayMs} ms")

  def withRetry[A](maxAttempts: Int = 3, backoffMs: Long = 1000,
      sleep: Long => Unit = Thread.sleep,
      onFailure: (Int, Long, Throwable) => Unit = defaultOnFailure)(f: => A): A = {
    var attempt = 1
    var delay = backoffMs
    while (true) {
      try return f
      catch {
        case e: InterruptedException =>
          Thread.currentThread().interrupt()
          throw e
        case e: Exception if attempt < maxAttempts =>
          onFailure(attempt, delay, e)
          // Thread.sleep CLEARS the interrupt flag when it throws; restore it
          // so the shutdown-passthrough contract holds even when the
          // interrupt lands mid-backoff rather than mid-write.
          try sleep(delay)
          catch {
            case ie: InterruptedException =>
              Thread.currentThread().interrupt()
              throw ie
          }
          delay *= 2
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** foreachBatch with the bounded-retry wrapper around an arbitrary batch
    * write. A retried partial append is at-least-once (same as the
    * reference's writer threads, which re-enqueue the failed batch) —
    * exactly-once needs an idempotent target (e.g. upsert on key).
    */
  def foreachBatchRetry(df: DataFrame, maxAttempts: Int = 3, backoffMs: Long = 1000)(
      write: Dataset[Row] => Unit): DataStreamWriter[Row] =
    df.writeStream.outputMode("append").foreachBatch {
      (batch: Dataset[Row], _: Long) =>
        withRetry(maxAttempts, backoffMs)(write(batch))
    }

  /** JDBC sink: per-micro-batch append through the batch JDBC writer (which
    * does the multi-row batched inserts the reference hand-codes,
    * MysqlOutputTable.java:159-306), surviving transient target failures via
    * the bounded-retry wrapper.
    */
  def jdbcSink(
      df: DataFrame,
      url: String,
      table: String,
      props: java.util.Properties = new java.util.Properties,
      maxAttempts: Int = 3,
      backoffMs: Long = 1000): DataStreamWriter[Row] =
    foreachBatchRetry(df, maxAttempts, backoffMs) { batch =>
      batch.write.mode("append").jdbc(url, table, props)
    }

  /** Wire-format half of the Kafka sink: rows → (key, value) records;
    * `__time__` becomes the record key and is dropped from the JSON payload
    * (KafkaOutputTable.java:37-178 semantics). Public because it is the
    * testable half — the round-trip spec feeds it straight into
    * `Sources.kafkaJsonParse` (the source's wire-format half), verifying the
    * full record contract without the absent broker.
    */
  def kafkaJsonPayload(df: DataFrame): DataFrame = {
    val payloadCols = df.columns.filterNot(_ == "__time__").map(col)
    df.select(
      col("__time__").cast("string").as("key"),
      to_json(struct(payloadCols.toSeq: _*)).as("value"))
  }

  /** Kafka sink: rows → JSON payload; `__time__` becomes the record key and
    * is dropped from the payload (KafkaOutputTable.java:37-178 semantics).
    */
  def kafkaJsonSink(df: DataFrame, bootstrap: String, topic: String): DataStreamWriter[Row] = {
    kafkaJsonPayload(df)
      .writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
  }

  /** Partitioned parquet append — the warehouse sink a training-data pipeline
    * actually fans out to at 100 TB (hour/date partition columns keep
    * rewrite units bounded).
    */
  def parquetSink(df: DataFrame, path: String, checkpoint: String,
      partitionBy: Seq[String] = Nil): DataStreamWriter[Row] = {
    val w = df.writeStream.format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
    if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w
  }

  /** Console sink (Table.print parity, table/Table.java:48-67). */
  def consoleSink(df: DataFrame, numRows: Int = 100): DataStreamWriter[Row] =
    df.writeStream.format("console").option("numRows", numRows.toString)
}
