package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `BinaryType`
  * payloads plus a typed metadata struct, with decode / feature-extraction
  * implemented as partition-local batch transforms.
  *
  * The real decode libraries (image/audio codecs) are not in this container,
  * so `decodePartition` is a clearly-marked DETERMINISTIC STUB — but the
  * Spark-side plumbing (schema, binary handling, mapPartitions batch shape,
  * partition sizing) is real and oracle-tested. Swapping the stub body for
  * JNI/FFI codec calls changes nothing structurally.
  *
  * Scale notes: payloads never enter a shuffle key; feature extraction is
  * mapPartitions (amortizes per-batch codec init, the reason pipelines use
  * partition-level UDFs); `spark.sql.files.maxPartitionBytes` bounds memory
  * per task when payloads are large.
  */
object Multimodal {

  /** Simulated media table: the document text bytes act as the opaque binary
    * payload (in production: the image/audio blob), with typed metadata.
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        col("source").as("origin"),
        length(col("text")).cast("long").as("declared_len")).as("meta"))

  /** Pure-expression feature pass — byte length, chunking, digest, head bytes.
    * Codegen'd, map-only.
    */
  def features(docs: DataFrame): DataFrame =
    mediaTable(docs).select(
      col("doc_id"),
      col("meta.mime").as("mime"),
      octet_length(col("payload")).cast("long").as("byte_len"),
      ceil(octet_length(col("payload")) / lit(4096.0)).cast("long").as("n_chunks"),
      md5(col("payload")).as("content_md5"),
      hex(substring(col("payload"), 1, 16)).as("head16"))

  /** Typed input to the decode pass: one opaque payload per row. */
  case class MediaPayload(doc_id: Long, payload: Array[Byte])

  /** Typed output of the decode pass. */
  case class Decoded(doc_id: Long, kind: String, width: Long, height: Long,
      n_frames: Long)

  /** Partition-local "decode": iterates rows in batches the way a codec
    * binding would. STUB — derives fake dimensions deterministically from the
    * payload length (`???`-equivalent for the codec call, kept runnable); the
    * iterator shape, schema contract, and laziness are the real thing.
    */
  def decodePartition(rows: Iterator[MediaPayload]): Iterator[Decoded] =
    rows.map { m =>
      // --- codec call would go here; deterministic stand-in: ---
      val len = m.payload.length.toLong
      Decoded(m.doc_id, "fake/decoded", len % 640L, len % 480L, len / 64L + 1L)
    }

  /** Typed `Dataset.mapPartitions` keeps the decode inside the Catalyst plan
    * (DeserializeToObject → MapPartitions → SerializeFromObject): column
    * pruning still reaches the scan and no `ExistingRDD` re-scan is created,
    * unlike the `df.rdd.mapPartitions` + `createDataFrame` idiom.
    */
  def decoded(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    mediaTable(docs)
      .select(col("doc_id"), col("payload")).as[MediaPayload]
      .mapPartitions(decodePartition)
      .toDF()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_media_features" -> ((s, d) => features(Tables.documents(s, d))),
    "q_media_decode" -> ((s, d) => decoded(Tables.documents(s, d))))

  // Oracle: document text is pure ASCII [a-z ] (verified against the data),
  // so octet_length(payload) == length(text) and md5(payload) == md5(text).
  val oracleSql: Map[String, String] = Map(
    "q_media_features" ->
      """SELECT doc_id, 'text/plain' AS mime,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  CAST(ceil(octet_length(encode(text)) / 4096.0) AS BIGINT) AS n_chunks,
        |  md5(text) AS content_md5,
        |  hex(encode(substr(text, 1, 16))) AS head16
        |FROM documents""".stripMargin,

    "q_media_decode" ->
      """SELECT doc_id, 'fake/decoded' AS kind,
        |  CAST(octet_length(encode(text)) % 640 AS BIGINT) AS width,
        |  CAST(octet_length(encode(text)) % 480 AS BIGINT) AS height,
        |  CAST(octet_length(encode(text)) // 64 + 1 AS BIGINT) AS n_frames
        |FROM documents""".stripMargin)
}
