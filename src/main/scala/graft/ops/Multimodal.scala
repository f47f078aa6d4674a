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
      if (m.payload == null)
        // a null blob is an unreadable asset: emit a visible failed-decode
        // row rather than NPE-ing the task or silently dropping the id
        // (found by RobustnessSpec's dirty-corpus sweep)
        Decoded(m.doc_id, "fake/unreadable", 0L, 0L, 0L)
      else {
        // --- codec call would go here; deterministic stand-in: ---
        val len = m.payload.length.toLong
        Decoded(m.doc_id, "fake/decoded", len % 640L, len % 480L, len / 64L + 1L)
      }
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

  val EmbedDims = 16
  val EmbedCells = 8

  /** The media → vector path: per-payload embedding + coarse-cell index
    * assignment, the composition a multimodal corpus runs between decode
    * and similarity search. The EMBEDDING MODEL is the deterministic stub
    * here (components derived from md5 of the content digest — in
    * production this is the encoder forward pass, exactly like the codec
    * in `decodePartition`); everything around it is the real shape:
    * map-only embed over the binary column, unit-normalization, broadcast
    * argmax-cosine assignment against a centroid set (`Similarity.
    * ivfAssign`'s flow, self-contained on the first `EmbedCells` media
    * vectors), ready for `ivfTopKFromIndex`-style probing. Deterministic
    * end-to-end, so unlike a real encoder it is hash-checkable cross-engine.
    */
  def embedAssign(docs: DataFrame): DataFrame = {
    val hash = (e: String) => s"cast(conv(substr(md5($e), 1, 15), 16, 10) as bigint)"
    val m = mediaTable(docs).select(col("doc_id"), md5(col("payload")).as("cmd5"))
      .withColumn("v", expr(
        s"transform(sequence(0, ${EmbedDims - 1}), " +
          s"j -> cast(${hash("concat('emb:', cmd5, ':', j)")} % 1000 as double) / 1000.0)"))
      .withColumn("nrm", expr(
        // a real encoder can emit an all-zero vector; the epsilon floor keeps
        // the normalize NaN-free (stub values are unchanged: nrm >> 1e-12)
        "greatest(sqrt(aggregate(v, cast(0.0 as double), (acc, x) -> acc + x * x)), 1.0e-12)"))
      .select(col("doc_id"), expr("transform(v, x -> x / nrm)").as("nv"))
      .localCheckpoint(false)
    val cents = m.filter(col("doc_id") < EmbedCells)
      .select(col("doc_id").as("cell"), col("nv").as("cv"))
    val wAssign = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("ccos").desc, col("cell"))
    m.join(broadcast(cents), lit(true))
      .select(col("doc_id"), col("cell"),
        round(graft.functions.GraftFunctions.dot(col("nv"), col("cv")), 6).as("ccos"))
      .withColumn("crk", row_number().over(wAssign))
      .filter(col("crk") === 1)
      .select(col("doc_id"), col("cell"), col("ccos"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_media_features" -> ((s, d) => features(Tables.documents(s, d))),
    "q_media_decode" -> ((s, d) => decoded(Tables.documents(s, d))),
    "q_media_embed" -> ((s, d) => embedAssign(Tables.documents(s, d))))

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
        |FROM documents""".stripMargin,

    "q_media_embed" ->
      s"""WITH m AS (SELECT doc_id, md5(text) AS cmd5 FROM documents),
         |e AS (SELECT doc_id,
         |        [CAST(('0x' || substr(md5('emb:' || cmd5 || ':' || j), 1, 15))::BIGINT % 1000
         |              AS DOUBLE) / 1000.0 for j in range(0, $EmbedDims)] AS v
         |      FROM m),
         |n AS (SELECT doc_id, v, sqrt(list_sum([x * x for x in v])) AS nrm FROM e),
         |nv AS (SELECT doc_id, [x / nrm for x in v] AS nv FROM n),
         |cents AS (SELECT doc_id AS cell, nv AS cv FROM nv WHERE doc_id < $EmbedCells),
         |a AS (SELECT d.doc_id, c.cell,
         |        round(list_sum([d.nv[i] * c.cv[i] for i in range(1, ${EmbedDims + 1})]), 6) AS ccos
         |      FROM nv d, cents c),
         |r AS (SELECT doc_id, cell, ccos,
         |        row_number() OVER (PARTITION BY doc_id ORDER BY ccos DESC, cell) AS crk
         |      FROM a)
         |SELECT doc_id, cell, ccos FROM r WHERE crk = 1""".stripMargin)
}
