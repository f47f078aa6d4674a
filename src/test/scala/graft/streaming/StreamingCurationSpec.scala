package graft.streaming

import graft.SparkSpec
import graft.ops.{Curation, Sampling}
import graft.sources.Sources

/** The curation/sampling layer on a STREAM: all of these ops are map-only
  * (hash-gated filters, per-row explodes), so the same code runs under
  * Structured Streaming with no watermark, no state store, and no output-mode
  * restriction — a property the reference's windowed-only streaming model
  * doesn't have. Because membership is hash-deterministic, the streaming
  * result must equal the batch result on the same rows EXACTLY.
  */
case class CurDoc(doc_id: Long, text: String, lang: String)

class StreamingCurationSpec extends SparkSpec {

  private def docRows = Seq(
    CurDoc(1, "the quick brown fox jumps over the lazy dog", "en"),
    CurDoc(2, "der schnelle braune fuchs springt", "de"),
    CurDoc(3, "le renard brun rapide saute par dessus", "fr"),
    CurDoc(4, "the dog sleeps and the fox runs away now", "en"),
    CurDoc(5, "el zorro marron rapido salta sobre el perro", "es"),
    CurDoc(6, "the cat and the dog and the fox and the hen", "en"),
    CurDoc(7, "die katze schlaeft und der hund rennt weg", "de"))

  test("stratified sampling and chunking give identical results on a stream") {
    import spark.implicits._
    val rates = Map("en" -> 0.7, "de" -> 0.5, "fr" -> 1.0) // es dropped
    val src = Sources.memoryStream[CurDoc](spark)

    val sampled = Sampling.stratified(src.toDS().toDF(), "doc_id", "lang", rates)
    val chunked = Curation.chunks(src.toDS().toDF(), size = 4, stride = 3)

    val q1 = sampled.writeStream.format("memory").queryName("scur_sample")
      .outputMode("append").start()
    val q2 = chunked.writeStream.format("memory").queryName("scur_chunks")
      .outputMode("append").start()
    try {
      // two micro-batches — membership must not depend on batch boundaries
      src.addData(docRows.take(3)); q1.processAllAvailable(); q2.processAllAvailable()
      src.addData(docRows.drop(3)); q1.processAllAvailable(); q2.processAllAvailable()

      val batchDf = spark.createDataFrame(docRows)
      val wantSample = Sampling.stratified(batchDf, "doc_id", "lang", rates)
        .collect().toSet
      val wantChunks = Curation.chunks(batchDf, size = 4, stride = 3)
        .collect().toSet
      assert(spark.table("scur_sample").collect().toSet == wantSample)
      assert(spark.table("scur_chunks").collect().toSet == wantChunks)
      assert(wantChunks.nonEmpty && wantSample.nonEmpty)
    } finally { q1.stop(); q2.stop() }
  }
}
