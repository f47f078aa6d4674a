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

  test("decontamination stage in the admission chain: batch-gate verdicts, stateless") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def t(ms: Long) = new java.sql.Timestamp(ms)
    val benchText = "the quick brown fox jumps over the lazy dog and the cat sleeps " +
      "in the warm sun while the dog watches the yard and is in a good mood"
    val cleanText = "a gentle rain falls on the quiet town and the lights of the harbor " +
      "glow in the mist while a ship waits patiently out past the long stone pier"
    // benchmark suite: one doc (id 0); bench set built the batch way
    val benchDf = Seq((0L, benchText)).toDF("doc_id", "text")
    val set = Curation.benchmarkShingleSet(benchDf, "doc_id < 20")
    assert(set.nonEmpty)
    val contaminated = benchText + " with a few extra trailing words" // >10% shared
    // batch-gate law: the contaminated doc is cut, the clean doc is kept
    val verdicts = Curation.decontaminate(
      Seq((21L, cleanText), (22L, contaminated)).toDF("doc_id", "text"),
      set, "doc_id < 20")
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(verdicts == Map(21L -> true, 22L -> false), s"batch gate: $verdicts")

    val feed = Seq(
      SDoc(t(1000), 21L, "s", cleanText),
      SDoc(t(2000), 22L, "s", contaminated), // decontamination cut
      SDoc(t(3000), 23L, "s", "zz qq xx"),   // quality cut
      SDoc(t(4000), 24L, "s", cleanText))    // exact dup of 21
    val flush = SDoc(t(100000000L), 99L, "s",
      "the late evening ferry is crossing the wide bay and the distant shore " +
        "lights are slowly fading into a calm and quiet night of stars")
    spark.conf.set("spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "false")
    def run(name: String, bench: Array[Long]): Set[Long] = {
      val src = Sources.memoryStream[SDoc](spark)
      val q = CorpusIngest.admittedDocs(src.toDS().toDF(),
          watermarkDelay = "10 seconds", benchShingles = bench)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        src.addData(feed.take(2)); q.processAllAvailable()
        src.addData(feed.drop(2)); q.processAllAvailable()
        src.addData(Seq(flush)); q.processAllAvailable()
        spark.table(name).collect().map(_.getLong(1)).toSet
      } finally q.stop()
    }
    try {
      assert(run("scur_decon", set) == Set(21L),
        "contaminated doc must be cut by the streaming gate")
      // without the bench set the SAME chain admits doc 22 — the cut above
      // is attributable to the decontamination stage, nothing else
      assert(run("scur_nodecon", Array.empty[Long]) == Set(21L, 22L))
    } finally
      spark.conf.set("spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "true")
  }
}
