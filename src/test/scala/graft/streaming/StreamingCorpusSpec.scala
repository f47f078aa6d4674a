package graft.streaming

import graft.SparkSpec
import graft.ops.{Dedup, Text}
import graft.sources.Sources
import org.apache.spark.sql.functions._

case class IngestDoc(ts: java.sql.Timestamp, doc_id: Long, source: String, text: String)

/** End-to-end streaming corpus ingestion: quality gate -> watermarked exact
  * dedup -> windowed admission stats, one append-mode plan. The admitted set
  * must match the batch operators run over the same rows.
  */
class StreamingCorpusSpec extends SparkSpec {

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  // crafted rows: two high-quality (stopword-rich) docs, one an exact
  // duplicate, one low-quality (short, stopword-free) doc that the gate drops
  private val good1 = "the quick brown fox jumps over the lazy dog"
  private val good2 = "a cat sleeps in the warm sun and the dog watches quietly"
  private val junk = "zz qq xx"

  private def rows = Seq(
    IngestDoc(ts(1000), 1, "web", good1),
    IngestDoc(ts(2000), 2, "web", good1), //  exact dup of doc 1 -> dropped
    IngestDoc(ts(3000), 3, "web", junk), //   below the quality cut -> dropped
    IngestDoc(ts(4000), 4, "books", good2),
    IngestDoc(ts(12000), 5, "web", good2)) // next window, fp seen before 12s watermark

  test("streaming ingest admits exactly what the batch gate + dedup admit") {
    runAdmissionScenario("scorpus")
  }

  test("ingest chain (two stateful operators) runs on the RocksDB state store") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      graft.GraftSession.RocksDbProvider)
    try runAdmissionScenario("scorpus_rocks")
    finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  private def runAdmissionScenario(name: String): Unit = {
    import spark.implicits._
    val src = Sources.memoryStream[IngestDoc](spark)
    val q = CorpusIngest.pipeline(src.toDS().toDF(), "10 seconds", "10 seconds")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      src.addData(rows.take(4))
      q.processAllAvailable()
      src.addData(rows.drop(4))
      q.processAllAvailable()
      // close windows: with two stateful operators the downstream agg sees
      // the PREVIOUS batch's watermark, so advance it over two micro-batches
      src.addData(Seq(IngestDoc(ts(60000), 99, "web", junk)))
      q.processAllAvailable()
      src.addData(Seq(IngestDoc(ts(61000), 98, "web", junk)))
      q.processAllAvailable()

      val out = spark.table(name).collect()
        .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2), r.getLong(3)))
        .sortBy(t => (t._1, t._2))

      // batch reference on the same rows: quality keep + keep-first dedup
      val batch = spark.createDataset(rows).toDF()
      val keptBatch = Text.quality(batch.select(col("doc_id"), col("text")))
        .filter(col("verdict") === "keep").select("doc_id")
        .join(batch, "doc_id")
      val survivors = Dedup.exact(keptBatch).select(col("keep_id").as("doc_id"))
        .join(keptBatch, "doc_id")
      val expect = survivors
        .groupBy(window(col("ts"), "10 seconds"), col("source"))
        .agg(count(lit(1)).as("n_docs"))
        .select(col("window.start").as("w"), col("source"), col("n_docs"))
        .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2)))
        .sortBy(t => (t._1, t._2))

      assert(out.map(t => (t._1, t._2, t._3)).toSeq == expect.toSeq,
        s"stream=${out.mkString(";")} batch=${expect.mkString(";")}")
      // duplicate doc 2 and junk doc 3 are not admitted; doc 5's fp was seen
      // in-watermark, so it is deduped too: windows = (0s web:1, 0s books:1)
      assert(out.map(_._3).sum == 2)
      // token counts: the web window admitted exactly good1's token count
      val good1Toks = good1.split(" ").length
      assert(out.find(t => t._2 == "web").get._4 == good1Toks)
    } finally q.stop()
  }

  test("trending terms rank per closed window with deterministic tie-break") {
    import spark.implicits._
    val src = Sources.memoryStream[IngestDoc](spark)
    val q = CorpusIngest.trendingTerms(src.toDS().toDF(), "5 seconds", "10 seconds", topK = 2)
      .writeStream.format("memory").queryName("strend").outputMode("append").start()
    try {
      // window [0,10): cat x3, dog x2, ant x1 -> top2 = cat(3), dog(2)
      // window [10,20): bee x2, ant x2 -> tie, term ASC -> ant, bee
      src.addData(Seq(
        IngestDoc(ts(1000), 1, "w", "cat cat dog"),
        IngestDoc(ts(2000), 2, "w", "cat dog ant"),
        IngestDoc(ts(11000), 3, "w", "bee ant bee ant")))
      q.processAllAvailable()
      src.addData(Seq(IngestDoc(ts(40000), 98, "w", "flush"))) // advance watermark
      q.processAllAvailable()
      src.addData(Seq(IngestDoc(ts(41000), 99, "w", "flush"))) // 2nd tick: chained agg
      q.processAllAvailable()
      val out = spark.table("strend").collect()
        .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2), r.getLong(3)))
        .sortBy(t => (t._1, t._4))
      assert(out.toSeq == Seq(
        (0L, "cat", 3L, 1L), (0L, "dog", 2L, 2L),
        (10000L, "ant", 2L, 1L), (10000L, "bee", 2L, 2L)), out.mkString("; "))
    } finally q.stop()
  }

  test("a duplicate arriving AFTER the watermark passes is admitted again") {
    import spark.implicits._
    val src = Sources.memoryStream[IngestDoc](spark)
    val q = CorpusIngest.pipeline(src.toDS().toDF(), "5 seconds", "10 seconds")
      .writeStream.format("memory").queryName("scorpus2").outputMode("append").start()
    try {
      src.addData(Seq(IngestDoc(ts(1000), 1, "web", good1)))
      q.processAllAvailable()
      // advance watermark past 1s + 5s so fp state for doc 1 is evicted
      src.addData(Seq(IngestDoc(ts(20000), 2, "web", good2)))
      q.processAllAvailable()
      src.addData(Seq(IngestDoc(ts(21000), 3, "web", good1))) // same fp, state gone
      q.processAllAvailable()
      src.addData(Seq(IngestDoc(ts(60000), 99, "web", junk))) // close windows
      q.processAllAvailable()
      src.addData(Seq(IngestDoc(ts(61000), 98, "web", junk))) // second tick: agg sees it
      q.processAllAvailable()
      val admitted = spark.table("scorpus2").collect().map(_.getLong(2)).sum
      assert(admitted == 3, "re-appearance after state eviction is admitted (bounded state)")
    } finally q.stop()
  }
}
