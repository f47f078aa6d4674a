package graft.streaming

import graft.SparkSpec
import graft.sources.Sources
import org.apache.spark.sql.functions._

case class Doc(ts: java.sql.Timestamp, fp: String, text: String)

/** Exact dedup as a STREAMING operator: dropDuplicatesWithinWatermark on the
  * fingerprint column — the stateful form of `Dedup.exact` for continuous
  * ingestion. State is bounded by the watermark (fingerprints older than the
  * bound are evicted), which is what makes it runnable forever at 100 TB —
  * an unbounded dropDuplicates would grow state without limit.
  */
class StreamingDedupSpec extends SparkSpec {

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  test("streaming exact dedup drops repeated fingerprints within the watermark window") {
    import spark.implicits._
    val src = Sources.memoryStream[Doc](spark)
    val q = src.toDS().toDF()
      .withWatermark("ts", "10 seconds")
      .dropDuplicatesWithinWatermark("fp")
      .writeStream.format("memory").queryName("dedup1").outputMode("append").start()
    try {
      src.addData(Seq(
        Doc(ts(1000), "aaa", "first copy"),
        Doc(ts(2000), "aaa", "second copy"),
        Doc(ts(2500), "bbb", "other")))
      q.processAllAvailable()
      src.addData(Seq(Doc(ts(3000), "aaa", "third copy")))
      q.processAllAvailable()
      val out = spark.table("dedup1").collect()
      assert(out.length == 2, out.mkString("; "))
      assert(out.map(_.getAs[String]("fp")).toSet == Set("aaa", "bbb"))
      // the FIRST arrival survives (keep-first semantics)
      assert(out.find(_.getAs[String]("fp") == "aaa").get.getAs[String]("text") == "first copy")
    } finally q.stop()
  }
}
