package graft.streaming

import graft.SparkSpec
import graft.sources.{DimensionTable, Sources}
import java.nio.file.Files
import org.apache.spark.sql.functions._

case class Sale(ts: java.sql.Timestamp, sku: Long, amount: Double)

/** End-to-end port of the reference's flagship integration pipeline
  * (Top100Test.java:29-183): stream → dimension left-join → hopping-window
  * sum per key → top-N per window, with the observability listener attached.
  *
  * Reference shape:  kafka → leftJoin(dim snapshot) → rehash →
  *   SlideWindow(1h/30min, sum) → rehash → session top-100 → sink.
  * Spark shape: MemoryStream (Kafka stand-in; same micro-table contract) →
  *   broadcast dim join → window() agg (shuffle IS the rehash) →
  *   foreachBatch ranking → memory sink.
  */
class Top100PipelineSpec extends SparkSpec {

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  test("stream -> dim join -> hopping window sum -> top-N per window") {
    import spark.implicits._

    // dimension table: sku -> category (RdsDimensionTable stand-in)
    val dimDir = Files.createTempDirectory("skus").toString
    Seq((1L, "books"), (2L, "games"), (3L, "tools"))
      .toDF("sku", "category").write.mode("overwrite").parquet(dimDir)
    val dim = DimensionTable.fromPath(spark, dimDir)

    val listener = new GraftQueryListener(_ => ())
    spark.streams.addListener(listener)

    val src = Sources.memoryStream[Sale](spark)
    val enriched = dim.enrich(src.toDS().toDF(), Seq("sku"))
    val windowed = StreamWindows.slide(
      enriched, "ts", "10 seconds", "5 seconds", Seq("category"),
      Seq(sum(col("amount")).as("revenue")))

    val q = windowed.writeStream
      .format("memory").queryName("top100").outputMode("append").start()
    try {
      src.addData(Seq(
        Sale(ts(1000), 1, 10.0), Sale(ts(2000), 2, 5.0),
        Sale(ts(3000), 1, 7.0), Sale(ts(6000), 3, 40.0)))
      q.processAllAvailable()
      src.addData(Seq(Sale(ts(60000), 1, 1.0))) // advance watermark, close windows
      q.processAllAvailable()

      // top-N per closed window (the reference's session-window top-100 step)
      val ranked = spark.table("top100")
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("window_start").orderBy(col("revenue").desc, col("category"))))
        .filter(col("rk") <= 2)
        .collect()
        .map(r => (r.getAs[Long]("window_start"), r.getAs[String]("category"),
          r.getAs[Double]("revenue"), r.getAs[Int]("rk")))

      // window [0,10s): books 17, games 5, tools 40 -> top2 = tools, books
      val w0 = ranked.filter(_._1 == 0L).sortBy(_._4)
      assert(w0.map(t => (t._2, t._3, t._4)).toSeq ==
        Seq(("tools", 40.0, 1), ("books", 17.0, 2)))
      // window [5s,15s): only tools 40
      val w5 = ranked.filter(_._1 == 5000L)
      assert(w5.map(t => (t._2, t._3)).toSeq == Seq(("tools", 40.0)))
    } finally {
      q.stop()
      spark.streams.removeListener(listener)
    }

    // observability: the listener recorded per-batch throughput gauges
    assert(listener.recent.nonEmpty)
    assert(listener.recent.map(_.inputRows).sum >= 5)
  }
}
