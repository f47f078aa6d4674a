package graft

import graft.sources.Sources
import graft.streaming.StreamWindows
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming throughput micro-benchmark: deterministic synthetic events
  * through MemoryStream → watermark → hopping-window aggregation → memory
  * sink. Prints one JSON line with rows/sec. Not part of the driver's Bench
  * contract — run manually: `tools/run_verify.sh graft.StreamBench [nRows]`.
  *
  * Shape matches the reference's flagship load (Kafka → 1h/30m slide window
  * sum, README.md:59-131): the measured path is ingest → shuffle on
  * (window, key) → stateful agg with watermark eviction.
  */
object StreamBench {
  case class E(ts: java.sql.Timestamp, key: Long, value: Double)

  def main(args: Array[String]): Unit = {
    val total = if (args.nonEmpty) args(0).toInt else 1000000
    val batchSize = if (args.length > 1) args(1).toInt else 100000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val src = Sources.memoryStream[E](spark)
    val windowed = StreamWindows.slide(
      src.toDS().toDF(), "ts", "1 hour", "30 minutes", Seq("key"),
      Seq(count(lit(1)).as("n"), sum(col("value")).as("s")),
      watermark = "10 seconds")
    val q = windowed.writeStream.format("memory")
      .queryName("sb").outputMode("append").start()

    // deterministic synthetic stream: 200 keys, event time advancing ~3.6 ms
    // per row => ~1 window per 1M rows closing continuously
    def batch(from: Int, n: Int): Seq[E] =
      (from until from + n).map { i =>
        E(new java.sql.Timestamp(1700000000000L + i.toLong * 3600L / 1000),
          (i % 200).toLong, (i % 997) * 0.5)
      }

    // warm-up
    src.addData(batch(0, batchSize)); q.processAllAvailable()

    // pre-build chunks OUTSIDE the timer — measure the engine, not the
    // driver-side synthetic generator
    val chunks = Iterator.iterate(batchSize)(_ + batchSize).takeWhile(_ < total)
      .map(from => batch(from, math.min(batchSize, total - from))).toVector
    val t0 = System.nanoTime()
    var sent = batchSize
    chunks.foreach { c =>
      src.addData(c)
      q.processAllAvailable() // one micro-batch per chunk — real streaming cadence
      sent += c.size
    }
    val secs = (System.nanoTime() - t0) / 1e9
    val rps = (sent - batchSize) / secs
    println(f"""{"metric":"stream_rows_per_sec","value":$rps%.0f,"unit":"rows/sec","rows":${sent - batchSize},"secs":$secs%.3f}""")
    q.stop()
    spark.stop()
  }
}
