package graft.streaming

import graft.SparkSpec
import graft.ops.Sketches
import graft.sources.Sources
import org.apache.spark.sql.functions._

/** The HLL register table is streaming-maintainable AS-IS: `hllRegisters`'
  * max-groupBy runs unchanged as an update-mode streaming aggregate, and the
  * maintained state converges to the batch register table under any
  * batching — the "sketch as data" claim made live (registers persisted by
  * a sink are then mergeable/estimable exactly like batch ones).
  */
class HllStreamSpec extends SparkSpec {

  import spark.implicits._

  private lazy val events = graft.Tables.events(spark, sf("sf0.001"))
    .select(col("event_id"), col("user_id"), col("__time__"), col("value")).collect()
    .map(r => VEvent(new java.sql.Timestamp(r.getLong(2)), r.getLong(1), r.getLong(0), r.getDouble(3)))
    .toSeq

  test("streaming register table converges to the batch registers") {
    val src = Sources.memoryStream[VEvent](spark)
    val streamIn = src.toDS().toDF()
      .withColumn("__time__", unix_millis(col("ts")))
      .withColumnRenamed("user", "user_id")
    val q = Sketches.hllRegisters(streamIn)
      .writeStream.format("memory").queryName("hll_regs").outputMode("update").start()
    try {
      events.grouped(997).foreach { b => src.addData(b); q.processAllAvailable() }
      // update-mode emissions are monotone per key: the live value is max
      val live = spark.table("hll_regs")
        .groupBy("day", "bucket").agg(max("rho").as("rho")).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val batch = Sketches.hllRegisters(
        events.map(v => (v.id, v.user, v.ts.getTime, v.value))
          .toDF("event_id", "user_id", "__time__", "value")).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(live == batch)
    } finally q.stop()
  }
}
