package graft.streaming

import graft.SparkSpec
import graft.ops.Cdc
import graft.sources.Sources
import org.apache.spark.sql.functions._

/** The additive rollup (`Cdc.rollup`) is streaming-maintainable AS-IS: the
  * same count/sum aggregate runs unchanged as an update-mode streaming
  * query, and the maintained cells converge to the batch rollup under any
  * batching — the live half of the `q_rollup_incr` IVM contract (batch
  * merge for backfills, streaming update for the live table, one
  * definition of the cells).
  */
class RollupStreamSpec extends SparkSpec {

  import spark.implicits._

  private lazy val events = graft.Tables.events(spark, sf("sf0.001"))
    .select(col("event_id"), col("user_id"), col("__time__"), col("value"), col("event_type"))
    .collect()
    .map(r => REvent(new java.sql.Timestamp(r.getLong(2)), r.getLong(1), r.getLong(0),
      r.getDouble(3), r.getString(4)))
    .toSeq

  test("streaming rollup cells converge to the batch rollup under any batching") {
    val src = Sources.memoryStream[REvent](spark)
    val streamIn = src.toDS().toDF()
      .withColumn("__time__", unix_millis(col("ts")))
    val q = Cdc.rollup(streamIn)
      .writeStream.format("memory").queryName("rollup_cells").outputMode("update").start()
    try {
      events.grouped(313).foreach { b => src.addData(b); q.processAllAvailable() }
      // update-mode emissions per key are strictly growing in n, so the live
      // cell is the struct-max (latest) emission
      val live = spark.table("rollup_cells")
        .groupBy("day", "event_type")
        .agg(max(struct(col("n"), col("sum_v_e4"))).as("m"))
        .select(col("day"), col("event_type"), col("m.n"), col("m.sum_v_e4"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
      val batch = Cdc.rollup(
        events.map(v => (v.id, v.user, v.ts.getTime, v.value, v.event_type))
          .toDF("event_id", "user_id", "__time__", "value", "event_type")).collect()
        .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
      assert(live == batch)
    } finally q.stop()
  }
}

case class REvent(ts: java.sql.Timestamp, user: Long, id: Long, value: Double,
    event_type: String)
