package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.{col, concat, explode}
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Observability parity (SURVEY §2.12): the reference hand-rolls periodic
  * gauges — `Throughput.log` rows/s (sp/Throughput.java:18-57), `Delay`
  * business-delay/residence gauges (sp/Delay.java:16-74), `QueueSizeLogger`
  * backlog depth (sp/QueueSizeLogger.java:19-77). Structured Streaming
  * already measures all three per micro-batch; this listener surfaces them
  * in the reference's vocabulary.
  *
  *   - throughputRows/s  <- progress.processedRowsPerSecond
  *   - business delay    <- watermark lag = wall clock - eventTime.watermark
  *   - queue/backlog     <- inputRowsPerSecond vs processedRowsPerSecond
  */
class GraftQueryListener(log: String => Unit = s => Console.err.println(s))
    extends StreamingQueryListener {

  case class Gauge(
      queryName: String,
      batchId: Long,
      inputRows: Long,
      inputRowsPerSec: Double,
      processedRowsPerSec: Double,
      watermarkLagMs: Long)

  private val gauges = new ConcurrentLinkedQueue[Gauge]()

  def recent: Seq[Gauge] = {
    val it = gauges.iterator()
    val b = Seq.newBuilder[Gauge]
    while (it.hasNext) b += it.next()
    b.result()
  }

  override def onQueryStarted(event: QueryStartedEvent): Unit =
    log(s"[graft] query started: ${event.name} (${event.id})")

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    val wmLag = Option(p.eventTime.get("watermark"))
      .flatMap(w => scala.util.Try(java.time.Instant.parse(w).toEpochMilli).toOption)
      .map(w => System.currentTimeMillis() - w)
      .getOrElse(-1L)
    val g = Gauge(
      Option(p.name).getOrElse("unnamed"), p.batchId, p.numInputRows,
      p.inputRowsPerSecond, p.processedRowsPerSecond, wmLag)
    gauges.add(g)
    log(f"[graft] ${g.queryName} batch=${g.batchId} rows=${g.inputRows} " +
      f"in/s=${g.inputRowsPerSec}%.1f proc/s=${g.processedRowsPerSec}%.1f " +
      f"wmLagMs=${g.watermarkLagMs}")
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit =
    log(s"[graft] query terminated: ${event.id}")
}

/** Live-state introspection (SURVEY §2.8 `Window.getRows`, DELTAS D13).
  *
  * The reference exposes the rows currently buffered inside a window's state
  * for debugging (window/Window.java:16-20 `getRows`). In Spark the state
  * lives in a checkpointed state store, not an in-process object, so the
  * equivalent is the state-store reader: point it at the query's checkpoint
  * and it returns every key's buffered state as of the latest committed
  * micro-batch — works offline, after a crash, and for RocksDB-backed state,
  * which an in-process getter never could.
  */
object StateInspector {

  /** Raw state snapshot: one row per key with the operator's state struct.
    * `batchId` selects an earlier committed micro-batch (default: latest).
    */
  def stateSnapshot(
      spark: SparkSession,
      checkpoint: String,
      batchId: Option[Long] = None,
      operatorId: Int = 0): DataFrame = {
    val r = spark.read.format("statestore")
      .option("operatorId", operatorId.toString)
    batchId.foreach(b => r.option("batchId", b.toString))
    r.load(checkpoint)
  }

  /** `Window.getRows` parity for the over-window operators: the rows each
    * key currently holds in its frame buffer, flattened to plain events.
    * Snapshot-at-a-batch rather than live mid-batch — the reference's getter
    * reads a mutable list concurrently with the processing thread; a
    * committed snapshot is the consistent version of the same capability.
    */
  def overWindowRows(spark: SparkSession, checkpoint: String): Dataset[OverWindows.Event] = {
    import spark.implicits._
    // Buffered rows = final frame context (`rows`) plus the watermark
    // reorder buffer (`pend`) — together, exactly what the reference's
    // Window.getRows exposes: everything the operator currently holds.
    stateSnapshot(spark, checkpoint)
      .select(explode(concat(col("value.groupState.rows"), col("value.groupState.pend"))).as("r"))
      .select(col("r.key"), col("r.time"), col("r.value"))
      .as[OverWindows.Event]
  }
}
