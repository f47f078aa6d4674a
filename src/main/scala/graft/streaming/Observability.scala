package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue
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
