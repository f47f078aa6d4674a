package graft.streaming

import graft.SparkSpec
import graft.sources.Sources
import java.nio.file.Files

/** DELTAS D13: `Window.getRows` parity via the state-store reader
  * (reference window/Window.java:16-20). Asserts the buffered frame rows of
  * a live over-window query are readable from its checkpoint.
  */
class StateProbeSpec extends SparkSpec {

  test("StateInspector.overWindowRows returns the buffered frame per key") {
    import spark.implicits._
    val ckp = Files.createTempDirectory("ckp-probe").toString
    val src = Sources.memoryStream[OverWindows.Event](spark)
    val out = OverWindows.bySize(src.toDS(), 3)
    val q = out.writeStream.format("memory").queryName("probe1")
      .option("checkpointLocation", ckp).outputMode("append").start()
    try {
      src.addData(Seq(
        OverWindows.Event(1, 100000, 1.0), OverWindows.Event(1, 101000, 2.0),
        OverWindows.Event(2, 100500, 5.0)))
      q.processAllAvailable()
      // A size-3 frame holds up to the last 3 rows per key: key 1 buffers
      // both its events, key 2 its single event.
      val state = StateInspector.overWindowRows(spark, ckp).collect().toSet
      assert(state === Set(
        OverWindows.Event(1, 100000, 1.0), OverWindows.Event(1, 101000, 2.0),
        OverWindows.Event(2, 100500, 5.0)))

      // Overflow the frame, then mature everything with a far-ahead key:
      // once the watermark passes the rows, only the n-1 rows a future
      // frame can still see stay buffered — key 1 retains its newest two.
      src.addData(Seq(
        OverWindows.Event(1, 102000, 3.0), OverWindows.Event(1, 103000, 4.0)))
      q.processAllAvailable()
      src.addData(Seq(OverWindows.Event(3, 110000, 0.0)))
      q.processAllAvailable()
      val after = StateInspector.overWindowRows(spark, ckp)
        .filter(_.key == 1L).collect().toSet
      assert(after === Set(
        OverWindows.Event(1, 102000, 3.0), OverWindows.Event(1, 103000, 4.0)))
    } finally q.stop()
  }
}
