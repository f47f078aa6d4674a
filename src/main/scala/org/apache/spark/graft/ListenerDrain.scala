package org.apache.spark.graft

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is `private[spark]`: listener delivery is
  * asynchronous, so a metric counter fed by `onTaskEnd` may lag the action
  * that produced the tasks. Benchmark telemetry (graft.Bench's per-query
  * shuffle bytes) must read the counter only after the bus has drained, or
  * a heavy query's tail tasks get billed to the NEXT query. This is the
  * same barrier Spark's own test harness uses (`waitUntilEmpty`), exposed
  * through a package-placed accessor — the one JVM-visibility escape hatch
  * in the repo, used only by the bench main, never by operators.
  */
object ListenerDrain {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
