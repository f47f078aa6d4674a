package graft.streaming

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** THE watermark-pin idiom, shared by every streaming operator that filters
  * its input: a deterministic predicate above the EventTimeWatermark node
  * gets pushed BELOW it by PushPredicateThroughNonJoin, so a stretch of
  * all-filtered input (junk-heavy feed, all-short docs, heartbeat-only
  * stream) silently stops event time — state never evicts, windows never
  * close. Wrapping the predicate in a nondeterministic pass-through UDF pins
  * the filter above the watermark node so the RAW feed drives time. Cost:
  * one boolean call per row on the pinned path.
  *
  * Used by `CorpusIngest` (quality gate), `NearDupStream` (admit + short-doc
  * filters), and `StreamWindows` (heartbeat drop) — one definition so a
  * future change to the idiom (null handling, a Spark-version workaround)
  * lands everywhere at once.
  */
private[streaming] object Pin {

  private val keepUdf = udf((b: java.lang.Boolean) => b != null && b).asNondeterministic()

  /** `keep(cond)`: true iff cond is true (null-safe), evaluated as a
    * nondeterministic expression so the enclosing filter is never pushed
    * below a watermark node.
    */
  def keep(cond: Column): Column = keepUdf(cond)
}
