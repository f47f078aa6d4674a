package graft.streaming

import graft.functions.Aggregators
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters — the unbounded twin of `ops.Sketches`
  * .heavyHitters' pass 1: a BUCKETED Misra-Gries sketch held as keyed state,
  * refreshed per micro-batch.
  *
  * Tokens hash into `buckets` independent sketches, so state is
  * buckets·capacity counters TOTAL no matter how wide the token domain grows
  * — the streaming answer to "top frequent items over an unbounded stream"
  * without a per-token keyed state (which at web scale is exactly the
  * unbounded-state bug class CorpusIngest guards against). Because bucketing
  * PARTITIONS the domain, the classical guarantee survives sharpened:
  * a token with global frequency > n/(capacity+1) has bucket frequency
  * > n_b/(capacity+1) (its whole count lands in one bucket, n_b ≤ n), so
  * it survives in its bucket's sketch under ANY batching and arrival order
  * (HeavyHitterStreamSpec pins the superset property against the exact
  * heavy set, and state boundedness).
  *
  * Each batch emits one row per touched bucket with the bucket's running n
  * and its current counters (candidates + residual lower bounds) — n is
  * monotone, so the consumer's "current sketch" is the max-n row per bucket;
  * `latestCandidates` folds a collected emission log accordingly. A second
  * exact pass over stored data (the batch op's recount gate) turns
  * candidates into exact counts when needed.
  */
object HeavyHitterStream {

  case class TokenRow(bucket: Int, token: String)
  case class HHState(n: Long, counts: Map[String, Long])
  case class BucketSketch(bucket: Int, n: Long, candidates: Seq[String], residuals: Seq[Long])

  val DefaultBuckets = 8

  def sketch(
      df: DataFrame, tokenCol: String,
      buckets: Int = DefaultBuckets,
      capacity: Int = graft.ops.Sketches.Capacity): Dataset[BucketSketch] = {
    import df.sparkSession.implicits._
    val typed = df
      .select(pmod(hash(col(tokenCol)), lit(buckets)).cast("int").as("bucket"),
        col(tokenCol).cast("string").as("token"))
      .as[TokenRow]
    typed.groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (bucket: Int, rows: Iterator[TokenRow], gs: GroupState[HHState]) =>
          var st = gs.getOption.getOrElse(HHState(0L, Map.empty))
          for (r <- rows)
            st = HHState(st.n + 1, Aggregators.mgStep(st.counts, r.token, capacity))
          gs.update(st)
          val sorted = st.counts.toSeq.sortBy(_._1)
          Iterator.single(BucketSketch(bucket, st.n, sorted.map(_._1), sorted.map(_._2)))
      }
  }

  /** Fold an emission log down to the current per-bucket candidate union
    * (max-n row per bucket) and the global token count.
    */
  def latestCandidates(rows: Seq[BucketSketch]): (Long, Set[String]) = {
    val latest = rows.groupBy(_.bucket).values.map(_.maxBy(_.n)).toSeq
    (latest.map(_.n).sum, latest.flatMap(_.candidates).toSet)
  }
}
