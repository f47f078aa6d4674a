package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed multi-output aggregation — the reference's window/agg UDFs compute
  * several outputs in one pass over the group (`OverFunction` returns
  * count,max,avg,rank together, function/OverFunction.java:7-10;
  * `AggregationFunction` returns a whole row, AggregationFunction.java:7-9).
  * The Spark-first equivalent is ONE `Aggregator` with a struct output —
  * a single partial+final pass, mergeable across partitions, instead of N
  * separate aggregates or a collect_list.
  *
  * Outputs chosen order-insensitive (count/min/max) so results are
  * deterministic under any partitioning — the constraint every distributed
  * aggregate here obeys (SURVEY test strategy).
  */
object Aggregators {

  case class StatsBuf(n: Long, min: Double, max: Double)
  case class Stats(n: Long, min: Double, max: Double)

  /** count/min/max of a double column in one pass. */
  val stats: Aggregator[Double, StatsBuf, Stats] = new Aggregator[Double, StatsBuf, Stats] {
    override def zero: StatsBuf = StatsBuf(0L, Double.PositiveInfinity, Double.NegativeInfinity)
    override def reduce(b: StatsBuf, v: Double): StatsBuf =
      StatsBuf(b.n + 1, math.min(b.min, v), math.max(b.max, v))
    override def merge(a: StatsBuf, b: StatsBuf): StatsBuf =
      StatsBuf(a.n + b.n, math.min(a.min, b.min), math.max(a.max, b.max))
    override def finish(b: StatsBuf): Stats = Stats(b.n, b.min, b.max)
    override def bufferEncoder: Encoder[StatsBuf] = Encoders.product[StatsBuf]
    override def outputEncoder: Encoder[Stats] = Encoders.product[Stats]
  }

  case class Scored(term: String, tf: Long, score: Double)

  /** Bounded top-k by (score DESC, term ASC) — a PARTIAL top-k: `reduce`
    * keeps at most k rows per map-side group, so the shuffle carries ≤ k
    * rows per (group, partition) instead of the full per-group row set a
    * rank window would shuffle. The comparator mirrors
    * `row_number() OVER (ORDER BY score DESC, term)` exactly, so the output
    * (in buffer order = rank order) matches the windowed spelling row for
    * row. Buffers are tiny sorted vectors (k ≤ ~100): insert is an O(k)
    * copy, which beats heap bookkeeping at these sizes.
    */
  def topKScored(k: Int): Aggregator[Scored, Seq[Scored], Seq[Scored]] =
    new Aggregator[Scored, Seq[Scored], Seq[Scored]] {
      private def lt(a: Scored, b: Scored): Boolean =
        a.score > b.score || (a.score == b.score && a.term < b.term)
      override def zero: Seq[Scored] = Vector.empty
      override def reduce(b: Seq[Scored], v: Scored): Seq[Scored] = {
        if (b.length == k && !lt(v, b.last)) b
        else {
          val i = b.indexWhere(x => lt(v, x)) match { case -1 => b.length; case x => x }
          (b.take(i) :+ v) ++ b.drop(i).take(k - i - 1)
        }
      }
      override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
        b.foldLeft(a)(reduce)
      override def finish(b: Seq[Scored]): Seq[Scored] = b
      override def bufferEncoder: Encoder[Seq[Scored]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
      override def outputEncoder: Encoder[Seq[Scored]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
    }
}
