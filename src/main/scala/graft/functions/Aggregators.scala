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
}
