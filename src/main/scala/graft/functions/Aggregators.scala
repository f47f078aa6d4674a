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
  case class MGBuf(n: Long, counts: Map[String, Long])
  case class MGOut(n: Long, candidates: Seq[String])

  /** Mergeable Misra-Gries frequency sketch (Agarwal et al., "Mergeable
    * Summaries", PODS'12): at most `capacity` counters; any item whose true
    * frequency exceeds n/(capacity+1) is guaranteed to survive in the
    * candidate set, under ANY partitioning and merge order. This is the
    * pass-1 half of exact two-pass heavy hitters (see ops/Sketches.scala):
    * the sketch only needs to be a superset of the heavy set, so its
    * counting error never reaches the output.
    *
    * `reduce` is the classic streaming update (decrement-all on overflow —
    * amortized O(1): each decrement event cancels `capacity` increments);
    * `merge` adds counters then subtracts the (capacity+1)-th largest
    * count, which drops at least the overflow back to `capacity` while
    * preserving the error bound. Total corpus size `n` rides along so the
    * caller gets the exact threshold denominator from the same single pass.
    */
  /** One Misra-Gries counter update — shared by the batch Aggregator below
    * and the streaming keyed-state twin (streaming/HeavyHitterStream), so
    * both paths carry the identical survival guarantee.
    */
  def mgStep(c: Map[String, Long], v: String, capacity: Int): Map[String, Long] =
    c.get(v) match {
      case Some(x) => c.updated(v, x + 1)
      case None if c.size < capacity => c.updated(v, 1L)
      case None => c.collect { case (k, x) if x > 1 => k -> (x - 1) }
    }

  def misraGries(capacity: Int): Aggregator[String, MGBuf, MGOut] =
    new Aggregator[String, MGBuf, MGOut] {
      override def zero: MGBuf = MGBuf(0L, Map.empty)
      override def reduce(b: MGBuf, v: String): MGBuf =
        MGBuf(b.n + 1, mgStep(b.counts, v, capacity))
      override def merge(a: MGBuf, b: MGBuf): MGBuf = {
        val sum = b.counts.foldLeft(a.counts) { case (m, (k, x)) =>
          m.updated(k, m.getOrElse(k, 0L) + x)
        }
        val trimmed =
          if (sum.size <= capacity) sum
          else {
            val pivot = sum.valuesIterator.toArray.sortBy(-_).apply(capacity)
            sum.collect { case (k, x) if x > pivot => k -> (x - pivot) }
          }
        MGBuf(a.n + b.n, trimmed)
      }
      override def finish(b: MGBuf): MGOut = MGOut(b.n, b.counts.keys.toSeq.sorted)
      override def bufferEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
      override def outputEncoder: Encoder[MGOut] = Encoders.product[MGOut]
    }

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
