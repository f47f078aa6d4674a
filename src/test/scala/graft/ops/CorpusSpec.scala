package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class CorpusSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf())

  test("packing: offsets stay under capacity and reconstruct the shard cumsum") {
    val c = 64L
    val packed = Corpus.packSequences(docs, c).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(packed.nonEmpty)
    packed.foreach { case (_, _, _, _, off) => assert(off >= 0 && off < c) }
    // pack_id * capacity + pack_offset == tokens before this doc in its shard
    packed.groupBy(_._1).foreach { case (_, shard) =>
      var cum = 0L
      shard.sortBy(_._2).foreach { case (_, _, n, packId, off) =>
        assert(packId * c + off == cum, "packing must be the concat-then-cut layout")
        cum += n
      }
    }
  }

  test("packing parallelizes per shard: window partitions by source") {
    val plan = Corpus.packSequences(docs, 64L)
      .queryExecution.executedPlan.toString
    // a global (unpartitioned) window would single-thread the corpus
    assert(plan.contains("partitionBy") || plan.contains("hashpartitioning(source"),
      s"pack window must partition by shard, got:\n${plan.take(800)}")
  }

  test("vocabulary: contiguous ranks, monotone coverage reaching the token mass") {
    val v = Corpus.vocabulary(docs, topK = 1000).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._3)
    assert(v.nonEmpty)
    assert(v.map(_._3).toSeq == (1L to v.length))
    assert(v.sliding(2).forall { case Array(a, b) => a._4 <= b._4 + 1e-9; case _ => true })
    // the synthetic vocab is < 1000 terms, so coverage must close at 1.0
    assert(math.abs(v.last._4 - 1.0) < 1e-6)
    // counts non-increasing in rank order
    assert(v.sliding(2).forall { case Array(a, b) => a._2 >= b._2; case _ => true })
  }

  test("vocabulary trims via TakeOrderedAndProject before the rank window") {
    val plan = Corpus.vocabulary(docs, topK = 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be a per-partition take, not a global sort of the term set, got:\n${plan.take(800)}")
  }

  test("source overlap matches a per-pair brute force on sampled pairs") {
    val out = Corpus.sourceOverlap(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out.nonEmpty)
    out.keys.foreach { case (a, b) => assert(a < b) }
    // brute force: collect shingle sets per source, intersect two fixed pairs
    val shingles = docs
      .select(col("source"), Text.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("source"), explode(expr(
        "array_distinct(transform(sequence(1, size(toks) - 2), " +
          "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1), ' ', element_at(toks, i + 2))))"))
        .as("s"))
      .collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val srcs = shingles.keys.toSeq.sorted.take(3)
    for (a <- srcs; b <- srcs if a < b) {
      val inter = (shingles(a) & shingles(b)).size.toLong
      val jac = inter.toDouble / (shingles(a).size + shingles(b).size - inter)
      if (inter == 0) assert(!out.contains((a, b)))
      else {
        val (n, j) = out((a, b))
        assert(n == inter && math.abs(j - jac) < 1e-6, s"pair ($a,$b)")
      }
    }
  }
}
