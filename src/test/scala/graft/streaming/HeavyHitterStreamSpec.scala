package graft.streaming

import graft.SparkSpec
import graft.ops.{Sketches, Text}
import graft.sources.Sources
import org.apache.spark.sql.functions._

case class Tok(token: String)

/** The bucketed streaming Misra-Gries sketch: candidate union is a superset
  * of the exact heavy set under any batching; state stays bounded; bucket n
  * is monotone.
  */
class HeavyHitterStreamSpec extends SparkSpec {

  import spark.implicits._

  private lazy val tokens: Seq[String] =
    graft.Tables.documents(spark, sf())
      .select(explode(Text.tokens(col("text"))).as("t"))
      .as[String].collect().toSeq

  /** exact heavy set at the batch op's threshold: count·K > n */
  private lazy val exactHeavy: Set[String] = {
    val n = tokens.size.toLong
    tokens.groupBy(identity).collect {
      case (t, xs) if xs.size.toLong * Sketches.ThresholdK > n => t
    }.toSet
  }

  private def run(batches: Seq[Seq[Tok]], name: String): Seq[HeavyHitterStream.BucketSketch] = {
    val src = Sources.memoryStream[Tok](spark)
    val out = HeavyHitterStream.sketch(src.toDS().toDF(), "token")
    val q = out.writeStream.format("memory").queryName(name).outputMode("update").start()
    try {
      batches.foreach { b => src.addData(b); q.processAllAvailable() }
      spark.table(name).as[HeavyHitterStream.BucketSketch].collect().toSeq
    } finally q.stop()
  }

  test("candidate union covers the exact heavy set, single batch") {
    val rows = run(Seq(tokens.map(Tok)), "hh_one")
    val (n, cands) = HeavyHitterStream.latestCandidates(rows)
    assert(n == tokens.size.toLong)
    assert(exactHeavy.nonEmpty && exactHeavy.subsetOf(cands),
      s"missing: ${exactHeavy -- cands}")
  }

  test("guarantee holds under many small batches (merge-order independence)") {
    val rows = run(tokens.map(Tok).grouped(997).toSeq, "hh_many")
    val (n, cands) = HeavyHitterStream.latestCandidates(rows)
    assert(n == tokens.size.toLong)
    assert(exactHeavy.subsetOf(cands), s"missing: ${exactHeavy -- cands}")
  }

  test("state is bounded: every emission carries at most capacity counters") {
    val rows = run(tokens.map(Tok).grouped(5000).toSeq, "hh_cap")
    assert(rows.forall(r => r.candidates.size <= Sketches.Capacity))
    assert(rows.forall(r => r.candidates.size == r.residuals.size))
    // a bucket emits only when touched, so its running n strictly grows:
    // emissions per bucket have pairwise-distinct n (the max-n contract is
    // unambiguous regardless of collection order)
    rows.groupBy(_.bucket).values.foreach { rs =>
      val ns = rs.map(_.n)
      assert(ns.toSet.size == ns.size, s"duplicate bucket n: $ns")
    }
  }
}
