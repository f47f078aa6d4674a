package graft.ops

import graft.SparkSpec
import graft.Tables
import graft.functions.Aggregators
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {

  import spark.implicits._

  test("MG guarantee: every item above n/(capacity+1) survives an adversarial stream") {
    // 1 hot item among a flood of near-unique fillers, tiny capacity.
    val cap = 9
    val data = (Seq.fill(300)("hot") ++ (1 to 2700).map(i => s"f${i % 900}"))
    // hot freq 300 > n/(cap+1) = 3000/10 = 300? strictly greater needed -> use 301
    val stream = "hot" +: data
    for (parts <- Seq(1, 4, 13)) {
      val ds = spark.createDataset(stream).repartition(parts)
      val out = ds.select(Aggregators.misraGries(cap).toColumn).head()
      assert(out.n == stream.size)
      assert(out.candidates.contains("hot"), s"parts=$parts: ${out.candidates}")
      assert(out.candidates.size <= cap)
    }
  }

  test("two-pass heavy hitters == exact GROUP BY HAVING, any partitioning") {
    val docs = Tables.documents(spark, sf())
    val exact = {
      val toks = docs.select(explode(Text.tokens(col("text"))).as("token"))
      val n = toks.count()
      toks.groupBy("token").agg(count(lit(1)).as("n"))
        .where(col("n") * Sketches.ThresholdK.toLong > lit(n))
    }
    val viaSketch = Sketches.heavyHitters(spark, docs)
    assert(viaSketch.exceptAll(exact).isEmpty && exact.exceptAll(viaSketch).isEmpty)
    val shuffled = Sketches.heavyHitters(spark, docs.repartition(11))
    assert(shuffled.exceptAll(exact).isEmpty && exact.exceptAll(shuffled).isEmpty)
  }

  test("pass-2 plan is gated map-side: isin filter above the scan, no corpus-wide token shuffle") {
    val plan = Sketches.heavyHitters(spark, Tables.documents(spark, sf()))
      .queryExecution.executedPlan.toString
    // the candidate gate must appear as a Filter containing the IN list
    assert(plan.contains("token#") && (plan.contains(" IN ") || plan.contains("INSET")),
      plan.take(3000))
  }

  test("hll: estimate within 3 sigma of exact on real data") {
    import org.apache.spark.sql.functions._
    val out = Sketches.hllDaily(Tables.events(spark, sf("sf0.01"))).collect()
    assert(out.nonEmpty)
    val relSd = 1.04 / math.sqrt(Sketches.HllBuckets.toDouble)
    out.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getDouble(2))
      assert(math.abs(est - exact) <= 3 * relSd * exact + 1,
        s"day ${r.getLong(0)}: est $est vs exact $exact")
    }
  }

  test("cms: one-sided guarantee — estimate never undercounts, and is tight here") {
    val out = Sketches.cmsEstimates(Tables.documents(spark, sf("sf0.01"))).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    out.foreach { case (t, exact, est) =>
      assert(est >= exact, s"$t: CMS undercounted ($est < $exact)")
      // depth 4 × width 64 over this vocab: collisions only overcount by
      // other tokens' mass; bound generously at +2x
      assert(est <= 3 * exact, s"$t: est $est implausibly above exact $exact")
    }
    // absent probe produces no row (inner join on exact counts)
    assert(!out.exists(_._1 == "zzz_absent"))
  }

  test("mauHll: windowed register merge tracks the exact rolling MAU") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf("sf0.01"))
    val est = Sketches.mauHll(ev).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exact = graft.ops.Behavior.stickiness(ev).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val relSd = 1.04 / math.sqrt(Sketches.HllBuckets.toDouble)
    // stickiness only reports days with DAU > 0; every such day must exist
    // in the sketch path and agree within the HLL envelope
    assert(exact.nonEmpty)
    exact.foreach { case (day, mau) =>
      assert(est.contains(day), s"day $day missing from sketch MAU")
      assert(math.abs(est(day) - mau) <= 3 * relSd * mau + 1,
        s"day $day: est ${est(day)} vs exact $mau")
    }
  }

  test("hll: registers merge by max — split halves == whole") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf("sf0.01"))
    val whole = Sketches.hllRegisters(ev)
    val merged = Sketches.hllMerge(
      Sketches.hllRegisters(ev.filter(col("event_id") % 2 === 0))
        .union(Sketches.hllRegisters(ev.filter(col("event_id") % 2 === 1))))
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
    // and the estimate from merged registers equals the direct estimate
    val a = Sketches.hllEstimate(whole).collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    val b = Sketches.hllEstimate(merged).collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    assert(a == b)
  }
}
