package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf())

  test("stratified sampling hits each stratum's rate and is deterministic") {
    val rates = Map("en" -> 0.25, "de" -> 0.80, "zh" -> 0.50, "fr" -> 1.00)
    val s = Sampling.stratified(docs, "doc_id", "lang", rates)
    val byLang = s.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    // es has no rate -> dropped entirely; fr rate 1.0 -> kept entirely
    assert(!byLang.contains("es"))
    assert(byLang("fr") == totals("fr"))
    // sampled fraction within a loose binomial bound of the target rate
    for ((lang, rate) <- rates if rate < 1.0) {
      val got = byLang.getOrElse(lang, 0L).toDouble / totals(lang)
      assert(math.abs(got - rate) < 0.15, s"$lang: got $got want ~$rate")
    }
    // deterministic: same membership on re-evaluation
    assert(s.collect().toSet == Sampling.stratified(docs, "doc_id", "lang", rates).collect().toSet)
  }

  test("weighted resampling repeats rows by stratum weight in expectation") {
    val w = Map("en" -> 0.50, "de" -> 2.00, "zh" -> 1.00, "fr" -> 2.75, "es" -> 0.25)
    val r = Sampling.weightedResample(docs, "doc_id", "lang", w)
    val got = r.groupBy("lang").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap

    // integer weights are exact; fractional ones land near w in expectation
    assert(got("de") == 2 * totals("de"))
    assert(got("zh") == totals("zh"))
    for ((lang, wt) <- w if wt != math.floor(wt) || wt < 1.0) {
      val ratio = got.getOrElse(lang, 0L).toDouble / totals(lang)
      assert(math.abs(ratio - wt) < 0.3, s"$lang: got $ratio want ~$wt")
    }
    // every copy of a doc is distinctly tagged: (doc_id, rep) is unique
    assert(r.count() == r.select("doc_id", "rep").distinct().count())
  }

  test("both samplers are map-only plans (no shuffle exchange)") {
    val s = Sampling.stratified(docs, "doc_id", "lang", Map("en" -> 0.5))
    val r = Sampling.weightedResample(docs, "doc_id", "lang", Map("en" -> 2.5))
    for (df <- Seq(s, r)) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"sampler plan shuffles:\n$plan")
    }
  }
}
