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

  test("importance resampling favors the target domain and is partitioning-independent") {
    val out = Sampling.importanceResample(docs, topK = 100)
    val rows = out.collect()
    assert(rows.length == 100)
    // the selected slice should be predominantly target-domain: DSIR weights
    // are log-likelihood ratios toward the 'en' model
    val enFrac = rows.count(_.getString(1) == Sampling.DsirTargetLang).toDouble / rows.length
    val baseFrac = {
      val t = docs.groupBy("lang").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      t(Sampling.DsirTargetLang).toDouble / t.values.sum
    }
    assert(enFrac > baseFrac,
      s"selected en-fraction $enFrac should beat the corpus base rate $baseFrac")
    // mean selected weight strictly above corpus mean (it's a top-k cut)
    val repart = Sampling.importanceResample(docs.repartition(7), topK = 100).collect()
    assert(rows.map(r => (r.getLong(0), r.getDouble(3), r.getLong(4))).toSeq.sorted ==
      repart.map(r => (r.getLong(0), r.getDouble(3), r.getLong(4))).toSeq.sorted,
      "selection must not depend on the physical split layout")
  }

  test("importance weights separate target from off-target text on a planted fixture") {
    import spark.implicits._
    // target docs share a vocabulary; the off-target doc shares none of it
    val d = Seq(
      (1L, "alpha beta gamma alpha beta", "en", "s", 1L),
      (2L, "alpha gamma beta beta alpha", "en", "s", 1L),
      (3L, "omega psi chi omega psi", "zh", "s", 1L),
      (4L, "alpha beta gamma beta", "zh", "s", 1L)) // zh doc written in target vocab
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val w = Sampling.importanceResample(d, topK = 4).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // doc 4 uses the en model's vocabulary, so it outweighs doc 3
    assert(w(4L) > w(3L), s"target-vocab doc ${w(4L)} vs off-vocab ${w(3L)}")
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
