package graft

import graft.api.GTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the README "Using the library" snippet: every call compiles against
  * the real API and runs end-to-end on sf0.001. If an operator signature
  * changes, this spec (and therefore the README) breaks loudly.
  */
class DocQuickstartSpec extends SparkSpec {

  test("README quickstart runs end-to-end on the smallest fixture") {
    val t = GTable(spark.read.parquet(s"${sf()}/lineitem.parquet"))
      .filter(r => r.getAs[Double]("l_quantity") > 30)
      .groupBy(Seq("l_returnflag"),
        StructType(Seq(StructField("sum_qty", DoubleType)))) { (key, rows) =>
        Seq(rows.map(_.getAs[Double]("l_quantity")).sum)
      }
    assert(t.df.count() > 0)

    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val normed = ops.Text.normalizeDocs(docs)
      .withColumn("text", col("norm_text")).drop("norm_text")
    val clean = ops.Curation.boilerplate(normed)
      .select(col("doc_id"), col("clean_text").as("text"))
      .join(docs.select("doc_id", "source"), Seq("doc_id"))
    val kept = ops.Dedup.nearDupSurvivors(clean)
    val mix = ops.Corpus.mixTemperature(kept, totalDocs = 1000000L)
    assert(mix.count() > 0)
    val laid = ops.Corpus.zorderLayout(docs,
      "cast(substr(source, 4) as bigint)", "n_chars div 8", 4)
    assert(laid.select("zv").count() == docs.count())

    val merges = ops.Bpe.learnMerges(docs, n = 2)
    assert(merges.count() == 2)
    val model = ops.Classifier.train(docs, rounds = 1)
    assert(model.count() == 1)
  }

  test("governance additions compose end-to-end on the smallest fixture") {
    // split the corpus leakage-safely, keep the train slice
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val split = ops.Dedup.leakageSafeSplit(docs)
    assert(split.count() == docs.count())
    val train = docs.join(
      split.filter(col("split") === "train").select("doc_id"), Seq("doc_id"))
    assert(train.count() > 0 && train.count() < docs.count())

    // gate a PII-bearing table release on its k-anonymity audit
    val cust = spark.read.parquet(s"${sf()}/customer.parquet")
    val audit = ops.Curation.kAnonymity(cust, k = 5L)
    assert(audit.count() > 0)
    assert(audit.select("status").distinct().collect().map(_.getString(0)).toSet
      .subsetOf(Set("ok", "generalized", "suppressed")))

    // telemetry features: per-day TWAP + nearest-error alignment
    val ev = Tables.events(spark, sf())
    assert(ops.Behavior.twap(ev).count() > 0)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("__time__"))
    val errs = ev.filter(col("event_type") === "error")
      .groupBy(col("user_id"), col("__time__").as("rt"))
      .agg(max(col("value")).as("rv"))
    val aligned = ops.AsOf.nearestJoin(clicks, errs, Seq("user_id"),
      "__time__", "rt", Seq("rv"), toleranceMs = 24L * 3600 * 1000)
    assert(aligned.count() == clicks.count())
  }
}
