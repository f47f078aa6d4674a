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
}
