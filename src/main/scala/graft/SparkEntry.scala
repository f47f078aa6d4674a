package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, with a DuckDB-equivalent oracle in `oracleSql`.
  *
  * Conventions shared by queries and oracles (determinism across engines):
  *   - event time is BIGINT epoch-millis (`__time__`), like the reference
  *     (sp/input/AbstractStreamTable.java:25-38); parquet nanos are integer-
  *     divided, never via double.
  *   - double aggregates are `round(..., 2)` on both sides so the hash compare
  *     is insensitive to summation order.
  *   - every ranked/limited output has a total-order tie-break key.
  */
object SparkEntry {

  /** Flagship query (driver smoke-checks rows>0 on sf0.001): revenue by
    * return flag for oversized parts — scan → broadcast join → filter →
    * hash agg → top-k, the reference's EP2 batch shape (SURVEY §3).
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir)
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .filter(col("p_size") > 20)
      .groupBy(col("l_returnflag"), col("p_brand"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n"))
      .orderBy(col("revenue").desc, col("l_returnflag"), col("p_brand"))
      .limit(100)
  }

  /** The registry WITH provenance: (entry-point object, its query map, its
    * oracle map), in merge order. BOTH `queries` and `oracleSql` derive
    * from this one list — a module added here ships its oracles with it,
    * and a module added anywhere else doesn't exist, so the two maps can
    * never drift apart the way parallel hand-maintained chains could.
    * `graft.Catalog` generates the README operator catalog from it.
    */
  def modules: Seq[(String, Map[String, (SparkSession, String) => DataFrame], Map[String, String])] = Seq(
    ("batch.Relational", batch.Relational.queries, batch.Relational.oracleSql),
    ("batch.DeepAnalytics", batch.DeepAnalytics.queries, batch.DeepAnalytics.oracleSql),
    ("ops.Text", ops.Text.queries, ops.Text.oracleSql),
    ("ops.Dedup", ops.Dedup.queries, ops.Dedup.oracleSql),
    ("ops.Similarity", ops.Similarity.queries, ops.Similarity.oracleSql),
    ("ops.Multimodal", ops.Multimodal.queries, ops.Multimodal.oracleSql),
    ("ops.WindowsBatch", ops.WindowsBatch.queries, ops.WindowsBatch.oracleSql),
    ("ops.Pipelines", ops.Pipelines.queries, ops.Pipelines.oracleSql),
    ("ops.Sampling", ops.Sampling.queries, ops.Sampling.oracleSql),
    ("ops.Curation", ops.Curation.queries, ops.Curation.oracleSql),
    ("ops.AsOf", ops.AsOf.queries, ops.AsOf.oracleSql),
    ("ops.RangeJoin", ops.RangeJoin.queries, ops.RangeJoin.oracleSql),
    ("ops.Corpus", ops.Corpus.queries, ops.Corpus.oracleSql),
    ("ops.Skew", ops.Skew.queries, ops.Skew.oracleSql),
    ("ops.Cdc", ops.Cdc.queries, ops.Cdc.oracleSql),
    ("ops.Bpe", ops.Bpe.queries, ops.Bpe.oracleSql),
    ("ops.Classifier", ops.Classifier.queries, ops.Classifier.oracleSql),
    ("ops.Search", ops.Search.queries, ops.Search.oracleSql),
    ("ops.Behavior", ops.Behavior.queries, ops.Behavior.oracleSql),
    ("ops.Sketches", ops.Sketches.queries, ops.Sketches.oracleSql),
    ("ops.Graph", ops.Graph.queries, ops.Graph.oracleSql),
    ("ops.Linkage", ops.Linkage.queries, ops.Linkage.oracleSql),
    ("ops.Stats", ops.Stats.queries, ops.Stats.oracleSql),
    ("ops.Unigram", ops.Unigram.queries, ops.Unigram.oracleSql),
    ("api.GTableQueries", api.GTableQueries.queries, api.GTableQueries.oracleSql))

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._2).reduce(_ ++ _)

  /** query name → entry-point object (latest module wins, like the merge). */
  def queryOrigins: Map[String, String] =
    modules.flatMap { case (n, m, _) => m.keys.map(_ -> n) }.toMap

  def oracleSql: Map[String, String] =
    modules.map(_._3).reduce(_ ++ _)
}
