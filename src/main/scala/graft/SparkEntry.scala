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

  /** The registry WITH provenance: (entry-point object, its query map), in
    * merge order. `graft.Catalog` generates the README operator catalog from
    * this — the module name is the "where is this implemented" column, so
    * it can never drift from the code the way hand-maintained prose does.
    */
  def modules: Seq[(String, Map[String, (SparkSession, String) => DataFrame])] = Seq(
    "batch.Relational" -> batch.Relational.queries,
    "batch.DeepAnalytics" -> batch.DeepAnalytics.queries,
    "ops.Text" -> ops.Text.queries,
    "ops.Dedup" -> ops.Dedup.queries,
    "ops.Similarity" -> ops.Similarity.queries,
    "ops.Multimodal" -> ops.Multimodal.queries,
    "ops.WindowsBatch" -> ops.WindowsBatch.queries,
    "ops.Pipelines" -> ops.Pipelines.queries,
    "ops.Sampling" -> ops.Sampling.queries,
    "ops.Curation" -> ops.Curation.queries,
    "ops.AsOf" -> ops.AsOf.queries,
    "ops.RangeJoin" -> ops.RangeJoin.queries,
    "ops.Corpus" -> ops.Corpus.queries,
    "ops.Skew" -> ops.Skew.queries,
    "ops.Cdc" -> ops.Cdc.queries,
    "ops.Bpe" -> ops.Bpe.queries,
    "ops.Classifier" -> ops.Classifier.queries,
    "ops.Search" -> ops.Search.queries,
    "ops.Behavior" -> ops.Behavior.queries,
    "ops.Sketches" -> ops.Sketches.queries,
    "ops.Graph" -> ops.Graph.queries,
    "ops.Linkage" -> ops.Linkage.queries,
    "ops.Stats" -> ops.Stats.queries,
    "ops.Unigram" -> ops.Unigram.queries,
    "api.GTableQueries" -> api.GTableQueries.queries)

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._2).reduce(_ ++ _)

  /** query name → entry-point object (latest module wins, like the merge). */
  def queryOrigins: Map[String, String] =
    modules.flatMap { case (n, m) => m.keys.map(_ -> n) }.toMap

  def oracleSql: Map[String, String] =
    batch.Relational.oracleSql ++ batch.DeepAnalytics.oracleSql ++
      ops.Text.oracleSql ++ ops.Dedup.oracleSql ++ ops.Similarity.oracleSql ++
      ops.Multimodal.oracleSql ++ ops.WindowsBatch.oracleSql ++ ops.Pipelines.oracleSql ++
      ops.Sampling.oracleSql ++ ops.Curation.oracleSql ++ ops.AsOf.oracleSql ++
      ops.RangeJoin.oracleSql ++ ops.Corpus.oracleSql ++ ops.Skew.oracleSql ++
      ops.Cdc.oracleSql ++ ops.Bpe.oracleSql ++ ops.Classifier.oracleSql ++ ops.Search.oracleSql ++
      ops.Behavior.oracleSql ++ ops.Sketches.oracleSql ++ ops.Graph.oracleSql ++
      ops.Linkage.oracleSql ++ ops.Stats.oracleSql ++ ops.Unigram.oracleSql ++ api.GTableQueries.oracleSql
}
