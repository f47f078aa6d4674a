package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation — the two selection
  * shapes every corpus build runs between cleaning and training:
  *
  *   - stratified sampling: keep an independent fraction per stratum
  *     (language, source, quality band) to hit a target mix;
  *   - weighted resampling ("mixture weights"): repeat or thin documents so
  *     a stratum contributes `w`× its natural frequency — upsampling rare
  *     languages, downsampling boilerplate-heavy sources.
  *
  * Both are MAP-ONLY: the keep/repeat decision is a pure function of the
  * row (a 60-bit md5-derived hash against a rate threshold), so there is no
  * shuffle, no RNG state, no driver coordination — at 100 TB each task
  * decides its own rows and the sample is reproducible run-over-run and
  * engine-over-engine (the DuckDB oracles compute the same membership).
  * `sample()`/TABLESAMPLE can't give that: their seeds are per-partition, so
  * membership changes with the split layout.
  *
  * The reference has no sampling operator (its filter(Criteria) is the
  * nearest shape, core/Table.java:338-367); these extend the inventory the
  * way SURVEY §6 prescribes for pipeline completeness.
  */
object Sampling {

  /** 60-bit positive hash of `e` salted with `salt` — engine-portable
    * (same value in DuckDB: ('0x'||substr(md5(salt||e),1,15))::BIGINT).
    */
  private def hash60(salt: String, e: Column): Column =
    conv(substring(md5(concat(lit(salt), e.cast("string"))), 1, 15), 16, 10)
      .cast("long")

  private val Million = 1000000L

  /** Keep each row of stratum `s` with probability `rates(s)` (missing
    * strata are dropped), deciding by id-hash so membership is deterministic.
    */
  def stratified(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      rates: Map[String, Double]): DataFrame = {
    val h = hash60("strat", col(idCol)) % Million
    val threshold = rates.foldLeft(lit(0L)) { case (acc, (s, r)) =>
      when(col(stratumCol) === s, lit((r * Million).toLong)).otherwise(acc)
    }
    df.filter(h < threshold)
  }

  /** Emit `weights(s)` copies of each row in stratum `s` in expectation:
    * `floor(w)` guaranteed copies plus one more when the row's hash lands
    * under the fractional remainder. `w < 1` downsamples, `w > 1` upsamples;
    * each copy is tagged with its 1-based `rep` index so downstream shuffles
    * can spread repeats. Missing strata keep weight 1.
    */
  def weightedResample(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      weights: Map[String, Double]): DataFrame = {
    val w = weights.foldLeft(lit(1.0)) { case (acc, (s, x)) =>
      when(col(stratumCol) === s, lit(x)).otherwise(acc)
    }
    val base = floor(w).cast("long")
    val frac = ((w - floor(w)) * Million).cast("long")
    val extra = (hash60("resample", col(idCol)) % Million < frac).cast("long")
    df.withColumn("copies", base + extra)
      .filter(col("copies") > 0)
      .withColumn("rep", explode(sequence(lit(1L), col("copies"))))
      .drop("copies")
  }

  // Fixed demo mixes over the documents table: target an English-light,
  // French-heavy corpus. Chosen so every branch (down-, up-, pass-through,
  // fractional, dropped) is exercised.
  private val StratRates =
    Map("en" -> 0.25, "de" -> 0.80, "zh" -> 0.50, "fr" -> 1.00) // es dropped
  private val MixWeights =
    Map("en" -> 0.50, "de" -> 2.00, "zh" -> 1.00, "fr" -> 2.75, "es" -> 0.25)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sample_stratified" -> ((s, d) =>
      stratified(Tables.documents(s, d), "doc_id", "lang", StratRates)
        .select(col("doc_id"), col("lang"))),
    "q_sample_resample" -> ((s, d) =>
      weightedResample(Tables.documents(s, d), "doc_id", "lang", MixWeights)
        .select(col("doc_id"), col("lang"), col("rep"))))

  private def duckHash(salt: String): String =
    s"('0x' || substr(md5('$salt' || cast(doc_id AS VARCHAR)), 1, 15))::BIGINT"

  val oracleSql: Map[String, String] = Map(
    "q_sample_stratified" ->
      s"""SELECT doc_id, lang FROM documents
         |WHERE ${duckHash("strat")} % 1000000 <
         |  CASE lang WHEN 'en' THEN 250000 WHEN 'de' THEN 800000
         |            WHEN 'zh' THEN 500000 WHEN 'fr' THEN 1000000 ELSE 0 END""".stripMargin,

    "q_sample_resample" ->
      s"""WITH c AS (
         |  SELECT doc_id, lang,
         |    CAST(floor(w) AS BIGINT)
         |      + CASE WHEN ${duckHash("resample")} % 1000000
         |               < CAST((w - floor(w)) * 1000000 AS BIGINT)
         |             THEN 1 ELSE 0 END AS copies
         |  FROM (SELECT doc_id, lang,
         |          CASE lang WHEN 'en' THEN 0.50 WHEN 'de' THEN 2.00
         |                    WHEN 'zh' THEN 1.00 WHEN 'fr' THEN 2.75
         |                    WHEN 'es' THEN 0.25 ELSE 1.00 END AS w
         |        FROM documents))
         |SELECT doc_id, lang, unnest(generate_series(1, copies)) AS rep
         |FROM c WHERE copies > 0""".stripMargin)
}
