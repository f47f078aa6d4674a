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
    // Integer thresholds computed ONCE on the driver (round, not truncate):
    // engines disagree on double→int casts (Spark truncates, DuckDB rounds),
    // so a rate like 0.1 evaluated as a double expression could put the two
    // engines one hash-bucket apart. Integer literals make membership exact.
    val threshold = rates.foldLeft(lit(0L)) { case (acc, (s, r)) =>
      when(col(stratumCol) === s, lit(math.round(r * Million))).otherwise(acc)
    }
    df.filter(h < threshold)
  }

  /** Emit `weights(s)` copies of each row in stratum `s` in expectation:
    * `floor(w)` guaranteed copies plus one more when the row's hash lands
    * under the fractional remainder. `w < 1` downsamples, `w > 1` upsamples;
    * each copy is tagged with its 1-based `rep` index so downstream shuffles
    * can spread repeats. Missing strata keep weight 1.
    */
  /** Guaranteed copies and the fractional-extra threshold as INTEGER driver
    * constants (see `stratified` — double→int casts round differently across
    * engines; `math.round` on the driver once, integer comparisons in the
    * plan).
    */
  def weightedResample(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      weights: Map[String, Double]): DataFrame = {
    val base = weights.foldLeft(lit(1L)) { case (acc, (s, x)) =>
      when(col(stratumCol) === s, lit(math.floor(x).toLong)).otherwise(acc)
    }
    val frac = weights.foldLeft(lit(0L)) { case (acc, (s, x)) =>
      when(col(stratumCol) === s, lit(math.round((x - math.floor(x)) * Million))).otherwise(acc)
    }
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

    "q_sample_resample" -> {
      // the SAME driver-computed integers as weightedResample — never
      // re-derive thresholds in SQL double arithmetic
      val baseCase = MixWeights
        .map { case (l, x) => s"WHEN '$l' THEN ${math.floor(x).toLong}" }
        .mkString("CASE lang ", " ", " ELSE 1 END")
      val fracCase = MixWeights
        .map { case (l, x) => s"WHEN '$l' THEN ${math.round((x - math.floor(x)) * Million)}" }
        .mkString("CASE lang ", " ", " ELSE 0 END")
      s"""WITH c AS (
         |  SELECT doc_id, lang,
         |    $baseCase
         |      + CASE WHEN ${duckHash("resample")} % 1000000 < $fracCase
         |             THEN 1 ELSE 0 END AS copies
         |  FROM documents)
         |SELECT doc_id, lang, unnest(generate_series(1, copies)) AS rep
         |FROM c WHERE copies > 0""".stripMargin
    })
}
