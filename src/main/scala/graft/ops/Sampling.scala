package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Pinned.PinnedOps

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

  // --- DSIR hashed importance resampling -----------------------------------

  val DsirBuckets = 64
  val DsirTopK = 100
  /** Target domain for the demo query: the corpus's English slice. */
  val DsirTargetLang = "en"

  /** DSIR-style data selection (Xie et al. 2023, arXiv:2302.03169):
    * estimate per-document importance weights under two hashed bag-of-ngrams
    * models — a TARGET domain model and the RAW corpus model — then select
    * top-k by weight plus Gumbel noise (importance resampling without
    * replacement). Features are unigrams+bigrams hashed into `DsirBuckets`
    * buckets; both models are Laplace-smoothed multinomials over buckets;
    * log w(d) = Σ_b n_b(d)·(ln p̂_target(b) − ln q̂_raw(b)).
    *
    * Determinism: the Gumbel uniform is the engine-portable 60-bit md5 hash
    * of doc_id mapped into (0,1) — no RNG state, membership reproducible
    * across engines and partitionings (same contract as `stratified`).
    *
    * Scale shape: one token scan builds hashed (doc, bucket, n) counts — the
    * only corpus-wide shuffle, carrying ≤ `DsirBuckets` rows per doc. Both
    * models are ≤ B-row aggregates broadcast back; scoring is a broadcast
    * join + per-doc sum; selection is orderBy+limit (TakeOrderedAndProject).
    * At 100 TB nothing beyond the bucketed counts ever shuffles.
    */
  def importanceResample(docs: DataFrame, topK: Int = DsirTopK): DataFrame = {
    val toks = docs.select(col("doc_id"), col("lang"),
      Text.tokens(col("text")).as("toks"))
    // native unigram+bigram bucket pass (SaltedFeatureBuckets) — the bucket
    // multiset per doc is identical to the former interpreted spelling
    // (bigram-string transform + explode + md5-hash60 per feature;
    // ExpressionsSpec pins the equality), without materializing feature
    // strings or running a boxed lambda per bigram
    val feats = toks
      .select(col("doc_id"), col("lang"),
        explode(graft.functions.GraftFunctions.saltedFeatureBuckets(
          col("toks"), "dsir", DsirBuckets)).as("bucket"))
      .groupBy(col("doc_id"), col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n"))
      // pinned: the tokenize+explode+hash feature projection feeds THREE
      // consumers (raw totals, target totals, scoring join) — unpinned, the
      // corpus re-tokenizes per consumer (the q_dedup_prefix lesson)
      .pinned(false)
    val raw = feats.groupBy(col("bucket")).agg(sum(col("n")).as("rc"))
    val tgt = feats.filter(col("lang") === DsirTargetLang)
      .groupBy(col("bucket")).agg(sum(col("n")).as("tc"))
    val tots = raw.agg(sum(col("rc")).as("rt"))
      .crossJoin(tgt.agg(coalesce(sum(col("tc")), lit(0L)).as("tt")))
    // raw covers every bucket any doc hits, so it is the bucket domain
    val llr = raw.join(tgt, Seq("bucket"), "left").crossJoin(broadcast(tots))
      .select(col("bucket"),
        (log((coalesce(col("tc"), lit(0L)) + 1).cast("double") / (col("tt") + DsirBuckets))
          - log((col("rc") + 1).cast("double") / (col("rt") + DsirBuckets))).as("llr"))
    val u = (hash60("gumbel", col("doc_id")) % Million + lit(0.5)) / lit(1000000.0)
    val scored = feats.join(broadcast(llr), Seq("bucket"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(round(sum(col("n") * col("llr")), 6).as("logw"))
      .withColumn("score", round(col("logw") + (log(log(u) * -1) * -1), 6))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
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
        .select(col("doc_id"), col("lang"), col("rep"))),
    "q_sample_importance" -> ((s, d) => importanceResample(Tables.documents(s, d))))

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
    },

    "q_sample_importance" ->
      s"""WITH t AS (SELECT doc_id, lang, ${Text.toksSql} AS toks FROM documents),
         |tb AS (SELECT doc_id, lang, toks,
         |         CASE WHEN len(toks) >= 2
         |              THEN [toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]
         |              ELSE [] END AS bi
         |       FROM t),
         |f AS (SELECT doc_id, lang, unnest(list_concat(toks, bi)) AS feat FROM tb),
         |fc AS (SELECT doc_id, lang,
         |         ('0x' || substr(md5('dsir' || feat), 1, 15))::BIGINT % $DsirBuckets AS bucket,
         |         count(*) AS n
         |       FROM f GROUP BY 1, 2, 3),
         |raw AS (SELECT bucket, sum(n) AS rc FROM fc GROUP BY 1),
         |tgt AS (SELECT bucket, sum(n) AS tc FROM fc WHERE lang = '$DsirTargetLang' GROUP BY 1),
         |tots AS (SELECT (SELECT sum(rc) FROM raw) AS rt,
         |                (SELECT coalesce(sum(tc), 0) FROM tgt) AS tt),
         |llr AS (SELECT r.bucket,
         |          ln((coalesce(tc, 0) + 1)::DOUBLE / (tt + $DsirBuckets))
         |            - ln((rc + 1)::DOUBLE / (rt + $DsirBuckets)) AS llr
         |        FROM raw r LEFT JOIN tgt USING (bucket) CROSS JOIN tots),
         |w AS (SELECT doc_id, lang, round(sum(n * llr), 6) AS logw
         |      FROM fc JOIN llr USING (bucket) GROUP BY 1, 2),
         |s AS (SELECT doc_id, lang, logw,
         |        round(logw + ln(ln((${duckHash("gumbel")} % 1000000 + 0.5) / 1000000.0) * -1) * -1, 6) AS score
         |      FROM w),
         |r AS (SELECT doc_id, lang, logw, score,
         |        CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
         |      FROM s)
         |SELECT doc_id, lang, logw, score, rank FROM r WHERE rank <= $DsirTopK""".stripMargin)
}
