package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** On-engine quality-classifier training — the fasttext/CCNet pattern
  * (curated-vs-crawl document classifier used as the corpus quality filter),
  * trained INSIDE the engine with full-batch gradient descent so the whole
  * loop is DataFrame aggregates: broadcast the weight vector as plan
  * literals, aggregate the gradient, update, repeat. The reference has no
  * trainable component; this extends the quality-calibration layer
  * (`q_quality_thresholds*` consume scores like the one this model emits).
  *
  * Scale shape: the corpus is featurized ONCE (map-only tokenize pass,
  * pinned); each GD round is one partial-aggregated scan of the tiny
  * feature projection — gradients fold map-side, the driver reads ONE row
  * per round (the new weight vector = the model, the `Bpe.learnMerges`
  * one-row-model-read class). This IS distributed full-batch GD: params
  * broadcast down, gradients aggregate up.
  *
  * Engine parity: the logistic is the HARD sigmoid `clamp(0.5 + z/4, 0, 1)`
  * — pure +,*,clamp arithmetic, bit-identical across engines, where
  * `exp()` ULP differences could flip a rounding. Gradients and updated
  * weights are round(·, 6)-ed by the ENGINE each round (the Lloyd-step
  * convention), so round r+1's literals are identical on both sides.
  */
object Classifier {

  val Rounds = 3
  val LearnRate = 1.0
  /** Label proxy on the shared testdata: the "curated" source set. */
  val CuratedSources: Seq[String] = (0 to 4).map(i => s"src$i")

  /** (doc_id, source, y, x1, x2, x3) features: label, saturated length,
    * stopword ratio, uniqueness ratio — the `Text.quality` ingredients.
    */
  def featurize(docs: DataFrame, positives: Seq[String]): DataFrame =
    docs.select(col("doc_id"), col("source"), Text.tokens(col("text")).as("toks"))
      .select(
        col("doc_id"), col("source"),
        when(col("source").isInCollection(positives), 1.0).otherwise(0.0).as("y"),
        least(lit(1.0), size(col("toks")).cast("double") / 80.0).as("x1"),
        round(expr(s"size(filter(toks, t -> t IN (${Text.stopwords.map(s => s"'$s'").mkString(", ")})))")
          .cast("double") / size(col("toks")), 6).as("x2"),
        round(size(array_distinct(col("toks"))).cast("double") / size(col("toks")), 6).as("x3"))

  /** GD rounds over an already-pinned feature projection; one Row per round:
    * (round, w0..w3). Shared by `train` and `classifierFilter` so the corpus
    * is tokenized/featurized exactly once per job.
    */
  private def gdRounds(f: DataFrame, rounds: Int, lr: Double): Seq[Row] = {
    var w = Array(0.0, 0.0, 0.0, 0.0)
    val out = Seq.newBuilder[Row]
    for (r <- 1 to rounds) {
      // z left-associated: w0 + w1*x1 + w2*x2 + w3*x3, same order as oracle
      val z = lit(w(0)) + lit(w(1)) * col("x1") + lit(w(2)) * col("x2") +
        lit(w(3)) * col("x3")
      val p = least(lit(1.0), greatest(lit(0.0), lit(0.5) + z / lit(4.0)))
      def upd(j: Int, x: Column): Column =
        round(lit(w(j)) - lit(lr) * round(avg((p - col("y")) * x), 6), 6)
      val row = f.agg(
        upd(0, lit(1.0)).as("w0"), upd(1, col("x1")).as("w1"),
        upd(2, col("x2")).as("w2"), upd(3, col("x3")).as("w3"))
        .collect()(0) // the one-row model read, see scaladoc
      w = Array(row.getDouble(0), row.getDouble(1), row.getDouble(2), row.getDouble(3))
      out += Row(r.toLong, w(0), w(1), w(2), w(3))
    }
    out.result()
  }

  private def trajectoryDf(spark: SparkSession, rows: Seq[Row]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("round", LongType, nullable = false) +:
        (0 to 3).map(j => StructField(s"w$j", DoubleType, nullable = false)): _*)))

  /** Train `rounds` full-batch GD steps from w = 0; returns one row per
    * round: (round, w0..w3) — the weight trajectory, i.e. the model and its
    * training history.
    */
  def train(docs: DataFrame, positives: Seq[String] = CuratedSources,
      rounds: Int = Rounds, lr: Double = LearnRate): DataFrame = {
    val f = featurize(docs, positives).localCheckpoint(false)
    trajectoryDf(docs.sparkSession, gdRounds(f, rounds, lr))
  }

  /** The trained model APPLIED end-to-end (the `q_quality_lm_filter`
    * composition pattern): train on the corpus, then score every document
    * with the final weights as plan literals (the broadcast-model pattern).
    * Returns (doc_id, source, p_e6, kept) — p in integer micro-units via
    * floor, `kept` = p >= 0.5, the filter verdict made visible instead of
    * applied (on weakly-separable data a hard cut can keep nothing; the
    * score table is the durable artifact and the cut is a caller choice,
    * exactly like `quality_e6` feeding `qualityThresholds*`).
    */
  def classifierFilter(docs: DataFrame, positives: Seq[String] = CuratedSources): DataFrame = {
    // featurize ONCE: the same pinned projection feeds every GD round and the
    // final scoring pass (round-9 advice: train+score was tokenizing twice)
    val f = featurize(docs, positives).localCheckpoint(false)
    val last = gdRounds(f, Rounds, LearnRate).maxBy(_.getLong(0))
    val (w0, w1, w2, w3) =
      (last.getDouble(1), last.getDouble(2), last.getDouble(3), last.getDouble(4))
    val z = lit(w0) + lit(w1) * col("x1") + lit(w2) * col("x2") + lit(w3) * col("x3")
    val p = least(lit(1.0), greatest(lit(0.0), lit(0.5) + z / lit(4.0)))
    f
      .select(col("doc_id"), col("source"), p.as("p"))
      .select(col("doc_id"), col("source"),
        expr("cast(floor(p * 1000000.0) as bigint)").as("p_e6"),
        (col("p") >= 0.5).as("kept"))
  }

  // --- driver contract -----------------------------------------------------

  private val normSql = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
  private val stopList = Text.stopwords.map(s => s"'$s'").mkString(", ")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_train_classifier" -> ((s, d) => train(Tables.documents(s, d))),
    "q_pipeline_classifier" -> ((s, d) => classifierFilter(Tables.documents(s, d))))

  /** Shared CTE chain: f (features incl. doc_id/source) and w0..wRounds. */
  private def trainCtes: Seq[String] = {
    val feats =
      s"""f AS (SELECT doc_id, source,
         |  CASE WHEN source IN (${CuratedSources.map(s => s"'$s'").mkString(", ")})
         |    THEN 1.0 ELSE 0.0 END AS y,
         |  least(1.0, CAST(len(toks) AS DOUBLE) / 80.0) AS x1,
         |  round(CAST(len(list_filter(toks, t -> t IN ($stopList))) AS DOUBLE) / len(toks), 6) AS x2,
         |  round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6) AS x3
         |  FROM (SELECT doc_id, source, string_split($normSql, ' ') AS toks FROM documents)),
         |w0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3)""".stripMargin
    val rounds = (1 to Rounds).map { r =>
      s"""w$r AS (SELECT
         |  round(w.w0 - $LearnRate * round(avg((p - y) * 1.0), 6), 6) AS w0,
         |  round(w.w1 - $LearnRate * round(avg((p - y) * x1), 6), 6) AS w1,
         |  round(w.w2 - $LearnRate * round(avg((p - y) * x2), 6), 6) AS w2,
         |  round(w.w3 - $LearnRate * round(avg((p - y) * x3), 6), 6) AS w3
         |  FROM (SELECT y, x1, x2, x3,
         |          least(1.0, greatest(0.0,
         |            0.5 + (w.w0 + w.w1 * x1 + w.w2 * x2 + w.w3 * x3) / 4.0)) AS p
         |        FROM f, w${r - 1} w), w${r - 1} w
         |  GROUP BY w.w0, w.w1, w.w2, w.w3)""".stripMargin
    }
    feats +: rounds
  }

  def oracleSql: Map[String, String] = Map(
    "q_train_classifier" -> {
      val unions = (1 to Rounds)
        .map(r => s"SELECT CAST($r AS BIGINT) AS round, w0, w1, w2, w3 FROM w$r")
        .mkString("\n", "\nUNION ALL\n", "")
      trainCtes.mkString("WITH ", ",\n", unions)
    },

    "q_pipeline_classifier" -> {
      val score =
        s"""
           |SELECT doc_id, source, CAST(floor(p * 1000000.0) AS BIGINT) AS p_e6,
           |       p >= 0.5 AS kept
           |FROM (SELECT doc_id, source,
           |        least(1.0, greatest(0.0,
           |          0.5 + (w.w0 + w.w1 * x1 + w.w2 * x2 + w.w3 * x3) / 4.0)) AS p
           |      FROM f, w$Rounds w)""".stripMargin
      trainCtes.mkString("WITH ", ",\n", score)
    })
}
