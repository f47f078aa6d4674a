package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed statistics primitives: equal-frequency binning, exact-moment
  * correlation, per-group mode, and the two-proportion z-test — the summary
  * layer an analytics engine needs beside its aggregates (the reference
  * stops at sum/max/avg/count, table/function package; SURVEY §2.6).
  *
  * Shared determinism discipline (the engine's cross-engine contract):
  * every statistic is computed from EXACT integer moments (long sums of
  * micro-unit values — associative, partition-order immune), combined by
  * ONE documented IEEE expression shared verbatim with the oracle, then
  * rounded. Doubles never accumulate; they only finish.
  */
object Stats {

  /** Per-group equal-frequency binning (quantile bucketization — the
    * feature-prep step for ML pipelines and the equal-mass histogram for
    * skewed distributions, where `qualityHistogram`'s equal-width bins
    * collapse). ntile PARTITIONED BY the group over the (value, id) total
    * order — one keyed exchange + in-partition sort, never a global
    * single-partition sort (an unpartitioned ntile funnels the corpus into
    * one task; for a corpus-global cut use the rank-selection thresholds of
    * `Corpus.qualityThresholdsBucketed`, which is the scale path).
    */
  def quantileBins(docs: DataFrame, nBins: Int = QuantileBins): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("n_chars"), col("doc_id"))
    docs
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("bin", ntile(nBins).over(w).cast("long"))
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n"), min(col("n_chars")).as("lo"), max(col("n_chars")).as("hi"))
  }

  val QuantileBins = 10

  /** Pearson correlation from exact integer moments: x = quantity in e4
    * micro-units, y = discount in e6 — magnitudes chosen so every moment
    * sum stays inside BIGINT past sf100 (sxx ≤ (5e5)²·rows). The final
    * r = (n·sxy − sx·sy)/(√(n·sxx−sx²)·√(n·syy−sy²)) combines the exact
    * longs in IEEE doubles with the identical expression on both engines.
    * One partial+final agg — a 6-counter map-side fold, no shuffle of data.
    */
  def correlation(lineitem: DataFrame): DataFrame =
    lineitem
      .select(expr("cast(round(l_quantity * 10000) as bigint)").as("x"),
        expr("cast(round(l_discount * 1000000) as bigint)").as("y"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .select(col("n"),
        expr("round((cast(n as double) * cast(sxy as double) - cast(sx as double) * cast(sy as double))" +
          " / (sqrt(cast(n as double) * cast(sxx as double) - cast(sx as double) * cast(sx as double))" +
          " * sqrt(cast(n as double) * cast(syy as double) - cast(sy as double) * cast(sy as double))), 6)")
          .as("r"))

  /** Pairwise Pearson correlation MATRIX over the fact's numeric columns
    * (the ANALYZE companion to [[correlation]]'s single pair): ALL 15
    * moments (n, 4 sums, 10 product sums) fold in ONE map-side aggregate —
    * a single fact pass and a 1-row exchange regardless of column count —
    * then the 6 unordered pairs unstack from the moment row with the same
    * shared IEEE expression shape as `q_corr` (engine-identical given
    * identical moments).
    *
    * Scales are chosen so every product sum stays inside Long at 10⁹ rows
    * (price in WHOLE currency units — cents would overflow Σx² at scale;
    * the coarser rounding changes r only through identically-rounded inputs
    * on both engines, so the hash compare is unaffected).
    */
  val CorrMatrixCols: Seq[(String, String, Long)] = Seq(
    ("l_quantity", "qty", 100L), ("l_extendedprice", "price", 1L),
    ("l_discount", "disc", 10000L), ("l_tax", "tax", 10000L))

  def corrMatrix(lineitem: DataFrame): DataFrame = {
    val cols = CorrMatrixCols
    val proj = lineitem.select(cols.map { case (c, a, s) =>
      expr(s"cast(round($c * $s) as bigint)").as(a) }: _*)
    val aggs =
      (count(lit(1)).as("n") +:
        cols.map { case (_, a, _) => sum(col(a)).as(s"s_$a") }) ++
        (for { i <- cols.indices; j <- i until cols.length } yield {
          val (ai, aj) = (cols(i)._2, cols(j)._2)
          sum(col(ai) * col(aj)).as(s"s_${ai}_${aj}")
        })
    val m = proj.agg(aggs.head, aggs.tail: _*)
    val pairs =
      for { i <- cols.indices; j <- (i + 1) until cols.length }
        yield (cols(i)._2, cols(j)._2)
    m.select(expr(s"stack(${pairs.length}, " +
      pairs.map { case (a, b) => s"'$a', '$b', n, ${corrExprSql(a, b)}" }
        .mkString(", ") + ") as (col_x, col_y, n, r)"))
  }

  /** The shared Pearson expression over named moment columns — ONE shape
    * for every pair and (modulo cast spelling) for the DuckDB oracle, so
    * cross-engine equality reduces to equality of the integer moments.
    */
  private def corrExprSql(a: String, b: String): String =
    s"round((cast(n as double) * cast(s_${a}_${b} as double) - cast(s_$a as double) * cast(s_$b as double))" +
      s" / (sqrt(cast(n as double) * cast(s_${a}_${a} as double) - cast(s_$a as double) * cast(s_$a as double))" +
      s" * sqrt(cast(n as double) * cast(s_${b}_${b} as double) - cast(s_$b as double) * cast(s_$b as double))), 6)"

  /** Per-group mode with a deterministic tie (largest count, then smallest
    * value): one count agg on the (group, value) domain, then a min(struct)
    * fold — the negated count makes lexicographic struct-min pick exactly
    * (max n, min value), so no rank window runs and the second agg's
    * map-side combine keeps one candidate per group per task.
    */
  def mode(docs: DataFrame, groupCol: String = "source", valCol: String = "lang"): DataFrame =
    docs
      .groupBy(col(groupCol), col(valCol))
      .agg(count(lit(1)).as("n"))
      .groupBy(col(groupCol))
      .agg(min(struct((-col("n")).as("neg"), col(valCol).as("v"))).as("m"))
      .select(col(groupCol), col("m.v").as("mode"), (-col("m.neg")).as("n"))

  /** Two-proportion z-test over an A/B split (the experimentation
    * primitive): group = user_id parity, success = a heavy purchaser (at
    * least `AbHeavyN` purchases — the data's median, so both proportions
    * sit well inside (0,1)). Counts are exact integer aggregates; z uses
    * the pooled estimate p̂ = (cA+cB)/(nA+nB) in one shared IEEE
    * expression, NULL when the pooled variance is degenerate (p̂ ∈ {0,1} —
    * under ANSI mode the unguarded division would throw, and a degenerate
    * test has no z).
    */
  def abTest(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), pmod(col("user_id"), lit(2)).as("grp"),
        (col("event_type") === "purchase").cast("long").as("p"))
      .groupBy(col("user_id"), col("grp"))
      .agg((sum(col("p")) >= AbHeavyN).cast("long").as("converted"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("converted")).cast("long").as("conv"))
      .agg(
        max(when(col("grp") === 0, col("n"))).as("n_a"),
        max(when(col("grp") === 0, col("conv"))).as("conv_a"),
        max(when(col("grp") === 1, col("n"))).as("n_b"),
        max(when(col("grp") === 1, col("conv"))).as("conv_b"))
      .select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
        expr("case when conv_a + conv_b > 0 and conv_a + conv_b < n_a + n_b then" +
          " round((cast(conv_a as double) / cast(n_a as double)" +
          " - cast(conv_b as double) / cast(n_b as double))" +
          " / sqrt((cast(conv_a + conv_b as double) / cast(n_a + n_b as double))" +
          " * (1.0 - cast(conv_a + conv_b as double) / cast(n_a + n_b as double))" +
          " * (1.0 / cast(n_a as double) + 1.0 / cast(n_b as double))), 4) end").as("z"))

  val AbHeavyN = 14L

  /** Per-user value trend: ordinary-least-squares slope of event value over
    * time (v_e4 micro-units per day). Same exact-moment discipline as
    * `correlation` — five integer sums per user inside one hash agg, slope
    * finished by one shared IEEE expression; users need `TrendMinN` points
    * and a non-degenerate x spread (all-same-day users have no slope).
    */
  def trend(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), expr("__time__ div 86400000").as("x"),
        expr("cast(round(value * 10000) as bigint)").as("y"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"))
      .filter(col("n") >= TrendMinN && col("n") * col("sxx") - col("sx") * col("sx") > 0)
      .select(col("user_id"), col("n"),
        expr("round((cast(n as double) * cast(sxy as double) - cast(sx as double) * cast(sy as double))" +
          " / (cast(n as double) * cast(sxx as double) - cast(sx as double) * cast(sx as double)), 6)")
          .as("slope"))

  val TrendMinN = 5L

  /** Median absolute deviation per group — the robust spread measure
    * (insensitive to the outliers that wreck a stddev): two rank-selection
    * passes of the `quantileBins`/`percentile_disc` machinery, the second
    * over |x − median| with the per-group medians joined back. All order
    * statistics, integer-exact end to end.
    */
  def mad(docs: DataFrame): DataFrame = {
    def medianOf(df: DataFrame, valCol: String): DataFrame = {
      val w = Window.partitionBy(col("source")).orderBy(col(valCol), col("doc_id"))
      val wn = Window.partitionBy(col("source"))
      df.withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(wn))
        .filter(col("rn") === expr("(n + 1) div 2"))
        .select(col("source"), col(valCol).as("med"), col("n"))
    }
    val base = docs.select(col("source"), col("doc_id"), col("n_chars"))
    val med = medianOf(base, "n_chars")
    val dev = base.join(med.select(col("source"), col("med")), "source")
      .select(col("source"), col("doc_id"), abs(col("n_chars") - col("med")).as("adev"))
    medianOf(dev.withColumnRenamed("adev", "n_chars"), "n_chars")
      .join(med.select(col("source"), col("med").as("median")), "source")
      .select(col("source"), col("n"), col("median"), col("med").as("mad"))
  }

  /** Shannon entropy of each user's event-type mix, in nats. The
    * transcendental-sum determinism trap: Σ c·ln(c) as a plain SUM would
    * accumulate in partition order. Instead the per-type counts collect
    * into a SORTED list and fold left-to-right (`aggregate` here,
    * `list_reduce` in the oracle) — a fixed association both engines
    * replay; H = ln(n) − fold/n. The list is bounded by the type domain,
    * never the event count.
    */
  def entropy(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("user_id"))
      .agg(sum(col("c")).as("n"),
        sort_array(collect_list(struct(col("event_type").as("t"), col("c")))).as("cs"))
      .select(col("user_id"), col("n"),
        expr("round(ln(cast(n as double)) - aggregate(cs, cast(0.0 as double)," +
          " (acc, s) -> acc + cast(s.c as double) * ln(cast(s.c as double))) / cast(n as double), 6)")
          .as("entropy"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_trend" -> ((s, d) => trend(Tables.events(s, d))),
    "q_mad" -> ((s, d) => mad(Tables.documents(s, d))),
    "q_entropy" -> ((s, d) => entropy(Tables.events(s, d))),
    "q_quantile_bins" -> ((s, d) => quantileBins(Tables.documents(s, d))),
    "q_corr" -> ((s, d) => correlation(Tables.lineitem(s, d))),
    "q_corr_matrix" -> ((s, d) => corrMatrix(Tables.lineitem(s, d))),
    "q_mode" -> ((s, d) => mode(Tables.documents(s, d))),
    "q_abtest" -> ((s, d) => abTest(Tables.events(s, d))))

  val oracleSql: Map[String, String] = Map(
    "q_trend" ->
      s"""WITH m AS (SELECT user_id, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         |  sum(x * x) AS sxx, sum(x * y) AS sxy
         |FROM (SELECT user_id, epoch_ms(ts) // 86400000 AS x,
         |        CAST(round(value * 10000) AS BIGINT) AS y FROM events)
         |GROUP BY 1)
         |SELECT user_id, CAST(n AS BIGINT) AS n,
         |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         |    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope
         |FROM m WHERE n >= $TrendMinN AND n * sxx - sx * sx > 0""".stripMargin,

    "q_mad" ->
      """WITH b AS (SELECT source, doc_id, n_chars FROM documents),
        |m1 AS (SELECT source, n_chars AS med, n FROM (
        |  SELECT source, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY source) AS n
        |  FROM b) WHERE rn = (n + 1) // 2),
        |d AS (SELECT b.source, b.doc_id, abs(b.n_chars - m1.med) AS adev
        |      FROM b JOIN m1 ON m1.source = b.source),
        |m2 AS (SELECT source, adev AS mad, n FROM (
        |  SELECT source, doc_id, adev,
        |    row_number() OVER (PARTITION BY source ORDER BY adev, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY source) AS n
        |  FROM d) WHERE rn = (n + 1) // 2)
        |SELECT m2.source, CAST(m2.n AS BIGINT) AS n, m1.med AS median, m2.mad AS mad
        |FROM m2 JOIN m1 ON m1.source = m2.source""".stripMargin,

    "q_entropy" ->
      """WITH c AS (SELECT user_id, event_type AS t, count(*) AS c
        |           FROM events GROUP BY 1, 2),
        |g AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n,
        |        list(CAST(c AS DOUBLE) ORDER BY t) AS cs
        |      FROM c GROUP BY 1)
        |SELECT user_id, n,
        |  round(ln(CAST(n AS DOUBLE))
        |    - list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |        list_transform(cs, x -> x * ln(x))), (a, b) -> a + b)
        |      / CAST(n AS DOUBLE), 6) AS entropy
        |FROM g""".stripMargin,
    "q_quantile_bins" ->
      s"""WITH b AS (SELECT source, n_chars,
         |  ntile($QuantileBins) OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS bin
         |FROM documents)
         |SELECT source, CAST(bin AS BIGINT) AS bin, count(*) AS n,
         |  min(n_chars) AS lo, max(n_chars) AS hi
         |FROM b GROUP BY 1, 2""".stripMargin,

    "q_corr" ->
      """WITH m AS (SELECT count(*) AS n,
        |  sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx, sum(y * y) AS syy,
        |  sum(x * y) AS sxy
        |FROM (SELECT CAST(round(l_quantity * 10000) AS BIGINT) AS x,
        |        CAST(round(l_discount * 1000000) AS BIGINT) AS y FROM lineitem))
        |SELECT CAST(n AS BIGINT) AS n,
        |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |    * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r
        |FROM m""".stripMargin,

    "q_corr_matrix" -> {
      val cols = CorrMatrixCols
      val sel = cols.map { case (c, a, s) => s"CAST(round($c * $s) AS BIGINT) AS $a" }
        .mkString(", ")
      val sums = (cols.map { case (_, a, _) => s"sum($a) AS s_$a" } ++
        (for { i <- cols.indices; j <- i until cols.length } yield {
          val (ai, aj) = (cols(i)._2, cols(j)._2)
          s"sum($ai * $aj) AS s_${ai}_${aj}"
        })).mkString(", ")
      def r(a: String, b: String) =
        s"round((CAST(n AS DOUBLE) * CAST(s_${a}_${b} AS DOUBLE) - CAST(s_$a AS DOUBLE) * CAST(s_$b AS DOUBLE))" +
          s" / (sqrt(CAST(n AS DOUBLE) * CAST(s_${a}_${a} AS DOUBLE) - CAST(s_$a AS DOUBLE) * CAST(s_$a AS DOUBLE))" +
          s" * sqrt(CAST(n AS DOUBLE) * CAST(s_${b}_${b} AS DOUBLE) - CAST(s_$b AS DOUBLE) * CAST(s_$b AS DOUBLE))), 6)"
      val pairs =
        for { i <- cols.indices; j <- (i + 1) until cols.length }
          yield (cols(i)._2, cols(j)._2)
      s"WITH m AS (SELECT count(*) AS n, $sums FROM (SELECT $sel FROM lineitem))\n" +
        pairs.map { case (a, b) =>
          s"SELECT '$a' AS col_x, '$b' AS col_y, CAST(n AS BIGINT) AS n, ${r(a, b)} AS r FROM m"
        }.mkString("\nUNION ALL\n")
    },

    "q_mode" ->
      """WITH c AS (SELECT source, lang, count(*) AS n FROM documents GROUP BY 1, 2),
        |r AS (SELECT source, lang, n,
        |        row_number() OVER (PARTITION BY source ORDER BY n DESC, lang) AS rk
        |      FROM c)
        |SELECT source, lang AS mode, CAST(n AS BIGINT) AS n FROM r WHERE rk = 1""".stripMargin,

    "q_abtest" ->
      s"""WITH u AS (SELECT user_id, user_id % 2 AS grp,
        |  CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= $AbHeavyN
        |       THEN 1 ELSE 0 END AS converted
        |FROM events GROUP BY 1, 2),
        |g AS (SELECT grp, count(*) AS n, CAST(sum(converted) AS BIGINT) AS conv
        |      FROM u GROUP BY 1),
        |w AS (SELECT
        |  max(CASE WHEN grp = 0 THEN n END) AS n_a,
        |  max(CASE WHEN grp = 0 THEN conv END) AS conv_a,
        |  max(CASE WHEN grp = 1 THEN n END) AS n_b,
        |  max(CASE WHEN grp = 1 THEN conv END) AS conv_b
        |FROM g)
        |SELECT n_a, conv_a, n_b, conv_b,
        |  CASE WHEN conv_a + conv_b > 0 AND conv_a + conv_b < n_a + n_b THEN
        |  round((CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |    - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        |    / sqrt((CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
        |    * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
        |    * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))), 4) END AS z
        |FROM w""".stripMargin)
}
