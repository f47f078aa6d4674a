package graft.ops

import graft.Tables
import graft.functions.Aggregators
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Pinned.PinnedOps

/** Assembled pipelines + distributed-aggregation techniques that round out
  * the operator inventory:
  *
  *   - TC-compat aggregation quirks (SURVEY §7.3): the reference's `avg`
  *     divides by ALL rows including nulls (util/AggregationUtil.java:73-75)
  *     and `groupConcat` renders nulls as the literal string "null"
  *     (AggregationUtil.java:8-15). Kept OUT of the default functions,
  *     provided here as the compat layer.
  *   - a typed one-pass multi-output Aggregator (count/min/max struct) — the
  *     reference's multi-output agg UDF shape on Catalyst's partial+final
  *     machinery.
  *   - a two-phase salted aggregation: the standard skew-defense at 100 TB
  *     when one group key is hot — partial agg on (key, salt), final agg on
  *     key. Same result as the direct agg (the oracle IS the direct agg).
  *   - the assembled cleaning pipeline a training-data run executes: quality
  *     filter → exact dedup → survivor set. Each stage is a previously
  *     oracle-verified operator; this query verifies their composition.
  */
object Pipelines {

  /** avg-including-nulls + group_concat with literal "null", on a column
    * with injected nulls so the quirk is observable.
    */
  def tcQuirkAggs(nation: DataFrame): DataFrame = {
    val withNulls = nation.withColumn("name_n", nullif(col("n_name"), lit("FRANCE")))
    withNulls
      .groupBy(col("n_regionkey"))
      .agg(
        // TC avg: sum of non-null values / count of ALL rows
        round(sum(col("n_nationkey")).cast("double") / count(lit(1)), 6).as("avg_tc"),
        // TC groupConcat: nulls become the string "null"; sorted for determinism
        concat_ws(",", array_sort(collect_list(coalesce(col("name_n"), lit("null")))))
          .as("names_tc"))
  }

  /** One-pass typed Aggregator (count/min/max) applied per group, routed
    * through `functions.udaf` onto a DataFrame group-by: a normal
    * partial+final hash aggregate whose grouping key stays in Tungsten rows —
    * no per-row deserialization. (The `groupByKey(lambda)` spelling of the
    * same Aggregator is 18× slower because every row round-trips through the
    * Scala object encoder just to extract the key; kept below as the typed-
    * facade demonstration and cross-checked in PipelinesSpec.)
    */
  def typedStats(lineitem: DataFrame): DataFrame = {
    val statsU = udaf(Aggregators.stats)
    lineitem
      .groupBy(col("l_returnflag"))
      .agg(statsU(col("l_quantity")).as("s"))
      .select(col("l_returnflag"), col("s.n").as("n"),
        round(col("s.min"), 2).as("min_qty"), round(col("s.max"), 2).as("max_qty"))
  }

  /** The reference-style typed facade: same Aggregator via
    * `groupByKey(_.key)`. Compat-only — see `typedStats` for why the default
    * path avoids it.
    */
  def typedStatsGroupByKey(lineitem: DataFrame): DataFrame = {
    import lineitem.sparkSession.implicits._
    val ds = lineitem.select(col("l_returnflag").as("flag"), col("l_quantity").as("v"))
      .as[(String, Double)]
    ds.groupByKey(_._1)
      .mapValues(_._2)
      .agg(Aggregators.stats.toColumn.name("s"))
      .select(col("key").as("l_returnflag"), col("s.n").as("n"),
        round(col("s.min"), 2).as("min_qty"), round(col("s.max"), 2).as("max_qty"))
  }

  val SaltBuckets = 16

  /** Two-phase salted aggregation over the 5 hot event_type keys: phase 1
    * aggregates on (key, salt) — spreading each hot key over SaltBuckets
    * reducers — phase 2 merges partials. Result equals the direct
    * aggregation; only the shuffle layout differs.
    */
  def saltedAgg(events: DataFrame): DataFrame =
    events
      .withColumn("salt", pmod(col("event_id"), lit(SaltBuckets)))
      .groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("pn"), sum(col("value")).as("psum"))
      .groupBy(col("event_type"))
      .agg(sum(col("pn")).as("n"), round(sum(col("psum")), 2).as("sum_value"))

  /** quality filter → exact dedup → surviving doc ids. */
  def cleaningPipeline(docs: DataFrame): DataFrame = {
    val kept = Text.quality(docs).filter(col("verdict") === "keep").select(col("doc_id"))
    val keptDocs = docs.join(kept, Seq("doc_id"))
    Dedup.exact(keptDocs).select(col("keep_id").as("doc_id"), col("n_copies"))
  }

  /** The full corpus build as ONE lazy plan — what a training-data run
    * actually executes end-to-end: quality filter → exact dedup (keep lowest
    * id) → eval-set decontamination (drop docs sharing any 3-gram shingle
    * with the doc_id<20 benchmark, and the benchmark docs themselves) →
    * deterministic stratified sample to the target language mix. Every stage
    * is an independently oracle-verified operator; this query verifies the
    * composition, and because nothing materializes between stages Catalyst
    * fuses the map-side work and schedules one job.
    */
  val CorpusRates = Map("en" -> 0.5, "de" -> 1.0, "zh" -> 0.5, "fr" -> 1.0, "es" -> 0.25)

  /** One tokenized corpus projection feeding every pipeline branch. The
    * `pinned(eager = false)` (graft.Pinned) materializes (doc_id, lang, toks) the
    * first time any branch computes and caches it, so quality / dedup /
    * contamination / the final join all read ONE scan of `documents` instead
    * of four — at 100 TB a corpus build persists exactly this projection.
    * (Same lineage-cut idiom as the k-means trainer, Similarity.scala.)
    */
  private def tokenized(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"), Text.tokens(col("text")).as("toks"))
      .pinned(false)

  def corpusPipeline(docs: DataFrame): DataFrame = {
    val t = tokenized(docs)
    val kept = Text.qualityFromToks(t).filter(col("verdict") === "keep").select(col("doc_id"))
    val reps = Dedup.exactFromToks(t.join(kept, Seq("doc_id")))
      .select(col("keep_id").as("doc_id"))
    val contaminated = Curation.contaminationFromToks(t, Curation.BenchmarkFilter)
      .select(col("doc_id"))
    val clean = t.select(col("doc_id"), col("lang")).join(reps, Seq("doc_id"))
      .filter(not(expr(Curation.BenchmarkFilter)))
      .join(contaminated, Seq("doc_id"), "left_anti")
    Sampling.stratified(clean, "doc_id", "lang", CorpusRates)
      .select(col("doc_id"), col("lang"))
  }

  /** The corpus build with BOILERPLATE REMOVAL FIRST — the production C4
    * ordering: cut segments recurring across documents (cookie banners, nav
    * chrome, license footers) BEFORE quality scoring, dedup and
    * decontamination, because a page whose chrome dominates otherwise
    * scores, fingerprints and contaminates on its chrome, not its content.
    * `Curation.boilerplate`'s segment pass is the ONE scan of the raw text
    * (plus a column-pruned (doc_id, lang) read — no text); the cleaned text
    * is then tokenized ONCE into a checkpoint-pinned projection that feeds
    * quality / exact dedup / contamination / the final join, exactly
    * `corpusPipeline`'s shared-scan discipline shifted onto clean text. A
    * doc whose every segment is boilerplate survives to the quality gate
    * with empty text and is dropped there, not silently lost.
    */
  def corpusPipelineBoilerplate(docs: DataFrame): DataFrame = {
    val t = cleanTokenized(docs)
    val kept = Text.qualityFromToks(t).filter(col("verdict") === "keep").select(col("doc_id"))
    val reps = Dedup.exactFromToks(t.join(kept, Seq("doc_id")))
      .select(col("keep_id").as("doc_id"))
    val contaminated = Curation.contaminationFromToks(t, Curation.BenchmarkFilter)
      .select(col("doc_id"))
    val clean = t.select(col("doc_id"), col("lang")).join(reps, Seq("doc_id"))
      .filter(not(expr(Curation.BenchmarkFilter)))
      .join(contaminated, Seq("doc_id"), "left_anti")
    Sampling.stratified(clean, "doc_id", "lang", CorpusRates)
      .select(col("doc_id"), col("lang"))
  }

  /** The boilerplate-cleaned tokenized projection (doc_id, lang, toks):
    * segment-level boilerplate cut, then ONE tokenize of the cleaned text,
    * checkpoint-pinned for every downstream branch. Package-private so the
    * spec can assert its scan shape (raw text read once).
    */
  private[ops] def cleanTokenized(docs: DataFrame): DataFrame =
    cleanTokenizedPlan(docs).pinned(false)

  /** The un-checkpointed plan of `cleanTokenized`, separated so the spec can
    * assert its scan shape (the checkpoint would otherwise hide it behind an
    * ExistingRDD).
    */
  private[ops] def cleanTokenizedPlan(docs: DataFrame): DataFrame =
    Curation.boilerplate(docs)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .select(col("doc_id"), col("lang"), Text.tokens(col("clean_text")).as("toks"))

  /** The corpus build with NEAR-dedup: quality filter → exact dedup →
    * near-dup clustering (LSH-verified pairs → connected components, keep
    * the min-id representative per cluster) → decontamination → stratified
    * sample. This is the full reference dedup story ending in a TABLE, not a
    * pair list: exact copies collapse first (cheap, hash-only), then the
    * near-dup survivor set drops every non-representative cluster member.
    * All branches feed from the one tokenized projection.
    */
  def corpusPipelineNear(docs: DataFrame): DataFrame = {
    val t = tokenized(docs)
    val kept = Text.qualityFromToks(t).filter(col("verdict") === "keep").select(col("doc_id"))
    val keptT = t.join(kept, Seq("doc_id"))
    val reps = Dedup.exactFromToks(keptT).select(col("keep_id").as("doc_id"))
    val repsT = keptT.join(reps, Seq("doc_id"))
    val nearDropped = Dedup.nearDupMemberIdsFromToks(repsT)
    val contaminated = Curation.contaminationFromToks(t, Curation.BenchmarkFilter)
      .select(col("doc_id"))
    val clean = repsT.select(col("doc_id"), col("lang"))
      .join(nearDropped, Seq("doc_id"), "left_anti")
      .filter(not(expr(Curation.BenchmarkFilter)))
      .join(contaminated, Seq("doc_id"), "left_anti")
    Sampling.stratified(clean, "doc_id", "lang", CorpusRates)
      .select(col("doc_id"), col("lang"))
  }

  /** The corpus build carried all the way to the TRAINING LAYOUT, one lazy
    * plan: quality filter → exact dedup → decontamination → per-source token
    * budget (best docs first) → sequence packing. This is what actually
    * lands on disk before a training run — not a survivor list but a packed
    * (doc, pack_id, offset) layout. Every stage is an independently
    * oracle-verified operator; all selection branches feed from ONE
    * tokenized scan (the layout windows run over the already-small budgeted
    * set). Mixture reweighting (`Corpus.mixSources`) composes the same way
    * when the budget should follow target weights instead of uniform caps.
    */
  def trainPipeline(docs: DataFrame): DataFrame = {
    val t = docs.select(col("doc_id"), col("source"), Text.tokens(col("text")).as("toks"))
      .pinned(false)
    val kept = Text.qualityFromToks(t).filter(col("verdict") === "keep").select(col("doc_id"))
    val keptT = t.join(kept, Seq("doc_id"))
    val reps = Dedup.exactFromToks(keptT).select(col("keep_id").as("doc_id"))
    val contaminated = Curation.contaminationFromToks(t, Curation.BenchmarkFilter)
      .select(col("doc_id"))
    val clean = keptT.join(reps, Seq("doc_id"))
      .filter(not(expr(Curation.BenchmarkFilter)))
      .join(contaminated, Seq("doc_id"), "left_anti")
    val budgeted = Corpus.tokenBudgetFromToks(clean, Corpus.BudgetTokens)
    Corpus.packSequencesFromCounts(
      budgeted.select(col("doc_id"), col("source"), col("n_tokens")),
      Corpus.PackCapacity)
  }

  /** The SHUFFLED training layout — the last meter to the on-disk artifact:
    * per-source token budget (best docs first), then the seeded global
    * shuffle into hash-balanced shards, then concat-then-cut packing WITHIN
    * each shard in shard_pos order, so consecutive training sequences come
    * from pseudo-random documents (packing in doc order would feed the
    * model long runs of same-source text). All three stages are
    * independently oracle-verified operators; the composition is one lazy
    * plan whose only corpus-wide work is the budget scan — the shuffle and
    * packing run over the already-budgeted set (adaptive cumsum: window
    * locally, two-level at scale). Returns (doc_id, shard_id, shard_pos,
    * n_tokens, pack_id, pack_offset). Building this plan may run the
    * adaptive cumsum's small eager size probe (see `Corpus.packSequences`).
    */
  def shuffledTrainLayout(docs: DataFrame): DataFrame = {
    val budgeted = Corpus.tokenBudget(docs, Corpus.BudgetTokens)
      .select(col("doc_id"), col("n_tokens"))
    val sh = Corpus.shuffleShards(budgeted, Corpus.ShuffleShards, Corpus.ShuffleSeed)
    val counts = budgeted.join(sh, Seq("doc_id"))
    Corpus.shardedCumsum(counts, "n_tokens", "shard_id", Seq(col("shard_pos")), "cum")
      .select(col("doc_id"), col("shard_id"), col("shard_pos"), col("n_tokens"),
        expr(s"(cum - n_tokens) div ${Corpus.PackCapacity}L").as("pack_id"),
        ((col("cum") - col("n_tokens")) % Corpus.PackCapacity).cast("long").as("pack_offset"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pipeline_train" -> ((s, d) => trainPipeline(Tables.documents(s, d))),
    "q_pipeline_shuffled" -> ((s, d) => shuffledTrainLayout(Tables.documents(s, d))),
    "q_agg_tc_quirks" -> ((s, d) => tcQuirkAggs(Tables.nation(s, d))),
    "q_agg_typed" -> ((s, d) => typedStats(Tables.lineitem(s, d))),
    "q_agg_salted" -> ((s, d) => saltedAgg(Tables.events(s, d))),
    "q_pipeline_clean" -> ((s, d) => cleaningPipeline(Tables.documents(s, d))),
    "q_pipeline_corpus" -> ((s, d) => corpusPipeline(Tables.documents(s, d))),
    "q_pipeline_corpus_near" -> ((s, d) => corpusPipelineNear(Tables.documents(s, d))),
    "q_pipeline_boilerplate" -> ((s, d) => corpusPipelineBoilerplate(Tables.documents(s, d))))

  private val normSql = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"

  val oracleSql: Map[String, String] = Map(
    "q_pipeline_train" ->
      s"""WITH toks AS (SELECT doc_id, text, source, string_split($normSql, ' ') AS t FROM documents),
         |s AS (SELECT doc_id, text, source,
         |        len(t) AS n_tokens,
         |        round(CAST(len(list_filter(t, x -> x IN ('the', 'a', 'of', 'and', 'is', 'in', 'to'))) AS DOUBLE) / len(t), 6) AS stop_ratio,
         |        round(CAST(len(list_distinct(t)) AS DOUBLE) / len(t), 6) AS uniq_ratio
         |      FROM toks),
         |sc AS (SELECT doc_id, text, source, CAST(n_tokens AS BIGINT) AS n_tokens,
         |        CAST(floor((0.5 * least(1.0, CAST(n_tokens AS DOUBLE) / 80.0)
         |                    + 0.3 * least(1.0, stop_ratio * 5.0)
         |                    + 0.2 * uniq_ratio) * 1000000.0) AS BIGINT) AS quality_e6
         |      FROM s),
         |kept AS (SELECT * FROM sc WHERE quality_e6 >= 500000),
         |reps AS (SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5($normSql)),
         |sh AS (SELECT doc_id,
         |         unnest([('0x' || substr(md5(g), 1, 15))::BIGINT
         |                 for g in list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
         |                                         for i in range(1, len(t) - 1)])]) AS sh
         |       FROM toks WHERE len(t) >= 3),
         |bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id < 20),
         |contaminated AS (SELECT DISTINCT doc_id FROM sh JOIN bench USING (sh)
         |                 WHERE NOT (doc_id < 20)),
         |clean AS (SELECT k.doc_id, k.source, k.n_tokens, k.quality_e6
         |          FROM kept k JOIN reps USING (doc_id)
         |          WHERE NOT (doc_id < 20)
         |            AND doc_id NOT IN (SELECT doc_id FROM contaminated)),
         |b AS (SELECT *, CAST(sum(n_tokens) OVER (PARTITION BY source
         |        ORDER BY quality_e6 DESC, doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         |      FROM clean),
         |bud AS (SELECT doc_id, source, n_tokens FROM b WHERE cum <= ${Corpus.BudgetTokens}),
         |p AS (SELECT doc_id, source, n_tokens,
         |        CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
         |                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pcum
         |      FROM bud)
         |SELECT doc_id, source, n_tokens,
         |  CAST((pcum - n_tokens) // ${Corpus.PackCapacity} AS BIGINT) AS pack_id,
         |  CAST((pcum - n_tokens) % ${Corpus.PackCapacity} AS BIGINT) AS pack_offset
         |FROM p""".stripMargin,

    "q_pipeline_shuffled" -> {
      val stop = Text.stopwords.map(w => s"'$w'").mkString(", ")
      s"""WITH t AS (SELECT doc_id, source, string_split($normSql, ' ') AS tk FROM documents),
         |s AS (SELECT doc_id, source,
         |        len(tk) AS n_tokens,
         |        round(CAST(len(list_filter(tk, x -> x IN ($stop))) AS DOUBLE) / len(tk), 6) AS stop_ratio,
         |        round(CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk), 6) AS uniq_ratio
         |      FROM t),
         |q AS (SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
         |        CAST(floor((0.5 * least(1.0, CAST(n_tokens AS DOUBLE) / 80.0)
         |                    + 0.3 * least(1.0, stop_ratio * 5.0)
         |                    + 0.2 * uniq_ratio) * 1000000.0) AS BIGINT) AS quality_e6
         |      FROM s),
         |c AS (SELECT *, sum(n_tokens) OVER (PARTITION BY source
         |        ORDER BY quality_e6 DESC, doc_id ROWS UNBOUNDED PRECEDING) AS cum_b
         |      FROM q),
         |bud AS (SELECT doc_id, n_tokens FROM c WHERE cum_b <= ${Corpus.BudgetTokens}),
         |h AS (SELECT doc_id,
         |        ('0x' || substr(md5('${Corpus.ShuffleSeed}:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
         |      FROM bud),
         |r AS (SELECT b.doc_id, b.n_tokens,
         |        CAST(h.h % ${Corpus.ShuffleShards} AS BIGINT) AS shard_id,
         |        row_number() OVER (PARTITION BY h.h % ${Corpus.ShuffleShards}
         |                           ORDER BY h.h, b.doc_id) AS shard_pos
         |      FROM bud b JOIN h ON b.doc_id = h.doc_id),
         |p AS (SELECT *, sum(n_tokens) OVER (PARTITION BY shard_id ORDER BY shard_pos
         |                                    ROWS UNBOUNDED PRECEDING) AS cum
         |      FROM r)
         |SELECT doc_id, shard_id, CAST(shard_pos AS BIGINT) AS shard_pos, n_tokens,
         |  CAST((cum - n_tokens) // ${Corpus.PackCapacity} AS BIGINT) AS pack_id,
         |  CAST((cum - n_tokens) % ${Corpus.PackCapacity} AS BIGINT) AS pack_offset
         |FROM p""".stripMargin
    },

    "q_agg_tc_quirks" ->
      """SELECT n_regionkey,
        |  round(CAST(sum(n_nationkey) AS DOUBLE) / count(*), 6) AS avg_tc,
        |  array_to_string(list_sort(list(coalesce(nullif(n_name, 'FRANCE'), 'null'))), ',') AS names_tc
        |FROM nation GROUP BY n_regionkey""".stripMargin,

    "q_agg_typed" ->
      """SELECT l_returnflag, count(*) AS n,
        |round(min(l_quantity), 2) AS min_qty, round(max(l_quantity), 2) AS max_qty
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    // the oracle is the DIRECT aggregation — salting must not change results
    "q_agg_salted" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY event_type""".stripMargin,

    "q_pipeline_corpus" ->
      s"""WITH toks AS (SELECT doc_id, text, lang, string_split($normSql, ' ') AS t FROM documents),
         |s AS (SELECT doc_id, text, lang,
         |        len(t) AS n_tokens,
         |        round(CAST(len(list_filter(t, x -> x IN ('the', 'a', 'of', 'and', 'is', 'in', 'to'))) AS DOUBLE) / len(t), 6) AS stop_ratio,
         |        round(CAST(len(list_distinct(t)) AS DOUBLE) / len(t), 6) AS uniq_ratio
         |      FROM toks),
         |kept AS (SELECT doc_id, text FROM s
         |         WHERE 0.5 * least(1.0, CAST(n_tokens AS DOUBLE) / 80.0)
         |             + 0.3 * least(1.0, stop_ratio * 5.0)
         |             + 0.2 * uniq_ratio >= 0.5),
         |reps AS (SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5($normSql)),
         |sh AS (SELECT doc_id,
         |         unnest([('0x' || substr(md5(g), 1, 15))::BIGINT
         |                 for g in list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
         |                                         for i in range(1, len(t) - 1)])]) AS sh
         |       FROM toks WHERE len(t) >= 3),
         |bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id < 20),
         |contaminated AS (SELECT DISTINCT doc_id FROM sh JOIN bench USING (sh)
         |                 WHERE NOT (doc_id < 20))
         |SELECT d.doc_id, d.lang
         |FROM documents d JOIN reps USING (doc_id)
         |WHERE NOT (doc_id < 20)
         |  AND doc_id NOT IN (SELECT doc_id FROM contaminated)
         |  AND ('0x' || substr(md5('strat' || cast(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000
         |      < CASE lang WHEN 'en' THEN 500000 WHEN 'de' THEN 1000000
         |                  WHEN 'zh' THEN 500000 WHEN 'fr' THEN 1000000
         |                  WHEN 'es' THEN 250000 ELSE 0 END""".stripMargin,

    "q_pipeline_corpus_near" ->
      s"""WITH RECURSIVE perms AS (${Dedup.duckPerms}),
         |toks AS (SELECT doc_id, text, lang, string_split($normSql, ' ') AS t FROM documents),
         |s AS (SELECT doc_id, text, lang,
         |        len(t) AS n_tokens,
         |        round(CAST(len(list_filter(t, x -> x IN ('the', 'a', 'of', 'and', 'is', 'in', 'to'))) AS DOUBLE) / len(t), 6) AS stop_ratio,
         |        round(CAST(len(list_distinct(t)) AS DOUBLE) / len(t), 6) AS uniq_ratio
         |      FROM toks),
         |kept AS (SELECT doc_id, text FROM s
         |         WHERE 0.5 * least(1.0, CAST(n_tokens AS DOUBLE) / 80.0)
         |             + 0.3 * least(1.0, stop_ratio * 5.0)
         |             + 0.2 * uniq_ratio >= 0.5),
         |reps AS (SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5($normSql)),
         |repdocs AS (SELECT d.doc_id, d.text FROM documents d JOIN reps USING (doc_id)),
         |${Dedup.duckClusterCtes("repdocs", "_n")},
         |sh AS (SELECT doc_id,
         |         unnest([('0x' || substr(md5(g), 1, 15))::BIGINT
         |                 for g in list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
         |                                         for i in range(1, len(t) - 1)])]) AS sh
         |       FROM toks WHERE len(t) >= 3),
         |bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id < 20),
         |contaminated AS (SELECT DISTINCT doc_id FROM sh JOIN bench USING (sh)
         |                 WHERE NOT (doc_id < 20))
         |SELECT d.doc_id, d.lang
         |FROM documents d JOIN reps USING (doc_id)
         |WHERE d.doc_id NOT IN (SELECT doc_id FROM cc_n WHERE doc_id <> cluster_id)
         |  AND NOT (doc_id < 20)
         |  AND doc_id NOT IN (SELECT doc_id FROM contaminated)
         |  AND ('0x' || substr(md5('strat' || cast(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000
         |      < CASE lang WHEN 'en' THEN 500000 WHEN 'de' THEN 1000000
         |                  WHEN 'zh' THEN 500000 WHEN 'fr' THEN 1000000
         |                  WHEN 'es' THEN 250000 ELSE 0 END""".stripMargin,

    "q_pipeline_boilerplate" -> {
      val stop = Text.stopwords.map(w => s"'$w'").mkString(", ")
      s"""WITH f AS (SELECT doc_id,
         |             list_filter([trim(s) for s in string_split($normSql, '.')],
         |                         s -> s != '') AS fs
         |           FROM documents),
         |segs AS (SELECT doc_id, p.idx AS idx, p.seg AS seg,
         |           ('0x' || substr(md5(p.seg), 1, 15))::BIGINT AS h
         |         FROM (SELECT doc_id,
         |                 unnest([{'idx': i, 'seg': fs[i]} for i in range(1, len(fs) + 1)]) AS p
         |               FROM f)),
         |hot AS (SELECT h FROM (SELECT h, count(*) AS df
         |                       FROM (SELECT DISTINCT doc_id, h FROM segs) GROUP BY 1)
         |        WHERE df >= ${Curation.BoilerplateMinDf}),
         |cleaned AS (SELECT s.doc_id,
         |              coalesce(string_agg(CASE WHEN hot.h IS NULL THEN s.seg END, '. '
         |                                  ORDER BY s.idx), '') AS ctext
         |            FROM segs s LEFT JOIN hot ON s.h = hot.h GROUP BY 1),
         |ct AS (SELECT c.doc_id, d.lang,
         |         lower(trim(regexp_replace(ctext, '\\s+', ' ', 'g'))) AS ntext
         |       FROM cleaned c JOIN documents d USING (doc_id)),
         |tk AS (SELECT doc_id, lang, ntext, string_split(ntext, ' ') AS t FROM ct),
         |s AS (SELECT doc_id, lang, ntext,
         |        len(t) AS n_tokens,
         |        round(CAST(len(list_filter(t, x -> x IN ($stop))) AS DOUBLE) / len(t), 6) AS stop_ratio,
         |        round(CAST(len(list_distinct(t)) AS DOUBLE) / len(t), 6) AS uniq_ratio
         |      FROM tk),
         |kept AS (SELECT doc_id, lang, ntext FROM s
         |         WHERE 0.5 * least(1.0, CAST(n_tokens AS DOUBLE) / 80.0)
         |             + 0.3 * least(1.0, stop_ratio * 5.0)
         |             + 0.2 * uniq_ratio >= 0.5),
         |reps AS (SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(ntext)),
         |sh AS (SELECT doc_id,
         |         unnest([('0x' || substr(md5(g), 1, 15))::BIGINT
         |                 for g in list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
         |                                         for i in range(1, len(t) - 1)])]) AS sh
         |       FROM tk WHERE len(t) >= 3),
         |bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id < 20),
         |contaminated AS (SELECT DISTINCT doc_id FROM sh JOIN bench USING (sh)
         |                 WHERE NOT (doc_id < 20))
         |SELECT k.doc_id, k.lang
         |FROM kept k JOIN reps USING (doc_id)
         |WHERE NOT (doc_id < 20)
         |  AND doc_id NOT IN (SELECT doc_id FROM contaminated)
         |  AND ('0x' || substr(md5('strat' || cast(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000
         |      < CASE lang WHEN 'en' THEN 500000 WHEN 'de' THEN 1000000
         |                  WHEN 'zh' THEN 500000 WHEN 'fr' THEN 1000000
         |                  WHEN 'es' THEN 250000 ELSE 0 END""".stripMargin
    },

    "q_pipeline_clean" ->
      s"""WITH toks AS (SELECT doc_id, text, string_split($normSql, ' ') AS t FROM documents),
         |s AS (SELECT doc_id, text,
         |        len(t) AS n_tokens,
         |        round(CAST(len(list_filter(t, x -> x IN ('the', 'a', 'of', 'and', 'is', 'in', 'to'))) AS DOUBLE) / len(t), 6) AS stop_ratio,
         |        round(CAST(len(list_distinct(t)) AS DOUBLE) / len(t), 6) AS uniq_ratio
         |      FROM toks),
         |kept AS (SELECT doc_id, text FROM s
         |         WHERE 0.5 * least(1.0, CAST(n_tokens AS DOUBLE) / 80.0)
         |             + 0.3 * least(1.0, stop_ratio * 5.0)
         |             + 0.2 * uniq_ratio >= 0.5)
         |SELECT min(doc_id) AS doc_id, count(*) AS n_copies
         |FROM kept GROUP BY md5($normSql)""".stripMargin)
}
