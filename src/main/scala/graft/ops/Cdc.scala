package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Changelog compaction — turning an append-only stream of per-entity change
  * records into (a) the latest-state snapshot and (b) the full SCD-2 version
  * history. The standard shapes between a CDC feed (Debezium, binlog) and an
  * analytics-ready table; the reference's closest capability is the pinned
  * dimension snapshot + refresh (sp/dimension/RdsDimensionTable.java:41-108),
  * which consumes exactly the snapshot this operator produces.
  *
  * Scale notes (100 TB changelog):
  *   - `latestSnapshot` is a `max_by(payload, ord)` aggregate, not a
  *     row_number window: PARTIAL aggregation folds each map task's rows to
  *     one row per key BEFORE the shuffle, so a hot entity with 10^9 updates
  *     ships one row per upstream partition, not 10^9 rows to one reducer —
  *     the window spelling would shuffle and sort the full log. (Struct
  *     buffers make it a SortAggregate — the map-side sort is by the
  *     grouping key only; the partial-before-exchange property is the one
  *     that matters and is locked by CdcSpec.) Deterministic because `ord`
  *     is a struct containing a unique tie-break column.
  *   - `scd2` genuinely needs per-key ordering (each version's end is the
  *     next version's start), so it is the honest one-shuffle sort window;
  *     version counts per entity are bounded by the entity's own change
  *     rate, not corpus size, so skew is structural, not adversarial.
  */
object Cdc {

  /** Latest row per key group, ordered by `ordering` (last element must make
    * the struct unique). Tombstone rows (`isDelete` true on the WINNING row)
    * delete the entity from the snapshot — matching changelog semantics where
    * a delete beats every earlier update but can itself be superseded.
    */
  def latestSnapshot(
      changes: DataFrame,
      keys: Seq[String],
      ordering: Seq[String],
      isDelete: Option[Column] = None): DataFrame = {
    val payload = struct(changes.columns.map(col).toSeq: _*)
    val ord = struct(ordering.map(col): _*)
    val latest = changes
      .groupBy(keys.map(col): _*)
      .agg(max_by(payload, ord).as("__latest"))
      .select(col("__latest.*"))
    isDelete.map(d => latest.filter(!d)).getOrElse(latest)
  }

  /** SCD-2 interval table: every change becomes a version effective
    * [`tsCol`, next change's `tsCol`), the open-ended latest version flagged
    * `is_current`. `tiebreak` orders simultaneous changes (and must be
    * unique within (keys, tsCol)).
    */
  def scd2(
      changes: DataFrame,
      keys: Seq[String],
      tsCol: String,
      tiebreak: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col(tiebreak))
    changes
      .withColumn("effective_from", col(tsCol))
      .withColumn("effective_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("effective_to").isNull)
  }

  // value is an arbitrary double: floor of the bit-identical scaled double
  // (the quality_e6 convention), never round(), which half-rounds
  // differently across engines.
  private val valC = "CAST(floor(value * 100) AS BIGINT)"

  /** Snapshot reconciliation: classify every key across two table versions
    * as added / removed / changed (unchanged rows are dropped — at 100 TB
    * the diff IS the output, and it is usually tiny relative to the
    * snapshots). One full-outer sort-merge join on the key; payload equality
    * compares an md5 over the concatenated payload columns computed
    * MAP-SIDE on each leg, so the join carries (key, 32-byte digest), never
    * the payloads — the standard shape for petabyte reconciliation jobs
    * (and the inverse companion of `latestSnapshot`, which builds what this
    * audits).
    */
  def tableDiff(a: DataFrame, b: DataFrame, key: String, payload: Seq[String]): DataFrame = {
    def digest(df: DataFrame) =
      df.select(col(key),
        md5(concat_ws("", payload.map(c => col(c).cast("string")): _*)).as("fp"))
    val la = digest(a).withColumnRenamed("fp", "fp_a")
    val lb = digest(b).withColumnRenamed("fp", "fp_b")
    la.join(lb, Seq(key), "full_outer")
      .withColumn("change",
        when(col("fp_a").isNull, lit("added"))
          .when(col("fp_b").isNull, lit("removed"))
          .when(col("fp_a") =!= col("fp_b"), lit("changed")))
      .filter(col("change").isNotNull)
      .select(col(key), col("change"))
  }

  /** The demo mutation for `q_table_diff`: version B of the documents table
    * derived deterministically — doc_id % 13 == 0 deleted, % 7 == 0 edited
    * (text suffixed), % 11 == 0 duplicated under key+10^9 (the "added"
    * rows). Both engines derive B from the same parquet A.
    */
  private[ops] def mutatedDocs(docs: DataFrame): DataFrame = {
    val survivors = docs.filter(col("doc_id") % 13 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
    val added = docs.filter(col("doc_id") % 11 === 0)
      .select((col("doc_id") + 1000000000L).as("doc_id"), col("text"))
    survivors.union(added)
  }

  /** Additive daily rollup of the event stream — the materialized aggregate
    * `mergeRollup` maintains. Exact integer cells: (count, Σ value·e4).
    */
  def rollup(events: DataFrame): DataFrame =
    events
      .select(expr("__time__ div 86400000").as("day"), col("event_type"),
        expr("cast(round(value * 10000) as bigint)").as("v"))
      .groupBy(col("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v_e4"))

  /** Incremental view maintenance of an additive rollup: yesterday's
    * materialized cells + a rollup of ONLY the new increment, merged by
    * re-aggregating the partials — exactly the mergeable-state property that
    * lets a 100 TB history never be rescanned (the refresh cost is the
    * increment plus the CELL table, day×type-sized, not history-sized).
    * Correct because every cell statistic is a semigroup fold (counts and
    * exact integer sums re-add; avg/variance would first be decomposed into
    * these same moments). The driver oracle recomputes the rollup from the
    * full log — merge == full recompute IS the IVM contract, checked on
    * every run.
    */
  def mergeRollup(state: DataFrame, delta: DataFrame): DataFrame =
    state.union(delta)
      .groupBy(col("day"), col("event_type"))
      .agg(sum(col("n")).as("n"), sum(col("sum_v_e4")).as("sum_v_e4"))

  /** Increment boundary for `q_rollup_incr`: the last week of the event
    * window (epoch days; the generator's range is 19723..19752 at every sf).
    */
  val RollupSplitDay = 19745L

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_rollup_incr" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val day = expr("__time__ div 86400000")
      mergeRollup(
        rollup(ev.filter(day <= RollupSplitDay)),
        rollup(ev.filter(day > RollupSplitDay)))
    }),
    "q_table_diff" -> ((s, d) => {
      val a = Tables.documents(s, d).select(col("doc_id"), col("text"))
      tableDiff(a, mutatedDocs(a), "doc_id", Seq("text"))
    }),
    // events as a user-state changelog: 'error' rows are tombstones
    "q_cdc_latest" -> ((s, d) =>
      latestSnapshot(
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("value"), col("__time__")),
        keys = Seq("user_id"),
        ordering = Seq("__time__", "event_id"),
        isDelete = Some(col("event_type") === "error"))
        .select(col("user_id"), col("event_id"), col("event_type"),
          expr(valC).as("value_c"), col("__time__"))),

    "q_cdc_scd2" -> ((s, d) =>
      scd2(
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("value"), col("__time__")),
        keys = Seq("user_id"),
        tsCol = "__time__",
        tiebreak = "event_id")
        .select(col("user_id"), col("event_id"), col("event_type"),
          expr(valC).as("value_c"),
          col("effective_from"), col("effective_to"), col("is_current"))))

  def oracleSql: Map[String, String] = Map(
    // full recompute from the raw log — the merge must equal it exactly
    "q_rollup_incr" ->
      """SELECT epoch_ms(ts) // 86400000 AS day, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS sum_v_e4
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_table_diff" ->
      """WITH a AS (SELECT doc_id, text FROM documents),
        |b AS (SELECT doc_id,
        |        CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
        |      FROM a WHERE doc_id % 13 <> 0
        |      UNION ALL
        |      SELECT doc_id + 1000000000, text FROM a WHERE doc_id % 11 = 0),
        |j AS (SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
        |        md5(CAST(a.text AS VARCHAR)) AS fp_a, md5(CAST(b.text AS VARCHAR)) AS fp_b,
        |        a.doc_id IS NULL AS no_a, b.doc_id IS NULL AS no_b
        |      FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
        |SELECT doc_id,
        |  CASE WHEN no_a THEN 'added' WHEN no_b THEN 'removed'
        |       WHEN fp_a <> fp_b THEN 'changed' END AS change
        |FROM j
        |WHERE no_a OR no_b OR fp_a <> fp_b""".stripMargin,
    "q_cdc_latest" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type, value,
         |             epoch_ms(ts) AS __time__ FROM events),
         |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
         |        ORDER BY __time__ DESC, event_id DESC) AS rn FROM e)
         |SELECT user_id, event_id, event_type, $valC AS value_c, __time__
         |FROM r WHERE rn = 1 AND event_type <> 'error'""".stripMargin,

    "q_cdc_scd2" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type, value,
         |             epoch_ms(ts) AS __time__ FROM events)
         |SELECT user_id, event_id, event_type, $valC AS value_c,
         |  __time__ AS effective_from,
         |  lead(__time__) OVER (PARTITION BY user_id
         |    ORDER BY __time__, event_id) AS effective_to,
         |  lead(__time__) OVER (PARTITION BY user_id
         |    ORDER BY __time__, event_id) IS NULL AS is_current
         |FROM e""".stripMargin)
}
