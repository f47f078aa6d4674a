package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hot-key split join — the manual skew mitigation for shuffle joins.
  *
  * A shuffle join hash-partitions both sides by the join key, so one hot
  * key (a viral document's domain, a default user id, a null-ish sentinel)
  * lands its entire fact-side volume on ONE reducer: at 100 TB that task
  * runs for hours while 999 executors idle. AQE's skew-join handles the
  * sort-merge case when statistics see it, but only after the skewed
  * shuffle files are already written; the split-union form avoids writing
  * them at all, works for any join the planner picks, and is the shape to
  * reach for when the hot keys are known or cheaply measurable.
  *
  * Shape: a stats pass finds the top-`hotK` fact-side keys (a partial-
  * aggregated count — only (key, count) pairs shuffle, never rows). Fact
  * rows splitting:
  *   - HOT rows (left-semi vs the broadcast hot set) join against the hot
  *     slice of the dim side via BROADCAST — no shuffle touches the skewed
  *     volume, it streams map-side through the hash table.
  *   - COLD rows (left-anti) take the ordinary shuffle join, now with a
  *     bounded per-key volume.
  * The union is exactly the inner join: the split is correctness-preserving
  * for ANY hot set (hot and cold fact rows partition the fact table, and
  * each row can only match its own key's dim rows), so stale or sampled
  * stats cost performance, never rows — at 100 TB substitute a seeded
  * `fact.sample` or prior table stats for the full count.
  *
  * The reference relies on its rehash exchange for key distribution
  * (sp/StreamProcessing.java:136-163 rebalance/rehash) and has no skew
  * counter-measure; this is the Spark-first extension of that exchange
  * layer, same family as the salted aggregation (`q_agg_salted`).
  */
object Skew {

  /** Inner equi-join of `fact` with `dim` on `factKey == dimKey`, executed
    * as hot-broadcast ∪ cold-shuffle. Output columns: all fact columns ++
    * all dim columns except `dimKey` (merged into the fact key, as after an
    * ordinary `join(..., Seq(key))`).
    */
  def skewSplitJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      hotK: Int): DataFrame = {
    require(hotK > 0, "hotK must be positive")
    val hk = "__hot_key"
    // Stats pass: top-K keys by fact-side frequency, deterministic tie-break
    // on the key. Tiny result (hotK rows) — safe to broadcast.
    val hot = fact.groupBy(col(factKey)).agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col(factKey))
      .limit(hotK)
      .select(col(factKey).as(hk))
    val factHot = fact.join(broadcast(hot), col(factKey) === col(hk), "left_semi")
    val factCold = fact.join(broadcast(hot), col(factKey) === col(hk), "left_anti")
    val dimHot = dim.join(broadcast(hot), col(dimKey) === col(hk), "left_semi")
    val dimCols = dim.columns.filter(_ != dimKey).map(col).toSeq
    def out(joined: DataFrame): DataFrame =
      joined.select(fact.columns.map(col).toSeq ++ dimCols: _*)
    // Hot path: broadcast the hot dim slice — the skewed volume never
    // shuffles. Cold path: pinned to sort-merge (at scale the dim side
    // exceeds the broadcast threshold; the hint keeps the demonstrated plan
    // honest where a small test dim would otherwise auto-broadcast).
    val hotJoined = factHot.join(broadcast(dimHot), col(factKey) === col(dimKey))
    val coldJoined = factCold.join(dim.hint("shuffle_merge"), col(factKey) === col(dimKey))
    out(hotJoined).unionByName(out(coldJoined))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_skew" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      skewSplitJoin(o, c, "o_custkey", "c_custkey", 100)
        .select(col("o_orderkey"), col("o_custkey"), col("c_name"),
          round(col("o_totalprice"), 2).as("total"))
    }))

  // The oracle is the PLAIN inner join — the split must be invisible in the
  // result, that is the operator's contract.
  def oracleSql: Map[String, String] = Map(
    "q_join_skew" ->
      """SELECT o_orderkey, o_custkey, c_name, round(o_totalprice, 2) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey""".stripMargin)
}
