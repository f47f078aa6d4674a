package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Record linkage: fuzzy key matching with blocking — find distinct key
  * values that are small edit distances apart (entity-resolution candidates,
  * catalog-title dedup, near-identical URL/author normalization).
  *
  * Capability context: the reference joins only on equality or theta
  * predicates (table/Table.java:419-470); approximate string matching is
  * absent. It is a standard curation need (merge "acme corp" / "acme corp.")
  * and the classical scalable shape is block-then-verify (Fellegi–Sunter
  * linkage; same candidate-pruning idea as LSH-verify in `Dedup`).
  *
  * Scale shape (the 100 TB argument):
  *   1. REDUCE TO THE KEY DOMAIN first: one partial+final hash agg collapses
  *      the corpus to (distinct key, support count). Linkage cost is then a
  *      function of vocabulary size, not row count — a 10^11-row table with
  *      10^6 distinct names costs one agg plus a 10^6-row linkage phase.
  *   2. BLOCK: keys shuffle once on a cheap blocking key (last token — the
  *      head noun in "red widget"-style names). Pairs form only within a
  *      block, never across the full domain.
  *   3. VERIFY with the edit-distance kernel, short-circuited at the
  *      threshold (Spark's 3-arg `levenshtein` abandons a row once the
  *      running distance exceeds `maxDist` — O(d·min(len)) per pair, not
  *      O(len²)).
  *   A pathological block (every key sharing one noun) degrades to |block|²
  *   comparisons of cheap bounded kernels — the same documented trade as
  *   LSH hot buckets, and the `blk` column is exposed so callers can salt
  *   or cap hot blocks.
  *
  * Determinism: edit distance is exact integer; pair orientation is fixed by
  * `name_a < name_b`; no doubles anywhere.
  */
object Linkage {

  val FuzzyMaxDist = 5

  /** Blocking key: the last whitespace token of the normalized key. */
  private def blockKey(c: Column): Column = element_at(split(c, " "), -1)

  /** Fuzzy self-linkage of a key column: distinct-key extraction → block →
    * bounded-edit-distance verify. Output: one row per unordered candidate
    * pair with the distance and both support counts.
    */
  def fuzzyJoin(rows: DataFrame, keyCol: String, maxDist: Int = FuzzyMaxDist): DataFrame = {
    val keys = rows
      .groupBy(Text.normalized(col(keyCol)).as("name"))
      .agg(count(lit(1)).as("n"))
      .withColumn("blk", blockKey(col("name")))
    val a = keys.select(col("blk"), col("name").as("name_a"), col("n").as("n_a"))
    val b = keys.select(col("blk"), col("name").as("name_b"), col("n").as("n_b"))
    a.join(b, Seq("blk"))
      .filter(col("name_a") < col("name_b"))
      // 3-arg levenshtein: returns -1 once the running distance exceeds
      // maxDist — the per-pair kernel is threshold-bounded
      .withColumn("dist", levenshtein(col("name_a"), col("name_b"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("name_a"), col("name_b"), col("dist").cast("long").as("dist"),
        col("n_a"), col("n_b"))
  }

  /** Exact-recall edit-distance-1 self-join of a key domain — the FastSS /
    * deletion-neighborhood trick (Bocek et al. 2007; the same index powers
    * SymSpell): every key emits itself plus its |s| single-deletion
    * variants, and ANY two keys at distance 1 must share a variant
    * (substitution → same deletion position; insert/delete → one IS the
    * other's variant), so the candidate equi-join on the variant key misses
    * NOTHING — unlike `fuzzyJoin`'s last-token blocking, which silently
    * drops pairs whose typo sits in the blocking token itself ("blue bolt"
    * / "blue belt" land in different blocks; this join finds them — spec'd).
    * Variant collisions can reach distance 2 (two different-position
    * deletions agreeing), so pairs are verified with the threshold-bounded
    * levenshtein kernel.
    *
    * Scale shape: REDUCE TO THE KEY DOMAIN first (`fuzzyJoin`'s step 1 —
    * cost is vocabulary-sized, never corpus-sized), then a fan of |s|+1
    * variant rows per key, bounded by key length; the only shuffle keys are
    * the variants themselves. Hot variants come from very short keys (all
    * 1-char keys share the "" variant) — the caller's key domain sets that
    * floor, and the distinct-pair collapse runs BEFORE the levenshtein
    * verify so each candidate pair pays the kernel once.
    */
  def typoJoin(rows: DataFrame, keyCol: String): DataFrame = {
    val keys = rows
      .groupBy(Text.normalized(col(keyCol)).as("name"))
      .agg(count(lit(1)).as("n"))
    val variants = keys.select(col("name"), col("n"), explode(concat(
      array(col("name")),
      expr("transform(sequence(1, length(name)), " +
        "i -> concat(substring(name, 1, i - 1), substring(name, i + 1)))"))).as("v"))
      .distinct() // a key with repeated letters emits duplicate variants
    val a = variants.select(col("v"), col("name").as("name_a"), col("n").as("n_a"))
    val b = variants.select(col("v"), col("name").as("name_b"), col("n").as("n_b"))
    a.join(b, Seq("v"))
      .filter(col("name_a") < col("name_b"))
      .select(col("name_a"), col("name_b"), col("n_a"), col("n_b")).distinct()
      .withColumn("dist", levenshtein(col("name_a"), col("name_b"), 1))
      .filter(col("dist") === 1)
      .select(col("name_a"), col("name_b"), col("dist").cast("long").as("dist"),
        col("n_a"), col("n_b"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_fuzzy" -> ((s, d) => fuzzyJoin(Tables.part(s, d), "p_name")),
    "q_join_typos" -> ((s, d) => typoJoin(Tables.part(s, d), "p_name")))

  private def norm(c: String) = s"lower(trim(regexp_replace($c, '\\s+', ' ', 'g')))"

  val oracleSql: Map[String, String] = Map(
    "q_join_fuzzy" ->
      s"""WITH keys AS (SELECT ${norm("p_name")} AS name, count(*) AS n FROM part GROUP BY 1),
         |b AS (SELECT name, n, string_split(name, ' ')[-1] AS blk FROM keys)
         |SELECT a.name AS name_a, b.name AS name_b,
         |  CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist,
         |  a.n AS n_a, b.n AS n_b
         |FROM b a JOIN b b ON a.blk = b.blk AND a.name < b.name
         |WHERE levenshtein(a.name, b.name) <= $FuzzyMaxDist""".stripMargin,

    "q_join_typos" ->
      s"""WITH keys AS (SELECT ${norm("p_name")} AS name, count(*) AS n
         |              FROM part GROUP BY 1),
         |vs AS (SELECT DISTINCT name, n, unnest(list_prepend(name,
         |         [name[1:i-1] || name[i+1:] for i in range(1, len(name) + 1)])) AS v
         |       FROM keys),
         |cand AS (SELECT DISTINCT a.name AS name_a, b.name AS name_b,
         |                a.n AS n_a, b.n AS n_b
         |         FROM vs a JOIN vs b ON a.v = b.v AND a.name < b.name)
         |SELECT name_a, name_b, CAST(1 AS BIGINT) AS dist, n_a, n_b
         |FROM cand WHERE levenshtein(name_a, name_b) = 1""".stripMargin)
}
