package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`, 64-dim in the test tables).
  *
  * Two paths, as a 100 TB pipeline needs both:
  *   - `bruteTopK`: exact cosine top-k. The query set broadcasts; the corpus
  *     streams through a codegen'd dot product; per-query top-k is a
  *     row_number window over a tiny (|Q| keys) shuffle. This is the
  *     correctness baseline and the right plan whenever |Q| is small.
  *   - `lshTopK`: multi-table random-hyperplane LSH. Each vector gets L
  *     bucket codes (map-only expression); candidate generation is an
  *     equi-join on (table, code) — the corpus is hashed ONCE and the
  *     quadratic compare disappears. At scale the bucket join is a standard
  *     shuffle hash join; recall is tuned by (L, bits).
  *
  * Hyperplanes are deterministic: component c of plane j is ±1 by one bit of
  * md5(j ++ ":" ++ c) — reproducible in any engine, no RNG state. (±1
  * hyperplanes are standard sign-random-projection; E[cos of planted pairs]
  * is unaffected.)
  */
object Similarity {

  val QueryCount = 10 // query set = vec_id < 10
  val TopK = 5
  val LshTables = 4
  val LshBits = 6

  /** ±1 hyperplane component, shared with the oracle: bit 0 of the 60-bit
    * md5 hash of "j:c".
    */
  private def hpSql(j: String, c: String): String =
    s"((cast(conv(substr(md5(concat(cast($j as string), ':', cast($c as string))), 1, 15), 16, 10) as bigint) & 1) * 2 - 1)"

  /** Sequential-fold dot of a vector against hyperplane j (c = 0..63). */
  private def planeDotSql(v: String, j: String): String =
    s"aggregate(sequence(0, 63), cast(0.0 as double), (acc, c) -> acc + element_at($v, c + 1) * ${hpSql(j, "c")})"

  /** L bucket codes per vector: code_t = bits of sign(plane-dot) for planes
    * t*bits .. t*bits+bits-1. Map-only.
    */
  private val codesSql: String =
    s"transform(sequence(0, ${LshTables - 1}), t -> struct(t as tbl, " +
      s"aggregate(sequence(0, ${LshBits - 1}), 0L, (acc, b) -> acc + " +
      s"CASE WHEN ${planeDotSql("v", s"t * $LshBits + b")} > 0 THEN shiftleft(1L, b) ELSE 0L END) as code))"

  private def vecs(embs: DataFrame): DataFrame =
    embs.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** Exact cosine top-k for each query vector. */
  def bruteTopK(embs: DataFrame): DataFrame = {
    val e = vecs(embs)
    val q = e.filter(col("vec_id") < QueryCount)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    e.select(col("vec_id").as("n_id"), col("v").as("nv"))
      .join(broadcast(q), col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"), expr(Dedup.cosineSql("qv", "nv")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("q_id"), col("rank").cast("long").as("rank"), col("n_id"),
        round(col("cos"), 6).as("cos"))
  }

  /** LSH-bucketed approximate top-k: candidates = corpus vectors sharing any
    * (table, code) bucket with the query, ranked by exact cosine within the
    * candidate set. Recall vs `bruteTopK` is asserted in SimilaritySpec.
    */
  def lshTopK(embs: DataFrame): DataFrame = {
    val coded = vecs(embs)
      .select(col("vec_id"), col("v"), explode(expr(codesSql)).as("tc"))
      .select(col("vec_id"), col("v"), col("tc.tbl"), col("tc.code"))
    val q = coded.filter(col("vec_id") < QueryCount)
      .select(col("tbl"), col("code"), col("vec_id").as("q_id"), col("v").as("qv"))
    val c = coded.select(col("tbl"), col("code"), col("vec_id").as("n_id"), col("v").as("nv"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    q.join(c, Seq("tbl", "code"))
      .filter(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"), col("qv"), col("nv")).distinct()
      .select(col("q_id"), col("n_id"), expr(Dedup.cosineSql("qv", "nv")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("q_id"), col("rank").cast("long").as("rank"), col("n_id"),
        round(col("cos"), 6).as("cos"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_knn_brute" -> ((s, d) => bruteTopK(Tables.embeddings(s, d))),
    "q_knn_lsh" -> ((s, d) => lshTopK(Tables.embeddings(s, d))))

  // DuckDB mirrors — identical hyperplanes, identical fold order.
  private def duckHp(j: String, c: String) =
    s"((('0x' || substr(md5(($j)::VARCHAR || ':' || ($c)::VARCHAR), 1, 15))::BIGINT & 1) * 2 - 1)"
  private def duckPlaneDot(v: String, j: String) =
    s"list_sum([$v[c + 1] * ${duckHp(j, "c")} for c in range(0, 64)])"
  private val duckDot = "list_sum([qv[i] * nv[i] for i in range(1, 65)])"
  private val duckNormQ = "list_sum([qv[i] * qv[i] for i in range(1, 65)])"
  private val duckNormN = "list_sum([nv[i] * nv[i] for i in range(1, 65)])"
  private val duckCos = s"$duckDot / (sqrt($duckNormQ) * sqrt($duckNormN))"

  val oracleSql: Map[String, String] = Map(
    "q_knn_brute" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |p AS (SELECT q.vec_id AS q_id, n.vec_id AS n_id, q.v AS qv, n.v AS nv
         |      FROM e q JOIN e n ON q.vec_id < $QueryCount AND n.vec_id != q.vec_id),
         |s AS (SELECT q_id, n_id, $duckCos AS cos FROM p),
         |r AS (SELECT q_id, n_id, cos,
         |        row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
         |      FROM s)
         |SELECT q_id, CAST(rank AS BIGINT) AS rank, n_id, round(cos, 6) AS cos
         |FROM r WHERE rank <= $TopK""".stripMargin,

    "q_knn_lsh" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |coded AS (SELECT vec_id, v, t.tbl,
         |            CAST(list_sum([CASE WHEN ${duckPlaneDot("v", s"t.tbl * $LshBits + b")} > 0
         |                  THEN (1::BIGINT << b) ELSE 0 END for b in range(0, $LshBits)]) AS BIGINT) AS code
         |          FROM e, (SELECT unnest(range($LshTables)) AS tbl) t),
         |q AS (SELECT tbl, code, vec_id AS q_id, v AS qv FROM coded WHERE vec_id < $QueryCount),
         |c AS (SELECT tbl, code, vec_id AS n_id, v AS nv FROM coded),
         |cand AS (SELECT DISTINCT q_id, n_id, qv, nv
         |         FROM q JOIN c ON q.tbl = c.tbl AND q.code = c.code AND c.n_id != q.q_id),
         |s AS (SELECT q_id, n_id, $duckCos AS cos FROM cand),
         |r AS (SELECT q_id, n_id, cos,
         |        row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
         |      FROM s)
         |SELECT q_id, CAST(rank AS BIGINT) AS rank, n_id, round(cos, 6) AS cos
         |FROM r WHERE rank <= $TopK""".stripMargin)
}
