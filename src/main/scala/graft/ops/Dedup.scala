package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Scale design (the point of this module): every signature (fingerprint,
  * minhash array, simhash) is computed MAP-ONLY with Catalyst higher-order
  * functions — no explode-then-regroup shuffle, no UDFs, fully codegen'd.
  * The only shuffles are the final candidate joins, which are:
  *   - exact: groupBy(md5) — one hash agg, combiner does the heavy lifting;
  *   - minhash/simhash: an equi-join on (band, signature) — the LSH trick
  *     that replaces the O(N²) all-pairs compare with a key-join whose
  *     fan-out is bounded by collision rate. This is THE 100 TB dedup shape
  *     (same as Spark's own MinHashLSH, reimplemented engine-portably so a
  *     DuckDB oracle can replay it bit-for-bit).
  *
  * All hashes derive from md5 hex prefixes (15 hex chars = 60-bit positive
  * longs) so the identical integers come out of any engine — no dependence on
  * Spark's Murmur3 `hash()` (which DuckDB lacks).
  */
object Dedup {

  /** 60-bit positive long from an md5 prefix — the engine-portable hash. */
  private def hashSql(e: String): String =
    s"cast(conv(substr(md5($e), 1, 15), 16, 10) as bigint)"

  /** Word 3-gram shingles of the normalized text (distinct). The docs share a
    * small vocabulary, so unigram sets are useless for dedup; 3-gram word
    * sequences discriminate (SURVEY §7.2 step 7).
    */
  private val shinglesSql: String =
    "array_distinct(transform(sequence(1, size(toks) - 2), " +
      "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1), ' ', element_at(toks, i + 2))))"

  private def withShingles(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("lang"), Text.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), col("lang"), expr(shinglesSql).as("shingles"))

  // --- exact ----------------------------------------------------------------

  /** Exact dedup: group identical normalized texts, keep the smallest doc_id.
    * One partial+final hash agg; the md5 key keeps shuffle rows tiny (16 bytes
    * + ids) regardless of document size — never shuffle the text itself.
    */
  def exact(docs: DataFrame): DataFrame =
    docs
      .select(md5(Text.normalized(col("text"))).as("fp"), col("doc_id"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  // --- MinHash + LSH --------------------------------------------------------

  val MinhashPerms = 16
  val MinhashBands = 4
  val MinhashRows = MinhashPerms / MinhashBands // 4

  /** 16 minhashes per doc: mh_i = min over shingles of hash(i ++ ":" ++ s).
    * Pure expression (nested transform/array_min) — map-only, codegen'd.
    */
  private val minhashArraySql: String =
    s"transform(sequence(0, ${MinhashPerms - 1}), " +
      s"i -> array_min(transform(shingles, s -> ${hashSql("concat(cast(i as string), ':', s)")})))"

  def minhashSignatures(docs: DataFrame): DataFrame =
    withShingles(docs).select(col("doc_id"), expr(minhashArraySql).as("mh"))

  /** LSH candidate pairs: band signature = the 4 minhashes of the band; a pair
    * is a candidate iff some band matches. Self-join on (band, sig) — the
    * shuffle key is 4 longs, and at 100 TB the join is a plain hash join whose
    * input is N×4 rows, not N² pairs. `est_jaccard` = fraction of the 16
    * minhashes that agree (the standard unbiased Jaccard estimate).
    */
  def minhashCandidates(docs: DataFrame): DataFrame = {
    val sigs = minhashSignatures(docs)
    val bands = sigs.select(
      col("doc_id"), col("mh"),
      explode(expr(s"transform(sequence(0, ${MinhashBands - 1}), " +
        s"b -> struct(b as band, slice(mh, b * $MinhashRows + 1, $MinhashRows) as sig))")).as("bs"))
      .select(col("doc_id"), col("mh"), col("bs.band"), col("bs.sig"))
    val a = bands.select(col("band"), col("sig"), col("doc_id").as("doc_a"), col("mh").as("mh_a"))
    val b = bands.select(col("band"), col("sig"), col("doc_id").as("doc_b"), col("mh").as("mh_b"))
    a.join(b, Seq("band", "sig"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("cast(size(filter(zip_with(mh_a, mh_b, (x, y) -> x = y), v -> v)) as double) / " +
          s"$MinhashPerms").as("est_jaccard"))
      .distinct()
  }

  // --- SimHash --------------------------------------------------------------

  /** 60-bit SimHash over the distinct token set: bit i is set iff the sum of
    * (±1 per token, sign = bit i of the token hash) is positive. Map-only
    * nested-lambda expression; integer math → engine-exact.
    */
  private val simhashSql: String = {
    val tokHashes = s"transform(array_distinct(toks), t -> ${hashSql("t")})"
    "aggregate(transform(sequence(0, 59), i -> " +
      s"CASE WHEN aggregate($tokHashes, 0L, (acc, h) -> acc + (shiftright(h, i) & 1) * 2 - 1) > 0 " +
      "THEN shiftleft(1L, i) ELSE 0L END), 0L, (acc, v) -> acc + v)"
  }

  def simhashes(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      .select(col("doc_id"), expr(simhashSql).as("simhash"))

  val SimhashMaxHamming = 1

  /** Near-dup pairs with hamming(simhash) <= 1, found by banded LSH: split the
    * 60 bits into 4 bands of 15; by pigeonhole, distance <= 1 pairs agree on
    * at least 3 bands, so joining on any single band finds them all. The join
    * key is one 15-bit chunk — again a key-join, never N².
    */
  def simhashPairs(docs: DataFrame): DataFrame = {
    val sh = simhashes(docs)
    val banded = sh.select(col("doc_id"), col("simhash"),
      explode(expr("transform(sequence(0, 3), b -> " +
        "struct(b as band, (shiftright(simhash, b * 15) & 32767) as chunk))")).as("bc"))
      .select(col("doc_id"), col("simhash"), col("bc.band"), col("bc.chunk"))
    val a = banded.select(col("band"), col("chunk"), col("doc_id").as("doc_a"), col("simhash").as("sh_a"))
    val b = banded.select(col("band"), col("chunk"), col("doc_id").as("doc_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("band", "chunk"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("bit_count(sh_a ^ sh_b)").cast("long").as("hamming"))
      .filter(col("hamming") <= SimhashMaxHamming)
      .distinct()
  }

  // --- exact n-gram Jaccard -------------------------------------------------

  val JaccardThreshold = 0.5

  /** True 3-gram-shingle Jaccard over same-language blocks; emits pairs above
    * threshold. This is the verification step a pipeline runs AFTER LSH
    * candidate generation; blocked on `lang` here to bound the pair count.
    * At real scale you'd feed `minhashCandidates` output instead of blocking —
    * the expression is the same. (AQE skew-join splits the big language
    * blocks at runtime.)
    */
  def ngramJaccardPairs(docs: DataFrame): DataFrame = {
    val sh = withShingles(docs)
    val a = sh.select(col("lang"), col("doc_id").as("doc_a"), col("shingles").as("sh_a"))
    val b = sh.select(col("lang"), col("doc_id").as("doc_b"), col("shingles").as("sh_b"))
    a.join(b, Seq("lang"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("cast(size(array_intersect(sh_a, sh_b)) as double) / " +
          "(size(sh_a) + size(sh_b) - size(array_intersect(sh_a, sh_b)))").as("jaccard"))
      .filter(col("jaccard") >= JaccardThreshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  // --- embedding cosine near-dup -------------------------------------------

  val CosineThreshold = 0.4

  /** Cosine computed with one fixed operation order (sequential fold over the
    * array, dot / (sqrt(na) * sqrt(nb))) in double precision, so any engine
    * reproduces the same IEEE result. Arrays are cast float→double FIRST —
    * multiplying in float then widening would differ.
    */
  private[ops] def cosineSql(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"aggregate(zip_with($x, $y, (p, q) -> p * q), cast(0.0 as double), (acc, v) -> acc + v)"
    s"${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"
  }

  /** Brute-force all-pairs cosine above threshold. Quadratic by design — the
    * correctness baseline for the LSH path (Similarity.scala); at bench scale
    * (2000 vectors) this is 4M codegen'd dot products. The broadcast of one
    * side keeps it shuffle-free.
    */
  def embeddingPairs(embs: DataFrame): DataFrame = {
    val e = embs.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val a = e.select(col("vec_id").as("vec_a"), col("v").as("va"))
    val b = e.select(col("vec_id").as("vec_b"), col("v").as("vb"))
    a.join(broadcast(b), col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"), expr(cosineSql("va", "vb")).as("cos"))
      .filter(col("cos") >= CosineThreshold)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 6).as("cos"))
  }

  // -------------------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_exact" -> ((s, d) => exact(Tables.documents(s, d))),
    "q_dedup_minhash" -> ((s, d) => minhashCandidates(Tables.documents(s, d))),
    "q_dedup_simhash" -> ((s, d) => simhashPairs(Tables.documents(s, d))),
    "q_dedup_ngram" -> ((s, d) => ngramJaccardPairs(Tables.documents(s, d))),
    "q_dedup_embedding" -> ((s, d) => embeddingPairs(Tables.embeddings(s, d))))

  // DuckDB mirrors. Shared fragments:
  private val normSql = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
  private val duckToks = s"string_split($normSql, ' ')"
  private def duckHash(e: String) = s"('0x' || substr(md5($e), 1, 15))::BIGINT"
  private val duckShingles =
    "list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] for i in range(1, len(toks) - 1)])"

  val oracleSql: Map[String, String] = Map(
    "q_dedup_exact" ->
      s"""SELECT md5($normSql) AS fp, min(doc_id) AS keep_id, count(*) AS n_copies
         |FROM documents GROUP BY 1""".stripMargin,

    "q_dedup_minhash" ->
      s"""WITH t AS (SELECT doc_id, $duckToks AS toks FROM documents),
         |sh AS (SELECT doc_id, $duckShingles AS shingles FROM t WHERE len(toks) >= 3),
         |mh AS (SELECT doc_id, i,
         |         min(${duckHash("i::VARCHAR || ':' || s")}) AS h
         |       FROM sh, unnest(shingles) u(s), range($MinhashPerms) r(i)
         |       GROUP BY doc_id, i),
         |sig AS (SELECT doc_id, i // $MinhashRows AS band,
         |          string_agg(h::VARCHAR, ',' ORDER BY i) AS sig
         |        FROM mh GROUP BY doc_id, i // $MinhashRows),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |         FROM sig a JOIN sig b ON a.band = b.band AND a.sig = b.sig
         |         WHERE a.doc_id < b.doc_id)
         |SELECT c.doc_a, c.doc_b,
         |  CAST(sum(CASE WHEN x.h = y.h THEN 1 ELSE 0 END) AS DOUBLE) / $MinhashPerms AS est_jaccard
         |FROM cand c JOIN mh x ON x.doc_id = c.doc_a JOIN mh y ON y.doc_id = c.doc_b AND y.i = x.i
         |GROUP BY c.doc_a, c.doc_b""".stripMargin,

    "q_dedup_simhash" ->
      s"""WITH t AS (SELECT doc_id, list_distinct($duckToks) AS toks FROM documents),
         |th AS (SELECT doc_id, ${duckHash("tok")} AS h FROM t, unnest(toks) u(tok)),
         |bits AS (SELECT doc_id, i,
         |           CASE WHEN sum(((h >> i) & 1) * 2 - 1) > 0 THEN (1::BIGINT << i) ELSE 0 END AS v
         |         FROM th, range(60) r(i) GROUP BY doc_id, i),
         |sh AS (SELECT doc_id, CAST(sum(v) AS BIGINT) AS simhash FROM bits GROUP BY doc_id)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= $SimhashMaxHamming""".stripMargin,

    "q_dedup_ngram" ->
      s"""WITH t AS (SELECT doc_id, lang, $duckToks AS toks FROM documents),
         |sh AS (SELECT doc_id, lang, $duckShingles AS shingles FROM t WHERE len(toks) >= 3),
         |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |        CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
         |          / (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))) AS jaccard
         |      FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, round(jaccard, 6) AS jaccard FROM p WHERE jaccard >= $JaccardThreshold""".stripMargin,

    "q_dedup_embedding" -> {
      val dot = "list_sum(list_transform(list_zip(a.v, b.v), z -> z[1] * z[2]))"
      val dotA = "list_sum(list_transform(list_zip(a.v, a.v), z -> z[1] * z[2]))"
      val dotB = "list_sum(list_transform(list_zip(b.v, b.v), z -> z[1] * z[2]))"
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |        $dot / (sqrt($dotA) * sqrt($dotB)) AS cos
         |      FROM e a JOIN e b ON a.vec_id < b.vec_id)
         |SELECT vec_a, vec_b, round(cos, 6) AS cos FROM p WHERE cos >= $CosineThreshold""".stripMargin
    })
}
