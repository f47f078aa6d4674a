package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level operators that close the gap between a cleaned document set
  * and a training run:
  *
  *   - sequence PACKING: the standard "concatenate then cut at the context
  *     length" layout — assign each document a pack id and offset within a
  *     fixed token budget, deterministically. Packing is inherently
  *     sequential, so the distributed shape is per-shard (here: per source)
  *     cumulative sums — each shard packs independently in parallel, which
  *     is exactly how a 100 TB corpus is packed in practice (per input
  *     shard/domain), and a plain window cumsum expresses it.
  *   - VOCABULARY building: term counts with rank and cumulative coverage —
  *     the tokenizer-training statistic. Heavy lifting is one partial+final
  *     aggregate over exploded tokens; the rank/coverage window runs over
  *     the (small) distinct-term set, not the corpus.
  *   - SOURCE OVERLAP matrix: pairwise shingle Jaccard between sources via
  *     an inverted-index equi-join on shingle hash — the corpus-level dedup
  *     diagnostic ("how much does crawl A duplicate crawl B"). No pair of
  *     sources is ever materialized against the full corpus; the join
  *     carries (shingle, source) ids only. At web scale a df-cut (drop
  *     shingles present in nearly every source) bounds the hot-key fan-out;
  *     with 20 synthetic sources the exact join is the oracle-checkable
  *     form.
  *
  * The reference has no corpus layer (its tables are streams); these extend
  * the SURVEY §6 pipeline inventory alongside Sampling/Curation.
  */
object Corpus {

  private def hashSql(e: String): String =
    s"cast(conv(substr(md5($e), 1, 15), 16, 10) as bigint)"

  private val shinglesSql: String =
    "array_distinct(transform(sequence(1, size(toks) - 2), " +
      "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1), ' ', element_at(toks, i + 2))))"

  /** Concat-then-cut packing of whole documents into `capacity`-token packs,
    * per `shardCol` shard in `orderCol` order: pack_id = which pack this
    * doc STARTS in, pack_offset = its token offset within the running
    * concatenation. Map-only except one per-shard window cumsum (shards
    * pack in parallel; the order column must be a total order per shard).
    */
  def packSequences(
      docs: DataFrame,
      capacity: Long,
      shardCol: String = "source",
      orderCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(col(shardCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(orderCol), col(shardCol),
        size(Text.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col(orderCol), col(shardCol), col("n_tokens"),
        // integral `div`, not `/`: the `/` operator is double division and a
        // shard cumsum past 2^53 tokens would lose exactness in the cast
        expr(s"(cum - n_tokens) div ${capacity}L").as("pack_id"),
        ((col("cum") - col("n_tokens")) % capacity).cast("long").as("pack_offset"))
  }

  /** Corpus vocabulary: top-k terms by count with rank (count DESC, term ASC
    * — engine-deterministic) and cumulative coverage of the token stream.
    * One partial+final agg over the corpus; the window ranks only distinct
    * terms.
    */
  def vocabulary(docs: DataFrame, topK: Int = 100): DataFrame = {
    val tf = docs
      .select(explode(Text.tokens(col("text"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
    // token mass over ALL terms (the coverage denominator) — computed before
    // the top-k trim, broadcast as a 1-row aggregate
    val total = tf.agg(sum(col("n")).as("tot"))
    // sort+limit compiles to TakeOrderedAndProject: each partition keeps its
    // local top-k and only k·partitions rows merge — never a global sort of
    // the distinct-term set. The rank/coverage window then runs over ≤ topK
    // rows (bounded by construction, not corpus-sized); cumulative coverage
    // at ranks ≤ k only ever sums top-k counts, so the trim is exact.
    val top = tf.orderBy(col("n").desc, col("term")).limit(topK)
    val w = Window.orderBy(col("n").desc, col("term"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    top.crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(Window.orderBy(col("n").desc, col("term"))).cast("long"))
      .withColumn("coverage", round(sum(col("n")).over(w).cast("double") / col("tot"), 6))
      .select(col("term"), col("n"), col("rank"), col("coverage"))
  }

  /** Pairwise source overlap: exact shingle-set Jaccard between every pair
    * of sources sharing at least one shingle. Inverted-index shape: distinct
    * (shingle, source) pairs self-join on the shingle hash — the shuffle
    * carries 8-byte hashes + source ids, never text, and per-source set
    * sizes come from one small aggregate joined back by source.
    */
  def sourceOverlap(docs: DataFrame): DataFrame = {
    val sh = docs
      .select(col("source"), Text.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("source"), explode(expr(s"transform($shinglesSql, s -> ${hashSql("s")})")).as("sh"))
      .distinct()
    val sizes = sh.groupBy(col("source")).agg(count(lit(1)).as("n_sh"))
    val a = sh.select(col("source").as("src_a"), col("sh"))
    val b = sh.select(col("source").as("src_b"), col("sh"))
    a.join(b, Seq("sh"))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(sizes.select(col("source").as("src_a"), col("n_sh").as("na")), Seq("src_a"))
      .join(sizes.select(col("source").as("src_b"), col("n_sh").as("nb")), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("n_shared"),
        round(col("n_shared").cast("double") / (col("na") + col("nb") - col("n_shared")), 6)
          .as("jaccard"))
  }

  val PackCapacity = 128L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pack_sequences" -> ((s, d) => packSequences(Tables.documents(s, d), PackCapacity)),
    "q_vocab" -> ((s, d) => vocabulary(Tables.documents(s, d))),
    "q_source_overlap" -> ((s, d) => sourceOverlap(Tables.documents(s, d))))

  private val normSql = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
  private val duckToks = s"string_split($normSql, ' ')"

  val oracleSql: Map[String, String] = Map(
    "q_pack_sequences" ->
      s"""WITH t AS (SELECT doc_id, source, len($duckToks) AS n_tokens FROM documents),
         |c AS (SELECT doc_id, source, n_tokens,
         |        sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
         |                            ROWS UNBOUNDED PRECEDING) AS cum
         |      FROM t)
         |SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
         |  CAST((cum - n_tokens) // $PackCapacity AS BIGINT) AS pack_id,
         |  CAST((cum - n_tokens) % $PackCapacity AS BIGINT) AS pack_offset
         |FROM c""".stripMargin,

    "q_vocab" ->
      s"""WITH t AS (SELECT unnest($duckToks) AS term FROM documents),
         |tf AS (SELECT term, count(*) AS n FROM t GROUP BY 1),
         |tot AS (SELECT sum(n) AS tot FROM tf),
         |r AS (SELECT term, n,
         |        row_number() OVER (ORDER BY n DESC, term) AS rank,
         |        sum(n) OVER (ORDER BY n DESC, term ROWS UNBOUNDED PRECEDING) AS cum
         |      FROM tf)
         |SELECT term, CAST(n AS BIGINT) AS n, CAST(rank AS BIGINT) AS rank,
         |  round(CAST(cum AS DOUBLE) / tot, 6) AS coverage
         |FROM r CROSS JOIN tot WHERE rank <= 100""".stripMargin,

    "q_source_overlap" ->
      s"""WITH t AS (SELECT source, $duckToks AS toks FROM documents),
         |shl AS (SELECT source,
         |          unnest([('0x' || substr(md5(g), 1, 15))::BIGINT
         |                  for g in list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
         |                                          for i in range(1, len(toks) - 1)])]) AS sh
         |        FROM t WHERE len(toks) >= 3),
         |sh AS (SELECT DISTINCT source, sh FROM shl),
         |sizes AS (SELECT source, count(*) AS n_sh FROM sh GROUP BY 1),
         |p AS (SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
         |      FROM sh a JOIN sh b ON a.sh = b.sh AND a.source < b.source
         |      GROUP BY 1, 2)
         |SELECT src_a, src_b, n_shared,
         |  round(CAST(n_shared AS DOUBLE) / (x.n_sh + y.n_sh - n_shared), 6) AS jaccard
         |FROM p JOIN sizes x ON x.source = p.src_a JOIN sizes y ON y.source = p.src_b""".stripMargin)
}
