package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed BPE (byte-pair-encoding) merge learning — the vocabulary-
  * training step of an LLM tokenizer (Sennrich et al. 2016), run over the
  * corpus the engine curates. The reference has no tokenizer machinery; this
  * extends the corpus-diagnostics layer (`q_vocab` counts whole words; BPE
  * learns the subword inventory).
  *
  * Scale shape (the part that must survive 100 TB): the ONLY corpus-sized
  * operation is the first word-frequency aggregate — a partial-aggregated
  * groupBy whose output is the distinct-word table (vocabulary-sized, ~10^6
  * rows for a trillion-token corpus, thousands of times smaller than the
  * corpus). Merge learning then iterates on that pinned table: each round is
  * one pair-count aggregate over the vocab plus a map-side `replace`, never
  * touching the corpus again. Per round the driver reads exactly ONE row
  * (the winning pair) — the merge IS the model parameter, and it must reach
  * the driver to become a literal in the next round's plan; same class as
  * the documented 1-row convergence read in `Dedup.connectedComponents`.
  *
  * Determinism & engine parity:
  *   - words: whitespace tokens of the normalized text; symbols: one
  *     character each plus a terminal `</w>` marker, space-joined with
  *     framing spaces (" t h e </w> ").
  *   - winning pair per round: max count, ties broken by (a, b) binary
  *     string order — both engines' default comparison.
  *   - merge application: `replace(syms, " a b ", " ab ")` — BOTH engines'
  *     `replace` scans left-to-right non-overlapping, so on a run of 3+
  *     identical symbols ("a a a a") the shared-boundary second occurrence
  *     is skipped (" aa a a ", where reference greedy BPE re-pairs to
  *     " aa aa "). A deliberate, documented approximation: it keeps the
  *     merge a pure engine-portable string op, and affects only counts of
  *     immediately-self-repeating symbols.
  */
object Bpe {

  val NumMerges = 8

  /** (word, freq) over whitespace tokens of the normalized text — the one
    * corpus-scale aggregate.
    */
  def wordFreqs(docs: DataFrame): DataFrame =
    docs.select(explode(Text.tokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))

  private def symbolized(words: DataFrame): DataFrame =
    words.select(
      concat(lit(" "), regexp_replace(col("w"), "(.)", "$1 "), lit("</w> ")).as("syms"),
      col("freq"))

  /** Weighted adjacent-pair counts of the current symbol table. */
  private def pairCounts(state: DataFrame): DataFrame =
    state
      .withColumn("t", split(trim(col("syms")), " "))
      .select(explode(expr(
        "transform(sequence(0, size(t) - 2), i -> struct(t[i] AS a, t[i + 1] AS b))")).as("p"),
        col("freq"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("cnt"))

  /** Learn `n` merges; returns (rank, a, b, merged, cnt) — the merge table
    * in learned order, i.e. the tokenizer model.
    */
  def learnMerges(docs: DataFrame, n: Int = NumMerges): DataFrame = {
    val spark = docs.sparkSession
    // pin the vocab table: every round re-reads it, the corpus is scanned once
    var state = symbolized(wordFreqs(docs)).localCheckpoint(false)
    val merges = Seq.newBuilder[Row]
    var rank = 1
    var exhausted = false
    while (rank <= n && !exhausted) {
      val top = pairCounts(state)
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1)
        .collect().headOption // the ONE-row model read, see scaladoc
      top match {
        case None =>
          // empty corpus, or every word fully merged before n rounds: stop
          // with the merges learned so far instead of indexing into nothing
          exhausted = true
        case Some(row) =>
          val (a, b, cnt) = (row.getString(0), row.getString(1), row.getLong(2))
          merges += Row(rank.toLong, a, b, a + b, cnt)
          state = state.withColumn("syms",
            call_function("replace", col("syms"), lit(s" $a $b "), lit(s" $a$b ")))
          rank += 1
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(merges.result(), 1),
      StructType(Seq(
        StructField("rank", LongType, nullable = false),
        StructField("a", StringType, nullable = false),
        StructField("b", StringType, nullable = false),
        StructField("merged", StringType, nullable = false),
        StructField("cnt", LongType, nullable = false))))
  }

  /** Encode each document with a learned merge table: the same symbolize +
    * sequential-replace pipeline, applied map-side (merges become plan
    * literals — the broadcast-model pattern). Returns per-doc subword token
    * counts: the before/after compression the tokenizer buys.
    */
  def encode(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    // each word symbolizes independently and ends with its own </w> marker,
    // so merges can never cross a word boundary (no learned merge has </w>
    // mid-pair) — per-word encoding, batched as one string per doc. The
    // left-to-right replace's shared-boundary skip (see object scaladoc)
    // applies BETWEEN adjacent words too: identical consecutive words merge
    // alternately. Bounded undercount, identical in both engines.
    val base = docs.select(col("doc_id"),
      concat(lit(" "),
        concat_ws(" ", expr(
          "transform(split(lower(trim(regexp_replace(text, '\\\\s+', ' '))), ' '), " +
            "w -> concat(regexp_replace(w, '(.)', '$1 '), '</w>'))")),
        lit(" ")).as("syms"))
    val encoded = merges.foldLeft(base) { case (df, (a, b)) =>
      df.withColumn("syms",
        call_function("replace", col("syms"), lit(s" $a $b "), lit(s" $a$b ")))
    }
    encoded.select(col("doc_id"),
      (size(split(trim(col("syms")), " "))).cast("long").as("n_subwords"))
  }

  // --- driver contract -----------------------------------------------------

  private val normSql = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bpe_merges" -> ((s, d) => learnMerges(Tables.documents(s, d))),
    "q_bpe_encode" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val merges = learnMerges(docs)
        .collect().sortBy(_.getLong(0)).map(r => (r.getString(1), r.getString(2))).toSeq
      encode(docs, merges)
    }))

  /** The oracle replays the identical rounds as chained CTEs: w{r} is the
    * vocab after r merges, t{r} the r-th winning pair.
    */
  def oracleSql: Map[String, String] = Map(
    "q_bpe_merges" -> {
      val w0 =
        s"""w0 AS (SELECT ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') || '</w> ' AS syms, freq
           |  FROM (SELECT tok AS w, count(*) AS freq
           |        FROM (SELECT unnest(string_split($normSql, ' ')) AS tok FROM documents)
           |        WHERE tok <> '' GROUP BY 1))""".stripMargin
      val rounds = (1 to NumMerges).map { r =>
        s"""p$r AS (SELECT pr[1] AS a, pr[2] AS b, freq FROM (
           |  SELECT unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS pr, freq FROM (
           |    SELECT string_split(trim(syms), ' ') AS l, freq FROM w${r - 1}))),
           |t$r AS (SELECT a, b, CAST(sum(freq) AS BIGINT) AS cnt FROM p$r
           |  GROUP BY a, b ORDER BY cnt DESC, a, b LIMIT 1),
           |w$r AS (SELECT replace(syms, ' ' || t$r.a || ' ' || t$r.b || ' ',
           |                       ' ' || t$r.a || t$r.b || ' ') AS syms, freq
           |  FROM w${r - 1}, t$r)""".stripMargin
      }
      val unions = (1 to NumMerges)
        .map(r => s"SELECT CAST($r AS BIGINT) AS rank, a, b, a || b AS merged, cnt FROM t$r")
        .mkString("\n", "\nUNION ALL\n", "")
      (w0 +: rounds).mkString("WITH ", ",\n", unions)
    },

    "q_bpe_encode" -> {
      val w0 =
        s"""w0 AS (SELECT ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') || '</w> ' AS syms, freq
           |  FROM (SELECT tok AS w, count(*) AS freq
           |        FROM (SELECT unnest(string_split($normSql, ' ')) AS tok FROM documents)
           |        WHERE tok <> '' GROUP BY 1))""".stripMargin
      val rounds = (1 to NumMerges).map { r =>
        s"""p$r AS (SELECT pr[1] AS a, pr[2] AS b, freq FROM (
           |  SELECT unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS pr, freq FROM (
           |    SELECT string_split(trim(syms), ' ') AS l, freq FROM w${r - 1}))),
           |t$r AS (SELECT a, b, CAST(sum(freq) AS BIGINT) AS cnt FROM p$r
           |  GROUP BY a, b ORDER BY cnt DESC, a, b LIMIT 1),
           |w$r AS (SELECT replace(syms, ' ' || t$r.a || ' ' || t$r.b || ' ',
           |                       ' ' || t$r.a || t$r.b || ' ') AS syms, freq
           |  FROM w${r - 1}, t$r)""".stripMargin
      }
      val e0 =
        s"""e0 AS (SELECT doc_id, ' ' || array_to_string(
           |    list_transform(string_split($normSql, ' '),
           |      w -> regexp_replace(w, '(.)', '\\1 ', 'g') || '</w>'), ' ') || ' ' AS syms
           |  FROM documents)""".stripMargin
      val encRounds = (1 to NumMerges).map { r =>
        s"""e$r AS (SELECT doc_id, replace(syms, ' ' || t$r.a || ' ' || t$r.b || ' ',
           |                       ' ' || t$r.a || t$r.b || ' ') AS syms
           |  FROM e${r - 1}, t$r)""".stripMargin
      }
      val fin = s"\nSELECT doc_id, CAST(len(string_split(trim(syms), ' ')) AS BIGINT)" +
        s" AS n_subwords FROM e$NumMerges"
      ((w0 +: rounds) ++ (e0 +: encRounds)).mkString("WITH ", ",\n", fin)
    })
}
