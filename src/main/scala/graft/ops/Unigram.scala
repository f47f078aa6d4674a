package graft.ops

import graft.Tables
import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Pinned.PinnedOps

/** Distributed unigram-LM tokenizer training (Kudo 2018, the SentencePiece
  * unigram model) — the OTHER tokenizer real pipelines train next to BPE
  * (`Bpe.learnMerges`): a candidate subword vocabulary is scored by EM,
  * where each E-step segments every word by Viterbi under the current piece
  * log-probs and the M-step re-estimates the probs from the segmentation
  * counts. The reference has no tokenizer machinery; this extends the
  * corpus-diagnostics layer like `Bpe`.
  *
  * Faithful simplifications vs full SentencePiece, documented:
  *   - hard EM (Viterbi counts), not forward-backward expected counts — the
  *     segmentation IS the count, which makes every round replayable as
  *     pure relational algebra on both engines;
  *   - pruning is implicit: a multi-char candidate that wins no Viterbi
  *     segment this round leaves the vocabulary (its count is 0 and only
  *     single-char pieces are floor-kept for reachability), instead of the
  *     likelihood-loss ranked 20%-per-round shrink;
  *   - fixed round count ([[Rounds]]) so the oracle unrolls the same rounds
  *     as a CTE chain — the `q_bpe_merges` convention.
  *
  * Scale shape (the 100 TB contract): the ONLY corpus-sized operation is the
  * word-frequency aggregate — everything after iterates on vocabulary-sized
  * tables (distinct words ⋈ a ~200-entry broadcast score map). Per round:
  * one map-side Viterbi DP over each distinct word (an `aggregate` HOF — no
  * UDF, stays in codegen), one partial+final count aggregate, one 1-row
  * totals aggregate broadcast back. ZERO driver reads — the model lives in
  * the plan as a `map_from_entries` literal-by-broadcast, unlike `Bpe`'s
  * 1-row-per-round winner read.
  *
  * Determinism & engine parity:
  *   - all Viterbi comparisons are BIGINT: piece score = L(cnt + 1) −
  *     L(total + |vocab|) with L(x) = cast(round(ln(x)·1e6) as bigint) —
  *     integer-scaled add-one-smoothed log-probs (the `q_graph_textrank`
  *     scaled-integer discipline applied to the one op that needs logs; ln
  *     of the SAME integer agrees across engines at e6 scale);
  *   - DP recurrence and backwalk are explicit: best[j] = max over piece
  *     lengths l of best[j−l] + s(word[j−l+1..j]); the backwalk takes the
  *     SMALLEST l achieving best[j] (shortest piece ending here) — a total
  *     tie-break both engines replay;
  *   - candidate selection is rank-deterministic: top [[Candidates]]
  *     substrings by (count DESC, piece ASC) plus every single character.
  */
object Unigram {

  /** Max candidate piece length (SentencePiece default order of magnitude,
    * sized to the synthetic corpus's short words).
    */
  val MaxPieceLen = 4

  /** Words longer than this are excluded from training (bounds the DP
    * width; SentencePiece similarly caps candidate extraction length).
    */
  val MaxWordLen = 16

  /** Candidate-vocabulary cap: top-N substrings by weighted count. */
  val Candidates = 150

  /** EM rounds — fixed so the oracle unrolls them as CTEs. */
  val Rounds = 3

  /** Final vocabulary rows emitted. */
  val TopK = 40

  /** Sentinel for "piece not in vocabulary": dominates every reachable path
    * sum (worst real path ≈ 16 pieces × −20e6 ≫ −1e12 + anything).
    */
  private val NegInf = -1000000000000L

  /** Broadcast guard ceiling for the piece map: the vocabulary is
    * model-sized BY CONSTRUCTION — at most [[Candidates]] multi-char pieces
    * plus the corpus's single-character alphabet (BMP-bounded at 65536) —
    * so the broadcast literal can never scale with the corpus. The guard
    * makes that invariant loud: a caller feeding an unbounded piece table
    * (e.g. a raw substring count instead of a trained vocab) fails with the
    * named bound instead of OOM-ing the driver on a giant map literal.
    */
  val PieceMapBound: Long = Candidates + 65536L

  /** The ONE broadcast model artifact: (piece → score_e6) as a single-row
    * map literal, guarded by [[PieceMapBound]]. The check is IN-PLAN (a
    * CASE on the consumed `mp` column, so the optimizer cannot prune it)
    * because the map is never read on the driver — zero driver reads is
    * the design point of this trainer.
    */
  private[ops] def pieceMap(vocabScores: DataFrame): DataFrame =
    vocabScores.agg(
      map_from_entries(collect_list(struct(col("piece"), col("s")))).as("mp0"))
      .select(expr(
        s"""CASE WHEN size(mp0) <= ${PieceMapBound}L THEN mp0
           |ELSE raise_error(concat('unigram piece map holds ', size(mp0),
           |  ' entries, past the $PieceMapBound model-size bound (Candidates=$Candidates',
           |  ' + a 65536-char alphabet) — pass a TRAINED vocabulary, or shard encoding',
           |  ' by vocab partition instead of broadcasting one map')) END""".stripMargin)
        .as("mp"))

  /** (w, freq) — distinct words of the normalized text, the one
    * corpus-scale aggregate (same convention as `Bpe.wordFreqs`).
    */
  private def words(docs: DataFrame): DataFrame =
    docs.select(explode(Text.tokens(col("text"))).as("w"))
      .filter(col("w") =!= "" && length(col("w")) <= MaxWordLen)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))

  /** All substrings of length 1..[[MaxPieceLen]] of each word, weighted by
    * word frequency — the candidate pool (SentencePiece's seed vocabulary).
    */
  private def substringCounts(wordsDf: DataFrame): DataFrame =
    wordsDf
      .select(col("freq"), explode(expr(
        s"""flatten(transform(sequence(1, length(w)), i ->
           |  transform(sequence(i, least(i + ${MaxPieceLen - 1}, length(w))), j ->
           |    substring(w, i, j - i + 1))))""".stripMargin)).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))

  /** Add-one-smoothed integer log-prob: L(cnt+1) − L(total + nvocab), both
    * terms from the broadcast 1-row totals aggregate.
    */
  private def scored(vocab: DataFrame): DataFrame = {
    val totals = vocab.agg(sum(col("cnt")).as("tot"), count(lit(1)).as("nv"))
    vocab.crossJoin(broadcast(totals))
      .select(col("piece"), col("cnt"),
        expr("cast(round(ln(cnt + 1) * 1000000.0) as bigint)" +
          " - cast(round(ln(tot + nv) * 1000000.0) as bigint)").as("s"))
  }

  /** Viterbi-segment every word under the score map and count the winning
    * pieces: the E-step. `vocabScores` is (piece, cnt, s); returns
    * (piece, cnt) of the segmentation.
    */
  private def segmentCounts(wordsDf: DataFrame, vocabScores: DataFrame): DataFrame = {
    // The DP + backwalk run in ONE native codegen pass
    // (UnigramViterbiPieces) — bit-exact with the former two chained
    // interpreted `aggregate` HOF columns (ExpressionsSpec pins the
    // equality against the SQL spelling, including the smallest-l
    // backwalk tie-break); the piece map stays the broadcast 1-row column
    // so the [[PieceMapBound]] raise_error guard still runs in-plan.
    val mapDf = pieceMap(vocabScores)
    wordsDf.crossJoin(broadcast(mapDf))
      .select(col("freq"),
        explode(GraftFunctions.unigramViterbiPieces(
          col("w"), col("mp"), MaxPieceLen, NegInf)).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
  }

  /** Train: the FULL final scored vocabulary (piece, cnt, s) — what
    * [[encode]] segments with. [[train]] is its top-[[TopK]] view.
    */
  def trainVocab(docs: DataFrame, rounds: Int = Rounds): DataFrame = {
    // pinned: re-read every round AND feeds the candidate pool.
    // The explicit repartition is load-bearing: the distinct-words table is
    // BYTE-small, so AQE coalesces the aggregate output to one partition —
    // but each row then pays the O(len·MaxPieceLen) interpreted Viterbi DP,
    // so the E-step would run on ONE core (first seen as a single-task
    // 25-minute stage at sf10: ~500k distinct words × ~7 CPU-seconds/50k).
    // Spreading CPU-heavy-but-small data over the cores is exactly the case
    // AQE's size-based coalescing cannot see; at production corpus sizes
    // this shuffle is vocabulary-sized, i.e. free.
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val w = words(docs).repartition(par).pinned(false)
    val subs = substringCounts(w).pinned(false)
    val chars = subs.filter(length(col("piece")) === 1)
    val top = subs.orderBy(col("cnt").desc, col("piece")).limit(Candidates)
    var vocab = scored(top.union(chars).distinct()).pinned(false)
    for (_ <- 1 to rounds) {
      val counts = segmentCounts(w, vocab)
      // floor-keep single chars (reachability); zero-count multi-char
      // candidates drop out — the implicit prune
      val zeroChars = chars.select(col("piece"))
        .join(counts, Seq("piece"), "left_anti")
        .select(col("piece"), lit(0L).as("cnt"))
      vocab = scored(counts.unionByName(zeroChars)).pinned(false)
    }
    vocab
  }

  /** Train: returns the final (piece, cnt, logp_e6) vocabulary, top
    * [[TopK]] by (cnt DESC, piece ASC).
    */
  def train(docs: DataFrame, rounds: Int = Rounds): DataFrame =
    trainVocab(docs, rounds)
      .orderBy(col("cnt").desc, col("piece"))
      .limit(TopK)
      .select(col("piece"), col("cnt"), col("s").as("logp_e6"))

  /** Tokenize documents with a TRAINED vocabulary (the apply step): Viterbi
    * segments each word under the frozen scores; returns per-doc subword
    * token counts — the statistic a data pipeline derives from the
    * tokenizer (packing budgets, length filters).
    */
  def encode(docs: DataFrame, vocabScores: DataFrame): DataFrame = {
    val mapDf = pieceMap(vocabScores)
    // Fan the doc scan to core count BEFORE the per-occurrence DP:
    // bytes-based input splits undersize the partition count for a stage
    // whose cost is ~500 ops per TOKEN (a 150 MB parquet = 2 splits = 2
    // cores grinding ~100M-token DPs). Spread.fan is conditional (no-op
    // once input splits exceed the core count — the former unconditional
    // repartition(par) would COALESCE a wide production scan down to the
    // core count) and hash-keyed (deterministic under retry, unlike
    // round-robin).
    graft.Spread.fan(docs.select(col("doc_id"), col("text")), col("doc_id"))
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("w"))
      .filter(col("w") =!= "" && length(col("w")) <= MaxWordLen)
      .crossJoin(broadcast(mapDf))
      // n_pieces = piece count of the optimal segmentation — size() of the
      // same native Viterbi pass segmentCounts uses (the former spelling
      // walked the DP twice: one interpreted `aggregate` for best[], a
      // second for the backwalk step count)
      .withColumn("n_pieces",
        size(GraftFunctions.unigramViterbiPieces(
          col("w"), col("mp"), MaxPieceLen, NegInf)).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_pieces")).as("n_subwords"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_unigram_lm" -> ((s, d) => train(Tables.documents(s, d))),
    "q_unigram_encode" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      encode(docs, trainVocab(docs))
    }))

  private val normSql = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"

  /** One EM round as DuckDB CTEs. `list_concat(acc, [])` in the done-branch
    * is load-bearing: DuckDB 1.0's `reduce` nondeterministically corrupts the
    * accumulator when a CASE branch returns it unchanged (buffer aliasing,
    * reproduced at ~25k rows); the no-op concat forces a fresh buffer.
    * (MATERIALIZED: DuckDB re-evaluates a
    * multiply-referenced plain CTE per reference, which is exponential
    * across chained EM rounds — materialization makes the oracle linear): map from v{r-1}, DP + backwalk per word,
    * piece counts, char floor-keep, rescore — the exact Spark round.
    */
  private def roundSql(r: Int): String = {
    val p = r - 1
    s"""m$r AS MATERIALIZED (SELECT map(list(piece ORDER BY piece), list(s ORDER BY piece)) AS mp FROM v$p),
       |dp$r AS MATERIALIZED (
       |  SELECT w, freq,
       |    reduce(list_prepend([0]::BIGINT[], list_transform(range(1, length(w) + 1), j -> [j::BIGINT])),
       |      (acc, x) -> list_append(acc,
       |        list_max(list_transform(range(1, least($MaxPieceLen, x[1]) + 1), l ->
       |          acc[(x[1] - l + 1)::INT]
       |          + coalesce(mp[substr(w, (x[1] - l + 1)::INT, l::INT)][1]::BIGINT, $NegInf))))) AS best
       |  FROM words, m$r),
       |cut$r AS MATERIALIZED (
       |  SELECT w, freq,
       |    reduce(list_prepend([length(w)::BIGINT], list_transform(range(1, length(w) + 1), j -> [0::BIGINT])),
       |      (acc, x) -> CASE WHEN acc[1] <= 0 THEN list_concat(acc, []) ELSE list_prepend(
       |        acc[1] - list_min(list_filter(range(1, least($MaxPieceLen, acc[1]) + 1), l ->
       |          best[(acc[1] - l + 1)::INT]
       |          + coalesce(mp[substr(w, (acc[1] - l + 1)::INT, l::INT)][1]::BIGINT, $NegInf)
       |          = best[(acc[1] + 1)::INT])),
       |        acc) END) AS cuts
       |  FROM dp$r, m$r),
       |cnt$r AS MATERIALIZED (
       |  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
       |    SELECT freq, unnest(list_transform(range(1, len(cuts)), i ->
       |      substr(w, (cuts[i] + 1)::INT, (cuts[i + 1] - cuts[i])::INT))) AS piece
       |    FROM cut$r)
       |  GROUP BY piece),
       |vocab$r AS MATERIALIZED (
       |  SELECT piece, cnt FROM cnt$r
       |  UNION ALL
       |  SELECT c.piece, 0::BIGINT FROM chars c
       |  WHERE c.piece NOT IN (SELECT piece FROM cnt$r)),
       |v$r AS MATERIALIZED (
       |  SELECT piece, cnt,
       |    CAST(round(ln(cnt + 1) * 1000000) AS BIGINT)
       |    - CAST(round(ln((SELECT sum(cnt) FROM vocab$r) + (SELECT count(*) FROM vocab$r)) * 1000000) AS BIGINT) AS s
       |  FROM vocab$r)""".stripMargin
  }

  private val baseSql: String =
    s"""WITH words AS MATERIALIZED (
       |  SELECT tok AS w, count(*)::BIGINT AS freq
       |  FROM (SELECT unnest(string_split($normSql, ' ')) AS tok FROM documents)
       |  WHERE tok <> '' AND length(tok) <= $MaxWordLen
       |  GROUP BY 1),
       |subs AS MATERIALIZED (
       |  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
       |    SELECT freq, unnest(flatten(list_transform(range(1, length(w) + 1), i ->
       |      list_transform(range(i, least(i + ${MaxPieceLen - 1}, length(w)) + 1), j ->
       |        substr(w, i::INT, (j - i + 1)::INT))))) AS piece
       |    FROM words)
       |  GROUP BY piece),
       |chars AS MATERIALIZED (SELECT piece, cnt FROM subs WHERE length(piece) = 1),
       |topc AS MATERIALIZED (SELECT piece, cnt FROM subs ORDER BY cnt DESC, piece LIMIT $Candidates),
       |cand AS MATERIALIZED (SELECT DISTINCT piece, cnt FROM (SELECT * FROM topc UNION ALL SELECT * FROM chars)),
       |v0 AS MATERIALIZED (
       |  SELECT piece, cnt,
       |    CAST(round(ln(cnt + 1) * 1000000) AS BIGINT)
       |    - CAST(round(ln((SELECT sum(cnt) FROM cand) + (SELECT count(*) FROM cand)) * 1000000) AS BIGINT) AS s
       |  FROM cand),
       |${(1 to Rounds).map(roundSql).mkString(",\n")}""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_unigram_lm" ->
      s"""$baseSql
         |SELECT piece, cnt, s AS logp_e6 FROM v$Rounds
         |ORDER BY cnt DESC, piece LIMIT $TopK""".stripMargin,

    "q_unigram_encode" ->
      s"""$baseSql,
         |emap AS MATERIALIZED (SELECT map(list(piece ORDER BY piece), list(s ORDER BY piece)) AS mp FROM v$Rounds),
         |dw AS MATERIALIZED (
         |  SELECT doc_id, tok AS w
         |  FROM (SELECT doc_id, unnest(string_split($normSql, ' ')) AS tok FROM documents)
         |  WHERE tok <> '' AND length(tok) <= $MaxWordLen),
         |edp AS MATERIALIZED (
         |  SELECT doc_id, w,
         |    reduce(list_prepend([0]::BIGINT[], list_transform(range(1, length(w) + 1), j -> [j::BIGINT])),
         |      (acc, x) -> list_append(acc,
         |        list_max(list_transform(range(1, least($MaxPieceLen, x[1]) + 1), l ->
         |          acc[(x[1] - l + 1)::INT]
         |          + coalesce(mp[substr(w, (x[1] - l + 1)::INT, l::INT)][1]::BIGINT, $NegInf))))) AS best
         |  FROM dw, emap),
         |ecut AS MATERIALIZED (
         |  SELECT doc_id, w,
         |    reduce(list_prepend([length(w)::BIGINT], list_transform(range(1, length(w) + 1), j -> [0::BIGINT])),
         |      (acc, x) -> CASE WHEN acc[1] <= 0 THEN list_concat(acc, []) ELSE list_prepend(
         |        acc[1] - list_min(list_filter(range(1, least($MaxPieceLen, acc[1]) + 1), l ->
         |          best[(acc[1] - l + 1)::INT]
         |          + coalesce(mp[substr(w, (acc[1] - l + 1)::INT, l::INT)][1]::BIGINT, $NegInf)
         |          = best[(acc[1] + 1)::INT])),
         |        acc) END) AS cuts
         |  FROM edp, emap)
         |SELECT doc_id, count(*)::BIGINT AS n_words,
         |  CAST(sum(len(cuts) - 1) AS BIGINT) AS n_subwords
         |FROM ecut GROUP BY doc_id""".stripMargin)
}
