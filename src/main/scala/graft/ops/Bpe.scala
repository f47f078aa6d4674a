package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Pinned.PinnedOps

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
      // a fully-merged word is a single symbol: no adjacent pairs. Without
      // the filter, sequence(0, size-2) = sequence(0, -1) DESCENDS to
      // [0, -1] and t[i+1] faults (the oracle's list_zip slice is naturally
      // empty there)
      .filter(size(col("t")) >= 2)
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
    var state = symbolized(wordFreqs(docs)).pinned(false)
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

  val BatchRounds = 2
  val BatchM = 4
  val CandWindow = 16

  /** Batched merge learning — the production-cadence form of `learnMerges`
    * (round-9 verdict item 3: one driver round-trip PER merge means a
    * 30k-merge vocabulary is 30k sequential Spark jobs; batching top-m
    * compatible merges per round cuts the cadence to ~n/m).
    *
    * Selection rule per round: rank all adjacent pairs by (cnt DESC, a, b),
    * keep the top `k` as the candidate window, and select — in rank order,
    * up to `m` — every candidate that shares NO symbol with ANY higher-
    * ranked candidate in the window (selected or not). The
    * "conflict-with-any-higher-ranked" form is deliberately chosen over
    * greedy-on-selected: it is a pure rank predicate, so the DuckDB oracle
    * expresses it as a NOT EXISTS over the same ranked window — no
    * procedural selection loop to mirror. Slightly more conservative than
    * greedy (a candidate can be vetoed by a pair that was itself vetoed),
    * identical on both engines.
    *
    * Relation to sequential BPE (the documented delta): symbol-disjoint
    * merges have independent pair counts (merging (a,b) only creates or
    * destroys pairs touching a, b, or ab), so WITHIN a round the selected
    * merges commute and each was a true top pair at round start. Divergence
    * from `learnMerges` appears exactly when a merge CREATES a pair that
    * sequential learning would have taken next — e.g. the word-completion
    * chain (a,b) → (ab,&lt;/w&gt;), which ranks first sequentially but shares
    * `ab` and so waits a round here. With m=1 the rule degenerates to top-1
    * and the output equals `learnMerges` exactly (asserted in BpeSpec).
    * Driver cadence: ONE k-row read per round instead of one 1-row read per
    * merge.
    */
  def learnMergesBatched(docs: DataFrame, rounds: Int = BatchRounds,
      m: Int = BatchM, k: Int = CandWindow): DataFrame = {
    val spark = docs.sparkSession
    var state = symbolized(wordFreqs(docs)).pinned(false)
    val out = Seq.newBuilder[Row]
    var round = 1
    var exhausted = false
    while (round <= rounds && !exhausted) {
      val cand = pairCounts(state)
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(k)
        .collect() // the per-round model read: k candidate rows, not 1
      val selected = cand.zipWithIndex.filter { case (p, i) =>
        val (a, b) = (p.getString(0), p.getString(1))
        !cand.take(i).exists { q =>
          val (qa, qb) = (q.getString(0), q.getString(1))
          qa == a || qa == b || qb == a || qb == b
        }
      }.map(_._1).take(m)
      if (selected.isEmpty) exhausted = true
      else {
        selected.zipWithIndex.foreach { case (p, j) =>
          out += Row(round.toLong, (j + 1).toLong, p.getString(0), p.getString(1),
            p.getString(0) + p.getString(1), p.getLong(2))
        }
        state = selected.foldLeft(state) { (df, p) =>
          val (a, b) = (p.getString(0), p.getString(1))
          df.withColumn("syms",
            call_function("replace", col("syms"), lit(s" $a $b "), lit(s" $a$b ")))
        }
        round += 1
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.result(), 1),
      StructType(Seq(
        StructField("round", LongType, nullable = false),
        StructField("sel", LongType, nullable = false),
        StructField("a", StringType, nullable = false),
        StructField("b", StringType, nullable = false),
        StructField("merged", StringType, nullable = false),
        StructField("cnt", LongType, nullable = false))))
  }

  /** Broadcast-model guard for [[encode]]: each merge becomes one `replace`
    * literal in the plan, so the model size IS the plan size — a real BPE
    * vocabulary (30k+ merges) folded into one projection would blow past
    * codegen limits long before the driver OOMs. Learned tables here are
    * [[NumMerges]]-bounded; past this ceiling, apply merges in chunked
    * passes (fold `encode` over merge blocks, materializing between).
    */
  val MaxEncodeMerges = 4096

  /** Encode each document with a learned merge table: the same symbolize +
    * sequential-replace pipeline, applied map-side (merges become plan
    * literals — the broadcast-model pattern). Returns per-doc subword token
    * counts: the before/after compression the tokenizer buys.
    */
  def encode(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    require(merges.length <= MaxEncodeMerges,
      s"Bpe.encode: ${merges.length} merges exceed the $MaxEncodeMerges plan-literal bound — " +
        "apply the merge table in chunked passes (fold encode over blocks of merges, " +
        "materializing between passes) instead of one projection")
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
    "q_bpe_merges_batched" -> ((s, d) => learnMergesBatched(Tables.documents(s, d))),
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

    // Replays the ranked-window + conflict-with-any-higher-ranked selection
    // per round; the fixed BatchM replace slots are padded with chr(1) no-op
    // patterns when a round selects fewer than m merges, so the CTE shape is
    // static while the selection stays data-dependent.
    "q_bpe_merges_batched" -> {
      val w0 =
        s"""bw0 AS (SELECT ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') || '</w> ' AS syms, freq
           |  FROM (SELECT tok AS w, count(*) AS freq
           |        FROM (SELECT unnest(string_split($normSql, ' ')) AS tok FROM documents)
           |        WHERE tok <> '' GROUP BY 1))""".stripMargin
      val rounds = (1 to BatchRounds).map { r =>
        val merges = (1 to BatchM).map { j =>
          s"""bm${r}_$j AS (SELECT coalesce(max(' ' || a || ' ' || b || ' '), chr(1)) AS pat,
             |  coalesce(max(' ' || a || b || ' '), chr(1)) AS rep FROM bs$r WHERE sel = $j)""".stripMargin
        }
        val nestedReplace = (1 to BatchM).foldLeft("syms") { (acc, j) =>
          s"replace($acc, p$j.pat, p$j.rep)"
        }
        val fromMs = (1 to BatchM).map(j => s"bm${r}_$j p$j").mkString(", ")
        (Seq(
          s"""bc$r AS (SELECT pr[1] AS a, pr[2] AS b, CAST(sum(freq) AS BIGINT) AS cnt FROM (
             |  SELECT unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS pr, freq FROM (
             |    SELECT string_split(trim(syms), ' ') AS l, freq FROM bw${r - 1}))
             |  GROUP BY a, b)""".stripMargin,
          s"""br$r AS (SELECT * FROM (SELECT a, b, cnt,
             |  row_number() OVER (ORDER BY cnt DESC, a, b) AS rnk FROM bc$r)
             |  WHERE rnk <= $CandWindow)""".stripMargin,
          s"""bs$r AS (SELECT a, b, cnt, row_number() OVER (ORDER BY rnk) AS sel
             |  FROM br$r p WHERE NOT EXISTS (SELECT 1 FROM br$r q WHERE q.rnk < p.rnk
             |    AND (q.a = p.a OR q.a = p.b OR q.b = p.a OR q.b = p.b))
             |  ORDER BY rnk LIMIT $BatchM)""".stripMargin) ++ merges :+
          s"""bw$r AS (SELECT $nestedReplace AS syms, freq FROM bw${r - 1}, $fromMs)""").mkString(",\n")
      }
      val unions = (1 to BatchRounds)
        .map(r => s"SELECT CAST($r AS BIGINT) AS round, sel, a, b, a || b AS merged, cnt FROM bs$r")
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
