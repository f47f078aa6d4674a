package graft.ops

import graft.Tables
import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}
import graft.Pinned.PinnedOps

/** Corpus-level operators that close the gap between a cleaned document set
  * and a training run:
  *
  *   - sequence PACKING: the standard "concatenate then cut at the context
  *     length" layout — assign each document a pack id and offset within a
  *     fixed token budget, deterministically. Packing is inherently
  *     sequential per shard (here: per source), but the running sum itself
  *     is computed as a two-level prefix sum (`shardedCumsum`) — so even a
  *     corpus arriving as a handful of coarse sources spreads across the
  *     cluster instead of funneling each shard through one window task.
  *   - VOCABULARY building: term counts with rank and cumulative coverage —
  *     the tokenizer-training statistic. Heavy lifting is one partial+final
  *     aggregate over exploded tokens; the rank/coverage window runs over
  *     the (small) distinct-term set, not the corpus.
  *   - SOURCE OVERLAP matrix: pairwise shingle Jaccard between sources via
  *     an inverted-index equi-join on shingle hash — the corpus-level dedup
  *     diagnostic ("how much does crawl A duplicate crawl B"). No pair of
  *     sources is ever materialized against the full corpus; the join
  *     carries (shingle, source) ids only. `maxDf` drops shingles present
  *     in more than that many sources before the self-join — the hot-key
  *     bound at web scale; the default keeps the exact oracle-checkable
  *     form.
  *
  * The reference has no corpus layer (its tables are streams); these extend
  * the SURVEY §6 pipeline inventory alongside Sampling/Curation.
  */
object Corpus {

  private def hashSql(e: String): String =
    s"cast(conv(substr(md5($e), 1, 15), 16, 10) as bigint)"


  /** Per-shard running sum of `valueCol` in `order` within each `shardCol`
    * shard — the primitive behind the packing/budget layouts — as a
    * TWO-LEVEL prefix sum instead of a single `Window.partitionBy(shard)`
    * cumsum. The plain window funnels each shard's entire stream through ONE
    * task: fine when a corpus has many fine shards, a single-task bottleneck
    * when 100 TB arrives as a handful of coarse sources. Here instead:
    *
    *   1. range-repartition by (shard, order): a shard's rows land in
    *      consecutive, individually-bounded partitions no matter how few
    *      shards there are;
    *   2. one mapPartitions pass computes the partition-LOCAL running sum
    *      (resetting at shard boundaries) plus the partition id — no
    *      shuffle, stays in the range layout;
    *   3. per-(shard, partition) totals — at most one row per (shard,
    *      partition) pair survives the map-side partial agg — get a
    *      per-shard running offset via a window over that tiny table;
    *   4. offsets broadcast-join back on (shard, pid):
    *      cum = local + offset.
    *
    * Output = input columns + `outCol` (LongType), with values identical to
    * the one-window form for ANY partition boundaries (the local sums and
    * offsets telescope), so the oracle results are unchanged — asserted in
    * CorpusSpec against the naive window on both multi- and single-shard
    * inputs. The range exchange is the only full-data shuffle.
    *
    * Constraints: `valueCol` must be NON-NEGATIVE — partition totals are
    * read as max(running sum), exact only for nondecreasing sums (all
    * callers pass token counts). The checkpoint below pins blocks in
    * executor storage until the driver GCs the RDD reference; a long-lived
    * session calling packing operators repeatedly should sweep
    * (`sparkContext.getPersistentRDDs` → unpersist) between jobs, as
    * `Bench.sweep()` does.
    *
    * ADAPTIVE: the two-level machinery (range exchange + checkpoint +
    * offsets window + broadcast join-back) earns its cost only when a shard
    * is too big for one task. A probe (`limit(k+1).count`) checks whether
    * the WHOLE input fits comfortably in one window task — at or under
    * `graft.cumsum.windowMaxRows` rows (default shuffle.partitions × 1024)
    * — and if so runs the plain per-shard window instead. Values are
    * identical either way (CorpusSpec asserts both modes against each
    * other); only the physical plan differs. Set the conf to 0 to force the
    * two-level form always (the CorpusSpec funnel asserts do), or large to
    * force the window form.
    *
    * Probe cost, honestly: the limit bounds OUTPUT, not compute — over a
    * map-only input it short-circuits after ~one partition, but when a
    * window/aggregate barrier sits upstream the probe pays up to one extra
    * execution of that prefix (the same order of cost as the range
    * exchange's own sampling pass it replaces on the small path). BOTH
    * outcomes are memoized by (semantic plan hash, threshold) so repeated
    * builds of the same plan probe once per session; a fresh pin
    * inputs hash fresh and re-probe — they are already materialized, so
    * that probe is a cheap checkpoint scan. The memo is decision-only and
    * cleared past 4096 entries (long sessions over many datasets); a memo
    * hit on a path whose underlying data has since GROWN keeps the stale
    * routing until the session restarts — mode choice only, never values.
    */
  private val cumsumProbeMemo =
    new java.util.concurrent.ConcurrentHashMap[(Int, Long), java.lang.Boolean]()

  private[ops] def shardedCumsum(
      df: DataFrame,
      valueCol: String,
      shardCol: String,
      order: Seq[Column],
      outCol: String): DataFrame = {
    val shardIdx = df.columns.indexOf(shardCol)
    val valIdx = df.columns.indexOf(valueCol)
    require(shardIdx >= 0 && valIdx >= 0, s"missing $shardCol or $valueCol")
    // Explicit partition count: an advisory-size range exchange would let AQE
    // coalesce a small input back to ONE partition — exactly the funnel this
    // operator exists to avoid (same pin as Dedup's bucket repartitions).
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val maxRows = df.sparkSession.conf.get("graft.cumsum.windowMaxRows", "auto") match {
      case "auto" => n.toLong * 1024L
      case v => v.toLong
    }
    val small = maxRows > 0 && {
      val key = (df.queryExecution.logical.semanticHash(), maxRows)
      val memo = cumsumProbeMemo.get(key)
      if (memo != null) memo.booleanValue()
      else {
        val probe = math.min(maxRows, Int.MaxValue.toLong - 1L).toInt
        val fits = df.limit(probe + 1).count() <= maxRows
        if (cumsumProbeMemo.size > 4096) cumsumProbeMemo.clear()
        cumsumProbeMemo.put(key, java.lang.Boolean.valueOf(fits))
        fits
      }
    }
    if (small) {
      val w = Window.partitionBy(col(shardCol)).orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      return df.withColumn(outCol, sum(col(valueCol).cast("long")).over(w))
    }
    val sorted = df
      .repartitionByRange(n, col(shardCol) +: order: _*)
      .sortWithinPartitions(col(shardCol) +: order: _*)
    val localSchema = df.schema.add("__pid", IntegerType, nullable = false)
      .add(outCol, LongType, nullable = false)
    // the pin fixes the partition-id assignment: the totals branch and
    // the join-back branch BOTH read this one materialized RDD. Without it,
    // each branch may recompute the range exchange with independently SAMPLED
    // bounds (RangePartitioner seeds differ per instance), assigning rows to
    // different pids — the offsets join would then silently drop rows. Same
    // lineage-pinning idiom as the k-means/CC iterations.
    val local = sorted.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var first = true
      var shard: Any = null
      var run = 0L
      it.map { r =>
        val s = r.get(shardIdx)
        if (first || s != shard) { run = 0L; shard = s; first = false }
        run += r.get(valIdx).asInstanceOf[Number].longValue
        Row.fromSeq(r.toSeq :+ pid :+ run)
      }
    }(Encoders.row(localSchema)).pinned(false)
    val wOff = Window.partitionBy(col(shardCol)).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = local.groupBy(col(shardCol), col("__pid"))
      .agg(max(col(outCol)).as("__tot"))
      .withColumn("__off", sum(col("__tot")).over(wOff) - col("__tot"))
      .select(col(shardCol), col("__pid"), col("__off"))
    local.join(broadcast(offsets), Seq(shardCol, "__pid"))
      .withColumn(outCol, col(outCol) + col("__off"))
      .select(df.columns.map(col) :+ col(outCol): _*)
  }

  /** Concat-then-cut packing of whole documents into `capacity`-token packs,
    * per `shardCol` shard in `orderCol` order: pack_id = which pack this
    * doc STARTS in, pack_offset = its token offset within the running
    * concatenation. Map-only except the two-level per-shard prefix sum
    * (`shardedCumsum` — scales with partitions, not shards; the order
    * column must be a total order per shard).
    *
    * NOTE: plan CONSTRUCTION is not side-effect free — the adaptive cumsum
    * runs a small eager size probe (a bounded limit+count, memoized per
    * plan+session) to pick between the plain-window and range-exchange
    * paths, so building this plan (also via `shuffleShards` /
    * `Pipelines.shuffledTrainLayout`) may trigger a short Spark job before
    * any caller action.
    */
  def packSequences(
      docs: DataFrame,
      capacity: Long,
      shardCol: String = "source",
      orderCol: String = "doc_id"): DataFrame =
    packSequencesFromCounts(
      docs.select(col(orderCol), col(shardCol),
        size(Text.tokens(col("text"))).cast("long").as("n_tokens")),
      capacity, shardCol, orderCol)

  /** `packSequences` over pre-computed token counts (orderCol, shardCol,
    * n_tokens) — pipelines that already hold counts (Pipelines.trainPipeline
    * after the budget stage) pack without re-tokenizing.
    */
  def packSequencesFromCounts(
      counts: DataFrame,
      capacity: Long,
      shardCol: String = "source",
      orderCol: String = "doc_id"): DataFrame =
    shardedCumsum(counts, "n_tokens", shardCol, Seq(col(orderCol)), "cum")
      .select(col(orderCol), col(shardCol), col("n_tokens"),
        // integral `div`, not `/`: the `/` operator is double division and a
        // shard cumsum past 2^53 tokens would lose exactness in the cast
        expr(s"(cum - n_tokens) div ${capacity}L").as("pack_id"),
        ((col("cum") - col("n_tokens")) % capacity).cast("long").as("pack_offset"))

  /** Per-pack SLICES of the concat-then-cut layout: where `packSequences`
    * reports which pack each doc starts in, this emits one row per
    * (doc, pack) the doc intersects — `tok_start`/`tok_end` are the 0-based
    * doc-relative token range landing in `pack_id`, so a boundary-crossing
    * document yields one slice per pack it spans. Slices tile each document
    * exactly and each pack holds exactly `capacity` tokens (except the last
    * per shard). Same two-level `shardedCumsum` shape as `packSequences`;
    * the explode fan-out is ceil(n_tokens / capacity), i.e. output rows ≈
    * corpus tokens / capacity extra — map-only after the prefix sum.
    */
  def packChunks(
      docs: DataFrame,
      capacity: Long,
      shardCol: String = "source",
      orderCol: String = "doc_id"): DataFrame = {
    val counts = docs.select(col(orderCol), col(shardCol),
      size(Text.tokens(col("text"))).cast("long").as("n_tokens"))
    shardedCumsum(counts, "n_tokens", shardCol, Seq(col(orderCol)), "cum")
      .withColumn("strt", col("cum") - col("n_tokens"))
      .filter(col("n_tokens") > 0)
      .select(col(orderCol), col(shardCol), col("n_tokens"), col("strt"),
        explode(expr(
          s"sequence(strt div ${capacity}L, (strt + n_tokens - 1) div ${capacity}L)"))
          .as("pack_id"))
      .select(col(orderCol), col(shardCol), col("pack_id"),
        greatest(lit(0L), col("pack_id") * capacity - col("strt")).as("tok_start"),
        least(col("n_tokens"), (col("pack_id") + 1) * capacity - col("strt")).as("tok_end"))
      .withColumn("n_slice", col("tok_end") - col("tok_start"))
  }

  /** Rebalance the corpus to a target source mixture, deterministically.
    * `weightsE6` = (source, w_e6) micro-weights summing to 1e6. The largest
    * feasible total is T = min over sources of n_docs·1e6/w_e6 (integer
    * division throughout — no doubles, so engine-deterministic and exact);
    * each source keeps its quota w_e6·T/1e6, selected by md5-hash rank so
    * the draw is reproducible at any parallelism and independent of row
    * order. One count aggregate + one per-source rank window (a per-domain
    * sort — the price of an EXACT quota; the approximate path would
    * threshold on the hash like Sampling does); quotas broadcast back.
    * Requires n_docs·1e6 and w_e6·T within long range — holds for any
    * realistic corpus (n_docs < 9·10^12).
    */
  def mixSources(
      docs: DataFrame,
      weightsE6: DataFrame,
      shardCol: String = "source"): DataFrame = {
    // Validation is IN-PLAN (raise_error), not a driver-side action: a
    // non-positive w_e6 hits integer division by zero (NULL — silently
    // skipped by min), and a weight source absent from the corpus would drop
    // out of the join and leave t_total unconstrained while its own quota
    // stays unattainable. Both now fail loudly when the plan executes.
    val weights = weightsE6.select(
      col(shardCol),
      when(col("w_e6") > 0, col("w_e6")).otherwise(raise_error(
        concat(lit("mixSources: w_e6 must be > 0 for source "),
          col(shardCol).cast("string")))).as("w_e6"))
    val counts = docs.groupBy(col(shardCol)).agg(count(lit(1)).as("n_docs"))
    val t = weights.join(counts, Seq(shardCol), "left")
      .select(min(when(col("n_docs").isNotNull,
        expr("n_docs * 1000000L div w_e6")).otherwise(raise_error(
        concat(lit("mixSources: weight source absent from corpus: "),
          col(shardCol).cast("string"))))).as("t_total"))
    // quota needs only (weight, T) — joining counts back in would re-scan the
    // corpus for nothing
    val quotas = weights.crossJoin(broadcast(t))
      .select(col(shardCol), expr("w_e6 * t_total div 1000000L").as("quota"))
    docs
      .select(col("doc_id"), col(shardCol),
        expr(hashSql("cast(doc_id as string)")).as("h"))
      .withColumn("rnk", row_number()
        .over(Window.partitionBy(col(shardCol)).orderBy(col("h"), col("doc_id")))
        .cast("long"))
      .join(broadcast(quotas), Seq(shardCol))
      .filter(col("rnk") <= col("quota"))
      .select(col("doc_id"), col(shardCol), col("rnk"))
  }

  /** Quality-ordered selection under a per-shard token budget: take
    * documents in (quality_e6 DESC, doc_id) order while the running token
    * sum stays within `budgetTokens` — "best docs first until the budget is
    * spent", per source. One tokenize pass computes score and token count
    * together; the running sum is the two-level `shardedCumsum` (quality
    * order within shard), safe on coarse shards. The kept set is by
    * construction a prefix of the per-source quality order.
    */
  def tokenBudget(
      docs: DataFrame,
      budgetTokens: Long,
      shardCol: String = "source"): DataFrame =
    tokenBudgetFromToks(
      docs.select(col("doc_id"), col(shardCol), Text.tokens(col("text")).as("toks")),
      budgetTokens, shardCol)

  /** `tokenBudget` over a pre-tokenized (doc_id, shardCol, toks) projection —
    * pipeline stages feed it from one shared tokenized scan.
    */
  def tokenBudgetFromToks(
      t: DataFrame,
      budgetTokens: Long,
      shardCol: String = "source"): DataFrame = {
    val scored = Text.qualityScoredFromToks(t, keep = Seq(shardCol))
    shardedCumsum(scored, "n_tokens", shardCol,
      Seq(col("quality_e6").desc, col("doc_id")), "cum_tokens")
      .filter(col("cum_tokens") <= budgetTokens)
      .select(col("doc_id"), col(shardCol), col("n_tokens"), col("quality_e6"),
        col("cum_tokens"))
  }

  /** Per-document novelty: the fraction of a doc's distinct shingles whose
    * FIRST appearance (minimum doc_id) in the corpus is this doc — "how much
    * new content does each doc contribute", the curation diagnostic that
    * separates originals from recombinations where pairwise dedup sees
    * nothing. Inverted-index shape like `sourceOverlap`: distinct (doc,
    * shingle-hash) pairs, a min-doc aggregate per shingle, one hash-keyed
    * join back — shuffles carry 8-byte hashes + ids, never text.
    */
  def novelty(docs: DataFrame): DataFrame = {
    val sh = docs
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(graft.functions.GraftFunctions.shingleHashes(col("toks"))).as("sh"))
      .distinct()
    val first = sh.groupBy(col("sh")).agg(min(col("doc_id")).as("first_doc"))
    sh.join(first, Seq("sh"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("doc_id") === col("first_doc"), 1L).otherwise(0L)).as("n_novel"))
      .select(col("doc_id"), col("n_shingles"), col("n_novel"),
        round(col("n_novel").cast("double") / col("n_shingles"), 6).as("novelty"))
  }

  /** Decile histogram of the quality score — the calibration view consulted
    * before choosing a keep threshold (what fraction of docs and of token
    * mass sits in each score band). One tokenize pass + one 10-group
    * aggregate; the doc fraction joins in as a broadcast 1-row total. All
    * binning is integral (`div` on micro-units), engine-deterministic.
    */
  def qualityHistogram(docs: DataFrame): DataFrame = {
    val scored = Text.qualityScoredFromToks(
      docs.select(col("doc_id"), Text.tokens(col("text")).as("toks")))
    val h = scored
      .groupBy(least(lit(9L), expr("quality_e6 div 100000")).as("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
    val tot = h.agg(sum(col("n_docs")).as("tot"))
    h.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_docs"), col("n_tokens"),
        round(col("n_docs").cast("double") / col("tot"), 6).as("doc_frac"))
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
    *
    * The UNBOUNDED default (`maxDf = Int.MaxValue`) is the exact diagnostic
    * form, and it is guarded like the all-pairs dedup baselines: one shingle
    * present in all S sources contributes S² self-join rows, and at web
    * scale near-universal boilerplate shingles make that the dominant term.
    * Past `graft.corpus.overlapShingleLimit` inverted-index rows (default
    * 2M) the exact form fails fast with a pointer at the `maxDf` cut — the
    * scale path, oracle-checked by `q_source_overlap_cut`. The probe counts
    * the PRE-distinct exploded rows — an upper bound on the index size
    * through which `limit` genuinely short-circuits (map-only, no shuffle
    * barrier), so the guard never costs a full corpus pass; it is
    * conservative on heavily-repetitive corpora whose distinct index would
    * have fit (raise the conf there). The probe runs on EVERY call —
    * deliberately un-memoized, so growth past the limit mid-session still
    * trips it.
    */
  val OverlapShingleLimit = 2000000L

  def sourceOverlap(docs: DataFrame, maxDf: Int = Int.MaxValue): DataFrame = {
    val sh0pre = docs
      .select(col("source"), Text.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("source"), explode(graft.functions.GraftFunctions.shingleHashes(col("toks"))).as("sh"))
    val sh0 = sh0pre.distinct()
    if (maxDf == Int.MaxValue) {
      // NOT memoized (unlike cumsumProbeMemo): a stale PASS here would
      // disable a safety guard — a same-path dataset growing past the limit
      // mid-session must re-trip it. The probe is one bounded map-only
      // limit+count per call; a mode memo can be stale, a guard cannot.
      val limit = docs.sparkSession.conf
        .get("graft.corpus.overlapShingleLimit", OverlapShingleLimit.toString).toLong
      if (limit < Int.MaxValue) {
        val n = sh0pre.limit(limit.toInt + 1).count()
        require(n <= limit,
          s"sourceOverlap without a df bound is the exact diagnostic form and the " +
            s"inverted index may exceed $limit rows (conf graft.corpus.overlapShingleLimit; " +
            s"the bound counts pre-distinct shingle rows): a near-universal shingle " +
            s"contributes nSources^2 self-join rows. Pass a finite maxDf (the hot-key " +
            s"cut, e.g. maxDf = nSources) or raise the limit.")
      }
    }
    // document-frequency cut: a shingle present in more than `maxDf` sources
    // contributes maxDf² join rows while saying nothing about any PAIR —
    // dropping them bounds hot-key fan-out at web scale. The filter reuses
    // the same (source, sh) exchange the join consumes. Set sizes are
    // counted BEFORE the cut so jaccard denominators stay exact; the cut
    // only loses shared-count mass from near-universal shingles.
    val sh =
      if (maxDf == Int.MaxValue) sh0
      else {
        val w = Window.partitionBy(col("sh"))
        sh0.withColumn("df", count(lit(1)).over(w))
          .filter(col("df") <= maxDf).drop("df")
      }
    val sizes = sh0.groupBy(col("source")).agg(count(lit(1)).as("n_sh"))
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

  /** Sketch-based source overlap: per-source MinHash signatures instead of
    * the exact inverted-index self-join. THE unguarded 100 TB path for
    * cross-source contamination estimates — where `sourceOverlap` is
    * fail-fast-guarded (a near-universal shingle costs S² join rows) and
    * `maxDf` cuts lose hot-shingle mass, the sketch costs ONE corpus
    * aggregate regardless of shingle skew:
    *
    *   1. distinct (source, shingle-hash) projection (the same exchange the
    *      exact form starts from);
    *   2. one partial+final agg computing all `SrcMinhashPerms` permutation
    *      minima as parallel agg columns — no perm explode, no extra
    *      shuffle: map tasks fold each shingle into P running minima, and
    *      only S·P longs ever cross the wire;
    *   3. the pairwise phase runs over the S×P signature table (sources,
    *      not rows — tiny by construction) and estimates Jaccard as the
    *      fraction of agreeing components (the standard unbiased MinHash
    *      estimator, Broder 1997).
    *
    * Permutations are the same universal-hash family as doc-level MinHash
    * (`Dedup.permCoeffs`), with constants derived from independent seeds.
    * Determinism: mins/match-counts are exact integers; the only double is
    * one final division, rounded.
    */
  val SrcMinhashPerms = 64

  private val MersennePrime = 2147483647L

  private[ops] val srcPermCoeffs: IndexedSeq[(Long, Long)] =
    (0 until SrcMinhashPerms).map { i =>
      (graft.functions.Determinism.md5Long(s"srcmh-a:$i") % (MersennePrime - 1) + 1,
        graft.functions.Determinism.md5Long(s"srcmh-b:$i") % MersennePrime)
    }

  def sourceOverlapMinhash(docs: DataFrame): DataFrame = {
    val sh = docs
      .select(col("source"), Text.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("source"),
        explode(graft.functions.GraftFunctions.shingleHashes(col("toks"), mod = MersennePrime)).as("h"))
      .distinct()
    val minCols = srcPermCoeffs.zipWithIndex.map { case ((a, b), i) =>
      min(expr(s"(${a}L * h + ${b}L) % ${MersennePrime}L")).as(s"m$i")
    }
    val sigs = sh.groupBy(col("source")).agg(minCols.head, minCols.tail: _*)
    val stacked = sigs.select(col("source"), explode(expr(
      s"transform(sequence(0, ${SrcMinhashPerms - 1}), i -> " +
        s"struct(i, element_at(array(${(0 until SrcMinhashPerms).map("m" + _).mkString(", ")}), i + 1) as m))"))
      .as("p"))
      .select(col("source"), col("p.i").as("i"), col("p.m").as("m"))
    val a = stacked.select(col("source").as("src_a"), col("i"), col("m").as("ma"))
    val b = stacked.select(col("source").as("src_b"), col("i"), col("m").as("mb"))
    a.join(b, Seq("i"))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(sum(when(col("ma") === col("mb"), 1L).otherwise(0L)).as("n_match"))
      .select(col("src_a"), col("src_b"), col("n_match"),
        round(col("n_match").cast("double") / SrcMinhashPerms, 6).as("est_jaccard"))
  }

  /** Per-source quality threshold calibrated to a target keep rate — the
    * step before a corpus build that replaces a global hardcoded cut (the
    * ingest gate's 0.5) with data-derived per-source cutoffs: cutoff_e6 =
    * the quality of each source's k-th best doc, k = n·keepE6/1e6 (integer,
    * floor ≥ 1), so `quality_e6 >= cutoff_e6` keeps the best ~keepE6/1e6 of
    * the source. Ties at the cutoff are KEPT (never split
    * nondeterministically), so n_kept >= k. ONE scored scan — the compact
    * (id, source, tokens, quality) projection is checkpoint-pinned so its
    * three consumers (count agg, rank window, recount) never re-tokenize
    * the corpus — plus one rank window per source (the same exact-selection
    * price as `mixSources`) and a broadcast-joined recount; output is one
    * row per source. Returns (source, n_docs, cutoff_e6, n_kept).
    */
  def qualityThresholds(
      docs: DataFrame,
      keepE6: Long,
      shardCol: String = "source"): DataFrame = {
    require(keepE6 > 0 && keepE6 <= 1000000L, s"keepE6 must be in (0, 1e6], got $keepE6")
    val scored = Text.qualityScoredFromToks(
      docs.select(col("doc_id"), col(shardCol), Text.tokens(col("text")).as("toks")),
      keep = Seq(shardCol))
      .pinned(false)
    val w = Window.partitionBy(col(shardCol))
      .orderBy(col("quality_e6").desc, col("doc_id"))
    val counts = scored.groupBy(col(shardCol)).agg(count(lit(1)).as("n_docs"))
    val cut = scored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .join(broadcast(counts), Seq(shardCol))
      .filter(col("rnk") === expr(s"greatest(1L, n_docs * $keepE6 div 1000000L)"))
      .select(col(shardCol), col("n_docs"), col("quality_e6").as("cutoff_e6"))
    scored.join(broadcast(cut), Seq(shardCol))
      .filter(col("quality_e6") >= col("cutoff_e6"))
      .groupBy(col(shardCol), col("n_docs"), col("cutoff_e6"))
      .agg(count(lit(1)).as("n_kept"))
  }

  /** The SCALE path for threshold calibration: `qualityThresholds` pays one
    * rank window per source (a per-source SORT of the corpus — exact, but
    * the sort is the dominant cost at 100 TB). Here the cutoff is resolved
    * to BUCKET precision instead: quality_e6 is binned into `buckets`
    * integer bins, one partial+final aggregate counts (source, bucket)
    * occupancy, and a window over that TINY table (≤ sources × buckets
    * rows) walks cumulative counts from the top bucket down to the first
    * bucket where the running count reaches the target rank k. cutoff_e6 =
    * that bucket's lower bound, so `quality_e6 >= cutoff_e6` keeps at least
    * the target rate and overshoots by at most one bucket's occupancy
    * (cutoff error < 1e6/buckets micro-units). All arithmetic is integral —
    * engine-deterministic, DuckDB-replayable (`q_quality_thresholds_bkt`),
    * unlike approx-percentile sketches. No corpus sort, no per-source
    * funnel: ONE aggregate over the corpus is the only full-data pass.
    * Returns (source, n_docs, cutoff_e6, n_kept) like the exact form.
    */
  def qualityThresholdsBucketed(
      docs: DataFrame,
      keepE6: Long,
      buckets: Int = 1000,
      shardCol: String = "source"): DataFrame = {
    require(buckets > 0 && 1000000L % buckets == 0,
      s"buckets must divide 1e6 evenly, got $buckets")
    val scored = Text.qualityScoredFromToks(
      docs.select(col("doc_id"), col(shardCol), Text.tokens(col("text")).as("toks")),
      keep = Seq(shardCol))
      .select(col(shardCol), col("quality_e6").as("score_e6"))
    thresholdsBucketedFromScores(scored, keepE6, 1000000L / buckets, shardCol)
  }

  /** The bucketed cutoff walker behind `qualityThresholdsBucketed` and
    * `lmThresholdsBucketed`, generic over ANY integral score (negative
    * scores included — LM log-likelihoods are): `scored` holds one
    * (shardCol, score_e6) row per document. Bucket = floor(score/w) via an
    * explicit pmod (NOT `div`, which truncates toward zero and would put a
    * negative bucket's boundary at its top instead of its bottom, breaking
    * the keep-at-least-k guarantee), so `score_e6 >= cutoff_e6` always
    * keeps the whole cut bucket and everything above it. One aggregate over
    * the scores is the only full-data pass; the cumulative walk runs over
    * the tiny (shard, bucket) table.
    */
  def thresholdsBucketedFromScores(
      scored: DataFrame,
      keepE6: Long,
      bucketWidth: Long,
      shardCol: String = "source"): DataFrame = {
    require(keepE6 > 0 && keepE6 <= 1000000L, s"keepE6 must be in (0, 1e6], got $keepE6")
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val w = bucketWidth
    val h = scored
      .groupBy(col(shardCol),
        expr(s"(score_e6 - pmod(score_e6, ${w}L)) div ${w}L").as("b"))
      .agg(count(lit(1)).as("n"))
    val win = Window.partitionBy(col(shardCol)).orderBy(col("b").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = h.withColumn("cum", sum(col("n")).over(win))
    val counts = h.groupBy(col(shardCol)).agg(sum(col("n")).as("n_docs"))
    // the first (highest) bucket whose cumulative count reaches k: cum is
    // strictly increasing walking down, so max(b) and min(cum) land on the
    // same row
    cum.join(broadcast(counts), Seq(shardCol))
      .filter(col("cum") >= expr(s"greatest(1L, n_docs * $keepE6 div 1000000L)"))
      .groupBy(col(shardCol), col("n_docs"))
      .agg((max(col("b")) * w).as("cutoff_e6"), min(col("cum")).as("n_kept"))
      .select(col(shardCol), col("n_docs"), col("cutoff_e6"), col("n_kept"))
  }

  /** Per-source LM-score cutoff calibrated to a target keep rate — CCNet's
    * actual filter: where `qualityThresholds*` calibrate on the heuristic
    * `quality_e6`, this calibrates on the corpus-self bigram log-likelihood
    * (`Text.lmScore`'s avg_ll, the perplexity proxy), in micro-nats
    * (score_e6 = round(avg_ll·1e6), always negative). Same bucketed
    * machinery, same guarantee: `round(avg_ll*1e6) >= cutoff_e6` keeps at
    * least the best keepE6/1e6 of each source's SCORED docs (docs with < 2
    * tokens carry no bigrams and sit outside the calibration, as in CCNet).
    * The LM scoring dominates the cost; the calibration adds one aggregate
    * + a tiny-table walk. Returns (source, n_docs, cutoff_e6, n_kept).
    */
  def lmThresholdsBucketed(
      docs: DataFrame,
      keepE6: Long,
      bucketWidth: Long = LmBucketWidth,
      shardCol: String = "source"): DataFrame =
    thresholdsBucketedFromScores(lmScored(docs, shardCol), keepE6, bucketWidth, shardCol)

  /** (doc_id, shardCol, score_e6 = round(avg_ll·1e6)) — the integral LM
    * score projection both the calibration and the filter consume.
    */
  private def lmScored(docs: DataFrame, shardCol: String): DataFrame =
    Text.lmScore(docs)
      .join(docs.select(col("doc_id"), col(shardCol)), Seq("doc_id"))
      .select(col("doc_id"), col(shardCol),
        expr("cast(round(avg_ll * 1000000.0) as bigint)").as("score_e6"))

  /** The CCNet filter APPLIED, end-to-end: score every doc under the
    * corpus-self bigram LM, calibrate a per-source cutoff to the target
    * keep rate, and keep the docs at or above their source's cutoff.
    * `lmThresholdsBucketed` tells you where the knife falls; this cuts.
    * The expensive part (LM scoring) runs ONCE — the scored projection is
    * checkpoint-pinned because both the calibration aggregate and the
    * filter consume it — and the cutoff table (one row per source) joins
    * back as a broadcast, so the filter itself is a map-side gate. Keeps
    * at least keepE6/1e6 of each source's scored docs (bucket-resolution
    * overshoot only, same guarantee as the calibrator); unscored docs
    * (< 2 tokens, no bigrams) are dropped — under a perplexity filter,
    * no evidence means no pass. Returns (doc_id, source, score_e6).
    */
  def lmFilter(
      docs: DataFrame,
      keepE6: Long,
      bucketWidth: Long = LmBucketWidth,
      shardCol: String = "source"): DataFrame = {
    val scored = lmScored(docs, shardCol).pinned(false)
    val cut = thresholdsBucketedFromScores(scored, keepE6, bucketWidth, shardCol)
      .select(col(shardCol), col("cutoff_e6"))
    scored.join(broadcast(cut), Seq(shardCol))
      .filter(col("score_e6") >= col("cutoff_e6"))
      .select(col("doc_id"), col(shardCol), col("score_e6"))
  }

  /** CCNet's head/middle/tail split: every scored doc labeled by which
    * per-source LM-score tercile it falls in — CCNet shards its corpus into
    * exactly these three buckets (head = most-fluent third under the
    * reference LM) and downstream mixtures draw from them at different
    * rates. Two passes of the same bucketed calibrator (keep ≥ 1/3 and
    * ≥ 2/3) over ONE checkpoint-pinned scored projection; both one-row-per-
    * source cut tables broadcast back, so labeling is a map-side CASE.
    * Cutoffs are bucket-resolution like every calibrated threshold here.
    * Returns (doc_id, source, score_e6, tercile).
    */
  def lmTerciles(
      docs: DataFrame,
      bucketWidth: Long = LmBucketWidth,
      shardCol: String = "source"): DataFrame = {
    val scored = lmScored(docs, shardCol).pinned(false)
    val head = thresholdsBucketedFromScores(scored, 333334L, bucketWidth, shardCol)
      .select(col(shardCol), col("cutoff_e6").as("cut_head"))
    val mid = thresholdsBucketedFromScores(scored, 666667L, bucketWidth, shardCol)
      .select(col(shardCol), col("cutoff_e6").as("cut_mid"))
    scored.join(broadcast(head), Seq(shardCol)).join(broadcast(mid), Seq(shardCol))
      .select(col("doc_id"), col(shardCol), col("score_e6"),
        when(col("score_e6") >= col("cut_head"), "head")
          .when(col("score_e6") >= col("cut_mid"), "middle")
          .otherwise("tail").as("tercile"))
  }

  /** The SCALE path for mixture rebalancing: `mixSources` pays one rank
    * window per source for integer-EXACT quotas; here each source keeps
    * docs whose md5 hash falls under a per-source acceptance rate
    * (rate_e6 = quota·1e6 div n_docs) — a shuffle-free hash-gated scan,
    * the same mechanism as `Sampling.stratified`. Quota attainment is
    * binomial (±√quota) AROUND THE FLOORED RATE: because rate_e6 is an
    * integer div, the expected kept count undershoots the quota by up to
    * n_docs/1e6 docs on top of the binomial band (negligible until a
    * source holds many millions of docs against a tiny quota — at which
    * point the exact form is the right tool anyway). A rate that floors all
    * the way to 0 (quota·1e6 < n_docs) raises in-plan rather than silently
    * dropping the source. The selection itself is deterministic, rerun- and
    * partitioning-stable, and integral throughout, so the output is
    * hash-checkable against the DuckDB oracle (`q_mix_sources_approx`).
    * Use the exact form when quotas must be met to the document; this form
    * when the corpus is large enough that ±√quota is noise (at 100 TB it
    * always is).
    */
  def mixSourcesApprox(
      docs: DataFrame,
      weightsE6: DataFrame,
      shardCol: String = "source"): DataFrame = {
    val weights = weightsE6.select(
      col(shardCol),
      when(col("w_e6") > 0, col("w_e6")).otherwise(raise_error(
        concat(lit("mixSourcesApprox: w_e6 must be > 0 for source "),
          col(shardCol).cast("string")))).as("w_e6"))
    val counts = docs.groupBy(col(shardCol)).agg(count(lit(1)).as("n_docs"))
    val t = weights.join(counts, Seq(shardCol), "left")
      .select(min(when(col("n_docs").isNotNull,
        expr("n_docs * 1000000L div w_e6")).otherwise(raise_error(
        concat(lit("mixSourcesApprox: weight source absent from corpus: "),
          col(shardCol).cast("string"))))).as("t_total"))
    // A floored rate of 0 would silently drop the source entirely despite a
    // positive weight (quota·1e6 < n_docs), breaking both the exact form's
    // and this operator's loud-error contract — fail in-plan instead and
    // point at the exact form, which handles arbitrarily small quotas.
    val rates = weights.join(counts, Seq(shardCol)).crossJoin(broadcast(t))
      .withColumn("rate_e6",
        expr("(w_e6 * t_total div 1000000L) * 1000000L div n_docs"))
      .select(col(shardCol),
        when(col("rate_e6") > 0, col("rate_e6")).otherwise(raise_error(
          concat(lit("mixSourcesApprox: acceptance rate floored to 0 for source "),
            col(shardCol).cast("string"),
            lit(" (quota*1e6 < n_docs); use mixSources (exact) for quotas this small"))))
          .as("rate_e6"))
    docs
      .select(col("doc_id"), col(shardCol),
        expr(hashSql("concat('mix:', cast(doc_id as string))")).as("h"))
      .join(broadcast(rates), Seq(shardCol))
      .filter(pmod(col("h"), lit(1000000L)) < col("rate_e6"))
      .select(col("doc_id"), col(shardCol))
  }

  val ZBits = 10 // per-dimension bits; z fits in 20 bits

  /** Morton/Z-value of two bounded non-negative ints: bit i of x lands at
    * z-bit 2i, bit i of y at 2i+1 — pure div/mod/multiply integer
    * arithmetic, unrolled so BOTH engines evaluate the identical formula
    * (no engine shift operators). Inputs must be clamped to [0, 2^bits).
    */
  def zvalueSql(xCol: String, yCol: String, divOp: String, bits: Int = ZBits): String =
    (0 until bits).flatMap { i =>
      val d = 1L << i
      val z = 1L << (2 * i)
      Seq(s"(($xCol $divOp $d) % 2) * $z", s"(($yCol $divOp $d) % 2) * ${z * 2}")
    }.mkString(" + ")

  /** Z-order layout — multi-dimensional data-skipping for the written
    * corpus (the Delta/Iceberg `OPTIMIZE ZORDER BY` technique, available
    * here as a plain DataFrame op): documents range-partitioned and
    * locally sorted by the Morton interleave of two query dimensions, so
    * each output file covers a small rectangle of the (x, y) space and a
    * reader filtering on EITHER dimension skips most files via parquet
    * min/max stats — a single-column sort gives skipping on that column
    * only. The right layout when queries slice by (source, length),
    * (quality, date), etc. Plan: one range exchange on z (sampled range
    * bounds, the same mechanics as any global sort) + local sort — no
    * global sort, no driver involvement; at 100 TB this is the standard
    * write-side compaction pass.
    */
  def zorderLayout(
      docs: DataFrame,
      xExpr: String,
      yExpr: String,
      nFiles: Int): DataFrame = {
    require(nFiles > 0, s"nFiles must be positive, got $nFiles")
    val lim = (1L << ZBits) - 1
    docs
      .withColumn("__zx", expr(s"least($lim, greatest(0L, $xExpr))"))
      .withColumn("__zy", expr(s"least($lim, greatest(0L, $yExpr))"))
      .withColumn("zv", expr(zvalueSql("__zx", "__zy", "div")))
      .drop("__zx", "__zy")
      .repartitionByRange(nFiles, col("zv"))
      .sortWithinPartitions(col("zv"))
  }

  /** Data-skipping manifest over the z-ordered layout — the reader-side
    * half of `zorderLayout`: summarize each z-range shard by row count and
    * per-dimension min/max (what parquet footers / Delta-Iceberg manifests
    * store), and evaluate which shards a range predicate on EITHER
    * dimension must scan (stats-interval intersection — exactly how a
    * lakehouse reader prunes files). One agg over the corpus; the manifest
    * is nShards rows. Shards here are EQUAL-WIDTH z ranges
    * (`zv·nShards div 2^(2·ZBits)`) rather than the writer's sampled
    * range-exchange bounds, so the manifest is an analytic function of the
    * data — deterministic, oracle-checkable, and a faithful model of
    * skipping behavior (equal-frequency bounds only tighten it).
    *
    * SkippingSpec proves the contract: every row matching the predicate
    * lives in a must-scan shard (pruning is sound), and most shards are
    * skipped for a narrow slice on either dimension (pruning is effective —
    * the point of z-order vs single-column sort).
    */
  def skippingManifest(
      docs: DataFrame,
      xExpr: String,
      yExpr: String,
      nShards: Int = SkipShards,
      xRange: (Long, Long) = SkipXRange,
      yRange: (Long, Long) = SkipYRange): DataFrame = {
    val lim = (1L << ZBits) - 1
    val z = docs
      .withColumn("__zx", expr(s"least($lim, greatest(0L, $xExpr))"))
      .withColumn("__zy", expr(s"least($lim, greatest(0L, $yExpr))"))
      .withColumn("zv", expr(zvalueSql("__zx", "__zy", "div")))
    // equal-width shards over the OCCUPIED z range (data fills only the
    // low corner of the 2^(2·ZBits) space when dims are narrow): bounds
    // come from one broadcast 1-row agg, keeping shard ids analytic
    val zmax = z.agg(max(col("zv")).as("zmax"))
    z.crossJoin(broadcast(zmax))
      .withColumn("shard_id", expr(s"zv * $nShards div (zmax + 1)"))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("__zx")).as("min_x"), max(col("__zx")).as("max_x"),
        min(col("__zy")).as("min_y"), max(col("__zy")).as("max_y"))
      .withColumn("scan_x",
        col("min_x") <= xRange._2 && col("max_x") >= xRange._1)
      .withColumn("scan_y",
        col("min_y") <= yRange._2 && col("max_y") >= yRange._1)
  }

  val SkipShards = 64
  val SkipXRange: (Long, Long) = (3L, 5L) // source-number slice
  val SkipYRange: (Long, Long) = (16L, 24L) // n_chars/8 slice (128..200 chars)

  /** Temperature (α) mixture sampling — the multilingual/multi-source
    * reweighting of mBERT/XLM-R: sample source s with probability
    * ∝ n_s^α, flattening the natural distribution so small sources are not
    * drowned (α=1 keeps it, α→0 goes uniform). Here α = 0.5 FIXED, because
    * √ is the one fractional power both engines compute bit-identically
    * (IEEE-correctly-rounded sqrt; a general pow() differs in ULPs and
    * could flip the floor) — the α knob at other values belongs to the
    * exact `mixSources` with caller-computed weights. Weights are
    * engine-exact integers from there on: w_e6 = floor(√n_s · 1e6),
    * quota_s = totalDocs·w_e6 div Σw_e6, acceptance rate_e6 = quota·1e6
    * div n_s, capped at 1e6 — an α<1 UPweights small sources, and a rate
    * above 1e6 means the quota wants repetition, which is `epochPlan`'s
    * job, not a sampler's. Selection is the same shuffle-free hash-gated
    * scan as `mixSourcesApprox`; loud on rate-0 underflow, same contract.
    */
  def mixTemperature(
      docs: DataFrame,
      totalDocs: Long,
      shardCol: String = "source"): DataFrame = {
    require(totalDocs > 0, s"totalDocs must be positive, got $totalDocs")
    val counts = docs.groupBy(col(shardCol)).agg(count(lit(1)).as("n_docs"))
    val w = counts.withColumn("w_e6",
      expr("cast(floor(sqrt(cast(n_docs as double)) * 1000000.0) as bigint)"))
    val tot = w.agg(sum(col("w_e6")).as("tw"))
    val rates = w.crossJoin(broadcast(tot))
      .withColumn("rate_e6",
        least(lit(1000000L), expr(s"($totalDocs * w_e6 div tw) * 1000000L div n_docs")))
      .select(col(shardCol),
        when(col("rate_e6") > 0, col("rate_e6")).otherwise(raise_error(
          concat(lit("mixTemperature: acceptance rate floored to 0 for source "),
            col(shardCol).cast("string"),
            lit(" (quota*1e6 < n_docs); use mixSources (exact) for budgets this small"))))
          .as("rate_e6"))
    docs
      .select(col("doc_id"), col(shardCol),
        expr(hashSql("concat('mixt:', cast(doc_id as string))")).as("h"))
      .join(broadcast(rates), Seq(shardCol))
      .filter(pmod(col("h"), lit(1000000L)) < col("rate_e6"))
      .select(col("doc_id"), col(shardCol))
  }

  /** The REPETITION schedule a mixture implies under a total token budget —
    * the planning step run before `mixSources`/`tokenBudget`: given each
    * source's availability and its target weight, how many PASSES (epochs)
    * over the source does the budget demand? epochs_e6 > 1e6 means the
    * source must repeat — the data-constrained regime (Muennighoff et al.
    * 2023, "Scaling Data-Constrained Language Models": once the best
    * sources are smaller than their mixture share, repetition is the norm
    * and the epoch count is the knob that trades against it). One
    * tokenize + per-source aggregate is the only corpus pass; the weights
    * join is LOUD on absent sources, like every mixture operator. All
    * integer arithmetic: target_tokens = budget·w_e6 div 1e6, epochs_e6 =
    * target·1e6 div avail. Returns (source, n_docs, avail_tokens,
    * target_tokens, epochs_e6).
    */
  def epochPlan(
      docs: DataFrame,
      weightsE6: DataFrame,
      budgetTokens: Long,
      shardCol: String = "source"): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    val avail = docs
      .select(col(shardCol), size(Text.tokens(col("text"))).cast("long").as("n_toks"))
      .groupBy(col(shardCol))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("avail_tokens"))
    weightsE6.join(avail, Seq(shardCol), "left")
      .select(col(shardCol),
        when(col("n_docs").isNotNull, col("n_docs")).otherwise(raise_error(
          concat(lit("epochPlan: weight source absent from corpus: "),
            col(shardCol).cast("string")))).as("n_docs"),
        col("avail_tokens"),
        expr(s"${budgetTokens}L * w_e6 div 1000000L").as("target_tokens"))
      .withColumn("epochs_e6",
        // the engine/oracle `div` parity holds only on positive operands
        // (both truncate toward zero there); make the invariant explicit so
        // a zero/negative-availability edge raises instead of diverging
        when(col("avail_tokens") > 0,
          expr("target_tokens * 1000000L div avail_tokens"))
          .otherwise(raise_error(concat(
            lit("epochPlan: avail_tokens must be positive for source "),
            col(shardCol).cast("string")))))
  }

  /** Deterministic global shuffle into `nShards` training shards — the
    * layout step after packing: training wants documents in a fixed
    * pseudo-random order, reproducible across reruns and independent of
    * input partitioning. shard_id = md5(seed, doc_id) mod nShards (hash-
    * balanced, so no shard skew by construction), shard_pos = the doc's
    * rank inside its shard in (hash, doc_id) order — writer tasks emit each
    * shard's rows in shard_pos order and the global order is seeded-random.
    * One hash projection + the shared `shardedCumsum` rank (value = 1 per
    * row, ordered by (hash, id)): shard_pos is a running COUNT, so the
    * two-level prefix sum computes it with parallelism bounded by the
    * cluster's partitions, not by nShards — a corpus sharded into 8 training
    * files no longer funnels each shard through one window task (round-7
    * advice; small inputs take the adaptive plain-window path, where the
    * per-shard window is harmless). Shards are hash-balanced regardless of
    * how the corpus was previously laid out. Changing `seed` reshuffles
    * everything. Building this plan may run the adaptive cumsum's small
    * eager size probe (see `packSequences`).
    */
  def shuffleShards(
      docs: DataFrame,
      nShards: Int,
      seed: Long,
      idCol: String = "doc_id"): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val hashed = docs
      .select(col(idCol),
        expr(hashSql(s"concat('$seed:', cast($idCol as string))")).as("h"))
      .withColumn("shard_id", (col("h") % nShards).cast("long"))
      .withColumn("__one", lit(1L))
    shardedCumsum(hashed, "__one", "shard_id", Seq(col("h"), col(idCol)), "shard_pos")
      .select(col(idCol), col("shard_id"), col("shard_pos"))
  }

  val PackCapacity = 128L
  val BudgetTokens = 600L
  val KeepTargetE6 = 600000L // q_quality_thresholds: keep the best 60% per source
  val ThresholdBuckets = 1000 // q_quality_thresholds_bkt: 1e3 micro-unit bins
  val LmBucketWidth = 10000L // q_quality_thresholds_lm: 0.01-nat bins over avg_ll
  val EpochBudgetTokens = 1000000L // q_mix_epochs: 1M-token demo budget
  val ShuffleShards = 8
  val ShuffleSeed = 42L

  /** Skewed demo mixture: src0-9 get 7%, src10-19 get 3% (sums to 1e6
    * micro-units). The synthetic table is uniform across its 20 sources, so
    * a uniform target would keep everything — the skew makes quotas bite.
    */
  val MixTargetsE6: Seq[(String, Long)] =
    (0 to 9).map(i => s"src$i" -> 70000L) ++ (10 to 19).map(i => s"src$i" -> 30000L)

  private def mixWeightsDf(s: SparkSession): DataFrame = {
    import s.implicits._
    MixTargetsE6.toDF("source", "w_e6")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pack_sequences" -> ((s, d) => packSequences(Tables.documents(s, d), PackCapacity)),
    "q_pack_chunks" -> ((s, d) => packChunks(Tables.documents(s, d), PackCapacity)),
    "q_mix_sources" -> ((s, d) => mixSources(Tables.documents(s, d), mixWeightsDf(s))),
    "q_token_budget" -> ((s, d) => tokenBudget(Tables.documents(s, d), BudgetTokens)),
    "q_quality_hist" -> ((s, d) => qualityHistogram(Tables.documents(s, d))),
    "q_quality_thresholds" -> ((s, d) => qualityThresholds(Tables.documents(s, d), KeepTargetE6)),
    "q_quality_thresholds_bkt" -> ((s, d) =>
      qualityThresholdsBucketed(Tables.documents(s, d), KeepTargetE6, ThresholdBuckets)),
    "q_quality_thresholds_lm" -> ((s, d) =>
      lmThresholdsBucketed(Tables.documents(s, d), KeepTargetE6)),
    "q_quality_lm_filter" -> ((s, d) => lmFilter(Tables.documents(s, d), KeepTargetE6)),
    "q_quality_terciles" -> ((s, d) => lmTerciles(Tables.documents(s, d))),
    "q_mix_sources_approx" -> ((s, d) => mixSourcesApprox(Tables.documents(s, d), mixWeightsDf(s))),
    "q_mix_temperature" -> ((s, d) => mixTemperature(Tables.documents(s, d), 200L)),
    // z over (source ordinal, length bucket) — the "slice by source range
    // AND length range" layout; the oracle checks the interleave arithmetic,
    // CorpusSpec locks the range-exchange + local-sort layout plan
    "q_layout_zorder" -> ((s, d) =>
      zorderLayout(Tables.documents(s, d),
        "cast(substr(source, 4) as bigint)", "n_chars div 8", 8)
        .select(col("doc_id"), col("source"), col("n_chars"), col("zv"))),
    "q_skip_manifest" -> ((s, d) =>
      skippingManifest(Tables.documents(s, d),
        "cast(substr(source, 4) as bigint)", "n_chars div 8")),
    "q_mix_epochs" -> ((s, d) =>
      epochPlan(Tables.documents(s, d), mixWeightsDf(s), EpochBudgetTokens)),
    "q_text_novelty" -> ((s, d) => novelty(Tables.documents(s, d))),
    "q_vocab" -> ((s, d) => vocabulary(Tables.documents(s, d))),
    "q_shuffle_shards" -> ((s, d) =>
      shuffleShards(Tables.documents(s, d), ShuffleShards, ShuffleSeed)),
    "q_source_overlap" -> ((s, d) => sourceOverlap(Tables.documents(s, d))),
    // the SCALE path: df-cut before the self-join (hot-shingle bound); the
    // oracle applies the identical cut so the row is hash-checkable
    "q_source_overlap_cut" -> ((s, d) => sourceOverlap(Tables.documents(s, d), maxDf = OverlapMaxDf)),
    // the sketch path: no guard needed at any skew — one agg + an S×P pair phase
    "q_source_overlap_minhash" -> ((s, d) => sourceOverlapMinhash(Tables.documents(s, d))))

  /** df-cut for the oracle-checked scale variant: 12 of the demo's 20
    * sources, low enough that the cut provably bites at every sf.
    */
  val OverlapMaxDf = 12

  private val normSql = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
  private val duckToks = s"string_split($normSql, ' ')"

  /** Shared LM-cutoff CTE chain (mirrors Text.lmScore then the bucketed
    * walker): ends at `sc` (doc_id, source, s = score_e6), `h`/`c` (bucket
    * histogram + desc-cumulative walk) and `tot` — the thresholds query
    * reads the walk, the filter additionally joins `sc` against the cut.
    */
  private val duckLmCutoffCtes: String = {
    val w = LmBucketWidth
    s"""t AS (SELECT doc_id, $duckToks AS toks FROM documents),
       |inst AS (SELECT doc_id,
       |           unnest([{'u': ('0x' || substr(md5(toks[i]), 1, 15))::BIGINT,
       |                    'bg': ('0x' || substr(md5(toks[i] || ' ' || toks[i+1]), 1, 15))::BIGINT}
       |                   for i in range(1, len(toks))]) AS p
       |         FROM t WHERE len(toks) >= 2),
       |pd AS (SELECT doc_id, p.u AS u, p.bg AS bg, count(*) AS nd
       |       FROM inst GROUP BY 1, 2, 3),
       |cbg AS (SELECT bg, sum(nd) AS c_bg FROM pd GROUP BY 1),
       |cu AS (SELECT u, sum(nd) AS c_u FROM pd GROUP BY 1),
       |v AS (SELECT count(DISTINCT w) AS v
       |      FROM (SELECT unnest(toks) AS w FROM t)),
       |ll AS (SELECT doc_id,
       |         round(sum(CAST(nd AS DOUBLE) * (ln(CAST(c_bg + 1 AS DOUBLE)) - ln(CAST(c_u + v AS DOUBLE))))
       |               / sum(nd), 6) AS avg_ll
       |       FROM pd JOIN cbg USING (bg) JOIN cu USING (u) CROSS JOIN v
       |       GROUP BY doc_id),
       |sc AS (SELECT ll.doc_id, d.source, CAST(round(avg_ll * 1000000.0) AS BIGINT) AS s
       |       FROM ll JOIN documents d USING (doc_id)),
       |h AS (SELECT source, (s - ((s % $w) + $w) % $w) // $w AS b, count(*) AS n
       |      FROM sc GROUP BY 1, 2),
       |c AS (SELECT source, b, n,
       |        sum(n) OVER (PARTITION BY source ORDER BY b DESC
       |                     ROWS UNBOUNDED PRECEDING) AS cum
       |      FROM h),
       |tot AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_docs FROM h GROUP BY 1)""".stripMargin
  }

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

    "q_pack_chunks" ->
      s"""WITH t AS (SELECT doc_id, source, len($duckToks) AS n_tokens FROM documents),
         |c AS (SELECT doc_id, source, n_tokens,
         |        CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
         |                                 ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS strt
         |      FROM t),
         |e AS (SELECT doc_id, source, n_tokens, strt,
         |        unnest(generate_series(strt // $PackCapacity,
         |                               (strt + n_tokens - 1) // $PackCapacity)) AS pack_id
         |      FROM c WHERE n_tokens > 0)
         |SELECT doc_id, source, CAST(pack_id AS BIGINT) AS pack_id,
         |  CAST(greatest(0, pack_id * $PackCapacity - strt) AS BIGINT) AS tok_start,
         |  CAST(least(n_tokens, (pack_id + 1) * $PackCapacity - strt) AS BIGINT) AS tok_end,
         |  CAST(least(n_tokens, (pack_id + 1) * $PackCapacity - strt)
         |       - greatest(0, pack_id * $PackCapacity - strt) AS BIGINT) AS n_slice
         |FROM e""".stripMargin,

    "q_mix_sources" -> {
      val values = MixTargetsE6.map { case (s, w) => s"('$s', ${w})" }.mkString(", ")
      s"""WITH w AS (SELECT * FROM (VALUES $values) AS v(source, w_e6)),
         |c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
         |tt AS (SELECT min(n_docs * 1000000 // w_e6) AS t_total FROM c JOIN w USING (source)),
         |q AS (SELECT source, w_e6 * t_total // 1000000 AS quota
         |      FROM w JOIN c USING (source) CROSS JOIN tt),
         |r AS (SELECT doc_id, source,
         |        row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rnk
         |      FROM (SELECT doc_id, source,
         |              ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
         |            FROM documents))
         |SELECT doc_id, source, CAST(rnk AS BIGINT) AS rnk
         |FROM r JOIN q USING (source) WHERE rnk <= quota""".stripMargin
    },

    "q_token_budget" -> {
      val stop = Text.stopwords.map(w => s"'$w'").mkString(", ")
      s"""WITH t AS (SELECT doc_id, source, $duckToks AS toks FROM documents),
         |s AS (SELECT doc_id, source,
         |  len(toks) AS n_tokens,
         |  round(CAST(len(list_filter(toks, t -> t IN ($stop))) AS DOUBLE) / len(toks), 6) AS stop_ratio,
         |  round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6) AS uniq_ratio
         |FROM t),
         |q AS (SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
         |  CAST(floor((0.5 * least(1.0, CAST(n_tokens AS DOUBLE) / 80.0)
         |              + 0.3 * least(1.0, stop_ratio * 5.0)
         |              + 0.2 * uniq_ratio) * 1000000.0) AS BIGINT) AS quality_e6
         |FROM s),
         |c AS (SELECT *, sum(n_tokens) OVER (PARTITION BY source
         |        ORDER BY quality_e6 DESC, doc_id ROWS UNBOUNDED PRECEDING) AS cum_tokens
         |      FROM q)
         |SELECT doc_id, source, n_tokens, quality_e6, CAST(cum_tokens AS BIGINT) AS cum_tokens
         |FROM c WHERE cum_tokens <= $BudgetTokens""".stripMargin
    },

    "q_text_novelty" ->
      s"""WITH t AS (SELECT doc_id, $duckToks AS toks FROM documents),
         |shl AS (SELECT doc_id,
         |          unnest([('0x' || substr(md5(g), 1, 15))::BIGINT
         |                  for g in list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
         |                                          for i in range(1, len(toks) - 1)])]) AS sh
         |        FROM t WHERE len(toks) >= 3),
         |sh AS (SELECT DISTINCT doc_id, sh FROM shl),
         |f AS (SELECT sh, min(doc_id) AS first_doc FROM sh GROUP BY 1)
         |SELECT doc_id, count(*) AS n_shingles,
         |  CAST(sum(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
         |  round(CAST(sum(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END) AS DOUBLE)
         |        / count(*), 6) AS novelty
         |FROM sh JOIN f USING (sh) GROUP BY 1""".stripMargin,

    "q_quality_hist" -> {
      val stop = Text.stopwords.map(w => s"'$w'").mkString(", ")
      s"""WITH t AS (SELECT doc_id, $duckToks AS toks FROM documents),
         |s AS (SELECT doc_id,
         |  len(toks) AS n_tokens,
         |  round(CAST(len(list_filter(toks, t -> t IN ($stop))) AS DOUBLE) / len(toks), 6) AS stop_ratio,
         |  round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6) AS uniq_ratio
         |FROM t),
         |q AS (SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         |  CAST(floor((0.5 * least(1.0, CAST(n_tokens AS DOUBLE) / 80.0)
         |              + 0.3 * least(1.0, stop_ratio * 5.0)
         |              + 0.2 * uniq_ratio) * 1000000.0) AS BIGINT) AS quality_e6
         |FROM s),
         |h AS (SELECT least(9, quality_e6 // 100000) AS bucket,
         |        count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens
         |      FROM q GROUP BY 1),
         |tot AS (SELECT sum(n_docs) AS tot FROM h)
         |SELECT bucket, n_docs, n_tokens,
         |  round(CAST(n_docs AS DOUBLE) / tot, 6) AS doc_frac
         |FROM h CROSS JOIN tot""".stripMargin
    },

    "q_quality_thresholds" -> {
      val stop = Text.stopwords.map(w => s"'$w'").mkString(", ")
      s"""WITH t AS (SELECT doc_id, source, $duckToks AS toks FROM documents),
         |s AS (SELECT doc_id, source,
         |  len(toks) AS n_tokens,
         |  round(CAST(len(list_filter(toks, t -> t IN ($stop))) AS DOUBLE) / len(toks), 6) AS stop_ratio,
         |  round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6) AS uniq_ratio
         |FROM t),
         |q AS (SELECT doc_id, source,
         |  CAST(floor((0.5 * least(1.0, CAST(n_tokens AS DOUBLE) / 80.0)
         |              + 0.3 * least(1.0, stop_ratio * 5.0)
         |              + 0.2 * uniq_ratio) * 1000000.0) AS BIGINT) AS quality_e6
         |FROM s),
         |c AS (SELECT source, count(*) AS n_docs FROM q GROUP BY 1),
         |r AS (SELECT q.*, row_number() OVER (PARTITION BY source ORDER BY quality_e6 DESC, doc_id) AS rnk
         |      FROM q),
         |cut AS (SELECT r.source, c.n_docs, r.quality_e6 AS cutoff_e6
         |        FROM r JOIN c USING (source)
         |        WHERE rnk = greatest(1, n_docs * $KeepTargetE6 // 1000000))
         |SELECT q.source, cut.n_docs, cut.cutoff_e6, count(*) AS n_kept
         |FROM q JOIN cut ON q.source = cut.source AND q.quality_e6 >= cut.cutoff_e6
         |GROUP BY 1, 2, 3""".stripMargin
    },

    "q_quality_thresholds_bkt" -> {
      val stop = Text.stopwords.map(w => s"'$w'").mkString(", ")
      val w = 1000000L / ThresholdBuckets
      s"""WITH t AS (SELECT doc_id, source, $duckToks AS toks FROM documents),
         |s AS (SELECT doc_id, source,
         |  len(toks) AS n_tokens,
         |  round(CAST(len(list_filter(toks, t -> t IN ($stop))) AS DOUBLE) / len(toks), 6) AS stop_ratio,
         |  round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6) AS uniq_ratio
         |FROM t),
         |q AS (SELECT doc_id, source,
         |  CAST(floor((0.5 * least(1.0, CAST(n_tokens AS DOUBLE) / 80.0)
         |              + 0.3 * least(1.0, stop_ratio * 5.0)
         |              + 0.2 * uniq_ratio) * 1000000.0) AS BIGINT) AS quality_e6
         |FROM s),
         |h AS (SELECT source, quality_e6 // $w AS b, count(*) AS n FROM q GROUP BY 1, 2),
         |c AS (SELECT source, b, n,
         |        sum(n) OVER (PARTITION BY source ORDER BY b DESC
         |                     ROWS UNBOUNDED PRECEDING) AS cum
         |      FROM h),
         |tot AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_docs FROM h GROUP BY 1)
         |SELECT c.source, tot.n_docs,
         |  CAST(max(b) * $w AS BIGINT) AS cutoff_e6,
         |  CAST(min(cum) AS BIGINT) AS n_kept
         |FROM c JOIN tot USING (source)
         |WHERE cum >= greatest(1, n_docs * $KeepTargetE6 // 1000000)
         |GROUP BY 1, 2""".stripMargin
    },

    "q_quality_thresholds_lm" ->
      s"""WITH $duckLmCutoffCtes
         |SELECT c.source, tot.n_docs,
         |  CAST(max(b) * $LmBucketWidth AS BIGINT) AS cutoff_e6,
         |  CAST(min(cum) AS BIGINT) AS n_kept
         |FROM c JOIN tot USING (source)
         |WHERE cum >= greatest(1, n_docs * $KeepTargetE6 // 1000000)
         |GROUP BY 1, 2""".stripMargin,

    "q_quality_lm_filter" ->
      s"""WITH $duckLmCutoffCtes,
         |cut AS (SELECT c.source, CAST(max(b) * $LmBucketWidth AS BIGINT) AS cutoff_e6
         |        FROM c JOIN tot USING (source)
         |        WHERE cum >= greatest(1, n_docs * $KeepTargetE6 // 1000000)
         |        GROUP BY 1)
         |SELECT sc.doc_id, sc.source, sc.s AS score_e6
         |FROM sc JOIN cut USING (source)
         |WHERE sc.s >= cut.cutoff_e6""".stripMargin,

    "q_quality_terciles" ->
      s"""WITH $duckLmCutoffCtes,
         |cut1 AS (SELECT c.source, CAST(max(b) * $LmBucketWidth AS BIGINT) AS cut_head
         |         FROM c JOIN tot USING (source)
         |         WHERE cum >= greatest(1, n_docs * 333334 // 1000000)
         |         GROUP BY 1),
         |cut2 AS (SELECT c.source, CAST(max(b) * $LmBucketWidth AS BIGINT) AS cut_mid
         |         FROM c JOIN tot USING (source)
         |         WHERE cum >= greatest(1, n_docs * 666667 // 1000000)
         |         GROUP BY 1)
         |SELECT sc.doc_id, sc.source, sc.s AS score_e6,
         |  CASE WHEN sc.s >= cut1.cut_head THEN 'head'
         |       WHEN sc.s >= cut2.cut_mid THEN 'middle'
         |       ELSE 'tail' END AS tercile
         |FROM sc JOIN cut1 USING (source) JOIN cut2 USING (source)""".stripMargin,

    "q_mix_sources_approx" -> {
      val values = MixTargetsE6.map { case (s, w) => s"('$s', ${w})" }.mkString(", ")
      s"""WITH w AS (SELECT * FROM (VALUES $values) AS v(source, w_e6)),
         |c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
         |tt AS (SELECT min(n_docs * 1000000 // w_e6) AS t_total FROM c JOIN w USING (source)),
         |r AS (SELECT source, (w_e6 * t_total // 1000000) * 1000000 // n_docs AS rate_e6
         |      FROM w JOIN c USING (source) CROSS JOIN tt)
         |SELECT doc_id, source
         |FROM (SELECT doc_id, source,
         |        ('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
         |      FROM documents) JOIN r USING (source)
         |WHERE h % 1000000 < rate_e6""".stripMargin
    },

    "q_layout_zorder" -> {
      val lim = (1L << ZBits) - 1
      s"""WITH b AS (SELECT doc_id, source, n_chars,
         |  least($lim, greatest(0, CAST(substr(source, 4) AS BIGINT))) AS zx,
         |  least($lim, greatest(0, n_chars // 8)) AS zy
         |  FROM documents)
         |SELECT doc_id, source, n_chars, ${zvalueSql("zx", "zy", "//")} AS zv
         |FROM b""".stripMargin
    },

    "q_skip_manifest" -> {
      val lim = (1L << ZBits) - 1
      s"""WITH b AS (SELECT
         |  least($lim, greatest(0, CAST(substr(source, 4) AS BIGINT))) AS zx,
         |  least($lim, greatest(0, n_chars // 8)) AS zy
         |  FROM documents),
         |z AS (SELECT zx, zy, ${zvalueSql("zx", "zy", "//")} AS zv FROM b),
         |zm AS (SELECT max(zv) AS zmax FROM z),
         |m AS (SELECT zv * $SkipShards // (zmax + 1) AS shard_id, count(*) AS n_rows,
         |        min(zx) AS min_x, max(zx) AS max_x, min(zy) AS min_y, max(zy) AS max_y
         |      FROM z CROSS JOIN zm GROUP BY 1)
         |SELECT shard_id, n_rows, min_x, max_x, min_y, max_y,
         |  (min_x <= ${SkipXRange._2} AND max_x >= ${SkipXRange._1}) AS scan_x,
         |  (min_y <= ${SkipYRange._2} AND max_y >= ${SkipYRange._1}) AS scan_y
         |FROM m""".stripMargin
    },

    "q_mix_temperature" ->
      """WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
        |w AS (SELECT source, n_docs,
        |        CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000000.0) AS BIGINT) AS w_e6
        |      FROM c),
        |t AS (SELECT CAST(sum(w_e6) AS BIGINT) AS tw FROM w),
        |r AS (SELECT source,
        |        least(1000000, ((200 * w_e6) // tw) * 1000000 // n_docs) AS rate_e6
        |      FROM w CROSS JOIN t)
        |SELECT doc_id, source
        |FROM (SELECT doc_id, source,
        |        ('0x' || substr(md5('mixt:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |      FROM documents) JOIN r USING (source)
        |WHERE h % 1000000 < rate_e6""".stripMargin,

    "q_mix_epochs" -> {
      val values = MixTargetsE6.map { case (s, w) => s"('$s', ${w})" }.mkString(", ")
      s"""WITH w AS (SELECT * FROM (VALUES $values) AS v(source, w_e6)),
         |a AS (SELECT source, count(*) AS n_docs,
         |        CAST(sum(len($duckToks)) AS BIGINT) AS avail_tokens
         |      FROM documents GROUP BY 1)
         |SELECT source, n_docs, avail_tokens,
         |  CAST(${EpochBudgetTokens}::BIGINT * w_e6 // 1000000 AS BIGINT) AS target_tokens,
         |  CAST((${EpochBudgetTokens}::BIGINT * w_e6 // 1000000) * 1000000::BIGINT // avail_tokens AS BIGINT) AS epochs_e6
         |FROM w JOIN a USING (source)""".stripMargin
    },

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

    "q_shuffle_shards" ->
      s"""WITH h AS (SELECT doc_id,
         |             ('0x' || substr(md5('$ShuffleSeed:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
         |           FROM documents),
         |s AS (SELECT doc_id, h, h % $ShuffleShards AS shard_id FROM h)
         |SELECT doc_id, CAST(shard_id AS BIGINT) AS shard_id,
         |  CAST(row_number() OVER (PARTITION BY shard_id ORDER BY h, doc_id) AS BIGINT) AS shard_pos
         |FROM s""".stripMargin,

    "q_source_overlap_minhash" -> {
      val duckSrcPerms = srcPermCoeffs.zipWithIndex
        .map { case ((a, b), i) => s"($i, ${a}, ${b})" }
        .mkString("SELECT * FROM (VALUES ", ", ", ") AS v(i, a, b)")
      s"""WITH perms AS ($duckSrcPerms),
         |t AS (SELECT source, $duckToks AS toks FROM documents),
         |shl AS (SELECT source,
         |          unnest([('0x' || substr(md5(g), 1, 15))::BIGINT % ${MersennePrime}
         |                  for g in list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
         |                                          for i in range(1, len(toks) - 1)])]) AS h
         |        FROM t WHERE len(toks) >= 3),
         |sh AS (SELECT DISTINCT source, h FROM shl),
         |mh AS (SELECT source, p.i AS i, min((p.a * h + p.b) % ${MersennePrime}) AS m
         |       FROM sh, perms p GROUP BY 1, 2),
         |pr AS (SELECT a.source AS src_a, b.source AS src_b,
         |         sum(CASE WHEN a.m = b.m THEN 1 ELSE 0 END) AS n_match
         |       FROM mh a JOIN mh b ON a.i = b.i AND a.source < b.source
         |       GROUP BY 1, 2)
         |SELECT src_a, src_b, CAST(n_match AS BIGINT) AS n_match,
         |  round(CAST(n_match AS DOUBLE) / $SrcMinhashPerms, 6) AS est_jaccard
         |FROM pr""".stripMargin
    },

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
         |FROM p JOIN sizes x ON x.source = p.src_a JOIN sizes y ON y.source = p.src_b""".stripMargin,

    "q_source_overlap_cut" ->
      s"""WITH t AS (SELECT source, $duckToks AS toks FROM documents),
         |shl AS (SELECT source,
         |          unnest([('0x' || substr(md5(g), 1, 15))::BIGINT
         |                  for g in list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
         |                                          for i in range(1, len(toks) - 1)])]) AS sh
         |        FROM t WHERE len(toks) >= 3),
         |sh AS (SELECT DISTINCT source, sh FROM shl),
         |sizes AS (SELECT source, count(*) AS n_sh FROM sh GROUP BY 1),
         |cut AS (SELECT source, sh FROM
         |          (SELECT source, sh, count(*) OVER (PARTITION BY sh) AS df FROM sh)
         |        WHERE df <= $OverlapMaxDf),
         |p AS (SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
         |      FROM cut a JOIN cut b ON a.sh = b.sh AND a.source < b.source
         |      GROUP BY 1, 2)
         |SELECT src_a, src_b, n_shared,
         |  round(CAST(n_shared AS DOUBLE) / (x.n_sh + y.n_sh - n_shared), 6) AS jaccard
         |FROM p JOIN sizes x ON x.source = p.src_a JOIN sizes y ON y.source = p.src_b""".stripMargin)
}
