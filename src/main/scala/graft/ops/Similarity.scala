package graft.ops

import graft.Tables
import graft.functions.{Determinism, GraftFunctions}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Pinned.PinnedOps

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`, 64-dim in the test tables).
  *
  * Two paths, as a 100 TB pipeline needs both:
  *   - `bruteTopK`: exact cosine top-k. The query set broadcasts; the corpus
  *     streams through a codegen'd DotProduct; per-query top-k is a
  *     row_number window over a tiny (|Q| keys) shuffle. The right plan
  *     whenever |Q| is small.
  *   - `lshTopK`: multi-table sign-random-projection LSH. Each vector gets L
  *     bucket codes (map-only); candidate generation is an equi-join on
  *     (table, code) — the corpus is hashed ONCE and the quadratic compare
  *     disappears. Recall tuned by (L, bits); recall vs brute is asserted in
  *     SimilaritySpec.
  *
  * Vectors are L2-normalized once up front, so every cosine is ONE dot
  * product. Hyperplanes are deterministic ±1 sign vectors derived from md5
  * bits (Determinism.signs) and inlined as literals — no RNG state, no
  * per-row hashing, and the oracle SQL embeds the identical constants.
  */
object Similarity {

  val QueryCount = 10 // query set = vec_id < 10
  val TopK = 5
  // 6 tables x 4 bits: on weakly-clustered data (random gaussian vectors,
  // top-neighbor cosines ~0.4) short codes + more tables win — per-table
  // collision p = (1 - theta/pi)^bits, union across tables. 4 bits keeps
  // p~0.16 per table for cos 0.4, giving ~0.6 recall@5 at 24 planes total.
  val LshTables = 6
  val LshBits = 4

  /** ±1 hyperplane components, plane j = md5 bits of "hp:j". */
  val planes: IndexedSeq[IndexedSeq[Double]] =
    (0 until LshTables * LshBits).map(j => Determinism.signs(s"hp:$j", 64))

  /** L2-normalized double vectors: nv = v / sqrt(<v,v>), computed map-side
    * once. Cast float→double FIRST — multiplying in float then widening
    * would differ from the oracle's double math.
    */
  def normalized(embs: DataFrame): DataFrame =
    embs
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(GraftFunctions.dot(col("v"), col("v"))))
      .select(col("vec_id"), expr("transform(v, x -> x / nrm)").as("nv"))

  /** Exact cosine top-k for each query vector. */
  def bruteTopK(embs: DataFrame): DataFrame = {
    val e = normalized(embs)
    val q = e.filter(col("vec_id") < QueryCount)
      .select(col("vec_id").as("q_id"), col("nv").as("qv"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    e.select(col("vec_id").as("n_id"), col("nv").as("nvec"))
      .join(broadcast(q), col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"), GraftFunctions.dot(col("qv"), col("nvec")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("q_id"), col("rank").cast("long").as("rank"), col("n_id"),
        round(col("cos"), 6).as("cos"))
  }

  /** Bucket code for table t: bit b = sign of <nv, plane_{t*bits+b}>. */
  private def codeCol(t: Int): Column =
    (0 until LshBits).map { b =>
      when(GraftFunctions.dot(col("nv"), lit(planes(t * LshBits + b).toArray)) > 0,
        lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  private def coded(embs: DataFrame): DataFrame =
    normalized(embs)
      .select(col("vec_id"), col("nv"),
        explode(array((0 until LshTables).map(t =>
          struct(lit(t).as("tbl"), codeCol(t).as("code"))): _*)).as("tc"))
      .select(col("vec_id"), col("nv"), col("tc.tbl"), col("tc.code"))

  /** LSH-bucketed approximate top-k: candidates = corpus vectors sharing any
    * (table, code) bucket with the query, ranked by exact cosine within the
    * candidate set.
    */
  def lshTopK(embs: DataFrame): DataFrame = {
    val cd = coded(embs)
    // Bucket join + candidate dedup carry ONLY ids and codes — never the
    // 64-dim vectors (a multi-table LSH emits L rows per vector; shuffling
    // vectors through the bucket join and the distinct would multiply the
    // shuffle volume by dim×L). Vectors re-attach per unique pair via two
    // id equi-joins against the map-only normalized projection.
    val q = cd.filter(col("vec_id") < QueryCount)
      .select(col("tbl"), col("code"), col("vec_id").as("q_id"))
    val c = cd.select(col("tbl"), col("code"), col("vec_id").as("n_id"))
    val e = normalized(embs)
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    q.join(c, Seq("tbl", "code"))
      .filter(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id")).distinct()
      .join(e.select(col("vec_id").as("q_id"), col("nv").as("qv")), Seq("q_id"))
      .join(e.select(col("vec_id").as("n_id"), col("nv").as("nvec")), Seq("n_id"))
      .select(col("q_id"), col("n_id"), GraftFunctions.dot(col("qv"), col("nvec")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("q_id"), col("rank").cast("long").as("rank"), col("n_id"),
        round(col("cos"), 6).as("cos"))
  }

  val IvfCells = 16 // coarse-quantizer cells
  val IvfProbes = 3 // cells probed per query

  /** IVF-style ANN: a coarse quantizer assigns every vector to its nearest
    * "centroid" cell (map-side broadcast compare); queries probe only the
    * nprobe nearest cells — the partition-pruning shape of vector search: at
    * 100 TB the corpus is laid out cell-partitioned and a probe touches
    * nprobe/cells of the data. Centroids here are the first `IvfCells`
    * vectors (deterministic, training-free); `ivfTopKTrained` runs the same
    * probe flow over a k-means-trained quantizer.
    */
  def ivfTopK(embs: DataFrame): DataFrame = {
    val e = normalized(embs)
    val cents = e.filter(col("vec_id") < IvfCells)
      .select(col("vec_id").as("cell"), col("nv").as("cv"))
    // cell assignment: nearest centroid by cosine (ties -> lowest cell id).
    // Corpus side = the argmax aggregate (shuffles N rows, never N×cells);
    // the top-IvfProbes rank runs only over the query-sized side.
    val corpusCells = ivfAssign(e, cents)
      .select(col("cell"), col("vec_id").as("n_id"), col("nv").as("nvec"))
    val queryProbes = ivfAssign(e.filter(col("vec_id") < QueryCount), cents, IvfProbes)
      .select(col("cell"), col("vec_id").as("q_id"), col("nv").as("qv"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    queryProbes.join(corpusCells, Seq("cell"))
      .filter(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"), GraftFunctions.dot(col("qv"), col("nvec")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("q_id"), col("rank").cast("long").as("rank"), col("n_id"),
        round(col("cos"), 6).as("cos"))
  }

  // --- incremental index maintenance (increment vs built index) ------------

  /** Cell assignment against a GIVEN centroid table — the `FromSigs`
    * convention (Dedup.incrementalNearDupPairsFromSigs) applied to the
    * vector index: `ivfTopK`/`ivfTopKTrained` derive their quantizer from
    * the corpus per call, which re-indexes history on every refresh of a
    * growing corpus; here the quantizer is an INPUT, so an increment is
    * assigned against the frozen centroids and history's assignment rows
    * are never recomputed. Assignment is per-row (broadcast argmax-cosine
    * compare, ties → lowest cell), so indexing the union == union of the
    * indexes — the cross-split equality SimilaritySpec asserts. Returns
    * (cell, vec_id, nv, crk) with crk <= `probes`: probes=1 builds the
    * stored index (each vector in its nearest cell), probes=IvfProbes
    * computes a query set's probe fan-out.
    */
  def ivfAssign(e: DataFrame, cents: DataFrame, probes: Int = 1): DataFrame = {
    val scored = e.join(broadcast(cents), lit(true))
      .select(col("vec_id"), col("nv"), col("cell"),
        GraftFunctions.dot(col("nv"), col("cv")).as("ccos"))
    if (probes == 1)
      // argmax as a map-side-combining aggregate: a row_number window here
      // would shuffle ALL |e|×|cents| scored rows (the dominant exchange of
      // every index build once cells scale); min(struct) collapses each
      // vector's candidate rows BEFORE the exchange, so the shuffle carries
      // |e| rows regardless of the cell count. Identical tie semantics to
      // orderBy(ccos desc, cell) rank 1; nv rides in the struct and is
      // never compared — (−ccos, cell) is unique within a vec_id group.
      scored.groupBy(col("vec_id"))
        .agg(min(struct(negate(col("ccos")), col("cell"), col("nv"))).as("w"))
        .select(col("w.cell").as("cell"), col("vec_id"), col("w.nv").as("nv"),
          lit(1).as("crk"))
    else {
      // top-`probes` cells need a rank; callers only pass QUERY-sized
      // inputs here (|e| = QueryCount), so this window is tiny by contract.
      val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cell"))
      scored.withColumn("crk", row_number().over(wAssign))
        .filter(col("crk") <= probes)
        .select(col("cell"), col("vec_id"), col("nv"), col("crk"))
    }
  }

  // --- two-level (IMI-style) assignment for corpus-scaled cell counts -----

  /** Below this cell count the flat argmax is both cheaper and exact; the
    * shipped fixtures sit at k ≤ 160 (sf10), so every oracle-gated SF takes
    * the flat path bit-unchanged. */
  val TwoLevelMinCells = 256L
  /** Coarse-table ceiling: √k beyond 65536 means k > 4.3e9 cells — at the
    * SemDeDup sizing that is >5e12 vectors, where the corpus should be
    * sharded across index builds rather than one quantizer. */
  val MaxCoarseCells = 65536L

  /** Cell assignment that stays sub-quadratic when the cell count scales
    * with the corpus (inverted-multi-index style, Babenko & Lempitsky 2012):
    * a flat argmax over k centroids is N×k dot products and a broadcast ∝ k
    * — with SemDeDup's k = ⌈N/1250⌉ that is N²/1250 FLOPs and an unbounded
    * broadcast (the round-12 sf100 probe measured 632 s at 2M vectors).
    * Two-level instead:
    *
    *   1. pick c = ⌈√k⌉ COARSE centroids (the lowest-c fine centroids — the
    *      same training-free lowest-id convention as the fine table);
    *   2. group the k fine centroids into coarse families by argmax against
    *      the coarse table (k×c dots, vanishing);
    *   3. stage 1: each vector argmaxes over the c coarse centroids — N×√k
    *      dots under a √k-bounded broadcast;
    *   4. stage 2: each vector ranks ONLY its family's fine members via an
    *      equi-join on the family key — N×(k/c) ≈ N×√k dots, and the fine
    *      table is a JOIN side, never a broadcast, so no broadcast grows
    *      with the corpus.
    *
    * Total N×2√k FLOPs. Both argmaxes are the map-side-combining
    * min(struct) aggregate (shuffle carries N rows). The assignment is
    * approximate in the IMI sense — a vector whose true nearest fine
    * centroid sits in a different coarse family lands in its family's best
    * instead — which is exactly the trade every trained quantizer already
    * makes; for SemDeDup any deterministic partition is a valid cell map.
    * No vector can drop at the family join: fine cell j < c is PINNED to
    * family j (it is coarse centroid j — self-assignment is the true argmax,
    * and pinning removes the float-rounding hazard where a near-duplicate
    * coarse pair empties a family that some vector still coarse-argmaxes
    * to), so every coarse family contains its own fine centroid and the
    * equi-join is total. Exact-duplicate coarse ties still route vectors to
    * the min-index family (TwoLevelAssignSpec pins both properties).
    *
    * k ≤ `TwoLevelMinCells` short-circuits to the exact flat argmax, so
    * every shipped fixture (k ≤ 160 through sf10) is bit-unchanged.
    */
  def assignCells(e: DataFrame, cents: DataFrame, k: Long): DataFrame =
    if (k <= TwoLevelMinCells) ivfAssign(e, cents)
    else {
      val c = math.ceil(math.sqrt(k.toDouble)).toLong
      require(c <= MaxCoarseCells,
        s"assignCells: √k = $c coarse cells exceeds $MaxCoarseCells — shard the corpus " +
          "across per-partition index builds instead of growing one quantizer")
      val coarse = cents.filter(col("cell") < c)
        .select(col("cell").as("ccell"), col("cv").as("ccv"))
      // Fine cell j < c IS coarse centroid j: pin it to its own family
      // rather than trusting the computed self-argmax — float rounding on a
      // NEAR-duplicate coarse pair (dot(f_j, c_j') landing a ulp above
      // dot(f_j, f_j)) could otherwise empty family j while some vector
      // still coarse-argmaxes to j, and the inner family join below would
      // silently drop that vector. With the pin every coarse family
      // provably contains its own fine centroid, so the join is total.
      val fam = cents.join(broadcast(coarse), lit(true))
        .select(col("cell"), col("cv"), col("ccell"),
          GraftFunctions.dot(col("cv"), col("ccv")).as("fcos"))
        .groupBy(col("cell"))
        .agg(min(struct(negate(col("fcos")), col("ccell"), col("cv"))).as("w"))
        .select(
          when(col("cell") < c, col("cell")).otherwise(col("w.ccell")).as("ccell"),
          col("cell"), col("w.cv").as("cv"))
      val vcoarse = e.join(broadcast(coarse), lit(true))
        .select(col("vec_id"), col("nv"), col("ccell"),
          GraftFunctions.dot(col("nv"), col("ccv")).as("ccos"))
        .groupBy(col("vec_id"))
        .agg(min(struct(negate(col("ccos")), col("ccell"), col("nv"))).as("w"))
        .select(col("w.ccell").as("ccell"), col("vec_id"), col("w.nv").as("nv"))
      vcoarse.join(fam, Seq("ccell"))
        .select(col("vec_id"), col("nv"), col("cell"),
          GraftFunctions.dot(col("nv"), col("cv")).as("ccos"))
        .groupBy(col("vec_id"))
        .agg(min(struct(negate(col("ccos")), col("cell"), col("nv"))).as("w"))
        .select(col("w.cell").as("cell"), col("vec_id"), col("w.nv").as("nv"),
          lit(1).as("crk"))
    }

  /** Vectors per cell the scaled IVF sizes its quantizer for (the SemDeDup
    * convention): k = max(IvfCells, ⌈N/IvfTargetCell⌉) keeps candidate
    * lists CONSTANT-sized as the corpus grows — the shape a real ANN
    * index must have at 100 TB, where fixed k would make every probe scan
    * N/k ∝ N vectors. */
  val IvfTargetCell = 1250

  /** IVF top-k with a CORPUS-SCALED quantizer — the production form of
    * `ivfTopK` (whose fixed 16 cells are a demo knob): cells scale with
    * the corpus so per-probe work stays constant, and the corpus-side
    * assignment rides [[assignCells]] (flat argmax through 256 cells —
    * every DuckDB-verified SF — then the two-level IMI path, N×2√k dots
    * under a √k-bounded broadcast). The query side inverts the broadcast:
    * the QUERY SET broadcasts against the centroid table (cents stays a
    * stream-side join input, so nothing corpus-sized is ever shipped to
    * every task), with the per-query top-probes rank a window over |Q|
    * keys. One count() job sizes k — the documented model-parameter read
    * class (same as semanticDedup's).
    */
  def ivfTopKScaled(embs: DataFrame): DataFrame = {
    val e = pinnedNormalized(embs)
    val k = math.max(IvfCells.toLong, (embs.count() + IvfTargetCell - 1) / IvfTargetCell)
    ivfTopKGivenK(e, k)
  }

  /** Explicit repartition before a k-scaled assignment — the vector scan
    * is byte-small but the N×k expansion is CPU-dense, so file-split
    * partitioning serializes it (the semanticDedup/unigram trap, PLANS.md;
    * measured here: sf10 47.8 s at ~3 busy cores without it). The pin
    * (graft.Pinned) then FIXES the widened partitioning for every consumer.
    */
  private def pinnedNormalized(embs: DataFrame): DataFrame = {
    val n = embs.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    normalized(embs).repartition(n).pinned(false)
  }

  /** The scaled-IVF search body over an already-pinned normalized corpus and
    * an explicit cell count (`ivfTopKScaled` passes the corpus-derived k;
    * `ivfTopKTwoLevel` forces `TwoLevelOracleK` so the IMI branch runs at
    * oracle-verified SFs).
    */
  private def ivfTopKGivenK(e: DataFrame, k: Long): DataFrame = {
    val cents2 = e.filter(col("vec_id") < k)
      .select(col("vec_id").as("cell"), col("nv").as("cv"))
    val corpusCells = assignCells(e, cents2, k)
      .select(col("cell"), col("vec_id").as("n_id"), col("nv").as("nvec"))
    val qe = e.filter(col("vec_id") < QueryCount)
      .select(col("vec_id").as("q_id"), col("nv").as("qv"))
    val wProbe = Window.partitionBy(col("q_id")).orderBy(col("ccos").desc, col("cell"))
    val queryProbes = cents2.join(broadcast(qe), lit(true))
      .select(col("cell"), col("q_id"), col("qv"),
        GraftFunctions.dot(col("qv"), col("cv")).as("ccos"))
      .withColumn("crk", row_number().over(wProbe))
      .filter(col("crk") <= IvfProbes)
      .select(col("cell"), col("q_id"), col("qv"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    queryProbes.join(corpusCells, Seq("cell"))
      .filter(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"), GraftFunctions.dot(col("qv"), col("nvec")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("q_id"), col("rank").cast("long").as("rank"), col("n_id"),
        round(col("cos"), 6).as("cos"))
  }

  /** Forced-two-level k for the oracle-gated IMI queries (round-14 item 1):
    * strictly above `TwoLevelMinCells` so `assignCells` takes the two-level
    * branch at EVERY DuckDB-verified SF (the smallest fixture has 500
    * vectors ≥ this many centroids), and mirrored literally into the oracle
    * CTEs. The production `ivfTopKScaled` still derives k from the corpus;
    * this knob exists so the scaled branch itself passes the hash gate
    * instead of being bench-only sf100 evidence.
    */
  val TwoLevelOracleK = 400L
  /** ⌈√TwoLevelOracleK⌉, inlined into the oracle SQL. */
  val TwoLevelOracleC: Long = math.ceil(math.sqrt(TwoLevelOracleK.toDouble)).toLong

  /** The raw two-level (IMI) cell assignment as a query: (vec_id, cell) for
    * every corpus vector against the first-`TwoLevelOracleK` quantizer. This
    * is the DIRECT hash gate on the `assignCells` k > 256 branch — the full
    * search queries only surface assignments of top-k candidates, so a
    * mis-assigned non-candidate would escape them.
    */
  def twoLevelAssignment(embs: DataFrame): DataFrame = {
    val e = pinnedNormalized(embs)
    val cents = e.filter(col("vec_id") < TwoLevelOracleK)
      .select(col("vec_id").as("cell"), col("nv").as("cv"))
    assignCells(e, cents, TwoLevelOracleK).select(col("vec_id"), col("cell"))
  }

  /** `ivfTopKScaled`'s exact pipeline with k forced past the two-level
    * threshold — the production search shape riding the IMI branch at an
    * oracle-verified SF.
    */
  def ivfTopKTwoLevel(embs: DataFrame): DataFrame =
    ivfTopKGivenK(pinnedNormalized(embs), TwoLevelOracleK)

  /** IVF probe over a PRECOMPUTED index table (`ivfAssign(_, cents)` rows,
    * possibly unioned across increments): only the query set is assigned at
    * query time — the corpus-wide assignment pass that `ivfTopK` pays per
    * call is gone, which is the point of maintaining the index
    * incrementally. Same ranked-top-k contract as every other ANN path.
    */
  def ivfTopKFromIndex(index: DataFrame, qe: DataFrame, cents: DataFrame): DataFrame = {
    val queryProbes = ivfAssign(qe.filter(col("vec_id") < QueryCount), cents, IvfProbes)
      .select(col("cell"), col("vec_id").as("q_id"), col("nv").as("qv"))
    val corpusCells = index.select(col("cell"), col("vec_id").as("n_id"), col("nv").as("nvec"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    queryProbes.join(corpusCells, Seq("cell"))
      .filter(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"), GraftFunctions.dot(col("qv"), col("nvec")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("q_id"), col("rank").cast("long").as("rank"), col("n_id"),
        round(col("cos"), 6).as("cos"))
  }

  // Split fixture: increment = every 5th vec_id (the q_dedup_incr_* split
  // convention); frozen centroids = the IvfCells lowest-id HISTORY vectors —
  // among vec_id < 20 exactly the 16 non-multiples of 5, so the quantizer is
  // derived from the already-indexed corpus, as a real refresh would have it.
  val IncrSplit = 5
  val IncrCentMax = 20

  def incrCentroids(e: DataFrame): DataFrame =
    e.filter(col("vec_id") < IncrCentMax && col("vec_id") % IncrSplit =!= 0)
      .select(col("vec_id").as("cell"), col("nv").as("cv"))

  /** The incremental-maintenance composition on the split fixture: history
    * and the increment are indexed SEPARATELY against the frozen
    * history-derived centroids and the stored index is their union — at
    * scale the history half is the persisted index table and only the
    * increment's `ivfAssign` ever runs. Identical top-k to a full rebuild
    * against the same centroids (per-row assignment commutes with union;
    * SimilaritySpec asserts both equalities), hash-checked by the oracle.
    */
  def ivfTopKIncr(embs: DataFrame): DataFrame = {
    val e = normalized(embs).pinned(false)
    val cents = incrCentroids(e)
    val index = ivfAssign(e.filter(col("vec_id") % IncrSplit =!= 0), cents)
      .unionByName(ivfAssign(e.filter(col("vec_id") % IncrSplit === 0), cents))
    ivfTopKFromIndex(index, e, cents)
  }

  // --- product quantization ------------------------------------------------

  val PqSubspaces = 8 // 64 dims -> 8 subvectors of 8 dims
  val PqSubDim = 8
  val PqCodes = 16 // centroids per subspace codebook -> 4-bit codes

  /** PQ-ADC approximate search — the MEMORY-COMPRESSED scale path: every
    * corpus vector is encoded as `PqSubspaces` small codes (here 8×4 bits
    * = 4 bytes standing in for 256 bytes of floats — at 100 TB the
    * difference between an index that fits in executor memory and one
    * that doesn't), and each query scores candidates by Asymmetric
    * Distance Computation: approx <q, x> = Σ_j <q_j, c_{j, code_j(x)}>
    * (Jégou et al. 2011, "Product Quantization for Nearest Neighbor
    * Search"). Codebooks are training-free (subvectors of the first
    * `PqCodes` vectors — the `ivfTopK` convention; a k-means-trained
    * codebook would slot in exactly like `trainedCentroids`); encoding
    * picks each subspace's min-L2 centroid (ties → lowest code).
    *
    * Plan shape: encoding is a map-side broadcast compare per subspace
    * (the codebook is PqSubspaces×PqCodes tiny rows); scoring joins the
    * tiny query table against the (vec_id, codes) table and folds the
    * per-subspace lookup — nothing ever shuffles a full vector except
    * the broadcast query side. Scores are rounded at 6 dp per subspace
    * term so cross-engine double order cannot flip the oracle hash.
    * Returns (q_id, rank, n_id, adc_ip): rank by ADC estimate desc.
    */
  /** PQ codebook (j, code, cv): subvector j of seed vector `code` —
    * training-free seeds, the `ivfTopK` convention.
    */
  private def pqCodebook(e: DataFrame): DataFrame =
    e.filter(col("vec_id") < PqCodes)
      .select(col("vec_id").as("code"),
        explode(expr(s"transform(sequence(0, ${PqSubspaces - 1}), " +
          s"j -> struct(j as j, slice(nv, j * $PqSubDim + 1, $PqSubDim) as cv))")).as("s"))
      .select(col("s.j").as("j"), col("code"), col("s.cv").as("cv"))

  /** (n_id, j, code) encodings: per (vector, subspace), the min-L2 centroid.
    * ||x_j - c||² = ||x_j||² - 2<x_j,c> + ||c||²; rank by
    * (-2<x_j,c> + ||c||²), the ||x_j||² term is constant per (vector,
    * subspace). Map-side broadcast compare; ties → lowest code.
    */
  private def pqEncode(e: DataFrame, cents: DataFrame): DataFrame = {
    val sub = e.select(col("vec_id"),
      explode(expr(s"transform(sequence(0, ${PqSubspaces - 1}), " +
        s"j -> struct(j as j, slice(nv, j * $PqSubDim + 1, $PqSubDim) as xv))")).as("s"))
      .select(col("vec_id"), col("s.j").as("j"), col("s.xv").as("xv"))
    // argmin per (vector, subspace) as a map-side-combining aggregate: the
    // window form shuffled N×PqSubspaces×PqCodes scored rows (128× the
    // corpus); the aggregate shuffles N×PqSubspaces. Tie semantics are
    // identical to orderBy(d2, code) rank 1.
    sub.join(broadcast(cents), Seq("j"))
      .select(col("vec_id"), col("j"), col("code"),
        round(GraftFunctions.dot(col("cv"), col("cv"))
          - lit(2.0) * GraftFunctions.dot(col("xv"), col("cv")), 6).as("d2"))
      .groupBy(col("vec_id"), col("j"))
      .agg(min(struct(col("d2"), col("code"))).as("w"))
      .select(col("vec_id").as("n_id"), col("j"), col("w.code").as("code"))
  }

  /** (q_id, j, code, ip) query-side ADC lookup tables: <q_j, c_{j,code}>,
    * 6-dp-rounded per subspace term so cross-engine double order cannot
    * flip the oracle hash.
    */
  private def pqLut(qe: DataFrame, cents: DataFrame): DataFrame =
    qe.select(col("vec_id").as("q_id"),
      explode(expr(s"transform(sequence(0, ${PqSubspaces - 1}), " +
        s"j -> struct(j as j, slice(nv, j * $PqSubDim + 1, $PqSubDim) as qv))")).as("s"))
      .select(col("q_id"), col("s.j").as("j"), col("s.qv").as("qv"))
      .join(cents, Seq("j"))
      .select(col("q_id"), col("j"), col("code"),
        round(GraftFunctions.dot(col("qv"), col("cv")), 6).as("ip"))

  def pqTopK(embs: DataFrame): DataFrame = {
    val e = normalized(embs).pinned(false)
    val cents = pqCodebook(e)
    val codes = pqEncode(e, cents)
    val lut = pqLut(e.filter(col("vec_id") < QueryCount), cents)
    val w = Window.partitionBy(col("q_id")).orderBy(col("adc_ip").desc, col("n_id"))
    codes.join(broadcast(lut), Seq("j", "code"))
      .filter(col("n_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("n_id"))
      .agg(round(sum(col("ip")), 6).as("adc_ip"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("q_id"), col("rank").cast("long").as("rank"), col("n_id"),
        col("adc_ip"))
  }

  /** IVF-PQ — the composition production vector stores actually run
    * (Jégou et al. 2011 §IV, IVFADC; here without the residual refinement:
    * codes are global rather than per-cell residual — a straightforward
    * extension, same plan shape): the IVF coarse quantizer prunes the
    * candidate set to the `IvfProbes` probed cells (at 100 TB: partition
    * pruning — a probe touches nprobe/cells of the corpus), and PQ-ADC
    * scores the survivors from 4-byte codes instead of 256-byte vectors —
    * so the scoring join carries (cell, id, code) rows only: the index
    * that fits in memory AND the scan that skips 13/16ths of it. Both
    * quantizers seed from the same first-16 vectors (deterministic,
    * training-free).
    */
  def ivfPqTopK(embs: DataFrame): DataFrame = {
    val e = normalized(embs).pinned(false)
    val ivfCents = e.filter(col("vec_id") < IvfCells)
      .select(col("vec_id").as("cell"), col("nv").as("cv"))
    val corpusCells = ivfAssign(e, ivfCents).select(col("cell"), col("vec_id").as("n_id"))
    val queryProbes = ivfAssign(e.filter(col("vec_id") < QueryCount), ivfCents, IvfProbes)
      .select(col("cell"), col("vec_id").as("q_id"))
    val cents = pqCodebook(e)
    val codes = pqEncode(e, cents)
    val lut = pqLut(e.filter(col("vec_id") < QueryCount), cents)
    val w = Window.partitionBy(col("q_id")).orderBy(col("adc_ip").desc, col("n_id"))
    queryProbes.join(corpusCells, Seq("cell"))
      .filter(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"))
      .join(codes, Seq("n_id"))
      .join(broadcast(lut), Seq("q_id", "j", "code"))
      .groupBy(col("q_id"), col("n_id"))
      .agg(round(sum(col("ip")), 6).as("adc_ip"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("q_id"), col("rank").cast("long").as("rank"), col("n_id"),
        col("adc_ip"))
  }

  /** Residual IVF-PQ — full IVFADC (Jégou et al. 2011 §IV): PQ encodes the
    * RESIDUAL r = x − c(cell) instead of x, so the codebook spends its 16
    * codes per subspace on the (much smaller) within-cell spread:
    * approx <q, x> = <q, c_cell> + Σ_j <q_j, cb_{j, code_j(r)}> — the cell
    * term is exact (a tiny (query, cell) join), only the residual is
    * quantized. Residual codebooks seed from vectors
    * `IvfCells..IvfCells+PqCodes−1` — the first `IvfCells` ARE the coarse
    * centroids, so their own residuals are zero vectors and would make a
    * useless codebook. Same index size as `ivfPqTopK` (cell id + 4 bytes
    * of codes per vector); the extra cost is one subtraction during
    * encode — map-side, scan-local.
    *
    * When it wins: residuals shrink only when the coarse cells are TIGHT —
    * ||x − c||² = 2 − 2·cos(x,c) for unit vectors, smaller than ||x||²
    * only at cos(x,c) > 0.5. Real clustered embedding corpora live there
    * and IVFADC beats plain IVF-PQ; this testbed's weakly-clustered random
    * gaussians (cell affinities ~0.3–0.4) do not, so the plain form scores
    * slightly better here — SimilaritySpec asserts structural invariants
    * and records the data-dependence rather than a false superiority
    * claim.
    */
  def ivfPqResidualTopK(embs: DataFrame): DataFrame = {
    val e = normalized(embs).pinned(false)
    val ivfCents = e.filter(col("vec_id") < IvfCells)
      .select(col("vec_id").as("cell"), col("nv").as("cv"))
    // residual vectors against the assigned cell, rounded per component so
    // both engines quantize identical doubles
    val resid = ivfAssign(e, ivfCents)
      .join(broadcast(ivfCents), Seq("cell"))
      .select(col("cell"), col("vec_id"),
        expr("transform(sequence(1, size(nv)), i -> round(nv[i-1] - cv[i-1], 6))").as("nv"))
      .pinned(false)
    // seed the residual codebook from vectors IvfCells..IvfCells+PqCodes−1:
    // the first IvfCells vectors ARE the coarse centroids, so their own
    // residuals are (rounded) zero vectors — a codebook of zeros encodes
    // nothing. The id shift re-keys the seeds to codes 0..PqCodes−1.
    val cb = pqCodebook(resid
      .filter(col("vec_id") >= IvfCells && col("vec_id") < IvfCells + PqCodes)
      .select((col("vec_id") - IvfCells).as("vec_id"), col("nv")))
    val codes = pqEncode(resid.select(col("vec_id"), col("nv")), cb)
    val corpusCells = resid.select(col("cell"), col("vec_id").as("n_id"))
    val queryProbes = ivfAssign(e.filter(col("vec_id") < QueryCount), ivfCents, IvfProbes)
      .select(col("cell"), col("vec_id").as("q_id"))
    // exact cell term <q, c_cell> per probed (query, cell)
    val cellTerm = queryProbes
      .join(broadcast(ivfCents), Seq("cell"))
      .join(e.select(col("vec_id").as("q_id"), col("nv").as("qv")), Seq("q_id"))
      .select(col("q_id"), col("cell"),
        round(GraftFunctions.dot(col("qv"), col("cv")), 6).as("t0"))
    // residual ADC lut uses the FULL query subvectors (the residual estimate
    // lives in the original space)
    val lut = pqLut(e.filter(col("vec_id") < QueryCount), cb)
    val w = Window.partitionBy(col("q_id")).orderBy(col("adc_ip").desc, col("n_id"))
    cellTerm.join(corpusCells, Seq("cell"))
      .filter(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("cell"), col("t0"), col("n_id"))
      .join(codes, Seq("n_id"))
      .join(broadcast(lut), Seq("q_id", "j", "code"))
      .groupBy(col("q_id"), col("n_id"), col("t0"))
      .agg(round(col("t0") + round(sum(col("ip")), 6), 6).as("adc_ip"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("q_id"), col("rank").cast("long").as("rank"), col("n_id"),
        col("adc_ip"))
  }

  val TrainIters = 2 // Lloyd iterations for the trained quantizer

  /** One spherical-k-means step: assign every vector to its max-cosine
    * centroid, then replace each non-empty cell's centroid with the
    * re-normalized member mean. Component means and normalized components are
    * rounded to 6 dp so the result is identical across engines regardless of
    * partial-aggregation fold order (the oracle unrolls the same steps).
    */
  private def lloydStep(e: DataFrame, cents: DataFrame): DataFrame = {
    // assignment = the same argmax aggregate as ivfAssign: each Lloyd pass
    // shuffles N rows, not N×cells scored rows
    val assigned = ivfAssign(e, cents)
    assigned
      .select(col("cell"), posexplode(col("nv")))
      .groupBy(col("cell"), col("pos"))
      .agg(round(avg(col("col")), 6).as("m"))
      .groupBy(col("cell"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("cell"), expr("transform(pm, p -> p.m)").as("m"))
      .withColumn("nrm", sqrt(GraftFunctions.dot(col("m"), col("m"))))
      .select(col("cell"), expr("transform(m, x -> round(x / nrm, 6))").as("cv"))
  }

  /** K-means-trained coarse quantizer: `TrainIters` Lloyd steps from the
    * same deterministic seed centroids `ivfTopK` uses. Entirely DataFrame
    * ops — assignment is a broadcast compare, the mean is a partial+final
    * hash aggregate over (cell, component) pairs, and nothing ever collects
    * to the driver. Lloyd is inherently multi-pass, so at 100 TB the
    * normalized corpus should be persisted across iterations (here the
    * re-scan is left to Catalyst; sf-scale re-reads are trivial).
    */
  def trainedCentroids(e: DataFrame): DataFrame = {
    val seed = e.filter(col("vec_id") < IvfCells)
      .select(col("vec_id").as("cell"), col("nv").as("cv"))
    // Each Lloyd output is referenced by the next iteration AND the final
    // probe; as pure lineage that doubles the plan per reference (16 corpus
    // scans for 2 iterations). A lazy local checkpoint makes each iteration
    // compute once — the distributed equivalent of persisting between passes.
    (1 to TrainIters).foldLeft(seed)((c, _) => lloydStep(e, c).pinned(false))
  }

  /** IVF probe over the k-means-trained quantizer — same dataflow as
    * `ivfTopK`, better-centered cells (recall comparison in SimilaritySpec).
    */
  def ivfTopKTrained(embs: DataFrame): DataFrame = {
    val e = normalized(embs).pinned(false)
    val cents = trainedCentroids(e)
    val corpusCells = ivfAssign(e, cents)
      .select(col("cell"), col("vec_id").as("n_id"), col("nv").as("nvec"))
    val queryProbes = ivfAssign(e.filter(col("vec_id") < QueryCount), cents, IvfProbes)
      .select(col("cell"), col("vec_id").as("q_id"), col("nv").as("qv"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    queryProbes.join(corpusCells, Seq("cell"))
      .filter(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"), GraftFunctions.dot(col("qv"), col("nvec")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("q_id"), col("rank").cast("long").as("rank"), col("n_id"),
        round(col("cos"), 6).as("cos"))
  }

  /** Per-label embedding drift: each label's mean vector vs the global
    * centroid, as cosine. The domain-shift diagnostic run before mixing
    * corpora: a label whose centroid points away from the corpus centroid is
    * distributionally distinct. Distributed shape: posexplode to (label,
    * idx, v) and average per component — two partial+final aggs (never a
    * vector collect), the per-label and global component means join on the
    * 64-row idx key, and the cosine folds per label. Component means are
    * rounded to 6 dp BEFORE the cosine (the k-means determinism trick:
    * partial-agg fold-order ulps vanish, so engine and oracle see identical
    * inputs to the product sums).
    */
  def embeddingDrift(embs: DataFrame): DataFrame = {
    val e = embs.select(col("label").cast("long").as("label"),
      posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("label"), (col("pos") + 1).as("idx"), col("v").cast("double").as("v"))
    val lm = e.groupBy(col("label"), col("idx")).agg(round(avg(col("v")), 6).as("m"))
    val gm = e.groupBy(col("idx")).agg(round(avg(col("v")), 6).as("g"))
    val n = embs.groupBy(col("label").cast("long").as("label"))
      .agg(count(lit(1)).as("n_vecs"))
    lm.join(broadcast(gm), Seq("idx"))
      .groupBy(col("label"))
      .agg(sum(col("m") * col("g")).as("dot"),
        sum(col("m") * col("m")).as("nm"), sum(col("g") * col("g")).as("ng"))
      .join(broadcast(n), Seq("label"))
      .select(col("label"), col("n_vecs"),
        round(col("dot") / (sqrt(col("nm")) * sqrt(col("ng"))), 6).as("cos_to_global"))
  }

  /** Recall@k of the IVF index against the exact brute-force ground truth —
    * the calibration metric that turns "approximate" into a number an index
    * owner can tune (nprobe/cells trade recall for probe cost). Both sides
    * are deterministic pipelines over the same normalized projection; the
    * join is per-(query, neighbor) on the k·|Q| result rows, so the metric
    * costs nothing beyond the two searches it grades. Missing queries can't
    * drop out: the truth side anchors the left join (a query with zero IVF
    * hits scores recall 0, not absence).
    */
  def annRecall(embs: DataFrame): DataFrame = {
    val truth = bruteTopK(embs).select(col("q_id"), col("n_id"))
    val approx = ivfTopK(embs).select(col("q_id"), col("n_id"), lit(1L).as("hit"))
    truth.join(approx, Seq("q_id", "n_id"), "left")
      .groupBy(col("q_id"))
      .agg(coalesce(sum(col("hit")), lit(0L)).as("n_hits"))
      .select(col("q_id"), col("n_hits"),
        expr(s"n_hits * 1000000L div $TopK").as("recall_e6"))
  }

  /** Int8 scalar quantization fidelity — the 4× memory compression every
    * production vector store applies before PQ: per-vector (min, max) range
    * mapped to 0..255 codes, reconstruction error reported per label. The
    * quantize→dequantize→error loop is MAP-ONLY (one pass, no shuffle of
    * vectors); only the 12-byte (label, mse_e12) rows reach the aggregate.
    * Error sums fold left-to-right inside each vector (deterministic
    * association) and are integer micro-units across vectors, so partition
    * order cannot wiggle the per-label average. The epsilon floor on the
    * range keeps a constant vector (scale 0) at zero error instead of NaN.
    */
  def int8Quantization(embs: DataFrame): DataFrame = {
    // quantize→dequantize→error in ONE native pass (Int8MseSum) — the
    // former interpreted `aggregate` HOF paid a boxed lambda per element
    // per row, measured 53× the native traversal at 2M×64 (MicroBench
    // `vec16`, r18); value bit-exact incl. the HALF_UP round and the
    // 1e-12 scale floor (ExpressionsSpec pins it)
    embs
      .select(col("label").cast("long").as("label"),
        col("embedding").cast("array<double>").as("v"))
      .select(col("label"),
        GraftFunctions.int8MseSum(col("v")).as("mse_sum"))
      .select(col("label"),
        expr("cast(round(mse_sum / 64.0 * 1e12) as bigint)").as("mse_e12"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        expr("sum(mse_e12) div count(1)").as("avg_mse_e12"),
        max(col("mse_e12")).as("max_mse_e12"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_knn_recall" -> ((s, d) => annRecall(Tables.embeddings(s, d))),
    "q_embed_int8" -> ((s, d) => int8Quantization(Tables.embeddings(s, d))),
    "q_embed_drift" -> ((s, d) => embeddingDrift(Tables.embeddings(s, d))),
    "q_knn_brute" -> ((s, d) => bruteTopK(Tables.embeddings(s, d))),
    "q_knn_lsh" -> ((s, d) => lshTopK(Tables.embeddings(s, d))),
    "q_knn_ivf" -> ((s, d) => ivfTopK(Tables.embeddings(s, d))),
    "q_knn_ivf_scaled" -> ((s, d) => ivfTopKScaled(Tables.embeddings(s, d))),
    "q_assign_twolevel" -> ((s, d) => twoLevelAssignment(Tables.embeddings(s, d))),
    "q_knn_ivf_twolevel" -> ((s, d) => ivfTopKTwoLevel(Tables.embeddings(s, d))),
    "q_knn_ivf_incr" -> ((s, d) => ivfTopKIncr(Tables.embeddings(s, d))),
    "q_knn_ivf_kmeans" -> ((s, d) => ivfTopKTrained(Tables.embeddings(s, d))),
    "q_knn_pq" -> ((s, d) => pqTopK(Tables.embeddings(s, d))),
    "q_knn_ivfpq" -> ((s, d) => ivfPqTopK(Tables.embeddings(s, d))),
    "q_knn_ivfpq_resid" -> ((s, d) => ivfPqResidualTopK(Tables.embeddings(s, d))))

  // DuckDB mirrors — identical literal hyperplanes, identical fold order
  // (expanded left-associated sum == sequential loop).
  private val duckNormCte =
    """e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt(list_sum([v[i] * v[i] for i in range(1, 65)])) AS nrm FROM e),
      |nv AS (SELECT vec_id, [x / nrm for x in v] AS nv FROM n)""".stripMargin

  /** Expanded dot of nv against a literal ±1 plane: nv[1]*(s1) + ... —
    * left-associated, matching DotProduct's ascending fold.
    */
  private def duckPlaneDot(plane: IndexedSeq[Double]): String =
    plane.zipWithIndex
      .map { case (s, c) => s"nv[${c + 1}] * (${if (s > 0) "1.0" else "-1.0"})" }
      .mkString(" + ")

  private def duckCode(t: Int): String =
    "CAST(" + (0 until LshBits).map { b =>
      s"(CASE WHEN ${duckPlaneDot(planes(t * LshBits + b))} > 0 THEN ${1L << b} ELSE 0 END)"
    }.mkString(" + ") + " AS BIGINT)"


  /** Unrolled Lloyd steps as DuckDB CTEs — mirrors `lloydStep` exactly:
    * argmax-cosine assignment, 6-dp-rounded component means (so engine
    * fold-order differences vanish), re-normalize, round again.
    */
  private def duckLloydCtes(iters: Int): String =
    (s"cents0 AS (SELECT vec_id AS cell, nv AS cv FROM nv WHERE vec_id < $IvfCells)" +:
      (1 to iters).map { i =>
        s"""a$i AS (SELECT * FROM (
           |  SELECT e.vec_id, e.nv, c.cell,
           |    row_number() OVER (PARTITION BY e.vec_id
           |      ORDER BY list_sum([e.nv[i] * c.cv[i] for i in range(1, 65)]) DESC, c.cell) AS crk
           |  FROM nv e, cents${i - 1} c) WHERE crk = 1),
           |m$i AS (SELECT cell, t.i AS i, round(avg(nv[t.i]), 6) AS m
           |        FROM a$i, generate_series(1, 64) t(i) GROUP BY cell, t.i),
           |g$i AS (SELECT cell, list(m ORDER BY i) AS m FROM m$i GROUP BY cell),
           |cents$i AS (SELECT cell, [round(x / nrm, 6) for x in m] AS cv
           |            FROM (SELECT cell, m, sqrt(list_sum([y * y for y in m])) AS nrm FROM g$i))""".stripMargin
      }).mkString(",\n")

  /** The two-level (IMI) corpus assignment as DuckDB CTEs — an exact mirror
    * of `assignCells`'s k > `TwoLevelMinCells` branch at k =
    * `TwoLevelOracleK`: coarse table = lowest-√k fine centroids; fine cell
    * j < c PINNED to family j, others argmax over coarse (ties → lowest
    * ccell); vectors coarse-argmax then rank only their family's members.
    * Ends with `corpus(cell, n_id, nvec)` + the intermediate `fin`.
    */
  private def duckTwoLevelCtes: String = {
    val k = TwoLevelOracleK
    val c = TwoLevelOracleC
    s"""cents AS (SELECT vec_id AS cell, nv AS cv FROM nv WHERE vec_id < $k),
       |coarse AS (SELECT cell AS ccell, cv AS ccv FROM cents WHERE cell < $c),
       |fam0 AS (
       |  SELECT f.cell, f.cv, c.ccell,
       |    row_number() OVER (PARTITION BY f.cell
       |      ORDER BY list_sum([f.cv[i] * c.ccv[i] for i in range(1, 65)]) DESC, c.ccell) AS rk
       |  FROM cents f, coarse c),
       |fam AS (SELECT CASE WHEN cell < $c THEN cell ELSE ccell END AS ccell, cell, cv
       |        FROM fam0 WHERE rk = 1),
       |vc0 AS (
       |  SELECT e.vec_id, e.nv, c.ccell,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY list_sum([e.nv[i] * c.ccv[i] for i in range(1, 65)]) DESC, c.ccell) AS rk
       |  FROM nv e, coarse c),
       |vc AS (SELECT ccell, vec_id, nv FROM vc0 WHERE rk = 1),
       |fin AS (
       |  SELECT v.vec_id, v.nv, f.cell,
       |    row_number() OVER (PARTITION BY v.vec_id
       |      ORDER BY list_sum([v.nv[i] * f.cv[i] for i in range(1, 65)]) DESC, f.cell) AS rk
       |  FROM vc v JOIN fam f USING (ccell)),
       |corpus AS (SELECT cell, vec_id AS n_id, nv AS nvec FROM fin WHERE rk = 1)""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "q_assign_twolevel" ->
      s"""WITH $duckNormCte,
         |$duckTwoLevelCtes
         |SELECT vec_id, cell FROM fin WHERE rk = 1""".stripMargin,

    // Corpus side = the two-level CTEs above; query probes stay a FLAT
    // top-IvfProbes rank over all k cells (the engine's inverted-broadcast
    // query side never goes two-level — |Q| is tiny by contract).
    "q_knn_ivf_twolevel" ->
      s"""WITH $duckNormCte,
         |$duckTwoLevelCtes,
         |probes AS (SELECT cell, q_id, qv FROM (
         |  SELECT c.cell, e.vec_id AS q_id, e.nv AS qv,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY list_sum([e.nv[i] * c.cv[i] for i in range(1, 65)]) DESC, c.cell) AS crk
         |  FROM nv e, cents c WHERE e.vec_id < $QueryCount)
         |  WHERE crk <= $IvfProbes),
         |s AS (SELECT q_id, n_id, list_sum([qv[i] * nvec[i] for i in range(1, 65)]) AS cos
         |      FROM probes q JOIN corpus c ON q.cell = c.cell AND c.n_id != q.q_id),
         |r AS (SELECT q_id, n_id, cos,
         |        row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
         |      FROM s)
         |SELECT q_id, CAST(rank AS BIGINT) AS rank, n_id, round(cos, 6) AS cos
         |FROM r WHERE rank <= $TopK""".stripMargin,

    "q_knn_recall" ->
      s"""WITH $duckNormCte,
         |bp AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         |         list_sum([q.nv[i] * c.nv[i] for i in range(1, 65)]) AS cos
         |       FROM nv q JOIN nv c ON q.vec_id < $QueryCount AND c.vec_id != q.vec_id),
         |br AS (SELECT q_id, n_id,
         |         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
         |       FROM bp),
         |truth AS (SELECT q_id, n_id FROM br WHERE rank <= $TopK),
         |cents AS (SELECT vec_id AS cell, nv AS cv FROM nv WHERE vec_id < $IvfCells),
         |assigned AS (
         |  SELECT e.vec_id, e.nv, c.cell,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY list_sum([e.nv[i] * c.cv[i] for i in range(1, 65)]) DESC, c.cell) AS crk
         |  FROM nv e, cents c),
         |corpus AS (SELECT cell, vec_id AS n_id, nv AS nvec FROM assigned WHERE crk = 1),
         |probes AS (SELECT cell, vec_id AS q_id, nv AS qv FROM assigned
         |           WHERE vec_id < $QueryCount AND crk <= $IvfProbes),
         |s AS (SELECT q_id, n_id, list_sum([qv[i] * nvec[i] for i in range(1, 65)]) AS cos
         |      FROM probes q JOIN corpus c ON q.cell = c.cell AND c.n_id != q.q_id),
         |r AS (SELECT q_id, n_id,
         |        row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
         |      FROM s),
         |approx AS (SELECT q_id, n_id FROM r WHERE rank <= $TopK),
         |h AS (SELECT t.q_id, count(a.n_id) AS n_hits
         |      FROM truth t LEFT JOIN approx a ON a.q_id = t.q_id AND a.n_id = t.n_id
         |      GROUP BY 1)
         |SELECT q_id, CAST(n_hits AS BIGINT) AS n_hits,
         |  CAST(n_hits * 1000000 // $TopK AS BIGINT) AS recall_e6
         |FROM h""".stripMargin,

    "q_embed_int8" -> {
      val dq = "(lo + round((x - lo) * 255.0 / scale) * scale / 255.0)"
      s"""WITH e AS (SELECT CAST(label AS BIGINT) AS label, embedding::DOUBLE[] AS v
         |           FROM embeddings),
         |b AS (SELECT label, v, list_min(v) AS lo,
         |        greatest(list_max(v) - list_min(v), 1e-12) AS scale FROM e),
         |m AS (SELECT label,
         |        CAST(round(list_sum([(x - $dq) * (x - $dq) for x in v])
         |          / 64.0 * 1e12) AS BIGINT) AS mse_e12
         |      FROM b)
         |SELECT label, count(*) AS n_vecs,
         |  CAST(sum(mse_e12) // count(*) AS BIGINT) AS avg_mse_e12,
         |  CAST(max(mse_e12) AS BIGINT) AS max_mse_e12
         |FROM m GROUP BY 1""".stripMargin
    },

    "q_embed_drift" ->
      """WITH e AS (SELECT CAST(label AS BIGINT) AS label, i AS idx,
        |             CAST(embedding[i] AS DOUBLE) AS v
        |           FROM embeddings, generate_series(1, 64) AS t(i)),
        |lm AS (SELECT label, idx, round(avg(v), 6) AS m FROM e GROUP BY 1, 2),
        |gm AS (SELECT idx, round(avg(v), 6) AS g FROM e GROUP BY 1),
        |c AS (SELECT label, sum(m * g) AS dot, sum(m * m) AS nm, sum(g * g) AS ng
        |      FROM lm JOIN gm USING (idx) GROUP BY 1),
        |n AS (SELECT CAST(label AS BIGINT) AS label, count(*) AS n_vecs
        |      FROM embeddings GROUP BY 1)
        |SELECT label, n_vecs, round(dot / (sqrt(nm) * sqrt(ng)), 6) AS cos_to_global
        |FROM c JOIN n USING (label)""".stripMargin,

    "q_knn_ivf_kmeans" ->
      s"""WITH $duckNormCte,
         |${duckLloydCtes(TrainIters)},
         |assigned AS (
         |  SELECT e.vec_id, e.nv, c.cell,
         |    list_sum([e.nv[i] * c.cv[i] for i in range(1, 65)]) AS ccos,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY list_sum([e.nv[i] * c.cv[i] for i in range(1, 65)]) DESC, c.cell) AS crk
         |  FROM nv e, cents$TrainIters c),
         |corpus AS (SELECT cell, vec_id AS n_id, nv AS nvec FROM assigned WHERE crk = 1),
         |probes AS (SELECT cell, vec_id AS q_id, nv AS qv FROM assigned
         |           WHERE vec_id < $QueryCount AND crk <= $IvfProbes),
         |s AS (SELECT q_id, n_id, list_sum([qv[i] * nvec[i] for i in range(1, 65)]) AS cos
         |      FROM probes q JOIN corpus c ON q.cell = c.cell AND c.n_id != q.q_id),
         |r AS (SELECT q_id, n_id, cos,
         |        row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
         |      FROM s)
         |SELECT q_id, CAST(rank AS BIGINT) AS rank, n_id, round(cos, 6) AS cos
         |FROM r WHERE rank <= $TopK""".stripMargin,

    "q_knn_brute" ->
      s"""WITH $duckNormCte,
         |p AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         |        list_sum([q.nv[i] * c.nv[i] for i in range(1, 65)]) AS cos
         |      FROM nv q JOIN nv c ON q.vec_id < $QueryCount AND c.vec_id != q.vec_id),
         |r AS (SELECT q_id, n_id, cos,
         |        row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
         |      FROM p)
         |SELECT q_id, CAST(rank AS BIGINT) AS rank, n_id, round(cos, 6) AS cos
         |FROM r WHERE rank <= $TopK""".stripMargin,

    "q_knn_ivf" ->
      s"""WITH $duckNormCte,
         |cents AS (SELECT vec_id AS cell, nv AS cv FROM nv WHERE vec_id < $IvfCells),
         |assigned AS (
         |  SELECT e.vec_id, e.nv, c.cell,
         |    list_sum([e.nv[i] * c.cv[i] for i in range(1, 65)]) AS ccos,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY list_sum([e.nv[i] * c.cv[i] for i in range(1, 65)]) DESC, c.cell) AS crk
         |  FROM nv e, cents c),
         |corpus AS (SELECT cell, vec_id AS n_id, nv AS nvec FROM assigned WHERE crk = 1),
         |probes AS (SELECT cell, vec_id AS q_id, nv AS qv FROM assigned
         |           WHERE vec_id < $QueryCount AND crk <= $IvfProbes),
         |s AS (SELECT q_id, n_id, list_sum([qv[i] * nvec[i] for i in range(1, 65)]) AS cos
         |      FROM probes q JOIN corpus c ON q.cell = c.cell AND c.n_id != q.q_id),
         |r AS (SELECT q_id, n_id, cos,
         |        row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
         |      FROM s)
         |SELECT q_id, CAST(rank AS BIGINT) AS rank, n_id, round(cos, 6) AS cos
         |FROM r WHERE rank <= $TopK""".stripMargin,

    // Dynamic k = max(IvfCells, ceil(N / IvfTargetCell)) computed IN SQL, so
    // the oracle's cell partition tracks the engine's at every SF DuckDB
    // runs (k = 16 through sf1, 160 at sf10 — all on assignCells' exact
    // flat path; past 256 cells the engine goes two-level/IMI-approximate
    // and the scale evidence is the sf100 probe, not this oracle).
    "q_knn_ivf_scaled" ->
      s"""WITH $duckNormCte,
         |kk AS (SELECT greatest($IvfCells, CAST(ceil(count(*) / $IvfTargetCell.0) AS BIGINT)) AS k
         |       FROM embeddings),
         |cents AS (SELECT vec_id AS cell, nv AS cv FROM nv, kk WHERE vec_id < kk.k),
         |assigned AS (
         |  SELECT e.vec_id, e.nv, c.cell,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY list_sum([e.nv[i] * c.cv[i] for i in range(1, 65)]) DESC, c.cell) AS crk
         |  FROM nv e, cents c),
         |corpus AS (SELECT cell, vec_id AS n_id, nv AS nvec FROM assigned WHERE crk = 1),
         |probes AS (SELECT cell, vec_id AS q_id, nv AS qv FROM assigned
         |           WHERE vec_id < $QueryCount AND crk <= $IvfProbes),
         |s AS (SELECT q_id, n_id, list_sum([qv[i] * nvec[i] for i in range(1, 65)]) AS cos
         |      FROM probes q JOIN corpus c ON q.cell = c.cell AND c.n_id != q.q_id),
         |r AS (SELECT q_id, n_id, cos,
         |        row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
         |      FROM s)
         |SELECT q_id, CAST(rank AS BIGINT) AS rank, n_id, round(cos, 6) AS cos
         |FROM r WHERE rank <= $TopK""".stripMargin,

    // Split-agnostic on purpose: per-row assignment makes index(history) ∪
    // index(increment) == index(full) against the same frozen centroids, so
    // the oracle assigns everything in one pass — the Scala side's union of
    // two ivfAssign halves must hash-match it exactly.
    "q_knn_ivf_incr" ->
      s"""WITH $duckNormCte,
         |cents AS (SELECT vec_id AS cell, nv AS cv FROM nv
         |          WHERE vec_id < $IncrCentMax AND vec_id % $IncrSplit <> 0),
         |assigned AS (
         |  SELECT e.vec_id, e.nv, c.cell,
         |    list_sum([e.nv[i] * c.cv[i] for i in range(1, 65)]) AS ccos,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY list_sum([e.nv[i] * c.cv[i] for i in range(1, 65)]) DESC, c.cell) AS crk
         |  FROM nv e, cents c),
         |corpus AS (SELECT cell, vec_id AS n_id, nv AS nvec FROM assigned WHERE crk = 1),
         |probes AS (SELECT cell, vec_id AS q_id, nv AS qv FROM assigned
         |           WHERE vec_id < $QueryCount AND crk <= $IvfProbes),
         |s AS (SELECT q_id, n_id, list_sum([qv[i] * nvec[i] for i in range(1, 65)]) AS cos
         |      FROM probes q JOIN corpus c ON q.cell = c.cell AND c.n_id != q.q_id),
         |r AS (SELECT q_id, n_id, cos,
         |        row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
         |      FROM s)
         |SELECT q_id, CAST(rank AS BIGINT) AS rank, n_id, round(cos, 6) AS cos
         |FROM r WHERE rank <= $TopK""".stripMargin,

    "q_knn_pq" -> {
      val sd = PqSubDim
      s"""WITH $duckNormCte,
         |cb AS (SELECT t.j AS j, vec_id AS code, nv[t.j*$sd+1 : t.j*$sd+$sd] AS cv
         |       FROM nv, generate_series(0, ${PqSubspaces - 1}) t(j)
         |       WHERE vec_id < $PqCodes),
         |sub AS (SELECT vec_id, t.j AS j, nv[t.j*$sd+1 : t.j*$sd+$sd] AS xv
         |        FROM nv, generate_series(0, ${PqSubspaces - 1}) t(j)),
         |enc AS (SELECT vec_id AS n_id, j, code FROM (
         |  SELECT s.vec_id, s.j, c.code,
         |    row_number() OVER (PARTITION BY s.vec_id, s.j
         |      ORDER BY round(list_sum([c.cv[i] * c.cv[i] for i in range(1, ${sd + 1})])
         |                     - 2 * list_sum([s.xv[i] * c.cv[i] for i in range(1, ${sd + 1})]), 6),
         |               c.code) AS rk
         |  FROM sub s JOIN cb c USING (j)) WHERE rk = 1),
         |lut AS (SELECT s.vec_id AS q_id, s.j, c.code,
         |          round(list_sum([s.xv[i] * c.cv[i] for i in range(1, ${sd + 1})]), 6) AS ip
         |        FROM sub s JOIN cb c USING (j) WHERE s.vec_id < $QueryCount),
         |sc AS (SELECT q_id, n_id, round(sum(ip), 6) AS adc_ip
         |       FROM enc JOIN lut USING (j, code)
         |       WHERE n_id != q_id
         |       GROUP BY 1, 2),
         |r AS (SELECT q_id, n_id, adc_ip,
         |        row_number() OVER (PARTITION BY q_id ORDER BY adc_ip DESC, n_id) AS rank
         |      FROM sc)
         |SELECT q_id, CAST(rank AS BIGINT) AS rank, n_id, adc_ip
         |FROM r WHERE rank <= $TopK""".stripMargin
    },

    // IVF cell CTEs (as in q_knn_ivf, minus the carried vectors) composed
    // with the PQ code/lut CTEs (as in q_knn_pq): candidates from probed
    // cells, scored by ADC fold.
    "q_knn_ivfpq" -> {
      val sd = PqSubDim
      s"""WITH $duckNormCte,
         |cents AS (SELECT vec_id AS cell, nv AS cv FROM nv WHERE vec_id < $IvfCells),
         |assigned AS (
         |  SELECT e.vec_id, c.cell,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY list_sum([e.nv[i] * c.cv[i] for i in range(1, 65)]) DESC, c.cell) AS crk
         |  FROM nv e, cents c),
         |corpus AS (SELECT cell, vec_id AS n_id FROM assigned WHERE crk = 1),
         |probes AS (SELECT cell, vec_id AS q_id FROM assigned
         |           WHERE vec_id < $QueryCount AND crk <= $IvfProbes),
         |cb AS (SELECT t.j AS j, vec_id AS code, nv[t.j*$sd+1 : t.j*$sd+$sd] AS cv
         |       FROM nv, generate_series(0, ${PqSubspaces - 1}) t(j)
         |       WHERE vec_id < $PqCodes),
         |sub AS (SELECT vec_id, t.j AS j, nv[t.j*$sd+1 : t.j*$sd+$sd] AS xv
         |        FROM nv, generate_series(0, ${PqSubspaces - 1}) t(j)),
         |enc AS (SELECT vec_id AS n_id, j, code FROM (
         |  SELECT s.vec_id, s.j, c.code,
         |    row_number() OVER (PARTITION BY s.vec_id, s.j
         |      ORDER BY round(list_sum([c.cv[i] * c.cv[i] for i in range(1, ${sd + 1})])
         |                     - 2 * list_sum([s.xv[i] * c.cv[i] for i in range(1, ${sd + 1})]), 6),
         |               c.code) AS rk
         |  FROM sub s JOIN cb c USING (j)) WHERE rk = 1),
         |lut AS (SELECT s.vec_id AS q_id, s.j, c.code,
         |          round(list_sum([s.xv[i] * c.cv[i] for i in range(1, ${sd + 1})]), 6) AS ip
         |        FROM sub s JOIN cb c USING (j) WHERE s.vec_id < $QueryCount),
         |cand AS (SELECT q_id, n_id FROM probes q JOIN corpus c ON q.cell = c.cell
         |         WHERE c.n_id != q.q_id),
         |sc AS (SELECT q_id, n_id, round(sum(ip), 6) AS adc_ip
         |       FROM cand JOIN enc USING (n_id) JOIN lut USING (q_id, j, code)
         |       GROUP BY 1, 2),
         |r AS (SELECT q_id, n_id, adc_ip,
         |        row_number() OVER (PARTITION BY q_id ORDER BY adc_ip DESC, n_id) AS rank
         |      FROM sc)
         |SELECT q_id, CAST(rank AS BIGINT) AS rank, n_id, adc_ip
         |FROM r WHERE rank <= $TopK""".stripMargin
    },

    // residual IVFADC: resid CTE quantizes x − c(cell) (6-dp per component,
    // like the Spark side), cb/enc run on residuals, lut on the ORIGINAL
    // query subvectors, and the exact cell term adds back <q, c_cell>.
    "q_knn_ivfpq_resid" -> {
      val sd = PqSubDim
      s"""WITH $duckNormCte,
         |cents AS (SELECT vec_id AS cell, nv AS cv FROM nv WHERE vec_id < $IvfCells),
         |assigned AS (
         |  SELECT e.vec_id, e.nv, c.cell,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY list_sum([e.nv[i] * c.cv[i] for i in range(1, 65)]) DESC, c.cell) AS crk
         |  FROM nv e, cents c),
         |resid AS (SELECT a.cell, a.vec_id,
         |            [round(a.nv[i] - c.cv[i], 6) for i in range(1, 65)] AS rv
         |          FROM assigned a JOIN cents c USING (cell) WHERE a.crk = 1),
         |cb AS (SELECT t.j AS j, vec_id - $IvfCells AS code, rv[t.j*$sd+1 : t.j*$sd+$sd] AS cv
         |       FROM resid, generate_series(0, ${PqSubspaces - 1}) t(j)
         |       WHERE vec_id >= $IvfCells AND vec_id < ${IvfCells + PqCodes}),
         |sub AS (SELECT vec_id, t.j AS j, rv[t.j*$sd+1 : t.j*$sd+$sd] AS xv
         |        FROM resid, generate_series(0, ${PqSubspaces - 1}) t(j)),
         |enc AS (SELECT vec_id AS n_id, j, code FROM (
         |  SELECT s.vec_id, s.j, c.code,
         |    row_number() OVER (PARTITION BY s.vec_id, s.j
         |      ORDER BY round(list_sum([c.cv[i] * c.cv[i] for i in range(1, ${sd + 1})])
         |                     - 2 * list_sum([s.xv[i] * c.cv[i] for i in range(1, ${sd + 1})]), 6),
         |               c.code) AS rk
         |  FROM sub s JOIN cb c USING (j)) WHERE rk = 1),
         |qsub AS (SELECT vec_id, t.j AS j, nv[t.j*$sd+1 : t.j*$sd+$sd] AS xv
         |         FROM nv, generate_series(0, ${PqSubspaces - 1}) t(j)
         |         WHERE vec_id < $QueryCount),
         |lut AS (SELECT s.vec_id AS q_id, s.j, c.code,
         |          round(list_sum([s.xv[i] * c.cv[i] for i in range(1, ${sd + 1})]), 6) AS ip
         |        FROM qsub s JOIN cb c USING (j)),
         |probes AS (SELECT a.cell, a.vec_id AS q_id,
         |             round(list_sum([a.nv[i] * c.cv[i] for i in range(1, 65)]), 6) AS t0
         |           FROM assigned a JOIN cents c USING (cell)
         |           WHERE a.vec_id < $QueryCount AND a.crk <= $IvfProbes),
         |cand AS (SELECT q_id, t0, n_id
         |         FROM probes q JOIN (SELECT cell, vec_id AS n_id FROM resid) c USING (cell)
         |         WHERE c.n_id != q.q_id),
         |sc AS (SELECT q_id, n_id, round(t0 + round(sum(ip), 6), 6) AS adc_ip
         |       FROM cand JOIN enc USING (n_id) JOIN lut USING (q_id, j, code)
         |       GROUP BY q_id, n_id, t0),
         |r AS (SELECT q_id, n_id, adc_ip,
         |        row_number() OVER (PARTITION BY q_id ORDER BY adc_ip DESC, n_id) AS rank
         |      FROM sc)
         |SELECT q_id, CAST(rank AS BIGINT) AS rank, n_id, adc_ip
         |FROM r WHERE rank <= $TopK""".stripMargin
    },

    "q_knn_lsh" -> {
      val codes = (0 until LshTables)
        .map(t => s"SELECT vec_id, nv, $t AS tbl, ${duckCode(t)} AS code FROM nv")
        .mkString("\n UNION ALL ")
      s"""WITH $duckNormCte,
         |coded AS ($codes),
         |q AS (SELECT tbl, code, vec_id AS q_id, nv AS qv FROM coded WHERE vec_id < $QueryCount),
         |c AS (SELECT tbl, code, vec_id AS n_id, nv AS nvec FROM coded),
         |cand AS (SELECT DISTINCT q_id, n_id, qv, nvec
         |         FROM q JOIN c ON q.tbl = c.tbl AND q.code = c.code AND c.n_id != q.q_id),
         |s AS (SELECT q_id, n_id, list_sum([qv[i] * nvec[i] for i in range(1, 65)]) AS cos FROM cand),
         |r AS (SELECT q_id, n_id, cos,
         |        row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
         |      FROM s)
         |SELECT q_id, CAST(rank AS BIGINT) AS rank, n_id, round(cos, 6) AS cos
         |FROM r WHERE rank <= $TopK""".stripMargin
    })
}
