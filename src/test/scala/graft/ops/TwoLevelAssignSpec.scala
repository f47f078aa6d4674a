package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** `Similarity.assignCells` — the IMI-style two-level quantizer that keeps
  * corpus-scaled cell counts sub-quadratic (round-13 item 1). The flat path
  * must be BIT-identical to `ivfAssign` (every shipped fixture rides it);
  * the two-level path must assign every vector exactly once, to a member of
  * its coarse family, and must agree with flat assignment whenever the
  * geometry is unambiguous (well-separated families).
  */
class TwoLevelAssignSpec extends SparkSpec {

  private def norm(df: DataFrame): DataFrame = Similarity.normalized(df)

  private def centsOf(e: DataFrame, k: Long): DataFrame =
    e.filter(col("vec_id") < k).select(col("vec_id").as("cell"), col("nv").as("cv"))

  test("flat path (k <= TwoLevelMinCells) is exactly ivfAssign") {
    val e = norm(Tables.embeddings(spark, sf()))
    val cents = centsOf(e, 16)
    val a = Similarity.assignCells(e, cents, 16).collect()
      .map(r => r.getLong(1) -> r.getLong(0)).toMap
    val b = Similarity.ivfAssign(e, cents).collect()
      .map(r => r.getLong(1) -> r.getLong(0)).toMap
    assert(a == b)
  }

  // A controlled >threshold corpus: 300 cells' worth of vectors built as
  // sin-hash unit directions. Pairwise cosines of these pseudo-random 16-d
  // sign-ish vectors are far from 1, so "family of the nearest coarse cell"
  // is well-defined but NOT degenerate.
  private lazy val big = {
    val n = 3000
    spark.range(n).selectExpr("id as vec_id",
      "transform(sequence(1, 16), i -> cast(sin(cast(id * i + i * i as double)) as float)) as embedding")
  }

  test("two-level path assigns every vector exactly once, to a cell of its own coarse family") {
    val e = norm(big)
    val k = 300L
    val cents = centsOf(e, k)
    val out = Similarity.assignCells(e, cents, k)
    val rows = out.collect()
    assert(rows.length == 3000, "no vector may drop or duplicate at the family join")
    assert(rows.map(_.getLong(1)).distinct.length == 3000)
    // reconstruct families + coarse assignment driver-side and check scope
    val c = math.ceil(math.sqrt(k.toDouble)).toLong
    val vecs = e.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    def argmax(v: Array[Double], ids: Seq[Long]): Long =
      ids.map(i => (-dot(v, vecs(i)), i)).min._2
    val coarseIds = (0L until c).toSeq
    val family = (0L until k).map(f => f -> argmax(vecs(f), coarseIds)).toMap
    rows.foreach { r =>
      val (cell, vid) = (r.getLong(0), r.getLong(1))
      assert(cell >= 0 && cell < k)
      assert(family(cell) == argmax(vecs(vid), coarseIds),
        s"vec $vid landed in cell $cell outside its coarse family")
    }
  }

  test("two-level == flat when families are well-separated (clustered corpus)") {
    // 17 well-separated axis directions in 64-d (= ⌈√288⌉, so the coarse
    // table covers every cluster), vectors tightly around each: coarse and
    // fine argmax agree everywhere, so the approximate path must reproduce
    // the exact one. Centroid ids 0..287 cycle through the clusters
    // round-robin; k=288 > threshold.
    val k = 288L
    val df = spark.range(288 * 3).selectExpr("id as vec_id",
      // cluster c = id % 288 % 17: unit axis e_{c*3} plus a tiny id-keyed wobble
      """transform(sequence(0, 63), i ->
         cast(case when i = (cast(id % 288 as int) % 17) * 3 then 1.0
              else 0.001 * sin(cast(id * (i + 7) as double)) end as float)) as embedding""")
    val e = norm(df)
    val cents = centsOf(e, k)
    val two = Similarity.assignCells(e, cents, k).collect()
      .map(r => r.getLong(1) -> r.getLong(0)).toMap
    val flat = Similarity.ivfAssign(e, cents).collect()
      .map(r => r.getLong(1) -> r.getLong(0)).toMap
    assert(two.size == flat.size)
    val agree = two.count { case (v, c) => flat(v) == c }
    assert(agree == two.size,
      s"two-level diverged from flat on ${two.size - agree} of ${two.size} well-separated vectors")
  }

  test("ivfTopKScaled == ivfTopK while the corpus sits under the cell floor (k = IvfCells)") {
    // the fixture's N/1250 stays below the 16-cell floor, so the scaled
    // build must reproduce the fixed build exactly — including the
    // inverted-broadcast query-probe spelling
    val embs = Tables.embeddings(spark, sf())
    val a = Similarity.ivfTopKScaled(embs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val b = Similarity.ivfTopK(embs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(a == b)
  }

  test("ivfTopKScaled populates cells past the fixed floor on a larger corpus") {
    val n = 25 * 1000 // k = ceil(25000/1250) = 20 > 16
    val df = spark.range(n).selectExpr("id as vec_id",
      "transform(sequence(1, 8), i -> cast(sin(cast(id * i + i as double)) as float)) as embedding")
    val out = Similarity.ivfTopKScaled(df)
    assert(out.count() == Similarity.QueryCount * Similarity.TopK)
  }

  test("the oracle-gated twolevel queries demonstrably take the IMI branch") {
    // the hash gate is only evidence for the two-level path if the plan
    // actually goes two-level: the knob must sit past the short-circuit, and
    // the coarse-family column (which only the IMI branch creates) must be
    // in the optimized plan.
    assert(Similarity.TwoLevelOracleK > Similarity.TwoLevelMinCells)
    val out = Similarity.twoLevelAssignment(Tables.embeddings(spark, sf()))
    assert(out.queryExecution.optimizedPlan.toString.contains("ccell"),
      "q_assign_twolevel must run the two-level branch of assignCells")
    val rows = out.collect()
    assert(rows.map(_.getLong(0)).distinct.length == rows.length,
      "exactly one cell per vector")
    val search = Similarity.ivfTopKTwoLevel(Tables.embeddings(spark, sf()))
    assert(search.queryExecution.optimizedPlan.toString.contains("ccell"),
      "q_knn_ivf_twolevel's corpus assignment must run the two-level branch")
  }

  test("coarse-table guard: k past MaxCoarseCells^2 fails with the sharding advice") {
    val e = norm(big)
    val ex = intercept[IllegalArgumentException] {
      Similarity.assignCells(e, centsOf(e, 300), Similarity.MaxCoarseCells * Similarity.MaxCoarseCells + 1)
    }
    assert(ex.getMessage.contains("shard the corpus"))
  }

  test("near-duplicate coarse centroids cannot drop vectors (self-family pin keeps the join total)") {
    // vec 1 = vec 0 + a one-ulp-ish perturbation: coarse cells 0 and 1 are
    // near-identical but NOT bit-equal, the float-rounding regime where an
    // unpinned fine self-argmax could land in the twin's family and leave
    // family 1 empty while some vector still coarse-argmaxes to 1 (r13
    // advice). The pin makes coverage structural; assigned == input must
    // hold exactly, and fine cell 1 must sit in its own family.
    val e0 = big.filter(col("vec_id") === 0).select(col("embedding").as("e0"))
    val fixed = big.crossJoin(broadcast(e0))
      .select(col("vec_id"),
        when(col("vec_id") === 1,
          expr("transform(e0, (x, i) -> cast(x + if(i = 0, 1.0e-7, 0.0) as float))"))
          .otherwise(col("embedding")).as("embedding"))
    val e = norm(fixed)
    val k = 300L
    val out = Similarity.assignCells(e, centsOf(e, k), k).collect()
    assert(out.length == 3000, "assigned count must equal input count — no vector may drop")
    assert(out.map(_.getLong(1)).distinct.length == 3000)
  }

  test("exact-duplicate coarse centroids cannot drop vectors (tie routes to min family)") {
    // duplicate vec 0's direction into vec 1 so coarse cells 0 and 1 are
    // identical; family(1) is then empty and every tie must route to 0.
    val e0 = big.filter(col("vec_id") === 0).select(col("embedding").as("e0"))
    val fixed = big.crossJoin(broadcast(e0))
      .select(col("vec_id"),
        when(col("vec_id") === 1, col("e0")).otherwise(col("embedding")).as("embedding"))
    val e = norm(fixed)
    val k = 300L
    val out = Similarity.assignCells(e, centsOf(e, k), k)
    assert(out.count() == 3000)
    assert(out.filter(col("cell") === 1).count() == 0,
      "the duplicate higher-index coarse cell must lose every tie")
  }
}
