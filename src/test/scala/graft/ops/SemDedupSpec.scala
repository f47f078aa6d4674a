package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions.col

/** SemDeDup invariants (Dedup.semanticDedup): cluster-scoped semantic
  * pruning must keep exactly one representative per within-cell duplicate
  * group, never compare across cells, and keep per-cell work bounded.
  */
class SemDedupSpec extends SparkSpec {

  private lazy val embs = Tables.embeddings(spark, sf())

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    val na = math.sqrt(a.map(x => x * x).sum)
    val nb = math.sqrt(b.map(x => x * x).sum)
    dot / (na * nb)
  }

  private lazy val kept = Dedup.semanticDedup(embs).collect()
    .map(r => r.getLong(0) -> r.getLong(1)).toMap // vec_id -> cell

  private lazy val vecs = embs.collect()
    .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap

  test("survivors are a strict, non-empty subset of the input ids") {
    assert(kept.nonEmpty)
    assert(kept.keySet.subsetOf(vecs.keySet))
    assert(kept.size < vecs.size, "test embeddings plant semantic near-dups")
  }

  test("no two survivors in the same cell sit above the cosine threshold") {
    kept.groupBy(_._2).values.foreach { cellMembers =>
      val ids = cellMembers.keys.toSeq.sorted
      for (i <- ids.indices; j <- (i + 1) until ids.size) {
        val c = cosine(vecs(ids(i)), vecs(ids(j)))
        assert(c < Dedup.SemThreshold,
          s"kept pair ${ids(i)},${ids(j)} cos $c >= ${Dedup.SemThreshold}")
      }
    }
  }

  test("each dropped vector has a lower-id near-dup witness above threshold") {
    // The operator drops d only when a lower-id member of d's OWN cell sits
    // above the threshold; the output doesn't carry dropped vectors' cells,
    // so assert the implied (necessary) condition over the full id universe.
    val dropped = vecs.keySet -- kept.keySet
    dropped.foreach { d =>
      val hasWitness = vecs.keys.exists { o =>
        o < d && cosine(vecs(d), vecs(o)) >= Dedup.SemThreshold
      }
      assert(hasWitness, s"vec $d dropped without a lower-id near-dup witness")
    }
  }

  test("the globally lowest id survives (no lower-id witness can exist)") {
    assert(kept.contains(vecs.keySet.min))
  }

  test("cell population stays bounded (no degenerate all-in-one-cell quantizer)") {
    val sizes = kept.groupBy(_._2).map(_._2.size)
    val total = sizes.sum
    assert(sizes.max <= math.max(4, total / 2),
      s"one cell holds ${sizes.max} of $total survivors — quantizer collapsed")
    assert(sizes.size > 1, "expected multiple populated cells")
  }

  test("pair scope is an equi-join on cell, never a cross product") {
    val plan = Dedup.semanticDedup(embs).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "within-cell compare must be an equi-join on cell")
  }

  test("increment-from-index == monolithic increment against the same frozen cents") {
    // the production refresh shape: history's stored (cell, vec_id, nv)
    // assignment + the frozen quantizer in, only the increment assigned —
    // must equal re-running the monolithic incremental op on the raw halves
    val embs = Tables.embeddings(spark, sf())
    val history = embs.filter(col("vec_id") % 2 === 0)
    val increment = embs.filter(col("vec_id") % 2 === 1)
    val expected = Dedup.semanticDedupIncrement(history, increment)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // rebuild exactly the monolith's quantizer: union count scales k, cents
    // = the union's first-k normalized vectors
    val k = math.max(Dedup.SemCells.toLong,
      (embs.count() + Dedup.SemTargetCell - 1) / Dedup.SemTargetCell)
    val eAll = Similarity.normalized(embs)
    val cents = eAll.filter(col("vec_id") < k)
      .select(col("vec_id").as("cell"), col("nv").as("cv"))
    val index = Similarity.assignCells(Similarity.normalized(history), cents, k)
      .select(col("cell"), col("vec_id"), col("nv"))
    val got = Dedup.semanticDedupIncrementFromIndex(index, increment, cents)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected,
      s"extra=${(got.keySet -- expected.keySet).take(5)} missing=${(expected.keySet -- got.keySet).take(5)}")
  }

  test("cell count scales with the corpus: k = max(SemCells, ceil(N / SemTargetCell))") {
    // 25k deterministic well-spread vectors -> k = 20 > the SemCells floor,
    // so some vectors must land in cells the fixed quantizer did not have.
    // (At every shipped fixture up to sf1, N <= 20k keeps k == SemCells —
    // this is the only place the knob engages below sf10.)
    val n = 25 * 1000
    val big = spark.range(n).selectExpr("id as vec_id",
      "transform(sequence(1, 8), i -> cast(sin(cast(id * i + i as double)) as float)) as embedding")
    val cells = Dedup.semanticDedup(big).select("cell").distinct()
      .collect().map(_.getLong(0))
    val expectedK = math.max(Dedup.SemCells, (n + Dedup.SemTargetCell - 1) / Dedup.SemTargetCell)
    assert(expectedK == 20)
    assert(cells.max >= Dedup.SemCells,
      s"scaled quantizer must populate cells past the fixed floor, got max ${cells.max}")
    assert(cells.max < expectedK, "cell ids are centroid vec_ids < k")
  }
}
