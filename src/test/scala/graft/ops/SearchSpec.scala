package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SearchSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf())
  private lazy val embs = Tables.embeddings(spark, sf())

  test("rrf: a doc present in both lists outscores docs in only one") {
    // the lexical leg uses the corpus-derived query (bm25Derived, round 14)
    val lex = Text.bm25Derived(docs, Search.RrfListK).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val fused = Search.rrfFusion(docs, embs).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(fused.length == Search.RrfTopK)
    // recompute expected scores from the two legs independently
    val e = Similarity.normalized(embs)
    val q = e.filter(col("vec_id") === Search.RrfQueryVec).select(col("nv").as("qv"))
    val sem = e.filter(col("vec_id") =!= Search.RrfQueryVec).crossJoin(broadcast(q))
      .select(col("vec_id"),
        graft.functions.GraftFunctions.dot(col("nv"), col("qv")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id")).limit(Search.RrfListK).collect()
      .map(_.getLong(0)).zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
    def expected(id: Long): Double = {
      val s = lex.get(id).map(r => 1.0 / (Search.RrfK + r)).getOrElse(0.0) +
        sem.get(id).map(r => 1.0 / (Search.RrfK + r)).getOrElse(0.0)
      BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    fused.foreach { case (id, score, _) =>
      assert(score == expected(id), s"doc $id: $score vs ${expected(id)}")
    }
    // scores are non-increasing in rank and ranks are dense 1..k
    assert(fused.sortBy(_._3).map(_._2).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    assert(fused.map(_._3).sorted.toSeq == (1L to Search.RrfTopK))
  }

  test("rrf: fusion plan never falls back to a non-broadcast nested loop") {
    val plan = Search.rrfFusion(docs, embs).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "the 1-row query vector must broadcast")
  }
}
