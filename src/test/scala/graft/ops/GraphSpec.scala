package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class GraphSpec extends SparkSpec {

  import spark.implicits._

  private def docs(texts: String*): DataFrame =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  /** Independent in-test PageRank replica over an adjacency map, using the
    * exact integer arithmetic the operator promises (div-truncation, e12
    * mass, 0.85 damping) — the spec's oracle for exact rank values.
    */
  private def refRanks(adj: Map[String, Seq[String]], iters: Int): Map[String, Long] = {
    val n = adj.size
    val base = Graph.RankScale * 15L / 100L / n
    var r = adj.keys.map(_ -> Graph.RankScale / n).toMap
    for (_ <- 1 to iters) {
      val contrib = adj.map { case (k, vs) => k -> r(k) / vs.size }
      r = adj.map { case (k, _) =>
        k -> (base + 85L * adj(k).map(contrib).sum / 100L)
      }
    }
    r
  }

  test("textrank: exact integer ranks on a hand-built path graph") {
    // alpha—beta—gamma (path): beta is the hub and must out-rank the leaves
    val out = Graph.textrank(docs("alpha beta gamma", "gamma beta"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exp = refRanks(
      Map("alpha" -> Seq("beta"), "beta" -> Seq("alpha", "gamma"), "gamma" -> Seq("beta")),
      Graph.Iterations)
    assert(out.keySet == Set("alpha", "beta", "gamma"))
    assert(out.view.mapValues(_._1).toMap == exp)
    assert(out("beta")._2 == 2L && out("alpha")._2 == 1L)
    assert(out("beta")._1 > out("alpha")._1)
  }

  test("textrank: short tokens and self-pairs never enter the graph") {
    // "of" and "ab" are under MinTokenLen; "echo echo" is a self-pair
    val out = Graph.textrank(docs("wind of ab turbine wind", "echo echo", "wind turbine"))
      .collect().map(_.getString(0)).toSet
    assert(out == Set("wind", "turbine"))
  }

  test("textrank: invariant under input partitioning (pure integer math)") {
    val d = graft.Tables.documents(spark, sf())
    val a = Graph.textrank(d).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val b = Graph.textrank(d.repartition(7)).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(a == b)
  }

  test("communities: disconnected components converge to distinct labels") {
    // two triangles with no bridge: each must settle on one internal label,
    // and the two labels must differ (no cross-component bleed)
    val out = Graph.communities(docs(
      "alpha beta gamma alpha", "gamma alpha beta",
      "delta epsilon zeta delta", "zeta delta epsilon"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val left = Set("alpha", "beta", "gamma").map(out)
    val right = Set("delta", "epsilon", "zeta").map(out)
    assert(left.size == 1, s"left clique split: $out")
    assert(right.size == 1, s"right clique split: $out")
    assert(left != right)
  }

  test("communities are partitioning-invariant (deterministic min-tie LPA)") {
    val d = graft.Tables.documents(spark, sf())
    val a = Graph.communities(d).collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    val b = Graph.communities(d.repartition(5)).collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(a == b)
  }

  test("textrank: top-k compiles to TakeOrderedAndProject, not a global sort") {
    val plan = Graph.textrank(graft.Tables.documents(spark, sf()))
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }
}
