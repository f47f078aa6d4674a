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

  test("triangles: planted 3-cycle counted once, dangling edge ignored") {
    // tokens must clear MinTokenLen=4; "aaaa bbbb cccc aaaa" closes the
    // cycle (adjacent pairs aaaa-bbbb, bbbb-cccc, cccc-aaaa)
    val docs = Seq(
      (1L, "aaaa bbbb cccc aaaa", "en", "src", 1L),
      (2L, "dddd aaaa", "en", "src", 1L)) // dangling edge, no new triangle
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Graph.triangles(docs).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((4L, 4L, 1L)),
      s"expected 4 nodes / 4 oriented edges / 1 triangle, got $r")
  }

  test("triangles: orientation keeps each undirected edge exactly once (corpus)") {
    import org.apache.spark.sql.functions._
    val d = graft.Tables.documents(spark, sf())
    val r = Graph.triangles(d).collect().head
    // independent recount of the undirected co-occurrence edge set
    val und = d.select(graft.ops.Text.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(toks) - 1), i -> struct(toks[i - 1] AS a, toks[i] AS b))")).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .filter(length(col("a")) >= Graph.MinTokenLen &&
        length(col("b")) >= Graph.MinTokenLen && col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .distinct().count()
    assert(r.getLong(1) == und, s"oriented edges ${r.getLong(1)} != undirected $und")
    assert(r.getLong(2) > 0, "corpus graph should contain triangles")
  }
}
