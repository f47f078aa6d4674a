package graft

/** Retry-determinism under injected task failures — the 100 TB evidence
  * class the small-SF hash gate cannot see: on a 1000-executor cluster,
  * preemption, spot reclaim, and speculative execution REPLAY tasks all the
  * time, and a query is only correct there if a replayed task reproduces its
  * partition bit-for-bit. `Tables.load`'s chaos harness fails the first
  * attempt of every k-th scan partition (GRAFT_CHAOS_MOD); this spec runs a
  * cross-section of the registry with and without injection and requires
  * identical results. The full-registry form of this evidence is the
  * chaos-mode `local_verify` run recorded in BASELINE.md (every oracle query
  * hash-green under injection).
  */
class ChaosSpec extends SparkSpec {

  // one per plan family: hash agg, broadcast join, window function,
  // banded-minhash dedup (shuffle + self-join), IVF ANN (argmax aggregate +
  // family join), session window (stateless batch form), two-level cumsum
  // pipeline, unigram LM (broadcast literal + codegen DP).
  private val names = Seq(
    "q_groupby_agg", "q_join_inner", "q_over_rank", "q_dedup_minhash",
    "q_knn_ivf", "q_window_session", "q_token_budget", "q_unigram_encode")

  private def canon(name: String): Seq[String] = {
    val df = SparkEntry.queries(name)(spark, sf("sf0.001"))
    val cols = df.columns.sorted.toSeq
    df.selectExpr(cols: _*).collect().map(_.toString).sorted.toSeq
  }

  test("registry cross-section is replay-deterministic under injected task failures") {
    val clean = names.map(n => n -> canon(n)).toMap
    val before = Tables.chaosInjections.get()
    System.setProperty("graft.chaos.mod", "2")
    try names.foreach { n =>
      assert(canon(n) == clean(n), s"$n drifted under task retry")
    } finally System.clearProperty("graft.chaos.mod")
    assert(Tables.chaosInjections.get() > before,
      "chaos must actually fire (first attempt of every 2nd scan partition)")
  }
}
