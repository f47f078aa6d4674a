package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClassifierSpec extends SparkSpec {

  // separable corpus: "good" docs are long, stopword-bearing, diverse;
  // "junk" docs are short repeats
  private def corpus = {
    import spark.implicits._
    val good = (0 until 10).map(i =>
      (i.toLong, s"the quick brown fox $i jumps over a lazy dog of unusual diligence and is in to the point", "en", "good", 80L))
    val junk = (10 until 20).map(i =>
      (i.toLong, "buy buy buy", "en", "junk", 11L))
    (good ++ junk).toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("train: weights move toward the separating direction and separate the fixture") {
    val w = Classifier.train(corpus, positives = Seq("good"), rounds = 3)
      .collect().sortBy(_.getLong(0))
    assert(w.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val last = w.last
    val (w0, w1, w2, w3) = (last.getDouble(1), last.getDouble(2), last.getDouble(3), last.getDouble(4))
    // length and uniqueness separate good from junk -> positive weights
    assert(w1 > 0, s"w1=$w1")
    assert(w3 > 0, s"w3=$w3")
    // the learned model scores every good doc above every junk doc
    val scored = Classifier.featurize(corpus, Seq("good"))
      .select(col("y"),
        (lit(w0) + lit(w1) * col("x1") + lit(w2) * col("x2") + lit(w3) * col("x3")).as("z"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    // and the composed filter's kept flag agrees with the sign of z
    val kept = Classifier.classifierFilter(corpus, Seq("good")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(kept.size == 20)
    val minGood = scored.filter(_._1 == 1.0).map(_._2).min
    val maxJunk = scored.filter(_._1 == 0.0).map(_._2).max
    assert(minGood > maxJunk, s"minGood=$minGood maxJunk=$maxJunk")
  }

  test("trainConverged stops on the trajectory, not the budget, and agrees with fixed-round GD") {
    // separable fixture: deltas shrink fast, so a loose epsilon stops early
    val out = Classifier.trainConverged(corpus, positives = Seq("good"),
      maxRounds = 30, epsE6 = 50000L).collect()(0)
    val rounds = out.getLong(0)
    assert(out.getBoolean(5), "must converge on the separable fixture")
    assert(rounds < 30, s"stopped by budget, not convergence: $rounds")
    // the converged weights ARE the fixed-round trajectory at that round
    val traj = Classifier.train(corpus, positives = Seq("good"), rounds = rounds.toInt)
      .collect().maxBy(_.getLong(0))
    (1 to 4).foreach(j =>
      assert(out.getDouble(j) == traj.getDouble(j), s"w$j mismatch at round $rounds"))
    // a tighter epsilon must run at least as many rounds
    val tight = Classifier.trainConverged(corpus, positives = Seq("good"),
      maxRounds = 30, epsE6 = 500L).collect()(0)
    assert(tight.getLong(0) >= rounds)
  }

  test("classifierEval: held-out metrics are well-formed and deterministic") {
    val e = Classifier.classifierEval(corpus, positives = Seq("good")).collect()(0)
    val (nTrain, nTest) = (e.getLong(0), e.getLong(1))
    assert(nTrain > 0 && nTest > 0 && nTrain + nTest == 20)
    val (acc, auc) = (e.getLong(2), e.getLong(3))
    assert(acc >= 0L && acc <= 1000000L, s"accuracy_e6=$acc")
    assert(auc >= 0L && auc <= 1000000L, s"auc_e6=$auc")
    // separable fixture scored by a converged model: ranking must be strong
    assert(auc >= 750000L, s"expected high AUC on separable data, got $auc")
    val e2 = Classifier.classifierEval(corpus, positives = Seq("good")).collect()(0)
    assert(e.toSeq == e2.toSeq, "eval must be bit-deterministic")
  }

  test("gradient direction: one round from zero moves each weight by the class-mean feature gap") {
    // from w=0, p=0.5 for every row: g_j = avg((0.5 - y) * x_j)
    // = 0.5 * (mean_neg(x_j) - mean_pos(x_j)) / 1 (balanced classes)
    val f = Classifier.featurize(corpus, Seq("good")).collect()
      .map(r => (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    def g(x: ((Double, Double, Double, Double)) => Double): Double =
      f.map(t => (0.5 - t._1) * x(t)).sum / f.length
    val w = Classifier.train(corpus, positives = Seq("good"), rounds = 1)
      .collect()(0)
    assert(math.abs(w.getDouble(1) - (-g(_ => 1.0))) < 2e-6)
    assert(math.abs(w.getDouble(2) - (-g(_._2))) < 2e-6)
    assert(math.abs(w.getDouble(3) - (-g(_._3))) < 2e-6)
    assert(math.abs(w.getDouble(4) - (-g(_._4))) < 2e-6)
  }
}
