package graft.ops

import graft.SparkSpec

class UnigramSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("train: hand-computed EM round on a tiny corpus") {
    // corpus "aa aa ab" -> words: aa (freq 2), ab (freq 1)
    // candidate substrings (weighted): a:5, aa:2, ab:1, b:1
    //   total=9, |cand|=4 -> denominator L(13)=round(ln(13)*1e6)=2564949
    //   s0(a)  = L(6)-L(13) = 1791759-2564949 = -773190
    //   s0(aa) = L(3)-L(13) = 1098612-2564949 = -1466337
    //   s0(ab) = s0(b) = L(2)-L(13) = 693147-2564949 = -1871802
    // round-1 Viterbi: "aa": [a,a]=-1546380 < [aa]=-1466337 -> aa
    //                  "ab": [a,b]=-2644992 < [ab]=-1871802 -> ab
    // counts: aa:2, ab:1; chars a,b floor-kept at 0
    //   total=3, |vocab|=4 -> denominator L(7)=1945910
    //   s1(aa) = L(3)-L(7) = -847298,  s1(ab) = L(2)-L(7) = -1252763
    //   s1(a) = s1(b) = L(1)-L(7) = 0-1945910 = -1945910
    // rounds 2,3: same segmentation -> fixed point
    val out = Unigram.train(docs((1L, "aa aa ab")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(
      ("aa", 2L, -847298L),
      ("ab", 1L, -1252763L),
      ("a", 0L, -1945910L),
      ("b", 0L, -1945910L)))
  }

  test("encode: per-doc subword counts under the trained vocabulary") {
    val d = docs((1L, "aa aa ab"), (2L, "ab b"))
    val vocab = Unigram.train(d).select(
      org.apache.spark.sql.functions.col("piece"),
      org.apache.spark.sql.functions.col("logp_e6").as("s"))
    val out = Unigram.encode(d, vocab)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    // doc 1: words aa,aa,ab -> one piece each; doc 2: ab (1 piece) + b (1 piece)
    assert(out == Seq((1L, 3L, 3L), (2L, 2L, 2L)))
  }

  test("pruning is implicit: an unused multi-char candidate leaves the vocabulary") {
    // "abc" alone: substrings a,b,c,ab,bc,abc all candidates; Viterbi takes
    // [abc] (one piece beats any split under equal-ish seed scores), so ab
    // and bc win no segment and must be absent from the final table, while
    // chars persist at cnt 0.
    val out = Unigram.train(docs((1L, "abc")))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out.head == (("abc", 1L)))
    val pieces = out.map(_._1).toSet
    assert(!pieces.contains("ab") && !pieces.contains("bc"))
    assert(Set("a", "b", "c").subsetOf(pieces))
    assert(out.filter(p => Set("a", "b", "c")(p._1)).forall(_._2 == 0L))
  }

  test("pieceMap broadcast guard: an unbounded piece table fails with the named bound") {
    import org.apache.spark.sql.functions._
    // PieceMapBound + 1 distinct pieces: a raw substring table, not a
    // trained vocabulary — the in-plan CASE must raise, not broadcast
    val huge = spark.range(Unigram.PieceMapBound + 1)
      .select(concat(lit("p"), col("id")).as("piece"), col("id").as("s"))
    val ex = intercept[Exception] { Unigram.pieceMap(huge).collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("model-size bound")),
      s"guard must name the bound, got: ${msgs(ex).mkString(" | ")}")
  }
}
