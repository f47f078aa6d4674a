package graft.ops

import graft.SparkSpec

class BpeSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("learnMerges: hand-computed merge sequence on a tiny corpus") {
    // corpus: "low low low lower" -> words: low x3, lower x1
    // syms: " l o w </w> " (freq 3), " l o w e r </w> " (freq 1)
    // round 1 pairs: (l,o)=4 (o,w)=4 (w,</w>)=3 (w,e)=1 (e,r)=1 (r,</w>)=1
    //   tie 4/4 -> (l,o) before (o,w) by symbol order -> merge "lo"
    // round 2: (lo,w)=4 wins -> "low"
    // round 3: (low,</w>)=3 wins -> "low</w>"
    val m = Bpe.learnMerges(docs((1L, "low low low lower")), n = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(4)))
    assert(m.toSeq == Seq(
      (1L, "l", "o", 4L),
      (2L, "lo", "w", 4L),
      (3L, "low", "</w>", 3L)))
  }

  test("merge application is left-to-right non-overlapping (documented semantics)") {
    // "aaaa" -> " a a a a </w> ". Round 1: (a,a) counted at ALL 3 adjacent
    // positions -> cnt 3; applying the merge left-to-right non-overlapping
    // gives " aa a a </w> " (the shared-boundary middle pair is skipped).
    // Round 2 state pairs: (aa,a) (a,a) (a,</w>) all cnt 1 -> tie broken by
    // binary order: "a" < "aa" and "</w>" < "a", so (a,</w>) wins.
    val m = Bpe.learnMerges(docs((1L, "aaaa")), n = 2)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    assert(m(0) == (("a", "a", 3L)))
    assert(m(1) == (("a", "</w>", 1L)))
  }

  test("encode compresses with learned merges and never crosses word boundaries") {
    val corpus = docs((1L, "low low lower"), (2L, "low"))
    val merges = Bpe.learnMerges(corpus, n = 3)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val enc = Bpe.encode(corpus, merges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 2 "low": chars l o w </w> = 4 symbols -> after (l,o)(lo,w)(low,</w>)
    // merges collapse to 1 symbol
    assert(enc(2L) == 1L)
    // doc 1 raw: 4+4+6 = 14 symbols. Merging (low,</w>) consumes the
    // boundary space shared with the NEXT occurrence (left-to-right
    // non-overlapping replace), so the second "low </w>" stays unmerged:
    // low</w>, low, </w>, low, e, r, </w> = 7
    assert(enc(1L) == 7L)
  }
}
