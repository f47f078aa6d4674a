package graft.ops

import graft.SparkSpec

class LinkageSpec extends SparkSpec {

  import spark.implicits._

  private def parts(names: String*) =
    names.zipWithIndex.map { case (n, i) => (i.toLong, n) }.toDF("p_partkey", "p_name")

  test("fuzzyJoin: distance, threshold cut, and support counts") {
    val out = Linkage.fuzzyJoin(
      parts("red widget", "Red  Widget", "blue widget", "enormous widget"), "p_name")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    // normalization collapses "Red  Widget" into "red widget" (support 2);
    // lev("red widget","blue widget") = 4 ≤ 5 keeps the pair;
    // lev("enormous widget", ...) > 5 is cut by the bounded kernel
    assert(out == Set(("blue widget", "red widget", 4L, 1L, 2L)))
  }

  test("fuzzyJoin: blocking scopes candidates — cross-block pairs never form") {
    // "red gadget" / "red widget" are within edit distance 2 of each other's
    // nouns but land in different blocks: documented recall trade of
    // block-then-verify (no |domain|² comparison)
    val out = Linkage.fuzzyJoin(parts("red gadget", "red widget"), "p_name").collect()
    assert(out.isEmpty)
  }

  test("fuzzyJoin: linkage runs on the distinct-key domain, not input rows") {
    // 1000 duplicate rows of two names -> exactly one candidate pair, with
    // support counts carrying the row multiplicity
    val many = (1 to 1000).flatMap(i => Seq((i.toLong, "red widget"), (1000L + i, "rad widget")))
      .toDF("p_partkey", "p_name")
    val out = Linkage.fuzzyJoin(many, "p_name").collect()
    assert(out.length == 1)
    assert(out.head.getLong(3) == 1000L && out.head.getLong(4) == 1000L)
  }
}
