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

  test("typoJoin finds the pair whose typo sits in the blocking token (fuzzyJoin misses it)") {
    // last tokens differ -> different fuzzyJoin blocks; distance is still 1
    val d = Seq((1L, "blue bolt"), (2L, "blue belt"))
      .toDF("p_partkey", "p_name")
    assert(Linkage.fuzzyJoin(d, "p_name").collect().isEmpty,
      "blocking should miss this pair (that is the point)")
    val out = Linkage.typoJoin(d, "p_name").collect()
    assert(out.length == 1 && out.head.getString(0) == "blue belt"
      && out.head.getString(1) == "blue bolt" && out.head.getLong(2) == 1L)
  }

  test("typoJoin: exact recall equals a brute-force distance-1 scan on the corpus keys") {
    import org.apache.spark.sql.functions._
    val parts = graft.Tables.part(spark, sf("sf0.01"))
    val out = Linkage.typoJoin(parts, "p_name").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // brute force over the distinct normalized key domain
    val keys = parts.select(graft.ops.Text.normalized(col("p_name")).as("k"))
      .distinct().collect().map(_.getString(0))
    def lev1(a: String, b: String): Boolean = {
      if (math.abs(a.length - b.length) > 1 || a == b) false
      else if (a.length == b.length) a.zip(b).count { case (x, y) => x != y } == 1
      else {
        val (s, l) = if (a.length < b.length) (a, b) else (b, a)
        (0 to s.length).exists(i => s.take(i) == l.take(i) && s.drop(i) == l.drop(i + 1))
      }
    }
    val brute = (for {
      x <- keys; y <- keys if x < y && lev1(x, y)
    } yield (x, y)).toSet
    assert(out == brute, s"missing=${brute -- out} extra=${out -- brute}")
  }
}
