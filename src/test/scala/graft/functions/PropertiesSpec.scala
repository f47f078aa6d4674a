package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** Operator-law properties over seeded random inputs (SURVEY §5 plan item c).
  * Deterministic seed — failures reproduce exactly.
  */
class PropertiesSpec extends SparkSpec {

  private val rnd = new Random(42)
  private val Cases = 200

  test("law: asofJoin equals the brute-force latest-at-or-before definition") {
    import spark.implicits._
    // small key/time domains force dense collisions: unmatched rows, exact
    // ties, multiple candidates per left row
    val leftRows = Seq.fill(Cases)(
      (rnd.nextInt(8).toLong, rnd.nextInt(40).toLong * 10, rnd.nextInt(1000)))
    val rightRows = Seq.fill(Cases) {
      (rnd.nextInt(8).toLong, rnd.nextInt(40).toLong * 10, rnd.nextDouble())
    }.groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq // unique (k, rt)
    val left = leftRows.zipWithIndex.map { case ((k, t, p), i) => (i.toLong, k, t, p) }
      .toDF("id", "k", "t", "payload")
    val right = rightRows.toDF("k", "rt", "rv")

    val got = graft.ops.AsOf.asofJoin(left, right, Seq("k"), "t", "rt", Seq("rv"))
      .collect()
      .map(r => r.getLong(0) -> (Option(r.get(4)).map(_.asInstanceOf[Double]),
        Option(r.get(5)).map(_.asInstanceOf[Long]))).toMap

    val byKey = rightRows.groupBy(_._1)
    leftRows.zipWithIndex.foreach { case ((k, t, _), i) =>
      val want = byKey.getOrElse(k, Seq.empty).filter(_._2 <= t) match {
        case Seq() => (None, None)
        case cands => val m = cands.maxBy(_._2); (Some(m._3), Some(m._2))
      }
      assert(got(i.toLong) == want, s"left row $i (k=$k, t=$t)")
    }
    assert(got.size == leftRows.size)
  }

  test("law: SortedIntersectCount(a, a) == |a| and is symmetric") {
    import spark.implicits._
    val rows = Seq.fill(Cases) {
      val a = Seq.fill(rnd.nextInt(30))(rnd.nextLong()).distinct.sorted
      val b = Seq.fill(rnd.nextInt(30))(rnd.nextLong()).distinct.sorted
      (a, b)
    }
    val df = rows.toDF("a", "b")
    val got = df.select(
      GraftFunctions.sortedIntersectCount(col("a"), col("a")).as("aa"),
      GraftFunctions.sortedIntersectCount(col("a"), col("b")).as("ab"),
      GraftFunctions.sortedIntersectCount(col("b"), col("a")).as("ba"),
      size(col("a")).as("na")).collect()
    got.foreach { r =>
      assert(r.getAs[Long]("aa") == r.getAs[Int]("na").toLong)
      assert(r.getAs[Long]("ab") == r.getAs[Long]("ba"))
    }
  }

  test("law: SortedIntersectCount equals the set-intersection cardinality") {
    import spark.implicits._
    val rows = Seq.fill(Cases) {
      // overlapping domains so intersections are non-trivial
      val a = Seq.fill(rnd.nextInt(40))(rnd.nextInt(50).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(40))(rnd.nextInt(50).toLong).distinct.sorted
      (a, b, a.toSet.intersect(b.toSet).size.toLong)
    }
    val got = rows.toDF("a", "b", "expected")
      .select(GraftFunctions.sortedIntersectCount(col("a"), col("b")).as("got"), col("expected"))
      .collect()
    got.foreach(r => assert(r.getAs[Long]("got") == r.getAs[Long]("expected")))
  }

  test("law: SimHash60 is invariant to token-hash order and duplication") {
    import spark.implicits._
    val rows = Seq.fill(Cases) {
      val hs = Seq.fill(rnd.nextInt(20) + 1)(rnd.nextLong() & ((1L << 60) - 1))
      val shuffledDup = rnd.shuffle(hs ++ hs.take(rnd.nextInt(hs.size)))
      (hs, shuffledDup)
    }
    // NOTE: duplication is NOT invariant for simhash votes in general — only
    // order is. Use distinct on both sides to test order-invariance cleanly.
    val got = rows.map { case (a, b) => (a.distinct, rnd.shuffle(a).distinct) }
      .toDF("a", "b")
      .select(GraftFunctions.simhash60(col("a")).as("sa"),
        GraftFunctions.simhash60(col("b")).as("sb")).collect()
    got.foreach(r => assert(r.getAs[Long]("sa") == r.getAs[Long]("sb")))
  }

  test("law: DotProduct is symmetric and matches a local fold") {
    import spark.implicits._
    val rows = Seq.fill(Cases) {
      val n = rnd.nextInt(20) + 1
      val a = Seq.fill(n)(rnd.nextDouble() * 2 - 1)
      val b = Seq.fill(n)(rnd.nextDouble() * 2 - 1)
      (a, b, a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y })
    }
    val got = rows.toDF("a", "b", "expected")
      .select(GraftFunctions.dot(col("a"), col("b")).as("ab"),
        GraftFunctions.dot(col("b"), col("a")).as("ba"), col("expected"))
      .collect()
    got.foreach { r =>
      assert(r.getAs[Double]("ab") == r.getAs[Double]("expected"), "exact fold equality")
      assert(r.getAs[Double]("ab") == r.getAs[Double]("ba"))
    }
  }

  test("law: filter(p).filter(q) == filter(p && q)") {
    import spark.implicits._
    val df = Seq.fill(500)((rnd.nextInt(100), rnd.nextInt(100))).toDF("x", "y")
    val chained = df.filter(col("x") > 30).filter(col("y") < 70).count()
    val fused = df.filter(col("x") > 30 && col("y") < 70).count()
    assert(chained == fused)
  }

  test("law: minhash estimate is an unbiased-ish Jaccard estimator on crafted sets") {
    import spark.implicits._
    // identical shingle arrays -> every permutation min equal -> est = 1
    val hs = Seq.fill(50)(rnd.nextLong() & ((1L << 60) - 1)).map(h => math.floorMod(h, 2147483647L))
    val df = Seq((hs, hs)).toDF("a", "b")
    val mh = df.select(
      GraftFunctions.minhashes(col("a"), graft.ops.Dedup.permCoeffs, 2147483647L).as("ma"),
      GraftFunctions.minhashes(col("b"), graft.ops.Dedup.permCoeffs, 2147483647L).as("mb"))
    val r = mh.select(expr("size(filter(zip_with(ma, mb, (x, y) -> x = y), v -> v))").as("eq"))
      .collect().head
    assert(r.getAs[Int]("eq") == graft.ops.Dedup.MinhashPerms)
  }
  test("law: zvalue is a bijection on [0,1024)^2 (random sample + corners)") {
    import spark.implicits._
    val pts = (Seq.fill(Cases)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong)) ++
      Seq((0L, 0L), (1023L, 0L), (0L, 1023L), (1023L, 1023L))).distinct
    val zs = pts.toDF("x", "y")
      .withColumn("zv", expr(graft.ops.Corpus.zvalueSql("x", "y", "div")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(zs.map(_._3).distinct.length == pts.length, "z collision")
    zs.foreach { case (x, y, z) =>
      var dx = 0L; var dy = 0L
      for (i <- 0 until graft.ops.Corpus.ZBits) {
        dx |= ((z >> (2 * i)) & 1L) << i; dy |= ((z >> (2 * i + 1)) & 1L) << i
      }
      assert((dx, dy) == ((x, y)))
    }
  }

  test("law: skewSplitJoin == plain inner join on random skewed data, any hotK") {
    import spark.implicits._
    // zipf-ish skew: key 0 is hot
    val fact = Seq.fill(Cases * 4)({
      val k = if (rnd.nextInt(3) == 0) 0L else rnd.nextInt(40).toLong
      (k, rnd.nextInt(1000))
    }).zipWithIndex.map { case ((k, v), i) => (i.toLong, k, v) }
      .toDF("fid", "fk", "fv")
    val dim = (0L until 30L).map(k => (k, s"d$k")).toDF("dk", "dname")
    for (hotK <- Seq(1, 5, 64)) {
      val split = graft.ops.Skew.skewSplitJoin(fact, dim, "fk", "dk", hotK)
        .select("fid", "dname").collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      val plain = fact.join(dim, col("fk") === col("dk"))
        .select("fid", "dname").collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      assert(split == plain, s"hotK=$hotK")
    }
  }

  test("law: latestSnapshot == the row_number window spelling on random changelogs") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val log = Seq.fill(Cases * 2)(
      (rnd.nextInt(12).toLong, rnd.nextInt(50).toLong, rnd.nextInt(100)))
      .zipWithIndex.map { case ((k, t, v), i) => (i.toLong, k, t, v) }
      .toDF("eid", "k", "t", "v")
    val agg = graft.ops.Cdc.latestSnapshot(log, Seq("k"), Seq("t", "eid"))
      .select("k", "eid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val w = Window.partitionBy(col("k")).orderBy(col("t").desc, col("eid").desc)
    val win = log.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("k", "eid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(agg == win)
  }

  test("law: normalizeText is idempotent and ASCII-clean text is a fixed point") {
    val strs = Seq.fill(Cases) {
      val pool = "ab c\t\n\u00A0\u200Be\u0301xyz "
      Seq.fill(rnd.nextInt(24))(pool(rnd.nextInt(pool.length))).mkString
    }
    strs.foreach { s0 =>
      val once = graft.functions.NormalizeText.normalize(
        org.apache.spark.unsafe.types.UTF8String.fromString(s0)).toString
      val twice = graft.functions.NormalizeText.normalize(
        org.apache.spark.unsafe.types.UTF8String.fromString(once)).toString
      assert(once == twice, s"not idempotent on ${s0.map(_.toInt)}")
    }
    assert(graft.functions.NormalizeText.normalize(
      org.apache.spark.unsafe.types.UTF8String.fromString("plain ascii text")).toString
      == "plain ascii text")
  }
}
