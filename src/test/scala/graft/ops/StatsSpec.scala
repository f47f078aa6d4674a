package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSpec {

  import spark.implicits._

  test("quantileBins: per-group equal-frequency bins, contiguous and ordered") {
    val bySource = Stats.quantileBins(graft.Tables.documents(spark, sf("sf0.01")))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .groupBy(_._1)
    assert(bySource.nonEmpty)
    bySource.foreach { case (src, rows) =>
      val out = rows.sortBy(_._2)
      assert(out.length == Stats.QuantileBins, s"$src: ${out.length} bins")
      // ntile: bin sizes differ by at most one
      val sizes = out.map(_._3)
      assert(sizes.max - sizes.min <= 1, s"$src sizes: ${sizes.toSeq}")
      // bins tile the value axis in order (lo <= hi, next lo >= previous hi)
      out.foreach { case (_, _, _, lo, hi) => assert(lo <= hi) }
      out.sliding(2).foreach { case Array(a, b) => assert(b._4 >= a._5); case _ => }
    }
  }

  test("correlation: perfectly correlated and anti-correlated fixtures") {
    def li(rows: (Double, Double)*) = rows.toDF("l_quantity", "l_discount")
    val pos = Stats.correlation(li((1.0, 0.01), (2.0, 0.02), (3.0, 0.03))).collect().head
    assert(pos.getDouble(1) == 1.0)
    val neg = Stats.correlation(li((1.0, 0.03), (2.0, 0.02), (3.0, 0.01))).collect().head
    assert(neg.getDouble(1) == -1.0)
    val mid = Stats.correlation(li((1.0, 0.01), (2.0, 0.01), (1.0, 0.02), (2.0, 0.02)))
      .collect().head
    assert(mid.getDouble(1) == 0.0)
  }

  test("mode: largest count wins, ties break to the smallest value") {
    def d(rows: (String, String)*) = rows.toDF("source", "lang")
    val out = Stats.mode(d(
      ("s1", "en"), ("s1", "en"), ("s1", "de"),
      ("s2", "zh"), ("s2", "fr"))) // tie at 1: fr < zh
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out == Map("s1" -> ("en", 2L), "s2" -> ("fr", 1L)))
  }

  test("trend: exact slope on a linear fixture; degenerate x spread dropped") {
    val day = 86400000L
    def ev(user: Long, pts: Seq[(Long, Double)], base: Long) =
      pts.zipWithIndex.map { case ((d, v), i) =>
        (base + i, user, "view", d * day + 1000L, v)
      }.toDF("event_id", "user_id", "event_type", "__time__", "value")
    // value rises exactly 2.5/day -> slope 25000 micro-units/day
    val rising = ev(1L, (0L to 5L).map(d => d -> (10.0 + 2.5 * d)), 0)
    val flatX = ev(2L, Seq.fill(6)(3L -> 1.0).zipWithIndex.map { case ((d, _), i) => d -> (i * 1.0) }, 100)
    val out = Stats.trend(rising.union(flatX)).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out == Map(1L -> 25000.0)) // user 2: all points on one day -> no slope
  }

  test("mad: robust to the outlier that moves the mean") {
    def d(rows: (Long, String, Long)*) = rows.toDF("doc_id", "source", "n_chars")
    // values 10,12,14,16,1000: median 14, |dev| = 4,2,0,2,986 -> MAD 2
    val out = Stats.mad(d(
      (1L, "s", 10L), (2L, "s", 12L), (3L, "s", 14L), (4L, "s", 16L), (5L, "s", 1000L)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(("s", 5L, 14L, 2L)))
  }

  test("entropy: uniform mix maxes out, single type is zero, fold is exact") {
    def ev(rows: (Long, String)*) = rows.zipWithIndex.map { case ((u, t), i) =>
      (i.toLong, u, t, i.toLong * 1000, 0.0)
    }.toDF("event_id", "user_id", "event_type", "__time__", "value")
    // user 1: 2+2 of two types -> H = ln(2); user 2: one type -> 0
    val out = Stats.entropy(ev(
      (1L, "view"), (1L, "view"), (1L, "click"), (1L, "click"),
      (2L, "view"), (2L, "view"), (2L, "view")))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val ln2 = BigDecimal(math.log(4.0) - (2.0 * math.log(2.0) + 2.0 * math.log(2.0)) / 4.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) == ln2 && out(2L) == 0.0)
  }

  test("abTest: z matches a local replica; degenerate split yields NULL") {
    def ev(rows: (Long, String)*) = rows.zipWithIndex.map { case ((u, t), i) =>
      (i.toLong, u, t, i.toLong * 1000)
    }.toDF("event_id", "user_id", "event_type", "__time__")
    // users 0,2 (grp 0): one heavy (14 purchases), one light; users 1,3
    // (grp 1): both light -> conv_a=1/2, conv_b=0/2
    val rows =
      (1 to 14).map(_ => (0L, "purchase")) ++ Seq((2L, "view")) ++
        Seq((1L, "view"), (3L, "click"))
    val out = Stats.abTest(ev(rows: _*)).collect().head
    assert((out.getLong(0), out.getLong(1), out.getLong(2), out.getLong(3)) == (2L, 1L, 2L, 0L))
    val p = 1.0 / 4.0
    val raw = (0.5 - 0.0) / math.sqrt(p * (1 - p) * (1.0 / 2 + 1.0 / 2))
    val exp = java.math.BigDecimal.valueOf(raw)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    assert(out.getDouble(4) == exp)
    // all users light -> pooled p = 0 -> no z
    val degenerate = Stats.abTest(ev((0L, "view"), (1L, "click"))).collect().head
    assert(degenerate.isNullAt(4))
  }

  test("corrMatrix: planted perfect/anti correlations exact; all pairs in [-1, 1]") {
    val s = spark
    import s.implicits._
    // price = 2*qty (r=+1), disc = -qty/1e4 scaled (r=-1 vs qty, -1 vs price);
    // tax varies non-monotonically so no variance degenerates
    val li = Seq(1, 2, 3, 4, 5).map(i =>
      (i.toDouble, 2.0 * i, -0.0001 * i, if (i % 2 == 0) 0.0002 else 0.0001))
      .toDF("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val out = Stats.corrMatrix(li).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(out.size == 6)
    assert(out(("qty", "price")) == 1.0)
    assert(out(("qty", "disc")) == -1.0)
    assert(out(("price", "disc")) == -1.0)
    out.values.foreach(r => assert(r >= -1.0 && r <= 1.0))
    // real data: every pair finite and bounded, n identical across rows
    val real = Stats.corrMatrix(graft.Tables.lineitem(spark, sf())).collect()
    assert(real.length == 6)
    assert(real.map(_.getLong(2)).distinct.length == 1)
    real.foreach { r =>
      val v = r.getDouble(3)
      assert(!v.isNaN && v >= -1.0 && v <= 1.0, s"${r.getString(0)}-${r.getString(1)}: $v")
    }
  }
}
