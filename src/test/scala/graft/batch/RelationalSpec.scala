package graft.batch

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  test("approx_count_distinct stays within its 2% rsd bound on the test data") {
    val li = Tables.lineitem(spark, sf("sf0.01"))
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Relational.queries("q_approx_distinct")(spark, sf("sf0.01"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      val a = approx(k)
      assert(math.abs(a - n).toDouble / n < 0.1, s"$k: approx $a vs exact $n")
    }
  }

  test("price_adj integer-mills uplift is exact on the cents ≡ 5 (mod 10) tie class") {
    import spark.implicits._
    // cents*1.1 ends exactly on .5 for cents ≡ 5 (mod 10) — the class where
    // round(x*110) sat on a HALF_UP-vs-banker's tie. cents*11 is integral:
    // the expression must return the exact ×1.1 value to the mill for EVERY
    // cent residue, ties included.
    val cents = (0L until 1000L) ++ Seq(5L, 15L, 25L, 95L, 105L, 999995L, 1234565L)
    val df = cents.map(c => (c, c / 100.0)).toDF("cents", "p_retailprice")
    val out = df.select(col("cents"),
      (expr("cast(round(p_retailprice * 1100) as bigint)") / 1000.0).as("price_adj"))
      .collect()
    out.foreach { r =>
      val c = r.getLong(0)
      assert(r.getDouble(1) == (c * 11L) / 1000.0, s"cents=$c")
    }
  }

  test("rollup emits per-group, per-prefix, and grand-total rows") {
    val out = Relational.queries("q_rollup")(spark, sf()).collect()
    assert(out.exists(r => r.getString(0) == "ALL" && r.getString(1) == "ALL"))
    assert(out.exists(r => r.getString(0) != "ALL" && r.getString(1) == "ALL"))
    assert(out.exists(r => r.getString(0) != "ALL" && r.getString(1) != "ALL"))
  }

  test("market share: per-year shares telescope to 1e6 and dims broadcast") {
    import org.apache.spark.sql.functions._
    val q = Relational.queries("q_market_share")(spark, sf("sf0.01"))
    val rows = q.collect()
    assert(rows.nonEmpty)
    // integer-truncated shares: sum within [1e6 - nations, 1e6] per year
    rows.groupBy(_.getLong(0)).foreach { case (yr, rs) =>
      val s = rs.map(_.getLong(3)).sum
      assert(s <= 1000000L && s >= 1000000L - rs.length, s"year $yr shares sum $s")
    }
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "dims must broadcast")
    // every join is keyed: at sf0.01 AQE may legitimately broadcast even the
    // lineitem⋈orders side (the documented bench-scale artifact, PLANS.md);
    // what must NEVER appear is an unkeyed expansion
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("dqChecks: planted violations each surface in their own metric") {
    import spark.implicits._
    // orders 1 (dup'd), 2; lineitems: ok(1), orphan(99), bad qty(1), bad disc(2)
    val o = Seq(1L, 1L, 2L, 3L).toDF("o_orderkey") // 3 is childless
    val l = Seq(
      (1L, 10.0, 0.05), (99L, 5.0, 0.05), (1L, 99.0, 0.05), (2L, 5.0, 0.5))
      .toDF("l_orderkey", "l_quantity", "l_discount")
    val r = Relational.dqChecks(l, o).collect().head
    assert(r.getLong(0) == 4L) // n_lineitem
    assert(r.getLong(1) == 0L) // null keys
    assert(r.getLong(2) == 1L) // qty 99 out of range
    assert(r.getLong(3) == 1L) // disc 0.5 out of range
    assert(r.getLong(4) == 1L) // orphan 99
    assert(r.getLong(5) == 1L) // dup key 1
    assert(r.getLong(6) == 1L) // childless 3
  }

  test("percentile_disc: rank selection matches a local order-statistic replica") {
    val out = Relational.queries("q_percentile_disc")(spark, sf()).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val local = graft.Tables.documents(spark, sf())
      .select("source", "n_chars").collect()
      .groupBy(_.getString(0)).map { case (s, rows) =>
        val v = rows.map(_.getLong(1)).sorted
        val n = v.length.toLong
        def at(num: Long, den: Long) = v((((n * num + den - 1) / den) - 1).toInt)
        s -> (n, at(1, 2), at(9, 10), at(99, 100))
      }
    assert(out == local)
  }

  test("pivot: wide counts zero-fill absent combos; unpivot is its inverse") {
    import org.apache.spark.sql.functions._
    val wide = Relational.queries("q_pivot")(spark, sf())
    assert(wide.columns.toSeq == "day" +: Relational.PivotTypes.map("n_" + _))
    // row sums equal the plain per-day counts
    val ev = graft.Tables.events(spark, sf())
    val perDay = ev.groupBy(expr("__time__ div 86400000").as("day"))
      .count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sums = wide.collect().map(r =>
      r.getLong(0) -> (1 to Relational.PivotTypes.size).map(r.getLong).sum).toMap
    assert(sums == perDay)
    // unpivot restores long form: one row per (day, type), zero-filled
    val long = Relational.queries("q_unpivot")(spark, sf())
    assert(long.count() == wide.count() * Relational.PivotTypes.size)
    val back = long.groupBy("day").agg(sum("n").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(back == perDay)
  }

  test("cumulate window: final step row equals the day's tumble total") {
    import org.apache.spark.sql.functions._
    val cum = graft.ops.WindowsBatch.cumulate(graft.Tables.events(spark, sf()))
    // steps are expanding: n is non-decreasing in we within (ws, event_type)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("ws"), col("event_type")).orderBy(col("we"))
    assert(cum.withColumn("prev", lag(col("n"), 1).over(w))
      .where(col("prev").isNotNull && col("n") < col("prev")).isEmpty)
    // the last step covers the whole day: equals a straight daily groupBy
    val last = cum.where(col("we") === col("ws") + graft.ops.WindowsBatch.CumSizeMs)
      .select(col("ws"), col("event_type"), col("n"))
    val daily = graft.Tables.events(spark, sf())
      .groupBy(expr(s"__time__ div ${graft.ops.WindowsBatch.CumSizeMs}L * ${graft.ops.WindowsBatch.CumSizeMs}L").as("ws"),
        col("event_type")).agg(count(lit(1)).as("n"))
    assert(last.exceptAll(daily).isEmpty && daily.exceptAll(last).isEmpty)
  }
}
