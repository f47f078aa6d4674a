package graft.batch

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Semantics + plan-shape checks for the TPC-H-flavored deep-join suite.
  * Correctness vs DuckDB is the driver's oracle gate; these specs pin the
  * invariants the oracle can't see: which plan shapes run, and the
  * aggregate-before-join / struct-min disciplines that make each query
  * survive 100× data.
  */
class DeepAnalyticsSpec extends SparkSpec {

  test("min-cost supplier: election is a struct-min fold, not a rank window") {
    val q = DeepAnalytics.minCostSupplier(spark, sf("sf0.01"))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "per-part election must not run a rank window")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    val rows = q.collect()
    assert(rows.nonEmpty)
    // elected cost really is the per-(part) minimum over every supplier
    val perPart = Tables.lineitem(spark, sf("sf0.01"))
      .join(Tables.part(spark, sf("sf0.01")).filter(col("p_type") === "STANDARD"),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_partkey"))
      .agg(min(expr("cast(round(l_extendedprice * 100) as bigint)")).as("mc"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(2) == perPart(r.getLong(0)),
      s"part ${r.getLong(0)}: elected ${r.getLong(2)} != min ${perPart(r.getLong(0))}"))
  }

  test("top unshipped: both date filters push to the scans; top-10 is TakeOrdered") {
    val q = DeepAnalytics.topUnshipped(spark, sf("sf0.01"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), "top-k must not global-sort")
    val fmt = q.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(fmt.contains("GreaterThan(l_shipdate") && fmt.contains("LessThan(o_orderdate"),
      "date predicates must reach the parquet readers")
    val rows = q.collect()
    assert(rows.length == 10)
    assert(rows.map(_.getLong(3)).sliding(2).forall(p => p(0) >= p(1)), "descending revenue")
  }

  test("order-priority lateness: EXISTS lowers to one left-semi join, counts once per order") {
    val q = DeepAnalytics.orderPriorityLate(spark, sf("sf0.001"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), "EXISTS must be a semi join")
    val total = q.collect().map(_.getLong(1)).sum
    val direct = Tables.orders(spark, sf("sf0.001")).join(
      Tables.lineitem(spark, sf("sf0.001")),
      col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .select(col("o_orderkey")).distinct().count()
    assert(total == direct, s"semi-join count $total != distinct-late-orders $direct")
  }

  test("promo share: exact-integer shares stay in [0, 1e6] and reconcile with totals") {
    val rows = DeepAnalytics.promoShare(spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (promo, total, share) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(promo <= total)
      // overflow-safe coarser-units quotient (currency units, not e4) —
      // must stay within 1 e6-unit of the exact e4 quotient
      assert(share == (promo / 10000L) * 1000000L / (total / 10000L),
        "share must be the documented coarser-units integer quotient")
      assert(math.abs(share - promo * 1000000L / total) <= 1,
        "coarsening must not move the share by more than one e6 unit")
      assert(share >= 0 && share <= 1000000L)
    }
  }

  test("small-qty revenue: integer cross-multiplication equals the 20%-of-avg predicate") {
    // planted fixture: part 1 has quantities (1, 10, 10, 10) → avg 7.75,
    // 20% = 1.55 → only the q=1 row qualifies; its price lands in the sum
    import spark.implicits._
    val fact = Seq((1L, 1L, 100L), (1L, 10L, 999L), (1L, 10L, 999L), (1L, 10L, 999L))
      .toDF("p_partkey", "q", "price_c")
    val perPart = fact.groupBy(col("p_partkey"))
      .agg(count(lit(1)).as("n_p"), sum(col("q")).as("sum_q"))
    val kept = fact.join(perPart, "p_partkey")
      .filter(col("q") * 5L * col("n_p") < col("sum_q"))
      .collect()
    assert(kept.length == 1 && kept.head.getLong(2) == 100L)
    val out = DeepAnalytics.smallQtyRevenue(spark, sf("sf0.01")).collect().head
    assert(out.getLong(1) > 0, "brand filter must leave qualifying rows at sf0.01")
  }

  test("big orders: HAVING runs before the orders/customer joins") {
    val q = DeepAnalytics.bigOrders(spark, sf("sf0.01"))
    val opt = q.queryExecution.optimizedPlan.toString
    // the quantity aggregate must sit BELOW the joins in the optimized plan:
    // the join inputs are (filtered aggregate, orders, customer) — if the
    // filter floated above the join the aggregate would join every order
    val joinIdx = opt.indexOf("Join")
    val aggIdx = opt.indexOf("Aggregate")
    assert(joinIdx >= 0 && aggIdx > joinIdx, "aggregate must be a join INPUT (below the join)")
    val rows = q.collect()
    assert(rows.nonEmpty && rows.forall(_.getLong(4) > DeepAnalytics.BigQty))
  }

  test("profile: two passes over the fact (stats + melted distinct), no expand") {
    val q = DeepAnalytics.profile(spark, sf("sf0.001"))
    // one scan for count/min/max, one for the melted cardinality pass —
    // never a per-column scan and never an Expand of the fact
    val plan = q.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).size == 2, "profiler must scan exactly twice")
    assert(!plan.contains("Expand"), "multi-distinct expand must not appear")
    val rows = q.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    val li = Tables.lineitem(spark, sf("sf0.001"))
    val n = li.count()
    assert(rows.keySet == Set("l_orderkey", "l_quantity", "l_extendedprice",
      "l_returnflag", "l_shipdate"))
    assert(rows.values.forall(_._1 == n))
    val ndOrder = li.select(col("l_orderkey")).distinct().count()
    assert(rows("l_orderkey")._3 == ndOrder)
    assert(rows("l_returnflag")._3 == 3L) // A / N / R
  }

  test("yoy growth: sign-split integer division matches on negative growth years") {
    val rows = DeepAnalytics.yoyGrowth(spark, sf("sf0.01")).collect()
    assert(rows.nonEmpty)
    val byNation = rows.groupBy(_.getString(0))
    byNation.values.foreach { rs =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.head.isNullAt(3), "first year has no prior -> null growth")
      sorted.sliding(2).foreach {
        case Array(prev, cur) if !cur.isNullAt(3) =>
          val (p, c, g) = (prev.getLong(2), cur.getLong(2), cur.getLong(3))
          val expect = math.signum(c - p) * (math.abs(c - p) * 1000000L / p)
          assert(g == expect, s"${cur.getString(0)} ${cur.getLong(1)}: $g vs $expect")
        case _ =>
      }
    }
    // the data contains at least one shrinking year so the sign path is real
    assert(rows.exists(r => !r.isNullAt(3) && r.getLong(3) < 0), "need a negative-growth year")
  }

  test("blame supplier: no fact self-join; blame requires multi-supplier + single-R") {
    val q = DeepAnalytics.blameSupplier(spark, sf("sf0.01"))
    val plan = q.queryExecution.executedPlan.toString
    // the fact appears ONCE: the only joins attach the supplier dim
    assert("Scan parquet".r.findAllIn(plan).size <= 2, "lineitem must not self-join")
    import spark.implicits._
    // planted: order 1 = supp 1 (R) + supp 2 (N) → blame 1;
    // order 2 = supp 1 (R) + supp 2 (R) → no single culprit;
    // order 3 = supp 3 alone (R) → single-supplier, excluded
    val li = Seq((1L, 1L, "R"), (1L, 2L, "N"), (2L, 1L, "R"), (2L, 2L, "R"), (3L, 3L, "R"))
      .toDF("l_orderkey", "l_suppkey", "l_returnflag")
    val per = li.select(col("l_orderkey"), col("l_suppkey"),
        when(col("l_returnflag") === "R", col("l_suppkey")).as("r_supp"))
      .groupBy(col("l_orderkey"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("r_supp")).as("n_r_supp"),
        max(col("r_supp")).as("blamed"))
      .filter(col("n_supp") > 1 && col("n_r_supp") === 1)
      .collect()
    assert(per.length == 1 && per.head.getLong(0) == 1L && per.head.getLong(3) == 1L)
  }

  test("revenue MA: 7-day RANGE window matches a local replica; gaps shrink the window") {
    val rows = DeepAnalytics.dailyRevenueMa(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(rows.nonEmpty)
    val rev = rows.map(r => r._1 -> r._2).toMap
    rows.foreach { case (day, _, ma) =>
      val win = (day - 6 to day).flatMap(rev.get)
      assert(ma == win.sum / win.length, s"day $day: $ma vs ${win.sum / win.length}")
    }
  }

  test("profileDiffOf: planted null creep, new category, and bound jump are reported") {
    val s = spark
    import s.implicits._
    val v1 = Seq(
      (1L, Option(1.0), 10.0, "A", "1996-01-01"),
      (2L, Option(2.0), 10.0, "N", "1996-01-02"))
      .toDF("l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag", "l_shipdate")
    val v2 = v1.union(Seq(
      (3L, Option.empty[Double], 50.0, "R", "1996-01-02"))
      .toDF("l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag", "l_shipdate"))
    val out = DeepAnalytics.profileDiffOf(spark, v1, v2).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out == Map(
      "l_orderkey" -> ((1L, 0L, 1L, true)),          // new id extends the max
      "l_quantity" -> ((1L, 333333L, 0L, false)),    // null creep: 0 -> 1/3 e6
      "l_extendedprice" -> ((1L, 0L, 1L, true)),     // 50.0 jumps the max
      "l_returnflag" -> ((1L, 0L, 1L, true)),        // new category R
      "l_shipdate" -> ((1L, 0L, 0L, false))))        // inside the old envelope
  }
}
