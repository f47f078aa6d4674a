package graft.ops

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class BehaviorSpec extends SparkSpec {

  import spark.implicits._

  private lazy val events = Tables.events(spark, sf())

  /** Hand-built event log: user 1 completes the funnel in-window; user 2
    * stalls after view (click precedes view, so it must not count); user 3
    * purchases OUTSIDE the 72 h window; user 4 never signs up (excluded).
    */
  private def fixture: DataFrame = {
    val h = 3600L * 1000
    Seq(
      (1L, 1L, "signup", 10 * h), (2L, 1L, "view", 11 * h),
      (3L, 1L, "click", 12 * h), (4L, 1L, "purchase", 13 * h),
      (5L, 2L, "click", 9 * h), (6L, 2L, "signup", 10 * h),
      (7L, 2L, "view", 12 * h), (8L, 2L, "click", 11 * h),
      (9L, 3L, "signup", 0L), (10L, 3L, "view", 1 * h),
      (11L, 3L, "click", 2 * h), (12L, 3L, "purchase", 80 * h),
      (13L, 4L, "view", 5 * h), (14L, 4L, "purchase", 6 * h))
      .toDF("event_id", "user_id", "event_type", "__time__")
  }

  test("funnel: staged ordering, 72h cap, and non-signup exclusion") {
    val out = Behavior.funnel(fixture)
      .select("user_id", "stage", "t_purchase").orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), Option(r.get(2)))).toSeq
    assert(out == Seq(
      (1L, 4, Some(13 * 3600L * 1000)),
      (2L, 2, None), // click at 11h is BEFORE view at 12h -> stage stops at view
      (3L, 3, None))) // purchase at 80h misses the 72h window
  }

  test("funnel stage counts on sf0.001 are consistent with stage times") {
    val out = Behavior.funnel(events).cache()
    val byStage = out.groupBy("stage").count().as[(Int, Long)].collect().toMap
    assert(byStage.keys.forall(s => s >= 1 && s <= 4))
    // stage k implies t_k set and t_{k+1} unset
    assert(out.where(col("stage") === 4 && col("t_purchase").isNull).isEmpty)
    assert(out.where(col("stage") === 3 &&
      (col("t_click").isNull || col("t_purchase").isNotNull)).isEmpty)
    // monotone: t_signup < t_view < t_click < t_purchase where present
    assert(out.where(col("t_view").isNotNull && col("t_view") <= col("t_signup")).isEmpty)
    assert(out.where(col("t_click").isNotNull && col("t_click") <= col("t_view")).isEmpty)
    assert(out.where(col("t_purchase").isNotNull &&
      (col("t_purchase") <= col("t_click") ||
        col("t_purchase") > col("t_signup") + Behavior.FunnelWindowMs)).isEmpty)
    out.unpersist()
  }

  test("funnel is one exchange: chained windows + final agg share the user_id partitioning") {
    val plan = Behavior.funnel(events).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected a single user_id exchange, got $exchanges:\n${plan.take(3000)}")
  }

  test("retention: every user lands in exactly one cohort and offsets are non-negative") {
    val out = Behavior.retention(events)
    assert(out.where(col("offset_days") < 0).isEmpty)
    val users = events.select("user_id").distinct().count()
    val cohortSizes = out.where(col("offset_days") === 0)
      .agg(sum("users")).as[Long].head()
    // offset 0 rows count each user once (first active day)
    assert(cohortSizes == users)
  }

  test("transitions: counts conserve (n events - n users with >=1 event)") {
    val out = Behavior.transitions(events)
    val total = out.agg(sum("n")).as[Long].head()
    val nEvents = events.count()
    val nUsers = events.select("user_id").distinct().count()
    assert(total == nEvents - nUsers) // each user contributes (events-1) pairs
  }

  test("gapfill: dense per-user grid, observed rows keep their value, gaps carry forward") {
    val out = Behavior.gapfill(events).cache()
    // grid density: per user, rows == global max day - user's first day + 1
    val perUser = out.groupBy("user_id").agg(count(lit(1)).as("rows"),
      min("day").as("d0"), max("day").as("d1"))
    assert(perUser.where(col("rows") =!= col("d1") - col("d0") + 1).isEmpty)
    val maxDay = out.agg(max("day")).as[Long].head()
    assert(perUser.where(col("d1") =!= maxDay).isEmpty)
    // forward fill leaves no nulls (first grid day is the user's first active day)
    assert(out.where(col("value_ff").isNull).isEmpty)
    // a filled (unobserved) day's value equals the previous day's value
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("day")
    val filled = out.withColumn("prev", lag(col("value_ff"), 1).over(w))
      .where(col("observed") === 0)
    assert(filled.where(col("value_ff") =!= col("prev")).isEmpty)
    out.unpersist()
  }

  test("behavior results are partitioning-independent") {
    val shuffled = events.repartition(7, col("event_id"))
    for ((a, b) <- Seq(
      (Behavior.funnel(events), Behavior.funnel(shuffled)),
      (Behavior.retention(events), Behavior.retention(shuffled)),
      (Behavior.transitions(events), Behavior.transitions(shuffled)),
      (Behavior.gapfill(events), Behavior.gapfill(shuffled)),
      (Behavior.anomalies(events), Behavior.anomalies(shuffled)))) {
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    }
  }

  private def valueEvents(user: Long, vals: Seq[Double], idBase: Long = 0L) =
    vals.zipWithIndex.map { case (v, i) =>
      (idBase + i + 1, user, (i + 1) * 1000L, v)
    }.toDF("event_id", "user_id", "__time__", "value")

  test("anomalies: spike against a trailing window is flagged with the exact z") {
    // 8 alternating priors 9/11 then a 100.0 spike: v_e4 priors 90000/110000,
    // s=800000, ss=8.08e10 -> exact integer moments; z replayed by the same
    // IEEE expression the operator documents
    val d = valueEvents(1L, Seq(9.0, 11.0, 9.0, 11.0, 9.0, 11.0, 9.0, 11.0, 100.0))
    val out = Behavior.anomalies(d).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 9L && r.getLong(4) == 8L)
    val (n, v, s, ss) = (8L, 1000000L, 800000L, 80800000000L)
    val expZ = BigDecimal((n * v - s).toDouble * math.sqrt((n - 1).toDouble / n.toDouble) /
      math.sqrt((n * ss - s * s).toDouble))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(5) == expZ)
  }

  test("anomalies: zero-variance history and short history never fire") {
    // constant priors -> n*ss == s*s (guarded); first AnomalyMinN rows have
    // too few priors even with a spike among them
    val flat = valueEvents(2L, Seq.fill(12)(10.0) :+ 500.0, idBase = 100)
    assert(Behavior.anomalies(flat).collect().isEmpty)
    val short = valueEvents(3L, Seq(9.0, 11.0, 9.0, 11.0, 9.0, 500.0), idBase = 200)
    assert(Behavior.anomalies(short).collect().isEmpty)
  }

  private def attrEvents(rows: (Long, Long, String, Long, Double)*) =
    rows.map { case (id, u, t, ms, v) => (id, u, t, ms, v) }
      .toDF("event_id", "user_id", "event_type", "__time__", "value")

  test("attribution: last touch wins, window cuts, NULL row for unattributed") {
    val h = 3600L * 1000
    val out = Behavior.attribution(attrEvents(
      (1L, 1L, "view", 1 * h, 0.0), (2L, 1L, "click", 2 * h, 0.0),
      (3L, 1L, "purchase", 3 * h, 25.5), // -> click@2h (most recent touch)
      (4L, 2L, "view", 0L, 0.0),
      (5L, 2L, "purchase", 200 * h, 10.0), // touch outside the 7d window -> NULL
      (6L, 3L, "purchase", 5 * h, 1.0), // user with no touches at all -> NULL
      (7L, 4L, "purchase", 1 * h, 2.0),
      (8L, 4L, "view", 2 * h, 0.0)) // touch AFTER the purchase must not attribute
    ).collect().map(r => r.getLong(0) ->
      (Option(r.get(4)).map(_.asInstanceOf[Long]), Option(r.get(5)).map(_.toString))).toMap
    assert(out == Map(
      3L -> (Some(2L), Some("click")),
      5L -> (None, None),
      6L -> (None, None),
      7L -> (None, None)))
  }

  test("attribution: same-timestamp touch with smaller id precedes the purchase") {
    val out = Behavior.attribution(attrEvents(
      (10L, 9L, "view", 1000L, 0.0), (11L, 9L, "purchase", 1000L, 5.0),
      (12L, 9L, "click", 1000L, 0.0)) // larger id than the purchase: excluded
    ).collect()
    assert(out.map(r => (r.getLong(0), r.get(4))).toSeq == Seq((11L, 10L)))
  }

  test("attribution is one exchange: carry-forward shares the user_id partitioning") {
    val plan = Behavior.attribution(events).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected a single user_id exchange, got $exchanges")
  }

  test("itemsets: support counts baskets (not events) and the gate is exact") {
    val day = 86400000L
    // user 1 day 0: {view, click} twice over -> still ONE basket;
    // user 2 day 0: {view, click}; user 2 day 1: {view} alone
    val d = attrEvents(
      (1L, 1L, "view", 1000L, 0.0), (2L, 1L, "click", 2000L, 0.0),
      (3L, 1L, "view", 3000L, 0.0), (4L, 1L, "click", 4000L, 0.0),
      (5L, 2L, "view", 1000L, 0.0), (6L, 2L, "click", 2000L, 0.0),
      (7L, 2L, "view", day + 1000L, 0.0))
    // 3 baskets; (click, view) co-occurs in 2 -> ratio 2/3
    val out = Behavior.itemsets(d, minSupportE6 = 500000L).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3)))).toMap
    assert(out == Map(("click", "view") -> (2L, 0.666667)))
    // 67% support gate excludes the pair (2/3 < 0.67): integer gate is exact
    assert(Behavior.itemsets(d, minSupportE6 = 670000L).collect().isEmpty)
  }

  test("copurchase: baskets pair within orders only; jaccard is exact integer") {
    val s = spark
    import s.implicits._
    // orders: {1,2}, {1,2,3}, {1} (+ a dup row that must not double-count)
    val li = Seq((100L, 1L), (100L, 2L), (101L, 1L), (101L, 2L), (101L, 3L),
      (102L, 1L), (102L, 1L))
      .toDF("l_orderkey", "l_partkey")
    val out = Behavior.copurchase(li, minSupport = 1L, topK = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // c(1)=3, c(2)=2, c(3)=1; (1,2): 2 / (3+2-2) = 2/3
    assert(out == Map(
      (1L, 2L) -> (2L, 666666L),
      (1L, 3L) -> (1L, 333333L),
      (2L, 3L) -> (1L, 500000L)))
  }

  test("collapseRepeats: consecutive same-type collapse, state changes survive") {
    val d = attrEvents(
      (1L, 1L, "view", 1000L, 0.0), (2L, 1L, "view", 2000L, 0.0),
      (3L, 1L, "click", 3000L, 0.0), (4L, 1L, "view", 4000L, 0.0),
      (5L, 2L, "view", 1000L, 0.0)) // other user: own sequence
    val out = Behavior.collapseRepeats(d).collect().map(_.getLong(0)).sorted
    assert(out.toSeq == Seq(1L, 3L, 4L, 5L))
  }

  test("stickiness: MAU windows look back, never forward; edge days truncate") {
    val day = 86400000L
    // user 1 active day 0 only; user 2 active days 0 and 31 (outside window)
    val d = attrEvents(
      (1L, 1L, "view", 1000L, 0.0), (2L, 2L, "view", 2000L, 0.0),
      (3L, 2L, "view", 31 * day + 1000L, 0.0))
    val out = Behavior.stickiness(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // day 0: dau 2, mau 2; day 31: dau 1, mau 1 (day-0 actives aged out at 30)
    assert(out(0L) == (2L, 2L, 1000000L))
    assert(out(31L) == (1L, 1L, 1000000L))
    // dau rows exist only for active days, but day-0 users support days 1..29
    assert(!out.contains(15L)) // no dau row -> no output row (join semantics)
  }

  test("rfm: metrics and quartiles on a hand-built purchase log") {
    val day = 86400000L
    val d = attrEvents(
      (1L, 1L, "purchase", 0L, 10.0), (2L, 1L, "purchase", 5 * day, 20.0),
      (3L, 2L, "purchase", 9 * day, 100.0),
      (4L, 3L, "view", 9 * day, 5.0)) // never purchases -> absent
    val out = Behavior.rfm(d).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // percentile_disc cuts over 2 users: recency {0,4} -> t=(0,0,4);
    // frequency {1,2} -> t=(1,1,2); m_unit {30,100} -> t=(30,30,100).
    // Values AT a cut never count as exceeding it, so with n=2 the top
    // spender (100 == t3) lands in q2, the bottom in q4 — the documented
    // tie-shares-a-quartile semantics
    assert(out == Map(
      1L -> (4L, 2L, 300000L, 3L, 2L, 4L), // last day 5 vs max 9; 10+20 in e4
      2L -> (0L, 1L, 1000000L, 1L, 4L, 2L)))
  }

  test("rfm quartile populations are balanced up to tie mass on real data") {
    val out = Behavior.rfm(events).collect()
    val n = out.length
    assert(n > 0)
    for (idx <- Seq(4, 5, 6)) {
      val byQ = out.groupBy(_.getLong(idx)).view.mapValues(_.size).toMap
      assert(byQ.keySet.subsetOf(Set(1L, 2L, 3L, 4L)))
      // every quartile inhabited and the largest is within 3x the smallest
      // (tie mass only — events metrics have enough spread at sf0.001)
      assert(byQ.size == 4, s"col $idx quartiles: $byQ")
    }
  }

  test("paths: trigrams respect per-user time order and never cross users") {
    val d = attrEvents(
      (1L, 1L, "view", 1000L, 0.0), (2L, 1L, "click", 2000L, 0.0),
      (3L, 1L, "purchase", 3000L, 0.0), (4L, 1L, "view", 4000L, 0.0),
      (5L, 2L, "signup", 1000L, 0.0), (6L, 2L, "error", 2000L, 0.0))
    // user 1: v-c-p, c-p-v; user 2 has only 2 events -> no trigram
    val out = Behavior.paths(d).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)), r.getLong(3))).toMap
    assert(out == Map(
      ("view", "click", "purchase") -> 1L, ("click", "purchase", "view") -> 1L))
  }

  test("bursts: repeats inside one minute flag; across minutes don't") {
    val d = attrEvents(
      (1L, 1L, "click", 1000L, 0.0), (2L, 1L, "click", 2000L, 0.0), // same minute
      (3L, 2L, "click", 1000L, 0.0), (4L, 2L, "click", 61000L, 0.0)) // minute apart
    val out = Behavior.bursts(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 0L, "click", 2L)))
  }

  test("reach: dau counts actives, cum_reach counts each user once, ever") {
    val day = 86400000L
    // day 0: users 1,2 ; day 1: users 2,3 ; day 3: user 1 again (not new)
    val d = attrEvents(
      (1L, 1L, "view", 1000L, 0.0), (2L, 2L, "view", 2000L, 0.0),
      (3L, 2L, "view", day + 1000L, 0.0), (4L, 3L, "view", day + 2000L, 0.0),
      (5L, 1L, "view", 3 * day + 1000L, 0.0))
    val out = Behavior.reach(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out == Map(0L -> (2L, 2L, 2L), 1L -> (2L, 1L, 3L), 3L -> (1L, 0L, 3L)))
  }

  test("changepoints: a planted level shift is localized at the shift row") {
    // 15 values around 10 then 15 around 50 (jitter keeps pooled var > 0):
    // the scan statistic peaks where the right window exactly covers the new
    // level — the first post-shift row (id 16)
    val vals = (1 to 15).map(i => if (i % 2 == 0) 9.0 else 11.0) ++
      (16 to 30).map(i => if (i % 2 == 0) 49.0 else 51.0)
    val d = valueEvents(1L, vals)
    val out = Behavior.changepoints(d).collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    assert(out.nonEmpty)
    assert(out.maxBy(r => math.abs(r._2))._1 == 16L)
    // truncated edge windows never score: first/last w rows are absent
    assert(out.forall { case (id, _) => id > Behavior.ChangeW && id <= 30 - Behavior.ChangeW + 1 })
  }

  test("changepoints: jitter without a shift stays under the threshold") {
    val d = valueEvents(2L, (1 to 40).map(i => if (i % 2 == 0) 9.0 else 11.0), idBase = 500)
    assert(Behavior.changepoints(d).collect().isEmpty)
  }

  test("ewma: adjust-form weights match a local replica; order-of-arrival immaterial") {
    // user 1: daily counts (day 0 -> 3, day 1 -> 1, day 2 -> 2)
    // ewma = (3*0.25 + 1*0.5 + 2*1) / (0.25 + 0.5 + 1)
    val evs = (Seq.fill(3)(0L) ++ Seq(1L) ++ Seq.fill(2)(2L)).zipWithIndex.map {
      case (day, i) => (200L + i, 1L, day * 86400000L + i + 1, 1.0)
    }.toDF("event_id", "user_id", "__time__", "value")
    val out = Behavior.ewma(evs).collect().head
    val expect = // the operator rounds to 6 dp
      math.round((3.0 * 0.25 + 1.0 * 0.5 + 2.0 * 1.0) / (0.25 + 0.5 + 1.0) * 1e6) / 1e6
    assert(out.getLong(1) == 3L)
    assert(out.getDouble(2) == expect, s"got ${out.getDouble(2)} expected $expect")
    // shuffled arrival order must not change the day-sorted fold
    val out2 = Behavior.ewma(evs.orderBy(org.apache.spark.sql.functions.rand(7))
      .repartition(5)).collect().head
    assert(out2.getDouble(2) == out.getDouble(2))
  }

  test("anomalies: windows never cross users") {
    // user 4 priors would flag the spike, but the spike belongs to user 5
    // with no history of its own
    val d = valueEvents(4L, Seq(9.0, 11.0, 9.0, 11.0, 9.0, 11.0, 9.0, 11.0), idBase = 300)
      .union(valueEvents(5L, Seq(100.0), idBase = 400))
    assert(Behavior.anomalies(d).collect().isEmpty)
  }

  test("twap: holding-time weights, day-end carry, and same-ms zero weight") {
    val day = 86400000L
    // user 1, day 0: v=10 holds [1000, 2000), v=20 holds [2000, day end).
    // num = 10e4*1000 + 20e4*(day-2000); den = day-1000
    val e = Seq(
      (1L, 1L, 1000L, 10.0), (2L, 1L, 2000L, 20.0),
      // user 2: single event — constant value, twap == value exactly
      (3L, 2L, day / 2, 7.5),
      // user 3: two events at the SAME ms — first gets zero weight (tie
      // broken by event_id), second holds to midnight
      (4L, 3L, 5000L, 100.0), (5L, 3L, 5000L, 1.0))
      .toDF("event_id", "user_id", "__time__", "value")
    val out = Behavior.twap(e).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val num1 = 100000L * 1000L + 200000L * (day - 2000L)
    assert(out == Set(
      (1L, 0L, 2L, num1 / (day - 1000L)),
      (2L, 0L, 1L, 75000L),
      (3L, 0L, 2L, 10000L)))
  }

  test("twap: per-day isolation and partition-order independence on real events") {
    val out = Behavior.twap(events)
    assert(out.count() > 0)
    // a day's TWAP must sit inside that day's [min, max] value envelope
    val env = events.select(col("user_id"), expr("__time__ div 86400000").as("day"),
        expr("cast(round(value * 10000) as bigint)").as("v"))
      .groupBy("user_id", "day").agg(min("v").as("lo"), max("v").as("hi"))
    val bad = out.join(env, Seq("user_id", "day"))
      .filter(col("twap_e4") < col("lo") || col("twap_e4") > col("hi"))
    assert(bad.count() == 0)
    val again = Behavior.twap(events.repartition(13))
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }
}
