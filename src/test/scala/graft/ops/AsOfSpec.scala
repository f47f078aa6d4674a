package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {

  test("asof join picks the latest right row at-or-before each left time") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, "a"), // before any right row -> null
      (1L, 200L, "b"), // exactly at right t=200 -> ties match right
      (1L, 350L, "c"), // between 300 and 400 -> 300
      (2L, 500L, "d"), // key with no right rows at all -> null
      (1L, 999L, "e")  // after everything -> 400
    ).toDF("k", "t", "payload")
    val right = Seq(
      (1L, 200L, 2.0),
      (1L, 300L, 3.0),
      (1L, 400L, 4.0),
      (3L, 100L, 9.0)  // key never referenced by left
    ).toDF("k", "rt", "rv")

    val out = AsOf.asofJoin(left, right, Seq("k"), "t", "rt", Seq("rv"))
    val got = out.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Long]))).toSet
    assert(got == Set(
      (1L, 100L, "a", None, None),
      (1L, 200L, "b", Some(2.0), Some(200L)),
      (1L, 350L, "c", Some(3.0), Some(300L)),
      (2L, 500L, "d", None, None),
      (1L, 999L, "e", Some(4.0), Some(400L))))
    assert(out.count() == left.count(), "LEFT semantics: every left row survives")
  }

  test("asofJoinWithin: stale matches null out exactly at the tolerance edge") {
    import spark.implicits._
    val left = Seq((1L, 1000L, "x"), (1L, 2001L, "y")).toDF("k", "t", "payload")
    val right = Seq((1L, 900L, 9.0)).toDF("k", "rt", "rv")
    // tolerance 1100: t=1000 is 100ms stale (fresh); t=2001 is 1101ms (stale)
    val out = AsOf.asofJoinWithin(left, right, Seq("k"), "t", "rt", Seq("rv"), 1100L)
      .collect().map(r => r.getString(2) ->
        (Option(r.get(3)).map(_.asInstanceOf[Double]), Option(r.get(4)))).toMap
    assert(out("x") == (Some(9.0), Some(900L)))
    assert(out("y") == (None, None))
  }

  test("asof join plan is one keyed shuffle, never a range/nested-loop join") {
    val events = graft.Tables.events(spark, sf())
    val q = AsOf.clicksWithLastError(events)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"asof must not expand a range join:\n$plan")
    assert(plan.contains("Window"), "asof rides the window operator")
  }

  test("nearestJoin: closer forward beats stale backward; ties prefer backward; tolerance cuts") {
    import spark.implicits._
    val left = Seq(
      (1L, 1L, 100L), // back at 90 (d10) vs fwd at 105 (d5) -> fwd
      (2L, 1L, 200L), // back at 195 (d5) vs fwd at 205 (d5) -> tie, backward
      (3L, 1L, 400L), // only a right at 700 (d300) > tol -> null
      (4L, 2L, 50L),  // equal-time right -> d0 backward
      (5L, 3L, 10L)   // key with no rights at all -> null
    ).toDF("id", "k", "t")
    val right = Seq(
      (1L, 90L, 9.0), (1L, 105L, 5.0), (1L, 195L, 19.5), (1L, 205L, 20.5),
      (1L, 700L, 70.0), (2L, 50L, 1.0))
      .toDF("k", "rt", "rv")
    val out = AsOf.nearestJoin(left, right, Seq("k"), "t", "rt", Seq("rv"), toleranceMs = 100L)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(3)).map(_.asInstanceOf[Double]), Option(r.get(4)))).toMap
    assert(out(1L) == (Some(5.0), Some(105L)))
    assert(out(2L) == (Some(19.5), Some(195L)))
    assert(out(3L) == (None, None))
    assert(out(4L) == (Some(1.0), Some(50L)))
    assert(out(5L) == (None, None))
  }

  test("nullable right value columns: one right row is elected atomically, never stitched") {
    import spark.implicits._
    // The elected right row (t=300) has a NULL value column; an earlier row
    // (t=200) has a value. A per-column carry would stitch rv=2.0 from t=200
    // with rt=300 — a row that never existed. Atomic election must surface
    // the t=300 row as-is: rv NULL, rt 300.
    val left = Seq((1L, 350L, "x")).toDF("k", "t", "payload")
    val right = Seq(
      (1L, 200L, Some(2.0)),
      (1L, 300L, None: Option[Double])
    ).toDF("k", "rt", "rv")

    val asof = AsOf.asofJoin(left, right, Seq("k"), "t", "rt", Seq("rv")).collect().head
    assert(asof.isNullAt(asof.fieldIndex("rv_r")), "asof: elected row's null value must stay null")
    assert(asof.getLong(asof.fieldIndex("rt_r")) == 300L, "asof: rt comes from the SAME elected row")

    val near = AsOf.nearestJoin(left, right, Seq("k"), "t", "rt", Seq("rv"), 1000L).collect().head
    assert(near.isNullAt(near.fieldIndex("rv_r")), "nearest: elected row's null value must stay null")
    assert(near.getLong(near.fieldIndex("rt_r")) == 300L, "nearest: rt comes from the SAME elected row")
  }

  test("nearestJoin is join-free: one keyed window, both frames on one sort") {
    import spark.implicits._
    val left = Seq((1L, 1L, 100L)).toDF("id", "k", "t")
    val right = Seq((1L, 90L, 9.0)).toDF("k", "rt", "rv")
    val q = AsOf.nearestJoin(left, right, Seq("k"), "t", "rt", Seq("rv"), 100L)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"nearest must ride the union+window, not a join:\n$plan")
    assert(plan.contains("Window"))
  }
}
