package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  test("range join matches containment semantics incl. boundaries and multi-bucket intervals") {
    import spark.implicits._
    val left = Seq(
      (1L, 1L, 100L),  // inside [100, 200)
      (2L, 1L, 199L),  // last ms of the interval
      (3L, 1L, 200L),  // end is EXCLUSIVE -> no match from [100,200)
      (4L, 1L, 50L),   // before any interval
      (5L, 2L, 150L),  // other key, long interval spanning many buckets
      (6L, 1L, 1000L)  // inside a second interval of key 1
    ).toDF("id", "k", "t")
    val right = Seq(
      (1L, 100L, 200L, "a"),
      (1L, 900L, 1100L, "b"),
      (2L, 0L, 10000L, "c") // spans 100 buckets at bucketMs=100
    ).toDF("k", "s", "e", "tag")

    val out = RangeJoin.rangeJoin(left, right, "t", "s", "e", bucketMs = 100L, keys = Seq("k"))
      .select(col("id"), col("tag")).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "a"), (2L, "a"), (5L, "c"), (6L, "b")))
  }

  test("negative timestamps bucket by floor division; malformed intervals don't explode") {
    import spark.implicits._
    val left = Seq(
      (1L, 1L, -5L),   // inside [-10, -1): truncating `div` puts -5 in bucket 0
      (2L, 1L, -10L),  // boundary start
      (3L, 1L, -1L),   // end is exclusive -> no match
      (4L, 1L, 5L)     // inside [0, 10)
    ).toDF("id", "k", "t")
    val right = Seq(
      (1L, -10L, -1L, "neg"),
      (1L, 0L, 10L, "pos"),
      (1L, 500L, -1000000L, "bad") // corrupt: end < start — must not fan out
    ).toDF("k", "s", "e", "tag")
    val joined = RangeJoin.rangeJoin(left, right, "t", "s", "e", bucketMs = 10L, keys = Seq("k"))
    val out = joined.select(col("id"), col("tag")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "neg"), (2L, "neg"), (4L, "pos")))
    // the malformed interval is dropped BEFORE the explode: total exploded
    // rows stay tiny (a descending sequence would have fanned out ~100k rows)
    val exploded = right.filter(col("e") > col("s"))
      .withColumn("bk", explode(sequence(expr("s div 10"), expr("(e - 1) div 10"))))
    assert(exploded.count() <= 3)
  }

  test("overlapping intervals each match; plan is an equi-join, not nested-loop") {
    import spark.implicits._
    val left = Seq((1L, 1L, 150L)).toDF("id", "k", "t")
    val right = Seq((1L, 100L, 200L, "x"), (1L, 0L, 500L, "y")).toDF("k", "s", "e", "tag")
    val j = RangeJoin.rangeJoin(left, right, "t", "s", "e", 100L, Seq("k"))
    assert(j.select("tag").collect().map(_.getString(0)).toSet == Set("x", "y"))
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must stay an equi-join:\n$plan")
  }

  test("overlap join == brute-force theta join; multi-cell pairs emit exactly once") {
    import spark.implicits._
    // intervals deliberately span 1..12 cells at bucket=100 so the ownership
    // rule (emit from the cell holding max(starts)) is exercised hard
    val left = Seq(
      (1L, 0L, 1200L),    // 12 cells
      (2L, 150L, 250L),   // crosses one boundary
      (3L, 500L, 501L),   // 1 ms
      (4L, -350L, -50L),  // negative coords
      (5L, 999L, 1000L)
    ).toDF("lid", "ls", "le")
    val right = Seq(
      (10L, 100L, 1100L), // overlaps 1,2,3,5
      (11L, 240L, 260L),  // overlaps 1,2
      (12L, -100L, 10L),  // overlaps 1 (at [0,10)) and 4
      (13L, 1200L, 1300L) // touches 1 at 1200 — half-open, NO match
    ).toDF("rid", "rs", "re")
    val got = RangeJoin.overlapJoin(left, right, "ls", "le", "rs", "re", bucketMs = 100L)
      .select("lid", "rid").as[(Long, Long)].collect()
    val brute = left.join(right, col("ls") < col("re") && col("rs") < col("le"))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got.length == got.toSet.size, "a pair emitted more than once")
    assert(got.toSet == brute)
    assert(brute.contains((1L, 10L)) && brute.contains((4L, 12L)) &&
      !brute.exists(_._2 == 13L)) // fixture sanity: multi-cell, negative, touch
  }

  test("overlap join respects extra equi-keys and stays an equi-join plan") {
    import spark.implicits._
    val left = Seq((1L, "a", 0L, 300L), (2L, "b", 0L, 300L)).toDF("lid", "k", "ls", "le")
    val right = Seq(("a", 100L, 200L, 20L), ("b", 250L, 400L, 21L)).toDF("k", "rs", "re", "rid")
    val j = RangeJoin.overlapJoin(left, right, "ls", "le", "rs", "re", 100L, keys = Seq("k"))
    assert(j.select("lid", "rid").as[(Long, Long)].collect().toSet ==
      Set((1L, 20L), (2L, 21L)))
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"overlap join must stay an equi-join:\n$plan")
  }

  test("sessionTypeOverlaps: every overlap width positive and bounded by both intervals") {
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val out = RangeJoin.sessionTypeOverlaps(events)
    assert(out.count() > 0)
    assert(out.filter(col("overlap_ms") <= 0).count() == 0)
    // a span lives inside one UTC day, so no overlap can exceed 24h
    assert(out.filter(col("overlap_ms") > 86400000L).count() == 0)
  }
}
