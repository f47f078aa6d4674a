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
}
