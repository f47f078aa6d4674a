package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {

  private def log = {
    import spark.implicits._
    Seq(
      // (user, event, type, value, t)
      (1L, 10L, "upsert", 1.0, 100L),
      (1L, 11L, "upsert", 2.0, 200L),
      (1L, 12L, "upsert", 3.0, 300L), // user 1 latest: value 3.0
      (2L, 20L, "upsert", 5.0, 100L),
      (2L, 21L, "delete", 0.0, 200L), // user 2 deleted last -> absent
      (3L, 30L, "delete", 0.0, 100L),
      (3L, 31L, "upsert", 7.0, 200L), // delete superseded -> present
      (4L, 40L, "upsert", 8.0, 100L),
      (4L, 41L, "upsert", 9.0, 100L) // same ts: event_id 41 wins
    ).toDF("user_id", "event_id", "event_type", "value", "__time__")
  }

  test("latestSnapshot: last writer wins, tombstones delete, ties break on event_id") {
    val snap = Cdc.latestSnapshot(log, Seq("user_id"), Seq("__time__", "event_id"),
      isDelete = Some(col("event_type") === "delete"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(snap.keySet == Set(1L, 3L, 4L))
    assert(snap(1L) == ((12L, 3.0)))
    assert(snap(3L) == ((31L, 7.0)))
    assert(snap(4L) == ((41L, 9.0)))
  }

  test("latestSnapshot partially aggregates before the shuffle, and plans no window") {
    val plan = Cdc.latestSnapshot(log, Seq("user_id"), Seq("__time__", "event_id"))
      .queryExecution.executedPlan.toString
    // one row per key leaves each map task BEFORE the exchange
    val partialAt = plan.indexOf("partial_max_by")
    val exchangeAt = plan.indexOf("Exchange")
    assert(partialAt >= 0 && exchangeAt >= 0 && partialAt > exchangeAt,
      s"partial_max_by must sit below the exchange:\n${plan.take(1500)}")
    assert(!plan.contains("Window"), plan.take(1500))
  }

  test("scd2: versions chain, ends meet starts, exactly one current per key") {
    val v = Cdc.scd2(log, Seq("user_id"), "__time__", "event_id")
      .select("user_id", "event_id", "effective_from", "effective_to", "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))
    assert(v.count(x => x._5) == 4) // one open version per user
    val u1 = v.filter(_._1 == 1L).sortBy(_._3)
    assert(u1.map(_._2).toSeq == Seq(10L, 11L, 12L))
    assert(u1(0)._4 == u1(1)._3 && u1(1)._4 == u1(2)._3) // intervals tile
    assert(u1(2)._4 == -1L && u1(2)._5)
    // same-ts versions order by the tie-break: 40 closed by 41's start
    val u4 = v.filter(_._1 == 4L).sortBy(_._2)
    assert(u4(0)._4 == 100L && !u4(0)._5 && u4(1)._4 == -1L && u4(1)._5)
  }

  test("tableDiff: added/removed/changed classified, unchanged dropped") {
    val s = spark
    import s.implicits._
    val a = Seq((1L, "same"), (2L, "old"), (3L, "gone")).toDF("doc_id", "text")
    val b = Seq((1L, "same"), (2L, "new"), (4L, "born")).toDF("doc_id", "text")
    val out = Cdc.tableDiff(a, b, "doc_id", Seq("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("tableDiff: join legs carry digests, not payloads") {
    val a = graft.Tables.documents(spark, sf()).select("doc_id", "text")
    val plan = Cdc.tableDiff(a, a, "doc_id", Seq("text"))
      .queryExecution.optimizedPlan.toString
    // payload column is consumed by md5 BELOW the join: the join output
    // references fp_a/fp_b only
    assert(plan.contains("md5"))
    val joinLine = plan.linesIterator.find(_.contains("Join")).getOrElse("")
    assert(!joinLine.contains("text"), s"payload crossed the join: $joinLine")
  }

  test("mergeRollup: merge of partials == full recompute for ANY split") {
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.events(spark, sf("sf0.01"))
    val full = Cdc.rollup(ev).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // three different split predicates, including an empty delta
    val splits = Seq(
      expr("__time__ div 86400000") <= Cdc.RollupSplitDay,
      col("user_id") % 3 === 0,
      lit(true))
    splits.foreach { p =>
      val merged = Cdc.mergeRollup(Cdc.rollup(ev.filter(p)), Cdc.rollup(ev.filter(!p)))
        .collect()
        .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
      assert(merged == full, s"split $p broke the merge")
    }
  }
}
