package graft.ops

import graft.{SparkSpec, Tables}

class PipelinesSpec extends SparkSpec {

  test("typed stats via udaf == typed stats via groupByKey facade") {
    val li = Tables.lineitem(spark, sf())
    val fast = Pipelines.typedStats(li).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    val facade = Pipelines.typedStatsGroupByKey(li).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    assert(fast == facade)
    assert(fast.nonEmpty)
  }

  test("typed stats default path is a hash aggregate, not an object agg") {
    val plan = Pipelines.typedStats(Tables.lineitem(spark, sf()))
      .queryExecution.executedPlan.toString
    // groupByKey(lambda) lowers to ObjectHashAggregate over serialized rows
    // with an AppendColumns key projection; the udaf path must not.
    assert(!plan.contains("AppendColumns"), plan)
  }
}
