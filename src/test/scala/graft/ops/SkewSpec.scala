package graft.ops

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  private lazy val orders = Tables.orders(spark, sf())
  private lazy val customer = Tables.customer(spark, sf())

  test("skew split join == plain inner join, and the plan splits hot/cold") {
    val split = Skew.skewSplitJoin(orders, customer, "o_custkey", "c_custkey", 10)
      .select(col("o_orderkey"), col("o_custkey"), col("c_name"))
    val plain = orders.join(customer, orders("o_custkey") === customer("c_custkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("c_name"))
    assert(split.count() == plain.count())
    assert(split.exceptAll(plain).isEmpty && plain.exceptAll(split).isEmpty)

    val physical = split.queryExecution.executedPlan.toString
    // hot path broadcasts, cold path stays a shuffle join — both present
    assert(physical.contains("BroadcastHashJoin"), physical.take(2000))
    assert(physical.contains("SortMergeJoin"), physical.take(2000))
  }

  test("hot and cold fact rows partition the fact table for any hotK") {
    for (k <- Seq(1, 7, 1000)) {
      val n = Skew.skewSplitJoin(orders, customer, "o_custkey", "c_custkey", k).count()
      val plain = orders.join(customer,
        orders("o_custkey") === customer("c_custkey")).count()
      assert(n == plain, s"hotK=$k")
    }
  }
}
