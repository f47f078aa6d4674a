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

  test("rollup emits per-group, per-prefix, and grand-total rows") {
    val out = Relational.queries("q_rollup")(spark, sf()).collect()
    assert(out.exists(r => r.getString(0) == "ALL" && r.getString(1) == "ALL"))
    assert(out.exists(r => r.getString(0) != "ALL" && r.getString(1) == "ALL"))
    assert(out.exists(r => r.getString(0) != "ALL" && r.getString(1) != "ALL"))
  }
}
