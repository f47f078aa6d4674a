package graft.api

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, lit, sum}
import org.apache.spark.sql.types._

/** Ports the reference's operator unit tests (TableTest.java:26-233) to the
  * GTable facade: groupBy with count/string-agg (:117-127), scalar select
  * with null-filter (:129-136), over+rank (:139-171), join row counts / null
  * padding / renames (:173-233).
  */
class GTableSpec extends SparkSpec {

  private def people: GTable = {
    import spark.implicits._
    GTable(Seq(
      ("alice", "eng", 100),
      ("bob", "eng", 80),
      ("carol", "sales", 90),
      ("dave", "sales", 70),
      ("erin", "sales", 95)).toDF("name", "dept", "score"))
  }

  test("filter via row predicate (Criteria)") {
    assert(people.filter(_.getAs[Int]("score") > 85).size == 3)
  }

  test("select scalar function; returning null drops the row") {
    val out = people.select(StructType(Seq(
      StructField("name_u", StringType), StructField("score2", IntegerType)))) { r =>
      if (r.getAs[Int]("score") < 80) null
      else Seq(r.getAs[String]("name").toUpperCase, r.getAs[Int]("score") * 2)
    }
    val rows = out.df.collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(rows == Set(("ALICE", 200), ("BOB", 160), ("CAROL", 180), ("ERIN", 190)))
  }

  test("flatSelect transform function (1 -> N rows)") {
    val out = people.flatSelect(StructType(Seq(StructField("c", StringType)))) { r =>
      r.getAs[String]("name").take(2).map(ch => Seq(ch.toString))
    }
    assert(out.size == 10)
  }

  test("groupBy aggregation function: count + concat, null drops group (HAVING)") {
    val out = people.groupBy(Seq("dept"), StructType(Seq(
      StructField("n", IntegerType), StructField("names", StringType)))) { (key, rows) =>
      if (key.head == "sales" && rows.size < 2) null
      else Seq(rows.size, rows.map(_.getAs[String]("name")).sorted.mkString(","))
    }
    val got = out.df.collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(got == Set(("eng", 2, "alice,bob"), ("sales", 3, "carol,dave,erin")))
  }

  test("over window function: rank within dept by score desc") {
    val out = people.over(Seq("dept"), Seq("score"), StructType(Seq(StructField("rk", IntegerType)))) {
      rows => rows.indices.map(i => Seq(rows.length - i)) // ascending sort -> rank from top
    }
    val got = out.df.collect()
      .map(r => (r.getAs[String]("name"), r.getAs[Int]("rk"))).toMap
    assert(got("alice") == 1 && got("bob") == 2)
    assert(got("erin") == 1 && got("carol") == 2 && got("dave") == 3)
  }

  test("groupByAgg streaming variant: equals compat groupBy, HAVING works, plan shows partial agg") {
    import spark.implicits._
    val schema = StructType(Seq(StructField("n", LongType), StructField("sum", LongType)))
    val out = people.groupByAgg[(Long, Long)](Seq("dept"), schema)(
      (0L, 0L),
      (b, r) => (b._1 + 1, b._2 + r.getAs[Int]("score")),
      (a, b) => (a._1 + b._1, a._2 + b._2),
      b => if (b._1 < 2) null else Seq(b._1, b._2))
    val got = out.df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("eng", 2L, 180L), ("sales", 3L, 255L)))
    // the bridge must aggregate BEFORE the shuffle (map-side partials)
    val plan = out.df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_"), s"expected a partial/final aggregate pair:\n$plan")
  }

  test("overStreaming: equals compat over on a running rank; skewed key streams with O(1) state") {
    import spark.implicits._
    // running rank (1-based position in ascending score order) per dept
    val newCols = StructType(Seq(StructField("pos", IntegerType)))
    val stream = people.overStreaming(Seq("dept"), Seq("score"), newCols)(() => {
      var i = 0
      _ => { i += 1; Seq(i) }
    })
    val compat = people.over(Seq("dept"), Seq("score"), newCols)(
      rows => rows.indices.map(i => Seq(i + 1)))
    assert(stream.df.collect().map(r => (r.getString(0), r.getInt(3))).toSet ==
      compat.df.collect().map(r => (r.getString(0), r.getInt(3))).toSet)

    // deliberately skewed: ONE key holds 200k rows. The compat path would
    // materialize all of them in a single task Seq; the streaming variant
    // holds only the user's running state — assert it completes and the
    // running sum over the sorted order is exact.
    val skew = GTable(spark.range(200000).select(
      lit(1L).as("k"), col("id").as("t"), (col("id") % 7).as("v")))
    val summed = skew.overStreaming(Seq("k"), Seq("t"),
      StructType(Seq(StructField("run", LongType))))(() => {
      var acc = 0L
      r => { acc += r.getAs[Long]("v"); Seq(acc) }
    })
    val last = summed.df.filter(col("t") === 199999L).collect().head.getLong(3)
    val expect = spark.range(200000).select(sum(col("id") % 7)).collect().head.getLong(0)
    assert(last == expect, "running sum over the full skewed key must be exact")
  }

  test("joins: inner/left/full row counts, null padding, rename maps") {
    import spark.implicits._
    val depts = GTable(Seq(("eng", "building-1"), ("hr", "building-9")).toDF("dept", "site"))
    val inner = people.innerJoin(depts, Seq("dept" -> "dept"))
    assert(inner.size == 2)
    val left = people.leftJoin(depts, Seq("dept" -> "dept"))
    assert(left.size == 5)
    assert(left.df.filter("site IS NULL").count() == 3) // sales rows null-padded
    val full = people.outerJoin(depts, Seq("dept" -> "dept"))
    assert(full.size == 6) // 5 left + unmatched hr
    assert(full.df.filter("name IS NULL").count() == 1)
    val renamed = people.leftJoin(depts, Seq("dept" -> "dept"), rightAs = Map("site" -> "location"))
    assert(renamed.df.columns.contains("location"))
  }

  test("theta join: arbitrary non-equi condition (JoinCriteria)") {
    import spark.implicits._
    // score bands: a non-equi [lo, hi) containment join
    val bands = GTable(Seq(
      ("low", 0, 80), ("mid", 80, 95), ("high", 95, 1000)).toDF("band", "lo", "hi"))
    val p = people
    val out = p.thetaJoin(bands,
      p.df("score") >= bands.df("lo") && p.df("score") < bands.df("hi"))
    val got = out.df.collect().map(r => (r.getAs[String]("name"), r.getAs[String]("band"))).toSet
    assert(got == Set(
      ("alice", "high"), ("erin", "high"),
      ("bob", "mid"), ("carol", "mid"),
      ("dave", "low")))
    // left theta join null-pads a row no condition matches
    val none = GTable(Seq(("never", 2000, 3000)).toDF("band", "lo", "hi"))
    val left = p.thetaJoin(none,
      p.df("score") >= none.df("lo") && p.df("score") < none.df("hi"), "left")
    assert(left.size == 5)
    assert(left.df.filter("band IS NULL").count() == 5)
  }

  test("project / projectNegative / addColumn / union") {
    import org.apache.spark.sql.functions.lit
    assert(people.project("name", "score").df.columns.toSeq == Seq("name", "score"))
    assert(people.projectNegative("score").df.columns.toSeq == Seq("name", "dept"))
    assert(people.addColumn("one", lit(1)).df.columns.contains("one"))
    assert(people.union(people).size == 10)
  }
}
