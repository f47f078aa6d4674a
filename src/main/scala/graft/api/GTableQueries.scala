package graft.api

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** The TC-parity lambda facade ([[GTable]]) under the DuckDB oracle gate.
  *
  * Every query here routes through the Row-lambda compat path — the surface a
  * reference user actually ports `Criteria` / `ScalarFunction` /
  * `TransformFunction` / `AggregationFunction` / `OverWindowFunction`
  * programs to (reference table/Table.java:265-624) — and reuses the oracle
  * SQL of its Column-expression twin in [[graft.batch.Relational]] verbatim.
  * A green row therefore proves lambda-path == expression-path == DuckDB as
  * a hash fact, not just a spec claim:
  *
  * | query                 | facade ops exercised                    | twin oracle      |
  * |-----------------------|-----------------------------------------|------------------|
  * | q_gtable_filter       | filter(Row=>Boolean), select(schema)    | q_filter         |
  * | q_gtable_select       | select scalar (null drops row)          | q_select_scalar  |
  * | q_gtable_flatmap      | flatSelect (TransformFunction 1→N)      | q_flatmap_explode|
  * | q_gtable_project      | projectNegative + rename                | q_project_rename |
  * | q_gtable_groupby      | groupBy whole-group lambda              | q_groupby_agg    |
  * | q_gtable_groupby_agg  | groupByAgg Aggregator bridge (scale)    | q_group_concat   |
  * | q_gtable_over         | over whole-partition lambda + addColumn | q_over_rank      |
  * | q_gtable_running      | overStreaming per-key state machine     | q_over_running   |
  * | q_gtable_join         | innerJoin + select scalar               | q_join_inner     |
  *
  * Determinism notes: lambda arithmetic replicates the twin exactly —
  * `round(x, n)` is `BigDecimal(x).setScale(n, HALF_UP)` (what Spark's
  * `Round` does for DoubleType), money/quantity sums use the twin's
  * integer-cents units, and the running sum accumulates doubles in the same
  * ascending sort order as the window operator, so prefix sums are
  * bit-identical before rounding.
  */
object GTableQueries {

  /** Spark `round(x, 2)` semantics for DoubleType (RoundBase). */
  private def r2(x: Double): Double =
    BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The twin's `cast(round(x * 100) as bigint)` integer-cents unit. */
  private def e2(x: Double): Long =
    BigDecimal(x * 100).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  /** Ascending nulls-first comparison on runtime Comparables (the facade's
    * sort contract, reference Table.java:492-499) — used for min over a
    * column whose external type (Timestamp vs Instant) tracks session conf.
    */
  private val anyAsc: Ordering[Any] = new Ordering[Any] {
    def compare(x: Any, y: Any): Int =
      if (x == null && y == null) 0
      else if (x == null) -1
      else if (y == null) 1
      else x.asInstanceOf[Comparable[Any]].compareTo(y)
  }

  private def li(s: SparkSession, d: String) = Tables.lineitem(s, d)
  private def part(s: SparkSession, d: String) = Tables.part(s, d)
  private def nat(s: SparkSession, d: String) = Tables.nation(s, d)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Criteria.filter + ScalarFunction projection (Table.java:265-331).
    "q_gtable_filter" -> ((s, d) => {
      val out = StructType(Seq(
        StructField("l_orderkey", LongType), StructField("l_linenumber", IntegerType),
        StructField("l_quantity", DoubleType), StructField("price", DoubleType)))
      GTable(li(s, d))
        .filter(r => r.getAs[String]("l_returnflag") == "R" && r.getAs[Double]("l_quantity") > 30)
        // Seq[Any] pinned: an unannotated Seq(Long, Int, Double) unifies by
        // NUMERIC WIDENING to Seq[Double] and the encoder rejects the Long field
        .select(out)(r => Seq[Any](
          r.getAs[Long]("l_orderkey"), r.getAs[Int]("l_linenumber"),
          r.getAs[Double]("l_quantity"), r2(r.getAs[Double]("l_extendedprice"))))
        .df
    }),

    // ScalarFunction: casts, string ops, arithmetic in one Row lambda.
    "q_gtable_select" -> ((s, d) => {
      val out = StructType(Seq(
        StructField("p_partkey", LongType), StructField("brand_u", StringType),
        StructField("type5", StringType), StructField("size_l", LongType),
        StructField("price_adj", DoubleType)))
      GTable(part(s, d)).select(out)(r => Seq(
        r.getAs[Long]("p_partkey"),
        r.getAs[String]("p_brand").toUpperCase,
        r.getAs[String]("p_type").take(5),
        r.getAs[Int]("p_size").toLong,
        // twin's integer-mills uplift: x*1100 = cents*11 is truly integral
        // (x*110 ties at .5 for cents ≡ 5 mod 10), /1000.0 one IEEE division
        Math.round(r.getAs[Double]("p_retailprice") * 1100).toDouble / 1000.0))
        .df
    }),

    // TransformFunction 1→N (Table.java:333-373): tokenize, keep empties
    // like Spark's split / DuckDB's string_split (limit -1).
    "q_gtable_flatmap" -> ((s, d) => {
      val out = StructType(Seq(
        StructField("p_partkey", LongType), StructField("token", StringType)))
      GTable(part(s, d)).flatSelect(out) { r =>
        val k = r.getAs[Long]("p_partkey")
        r.getAs[String]("p_name").split(" ", -1).toSeq.map(t => Seq(k, t))
      }.df
    }),

    // project / projectNegative / rename (Table.java:631-659, As maps).
    "q_gtable_project" -> ((s, d) =>
      GTable(nat(s, d)).projectNegative("n_regionkey").rename("n_name" -> "nation_name").df),

    // AggregationFunction whole-group compat path (Table.java:436-467):
    // the lambda sees (key, List<Row>) and computes every aggregate itself,
    // in the twin's exact integer units.
    "q_gtable_groupby" -> ((s, d) => {
      // project to the 6 columns the whole-group lambda reads BEFORE the
      // groupByKey shuffle: the lambda is opaque to Catalyst, so without an
      // explicit select every lineitem column crosses the exchange
      // (guide §2.3 "project before the exchange" — 25 MB -> the 6-column
      // subset). Output is unchanged; the compat path still ships whole
      // ROWS of the projected table to the lambda.
      val src = li(s, d).select(
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
        "l_discount", "l_shipdate")
      val shipType = src.schema("l_shipdate").dataType
      val out = StructType(Seq(
        StructField("sum_qty_e2", LongType), StructField("sum_base_c", LongType),
        StructField("sum_disc_e4", LongType), StructField("avg_qty_e6", LongType),
        StructField("max_qty", DoubleType), StructField("min_ship", shipType),
        StructField("cnt", LongType)))
      GTable(src).groupBy(Seq("l_returnflag", "l_linestatus"), out) { (_, rows) =>
        var sumQty = 0L; var sumBase = 0L; var sumDisc = 0L
        var maxQty = Double.MinValue; var minShip: Any = null; var n = 0L
        rows.foreach { r =>
          val q = r.getAs[Double]("l_quantity")
          val p = e2(r.getAs[Double]("l_extendedprice"))
          sumQty += e2(q); sumBase += p
          sumDisc += p * (100L - e2(r.getAs[Double]("l_discount")))
          if (q > maxQty) maxQty = q
          val ship = r.getAs[Any]("l_shipdate")
          if (minShip == null || anyAsc.compare(ship, minShip) < 0) minShip = ship
          n += 1
        }
        Seq(sumQty, sumBase, sumDisc, sumQty * 10000L / n, maxQty, minShip, n)
      }.df
    }),

    // The Aggregator bridge (scale path: constant per-group state + map-side
    // partial agg) on the group-concat twin — a genuine fold.
    "q_gtable_groupby_agg" -> ((s, d) => {
      import s.implicits._
      val out = StructType(Seq(StructField("names", StringType)))
      GTable(nat(s, d)).groupByAgg[Seq[String]](Seq("n_regionkey"), out)(
        Seq.empty[String],
        (b, r) => b :+ r.getAs[String]("n_name"),
        _ ++ _,
        b => Seq(b.sorted.mkString(","))).df
    }),

    // OverWindowFunction whole-partition compat path (Table.java:469-533).
    // The facade sorts ascending only (the reference's comparator), so the
    // DESC rank is expressed by an added negated sort column — the same
    // trick a reference user applies.
    "q_gtable_over" -> ((s, d) => {
      val out = StructType(Seq(StructField("rn", IntegerType)))
      GTable(part(s, d))
        .addColumn("neg_price", negate(col("p_retailprice")))
        .over(Seq("p_brand"), Seq("neg_price", "p_partkey"), out)(
          sorted => sorted.indices.map(i => Seq(i + 1)))
        .project("p_partkey", "p_brand", "p_retailprice", "rn")
        .df
    }),

    // overStreaming per-key state machine (the facade's bounded-state over):
    // running sum accumulates in the window operator's exact sort order.
    "q_gtable_running" -> ((s, d) => {
      val out = StructType(Seq(StructField("running_qty", DoubleType)))
      GTable(li(s, d))
        .project("l_suppkey", "l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")
        .overStreaming(Seq("l_suppkey"),
          Seq("l_shipdate", "l_orderkey", "l_linenumber", "l_quantity"), out) { () =>
          var sum = 0.0
          (r: Row) => { sum += r.getAs[Double]("l_quantity"); Seq(r2(sum)) }
        }
        .project("l_suppkey", "l_orderkey", "l_linenumber", "running_qty")
        .df
    }),

    // innerJoin on key pairs (Table.java:573-624) + ScalarFunction output.
    "q_gtable_join" -> ((s, d) => {
      val out = StructType(Seq(
        StructField("l_orderkey", LongType), StructField("l_linenumber", IntegerType),
        StructField("p_name", StringType), StructField("p_brand", StringType),
        StructField("price", DoubleType)))
      GTable(li(s, d))
        .innerJoin(GTable(part(s, d)).filter(_.getAs[Int]("p_size") > 40),
          Seq("l_partkey" -> "p_partkey"))
        .select(out)(r => Seq(
          r.getAs[Long]("l_orderkey"), r.getAs[Int]("l_linenumber"),
          r.getAs[String]("p_name"), r.getAs[String]("p_brand"),
          r2(r.getAs[Double]("l_extendedprice"))))
        .df
    }))

  /** Oracle SQL: the expression twins' entries, verbatim — lambda path and
    * expression path are held to the SAME DuckDB hash.
    */
  val oracleSql: Map[String, String] = Map(
    "q_gtable_filter" -> graft.batch.Relational.oracleSql("q_filter"),
    "q_gtable_select" -> graft.batch.Relational.oracleSql("q_select_scalar"),
    "q_gtable_flatmap" -> graft.batch.Relational.oracleSql("q_flatmap_explode"),
    "q_gtable_project" -> graft.batch.Relational.oracleSql("q_project_rename"),
    "q_gtable_groupby" -> graft.batch.Relational.oracleSql("q_groupby_agg"),
    "q_gtable_groupby_agg" -> graft.batch.Relational.oracleSql("q_group_concat"),
    "q_gtable_over" -> graft.batch.Relational.oracleSql("q_over_rank"),
    "q_gtable_running" -> graft.batch.Relational.oracleSql("q_over_running"),
    "q_gtable_join" -> graft.batch.Relational.oracleSql("q_join_inner"))
}
