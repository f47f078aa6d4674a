package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExpressionsSpec extends SparkSpec {

  import org.apache.spark.sql.Row

  test("DotProduct matches a plain Scala fold, both via Column and SQL name") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.5, -1.5), Array(2.0, 2.0))).toDF("a", "b")
    val viaColumn = df.select(GraftFunctions.dot(col("a"), col("b"))).as[Double].collect()
    val viaSql = df.select(expr("graft_dot(a, b)")).as[Double].collect()
    assert(viaColumn.toSeq == Seq(32.0, -2.0))
    assert(viaSql.toSeq == Seq(32.0, -2.0))
  }

  test("DotProduct folds sequentially (ascending index)") {
    import spark.implicits._
    // Values chosen so a different summation order changes the IEEE result.
    val a = Array(1e16, 1.0, -1e16)
    val expected = ((0.0 + 1e16 * 1.0) + 1.0 * 1.0) + (-1e16 * 1.0)
    val got = Seq((a, Array(1.0, 1.0, 1.0))).toDF("a", "b")
      .select(GraftFunctions.dot(col("a"), col("b"))).as[Double].head()
    assert(got == expected)
  }

  test("SortedIntersectCount merge walk") {
    import spark.implicits._
    val df = Seq(
      (Array(1L, 3L, 5L, 7L), Array(3L, 4L, 5L, 8L)), // {3,5}
      (Array(1L, 2L), Array(3L, 4L)), // {}
      (Array[Long](), Array(1L, 2L)), // {}
      (Array(9L), Array(9L))).toDF("a", "b")
    val got = df.select(GraftFunctions.sortedIntersectCount(col("a"), col("b"))).as[Long].collect()
    assert(got.toSeq == Seq(2L, 0L, 0L, 1L))
  }

  test("SimHash60 equals the definitional bit-vote") {
    import spark.implicits._
    def reference(hs: Seq[Long]): Long =
      (0 until 60).map { i =>
        val vote = hs.map(h => ((h >> i) & 1L) * 2 - 1).sum
        if (vote > 0) 1L << i else 0L
      }.sum
    val rows = Seq(
      Seq(0x0F0F0F0F0FL, 0x1111111111L, 0x0FFFFFFFFFL),
      Seq(123456789L),
      Seq.empty[Long])
    val got = rows.toDF("hs").select(GraftFunctions.simhash60(col("hs"))).as[Long].collect()
    assert(got.toSeq == rows.map(reference))
  }

  test("ShingleHashes equals the SQL spelling on real documents (all variants)") {
    val shinglesSql =
      "array_distinct(transform(sequence(1, size(toks) - 2), " +
        "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1), ' ', element_at(toks, i + 2))))"
    val hashSql = "cast(conv(substr(md5(s), 1, 15), 16, 10) as bigint)"
    val p = graft.ops.Dedup.MersennePrime
    val toks = graft.Tables.documents(spark, sf())
      .select(col("doc_id"), graft.ops.Text.tokens(col("text")).as("toks"))
    val both = toks.filter(size(col("toks")) >= 3).select(
      col("doc_id"),
      expr(s"transform($shinglesSql, s -> $hashSql)").as("sql_plain"),
      GraftFunctions.shingleHashes(col("toks")).as("nat_plain"),
      expr(s"transform($shinglesSql, s -> $hashSql % ${p}L)").as("sql_mod"),
      GraftFunctions.shingleHashes(col("toks"), mod = p).as("nat_mod"),
      expr(s"array_sort(transform($shinglesSql, s -> $hashSql))").as("sql_sorted"),
      GraftFunctions.shingleHashes(col("toks"), sorted = true).as("nat_sorted"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"plain @doc ${r.getLong(0)}")
      assert(r.getSeq[Long](3) == r.getSeq[Long](4), s"mod @doc ${r.getLong(0)}")
      assert(r.getSeq[Long](5) == r.getSeq[Long](6), s"sorted @doc ${r.getLong(0)}")
    }
    // the SQL form is UNDEFINED below 3 tokens (sequence(1, n-2) runs
    // backwards into element_at(toks, 0)); the native form returns empty —
    // call sites pre-filter or coalesce, both are safe with either shape
    import spark.implicits._
    val short = Seq(Seq("a", "b"), Seq("a"), Seq.empty[String]).toDF("toks")
      .select(GraftFunctions.shingleHashes(col("toks"))).as[Seq[Long]].collect()
    assert(short.forall(_.isEmpty))
    // n = 1: distinct-token hashes (the SimHash input spelling)
    val oneGram = toks.select(
      expr(s"transform(array_distinct(toks), t -> ${hashSql.replace("(s)", "(t)")})").as("sql1"),
      GraftFunctions.shingleHashes(col("toks"), n = 1).as("nat1")).collect()
    oneGram.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1), "n=1"))
    // bigram LM instance pairs: native struct array == the SQL spelling
    val big = toks.filter(size(col("toks")) >= 2).select(
      expr(s"""transform(sequence(1, size(toks) - 1), i -> struct(
        ${hashSql.replace("(s)", "(element_at(toks, i))")} as u,
        ${hashSql.replace("md5(s)", "md5(concat(element_at(toks, i), ' ', element_at(toks, i + 1)))")} as bg))""")
        .as("sqlp"),
      GraftFunctions.bigramPairHashes(col("toks")).as("natp")).collect()
    assert(big.nonEmpty)
    big.foreach { r =>
      val s = r.getSeq[Row](0).map(x => (x.getLong(0), x.getLong(1)))
      val m = r.getSeq[Row](1).map(x => (x.getLong(0), x.getLong(1)))
      assert(s == m, "bigram pairs")
    }
    // MinHashes inputMod folds the % p pre-reduction: equal to the two-step
    val mh = toks.filter(size(col("toks")) >= 3).select(
      GraftFunctions.minhashes(
        expr(s"transform(transform($shinglesSql, s -> $hashSql), h -> h % ${p}L)"),
        graft.ops.Dedup.permCoeffs, p).as("two_step"),
      GraftFunctions.minhashes(
        GraftFunctions.shingleHashes(col("toks")),
        graft.ops.Dedup.permCoeffs, p, inputMod = p).as("fused"))
      .collect()
    mh.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("SortedSetHits counts probes found in the set (duplicates counted)") {
    import spark.implicits._
    val set = Array(2L, 5L, 9L, 100L)
    val rows = Seq(
      Array(1L, 2L, 5L, 7L, 100L, 100L), // 2, 5, 100, 100 hit -> 4
      Array(3L, 4L),                     // 0
      Array[Long](),                     // 0
      Array(9L))                         // 1
    def reference(a: Array[Long]): Long = a.count(set.contains).toLong
    val got = rows.toDF("a")
      .select(GraftFunctions.sortedSetHits(col("a"), set)).as[Long].collect()
    assert(got.toSeq == rows.map(reference))
    // interpreted path agrees with codegen
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val interp = rows.toDF("a")
        .select(GraftFunctions.sortedSetHits(col("a"), set)).as[Long].collect()
      assert(interp.toSeq == rows.map(reference))
    }
  }

  test("expressions survive interpreted mode (codegen disabled)") {
    import spark.implicits._
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val got = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
        .select(GraftFunctions.dot(col("a"), col("b"))).as[Double].head()
      assert(got == 11.0)
    }
  }

  private def withSQLConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
