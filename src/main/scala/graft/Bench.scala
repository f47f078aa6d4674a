package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line per run, consumed by the driver into
  * BENCH_r{N}.json and graded against BASELINE.md.
  *
  * Two passes per query: an untimed warm-up (JIT, codegen cache, parquet
  * footer cache, broadcast build) then the timed run. The reference's own
  * numbers are steady-state throughput claims (README.md:7-8), so steady-state
  * is the honest comparison — cold JVM startup is a constant ~6 s that would
  * otherwise land entirely on whichever query happens to run first.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.tune(spark)

    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    // warm-up pass (untimed)
    ordered.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    // A failed query must be LOUD: it reports {"err": ...} instead of a
    // timing, never a number that shrinks the total, and fails the process
    // exit code so a regression can't bench as an improvement.
    val results: Seq[(String, Either[String, Double])] = ordered.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        name -> Right((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          name -> Left(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}")
      }
    }
    val qs = results.map {
      case (k, Right(sec)) => "\"" + k + "\":" + sec
      case (k, Left(err)) =>
        "\"" + k + "\":{\"err\":\"" + err.replaceAll("[\"\\\\\n\r\t]", " ") + "\"}"
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, Left(_)) => k }
    val total = results.collect { case (_, Right(sec)) => sec }.sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
