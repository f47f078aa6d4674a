package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line per run, consumed by the driver into
  * BENCH_r{N}.json and graded against BASELINE.md.
  *
  * Per query: an untimed warm-up (JIT, codegen cache, parquet footer cache,
  * broadcast build) then N>=3 timed passes, reporting the MEDIAN plus the
  * min/max spread. A single-sample timer cannot distinguish GC/AQE variance
  * from a regression — round 4 recorded a false 3x "regression" that a re-run
  * showed was one noisy sample. The reference's own numbers are steady-state
  * throughput claims (README.md:7-8), so steady-state medians are the honest
  * comparison — cold JVM startup is a constant ~6 s that would otherwise land
  * entirely on whichever query happens to run first.
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

    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt.max(1)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)

    // Between queries, release executor storage held by localCheckpoint():
    // the iterative operators (k-means, connected components, the shared
    // tokenized scan in the pipelines) each leave checkpoint RDD blocks in
    // storage memory that are reclaimed only when the driver GC collects the
    // RDD reference. Across 75 warm-ups + 225 timed runs that accumulation
    // evicted the working set and inflated the heavy queries ~2.6-2.9x versus
    // isolation (round-6 verdict). Unpersisting directly is deterministic.
    def sweep(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      spark.sharedState.cacheManager.clearCache()
    }

    // warm-up pass (untimed)
    ordered.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
      sweep()
    }
    // A failed query must be LOUD: it reports {"err": ...} instead of a
    // timing, never a number that shrinks the total, and fails the process
    // exit code so a regression can't bench as an improvement.
    val results: Seq[(String, Either[String, Seq[Double]])] = ordered.map { case (name, fn) =>
      try {
        val times = (1 to passes).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }
        name -> Right(times.sorted)
      } catch {
        case e: Throwable =>
          name -> Left(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}")
      } finally sweep() // a FAILED query must not leak its blocks into the next timings
    }
    def median(sorted: Seq[Double]): Double = {
      val n = sorted.length
      if (n % 2 == 1) sorted(n / 2) else (sorted(n / 2 - 1) + sorted(n / 2)) / 2
    }
    val qs = results.map {
      case (k, Right(sorted)) =>
        "\"" + k + "\":{\"median\":" + median(sorted) +
          ",\"min\":" + sorted.head + ",\"max\":" + sorted.last + "}"
      case (k, Left(err)) =>
        "\"" + k + "\":{\"err\":\"" + err.replaceAll("[\"\\\\\\p{Cntrl}]", " ") + "\"}"
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, Left(_)) => k }
    val total = results.collect { case (_, Right(sorted)) => median(sorted) }.sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","passes":$passes,"queries":$qs,"failed":$failedJson,"sf":"$sfDir"}"""
    println(line)
    // The driver scrapes a bounded stdout tail, which truncated the big line
    // mid-JSON in rounds 5 and 6. Print a second SHORT summary line AFTER it
    // so any bounded tail always ends with a parseable headline, and persist
    // the full line to a file as the durable copy.
    println(s"""{"metric":"total","value":$total,"unit":"sec","passes":$passes,"nqueries":${results.size},"failed":$failedJson,"sf":"$sfDir"}""")
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
