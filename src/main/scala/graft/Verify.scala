package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_MASTER=local-cluster[2,16,8192] runs the registry across
    // SEPARATE executor JVMs (real closure serialization, broadcast over a
    // real transport, task retry) — the round-14 multi-JVM evidence mode.
    // Executors are fresh JVMs without this process's -cp, so the engine
    // classes ship via executor extraClassPath (same box by definition).
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val builder = SparkSession.builder()
      .master(master)
      // fixture-sized, not a knob (GraftSession.shufflePartitionsFor):
      // small fixtures stay = cpus; scale fixtures get enough partitions
      // that in-partition sorts don't hit the spill-merge cliff.
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS",
          GraftSession.shufflePartitionsFor(sfDir, cpus.toInt).toString))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (master.startsWith("local-cluster"))
      builder.config("spark.executor.extraClassPath",
        new java.io.File("target/scala-2.13/classes").getAbsolutePath)
    // local-cluster GOTCHA: the [n,cores,mem] worker size only CAPS
    // resources — executor JVMs still launch with the spark.executor.memory
    // DEFAULT (1g), which OOMs sf100-scale stages while sf0.01 sails
    // through. SPARK_GRAFT_EXECUTOR_MEM sets the real executor heap.
    sys.env.get("SPARK_GRAFT_EXECUTOR_MEM")
      .foreach(m => builder.config("spark.executor.memory", m))
    // SPARK_GRAFT_PIN_RELIABLE=true switches every operator pin from
    // localCheckpoint to a reliable file checkpoint (graft.Pinned) — the
    // mode where executor loss costs a re-read, not the job.
    GraftSession.pinConf(builder)
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_LOG_DAG=1: DAGScheduler at INFO while the root stays WARN —
    // the chaos/fetchfail evidence logs need the "Resubmitting ..." stage-
    // recompute lines, which Spark only emits at INFO.
    if (sys.env.get("SPARK_GRAFT_LOG_DAG").contains("1"))
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.scheduler.DAGScheduler", org.apache.logging.log4j.Level.INFO)
    new java.io.File(outDir).mkdirs()
    // Optional subset (comma-separated names) for local spot checks; the
    // driver leaves it unset and gets the full registry. oracle_sql.json is
    // subset to match so a partial outDir never reads as missing output.
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // SPARK_GRAFT_VERIFY_SKIP names the queries EXCLUDED at this scale (the
    // sf1+ sweeps: quadratic diagnostic oracles, guard-by-design queries —
    // see FIXTURES.md); oracle_sql.json is filtered to match.
    val skip = sys.env.get("SPARK_GRAFT_VERIFY_SKIP")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    val selected = (only match {
      case Some(names) => SparkEntry.queries.filter(q => names(q._1))
      case None        => SparkEntry.queries
    }).filter(q => !skip(q._1))
    // SPARK_GRAFT_VERIFY_RETRIES=n re-runs a FAILED query up to n times
    // (default 0 = unchanged). Exists for the executor-kill chaos pass:
    // losing an executor strands that query's localCheckpoint blocks
    // (localCheckpoint trades fault tolerance for speed BY CONTRACT —
    // Spark recomputes lost shuffle output but not lost local checkpoints),
    // so the in-flight query can fail terminally. The production answer is
    // a bounded JOB-level retry — what any orchestrator does on executor
    // loss — and determinism says the retry must hash-match the oracle.
    // SPARK_GRAFT_PIN_RELIABLE=true removes the failure class entirely
    // (pins become files; see graft.Pinned), making this knob chaos-only.
    val retries = sys.env.get("SPARK_GRAFT_VERIFY_RETRIES").map { v =>
      try v.trim.toInt catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"SPARK_GRAFT_VERIFY_RETRIES must be an integer, got '$v'")
      }
    }.getOrElse(0)
    selected.foreach { case (name, fn) =>
      var attempt = 0
      var done = false
      while (!done) {
        try {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          done = true
        } catch {
          // NonFatal only: an OutOfMemoryError / linkage error means the
          // session itself is suspect — re-running queries against it
          // would produce garbage evidence, so let it crash the run.
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"[verify] $name failed (attempt ${attempt + 1}): ${e.getMessage}")
            attempt += 1
            if (attempt > retries) done = true
        }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter(kv => only.forall(_(kv._1)) && !skip(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
