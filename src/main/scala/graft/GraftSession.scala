package graft

import org.apache.spark.sql.SparkSession

/** SparkSession factory for the graft engine.
  *
  * Capability target: alibaba/table-computing's `StreamProcessing` runtime
  * (reference: src/main/java/com/alibaba/tc/sp/StreamProcessing.java:36-38 —
  * thread-per-core scheduling; README.md:135-137 — off-heap sizing). On Spark,
  * all of that is session configuration: Tungsten handles columnar/off-heap
  * memory, the shuffle service handles `Rehash`, and AQE replaces the
  * reference's "tune thread count by measured throughput" loop (README.md:141-152).
  *
  * Scale stance (100 TB / 1000 executors): nothing here is local-mode-specific
  * except the `master` default. Shuffle partition count is a starting hint —
  * AQE coalesces/splits at runtime; on a real cluster you'd raise
  * `spark.sql.shuffle.partitions` to ~2-3x total cores and let AQE shrink.
  */
object GraftSession {
  /** `spark.sql.streaming.stateStore.providerClass` value for RocksDB. */
  val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  def builder(
      master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
      shufflePartitions: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt,
      rocksDbStateStore: Boolean = false
  ): SparkSession.Builder = {
    val b = SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // Skewed group/join keys re-split at runtime; essential at 100 TB where
      // a single hot key would otherwise straggle one executor.
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      // The test data uses parquet TIMESTAMP(NANOS); Spark's TimestampType is
      // micros. Read nanos as LongType and derive epoch-millis columns — this
      // mirrors the reference's own convention of BIGINT epoch-ms event time
      // (reference: window/SlideWindow.java:334-335 enforces a BIGINT time col).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    // Large streaming state (high-cardinality keyed over-windows, stream
    // dedup) should live off the executor heap: RocksDB spills to local disk
    // and keeps the JVM heap for execution. Per-query override:
    // spark.sql.streaming.stateStore.providerClass in writeStream options.
    if (rocksDbStateStore) b.config("spark.sql.streaming.stateStore.providerClass", RocksDbProvider)
    else b
  }

  /** Data-driven shuffle-partition sizing (round-14 verdict item 5): the
    * initial partition count scales with the FIXTURE, not a hand-set env
    * knob. Rationale: in-partition sorts (overStreaming, window ops, the
    * sf100 payload-argmax fallback) go super-linear on wall once
    * rows/partition outgrows task memory — it's spill-merge, not the
    * operator (PLANS.md; 342→68 s at sf100 from 32→256 partitions). A real
    * cluster gets this from `spark.sql.shuffle.partitions` cluster defaults
    * sized to the warehouse; a single-box engine can read the input size
    * directly. One shuffle partition per ~32 MB of compressed parquet
    * (≈100-300 MB of in-memory rows), floored at the core count (small
    * fixtures keep partitions == cores — the established bench contract)
    * and capped at 4096 (beyond that, per-task overhead dominates on one
    * box). AQE coalesces the small ones at runtime, so oversizing is cheap;
    * undersizing is the spill cliff. The explicit
    * SPARK_GRAFT_SHUFFLE_PARTITIONS override remains for A/B probes.
    */
  def shufflePartitionsFor(sfDir: String, cpus: Int): Int = {
    def sizeOf(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles).map(_.map(sizeOf).sum).getOrElse(0L)
      else f.length
    val bytes = Option(new java.io.File(sfDir).listFiles)
      .map(_.filter(_.getName.endsWith(".parquet")).map(sizeOf).sum)
      .getOrElse(0L)
    math.max(cpus, math.min(4096L, bytes / (32L << 20) + 1).toInt)
  }

  /** Propagate the opt-in reliable-pin mode (env SPARK_GRAFT_PIN_RELIABLE=
    * true|auto → conf [[Pinned.ReliableKey]]) into a session builder. Also
    * enables the context cleaner's checkpoint reaping (a static conf, so it
    * must land at builder time): reliable pins write FILES, and a long
    * multi-pin run would otherwise accumulate every dead plan's checkpoint
    * data on disk.
    */
  def pinConf(b: SparkSession.Builder): SparkSession.Builder =
    sys.env.get("SPARK_GRAFT_PIN_RELIABLE").map(_.trim.toLowerCase) match {
      case Some(m @ ("true" | "auto")) =>
        val wb = b.config(Pinned.ReliableKey, m)
          .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
        sys.env.get("SPARK_GRAFT_PIN_AUTOBYTES")
          .fold(wb)(v => wb.config(Pinned.AutoBytesKey, v.trim))
      case _ => b
    }

  def local(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Apply graft runtime confs to an externally-created session (e.g. the
    * driver-owned one in Verify/Bench). Only mutable confs.
    */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark
  }
}
