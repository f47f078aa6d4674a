package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * The reference declares source schemas up front (`columnTypeMap`,
  * reference: sp/input/AbstractStreamTable.java:55-92); we do the same by
  * trusting the parquet footer schema — Catalyst prunes columns and pushes
  * filters into the scan, so loading "the whole table" is free until an
  * action touches it.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    GraftSession.tune(spark)
    chaos(spark.read.parquet(s"$dir/$name.parquet"))
  }

  /** Fault-injection harness for retry-determinism evidence: with
    * `GRAFT_CHAOS_MOD=k` (env or `graft.chaos.mod` system property) every
    * table scan fails its FIRST attempt on every k-th partition, so Spark's
    * task retry re-runs those partitions — the steady-state reality of a
    * 1000-executor job, where preemption, spot reclaim, and speculative
    * execution replay tasks constantly. A query is correct at that scale
    * only if replays are invisible; running the full registry under chaos
    * against the unchanged DuckDB oracle proves exactly that (the engine
    * has no runtime RNG — `functions.Determinism` — so this must hold).
    * Requires a retry-tolerant master (`local[n,f]` with f >= 2, or a
    * cluster). Off (the default) this is an identity — the scan plan,
    * pushdown, and codegen are untouched.
    */
  private def chaos(df: DataFrame): DataFrame = {
    val raw = sys.env.get("GRAFT_CHAOS_MOD").orElse(sys.props.get("graft.chaos.mod"))
    val mod = raw.map { v =>
      scala.util.Try(v.trim.toInt).getOrElse(throw new IllegalArgumentException(
        s"GRAFT_CHAOS_MOD / graft.chaos.mod must be an integer partition modulus, got '$v'"))
    }.getOrElse(0)
    if (mod <= 0) df
    else {
      implicit val enc: org.apache.spark.sql.Encoder[org.apache.spark.sql.Row] =
        org.apache.spark.sql.Encoders.row(df.schema)
      df.mapPartitions { it =>
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null && tc.attemptNumber == 0 && tc.partitionId % mod == 0) {
          chaosInjections.incrementAndGet()
          throw new RuntimeException(
            s"graft.chaos: injected first-attempt failure (partition ${tc.partitionId})")
        }
        it
      }
    }
  }

  /** Injections fired so far in this JVM (driver-readable in local modes;
    * in cluster modes each executor counts its own — read the Spark UI's
    * failed-task count instead). Lets harnesses assert chaos actually bit.
    */
  val chaosInjections = new java.util.concurrent.atomic.AtomicLong(0L)

  /** `events` with the reference's event-time convention: `__time__` =
    * BIGINT epoch-millis (reference: sp/input/AbstractStreamTable.java:25-38
    * reserves `__time__`; window/SlideWindow.java:334-335 requires BIGINT).
    * The raw `ts` column arrives as LongType epoch-nanos (see GraftSession);
    * we also derive `ts_t` (TimestampType, ms precision) for Spark's native
    * window()/session_window() operators.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val raw = load(spark, dir, "events")
    // The generator has shipped `ts` both as TIMESTAMP(NANOS) (read as
    // LongType epoch-nanos under nanosAsLong) and as TIMESTAMP(MICROS)
    // (read as TIMESTAMP_NTZ); normalize to the engine contract — epoch-nanos
    // LongType — before deriving `__time__`. Session timeZone is UTC
    // (GraftSession), so the NTZ→TIMESTAMP cast is a micros-identity.
    val tsNanos = raw.schema("ts").dataType match {
      case LongType => col("ts")
      case _ => unix_micros(col("ts").cast(TimestampType)) * lit(1000L)
    }
    raw.withColumn("ts", tsNanos)
      // Integer division — `/` on longs promotes to double, which cannot
      // represent 1.7e18 nanos exactly (53-bit mantissa) and would corrupt ms.
      .withColumn("__time__", expr("ts div 1000000"))
      .withColumn("ts_t", timestamp_millis(col("__time__")))
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
