package graft

import org.apache.spark.sql.functions._
import graft.Pinned.PinnedOps

/** The pin primitive's two durability modes (round-15 verdict item 1).
  *
  * Contract under test: `pinned` must (a) cut lineage in BOTH modes — the
  * iterative operators depend on it, (b) return the same rows in both
  * modes, and (c) in reliable mode produce on-disk checkpoint FILES (the
  * artifact that survives executor loss, unlike localCheckpoint blocks),
  * while leaving no lingering persist (the around-checkpoint cache is an
  * internal optimization, not a leak).
  */
class PinnedSpec extends SparkSpec {

  private def withReliable[A](body: => A): A = {
    spark.conf.set(Pinned.ReliableKey, "true")
    try body finally spark.conf.unset(Pinned.ReliableKey)
  }

  private def base = spark.range(0, 1000).select(
    col("id"), (col("id") % 7).as("k"), (col("id") * 3).as("v"))

  test("default mode pins cut lineage and preserve rows") {
    val p = base.pinned(false)
    // lineage cut: the pinned plan is a leaf scan of materialized blocks,
    // not the original Range
    assert(p.queryExecution.optimizedPlan.collectLeaves().forall(
      _.getClass.getSimpleName.contains("LogicalRDD")))
    assert(p.count() === 1000)
    assert(p.agg(sum("v")).head.getLong(0) === base.agg(sum("v")).head.getLong(0))
  }

  test("reliable mode writes checkpoint files, same rows, no lingering persist") {
    withReliable {
      val before = spark.sparkContext.getPersistentRDDs.size
      val p = base.pinned(false) // reliable mode is always eager by contract
      val dir = spark.sparkContext.getCheckpointDir
      assert(dir.nonEmpty, "reliable pin must establish a checkpoint dir")
      val files = new java.io.File(new java.net.URI(dir.get).getPath match {
        case "" => dir.get; case path => path
      })
      def allFiles(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles).toSeq.flatten.flatMap(allFiles) else Seq(f)
      assert(allFiles(files).exists(_.getName.startsWith("part-")),
        s"expected checkpoint part files under $files")
      assert(p.queryExecution.optimizedPlan.collectLeaves().forall(
        _.getClass.getSimpleName.contains("LogicalRDD")))
      assert(p.count() === 1000)
      assert(p.agg(sum("v")).head.getLong(0) === base.agg(sum("v")).head.getLong(0))
      // unpersist(blocking = false) releases asynchronously — poll briefly
      // instead of asserting the instant after. <= not ==: the shared
      // session's ContextCleaner may concurrently reap an EARLIER suite's
      // (or test's) GC'd localCheckpoint RDD, dropping the count below the
      // snapshot — still "our persist is gone", which is the contract.
      val released = (1 to 50).exists { _ =>
        if (spark.sparkContext.getPersistentRDDs.size <= before) true
        else { Thread.sleep(100); false }
      }
      assert(released, "the around-checkpoint persist must be released")
    }
  }

  test("reliable mode supports the iterative fold shape") {
    withReliable {
      // the k-means / BPE / CC idiom: re-pin a shrinking state each round
      val out = (1 to 3).foldLeft(base) { (df, _) =>
        df.filter(col("id") % 2 === 0).select(
          (col("id") / 2).cast("long").as("id"), col("k"), col("v")).pinned(false)
      }
      assert(out.count() === 125)
    }
  }

  test("reliable mode refuses the tmpdir fallback on a distributed master") {
    // round-16 advice: per-node /tmp is not a shared filesystem, so a
    // cluster session with no checkpoint dir must fail fast, not silently
    // checkpoint to files other nodes cannot read
    val e = intercept[IllegalArgumentException] {
      Pinned.resolveCheckpointDir(
        "spark://head:7077", isLocal = false, "app-123", confDir = None)
    }
    assert(e.getMessage.contains("visible to every executor"))
    assert(e.getMessage.contains(Pinned.DirKey))
    // graft.pin.dir satisfies the same master without the refusal
    assert(Pinned.resolveCheckpointDir(
      "spark://head:7077", isLocal = false, "app-123",
      confDir = Some("hdfs:///pins")) === "hdfs:///pins")
    // single-box masters keep the tmpdir convenience
    assert(Pinned.resolveCheckpointDir(
      "local-cluster[2,2,1024]", isLocal = false, "app-123", None)
      .contains("graft-pins-app-123"))
    assert(Pinned.resolveCheckpointDir("local[4]", isLocal = true, "app-123", None)
      .contains("graft-pins-app-123"))
  }

  test("reliable pin leaves a pre-existing cache of the same plan in place") {
    withReliable {
      val d = base
      d.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        d.count()
        val p = d.pinned(false)
        assert(p.count() === 1000)
        // CacheManager matches by logical plan: an unconditional
        // persist/unpersist inside pin() would evict this entry (r16 advice)
        assert(d.storageLevel !== org.apache.spark.storage.StorageLevel.NONE,
          "pin must not evict the caller's cache")
      } finally d.unpersist(blocking = true)
    }
  }

  private def withAuto[A](autoBytes: Long)(body: => A): A = {
    spark.conf.set(Pinned.ReliableKey, "auto")
    spark.conf.set(Pinned.AutoBytesKey, autoBytes.toString)
    try body finally {
      spark.conf.unset(Pinned.ReliableKey)
      spark.conf.unset(Pinned.AutoBytesKey)
    }
  }

  test("auto mode below the byte bound takes the localCheckpoint path") {
    withAuto(Long.MaxValue) {
      val before = spark.sparkContext.getPersistentRDDs.size
      val p = base.pinned(true)
      // localCheckpoint's signature: the pinned RDD itself is registered as
      // a persistent RDD (its blocks ARE the pin); the reliable path leaves
      // no persistent entry behind
      assert(spark.sparkContext.getPersistentRDDs.size > before,
        "below the bound, auto must localCheckpoint (persistent RDD blocks)")
      assert(p.count() === 1000)
      p.unpersist(blocking = true)
    }
  }

  test("auto mode at the byte bound takes the reliable file path") {
    withAuto(1L) {
      val before = spark.sparkContext.getPersistentRDDs.size
      val p = base.pinned(true)
      // <=, not ==: the contract is "this pin leaves NO NEW persistent
      // entry"; a concurrent ContextCleaner reap of an EARLIER suite's
      // GC'd localCheckpoint RDD can drop the count BELOW the snapshot
      // (the same race the released-persist test hit in round 17)
      assert(spark.sparkContext.getPersistentRDDs.size <= before,
        "above the bound, auto must file-checkpoint (no lingering persist)")
      val dir = spark.sparkContext.getCheckpointDir
      assert(dir.nonEmpty, "auto-reliable pin must establish a checkpoint dir")
      assert(p.queryExecution.optimizedPlan.collectLeaves().forall(
        _.getClass.getSimpleName.contains("LogicalRDD")))
      assert(p.count() === 1000)
    }
  }

  test("both modes agree on a grouped aggregate") {
    val d = base.pinned(false).groupBy("k").agg(sum("v").as("sv"))
      .orderBy("k").collect().map(_.toSeq)
    val r = withReliable {
      base.pinned(false).groupBy("k").agg(sum("v").as("sv"))
        .orderBy("k").collect().map(_.toSeq)
    }
    assert(d.toSeq === r.toSeq)
  }
}
