package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The data-skipping manifest's two-sided contract: pruning by the manifest
  * is SOUND (no predicate-matching row lives in a skipped shard) and
  * EFFECTIVE on either dimension (z-order's reason to exist).
  */
class SkippingSpec extends SparkSpec {

  private lazy val docs = graft.Tables.documents(spark, sf("sf0.01"))
  private val xE = "cast(substr(source, 4) as bigint)"
  private val yE = "n_chars div 8"

  private lazy val manifest =
    Corpus.skippingManifest(docs, xE, yE).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(6), r.getBoolean(7))).toMap

  /** Rebuild each row's shard id the way the manifest defines it. */
  private lazy val rowShards = {
    val lim = (1L << Corpus.ZBits) - 1
    val z = docs
      .withColumn("zx", expr(s"least($lim, greatest(0L, $xE))"))
      .withColumn("zy", expr(s"least($lim, greatest(0L, $yE))"))
      .withColumn("zv", expr(Corpus.zvalueSql("zx", "zy", "div")))
    val zmax = z.agg(max(col("zv")).as("zmax"))
    z.crossJoin(broadcast(zmax))
      .withColumn("shard_id", expr(s"zv * ${Corpus.SkipShards} div (zmax + 1)"))
  }

  test("pruning is sound: every predicate-matching row is in a must-scan shard") {
    val inX = rowShards.filter(col("zx").between(Corpus.SkipXRange._1, Corpus.SkipXRange._2))
      .select("shard_id").distinct().collect().map(_.getLong(0)).toSet
    assert(inX.forall(s => manifest(s)._1), s"x-matching rows in skipped shards: $inX")
    val inY = rowShards.filter(col("zy").between(Corpus.SkipYRange._1, Corpus.SkipYRange._2))
      .select("shard_id").distinct().collect().map(_.getLong(0)).toSet
    assert(inY.forall(s => manifest(s)._2), s"y-matching rows in skipped shards: $inY")
  }

  test("pruning is effective on BOTH dimensions (the z-order property)") {
    val scanX = manifest.values.count(_._1)
    val scanY = manifest.values.count(_._2)
    val n = manifest.size
    assert(scanX < n, s"x slice scans all $n shards — no skipping")
    assert(scanY < n, s"y slice scans all $n shards — no skipping")
  }
}
