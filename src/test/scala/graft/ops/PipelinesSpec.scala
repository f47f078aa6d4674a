package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class PipelinesSpec extends SparkSpec {

  test("typed stats via udaf == typed stats via groupByKey facade") {
    val li = Tables.lineitem(spark, sf())
    val fast = Pipelines.typedStats(li).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    val facade = Pipelines.typedStatsGroupByKey(li).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    assert(fast == facade)
    assert(fast.nonEmpty)
  }

  test("train pipeline packs only budgeted survivors, packs laid out correctly") {
    val docs = Tables.documents(spark, sf())
    val out = Pipelines.trainPipeline(docs).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.nonEmpty)
    // per-source token mass within the budget; offsets within capacity
    out.groupBy(_._1).foreach { case (src, rs) =>
      assert(rs.map(_._3).sum <= Corpus.BudgetTokens, s"$src over budget")
      rs.foreach { case (_, _, _, _, off) =>
        assert(off >= 0 && off < Corpus.PackCapacity)
      }
      // packing is the concat-then-cut cumsum over the budgeted set
      var cum = 0L
      rs.sortBy(_._2).foreach { case (_, _, n, packId, off) =>
        assert(packId * Corpus.PackCapacity + off == cum)
        cum += n
      }
    }
    // packed docs are a subset of the clean survivor set (no dup, no
    // benchmark, no contaminated, quality-kept): cross-check via operators
    val t = docs.select(col("doc_id"), col("source"), Text.tokens(col("text")).as("toks"))
    val kept = Text.qualityFromToks(t).filter(col("verdict") === "keep")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val packedIds = out.map(_._2).toSet
    assert(packedIds.subsetOf(kept), "packed docs must all pass the quality gate")
    assert(packedIds.forall(_ >= 20), "benchmark docs must not be packed")
  }

  test("corpus pipelines scan documents once via the shared tokenized projection") {
    val docs = Tables.documents(spark, sf())
    for (q <- Seq(Pipelines.corpusPipeline(docs), Pipelines.corpusPipelineNear(docs),
        Pipelines.trainPipeline(docs))) {
      val plan = q.queryExecution.executedPlan.toString
      // every branch reads the localCheckpoint'd (doc_id, lang, toks) RDD;
      // the parquet scan happens once, inside that RDD's materialization
      assert(!plan.contains("documents.parquet"),
        "pipeline branches must feed from the shared tokenized projection")
      assert(plan.contains("Scan ExistingRDD"))
    }
  }

  test("boilerplate pipeline: clean-text discipline — raw text scanned once, " +
      "downstream reads only the checkpointed projection") {
    val docs = Tables.documents(spark, sf())
    // downstream: every branch feeds from the checkpointed clean-tokenized
    // projection, no direct parquet read
    val plan = Pipelines.corpusPipelineBoilerplate(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("documents.parquet"),
      "pipeline branches must feed from the shared clean-tokenized projection")
    assert(plan.contains("Scan ExistingRDD"))
    // the segment pass is the ONE scan of the raw text: boilerplate's df
    // aggregate and regroup both read the checkpointed segment projection,
    // whose own plan reads `text` from parquet exactly once
    val segPlan = Curation.segments(docs).queryExecution.executedPlan.toString
    val segScans = segPlan.split("\n").filter(_.contains("FileScan"))
    assert(segScans.length == 1 && segScans.head.contains("text#"),
      s"segment pass must be one raw-text scan:\n$segPlan")
    // the clean-tokenized projection: no raw-text re-read (only the pruned
    // (doc_id, lang) scan touches parquet) and ONE tokenize of the cleaned
    // text — text is normalized at most twice end-to-end (segment pass +
    // clean-text pass)
    val projPlan = Pipelines.cleanTokenizedPlan(docs).queryExecution.executedPlan.toString
    val scanLines = projPlan.split("\n").filter(_.contains("FileScan"))
    assert(scanLines.length == 1 && !scanLines.head.contains("text#"),
      s"only the pruned (doc_id, lang) read may touch parquet:\n${scanLines.mkString("\n")}")
    assert(projPlan.split("\n").count(_.contains("graft_whitespace_tokens")) == 1,
      s"cleaned text must be tokenized exactly once:\n$projPlan")
  }

  test("boilerplate pipeline semantics: chrome-only docs dropped, clean docs sampled") {
    val docs = Tables.documents(spark, sf())
    val out = Pipelines.corpusPipelineBoilerplate(docs).collect().map(_.getLong(0)).toSet
    assert(out.nonEmpty)
    // no benchmark docs survive
    assert(out.forall(_ >= 20))
    // every output doc passed the CLEANED-text quality gate
    val cleanKept = Text.qualityFromToks(Pipelines.cleanTokenized(docs))
      .filter(col("verdict") === "keep").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(out.subsetOf(cleanKept))
  }

  test("near corpus pipeline == exact pipeline minus near-dup cluster members") {
    val docs = Tables.documents(spark, sf())
    val exactOut = Pipelines.corpusPipeline(docs)
      .collect().map(_.getLong(0)).toSet
    val nearOut = Pipelines.corpusPipelineNear(docs)
      .collect().map(_.getLong(0)).toSet
    // near-dedup only ever REMOVES docs relative to the exact pipeline
    assert(nearOut.subsetOf(exactOut))
    // and what it removes is exactly the non-representative cluster members
    // that made it into the exact pipeline's output
    val kept = Text.quality(docs).filter(org.apache.spark.sql.functions.col("verdict") === "keep")
      .select("doc_id")
    // (clusters over the kept set = clusters over the exact-rep set as far as
    // reps are concerned: exact dups have identical shingles, so dropping a
    // non-rep copy never disconnects a component or changes its min)
    val keptDocs = docs.join(kept, Seq("doc_id"))
    val dropped = Dedup.connectedComponents(Dedup.lshVerifiedPairs(keptDocs))
      .filter(org.apache.spark.sql.functions.col("doc_id") =!=
        org.apache.spark.sql.functions.col("cluster_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(exactOut -- nearOut == exactOut.intersect(dropped))
  }

  test("typed stats default path is a hash aggregate, not an object agg") {
    val plan = Pipelines.typedStats(Tables.lineitem(spark, sf()))
      .queryExecution.executedPlan.toString
    // groupByKey(lambda) lowers to ObjectHashAggregate over serialized rows
    // with an AppendColumns key projection; the udaf path must not.
    assert(!plan.contains("AppendColumns"), plan)
  }
}
