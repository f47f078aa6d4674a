package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SaveMode

/** Dirty-input robustness: every documents-family query must EXECUTE (no
  * exception) on a corpus containing a null-text and an empty-text row —
  * the rows a real crawl always contains. Semantics for such rows are
  * per-operator (most drop them: null tokenization nulls out, size(null)
  * is null, filters reject); this spec pins the absence of crashes, not
  * the per-row outcomes.
  */
class RobustnessSpec extends SparkSpec {

  private lazy val dirtyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-dirty").toString
    for (t <- Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings")) {
      val df = spark.read.parquet(s"${sf()}/$t.parquet")
      val out =
        if (t != "documents") df
        else {
          val extra = spark.createDataFrame(
            spark.sparkContext.parallelize(Seq(
              org.apache.spark.sql.Row(900001L, null, "en", "src0", 0L),
              org.apache.spark.sql.Row(900002L, "", "en", "src1", 0L),
              org.apache.spark.sql.Row(900003L, "   ", "en", "src2", 3L))),
            df.schema)
          df.unionByName(extra)
        }
      out.write.mode(SaveMode.Overwrite).parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("every documents-family query executes on null/empty/blank text rows") {
    val families = Seq("q_text_", "q_dedup_", "q_quality_", "q_mix_", "q_vocab",
      "q_pipeline_", "q_bpe_", "q_media_", "q_domain_", "q_contamination",
      "q_decontam",
      "q_sample_", "q_token_budget", "q_pack_", "q_shuffle_", "q_layout_",
      "q_source_overlap", "q_train_classifier", "q_split_")
    val targets = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => families.exists(n.startsWith))
    assert(targets.size >= 60, s"family filter too narrow: ${targets.size}")
    val failures = targets.flatMap { name =>
      try { SparkEntry.queries(name)(spark, dirtyDir).count(); None }
      catch { case e: Throwable => Some(name -> e.toString.linesIterator.next()) }
    }
    assert(failures.isEmpty,
      failures.map { case (n, e) => s"$n: $e" }.mkString("\n"))
  }

  test("session additions execute on EMPTY inputs (zero-row tables)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-empty").toString
    for (t <- Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings")) {
      spark.read.parquet(s"${sf()}/$t.parquet").limit(0)
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/$t.parquet")
    }
    val targets = Seq("q_min_cost_supplier", "q_top_unshipped", "q_order_priority",
      "q_promo_share", "q_small_qty_revenue", "q_big_orders", "q_blame_supplier",
      "q_dedup_prefix", "q_graph_triangles", "q_knn_recall", "q_embed_int8",
      "q_ewma", "q_profile", "q_yoy", "q_join_typos", "q_rollup_incr",
      "q_media_phash", "q_audience_overlap",
      "q_join_overlap", "q_twap", "q_k_anonymity", "q_split_safe",
      "q_profile_diff", "q_join_nearest", "q_decontam_gate")
    val failures = targets.flatMap { name =>
      try { SparkEntry.queries(name)(spark, dir).count(); None }
      catch { case e: Throwable => Some(name -> e.toString.linesIterator.next()) }
    }
    assert(failures.isEmpty,
      failures.map { case (n, e) => s"$n: $e" }.mkString("\n"))
    // the profiler must still DESCRIBE the empty table, not vanish
    assert(SparkEntry.queries("q_profile")(spark, dir).count() == 5L)
  }
}
