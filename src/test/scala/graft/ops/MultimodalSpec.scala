package graft.ops

import graft.{SparkSpec, Tables}

class MultimodalSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf())

  test("decoded stays in the Catalyst plan — no ExistingRDD hop") {
    val d = Multimodal.decoded(docs)
    val plan = d.queryExecution.executedPlan.toString
    assert(!plan.contains("ExistingRDD"),
      s"decode must not drop to an RDD scan:\n$plan")
    assert(plan.contains("MapPartitions"), s"expected typed mapPartitions:\n$plan")
  }

  test("decoded prunes the scan to doc_id + text and matches the stub formula") {
    val d = Multimodal.decoded(docs)
    val plan = d.queryExecution.executedPlan.toString
    // Only the payload's source column and the id should be read from parquet.
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"scan should prune to doc_id,text:\n$plan")
    val lens = docs.selectExpr("doc_id", "cast(octet_length(encode(text, 'UTF-8')) as long) AS len")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = d.collect()
    assert(rows.length == lens.size && rows.nonEmpty)
    rows.foreach { r =>
      val len = lens(r.getLong(0))
      assert(r.getString(1) == "fake/decoded")
      assert(r.getLong(2) == len % 640L)
      assert(r.getLong(3) == len % 480L)
      assert(r.getLong(4) == len / 64L + 1L)
    }
  }
}
