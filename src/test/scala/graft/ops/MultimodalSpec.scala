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
  test("embedAssign: every doc lands in one cell; centroid docs self-assign") {
    val docs = graft.Tables.documents(spark, sf())
    val out = Multimodal.embedAssign(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == docs.count())
    assert(out.map(_._1).distinct.length == out.length)
    assert(out.forall(r => r._2 >= 0 && r._2 < Multimodal.EmbedCells))
    // a centroid's nearest centroid is itself (cos 1 with itself)
    out.filter(_._1 < Multimodal.EmbedCells).foreach { case (id, cell, ccos) =>
      assert(cell == id && math.abs(ccos - 1.0) < 1e-6, s"doc $id -> cell $cell ($ccos)")
    }
  }
}
