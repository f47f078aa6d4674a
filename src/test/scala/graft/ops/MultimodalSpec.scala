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
  test("real decode: a known 3x2 PNG and a BMP round-trip exact dims and channel sums") {
    // id=16: 16%7=2 -> w=3, 16%5=1 -> h=2, even -> PNG
    val png = Multimodal.synthImageBytes(16L)
    assert(png.take(4).map(_ & 0xff).sameElements(Seq(0x89, 0x50, 0x4e, 0x47)),
      "synth even-id payload must be genuine PNG bytes")
    val d = Multimodal.decodeImagePartition(
      Iterator(Multimodal.MediaPayload(16L, png))).next()
    assert(d.kind == "image/png" && d.width == 3L && d.height == 2L)
    def sum(off: Int) =
      (for (y <- 0 until 2; x <- 0 until 3) yield Multimodal.pixelChannel(16L, x, y, off)).sum.toLong
    assert(d.r_sum == sum(0) && d.g_sum == sum(97) && d.b_sum == sum(193),
      s"decoded sums ${(d.r_sum, d.g_sum, d.b_sum)} != formula ${(sum(0), sum(97), sum(193))}")

    val bmp = Multimodal.synthImageBytes(3L) // odd -> BMP, w=4, h=4
    assert(bmp(0) == 'B'.toByte && bmp(1) == 'M'.toByte)
    val b = Multimodal.decodeImagePartition(
      Iterator(Multimodal.MediaPayload(3L, bmp))).next()
    def bsum(off: Int) =
      (for (y <- 0 until 4; x <- 0 until 4) yield Multimodal.pixelChannel(3L, x, y, off)).sum.toLong
    assert(b.kind == "image/bmp" && b.width == 4L && b.height == 4L &&
      b.r_sum == bsum(0) && b.g_sum == bsum(97) && b.b_sum == bsum(193))

    // non-image bytes route to the unknown-codec fallback; null to unreadable
    val txt = "not an image".getBytes("UTF-8")
    val f = Multimodal.decodeImagePartition(
      Iterator(Multimodal.MediaPayload(7L, txt), Multimodal.MediaPayload(8L, null))).toSeq
    assert(f(0).kind == "fake/decoded" && f(0).width == txt.length % 640 && f(0).r_sum == -1L)
    assert(f(1).kind == "fake/unreadable")
  }

  test("decodedReal: ImageIO decode stays plan-native and matches the analytic oracle formula") {
    val d = Multimodal.decodedReal(docs)
    val plan = d.queryExecution.executedPlan.toString
    assert(!plan.contains("ExistingRDD"), s"decode must not drop to an RDD scan:\n$plan")
    assert(plan.contains("MapPartitions"), s"expected typed mapPartitions:\n$plan")
    val rows = d.collect()
    assert(rows.nonEmpty && rows.length == docs.count())
    rows.foreach { r =>
      val id = r.getLong(0)
      if (id % 10 == 9) assert(r.getString(1) == "fake/decoded" && r.getLong(4) == -1L)
      else {
        assert(r.getString(1) == (if (id % 2 == 0) "image/png" else "image/bmp"))
        assert(r.getLong(2) == Multimodal.synthWidth(id).toLong, s"width mismatch doc $id")
        assert(r.getLong(3) == Multimodal.synthHeight(id).toLong, s"height mismatch doc $id")
        val exp = (for (y <- 0 until Multimodal.synthHeight(id);
                        x <- 0 until Multimodal.synthWidth(id))
          yield Multimodal.pixelChannel(id, x, y, 0)).sum.toLong
        assert(r.getLong(4) == exp, s"r_sum mismatch doc $id")
      }
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

  test("phash: PNG and BMP encodings of the same pixels collapse to one group") {
    // doc 70 (png branch) and doc 71 (bmp branch) differ; instead re-encode
    // the SAME pixels both ways and hash via the partition fn directly
    val id = 70L // even -> synthImageBytes emits png
    val png = Multimodal.synthImageBytes(id)
    // re-encode the same decoded pixels as BMP
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    val hashes = Multimodal.phashImagePartition(Iterator(
      Multimodal.MediaPayload(1L, png),
      Multimodal.MediaPayload(2L, bos.toByteArray))).toSeq
    assert(hashes.length == 2)
    assert(hashes(0).phash == hashes(1).phash, "codec must not change the perceptual hash")
    assert(hashes.head.phash.length == 64 && hashes.head.phash.forall(c => c == '0' || c == '1'))
  }

  test("phash groups: non-images skipped, representatives are group minima") {
    val docs = graft.Tables.documents(spark, sf())
    val nImages = docs.filter(org.apache.spark.sql.functions.expr("doc_id % 10 <> 9")).count()
    val groups = Multimodal.phashGroups(docs).collect()
    assert(groups.map(_.getLong(1)).sum == nImages, "every image lands in exactly one group")
    assert(groups.exists(_.getLong(1) > 1), "synthetic gradients must produce real collisions")
    assert(groups.forall(_.getLong(2) % 10 != 9), "no fallback doc may represent a group")
  }
}
