package graft.streaming

import graft.SparkSpec
import graft.sources.Sources

class AsOfStreamSpec extends SparkSpec {
  import AsOfStream._

  test("streaming asof matches latest right at-or-before, across micro-batches") {
    import spark.implicits._
    val lsrc = Sources.memoryStream[L](spark)
    val rsrc = Sources.memoryStream[R](spark)
    val q = AsOfStream.join(lsrc.toDS(), rsrc.toDS())
      .writeStream.format("memory").queryName("asof1").outputMode("append").start()
    try {
      // batch 1: a right at 1000; lefts straddling it (intra-batch disorder)
      rsrc.addData(Seq(R(1, 1000, 10.0)))
      lsrc.addData(Seq(L(1, 1500, 1.5), L(1, 500, 0.5)))
      q.processAllAvailable()
      // batch 2: right at 3000 and left at 2000 arrive TOGETHER — the left
      // must see only rights at-or-before 2000, not the batchmate at 3000
      rsrc.addData(Seq(R(1, 3000, 30.0)))
      lsrc.addData(Seq(L(1, 2000, 2.0), L(2, 2000, 9.0)))
      q.processAllAvailable()
      // batch 3: watermark is far past 3000 now, but the floor right must
      // survive eviction; tie at 4000 matches the equal-time right
      rsrc.addData(Seq(R(1, 4000, 40.0)))
      lsrc.addData(Seq(L(1, 4000, 4.0), L(1, 9000, 9.0)))
      q.processAllAvailable()

      val got = spark.table("asof1").as[Out].collect()
        .map(o => (o.key, o.time) -> (o.rTime, o.rValue)).toMap
      assert(got((1L, 500L)) == ((None, None)))
      assert(got((1L, 1500L)) == ((Some(1000L), Some(10.0))))
      assert(got((1L, 2000L)) == ((Some(1000L), Some(10.0))))
      assert(got((2L, 2000L)) == ((None, None)))
      assert(got((1L, 4000L)) == ((Some(4000L), Some(40.0))))
      assert(got((1L, 9000L)) == ((Some(4000L), Some(40.0))))
      assert(got.size == 6)

      // cross-check: identical to the batch asof operator on the same rows
      val leftDf = Seq(L(1, 1500, 1.5), L(1, 500, 0.5), L(1, 2000, 2.0),
        L(2, 2000, 9.0), L(1, 4000, 4.0), L(1, 9000, 9.0))
        .toDF("key", "t", "value")
      val rightDf = Seq(R(1, 1000, 10.0), R(1, 3000, 30.0), R(1, 4000, 40.0))
        .toDF("key", "rt", "rvalue")
      val batch = graft.ops.AsOf.asofJoin(leftDf, rightDf, Seq("key"), "t", "rt", Seq("rvalue"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((Option(r.get(4)).map(_.asInstanceOf[Long]),
            Option(r.get(3)).map(_.asInstanceOf[Double])))).toMap
      assert(batch == got)
    } finally q.stop()
  }

  test("streaming asof runs on the RocksDB state store") {
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      graft.GraftSession.RocksDbProvider)
    try {
      val lsrc = Sources.memoryStream[L](spark)
      val rsrc = Sources.memoryStream[R](spark)
      val q = AsOfStream.join(lsrc.toDS(), rsrc.toDS())
        .writeStream.format("memory").queryName("asofrocks")
        .outputMode("append").start()
      try {
        rsrc.addData(Seq(R(1, 1000, 10.0)))
        lsrc.addData(Seq(L(1, 1500, 1.5)))
        q.processAllAvailable()
        lsrc.addData(Seq(L(1, 2500, 2.5)))
        q.processAllAvailable()
        val got = spark.table("asofrocks").as[Out].collect()
          .map(o => o.time -> o.rTime).toMap
        assert(got == Map(1500L -> Some(1000L), 2500L -> Some(1000L)))
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
