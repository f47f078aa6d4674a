package graft

/** PlanDump's plan-only escape under reliable-pin mode (round-16 verdict
  * item 6): reliable pins are always eager file writes, so a diagnostic
  * plan dump inheriting `graft.pin.reliable=true` would checkpoint every
  * pinned subplan to disk just to print text. dump() must force the
  * default (localCheckpoint) mode for its duration and restore the
  * inherited conf afterwards.
  */
class PlanDumpSpec extends SparkSpec {

  test("dump under reliable mode writes no checkpoint files and restores the conf") {
    val dir = java.nio.file.Files.createTempDirectory("plandump-ckpt")
    spark.sparkContext.setCheckpointDir(dir.toString)
    spark.conf.set(Pinned.ReliableKey, "true")
    try {
      // q_split_safe is a pin-bearing production query (leakageSafeSplit
      // pins its component table for the iterative assignment)
      val silent = new java.io.PrintStream(java.io.OutputStream.nullOutputStream())
      Console.withOut(silent) {
        PlanDump.dump(spark, Seq("q_split_safe"), sf())
      }
      assert(spark.conf.get(Pinned.ReliableKey) === "true",
        "dump must restore the inherited conf")
      def allFiles(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles).toSeq.flatten.flatMap(allFiles)
        else Seq(f)
      val resolved = new java.io.File(new java.net.URI(
        spark.sparkContext.getCheckpointDir.get).getPath)
      assert(!allFiles(resolved).exists(_.getName.startsWith("part-")),
        "a plan dump must not checkpoint pinned subplans to disk")
    } finally spark.conf.unset(Pinned.ReliableKey)
  }
}
