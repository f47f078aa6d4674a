package graft

/** Throwaway: print executed plans for named queries. Usage: graft.PlanDump q1 q2 ... */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    args.foreach { n =>
      val df = SparkEntry.queries(n)(spark, d)
      df.collect()
      println(s"===== $n =====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
