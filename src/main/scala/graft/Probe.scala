package graft

/** Dev utility: run one named query repeatedly under the REAL engine
  * session ([[Sessions.local]] — the bench's exact config) and print
  * per-run wall + executor-cpu so warm-up, codegen-cache, and
  * steady-state effects separate per query without paying a suite sweep.
  *
  * Usage: `runMain graft.Probe <queryName> [sfDir] [runs]`
  */
object Probe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Probe <queryName> [sfDir] [runs]")
    val name  = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs  = if (args.length > 2) args(2).toInt else 4
    val spark = Sessions.local()
    val fn = SparkEntry.queries(name)
    for (i <- 1 to runs) {
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val tPlan = System.nanoTime()
      df.queryExecution.executedPlan
      val tPhys = System.nanoTime()
      val n = df.count()
      val t1 = System.nanoTime()
      println(f"[probe] $name run $i: build=${(tPlan - t0) / 1e9}%.3f " +
        f"plan=${(tPhys - tPlan) / 1e9}%.3f exec=${(t1 - tPhys) / 1e9}%.3f " +
        f"total=${(t1 - t0) / 1e9}%.3f s rows=$n")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
