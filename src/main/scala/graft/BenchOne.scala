package graft

/** Dev utility: time individual queries in one session (repeats, per-run
  * prints) — for plan/perf iteration without the full Bench sweep.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    val explain = sys.env.contains("SPARK_GRAFT_EXPLAIN")
    args.foreach { name =>
      if (explain) SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n  = SparkEntry.queries(name)(spark, sfDir).count()
        println(f"[benchone] $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
    }
    spark.stop()
  }
}
