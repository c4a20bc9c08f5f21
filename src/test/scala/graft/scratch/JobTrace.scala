package graft.scratch

import graft._

/** Dev probe: per-job wall/task-count trace for one query — shows where a
  * latency-shaped query's sequential actions go.
  * Usage: Test/runMain graft.scratch.JobTrace <query> [runs]
  */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val runs = if (args.length > 1) args(1).toInt else 3
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = Sessions.local()
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, Int, String)]()
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val cs = String.valueOf(e.properties.getProperty("callSite.short"))
        jobs.put(e.jobId, (System.nanoTime(), e.stageInfos.map(_.numTasks).sum, cs))
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val st = jobs.get(e.jobId)
        if (st != null) done.add((e.jobId, (System.nanoTime() - st._1) / 1e9, st._2, st._3))
      }
    })
    for (i <- 1 to runs) {
      done.clear()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(s, d)
      val tBuild = System.nanoTime()
      df.count()
      val t1 = System.nanoTime()
      org.apache.spark.sql.graftbridge.ListenerBridge.flush(s.sparkContext)
      import scala.jdk.CollectionConverters._
      val js = done.asScala.toSeq.sortBy(_._1)
      println(f"[trace] $name run$i build=${(tBuild - t0) / 1e9}%.2f exec=${(t1 - tBuild) / 1e9}%.2f njobs=${js.size}")
      js.foreach { case (id, w, nt, cs) => println(f"[trace]   job $id%3d wall=$w%.3f tasks=$nt%-4d $cs") }
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    s.stop()
  }
}
