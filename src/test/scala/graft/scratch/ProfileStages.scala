package graft.scratch

import org.apache.spark.scheduler._

/** Scratch profiler: per-stage wall + task count on the warm run. */
object ProfileStages {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local()
    val name  = args.head
    val rows  = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, Int, String)]()
    @volatile var enabled = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = if (enabled) {
        val i = e.stageInfo
        val wall = (for {s <- i.submissionTime; c <- i.completionTime} yield (c - s) / 1e3).getOrElse(-1.0)
        rows.add((i.stageId, wall, i.numTasks, i.name.takeWhile(_ != '\n').take(60)))
      }
    })
    graft.SparkEntry.queries(name)(spark, sfDir).count() // warm
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    Thread.sleep(500)
    enabled = true
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(name)(spark, sfDir).count()
    val total = (System.nanoTime() - t0) / 1e9
    enabled = false
    import scala.jdk.CollectionConverters._
    val rs = rows.asScala.toSeq.sortBy(_._1)
    println(f"[stages] $name total $total%.2f s, ${rs.size} stages, stage-wall sum ${rs.map(_._2).sum}%.2f")
    rs.foreach { case (id, w, n, nm) => println(f"[stages]   $id%4d ${w}%7.3f s $n%4d tasks  $nm") }
    spark.stop()
  }
}
