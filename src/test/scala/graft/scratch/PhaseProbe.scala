package graft.scratch

/** Scratch: per-query Catalyst phase times (analysis/optimization/planning)
  * vs end-to-end wall, warm run.
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local()
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q198_pagerank_converge", "q165_dedup_funnel", "q147_pagerank",
      "q103_zorder_cells", "q160_clustering_coeff", "q126_charlm_quality",
      "q143_containment", "q157_charngram_langid", "q67_tfidf", "q17_minhash_lsh")
    names.foreach { n =>
      graft.SparkEntry.queries(n)(spark, sfDir).count() // warm
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    System.gc(); Thread.sleep(300)
    names.foreach { n =>
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val built = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      df.count()
      val ran = (System.nanoTime() - t1) / 1e9
      val ph = df.queryExecution.tracker.phases.map { case (k, v) =>
        s"$k=${v.durationMs}ms"
      }.mkString(" ")
      println(f"[phase] $n build=$built%.3f run=$ran%.3f  $ph")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
