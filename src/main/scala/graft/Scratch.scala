package graft

import org.apache.spark.sql.functions._
import graft.ops._

// Temporary profiling harness — not part of the library surface.
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = Sessions.local()
    import graft.Tables.t
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 2).foreach { pass =>
      val li = t(spark, d, "lineitem")
      time(s"p$pass cuts-both") {
        Summaries.quantileBins(li,
          Seq(("l_extendedprice", 16, "bx"), ("l_quantity", 16, "by"))).count()
      }
      System.gc(); Thread.sleep(300)
      time(s"p$pass cuts-price-only") {
        Summaries.quantileBins(li, Seq(("l_extendedprice", 16, "bx"))).count()
      }
      System.gc(); Thread.sleep(300)
      time(s"p$pass full-q103") {
        SparkEntry.queries("q103_zorder_cells")(spark, d).count()
      }
      System.gc(); Thread.sleep(300)
    }
    spark.stop()
  }
}
