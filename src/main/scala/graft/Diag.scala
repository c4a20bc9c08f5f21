package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Temporary round-4 diagnostic: q26 stage costs. */
object Diag {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val d = "/root/testdata/sf0.1"
    val e = Tables.t(spark, d, "embeddings")

    def time(label: String)(f: => Long): Unit =
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[diag] $label run$i ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }

    val base = e.select(col("vec_id").as("id"), col("embedding").as("v"))
    val buckets = org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expr.SignLshBuckets(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("v")), 8, 3))
    val slim = base.select(col("id"), posexplode(buckets).as(Seq("t", "b")))
      .repartition(col("t"), col("b"))
    time("bucket-explode") { slim.count() }
    val half = slim.as("a")
      .join(slim.as("b"),
        col("a.t") === col("b.t") && col("a.b") === col("b.b") && col("a.id") < col("b.id"))
      .select(col("a.id").as("x"), col("b.id").as("y"))
    time("bucket-join") { half.count() }
    time("bucket-join-distinct") { half.distinct().count() }
    time("full-q26") {
      SparkEntry.queries("q26_ann_lsh")(spark, d).count()
    }
    spark.stop()
  }
}
