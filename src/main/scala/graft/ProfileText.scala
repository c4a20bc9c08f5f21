package graft
import org.apache.spark.sql.functions._
import graft.ops._

object ProfileText {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $name ${(System.nanoTime()-t0)/1e9}%.2f s ($n)")
    }
    val docs = Tables.t(spark, d, "documents")
    val sh = docs.select(col("doc_id").as("id"), Text.shinglesOf(col("text"), 3).as("ss"))
    time("shingles-fast")(sh.select(sum(size(col("ss")))).head().getLong(0))
    val sig = sh.select(col("id"), posexplode(Text.minhashSignatureOf(col("ss"), 16)).as(Seq("band", "hv")))
    time("sig-fast")(sig.count())
    val cand = sig.as("a").join(sig.as("b"),
        col("a.band") === col("b.band") && col("a.hv") === col("b.hv") && col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
    time("cand-raw")(cand.count())
    time("cand-distinct")(cand.distinct().count())
    time("full-q17")(SparkEntry.queries("q17_minhash_lsh")(spark, d).count())
    spark.stop()
  }
}
