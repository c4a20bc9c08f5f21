package graft

/** Second-JVM committer behind TxTableSpec's cross-process race test: a
  * real separate process (own SparkSession, own in-JVM claim lock) that
  * appends `rounds` single-row batches starting at `base` to the given
  * TxTable root, then exits 0 only if every commit landed. The point is
  * what this process does NOT share with the spec's JVM: TxTable's
  * intra-process claim lock cannot serialize these two writers, so the
  * only thing keeping the log consistent is the rename-based optimistic
  * commit protocol itself — which is exactly the claim the test certifies.
  */
object TxRaceChild {
  def main(args: Array[String]): Unit = {
    val Array(root, base, rounds) = args
    val spark = Sessions.local("2")
    try {
      import spark.implicits._
      val ok = (0 until rounds.toInt).forall { i =>
        graft.ops.TxTable.append(spark, root, Seq(base.toLong + i).toDF("v"))
      }
      if (!ok) sys.exit(2)
    } finally spark.stop()
  }
}
