package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Storage

class StorageSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  test("bucketed tables sort-merge-join with no exchange on either side") {
    val sf = "/root/testdata/sf0.001"
    Storage.writeBucketed(
      spark.read.parquet(s"$sf/customer.parquet"), "cust_b", Seq("c_custkey"), 4)
    Storage.writeBucketed(
      spark.read.parquet(s"$sf/orders.parquet")
        .withColumnRenamed("o_custkey", "c_custkey"), "ord_b", Seq("c_custkey"), 4)
    val joined = Storage.coLocatedJoin(spark, "cust_b", "ord_b", Seq("c_custkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
    // and it actually computes the join
    val n = joined.count()
    val expected = spark.read.parquet(s"$sf/orders.parquet")
      .join(spark.read.parquet(s"$sf/customer.parquet"),
        col("o_custkey") === col("c_custkey")).count()
    assert(n == expected)
  }

  test("compactTo rewrites many small files into the computed target count") {
    val base = java.nio.file.Files.createTempDirectory("compact").toString
    spark.range(100000).select(col("id"), (col("id") % 97).as("v"))
      .repartition(64).write.parquet(s"$base/in")
    val (before, after) = Storage.compactTo(spark, s"$base/in", s"$base/out",
      targetBytes = 256L << 10)
    assert(before == 64)
    assert(after < before && after >= 1)
    val a = spark.read.parquet(s"$base/in").agg(sum("v"), count(lit(1))).first()
    val b = spark.read.parquet(s"$base/out").agg(sum("v"), count(lit(1))).first()
    assert(a == b)
  }
}
