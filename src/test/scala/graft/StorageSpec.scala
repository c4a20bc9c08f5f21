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

  test("hilbertValue matches the reference walk and never jumps") {
    // reference xy2d (quadrant-rotation form, reflection in the full grid)
    def xy2d(bits: Int, x0: Long, y0: Long): Long = {
      val n1 = (1L << bits) - 1
      var (x, y, d) = (x0, y0, 0L)
      for (i <- (bits - 1) to 0 by -1) {
        val s = 1L << i
        val (rx, ry) = (if ((x & s) > 0) 1L else 0L, if ((y & s) > 0) 1L else 0L)
        d += s * s * ((3 * rx) ^ ry)
        if (ry == 0) {
          val (fx, fy) = if (rx == 1) (n1 - x, n1 - y) else (x, y)
          x = fy; y = fx
        }
      }
      d
    }
    val bits = 4
    val cells = for (x <- 0 until 16; y <- 0 until 16) yield (x, y)
    val got = cells.toDF("x", "y")
      .select(col("x"), col("y"),
        Storage.hilbertValue(col("x"), col("y"), bits).as("h"))
      .as[(Int, Int, Long)].collect()
    for ((x, y, h) <- got) assert(h == xy2d(bits, x, y), s"($x,$y)")
    // the curve property Morton lacks: consecutive indices are always
    // grid-adjacent (Manhattan distance exactly 1), and the 256 indices
    // are a permutation of [0, 256)
    val byH = got.map { case (x, y, h) => h -> (x, y) }.toMap
    assert(byH.keySet == (0L until 256L).toSet)
    for (h <- 0L until 255L) {
      val ((x1, y1), (x2, y2)) = (byH(h), byH(h + 1))
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1, s"jump at $h")
    }
    // NULL bin -> NULL index
    val nulls = Seq((Some(1), Option.empty[Int])).toDF("x", "y")
      .select(Storage.hilbertValue(col("x"), col("y"), bits).as("h"))
      .collect()
    assert(nulls.head.isNullAt(0))
  }

  test("zOrderWrite bounds per-file spans on BOTH columns; a plain sort does not") {
    val sf  = "/root/testdata/sf0.001"
    val li  = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_extendedprice", "l_quantity")
    val tmp = java.nio.file.Files.createTempDirectory("zorder").toString

    // per-file average span of `c`, as a fraction of the global span
    def avgSpanFrac(dir: String, c: String): Double = {
      val global = li.agg((max(col(c)) - min(col(c))).as("s")).head().getDouble(0)
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getPath)
      assert(files.length > 1, s"expected multiple files in $dir")
      val spans = files.map { f =>
        spark.read.parquet(f).agg((max(col(c)) - min(col(c))).as("s")).head().getDouble(0)
      }
      spans.sum / spans.length / global
    }

    Storage.zOrderWrite(li, Seq("l_extendedprice", "l_quantity"), bits = 4,
      s"$tmp/z", nFiles = 8)
    li.repartitionByRange(8, col("l_extendedprice"))
      .sortWithinPartitions(col("l_extendedprice"))
      .write.mode("overwrite").parquet(s"$tmp/x")

    // the x-sorted layout prunes x but leaves y files spanning ~everything;
    // z-order bounds both. Thresholds leave wide margins over the measured
    // values so layout jitter can't flake the test.
    assert(avgSpanFrac(s"$tmp/z", "l_extendedprice") < 0.65)
    assert(avgSpanFrac(s"$tmp/z", "l_quantity") < 0.65)
    assert(avgSpanFrac(s"$tmp/x", "l_quantity") > 0.8, "x-sort should NOT bound y")

    // the Hilbert layout gives the same both-column bound (same cells,
    // jump-free visit order)
    Storage.hilbertOrderWrite(li, "l_extendedprice", "l_quantity", bits = 4,
      s"$tmp/h", nFiles = 8)
    assert(avgSpanFrac(s"$tmp/h", "l_extendedprice") < 0.65)
    assert(avgSpanFrac(s"$tmp/h", "l_quantity") < 0.65)
  }

  test("prunedRead opens a strict file subset on a z-ordered layout, same rows") {
    val base = java.nio.file.Files.createTempDirectory("prune").toString
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    Storage.zOrderWrite(li, Seq("l_extendedprice", "l_quantity"), 4, s"$base/z", 16)
    val stats = Storage.fileStats(spark, s"$base/z", Seq("l_extendedprice", "l_quantity"))
    val (rows, kept, total) = Storage.prunedRead(spark, s"$base/z", stats,
      "l_extendedprice", 1000.0, 3000.0)
    assert(total == 16)
    assert(kept < total, s"a selective range must prune files ($kept of $total)")
    val expected = li.filter(col("l_extendedprice").between(1000.0, 3000.0)).count()
    assert(rows.count() == expected, "pruning must never drop qualifying rows")
    // degenerate range below the domain: nothing survives, schema intact
    val (none, k0, _) = Storage.prunedRead(spark, s"$base/z", stats,
      "l_extendedprice", -10.0, -1.0)
    assert(k0 == 0 && none.count() == 0 && none.schema == rows.schema)
  }

  test("refreshIfChanged rebuilds only when the source stamp moves, and a failed build leaves no marker") {
    val base = java.nio.file.Files.createTempDirectory("refresh").toString
    spark.range(100).select(col("id"), (col("id") % 7).as("v"))
      .write.parquet(s"$base/src")
    def stamp(params: String) = Storage.sourceStamp(spark, Seq(s"$base/src"), params)
    var builds = 0
    def build(): Boolean = Storage.refreshIfChanged(spark, s"$base/derived", stamp("p1")) {
      builds += 1
      spark.read.parquet(s"$base/src").write.mode("overwrite").parquet(s"$base/derived")
    }
    assert(build() && builds == 1, "first call must build")
    assert(!build() && builds == 1, "unchanged source must not rebuild")
    assert(stamp("p1") != stamp("p2"), "params participate in the stamp")
    // source mutation (new file) moves the stamp -> rebuild
    spark.range(5).select(col("id"), col("id").as("v"))
      .write.mode("append").parquet(s"$base/src")
    assert(build() && builds == 2, "changed source must rebuild")
    assert(!build() && builds == 2)
    // a surviving marker whose artifacts were deleted must NOT skip: the
    // guard self-heals instead of failing every read until the source moves
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$base/derived"))
    assert(build() && builds == 3, "missing artifacts must force a rebuild despite a valid marker")
    assert(!build() && builds == 3)
    // a build that throws must leave NO marker: the next call rebuilds
    intercept[RuntimeException] {
      Storage.refreshIfChanged(spark, s"$base/broken", stamp("p1")) {
        throw new RuntimeException("mid-write crash")
      }
    }
    var recovered = false
    Storage.refreshIfChanged(spark, s"$base/broken", stamp("p1")) { recovered = true }
    assert(recovered, "an interrupted refresh must not be recorded as done")
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
