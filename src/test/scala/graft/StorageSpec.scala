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

  test("hilbertValueN: bijective unit-step walk in 2-D, 3-D and 4-D; NULL and range guards") {
    // the two properties that MAKE a curve Hilbert (any orientation):
    // indices are a permutation of the full grid, and consecutive indices
    // are grid-adjacent (L1 distance exactly 1 — Morton teleports instead)
    def walk(dims: Int, bits: Int): Unit = {
      val side = 1 << bits
      val cells = Seq.tabulate(math.pow(side, dims).toInt) { c =>
        Array.tabulate(dims)(d => (c / math.pow(side, d).toInt % side).toLong).toSeq
      }
      val got = cells.toDF("bins")
        .select($"bins",
          Storage.hilbertValueN((0 until dims).map(i => element_at($"bins", i + 1)), bits)
            .as("h"))
        .as[(Seq[Long], Long)].collect()
      val byH = got.map { case (b, h) => h -> b }.toMap
      assert(byH.keySet == (0L until cells.size.toLong).toSet,
        s"$dims-D/$bits-bit walk is not a bijection")
      for (h <- 0L until (cells.size - 1).toLong) {
        val l1 = byH(h).zip(byH(h + 1)).map { case (a, b) => math.abs(a - b) }.sum
        assert(l1 == 1, s"$dims-D/$bits-bit walk jumps at $h (L1 = $l1)")
      }
    }
    walk(2, 3) // 64 cells
    walk(3, 2) // 64 cells
    walk(4, 2) // 256 cells
    // NULL bin -> NULL index; out-of-range bin throws loudly
    val nulls = Seq((Some(1L), Option.empty[Long])).toDF("x", "y")
      .select(Storage.hilbertValueN(Seq($"x", $"y"), 3).as("h")).collect()
    assert(nulls.head.isNullAt(0))
    val ex = intercept[Exception] {
      Seq((9L, 1L)).toDF("x", "y")
        .select(Storage.hilbertValueN(Seq($"x", $"y"), 3)).collect()
    }
    assert(ex.getMessage != null)
  }

  test("hilbertOrderWriteN: 3-D layout bounds per-file spans on all three columns") {
    val dir = java.nio.file.Files.createTempDirectory("graft-hilbn").toString
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(4000)((rnd.nextInt(10000), rnd.nextInt(10000), rnd.nextInt(10000)))
    val df = rows.toDF("a", "b", "c")
    Storage.hilbertOrderWriteN(df, Seq("a", "b", "c"), bits = 4, s"$dir/h3", nFiles = 16)
    val back = spark.read.parquet(s"$dir/h3")
      .select(input_file_name().as("f"), $"a", $"b", $"c")
    val spans = back.groupBy($"f")
      .agg((max($"a") - min($"a")).as("sa"), (max($"b") - min($"b")).as("sb"),
        (max($"c") - min($"c")).as("sc"))
      .agg(avg($"sa"), avg($"sb"), avg($"sc")).head()
    // 16 files over a 10k domain: an unclustered write leaves ~10k spans;
    // the 3-D curve must bound ALL three columns well below that
    for (i <- 0 until 3)
      assert(spans.getDouble(i) < 7000, s"col $i avg span ${spans.getDouble(i)}")
    // and the same rows survive the round trip
    assert(back.count() == 4000)
  }

  test("hilbertOrderWriteN at exactly 2 columns honors the N-dim contract (bits > 8)") {
    // the routing bug this pins against: 2-col layouts fell through to the
    // legacy quadrant-rotation hilbertValue, whose bits <= 8 cap threw for
    // bits in [9, 31] despite hilbertOrderWriteN's any-dims/62-bit contract
    val dir = java.nio.file.Files.createTempDirectory("graft-hilb2n").toString
    val rnd = new scala.util.Random(13)
    val df = Seq.fill(2000)((rnd.nextInt(100000), rnd.nextInt(100000))).toDF("a", "b")
    Storage.hilbertOrderWriteN(df, Seq("a", "b"), bits = 10, s"$dir/h2", nFiles = 8)
    val back = spark.read.parquet(s"$dir/h2")
      .select(input_file_name().as("f"), $"a", $"b")
    assert(back.count() == 2000)
    val spans = back.groupBy($"f")
      .agg((max($"a") - min($"a")).as("sa"), (max($"b") - min($"b")).as("sb"))
      .agg(avg($"sa"), avg($"sb")).head()
    for (i <- 0 until 2)
      assert(spans.getDouble(i) < 70000, s"col $i avg span ${spans.getDouble(i)}")
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
