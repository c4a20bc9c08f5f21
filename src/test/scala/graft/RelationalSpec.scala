package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions.col

import graft.ops.Relational

class RelationalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asOfJoin attaches the latest right row at-or-before each left ts") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "p1"),
      (1L, ts("2024-01-01 12:00:00"), "p2"),
      (2L, ts("2024-01-01 09:00:00"), "p3")).toDF("k", "ts", "lv")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 100L, "a"),
      (1L, ts("2024-01-01 11:00:00"), 200L, "b"),
      (2L, ts("2024-01-01 09:30:00"), 300L, "c")).toDF("k", "ts", "rid", "rv")
    val out = Relational.asOfJoin(left, right, Seq("k"), "ts", "ts",
      Seq("rid", "rv"), tieBreak = Seq("rid"))
      .orderBy("k", "ts").collect()
    assert(out(0).getAs[Long]("asof_rid") == 100L)   // 10:00 sees 09:30
    assert(out(1).getAs[Long]("asof_rid") == 200L)   // 12:00 sees 11:00
    assert(out(2).isNullAt(out(2).fieldIndex("asof_rid"))) // 09:00 precedes all
  }

  test("asOfJoin tie at equal timestamps matches (<= semantics)") {
    val left  = Seq((1L, ts("2024-01-01 10:00:00"), "p")).toDF("k", "ts", "lv")
    val right = Seq((1L, ts("2024-01-01 10:00:00"), 7L, "x")).toDF("k", "ts", "rid", "rv")
    val out = Relational.asOfJoin(left, right, Seq("k"), "ts", "ts", Seq("rid", "rv"))
      .collect()
    assert(out(0).getAs[Long]("asof_rid") == 7L)
  }

  test("intervalJoin equals the naive range join, incl. band-boundary pairs") {
    import org.apache.spark.sql.functions._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (1L, 11L, ts("2024-01-01 13:00:00")),
      (2L, 12L, ts("2024-01-01 10:00:00"))).toDF("k", "lid", "lts")
    val right = Seq(
      (1L, 20L, ts("2024-01-01 10:59:59")), // inside, crosses the band edge
      (1L, 21L, ts("2024-01-01 11:00:01")), // just outside 1 h
      (1L, 22L, ts("2024-01-01 12:30:00")), // inside for 13:00
      (2L, 23L, ts("2024-01-01 09:00:00"))).toDF("k", "rid", "rts")
    val banded = Relational.intervalJoin(left, right, Seq("k"), "lts", "rts", 3600)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val naive = left.join(right, left("k") === right("k") &&
        abs(unix_timestamp(left("lts")) - unix_timestamp(right("rts"))) <= 3600)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(banded == naive)
    assert(banded == Set((10L, 20L), (11L, 22L), (12L, 23L)))
  }

  test("intervalJoin is microsecond-exact: a sub-second over-tolerance gap is excluded") {
    val left = Seq((1L, 10L, java.sql.Timestamp.valueOf("2024-01-01 10:00:10.900")))
      .toDF("k", "lid", "lts")
    val right = Seq(
      (1L, 20L, java.sql.Timestamp.valueOf("2024-01-01 10:00:11.950")), // gap 1.05 s > 1 s
      (1L, 21L, java.sql.Timestamp.valueOf("2024-01-01 10:00:11.850"))) // gap 0.95 s <= 1 s
      .toDF("k", "rid", "rts")
    val out = Relational.intervalJoin(left, right, Seq("k"), "lts", "rts", 1)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(out == Set((10L, 21L))) // second-truncated epochs would admit both
  }

  test("saltedJoin equals the plain join on a skewed key distribution") {
    import org.apache.spark.sql.functions._
    val left = (1 to 500).map(i => (if (i <= 450) 1L else i.toLong, s"l$i")).toDF("k", "lv")
    val right = Seq((1L, "hot"), (460L, "cold")).toDF("rk", "rv")
    val plain  = left.join(right, left("k") === right("rk")).select("k", "lv", "rv")
    val salted = Relational.saltedJoin(left, right, "k", "rk", salts = 8).select("k", "lv", "rv")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedJoin works with map columns (salt hash skips unhashable types)") {
    import org.apache.spark.sql.functions._
    val left = (1 to 100).map(i => (1L, s"l$i")).toDF("k", "lv")
      .withColumn("m", map(col("lv"), col("k")))
    val right = Seq((1L, "hot")).toDF("rk", "rv")
    val out = Relational.saltedJoin(left, right, "k", "rk", salts = 4)
    assert(out.count() == 100) // xxhash64 over the map column would throw
    // the salt is a content hash: the SAME row set must land identically
    // on a recomputation — pin by running the salted projection twice
    val salts1 = out.select("lv").as[String].collect().sorted.toSeq
    val salts2 = Relational.saltedJoin(left, right, "k", "rk", salts = 4)
      .select("lv").as[String].collect().sorted.toSeq
    assert(salts1 == salts2)
  }

  test("bucketed tables join without a shuffle exchange") {
    val spark = TestSpark.spark
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val sfx = System.nanoTime() // files outlive the per-JVM metastore
      val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "av")
      val b = (1 to 1000).map(i => (i.toLong, s"b$i")).toDF("k", "bv")
      a.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable(s"bkt_a_$sfx")
      b.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable(s"bkt_b_$sfx")
      val joined = spark.table(s"bkt_a_$sfx").join(spark.table(s"bkt_b_$sfx"), "k")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      // co-located by bucket: no hash-partitioning exchange on either side
      assert(!plan.contains("Exchange hashpartitioning"))
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("snapshotDiff classifies added/removed/changed/unchanged with column lists") {
    val old = Seq((1L, "A", 10.0), (2L, "B", 20.0), (3L, "C", 30.0)).toDF("k", "st", "v")
    val nw  = Seq((2L, "B", 20.0), (3L, "X", 31.0), (4L, "D", 40.0)).toDF("k", "st", "v")
    val out = Relational.snapshotDiff(old, nw, Seq("k"), Seq("st", "v"))
      .orderBy("k").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq == Seq(
      (1L, "removed", ""), (2L, "unchanged", ""),
      (3L, "changed", "st,v"), (4L, "added", "")))
  }

  test("snapshotDiff is null-safe on keys and values") {
    val old = Seq((Option.empty[Long], Some("A")), (Some(1L), None))
      .toDF("k", "st")
    val nw  = Seq((Option.empty[Long], Some("A")), (Some(1L), Some("B")))
      .toDF("k", "st")
    val out = Relational.snapshotDiff(old, nw, Seq("k"), Seq("st"))
      .orderBy(col("k").asc_nulls_first).collect()
    // NULL key matches NULL key (one unchanged row, not an added+removed pair)
    assert(out.map(_.getString(1)).toSeq == Seq("unchanged", "changed"))
  }

  test("overlapJoin equals the naive theta join, each pair exactly once") {
    val a = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-03-15 00:00:00")), // spans many cells
      (2L, ts("2024-02-01 00:00:00"), ts("2024-02-02 00:00:00")),
      (3L, ts("2024-06-01 00:00:00"), ts("2024-06-10 00:00:00"))
    ).toDF("a_id", "a_s", "a_e")
    val b = Seq(
      (10L, ts("2024-01-20 00:00:00"), ts("2024-02-10 00:00:00")), // overlaps 1 and 2
      (11L, ts("2024-03-14 00:00:00"), ts("2024-04-01 00:00:00")), // touches 1's end
      (12L, ts("2024-07-01 00:00:00"), ts("2024-07-02 00:00:00"))  // overlaps nothing
    ).toDF("b_id", "b_s", "b_e")
    val got = Relational.overlapJoin(a, b, "a_s", "a_e", "b_s", "b_e", 7L * 86400)
      .select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
    val naive = a.crossJoin(b)
      .filter(col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
      .select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
    assert(got == naive && got == Seq((1L, 10L), (1L, 11L), (2L, 10L)))
  }

  test("overlapJoin drops degenerate end<start intervals instead of mis-bucketing") {
    val a = Seq((1L, ts("2024-01-10 00:00:00"), ts("2024-01-01 00:00:00"))).toDF("a_id", "a_s", "a_e")
    val b = Seq((2L, ts("2024-01-01 00:00:00"), ts("2024-01-31 00:00:00"))).toDF("b_id", "b_s", "b_e")
    assert(Relational.overlapJoin(a, b, "a_s", "a_e", "b_s", "b_e", 86400).count() == 0)
  }

  test("asOfJoin carries right rows WHOLESALE: NULLs don't stitch across rows") {
    // the ADVICE bug: row@11:00 has rv=NULL; per-column carry would pair
    // rid=200 with rv='a' from the EARLIER row — a row that never existed.
    val left = Seq((1L, ts("2024-01-01 12:00:00"), "p")).toDF("k", "ts", "lv")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 100L, "a"),
      (1L, ts("2024-01-01 11:00:00"), 200L, null: String)).toDF("k", "ts", "rid", "rv")
    val out = Relational.asOfJoin(left, right, Seq("k"), "ts", "ts", Seq("rid", "rv"))
      .collect()
    assert(out(0).getAs[Long]("asof_rid") == 200L)
    assert(out(0).isNullAt(out(0).fieldIndex("asof_rv"))) // NULL from the SAME row
  }
}
