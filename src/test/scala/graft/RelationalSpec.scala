package graft

import org.scalatest.funsuite.AnyFunSuite

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
