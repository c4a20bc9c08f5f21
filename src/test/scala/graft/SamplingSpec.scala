package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Sampling

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hashSample is deterministic and layout-independent") {
    val df = (1 to 2000).map(i => Tuple1(i.toLong)).toDF("id")
    val a = Sampling.hashSample(df, Seq("id"), 0.1).select("id").as[Long].collect().toSet
    val b = Sampling.hashSample(df.repartition(7), Seq("id"), 0.1)
      .select("id").as[Long].collect().toSet
    assert(a == b)                      // repartition must not change membership
    assert(a.size > 120 && a.size < 280) // ~10%
  }

  test("hashSample membership is stable under corpus growth (no leakage)") {
    val small = (1 to 500).map(i => Tuple1(i.toLong)).toDF("id")
    val big   = (1 to 1000).map(i => Tuple1(i.toLong)).toDF("id")
    val s = Sampling.hashSample(small, Seq("id"), 0.2).select("id").as[Long].collect().toSet
    val g = Sampling.hashSample(big, Seq("id"), 0.2).select("id").as[Long].collect().toSet
    assert(s.subsetOf(g)) // existing rows keep their membership as data arrives
  }

  test("splitColumn covers every row with the right proportions") {
    val df = (1 to 3000).map(i => Tuple1(i.toLong)).toDF("id")
    val counts = df
      .select(Sampling.splitColumn(Seq($"id".cast("string")),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("s"))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 3000)
    assert(counts("train") > 2200 && counts("val") > 150 && counts("test") > 150)
  }

  test("splitColumn rejects weights that don't sum to 1") {
    intercept[IllegalArgumentException] {
      Sampling.splitColumn(Seq($"x"), Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("tokenBudgetMix keeps under-budget sources whole, samples the rest") {
    val docs = (1L to 400L).map { i =>
      (i, if (i <= 200) "big" else "small", 10L) // big: 2000 tokens, small: 2000 tokens
    }.toDF("id", "source", "n_tokens")
    // budget 1000: big frac = min(1, .9*1000/2000) = .45;
    // small (default weight .55) frac = min(1, .55*1000/2000) = .275
    val out = graft.ops.Sampling.tokenBudgetMix(docs, Seq("id"), "source",
        col("n_tokens"), budget = 1000.0, Map("big" -> 0.9), default = 0.55)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(out("big") > 60 && out("big") < 120)     // ~45% of 200
    assert(out("small") > 30 && out("small") < 80)  // ~27.5% of 200
    // a huge budget keeps everything
    val all = graft.ops.Sampling.tokenBudgetMix(docs, Seq("id"), "source",
      col("n_tokens"), budget = 1e9, Map("big" -> 0.9), default = 0.55)
    assert(all.count() == 400)
  }

  test("tokenBudgetMix keeps null-source rows under the default weight") {
    val docs = Seq((1L, "web", 10L), (2L, null.asInstanceOf[String], 10L),
      (3L, null.asInstanceOf[String], 10L)).toDF("id", "source", "n_tokens")
    val out = graft.ops.Sampling.tokenBudgetMix(docs, Seq("id"), "source",
      col("n_tokens"), budget = 1e9, Map("web" -> 0.5), default = 0.5)
    assert(out.count() == 3) // the using-column join form silently dropped ids 2 and 3
  }

  test("hashBucket distinguishes NULL placement in multi-key hashes") {
    val df = Seq(
      (1L, Option("a"), Option.empty[String]),
      (2L, Option.empty[String], Option("a")),
      (3L, Option("a"), Option("a"))).toDF("id", "x", "y")
    val buckets = df
      .select(Sampling.hashBucket(Seq(col("x"), col("y")), 1000000).as("b"))
      .as[Long].collect()
    assert(buckets.distinct.length == 3) // concat_ws's NULL-skip collided all three
  }

  test("packSequences: offsets are contiguous per bucket, seqs respect maxTokens starts") {
    val docs = (1L to 300L).map(i => (i, 7L)).toDF("id", "n_tokens")
    val out = graft.ops.Sampling.packSequences(docs, "id", col("n_tokens"), 50L, 3)
      .select("id", "bucket", "offset", "seq").collect()
    val byBucket = out.groupBy(_.getLong(1))
    byBucket.values.foreach { rows =>
      val sorted = rows.sortBy(_.getLong(2))
      // offsets are the running sum: 0, 7, 14, …
      assert(sorted.zipWithIndex.forall { case (r, i) => r.getLong(2) == 7L * i })
      // a doc's seq is determined by where its FIRST token lands
      assert(sorted.forall(r => r.getLong(3) % (1L << 40) == r.getLong(2) / 50L))
    }
    // deterministic across replays with different input order
    val again = graft.ops.Sampling.packSequences(docs.orderBy(rand(3)), "id",
      col("n_tokens"), 50L, 3).select("id", "seq").as[(Long, Long)].collect().toMap
    assert(out.map(r => r.getLong(0) -> r.getLong(3)).toMap == again)
  }

  test("weightedSample favors heavy rows, is deterministic, drops null/zero weights") {
    val df = (1 to 4000).map { i =>
      val w: java.lang.Long =
        if (i % 100 == 0) null else if (i % 7 == 0) 0L else if (i <= 2000) 1L else 9L
      (i.toLong, w)
    }.toDF("id", "w")
    val kept = Sampling.weightedSample(df, Seq("id"), "w", 0.2)
      .select("id").as[Long].collect().toSet
    // expected size ≈ 0.2·N; heavy rows (w=9) should dominate the sample
    assert(kept.size > 500 && kept.size < 1100)
    val heavy = kept.count(_ > 2000)
    assert(heavy > kept.size / 2)
    assert(kept.forall(i => i % 100 != 0 && i % 7 != 0)) // null/zero weight excluded
    // layout-independent: repartition does not change membership
    val again = Sampling.weightedSample(df.repartition(13), Seq("id"), "w", 0.2)
      .select("id").as[Long].collect().toSet
    assert(again == kept)
  }

  test("single-key hashBucket drops NULL keys, matching the md5(CAST(k AS VARCHAR)) oracle") {
    val df = Seq(Option(1L), Option(2L), None, Option(3L)).toDF("id")
    // NULL bucket fails every cutoff test — the row can never be sampled in,
    // exactly as the SQL replay (md5 of NULL is NULL) decides
    val kept = Sampling.hashSample(df, Seq("id"), 1.0).select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L))
  }

  test("weightedSample totals exclude dropped rows: negative/null weights can't skew odds") {
    val base = (1 to 2000).map(i => (i.toLong, (i % 5 + 1).toLong)).toDF("id", "w")
    // pollute with rows that are dropped from the sample: if the Σw/N totals
    // included them, every kept row's cutoff would shift (negative w shrinks
    // Σw, null rows inflate N) and membership would differ
    val polluted = base.union(Seq((90001L, -1000000L), (90002L, -5L)).toDF("id", "w"))
      .union(Seq((90003L, null.asInstanceOf[java.lang.Long])).toDF("id", "w"))
    val cleanKept = Sampling.weightedSample(base, Seq("id"), "w", 0.3)
      .select("id").as[Long].collect().toSet
    val pollutedKept = Sampling.weightedSample(polluted, Seq("id"), "w", 0.3)
      .select("id").as[Long].collect().toSet
    assert(pollutedKept == cleanKept)
  }

  test("stratifiedSample applies per-stratum fractions and the default") {
    val df = (1 to 3000).map(i =>
      (i.toLong, if (i % 3 == 0) "en" else if (i % 3 == 1) "zh" else "fr"))
      .toDF("id", "lang")
    val counts = Sampling
      .stratifiedSample(df, "lang", Seq("id"), Map("en" -> 0.9, "zh" -> 0.1), default = 0.0)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(counts("en") > 800 && counts("en") <= 1000)
    assert(counts("zh") > 50 && counts("zh") < 200)
    assert(!counts.contains("fr")) // default 0 drops absent strata entirely
    // same membership rule as hashSample: an en row keeps its fate at any fraction order
    val again = Sampling
      .stratifiedSample(df.orderBy(rand(3)), "lang", Seq("id"), Map("zh" -> 0.1, "en" -> 0.9))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(again == counts)
  }

  test("rendezvousShard: every key that moves on n→n+1 moves TO the new shard") {
    val df = (1 to 2000).map(_.toLong).toDF("id")
      .select(col("id"),
        Sampling.rendezvousShard(col("id"), 8).as("s8"),
        Sampling.rendezvousShard(col("id"), 9).as("s9"))
      .cache()
    val moved = df.filter(col("s8") =!= col("s9"))
    // the HRW property: a key only moves when the ADDED candidate out-scores
    // its old winner, so its new shard is always the added one
    assert(moved.filter(col("s9") =!= 8).count() == 0)
    // ~1/9 of keys move (binomial bounds, generous)
    val m = moved.count()
    assert(m > 2000 / 9 / 2 && m < 2000 / 9 * 2, s"moved $m of 2000")
    // every shard in [0, 8) is populated
    assert(df.select("s8").distinct().count() == 8)
    df.unpersist()
  }

  test("weightedTakeK: exact size, weight-proportional, layout-independent") {
    val df = (1L to 2000L).map(i => (i, if (i <= 100) 50.0 else 1.0)).toDF("id", "w")
    val out = Sampling.weightedTakeK(df, col("id"), col("w"), 200)
      .select(col("id")).as[Long].collect().toSet
    assert(out.size == 200)
    // the 100 heavy rows (50x weight) should nearly all make a 200-sample
    assert(out.count(_ <= 100L) > 70, s"heavy rows in sample: ${out.count(_ <= 100L)}")
    // deterministic under repartitioning
    val out2 = Sampling.weightedTakeK(df.repartition(17), col("id"), col("w"), 200)
      .select(col("id")).as[Long].collect().toSet
    assert(out == out2)
    // null/non-positive weights are never sampled
    val withBad = df.union(Seq((9001L, -5.0), (9002L, 0.0)).toDF("id", "w"))
    val out3 = Sampling.weightedTakeK(withBad, col("id"), col("w"), 2000)
      .select(col("id")).as[Long].collect().toSet
    assert(!out3.contains(9001L) && !out3.contains(9002L) && out3.size == 2000)
  }

  test("temperatureWeights: alpha=0.5 flattens an 80/20 mix toward 2/3-1/3") {
    val df = (Seq.fill(8)("big") ++ Seq.fill(2)("small")).toDF("src")
    val out = Sampling.temperatureWeights(df, "src", 0.5)
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    // sqrt(.8)=.894427, sqrt(.2)=.447214 -> w = .6667/.3333, boost = .8333/1.6667
    assert(out == Seq(
      ("big", 8L, 0.8, 0.6667, 0.8333),
      ("small", 2L, 0.2, 0.3333, 1.6667)))
  }

  test("temperatureWeights: alpha=1 reproduces the natural mix exactly") {
    val df = (Seq.fill(3)("a") ++ Seq.fill(1)("b")).toDF("src")
    val out = Sampling.temperatureWeights(df, "src", 1.0)
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(out == Seq(("a", 3L, 0.75, 0.75, 1.0), ("b", 1L, 0.25, 0.25, 1.0)))
  }
}
