package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Clustering

class ClusteringSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // two well-separated blobs on the first axis; ids 0 and 1 are the seeds
  // and land one in each blob, so k=2 must recover the blobs exactly
  private def blobs = (0 until 40).map { i =>
    val center = if (i % 2 == 0) 10.0f else -10.0f
    (i.toLong, Seq(center + (i % 5) * 0.1f, (i % 3) * 0.1f, 0.0f, 0.0f))
  }.toDF("vec_id", "embedding")
    .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))

  test("kmeans recovers separated blobs and is layout-independent") {
    val (assigned, stats) = Clustering.kmeans(blobs, "vec_id", "embedding", k = 2, iters = 2)
    val byCluster = assigned.select(col("vec_id"), col("cluster"))
      .as[(Long, Int)].collect().toMap
    // even ids (the +10 blob, seed 0) all together; odd ids likewise
    assert((0 until 40).forall(i => byCluster(i.toLong) == byCluster((i % 2).toLong)))
    assert(byCluster(0L) != byCluster(1L))
    assert(stats.map(_._2).sum == 40L)
    // same result regardless of partition layout (content-addressed seeds,
    // broadcast assignment, algebraic update)
    val (again, stats2) = Clustering.kmeans(blobs.repartition(7), "vec_id", "embedding", 2, 2)
    assert(again.select("vec_id", "cluster").as[(Long, Int)].collect().toMap == byCluster)
    assert(stats2 == stats)
  }

  test("kmeans centroids are the member means (rounded 1e-4)") {
    val (assigned, stats) = Clustering.kmeans(blobs, "vec_id", "embedding", k = 2, iters = 1)
    val members = assigned.select(col("cluster"), col("embedding"))
      .as[(Int, Seq[Float])].collect().groupBy(_._1)
    stats.foreach { case (cid, n, c) =>
      val vs = members(cid).map(_._2)
      assert(n == vs.length)
      c.indices.foreach { i =>
        val mean = vs.map(_(i).toDouble).sum / vs.length
        assert(math.abs(c(i) - (math.floor(mean * 10000 + 0.5) / 10000)) < 1e-12)
      }
    }
  }

  test("covarianceMatrix equals the hand-computed population covariance, any layout") {
    val rows = Seq(
      Seq(1.0f, 2.0f, 0.5f), Seq(2.0f, 1.0f, 0.5f),
      Seq(3.0f, 5.0f, 0.5f), Seq(0.0f, -2.0f, 0.5f), Seq(-1.0f, 0.0f, 0.5f))
    val df = rows.map(Tuple1(_)).toDF("v")
    def cov(of: org.apache.spark.sql.DataFrame) = of
      .agg(Clustering.covarianceMatrix(col("v")).as("c"))
      .select(explode(col("c")).as("e"))
      .select(col("e._1"), col("e._2"), col("e._3"))
      .as[(Int, Int, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    val got = cov(df)
    assert(got.size == 6) // upper triangle of 3x3
    val n = rows.length.toDouble
    for (i <- 0 until 3; j <- i until 3) {
      val xi = rows.map(_(i).toDouble)
      val xj = rows.map(_(j).toDouble)
      val expected = (xi.zip(xj).map { case (a, b) => a * b }.sum -
        xi.sum * xj.sum / n) / n
      assert(math.abs(got((i, j)) - expected) < 1e-12, s"cov($i,$j)")
    }
    // constant dimension: zero variance, zero cross-covariance
    assert(math.abs(got((2, 2))) < 1e-12 && math.abs(got((0, 2))) < 1e-12)
    // partial-aggregate merge path: one row per partition forces real merges
    val spread = cov(df.repartition(5))
    assert(got.forall { case (k, v) => math.abs(spread(k) - v) < 1e-9 })
  }

  test("covarianceMatrix skips null AND empty vectors and handles the empty frame") {
    val df = Seq(Some(Seq(1.0f, 2.0f)), None, Some(Seq.empty[Float]), Some(Seq(3.0f, 4.0f)))
      .toDF("v")
    val got = df.agg(Clustering.covarianceMatrix(col("v")).as("c"))
      .select(size(col("c"))).as[Int].head()
    assert(got == 3) // 2x2 upper triangle; null and [] rows ignored
    val empty = Seq.empty[Tuple1[Seq[Float]]].toDF("v")
      .agg(Clustering.covarianceMatrix(col("v")).as("c"))
      .select(size(col("c"))).as[Int].head()
    assert(empty == 0)
  }

  test("kmeans excludes null and wrong-dimension vectors instead of misassigning them") {
    val dirty = blobs
      .union(Seq((100L, null.asInstanceOf[Seq[Float]])).toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding")))
      .union(Seq((101L, Seq(1.0f))).toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding")))
    val (assigned, stats) = Clustering.kmeans(dirty, "vec_id", "embedding", k = 2, iters = 2)
    val ids = assigned.select("vec_id").as[Long].collect().toSet
    assert(!ids.contains(100L) && !ids.contains(101L)) // dropped, not cluster-0 defaults
    assert(stats.map(_._2).sum == 40L)                 // means unpolluted
  }

  test("principalComponents: deflation recovers successive axes with eigenvalues") {
    val cov = Seq((0, 0, 9.0), (1, 1, 4.0), (2, 2, 1.0), (0, 1, 0.0), (0, 2, 0.0), (1, 2, 0.0))
    val pcs = Clustering.principalComponents(cov, 3, 3)
    assert(pcs.length == 3)
    val axes = pcs.map(_._1)
    val lams = pcs.map(_._2)
    assert(math.abs(lams(0) - 9.0) < 1e-9 && math.abs(lams(1) - 4.0) < 1e-9 &&
      math.abs(lams(2) - 1.0) < 1e-9)
    assert(math.abs(axes(0)(0)) > 0.999 && math.abs(axes(1)(1)) > 0.999 &&
      math.abs(axes(2)(2)) > 0.999)
    // components are orthonormal
    for (i <- 0 until 3; j <- i + 1 until 3) {
      val dot = axes(i).zip(axes(j)).map { case (a, b) => a * b }.sum
      assert(math.abs(dot) < 1e-9, s"components $i,$j not orthogonal")
    }
  }

  test("covariance state merges losslessly: split state merge equals the full build") {
    val rows = (1 to 60).map { i =>
      Tuple1(Seq((i % 7).toFloat, (i % 3).toFloat, (i * 0.5f) % 5))
    }
    val df = rows.toDF("v")
    val full = df.agg(Clustering.covarianceMatrix(col("v")).as("c"))
      .select(explode(col("c")).as("e"))
      .select(col("e._1"), col("e._2"), col("e._3"))
      .as[(Int, Int, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    val sA = Clustering.covState(rows.take(25).toDF("v"), "v")
    val sB = Clustering.covState(rows.drop(25).toDF("v"), "v")
    val merged = Clustering.covFromState(Clustering.mergeCovStates(sA.union(sB)))
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(merged.keySet == full.keySet)
    assert(full.forall { case (k, v) => math.abs(merged(k) - v) < 1e-9 })
  }

  test("anisotropic data: PCA-2 projection preserves neighborhoods; whiten equalizes") {
    // variance lives in dims 0-1; dims 2-5 are near-constant noise
    val rnd = new scala.util.Random(7)
    val rows = (0 until 120).map { i =>
      (i.toLong, Seq(
        (rnd.nextDouble() * 20 - 10).toFloat, (rnd.nextDouble() * 8 - 4).toFloat,
        (rnd.nextDouble() * 0.01).toFloat, (rnd.nextDouble() * 0.01).toFloat,
        (rnd.nextDouble() * 0.01).toFloat, (rnd.nextDouble() * 0.01).toFloat))
    }
    val df = rows.toDF("id", "v")
    val cov = Clustering.covFromState(Clustering.covState(df, "v"))
    val pcs = Clustering.principalComponents(cov, 6, 2)
    // the two dominant axes are (up to sign) e0 and e1
    assert(math.abs(pcs(0)._1(0)) > 0.99 && math.abs(pcs(1)._1(1)) > 0.99)
    assert(pcs(0)._2 > pcs(1)._2 && pcs(1)._2 > 1.0)
    // whitened coordinates have ~unit variance on both components
    val wh = df.select(Clustering.whiten(col("v"), pcs).as("w"))
      .select(element_at(col("w"), 1).as("w0"), element_at(col("w"), 2).as("w1"))
      .agg(var_pop(col("w0")), var_pop(col("w1")))
      .as[(Double, Double)].head()
    assert(math.abs(wh._1 - 1.0) < 0.05 && math.abs(wh._2 - 1.0) < 0.05)
  }

  test("powerIteration finds the dominant axis; project reduces dimension") {
    // diagonal covariance with a dominant first axis
    val cov = Seq((0, 0, 9.0), (1, 1, 1.0), (2, 2, 0.1), (0, 1, 0.0), (0, 2, 0.0), (1, 2, 0.0))
    val pc = Clustering.powerIteration(cov, 3)
    assert(math.abs(pc(0)) > 0.999 && math.abs(pc(1)) < 0.03 && math.abs(pc(2)) < 0.03)
    assert(pc(0) > 0) // sign convention: first nonzero component positive
    val df = Seq((1L, Seq(2.0f, 3.0f, 4.0f))).toDF("id", "v")
    val p = df.select(Clustering.project(col("v"),
      Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, 0.0, 1.0))).as("p"))
      .as[Seq[Double]].head()
    assert(p == Seq(2.0, 4.0))
  }

  // four blobs distinguishable per HALF of the vector: the first two dims
  // separate {A,B}|{C,D}, the last two separate {A,C}|{B,D} — so a 2-subspace
  // PQ must give each blob a distinct (code0, code1) pair
  private def pqBlobs = (0 until 48).map { i =>
    val a = if (i % 4 < 2) 10.0f else -10.0f
    val b = if (i % 2 == 0) 10.0f else -10.0f
    (i.toLong, Seq(a + (i % 3) * 0.1f, a, b, b - (i % 5) * 0.1f))
  }.toDF("vec_id", "embedding")
    .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))

  test("pq: blob structure survives the codes; reconstruction is near; encode never shuffles") {
    val cb = Clustering.pqTrain(pqBlobs, "vec_id", "embedding", nSub = 2, k = 2, iters = 2)
    assert(cb.dim == 4 && cb.width == 2 && cb.books.forall(_.nonEmpty))
    val enc = Clustering.pqEncode(pqBlobs, "embedding", cb)
    // expression-only encode: no exchange, no join anywhere in the plan
    val plan = enc.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"pqEncode must be scan-stage expression work:\n$plan")
    val codes = enc.select(col("vec_id"),
        element_at(col("codes"), 1), element_at(col("codes"), 2))
      .as[(Long, Int, Int)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    // same blob → same code pair; the four blobs get four distinct pairs
    assert((0 until 48).forall(i => codes(i.toLong) == codes((i % 4).toLong)))
    assert(codes.values.toSet.size == 4)
    // reconstruction lands near the original (blob radius ≪ blob separation)
    val recon = enc.select(
      Clustering.sqDistC(col("embedding"), Clustering.pqReconstruct(col("codes"), cb)))
      .as[Double].collect()
    assert(recon.forall(_ < 0.2), s"max recon sq-err ${recon.max}")
  }

  test("pq: ADC distance IS the distance to the reconstruction; null/off-dim rows get null codes") {
    val cb = Clustering.pqTrain(pqBlobs, "vec_id", "embedding", nSub = 2, k = 2, iters = 1)
    // identity that makes ADC trustworthy: scoring from codes must equal
    // scoring against the decompressed vector (same math, no decompression
    // in the join is purely an economics difference)
    val probe = typedLit(Seq(9.5, 10.0, -10.0, -9.8))
    val both = Clustering.pqEncode(pqBlobs, "embedding", cb)
      .select(
        Clustering.pqAdcDist(probe, col("codes"), cb).as("adc"),
        Clustering.sqDistC(probe, Clustering.pqReconstruct(col("codes"), cb)).as("direct"))
      .as[(Double, Double)].collect()
    both.foreach { case (adc, direct) => assert(math.abs(adc - direct) < 1e-9) }
    val odd = Seq((1L, Some(Seq(1.0f, 2.0f, 3.0f, 4.0f))), (2L, None),
      (3L, Some(Seq(1.0f, 2.0f)))).toDF("vec_id", "embedding")
    val oc = Clustering.pqEncode(odd, "embedding", cb)
      .select(col("vec_id"), col("codes")).as[(Long, Option[Seq[Int]])].collect().toMap
    assert(oc(1L).isDefined && oc(2L).isEmpty && oc(3L).isEmpty)
  }

  test("logisticFit learns a separable rule, deterministically across layouts") {
    val df = (0 until 200).map { i =>
      val x = (i % 21).toDouble - 10.0 // -10..10
      (i.toLong, x / 10.0, (i % 7).toDouble / 7.0, if (x > 0) 1.0 else 0.0)
    }.toDF("id", "x1", "noise", "y")
    val feats = Seq(col("x1"), col("noise"))
    val w = Clustering.logisticFit(df, feats, col("y"), iters = 50, lr = 2.0)
    assert(w.length == 3)
    assert(w(1) > 1.0, s"separating weight should grow positive, got $w")
    // the fitted rule classifies the training set correctly away from 0
    val acc = df.filter(col("x1") =!= 0.0)
      .select((Clustering.logisticScore(feats, w) >= 0.5).cast("int") === col("y").cast("int"))
      .as[Boolean].collect()
    assert(acc.count(identity).toDouble / acc.length > 0.95)
    // per-step 1e-6 weight rounding absorbs partition-order float noise:
    // same weights from a 1-partition and a 13-partition layout
    val w2 = Clustering.logisticFit(df.repartition(13), feats, col("y"), 50, 2.0)
    assert(w == w2)
  }
}
