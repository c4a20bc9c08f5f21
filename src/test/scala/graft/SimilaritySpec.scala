package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cosine: identical → 1, orthogonal → 0, opposite → -1") {
    val df = Seq((Seq(1f, 0f), Seq(1f, 0f), Seq(0f, 1f), Seq(-1f, 0f))).toDF("a", "b", "c", "d")
    val r = df.select(
      Similarity.cosine($"a", $"b"), Similarity.cosine($"a", $"c"), Similarity.cosine($"a", $"d"))
      .head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1)) < 1e-12)
    assert(math.abs(r.getDouble(2) + 1.0) < 1e-12)
  }

  test("knn top-1 is the true nearest neighbour") {
    val vecs = Seq(
      (0L, Seq(1f, 0f, 0f)), (1L, Seq(0.9f, 0.1f, 0f)),
      (2L, Seq(0f, 1f, 0f)), (3L, Seq(0f, 0f, 1f))).toDF("vec_id", "embedding")
    val out = Similarity.knn(vecs.filter($"vec_id" === 0), vecs, "vec_id", "embedding", 1)
      .select("neighbor_id").as[Long].head()
    assert(out == 1L)
  }

  test("rankTopK equals the row_number window form, ties included") {
    // deterministic pseudo-random candidates with FORCED sim ties (sims
    // quantized to one decimal) so the (sim desc, id asc) tie-break is hit
    val rng = new scala.util.Random(7)
    val cand = Seq.tabulate(2000) { i =>
      (rng.nextInt(37).toLong, i.toLong, math.floor(rng.nextDouble() * 10) / 10)
    }.toDF("probe_id", "neighbor_id", "sim")
    val k = 5
    val viaAgg = Similarity.rankTopK(cand, k)
      .orderBy("probe_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"probe_id").orderBy($"sim".desc, $"neighbor_id".asc)
    val viaWindow = cand.withColumn("rank", row_number().over(w)).filter($"rank" <= k)
      .orderBy("probe_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(viaAgg.sameElements(viaWindow))
  }

  test("rankTopK dedups repeated ids, keeping each id's best entry") {
    val cand = Seq(
      (1L, 10L, 0.9), (1L, 10L, 0.9), (1L, 10L, 0.9), // multi-table dup
      (1L, 11L, 0.3), (1L, 11L, 0.8),                 // same id, better later
      (1L, 12L, 0.5)).toDF("probe_id", "neighbor_id", "sim")
    val out = Similarity.rankTopK(cand, 2)
      .orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(out.toSeq == Seq((10L, 0.9, 1), (11L, 0.8, 2)))
  }

  test("quantizeInt8: max-abs maps to ±127, zero vector gets zero code, cosine survives") {
    val df = Seq(
      (1L, Seq(0.5f, -1.0f, 0.25f)),
      (2L, Seq(0f, 0f, 0f))).toDF("vec_id", "embedding")
    val out = df.select($"vec_id",
        Similarity.quantizeInt8($"embedding").as("qz"))
      .select($"vec_id", $"qz.scale", $"qz.q")
      .orderBy("vec_id")
      .collect()
    assert(math.abs(out(0).getDouble(1) - 1.0 / 127) < 1e-12)
    assert(out(0).getSeq[Byte](2) == Seq[Byte](64, -127, 32)) // floor(x/scale+0.5)
    assert(out(1).getDouble(1) == 0.0 && out(1).getSeq[Byte](2) == Seq[Byte](0, 0, 0))
    val cos = df.filter($"vec_id" === 1)
      .select(Similarity.dequantCosine($"embedding",
        Similarity.quantizeInt8($"embedding"))).head().getDouble(0)
    assert(cos > 0.9999, s"int8 reconstruction cosine too low: $cos")
  }

  test("vectorMean UDAF equals per-position average") {
    val vecs = Seq((0, Seq(1f, 3f)), (0, Seq(3f, 5f)), (1, Seq(10f, 0f))).toDF("label", "embedding")
    val out = vecs.groupBy($"label").agg(Similarity.vectorMean($"embedding").as("m"))
      .orderBy("label").select("m").as[Seq[Double]].collect()
    assert(out(0) == Seq(2.0, 4.0))
    assert(out(1) == Seq(10.0, 0.0))
  }

  test("annTopK returns pairs only within a shared LSH bucket, ranked by sim") {
    val vecs = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0.99f, 0.01f, 0f, 0f)),
      (2L, Seq(-1f, 0f, 0f, 0f)), (3L, Seq(-0.98f, -0.02f, 0f, 0f))).toDF("vec_id", "embedding")
    val out = Similarity.annTopK(vecs, "vec_id", "embedding", 2, 1)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toMap
    // near-identical vectors must share a bucket and pick each other
    assert(out.get(0L).contains(1L) && out.get(1L).contains(0L))
    assert(out.get(2L).contains(3L) && out.get(3L).contains(2L))
  }

  test("annTopK hot-bucket salt: clone flood still fills every probe's top-k at sim 1.0") {
    // 60 near-identical vectors collide in every table's bucket; salting at
    // maxBucket = 10 splits each hot bucket into ~6 groups, so candidate
    // volume drops from O(d²) to O(d·maxBucket) — yet every probe still
    // draws ≥ k groupmates with similarity 1.0
    val vecs = (0L until 60L).map(i => (i, Seq(1f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val out = Similarity.annTopK(vecs, "vec_id", "embedding", 2, 2, nTables = 2, maxBucket = 10)
      .select("probe_id", "sim").as[(Long, Double)].collect()
    val perProbe = out.groupBy(_._1)
    assert(perProbe.size == 60, s"every probe must keep neighbours, got ${perProbe.size}")
    assert(out.forall(_._2 == 1.0), "clone groupmates must rank at similarity 1.0")
    assert(perProbe.values.forall(_.length == 2), "top-k must stay full under the salt")
  }

  test("annTopK salt is inert when the cap does not bind (identical to unbounded)") {
    val vecs = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0.99f, 0.01f, 0f, 0f)),
      (2L, Seq(-1f, 0f, 0f, 0f)), (3L, Seq(-0.98f, -0.02f, 0f, 0f))).toDF("vec_id", "embedding")
    def rows(mb: Int) = Similarity.annTopK(vecs, "vec_id", "embedding", 2, 1, maxBucket = mb)
      .select("probe_id", "neighbor_id", "sim", "rank").collect().toSet
    assert(rows(100) == rows(Int.MaxValue))
  }

  test("ivfAssign puts each vector in its most-similar seed cell") {
    val vecs = Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(0f, 1f)),          // seeds (ids < 2)
      (2L, Seq(0.9f, 0.1f)), (3L, Seq(0.1f, 0.9f))).toDF("vec_id", "embedding")
    val cells = Similarity.ivfAssign(vecs, "vec_id", "embedding", 2)
      .select("id", "cell").as[(Long, Long)].collect().toMap
    assert(cells == Map(0L -> 0L, 1L -> 1L, 2L -> 0L, 3L -> 1L))
  }

  test("ivfAssign seeds from the smallest ids — sparse/hashed id spaces work") {
    // ids are sparse hashes (nothing below nCells): the old `id < nCells`
    // seed rule would find zero seeds and throw. Seeds must be the two
    // smallest ids (1000003 → x-axis, 7000021 → y-axis).
    val vecs = Seq(
      (1000003L, Seq(1f, 0f)), (7000021L, Seq(0f, 1f)),
      (9000017L, Seq(0.9f, 0.1f)), (8123457L, Seq(0.1f, 0.9f))).toDF("vec_id", "embedding")
    val cells = Similarity.ivfAssign(vecs, "vec_id", "embedding", 2)
      .select("id", "cell").as[(Long, Long)].collect().toMap
    assert(cells == Map(1000003L -> 1000003L, 7000021L -> 7000021L,
      9000017L -> 1000003L, 8123457L -> 7000021L))
  }

  test("ivfAssign seedByHash picks a deterministic pseudo-random seed set") {
    val vecs = (0L until 40L).map(i =>
      (i, Seq((i % 7).toFloat + 1f, (i % 5).toFloat + 1f))).toDF("vec_id", "embedding")
    val a = Similarity.ivfAssign(vecs, "vec_id", "embedding", 4, seedByHash = true)
      .select("id", "cell").as[(Long, Long)].collect().toMap
    val b = Similarity.ivfAssign(vecs, "vec_id", "embedding", 4, seedByHash = true)
      .select("id", "cell").as[(Long, Long)].collect().toMap
    assert(a == b, "hash-ordered seeding must be run-to-run deterministic")
    val seeds = a.values.toSet
    assert(seeds.size == 4)
    assert(seeds != Set(0L, 1L, 2L, 3L), "hash order should not degenerate to id order")
    // every vector still lands in a real seed cell
    assert(a.keySet == (0L until 40L).toSet && a.values.forall(seeds.contains))
  }

  test("ivfTopK finds within-cell neighbours") {
    val vecs = Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(0f, 1f)),
      (2L, Seq(0.9f, 0.1f)), (3L, Seq(0.95f, 0.05f))).toDF("vec_id", "embedding")
    val out = Similarity.ivfTopK(vecs, "vec_id", "embedding", 2, 1)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toMap
    // cell 0 contains {0,2,3}: 2's nearest is 3 (cos .9984 vs .9938 to 0);
    // 3's nearest is the seed 0 (cos .9986 vs .9984 to 2)
    assert(out(2L) == 3L && out(3L) == 0L)
  }

  test("ivfPqTopK at nProbe = nCells equals the flat ADC sweep (cells prune, never re-rank)") {
    // with every cell probed the candidate set is all-pairs, so IVF-PQ must
    // reproduce the cell-free ADC ranking exactly — pins that cell routing
    // only PRUNES candidates and the ADC arithmetic is shared
    import graft.ops.Clustering
    val sf = "/root/testdata/sf0.001"
    val e = graft.Tables.t(spark, sf, "embeddings")
    val cb = Clustering.pqTrain(e, "vec_id", "embedding", nSub = 2, k = 4, iters = 1)
    val viaIvf = Similarity.ivfPqTopK(e, "vec_id", "embedding", cb, nCells = 4, k = 3, nProbe = 4)
      .select("probe_id", "neighbor_id", "adc_d6", "rank")
      .as[(Long, Long, Double, Int)].collect().sorted.toSeq
    val enc = Clustering.pqEncode(e.filter(col("embedding").isNotNull), "embedding", cb)
      .select(col("vec_id").as("neighbor_id"), col("codes"))
    val probes = e.filter(col("embedding").isNotNull)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    val d6 = floor(Clustering.pqAdcDist(col("pv"), col("codes"), cb) * 1000000 + 0.5) / 1000000
    val flat = Similarity.rankTopK(
        enc.join(broadcast(probes), col("probe_id") =!= col("neighbor_id"))
          .select(col("probe_id"), col("neighbor_id"), (-d6).as("sim")), 3)
      .select(col("probe_id"), col("neighbor_id"), (-col("sim")).as("adc_d6"), col("rank"))
      .as[(Long, Long, Double, Int)].collect().sorted.toSeq
    assert(viaIvf == flat)
  }

  test("persisted PQ index: search ≡ in-memory ivfPqTopK; append admits a batch under the frozen model") {
    import graft.ops.Clustering
    val sf = "/root/testdata/sf0.001"
    val e = graft.Tables.t(spark, sf, "embeddings")
    val cb = Clustering.pqTrain(e, "vec_id", "embedding", nSub = 2, k = 4, iters = 1)
    val prefix = s"spec_pqidx_${System.nanoTime()}"
    Similarity.writePqIndex(e, "vec_id", "embedding", cb, nCells = 4, prefix, buckets = 2)
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.select("probe_id", "neighbor_id", "adc_d6", "rank")
        .as[(Long, Long, Double, Int)].collect().sorted.toSeq
    // the stored model replays the in-memory composition exactly
    val viaIndex = collect(Similarity.searchPqIndex(e, "vec_id", "embedding", prefix, 3, nProbe = 2))
    val inMemory = collect(Similarity.ivfPqTopK(e, "vec_id", "embedding", cb, 4, 3, nProbe = 2))
    assert(viaIndex == inMemory)
    // model round-trip is lossless: codebooks bit-equal, and the stored
    // cells are exactly the 4 smallest-id corpus vectors the build
    // fetched as seeds (values included — a dropped or corrupted seed
    // row must fail here, not re-route the corpus silently)
    val (cb2, ids2, vecs2) = Similarity.readPqModel(spark, prefix)
    assert(cb2 == cb)
    val seedRows = e.orderBy(col("vec_id")).limit(4)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])].collect()
    assert(ids2 == seedRows.map(_._1).toSeq)
    assert(vecs2 == seedRows.map(_._2).toSeq)
    // append: new vectors (disjoint ids, same space) become findable
    // WITHOUT touching the model or the existing rows
    val extra = e.limit(5)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    Similarity.appendPqIndex(extra, "vec_id", "embedding", prefix, buckets = 2)
    val after = Similarity.searchPqIndex(e.limit(5), "vec_id", "embedding", prefix, 50, nProbe = 4)
      .select("neighbor_id").as[Long].collect()
    assert(after.exists(_ >= 100000L),
      "appended vectors must surface in index search")
  }

  test("deleteFromPqIndex + compactPqIndex ≡ search of an index built without the deleted ids") {
    import graft.ops.Clustering
    val sf = "/root/testdata/sf0.001"
    val e = graft.Tables.t(spark, sf, "embeddings")
    val cb = Clustering.pqTrain(e, "vec_id", "embedding", nSub = 2, k = 4, iters = 1)
    val prefix  = s"spec_pqdel_${System.nanoTime()}"
    val prefix2 = s"${prefix}_truth"
    Similarity.writePqIndex(e, "vec_id", "embedding", cb, nCells = 4, prefix, buckets = 2)
    // ground truth: an index built WITHOUT the deleted ids, under the SAME
    // model (cells seed from the 4 smallest ids, none deleted — routing is
    // identical, so results must be identical)
    Similarity.writePqIndex(e.filter($"vec_id" % 7 =!= 0 || $"vec_id" < 4),
      "vec_id", "embedding", cb, nCells = 4, prefix2, buckets = 2)
    val probes = e.filter($"vec_id" % 25 === 0)
    def collect(p: String) =
      Similarity.searchPqIndex(probes, "vec_id", "embedding", p, 3, nProbe = 2)
        .select("probe_id", "neighbor_id", "adc_d6", "rank")
        .as[(Long, Long, Double, Int)].collect().sorted.toSeq
    val del = e.filter($"vec_id" % 7 === 0 && $"vec_id" >= 4).select($"vec_id")
    Similarity.deleteFromPqIndex(spark, del, "vec_id", prefix)
    val truth = collect(prefix2)
    assert(collect(prefix) == truth, "tombstone path must equal the shrunken index")
    // compaction folds the tombstones physically: same answer, reset table
    Similarity.compactPqIndex(spark, prefix, buckets = 2)
    assert(!spark.catalog.tableExists(s"${prefix}_del"))
    assert(collect(prefix) == truth, "compacted path must equal the shrunken index")
    assert(spark.table(s"${prefix}_idx")
      .filter($"id" % 7 === 0 && $"id" >= 4).count() == 0)
  }

  test("ANN recall@3 vs q24 brute-force ground truth (sf0.001, tuned geometry)") {
    // Retrieval-quality gate: the bucketed paths are CORRECT against their
    // own oracles by construction; this pins that future bucket/cell tuning
    // cannot silently degrade what they retrieve. Both suite queries now
    // derive their geometry from n via the occupancy-constant sizing rules
    // (annPlanesFor / ivfCellsFor) — the shapes that survive 100 TB.
    val sf = "/root/testdata/sf0.001"
    def topk(name: String): Map[Long, Set[Long]] =
      SparkEntry.queries(name)(spark, sf)
        .select("probe_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val truth = topk("q24_knn")
    def recallOf(name: String): Double = {
      val approx  = topk(name)
      val recalls = truth.toSeq.map { case (p, t) =>
        approx.get(p).map(a => (a & t).size.toDouble / t.size).getOrElse(0.0)
      }
      recalls.sum / recalls.size
    }
    // Sign-LSH: annPlanesFor(500) resolves to the floor (3 planes); the 12
    // tables buy recall back linearly — the full ≥ 0.9 gate holds.
    val r26 = recallOf("q26_ann_lsh")
    assert(r26 >= 0.9, s"q26_ann_lsh recall@3 = $r26")
    // IVF at the tuned √(n·nProbe) geometry (55 cells, nProbe = 6 at
    // n = 500): the testdata embeddings are ISOTROPIC, where recall is
    // information-bounded — a sublinear index cannot beat the probed
    // neighbourhood on structureless vectors (measured ≈ 0.45; the uniform
    // 6/55 ≈ 0.11 probe floor is what pure chance would give, so 0.35 pins
    // that cosine cell locality still retrieves 3×+ above chance). The
    // ≥ 0.9 gate lives on CLUSTERED embeddings in the next test — the
    // regime IVF exists for.
    val r58 = recallOf("q58_ivf_ann")
    assert(r58 >= 0.35, s"q58_ivf_ann recall@3 = $r58 (isotropic information bound)")
  }

  test("tuned IVF geometry (ivfCellsFor) keeps recall@3 ≥ 0.9 on clustered embeddings") {
    // The regime IVF exists for: 40 tight clusters (noise norm ≈ 0.3 vs
    // unit centers) over 2000 vectors. nCells = ivfCellsFor(2000, 4) = 89
    // seeds — drawn from the corpus by smallest id, i.e. spread across
    // clusters — so a probe's cluster is covered by its nProbe = 4 nearest
    // cells and the occupancy-constant geometry retrieves what the old
    // fixed-8-cell (75%-of-corpus-probed) form retrieved by brute force.
    val rnd  = new scala.util.Random(42)
    val dim  = 64
    val nClu = 40
    val n    = 2000
    def normed(v: Array[Double]): Array[Double] = {
      val nrm = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / nrm)
    }
    val centers = Array.fill(nClu)(normed(Array.fill(dim)(rnd.nextGaussian())))
    val sigma   = 0.3 / math.sqrt(dim.toDouble)
    val rows = Seq.tabulate(n) { i =>
      val c = centers(rnd.nextInt(nClu))
      (i.toLong, c.map(x => (x + sigma * rnd.nextGaussian()).toFloat).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val nProbe = 4
    val cells  = Similarity.ivfCellsFor(n.toLong, nProbe)
    assert(cells == 89, s"ivfCellsFor(2000, 4) = $cells")
    def topk(out: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      out.select(col("probe_id").cast("long"), col("neighbor_id").cast("long"))
        .as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val truth  = topk(Similarity.knn(df, df, "vec_id", "embedding", 3))
    val approx = topk(Similarity.ivfTopK(df, "vec_id", "embedding", cells, 3, nProbe))
    val recalls = truth.toSeq.map { case (p, t) =>
      approx.get(p).map(a => (a & t).size.toDouble / t.size).getOrElse(0.0)
    }
    val recall = recalls.sum / recalls.size
    assert(recall >= 0.9, s"tuned-IVF clustered recall@3 = $recall")
  }

  test("PQ refine step: refined recall ≥ code-only recall vs exact ground truth (clustered)") {
    // same clustered regime as the tuned-IVF gate: the quantized ADC
    // estimate (2 subspaces × 4 codes here — deliberately coarse) misorders
    // the frontier, and re-ranking the top-R on true cosine must recover
    // strictly more of the exact top-3 than the code-only rank
    val rnd  = new scala.util.Random(7)
    val dim  = 64
    def normed(v: Array[Double]): Array[Double] = {
      val nrm = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / nrm)
    }
    val centers = Array.fill(25)(normed(Array.fill(dim)(rnd.nextGaussian())))
    val sigma = 0.3 / math.sqrt(dim.toDouble)
    val rows = Seq.tabulate(1000) { i =>
      val c = centers(rnd.nextInt(25))
      (i.toLong, c.map(x => (x + sigma * rnd.nextGaussian()).toFloat).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val cb = graft.ops.Clustering.pqTrain(df, "vec_id", "embedding", 2, 4, 1)
    val prefix = "simspec_refine"
    Similarity.writePqIndex(df, "vec_id", "embedding", cb,
      nCells = Similarity.ivfCellsFor(1000, 4), prefix, buckets = 2,
      storeVectors = true)
    val probes = df.filter($"vec_id" % 20 === 0)
    def topk(out: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      out.select(col("probe_id").cast("long"), col("neighbor_id").cast("long"))
        .as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val truth = topk(Similarity.knn(probes, df, "vec_id", "embedding", 3))
    val codeOnly = topk(Similarity.searchPqIndex(
      probes, "vec_id", "embedding", prefix, 3, nProbe = 4))
    // the 2×4 codebook has only 16 distinct code combos, so ADC rank is
    // mostly tie-order — R must cover a real fraction of the ~64
    // candidates per probe for the exact re-rank to see the true top-3
    val refined = topk(Similarity.searchPqIndexRefined(
      probes, "vec_id", "embedding", prefix, 3, nProbe = 4, refineR = 30))
    def recallOf(m: Map[Long, Set[Long]]): Double = {
      val rs = truth.toSeq.map { case (p, t) =>
        m.get(p).map(a => (a & t).size.toDouble / t.size).getOrElse(0.0)
      }
      rs.sum / rs.size
    }
    val rCode = recallOf(codeOnly); val rRef = recallOf(refined)
    assert(rRef >= rCode, s"refined recall $rRef < code-only $rCode")
    // the ceiling is IVF candidate coverage (nProbe cells), not 1.0 — the
    // measured regime here is code-only ≈ 0.07 vs refined ≈ 0.67: the
    // re-rank recovers most of what the candidate set contains at all
    assert(rRef >= 0.6, s"refined recall@3 = $rRef vs code-only $rCode (clustered regime)")
    // on this coarse codebook the refine must BUY a large margin
    assert(rRef > rCode + 0.3, s"refine gained too little: $rCode -> $rRef")
    // join-based cell pruning (past maxCellLiterals) is result-identical
    // to the pushed-IN shape
    val refinedJoin = topk(Similarity.searchPqIndexRefined(
      probes, "vec_id", "embedding", prefix, 3, nProbe = 4, refineR = 30,
      maxCellLiterals = 0))
    assert(refinedJoin == refined, "semi-join pruning changed the refine answer")
  }

  test("searchPqIndexRefined fails fast without the refine store") {
    val df = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val cb = graft.ops.Clustering.pqTrain(df, "vec_id", "embedding", 2, 4, 1)
    Similarity.writePqIndex(df, "vec_id", "embedding", cb,
      nCells = 4, "simspec_novecs", buckets = 2) // storeVectors = false
    val ex = intercept[IllegalArgumentException] {
      Similarity.searchPqIndexRefined(
        df.limit(5), "vec_id", "embedding", "simspec_novecs", 3, refineR = 5)
    }
    assert(ex.getMessage.contains("storeVectors"), ex.getMessage)
  }

  test("semanticDedupPairs: precision 1; recall ≥ 0.2 home-cell, ≥ 0.6 at nProbe=4 (sf0.001)") {
    // Within-cell pairs must be a SUBSET of the brute-force cosine pairs at
    // the same threshold (exact same similarity expression — precision 1 by
    // construction, asserted as a regression tripwire), and the cell
    // partition must still surface a usable fraction of them.
    val sf = "/root/testdata/sf0.001"
    val emb = graft.Tables.t(spark, sf, "embeddings")
    def pairSet(df: org.apache.spark.sql.DataFrame, a: String, b: String) =
      df.select(col(a).cast("long"), col(b).cast("long")).as[(Long, Long)].collect().toSet
    val brute = pairSet(
      Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.4), "vec_a", "vec_b")
    assert(brute.nonEmpty)
    val home = pairSet(
      Similarity.semanticDedupPairs(emb, "vec_id", "embedding", 8, 0.4), "id_a", "id_b")
    val probed = pairSet(
      Similarity.semanticDedupPairs(emb, "vec_id", "embedding", 8, 0.4, nProbe = 4),
      "id_a", "id_b")
    assert(home.subsetOf(brute), s"false positives: ${home -- brute}")
    assert(probed.subsetOf(brute), s"false positives: ${probed -- brute}")
    assert(home.subsetOf(probed)) // probing only ADDS candidates
    val rHome   = home.size.toDouble / brute.size
    val rProbed = probed.size.toDouble / brute.size
    assert(rHome >= 0.2, s"home-cell recall = $rHome over ${brute.size} true pairs")
    assert(rProbed >= 0.6, s"nProbe=4 recall = $rProbed over ${brute.size} true pairs")
  }

  test("signLshBucket is deterministic and bounded") {
    val vecs = Seq((0L, Seq(0.3f, -0.2f, 0.9f))).toDF("vec_id", "embedding")
    val b1 = vecs.select(Similarity.signLshBucket($"embedding", 4, dim = 3)).as[Long].head()
    val b2 = vecs.select(Similarity.signLshBucket($"embedding", 4, dim = 3)).as[Long].head()
    assert(b1 == b2 && b1 >= 0 && b1 < 16)
  }

  test("pathological nCells refuses instead of collecting to the driver") {
    // the seed fetch is a driver-side collect bounded ONLY by nCells — a
    // miscalled cell count must throw before any job runs, naming the
    // ivfCellsFor geometry the argument should have come from
    val vecs = Seq((0L, Seq(0.1f, 0.2f)), (1L, Seq(0.3f, 0.4f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfAssign(vecs, "vec_id", "embedding",
        nCells = Similarity.MaxModelRows + 1)
    }
    assert(e.getMessage.contains("ivfCellsFor"))
    assert(e.getMessage.contains((Similarity.MaxModelRows + 1).toString))
  }

  test("ivfCellsFor balances assignment vs search at sqrt(n * nProbe)") {
    assert(Similarity.ivfCellsFor(0) == 8)
    assert(Similarity.ivfCellsFor(64) == 8)
    assert(Similarity.ivfCellsFor(10000) == 100)
    assert(Similarity.ivfCellsFor(1000000) == 1000)
    assert(Similarity.ivfCellsFor(10000, nProbe = 4) == 200)
  }

  test("annPlanesFor holds expected bucket occupancy <= target as n grows") {
    // the scaling contract: n / 2^planes <= targetBucket, with a floor of 3
    assert(Similarity.annPlanesFor(0) == 3)
    assert(Similarity.annPlanesFor(2000) == 3)
    assert(Similarity.annPlanesFor(20000) == 7)     // 20000/2^7 = 156 <= 250
    assert(Similarity.annPlanesFor(2000000) == 13)  // 2M/2^13 = 244 <= 250
    for (n <- Seq(1000L, 50000L, 1000000L, 100000000L)) {
      val k = Similarity.annPlanesFor(n)
      assert(n.toDouble / math.pow(2, k) <= 250.0, s"occupancy bound broken at n=$n")
      // and not overshooting: one plane fewer would break the bound (above the floor)
      if (k > 3) assert(n.toDouble / math.pow(2, k - 1) > 250.0, s"overshoot at n=$n")
    }
  }
}
