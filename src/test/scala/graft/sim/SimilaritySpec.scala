package graft.sim

import graft.SparkSpec
import graft.functions.VectorFns
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("vector math: dot/norm/cosine/l2 on known values") {
    val df = Seq((Seq(1.0, 2.0, 2.0), Seq(2.0, 0.0, 0.0))).toDF("a", "b")
    val row = df.select(
      VectorFns.dot(col("a"), col("b")).as("dot"),
      VectorFns.norm(col("a")).as("na"),
      VectorFns.cosine(col("a"), col("b")).as("cos"),
      VectorFns.l2Distance(col("a"), col("b")).as("l2")).collect().head
    assert(row.getDouble(0) === 2.0)
    assert(row.getDouble(1) === 3.0)
    assert(math.abs(row.getDouble(2) - 2.0 / (3.0 * 2.0)) < 1e-12)
    assert(math.abs(row.getDouble(3) - math.sqrt(1 + 4 + 4)) < 1e-12)
  }

  test("native VecDot/VecL2Sq ≡ the HOF constructions, bit for bit") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(300)((Seq.fill(16)(rnd.nextGaussian()),
      Seq.fill(16)(rnd.nextGaussian())))
    val df = rows.toDF("a", "b")
    val diff = df.select(
      VectorFns.dot(col("a"), col("b")).as("nd"),
      VectorFns.dotRelational(col("a"), col("b")).as("rd"),
      VectorFns.l2Distance(col("a"), col("b")).as("nl"),
      VectorFns.l2DistanceRelational(col("a"), col("b")).as("rl"))
      .as[(Double, Double, Double, Double)].collect()
    diff.foreach { case (nd, rd, nl, rl) =>
      assert(nd === rd, "dot must be bit-identical (same fold order)")
      assert(nl === rl, "l2 must be bit-identical")
    }
    // length mismatch → null (zip_with padding convention)
    val mism = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
      .select(VectorFns.dot(col("a"), col("b")).as("d"))
      .collect().head
    assert(mism.isNullAt(0))
    // a null ELEMENT also nulls the fold — the zip_with semantics the
    // SQL-registered graft_dot/graft_l2 surface keeps
    val withNull = Seq((Seq(Some(1.0), None), Seq(Some(1.0), Some(2.0))))
      .toDF("a", "b")
      .select(VectorFns.dot(col("a"), col("b")).as("d"),
        VectorFns.dotRelational(col("a"), col("b")).as("rd"),
        VectorFns.l2Distance(col("a"), col("b")).as("l"))
      .collect().head
    assert(withNull.isNullAt(0) && withNull.isNullAt(1) && withNull.isNullAt(2))
    // empty vectors → 0.0
    val empty = Seq((Seq.empty[Double], Seq.empty[Double])).toDF("a", "b")
      .select(VectorFns.dot(col("a"), col("b"))).as[Double].collect().head
    assert(empty === 0.0)
  }

  test("cosine of zero vector is 0, not NaN") {
    val df = Seq((Seq(0.0, 0.0), Seq(1.0, 1.0))).toDF("a", "b")
    assert(df.select(VectorFns.cosine(col("a"), col("b"))).as[Double].collect().head === 0.0)
  }

  // clustered synthetic corpus: 3 well-separated centers, 40 points each
  private def clustered = {
    val rnd = new scala.util.Random(7)
    val centers = Seq.fill(3)(Array.fill(16)(rnd.nextGaussian() * 10))
    val rows = for {
      (c, ci) <- centers.zipWithIndex
      i <- 0 until 40
    } yield ((ci * 40 + i).toLong, c.map(x => (x + rnd.nextGaussian() * 0.5).toFloat).toSeq)
    rows.toDF("vec_id", "embedding")
  }

  test("brute-force top-k: self is rank 1 with sim 1; all from same cluster") {
    val corpus = clustered
    val queries = corpus.where(col("vec_id") === 0 || col("vec_id") === 40)
    val out = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5)
    val rows = out.collect()
    assert(rows.length === 10)
    // rank is BIGINT now — topKPerKey's 1-based rn, not a window row_number
    val r1 = rows.filter(r => r.getAs[Long]("query_id") == 0L && r.getAs[Long]("rank") == 1L).head
    assert(r1.getAs[Long]("id") === 0L)
    assert(math.abs(r1.getAs[Double]("sim") - 1.0) < 1e-9)
    // top-5 of query 0 all lie in cluster 0 (ids < 40)
    assert(rows.filter(_.getAs[Long]("query_id") == 0L).forall(_.getAs[Long]("id") < 40))
  }

  test("pcaTopComponent: rank-1 cloud explains ~all variance on the right axis; isotropic splits") {
    // points t·(1, 2, 0, 0) — all variance on one axis, loading
    // dominated by coordinate 1 (the ×2 component), then 0
    val rank1 = (1 to 8).map(t =>
      (t.toLong, Seq(t.toFloat, 2f * t, 0f, 0f))).toDF("vec_id", "embedding")
    val r1 = Similarity.pcaTopComponent(rank1, "vec_id", "embedding")
      .collect().head
    assert(r1.getAs[Long]("n_vecs") === 8L)
    assert(r1.getAs[Long]("dim") === 4L)
    assert(r1.getAs[Long]("explained_ppm") >= 999000L)
    assert(r1.getAs[Long]("i1") === 1L)
    assert(r1.getAs[Long]("i2") === 0L)
    // isotropic 2-D cross: equal eigenvalues → Rayleigh = λ for ANY
    // direction, explained share exactly ~1/2
    val iso = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(-1f, 0f)),
      (3L, Seq(0f, 1f)), (4L, Seq(0f, -1f)))
      .toDF("vec_id", "embedding")
    val r2 = Similarity.pcaTopComponent(iso, "vec_id", "embedding")
      .collect().head
    val ppm = r2.getAs[Long]("explained_ppm")
    assert(ppm >= 490000L && ppm <= 500000L, s"ppm=$ppm")
  }

  test("matryoshkaRecall: full-dim slice is recall 1000; prefix-orthogonal case degrades exactly") {
    val corpus = clustered
    val queries = corpus.where(col("vec_id").isin(0L, 40L))
    val full = Similarity.matryoshkaRecall(corpus, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 5, dims = Seq(16))
      .collect()
    assert(full.length === 2)
    assert(full.forall(_.getAs[Long]("recall_x1000") === 1000L))
    // hand case where the 2-dim prefix loses information: full-dim
    // top-2 of q is {0 (self), 2}, but both prefixes collapse to the
    // same direction as q (cos = 1.0 ties) and the id tiebreak keeps
    // {0, 1} → exactly one hit of two → recall 500. The 4-dim slice
    // is the identity → recall 1000.
    val tiny = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)), // the query itself
      (1L, Seq(0.6f, 0f, 0.8f, 0f)), // full cos 0.6, prefix cos 1.0
      (2L, Seq(0.8f, 0f, 0.6f, 0f))) // full cos 0.8, prefix cos 1.0
      .toDF("vec_id", "embedding")
    val q = tiny.where(col("vec_id") === 0L)
    val out2 = Similarity.matryoshkaRecall(tiny, "vec_id", "embedding",
        q, "vec_id", "embedding", k = 2, dims = Seq(2, 4))
      .orderBy("trunc_dim").collect()
    assert(out2.length === 2)
    assert(out2.head.getAs[Long]("trunc_dim") === 2L)
    assert(out2.head.getAs[Long]("n_hits") === 1L)
    assert(out2.head.getAs[Long]("recall_x1000") === 500L)
    assert(out2(1).getAs[Long]("recall_x1000") === 1000L)
  }

  test("LSH top-k recall vs brute force on clustered data") {
    val corpus = clustered
    val queries = corpus.where(col("vec_id").isin(0L, 40L, 80L))
    val exact = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 10)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(corpus, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 10, dim = 16, numBits = 6)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"LSH recall $recall too low")
  }

  test("kNN self-join: neighbors come from the same cluster, never self") {
    val corpus = clustered
    val out = Similarity.knnSelfJoin(corpus, "vec_id", "embedding",
        k = 3, dim = 16, numBits = 6)
      .select("query_id", "id", "rank").as[(Long, Long, Long)].collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r._1 != r._2))          // self excluded
    assert(out.forall(r => r._3 >= 1L && r._3 <= 3L))
    // cluster purity: with 3 well-separated centers, a neighbor from a
    // different cluster means the join is broken (bucket sharing between
    // far clusters at 6 bits is possible but cosine ranking fixes it)
    val sameCluster = out.count(r => r._1 / 40 == r._2 / 40)
    assert(sameCluster.toDouble / out.length >= 0.9,
      s"cluster purity ${sameCluster.toDouble / out.length} too low")
    // every vector that surfaced as a query has at most k neighbors
    assert(out.groupBy(_._1).forall(_._2.length <= 3))
  }

  test("IVF top-k with corpus-sampled centroids finds cluster neighbors") {
    val corpus = clustered
    val centroids = corpus.where(col("vec_id").isin(5L, 45L, 85L))
      .select(VectorFns.toDouble(col("embedding"))).as[Seq[Double]]
      .collect().map(_.toArray).toSeq
    val queries = corpus.where(col("vec_id") === 0)
    val out = Similarity.ivfTopK(corpus, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5, centroids, nProbe = 1)
    val ids = out.select("id").as[Long].collect()
    assert(ids.length === 5)
    assert(ids.forall(_ < 40L)) // same cluster as query
  }

  test("k-means centroids: deterministic, and one lands near each true center") {
    val corpus = clustered
    val a = Similarity.kMeansCentroids(corpus, "vec_id", "embedding",
      k = 3, iters = 2, sampleN = 60)
    val b = Similarity.kMeansCentroids(corpus, "vec_id", "embedding",
      k = 3, iters = 2, sampleN = 60)
    assert(a.zip(b).forall { case (x, y) => x.sameElements(y) },
      "hash-deterministic sample + decimal sums must reproduce exactly")
    // every corpus cluster claims some centroid as its nearest (the 3
    // well-separated clusters can't all collapse onto one cell)
    val cells = corpus
      .select((col("vec_id") / 40).cast("int").as("truth"),
        Similarity.nearestCell(VectorFns.toDouble(col("embedding")), a).as("cell"))
      .distinct().as[(Int, Int)].collect()
    val byTruth = cells.groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).toSet }
    // each true cluster maps coherently: one dominant cell per cluster
    assert(byTruth.size === 3)
    assert(byTruth.values.forall(_.size === 1),
      s"clusters straddle IVF cells after Lloyd rounds: $byTruth")
    assert(byTruth.values.flatten.toSet.size === 3, "cells must separate the clusters")
  }

  test("IVF end-to-end from raw embeddings only (auto centroids)") {
    val corpus = clustered
    val queries = corpus.where(col("vec_id") === 0)
    val out = Similarity.ivfTopKAuto(corpus, "vec_id", "embedding",
      k = 5, numCells = 3, nProbe = 1, iters = 2, sampleN = 60,
      queries = queries, qIdCol = "vec_id", qVecCol = "embedding")
    val ids = out.select("id").as[Long].collect()
    assert(ids.length === 5)
    assert(ids.forall(_ < 40L), s"neighbors outside the query's cluster: ${ids.mkString(",")}")
  }

  // 8 distinct directions (4 axes ± ), pairwise cosine ∈ {0, -1}; ids
  // 10..17 duplicate 0..7 scaled ×2 (cosine is scale-invariant, so each
  // copy sits at cos 1 from its original).
  private def dupCorpus = {
    val axes = (0 until 8).map { i =>
      val v = Array.fill(4)(0.0f); v(i % 4) = if (i < 4) 1.0f else -1.0f; v
    }
    (axes.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) } ++
      axes.zipWithIndex.map { case (v, i) => (i + 10L, v.map(_ * 2.0f).toSeq) })
      .toDF("vec_id", "embedding")
  }

  test("SQ int8 quantization: codes in [-127,127], qdot tracks the whitened dot") {
    val corpus = clustered
    val scales = Similarity.sqScales(corpus, "embedding")
    assert(scales.length === 16)
    assert(scales.forall(_ > 0))
    val q = corpus.select(col("vec_id"),
      Similarity.sqQuantize(col("embedding"), scales).as("qe"),
      VectorFns.toDouble(col("embedding")).as("v"))
    // every code within the int8 grid
    val codes = q.select(explode(col("qe"))).as[Long].collect()
    assert(codes.forall(c => c >= -127 && c <= 127))
    // qdot ≈ 127² × whitened dot, within ±1 quantization error per
    // component on each side: |qdot − 127²·Σ(a/s)(b/s)| ≤ Σ(|qb|+127|a/s|+1)
    val a = q.where(col("vec_id") === 0).select(col("qe"), col("v"))
      .collect().head
    val b = q.where(col("vec_id") === 1).select(col("qe"), col("v"))
      .collect().head
    val (qa, va) = (a.getSeq[Long](0), a.getSeq[Double](1))
    val (qb, vb) = (b.getSeq[Long](0), b.getSeq[Double](1))
    val qdot = qa.zip(qb).map { case (x, y) => x * y }.sum
    val wdot = va.zip(vb).zip(scales).map { case ((x, y), s) =>
      (x / s) * (y / s) }.sum * 127.0 * 127.0
    val bound = qa.zip(vb.zip(scales)).map { case (x, (y, s)) =>
      math.abs(x) * 0 + 127 * math.abs(y / s) + math.abs(x) + 1.0 }.sum
    assert(math.abs(qdot - wdot) <= bound, s"qdot $qdot vs $wdot (±$bound)")
    // the Spark sqDot column agrees with the Scala fold
    val viaCol = q.where(col("vec_id") === 0).select(col("qe").as("qa"))
      .crossJoin(q.where(col("vec_id") === 1).select(col("qe").as("qb")))
      .select(Similarity.sqDot(col("qa"), col("qb"))).as[Long].collect().head
    assert(viaCol === qdot)
    // quantized ANN preserves cluster structure: top-10 by qdot for a
    // cluster-0 query are all cluster-0 members (ids < 40)
    val qv = q.where(col("vec_id") === 0).select(col("qe").as("qv"))
    val top = q.where(col("vec_id") =!= 0).crossJoin(broadcast(qv))
      .select(col("vec_id"), Similarity.sqDot(col("qe"), col("qv")).as("qd"))
      .orderBy(desc("qd"), col("vec_id")).limit(10)
      .select("vec_id").as[Long].collect()
    assert(top.forall(_ < 40), s"non-cluster neighbor in ${top.toSeq}")
  }

  test("semDedup drops the higher id of each near-dup pair, keeps uniques") {
    val out = Similarity.semDedup(dupCorpus, "vec_id", "embedding",
        threshold = 0.9, numCells = 2, iters = 1, sampleN = 8)
      .select("id", "kept").as[(Long, Boolean)].collect().toMap
    assert(out.size === 16)
    (0L until 8L).foreach { i =>
      assert(out(i), s"original $i must be kept")
      assert(!out(i + 10), s"duplicate ${i + 10} must be dropped")
    }
  }

  test("semDedup is unchanged under a tiny bucket cap (split path active)") {
    val default = Similarity.semDedup(dupCorpus, "vec_id", "embedding",
      threshold = 0.9, numCells = 2, iters = 1, sampleN = 8)
    val capped = Similarity.semDedup(dupCorpus, "vec_id", "embedding",
      threshold = 0.9, numCells = 2, iters = 1, sampleN = 8, bucketCap = 3)
    assert(default.exceptAll(capped).count() === 0)
    assert(capped.exceptAll(default).count() === 0)
  }

  test("recallAtK: hand-computed hit counts, zero-hit queries still emit rows") {
    import spark.implicits._
    val exact = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L), (3L, 30L), (3L, 31L))
      .toDF("query_id", "id")
    val ann = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 99L), (3L, 98L), (3L, 97L))
      .toDF("query_id", "id")
    val out = Similarity.recallAtK(ann, exact, k = 2).orderBy("query_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, 2L, 1000L), (2L, 1L, 500L), (3L, 0L, 0L)))
  }

  test("centroidDrift: identical groups give cdot² == nrm2_a·nrm2_b (cos = 1)") {
    import spark.implicits._
    // two groups with the SAME member vectors → identical centroids;
    // a third group orthogonal-ish
    val rows = (0L until 20L).flatMap { i =>
      val v = Seq.tabulate(8)(j => math.sin(i + j).toFloat)
      Seq((0, v), (1, v), (2, Seq.tabulate(8)(j => math.cos(3 * i + j).toFloat)))
    }
    val df = rows.toDF("label", "embedding")
    val out = Similarity.centroidDrift(df, "label", "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(4),
        r.getLong(5), r.getLong(6))).sortBy(p => (p._1, p._2))
    val p01 = out.find(p => p._1 == 0 && p._2 == 1).get
    assert(p01._3 * p01._3 === p01._4 * p01._5,
      s"equal centroids must have |cos| = 1 exactly: $p01")
    assert(p01._3 > 0)
    val p02 = out.find(p => p._1 == 0 && p._2 == 2).get
    assert(p02._3 * p02._3 < p02._4 * p02._5,
      "different centroids must have |cos| < 1")
  }

  test("centroidDrift is partition-invariant") {
    import spark.implicits._
    val rows = (0L until 60L).map(i =>
      ((i % 3).toInt, Seq.tabulate(6)(j => ((i * 7 + j) % 13 - 6).toFloat)))
    val df = rows.toDF("label", "embedding")
    val a = Similarity.centroidDrift(df, "label", "embedding")
      .orderBy("g_a", "g_b").collect()
    val b = Similarity.centroidDrift(df.repartition(11), "label", "embedding")
      .orderBy("g_a", "g_b").collect()
    assert(a.toSeq === b.toSeq)
    assert(a.length === 3)
  }

  test("hardNegatives never returns the query's own label and ranks hardest first") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val e = (0L until 80L).map(i =>
      (i, Seq.fill(8)(rnd.nextGaussian()), (i % 4).toInt))
      .toDF("id", "v", "lbl")
    val out = Similarity.hardNegatives(e, "id", "v", "lbl",
        e.where(col("id") < 4), "id", "v", "lbl", k = 5)
      .collect()
    assert(out.length === 20)
    val lblOf = e.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    out.foreach { r =>
      assert(lblOf(r.getLong(1)) !== lblOf(r.getLong(0)),
        s"negative ${r.getLong(1)} shares the query's label")
    }
    // ranks descend in similarity per query
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sims = rows.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("assignCells: every vector labeled with a cell in [0, k), deterministic") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val e = (0L until 100L).map(i => (i, Seq.fill(8)(rnd.nextGaussian())))
      .toDF("id", "v")
    val a = Similarity.assignCells(e, "id", "v", numCells = 4, iters = 1,
      sampleN = 32).orderBy("id").collect()
    assert(a.length === 100)
    a.foreach(r => assert(r.getInt(1) >= 0 && r.getInt(1) < 4))
    val b = Similarity.assignCells(e.repartition(9), "id", "v", 4, 1, 32)
      .orderBy("id").collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
  }

  test("recallAtK: LSH with full multi-probe reaches recall 1000 vs brute force") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val e = (0L until 120L).map(i => (i, Seq.fill(12)(rnd.nextGaussian())))
      .toDF("id", "v")
    val qs = e.where(col("id") < 3)
    val exact = Similarity.bruteForceTopK(e, "id", "v", qs, "id", "v", k = 4)
    // numBits=4 with 4-bit multi-probe = every bucket probed ⇒ the LSH
    // candidate set is the whole corpus ⇒ recall must be exactly 1000
    val ann = Similarity.lshTopK(e, "id", "v", qs, "id", "v",
      k = 4, dim = 12, numBits = 4, multiProbeBits = 4)
    val out = Similarity.recallAtK(ann, exact, k = 4)
    assert(out.count() === 3)
    assert(out.where(col("recall_x1000") =!= 1000L).count() === 0)
  }

  test("recallAtK of a method against itself is 1000 everywhere") {
    val rnd = new scala.util.Random(7)
    val e = (0L until 64L).map(i => (i, Seq.fill(8)(rnd.nextGaussian())))
      .toDF("id", "v")
    val qs = e.where(col("id") < 3)
    val exact = Similarity.bruteForceTopK(e, "id", "v", qs, "id", "v", k = 5)
    val out = Similarity.recallAtK(exact, exact, k = 5)
    assert(out.count() === 3)
    assert(out.where(col("recall_x1000") =!= 1000L).count() === 0)
  }

  test("native SortedIntersectCount ≡ size(array_intersect) on sorted distinct longs") {
    val rnd = new scala.util.Random(17)
    val rows = Seq.fill(300) {
      val a = Seq.fill(rnd.nextInt(30) + 1)(rnd.nextInt(40).toLong)
        .distinct.sorted
      val b = Seq.fill(rnd.nextInt(30) + 1)(rnd.nextInt(40).toLong)
        .distinct.sorted
      (a, b)
    }
    val out = rows.toDF("a", "b").select(
      graft.functions.SortedIntersectCount(col("a"), col("b")).as("k"),
      size(array_intersect(col("a"), col("b"))).cast("bigint").as("r"))
      .as[(Long, Long)].collect()
    out.foreach { case (k, r) => assert(k === r) }
    // empty / disjoint / identical edges
    val edges = Seq(
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(1L, 3L, 5L), Seq(2L, 4L, 6L)),
      (Seq(7L, 8L, 9L), Seq(7L, 8L, 9L))).toDF("a", "b")
      .select(graft.functions.SortedIntersectCount(col("a"), col("b")))
      .as[Long].collect()
    assert(edges.toSeq === Seq(0L, 0L, 3L))
  }

  test("rankEval: MRR and nDCG from hand-computed ranks") {
    // query 1: hits at ann ranks 1 and 3 of ground truth {10, 11, 12}
    //   first_hit_rank = 1, mrr = 1000
    //   dcg = g(1) + g(3); idcg(n_gt = 3) = g(1) + g(2) + g(3)
    // query 2: no hits -> all zeros, ndcg 0
    val ann = Seq(
      (1L, 10L, 1), (1L, 99L, 2), (1L, 11L, 3),
      (2L, 98L, 1), (2L, 97L, 2)).toDF("query_id", "id", "rank")
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 50L))
      .toDF("query_id", "id")
    val out = Similarity.rankEval(ann, exact, k = 5)
      .orderBy("query_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    def g(r: Int) = Similarity.dcgGainX1e6(r)
    val wantNdcg1 = 1000L * (g(1) + g(3)) / (g(1) + g(2) + g(3))
    assert(out.toSeq === Seq(
      (1L, 2L, 1L, 1000L, wantNdcg1),
      (2L, 0L, 0L, 0L, 0L)))
  }

  test("rankEval: perfect ranking scores ndcg 1000; late first hit halves MRR") {
    val ann = Seq((1L, 10L, 1), (1L, 11L, 2),
      (2L, 99L, 1), (2L, 20L, 2)).toDF("query_id", "id", "rank")
    val exact = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L))
      .toDF("query_id", "id")
    val out = Similarity.rankEval(ann, exact, k = 5)
      .orderBy("query_id").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    def g(r: Int) = Similarity.dcgGainX1e6(r)
    assert(out(0) === ((1L, 1000L, 1000L)))
    assert(out(1) === ((2L, 500L, 1000L * g(2) / (g(1) + g(2)))))
  }

  test("mapEval: AP from hand-computed precision@hit; no-hit query zero") {
    // query 1: hits at ranks 1 and 3, n_gt = 3
    //   AP = (P@1 + P@3) / 3 = (1e6 + 666666) / 3 = 555555
    // query 2: no hits -> 0
    val ann = Seq(
      (1L, 10L, 1), (1L, 99L, 2), (1L, 11L, 3),
      (2L, 98L, 1), (2L, 97L, 2)).toDF("query_id", "id", "rank")
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 50L))
      .toDF("query_id", "id")
    val out = Similarity.mapEval(ann, exact)
      .orderBy("query_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      (1L, 2L, (1000000L + (2L * 1000000L) / 3L) / 3L),
      (2L, 0L, 0L)))
  }

  test("mapEval: perfect front-loaded ranking scores 1e6") {
    val ann = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("query_id", "id", "rank")
    val exact = Seq((1L, 10L), (1L, 11L)).toDF("query_id", "id")
    val out = Similarity.mapEval(ann, exact).collect().head
    assert(out.getLong(2) === 1000000L)
  }

  test("silhouette: bit-equal Scala replay; separated clusters score high") {
    val pts = (0 until 20).map(i =>
      (i.toLong, Seq(100.0f + (i % 5), 3.0f + (i % 3)))) ++
      (20 until 40).map(i =>
        (i.toLong, Seq(-100.0f - (i % 5), -3.0f - (i % 3))))
    val df = pts.toDF("vec_id", "embedding")
    val out = Similarity.silhouette(df, "vec_id", "embedding",
        numCells = 2, iters = 2, sampleN = 32)
      .orderBy("cell").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    // replay from the same assignment + quantization math
    val scales = Similarity.sqScales(df, "embedding")
    val cells = Similarity.assignCells(df, "vec_id", "embedding",
        numCells = 2, iters = 2, sampleN = 32)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    def qv(v: Seq[Float]): Seq[Long] = v.zipWithIndex.map { case (x, i) =>
      if (scales(i) == 0.0) 0L
      else math.floor(x.toDouble * 127.0 / scales(i)).toLong
    }
    val byCell = pts.groupBy { case (id, _) => cells(id) }
    val cent = byCell.map { case (c, ps) =>
      val qs = ps.map(p => qv(p._2))
      val dim = qs.head.size
      c -> (0 until dim).map { i =>
        val s = qs.map(_(i)).sum; val n = qs.size
        if (s >= 0) s / n else -((-s) / n)
      }
    }
    def d2(a: Seq[Long], b: Seq[Long]) =
      a.zip(b).map { case (x, c) => (x - c) * (x - c) }.sum
    def sPpm(id: Long, v: Seq[Float]): Long = {
      val own = cells(id)
      val a2 = d2(qv(v), cent(own))
      val b2 = cent.filter(_._1 != own).map(c => d2(qv(v), c._2)).min
      val m = math.max(math.max(a2, b2), 1L)
      if (b2 >= a2) (1000000L * (b2 - a2)) / m
      else -((1000000L * (a2 - b2)) / m)
    }
    val want = byCell.map { case (c, ps) =>
      val ss = ps.map(p => sPpm(p._1, p._2))
      val sp = ss.sum
      (c, ps.size.toLong,
        if (sp >= 0) sp / ss.size else -((-sp) / ss.size))
    }.toSeq.sortBy(_._1)
    assert(out === want)
    // two far-apart clusters: every cell's mean silhouette is high
    assert(out.forall(_._3 > 900000L))
  }

  test("randomProjection: integer-exact against an off-plan recomputation") {
    val vecs = Seq(
      (1L, Seq(1.0f, -0.5f, 0.25f, 0.8f)),
      (2L, Seq(-1.0f, 0.5f, 0.0f, -0.8f)))
      .toDF("vec_id", "embedding")
    val scales = Similarity.sqScales(vecs, "embedding")
    val out = Similarity.randomProjection(vecs, "vec_id", "embedding",
        outDim = 3, scales)
      .orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // off-plan recomputation through the same hash family
    def sign(i: Int, j: Int): Long = {
      val h = graft.functions.HashFns.hash61Bytes(s"rp:$i:$j".getBytes("UTF-8"))
      1L - 2L * (((h % 2) + 2) % 2)
    }
    def quant(v: Seq[Float]): Seq[Long] = v.zipWithIndex.map { case (x, i) =>
      if (scales(i) == 0.0) 0L
      else math.floor(x.toDouble * 127.0 / scales(i)).toLong
    }
    val rows = Map(1L -> Seq(1.0f, -0.5f, 0.25f, 0.8f),
      2L -> Seq(-1.0f, 0.5f, 0.0f, -0.8f))
    rows.foreach { case (id, v) =>
      val q = quant(v)
      val want = (0 until 3).map(j => q.zipWithIndex.map {
        case (qi, i) => qi * sign(i, j) }.sum)
      assert(out(id) === want, s"vec $id")
    }
  }

  test("randomProjection is partition-invariant and opposite vectors project oppositely") {
    val vecs = (1L to 20L).map(i =>
      (i, (0 until 8).map(d => ((i * 7 + d * 3) % 11).toFloat / 11f - 0.4f)))
      .toDF("vec_id", "embedding")
    val scales = Similarity.sqScales(vecs, "embedding")
    val a = Similarity.randomProjection(vecs, "vec_id", "embedding", 4, scales)
      .orderBy("vec_id").collect().map(r => r.getSeq[Long](1)).toSeq
    val b = Similarity.randomProjection(vecs.repartition(7), "vec_id", "embedding", 4, scales)
      .orderBy("vec_id").collect().map(r => r.getSeq[Long](1)).toSeq
    assert(a === b)
    // linearity: rp(-v) = -rp(v) up to the int8 floor asymmetry
    val pair = Seq((1L, Seq(0.5f, -0.5f, 0.25f, -0.25f)),
      (2L, Seq(-0.5f, 0.5f, -0.25f, 0.25f))).toDF("vec_id", "embedding")
    val ps = Similarity.sqScales(pair, "embedding")
    val pr = Similarity.randomProjection(pair, "vec_id", "embedding", 4, ps)
      .orderBy("vec_id").collect().map(r => r.getSeq[Long](1))
    // floor(-x*127/s) = -ceil(x*127/s): each dim differs by at most 1,
    // so the 4-term sums differ from exact negation by at most 4
    pr(0).zip(pr(1)).foreach { case (x, y) =>
      assert(math.abs(x + y) <= 4, s"rp(-v) should approx -rp(v): $x vs $y")
    }
  }

  test("labelNoise: a mislabeled point inside a tight cluster is suspect") {
    // two well-separated clusters of 5; vector 2 sits in cluster A but
    // carries cluster B's label
    val rows = (0 until 5).map { i =>
      (i.toLong, Seq(1.0, 0.01 * i, 0.0, 0.0), if (i == 2) 1 else 0)
    } ++ (5 until 10).map { i =>
      (i.toLong, Seq(0.0, 0.0, 1.0, 0.01 * i), 1)
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val out = Similarity.labelNoise(df, "vec_id", "embedding", "label",
        k = 3, dim = 4, numBits = 4, multiProbeBits = 1)
      .orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3), r.getBoolean(5)))
      .toMap
    assert(out(2L)._1 === 1L)
    assert(out(2L)._3, "all of vec 2's neighbors carry label 0")
    // clean cluster-A points see at most the one mislabeled neighbor
    Seq(0L, 1L, 3L, 4L).foreach { id =>
      assert(!out(id)._3, s"vec $id must not be suspect: ${out(id)}")
      assert(out(id)._2 <= 1L)
    }
    Seq(5L, 6L, 7L, 8L, 9L).foreach { id =>
      assert(out(id) === ((1L, 0L, false)), s"cluster B is label-pure: $id")
    }
  }

  test("labelNoise is partition-invariant") {
    val df = spark.range(0, 60).selectExpr("id AS vec_id",
      "array(CAST(id % 7 AS DOUBLE) + 1.0, CAST(id % 3 AS DOUBLE), " +
        "CAST(id % 5 AS DOUBLE), 1.0) AS embedding",
      "CAST(id % 4 AS INT) AS label")
    val a = Similarity.labelNoise(df, "vec_id", "embedding", "label",
      k = 3, dim = 4, numBits = 4).orderBy("vec_id").collect()
    val b = Similarity.labelNoise(df.repartition(7), "vec_id", "embedding",
      "label", k = 3, dim = 4, numBits = 4).orderBy("vec_id").collect()
    assert(a.toSeq === b.toSeq && a.nonEmpty)
  }

  test("dbscan: core/border/noise roles on a hand-laid geometry (exact coverage)") {
    // numBits=1 with a 1-bit probe covers BOTH buckets — neighbor
    // search is exhaustive, so the ε-graph is pure geometry at
    // ε=0.995 ≈ cos 5.7°: the chain −4° ← 0° ← 4° ← 9° has edges at
    // 4°/4°/5°; the ±4° pair (8°) and 0°–9° (9°) fail; 90° is alone.
    // Degrees: 1↔{2,3}, 2↔{1,4} ⇒ cores {1,2}; CC merges them into
    // cluster 1; 3 and 4 are borders of their core neighbors; 5 noise
    def vec(thetaDeg: Double): Array[Float] = {
      val t = math.toRadians(thetaDeg)
      Array(math.cos(t).toFloat, math.sin(t).toFloat, 0f, 0f)
    }
    val emb = Seq((1L, vec(0)), (2L, vec(4)), (3L, vec(-4)),
      (4L, vec(9)), (5L, vec(90))).toDF("vec_id", "embedding")
    def run(d: org.apache.spark.sql.DataFrame) =
      Similarity.dbscan(d, "vec_id", "embedding", eps = 0.995, minPts = 2,
          dim = 4, numBits = 1, multiProbeBits = 1)
        .orderBy("vec_id").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1), r.getString(2)))
    val out = run(emb)
    assert(out.toSeq === Seq(
      (1L, 1L, "core"),
      (2L, 1L, "core"),
      (3L, 1L, "border"),
      (4L, 1L, "border"),
      (5L, -1L, "noise")))
    assert(out.toSeq === run(emb.repartition(4)).toSeq)
    // raising minPts to 3 demotes everything: no point has 3 neighbors
    val strict = Similarity.dbscan(emb, "vec_id", "embedding", eps = 0.995,
        minPts = 3, dim = 4, numBits = 1, multiProbeBits = 1)
      .collect()
    assert(strict.forall(r => r.getString(2) == "noise" && r.isNullAt(1)))
  }

  test("mmrSelect: greedy 7rel-3maxsim chain on hand-laid unit vectors") {
    import spark.implicits._
    // q = e_x. rels: c1=1.0, c2=0.8, c3=0.0, c4=0.28.
    // pick1 = c1 (rel 1). pick2 scores: c2 7(.8)-3(.8)=3.2,
    // c3 0-0=0, c4 7(.28)-3(.28)=1.12 -> c2.
    // pick3: c3 0-3·max(0,.6)=-1.8, c4 1.96-3·max(.28,.8)=-0.44 -> c4.
    val corpus = Seq(
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(0.8f, 0.6f, 0f, 0f)),
      (3L, Array(0f, 1f, 0f, 0f)),
      (4L, Array(0.28f, 0.96f, 0f, 0f))).toDF("id", "vec")
    val q = Seq((100L, Array(1f, 0f, 0f, 0f))).toDF("id", "vec")
    def run(c: org.apache.spark.sql.DataFrame) =
      Similarity.mmrSelect(c, "id", "vec", q, "id", "vec",
        kCand = 4, kSel = 3)
        .orderBy("pick").collect()
        .map(r => (r.getLong(1), r.getLong(2)))
    val out = run(corpus)
    assert(out.toSeq === Seq((1L, 1L), (2L, 2L), (3L, 4L)))
    assert(out.toSeq === run(corpus.repartition(5)).toSeq)
  }

  test("rrfFuse: hand-computed reciprocal contributions; doc in both lists rises") {
    import spark.implicits._
    val lex = Seq((0L, 10L, 1L), (0L, 11L, 2L)).toDF("query_id", "id", "rank")
    val den = Seq((0L, 11L, 1L), (0L, 12L, 2L)).toDF("query_id", "id", "rank")
    val out = Similarity.rrfFuse(Seq(lex, den))
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // 10^6//61 = 16393, 10^6//62 = 16129; doc 11 appears rank 2 + rank 1
    assert(out.toSeq === Seq(
      (0L, 11L, 2L, 16129L + 16393L, 1L),
      (0L, 10L, 1L, 16393L, 2L),
      (0L, 12L, 1L, 16129L, 3L)))
    // partition invariance
    val b = Similarity.rrfFuse(Seq(lex.repartition(5), den.repartition(3)))
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq === b.toSeq)
  }

  test("sourceOutliers ≡ a plain-Scala reference (differential)") {
    val rnd = new scala.util.Random(21)
    val emb = (0L until 30L).map(i =>
      (i, Seq.fill(6)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val docs = (0L until 30L).map(i => (i, s"src${i % 3}"))
      .toDF("doc_id", "source")
    def run(e: org.apache.spark.sql.DataFrame,
            d: org.apache.spark.sql.DataFrame) =
      Similarity.sourceOutliers(e, "vec_id", "embedding", d, "doc_id",
          "source", k = 3)
        .orderBy("source", "rank").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val out = run(emb, docs)

    // reference: same per-dim max-abs scales, same int8 floor
    // quantization, integer centroid sums, micro-rounded cosine,
    // lowest-3 by (cos, id)
    val raw = emb.collect().map(r => (r.getLong(0),
      r.getSeq[Float](1).map(_.toDouble).toArray)).toMap
    val dim = 6
    val scales = (0 until dim).map(p => raw.values.map(v => math.abs(v(p))).max)
    def quant(v: Array[Double]): Array[Long] =
      (0 until dim).map(p => if (scales(p) == 0) 0L
        else math.floor(v(p) * 127.0 / scales(p)).toLong).toArray
    val qs = raw.view.mapValues(quant).toMap
    val groups = (0L until 30L).groupBy(i => s"src${i % 3}")
    val expected = groups.toSeq.flatMap { case (g, ids) =>
      val cv = (0 until dim).map(p => ids.map(i => qs(i)(p)).sum).toArray
      val n2c = cv.map(x => x * x).sum
      val scoredRef = ids.map { i =>
        val q = qs(i)
        val d = (0 until dim).map(p => q(p) * cv(p)).sum
        val n2q = q.map(x => x * x).sum
        val cos = if (n2q == 0 || n2c == 0) 0L
          else math.round(d * 1000000.0 / (math.sqrt(n2q.toDouble) * math.sqrt(n2c.toDouble)))
        (i, cos)
      }
      scoredRef.sortBy { case (i, c) => (c, i) }.take(3).zipWithIndex
        .map { case ((i, c), r) => (g, (r + 1).toLong, i, c) }
    }.sortBy(t => (t._1, t._2))
    assert(out.toSeq === expected)
    assert(out.toSeq === run(emb.repartition(5), docs.repartition(3)).toSeq)
  }

  test("clusterLabels ≡ a plain-Scala labeler over the actual assignment") {
    val rnd = new scala.util.Random(13)
    val emb = (0L until 40L).map(i =>
      (i, Seq.fill(4)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val docs = (0L until 40L).map(i =>
      (i, s"common tok${i % 5} extra${i % 3}")).toDF("doc_id", "text")
    val out = Similarity.clusterLabels(emb, "vec_id", "embedding",
        docs, "doc_id", "text", numCells = 3, iters = 1, sampleN = 40,
        minDf = 2L, topK = 3)
      .orderBy("cell", "rank").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))

    // reference labeler over the SAME assignment (the assignment
    // itself is q79/q135 machinery, specced there)
    val asn = Similarity.assignCells(emb, "vec_id", "embedding",
        numCells = 3, iters = 1, sampleN = 40)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val docWords = (0L until 40L).map(i =>
      i -> s"common tok${i % 5} extra${i % 3}".split("\\s+").distinct.toSeq)
    val tagged = docWords.flatMap { case (id, ws) => ws.map(w => (asn(id), w)) }
    val dfIn = tagged.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val dfAll = tagged.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nc = asn.values.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nT = 40L
    val expected = dfIn.toSeq.collect {
      case ((cell, w), din) if din >= 2 =>
        val lift = BigInt(din) * nT * 1000000 / (BigInt(dfAll(w)) * nc(cell))
        (cell, w, din, lift.toLong)
    }.groupBy(_._1).toSeq.flatMap { case (cell, rows) =>
      rows.sortBy { case (_, w, din, lift) => (-lift, w, din) }.take(3)
        .zipWithIndex.map { case ((c, w, din, lift), i) =>
          (c, (i + 1).toLong, w, din, nc(c), lift) }
    }.sortBy(t => (t._1, t._2))
    assert(out.toSeq === expected)
    // partition invariance
    val out2 = Similarity.clusterLabels(emb.repartition(5), "vec_id",
        "embedding", docs.repartition(3), "doc_id", "text",
        numCells = 3, iters = 1, sampleN = 40, minDf = 2L, topK = 3)
      .orderBy("cell", "rank").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq === out2.toSeq)
  }

  test("marginMine ≡ a plain-Scala reference miner (differential)") {
    val rnd = new scala.util.Random(7)
    val dim = 8
    val vecs = (0L until 40L).map(i =>
      (i, Seq.fill(dim)(rnd.nextGaussian().toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    val k = 3
    val out = Similarity.marginMine(df, "vec_id", "embedding",
        maxQueryId = 12L, k = k)
      .orderBy("query_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))

    // reference: same split, same per-pair micro-rounded cosine, same
    // integer k-NN averages and ratio margin
    val dv = vecs.map { case (i, v) => (i, v.map(_.toDouble).toArray) }
    def cosU(a: Array[Double], b: Array[Double]): Long = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      math.round(1e6 * (if (na == 0 || nb == 0) 0.0 else dot / (na * nb)))
    }
    val aS = dv.filter(_._1 % 2 == 0)
    val bS = dv.filter(_._1 % 2 == 1)
    def topk(q: Array[Double], side: Seq[(Long, Array[Double])]) =
      side.map { case (i, v) => (i, cosU(v, q)) }
        .sortBy { case (i, c) => (-c, i) }.take(k)
    val expected = aS.filter(_._1 < 12L).map { case (qid, qv) =>
      val top = topk(qv, bS)
      val qAvg = top.map(_._2).sum / k
      val (mid, c) = top.head
      val mv = bS.find(_._1 == mid).get._2
      val mAvg = topk(mv, aS).map(_._2).sum / k
      val margin = 2L * c * 1000000L / math.max(qAvg + mAvg, 1L)
      (qid, mid, c, qAvg, mAvg, margin, margin > 1060000L)
    }
    assert(out.toSeq === expected.toSeq)
    // partition invariance
    val out2 = Similarity.marginMine(df.repartition(7), "vec_id",
        "embedding", maxQueryId = 12L, k = k)
      .orderBy("query_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))
    assert(out.toSeq === out2.toSeq)
  }

  test("chIndex: separated clusters score high, uniform noise low") {
    import spark.implicits._
    val hiC = Similarity.chIndex(clustered, "vec_id", "embedding",
      numCells = 3, iters = 2, sampleN = 60).collect().head
    // 3 tight, far-apart clusters: the partition explains almost all
    // variance — tiny within share, large CH
    assert(hiC.getAs[Long]("n_rows") === 120L)
    assert(hiC.getAs[Long]("n_cells") === 3L)
    assert(hiC.getAs[Long]("within_ppm") < 300000L)
    def mix(i: Long, j: Long): Long = {
      var x = i * 16 + j
      x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
      x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
      x ^= x >>> 33; x
    }
    val uni = (1L to 300L).map(i => (i, Array.tabulate(16)(d =>
      java.lang.Math.floorMod(mix(i, d.toLong), 120L).toFloat)))
      .toDF("vec_id", "embedding")
    val lo = Similarity.chIndex(uni, "vec_id", "embedding",
      numCells = 3, iters = 2, sampleN = 60).collect().head
    assert(lo.getAs[Long]("within_ppm") > 600000L)
    assert(hiC.getAs[Long]("ch_x1000") > lo.getAs[Long]("ch_x1000"))
    val lo2 = Similarity.chIndex(uni.repartition(7), "vec_id",
      "embedding", numCells = 3, iters = 2, sampleN = 60).collect().head
    assert(lo2.toSeq === lo.toSeq)
  }

  test("hopkins: clustered ≫ uniform, partition-invariant") {
    import spark.implicits._
    def mix(i: Long, j: Long): Long = {
      var x = i * 8 + j
      x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
      x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
      x ^= x >>> 33; x
    }
    // uniform 4-D cloud → H ≈ 1/2
    val uni = (1L to 300L).map(i => (i, Array.tabulate(4)(d =>
      java.lang.Math.floorMod(mix(i, d.toLong), 120L).toFloat)))
      .toDF("vec_id", "embedding")
    val hu = Similarity.hopkins(uni, "vec_id", "embedding", dim = 4,
      m = 20).collect().head.getAs[Long]("h_ppm")
    assert(hu > 300000L && hu < 700000L, s"uniform H=$hu not ~500000")
    // two tight far-apart clusters → probes land far from data → H → 1
    val clus = (1L to 300L).map { i =>
      val base = if (i % 2 == 0) 0L else 100L
      (i, Array.tabulate(4)(d =>
        (base + java.lang.Math.floorMod(mix(i, d.toLong), 3L)).toFloat))
    }.toDF("vec_id", "embedding")
    val hc = Similarity.hopkins(clus, "vec_id", "embedding", dim = 4,
      m = 20).collect().head.getAs[Long]("h_ppm")
    assert(hc > 800000L, s"clustered H=$hc not near 1e6")
    assert(hc > hu)
    val hu2 = Similarity.hopkins(uni.repartition(9), "vec_id",
      "embedding", dim = 4, m = 20).collect().head.getAs[Long]("h_ppm")
    assert(hu2 === hu)
  }

  test("intrinsicDimension: ~d on a d-dim cloud, partition-invariant") {
    import spark.implicits._
    // 400 pseudorandom points in a 4-D integer cube (components < 120
    // so int8 quantization barely distorts) — TwoNN should read ≈ 4.
    // Coordinates need REAL independent mixing (murmur-style
    // finalizer): a linear-congruential draw is quasi-regular, its
    // too-even NN spacing pushes every ratio toward 1 and the
    // estimate toward infinity
    def h(i: Long, j: Long): Float = {
      var x = i * 4 + j
      x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
      x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
      x ^= x >>> 33
      java.lang.Math.floorMod(x, 120L).toFloat
    }
    val pts = (1L to 400L).map(i =>
      (i, Array(h(i, 1), h(i, 2), h(i, 3), h(i, 4))))
    val df = pts.toDF("vec_id", "embedding")
    // numBits = 2: 4 buckets + 1-bit probes ≈ exhaustive neighbors —
    // the estimator needs TRUE 1st/2nd NNs; starving candidates
    // biases ratios toward 1 and inflates the reading
    val r = Similarity.intrinsicDimension(df, "vec_id", "embedding",
      dim = 4, numBits = 2).collect().head
    val id = r.getAs[Long]("id_x1000")
    assert(r.getAs[Long]("n_points") > 300L)
    assert(r.getAs[Long]("sum_e8") > 0L)
    assert(id > 2200L && id < 6800L, s"id_x1000=$id not ~4000")
    val r2 = Similarity.intrinsicDimension(df.repartition(7), "vec_id",
      "embedding", dim = 4, numBits = 2).collect().head
    assert(r2.getAs[Long]("id_x1000") === id)
  }

  test("dimAnova: separating dim reads high F/eta2, noise dim reads zero") {
    import spark.implicits._
    // dim 0 separates the labels perfectly; dim 1 is identical
    // within AND across labels (zero between-group variance)
    val df = Seq(
      (1L, Array(1.0f, 0.5f), "a"), (2L, Array(0.9f, -0.5f), "a"),
      (3L, Array(-1.0f, 0.5f), "b"), (4L, Array(-0.9f, -0.5f), "b"))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.dimAnova(df, "embedding", "label").collect()
      .map(r => r.getAs[Long]("dim") -> r).toMap
    assert(out.keySet === Set(0L, 1L))
    assert(out(0L).getAs[Long]("n_rows") === 4L)
    assert(out(0L).getAs[Long]("n_labels") === 2L)
    assert(out(0L).getAs[Long]("f_x1000") >
      out(1L).getAs[Long]("f_x1000"))
    // dim 0: within-group spread is tiny vs the ±1 separation
    assert(out(0L).getAs[Long]("eta2_ppm") > 900000L)
    // dim 1: the group means coincide -> SSB clamps to 0
    assert(out(1L).getAs[Long]("eta2_ppm") === 0L)
  }
}
