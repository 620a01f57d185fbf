package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.operators.Similarity
import graft.functions.VectorFunctions

/** ANN invariants on the real `embeddings` fixture (SURVEY.md §2.11):
  * brute force is the ground truth; LSH and IVF are graded by recall@k
  * against it — the property the DuckDB oracle can't see (seeded
  * hyperplanes are engine-private).
  */
class SimilaritySpec extends SparkSuite {
  import spark.implicits._

  private lazy val emb = Tables.load(spark, sfDir, "embeddings").cache()
  private lazy val queryVec: Seq[Double] =
    emb.filter($"vec_id" === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble)
  private lazy val base = emb.filter($"vec_id" =!= 0)

  private def topIds(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("vec_id").as[Long].collect().toSeq

  test("bruteForceTopK returns k rows, cosine in [-1,1], sorted desc") {
    val rows = Similarity.bruteForceTopK(base, queryVec, 10)
      .select($"vec_id", $"cos").as[(Long, Double)].collect()
    assert(rows.length === 10)
    assert(rows.forall { case (_, c) => c >= -1.0001 && c <= 1.0001 })
    assert(rows.map(_._2).toSeq === rows.map(_._2).sortBy(-_).toSeq)
  }

  test("cosine of a vector with itself is 1") {
    val c = emb.limit(5)
      .select(round(VectorFunctions.cosine($"embedding", $"embedding"), 6).as("c"))
      .as[Double].collect()
    assert(c.forall(_ === 1.0))
  }

  // Recall bounds are honest for THIS fixture: the embeddings are near-
  // uniform (max pairwise cos ≈ 0.5, labels uncorrelated with geometry), the
  // hardest regime for ANN. Deterministic (seeded planes), so stable.
  test("lshTopK(4 planes, radius 1) recall@10 >= 0.3 vs brute force") {
    val exact = topIds(Similarity.bruteForceTopK(base, queryVec, 10)).toSet
    val approx = topIds(Similarity.lshTopK(base, queryVec, 10, nPlanes = 4)).toSet
    val recall = (exact & approx).size / 10.0
    assert(recall >= 0.3, s"lsh recall $recall")
  }

  test("lshTopK recall grows with probe radius (multi-probe knob)") {
    val exact = topIds(Similarity.bruteForceTopK(base, queryVec, 10)).toSet
    def recallAt(r: Int) =
      (topIds(Similarity.lshTopK(base, queryVec, 10, nPlanes = 8, probeRadius = r)).toSet & exact).size
    val r1 = recallAt(1); val r3 = recallAt(3)
    assert(r3 >= r1, s"radius-3 recall $r3 < radius-1 recall $r1")
    assert(recallAt(8) === 10, "full-radius probe must equal brute force")
  }

  test("ivfTopK(nProbe=5) recall@10 >= 0.5 vs brute force") {
    val exact = topIds(Similarity.bruteForceTopK(base, queryVec, 10)).toSet
    val approx = topIds(Similarity.ivfTopK(base, queryVec, 10, nProbe = 5)).toSet
    val recall = (exact & approx).size / 10.0
    assert(recall >= 0.5, s"ivf recall $recall")
  }

  test("ivfTopK with all lists probed equals brute force exactly") {
    val exact = topIds(Similarity.bruteForceTopK(base, queryVec, 10))
    val all = topIds(Similarity.ivfTopK(base, queryVec, 10, nProbe = 10))
    assert(all === exact)
  }

  test("kmeansIvfTopK(nProbe=3) recall@10 >= 0.5; full probe equals brute force") {
    val exact = topIds(Similarity.bruteForceTopK(base, queryVec, 10))
    val approx = topIds(Similarity.kmeansIvfTopK(base, queryVec, 10,
      numClusters = 8, nProbe = 3)).toSet
    val recall = (exact.toSet & approx).size / 10.0
    assert(recall >= 0.5, s"kmeans-ivf recall $recall")
    val all = topIds(Similarity.kmeansIvfTopK(base, queryVec, 10,
      numClusters = 8, nProbe = 8))
    assert(all === exact, "probing every learned list must equal brute force")
  }

  test("lloydIvfTopK(nProbe=3) recall@10 >= 0.5; full probe equals brute force") {
    val exact = topIds(Similarity.bruteForceTopK(base, queryVec, 10))
    val approx = topIds(Similarity.lloydIvfTopK(base, queryVec, 10,
      numClusters = 8, nProbe = 3)).toSet
    val recall = (exact.toSet & approx).size / 10.0
    assert(recall >= 0.5, s"lloyd-ivf recall $recall")
    val all = topIds(Similarity.lloydIvfTopK(base, queryVec, 10,
      numClusters = 8, nProbe = 8))
    assert(all === exact, "probing every learned list must equal brute force")
  }

  test("ivfPqTopK(nProbe=3) recall@10 >= 0.5; full probe + full rerank equals brute force") {
    val exact = topIds(Similarity.bruteForceTopK(base, queryVec, 10))
    val approx = topIds(Similarity.ivfPqTopK(base, queryVec, 10))
    val recall = approx.toSet.intersect(exact.toSet).size / 10.0
    assert(recall >= 0.5, s"ivf-pq recall $recall")
    // probe every list and re-rank every candidate: the PQ layer only
    // ORDERS the candidate cut, so the exact re-rank must recover the
    // brute-force answer precisely
    val n = base.count().toInt
    val all = topIds(Similarity.ivfPqTopK(base, queryVec, 10,
      nProbe = 8, rerankC = n))
    assert(all === exact,
      "full probe + full rerank must equal brute force")
  }

  test("ivfPqTopK ADC is monotone-consistent: widening rerankC never hurts recall") {
    val exact = topIds(Similarity.bruteForceTopK(base, queryVec, 10)).toSet
    val r50 = topIds(Similarity.ivfPqTopK(base, queryVec, 10, rerankC = 50))
      .toSet.intersect(exact).size
    val r200 = topIds(Similarity.ivfPqTopK(base, queryVec, 10, rerankC = 200))
      .toSet.intersect(exact).size
    assert(r200 >= r50, s"rerankC=200 recall $r200 < rerankC=50 recall $r50")
  }

  test("lloydIvfTopK is deterministic across invocations (no seed anywhere)") {
    val a = topIds(Similarity.lloydIvfTopK(base, queryVec, 10))
    val b = topIds(Similarity.lloydIvfTopK(base, queryVec, 10))
    assert(a === b)
  }

  test("pqTrainEncodeLloyd: deterministic codes in range, reconstruction beats random") {
    val enc = Similarity.pqTrainEncodeLloyd(emb)
    val rows = enc.collect()
    assert(rows.length === emb.count())
    rows.foreach { r =>
      val codes = r.getSeq[Int](1)
      assert(codes.length === 4 && codes.forall(c => c >= 0 && c < 16))
      assert(r.getDouble(2) >= 0.0)
    }
    // no seed anywhere → identical across invocations
    val again = Similarity.pqTrainEncodeLloyd(emb).collect()
    assert(rows.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("centroids: one row per label, 64-dim, matches manual mean on one dim") {
    val c = Similarity.centroids(emb).collect()
    assert(c.length === emb.select("label").distinct().count().toInt)
    assert(c.forall(_.getSeq[Double](1).length === 64))
    val label0dim0 = Similarity.centroids(emb)
      .filter($"cluster" === 0)
      .select(element_at($"centroid", 1)).as[Double].head()
    val manual = emb.filter($"label" === 0)
      .select(avg(element_at($"embedding", 1).cast("double"))).as[Double].head()
    assert(math.abs(label0dim0 - manual) < 1e-9)
  }

  test("knnJoin returns at most k neighbors per query, no self matches") {
    val q = emb.filter($"vec_id" < 5)
    val r = Similarity.knnJoin(emb, q, k = 3)
    val perQuery = r.groupBy("q_id").agg(count(lit(1)).as("n"))
      .select("n").as[Long].collect()
    assert(perQuery.forall(_ <= 3))
    assert(r.filter($"q_id" === $"nn_id").count() === 0)
  }

  test("PQ codes are bounded and reconstruction error shrinks with codebook size") {
    val coarse = Similarity.pqTrainEncode(base, k = 2)
    val fine = Similarity.pqTrainEncode(base, k = 16)
    val codes = fine.select(explode($"codes")).as[Int].collect()
    assert(codes.forall(c => c >= 0 && c < 16))
    assert(fine.select($"codes").as[Seq[Int]].head().length === 4)
    val mseCoarse = coarse.agg(avg($"mse")).as[Double].head()
    val mseFine = fine.agg(avg($"mse")).as[Double].head()
    assert(mseFine > 0.0)
    assert(mseFine < mseCoarse,
      s"16-code MSE $mseFine not below 2-code MSE $mseCoarse")
  }

  test("matryoshkaRecall: full width is exact; a misleading tail drops prefix recall") {
    // 8-dim vectors whose FIRST 4 dims rank id 1 closest to the query but
    // whose tail flips the true winner to id 2 — the 4-dim prefix must
    // miss at least the order the full width finds
    val q = Seq(1.0, 0, 0, 0, 1, 1, 1, 1)
    val vecs = Seq(
      (1L, Array(1f, 0f, 0f, 0f, -1f, -1f, -1f, -1f)), // great head, bad tail
      (2L, Array(0.9f, 0.1f, 0f, 0f, 1f, 1f, 1f, 1f)), // true winner
      (3L, Array(0f, 1f, 0f, 0f, 0f, 0f, 1f, 0f)),
      (4L, Array(0f, 0f, 1f, 0f, 1f, 0f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val r = Similarity.matryoshkaRecall(vecs, q, k = 2, dims = Seq(4, 8))
      .collect().map(x => x.getInt(0) -> (x.getLong(1), x.getDouble(2)))
      .toMap
    assert(r(8) === ((2L, 1.0))) // the reference set always matches itself
    assert(r(4)._1 <= 2L && r(4)._2 <= 1.0)
    // top-2 at width 4 is {1,2}; at width 8 it's {2,4} → overlap 1
    assert(r(4) === ((1L, 0.5)))
  }

  test("probeBuckets yields nPlanes+1 distinct buckets") {
    val buckets = spark.range(1)
      .select(Similarity.probeBuckets(lit(5L), 8).as("b"))
      .as[Seq[Long]].head()
    assert(buckets.length === 9)
    assert(buckets.distinct.length === 9)
    assert(buckets.head === 5L)
  }

  test("powerIteration recovers the dominant direction, unit norm, fixed sign") {
    // corpus dominated by ±e1 with small noise on e2: the top singular
    // direction of X is e1; the sign convention must make it +e1 even
    // though half the rows point the other way
    val rows = (1 to 16).map { i =>
      val s = if (i % 2 == 0) 1.0f else -1.0f
      Tuple1(Seq(10.0f * s, 0.1f * (i % 3), 0.0f, 0.0f))
    }
    val df = rows.toDF("embedding")
    val v = Similarity.powerIteration(df, "embedding", dim = 4, iters = 3)
    assert(v.length === 4)
    assert(v(0) > 0.99, s"dominant loading not recovered: ${v.toSeq}")
    assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-4)
    // deterministic across invocations (no randomness anywhere)
    val v2 = Similarity.powerIteration(df, "embedding", dim = 4, iters = 3)
    assert(v.toSeq === v2.toSeq)
  }

  test("powerIterationDeflated: orthogonal to v1, unit norm, finds dim 2") {
    val rows = (1 to 16).map { i =>
      val s = if (i % 2 == 0) 1.0f else -1.0f
      // dominant ±e1 axis, secondary signal on e2, nothing on e3/e4
      Tuple1(Seq(10.0f * s, 2.0f * (if (i % 4 < 2) 1 else -1), 0.0f, 0.0f))
    }
    val df = rows.toDF("embedding")
    val v1 = Similarity.powerIteration(df, "embedding", dim = 4, iters = 3)
    val w = Similarity.powerIterationDeflated(df, "embedding", dim = 4,
      iters = 3, scale = 6, v1 = v1)
    assert(math.abs(math.sqrt(w.map(x => x * x).sum) - 1.0) < 1e-4)
    val dot = v1.zip(w).map { case (a, b) => a * b }.sum
    assert(math.abs(dot) < 1e-3, s"not orthogonal: dot=$dot")
    assert(math.abs(w(1)) > 0.99, s"second axis not recovered: ${w.toSeq}")
  }

  test("autoPlanes: occupancy formula, exact powers, floor of 1") {
    // the declared-fixture identities the inlined-constant oracles rely on
    assert(Similarity.autoPlanes(500, 32) === 4)
    assert(Similarity.autoPlanes(2000, 32) === 6)
    assert(Similarity.autoPlanes(500, 2) === 8)
    // exact powers of two must not round up through FP log slack
    assert(Similarity.autoPlanes(1024, 64) === 4)
    assert(Similarity.autoPlanes(2048, 2) === 10)
    // degenerate corpora floor at one plane
    assert(Similarity.autoPlanes(1, 64) === 1)
    assert(Similarity.autoPlanes(0, 8) === 1)
    // occupancy stays constant: +1 plane per doubling
    assert(Similarity.autoPlanes(4000, 32) === Similarity.autoPlanes(2000, 32) + 1)
  }

  test("knnJoin auto-planes equals the explicitly-planed run at the derived count") {
    val n = base.count()
    val np = Similarity.autoPlanes(n, 2)
    val auto = Similarity.knnJoin(base, base.limit(20), k = 3)
      .select("q_id", "nn_id", "rank").as[(Long, Long, Int)].collect().toSet
    val explicit = Similarity.knnJoin(base, base.limit(20), k = 3, nPlanes = np)
      .select("q_id", "nn_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(auto === explicit)
  }

  test("mutualKnn keeps reciprocal pairs and drops one-way neighbors") {
    // k=1 on three 2-d points: v1 and v2 are each other's nearest
    // (mutual); v3's nearest is v2, but v2's nearest is v1 — one-way,
    // so (2,3) must NOT survive the reciprocity filter
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.99f, 0.14f)),
      (3L, Array(0.5f, 0.87f))).toDF("vec_id", "embedding")
    // nPlanes=1 → the Hamming-1 probe covers BOTH half-spaces: full
    // recall, so the test exercises reciprocity, not LSH luck
    val r = Similarity.mutualKnn(vecs, k = 1, dim = 2, nPlanes = 1)
      .select("id_a", "id_b", "rank_ab", "rank_ba")
      .as[(Long, Long, Int, Int)].collect().toSet
    assert(r === Set((1L, 2L, 1, 1)))
    // at k=2 every pair of the triangle is reciprocal
    val r2 = Similarity.mutualKnn(vecs, k = 2, dim = 2, nPlanes = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(r2 === Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("pqTrainEncodeLloyd handles a corpus smaller than the codebook size") {
    // 5 vectors, k=16: the trainer must bound every loop by the book it
    // could actually fill, not the requested k
    val tiny = base.limit(5)
    val r = Similarity.pqTrainEncodeLloyd(tiny, k = 16, sampleN = 5).collect()
    assert(r.length === 5)
    assert(r.forall(_.getAs[Double]("mse") >= 0.0))
  }

}
