package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *   - [[bruteForceTopK]] — exact cosine top-k: one narrow map + a
  *     TakeOrderedAndProject. The correctness baseline; also the right
  *     answer whenever k·partitions ≪ n (Spark's top-k never sorts
  *     globally — each partition keeps k, the driver merges).
  *   - [[lshTopK]] — random-hyperplane LSH: buckets shrink the scan by
  *     2^planes with multi-probe (Hamming-1 neighbors) recall recovery.
  *     The scale path: the probe becomes a semi-join on bucket keys.
  *   - [[ivfTopK]] — IVF: coarse k-means-style centroids (here: per-label
  *     means, i.e. one Lloyd step from labeled data), probe the nProbe
  *     nearest inverted lists only.
  */
object Similarity {

  /** Plane count for a corpus of `n` vectors at a target EXPECTED bucket
    * occupancy: nPlanes = ceil(log2(n / targetOccupancy)). Fixed planes
    * are the recurring scale trap of sign-LSH — occupancy (and so the
    * per-bucket quadratic candidate budget) grows linearly with the
    * corpus — so the bucketed operators derive planes from corpus size
    * at build time and keep occupancy constant: candidates stay
    * ~n·occupancy/2 at any scale. The ε guards exact powers of two
    * against FP log slack; the floor of 1 keeps degenerate corpora sane.
    */
  def autoPlanes(n: Long, targetOccupancy: Int): Int = {
    val ratio = math.max(n, 1L).toDouble / targetOccupancy
    math.max(1, math.ceil(math.log(ratio) / math.log(2.0) - 1e-9).toInt)
  }

  /** Deterministic pseudo-random unit-free hyperplanes (fixed seed). */
  def hyperplanes(dim: Int, nPlanes: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** LSH bucket id: sign bit per hyperplane, packed into a long. */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(vec, vecLit(p)) >= 0.0, shiftleft(lit(1L), i)).otherwise(0L)
    }.reduce((a, b) => a.bitwiseOR(b))

  /** All Hamming-1 neighbors of a bucket id (multi-probe). */
  def probeBuckets(bucket: Column, nPlanes: Int): Column =
    array((bucket +: (0 until nPlanes).map(i => bucket.bitwiseXOR(shiftleft(lit(1L), i)))): _*)

  /** Driver-side probe set up to a Hamming radius (recall/scan-cost knob:
    * radius r scans C(nPlanes, ≤r)/2^nPlanes of the space).
    */
  def probeSet(qb: Long, nPlanes: Int, radius: Int): Seq[Long] = {
    def flips(bits: Seq[Int]): Long = bits.foldLeft(qb)((b, i) => b ^ (1L << i))
    (0 to radius).flatMap(r =>
      (0 until nPlanes).combinations(r).map(c => flips(c))).distinct
  }

  /** Exact cosine top-k against a query vector. */
  def bruteForceTopK(
      emb: DataFrame, queryVec: Seq[Double], k: Int,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    graft.plans.GraftFunctions.register(emb.sparkSession)
    emb.select(
        col(idCol),
        round(cosine(col(vecCol), vecLit(queryVec)), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Matryoshka prefix-dimension retrieval evaluation (Kusupati et al.
    * 2022): rank by cosine over the first `d` dimensions for each d in
    * `dims`, and report recall@k of each prefix against the full-width
    * ranking. This is the acceptance gate for serving truncated
    * embeddings — a prefix whose recall holds lets the ANN index store
    * d/full of the bytes.
    *
    * Scale shape: ONE scan computes every prefix cosine (the dims list
    * rides an explode, so a vector is read once); ranking per prefix is
    * a window keyed on the prefix width. Run it on a sampled eval slice
    * — per-prefix ranking shuffles (n·|dims|) skinny rows, the right
    * cost for an evaluation harness, not a serving path (that is
    * [[lshTopK]]/[[ivfTopK]]). Ties rank on the ROUNDED cosine then id,
    * so the order is reproducible across engines.
    */
  def matryoshkaRecall(
      emb: DataFrame, queryVec: Seq[Double], k: Int, dims: Seq[Int],
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.plans.GraftFunctions.register(emb.sparkSession)
    val full = dims.max
    val scored = emb.select(col(idCol), col(vecCol),
        explode(lit(dims.toArray)).as("dim"))
      .select(col(idCol), col("dim"),
        round(cosine(slice(col(vecCol), lit(1), col("dim")),
          slice(vecLit(queryVec), lit(1), col("dim"))), 6).as("cos"))
    val w = Window.partitionBy("dim").orderBy(col("cos").desc, col(idCol))
    val top = scored.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
    // the k full-width winners are the reference set — k rows, broadcast
    val fullTop = top.filter(col("dim") === full)
      .select(col(idCol).as("_fid"))
    top.join(broadcast(fullTop), col(idCol) === col("_fid"), "left")
      .groupBy("dim")
      .agg(sum(when(col("_fid").isNotNull, 1L).otherwise(0L)).as("n_overlap"))
      .select(col("dim"), col("n_overlap"),
        round(col("n_overlap") / lit(k.toDouble), 2).as("recall"))
      .orderBy("dim")
  }

  /** Driver-side bucket id of a query vector (same formula as
    * [[lshBucket]], plain Scala).
    */
  def bucketOf(queryVec: Seq[Double], planes: Seq[Seq[Double]]): Long =
    planes.zipWithIndex.map { case (p, i) =>
      val d = p.zip(queryVec).map { case (a, b) => a * b }.sum
      if (d >= 0.0) 1L << i else 0L
    }.reduce(_ | _)

  /** Persist an LSH-bucketed embedding INDEX: Hive-partitioned by bucket
    * id, one file per bucket directory (the repartition keys every bucket
    * into exactly one task — no small-file spray). This is the layout half
    * of ANN at 100 TB: a probe read then prunes DIRECTORIES, so candidate
    * I/O is probes/2^nPlanes of the index instead of a full scan that
    * filters rows after decoding them.
    */
  def writeLshIndex(
      emb: DataFrame, path: String,
      dim: Int = 64, nPlanes: Int = 8, seed: Long = 42L,
      vecCol: String = "embedding"): Unit = {
    val planes = hyperplanes(dim, nPlanes, seed)
    emb.withColumn("_bucket", lshBucket(col(vecCol), planes))
      .repartition(col("_bucket"))
      .write.mode("overwrite").partitionBy("_bucket").parquet(path)
  }

  /** [[lshTopK]] over a persisted [[writeLshIndex]] layout: the probe set
    * becomes partition pruning (`PartitionFilters` on `_bucket`) — only
    * the probe directories' files are opened (plan-pinned in
    * PlanQualitySpec).
    */
  def lshTopKIndexed(
      spark: org.apache.spark.sql.SparkSession, path: String,
      queryVec: Seq[Double], k: Int,
      dim: Int = 64, nPlanes: Int = 8, seed: Long = 42L,
      probeRadius: Int = 1,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    graft.plans.GraftFunctions.register(spark)
    val planes = hyperplanes(dim, nPlanes, seed)
    val probes = probeSet(bucketOf(queryVec, planes), nPlanes, probeRadius)
    spark.read.parquet(path)
      .filter(col("_bucket").isin(probes: _*))
      .select(col(idCol), round(cosine(col(vecCol), vecLit(queryVec)), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** ANN top-k: restrict the scan to the query's LSH bucket and its
    * Hamming-1 probes, then exact-rank inside the candidate set.
    */
  def lshTopK(
      emb: DataFrame, queryVec: Seq[Double], k: Int,
      dim: Int = 64, nPlanes: Int = 8, seed: Long = 42L,
      probeRadius: Int = 1,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    graft.plans.GraftFunctions.register(emb.sparkSession)
    val planes = hyperplanes(dim, nPlanes, seed)
    // query bucket computed driver-side (same formula, plain Scala)
    val probes = probeSet(bucketOf(queryVec, planes), nPlanes, probeRadius)
    emb
      .withColumn("_bucket", lshBucket(col(vecCol), planes))
      .filter(col("_bucket").isin(probes: _*))
      .select(col(idCol), round(cosine(col(vecCol), vecLit(queryVec)), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Per-dimension mean vectors by a coarse-partition column (inverted-file
    * centroids). posexplode → groupBy(cluster, dim) → avg → re-assemble.
    * One shuffle keyed by (cluster, dim) — fully parallel at any scale.
    */
  def centroids(
      emb: DataFrame, clusterCol: String = "label",
      vecCol: String = "embedding"): DataFrame =
    emb.select(col(clusterCol).as("cluster"), posexplode(col(vecCol)).as(Seq("dim", "x")))
      .groupBy(col("cluster"), col("dim"))
      .agg(avg(col("x")).as("mean"))
      .groupBy(col("cluster"))
      .agg(array_sort(collect_list(struct(col("dim"), col("mean")))).as("pairs"))
      .select(col("cluster"), transform(col("pairs"), p => p.getField("mean")).as("centroid"))

  /** Dominant principal direction of the (uncentered) Gram matrix XᵀX by
    * fixed-round power iteration, computed as two DISTRIBUTED passes per
    * round — s = X·v (per-row dot product, map-only) then u = Xᵀ·s (a
    * d-sized keyed aggregation of per-row x·s contributions) — so the
    * d×d covariance is never materialized and nothing larger than one
    * d-vector ever reaches the driver (the same k-sized-model contract
    * as the Lloyd/PQ trainers above). Inputs and the iterate are
    * rounded to `scale` decimals each round so an independent engine
    * (the DuckDB oracle) can replay the arithmetic bit-for-bit; the sign
    * ambiguity of an eigenvector is fixed by making the largest-|loading|
    * component (smallest dim on ties) positive.
    */
  def powerIteration(emb: DataFrame, vecCol: String = "embedding",
      dim: Int = 64, iters: Int = 3, scale: Int = 6): Array[Double] =
    powerIterationImpl(emb, vecCol, dim, iters, scale, None)

  /** The SECOND principal direction by deflation: the same two
    * distributed passes per round, with a Gram–Schmidt projection
    * against `v1` applied to the d-vector on the driver each round
    * (u ← u − (v1·u)·v1, the projection coefficient rounded like every
    * other iterate so the oracle replays it). Chaining k deflations
    * yields a top-k basis without ever materializing a covariance.
    */
  def powerIterationDeflated(emb: DataFrame, vecCol: String, dim: Int,
      iters: Int, scale: Int, v1: Array[Double]): Array[Double] =
    powerIterationImpl(emb, vecCol, dim, iters, scale, Some(v1))

  private def powerIterationImpl(emb: DataFrame, vecCol: String, dim: Int,
      iters: Int, scale: Int, orthoTo: Option[Array[Double]]): Array[Double] = {
    def rnd(x: Double) = BigDecimal(x)
      .setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble
    val base = emb
      .select(transform(col(vecCol), c => round(c.cast("double"), scale)).as("x"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var v: Array[Double] = Array.fill(dim)(rnd(1.0 / math.sqrt(dim.toDouble)))
      for (_ <- 1 to iters) {
        val vLit = array(v.map(lit).toIndexedSeq: _*)
        val dot = aggregate(zip_with(col("x"), vLit, (a, b) => a * b),
          lit(0.0), (acc, e) => acc + e)
        val u0 = base.withColumn("s", round(dot, scale))
          .select(posexplode(col("x")).as(Seq("dim0", "xi")), col("s"))
          .groupBy("dim0").agg(sum(col("xi") * col("s")).as("u"))
          .orderBy("dim0").collect().map(_.getDouble(1))
        val u = orthoTo match {
          case Some(w) =>
            val coef = rnd(u0.zip(w).map { case (a, b) => a * b }.sum)
            u0.zip(w).map { case (ui, wi) => ui - coef * wi }
          case None => u0
        }
        val norm = math.sqrt(u.map(t => t * t).sum)
        v = u.map(t => rnd(t / norm))
      }
      val lead = v.indices.maxBy(i => (math.abs(v(i)), -i))
      val signed = if (v(lead) < 0) v.map(t => -t) else v
      signed.map(t => if (t == 0.0) 0.0 else t)
    } finally { base.unpersist(blocking = false); () }
  }

  /** IVF ANN top-k: rank centroids against the query driver-side is not
    * needed — do it in-plan: pick the nProbe nearest inverted lists, then
    * exact-rank only rows in those lists. Two narrow joins, one broadcast.
    */
  def ivfTopK(
      emb: DataFrame, queryVec: Seq[Double], k: Int, nProbe: Int = 2,
      clusterCol: String = "label", vecCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    graft.plans.GraftFunctions.register(emb.sparkSession)
    val cents = centroids(emb, clusterCol, vecCol)
    val near = cents
      .select(col("cluster"), cosine(col("centroid"), vecLit(queryVec)).as("ccos"))
      .orderBy(col("ccos").desc, col("cluster"))
      .limit(nProbe)
    emb.join(broadcast(near), emb(clusterCol) === near("cluster"), "left_semi")
      .select(col(idCol), round(cosine(col(vecCol), vecLit(queryVec)), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** IVF with DETERMINISTIC learned centroids: plain Lloyd iterations with
    * a fixed init (the vectors of the `numClusters` smallest ids) and a
    * total-order tie-break (lowest cluster wins equal distances) — every
    * step is a pure function of the data, so an independent SQL engine
    * reproduces the trained index exactly, unrolled round by round. The
    * engine-reproducible twin of [[kmeansIvfTopK]] (MLlib's seeded init).
    *
    * Scale shape: the model state (numClusters × dim doubles) rides the
    * driver↔executor boundary each round — the standard broadcast-model
    * training loop; assignment is a codegen'd argmin over centroid
    * literals (array_min over (distance, cluster) structs — struct
    * ordering IS the tie-break), and the mean update is one
    * (cluster, dim)-keyed aggregation.
    */
  /** Deterministic-Lloyd coarse-centroid training: fixed init (the
    * `numClusters` smallest-id vectors), argmin assignment with a
    * lowest-cluster tie-break, one (cluster, dim)-keyed mean aggregation
    * per round, emptied clusters keep their previous centroid. Shared by
    * [[lloydIvfTopK]] and [[ivfPqTopK]]; the model state (numClusters ×
    * dim doubles) is the only thing crossing the driver boundary.
    */
  private def trainLloydCentroids(
      e: DataFrame, idCol: String, numClusters: Int,
      iters: Int): Array[Seq[Double]] = {
    var cents: Array[Seq[Double]] = e.orderBy(col(idCol)).limit(numClusters)
      .select("v").collect()
      .map(_.getSeq[Float](0).map(_.toDouble): Seq[Double])
    (1 to iters).foreach { _ =>
      val means = e.withColumn("cl", lloydAssign(cents))
        .select(col("cl"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("cl", "dim").agg(avg("x").as("m"))
        .groupBy("cl").agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("p"))
        .select(col("cl"), transform(col("p"), q => q.getField("m")).as("c"))
        .collect().map(r => r.getInt(0) -> (r.getSeq[Double](1): Seq[Double])).toMap
      // an emptied cluster keeps its previous centroid (deterministic)
      cents = cents.zipWithIndex.map { case (old, i) => means.getOrElse(i, old) }
    }
    cents
  }

  /** Argmin-over-centroids assignment: array_min over (distance, cluster)
    * structs — struct ordering IS the lowest-cluster tie-break. */
  private def lloydAssign(cents: Array[Seq[Double]]): Column = {
    val alts = cents.zipWithIndex.map { case (c, i) =>
      struct(l2Sq(col("v"), vecLit(c)).as("d"), lit(i).as("cl"))
    }
    array_min(array(alts.toIndexedSeq: _*)).getField("cl")
  }

  /** The nProbe centroids nearest the query by cosine (ties → lowest
    * cluster id), computed driver-side over the k-sized model. */
  private def probeNearest(
      cents: Array[Seq[Double]], queryVec: Seq[Double],
      nProbe: Int): Seq[Int] = {
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)
      if (d == 0) 0.0 else a.zip(b).map { case (x, y) => x * y }.sum / d
    }
    cents.zipWithIndex.toSeq
      .map { case (c, i) => (cos(c, queryVec), i) }
      .sortBy { case (s, i) => (-s, i) }.take(nProbe).map(_._2)
  }

  /** Top-k per probe width: ONE deterministic-Lloyd training + ONE
    * assignment/scoring pass, then each requested nProbe takes its
    * top-k inside the first-p nearest inverted lists — the
    * recall-vs-probe-cost CURVE (the serving knob every IVF deployment
    * tunes) without retraining per point. Emits (n_probe, id, cos).
    */
  def lloydIvfProbeCurve(
      emb: DataFrame, queryVec: Seq[Double], k: Int,
      numClusters: Int = 8, iters: Int = 3, probes: Seq[Int] = Seq(1, 2, 3, 4),
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    graft.plans.GraftFunctions.register(emb.sparkSession)
    val e = emb.select(col(idCol), col(vecCol).as("v"))
    val cents = trainLloydCentroids(e, idCol, numClusters, iters)
    // assignment + query scoring materialize once (lazy checkpoint);
    // every probe width reads the stored blocks instead of re-assigning
    val scored = e.withColumn("cl", lloydAssign(cents))
      .select(col(idCol), col("cl"),
        round(cosine(col("v"), vecLit(queryVec)), 6).as("cos"))
      .localCheckpoint(eager = false)
    val order = probeNearest(cents, queryVec, numClusters)
    probes.map { p =>
      scored.filter(col("cl").isin(order.take(p): _*))
        .orderBy(col("cos").desc, col(idCol)).limit(k)
        .select(lit(p).as("n_probe"), col(idCol), col("cos"))
    }.reduce(_ unionAll _)
  }

  def lloydIvfTopK(
      emb: DataFrame, queryVec: Seq[Double], k: Int,
      numClusters: Int = 8, iters: Int = 3, nProbe: Int = 3,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    graft.plans.GraftFunctions.register(emb.sparkSession)
    val e = emb.select(col(idCol), col(vecCol).as("v"))
    val cents = trainLloydCentroids(e, idCol, numClusters, iters)
    val probed = probeNearest(cents, queryVec, nProbe)
    e.withColumn("cl", lloydAssign(cents))
      .filter(col("cl").isin(probed: _*))
      .select(col(idCol), round(cosine(col("v"), vecLit(queryVec)), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** IVF with LEARNED coarse centroids: MLlib k-means (seeded, fixed
    * iterations) trains the inverted lists instead of borrowing a label
    * column — the production IVF shape, where cluster quality controls
    * recall at a given nProbe. The array<float> column bridges to MLlib
    * through `array_to_vector` (a codegen'd built-in, not a UDF);
    * training cost is numClusters × iterations × one pass, paid once per
    * index build, and assignment is a broadcast of numClusters centroids.
    * With nProbe = numClusters this degrades gracefully to exact search
    * (SimilaritySpec pins that identity).
    */
  def kmeansIvfTopK(
      emb: DataFrame, queryVec: Seq[Double], k: Int,
      numClusters: Int = 8, nProbe: Int = 2, seed: Long = 42L,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val withFeat = emb.withColumn("features",
      array_to_vector(col(vecCol).cast("array<double>")))
    val model = new KMeans().setK(numClusters).setSeed(seed).setMaxIter(10)
      .setFeaturesCol("features").setPredictionCol("ivf_cluster")
      .fit(withFeat)
    val assigned = model.transform(withFeat)
    ivfTopK(assigned.drop("features"), queryVec, k, nProbe,
      clusterCol = "ivf_cluster", vecCol = vecCol, idCol = idCol)
  }

  /** [[pqTrainEncode]] with DETERMINISTIC codebooks: per subvector, the
    * same fixed-init/total-order Lloyd loop as [[lloydIvfTopK]] trains
    * `k` centroids on the (deterministic) sample — no seed anywhere, so
    * an independent SQL engine re-trains all `m` codebooks and reproduces
    * every code and reconstruction error exactly. Codebooks ride as
    * centroid literals; the per-row code is a codegen'd argmin and the
    * reconstruction error indexes the literal codebook — no join, no UDF.
    */
  /** Deterministic per-subvector PQ codebook training (fixed lowest-id
    * init, lowest-code tie-break, emptied codes keep their centroid) —
    * shared by [[pqTrainEncodeLloyd]] and [[ivfPqTopK]]. Returns the m
    * codebooks of k subDim-dimensional centroids.
    *
    * The training set is BOUNDED at `sampleN` rows by definition at any
    * corpus scale, so the Lloyd loop runs on the DRIVER over one collect
    * of sampleN×dim floats (≤ a few MB) — the FAISS shape: codebooks are
    * model state, trained host-side on a sample; the distributed work of
    * PQ is the corpus-wide ENCODE pass, which is unchanged below. The
    * previous m×iters distributed jobs (and the ~50%-slower fused
    * one-job-per-round variant) were pure scheduling overhead around a
    * 2000-row scan — see PLANS.md round 7 for the measurements. The
    * arithmetic is the exact loop the DuckDB oracle replays: sequential
    * double diff/square/sum distances (the [[graft.functions.VectorFunctions.l2Sq]]
    * fold order), strict-< argmin = lowest-code tie-break, per-(code,dim)
    * means, emptied codes keep their previous centroid.
    */
  private def trainPqBooks(
      emb: DataFrame, vecCol: String, idCol: String,
      subDim: Int, m: Int, k: Int, sampleN: Int,
      iters: Int): Array[Array[Seq[Double]]] = {
    val rows: Array[Array[Double]] = emb.orderBy(col(idCol)).limit(sampleN)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    Array.tabulate(m) { i =>
      val sub: Array[Array[Double]] =
        rows.map(v => java.util.Arrays.copyOfRange(v, i * subDim, (i + 1) * subDim))
      // fixed init: the k smallest-id sample subvectors (rows are already
      // in id order from the bounded sort above); a corpus smaller than
      // k trains the book it can fill — kEff, not k, bounds every loop
      var book: Array[Array[Double]] = sub.take(k).map(_.clone)
      val kEff = book.length
      for (_ <- 1 to iters) {
        val sums = Array.fill(kEff)(new Array[Double](subDim))
        val counts = new Array[Long](kEff)
        sub.foreach { v =>
          var best = 0
          var bestD = Double.MaxValue
          var c = 0
          while (c < kEff) {
            var d = 0.0
            var j = 0
            while (j < subDim) { val t = v(j) - book(c)(j); d += t * t; j += 1 }
            if (d < bestD) { bestD = d; best = c } // strict < → lowest code wins ties
            c += 1
          }
          counts(best) += 1
          var j = 0
          while (j < subDim) { sums(best)(j) += v(j); j += 1 }
        }
        book = book.zipWithIndex.map { case (old, c) =>
          if (counts(c) == 0L) old // an emptied code keeps its centroid
          else sums(c).map(_ / counts(c))
        }
      }
      book.map(c => c.toSeq: Seq[Double])
    }
  }

  /** Argmin over codebook i: first position of the minimum distance —
    * ties resolve to the LOWEST code, the same total order the oracles
    * replay. */
  private def pqAssign(books: Array[Array[Seq[Double]]], vecCol: String,
      subDim: Int)(i: Int): Column = {
    val sub = slice(col(vecCol), i * subDim + 1, subDim)
    val d = array(books(i).map(c => l2Sq(sub, vecLit(c))).toIndexedSeq: _*)
    (array_position(d, array_min(d)) - 1).cast("int")
  }

  def pqTrainEncodeLloyd(
      emb: DataFrame, dim: Int = 64, m: Int = 4, k: Int = 16,
      sampleN: Int = 2000, iters: Int = 3,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    graft.plans.GraftFunctions.register(emb.sparkSession)
    require(dim % m == 0, s"dim $dim must split into $m subvectors")
    val subDim = dim / m
    def subArr(i: Int): Column = slice(col(vecCol), i * subDim + 1, subDim)
    val books = trainPqBooks(emb, vecCol, idCol, subDim, m, k, sampleN, iters)
    def assignExpr(i: Int): Column = pqAssign(books, vecCol, subDim)(i)
    var out = emb.select(col(idCol), col(vecCol))
    var errExpr: Column = lit(0.0)
    (0 until m).foreach { i =>
      out = out.withColumn(s"code_$i", assignExpr(i))
      errExpr = errExpr + aggregate(
        zip_with(subArr(i), element_at(typedLit(books(i).map(_.toSeq).toSeq), col(s"code_$i") + 1),
          (x, c) => (x.cast("double") - c) * (x.cast("double") - c)),
        lit(0.0), (acc, x) => acc + x)
    }
    out.select(col(idCol),
      array((0 until m).map(i => col(s"code_$i")): _*).as("codes"),
      round(errExpr / dim, 6).as("mse"))
  }

  /** The production ANN stack in one operator — IVF-PQ with exact
    * re-rank (Jégou et al. 2011, the composition every billion-vector
    * serving system runs):
    *
    *   1. COARSE QUANTIZER: deterministic-Lloyd IVF centroids prune the
    *      corpus to the nProbe inverted lists nearest the query.
    *   2. ADC SCAN: surviving vectors are scored by asymmetric distance
    *      — the exact query subvectors against each vector's PQ
    *      codebook centroids, Σᵢ ‖q⁽ⁱ⁾ − cᵢ(codeᵢ)‖² — the m-byte-per-
    *      vector pass that replaces reading m·subDim floats.
    *   3. EXACT RE-RANK: only the rerankC best ADC candidates pay the
    *      full-precision cosine; top-k of those is the answer.
    *
    * This variant encodes RAW vectors (IVFFlat-style lists + PQ codes);
    * production IVFPQ encodes residuals v − centroid(v), which shrinks
    * quantization error but couples the codebooks to the coarse
    * quantizer — the deterministic training here keeps the two models
    * independent so an external engine can replay both exactly.
    *
    * Scale shape: both models are driver-side literals (numClusters×dim
    * + m×k×subDim doubles — kilobytes); the corpus pass is one filter
    * (list membership) + codegen'd argmin encode + ADC arithmetic, then
    * TakeOrderedAndProject twice (rerankC, then k). Nothing shuffles
    * except the two bounded top-k merges.
    */
  def ivfPqTopK(
      emb: DataFrame, queryVec: Seq[Double], k: Int,
      numClusters: Int = 8, ivfIters: Int = 3, nProbe: Int = 3,
      dim: Int = 64, m: Int = 4, codeK: Int = 16, sampleN: Int = 2000,
      pqIters: Int = 3, rerankC: Int = 50,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    graft.plans.GraftFunctions.register(emb.sparkSession)
    require(dim % m == 0, s"dim $dim must split into $m subvectors")
    val subDim = dim / m
    val e = emb.select(col(idCol), col(vecCol).as("v"))
    val cents = trainLloydCentroids(e, idCol, numClusters, ivfIters)
    val books = trainPqBooks(emb, vecCol, idCol, subDim, m, codeK,
      sampleN, pqIters)
    val probed = probeNearest(cents, queryVec, nProbe)
    // ADC: the query's per-subvector distance to the vector's ASSIGNED
    // codebook centroid, summed over subvectors in order — one fixed
    // fold, so an external engine lands on the identical double
    val adcExpr = (0 until m).map { i =>
      val qSub = queryVec.slice(i * subDim, (i + 1) * subDim)
      val code = pqAssign(books, "v", subDim)(i)
      element_at(
        typedLit(books(i).map(c => l2sqConst(qSub, c)).toSeq), code + 1)
    }.reduce(_ + _)
    val cands = e.withColumn("cl", lloydAssign(cents))
      .filter(col("cl").isin(probed: _*))
      .select(col(idCol), col("v"), round(adcExpr, 6).as("adc"))
      .orderBy(col("adc").asc, col(idCol))
      .limit(rerankC)
    cands
      .select(col(idCol), col("adc"),
        round(cosine(col("v"), vecLit(queryVec)), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Exact driver-side ‖a−b‖² with the same left-to-right fold order the
    * in-plan l2 expressions and DuckDB's list_sum use. */
  private def l2sqConst(a: Seq[Double], b: Seq[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) {
      val d = a(i) - b(i); acc += d * d; i += 1
    }
    acc
  }

  /** Product quantization (Jégou et al. 2011): split each vector into `m`
    * subvectors, train a `k`-centroid codebook per subvector (seeded MLlib
    * k-means over a deterministic sample — codebooks train on a sample at
    * any scale), encode every vector as `m` small codes. 64 floats become
    * m bytes — the memory step that makes billion-vector ANN feasible.
    * Returns (id, codes array<int>, mse double): the reconstruction error
    * is computed in-plan via one broadcast join per subvector on the code
    * key (k rows each), never a per-row UDF.
    */
  def pqTrainEncode(
      emb: DataFrame, dim: Int = 64, m: Int = 4, k: Int = 16,
      sampleN: Int = 2000, seed: Long = 42L,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    require(dim % m == 0, s"dim $dim must split into $m subvectors")
    val subDim = dim / m
    val sample = emb.orderBy(col(idCol)).limit(sampleN)
    def subArr(i: Int): Column =
      slice(col(vecCol), i * subDim + 1, subDim).cast("array<double>")
    var out = emb.select(col(idCol), col(vecCol))
    var errExpr: Column = lit(0.0)
    (0 until m).foreach { i =>
      val model = new KMeans().setK(k).setSeed(seed + i).setMaxIter(5)
        .setFeaturesCol("_f").setPredictionCol(s"code_$i")
        .fit(sample.select(array_to_vector(subArr(i)).as("_f")))
      out = model.transform(out.withColumn("_f", array_to_vector(subArr(i))))
        .drop("_f")
      // codebook is k rows — broadcast join on the code, no UDF lookup
      val centers = model.clusterCenters.zipWithIndex.map { case (c, j) =>
        (j, c.toArray.toSeq)
      }
      val cb = emb.sparkSession.createDataFrame(centers.toSeq)
        .toDF(s"cb_code_$i", s"center_$i")
      out = out.join(broadcast(cb), col(s"code_$i") === col(s"cb_code_$i"))
        .drop(s"cb_code_$i")
      errExpr = errExpr + aggregate(
        zip_with(subArr(i), col(s"center_$i"), (x, c) => (x - c) * (x - c)),
        lit(0.0), (acc, x) => acc + x)
    }
    out.select(col(idCol),
      array((0 until m).map(i => col(s"code_$i")): _*).as("codes"),
      round(errExpr / dim, 6).as("mse"))
  }

  /** Batch k-NN join: for every row of `queries`, its top-k neighbors in
    * `emb` by cosine, LSH-blocked. The all-pairs version of [[lshTopK]] —
    * one bucket-key shuffle instead of a cross join.
    */
  def knnJoin(
      emb: DataFrame, queries: DataFrame, k: Int,
      dim: Int = 64, nPlanes: Int = 0, seed: Long = 42L,
      vecCol: String = "embedding", idCol: String = "vec_id",
      targetOccupancy: Int = 2): DataFrame = {
    graft.plans.GraftFunctions.register(emb.sparkSession)
    // nPlanes <= 0 → derive from the base-corpus size at a constant
    // expected occupancy ([[autoPlanes]]): with multi-probe the scan per
    // query is (nPlanes+1)·occupancy candidates, so holding occupancy
    // constant keeps the kNN join linear in corpus size
    val np =
      if (nPlanes > 0) nPlanes else autoPlanes(emb.count(), targetOccupancy)
    val planes = hyperplanes(dim, np, seed)
    val base = emb.select(col(idCol).as("nn_id"), col(vecCol).as("nn_vec"),
      lshBucket(col(vecCol), planes).as("bucket"))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      explode(probeBuckets(lshBucket(col(vecCol), planes), np)).as("bucket"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos").desc, col("nn_id"))
    // no dedup needed: a neighbor lives in exactly ONE bucket and the
    // probe array is distinct, so a (q, nn) pair can match at most once
    // — the former distinct() re-shuffled the whole candidate set to
    // remove duplicates that cannot exist (assumes unique ids per side,
    // the same contract every ANN operator here carries)
    q.join(base, Seq("bucket"))
      .filter(col("q_id") =!= col("nn_id"))
      .select(col("q_id"), col("nn_id"),
        round(cosine(col("q_vec"), col("nn_vec")), 6).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** EXTERNAL clustering evaluation: purity and normalized mutual
    * information of the deterministic-Lloyd partition against a
    * ground-truth label column — the "did the unsupervised index
    * recover the real structure" report the internal metrics
    * (silhouette, Davies–Bouldin) can't give. One assignment pass
    * (codegen'd argmin over centroid literals) collapses to the
    * ≤ k×|labels| contingency grain; purity, I, H_cluster and H_label
    * are tiny aggregations over it, and only the four final scalars
    * cross the driver. Contingency counts are exact integers; the ln
    * sums are the one float slack, rounded at `roundTo`.
    */
  def lloydClusterEval(
      emb: DataFrame, numClusters: Int = 8, iters: Int = 3,
      labelCol: String = "label", vecCol: String = "embedding",
      idCol: String = "vec_id", roundTo: Int = 6): DataFrame = {
    graft.plans.GraftFunctions.register(emb.sparkSession)
    val e = emb.select(col(idCol), col(vecCol).as("v"),
      col(labelCol).as("lbl"))
    val cents = trainLloydCentroids(
      e.select(col(idCol), col("v")), idCol, numClusters, iters)
    val ct = e.withColumn("cl", lloydAssign(cents))
      .groupBy("cl", "lbl").agg(count(lit(1)).as("n"))
      .localCheckpoint(eager = true) // ≤ k×|labels| rows, 4 consumers
    val nTot = ct.agg(sum("n")).head().getLong(0)
    val rowT = ct.groupBy("cl").agg(sum("n").as("a"))
      .localCheckpoint(eager = false)
    val colT = ct.groupBy("lbl").agg(sum("n").as("b"))
    val nUsed = rowT.count()
    val purity = ct.groupBy("cl").agg(max("n").as("m"))
      .agg(sum("m")).head().getLong(0).toDouble / nTot
    val iVal = ct.join(rowT, Seq("cl")).join(colT, Seq("lbl"))
      .agg(sum((col("n").cast("double") / nTot)
        * log((col("n") * nTot).cast("double") / (col("a") * col("b")))))
      .head().getDouble(0)
    def entropy(tot: DataFrame, c: String): Double =
      tot.agg(-sum((col(c).cast("double") / nTot)
        * log(col(c).cast("double") / nTot))).head().getDouble(0)
    val nmi = 2.0 * iVal / (entropy(rowT, "a") + entropy(colT, "b"))
    def r6(x: Double): Double =
      BigDecimal(x).setScale(roundTo, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    val spark = emb.sparkSession
    import spark.implicits._
    Seq((nTot, nUsed, r6(purity), r6(nmi)))
      .toDF("n_vecs", "n_clusters_used", "purity", "nmi")
  }

  /** Mutual-kNN pairs: (a, b) kept iff EACH is in the other's top-k —
    * the reciprocity filter semantic-dedup pipelines run on a kNN graph
    * to kill hub-induced false neighbors (a hub vector appears in
    * everyone's top-k; almost nobody appears in its). One [[knnJoin]]
    * build feeds both sides of the reciprocity check — the second pass
    * is a (id, id)-keyed self-join of the k·n result, never a second
    * corpus scan. Output: (id_a < id_b, cos, rank_ab, rank_ba).
    */
  def mutualKnn(
      emb: DataFrame, k: Int,
      dim: Int = 64, nPlanes: Int = 0, seed: Long = 42L,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val knn = knnJoin(emb, emb, k, dim, nPlanes, seed, vecCol, idCol)
      .localCheckpoint(eager = false) // two consumers, one kNN build
    knn.select(col("q_id").as("id_a"), col("nn_id").as("id_b"),
        col("cos"), col("rank").as("rank_ab"))
      .join(knn.select(col("nn_id").as("id_a"), col("q_id").as("id_b"),
        col("rank").as("rank_ba")), Seq("id_a", "id_b"))
      .filter(col("id_a") < col("id_b"))
  }
}
