package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions

/** Deduplication operators for a 100 TB training-data pipeline, in rising
  * order of fuzziness:
  *
  *   1. exact          — hash groupBy on the raw text
  *   2. normalized     — groupBy on a canonicalized form
  *   3. fingerprint    — groupBy on the sorted-token-bag md5 (bag-of-words)
  *   4. MinHash + LSH  — shingle → 64 minhashes → band → bucket join
  *   5. SimHash        — 64-bit signature, chunk-blocked Hamming verify
  *   6. embedding      — cosine near-dup via hyperplane LSH buckets
  *
  * Scale design: every variant reduces to (narrow per-row signature) →
  * (single hash-shuffle on the signature/bucket key) → (verify inside
  * buckets). No O(n²) stage ever runs globally — candidate generation is
  * always blocked by a bucket key, and `maxBucket` caps skew from
  * degenerate buckets (a constant popular shingle can't blow up one
  * reducer). Signatures are computed with higher-order functions on
  * codegen'd built-ins, not UDFs.
  */
object Dedup {

  // -- 1/2/3: exact-ish ----------------------------------------------------

  /** Groups of byte-identical texts: one row per duplicated text. */
  def exactDupGroups(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.groupBy(col(textCol))
      .agg(count(lit(1)).as("n_dups"), min(col(idCol)).as("keep_id"))
      .filter(col("n_dups") > 1)

  /** Keep the lowest-id representative of every exact-duplicate group —
    * deterministic, unlike dropDuplicates (which keeps an arbitrary row).
    */
  def exactDedup(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(col(textCol)).orderBy(col(idCol))
    docs.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** Canonical text form: lowercase, strip punctuation, collapse runs of
    * whitespace. Dedup on this catches trivially-edited copies.
    *
    * Native single byte-pass ([[graft.functions.NormalizeText]]);
    * identical to [[normalizedPortable]]. The regex chain measured
    * ~0.3 MB/s/core on the r12 1000x probe — 262 s of
    * doc_dedup_normalized's 508 s went to the two regexp_replace
    * passes alone, at every scale the dominant cost of the operator.
    */
  def normalized(text: Column): Column =
    call_function("graft_normalize", text)

  /** [[normalized]] via built-in string functions (portable fallback and
    * differential-test partner; the form the DuckDB oracle mirrors).
    */
  def normalizedPortable(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", " "), "\\s+", " "))

  def normalizedDedup(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(normalized(col(textCol))).orderBy(col(idCol))
    docs.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  // -- shingling -----------------------------------------------------------

  /** Distinct k-word shingles of the whitespace-token stream. Empty-safe:
    * texts shorter than k tokens yield a single whole-text shingle.
    * Native single pass ([[graft.functions.WordKGrams]]); identical to
    * [[shinglesHof]].
    */
  def shingles(text: Column, k: Int = 3): Column =
    call_function("graft_shingles", TextAnalysis.tokens(lower(text)), lit(k))

  /** [[shingles]] via built-in higher-order functions (portable fallback
    * and differential-test partner), built by zipping the token array with
    * its own shifts: every collection argument is evaluated once. (A
    * transform over positions with `slice(ts, i+1, k)` in the lambda
    * re-tokenizes the text per position — interpreted HOF semantics — and
    * measured ~50× the tokenize cost.)
    */
  def shinglesHof(text: Column, k: Int = 3): Column = {
    val ts = TextAnalysis.tokens(lower(text))
    val n = size(ts)
    // windows[i] = ts[i] ⊔ ts[i+1] ⊔ … ⊔ ts[i+k-1]; zip_with pads the
    // shorter side with null and concat_ws skips nulls, so only the first
    // n-k+1 positions are full k-grams — slice keeps exactly those
    val windows = (1 until k).foldLeft(identity(ts): Column)((acc, i) =>
      zip_with(acc, slice(ts, lit(i + 1), n), (a, b) => concat_ws(" ", a, b)))
    when(n < k, array(concat_ws(" ", ts)))
      .otherwise(array_distinct(slice(windows, lit(1), n - k + 1)))
  }

  /** Jaccard similarity of two shingle-set columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0.0, 0.0).otherwise(inter / uni)
  }

  // -- 4: MinHash + LSH ----------------------------------------------------

  /** Minhash signature: hash each shingle once, then a numHashes-lane min
    * accumulator, deriving lane j's value by re-hashing the 8-byte shingle
    * hash with the lane id (an independent family, ANSI-overflow-safe — no
    * multiply). Native codegen'd loop ([[graft.functions.MinHashSig]]);
    * bit-identical to [[minhashSignatureHof]].
    */
  def minhashSignature(shingleCol: Column, numHashes: Int = 64): Column =
    call_function("graft_minhash", shingleCol, lit(numHashes))

  /** [[minhashSignature]] via higher-order built-ins — the portable
    * fallback and differential-test partner.
    *
    * Shape matters even here: higher-order functions are interpreted, and
    * an expression referenced inside a lambda is RE-EVALUATED per outer
    * element (Catalyst inlines single-use aliases, so a helper column
    * doesn't protect you). The `aggregate` form evaluates its collection
    * argument — the string hashing — exactly once per row; a
    * transform-per-lane formulation re-hashed every shingle per lane and
    * measured 16× slower at sf0.1.
    */
  def minhashSignatureHof(shingleCol: Column, numHashes: Int = 64): Column = {
    val lanes = sequence(lit(0), lit(numHashes - 1)) // foldable → constant
    aggregate(
      transform(shingleCol, s => xxhash64(s)),
      array_repeat(lit(Long.MaxValue), numHashes),
      (acc, h) => zip_with(acc, lanes, (a, j) => least(a, xxhash64(h, j))))
  }

  /** ENGINE-PORTABLE minhash signature: each shingle is hashed ONCE with
    * md5 (its first 15 hex chars parsed as an integer, reduced mod the
    * Mersenne prime 2³¹−1), and lane j derives through the affine family
    * h_j(x) = ((2j+1)·x + 12347·j + 1) mod p — products stay under 2³⁸,
    * so the arithmetic is exact in any 64-bit engine, ANSI included.
    * Native codegen'd loop ([[graft.functions.MinHashSigMd5]]);
    * bit-identical to [[minhashSignaturePortableHof]] (measured 3× on the
    * sf0.1 bench: the HOF fold pays tokens×lanes interpreted lambdas).
    */
  def minhashSignaturePortable(shingleCol: Column, numHashes: Int = 64): Column =
    call_function("graft_minhash_md5", shingleCol, lit(numHashes))

  /** [[minhashSignaturePortable]] as one interpreted higher-order fold —
    * the differential-test partner (see [[minhashSignatureHof]] on why
    * the single-fold shape matters even interpreted).
    */
  def minhashSignaturePortableHof(shingleCol: Column, numHashes: Int = 64): Column = {
    val p = 2147483647L
    val lanes = sequence(lit(0), lit(numHashes - 1)) // foldable → constant
    aggregate(
      transform(shingleCol,
        s => conv(substring(md5(s), 1, 15), 16, 10).cast("long") % p),
      array_repeat(lit(p), numHashes),
      (acc, hm) => zip_with(acc, lanes, (a, j) =>
        least(a, ((j * 2 + 1) * hm + j * 12347 + 1) % p)))
  }

  /** [[minhashNearDups]] with the portable signature and PLAIN-STRING band
    * keys (the joined lane values — no engine-private hash in the bucket
    * key), so the complete banded-LSH pipeline — shingles, signature,
    * banding, candidate join, exact Jaccard verify — is reproduced by the
    * SQL oracle. The xxhash64 native path stays pinned by its
    * bit-identical HOF differential in TextExpressionsSpec.
    */
  /** The shared portable-minhash base relation (id, sh, sig): shingle set
    * plus the numHashes-lane md5 signature per document. Built once and
    * persisted/memoized by callers with several minhash consumers
    * (near-dup pairing, estimator calibration, band-geometry sweep) —
    * the signature scan is the dominant per-row cost of all of them.
    */
  def minhashPortableSigs(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      numHashes: Int = 64,
      shingleK: Int = 3): DataFrame = {
    graft.plans.GraftFunctions.register(docs.sparkSession)
    docs
      .select(col(idCol).as("id"), shingles(col(textCol), shingleK).as("sh"))
      .withColumn("sig", minhashSignaturePortable(col("sh"), numHashes))
  }

  def minhashNearDupsPortable(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5,
      shingleK: Int = 3,
      maxBucket: Int = 1000): DataFrame =
    // sigd feeds THREE consumers (the banding path and both sides of the
    // verify join); the shingle+signature subtree is the dominant
    // per-row cost, so materialize it once (lazy checkpoint, blocks freed
    // by the context cleaner) instead of re-evaluating per consumer
    minhashNearDupsPortableOf(
      minhashPortableSigs(docs, textCol, idCol, numHashes, shingleK)
        .localCheckpoint(eager = false),
      numHashes, bands, threshold, maxBucket)

  /** [[minhashNearDupsPortable]] over a pre-built (and ideally persisted)
    * [[minhashPortableSigs]] relation — the shape callers with several
    * minhash consumers use so the signature scan runs once.
    */
  def minhashNearDupsPortableOf(
      sigd: DataFrame,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5,
      maxBucket: Int = 1000): DataFrame = {
    graft.plans.GraftFunctions.register(sigd.sparkSession)
    val rows = numHashes / bands
    val banded = sigd.select(
      col("id"),
      posexplode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => concat_ws(",", slice(col("sig"), b * rows + 1, lit(rows))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val cands = cappedPostings(banded, Seq("band", "bucket"), col("id"), maxBucket)
      .select(explode(pairCombinations(col("ps"))).as("p"))
      .select(col("p.id_a"), col("p.id_b")).distinct()
    val sh = sigd.select(col("id"), col("sh"))
    cands
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** LSH band-geometry DESIGN sweep: for each candidate (bands, rows)
    * split of the SAME numHashes-lane signature, how many candidate
    * pairs does banding generate and how many documents do they touch —
    * the cost/recall curve an operator reads before committing a band
    * geometry to a corpus-scale dedup run (more rows per band → sharper
    * s-curve → fewer, higher-precision candidates). One signature build
    * (pass a persisted [[minhashPortableSigs]]), one banding + pair
    * aggregation per geometry over that same array — no re-hash, no
    * re-shingle, and candidates stay posting-list-bounded exactly like
    * the production pairing path.
    */
  def minhashBandSweep(
      sigd: DataFrame,
      numHashes: Int = 64,
      bandCounts: Seq[Int] = Seq(32, 16, 8),
      maxBucket: Int = 1000): DataFrame = {
    graft.plans.GraftFunctions.register(sigd.sparkSession)
    bandCounts.map { bands =>
      val rows = numHashes / bands
      val banded = sigd.select(
        col("id"),
        posexplode(transform(
          sequence(lit(0), lit(bands - 1)),
          b => concat_ws(",", slice(col("sig"), b * rows + 1, lit(rows))))))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
      val cands = cappedPostings(banded, Seq("band", "bucket"), col("id"),
          maxBucket)
        .select(explode(pairCombinations(col("ps"))).as("p"))
        .select(col("p.id_a"), col("p.id_b")).distinct()
      cands
        .select(col("id_a"), col("id_b"),
          explode(array(col("id_a"), col("id_b"))).as("id"))
        .agg((count(lit(1)) / 2).cast("long").as("n_candidate_pairs"),
          countDistinct("id").as("n_docs"))
        .select(lit(bands).as("bands"), lit(rows).as("rows_per_band"),
          col("n_candidate_pairs"), col("n_docs"))
    }.reduce(_ unionAll _)
  }

  /** Candidate near-duplicate pairs via banded LSH, then exact Jaccard
    * verification. Output: (id_a, id_b, jaccard) with id_a < id_b, one row
    * per pair, jaccard ≥ threshold.
    *
    * bands×rows must equal numHashes. 16 bands × 4 rows targets the
    * classic s-curve around J ≈ (1/16)^(1/4) ≈ 0.5.
    */
  def minhashNearDups(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5,
      shingleK: Int = 3,
      maxBucket: Int = 1000): DataFrame = {
    graft.plans.GraftFunctions.register(docs.sparkSession)
    val rows = numHashes / bands
    // three consumers, one materialization — same as the portable twin
    val sigd = docs
      .select(col(idCol).as("id"), shingles(col(textCol), shingleK).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
      .localCheckpoint(eager = false)
    // candidates travel as bare (band, bucket, id) — the wide shingle
    // arrays are re-joined only for the surviving pairs
    val banded = sigd.select(
      col("id"),
      posexplode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws(",", slice(col("sig"), b * rows + 1, lit(rows)))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    // Pairs expand from a per-bucket sorted, capped posting list (one
    // shuffle; the signature subtree is evaluated once — a self-join would
    // evaluate it per side; see cappedPostings for the skew bound).
    val cands = cappedPostings(banded, Seq("band", "bucket"), col("id"), maxBucket)
      .select(explode(pairCombinations(col("ps"))).as("p"))
      .select(col("p.id_a"), col("p.id_b")).distinct()
    val sh = sigd.select(col("id"), col("sh"))
    cands
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** All ordered pairs (i < j) of a sorted id array, as structs
    * (id_a, id_b). Quadratic only within one (already capped) bucket.
    */
  private def pairCombinations(ids: Column): Column =
    flatten(transform(ids, (x, i) =>
      transform(slice(ids, i + lit(2), size(ids)),
        y => struct(x.as("id_a"), y.as("id_b")))))

  /** Sorted, capped posting list of `payload` per `keys` group, as column
    * `ps`; groups that can't pair (size < 2) are dropped.
    *
    * The cap is applied with a window row_number BEFORE the list is
    * collected — window sorts spill to disk, while a collect_list
    * aggregation buffer does not, so a degenerate key (every row in one
    * bucket) sorts safely instead of OOMing one reducer. The groupBy runs
    * on the window's own hash partitioning, so the cap costs a sort but
    * no extra exchange. `payload` must lead with a unique id: row_number
    * order, sort_array order, and the "lowest maxBucket ids survive" cap
    * semantics all follow from lexicographic struct comparison on it.
    */
  private def cappedPostings(
      df: DataFrame, keys: Seq[String], payload: Column, maxBucket: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("_p"))
    df.select(keys.map(col) :+ payload.as("_p"): _*)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= maxBucket)
      .groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(col("_p"))).as("ps"))
      .filter(size(col("ps")) > 1)
  }

  /** Exact n-gram Jaccard near-dup over an explicit blocking key (e.g.
    * `source`) via an inverted index: explode shingles, equi-join on
    * (block, shingle), count shared shingles per pair, then Jaccard by
    * inclusion–exclusion |A∩B| / (|A|+|B|−|A∩B|).
    *
    * Scale: candidate pairs are generated only where a shingle is actually
    * shared — one shuffle keyed by (block, shingle) plus one aggregation,
    * instead of a block-wide O(B²) cross join dragging full shingle arrays
    * through the exchange. Pairs with an empty intersection (Jaccard 0)
    * never materialize, which is exact for any threshold > 0 — as long as
    * no posting list exceeds `maxBucket`. Beyond the cap (a shingle shared
    * by more than maxBucket documents in one block), only the lowest
    * maxBucket ids contribute that shingle's pairs/counts: a bounded
    * recall trade under pathological skew, same contract as
    * [[minhashNearDups]]'s cap.
    *
    * Pairs are expanded from a per-(block, shingle) grouped id list rather
    * than a self-join: a self-join evaluates the shingle subtree once per
    * side (Catalyst has no common-plan reuse across self-join inputs),
    * which doubled the dominant per-row cost. The in-group expansion is
    * quadratic only within one posting list, the same blow-up the join
    * produced as rows.
    */
  /** Shared intermediate of the shingle-pair family: for every candidate
    * document pair that shares at least one k-word shingle within a
    * block, the pair's shingle-set sizes and intersection size —
    * (id_a, id_b, nsh_a, nsh_b, common). Jaccard
    * ([[ngramJaccardOf]]) and containment ([[containmentOf]]) are pure
    * per-row arithmetic over this ONE relation, so two near-dup passes
    * over the same corpus should build it once (persist it) instead of
    * each re-running the explode + posting aggregation — at 100 TB the
    * posting build IS the cost, the final measure is free.
    *
    * Shape: inverted shingle index blocked by `blockCol`, posting lists
    * capped at `maxBucket` (bounds the within-bucket quadratic pairing),
    * intersections counted by a pair-keyed aggregation — document pairs
    * never meet outside a shared shingle's posting list.
    */
  def shinglePairCounts(
      docs: DataFrame,
      blockCol: String,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleK: Int = 3,
      maxBucket: Int = 1000): DataFrame = {
    graft.plans.GraftFunctions.register(docs.sparkSession)
    val d = docs.select(
      col(blockCol).as("blk"), col(idCol).as("id"),
      shingles(col(textCol), shingleK).as("sh"))
      .select(col("blk"), col("id"), size(col("sh")).as("nsh"),
        explode(col("sh")).as("s"))
    val posting = cappedPostings(d, Seq("blk", "s"),
      struct(col("id"), col("nsh")), maxBucket)
    // ordered pairs (i < j) within each posting list
    val pairs = posting.select(explode(flatten(transform(col("ps"),
      (x, i) => transform(slice(col("ps"), i + lit(2), size(col("ps"))),
        y => struct(x.getField("id").as("id_a"), x.getField("nsh").as("nsh_a"),
          y.getField("id").as("id_b"), y.getField("nsh").as("nsh_b")))))).as("p"))
    pairs
      .groupBy("p.id_a", "p.id_b", "p.nsh_a", "p.nsh_b")
      .agg(count(lit(1)).as("common"))
  }

  /** Jaccard by inclusion–exclusion |A∩B| / (|A|+|B|−|A∩B|) over a
    * [[shinglePairCounts]] relation — map-only.
    */
  def ngramJaccardOf(pairCounts: DataFrame, threshold: Double): DataFrame =
    pairCounts
      .select(col("id_a"), col("id_b"),
        round(col("common").cast("double") /
          (col("nsh_a") + col("nsh_b") - col("common")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)

  def ngramJaccardPairs(
      docs: DataFrame,
      blockCol: String,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleK: Int = 3,
      threshold: Double = 0.5,
      maxBucket: Int = 1000): DataFrame =
    ngramJaccardOf(
      shinglePairCounts(docs, blockCol, textCol, idCol, shingleK, maxBucket),
      threshold)

  /** Overlap coefficient |A∩B| / min(|A|,|B|) over a
    * [[shinglePairCounts]] relation — map-only. Containment is the
    * measure that catches a short document QUOTED inside a much longer
    * one, which Jaccard structurally misses (the union term is dominated
    * by the long side, so a full-quote pair can score arbitrarily low
    * Jaccard yet containment 1.0).
    */
  def containmentOf(pairCounts: DataFrame, threshold: Double): DataFrame =
    pairCounts
      .select(col("id_a"), col("id_b"), col("common"),
        round(col("common").cast("double") /
          least(col("nsh_a"), col("nsh_b")), 6).as("containment"))
      .filter(col("containment") >= threshold)

  def containmentPairs(
      docs: DataFrame,
      blockCol: String,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleK: Int = 3,
      threshold: Double = 0.6,
      maxBucket: Int = 1000): DataFrame =
    containmentOf(
      shinglePairCounts(docs, blockCol, textCol, idCol, shingleK, maxBucket),
      threshold)

  /** Partial-overlap candidate pairs via winnowing fingerprints
    * ([[graft.operators.TextAnalysis.winnowFingerprints]]; Schleimer et
    * al. 2003): documents sharing >= `minShared` distinct fingerprints
    * within a block. Unlike whole-document hashes this witnesses PARTIAL
    * overlap — any shared token run of length >= k + w - 1 is guaranteed
    * to leave a shared fingerprint — at ~2/(w+1) of the k-gram index cost
    * of [[ngramJaccardPairs]], because only window-minimum grams are
    * posted. Same inverted-index shape: pairs materialize only where a
    * fingerprint is actually shared (one shuffle on (block, fp)), with
    * posting lists capped at `maxBucket` against degenerate boilerplate
    * fingerprints.
    */
  def winnowOverlapPairs(
      docs: DataFrame,
      blockCol: String,
      textCol: String = "text",
      idCol: String = "doc_id",
      k: Int = 4,
      w: Int = 4,
      minShared: Long = 2L,
      maxBucket: Int = 1000): DataFrame = {
    graft.plans.GraftFunctions.register(docs.sparkSession)
    val d = docs.select(
      col(blockCol).as("blk"), col(idCol).as("id"),
      explode(array_distinct(
        TextAnalysis.winnowFingerprints(col(textCol), k, w))).as("fp"))
    val posting = cappedPostings(d, Seq("blk", "fp"), col("id"), maxBucket)
    posting.select(explode(flatten(transform(col("ps"),
        (x, i) => transform(slice(col("ps"), i + lit(2), size(col("ps"))),
          y => struct(x.as("id_a"), y.as("id_b")))))).as("p"))
      .groupBy("p.id_a", "p.id_b")
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** [[winnowOverlapPairs]] with ENGINE-PORTABLE fingerprints: k-gram
    * hashes are md5 hex strings and window minima are lexicographic, so an
    * independent SQL engine can recompute the exact fingerprint set — the
    * oracle-checkable twin of the xxhash64 native-expression path.
    *
    * The formulation is fully relational and partition-parallel: tokens
    * explode to (doc, pos) rows, k-grams and window minima are per-doc
    * window functions (each document's rows stay inside one task), and the
    * pair generation is the same capped inverted-index join. Standard
    * winnowing (value-min per window) rather than robust winnowing: the
    * DISTINCT fingerprint set per document is identical between the two
    * selection rules, and only that set reaches the join.
    */
  def winnowOverlapPairsPortable(
      docs: DataFrame,
      blockCol: String,
      textCol: String = "text",
      idCol: String = "doc_id",
      k: Int = 4,
      w: Int = 4,
      minShared: Long = 2L,
      maxBucket: Int = 1000): DataFrame = {
    val tok = docs.select(
      col(blockCol).as("blk"), col(idCol).as("id"),
      posexplode(array_remove(TextAnalysis.tokens(col(textCol)), ""))
        .as(Seq("pos", "tk")))
    val byDoc = Window.partitionBy("id").orderBy("pos")
    // k-gram at token position p: the k tokens starting at p (a short doc
    // with fewer than k tokens contributes one whole-document gram)
    val kgrams = tok
      .withColumn("n", count(lit(1)).over(Window.partitionBy("id")))
      .withColumn("kgram", concat_ws(" ",
        collect_list("tk").over(byDoc.rowsBetween(0, k - 1))))
      .filter(col("pos") <= greatest(col("n") - k, lit(0)))
      .withColumn("h", md5(col("kgram")))
    // m k-grams → m-w+1 windows; each contributes its minimum hash
    val m = greatest(col("n") - (k - 1), lit(1))
    val fps = kgrams
      .withColumn("fp", min("h").over(byDoc.rowsBetween(0, w - 1)))
      .filter(col("pos") <= greatest(m - w, lit(0)))
      .select("blk", "id", "fp").distinct()
    val posting = cappedPostings(fps, Seq("blk", "fp"), col("id"), maxBucket)
    posting.select(explode(flatten(transform(col("ps"),
        (x, i) => transform(slice(col("ps"), i + lit(2), size(col("ps"))),
          y => struct(x.as("id_a"), y.as("id_b")))))).as("p"))
      .groupBy("p.id_a", "p.id_b")
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** Fuzzy-match pairs by bounded Levenshtein distance within an explicit
    * blocking key (entity resolution: near-identical names/titles that
    * exact dedup misses). Emits (block, id_a, id_b, dist) for pairs with
    * edit distance ≤ `maxDist`, id_a < id_b.
    *
    * Scale design: the quadratic pair expansion is confined to one block
    * (nation, source, zip — pick a key whose largest block fits a task)
    * via a blocked self-equi-join — the hash join STREAMS the in-block
    * pairs through the residual condition, where a grouped posting-list
    * expansion would materialize the whole O(B²) pair array inside one
    * row (measured 13× slower at 4.5M pairs). Two details carry the
    * performance (both measured on the 4.5M-pair fixture):
    *   - the probe side is explicitly repartitioned: a small dimension
    *     arrives as ONE parquet split, and a broadcast join inherits the
    *     probe side's partitioning — without the exchange the entire
    *     pair stream runs on one core (15.6 s → 1 s warm);
    *   - the bounded distance sits LAST in the join condition, after the
    *     cheap ordering + length-band conjuncts (|len a − len b| ≤ k is a
    *     Levenshtein lower bound), so it runs only on pairs that survive
    *     them — left as a post-filter Catalyst pushes it in FRONT of the
    *     cheap conjuncts.
    * The distance itself is Spark's THRESHOLD-bounded
    * `levenshtein(a, b, k)`: it abandons a pair as soon as the running
    * distance exceeds k, so cost per pair is O(k·min(len)) not O(len²) —
    * at a 100 TB corpus that bound is the difference between a feasible
    * and an impossible pass.
    *
    * `maxBlock` is the structural skew cap (the [[cappedPostings]]
    * contract applied to blocks): only each block's `maxBlock` lowest ids
    * participate, so a degenerate blocking key cannot go quadratic past
    * maxBlock² — production picks a key whose blocks fit the cap; the cap
    * is the guard rail, deterministic and oracle-mirrorable.
    */
  def editDistancePairs(
      df: DataFrame,
      blockCol: String,
      strCol: String,
      idCol: String = "doc_id",
      maxDist: Int = 2,
      maxBlock: Int = 10000): DataFrame = {
    require(maxDist >= 0, "maxDist must be >= 0")
    val shufflePartitions = df.sparkSession.sessionState.conf.numShufflePartitions
    val wBlk = Window.partitionBy(col(blockCol)).orderBy(col(idCol))
    val d = df
      .withColumn("_rnblk", row_number().over(wBlk))
      .filter(col("_rnblk") <= maxBlock)
      .select(col(blockCol).as("blk"), col(idCol).as("id"),
        col(strCol).as("s"), length(col(strCol)).as("len"))
    val a = d.select(col("blk"), col("id").as("id_a"), col("s").as("s_a"),
      col("len").as("len_a"))
      .repartition(shufflePartitions)
    val b = d.select(col("blk").as("blk_b"), col("id").as("id_b"),
      col("s").as("s_b"), col("len").as("len_b"))
    a.join(b, col("blk") === col("blk_b") && col("id_a") < col("id_b")
        && abs(col("len_a") - col("len_b")) <= maxDist
        && levenshtein(col("s_a"), col("s_b"), maxDist) >= 0)
      .select(col("blk"), col("id_a"), col("id_b"),
        levenshtein(col("s_a"), col("s_b"), maxDist).as("dist"))
  }

  // -- connected components: pairs → dedup groups ---------------------------

  /** Connected components over an undirected pair list (id_a, id_b):
    * returns one row per node that appears in any pair, labeled with the
    * minimum id reachable from it (`cluster_id`). Near-dup PAIRS are not
    * yet a dedup decision — A~B and B~C must collapse to one keep-document
    * even when A~C was never emitted — so this is the step that turns any
    * pairwise dedup family above into groups.
    *
    * Algorithm: min-label propagation with pointer jumping. Each round
    * (a) every node takes the min of its own label and its neighbors'
    * labels (one shuffle join + one aggregation), then (b) follows its
    * label one hop through the label table (labels are node ids, so
    * label←label[label] is a self-join) — the jump doubles the distance
    * information travels per round, so convergence is O(log diameter)
    * rounds instead of the O(diameter) of plain propagation (measured
    * 4 rounds vs 14 on the sf0.1 near-dup graph). Every round's frames
    * are `localCheckpoint`ed to truncate lineage (an unbounded iterative
    * plan re-executes every prior round at each action and overwhelms
    * the optimizer). The same round structure as large-star/small-star
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14); `maxIter` bounds adversarial graphs.
    */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String = "id_a",
      bCol: String = "id_b",
      maxIter: Int = 50,
      driverMaxPairs: Long = -1L): DataFrame = {
    // The pair list is the OUTPUT of near-dup detection — orders of
    // magnitude smaller than the corpus (a corpus where it isn't has
    // bigger problems than clustering). Below the edge threshold,
    // union-find on the driver beats launching O(log diameter) shuffle
    // rounds — the same small-side escape hatch as a broadcast join.
    // Above it, or for non-long ids, the distributed loop below is the
    // scale path. The default threshold (driverMaxPairs < 0) derives
    // from the driver's actual collect budget rather than a magic
    // constant: a quarter of spark.driver.maxResultSize at ~48 heap
    // bytes per collected two-long row, so the collect can never trip
    // the result-size guard (1g default → ~5.6M edges).
    val limit =
      if (driverMaxPairs >= 0) driverMaxPairs
      else {
        val bytes =
          try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
            pairs.sparkSession.conf.get("spark.driver.maxResultSize", "1g"))
          catch { case _: Throwable => 0L }
        if (bytes <= 0) 5000000L // unlimited/unparseable → fixed cap
        else bytes / 48 / 4
      }
    val idsAreLong = Seq(aCol, bCol).forall(c =>
      pairs.schema(c).dataType == org.apache.spark.sql.types.LongType)
    if (idsAreLong && pairs.persist().count() <= limit) {
      val spark = pairs.sparkSession
      val edgeList = pairs.select(col(aCol), col(bCol)).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      pairs.unpersist()
      val parent = new scala.collection.mutable.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x // path compression
        while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      edgeList.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // roots are already component minima (unions always point max → min)
      val rows = parent.keysIterator.map(id => (id, find(id))).toSeq
      import spark.implicits._
      return rows.toDF("id", "cluster_id")
    }
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .persist()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("cluster_id", col("id"))
      .localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // min label over the node's neighborhood (every node in `edges` has
      // at least one neighbor, so the inner join keeps every node)
      val nbrMin = edges
        .join(labels.select(col("id").as("dst"), col("cluster_id").as("nl")), "dst")
        .groupBy(col("src").as("id")).agg(min("nl").as("nl"))
      // the change flag rides in the propagation select, so convergence
      // detection costs a scan of the (already materialized) checkpoint
      // instead of a second join against the previous labels
      val prop = labels.join(nbrMin, Seq("id"))
        .select(col("id"), least(col("cluster_id"), col("nl")).as("cluster_id"),
          (col("nl") < col("cluster_id")).as("_chg"))
        .localCheckpoint()
      val changed = prop.filter(col("_chg")).limit(1).count()
      if (changed == 0) {
        // propagation is a fixpoint → labels[labels] = labels; skip the jump
        labels = prop.drop("_chg")
        converged = true
      } else {
        // pointer jump: cluster_id is itself a node id, so one self-join
        // replaces it with that node's (smaller-or-equal) label
        labels = prop
          .join(prop.select(col("id").as("cluster_id"), col("cluster_id").as("_jump")),
            Seq("cluster_id"))
          .select(col("id"), col("_jump").as("cluster_id"))
          .localCheckpoint()
      }
      i += 1
    }
    edges.unpersist()
    pairs.unpersist()
    labels
  }

  /** End-to-end dedup grouping: n-gram-Jaccard near-dup pairs →
    * connected components → one row per multi-document cluster with the
    * canonical keep id (cluster min), member count, and the sorted member
    * list (comma-joined, so the output stays flat and hash-comparable).
    */
  def dupClusters(
      docs: DataFrame,
      blockCol: String,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleK: Int = 3,
      threshold: Double = 0.5,
      maxBucket: Int = 1000): DataFrame =
    dupClustersOf(connectedComponents(
      ngramJaccardPairs(docs, blockCol, textCol, idCol, shingleK,
        threshold, maxBucket)))

  /** [[dupClusters]] over precomputed (id, cluster_id) labels — the
    * cluster rollup alone. Clustering consumers (cluster listing, size
    * histogram, keep-best, leakage split) should share ONE persisted
    * label build; the pairs + components iteration is the entire cost.
    */
  def dupClustersOf(labels: DataFrame): DataFrame =
    labels
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_members"),
        array_join(transform(array_sort(collect_list(col("id"))),
          x => x.cast("string")), ",").as("members"))

  /** Dedup that KEEPS the best member of every near-dup cluster instead
    * of an arbitrary one: cluster by n-gram Jaccard, rank members by
    * `scoreCol` (ties to the lowest id), drop everything but each
    * cluster's winner. Singletons — documents in no cluster — pass
    * through untouched via the final anti join, so the operator never
    * rewrites the surviving corpus, only subtracts losers (at 100 TB the
    * loser set is the small side; survivors never shuffle).
    */
  def keepBest(
      docs: DataFrame,
      blockCol: String,
      scoreCol: String,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleK: Int = 3,
      threshold: Double = 0.5,
      maxBucket: Int = 1000): DataFrame =
    keepBestOf(docs,
      connectedComponents(ngramJaccardPairs(docs, blockCol, textCol, idCol,
        shingleK, threshold, maxBucket)),
      scoreCol, idCol)

  /** [[keepBest]] over precomputed (id, cluster_id) labels. */
  def keepBestOf(
      docs: DataFrame,
      labels: DataFrame,
      scoreCol: String,
      idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy("cluster_id")
      .orderBy(col(scoreCol).desc, col(idCol))
    val losers = docs.join(labels, docs(idCol) === labels("id"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") > 1)
      .select(col(idCol).as("_loser"))
    docs.join(losers, docs(idCol) === col("_loser"), "left_anti")
  }

  /** Leakage-safe train/val/test split: assign the split per NEAR-DUP
    * CLUSTER, not per document, so two near-identical documents can never
    * land on opposite sides of a train/eval boundary (per-doc random
    * splits leak eval content into training through duplicates — the
    * classic contamination bug this operator exists to prevent).
    *
    * Mechanics: n-gram-Jaccard pairs → connected components → every doc
    * joins its cluster label (singletons fall back to their own id), and
    * the split is a pure function of the cluster id — the first 8 hex
    * chars of md5(cluster_id) read as a uniform 32-bit integer compared
    * against fraction cut-points. Deterministic across engines, runs and
    * partitionings; adding documents never flips an existing cluster's
    * split (the hash has no corpus-global state).
    *
    * Scale: the label table is only the docs that appear in a pair (the
    * small output of dedup detection); one key join re-attaches it and
    * the hash assignment is map-only — nothing here adds a shuffle
    * beyond the pair machinery itself.
    */
  def leakageSafeSplit(
      docs: DataFrame,
      blockCol: String,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleK: Int = 3,
      threshold: Double = 0.5,
      maxBucket: Int = 1000,
      trainFrac: Double = 0.8,
      valFrac: Double = 0.1): DataFrame =
    leakageSafeSplitOf(docs,
      connectedComponents(ngramJaccardPairs(docs, blockCol, textCol, idCol,
        shingleK, threshold, maxBucket)),
      idCol, trainFrac, valFrac)

  /** [[leakageSafeSplit]] over precomputed (id, cluster_id) labels. */
  def leakageSafeSplitOf(
      docs: DataFrame,
      labels: DataFrame,
      idCol: String = "doc_id",
      trainFrac: Double = 0.8,
      valFrac: Double = 0.1): DataFrame = {
    val (trainCut, valCut) = splitCuts(trainFrac, valFrac)
    docs.join(labels, docs(idCol) === labels("id"), "left")
      .drop("id")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col(idCol)))
      .withColumn("_u",
        conv(substring(md5(col("cluster_id").cast("string")), 1, 8), 16, 10)
          .cast("long"))
      .withColumn("split",
        when(col("_u") < trainCut, "train")
          .when(col("_u") < valCut, "val")
          .otherwise("test"))
      .drop("_u")
  }

  /** The split cut-points as exact integers on the md5-prefix scale, so
    * the oracle SQL can inline the very same constants (floating-point
    * rounding must happen exactly once, here).
    */
  def splitCuts(trainFrac: Double, valFrac: Double): (Long, Long) = {
    val scale = 4294967296.0 // 2^32: range of an 8-hex-char md5 prefix
    (math.floor(trainFrac * scale).toLong,
      math.floor((trainFrac + valFrac) * scale).toLong)
  }

  /** Per-document novelty score: the fraction of a document's distinct
    * k-shingles that occur in NO other document. Low novelty flags
    * boilerplate and template text that repetition filters miss (the
    * repeats live across documents, not within one); it is also the
    * standard memorization-risk proxy when the corpus is training data.
    *
    * Scale shape: explode to (doc, shingle) grain, one groupBy computes
    * each shingle's document frequency, and one join on the shingle key
    * brings it back — the same vocabulary-keyed join as TF-IDF's df
    * (NOT broadcast: the shingle vocabulary grows with the corpus). No
    * document ever compares against another document.
    */
  def shingleNovelty(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleK: Int = 5): DataFrame = {
    graft.plans.GraftFunctions.register(docs.sparkSession)
    val ds = docs
      .select(col(idCol), explode(shingles(col(textCol), shingleK)).as("s"))
      .distinct()
    val dfreq = ds.groupBy("s").agg(count(lit(1)).as("_df"))
    ds.join(dfreq, Seq("s"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("_df") === 1, 1L).otherwise(0L)).as("n_unique"),
        round(avg(when(col("_df") === 1, 1.0).otherwise(0.0)), 6)
          .as("novelty"))
  }

  /** Benchmark decontamination: drop every corpus document that shares at
    * least one k-shingle with the benchmark set (the training-data hygiene
    * pass that keeps eval questions out of the corpus). The benchmark's
    * distinct shingles are the small side: explode both, one semi join on
    * the shingle key marks contaminated ids, one anti join subtracts them
    * — no pairwise comparison anywhere.
    */
  def decontaminate(
      docs: DataFrame,
      benchmark: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleK: Int = 5): DataFrame = {
    graft.plans.GraftFunctions.register(docs.sparkSession)
    val bsh = benchmark
      .select(explode(shingles(col(textCol), shingleK)).as("s")).distinct()
    val contaminated = docs
      .select(col(idCol), explode(shingles(col(textCol), shingleK)).as("s"))
      .join(bsh, Seq("s"), "left_semi")
      .select(col(idCol).as("_contaminated")).distinct()
    docs.join(contaminated, docs(idCol) === col("_contaminated"), "left_anti")
  }

  // -- 5: SimHash ----------------------------------------------------------

  /** 64-bit SimHash of the token stream: hash each token once, accumulate
    * ±1 per bit lane, sign → bit. No shuffle. Native codegen'd loop
    * ([[graft.functions.SimHash64]]); bit-identical to [[simhashHof]].
    */
  def simhash(text: Column): Column =
    call_function("graft_simhash", TextAnalysis.tokens(lower(text)))

  /** [[simhash]] as one interpreted higher-order fold — the portable
    * fallback and differential-test partner (see [[minhashSignatureHof]]
    * on why the single-fold shape matters even interpreted).
    */
  def simhashHof(text: Column): Column = {
    val lanes = sequence(lit(0), lit(63)) // foldable → constant
    val counters = aggregate(
      transform(TextAnalysis.tokens(lower(text)), t => xxhash64(t)),
      array_repeat(lit(0), 64),
      (acc, h) => zip_with(acc, lanes, (c, j) =>
        c + when(call_function("shiftright", h, j).bitwiseAND(1) === 1, 1)
          .otherwise(-1)))
    aggregate(
      zip_with(counters, lanes, (c, j) =>
        when(c > 0, call_function("shiftleft", lit(1L), j)).otherwise(0L)),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** ENGINE-PORTABLE SimHash: 60-bit signature over md5-derived token
    * hashes (the first 15 md5 hex chars parsed as an integer — the one
    * hash construction Spark and DuckDB can both compute, cf. the
    * portable winnowing twin). Same ±1-per-lane majority vote as
    * [[simhash]]. Native codegen'd loop ([[graft.functions.SimHashMd5]]);
    * bit-identical to [[simhashPortableHof]]. Empty token arrays are the
    * caller's concern (the portable pair op below excludes them on both
    * engines).
    */
  def simhashPortable(ts: Column): Column =
    call_function("graft_simhash_md5", ts)

  /** [[simhashPortable]] as one interpreted higher-order fold — the
    * differential-test partner.
    */
  def simhashPortableHof(ts: Column): Column = {
    val lanes = sequence(lit(0), lit(59)) // foldable → constant
    val counters = aggregate(
      transform(ts, t => conv(substring(md5(t), 1, 15), 16, 10).cast("long")),
      array_repeat(lit(0), 60),
      (acc, h) => zip_with(acc, lanes, (c, j) =>
        c + when(call_function("shiftright", h, j).bitwiseAND(1) === 1, 1)
          .otherwise(-1)))
    aggregate(
      zip_with(counters, lanes, (c, j) =>
        when(c > 0, call_function("shiftleft", lit(1L), j)).otherwise(0L)),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** [[simhashNearDups]] with the portable signature: 60-bit simhash in
    * four 15-bit chunks (pigeonhole: ≤3 differing bits leave one chunk
    * identical; candidates past that ride chunk collisions, identically
    * in both engines) — the oracle-checkable twin of the xxhash64 native
    * path. Documents with no tokens are excluded (a shared all-zero
    * signature would pair every empty doc with every other).
    */
  def simhashNearDupsPortable(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      maxDist: Int = 3,
      maxBucket: Int = 1000): DataFrame = {
    graft.plans.GraftFunctions.register(docs.sparkSession)
    val toks = array_remove(TextAnalysis.tokens(lower(col(textCol))), "")
    val sigd = docs
      .filter(size(toks) > 0)
      .select(col(idCol).as("id"), simhashPortable(toks).as("sig"))
    val chunked = sigd.select(
      col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(3)),
        c => call_function("shiftright", col("sig"), c * 15).bitwiseAND(0x7fffL))))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "ckey")
    cappedPostings(chunked, Seq("chunk", "ckey"),
      struct(col("id"), col("sig")), maxBucket)
      .select(explode(flatten(transform(col("ps"), (x, i) =>
        transform(slice(col("ps"), i + lit(2), size(col("ps"))),
          y => struct(x.getField("id").as("id_a"), y.getField("id").as("id_b"),
            hamming64(x.getField("sig"), y.getField("sig")).as("dist")))))).as("p"))
      .select(col("p.id_a"), col("p.id_b"), col("p.dist"))
      .distinct()
      .filter(col("dist") <= maxDist)
  }

  /** Near-dup pairs with Hamming distance ≤ maxDist, blocked on 16-bit
    * signature chunks (pigeonhole: ≤3 differing bits over 4 chunks leaves
    * at least one chunk identical).
    */
  def simhashNearDups(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      maxDist: Int = 3,
      maxBucket: Int = 1000): DataFrame = {
    graft.plans.GraftFunctions.register(docs.sparkSession)
    val sigd = docs.select(col(idCol).as("id"), simhash(col(textCol)).as("sig"))
    val chunked = sigd.select(
      col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(3)),
        c => call_function("shiftright", col("sig"), c * 16).bitwiseAND(0xffffL))))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "ckey")
    // pairs expand from a per-chunk-key sorted, capped (id, sig) posting
    // list — one shuffle, signatures computed once (a self-join evaluates
    // the signature subtree per side); the 8-byte sig rides along free.
    // A corpus of identical signatures (all-empty docs) caps at maxBucket
    // per chunk key instead of collecting the corpus on one reducer.
    cappedPostings(chunked, Seq("chunk", "ckey"),
      struct(col("id"), col("sig")), maxBucket)
      .select(explode(flatten(transform(col("ps"), (x, i) =>
        transform(slice(col("ps"), i + lit(2), size(col("ps"))),
          y => struct(x.getField("id").as("id_a"), y.getField("id").as("id_b"),
            hamming64(x.getField("sig"), y.getField("sig")).as("dist")))))).as("p"))
      .select(col("p.id_a"), col("p.id_b"), col("p.dist"))
      .distinct()
      .filter(col("dist") <= maxDist)
  }

  // -- 6: embedding cosine near-dup -----------------------------------------

  /** Cosine near-duplicate pairs over an embedding column, blocked by
    * random-hyperplane LSH sign buckets (see [[Similarity.hyperplanes]]),
    * verified exactly. At scale: one shuffle on the bucket key; pairs
    * expand from a per-bucket sorted posting list (vectors and norms are
    * computed once — a self-join evaluates them per side), capped at
    * `maxBucket` entries BEFORE collection (see [[cappedPostings]]) so a
    * degenerate bucket (e.g. a corpus-wide constant embedding) neither
    * buffers the corpus' vectors on one reducer nor expands quadratically.
    */
  def embeddingNearDups(
      emb: DataFrame,
      vecCol: String = "embedding",
      idCol: String = "vec_id",
      dim: Int = 64,
      nPlanes: Int = 0,
      threshold: Double = 0.95,
      seed: Long = 42L,
      maxBucket: Int = 1000,
      targetOccupancy: Int = 32): DataFrame = {
    graft.plans.GraftFunctions.register(emb.sparkSession)
    // nPlanes <= 0 → derive from corpus size at a constant expected
    // occupancy (see [[Similarity.autoPlanes]]): a fixed plane count
    // lets buckets — and the per-bucket quadratic pair budget — grow
    // linearly with the corpus. The count is parquet-metadata cheap.
    val np =
      if (nPlanes > 0) nPlanes
      else Similarity.autoPlanes(emb.count(), targetOccupancy)
    // norms are computed once per vector on the narrow side; each candidate
    // pair then costs a single dot product instead of a full cosine
    val bucketed = emb.select(
      Similarity.lshBucket(col(vecCol), Similarity.hyperplanes(dim, np, seed)).as("bucket"),
      col(idCol).as("id"), col(vecCol).as("v"),
      VectorFunctions.l2Norm(col(vecCol)).as("nrm"))
    cappedPostings(bucketed, Seq("bucket"),
      struct(col("id"), col("v"), col("nrm")), maxBucket)
      .select(explode(flatten(transform(col("ps"), (x, i) =>
        transform(slice(col("ps"), i + lit(2), size(col("ps"))), y =>
          struct(x.getField("id").as("id_a"), y.getField("id").as("id_b"),
            when(x.getField("nrm") * y.getField("nrm") === 0.0, lit(0.0))
              .otherwise(VectorFunctions.dot(x.getField("v"), y.getField("v")) /
                (x.getField("nrm") * y.getField("nrm"))).as("cos")))))).as("p"))
      .select(col("p.id_a"), col("p.id_b"), col("p.cos"))
      .filter(col("cos") >= threshold)
  }

  /** Repeated-substring (boilerplate) span removal, the exact-match form
    * of substring-level dedup (Lee et al. 2022 "Deduplicating Training
    * Data Makes Language Models Better" §4 — suffix-array spans; here the
    * fixed-width k-token window variant): every k-token window whose
    * shingle occurs in at least `minDf` DISTINCT documents is marked, and
    * overlapping/adjacent marked windows are merged into maximal spans per
    * document (islands-and-gaps over the window start positions). Returns
    * one row per document with its token count, merged-span count, tokens
    * covered by removed spans and the surviving-token ratio.
    *
    * Scale shape: positional windows explode to one row per token — the
    * same linear blow-up every shingle pass here already pays — and the
    * document frequency is a single shingle-keyed aggregation; flagged
    * windows come back through one join on the shingle key (never
    * doc-vs-doc). The span merge is a per-document window over only the
    * FLAGGED positions, so its sort is bounded by the boilerplate volume,
    * not the corpus.
    */
  def stripRepeatedSpans(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleK: Int = 5,
      minDf: Long = 3L): DataFrame = {
    graft.plans.GraftFunctions.register(docs.sparkSession)
    val ts = graft.operators.TextAnalysis.tokens(lower(col(textCol)))
    val toks = docs.select(col(idCol), ts.as("t"))
    // positional k-gram window HASHES in one native pass
    // (graft_word_gram_hashes: position i covers tokens [i, i+k-1], docs
    // shorter than k yield none) — the window string exists only inside
    // the expression eval, so the explode emits 8-byte longs, and the
    // k−1 interpreted zip_with array allocations per row of the former
    // HOF chain are gone (isolated A/B in PLANS.md round 7). `spans`
    // feeds BOTH the document-frequency aggregation and the flag join —
    // the lazy local checkpoint materializes the exploded frame once at
    // first use and both consumers read the stored blocks.
    val spans = docs.select(col(idCol),
      posexplode(call_function("graft_word_gram_hashes", ts, lit(shingleK)))
        .as(Seq("pos", "s")))
      .localCheckpoint(eager = false)
    val dfreq = spans.select(col(idCol), col("s")).distinct()
      .groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
    val flagged = spans.join(dfreq.select("s"), Seq("s"))
      .select(col(idCol), col("pos").as("st"),
        (col("pos") + (shingleK - 1)).as("en"))
    val byDoc = Window.partitionBy(idCol).orderBy("st")
    val pmax = max("en")
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val merged = flagged
      .withColumn("brk",
        when(pmax.isNull || col("st") > pmax + 1, 1L).otherwise(0L))
      .withColumn("g", sum("brk")
        .over(byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("g"))
      .agg(min("st").as("st"), max("en").as("en"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_spans"),
        sum(col("en") - col("st") + 1).as("tokens_removed"))
    toks.select(col(idCol), size(col("t")).cast("long").as("n_tokens"))
      .join(merged, Seq(idCol), "left_outer")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("tokens_removed"), lit(0L)).as("tokens_removed"),
        round((col("n_tokens") - coalesce(col("tokens_removed"), lit(0L)))
          .cast("double") / col("n_tokens"), 6).as("keep_ratio"))
  }

  /** Corpus-level span dedup WITH document rewrite — the C4/RefinedWeb
    * pipeline shape: text is cut into NON-overlapping `spanTokens`-token
    * spans (the last span may be short), every distinct span value keeps
    * exactly its first occurrence in (doc_id, span_idx) order, and each
    * document is re-emitted with its dropped spans removed. Differs from
    * [[stripRepeatedSpans]] (a report over overlapping windows) in that
    * the deliverable is the rewritten corpus itself, one surviving copy
    * of every duplicated span included.
    *
    * Scale shape: the explode emits one row per span — a k-fold REDUCTION
    * of the token count, not a blow-up — keyed by the span's xxhash64, so
    * the keeper aggregation and the drop join shuffle 8-byte longs, never
    * span strings (collision odds ~n²/2⁶⁴, deterministic; same trade the
    * substring screen's hashed-gram key records in PLANS.md). Keep-first
    * is a hash-keyed min(struct(doc, idx)) aggregation — no window, so a
    * corpus-wide boilerplate span partial-aggregates map-side instead of
    * buffering one giant partition. Only the dropped (doc, idx) pairs
    * travel back; the rewrite re-derives span text locally from the
    * document row, so text never shuffles at all.
    */
  def spanDedupRewrite(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      spanTokens: Int = 10): DataFrame = {
    val k = spanTokens
    val base = docs.select(col(idCol),
      split(trim(col(textCol)), "\\s+").as("t"))
    // ceil(len/k) in integer arithmetic; split("") yields [""], so the
    // token array is never empty and nSp >= 1 (no descending sequence).
    val nSp = ((size(col("t")) + (k - 1)) / k).cast("int")
    def spanArr: Column = transform(sequence(lit(0), nSp - 1),
      i => array_join(slice(col("t"), i * k + 1, lit(k)), " "))
    val spans = base
      .select(col(idCol), posexplode(spanArr).as(Seq("span_idx", "sp")))
      .select(col(idCol), col("span_idx"), xxhash64(col("sp")).as("h"))
      .localCheckpoint(eager = false) // feeds keeper agg AND drop join
    val first = spans.groupBy("h")
      .agg(min(struct(col(idCol), col("span_idx"))).as("f"))
    val dropped = spans.join(first, Seq("h"))
      .filter(col("f").getField(idCol) =!= col(idCol) ||
        col("f").getField("span_idx") =!= col("span_idx"))
      .groupBy(idCol)
      .agg(collect_list("span_idx").as("drop_idx"),
        count(lit(1)).as("n_dropped"))
    base.join(dropped, Seq(idCol), "left_outer")
      .select(col(idCol),
        nSp.cast("long").as("n_spans"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
        array_join(
          filter(spanArr, (_, i) => !array_contains(
            coalesce(col("drop_idx"), array().cast("array<int>")), i)),
          " ").as("text_kept"))
  }
}
