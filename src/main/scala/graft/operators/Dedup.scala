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
    */
  def normalized(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", " "), "\\s+", " "))

  def normalizedDedup(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(normalized(col(textCol))).orderBy(col(idCol))
    docs.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  // -- shingling -----------------------------------------------------------

  /** Distinct k-word shingles of the whitespace-token stream. Empty-safe:
    * texts shorter than k tokens yield a single whole-text shingle.
    */
  def shingles(text: Column, k: Int = 3): Column = {
    val ts = TextAnalysis.tokens(lower(text))
    val n = size(ts)
    when(n < k, array(concat_ws(" ", ts))).otherwise(
      array_distinct(transform(
        sequence(lit(0), n - k),
        i => concat_ws(" ", slice(ts, i + 1, lit(k))))))
  }

  /** Jaccard similarity of two shingle-set columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0.0, 0.0).otherwise(inter / uni)
  }

  // -- 4: MinHash + LSH ----------------------------------------------------

  /** 64-lane minhash signature of a shingle array. Lane j hashes each
    * shingle with a lane-distinct key (xxhash64 over the lane-prefixed
    * shingle) and keeps the minimum — an independent hash family per lane,
    * all inside a single codegen'd expression tree. No multiplication, so
    * it is safe under ANSI overflow checking.
    */
  def minhashSignature(shingleCol: Column, numHashes: Int = 64): Column =
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      j => array_min(transform(
        shingleCol,
        s => xxhash64(concat_ws("", j, s)))))

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
    val rows = numHashes / bands
    val sigd = docs
      .select(col(idCol).as("id"), shingles(col(textCol), shingleK).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
    val banded = sigd.select(
      col("id"), col("sh"),
      posexplode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws(",", slice(col("sig"), b * rows + 1, lit(rows)))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    // Cap degenerate buckets so one hot key can't create an O(n²) reducer.
    val wB = Window.partitionBy(col("band"), col("bucket")).orderBy(col("id"))
    val capped = banded.withColumn("_rn", row_number().over(wB))
      .filter(col("_rn") <= maxBucket).drop("_rn")
    val l = capped.select(col("band"), col("bucket"), col("id").as("id_a"), col("sh").as("sh_a"))
    val r = capped.select(col("band"), col("bucket"), col("id").as("id_b"), col("sh").as("sh_b"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .distinct()
      .filter(col("jaccard") >= threshold)
  }

  /** Direct n-gram Jaccard near-dup over an explicit blocking key (e.g.
    * `source`) — the non-probabilistic baseline for small blocks.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      blockCol: String,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleK: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val d = docs.select(
      col(blockCol).as("blk"), col(idCol).as("id"),
      shingles(col(textCol), shingleK).as("sh"))
    val l = d.select(col("blk"), col("id").as("id_a"), col("sh").as("sh_a"))
    val r = d.select(col("blk"), col("id").as("id_b"), col("sh").as("sh_b"))
    l.join(r, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), round(jaccard(col("sh_a"), col("sh_b")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // -- 5: SimHash ----------------------------------------------------------

  /** 64-bit SimHash of the token stream: per token take xxhash64 bits,
    * accumulate +1/−1 per bit lane, sign → bit. Single aggregate
    * expression, no shuffle.
    */
  def simhash(text: Column): Column = {
    val ts = TextAnalysis.tokens(lower(text))
    val counters = aggregate(
      ts,
      array_repeat(lit(0), 64),
      (acc, t) => zip_with(
        acc,
        transform(sequence(lit(0), lit(63)),
          j => when(call_function("shiftright", xxhash64(t), j).bitwiseAND(1) === 1, 1).otherwise(-1)),
        (a, b) => a + b))
    aggregate(
      zip_with(counters, sequence(lit(0), lit(63)),
        (c, j) => when(c > 0, call_function("shiftleft", lit(1L), j)).otherwise(0L)),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Near-dup pairs with Hamming distance ≤ maxDist, blocked on 16-bit
    * signature chunks (pigeonhole: ≤3 differing bits over 4 chunks leaves
    * at least one chunk identical).
    */
  def simhashNearDups(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      maxDist: Int = 3): DataFrame = {
    val sigd = docs.select(col(idCol).as("id"), simhash(col(textCol)).as("sig"))
    val chunked = sigd.select(
      col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(3)),
        c => call_function("shiftright", col("sig"), c * 16).bitwiseAND(0xffffL))))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "ckey")
    val l = chunked.select(col("chunk"), col("ckey"), col("id").as("id_a"), col("sig").as("sig_a"))
    val r = chunked.select(col("chunk"), col("ckey"), col("id").as("id_b"), col("sig").as("sig_b"))
    l.join(r, Seq("chunk", "ckey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming64(col("sig_a"), col("sig_b")).as("dist"))
      .distinct()
      .filter(col("dist") <= maxDist)
  }

  // -- 6: embedding cosine near-dup -----------------------------------------

  /** Cosine near-duplicate pairs over an embedding column, blocked by
    * random-hyperplane LSH sign buckets (see [[Similarity.hyperplanes]]),
    * verified exactly. At scale: one shuffle on the bucket key.
    */
  def embeddingNearDups(
      emb: DataFrame,
      vecCol: String = "embedding",
      idCol: String = "vec_id",
      dim: Int = 64,
      nPlanes: Int = 8,
      threshold: Double = 0.95,
      seed: Long = 42L): DataFrame = {
    val bucketed = emb.select(
      col(idCol).as("id"), col(vecCol).as("v"),
      Similarity.lshBucket(col(vecCol), Similarity.hyperplanes(dim, nPlanes, seed)).as("bucket"))
    val l = bucketed.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val r = bucketed.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    l.join(r, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        VectorFunctions.cosine(col("v_a"), col("v_b")).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
