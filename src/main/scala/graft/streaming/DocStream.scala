package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.operators.Dedup

/** Streaming ingest dedup against a static corpus index — the admission
  * gate of a 100 TB training-data pipeline: documents arrive as a stream,
  * and each micro-batch is checked against the ALREADY-ACCEPTED corpus
  * before it is allowed in.
  *
  * Shape: the corpus side is banded ONCE into a minhash bucket index
  * (static DataFrame, broadcastable when the band index is small, shuffle
  * join when it is not); the stream side computes the same portable
  * signature per arriving document and stream–static joins on the band
  * bucket. The join is STATELESS — no watermark, no state store — because
  * the corpus index carries all the memory; that is what keeps the
  * streaming side viable on an unbounded ingest (contrast a stream–stream
  * self-join, whose state grows with the stream).
  *
  * Candidates are verified with exact Jaccard against the colliding
  * corpus doc before a document is declared a duplicate — banding alone
  * admits false positives by design.
  */
object DocStream {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Corpus-side band index: (band, bucket, id, shingles). Built once,
    * reused by every micro-batch.
    */
  def bandIndex(docs: DataFrame, numHashes: Int = 64, bands: Int = 16): DataFrame = {
    graft.plans.GraftFunctions.register(docs.sparkSession)
    bandIndexFromSigs(Dedup.minhashPortableSigs(docs, numHashes = numHashes),
      numHashes, bands)
  }

  /** [[bandIndex]] over an already-signed (id, sh, sig) relation — lets
    * the caller feed the SHARED portable-signature scan (the same memo
    * the batch dedup family rides) instead of re-hashing the corpus for
    * the streaming gate's index.
    */
  def bandIndexFromSigs(sigs: DataFrame, numHashes: Int = 64,
      bands: Int = 16): DataFrame = {
    val rows = numHashes / bands
    sigs
      .select(col("id").as("c_id"), col("sh").as("c_sh"),
        col("sig").as("c_sig"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => concat_ws(",", slice(col("sig"), b * rows + 1, lit(rows))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
  }

  /** The arriving-document stream (glob-filtered file source). */
  private def docStream(spark: SparkSession, sfDir: String): DataFrame =
    spark.readStream.schema(docSchema)
      .option("pathGlobFilter", "documents.parquet").parquet(sfDir)

  /** Start the admission gate: every arriving doc that shares a band
    * bucket with a DIFFERENT corpus doc and verifies at Jaccard ≥
    * `threshold` is emitted as (doc_id, dup_of, jaccard) — the reject
    * stream a dedup-at-ingest pipeline acts on.
    */
  def startLshDedupStream(
      spark: SparkSession,
      sfDir: String,
      index: DataFrame,
      queryName: String,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5): StreamingQuery = {
    graft.plans.GraftFunctions.register(spark)
    val rows = numHashes / bands
    def bandKeys(sig: Column): Column =
      transform(sequence(lit(0), lit(bands - 1)),
        b => concat_ws(",", slice(sig, b * rows + 1, lit(rows))))
    val arriving = docStream(spark, sfDir)
      .select(col("doc_id").as("s_id"), Dedup.shingles(col("text")).as("s_sh"))
      .withColumn("sig", Dedup.minhashSignaturePortable(col("s_sh"), numHashes))
      .select(col("s_id"), col("s_sh"), col("sig"),
        posexplode(bandKeys(col("sig"))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    // The static side is split so the stream-static joins stay map-side:
    // a SLIM (band, bucket, c_id) bucket index finds collisions without
    // dragging corpus shingle arrays through a shuffle, and the
    // (c_id, c_sh, c_sig) relation joins back ONLY for colliding pairs.
    // Both broadcast at this corpus size; at 100 TB the same
    // two-relation split runs as shuffles over a bucket-partitioned
    // index layout.
    val bucketIdx = broadcast(index.select("band", "bucket", "c_id"))
    // every c_id appears exactly once per band, so band 0 IS the distinct
    // corpus relation — a narrow filter, not a dropDuplicates shuffle
    val corpusSh = broadcast(index.filter(col("band") === 0)
      .select("c_id", "c_sh", "c_sig"))
    arriving
      .join(bucketIdx, Seq("band", "bucket"))
      .filter(col("s_id") =!= col("c_id"))
      .join(corpusSh, Seq("c_id"))
      // A near-dup pair collides in MANY bands; emit it from its FIRST
      // matching band only — computable per row from the two signatures
      // (no keyed state, so the stream stays 100% STATELESS on an
      // unbounded ingest; a streaming dropDuplicates would grow state
      // without bound) — so the expensive true-Jaccard verify below runs
      // once per candidate pair instead of once per colliding band
      // (measured 11,150 -> distinct-pair candidates at sf0.1).
      .filter(col("band") === array_position(
        zip_with(bandKeys(col("sig")), bandKeys(col("c_sig")),
          (a, b) => a === b), lit(true)) - 1)
      .select(col("s_id"), col("c_id"),
        Dedup.jaccard(col("s_sh"), col("c_sh")).as("j"))
      .filter(col("j") >= threshold)
      .select(col("s_id").as("doc_id"), col("c_id").as("dup_of"),
        round(col("j"), 6).as("jaccard"))
      .writeStream.outputMode("append").format("memory").queryName(queryName)
      .option("checkpointLocation", EventStream.freshCheckpoint(queryName))
      .trigger(Trigger.AvailableNow()).start()
  }
}
