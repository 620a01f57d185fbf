package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    val rows = numHashes / bands
    docs.select(col("doc_id").as("c_id"), Dedup.shingles(col("text")).as("c_sh"))
      .withColumn("sig", Dedup.minhashSignaturePortable(col("c_sh"), numHashes))
      .select(col("c_id"), col("c_sh"),
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
    val arriving = docStream(spark, sfDir)
      .select(col("doc_id").as("s_id"), Dedup.shingles(col("text")).as("s_sh"))
      .withColumn("sig", Dedup.minhashSignaturePortable(col("s_sh"), numHashes))
      .select(col("s_id"), col("s_sh"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => concat_ws(",", slice(col("sig"), b * rows + 1, lit(rows))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    arriving
      .join(index, Seq("band", "bucket"))
      .filter(col("s_id") =!= col("c_id"))
      .select(col("s_id"), col("c_id"),
        Dedup.jaccard(col("s_sh"), col("c_sh")).as("j"))
      .filter(col("j") >= threshold)
      // the same pair may verify in several bands; emitting the
      // multiplicity keeps the stream 100% STATELESS (a streaming
      // dropDuplicates would grow keyed state without bound on an
      // unbounded ingest) — the consumer collapses it with a batch
      // DISTINCT over the sink
      .select(col("s_id").as("doc_id"), col("c_id").as("dup_of"),
        round(col("j"), 6).as("jaccard"))
      .writeStream.outputMode("append").format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow()).start()
  }
}
