package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned data layout: the write-side half of partition pruning.
  * The reference's only storage layout is "whatever PostgreSQL does"
  * (SURVEY.md §2.1); at 100 TB the dominant cost is which files a query
  * does NOT read, and that is decided when the data is WRITTEN.
  *
  * Hive-style `partitionBy(day)` turns an equality/range predicate on the
  * partition column into directory pruning — the scan's `PartitionFilters`
  * — so a one-day query over a year of events touches 1/365th of the
  * files before a single row is decoded. Complementary to Z-ordering
  * (`Scale.writeZOrdered`), which optimizes WITHIN-file skipping on
  * non-partition columns.
  */
object Layout {

  /** Write events partitioned by calendar day of `ts`. `repartition` on
    * the partition key first: without it every input task writes a file
    * into every day directory (tasks × days small files — the classic
    * small-file explosion); with it each day is one task's output.
    */
  def writeDayPartitioned(events: DataFrame, path: String): Unit =
    events
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .repartition(col("day"))
      .write.mode("overwrite").partitionBy("day").parquet(path)

  /** Read back with a partition predicate — prunes directories, never
    * opens non-matching files.
    */
  def readDays(spark: SparkSession, path: String, days: Seq[String]): DataFrame =
    spark.read.parquet(path).filter(col("day").isin(days: _*))

  /** Compact a directory of small files into ~`targetRowsPerFile`-row
    * files. Streaming ingest and over-parallel writes leave thousands of
    * tiny files per partition; at 100 TB the metadata and open() overhead
    * of small files dominates scan time long before bytes do. One count
    * to size the job, one shuffle-free coalesce when shrinking (falls
    * back to repartition only when the input has too FEW tasks), one
    * rewrite. Returns the compacted file count.
    */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetRowsPerFile: Long = 1000000L): Int = {
    val df = spark.read.parquet(inPath)
    val rows = df.count()
    val nFiles = math.max(1, math.ceil(rows.toDouble / targetRowsPerFile).toInt)
    val inParts = df.rdd.getNumPartitions
    val sized =
      if (nFiles <= inParts) df.coalesce(nFiles) // narrow, no shuffle
      else df.repartition(nFiles)
    sized.write.mode("overwrite").parquet(outPath)
    new java.io.File(outPath).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
  }
}
