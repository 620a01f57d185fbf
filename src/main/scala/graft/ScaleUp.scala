package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-probe fixture builder: replicate an sf directory N× with
  * consistently shifted keys, so the bench can measure how every query's
  * wall-clock grows with data volume (a super-linear query has a plan
  * problem the small SF hides). Dimension tables (region/nation) are NOT
  * replicated — they stay genuinely dimension-sized, like production.
  *
  * `events.ts` is re-emitted as a plain int64 of nanoseconds so the
  * replica round-trips through `Tables.loadEvents` exactly like the
  * driver fixtures (which are parquet TIMESTAMP(NANOS)).
  *
  * Usage: `runMain graft.ScaleUp [srcDir] [outDir] [copies]`
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft_sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stride = 100000000L // far above any fixture key

    def replicate(name: String, keyCols: Seq[String]): Unit = {
      val base = graft.engine.Tables.load(spark, src, name)
      val shifted = (0 until copies).map { i =>
        keyCols.foldLeft(base) { (df, k) =>
          df.withColumn(k, col(k) + lit(i * stride))
        }
      }.reduce(_.unionAll(_))
      val withTs =
        if (name == "events")
          // back to int64 nanos so Tables.loadEvents reads the replica
          shifted.withColumn("ts", unix_micros(col("ts")) * 1000L)
        else shifted
      withTs.write.mode("overwrite")
        .parquet(s"$out/$name.parquet")
      println(s"[scaleup] $name x$copies -> $out/$name.parquet")
    }

    def copyAsIs(name: String): Unit = {
      spark.read.parquet(graft.engine.Tables.path(src, name))
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scaleup] $name (dimension, 1x) -> $out/$name.parquet")
    }

    copyAsIs("region")
    copyAsIs("nation")
    replicate("customer", Seq("c_custkey"))
    replicate("supplier", Seq("s_suppkey"))
    replicate("part", Seq("p_partkey"))
    replicate("orders", Seq("o_orderkey", "o_custkey"))
    replicate("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    replicate("events", Seq("event_id", "user_id"))
    replicate("documents", Seq("doc_id"))
    replicate("embeddings", Seq("vec_id"))
    spark.stop()
  }
}
