package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PrProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def edges = graft.engine.Tables.load(spark, d, "orders")
      .join(graft.engine.Tables.load(spark, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("src"), concat(lit("s"), col("l_suppkey")).as("dst"))
    // mimic bench: warm at sf0.001 first
    val wd = "/root/testdata/sf0.001"
    def wedges = graft.engine.Tables.load(spark, wd, "orders")
      .join(graft.engine.Tables.load(spark, wd, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("src"), concat(lit("s"), col("l_suppkey")).as("dst"))
    graft.operators.Graph.pageRank(wedges, 5).queryExecution.toRdd.count()
    var t0 = System.nanoTime()
    val e = edges.select(col("src"), col("dst")).distinct().cache()
    val nodes = e.select(col("src").as("id")).union(e.select(col("dst").as("id"))).distinct().cache()
    val n = nodes.count()
    println(f"nodes+edges setup: ${(System.nanoTime()-t0)/1e9}%.2f")
    t0 = System.nanoTime()
    val ed = e.join(e.groupBy("src").agg(count(lit(1)).cast("double").as("deg")), "src").cache()
    ed.queryExecution.toRdd.count()
    println(f"ed: ${(System.nanoTime()-t0)/1e9}%.2f")
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    (1 to 5).foreach { r =>
      t0 = System.nanoTime()
      val mass = ed.join(broadcast(ranks.withColumnRenamed("id", "src")), Seq("src"))
        .select(col("dst").as("id"), (col("rank") / col("deg")).as("c"))
        .groupBy("id").agg(sum("c").as("in_mass"))
      ranks = nodes.join(mass, Seq("id"), "left_outer")
        .select(col("id"), (lit(0.15 / n) + lit(0.85) * coalesce(col("in_mass"), lit(0.0))).as("rank"))
        .localCheckpoint()
      println(f"round $r: ${(System.nanoTime()-t0)/1e9}%.2f")
    }
    spark.stop()
  }
}
