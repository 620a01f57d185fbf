package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph algorithms, relational-style. Connected components
  * (min-label propagation) lives in [[Dedup.connectedComponents]]; this
  * adds numeric iteration — PageRank — as join + aggregate rounds, the
  * shape GraphX/Pregel compiles to anyway.
  */
object Graph {

  /** `iters` rounds of PageRank (Page et al. 1999) over a directed edge
    * list (src, dst), damping 0.85. Each round is one join of the rank
    * vector against the edge list, one aggregation of contributions on
    * the destination key, and one left join back to the node set so
    * sources without in-edges keep the teleport mass — at scale, two
    * shuffles per round, both on the node id, and the edge list never
    * re-partitions after the first round (co-partitioned joins).
    *
    * Dangling mass (sinks with no out-edges) is not redistributed — the
    * conventional simplification when ranks are used for ordering, and
    * the semantics the differential oracle reproduces exactly.
    */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct().cache()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().cache()
    val n = nodes.count()
    // cached: the degree table is embedded in every round's DAG and
    // would otherwise recompute its aggregation per iteration
    val outDeg = e.groupBy("src").agg(count(lit(1)).cast("double").as("deg"))
      .cache()
    // teleport term computed as the same double literal arithmetic the
    // oracle runs: (1 − d)/n evaluated as 0.15/n, not as a pre-reduced
    // Scala constant with different rounding
    val teleport = (1.0 - damping) / n
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    (1 to iters).foreach { _ =>
      val mass = e.join(ranks, e("src") === ranks("id"))
        .join(outDeg, "src")
        .select(col("dst").as("id"), (col("rank") / col("deg")).as("c"))
        .groupBy("id").agg(sum("c").as("in_mass"))
      ranks = nodes.join(mass, Seq("id"), "left_outer")
        .select(col("id"),
          (lit(teleport) + lit(damping) * coalesce(col("in_mass"), lit(0.0)))
            .as("rank"))
        // truncate the lineage: the rank vector is small (one row per
        // node); materializing it per round keeps round k's plan from
        // embedding rounds 1..k-1 and is what makes 20+ iterations viable
        .localCheckpoint()
    }
    ranks
  }
}
