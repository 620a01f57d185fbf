package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph algorithms, relational-style. Connected components
  * (min-label propagation) lives in [[Dedup.connectedComponents]]; this
  * adds numeric iteration — PageRank — as join + aggregate rounds, the
  * shape GraphX/Pregel compiles to anyway.
  */
object Graph {

  /** Up to `iters` rounds of PageRank (Page et al. 1999) over a directed
    * edge list (src, dst), damping 0.85. Each round joins the rank vector
    * (which carries the out-degree, attached once before the loop — the
    * degree aggregation never re-runs) against the bare cached edge list,
    * aggregates contributions on the destination key, and left-joins back
    * to the node set so sources without in-edges keep the teleport mass.
    *
    * Scale shape: while the node count is at most `broadcastNodeLimit`
    * the rank vector rides a broadcast — every round is then ONE shuffle
    * (the destination-key aggregation). Past the limit (billions of
    * nodes: a rank vector that no longer fits an executor) the join
    * falls back to a shuffle co-partitioned on the node id — the same
    * thresholded small-side escape hatch as
    * [[Dedup.connectedComponents]].
    *
    * `tol` > 0 adds a convergence early-exit: stop when the max per-node
    * rank change falls below `tol` (an O(n) narrow agg per round on the
    * already-checkpointed vector). Default 0 keeps the round count exact
    * — required when a differential oracle unrolls a FIXED number of
    * rounds.
    *
    * Dangling mass (sinks with no out-edges) is not redistributed — the
    * conventional simplification when ranks are used for ordering, and
    * the semantics the differential oracle reproduces exactly.
    */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85,
      tol: Double = 0.0, broadcastNodeLimit: Long = 10000000L): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct().cache()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    // the out-degree is loop-invariant and node-sized: attach it to the
    // node set ONCE and let it ride inside the rank vector, so every
    // round is a single edge-scan join + destination-key aggregation —
    // no separate per-round degree join, and the wide edge list is
    // cached once bare and never re-materializes with annotations
    val deg = e.groupBy(col("src").as("id"))
      .agg(count(lit(1)).cast("double").as("deg"))
    val nd = nodes.join(deg, Seq("id"), "left_outer").cache()
    val n = nd.count()
    val small = n <= broadcastNodeLimit
    def rankSide(r: DataFrame): DataFrame =
      if (small) broadcast(r) else r
    // teleport term computed as the same double literal arithmetic the
    // oracle runs: (1 − d)/n evaluated as 0.15/n, not as a pre-reduced
    // Scala constant with different rounding
    val teleport = (1.0 - damping) / n
    var ranks = nd.withColumn("rank", lit(1.0 / n))
    var iter = 0
    var converged = false
    while (iter < iters && !converged) {
      // rank/deg is computed inside the edge join itself: the rank
      // vector (with its degree column) is the one small side, so below
      // the broadcast limit the ONLY shuffle per round is the
      // destination-key aggregation. Sinks never appear as a src, so
      // their NULL deg never reaches the division
      val mass = e
        .join(rankSide(ranks.withColumnRenamed("id", "src")), Seq("src"))
        .select(col("dst").as("id"), (col("rank") / col("deg")).as("c"))
        .groupBy("id").agg(sum("c").as("in_mass"))
      val next = nd.join(rankSide(mass), Seq("id"), "left_outer")
        .select(col("id"), col("deg"),
          (lit(teleport) + lit(damping) * coalesce(col("in_mass"), lit(0.0)))
            .as("rank"))
        // truncate the lineage: the rank vector is small (one row per
        // node); checkpointing per round keeps round k's plan from
        // embedding rounds 1..k-1 and is what makes 20+ iterations
        // viable. LAZY: the next round's broadcast/shuffle materializes
        // it anyway — eager would add a second driver barrier per round
        .localCheckpoint(eager = false)
      if (tol > 0.0) {
        val delta = ranks.select(col("id"), col("rank").as("r0"))
          .join(next.select(col("id"), col("rank").as("r1")), Seq("id"))
          .agg(max(abs(col("r1") - col("r0")))).head().getDouble(0)
        converged = delta < tol
      }
      ranks = next
      iter += 1
    }
    // the returned vector is checkpoint-backed (lineage truncated), so the
    // working caches can be dropped — a long-lived session running many
    // pageRank calls must not accumulate per-call cache entries
    nd.unpersist(blocking = false)
    e.unpersist(blocking = false)
    ranks.select(col("id"), col("rank"))
  }

  /** Synchronous label-propagation community detection (Raghavan et al.
    * 2007) over an undirected graph given as a directed edge list with
    * LONG node ids (the edge list is symmetrized here). Every node starts
    * labeled with its own id; each round every node adopts the most
    * frequent label among its neighbors, ties broken toward the SMALLEST
    * label — synchronous updates plus the total-order tie-break make the
    * fixed-round result deterministic, which is what lets a SQL oracle
    * unroll the identical rounds.
    *
    * Scale shape: the label vector is node-sized; below
    * `broadcastNodeLimit` it rides a broadcast into the edge join, so a
    * round costs ONE edge scan plus an aggregation keyed on (node,
    * label) — map-side partials collapse the per-neighbor duplicates
    * before the shuffle. The argmax is a second node-keyed aggregation
    * (max of a (count, -label) struct — no window sort over the full
    * node set). Past the limit the join degrades to a co-partitioned
    * shuffle, same escape hatch as [[pageRank]]. Per-round
    * localCheckpoint keeps round k's plan from embedding rounds 1..k-1.
    */
  def labelPropagation(edges: DataFrame, iters: Int,
      broadcastNodeLimit: Long = 10000000L): DataFrame = {
    // symmetrize with an explode of both directions, NOT a self-union: a
    // union would re-evaluate the (possibly expensive) upstream plan once
    // per branch, and one distinct after the explode dedups both input
    // duplicates and symmetric twins in a single shuffle
    val sym = edges
      .select(explode(array(
        struct(col("src").as("s"), col("dst").as("d")),
        struct(col("dst").as("s"), col("src").as("d")))).as("e"))
      .select(col("e.s").as("src"), col("e.d").as("dst"))
      .distinct().cache()
    val nodes = sym.select(col("src").as("id")).distinct()
    val small = nodes.count() <= broadcastNodeLimit
    def labSide(l: DataFrame): DataFrame = if (small) broadcast(l) else l
    var labels = nodes.withColumn("label", col("id"))
    var iter = 0
    while (iter < iters) {
      labels = sym
        .join(labSide(labels.select(col("id").as("dst"),
          col("label").as("nlbl"))), Seq("dst"))
        .groupBy(col("src"), col("nlbl")).agg(count(lit(1)).as("c"))
        // argmax by (count desc, label asc): labels are longs, so the
        // max of a (c, -label) struct picks the largest count and, on
        // ties, the smallest label — one aggregate, no per-node sort
        .groupBy(col("src").as("id"))
        .agg(max(struct(col("c"), (-col("nlbl")).as("neg"))).as("m"))
        .select(col("id"), (-col("m.neg")).as("label"))
        .localCheckpoint(eager = false)
      iter += 1
    }
    sym.unpersist(blocking = false)
    labels
  }

  /** Fixed-round k-core peeling (Seidman 1983): each round drops every
    * node whose degree in the SURVIVING subgraph is below `k`, then
    * recomputes degrees. After enough rounds the survivor set is exactly
    * the k-core; a FIXED round count keeps the result deterministic and
    * lets a SQL oracle unroll the identical rounds (the same contract as
    * [[pageRank]] / [[labelPropagation]]). Returns surviving nodes with
    * their final within-core degree.
    *
    * Scale shape: the survivor set is node-sized, so below
    * `broadcastNodeLimit` each round is ONE degree aggregation (keyed on
    * src — map-side partials collapse per-partition duplicates) plus two
    * broadcast LEFT SEMI joins that never shuffle the edge list. The
    * symmetrized edges are cached once; per-round localCheckpoint keeps
    * round r's plan from embedding rounds 1..r-1. Past the limit the
    * semi joins degrade to co-partitioned shuffles — the standard
    * escape hatch.
    */
  def kCore(edges: DataFrame, k: Int, rounds: Int,
      broadcastNodeLimit: Long = 10000000L): DataFrame = {
    val sym = edges
      .select(explode(array(
        struct(col("src").as("s"), col("dst").as("d")),
        struct(col("dst").as("s"), col("src").as("d")))).as("e"))
      .select(col("e.s").as("src"), col("e.d").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct().cache()
    val small =
      sym.select(col("src")).distinct().count() <= broadcastNodeLimit
    def keepSide(kp: DataFrame): DataFrame = if (small) broadcast(kp) else kp
    var alive = sym
    var r = 0
    while (r < rounds) {
      val keep = alive.groupBy(col("src").as("id"))
        .agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select("id")
      alive = alive
        .join(keepSide(keep.select(col("id").as("src"))), Seq("src"), "left_semi")
        .join(keepSide(keep.select(col("id").as("dst"))), Seq("dst"), "left_semi")
        .localCheckpoint(eager = false)
      r += 1
    }
    val out = alive.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("deg"))
    sym.unpersist(blocking = false)
    out
  }

  /** Triangle count plus global clustering coefficient over an
    * undirected graph (edge list in any direction/duplication; it is
    * canonicalized here). The join strategy is compact-forward (Latapy
    * 2008): orient every edge from the (degree, id)-smaller endpoint to
    * the larger, build wedges by self-joining oriented edges on the
    * source, and close each wedge with one more join back onto the
    * oriented edge set.
    *
    * Why orientation matters at scale: wedges per node cost outdeg², and
    * ordering by degree caps every out-degree at O(√m) — a celebrity
    * node with 10 M followers contributes NO wedges from its own key
    * (all its edges point INTO it), so the wedge shuffle stays bounded
    * where the naive neighbor self-join would melt one reducer. The
    * closing join is key-partitioned on the wedge's far pair — never a
    * broadcast of the edge set.
    */
  def triangleStats(edges: DataFrame,
      broadcastNodeLimit: Long = 10000000L): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct().cache()
    val deg = und.select(col("a").as("id"))
      .union(und.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("d"))
      .cache()
    // the degree table is node-sized: while it fits an executor it rides
    // a broadcast into both annotation joins, so the (much larger) edge
    // list never shuffles for orientation — same thresholded escape
    // hatch as [[pageRank]]'s rank vector
    val degSide: DataFrame => DataFrame =
      if (deg.count() <= broadcastNodeLimit) broadcast else identity
    // orient by the (degree, id) total order; carry both endpoints' keys
    val withDeg = und
      .join(degSide(deg.select(col("id").as("a"), col("d").as("da"))),
        Seq("a"))
      .join(degSide(deg.select(col("id").as("b"), col("d").as("db"))),
        Seq("b"))
    val oriented = withDeg.select(
      when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
        struct(col("a").as("u"), col("b").as("v"), col("da").as("du"),
          col("db").as("dv")))
        .otherwise(struct(col("b").as("u"), col("a").as("v"),
          col("db").as("du"), col("da").as("dv"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"),
        col("e.du").as("du"), col("e.dv").as("dv"))
      .cache()
    val nEdges = und.count()
    // wedges (u; v<w in orientation order) from oriented out-neighbors —
    // slimmed to the far pair before the closing join: only (x, y) and
    // row multiplicity matter from here on
    val w1 = oriented.select(col("u"), col("v").as("x"), col("dv").as("dx"))
    val w2 = oriented.select(col("u"), col("v").as("y"),
      col("dv").as("dy"))
    val wedges = w1.join(w2, Seq("u"))
      .filter(struct(col("dx"), col("x")) < struct(col("dy"), col("y")))
      .select(col("x"), col("y"))
    // close the wedge: (x, y) must be an oriented edge, and x's
    // orientation key is below y's by construction above. Wedges
    // outnumber triangles ~20:1 here, so a bloom filter over the edge
    // keys kills non-closing wedges MAP-SIDE, before they shuffle — the
    // filter is edge-count-sized (~1.2 MB/M edges at 1% fpp), so it is
    // built only while the edge set is driver-collectable; past that the
    // plain key-partitioned semi join below is the only shuffle anyway
    val closable =
      if (nEdges <= 100000000L) {
        val bf = oriented.select(xxhash64(col("u"), col("v")).as("ek"))
          .stat.bloomFilter("ek", nEdges, 0.01)
        val bfBc = edges.sparkSession.sparkContext.broadcast(bf)
        val mightContain = udf((k: Long) => bfBc.value.mightContainLong(k))
        wedges.filter(mightContain(xxhash64(col("x"), col("y"))))
      } else wedges
    val triangles = closable.join(
      oriented.select(col("u").as("x"), col("v").as("y")), Seq("x", "y"),
      "left_semi")
    val nTri = triangles.agg(count(lit(1))).head().getLong(0)
    val stats = deg.agg(
      count(lit(1)).as("n_nodes"),
      sum(col("d") * (col("d") - 1) / 2).cast("long").as("n_wedges"))
      .head()
    und.unpersist(blocking = false)
    deg.unpersist(blocking = false)
    oriented.unpersist(blocking = false)
    val spark = edges.sparkSession
    import spark.implicits._
    Seq((stats.getLong(0), nEdges, stats.getLong(1), nTri,
      if (stats.getLong(1) == 0) 0.0
      else BigDecimal(3.0 * nTri / stats.getLong(1))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toDF("n_nodes", "n_edges", "n_wedges", "n_triangles",
        "clustering_coeff")
  }

  /** Breadth-first k-hop distances from a seed set over an undirected
    * graph (directed edge list symmetrized here): round r expands the
    * frontier through one edge join, drops already-visited nodes with an
    * anti join, and stamps distance r. Returns (id, dist) for every node
    * reached within `rounds` hops — the relational form of Pregel BFS,
    * and the building block for "within-N-hops" reachability queries.
    *
    * Scale shape: the frontier and visited set are node-sized; below
    * `broadcastNodeLimit` both ride broadcasts, so a round costs ONE
    * edge-scan join with no edge shuffle (the symmetrized edge list is
    * cached once). The per-round localCheckpoint keeps round r's plan
    * from embedding rounds 1..r-1 — the same contract as [[pageRank]].
    * Past the limit both joins degrade to co-partitioned shuffles.
    */
  def bfsHops(edges: DataFrame, seeds: DataFrame, rounds: Int,
      broadcastNodeLimit: Long = 10000000L): DataFrame = {
    val sym = edges
      .select(explode(array(
        struct(col("src").as("s"), col("dst").as("d")),
        struct(col("dst").as("s"), col("src").as("d")))).as("e"))
      .select(col("e.s").as("src"), col("e.d").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct().cache()
    val small =
      sym.select(col("src")).distinct().count() <= broadcastNodeLimit
    def side(f: DataFrame): DataFrame = if (small) broadcast(f) else f
    var visited = seeds.select(col("id")).distinct()
      .withColumn("dist", lit(0))
      .localCheckpoint(eager = false)
    var frontier = visited.select("id")
    var r = 1
    while (r <= rounds) {
      frontier = sym
        .join(side(frontier.select(col("id").as("src"))), Seq("src"))
        .select(col("dst").as("id")).distinct()
        .join(side(visited.select("id")), Seq("id"), "left_anti")
        .localCheckpoint(eager = false)
      visited = visited
        .union(frontier.withColumn("dist", lit(r)))
        .localCheckpoint(eager = false)
      r += 1
    }
    sym.unpersist(blocking = false)
    visited
  }
}
