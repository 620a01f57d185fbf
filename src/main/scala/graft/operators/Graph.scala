package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph algorithms, relational-style. Connected components
  * (min-label propagation) lives in [[Dedup.connectedComponents]]; this
  * adds numeric iteration — PageRank — as join + aggregate rounds, the
  * shape GraphX/Pregel compiles to anyway.
  *
  * Execution shape shared by every iterative operator here: rounds chain
  * LAZILY — no per-round action. Chaining keeps the whole iteration a
  * single job DAG whose stages the scheduler pipelines, and the
  * per-round joins are co-partitioned for free because each round's
  * aggregation already hash partitions on the node key the next join
  * uses. When the iterated vector is PROVABLY small (the operator holds
  * the node count from its own setup), the vector side of the edge join
  * carries a broadcast hint — left to runtime stats the planner builds
  * the hash relation from the larger EDGE list and rebuilds that
  * broadcast every round (measured: the hint cut pageRank's 5-round
  * chain 3.2 → 2.2 s at sf0.1). Past the count gate — the cluster-scale
  * regime where the vector can outgrow an executor — the hint drops out
  * and AQE decides from runtime stats exactly as before. Lineage is
  * truncated with a LAZY localCheckpoint every `checkpointEvery` rounds,
  * so the analyzer never sees an unboundedly deep plan yet short
  * iterations pay zero extra materializations.
  *
  * Resource contract: every operator RETURNS an eagerly materialized
  * (checkpointed) frame and unpersists its own working caches before
  * returning — a session looping graph calls holds no per-call cache
  * residue. Operators accept a `canonicalEdges`/`distinctEdges` flag for
  * callers that maintain a shared, externally persisted canonical edge
  * index (the 100 TB layout pattern): the per-call canonicalization
  * shuffle and cache are skipped entirely.
  */
object Graph {

  /** Default lineage-truncation stride: every 8 rounds keeps the plan
    * depth bounded while letting the common 3-5-round analytics run as
    * one uninterrupted DAG with zero extra materializations.
    */
  val DefaultCheckpointEvery = 8

  private def maybeCkpt(df: DataFrame, round: Int, every: Int): DataFrame =
    if (round % every == 0) df.localCheckpoint(eager = false) else df

  /** Materialize `result` (eager localCheckpoint — truncates lineage and
    * computes it once, distributed), then release this call's working
    * caches. Every public operator here runs through this on return, so a
    * long-lived session looping graph calls (the full Verify/Bench suite,
    * or a service at cluster scale) never accumulates per-call cache
    * entries: MEMORY_AND_DISK blocks are only evicted by unpersist, and a
    * lazily-returned frame over per-call caches would leak them for the
    * session's lifetime.
    */
  private def materializeAndRelease(
      result: DataFrame, working: DataFrame*): DataFrame = {
    val out = result.localCheckpoint(eager = true)
    working.foreach(_.unpersist(blocking = false))
    out
  }

  /** A caller-owned shared layout for the directed iterative operators
    * ([[pageRank]], [[personalizedPageRank]]): the edge list partitioned
    * on the per-round join key and PERSISTED, plus the node/out-degree
    * relation every round left-joins back to. A session running several
    * analytics over the SAME graph builds this once and passes it to each
    * call — the per-call canonicalize + repartition + cache-materialize +
    * node/degree build (pure fixed overhead, identical math) then runs
    * once per graph instead of once per call. The caller owns the two
    * frames' lifecycle (the `*On` operators never unpersist them).
    */
  final class SharedDigraph(val edgesBySrc: DataFrame, val nodeDeg: DataFrame) {
    /** Node count (the PageRank teleport denominator / broadcast gate);
      * computed on first access so consumers that never need it
      * ([[personalizedPageRank]]) pay no extra action.
      */
    lazy val nNodes: Long = nodeDeg.count()
  }

  /** Build a [[SharedDigraph]] from any (src, dst) edge list — the exact
    * per-call setup [[pageRank]] always ran, factored out so it can be
    * shared. `distinctEdges = true` asserts the input is already
    * deduplicated and skips the canonicalization shuffle.
    */
  def sharedDigraph(edges: DataFrame,
      distinctEdges: Boolean = false): SharedDigraph = {
    // One exchange HERE buys iters−1 edge-list exchanges per consumer:
    // the per-round join key is src, and repartitioned on it once and
    // persisted, each round's join reuses this layout so only the
    // node-sized rank vector moves per round (measured: PLANS.md round 7,
    // graph exchange experiment).
    val e =
      (if (distinctEdges) edges.select(col("src"), col("dst"))
       else edges.select(col("src"), col("dst")).distinct())
        .repartition(col("src"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    // the out-degree is loop-invariant and node-sized: attach it to the
    // node set ONCE and let it ride inside the rank vector, so every
    // round is a single edge-scan join + destination-key aggregation —
    // no separate per-round degree join
    val deg = e.groupBy(col("src").as("id"))
      .agg(count(lit(1)).cast("double").as("deg"))
    val nd = nodes.join(deg, Seq("id"), "left_outer")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    new SharedDigraph(e, nd)
  }

  /** Up to `iters` rounds of PageRank (Page et al. 1999) over a directed
    * edge list (src, dst), damping 0.85. Each round joins the rank vector
    * (which carries the out-degree, attached once before the loop — the
    * degree aggregation never re-runs) against the bare cached edge list,
    * aggregates contributions on the destination key, and left-joins back
    * to the node set so sources without in-edges keep the teleport mass.
    *
    * `tol` > 0 adds a convergence early-exit: stop when the max per-node
    * rank change falls below `tol`. The delta check is an action per
    * round, so each round is eagerly checkpointed first (effective
    * checkpoint stride 1) — otherwise every check would re-execute the
    * whole untruncated chain (O(stride²) recomputation per stride). Only
    * ask for it when the expected round count is large enough to
    * amortize the per-round barriers. Default 0 keeps the round count
    * exact — required when a differential oracle unrolls a FIXED number
    * of rounds.
    *
    * `distinctEdges = true` asserts the input is already a deduplicated
    * (src, dst) edge list — e.g. a shared, externally persisted edge
    * index — and skips this call's canonicalization shuffle and cache.
    *
    * Dangling mass (sinks with no out-edges) is not redistributed — the
    * conventional simplification when ranks are used for ordering, and
    * the semantics the differential oracle reproduces exactly.
    */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85,
      tol: Double = 0.0,
      checkpointEvery: Int = DefaultCheckpointEvery,
      distinctEdges: Boolean = false): DataFrame = {
    val g = sharedDigraph(edges, distinctEdges)
    pageRankCore(g, iters, damping, tol, checkpointEvery,
      release = Seq(g.edgesBySrc, g.nodeDeg))
  }

  /** [[pageRank]] over a caller-owned [[SharedDigraph]]: identical rounds
    * and math, but the layout build is skipped and the shared frames stay
    * persisted on return (the caller owns their lifecycle).
    */
  def pageRankOn(g: SharedDigraph, iters: Int, damping: Double = 0.85,
      tol: Double = 0.0,
      checkpointEvery: Int = DefaultCheckpointEvery): DataFrame =
    pageRankCore(g, iters, damping, tol, checkpointEvery, release = Nil)

  private def pageRankCore(g: SharedDigraph, iters: Int, damping: Double,
      tol: Double, checkpointEvery: Int,
      release: Seq[DataFrame]): DataFrame = {
    val e = g.edgesBySrc
    val nd = g.nodeDeg
    val n = g.nNodes
    // Rank-side broadcast, gated on the node count this call already
    // holds (r10 floor decomposition, PLANS.md): left to itself the
    // planner builds the hash relation from the EDGE list (BuildLeft)
    // and rebuilds that broadcast every round — the rank vector is the
    // smaller, node-sized side and broadcasting IT instead cut the
    // 5-round chain 3.2 → 2.2 s at sf0.1. The hint is only safe while
    // the node vector is guaranteed driver/executor-memory small, so
    // it applies below 1M nodes (~40 MB); past that — the 100 TB
    // regime — the hint drops out and the planner chooses from runtime
    // stats exactly as before.
    def rankSide(r: DataFrame): DataFrame = {
      val s = r.withColumnRenamed("id", "src")
      if (n <= 1000000L) broadcast(s) else s
    }
    // teleport term computed as the same double literal arithmetic the
    // oracle runs: (1 − d)/n evaluated as 0.15/n, not as a pre-reduced
    // Scala constant with different rounding
    val teleport = (1.0 - damping) / n
    var ranks = nd.withColumn("rank", lit(1.0 / n))
    var iter = 0
    var converged = false
    while (iter < iters && !converged) {
      // rank/deg is computed inside the edge join itself; sinks never
      // appear as a src, so their NULL deg never reaches the division
      val mass = e
        .join(rankSide(ranks), Seq("src"))
        .select(col("dst").as("id"), (col("rank") / col("deg")).as("c"))
        .groupBy("id").agg(sum("c").as("in_mass"))
      val stepped = nd.join(mass, Seq("id"), "left_outer")
        .select(col("id"), col("deg"),
          (lit(teleport) + lit(damping) * coalesce(col("in_mass"), lit(0.0)))
            .as("rank"))
      // tol mode runs an action per round (the delta agg): checkpoint the
      // round EAGERLY so neither the check nor the next round re-executes
      // the chain. Fixed-round mode keeps the lazy stride.
      val next =
        if (tol > 0.0) stepped.localCheckpoint(eager = true)
        else maybeCkpt(stepped, iter + 1, checkpointEvery)
      if (tol > 0.0) {
        val delta = ranks.select(col("id"), col("rank").as("r0"))
          .join(next.select(col("id"), col("rank").as("r1")), Seq("id"))
          .agg(max(abs(col("r1") - col("r0")))).head().getDouble(0)
        converged = delta < tol
      }
      ranks = next
      iter += 1
    }
    materializeAndRelease(
      ranks.select(col("id"), col("rank")), release: _*)
  }

  /** Personalized PageRank (Haveliwala 2002): identical round structure
    * to [[pageRank]], but the teleport mass restarts ONLY into `seeds`
    * (uniformly over the seeds present in the graph) instead of every
    * node — ranks become "relevance to the seed set", the standard
    * localized-recommendation / related-entity primitive. Seeds not in
    * the node set are ignored; dangling mass is not redistributed (the
    * same simplification, and the same oracle contract, as [[pageRank]]).
    *
    * Scale shape: seed membership is attached to the node vector ONCE
    * (like the out-degree) and rides through the rounds. The mass step
    * filters to `rank <> 0` first — a node is exactly 0.0 iff no mass
    * has ever reached it, so early rounds move a frontier-sized vector,
    * not a node-sized one (on a 100 TB graph with a small seed set most
    * of the graph never activates within 5 hops). Dropping exact-zero
    * contributions is bitwise semantics-preserving: x + 0.0 == x in
    * IEEE, so an oracle summing the zero terms lands on the identical
    * doubles.
    */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame, iters: Int,
      damping: Double = 0.85,
      checkpointEvery: Int = DefaultCheckpointEvery,
      distinctEdges: Boolean = false): DataFrame = {
    val g = sharedDigraph(edges, distinctEdges)
    personalizedPageRankCore(g, seeds, iters, damping, checkpointEvery,
      release = Seq(g.edgesBySrc, g.nodeDeg))
  }

  /** [[personalizedPageRank]] over a caller-owned [[SharedDigraph]]:
    * identical rounds and math, the layout build is skipped, and only the
    * per-call seeded node vector is cached (and released on return) —
    * the shared frames stay persisted for the caller's next consumer.
    */
  def personalizedPageRankOn(g: SharedDigraph, seeds: DataFrame, iters: Int,
      damping: Double = 0.85,
      checkpointEvery: Int = DefaultCheckpointEvery): DataFrame =
    personalizedPageRankCore(g, seeds, iters, damping, checkpointEvery,
      release = Nil)

  private def personalizedPageRankCore(g: SharedDigraph, seeds: DataFrame,
      iters: Int, damping: Double, checkpointEvery: Int,
      release: Seq[DataFrame]): DataFrame = {
    val e = g.edgesBySrc
    // seed membership is per-call state: attach it to the shared node
    // vector once (node-sized join) and cache the result for the rounds
    val nd = g.nodeDeg
      .join(seeds.select(col("id")).distinct().withColumn("seed", lit(1)),
        Seq("id"), "left_outer")
      .cache()
    val nSeeds = nd.filter(col("seed").isNotNull).count()
    require(nSeeds > 0, "personalizedPageRank: no seed is a graph node")
    // NO rank-side broadcast hint here, measured deliberately (r10):
    // PPR's mass step already joins only the rank<>0 FRONTIER, which
    // the planner happily broadcasts on its own when small, and the
    // hint's extra node-count action plus per-round driver barrier
    // made sf0.1 slower (probe 3.11 → 3.63 s) for a gain that only
    // appeared at 10x — the opposite trade from pageRank, whose full
    // node-sized vector the planner otherwise refuses to broadcast.
    // same literal-arithmetic contract as pageRank: (1 − d)/|S| evaluated
    // the way the oracle evaluates it
    val teleport = (1.0 - damping) / nSeeds
    var ranks = nd.withColumn("rank",
      when(col("seed").isNotNull, lit(1.0 / nSeeds)).otherwise(lit(0.0)))
    var iter = 0
    while (iter < iters) {
      val mass = e
        .join(ranks.filter(col("rank") =!= 0.0)
          .withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"), (col("rank") / col("deg")).as("c"))
        .groupBy("id").agg(sum("c").as("in_mass"))
      ranks = maybeCkpt(
        nd.join(mass, Seq("id"), "left_outer")
          .select(col("id"), col("deg"), col("seed"),
            (when(col("seed").isNotNull, lit(teleport)).otherwise(lit(0.0))
              + lit(damping) * coalesce(col("in_mass"), lit(0.0)))
              .as("rank")),
        iter + 1, checkpointEvery)
      iter += 1
    }
    materializeAndRelease(
      ranks.select(col("id"), col("rank")), (release :+ nd): _*)
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
    * A round costs one edge-scan join plus an aggregation keyed on
    * (node, label) — map-side partials collapse the per-neighbor
    * duplicates before the shuffle. The argmax is a second node-keyed
    * aggregation (max of a (count, -label) struct — no window sort over
    * the full node set), and its hash partitioning on the node key is
    * exactly what the next round's join consumes.
    */
  def labelPropagation(edges: DataFrame, iters: Int,
      checkpointEvery: Int = DefaultCheckpointEvery,
      canonicalEdges: Boolean = false): DataFrame = {
    // symmetrize with an explode of both directions, NOT a self-union: a
    // union would re-evaluate the (possibly expensive) upstream plan once
    // per branch, and one distinct after the explode dedups both input
    // duplicates and symmetric twins in a single shuffle.
    // canonicalEdges asserts the input is already deduplicated with no
    // symmetric twins and no self loops (e.g. a shared persisted a<b
    // pair index): the explode of such a list is distinct by
    // construction, so the dedup shuffle and this call's cache drop out.
    val both = edges
      .select(explode(array(
        struct(col("src").as("s"), col("dst").as("d")),
        struct(col("dst").as("s"), col("src").as("d")))).as("e"))
      .select(col("e.s").as("src"), col("e.d").as("dst"))
    // per-round join key is dst: pre-partition the symmetric list on it
    // once so rounds reuse the layout (same rationale as [[pageRank]])
    val sym = (if (canonicalEdges) both else both.distinct())
      .repartition(col("dst")).cache()
    labelPropagationCore(sym, iters, checkpointEvery, release = Seq(sym))
  }

  /** [[labelPropagation]] over a caller-owned symmetrized edge layout —
    * already deduplicated, both directions present, partitioned on `dst`
    * (the per-round join key) and persisted. Identical rounds; the shared
    * frame stays persisted on return. A symmetric relation equals its own
    * column-swapped transpose, so a layout partitioned on the OTHER key
    * can be fed through `select(dst as src, src as dst)`.
    */
  def labelPropagationOn(symByDst: DataFrame, iters: Int,
      checkpointEvery: Int = DefaultCheckpointEvery): DataFrame =
    labelPropagationCore(symByDst, iters, checkpointEvery, release = Nil)

  private def labelPropagationCore(sym: DataFrame, iters: Int,
      checkpointEvery: Int, release: Seq[DataFrame]): DataFrame = {
    val nodes = sym.select(col("src").as("id")).distinct()
    var labels = nodes.withColumn("label", col("id"))
    var iter = 0
    while (iter < iters) {
      labels = maybeCkpt(
        sym
          .join(labels.select(col("id").as("dst"), col("label").as("nlbl")),
            Seq("dst"))
          .groupBy(col("src"), col("nlbl")).agg(count(lit(1)).as("c"))
          // argmax by (count desc, label asc): labels are longs, so the
          // max of a (c, -label) struct picks the largest count and, on
          // ties, the smallest label — one aggregate, no per-node sort
          .groupBy(col("src").as("id"))
          .agg(max(struct(col("c"), (-col("nlbl")).as("neg"))).as("m"))
          .select(col("id"), (-col("m.neg")).as("label")),
        iter + 1, checkpointEvery)
      iter += 1
    }
    materializeAndRelease(labels, release: _*)
  }

  /** Fixed-round k-core peeling (Seidman 1983): each round drops every
    * node whose degree in the SURVIVING subgraph is below `k`, then
    * recomputes degrees. After enough rounds the survivor set is exactly
    * the k-core; a FIXED round count keeps the result deterministic and
    * lets a SQL oracle unroll the identical rounds (the same contract as
    * [[pageRank]] / [[labelPropagation]]). Returns surviving nodes with
    * their final within-core degree.
    *
    * Each round is ONE degree aggregation (keyed on src — map-side
    * partials collapse per-partition duplicates) plus two LEFT SEMI
    * joins; the semi-join keys line up with the aggregation's hash
    * partitioning, and on small survivor sets AQE turns them into
    * runtime broadcasts without any driver barrier in the plan.
    *
    * Unlike [[pageRank]]/[[labelPropagation]] (whose round output feeds
    * exactly ONE consumer), each round here reads the surviving edge set
    * THREE times (the degree agg and both semi joins) — a lazy chain
    * would re-derive round r-1 per consumer and blow up 3^rounds, so the
    * default truncates (and thereby materializes) EVERY round.
    */
  def kCore(edges: DataFrame, k: Int, rounds: Int,
      checkpointEvery: Int = 1,
      canonicalEdges: Boolean = false): DataFrame = {
    val both = edges
      .select(explode(array(
        struct(col("src").as("s"), col("dst").as("d")),
        struct(col("dst").as("s"), col("src").as("d")))).as("e"))
      .select(col("e.s").as("src"), col("e.d").as("dst"))
    // canonical input (deduplicated a<b pairs, no self loops) explodes to
    // an already-clean symmetric list — skip the shuffle and the cache
    val sym =
      if (canonicalEdges) both
      else both.filter(col("src") =!= col("dst")).distinct().cache()
    kCoreCore(sym, k, rounds, checkpointEvery,
      release = if (canonicalEdges) Nil else Seq(sym))
  }

  /** [[kCore]] over a caller-owned symmetrized edge layout — already
    * deduplicated and self-loop-free, both directions present, persisted.
    * Identical peel rounds; the shared frame stays persisted on return.
    */
  def kCoreOn(sym: DataFrame, k: Int, rounds: Int,
      checkpointEvery: Int = 1): DataFrame =
    kCoreCore(sym, k, rounds, checkpointEvery, release = Nil)

  private def kCoreCore(sym: DataFrame, k: Int, rounds: Int,
      checkpointEvery: Int, release: Seq[DataFrame]): DataFrame = {
    var alive = sym
    var r = 0
    while (r < rounds) {
      val keep = alive.groupBy(col("src").as("id"))
        .agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select("id")
      alive = maybeCkpt(
        alive
          .join(keep.select(col("id").as("src")), Seq("src"), "left_semi")
          .join(keep.select(col("id").as("dst")), Seq("dst"), "left_semi"),
        r + 1, checkpointEvery)
      r += 1
    }
    materializeAndRelease(
      alive.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg")),
      release: _*)
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
    *
    * The single-row result (node/edge/wedge/triangle counts + clustering
    * coefficient) is assembled RELATIONALLY — a cross join of three
    * one-row aggregates — so the whole census is one action with no
    * intermediate collect barriers beyond the one edge count the bloom
    * sizing needs.
    */
  def triangleStats(edges: DataFrame,
      broadcastNodeLimit: Long = 10000000L,
      canonicalEdges: Boolean = false): DataFrame = {
    // canonical input: already deduplicated src<dst pairs (e.g. a shared
    // persisted pair index) — they ARE the undirected edge set, so the
    // least/greatest + distinct shuffle and this call's cache drop out
    val und =
      if (canonicalEdges)
        edges.select(col("src").as("a"), col("dst").as("b"))
      else edges
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .filter(col("a") =!= col("b")).distinct().cache()
    val nEdges = und.count()
    val deg = und.select(col("a").as("id"))
      .union(und.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("d"))
    // the degree table is node-sized (≤ 2·edges): while the edge count
    // says it fits an executor it rides a broadcast into both annotation
    // joins, so the (much larger) edge list never shuffles for
    // orientation
    val degSide: DataFrame => DataFrame =
      if (nEdges * 2 <= broadcastNodeLimit) broadcast else identity
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
        // measured both probe forms on the 1.2 M-edge / 41 M-wedge
        // co-purchase graph: a UDF over a broadcast filter (2.7 s for
        // filter+close) beats the codegen'd BloomFilterMightContain fed
        // the sketch as a binary literal (4.5 s) — the literal ships and
        // deserializes the 1.4 MB sketch per task, while the broadcast
        // shares ONE deserialized filter per executor; at this selectivity
        // the UDF boundary costs less than the duplicated deserialize.
        // (graft_bloom_contains stays registered for plan-embedded use
        // where a broadcast handle isn't available, e.g. pure-SQL flows.)
        val bfBc = edges.sparkSession.sparkContext.broadcast(bf)
        val mightContain = udf((k: Long) => bfBc.value.mightContainLong(k))
        wedges.filter(mightContain(xxhash64(col("x"), col("y"))))
      } else wedges
    val triangles = closable.join(
      oriented.select(col("u").as("x"), col("v").as("y")), Seq("x", "y"),
      "left_semi")
    val tri = triangles.agg(count(lit(1)).as("n_triangles"))
    val stats = deg.agg(
      count(lit(1)).as("n_nodes"),
      sum(col("d") * (col("d") - 1) / 2).cast("long").as("n_wedges"))
    materializeAndRelease(
      stats.crossJoin(tri).select(
        col("n_nodes"), lit(nEdges).as("n_edges"), col("n_wedges"),
        col("n_triangles"),
        when(col("n_wedges") === 0, lit(0.0))
          .otherwise(round(lit(3.0) * col("n_triangles") / col("n_wedges"), 6))
          .as("clustering_coeff")),
      (if (canonicalEdges) Nil else Seq(und)) :+ oriented: _*)
  }

  /** The same one-row census as [[triangleStats]], computed from a
    * precomputed per-edge triangle support relation (a, b, support) —
    * the persisted-index fast path for a shared graph layout. Each
    * triangle contributes exactly 1 to each of its three edges'
    * support, so n_triangles = Σsupport div 3 (exact integer division;
    * the sum is a multiple of 3 by construction). Node, edge and wedge
    * counts come from the canonical (src < dst, distinct) edge list
    * with the identical aggregate expressions [[triangleStats]] uses,
    * and the clustering coefficient repeats its exact float arithmetic
    * — all inputs to the one float expression are the same integers,
    * so the two paths agree bitwise.
    */
  def triangleStatsFromSupport(edges: DataFrame,
      support: DataFrame): DataFrame = {
    val und = edges.select(col("src").as("a"), col("dst").as("b"))
    val deg = und.select(col("a").as("id"))
      .union(und.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("d"))
    val stats = deg.agg(
      count(lit(1)).as("n_nodes"),
      sum(col("d") * (col("d") - 1) / 2).cast("long").as("n_wedges"))
    val ecnt = und.agg(count(lit(1)).as("n_edges"))
    val tri = support.agg(
      coalesce(expr("sum(support) div 3"), lit(0L)).as("n_triangles"))
    stats.crossJoin(ecnt).crossJoin(tri).select(
      col("n_nodes"), col("n_edges"), col("n_wedges"), col("n_triangles"),
      when(col("n_wedges") === 0, lit(0.0))
        .otherwise(round(lit(3.0) * col("n_triangles") / col("n_wedges"), 6))
        .as("clustering_coeff"))
  }

  /** Per-edge triangle support — the k-truss building block: for every
    * canonical (a < b) edge, how many triangles it closes. Same
    * degree-oriented wedge enumeration as [[triangleStats]] (each
    * triangle is found exactly once, wedge fan-out bounded by the
    * orientation), but the closing join KEEPS the wedge apex so each
    * triangle explodes map-side into its three canonical edges; ONE
    * hash aggregation then yields every edge's support, and edges in no
    * triangle come back with support 0 via a left join against the edge
    * set itself. No all-pairs step anywhere: cost is the triangle
    * enumeration plus a 3× explode of the (much smaller) triangle set.
    */
  def edgeSupport(edges: DataFrame,
      broadcastNodeLimit: Long = 10000000L,
      canonicalEdges: Boolean = false): DataFrame = {
    val und =
      if (canonicalEdges)
        edges.select(col("src").as("a"), col("dst").as("b"))
      else edges
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .filter(col("a") =!= col("b")).distinct().cache()
    val nEdges = und.count()
    val deg = und.select(col("a").as("id"))
      .union(und.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("d"))
    val degSide: DataFrame => DataFrame =
      if (nEdges * 2 <= broadcastNodeLimit) broadcast else identity
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
    val w1 = oriented.select(col("u"), col("v").as("x"), col("dv").as("dx"))
    val w2 = oriented.select(col("u"), col("v").as("y"), col("dv").as("dy"))
    // unlike triangleStats the apex u survives the wedge join: the
    // closing semi join then yields full (u, x, y) triangles
    val wedges = w1.join(w2, Seq("u"))
      .filter(struct(col("dx"), col("x")) < struct(col("dy"), col("y")))
      .select(col("u"), col("x"), col("y"))
    val closed = wedges.join(
      oriented.select(col("u").as("x"), col("v").as("y")), Seq("x", "y"),
      "left_semi")
    def ce(p: Column, q: Column): Column =
      struct(least(p, q).as("a"), greatest(p, q).as("b"))
    val support = closed
      .select(explode(array(ce(col("u"), col("x")), ce(col("u"), col("y")),
        ce(col("x"), col("y")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("support"))
    val out = und.join(support, Seq("a", "b"), "left_outer")
      .select(col("a"), col("b"),
        coalesce(col("support"), lit(0L)).as("support"))
    materializeAndRelease(out,
      (if (canonicalEdges) Nil else Seq(und)) :+ oriented: _*)
  }

  /** Bounded k-truss peel: `rounds` iterations of [[edgeSupport]] +
    * "drop every edge in fewer than k−2 triangles". Each round's
    * surviving edge set is already eagerly checkpointed by
    * edgeSupport's materialize, so the lineage never stacks; when a
    * round drops nothing the peel has reached its fixpoint and the
    * remaining rounds are emitted without recomputation (support is a
    * function of the edge set, so a zero-drop round repeats forever).
    * Production use iterates until that fixpoint; the bounded-round
    * form here keeps the relational oracle finite. Returns one row per
    * round: (round, n_edges, n_dropped). The only driver state is the
    * per-round edge COUNT — never the edges.
    *
    * `initialSupport`, when given, is a precomputed (a, b, support)
    * relation for the CANONICALIZED input edge set (e.g. the persisted
    * per-edge support of a shared graph layout — support is a pure
    * integer function of the edge set, so any correct precomputation
    * is bit-identical to recomputing it); round 1 then filters it
    * directly instead of re-running the wedge enumeration, and only
    * the shrunken later rounds enumerate live. The precomputation is
    * trusted but VERIFIED: [[edgeSupport]] emits exactly one row per
    * canonical edge, so a correct `initialSupport` has exactly as many
    * rows as the canonicalized input AND covers the identical edge
    * set — checked as a count plus an order-insensitive XOR checksum
    * of the canonical pair hashes (ADVICE r10: a count alone would
    * trust a wrong-graph relation with coincidentally equal
    * cardinality). Either mismatch — stale layout, wrong graph,
    * differently-typed keys — drops the relation and the peel falls
    * back to live enumeration instead of silently emitting wrong
    * round counts. Cost: one agg over each edge-sized relation, paid
    * once, cheap next to the wedge enumeration it saves.
    */
  def ktrussPeel(edges: DataFrame, k: Int, rounds: Int,
      initialSupport: Option[DataFrame] = None): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // canonicalize round-1 input (least/greatest, no self-loops, distinct)
    // so ANY edge list peels correctly — later rounds pass
    // canonicalEdges = true because each round's output is a subset of
    // this canonical set; a no-op (plus one distinct) for callers that
    // already feed a canonical index
    var cur = edges.select(
        least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    var before = cur.count()
    var done = false
    val out = (1 to rounds).map { r =>
      if (done) (r, before, 0L)
      else {
        val sup = initialSupport match {
          // one row per canonical edge is edgeSupport's contract; a
          // count OR pair-checksum mismatch means the relation covers
          // a DIFFERENT edge set — fall back to live enumeration
          // rather than peel wrong (xxhash64 hashes value+type, so a
          // same-values-different-type caller also falls back — the
          // safe direction)
          case Some(s0) if r == 1 && {
            val sr = s0.agg(count(lit(1)).as("n"),
              expr("bit_xor(xxhash64(a, b))").as("sig")).head()
            sr.getLong(0) == before && !sr.isNullAt(1) && {
              val cr = cur.agg(expr("bit_xor(xxhash64(src, dst))")).head()
              !cr.isNullAt(0) && cr.getLong(0) == sr.getLong(1)
            }
          } => s0
          case _ => edgeSupport(cur, canonicalEdges = true)
        }
        val next = sup
          .filter(col("support") >= k - 2)
          .select(col("a").as("src"), col("b").as("dst"))
        val after = next.count()
        val dropped = before - after
        cur = next; before = after; done = dropped == 0L
        (r, after, dropped)
      }
    }
    out.toDF("round", "n_edges", "n_dropped").orderBy("round")
  }

  /** Breadth-first k-hop distances from a seed set over an undirected
    * graph (directed edge list symmetrized here): round r expands the
    * frontier through one edge join, drops already-visited nodes with an
    * anti join, and stamps distance r. Returns (id, dist) for every node
    * reached within `rounds` hops — the relational form of Pregel BFS,
    * and the building block for "within-N-hops" reachability queries.
    *
    * The frontier/visited sets are node-sized; the visited set doubles
    * as the anti-join side, so a round is one edge join + one anti join
    * + a union, all co-partitioned on the node key. Both sets feed TWO
    * consumers per round (next frontier + the growing visited union), so
    * like [[kCore]] the default materializes every round — a lazy chain
    * would re-expand earlier frontiers once per consumer.
    */
  def bfsHops(edges: DataFrame, seeds: DataFrame, rounds: Int,
      checkpointEvery: Int = 1,
      canonicalEdges: Boolean = false): DataFrame = {
    val both = edges
      .select(explode(array(
        struct(col("src").as("s"), col("dst").as("d")),
        struct(col("dst").as("s"), col("src").as("d")))).as("e"))
      .select(col("e.s").as("src"), col("e.d").as("dst"))
    // per-round join key is src: pre-partition once (see [[pageRank]])
    val sym =
      (if (canonicalEdges) both
       else both.filter(col("src") =!= col("dst")).distinct())
        .repartition(col("src")).cache()
    bfsHopsCore(sym, seeds, rounds, checkpointEvery, release = Seq(sym))
  }

  /** [[bfsHops]] over a caller-owned symmetrized edge layout — already
    * deduplicated and self-loop-free, both directions present,
    * partitioned on `src` (the per-round join key) and persisted.
    * Identical rounds; the shared frame stays persisted on return.
    */
  def bfsHopsOn(symBySrc: DataFrame, seeds: DataFrame, rounds: Int,
      checkpointEvery: Int = 1): DataFrame =
    bfsHopsCore(symBySrc, seeds, rounds, checkpointEvery, release = Nil)

  private def bfsHopsCore(sym: DataFrame, seeds: DataFrame, rounds: Int,
      checkpointEvery: Int, release: Seq[DataFrame]): DataFrame = {
    var visited = seeds.select(col("id")).distinct()
      .withColumn("dist", lit(0))
    var frontier = visited.select("id")
    var r = 1
    while (r <= rounds) {
      frontier = maybeCkpt(
        sym
          .join(frontier.select(col("id").as("src")), Seq("src"))
          .select(col("dst").as("id")).distinct()
          .join(visited.select("id"), Seq("id"), "left_anti"),
        r, checkpointEvery)
      visited = maybeCkpt(
        visited.union(frontier.withColumn("dist", lit(r))), r, checkpointEvery)
      r += 1
    }
    materializeAndRelease(visited, release: _*)
  }

  /** Widest-path (maximum-bottleneck) capacities from a seed set over a
    * weighted undirected graph: W(v) = max over seed→v paths of ≤`rounds`
    * hops of min(edge weight along the path) — Bellman–Ford relaxation
    * under the (max, min) semiring. `edges` carries (src, dst, w);
    * `seeds` carries (id, cap) with cap the starting capacity (pass a
    * sentinel above every edge weight for "unbounded"). Returns
    * (id, cap) for every node reached within `rounds`, seeds included.
    *
    * Scale shape: the edge list is symmetrized once and pre-partitioned
    * on the per-round join key (see [[pageRank]]); each round relaxes
    * ONLY the frontier — nodes whose capacity improved last round. That
    * is equivalent to relaxing every settled node (a non-improved node
    * re-offers exactly the candidates its neighbors already saw last
    * round, each ≤ the receiver's current capacity) but keeps the
    * per-round join frontier-sized. All arithmetic is long max/min, so
    * a round-unrolled SQL oracle replays it bit-exactly.
    */
  def widestPaths(edges: DataFrame, seeds: DataFrame, rounds: Int,
      checkpointEvery: Int = 1): DataFrame = {
    val sym = edges
      .select(explode(array(
        struct(col("src").as("s"), col("dst").as("d"), col("w").as("w")),
        struct(col("dst").as("s"), col("src").as("d"), col("w").as("w"))))
        .as("e"))
      .select(col("e.s").as("src"), col("e.d").as("dst"), col("e.w").as("w"))
      .repartition(col("src")).cache()
    widestPathsCore(sym, seeds, rounds, checkpointEvery, release = Seq(sym))
  }

  /** [[widestPaths]] over a caller-owned symmetrized weighted edge layout
    * (src, dst, w) — both directions present, partitioned on `src` and
    * persisted. Identical relax rounds; the shared frame stays persisted
    * on return.
    */
  def widestPathsOn(symBySrc: DataFrame, seeds: DataFrame, rounds: Int,
      checkpointEvery: Int = 1): DataFrame =
    widestPathsCore(symBySrc, seeds, rounds, checkpointEvery, release = Nil)

  private def widestPathsCore(sym: DataFrame, seeds: DataFrame, rounds: Int,
      checkpointEvery: Int, release: Seq[DataFrame]): DataFrame = {
    var best = seeds.select(col("id"), col("cap"))
    var frontier = best
    var r = 1
    while (r <= rounds) {
      val cand = sym
        .join(frontier.select(col("id").as("src"), col("cap").as("fcap")),
          Seq("src"))
        .select(col("dst").as("id"), least(col("fcap"), col("w")).as("cand"))
        .groupBy("id").agg(max("cand").as("cand"))
      frontier = maybeCkpt(
        cand.join(best, Seq("id"), "left_outer")
          .filter(col("cap").isNull || col("cand") > col("cap"))
          .select(col("id"), col("cand").as("cap")),
        r, checkpointEvery)
      best = maybeCkpt(
        best.unionByName(frontier).groupBy("id").agg(max("cap").as("cap")),
        r, checkpointEvery)
      r += 1
    }
    materializeAndRelease(best, release: _*)
  }

  /** Adamic–Adar link prediction (Adamic & Adar 2003) over an undirected
    * graph: for every non-adjacent pair (x, y) with at least one common
    * neighbor, score = Σ_u 1/ln(deg(u)) over the common neighbors u —
    * neighbors that are themselves selective (low degree) count more.
    * Returns (x, y, common_neighbors, aa_score) for x < y.
    *
    * Scale shape: candidate pairs are generated as wedges through each
    * CENTER node u (one self-join of the symmetrized neighbor list keyed
    * on u), never as a node×node product — the pair space is bounded by
    * Σ deg(u)², and `maxCenterDegree` excludes celebrity hubs whose
    * deg² wedge fan-out would melt a reducer (their common-neighbor
    * evidence is also the least informative: 1/ln(deg) → 0). Existing
    * edges drop with one anti join against the canonical edge set; the
    * final score is one (x, y)-keyed aggregation.
    */
  def adamicAdar(edges: DataFrame,
      maxCenterDegree: Int = 10000,
      canonicalEdges: Boolean = false): DataFrame = {
    val und =
      if (canonicalEdges)
        edges.select(col("src").as("a"), col("dst").as("b"))
      else edges
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .filter(col("a") =!= col("b")).distinct().cache()
    val nbr = und
      .select(explode(array(
        struct(col("a").as("u"), col("b").as("n")),
        struct(col("b").as("u"), col("a").as("n")))).as("e"))
      .select(col("e.u").as("u"), col("e.n").as("n"))
    val deg = nbr.groupBy("u").agg(count(lit(1)).as("d"))
    // centers need >= 2 neighbors to form a wedge; 1/ln(d) is therefore
    // always finite. The degree join rides the aggregation's own hash
    // partitioning on u — no extra exchange before the wedge self-join.
    val c = nbr.join(
      deg.filter(col("d") >= 2 && col("d") <= maxCenterDegree), Seq("u"))
    val wedges = c.select(col("u"), col("n").as("x"), col("d"))
      .join(c.select(col("u"), col("n").as("y")), Seq("u"))
      .filter(col("x") < col("y"))
    val cand = wedges
      .join(und.select(col("a").as("x"), col("b").as("y")),
        Seq("x", "y"), "left_anti")
    materializeAndRelease(
      cand.groupBy("x", "y")
        .agg(count(lit(1)).as("common_neighbors"),
          sum(lit(1.0) / log(col("d"))).as("aa_score")),
      (if (canonicalEdges) Nil else Seq(und)): _*)
  }

  /** HITS hubs & authorities (Kleinberg 1999) over a DIRECTED bipartite
    * edge list — src is the hub side, dst the authority side, and the two
    * id spaces stay separate throughout (they may overlap numerically):
    *
    *   a ← Σ_{src→dst} h(src);  h ← Σ_{src→dst} a(dst)
    *
    * Rounds run UNNORMALIZED: every mid-step L2 norm is a scalar that
    * cancels in the final normalized vectors (power-iteration
    * invariance), so each side normalizes exactly once at the end. That
    * removes 2·iters 1-row norm broadcasts AND keeps every intermediate
    * an exact integer in doubles (h₀ ≡ 1 ⇒ all sums are edge counts;
    * exact below 2⁵³ for any realistic depth) — the only FP rounding in
    * the whole operator is the final division. Round 1's authority
    * update needs no join at all: Σ h₀ over in-edges IS the in-degree.
    * Output: one row per node, `(role ∈ {hub, authority}, id, score)`.
    *
    * Scale shape: the edge list is cached TWICE, partitioned on src (the
    * a-step's join key) and on dst (the h-step's) — two exchanges up
    * front buy the per-round big-side re-shuffles, the same trade the
    * pageRank layout records in PLANS.md. Each half-step is one
    * co-partitioned edge-scan join + opposite-key hash aggregation
    * (map-side combine collapses edges to nodes before the wire), and
    * the whole iteration chains lazily into one DAG.
    */
  def hitsBipartite(
      edges: DataFrame,
      iters: Int,
      checkpointEvery: Int = DefaultCheckpointEvery,
      distinctEdges: Boolean = false): DataFrame = {
    require(iters >= 1, "hits needs at least one round")
    val base = edges.select(col("src"), col("dst"))
    // one shuffle per layout, not distinct + repartition: dedup runs
    // INSIDE the key layout (hash(key) already clusters (src, dst), so
    // dropDuplicates adds no exchange)
    def layout(key: String): DataFrame = {
      val r = base.repartition(col(key))
      if (distinctEdges) r else r.dropDuplicates("src", "dst")
    }
    val eDst = layout("dst").cache() // used every round + the degree init
    // the src layout is read iters−1 times: a cache write for a single
    // consumer is pure overhead
    val eSrc = if (iters > 2) layout("src").cache() else layout("src")
    // a₁ = in-degree (h₀ ≡ 1); eDst's layout makes this exchange-free
    var a = eDst.groupBy(col("dst").as("id"))
      .agg(count(lit(1)).cast("double").as("a"))
    var h: DataFrame = null
    for (i <- 1 to iters) {
      h = maybeCkpt(
        eDst.join(a.withColumnRenamed("id", "dst"), Seq("dst"))
          .groupBy(col("src").as("id")).agg(sum("a").as("h")),
        i, checkpointEvery)
      if (i < iters)
        a = maybeCkpt(
          eSrc.join(h.withColumnRenamed("id", "src"), Seq("src"))
            .groupBy(col("dst").as("id")).agg(sum("h").as("a")),
          i, checkpointEvery)
    }
    // final vectors feed BOTH their norm aggregate and the scaled output:
    // lazily checkpoint so the second consumer reads stored blocks
    def normalized(df: DataFrame, c: String): DataFrame = {
      val m = df.localCheckpoint(eager = false)
      m.crossJoin(broadcast(m.agg(sqrt(sum(col(c) * col(c))).as("nrm"))))
        .select(col("id"), (col(c) / col("nrm")).as(c))
    }
    val hn = normalized(h, "h")
    val an = normalized(a, "a")
    materializeAndRelease(
      hn.select(lit("hub").as("role"), col("id"), col("h").as("score"))
        .unionByName(an.select(lit("authority").as("role"), col("id"),
          col("a").as("score"))),
      eSrc, eDst)
  }
}
