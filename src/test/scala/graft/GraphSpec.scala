package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

class GraphSpec extends SparkSuite {
  import spark.implicits._

  test("one PageRank round matches the hand-computed distribution") {
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c")).toDF("src", "dst")
    val r = Graph.pageRank(edges, iters = 1)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    // n=3, teleport 0.05; mass(b)=1/6, mass(c)=1/2, a gets none
    assert(math.abs(r("a") - 0.05) < 1e-12)
    assert(math.abs(r("b") - (0.05 + 0.85 / 6)) < 1e-12)
    assert(math.abs(r("c") - (0.05 + 0.85 * 0.5)) < 1e-12)
  }

  test("ranks stay positive and bounded; total mass never exceeds 1") {
    val edges = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val r = Graph.pageRank(edges, iters = 10).select("rank").as[Double].collect()
    assert(r.forall(x => x > 0 && x < 1))
    // this graph has no dangling nodes → mass is conserved exactly
    assert(math.abs(r.sum - 1.0) < 1e-9)
  }

  test("lazy chain and per-round-checkpointed chain produce identical ranks") {
    val edges = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"), ("c", "d"))
      .toDF("src", "dst")
    val lazyChain = Graph.pageRank(edges, iters = 4)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    val ckptEvery = Graph.pageRank(edges, iters = 4, checkpointEvery = 1)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(lazyChain.keySet === ckptEvery.keySet)
    lazyChain.foreach { case (k, v) =>
      assert(math.abs(v - ckptEvery(k)) < 1e-12, k) }
  }

  test("tol early-exit stops at the fixpoint without changing converged ranks") {
    val edges = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    // 50 rounds with a tolerance: converges long before the cap
    val converged = Graph.pageRank(edges, iters = 50, tol = 1e-12)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    // 10 extra capped rounds from the same tolerance land on the same point
    val more = Graph.pageRank(edges, iters = 60, tol = 1e-12)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    converged.foreach { case (k, v) => assert(math.abs(v - more(k)) < 1e-9, k) }
    // and the fixpoint matches the analytic stationary distribution sum
    assert(math.abs(converged.values.sum - 1.0) < 1e-9)
  }

  test("personalizedPageRank matches hand-computed rounds on a 3-cycle") {
    // a→b→c→a, seed {a}: r0=(1,0,0); r1=(0.15, 0.85, 0);
    // r2=(0.15, 0.85·0.15, 0.85·0.85) — mass conserved (no dangling)
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val seeds = Seq("a").toDF("id")
    val r = Graph.personalizedPageRank(edges, seeds, iters = 2)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(math.abs(r("a") - 0.15) < 1e-12)
    assert(math.abs(r("b") - 0.85 * 0.15) < 1e-12)
    assert(math.abs(r("c") - 0.85 * 0.85) < 1e-12)
    assert(math.abs(r.values.sum - 1.0) < 1e-12)
  }

  test("personalizedPageRank with all nodes seeded equals plain pageRank") {
    val edges = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"))
      .toDF("src", "dst")
    val allSeeds = Seq("a", "b", "c").toDF("id")
    val ppr = Graph.personalizedPageRank(edges, allSeeds, iters = 4)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    val pr = Graph.pageRank(edges, iters = 4)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    pr.foreach { case (k, v) => assert(math.abs(ppr(k) - v) < 1e-12, k) }
  }

  test("personalizedPageRank ignores off-graph seeds; requires one on-graph") {
    val edges = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    // "z" is not a node: the restart distributes 1/1 over {a}, not 1/2
    val r = Graph.personalizedPageRank(edges, Seq("a", "z").toDF("id"),
        iters = 1)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(math.abs(r("a") - 0.15) < 1e-12)
    assert(math.abs(r("b") - 0.85) < 1e-12)
    intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(edges, Seq("z").toDF("id"), iters = 1)
    }
  }

  test("hitsBipartite matches two hand-computed rounds on a 2x2 graph") {
    // h1->{a1,a2}, h2->a1. Unnormalized chain: a1=(indeg)=(2,1),
    // h1=(3,2), a2=(5,3), h2=(8,5); final norms √34 and √89 — identical
    // to per-half-step normalization (scalars cancel).
    val edges = Seq((10L, 1L), (10L, 2L), (20L, 1L)).toDF("src", "dst")
    val r = Graph.hitsBipartite(edges, iters = 2)
      .collect().map(x => (x.getString(0), x.getLong(1)) -> x.getDouble(2))
      .toMap
    assert(math.abs(r(("hub", 10L)) - 8.0 / math.sqrt(89)) < 1e-9)
    assert(math.abs(r(("hub", 20L)) - 5.0 / math.sqrt(89)) < 1e-9)
    assert(math.abs(r(("authority", 1L)) - 5.0 / math.sqrt(34)) < 1e-9)
    assert(math.abs(r(("authority", 2L)) - 3.0 / math.sqrt(34)) < 1e-9)
    // L2 norms of each side are 1 after the final half-steps
    val hs = r.collect { case (("hub", _), v) => v * v }.sum
    assert(math.abs(hs - 1.0) < 1e-9)
  }

  test("hitsBipartite matches a dense-matrix model on a seeded random graph") {
    val rnd = new scala.util.Random(99)
    val hubs = 0L until 12L
    val auths = 100L until 115L
    val edges = (for {
      h <- hubs; a <- auths if rnd.nextDouble() < 0.3
    } yield (h, a)).distinct
    // unnormalized power-iteration model: a1 = indeg, h1 = E a1,
    // a2 = E^T h1, h2 = E a2; normalize each side once at the end
    val aIds = edges.map(_._2).distinct.sorted
    val hIds = edges.map(_._1).distinct.sorted
    var a = aIds.map(i => i -> edges.count(_._2 == i).toDouble).toMap
    var h = Map.empty[Long, Double]
    for (round <- 1 to 2) {
      h = hIds.map(s =>
        s -> edges.filter(_._1 == s).map(e => a(e._2)).sum).toMap
      if (round < 2)
        a = aIds.map(d =>
          d -> edges.filter(_._2 == d).map(e => h(e._1)).sum).toMap
    }
    def norm(m: Map[Long, Double]) = {
      val z = math.sqrt(m.values.map(v => v * v).sum)
      m.map { case (k, v) => k -> v / z }
    }
    val (hn, an) = (norm(h), norm(a))
    val got = Graph.hitsBipartite(edges.toDF("src", "dst"), iters = 2)
      .collect().map(x => (x.getString(0), x.getLong(1)) -> x.getDouble(2))
      .toMap
    hn.foreach { case (id, v) =>
      assert(math.abs(got(("hub", id)) - v) < 1e-9, s"hub $id") }
    an.foreach { case (id, v) =>
      assert(math.abs(got(("authority", id)) - v) < 1e-9, s"auth $id") }
    assert(got.size === hn.size + an.size)
  }

  test("label propagation finds two triangles joined by a bridge") {
    // triangles {1,2,3} and {10,11,12} plus bridge 3-10: within a few
    // synchronous rounds each triangle agrees on its min label, and the
    // bridge endpoints stay with their own (majority) triangle
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L)).toDF("src", "dst")
    val labels = Graph.labelPropagation(edges, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L).map(labels).distinct === Seq(1L))
    assert(Seq(10L, 11L, 12L).map(labels).distinct.size === 1)
    assert(labels(10L) !== labels(1L))
  }

  test("label propagation is deterministic across checkpoint strides") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (5L, 6L))
      .toDF("src", "dst")
    val a = Graph.labelPropagation(edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Graph.labelPropagation(edges, iters = 3, checkpointEvery = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
    // labels always come from the node-id space (synchronous LPA may
    // oscillate on bipartite substructures — the pair 5-6 swaps labels
    // each round — but never invents a label)
    assert(a.values.toSet.subsetOf(Set(1L, 2L, 3L, 4L, 5L, 6L)))
  }

  test("triangleStats counts K4 exactly and canonicalizes noisy edges") {
    // K4 fed as a noisy list: duplicates and reversed directions must
    // collapse to 6 undirected edges, 12 wedges, 4 triangles, coeff 1
    val k4 = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L),
      (3L, 2L), (2L, 4L), (3L, 4L), (3L, 4L)).toDF("src", "dst")
    val r = Graph.triangleStats(k4)
      .as[(Long, Long, Long, Long, Double)].head()
    assert(r === ((4L, 6L, 12L, 4L, 1.0)))
    // a path has wedges but no triangle; coefficient must be exactly 0
    val path = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val p = Graph.triangleStats(path)
      .as[(Long, Long, Long, Long, Double)].head()
    assert(p === ((3L, 2L, 1L, 0L, 0.0)))
  }

  test("triangleStatsFromSupport matches triangleStats on the same graph") {
    // the persisted-index fast path: census from a precomputed support
    // relation must agree column-for-column with the live wedge
    // enumeration — K4 plus a pendant chain exercises support 2 edges,
    // support 0 edges, and wedge-only nodes
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("src", "dst")
    val live = Graph.triangleStats(edges)
      .as[(Long, Long, Long, Long, Double)].head()
    val sup = Graph.edgeSupport(edges)
    val fast = Graph.triangleStatsFromSupport(
        edges.select(least($"src", $"dst").as("src"),
          greatest($"src", $"dst").as("dst")).distinct(), sup)
      .as[(Long, Long, Long, Long, Double)].head()
    assert(fast === live)
    assert(fast === ((6L, 8L, 16L, 4L, 0.75)))
    // triangle-free graph: support sums to zero, coefficient exactly 0
    val path = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val pf = Graph.triangleStatsFromSupport(path, Graph.edgeSupport(path))
      .as[(Long, Long, Long, Long, Double)].head()
    assert(pf === ((3L, 2L, 1L, 0L, 0.0)))
  }

  test("ktrussPeel with precomputed round-1 support equals the live peel") {
    // K4 plus pendant, canonical input: seeding round 1 from
    // edgeSupport (the persisted-layout path) must reproduce the
    // live peel round-for-round
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val live = Graph.ktrussPeel(edges, k = 4, rounds = 2)
      .as[(Int, Long, Long)].collect().toList
    val seeded = Graph.ktrussPeel(edges, k = 4, rounds = 2,
        initialSupport = Some(Graph.edgeSupport(edges)))
      .as[(Int, Long, Long)].collect().toList
    assert(seeded === live)
    assert(seeded === List((1, 6L, 1L), (2, 6L, 0L)))
    // a support relation that does NOT cover the canonical edge set
    // (wrong graph / stale layout) must be detected by the row-count
    // guard and ignored in favor of live enumeration — not silently
    // peeled into wrong round counts
    val wrongGraph = Seq((10L, 20L), (20L, 30L)).toDF("src", "dst")
    val mismatched = Graph.ktrussPeel(edges, k = 4, rounds = 2,
        initialSupport = Some(Graph.edgeSupport(wrongGraph)))
      .as[(Int, Long, Long)].collect().toList
    assert(mismatched === live)
    // ADVICE r10: a wrong-graph relation with coincidentally EQUAL
    // cardinality used to slip past the count-only guard; the pair
    // checksum must reject it too. Same 7 canonical edges but a
    // triangle-free path — if it were trusted, every support would be
    // 0 and round 1 would drop all 7 edges instead of live's 1.
    val sameCountWrong = Seq((10L, 20L), (20L, 30L), (30L, 40L),
      (40L, 50L), (50L, 60L), (60L, 70L), (70L, 80L)).toDF("src", "dst")
    assert(Graph.edgeSupport(sameCountWrong).count() === 7L)
    val equalCard = Graph.ktrussPeel(edges, k = 4, rounds = 2,
        initialSupport = Some(Graph.edgeSupport(sameCountWrong)))
      .as[(Int, Long, Long)].collect().toList
    assert(equalCard === live)
  }

  test("kCore peels a pendant chain down to the K4 2-core") {
    // K4 on 1-4 plus a chain 4-5-6: node 6 (deg 1) falls in round 1,
    // which drops 5 to deg 1 so it falls in round 2 — the cascade the
    // fixed rounds must reproduce. Survivors are exactly K4, all deg 3.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("src", "dst")
    val core = Graph.kCore(edges, k = 2, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // too few rounds must show the intermediate state (6 gone, 5 still
    // in with its now-dangling edge counted against the survivor set)
    val one = Graph.kCore(edges, k = 2, rounds = 1)
      .collect().map(r => r.getLong(0)).toSet
    assert(one === Set(1L, 2L, 3L, 4L, 5L))
    // k above the max degree empties the graph
    assert(Graph.kCore(edges, k = 5, rounds = 2).count() === 0L)
  }

  test("kCore is checkpoint-stride identical") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val a = Graph.kCore(edges, k = 2, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Graph.kCore(edges, k = 2, rounds = 3, checkpointEvery = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b)
    assert(a === Set((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("bfsHops stamps exact hop distances on a path with a branch") {
    // 1-2-3-4-5 plus branch 2-6: from seed {1}, dist = id's path length
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (2L, 6L))
      .toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    val got = Graph.bfsHops(edges, seeds, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    // 5 is 4 hops out — beyond rounds=3, so absent
    assert(got === Set((1L, 0), (2L, 1), (3L, 2), (6L, 2), (4L, 3)))
  }

  test("bfsHops is checkpoint-stride identical and revisit-free") {
    // a cycle: revisits must not re-stamp shorter-known nodes
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    val a = Graph.bfsHops(edges, seeds, rounds = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val b = Graph.bfsHops(edges, seeds, rounds = 4, checkpointEvery = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(a === b)
    assert(a === Set((1L, 0), (2L, 1), (3L, 1), (4L, 2)))
  }

  test("widestPaths prefers the wide 2-hop route over the narrow direct path") {
    val edges = Seq((1L, 2L, 10L), (2L, 3L, 1L), (1L, 4L, 3L), (4L, 3L, 5L))
      .toDF("src", "dst", "w")
    val seeds = Seq((1L, Long.MaxValue / 2)).toDF("id", "cap")
    val got = Graph.widestPaths(edges, seeds, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(2L) === 10L)
    assert(got(4L) === 3L)
    // 1-4-3 bottleneck 3 beats 1-2-3 bottleneck 1
    assert(got(3L) === 3L)
    assert(got(1L) === Long.MaxValue / 2)
  }

  test("widestPaths horizon is bounded by rounds") {
    val edges = Seq((1L, 2L, 5L), (2L, 3L, 4L), (3L, 4L, 3L))
      .toDF("src", "dst", "w")
    val seeds = Seq((1L, 100L)).toDF("id", "cap")
    val one = Graph.widestPaths(edges, seeds, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one === Map(1L -> 100L, 2L -> 5L))
    val three = Graph.widestPaths(edges, seeds, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(three === Map(1L -> 100L, 2L -> 5L, 3L -> 4L, 4L -> 3L))
  }

  test("widestPaths re-improves a node settled earlier on a narrow path") {
    // 1-3 direct but narrow (w=1); 1-2-3 wider (min(9,8)=8): round 1
    // settles 3 at 1, round 2 must lift it to 8
    val edges = Seq((1L, 3L, 1L), (1L, 2L, 9L), (2L, 3L, 8L))
      .toDF("src", "dst", "w")
    val seeds = Seq((1L, 100L)).toDF("id", "cap")
    val got = Graph.widestPaths(edges, seeds, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(3L) === 8L)
    val ck = Graph.widestPaths(edges, seeds, rounds = 2, checkpointEvery = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === ck)
  }

  test("widestPaths matches a plain max-min relaxation on random graphs") {
    // seeded ScalaCheck generators (same bridge-free pattern as
    // PipelinePropertySpec): random small weighted graphs, reference =
    // rounds of full (max, min) relaxation over an in-memory map —
    // pins the frontier-only optimization against the textbook form
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val graphGen: Gen[Seq[(Long, Long, Long)]] = for {
      n <- Gen.chooseNum(3, 6)
      pairs = (1 to n).flatMap(a => (a + 1 to n).map(b => (a.toLong, b.toLong)))
      picks <- Gen.listOfN(pairs.size, Gen.prob(0.5))
      ws <- Gen.listOfN(pairs.size, Gen.chooseNum(1L, 9L))
    } yield pairs.lazyZip(picks).lazyZip(ws)
      .collect { case ((a, b), true, w) => (a, b, w) }.toSeq
    def ref(edges: Seq[(Long, Long, Long)], seed: Long, cap0: Long,
        rounds: Int): Map[Long, Long] = {
      val sym = edges.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
      var best = Map(seed -> cap0)
      for (_ <- 1 to rounds) {
        val offers = sym.flatMap { case (u, v, w) =>
          best.get(u).map(c => v -> math.min(c, w)) }
        best = (best.toSeq ++ offers).groupBy(_._1)
          .map { case (k, vs) => k -> vs.map(_._2).max }
      }
      best
    }
    val p = Gen.Parameters.default
    val graphs = Iterator.iterate(Seed(7L))(_.next)
      .map(s => graphGen.apply(p, s)).collect { case Some(g) => g }
      .take(8).toSeq
    graphs.foreach { g =>
      val expect = ref(g, seed = 1L, cap0 = 50L, rounds = 4)
      val got =
        if (g.isEmpty) Map(1L -> 50L)
        else Graph.widestPaths(g.toDF("src", "dst", "w"),
            Seq((1L, 50L)).toDF("id", "cap"), rounds = 4)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expect, s"graph: $g")
    }
  }

  test("ktrussPeel canonicalizes messy input (duplicates, self-loops, reversed)") {
    // K4 on 1..4 fed with reversed duplicates, a self-loop, and a
    // reversed pendant (5,4): round 1 must canonicalize before counting
    // supports, so the peel sees 7 canonical edges, drops only the
    // pendant (support 0 < k−2), and the K4 (every edge in 2 triangles)
    // is a fixpoint — the answer for the CLEAN graph
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (1L, 4L),
      (2L, 3L), (4L, 2L), (3L, 4L), (4L, 3L), (2L, 2L), (5L, 4L))
      .toDF("src", "dst")
    val r = Graph.ktrussPeel(edges, k = 4, rounds = 2)
      .as[(Int, Long, Long)].collect().toList
    assert(r === List((1, 6L, 1L), (2, 6L, 0L)))
  }

  test("adamicAdar scores the square's diagonals and skips existing edges") {
    // 4-cycle 1-2-3-4-1: the only non-adjacent pairs are the diagonals
    // (1,3) and (2,4), each with two degree-2 common neighbors
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val r = Graph.adamicAdar(edges)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    assert(r.map(t => (t._1, t._2, t._3)).toSeq === Seq((1L, 3L, 2L), (2L, 4L, 2L)))
    r.foreach(t => assert(math.abs(t._4 - 2.0 / math.log(2.0)) < 1e-12))
    // a path 1-2-3 has one wedge; its endpoints score 1/ln(2)
    val path = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val pr = Graph.adamicAdar(path).collect()
    assert(pr.length === 1)
    assert(pr(0).getLong(0) === 1L && pr(0).getLong(1) === 3L)
    assert(math.abs(pr(0).getDouble(3) - 1.0 / math.log(2.0)) < 1e-12)
  }

  test("adamicAdar maxCenterDegree excludes hub-mediated candidates") {
    // star center 0 with leaves 1..4: every leaf pair is hub-mediated;
    // capping the center degree below 4 must drop them all
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("src", "dst")
    assert(Graph.adamicAdar(star).count() === 6L) // C(4,2) leaf pairs
    assert(Graph.adamicAdar(star, maxCenterDegree = 3).count() === 0L)
  }

  test("shared-layout *On operators are bit-identical to the self-building ones") {
    // r13: the iterative operators gained shared-layout entry points that
    // skip the per-call canonicalize/repartition/cache. The rounds must be
    // IDENTICAL — same joins, same float arithmetic — so every *On result
    // is compared bitwise (doubles via java.lang.Double.compare) against
    // the original operator on the same graph, including the
    // column-swapped symmetric view label propagation consumes.
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 1L), (4L, 3L), (6L, 3L),
      (6L, 5L), (8L, 5L), (8L, 7L), (10L, 7L), (10L, 1L)).toDF("src", "dst")
    val g = Graph.sharedDigraph(edges, distinctEdges = true)
    def ranksOf(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val pr0 = ranksOf(Graph.pageRank(edges, iters = 5, distinctEdges = true))
    val pr1 = ranksOf(Graph.pageRankOn(g, iters = 5))
    assert(pr0.keySet === pr1.keySet)
    pr0.foreach { case (k, v) =>
      assert(java.lang.Double.compare(v, pr1(k)) === 0, s"pageRank node $k") }
    val seeds = Seq(1L, 3L).toDF("id")
    val pp0 = ranksOf(Graph.personalizedPageRank(edges, seeds, iters = 4,
      distinctEdges = true))
    val pp1 = ranksOf(Graph.personalizedPageRankOn(g, seeds, iters = 4))
    assert(pp0.keySet === pp1.keySet)
    pp0.foreach { case (k, v) =>
      assert(java.lang.Double.compare(v, pp1(k)) === 0, s"ppr node $k") }
    // symmetric layout partitioned on src; swapped view feeds LP (dst key)
    val sym = edges.select(explode(array(
        struct($"src".as("s"), $"dst".as("d")),
        struct($"dst".as("s"), $"src".as("d")))).as("e"))
      .select($"e.s".as("src"), $"e.d".as("dst"))
      .repartition($"src").cache()
    val lp0 = Graph.labelPropagation(edges, iters = 3, canonicalEdges = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lp1 = Graph.labelPropagationOn(
        sym.select($"dst".as("src"), $"src".as("dst")), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lp0 === lp1)
    val bf0 = Graph.bfsHops(edges, seeds, rounds = 3, canonicalEdges = true)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val bf1 = Graph.bfsHopsOn(sym, seeds, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(bf0 === bf1)
    val kc0 = Graph.kCore(edges, k = 2, rounds = 3, canonicalEdges = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kc1 = Graph.kCoreOn(sym, k = 2, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kc0 === kc1)
    val wedges = edges.withColumn("w", $"src" + $"dst")
    val wsym = wedges.select(explode(array(
        struct($"src".as("s"), $"dst".as("d"), $"w".as("w")),
        struct($"dst".as("s"), $"src".as("d"), $"w".as("w")))).as("e"))
      .select($"e.s".as("src"), $"e.d".as("dst"), $"e.w".as("w"))
      .repartition($"src").cache()
    val wseeds = Seq((1L, 100L)).toDF("id", "cap")
    val wp0 = Graph.widestPaths(wedges, wseeds, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wp1 = Graph.widestPathsOn(wsym, wseeds, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(wp0 === wp1)
    Seq(g.edgesBySrc, g.nodeDeg, sym, wsym).foreach(_.unpersist())
  }
}
