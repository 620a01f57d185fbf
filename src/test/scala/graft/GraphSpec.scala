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

  test("broadcast and shuffle rank-join paths produce identical ranks") {
    val edges = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"), ("c", "d"))
      .toDF("src", "dst")
    val bcast = Graph.pageRank(edges, iters = 4)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    val shuffle = Graph.pageRank(edges, iters = 4, broadcastNodeLimit = 0L)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(bcast.keySet === shuffle.keySet)
    bcast.foreach { case (k, v) => assert(math.abs(v - shuffle(k)) < 1e-12, k) }
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
}
