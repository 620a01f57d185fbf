package graft

import org.apache.spark.sql.functions._

import graft.operators.Retrieval

class RetrievalSpec extends SparkSuite {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "spark spark join fast"), // tf(spark)=2, tf(join)=1, dl=4
    (2L, "join table scan"),       // tf(join)=1, dl=3
    (3L, "sort merge only")        // no matches, dl=3
  ).toDF("doc_id", "text")

  test("bm25 matches the textbook formula on a tiny corpus") {
    val out = Retrieval.bm25(corpus, Seq("spark", "join"))
      .select("doc_id", "n_terms", "score")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap

    // N=3, avgdl=10/3; df(spark)=1, df(join)=2
    val avgdl = 10.0 / 3.0
    def idf(df: Int) = math.log((3 - df + 0.5) / (df + 0.5) + 1.0)
    def part(tf: Int, dl: Int, df: Int) =
      idf(df) * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

    assert(out(1L)._1 === 2)
    assert(out(1L)._2 === r4(part(2, 4, 1) + part(1, 4, 2)))
    assert(out(2L)._1 === 1)
    assert(out(2L)._2 === r4(part(1, 3, 2)))
    assert(!out.contains(3L)) // zero-match docs never materialize
  }

  test("ranking is score-descending with doc-id tie-break on the fixture") {
    val docs = engine.Tables.load(spark, sfDir, "documents")
    val rows = Retrieval.bm25(docs, Seq("spark", "join", "window"))
      .select("score", "doc_id").as[(Double, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.sameElements(rows.sortBy { case (s, id) => (-s, id) }))
  }

  test("a document dominated by a query term outranks casual mentions") {
    val docs = Seq(
      (1L, "spark spark spark spark"),
      (2L, "spark is one word among very many other words here today")
    ).toDF("doc_id", "text")
    val top = Retrieval.bm25(docs, Seq("spark")).select("doc_id").as[Long].head()
    assert(top === 1L)
  }

  test("packShards: every doc lands in exactly one shard, offsets partition the stream") {
    val docs = Seq(
      ("s1", 1L, "a b c"), ("s1", 2L, "d e"), ("s1", 3L, "f g h i"),
      ("s1", 4L, "j"), ("s2", 10L, "one two three four five six")
    ).toDF("source", "doc_id", "text")
    val out = Retrieval.packShards(docs, budget = 5)
      .select("source", "doc_id", "n_tok", "shard_id")
      .as[(String, Long, Long, Int)].collect().sortBy(r => (r._1, r._2))

    assert(out.map(_._2).toSet === Set(1L, 2L, 3L, 4L, 10L)) // total assignment
    // s1 token stream: 3,2,4,1 → offsets 0,3,5,9 → shards 0,0,1,1
    assert(out.filter(_._1 == "s1").map(_._4).toSeq === Seq(0, 0, 1, 1))
    // a doc longer than the budget still lands in exactly one shard
    assert(out.filter(_._1 == "s2").map(_._4).toSeq === Seq(0))
    // shard ids are non-decreasing in doc order within a source
    out.groupBy(_._1).values.foreach { g =>
      val ids = g.sortBy(_._2).map(_._4)
      assert(ids.zip(ids.tail).forall { case (a, b) => a <= b })
    }
  }

  test("packShards shard token totals stay within budget + one overshoot doc") {
    val docs = engine.Tables.load(spark, sfDir, "documents")
    val perShard = Retrieval.packShards(docs, budget = 500)
      .groupBy("source", "shard_id")
      .agg(sum("n_tok").as("tot"), max("n_tok").as("mx"),
        max("shard_id").as("sid"))
    val rows = perShard.select("tot", "mx").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    // each shard spans < budget of cumulative offset, so its total is
    // < budget + its own largest (the one overshooting) document
    rows.foreach { case (tot, mx) => assert(tot < 500 + mx) }
  }

  test("hybridRrf fuses keyword and vector ranks; both-list docs dominate") {
    val docs = Seq(
      (1L, "spark join window"), // keyword hit
      (2L, "spark spark spark"), // keyword hit
      (3L, "nothing relevant")   // vector-only candidate
    ).toDF("doc_id", "text")
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)),  // cos=1 vs probe → vec rank 1
      (2L, Array(0.0f, 1.0f)),  // cos=0
      (3L, Array(0.9f, 0.1f))
    ).toDF("vec_id", "embedding")
    val out = Retrieval.hybridRrf(docs, emb, Seq("spark"), Seq(1.0, 0.0),
        candidates = 10, kRrf = 60)
      .select("doc_id", "rrf").as[(Long, Double)].collect().toMap

    assert(out.keySet === Set(1L, 2L, 3L)) // full outer: either list survives
    // doc 1: kw rank (present) + vec rank 1 → strictly more than any
    // single-list score; doc 3 has no keyword hits → vec contribution only
    assert(out(1L) > out(3L))
    val maxSingle = 1.0 / 61
    assert(out(1L) > maxSingle && out(1L) <= 2.0 / 61 + 1e-9)
    out.values.foreach(v => assert(v > 0))
  }

  test("trigram substring search equals the full-scan filter exactly") {
    val docs = engine.Tables.load(spark, sfDir, "documents")
    Seq("spark", "join window", "table").foreach { q =>
      val indexed = Retrieval.trigramSubstringSearch(docs, q)
        .as[Long].collect().toSeq
      val scan = docs.filter($"text".contains(q))
        .select("doc_id").as[Long].collect().toSeq.sorted
      assert(indexed === scan, s"query '$q'")
    }
    assert(Retrieval.trigramSubstringSearch(docs, "zzzqqq").count() === 0)
    intercept[IllegalArgumentException] {
      Retrieval.trigramSubstringSearch(docs, "ab")
    }
  }

  test("graft_trigrams is identical to the HOF trigrams on all fixture docs") {
    val docs = engine.Tables.load(spark, sfDir, "documents")
    val mismatches = docs.select(
        Retrieval.trigrams($"text").as("fast"),
        Retrieval.trigramsHof($"text").as("slow"))
      .filter($"fast" =!= $"slow")
      .count()
    assert(mismatches === 0)
    // edge cases: short and empty strings
    val edge = Seq("", "a", "ab", "abc", "abcd", "ababab").toDF("text")
    val rows = edge.select(Retrieval.trigrams($"text").as("f"),
        Retrieval.trigramsHof($"text").as("s"))
      .as[(Seq[String], Seq[String])].collect()
    rows.foreach { case (f, sl) => assert(f === sl) }
  }
}
