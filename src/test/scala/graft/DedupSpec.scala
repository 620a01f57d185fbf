package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dedup-family properties (SURVEY.md §2.11): exact/normalized determinism,
  * minhash recall vs exact Jaccard, simhash Hamming bound — the invariants
  * the DuckDB oracle can't express (hash functions differ across engines).
  */
class DedupSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "a"),
    (2L, "the quick brown fox jumps over the lazy dog", "a"),  // exact dup of 1
    (3L, "the quick brown fox jumped over the lazy dog", "a"), // near dup of 1
    (4L, "The Quick, Brown Fox jumps over the lazy dog!", "a"), // normalized dup of 1
    (5L, "completely different content about spark engines", "b"),
    (6L, "completely different content about spark engines", "b"), // exact dup of 5
    (7L, "one two three four five six seven eight nine ten", "b")
  ).toDF("doc_id", "text", "source")

  test("exactDupGroups finds byte-identical groups with min id kept") {
    val g = Dedup.exactDupGroups(docs).orderBy("keep_id")
      .select("keep_id", "n_dups").as[(Long, Long)].collect()
    assert(g.toSeq === Seq((1L, 2L), (5L, 2L)))
  }

  test("exactDedup keeps lowest id deterministically") {
    val kept = Dedup.exactDedup(docs).select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(1L, 3L, 4L, 5L, 7L))
  }

  test("normalizedDedup also collapses punctuation/case variants") {
    val kept = Dedup.normalizedDedup(docs).select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(1L, 3L, 5L, 7L))
  }

  test("shingles: distinct k-grams; short texts degrade to whole-text") {
    val sh = docs.filter($"doc_id" === 1)
      .select(Dedup.shingles($"text", 3).as("sh"))
      .as[Seq[String]].head()
    assert(sh.contains("the quick brown"))
    assert(sh.size === 7) // 9 tokens → 7 trigrams, all distinct
    val short = Seq((8L, "tiny text")).toDF("doc_id", "text")
      .select(Dedup.shingles($"text", 3).as("sh")).as[Seq[String]].head()
    assert(short === Seq("tiny text"))
  }

  test("jaccard: identical → 1, disjoint → 0") {
    val row = docs.filter($"doc_id" === 1).select(
      Dedup.jaccard(Dedup.shingles($"text"), Dedup.shingles($"text")).as("same"),
      Dedup.jaccard(Dedup.shingles($"text"), Dedup.shingles(lit("x y z"))).as("diff"))
      .as[(Double, Double)].head()
    assert(row === ((1.0, 0.0)))
  }

  test("minhashNearDups surfaces exact and near dups above threshold") {
    val pairs = Dedup.minhashNearDups(docs, threshold = 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L))) // identical → jaccard 1, all bands agree
    assert(pairs.contains((5L, 6L)))
    assert(!pairs.exists(p => Set(p._1, p._2) == Set(1L, 7L))) // unrelated
  }

  test("minhash jaccard column equals exact jaccard for identical docs") {
    val j = Dedup.minhashNearDups(docs, threshold = 0.4)
      .filter($"id_a" === 1 && $"id_b" === 2)
      .select("jaccard").as[Double].head()
    assert(j === 1.0)
  }

  test("simhash: identical text → distance 0; near dup within 8 bits") {
    val pairs = Dedup.simhashNearDups(docs, maxDist = 8)
      .select($"id_a", $"id_b", $"dist").as[(Long, Long, Long)].collect()
    val m = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(m((1L, 2L)) === 0L)
    assert(m((5L, 6L)) === 0L)
    assert(m.get((1L, 3L)).forall(_ <= 8L)) // single-token edit stays close
  }

  test("maxBucket caps pair generation: cap 1 yields zero candidate pairs") {
    val docs = graft.engine.Tables.load(spark, sfDir, "documents")
    assert(Dedup.ngramJaccardPairs(docs, "source", maxBucket = 1).count() === 0)
    assert(Dedup.simhashNearDups(docs, maxBucket = 1).count() === 0)
    assert(Dedup.minhashNearDups(docs, maxBucket = 1).count() === 0)
  }

  test("embeddingNearDups finds identical vectors (cos=1) and skips far ones") {
    val emb = Seq(
      (1L, Array.fill(8)(1.0f)),
      (2L, Array.fill(8)(1.0f)),
      (3L, Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f))
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDups(emb, dim = 8, nPlanes = 4, threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("portable minhash/simhash surface exact duplicates at the extremes") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"), // = 1
      (3L, "completely different text about catalyst physical plans here"),
      (4L, "")
    ).toDF("doc_id", "text")
    val mh = Dedup.minhashNearDupsPortable(docs, threshold = 0.9)
      .as[(Long, Long, Double)].collect().toSeq
    assert(mh === Seq((1L, 2L, 1.0))) // identical docs: J = 1, nothing else
    val sh = Dedup.simhashNearDupsPortable(docs, maxDist = 0)
      .as[(Long, Long, Int)].collect().toSeq
    assert(sh === Seq((1L, 2L, 0))) // identical signature, dist 0; empty doc excluded
  }

  test("editDistancePairs matches a naive blocked self-join") {
    val df = Seq(
      ("b1", 1L, "alpha"), ("b1", 2L, "alphb"),  // dist 1
      ("b1", 3L, "gamma"),                       // far from both
      ("b2", 4L, "alpha"), ("b2", 5L, "alpha"),  // dist 0, different block from 1
      ("b2", 6L, "alxhb")                        // dist 2 from "alpha"
    ).toDF("blk", "id", "s")
    val got = Dedup.editDistancePairs(df, "blk", "s", idCol = "id", maxDist = 2)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet

    val rows = df.as[(String, Long, String)].collect()
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      a <- rows; b <- rows
      if a._1 == b._1 && a._2 < b._2 && lev(a._3, b._3) <= 2
    } yield (a._2, b._2, lev(a._3, b._3))).toSet
    assert(got === want)
    assert(got.contains((1L, 2L, 1)) && got.contains((4L, 5L, 0)))
    // cross-block near-identicals never pair
    assert(!got.exists(p => p._1 == 1L && p._2 == 4L))
  }

  test("keepBest keeps exactly the highest-score member of every cluster") {
    val fixture = engine.Tables.load(spark, sfDir, "documents")
    val labels = Dedup.connectedComponents(
      Dedup.ngramJaccardPairs(fixture, "source", threshold = 0.02))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.nonEmpty, "fixture must contain near-dup clusters")
    val survivors = Dedup
      .keepBest(fixture, "source", "n_chars", threshold = 0.02)
      .select("doc_id").as[Long].collect().toSet
    val byChar = fixture.select("doc_id", "n_chars")
      .as[(Long, Long)].collect().toMap
    // per cluster: the winner (max chars, ties min id) survives, others don't
    labels.groupBy(_._2).foreach { case (_, members) =>
      val ids = members.keys.toSeq
      val winner = ids.maxBy(id => (byChar(id), -id))
      assert(survivors.contains(winner), s"winner $winner dropped")
      ids.filterNot(_ == winner).foreach(id =>
        assert(!survivors.contains(id), s"loser $id survived"))
    }
    // docs in no cluster always survive
    val clustered = labels.keySet
    val all = fixture.select("doc_id").as[Long].collect().toSet
    assert((all -- clustered).subsetOf(survivors))
  }

  test("decontaminate removes exactly the shingle-sharing docs") {
    val fixture = engine.Tables.load(spark, sfDir, "documents")
    val bench = fixture.filter($"doc_id" % 97 === 0)
    val corpus = fixture.filter($"doc_id" % 97 =!= 0)
    val survivors = Dedup.decontaminate(corpus, bench, shingleK = 5)
      .select("doc_id").as[Long].collect().toSet
    // independent ground truth from collected shingle sets
    def shingleSets(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_id", Dedup.shingles($"text", 5).as("sh"))
      .as[(Long, Seq[String])].collect()
    val benchSh = shingleSets(bench).flatMap(_._2).toSet
    val want = shingleSets(corpus)
      .filter { case (_, sh) => !sh.exists(benchSh) }
      .map(_._1).toSet
    assert(survivors === want)
    assert(survivors.nonEmpty && survivors.size < corpus.count())
  }

  test("leakageSafeSplit: total, cluster-consistent, and stable under growth") {
    val asg = Dedup.leakageSafeSplit(docs, "source", threshold = 0.3)
      .select("doc_id", "cluster_id", "split")
      .as[(Long, Long, String)].collect()
    // every document gets exactly one split from the fixed set
    assert(asg.length === 7)
    assert(asg.map(_._3).toSet.subsetOf(Set("train", "val", "test")))
    // all members of a cluster share the split — the operator's contract
    asg.groupBy(_._2).foreach { case (c, members) =>
      assert(members.map(_._3).distinct.length === 1,
        s"cluster $c straddles splits: ${members.toSeq}")
    }
    // near-dup pairs never straddle splits (belt over the cluster check)
    val bySplit = asg.map(t => t._1 -> t._3).toMap
    Dedup.ngramJaccardPairs(docs, "source", threshold = 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect()
      .foreach { case (a, b) => assert(bySplit(a) === bySplit(b)) }
    // the split is a pure function of the cluster id: dropping an
    // unrelated doc must not move anyone else's assignment
    val shrunk = Dedup
      .leakageSafeSplit(docs.filter($"doc_id" =!= 7L), "source",
        threshold = 0.3)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    shrunk.foreach { case (id, s) => assert(bySplit(id) === s) }
  }

  test("leakageSafeSplit cut-points are exact integers on the md5 scale") {
    val (t8, v9) = Dedup.splitCuts(0.8, 0.1)
    assert(t8 === 3435973836L && v9 === 3865470566L)
    val (all, _) = Dedup.splitCuts(1.0, 0.0)
    assert(all === 4294967296L) // everything < 2^32 → all train
  }

  test("shingleNovelty scores boilerplate low and unique text high") {
    val docs = Seq(
      // two docs sharing their entire text: every shingle's df is 2
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      // fully unique doc: every shingle is corpus-unique
      (3L, "completely different words appear nowhere else at all"),
      // half boilerplate: opens with the shared phrase, ends unique
      (4L, "the quick brown fox jumps over something entirely new here")
    ).toDF("doc_id", "text")
    val r = Dedup.shingleNovelty(docs, shingleK = 3)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(3)))
      .toMap
    assert(r(1L)._2 === 0.0 && r(2L)._2 === 0.0)
    assert(r(3L)._2 === 1.0)
    assert(r(4L)._2 > 0.0 && r(4L)._2 < 1.0)
    // 8 tokens → 6 distinct trigram shingles
    assert(r(3L)._1 === 6L)
    // novelty = n_unique / n_shingles by definition
    val full = Dedup.shingleNovelty(docs, shingleK = 3)
      .select("n_shingles", "n_unique", "novelty")
      .as[(Long, Long, Double)].collect()
    full.foreach { case (n, u, s) =>
      assert(math.abs(s - u.toDouble / n) < 1e-6)
    }
  }

  test("stripRepeatedSpans merges overlapping windows into maximal spans") {
    // "a b c d e f" is shared verbatim by 3 docs → in each doc the two
    // overlapping 5-gram windows ([0,4] and [1,5]) must merge into ONE
    // 6-token span; the unique doc reports zero removal
    val boiler = "a b c d e f"
    val docs = Seq(
      (1L, s"$boiler x y z"),
      (2L, s"p q $boiler"),
      (3L, boiler),
      (4L, "entirely novel words only here")).toDF("doc_id", "text")
    val r = Dedup.stripRepeatedSpans(docs, shingleK = 5, minDf = 3)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r(1L) === ((9L, 1L, 6L)))
    assert(r(2L) === ((8L, 1L, 6L)))
    assert(r(3L) === ((6L, 1L, 6L)))
    assert(r(4L) === ((5L, 0L, 0L)))
  }

  test("spanDedupRewrite keeps first span occurrence and rewrites docs") {
    // span size 3: doc 1 = [abc][def]; doc 2 repeats [abc] twice (one
    // intra-doc drop, one cross-doc drop) + a novel tail; doc 3 is a
    // verbatim copy of doc 1 → fully dropped, rewritten to ""
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c a b c x y"),
      (3L, "a b c d e f")).toDF("doc_id", "text")
    val r = Dedup.spanDedupRewrite(docs, spanTokens = 3)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getString(3)))).toMap
    assert(r(1L) === ((2L, 0L, "a b c d e f")))
    // doc 2: spans [abc][abc][x y] — both "a b c" lose to doc 1 span 0
    assert(r(2L) === ((3L, 2L, "x y")))
    assert(r(3L) === ((2L, 2L, "")))
    // surviving spans cover every distinct span value exactly once
    val kept = Dedup.spanDedupRewrite(docs, spanTokens = 3)
      .agg(sum("n_spans"), sum("n_dropped")).collect()(0)
    assert(kept.getLong(0) - kept.getLong(1) === 3L) // abc, def, "x y"
  }

  test("spanDedupRewrite matches a sequential reference model on a seeded random corpus") {
    // model: group tokens into k-spans, keep the (doc, idx)-min occurrence
    // of each span value, rewrite from kept spans — O(n) driver Scala
    def model(docs: Seq[(Long, String)], k: Int): Map[Long, (Long, Long, String)] = {
      def spansOf(text: String) =
        text.trim.split("\\s+").toSeq.grouped(k).map(_.mkString(" ")).toSeq
      val keeper = docs
        .flatMap { case (id, tx) =>
          spansOf(tx).zipWithIndex.map { case (v, i) => (v, id, i) } }
        .groupBy(_._1)
        .map { case (v, occ) => v -> occ.map(o => (o._2, o._3)).min }
      docs.map { case (id, tx) =>
        val sp = spansOf(tx).zipWithIndex
        val kept = sp.collect { case (v, i) if keeper(v) == ((id, i)) => v }
        id -> ((sp.length.toLong, (sp.length - kept.length).toLong,
          kept.mkString(" ")))
      }.toMap
    }
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val corpus = (0L until 30L).map { id =>
      val n = 1 + rnd.nextInt(20)
      id -> Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val expect = model(corpus, 4)
    val got = Dedup.spanDedupRewrite(corpus.toDF("doc_id", "text"), spanTokens = 4)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got === expect)
    // every distinct span value survives exactly once corpus-wide
    val distinctSpans = corpus.flatMap { case (_, tx) =>
      tx.split(" ").toSeq.grouped(4).map(_.mkString(" ")) }.distinct.size
    assert(got.values.map(v => v._1 - v._2).sum === distinctSpans.toLong)
  }

  test("clearSharedState: a memo consumer recomputes to identical rows (isolate mode)") {
    // Bench's SPARK_GRAFT_ISOLATE clears cache + memo before each query;
    // the rebuilt shared shingle index must reproduce the same answer.
    def run() = SparkEntry.queries("doc_containment_pairs")(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    val first = run()
    SparkEntry.clearSharedState()
    spark.catalog.clearCache()
    val second = run()
    assert(first.nonEmpty && first === second)
  }

  test("containmentPairs catches a full quote that Jaccard hides") {
    // doc 2 is a verbatim prefix of doc 1: its 3 shingles all land in
    // doc 1's 6, so containment = 1.0 while Jaccard is only 3/6 = 0.5
    val docs = Seq(
      (1L, "a b c d e f g h", "s"),
      (2L, "a b c d e", "s"),
      (3L, "totally different words here now", "s"))
      .toDF("doc_id", "text", "source")
    val r = Dedup.containmentPairs(docs, "source", shingleK = 3,
        threshold = 0.8)
      .collect()
    assert(r.length === 1)
    assert(r(0).getLong(0) === 1L && r(0).getLong(1) === 2L)
    assert(r(0).getLong(2) === 3L)               // common shingles
    assert(math.abs(r(0).getDouble(3) - 1.0) < 1e-12)
    // the same pair fails a 0.8 Jaccard gate — the containment measure
    // is what surfaces quote-in-document duplication
    val j = Dedup.ngramJaccardPairs(docs, "source", shingleK = 3,
      threshold = 0.8)
    assert(j.count() === 0L)
  }

  test("embeddingNearDups auto-planes equals the explicitly-planed run at the derived count") {
    val emb = graft.engine.Tables.load(spark, sfDir, "embeddings")
    val np = graft.operators.Similarity.autoPlanes(emb.count(), 32)
    val auto = Dedup.embeddingNearDups(emb, threshold = 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val explicit = Dedup.embeddingNearDups(emb, nPlanes = np, threshold = 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(auto === explicit)
    assert(np === 4) // the sf0.01 declared-fixture identity the oracle pins
  }

}
