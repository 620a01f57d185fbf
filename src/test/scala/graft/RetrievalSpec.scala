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

  test("searchEval: P/MRR/NDCG@k against phrase gold on a hand-checked corpus") {
    // query terms {a, b}: docs 1-3 contain both (identical tf and dl →
    // identical score, doc-id tie-break), doc 4 only 'a', doc 5 nothing.
    // Gold (phrase "a b") = doc 1 only → rank 1 hit: MRR=1, NDCG=1.
    val docs = Seq(
      (1L, "a b x y"), (2L, "b a x y"), (3L, "a x b y"),
      (4L, "a q q q"), (5L, "z z z z")).toDF("doc_id", "text")
    val r = Retrieval.searchEval(docs, Seq(7 -> Seq("a", "b")), k = 3)
      .collect()
    assert(r.length === 1)
    val row = r(0)
    assert(row.getInt(0) === 7)
    assert(row.getLong(1) === 4L)                    // matched: docs 1-4
    assert(row.getLong(2) === 1L)                    // gold: doc 1
    assert(math.abs(row.getDouble(3) - 1.0 / 3) < 1e-6)  // p@3
    assert(row.getDouble(4) === 1.0)                 // mrr@3
    assert(row.getDouble(5) === 1.0)                 // ndcg@3
    // phrase " y a " appears nowhere though both terms match docs 1-3:
    // gold empty → NDCG is NULL (not NaN), MRR degrades to 0
    val none = Retrieval.searchEval(docs, Seq(1 -> Seq("y", "a")), k = 3)
      .collect()(0)
    assert(none.getLong(2) === 0L && none.isNullAt(5))
    assert(none.getDouble(4) === 0.0)
  }

  test("searchEval matches a sequential reference model on a seeded random corpus") {
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rnd = new scala.util.Random(13)
    val vocab = Vector("a", "b", "c", "d", "e")
    val corpus = (0L until 40L).map { id =>
      id -> Seq.fill(3 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val queries = Seq(1 -> Seq("a", "b"), 2 -> Seq("c", "d"))
    val k = 5
    // driver-side BM25 + phrase-gold metrics, straight from the formulas
    val toks = corpus.map { case (id, tx) => id -> tx.split(" ").toSeq }.toMap
    val n = corpus.size
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    def expect(qid: Int, terms: Seq[String]) = {
      val df = terms.map(t => t -> toks.count(_._2.contains(t))).toMap
      val scored = corpus.flatMap { case (id, _) =>
        val tl = toks(id)
        val s = terms.filter(tl.contains).map { t =>
          val tf = tl.count(_ == t).toDouble
          math.log((n - df(t) + 0.5) / (df(t) + 0.5) + 1.0) * tf * 2.2 /
            (tf + 1.2 * (0.25 + 0.75 * tl.size / avgdl))
        }.sum
        if (terms.exists(tl.contains)) Some(id -> r4(s)) else None
      }
      val ranked = scored.sortBy { case (id, s) => (-s, id) }.map(_._1)
      val gold = corpus.collect {
        case (id, tx) if (" " + tx + " ").contains(terms.mkString(" ", " ", " ")) => id
      }.toSet
      val hits = ranked.take(k).zipWithIndex.collect {
        case (id, i) if gold(id) => i + 1
      }
      val dcg = hits.map(r => 1.0 / (math.log(r + 1.0) / math.log(2))).sum
      val idcg = (1 to math.min(k, gold.size))
        .map(r => 1.0 / (math.log(r + 1.0) / math.log(2))).sum
      (qid, scored.size.toLong, gold.size.toLong, r6(hits.size / k.toDouble),
        r6(hits.headOption.map(1.0 / _).getOrElse(0.0)),
        if (gold.nonEmpty) Some(r6(dcg / idcg)) else None)
    }
    val got = Retrieval.searchEval(corpus.toDF("doc_id", "text"), queries, k = k)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)))).sortBy(_._1).toSeq
    val want = queries.map { case (q, ts) => expect(q, ts) }
    got.zip(want).foreach { case (g, w) =>
      assert(g._1 === w._1 && g._2 === w._2 && g._3 === w._3)
      assert(math.abs(g._4 - w._4) < 1e-6 && math.abs(g._5 - w._5) < 1e-6)
      (g._6, w._6) match {
        case (Some(x), Some(y)) => assert(math.abs(x - y) < 1e-6)
        case (a, b) => assert(a === b)
      }
    }
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

  test("packSequences: exact next-fit on a hand-checked stream") {
    val docs = Seq(
      ("g", 1L, "a b c"), ("g", 2L, "d e"), ("g", 3L, "f g h i"),
      ("g", 4L, "j"), ("h", 10L, "one two three four five six seven")
    ).toDF("lang", "doc_id", "text")
    val out = Retrieval.packSequences(docs, budget = 5)
      .select("lang", "doc_id", "seq_id", "seq_fill")
      .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    // g tokens 3,2,4,1 budget 5 → (seq0 fill3), (seq0 fill5 — exact fit
    // admitted), (seq1 fill4 — 5+4 overflows), (seq1 fill5)
    assert(out.filter(_._1 == "g").map(r => (r._3, r._4)).toSeq ===
      Seq((0L, 3L), (0L, 5L), (1L, 4L), (1L, 5L)))
    // an oversize doc rides alone in its own sequence, kept whole
    assert(out.filter(_._1 == "h").map(r => (r._3, r._4)).toSeq ===
      Seq((0L, 7L)))
  }

  test("packSequences fixture invariants: exact budget cap + next-fit tightness") {
    val docs = engine.Tables.load(spark, sfDir, "documents")
    val budget = 256L
    val rows = Retrieval.packSequences(docs, budget)
      .select("lang", "doc_id", "n_tok", "seq_id", "seq_fill")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.length === docs.count()) // total assignment, no dup/drop
    val bySeq = rows.groupBy(r => (r._1, r._4))
    bySeq.values.foreach { seq =>
      val tot = seq.map(_._3).sum
      // a sequence only exceeds the budget when it IS one oversize doc
      assert(tot <= budget || seq.length == 1)
      // seq_fill of the last doc (max id) is the sequence total
      assert(seq.maxBy(_._2)._5 === tot)
    }
    // next-fit tightness: the first doc of sequence k (k>0) did NOT fit
    // the final fill of sequence k-1
    bySeq.toSeq.sortBy(_._1).foreach { case ((lang, sid), seq) =>
      if (sid > 0) {
        val prevFill = bySeq((lang, sid - 1)).maxBy(_._2)._5
        assert(prevFill + seq.minBy(_._2)._3 > budget)
      }
    }
  }

  test("packSequences subShards>1: every doc still assigned exactly once") {
    val docs = engine.Tables.load(spark, sfDir, "documents")
    val out = Retrieval.packSequences(docs, budget = 256, subShards = 4)
      .select("doc_id", "n_tok", "seq_id")
      .as[(Long, Long, Long)].collect()
    assert(out.length === docs.count())
    assert(out.map(_._1).distinct.length === out.length)
  }

  test("lengthBucketBatches: buckets by token band, batches of batchSize in id order") {
    val docs = Seq(
      (1L, Seq.fill(3)("t").mkString(" ")),   // 3 tok  → bucket 0
      (2L, Seq.fill(40)("t").mkString(" ")),  // 40 tok → bucket 1
      (3L, Seq.fill(35)("t").mkString(" ")),  // 35 tok → bucket 1
      (4L, Seq.fill(33)("t").mkString(" "))   // 33 tok → bucket 1
    ).toDF("doc_id", "text")
    val out = Retrieval.lengthBucketBatches(docs, bucketWidth = 32, batchSize = 2)
      .select("doc_id", "n_tok", "bucket", "batch_id")
      .as[(Long, Long, Int, Long)].collect().sortBy(_._1)
    assert(out.map(r => (r._1, r._3, r._4)).toSeq ===
      Seq((1L, 0, 0L), (2L, 1, 0L), (3L, 1, 0L), (4L, 1, 1L)))
  }

  test("lengthBucketBatches fixture invariants: batch size cap, bucket homogeneity") {
    val docs = engine.Tables.load(spark, sfDir, "documents")
    val rows = Retrieval.lengthBucketBatches(docs)
      .select("doc_id", "n_tok", "bucket", "batch_id")
      .as[(Long, Long, Int, Long)].collect()
    assert(rows.length === docs.count())
    rows.foreach { case (_, n, b, _) => assert(b === (n / 32).toInt) }
    rows.groupBy(r => (r._3, r._4)).foreach { case ((_, bid), batch) =>
      assert(batch.length <= 8)
      // only the highest-numbered batch of a bucket may run short
      if (batch.length < 8)
        assert(bid === rows.filter(_._3 == batch.head._3).map(_._4).max)
    }
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

  test("phraseSearch matches token positions, counts overlaps, beats substring") {
    val docs = Seq(
      (1L, "the hash agg runs the hash agg twice"), // 2 occurrences
      (2L, "hash then agg"),                        // terms present, not adjacent
      (3L, "rehash aggregate"),                     // substring would match this
      (4L, "HASH AGG upper case"),                  // case-folded match
      (5L, "hash hash agg")                         // overlap: one occurrence
    ).toDF("doc_id", "text")
    val got = Retrieval.phraseSearch(docs, Seq("hash", "agg"))
      .as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L), (4L, 1L), (5L, 1L)))
    // three-term phrase anchors through the same fold
    val tri = Retrieval.phraseSearch(docs, Seq("the", "hash", "agg"))
      .as[(Long, Long)].collect().toSeq
    assert(tri === Seq((1L, 2L)))
    // a phrase absent from every doc returns empty, not an error
    assert(Retrieval.phraseSearch(docs, Seq("no", "such")).count() === 0)
  }
}
