package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Text-analysis operator invariants (SURVEY.md §2.11). */
class TextAnalysisSpec extends SparkSuite {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column)(implicit e: org.apache.spark.sql.Encoder[T]): T =
    spark.range(1).select(c.as("v")).as[T].head()

  test("nbSourceClassify separates a 2-source corpus and matches hand NB math") {
    // sources use disjoint vocabularies -> the confusion matrix must be
    // exactly diagonal; a mixed doc with one 'a'-word and two 'b'-words
    // must land in b (theta dominates the flat prior)
    val docs = Seq(
      (1L, "x x y", "a"), (2L, "x y x", "a"), (3L, "y x y", "a"),
      (4L, "z z w", "b"), (5L, "w z z", "b"), (6L, "x z w", "b"))
      .toDF("doc_id", "text", "source")
    val m = TextAnalysis.nbSourceClassify(docs)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(m === Map(("a", "a") -> 3L, ("b", "b") -> 3L))
  }

  test("tokenCount counts whitespace tokens") {
    assert(one[Int](TextAnalysis.tokenCount(lit("a  b\tc  d"))) === 4)
  }

  test("bpeTokenCount splits letter runs, digit runs, punctuation") {
    // "ab12,cd" → [ab][12][,][cd]
    assert(one[Int](TextAnalysis.bpeTokenCount(lit("ab12,cd"))) === 4)
  }

  test("langId: english, french, spanish, german by stopwords; cjk wins; und fallback") {
    assert(one[String](TextAnalysis.langId(lit("the cat is in the house and it is warm"))) === "en")
    assert(one[String](TextAnalysis.langId(lit("le chat est dans la maison et il est pour"))) === "fr")
    assert(one[String](TextAnalysis.langId(lit("el gato es un animal y una mascota por"))) === "es")
    assert(one[String](TextAnalysis.langId(lit("der hund ist ein tier und eine freude"))) === "de")
    assert(one[String](TextAnalysis.langId(lit("数据处理 engine"))) === "zh")
    assert(one[String](TextAnalysis.langId(lit("zzz qqq xxx"))) === "und")
  }

  test("punctRatio: zero on clean text, counts symbols, empty-safe") {
    assert(one[Double](TextAnalysis.punctRatio(lit("abc 123"))) === 0.0)
    assert(one[Double](TextAnalysis.punctRatio(lit("a!b!"))) === 0.5)
    assert(one[Double](TextAnalysis.punctRatio(lit(""))) === 0.0)
  }

  test("stopwordRatio on a half-stopword sentence") {
    assert(one[Double](TextAnalysis.stopwordRatio(lit("the dog and cat"))) === 0.5)
  }

  test("meanTokenLen") {
    assert(one[Double](TextAnalysis.meanTokenLen(lit("ab cdef"))) === 3.0)
  }

  test("qualityScore in [0,1]; high for fluent text, low for noise") {
    val good = one[Double](TextAnalysis.qualityScore(
      lit("the quick brown fox jumps over the lazy dog and runs away")))
    val bad = one[Double](TextAnalysis.qualityScore(lit("!!! ### $$$ %%%")))
    assert(good === 1.0)
    assert(bad <= 0.5)
  }

  test("sortedTokenFingerprint is order-insensitive, case-insensitive") {
    val df = Seq(("b a c", "A c b"), ("x y", "x z")).toDF("t1", "t2")
    val r = df.select(
      (TextAnalysis.sortedTokenFingerprint($"t1") ===
        TextAnalysis.sortedTokenFingerprint($"t2")).as("eq")).as[Boolean].collect()
    assert(r.toSeq === Seq(true, false))
  }

  test("rollingHash is order-sensitive") {
    val r = spark.range(1).select(
      (TextAnalysis.rollingHash(lit("a b")) === TextAnalysis.rollingHash(lit("b a"))).as("eq"))
      .as[Boolean].head()
    assert(!r)
  }

  test("analyze annotates the documents fixture with all features, stays narrow") {
    val docs = graft.engine.Tables.load(spark, sfDir, "documents")
    val out = TextAnalysis.analyze(docs)
    assert(out.columns.toSet.contains("quality"))
    assert(out.count() === docs.count())
    // narrow plan: no shuffle (Exchange) in the analyze stage
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "analyze must not shuffle")
  }

  // -- BPE ------------------------------------------------------------------

  /** Fully local, independent BPE reference: same greedy semantics,
    * nothing shared with the operator but the tokenizer definition.
    */
  private def bpeRef(texts: Seq[String], rounds: Int): Seq[(Int, String, String, Long)] = {
    var corpus = texts.map(_.trim.toLowerCase.split("\\s+").toIndexedSeq)
    (1 to rounds).map { r =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      corpus.foreach(ts => ts.sliding(2).foreach {
        case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + 1
        case _ =>
      })
      val ((a, b), n) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
      val joined = a + "_" + b
      corpus = corpus.map { ts =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < ts.length) {
          if (i + 1 < ts.length && ts(i) == a && ts(i + 1) == b) { out += joined; i += 2 }
          else { out += ts(i); i += 1 }
        }
        out.toIndexedSeq
      }
      (r, a, b, n)
    }
  }

  test("bpeTrain matches the independent local reference over 3 rounds") {
    val docs = engine.Tables.load(spark, sfDir, "documents")
    val got = TextAnalysis.bpeTrain(docs, rounds = 3)
      .map(m => (m.round, m.first, m.second, m.count))
    val texts = docs.select("text").collect().map(_.getString(0)).toSeq
    assert(got === bpeRef(texts, 3))
  }

  test("bpeEncode applies merges in training order; counts hand-check") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b c"), // two (a,b) merges, then one (a_b,a_b)? no — see below
      (2L, "a b"),
      (3L, "c c c")
    ).toDF("doc_id", "text")
    // training over this corpus: round1 argmax (a,b) n=3 → a_b;
    // round2 counts pairs of rewritten corpus: (a_b,a_b):1, (a_b,c):1,
    // (c,c):2 → (c,c) wins → c_c
    val merges = TextAnalysis.bpeTrain(docs, rounds = 2)
    assert(merges.map(_.merged) === Seq("a_b", "c_c"))
    val enc = TextAnalysis.bpeEncode(docs, merges)
      .select("doc_id", "n_raw", "n_encoded")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // doc1: [a b a b c] → [a_b a_b c] (5→3); doc2: [a b] → [a_b] (2→1);
    // doc3: [c c c] → [c_c c] (3→2)
    assert(enc.toSeq === Seq((1L, 5L, 3L), (2L, 2L, 1L), (3L, 3L, 2L)))
    // encoding is idempotent on already-encoded symbols: re-applying the
    // same merges to nothing-left-to-merge text changes nothing
    val again = TextAnalysis.bpeEncode(docs, merges ++ merges)
      .select("doc_id", "n_encoded").as[(Long, Long)].collect().sortBy(_._1)
    assert(again.map(_._2).toSeq === enc.map(_._3).toSeq)
  }

  test("mergePair is greedy left-to-right and never re-merges its output") {
    val r = TextAnalysis.mergePair(Vector("a", "a", "a"), "a", "a", "a_a")
    assert(r === Vector("a_a", "a"))
    val r2 = TextAnalysis.mergePair(Vector("x", "a", "b", "a", "b"), "a", "b", "a_b")
    assert(r2 === Vector("x", "a_b", "a_b"))
    assert(TextAnalysis.mergePair(Vector("a"), "a", "a", "a_a") === Vector("a"))
  }

  test("oovReport: hand-checked OOV counts on a 2-term vocabulary") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "the the cat"),
      (2L, "en", "the dog"),
      (3L, "fr", "zut alors zut")
    ).toDF("doc_id", "lang", "text")
    // corpus tf: the=3, zut=2, cat=dog=alors=1 → vocab(2) = {the, zut};
    // OOV per doc: cat (1), dog (1), alors (1)
    val out = TextAnalysis.oovReport(docs, vocabSize = 2)
      .select("lang", "n_docs", "n_tokens", "n_oov")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq === Seq(("en", 2L, 5L, 2L), ("fr", 1L, 3L, 1L)))
  }

  test("oovReport fixture: rates bounded and monotone in vocabulary size") {
    val docs = engine.Tables.load(spark, sfDir, "documents")
    def rates(v: Int): Map[String, Double] =
      TextAnalysis.oovReport(docs, vocabSize = v)
        .select("lang", "oov_rate").collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val r200 = rates(200)
    val r1000 = rates(1000)
    assert(r200.keySet === Set("de", "en", "es", "fr", "zh"))
    r200.foreach { case (_, v) => assert(v >= 0.0 && v <= 1.0) }
    // a strictly larger vocabulary can only shrink the OOV token count
    r1000.foreach { case (lang, v) => assert(v <= r200(lang) + 1e-9) }
  }

  test("unigramTransferMatrix matches hand-computed smoothed entropies") {
    // A: "x x y" (tot 3), B: "z z" (tot 2), V = 3
    // p_A = {x:3/6, y:2/6, z:1/6}; p_B = {x:1/5, y:1/5, z:3/5}
    val docs = Seq((1L, "x x y", "A"), (2L, "z z", "B"))
      .toDF("doc_id", "text", "source")
    val m = TextAnalysis.unigramTransferMatrix(docs)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    def ce(terms: (Long, Double)*)(tot: Long): Double =
      -terms.map { case (c, p) => c * math.log(p) }.sum / tot
    assert(math.abs(m(("A", "A"))._1 - ce(2L -> 0.5, 1L -> 2.0 / 6)(3)) < 1e-6)
    assert(math.abs(m(("A", "B"))._1 - ce(2L -> 0.2, 1L -> 0.2)(3)) < 1e-6)
    assert(math.abs(m(("B", "B"))._1 - ce(2L -> 0.6)(2)) < 1e-6)
    assert(math.abs(m(("B", "A"))._1 - ce(2L -> 1.0 / 6)(2)) < 1e-6)
    // each domain explains itself best, and ppl = e^H
    assert(m(("A", "A"))._1 < m(("A", "B"))._1)
    assert(m(("B", "B"))._1 < m(("B", "A"))._1)
    m.values.foreach { case (h, p) =>
      assert(math.abs(p - math.exp(h)) < 1e-4) }
  }

  test("rakeKeyphrases matches the hand-computed degree/frequency scores") {
    val docs = Seq(
      (1L, "deep learning of deep nets"),
      (2L, "deep learning"),
      (3L, "nets")).toDF("doc_id", "text")
    // freq/deg: deep 3/6 → 2, learning 2/4 → 2, nets 2/3 → 1.5
    val r = TextAnalysis.rakeKeyphrases(docs, stop = Seq("of"))
      .collect().map(x =>
        x.getString(0) -> (x.getInt(1), x.getLong(2), x.getDouble(3)))
    assert(r.map(_._1).toSeq ===
      Seq("deep learning", "deep nets", "nets")) // score-desc order
    val m = r.toMap
    assert(m("deep learning") === ((2, 2L, 4.0)))
    assert(m("deep nets") === ((2, 1L, 3.5)))
    assert(m("nets") === ((1, 1L, 1.5)))
  }

  test("rakeKeyphrases: stopwords never appear inside a phrase; topN caps") {
    val docs = Seq((1L, "a b the c d the a b")).toDF("doc_id", "text")
    val all = TextAnalysis.rakeKeyphrases(docs, stop = Seq("the"))
      .collect().map(_.getString(0))
    assert(all.toSet === Set("a b", "c d"))
    assert(!all.exists(_.contains("the")))
    val one = TextAnalysis.rakeKeyphrases(docs, stop = Seq("the"), topN = 1)
    assert(one.count() === 1L)
  }

  test("bleu2Pairs matches hand-computed clipped precisions") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on a mat"),
      (3L, "the cat sat on the mat"),
      (4L, "completely different words entirely")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("id_a", "id_b")
    val r = TextAnalysis.bleu2Pairs(docs, pairs).collect()
      .map(x => (x.getLong(0), x.getLong(1)) ->
        (x.getInt(2), x.getInt(3), x.getDouble(4), x.getDouble(5),
          x.getDouble(6))).toMap
    // (1,2): clipped unigrams 5/6 ("the" clips 2→1), bigrams 3/5,
    // equal lengths → BP 1, BLEU = √(5/6 · 3/5) = √½
    val (na, nb, p1, p2, b) = r((1L, 2L))
    assert((na, nb) === ((6, 6)))
    assert(math.abs(p1 - 5.0 / 6) < 1e-6 && math.abs(p2 - 0.6) < 1e-6)
    assert(math.abs(b - math.sqrt(0.5)) < 1e-6)
    // identical pair: everything 1
    assert(r((1L, 3L)) === ((6, 6, 1.0, 1.0, 1.0)))
    // disjoint pair: zero precisions, BLEU exactly 0 (no ln(0) leak)
    val (_, _, q1, q2, z) = r((1L, 4L))
    assert(q1 === 0.0 && q2 === 0.0 && z === 0.0)
  }

  test("bleu2Pairs brevity penalty punishes a short candidate only") {
    val docs = Seq(
      (1L, "a b c d e f g h"), // 8 tokens
      (2L, "a b c d")).toDF("doc_id", "text") // 4-token prefix
    // short candidate vs long reference: p1 = 1, p2 = 1, BP = e^(1-2)
    val shortCand = TextAnalysis.bleu2Pairs(docs,
      Seq((2L, 1L)).toDF("id_a", "id_b")).head()
    assert(math.abs(shortCand.getDouble(6) - math.exp(-1.0)) < 1e-6)
    // long candidate vs short reference: precisions 4/8 and 3/7, BP
    // clamps to 1 (candidate longer than reference)
    val longCand = TextAnalysis.bleu2Pairs(docs,
      Seq((1L, 2L)).toDF("id_a", "id_b")).head()
    assert(math.abs(longCand.getDouble(6)
      - math.sqrt(0.5 * 3.0 / 7)) < 1e-6)
  }
}
