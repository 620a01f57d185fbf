package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over a `text`
  * column: tokenization, token counting (whitespace + BPE-ish regex),
  * language ID (stopword n-gram heuristic), quality scoring, and document
  * fingerprinting. Everything is built from codegen'd built-ins — per-row
  * narrow transforms, no shuffle, so each scales embarrassingly with
  * input splits at 100 TB.
  */
object TextAnalysis {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: runs of letters, runs of digits, or single
    * punctuation — the classic pre-tokenizer regex shape.
    */
  val bpeIshPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeIshPattern), lit(0)))

  // -- language ID ---------------------------------------------------------

  /** Tiny per-language stopword dictionaries (public common-word lists).
    * Deterministic heuristic: most stopword hits wins; CJK characters win
    * outright; ties broken by fixed language order.
    */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"),
    "es" -> Seq("el", "la", "los", "de", "y", "un", "una", "es", "que", "por"),
    "de" -> Seq("der", "die", "das", "und", "ein", "eine", "ist", "zu", "den", "für"))

  /** Count of tokens that appear in `words` — native constant-set probe
    * ([[graft.functions.StopwordHits]]), one codegen'd pass per language
    * instead of an interpreted filter lambda per token per language.
    */
  def hitCount(text: Column, words: Seq[String]): Column =
    call_function("graft_stopword_hits", tokens(lower(text)), typedLit(words))

  /** [[hitCount]] via built-in higher-order functions (portable fallback
    * and differential-test partner).
    */
  def hitCountHof(text: Column, words: Seq[String]): Column =
    size(filter(tokens(lower(text)), t => array_contains(typedLit(words), t)))

  /** Language-ID column: 'zh' on any CJK char, else argmax stopword hits
    * (≥1), else 'und'. The argmax is one native pass over the tokens
    * ([[graft.functions.BestLangByHits]]); [[langIdHof]] is the portable
    * twin.
    */
  def langId(text: Column): Column = {
    val cjk = text.rlike("[\\u4e00-\\u9fff]")
    when(cjk, lit("zh")).otherwise(call_function("graft_lang_best",
      tokens(lower(text)),
      typedLit(stopwords.map(_._1)),
      typedLit(stopwords.map(_._2))))
  }

  /** [[langId]] from built-in expressions (differential-test partner).
    *
    * Shape matters: the argmax is `greatest` over (score, priority, lang)
    * structs — struct comparison is lexicographic, so ties on score fall
    * to priority, which ranks earlier languages higher, and the 'und'
    * fallback is a sentinel candidate that only wins when every real
    * score is 0. A when/otherwise fold computes the same thing but
    * duplicates the accumulator subtree at every reference — expression
    * trees are DAG-free — which re-evaluated each language's hit count
    * up to 16× per row (measured 15× slower at sf0.1).
    */
  def langIdHof(text: Column): Column = {
    val cjk = text.rlike("[\\u4e00-\\u9fff]")
    val cands = stopwords.zipWithIndex.map { case ((l, ws), i) =>
      struct(hitCountHof(text, ws).as("score"), lit(-i).as("prio"), lit(l).as("lang"))
    } :+ struct(lit(0).as("score"), lit(1).as("prio"), lit("und").as("lang"))
    when(cjk, lit("zh")).otherwise(greatest(cands: _*).getField("lang"))
  }

  // -- quality scoring -----------------------------------------------------

  /** Ratio of non-alphanumeric, non-space characters. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      length(regexp_replace(text, "[a-zA-Z0-9\\s]", "")).cast("double") /
        length(text).cast("double"))

  /** Ratio of tokens that are English stopwords (fluency proxy). */
  def stopwordRatio(text: Column): Column = {
    val n = tokenCount(text)
    when(n === 0, 0.0)
      .otherwise(hitCount(text, stopwords.head._2).cast("double") / n.cast("double"))
  }

  /** Mean whitespace-token length. Σ len(tokenᵢ) is computed as the length
    * of the text with all whitespace removed — identical by construction
    * (the tokens are exactly the non-whitespace runs) and a single
    * codegen'd regex instead of an interpreted per-token fold.
    */
  def meanTokenLen(text: Column): Column = {
    val ts = tokens(text)
    when(size(ts) === 0, 0.0).otherwise(
      length(regexp_replace(trim(text), "\\s+", "")).cast("double") /
        size(ts).cast("double"))
  }

  /** Composite quality score in [0,1]: rewards sane length, some stopwords,
    * low punctuation noise. Heuristic in the spirit of C4/Gopher quality
    * filters; deterministic and oracle-expressible.
    */
  def qualityScore(text: Column): Column =
    qualityFrom(tokenCount(text), punctRatio(text), stopwordRatio(text),
      meanTokenLen(text))

  /** [[qualityScore]] over already-computed feature columns. Expression
    * trees are DAG-free, so scoring from the raw text re-evaluates every
    * component (each a regex pass over the document); pipelines that
    * materialize the features anyway should derive the score from them.
    */
  def qualityFrom(nTokens: Column, punct: Column, stopword: Column,
      meanTok: Column): Column = {
    val lenOk = when(nTokens.between(5, 10000), 1.0).otherwise(0.0)
    val punctOk = when(punct < 0.2, 1.0).otherwise(0.0)
    val swOk = when(stopword > 0.01, 1.0).otherwise(0.0)
    val tokOk = when(meanTok.between(2.0, 12.0), 1.0).otherwise(0.0)
    round((lenOk + punctOk + swOk + tokOk) / 4.0, 2)
  }

  // -- fingerprinting ------------------------------------------------------

  /** Order-insensitive document fingerprint: md5 of the sorted token bag.
    * md5 is identical in Spark and DuckDB, so this is oracle-checkable;
    * use [[rollingHash]] for the cheap 64-bit variant in joins.
    */
  def sortedTokenFingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(tokens(lower(text)))))

  /** Winnowing fingerprints (Schleimer et al. 2003): localized document
    * fingerprints with the guarantee that any shared token run of length
    * >= k + w - 1 produces at least one shared fingerprint — partial-
    * overlap evidence, where [[rollingHash]] only witnesses whole-document
    * identity. One codegen'd pass per row
    * ([[graft.functions.WinnowSig]]).
    */
  def winnowFingerprints(text: Column, k: Int = 4, w: Int = 4): Column = {
    import org.apache.spark.sql.functions.{array_remove, call_function, lit}
    // split("") yields [""] — strip empties so an empty document
    // fingerprints to an empty array, not to hash("")
    call_function("graft_winnow", array_remove(tokens(text), ""), lit(k), lit(w))
  }

  /** Chained rolling hash over tokens (order-sensitive, 64-bit): the
    * accumulator is re-hashed with each token, which keeps full avalanche
    * without multiplication (ANSI-overflow-safe).
    */
  def rollingHash(text: Column): Column =
    aggregate(tokens(text), lit(1469598103934665603L),
      (acc, t) => xxhash64(concat_ws("", acc, t)))

  // -- BPE merge training ---------------------------------------------------

  /** One merge decision of byte-pair-encoding training (Sennrich et al.
    * 2016), word-level: the most frequent adjacent symbol pair in the
    * corpus, ties broken lexicographically.
    */
  final case class BpeMerge(round: Int, first: String, second: String,
      merged: String, count: Long)

  /** Greedy left-to-right merge of one pair inside a symbol sequence —
    * the sequential inner step BPE needs per row. Plain Scala on purpose:
    * the merge is order-dependent along the sequence, which relational
    * operators can't express; everything AROUND it (pair counting,
    * argmax) stays relational.
    */
  def mergePair(syms: IndexedSeq[String], a: String, b: String,
      joined: String): IndexedSeq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += joined; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toIndexedSeq
  }

  /** BPE training rounds over the corpus token streams: each round counts
    * adjacent symbol pairs (relational: explode → hash agg, the exact
    * `doc_bigram_freq` shape), picks the argmax (one tiny driver-side
    * take, the same scalar-inline pattern Catalyst uses for scalar
    * subqueries), and rewrites every document with the merge applied (a
    * typed map — the only sequential per-row step). Each round is one
    * shuffle; the corpus stays distributed throughout.
    */
  def bpeTrain(docs: DataFrame, rounds: Int = 3,
      textCol: String = "text"): Seq[BpeMerge] = {
    val spark = docs.sparkSession
    import spark.implicits._
    var corpus = docs.select(tokens(lower(col(textCol))).as("ts"))
      .as[Seq[String]].map(_.toIndexedSeq).cache()
    val merges = scala.collection.mutable.ListBuffer.empty[BpeMerge]
    (1 to rounds).foreach { r =>
      val top = corpus.toDF("ts")
        .filter(size(col("ts")) >= 2)
        .select(explode(transform(sequence(lit(1), size(col("ts")) - 1),
          i => struct(element_at(col("ts"), i).as("a"),
            element_at(col("ts"), i + 1).as("b")))).as("p"))
        .groupBy("p.a", "p.b").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .take(1).head
      val (a, b, n) = (top.getString(0), top.getString(1), top.getLong(2))
      val joined = a + "_" + b
      merges += BpeMerge(r, a, b, joined, n)
      val prev = corpus
      corpus = corpus.map(ts => mergePair(ts, a, b, joined)).cache()
      corpus.count() // materialize before unpersisting the parent
      prev.unpersist()
    }
    corpus.unpersist()
    merges.toList
  }

  /** Apply trained BPE merges to every document — the tokenizer's
    * APPLICATION side, completing [[bpeTrain]]'s training side: each doc's
    * token stream is rewritten through the merge list in training order
    * and reported as raw vs encoded token counts plus the compression
    * the merges bought.
    *
    * Scale: the merge table rides in the task closure (it's vocab-sized,
    * the classic broadcast-side of a tokenizer) and the rewrite is one
    * typed map — no shuffle, no state; encoding 100 TB is embarrassingly
    * parallel.
    */
  def bpeEncode(docs: DataFrame, merges: Seq[BpeMerge],
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ms = merges.sortBy(_.round).map(m => (m.first, m.second, m.merged))
    docs.select(col(idCol).cast("long"), tokens(lower(col(textCol))).as("ts"))
      .as[(Long, Seq[String])]
      .map { case (id, ts0) =>
        var ts = ts0.toIndexedSeq
        ms.foreach { case (a, b, j) => ts = mergePair(ts, a, b, j) }
        (id, ts0.length.toLong, ts.length.toLong)
      }
      .toDF(idCol, "n_raw", "n_encoded")
      .withColumn("compression",
        round(col("n_encoded").cast("double") / col("n_raw"), 6))
  }

  /** Tokenizer-coverage / out-of-vocabulary report: build the top
    * `vocabSize` corpus vocabulary (term frequency, term-lexicographic
    * tie-break — a deterministic total order), then measure what fraction
    * of each language's token stream falls outside it. The number that
    * decides whether a tokenizer's vocab budget fits a corpus before any
    * training run burns on it.
    *
    * Scale design: two passes over the exploded token stream — one
    * term-keyed aggregation to rank the vocabulary (top-V via
    * TakeOrderedAndProject, never a global sort), one broadcast left
    * join of the V-row vocab back onto the stream with a per-(doc, lang)
    * aggregation. The token explode is the dominant cost and both passes
    * are partial-aggregated before their shuffles; nothing pairwise,
    * nothing driver-side.
    *
    * Output: (langCol, n_docs, n_tokens, n_oov, oov_rate) per language.
    */
  def oovReport(
      docs: DataFrame,
      vocabSize: Int = 200,
      textCol: String = "text",
      idCol: String = "doc_id",
      langCol: String = "lang"): DataFrame = {
    require(vocabSize > 0, "vocabSize must be > 0")
    val toks = docs.select(col(idCol), col(langCol),
      explode(tokens(lower(col(textCol)))).as("term"))
    val vocab = toks.groupBy("term").agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("term")).limit(vocabSize)
      .select(col("term"), lit(1).as("in_v"))
    toks
      .join(broadcast(vocab), Seq("term"), "left_outer")
      .groupBy(col(idCol), col(langCol))
      .agg(count(lit(1)).as("n_tok"),
        sum(when(col("in_v").isNull, 1L).otherwise(0L)).as("n_oov"))
      .groupBy(col(langCol))
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tok").as("n_tokens"),
        sum("n_oov").as("n_oov"),
        round(sum("n_oov") / sum("n_tok"), 4).as("oov_rate"))
      .orderBy(col(langCol))
  }

  /** MLlib INFERENCE with a provable twin: train a multinomial Naive
    * Bayes source classifier (`ml.classification.NaiveBayes`, smoothing
    * λ=1) on bag-of-words counts and return the resubstitution confusion
    * matrix `(actual, predicted, n)`. NB training is deterministic
    * closed-form counting — no seed, no iteration — so the ENTIRE
    * train+predict path replays exactly in SQL: the oracle recomputes
    * MLlib's smoothed log-priors ln((n_c+λ)/(N+Cλ)), smoothed theta
    * ln((n_cw+λ)/(T_c+Vλ)), and the per-doc argmax (first-max tie-break
    * = ascending label order, MLlib's `Vector.argmax` contract).
    *
    * Scale shape: feature vectors assemble from codegen'd HOFs over a
    * FIXED lexicographic vocabulary (driver-collected — bounded by
    * design here; a 100 TB corpus swaps in a capped/hashed vocabulary),
    * bridge to MLlib via `array_to_vector` (no UDF), and fit aggregates
    * one pass. Inference is one map-side matrix-vector per row.
    */
  def nbSourceClassify(docs: DataFrame, textCol: String = "text",
      labelCol: String = "source"): DataFrame = {
    import org.apache.spark.ml.classification.NaiveBayes
    import org.apache.spark.ml.functions.array_to_vector
    graft.plans.GraftFunctions.register(docs.sparkSession)
    val ts = tokens(lower(col(textCol)))
    val vocab = docs.select(explode(ts).as("w")).distinct()
      .orderBy("w").collect().map(_.getString(0))
    val labels = docs.select(col(labelCol)).distinct()
      .orderBy(labelCol).collect().map(_.getString(0))
    val idxUdf = typedLit(labels)
    // r13 (guide §1.2 step 2): one hashed token pass per document
    // (graft_vocab_counts) replaces the interpreted V-scans-per-document
    // HOF chain `transform(vocab, w -> size(filter(ts, t = w)))` —
    // identical exact-integer counts, differential-pinned in
    // TextExpressionsSpec; O(T + V) per row instead of O(V·T).
    val tf = call_function("graft_vocab_counts", ts, typedLit(vocab.toSeq))
    // fit AND transform read the feature frame: materialize the vector
    // build once instead of running the V×tokens HOF assembly twice
    val feat = docs.select(col(labelCol).as("actual"),
        array_to_vector(tf).as("features"))
      .withColumn("label",
        array_position(idxUdf, col("actual")).cast("double") - 1)
      .localCheckpoint(eager = false)
    val model = new NaiveBayes().setSmoothing(1.0)
      .setModelType("multinomial").fit(feat)
    model.transform(feat)
      .select(col("actual"),
        element_at(idxUdf, col("prediction").cast("int") + 1).as("predicted"))
      .groupBy("actual", "predicted").agg(count(lit(1)).as("n"))
      .orderBy("actual", "predicted")
  }

  /** Domain-transfer cross-entropy matrix: train one add-1-smoothed
    * unigram LM per source over the corpus vocabulary, score every
    * source's token stream under every LM — H(A|B) =
    * −Σ_w cntₐ(w)·ln p_B(w) / totₐ. The diagonal is each domain's own
    * entropy; off-diagonal rows tell a mixture planner which domains
    * substitute for which (the transfer signal behind DSIR-style
    * source weighting). Output: (src_a, src_b, cross_entropy, ppl).
    *
    * Scale shape: one token count per (source, word) — a single hash
    * aggregation; the matrix expands counts by the SOURCE DIMENSION
    * only (an explode over the collected source list — bounded
    * metadata, like a centroid table), then one (word, source)-keyed
    * left join fills in smoothed zeros and one (A, B) aggregation
    * reduces. Never a doc×doc or token×token product. Counts are
    * exact integers; the ln-sum is the one float aggregation, rounded.
    */
  def unigramTransferMatrix(docs: DataFrame,
      srcCol: String = "source", textCol: String = "text",
      roundTo: Int = 6): DataFrame = {
    val tok = docs.select(col(srcCol).as("_src"),
      explode(tokens(lower(col(textCol)))).as("_w"))
    val cnt = tok.groupBy("_src", "_w").agg(count(lit(1)).as("_c"))
      .localCheckpoint(eager = false) // expand side + LM side, one count
    val tot = cnt.groupBy("_src").agg(sum("_c").as("_tc"))
    val vocab = tok.select("_w").distinct().count()
    val sources = docs.select(col(srcCol)).distinct()
      .orderBy(srcCol).collect().map(_.getString(0)).toSeq
    val scored = cnt
      .select(col("_src").as("src_a"), col("_w"), col("_c").as("_ca"),
        explode(typedLit(sources)).as("src_b"))
      .join(cnt.select(col("_src").as("src_b"), col("_w"),
        col("_c").as("_cb")), Seq("src_b", "_w"), "left_outer")
      .join(tot.select(col("_src").as("src_b"), col("_tc").as("_tcb")),
        Seq("src_b"))
      .groupBy("src_a", "src_b")
      .agg(sum(col("_ca") * log(
        (coalesce(col("_cb"), lit(0L)) + lit(1.0))
          / (col("_tcb") + lit(vocab)))).as("_s"))
    scored
      .join(tot.select(col("_src").as("src_a"), col("_tc").as("_ta")),
        Seq("src_a"))
      .select(col("src_a"), col("src_b"),
        round(-col("_s") / col("_ta"), roundTo).as("cross_entropy"),
        round(exp(-col("_s") / col("_ta")), roundTo).as("ppl"))
  }

  /** RAKE keyphrase extraction (Rose et al. 2010): candidate phrases
    * are maximal stopword-free token runs; each word scores
    * deg(w)/freq(w) over the corpus (deg counts phrase lengths at every
    * occurrence — words that live in long collocations outrank equally
    * frequent loners); a phrase scores the sum of its words. Returns
    * the `topN` distinct phrases by (score desc, phrase).
    *
    * Scale shape: phrase segmentation is a per-doc prefix sum (doc-keyed
    * window over token positions — partitions are document-sized, never
    * global); word statistics are one corpus-wide hash aggregation on
    * the word key; phrase assembly and scoring are (doc, phrase)-keyed
    * aggregations. Word scores are exact-integer ratios; the only float
    * sum is the per-phrase score (a handful of terms), rounded.
    */
  def rakeKeyphrases(docs: DataFrame, stop: Seq[String], topN: Int = 30,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol).as("_id"),
      posexplode(tokens(lower(col(textCol)))).as(Seq("_i", "_w")))
    val w = Window.partitionBy("_id").orderBy("_i")
    val words = toks
      .withColumn("_st", col("_w").isin(stop: _*).cast("int"))
      .withColumn("_pid", sum("_st").over(w))
      .filter(col("_st") === 0)
      .select("_id", "_pid", "_i", "_w")
      .localCheckpoint(eager = false) // 3 consumers, one segmentation
    val plen = words.groupBy("_id", "_pid").agg(count(lit(1)).as("_len"))
    val wstat = words.join(plen, Seq("_id", "_pid"))
      .groupBy("_w").agg(count(lit(1)).as("_freq"), sum("_len").as("_deg"))
    val phr = words.groupBy("_id", "_pid")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("_i"), col("_w")))),
        x => x.getField("_w")), " ").as("phrase"))
    val sc = words.join(wstat, Seq("_w"))
      .groupBy("_id", "_pid")
      .agg(sum(col("_deg").cast("double") / col("_freq")).as("_psc"))
    phr.join(sc, Seq("_id", "_pid")).join(plen, Seq("_id", "_pid"))
      .groupBy("phrase")
      .agg(max("_len").cast("int").as("n_words"),
        count(lit(1)).as("n_occurrences"),
        round(max("_psc"), 6).as("score"))
      .orderBy(col("score").desc, col("phrase"))
      .limit(topN)
  }

  /** Pairwise BLEU-2 (Papineni et al. 2002) between document pairs —
    * the n-gram-precision overlap grade a dedup pipeline runs on its
    * candidate pairs to separate true rewrites from topical neighbors.
    * Convention: id_a is the candidate, id_b the reference. For n∈{1,2},
    * pₙ = Σ_g min(cntₐ(g), cnt_b(g)) / Σ_g cntₐ(g) (clipped modified
    * precision); BLEU-2 = min(1, e^(1−n_b/nₐ)) · exp((ln p₁ + ln p₂)/2),
    * 0 when either precision is 0.
    *
    * Scale shape: each document's n-gram multiset is aggregated ONCE
    * (doc-keyed explode → hash agg, map-side combine), then each pair
    * is two doc-keyed joins + one (id_a, id_b)-keyed aggregation —
    * cost is bounded by |pairs| · grams-per-doc, never corpus².
    * Precisions are exact-integer ratios; only the final exp/ln touch
    * libm, and callers round the output.
    */
  def bleu2Pairs(docs: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol).as("_id"),
      tokens(lower(col(textCol))).as("_t"))
      .localCheckpoint(eager = false) // feeds 3 gram/length consumers
    val uni = toks.select(col("_id"), explode(col("_t")).as("_g"))
      .groupBy("_id", "_g").agg(count(lit(1)).as("_c"))
    val bi = toks.select(col("_id"),
        explode(zip_with(
          slice(col("_t"), lit(1), size(col("_t")) - 1),
          slice(col("_t"), lit(2), size(col("_t")) - 1),
          (a, b) => concat(a, lit(" "), b))).as("_g"))
      .groupBy("_id", "_g").agg(count(lit(1)).as("_c"))
    def clipped(grams: DataFrame, out: String): DataFrame =
      pairs.select(col("id_a"), col("id_b"))
        .join(grams.select(col("_id").as("id_a"), col("_g"),
          col("_c").as("_ca")), Seq("id_a"))
        .join(grams.select(col("_id").as("id_b"), col("_g"),
          col("_c").as("_cb")), Seq("id_b", "_g"), "left_outer")
        .groupBy("id_a", "id_b")
        .agg(sum(least(col("_ca"), coalesce(col("_cb"), lit(0L))))
          .as(s"_clip$out"),
          sum(col("_ca")).as(s"_tot$out"))
    val lens = toks.select(col("_id"), size(col("_t")).as("_n"))
    val c1 = clipped(uni, "1")
    val c2 = clipped(bi, "2")
    val p1 = col("_clip1").cast("double") / col("_tot1")
    val p2 = col("_clip2").cast("double") / col("_tot2")
    c1.join(c2, Seq("id_a", "id_b"))
      .join(lens.select(col("_id").as("id_a"), col("_n").as("_na")),
        Seq("id_a"))
      .join(lens.select(col("_id").as("id_b"), col("_n").as("_nb")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        col("_na").as("n_tok_a"), col("_nb").as("n_tok_b"),
        round(p1, 6).as("p1"), round(p2, 6).as("p2"),
        when(col("_clip1") > 0 && col("_clip2") > 0,
          round(least(lit(1.0),
            exp(lit(1.0) - col("_nb").cast("double") / col("_na")))
            * exp((log(p1) + log(p2)) / 2.0), 6))
          .otherwise(lit(0.0)).as("bleu2"))
  }

  /** Convenience: annotate a documents frame with the full feature set. */
  def analyze(docs: DataFrame, textCol: String = "text"): DataFrame = {
    graft.plans.GraftFunctions.register(docs.sparkSession)
    val t = col(textCol)
    docs
      .withColumn("n_tokens", tokenCount(t))
      .withColumn("n_bpe_tokens", bpeTokenCount(t))
      .withColumn("lang_pred", langId(t))
      .withColumn("punct_ratio", punctRatio(t))
      .withColumn("stopword_ratio", stopwordRatio(t))
      .withColumn("mean_token_len", meanTokenLen(t))
      .withColumn("quality", qualityFrom(col("n_tokens"), col("punct_ratio"),
        col("stopword_ratio"), col("mean_token_len")))
      .withColumn("fingerprint", sortedTokenFingerprint(t))
      .withColumn("punct_ratio", round(col("punct_ratio"), 4))
      .withColumn("stopword_ratio", round(col("stopword_ratio"), 4))
      .withColumn("mean_token_len", round(col("mean_token_len"), 4))
  }
}
