package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-cleansing operators for a training-data pipeline: Gopher-style
  * repetition statistics (duplicate-line fraction, top-token / top-bigram
  * fraction) and PII detection/redaction (emails, phone numbers, URLs).
  *
  * Scale design: everything here is a narrow per-row transform over the
  * `text` column — no shuffle, no UDFs, built-ins only — so each operator
  * scales embarrassingly with input splits. The per-document mode counts
  * (top-token/top-bigram fraction) are computed as a max-run scan over the
  * row's own sorted token array instead of an explode + groupBy, which
  * would shuffle rows×tokens cells across the cluster to answer a
  * per-document question.
  *
  * Regex patterns are restricted to syntax with identical semantics in
  * Java regex (Spark) and RE2 (the DuckDB oracle).
  */
object Cleanse {

  // -- repetition statistics (Gopher-style quality filters) -----------------

  /** Non-empty trimmed lines of the document. */
  def lines(text: Column): Column =
    filter(transform(split(text, "\n"), x => trim(x)), x => length(x) > 0)

  /** Fraction of lines that are duplicates of an earlier line:
    * (n_lines − n_distinct_lines) / n_lines; 0 for empty documents.
    * High values flag boilerplate/navigation pages.
    */
  def dupLineFraction(text: Column): Column = {
    val l = lines(text)
    when(size(l) === 0, 0.0).otherwise(
      (size(l) - size(array_distinct(l))).cast("double") /
        size(l).cast("double"))
  }

  /** Ordered, non-distinct word bigrams of the whitespace-token stream
    * (n−1 bigrams for n ≥ 2 tokens; empty below that). zip_with pads the
    * shifted side with null — concat_ws would pass the bare last token
    * through as a fake bigram, so the slice keeps exactly the first n−1.
    */
  def bigrams(text: Column): Column = {
    val ts = TextAnalysis.tokens(text)
    when(size(ts) < 2, array().cast("array<string>")).otherwise(
      slice(zip_with(ts, slice(ts, lit(2), size(ts)), (a, b) => concat_ws(" ", a, b)),
        lit(1), size(ts) - 1))
  }

  /** Count of the most frequent element divided by the array size — the
    * per-document mode fraction. Native one-pass hash count
    * ([[graft.functions.ModeCount]]); [[maxRunFractionHof]] is the
    * portable differential-test twin. No shuffle either way — this stays
    * a narrow per-row transform (an explode + groupBy formulation would
    * shuffle rows×tokens cells to answer a per-document question).
    */
  def maxRunFraction(arr: Column): Column =
    when(size(arr) === 0, 0.0).otherwise(
      call_function("graft_mode_count", arr).cast("double") /
        size(arr).cast("double"))

  /** [[maxRunFraction]] from built-in higher-order functions: sort, then
    * a single fold tracking the longest run of equal neighbors —
    * O(n log n) per row and an interpreted lambda + struct allocation per
    * element (measured ~2× the native pass at sf0.1).
    */
  def maxRunFractionHof(arr: Column): Column = {
    val st = aggregate(
      array_sort(arr),
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
        lit(0L).as("best")),
      (acc, x) => {
        val run = when(acc.getField("prev").isNotNull && x === acc.getField("prev"),
          acc.getField("run") + 1L).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      })
    when(size(arr) === 0, 0.0)
      .otherwise(st.getField("best").cast("double") / size(arr).cast("double"))
  }

  /** Fraction of tokens taken by the single most common token. */
  def topTokenFraction(text: Column): Column =
    maxRunFraction(TextAnalysis.tokens(text))

  /** Fraction of bigrams taken by the single most common bigram.
    * r12 (guide §1.2 step 2): fused native pair-mode pass
    * ([[graft.functions.BigramModeCount]]) — the zip_with chain paid an
    * interpreted lambda + struct allocation per token plus a second
    * full-array mode scan; the fused count keys pairs exactly as
    * `concat_ws(' ', a, b)` did, so the fraction is bit-identical
    * (differential-pinned in TextExpressionsSpec). [[bigrams]] stays as
    * the portable differential partner.
    */
  def topBigramFraction(text: Column): Column = {
    val ts = TextAnalysis.tokens(text)
    when(size(ts) < 2, 0.0).otherwise(
      call_function("graft_bigram_mode_count", ts).cast("double") /
        (size(ts) - 1).cast("double"))
  }

  /** [[topBigramFraction]] from the higher-order bigram chain — the
    * portable differential-test twin.
    */
  def topBigramFractionHof(text: Column): Column =
    maxRunFraction(bigrams(text))

  // -- PII detection / redaction --------------------------------------------

  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern = "\\d{3}[-.]\\d{3}[-.]\\d{4}"
  val urlPattern = "https?://[^\\s]+"

  def emailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(emailPattern), lit(0)))

  def phoneCount(text: Column): Column =
    size(regexp_extract_all(text, lit(phonePattern), lit(0)))

  def urlCount(text: Column): Column =
    size(regexp_extract_all(text, lit(urlPattern), lit(0)))

  /** Replace every email, phone, and URL with a typed placeholder. Email
    * runs first so its local-part digits can't be half-eaten by the phone
    * pass; URL runs last (its `[^\s]+` tail would swallow adjacent text if
    * it ran before the others were still inline — order is part of the
    * contract and pinned in CleanseSpec).
    */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailPattern, "<EMAIL>"),
        phonePattern, "<PHONE>"),
      urlPattern, "<URL>")

  /** Fused native PII scan — struct(n_emails, n_phones, n_urls, redacted)
    * in byte-level passes ([[graft.functions.PiiScan]]), bit-identical to
    * the four-regex-traversal chain ([[emailCount]] / [[phoneCount]] /
    * [[urlCount]] / [[redact]], kept as the portable differential
    * partners — TextExpressionsSpec pins the equivalence). r13, guide
    * §1.2 step 2: the 1000× probe measured chained Java regex at
    * ~0.3 MB/s/core on corpus text, the dominant per-byte constant of
    * this operator shape at 100 TB.
    */
  def piiScan(text: Column): Column = call_function("graft_pii_scan", text)

  /** All URLs in the document. */
  def urls(text: Column): Column =
    regexp_extract_all(text, lit(urlPattern), lit(0))

  /** Host part of a URL string. */
  def urlDomain(url: Column): Column =
    regexp_extract(url, "https?://([^/\\s]+)", 1)

  /** The fixture corpus carries no PII, so the oracle-checked queries
    * append a deterministic email/phone/URL derived from (doc_id, source)
    * to every document — the extraction then runs on real content and the
    * DuckDB oracle reproduces the same text byte-for-byte.
    */
  def withSyntheticPii(docs: DataFrame): DataFrame =
    docs.withColumn("text", concat(
      col("text"),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@example.com or call 555-01"), (col("doc_id") % 10).cast("string"),
      lit("-"), (lit(1000) + col("doc_id") % 9000).cast("string"),
      lit(" visit https://"), col("source"), lit(".example.org/d/"),
      col("doc_id").cast("string")))

  /** Synthetic-URL variant for the domain-histogram query: every document
    * links its source site; every third also links a mirror.
    */
  def withSyntheticUrls(docs: DataFrame): DataFrame =
    docs.withColumn("text", concat(
      col("text"),
      lit(" see https://"), col("source"), lit(".example.org/d/"),
      col("doc_id").cast("string"),
      when(col("doc_id") % 3 === 0,
        concat(lit(" and http://mirror-"), col("source"), lit(".example.net/x")))
        .otherwise(lit(""))))

  /** Domain → link-count histogram over a corpus: one narrow extract +
    * explode, then a single hash aggregation on the domain.
    */
  def urlDomainHistogram(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(urls(col(textCol))).as("url"))
      .select(urlDomain(col("url")).as("domain"))
      .groupBy("domain").agg(count(lit(1)).as("n"))

  /** Per-document repetition + PII annotation in one pass. */
  def annotate(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("dup_line_frac", round(dupLineFraction(t), 6))
      .withColumn("top_token_frac", round(topTokenFraction(t), 6))
      .withColumn("top_bigram_frac", round(topBigramFraction(t), 6))
      .withColumn("n_emails", emailCount(t))
      .withColumn("n_phones", phoneCount(t))
      .withColumn("n_urls", urlCount(t))
  }

  /** The ADMISSION PIPELINE: every per-document gate of a training-data
    * intake — exact-dup keep-one, language-consistency, quality floor —
    * composed as ONE relational plan: a single scan computes every
    * feature, one text-keyed window decides dup survivors, and the
    * verdict is a first-failing-gate CASE. No gate re-reads the corpus;
    * at 100 TB the whole intake costs one shuffle (the dup window) on
    * top of the scan.
    *
    * Output: (doc_id, verdict ∈ duplicate|language|quality|admitted,
    * quality) — per-document, deterministic, fully oracle-expressible.
    */
  def admissionReport(
      docs: DataFrame,
      minQuality: Double = 0.75,
      textCol: String = "text",
      idCol: String = "doc_id",
      langCol: String = "lang"): DataFrame = {
    import graft.operators.TextAnalysis
    graft.plans.GraftFunctions.register(docs.sparkSession)
    val t = col(textCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(t).orderBy(col(idCol))
    docs
      .select(col(idCol), col(langCol),
        row_number().over(w).as("rn"),
        TextAnalysis.tokenCount(t).as("n_tok"),
        TextAnalysis.punctRatio(t).as("pr"),
        TextAnalysis.stopwordRatio(t).as("sr"),
        TextAnalysis.meanTokenLen(t).as("mtl"),
        TextAnalysis.langId(t).as("pred"))
      .select(col(idCol), col(langCol), col("rn"), col("pred"),
        TextAnalysis.qualityFrom(col("n_tok"), col("pr"), col("sr"),
          col("mtl")).as("quality"))
      .select(col(idCol),
        when(col("rn") > 1, "duplicate")
          .when(col("pred") =!= col(langCol), "language")
          .when(col("quality") < minQuality, "quality")
          .otherwise("admitted").as("verdict"),
        col("quality"))
  }
}
