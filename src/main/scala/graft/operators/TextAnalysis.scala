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

  /** Count of tokens that appear in `words`. */
  def hitCount(text: Column, words: Seq[String]): Column =
    size(filter(tokens(lower(text)), t => array_contains(typedLit(words), t)))

  /** Language-ID column: 'zh' on any CJK char, else argmax stopword hits
    * (≥1), else 'und'.
    */
  def langId(text: Column): Column = {
    val cjk = length(regexp_replace(text, "[^\\u4e00-\\u9fff]", "")) > 0
    val scored = stopwords.map { case (l, ws) => (l, hitCount(text, ws)) }
    val best = scored.tail.foldLeft(
      struct(scored.head._2.as("score"), lit(scored.head._1).as("lang"))) {
      case (acc, (l, s)) =>
        // strict > keeps the earlier language on ties → deterministic
        when(s > acc.getField("score"), struct(s.as("score"), lit(l).as("lang")))
          .otherwise(acc)
    }
    when(cjk, lit("zh"))
      .when(best.getField("score") >= 1, best.getField("lang"))
      .otherwise(lit("und"))
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

  def meanTokenLen(text: Column): Column = {
    val ts = tokens(text)
    when(size(ts) === 0, 0.0).otherwise(
      aggregate(ts, lit(0L), (acc, t) => acc + length(t)).cast("double") /
        size(ts).cast("double"))
  }

  /** Composite quality score in [0,1]: rewards sane length, some stopwords,
    * low punctuation noise. Heuristic in the spirit of C4/Gopher quality
    * filters; deterministic and oracle-expressible.
    */
  def qualityScore(text: Column): Column = {
    val lenOk = when(tokenCount(text).between(5, 10000), 1.0).otherwise(0.0)
    val punctOk = when(punctRatio(text) < 0.2, 1.0).otherwise(0.0)
    val swOk = when(stopwordRatio(text) > 0.01, 1.0).otherwise(0.0)
    val tokOk = when(meanTokenLen(text).between(2.0, 12.0), 1.0).otherwise(0.0)
    round((lenOk + punctOk + swOk + tokOk) / 4.0, 2)
  }

  // -- fingerprinting ------------------------------------------------------

  /** Order-insensitive document fingerprint: md5 of the sorted token bag.
    * md5 is identical in Spark and DuckDB, so this is oracle-checkable;
    * use [[rollingHash]] for the cheap 64-bit variant in joins.
    */
  def sortedTokenFingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(tokens(lower(text)))))

  /** Chained rolling hash over tokens (order-sensitive, 64-bit): the
    * accumulator is re-hashed with each token, which keeps full avalanche
    * without multiplication (ANSI-overflow-safe).
    */
  def rollingHash(text: Column): Column =
    aggregate(tokens(text), lit(1469598103934665603L),
      (acc, t) => xxhash64(concat_ws("", acc, t)))

  /** Convenience: annotate a documents frame with the full feature set. */
  def analyze(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("n_tokens", tokenCount(t))
      .withColumn("n_bpe_tokens", bpeTokenCount(t))
      .withColumn("lang_pred", langId(t))
      .withColumn("punct_ratio", round(punctRatio(t), 4))
      .withColumn("stopword_ratio", round(stopwordRatio(t), 4))
      .withColumn("mean_token_len", round(meanTokenLen(t), 4))
      .withColumn("quality", qualityScore(t))
      .withColumn("fingerprint", sortedTokenFingerprint(t))
  }
}
