package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.functions.{BestLangByHits, BigramModeCount, CdcBoundaries, CharGramHashes, CharTrigrams, WordGramHashes, CosineSimilarity, DotProduct, L2SqDistance, Md5Hash60, MinHashSig, MinHashSigMd5, ModeCount, MortonInterleave, NormalizeText, PiiScan, SimHash64, SimHashMd5, StopwordHits, VocabCounts, WinnowSig, WordKGrams}

/** Registration of graft's native Catalyst expressions.
  *
  * Two paths to the same registry entries:
  *   - programmatic: `GraftFunctions.register(spark)` (idempotent; called
  *     by the mains, the test harness, and lazily by the operators)
  *   - config-driven: `--conf spark.sql.extensions=graft.plans.GraftExtensions`
  *     for clusters where the session is built by the platform.
  */
object GraftFunctions {

  private def info(name: String, clazz: Class[_]): ExpressionInfo =
    new ExpressionInfo(clazz.getName, name)

  private[plans] val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_dot", info("graft_dot", classOf[DotProduct]),
      (es: Seq[Expression]) => { arity("graft_dot", es, 2); DotProduct(es(0), es(1)) }),
    ("graft_cosine", info("graft_cosine", classOf[CosineSimilarity]),
      (es: Seq[Expression]) => { arity("graft_cosine", es, 2); CosineSimilarity(es(0), es(1)) }),
    ("graft_l2sq", info("graft_l2sq", classOf[L2SqDistance]),
      (es: Seq[Expression]) => { arity("graft_l2sq", es, 2); L2SqDistance(es(0), es(1)) }),
    ("graft_simhash", info("graft_simhash", classOf[SimHash64]),
      (es: Seq[Expression]) => { arity("graft_simhash", es, 1); SimHash64(es(0)) }),
    ("graft_minhash", info("graft_minhash", classOf[MinHashSig]),
      (es: Seq[Expression]) => { arity("graft_minhash", es, 2)
        requireFoldable("graft_minhash", "numHashes", "\"INT\"", es(1)) match {
          case Literal(n: Int, IntegerType) => MinHashSig(es(0), n)
          case other => throw new org.apache.spark.sql.AnalysisException(
            "NON_FOLDABLE_ARGUMENT",
            Map("funcName" -> "`graft_minhash`", "paramName" -> "`numHashes`",
              "paramType" -> "\"INT\""))
        } }),
    ("graft_simhash_md5", info("graft_simhash_md5", classOf[SimHashMd5]),
      (es: Seq[Expression]) => { arity("graft_simhash_md5", es, 1); SimHashMd5(es(0)) }),
    ("graft_md5_hash60", info("graft_md5_hash60", classOf[Md5Hash60]),
      (es: Seq[Expression]) => { arity("graft_md5_hash60", es, 1); Md5Hash60(es(0)) }),
    ("graft_cdc_boundaries", info("graft_cdc_boundaries", classOf[CdcBoundaries]),
      (es: Seq[Expression]) => { arity("graft_cdc_boundaries", es, 2)
        requireFoldable("graft_cdc_boundaries", "mod", "\"INT\"", es(1)) match {
          case Literal(n: Int, IntegerType) => CdcBoundaries(es(0), n.toLong)
          case Literal(n: Long, LongType) => CdcBoundaries(es(0), n)
          case other => throw new org.apache.spark.sql.AnalysisException(
            "NON_FOLDABLE_ARGUMENT",
            Map("funcName" -> "`graft_cdc_boundaries`", "paramName" -> "`mod`",
              "paramType" -> "\"INT\""))
        } }),
    ("graft_minhash_md5", info("graft_minhash_md5", classOf[MinHashSigMd5]),
      (es: Seq[Expression]) => { arity("graft_minhash_md5", es, 2)
        requireFoldable("graft_minhash_md5", "numHashes", "\"INT\"", es(1)) match {
          case Literal(n: Int, IntegerType) => MinHashSigMd5(es(0), n)
          case other => throw new org.apache.spark.sql.AnalysisException(
            "NON_FOLDABLE_ARGUMENT",
            Map("funcName" -> "`graft_minhash_md5`", "paramName" -> "`numHashes`",
              "paramType" -> "\"INT\""))
        } }),
    ("graft_stopword_hits", info("graft_stopword_hits", classOf[StopwordHits]),
      (es: Seq[Expression]) => { arity("graft_stopword_hits", es, 2); StopwordHits(es(0), es(1)) }),
    ("graft_lang_best", info("graft_lang_best", classOf[BestLangByHits]),
      (es: Seq[Expression]) => { arity("graft_lang_best", es, 3)
        BestLangByHits(es(0), es(1), es(2)) }),
    ("graft_mode_count", info("graft_mode_count", classOf[ModeCount]),
      (es: Seq[Expression]) => { arity("graft_mode_count", es, 1); ModeCount(es(0)) }),
    ("graft_bigram_mode_count",
      info("graft_bigram_mode_count", classOf[BigramModeCount]),
      (es: Seq[Expression]) => { arity("graft_bigram_mode_count", es, 1)
        BigramModeCount(es(0)) }),
    ("graft_morton", info("graft_morton", classOf[MortonInterleave]),
      (es: Seq[Expression]) => { arity("graft_morton", es, 3)
        requireFoldable("graft_morton", "bits", "\"INT\"", es(2)) match {
          case Literal(n: Int, IntegerType) => MortonInterleave(es(0), es(1), n)
          case other => throw new org.apache.spark.sql.AnalysisException(
            "NON_FOLDABLE_ARGUMENT",
            Map("funcName" -> "`graft_morton`", "paramName" -> "`bits`",
              "paramType" -> "\"INT\""))
        } }),
    ("graft_word_gram_hashes",
      info("graft_word_gram_hashes", classOf[WordGramHashes]),
      (es: Seq[Expression]) => { arity("graft_word_gram_hashes", es, 2)
        es(1) match {
          case Literal(n: Int, IntegerType) => WordGramHashes(es(0), n)
          case other => throw new IllegalArgumentException(
            s"graft_word_gram_hashes k must be an integer literal, got $other")
        } }),
    ("graft_char_gram_hashes",
      info("graft_char_gram_hashes", classOf[CharGramHashes]),
      (es: Seq[Expression]) => { arity("graft_char_gram_hashes", es, 2)
        es(1) match {
          case Literal(n: Int, IntegerType) => CharGramHashes(es(0), n)
          case other => throw new IllegalArgumentException(
            s"graft_char_gram_hashes k must be an integer literal, got $other")
        } }),
    ("graft_shingles", info("graft_shingles", classOf[WordKGrams]),
      (es: Seq[Expression]) => { arity("graft_shingles", es, 2); es(1) match {
        case Literal(n: Int, IntegerType) => WordKGrams(es(0), n)
        case other => throw new IllegalArgumentException(
          s"graft_shingles k must be an integer literal, got $other")
      } }),
    ("graft_trigrams", info("graft_trigrams", classOf[CharTrigrams]),
      (es: Seq[Expression]) => { arity("graft_trigrams", es, 1); CharTrigrams(es(0)) }),
    ("graft_normalize", info("graft_normalize", classOf[NormalizeText]),
      (es: Seq[Expression]) => { arity("graft_normalize", es, 1); NormalizeText(es(0)) }),
    ("graft_pii_scan", info("graft_pii_scan", classOf[PiiScan]),
      (es: Seq[Expression]) => { arity("graft_pii_scan", es, 1); PiiScan(es(0)) }),
    ("graft_vocab_counts", info("graft_vocab_counts", classOf[VocabCounts]),
      (es: Seq[Expression]) => { arity("graft_vocab_counts", es, 2)
        VocabCounts(es(0), es(1)) }),
    // Spark's own codegen'd bloom-membership predicate (the one runtime
    // row-level filtering injects), surfaced by name so operators can
    // pre-filter a shuffle with a driver-built sketch WITHOUT dropping
    // out of whole-stage codegen the way a Scala UDF would. args:
    // (foldable binary bloom bytes, xxhash64 long of the probe key).
    ("graft_bloom_contains", info("graft_bloom_contains",
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]),
      (es: Seq[Expression]) => { arity("graft_bloom_contains", es, 2)
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(es(0), es(1)) }),
    ("graft_winnow", info("graft_winnow", classOf[WinnowSig]),
      (es: Seq[Expression]) => { arity("graft_winnow", es, 3); (es(1), es(2)) match {
        case (Literal(k: Int, IntegerType), Literal(w: Int, IntegerType)) =>
          WinnowSig(es(0), k, w)
        case other => throw new IllegalArgumentException(
          s"graft_winnow k and w must be integer literals, got $other")
      } }))

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    // re-registering is harmless but logs a WARN per function; operators
    // call this on every invocation, so skip when already present
    if (!reg.functionExists(FunctionIdentifier(functions.head._1))) {
      functions.foreach { case (name, inf, builder) =>
        reg.registerFunction(FunctionIdentifier(name), inf, builder)
      }
    }
  }

  private def arity(name: String, es: Seq[Expression], n: Int): Unit =
    if (es.length != n) throw new IllegalArgumentException(
      s"$name requires exactly $n arguments, got ${es.length}")

  /** Reject a non-literal (or NULL-literal) scalar parameter with a real
    * AnalysisException on Spark's own error classes, instead of a raw
    * IllegalArgumentException that surfaces as an internal error
    * (ADVICE r12). Returns the matched literal so builders can pattern
    * on it after the guard.
    */
  private def requireFoldable(func: String, param: String, tpe: String,
      e: Expression): Literal = e match {
    case Literal(null, _) => throw new org.apache.spark.sql.AnalysisException(
      "INVALID_PARAMETER_VALUE.NULL",
      Map("parameter" -> s"`$param`", "functionName" -> s"`$func`"))
    case l: Literal => l
    case _ => throw new org.apache.spark.sql.AnalysisException(
      "NON_FOLDABLE_ARGUMENT",
      Map("funcName" -> s"`$func`", "paramName" -> s"`$param`",
        "paramType" -> tpe))
  }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.functions.foreach { case (name, inf, builder) =>
      ext.injectFunction((FunctionIdentifier(name), inf, builder))
    }
}
