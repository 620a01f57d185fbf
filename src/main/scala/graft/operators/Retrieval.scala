package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyword-relevance retrieval over a document corpus — the rebuild's
  * ranked counterpart to the reference's substring-match retrieval
  * (`LOWER(col) LIKE '%term%'`, `/root/reference/core/ai_query_generator
  * .py:222,237`): Okapi BM25 scoring with corpus-level statistics.
  *
  * Scale design: tokens are filtered to the query terms BEFORE exploding,
  * so the shuffled row count is O(matching tokens), not O(all tokens) — at
  * 100 TB the explode of full token streams is the difference between a
  * terabyte and a few gigabytes on the wire. Per-term document frequencies
  * (≤ |terms| rows) and the corpus stats (1 row) join back by broadcast;
  * nothing driver-side.
  */
object Retrieval {

  import graft.operators.TextAnalysis.tokens

  /** BM25 scores for documents matching at least one query term.
    * Output: (`idCol`, n_terms, score) — `n_terms` = distinct query terms
    * present — ordered by rounded score descending (doc id tie-break).
    *
    * @param terms lowercase query terms, matched against
    *   whitespace-tokenized `lower(text)`
    */
  def bm25(
      docs: DataFrame,
      terms: Seq[String],
      idCol: String = "doc_id",
      textCol: String = "text",
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    val toks = docs.select(col(idCol).as("id"),
      tokens(lower(col(textCol))).as("toks"))
    // one row per (doc, matching token occurrence); dl rides along so no
    // re-join against the corpus is needed for the length normalizer
    val tf = toks
      .select(col("id"), size(col("toks")).as("dl"),
        explode(filter(col("toks"),
          t => array_contains(typedLit(terms), t))).as("term"))
      .groupBy("id", "dl", "term").agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy("term").agg(countDistinct("id").as("df"))
    val stats = toks.agg(count(lit(1)).as("n"),
      avg(size(col("toks"))).as("avgdl"))
    val idf = log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    val norm = col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))
    tf.join(broadcast(dft), "term")
      .crossJoin(broadcast(stats))
      .select(col("id"), col("term"),
        (idf * (col("tf") * (k1 + 1.0)) / norm).as("s"))
      .groupBy("id")
      .agg(countDistinct("term").as("n_terms"),
        round(sum("s"), 4).as("score"))
      .select(col("id").as(idCol), col("n_terms"), col("score"))
      .orderBy(col("score").desc, col(idCol))
  }

  /** Split documents into overlapping token-window chunks (RAG indexing
    * prep). Chunk i covers tokens [i·stride, i·stride + chunkSize); start
    * positions run while they stay inside the document, so trailing chunks
    * may be short but every token lands in at least one chunk.
    *
    * Output: (idCol, chunk_id, chunk_tokens, chunk) ordered within the
    * plan only by what the caller imposes. Pure per-row expansion — no
    * shuffle at all; chunking 100 TB is a map-only job that parallelizes
    * with the input splits.
    */
  def chunk(
      docs: DataFrame,
      chunkSize: Int = 64,
      stride: Int = 48,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(chunkSize > 0 && stride > 0, "chunkSize and stride must be > 0")
    val starts = sequence(lit(0), greatest(size(col("_toks")) - 1, lit(0)),
      lit(stride))
    docs
      .select(col(idCol), tokens(col(textCol)).as("_toks"))
      .select(col(idCol), col("_toks"), posexplode(starts))
      .select(col(idCol), col("pos").as("chunk_id"),
        slice(col("_toks"), col("col") + 1, lit(chunkSize)).as("_ctoks"))
      .select(col(idCol), col("chunk_id"),
        size(col("_ctoks")).as("chunk_tokens"),
        concat_ws(" ", col("_ctoks")).as("chunk"))
  }
}
