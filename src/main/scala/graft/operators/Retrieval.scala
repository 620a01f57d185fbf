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

  /** Distinct char trigrams — native codegen'd single pass
    * ([[graft.functions.CharTrigrams]]); bit-identical to
    * [[trigramsHof]], the interpreted higher-order twin.
    */
  def trigrams(text: Column): Column = {
    call_function("graft_trigrams", text)
  }

  /** [[trigrams]] via built-in higher-order functions — the portable
    * fallback and differential-test partner (interpreted per position).
    */
  def trigramsHof(text: Column): Column =
    // array_remove: substr of an EMPTY string yields "" (no trigram);
    // any non-empty input never produces an empty slice, so this only
    // normalizes the empty-document case to an empty array
    array_remove(array_distinct(transform(
      sequence(lit(1), greatest(length(text) - 2, lit(1))),
      i => text.substr(i, lit(3)))), "")

  /** Substring search through a trigram inverted index (the pg_trgm
    * idea): a document can contain `query` only if it contains EVERY
    * trigram of the query, so the posting scan prunes to the query's own
    * trigrams (a tiny IN-list pushed to the index scan), the candidate
    * set is the docs matching all of them, and only candidates pay the
    * exact `contains` verify. Result-identical to the full LIKE scan —
    * the oracle runs the plain scan — but at 100 TB the index path reads
    * posting lists proportional to the query's selectivity instead of
    * every byte of the corpus.
    */
  def trigramSubstringSearch(
      docs: DataFrame, query: String,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(query.length >= 3, "trigram search needs a query of >= 3 chars")
    graft.plans.GraftFunctions.register(docs.sparkSession)
    val qg = query.sliding(3).toSeq.distinct
    val cands = docs
      .select(col(idCol), explode(trigrams(col(textCol))).as("g"))
      .filter(col("g").isin(qg: _*))
      .groupBy(idCol).agg(count(lit(1)).as("ng"))
      .filter(col("ng") === qg.length)
    docs.join(cands.select(col(idCol)), Seq(idCol), "left_semi")
      .filter(col(textCol).contains(query))
      .select(col(idCol))
      .orderBy(idCol)
  }

  import graft.operators.TextAnalysis.tokens

  /** Token-level EXACT phrase search over a positional inverted index —
    * the `"hash agg"`-in-quotes query a substring scan can't answer
    * honestly (substrings also match inside longer tokens; token
    * positions don't). The posting stream is pruned to the phrase's own
    * terms BEFORE anything shuffles (the map-side `isin` is the
    * positional index's posting-list lookup), then each later term joins
    * the anchor at `pos + i` on the (doc, position) key. Output one row
    * per matching doc with its occurrence count.
    *
    * Scale: postings for a handful of terms are a vanishing fraction of
    * the token stream; every join is keyed and the anchor side shrinks
    * monotonically with each term. Nothing pairwise, nothing driver-side.
    */
  def phraseSearch(
      docs: DataFrame, phrase: Seq[String],
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(phrase.nonEmpty, "phrase search needs at least one term")
    val terms = phrase.map(_.toLowerCase)
    val postings = docs
      .select(col(idCol), posexplode(tokens(lower(col(textCol)))))
      .toDF(idCol, "pos", "term")
      .filter(col("term").isin(terms.distinct: _*))
    val anchor = postings.filter(col("term") === terms.head)
      .select(col(idCol), col("pos"))
    val matched = terms.zipWithIndex.drop(1).foldLeft(anchor) {
      case (acc, (t, i)) =>
        val side = postings.filter(col("term") === t)
          .select(col(idCol).as("_id"), (col("pos") - i).as("_pos"))
        acc.join(side,
            acc(idCol) === side("_id") && acc("pos") === side("_pos"))
          .select(acc(idCol), acc("pos"))
    }
    matched.groupBy(idCol)
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(idCol)
  }

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

  /** IR ranking-quality evaluation — precision@k, MRR@k, NDCG@k — of the
    * [[bm25]] bag-of-words ranker against exact-PHRASE relevance: a
    * document is relevant to a query iff the query's terms occur
    * adjacent and in order in the whitespace-normalized lowercased text.
    * BM25 scores the terms as a bag, so the metrics quantify how well
    * bag-of-words ranking surfaces true phrase matches — the offline
    * eval loop a retrieval deployment runs on every index build.
    *
    * Scale design: candidate generation reuses bm25's filtered explode
    * (O(matching tokens) on the wire, never the full token stream); a
    * phrase match implies every term matches, so gold ⊆ candidates and
    * only the (query, doc) gold pairs — not document text — join back;
    * ranking is one row_number per query over its candidate set, bounded
    * by the query terms' postings; ranks order by the ROUNDED score
    * (4 dp) with doc-id tie-break, the suite's cross-engine protocol.
    */
  def searchEval(
      docs: DataFrame,
      queries: Seq[(Int, Seq[String])],
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty))
    val spark = docs.sparkSession
    import spark.implicits._
    val allTerms = queries.flatMap(_._2).distinct
    val qt = queries.flatMap { case (q, ts) => ts.map(t => (q, t)) }
      .toDF("query_id", "term")
    val toks = docs.select(col(idCol).as("id"),
      tokens(lower(col(textCol))).as("toks"))
    // gold pairs: per-doc phrase containment flags, filtered map-side to
    // the (query_id, id) matches — the only relevance rows that travel
    val gold = toks
      .select(col("id"),
        concat(lit(" "), array_join(col("toks"), " "), lit(" ")).as("nt"))
      .select(col("id"), explode(array(queries.map { case (q, ts) =>
        struct(lit(q).as("query_id"),
          col("nt").contains(ts.mkString(" ", " ", " ")).as("g"))
      }: _*)).as("f"))
      .filter(col("f.g"))
      .select(col("f.query_id").as("query_id"), col("id"), lit(true).as("g"))
    val tf = toks
      .select(col("id"), size(col("toks")).as("dl"),
        explode(filter(col("toks"),
          t => array_contains(typedLit(allTerms), t))).as("term"))
      .groupBy("id", "dl", "term").agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy("term").agg(countDistinct("id").as("df"))
    val stats = toks.agg(count(lit(1)).as("n"),
      avg(size(col("toks"))).as("avgdl"))
    val idf = log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    val norm = col("tf") +
      lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))
    val ranked = tf.join(broadcast(dft), "term")
      .crossJoin(broadcast(stats))
      .join(broadcast(qt), "term")
      .groupBy("query_id", "id")
      .agg(round(sum(idf * (col("tf") * (k1 + 1.0)) / norm), 4).as("score"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("score").desc, col("id"))))
      .join(gold, Seq("query_id", "id"), "left_outer")
      .withColumn("g", coalesce(col("g"), lit(false)))
    val hit = col("g") && col("rank") <= k
    val idcg = aggregate(
      sequence(lit(1), least(lit(k), greatest(col("n_gold"), lit(1)).cast("int"))),
      lit(0.0), (acc, i) => acc + lit(1.0) / log2(i.cast("double") + 1.0))
    ranked.groupBy("query_id")
      .agg(count(lit(1)).as("n_matched"),
        sum(when(col("g"), 1L).otherwise(0L)).as("n_gold"),
        sum(when(hit, 1L).otherwise(0L)).as("n_hits"),
        max(when(hit, lit(1.0) / col("rank"))).as("mrr_raw"),
        sum(when(hit, lit(1.0) / log2(col("rank") + 1.0))).as("dcg"))
      .select(col("query_id"), col("n_matched"), col("n_gold"),
        round(col("n_hits") / lit(k.toDouble), 6).as(s"p_at_$k"),
        round(coalesce(col("mrr_raw"), lit(0.0)), 6).as(s"mrr_at_$k"),
        when(col("n_gold") > 0,
          round(coalesce(col("dcg"), lit(0.0)) / idcg, 6))
          .as(s"ndcg_at_$k"))
      .orderBy("query_id")
  }

  /** Assign documents to fixed-token-budget training shards: within each
    * `groupCol` stream (ordered by `idCol`), shard k holds the documents
    * whose cumulative token offset falls in [k·budget, (k+1)·budget).
    *
    * Scale design: one window pass per group partition — the cumulative
    * sum shuffles each group to one task, so `groupCol` must be
    * finer-grained than the data skew you can afford (sources/files at
    * 100 TB, never a global ordering). A document longer than the budget
    * still lands in exactly one shard; shards may overshoot by at most
    * one document, the standard streaming-pack tradeoff (bin-packing
    * exactly would serialize the stream).
    *
    * Output: (groupCol, idCol, n_tok, shard_id).
    */
  def packShards(
      docs: DataFrame,
      budget: Long,
      groupCol: String = "source",
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(budget > 0, "budget must be > 0")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    docs
      .select(col(groupCol), col(idCol),
        size(tokens(col(textCol))).cast("long").as("n_tok"))
      .withColumn("cum_before", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("shard_id", (col("cum_before") / budget).cast("int"))
      .drop("cum_before")
  }

  /** EXACT greedy next-fit sequence packing for fixed-context training:
    * within each `groupCol` stream (ordered by `idCol`), a document joins
    * the open sequence iff it fits the remaining token budget, else it
    * opens the next sequence. Unlike [[packShards]]' cumulative-offset
    * shards (which may overshoot by one document), no packed sequence
    * exceeds `budget` — except a single oversize document, which is kept
    * whole in a sequence of its own rather than dropped or split.
    *
    * Next-fit is inherently sequential per group (each placement depends
    * on the running fill), so no window expression computes it: the rows
    * are hash-partitioned on the (optionally sub-sharded) group key,
    * sorted (group, id) within partitions, and packed by one O(1)-state
    * streaming scan per partition — the Spark shape for any
    * carried-loop-dependency scan. One shuffle total; nothing
    * driver-side; a group never spans partitions, so the scan state
    * resets exactly at group boundaries.
    *
    * Scale design: one giant group serializes into one task, the same
    * constraint as [[packShards]] — `subShards` > 1 salts the packing key
    * with hash(id) mod k so a skewed group packs as k independent
    * sequential streams (k partial-fill tail sequences is the accepted
    * cost; the deterministic default 1 is what a differential oracle
    * replays).
    *
    * Output: (groupCol, idCol, n_tok, seq_id, seq_fill) — `seq_id`
    * numbers sequences within the (group, sub-shard) stream from 0,
    * `seq_fill` is the sequence's running token count after this
    * document lands (the last row of a sequence carries its final fill).
    */
  def packSequences(
      docs: DataFrame,
      budget: Long,
      groupCol: String = "lang",
      idCol: String = "doc_id",
      textCol: String = "text",
      subShards: Int = 1): DataFrame = {
    require(budget > 0, "budget must be > 0")
    require(subShards > 0, "subShards must be > 0")
    val spark = docs.sparkSession
    import spark.implicits._
    val keyed = docs.select(
      col(groupCol).cast("string").as("grp"),
      col(idCol).cast("long").as("id"),
      size(tokens(col(textCol))).cast("long").as("n_tok"),
      if (subShards == 1) lit(0)
      else pmod(xxhash64(col(idCol)), lit(subShards)).cast("int").as("sub"))
      .toDF("grp", "id", "n_tok", "sub")
    val packed = keyed
      .repartition(col("grp"), col("sub"))
      .sortWithinPartitions(col("grp"), col("sub"), col("id"))
      .as[(String, Long, Long, Int)]
      .mapPartitions { it =>
        var curGrp: String = null
        var curSub = -1
        var seq = -1L
        var fill = 0L
        it.map { case (g, id, n, sub) =>
          if (g != curGrp || sub != curSub) {
            curGrp = g; curSub = sub; seq = -1L; fill = 0L
          }
          if (seq < 0L || fill + n > budget) { seq += 1L; fill = n }
          else fill += n
          (g, id, n, seq, fill)
        }
      }
      .toDF("grp", "id", "n_tok", "seq_id", "seq_fill")
    packed.select(col("grp").as(groupCol), col("id").as(idCol),
      col("n_tok"), col("seq_id"), col("seq_fill"))
  }

  /** Length-bucketed batch construction for padded-tensor training: docs
    * are bucketed by token count (`bucketWidth`-token linear buckets —
    * integer arithmetic, no float log2 edge cases), then grouped into
    * fixed-`batchSize` batches in id order within each bucket. A batch
    * pads every member to its own max length, so the padding waste a
    * batching policy costs is `1 − Σreal / Σ(n·max)` — THE number that
    * justifies length bucketing over naive id-order batching.
    *
    * Scale design: one shuffle (the per-bucket window). Bucket count is
    * small, so at 100 TB the window key must be salted the same way as
    * [[packSequences]]' `subShards` — batches only need to be formed
    * WITHIN a stream, never across the whole bucket; the deterministic
    * single-stream default is what the oracle replays.
    *
    * Output: one row per doc — (idCol, n_tok, bucket, batch_id).
    */
  def lengthBucketBatches(
      docs: DataFrame,
      bucketWidth: Int = 32,
      batchSize: Int = 8,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(bucketWidth > 0 && batchSize > 0, "width and batch must be > 0")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col(idCol))
    docs
      .select(col(idCol), size(tokens(col(textCol))).cast("long").as("n_tok"))
      .withColumn("bucket", floor(col("n_tok") / bucketWidth).cast("int"))
      .withColumn("batch_id",
        floor((row_number().over(w) - 1).cast("long") / batchSize))
      .select(col(idCol), col("n_tok"), col("bucket"), col("batch_id"))
  }

  /** Reciprocal-rank fusion of two ranked lists over the same id space:
    * keyword (BM25) and vector (cosine-vs-probe) retrieval. Each list
    * contributes 1/(k + rank) for ids it contains; ids in either list
    * survive (full outer merge).
    *
    * Scale design: both rank lists are top-`candidates` bounded BEFORE the
    * merge, so the fused join touches ≤ 2·candidates rows no matter the
    * corpus size; ranking itself is a TakeOrderedAndProject over each
    * scoring pipeline, never a global sort.
    */
  def hybridRrf(
      docs: DataFrame,
      emb: DataFrame,
      terms: Seq[String],
      queryVec: Seq[Double],
      candidates: Int = 100,
      kRrf: Int = 60,
      idCol: String = "doc_id",
      textCol: String = "text",
      embIdCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    import graft.functions.VectorFunctions
    graft.plans.GraftFunctions.register(docs.sparkSession)
    // unpartitioned rank window BY DESIGN: it only ever sees the
    // ≤`candidates` rows that survive each retriever's limit, so the
    // WindowExec "No Partition Defined" warning is the audited, benign
    // case here
    val wAll = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("id"))
    val bmRanks = bm25(docs, terms, idCol, textCol)
      .select(col(idCol).as("id"), col("score"))
      .limit(candidates)
      .withColumn("r_kw", row_number().over(wAll))
      .select(col("id"), col("r_kw"))
    // ranks derive from ROUNDED scores on both engines: rounding is the
    // cross-engine FP equivalence class, and the id tie-break inside a
    // rounded tie is deterministic
    val cosRanks = emb
      .select(col(embIdCol).as("id"),
        round(VectorFunctions.cosine(col(vecCol), VectorFunctions.vecLit(queryVec)), 6).as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(candidates)
      .withColumn("r_vec", row_number().over(wAll))
      .select(col("id"), col("r_vec"))
    bmRanks.join(cosRanks, Seq("id"), "full_outer")
      .select(col("id").as(idCol),
        round(coalesce(lit(1.0) / (lit(kRrf) + col("r_kw")), lit(0.0))
          + coalesce(lit(1.0) / (lit(kRrf) + col("r_vec")), lit(0.0)), 6).as("rrf"))
      .orderBy(col("rrf").desc, col(idCol))
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
