package graft

import org.apache.spark.sql.functions._

import graft.operators.Retrieval

class ChunkingSpec extends SparkSuite {
  import spark.implicits._

  test("chunks overlap by size - stride and cover every token") {
    val docs = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Retrieval.chunk(docs, chunkSize = 4, stride = 3)
      .orderBy("chunk_id")
      .select("chunk_id", "chunk_tokens", "chunk")
      .as[(Int, Int, String)].collect()
    assert(out === Array(
      (0, 4, "t1 t2 t3 t4"),
      (1, 4, "t4 t5 t6 t7"),
      (2, 4, "t7 t8 t9 t10"),
      (3, 1, "t10")))
  }

  test("a document shorter than one chunk yields exactly one chunk") {
    val docs = Seq((1L, "only three tokens")).toDF("doc_id", "text")
    val out = Retrieval.chunk(docs, chunkSize = 64, stride = 48)
      .select("chunk_id", "chunk_tokens", "chunk")
      .as[(Int, Int, String)].collect()
    assert(out === Array((0, 3, "only three tokens")))
  }

  test("chunking is map-only: the physical plan has no exchange") {
    val docs = engine.Tables.load(spark, sfDir, "documents")
    val plan = Retrieval.chunk(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("every token position is covered by at least one chunk") {
    val docs = engine.Tables.load(spark, sfDir, "documents")
    val total = docs
      .select(size(graft.operators.TextAnalysis.tokens(col("text"))).as("n"))
      .agg(sum("n")).as[Long].head()
    // stride 48 of 64-token chunks: tokens in [i*48, i*48+64) — positions
    // covered once or twice; sum of chunk sizes >= total tokens
    val chunked = Retrieval.chunk(docs)
      .agg(sum("chunk_tokens")).as[Long].head()
    assert(chunked >= total)
  }
}
