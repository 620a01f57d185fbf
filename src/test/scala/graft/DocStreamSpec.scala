package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.operators.Dedup
import graft.streaming.DocStream

/** Streaming dedup-at-ingest (SURVEY.md §2.9 × §2.11): arriving documents
  * checked against a static corpus band index must (a) find exactly the
  * pairs the batch portable-minhash pipeline finds and (b) hold ZERO
  * streaming state — the corpus index carries all the memory.
  */
class DocStreamSpec extends SparkSuite {
  import spark.implicits._

  test("stream-static LSH dedup equals the batch pipeline and is stateless") {
    val docs = Tables.load(spark, sfDir, "documents")
    val index = DocStream.bandIndex(docs)
    val q = awaitDrained(DocStream.startLshDedupStream(
      spark, sfDir, index, "doc_stream_spec", threshold = 0.2))

    val streamed = spark.sql(
      "SELECT DISTINCT doc_id, dup_of, jaccard FROM doc_stream_spec")
      .as[(Long, Long, Double)].collect().toSet

    // batch ground truth: the portable minhash pairs, emitted both ways
    // (the gate reports arriving→corpus, so A~B appears as A→B and B→A)
    val batch = Dedup.minhashNearDupsPortable(docs, threshold = 0.2)
      .select($"id_a", $"id_b", round($"jaccard", 6).as("j"))
      .as[(Long, Long, Double)].collect()
      .flatMap { case (a, b, j) => Seq((a, b, j), (b, a, j)) }.toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty, "fixture must contain near-dups")

    // statelessness: no state store operator ever ran
    assert(q.recentProgress.forall(_.stateOperators.isEmpty),
      "the dedup gate must not hold streaming state")
  }
}
