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
}
