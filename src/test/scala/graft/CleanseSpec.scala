package graft

import org.apache.spark.sql.functions._
import graft.operators.{Cleanse, Dedup}

/** Repetition statistics, PII redaction, and pairs→clusters connected
  * components (SURVEY.md §2.11 cleansing extensions).
  */
class CleanseSpec extends SparkSuite {
  import spark.implicits._

  test("dupLineFraction: repeated lines counted, blanks ignored") {
    val df = Seq(
      (1L, "a b\n\n  \na b\nc d"),   // 3 non-empty lines, "a b" twice
      (2L, "only one line"),
      (3L, "")
    ).toDF("doc_id", "text")
    val m = df.select($"doc_id", round(Cleanse.dupLineFraction($"text"), 6).as("f"))
      .as[(Long, Double)].collect().toMap
    assert(math.abs(m(1L) - 1.0 / 3.0) < 1e-6)
    assert(m(2L) === 0.0)
    assert(m(3L) === 0.0)
  }

  test("bigrams: ordered, non-distinct, n-1 of them; empty below 2 tokens") {
    val bg = Seq((1L, "x y x y")).toDF("doc_id", "text")
      .select(Cleanse.bigrams($"text")).as[Seq[String]].head()
    assert(bg === Seq("x y", "y x", "x y"))
    val none = Seq((1L, "solo")).toDF("doc_id", "text")
      .select(Cleanse.bigrams($"text")).as[Seq[String]].head()
    assert(none === Seq.empty)
  }

  test("topTokenFraction / topBigramFraction find the mode fraction") {
    val df = Seq((1L, "a a a b c")).toDF("doc_id", "text")
    val (tt, tb) = df.select(
      Cleanse.topTokenFraction($"text"), Cleanse.topBigramFraction($"text"))
      .as[(Double, Double)].head()
    assert(tt === 0.6)        // "a" 3 of 5
    assert(tb === 0.5)        // "a a" 2 of 4 bigrams
  }

  test("redact replaces email, phone, url with typed placeholders") {
    val out = Seq((1L, "mail bob.smith+x@corp.example.com or 555-012-3456 at https://ex.org/p?q=1 end"))
      .toDF("doc_id", "text")
      .select(Cleanse.redact($"text")).as[String].head()
    assert(out === "mail <EMAIL> or <PHONE> at <URL> end")
  }

  test("counts match the number of occurrences") {
    val df = Seq((1L, "a@b.com c@d.org 111-222-3333 http://x.y https://z.w/1"))
      .toDF("doc_id", "text")
    val (e, p, u) = df.select(
      Cleanse.emailCount($"text"), Cleanse.phoneCount($"text"), Cleanse.urlCount($"text"))
      .as[(Int, Int, Int)].head()
    assert((e, p, u) === ((2, 1, 2)))
  }

  test("urlDomain extracts the host part") {
    val d = Seq((1L, "https://sub.example.org/a/b?c=1")).toDF("doc_id", "url")
      .select(Cleanse.urlDomain($"url")).as[String].head()
    assert(d === "sub.example.org")
  }

  test("native maxRunFraction is bit-identical to the HOF twin on the fixture corpus") {
    val docs = graft.engine.Tables.load(spark, sfDir, "documents")
    val both = docs.select(
      Cleanse.maxRunFraction(graft.operators.TextAnalysis.tokens($"text")).as("native"),
      Cleanse.maxRunFractionHof(graft.operators.TextAnalysis.tokens($"text")).as("hof"),
      Cleanse.maxRunFraction(Cleanse.bigrams($"text")).as("native_bg"),
      Cleanse.maxRunFractionHof(Cleanse.bigrams($"text")).as("hof_bg"))
    assert(both.filter($"native" =!= $"hof" || $"native_bg" =!= $"hof_bg").count() === 0)
  }

  test("native maxRunFraction edge cases: empty, all-null, null-input arrays") {
    val df = Seq(
      (1L, Seq[String]()),
      (2L, Seq[String](null, null, null)),
      (3L, Seq("a", null, "a")),
      (4L, null)
    ).toDF("id", "arr")
    val rows = df.select($"id",
      Cleanse.maxRunFraction($"arr").as("n"), Cleanse.maxRunFractionHof($"arr").as("h"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getDouble(1),
        if (r.isNullAt(2)) null else r.getDouble(2)))
    rows.foreach { case (id, n, h) => assert(n === h, s"id=$id") }
  }

  test("connectedComponents: transitive chain collapses to one min-labeled cluster") {
    // path 1-2-3-4-5 (diameter 4 → needs >1 propagation round) + island 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("id_a", "id_b")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L)
    // driver union-find path (default) and distributed pointer-jumping
    // path (forced by driverMaxPairs = 0) must agree exactly
    val driverCc = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    val distCc = Dedup.connectedComponents(pairs, driverMaxPairs = 0L)
      .as[(Long, Long)].collect().toMap
    assert(driverCc === expected)
    assert(distCc === expected)
  }

  test("connectedComponents: driver and distributed paths agree on a random graph") {
    // 300 edges over 120 nodes (seeded): multiple components, cycles,
    // high-degree hubs — exercises pointer jumping beyond a simple chain
    val rng = new scala.util.Random(7)
    val pairs = Seq.fill(300)((rng.nextInt(120).toLong, rng.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
      .toDF("id_a", "id_b")
    val driverCc = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    val distCc = Dedup.connectedComponents(pairs, driverMaxPairs = 0L)
      .as[(Long, Long)].collect().toMap
    assert(driverCc === distCc)
    assert(driverCc.nonEmpty)
    // every label is itself a member of the same component (labels are ids)
    driverCc.foreach { case (_, lbl) => assert(driverCc(lbl) === lbl) }
  }

  test("admissionReport: gates fire in order, one verdict per doc") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again", "en"),
      (2L, "the quick brown fox jumps over the lazy dog again and again", "en"), // dup of 1
      (3L, "le chat est sur la table et la chaise est pour le chien", "en"),     // fr text labeled en
      // recognized English (three 'the' hits) but punct-heavy with
      // over-long tokens → fails 2 of 4 quality components → 0.5 < 0.75
      (4L, "the ########################## the !!!!!!!!!!!!!!!!!!!!!!!!!! the", "en"),
      (5L, "this is a perfectly reasonable sentence that should be admitted for training", "en")
    ).toDF("doc_id", "text", "lang")
    val got = Cleanse.admissionReport(docs)
      .select("doc_id", "verdict").as[(Long, String)].collect().toMap
    assert(got(1L) === "admitted")
    assert(got(2L) === "duplicate") // higher id of the identical pair
    assert(got(3L) === "language")
    assert(got(4L) === "quality")
    assert(got(5L) === "admitted")
  }

  test("dupClusters groups near-dup pairs beyond direct edges") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "a"),
      (2L, "the quick brown fox jumps over the lazy dog", "a"),  // = 1
      (3L, "a quick brown fox jumps over the lazy dog", "a"),    // ~ 1,2
      (4L, "completely unrelated text about spark physical plans", "a"),
      (5L, "some other corpus entirely", "b")
    ).toDF("doc_id", "text", "source")
    val rows = Dedup.dupClusters(docs, "source", threshold = 0.3)
      .select("cluster_id", "n_members", "members")
      .as[(Long, Long, String)].collect().toSeq
    assert(rows === Seq((1L, 3L, "1,2,3")))
  }
}
