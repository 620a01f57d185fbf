package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.engine.{NlCompiler, SqlGuard}

/** Property-based invariants over the NL pipeline (SURVEY.md §5.3):
  * whatever the user types, the rule-based compiler must emit SQL the
  * guard accepts, bounded by a LIMIT or shaped as an aggregate — the
  * machine-checked version of the reference's only correctness property
  * (its SQL safety gate). Driven by seeded ScalaCheck generators
  * (deterministic; the scalatest bridge is not in the offline cache).
  */
class PipelinePropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] = {
    val p = Gen.Parameters.default
    Iterator.iterate(Seed(42L))(_.next)
      .map(s => g.apply(p, s))
      .collect { case Some(a) => a }
      .take(n).toSeq
  }

  // realistic NL inputs: words from the domain + noise, numbers, symbols
  private val domainWord = Gen.oneOf(
    "show", "me", "all", "employees", "count", "how", "many", "salary",
    "department", "IT", "HR", "sales", "engineering", "greater", "than",
    "average", "highest", "paid", "recent", "hires", "email", "gmail",
    "position", "manager", "name", "details", "list", "joined", "year")
  private val noise = Gen.oneOf("'", "\"", ";", "--", "🙂", "DROP", "TABLE",
    "select", "*", "&", "%", "(", ")")
  private val token = Gen.frequency(8 -> domainWord, 1 -> noise,
    1 -> Gen.choose(0, 500000).map(_.toString))
  private val nlQuery: Gen[String] =
    Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, token)).map(_.mkString(" "))

  private val queries = samples(nlQuery, 500)

  test("compiler output always passes the guard") {
    queries.foreach { q =>
      val sql = NlCompiler.compileSql(q)
      assert(SqlGuard.clean(sql).isDefined, s"guard rejected: $sql (from: $q)")
    }
  }

  test("compiler output is always a SELECT on employees ending in ';'") {
    queries.foreach { q =>
      val sql = NlCompiler.compileSql(q).trim
      assert(sql.toLowerCase.startsWith("select"), s"from: $q")
      assert(sql.toLowerCase.contains("employees"), s"from: $q")
      assert(sql.endsWith(";"), s"from: $q")
    }
  }

  test("every non-aggregate compilation is LIMIT-bounded") {
    queries.foreach { q =>
      val sql = NlCompiler.compileSql(q).toLowerCase
      val isAggregate = sql.contains("count(") || sql.contains("avg(")
      assert(isAggregate || sql.contains("limit"), s"unbounded list query: $sql")
    }
  }

  test("compilation is deterministic") {
    queries.foreach { q =>
      assert(NlCompiler.compileSql(q) === NlCompiler.compileSql(q))
    }
  }

  test("guard never passes deny-listed statements regardless of casing/padding") {
    val denied = Seq("drop", "delete", "update", "insert", "alter", "create",
      "truncate", "grant", "revoke")
    for {
      kw <- denied
      mutate <- Seq[String => String](identity, _.toUpperCase, "  " + _, "\n" + _)
    } {
      val sql = mutate(s"SELECT * FROM employees WHERE $kw x")
      assert(SqlGuard.clean(sql).isEmpty, s"guard passed: $sql")
    }
  }

  test("guard strips markdown fences but preserves the statement") {
    Seq("sql", "").foreach { lang =>
      val inner = "SELECT name FROM employees LIMIT 5"
      assert(SqlGuard.clean(s"```$lang\n$inner\n```") === Some(s"$inner;"))
    }
  }

  // -- winnowing guarantee over generated corpora ---------------------------

  private val wordGen = Gen.listOfN(6, Gen.alphaLowerChar).map(_.mkString)
  private def docGen(core: Seq[String]): Gen[String] = for {
    nPre <- Gen.chooseNum(0, 12)
    nSuf <- Gen.chooseNum(0, 12)
    pre <- Gen.listOfN(nPre, wordGen)
    suf <- Gen.listOfN(nSuf, wordGen)
  } yield (pre ++ core ++ suf).mkString(" ")

  test("winnow guarantee holds on 100 generated doc pairs (k=4, w=4)") {
    // any shared run of k+w-1 = 7 tokens must yield a shared fingerprint
    val spark = SparkSuite.spark
    import spark.implicits._
    val cores = samples(Gen.listOfN(7, wordGen), 100)
    val pairs = cores.zipWithIndex.map { case (core, i) =>
      val a = samples(docGen(core), 1).head
      val b = samples(docGen(core).map(x => x + " tailnoise"), 1).head
      (i.toLong, a, b)
    }
    val df = pairs.toDF("i", "a", "b")
      .select($"i",
        graft.operators.TextAnalysis.winnowFingerprints($"a", 4, 4).as("fa"),
        graft.operators.TextAnalysis.winnowFingerprints($"b", 4, 4).as("fb"))
      .select($"i", org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.array_intersect($"fa", $"fb")).as("shared"))
    val misses = df.filter($"shared" < 1).select("i").as[Long].collect()
    assert(misses.isEmpty, s"guarantee violated for pair ids: ${misses.toSeq}")
  }
}
