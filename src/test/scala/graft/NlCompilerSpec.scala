package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.NlCompiler

/** Golden NL→SQL pairs: the reference's 15 example queries
  * (`core/views.py:68-84`) plus the 4 prompt patterns
  * (`core/ai_query_generator.py:121-124`), each pinned to the SQL the
  * rule-based fallback (`ai_query_generator.py:178-281`) generates —
  * including its quirks (substring intent flags, order-dependent branches,
  * the `hire_date` ghost column). SURVEY.md §5 item 2.
  */
class NlCompilerSpec extends AnyFunSuite {

  private def sql(q: String): String = NlCompiler.compileSql(q)

  // -- the 15 views.py examples --------------------------------------------

  test("ex1: show all employees") {
    assert(sql("Show me all employees in the company") ===
      "SELECT name FROM employees ORDER BY name LIMIT 100;")
  }

  test("ex2: joined last year — list-all branch preempts date branch") {
    // "all employees" matches before the date logic; date_of_join column
    // added because "joined" sets asking_for_date
    assert(sql("Give me the list of all employees who joined last year") ===
      "SELECT name, date_of_join FROM employees ORDER BY name LIMIT 100;")
  }

  test("ex3: count IT department") {
    assert(sql("How many employees work in the IT department?") ===
      "SELECT COUNT(*) as count FROM employees WHERE LOWER(department) LIKE '%it%';")
  }

  test("ex4: salary greater than 50000") {
    assert(sql("Show me employees with salary greater than 50000") ===
      "SELECT name, salary FROM employees WHERE salary > 50000 ORDER BY salary DESC LIMIT 50;")
  }

  test("ex5: joined this year — list-all branch wins") {
    assert(sql("List all employees who joined this year") ===
      "SELECT name, date_of_join FROM employees ORDER BY name LIMIT 100;")
  }

  test("ex6: Sales department filter") {
    assert(sql("Find employees in the Sales department") ===
      "SELECT name, department FROM employees WHERE LOWER(department) LIKE '%sales%' ORDER BY name LIMIT 50;")
  }

  test("ex7: highest paid — 'paid' is not a salary keyword → default") {
    assert(sql("Show me the highest paid employees") ===
      "SELECT name FROM employees ORDER BY name LIMIT 20;")
  }

  test("ex8: count per department") {
    assert(sql("Count of employees in each department") ===
      "SELECT department, COUNT(*) as count FROM employees WHERE department IS NOT NULL GROUP BY department ORDER BY count DESC;")
  }

  test("ex9: joined in 2023 — date branch with hire_date ghost column") {
    val s = sql("Employees who joined in 2023")
    assert(s.startsWith("SELECT name, date_of_join FROM employees WHERE (date_of_join >= CURRENT_DATE"))
    assert(s.contains("hire_date"))
    assert(s.contains("ORDER BY COALESCE(date_of_join, hire_date) DESC LIMIT 50;"))
  }

  test("ex10: 'salaries' does not trip the salary flag") {
    assert(sql("Show me all employees with their salaries sorted by name") ===
      "SELECT name FROM employees ORDER BY name LIMIT 100;")
  }

  test("ex11: software engineers — no matching intent → default") {
    assert(sql("Find all software engineers") ===
      "SELECT name FROM employees ORDER BY name LIMIT 20;")
  }

  test("ex12: between range — fallback has no BETWEEN → default") {
    assert(sql("Show me employees earning between 40000 and 80000") ===
      "SELECT name FROM employees ORDER BY name LIMIT 20;")
  }

  test("ex13: more than 5 years — list-employees branch wins") {
    assert(sql("List employees who have been with company for more than 5 years") ===
      "SELECT name FROM employees ORDER BY name LIMIT 100;")
  }

  test("ex14: average salary by department — no known dept name → falls to default") {
    assert(sql("Show me the average salary by department") ===
      "SELECT name FROM employees ORDER BY name LIMIT 20;")
  }

  test("ex15: gmail — 'gmail' does not contain 'email' → default") {
    assert(sql("Find employees with Gmail addresses") ===
      "SELECT name FROM employees ORDER BY name LIMIT 20;")
  }

  // -- the 4 prompt example patterns (ai_query_generator.py:121-124) -------

  test("prompt p1: show all employees → names list") {
    assert(sql("Show me all employees") ===
      "SELECT name FROM employees ORDER BY name LIMIT 100;")
  }

  test("prompt p2: employees in IT department") {
    assert(sql("Employees in IT department") ===
      "SELECT name, department FROM employees WHERE LOWER(department) LIKE '%it%' ORDER BY name LIMIT 50;")
  }

  test("prompt p3: salary above 50000") {
    assert(sql("Employees with salary above 50000") ===
      "SELECT name, salary FROM employees WHERE salary > 50000 ORDER BY salary DESC LIMIT 50;")
  }

  test("prompt p4: recently joined without year hint falls through date branch") {
    // "Show me employees who joined recently": matches the date gate but has
    // neither "last year"/"2023" nor "this year"/"2024" → continues; no
    // later branch matches → default
    assert(sql("Show me employees who joined recently") ===
      "SELECT name FROM employees ORDER BY name LIMIT 20;")
  }

  // -- branch-order and flag quirks ----------------------------------------

  test("count without department → total_employees") {
    assert(sql("How many employees are there?") ===
      "SELECT COUNT(*) as total_employees FROM employees;")
  }

  test("count branch preempts department listing") {
    assert(sql("How many people in Sales department") ===
      "SELECT COUNT(*) as count FROM employees WHERE LOWER(department) LIKE '%sales%';")
  }

  test("details flag yields SELECT * via list branch skip") {
    // asking_for_details suppresses the list-all early return; with no other
    // match the default fires (reference behavior)
    assert(sql("Show me all employees with all details") ===
      "SELECT name FROM employees ORDER BY name LIMIT 20;")
  }

  test("department keyword without known dept falls through to default") {
    assert(sql("Who is in the legal department") ===
      "SELECT name FROM employees ORDER BY name LIMIT 20;")
  }

  test("first number wins in salary threshold") {
    assert(sql("salary more than 60000 or 70000") ===
      "SELECT name, salary FROM employees WHERE salary > 60000 ORDER BY salary DESC LIMIT 50;")
  }

  test("email search branch") {
    assert(sql("Show employee email addresses please") ===
      "SELECT name, email, department FROM employees WHERE email IS NOT NULL ORDER BY name LIMIT 100;")
  }

  test("position search branch") {
    assert(sql("What is everyone's job") ===
      "SELECT name, position, department FROM employees WHERE position IS NOT NULL ORDER BY name LIMIT 100;")
  }

  test("name search branch") {
    assert(sql("employees whose name contains smith") ===
      "SELECT name FROM employees WHERE name IS NOT NULL ORDER BY name LIMIT 100;")
  }

  test("compile never returns None (guaranteed fallback path)") {
    assert(NlCompiler.compile("anything at all").isDefined)
  }

  // -- LLM chain orchestration (ai_query_generator.py:128-176) --------------

  import graft.engine.{ChatClient, LlmChainCompiler, LlmCompiler}

  /** Deterministic fake: scripted per-model behavior, records call order. */
  private class FakeClient(script: Map[String, () => String]) extends ChatClient {
    val calls = scala.collection.mutable.ArrayBuffer.empty[String]
    override def complete(model: String, sys: String, user: String): String = {
      calls += model
      script(model)()
    }
  }

  test("llm chain: models tried in order; first transport failure falls through") {
    val fake = new FakeClient(Map(
      "m1" -> (() => throw new RuntimeException("503")),
      "m2" -> (() => "SELECT name FROM employees LIMIT 5"),
      "m3" -> (() => fail("m3 must never be reached"))))
    val out = new LlmChainCompiler(fake, Seq("m1", "m2", "m3")).compile("names")
    assert(out === Some("SELECT name FROM employees LIMIT 5;")) // ';' appended
    assert(fake.calls.toSeq === Seq("m1", "m2")) // order + short-circuit
  }

  test("llm chain: a hung model times out and the next model answers") {
    val fake = new FakeClient(Map(
      "slow" -> (() => { Thread.sleep(60000); "never" }),
      "fast" -> (() => "SELECT name FROM employees LIMIT 5;")))
    val out = new LlmChainCompiler(fake, Seq("slow", "fast"), timeoutMs = 200L)
      .compile("names")
    assert(out === Some("SELECT name FROM employees LIMIT 5;"))
    assert(fake.calls.toSeq === Seq("slow", "fast"))
  }

  test("llm chain: markdown fences are stripped from a successful answer") {
    val fake = new FakeClient(Map(
      "m1" -> (() => "```sql\nSELECT name FROM employees LIMIT 5\n```")))
    val out = new LlmChainCompiler(fake, Seq("m1")).compile("names")
    assert(out === Some("SELECT name FROM employees LIMIT 5;"))
  }

  test("llm chain: a malformed successful answer short-circuits to None (ref :165)") {
    // the reference returns _clean_sql_query(...) unconditionally on a 200,
    // so a rejected answer does NOT try the next model — the rule engine
    // takes over in the orchestrator instead
    val fake = new FakeClient(Map(
      "m1" -> (() => "DROP TABLE employees"),
      "m2" -> (() => fail("chain must not continue past a delivered answer"))))
    val out = new LlmChainCompiler(fake, Seq("m1", "m2")).compile("names")
    assert(out === None)
    assert(fake.calls.toSeq === Seq("m1"))
  }

  test("llm chain: all transports down → None → rule engine still answers") {
    val fake = new FakeClient(LlmCompiler.DefaultModels
      .map(m => m -> (() => throw new RuntimeException("down")): (String, () => String))
      .toMap)
    val llm = new LlmChainCompiler(fake)
    assert(llm.compile("How many employees work in the IT department?") === None)
    assert(fake.calls.toSeq === LlmCompiler.DefaultModels)
    // the same compiler chain QueryService runs: llm first, rules after
    val chained = Seq(llm, NlCompiler).view.flatMap(_.compile(
      "How many employees work in the IT department?")).headOption
    assert(chained ===
      Some("SELECT COUNT(*) as count FROM employees WHERE LOWER(department) LIKE '%it%';"))
  }
}
