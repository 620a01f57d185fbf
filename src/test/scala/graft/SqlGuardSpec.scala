package graft

import graft.engine.SqlGuard

/** Guard invariants — the only machine-checked correctness property in the
  * reference (`core/ai_query_generator.py:283-313`); SURVEY.md §5 item 2.
  */
class SqlGuardSpec extends SparkSuite {

  test("accepts a plain select and appends semicolon") {
    assert(SqlGuard.clean("SELECT name FROM employees") ===
      Some("SELECT name FROM employees;"))
  }

  test("keeps an existing semicolon") {
    assert(SqlGuard.clean("SELECT name FROM employees;") ===
      Some("SELECT name FROM employees;"))
  }

  test("strips markdown fences (:289-291)") {
    assert(SqlGuard.clean("```sql\nSELECT name FROM employees\n```") ===
      Some("SELECT name FROM employees;"))
  }

  test("rejects non-SELECT (:297-298)") {
    assert(SqlGuard.clean("SHOW TABLES").isEmpty)
    assert(SqlGuard.clean("WITH x AS (SELECT 1) SELECT * FROM x, employees").isEmpty)
  }

  test("rejects every deny-listed keyword (:301-303)") {
    for (kw <- Seq("drop", "delete", "update", "insert", "alter", "create",
        "truncate", "grant", "revoke")) {
      assert(SqlGuard.clean(s"SELECT name FROM employees; $kw TABLE x").isEmpty,
        s"keyword $kw must be rejected")
    }
  }

  test("substring deny-list is intentionally coarse (reference parity)") {
    // a column literally named created_at trips the 'create' substring —
    // same false positive as the reference
    assert(SqlGuard.clean("SELECT created_at FROM employees").isEmpty)
  }

  test("rejects SQL not mentioning employees (:306-307)") {
    assert(SqlGuard.clean("SELECT * FROM users").isEmpty)
  }

  test("rejects null/empty") {
    assert(SqlGuard.clean(null).isEmpty)
    assert(SqlGuard.clean("").isEmpty)
  }

  test("validatePlan accepts read-only plans") {
    assert(SqlGuard.validatePlan(spark, "SELECT 1 AS x FROM employees;"))
  }

  test("validatePlan rejects commands and unparseable text") {
    assert(!SqlGuard.validatePlan(spark, "DROP TABLE employees"))
    assert(!SqlGuard.validatePlan(spark, "not sql at all"))
  }

  test("every compiler output passes the string gate") {
    for (q <- graft.engine.ApiSurface.examples) {
      val sql = graft.engine.NlCompiler.compileSql(q)
      assert(SqlGuard.clean(sql).isDefined, s"guard rejected compiler output for: $q")
    }
  }
}
