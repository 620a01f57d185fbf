package graft

import graft.engine.{QueryService, Tables}

/** End-to-end pipeline parity (reference lifecycle §3.1): compile → guard →
  * execute → serialize → log → cache, including error envelopes and the
  * cached:true marker on repeat queries.
  */
class QueryServiceSpec extends SparkSuite {

  private lazy val service: QueryService = {
    Tables.registerEmployees(spark, sfDir)
    new QueryService(spark)
  }

  test("count query end-to-end: success envelope with one stringified count row") {
    val r = service.process("How many employees are there?")
    assert(r.success)
    assert(r.sqlQuery === Some("SELECT COUNT(*) as total_employees FROM employees;"))
    assert(r.rowCount === 1)
    assert(r.columns === Seq("total_employees"))
    // non-salary numerics are stringified (reference :339-340)
    assert(r.data.head("total_employees") === "150")
    assert(!r.cached)
  }

  test("repeat query marks cached:true and skips recompute") {
    service.cache.clear()
    val r1 = service.process("Show me all employees in the company")
    val r2 = service.process("Show me all employees in the company")
    assert(!r1.cached && r2.cached)
    assert(r1.data === r2.data)
  }

  test("salary values come back rounded numeric (reference :335-336)") {
    val r = service.process("Employees with salary above 50000")
    assert(r.success)
    assert(r.data.nonEmpty)
    assert(r.data.head("salary").isInstanceOf[Double])
  }

  test("empty query → error envelope, not an exception") {
    val r = service.process("   ")
    assert(!r.success && r.error === Some("Query cannot be empty"))
  }

  test("failed execution is logged with success=false (ghost hire_date column)") {
    service.logger.clear()
    val r = service.process("Employees who joined in 2023")
    assert(!r.success) // hire_date doesn't exist — reference fails here too
    val logs = service.logger.entries
    assert(logs.nonEmpty && !logs.head.success)
    assert(logs.head.generatedSql.contains("hire_date"))
  }

  test("every processed query appends exactly one log row") {
    service.logger.clear()
    service.cache.clear()
    service.process("How many employees are there?")
    service.process("Find employees in the Sales department")
    assert(service.logger.entries.size === 2)
    val df = service.logger.toDf(spark)
    assert(df.count() === 2)
    assert(df.columns.contains("executionTime"))
  }

  test("response serializes to valid-shaped JSON") {
    val r = service.process("How many employees are there?")
    val js = r.toJson
    assert(js.startsWith("{\"success\":true"))
    assert(js.contains("\"row_count\":1"))
  }

  test("entry() flagship returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
