package graft.engine

import org.apache.spark.sql.SparkSession

/** Response envelope — shape of the reference's JSON response
  * (`core/ai_query_generator.py:410-417`, `core/views.py:32,48`).
  */
case class QueryResponse(
    success: Boolean,
    originalQuery: String,
    sqlQuery: Option[String],
    data: Seq[Map[String, Any]],
    columns: Seq[String],
    rowCount: Int,
    error: Option[String] = None,
    cached: Boolean = false) {

  def toJson: String = {
    val fields = Seq(
      "success" -> success,
      "original_query" -> originalQuery,
      "sql_query" -> sqlQuery.orNull,
      "data" -> data.map(m => m: Any),
      "columns" -> columns.map(c => c: Any),
      "row_count" -> rowCount) ++
      error.map("error" -> _).toSeq :+ ("cached" -> cached)
    fields.map { case (k, v) =>
      s"${Serializer.jsonEscape(k)}:${Serializer.toJsonValue(v)}"
    }.mkString("{", ",", "}")
  }
}

/** End-to-end NL-query orchestrator — the Spark-native equivalent of the
  * reference pipeline (`process_natural_language_query`,
  * `core/ai_query_generator.py:379-445` + `core/views.py:14-63`):
  * cache probe → compile (LLM stub → rule fallback) → guard → `spark.sql`
  * → serialize → log → cache fill. Catalyst replaces PostgreSQL as the
  * relational executor (SURVEY.md §3.1); everything else is a straight port.
  */
class QueryService(
    spark: SparkSession,
    compilers: Seq[NlToSql] = Seq(LlmCompiler, NlCompiler),
    val logger: QueryLogger = new QueryLogger(),
    val cache: QueryCache[QueryResponse] = new QueryCache[QueryResponse]()) {

  def process(userQuery: String): QueryResponse = {
    val trimmed = Option(userQuery).getOrElse("").trim
    if (trimmed.isEmpty)
      return QueryResponse(success = false, trimmed, None, Nil, Nil, 0,
        error = Some("Query cannot be empty"))

    cache.get(trimmed) match {
      case Some(hit) => return hit.copy(cached = true)
      case None =>
    }

    val start = System.nanoTime()
    val sqlOpt = compilers.view.flatMap(_.compile(trimmed)).headOption
      .flatMap(SqlGuard.clean)

    sqlOpt match {
      case None =>
        val resp = QueryResponse(success = false, trimmed, None, Nil, Nil, 0,
          error = Some("Failed to generate SQL query from all available methods"))
        logger.log(trimmed, "", success = false, resp.error.get, elapsed(start), 0)
        resp
      case Some(sql) =>
        val resp =
          try {
            val df = spark.sql(sql.stripSuffix(";"))
            val (data, columns) = Serializer.toData(df)
            QueryResponse(success = true, trimmed, Some(sql), data, columns, data.size)
          } catch {
            case e: Exception =>
              QueryResponse(success = false, trimmed, Some(sql), Nil, Nil, 0,
                error = Some(e.getMessage))
          }
        logger.log(trimmed, sql, resp.success, resp.error.getOrElse(""),
          elapsed(start), resp.rowCount)
        if (resp.success) cache.put(trimmed, resp)
        resp
    }
  }

  private def elapsed(startNanos: Long): Double =
    (System.nanoTime() - startNanos) / 1e9
}

/** Static API metadata — the reference's examples/health/info endpoints
  * (`core/views.py:65-121`). The 15 examples double as the NL-compiler
  * acceptance corpus (SURVEY.md §5).
  */
object ApiSurface {
  val examples: Seq[String] = Seq(
    "Show me all employees in the company",
    "Give me the list of all employees who joined last year",
    "How many employees work in the IT department?",
    "Show me employees with salary greater than 50000",
    "List all employees who joined this year",
    "Find employees in the Sales department",
    "Show me the highest paid employees",
    "Count of employees in each department",
    "Employees who joined in 2023",
    "Show me all employees with their salaries sorted by name",
    "Find all software engineers",
    "Show me employees earning between 40000 and 80000",
    "List employees who have been with company for more than 5 years",
    "Show me the average salary by department",
    "Find employees with Gmail addresses")

  val health: Map[String, String] = Map(
    "status" -> "healthy",
    "service" -> "DataFabric AI Employee Query Backend",
    "version" -> "1.0.0")

  val supportedQueries: Seq[String] = Seq(
    "Employee listings and filtering",
    "Department-based queries",
    "Salary-based filtering",
    "Date-based filtering (joining dates)",
    "Aggregation queries (count, average)",
    "Sorting and limiting results")
}
