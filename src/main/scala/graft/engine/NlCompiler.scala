package graft.engine

/** Pluggable NL→SQL compiler surface (reference
  * `core/ai_query_generator.py:379-393`): an optional LLM path is tried
  * first, then the deterministic rule-based fallback — which in the
  * reference is the guaranteed path whenever no API key is configured
  * (`ai_query_generator.py:130-131`), and in this zero-egress build is the
  * only live path.
  */
trait NlToSql {
  /** Return Some(sql) on success, None to fall through to the next compiler. */
  def compile(userQuery: String): Option[String]
}

/** One chat completion — the injectable transport seam of the LLM path.
  * A production client would POST to a chat-completions API; tests inject
  * deterministic fakes. Implementations return the RAW model text (fences
  * and all) and throw on transport failure.
  */
trait ChatClient {
  def complete(model: String, systemPrompt: String, userQuery: String): String
}

/** The reference's 3-model fallback orchestration (`_query_openrouter`,
  * `ai_query_generator.py:128-176`), transport-agnostic:
  *
  *   - models are tried IN ORDER; a transport error or timeout on one
  *     model falls through to the next (`:172-174` catches and continues);
  *   - a SUCCESSFUL completion short-circuits the chain with the cleaned
  *     text — even when cleaning rejects it (`:165` returns
  *     `_clean_sql_query(...)` unconditionally, so a malformed answer
  *     yields None overall rather than trying the next model; the rule
  *     engine then takes over in the orchestrator, `:390-393`). Preserved
  *     bug-for-bug;
  *   - cleaning strips markdown fences and applies the string gate
  *     ([[SqlGuard.clean]] = `_clean_sql_query`, `:283-313`);
  *   - each call is bounded by `timeoutMs` (the reference's
  *     `requests.post(..., timeout=30)`).
  */
final class LlmChainCompiler(
    client: ChatClient,
    models: Seq[String] = LlmCompiler.DefaultModels,
    timeoutMs: Long = 30000L) extends NlToSql {
  import scala.concurrent.{Await, Future, TimeoutException}
  import scala.concurrent.duration.DurationLong
  import scala.concurrent.ExecutionContext.Implicits.global

  override def compile(userQuery: String): Option[String] = {
    val it = models.iterator
    while (it.hasNext) {
      val model = it.next()
      try {
        val raw = Await.result(
          Future(client.complete(model, LlmCompiler.SystemPrompt, userQuery)),
          timeoutMs.millis)
        return SqlGuard.clean(raw) // success short-circuits, clean or not
      } catch {
        case _: TimeoutException          => () // next model
        case scala.util.control.NonFatal(_) => () // next model
      }
    }
    None
  }
}

/** Default LLM path for this zero-egress build: no API key → no client →
  * always fall through to the rule engine, exactly like the reference
  * without `OPENROUTER_API_KEY` (`ai_query_generator.py:130-131`). The
  * live orchestration shape is [[LlmChainCompiler]] with an injected
  * [[ChatClient]].
  */
object LlmCompiler extends NlToSql {
  /** The reference's free-tier chain (`ai_query_generator.py:138-142`). */
  val DefaultModels: Seq[String] = Seq(
    "meta-llama/llama-3.1-8b-instruct:free",
    "microsoft/phi-3-mini-128k-instruct:free",
    "google/gemma-7b-it:free")

  /** Condensed from `_create_system_prompt` (`ai_query_generator.py:60-108`):
    * the operative instructions; the full reference text adds schema
    * examples the deterministic fakes never read.
    */
  val SystemPrompt: String =
    """You are a SQL expert. Convert natural language to a single SELECT
      |query over the existing `employees` table. SELECT-only; limit
      |results; respond with ONLY the SQL query, no explanations or
      |formatting.""".stripMargin

  override def compile(userQuery: String): Option[String] = None
}

/** Deterministic rule-based NL→SQL compiler — a 1:1 behavioral port of the
  * reference's `_query_fallback_local` (`core/ai_query_generator.py:178-281`),
  * including its order-dependent branches and dead conditions (SURVEY.md
  * §7.4). Pure function of the input string; no Spark dependency.
  */
object NlCompiler extends NlToSql {

  private val departments =
    Seq("IT", "HR", "Sales", "Marketing", "Finance", "Engineering", "Operations")

  private def anyIn(q: String, words: Seq[String]): Boolean =
    words.exists(q.contains)

  /** Port of `ai_query_generator.py:178-281`. Always returns SQL (the
    * reference's fallback never returns None).
    */
  def compileSql(userQuery: String): String = {
    val q = userQuery.toLowerCase

    // Intent flags (:183-188)
    val askingForSalary   = anyIn(q, Seq("salary", "pay", "wage", "earning", "income"))
    val askingForDept     = anyIn(q, Seq("department", "dept"))
    val askingForPosition = anyIn(q, Seq("position", "job", "title", "role"))
    val askingForDate     = anyIn(q, Seq("joined", "hired", "date", "when"))
    val askingForDetails  = anyIn(q, Seq("details", "information", "everything", "all details"))
    val askingForCount    = anyIn(q, Seq("count", "how many", "number of"))

    // Column selection (:190-214)
    var columns = Vector("name")
    if ((askingForDept || q.contains("department")) && !columns.contains("department"))
      columns :+= "department"
    if (askingForSalary && !columns.contains("salary"))
      columns :+= "salary"
    if (askingForPosition && !columns.contains("position"))
      columns :+= "position"
    if (askingForDate && !columns.contains("date_of_join"))
      columns :+= "date_of_join"

    var selectClause =
      if (askingForDetails) "*"
      else if (askingForCount) "COUNT(*) as count"
      else columns.mkString(", ")

    // Count queries (:217-226)
    if (askingForCount) {
      if (q.contains("department")) {
        departments.find(d => q.contains(d.toLowerCase)) match {
          case Some(dept) =>
            return s"SELECT COUNT(*) as count FROM employees WHERE LOWER(department) LIKE '%${dept.toLowerCase}%';"
          case None =>
            return "SELECT department, COUNT(*) as count FROM employees WHERE department IS NOT NULL GROUP BY department ORDER BY count DESC;"
        }
      } else {
        return "SELECT COUNT(*) as total_employees FROM employees;"
      }
    }

    // Get all employees — names only (:229-230)
    if (anyIn(q, Seq("all employees", "show employees", "list employees")) && !askingForDetails)
      return s"SELECT $selectClause FROM employees ORDER BY name LIMIT 100;"

    // Department queries (:233-237)
    if (q.contains("department")) {
      departments.find(d => q.contains(d.toLowerCase)).foreach { dept =>
        return s"SELECT $selectClause FROM employees WHERE LOWER(department) LIKE '%${dept.toLowerCase}%' ORDER BY name LIMIT 50;"
      }
    }

    // Salary threshold queries (:240-246)
    if (askingForSalary && anyIn(q, Seq("greater", "more than", "above", "over"))) {
      val numbers = "\\d+".r.findAllIn(q).toList
      numbers.headOption.foreach { amount =>
        // Dead branch in the reference (:244-245): inside this guard
        // askingForSalary is always true — preserved for behavioral parity.
        if (!askingForSalary) selectClause = "name, salary, department"
        return s"SELECT $selectClause FROM employees WHERE salary > $amount ORDER BY salary DESC LIMIT 50;"
      }
    }

    // Recent hires / date queries (:249-266)
    if (anyIn(q, Seq("joined", "hired", "recent", "new"))) {
      if (!askingForDate) selectClause = "name, department, date_of_join"
      if (q.contains("last year") || q.contains("2023")) {
        // NB: references `hire_date`, a column the reference's own table does
        // not have (`core/models.py:13-19`) — execution fails there too;
        // preserved for parity (SURVEY.md §7.4).
        return s"SELECT $selectClause FROM employees WHERE (date_of_join >= CURRENT_DATE - INTERVAL '1' YEAR OR hire_date >= CURRENT_DATE - INTERVAL '1' YEAR) ORDER BY COALESCE(date_of_join, hire_date) DESC LIMIT 50;"
      } else if (q.contains("this year") || q.contains("2024")) {
        return s"SELECT $selectClause FROM employees WHERE (EXTRACT(YEAR FROM date_of_join) = EXTRACT(YEAR FROM CURRENT_DATE) OR EXTRACT(YEAR FROM hire_date) = EXTRACT(YEAR FROM CURRENT_DATE)) ORDER BY COALESCE(date_of_join, hire_date) DESC LIMIT 50;"
      }
    }

    // Name searches (:269-270)
    if (q.contains("name") && anyIn(q, Seq("contains", "like", "starts", "ends")))
      return "SELECT name FROM employees WHERE name IS NOT NULL ORDER BY name LIMIT 100;"

    // Email searches (:273-274)
    if (q.contains("email"))
      return "SELECT name, email, department FROM employees WHERE email IS NOT NULL ORDER BY name LIMIT 100;"

    // Position/title searches (:277-278)
    if (askingForPosition)
      return "SELECT name, position, department FROM employees WHERE position IS NOT NULL ORDER BY name LIMIT 100;"

    // Default (:281)
    "SELECT name FROM employees ORDER BY name LIMIT 20;"
  }

  override def compile(userQuery: String): Option[String] = Some(compileSql(userQuery))
}
