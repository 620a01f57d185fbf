package graft.engine

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Read-only schema-adaptive admin UI — the reference's Django admin
  * (`core/admin.py:34-341`) as pure functions over an arbitrary
  * DataFrame schema plus two HTML routes on the [[HttpApi]] server.
  *
  * The adaptivity rules are ported decision-for-decision: list columns
  * prefer `name` over `first_name`+`last_name` over `full_name`
  * (`:42-48`), `department` over `dept` (`:50-54`), `position` over
  * `job_title` (`:56-60`), and so on; filters and search fields follow
  * `:80-120`. Display formatting mirrors the helpers at `:189-265`
  * (money-formatted salary, ISO date, Active/Inactive status), and the
  * query-log view mirrors `QueryLogAdmin` (`:280-341`): newest-first,
  * 50-char truncated query, success/cache markers.
  *
  * Read-only by construction, like `has_add/delete/change_permission`
  * returning False (`:267-277`).
  */
object AdminUi {

  /** `get_list_display` (`admin.py:34-78`): display slots chosen from the
    * available fields, in the reference's order.
    */
  def listDisplay(fields: Set[String]): Seq[String] = {
    val out = Seq.newBuilder[String]
    if (fields("id")) out += "id"
    if (fields("name")) out += "name_display"
    else if (fields("first_name") && fields("last_name")) out += "full_name_display"
    else if (fields("full_name")) out += "full_name_display"
    if (fields("department") || fields("dept")) out += "department_display"
    if (fields("position") || fields("job_title")) out += "position_display"
    if (fields("salary")) out += "salary_display"
    if (fields("date_of_join") || fields("hire_date")) out += "date_display"
    if (fields("is_active") || fields("status")) out += "status_display"
    out.result()
  }

  /** `get_list_filter` (`admin.py:80-99`). */
  def listFilters(fields: Set[String]): Seq[String] = {
    val out = Seq.newBuilder[String]
    if (fields("department")) out += "department"
    else if (fields("dept")) out += "dept"
    if (fields("date_of_join")) out += "date_of_join"
    else if (fields("hire_date")) out += "hire_date"
    if (fields("is_active")) out += "is_active"
    else if (fields("status")) out += "status"
    out.result()
  }

  /** `get_search_fields` (`admin.py:101-120`). */
  def searchFields(fields: Set[String]): Seq[String] =
    Seq("name", "first_name", "last_name", "email", "department",
      "position", "job_title").filter(fields)

  // -- display helpers (admin.py:189-265) -----------------------------------

  private def str(row: Row, f: String): Option[String] = {
    val i = row.fieldIndex(f)
    if (row.isNullAt(i)) None else Some(row.get(i).toString)
  }

  def renderSlot(slot: String, row: Row, fields: Set[String]): String = slot match {
    case "id" => str(row, "id").getOrElse("-")
    case "name_display" | "full_name_display" =>
      if (fields("name")) str(row, "name").getOrElse(fallbackName(row))
      else if (fields("first_name") && fields("last_name"))
        s"${str(row, "first_name").getOrElse("")} ${str(row, "last_name").getOrElse("")}".trim
      else if (fields("full_name")) str(row, "full_name").getOrElse(fallbackName(row))
      else fallbackName(row)
    case "department_display" =>
      str(row, if (fields("department")) "department" else "dept").getOrElse("-")
    case "position_display" =>
      str(row, if (fields("position")) "position" else "job_title").getOrElse("-")
    case "salary_display" =>
      str(row, "salary").map(s => f"$$${s.toDouble}%,.2f").getOrElse("-")
    case "date_display" =>
      str(row, if (fields("date_of_join")) "date_of_join" else "hire_date")
        .map(_.take(10)).getOrElse("-")
    case "status_display" =>
      if (fields("is_active"))
        if (str(row, "is_active").contains("true")) "Active" else "Inactive"
      else str(row, "status").getOrElse("-")
    case other => str(row, other).getOrElse("-")
  }

  private def fallbackName(row: Row): String =
    s"Employee ${str(row, "id").getOrElse("?")}"

  /** Column header labels (the `short_description`s). */
  def slotLabel(slot: String): String = slot match {
    case "id" => "ID"
    case "name_display" => "Name"
    case "full_name_display" => "Full Name"
    case "department_display" => "Department"
    case "position_display" => "Position"
    case "salary_display" => "Salary"
    case "date_display" => "Join Date"
    case "status_display" => "Status"
    case other => other
  }

  private def htmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** One admin list page over ANY frame with the reference's semantics:
    * icontains-OR search over the adaptive search fields, equality filter
    * on the first adaptive filter field, `ORDER BY id`, 25 rows per page.
    */
  def employeesPage(
      df: DataFrame,
      q: Option[String],
      filterValue: Option[String],
      page: Int,
      perPage: Int = 25): String = {
    val fields = df.schema.fieldNames.toSet
    val slots = listDisplay(fields)
    val search = searchFields(fields)
    val filters = listFilters(fields)
    var cur = df
    q.filter(_.nonEmpty).foreach { term =>
      val like = search.map(f => lower(col(f)).contains(term.toLowerCase))
      if (like.nonEmpty) cur = cur.filter(like.reduce(_ || _))
    }
    filterValue.filter(_.nonEmpty).foreach { v =>
      filters.headOption.foreach(f => cur = cur.filter(col(f) === v))
    }
    val ordered = if (fields("id")) cur.orderBy("id") else cur
    val rows = ordered.limit((page + 1) * perPage).collect().drop(page * perPage)
    val header = slots.map(s => s"<th>${slotLabel(s)}</th>").mkString
    val body = rows.map { r =>
      slots.map(s => s"<td>${htmlEscape(renderSlot(s, r, fields))}</td>")
        .mkString("<tr>", "", "</tr>")
    }.mkString
    s"""<html><body><h1>Employees</h1>
       |<table border="1"><tr>$header</tr>$body</table>
       |<p>page $page · ${rows.length} rows</p></body></html>""".stripMargin
  }

  /** The query-log list (`QueryLogAdmin`, `admin.py:280-341`):
    * newest-first, truncated query, success/cache markers.
    */
  def queryLogPage(logger: QueryLogger, limit: Int = 50): String = {
    val body = logger.entries.take(limit).map { e =>
      val trunc = if (e.originalQuery.length > 50)
        e.originalQuery.take(50) + "..." else e.originalQuery
      val ok = if (e.success) "Success" else "Failed"
      val cache = if (e.cached) "Cached" else "Fresh"
      s"<tr><td>${htmlEscape(trunc)}</td><td>$ok</td><td>${e.resultCount}</td>" +
        f"<td>${e.executionTime}%.3fs</td><td>$cache</td><td>${e.timestamp}</td></tr>"
    }.mkString
    s"""<html><body><h1>Query Log</h1>
       |<table border="1"><tr><th>Query</th><th>Status</th><th>Results</th>
       |<th>Time</th><th>Cache</th><th>Timestamp</th></tr>$body</table>
       |</body></html>""".stripMargin
  }

  /** Mount `/admin/employees/` and `/admin/querylog/` on a running
    * [[HttpApi]] server. `employees` is re-read per request (live view).
    */
  def mount(server: HttpServer, employees: () => DataFrame,
      logger: QueryLogger): Unit = {
    def param(ex: HttpExchange, name: String): Option[String] =
      Option(ex.getRequestURI.getQuery).flatMap(_.split("&").collectFirst {
        case kv if kv.startsWith(name + "=") =>
          java.net.URLDecoder.decode(kv.drop(name.length + 1), "UTF-8")
      })
    def respondHtml(ex: HttpExchange, html: String): Unit = {
      val bytes = html.getBytes("UTF-8")
      ex.getResponseHeaders.add("Content-Type", "text/html; charset=utf-8")
      ex.sendResponseHeaders(200, bytes.length)
      val os = ex.getResponseBody
      try os.write(bytes) finally os.close()
    }
    server.createContext("/admin/employees/", (ex: HttpExchange) =>
      respondHtml(ex, employeesPage(
        employees(), param(ex, "q"), param(ex, "filter"),
        param(ex, "page").map(_.toInt).getOrElse(0))))
    server.createContext("/admin/querylog/", (ex: HttpExchange) =>
      respondHtml(ex, queryLogPage(logger)))
  }
}
