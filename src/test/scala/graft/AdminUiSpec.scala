package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.engine.{AdminUi, HttpApi, QueryService, Tables}

/** The reference's schema-adaptive admin (`core/admin.py:34-341`): the
  * field-preference rules must adapt to DIFFERENT schemas, the display
  * helpers must format like the reference, and the mounted routes must
  * serve real HTML over HTTP.
  */
class AdminUiSpec extends SparkSuite {
  import spark.implicits._

  test("list display / filters / search adapt to the schema (admin.py rules)") {
    val canonical = Set("id", "name", "department", "salary", "date_of_join",
      "email", "position")
    assert(AdminUi.listDisplay(canonical) === Seq("id", "name_display",
      "department_display", "position_display", "salary_display", "date_display"))
    assert(AdminUi.listFilters(canonical) === Seq("department", "date_of_join"))
    assert(AdminUi.searchFields(canonical) ===
      Seq("name", "email", "department", "position"))

    // a different vendor schema chooses DIFFERENT slots through the
    // preference chains: first+last name, dept, job_title, hire_date, status
    val alt = Set("id", "first_name", "last_name", "dept", "job_title",
      "hire_date", "status")
    assert(AdminUi.listDisplay(alt) === Seq("id", "full_name_display",
      "department_display", "position_display", "date_display", "status_display"))
    assert(AdminUi.listFilters(alt) === Seq("dept", "hire_date", "status"))
    assert(AdminUi.searchFields(alt) === Seq("first_name", "last_name", "job_title"))
  }

  test("display helpers format like the reference across both schemas") {
    val alt = Seq((7L, "Ada", "Lovelace", "IT", "Engineer", "2021-03-04", "active"))
      .toDF("id", "first_name", "last_name", "dept", "job_title", "hire_date", "status")
    val fields = alt.schema.fieldNames.toSet
    val row = alt.head()
    assert(AdminUi.renderSlot("full_name_display", row, fields) === "Ada Lovelace")
    assert(AdminUi.renderSlot("department_display", row, fields) === "IT")
    assert(AdminUi.renderSlot("position_display", row, fields) === "Engineer")
    assert(AdminUi.renderSlot("date_display", row, fields) === "2021-03-04")
    assert(AdminUi.renderSlot("status_display", row, fields) === "active")

    val sal = Seq((1L, "Bo", 56789.5)).toDF("id", "name", "salary")
    assert(AdminUi.renderSlot("salary_display", sal.head(),
      sal.schema.fieldNames.toSet) === "$56,789.50")
  }

  test("admin routes serve schema-adaptive HTML with search, filter, paging") {
    Tables.registerEmployees(spark, sfDir)
    val service = new QueryService(spark)
    val server = HttpApi.start(service, port = 0)
    AdminUi.mount(server, () => Tables.employees(spark, sfDir), service.logger)
    val base = s"http://localhost:${server.getAddress.getPort}"
    val client = HttpClient.newHttpClient()
    def get(path: String): String = client.send(
      HttpRequest.newBuilder(URI.create(base + path)).GET().build(),
      HttpResponse.BodyHandlers.ofString()).body

    try {
      val page = get("/admin/employees/")
      assert(page.contains("<th>Name</th>") && page.contains("<th>Salary</th>"))
      assert(page.contains("$")) // money-formatted salary
      assert(page.contains("25 rows")) // list_per_page

      val filtered = get("/admin/employees/?filter=IT")
      assert(!filtered.contains("<td>Sales</td>"))

      // search is icontains over the adaptive search fields
      val searched = get("/admin/employees/?q=customer")
      assert(searched.contains("Customer") || searched.contains("customer"))

      // query log renders the processed queries newest-first
      service.process("How many employees work in the IT department?")
      val log = get("/admin/querylog/")
      assert(log.contains("How many employees work in the IT departmen"))
      assert(log.contains("Success"))
    } finally server.stop(0)
  }
}
