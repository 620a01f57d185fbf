package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.engine.{HttpApi, QueryService, Tables}

/** The reference's HTTP surface (`core/urls.py` + `core/views.py`), served
  * for real over the JDK HttpServer and driven with a real HTTP client:
  * route parity, status-code parity (200 envelopes for processed queries,
  * 400 for empty/invalid, 405 for wrong methods), and end-to-end NL→SQL→
  * Spark execution through POST /api/query/.
  */
class HttpApiSpec extends SparkSuite {

  private lazy val client = HttpClient.newHttpClient()

  private def post(base: String, path: String, body: String): HttpResponse[String] =
    client.send(
      HttpRequest.newBuilder(URI.create(base + path))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  private def get(base: String, path: String): HttpResponse[String] =
    client.send(
      HttpRequest.newBuilder(URI.create(base + path)).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  test("the four reference routes serve end-to-end over real HTTP") {
    Tables.registerEmployees(spark, sfDir)
    val server = HttpApi.start(new QueryService(spark), port = 0)
    val base = s"http://localhost:${server.getAddress.getPort}"
    try {
      // POST /api/query/ — NL → rule compiler → guard → spark.sql → JSON
      val ok = post(base, "/api/query/",
        """{"query": "How many employees work in the IT department?"}""")
      assert(ok.statusCode === 200)
      assert(ok.body.contains("\"success\":true"))
      assert(ok.body.contains("COUNT(*)"))
      assert(ok.body.contains("\"row_count\":1"))
      assert(ok.body.contains("\"cached\":false"))

      // second hit serves from the md5-keyed cache, like the reference
      val hit = post(base, "/api/query/",
        """{"query": "How many employees work in the IT department?"}""")
      assert(hit.statusCode === 200 && hit.body.contains("\"cached\":true"))

      // reference status-code parity
      assert(post(base, "/api/query/", """{"query": "   "}""").statusCode === 400)
      assert(post(base, "/api/query/", "not json at all").statusCode === 400)
      assert(get(base, "/api/query/").statusCode === 405)

      val ex = get(base, "/api/examples/")
      assert(ex.statusCode === 200)
      assert(ex.body.contains("Show me all employees in the company"))
      assert("\"(?:[^\"\\\\]|\\\\.)*\"".r.findAllIn(ex.body).size >= 15)

      val health = get(base, "/api/health/")
      assert(health.statusCode === 200 && health.body.contains("\"status\":\"healthy\""))

      val info = get(base, "/api/info/")
      assert(info.statusCode === 200)
      assert(info.body.contains("POST /api/query/"))
      assert(info.body.contains("supported_queries"))
    } finally server.stop(0)
  }

  test("extractQuery distinguishes invalid JSON from empty queries") {
    assert(HttpApi.extractQuery("plain text").isEmpty)
    assert(HttpApi.extractQuery("""{"other": 1}""") === Some(""))
    assert(HttpApi.extractQuery("""{"query": "hi"}""") === Some("hi"))
    assert(HttpApi.extractQuery("""{"query": "a \"quoted\" word"}""") ===
      Some("""a "quoted" word"""))
    assert(HttpApi.extractQuery("""{"query": "tab\tend"}""") === Some("tab\tend"))
    assert(HttpApi.extractQuery("""{"query": "ok \u0041"}""") === Some("ok A"))
    // a truncated \uXX escape must not throw
    assert(HttpApi.extractQuery("{\"query\": \"bad \\u12\"}").isDefined)
  }
}
