package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions._

import graft.engine.{NlCompiler, SqlGuard, Tables}

/** Live JDBC execution path — the reference's actual storage boundary
  * (reference `ai_query_generator.py:320-323` executes generated SQL on a
  * live PostgreSQL via Django's connection; `settings.py:77-86` holds the
  * DSN). The sandbox has no PostgreSQL, but Spark's JDBC datasource is
  * engine-agnostic: an embedded Derby database (shipped with Spark's own
  * jars) exercises the identical `spark.read.format("jdbc")` code path —
  * DriverManager handshake, schema inference from JDBC metadata,
  * predicate pushdown into the remote engine, partitioned parallel reads
  * — against a real external SQL engine.
  */
class JdbcSourceSpec extends SparkSuite {
  import spark.implicits._

  private def withDerby[T](f: String => T): T = {
    val dir = java.nio.file.Files.createTempDirectory("graft_derby")
    val url = s"jdbc:derby:${dir.resolve("db")};create=true"
    try f(url)
    finally {
      // embedded Derby shuts a database down via a sentinel exception
      try DriverManager.getConnection(s"jdbc:derby:${dir.resolve("db")};shutdown=true")
      catch { case _: java.sql.SQLException => () }
    }
  }

  /** Load the deterministic employees bridge rows into a Derby table. */
  private def seedEmployees(url: String): Long = {
    val rows = Tables.employees(spark, sfDir).collect()
    val conn = DriverManager.getConnection(url)
    try {
      conn.createStatement().execute(
        """CREATE TABLE employees (
          |  id BIGINT, name VARCHAR(64), department VARCHAR(32),
          |  salary DOUBLE, date_of_join DATE, email VARCHAR(128),
          |  position VARCHAR(64))""".stripMargin)
      val ps = conn.prepareStatement(
        "INSERT INTO employees VALUES (?, ?, ?, ?, ?, ?, ?)")
      rows.foreach { r =>
        ps.setLong(1, r.getLong(r.fieldIndex("id")))
        ps.setString(2, r.getString(r.fieldIndex("name")))
        ps.setString(3, r.getString(r.fieldIndex("department")))
        ps.setDouble(4, r.getDouble(r.fieldIndex("salary")))
        ps.setDate(5, r.getDate(r.fieldIndex("date_of_join")))
        ps.setString(6, r.getString(r.fieldIndex("email")))
        ps.setString(7, r.getString(r.fieldIndex("position")))
        ps.addBatch()
      }
      ps.executeBatch()
      rows.length.toLong
    } finally conn.close()
  }

  test("NL suite answers identically over a live JDBC employees table") {
    withDerby { url =>
      val n = seedEmployees(url)
      val jdbc = spark.read.format("jdbc")
        .option("url", url).option("dbtable", "employees").load()
      assert(jdbc.count() === n)
      try {
        // the reference's end-to-end lifecycle — NL → compiler → guard →
        // execute — with the JDBC relation standing in as `employees`,
        // exactly how the reference hits its live database
        val parquetView = Tables.employees(spark, sfDir)
        val questions = Seq(
          "How many employees work in the IT department?",
          "What is the average salary by department?",
          "Which employees have gmail addresses?",
          "How many employees are there in total?")
        questions.foreach { q =>
          val sql = SqlGuard.clean(NlCompiler.compileSql(q))
            .getOrElse(fail(s"guard rejected: $q")).stripSuffix(";")
          jdbc.createOrReplaceTempView("employees")
          val viaJdbc = spark.sql(sql).collect().toSeq
          parquetView.createOrReplaceTempView("employees")
          val viaParquet = spark.sql(sql).collect().toSeq
          assert(viaJdbc === viaParquet, s"JDBC/parquet divergence for: $q")
        }
      } finally spark.catalog.dropTempView("employees")
    }
  }

  test("filters and projections push into the JDBC engine") {
    withDerby { url =>
      seedEmployees(url)
      val jdbc = spark.read.format("jdbc")
        .option("url", url).option("dbtable", "employees").load()
      val q = jdbc.filter(col("salary") > 50000)
        .select("name", "salary")
      // pushed-down predicate and column pruning are visible in the scan
      // node (JDBCRelation advertises PushedFilters/ReadSchema)
      val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
      assert(scan.contains("PushedFilters") && scan.contains("SALARY"),
        s"expected pushed filter in JDBC scan, got: $scan")
      // and the pushed plan returns the same rows the local filter does
      val local = Tables.employees(spark, sfDir)
        .filter(col("salary") > 50000).select("name", "salary")
      assert(q.orderBy("name").collect().toSeq ===
        local.orderBy("name").collect().toSeq)
    }
  }

  test("partitioned parallel JDBC read covers every row exactly once") {
    withDerby { url =>
      val n = seedEmployees(url)
      // the cluster-scale read shape: numPartitions concurrent range
      // queries against the remote engine, one per executor slot
      val parts = spark.read.format("jdbc")
        .option("url", url).option("dbtable", "employees")
        .option("partitionColumn", "id")
        .option("lowerBound", "1").option("upperBound", n.toString)
        .option("numPartitions", "4")
        .load()
      assert(parts.rdd.getNumPartitions === 4)
      assert(parts.count() === n)
      assert(parts.select(countDistinct("id")).as[Long].head() === n)
    }
  }
}
