package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.engine.{NlCompiler, Tables}
import graft.functions.VectorFunctions
import graft.operators.{Dedup, Scale, Similarity, TextAnalysis}

/** Driver contract (SURVEY.md §7): one named query per operator in the
  * SURVEY.md §2 inventory, with matching DuckDB oracle SQL where the
  * semantics are ANSI-expressible. Every oracle-compared query carries a
  * total deterministic ORDER BY (unique tie-break) and rounds every
  * floating aggregate, so Spark and DuckDB agree bit-for-bit (SURVEY.md §5).
  */
object SparkEntry {

  /** Flagship: the reference's primary pipeline shape end-to-end — NL →
    * rule compiler → guard → Catalyst — on sf0.001 (SURVEY.md §7.3).
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    Tables.registerEmployees(spark, dir)
    val sql = NlCompiler.compileSql("How many employees work in the IT department?")
    spark.sql(sql.stripSuffix(";"))
  }

  // -- plumbing -------------------------------------------------------------

  private case class Q(
      name: String,
      run: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def emp(s: SparkSession, dir: String): DataFrame =
    Tables.employees(s, dir)

  private def cte(body: String): Option[String] =
    Some(Tables.withEmployeesCte(body))

  // -- shared-intermediate memo -------------------------------------------
  // Several registry queries consume the SAME expensive intermediate: one
  // range sort of l_extendedprice feeds the whole order-statistics family,
  // one co-purchase pair index feeds four graph queries, one shingle
  // posting aggregation feeds two near-dup passes. Within a Verify/Bench
  // run every query executes in one SparkSession over one fixture dir, so
  // those builds are memoized per (session, dir, key) and persisted: the
  // first consumer pays the build, its siblings reuse it — the same
  // shared-layout behavior a production deployment gets from a
  // materialized view, and at 100 TB the difference between scanning a
  // fact table once or N times. Tests calling operators directly are
  // unaffected; entries die with the session (bounded: one per key/dir).
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(Int, String, String), AnyRef]()

  // NOT computeIfAbsent: several builders are NESTED (dupClusterLabels
  // builds on shinglePairIndex, coPurchasePairs on orderPartPairs), and
  // a computeIfAbsent whose lambda re-enters the same ConcurrentHashMap
  // throws IllegalStateException("Recursive update") whenever the two
  // keys happen to share a bin — a JVM-layout-dependent flake. Plain
  // get/putIfAbsent tolerates re-entry; queries run sequentially in
  // Verify/Bench, so the lost atomicity only risks a redundant build.
  /** Drop every shared-intermediate memo entry (callers also
    * `spark.catalog.clearCache()` to release the persisted blocks).
    * Used by Bench's isolate mode so each probe query rebuilds its own
    * shared state; consumers simply re-memoize on next use.
    */
  def clearSharedState(): Unit = memo.clear()

  private def memoized[T <: AnyRef](s: SparkSession, d: String, key: String)(
      build: => T): T = {
    val k = (System.identityHashCode(s), d, key)
    val existing = memo.get(k)
    if (existing != null) existing.asInstanceOf[T]
    else {
      val built = build.asInstanceOf[AnyRef]
      val prior = memo.putIfAbsent(k, built)
      (if (prior != null) prior else built).asInstanceOf[T]
    }
  }

  private def memoizedDf(s: SparkSession, d: String, key: String)(
      build: => DataFrame): DataFrame =
    memoized(s, d, key)(build.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** One distributed range sort of lineitem.l_extendedprice (unique
    * tie-break) shared by exact percentiles, winsorization cuts and the
    * equi-depth histogram — three order-statistics consumers, one sort.
    */
  private def rankedExtPrice(s: SparkSession, d: String): Scale.RankedValues =
    memoized(s, d, "ranked_l_extendedprice") {
      Scale.rankValues(
        t(s, d, "lineitem")
          .select("l_extendedprice", "l_orderkey", "l_linenumber"),
        "l_extendedprice", Seq("l_orderkey", "l_linenumber"))
    }

  /** Distinct (l_orderkey, l_partkey) — the base relation every
    * market-basket / co-purchase query starts from. One distinct shuffle
    * of lineitem, shared by eight queries.
    */
  private def orderPartPairs(s: SparkSession, d: String): DataFrame =
    memoizedDf(s, d, "order_part_pairs") {
      t(s, d, "lineitem").select("l_orderkey", "l_partkey").distinct()
    }

  /** Canonical co-purchase pair index over parts: (src < dst, n = co-order
    * count), deduplicated and self-loop-free by construction — the ONE
    * edge layout the whole graph family (triangles, k-core, Adamic–Adar,
    * item recs, basket counts, lift rules) reads, instead of each query
    * re-deriving the same order-keyed self-join + aggregation. At 100 TB
    * this is the materialized edge-list layout a production graph store
    * maintains; here it is built by the first consumer and persisted for
    * the session.
    */
  private def coPurchasePairs(s: SparkSession, d: String): DataFrame =
    memoizedDf(s, d, "copurchase_pairs") {
      val op = orderPartPairs(s, d)
      op.select(col("l_orderkey"), col("l_partkey").as("src"))
        .join(op.select(col("l_orderkey").as("k2"), col("l_partkey").as("dst")),
          col("l_orderkey") === col("k2") && col("src") < col("dst"))
        .groupBy("src", "dst").agg(count(lit(1)).as("n"))
    }

  /** Per-edge triangle support over the n≥2 co-purchase graph — ONE
    * degree-oriented wedge enumeration ([[graft.operators.Graph
    * .edgeSupport]]) shared by the support histogram, the
    * neighborhood-Jaccard ranking and any truss-style consumer, instead
    * of each query re-running the wedge join.
    */
  private def coPurchaseEdgeSupport(s: SparkSession, d: String): DataFrame =
    memoizedDf(s, d, "copurchase_edge_support") {
      graft.operators.Graph.edgeSupport(
        coPurchasePairs(s, d).filter(col("n") >= 2).select("src", "dst"),
        canonicalEdges = true)
    }

  /** Distinct (customer, supplier) purchase edges from orders⋈lineitem —
    * the bipartite base graph for PageRank / label propagation / BFS;
    * each query projects its own id encoding (string-prefixed or
    * even/odd longs) off this one persisted join.
    */
  private def custSuppEdges(s: SparkSession, d: String): DataFrame =
    memoizedDf(s, d, "cust_supp_edges") {
      t(s, d, "orders")
        .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("ck"), col("l_suppkey").as("sk"))
        .distinct()
    }

  /** Shared shingle-pair index over documents (blocked by source, k=3):
    * (id_a, id_b, nsh_a, nsh_b, common) for every pair sharing a
    * shingle. doc_ngram_jaccard and doc_containment_pairs are both pure
    * arithmetic over this one build — the posting explode + pair
    * aggregation is the entire cost of either query.
    */
  private def shinglePairIndex(s: SparkSession, d: String): DataFrame =
    memoizedDf(s, d, "shingle_pair_counts") {
      Dedup.shinglePairCounts(t(s, d, "documents"), "source")
    }

  /** Near-dup cluster labels (id, cluster_id) at the dedup family's
    * working threshold (Jaccard ≥ 0.02 over the shared shingle-pair
    * index): cluster listing, size histogram, keep-best and the
    * leakage-safe split all consume these SAME labels — the iterative
    * connected-components build runs once per session/fixture.
    */
  private def dupClusterLabels(s: SparkSession, d: String): DataFrame =
    memoizedDf(s, d, "dup_cluster_labels_002") {
      Dedup.connectedComponents(
        Dedup.ngramJaccardOf(shinglePairIndex(s, d), threshold = 0.02))
    }

  /** Shared portable-minhash signature relation (id, sh, sig) — the
    * near-dup pairing, the estimator calibration, and the band-geometry
    * sweep all ride this ONE signature scan of the corpus.
    */
  private def minhashSigs(s: SparkSession, d: String): DataFrame =
    memoizedDf(s, d, "minhash_sig_portable_64") {
      Dedup.minhashPortableSigs(t(s, d, "documents"))
    }

  /** The trained 3-round BPE merge table — doc_bpe_train reports it and
    * doc_bpe_encode applies it; one iterative training run serves both.
    */
  private def bpeMerges(s: SparkSession, d: String)
      : Seq[graft.operators.TextAnalysis.BpeMerge] =
    memoized(s, d, "bpe_merges_r3") {
      graft.operators.TextAnalysis.bpeTrain(t(s, d, "documents"), rounds = 3)
    }

  /** Logistic-regression family (doc_logreg_*): the feature frame
    * (is-English from length + space/vowel ratios), a memoized 6-round
    * GD fit shared by the report and calibration queries (one training
    * run per session/fixture — model state is 4 doubles), and the
    * oracle-side training chain both oracles splice.
    */
  private val logregCols = Seq("x_len", "x_space", "x_vowel")

  private def logregFeatures(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents").select(
      col("doc_id"),
      (col("n_chars").cast("double") / 1000.0).as("x_len"),
      ((length(col("text")) - length(regexp_replace(col("text"), " ", "")))
        .cast("double") / length(col("text"))).as("x_space"),
      ((length(col("text"))
        - length(regexp_replace(col("text"), "[aeiou]", "")))
        .cast("double") / length(col("text"))).as("x_vowel"),
      when(col("lang") === "en", 1.0).otherwise(0.0).as("y"))

  private def logregFit(s: SparkSession, d: String): (Array[Double], DataFrame) =
    memoized(s, d, "logreg_langid_fit_6r") {
      graft.operators.Learn.logisticGd(logregFeatures(s, d), logregCols,
        "y", iters = 6, lr = 2.0)
    }

  /** The features CTE (`fb`) every logreg oracle starts from. */
  private val logregFeatureSql: String =
    """fb AS MATERIALIZED (
      |  SELECT doc_id, CAST(n_chars AS DOUBLE) / 1000.0 AS x1,
      |    CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE)
      |      / length(text) AS x2,
      |    CAST(length(text) - length(regexp_replace(text, '[aeiou]', '', 'g'))
      |      AS DOUBLE) / length(text) AS x3,
      |    CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
      |  FROM documents)""".stripMargin

  /** One 6-round GD training chain as WITH-clause parts: `${pre}f`
    * (training rows, optionally `where`-filtered off `fb`) through
    * `${pre}w6` (the fitted weights). Prefixing lets several chains —
    * the CV folds — coexist in one statement.
    */
  private def logregChainParts(pre: String, where: String): String = {
    def gd(k: Int): String = {
      val p = s"${pre}w${k - 1}"
      s"""${pre}g$k AS MATERIALIZED (
         |  SELECT SUM(p - y) / (SELECT n FROM ${pre}nn) AS gb,
         |    SUM((p - y) * x1) / (SELECT n FROM ${pre}nn) AS g1,
         |    SUM((p - y) * x2) / (SELECT n FROM ${pre}nn) AS g2,
         |    SUM((p - y) * x3) / (SELECT n FROM ${pre}nn) AS g3
         |  FROM (SELECT f.*,
         |          1.0 / (1.0 + exp(-(w.b + w.w1 * f.x1 + w.w2 * f.x2
         |            + w.w3 * f.x3))) AS p
         |        FROM ${pre}f f, $p w)),
         |${pre}w$k AS (SELECT ROUND(w.b - 2.0 * g.gb, 6) AS b,
         |  ROUND(w.w1 - 2.0 * g.g1, 6) AS w1,
         |  ROUND(w.w2 - 2.0 * g.g2, 6) AS w2,
         |  ROUND(w.w3 - 2.0 * g.g3, 6) AS w3
         |  FROM $p w, ${pre}g$k g)""".stripMargin
    }
    s"""${pre}f AS MATERIALIZED (SELECT * FROM fb $where),
       |${pre}nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM ${pre}f),
       |${pre}w0 AS (SELECT 0.0 AS b, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3),
       |${(1 to 6).map(gd).mkString(",\n")}""".stripMargin
  }

  /** NL query end-to-end: rule compiler → guard → spark.sql over the
    * employees view (reference lifecycle §3.1, stages 5-7).
    */
  private def nl(s: SparkSession, dir: String, userQuery: String): DataFrame = {
    Tables.registerEmployees(s, dir)
    val sql = graft.engine.SqlGuard.clean(NlCompiler.compileSql(userQuery))
      .getOrElse(sys.error(s"guard rejected: $userQuery"))
    s.sql(sql.stripSuffix(";"))
  }

  // -- registry -------------------------------------------------------------

  private lazy val registry: Seq[Q] = empQueries ++ nlQueries ++ tpchQueries ++
    tpchShapeQueries ++ dqQueries ++ eventQueries ++ streamQueries ++
    docQueries ++ embQueries ++ mmQueries ++ trendQueries ++ wave30Queries

  // §2.2/§2.4/§2.6/§2.8 — the reference's generated-SQL surface, over the
  // employees bridge view (FIXTURES.md §3).
  private def empQueries: Seq[Q] = Seq(
    Q("emp_count_all",
      (s, d) => emp(s, d).agg(count(lit(1)).as("total_employees")),
      cte("SELECT COUNT(*) AS total_employees FROM employees")),

    Q("emp_count_dept_it", // ai_query_generator.py:222
      (s, d) => emp(s, d)
        .filter(lower(col("department")).like("%it%"))
        .agg(count(lit(1)).as("count")),
      cte("SELECT COUNT(*) AS count FROM employees WHERE LOWER(department) LIKE '%it%'")),

    Q("emp_count_by_dept", // ai_query_generator.py:224 (+ dept tie-break)
      (s, d) => emp(s, d).filter(col("department").isNotNull)
        .groupBy("department").agg(count(lit(1)).as("count"))
        .orderBy(col("count").desc, col("department")),
      cte("SELECT department, COUNT(*) AS count FROM employees WHERE department IS NOT NULL GROUP BY department ORDER BY count DESC, department")),

    Q("emp_list_all", // ai_query_generator.py:230
      (s, d) => emp(s, d).select("name").orderBy("name").limit(100),
      cte("SELECT name FROM employees ORDER BY name LIMIT 100")),

    Q("emp_filter_dept_sales", // ai_query_generator.py:237
      (s, d) => emp(s, d)
        .filter(lower(col("department")).like("%sales%"))
        .select("name", "department").orderBy("name").limit(50),
      cte("SELECT name, department FROM employees WHERE LOWER(department) LIKE '%sales%' ORDER BY name LIMIT 50")),

    Q("emp_salary_gt", // ai_query_generator.py:246 (+ name tie-break)
      (s, d) => emp(s, d).filter(col("salary") > 50000)
        .select("name", "salary", "department")
        .orderBy(col("salary").desc, col("name")).limit(50),
      cte("SELECT name, salary, department FROM employees WHERE salary > 50000 ORDER BY salary DESC, name LIMIT 50")),

    Q("emp_salary_between", // views.py:80 — BETWEEN range predicate
      (s, d) => emp(s, d).filter(col("salary").between(40000, 80000))
        .select("name", "salary").orderBy(col("salary"), col("name")).limit(100),
      cte("SELECT name, salary FROM employees WHERE salary BETWEEN 40000 AND 80000 ORDER BY salary, name LIMIT 100")),

    Q("emp_avg_salary_by_dept", // views.py:82 — group-by average
      (s, d) => emp(s, d).groupBy("department")
        .agg(round(avg(col("salary").cast("double")), 2).as("avg_salary"),
          count(lit(1)).as("n"))
        .orderBy("department"),
      cte("SELECT department, ROUND(AVG(CAST(salary AS DOUBLE)), 2) AS avg_salary, COUNT(*) AS n FROM employees GROUP BY department ORDER BY department")),

    Q("emp_salary_stats", // inspect_table.py:141 — min/max/avg probe
      (s, d) => emp(s, d).agg(
        min("salary").as("min_salary"),
        max("salary").as("max_salary"),
        round(avg(col("salary").cast("double")), 2).as("avg_salary")),
      cte("SELECT MIN(salary) AS min_salary, MAX(salary) AS max_salary, ROUND(AVG(CAST(salary AS DOUBLE)), 2) AS avg_salary FROM employees")),

    Q("emp_distinct_dept", // ai_query_generator.py:63; inspect_table.py:132
      (s, d) => emp(s, d).select("department").distinct().orderBy("department"),
      cte("SELECT DISTINCT department FROM employees ORDER BY department")),

    // Date columns are emitted as ISO strings in oracle-compared outputs:
    // DATE survives parquet↔pandas↔DuckDB with engine-specific reprs
    // (date vs datetime64) and is a hash-compare hazard; strings are not.
    Q("emp_recent_hires", // ai_query_generator.py:255-258, date pinned (§5)
      (s, d) => emp(s, d)
        .filter(col("date_of_join") >= lit(java.sql.Date.valueOf("2023-01-01")))
        .select(col("name"), col("department"),
          col("date_of_join").cast("string").as("date_of_join"))
        .orderBy(col("date_of_join").desc, col("name")).limit(50),
      cte("SELECT name, department, CAST(date_of_join AS VARCHAR) AS date_of_join FROM employees WHERE date_of_join >= DATE '2023-01-01' ORDER BY date_of_join DESC, name LIMIT 50")),

    Q("emp_joined_year", // ai_query_generator.py:261-266 — EXTRACT(YEAR)
      (s, d) => emp(s, d).filter(year(col("date_of_join")) === 2020)
        .select(col("name"), col("date_of_join").cast("string").as("date_of_join"))
        .orderBy("name").limit(100),
      cte("SELECT name, CAST(date_of_join AS VARCHAR) AS date_of_join FROM employees WHERE EXTRACT(YEAR FROM date_of_join) = 2020 ORDER BY name LIMIT 100")),

    Q("emp_join_year_histogram", // year bucketing as an aggregate
      (s, d) => emp(s, d)
        .groupBy(year(col("date_of_join")).as("join_year"))
        .agg(count(lit(1)).as("n")).orderBy("join_year"),
      cte("SELECT EXTRACT(YEAR FROM date_of_join) AS join_year, COUNT(*) AS n FROM employees GROUP BY join_year ORDER BY join_year")),

    Q("emp_email_list", // ai_query_generator.py:274 — IS NOT NULL
      (s, d) => emp(s, d).filter(col("email").isNotNull)
        .select("name", "email", "department").orderBy("name").limit(100),
      cte("SELECT name, email, department FROM employees WHERE email IS NOT NULL ORDER BY name LIMIT 100")),

    Q("emp_email_domain", // views.py:83 — substring match on email
      (s, d) => emp(s, d).filter(col("email").contains("123"))
        .select("name", "email").orderBy("name").limit(100),
      cte("SELECT name, email FROM employees WHERE email LIKE '%123%' ORDER BY name LIMIT 100")),

    Q("emp_position_list", // ai_query_generator.py:278
      (s, d) => emp(s, d).filter(col("position").isNotNull)
        .select("name", "position", "department").orderBy("name").limit(100),
      cte("SELECT name, position, department FROM employees WHERE position IS NOT NULL ORDER BY name LIMIT 100")),

    Q("emp_software_engineers", // views.py:79 — equality filter
      (s, d) => emp(s, d).filter(col("position") === "Software Engineer")
        .select("name", "position").orderBy("name").limit(100),
      cte("SELECT name, position FROM employees WHERE position = 'Software Engineer' ORDER BY name LIMIT 100")),

    Q("emp_topk_salary", // views.py:75 — ORDER BY salary DESC LIMIT k
      (s, d) => emp(s, d).select("name", "salary")
        .orderBy(col("salary").desc, col("name")).limit(10),
      cte("SELECT name, salary FROM employees ORDER BY salary DESC, name LIMIT 10")),

    Q("emp_years_of_service", // models.py:45-56, year pinned (§5)
      (s, d) => emp(s, d)
        .withColumn("years_of_service", lit(2026) - year(col("date_of_join")))
        .filter(col("years_of_service") > 5)
        .select(col("name"), col("date_of_join").cast("string").as("date_of_join"),
          col("years_of_service"))
        .orderBy("name").limit(100),
      cte("SELECT name, CAST(date_of_join AS VARCHAR) AS date_of_join, (2026 - EXTRACT(YEAR FROM date_of_join)) AS years_of_service FROM employees WHERE (2026 - EXTRACT(YEAR FROM date_of_join)) > 5 ORDER BY name LIMIT 100")),

    Q("emp_coalesce_contact", // ai_query_generator.py:258 — COALESCE
      (s, d) => emp(s, d)
        .select(col("name"), coalesce(col("email"), col("name")).as("contact"))
        .orderBy("name").limit(100),
      cte("SELECT name, COALESCE(email, name) AS contact FROM employees ORDER BY name LIMIT 100")))

  // §2.10 — the NL→SQL pipeline end-to-end (compile → guard → execute),
  // oracle-checked against the SQL shapes the reference generates.
  private def nlQueries: Seq[Q] = Seq(
    Q("nl_count_it", // views.py:72 example 3
      (s, d) => nl(s, d, "How many employees work in the IT department?"),
      cte("SELECT COUNT(*) AS count FROM employees WHERE LOWER(department) LIKE '%it%'")),

    Q("nl_total_count",
      (s, d) => nl(s, d, "How many employees are there?"),
      cte("SELECT COUNT(*) AS total_employees FROM employees")),

    Q("nl_list_all", // views.py:69 example 1
      (s, d) => nl(s, d, "Show me all employees in the company"),
      cte("SELECT name FROM employees ORDER BY name LIMIT 100")),

    Q("nl_gmail", // views.py:83 example 15 — NB: "gmail" does NOT contain
      // the substring "email", so the reference's fallback hits the DEFAULT
      // branch (names only, LIMIT 20); parity preserved (NlCompilerSpec ex15)
      (s, d) => nl(s, d, "Find employees with Gmail addresses"),
      cte("SELECT name FROM employees ORDER BY name LIMIT 20")),

    Q("nl_email", // ai_query_generator.py:273-274 — the email branch proper
      (s, d) => nl(s, d, "Show employee email addresses"),
      cte("SELECT name, email, department FROM employees WHERE email IS NOT NULL ORDER BY name LIMIT 100")),

    Q("nl_count_by_dept", // views.py:76 example 8 (counts distinct at sf0.01)
      (s, d) => nl(s, d, "Count of employees in each department"),
      cte("SELECT department, COUNT(*) AS count FROM employees WHERE department IS NOT NULL GROUP BY department ORDER BY count DESC")),

    Q("nl_default_names",
      (s, d) => nl(s, d, "hello there"),
      cte("SELECT name FROM employees ORDER BY name LIMIT 20")))

  // §2.3/§2.4/§2.5/§2.6/§2.7 — relational surface at scale over the TPC-H
  // fixtures: multi-way joins (broadcast dims), semi/anti, windows, rollup,
  // set ops. Join strategy notes inline.
  // Subquery shapes run through spark.sql so Catalyst's decorrelation is
  // what's under test; the identical ANSI text doubles as the oracle.
  // Boundary predicates stay exact across engines: l_quantity is
  // integer-valued, so SUM/AVG are exact in binary doubles regardless of
  // aggregation order.
  private val subqQ17Sql =
    """SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#1'
      |AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
      |                  FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin

  private val subqExistsSql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey
      |              AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey LIMIT 100""".stripMargin

  private val subqAboveAvgSql =
    """SELECT o_orderkey, o_totalprice FROM orders
      |WHERE o_totalprice > (SELECT 2 * AVG(o_totalprice) FROM orders)
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""".stripMargin

  private val subqRecursiveSql =
    """WITH RECURSIVE m(mo) AS (
      |  SELECT 1 UNION ALL SELECT mo + 1 FROM m WHERE mo < 12
      |),
      |o AS (
      |  SELECT month(o_orderdate) AS mo, COUNT(*) AS n_orders,
      |    ROUND(CAST(SUM(o_totalprice) AS DOUBLE), 2) AS revenue
      |  FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 1
      |)
      |SELECT m.mo, COALESCE(n_orders, 0) AS n_orders,
      |  COALESCE(revenue, 0.0) AS revenue
      |FROM m LEFT JOIN o ON m.mo = o.mo ORDER BY m.mo""".stripMargin

  /** Spark side of `subq_recursive_reach`: the recursion reads the
    * MEMOIZED canonical co-purchase index through a temp view — Spark
    * inlines non-recursive CTEs into every recursion level, so deriving
    * the edge list inside the WITH would re-run the O(order²) pair
    * expansion per level (measured: 10.9 s vs 1.3 s). The oracle keeps
    * the full inline derivation (DuckDB materializes CTEs referenced
    * from recursion cheaply); both produce the identical edge set.
    */
  private val subqRecursiveReachSparkSql =
    """WITH RECURSIVE e AS (
      |  SELECT src, dst FROM copurchase_edges
      |  UNION ALL
      |  SELECT dst, src FROM copurchase_edges
      |),
      |seed AS (SELECT MIN(src) AS id FROM e),
      |r(id, hops) AS (
      |  SELECT id, 0 FROM seed
      |  UNION ALL
      |  SELECT e.dst, r.hops + 1 FROM r JOIN e ON e.src = r.id
      |  WHERE r.hops < 3
      |)
      |SELECT hops, COUNT(*) AS n_parts FROM (
      |  SELECT id, MIN(hops) AS hops FROM r GROUP BY id
      |) GROUP BY hops ORDER BY hops""".stripMargin

  private val subqNotInSql =
    """SELECT 'clean' AS variant, COUNT(*) AS n
      |FROM part WHERE p_partkey NOT IN (
      |  SELECT l_partkey FROM lineitem WHERE l_quantity > 45)
      |UNION ALL
      |SELECT 'null_poisoned', COUNT(*)
      |FROM part WHERE p_partkey NOT IN (
      |  SELECT nullif(l_partkey, (SELECT MIN(l_partkey) FROM lineitem
      |                            WHERE l_quantity > 45))
      |  FROM lineitem WHERE l_quantity > 45)
      |ORDER BY variant""".stripMargin

  private val setBagOpsSql =
    """WITH a AS (SELECT l_partkey AS k FROM lineitem
      |           WHERE year(l_shipdate) = 1995),
      |b AS (SELECT l_partkey AS k FROM lineitem
      |      WHERE year(l_shipdate) = 1996),
      |i AS (SELECT k FROM a INTERSECT ALL SELECT k FROM b),
      |e AS (SELECT k FROM a EXCEPT ALL SELECT k FROM b)
      |SELECT 'intersect_all' AS op, k, COUNT(*) AS n FROM i GROUP BY k
      |UNION ALL
      |SELECT 'except_all', k, COUNT(*) FROM e GROUP BY k
      |ORDER BY op, k""".stripMargin

  private val subqRecursiveReachSql =
    """WITH RECURSIVE op AS (
      |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      |),
      |e AS (
      |  SELECT a.l_partkey AS src, b.l_partkey AS dst
      |  FROM op a JOIN op b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2
      |),
      |seed AS (SELECT MIN(src) AS id FROM e),
      |r(id, hops) AS (
      |  SELECT id, 0 FROM seed
      |  UNION ALL
      |  SELECT e.dst, r.hops + 1 FROM r JOIN e ON e.src = r.id
      |  WHERE r.hops < 3
      |)
      |SELECT hops, COUNT(*) AS n_parts FROM (
      |  SELECT id, MIN(hops) AS hops FROM r GROUP BY id
      |) GROUP BY hops ORDER BY hops""".stripMargin

  private val subqLateralSql =
    """SELECT n_name, c_name, c_acctbal
      |FROM nation,
      |LATERAL (SELECT c_name, c_acctbal FROM customer
      |         WHERE c_nationkey = n_nationkey
      |         ORDER BY c_acctbal DESC, c_name LIMIT 2) top2
      |ORDER BY n_name, c_acctbal DESC, c_name""".stripMargin

  private def tpchQueries: Seq[Q] = Seq(
    Q("q1_lineitem_agg", // TPC-H Q1 shape: map-side partial agg, 6-row result
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |ROUND(SUM(l_quantity), 2) AS sum_qty,
             |ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
             |ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             |ROUND(AVG(l_quantity), 4) AS avg_qty,
             |ROUND(AVG(l_discount), 4) AS avg_disc,
             |COUNT(*) AS count_order
             |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    Q("q3_topk_revenue", // TPC-H Q3 shape: shuffle joins on keys, top-k
      (s, d) => {
        val c = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        val o = t(s, d, "orders")
          .filter(col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1996-03-15 00:00:00")))
        val l = t(s, d, "lineitem")
          .filter(col("l_shipdate") > lit(java.sql.Timestamp.valueOf("1996-03-15 00:00:00")))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .groupBy("o_orderkey", "o_orderdate")
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
          .select("o_orderkey", "revenue", "o_orderdate")
          .orderBy(col("revenue").desc, col("o_orderkey")).limit(10)
      },
      Some("""SELECT o_orderkey,
             |ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue, o_orderdate
             |FROM customer, orders, lineitem
             |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
             |AND l_orderkey = o_orderkey
             |AND o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
             |AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
             |GROUP BY o_orderkey, o_orderdate
             |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin)),

    Q("q5_region_revenue", // TPC-H Q5 shape: broadcast the dim chain
      (s, d) => {
        val r = t(s, d, "region").filter(col("r_name") === "ASIA")
        val n = t(s, d, "nation")
        val c = t(s, d, "customer")
        val o = t(s, d, "orders")
        val l = t(s, d, "lineitem")
        // dims are tiny → broadcast; the only shuffles are on the fact keys
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy("n_name")
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some("""SELECT n_name,
             |ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
             |FROM customer, orders, lineitem, nation, region
             |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
             |AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
             |AND r_name = 'ASIA'
             |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin)),

    Q("join_semi_bigqty", // EXISTS → left_semi (no row multiplication)
      (s, d) => t(s, d, "orders")
        .join(t(s, d, "lineitem").filter(col("l_quantity") > 45),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("total_price")),
      Some("""SELECT COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS total_price
             |FROM orders WHERE EXISTS (
             |SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)""".stripMargin)),

    Q("join_salted_skew", // skew-salted equi-join: result-invariant vs the
      // plain join (the oracle IS the plain join) while a hot custkey
      // spreads over `factor` reducers instead of one
      (s, d) => Scale.saltedJoin(
          t(s, d, "orders").select(col("o_custkey").as("k"), col("o_totalprice")),
          t(s, d, "customer").select(col("c_custkey").as("k"), col("c_mktsegment")),
          Seq("k"), factor = 4)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("rev"))
        .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment, COUNT(*) AS n,
             |ROUND(SUM(o_totalprice), 2) AS rev
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    Q("join_anti_no_orders", // NOT EXISTS → left_anti
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("n_customers")),
      Some("""SELECT COUNT(*) AS n_customers FROM customer WHERE NOT EXISTS (
             |SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin)),

    Q("join_self_manager", // self-join shape (SURVEY.md §2.3): same-nation pairs per nation, counted
      (s, d) => {
        val a = t(s, d, "supplier").select(col("s_suppkey").as("a_key"), col("s_nationkey").as("a_nat"))
        val b = t(s, d, "supplier").select(col("s_suppkey").as("b_key"), col("s_nationkey").as("b_nat"))
        a.join(b, col("a_nat") === col("b_nat") && col("a_key") < col("b_key"))
          .groupBy(col("a_nat").as("nationkey")).agg(count(lit(1)).as("n_pairs"))
          .orderBy("nationkey")
      },
      Some("""SELECT a.s_nationkey AS nationkey, COUNT(*) AS n_pairs
             |FROM supplier a JOIN supplier b
             |ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
             |GROUP BY a.s_nationkey ORDER BY nationkey""".stripMargin)),

    Q("window_top3_orders_per_cust", // §2.5 extension: rank-per-group
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, d, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
             |SELECT o_custkey, o_orderkey, o_totalprice,
             |ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin)),

    Q("topk_agg_orders_per_cust", // the SAME top-3-per-customer as
      // window_top3_orders_per_cust, through a typed Aggregator
      // (functions.udaf) whose state is at most k pairs per group — a
      // hash aggregate with map-side combine instead of a window sort.
      // At scale the shuffle carries k×|groups| rows, not the table.
      // Identical results, identical oracle.
      (s, d) => {
        val topk = udaf(graft.functions.TopKAggregator(3))
        t(s, d, "orders").groupBy("o_custkey")
          .agg(topk(col("o_orderkey"), col("o_totalprice")).as("top"))
          .select(col("o_custkey"), posexplode(col("top")))
          .select(col("o_custkey"), col("col.id").as("o_orderkey"),
            col("col.value").as("o_totalprice"),
            (col("pos") + 1).cast("long").as("rn"))
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn FROM (
             |SELECT o_custkey, o_orderkey, o_totalprice,
             |ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin)),

    Q("window_running_revenue", // running frame sum, unique sort key
      (s, d) => {
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d, "lineitem").filter(col("l_suppkey") <= 3)
          .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
            round(sum(col("l_extendedprice")).over(w), 2).as("running_total"))
          .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber,
             |ROUND(SUM(l_extendedprice) OVER (
             |PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
             |ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
             |FROM lineitem WHERE l_suppkey <= 3
             |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin)),

    Q("window_order_gaps", // lag(): inter-order gap per customer, one
      // window pass feeding a reaggregation (no self-join on order seq)
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        t(s, d, "orders")
          .withColumn("ots", col("o_orderdate").cast("timestamp")) // NTZ → UTC instant
          .withColumn("gap_ms",
            unix_millis(col("ots")) - unix_millis(lag(col("ots"), 1).over(w)))
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("n_orders"), count(col("gap_ms")).as("n_gaps"),
            round(avg(col("gap_ms")) / 86400000.0, 4).as("avg_gap_days"))
          .orderBy("o_custkey").limit(200)
      },
      Some("""WITH g AS (
             |  SELECT o_custkey,
             |    epoch_ms(o_orderdate) - epoch_ms(lag(o_orderdate) OVER w) AS gap_ms
             |  FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
             |SELECT o_custkey, COUNT(*) AS n_orders, COUNT(gap_ms) AS n_gaps,
             |  ROUND(AVG(gap_ms) / 86400000.0, 4) AS avg_gap_days
             |FROM g GROUP BY o_custkey ORDER BY o_custkey LIMIT 200""".stripMargin)),

    Q("window_range_7day", // RANGE frame over day numbers: trailing
      // 7-day revenue per customer. A ROWS frame would be wrong here —
      // customers don't order every day, and RANGE bounds the frame by
      // VALUE distance (day-number within 6), gaps included, which is
      // the correct trailing-window semantics for sparse time series.
      (s, d) => {
        val daily = t(s, d, "orders")
          .groupBy(col("o_custkey"),
            datediff(col("o_orderdate").cast("date"),
              lit(java.sql.Date.valueOf("1995-01-01"))).as("day_num"))
          .agg(round(sum("o_totalprice"), 2).as("rev"))
        val w = Window.partitionBy("o_custkey").orderBy("day_num")
          .rangeBetween(-6, 0)
        daily.select(col("o_custkey"), col("day_num"), col("rev"),
            round(sum("rev").over(w), 2).as("rev_7d"))
          .orderBy("o_custkey", "day_num")
          .limit(500)
      },
      Some("""WITH daily AS (
             |  SELECT o_custkey,
             |    datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS day_num,
             |    ROUND(SUM(o_totalprice), 2) AS rev
             |  FROM orders GROUP BY o_custkey, day_num)
             |SELECT o_custkey, day_num, rev,
             |  ROUND(SUM(rev) OVER (PARTITION BY o_custkey ORDER BY day_num
             |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS rev_7d
             |FROM daily ORDER BY o_custkey, day_num LIMIT 500""".stripMargin)),

    Q("window_rank_quartile", // ranking family: ntile / dense_rank /
      // percent_rank share ONE window spec → a single sort per partition
      (s, d) => {
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        t(s, d, "customer")
          .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
            ntile(4).over(w).as("quartile"),
            dense_rank().over(w).as("drank"),
            round(percent_rank().over(w), 6).as("prank"))
          .orderBy(col("c_mktsegment"), col("c_acctbal").desc, col("c_custkey"))
          .limit(300)
      },
      Some("""SELECT c_custkey, c_mktsegment, c_acctbal,
             |  ntile(4) OVER w AS quartile,
             |  dense_rank() OVER w AS drank,
             |  ROUND(percent_rank() OVER w, 6) AS prank
             |FROM customer WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
             |ORDER BY c_mktsegment, c_acctbal DESC, c_custkey LIMIT 300""".stripMargin)),

    Q("window_first_last", // first_value / last_value / lead; last_value
      // needs the full frame (default frame stops at CURRENT ROW)
      (s, d) => {
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, d, "lineitem").filter(col("l_suppkey") <= 2)
          .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
            first(col("l_extendedprice")).over(w).as("first_price"),
            last(col("l_extendedprice")).over(wFull).as("last_price"),
            lead(col("l_extendedprice"), 1).over(w).as("next_price"))
          .orderBy("l_suppkey", "l_orderkey", "l_linenumber").limit(100)
      },
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber,
             |  first_value(l_extendedprice) OVER w AS first_price,
             |  last_value(l_extendedprice) OVER (PARTITION BY l_suppkey
             |    ORDER BY l_shipdate, l_orderkey, l_linenumber
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price,
             |  lead(l_extendedprice) OVER w AS next_price
             |FROM lineitem WHERE l_suppkey <= 2
             |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
             |ORDER BY l_suppkey, l_orderkey, l_linenumber LIMIT 100""".stripMargin)),

    Q("agg_grouping_sets", // explicit GROUPING SETS with grouping()
      // markers (cube/rollup covered separately) — one shuffle, the
      // grouping-set expansion happens map-side
      (s, d) => {
        Tables.registerAll(s, d)
        s.sql("""SELECT l_returnflag, l_linestatus,
                |CAST(grouping(l_returnflag) AS INT) AS g_rf,
                |CAST(grouping(l_linestatus) AS INT) AS g_ls,
                |COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS sum_qty
                |FROM lineitem
                |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
                |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
             |CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
             |COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS sum_qty
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
             |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)),

    Q("agg_approx_distinct", // HLL++ sketch: the 100 TB form of COUNT(DISTINCT)
      // — one pass, fixed memory, no extra shuffle for the distinct.
      // Sketch internals differ per engine, so the oracle checks the
      // strongest cross-engine contract instead: the exact cardinalities
      // hash-match DuckDB, and the sketch estimates are asserted to sit
      // inside 5×rsd of exact (a ≥5σ bound; ApproxAggSpec pins the
      // tighter per-fixture error). The sketches ride ONE narrow agg and
      // the exacts are per-column two-phase distincts — mixing distinct
      // and sketch aggregates in one agg planned an Expand that tripled
      // the scan (measured 5.4 s → 1.3 s at sf0.1).
      (s, d) => {
        val li = t(s, d, "lineitem")
        val Array(apParts, apSupps) = li.agg(
          approx_count_distinct(col("l_partkey"), rsd = 0.01),
          approx_count_distinct(col("l_suppkey"), rsd = 0.01))
          .head().toSeq.map(_.asInstanceOf[Long]).toArray
        // both exact cardinalities in ONE scan + one distinct shuffle: a
        // tagged explode of (column, key) instead of two per-column jobs
        // (the mixed distinct+sketch single-agg alternative plans an
        // Expand that triples the scan — see note above)
        val ex = li.select(explode(array(
            struct(lit("p").as("c"), col("l_partkey").as("k")),
            struct(lit("s").as("c"), col("l_suppkey").as("k")))).as("e"))
          .select(col("e.c").as("c"), col("e.k").as("k")).distinct()
          .groupBy("c").agg(count(lit(1)).as("n"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val exParts = ex("p")
        val exSupps = ex("s")
        import s.implicits._
        Seq((exParts, exSupps,
          math.abs(apParts - exParts) <= 0.05 * exParts,
          math.abs(apSupps - exSupps) <= 0.05 * exSupps))
          .toDF("exact_parts", "exact_supps",
            "parts_within_bound", "supps_within_bound")
      },
      Some("""SELECT COUNT(DISTINCT l_partkey) AS exact_parts,
             |COUNT(DISTINCT l_suppkey) AS exact_supps,
             |true AS parts_within_bound, true AS supps_within_bound
             |FROM lineitem""".stripMargin)),

    Q("agg_approx_percentile", // t-digest-style quantiles, one pass, no
      // sort. Same exact+bound contract as agg_approx_distinct: the exact
      // quantiles (distributed range-sort, Scale.exactQuantiles) are
      // hash-checked against DuckDB's quantile_cont, and the sketch values
      // are asserted within 1% relative error of exact in-query.
      (s, d) => {
        val ex = Scale.exactQuantiles(t(s, d, "lineitem"), "l_extendedprice",
          Seq(0.5, 0.95, 0.99))
        val ap = t(s, d, "lineitem").agg(
          percentile_approx(col("l_extendedprice"),
            array(lit(0.5), lit(0.95), lit(0.99)), lit(10000)))
          .head().getSeq[Double](0)
        def r2(x: Double) =
          BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
        val within = ex.zip(ap).forall { case (e, a) => math.abs(a - e) <= 0.01 * e }
        import s.implicits._
        Seq((r2(ex(0)), r2(ex(1)), r2(ex(2)), within))
          .toDF("p50", "p95", "p99", "approx_within_bound")
      },
      Some("""SELECT ROUND(quantile_cont(l_extendedprice, 0.5), 2) AS p50,
             |ROUND(quantile_cont(l_extendedprice, 0.95), 2) AS p95,
             |ROUND(quantile_cont(l_extendedprice, 0.99), 2) AS p99,
             |true AS approx_within_bound FROM lineitem""".stripMargin)),

    Q("agg_exact_percentiles", // exact continuous quantiles via distributed
      // range-sort + global index (Scale.exactQuantiles) — Spark's built-in
      // exact percentile merges every value into one final buffer, which is
      // single-node O(n) (measured 13 s at sf0.1 vs <1 s for the sort form)
      (s, d) => {
        val q = rankedExtPrice(s, d).quantiles(Seq(0.5, 0.95, 0.99))
        def r2(x: Double) =
          BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
        import s.implicits._
        Seq((r2(q(0)), r2(q(1)), r2(q(2)))).toDF("p50", "p95", "p99")
      },
      Some("""SELECT ROUND(quantile_cont(l_extendedprice, 0.5), 2) AS p50,
             |ROUND(quantile_cont(l_extendedprice, 0.95), 2) AS p95,
             |ROUND(quantile_cont(l_extendedprice, 0.99), 2) AS p99 FROM lineitem""".stripMargin)),

    Q("lineitem_winsorized_stats", // winsorization: cap extendedprice at
      // its exact [p01, p99] (distributed range-sort cuts, rounded once,
      // inlined as literals → the capping pass is map-only); report the
      // mean shift and how many rows each tail capped
      (s, d) => {
        val cuts = rankedExtPrice(s, d).quantiles(Seq(0.01, 0.99))
        val w = Scale.winsorizeAt(t(s, d, "lineitem"), "l_extendedprice", cuts)
        w.agg(count(lit(1)).as("n"),
          round(avg("l_extendedprice"), 4).as("mean_raw"),
          round(avg("l_extendedprice_w"), 4).as("mean_winsorized"),
          sum(when(col("l_extendedprice_w") > col("l_extendedprice"), 1L)
            .otherwise(0L)).as("n_capped_low"),
          sum(when(col("l_extendedprice_w") < col("l_extendedprice"), 1L)
            .otherwise(0L)).as("n_capped_high"))
      },
      Some("""WITH q AS (
             |  SELECT ROUND(quantile_cont(l_extendedprice, 0.01), 2) AS lo,
             |         ROUND(quantile_cont(l_extendedprice, 0.99), 2) AS hi
             |  FROM lineitem
             |), w AS (
             |  SELECT l_extendedprice AS v,
             |    least(greatest(l_extendedprice, lo), hi) AS vw
             |  FROM lineitem, q
             |)
             |SELECT COUNT(*) AS n, ROUND(AVG(v), 4) AS mean_raw,
             |  ROUND(AVG(vw), 4) AS mean_winsorized,
             |  CAST(SUM(CASE WHEN vw > v THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_capped_low,
             |  CAST(SUM(CASE WHEN vw < v THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_capped_high
             |FROM w""".stripMargin)),

    Q("doc_stratified_sample", // per-stratum HASH sampling (training-set
      // rebalancing): md5(key) against a per-stratum hex threshold.
      // Unlike seeded Bernoulli draws this is reproducible across engines,
      // runs and re-partitionings — the property a 100 TB training
      // pipeline actually needs from a sample (re-runs must select the
      // SAME rows) — and therefore fully oracle-checkable. Thresholds are
      // the first byte of the hash: '80'≈50%, '40'≈25%, '1a'≈10%. The
      // seeded sampleBy variant stays pinned in ApproxAggSpec.
      (s, d) => {
        val th = typedLit(Map(
          "en" -> "80", "fr" -> "40", "de" -> "40", "es" -> "40", "zh" -> "1a"))
        t(s, d, "documents")
          .filter(substring(md5(col("doc_id").cast("string")), 1, 2) <
            element_at(th, col("lang")))
          .groupBy("lang").agg(count(lit(1)).as("n_sampled"))
          .orderBy("lang")
      },
      Some("""SELECT lang, COUNT(*) AS n_sampled FROM documents
             |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
             |  CASE lang WHEN 'en' THEN '80' WHEN 'fr' THEN '40'
             |            WHEN 'de' THEN '40' WHEN 'es' THEN '40'
             |            WHEN 'zh' THEN '1a' ELSE '00' END
             |GROUP BY lang ORDER BY lang""".stripMargin)),

    Q("doc_mixture_sample", // dataset mixing to a target recipe: each
      // source gets a budget from its mixture weight (here 2·(i mod 4 + 1)
      // docs for source srcI — a 100-doc recipe over 20 sources), filled
      // with the budget-many smallest md5(doc_id) of that source. Hash
      // order makes the recipe reproducible across engines, runs and
      // re-partitionings — the property a training "data recipe" needs —
      // and the whole selection is one window over (source, hash).
      (s, d) => {
        val idx = regexp_extract(col("source"), "src(\\d+)", 1).cast("int")
        val w = Window.partitionBy("source")
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        t(s, d, "documents")
          .withColumn("budget", (pmod(idx, lit(4)) + 1) * 2)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= col("budget"))
          .select("doc_id", "source")
          .orderBy("doc_id")
      },
      Some("""WITH r AS (
             |  SELECT doc_id, source,
             |    row_number() OVER (PARTITION BY source
             |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
             |    2 * (CAST(regexp_extract(source, 'src(\d+)', 1) AS INT) % 4 + 1) AS budget
             |  FROM documents)
             |SELECT doc_id, source FROM r WHERE rn <= budget
             |ORDER BY doc_id""".stripMargin)),

    Q("agg_heavy_hitters", // two-pass EXACT heavy hitters: Misra-Gries
      // candidate sketch (no shuffle) + exact recount of candidates only
      // through a pushed-down IN filter — 2 narrow scans instead of a
      // full-key-stream shuffle, and exact output (freqItems has no false
      // negatives above support) → fully oracle-checked. The CMS-estimate
      // variant stays pinned in ApproxAggSpec.
      (s, d) => graft.operators.Sketches.heavyHittersExact(
        t(s, d, "lineitem"), "l_suppkey", support = 0.005),
      Some("""SELECT l_suppkey AS item, COUNT(*) AS cnt FROM lineitem
             |GROUP BY l_suppkey
             |HAVING COUNT(*) > 0.005 * (SELECT COUNT(*) FROM lineitem)
             |ORDER BY item""".stripMargin)),

    Q("agg_rollup", // §2.4 grouping sets
      (s, d) => t(s, d, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS sum_qty
             |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
             |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)),

    Q("set_union_keys", // §2.7 — UNION (distinct)
      (s, d) => t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("key"))
        .union(t(s, d, "orders").filter(col("o_totalprice") > 300000)
          .select(col("o_custkey").as("key")))
        .distinct().orderBy("key"),
      Some("""SELECT c_custkey AS key FROM customer WHERE c_mktsegment = 'BUILDING'
             |UNION
             |SELECT o_custkey AS key FROM orders WHERE o_totalprice > 300000
             |ORDER BY key""".stripMargin)),

    Q("set_intersect_keys", // §2.7 — INTERSECT
      (s, d) => t(s, d, "customer").filter(col("c_mktsegment") === "AUTOMOBILE")
        .select(col("c_custkey").as("key"))
        .intersect(t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey").as("key")))
        .orderBy("key"),
      Some("""SELECT c_custkey AS key FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
             |INTERSECT
             |SELECT o_custkey AS key FROM orders WHERE o_orderpriority = '1-URGENT'
             |ORDER BY key""".stripMargin)),

    Q("set_except_keys", // §2.7 — EXCEPT (customers who never ordered urgent)
      (s, d) => t(s, d, "customer").select(col("c_custkey").as("key"))
        .except(t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey").as("key")))
        .orderBy("key"),
      Some("""SELECT c_custkey AS key FROM customer
             |EXCEPT
             |SELECT o_custkey AS key FROM orders WHERE o_orderpriority = '1-URGENT'
             |ORDER BY key""".stripMargin)),

    Q("agg_cube", // §2.4 grouping sets — full cube
      (s, d) => t(s, d, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first),
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
             |ROUND(SUM(o_totalprice), 2) AS total
             |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
             |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)),

    Q("join_left_outer", // §2.3 — left outer with null-side aggregation
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"),
          round(coalesce(sum("o_totalprice"), lit(0.0)), 2).as("total_spent"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
             |ROUND(COALESCE(SUM(o_totalprice), 0), 2) AS total_spent
             |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin)),

    Q("part_pruned_scan", // §2.1 — filter+projection pushdown to parquet
      (s, d) => t(s, d, "part")
        .filter(col("p_size") === 15 && col("p_type").like("%STANDARD%"))
        .select("p_partkey", "p_name", "p_retailprice")
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, p_name, p_retailprice FROM part
             |WHERE p_size = 15 AND p_type LIKE '%STANDARD%'
             |ORDER BY p_partkey""".stripMargin)),

    Q("layout_partition_prune", // §2.1 layout: write day-partitioned,
      // read back through a partition predicate — the filter becomes
      // directory pruning (PartitionFilters), no non-matching file opens
      (s, d) => {
        val path = s"/tmp/graft_layout_${new java.io.File(d).getName}"
        // One-time setup: write the partitioned copy only if absent so the
        // benchmarked query is the pruned READ, not the rewrite (the bench
        // warmup pass materializes the layout; the timed pass reuses it).
        if (!new java.io.File(path, "_SUCCESS").exists())
          graft.sources.Layout.writeDayPartitioned(t(s, d, "events"), path)
        graft.sources.Layout.readDays(s, path, Seq("2024-01-05", "2024-01-06"))
          .groupBy("day", "event_type")
          .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
          .orderBy("day", "event_type")
      },
      Some("""SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
             |COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value
             |FROM events
             |WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
             |AND ts < TIMESTAMP '2024-01-07 00:00:00'
             |GROUP BY day, event_type ORDER BY day, event_type""".stripMargin)),

    Q("source_format_roundtrip", // §2.1 vendor-portable sources: the same
      // relation through CSV and JSON-lines and back, schema carried
      // explicitly (neither format self-describes); summaries must agree
      // with the parquet original on both paths
      (s, d) => {
        val base = s"/tmp/graft_fmt_${new java.io.File(d).getName}"
        def summary(df: DataFrame, fmt: String) =
          df.agg(count(lit(1)).as("n"),
              sum("n_nationkey").as("key_sum"),
              countDistinct("n_name").as("n_names"))
            .select(lit(fmt).as("format"), col("n"), col("key_sum"), col("n_names"))
        val nation = t(s, d, "nation")
        summary(graft.sources.Formats.csvRoundtrip(nation, s"$base/csv"), "csv")
          .union(summary(graft.sources.Formats.jsonRoundtrip(nation, s"$base/json"), "json"))
          .union(summary(graft.sources.Formats.orcRoundtrip(nation, s"$base/orc"), "orc"))
          .union(summary(graft.sources.Formats.xmlRoundtrip(nation, s"$base/xml"), "xml"))
          .orderBy("format")
      },
      Some("""SELECT 'csv' AS format, COUNT(*) AS n,
             |CAST(SUM(n_nationkey) AS BIGINT) AS key_sum,
             |COUNT(DISTINCT n_name) AS n_names FROM nation
             |UNION ALL
             |SELECT 'json' AS format, COUNT(*) AS n,
             |CAST(SUM(n_nationkey) AS BIGINT) AS key_sum,
             |COUNT(DISTINCT n_name) AS n_names FROM nation
             |UNION ALL
             |SELECT 'orc' AS format, COUNT(*) AS n,
             |CAST(SUM(n_nationkey) AS BIGINT) AS key_sum,
             |COUNT(DISTINCT n_name) AS n_names FROM nation
             |UNION ALL
             |SELECT 'xml' AS format, COUNT(*) AS n,
             |CAST(SUM(n_nationkey) AS BIGINT) AS key_sum,
             |COUNT(DISTINCT n_name) AS n_names FROM nation
             |ORDER BY format""".stripMargin)),

    Q("federated_trisource_join", // §2.1 "unified retrieval": ONE query
      // joining three different physical sources — parquet facts, a CSV
      // nation dim, a JSON region dim — through the common DataFrame
      // relation; both dims broadcast, so heterogeneity costs nothing
      // beyond the ingest scan (the reference federates vendors behind a
      // cursor — ai_query_generator.py:28-38 — Spark federates formats
      // behind the datasource API)
      (s, d) => {
        val base = s"/tmp/graft_fed_${new java.io.File(d).getName}"
        val nationCsv = graft.sources.Formats
          .csvRoundtrip(t(s, d, "nation"), s"$base/nation_csv")
        val regionJson = graft.sources.Formats
          .jsonRoundtrip(t(s, d, "region"), s"$base/region_json")
        t(s, d, "customer")
          .join(broadcast(nationCsv), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(regionJson), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name")
          .agg(count(lit(1)).as("n_customers"),
            round(sum("c_acctbal"), 2).as("total_acctbal"))
          .orderBy("r_name")
      },
      Some("""SELECT r_name, COUNT(*) AS n_customers,
             |ROUND(SUM(c_acctbal), 2) AS total_acctbal
             |FROM customer
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name ORDER BY r_name""".stripMargin)),

    Q("ivm_join_delta", // incremental maintenance of a JOIN view:
      // V = orders⋈customer rolled up by nation; a ~1% insert batch
      // (orderkey mod 97 = 0) is folded in as ΔV = Δorders⋈customer —
      // the delta joins ONLY the new rows against the dim, never
      // rescanning the base fact (the materialized-view backfill
      // pattern that turns a 100 TB refresh into a delta-sized one).
      // Both engines verify base+delta against the full recompute
      // in-query; counts are exact, revenue rounds at 4dp.
      (s, d) => {
        val c = t(s, d, "customer")
          .select(col("c_custkey"), col("c_nationkey"))
        val o = t(s, d, "orders")
        def view(orders: DataFrame): DataFrame = orders
          .join(c, col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_nationkey").as("nation"))
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast("double")).as("rev"))
        val base = view(o.filter(col("o_orderkey") % 97 =!= 0))
          .select(col("nation"), col("n").as("n_base"),
            col("rev").as("rev_base"))
        val delta = view(o.filter(col("o_orderkey") % 97 === 0))
          .select(col("nation"), col("n").as("n_delta"),
            col("rev").as("rev_delta"))
        val full = view(o).select(col("nation"), col("n").as("n_full"),
          col("rev").as("rev_full"))
        base.join(delta, Seq("nation"), "full_outer")
          .select(col("nation"),
            coalesce(col("n_base"), lit(0L)).as("n_base"),
            coalesce(col("n_delta"), lit(0L)).as("n_delta"),
            (coalesce(col("n_base"), lit(0L))
              + coalesce(col("n_delta"), lit(0L))).as("n_after"),
            (coalesce(col("rev_base"), lit(0.0))
              + coalesce(col("rev_delta"), lit(0.0))).as("rev_after"))
          .join(full, Seq("nation"))
          .select(col("nation"), col("n_base"), col("n_delta"),
            col("n_after"), round(col("rev_after"), 2).as("rev_after"),
            (col("n_after") === col("n_full")
              && abs(col("rev_after") - col("rev_full")) < 1e-6)
              .as("incremental_matches_full"))
          .orderBy("nation")
      },
      Some("""WITH v AS (
             |  SELECT c_nationkey AS nation,
             |    CASE WHEN o_orderkey % 97 = 0 THEN 1 ELSE 0 END AS is_delta,
             |    CAST(o_totalprice AS DOUBLE) AS p
             |  FROM orders JOIN customer ON o_custkey = c_custkey),
             |agg AS (
             |  SELECT nation,
             |    CAST(SUM(1 - is_delta) AS BIGINT) AS n_base,
             |    CAST(SUM(is_delta) AS BIGINT) AS n_delta,
             |    SUM(CASE WHEN is_delta = 0 THEN p ELSE 0.0 END) AS rev_base,
             |    SUM(CASE WHEN is_delta = 1 THEN p ELSE 0.0 END) AS rev_delta,
             |    COUNT(*) AS n_full, SUM(p) AS rev_full
             |  FROM v GROUP BY 1)
             |SELECT nation, n_base, n_delta,
             |  n_base + n_delta AS n_after,
             |  ROUND(rev_base + rev_delta, 2) AS rev_after,
             |  (n_base + n_delta = n_full
             |    AND ABS(rev_base + rev_delta - rev_full) < 1e-6)
             |    AS incremental_matches_full
             |FROM agg ORDER BY nation""".stripMargin)),

    Q("schema_drift_union", // schema evolution across batches: an old
      // extract without o_orderpriority unions with a new one that has
      // it (unionByName + allowMissingColumns — positional union would
      // be silently wrong). Missing values surface as an explicit
      // '(pre-schema)' bucket. The reference's whole design is
      // schema-adaptive (SURVEY.md §1.3); this is that identity applied
      // to batch evolution.
      (s, d) => {
        val o = t(s, d, "orders")
        val v1 = o.filter(col("o_orderkey") % 2 === 0)
          .select("o_orderkey", "o_totalprice")
        val v2 = o.filter(col("o_orderkey") % 2 =!= 0)
          .select("o_orderkey", "o_totalprice", "o_orderpriority")
        v1.unionByName(v2, allowMissingColumns = true)
          .groupBy(coalesce(col("o_orderpriority"), lit("(pre-schema)"))
            .as("priority"))
          .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
          .orderBy("priority")
      },
      Some("""WITH unioned AS (
             |  SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority
             |  FROM orders WHERE o_orderkey % 2 = 0
             |  UNION ALL
             |  SELECT o_orderkey, o_totalprice, o_orderpriority
             |  FROM orders WHERE o_orderkey % 2 <> 0)
             |SELECT COALESCE(o_orderpriority, '(pre-schema)') AS priority,
             |  COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
             |FROM unioned GROUP BY priority ORDER BY priority""".stripMargin)),

    Q("merge_upsert_orders", // upsert/merge semantics without a table
      // format: updates take precedence via full-outer + COALESCE — the
      // keyed-merge shape a snapshot-compaction job runs at scale (both
      // sides shuffle once on the merge key)
      (s, d) => {
        val orders = t(s, d, "orders")
        val updates = orders.filter(col("o_orderkey") % 100 === 0)
          .select(col("o_orderkey").as("u_key"),
            round(col("o_totalprice") * 1.1, 2).as("u_price"),
            lit("U").as("u_status"))
        orders.join(updates, col("o_orderkey") === col("u_key"), "full_outer")
          .select(
            coalesce(col("u_key"), col("o_orderkey")).as("k"),
            coalesce(col("u_price"), col("o_totalprice")).as("price"),
            coalesce(col("u_status"), col("o_orderstatus")).as("status"))
          .groupBy("status")
          .agg(count(lit(1)).as("n"), round(sum("price"), 2).as("total"))
          .orderBy("status")
      },
      Some("""WITH updates AS (
             |  SELECT o_orderkey, ROUND(o_totalprice * 1.1, 2) AS o_totalprice,
             |    'U' AS o_orderstatus
             |  FROM orders WHERE o_orderkey % 100 = 0
             |), merged AS (
             |  SELECT COALESCE(u.o_orderkey, o.o_orderkey) AS k,
             |    COALESCE(u.o_totalprice, o.o_totalprice) AS price,
             |    COALESCE(u.o_orderstatus, o.o_orderstatus) AS status
             |  FROM orders o FULL JOIN updates u ON o.o_orderkey = u.o_orderkey
             |)
             |SELECT status, COUNT(*) AS n, ROUND(SUM(price), 2) AS total
             |FROM merged GROUP BY status ORDER BY status""".stripMargin)),

    Q("snapshot_diff_orders", // CDC generation by snapshot diff: a
      // full-outer join on the key classifies every row as insert /
      // delete / update / unchanged (update detection compares the
      // value columns, null-safe <=>). The synthetic "old" snapshot
      // drops every 7th order and discounts every 5th — deterministic,
      // so the oracle rebuilds both sides. One shuffle on the key; at
      // scale this is the standard way to derive a change feed from
      // table formats that don't record one.
      (s, d) => {
        val now = t(s, d, "orders")
        val old = now.filter(col("o_orderkey") % 7 =!= 0)
          .withColumn("o_totalprice",
            when(col("o_orderkey") % 5 === 0, round(col("o_totalprice") * 0.9, 2))
              .otherwise(col("o_totalprice")))
        val o = old.select(col("o_orderkey").as("k"),
          col("o_totalprice").as("old_price"))
        val n = now.select(col("o_orderkey").as("k2"),
          col("o_totalprice").as("new_price"))
        o.join(n, col("k") === col("k2"), "full_outer")
          .select(
            when(col("k").isNull, "insert")
              .when(col("k2").isNull, "delete")
              .when(!(col("old_price") <=> col("new_price")), "update")
              .otherwise("unchanged").as("change_type"))
          .groupBy("change_type").agg(count(lit(1)).as("n"))
          .orderBy("change_type")
      },
      Some("""WITH old AS (
             |  SELECT o_orderkey AS k,
             |    CASE WHEN o_orderkey % 5 = 0 THEN ROUND(o_totalprice * 0.9, 2)
             |         ELSE o_totalprice END AS old_price
             |  FROM orders WHERE o_orderkey % 7 <> 0),
             |new AS (SELECT o_orderkey AS k2, o_totalprice AS new_price FROM orders)
             |SELECT CASE WHEN k IS NULL THEN 'insert'
             |            WHEN k2 IS NULL THEN 'delete'
             |            WHEN old_price IS DISTINCT FROM new_price THEN 'update'
             |            ELSE 'unchanged' END AS change_type,
             |  COUNT(*) AS n
             |FROM old FULL OUTER JOIN new ON k = k2
             |GROUP BY change_type ORDER BY change_type""".stripMargin)),

    Q("events_hll_daily_union", // mergeable-sketch rollup: one HLL
      // sketch per day (datasketches, deterministic), unioned into the
      // period's distinct-user estimate WITHOUT rescanning the days —
      // the incremental pattern for maintaining distinct counts over an
      // unbounded stream of partitions. Oracle contract: day count and
      // the exact period cardinality hash-match DuckDB; the sketch-union
      // estimate is asserted within 5% of exact in-query (ApproxAggSpec
      // pins the tighter per-fixture error).
      (s, d) => {
        val ev = t(s, d, "events")
        val exact = ev.agg(countDistinct(col("user_id"))).head().getLong(0)
        val daily = ev
          .groupBy(col("ts").cast("date").as("day"))
          .agg(hll_sketch_agg(col("user_id")).as("sk"))
        daily.agg(
          count(lit(1)).as("n_days"),
          lit(exact).as("exact_distinct_users"),
          (abs(hll_sketch_estimate(hll_union_agg(col("sk"))) - exact) <=
            lit(0.05) * exact).as("est_within_bound"))
      },
      Some("""SELECT COUNT(DISTINCT CAST(ts AS DATE)) AS n_days,
             |COUNT(DISTINCT user_id) AS exact_distinct_users,
             |true AS est_within_bound FROM events""".stripMargin)),

    Q("events_cms_user_counts", // RELATIONAL count-min sketch: the
      // 4×256 cell table is built by ONE hash aggregation (map-side
      // combine collapses each partition to ≤ depth·width partials —
      // wire cost is the sketch, not the stream), estimates are
      // min-over-depth joins against it. The hash family is plain
      // integer arithmetic ((a·k+b) mod p mod w), so unlike the
      // built-in CMS object every cell and estimate is replayed
      // bit-for-bit by the oracle; est ≥ exact is the one-sided
      // contract (overcount column shows the collision cost).
      (s, d) => {
        val ev = t(s, d, "events")
        val cells = graft.operators.Sketches.countMinCells(ev, "user_id")
        val top = ev.groupBy("user_id").agg(count(lit(1)).as("exact_n"))
          .orderBy(col("exact_n").desc, col("user_id")).limit(10)
        graft.operators.Sketches.cmsEstimate(cells, top, "user_id")
          .join(top, Seq("user_id"))
          .select(col("user_id"), col("exact_n"), col("cms_est"),
            (col("cms_est") - col("exact_n")).as("overcount"))
          .orderBy(col("exact_n").desc, col("user_id"))
      },
      Some("""WITH h(i, a, b) AS (VALUES (0, 1000003, 17), (1, 999983, 911),
             |  (2, 1000033, 3571), (3, 1000037, 7919)),
             |cells AS (
             |  SELECT i, ((a * ((user_id % 2147483647 + 2147483647) % 2147483647) + b) % 2147483647) % 256 AS bucket,
             |    COUNT(*) AS cnt
             |  FROM events, h GROUP BY 1, 2),
             |top AS (
             |  SELECT user_id, COUNT(*) AS exact_n FROM events GROUP BY 1
             |  ORDER BY exact_n DESC, user_id LIMIT 10),
             |est AS (
             |  SELECT t.user_id, MIN(c.cnt) AS cms_est
             |  FROM top t, h JOIN cells c ON c.i = h.i
             |    AND c.bucket = ((h.a * ((t.user_id % 2147483647 + 2147483647) % 2147483647) + h.b) % 2147483647) % 256
             |  GROUP BY 1)
             |SELECT t.user_id, t.exact_n, e.cms_est,
             |  e.cms_est - t.exact_n AS overcount
             |FROM top t JOIN est e USING (user_id)
             |ORDER BY exact_n DESC, user_id""".stripMargin)),

    Q("events_bloom_fpr", // RELATIONAL Bloom filter, measured: bits
      // from day-1 users (3 integer-arithmetic hashes into 1024
      // positions — a mergeable relation, not an opaque bitmap), later
      // users probed against it, and the observed false-positive rate
      // reported next to the (bits_set/m)^k theoretical — the
      // calibration check a pipeline runs before trusting a bloom
      // pre-filter at scale. Everything is exact integers except the
      // two final ratios.
      (s, d) => {
        val ev = t(s, d, "events")
        val d0 = ev.agg(min(col("ts").cast("date"))).head().getDate(0)
        val s0 = ev.filter(col("ts").cast("date") === lit(d0))
          .select("user_id").distinct()
        val bits = graft.operators.Sketches.bloomBits(s0, "user_id")
          .localCheckpoint(eager = false) // probe join + bit count
        val probes = ev.select("user_id").distinct()
          .join(s0, Seq("user_id"), "left_anti")
        val nMembers = s0.count(); val bitsSet = bits.count()
        val q = lit(bitsSet.toDouble) / lit(1024.0)
        graft.operators.Sketches.bloomProbe(bits, probes, "user_id")
          .agg(count(lit(1)).as("n_probes"),
            sum(when(col("bloom_positive"), 1L).otherwise(0L))
              .as("false_positives"))
          .select(lit(nMembers).as("n_members"), lit(bitsSet).as("bits_set"),
            col("n_probes"), col("false_positives"),
            round(col("false_positives").cast("double") / col("n_probes"), 6)
              .as("fpr_observed"),
            round(q * q * q, 6).as("fpr_theoretical"))
      },
      Some("""WITH d0 AS (SELECT MIN(CAST(ts AS DATE)) AS day FROM events),
             |s0 AS (SELECT DISTINCT user_id FROM events
             |  WHERE CAST(ts AS DATE) = (SELECT day FROM d0)),
             |h(a, b) AS (VALUES (1000003, 17), (999983, 911), (1000033, 3571)),
             |bits AS (SELECT DISTINCT ((a * ((user_id % 2147483647 + 2147483647) % 2147483647) + b) % 2147483647) % 1024 AS pos
             |  FROM s0, h),
             |probes AS (SELECT DISTINCT user_id FROM events
             |  WHERE user_id NOT IN (SELECT user_id FROM s0)),
             |pp AS (SELECT user_id, ((a * ((user_id % 2147483647 + 2147483647) % 2147483647) + b) % 2147483647) % 1024 AS pos
             |  FROM probes, h),
             |pr AS (SELECT user_id,
             |    MIN(CASE WHEN pos IN (SELECT pos FROM bits) THEN 1 ELSE 0 END) AS hit
             |  FROM pp GROUP BY 1)
             |SELECT (SELECT COUNT(*) FROM s0) AS n_members,
             |  (SELECT COUNT(*) FROM bits) AS bits_set,
             |  COUNT(*) AS n_probes,
             |  CAST(SUM(hit) AS BIGINT) AS false_positives,
             |  ROUND(CAST(SUM(hit) AS DOUBLE) / COUNT(*), 6) AS fpr_observed,
             |  ROUND(((SELECT COUNT(*) FROM bits) / 1024.0)
             |    * ((SELECT COUNT(*) FROM bits) / 1024.0)
             |    * ((SELECT COUNT(*) FROM bits) / 1024.0), 6) AS fpr_theoretical
             |FROM pr""".stripMargin)),

    Q("events_cuped", // CUPED variance reduction (Deng et al. 2013):
      // each user's post-period metric is adjusted by θ·(pre-period
      // covariate), θ = cov(pre, post)/var(pre) — the standard lever
      // that shrinks experiment confidence intervals for free. ONE
      // user-grain rollup + ONE moments aggregate (Σx Σy Σxx Σyy Σxy n)
      // gives θ, the adjusted variance (var_y − cov²/var_x, closed
      // form — no second pass over users) and the reduction ratio
      // (= corr²). Values ride as EXACT integer cents through every
      // aggregate (r8 boundary audit: the raw-double-sum form left
      // var_adjusted ~2e3 ulps from a rounding boundary with sum-order
      // slack; integer sums are order-free, and the closing scalar
      // chain on exact inputs is bit-deterministic in any engine).
      // Dollar-unit outputs divide once at the end (cents² / 1e4).
      (s, d) => {
        val ev = t(s, d, "events")
        val d0 = ev.agg(min(col("ts").cast("date"))).head().getDate(0)
        val cut = java.sql.Date.valueOf(d0.toLocalDate.plusDays(15))
        val cents = round(col("value") * 100, 0).cast("long")
        val u = ev.groupBy("user_id").agg(
          sum(when(col("ts").cast("date") < lit(cut), cents)
            .otherwise(0L)).as("x"),
          sum(when(col("ts").cast("date") >= lit(cut), cents)
            .otherwise(0L)).as("y"))
        val m = u.agg(count(lit(1)).cast("double").as("n"),
          sum("x").cast("double").as("sx"),
          sum("y").cast("double").as("sy"),
          sum(col("x") * col("x")).cast("double").as("sxx"),
          sum(col("y") * col("y")).cast("double").as("syy"),
          sum(col("x") * col("y")).cast("double").as("sxy"))
        m.select(
            col("n"), col("sy"),
            ((col("sxy") - col("sx") * col("sy") / col("n")) / col("n"))
              .as("cxy"),
            ((col("sxx") - col("sx") * col("sx") / col("n")) / col("n"))
              .as("vx"),
            ((col("syy") - col("sy") * col("sy") / col("n")) / col("n"))
              .as("vy"))
          .select(col("n").cast("long").as("n_users"),
            round(col("cxy") / col("vx"), 6).as("theta"),
            round(col("sy") / (lit(100.0) * col("n")), 6).as("mean_post"),
            round(col("vy") / 10000.0, 6).as("var_post"),
            round((col("vy") - col("cxy") * col("cxy") / col("vx"))
              / 10000.0, 6).as("var_adjusted"),
            round(col("cxy") * col("cxy") / (col("vx") * col("vy")), 6)
              .as("var_reduction"))
      },
      Some("""WITH cut AS (
             |  SELECT MIN(CAST(ts AS DATE)) + 15 AS c FROM events),
             |u AS (
             |  SELECT user_id,
             |    SUM(CASE WHEN CAST(ts AS DATE) < (SELECT c FROM cut)
             |      THEN CAST(ROUND(value * 100, 0) AS BIGINT)
             |      ELSE 0 END) AS x,
             |    SUM(CASE WHEN CAST(ts AS DATE) >= (SELECT c FROM cut)
             |      THEN CAST(ROUND(value * 100, 0) AS BIGINT)
             |      ELSE 0 END) AS y
             |  FROM events GROUP BY 1),
             |m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             |    CAST(SUM(x) AS DOUBLE) AS sx,
             |    CAST(SUM(y) AS DOUBLE) AS sy,
             |    CAST(SUM(x * x) AS DOUBLE) AS sxx,
             |    CAST(SUM(y * y) AS DOUBLE) AS syy,
             |    CAST(SUM(x * y) AS DOUBLE) AS sxy FROM u),
             |s AS (SELECT n, sy,
             |    (sxy - sx * sy / n) / n AS cxy,
             |    (sxx - sx * sx / n) / n AS vx,
             |    (syy - sy * sy / n) / n AS vy FROM m)
             |SELECT CAST(n AS BIGINT) AS n_users,
             |  ROUND(cxy / vx, 6) AS theta,
             |  ROUND(sy / (100.0 * n), 6) AS mean_post,
             |  ROUND(vy / 10000.0, 6) AS var_post,
             |  ROUND((vy - cxy * cxy / vx) / 10000.0, 6) AS var_adjusted,
             |  ROUND(cxy * cxy / (vx * vy), 6) AS var_reduction
             |FROM s""".stripMargin)),

    Q("events_power_analysis", // sample-size calculator: n per arm =
      // 2(z_α/2+z_β)²σ²/δ² (two-sided α=.05, power .8) for an MDE grid
      // of 1/2/5/10% of the per-user value mean — the "how long must
      // this experiment run" table CUPED's variance feeds into. One
      // user rollup + one moments aggregate; the z constants are
      // spelled identically in both engines and ceil lands far from
      // integer boundaries.
      (s, d) => {
        val u = t(s, d, "events").groupBy("user_id")
          .agg(sum("value").as("v"))
        val z = lit(1.959964) + lit(0.841621)
        u.agg(avg("v").as("mu"),
            (avg(col("v") * col("v")) - avg("v") * avg("v")).as("s2"))
          .select(col("mu"), col("s2"),
            explode(typedLit(Seq(1, 2, 5, 10))).as("mde_pct"))
          .select(col("mde_pct"),
            round(col("mu") * col("mde_pct") / 100.0, 6).as("mde_abs"),
            ceil(lit(2.0) * z * z * col("s2")
              / ((col("mu") * col("mde_pct") / 100.0)
                * (col("mu") * col("mde_pct") / 100.0)))
              .cast("long").as("n_per_arm"))
          .orderBy("mde_pct")
      },
      Some("""WITH u AS (
             |  SELECT user_id, SUM(value) AS v FROM events GROUP BY 1),
             |m AS (SELECT AVG(v) AS mu,
             |    AVG(v * v) - AVG(v) * AVG(v) AS s2 FROM u),
             |g AS (SELECT mu, s2, unnest([1, 2, 5, 10]) AS mde_pct FROM m)
             |SELECT mde_pct,
             |  ROUND(mu * mde_pct / 100.0, 6) AS mde_abs,
             |  CAST(ceil(2.0 * (1.959964 + 0.841621) * (1.959964 + 0.841621)
             |    * s2 / ((mu * mde_pct / 100.0) * (mu * mde_pct / 100.0)))
             |    AS BIGINT) AS n_per_arm
             |FROM g ORDER BY mde_pct""".stripMargin)),

    Q("events_jackknife_ci", // delete-1 jackknife over the daily grain:
      // the resampling-free CI for "mean daily events" — θᵢ =
      // (T − tᵢ)/(n−1) is CLOSED FORM off one daily rollup (no loop,
      // no reshuffle per replicate; the same trick makes jackknife
      // viable over 100 TB when bootstrap resampling isn't), variance
      // = (n−1)/n · Σ(θᵢ − θ̂)². Daily counts are exact integers; the
      // replicate sum is the one float aggregation, rounded.
      (s, d) => {
        val daily = t(s, d, "events")
          .groupBy(col("ts").cast("date").as("day"))
          .agg(count(lit(1)).as("cnt"))
        val (tT, n) = {
          val r = daily.agg(sum("cnt"), count(lit(1))).head()
          (r.getLong(0), r.getLong(1))
        }
        val theta = tT.toDouble / n
        val thetaI = (lit(tT.toDouble) - col("cnt")) / lit((n - 1).toDouble)
        val se = sqrt(sum((thetaI - lit(theta)) * (thetaI - lit(theta)))
          * lit((n - 1).toDouble) / lit(n.toDouble))
        daily.agg(
          lit(n).as("n_days"),
          round(lit(theta), 6).as("mean_daily"),
          round(se, 6).as("jackknife_se"),
          round(lit(theta) - lit(1.96) * se, 6).as("ci_lo"),
          round(lit(theta) + lit(1.96) * se, 6).as("ci_hi"))
      },
      Some("""WITH daily AS (
             |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS cnt
             |  FROM events GROUP BY 1),
             |tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS T, COUNT(*) AS n FROM daily),
             |j AS (SELECT (T - cnt) / (n - 1) AS ti, T / n AS th, n
             |  FROM daily, tot)
             |SELECT CAST(MAX(n) AS BIGINT) AS n_days,
             |  ROUND(MAX(th), 6) AS mean_daily,
             |  ROUND(sqrt(SUM((ti - th) * (ti - th))
             |    * (MAX(n) - 1.0) / MAX(n)), 6) AS jackknife_se,
             |  ROUND(MAX(th) - 1.96 * sqrt(SUM((ti - th) * (ti - th))
             |    * (MAX(n) - 1.0) / MAX(n)), 6) AS ci_lo,
             |  ROUND(MAX(th) + 1.96 * sqrt(SUM((ti - th) * (ti - th))
             |    * (MAX(n) - 1.0) / MAX(n)), 6) AS ci_hi
             |FROM j""".stripMargin)),

    Q("events_monthly_from_daily", // incremental rollup: the monthly agg
      // re-aggregates DAY-grained partials (sum of sums / sum of counts) —
      // the materialized-view pattern that turns a 100 TB backfill into a
      // ≤366-row-per-key re-aggregation
      (s, d) => {
        val daily = t(s, d, "events")
          .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
          .agg(count(lit(1)).as("n"), sum("value").as("v"))
        daily
          .groupBy(date_format(col("day"), "yyyy-MM").as("month"), col("event_type"))
          .agg(sum("n").as("n"), round(sum("v"), 2).as("total_value"))
          .orderBy("month", "event_type")
      },
      Some("""WITH daily AS (
             |  SELECT date_trunc('day', ts) AS day, event_type,
             |    COUNT(*) AS n, SUM(value) AS v
             |  FROM events GROUP BY day, event_type
             |)
             |SELECT strftime(date_trunc('month', day), '%Y-%m') AS month, event_type,
             |  CAST(SUM(n) AS BIGINT) AS n, ROUND(SUM(v), 2) AS total_value
             |FROM daily GROUP BY month, event_type ORDER BY month, event_type""".stripMargin)),

    Q("orders_priority_histogram",
      (s, d) => t(s, d, "orders").groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), round(avg("o_totalprice"), 2).as("avg_price"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority, COUNT(*) AS n, ROUND(AVG(o_totalprice), 2) AS avg_price
             |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    Q("events_delete_propagation", // right-to-be-forgotten at 100 TB:
      // deleting a user cohort (user_id % 97 = 0 stands in for the
      // deletion list) updates the daily aggregate INCREMENTALLY — one
      // narrow scan of only the deleted users' rows builds a delta that
      // subtracts from the maintained aggregate, instead of a full
      // recompute over the corpus. The oracle IS the full recompute:
      // old − delta must equal the direct aggregate over survivors.
      (s, d) => {
        val ev = t(s, d, "events")
        val old = ev
          .groupBy(col("ts").cast("date").as("day"))
          .agg(count(lit(1)).as("n"), sum("value").as("v"))
        // the deletion delta touches only the cohort's rows (a pushed-down
        // predicate scan at scale, not a second full pass)
        val delta = ev.filter(pmod(col("user_id"), lit(97)) === 0)
          .groupBy(col("ts").cast("date").as("day"))
          .agg(count(lit(1)).as("dn"), sum("value").as("dv"))
        old.join(delta, Seq("day"), "left_outer")
          .select(col("day").cast("string").as("day"),
            (col("n") - coalesce(col("dn"), lit(0L))).as("n"),
            round(col("v") - coalesce(col("dv"), lit(0.0)), 2).as("total_value"))
          .filter(col("n") > 0)
          .orderBy("day")
      },
      Some("""SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, COUNT(*) AS n,
             |ROUND(SUM(value), 2) AS total_value
             |FROM events WHERE user_id % 97 <> 0
             |GROUP BY CAST(ts AS DATE) ORDER BY day""".stripMargin)),

    Q("subq_q17_small_qty", // TPC-H Q17 shape: correlated scalar subquery;
      // Catalyst decorrelates it into a per-partkey aggregate joined back —
      // no per-row re-execution (plan pinned in PlanQualitySpec)
      (s, d) => {
        Tables.registerAll(s, d)
        s.sql(subqQ17Sql)
      },
      Some(subqQ17Sql)),

    Q("subq_exists_urgent", // EXISTS-correlated subquery → left semi join
      (s, d) => {
        Tables.registerAll(s, d)
        s.sql(subqExistsSql)
      },
      Some(subqExistsSql)),

    Q("subq_above_avg", // uncorrelated scalar subquery: one scalar broadcast
      (s, d) => {
        Tables.registerAll(s, d)
        s.sql(subqAboveAvgSql)
      },
      Some(subqAboveAvgSql)),

    Q("subq_not_in_null_aware", // ANSI three-valued NOT IN: one NULL in
      // the subquery makes the predicate UNKNOWN for every outer row —
      // the poisoned variant MUST return 0 while the clean variant
      // returns the parts never ordered. Spark compiles this to a
      // null-aware anti join; a naive anti-join rewrite gets the
      // poisoned count wrong, which is exactly what this pins.
      (s, d) => {
        Tables.registerAll(s, d)
        s.sql(subqNotInSql)
      },
      Some(subqNotInSql)),

    Q("set_bag_ops", // multiset INTERSECT ALL / EXCEPT ALL (bag
      // semantics — min / truncated-difference of multiplicities),
      // distinct from the DISTINCT-flavored set_* queries: the 1995 and
      // 1996 shipment part bags keep duplicates. The same ANSI text
      // runs on both engines; the bag result rolls up per key for a
      // compact deterministic output.
      (s, d) => {
        Tables.registerAll(s, d)
        s.sql(setBagOpsSql)
      },
      Some(setBagOpsSql)),

    Q("subq_recursive_spine", // WITH RECURSIVE (new in Spark 4): a
      // recursive month spine left-joined to the 1995 order rollup so
      // zero months surface — the same ANSI text runs on both engines.
      // The recursion is driver-cheap (12 rows); the rollup is one hash
      // agg over the pruned year.
      (s, d) => {
        Tables.registerAll(s, d)
        s.sql(subqRecursiveSql)
      },
      Some(subqRecursiveSql)),

    Q("subq_recursive_reach", // WITH RECURSIVE doing real iteration: a
      // per-level recursive join walks the >=2-shared-orders co-purchase
      // edge list 3 hops out from the min-keyed seed part, min-hop
      // dedup + histogram at the end — the declarative twin of the
      // DataFrame BFS (graph_bfs_hops), running the same ANSI text on
      // both engines. Walk count is bounded by the sparse edge set and
      // the hop cap, the standard UNION ALL recursion contract.
      (s, d) => {
        coPurchasePairs(s, d).filter(col("n") >= 2).select("src", "dst")
          .createOrReplaceTempView("copurchase_edges")
        s.sql(subqRecursiveReachSparkSql)
      },
      Some(subqRecursiveReachSql)),

    Q("subq_lateral_top2", // correlated LATERAL subquery with ORDER BY +
      // LIMIT (top-n per outer row): Catalyst's DecorrelateInnerQuery
      // rewrites it into a per-nation ranked join — no per-row
      // re-execution — the same plan a window top-k compiles to, but
      // declared through the ANSI lateral-join surface both engines share.
      (s, d) => {
        Tables.registerAll(s, d)
        s.sql(subqLateralSql)
      },
      Some(subqLateralSql)),

    Q("agg_sql_udf_net", // Spark 4 SQL scalar UDF (CREATE TEMPORARY
      // FUNCTION ... RETURN <expr>): the Q1 net-revenue arithmetic as a
      // declarative reusable function — Catalyst inlines the body, so
      // the plan is identical to writing the expression inline (stays
      // codegen'd, no black-box UDF). Oracle inlines the same formula.
      (s, d) => {
        Tables.registerAll(s, d)
        s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_net(
                |  p DECIMAL(12,2), disc DECIMAL(12,2), tax DECIMAL(12,2))
                |RETURNS DOUBLE
                |RETURN CAST(p * (1 - disc) * (1 + tax) AS DOUBLE)""".stripMargin)
        s.sql("""SELECT l_returnflag,
                |  ROUND(SUM(graft_net(l_extendedprice, l_discount, l_tax)), 2)
                |    AS net_revenue,
                |  COUNT(*) AS n
                |FROM lineitem GROUP BY l_returnflag
                |ORDER BY l_returnflag""".stripMargin)
      },
      Some("""SELECT l_returnflag,
             |  ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
             |    * (1 + l_tax) AS DOUBLE)), 2) AS net_revenue,
             |  COUNT(*) AS n
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    Q("agg_pipe_syntax", // Spark 4 SQL pipe syntax (|>): the linear
      // scan → filter → aggregate → order dataflow written as a pipe
      // chain — parses to the identical logical plan as the ANSI form
      // the oracle runs (DuckDB has no pipes, so the oracle is the
      // de-sugared twin).
      (s, d) => {
        Tables.registerAll(s, d)
        s.sql("""FROM orders
                ||> WHERE o_orderstatus = 'O'
                ||> AGGREGATE COUNT(*) AS n,
                |     ROUND(CAST(SUM(o_totalprice) AS DOUBLE), 2) AS total
                |   GROUP BY o_orderpriority
                ||> ORDER BY o_orderpriority""".stripMargin)
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS n,
             |  ROUND(CAST(SUM(o_totalprice) AS DOUBLE), 2) AS total
             |FROM orders WHERE o_orderstatus = 'O'
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    Q("distinct_count_parts", // COUNT(DISTINCT) — exact, one extra shuffle
      (s, d) => t(s, d, "lineitem").agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps")),
      Some("SELECT COUNT(DISTINCT l_partkey) AS n_parts, COUNT(DISTINCT l_suppkey) AS n_supps FROM lineitem")),

    Q("orders_pivot_status", // §2.4 — pivot: one hash agg, statuses as
      // columns (explicit value list keeps it single-pass; an unlisted
      // pivot would first run a distinct scan to discover the values)
      (s, d) => t(s, d, "orders").groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0, Seq("F", "O", "P"))
        .select(col("o_orderpriority"), col("F").as("n_f"),
          col("O").as("n_o"), col("P").as("n_p"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
             |COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
             |COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
             |COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
             |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    Q("lineitem_unpivot_measures", // §2.4 — unpivot/melt (the pivot's
      // inverse, wide→long): ONE hash agg computes the four monthly
      // measure sums, then Dataset.unpivot melts the wide row into
      // (month, measure, value) rows — the explode happens on the
      // ~month-count aggregate, never on the fact table, so the long
      // form costs 4 extra rows per month, not a 4× fact scan.
      (s, d) => {
        val wide = t(s, d, "lineitem")
          .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("month"))
          .agg(round(sum("l_quantity").cast("double"), 2).as("sum_qty"),
            round(sum("l_extendedprice").cast("double"), 2).as("sum_price"),
            round(sum("l_discount").cast("double"), 2).as("sum_disc"),
            round(sum("l_tax").cast("double"), 2).as("sum_tax"))
        wide.unpivot(Array(col("month")),
            Array(col("sum_qty"), col("sum_price"), col("sum_disc"),
              col("sum_tax")), "measure", "value")
          .orderBy("month", "measure")
      },
      Some("""WITH wide AS (
             |  SELECT strftime(l_shipdate, '%Y-%m') AS month,
             |    ROUND(CAST(SUM(l_quantity) AS DOUBLE), 2) AS sum_qty,
             |    ROUND(CAST(SUM(l_extendedprice) AS DOUBLE), 2) AS sum_price,
             |    ROUND(CAST(SUM(l_discount) AS DOUBLE), 2) AS sum_disc,
             |    ROUND(CAST(SUM(l_tax) AS DOUBLE), 2) AS sum_tax
             |  FROM lineitem GROUP BY month)
             |SELECT month, 'sum_qty' AS measure, sum_qty AS value FROM wide
             |UNION ALL
             |SELECT month, 'sum_price', sum_price FROM wide
             |UNION ALL
             |SELECT month, 'sum_disc', sum_disc FROM wide
             |UNION ALL
             |SELECT month, 'sum_tax', sum_tax FROM wide
             |ORDER BY month, measure""".stripMargin)),

    Q("agg_group_percentile", // exact per-group median over a bounded-
      // cardinality group key: the per-group value buffer is the built-in
      // percentile's single-reducer hazard, but HERE each group is one of
      // ≤3 return flags — the global-scope case uses Scale.exactQuantiles
      // instead (agg_exact_percentiles). l_quantity is integer-valued, so
      // the interpolated midpoint is exact in binary doubles and matches
      // DuckDB's quantile_cont bit-for-bit.
      (s, d) => t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(expr("percentile(l_quantity, 0.5)").as("p50_qty"),
          expr("percentile(l_quantity, 0.9)").as("p90_qty"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS p50_qty,
             |quantile_cont(l_quantity, 0.9) AS p90_qty
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    Q("scale_bloom_semijoin", // bloom-prefiltered semi join: the build side
      // (rare high-quantity lineitems) sketches its keys, ~99% of orders
      // drop before the shuffle, false positives die in the exact join —
      // the oracle IS the plain EXISTS, results bit-identical
      (s, d) => Scale.bloomPrefilteredJoin(
          t(s, d, "orders"),
          t(s, d, "lineitem").filter(col("l_quantity") > 49)
            .select(col("l_orderkey")),
          "o_orderkey", "l_orderkey", joinType = "left_semi")
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("total_price")),
      Some("""SELECT COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS total_price
             |FROM orders WHERE EXISTS (
             |SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 49)""".stripMargin)),

    Q("join_range_binned", // interval join (price → band) rewritten as an
      // equi-join on a bin key (Scale.binnedRangeJoin) — the non-equi form
      // is a broadcast nested loop, O(facts × ranges)
      (s, d) => {
        val bands = s.range(0, 11).select(
          (col("id") * 10000.0).as("lo"), ((col("id") + 1) * 10000.0).as("hi"))
        Scale.binnedRangeJoin(
            t(s, d, "lineitem").select("l_extendedprice"), "l_extendedprice",
            bands, "lo", "hi", binWidth = 10000.0)
          .groupBy(col("lo").as("band_lo"))
          .agg(count(lit(1)).as("n"),
            round(avg("l_extendedprice"), 2).as("avg_price"))
          .orderBy("band_lo")
      },
      Some("""SELECT lo AS band_lo, COUNT(*) AS n,
             |ROUND(AVG(l_extendedprice), 2) AS avg_price
             |FROM (SELECT i * 10000.0 AS lo, (i + 1) * 10000.0 AS hi
             |      FROM range(0, 11) t(i))
             |JOIN lineitem ON l_extendedprice >= lo AND l_extendedprice < hi
             |GROUP BY lo ORDER BY band_lo""".stripMargin)),

    Q("q6_revenue_delta", // TPC-H Q6 shape: every predicate pushes to the
      // parquet scan (date range + discount band + quantity cap), one
      // map-side partial agg, no shuffle of any width
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00"))
          && col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00"))
          && col("l_discount").between(0.05, 0.07)
          && col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue")),
      Some("""SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
             |AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin)),

    Q("q10_returned_revenue", // TPC-H Q10 shape: returned-item revenue per
      // customer; orders date-pruned before the fact join, nation broadcast
      (s, d) => {
        val o = t(s, d, "orders")
          .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00"))
            && col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1996-07-01 00:00:00")))
        t(s, d, "lineitem").filter(col("l_returnflag") === "R")
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
          .groupBy("c_custkey", "c_name", "n_name")
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
          .select("c_custkey", "c_name", "revenue", "n_name")
          .orderBy(col("revenue").desc, col("c_custkey")).limit(20)
      },
      Some("""SELECT c_custkey, c_name,
             |ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue, n_name
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |JOIN nation ON c_nationkey = n_nationkey
             |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
             |AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
             |AND l_returnflag = 'R'
             |GROUP BY c_custkey, c_name, n_name
             |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin)),

    Q("q14_promo_share", // TPC-H Q14 shape: conditional aggregation
      // (CASE inside SUM) over a month-pruned fact join
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1996-03-01 00:00:00"))
          && col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1996-04-01 00:00:00")))
        .join(t(s, d, "part"), col("l_partkey") === col("p_partkey"))
        .agg(round(lit(100.0)
          * sum(when(col("p_type") === "PROMO",
              col("l_extendedprice") * (lit(1) - col("l_discount"))).otherwise(0))
          / sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("promo_revenue_pct")),
      Some("""SELECT ROUND(100.00 * SUM(CASE WHEN p_type = 'PROMO'
             |THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             | / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
             |AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'""".stripMargin)),

    Q("q15_top_supplier", // TPC-H Q15 shape: argmax over a derived
      // aggregate — the per-supplier revenue is computed ONCE, its scalar
      // max broadcast back via a 1-row cross join (the CTE-twice form
      // re-scans the fact table)
      (s, d) => {
        val rev = t(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00"))
            && col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1996-04-01 00:00:00")))
          .groupBy(col("l_suppkey").as("supplier_no"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("total_revenue"))
          .localCheckpoint()
        rev.join(broadcast(rev.agg(max("total_revenue").as("mx"))),
            col("total_revenue") === col("mx"))
          .join(t(s, d, "supplier"), col("s_suppkey") === col("supplier_no"))
          .select("s_suppkey", "s_name", "total_revenue")
          .orderBy("s_suppkey")
      },
      Some("""WITH rev AS (
             |  SELECT l_suppkey AS supplier_no,
             |    ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
             |  FROM lineitem
             |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
             |  GROUP BY l_suppkey)
             |SELECT s_suppkey, s_name, total_revenue
             |FROM supplier JOIN rev ON s_suppkey = supplier_no
             |WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
             |ORDER BY s_suppkey""".stripMargin)),

    Q("q18_big_orders", // TPC-H Q18 shape: HAVING on a grouped fact,
      // survivors (rare) joined back to orders + customer
      (s, d) => {
        val big = t(s, d, "lineitem").groupBy("l_orderkey")
          .agg(sum("l_quantity").as("sum_qty"))
          .filter(col("sum_qty") > 150)
        big.join(t(s, d, "orders"), col("o_orderkey") === col("l_orderkey"))
          .join(t(s, d, "customer"), col("c_custkey") === col("o_custkey"))
          .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
            col("o_orderdate").cast("string").as("o_orderdate"),
            col("o_totalprice"), round(col("sum_qty"), 2).as("sum_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(20)
      },
      Some("""SELECT c_custkey, c_name, o_orderkey,
             |CAST(o_orderdate AS VARCHAR) AS o_orderdate, o_totalprice,
             |ROUND(sum_qty, 2) AS sum_qty
             |FROM (SELECT l_orderkey, SUM(l_quantity) AS sum_qty FROM lineitem
             |      GROUP BY l_orderkey HAVING SUM(l_quantity) > 150) big
             |JOIN orders ON o_orderkey = l_orderkey
             |JOIN customer ON c_custkey = o_custkey
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin)),

    Q("q19_disjunctive", // TPC-H Q19 shape: OR-of-ANDs predicate spanning
      // both join sides — Catalyst extracts the common join key so it stays
      // an equi-join (not a nested loop), residual disjunction as filter
      (s, d) => t(s, d, "lineitem")
        .join(t(s, d, "part"), col("p_partkey") === col("l_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 5)
            && col("l_quantity").between(1, 11))
          || (col("p_brand") === "Brand#2" && col("p_size").between(1, 10)
            && col("l_quantity").between(10, 20))
          || (col("p_brand") === "Brand#3" && col("p_size").between(1, 15)
            && col("l_quantity").between(20, 30)))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n")),
      Some("""SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
             |COUNT(*) AS n
             |FROM lineitem JOIN part ON p_partkey = l_partkey
             |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
             |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
             |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin)),

    Q("scale_zorder_codes", // Morton (Z-order) clustering key: bit-
      // interleave (l_partkey, l_suppkey) so one sort yields min/max
      // skipping envelopes on both columns (Scale.mortonCode /
      // writeZOrdered; layout effect pinned in ScaleSpec)
      (s, d) => t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"),
          Scale.mortonCode(col("l_partkey"), col("l_suppkey")).as("z"))
        .orderBy(col("z"), col("l_orderkey"), col("l_linenumber"))
        .limit(100),
      Some(s"""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
              |(${mortonSqlExpr("l_partkey", "l_suppkey", 21)}) AS z
              |FROM lineitem ORDER BY z, l_orderkey, l_linenumber LIMIT 100""".stripMargin)),

    Q("scale_bucketed_join", // co-located fact-fact join through a
      // persisted BUCKETED layout: both tables hash-bucketed (8 buckets)
      // and sorted on the join key at write time, so the join reads
      // pre-shuffled buckets — the plan's SortMergeJoin has NO Exchange
      // on either input (pinned in PlanQualitySpec); the only shuffle
      // left is the final small aggregation. At 100 TB this is THE join
      // strategy for repeated fact-fact joins: the shuffle is paid once
      // at layout time, not per query. Written once (warmup/setup pass),
      // read-only when timed.
      (s, d) => {
        val tag = new java.io.File(d).getName.replace(".", "_")
        def ensure(short: String, df: => DataFrame, key: String): String = {
          val tbl = s"graft_bkt_${short}_$tag"
          if (!s.catalog.tableExists(tbl))
            df.write.mode("overwrite").format("parquet")
              .bucketBy(8, key).sortBy(key)
              .option("path", s"/tmp/graft_bkt_${short}_$tag")
              .saveAsTable(tbl)
          tbl
        }
        val ot = ensure("orders", t(s, d, "orders"), "o_orderkey")
        val lt = ensure("lineitem", t(s, d, "lineitem"), "l_orderkey")
        s.table(ot).join(s.table(lt),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_items"),
            round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
              .as("revenue"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS n_items,
             |  ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)))

  /** The same bit-interleave [[Scale.mortonCode]] builds, as DuckDB SQL
    * text (fully parenthesized — DuckDB's bitwise-operator precedence
    * differs from arithmetic).
    */
  private def mortonSqlExpr(aCol: String, bCol: String, bits: Int): String =
    (0 until bits).map(i =>
      s"(((($aCol >> $i) & 1) << ${2 * i}) | ((($bCol >> $i) & 1) << ${2 * i + 1}))")
      .mkString(" | ")

  private def ts(s: String) = lit(java.sql.Timestamp.valueOf(s + " 00:00:00"))

  // Remaining TPC-H plan shapes, adapted to the reduced fixture schema
  // (no partsupp / commitdate / receiptdate / shipmode — FIXTURES.md §2):
  // "late" is l_shipdate relative to o_orderdate, supply cost is a fixed
  // fraction of p_retailprice, and Q16's part-supplier pairs come from
  // lineitem. Each query exists for its distinct plan shape; at 100 TB the
  // comments on each say which side broadcasts and where the shuffles are.
  private def tpchShapeQueries: Seq[Q] = Seq(
    Q("q2_min_cost_supplier", // TPC-H Q2 shape: argmin per group with
      // join-back — cheapest supplier per part from lineitem unit prices
      // (no partsupp in the fixtures). The window ranks inside each
      // part's partition only; ties break on the supplier key so the
      // row_number is total. Dims join AFTER the rank prunes to one row
      // per part.
      (s, d) => {
        val w = Window.partitionBy("l_partkey")
          .orderBy(col("unit_cost").asc, col("l_suppkey"))
        t(s, d, "lineitem")
          .select(col("l_partkey"), col("l_suppkey"),
            (col("l_extendedprice") / col("l_quantity")).as("unit_cost"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .join(t(s, d, "part").filter(col("p_size") <= 10),
            col("l_partkey") === col("p_partkey"))
          .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .select(col("p_partkey"), col("p_name"), col("s_name"),
            round(col("unit_cost"), 4).as("unit_cost"))
          .orderBy("p_partkey").limit(50)
      },
      Some("""SELECT p_partkey, p_name, s_name,
             |ROUND(unit_cost, 4) AS unit_cost
             |FROM (
             |  SELECT l_partkey, l_suppkey,
             |    l_extendedprice / l_quantity AS unit_cost,
             |    ROW_NUMBER() OVER (PARTITION BY l_partkey
             |      ORDER BY l_extendedprice / l_quantity, l_suppkey) AS rn
             |  FROM lineitem) x
             |JOIN part ON l_partkey = p_partkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |WHERE rn = 1 AND p_size <= 10
             |ORDER BY p_partkey LIMIT 50""".stripMargin)),

    Q("q4_priority_wait", // TPC-H Q4 shape: date-pruned orders, EXISTS →
      // left_semi with a non-equi residual (ship after order date); the
      // semi join keeps the fact table from multiplying rows
      (s, d) => t(s, d, "orders")
        .filter(col("o_orderdate") >= ts("1996-07-01")
          && col("o_orderdate") < ts("1996-10-01"))
        .join(t(s, d, "lineitem").select("l_orderkey", "l_shipdate"),
          col("o_orderkey") === col("l_orderkey")
            && col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority, COUNT(*) AS order_count
             |FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
             |AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
             |AND EXISTS (SELECT 1 FROM lineitem
             |            WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    Q("q7_nation_volume", // TPC-H Q7 shape: bidirectional nation-pair
      // trade volume by year — both nation dims broadcast, the disjunctive
      // pair filter applies after, fact-fact joins shuffle on their keys
      (s, d) => {
        val n1 = broadcast(t(s, d, "nation")
          .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
        val n2 = broadcast(t(s, d, "nation")
          .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation")))
        t(s, d, "lineitem")
          .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .join(n1, col("s_nationkey") === col("s_nk"))
          .join(n2, col("c_nationkey") === col("c_nk"))
          .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2")
            || (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).as("l_year"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      },
      Some("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             |EXTRACT(YEAR FROM l_shipdate) AS l_year,
             |ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
             |FROM lineitem
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation n1 ON s_nationkey = n1.n_nationkey
             |JOIN nation n2 ON c_nationkey = n2.n_nationkey
             |WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             |   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
             |GROUP BY supp_nation, cust_nation, l_year
             |ORDER BY supp_nation, cust_nation, l_year""".stripMargin)),

    Q("q8_market_share", // TPC-H Q8 shape: one nation's share of a
      // region's market per year — conditional numerator over the same
      // aggregated rows, so the fact tables are scanned exactly once
      (s, d) => {
        val asiaCust = t(s, d, "customer")
          .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "ASIA")
          .select("c_custkey")
        val suppNation = broadcast(t(s, d, "nation")
          .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
        t(s, d, "lineitem")
          .join(t(s, d, "part").filter(col("p_type") === "STANDARD"),
            col("l_partkey") === col("p_partkey"))
          .join(t(s, d, "orders")
            .filter(col("o_orderdate") >= ts("1995-01-01")
              && col("o_orderdate") < ts("1997-01-01")),
            col("l_orderkey") === col("o_orderkey"))
          .join(asiaCust, col("o_custkey") === col("c_custkey"), "left_semi")
          .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .join(suppNation, col("s_nationkey") === col("s_nk"))
          .groupBy(year(col("o_orderdate")).as("o_year"))
          .agg(round(
            sum(when(col("supp_nation") === "NATION_3",
              col("l_extendedprice") * (lit(1) - col("l_discount"))).otherwise(0.0))
              / sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 6)
            .as("mkt_share"))
          .orderBy("o_year")
      },
      Some("""SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
             |ROUND(SUM(CASE WHEN n1.n_name = 'NATION_3'
             |  THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             | / SUM(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
             |FROM lineitem
             |JOIN part ON l_partkey = p_partkey
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation n1 ON s_nationkey = n1.n_nationkey
             |WHERE p_type = 'STANDARD'
             |AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
             |AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
             |AND o_custkey IN (
             |  SELECT c_custkey FROM customer
             |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
             |  JOIN region ON n2.n_regionkey = r_regionkey
             |  WHERE r_name = 'ASIA')
             |GROUP BY o_year ORDER BY o_year""".stripMargin)),

    Q("q9_profit_by_nation", // TPC-H Q9 shape: profit by supplier nation
      // and year for a part-name family; cost is a retailprice fraction
      // (no partsupp in the fixtures). part filter prunes before the join.
      // profit terms are summed as DECIMAL: float64 addition is not
      // associative, so Spark's partial-agg order vs DuckDB's sequential
      // order lands half-cent totals on opposite sides of ROUND. Exact
      // decimal sums are order-independent; round there, then back to
      // double so both engines emit the identical float64.
      (s, d) => t(s, d, "lineitem")
        .join(t(s, d, "part").filter(col("p_name").like("%widget%")),
          col("l_partkey") === col("p_partkey"))
        .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(t(s, d, "orders").select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(round(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))
            - col("l_quantity") * col("p_retailprice") * lit(0.1))
          .cast("decimal(28,6)")), 2).cast("double").as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc),
      Some("""SELECT n_name AS nation, EXTRACT(YEAR FROM o_orderdate) AS o_year,
             |CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
             |  - l_quantity * p_retailprice * 0.1 AS DECIMAL(28,6))), 2)
             |  AS DOUBLE) AS sum_profit
             |FROM lineitem
             |JOIN part ON l_partkey = p_partkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN orders ON l_orderkey = o_orderkey
             |WHERE p_name LIKE '%widget%'
             |-- GROUP BY n_name, not the alias: "nation" names a table here
             |GROUP BY n_name, o_year ORDER BY nation, o_year DESC""".stripMargin)),

    Q("q11_balance_share", // TPC-H Q11 shape: HAVING against a global
      // scalar — the threshold is one row, broadcast back via cross join
      // rather than recomputing the grouped input twice
      // The scalar is executed first and inlined as a literal — exactly
      // what Catalyst's ScalarSubquery does; the grouped plan then has no
      // nested-loop join at all (PlanQualitySpec bans them suite-wide).
      (s, d) => {
        val sup = t(s, d, "supplier")
        val thresh = sup.agg(sum("s_acctbal") * 0.05).first().getDouble(0)
        sup.join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
          .groupBy("n_name").agg(sum("s_acctbal").as("bal"))
          .filter(col("bal") > lit(thresh))
          .select(col("n_name"), round(col("bal"), 2).as("value"))
          .orderBy(col("value").desc, col("n_name"))
      },
      Some("""SELECT n_name, ROUND(SUM(s_acctbal), 2) AS value
             |FROM supplier JOIN nation ON s_nationkey = n_nationkey
             |GROUP BY n_name
             |HAVING SUM(s_acctbal) > (SELECT SUM(s_acctbal) * 0.05 FROM supplier)
             |ORDER BY value DESC, n_name""".stripMargin)),

    Q("q12_late_priority", // TPC-H Q12 shape: dual conditional counts
      // (CASE inside SUM) over a date-pruned fact join; linestatus stands
      // in for shipmode
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01")
          && col("l_shipdate") < ts("1997-01-01"))
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate"))
        .groupBy("l_linestatus")
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count"))
        .orderBy("l_linestatus"),
      Some("""SELECT l_linestatus,
             |CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
             |  THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             |CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
             |  THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
             |AND l_shipdate > o_orderdate
             |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin)),

    Q("q13_order_count_dist", // TPC-H Q13 shape: groupBy of a groupBy —
      // customer order counts, then the distribution of those counts.
      // The left outer join keeps zero-order customers in the histogram.
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey").agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count").agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc),
      Some("""SELECT c_count, COUNT(*) AS custdist
             |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
             |      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
             |      GROUP BY c_custkey) c_orders
             |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin)),

    Q("q16_supplier_cnt", // TPC-H Q16 shape: COUNT(DISTINCT) per part
      // attribute with a NOT IN exclusion — the exclusion list is tiny and
      // broadcast as a left_anti; part-supplier pairs come from lineitem
      (s, d) => {
        val bad = t(s, d, "supplier").filter(col("s_acctbal") < 1000)
          .select("s_suppkey")
        t(s, d, "lineitem").select("l_partkey", "l_suppkey")
          .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "left_anti")
          .join(t(s, d, "part").filter(col("p_brand") =!= "Brand#1"
            && col("p_type") =!= "PROMO"),
            col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand", "p_type", "p_size")
          .agg(countDistinct("l_suppkey").as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
          .limit(50)
      },
      Some("""SELECT p_brand, p_type, p_size,
             |COUNT(DISTINCT l_suppkey) AS supplier_cnt
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
             |AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
             |GROUP BY p_brand, p_type, p_size
             |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size LIMIT 50""".stripMargin)),

    Q("q20_qty_semi_chain", // TPC-H Q20 shape: nested semi-join chain —
      // suppliers whose shipped quantity of a part family in one year
      // clears a threshold; the HAVING survivors drive a left_semi into
      // the (small) supplier dim
      (s, d) => {
        val bigs = t(s, d, "lineitem")
          .filter(col("l_shipdate") >= ts("1996-01-01")
            && col("l_shipdate") < ts("1997-01-01"))
          .join(broadcast(t(s, d, "part").filter(col("p_name").like("%widget%"))
            .select("p_partkey")),
            col("l_partkey") === col("p_partkey"), "left_semi")
          .groupBy("l_suppkey").agg(sum("l_quantity").as("qty"))
          .filter(col("qty") > 100)
        t(s, d, "supplier")
          .join(bigs, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
          .select("s_name", "n_name")
          .orderBy("s_name")
      },
      Some("""SELECT s_name, n_name
             |FROM supplier JOIN nation ON s_nationkey = n_nationkey
             |WHERE s_suppkey IN (
             |  SELECT l_suppkey FROM lineitem
             |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
             |  AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%widget%')
             |  GROUP BY l_suppkey HAVING SUM(l_quantity) > 100)
             |ORDER BY s_name""".stripMargin)),

    Q("q21_waiting_supplier", // TPC-H Q21 shape: EXISTS + NOT EXISTS over
      // lineitem self-joins — late is ship > order date + 60 days (no
      // receipt/commit dates in the fixtures). One semi and one anti join
      // on the order key; no row multiplication anywhere.
      (s, d) => {
        val late = col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS")
        val l1 = t(s, d, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
          .join(t(s, d, "orders").filter(col("o_orderstatus") === "F")
            .select("o_orderkey", "o_orderdate"),
            col("l_orderkey") === col("o_orderkey"))
          .filter(late)
        val l2 = t(s, d, "lineitem")
          .select(col("l_orderkey").as("k2"), col("l_suppkey").as("sk2"))
        val l3 = t(s, d, "lineitem")
          .select(col("l_orderkey").as("k3"), col("l_suppkey").as("sk3"),
            col("l_shipdate").as("ship3"))
        l1.join(l2, col("l_orderkey") === col("k2")
            && col("l_suppkey") =!= col("sk2"), "left_semi")
          .join(l3, col("l_orderkey") === col("k3")
            && col("l_suppkey") =!= col("sk3")
            && col("ship3") > col("o_orderdate") + expr("INTERVAL 60 DAYS"), "left_anti")
          .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .groupBy("s_name").agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name")).limit(20)
      },
      Some("""SELECT s_name, COUNT(*) AS numwait
             |FROM lineitem l1
             |JOIN orders ON l1.l_orderkey = o_orderkey
             |JOIN supplier ON l1.l_suppkey = s_suppkey
             |WHERE o_orderstatus = 'F'
             |AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
             |AND EXISTS (SELECT 1 FROM lineitem l2
             |  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
             |AND NOT EXISTS (SELECT 1 FROM lineitem l3
             |  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
             |  AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
             |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin)),

    Q("q22_idle_customers", // TPC-H Q22 shape: anti join against orders +
      // an uncorrelated scalar subquery threshold; cntrycode is the
      // nationkey band (no phone column in the fixtures)
      // Scalar-first like q11: the average is one tiny job, inlined as a
      // literal so the main plan is scan → anti join → agg with no
      // nested-loop scalar fan-out.
      (s, d) => {
        val cust = t(s, d, "customer")
        val avgBal = cust.filter(col("c_acctbal") > 0)
          .agg(avg("c_acctbal")).first().getDouble(0)
        cust.filter(col("c_acctbal") > lit(avgBal))
          .join(t(s, d, "orders").select("o_custkey"),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy((col("c_nationkey") % 10).as("cntrycode"))
          .agg(count(lit(1)).as("numcust"), round(sum("c_acctbal"), 2).as("totacctbal"))
          .orderBy("cntrycode")
      },
      Some("""SELECT c_nationkey % 10 AS cntrycode, COUNT(*) AS numcust,
             |ROUND(SUM(c_acctbal), 2) AS totacctbal
             |FROM customer
             |WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
             |AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin)),

    Q("basket_part_pairs", // market-basket co-occurrence: part pairs
      // ordered together most often. Distinct (order, part) first so
      // multi-line parts don't inflate counts; the self-join is keyed on
      // the order — quadratic only within one order's ~7 distinct parts,
      // the same bounded blow-up as a posting list. Reads the shared
      // co-purchase pair index (coPurchasePairs) — this aggregation IS
      // that index, so seven sibling graph/basket queries reuse it.
      (s, d) => coPurchasePairs(s, d)
        .select(col("src").as("part_a"), col("dst").as("part_b"),
          col("n").as("n_orders"))
        .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
        .limit(20),
      Some("""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
             |SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             |COUNT(*) AS n_orders
             |FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
             |AND a.l_partkey < b.l_partkey
             |GROUP BY part_a, part_b
             |ORDER BY n_orders DESC, part_a, part_b LIMIT 20""".stripMargin)),

    Q("basket_freq_itemsets", // frequent itemsets via MLlib FP-Growth —
      // the generalization of basket_part_pairs past size 2 without
      // enumerating the powerset. Counts are exact (FP-tree is an exact
      // algorithm; nothing seeded), output bounded by a total order and
      // capped at size ≤ 3 so the oracle can enumerate the same sets as
      // three self-joins; FpmSpec additionally pins the tree mining.
      (s, d) => {
        import org.apache.spark.ml.fpm.FPGrowth
        val baskets = orderPartPairs(s, d)
          .groupBy("l_orderkey").agg(collect_set("l_partkey").as("items"))
        val model = new FPGrowth().setItemsCol("items")
          .setMinSupport(0.002).fit(baskets)
        model.freqItemsets
          .filter(size(col("items")) <= 3)
          .select(array_join(transform(array_sort(col("items")),
            x => x.cast("string")), ",").as("itemset"),
            size(col("items")).as("k"), col("freq"))
          .orderBy(col("freq").desc, col("itemset"))
          .limit(30)
      },
      Some("""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
             |th AS (SELECT CAST(ceil(0.002 * COUNT(DISTINCT l_orderkey)) AS BIGINT) AS c
             |       FROM lineitem),
             |s1 AS (SELECT CAST(l_partkey AS VARCHAR) AS itemset, 1 AS k, COUNT(*) AS freq
             |       FROM op GROUP BY l_partkey HAVING COUNT(*) >= (SELECT c FROM th)),
             |s2 AS (SELECT CAST(a.l_partkey AS VARCHAR) || ',' || CAST(b.l_partkey AS VARCHAR) AS itemset,
             |         2 AS k, COUNT(*) AS freq
             |       FROM op a JOIN op b
             |         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             |       GROUP BY a.l_partkey, b.l_partkey
             |       HAVING COUNT(*) >= (SELECT c FROM th)),
             |s3 AS (SELECT CAST(a.l_partkey AS VARCHAR) || ',' || CAST(b.l_partkey AS VARCHAR)
             |         || ',' || CAST(c3.l_partkey AS VARCHAR) AS itemset, 3 AS k, COUNT(*) AS freq
             |       FROM op a
             |       JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             |       JOIN op c3 ON a.l_orderkey = c3.l_orderkey AND b.l_partkey < c3.l_partkey
             |       GROUP BY a.l_partkey, b.l_partkey, c3.l_partkey
             |       HAVING COUNT(*) >= (SELECT c FROM th))
             |SELECT itemset, k, freq
             |FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2 UNION ALL SELECT * FROM s3)
             |ORDER BY freq DESC, itemset LIMIT 30""".stripMargin)),

    Q("graph_pagerank", // 5 PageRank rounds on the customer→supplier
      // purchase graph (ids prefixed so the key spaces can't collide).
      // Iterative numeric graph computation as join+aggregate rounds —
      // the oracle unrolls the same five iterations as chained CTEs.
      // Ranks order on the ROUNDED value: contribution sums are float
      // and the two engines add in different orders.
      (s, d) => {
        // rounds run on LONG ids (even=customer, odd=supplier — the
        // same collision-free encoding the label-propagation query
        // uses): five join+agg rounds shuffle 8-byte keys instead of
        // prefixed strings; the reader-facing 'c'/'s' ids are mapped
        // back AFTER the iteration, on the node-sized result
        val edges = custSuppEdges(s, d)
          .select((col("ck") * 2).as("src"), (col("sk") * 2 + 1).as("dst"))
        graft.operators.Graph.pageRank(edges, iters = 5,
            distinctEdges = true)
          .select(
            when(col("id") % 2 === 0,
              concat(lit("c"), (col("id") / 2).cast("long")))
              .otherwise(concat(lit("s"), ((col("id") - 1) / 2).cast("long")))
              .as("id"),
            round(col("rank"), 8).as("rank"))
          .orderBy(col("rank").desc, col("id")).limit(30)
      },
      Some("""WITH edges AS (
             |  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
             |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
             |nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
             |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
             |deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS deg FROM edges GROUP BY src),
             |r0 AS (SELECT id, 1.0 / (SELECT n FROM nn) AS rank FROM nodes),
             |r1 AS (
             |  SELECT nodes.id,
             |    0.15 / (SELECT n FROM nn) + 0.85 * COALESCE(m.mass, 0) AS rank
             |  FROM nodes LEFT JOIN (
             |    SELECT dst AS id, SUM(r.rank / deg.deg) AS mass
             |    FROM edges JOIN r0 r ON edges.src = r.id
             |    JOIN deg ON edges.src = deg.src
             |    GROUP BY dst) m ON nodes.id = m.id),
             |r2 AS (
             |  SELECT nodes.id,
             |    0.15 / (SELECT n FROM nn) + 0.85 * COALESCE(m.mass, 0) AS rank
             |  FROM nodes LEFT JOIN (
             |    SELECT dst AS id, SUM(r.rank / deg.deg) AS mass
             |    FROM edges JOIN r1 r ON edges.src = r.id
             |    JOIN deg ON edges.src = deg.src
             |    GROUP BY dst) m ON nodes.id = m.id),
             |r3 AS (
             |  SELECT nodes.id,
             |    0.15 / (SELECT n FROM nn) + 0.85 * COALESCE(m.mass, 0) AS rank
             |  FROM nodes LEFT JOIN (
             |    SELECT dst AS id, SUM(r.rank / deg.deg) AS mass
             |    FROM edges JOIN r2 r ON edges.src = r.id
             |    JOIN deg ON edges.src = deg.src
             |    GROUP BY dst) m ON nodes.id = m.id),
             |r4 AS (
             |  SELECT nodes.id,
             |    0.15 / (SELECT n FROM nn) + 0.85 * COALESCE(m.mass, 0) AS rank
             |  FROM nodes LEFT JOIN (
             |    SELECT dst AS id, SUM(r.rank / deg.deg) AS mass
             |    FROM edges JOIN r3 r ON edges.src = r.id
             |    JOIN deg ON edges.src = deg.src
             |    GROUP BY dst) m ON nodes.id = m.id),
             |r5 AS (
             |  SELECT nodes.id,
             |    0.15 / (SELECT n FROM nn) + 0.85 * COALESCE(m.mass, 0) AS rank
             |  FROM nodes LEFT JOIN (
             |    SELECT dst AS id, SUM(r.rank / deg.deg) AS mass
             |    FROM edges JOIN r4 r ON edges.src = r.id
             |    JOIN deg ON edges.src = deg.src
             |    GROUP BY dst) m ON nodes.id = m.id)
             |SELECT id, ROUND(rank, 8) AS rank FROM r5
             |ORDER BY rank DESC, id LIMIT 30""".stripMargin)),

    Q("graph_personalized_pagerank", // localized relevance: 5 rounds of
      // PageRank whose teleport restarts ONLY into nation-7 customers —
      // "which suppliers matter to this cohort". Same long-id iteration
      // and string-id output mapping as graph_pagerank; the Spark side
      // moves a frontier-sized vector (rank<>0 filter — bitwise
      // semantics-preserving, see Graph.personalizedPageRank), the
      // oracle unrolls the identical five seeded rounds.
      (s, d) => {
        val edges = custSuppEdges(s, d)
          .select((col("ck") * 2).as("src"), (col("sk") * 2 + 1).as("dst"))
        val seeds = t(s, d, "customer").filter(col("c_nationkey") === 7)
          .select((col("c_custkey") * 2).as("id"))
        graft.operators.Graph.personalizedPageRank(edges, seeds, iters = 5,
            distinctEdges = true)
          .select(
            when(col("id") % 2 === 0,
              concat(lit("c"), (col("id") / 2).cast("long")))
              .otherwise(concat(lit("s"), ((col("id") - 1) / 2).cast("long")))
              .as("id"),
            round(col("rank"), 8).as("rank"))
          .orderBy(col("rank").desc, col("id")).limit(30)
      },
      Some {
        def rnd(prev: String, cur: String): String =
          s"""$cur AS (
             |  SELECT nodes.id,
             |    (CASE WHEN nodes.id IN (SELECT id FROM sn)
             |       THEN 0.15 / (SELECT n FROM ns) ELSE 0.0 END)
             |    + 0.85 * COALESCE(m.mass, 0) AS rank
             |  FROM nodes LEFT JOIN (
             |    SELECT dst AS id, SUM(r.rank / deg.deg) AS mass
             |    FROM edges JOIN $prev r ON edges.src = r.id
             |    JOIN deg ON edges.src = deg.src
             |    GROUP BY dst) m ON nodes.id = m.id)""".stripMargin
        s"""WITH edges AS (
           |  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
           |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
           |nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
           |sn AS (SELECT id FROM nodes
           |  WHERE id IN (SELECT 'c' || c_custkey FROM customer WHERE c_nationkey = 7)),
           |ns AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM sn),
           |deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS deg FROM edges GROUP BY src),
           |r0 AS (SELECT id,
           |  CASE WHEN id IN (SELECT id FROM sn)
           |    THEN 1.0 / (SELECT n FROM ns) ELSE 0.0 END AS rank FROM nodes),
           |${rnd("r0", "r1")},
           |${rnd("r1", "r2")},
           |${rnd("r2", "r3")},
           |${rnd("r3", "r4")},
           |${rnd("r4", "r5")}
           |SELECT id, ROUND(rank, 8) AS rank FROM r5
           |ORDER BY rank DESC, id LIMIT 30""".stripMargin
      }),

    Q("graph_label_communities", // synchronous label-propagation
      // community detection, 3 rounds on the symmetrized purchase graph
      // (numeric ids: customers even, suppliers odd, so the key spaces
      // can't collide and the min-label tie-break is a plain long
      // order). Counts are integers, so the unrolled-CTE oracle matches
      // bit-exactly — no float addition-order slack needed.
      (s, d) => {
        val edges = custSuppEdges(s, d)
          .select((col("ck") * 2).as("src"), (col("sk") * 2 + 1).as("dst"))
        graft.operators.Graph.labelPropagation(edges, iters = 3,
            canonicalEdges = true)
          .groupBy(col("label").as("community"))
          .agg(count(lit(1)).as("size"))
          .orderBy(col("size").desc, col("community")).limit(20)
      },
      Some("""WITH e0 AS (
             |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
             |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
             |sym AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
             |l0 AS (SELECT DISTINCT src AS id, src AS label FROM sym),
             |l1 AS (
             |  SELECT src AS id, label FROM (
             |    SELECT s.src, l.label,
             |      ROW_NUMBER() OVER (PARTITION BY s.src
             |        ORDER BY COUNT(*) DESC, l.label) AS rn
             |    FROM sym s JOIN l0 l ON s.dst = l.id
             |    GROUP BY s.src, l.label) WHERE rn = 1),
             |l2 AS (
             |  SELECT src AS id, label FROM (
             |    SELECT s.src, l.label,
             |      ROW_NUMBER() OVER (PARTITION BY s.src
             |        ORDER BY COUNT(*) DESC, l.label) AS rn
             |    FROM sym s JOIN l1 l ON s.dst = l.id
             |    GROUP BY s.src, l.label) WHERE rn = 1),
             |l3 AS (
             |  SELECT src AS id, label FROM (
             |    SELECT s.src, l.label,
             |      ROW_NUMBER() OVER (PARTITION BY s.src
             |        ORDER BY COUNT(*) DESC, l.label) AS rn
             |    FROM sym s JOIN l2 l ON s.dst = l.id
             |    GROUP BY s.src, l.label) WHERE rn = 1)
             |SELECT label AS community, COUNT(*) AS size FROM l3
             |GROUP BY label ORDER BY size DESC, community LIMIT 20""".stripMargin)),

    Q("graph_triangles", // triangle census of the co-purchase part graph
      // (parts sharing an order): compact-forward wedge join over
      // degree-oriented edges — outdeg capped at O(√m), so the wedge
      // shuffle survives celebrity nodes. Integer counts; only the
      // clustering coefficient is float, rounded identically both sides.
      (s, d) => graft.operators.Graph.triangleStats(
        coPurchasePairs(s, d).select("src", "dst"), canonicalEdges = true),
      Some("""WITH li AS (
             |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
             |e AS (
             |  SELECT DISTINCT LEAST(a.pk, b.pk) AS a, GREATEST(a.pk, b.pk) AS b
             |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk),
             |deg AS (
             |  SELECT id, COUNT(*) AS d FROM (
             |    SELECT a AS id FROM e UNION ALL SELECT b FROM e) x
             |  GROUP BY id),
             |tri AS (
             |  SELECT COUNT(*) AS t FROM e e1
             |  JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
             |  JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
             |w AS (SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS nw FROM deg)
             |SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
             |  (SELECT COUNT(*) FROM e) AS n_edges,
             |  w.nw AS n_wedges,
             |  CAST(tri.t AS BIGINT) AS n_triangles,
             |  ROUND(3.0 * tri.t / w.nw, 6) AS clustering_coeff
             |FROM tri, w""".stripMargin)),

    Q("graph_kcore", // fixed-round k-core peeling (k=3, 4 rounds) over
      // the co-purchase part graph (parts sharing >= 2 orders). Each
      // round drops nodes whose surviving degree is < k — at sf0.01 the
      // cascade runs 1243 -> 1078 -> 1019 -> 983 survivors, so the fixed
      // rounds genuinely iterate. Broadcast semi joins keep the edge
      // list unshuffled per round (Graph.kCore); the oracle unrolls the
      // identical four rounds. Survivor degrees are integers — bit-exact.
      (s, d) => graft.operators.Graph.kCore(
          coPurchasePairs(s, d).filter(col("n") >= 2).select("src", "dst"),
          k = 3, rounds = 4, canonicalEdges = true)
        .orderBy(col("deg").desc, col("id")).limit(100),
      Some("""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
             |p AS (SELECT a.l_partkey AS src, b.l_partkey AS dst
             |  FROM op a JOIN op b
             |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
             |a0 AS (SELECT src, dst FROM p UNION SELECT dst, src FROM p),
             |k1 AS (SELECT src AS id FROM a0 GROUP BY src HAVING COUNT(*) >= 3),
             |a1 AS (SELECT src, dst FROM a0
             |  WHERE src IN (SELECT id FROM k1) AND dst IN (SELECT id FROM k1)),
             |k2 AS (SELECT src AS id FROM a1 GROUP BY src HAVING COUNT(*) >= 3),
             |a2 AS (SELECT src, dst FROM a1
             |  WHERE src IN (SELECT id FROM k2) AND dst IN (SELECT id FROM k2)),
             |k3 AS (SELECT src AS id FROM a2 GROUP BY src HAVING COUNT(*) >= 3),
             |a3 AS (SELECT src, dst FROM a2
             |  WHERE src IN (SELECT id FROM k3) AND dst IN (SELECT id FROM k3)),
             |k4 AS (SELECT src AS id FROM a3 GROUP BY src HAVING COUNT(*) >= 3),
             |a4 AS (SELECT src, dst FROM a3
             |  WHERE src IN (SELECT id FROM k4) AND dst IN (SELECT id FROM k4))
             |SELECT src AS id, COUNT(*) AS deg FROM a4 GROUP BY src
             |ORDER BY deg DESC, id LIMIT 100""".stripMargin)),

    Q("graph_harmonic_centrality", // harmonic centrality of a seed
      // cohort: Σ 1/dist over everything the 5 smallest nodes reach in
      // 4 BFS rounds — the distance-discounted reach score that (unlike
      // closeness) stays defined on disconnected graphs. Rides the
      // same relational Pregel-BFS rounds as graph_bfs_hops; the
      // oracle unrolls four frontiers and sums the identical
      // reciprocals (rounded — the one float aggregation).
      (s, d) => {
        val edges = custSuppEdges(s, d)
          .select((col("ck") * 2).as("src"), (col("sk") * 2 + 1).as("dst"))
        val nodes = edges.select(col("src").as("id"))
          .union(edges.select(col("dst").as("id")))
          .distinct()
        val seeds = nodes.orderBy("id").limit(5)
        graft.operators.Graph.bfsHops(edges, seeds, rounds = 4,
            canonicalEdges = true)
          .agg(
            sum(when(col("dist") === 0, 1L).otherwise(0L)).as("n_seeds"),
            sum(when(col("dist") > 0, 1L).otherwise(0L)).as("n_reached"),
            round(sum(when(col("dist") > 0, lit(1.0) / col("dist"))), 6)
              .as("harmonic"))
      },
      Some("""WITH e0 AS (
             |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
             |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
             |sym AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
             |seeds AS (SELECT id FROM (
             |    SELECT src AS id FROM sym UNION SELECT dst FROM sym)
             |  ORDER BY id LIMIT 5),
             |d0 AS (SELECT id, 0 AS dist FROM seeds),
             |f1 AS (SELECT DISTINCT dst AS id FROM sym
             |  JOIN d0 ON sym.src = d0.id
             |  WHERE dst NOT IN (SELECT id FROM d0)),
             |v1 AS (SELECT id, dist FROM d0 UNION ALL SELECT id, 1 FROM f1),
             |f2 AS (SELECT DISTINCT dst AS id FROM sym
             |  JOIN f1 ON sym.src = f1.id
             |  WHERE dst NOT IN (SELECT id FROM v1)),
             |v2 AS (SELECT id, dist FROM v1 UNION ALL SELECT id, 2 FROM f2),
             |f3 AS (SELECT DISTINCT dst AS id FROM sym
             |  JOIN f2 ON sym.src = f2.id
             |  WHERE dst NOT IN (SELECT id FROM v2)),
             |v3 AS (SELECT id, dist FROM v2 UNION ALL SELECT id, 3 FROM f3),
             |f4 AS (SELECT DISTINCT dst AS id FROM sym
             |  JOIN f3 ON sym.src = f3.id
             |  WHERE dst NOT IN (SELECT id FROM v3)),
             |v4 AS (SELECT id, dist FROM v3 UNION ALL SELECT id, 4 FROM f4)
             |SELECT
             |  CAST(SUM(CASE WHEN dist = 0 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_seeds,
             |  CAST(SUM(CASE WHEN dist > 0 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_reached,
             |  ROUND(SUM(CASE WHEN dist > 0 THEN 1.0 / dist END), 6)
             |    AS harmonic
             |FROM v4""".stripMargin)),

    Q("graph_bfs_hops", // BFS k-hop reachability histogram from a seed
      // set (the 3 smallest node ids) over the symmetrized purchase
      // graph: 3 rounds of frontier expansion, each ONE edge join with
      // the node-sized frontier/visited sets on broadcasts — the
      // relational Pregel-BFS shape (Graph.bfsHops). The oracle unrolls
      // the identical three frontiers as chained CTEs. Integer ids and
      // counts — bit-exact.
      (s, d) => {
        val edges = custSuppEdges(s, d)
          .select((col("ck") * 2).as("src"), (col("sk") * 2 + 1).as("dst"))
        val nodes = edges.select(col("src").as("id"))
          .union(edges.select(col("dst").as("id")))
          .distinct()
        val seeds = nodes.orderBy("id").limit(3)
        graft.operators.Graph.bfsHops(edges, seeds, rounds = 3,
            canonicalEdges = true)
          .groupBy("dist").agg(count(lit(1)).as("n_nodes"))
          .orderBy("dist")
      },
      Some("""WITH e0 AS (
             |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
             |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
             |sym AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
             |seeds AS (SELECT id FROM (
             |    SELECT src AS id FROM sym UNION SELECT dst FROM sym)
             |  ORDER BY id LIMIT 3),
             |d0 AS (SELECT id, 0 AS dist FROM seeds),
             |f1 AS (SELECT DISTINCT dst AS id FROM sym
             |  JOIN d0 ON sym.src = d0.id
             |  WHERE dst NOT IN (SELECT id FROM d0)),
             |v1 AS (SELECT id, dist FROM d0 UNION ALL SELECT id, 1 FROM f1),
             |f2 AS (SELECT DISTINCT dst AS id FROM sym
             |  JOIN f1 ON sym.src = f1.id
             |  WHERE dst NOT IN (SELECT id FROM v1)),
             |v2 AS (SELECT id, dist FROM v1 UNION ALL SELECT id, 2 FROM f2),
             |f3 AS (SELECT DISTINCT dst AS id FROM sym
             |  JOIN f2 ON sym.src = f2.id
             |  WHERE dst NOT IN (SELECT id FROM v2)),
             |v3 AS (SELECT id, dist FROM v2 UNION ALL SELECT id, 3 FROM f3)
             |SELECT dist, COUNT(*) AS n_nodes FROM v3
             |GROUP BY dist ORDER BY dist""".stripMargin)),

    Q("graph_copurchase_recs", // item-to-item collaborative filtering
      // (Linden et al. 2003 shape): top-3 co-purchased parts per part by
      // co-order count. The query-part filter lands BEFORE the pair join
      // (only the `a` side prunes — the co-part side must stay whole),
      // so the quadratic stage runs over ~5% of parts; per-order pair
      // blow-up stays bounded by basket size as in basket_part_pairs.
      (s, d) => {
        // both directions of the shared canonical pair index: the co-order
        // count is symmetric, so (part, rec) rows with part <= 100 are the
        // src<=100 rows plus the mirrored dst<=100 rows — no re-join
        val cp = coPurchasePairs(s, d)
        val co = cp.filter(col("src") <= 100)
          .select(col("src").as("part"), col("dst").as("rec"),
            col("n").as("n_co"))
          .unionByName(cp.filter(col("dst") <= 100)
            .select(col("dst").as("part"), col("src").as("rec"),
              col("n").as("n_co")))
        val w = Window.partitionBy("part")
          .orderBy(col("n_co").desc, col("rec"))
        co.withColumn("rec_rank", row_number().over(w))
          .filter(col("rec_rank") <= 3)
          .orderBy("part", "rec_rank")
      },
      Some("""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
             |co AS (SELECT a.l_partkey AS part, b.l_partkey AS rec,
             |    COUNT(*) AS n_co
             |  FROM op a JOIN op b
             |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
             |  WHERE a.l_partkey <= 100
             |  GROUP BY 1, 2),
             |r AS (SELECT part, rec, n_co, ROW_NUMBER() OVER (
             |    PARTITION BY part ORDER BY n_co DESC, rec) AS rec_rank
             |  FROM co)
             |SELECT part, rec, n_co, rec_rank FROM r WHERE rec_rank <= 3
             |ORDER BY part, rec_rank""".stripMargin)),

    Q("obs_scan_metrics", // Dataset.observe: operational metrics ride
      // the SAME pass as the query (an accumulator-backed aggregate, no
      // second scan) — how a production pipeline meters rows/volume
      // without paying for a counting job. The observed values become
      // the result relation; the oracle recomputes them relationally.
      (s, d) => {
        val obs = new org.apache.spark.sql.Observation()
        val filtered = t(s, d, "lineitem")
          .filter(col("l_shipdate") >= ts("1996-01-01")
            && col("l_shipdate") < ts("1997-01-01"))
          .observe(obs, count(lit(1)).as("n_rows"),
            round(sum("l_quantity"), 2).as("total_qty"))
        filtered.write.mode("overwrite")
          .format("noop").save() // the real pipeline action
        val row = obs.get
        import s.implicits._
        Seq((row("n_rows").asInstanceOf[Long],
          row("total_qty").asInstanceOf[Double]))
          .toDF("n_rows", "total_qty")
      },
      Some("""SELECT COUNT(*) AS n_rows, ROUND(SUM(l_quantity), 2) AS total_qty
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'""".stripMargin)),

    Q("events_bitmap_distinct", // bitmap aggregate family — the
      // production pattern for EXACT distinct rollups at scale: user ids
      // shard into 32k-position buckets (bitmap_bucket_number), each
      // (month, bucket) builds one bitmap (bitmap_construct_agg), month
      // counts sum bitmap_count over buckets, and the ALL row re-rolls
      // the SAME month bitmaps with bitmap_or_agg — the re-aggregation
      // COUNT(DISTINCT) can't do without rescanning the fact table.
      // The oracle is the plain exact COUNT(DISTINCT) twin.
      (s, d) => {
        val bm = t(s, d, "events")
          .select(date_format(col("ts"), "yyyy-MM").as("month"), col("user_id"))
          .groupBy(col("month"), expr("bitmap_bucket_number(user_id)").as("bkt"))
          .agg(expr("bitmap_construct_agg(bitmap_bit_position(user_id))").as("bm"))
          .localCheckpoint(eager = false) // feeds monthly AND the ALL re-roll
        val monthly = bm
          .select(col("month"), expr("bitmap_count(bm)").as("c"))
          .groupBy("month").agg(sum("c").cast("long").as("distinct_users"))
        val overall = bm
          .groupBy("bkt").agg(expr("bitmap_or_agg(bm)").as("obm"))
          .select(expr("bitmap_count(obm)").as("c"))
          .agg(sum("c").cast("long").as("distinct_users"))
          .select(lit("ALL").as("month"), col("distinct_users"))
        monthly.unionByName(overall).orderBy("month")
      },
      Some("""SELECT strftime(ts, '%Y-%m') AS month,
             |  COUNT(DISTINCT user_id) AS distinct_users
             |FROM events GROUP BY month
             |UNION ALL
             |SELECT 'ALL', COUNT(DISTINCT user_id) FROM events
             |ORDER BY month""".stripMargin)),

    Q("lineitem_mllib_linreg", // MLlib regression with a provable twin:
      // ml.regression.LinearRegression, solver="normal" — the
      // closed-form normal-equation solve, deterministic, no seed — fit
      // on (gross price → net price). The OLS optimum is unique, so the
      // fitted slope/intercept/r² must equal the ANSI regr_* aggregates
      // the oracle computes. One aggregation pass builds the Gram
      // matrix; only the 2×2 solve runs on the driver.
      (s, d) => {
        import org.apache.spark.ml.regression.LinearRegression
        import org.apache.spark.ml.functions.array_to_vector
        val feat = t(s, d, "lineitem").select(
          array_to_vector(array(col("l_extendedprice").cast("double")))
            .as("features"),
          (col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("double").as("label"))
        val m = new LinearRegression().setSolver("normal")
          .setRegParam(0.0).fit(feat)
        val s2 = feat.sparkSession
        import s2.implicits._
        Seq((BigDecimal(m.coefficients(0)).setScale(6,
            BigDecimal.RoundingMode.HALF_UP).toDouble,
          BigDecimal(m.intercept).setScale(2,
            BigDecimal.RoundingMode.HALF_UP).toDouble,
          BigDecimal(m.summary.r2).setScale(6,
            BigDecimal.RoundingMode.HALF_UP).toDouble))
          .toDF("slope", "intercept", "r2")
      },
      Some("""SELECT
             |  ROUND(regr_slope(CAST(l_extendedprice * (1 - l_discount) AS DOUBLE),
             |    CAST(l_extendedprice AS DOUBLE)), 6) AS slope,
             |  ROUND(regr_intercept(CAST(l_extendedprice * (1 - l_discount) AS DOUBLE),
             |    CAST(l_extendedprice AS DOUBLE)), 2) AS intercept,
             |  ROUND(regr_r2(CAST(l_extendedprice * (1 - l_discount) AS DOUBLE),
             |    CAST(l_extendedprice AS DOUBLE)), 6) AS r2
             |FROM lineitem""".stripMargin)),

    Q("agg_regr_family", // ANSI SQL:2003 linear-regression aggregates
      // (regr_slope/intercept/r2/count) — one hash agg computes all
      // four moments in a single pass. The pair is net price vs gross
      // price, correlated BY CONSTRUCTION (y = x·(1−disc), disc ∈
      // [0, .1]) so r² ≈ 0.996 and the statistics sit far above
      // engine summation-order noise; the intercept (a small
      // difference of ~1e12 sums) rounds to 2 dp for the same reason.
      (s, d) => t(s, d, "lineitem").groupBy("l_returnflag")
          .agg(round(expr("regr_slope(l_extendedprice * (1 - l_discount), l_extendedprice)"), 6).as("slope"),
            round(expr("regr_intercept(l_extendedprice * (1 - l_discount), l_extendedprice)"), 2).as("intercept"),
            round(expr("regr_r2(l_extendedprice * (1 - l_discount), l_extendedprice)"), 6).as("r2"),
            expr("regr_count(l_extendedprice * (1 - l_discount), l_extendedprice)").as("n"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  ROUND(regr_slope(CAST(l_extendedprice * (1 - l_discount) AS DOUBLE),
             |    CAST(l_extendedprice AS DOUBLE)), 6) AS slope,
             |  ROUND(regr_intercept(CAST(l_extendedprice * (1 - l_discount) AS DOUBLE),
             |    CAST(l_extendedprice AS DOUBLE)), 2) AS intercept,
             |  ROUND(regr_r2(CAST(l_extendedprice * (1 - l_discount) AS DOUBLE),
             |    CAST(l_extendedprice AS DOUBLE)), 6) AS r2,
             |  regr_count(CAST(l_extendedprice * (1 - l_discount) AS DOUBLE),
             |    CAST(l_extendedprice AS DOUBLE)) AS n
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    Q("lineitem_conformal_interval", // split-conformal prediction
      // interval for the price-vs-quantity OLS fit: q = the
      // ⌈(n_cal+1)(1−α)⌉-th smallest calibration |residual| (exact
      // DISTRIBUTED order statistic — Scale.rankValues' range-
      // partitioned sort, never a global window), coverage of ŷ ± q
      // reported on the held-out fold — the distribution-free ≥ 1−α
      // eval a model ships with. Coefficients round (slope 6dp,
      // intercept 2dp — the agg_regr_family noise precedent) and
      // residuals round 6dp BEFORE ranking, so the rank order and q
      // are cross-engine deterministic.
      (s, d) => {
        val base = t(s, d, "lineitem").select(
          col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("double").as("x"),
          col("l_extendedprice").cast("double").as("y"))
        graft.operators.Learn.splitConformal(
          base.filter(col("l_orderkey") % 3 =!= 0),
          base.filter(col("l_orderkey") % 3 === 0
            && col("l_linenumber") % 2 === 1),
          base.filter(col("l_orderkey") % 3 === 0
            && col("l_linenumber") % 2 === 0),
          "x", "y", Seq("l_orderkey", "l_linenumber"), alpha = 0.1)
      },
      Some("""WITH base AS (
             |  SELECT l_orderkey, l_linenumber,
             |    CAST(l_quantity AS DOUBLE) AS x,
             |    CAST(l_extendedprice AS DOUBLE) AS y
             |  FROM lineitem),
             |f AS (SELECT ROUND(regr_slope(y, x), 6) AS m,
             |    ROUND(regr_intercept(y, x), 2) AS b
             |  FROM base WHERE l_orderkey % 3 <> 0),
             |cal AS (SELECT ROUND(ABS(y - (b + m * x)), 6) AS r,
             |    l_orderkey, l_linenumber
             |  FROM base, f WHERE l_orderkey % 3 = 0 AND l_linenumber % 2 = 1),
             |nc AS (SELECT COUNT(*) AS n FROM cal),
             |qv AS (SELECT r FROM (
             |    SELECT r, row_number() OVER (
             |      ORDER BY r, l_orderkey, l_linenumber) AS rn FROM cal)
             |  WHERE rn = LEAST(
             |    CAST(ceil(((SELECT n FROM nc) + 1) * 0.9) AS BIGINT),
             |    (SELECT n FROM nc))),
             |tst AS (SELECT ROUND(ABS(y - (b + m * x)), 6) AS r
             |  FROM base, f WHERE l_orderkey % 3 = 0 AND l_linenumber % 2 = 0)
             |SELECT
             |  (SELECT COUNT(*) FROM base WHERE l_orderkey % 3 <> 0) AS n_train,
             |  (SELECT n FROM nc) AS n_cal,
             |  COUNT(*) AS n_test,
             |  (SELECT m FROM f) AS slope,
             |  (SELECT b FROM f) AS intercept,
             |  (SELECT r FROM qv) AS q_alpha,
             |  ROUND(AVG(CASE WHEN r <= (SELECT r FROM qv)
             |    THEN 1.0 ELSE 0.0 END), 6) AS coverage
             |FROM tst""".stripMargin)),

    Q("agg_boolean_family", // boolean/conditional aggregate family:
      // count_if + bool_and/bool_or ride the same single pass as any
      // other partial-aggregatable function
      (s, d) => t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(count_if(col("l_discount") > 0.05).as("n_discounted"),
          bool_and(col("l_quantity") > 0).as("all_positive_qty"),
          bool_or(col("l_quantity") > 49).as("any_qty_50"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
             |BOOL_AND(l_quantity > 0) AS all_positive_qty,
             |BOOL_OR(l_quantity > 49) AS any_qty_50,
             |COUNT(*) AS n
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    Q("agg_string_concat", // ordered string aggregation: supplier roster
      // per nation as one sorted comma-joined string (sort_array before
      // the join makes the concatenation order-deterministic regardless
      // of partial-agg arrival order)
      (s, d) => t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(array_join(array_sort(collect_list(col("s_name"))), ",").as("suppliers"),
          count(lit(1)).as("n"))
        .orderBy("n_name"),
      Some("""SELECT n_name,
             |STRING_AGG(s_name, ',' ORDER BY s_name) AS suppliers,
             |COUNT(*) AS n
             |FROM supplier JOIN nation ON s_nationkey = n_nationkey
             |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    Q("orders_abc_pareto", // ABC / Pareto revenue classification:
      // customers ranked by (rounded) lifetime revenue, cumulative share
      // → class A (first 80%), B (to 95%), C (tail). Orders collapse to
      // a customer-grained rollup FIRST, so the global rank window sorts
      // |customers| rows, never |orders|; the unpartitioned windows are
      // the semantics (a global cumulative share) and run over that
      // already-aggregated vector. Revenue is rounded BEFORE the cumsum
      // so the running total adds identical doubles in identical order
      // in both engines.
      (s, d) => {
        val rev = t(s, d, "orders").groupBy("o_custkey")
          .agg(round(sum("o_totalprice"), 2).as("rev"))
        val w = Window.orderBy(col("rev").desc, col("o_custkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tot = Window.partitionBy()
        rev
          .withColumn("share", sum("rev").over(w) / sum("rev").over(tot))
          .withColumn("abc_class",
            when(col("share") <= 0.80, "A")
              .when(col("share") <= 0.95, "B").otherwise("C"))
          .groupBy("abc_class")
          .agg(count(lit(1)).as("n_customers"),
            round(sum("rev"), 2).as("class_revenue"))
          .orderBy("abc_class")
      },
      Some("""WITH rev AS (
             |  SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS rev
             |  FROM orders GROUP BY 1),
             |c AS (SELECT rev,
             |    SUM(rev) OVER (ORDER BY rev DESC, o_custkey
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      / SUM(rev) OVER () AS share
             |  FROM rev)
             |SELECT CASE WHEN share <= 0.80 THEN 'A'
             |    WHEN share <= 0.95 THEN 'B' ELSE 'C' END AS abc_class,
             |  COUNT(*) AS n_customers, ROUND(SUM(rev), 2) AS class_revenue
             |FROM c GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("part_skyline", // 2-D pareto frontier (cheapest price, biggest
      // size): the oracle runs the textbook O(n²) NOT-EXISTS dominance
      // test; the Spark side never forms a pair — distinct (price, size)
      // collapses first (bounded by the value domain, not |part|), the
      // per-price max-size rep wins the equal-price contest in the same
      // aggregate, and one cummax scan over the price-ordered reps keeps
      // exactly the points whose size beats every strictly-cheaper rep.
      // Frontier pairs then broadcast back onto the part table.
      (s, d) => {
        val part = t(s, d, "part")
        val reps = part.groupBy("p_retailprice")
          .agg(max("p_size").as("max_size"))
        val w = Window.orderBy("p_retailprice")
          .rowsBetween(Window.unboundedPreceding, -1)
        val frontier = reps
          .withColumn("best_cheaper", max("max_size").over(w))
          .filter(col("best_cheaper").isNull
            || col("max_size") > col("best_cheaper"))
          .select(col("p_retailprice").as("f_price"),
            col("max_size").as("f_size"))
        part.join(broadcast(frontier),
            col("p_retailprice") === col("f_price")
              && col("p_size") === col("f_size"))
          .select(col("p_partkey"), round(col("p_retailprice"), 2)
            .as("price"), col("p_size").as("size"))
          .orderBy("price", "p_partkey")
      },
      Some("""SELECT p_partkey, ROUND(p_retailprice, 2) AS price,
             |  p_size AS size
             |FROM part a
             |WHERE NOT EXISTS (SELECT 1 FROM part b
             |  WHERE b.p_retailprice <= a.p_retailprice
             |    AND b.p_size >= a.p_size
             |    AND (b.p_retailprice < a.p_retailprice
             |      OR b.p_size > a.p_size))
             |ORDER BY price, p_partkey""".stripMargin)),

    Q("lineitem_equidepth_hist", // exact equi-depth (NTILE) histogram of
      // extendedprice — the exact-mode auditor for the approx_percentile
      // sketch: bucket edges from ranked position, not estimate. The
      // unique (price, orderkey, linenumber) order makes every bucket
      // assignment deterministic. Computed as 2k order statistics over a
      // distributed range sort (Scale.exactNtileHistogram) — NOT an
      // unpartitioned NTILE window, whose single-reducer sort grew
      // super-linearly on the 10× replica probe.
      (s, d) => Scale.ntileHistogramOf(s, rankedExtPrice(s, d), k = 10)
        .orderBy("bucket"),
      Some("""WITH b AS (
             |  SELECT l_extendedprice,
             |    NTILE(10) OVER (ORDER BY l_extendedprice, l_orderkey,
             |      l_linenumber) AS bucket
             |  FROM lineitem)
             |SELECT bucket, COUNT(*) AS n,
             |  ROUND(MIN(l_extendedprice), 2) AS lo,
             |  ROUND(MAX(l_extendedprice), 2) AS hi
             |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin)),

    Q("cust_segment_migration", // segment-migration matrix: customers
      // tertiled by spend (low/mid/high, rank-based with a custkey
      // tie-break) in each HALF of the order history, and the 3×3
      // where-did-they-move matrix over customers active in both —
      // the CRM churn/upsell report next to the static RFM cut. Spend
      // ranks are exact integer arithmetic off one ordered window per
      // half; counts are exact.
      (s, d) => {
        val o = t(s, d, "orders")
        val cut = java.sql.Timestamp.valueOf("1995-06-01 00:00:00")
        def segs(cond: Column, out: String): DataFrame = {
          val h = o.filter(cond).groupBy("o_custkey")
            .agg(sum(col("o_totalprice").cast("double")).as("v"))
          val n = h.count()
          val w = Window.orderBy(col("v"), col("o_custkey"))
          h.withColumn("r", row_number().over(w))
            .select(col("o_custkey"),
              element_at(typedLit(Seq("low", "mid", "high")),
                (floor((col("r") - 1) * 3 / lit(n.toDouble)) + 1)
                  .cast("int")).as(out))
        }
        segs(col("o_orderdate") < lit(cut), "seg_h1")
          .join(segs(col("o_orderdate") >= lit(cut), "seg_h2"),
            Seq("o_custkey"))
          .groupBy("seg_h1", "seg_h2").agg(count(lit(1)).as("n_customers"))
          .orderBy("seg_h1", "seg_h2")
      },
      Some {
        def seg(op: String, out: String): String =
          s"""(SELECT o_custkey,
             |  (['low','mid','high'])[CAST(floor((row_number() OVER (
             |     ORDER BY v, o_custkey) - 1) * 3.0 / COUNT(*) OVER ())
             |     AS INT) + 1] AS $out
             | FROM (SELECT o_custkey, SUM(CAST(o_totalprice AS DOUBLE)) AS v
             |       FROM orders
             |       WHERE o_orderdate $op TIMESTAMP '1995-06-01 00:00:00'
             |       GROUP BY 1))""".stripMargin
        s"""SELECT h1.seg_h1, h2.seg_h2, COUNT(*) AS n_customers
           |FROM ${seg("<", "seg_h1")} h1
           |JOIN ${seg(">=", "seg_h2")} h2 USING (o_custkey)
           |GROUP BY 1, 2 ORDER BY seg_h1, seg_h2""".stripMargin
      }),

    Q("orders_rfm_segments", // RFM segmentation: per-customer recency /
      // frequency / monetary quartiles, anchored at the corpus max order
      // day so the metric is data-pinned, not wall-clock. The three NTILE
      // windows run over the customer-grained rollup (|customers| rows)
      // with unique custkey tie-breaks, and monetary is rounded BEFORE
      // ranking so both engines sort identical doubles.
      (s, d) => {
        val o = t(s, d, "orders")
        val anchor = o.agg(
          max(date_trunc("day", col("o_orderdate"))).as("mx"))
        val rfm = o.groupBy("o_custkey").agg(
            max(date_trunc("day", col("o_orderdate"))).as("last_day"),
            count(lit(1)).as("freq"),
            round(sum("o_totalprice"), 2).as("monetary"))
          .crossJoin(broadcast(anchor))
          .withColumn("recency_days", datediff(col("mx"), col("last_day")))
        val rq = ntile(4).over(
          Window.orderBy(col("recency_days"), col("o_custkey")))
        val fq = ntile(4).over(
          Window.orderBy(col("freq").desc, col("o_custkey")))
        val mq = ntile(4).over(
          Window.orderBy(col("monetary").desc, col("o_custkey")))
        rfm.select(col("o_custkey"), col("recency_days"), col("freq"),
            col("monetary"), rq.as("r_q"), fq.as("f_q"), mq.as("m_q"))
          .withColumn("segment",
            concat(col("r_q"), col("f_q"), col("m_q")))
          .orderBy("o_custkey").limit(25)
      },
      Some("""WITH mxd AS (
             |  SELECT MAX(date_trunc('day', o_orderdate)) AS mx
             |  FROM orders),
             |rfm AS (
             |  SELECT o_custkey,
             |    MAX(date_trunc('day', o_orderdate)) AS last_day,
             |    COUNT(*) AS freq,
             |    ROUND(SUM(o_totalprice), 2) AS monetary
             |  FROM orders GROUP BY 1),
             |q AS (
             |  SELECT o_custkey,
             |    date_diff('day', CAST(last_day AS DATE), CAST(mx AS DATE))
             |      AS recency_days,
             |    freq, monetary,
             |    NTILE(4) OVER (ORDER BY
             |      date_diff('day', CAST(last_day AS DATE), CAST(mx AS DATE)),
             |      o_custkey) AS r_q,
             |    NTILE(4) OVER (ORDER BY freq DESC, o_custkey) AS f_q,
             |    NTILE(4) OVER (ORDER BY monetary DESC, o_custkey) AS m_q
             |  FROM rfm, mxd)
             |SELECT o_custkey, recency_days, freq, monetary, r_q, f_q, m_q,
             |  CAST(r_q AS VARCHAR) || CAST(f_q AS VARCHAR)
             |    || CAST(m_q AS VARCHAR) AS segment
             |FROM q ORDER BY o_custkey LIMIT 25""".stripMargin)),

    Q("orders_survival_km", // Kaplan–Meier survival of the reorder gap:
      // "how long until a customer orders again", with each customer's
      // open-ended tail after the last order entering as a CENSORED
      // observation at the corpus max day — the right-censoring that
      // makes the naive gap histogram biased and KM the correct
      // estimator. At-risk counts come from a suffix cumsum over the
      // duration-grained rollup (never a per-observation window); the
      // product is exp∘Σln over integer-derived factors, masked through
      // the d≥n case DuckDB's LN would reject, so both engines emit
      // bit-identical curves.
      (s, d) => {
        val o = t(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            date_trunc("day", col("o_orderdate")).as("day"))
        val anchor = o.agg(max("day").as("mx"))
        val w = Window.partitionBy("o_custkey").orderBy("day", "o_orderkey")
        val gaps = o
          .withColumn("next_day", lead("day", 1).over(w))
          .filter(col("next_day").isNotNull)
          .select(datediff(col("next_day"), col("day")).as("duration"),
            lit(1L).as("event"))
        val tails = o.groupBy("o_custkey").agg(max("day").as("last_day"))
          .crossJoin(broadcast(anchor))
          .select(datediff(col("mx"), col("last_day")).as("duration"),
            lit(0L).as("event"))
        val byDur = gaps.union(tails).groupBy("duration")
          .agg(count(lit(1)).as("m"), sum("event").as("d_events"))
        val suffix = Window.orderBy("duration")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        val cum = Window.orderBy("duration")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val lnF = when(col("d_events") < col("n_risk"),
          log(lit(1.0) - col("d_events").cast("double") / col("n_risk")))
          .otherwise(lit(0.0))
        byDur
          .withColumn("n_risk", sum("m").over(suffix))
          .withColumn("dead", max((col("d_events") >= col("n_risk"))
            .cast("int")).over(cum))
          .withColumn("km", when(col("dead") === 1, lit(0.0))
            .otherwise(round(exp(sum(lnF).over(cum)), 6)))
          .select(col("duration"), col("n_risk"), col("d_events"),
            col("km"))
          .orderBy("duration").limit(40)
      },
      Some("""WITH o AS (
             |  SELECT o_custkey, o_orderkey,
             |    date_trunc('day', o_orderdate) AS day FROM orders),
             |mxd AS (SELECT MAX(day) AS mx FROM o),
             |gaps AS (
             |  SELECT date_diff('day', CAST(day AS DATE), CAST(
             |      LEAD(day) OVER (PARTITION BY o_custkey
             |        ORDER BY day, o_orderkey) AS DATE)) AS duration,
             |    1 AS event
             |  FROM o QUALIFY LEAD(day) OVER (PARTITION BY o_custkey
             |    ORDER BY day, o_orderkey) IS NOT NULL),
             |tails AS (
             |  SELECT date_diff('day', CAST(MAX(day) AS DATE),
             |      CAST(mx AS DATE)) AS duration, 0 AS event
             |  FROM o, mxd GROUP BY o_custkey, mx),
             |u AS (SELECT * FROM gaps UNION ALL SELECT * FROM tails),
             |byd AS (SELECT duration, COUNT(*) AS m,
             |    CAST(SUM(event) AS BIGINT) AS d_events
             |  FROM u GROUP BY 1),
             |r AS (
             |  SELECT duration, m, d_events,
             |    CAST(SUM(m) OVER (ORDER BY duration ROWS BETWEEN CURRENT ROW
             |      AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk
             |  FROM byd),
             |k AS (
             |  SELECT duration, n_risk, d_events,
             |    MAX(CASE WHEN d_events >= n_risk THEN 1 ELSE 0 END)
             |      OVER (ORDER BY duration ROWS BETWEEN UNBOUNDED PRECEDING
             |        AND CURRENT ROW) AS dead,
             |    SUM(CASE WHEN d_events < n_risk
             |        THEN LN(1.0 - CAST(d_events AS DOUBLE) / n_risk)
             |        ELSE 0.0 END)
             |      OVER (ORDER BY duration ROWS BETWEEN UNBOUNDED PRECEDING
             |        AND CURRENT ROW) AS lnS
             |  FROM r)
             |SELECT duration, n_risk, d_events,
             |  CASE WHEN dead = 1 THEN 0.0 ELSE ROUND(EXP(lnS), 6) END AS km
             |FROM k ORDER BY duration LIMIT 40""".stripMargin)),

    Q("cust_target_encoding", // leave-one-out target encoding of the
      // market segment against account balance — the leakage-safe
      // categorical feature for downstream models: each row's own target
      // leaves via the algebraic (sum − own)/(n − 1) identity, so the
      // encoding costs ONE segment-grained aggregate + a broadcast join
      // back, never a per-row window over the fact table. Balances ride
      // as exact integer cents, so the encoding is ONE division of exact
      // longs — the r8 boundary audit caught the raw-double-sum form
      // sitting 1 ulp from a .5e-4 rounding boundary (a sum-order flake
      // waiting to fire); exact cents make it bit-deterministic.
      (s, d) => {
        val c = t(s, d, "customer").withColumn("cents",
          round(col("c_acctbal") * 100, 0).cast("long"))
        val seg = c.groupBy("c_mktsegment").agg(
          sum("cents").as("seg_cents"), count(lit(1)).as("seg_n"))
        c.join(broadcast(seg), Seq("c_mktsegment"))
          .select(col("c_custkey"), col("c_mktsegment"),
            round((col("seg_cents") - col("cents")).cast("double")
              / (lit(100L) * (col("seg_n") - 1)), 4).as("loo_enc"))
          .orderBy("c_custkey").limit(25)
      },
      Some("""WITH c AS (
             |  SELECT c_custkey, c_mktsegment,
             |    CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS cents
             |  FROM customer),
             |seg AS (
             |  SELECT c_mktsegment,
             |    CAST(SUM(cents) AS BIGINT) AS seg_cents,
             |    COUNT(*) AS seg_n
             |  FROM c GROUP BY 1)
             |SELECT c_custkey, c_mktsegment,
             |  ROUND(CAST(seg_cents - cents AS DOUBLE)
             |    / (100 * (seg_n - 1)), 4) AS loo_enc
             |FROM c JOIN seg USING (c_mktsegment)
             |ORDER BY c_custkey LIMIT 25""".stripMargin)),

    Q("stats_moments", // second-moment statistics in ONE pass: corr,
      // covariance, stddev, variance are all partial-aggregatable
      // (sum/sum-of-squares/cross-products combine associatively), so the
      // whole row costs a single map-side-combined scan at any scale
      (s, d) => t(s, d, "lineitem").agg(
        round(corr("l_quantity", "l_extendedprice"), 6).as("corr_qty_price"),
        round(covar_samp("l_quantity", "l_extendedprice"), 4).as("covar_qty_price"),
        round(stddev_samp("l_extendedprice"), 4).as("sd_price"),
        round(var_samp("l_quantity"), 6).as("var_qty")),
      Some("""SELECT ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price,
             |ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 4) AS covar_qty_price,
             |ROUND(STDDEV_SAMP(l_extendedprice), 4) AS sd_price,
             |ROUND(VAR_SAMP(l_quantity), 6) AS var_qty
             |FROM lineitem""".stripMargin)))

  // §2.11 — events: JSON extraction, time-bucketed aggregation,
  // sessionization (the batch twin of the streaming surface).
  // Data-quality audit + time-series hygiene — the scale-out form of the
  // reference's introspection/statistics surface (SURVEY.md §1.3, §3.3).
  private def dqQueries: Seq[Q] = Seq(
    Q("dq_profile_orders", { // one-pass column profiler: null count,
      // distinct count and min/max for EVERY column of the table in a
      // single aggregate scan (the pandas-profiling/Deequ "describe"
      // primitive), unpivoted to one row per column. Doubles render
      // through DECIMAL(18,2) and timestamps through DATE so the
      // min/max strings are engine-portable; both the Spark aggregates
      // and the oracle's UNION ALL are generated from the SAME column
      // list.
      val cols = Seq("o_custkey", "o_orderdate", "o_orderkey",
        "o_orderpriority", "o_orderstatus", "o_totalprice")
      def render(c: String, x: Column): Column = c match {
        case "o_totalprice" => x.cast("decimal(18,2)").cast("string")
        case "o_orderdate" => x.cast("date").cast("string")
        case _ => x.cast("string")
      }
      // Shape note (measured, sf0.1 isolated): ONE agg holding all six
      // countDistincts plans through a 6× Expand of full rows into a
      // single wide hash agg — 3.83 s best-of-2. Six single-column
      // aggregates unioned read six PRUNED scans (columnar I/O ≈ the
      // expand's row volume) and each distinct runs its own two-phase
      // hash agg — the same total work without the multi-distinct
      // Expand bottleneck. At 100 TB both shapes scan every profiled
      // byte once; the union form additionally parallelizes across
      // columns as independent jobs.
      (s: SparkSession, d: String) => {
        val o = t(s, d, "orders")
        cols.map { c =>
          o.agg(count(lit(1)).as("n_rows"),
            sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
            countDistinct(col(c)).as("n_distinct"),
            render(c, min(col(c))).as("min_str"),
            render(c, max(col(c))).as("max_str"))
            .select(lit(c).as("col_name"), col("n_rows"), col("n_nulls"),
              col("n_distinct"), col("min_str"), col("max_str"))
        }.reduce(_.unionByName(_)).orderBy("col_name")
      }
    }, {
      val cols = Seq("o_custkey", "o_orderdate", "o_orderkey",
        "o_orderpriority", "o_orderstatus", "o_totalprice")
      def renderSql(c: String, agg: String): String = c match {
        case "o_totalprice" =>
          s"CAST(CAST($agg($c) AS DECIMAL(18,2)) AS VARCHAR)"
        case "o_orderdate" => s"CAST(CAST($agg($c) AS DATE) AS VARCHAR)"
        case _ => s"CAST($agg($c) AS VARCHAR)"
      }
      def prof(c: String): String =
        s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
           |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_nulls,
           |  COUNT(DISTINCT $c) AS n_distinct,
           |  ${renderSql(c, "MIN")} AS min_str,
           |  ${renderSql(c, "MAX")} AS max_str
           |FROM orders""".stripMargin
      Some(cols.map(prof).mkString("\nUNION ALL\n") + "\nORDER BY col_name")
    }),

    Q("dq_constraint_report", // Deequ-style declarative audit: every
      // single-table check folds into ONE aggregate pass per table
      // (completeness/uniqueness/accepted-values/range are all
      // aggregates); the FK check is the only join, against dedup'd keys
      (s, d) => {
        import graft.operators.DataQuality._
        val cust = t(s, d, "customer")
        val custChecks = audit(cust, Seq(
          Check("completeness", "customer.c_name", completeness(col("c_name"))),
          Check("uniqueness", "customer.c_custkey", uniqueness(col("c_custkey"))),
          Check("accepted_values", "customer.c_mktsegment",
            satisfaction(col("c_mktsegment").isin(
              "AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD")))))
        val liChecks = audit(t(s, d, "lineitem"), Seq(
          Check("range", "lineitem.l_discount",
            satisfaction(col("l_discount").between(0.0, 1.0))),
          Check("range", "lineitem.l_quantity",
            satisfaction(col("l_quantity") > 0))))
        val fk = referential(t(s, d, "orders"), "o_custkey", cust, "c_custkey",
          "orders.o_custkey->customer.c_custkey")
        custChecks.union(liChecks).union(fk).orderBy("check_type", "target")
      },
      Some("""SELECT 'completeness' AS check_type, 'customer.c_name' AS target,
             |  ROUND(AVG(CASE WHEN c_name IS NOT NULL THEN 1.0 ELSE 0.0 END), 6) AS value,
             |  ROUND(AVG(CASE WHEN c_name IS NOT NULL THEN 1.0 ELSE 0.0 END), 6) >= 1.0 AS pass
             |FROM customer
             |UNION ALL
             |SELECT 'uniqueness', 'customer.c_custkey',
             |  ROUND(CAST(COUNT(DISTINCT c_custkey) AS DOUBLE) / COUNT(*), 6),
             |  ROUND(CAST(COUNT(DISTINCT c_custkey) AS DOUBLE) / COUNT(*), 6) >= 1.0
             |FROM customer
             |UNION ALL
             |SELECT 'accepted_values', 'customer.c_mktsegment',
             |  ROUND(AVG(CASE WHEN c_mktsegment IN ('AUTOMOBILE','BUILDING','FURNITURE','MACHINERY','HOUSEHOLD') THEN 1.0 ELSE 0.0 END), 6),
             |  ROUND(AVG(CASE WHEN c_mktsegment IN ('AUTOMOBILE','BUILDING','FURNITURE','MACHINERY','HOUSEHOLD') THEN 1.0 ELSE 0.0 END), 6) >= 1.0
             |FROM customer
             |UNION ALL
             |SELECT 'range', 'lineitem.l_discount',
             |  ROUND(AVG(CASE WHEN l_discount BETWEEN 0.0 AND 1.0 THEN 1.0 ELSE 0.0 END), 6),
             |  ROUND(AVG(CASE WHEN l_discount BETWEEN 0.0 AND 1.0 THEN 1.0 ELSE 0.0 END), 6) >= 1.0
             |FROM lineitem
             |UNION ALL
             |SELECT 'range', 'lineitem.l_quantity',
             |  ROUND(AVG(CASE WHEN l_quantity > 0 THEN 1.0 ELSE 0.0 END), 6),
             |  ROUND(AVG(CASE WHEN l_quantity > 0 THEN 1.0 ELSE 0.0 END), 6) >= 1.0
             |FROM lineitem
             |UNION ALL
             |SELECT 'referential', 'orders.o_custkey->customer.c_custkey',
             |  ROUND(AVG(CASE WHEN EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey) THEN 1.0 ELSE 0.0 END), 6),
             |  ROUND(AVG(CASE WHEN EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey) THEN 1.0 ELSE 0.0 END), 6) >= 1.0
             |FROM orders
             |ORDER BY check_type, target""".stripMargin)),

    Q("cust_kanon_report", // k-anonymity over quasi-identifiers (nation ×
      // market segment): achieved k, classes below target, suppression
      // cost, AND the post-enforcement audit (survivor count + the floor
      // survivors achieve, which must clear k) — all from ONE groupBy on
      // the QI key + a class-count-sized aggregate. kAnonymize's survivor
      // set ≡ classes ≥ k, so the enforcement outcome needs no second
      // pass (the equivalence itself is pinned in DataQualitySpec).
      (s, d) => graft.operators.DataQuality.kAnonymity(
        t(s, d, "customer"), Seq("c_nationkey", "c_mktsegment"), 10),
      Some("""WITH cls AS (
             |  SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
             |  FROM customer GROUP BY 1, 2
             |), rep AS (
             |  SELECT COUNT(*) AS n_classes,
             |    CAST(MIN(n) AS BIGINT) AS k_anonymity,
             |    CAST(SUM(CASE WHEN n < 10 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS classes_below_k,
             |    CAST(SUM(CASE WHEN n < 10 THEN n ELSE 0 END) AS BIGINT)
             |      AS records_suppressed
             |  FROM cls
             |), srep AS (
             |  SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_survivors,
             |    CAST(MIN(n) AS BIGINT) AS survivor_k_anonymity
             |  FROM cls WHERE n >= 10
             |)
             |SELECT * FROM rep, srep""".stripMargin)),

    Q("cust_ldiversity_report", // l-diversity: k-anonymity's complement —
      // a look-alike class whose members all share one sensitive value
      // still leaks it. Sensitive attribute = account-balance bracket
      // (floor to 1000s); same one-groupBy shape with a distinct count
      // riding the shuffle.
      (s, d) => graft.operators.DataQuality.lDiversity(
        t(s, d, "customer")
          .withColumn("bal_bracket", floor(col("c_acctbal") / 1000)),
        Seq("c_nationkey", "c_mktsegment"), "bal_bracket", 3),
      Some("""WITH cls AS (
             |  SELECT c_nationkey, c_mktsegment, COUNT(*) AS n,
             |    COUNT(DISTINCT FLOOR(c_acctbal / 1000)) AS l
             |  FROM customer GROUP BY 1, 2
             |)
             |SELECT COUNT(*) AS n_classes,
             |  CAST(MIN(l) AS BIGINT) AS l_diversity,
             |  CAST(SUM(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS classes_below_l,
             |  CAST(SUM(CASE WHEN l < 3 THEN n ELSE 0 END) AS BIGINT)
             |    AS records_at_risk
             |FROM cls""".stripMargin)),

    Q("cust_tcloseness_report", // t-closeness: the privacy trio's third
      // leg — a class can be k-anonymous AND l-diverse yet still leak
      // when its sensitive-value distribution skews far from the
      // table's. Total-variation distance per class; absent values fold
      // in as 1 − Σ_present q, so the cell set never crosses with the
      // full domain. Same QI key and balance-bracket sensitive as the
      // sibling reports.
      (s, d) => graft.operators.DataQuality.tCloseness(
        t(s, d, "customer")
          .withColumn("bal_bracket", floor(col("c_acctbal") / 1000)),
        Seq("c_nationkey", "c_mktsegment"), "bal_bracket", 0.35),
      Some("""WITH cells AS (
             |  SELECT c_nationkey, c_mktsegment,
             |    FLOOR(c_acctbal / 1000) AS sv, COUNT(*) AS nc
             |  FROM customer GROUP BY 1, 2, 3),
             |sc AS (
             |  SELECT nc,
             |    SUM(nc) OVER (PARTITION BY c_nationkey, c_mktsegment) AS ncl,
             |    SUM(nc) OVER (PARTITION BY sv) AS nv,
             |    SUM(nc) OVER () AS nt,
             |    c_nationkey, c_mktsegment
             |  FROM cells),
             |cls AS (
             |  SELECT c_nationkey, c_mktsegment,
             |    0.5 * (SUM(ABS(nc / ncl - nv / nt)) + 1.0 - SUM(nv / nt)) AS d,
             |    MAX(ncl) AS n
             |  FROM sc GROUP BY 1, 2)
             |SELECT COUNT(*) AS n_classes, ROUND(MAX(d), 6) AS t_closeness,
             |  CAST(SUM(CASE WHEN d > 0.35 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS classes_above_t,
             |  CAST(SUM(CASE WHEN d > 0.35 THEN n ELSE 0 END) AS BIGINT)
             |    AS records_at_risk
             |FROM cls""".stripMargin)),

    Q("orders_mad_outliers", // robust outlier gate: modified z-score on
      // the exact median/MAD — resists the outliers a mean/stddev rule
      // absorbs. Two scalar-agg passes ride back as one-row broadcasts.
      (s, d) => graft.operators.DataQuality.madOutlierReport(
        t(s, d, "orders"), "o_totalprice", threshold = 3.5),
      Some("""WITH m AS (
             |  SELECT quantile_cont(o_totalprice, 0.5) AS med FROM orders),
             |md AS (
             |  SELECT med,
             |    quantile_cont(ABS(o_totalprice - med), 0.5) AS mad
             |  FROM orders, m GROUP BY med)
             |SELECT ROUND(med, 4) AS median, ROUND(mad, 4) AS mad,
             |  COUNT(*) AS n,
             |  CAST(SUM(CASE WHEN 0.6745 * ABS(o_totalprice - med) / mad > 3.5
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
             |  ROUND(AVG(CASE WHEN 0.6745 * ABS(o_totalprice - med) / mad > 3.5
             |    THEN 1.0 ELSE 0.0 END), 6) AS outlier_frac
             |FROM orders, md GROUP BY med, mad""".stripMargin)),

    Q("lineitem_skew_report", // shuffle-planning skew audit of a
      // prospective join/partitioning key: exact Gini + max/top-1%
      // concentration of the l_partkey multiplicity distribution,
      // computed WITHOUT a global per-key sort — per-key counts collapse
      // to a count-of-counts table and rank-block algebra reproduces the
      // sorted-rank sums exactly (DataQuality.keySkewReport). The oracle
      // runs the naive row_number formulation; both are integer-exact up
      // to the final divisions, so they agree bit-for-bit.
      (s, d) => graft.operators.DataQuality.keySkewReport(
        t(s, d, "lineitem"), "l_partkey"),
      Some("""WITH c AS (
             |  SELECT l_partkey AS key, COUNT(*) AS c FROM lineitem
             |  GROUP BY 1),
             |tot AS (SELECT COUNT(*) AS n_keys, CAST(SUM(c) AS BIGINT) AS n_rows,
             |  MAX(c) AS max_c FROM c),
             |ranked AS (SELECT c,
             |  ROW_NUMBER() OVER (ORDER BY c, key) AS r,
             |  ROW_NUMBER() OVER (ORDER BY c DESC, key) AS rd FROM c),
             |topshare AS (SELECT SUM(c) AS top_c FROM ranked
             |  WHERE rd <= CAST(CEIL(0.01 * (SELECT n_keys FROM tot)) AS BIGINT)),
             |g AS (SELECT SUM(r * c) AS rank_sum FROM ranked)
             |SELECT n_keys, n_rows, max_c,
             |  ROUND(CAST(n_rows AS DOUBLE) / n_keys, 4) AS avg_c,
             |  ROUND(CAST(max_c AS DOUBLE) / n_rows, 6) AS max_share,
             |  ROUND(CAST(top_c AS DOUBLE) / n_rows, 6) AS top1pct_share,
             |  ROUND(2.0 * rank_sum / (CAST(n_keys AS DOUBLE) * n_rows)
             |    - CAST(n_keys + 1 AS DOUBLE) / n_keys, 6) AS gini
             |FROM tot, topshare, g""".stripMargin)),

    Q("orders_benford_check", // Benford first-digit audit of the order
      // totals — the classic fabricated-figures screen. First digit via
      // integer-floor + string head (no log bucketing, so exact),
      // observed share vs the log10(1+1/d) law per digit. One scan, one
      // 9-row agg; deviations are the analyst's fraud signal.
      (s, d) => {
        val digit = substring(floor(col("o_totalprice")).cast("long")
          .cast("string"), 1, 1).cast("int")
        val tot = Window.partitionBy()
        t(s, d, "orders")
          .select(digit.as("digit"))
          .groupBy("digit").agg(count(lit(1)).as("n"))
          .withColumn("observed",
            round(col("n").cast("double") / sum("n").over(tot), 4))
          .withColumn("expected",
            round(log10(lit(1.0) + lit(1.0) / col("digit")), 4))
          .withColumn("deviation", round(
            col("n").cast("double") / sum("n").over(tot)
              - log10(lit(1.0) + lit(1.0) / col("digit")), 4))
          .orderBy("digit")
      },
      Some("""WITH d AS (
             |  SELECT CAST(SUBSTR(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
             |    AS VARCHAR), 1, 1) AS INTEGER) AS digit
             |  FROM orders),
             |c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY 1),
             |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM c)
             |SELECT digit, n,
             |  ROUND(CAST(n AS DOUBLE) / t, 4) AS observed,
             |  ROUND(LOG10(1.0 + 1.0 / digit), 4) AS expected,
             |  ROUND(CAST(n AS DOUBLE) / t - LOG10(1.0 + 1.0 / digit), 4)
             |    AS deviation
             |FROM c, tot ORDER BY digit""".stripMargin)),

    Q("dp_noisy_histogram", // eps-DP released histogram (Laplace
      // mechanism, eps=1): noise derived from md5(salt:key) through the
      // Laplace inverse CDF, so the release is reproducible and the
      // oracle re-derives every noisy count exactly — both engines run
      // the identical double arithmetic on the identical 48-bit uniform
      (s, d) => graft.operators.DataQuality.dpNoisyCount(
          t(s, d, "customer"), "c_mktsegment", eps = 1.0, salt = "rel2026a")
        .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment,
             |  ROUND(n + -1.0 * SIGN(u) * LN(1 - 2 * ABS(u)), 4) AS n_noisy
             |FROM (
             |  SELECT c_mktsegment, COUNT(*) AS n,
             |    ((('0x' || SUBSTR(md5('rel2026a:' || c_mktsegment), 1, 12))::BIGINT)
             |      / 281474976710656.0) - 0.5 AS u
             |  FROM customer GROUP BY 1)
             |ORDER BY c_mktsegment""".stripMargin)),

    Q("events_spine_fill", // gap-filled daily series: the date spine is
      // GENERATED (sequence + explode — a few hundred rows from one
      // literal, never collected or ranged on the driver) and left-joins
      // the day-grained aggregate; missing days surface as explicit zeros
      (s, d) => {
        val daily = t(s, d, "events")
          .groupBy(col("ts").cast("date").as("day")).agg(count(lit(1)).as("n0"))
        val spine = s.range(1).select(explode(sequence(
          lit(java.sql.Date.valueOf("2023-12-28")),
          lit(java.sql.Date.valueOf("2024-02-05")))).as("day"))
        spine.join(daily, Seq("day"), "left_outer")
          .select(col("day").cast("string").as("day"),
            coalesce(col("n0"), lit(0L)).as("n"))
          .orderBy("day")
      },
      Some("""WITH spine AS (
             |  SELECT CAST(unnest(generate_series(DATE '2023-12-28',
             |    DATE '2024-02-05', INTERVAL 1 DAY)) AS DATE) AS day),
             |daily AS (
             |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n0
             |  FROM events GROUP BY day)
             |SELECT CAST(s.day AS VARCHAR) AS day, COALESCE(d.n0, 0) AS n
             |FROM spine s LEFT JOIN daily d ON s.day = d.day
             |ORDER BY day""".stripMargin)),

    Q("events_anomaly_zscore", // rolling z-score anomaly signal: one
      // shuffle to day grain, one window pass per event_type over the
      // trailing week — std of an empty/zero-variance frame nulls the
      // score rather than dividing by zero
      (s, d) => {
        val daily = t(s, d, "events")
          .groupBy(col("event_type"), col("ts").cast("date").as("day"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(-7, -1)
        daily.select(col("event_type"), col("day").cast("string").as("day"),
            col("n"),
            round((col("n") - avg("n").over(w))
              / nullif(stddev_samp("n").over(w), lit(0.0)), 4).as("z"))
          .orderBy("event_type", "day")
      },
      Some("""SELECT event_type, CAST(day AS VARCHAR) AS day, n,
             |ROUND((n - AVG(n) OVER w) / NULLIF(STDDEV_SAMP(n) OVER w, 0.0), 4) AS z
             |FROM (SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
             |      FROM events GROUP BY event_type, day)
             |WINDOW w AS (PARTITION BY event_type ORDER BY day
             |             ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
             |ORDER BY event_type, day""".stripMargin)))

  private def eventQueries: Seq[Q] = Seq(
    Q("events_asof_attrib", // as-of join: purchase → latest prior click by
      // the same user (one shuffle + window; no pair blow-up — AsofJoin)
      (s, d) => {
        val e = t(s, d, "events")
        val p = e.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts")
        val c = e.filter(col("event_type") === "click")
          .select("user_id", "ts", "event_id", "value")
        graft.operators.AsofJoin
          .backward(p, c, Seq("user_id"), "ts", Seq("event_id", "value"),
            prefix = "click_")
          .select(col("event_id"), col("user_id"),
            col("click_event_id").as("click_id"),
            (unix_millis(col("ts")) - unix_millis(col("click_ts"))).as("gap_ms"),
            round(col("click_value"), 2).as("click_value"))
          .orderBy("event_id")
      },
      Some("""SELECT p.event_id, p.user_id, c.event_id AS click_id,
             |  epoch_ms(p.ts) - epoch_ms(c.ts) AS gap_ms,
             |  ROUND(c.value, 2) AS click_value
             |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
             |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
             |  ON p.user_id = c.user_id AND p.ts >= c.ts
             |ORDER BY p.event_id""".stripMargin)),

    Q("events_session_window", // batch sessionization via Spark's native
      // session_window (merge-on-overlap, end = last ts + gap) —
      // cross-checked against the SQL-standard islands technique in the
      // oracle: a session breaks where the gap to the previous event is
      // >= 30 min (session ends are exclusive), sessions are cumulative
      // sums of break markers. Both sides work in microseconds — the
      // fixture has sub-ms timestamps, so ms truncation would split
      // boundary pairs differently.
      (s, d) => t(s, d, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("start_us"),
          col("n_events"), col("total_value"))
        .orderBy("user_id", "start_us"),
      Some("""WITH e AS (
             |  SELECT user_id, value, epoch_us(ts) AS us FROM events
             |), marked AS (
             |  SELECT user_id, value, us,
             |    CASE WHEN us - LAG(us) OVER w >= 1800000000 OR
             |              LAG(us) OVER w IS NULL THEN 1 ELSE 0 END AS brk
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)
             |), sess AS (
             |  SELECT user_id, value, us,
             |    SUM(brk) OVER (PARTITION BY user_id ORDER BY us
             |      ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM marked)
             |SELECT user_id, MIN(us) AS start_us, COUNT(*) AS n_events,
             |  ROUND(SUM(value), 2) AS total_value
             |FROM sess GROUP BY user_id, sid
             |ORDER BY user_id, start_us""".stripMargin)),

    Q("events_scd2_intervals", // SCD type-2 history build: collapse the
      // per-user event stream to change records (lag filter), then close
      // each validity interval with the next change's timestamp (lead) —
      // two window passes over one shuffle on user_id, the standard
      // temporal-dimension shape
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(unix_millis(col("ts")), col("event_id"))
        t(s, d, "events")
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
          .withColumn("prev", lag("event_type", 1).over(w))
          .filter(col("prev").isNull || col("prev") =!= col("event_type"))
          .withColumn("valid_to_ms", lead(unix_millis(col("ts")), 1).over(w))
          .select(col("user_id"), col("event_type"),
            unix_millis(col("ts")).as("valid_from_ms"), col("valid_to_ms"))
          .orderBy("user_id", "valid_from_ms", "event_type")
      },
      Some("""WITH ordered AS (
             |  SELECT user_id, event_type, epoch_ms(ts) AS ms, event_id,
             |    LAG(event_type) OVER (PARTITION BY user_id
             |      ORDER BY epoch_ms(ts), event_id) AS prev
             |  FROM events),
             |changes AS (
             |  SELECT user_id, event_type, ms, event_id FROM ordered
             |  WHERE prev IS NULL OR prev <> event_type)
             |SELECT user_id, event_type, ms AS valid_from_ms,
             |  LEAD(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS valid_to_ms
             |FROM changes ORDER BY user_id, valid_from_ms, event_type""".stripMargin)),

    Q("events_latest_per_user", // arg-max compaction: latest record per
      // key via max_by on a composite (ts, id) order — one hash agg, no
      // window sort of the full stream
      (s, d) => {
        val ord = unix_millis(col("ts")) * lit(1000000L) + col("event_id")
        t(s, d, "events").groupBy("user_id")
          .agg(max_by(col("event_id"), ord).as("last_event_id"),
            max_by(col("event_type"), ord).as("last_type"),
            max(unix_millis(col("ts"))).as("last_ts_ms"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id,
             |arg_max(event_id, epoch_ms(ts) * 1000000 + event_id) AS last_event_id,
             |arg_max(event_type, epoch_ms(ts) * 1000000 + event_id) AS last_type,
             |max(epoch_ms(ts)) AS last_ts_ms
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    Q("events_time_weighted_value", // time-weighted mean of a state
      // variable: each event's value holds until the user's next event
      // (LEAD), the final state until the corpus max timestamp — the
      // correct average for irregularly-sampled state, where the plain
      // AVG over-weights bursts. Weights are integer (cents × whole
      // seconds held) so both engines sum EXACTLY — one division at the
      // end, never a float accumulation.
      (s, d) => {
        val ev = t(s, d, "events")
        val anchor = ev.agg(max(unix_millis(col("ts"))).as("mx_ms"))
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        ev.select(col("user_id"), col("ts"), col("event_id"),
            col("value"))
          .withColumn("next_ms",
            lead(unix_millis(col("ts")), 1).over(w))
          .crossJoin(broadcast(anchor))
          .withColumn("dur_s",
            (coalesce(col("next_ms"), col("mx_ms"))
              - unix_millis(col("ts"))).divide(1000).cast("long"))
          .withColumn("cents", round(col("value") * 100, 0).cast("long"))
          .groupBy("user_id")
          .agg(sum(col("cents") * col("dur_s")).as("wsum"),
            sum(col("dur_s")).as("held_s"))
          .filter(col("held_s") > 0)
          .select(col("user_id"), col("held_s"),
            round(col("wsum").cast("double") / col("held_s") / 100.0, 6)
              .as("tw_value"))
          .orderBy("user_id").limit(100)
      },
      Some("""WITH mx AS (SELECT MAX(epoch_ms(ts)) AS mx_ms FROM events),
             |iv AS (
             |  SELECT user_id,
             |    CAST(ROUND(value * 100, 0) AS BIGINT) AS cents,
             |    CAST((COALESCE(LEAD(epoch_ms(ts)) OVER (
             |        PARTITION BY user_id ORDER BY ts, event_id), mx_ms)
             |      - epoch_ms(ts)) // 1000 AS BIGINT) AS dur_s
             |  FROM events, mx)
             |SELECT user_id, CAST(SUM(dur_s) AS BIGINT) AS held_s,
             |  ROUND(CAST(SUM(cents * dur_s) AS DOUBLE)
             |    / SUM(dur_s) / 100.0, 6) AS tw_value
             |FROM iv GROUP BY user_id HAVING SUM(dur_s) > 0
             |ORDER BY user_id LIMIT 100""".stripMargin)),

    Q("events_json_extract",
      (s, d) => t(s, d, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .orderBy("event_id").limit(200),
      Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
             |FROM events ORDER BY event_id LIMIT 200""".stripMargin)),

    Q("events_json_agg",
      (s, d) => t(s, d, "events")
        .groupBy("event_type")
        .agg(round(avg(get_json_object(col("props"), "$.k").cast("double")), 4).as("avg_k"),
          count(lit(1)).as("n"))
        .orderBy("event_type"),
      Some("""SELECT event_type,
             |ROUND(AVG(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 4) AS avg_k,
             |COUNT(*) AS n FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    Q("events_variant_shred", // Spark 4 VARIANT path: props parse ONCE
      // into the binary variant encoding, typed extraction via
      // variant_get — the engine's semi-structured shredding surface,
      // distinct from the string-path get_json_object twin above. The
      // rollup asserts extraction totality (n_missing) plus typed
      // min/avg/max; DuckDB's JSON type is the oracle's equivalent.
      (s, d) => t(s, d, "events")
        .select(col("event_type"),
          // try_parse_json, not parse_json: malformed props must surface
          // as NULL (counted in n_missing) exactly like the oracle's
          // json_extract — ANSI parse_json would throw instead
          expr("variant_get(try_parse_json(props), '$.k', 'int')").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_missing"),
          round(avg(col("k")), 4).as("avg_k"),
          min("k").as("min_k"), max("k").as("max_k"))
        .orderBy("event_type"),
      Some("""SELECT event_type, COUNT(*) AS n,
             |  CAST(SUM(CASE WHEN json_extract(props, '$.k') IS NULL
             |      THEN 1 ELSE 0 END) AS BIGINT) AS n_missing,
             |  ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INT)), 4)
             |    AS avg_k,
             |  MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
             |  MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    Q("events_json_quarantine", // bad-record channel: corrupt JSON rows
      // count into a quarantine lane instead of failing the job
      // (from_json is PERMISSIVE — malformed input nulls the struct).
      // Corruption is injected deterministically: every 31st event's
      // props is TRUNCATED (trailing-garbage corruption doesn't work as
      // an injection — Jackson stops at the first complete value, so
      // Spark accepts it while DuckDB's json_valid rejects it; an
      // incomplete object is malformed to both).
      (s, d) => t(s, d, "events")
        .withColumn("p2", when(col("event_id") % 31 === 0,
          expr("substring(props, 1, length(props) - 1)"))
          .otherwise(col("props")))
        .withColumn("k", from_json(col("p2"),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.IntegerType)))).getField("k"))
        .groupBy("event_type")
        .agg(sum(when(col("k").isNotNull, 1L).otherwise(0L)).as("n_good"),
          sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_quarantined"))
        .orderBy("event_type"),
      Some("""WITH e AS (
             |  SELECT event_type,
             |    CASE WHEN event_id % 31 = 0
             |      THEN substring(props, 1, length(props) - 1) ELSE props END AS p2
             |  FROM events)
             |SELECT event_type,
             |  CAST(SUM(CASE WHEN json_valid(p2) THEN 1 ELSE 0 END) AS BIGINT) AS n_good,
             |  CAST(SUM(CASE WHEN json_valid(p2) THEN 0 ELSE 1 END) AS BIGINT) AS n_quarantined
             |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin)),

    Q("events_daily", // tumbling day buckets via date_trunc
      (s, d) => t(s, d, "events")
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
        .orderBy("day"),
      Some("""SELECT date_trunc('day', ts) AS day, COUNT(*) AS n,
             |ROUND(SUM(value), 2) AS total_value
             |FROM events GROUP BY day ORDER BY day""".stripMargin)),

    Q("events_ewma_daily", // EWMA-smoothed daily counts per event type,
      // alpha = 1/2 BY DESIGN: the recurrence's closed form collapses to
      // (running_sum(n_i * 2^i) + n_0) / 2^(t+1) — every term a dyadic
      // rational, exactly representable in doubles, so the smoothed
      // series is BIT-identical across engines with no float-order
      // slack at all. One day-grained agg, one bounded window per type.
      (s, d) => {
        val w = Window.partitionBy("event_type").orderBy("day")
        val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d, "events")
          .groupBy(col("event_type"),
            date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(count(lit(1)).cast("double").as("n"))
          .withColumn("i", row_number().over(w).cast("double") - 1)
          .withColumn("s", sum(col("n") * pow(lit(2.0), col("i"))).over(wc))
          .withColumn("f", first("n").over(wc))
          .select(col("event_type"), col("day"),
            col("n").cast("long").as("n"),
            round((col("s") + col("f")) / pow(lit(2.0), col("i") + 1), 4)
              .as("ewma"))
          .orderBy("event_type", "day")
      },
      Some("""WITH daily AS (
             |  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
             |    CAST(COUNT(*) AS DOUBLE) AS n
             |  FROM events GROUP BY 1, 2),
             |idx AS (SELECT event_type, day, n,
             |  CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
             |    AS DOUBLE) - 1 AS i
             |  FROM daily),
             |acc AS (SELECT event_type, day, n, i,
             |  SUM(n * POW(2.0, i)) OVER (PARTITION BY event_type ORDER BY i
             |    ROWS UNBOUNDED PRECEDING) AS s,
             |  FIRST_VALUE(n) OVER (PARTITION BY event_type ORDER BY i) AS f
             |  FROM idx)
             |SELECT event_type, day, CAST(n AS BIGINT) AS n,
             |  ROUND((s + f) / POW(2.0, i + 1), 4) AS ewma
             |FROM acc ORDER BY event_type, day""".stripMargin)),

    Q("events_dow_seasonality", // day-of-week seasonal profile: per
      // (type, ISO weekday) mean daily count and its ratio to the type's
      // overall mean — the multiplicative seasonal index a forecast
      // divides out. Integer sums until the final ratios: bit-exact.
      (s, d) => {
        val daily = t(s, d, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
          .select(col("event_type"), (weekday(col("day")) + 1).as("dow"),
            col("n"))
        val per = daily.groupBy("event_type", "dow")
          .agg(count(lit(1)).as("n_days"), sum("n").as("tot"))
        val typ = daily.groupBy("event_type")
          .agg(sum("n").as("t_tot"), count(lit(1)).as("t_days"))
        per.join(broadcast(typ), Seq("event_type"))
          .select(col("event_type"), col("dow"), col("n_days"),
            round(col("tot").cast("double") / col("n_days"), 4).as("avg_n"),
            round((col("tot").cast("double") / col("n_days"))
              / (col("t_tot").cast("double") / col("t_days")), 4)
              .as("seasonal_index"))
          .orderBy("event_type", "dow")
      },
      Some("""WITH daily AS (
             |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
             |  FROM events GROUP BY 1, 2),
             |dowd AS (SELECT event_type, isodow(day) AS dow, n FROM daily),
             |per AS (SELECT event_type, dow, COUNT(*) AS n_days,
             |  SUM(n) AS tot FROM dowd GROUP BY 1, 2),
             |typ AS (SELECT event_type, SUM(n) AS t_tot, COUNT(*) AS t_days
             |  FROM dowd GROUP BY 1)
             |SELECT p.event_type, p.dow, p.n_days,
             |  ROUND(CAST(p.tot AS DOUBLE) / p.n_days, 4) AS avg_n,
             |  ROUND((CAST(p.tot AS DOUBLE) / p.n_days)
             |    / (CAST(t.t_tot AS DOUBLE) / t.t_days), 4) AS seasonal_index
             |FROM per p JOIN typ t USING (event_type)
             |ORDER BY event_type, dow""".stripMargin)),

    Q("events_seasonal_naive", // seasonal-naive backtest: forecast each
      // day with the count seven days earlier, report per-type MAPE/MAE.
      // The lag is a keyed equi-join on (type, day-7), not a window over
      // a possibly-gapped series — missing days drop out instead of
      // silently lagging the wrong row. Error terms are integer-valued,
      // so only MAPE's ratio sum carries float addition (round 4).
      (s, d) => {
        val daily = t(s, d, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
        val prior = daily.select(col("event_type").as("ptype"),
          col("day").as("pday"), col("n").as("pred"))
        daily
          .join(prior, col("event_type") === col("ptype")
            && date_sub(col("day"), 7) === col("pday"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_days"),
            round(avg(abs(col("n").cast("double") - col("pred"))
              / col("n")), 4).as("mape"),
            round(avg(abs(col("n").cast("double") - col("pred"))), 4)
              .as("mae"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (
             |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
             |  FROM events GROUP BY 1, 2)
             |SELECT a.event_type, COUNT(*) AS n_days,
             |  ROUND(AVG(ABS(CAST(a.n AS DOUBLE) - b.n) / a.n), 4) AS mape,
             |  ROUND(AVG(ABS(CAST(a.n AS DOUBLE) - b.n)), 4) AS mae
             |FROM daily a JOIN daily b
             |  ON a.event_type = b.event_type
             |  AND b.day = a.day - INTERVAL 7 DAY
             |GROUP BY a.event_type ORDER BY a.event_type""".stripMargin)),

    Q("events_markov_transitions", // first-order Markov model of the
      // per-user event sequence: next-event lead over the (user, time)
      // order, transition counts, then row-normalized probabilities.
      // Ordering is in MICROSECONDS + event_id (the fixture has sub-ms
      // timestamps; ms truncation could order tied rows differently than
      // the oracle). The normalizing window spans the 5x5 transition
      // matrix — bounded by the event-type vocabulary, not the data.
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(unix_micros(col("ts")), col("event_id"))
        val wt = Window.partitionBy("from_type")
        t(s, d, "events")
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
          .withColumn("next_type", lead("event_type", 1).over(w))
          .filter(col("next_type").isNotNull)
          .groupBy(col("event_type").as("from_type"),
            col("next_type").as("to_type"))
          .agg(count(lit(1)).as("n"))
          .withColumn("p",
            round(col("n").cast("double") / sum("n").over(wt), 4))
          .orderBy("from_type", "to_type")
      },
      Some("""WITH seq AS (
             |  SELECT user_id, event_type,
             |    LEAD(event_type) OVER (PARTITION BY user_id
             |      ORDER BY epoch_us(ts), event_id) AS next_type
             |  FROM events),
             |c AS (SELECT event_type AS from_type, next_type AS to_type,
             |    COUNT(*) AS n
             |  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2)
             |SELECT from_type, to_type, n,
             |  ROUND(CAST(n AS DOUBLE)
             |    / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE), 4) AS p
             |FROM c ORDER BY from_type, to_type""".stripMargin)),

    Q("events_touch_attribution", // rule-based attribution trio:
      // every purchase credits its same-user touches (view/click/
      // signup) within a 1-hour lookback — 1.0 to the first touch,
      // 1.0 to the last, 1/k to each under linear — the three
      // baselines the Markov/absorbing models are judged against.
      // The touch window is a user-keyed equi join with a range
      // predicate (never a time cross join); per-purchase ranks run
      // over purchase-sized partitions. First/last credits are exact
      // integers; linear's Σ1/k rounds at 6dp.
      (s, d) => {
        val ev = t(s, d, "events").select(col("user_id"),
          col("event_type"), unix_micros(col("ts")).as("us"),
          col("event_id"))
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("puid"), col("us").as("pus"),
            col("event_id").as("pid"))
        val tch = ev.filter(col("event_type").isin("view", "click", "signup"))
        val j = tch.join(p, col("user_id") === col("puid")
          && col("us") < col("pus")
          && col("us") >= col("pus") - 3600000000L)
        val w = Window.partitionBy("pid")
        j.withColumn("k", count(lit(1)).over(w))
          .withColumn("rf", row_number().over(
            w.orderBy(col("us"), col("event_id"))))
          .withColumn("rl", row_number().over(
            w.orderBy(col("us").desc, col("event_id").desc)))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_touches"),
            sum(when(col("rf") === 1, 1L).otherwise(0L)).as("first_touch"),
            sum(when(col("rl") === 1, 1L).otherwise(0L)).as("last_touch"),
            round(sum(lit(1.0) / col("k")), 6).as("linear"))
          .orderBy("event_type")
      },
      Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us,
             |    event_id FROM events),
             |p AS (SELECT user_id, us AS pus, event_id AS pid FROM e
             |  WHERE event_type = 'purchase'),
             |tch AS (SELECT * FROM e
             |  WHERE event_type IN ('view', 'click', 'signup')),
             |j AS (SELECT tch.event_type, tch.us, tch.event_id, p.pid
             |  FROM tch JOIN p ON tch.user_id = p.user_id
             |    AND tch.us < p.pus AND tch.us >= p.pus - 3600000000),
             |r AS (SELECT event_type,
             |    COUNT(*) OVER (PARTITION BY pid) AS k,
             |    ROW_NUMBER() OVER (PARTITION BY pid
             |      ORDER BY us, event_id) AS rf,
             |    ROW_NUMBER() OVER (PARTITION BY pid
             |      ORDER BY us DESC, event_id DESC) AS rl
             |  FROM j)
             |SELECT event_type, COUNT(*) AS n_touches,
             |  CAST(SUM(CASE WHEN rf = 1 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS first_touch,
             |  CAST(SUM(CASE WHEN rl = 1 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS last_touch,
             |  ROUND(SUM(1.0 / k), 6) AS linear
             |FROM r GROUP BY 1 ORDER BY event_type""".stripMargin)),

    Q("events_absorbing_conversion", // absorbing-chain attribution:
      // with 'purchase'/'error' absorbing, the probability each
      // transient state converts (hits purchase before error) — the
      // fundamental-matrix quantity behind Markov removal-effect
      // attribution, computed as 12 unrolled value iterations
      // h←P_abs + P_trans·h (monotone from h₀=0; fixed rounds so the
      // oracle replays them). The DISTRIBUTED work is the transition
      // count; the ≤|types|² probability matrix is model state
      // (collected like a centroid table) and the tiny iteration runs
      // on it — the oracle chains the same 12 rounds as CTEs. Counts
      // exact; one rounded output.
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(unix_micros(col("ts")), col("event_id"))
        val tr = t(s, d, "events")
          .select(col("user_id"), col("event_type").as("cur"),
            col("ts"), col("event_id"))
          .withColumn("nxt", lead("cur", 1).over(w))
          .filter(col("nxt").isNotNull
            && !col("cur").isin("purchase", "error"))
          .groupBy("cur", "nxt").agg(count(lit(1)).as("c"))
        val rows = tr.collect()
          .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        val tot = rows.groupBy(_._1).map { case (k, v) =>
          k -> v.map(_._3).sum }
        val p = rows.map { case (c, n, cnt) => (c, n, cnt.toDouble / tot(c)) }
        val states = tot.keys.toSeq.sorted
        var h = states.map(_ -> 0.0).toMap
        for (_ <- 1 to 12)
          h = states.map { st =>
            st -> p.filter(_._1 == st).sortBy(_._2).map { case (_, n, pr) =>
              if (n == "purchase") pr else pr * h.getOrElse(n, 0.0)
            }.sum
          }.toMap
        import s.implicits._
        states.map(st => (st, tot(st), BigDecimal(h(st))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
          .toDF("state", "n_transitions", "p_convert")
      },
      Some {
        def rnd(k: Int): String =
          s"""h$k AS (
             |  SELECT p.cur AS s,
             |    SUM(CASE WHEN p.nxt = 'purchase' THEN p.p
             |             ELSE p.p * COALESCE(h.h, 0.0) END) AS h
             |  FROM p LEFT JOIN h${k - 1} h ON h.s = p.nxt
             |  GROUP BY 1)""".stripMargin
        s"""WITH seq AS (
           |  SELECT user_id, event_type AS cur,
           |    LEAD(event_type) OVER (PARTITION BY user_id
           |      ORDER BY epoch_us(ts), event_id) AS nxt
           |  FROM events),
           |tr AS (SELECT cur, nxt, COUNT(*) AS c FROM seq
           |  WHERE nxt IS NOT NULL AND cur NOT IN ('purchase', 'error')
           |  GROUP BY 1, 2),
           |tot AS (SELECT cur, SUM(c) AS tc FROM tr GROUP BY 1),
           |p AS (SELECT tr.cur, tr.nxt, tr.c * 1.0 / tot.tc AS p
           |  FROM tr JOIN tot USING (cur)),
           |h0 AS (SELECT cur AS s, 0.0 AS h FROM tot),
           |${(1 to 12).map(rnd).mkString(",\n")}
           |SELECT h.s AS state, CAST(tot.tc AS BIGINT) AS n_transitions,
           |  ROUND(h.h, 6) AS p_convert
           |FROM h12 h JOIN tot ON tot.cur = h.s
           |ORDER BY state""".stripMargin
      }),

    Q("events_sequence_pattern", // regex over JOURNEYS: each user's
      // time-ordered event types collapse to an initial-letter string
      // (c/e/p/s/v) and funnel questions become regexes — 'view then
      // click then purchase with nothing bought in between', 'error
      // after purchase' — the lightweight MATCH_RECOGNIZE. The journey
      // build is one per-user aggregation (bounded by journey length;
      // a production pipeline caps it) and the pattern scan is
      // per-user narrow work. Counts exact; one rounded share.
      (s, d) => {
        val j = t(s, d, "events").groupBy("user_id").agg(
          array_join(transform(array_sort(collect_list(struct(
            unix_micros(col("ts")).as("t"), col("event_id").as("e"),
            substring(col("event_type"), 1, 1).as("l")))),
            x => x.getField("l")), "").as("journey"))
        j.select(col("journey"), explode(typedLit(Seq(
            "v[^p]*c[^p]*p", "^s", "e.*e.*e", "p.*e"))).as("pattern"))
          .groupBy("pattern")
          .agg(count(lit(1)).as("n_users"),
            sum(when(regexp_like(col("journey"), col("pattern")), 1L)
              .otherwise(0L)).as("n_matched"))
          .withColumn("share",
            round(col("n_matched").cast("double") / col("n_users"), 6))
          .orderBy("pattern")
      },
      Some("""WITH j AS (
             |  SELECT user_id,
             |    string_agg(substr(event_type, 1, 1), ''
             |      ORDER BY epoch_us(ts), event_id) AS journey
             |  FROM events GROUP BY 1),
             |p(pattern) AS (VALUES ('v[^p]*c[^p]*p'), ('^s'),
             |  ('e.*e.*e'), ('p.*e'))
             |SELECT pattern, COUNT(*) AS n_users,
             |  CAST(SUM(CASE WHEN regexp_matches(journey, pattern)
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
             |  ROUND(CAST(SUM(CASE WHEN regexp_matches(journey, pattern)
             |    THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS share
             |FROM j, p GROUP BY 1 ORDER BY pattern""".stripMargin)),

    Q("events_hourly_by_type", // window(ts, 1h) ≡ date_trunc hour
      (s, d) => t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour").getField("start").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy("hour", "event_type"),
      Some("""SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n
             |FROM events GROUP BY hour, event_type ORDER BY hour, event_type""".stripMargin)),

    Q("events_funnel", // ordered-sequence funnel (view → click →
      // purchase): one hash agg collapses each user to first-touch
      // timestamps, the ordering predicates run on the 1-row-per-user
      // result — no self-joins over the event stream
      (s, d) => {
        def firstTs(et: String) =
          min(when(col("event_type") === et, col("ts"))).as(s"t_$et")
        t(s, d, "events").groupBy("user_id")
          .agg(firstTs("view"), firstTs("click"), firstTs("purchase"))
          .agg(count(lit(1)).as("n_users"),
            count(col("t_view")).as("n_view"),
            count(when(col("t_click") > col("t_view"), 1)).as("n_view_click"),
            count(when(col("t_purchase") > col("t_click")
              && col("t_click") > col("t_view"), 1)).as("n_full_funnel"))
      },
      Some("""WITH t AS (
             |  SELECT user_id,
             |    min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             |    min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
             |  FROM events GROUP BY user_id
             |)
             |SELECT COUNT(*) AS n_users,
             |  COUNT(t_view) AS n_view,
             |  COUNT(CASE WHEN t_click > t_view THEN 1 END) AS n_view_click,
             |  COUNT(CASE WHEN t_purchase > t_click AND t_click > t_view THEN 1 END) AS n_full_funnel
             |FROM t""".stripMargin)),

    Q("events_retention_cohorts", // retention triangle: first-seen day per
      // user (broadcast back — the cohort dim is |users|, tiny next to the
      // event stream) × activity day → distinct active users per cell
      (s, d) => {
        val e = t(s, d, "events")
          .withColumn("day", date_trunc("day", col("ts")))
        val firstDay = e.groupBy("user_id")
          .agg(min(col("day")).as("cohort_day"))
        e.join(broadcast(firstDay), "user_id")
          .withColumn("age_days",
            datediff(col("day").cast("date"), col("cohort_day").cast("date")))
          .filter(col("age_days") <= 7)
          .groupBy(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"), col("age_days"))
          .agg(countDistinct("user_id").as("active_users"))
          .orderBy("cohort_day", "age_days")
      },
      Some("""WITH first_day AS (
             |  SELECT user_id, min(date_trunc('day', ts)) AS cohort_day
             |  FROM events GROUP BY user_id
             |)
             |SELECT CAST(cohort_day AS VARCHAR) AS cohort_day,
             |  CAST(date_diff('day', cohort_day, date_trunc('day', ts)) AS INT) AS age_days,
             |  COUNT(DISTINCT e.user_id) AS active_users
             |FROM events e JOIN first_day f ON e.user_id = f.user_id
             |WHERE date_diff('day', cohort_day, date_trunc('day', ts)) <= 7
             |GROUP BY cohort_day, age_days ORDER BY cohort_day, age_days""".stripMargin)),

    Q("events_rolling_dau", // daily distinct users + 7-day rolling mean:
      // the window runs over the DAY-grained aggregate (≤365 rows/yr),
      // never over raw events
      (s, d) => {
        val daily = t(s, d, "events")
          .groupBy(date_trunc("day", col("ts")).as("day"))
          .agg(countDistinct("user_id").as("dau"))
        // unpartitioned window BY DESIGN over the bounded day aggregate —
        // the WindowExec "No Partition Defined" warning this logs is the
        // audited, benign case (≤365 rows reach the single partition)
        val w = Window.orderBy(col("day")).rowsBetween(-6, Window.currentRow)
        daily
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("dau"),
            round(avg("dau").over(w), 4).as("dau_7d"))
          .orderBy("day")
      },
      Some("""WITH daily AS (
             |  SELECT date_trunc('day', ts) AS day, COUNT(DISTINCT user_id) AS dau
             |  FROM events GROUP BY day
             |)
             |SELECT CAST(day AS VARCHAR) AS day, dau,
             |  ROUND(AVG(dau) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS dau_7d
             |FROM daily ORDER BY day""".stripMargin)),

    Q("events_sessionize", // custom state op: 30-min-gap sessions
      (s, d) => {
        val sessions = graft.streaming.EventStream.sessionize(s, t(s, d, "events"))
        sessions.toDF()
          .select(col("user_id"), col("start_ms"), col("end_ms"), col("n_events"),
            round(col("total_value"), 2).as("total_value"))
          .orderBy("user_id", "start_ms")
      },
      Some("""WITH g AS (
             |  SELECT user_id, event_id, ts, value,
             |    CASE WHEN lag(ts) OVER w IS NULL
             |         OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
             |         THEN 1 ELSE 0 END AS brk
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |), sess AS (
             |  SELECT user_id, ts, value,
             |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |  FROM g
             |)
             |SELECT user_id, epoch_ms(MIN(ts)) AS start_ms, epoch_ms(MAX(ts)) AS end_ms,
             |  COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total_value
             |FROM sess GROUP BY user_id, sid
             |ORDER BY user_id, start_ms""".stripMargin)),

    Q("events_sessionize_tws", // the SAME 30-min-gap sessionization on
      // Spark 4's transformWithState (StatefulProcessor + typed
      // ValueState) — the arbitrary-state API superseding
      // flatMapGroupsWithState; output contract and oracle shared with
      // events_sessionize, pinning the two state APIs to each other.
      (s, d) => {
        val sessions = graft.streaming.EventStream.sessionizeTws(s, t(s, d, "events"))
        sessions.toDF()
          .select(col("user_id"), col("start_ms"), col("end_ms"), col("n_events"),
            round(col("total_value"), 2).as("total_value"))
          .orderBy("user_id", "start_ms")
      },
      Some("""WITH g AS (
             |  SELECT user_id, event_id, ts, value,
             |    CASE WHEN lag(ts) OVER w IS NULL
             |         OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
             |         THEN 1 ELSE 0 END AS brk
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |), sess AS (
             |  SELECT user_id, ts, value,
             |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |  FROM g
             |)
             |SELECT user_id, epoch_ms(MIN(ts)) AS start_ms, epoch_ms(MAX(ts)) AS end_ms,
             |  COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total_value
             |FROM sess GROUP BY user_id, sid
             |ORDER BY user_id, start_ms""".stripMargin)),

    Q("events_sliding_counts", // sliding-window rates: 1-hour windows
      // every 15 minutes (window/slide §2.5 surface — the tumbling
      // twin is events_hourly_by_type). Each event fans out to exactly
      // 4 epoch-aligned windows map-side, then one hash agg; the oracle
      // reproduces the fan-out with a range(4) cross join onto
      // time_bucket (both grids are midnight-aligned, so the window
      // starts coincide).
      (s, d) => t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour", "15 minutes")
          .getField("start").as("ws"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
        .orderBy("ws", "event_type"),
      Some("""SELECT time_bucket(INTERVAL 15 MINUTE, ts)
             |    - k * INTERVAL 15 MINUTE AS ws,
             |  event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value
             |FROM events, range(0, 4) r(k)
             |GROUP BY ws, event_type ORDER BY ws, event_type""".stripMargin)),

    Q("events_anomaly_days", // same-weekday anomaly screen: a day is
      // anomalous for an event type when its count sits more than 2σ
      // from that type's same-DOW profile — the seasonality-aware twin
      // of a plain daily z-score. Both mean and σ are spelled out as
      // the identical moment formula in both engines (never the
      // engine's own STDDEV kernel) over exact integer counts, so the
      // flag threshold compares bit-identical doubles. One day-grained
      // rollup, one DOW-grained profile join.
      (s, d) => {
        val daily = t(s, d, "events")
          .groupBy(date_trunc("day", col("ts")).as("day"),
            col("event_type"))
          .agg(count(lit(1)).as("n"))
          .withColumn("dow", dayofweek(col("day")))
        val prof = daily.groupBy("event_type", "dow").agg(
          count(lit(1)).as("k"),
          sum("n").as("sn"),
          sum(col("n") * col("n")).as("ssq"))
        val mean = col("sn").cast("double") / col("k")
        val variance = (col("ssq").cast("double") - col("k") * mean * mean) /
          (col("k") - 1)
        daily.join(broadcast(prof), Seq("event_type", "dow"))
          .filter(col("k") > 1)
          .withColumn("mean", mean)
          .withColumn("sd", sqrt(variance))
          .withColumn("is_anomaly",
            (col("sd") > 0.0
              && abs(col("n") - col("mean")) > lit(2.0) * col("sd"))
              .cast("int"))
          .select(col("day"), col("event_type"), col("n"),
            round(col("mean"), 4).as("dow_mean"),
            round(col("sd"), 4).as("dow_sd"), col("is_anomaly"))
          .orderBy("day", "event_type")
      },
      Some("""WITH daily AS (
             |  SELECT date_trunc('day', ts) AS day, event_type,
             |    COUNT(*) AS n
             |  FROM events GROUP BY 1, 2),
             |dw AS (SELECT day, event_type, n,
             |    dayofweek(day) + 1 AS dow FROM daily),
             |prof AS (
             |  SELECT event_type, dow, COUNT(*) AS k, SUM(n) AS sn,
             |    SUM(n * n) AS ssq
             |  FROM dw GROUP BY 1, 2)
             |SELECT day, event_type, n,
             |  ROUND(CAST(sn AS DOUBLE) / k, 4) AS dow_mean,
             |  ROUND(SQRT((CAST(ssq AS DOUBLE)
             |    - k * (CAST(sn AS DOUBLE) / k) * (CAST(sn AS DOUBLE) / k))
             |    / (k - 1)), 4) AS dow_sd,
             |  CAST(SQRT((CAST(ssq AS DOUBLE)
             |      - k * (CAST(sn AS DOUBLE) / k) * (CAST(sn AS DOUBLE) / k))
             |      / (k - 1)) > 0.0
             |    AND ABS(n - CAST(sn AS DOUBLE) / k)
             |      > 2.0 * SQRT((CAST(ssq AS DOUBLE)
             |        - k * (CAST(sn AS DOUBLE) / k) * (CAST(sn AS DOUBLE) / k))
             |        / (k - 1)) AS INT) AS is_anomaly
             |FROM dw JOIN prof USING (event_type, dow)
             |WHERE k > 1 ORDER BY day, event_type""".stripMargin)),

    Q("events_psi_drift", // population-stability-index drift monitor:
      // event-type mix in the later half of the observed day range vs
      // the earlier half — the production "did the distribution move"
      // check run before a data refresh is admitted. The half split is
      // pure integer day arithmetic (2·elapsed < span), add-one
      // smoothing keeps types absent from one half finite, and every
      // probability is a single integer÷integer division, so the PSI
      // terms are bit-identical across engines. One scan, one
      // type-grained pivot; totals ride a 1-row broadcast.
      (s, d) => {
        val ev = t(s, d, "events")
        val bounds = ev.agg(
          date_trunc("day", min("ts")).as("lo"),
          date_trunc("day", max("ts")).as("hi"))
        val wide = ev.crossJoin(broadcast(bounds))
          .withColumn("half",
            when(lit(2) * datediff(col("ts"), col("lo"))
              < datediff(col("hi"), col("lo")) + 1, "ref")
              .otherwise("cur"))
          .groupBy("event_type").pivot("half", Seq("ref", "cur"))
          .agg(count(lit(1))).na.fill(0, Seq("ref", "cur"))
        val tot = wide.agg(sum("ref").as("tr"), sum("cur").as("tc"),
          count(lit(1)).as("k"))
        val pRef = (col("ref") + 1).cast("double") / (col("tr") + col("k"))
        val pCur = (col("cur") + 1).cast("double") / (col("tc") + col("k"))
        wide.crossJoin(broadcast(tot))
          .select(col("event_type"), col("ref").as("n_ref"),
            col("cur").as("n_cur"),
            round(pRef, 6).as("p_ref"), round(pCur, 6).as("p_cur"),
            round((pCur - pRef) * log(pCur / pRef), 6).as("psi_term"))
          .orderBy("event_type")
      },
      Some("""WITH b AS (
             |  SELECT date_trunc('day', MIN(ts)) AS lo,
             |    date_trunc('day', MAX(ts)) AS hi FROM events),
             |h AS (
             |  SELECT event_type,
             |    CASE WHEN 2 * date_diff('day', CAST(lo AS DATE),
             |        CAST(ts AS DATE))
             |      < date_diff('day', CAST(lo AS DATE), CAST(hi AS DATE)) + 1
             |      THEN 'ref' ELSE 'cur' END AS half
             |  FROM events, b),
             |c AS (
             |  SELECT event_type,
             |    COUNT(CASE WHEN half = 'ref' THEN 1 END) AS n_ref,
             |    COUNT(CASE WHEN half = 'cur' THEN 1 END) AS n_cur
             |  FROM h GROUP BY 1),
             |t AS (SELECT SUM(n_ref) AS tr, SUM(n_cur) AS tc,
             |  COUNT(*) AS k FROM c)
             |SELECT event_type, n_ref, n_cur,
             |  ROUND(CAST(n_ref + 1 AS DOUBLE) / (tr + k), 6) AS p_ref,
             |  ROUND(CAST(n_cur + 1 AS DOUBLE) / (tc + k), 6) AS p_cur,
             |  ROUND((CAST(n_cur + 1 AS DOUBLE) / (tc + k)
             |      - CAST(n_ref + 1 AS DOUBLE) / (tr + k))
             |    * LN((CAST(n_cur + 1 AS DOUBLE) / (tc + k))
             |      / (CAST(n_ref + 1 AS DOUBLE) / (tr + k))), 6) AS psi_term
             |FROM c, t ORDER BY event_type""".stripMargin)),

    Q("events_stream_hourly", // §2.9: REAL readStream (AvailableNow) with a
      // 10-min watermark; append mode emits exactly the watermark-closed
      // windows, which the oracle reproduces with the same cutoff
      (s, d) => {
        withStreamPartitions(s) {
          val q = graft.streaming.EventStream.startHourlyAgg(s, d, "stream_hourly_verify")
          q.awaitTermination(180000)
        }
        s.sql("""SELECT CAST(window.start AS STRING) AS hour, event_type, n, total_value
                |FROM stream_hourly_verify ORDER BY hour, event_type""".stripMargin)
      },
      Some("""WITH m AS (SELECT max(ts) AS mx FROM events)
             |SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour, event_type,
             |COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value
             |FROM events, m
             |WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= mx - INTERVAL 10 MINUTE
             |GROUP BY hour, event_type ORDER BY hour, event_type""".stripMargin)),

    Q("events_stream_cms", // §2.9 + sketches: the relational count-min
      // cells maintained as a COMPLETE-mode streaming aggregation —
      // state is the ≤1024-row cell table however long the stream, and
      // associative merge means the streamed sketch equals the
      // batch-built one estimate-for-estimate, so the BATCH oracle
      // checks the STREAMING result exactly (the mergeable-summary
      // property, demonstrated bit-for-bit).
      (s, d) => {
        withStreamPartitions(s) {
          val q = graft.streaming.EventStream
            .startCmsStream(s, d, "stream_cms_verify")
          q.awaitTermination(180000)
        }
        val ev = t(s, d, "events")
        val top = ev.groupBy("user_id").agg(count(lit(1)).as("exact_n"))
          .orderBy(col("exact_n").desc, col("user_id")).limit(10)
        graft.operators.Sketches
          .cmsEstimate(s.table("stream_cms_verify"), top, "user_id")
          .join(top, Seq("user_id"))
          .select(col("user_id"), col("exact_n"), col("cms_est"),
            (col("cms_est") - col("exact_n")).as("overcount"))
          .orderBy(col("exact_n").desc, col("user_id"))
      },
      Some("""WITH h(i, a, b) AS (VALUES (0, 1000003, 17), (1, 999983, 911),
             |  (2, 1000033, 3571), (3, 1000037, 7919)),
             |cells AS (
             |  SELECT i, ((a * ((user_id % 2147483647 + 2147483647) % 2147483647) + b) % 2147483647) % 256 AS bucket,
             |    COUNT(*) AS cnt
             |  FROM events, h GROUP BY 1, 2),
             |top AS (
             |  SELECT user_id, COUNT(*) AS exact_n FROM events GROUP BY 1
             |  ORDER BY exact_n DESC, user_id LIMIT 10),
             |est AS (
             |  SELECT t.user_id, MIN(c.cnt) AS cms_est
             |  FROM top t, h JOIN cells c ON c.i = h.i
             |    AND c.bucket = ((h.a * ((t.user_id % 2147483647 + 2147483647) % 2147483647) + h.b) % 2147483647) % 256
             |  GROUP BY 1)
             |SELECT t.user_id, t.exact_n, e.cms_est,
             |  e.cms_est - t.exact_n AS overcount
             |FROM top t JOIN est e USING (user_id)
             |ORDER BY exact_n DESC, user_id""".stripMargin)),

    Q("events_stream_sliding", // §2.9: SLIDING windows (1 h every 15 min)
      // on a real readStream — each event fans out to 4 window states
      // map-side; append mode emits exactly the windows whose end passed
      // the final watermark, which the oracle reproduces with the same
      // range(4) fan-out and cutoff as the batch twin
      // events_sliding_counts plus the watermark filter.
      (s, d) => {
        withStreamPartitions(s) {
          val q = graft.streaming.EventStream
            .startSlidingAgg(s, d, "stream_sliding_verify")
          q.awaitTermination(180000)
        }
        s.sql("""SELECT CAST(window.start AS STRING) AS ws, event_type, n,
                |total_value
                |FROM stream_sliding_verify ORDER BY ws, event_type""".stripMargin)
      },
      Some("""WITH m AS (SELECT max(ts) AS mx FROM events),
             |w AS (
             |  SELECT time_bucket(INTERVAL 15 MINUTE, ts)
             |      - k * INTERVAL 15 MINUTE AS ws,
             |    event_type, value, mx
             |  FROM events, range(0, 4) r(k), m)
             |SELECT CAST(ws AS VARCHAR) AS ws, event_type, COUNT(*) AS n,
             |  ROUND(SUM(value), 2) AS total_value
             |FROM w WHERE ws + INTERVAL 70 MINUTE <= mx
             |GROUP BY ws, event_type ORDER BY ws, event_type""".stripMargin)))

  private def withStreamPartitions[T](s: SparkSession)(body: => T): T = {
    // state-store partition count is fixed at stream start from
    // spark.sql.shuffle.partitions; 32 partitions for one small file is
    // pure checkpoint-IO overhead, so scope streams to 4 (measured: 1
    // partition is slightly WORSE — 16.2 s vs 15.0 s family total — the
    // stream-stream joins lose more parallelism than the state commits
    // save)
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    try body finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  private def streamQueries: Seq[Q] = Seq(
    Q("events_stream_dedup", // §2.9: streaming exactly-once dedup — the
      // source is deliberately doubled (at-least-once replay shape), the
      // watermarked dropDuplicates collapses replays with BOUNDED state;
      // the oracle is the batch distinct over the single copy
      (s, d) => {
        withStreamPartitions(s) {
          val q = graft.streaming.EventStream
            .startDedupStream(s, d, "stream_dedup_verify")
          q.awaitTermination(180000)
        }
        s.sql("""SELECT COUNT(*) AS n_unique, ROUND(SUM(value), 2) AS total_value
                |FROM stream_dedup_verify""".stripMargin)
      },
      Some("""SELECT COUNT(*) AS n_unique, ROUND(SUM(value), 2) AS total_value
             |FROM events""".stripMargin)),

    Q("events_stream_join", // §2.9: stream–stream interval join — both
      // sides watermarked, click time-bounded to [purchase − 1 h,
      // purchase], which bounds the join state store; the oracle is the
      // identical batch interval join
      (s, d) => {
        withStreamPartitions(s) {
          val q = graft.streaming.EventStream
            .startIntervalJoin(s, d, "stream_join_verify")
          q.awaitTermination(180000)
        }
        s.sql("""SELECT COUNT(*) AS n_pairs,
                |COUNT(DISTINCT purchase_id) AS n_purchases,
                |ROUND(SUM(value), 2) AS total_value
                |FROM stream_join_verify""".stripMargin)
      },
      Some("""SELECT COUNT(*) AS n_pairs,
             |COUNT(DISTINCT p.event_id) AS n_purchases,
             |ROUND(SUM(p.value), 2) AS total_value
             |FROM events p JOIN events c
             |ON p.user_id = c.user_id
             |AND p.event_type = 'purchase' AND c.event_type = 'click'
             |AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts""".stripMargin)),

    Q("events_stream_left_join", // §2.9: stream–stream LEFT OUTER interval
      // join — unmatched purchases emit null-padded on state EVICTION, so
      // only purchases older than the final watermark (min of both sides'
      // max event time, minus the 10-minute delay) can surface unmatched.
      // The oracle reproduces the matched pairs as a plain batch interval
      // join and the null rows as NOT EXISTS bounded by that watermark.
      (s, d) => {
        withStreamPartitions(s) {
          val q = graft.streaming.EventStream
            .startLeftOuterJoin(s, d, "stream_loj_verify")
          q.awaitTermination(180000)
        }
        s.sql("""SELECT COUNT(*) AS n_rows,
                |COUNT(click_id) AS n_matched_pairs,
                |SUM(CASE WHEN click_id IS NULL THEN 1 ELSE 0 END) AS n_unmatched,
                |COUNT(DISTINCT purchase_id) AS n_purchases,
                |ROUND(COALESCE(SUM(CASE WHEN click_id IS NULL THEN value END), 0), 2)
                |  AS unmatched_value
                |FROM stream_loj_verify""".stripMargin)
      },
      Some("""WITH wm AS (
             |  SELECT least(
             |    (SELECT max(ts) FROM events WHERE event_type = 'click'),
             |    (SELECT max(ts) FROM events WHERE event_type = 'purchase'))
             |    - INTERVAL 10 MINUTE AS w
             |), matched AS (
             |  SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.value
             |  FROM events p JOIN events c
             |  ON p.user_id = c.user_id
             |  AND p.event_type = 'purchase' AND c.event_type = 'click'
             |  AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
             |), unmatched AS (
             |  SELECT p.event_id AS purchase_id, p.value
             |  FROM events p, wm
             |  WHERE p.event_type = 'purchase' AND p.ts < wm.w
             |  AND NOT EXISTS (
             |    SELECT 1 FROM events c
             |    WHERE c.event_type = 'click' AND c.user_id = p.user_id
             |    AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts)
             |)
             |SELECT
             |  (SELECT COUNT(*) FROM matched) + (SELECT COUNT(*) FROM unmatched)
             |    AS n_rows,
             |  (SELECT COUNT(*) FROM matched) AS n_matched_pairs,
             |  (SELECT COUNT(*) FROM unmatched) AS n_unmatched,
             |  (SELECT COUNT(DISTINCT purchase_id) FROM
             |    (SELECT purchase_id FROM matched
             |     UNION ALL SELECT purchase_id FROM unmatched) u) AS n_purchases,
             |  (SELECT ROUND(COALESCE(SUM(value), 0), 2) FROM unmatched)
             |    AS unmatched_value""".stripMargin)),

    Q("doc_stream_dedup_lsh", // §2.9 × §2.11: dedup-at-ingest — arriving
      // documents stream-static join a persisted minhash band index of
      // the already-accepted corpus, verify Jaccard, and the colliding
      // docs emit as the reject stream. The streaming plan is STATELESS
      // (the corpus index carries all the memory), and because the
      // signature pipeline is the portable md5 one, the whole gate —
      // shingles, signatures, banding, collision, verify — is reproduced
      // by the batch oracle.
      (s, d) => {
        val index = graft.streaming.DocStream.bandIndex(t(s, d, "documents"))
        withStreamPartitions(s) {
          val q = graft.streaming.DocStream
            .startLshDedupStream(s, d, index, "doc_stream_dedup", threshold = 0.2)
          q.awaitTermination(180000)
        }
        s.sql("""SELECT DISTINCT doc_id, dup_of, jaccard FROM doc_stream_dedup
                |ORDER BY doc_id, dup_of""".stripMargin)
      },
      Some("""WITH d AS (
             |  SELECT doc_id AS id, string_split_regex(lower(trim(text)), '\s+') AS t
             |  FROM documents
             |), s AS (
             |  SELECT id, list_distinct(list_transform(
             |    range(0, greatest(len(t) - 2, 1)),
             |    i -> array_to_string(t[(i+1):(i+3)], ' '))) AS sh
             |  FROM d
             |), hm AS (
             |  SELECT id, sh, list_transform(sh,
             |    x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % 2147483647) AS hs
             |  FROM s
             |), sig AS (
             |  SELECT id, list_transform(range(0, 64), j -> list_min(
             |    list_transform(hs, h -> ((j*2+1) * h + j*12347 + 1) % 2147483647))) AS g
             |  FROM hm
             |), banded AS (
             |  SELECT id, b.b AS band,
             |    array_to_string(g[(b.b*4+1):(b.b*4+4)], ',') AS bucket
             |  FROM sig, range(0, 16) AS b(b)
             |), cand AS (
             |  SELECT DISTINCT a.id AS doc_id, c.id AS dup_of
             |  FROM banded a JOIN banded c
             |    ON a.band = c.band AND a.bucket = c.bucket AND a.id <> c.id
             |)
             |SELECT doc_id, dup_of,
             |  ROUND(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
             |    / len(list_distinct(list_concat(x.sh, y.sh))), 6) AS jaccard
             |FROM cand JOIN s x ON cand.doc_id = x.id JOIN s y ON cand.dup_of = y.id
             |WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
             |    / len(list_distinct(list_concat(x.sh, y.sh))) >= 0.2
             |ORDER BY doc_id, dup_of""".stripMargin)),

    Q("events_stream_cep", // §2.9: CEP sequence detection with custom
      // bounded state — every purchase preceded by ≥2 strictly-earlier
      // views within 30 min of the same user. flatMapGroupsWithState
      // keeps only the in-window view timestamps per key; the oracle
      // replays the same pattern as a correlated time-range count.
      (s, d) => {
        withStreamPartitions(s) {
          val q = graft.streaming.EventStream
            .startCepStream(s, d, "stream_cep_verify")
          q.awaitTermination(180000)
        }
        s.sql("""SELECT user_id, purchase_id, n_views FROM stream_cep_verify
                |ORDER BY user_id, purchase_id""".stripMargin)
      },
      Some("""WITH e AS (
             |  SELECT event_id, user_id, event_type, epoch_ms(ts) AS ms
             |  FROM events),
             |hits AS (
             |  SELECT p.user_id, p.event_id AS purchase_id,
             |    (SELECT COUNT(*) FROM e v
             |     WHERE v.user_id = p.user_id AND v.event_type = 'view'
             |       AND v.ms > p.ms - 1800000 AND v.ms < p.ms) AS n_views
             |  FROM e p WHERE p.event_type = 'purchase')
             |SELECT user_id, purchase_id, CAST(n_views AS INT) AS n_views
             |FROM hits WHERE n_views >= 2
             |ORDER BY user_id, purchase_id""".stripMargin)),

    Q("events_stream_upsert", // §2.9: foreachBatch MERGE sink — the
      // stream maintains a mutable latest-row-per-user view in keyed
      // parquet state (full-outer merge per micro-batch, atomic swap).
      // The oracle is the batch arg-max over the whole stream: whatever
      // the batch boundaries were, the merged state must equal it.
      (s, d) => {
        val stateDir = s"/tmp/graft_upsert_${new java.io.File(d).getName}"
        withStreamPartitions(s) {
          val q = graft.streaming.EventStream.startUpsertStream(s, d, stateDir)
          q.awaitTermination(180000)
        }
        s.read.parquet(s"$stateDir/current").orderBy("user_id")
      },
      Some("""SELECT user_id,
             |arg_max(event_id, epoch_ms(ts) * 1000000 + event_id) AS last_event_id,
             |arg_max(event_type, epoch_ms(ts) * 1000000 + event_id) AS last_type,
             |max(epoch_ms(ts)) AS last_ts_ms
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    Q("events_stream_enrich", // §2.9: stream–static broadcast join — the
      // stateless enrichment shape (no watermark, no state store); the
      // oracle is the identical batch join
      (s, d) => {
        val dim = t(s, d, "customer").filter(col("c_custkey") < 150)
          .select(col("c_custkey").as("dim_user_id"),
            col("c_mktsegment").as("segment"))
        withStreamPartitions(s) {
          val q = graft.streaming.EventStream
            .startEnrichedStream(s, d, dim, "stream_enrich_verify")
          q.awaitTermination(180000)
        }
        s.sql("""SELECT segment, COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value
                |FROM stream_enrich_verify GROUP BY segment ORDER BY segment""".stripMargin)
      },
      Some("""SELECT c_mktsegment AS segment, COUNT(*) AS n,
             |ROUND(SUM(value), 2) AS total_value
             |FROM events JOIN customer ON user_id = c_custkey
             |WHERE c_custkey < 150
             |GROUP BY segment ORDER BY segment""".stripMargin)),

    Q("events_stream_anomaly", // §2.9: stream–static anomaly gate — the
      // arriving stream scores against a broadcast per-type baseline
      // (first-half mean/std rounded once, so stream and oracle score
      // identical constants) and only |z| ≥ 3 rows reach the sink.
      // Stateless like the enrich join: the baseline carries the
      // memory, which is what keeps an anomaly screen viable on an
      // unbounded 100 TB ingest.
      (s, d) => {
        val base = t(s, d, "events")
          .filter(to_date(col("ts")) <
            lit(java.sql.Date.valueOf("2024-01-16")))
          .groupBy(col("event_type").as("b_type"))
          .agg(round(avg("value"), 6).as("mu"),
            round(stddev("value"), 6).as("sigma"))
        withStreamPartitions(s) {
          val q = graft.streaming.EventStream
            .startAnomalyStream(s, d, base, "stream_anomaly_verify")
          q.awaitTermination(180000)
        }
        s.sql("""SELECT event_type, COUNT(*) AS n_anomalies,
                |ROUND(MAX(ABS(z)), 4) AS max_abs_z
                |FROM stream_anomaly_verify
                |GROUP BY event_type ORDER BY event_type""".stripMargin)
      },
      Some("""WITH b AS (
             |  SELECT event_type AS b_type,
             |    ROUND(AVG(value), 6) AS mu,
             |    ROUND(stddev(value), 6) AS sigma
             |  FROM events
             |  WHERE CAST(ts AS DATE) < DATE '2024-01-16' GROUP BY 1),
             |z AS (
             |  SELECT event_type, ABS((value - mu) / sigma) AS az
             |  FROM events JOIN b ON event_type = b_type
             |  WHERE ABS((value - mu) / sigma) >= 3.0)
             |SELECT event_type, COUNT(*) AS n_anomalies,
             |  ROUND(MAX(az), 4) AS max_abs_z
             |FROM z GROUP BY event_type ORDER BY event_type""".stripMargin)),

    Q("events_funnel_latency", // step-latency profile of the funnel
      // events_funnel counts: per converting user, seconds from first
      // view to first click and first click to first purchase, with
      // mean / exact median / p90 per step. Same shape as the funnel —
      // one hash agg to first-touch timestamps, predicates on the
      // 1-row-per-user result — then exact interpolated percentiles
      // over the bounded per-step latency sets (microsecond integers
      // exact in a double after the /1e6).
      (s, d) => {
        def firstTs(et: String) =
          min(when(col("event_type") === et, unix_micros(col("ts"))))
            .as(s"t_$et")
        val ft = t(s, d, "events").groupBy("user_id")
          .agg(firstTs("view"), firstTs("click"), firstTs("purchase"))
        val s1 = ft.filter(col("t_click") > col("t_view"))
          .select(lit("1_view_to_click").as("step"),
            ((col("t_click") - col("t_view")) / 1e6).as("lat"))
        val s2 = ft.filter(col("t_purchase") > col("t_click")
            && col("t_click") > col("t_view"))
          .select(lit("2_click_to_purchase").as("step"),
            ((col("t_purchase") - col("t_click")) / 1e6).as("lat"))
        s1.unionAll(s2).groupBy("step")
          .agg(count(lit(1)).as("n"),
            round(avg("lat"), 4).as("mean_s"),
            round(expr("percentile(lat, 0.5)"), 4).as("median_s"),
            round(expr("percentile(lat, 0.9)"), 4).as("p90_s"))
          .orderBy("step")
      },
      Some("""WITH t AS (
             |  SELECT user_id,
             |    min(CASE WHEN event_type = 'view'
             |        THEN epoch_us(ts) END) AS t_view,
             |    min(CASE WHEN event_type = 'click'
             |        THEN epoch_us(ts) END) AS t_click,
             |    min(CASE WHEN event_type = 'purchase'
             |        THEN epoch_us(ts) END) AS t_purchase
             |  FROM events GROUP BY user_id),
             |l AS (
             |  SELECT '1_view_to_click' AS step,
             |    (t_click - t_view) / 1e6 AS lat
             |  FROM t WHERE t_click > t_view
             |  UNION ALL
             |  SELECT '2_click_to_purchase',
             |    (t_purchase - t_click) / 1e6
             |  FROM t WHERE t_purchase > t_click AND t_click > t_view)
             |SELECT step, COUNT(*) AS n,
             |  ROUND(AVG(lat), 4) AS mean_s,
             |  ROUND(quantile_cont(lat, 0.5), 4) AS median_s,
             |  ROUND(quantile_cont(lat, 0.9), 4) AS p90_s
             |FROM l GROUP BY step ORDER BY step""".stripMargin)),

    Q("events_decile_drift", // decile-shift table between the two month
      // halves per event type: WHERE the distribution moved and by how
      // much — the magnitude companion to events_ks_drift's single max
      // statistic. One keyed agg computes both 9-point quantile
      // vectors (the per-key percentile escape on the bounded
      // per-type grain); the zip/explode is map-side.
      (s, d) => {
        val split = lit(java.sql.Date.valueOf("2024-01-16"))
        val qs = "array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D)"
        t(s, d, "events")
          .withColumn("va", when(to_date(col("ts")) < split, col("value")))
          .withColumn("vb", when(to_date(col("ts")) >= split, col("value")))
          .groupBy("event_type")
          .agg(expr(s"percentile(va, $qs)").as("da"),
            expr(s"percentile(vb, $qs)").as("db"))
          // a type with rows in only one half gets a NULL quantile
          // vector; arrays_zip(null, …) would make posexplode emit ZERO
          // rows while the oracle's unnest(range(1,10)) still emits 9
          // NULL-decile rows — coalesce to a 9-NULL vector so both
          // engines report the one-sided type as 9 rows of NULL shift
          .withColumn("da", coalesce(col("da"),
            array(Seq.fill(9)(lit(null).cast("double")): _*)))
          .withColumn("db", coalesce(col("db"),
            array(Seq.fill(9)(lit(null).cast("double")): _*)))
          .select(col("event_type"),
            posexplode(arrays_zip(col("da"), col("db"))))
          .select(col("event_type"), ((col("pos") + 1) * 10).as("decile"),
            round(col("col.da"), 4).as("v_first"),
            round(col("col.db"), 4).as("v_second"),
            round(abs(col("col.da") - col("col.db")), 4).as("abs_shift"))
          .orderBy("event_type", "decile")
      },
      Some("""WITH g AS (
             |  SELECT event_type,
             |    quantile_cont(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
             |        THEN value END,
             |      [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS da,
             |    quantile_cont(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
             |        THEN value END,
             |      [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS db
             |  FROM events GROUP BY event_type),
             |x AS (SELECT event_type, unnest(range(1, 10)) AS i, da, db
             |      FROM g)
             |SELECT event_type, CAST(i * 10 AS INT) AS decile,
             |  ROUND(da[i], 4) AS v_first, ROUND(db[i], 4) AS v_second,
             |  ROUND(ABS(da[i] - db[i]), 4) AS abs_shift
             |FROM x ORDER BY event_type, decile""".stripMargin)),

    Q("orders_seasonal_strength", // how much of monthly revenue variance
      // the calendar-month profile explains (one-way eta²: between-month
      // sum of squares over total) — the single number that says whether
      // the seasonal index orders_month_seasonality reports is signal.
      // Revenue rounds to cents at the bounded month grain first, so
      // both engines decompose identical doubles.
      (s, d) => {
        val m = t(s, d, "orders")
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
            month(col("o_orderdate")).as("moy"))
          .agg(round(sum("o_totalprice"), 2).as("rev"))
        val g = m.withColumn("gmean", avg("rev").over(Window.partitionBy()))
          .withColumn("mmean",
            avg("rev").over(Window.partitionBy("moy")))
        g.agg(count(lit(1)).as("n_months"),
            sum(pow(col("mmean") - col("gmean"), 2)).as("ssb"),
            sum(pow(col("rev") - col("gmean"), 2)).as("sst"))
          .select(col("n_months"),
            round(col("ssb") / col("sst"), 6).as("eta_sq"))
      },
      Some("""WITH m AS (
             |  SELECT strftime(o_orderdate, '%Y-%m') AS ym,
             |    month(o_orderdate) AS moy,
             |    ROUND(SUM(o_totalprice), 2) AS rev
             |  FROM orders GROUP BY 1, 2),
             |g AS (
             |  SELECT rev,
             |    AVG(rev) OVER () AS gmean,
             |    AVG(rev) OVER (PARTITION BY moy) AS mmean
             |  FROM m)
             |SELECT COUNT(*) AS n_months,
             |  ROUND(SUM((mmean - gmean) * (mmean - gmean))
             |    / SUM((rev - gmean) * (rev - gmean)), 6) AS eta_sq
             |FROM g""".stripMargin)),

    Q("doc_prf_expansion", // pseudo-relevance-feedback retrieval (RM3
      // lite): BM25 top-10 for the seed query is the feedback set, its
      // length-normalized term mass (Σ 1/dl per occurrence, rounded
      // before ranking so both engines pick identical terms) yields 3
      // expansion terms, and the corpus is rescored with the expanded
      // query — the classic recall-widening loop. Two bounded BM25
      // passes; only the 3 expansion terms ever reach the driver.
      (s, d) => {
        val docs = t(s, d, "documents")
        val seed = Seq("spark", "join", "window")
        val top10 = graft.operators.Retrieval.bm25(docs, seed).limit(10)
          .select(col("doc_id"))
        val toks = docs.select(col("doc_id"),
          graft.operators.TextAnalysis.tokens(lower(col("text"))).as("toks"))
        val fb = toks.join(top10, "doc_id")
          .select(size(col("toks")).as("dl"), explode(col("toks")).as("term"))
          .filter(!col("term").isInCollection(seed))
          .groupBy("term").agg(round(sum(lit(1.0) / col("dl")), 6).as("w"))
          .orderBy(col("w").desc, col("term")).limit(3)
        val exp = fb.select("term").collect().map(_.getString(0)).toSeq
        graft.operators.Retrieval.bm25(docs, seed ++ exp).limit(20)
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+')
             |    AS toks
             |  FROM documents),
             |stats AS (SELECT COUNT(*) AS n, AVG(len(toks)) AS avgdl
             |          FROM tok),
             |m1 AS (
             |  SELECT doc_id, len(toks) AS dl,
             |    unnest(list_filter(toks,
             |      t -> list_contains(['spark','join','window'], t))) AS term
             |  FROM tok),
             |tf1 AS (SELECT doc_id, dl, term, COUNT(*) AS tf
             |        FROM m1 GROUP BY 1, 2, 3),
             |df1 AS (SELECT term, COUNT(DISTINCT doc_id) AS df
             |        FROM tf1 GROUP BY 1),
             |bm1 AS (
             |  SELECT doc_id, ROUND(SUM(ln((n - df + 0.5) / (df + 0.5) + 1.0)
             |    * (tf * 2.2)
             |    / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))), 4) AS score
             |  FROM tf1 JOIN df1 USING (term) CROSS JOIN stats
             |  GROUP BY doc_id),
             |top10 AS (SELECT doc_id FROM bm1
             |          ORDER BY score DESC, doc_id LIMIT 10),
             |fb AS (
             |  SELECT u.t AS term, ROUND(SUM(1.0 / len(toks)), 6) AS w
             |  FROM tok JOIN top10 USING (doc_id), unnest(toks) AS u(t)
             |  WHERE NOT list_contains(['spark','join','window'], u.t)
             |  GROUP BY u.t),
             |top3 AS (SELECT term FROM fb ORDER BY w DESC, term LIMIT 3),
             |terms2 AS (SELECT unnest(['spark','join','window']) AS term
             |           UNION ALL SELECT term FROM top3),
             |m2 AS (
             |  SELECT doc_id, len(toks) AS dl, u.t AS term
             |  FROM tok, unnest(toks) AS u(t)
             |  WHERE u.t IN (SELECT term FROM terms2)),
             |tf2 AS (SELECT doc_id, dl, term, COUNT(*) AS tf
             |        FROM m2 GROUP BY 1, 2, 3),
             |df2 AS (SELECT term, COUNT(DISTINCT doc_id) AS df
             |        FROM tf2 GROUP BY 1),
             |bm2 AS (
             |  SELECT doc_id, COUNT(DISTINCT term) AS n_terms,
             |    ROUND(SUM(ln((n - df + 0.5) / (df + 0.5) + 1.0)
             |      * (tf * 2.2)
             |      / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))), 4)
             |      AS score
             |  FROM tf2 JOIN df2 USING (term) CROSS JOIN stats
             |  GROUP BY doc_id)
             |SELECT doc_id, n_terms, score
             |FROM bm2 ORDER BY score DESC, doc_id LIMIT 20""".stripMargin)),

    Q("lineitem_returnflag_anova", // one-way ANOVA of extended price
      // across return flags: F statistic + eta² from ONE keyed
      // aggregation of per-group moment sums (Stats.anovaF) — does the
      // return outcome segment the price distribution at all? The
      // closed form keeps every stage a hash aggregate.
      (s, d) => graft.operators.Stats
        .anovaF(t(s, d, "lineitem"), "l_returnflag", "l_extendedprice")
        .select(col("k"), col("n"), round(col("f_stat"), 4).as("f_stat"),
          col("dof_between"), col("dof_within"),
          round(col("eta_sq"), 6).as("eta_sq")),
      Some("""WITH g AS (
             |  SELECT l_returnflag, COUNT(*) AS n,
             |    SUM(CAST(l_extendedprice AS DOUBLE)) AS s,
             |    SUM(CAST(l_extendedprice AS DOUBLE)
             |      * CAST(l_extendedprice AS DOUBLE)) AS q
             |  FROM lineitem GROUP BY l_returnflag),
             |a AS (
             |  SELECT COUNT(*) AS k, SUM(n) AS n, SUM(s) AS ts,
             |    SUM(q) AS tq, SUM(s * s / n) AS b
             |  FROM g)
             |SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
             |  ROUND(((b - ts * ts / n) / (k - 1))
             |    / ((tq - b) / (n - k)), 4) AS f_stat,
             |  CAST(k - 1 AS BIGINT) AS dof_between,
             |  CAST(n - k AS BIGINT) AS dof_within,
             |  ROUND((b - ts * ts / n) / (tq - ts * ts / n), 6) AS eta_sq
             |FROM a""".stripMargin)),

    Q("orders_interpurchase_by_segment", // inter-purchase gap profile
      // per market segment: days between a customer's consecutive
      // orders (per-customer LAG window, total order), rolled to the
      // 5-segment grain with mean and exact interpolated median/p90 —
      // the repeat-purchase cadence behind reorder forecasting. The
      // customer dim broadcasts onto the gap rows.
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy("o_orderdate", "o_orderkey")
        val seg = t(s, d, "customer")
          .select(col("c_custkey").as("o_custkey"),
            col("c_mktsegment").as("segment"))
        t(s, d, "orders")
          .withColumn("prev", lag("o_orderdate", 1).over(w))
          .filter(col("prev").isNotNull)
          .withColumn("gap",
            datediff(col("o_orderdate"), col("prev")).cast("double"))
          .join(broadcast(seg), "o_custkey")
          .groupBy("segment")
          .agg(count(lit(1)).as("n_gaps"),
            round(avg("gap"), 4).as("mean_days"),
            round(expr("percentile(gap, 0.5)"), 4).as("median_days"),
            round(expr("percentile(gap, 0.9)"), 4).as("p90_days"))
          .orderBy("segment")
      },
      Some("""WITH gaps AS (
             |  SELECT o_custkey,
             |    CAST(date_diff('day',
             |      lag(o_orderdate) OVER (PARTITION BY o_custkey
             |        ORDER BY o_orderdate, o_orderkey),
             |      o_orderdate) AS DOUBLE) AS gap
             |  FROM orders),
             |j AS (
             |  SELECT c_mktsegment AS segment, gap
             |  FROM gaps JOIN customer ON o_custkey = c_custkey
             |  WHERE gap IS NOT NULL)
             |SELECT segment, COUNT(*) AS n_gaps,
             |  ROUND(AVG(gap), 4) AS mean_days,
             |  ROUND(quantile_cont(gap, 0.5), 4) AS median_days,
             |  ROUND(quantile_cont(gap, 0.9), 4) AS p90_days
             |FROM j GROUP BY segment ORDER BY segment""".stripMargin)),

    Q("events_session_stats", // session-duration profile by ISO weekday
      // of the session start: n, mean and exact median/p90 duration,
      // mean events — the engagement summary over the SAME 30-min-gap
      // sessions events_sessionize emits. Sessions collapse to the
      // bounded 7-row weekday grain before the percentile escape runs.
      (s, d) => {
        val sess = graft.streaming.EventStream
          .sessionize(s, t(s, d, "events")).toDF()
          .withColumn("dur",
            (col("end_ms") - col("start_ms")).cast("double") / 1000)
          .withColumn("dow",
            weekday(to_date(timestamp_millis(col("start_ms")))) + 1)
        sess.groupBy("dow")
          .agg(count(lit(1)).as("n_sessions"),
            round(avg("dur"), 4).as("mean_dur_s"),
            round(expr("percentile(dur, 0.5)"), 4).as("median_dur_s"),
            round(expr("percentile(dur, 0.9)"), 4).as("p90_dur_s"),
            round(avg(col("n_events").cast("double")), 4).as("mean_events"))
          .orderBy("dow")
      },
      Some("""WITH g AS (
             |  SELECT user_id, event_id, ts,
             |    CASE WHEN lag(ts) OVER w IS NULL
             |         OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
             |         THEN 1 ELSE 0 END AS brk
             |  FROM events WINDOW w AS (PARTITION BY user_id
             |    ORDER BY ts, event_id)),
             |sess AS (
             |  SELECT user_id, ts,
             |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |  FROM g),
             |s2 AS (
             |  SELECT user_id, sid,
             |    epoch_ms(MIN(ts)) AS start_ms,
             |    (epoch_ms(MAX(ts)) - epoch_ms(MIN(ts))) / 1000.0 AS dur,
             |    COUNT(*) AS n_events
             |  FROM sess GROUP BY user_id, sid)
             |SELECT isodow(CAST(epoch_ms(start_ms) AS DATE)) AS dow,
             |  COUNT(*) AS n_sessions,
             |  ROUND(AVG(dur), 4) AS mean_dur_s,
             |  ROUND(quantile_cont(dur, 0.5), 4) AS median_dur_s,
             |  ROUND(quantile_cont(dur, 0.9), 4) AS p90_dur_s,
             |  ROUND(AVG(CAST(n_events AS DOUBLE)), 4) AS mean_events
             |FROM s2 GROUP BY dow ORDER BY dow""".stripMargin)),

    Q("nation_customer_gini", // demand-concentration map: per-nation
      // Gini of per-customer order revenue (Stats.giniByGroup — the
      // keyed-window closed form, ranks shuffled on the nation key,
      // never a global sort). Which national markets are whale-driven
      // and which are flat?
      (s, d) => {
        val rev = t(s, d, "orders").groupBy("o_custkey")
          .agg(sum(col("o_totalprice").cast("double")).as("rev"))
        val cust = t(s, d, "customer")
          .select(col("c_custkey").as("o_custkey"), col("c_nationkey"))
        graft.operators.Stats
          .giniByGroup(rev.join(cust, "o_custkey")
            .select(col("c_nationkey").as("nationkey"), col("rev")),
            "nationkey", "rev")
          .select(col("nationkey"), col("n").as("n_cust"),
            round(col("gini"), 6).as("gini"))
          .orderBy("nationkey")
      },
      Some("""WITH rev AS (
             |  SELECT o_custkey, SUM(CAST(o_totalprice AS DOUBLE)) AS rev
             |  FROM orders GROUP BY o_custkey),
             |j AS (
             |  SELECT c_nationkey AS nationkey, rev
             |  FROM rev JOIN customer ON o_custkey = c_custkey),
             |r AS (
             |  SELECT nationkey, rev, row_number() OVER (
             |    PARTITION BY nationkey ORDER BY rev) AS rk
             |  FROM j)
             |SELECT nationkey, COUNT(*) AS n_cust,
             |  ROUND(2.0 * SUM(rk * rev) / (COUNT(*) * SUM(rev))
             |    - (COUNT(*) + 1.0) / COUNT(*), 6) AS gini
             |FROM r GROUP BY nationkey ORDER BY nationkey""".stripMargin)),

    Q("orders_runs_test", // Wald–Wolfowitz runs test on the direction of
      // monthly revenue — is the up/down sequence random, trending, or
      // oscillating? Completes the trend-diagnostic family (OLS,
      // Theil–Sen, Kendall τ-b) with a pure randomness check. Revenue
      // rounds to cents at the bounded month grain before the signs.
      (s, d) => graft.operators.Stats
        .runsTest(
          t(s, d, "orders")
            .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
            .agg(round(sum("o_totalprice"), 2).as("rev")),
          "ym", "rev")
        .select(col("n_up"), col("n_down"), col("runs"),
          round(col("z"), 4).as("z")),
      Some("""WITH m AS (
             |  SELECT strftime(o_orderdate, '%Y-%m') AS ym,
             |    ROUND(SUM(o_totalprice), 2) AS rev
             |  FROM orders GROUP BY 1),
             |s AS (
             |  SELECT ym, sign(rev - lag(rev) OVER (ORDER BY ym)) AS sg
             |  FROM m QUALIFY sg IS NOT NULL AND sg <> 0),
             |r AS (
             |  SELECT
             |    CAST(SUM(CASE WHEN sg > 0 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_up,
             |    CAST(SUM(CASE WHEN sg < 0 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_down,
             |    CAST(SUM(CASE WHEN prev IS NULL OR sg <> prev
             |        THEN 1 ELSE 0 END) AS BIGINT) AS runs
             |  FROM (SELECT sg, lag(sg) OVER (ORDER BY ym) AS prev FROM s))
             |SELECT n_up, n_down, runs,
             |  ROUND((runs - (2.0 * n_up * n_down / (n_up + n_down) + 1))
             |    / sqrt((2.0 * n_up * n_down
             |        * (2.0 * n_up * n_down - n_up - n_down))
             |      / ((n_up + n_down) * (n_up + n_down)
             |        * (n_up + n_down - 1))), 4) AS z
             |FROM r""".stripMargin)),

    Q("events_poisson_dispersion", // Fano factor + dispersion statistic
      // of daily event counts per type: variance/mean of a Poisson
      // process is 1, so the index (and (n−1)·var/mean, ≈ χ²ₙ₋₁ under
      // the null) flags burstiness or over-regularity. Counts collapse
      // to the (type, day) grain; moments are one keyed aggregation of
      // exact integers.
      (s, d) => {
        val daily = t(s, d, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
        daily.groupBy("event_type")
          .agg(count(lit(1)).as("n_days"),
            round(avg("n"), 4).as("mean_daily"),
            round(var_samp(col("n").cast("double")), 4).as("var_daily"),
            round(var_samp(col("n").cast("double")) / avg("n"), 4)
              .as("fano"),
            round((count(lit(1)) - 1)
              * var_samp(col("n").cast("double")) / avg("n"), 4)
              .as("dispersion_chi2"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (
             |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
             |  FROM events GROUP BY 1, 2)
             |SELECT event_type, COUNT(*) AS n_days,
             |  ROUND(AVG(n), 4) AS mean_daily,
             |  ROUND(var_samp(CAST(n AS DOUBLE)), 4) AS var_daily,
             |  ROUND(var_samp(CAST(n AS DOUBLE)) / AVG(n), 4) AS fano,
             |  ROUND((COUNT(*) - 1) * var_samp(CAST(n AS DOUBLE))
             |    / AVG(n), 4) AS dispersion_chi2
             |FROM daily GROUP BY event_type ORDER BY event_type""".stripMargin)),

    Q("events_error_pchart", // attribute control chart (p-chart) for the
      // daily error-event share: each day's proportion against the
      // binomial 3σ limits around the overall rate — the categorical
      // companion to the value control chart. Day proportions are exact
      // integer ratios; the centerline rides a one-row broadcast.
      (s, d) => {
        val daily = t(s, d, "events")
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("event_type") === "error", 1L).otherwise(0L))
              .as("err"))
        val center = daily.agg(
          (sum("err").cast("double") / sum("n")).as("pbar"))
        daily.crossJoin(broadcast(center))
          .withColumn("p", col("err").cast("double") / col("n"))
          .withColumn("sigma",
            sqrt(col("pbar") * (lit(1.0) - col("pbar")) / col("n")))
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("n"), col("err"), round(col("p"), 6).as("p"),
            round(col("pbar") + lit(3.0) * col("sigma"), 6).as("ucl"),
            round(col("pbar") - lit(3.0) * col("sigma"), 6).as("lcl"),
            (col("p") > col("pbar") + lit(3.0) * col("sigma")
              || col("p") < col("pbar") - lit(3.0) * col("sigma"))
              .as("out_of_control"))
          .orderBy("day")
      },
      Some("""WITH daily AS (
             |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n,
             |    SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
             |      AS err
             |  FROM events GROUP BY 1),
             |c AS (SELECT CAST(SUM(err) AS DOUBLE) / SUM(n) AS pbar
             |      FROM daily)
             |SELECT CAST(day AS VARCHAR) AS day, n, CAST(err AS BIGINT)
             |    AS err,
             |  ROUND(CAST(err AS DOUBLE) / n, 6) AS p,
             |  ROUND(pbar + 3.0 * sqrt(pbar * (1.0 - pbar) / n), 6) AS ucl,
             |  ROUND(pbar - 3.0 * sqrt(pbar * (1.0 - pbar) / n), 6) AS lcl,
             |  (CAST(err AS DOUBLE) / n
             |      > pbar + 3.0 * sqrt(pbar * (1.0 - pbar) / n)
             |    OR CAST(err AS DOUBLE) / n
             |      < pbar - 3.0 * sqrt(pbar * (1.0 - pbar) / n))
             |    AS out_of_control
             |FROM daily, c ORDER BY day""".stripMargin)),

    Q("orders_priority_mix_chi2", // did the order-priority mix shift
      // between the first and second half of the order history? The
      // same Stats.chiSquare the weekday test uses, pointed at a second
      // domain — one categorical-drift gate, any pair of columns.
      (s, d) => graft.operators.Stats
        .chiSquare(t(s, d, "orders"),
          (year(col("o_orderdate")) <= 1995).cast("int"),
          col("o_orderpriority"))
        .select(round(col("chi2"), 6).as("chi2"), col("dof"), col("n")),
      Some("""WITH o AS (
             |  SELECT CASE WHEN year(o_orderdate) <= 1995 THEN 1 ELSE 0 END
             |      AS era,
             |    o_orderpriority, COUNT(*) AS o
             |  FROM orders GROUP BY 1, 2),
             |x AS (
             |  SELECT o,
             |    CAST(SUM(o) OVER (PARTITION BY era) AS DOUBLE) AS rt,
             |    CAST(SUM(o) OVER (PARTITION BY o_orderpriority) AS DOUBLE)
             |      AS ct,
             |    CAST(SUM(o) OVER () AS DOUBLE) AS n,
             |    era, o_orderpriority
             |  FROM o)
             |SELECT ROUND(SUM((o - rt * ct / n) * (o - rt * ct / n)
             |    / (rt * ct / n)), 6) AS chi2,
             |  CAST((COUNT(DISTINCT era) - 1)
             |    * (COUNT(DISTINCT o_orderpriority) - 1) AS BIGINT) AS dof,
             |  CAST(MAX(n) AS BIGINT) AS n
             |FROM x""".stripMargin)),

    Q("doc_source_length_anova", // does document length segment by
      // source? Stats.anovaF on a third domain (text corpus) — the
      // sanity gate before treating per-source length stats as
      // interchangeable.
      (s, d) => graft.operators.Stats
        .anovaF(t(s, d, "documents"), "source", "n_chars")
        .select(col("k"), col("n"), round(col("f_stat"), 4).as("f_stat"),
          col("dof_between"), col("dof_within"),
          round(col("eta_sq"), 6).as("eta_sq")),
      Some("""WITH g AS (
             |  SELECT source, COUNT(*) AS n,
             |    SUM(CAST(n_chars AS DOUBLE)) AS s,
             |    SUM(CAST(n_chars AS DOUBLE) * CAST(n_chars AS DOUBLE)) AS q
             |  FROM documents GROUP BY source),
             |a AS (
             |  SELECT COUNT(*) AS k, SUM(n) AS n, SUM(s) AS ts,
             |    SUM(q) AS tq, SUM(s * s / n) AS b
             |  FROM g)
             |SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
             |  ROUND(((b - ts * ts / n) / (k - 1))
             |    / ((tq - b) / (n - k)), 4) AS f_stat,
             |  CAST(k - 1 AS BIGINT) AS dof_between,
             |  CAST(n - k AS BIGINT) AS dof_within,
             |  ROUND((b - ts * ts / n) / (tq - ts * ts / n), 6) AS eta_sq
             |FROM a""".stripMargin)),

    Q("events_forecast_backtest", // backtest of the seasonal-naive
      // forecaster (events_seasonal_naive's model: tomorrow = same
      // weekday last week) over the daily series: MAE, RMSE, MAPE and
      // sMAPE — the evaluation half a forecasting pipeline needs
      // before trusting any forecast. LAG(7) over the bounded
      // ~30-row day grain; every error term is an exact integer ratio.
      (s, d) => {
        val daily = t(s, d, "events")
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
        val w = Window.orderBy("day")
        val nD = col("n").cast("double")
        val fD = col("fc").cast("double")
        daily.withColumn("fc", lag("n", 7).over(w))
          .filter(col("fc").isNotNull)
          .agg(count(lit(1)).as("n_days"),
            round(avg(abs(nD - fD)), 4).as("mae"),
            round(sqrt(avg(pow(nD - fD, 2))), 4).as("rmse"),
            round(avg(abs(nD - fD) / nD) * 100, 4).as("mape_pct"),
            round(avg(abs(nD - fD) / ((nD + fD) / 2)) * 100, 4)
              .as("smape_pct"))
      },
      Some("""WITH daily AS (
             |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
             |  FROM events GROUP BY 1),
             |f AS (
             |  SELECT CAST(n AS DOUBLE) AS n,
             |    CAST(lag(n, 7) OVER (ORDER BY day) AS DOUBLE) AS fc
             |  FROM daily QUALIFY fc IS NOT NULL)
             |SELECT COUNT(*) AS n_days,
             |  ROUND(AVG(ABS(n - fc)), 4) AS mae,
             |  ROUND(sqrt(AVG((n - fc) * (n - fc))), 4) AS rmse,
             |  ROUND(AVG(ABS(n - fc) / n) * 100, 4) AS mape_pct,
             |  ROUND(AVG(ABS(n - fc) / ((n + fc) / 2)) * 100, 4)
             |    AS smape_pct
             |FROM f""".stripMargin)),

    Q("lineitem_qty_uniformity_chi2", // chi-square GOODNESS-OF-FIT of
      // order quantities against the uniform 1..50 the TPC-H generator
      // promises — the distribution-conformance gate (the independence
      // tests above answer a different question). Observed counts
      // collapse to the 50-cell grain; expected is pure arithmetic on
      // the total, so the statistic is one bounded aggregation.
      (s, d) => {
        // floor() before the int cast: Spark's decimal→int cast
        // truncates while DuckDB's rounds half-away — TPC-H quantities
        // are integral so both agreed, but floor on BOTH sides keeps the
        // bucket rule portable to non-integral inputs
        val o = t(s, d, "lineitem")
          .groupBy(floor(col("l_quantity")).cast("int").as("qty"))
          .agg(count(lit(1)).as("o"))
        o.withColumn("n", sum("o").over(Window.partitionBy()))
          .withColumn("e", col("n").cast("double") / 50)
          .agg(max("n").as("n"),
            count(lit(1)).as("cells"),
            round(sum(pow(col("o") - col("e"), 2) / col("e")), 6)
              .as("chi2"),
            (count(lit(1)) - 1).as("dof"))
      },
      Some("""WITH o AS (
             |  SELECT CAST(FLOOR(l_quantity) AS INT) AS qty, COUNT(*) AS o
             |  FROM lineitem GROUP BY 1),
             |x AS (
             |  SELECT o, SUM(o) OVER () AS n,
             |    CAST(SUM(o) OVER () AS DOUBLE) / 50 AS e
             |  FROM o)
             |SELECT CAST(MAX(n) AS BIGINT) AS n,
             |  COUNT(*) AS cells,
             |  ROUND(SUM((o - e) * (o - e) / e), 6) AS chi2,
             |  CAST(COUNT(*) - 1 AS BIGINT) AS dof
             |FROM x""".stripMargin)),

    Q("emb_pca_second_component", // second principal direction by
      // DEFLATION: rerun the power iteration with a per-round
      // Gram–Schmidt projection against the top component (the
      // d-vector arithmetic happens on the driver; the corpus passes
      // stay the same two distributed matvecs per round). Chaining
      // deflations yields a top-k basis with the covariance never
      // materialized — the scale path to whitening. The projection
      // coefficient rounds like every iterate, so the oracle replays
      // the identical arithmetic; the deflation is sign-invariant in
      // the first component.
      (s, d) => {
        val e = t(s, d, "embeddings")
        val v1 = Similarity.powerIteration(e, "embedding", dim = 64,
          iters = 3, scale = 6)
        val v2 = Similarity.powerIterationDeflated(e, "embedding", dim = 64,
          iters = 3, scale = 6, v1 = v1)
        import s.implicits._
        v2.toSeq.zipWithIndex.map { case (x, i) => (i + 1, x) }
          .toDF("dim", "loading2")
      },
      Some {
        // every multi-consumer stage is MATERIALIZED and the 1-row
        // scalars cross-join in — without this DuckDB re-inlines the
        // whole upstream chain per reference and the nested chains go
        // combinatorial (measured: >2 min plain, 0.5 s materialized)
        def itr(prev: String, k: Int): String =
          s"""s$k AS MATERIALIZED (
             |  SELECT vec_id, ROUND(SUM(x * $prev.val), 6) AS s
             |  FROM e JOIN $prev USING (dim) GROUP BY vec_id),
             |u$k AS MATERIALIZED (SELECT dim, SUM(e.x * s$k.s) AS u
             |  FROM e JOIN s$k USING (vec_id) GROUP BY dim),
             |n$k AS (SELECT SQRT(SUM(u * u)) AS nrm FROM u$k),
             |v$k AS MATERIALIZED (SELECT dim, ROUND(u / nrm, 6) AS val
             |  FROM u$k, n$k)""".stripMargin
        def ditr(prev: String, k: Int): String =
          s"""t$k AS MATERIALIZED (
             |  SELECT vec_id, ROUND(SUM(x * $prev.val), 6) AS s
             |  FROM e JOIN $prev USING (dim) GROUP BY vec_id),
             |y$k AS MATERIALIZED (SELECT dim, SUM(e.x * t$k.s) AS u
             |  FROM e JOIN t$k USING (vec_id) GROUP BY dim),
             |c$k AS (SELECT ROUND(SUM(y$k.u * v3.val), 6) AS dt
             |  FROM y$k JOIN v3 USING (dim)),
             |o$k AS MATERIALIZED (SELECT y$k.dim,
             |    y$k.u - c$k.dt * v3.val AS u
             |  FROM y$k JOIN v3 USING (dim), c$k),
             |m$k AS (SELECT SQRT(SUM(u * u)) AS nrm FROM o$k),
             |w$k AS MATERIALIZED (SELECT dim, ROUND(u / nrm, 6) AS val
             |  FROM o$k, m$k)""".stripMargin
        s"""WITH e AS MATERIALIZED (
           |  SELECT vec_id, CAST(i AS INT) AS dim,
           |    ROUND(CAST(embedding[i] AS DOUBLE), 6) AS x
           |  FROM embeddings, range(1, 65) t(i)),
           |v0 AS (SELECT CAST(dim AS INT) AS dim, CAST(0.125 AS DOUBLE) AS val
           |  FROM range(1, 65) t(dim)),
           |${itr("v0", 1)},
           |${itr("v1", 2)},
           |${itr("v2", 3)},
           |${ditr("v0", 1)},
           |${ditr("w1", 2)},
           |${ditr("w2", 3)},
           |sg AS (SELECT CASE WHEN (SELECT val FROM w3
           |    ORDER BY ABS(val) DESC, dim LIMIT 1) < 0
           |  THEN -1.0 ELSE 1.0 END AS s)
           |SELECT dim, ROUND(val * (SELECT s FROM sg), 6) + 0.0 AS loading2
           |FROM w3 ORDER BY dim""".stripMargin
      }),

    Q("events_user_lifecycle", // user-lifecycle profile: activity ratio
      // (active days over calendar lifespan) per user, summarized with
      // mean and exact p50/p90. The percentiles come from the SAME
      // distributed range-sort machinery as the lineitem order
      // statistics (Scale.rankValues) — at billions of users an
      // ungrouped percentile() would funnel the user table through one
      // buffer; this shape never does.
      (s, d) => {
        val u = t(s, d, "events").groupBy("user_id")
          .agg(countDistinct(to_date(col("ts"))).as("active_days"),
            (datediff(max(to_date(col("ts"))), min(to_date(col("ts"))))
              + 1).as("lifespan"))
          .withColumn("ratio",
            col("active_days").cast("double") / col("lifespan"))
        val ranked = Scale.rankValues(u, "ratio", Seq("user_id"))
        val qs = try ranked.quantiles(Seq(0.5, 0.9))
          finally ranked.unpersist()
        def r6(x: Double) = BigDecimal(x)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        u.agg(count(lit(1)).as("n_users"),
            round(avg("ratio"), 6).as("mean_ratio"),
            round(avg("active_days"), 4).as("mean_active_days"))
          .withColumn("p50_ratio", lit(r6(qs(0))))
          .withColumn("p90_ratio", lit(r6(qs(1))))
      },
      Some("""WITH u AS (
             |  SELECT user_id,
             |    COUNT(DISTINCT CAST(ts AS DATE)) AS active_days,
             |    date_diff('day', MIN(CAST(ts AS DATE)),
             |      MAX(CAST(ts AS DATE))) + 1 AS lifespan
             |  FROM events GROUP BY user_id),
             |r AS (SELECT active_days,
             |        CAST(active_days AS DOUBLE) / lifespan AS ratio
             |      FROM u)
             |SELECT COUNT(*) AS n_users,
             |  ROUND(AVG(ratio), 6) AS mean_ratio,
             |  ROUND(AVG(active_days), 4) AS mean_active_days,
             |  ROUND(quantile_cont(ratio, 0.5), 6) AS p50_ratio,
             |  ROUND(quantile_cont(ratio, 0.9), 6) AS p90_ratio
             |FROM r""".stripMargin)))

  // §2.11 — documents: text analysis + dedup family.
  /** Shared oracle scaffolding for the BPE pair (train + encode): a
    * 3-round recursive-CTE replay of the greedy merge rewrite. Each
    * round r defines p$r (the argmax pair), m$r (the recursive
    * leftmost-merge rewrite) and c$r (the converged corpus after the
    * round); c0 is the raw tokenized corpus, c3 the fully encoded one.
    * Pairs order as a\x01b strings — \x01 sorts below every token char,
    * so concat order equals tuple order.
    */
  private lazy val bpeOracleWith: String = {
    def pairsOf(ts: String): String =
      s"list_transform(range(1, greatest(len($ts), 1)), i -> $ts[i] || chr(1) || $ts[i+1])"
    def round(r: Int, src: String): String =
      s"""p$r AS (
         |  SELECT u.p AS pr, COUNT(*) AS n FROM $src, unnest(${pairsOf("ts")}) AS u(p)
         |  GROUP BY u.p ORDER BY n DESC, u.p LIMIT 1),
         |m$r AS (
         |  SELECT id, ts FROM $src
         |  UNION
         |  SELECT id, list_concat(list_concat(ts[1:lp-1],
         |      [replace((SELECT pr FROM p$r), chr(1), '_')]), ts[lp+2:]) AS ts
         |  FROM (SELECT id, ts,
         |          list_position(${pairsOf("ts")}, (SELECT pr FROM p$r)) AS lp
         |        FROM m$r)
         |  WHERE lp IS NOT NULL AND lp > 0
         |),
         |c$r AS (SELECT id, ts FROM m$r
         |  WHERE COALESCE(list_position(${pairsOf("ts")}, (SELECT pr FROM p$r)), 0) = 0)""".stripMargin
    s"""WITH RECURSIVE c0 AS (
       |  SELECT doc_id AS id, string_split_regex(lower(trim(text)), '\\s+') AS ts
       |  FROM documents
       |),
       |${round(1, "c0")},
       |${round(2, "c1")},
       |${round(3, "c2")}""".stripMargin
  }

  private def docQueries: Seq[Q] = Seq(
    Q("doc_token_stats",
      (s, d) => t(s, d, "documents").select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        TextAnalysis.bpeTokenCount(col("text")).as("n_bpe_tokens"),
        length(col("text")).as("n_chars_computed"))
        .orderBy("doc_id"),
      // NB: DuckDB string literals do no backslash processing — the regex
      // must carry single backslashes, exactly as Scala's literal value.
      Some(s"""SELECT doc_id,
              |len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
              |len(regexp_extract_all(text, '${TextAnalysis.bpeIshPattern}')) AS n_bpe_tokens,
              |CAST(length(text) AS INT) AS n_chars_computed
              |FROM documents ORDER BY doc_id""".stripMargin)),

    Q("doc_lang_histogram",
      (s, d) => t(s, d, "documents").groupBy("lang")
        .agg(count(lit(1)).as("n"), round(avg("n_chars"), 2).as("avg_chars"))
        .orderBy("lang"),
      Some("""SELECT lang, COUNT(*) AS n, ROUND(AVG(n_chars), 2) AS avg_chars
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    Q("doc_quality", // C4/Gopher-style quality components; each feature is
      // computed once in a lower projection and the score derived from the
      // feature columns (CollapseProject keeps non-cheap multi-use aliases
      // in their own layer, so nothing is re-evaluated)
      (s, d) => t(s, d, "documents")
        .select(
          col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_tok"),
          TextAnalysis.punctRatio(col("text")).as("pr"),
          TextAnalysis.stopwordRatio(col("text")).as("sr"),
          TextAnalysis.meanTokenLen(col("text")).as("mtl"))
        .select(
          col("doc_id"),
          round(col("pr"), 4).as("punct_ratio"),
          round(col("sr"), 4).as("stopword_ratio"),
          round(col("mtl"), 4).as("mean_token_len"),
          TextAnalysis.qualityFrom(col("n_tok"), col("pr"), col("sr"),
            col("mtl")).as("quality"))
        .orderBy("doc_id"),
      Some("""WITH f AS (
             |  SELECT doc_id, text,
             |    string_split_regex(lower(trim(text)), '\s+') AS toks,
             |    len(string_split_regex(trim(text), '\s+')) AS n
             |  FROM documents
             |), m AS (
             |  SELECT doc_id, n,
             |    CASE WHEN length(text) = 0 THEN 0.0
             |      ELSE CAST(length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g')) AS DOUBLE) / length(text) END AS pr,
             |    CASE WHEN n = 0 THEN 0.0
             |      ELSE CAST(len(list_filter(toks, t -> list_contains(['the','a','of','and','to','in','is','it','that','for'], t))) AS DOUBLE) / n END AS sr,
             |    CASE WHEN n = 0 THEN 0.0
             |      ELSE CAST(list_aggregate(list_transform(string_split_regex(trim(text), '\s+'), t -> length(t)), 'sum') AS DOUBLE) / n END AS mtl
             |  FROM f
             |)
             |SELECT doc_id, ROUND(pr, 4) AS punct_ratio, ROUND(sr, 4) AS stopword_ratio,
             |  ROUND(mtl, 4) AS mean_token_len,
             |  ROUND(((CASE WHEN n BETWEEN 5 AND 10000 THEN 1.0 ELSE 0.0 END)
             |    + (CASE WHEN pr < 0.2 THEN 1.0 ELSE 0.0 END)
             |    + (CASE WHEN sr > 0.01 THEN 1.0 ELSE 0.0 END)
             |    + (CASE WHEN mtl BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END)) / 4.0, 2) AS quality
             |FROM m ORDER BY doc_id""".stripMargin)),

    Q("doc_readability", // Flesch reading-ease per document with the
      // standard regex surrogates (letter-runs = words, [.!?]-runs =
      // sentence breaks, vowel-group runs = syllables — Kincaid et al.
      // 1975 applied corpus-side). Map-only codegen'd scan, no shuffle;
      // counts are integers so the score is bit-deterministic. The
      // fixture corpus is punctuation-free, which the sentence floor
      // (>= 1) absorbs — on real corpora the same plan applies.
      (s, d) => {
        val words = size(regexp_extract_all(col("text"),
          lit("[A-Za-z]+"), lit(0))).cast("long")
        val sents = greatest(size(regexp_extract_all(col("text"),
          lit("[.!?]+"), lit(0))).cast("long"), lit(1L))
        val sylls = size(regexp_extract_all(lower(col("text")),
          lit("[aeiouy]+"), lit(0))).cast("long")
        t(s, d, "documents")
          .select(col("doc_id"), words.as("n_words"), sents.as("n_sentences"),
            sylls.as("n_syllables"))
          .filter(col("n_words") > 0)
          .withColumn("flesch", round(lit(206.835)
            - lit(1.015) * col("n_words").cast("double") / col("n_sentences")
            - lit(84.6) * col("n_syllables").cast("double") / col("n_words"), 2))
          .orderBy("doc_id")
      },
      Some("""WITH f AS (
             |  SELECT doc_id,
             |    len(regexp_extract_all(text, '[A-Za-z]+')) AS n_words,
             |    GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1)
             |      AS n_sentences,
             |    len(regexp_extract_all(lower(text), '[aeiouy]+'))
             |      AS n_syllables
             |  FROM documents)
             |SELECT doc_id, n_words, n_sentences, n_syllables,
             |  ROUND(206.835 - 1.015 * CAST(n_words AS DOUBLE) / n_sentences
             |    - 84.6 * CAST(n_syllables AS DOUBLE) / n_words, 2) AS flesch
             |FROM f WHERE n_words > 0 ORDER BY doc_id""".stripMargin)),

    Q("doc_curriculum_order", // curriculum schedule: easy (high-quality)
      // documents first, order WITHIN a quality band shuffled by a
      // deterministic md5 of the doc id so no source runs in bursts.
      // The schedule head is a top-k (TakeOrderedAndProject), not a
      // global sort; position numbering is a window over the k winners.
      (s, d) => {
        val q = t(s, d, "documents")
          .select(
            col("doc_id"),
            TextAnalysis.tokenCount(col("text")).as("n_tok"),
            TextAnalysis.punctRatio(col("text")).as("pr"),
            TextAnalysis.stopwordRatio(col("text")).as("sr"),
            TextAnalysis.meanTokenLen(col("text")).as("mtl"))
          .select(col("doc_id"),
            TextAnalysis.qualityFrom(col("n_tok"), col("pr"), col("sr"),
              col("mtl")).as("quality"),
            md5(concat(lit("cur:"), col("doc_id"))).as("h"))
        val ord = Seq(col("quality").desc, col("h").asc, col("doc_id").asc)
        q.orderBy(ord: _*).limit(50)
          .select(
            row_number().over(Window.orderBy(ord: _*)).as("pos"),
            col("doc_id"), col("quality"))
      },
      Some("""WITH f AS (
             |  SELECT doc_id, text,
             |    string_split_regex(lower(trim(text)), '\s+') AS toks,
             |    len(string_split_regex(trim(text), '\s+')) AS n
             |  FROM documents
             |), m AS (
             |  SELECT doc_id, n,
             |    CASE WHEN length(text) = 0 THEN 0.0
             |      ELSE CAST(length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g')) AS DOUBLE) / length(text) END AS pr,
             |    CASE WHEN n = 0 THEN 0.0
             |      ELSE CAST(len(list_filter(toks, t -> list_contains(['the','a','of','and','to','in','is','it','that','for'], t))) AS DOUBLE) / n END AS sr,
             |    CASE WHEN n = 0 THEN 0.0
             |      ELSE CAST(list_aggregate(list_transform(string_split_regex(trim(text), '\s+'), t -> length(t)), 'sum') AS DOUBLE) / n END AS mtl
             |  FROM f
             |), s AS (
             |  SELECT doc_id,
             |    ROUND(((CASE WHEN n BETWEEN 5 AND 10000 THEN 1.0 ELSE 0.0 END)
             |      + (CASE WHEN pr < 0.2 THEN 1.0 ELSE 0.0 END)
             |      + (CASE WHEN sr > 0.01 THEN 1.0 ELSE 0.0 END)
             |      + (CASE WHEN mtl BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END)) / 4.0, 2) AS quality,
             |    md5('cur:' || CAST(doc_id AS VARCHAR)) AS h
             |  FROM m
             |)
             |SELECT ROW_NUMBER() OVER (ORDER BY quality DESC, h, doc_id) AS pos,
             |  doc_id, quality
             |FROM s ORDER BY quality DESC, h, doc_id LIMIT 50""".stripMargin)),

    Q("doc_admission_report", // the CAPSTONE intake query: every
      // per-document admission gate — exact-dup keep-one, language
      // consistency, quality floor — in ONE plan, one scan, one shuffle
      // (Cleanse.admissionReport). The oracle composes the same gates
      // from the already-proven quality and language-ID CTEs.
      (s, d) => graft.operators.Cleanse.admissionReport(t(s, d, "documents"))
        .orderBy("doc_id"),
      Some("""WITH f AS (
             |  SELECT doc_id, lang, text,
             |    string_split_regex(lower(trim(text)), '\s+') AS toks,
             |    len(string_split_regex(trim(text), '\s+')) AS n,
             |    row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
             |  FROM documents
             |), m AS (
             |  SELECT doc_id, lang, text, toks, n, rn,
             |    CASE WHEN length(text) = 0 THEN 0.0
             |      ELSE CAST(length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g')) AS DOUBLE) / length(text) END AS pr,
             |    CASE WHEN n = 0 THEN 0.0
             |      ELSE CAST(len(list_filter(toks, t -> list_contains(['the','a','of','and','to','in','is','it','that','for'], t))) AS DOUBLE) / n END AS sr,
             |    CASE WHEN n = 0 THEN 0.0
             |      ELSE CAST(list_aggregate(list_transform(string_split_regex(trim(text), '\s+'), t -> length(t)), 'sum') AS DOUBLE) / n END AS mtl
             |  FROM f
             |), g AS (
             |  SELECT doc_id, lang, rn,
             |    ROUND(((CASE WHEN n BETWEEN 5 AND 10000 THEN 1.0 ELSE 0.0 END)
             |      + (CASE WHEN pr < 0.2 THEN 1.0 ELSE 0.0 END)
             |      + (CASE WHEN sr > 0.01 THEN 1.0 ELSE 0.0 END)
             |      + (CASE WHEN mtl BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END)) / 4.0, 2) AS quality,
             |    CASE WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
             |         WHEN greatest(
             |             len(list_filter(toks, t -> list_contains(['the','a','of','and','to','in','is','it','that','for'], t))),
             |             len(list_filter(toks, t -> list_contains(['le','la','les','de','et','un','une','est','que','pour'], t))),
             |             len(list_filter(toks, t -> list_contains(['el','la','los','de','y','un','una','es','que','por'], t))),
             |             len(list_filter(toks, t -> list_contains(['der','die','das','und','ein','eine','ist','zu','den','für'], t)))) >= 1 THEN
             |           CASE WHEN len(list_filter(toks, t -> list_contains(['the','a','of','and','to','in','is','it','that','for'], t))) >= len(list_filter(toks, t -> list_contains(['le','la','les','de','et','un','une','est','que','pour'], t)))
             |                 AND len(list_filter(toks, t -> list_contains(['the','a','of','and','to','in','is','it','that','for'], t))) >= len(list_filter(toks, t -> list_contains(['el','la','los','de','y','un','una','es','que','por'], t)))
             |                 AND len(list_filter(toks, t -> list_contains(['the','a','of','and','to','in','is','it','that','for'], t))) >= len(list_filter(toks, t -> list_contains(['der','die','das','und','ein','eine','ist','zu','den','für'], t))) THEN 'en'
             |                WHEN len(list_filter(toks, t -> list_contains(['le','la','les','de','et','un','une','est','que','pour'], t))) >= len(list_filter(toks, t -> list_contains(['el','la','los','de','y','un','una','es','que','por'], t)))
             |                 AND len(list_filter(toks, t -> list_contains(['le','la','les','de','et','un','une','est','que','pour'], t))) >= len(list_filter(toks, t -> list_contains(['der','die','das','und','ein','eine','ist','zu','den','für'], t))) THEN 'fr'
             |                WHEN len(list_filter(toks, t -> list_contains(['el','la','los','de','y','un','una','es','que','por'], t))) >= len(list_filter(toks, t -> list_contains(['der','die','das','und','ein','eine','ist','zu','den','für'], t))) THEN 'es'
             |                ELSE 'de' END
             |         ELSE 'und' END AS pred
             |  FROM m
             |)
             |SELECT doc_id,
             |  CASE WHEN rn > 1 THEN 'duplicate'
             |       WHEN pred <> lang THEN 'language'
             |       WHEN quality < 0.75 THEN 'quality'
             |       ELSE 'admitted' END AS verdict,
             |  quality
             |FROM g ORDER BY doc_id""".stripMargin)),

    Q("doc_exact_dup_groups", // §2.11 dedup: exact, hash-groupBy
      (s, d) => Dedup.exactDupGroups(t(s, d, "documents"))
        .select(col("keep_id"), col("n_dups"))
        .orderBy("keep_id"),
      Some("""SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_dups FROM documents
             |GROUP BY text HAVING COUNT(*) > 1 ORDER BY keep_id""".stripMargin)),

    Q("doc_dedup_counts", // exact vs fingerprint dedup cardinalities
      (s, d) => {
        val docs = t(s, d, "documents")
        docs.agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("text")).as("n_unique_exact"),
          countDistinct(TextAnalysis.sortedTokenFingerprint(col("text"))).as("n_unique_bags"))
      },
      Some("""SELECT COUNT(*) AS n_docs, COUNT(DISTINCT text) AS n_unique_exact,
             |COUNT(DISTINCT md5(array_to_string(list_sort(string_split_regex(lower(trim(text)), '\s+')), ' '))) AS n_unique_bags
             |FROM documents""".stripMargin)),

    Q("doc_ngram_jaccard", // §2.11 dedup: n-gram Jaccard, blocked by source
      (s, d) => Dedup.ngramJaccardOf(shinglePairIndex(s, d), threshold = 0.2)
        .orderBy("id_a", "id_b"),
      Some("""WITH d AS (
             |  SELECT source, doc_id,
             |    list_distinct(list_transform(
             |      range(0, greatest(len(t) - 2, 1)),
             |      i -> array_to_string(t[(i+1):(i+3)], ' '))) AS sh
             |  FROM (SELECT source, doc_id,
             |          string_split_regex(lower(trim(text)), '\s+') AS t
             |        FROM documents)
             |)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |  ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             |    / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
             |FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
             |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             |    / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.2
             |ORDER BY id_a, id_b""".stripMargin)),

    Q("doc_pmi_pairs", // pointwise mutual information of term pairs
      // co-occurring in a document — collocation mining for tokenizer /
      // phrase-vocab curation. The pair space is bounded BEFORE any
      // join: only the corpus top-50 vocabulary (a broadcast) pairs up,
      // so a document contributes at most C(50,2) candidates and the
      // self-join key is doc_id, never term×term across documents.
      // PMI = ln(cooc·N / (df_a·df_b)) — all integers into one ln.
      (s, d) => {
        val docs = t(s, d, "documents")
        val toks = docs.select(col("doc_id"),
          explode(TextAnalysis.tokens(lower(col("text")))).as("term"))
        val vocab = toks.groupBy("term").agg(count(lit(1)).as("tf"))
          .orderBy(col("tf").desc, col("term")).limit(50)
          .select("term")
        val inVocab = toks.join(broadcast(vocab), Seq("term")).distinct()
        val nDocs = docs.agg(countDistinct("doc_id").as("n_docs"))
        val df = inVocab.groupBy("term")
          .agg(count(lit(1)).as("df"))
        val cooc = inVocab.as("a")
          .join(inVocab.as("b"), col("a.doc_id") === col("b.doc_id")
            && col("a.term") < col("b.term"))
          .groupBy(col("a.term").as("t_a"), col("b.term").as("t_b"))
          .agg(count(lit(1)).as("cooc"))
          .filter(col("cooc") >= 5)
        cooc
          .join(broadcast(df.select(col("term").as("t_a"),
            col("df").as("df_a"))), Seq("t_a"))
          .join(broadcast(df.select(col("term").as("t_b"),
            col("df").as("df_b"))), Seq("t_b"))
          .crossJoin(broadcast(nDocs))
          .select(col("t_a"), col("t_b"), col("cooc"),
            round(log(col("cooc").cast("double") * col("n_docs")
              / (col("df_a") * col("df_b"))), 6).as("pmi"))
          .orderBy(col("pmi").desc, col("t_a"), col("t_b")).limit(30)
      },
      Some("""WITH tok AS (
             |  SELECT DISTINCT doc_id,
             |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
             |  FROM documents),
             |alltok AS (
             |  SELECT doc_id,
             |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
             |  FROM documents),
             |vocab AS (
             |  SELECT term FROM alltok GROUP BY term
             |  ORDER BY COUNT(*) DESC, term LIMIT 50),
             |iv AS (SELECT DISTINCT doc_id, term FROM tok
             |  WHERE term IN (SELECT term FROM vocab)),
             |n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
             |df AS (SELECT term, COUNT(*) AS df FROM iv GROUP BY 1),
             |cooc AS (
             |  SELECT a.term AS t_a, b.term AS t_b, COUNT(*) AS cooc
             |  FROM iv a JOIN iv b
             |    ON a.doc_id = b.doc_id AND a.term < b.term
             |  GROUP BY 1, 2 HAVING COUNT(*) >= 5)
             |SELECT t_a, t_b, cooc,
             |  ROUND(LN(CAST(cooc AS DOUBLE) * n_docs / (da.df * db.df)), 6)
             |    AS pmi
             |FROM cooc, n
             |JOIN df da ON da.term = t_a
             |JOIN df db ON db.term = t_b
             |ORDER BY pmi DESC, t_a, t_b LIMIT 30""".stripMargin)),

    Q("doc_winnow_pairs", // §2.11 dedup: winnowing fingerprints (k-gram
      // hashes, window-min selection) — partial-overlap pairs, via the
      // PORTABLE md5 formulation so the full fingerprint pipeline is
      // reproduced in the oracle (the xxhash64 native-expression twin is
      // pinned by TextExpressionsSpec's independent reference impl).
      // Blocked by lang (not source): the corpus's exact dups land in
      // different sources, and language is the natural partition for a
      // text-overlap pass.
      (s, d) => Dedup.winnowOverlapPairsPortable(t(s, d, "documents"), "lang")
        .orderBy("id_a", "id_b"),
      Some("""WITH d AS (
             |  SELECT lang AS blk, doc_id AS id,
             |    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
             |  FROM documents
             |), kg AS (
             |  SELECT blk, id,
             |    list_transform(range(0, greatest(len(t) - 3, 1)),
             |      i -> md5(array_to_string(t[(i+1):(i+4)], ' '))) AS g
             |  FROM d WHERE len(t) > 0
             |), f AS (
             |  SELECT blk, id, unnest(list_distinct(list_transform(
             |    range(0, greatest(len(g) - 3, 1)), j -> list_min(g[(j+1):(j+4)])))) AS fp
             |  FROM kg
             |)
             |SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS shared
             |FROM f a JOIN f b ON a.blk = b.blk AND a.fp = b.fp AND a.id < b.id
             |GROUP BY 1, 2 HAVING COUNT(*) >= 2
             |ORDER BY id_a, id_b""".stripMargin)),

    Q("doc_minhash_neardups", // §2.11 dedup: banded MinHash LSH via the
      // PORTABLE signature (md5 shingle hash + affine lane family,
      // plain-string band keys) — the complete pipeline is reproduced in
      // the oracle; the xxhash64 native path stays pinned by its
      // bit-identical HOF differential.
      (s, d) => Dedup.minhashNearDupsPortableOf(minhashSigs(s, d), threshold = 0.2)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("id_a", "id_b"),
      Some("""WITH d AS (
             |  SELECT doc_id AS id, string_split_regex(lower(trim(text)), '\s+') AS t
             |  FROM documents
             |), s AS (
             |  SELECT id, list_distinct(list_transform(
             |    range(0, greatest(len(t) - 2, 1)),
             |    i -> array_to_string(t[(i+1):(i+3)], ' '))) AS sh
             |  FROM d
             |), hm AS (
             |  SELECT id, sh, list_transform(sh,
             |    x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % 2147483647) AS hs
             |  FROM s
             |), sig AS (
             |  SELECT id, list_transform(range(0, 64), j -> list_min(
             |    list_transform(hs, h -> ((j*2+1) * h + j*12347 + 1) % 2147483647))) AS g
             |  FROM hm
             |), banded AS (
             |  SELECT id, b.b AS band,
             |    array_to_string(g[(b.b*4+1):(b.b*4+4)], ',') AS bucket
             |  FROM sig, range(0, 16) AS b(b)
             |), cand AS (
             |  SELECT DISTINCT a.id AS id_a, c.id AS id_b
             |  FROM banded a JOIN banded c
             |    ON a.band = c.band AND a.bucket = c.bucket AND a.id < c.id
             |)
             |SELECT id_a, id_b,
             |  ROUND(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
             |    / len(list_distinct(list_concat(x.sh, y.sh))), 6) AS jaccard
             |FROM cand JOIN s x ON cand.id_a = x.id JOIN s y ON cand.id_b = y.id
             |WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
             |    / len(list_distinct(list_concat(x.sh, y.sh))) >= 0.2
             |ORDER BY id_a, id_b""".stripMargin)),

    Q("doc_simhash_neardups", // §2.11 dedup: simhash chunk-blocked pairs
      // via the PORTABLE md5 signature, so the whole pipeline — token
      // hashes, majority vote, 15-bit chunk candidates, Hamming verify —
      // is reproduced in the oracle; the xxhash64 native twin stays
      // pinned by TextExpressionsSpec's differential.
      (s, d) => Dedup.simhashNearDupsPortable(t(s, d, "documents"), maxDist = 8)
        .orderBy("id_a", "id_b"),
      Some("""WITH d AS (
             |  SELECT doc_id AS id,
             |    list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS t
             |  FROM documents
             |), tokh AS (
             |  SELECT id, ('0x' || substr(md5(t.x), 1, 15))::BIGINT AS h
             |  FROM d, unnest(d.t) AS t(x) WHERE len(d.t) > 0
             |), votes AS (
             |  SELECT id, b.b,
             |    SUM(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
             |  FROM tokh, range(0, 60) AS b(b) GROUP BY id, b.b
             |), sig AS (
             |  SELECT id, SUM(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END) AS sig
             |  FROM votes GROUP BY id
             |), ch AS (
             |  SELECT id, sig, c.c AS chunk, (sig >> (c.c * 15)) & 32767 AS ckey
             |  FROM sig, range(0, 4) AS c(c)
             |), pairs AS (
             |  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
             |    bit_count(xor(a.sig, b.sig)) AS dist
             |  FROM ch a JOIN ch b
             |    ON a.chunk = b.chunk AND a.ckey = b.ckey AND a.id < b.id
             |)
             |SELECT id_a, id_b, dist FROM pairs WHERE dist <= 8
             |ORDER BY id_a, id_b""".stripMargin)),

    Q("doc_dedup_normalized", // §2.11 dedup: canonicalized-form cardinality
      (s, d) => t(s, d, "documents").agg(
        count(lit(1)).as("n_docs"),
        countDistinct(Dedup.normalized(col("text"))).as("n_unique_norm")),
      Some("""SELECT COUNT(*) AS n_docs,
             |COUNT(DISTINCT trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS n_unique_norm
             |FROM documents""".stripMargin)),

    Q("doc_lang_pred", // language-ID heuristic graded against the fixture label
      (s, d) => t(s, d, "documents")
        .select(col("lang"), TextAnalysis.langId(col("text")).as("pred"))
        .groupBy("lang", "pred").agg(count(lit(1)).as("n"))
        .orderBy("lang", "pred"),
      Some("""WITH f AS (
             |  SELECT lang, text,
             |    string_split_regex(lower(trim(text)), '\s+') AS toks
             |  FROM documents
             |), h AS (
             |  SELECT lang,
             |    regexp_matches(text, '[\x{4e00}-\x{9fff}]') AS cjk,
             |    len(list_filter(toks, t -> list_contains(['the','a','of','and','to','in','is','it','that','for'], t))) AS en,
             |    len(list_filter(toks, t -> list_contains(['le','la','les','de','et','un','une','est','que','pour'], t))) AS fr,
             |    len(list_filter(toks, t -> list_contains(['el','la','los','de','y','un','una','es','que','por'], t))) AS es,
             |    len(list_filter(toks, t -> list_contains(['der','die','das','und','ein','eine','ist','zu','den','für'], t))) AS de
             |  FROM f
             |)
             |SELECT lang, pred, COUNT(*) AS n FROM (
             |  SELECT lang,
             |    CASE WHEN cjk THEN 'zh'
             |         WHEN greatest(en, fr, es, de) >= 1 THEN
             |           CASE WHEN en >= fr AND en >= es AND en >= de THEN 'en'
             |                WHEN fr >= es AND fr >= de THEN 'fr'
             |                WHEN es >= de THEN 'es'
             |                ELSE 'de' END
             |         ELSE 'und' END AS pred
             |  FROM h
             |) GROUP BY lang, pred ORDER BY lang, pred""".stripMargin)),

    Q("doc_top_terms", // corpus vocabulary stats (tokenizer-training
      // input): term frequency + document frequency, top-k. One explode +
      // hash agg on the term key; countDistinct adds the second shuffle
      // COUNT(DISTINCT) always costs.
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"),
          explode(TextAnalysis.tokens(lower(col("text")))).as("term"))
        .groupBy("term")
        .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
        .orderBy(col("tf").desc, col("term")).limit(50),
      Some("""WITH tok AS (
             |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
             |  FROM documents
             |)
             |SELECT term, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
             |FROM tok GROUP BY term ORDER BY tf DESC, term LIMIT 50""".stripMargin)),

    Q("doc_zipf_fit", // Zipf rank-frequency fit over the top-100 terms:
      // least-squares slope of ln(tf) on ln(rank) — the corpus-health
      // probe (natural text sits near -1; the fixture's near-uniform
      // vocabulary reads much flatter, which is exactly what the check
      // is for). The regression runs over 100 rows post-top-k, so the
      // rank window and the moment sums are bounded; the corpus-wide
      // work is the same explode + hash agg as doc_top_terms.
      (s, d) => {
        val top = t(s, d, "documents")
          .select(explode(TextAnalysis.tokens(lower(col("text")))).as("term"))
          .groupBy("term").agg(count(lit(1)).as("tf"))
          .orderBy(col("tf").desc, col("term")).limit(100)
        val ranked = top.withColumn("r",
          row_number().over(Window.orderBy(col("tf").desc, col("term"))))
        val m = ranked.agg(
          count(lit(1)).as("n_terms"),
          sum(log(col("r").cast("double"))).as("sx"),
          sum(log(col("tf").cast("double"))).as("sy"),
          sum(log(col("r").cast("double"))
            * log(col("r").cast("double"))).as("sxx"),
          sum(log(col("r").cast("double"))
            * log(col("tf").cast("double"))).as("sxy"))
        val slope = (col("n_terms") * col("sxy") - col("sx") * col("sy")) /
          (col("n_terms") * col("sxx") - col("sx") * col("sx"))
        m.select(col("n_terms"),
          round(slope, 4).as("zipf_slope"),
          round((col("sy") - slope * col("sx")) / col("n_terms"), 4)
            .as("intercept"))
      },
      Some("""WITH tf AS (
             |  SELECT term, COUNT(*) AS tf FROM (
             |    SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
             |    FROM documents) GROUP BY term
             |  ORDER BY tf DESC, term LIMIT 100),
             |rk AS (SELECT tf, ROW_NUMBER() OVER (ORDER BY tf DESC, term) AS r
             |  FROM tf),
             |s AS (SELECT COUNT(*) AS n, SUM(LN(r)) AS sx, SUM(LN(tf)) AS sy,
             |  SUM(LN(r) * LN(r)) AS sxx, SUM(LN(r) * LN(tf)) AS sxy FROM rk)
             |SELECT n AS n_terms,
             |  ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS zipf_slope,
             |  ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 4)
             |    AS intercept
             |FROM s""".stripMargin)),

    Q("doc_vocab_oov", // tokenizer-coverage gate: top-200 corpus vocab
      // (deterministic tf/term order), per-language OOV token rate via a
      // broadcast join of the 200-row vocab back onto the token stream.
      (s, d) => graft.operators.TextAnalysis
        .oovReport(t(s, d, "documents"), vocabSize = 200),
      Some("""WITH tok AS (
             |  SELECT doc_id, lang,
             |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
             |  FROM documents
             |), vocab AS (
             |  SELECT term FROM (
             |    SELECT term, COUNT(*) AS tf FROM tok GROUP BY term
             |    ORDER BY tf DESC, term LIMIT 200)
             |), pd AS (
             |  SELECT t.doc_id, t.lang, COUNT(*) AS n_tok,
             |    SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS n_oov
             |  FROM tok t LEFT JOIN vocab v ON t.term = v.term
             |  GROUP BY t.doc_id, t.lang
             |)
             |SELECT lang, COUNT(*) AS n_docs,
             |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
             |  CAST(SUM(n_oov) AS BIGINT) AS n_oov,
             |  ROUND(CAST(SUM(n_oov) AS DOUBLE) / SUM(n_tok), 4) AS oov_rate
             |FROM pd GROUP BY lang ORDER BY lang""".stripMargin)),

    Q("doc_tfidf_keywords", // per-document keyword extraction: top-3 terms
      // by TF-IDF; document frequencies join back on the term key (NOT
      // broadcast — vocabulary grows with the corpus), the per-doc top-k
      // is a window over rounded scores (cross-engine FP equivalence)
      (s, d) => {
        val docs = t(s, d, "documents")
        val nDocs = docs.count()
        val tf = docs
          .select(col("doc_id"),
            TextAnalysis.tokens(lower(col("text"))).as("toks"))
          .select(col("doc_id"), size(col("toks")).as("dl"),
            explode(col("toks")).as("term"))
          .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
        val dft = tf.groupBy("term").agg(countDistinct("doc_id").as("df"))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("tfidf").desc, col("term"))
        tf.join(dft, "term")
          .withColumn("tfidf",
            round((col("tf").cast("double") / col("dl"))
              * log(lit(nDocs.toDouble) / col("df")), 6))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 3)
          .select("doc_id", "term", "rnk")
          .orderBy("doc_id", "rnk")
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term,
             |    len(string_split_regex(lower(trim(text)), '\s+')) AS dl
             |  FROM documents
             |), tf AS (
             |  SELECT doc_id, term, dl, COUNT(*) AS tf FROM tok GROUP BY 1, 2, 3
             |), dft AS (
             |  SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY 1
             |), n AS (SELECT COUNT(*) AS n FROM documents)
             |SELECT doc_id, term, rnk FROM (
             |  SELECT doc_id, term,
             |    row_number() OVER (PARTITION BY doc_id
             |      ORDER BY ROUND((tf::DOUBLE / dl) * ln(n::DOUBLE / df), 6) DESC, term) AS rnk
             |  FROM tf JOIN dft USING (term) CROSS JOIN n
             |) WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin)),

    Q("doc_keyphrases_rake", // RAKE keyphrase extraction (Rose et al.
      // 2010): maximal stopword-free token runs score Σ deg(w)/freq(w)
      // — the collocation-aware corpus keyphrase list next to TF-IDF's
      // per-doc keywords. Segmentation is a per-doc prefix sum (doc-
      // keyed window); word stats one corpus hash agg on the word key.
      // Word scores are exact-integer ratios; only the per-phrase sum
      // is float, rounded at 6dp on both sides.
      (s, d) => TextAnalysis.rakeKeyphrases(t(s, d, "documents"),
        stop = TextAnalysis.stopwords.collectFirst {
          case ("en", ws) => ws }.get),
      Some("""WITH st(w) AS (VALUES ('the'),('a'),('of'),('and'),('to'),
             |  ('in'),('is'),('it'),('that'),('for')),
             |tk AS (SELECT doc_id,
             |  string_split_regex(lower(trim(text)), '\s+') AS t FROM documents),
             |pos AS (SELECT doc_id, i, t[i] AS w
             |  FROM tk, unnest(range(1, len(t) + 1)) AS r(i)),
             |ph AS (SELECT doc_id, i, w, s,
             |    SUM(s) OVER (PARTITION BY doc_id ORDER BY i) AS pid
             |  FROM (SELECT doc_id, i, w,
             |    CASE WHEN w IN (SELECT w FROM st) THEN 1 ELSE 0 END AS s
             |    FROM pos)),
             |words AS (SELECT doc_id, pid, i, w FROM ph WHERE s = 0),
             |plen AS (SELECT doc_id, pid, COUNT(*) AS len
             |  FROM words GROUP BY 1, 2),
             |wstat AS (SELECT w, COUNT(*) AS freq, SUM(len) AS deg
             |  FROM words JOIN plen USING (doc_id, pid) GROUP BY w),
             |phr AS (SELECT doc_id, pid, string_agg(w, ' ' ORDER BY i) AS phrase
             |  FROM words GROUP BY 1, 2),
             |sc AS (SELECT words.doc_id, words.pid,
             |    SUM(CAST(deg AS DOUBLE) / freq) AS psc
             |  FROM words JOIN wstat USING (w) GROUP BY 1, 2)
             |SELECT phrase, CAST(MAX(len) AS INT) AS n_words,
             |  COUNT(*) AS n_occurrences, ROUND(MAX(psc), 6) AS score
             |FROM phr JOIN sc USING (doc_id, pid)
             |JOIN plen USING (doc_id, pid)
             |GROUP BY phrase ORDER BY score DESC, phrase LIMIT 30""".stripMargin)),

    Q("doc_bigram_freq", // corpus n-gram LM counts: top-30 bigrams — the
      // bigram stream explodes map-side straight into the hash agg
      (s, d) => t(s, d, "documents")
        .select(TextAnalysis.tokens(lower(col("text"))).as("ts"))
        .filter(size(col("ts")) >= 2)
        .select(explode(transform(sequence(lit(1), size(col("ts")) - 1),
          i => concat(element_at(col("ts"), i), lit(" "),
            element_at(col("ts"), i + 1)))).as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram")).limit(30),
      Some("""WITH tok AS (
             |  SELECT string_split_regex(lower(trim(text)), '\s+') AS ts FROM documents
             |), bg AS (
             |  SELECT unnest(list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1])) AS b
             |  FROM tok WHERE len(ts) >= 2
             |)
             |SELECT b AS bigram, COUNT(*) AS n FROM bg
             |GROUP BY b ORDER BY n DESC, bigram LIMIT 30""".stripMargin)),

    Q("doc_term_burstiness", // Church–Gale burstiness: the
      // variance-to-mean ratio of each term's per-document count
      // (zeros included — closed form off N, Σtf, Σtf²) separates
      // topical "bursty" words from function words of the same total
      // frequency, the signal topic-weighting and stopword discovery
      // both lean on. One doc-term count + one term-keyed aggregation;
      // every VMR input is an exact integer, so the ranking needs no
      // rounding (tie-break on the term).
      (s, d) => {
        val docs = t(s, d, "documents")
        val nDocs = docs.count()
        docs.select(col("doc_id"),
            explode(TextAnalysis.tokens(lower(col("text")))).as("w"))
          .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
          .groupBy("w").agg(count(lit(1)).as("n_docs"),
            sum("c").as("tot"), sum(col("c") * col("c")).as("s2"))
          .filter(col("tot") >= 20)
          .withColumn("vmr",
            (col("s2").cast("double") / nDocs
              - (col("tot").cast("double") / nDocs)
                * (col("tot").cast("double") / nDocs))
              / (col("tot").cast("double") / nDocs))
          .orderBy(col("vmr").desc, col("w")).limit(30)
          .select(col("w").as("term"), col("n_docs"), col("tot"),
            round(col("vmr"), 6).as("vmr"))
      },
      Some("""WITH tf AS (
             |  SELECT doc_id, w, COUNT(*) AS c FROM (
             |    SELECT doc_id,
             |      unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
             |    FROM documents) GROUP BY 1, 2),
             |nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
             |st AS (SELECT w, COUNT(*) AS n_docs, SUM(c) AS tot,
             |    SUM(c * c) AS s2
             |  FROM tf GROUP BY 1 HAVING SUM(c) >= 20)
             |SELECT w AS term, n_docs, CAST(tot AS BIGINT) AS tot,
             |  ROUND((CAST(s2 AS DOUBLE) / (SELECT n FROM nd)
             |    - (CAST(tot AS DOUBLE) / (SELECT n FROM nd))
             |      * (CAST(tot AS DOUBLE) / (SELECT n FROM nd)))
             |    / (CAST(tot AS DOUBLE) / (SELECT n FROM nd)), 6) AS vmr
             |FROM st
             |ORDER BY (CAST(s2 AS DOUBLE) / (SELECT n FROM nd)
             |    - (CAST(tot AS DOUBLE) / (SELECT n FROM nd))
             |      * (CAST(tot AS DOUBLE) / (SELECT n FROM nd)))
             |    / (CAST(tot AS DOUBLE) / (SELECT n FROM nd)) DESC, term
             |LIMIT 30""".stripMargin)),

    Q("doc_feature_hashing", // the hashing trick (Weinberger et al.
      // 2009): tokens hash into a FIXED 64-bucket feature space — the
      // step that turns an unbounded vocabulary into a constant-width
      // model input with no dictionary to ship. Uses the same portable
      // md5+Mersenne hash as the minhash family, so the oracle replays
      // every bucket assignment; output is the collision profile
      // (tokens + distinct words per bucket) a pipeline checks before
      // trusting hashed features. One explode → one hash agg.
      (s, d) => t(s, d, "documents")
        .select(explode(TextAnalysis.tokens(lower(col("text")))).as("w"))
        .select((conv(substring(md5(col("w")), 1, 15), 16, 10).cast("long")
          % 2147483647L % 64).as("bucket"), col("w"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_tokens"), countDistinct("w").as("n_words"))
        .orderBy("bucket"),
      Some("""WITH tok AS (
             |  SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
             |  FROM documents)
             |SELECT ('0x' || substr(md5(w), 1, 15))::BIGINT
             |    % 2147483647 % 64 AS bucket,
             |  COUNT(*) AS n_tokens, COUNT(DISTINCT w) AS n_words
             |FROM tok GROUP BY 1 ORDER BY bucket""".stripMargin)),

    Q("doc_ppl_transfer", // domain-transfer matrix: one add-1 unigram
      // LM per source, every source scored under every LM — H(A|B)
      // tells the mixture planner which domains substitute for which
      // (the transfer signal behind DSIR-style reweighting). One
      // (source, word) count aggregation; the matrix expands by the
      // bounded source dimension (collected list, like a centroid
      // table), never doc×doc. Counts exact; one rounded ln-sum.
      (s, d) => TextAnalysis.unigramTransferMatrix(t(s, d, "documents"))
        .orderBy("src_a", "src_b"),
      Some("""WITH tok AS (
             |  SELECT source,
             |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
             |  FROM documents),
             |cnt AS (SELECT source, w, COUNT(*) AS c FROM tok GROUP BY 1, 2),
             |tot AS (SELECT source, SUM(c) AS tc FROM cnt GROUP BY 1),
             |v AS (SELECT COUNT(DISTINCT w) AS v FROM tok),
             |h AS (
             |  SELECT a.source AS src_a, b.source AS src_b,
             |    SUM(a.c * ln((COALESCE(cb.c, 0) + 1.0)
             |      / (tb.tc + (SELECT v FROM v)))) AS s
             |  FROM cnt a
             |  CROSS JOIN (SELECT DISTINCT source FROM documents) b
             |  LEFT JOIN cnt cb ON cb.source = b.source AND cb.w = a.w
             |  JOIN tot tb ON tb.source = b.source
             |  GROUP BY 1, 2)
             |SELECT src_a, src_b,
             |  ROUND(-s / ta.tc, 6) AS cross_entropy,
             |  ROUND(exp(-s / ta.tc), 6) AS ppl
             |FROM h JOIN tot ta ON ta.source = h.src_a
             |ORDER BY src_a, src_b""".stripMargin)),

    Q("doc_lm_score", // n-gram LM fluency score (the CCNet-style quality
      // filter): each document's mean log-probability under the corpus
      // bigram model, P(w2|w1) = C(w1 w2)/C(w1·). The history counts come
      // from the same exploded bigram stream as the pair counts — two
      // hash aggs and two joins on compact string keys; the token arrays
      // never shuffle
      (s, d) => {
        val bg = t(s, d, "documents")
          .select(col("doc_id"), TextAnalysis.tokens(lower(col("text"))).as("ts"))
          .filter(size(col("ts")) >= 2)
          .select(col("doc_id"), explode(transform(
            sequence(lit(1), size(col("ts")) - 1),
            i => struct(element_at(col("ts"), i).as("w1"),
              concat(element_at(col("ts"), i), lit(" "),
                element_at(col("ts"), i + 1)).as("b")))).as("p"))
          .select(col("doc_id"), col("p.w1"), col("p.b"))
        val cb = bg.groupBy("b").agg(count(lit(1)).as("cb"))
        val cw = bg.groupBy("w1").agg(count(lit(1)).as("cw"))
        bg.join(cb, Seq("b")).join(cw, Seq("w1"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"),
            round(avg(log(col("cb").cast("double") / col("cw"))), 6).as("lm_score"))
          .orderBy("doc_id")
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ts
             |  FROM documents
             |), bg AS (
             |  SELECT doc_id,
             |    unnest(list_transform(range(1, len(ts)), i -> ts[i])) AS w1,
             |    unnest(list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1])) AS b
             |  FROM tok WHERE len(ts) >= 2
             |), cb AS (SELECT b, COUNT(*) AS cb FROM bg GROUP BY b),
             |cw AS (SELECT w1, COUNT(*) AS cw FROM bg GROUP BY w1)
             |SELECT doc_id, COUNT(*) AS n_bigrams,
             |  ROUND(AVG(LN(CAST(cb AS DOUBLE) / cw)), 6) AS lm_score
             |FROM bg JOIN cb USING (b) JOIN cw USING (w1)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    Q("doc_bpe_merges", // BPE training rounds (Sennrich et al. 2016),
      // (shares the recursive-replay oracle scaffolding in bpeOracleWith)
      // token-level: 3 merge decisions — relational pair counting + argmax
      // per round, typed map for the sequential in-row rewrite. The oracle
      // replays the greedy rewrite as a RECURSIVE CTE merging the leftmost
      // occurrence per step (provably identical here: a merge of (a,b)
      // can never create a new (a,b) adjacency, so repeated-leftmost ≡
      // one greedy scan), and pairs order as a\\x01b strings — \\x01 sorts
      // below every token char, so concat order equals tuple order.
      // Independent reference also pinned in TextAnalysisSpec.
      (s, d) => s.createDataFrame(bpeMerges(s, d)).orderBy("round"),
      Some(
        s"""$bpeOracleWith
           |SELECT * FROM (
           |  SELECT 1 AS round, split_part(pr, chr(1), 1) AS first,
           |    split_part(pr, chr(1), 2) AS second,
           |    replace(pr, chr(1), '_') AS merged, n AS "count" FROM p1
           |  UNION ALL
           |  SELECT 2, split_part(pr, chr(1), 1), split_part(pr, chr(1), 2),
           |    replace(pr, chr(1), '_'), n FROM p2
           |  UNION ALL
           |  SELECT 3, split_part(pr, chr(1), 1), split_part(pr, chr(1), 2),
           |    replace(pr, chr(1), '_'), n FROM p3
           |) ORDER BY round""".stripMargin)),

    Q("doc_bpe_encode", // the tokenizer's APPLICATION side: re-train the
      // 3 merges, then rewrite every document through them in training
      // order (one typed map, merge table in the closure — no shuffle).
      // The oracle's final rewritten corpus c3 from the same recursive
      // replay IS the encoded corpus, so every per-doc count matches.
      (s, d) => graft.operators.TextAnalysis
        .bpeEncode(t(s, d, "documents"), bpeMerges(s, d))
        .orderBy("doc_id"),
      Some(
        s"""$bpeOracleWith
           |SELECT c0.id AS doc_id, CAST(len(c0.ts) AS BIGINT) AS n_raw,
           |  CAST(len(c3.ts) AS BIGINT) AS n_encoded,
           |  ROUND(CAST(len(c3.ts) AS DOUBLE) / len(c0.ts), 6) AS compression
           |FROM c0 JOIN c3 ON c0.id = c3.id
           |ORDER BY doc_id""".stripMargin)),

    Q("doc_weighted_sample", // deterministic weighted sampling without
      // replacement (Efraimidis–Spirakis A-ES): key = u^(1/w), take the
      // top-k keys. u comes from a Knuth multiplicative hash of the id —
      // fully reproducible, identical in both engines, and the whole
      // sample is one TakeOrderedAndProject (no global sort). Weight =
      // n_chars: longer documents are proportionally likelier. Ordering
      // happens on the ROUNDED key so libm pow() ULP differences between
      // engines can't flip ranks.
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"),
          round(pow((col("doc_id") * lit(2654435761L)) % lit(4294967296L)
            / lit(4294967296.0), lit(1.0) / col("n_chars")), 9).as("k"))
        .orderBy(col("k").desc, col("doc_id")).limit(25),
      Some("""SELECT doc_id, lang, n_chars,
             |ROUND(POW(((doc_id * 2654435761) % 4294967296) / 4294967296.0,
             |  1.0 / n_chars), 9) AS k
             |FROM documents
             |ORDER BY k DESC, doc_id LIMIT 25""".stripMargin)),

    Q("doc_trigram_search", // substring search via a trigram inverted
      // index (pg_trgm): posting scan pruned to the query's own trigrams,
      // all-trigram candidates, exact contains() verify. The oracle is
      // the plain full-scan LIKE — identical results, different physics.
      (s, d) => graft.operators.Retrieval
        .trigramSubstringSearch(t(s, d, "documents"), "spark window"),
      Some("""SELECT doc_id FROM documents
             |WHERE contains(text, 'spark window')
             |ORDER BY doc_id""".stripMargin)),

    Q("doc_phrase_search", // token-level EXACT phrase search ("hash agg"
      // in quotes) over a positional inverted index: postings pruned to
      // the phrase's terms map-side, later terms join the anchor at
      // pos+i on the (doc, position) key — what substring search can't
      // answer honestly (it also matches inside longer tokens)
      (s, d) => graft.operators.Retrieval
        .phraseSearch(t(s, d, "documents"), Seq("hash", "agg")),
      Some("""WITH tok AS (
             |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ts
             |  FROM documents
             |), hits AS (
             |  SELECT doc_id, CAST(len(list_filter(range(1, greatest(len(ts), 1)),
             |    i -> ts[i] = 'hash' AND ts[i+1] = 'agg')) AS BIGINT) AS n_occurrences
             |  FROM tok
             |)
             |SELECT doc_id, n_occurrences FROM hits
             |WHERE n_occurrences > 0 ORDER BY doc_id""".stripMargin)),

    Q("doc_bm25_search", // ranked keyword retrieval (Okapi BM25, k1=1.2 b=0.75)
      (s, d) => graft.operators.Retrieval.bm25(
        t(s, d, "documents"), Seq("spark", "join", "window")),
      Some("""WITH tok AS (
             |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
             |  FROM documents
             |), m AS (
             |  SELECT doc_id, len(toks) AS dl,
             |    unnest(list_filter(toks,
             |      t -> list_contains(['spark','join','window'], t))) AS term
             |  FROM tok
             |), tf AS (
             |  SELECT doc_id, dl, term, COUNT(*) AS tf FROM m GROUP BY 1, 2, 3
             |), dft AS (
             |  SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY 1
             |), stats AS (
             |  SELECT COUNT(*) AS n, AVG(len(toks)) AS avgdl FROM tok
             |)
             |SELECT doc_id, COUNT(DISTINCT term) AS n_terms,
             |  ROUND(SUM(ln((n - df + 0.5) / (df + 0.5) + 1.0)
             |    * (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))), 4) AS score
             |FROM tf JOIN dft USING (term) CROSS JOIN stats
             |GROUP BY doc_id ORDER BY score DESC, doc_id""".stripMargin)),

    Q("doc_search_eval", // IR ranking-quality eval: P@10 / MRR@10 /
      // NDCG@10 of the BM25 bag-of-words ranker vs exact-PHRASE
      // relevance (gold = the query terms adjacent and in order) — the
      // offline eval loop of every index build. Gold ⊆ candidates, so
      // only (query, doc) pairs join back; ranks order by the ROUNDED
      // score + doc-id tie-break (the suite's cross-engine protocol).
      (s, d) => graft.operators.Retrieval.searchEval(
        t(s, d, "documents"),
        Seq(1 -> Seq("spark", "join"), 2 -> Seq("window", "table"),
          3 -> Seq("hash", "merge"))),
      Some("""WITH qt AS (
             |  SELECT * FROM (VALUES
             |    (1, 'spark'), (1, 'join'),
             |    (2, 'window'), (2, 'table'),
             |    (3, 'hash'), (3, 'merge')) AS v(query_id, term)),
             |tok AS (
             |  SELECT doc_id,
             |    string_split_regex(lower(trim(text)), '\s+') AS toks
             |  FROM documents),
             |gold AS (
             |  SELECT v.query_id, doc_id
             |  FROM tok, (VALUES (1, ' spark join '), (2, ' window table '),
             |    (3, ' hash merge ')) AS v(query_id, ph)
             |  WHERE instr(' ' || array_to_string(toks, ' ') || ' ', v.ph) > 0),
             |m AS (
             |  SELECT doc_id, len(toks) AS dl, unnest(list_filter(toks,
             |    t -> list_contains(['spark','join','window','table','hash','merge'], t))) AS term
             |  FROM tok),
             |tf AS (SELECT doc_id, dl, term, COUNT(*) AS tf FROM m GROUP BY 1, 2, 3),
             |dft AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
             |stats AS (SELECT COUNT(*) AS n, AVG(len(toks)) AS avgdl FROM tok),
             |sc AS (
             |  SELECT query_id, doc_id,
             |    ROUND(SUM(ln((n - df + 0.5) / (df + 0.5) + 1.0)
             |      * (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))), 4) AS score
             |  FROM tf JOIN dft USING (term) JOIN qt USING (term) CROSS JOIN stats
             |  GROUP BY 1, 2),
             |rk AS (
             |  SELECT query_id, doc_id, score, ROW_NUMBER() OVER (
             |    PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
             |  FROM sc),
             |j AS (
             |  SELECT rk.*, (gold.doc_id IS NOT NULL) AS g
             |  FROM rk LEFT JOIN gold USING (query_id, doc_id)),
             |ag AS (
             |  SELECT query_id, COUNT(*) AS n_matched,
             |    COUNT(*) FILTER (WHERE g) AS n_gold,
             |    COUNT(*) FILTER (WHERE g AND rank <= 10) AS n_hits,
             |    COALESCE(MAX(1.0 / rank) FILTER (WHERE g AND rank <= 10), 0.0) AS mrr,
             |    COALESCE(SUM(1.0 / log2(rank + 1.0))
             |      FILTER (WHERE g AND rank <= 10), 0.0) AS dcg
             |  FROM j GROUP BY 1)
             |SELECT query_id, n_matched, n_gold,
             |  ROUND(n_hits / 10.0, 6) AS p_at_10,
             |  ROUND(mrr, 6) AS mrr_at_10,
             |  CASE WHEN n_gold > 0 THEN
             |    ROUND(dcg / list_sum(list_transform(range(1, least(10, n_gold) + 1),
             |      i -> 1.0 / log2(i + 1.0))), 6)
             |  END AS ndcg_at_10
             |FROM ag ORDER BY query_id""".stripMargin)),

    Q("doc_repetition", // Gopher-style repetition filters: top-token /
      // top-bigram mode fraction (per-row sorted-run scan — no explode +
      // groupBy shuffle of rows×tokens cells) + duplicate-line fraction
      (s, d) => t(s, d, "documents").select(
        col("doc_id"),
        round(graft.operators.Cleanse.topTokenFraction(col("text")), 6).as("top_token_frac"),
        round(graft.operators.Cleanse.topBigramFraction(col("text")), 6).as("top_bigram_frac"),
        round(graft.operators.Cleanse.dupLineFraction(col("text")), 6).as("dup_line_frac"))
        .orderBy("doc_id"),
      Some("""WITH tok AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts,
             |    list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)),
             |                x -> length(x) > 0) AS lines
             |  FROM documents
             |), bg AS (
             |  SELECT doc_id, len(ts) - 1 AS n_bg,
             |    unnest(list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1])) AS b
             |  FROM tok WHERE len(ts) >= 2
             |), bgc AS (
             |  SELECT doc_id, n_bg, b, COUNT(*) AS c FROM bg GROUP BY 1, 2, 3
             |), bgtop AS (
             |  SELECT doc_id, ROUND(MAX(c)::DOUBLE / n_bg, 6) AS top_bigram_frac
             |  FROM bgc GROUP BY doc_id, n_bg
             |), ug AS (
             |  SELECT doc_id, len(ts) AS n_tok, unnest(ts) AS t FROM tok
             |), ugc AS (
             |  SELECT doc_id, n_tok, t, COUNT(*) AS c FROM ug GROUP BY 1, 2, 3
             |), ugtop AS (
             |  SELECT doc_id, ROUND(MAX(c)::DOUBLE / n_tok, 6) AS top_token_frac
             |  FROM ugc GROUP BY doc_id, n_tok
             |)
             |SELECT tok.doc_id,
             |  COALESCE(ugtop.top_token_frac, 0.0) AS top_token_frac,
             |  COALESCE(bgtop.top_bigram_frac, 0.0) AS top_bigram_frac,
             |  CASE WHEN len(lines) = 0 THEN 0.0
             |       ELSE ROUND((len(lines) - len(list_distinct(lines)))::DOUBLE / len(lines), 6) END AS dup_line_frac
             |FROM tok LEFT JOIN bgtop USING (doc_id) LEFT JOIN ugtop USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    Q("doc_pii", // PII detect + redact over deterministic synthetic PII
      // (fixture text carries none — Cleanse.withSyntheticPii appends an
      // email/phone/URL derived from doc_id/source, reproduced in the CTE)
      (s, d) => graft.operators.Cleanse
        .withSyntheticPii(t(s, d, "documents"))
        .select(col("doc_id"),
          graft.operators.Cleanse.emailCount(col("text")).as("n_emails"),
          graft.operators.Cleanse.phoneCount(col("text")).as("n_phones"),
          graft.operators.Cleanse.urlCount(col("text")).as("n_urls"),
          md5(graft.operators.Cleanse.redact(col("text"))).as("redacted_md5"))
        .orderBy("doc_id"),
      Some("""WITH p AS (
             |  SELECT doc_id,
             |    text || ' contact user' || CAST(doc_id AS VARCHAR)
             |      || '@example.com or call 555-01' || CAST(doc_id % 10 AS VARCHAR)
             |      || '-' || CAST(1000 + doc_id % 9000 AS VARCHAR)
             |      || ' visit https://' || source || '.example.org/d/' || CAST(doc_id AS VARCHAR) AS text
             |  FROM documents
             |)
             |SELECT doc_id,
             |  len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
             |  len(regexp_extract_all(text, '\d{3}[-.]\d{3}[-.]\d{4}')) AS n_phones,
             |  len(regexp_extract_all(text, 'https?://[^\s]+')) AS n_urls,
             |  md5(regexp_replace(regexp_replace(regexp_replace(text,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |    '\d{3}[-.]\d{3}[-.]\d{4}', '<PHONE>', 'g'),
             |    'https?://[^\s]+', '<URL>', 'g')) AS redacted_md5
             |FROM p ORDER BY doc_id""".stripMargin)),

    Q("doc_url_domains", // URL → domain histogram (narrow extract+explode,
      // one hash agg on the domain key)
      (s, d) => graft.operators.Cleanse
        .urlDomainHistogram(graft.operators.Cleanse
          .withSyntheticUrls(t(s, d, "documents")))
        .orderBy("domain"),
      Some("""WITH p AS (
             |  SELECT doc_id, source,
             |    text || ' see https://' || source || '.example.org/d/' || CAST(doc_id AS VARCHAR)
             |      || CASE WHEN doc_id % 3 = 0
             |              THEN ' and http://mirror-' || source || '.example.net/x'
             |              ELSE '' END AS text
             |  FROM documents
             |), u AS (
             |  SELECT unnest(regexp_extract_all(text, 'https?://[^\s]+')) AS url FROM p
             |)
             |SELECT regexp_extract(url, 'https?://([^/\s]+)', 1) AS domain, COUNT(*) AS n
             |FROM u GROUP BY domain ORDER BY domain""".stripMargin)),

    Q("doc_dup_clusters", // near-dup pairs → connected components → dedup
      // groups (A~B, B~C collapse to one cluster even without an A~C pair);
      // iterative min-label propagation, O(diameter) rounds. Oracle: the
      // same pairs + a recursive-CTE transitive closure.
      (s, d) => graft.operators.Dedup
        .dupClustersOf(dupClusterLabels(s, d))
        .orderBy("cluster_id"),
      Some(dupClustersCte + """
             |SELECT cluster_id, COUNT(*) AS n_members,
             |  array_to_string(list_sort(list(id)), ',') AS members
             |FROM comp GROUP BY cluster_id ORDER BY cluster_id""".stripMargin)),

    Q("doc_bleu_pairs", // BLEU-2 grade of the dedup pipeline's OWN
      // clusters — clipped modified 1/2-gram precision + brevity
      // penalty (Papineni et al. 2002), the overlap metric that
      // separates true rewrites from topical neighbors. Each member is
      // graded against its cluster EXEMPLAR (the min-id label the CC
      // build already assigns) — LINEAR in members, where all-pairs
      // enumeration is quadratic in cluster size and detonates the
      // moment a low-threshold jaccard graph percolates (measured: the
      // all-pairs form OOM'd the 10x probe after 326 s of GC thrash —
      // PLANS.md round 7 cont.). Per-doc gram multisets aggregate
      // once, each pair is two doc-keyed joins; precisions are
      // exact-integer ratios; the only libm (exp/ln in the geometric
      // mean) rounds at 6dp.
      (s, d) => {
        val labels = dupClusterLabels(s, d)
        val pairs = labels.filter(col("id") =!= col("cluster_id"))
          .select(col("cluster_id").as("id_a"), col("id").as("id_b"))
        TextAnalysis.bleu2Pairs(t(s, d, "documents"), pairs)
          .orderBy("id_a", "id_b")
      },
      Some(dupClustersCte + """
             |, cp AS (
             |  SELECT cluster_id AS id_a, id AS id_b FROM comp
             |  WHERE id <> cluster_id
             |), tk AS (
             |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
             |  FROM documents
             |), uni AS (
             |  SELECT doc_id, g, COUNT(*) AS c
             |  FROM (SELECT doc_id, unnest(t) AS g FROM tk) GROUP BY 1, 2
             |), bi AS (
             |  SELECT doc_id, g, COUNT(*) AS c FROM (
             |    SELECT doc_id,
             |      unnest(list_transform(range(1, len(t)),
             |        i -> t[i] || ' ' || t[i + 1])) AS g
             |    FROM tk) GROUP BY 1, 2
             |), c1 AS (
             |  SELECT cp.id_a, cp.id_b,
             |    SUM(LEAST(u.c, COALESCE(v.c, 0))) AS clip1, SUM(u.c) AS tot1
             |  FROM cp JOIN uni u ON u.doc_id = cp.id_a
             |  LEFT JOIN uni v ON v.doc_id = cp.id_b AND v.g = u.g
             |  GROUP BY 1, 2
             |), c2 AS (
             |  SELECT cp.id_a, cp.id_b,
             |    SUM(LEAST(u.c, COALESCE(v.c, 0))) AS clip2, SUM(u.c) AS tot2
             |  FROM cp JOIN bi u ON u.doc_id = cp.id_a
             |  LEFT JOIN bi v ON v.doc_id = cp.id_b AND v.g = u.g
             |  GROUP BY 1, 2
             |), lens AS (SELECT doc_id, len(t) AS n FROM tk)
             |SELECT c1.id_a, c1.id_b,
             |  CAST(la.n AS INT) AS n_tok_a, CAST(lb.n AS INT) AS n_tok_b,
             |  ROUND(clip1 / CAST(tot1 AS DOUBLE), 6) AS p1,
             |  ROUND(clip2 / CAST(tot2 AS DOUBLE), 6) AS p2,
             |  CASE WHEN clip1 > 0 AND clip2 > 0 THEN
             |    ROUND(LEAST(1.0, exp(1.0 - CAST(lb.n AS DOUBLE) / la.n))
             |      * exp((ln(clip1 / CAST(tot1 AS DOUBLE))
             |           + ln(clip2 / CAST(tot2 AS DOUBLE))) / 2.0), 6)
             |  ELSE 0.0 END AS bleu2
             |FROM c1 JOIN c2 USING (id_a, id_b)
             |JOIN lens la ON la.doc_id = c1.id_a
             |JOIN lens lb ON lb.doc_id = c1.id_b
             |ORDER BY id_a, id_b""".stripMargin)),

    Q("doc_dedup_keep_best", // dedup keeping the BEST cluster member
      // (longest text, ties to lowest id) instead of an arbitrary one —
      // survivors never shuffle, only the loser set (the small side)
      // subtracts via anti join. Oracle: recursive-CTE closure + window.
      (s, d) => graft.operators.Dedup
        .keepBestOf(t(s, d, "documents"), dupClusterLabels(s, d), "n_chars")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
        .orderBy("lang"),
      Some("""WITH RECURSIVE d AS (
             |  SELECT source, doc_id,
             |    list_distinct(list_transform(
             |      range(0, greatest(len(t) - 2, 1)),
             |      i -> array_to_string(t[(i+1):(i+3)], ' '))) AS sh
             |  FROM (SELECT source, doc_id,
             |          string_split_regex(lower(trim(text)), '\s+') AS t
             |        FROM documents)
             |), pairs AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
             |  FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
             |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             |      / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.02
             |), edges AS (
             |  SELECT id_a AS src, id_b AS dst FROM pairs
             |  UNION SELECT id_b, id_a FROM pairs
             |), reach(id, r) AS (
             |  SELECT src, src FROM edges
             |  UNION
             |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id
             |), comp AS (
             |  SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id
             |), losers AS (
             |  SELECT doc_id FROM (
             |    SELECT d2.doc_id, ROW_NUMBER() OVER (
             |      PARTITION BY c.cluster_id
             |      ORDER BY d2.n_chars DESC, d2.doc_id) AS rn
             |    FROM comp c JOIN documents d2 ON c.id = d2.doc_id) x
             |  WHERE rn > 1
             |)
             |SELECT lang, COUNT(*) AS n_docs,
             |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
             |FROM documents
             |WHERE doc_id NOT IN (SELECT doc_id FROM losers)
             |GROUP BY lang ORDER BY lang""".stripMargin)),

    Q("doc_novelty", // per-doc novelty: fraction of a doc's distinct
      // 5-shingles appearing in no other doc — catches cross-document
      // boilerplate that within-doc repetition filters miss, and is the
      // standard memorization-risk proxy. df join on the shingle key,
      // never doc-vs-doc.
      (s, d) => graft.operators.Dedup
        .shingleNovelty(t(s, d, "documents"), shingleK = 5)
        .orderBy("doc_id"),
      Some("""WITH sh AS (
             |  SELECT doc_id,
             |    list_distinct(list_transform(
             |      range(0, greatest(len(t) - 4, 1)),
             |      i -> array_to_string(t[(i+1):(i+5)], ' '))) AS sh
             |  FROM (SELECT doc_id,
             |          string_split_regex(lower(trim(text)), '\s+') AS t
             |        FROM documents)
             |), ds AS (SELECT doc_id, unnest(sh) AS s FROM sh),
             |dfq AS (SELECT s, COUNT(*) AS df FROM ds GROUP BY s)
             |SELECT doc_id, COUNT(*) AS n_shingles,
             |  CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_unique,
             |  ROUND(AVG(CASE WHEN df = 1 THEN 1.0 ELSE 0.0 END), 6) AS novelty
             |FROM ds JOIN dfq USING (s)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    Q("doc_strip_repeats", // repeated-substring span removal (the
      // exact-match fixed-width form of Lee et al. 2022 suffix-array
      // dedup): every 5-token window occurring in >= 3 distinct docs is
      // marked, overlapping/adjacent marks merge into maximal spans per
      // doc (islands over flagged starts), and the report carries the
      // surviving-token ratio. df comes from ONE shingle-keyed agg; the
      // merge window sorts only flagged positions, never the corpus.
      (s, d) => graft.operators.Dedup
        .stripRepeatedSpans(t(s, d, "documents"), shingleK = 5, minDf = 3L)
        .orderBy("doc_id"),
      Some("""WITH tk AS (
             |  SELECT doc_id,
             |    string_split_regex(lower(trim(text)), '\s+') AS t
             |  FROM documents),
             |sp0 AS (
             |  SELECT doc_id, unnest(list_transform(range(0, len(t) - 4),
             |    i -> {'pos': i, 's': array_to_string(t[(i+1):(i+5)], ' ')}))
             |    AS u
             |  FROM tk WHERE len(t) >= 5),
             |sp AS (SELECT doc_id, CAST(u.pos AS BIGINT) AS pos, u.s AS s
             |  FROM sp0),
             |dfq AS (SELECT s FROM (
             |    SELECT s, COUNT(DISTINCT doc_id) AS df FROM sp GROUP BY s)
             |  WHERE df >= 3),
             |fl AS (SELECT doc_id, pos AS st, pos + 4 AS en
             |  FROM sp JOIN dfq USING (s)),
             |pm AS (SELECT doc_id, st, en,
             |    MAX(en) OVER (PARTITION BY doc_id ORDER BY st
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
             |  FROM fl),
             |brk AS (SELECT doc_id, st, en,
             |    CASE WHEN pmax IS NULL OR st > pmax + 1 THEN 1 ELSE 0 END AS b
             |  FROM pm),
             |gid AS (SELECT doc_id, st, en,
             |    SUM(b) OVER (PARTITION BY doc_id ORDER BY st
             |      ROWS UNBOUNDED PRECEDING) AS g
             |  FROM brk),
             |mg AS (SELECT doc_id, g, MIN(st) AS st, MAX(en) AS en
             |  FROM gid GROUP BY 1, 2),
             |agg AS (SELECT doc_id, COUNT(*) AS n_spans,
             |    CAST(SUM(en - st + 1) AS BIGINT) AS tokens_removed
             |  FROM mg GROUP BY 1)
             |SELECT tk.doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
             |  COALESCE(n_spans, 0) AS n_spans,
             |  COALESCE(tokens_removed, 0) AS tokens_removed,
             |  ROUND(CAST(len(t) - COALESCE(tokens_removed, 0) AS DOUBLE)
             |    / len(t), 6) AS keep_ratio
             |FROM tk LEFT JOIN agg USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    Q("doc_span_dedup_rewrite", // C4/RefinedWeb-style corpus rewrite:
      // non-overlapping 10-token spans, every span value keeps its FIRST
      // (doc_id, span_idx) occurrence corpus-wide, docs re-emitted with
      // dropped spans removed. Keep-first is a hash-keyed min-struct agg
      // (8-byte span hashes shuffle, never span strings); the rewrite
      // re-derives span text locally, so text never shuffles.
      (s, d) => graft.operators.Dedup
        .spanDedupRewrite(t(s, d, "documents"), spanTokens = 10)
        .orderBy("doc_id"),
      Some("""WITH tk AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
             |  FROM documents),
             |st AS (
             |  SELECT doc_id, t, unnest(range(0, len(t), 10)) AS s FROM tk),
             |sp AS (
             |  SELECT doc_id, CAST(s / 10 AS BIGINT) AS span_idx,
             |    array_to_string(t[(s + 1):(s + 10)], ' ') AS sp
             |  FROM st),
             |rk AS (
             |  SELECT doc_id, span_idx, sp,
             |    ROW_NUMBER() OVER (PARTITION BY sp
             |      ORDER BY doc_id, span_idx) AS rn
             |  FROM sp)
             |SELECT doc_id,
             |  COUNT(*) AS n_spans,
             |  COUNT(*) FILTER (WHERE rn > 1) AS n_dropped,
             |  COALESCE(string_agg(sp, ' ' ORDER BY span_idx)
             |    FILTER (WHERE rn = 1), '') AS text_kept
             |FROM rk GROUP BY doc_id
             |ORDER BY doc_id""".stripMargin)),

    Q("doc_decontaminate", // benchmark decontamination: drop every corpus
      // doc sharing a 5-shingle with the held-out set (doc_id % 97 == 0
      // simulates the benchmark). Explode + semi join on the shingle key,
      // anti join subtracts — no pairwise comparison anywhere.
      (s, d) => {
        val docs = t(s, d, "documents")
        val bench = docs.filter(col("doc_id") % 97 === 0)
        graft.operators.Dedup
          .decontaminate(docs.filter(col("doc_id") % 97 =!= 0), bench,
            shingleK = 5)
          .groupBy("lang").agg(count(lit(1)).as("n_clean"))
          .orderBy("lang")
      },
      Some("""WITH sh AS (
             |  SELECT doc_id, lang,
             |    list_distinct(list_transform(
             |      range(0, greatest(len(t) - 4, 1)),
             |      i -> array_to_string(t[(i+1):(i+5)], ' '))) AS sh
             |  FROM (SELECT doc_id, lang,
             |          string_split_regex(lower(trim(text)), '\s+') AS t
             |        FROM documents)
             |), bench AS (
             |  SELECT DISTINCT unnest(sh) AS s FROM sh WHERE doc_id % 97 = 0
             |), cont AS (
             |  SELECT DISTINCT doc_id FROM (
             |    SELECT doc_id, unnest(sh) AS s FROM sh
             |    WHERE doc_id % 97 <> 0) x
             |  JOIN bench USING (s)
             |)
             |SELECT lang, COUNT(*) AS n_clean FROM sh
             |WHERE doc_id % 97 <> 0
             |AND doc_id NOT IN (SELECT doc_id FROM cont)
             |GROUP BY lang ORDER BY lang""".stripMargin)),

    Q("doc_split_report", { // leakage-safe train/val/test split: the split
      // is a pure hash function of the NEAR-DUP CLUSTER id, so duplicates
      // can never straddle a train/eval boundary. The report aggregates
      // per split and carries a self-certifying cross_split_pairs column
      // (near-dup pairs whose two sides landed in different splits — 0 by
      // construction, and the oracle recomputes it independently).
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        val asg = graft.operators.Dedup
          .leakageSafeSplitOf(docs, dupClusterLabels(s, d))
          .select(col("doc_id"), col("cluster_id"), col("n_chars"),
            col("split"))
        val pairs = graft.operators.Dedup
          .ngramJaccardOf(shinglePairIndex(s, d), threshold = 0.02)
        val leaks = pairs
          .join(asg.select(col("doc_id").as("id_a"), col("split").as("_sa")),
            "id_a")
          .join(asg.select(col("doc_id").as("id_b"), col("split").as("_sb")),
            "id_b")
          .filter(col("_sa") =!= col("_sb"))
          .groupBy(col("_sa").as("split")).agg(count(lit(1)).as("_n_leak"))
        asg.groupBy("split")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct("cluster_id").as("n_clusters"),
            sum("n_chars").as("total_chars"))
          .join(leaks, Seq("split"), "left")
          .withColumn("cross_split_pairs", coalesce(col("_n_leak"), lit(0L)))
          .drop("_n_leak")
          .orderBy("split")
      }
    }, {
      // the cut-points are floats rounded exactly once, in Scala, then
      // inlined so both engines compare against identical integers
      val (trainCut, valCut) = graft.operators.Dedup.splitCuts(0.8, 0.1)
      Some(s"""WITH RECURSIVE d AS (
             |  SELECT source, doc_id,
             |    list_distinct(list_transform(
             |      range(0, greatest(len(t) - 2, 1)),
             |      i -> array_to_string(t[(i+1):(i+3)], ' '))) AS sh
             |  FROM (SELECT source, doc_id,
             |          string_split_regex(lower(trim(text)), '\\s+') AS t
             |        FROM documents)
             |), pairs AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
             |  FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
             |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             |      / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.02
             |), edges AS (
             |  SELECT id_a AS src, id_b AS dst FROM pairs
             |  UNION SELECT id_b, id_a FROM pairs
             |), reach(id, r) AS (
             |  SELECT src, src FROM edges
             |  UNION
             |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id
             |), comp AS (
             |  SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id
             |), lab AS (
             |  SELECT doc_id, n_chars, cluster_id,
             |    CASE WHEN u < $trainCut THEN 'train'
             |         WHEN u < $valCut THEN 'val'
             |         ELSE 'test' END AS split
             |  FROM (
             |    SELECT dd.doc_id, dd.n_chars,
             |      COALESCE(c.cluster_id, dd.doc_id) AS cluster_id,
             |      ('0x' || substr(md5(CAST(COALESCE(c.cluster_id, dd.doc_id)
             |        AS VARCHAR)), 1, 8))::BIGINT AS u
             |    FROM documents dd LEFT JOIN comp c ON dd.doc_id = c.id)
             |), leaks AS (
             |  SELECT la.split, COUNT(*) AS n_leak
             |  FROM pairs p
             |  JOIN lab la ON p.id_a = la.doc_id
             |  JOIN lab lb ON p.id_b = lb.doc_id
             |  WHERE la.split <> lb.split GROUP BY la.split
             |)
             |SELECT l.split, COUNT(*) AS n_docs,
             |  COUNT(DISTINCT l.cluster_id) AS n_clusters,
             |  CAST(SUM(l.n_chars) AS BIGINT) AS total_chars,
             |  CAST(COALESCE(MAX(k.n_leak), 0) AS BIGINT) AS cross_split_pairs
             |FROM lab l LEFT JOIN leaks k ON l.split = k.split
             |GROUP BY l.split ORDER BY l.split""".stripMargin)
    }),

    Q("doc_pack_shards", // token-budget training shards: cumulative token
      // offset per source stream → shard id; one window pass per source
      (s, d) => graft.operators.Retrieval
        .packShards(t(s, d, "documents"), budget = 500)
        .groupBy("source", "shard_id")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("shard_tokens"))
        .orderBy("source", "shard_id"),
      Some("""WITH tok AS (
             |  SELECT source, doc_id, len(string_split_regex(trim(text), '\s+')) AS n_tok
             |  FROM documents
             |), c AS (
             |  SELECT source, doc_id, n_tok,
             |    COALESCE(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
             |  FROM tok
             |)
             |SELECT source, CAST(cum_before // 500 AS INT) AS shard_id,
             |  COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS shard_tokens
             |FROM c GROUP BY source, shard_id ORDER BY source, shard_id""".stripMargin)),

    Q("doc_pack_sequences", // EXACT next-fit context packing: unlike the
      // cumulative-offset shards above, no sequence exceeds the 256-token
      // budget (oversize docs ride alone). Sequential per-group scan via
      // one repartition + sortWithinPartitions + O(1)-state mapPartitions;
      // the oracle replays the same carried-dependency scan as a
      // recursive CTE stepping one row per group per iteration.
      (s, d) => graft.operators.Retrieval
        .packSequences(t(s, d, "documents"), budget = 256)
        .orderBy("lang", "doc_id"),
      Some("""WITH RECURSIVE ord AS (
             |  SELECT lang, doc_id,
             |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok,
             |    row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
             |  FROM documents
             |), rec AS (
             |  SELECT lang, doc_id, n_tok, rn,
             |    CAST(0 AS BIGINT) AS seq_id, n_tok AS seq_fill
             |  FROM ord WHERE rn = 1
             |  UNION ALL
             |  SELECT o.lang, o.doc_id, o.n_tok, o.rn,
             |    CASE WHEN r.seq_fill + o.n_tok > 256
             |         THEN r.seq_id + 1 ELSE r.seq_id END,
             |    CASE WHEN r.seq_fill + o.n_tok > 256
             |         THEN o.n_tok ELSE r.seq_fill + o.n_tok END
             |  FROM rec r JOIN ord o ON o.lang = r.lang AND o.rn = r.rn + 1
             |)
             |SELECT lang, doc_id, n_tok, seq_id, seq_fill
             |FROM rec ORDER BY lang, doc_id""".stripMargin)),

    Q("doc_length_batches", // padded-tensor batching report: docs bucket
      // by 32-token length bands, batch in id order within the band, pad
      // to the batch max — pad_waste is the fraction of padded compute a
      // naive batcher would burn, per band. Window + two aggregations.
      (s, d) => graft.operators.Retrieval
        .lengthBucketBatches(t(s, d, "documents"))
        .groupBy("bucket", "batch_id")
        .agg(count(lit(1)).as("n_docs"), max("n_tok").as("mx"),
          sum("n_tok").as("real"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_batches"),
          sum("n_docs").as("n_docs"),
          sum("real").as("real_tokens"),
          sum(col("n_docs") * col("mx")).as("padded_tokens"),
          round(lit(1.0) - sum("real") / sum(col("n_docs") * col("mx")), 4)
            .as("pad_waste"))
        .orderBy("bucket"),
      Some("""WITH tok AS (
             |  SELECT doc_id,
             |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok
             |  FROM documents
             |), b AS (
             |  SELECT doc_id, n_tok, CAST(n_tok // 32 AS INT) AS bucket FROM tok
             |), r AS (
             |  SELECT bucket, n_tok,
             |    (row_number() OVER (PARTITION BY bucket ORDER BY doc_id) - 1) // 8
             |      AS batch_id
             |  FROM b
             |), g AS (
             |  SELECT bucket, batch_id, COUNT(*) AS n_docs, MAX(n_tok) AS mx,
             |    SUM(n_tok) AS real FROM r GROUP BY bucket, batch_id
             |)
             |SELECT bucket, COUNT(*) AS n_batches,
             |  CAST(SUM(n_docs) AS BIGINT) AS n_docs,
             |  CAST(SUM(real) AS BIGINT) AS real_tokens,
             |  CAST(SUM(n_docs * mx) AS BIGINT) AS padded_tokens,
             |  ROUND(1.0 - CAST(SUM(real) AS DOUBLE) / SUM(n_docs * mx), 4)
             |    AS pad_waste
             |FROM g GROUP BY bucket ORDER BY bucket""".stripMargin)),

    Q("doc_quality_percentile", // per-language quality gate: keep the top
      // half by quality percentile WITHIN each language — absolute-score
      // cuts starve low-resource languages; the window sorts per lang
      (s, d) => {
        val w = Window.partitionBy(col("lang"))
          .orderBy(col("quality").desc, col("doc_id"))
        t(s, d, "documents")
          .select(col("doc_id"), col("lang"),
            TextAnalysis.tokenCount(col("text")).as("n_tok"),
            TextAnalysis.punctRatio(col("text")).as("pr"),
            TextAnalysis.stopwordRatio(col("text")).as("sr"),
            TextAnalysis.meanTokenLen(col("text")).as("mtl"))
          .select(col("doc_id"), col("lang"),
            TextAnalysis.qualityFrom(col("n_tok"), col("pr"), col("sr"),
              col("mtl")).as("quality"))
          .withColumn("prank", round(percent_rank().over(w), 6))
          .filter(col("prank") <= 0.5)
          .orderBy("lang", "prank", "doc_id")
      },
      Some("""WITH f AS (
             |  SELECT doc_id, lang, text,
             |    string_split_regex(lower(trim(text)), '\s+') AS toks,
             |    len(string_split_regex(trim(text), '\s+')) AS n
             |  FROM documents
             |), m AS (
             |  SELECT doc_id, lang, n,
             |    CASE WHEN length(text) = 0 THEN 0.0
             |      ELSE CAST(length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g')) AS DOUBLE) / length(text) END AS pr,
             |    CASE WHEN n = 0 THEN 0.0
             |      ELSE CAST(len(list_filter(toks, t -> list_contains(['the','a','of','and','to','in','is','it','that','for'], t))) AS DOUBLE) / n END AS sr,
             |    CASE WHEN n = 0 THEN 0.0
             |      ELSE CAST(list_aggregate(list_transform(string_split_regex(trim(text), '\s+'), t -> length(t)), 'sum') AS DOUBLE) / n END AS mtl
             |  FROM f
             |), sc AS (
             |  SELECT doc_id, lang,
             |    ROUND(((CASE WHEN n BETWEEN 5 AND 10000 THEN 1.0 ELSE 0.0 END)
             |      + (CASE WHEN pr < 0.2 THEN 1.0 ELSE 0.0 END)
             |      + (CASE WHEN sr > 0.01 THEN 1.0 ELSE 0.0 END)
             |      + (CASE WHEN mtl BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END)) / 4.0, 2) AS quality
             |  FROM m
             |)
             |SELECT doc_id, lang, quality,
             |  ROUND(percent_rank() OVER (PARTITION BY lang ORDER BY quality DESC, doc_id), 6) AS prank
             |FROM sc QUALIFY prank <= 0.5 ORDER BY lang, prank, doc_id""".stripMargin)),

    Q("cust_fuzzy_pairs", // entity resolution: bounded-Levenshtein name
      // pairs (threshold-bounded levenshtein abandons a pair at k+1, so
      // cost is O(k·len) per pair, not O(len²)) within a DISCRIMINATIVE
      // composite block: nation × all-but-the-last-2-chars of the name
      // (a positional q-gram key). The plain nation block — the r6
      // declaration — degenerates as the corpus grows (every name shares
      // a constant prefix, so blocks grow linearly and in-block pairs
      // quadratically: 21.7× wall at the 10× probe); this key is the one
      // cust_blocking_quality's own report picks (max_block ≤ ~100 at
      // ANY scale vs corpus/25 for nation), and bounds the pair budget
      // to n·occupancy/2. Candidate recall is the standard blocking
      // trade: pairs differing only in their last 2 chars (the
      // edit-cluster structure of this corpus) are all kept. The 10000
      // per-block id cap stays as the structural guard, mirrored in the
      // oracle.
      (s, d) => Dedup.editDistancePairs(
          t(s, d, "customer").withColumn("blk_key", concat_ws("|",
            col("c_nationkey"),
            expr("substring(c_name, 1, length(c_name) - 2)"))),
          blockCol = "blk_key",
          strCol = "c_name", idCol = "c_custkey", maxDist = 2)
        .groupBy(substring_index(col("blk"), "|", 1).cast("bigint")
          .as("nationkey"))
        .agg(count(lit(1)).as("n_pairs"), min(col("dist")).as("min_dist"))
        .orderBy("nationkey"),
      Some("""WITH c AS (
             |  SELECT c_nationkey, c_custkey, c_name,
             |    row_number() OVER (
             |      PARTITION BY c_nationkey, substr(c_name, 1, length(c_name) - 2)
             |      ORDER BY c_custkey) AS rn
             |  FROM customer)
             |SELECT a.c_nationkey AS nationkey, COUNT(*) AS n_pairs,
             |MIN(levenshtein(a.c_name, b.c_name)) AS min_dist
             |FROM c a JOIN c b
             |ON a.c_nationkey = b.c_nationkey
             |AND substr(a.c_name, 1, length(a.c_name) - 2)
             |  = substr(b.c_name, 1, length(b.c_name) - 2)
             |AND a.c_custkey < b.c_custkey
             |WHERE a.rn <= 10000 AND b.rn <= 10000
             |AND levenshtein(a.c_name, b.c_name) <= 2
             |GROUP BY a.c_nationkey ORDER BY nationkey""".stripMargin)),

    Q("doc_hybrid_rrf", // hybrid retrieval: BM25 ∪ vector candidates fused
      // by reciprocal rank (ranks over ROUNDED scores = the cross-engine
      // FP equivalence class; both lists capped before the merge)
      (s, d) => {
        val e = t(s, d, "embeddings")
        val probe = e.filter(col("vec_id") === 0).take(1)
        require(probe.nonEmpty, s"probe vector vec_id=0 not found in $d/embeddings")
        val qv = probe.head.getSeq[Float](e.schema.fieldIndex("embedding")).map(_.toDouble)
        graft.operators.Retrieval
          .hybridRrf(t(s, d, "documents"), e, Seq("spark", "join", "window"), qv)
          .limit(20)
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents
             |), m AS (
             |  SELECT doc_id, len(toks) AS dl,
             |    unnest(list_filter(toks, t -> list_contains(['spark','join','window'], t))) AS term
             |  FROM tok
             |), tf AS (SELECT doc_id, dl, term, COUNT(*) AS tf FROM m GROUP BY 1, 2, 3
             |), dft AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY 1
             |), stats AS (SELECT COUNT(*) AS n, AVG(len(toks)) AS avgdl FROM tok
             |), bm AS (
             |  SELECT doc_id, ROUND(SUM(ln((n - df + 0.5) / (df + 0.5) + 1.0)
             |    * (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))), 4) AS score
             |  FROM tf JOIN dft USING (term) CROSS JOIN stats GROUP BY doc_id
             |), bmr AS (
             |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r FROM bm
             |  QUALIFY r <= 100
             |), q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0
             |), cos AS (
             |  SELECT vec_id AS doc_id, ROUND(list_cosine_similarity(embedding, qv), 6) AS cs
             |  FROM embeddings, q
             |), cosr AS (
             |  SELECT doc_id, row_number() OVER (ORDER BY cs DESC, doc_id) AS r FROM cos
             |  QUALIFY r <= 100
             |)
             |SELECT doc_id,
             |  ROUND(COALESCE(1.0 / (60 + bmr.r), 0) + COALESCE(1.0 / (60 + cosr.r), 0), 6) AS rrf
             |FROM bmr FULL JOIN cosr USING (doc_id)
             |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin)),

    Q("doc_chunks", // RAG chunking: overlapping 32-token windows, stride 24
      (s, d) => graft.operators.Retrieval
        .chunk(t(s, d, "documents"), chunkSize = 32, stride = 24)
        .orderBy("doc_id", "chunk_id"),
      Some("""WITH tok AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
             |  FROM documents
             |), st AS (
             |  SELECT doc_id, toks, unnest(range(0, len(toks), 24)) AS s
             |  FROM tok
             |)
             |SELECT doc_id, CAST(s / 24 AS INT) AS chunk_id,
             |  len(list_slice(toks, s + 1, s + 32)) AS chunk_tokens,
             |  array_to_string(list_slice(toks, s + 1, s + 32), ' ') AS chunk
             |FROM st ORDER BY doc_id, chunk_id""".stripMargin)))

  // §2.11 — embeddings: similarity search (brute-force baseline + ANN paths).
  /** DuckDB oracle SQL for the LSH paths. The random hyperplanes are
    * DETERMINISTIC (fixed seed, [[Similarity.hyperplanes]]), so the oracle
    * can inline them as literal lists and recompute the exact same bucket
    * ids — the pruned ANN path itself becomes oracle-checkable instead of
    * falling back to a rows-only check. Sign decisions compare a
    * sequential double dot product in both engines; a flip would need
    * |dot| at float-noise level (~1e-15), which random gaussian planes
    * make vanishingly unlikely.
    */
  private object LshOracle {
    private val planes = Similarity.hyperplanes(64, 8, 42L)
    /** `(CASE WHEN dot(v, plane_i) >= 0 THEN 2^i ELSE 0 END) + ...` —
      * an nPlanes < 8 prefix shares the same RNG stream, so fewer-plane
      * operators (e.g. embeddingNearDups at 4) inline a prefix of the
      * same constants.
      */
    def bucketSql(vecExpr: String, nPlanes: Int = 8): String =
      planes.take(nPlanes).zipWithIndex.map { case (p, i) =>
        s"(CASE WHEN list_dot_product($vecExpr, ${p.mkString("[", ",", "]")}) >= 0.0 THEN ${1L << i} ELSE 0 END)"
      }.mkString("(", " + ", ")")
    /** bucket ∪ its 8 Hamming-1 neighbors (the multi-probe set). */
    val probeMasks: String = "[0,1,2,4,8,16,32,64,128]"

    /** Probe-pruned cosine top-10 vs vec_id 0 — shared by the filter-form
      * (`emb_lsh_topk`) and the partition-pruned index form
      * (`emb_lsh_topk_indexed`): identical semantics, different I/O shape.
      */
    val lshTopKSql: String =
      s"""WITH e AS (SELECT vec_id,
         |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings),
         |q AS (SELECT emb AS qv, ${bucketSql("emb")} AS qb FROM e WHERE vec_id = 0),
         |probes AS (SELECT DISTINCT xor(qb, t.m) AS b
         |  FROM q, unnest($probeMasks) AS t(m))
         |SELECT vec_id, ROUND(list_cosine_similarity(emb, qv), 6) AS cos
         |FROM e, q WHERE vec_id <> 0
         |  AND ${bucketSql("emb")} IN (SELECT b FROM probes)
         |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin
  }

  private def embQueries: Seq[Q] = Seq(
    Q("emb_cosine_topk", // brute-force exact top-k vs vec_id 0: the probe
      // vector is a one-row lookup, fetched driver-side and inlined as a
      // literal — a single codegen'd scan (a broadcast cross join with the
      // one-row frame kept the scan inside a nested-loop join, outside
      // whole-stage codegen)
      (s, d) => {
        val e = t(s, d, "embeddings")
        val probe = e.filter(col("vec_id") === 0).take(1)
        require(probe.nonEmpty, s"probe vector vec_id=0 not found in $d/embeddings")
        val qv = probe.head.getSeq[Float](e.schema.fieldIndex("embedding")).map(_.toDouble)
        Similarity.bruteForceTopK(e.filter(col("vec_id") =!= 0), qv, 10)
      },
      Some("""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
             |SELECT vec_id, ROUND(list_cosine_similarity(embedding, qv), 6) AS cos
             |FROM embeddings, q WHERE vec_id <> 0
             |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin)),

    Q("emb_mmr_rerank", // Maximal-Marginal-Relevance diversified top-k
      // (Carbonell & Goldstein 1998): the retrieval side prunes to 20
      // candidates DISTRIBUTED (same brute-force scan as
      // emb_cosine_topk); only then does the inherently-sequential
      // greedy run — single task, 20 rows, O(k²) state — the
      // prune-distributed / finish-bounded split that keeps MMR viable
      // at any corpus size. Every cosine and every marginal score is
      // rounded to 6 with vec_id tie-breaks, so the DuckDB recursive-CTE
      // replay picks the identical sequence.
      (s, d) => {
        import s.implicits._
        val e = t(s, d, "embeddings")
        val probe = e.filter(col("vec_id") === 0).take(1)
        require(probe.nonEmpty, s"probe vector vec_id=0 not found in $d/embeddings")
        val qv = probe.head.getSeq[Float](e.schema.fieldIndex("embedding")).map(_.toDouble)
        val cand = Similarity
          .bruteForceTopK(e.filter(col("vec_id") =!= 0), qv, 20)
          .join(e.select(col("vec_id"),
            col("embedding").cast("array<double>").as("emb")), Seq("vec_id"))
          .select(col("vec_id"), col("cos"), col("emb"))
          .as[(Long, Double, Seq[Double])]
        def r6(x: Double): Double =
          BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        def cos(a: Seq[Double], b: Seq[Double]): Double = {
          var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
          while (i < a.length) {
            dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
          }
          dot / (math.sqrt(na) * math.sqrt(nb))
        }
        cand.coalesce(1)
          .sortWithinPartitions(col("cos").desc, col("vec_id"))
          .mapPartitions { it =>
            val cs = it.toArray
            if (cs.isEmpty) Iterator.empty
            else {
              val picked = scala.collection.mutable.ArrayBuffer(cs.head)
              val rest = scala.collection.mutable.ArrayBuffer(cs.tail: _*)
              while (picked.size < 5 && rest.nonEmpty) {
                // argmax of round6(λ·rel − (1−λ)·max-sim-to-picked),
                // ties to the smallest vec_id (rest stays vec_id-sorted
                // after removals since strict > keeps the first winner)
                val scored = rest.sortBy(_._1).map { c =>
                  val red = picked.map(p => r6(cos(c._3, p._3))).max
                  (c, r6(0.5 * c._2 - 0.5 * red))
                }
                val best = scored.maxBy(_._2)(Ordering.Double.TotalOrdering)
                picked += best._1
                rest -= best._1
              }
              picked.iterator.zipWithIndex.map { case (c, i) =>
                (i + 1, c._1, c._2)
              }
            }
          }.toDF("rank", "vec_id", "rel")
      },
      Some("""WITH RECURSIVE q AS (
             |  SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
             |cand AS (
             |  SELECT vec_id, embedding,
             |    ROUND(list_cosine_similarity(embedding, qv), 6) AS rel
             |  FROM embeddings, q WHERE vec_id <> 0
             |  ORDER BY rel DESC, vec_id LIMIT 20),
             |pair AS (
             |  SELECT a.vec_id AS ai, b.vec_id AS bi,
             |    ROUND(list_cosine_similarity(a.embedding, b.embedding), 6)
             |      AS sim
             |  FROM cand a, cand b WHERE a.vec_id <> b.vec_id),
             |g(step, picked) AS (
             |  SELECT 1, [(SELECT vec_id FROM cand
             |    ORDER BY rel DESC, vec_id LIMIT 1)]
             |  UNION ALL
             |  SELECT step + 1, list_append(picked, (
             |    SELECT c.vec_id FROM cand c
             |    WHERE NOT list_contains(picked, c.vec_id)
             |    ORDER BY ROUND(0.5 * c.rel - 0.5 * (
             |        SELECT MAX(p.sim) FROM pair p
             |        WHERE p.ai = c.vec_id
             |          AND list_contains(picked, p.bi)), 6) DESC,
             |      c.vec_id
             |    LIMIT 1))
             |  FROM g WHERE step < 5),
             |fin AS (SELECT picked FROM g WHERE step = 5)
             |SELECT list_position(picked, c.vec_id) AS rank, c.vec_id, c.rel
             |FROM fin, cand c WHERE list_contains(picked, c.vec_id)
             |ORDER BY rank""".stripMargin)),

    Q("emb_centroids", // per-label mean vectors, flattened (IVF lists)
      (s, d) => Similarity.centroids(t(s, d, "embeddings"))
        .select(col("cluster").as("label"),
          posexplode(col("centroid")).as(Seq("dim0", "x")))
        .select(col("label"), (col("dim0") + 1).as("dim"), round(col("x"), 6).as("mean_x"))
        .orderBy("label", "dim"),
      Some("""SELECT label, CAST(i AS INT) AS dim,
             |ROUND(AVG(CAST(embedding[i] AS DOUBLE)), 6) AS mean_x
             |FROM embeddings, range(1, 65) t(i)
             |GROUP BY label, i ORDER BY label, dim""".stripMargin)),

    Q("emb_norms", // vector math smoke: L2 norms
      (s, d) => t(s, d, "embeddings")
        .select(col("vec_id"),
          round(VectorFunctions.l2Norm(col("embedding")), 6).as("l2"))
        .orderBy("vec_id").limit(100),
      Some("""SELECT vec_id,
             |ROUND(sqrt(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')), 6) AS l2
             |FROM embeddings ORDER BY vec_id LIMIT 100""".stripMargin)),

    Q("emb_mahalanobis_ood", // out-of-distribution screen: squared
      // Mahalanobis distance to the corpus under a DIAGONAL covariance
      // (the production OOD gate when the full 64×64 inverse is
      // overkill) — per-dim μ/σ² from one exploded aggregation
      // (rounded to 6dp, the model-state rounding contract), then each
      // vector scores Σ(x−μ)²/σ² through a dim-keyed join against the
      // 64-row stats table. Top-10 outliers; ranking runs on the raw
      // score (vector gaps dwarf float-sum slack), output rounds.
      (s, d) => {
        val ex = t(s, d, "embeddings")
          .select(col("vec_id"), posexplode(col("embedding"))
            .as(Seq("d0", "x0")))
          .select(col("vec_id"), (col("d0") + 1).as("dim"),
            col("x0").cast("double").as("x"))
          .localCheckpoint(eager = false) // stats pass + scoring pass
        val st = ex.groupBy("dim").agg(round(avg("x"), 6).as("mu"),
          round(avg(col("x") * col("x")) - avg("x") * avg("x"), 6).as("v"))
        ex.join(st, Seq("dim"))
          .groupBy("vec_id")
          .agg(sum((col("x") - col("mu")) * (col("x") - col("mu"))
            / col("v")).as("m2"))
          .orderBy(col("m2").desc, col("vec_id")).limit(10)
          .select(col("vec_id"), round(col("m2"), 6).as("mahalanobis_sq"))
      },
      Some("""WITH ex AS (
             |  SELECT vec_id, i AS dim, CAST(embedding[i] AS DOUBLE) AS x
             |  FROM embeddings, range(1, 65) t(i)),
             |st AS (SELECT dim, ROUND(AVG(x), 6) AS mu,
             |    ROUND(AVG(x * x) - AVG(x) * AVG(x), 6) AS v
             |  FROM ex GROUP BY 1),
             |sc AS (SELECT vec_id, SUM((x - mu) * (x - mu) / v) AS m2
             |  FROM ex JOIN st USING (dim) GROUP BY 1)
             |SELECT vec_id, ROUND(m2, 6) AS mahalanobis_sq
             |FROM sc ORDER BY m2 DESC, vec_id LIMIT 10""".stripMargin)),

    Q("emb_quantize_err", // int8 symmetric quantization (4× memory, the
      // standard serving compression): per-vector scale 127/max|x|,
      // round-trip through the int grid, cosine error vs the original —
      // all per-row expression work, no shuffle
      (s, d) => {
        val absd = transform(col("embedding"), x => abs(x.cast("double")))
        val scale = lit(127.0) / greatest(array_max(absd), lit(1e-12))
        t(s, d, "embeddings")
          .withColumn("scale", scale)
          .withColumn("deq",
            transform(col("embedding"),
              x => round(x.cast("double") * col("scale")) / col("scale")))
          .select(col("vec_id"),
            round(lit(1.0) - VectorFunctions.cosine(col("embedding"), col("deq")), 8)
              .as("cos_err"))
          .orderBy("vec_id").limit(100)
      },
      Some("""WITH s AS (
             |  SELECT vec_id, embedding,
             |    127.0 / greatest(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))), 1e-12) AS scale
             |  FROM embeddings
             |), q AS (
             |  SELECT vec_id, embedding,
             |    list_transform(embedding, x -> round(CAST(x AS DOUBLE) * scale) / scale) AS deq
             |  FROM s
             |)
             |SELECT vec_id,
             |  ROUND(1.0 - list_cosine_similarity(list_transform(embedding, x -> CAST(x AS DOUBLE)), deq), 8) AS cos_err
             |FROM q ORDER BY vec_id LIMIT 100""".stripMargin)),

    // ANN paths: hyperplanes/centroids are deterministic, so the PRUNED
    // probe paths are oracle-checked exactly (LshOracle inlines the plane
    // constants); recall-vs-brute-force additionally pinned in ScalaTest.
    Q("emb_lsh_topk",
      (s, d) => {
        val e = t(s, d, "embeddings")
        val qv = e.filter(col("vec_id") === 0).select("embedding")
          .head().getSeq[Float](0).map(_.toDouble)
        Similarity.lshTopK(e.filter(col("vec_id") =!= 0), qv, 10)
      },
      Some(LshOracle.lshTopKSql)),

    Q("emb_matryoshka_recall", // prefix-dimension retrieval eval: recall
      // of the top-10 by 16/32/48-dim prefix cosine against the full
      // 64-dim ranking — the acceptance gate before serving truncated
      // embeddings at a fraction of the index bytes. One scan scores
      // every prefix; ranks break ties on the rounded cosine then id.
      (s, d) => {
        val e = t(s, d, "embeddings")
        val qv = e.filter(col("vec_id") === 0).select("embedding")
          .head().getSeq[Float](0).map(_.toDouble)
        Similarity.matryoshkaRecall(e.filter(col("vec_id") =!= 0), qv, 10,
          Seq(16, 32, 48, 64))
      },
      Some("""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
             |dims AS (SELECT unnest([16, 32, 48, 64]) AS pd),
             |scored AS (
             |  SELECT pd, vec_id,
             |    ROUND(list_cosine_similarity(embedding[1:pd], qv[1:pd]), 6) AS cos
             |  FROM embeddings, q, dims WHERE vec_id <> 0),
             |top AS (
             |  SELECT pd, vec_id,
             |    ROW_NUMBER() OVER (PARTITION BY pd ORDER BY cos DESC, vec_id) AS rn
             |  FROM scored),
             |tk AS (SELECT pd, vec_id FROM top WHERE rn <= 10),
             |f AS (SELECT vec_id FROM tk WHERE pd = 64)
             |SELECT pd AS dim,
             |  CAST(SUM(CASE WHEN vec_id IN (SELECT vec_id FROM f)
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
             |  ROUND(SUM(CASE WHEN vec_id IN (SELECT vec_id FROM f)
             |    THEN 1 ELSE 0 END) / 10.0, 2) AS recall
             |FROM tk GROUP BY pd ORDER BY dim""".stripMargin)),

    Q("emb_drift_report", // distribution-shift monitor between two corpus
      // cohorts (vec_id parity stands in for yesterday/today snapshots):
      // per-dimension mean shift, top-10 drifting dimensions. One
      // posexplode + one (cohort, dim)-keyed aggregation — the shape that
      // monitors a 100 TB embedding store without ever joining vectors.
      (s, d) => t(s, d, "embeddings")
        .select(when(pmod(col("vec_id"), lit(2)) === 0, "a").otherwise("b").as("cohort"),
          posexplode(col("embedding")).as(Seq("dim", "x")))
        .groupBy("dim")
        .agg(
          avg(when(col("cohort") === "a", col("x"))).as("mean_a"),
          avg(when(col("cohort") === "b", col("x"))).as("mean_b"))
        .select(col("dim"), round(col("mean_a"), 6).as("mean_a"),
          round(col("mean_b"), 6).as("mean_b"),
          round(abs(col("mean_a") - col("mean_b")), 6).as("abs_shift"))
        .orderBy(col("abs_shift").desc, col("dim")).limit(10),
      Some("""WITH x AS (
             |  SELECT CASE WHEN vec_id % 2 = 0 THEN 'a' ELSE 'b' END AS cohort,
             |    t.dim - 1 AS dim, CAST(embedding[t.dim] AS DOUBLE) AS x
             |  FROM embeddings, range(1, 65) AS t(dim)
             |), m AS (
             |  SELECT dim,
             |    AVG(CASE WHEN cohort = 'a' THEN x END) AS mean_a,
             |    AVG(CASE WHEN cohort = 'b' THEN x END) AS mean_b
             |  FROM x GROUP BY dim
             |)
             |SELECT dim, ROUND(mean_a, 6) AS mean_a, ROUND(mean_b, 6) AS mean_b,
             |  ROUND(ABS(mean_a - mean_b), 6) AS abs_shift
             |FROM m ORDER BY abs_shift DESC, dim LIMIT 10""".stripMargin)),

    Q("emb_lsh_topk_indexed", // the same probe through a PERSISTED
      // LSH-bucketed layout: Hive-partitioned by bucket id, so the probe
      // set prunes directories (PartitionFilters) instead of filtering a
      // full scan — the index form ANN needs at 100 TB. Written once
      // (warmup pass), read-only when timed; pruning plan-pinned in
      // PlanQualitySpec.
      (s, d) => {
        val e = t(s, d, "embeddings")
        val path = s"/tmp/graft_lsh_idx_${new java.io.File(d).getName}"
        // the searched corpus excludes the probe row, same as emb_lsh_topk
        if (!new java.io.File(path, "_SUCCESS").exists())
          Similarity.writeLshIndex(e.filter(col("vec_id") =!= 0), path)
        val qv = e.filter(col("vec_id") === 0).select("embedding")
          .head().getSeq[Float](0).map(_.toDouble)
        Similarity.lshTopKIndexed(s, path, qv, 10)
      },
      Some(LshOracle.lshTopKSql)),

    Q("emb_ivf_topk",
      (s, d) => {
        val e = t(s, d, "embeddings")
        val qv = e.filter(col("vec_id") === 0).select("embedding")
          .head().getSeq[Float](0).map(_.toDouble)
        Similarity.ivfTopK(e.filter(col("vec_id") =!= 0), qv, 10, nProbe = 3)
      },
      // per-label mean centroids and the 3-nearest-list probe are exact
      // relational computations — reproduced verbatim in SQL
      Some("""WITH el AS (SELECT label, vec_id,
             |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
             |  FROM embeddings WHERE vec_id <> 0),
             |q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
             |  FROM embeddings WHERE vec_id = 0),
             |cd AS (SELECT label, t.dim, AVG(emb[t.dim]) AS m
             |  FROM el, range(1, 65) AS t(dim) GROUP BY label, t.dim),
             |cent AS (SELECT label, list(m ORDER BY dim) AS centroid FROM cd GROUP BY label),
             |near AS (SELECT cent.label FROM cent, q
             |  ORDER BY list_cosine_similarity(centroid, qv) DESC, cent.label LIMIT 3)
             |SELECT vec_id, ROUND(list_cosine_similarity(emb, qv), 6) AS cos
             |FROM el, q WHERE el.label IN (SELECT label FROM near)
             |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin)),

    Q("emb_cluster_nmi", // EXTERNAL clustering eval: purity + NMI of
      // the deterministic-Lloyd partition against the ground-truth
      // label column — the recover-the-real-structure report the
      // internal metrics (silhouette, Davies–Bouldin) can't give. One
      // assignment pass collapses to the ≤ k×|labels| contingency
      // grain; everything downstream is tiny aggregations over it.
      // The oracle RE-TRAINS the same 3 Lloyd rounds in SQL (the
      // lloyd-IVF builders, over the full corpus) and recomputes the
      // identical information terms.
      (s, d) => Similarity.lloydClusterEval(t(s, d, "embeddings")),
      Some {
        def assign(src: String, cents: String, out: String): String =
          s"""$out AS (SELECT vec_id, v, cl FROM (
             |  SELECT $src.vec_id AS vec_id, $src.v AS v, $cents.cl AS cl,
             |    row_number() OVER (PARTITION BY $src.vec_id
             |      ORDER BY list_sum(list_transform(range(1, 65),
             |        i -> ($src.v[i] - $cents.c[i]) * ($src.v[i] - $cents.c[i]))),
             |        $cents.cl) AS rn
             |  FROM $src, $cents) WHERE rn = 1)""".stripMargin
        def rnd(prev: String, cur: String): String =
          s"""${assign("e", prev, s"a$cur")},
             |m$cur AS (SELECT cl, t.dim, AVG(v[t.dim]) AS m
             |  FROM a$cur, range(1, 65) AS t(dim) GROUP BY cl, t.dim),
             |n$cur AS (SELECT cl, list(m ORDER BY dim) AS c FROM m$cur GROUP BY cl),
             |$cur AS (SELECT $prev.cl, COALESCE(n$cur.c, $prev.c) AS c
             |  FROM $prev LEFT JOIN n$cur ON $prev.cl = n$cur.cl)""".stripMargin
        s"""WITH e AS (SELECT vec_id,
           |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v, label
           |  FROM embeddings),
           |c0 AS (SELECT (row_number() OVER (ORDER BY vec_id)) - 1 AS cl, v AS c
           |  FROM e ORDER BY vec_id LIMIT 8),
           |${rnd("c0", "c1")},
           |${rnd("c1", "c2")},
           |${rnd("c2", "c3")},
           |${assign("e", "c3", "af")},
           |ct AS (SELECT af.cl, e.label AS lbl, COUNT(*) AS n
           |  FROM af JOIN e ON af.vec_id = e.vec_id GROUP BY 1, 2),
           |nt AS (SELECT CAST(SUM(n) AS BIGINT) AS ni FROM ct),
           |rt AS (SELECT cl, CAST(SUM(n) AS BIGINT) AS a FROM ct GROUP BY 1),
           |lt AS (SELECT lbl, CAST(SUM(n) AS BIGINT) AS b FROM ct GROUP BY 1),
           |iv AS (SELECT SUM((CAST(n AS DOUBLE) / (SELECT ni FROM nt))
           |    * ln(CAST(n * (SELECT ni FROM nt) AS DOUBLE) / (a * b))) AS i
           |  FROM ct JOIN rt USING (cl) JOIN lt USING (lbl)),
           |hc AS (SELECT -SUM((CAST(a AS DOUBLE) / (SELECT ni FROM nt))
           |    * ln(CAST(a AS DOUBLE) / (SELECT ni FROM nt))) AS h FROM rt),
           |hl AS (SELECT -SUM((CAST(b AS DOUBLE) / (SELECT ni FROM nt))
           |    * ln(CAST(b AS DOUBLE) / (SELECT ni FROM nt))) AS h FROM lt),
           |pu AS (SELECT CAST(SUM(m) AS DOUBLE) / (SELECT ni FROM nt) AS p
           |  FROM (SELECT cl, MAX(n) AS m FROM ct GROUP BY 1))
           |SELECT (SELECT ni FROM nt) AS n_vecs,
           |  (SELECT COUNT(*) FROM rt) AS n_clusters_used,
           |  ROUND((SELECT p FROM pu), 6) AS purity,
           |  ROUND(2.0 * (SELECT i FROM iv)
           |    / ((SELECT h FROM hc) + (SELECT h FROM hl)), 6) AS nmi""".stripMargin
      }),

    Q("emb_lloyd_ivf_topk", // IVF over DETERMINISTIC Lloyd-learned
      // inverted lists: fixed init (lowest-id vectors), total-order
      // tie-breaks, 3 rounds — the trained index is a pure function of
      // the data, so the oracle re-trains it round by round in SQL and
      // must land on the identical probe. The seeded-MLlib twin below
      // keeps the production index-build shape.
      (s, d) => {
        val e = t(s, d, "embeddings")
        val qv = e.filter(col("vec_id") === 0).select("embedding")
          .head().getSeq[Float](0).map(_.toDouble)
        Similarity.lloydIvfTopK(e.filter(col("vec_id") =!= 0), qv, 10)
      },
      Some {
        def assign(src: String, cents: String, out: String): String =
          s"""$out AS (SELECT vec_id, v, cl FROM (
             |  SELECT $src.vec_id AS vec_id, $src.v AS v, $cents.cl AS cl,
             |    row_number() OVER (PARTITION BY $src.vec_id
             |      ORDER BY list_sum(list_transform(range(1, 65),
             |        i -> ($src.v[i] - $cents.c[i]) * ($src.v[i] - $cents.c[i]))),
             |        $cents.cl) AS rn
             |  FROM $src, $cents) WHERE rn = 1)""".stripMargin
        def round(prev: String, cur: String): String =
          s"""${assign("e", prev, s"a$cur")},
             |m$cur AS (SELECT cl, t.dim, AVG(v[t.dim]) AS m
             |  FROM a$cur, range(1, 65) AS t(dim) GROUP BY cl, t.dim),
             |n$cur AS (SELECT cl, list(m ORDER BY dim) AS c FROM m$cur GROUP BY cl),
             |$cur AS (SELECT $prev.cl, COALESCE(n$cur.c, $prev.c) AS c
             |  FROM $prev LEFT JOIN n$cur ON $prev.cl = n$cur.cl)""".stripMargin
        s"""WITH e AS (SELECT vec_id,
           |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           |  FROM embeddings WHERE vec_id <> 0),
           |q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
           |  FROM embeddings WHERE vec_id = 0),
           |c0 AS (SELECT (row_number() OVER (ORDER BY vec_id)) - 1 AS cl, v AS c
           |  FROM e ORDER BY vec_id LIMIT 8),
           |${round("c0", "c1")},
           |${round("c1", "c2")},
           |${round("c2", "c3")},
           |near AS (SELECT cl FROM c3, q
           |  ORDER BY list_cosine_similarity(c, qv) DESC, cl LIMIT 3),
           |${assign("e", "c3", "af")}
           |SELECT vec_id, ROUND(list_cosine_similarity(v, qv), 6) AS cos
           |FROM af, q WHERE cl IN (SELECT cl FROM near)
           |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin
      }),

    Q("emb_kmeans_ivf_topk", // IVF over MLlib-KMeans-learned inverted
      // lists (seeded) — the production index-build shape; recall and the
      // full-probe == exact identity are pinned in SimilaritySpec. The
      // oracle is attached lazily (kmeansIvfOracleSql): the seeded model
      // is deterministic, so its 8 learned centers are inlined as SQL
      // literals and everything downstream of the model replays in SQL.
      (s, d) => {
        val e = t(s, d, "embeddings")
        val qv = e.filter(col("vec_id") === 0).select("embedding")
          .head().getSeq[Float](0).map(_.toDouble)
        Similarity.kmeansIvfTopK(e.filter(col("vec_id") =!= 0), qv, 10,
          numClusters = 8, nProbe = 3)
      },
      None),

    Q("emb_pq_error", // product quantization: 64 floats → 4 codes; the
      // per-label reconstruction MSE summarizes codebook quality. The
      // codebooks train with the DETERMINISTIC Lloyd loop (fixed init,
      // total-order tie-breaks), so the oracle RE-TRAINS all four
      // sub-codebooks in SQL and reproduces every code and error; the
      // seeded-MLlib trainer stays pinned in SimilaritySpec.
      (s, d) => Similarity.pqTrainEncodeLloyd(t(s, d, "embeddings"))
        .join(t(s, d, "embeddings").select("vec_id", "label"), Seq("vec_id"))
        .groupBy("label")
        .agg(count(lit(1)).as("n"), round(avg("mse"), 6).as("avg_mse"))
        .orderBy("label"),
      Some {
        val subDim = 16
        def sub(i: Int): String = {
          val lo = i * subDim + 1; val hi = (i + 1) * subDim
          def dist(s: String, p: String) =
            s"list_sum(list_transform(range(1, 17), t -> ($s.sv[t] - $p.c[t]) * ($s.sv[t] - $p.c[t])))"
          def round(r: Int): String = {
            val prev = s"s${i}c${r - 1}"
            s"""s${i}a$r AS (SELECT vec_id, sv, cl FROM (
               |  SELECT s.vec_id AS vec_id, s.sv AS sv, p.cl AS cl,
               |    row_number() OVER (PARTITION BY s.vec_id
               |      ORDER BY ${dist("s", "p")}, p.cl) AS rn
               |  FROM sub$i s, $prev p) WHERE rn = 1),
               |s${i}m$r AS (SELECT cl, t.dim, AVG(sv[t.dim]) AS mn
               |  FROM s${i}a$r, range(1, 17) AS t(dim) GROUP BY cl, t.dim),
               |s${i}n$r AS (SELECT cl, list(mn ORDER BY dim) AS c FROM s${i}m$r GROUP BY cl),
               |s${i}c$r AS (SELECT p.cl, COALESCE(n.c, p.c) AS c
               |  FROM s${i}c${r - 1} p LEFT JOIN s${i}n$r n ON p.cl = n.cl)""".stripMargin
          }
          s"""sub$i AS (SELECT vec_id, v[$lo:$hi] AS sv FROM e),
             |s${i}c0 AS (SELECT (row_number() OVER (ORDER BY vec_id)) - 1 AS cl, sv AS c
             |  FROM sub$i ORDER BY vec_id LIMIT 16),
             |${round(1)},
             |${round(2)},
             |${round(3)},
             |s${i}f AS (SELECT vec_id, err FROM (
             |  SELECT s.vec_id AS vec_id, ${dist("s", "p")} AS err,
             |    row_number() OVER (PARTITION BY s.vec_id
             |      ORDER BY ${dist("s", "p")}, p.cl) AS rn
             |  FROM sub$i s, s${i}c3 p) WHERE rn = 1)""".stripMargin
        }
        s"""WITH e AS (SELECT vec_id,
           |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
           |${sub(0)},
           |${sub(1)},
           |${sub(2)},
           |${sub(3)}
           |SELECT label, COUNT(*) AS n, ROUND(AVG(mse), 6) AS avg_mse FROM (
           |  SELECT emb.label,
           |    ROUND((a.err + b.err + c.err + d.err) / 64, 6) AS mse
           |  FROM s0f a JOIN s1f b USING (vec_id) JOIN s2f c USING (vec_id)
           |  JOIN s3f d USING (vec_id) JOIN embeddings emb USING (vec_id))
           |GROUP BY label ORDER BY label""".stripMargin
      }),

    Q("emb_neardup_pairs",
      // AUTO-PLANED: nPlanes derives from corpus size at a constant
      // expected occupancy of 32 (Similarity.autoPlanes), so the
      // per-bucket quadratic candidate budget stays flat as the corpus
      // grows — at the declared sf0.01 fixture (500 vectors) that is 4
      // planes, which is what the oracle's inlined plane constants pin;
      // at 10× the operator re-plans to 6-8 planes by itself. Fixture
      // max pairwise cosine is ~0.51 → 0.3 yields a non-trivial
      // candidate set; recall properties pinned in DedupSpec.
      (s, d) => Dedup.embeddingNearDups(t(s, d, "embeddings"),
          threshold = 0.3)
        .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
        .orderBy("id_a", "id_b"),
      Some(s"""WITH e AS (SELECT vec_id AS id,
             |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
             |b AS (SELECT id, v, ${LshOracle.bucketSql("v", 4)} AS bucket FROM e)
             |SELECT a.id AS id_a, b2.id AS id_b,
             |  ROUND(list_cosine_similarity(a.v, b2.v), 6) AS cos
             |FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.id < b2.id
             |WHERE list_cosine_similarity(a.v, b2.v) >= 0.3
             |ORDER BY id_a, id_b""".stripMargin)),

    Q("emb_semantic_dedup", // SemDeDup (Abbas et al. 2023) end-to-end:
      // LSH-bucketed cosine pairs -> connected components -> keep the
      // min-id representative per semantic cluster. Composes the proven
      // embeddingNearDups pair machinery with connectedComponents, so
      // the quadratic stage stays inside LSH buckets and the cluster
      // step only touches the pair OUTPUT (small side). cluster_id IS
      // the kept id (labels propagate minima). Oracle: the same inlined
      // plane constants + a recursive-CTE transitive closure.
      // (auto-planed like emb_neardup_pairs: 4 planes at this fixture)
      (s, d) => Dedup.connectedComponents(
          Dedup.embeddingNearDups(t(s, d, "embeddings"),
            threshold = 0.3))
        .groupBy("cluster_id")
        .agg(count(lit(1)).as("n_members"),
          (count(lit(1)) - 1).as("n_dropped"),
          array_join(transform(array_sort(collect_list(col("id"))),
            x => x.cast("string")), ",").as("members"))
        .orderBy("cluster_id"),
      Some(s"""WITH RECURSIVE e AS (SELECT vec_id AS id,
             |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
             |b AS (SELECT id, v, ${LshOracle.bucketSql("v", 4)} AS bucket FROM e),
             |pairs AS (SELECT a.id AS id_a, b2.id AS id_b
             |  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.id < b2.id
             |  WHERE list_cosine_similarity(a.v, b2.v) >= 0.3),
             |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
             |  UNION SELECT id_b, id_a FROM pairs),
             |reach(id, r) AS (
             |  SELECT src, src FROM edges
             |  UNION
             |  SELECT e2.src, reach.r FROM edges e2 JOIN reach ON e2.dst = reach.id),
             |comp AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id)
             |SELECT cluster_id, COUNT(*) AS n_members,
             |  COUNT(*) - 1 AS n_dropped,
             |  array_to_string(list_sort(list(id)), ',') AS members
             |FROM comp GROUP BY cluster_id ORDER BY cluster_id""".stripMargin)),

    Q("emb_knn_join", // batch k-NN join, LSH-blocked — the full blocked
      // pipeline (bucket both sides, Hamming-1 probe explosion, bucket
      // equi-join, exact rank inside candidates) is reproduced in SQL
      // from the same deterministic plane constants
      (s, d) => {
        val e = t(s, d, "embeddings")
        Similarity.knnJoin(e, e.filter(col("vec_id") < 20), k = 5)
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH e AS (SELECT vec_id,
             |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings),
             |base AS (SELECT vec_id AS nn_id, emb AS nn_vec,
             |  ${LshOracle.bucketSql("emb")} AS bucket FROM e),
             |q0 AS (SELECT vec_id AS q_id, emb AS q_vec,
             |  ${LshOracle.bucketSql("emb")} AS qb FROM e WHERE vec_id < 20),
             |qp AS (SELECT q_id, q_vec, xor(qb, t.m) AS bucket
             |  FROM q0, unnest(${LshOracle.probeMasks}) AS t(m)),
             |pairs AS (SELECT DISTINCT q_id, nn_id,
             |  ROUND(list_cosine_similarity(q_vec, nn_vec), 6) AS cos
             |  FROM qp JOIN base USING (bucket) WHERE q_id <> nn_id),
             |ranked AS (SELECT q_id, nn_id, cos,
             |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, nn_id) AS rank
             |  FROM pairs)
             |SELECT q_id, nn_id, cos, rank FROM ranked WHERE rank <= 5
             |ORDER BY q_id, rank""".stripMargin)),

    Q("emb_mutual_knn", // reciprocity filter over the kNN graph of a
      // BOUNDED eval subsample: (a, b) survives iff each is in the
      // other's top-5 — the hub-suppression step a semantic-dedup
      // pipeline runs before clustering (a hub is in everyone's top-k,
      // almost nobody in its). Production grades reciprocity structure
      // on a fixed-size slice: a deterministic id-stride sample of
      // ~512 vectors whatever the corpus (stride 1 = the whole
      // 500-vector sf0.01 fixture), so the build is
      // O(sample · occupancy), constant as the corpus grows; the
      // full-corpus pair relation stays available via
      // Similarity.mutualKnn for pipelines that need every pair. ONE
      // LSH-blocked kNN build over the sample; reciprocity is a
      // (id, id)-keyed self-join of the k·|sample| result. The oracle
      // replays the identical stride slice, blocked pipeline, and
      // reciprocal join.
      (s, d) => {
        val e0 = t(s, d, "embeddings")
        val stride = math.max(1L, e0.count() / 512)
        Similarity.mutualKnn(
            e0.filter(col("vec_id") % stride === 0), k = 5)
          .orderBy("id_a", "id_b")
      },
      Some(s"""WITH n0 AS (SELECT GREATEST(1, COUNT(*) // 512) AS stride
             |  FROM embeddings),
             |e AS (SELECT vec_id,
             |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
             |  FROM embeddings, n0 WHERE vec_id % stride = 0),
             |base AS (SELECT vec_id AS nn_id, emb AS nn_vec,
             |  ${LshOracle.bucketSql("emb")} AS bucket FROM e),
             |q0 AS (SELECT vec_id AS q_id, emb AS q_vec,
             |  ${LshOracle.bucketSql("emb")} AS qb FROM e),
             |qp AS (SELECT q_id, q_vec, xor(qb, t.m) AS bucket
             |  FROM q0, unnest(${LshOracle.probeMasks}) AS t(m)),
             |pairs AS (SELECT DISTINCT q_id, nn_id,
             |  ROUND(list_cosine_similarity(q_vec, nn_vec), 6) AS cos
             |  FROM qp JOIN base USING (bucket) WHERE q_id <> nn_id),
             |knn AS (SELECT q_id, nn_id, cos, rank FROM (
             |  SELECT q_id, nn_id, cos,
             |    row_number() OVER (PARTITION BY q_id
             |      ORDER BY cos DESC, nn_id) AS rank
             |  FROM pairs) WHERE rank <= 5)
             |SELECT a.q_id AS id_a, a.nn_id AS id_b, a.cos,
             |  a.rank AS rank_ab, b.rank AS rank_ba
             |FROM knn a JOIN knn b ON a.q_id = b.nn_id AND a.nn_id = b.q_id
             |WHERE a.q_id < a.nn_id
             |ORDER BY id_a, id_b""".stripMargin)))

  // Multimodal plumbing (north-star): binary payload + typed metadata over
  // a media table synthesized deterministically from `documents`, so the
  // metadata/container math is DuckDB-expressible while the pure-Scala
  // codecs (PPM/WAV/AVI) decode the payloads Spark-side.
  private def mmQueries: Seq[Q] = Seq(
    Q("mm_metadata_pruned", // metadata-only projection; binary col pruned
      (s, d) => graft.operators.Multimodal.metadataOnly(
          graft.operators.Multimodal.synthesizeFromDocuments(t(s, d, "documents")))
        .orderBy("media_id"),
      Some("""SELECT doc_id AS media_id,
             |(['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS modality,
             |length(text) * 10 AS duration_ms, 16000 AS sample_rate
             |FROM documents ORDER BY media_id""".stripMargin)),

    Q("mm_frame_sample", // 1 fps frame timestamps from metadata only
      (s, d) => graft.operators.Multimodal.frameSampleTimestamps(
          graft.operators.Multimodal.synthesizeFromDocuments(t(s, d, "documents")))
        .select(col("media_id"), col("duration_ms"),
          size(col("frame_ts_ms")).as("n_frames"),
          element_at(col("frame_ts_ms"), -1).as("last_ts"))
        .orderBy("media_id"),
      Some("""SELECT doc_id AS media_id, length(text) * 10 AS duration_ms,
             |CAST(length(text) * 10 // 1000 + 1 AS INT) AS n_frames,
             |(length(text) * 10 // 1000) * 1000 AS last_ts
             |FROM documents WHERE CAST(doc_id % 3 AS INT) = 2
             |ORDER BY media_id""".stripMargin)),

    Q("mm_dup_frames", { // cross-video duplicate-frame detection over the
      // REAL AVI decode: frames md5'd map-side (hex only ever shuffles),
      // hash-groupBy keeps recurring frames. The oracle rebuilds each
      // DECODED frame from the payload arithmetic — 48-char text slices
      // space-padded, then the fixed 4×4 bottom-up-BGR → top-down-RGB
      // byte permutation (inlined below from the same Scala loop the
      // codec runs) — and md5s the permuted string (payloads are ASCII,
      // so char = byte).
      (s: SparkSession, d: String) =>
        graft.operators.Multimodal.duplicateFrames(s,
            graft.operators.Multimodal
              .synthesizeFromDocuments(t(s, d, "documents")))
          .orderBy("frame_md5")
    }, {
      val perm = (for { y <- 0 to 3; x <- 0 to 3; c <- Seq(2, 1, 0) }
        yield (3 - y) * 12 + 3 * x + c + 1).mkString(", ")
      Some(s"""WITH v AS (
             |  SELECT doc_id, text || repeat(' ', 48) AS padded,
             |    greatest(1, (length(text) + 47) // 48) AS nf
             |  FROM documents WHERE doc_id % 3 = 2
             |), f AS (
             |  SELECT doc_id,
             |    md5(array_to_string(list_transform([$perm],
             |      p -> substr(substr(padded, CAST(i*48 + 1 AS BIGINT), 48),
             |                  CAST(p AS BIGINT), 1)), '')) AS frame_md5
             |  FROM v, unnest(range(0, nf)) AS u(i)
             |)
             |SELECT frame_md5, COUNT(*) AS n_occurrences,
             |  COUNT(DISTINCT doc_id) AS n_videos,
             |  CAST(MIN(doc_id) AS BIGINT) AS min_media_id
             |FROM f GROUP BY frame_md5 HAVING COUNT(*) > 1
             |ORDER BY frame_md5""".stripMargin)
    }),

    Q("mm_phash_neardups", // near-duplicate IMAGE detection over the
      // REAL P6 decode: 64-bit average hash (8×8 nearest-neighbor grid,
      // integer ITU-R 601 luminance, strict-mean bits — all integer
      // arithmetic) computed map-side from decoded pixels, candidates
      // from a (band, 16-bit value) bucket join, survivors checked with
      // band-wise bit_count(xor). The oracle rebuilds each hash from
      // the synthesis arithmetic (pixel byte = 32 + (id·31+i·7) mod 95)
      // and replays the same banded index — never all-pairs on either
      // side.
      (s, d) => graft.operators.Multimodal.nearDupImages(s,
          graft.operators.Multimodal
            .synthesizeFromDocuments(t(s, d, "documents")),
          maxHamming = 4)
        .orderBy("id_a", "id_b"),
      Some("""WITH img AS (
             |  SELECT doc_id, CAST(4 + doc_id % 5 AS BIGINT) AS w,
             |    CAST(4 + (doc_id // 5) % 5 AS BIGINT) AS h
             |  FROM documents WHERE doc_id % 3 = 0),
             |cell AS (
             |  SELECT doc_id, k,
             |    3 * ((k // 8) * h // 8 * w + (k % 8) * w // 8) AS i
             |  FROM img, range(0, 64) t(k)),
             |lum AS (
             |  SELECT doc_id, k,
             |    ((32 + (doc_id * 31 + i * 7) % 95) * 299
             |     + (32 + (doc_id * 31 + (i + 1) * 7) % 95) * 587
             |     + (32 + (doc_id * 31 + (i + 2) * 7) % 95) * 114) // 1000 AS l
             |  FROM cell),
             |hb AS (
             |  SELECT doc_id, k // 16 AS band,
             |    CAST(SUM(CASE WHEN l * 64 > tot THEN (1 << (k % 16))
             |      ELSE 0 END) AS INT) AS bv
             |  FROM (SELECT doc_id, k, l,
             |          SUM(l) OVER (PARTITION BY doc_id) AS tot FROM lum)
             |  GROUP BY 1, 2),
             |hv AS (
             |  SELECT doc_id,
             |    MAX(CASE WHEN band = 0 THEN bv END) AS b0,
             |    MAX(CASE WHEN band = 1 THEN bv END) AS b1,
             |    MAX(CASE WHEN band = 2 THEN bv END) AS b2,
             |    MAX(CASE WHEN band = 3 THEN bv END) AS b3
             |  FROM hb GROUP BY 1),
             |cand AS (
             |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             |  FROM hb a JOIN hb b ON a.band = b.band AND a.bv = b.bv
             |    AND a.doc_id < b.doc_id)
             |SELECT * FROM (
             |  SELECT c.id_a, c.id_b,
             |    CAST(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
             |     + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3))
             |     AS INT) AS hamming
             |  FROM cand c JOIN hv x ON x.doc_id = c.id_a
             |    JOIN hv y ON y.doc_id = c.id_b)
             |WHERE hamming <= 4
             |ORDER BY id_a, id_b""".stripMargin)),

    Q("mm_features", // mapPartitions batch decode. Every modality REALLY
      // decodes (P6 PPM / RIFF WAVE / uncompressed-DIB AVI): the oracle
      // reproduces each container's payload arithmetic and the
      // parsed-header dimensions; the decoded-pixel/sample feature
      // vectors themselves are pinned in MultimodalSpec.
      (s, d) => graft.operators.Multimodal.extractFeatures(s,
          graft.operators.Multimodal.synthesizeFromDocuments(t(s, d, "documents")))
        .toDF().select("media_id", "modality", "n_bytes", "width", "height")
        .orderBy("media_id"),
      Some("""WITH m AS (
             |  SELECT doc_id, text,
             |    (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS modality,
             |    4 + doc_id % 5 AS w, 4 + (doc_id // 5) % 5 AS h,
             |    -- WAV data length: text bytes padded to a whole s16 sample
             |    octet_length(encode(text)) + octet_length(encode(text)) % 2 AS dl,
             |    -- AVI frame count: text bytes padded to whole 4×4×3 planes
             |    greatest(1, (octet_length(encode(text)) + 47) // 48) AS nf
             |  FROM documents)
             |SELECT doc_id AS media_id, modality,
             |CASE WHEN modality = 'image'
             |  -- 'P6\n' + w + ' ' + h + '\n255\n' header, then 3·w·h pixels
             |  THEN CAST(9 + length(CAST(w AS VARCHAR)) + length(CAST(h AS VARCHAR))
             |       + 3 * w * h AS INT)
             |  WHEN modality = 'audio' THEN CAST(44 + dl AS INT) -- RIFF header + PCM
             |  -- RIFF+hdrl scaffolding is 224 B; each '00db' frame chunk 8+48 B
             |  ELSE CAST(224 + nf * 56 AS INT) END AS n_bytes,
             |CASE WHEN modality = 'image' THEN CAST(w AS INT)
             |  WHEN modality = 'audio' THEN CAST(dl // 2 AS INT) -- decoded sample count
             |  ELSE 4 END AS width, -- video: BITMAPINFOHEADER dims
             |CASE WHEN modality = 'image' THEN CAST(h AS INT)
             |  WHEN modality = 'audio' THEN 0
             |  ELSE 4 END AS height
             |FROM m ORDER BY media_id""".stripMargin)),

    Q("mm_audio_loudness", // windowed RMS loudness over REAL WAV decode:
      // per-partition decoder emits only (id, sr, n, energy[]) — exact
      // integer Σsample² per 50-sample frame — and the RMS/peak math
      // runs as HOFs on the frame-sized array. The oracle recomputes the
      // s16le samples from the synthesis arithmetic (text bytes = PCM
      // bytes); peak argmax ties break on the exact integer energy.
      (s, d) => graft.operators.Multimodal.audioLoudness(s,
          graft.operators.Multimodal.synthesizeFromDocuments(
            t(s, d, "documents")))
        .orderBy("media_id"),
      Some("""WITH a AS (
             |  SELECT doc_id, text, length(text) AS bl,
             |    (length(text) + length(text) % 2) // 2 AS nsmp
             |  FROM documents WHERE doc_id % 3 = 1),
             |s AS (
             |  SELECT doc_id, nsmp, nsmp // 50 AS nw,
             |    list_transform(range(0, nsmp), i ->
             |      CASE WHEN 2 * i + 2 <= bl
             |        THEN ord(substr(text, CAST(2 * i + 1 AS INT), 1))
             |          + 256 * ord(substr(text, CAST(2 * i + 2 AS INT), 1))
             |        ELSE ord(substr(text, CAST(2 * i + 1 AS INT), 1))
             |      END) AS smp
             |  FROM a),
             |e AS (
             |  SELECT doc_id, nsmp, nw,
             |    list_transform(range(0, nw), w ->
             |      list_sum(list_transform(range(0, 50), j ->
             |        CAST(smp[CAST(w * 50 + j + 1 AS INT)] AS BIGINT)
             |          * smp[CAST(w * 50 + j + 1 AS INT)]))) AS en
             |  FROM s)
             |SELECT doc_id AS media_id, 16000 AS sample_rate,
             |  CAST(nsmp AS INT) AS n_samples, CAST(nw AS INT) AS n_windows,
             |  CASE WHEN nw > 0
             |    THEN CAST(list_position(en, list_aggregate(en, 'max')) - 1 AS INT)
             |  END AS peak_window,
             |  CASE WHEN nw > 0
             |    THEN ROUND(sqrt(list_aggregate(en, 'max') / 50.0), 6)
             |  END AS peak_rms,
             |  CASE WHEN nw > 0
             |    THEN ROUND(list_sum(list_transform(en, x -> sqrt(x / 50.0))) / nw, 6)
             |  END AS mean_rms
             |FROM e ORDER BY media_id""".stripMargin)))

  /** DuckDB mirror of Dedup.dupClusters at threshold 0.02 — near-dup
    * pairs → symmetrized edges → recursive transitive closure →
    * `comp(id, cluster_id)`. Shared by every oracle that grades cluster
    * shape (members list, size histogram).
    */
  private val dupClustersCte: String = """WITH RECURSIVE d AS (
    |  SELECT source, doc_id,
    |    list_distinct(list_transform(
    |      range(0, greatest(len(t) - 2, 1)),
    |      i -> array_to_string(t[(i+1):(i+3)], ' '))) AS sh
    |  FROM (SELECT source, doc_id,
    |          string_split_regex(lower(trim(text)), '\s+') AS t
    |        FROM documents)
    |), pairs AS (
    |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
    |  FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
    |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
    |      / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.02
    |), edges AS (
    |  SELECT id_a AS src, id_b AS dst FROM pairs
    |  UNION SELECT id_b, id_a FROM pairs
    |), reach(id, r) AS (
    |  SELECT src, src FROM edges
    |  UNION
    |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id
    |), comp AS (
    |  SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id
    |)""".stripMargin

  // §2.11 round-5 extensions: time-series diagnostics, robust trends,
  // cohort economics, link prediction, containment dedup.
  private def trendQueries: Seq[Q] = Seq(
    Q("events_acf", // autocorrelation function of the daily event-count
      // series at lags 1..7 — the seasonality fingerprint (a weekly
      // cycle surfaces as a lag-7 peak). The series collapses to one row
      // per day FIRST, so the windows/joins below run over ~30 rows;
      // every ACF input is an exact integer-valued double (counts and
      // their products), so the final Pearson formula computes the
      // identical IEEE-754 value in both engines. The lead() window is
      // global but bounded by the day-grained rollup — benign.
      (s, d) => {
        val w = Window.orderBy("day")
        val daily = t(s, d, "events")
          .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(count(lit(1)).cast("double").as("x"))
        val leads = daily.select(
          col("x") +: (1 to 7).map(k => lead(col("x"), k).over(w).as(s"k$k")): _*)
        leads
          .select(col("x"), expr(
            "stack(7, 1,k1, 2,k2, 3,k3, 4,k4, 5,k5, 6,k6, 7,k7) AS (lag_k, y)"))
          .filter(col("y").isNotNull)
          .groupBy("lag_k")
          .agg(count(lit(1)).cast("double").as("np"),
            sum("x").as("sx"), sum("y").as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"))
          .select(col("lag_k"), col("np").cast("long").as("n_pairs"),
            round((col("np") * col("sxy") - col("sx") * col("sy")) /
              sqrt((col("np") * col("sxx") - col("sx") * col("sx")) *
                (col("np") * col("syy") - col("sy") * col("sy"))), 6).as("acf"))
          .orderBy("lag_k")
      },
      Some("""WITH daily AS (
             |  SELECT strftime(ts, '%Y-%m-%d') AS day,
             |    CAST(COUNT(*) AS DOUBLE) AS x
             |  FROM events GROUP BY 1),
             |l AS (SELECT x,
             |  LEAD(x, 1) OVER w AS k1, LEAD(x, 2) OVER w AS k2,
             |  LEAD(x, 3) OVER w AS k3, LEAD(x, 4) OVER w AS k4,
             |  LEAD(x, 5) OVER w AS k5, LEAD(x, 6) OVER w AS k6,
             |  LEAD(x, 7) OVER w AS k7
             |  FROM daily WINDOW w AS (ORDER BY day)),
             |p AS (
             |  SELECT 1 AS lag_k, x, k1 AS y FROM l UNION ALL
             |  SELECT 2, x, k2 FROM l UNION ALL
             |  SELECT 3, x, k3 FROM l UNION ALL
             |  SELECT 4, x, k4 FROM l UNION ALL
             |  SELECT 5, x, k5 FROM l UNION ALL
             |  SELECT 6, x, k6 FROM l UNION ALL
             |  SELECT 7, x, k7 FROM l),
             |f AS (SELECT lag_k, CAST(COUNT(*) AS DOUBLE) AS np,
             |    SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy,
             |    SUM(x*x) AS sxx, SUM(y*y) AS syy
             |  FROM p WHERE y IS NOT NULL GROUP BY lag_k)
             |SELECT lag_k, CAST(np AS BIGINT) AS n_pairs,
             |  ROUND((np*sxy - sx*sy) /
             |    sqrt((np*sxx - sx*sx) * (np*syy - sy*sy)), 6) AS acf
             |FROM f ORDER BY lag_k""".stripMargin)),

    Q("events_cusum_changepoint", // CUSUM changepoint screen: the day
      // where the running sum of (daily count − global mean) peaks in
      // magnitude is the most likely level-shift point (Page 1954).
      // The cumulative sum runs in day order sequentially in BOTH
      // engines, so the float accumulation is order-identical. The mean
      // rides a 1-row broadcast (scalar fan-out, not a pairing join);
      // the ordered window is global but over the ~30-row day rollup.
      (s, d) => {
        val daily = t(s, d, "events")
          .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(count(lit(1)).cast("double").as("x"))
        val m = daily.agg(sum("x").as("sx"),
          count(lit(1)).cast("double").as("nd"))
        val wc = Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        daily.crossJoin(broadcast(m))
          .withColumn("sdev", sum(col("x") - col("sx") / col("nd")).over(wc))
          .select(col("day").as("change_day"),
            round(abs(col("sdev")), 4).as("cusum_max"),
            col("nd").cast("long").as("n_days"))
          .orderBy(col("cusum_max").desc, col("change_day")).limit(1)
      },
      Some("""WITH daily AS (
             |  SELECT strftime(ts, '%Y-%m-%d') AS day,
             |    CAST(COUNT(*) AS DOUBLE) AS x
             |  FROM events GROUP BY 1),
             |m AS (SELECT SUM(x) AS sx, CAST(COUNT(*) AS DOUBLE) AS nd
             |  FROM daily),
             |cs AS (SELECT day,
             |    SUM(x - sx/nd) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
             |      AS sdev, nd
             |  FROM daily, m)
             |SELECT day AS change_day, ROUND(ABS(sdev), 4) AS cusum_max,
             |  CAST(nd AS BIGINT) AS n_days
             |FROM cs ORDER BY ROUND(ABS(sdev), 4) DESC, day LIMIT 1""".stripMargin)),

    Q("events_segmented_trend", // broken-stick structural break: fit
      // two OLS segments around every candidate day (both sides ≥ 3
      // points) and pick the split minimizing total SSE — the
      // changepoint model CUSUM only screens for. Every candidate's
      // two fits are CLOSED FORM off one pass of prefix sums (right
      // segment = totals − prefix), so the whole search is one
      // day-rollup window + one argmin — no per-candidate re-scan.
      // All sums are exact integers (day index × counts, bounded by
      // the day grain even at 100 TB); the SSE divisions are the only
      // doubles, computed by the identical expression in both engines,
      // so the argmin needs no rounding (tie-break on the earlier day).
      (s, d) => {
        val daily = t(s, d, "events")
          .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(count(lit(1)).as("y"))
        val wd = Window.orderBy("day")
        val wc = wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val pre = daily
          .withColumn("i", row_number().over(wd).cast("long"))
          .withColumn("cx", sum(col("i")).over(wc))
          .withColumn("cy", sum(col("y")).over(wc))
          .withColumn("cxx", sum(col("i") * col("i")).over(wc))
          .withColumn("cxy", sum(col("i") * col("y")).over(wc))
          .withColumn("cyy", sum(col("y") * col("y")).over(wc))
        val tot = pre.agg(max("i").as("n"), max("cx").as("tx"),
          max("cy").as("ty"), max("cxx").as("txx"), max("cxy").as("txy"),
          max("cyy").as("tyy"))
        def sxx(xx: Column, x: Column, n: Column) =
          xx - x * x / n.cast("double")
        def sxy(xy: Column, x: Column, y: Column, n: Column) =
          xy - x * y / n.cast("double")
        def syy(yy: Column, y: Column, n: Column) =
          yy - y * y / n.cast("double")
        def sse(xx: Column, xy: Column, yy: Column): Column =
          yy - xy * xy / xx
        val c = pre.crossJoin(broadcast(tot))
          .filter(col("i") >= 3 && col("i") <= col("n") - 3)
          .select(col("day"), col("i"), col("n"),
            sxx(col("cxx"), col("cx"), col("i")).as("lxx"),
            sxy(col("cxy"), col("cx"), col("cy"), col("i")).as("lxy"),
            syy(col("cyy"), col("cy"), col("i")).as("lyy"),
            sxx(col("txx") - col("cxx"), col("tx") - col("cx"),
              col("n") - col("i")).as("rxx"),
            sxy(col("txy") - col("cxy"), col("tx") - col("cx"),
              col("ty") - col("cy"), col("n") - col("i")).as("rxy"),
            syy(col("tyy") - col("cyy"), col("ty") - col("cy"),
              col("n") - col("i")).as("ryy"),
            sse(sxx(col("txx"), col("tx"), col("n")),
              sxy(col("txy"), col("tx"), col("ty"), col("n")),
              syy(col("tyy"), col("ty"), col("n"))).as("sse1"))
          .withColumn("sse2", sse(col("lxx"), col("lxy"), col("lyy"))
            + sse(col("rxx"), col("rxy"), col("ryy")))
        c.orderBy(col("sse2"), col("i")).limit(1)
          .select(col("day").as("break_day"), col("i").as("k"),
            col("n").as("n_days"),
            round(col("lxy") / col("lxx"), 6).as("slope_left"),
            round(col("rxy") / col("rxx"), 6).as("slope_right"),
            round(col("sse1"), 4).as("sse_single"),
            round(col("sse2"), 4).as("sse_two"))
      },
      Some("""WITH daily AS (
             |  SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS y
             |  FROM events GROUP BY 1),
             |pre AS (SELECT day, i, y,
             |    SUM(i) OVER w AS cx, SUM(y) OVER w AS cy,
             |    SUM(i * i) OVER w AS cxx, SUM(i * y) OVER w AS cxy,
             |    SUM(y * y) OVER w AS cyy
             |  FROM (SELECT day, y, row_number() OVER (ORDER BY day) AS i
             |        FROM daily)
             |  WINDOW w AS (ORDER BY i ROWS UNBOUNDED PRECEDING)),
             |tot AS (SELECT MAX(i) AS n, MAX(cx) AS tx, MAX(cy) AS ty,
             |    MAX(cxx) AS txx, MAX(cxy) AS txy, MAX(cyy) AS tyy FROM pre),
             |c AS (SELECT day, i, n,
             |    cxx - cx * cx / CAST(i AS DOUBLE) AS lxx,
             |    cxy - cx * cy / CAST(i AS DOUBLE) AS lxy,
             |    cyy - cy * cy / CAST(i AS DOUBLE) AS lyy,
             |    (txx - cxx) - (tx - cx) * (tx - cx) / CAST(n - i AS DOUBLE) AS rxx,
             |    (txy - cxy) - (tx - cx) * (ty - cy) / CAST(n - i AS DOUBLE) AS rxy,
             |    (tyy - cyy) - (ty - cy) * (ty - cy) / CAST(n - i AS DOUBLE) AS ryy,
             |    (tyy - ty * ty / CAST(n AS DOUBLE))
             |      - (txy - tx * ty / CAST(n AS DOUBLE))
             |        * (txy - tx * ty / CAST(n AS DOUBLE))
             |        / (txx - tx * tx / CAST(n AS DOUBLE)) AS sse1
             |  FROM pre, tot WHERE i >= 3 AND i <= n - 3),
             |sc AS (SELECT *,
             |    (lyy - lxy * lxy / lxx) + (ryy - rxy * rxy / rxx) AS sse2
             |  FROM c)
             |SELECT day AS break_day, i AS k, CAST(n AS BIGINT) AS n_days,
             |  ROUND(lxy / lxx, 6) AS slope_left,
             |  ROUND(rxy / rxx, 6) AS slope_right,
             |  ROUND(sse1, 4) AS sse_single, ROUND(sse2, 4) AS sse_two
             |FROM sc ORDER BY sse2, i LIMIT 1""".stripMargin)),

    Q("orders_theilsen_trend", // Theil–Sen robust trend of daily revenue
      // (1996 H1): the MEDIAN of all pairwise slopes shrugs off outlier
      // days that wreck OLS. The quadratic pair space is generated as a
      // BANDED equi join (each left row fans out to the bands at-or-after
      // its own, pairs filter inside the band-pair key) — the plan stays
      // a hash join on the band key, never a nested-loop product, and at
      // scale the band count bounds the fan-out exactly like
      // Scale.binnedRangeJoin. Daily revenue is rounded to 2dp BEFORE
      // slopes so both engines difference identical doubles; the median
      // is the LOWER median (rank ⌈n/2⌉) — rank selection, no averaging
      // convention. The rank window is global but over the bounded pair
      // set of a half-year day-grained series (~16k rows).
      (s, d) => {
        val daily = t(s, d, "orders")
          .filter(col("o_orderdate") >= ts("1996-01-01")
            && col("o_orderdate") < ts("1996-07-01"))
          .groupBy(col("o_orderdate").as("od"))
          .agg(round(sum("o_totalprice"), 2).as("r"))
          .select(datediff(col("od"), to_date(ts("1996-01-01"))).as("i"),
            col("r"))
        val bw = 32
        val a = daily.select(col("i").as("i1"), col("r").as("r1"),
          explode(sequence(expr(s"i div $bw"), lit(5))).as("tb"))
        val b = daily.select(col("i").as("i2"), col("r").as("r2"),
          expr(s"i div $bw").as("tb"))
        val slopes = a.join(b, Seq("tb"))
          .filter(col("i2") > col("i1"))
          .select(((col("r2") - col("r1")) / (col("i2") - col("i1")))
            .as("slope"))
        slopes
          .withColumn("rn", row_number().over(Window.orderBy("slope")))
          .withColumn("np", count(lit(1)).over(Window.partitionBy()))
          .filter(col("rn") === expr("(np + 1) div 2"))
          .select(col("np").as("n_pairs"), round(col("slope"), 4).as("median_slope"))
      },
      Some("""WITH daily AS (
             |  SELECT date_diff('day', DATE '1996-01-01',
             |      CAST(o_orderdate AS DATE)) AS i,
             |    ROUND(SUM(o_totalprice), 2) AS r
             |  FROM orders
             |  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
             |    AND o_orderdate < TIMESTAMP '1996-07-01'
             |  GROUP BY 1),
             |p AS (SELECT (b.r - a.r) / (b.i - a.i) AS slope
             |  FROM daily a JOIN daily b ON b.i > a.i),
             |rk AS (SELECT slope, ROW_NUMBER() OVER (ORDER BY slope) AS rn,
             |    COUNT(*) OVER () AS np
             |  FROM p)
             |SELECT CAST(np AS BIGINT) AS n_pairs,
             |  ROUND(slope, 4) AS median_slope
             |FROM rk WHERE rn = (np + 1) // 2""".stripMargin)),

    Q("orders_cohort_ltv", // cohort lifetime-value triangle: customers
      // grouped by FIRST-order month, cumulative revenue per customer by
      // months-since-cohort. Two keyed aggs + one bounded window; the
      // cohort dim (month-grained) joins back onto the monthly rollup,
      // never onto raw orders twice. Monthly revenue rounds to 2dp
      // BEFORE the running sum so both engines accumulate identical
      // doubles in identical (midx) order.
      (s, d) => {
        val o = t(s, d, "orders")
          .select(col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
        val fo = o.groupBy("o_custkey").agg(min("o_orderdate").as("fd"))
          .select(col("o_custkey"), date_format(col("fd"), "yyyy-MM").as("cohort"),
            (year(col("fd")) * 12 + month(col("fd"))).as("cm"))
        val sizes = fo.groupBy("cohort").agg(count(lit(1)).as("n_customers"))
        val monthly = o.join(fo, Seq("o_custkey"))
          .select(col("cohort"),
            (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))
              - col("cm")).as("midx"),
            col("o_totalprice"))
          .filter(col("midx") <= 11)
          .groupBy("cohort", "midx")
          .agg(round(sum("o_totalprice"), 2).as("rev"))
        val wc = Window.partitionBy("cohort").orderBy("midx")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        monthly.join(sizes, Seq("cohort"))
          .filter(col("cohort") < "1996")
          .withColumn("cum", sum("rev").over(wc))
          .select(col("cohort"), col("midx"), col("n_customers"),
            round(col("cum") / col("n_customers"), 2).as("ltv_per_customer"))
          .orderBy("cohort", "midx")
      },
      Some("""WITH f AS (
             |  SELECT o_custkey, MIN(o_orderdate) AS fd FROM orders GROUP BY 1),
             |fo AS (SELECT o_custkey, strftime(fd, '%Y-%m') AS cohort,
             |    year(fd)*12 + month(fd) AS cm FROM f),
             |sizes AS (SELECT cohort, COUNT(*) AS n_customers FROM fo GROUP BY 1),
             |monthly AS (
             |  SELECT fo.cohort,
             |    year(o.o_orderdate)*12 + month(o.o_orderdate) - fo.cm AS midx,
             |    ROUND(SUM(o.o_totalprice), 2) AS rev
             |  FROM orders o JOIN fo ON o.o_custkey = fo.o_custkey
             |  WHERE year(o.o_orderdate)*12 + month(o.o_orderdate) - fo.cm <= 11
             |  GROUP BY 1, 2),
             |c AS (SELECT cohort, midx,
             |    SUM(rev) OVER (PARTITION BY cohort ORDER BY midx
             |      ROWS UNBOUNDED PRECEDING) AS cum
             |  FROM monthly)
             |SELECT c.cohort, c.midx, s.n_customers,
             |  ROUND(c.cum / s.n_customers, 2) AS ltv_per_customer
             |FROM c JOIN sizes s ON c.cohort = s.cohort
             |WHERE c.cohort < '1996'
             |ORDER BY c.cohort, c.midx""".stripMargin)),

    Q("graph_hits_bipartite", // HITS hubs & authorities (Kleinberg) on
      // the customer→part purchase bipartite graph, 2 full rounds.
      // Rounds run UNNORMALIZED (mid-step norms are scalars that cancel
      // in the final normalized vectors), so every intermediate is an
      // exact integer in doubles and round 1's authority update is just
      // the in-degree; each side normalizes once at the end. The oracle
      // unrolls the same exact-integer chain; the final division is the
      // only FP step, rounded to 6.
      (s, d) => {
        val edges = t(s, d, "orders")
          .join(t(s, d, "lineitem"),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("src"), col("l_partkey").as("dst"))
        graft.operators.Graph.hitsBipartite(edges, iters = 2)
          .select(col("role"), col("id"), round(col("score"), 6).as("score"))
          .orderBy("role", "id")
      },
      Some("""WITH e AS MATERIALIZED (
             |  SELECT DISTINCT o_custkey AS src, l_partkey AS dst
             |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
             |a1 AS MATERIALIZED (
             |  SELECT dst AS id, CAST(COUNT(*) AS DOUBLE) AS a
             |  FROM e GROUP BY 1),
             |h1 AS MATERIALIZED (
             |  SELECT e.src AS id, SUM(a1.a) AS h
             |  FROM e JOIN a1 ON e.dst = a1.id GROUP BY 1),
             |a2 AS MATERIALIZED (
             |  SELECT e.dst AS id, SUM(h1.h) AS a
             |  FROM e JOIN h1 ON e.src = h1.id GROUP BY 1),
             |h2 AS MATERIALIZED (
             |  SELECT e.src AS id, SUM(a2.a) AS h
             |  FROM e JOIN a2 ON e.dst = a2.id GROUP BY 1)
             |SELECT 'hub' AS role, id,
             |  ROUND(h / (SELECT sqrt(SUM(h * h)) FROM h2), 6) AS score
             |FROM h2
             |UNION ALL
             |SELECT 'authority' AS role, id,
             |  ROUND(a / (SELECT sqrt(SUM(a * a)) FROM a2), 6) AS score
             |FROM a2
             |ORDER BY role, id""".stripMargin)),

    Q("graph_adamic_adar", // Adamic–Adar link prediction over the
      // co-purchase part graph (parts sharing >= 2 orders, the kcore
      // edge set): non-adjacent pairs scored by Σ 1/ln(deg) over common
      // neighbors — wedge-generated candidates, never node×node
      // (Graph.adamicAdar). Scores order on the ROUNDED value: the sum
      // accumulates floats in engine-specific order.
      (s, d) => graft.operators.Graph.adamicAdar(
          coPurchasePairs(s, d).filter(col("n") >= 2).select("src", "dst"),
          canonicalEdges = true)
        .select(col("x"), col("y"), col("common_neighbors"),
          round(col("aa_score"), 6).as("aa_score"))
        .orderBy(col("aa_score").desc, col("x"), col("y")).limit(25),
      Some("""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
             |p AS (SELECT a.l_partkey AS src, b.l_partkey AS dst
             |  FROM op a JOIN op b
             |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
             |nbr AS (SELECT src AS u, dst AS n FROM p
             |  UNION ALL SELECT dst, src FROM p),
             |deg AS (SELECT u, COUNT(*) AS d FROM nbr GROUP BY u),
             |c AS (SELECT nbr.u, nbr.n, deg.d FROM nbr
             |  JOIN deg USING (u) WHERE deg.d >= 2 AND deg.d <= 10000),
             |w AS (SELECT a.u, a.n AS x, b.n AS y, a.d
             |  FROM c a JOIN c b ON a.u = b.u AND a.n < b.n),
             |cand AS (SELECT x, y, d FROM w
             |  WHERE NOT EXISTS (SELECT 1 FROM p
             |    WHERE p.src = w.x AND p.dst = w.y)),
             |sc AS (SELECT x, y, COUNT(*) AS common_neighbors,
             |    ROUND(SUM(1.0 / ln(d)), 6) AS aa_score
             |  FROM cand GROUP BY x, y)
             |SELECT x, y, common_neighbors, aa_score FROM sc
             |ORDER BY aa_score DESC, x, y LIMIT 25""".stripMargin)),

    Q("doc_containment_pairs", // §2.11 dedup: overlap-coefficient
      // containment — catches a short document QUOTED inside a longer
      // one, which Jaccard's union denominator structurally hides
      // (Dedup.containmentPairs; same inverted-index blocking as
      // doc_ngram_jaccard).
      (s, d) => Dedup.containmentOf(shinglePairIndex(s, d), threshold = 0.5)
        .orderBy("id_a", "id_b"),
      Some("""WITH d AS (
             |  SELECT source, doc_id,
             |    list_distinct(list_transform(
             |      range(0, greatest(len(t) - 2, 1)),
             |      i -> array_to_string(t[(i+1):(i+3)], ' '))) AS sh
             |  FROM (SELECT source, doc_id,
             |          string_split_regex(lower(trim(text)), '\s+') AS t
             |        FROM documents)
             |)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |  CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS common,
             |  ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             |    / least(len(a.sh), len(b.sh)), 6) AS containment
             |FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
             |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             |    / least(len(a.sh), len(b.sh)) >= 0.5
             |ORDER BY id_a, id_b""".stripMargin)),

    Q("doc_dsir_weights", // DSIR-style importance weights (Xie et al.
      // 2023): score every document by the log-likelihood ratio of its
      // tokens under a hashed-unigram model of the TARGET slice (here
      // lang='en') vs the whole corpus. Buckets are the first md5 hex
      // byte (256 of them) — engine-reproducible, no seeded hashing —
      // with add-one smoothing. The bucket table is 256 rows, so the
      // per-token weight joins back map-side (broadcast); the corpus
      // totals fold in as window sums OVER the 256-row table, never a
      // scan-side scalar join. Weights order on the ROUNDED value (the
      // per-doc sum accumulates ln terms in engine-specific order).
      (s, d) => {
        val toks = t(s, d, "documents")
          .select(col("doc_id"), col("lang"),
            explode(graft.operators.TextAnalysis.tokens(lower(col("text"))))
              .as("w"))
          .withColumn("b", substring(md5(col("w")), 1, 2))
        val buckets = toks.groupBy("b").agg(
          count(lit(1)).cast("double").as("ca"),
          sum(when(col("lang") === "en", 1).otherwise(0)).cast("double").as("ct"))
        val wAll = Window.partitionBy() // 256-row bucket table: benign
        val llr = buckets
          .withColumn("na", sum("ca").over(wAll))
          .withColumn("nt", sum("ct").over(wAll))
          .select(col("b"),
            (log(col("ct") + 1) - log(col("nt") + 256)
              - log(col("ca") + 1) + log(col("na") + 256)).as("llr"))
        toks.join(broadcast(llr), Seq("b"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"),
            round(sum("llr"), 4).as("dsir_weight"))
          .orderBy(col("dsir_weight").desc, col("doc_id")).limit(25)
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, lang, unnest(
             |      string_split_regex(lower(trim(text)), '\s+')) AS w
             |  FROM documents),
             |tb AS (SELECT doc_id, lang, substr(md5(w), 1, 2) AS b FROM toks),
             |buckets AS (
             |  SELECT b, CAST(COUNT(*) AS DOUBLE) AS ca,
             |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE) AS ct
             |  FROM tb GROUP BY b),
             |llr AS (
             |  SELECT b, ln(ct + 1) - ln(SUM(ct) OVER () + 256)
             |    - ln(ca + 1) + ln(SUM(ca) OVER () + 256) AS llr
             |  FROM buckets)
             |SELECT tb.doc_id, COUNT(*) AS n_tokens,
             |  ROUND(SUM(llr.llr), 4) AS dsir_weight
             |FROM tb JOIN llr ON tb.b = llr.b
             |GROUP BY tb.doc_id
             |ORDER BY dsir_weight DESC, doc_id LIMIT 25""".stripMargin)),

    Q("events_user_entropy", // per-user event-type Shannon entropy — the
      // bot/automation screen: a user hammering one event type scores
      // near 0, organic mixes score near ln(5). H = ln(n) − (Σ c·ln c)/n
      // from exact integer counts, one (user, type) agg + one user agg —
      // no window over the raw stream. Low-entropy heavy users surface
      // first; ties break on user_id.
      (s, d) => t(s, d, "events")
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
        .groupBy("user_id")
        .agg(sum("c").as("n_events"),
          sum(col("c").cast("double") * log(col("c").cast("double"))).as("clc"),
          count(lit(1)).as("n_types"))
        .filter(col("n_events") >= 30)
        .select(col("user_id"), col("n_events"), col("n_types"),
          round(log(col("n_events").cast("double"))
            - col("clc") / col("n_events"), 6).as("entropy"))
        .orderBy(col("entropy"), col("user_id")).limit(50),
      Some("""WITH tc AS (
             |  SELECT user_id, event_type, COUNT(*) AS c
             |  FROM events GROUP BY 1, 2),
             |u AS (SELECT user_id, CAST(SUM(c) AS BIGINT) AS n_events,
             |    SUM(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS clc,
             |    COUNT(*) AS n_types
             |  FROM tc GROUP BY 1)
             |SELECT user_id, n_events, n_types,
             |  ROUND(ln(CAST(n_events AS DOUBLE)) - clc / n_events, 6) AS entropy
             |FROM u WHERE n_events >= 30
             |ORDER BY entropy, user_id LIMIT 50""".stripMargin)),

    Q("orders_lift_pairs", // association rules over co-purchased parts:
      // support / confidence / lift from exact integer counts (pair
      // count, part marginals, order total). The pair space is the
      // order-keyed self-join bounded by basket size (the
      // basket_part_pairs shape) with BOTH sides pruned to parts <= 200
      // BEFORE the join; the order total rides a 1-row broadcast.
      (s, d) => {
        val op = orderPartPairs(s, d)
        val marg = op.groupBy(col("l_partkey")).agg(count(lit(1)).as("m"))
        val ntot = op.select(countDistinct("l_orderkey").as("n_orders"))
        // pair counts read off the shared canonical index; the <=200
        // pruning commutes with the count (a pair exists iff both parts
        // share an order, and its n is filter-independent)
        val co = coPurchasePairs(s, d)
          .filter(col("src") <= 200 && col("dst") <= 200 && col("n") >= 2)
          .select(col("src").as("pa"), col("dst").as("pb"), col("n").as("n_co"))
        co.join(broadcast(marg.withColumnRenamed("l_partkey", "pa")
            .withColumnRenamed("m", "ma")), Seq("pa"))
          .join(broadcast(marg.withColumnRenamed("l_partkey", "pb")
            .withColumnRenamed("m", "mb")), Seq("pb"))
          .crossJoin(broadcast(ntot))
          .select(col("pa"), col("pb"), col("n_co"),
            round(col("n_co").cast("double") / col("n_orders"), 6).as("support"),
            round(col("n_co").cast("double") / col("ma"), 6).as("confidence"),
            round(col("n_co").cast("double") * col("n_orders")
              / (col("ma") * col("mb")), 6).as("lift"))
          .orderBy(col("lift").desc, col("pa"), col("pb")).limit(20)
      },
      Some("""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
             |marg AS (SELECT l_partkey, COUNT(*) AS m FROM op GROUP BY 1),
             |ntot AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM op),
             |co AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb,
             |    COUNT(*) AS n_co
             |  FROM op a JOIN op b
             |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             |  WHERE a.l_partkey <= 200 AND b.l_partkey <= 200
             |  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
             |SELECT pa, pb, n_co,
             |  ROUND(CAST(n_co AS DOUBLE) / n_orders, 6) AS support,
             |  ROUND(CAST(n_co AS DOUBLE) / ma.m, 6) AS confidence,
             |  ROUND(CAST(n_co AS DOUBLE) * n_orders / (ma.m * mb.m), 6) AS lift
             |FROM co, ntot
             |JOIN marg ma ON co.pa = ma.l_partkey
             |JOIN marg mb ON co.pb = mb.l_partkey
             |ORDER BY lift DESC, pa, pb LIMIT 20""".stripMargin)),

    Q("doc_tokens_per_byte", // tokenizer-economics screen per source:
      // BPE-ish tokens and whitespace tokens per character — a cheap
      // quality/compressibility signal (boilerplate and non-text inflate
      // tokens-per-byte). Map-only token counting (native codegen'd
      // expressions), one keyed agg over exact integer sums.
      (s, d) => t(s, d, "documents")
        .select(col("source"),
          graft.operators.TextAnalysis.tokenCount(col("text")).as("nw"),
          graft.operators.TextAnalysis.bpeTokenCount(col("text")).as("nb"),
          length(col("text")).as("nc"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("nw").as("n_tokens"),
          sum("nb").as("n_bpe_tokens"), sum("nc").as("n_chars"),
          round(sum("nb").cast("double") / sum("nc"), 6).as("bpe_per_char"),
          round(sum("nb").cast("double") / sum("nw"), 6).as("bpe_per_word"))
        .orderBy("source"),
      Some(s"""SELECT source, COUNT(*) AS n_docs,
              |  CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS n_tokens,
              |  CAST(SUM(len(regexp_extract_all(text, '${graft.operators.TextAnalysis.bpeIshPattern}'))) AS BIGINT) AS n_bpe_tokens,
              |  CAST(SUM(length(text)) AS BIGINT) AS n_chars,
              |  ROUND(CAST(SUM(len(regexp_extract_all(text, '${graft.operators.TextAnalysis.bpeIshPattern}'))) AS DOUBLE)
              |    / SUM(length(text)), 6) AS bpe_per_char,
              |  ROUND(CAST(SUM(len(regexp_extract_all(text, '${graft.operators.TextAnalysis.bpeIshPattern}'))) AS DOUBLE)
              |    / SUM(len(string_split_regex(trim(text), '\\s+'))), 6) AS bpe_per_word
              |FROM documents GROUP BY source ORDER BY source""".stripMargin)),

    Q("events_ols_trend", // least-squares trend of daily event volume:
      // slope/intercept/R² from exact integer moment sums (day index ×
      // integer counts), so both engines evaluate the identical
      // closed-form doubles. The day-index window is global but over the
      // ~30-row day rollup — benign.
      (s, d) => {
        val daily = t(s, d, "events")
          .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(count(lit(1)).cast("double").as("y"))
          .withColumn("x",
            (row_number().over(Window.orderBy("day")) - 1).cast("double"))
        daily.agg(count(lit(1)).cast("double").as("n"),
            sum("x").as("sx"), sum("y").as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"))
          .select(col("n").cast("long").as("n_days"),
            round((col("n") * col("sxy") - col("sx") * col("sy"))
              / (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("slope"),
            round((col("sy") - (col("n") * col("sxy") - col("sx") * col("sy"))
              / (col("n") * col("sxx") - col("sx") * col("sx")) * col("sx"))
              / col("n"), 6).as("intercept"),
            round(((col("n") * col("sxy") - col("sx") * col("sy"))
              * (col("n") * col("sxy") - col("sx") * col("sy")))
              / ((col("n") * col("sxx") - col("sx") * col("sx"))
                * (col("n") * col("syy") - col("sy") * col("sy"))), 6).as("r2"))
      },
      Some("""WITH daily AS (
             |  SELECT strftime(ts, '%Y-%m-%d') AS day,
             |    CAST(COUNT(*) AS DOUBLE) AS y
             |  FROM events GROUP BY 1),
             |idx AS (SELECT y,
             |    CAST(ROW_NUMBER() OVER (ORDER BY day) AS DOUBLE) - 1 AS x
             |  FROM daily),
             |m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(x) AS sx,
             |    SUM(y) AS sy, SUM(x*y) AS sxy, SUM(x*x) AS sxx,
             |    SUM(y*y) AS syy
             |  FROM idx)
             |SELECT CAST(n AS BIGINT) AS n_days,
             |  ROUND((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) AS slope,
             |  ROUND((sy - (n*sxy - sx*sy) / (n*sxx - sx*sx) * sx) / n, 6)
             |    AS intercept,
             |  ROUND(((n*sxy - sx*sy) * (n*sxy - sx*sy))
             |    / ((n*sxx - sx*sx) * (n*syy - sy*sy)), 6) AS r2
             |FROM m""".stripMargin)),

    Q("nation_supplier_hhi", // supplier concentration per nation: the
      // Herfindahl–Hirschman index of lineitem share, from exact integer
      // counts (Σc² / N² per nation). Fact table aggregates FIRST on the
      // supplier key; the supplier→nation dims broadcast onto the
      // supplier-grained rollup, never onto raw lineitem.
      (s, d) => {
        val perSupp = t(s, d, "lineitem")
          .groupBy(col("l_suppkey")).agg(count(lit(1)).as("c"))
        val supp = t(s, d, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"))
        val nat = t(s, d, "nation")
          .select(col("n_nationkey"), col("n_name"))
        perSupp
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("nation"))
          .agg(count(lit(1)).as("n_suppliers"),
            sum("c").as("n_lineitems"),
            round(sum(col("c") * col("c")).cast("double")
              / (sum("c") * sum("c")), 6).as("hhi"))
          .orderBy("nation")
      },
      Some("""WITH ps AS (
             |  SELECT l_suppkey, COUNT(*) AS c FROM lineitem GROUP BY 1),
             |j AS (SELECT n.n_name AS nation, ps.c
             |  FROM ps JOIN supplier s ON ps.l_suppkey = s.s_suppkey
             |  JOIN nation n ON s.s_nationkey = n.n_nationkey)
             |SELECT nation, COUNT(*) AS n_suppliers, CAST(SUM(c) AS BIGINT) AS n_lineitems,
             |  ROUND(CAST(SUM(c*c) AS DOUBLE) / (SUM(c) * SUM(c)), 6) AS hhi
             |FROM j GROUP BY nation ORDER BY nation""".stripMargin)),

    Q("doc_kwic", // keyword-in-context concordance: every occurrence of
      // the query term with 3 tokens of context either side — the
      // corpus-inspection primitive behind "show me how this word is
      // used". One posexplode + per-row slices; the token array never
      // shuffles (map-only until the bounded presentation sort).
      (s, d) => {
        val toks = graft.operators.TextAnalysis.tokens(lower(col("text")))
        t(s, d, "documents")
          .select(col("doc_id"), toks.as("tk"))
          .select(col("doc_id"), col("tk"),
            posexplode(col("tk")).as(Seq("p0", "w")))
          .filter(col("w") === "data")
          .select(col("doc_id"), (col("p0") + 1).as("p"),
            concat_ws(" ", slice(col("tk"), greatest(col("p0") - 2, lit(1)),
              col("p0") + 1 - greatest(col("p0") - 2, lit(1)))).as("left_ctx"),
            col("w").as("keyword"),
            concat_ws(" ", slice(col("tk"), col("p0") + 2, lit(3))).as("right_ctx"))
          .orderBy("doc_id", "p").limit(200)
      },
      Some("""WITH d AS (
             |  SELECT doc_id,
             |    string_split_regex(lower(trim(text)), '\s+') AS tk
             |  FROM documents),
             |pos AS (SELECT doc_id, tk,
             |    unnest(range(1, len(tk) + 1)) AS p FROM d)
             |SELECT doc_id, p,
             |  COALESCE(array_to_string(tk[greatest(p - 3, 1):(p - 1)], ' '), '')
             |    AS left_ctx,
             |  tk[p] AS keyword,
             |  COALESCE(array_to_string(tk[(p + 1):least(p + 3, len(tk))], ' '), '')
             |    AS right_ctx
             |FROM pos WHERE tk[p] = 'data'
             |ORDER BY doc_id, p LIMIT 200""".stripMargin)),

    Q("lineitem_weekly_control_chart", // SPC x-bar screen over weekly
      // shipped-quantity means (1996): flag weeks outside ±3σ of the
      // year's weekly-mean distribution. Weekly means are scaled to
      // integer millis (ROUND(q̄·1000)) BEFORE the chart statistics, so
      // the grand mean / σ come from exact integer sums and both engines
      // compute bit-identical z-scores. The chart stats ride window sums
      // over the ~52-row weekly rollup — no scalar join, no second scan.
      (s, d) => {
        val wk = t(s, d, "lineitem")
          .filter(col("l_shipdate") >= ts("1996-01-01")
            && col("l_shipdate") < ts("1997-01-01"))
          .groupBy(date_format(date_trunc("week", col("l_shipdate")),
            "yyyy-MM-dd").as("week"))
          .agg(count(lit(1)).as("n_items"), sum("l_quantity").as("sq"))
          .select(col("week"), col("n_items"),
            round(col("sq") / col("n_items") * 1000, 0).cast("long").as("v"))
        val wAll = Window.partitionBy()
        wk.withColumn("k", count(lit(1)).over(wAll).cast("double"))
          .withColumn("sv", sum("v").over(wAll).cast("double"))
          .withColumn("svv", sum(col("v") * col("v")).over(wAll).cast("double"))
          .withColumn("m", col("sv") / col("k"))
          .withColumn("sd",
            sqrt(col("svv") / col("k") - col("m") * col("m")))
          .select(col("week"), col("n_items"),
            round(col("v") / 1000.0, 3).as("wk_mean"),
            round((col("v") - col("m")) / col("sd"), 4).as("z"),
            (abs(round((col("v") - col("m")) / col("sd"), 4)) > 3.0).as("breach"))
          .orderBy("week")
      },
      Some("""WITH wk AS (
             |  SELECT strftime(date_trunc('week', l_shipdate), '%Y-%m-%d') AS week,
             |    COUNT(*) AS n_items,
             |    CAST(ROUND(SUM(l_quantity) / COUNT(*) * 1000, 0) AS BIGINT) AS v
             |  FROM lineitem
             |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             |    AND l_shipdate < TIMESTAMP '1997-01-01'
             |  GROUP BY 1),
             |st AS (SELECT week, n_items, v,
             |    CAST(COUNT(*) OVER () AS DOUBLE) AS k,
             |    CAST(SUM(v) OVER () AS DOUBLE) AS sv,
             |    CAST(SUM(v * v) OVER () AS DOUBLE) AS svv
             |  FROM wk)
             |SELECT week, n_items, ROUND(v / 1000.0, 3) AS wk_mean,
             |  ROUND((v - sv/k) / sqrt(svv/k - (sv/k)*(sv/k)), 4) AS z,
             |  ABS(ROUND((v - sv/k) / sqrt(svv/k - (sv/k)*(sv/k)), 4)) > 3.0
             |    AS breach
             |FROM st ORDER BY week""".stripMargin)),

    Q("events_interarrival_stats", // inter-arrival time distribution per
      // event type: median/p90/mean of the integer-second gaps between
      // consecutive events — the load-model input for capacity planning,
      // and a drift alarm when p90 moves. One LAG window partitioned by
      // type (total order (ts, event_id) matches the oracle exactly),
      // one agg; exact percentiles interpolate identically from integer
      // gaps in both engines.
      (s, d) => {
        t(s, d, "events")
          .select(col("event_type"),
            col("event_id"), unix_millis(col("ts")).as("ms"))
          .withColumn("gap_s",
            expr("(ms - lag(ms, 1) over (partition by event_type order by ms, event_id)) div 1000"))
          .filter(col("gap_s").isNotNull)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_gaps"),
            round(sum("gap_s").cast("double") / count(lit(1)), 6).as("mean_s"),
            round(expr("percentile(gap_s, 0.5)"), 6).as("p50_s"),
            round(expr("percentile(gap_s, 0.9)"), 6).as("p90_s"))
          .orderBy("event_type")
      },
      Some("""WITH g AS (
             |  SELECT event_type,
             |    (epoch_ms(ts) - LAG(epoch_ms(ts)) OVER (
             |      PARTITION BY event_type ORDER BY epoch_ms(ts), event_id))
             |      // 1000 AS gap_s
             |  FROM events)
             |SELECT event_type, COUNT(*) AS n_gaps,
             |  ROUND(CAST(SUM(gap_s) AS DOUBLE) / COUNT(*), 6) AS mean_s,
             |  ROUND(quantile_cont(gap_s, 0.5), 6) AS p50_s,
             |  ROUND(quantile_cont(gap_s, 0.9), 6) AS p90_s
             |FROM g WHERE gap_s IS NOT NULL
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    Q("doc_hapax_ratio", // vocabulary-richness screen per source: hapax
      // legomena share (terms seen once) and type/token ratio — the
      // classic boilerplate-vs-organic text discriminator (template spam
      // has few hapaxes; organic prose is hapax-heavy). One exploded
      // term count keyed (source, term), one source-keyed rollup — the
      // token stream shuffles once, as aggregated partials.
      (s, d) => t(s, d, "documents")
        .select(col("source"),
          explode(graft.operators.TextAnalysis.tokens(lower(col("text"))))
            .as("term"))
        .groupBy("source", "term").agg(count(lit(1)).as("tf"))
        .groupBy("source")
        .agg(count(lit(1)).as("vocab"),
          sum("tf").as("n_tokens"),
          sum(when(col("tf") === 1, 1).otherwise(0)).as("hapax"))
        .select(col("source"), col("vocab"), col("n_tokens"), col("hapax"),
          round(col("hapax").cast("double") / col("vocab"), 6).as("hapax_ratio"),
          round(col("vocab").cast("double") / col("n_tokens"), 6).as("ttr"))
        .orderBy("source"),
      Some("""WITH tc AS (
             |  SELECT source, t AS term, COUNT(*) AS tf FROM (
             |    SELECT source, unnest(
             |      string_split_regex(lower(trim(text)), '\s+')) AS t
             |    FROM documents)
             |  GROUP BY 1, 2)
             |SELECT source, COUNT(*) AS vocab,
             |  CAST(SUM(tf) AS BIGINT) AS n_tokens,
             |  CAST(SUM(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
             |  ROUND(CAST(SUM(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             |    / COUNT(*), 6) AS hapax_ratio,
             |  ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(tf), 6) AS ttr
             |FROM tc GROUP BY source ORDER BY source""".stripMargin)),

    Q("doc_langid_prf", // language-ID model evaluation: per-class
      // precision / recall / F1 of the heuristic classifier against the
      // fixture's gold labels — the eval-harness operator a pipeline
      // needs before trusting a filter model. Rides the same scan as the
      // confusion matrix; per-class ratios from exact integer counts.
      (s, d) => {
        val cm = t(s, d, "documents")
          .select(col("lang"),
            graft.operators.TextAnalysis.langId(col("text")).as("pred"))
        val gold = cm.groupBy("lang").agg(count(lit(1)).as("support"),
          sum(when(col("pred") === col("lang"), 1).otherwise(0)).as("tp"))
        val predTot = cm.groupBy(col("pred")).agg(count(lit(1)).as("pp"))
        // f1 = 2pr/(p+r) collapses to 2·tp/(support+pp) — one division
        gold.join(broadcast(predTot), col("lang") === col("pred"), "left_outer")
          .select(col("lang"), col("support"), col("tp"),
            round(when(col("tp") === 0, 0.0)
              .otherwise(col("tp").cast("double") / col("pp")), 6).as("precision"),
            round(col("tp").cast("double") / col("support"), 6).as("recall"),
            round(when(col("tp") === 0, 0.0)
              .otherwise(lit(2.0) * col("tp") / (col("support") + col("pp"))), 6)
              .as("f1"))
          .orderBy("lang")
      },
      Some("""WITH f AS (
             |  SELECT lang, text,
             |    string_split_regex(lower(trim(text)), '\s+') AS toks
             |  FROM documents
             |), h AS (
             |  SELECT lang,
             |    regexp_matches(text, '[\x{4e00}-\x{9fff}]') AS cjk,
             |    len(list_filter(toks, t -> list_contains(['the','a','of','and','to','in','is','it','that','for'], t))) AS en,
             |    len(list_filter(toks, t -> list_contains(['le','la','les','de','et','un','une','est','que','pour'], t))) AS fr,
             |    len(list_filter(toks, t -> list_contains(['el','la','los','de','y','un','una','es','que','por'], t))) AS es,
             |    len(list_filter(toks, t -> list_contains(['der','die','das','und','ein','eine','ist','zu','den','für'], t))) AS de
             |  FROM f
             |), cm AS (
             |  SELECT lang,
             |    CASE WHEN cjk THEN 'zh'
             |         WHEN greatest(en, fr, es, de) >= 1 THEN
             |           CASE WHEN en >= fr AND en >= es AND en >= de THEN 'en'
             |                WHEN fr >= es AND fr >= de THEN 'fr'
             |                WHEN es >= de THEN 'es'
             |                ELSE 'de' END
             |         ELSE 'und' END AS pred
             |  FROM h),
             |gold AS (SELECT lang, COUNT(*) AS support,
             |    CAST(SUM(CASE WHEN pred = lang THEN 1 ELSE 0 END) AS BIGINT) AS tp
             |  FROM cm GROUP BY lang),
             |pt AS (SELECT pred, COUNT(*) AS pp FROM cm GROUP BY pred)
             |SELECT g.lang, g.support, g.tp,
             |  ROUND(CASE WHEN g.tp = 0 THEN 0.0
             |    ELSE CAST(g.tp AS DOUBLE) / pt.pp END, 6) AS precision,
             |  ROUND(CAST(g.tp AS DOUBLE) / g.support, 6) AS recall,
             |  ROUND(CASE WHEN g.tp = 0 THEN 0.0
             |    ELSE 2.0 * g.tp / (g.support + pt.pp) END, 6) AS f1
             |FROM gold g LEFT JOIN pt ON g.lang = pt.pred
             |ORDER BY g.lang""".stripMargin)),

    Q("emb_bucket_balance", // ANN index health: occupancy statistics of
      // the 8-plane LSH bucket layout (the emb_lsh_topk index). A skewed
      // bucket histogram means the probe cost bound is a lie — this is
      // the report that says "re-plane or re-seed". One bucket-keyed
      // count + one single-row rollup from exact integer sums.
      (s, d) => {
        graft.plans.GraftFunctions.register(s)
        val planes = Similarity.hyperplanes(64, 8, 42L)
        val counts = t(s, d, "embeddings")
          .select(Similarity.lshBucket(
            transform(col("embedding"), x => x.cast("double")), planes)
            .as("bucket"))
          .groupBy("bucket").agg(count(lit(1)).as("n"))
        counts.agg(
            count(lit(1)).as("n_buckets"),
            sum("n").as("n_vectors"),
            max("n").as("max_bucket"),
            sum(col("n") * col("n")).as("snn"))
          .select(col("n_buckets"), col("n_vectors"), col("max_bucket"),
            round(col("max_bucket").cast("double") / col("n_vectors"), 6)
              .as("max_share"),
            round(sqrt(col("snn").cast("double") / col("n_buckets")
                - (col("n_vectors").cast("double") / col("n_buckets"))
                  * (col("n_vectors").cast("double") / col("n_buckets")))
              / (col("n_vectors").cast("double") / col("n_buckets")), 6)
              .as("occupancy_cv"))
      },
      Some(s"""WITH e AS (SELECT
              |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
              |  FROM embeddings),
              |c AS (SELECT ${LshOracle.bucketSql("emb")} AS bucket,
              |    COUNT(*) AS n
              |  FROM e GROUP BY 1)
              |SELECT COUNT(*) AS n_buckets,
              |  CAST(SUM(n) AS BIGINT) AS n_vectors,
              |  CAST(MAX(n) AS BIGINT) AS max_bucket,
              |  ROUND(CAST(MAX(n) AS DOUBLE) / SUM(n), 6) AS max_share,
              |  ROUND(sqrt(CAST(SUM(n*n) AS DOUBLE) / COUNT(*)
              |      - (CAST(SUM(n) AS DOUBLE) / COUNT(*))
              |        * (CAST(SUM(n) AS DOUBLE) / COUNT(*)))
              |    / (CAST(SUM(n) AS DOUBLE) / COUNT(*)), 6) AS occupancy_cv
              |FROM c""".stripMargin)),

    Q("doc_cluster_size_hist", // dedup observability: the cluster-size
      // histogram (how much of the corpus collapses, and into how big a
      // clump) — the number a dedup run is judged by before anyone
      // trusts keep-one. Rides the proven connected-components pipeline;
      // one extra size-keyed count over the (already tiny) cluster table.
      (s, d) => graft.operators.Dedup
        .dupClustersOf(dupClusterLabels(s, d))
        .groupBy(col("n_members").as("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"))
        .orderBy("cluster_size"),
      Some(dupClustersCte + """
             |, sizes AS (
             |  SELECT cluster_id, COUNT(*) AS cluster_size
             |  FROM comp GROUP BY cluster_id)
             |SELECT cluster_size, COUNT(*) AS n_clusters
             |FROM sizes GROUP BY cluster_size ORDER BY cluster_size""".stripMargin)),

    Q("events_stickiness", // DAU / WAU / MAU + the DAU/MAU stickiness
      // ratio — the engagement trinity. Computed in ONE pass over the
      // (user, day) distinct activity: each activity day fans out
      // map-side to the ≤30 report days it can influence, the per-user
      // duplicate fan-outs collapse to the MINIMUM offset in one keyed
      // agg, and DAU/WAU/MAU are then conditional counts on that offset
      // (0 / ≤6 / ≤29) — three rolling DISTINCT windows for the price of
      // one shuffle, no per-window re-scan. Report days clip to the
      // observed range with a semi join against the real day set.
      (s, d) => {
        val ud = t(s, d, "events")
          .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        val fan = ud
          .select(col("user_id"), col("day"),
            explode(sequence(lit(0), lit(29))).as("o"))
          .select(col("user_id"), expr("date_add(day, o)").as("rday"),
            col("o"))
          .groupBy("user_id", "rday").agg(min("o").as("mo"))
        fan
          .join(ud.select(col("day").as("rday")).distinct(), Seq("rday"),
            "left_semi")
          .groupBy("rday")
          .agg(sum(when(col("mo") === 0, 1).otherwise(0)).as("dau"),
            sum(when(col("mo") <= 6, 1).otherwise(0)).as("wau"),
            count(lit(1)).as("mau"))
          .select(date_format(col("rday"), "yyyy-MM-dd").as("day"),
            col("dau"), col("wau"), col("mau"),
            round(col("dau").cast("double") / col("mau"), 6).as("stickiness"))
          .orderBy("day")
      },
      Some("""WITH ud AS (
             |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
             |fan AS (
             |  SELECT user_id, day + to_days(CAST(o AS INT)) AS rday,
             |    MIN(o) AS mo
             |  FROM ud, unnest(range(0, 30)) AS t(o)
             |  GROUP BY 1, 2),
             |clipped AS (
             |  SELECT f.* FROM fan f
             |  WHERE f.rday IN (SELECT DISTINCT day FROM ud))
             |SELECT strftime(rday, '%Y-%m-%d') AS day,
             |  CAST(SUM(CASE WHEN mo = 0 THEN 1 ELSE 0 END) AS BIGINT) AS dau,
             |  CAST(SUM(CASE WHEN mo <= 6 THEN 1 ELSE 0 END) AS BIGINT) AS wau,
             |  COUNT(*) AS mau,
             |  ROUND(CAST(SUM(CASE WHEN mo = 0 THEN 1 ELSE 0 END) AS DOUBLE)
             |    / COUNT(*), 6) AS stickiness
             |FROM clipped GROUP BY rday ORDER BY day""".stripMargin)),

    Q("orders_mom_growth", // month-over-month and year-over-year revenue
      // growth: the reporting staple. One month-grained rollup (revenue
      // rounded BEFORE the lags so both engines difference identical
      // doubles), two LAG windows over the bounded ~80-row month series.
      (s, d) => {
        val w = Window.orderBy("ym")
        t(s, d, "orders")
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
          .agg(round(sum("o_totalprice"), 2).as("rev"))
          .withColumn("prev_m", lag("rev", 1).over(w))
          .withColumn("prev_y", lag("rev", 12).over(w))
          .select(col("ym"), col("rev"),
            round((col("rev") - col("prev_m")) / col("prev_m") * 100, 4)
              .as("mom_pct"),
            round((col("rev") - col("prev_y")) / col("prev_y") * 100, 4)
              .as("yoy_pct"))
          .orderBy("ym")
      },
      Some("""WITH m AS (
             |  SELECT strftime(o_orderdate, '%Y-%m') AS ym,
             |    ROUND(SUM(o_totalprice), 2) AS rev
             |  FROM orders GROUP BY 1),
             |l AS (SELECT ym, rev,
             |    LAG(rev, 1) OVER (ORDER BY ym) AS prev_m,
             |    LAG(rev, 12) OVER (ORDER BY ym) AS prev_y
             |  FROM m)
             |SELECT ym, rev,
             |  ROUND((rev - prev_m) / prev_m * 100, 4) AS mom_pct,
             |  ROUND((rev - prev_y) / prev_y * 100, 4) AS yoy_pct
             |FROM l ORDER BY ym""".stripMargin)),

    Q("window_cume_nth", // the remaining §2.5 window family members:
      // cume_dist (value-based, tie-stable) and nth_value over an
      // explicit full frame — evaluated per order within its priority
      // class, on the bounded first-100-customer slice. The nth_value
      // frame is pinned to the WHOLE partition (default would stop at
      // the current row) with a total (price, orderkey) order.
      (s, d) => {
        val w = Window.partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        val wf = w.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)
        t(s, d, "orders")
          .filter(col("o_custkey") <= 100)
          .select(col("o_orderpriority"), col("o_orderkey"),
            round(col("o_totalprice"), 2).as("price"),
            round(cume_dist().over(w), 6).as("cd"),
            round(nth_value(col("o_totalprice"), 3).over(wf), 2)
              .as("third_cheapest"))
          .orderBy("o_orderpriority", "price", "o_orderkey")
      },
      Some("""SELECT o_orderpriority, o_orderkey,
             |  ROUND(o_totalprice, 2) AS price,
             |  ROUND(CUME_DIST() OVER w, 6) AS cd,
             |  ROUND(NTH_VALUE(o_totalprice, 3) OVER (
             |    PARTITION BY o_orderpriority
             |    ORDER BY o_totalprice, o_orderkey
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
             |    AS third_cheapest
             |FROM orders WHERE o_custkey <= 100
             |WINDOW w AS (PARTITION BY o_orderpriority
             |  ORDER BY o_totalprice, o_orderkey)
             |ORDER BY o_orderpriority, price, o_orderkey""".stripMargin)),

    Q("events_gap_islands", // gaps-and-islands: each user's longest
      // streak of CONSECUTIVE active days — the retention feature the
      // cohort triangle can't see. Island id = day − dense day-rank
      // (constant within a consecutive run); two windows over the
      // (user, day) distinct activity, never over raw events; integer
      // day arithmetic is bit-exact.
      (s, d) => {
        val ud = t(s, d, "events")
          .select(col("user_id"),
            datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
              .as("dn"))
          .distinct()
        val w = Window.partitionBy("user_id").orderBy("dn")
        val runs = ud
          .withColumn("grp", col("dn") - row_number().over(w))
          .groupBy("user_id", "grp")
          .agg(count(lit(1)).as("len"), min("dn").as("start_dn"))
        runs.groupBy("user_id")
          .agg(max(struct(col("len"), col("start_dn"))).as("m"),
            count(lit(1)).as("n_streaks"))
          .select(col("user_id"), col("m.len").as("best_streak"),
            date_format(expr("date_add(DATE '1970-01-01', CAST(m.start_dn AS INT))"),
              "yyyy-MM-dd").as("best_start"),
            col("n_streaks"))
          .orderBy(col("best_streak").desc, col("user_id")).limit(50)
      },
      Some("""WITH ud AS (
             |  SELECT DISTINCT user_id,
             |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS dn
             |  FROM events),
             |runs AS (
             |  SELECT user_id,
             |    dn - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY dn) AS grp,
             |    dn
             |  FROM ud),
             |agg AS (
             |  SELECT user_id, grp, COUNT(*) AS len, MIN(dn) AS start_dn
             |  FROM runs GROUP BY 1, 2),
             |best AS (
             |  SELECT user_id, COUNT(*) AS n_streaks,
             |    MAX(struct_pack(len := len, start_dn := start_dn)) AS m
             |  FROM agg GROUP BY user_id)
             |SELECT user_id, m.len AS best_streak,
             |  strftime(DATE '1970-01-01' + to_days(CAST(m.start_dn AS INT)),
             |    '%Y-%m-%d') AS best_start,
             |  n_streaks
             |FROM best ORDER BY best_streak DESC, user_id LIMIT 50""".stripMargin)),

    Q("lineitem_return_rates", // monthly return-rate series: items and
      // quantity share flagged 'R', from exact integer counts — the
      // service-quality monitor. One month-keyed conditional agg.
      (s, d) => t(s, d, "lineitem")
        .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("ym"))
        .agg(count(lit(1)).as("n_items"),
          sum(when(col("l_returnflag") === "R", 1).otherwise(0)).as("n_returned"))
        .select(col("ym"), col("n_items"), col("n_returned"),
          round(col("n_returned").cast("double") / col("n_items"), 6)
            .as("return_rate"))
        .orderBy("ym"),
      Some("""SELECT strftime(l_shipdate, '%Y-%m') AS ym,
             |  COUNT(*) AS n_items,
             |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_returned,
             |  ROUND(CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
             |    AS DOUBLE) / COUNT(*), 6) AS return_rate
             |FROM lineitem GROUP BY 1 ORDER BY ym""".stripMargin)),

    Q("doc_minhash_calibration", // sketch-quality eval: for every LSH
      // candidate pair, compare the MinHash ESTIMATE of Jaccard
      // (matching lanes / 64) against the exact shingle Jaccard — the
      // report that says whether 64 lanes is enough before anyone trusts
      // the banded dedup at scale. Signatures ride the portable md5
      // pipeline the oracle reproduces lane-for-lane; the lane-match
      // fold runs over 64-element arrays on the (bounded) candidate
      // pairs only.
      (s, d) => {
        graft.plans.GraftFunctions.register(s)
        val sg = minhashSigs(s, d).select(col("id"), col("sig").as("g"))
        val pairs = Dedup.minhashNearDupsPortableOf(minhashSigs(s, d),
          threshold = 0.05)
        pairs
          .join(sg.select(col("id").as("id_a"), col("g").as("ga")), Seq("id_a"))
          .join(sg.select(col("id").as("id_b"), col("g").as("gb")), Seq("id_b"))
          .select(col("jaccard"),
            (aggregate(zip_with(col("ga"), col("gb"),
                (x, y) => (x === y).cast("int")),
              lit(0), (acc, v) => acc + v).cast("double") / 64).as("est"))
          .agg(count(lit(1)).as("n_pairs"),
            round(avg(abs(col("est") - col("jaccard"))), 6).as("mean_abs_err"),
            round(max(abs(col("est") - col("jaccard"))), 6).as("max_abs_err"))
      },
      Some("""WITH d AS (
             |  SELECT doc_id AS id, string_split_regex(lower(trim(text)), '\s+') AS t
             |  FROM documents
             |), s AS (
             |  SELECT id, list_distinct(list_transform(
             |    range(0, greatest(len(t) - 2, 1)),
             |    i -> array_to_string(t[(i+1):(i+3)], ' '))) AS sh
             |  FROM d
             |), hm AS (
             |  SELECT id, sh, list_transform(sh,
             |    x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % 2147483647) AS hs
             |  FROM s
             |), sig AS (
             |  SELECT id, sh, list_transform(range(0, 64), j -> list_min(
             |    list_transform(hs, h -> ((j*2+1) * h + j*12347 + 1) % 2147483647))) AS g
             |  FROM hm
             |), banded AS (
             |  SELECT id, b.b AS band,
             |    array_to_string(g[(b.b*4+1):(b.b*4+4)], ',') AS bucket
             |  FROM sig, range(0, 16) AS b(b)
             |), cand AS (
             |  SELECT DISTINCT a.id AS id_a, c.id AS id_b
             |  FROM banded a JOIN banded c
             |    ON a.band = c.band AND a.bucket = c.bucket AND a.id < c.id
             |), scored AS (
             |  SELECT CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
             |      / len(list_distinct(list_concat(x.sh, y.sh))) AS jaccard,
             |    CAST(len(list_filter(range(64),
             |      j -> x.g[j+1] = y.g[j+1])) AS DOUBLE) / 64 AS est
             |  FROM cand JOIN sig x ON cand.id_a = x.id
             |  JOIN sig y ON cand.id_b = y.id
             |  WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
             |      / len(list_distinct(list_concat(x.sh, y.sh))) >= 0.05
             |)
             |SELECT COUNT(*) AS n_pairs,
             |  ROUND(AVG(ABS(est - jaccard)), 6) AS mean_abs_err,
             |  ROUND(MAX(ABS(est - jaccard)), 6) AS max_abs_err
             |FROM scored""".stripMargin)),

    Q("source_csv_quarantine", // malformed-row quarantine for CSV ingest
      // (the csv twin of events_json_quarantine): a deterministic CSV
      // copy of customer carries a type-corrupt acctbal on every 10th
      // key; PERMISSIVE parsing routes those rows to the corrupt-record
      // lane instead of failing the job, and the good lane's aggregate
      // proves the parse. The oracle re-derives both counts from the
      // corruption RULE over the clean table — an independent check that
      // quarantine catches exactly the planted rows.
      (s, d) => {
        import org.apache.spark.sql.types._
        val tag = new java.io.File(d).getName.replace(".", "_")
        val path = s"/tmp/graft_csvq_$tag"
        // gate reuse on the atomic _SUCCESS marker, not the directory: a
        // crashed earlier write leaves the dir (and maybe _temporary/)
        // behind, and silently reusing a partial fixture corrupts both
        // the timed read and the oracle compare
        if (!new java.io.File(s"$path/_SUCCESS").exists()) {
          t(s, d, "customer")
            .select(col("c_custkey"), col("c_name"),
              when(col("c_custkey") % 10 === 0, lit("bad"))
                .otherwise(col("c_acctbal").cast("string")).as("acctbal"))
            .coalesce(1)
            .write.mode("overwrite").option("header", "false").csv(path)
        }
        val schema = StructType(Seq(
          StructField("c_custkey", LongType),
          StructField("c_name", StringType),
          StructField("acctbal", DoubleType),
          StructField("_bad", StringType)))
        // single consumer (the one aggregate below): caching would only
        // add a session-lifetime pinned copy nobody reads twice
        val parsed = s.read.schema(schema)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_bad")
          .csv(path)
        parsed.agg(
          sum(when(col("_bad").isNull, 1).otherwise(0)).as("n_good"),
          sum(when(col("_bad").isNotNull, 1).otherwise(0)).as("n_quarantined"),
          round(sum(when(col("_bad").isNull, col("acctbal"))), 2)
            .as("good_acctbal_sum"))
      },
      Some("""SELECT
             |  CAST(SUM(CASE WHEN c_custkey % 10 <> 0 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_good,
             |  CAST(SUM(CASE WHEN c_custkey % 10 = 0 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_quarantined,
             |  ROUND(SUM(CASE WHEN c_custkey % 10 <> 0 THEN c_acctbal END), 2)
             |    AS good_acctbal_sum
             |FROM customer""".stripMargin)),

    Q("dq_freshness_report", // data-freshness audit: per time-bearing
      // table, the newest record vs the fixture's pinned anchor and the
      // row count — the staleness monitor every ingestion SLA needs.
      // Three MAX/COUNT scans unioned; anchors are data-pinned dates
      // (SURVEY §5), never wall-clock.
      (s, d) => {
        def row(name: String, df: DataFrame, tsCol: Column, anchor: String) =
          df.agg(count(lit(1)).as("n_rows"),
              max(date_format(tsCol, "yyyy-MM-dd")).as("newest"))
            .select(lit(name).as("table_name"), col("n_rows"), col("newest"),
              datediff(lit(anchor).cast("date"), to_date(col("newest")))
                .as("days_stale"))
        row("events", t(s, d, "events"), col("ts"), "2024-03-01")
          .unionByName(row("orders", t(s, d, "orders"), col("o_orderdate"),
            "2002-01-01"))
          .unionByName(row("lineitem", t(s, d, "lineitem"), col("l_shipdate"),
            "2002-01-01"))
          .orderBy("table_name")
      },
      Some("""SELECT 'events' AS table_name, COUNT(*) AS n_rows,
             |  MAX(strftime(ts, '%Y-%m-%d')) AS newest,
             |  date_diff('day', MAX(CAST(ts AS DATE)), DATE '2024-03-01')
             |    AS days_stale
             |FROM events
             |UNION ALL
             |SELECT 'lineitem', COUNT(*),
             |  MAX(strftime(l_shipdate, '%Y-%m-%d')),
             |  date_diff('day', MAX(CAST(l_shipdate AS DATE)), DATE '2002-01-01')
             |FROM lineitem
             |UNION ALL
             |SELECT 'orders', COUNT(*),
             |  MAX(strftime(o_orderdate, '%Y-%m-%d')),
             |  date_diff('day', MAX(CAST(o_orderdate AS DATE)), DATE '2002-01-01')
             |FROM orders
             |ORDER BY table_name""".stripMargin)),

    Q("lineitem_discount_elasticity", // does discount move quantity?
      // Per-discount-band average quantity plus the fitted OLS slope of
      // avg-qty against discount percent — the pricing-analytics staple.
      // Bands are exact integer cents; per-band sums are exact; the
      // 11-point regression rides window sums over the band rollup.
      (s, d) => {
        val bands = t(s, d, "lineitem")
          .groupBy(round(col("l_discount") * 100, 0).cast("int").as("discount_pct"))
          .agg(count(lit(1)).as("n_items"), sum("l_quantity").as("sq"))
          .select(col("discount_pct"), col("n_items"),
            (col("sq") / col("n_items")).as("aq"))
        val wAll = Window.partitionBy()
        bands
          .withColumn("k", count(lit(1)).over(wAll).cast("double"))
          .withColumn("sx", sum("discount_pct").over(wAll).cast("double"))
          .withColumn("sy", sum("aq").over(wAll))
          .withColumn("sxy", sum(col("discount_pct") * col("aq")).over(wAll))
          .withColumn("sxx",
            sum(col("discount_pct") * col("discount_pct")).over(wAll).cast("double"))
          .select(col("discount_pct"), col("n_items"),
            round(col("aq"), 6).as("avg_qty"),
            round((col("k") * col("sxy") - col("sx") * col("sy"))
              / (col("k") * col("sxx") - col("sx") * col("sx")), 6)
              .as("qty_per_discount_pt"))
          .orderBy("discount_pct")
      },
      Some("""WITH bands AS (
             |  SELECT CAST(ROUND(l_discount * 100, 0) AS INT) AS discount_pct,
             |    COUNT(*) AS n_items, SUM(l_quantity) / COUNT(*) AS aq
             |  FROM lineitem GROUP BY 1),
             |st AS (SELECT discount_pct, n_items, aq,
             |    CAST(COUNT(*) OVER () AS DOUBLE) AS k,
             |    CAST(SUM(discount_pct) OVER () AS DOUBLE) AS sx,
             |    SUM(aq) OVER () AS sy,
             |    SUM(discount_pct * aq) OVER () AS sxy,
             |    CAST(SUM(discount_pct * discount_pct) OVER () AS DOUBLE) AS sxx
             |  FROM bands)
             |SELECT discount_pct, n_items, ROUND(aq, 6) AS avg_qty,
             |  ROUND((k*sxy - sx*sy) / (k*sxx - sx*sx), 6)
             |    AS qty_per_discount_pt
             |FROM st ORDER BY discount_pct""".stripMargin)),

    Q("orders_fulfillment_lag", // order-to-ship lag distribution by ship
      // month: mean and exact p90 of integer day lags through the
      // orders⋈lineitem fact join — the operations SLA monitor. The lag
      // is integer days, so the interpolated percentile computes
      // identically in both engines.
      (s, d) => t(s, d, "lineitem")
        .join(t(s, d, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select(date_format(col("l_shipdate"), "yyyy-MM").as("ym"),
          datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
            .as("lag_d"))
        .groupBy("ym")
        .agg(count(lit(1)).as("n_items"),
          round(sum("lag_d").cast("double") / count(lit(1)), 6).as("mean_lag_d"),
          round(expr("percentile(lag_d, 0.9)"), 6).as("p90_lag_d"))
        .orderBy("ym"),
      Some("""WITH j AS (
             |  SELECT strftime(l_shipdate, '%Y-%m') AS ym,
             |    date_diff('day', CAST(o_orderdate AS DATE),
             |      CAST(l_shipdate AS DATE)) AS lag_d
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
             |SELECT ym, COUNT(*) AS n_items,
             |  ROUND(CAST(SUM(lag_d) AS DOUBLE) / COUNT(*), 6) AS mean_lag_d,
             |  ROUND(quantile_cont(lag_d, 0.9), 6) AS p90_lag_d
             |FROM j GROUP BY ym ORDER BY ym""".stripMargin)),

    Q("doc_source_js_divergence", // corpus comparison: Jensen–Shannon
      // divergence between the unigram distributions of source pairs
      // (src0..src4) — the principled "are these two slices the same
      // kind of text" number behind mixture design. Only SHARED terms
      // ever join (inner join on the term key); each side's disjoint
      // mass folds in closed-form as (1 − shared_mass)·ln 2, so there is
      // no vocab×vocab or outer-join blow-up. Totals broadcast from the
      // 5-row source rollup.
      (s, d) => {
        val tc = t(s, d, "documents")
          .filter(col("source").isin("src0", "src1", "src2", "src3", "src4"))
          .select(col("source"),
            explode(graft.operators.TextAnalysis.tokens(lower(col("text"))))
              .as("term"))
          .groupBy("source", "term").agg(count(lit(1)).as("c"))
        val tot = tc.groupBy("source").agg(sum("c").as("n"))
        val a = tc.select(col("source").as("sa"), col("term"), col("c").as("ca"))
        val b = tc.select(col("source").as("sb"), col("term"), col("c").as("cb"))
        val sh = a.join(b, Seq("term")).filter(col("sa") < col("sb"))
          .join(broadcast(tot.select(col("source").as("sa"), col("n").as("na"))),
            Seq("sa"))
          .join(broadcast(tot.select(col("source").as("sb"), col("n").as("nb"))),
            Seq("sb"))
          .select(col("sa"), col("sb"),
            (col("ca").cast("double") / col("na")).as("p"),
            (col("cb").cast("double") / col("nb")).as("q"))
        sh.groupBy("sa", "sb")
          .agg(count(lit(1)).as("shared_terms"),
            sum("p").as("pm"), sum("q").as("qm"),
            sum(col("p") * log(lit(2.0) * col("p") / (col("p") + col("q"))))
              .as("kp"),
            sum(col("q") * log(lit(2.0) * col("q") / (col("p") + col("q"))))
              .as("kq"))
          .select(col("sa").as("src_a"), col("sb").as("src_b"),
            col("shared_terms"),
            round((lit(0.5) * (col("kp") + (lit(1.0) - col("pm")) * log(lit(2.0)))
              + lit(0.5) * (col("kq") + (lit(1.0) - col("qm")) * log(lit(2.0)))), 6)
              .as("js_divergence"))
          .orderBy("src_a", "src_b")
      },
      Some("""WITH tc AS (
             |  SELECT source, t AS term, COUNT(*) AS c FROM (
             |    SELECT source, unnest(
             |      string_split_regex(lower(trim(text)), '\s+')) AS t
             |    FROM documents
             |    WHERE source IN ('src0','src1','src2','src3','src4'))
             |  GROUP BY 1, 2),
             |tot AS (SELECT source, SUM(c) AS n FROM tc GROUP BY 1),
             |sh AS (
             |  SELECT a.source AS sa, b.source AS sb,
             |    CAST(a.c AS DOUBLE) / ta.n AS p,
             |    CAST(b.c AS DOUBLE) / tb.n AS q
             |  FROM tc a JOIN tc b ON a.term = b.term AND a.source < b.source
             |  JOIN tot ta ON ta.source = a.source
             |  JOIN tot tb ON tb.source = b.source)
             |SELECT sa AS src_a, sb AS src_b, COUNT(*) AS shared_terms,
             |  ROUND(0.5 * (SUM(p * ln(2.0 * p / (p + q)))
             |      + (1.0 - SUM(p)) * ln(2.0))
             |    + 0.5 * (SUM(q * ln(2.0 * q / (p + q)))
             |      + (1.0 - SUM(q)) * ln(2.0)), 6) AS js_divergence
             |FROM sh GROUP BY sa, sb ORDER BY src_a, src_b""".stripMargin)),

    Q("emb_silhouette_report", // labeled-embedding cluster quality: each
      // vector's cosine to its OWN label centroid vs its best OTHER
      // centroid — per-label mean margin and misassignment count, the
      // report that grades an embedding space before anyone clusters on
      // it. Centroid dims round to 6dp first, so both engines score
      // bit-identical inputs; the 10-row centroid table broadcasts into
      // a scalar fan-out join.
      (s, d) => {
        graft.plans.GraftFunctions.register(s)
        val e = t(s, d, "embeddings")
          .select(col("vec_id"), col("label"),
            transform(col("embedding"), x => x.cast("double")).as("emb"))
        val cents = Similarity.centroids(t(s, d, "embeddings"))
          .select(col("cluster"),
            transform(col("centroid"), x => round(x, 6)).as("cent"))
        val scored = e.crossJoin(broadcast(cents))
          .select(col("vec_id"), col("label"), col("cluster"),
            VectorFunctions.cosine(col("emb"), col("cent")).as("cos"))
        scored.groupBy("vec_id", "label")
          .agg(max(when(col("cluster") === col("label"), col("cos"))).as("own"),
            max(when(col("cluster") =!= col("label"), col("cos"))).as("bo"))
          .groupBy("label")
          .agg(count(lit(1)).as("n_vectors"),
            round(avg(col("own") - col("bo")), 6).as("mean_margin"),
            sum(when(col("bo") > col("own"), 1).otherwise(0)).as("n_misassigned"))
          .orderBy("label")
      },
      Some("""WITH e AS (
             |  SELECT vec_id, label,
             |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
             |  FROM embeddings),
             |cd AS (SELECT label AS cluster, i AS dim,
             |    ROUND(AVG(CAST(embedding[i] AS DOUBLE)), 6) AS m
             |  FROM embeddings, range(1, 65) t(i) GROUP BY 1, 2),
             |c AS (SELECT cluster, list(m ORDER BY dim) AS cent
             |  FROM cd GROUP BY cluster),
             |sc AS (SELECT vec_id, label, cluster,
             |    list_cosine_similarity(emb, cent) AS cos
             |  FROM e, c),
             |a AS (SELECT vec_id, label,
             |    MAX(CASE WHEN cluster = label THEN cos END) AS own,
             |    MAX(CASE WHEN cluster <> label THEN cos END) AS bo
             |  FROM sc GROUP BY 1, 2)
             |SELECT label, COUNT(*) AS n_vectors,
             |  ROUND(AVG(own - bo), 6) AS mean_margin,
             |  CAST(SUM(CASE WHEN bo > own THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_misassigned
             |FROM a GROUP BY label ORDER BY label""".stripMargin)),

    Q("orders_open_backlog", // open-order backlog over time WITHOUT an
      // interval×day join: each order contributes a +1 delta at its
      // order date and a −1 at its close (last ship) date, the deltas
      // collapse to one row per day, and a single ordered cumsum yields
      // the standing backlog — the interval-stabbing pattern that scales
      // to billions of intervals where a per-day range join cannot.
      // Month-end sampling via max_by over the day-grained series.
      (s, d) => {
        val closed = t(s, d, "lineitem")
          .groupBy(col("l_orderkey")).agg(max(col("l_shipdate")).as("cd"))
        val spans = t(s, d, "orders")
          .join(closed, col("o_orderkey") === col("l_orderkey"))
          .select(to_date(col("o_orderdate")).as("od"), to_date(col("cd")).as("cd"))
        val deltas = spans.select(col("od").as("day"), lit(1).as("delta"))
          .unionAll(spans.select(col("cd").as("day"), lit(-1).as("delta")))
          .groupBy("day").agg(sum("delta").as("dd"))
        val w = Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        deltas
          .withColumn("backlog", sum("dd").over(w))
          .groupBy(date_format(col("day"), "yyyy-MM").as("ym"))
          .agg(max_by(col("backlog"), col("day")).as("month_end_backlog"))
          .orderBy("ym")
      },
      Some("""WITH closed AS (
             |  SELECT l_orderkey, MAX(l_shipdate) AS cd
             |  FROM lineitem GROUP BY 1),
             |spans AS (
             |  SELECT CAST(o_orderdate AS DATE) AS od, CAST(cd AS DATE) AS cd
             |  FROM orders JOIN closed ON o_orderkey = l_orderkey),
             |deltas AS (
             |  SELECT day, SUM(delta) AS dd FROM (
             |    SELECT od AS day, 1 AS delta FROM spans
             |    UNION ALL SELECT cd, -1 FROM spans)
             |  GROUP BY day),
             |series AS (
             |  SELECT day,
             |    SUM(dd) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS backlog
             |  FROM deltas),
             |me AS (SELECT strftime(day, '%Y-%m') AS ym, day, backlog,
             |    ROW_NUMBER() OVER (PARTITION BY strftime(day, '%Y-%m')
             |      ORDER BY day DESC) AS rn
             |  FROM series)
             |SELECT ym, CAST(backlog AS BIGINT) AS month_end_backlog
             |FROM me WHERE rn = 1 ORDER BY ym""".stripMargin)),

    Q("emb_knn_classifier_eval", // k-NN label-prediction accuracy over
      // the labeled embedding space: vectors in a BOUNDED eval sample
      // are classified by the majority label of their 5 nearest
      // neighbors in the FULL corpus (LSH-blocked kNN join — never
      // all-pairs), ties toward the smaller label; per-label coverage
      // and accuracy. Production eval fixes the query set: the sample
      // is a deterministic id-stride slice of ~256 vectors no matter
      // the corpus size (stride 1 = every vector at the 500-vector
      // sf0.01 fixture), so eval cost is O(sample · probes · occupancy)
      // — constant as the index grows — while the graded index stays
      // the whole corpus. The kNN join is AUTO-PLANED (occupancy
      // target 2 → 8 planes at sf0.01); the oracle replays the
      // identical stride slice and blocked pipeline from the matching
      // 8-plane constants.
      (s, d) => {
        val e = t(s, d, "embeddings")
        val stride = math.max(1L, e.count() / 256)
        val q = e.filter(col("vec_id") % stride === 0)
        val lbl = q.select(col("vec_id"), col("label"))
        val nn = Similarity.knnJoin(e, q, k = 5)
        val votes = nn
          .join(broadcast(e.select(col("vec_id").as("nn_id"),
            col("label").as("nn_label"))), Seq("nn_id"))
          .groupBy(col("q_id"), col("nn_label")).agg(count(lit(1)).as("v"))
          .groupBy("q_id")
          .agg(max(struct(col("v"), (-col("nn_label")).as("neg"))).as("m"))
          .select(col("q_id"), (-col("m.neg")).as("pred"))
        val graded = lbl
          .join(votes, col("vec_id") === col("q_id"), "left_outer")
        graded.groupBy(col("label"))
          .agg(count(lit(1)).as("n_vectors"),
            sum(when(col("pred").isNotNull, 1).otherwise(0)).as("n_classified"),
            sum(when(col("pred") === col("label"), 1).otherwise(0))
              .as("n_correct"))
          .select(col("label"), col("n_vectors"), col("n_classified"),
            col("n_correct"),
            round(col("n_correct").cast("double") / col("n_classified"), 6)
              .as("knn_accuracy"))
          .orderBy("label")
      },
      Some(s"""WITH n0 AS (SELECT GREATEST(1, COUNT(*) // 256) AS stride
             |  FROM embeddings),
             |e AS (SELECT vec_id, label,
             |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings),
             |qs AS (SELECT vec_id, label, emb FROM e, n0
             |  WHERE vec_id % stride = 0),
             |base AS (SELECT vec_id AS nn_id, label AS nn_label, emb AS nn_vec,
             |  ${LshOracle.bucketSql("emb")} AS bucket FROM e),
             |q0 AS (SELECT vec_id AS q_id, emb AS q_vec,
             |  ${LshOracle.bucketSql("emb")} AS qb FROM qs),
             |qp AS (SELECT q_id, q_vec, xor(qb, t.m) AS bucket
             |  FROM q0, unnest(${LshOracle.probeMasks}) AS t(m)),
             |pairs AS (SELECT DISTINCT q_id, nn_id,
             |  ROUND(list_cosine_similarity(q_vec, nn_vec), 6) AS cos
             |  FROM qp JOIN base USING (bucket) WHERE q_id <> nn_id),
             |ranked AS (SELECT q_id, nn_id, cos,
             |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, nn_id) AS rank
             |  FROM pairs),
             |votes AS (SELECT r.q_id, b.nn_label, COUNT(*) AS v
             |  FROM ranked r JOIN base b ON r.nn_id = b.nn_id
             |  WHERE r.rank <= 5 GROUP BY 1, 2),
             |pred AS (SELECT q_id, nn_label AS pred FROM (
             |    SELECT q_id, nn_label, ROW_NUMBER() OVER (
             |      PARTITION BY q_id ORDER BY v DESC, nn_label) AS pr
             |    FROM votes) WHERE pr = 1),
             |graded AS (SELECT qs.vec_id, qs.label, p.pred
             |  FROM qs LEFT JOIN pred p ON qs.vec_id = p.q_id)
             |SELECT label, COUNT(*) AS n_vectors,
             |  CAST(SUM(CASE WHEN pred IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_classified,
             |  CAST(SUM(CASE WHEN pred = label THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_correct,
             |  ROUND(CAST(SUM(CASE WHEN pred = label THEN 1 ELSE 0 END) AS DOUBLE)
             |    / SUM(CASE WHEN pred IS NOT NULL THEN 1 ELSE 0 END), 6)
             |    AS knn_accuracy
             |FROM graded GROUP BY label ORDER BY label""".stripMargin)),

    Q("part_newsvendor_stock", // newsvendor stocking level: at a 9:1
      // underage:overage cost ratio the optimal stock is the 90th
      // demand percentile — read as an EXACT order statistic
      // (PERCENTILE_DISC at rank ⌈0.9·n⌉) of each part's monthly
      // demand history, part-keyed windows over the (part, month)
      // rollup. Reported for the 20 highest-volume parts; every value
      // is an exact integer, bit-deterministic.
      (s, d) => {
        val md = t(s, d, "lineitem")
          .groupBy(col("l_partkey"),
            date_format(col("l_shipdate"), "yyyy-MM").as("month"))
          .agg(sum(col("l_quantity").cast("long")).as("q"))
        val wp = Window.partitionBy("l_partkey")
        val r = md
          .withColumn("rn", row_number().over(wp.orderBy("q")))
          .withColumn("n", count(lit(1)).over(wp))
          .withColumn("tot", sum("q").over(wp))
        r.filter(col("rn") === ceil(lit(0.9) * col("n")).cast("int"))
          .select(col("l_partkey"), col("n").as("n_months"),
            col("tot").as("total_demand"), col("q").as("stock_q90"))
          .orderBy(col("total_demand").desc, col("l_partkey")).limit(20)
      },
      Some("""WITH md AS (
             |  SELECT l_partkey, strftime(l_shipdate, '%Y-%m') AS month,
             |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
             |  FROM lineitem GROUP BY 1, 2),
             |r AS (SELECT l_partkey, q,
             |    row_number() OVER (PARTITION BY l_partkey ORDER BY q) AS rn,
             |    COUNT(*) OVER (PARTITION BY l_partkey) AS n,
             |    SUM(q) OVER (PARTITION BY l_partkey) AS tot
             |  FROM md)
             |SELECT l_partkey, n AS n_months,
             |  CAST(tot AS BIGINT) AS total_demand, q AS stock_q90
             |FROM r WHERE rn = CAST(ceil(0.9 * n) AS BIGINT)
             |ORDER BY total_demand DESC, l_partkey LIMIT 20""".stripMargin)),

    Q("part_price_index", // fixed-base price indexes over monthly part
      // unit prices: Laspeyres (base-quantity weights), Paasche
      // (current-quantity weights) and their Fisher geometric mean —
      // the standard inflation triple a commerce warehouse reports.
      // One (month, part) rollup; each month joins the base month on
      // the part key (restricted to the common basket, as the
      // definitions require). Unit prices are sum/sum rationals; the
      // weighted sums are the one float aggregation, rounded.
      (s, d) => {
        val mp = t(s, d, "lineitem")
          .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("month"),
            col("l_partkey"))
          .agg((sum(col("l_extendedprice").cast("double"))
            / sum(col("l_quantity").cast("double"))).as("p"),
            sum(col("l_quantity").cast("double")).as("q"))
          .localCheckpoint(eager = false) // month side + base side
        val base = mp.agg(min("month")).head().getString(0)
        val b = mp.filter(col("month") === base)
          .select(col("l_partkey"), col("p").as("p0"), col("q").as("q0"))
        mp.join(b, Seq("l_partkey"))
          .groupBy("month")
          .agg(count(lit(1)).as("n_parts"),
            (sum(col("p") * col("q0")) / sum(col("p0") * col("q0")))
              .as("l_idx"),
            (sum(col("p") * col("q")) / sum(col("p0") * col("q")))
              .as("p_idx"))
          .select(col("month"), col("n_parts"),
            round(col("l_idx"), 6).as("laspeyres"),
            round(col("p_idx"), 6).as("paasche"),
            round(sqrt(col("l_idx") * col("p_idx")), 6).as("fisher"))
          .orderBy("month")
      },
      Some("""WITH mp AS (
             |  SELECT strftime(l_shipdate, '%Y-%m') AS month, l_partkey,
             |    SUM(CAST(l_extendedprice AS DOUBLE))
             |      / SUM(CAST(l_quantity AS DOUBLE)) AS p,
             |    SUM(CAST(l_quantity AS DOUBLE)) AS q
             |  FROM lineitem GROUP BY 1, 2),
             |b AS (SELECT l_partkey, p AS p0, q AS q0 FROM mp
             |  WHERE month = (SELECT MIN(month) FROM mp)),
             |j AS (SELECT m.month, m.p, m.q, b.p0, b.q0
             |  FROM mp m JOIN b USING (l_partkey)),
             |ix AS (SELECT month, COUNT(*) AS n_parts,
             |    SUM(p * q0) / SUM(p0 * q0) AS l_idx,
             |    SUM(p * q) / SUM(p0 * q) AS p_idx
             |  FROM j GROUP BY 1)
             |SELECT month, n_parts, ROUND(l_idx, 6) AS laspeyres,
             |  ROUND(p_idx, 6) AS paasche,
             |  ROUND(sqrt(l_idx * p_idx), 6) AS fisher
             |FROM ix ORDER BY month""".stripMargin)),

    Q("part_type_brand_share", // hierarchical share-of-share: brand
      // revenue share WITHIN its part type, and the type's share of
      // total — the drill-down composition report. One fact rollup to
      // the (type, brand) grain (revenue rounded there, so every later
      // ratio divides identical doubles), then two window sums over the
      // ~150-row rollup — the fact table shuffles once.
      (s, d) => {
        val pt = t(s, d, "part")
          .select(col("p_partkey"), col("p_type"), col("p_brand"))
        val tb = t(s, d, "lineitem")
          .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_type").as("ptype"), col("p_brand").as("brand"))
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("rev"))
        val wt = Window.partitionBy("ptype")
        val wa = Window.partitionBy()
        tb.withColumn("trev", sum("rev").over(wt))
          .withColumn("arev", sum("rev").over(wa))
          .select(col("ptype"), col("brand"), col("rev"),
            round(col("rev") / col("trev"), 6).as("brand_share_of_type"),
            round(col("trev") / col("arev"), 6).as("type_share_of_total"))
          .orderBy("ptype", "brand")
      },
      Some("""WITH tb AS (
             |  SELECT p_type AS ptype, p_brand AS brand,
             |    ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS rev
             |  FROM lineitem JOIN part ON l_partkey = p_partkey
             |  GROUP BY 1, 2)
             |SELECT ptype, brand, rev,
             |  ROUND(rev / SUM(rev) OVER (PARTITION BY ptype), 6)
             |    AS brand_share_of_type,
             |  ROUND(SUM(rev) OVER (PARTITION BY ptype) / SUM(rev) OVER (), 6)
             |    AS type_share_of_total
             |FROM tb ORDER BY ptype, brand""".stripMargin)),

    Q("doc_stopword_discovery", // corpus-driven stopword candidates:
      // terms present in the highest fraction of documents (document
      // frequency, not raw counts — a term spammed in one doc doesn't
      // qualify). The (doc, term) distinct collapses map-side before the
      // term-keyed count; integer df ratios are exact.
      (s, d) => {
        val n = t(s, d, "documents").count()
        t(s, d, "documents")
          .select(col("doc_id"),
            explode(array_distinct(
              graft.operators.TextAnalysis.tokens(lower(col("text")))))
              .as("term"))
          .groupBy("term").agg(count(lit(1)).as("df"))
          .filter(col("df") * 2 > n)
          .select(col("term"), col("df"),
            round(col("df").cast("double") / n, 6).as("df_ratio"))
          .orderBy(col("df").desc, col("term")).limit(30)
      },
      Some("""WITH dt AS (
             |  SELECT DISTINCT doc_id, t AS term FROM (
             |    SELECT doc_id, unnest(
             |      string_split_regex(lower(trim(text)), '\s+')) AS t
             |    FROM documents)),
             |n AS (SELECT COUNT(*) AS nd FROM documents)
             |SELECT term, COUNT(*) AS df,
             |  ROUND(CAST(COUNT(*) AS DOUBLE) / (SELECT nd FROM n), 6)
             |    AS df_ratio
             |FROM dt GROUP BY term
             |HAVING COUNT(*) * 2 > (SELECT nd FROM n)
             |ORDER BY df DESC, term LIMIT 30""".stripMargin)),

    Q("events_weekend_lift", // weekend vs weekday activity lift per
      // event type: average events per weekend day over average events
      // per weekday — the seasonality summary behind staffing/capacity
      // calls. Day classification uses the ISO weekday so both engines
      // agree; everything is exact integer counts until the final
      // divisions.
      (s, d) => {
        val daily = t(s, d, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
          .withColumn("is_we", (weekday(col("day")) >= 5).cast("int"))
        daily.groupBy("event_type")
          .agg(sum(when(col("is_we") === 1, col("n"))).as("we_events"),
            countDistinct(when(col("is_we") === 1, col("day"))).as("we_days"),
            sum(when(col("is_we") === 0, col("n"))).as("wd_events"),
            countDistinct(when(col("is_we") === 0, col("day"))).as("wd_days"))
          .select(col("event_type"), col("we_events"), col("wd_events"),
            round((col("we_events").cast("double") / col("we_days"))
              / (col("wd_events").cast("double") / col("wd_days")), 6)
              .as("weekend_lift"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (
             |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n,
             |    CASE WHEN isodow(CAST(ts AS DATE)) >= 6 THEN 1 ELSE 0 END AS is_we
             |  FROM events GROUP BY 1, 2),
             |agg AS (
             |  SELECT event_type,
             |    CAST(SUM(CASE WHEN is_we = 1 THEN n END) AS BIGINT) AS we_events,
             |    COUNT(DISTINCT CASE WHEN is_we = 1 THEN day END) AS we_days,
             |    CAST(SUM(CASE WHEN is_we = 0 THEN n END) AS BIGINT) AS wd_events,
             |    COUNT(DISTINCT CASE WHEN is_we = 0 THEN day END) AS wd_days
             |  FROM daily GROUP BY 1)
             |SELECT event_type, we_events, wd_events,
             |  ROUND((CAST(we_events AS DOUBLE) / we_days)
             |    / (CAST(wd_events AS DOUBLE) / wd_days), 6) AS weekend_lift
             |FROM agg ORDER BY event_type""".stripMargin)),

    Q("events_power_users_pareto", // traffic concentration: what share
      // of events do the top-1% / top-10% most active users generate —
      // the abuse/capacity skew number. Users rank by exact activity
      // count (user_id tie-break); cumulative shares ride one window
      // over the user-grained rollup, integer-exact until the final
      // divisions.
      (s, d) => {
        val per = t(s, d, "events")
          .groupBy("user_id").agg(count(lit(1)).as("n"))
        val w = Window.orderBy(col("n").desc, col("user_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.partitionBy()
        per
          .withColumn("cum", sum("n").over(w))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("n").desc, col("user_id"))))
          .withColumn("nu", count(lit(1)).over(wAll))
          .withColumn("tot", sum("n").over(wAll))
          .select(
            col("nu").as("n_users"), col("tot").as("n_events"),
            when(col("rk") === greatest((col("nu") / 100).cast("int"), lit(1)),
              round(col("cum").cast("double") / col("tot"), 6)).as("top1pct_share"),
            when(col("rk") === greatest((col("nu") / 10).cast("int"), lit(1)),
              round(col("cum").cast("double") / col("tot"), 6)).as("top10pct_share"))
          .agg(max("n_users").as("n_users"), max("n_events").as("n_events"),
            max("top1pct_share").as("top1pct_share"),
            max("top10pct_share").as("top10pct_share"))
      },
      Some("""WITH per AS (
             |  SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1),
             |rk AS (SELECT n,
             |    ROW_NUMBER() OVER (ORDER BY n DESC, user_id) AS rk,
             |    SUM(n) OVER (ORDER BY n DESC, user_id
             |      ROWS UNBOUNDED PRECEDING) AS cum,
             |    COUNT(*) OVER () AS nu, SUM(n) OVER () AS tot
             |  FROM per)
             |SELECT MAX(nu) AS n_users,
             |  CAST(MAX(tot) AS BIGINT) AS n_events,
             |  MAX(CASE WHEN rk = greatest(nu // 100, 1)
             |    THEN ROUND(CAST(cum AS DOUBLE) / tot, 6) END) AS top1pct_share,
             |  MAX(CASE WHEN rk = greatest(nu // 10, 1)
             |    THEN ROUND(CAST(cum AS DOUBLE) / tot, 6) END) AS top10pct_share
             |FROM rk""".stripMargin)),

    Q("cust_balance_histogram", // fixed-width numeric histogram of
      // customer account balances over literal bounds — the profiling
      // counterpart of the equi-depth histogram (fixed CUTS, variable
      // counts vs fixed counts, variable cuts). Bucket arithmetic on
      // literals is exact; one keyed count.
      (s, d) => t(s, d, "customer")
        .select(least(greatest(floor((col("c_acctbal") + 1000) / 600)
          .cast("int"), lit(0)), lit(10)).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n_customers"))
        .select(col("bucket"),
          round((lit(-1000) + col("bucket") * 600).cast("double"), 1).as("lo"),
          round((lit(-1000) + (col("bucket") + 1) * 600).cast("double"), 1).as("hi"),
          col("n_customers"))
        .orderBy("bucket"),
      Some("""SELECT bucket,
             |  ROUND(-1000 + bucket * 600, 1) AS lo,
             |  ROUND(-1000 + (bucket + 1) * 600, 1) AS hi,
             |  COUNT(*) AS n_customers
             |FROM (SELECT least(greatest(
             |    CAST(floor((c_acctbal + 1000) / 600) AS INT), 0), 10) AS bucket
             |  FROM customer)
             |GROUP BY bucket ORDER BY bucket""".stripMargin)),

    Q("doc_char_entropy_by_source", // character-level Shannon entropy
      // per source — the compressibility/noise proxy (binary junk and
      // repeated boilerplate both depress it). Characters explode
      // map-side into a (source, char) count; entropy comes from exact
      // integer counts via H = ln N − (Σ c·ln c)/N.
      (s, d) => t(s, d, "documents")
        .select(col("source"),
          explode(split(col("text"), "")).as("ch"))
        .filter(length(col("ch")) > 0)
        .groupBy("source", "ch").agg(count(lit(1)).as("c"))
        .groupBy("source")
        .agg(sum("c").as("n_chars"), count(lit(1)).as("n_distinct_chars"),
          sum(col("c").cast("double") * log(col("c").cast("double"))).as("clc"))
        .select(col("source"), col("n_chars"), col("n_distinct_chars"),
          round(log(col("n_chars").cast("double"))
            - col("clc") / col("n_chars"), 6).as("char_entropy"))
        .orderBy("source"),
      Some("""WITH cc AS (
             |  SELECT source, ch, COUNT(*) AS c FROM (
             |    SELECT source, unnest(regexp_extract_all(text, '(?s).')) AS ch
             |    FROM documents)
             |  WHERE length(ch) > 0
             |  GROUP BY 1, 2),
             |agg AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_chars,
             |    COUNT(*) AS n_distinct_chars,
             |    SUM(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS clc
             |  FROM cc GROUP BY 1)
             |SELECT source, n_chars, n_distinct_chars,
             |  ROUND(ln(CAST(n_chars AS DOUBLE)) - clc / n_chars, 6)
             |    AS char_entropy
             |FROM agg ORDER BY source""".stripMargin)),

    Q("doc_bigram_entropy", // corpus language complexity: the bigram
      // model's conditional entropy H(next | current) = H(XY) − H(X)
      // and its perplexity — the single number that says how predictable
      // the corpus is (boilerplate → low, organic prose → high). Both
      // entropy terms reduce to Σ c·ln c over exact integer counts (the
      // prefix counts are sums of bigram counts, one extra keyed agg),
      // so the closed form computes identically in both engines.
      (s, d) => {
        val bg = t(s, d, "documents")
          .select(graft.operators.TextAnalysis.tokens(lower(col("text"))).as("ts"))
          .filter(size(col("ts")) >= 2)
          .select(explode(transform(sequence(lit(1), size(col("ts")) - 1),
            i => struct(element_at(col("ts"), i).as("w1"),
              element_at(col("ts"), i + 1).as("w2")))).as("b"))
          .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
          .agg(count(lit(1)).as("c"))
        val pref = bg.groupBy("w1").agg(sum("c").as("cx"))
        val sb = bg.agg(sum("c").as("n"),
          count(lit(1)).as("n_bigram_types"),
          sum(col("c").cast("double") * log(col("c").cast("double"))).as("sb"))
        val sx = pref.agg(count(lit(1)).as("n_prefix_types"),
          sum(col("cx").cast("double") * log(col("cx").cast("double"))).as("sx"))
        sb.crossJoin(sx)
          .select(col("n").as("n_bigrams"), col("n_bigram_types"),
            col("n_prefix_types"),
            round((col("sx") - col("sb")) / col("n"), 6).as("cond_entropy"),
            round(exp((col("sx") - col("sb")) / col("n")), 6).as("perplexity"))
      },
      Some("""WITH tok AS (
             |  SELECT string_split_regex(lower(trim(text)), '\s+') AS ts
             |  FROM documents
             |), bg AS (
             |  SELECT b, COUNT(*) AS c FROM (
             |    SELECT unnest(list_transform(range(1, len(ts)),
             |      i -> ts[i] || ' ' || ts[i+1])) AS b
             |    FROM tok WHERE len(ts) >= 2)
             |  GROUP BY b
             |), pref AS (
             |  SELECT string_split(b, ' ')[1] AS w1, SUM(c) AS cx
             |  FROM bg GROUP BY 1
             |), sb AS (
             |  SELECT CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS n_bigram_types,
             |    SUM(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS sbv
             |  FROM bg
             |), sx AS (
             |  SELECT COUNT(*) AS n_prefix_types,
             |    SUM(CAST(cx AS DOUBLE) * ln(CAST(cx AS DOUBLE))) AS sxv
             |  FROM pref)
             |SELECT n AS n_bigrams, n_bigram_types, n_prefix_types,
             |  ROUND((sxv - sbv) / n, 6) AS cond_entropy,
             |  ROUND(exp((sxv - sbv) / n), 6) AS perplexity
             |FROM sb, sx""".stripMargin)),

    Q("events_new_vs_returning", // growth accounting: per day, users
      // active for the FIRST time vs returning users, and the returning
      // share — the retention pulse. First-touch day is one user-keyed
      // min; the day split is conditional integer counts on the
      // (user, day) activity grain.
      (s, d) => {
        val ud = t(s, d, "events")
          .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        val first = ud.groupBy("user_id").agg(min("day").as("fday"))
        ud.join(first, Seq("user_id"))
          .groupBy(date_format(col("day"), "yyyy-MM-dd").as("day"))
          .agg(sum(when(col("day") === date_format(col("fday"), "yyyy-MM-dd"), 1)
              .otherwise(0)).as("new_users"),
            sum(when(col("day") =!= date_format(col("fday"), "yyyy-MM-dd"), 1)
              .otherwise(0)).as("returning_users"))
          .select(col("day"), col("new_users"), col("returning_users"),
            round(col("returning_users").cast("double")
              / (col("new_users") + col("returning_users")), 6)
              .as("returning_share"))
          .orderBy("day")
      },
      Some("""WITH ud AS (
             |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
             |f AS (SELECT user_id, MIN(day) AS fday FROM ud GROUP BY 1)
             |SELECT strftime(ud.day, '%Y-%m-%d') AS day,
             |  CAST(SUM(CASE WHEN ud.day = f.fday THEN 1 ELSE 0 END) AS BIGINT)
             |    AS new_users,
             |  CAST(SUM(CASE WHEN ud.day <> f.fday THEN 1 ELSE 0 END) AS BIGINT)
             |    AS returning_users,
             |  ROUND(CAST(SUM(CASE WHEN ud.day <> f.fday THEN 1 ELSE 0 END)
             |    AS DOUBLE) / COUNT(*), 6) AS returning_share
             |FROM ud JOIN f ON ud.user_id = f.user_id
             |GROUP BY ud.day ORDER BY day""".stripMargin)),

    Q("nation_trade_balance", // sell-side revenue vs buy-side spend per
      // nation and the net position — both sides roll to their entity
      // grain FIRST (supplier / customer) and round there, so the
      // nation-level sums add identical doubles in both engines; the
      // nation dim broadcasts onto the entity rollups, never onto facts.
      (s, d) => {
        val supRev = t(s, d, "lineitem")
          .groupBy(col("l_suppkey"))
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("r"))
          .join(broadcast(t(s, d, "supplier")
            .select(col("s_suppkey"), col("s_nationkey"))),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_nationkey").as("nk"))
          .agg(round(sum("r"), 2).as("supply_rev"))
        val demSpend = t(s, d, "orders")
          .groupBy(col("o_custkey"))
          .agg(round(sum("o_totalprice"), 2).as("r"))
          .join(broadcast(t(s, d, "customer")
            .select(col("c_custkey"), col("c_nationkey"))),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_nationkey").as("nk"))
          .agg(round(sum("r"), 2).as("demand_spend"))
        t(s, d, "nation")
          .select(col("n_nationkey").as("nk"), col("n_name"))
          .join(supRev, Seq("nk"), "left_outer")
          .join(demSpend, Seq("nk"), "left_outer")
          .select(col("n_name").as("nation"),
            coalesce(col("supply_rev"), lit(0.0)).as("supply_rev"),
            coalesce(col("demand_spend"), lit(0.0)).as("demand_spend"),
            round(coalesce(col("supply_rev"), lit(0.0))
              - coalesce(col("demand_spend"), lit(0.0)), 2).as("net_position"))
          .orderBy("nation")
      },
      Some("""WITH sup AS (
             |  SELECT l_suppkey,
             |    ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS r
             |  FROM lineitem GROUP BY 1),
             |sr AS (SELECT s_nationkey AS nk, ROUND(SUM(r), 2) AS supply_rev
             |  FROM sup JOIN supplier ON l_suppkey = s_suppkey GROUP BY 1),
             |dem AS (
             |  SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS r
             |  FROM orders GROUP BY 1),
             |dr AS (SELECT c_nationkey AS nk, ROUND(SUM(r), 2) AS demand_spend
             |  FROM dem JOIN customer ON o_custkey = c_custkey GROUP BY 1)
             |SELECT n_name AS nation,
             |  COALESCE(supply_rev, 0.0) AS supply_rev,
             |  COALESCE(demand_spend, 0.0) AS demand_spend,
             |  ROUND(COALESCE(supply_rev, 0.0) - COALESCE(demand_spend, 0.0), 2)
             |    AS net_position
             |FROM nation
             |LEFT JOIN sr ON n_nationkey = sr.nk
             |LEFT JOIN dr ON n_nationkey = dr.nk
             |ORDER BY nation""".stripMargin)),

    Q("events_type_affinity", // cross-activity affinity: for every pair
      // of event types, how much more often does one user do BOTH than
      // independence predicts (user-level lift) — the cross-sell /
      // feature-adoption matrix. The pair space is the per-user type set
      // squared (≤ C(5,2) pairs from ≤5 types per user), marginals and
      // the user total are exact integers; the total rides a 1-row
      // broadcast.
      (s, d) => {
        val ut = t(s, d, "events")
          .select(col("user_id"), col("event_type")).distinct()
        val marg = ut.groupBy(col("event_type")).agg(count(lit(1)).as("m"))
        val ntot = ut.select(countDistinct("user_id").as("n_users"))
        val a = ut.select(col("user_id"), col("event_type").as("ta"))
        val b = ut.select(col("user_id"), col("event_type").as("tb"))
        a.join(b, Seq("user_id")).filter(col("ta") < col("tb"))
          .groupBy("ta", "tb").agg(count(lit(1)).as("n_both"))
          .join(broadcast(marg.select(col("event_type").as("ta"),
            col("m").as("ma"))), Seq("ta"))
          .join(broadcast(marg.select(col("event_type").as("tb"),
            col("m").as("mb"))), Seq("tb"))
          .crossJoin(broadcast(ntot))
          .select(col("ta"), col("tb"), col("n_both"),
            round(col("n_both").cast("double") / col("n_users"), 6)
              .as("support"),
            round(col("n_both").cast("double") * col("n_users")
              / (col("ma") * col("mb")), 6).as("lift"))
          .orderBy("ta", "tb")
      },
      Some("""WITH ut AS (
             |  SELECT DISTINCT user_id, event_type FROM events),
             |marg AS (SELECT event_type, COUNT(*) AS m FROM ut GROUP BY 1),
             |ntot AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM ut),
             |co AS (SELECT a.event_type AS ta, b.event_type AS tb,
             |    COUNT(*) AS n_both
             |  FROM ut a JOIN ut b
             |    ON a.user_id = b.user_id AND a.event_type < b.event_type
             |  GROUP BY 1, 2)
             |SELECT ta, tb, n_both,
             |  ROUND(CAST(n_both AS DOUBLE) / n_users, 6) AS support,
             |  ROUND(CAST(n_both AS DOUBLE) * n_users / (ma.m * mb.m), 6)
             |    AS lift
             |FROM co, ntot
             |JOIN marg ma ON co.ta = ma.event_type
             |JOIN marg mb ON co.tb = mb.event_type
             |ORDER BY ta, tb""".stripMargin)),

    Q("orders_month_seasonality", // calendar-month seasonal index of
      // order revenue: each month-of-year's average monthly revenue over
      // the all-months average — the orders-side twin of the day-of-week
      // profile. Revenue rounds at the (year, month) grain; the index
      // divides two sums of identical doubles (the all-months term rides
      // a window over the 12-row profile).
      (s, d) => {
        val ym = t(s, d, "orders")
          .groupBy(year(col("o_orderdate")).as("y"),
            month(col("o_orderdate")).as("m"))
          .agg(round(round(sum("o_totalprice"), 2) * 100, 0).cast("long")
            .as("cents"))
        val prof = ym.groupBy("m")
          .agg(count(lit(1)).as("n_years"), sum("cents").as("tot"))
          .select(col("m"), col("n_years"), col("tot"),
            (col("tot").cast("double") / col("n_years") / 100).as("avg_rev"))
        val wAll = Window.partitionBy()
        prof
          .withColumn("base", sum("avg_rev").over(wAll) / count(lit(1)).over(wAll))
          // avg revenue rounds to cents in EXACT integer arithmetic
          // ((2t+n) div 2n = round-half-up) — round(double, 2) on a
          // quotient that lands exactly on .5¢ differs between engines
          // (surfaced by the sf0.001 sweep)
          .select(col("m").as("month"), col("n_years"),
            (expr("(2 * tot + n_years) div (2 * n_years)").cast("double") / 100)
              .as("avg_monthly_rev"),
            round(col("avg_rev") / col("base"), 6).as("seasonal_index"))
          .orderBy("month")
      },
      Some("""WITH ym AS (
             |  SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
             |    CAST(ROUND(ROUND(SUM(o_totalprice), 2) * 100, 0) AS BIGINT)
             |      AS cents
             |  FROM orders GROUP BY 1, 2),
             |prof AS (
             |  SELECT m, COUNT(*) AS n_years, SUM(cents) AS tot,
             |    CAST(SUM(cents) AS DOUBLE) / COUNT(*) / 100 AS avg_rev
             |  FROM ym GROUP BY m)
             |SELECT m AS month, n_years,
             |  CAST((2 * tot + n_years) // (2 * n_years) AS DOUBLE) / 100
             |    AS avg_monthly_rev,
             |  ROUND(avg_rev / (SUM(avg_rev) OVER () / COUNT(*) OVER ()), 6)
             |    AS seasonal_index
             |FROM prof ORDER BY month""".stripMargin)),

    Q("events_anomaly_iqr", // boxplot-rule anomaly days: daily volumes
      // outside [q1 − 1.5·IQR, q3 + 1.5·IQR] — the robust complement to
      // the z-score and MAD screens. Quartiles interpolate exactly over
      // the ~30 integer daily counts; fences and flags derive from the
      // same doubles in both engines.
      (s, d) => {
        val daily = t(s, d, "events")
          .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(count(lit(1)).as("n"))
        val wAll = Window.partitionBy()
        daily
          .withColumn("q1", expr("percentile(n, 0.25)").over(wAll))
          .withColumn("q3", expr("percentile(n, 0.75)").over(wAll))
          .select(col("day"), col("n"),
            round(col("q1"), 4).as("q1"), round(col("q3"), 4).as("q3"),
            (col("n") < col("q1") - lit(1.5) * (col("q3") - col("q1"))
              || col("n") > col("q3") + lit(1.5) * (col("q3") - col("q1")))
              .as("is_outlier"))
          .orderBy("day")
      },
      Some("""WITH daily AS (
             |  SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n
             |  FROM events GROUP BY 1),
             |q AS (SELECT day, n,
             |    quantile_cont(n, 0.25) OVER () AS q1,
             |    quantile_cont(n, 0.75) OVER () AS q3
             |  FROM daily)
             |SELECT day, n, ROUND(q1, 4) AS q1, ROUND(q3, 4) AS q3,
             |  (n < q1 - 1.5 * (q3 - q1) OR n > q3 + 1.5 * (q3 - q1))
             |    AS is_outlier
             |FROM q ORDER BY day""".stripMargin)),

    Q("doc_template_detect", // boilerplate TEMPLATE detection: documents
      // sharing an identical opening (first 8 tokens) — the
      // header/footer template screen that whole-document dedup misses
      // because the bodies differ. Map-side prefix key, one hash-keyed
      // group; md5 of the joined prefix keeps the shuffle key fixed
      // width at any prefix length.
      (s, d) => {
        val toks = graft.operators.TextAnalysis.tokens(lower(col("text")))
        t(s, d, "documents")
          .select(col("doc_id"),
            md5(concat_ws(" ", slice(toks, 1, 8))).as("pk"))
          .groupBy("pk")
          .agg(count(lit(1)).as("n_docs"),
            min("doc_id").as("first_doc"))
          .filter(col("n_docs") >= 3)
          .select(col("pk").as("prefix_key"), col("n_docs"), col("first_doc"))
          .orderBy(col("n_docs").desc, col("prefix_key"))
      },
      Some("""WITH p AS (
             |  SELECT doc_id, md5(array_to_string(
             |    (string_split_regex(lower(trim(text)), '\s+'))[1:8], ' '))
             |    AS pk
             |  FROM documents)
             |SELECT pk AS prefix_key, COUNT(*) AS n_docs,
             |  MIN(doc_id) AS first_doc
             |FROM p GROUP BY pk HAVING COUNT(*) >= 3
             |ORDER BY n_docs DESC, prefix_key""".stripMargin)),

    Q("part_supplier_diversity", // supply-chain concentration: how many
      // distinct suppliers (and supplier nations) does each part's
      // observed flow have — single-sourced parts are the risk register.
      // Rolls lineitem to the (part, supplier) grain first; the supplier
      // dim broadcasts onto that rollup. Output: the diversity histogram
      // plus the single-sourced share.
      (s, d) => {
        val ps = t(s, d, "lineitem")
          .select(col("l_partkey"), col("l_suppkey")).distinct()
          .join(broadcast(t(s, d, "supplier")
            .select(col("s_suppkey"), col("s_nationkey"))),
            col("l_suppkey") === col("s_suppkey"))
        val per = ps.groupBy(col("l_partkey"))
          .agg(countDistinct("l_suppkey").as("n_suppliers"),
            countDistinct("s_nationkey").as("n_nations"))
        val wAll = Window.partitionBy()
        per.groupBy("n_suppliers")
          .agg(count(lit(1)).as("n_parts"),
            round(avg(col("n_nations").cast("double")), 4).as("avg_nations"))
          .withColumn("share",
            round(col("n_parts").cast("double") / sum("n_parts").over(wAll), 6))
          .orderBy("n_suppliers")
      },
      Some("""WITH ps AS (
             |  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
             |j AS (SELECT ps.l_partkey, ps.l_suppkey, s.s_nationkey
             |  FROM ps JOIN supplier s ON ps.l_suppkey = s.s_suppkey),
             |per AS (
             |  SELECT l_partkey, COUNT(DISTINCT l_suppkey) AS n_suppliers,
             |    COUNT(DISTINCT s_nationkey) AS n_nations
             |  FROM j GROUP BY 1),
             |h AS (SELECT n_suppliers, COUNT(*) AS n_parts,
             |    ROUND(AVG(CAST(n_nations AS DOUBLE)), 4) AS avg_nations
             |  FROM per GROUP BY 1)
             |SELECT n_suppliers, n_parts, avg_nations,
             |  ROUND(CAST(n_parts AS DOUBLE) / SUM(n_parts) OVER (), 6) AS share
             |FROM h ORDER BY n_suppliers""".stripMargin)),

    Q("cust_segment_revenue", // revenue by market segment with share —
      // the one report the c_mktsegment dimension exists for. Orders
      // roll to the customer grain first (rounded there), the segment
      // dim broadcasts onto the rollup, and the share window runs over
      // the 5-row segment table.
      (s, d) => {
        val per = t(s, d, "orders")
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("r"))
          .join(broadcast(t(s, d, "customer")
            .select(col("c_custkey"), col("c_mktsegment"))),
            col("o_custkey") === col("c_custkey"))
        val wAll = Window.partitionBy()
        per.groupBy(col("c_mktsegment").as("segment"))
          .agg(count(lit(1)).as("n_customers"), sum("n").as("n_orders"),
            round(sum("r"), 2).as("revenue"))
          .withColumn("revenue_share",
            round(col("revenue") / sum("revenue").over(wAll), 6))
          .orderBy("segment")
      },
      Some("""WITH per AS (
             |  SELECT o_custkey, COUNT(*) AS n,
             |    ROUND(SUM(o_totalprice), 2) AS r
             |  FROM orders GROUP BY 1),
             |seg AS (
             |  SELECT c_mktsegment AS segment, COUNT(*) AS n_customers,
             |    CAST(SUM(n) AS BIGINT) AS n_orders, ROUND(SUM(r), 2) AS revenue
             |  FROM per JOIN customer ON o_custkey = c_custkey
             |  GROUP BY 1)
             |SELECT segment, n_customers, n_orders, revenue,
             |  ROUND(revenue / SUM(revenue) OVER (), 6) AS revenue_share
             |FROM seg ORDER BY segment""".stripMargin)),

    Q("events_burst_ratio", // burstiness index per event type: peak
      // hourly volume over median hourly volume — the capacity-headroom
      // number. One hour-grained rollup; max and exact median interpolate
      // from integer counts identically in both engines.
      (s, d) => t(s, d, "events")
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("n"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_hours"), max("n").as("peak_hourly"),
          round(expr("percentile(n, 0.5)"), 4).as("median_hourly"))
        .select(col("event_type"), col("n_hours"), col("peak_hourly"),
          col("median_hourly"),
          round(col("peak_hourly") / col("median_hourly"), 4).as("burst_ratio"))
        .orderBy("event_type"),
      Some("""WITH hourly AS (
             |  SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS n
             |  FROM events GROUP BY 1, 2),
             |agg AS (
             |  SELECT event_type, COUNT(*) AS n_hours,
             |    CAST(MAX(n) AS BIGINT) AS peak_hourly,
             |    ROUND(quantile_cont(n, 0.5), 4) AS median_hourly
             |  FROM hourly GROUP BY 1)
             |SELECT event_type, n_hours, peak_hourly, median_hourly,
             |  ROUND(peak_hourly / median_hourly, 4) AS burst_ratio
             |FROM agg ORDER BY event_type""".stripMargin)),

    Q("orders_priority_lag_profile", // does URGENT actually ship
      // faster? Order-to-ship lag distribution BY priority class —
      // the SLA-by-class audit. Integer day lags through the fact
      // join; mean and exact p90 interpolate identically in both
      // engines.
      (s, d) => t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority"),
          datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
            .as("lag_d"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          round(sum("lag_d").cast("double") / count(lit(1)), 6).as("mean_lag_d"),
          round(expr("percentile(lag_d, 0.9)"), 6).as("p90_lag_d"))
        .orderBy("o_orderpriority"),
      Some("""WITH j AS (
             |  SELECT o_orderpriority,
             |    date_diff('day', CAST(o_orderdate AS DATE),
             |      CAST(l_shipdate AS DATE)) AS lag_d
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
             |SELECT o_orderpriority, COUNT(*) AS n_items,
             |  ROUND(CAST(SUM(lag_d) AS DOUBLE) / COUNT(*), 6) AS mean_lag_d,
             |  ROUND(quantile_cont(lag_d, 0.9), 6) AS p90_lag_d
             |FROM j GROUP BY 1 ORDER BY o_orderpriority""".stripMargin)),

    Q("events_value_summary", // five-number profile of the value column
      // per event type (min / q1 / median / q3 / max) — the boxplot
      // feed and the first thing a profiler prints. Exact interpolated
      // quartiles over the same doubles in both engines; one keyed agg.
      (s, d) => t(s, d, "events")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          round(min("value"), 4).as("v_min"),
          round(expr("percentile(value, 0.25)"), 4).as("v_q1"),
          round(expr("percentile(value, 0.5)"), 4).as("v_median"),
          round(expr("percentile(value, 0.75)"), 4).as("v_q3"),
          round(max("value"), 4).as("v_max"))
        .orderBy("event_type"),
      Some("""SELECT event_type, COUNT(*) AS n,
             |  ROUND(MIN(value), 4) AS v_min,
             |  ROUND(quantile_cont(value, 0.25), 4) AS v_q1,
             |  ROUND(quantile_cont(value, 0.5), 4) AS v_median,
             |  ROUND(quantile_cont(value, 0.75), 4) AS v_q3,
             |  ROUND(MAX(value), 4) AS v_max
             |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin)),

    Q("doc_substring_dup_coverage", // EXACT cross-document substring
      // duplication (the ExactSubstr screen of Lee et al. 2022,
      // "Deduplicating Training Data Makes Language Models Better",
      // approximated with fixed-k anchor grams instead of a suffix
      // array): every 20-char window is an anchor; a window whose gram
      // appears in >= 2 DISTINCT documents marks its [pos, pos+19] span
      // as duplicated, and overlapping spans merge per document into
      // islands (gap > 20 breaks). Per-source report: docs affected,
      // duplicated chars, duplicated fraction. Scale shape: the gram
      // explode is map-side, document frequency is one hash aggregation
      // on the gram key (at 100 TB you'd key on xxhash64(gram) — 8
      // bytes instead of 20 chars — exactly like the minhash family's
      // native twins), the span merge is a per-document window. No
      // suffix array, no doc-vs-doc comparison anywhere.
      (s, d) => {
        val k = 20
        graft.plans.GraftFunctions.register(s)
        val docs = t(s, d, "documents").select("doc_id", "source", "text")
        // native one-pass anchor-gram hasher: the 20-char window string
        // exists only inside the expression eval — the explode emits
        // 8-byte longs (bit-identical to xxhash64(substring(...)), the
        // interpreted HOF it replaced; differential-pinned in
        // TextExpressionsSpec)
        val grams = docs
          .select(col("doc_id"), col("source"),
            posexplode(call_function("graft_char_gram_hashes",
              col("text"), lit(k))).as(Seq("pos", "gh")))
        val gramsOnce = grams.localCheckpoint(eager = false)
        val dupGrams = gramsOnce.groupBy("gh")
          .agg(min("doc_id").as("_dmin"), max("doc_id").as("_dmax"))
          .filter(col("_dmin") =!= col("_dmax")).select("gh")
        val dup = gramsOnce.join(dupGrams, Seq("gh"))
          .select("doc_id", "source", "pos")
        val wDoc = Window.partitionBy("doc_id").orderBy("pos")
        val islands = dup
          .withColumn("prev", lag("pos", 1).over(wDoc))
          .withColumn("brk",
            when(col("prev").isNull || col("pos") - col("prev") > k, 1L)
              .otherwise(0L))
          .withColumn("island", sum("brk").over(
            wDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val cover = islands.groupBy("doc_id", "source", "island")
          .agg((max("pos") - min("pos") + k).as("span"))
          .groupBy("doc_id", "source").agg(sum("span").as("dup_chars"))
        val base = docs.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(length(col("text"))).as("total_chars"))
        base.join(cover.groupBy("source")
            .agg(count(lit(1)).as("docs_with_dup"),
              sum("dup_chars").as("dup_chars")), Seq("source"), "left")
          .select(col("source"), col("n_docs"),
            coalesce(col("docs_with_dup"), lit(0L)).as("docs_with_dup"),
            coalesce(col("dup_chars"), lit(0L)).as("dup_chars"),
            col("total_chars"),
            round(coalesce(col("dup_chars"), lit(0L)).cast("double")
              / col("total_chars"), 6).as("dup_frac"))
          .orderBy("source")
      },
      Some("""WITH g AS (
             |  SELECT doc_id, source, u.i AS pos, substr(text, u.i + 1, 20) AS gram
             |  FROM documents,
             |    unnest(range(0, greatest(length(text) - 19, 0))) AS u(i)),
             |dfreq AS (
             |  SELECT gram FROM (SELECT DISTINCT gram, doc_id FROM g)
             |  GROUP BY gram HAVING COUNT(*) >= 2),
             |dup AS (
             |  SELECT doc_id, source, pos FROM g
             |  WHERE gram IN (SELECT gram FROM dfreq)),
             |isl AS (
             |  SELECT doc_id, source, pos,
             |    SUM(CASE WHEN prev IS NULL OR pos - prev > 20 THEN 1 ELSE 0 END)
             |      OVER (PARTITION BY doc_id ORDER BY pos) AS island
             |  FROM (SELECT doc_id, source, pos,
             |          LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
             |        FROM dup)),
             |cov AS (
             |  SELECT doc_id, source, SUM(mx - mn + 20) AS dup_chars
             |  FROM (SELECT doc_id, source, island, MAX(pos) AS mx, MIN(pos) AS mn
             |        FROM isl GROUP BY 1, 2, 3)
             |  GROUP BY 1, 2),
             |percov AS (
             |  SELECT source, COUNT(*) AS docs_with_dup,
             |    CAST(SUM(dup_chars) AS BIGINT) AS dup_chars
             |  FROM cov GROUP BY 1),
             |base AS (
             |  SELECT source, COUNT(*) AS n_docs,
             |    CAST(SUM(length(text)) AS BIGINT) AS total_chars
             |  FROM documents GROUP BY 1)
             |SELECT b.source, b.n_docs,
             |  COALESCE(p.docs_with_dup, 0) AS docs_with_dup,
             |  COALESCE(p.dup_chars, 0) AS dup_chars,
             |  b.total_chars,
             |  ROUND(CAST(COALESCE(p.dup_chars, 0) AS DOUBLE) / b.total_chars, 6)
             |    AS dup_frac
             |FROM base b LEFT JOIN percov p ON p.source = b.source
             |ORDER BY b.source""".stripMargin)),

    Q("doc_dedup_threshold_sweep", // dedup TUNING report: how many
      // near-dup pairs (and how many documents they touch) survive at
      // each candidate Jaccard threshold — the curve an operator reads
      // before committing a dedup threshold to a 100 TB run. Rides the
      // SAME shared shingle-pair index as doc_ngram_jaccard /
      // doc_containment_pairs; the sweep itself is a 5x map-side
      // fan-out of the (already tiny) pair relation, two keyed aggs.
      (s, d) => {
        val ths = Seq(0.01, 0.02, 0.05, 0.1, 0.2)
        val hit = Dedup.ngramJaccardOf(shinglePairIndex(s, d), threshold = 0.01)
          .select(explode(array(ths.map(lit): _*)).as("threshold"),
            col("id_a"), col("id_b"), col("jaccard"))
          .filter(col("jaccard") >= col("threshold"))
        val pairs = hit.groupBy("threshold")
          .agg(count(lit(1)).as("n_pairs"))
        val docsTouched = hit
          .select(col("threshold"),
            explode(array(col("id_a"), col("id_b"))).as("id"))
          .groupBy("threshold").agg(countDistinct("id").as("n_docs"))
        pairs.join(docsTouched, Seq("threshold")).orderBy("threshold")
      },
      Some("""WITH d AS (
             |  SELECT source, doc_id,
             |    list_distinct(list_transform(
             |      range(0, greatest(len(t) - 2, 1)),
             |      i -> array_to_string(t[(i+1):(i+3)], ' '))) AS sh
             |  FROM (SELECT source, doc_id,
             |          string_split_regex(lower(trim(text)), '\s+') AS t
             |        FROM documents)),
             |pairs AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |    ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             |      / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
             |  FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
             |  WHERE len(list_intersect(a.sh, b.sh)) > 0),
             |th AS (SELECT unnest([0.01, 0.02, 0.05, 0.1, 0.2]) AS threshold),
             |hit AS (
             |  SELECT th.threshold, p.id_a, p.id_b
             |  FROM pairs p JOIN th ON p.jaccard >= th.threshold),
             |pc AS (SELECT threshold, COUNT(*) AS n_pairs FROM hit GROUP BY 1),
             |dc AS (SELECT threshold, COUNT(DISTINCT id) AS n_docs FROM (
             |    SELECT threshold, id_a AS id FROM hit
             |    UNION ALL SELECT threshold, id_b FROM hit) GROUP BY 1)
             |SELECT pc.threshold, pc.n_pairs, dc.n_docs
             |FROM pc JOIN dc ON pc.threshold = dc.threshold
             |ORDER BY pc.threshold""".stripMargin)),

    Q("doc_nb_source_classify", // REAL MLlib inference, oracle-checked:
      // multinomial NaiveBayes (λ=1) trained on bag-of-words counts
      // predicts each doc's source; output is the resubstitution
      // confusion matrix. NB training is closed-form counting — no
      // seed, no iteration — so the oracle replays MLlib's exact math:
      // smoothed log-priors ln((n_c+1)/(N+C)), smoothed theta
      // ln((n_cw+1)/(T_c+V)), per-doc argmax with MLlib's first-max
      // (= ascending label) tie-break.
      (s, d) => graft.operators.TextAnalysis
        .nbSourceClassify(t(s, d, "documents")),
      Some("""WITH tok AS (
             |  SELECT doc_id, source,
             |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
             |  FROM documents),
             |cw AS (SELECT source AS c, w, COUNT(*) AS n FROM tok GROUP BY 1, 2),
             |ctot AS (SELECT c, SUM(n) AS tn FROM cw GROUP BY 1),
             |vocab AS (SELECT DISTINCT w FROM tok),
             |vs AS (SELECT COUNT(*) AS v FROM vocab),
             |nc AS (SELECT source AS c, COUNT(*) AS dn FROM documents GROUP BY 1),
             |prior AS (
             |  SELECT c, ln((dn + 1.0) / ((SELECT COUNT(*) FROM documents)
             |    + (SELECT COUNT(*) FROM nc))) AS lp
             |  FROM nc),
             |theta AS (
             |  SELECT ct.c, v.w,
             |    ln((COALESCE(cw.n, 0) + 1.0) / (ct.tn + vs.v)) AS lt
             |  FROM ctot ct CROSS JOIN vocab v CROSS JOIN vs
             |  LEFT JOIN cw ON cw.c = ct.c AND cw.w = v.w),
             |doctf AS (
             |  SELECT doc_id, source, w, COUNT(*) AS tf FROM tok GROUP BY 1, 2, 3),
             |score AS (
             |  SELECT d.doc_id, d.source, t.c,
             |    MAX(p.lp) + SUM(d.tf * t.lt) AS s
             |  FROM doctf d JOIN theta t ON d.w = t.w JOIN prior p ON p.c = t.c
             |  GROUP BY 1, 2, 3),
             |pred AS (
             |  SELECT doc_id, source AS actual, c AS predicted,
             |    ROW_NUMBER() OVER (PARTITION BY doc_id
             |      ORDER BY s DESC, c) AS rk
             |  FROM score)
             |SELECT actual, predicted, COUNT(*) AS n
             |FROM pred WHERE rk = 1
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("doc_logreg_langid", // ITERATIVE trainer, oracle-checked: binary
      // logistic regression (is-English from length + space/vowel
      // ratios) fit by 6 full-batch GD rounds, lr=2 — the optimizer
      // class the closed-form trainers (NB counting, normal-equation
      // regr_*) can't reach. Weights round to 6dp per round (the PCA
      // power-iteration determinism contract), so the oracle replays
      // training as 6 chained gradient CTEs and lands on identical
      // weights; accuracy counts margin signs (pure literal
      // arithmetic — bit-identical), log-loss is the one libm-touching
      // output and rounds at 6dp.
      (s, d) => logregFit(s, d)._2,
      Some(s"""WITH $logregFeatureSql,
           |${logregChainParts("", "")},
           |rep AS (
           |  SELECT COUNT(*) AS n,
           |    CAST(SUM(CASE WHEN (mg >= 0) = (y = 1.0) THEN 1 ELSE 0 END)
           |      AS BIGINT) AS n_correct,
           |    ROUND(AVG(-(y * ln(p) + (1.0 - y) * ln(1.0 - p))), 6) AS log_loss
           |  FROM (SELECT y,
           |      w.b + w.w1 * x1 + w.w2 * x2 + w.w3 * x3 AS mg,
           |      1.0 / (1.0 + exp(-(w.b + w.w1 * x1 + w.w2 * x2 + w.w3 * x3))) AS p
           |    FROM fb, w6 w))
           |SELECT rep.n, w.b AS b, w.w1 AS w_x_len, w.w2 AS w_x_space,
           |  w.w3 AS w_x_vowel, rep.n_correct, rep.log_loss
           |FROM rep, w6 w""".stripMargin)),

    Q("doc_logreg_calibration", // reliability curve of the SAME fit —
      // p = σ(margin) binned into probability deciles, per bin the
      // mean predicted p vs the observed positive rate. Rides the
      // memoized training run (model state is 4 doubles); the oracle
      // re-trains through the shared chain and bins identically.
      (s, d) => graft.operators.Learn.calibrationBins(
          logregFeatures(s, d), logregCols, "y", logregFit(s, d)._1)
        .orderBy("bin"),
      Some(s"""WITH $logregFeatureSql,
           |${logregChainParts("", "")},
           |scored AS (
           |  SELECT y, 1.0 / (1.0 + exp(-(w.b + w.w1 * x1 + w.w2 * x2
           |    + w.w3 * x3))) AS p
           |  FROM fb, w6 w)
           |SELECT LEAST(CAST(floor(p * 10) AS INT), 9) AS bin,
           |  COUNT(*) AS n, ROUND(AVG(p), 6) AS mean_pred,
           |  ROUND(SUM(y) / COUNT(*), 6) AS obs_rate
           |FROM scored GROUP BY 1 ORDER BY bin""".stripMargin)),

    Q("doc_logreg_cv", // 3-fold cross-validation of the GD trainer —
      // the eval protocol that catches an overfit quality classifier
      // before it curates a corpus. Folds split on doc_id mod 3; each
      // fold trains its own 6-round chain on the complement and scores
      // the holdout (margin-sign accuracy + log-loss). The oracle runs
      // THREE prefixed training chains in one WITH and evals each
      // holdout identically.
      (s, d) => {
        val fb = logregFeatures(s, d)
        (0 until 3).map { k =>
          val train = fb.filter(pmod(col("doc_id"), lit(3)) =!= k)
          val test = fb.filter(pmod(col("doc_id"), lit(3)) === k)
          val (w, rep) = graft.operators.Learn.logisticGd(
            train, logregCols, "y", iters = 6, lr = 2.0)
          graft.operators.Learn.scoreReport(test, logregCols, "y", w)
            .select(lit(k).as("fold"), lit(rep.head().getLong(0)).as("n_train"),
              col("n").as("n_test"), col("n_correct"), col("log_loss"))
        }.reduce(_.unionByName(_)).orderBy("fold")
      },
      Some {
        def ev(k: Int): String =
          s"""e$k AS (
             |  SELECT $k AS fold,
             |    (SELECT COUNT(*) FROM t${k}_f) AS n_train,
             |    COUNT(*) AS n_test,
             |    CAST(SUM(CASE WHEN (mg >= 0) = (y = 1.0) THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_correct,
             |    ROUND(AVG(-(y * ln(p) + (1.0 - y) * ln(1.0 - p))), 6) AS log_loss
             |  FROM (SELECT y,
             |      w.b + w.w1 * x1 + w.w2 * x2 + w.w3 * x3 AS mg,
             |      1.0 / (1.0 + exp(-(w.b + w.w1 * x1 + w.w2 * x2 + w.w3 * x3))) AS p
             |    FROM fb, t${k}_w6 w WHERE fb.doc_id % 3 = $k))""".stripMargin
        s"""WITH $logregFeatureSql,
           |${(0 until 3).map(k =>
              logregChainParts(s"t${k}_", s"WHERE doc_id % 3 <> $k"))
              .mkString(",\n")},
           |${(0 until 3).map(ev).mkString(",\n")}
           |SELECT * FROM e0 UNION ALL SELECT * FROM e1
           |UNION ALL SELECT * FROM e2 ORDER BY fold""".stripMargin
      }),

    Q("doc_topic_classify", // seeded topic classification (keyword-list
      // multinomial scoring — the domain-labeling step a training-data
      // pipeline runs to steer mixture weights): each topic owns a seed
      // lexicon, a document scores one point per token in a topic's
      // list, argmax wins (ties break on topic name; zero hits =>
      // 'none'). The lexicon is a broadcast; scoring is one exploded
      // token join + one keyed agg + one per-doc argmax window over <=
      // 3 rows per doc. Output: per-source topic mix.
      (s, d) => {
        import s.implicits._
        val lexicon = Seq(
          "engine" -> Seq("agg", "filter", "group", "join", "query",
            "scan", "sort", "spark", "window"),
          "storage" -> Seq("batch", "column", "data", "hash", "key",
            "merge", "part", "row", "table"),
          "stream" -> Seq("fast", "line", "slow", "stream", "value",
            "vector")).flatMap { case (tp, ws) => ws.map(w => (tp, w)) }
          .toDF("topic", "term")
        val docs = t(s, d, "documents")
        val toks = docs.select(col("doc_id"),
          explode(TextAnalysis.tokens(lower(col("text")))).as("term"))
        val scores = toks.join(broadcast(lexicon), Seq("term"))
          .groupBy("doc_id", "topic").agg(count(lit(1)).as("hits"))
        val wDoc = Window.partitionBy("doc_id")
          .orderBy(col("hits").desc, col("topic"))
        val best = scores
          .withColumn("rn", row_number().over(wDoc)).filter(col("rn") === 1)
          .select("doc_id", "topic", "hits")
        docs.join(best, Seq("doc_id"), "left")
          .groupBy(col("source"),
            coalesce(col("topic"), lit("none")).as("topic"))
          .agg(count(lit(1)).as("n_docs"),
            coalesce(sum("hits"), lit(0L)).as("total_hits"))
          .orderBy("source", "topic")
      },
      Some("""WITH lex(topic, term) AS (VALUES
             |  ('engine','agg'),('engine','filter'),('engine','group'),
             |  ('engine','join'),('engine','query'),('engine','scan'),
             |  ('engine','sort'),('engine','spark'),('engine','window'),
             |  ('storage','batch'),('storage','column'),('storage','data'),
             |  ('storage','hash'),('storage','key'),('storage','merge'),
             |  ('storage','part'),('storage','row'),('storage','table'),
             |  ('stream','fast'),('stream','line'),('stream','slow'),
             |  ('stream','stream'),('stream','value'),('stream','vector')),
             |tok AS (
             |  SELECT doc_id,
             |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
             |  FROM documents),
             |sc AS (
             |  SELECT t.doc_id, l.topic, COUNT(*) AS hits
             |  FROM tok t JOIN lex l ON t.term = l.term GROUP BY 1, 2),
             |best AS (
             |  SELECT doc_id, topic, hits FROM (
             |    SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
             |      ORDER BY hits DESC, topic) AS rn FROM sc) WHERE rn = 1)
             |SELECT d.source, COALESCE(b.topic, 'none') AS topic,
             |  COUNT(*) AS n_docs,
             |  CAST(COALESCE(SUM(b.hits), 0) AS BIGINT) AS total_hits
             |FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id
             |GROUP BY 1, 2 ORDER BY source, topic""".stripMargin)),

    Q("graph_rich_club", // rich-club coefficient φ(k): edge density
      // among nodes of degree > k, for a k grid — "do the hubs trade
      // with each other" (Zhou & Mondragón 2004), the structure number
      // behind hub-exclusion decisions in the pair-generation family.
      // Degrees come off the shared canonical co-purchase index; each
      // k level is a filter over the degree-annotated edge list (the
      // grid explodes, never re-scans). All-integer counts, exact
      // ratios rounded.
      (s, d) => {
        val edges = coPurchasePairs(s, d).filter(col("n") >= 2)
          .select("src", "dst")
        val deg = edges.select(explode(array(col("src"), col("dst")))
            .as("id"))
          .groupBy("id").agg(count(lit(1)).as("dg"))
          .localCheckpoint(eager = false) // node grid + 2 edge joins
        val ks = Seq(4, 8, 16, 32)
        val nodesK = deg.select(col("dg"), explode(typedLit(ks)).as("k"))
          .filter(col("dg") > col("k"))
          .groupBy("k").agg(count(lit(1)).as("n_nodes"))
        val edgesK = edges
          .join(deg.select(col("id").as("src"), col("dg").as("da")),
            Seq("src"))
          .join(deg.select(col("id").as("dst"), col("dg").as("db")),
            Seq("dst"))
          .select(col("da"), col("db"), explode(typedLit(ks)).as("k"))
          .filter(col("da") > col("k") && col("db") > col("k"))
          .groupBy("k").agg(count(lit(1)).as("n_edges"))
        nodesK.join(edgesK, Seq("k"), "left_outer")
          .select(col("k"), col("n_nodes"),
            coalesce(col("n_edges"), lit(0L)).as("n_edges"),
            when(col("n_nodes") >= 2,
              round(lit(2.0) * coalesce(col("n_edges"), lit(0L))
                / (col("n_nodes") * (col("n_nodes") - 1)), 6)).as("phi"))
          .orderBy("k")
      },
      Some("""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
             |p AS (SELECT a.l_partkey AS src, b.l_partkey AS dst
             |  FROM op a JOIN op b
             |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
             |deg AS (SELECT id, COUNT(*) AS dg FROM (
             |    SELECT src AS id FROM p UNION ALL SELECT dst FROM p)
             |  GROUP BY 1),
             |ks AS (SELECT unnest([4, 8, 16, 32]) AS k),
             |nk AS (SELECT k, COUNT(*) AS n_nodes FROM deg, ks
             |  WHERE dg > k GROUP BY 1),
             |ek AS (SELECT k, COUNT(*) AS n_edges
             |  FROM p JOIN deg da ON da.id = p.src
             |  JOIN deg db ON db.id = p.dst, ks
             |  WHERE da.dg > k AND db.dg > k GROUP BY 1)
             |SELECT nk.k, nk.n_nodes,
             |  CAST(COALESCE(ek.n_edges, 0) AS BIGINT) AS n_edges,
             |  CASE WHEN nk.n_nodes >= 2 THEN
             |    ROUND(2.0 * COALESCE(ek.n_edges, 0)
             |      / (nk.n_nodes * (nk.n_nodes - 1)), 6) END AS phi
             |FROM nk LEFT JOIN ek ON nk.k = ek.k
             |ORDER BY nk.k""".stripMargin)),

    Q("graph_modularity", // community-quality score: Newman modularity
      // Q = intra/m - sum_c(D_c^2)/(4 m^2) of the 3-round
      // label-propagation partition over the co-purchase part graph —
      // the number that says whether the communities the LP family
      // reports are structure or noise. Every aggregate is an INTEGER
      // (intra-edge count, per-community degree sums, their squares);
      // Q is ONE final float expression, so both engines compute the
      // identical IEEE-754 value with no addition-order slack. Rides
      // the shared co-purchase edge index.
      (s, d) => {
        val edges = coPurchasePairs(s, d).filter(col("n") >= 2)
          .select("src", "dst")
        val labels = graft.operators.Graph.labelPropagation(
          edges, iters = 3, canonicalEdges = true)
        val deg = edges.select(col("src").as("id"))
          .unionAll(edges.select(col("dst").as("id")))
          .groupBy("id").agg(count(lit(1)).as("deg"))
        val mDf = edges.agg(count(lit(1)).as("n_edges"))
        val intraDf = edges
          .join(labels.select(col("id").as("src"), col("label").as("la")),
            Seq("src"))
          .join(labels.select(col("id").as("dst"), col("label").as("lb")),
            Seq("dst"))
          .filter(col("la") === col("lb"))
          .agg(count(lit(1)).as("intra_edges"))
        val s2 = deg.join(labels, Seq("id"))
          .groupBy("label").agg(sum("deg").as("dsum"))
          .agg(sum(col("dsum") * col("dsum")).as("sum_dsq"),
            count(lit(1)).as("n_communities"))
        s2.crossJoin(broadcast(mDf)).crossJoin(broadcast(intraDf))
          .select(col("n_communities"), col("n_edges"), col("intra_edges"),
            col("sum_dsq"),
            round(col("intra_edges").cast("double") / col("n_edges")
              - col("sum_dsq").cast("double")
                / (lit(4.0) * col("n_edges") * col("n_edges")), 6)
              .as("modularity"))
      },
      Some("""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
             |p AS (SELECT a.l_partkey AS src, b.l_partkey AS dst
             |  FROM op a JOIN op b
             |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
             |sym AS (SELECT src, dst FROM p UNION SELECT dst, src FROM p),
             |l0 AS (SELECT DISTINCT src AS id, src AS label FROM sym),
             |l1 AS (SELECT src AS id, label FROM (
             |    SELECT s.src, l.label, ROW_NUMBER() OVER (PARTITION BY s.src
             |      ORDER BY COUNT(*) DESC, l.label) AS rn
             |    FROM sym s JOIN l0 l ON s.dst = l.id
             |    GROUP BY s.src, l.label) WHERE rn = 1),
             |l2 AS (SELECT src AS id, label FROM (
             |    SELECT s.src, l.label, ROW_NUMBER() OVER (PARTITION BY s.src
             |      ORDER BY COUNT(*) DESC, l.label) AS rn
             |    FROM sym s JOIN l1 l ON s.dst = l.id
             |    GROUP BY s.src, l.label) WHERE rn = 1),
             |l3 AS (SELECT src AS id, label FROM (
             |    SELECT s.src, l.label, ROW_NUMBER() OVER (PARTITION BY s.src
             |      ORDER BY COUNT(*) DESC, l.label) AS rn
             |    FROM sym s JOIN l2 l ON s.dst = l.id
             |    GROUP BY s.src, l.label) WHERE rn = 1),
             |m AS (SELECT COUNT(*) AS m FROM p),
             |intra AS (SELECT COUNT(*) AS intra FROM p
             |  JOIN l3 a ON p.src = a.id JOIN l3 b ON p.dst = b.id
             |  WHERE a.label = b.label),
             |deg AS (SELECT src AS id, COUNT(*) AS d FROM sym GROUP BY 1),
             |dc AS (SELECT l.label, CAST(SUM(d.d) AS BIGINT) AS dsum
             |  FROM deg d JOIN l3 l ON d.id = l.id GROUP BY 1),
             |s2 AS (SELECT CAST(SUM(dsum * dsum) AS BIGINT) AS sum_dsq,
             |         COUNT(*) AS n_communities FROM dc)
             |SELECT s2.n_communities, m.m AS n_edges,
             |  intra.intra AS intra_edges, s2.sum_dsq,
             |  ROUND(CAST(intra.intra AS DOUBLE) / m.m
             |    - CAST(s2.sum_dsq AS DOUBLE) / (4.0 * m.m * m.m), 6)
             |    AS modularity
             |FROM s2, m, intra""".stripMargin)),

    Q("doc_minhash_band_sweep", // LSH band-geometry DESIGN sweep: how
      // many candidate pairs does each (bands, rows-per-band) split of
      // the SAME 64-lane signature generate, and how many documents do
      // they touch — the cost/recall curve read before committing a
      // geometry to a corpus-scale dedup run (rows↑ → sharper s-curve →
      // fewer, higher-precision candidates; the crossover sits near
      // (1/b)^(1/r)). Rides the ONE memoized signature scan shared with
      // doc_minhash_neardups / doc_minhash_calibration; each geometry
      // re-bands the in-memory array only.
      (s, d) => Dedup.minhashBandSweep(minhashSigs(s, d))
        .orderBy("bands"),
      Some("""WITH d AS (
             |  SELECT doc_id AS id, string_split_regex(lower(trim(text)), '\s+') AS t
             |  FROM documents
             |), s AS (
             |  SELECT id, list_distinct(list_transform(
             |    range(0, greatest(len(t) - 2, 1)),
             |    i -> array_to_string(t[(i+1):(i+3)], ' '))) AS sh
             |  FROM d
             |), hm AS (
             |  SELECT id, list_transform(sh,
             |    x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % 2147483647) AS hs
             |  FROM s
             |), sig AS (
             |  SELECT id, list_transform(range(0, 64), j -> list_min(
             |    list_transform(hs, h -> ((j*2+1) * h + j*12347 + 1) % 2147483647))) AS g
             |  FROM hm
             |), cfg AS (SELECT unnest([32, 16, 8]) AS bands,
             |           unnest([2, 4, 8]) AS rows_per_band
             |), banded AS (
             |  SELECT c.bands, c.rows_per_band, sig.id, b.b AS band,
             |    array_to_string(
             |      g[(b.b*c.rows_per_band+1):(b.b*c.rows_per_band+c.rows_per_band)],
             |      ',') AS bucket
             |  FROM sig, cfg c, range(0, 32) AS b(b)
             |  WHERE b.b < c.bands
             |), cand AS (
             |  SELECT DISTINCT a.bands, a.rows_per_band, a.id AS id_a, c.id AS id_b
             |  FROM banded a JOIN banded c
             |    ON a.bands = c.bands AND a.band = c.band AND a.bucket = c.bucket
             |    AND a.id < c.id
             |)
             |SELECT bands, rows_per_band,
             |  CAST(COUNT(*) / 2 AS BIGINT) AS n_candidate_pairs,
             |  CAST(COUNT(DISTINCT id) AS BIGINT) AS n_docs
             |FROM (SELECT bands, rows_per_band,
             |        unnest([id_a, id_b]) AS id FROM cand)
             |GROUP BY 1, 2 ORDER BY bands""".stripMargin)),

    Q("cust_blocking_quality", // entity-resolution BLOCKING-KEY planner:
      // for each candidate blocking key over the customer table, the
      // block-size distribution and the within-block pair budget
      // Σ b·(b−1)/2 the fuzzy matcher would pay, vs the all-pairs
      // n·(n−1)/2 — the report that picks a discriminative key BEFORE a
      // 100 TB fuzzy-dedup run (the quadratic guard cust_fuzzy_pairs'
      // blockCol contract demands). Three key-grained rollups unioned;
      // totals ride a one-row broadcast.
      (s, d) => {
        val cust = t(s, d, "customer")
        val total = cust.agg(count(lit(1)).as("n_total"))
        def report(keyName: String, key: Column): DataFrame =
          cust.groupBy(key.as("k")).agg(count(lit(1)).as("b"))
            .agg(count(lit(1)).as("n_blocks"), max("b").as("max_block"),
              sum(col("b") * (col("b") - 1) / 2).cast("long")
                .as("candidate_pairs"))
            .select(lit(keyName).as("blocking_key"), col("n_blocks"),
              col("max_block"), col("candidate_pairs"))
        report("nation", col("c_nationkey"))
          .unionAll(report("segment", col("c_mktsegment")))
          .unionAll(report("nation_x_segment",
            concat_ws("|", col("c_nationkey"), col("c_mktsegment"))))
          // the key the fuzzy matcher actually runs on (r7): nation ×
          // all-but-last-2-chars positional q-gram — max_block stays
          // bounded (~100) at any corpus size, where the other three
          // grow linearly with the corpus
          .unionAll(report("nation_x_name_prefix",
            concat_ws("|", col("c_nationkey"),
              expr("substring(c_name, 1, length(c_name) - 2)"))))
          .crossJoin(broadcast(total))
          .select(col("blocking_key"), col("n_blocks"), col("max_block"),
            col("candidate_pairs"),
            round(col("candidate_pairs").cast("double")
              / (col("n_total") * (col("n_total") - 1) / 2), 6)
              .as("pair_share"))
          .orderBy("blocking_key")
      },
      Some("""WITH tot AS (SELECT COUNT(*) AS n_total FROM customer),
             |r1 AS (
             |  SELECT 'nation' AS blocking_key, COUNT(*) AS n_blocks,
             |    CAST(MAX(b) AS BIGINT) AS max_block,
             |    CAST(SUM(b * (b - 1) / 2) AS BIGINT) AS candidate_pairs
             |  FROM (SELECT COUNT(*) AS b FROM customer GROUP BY c_nationkey)),
             |r2 AS (
             |  SELECT 'segment', COUNT(*),
             |    CAST(MAX(b) AS BIGINT),
             |    CAST(SUM(b * (b - 1) / 2) AS BIGINT)
             |  FROM (SELECT COUNT(*) AS b FROM customer GROUP BY c_mktsegment)),
             |r3 AS (
             |  SELECT 'nation_x_segment', COUNT(*),
             |    CAST(MAX(b) AS BIGINT),
             |    CAST(SUM(b * (b - 1) / 2) AS BIGINT)
             |  FROM (SELECT COUNT(*) AS b FROM customer
             |        GROUP BY c_nationkey, c_mktsegment)),
             |r4 AS (
             |  SELECT 'nation_x_name_prefix', COUNT(*),
             |    CAST(MAX(b) AS BIGINT),
             |    CAST(SUM(b * (b - 1) / 2) AS BIGINT)
             |  FROM (SELECT COUNT(*) AS b FROM customer
             |        GROUP BY c_nationkey,
             |          substr(c_name, 1, length(c_name) - 2))),
             |u AS (SELECT * FROM r1 UNION ALL SELECT * FROM r2
             |      UNION ALL SELECT * FROM r3 UNION ALL SELECT * FROM r4)
             |SELECT blocking_key, n_blocks, max_block, candidate_pairs,
             |  ROUND(CAST(candidate_pairs AS DOUBLE)
             |    / (n_total * (n_total - 1) / 2), 6) AS pair_share
             |FROM u, tot ORDER BY blocking_key""".stripMargin)),

    Q("emb_ivf_pq_topk", // the PRODUCTION ANN stack in one query: IVF
      // coarse pruning (deterministic Lloyd, 8 lists, probe 3) → PQ
      // asymmetric-distance scan over the survivors (4×16 deterministic
      // codebooks; the query's exact subvectors against each vector's
      // m-byte code) → exact cosine re-rank of the 50 best ADC
      // candidates. Both models are driver-side kilobyte literals; the
      // corpus pass is membership filter + codegen'd argmin + ADC
      // arithmetic + two bounded top-k merges. The oracle RE-TRAINS
      // both models in SQL (the same unrolled rounds the lloyd-IVF and
      // PQ oracles pin) and must land on the identical candidate set,
      // ADC values, and final ranking.
      (s, d) => {
        val e = t(s, d, "embeddings")
        val qv = e.filter(col("vec_id") === 0).select("embedding")
          .head().getSeq[Float](0).map(_.toDouble)
        Similarity.ivfPqTopK(e.filter(col("vec_id") =!= 0), qv, 10)
      },
      Some {
        // coarse-quantizer rounds (the lloyd-IVF oracle's builders)
        def assign(src: String, cents: String, out: String): String =
          s"""$out AS (SELECT vec_id, v, cl FROM (
             |  SELECT $src.vec_id AS vec_id, $src.v AS v, $cents.cl AS cl,
             |    row_number() OVER (PARTITION BY $src.vec_id
             |      ORDER BY list_sum(list_transform(range(1, 65),
             |        i -> ($src.v[i] - $cents.c[i]) * ($src.v[i] - $cents.c[i]))),
             |        $cents.cl) AS rn
             |  FROM $src, $cents) WHERE rn = 1)""".stripMargin
        def ivfRound(prev: String, cur: String): String =
          s"""${assign("e", prev, s"a$cur")},
             |m$cur AS (SELECT cl, t.dim, AVG(v[t.dim]) AS m
             |  FROM a$cur, range(1, 65) AS t(dim) GROUP BY cl, t.dim),
             |n$cur AS (SELECT cl, list(m ORDER BY dim) AS c FROM m$cur GROUP BY cl),
             |$cur AS (SELECT $prev.cl, COALESCE(n$cur.c, $prev.c) AS c
             |  FROM $prev LEFT JOIN n$cur ON $prev.cl = n$cur.cl)""".stripMargin
        // per-subvector PQ codebook rounds (the PQ oracle's builders),
        // trained on the SAME query-free corpus the Spark side trains on
        def sub(i: Int): String = {
          val lo = i * 16 + 1; val hi = (i + 1) * 16
          def dist(s: String, p: String) =
            s"list_sum(list_transform(range(1, 17), t -> ($s.sv[t] - $p.c[t]) * ($s.sv[t] - $p.c[t])))"
          def round(r: Int): String = {
            val prev = s"s${i}c${r - 1}"
            s"""s${i}a$r AS (SELECT vec_id, sv, cl FROM (
               |  SELECT s.vec_id AS vec_id, s.sv AS sv, p.cl AS cl,
               |    row_number() OVER (PARTITION BY s.vec_id
               |      ORDER BY ${dist("s", "p")}, p.cl) AS rn
               |  FROM sub$i s, $prev p) WHERE rn = 1),
               |s${i}m$r AS (SELECT cl, t.dim, AVG(sv[t.dim]) AS mn
               |  FROM s${i}a$r, range(1, 17) AS t(dim) GROUP BY cl, t.dim),
               |s${i}n$r AS (SELECT cl, list(mn ORDER BY dim) AS c FROM s${i}m$r GROUP BY cl),
               |s${i}c$r AS (SELECT p.cl, COALESCE(n.c, p.c) AS c
               |  FROM s${i}c${r - 1} p LEFT JOIN s${i}n$r n ON p.cl = n.cl)""".stripMargin
          }
          // x$i: assign the CANDIDATE's subvector to its nearest code
          // (the encode step), but expose the QUERY's distance to that
          // centroid — the asymmetric-distance term
          s"""sub$i AS (SELECT vec_id, v[$lo:$hi] AS sv FROM e),
             |s${i}c0 AS (SELECT (row_number() OVER (ORDER BY vec_id)) - 1 AS cl, sv AS c
             |  FROM sub$i ORDER BY vec_id LIMIT 16),
             |${round(1)},
             |${round(2)},
             |${round(3)},
             |x$i AS (SELECT vec_id, qerr FROM (
             |  SELECT s.vec_id AS vec_id,
             |    list_sum(list_transform(range(1, 17),
             |      t -> (q.qv[$lo - 1 + t] - p.c[t]) * (q.qv[$lo - 1 + t] - p.c[t]))) AS qerr,
             |    row_number() OVER (PARTITION BY s.vec_id
             |      ORDER BY ${dist("s", "p")}, p.cl) AS rn
             |  FROM (SELECT * FROM sub$i WHERE vec_id IN (SELECT vec_id FROM cands)) s,
             |    s${i}c3 p, q) WHERE rn = 1)""".stripMargin
        }
        s"""WITH e AS (SELECT vec_id,
           |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           |  FROM embeddings WHERE vec_id <> 0),
           |q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
           |  FROM embeddings WHERE vec_id = 0),
           |c0 AS (SELECT (row_number() OVER (ORDER BY vec_id)) - 1 AS cl, v AS c
           |  FROM e ORDER BY vec_id LIMIT 8),
           |${ivfRound("c0", "c1")},
           |${ivfRound("c1", "c2")},
           |${ivfRound("c2", "c3")},
           |near AS (SELECT cl FROM c3, q
           |  ORDER BY list_cosine_similarity(c, qv) DESC, cl LIMIT 3),
           |${assign("e", "c3", "af")},
           |cands AS (SELECT vec_id, v FROM af
           |  WHERE cl IN (SELECT cl FROM near)),
           |${sub(0)},
           |${sub(1)},
           |${sub(2)},
           |${sub(3)},
           |scored AS (
           |  SELECT cd.vec_id,
           |    ROUND(x0.qerr + x1.qerr + x2.qerr + x3.qerr, 6) AS adc
           |  FROM cands cd JOIN x0 USING (vec_id) JOIN x1 USING (vec_id)
           |    JOIN x2 USING (vec_id) JOIN x3 USING (vec_id)),
           |topc AS (SELECT vec_id, adc FROM scored
           |  ORDER BY adc, vec_id LIMIT 50)
           |SELECT t.vec_id, t.adc,
           |  ROUND(list_cosine_similarity(e.v, q.qv), 6) AS cos
           |FROM topc t JOIN e ON t.vec_id = e.vec_id, q
           |ORDER BY cos DESC, t.vec_id LIMIT 10""".stripMargin
      }),

    Q("cust_gini_revenue", // Gini concentration of customer revenue —
      // the inequality summary behind "how concentrated is our demand".
      // Closed form over ONE distributed range sort of the per-customer
      // rollup (Scale.giniFromRanks): 2·Σ rank·x / (n·Σx) − (n+1)/n,
      // no O(n²) pairwise |xᵢ−xⱼ| expansion, nothing but two partial
      // sums at the driver. Ties commute in the formula, so the
      // tie-break-free sort is still deterministic.
      (s, d) => {
        val rev = t(s, d, "orders").groupBy("o_custkey")
          .agg(sum(col("o_totalprice").cast("double")).as("rev"))
        val ranked = Scale.rankValues(rev, "rev")
        val n = ranked.n
        val g = try Scale.giniFromRanks(ranked) finally ranked.unpersist()
        import s.implicits._
        Seq((n, BigDecimal(g)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
          .toDF("n_cust", "gini")
      },
      Some("""WITH rev AS (
             |  SELECT o_custkey, SUM(CAST(o_totalprice AS DOUBLE)) AS rev
             |  FROM orders GROUP BY o_custkey),
             |r AS (SELECT rev, row_number() OVER (ORDER BY rev) AS rk FROM rev)
             |SELECT COUNT(*) AS n_cust,
             |  ROUND(2.0 * SUM(rk * rev) / (COUNT(*) * SUM(rev))
             |    - (COUNT(*) + 1.0) / COUNT(*), 6) AS gini
             |FROM r""".stripMargin)),

    Q("events_ks_drift", // two-sample Kolmogorov–Smirnov drift test per
      // event type: max CDF gap of `value` between the first and second
      // half of the month — the distribution-shift gate a training
      // pipeline runs before mixing a new data window in. Counts
      // collapse to the (type, value) grain first, then ONE keyed
      // cumulative window builds both empirical CDFs; every input to
      // the divisions is an exact integer, so the statistic is
      // bit-deterministic.
      (s, d) => {
        val split = java.sql.Date.valueOf("2024-01-16")
        graft.operators.Stats
          .ks2Sample(t(s, d, "events"), "event_type", "value",
            to_date(col("ts")) < lit(split))
          .select(col("event_type"), col("n_a"), col("n_b"),
            round(col("ks"), 6).as("ks"))
          .orderBy("event_type")
      },
      Some("""WITH pts AS (
             |  SELECT event_type, value,
             |    SUM(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
             |        THEN 1 ELSE 0 END) AS ca,
             |    SUM(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
             |        THEN 0 ELSE 1 END) AS cb
             |  FROM events GROUP BY 1, 2),
             |c AS (
             |  SELECT event_type,
             |    SUM(ca) OVER (PARTITION BY event_type ORDER BY value) AS cuma,
             |    SUM(cb) OVER (PARTITION BY event_type ORDER BY value) AS cumb,
             |    SUM(ca) OVER (PARTITION BY event_type) AS na,
             |    SUM(cb) OVER (PARTITION BY event_type) AS nb
             |  FROM pts)
             |SELECT event_type,
             |  CAST(MAX(na) AS BIGINT) AS n_a, CAST(MAX(nb) AS BIGINT) AS n_b,
             |  ROUND(MAX(ABS(CAST(cuma AS DOUBLE) / na
             |    - CAST(cumb AS DOUBLE) / nb)), 6) AS ks
             |FROM c GROUP BY event_type ORDER BY event_type""".stripMargin)),

    Q("events_wasserstein_drift", // 1-Wasserstein (earth-mover) drift
      // per event type between the month's halves — unlike KS's single
      // worst gap, W₁ = ∫|F_A − F_B| dx weights HOW FAR the value mass
      // moved, the distance sample-mixing planners actually budget
      // against. Same (type, value)-grain + one keyed cumulative
      // window as the KS twin; the segment sum is the one float
      // aggregation, rounded.
      (s, d) => {
        val split = java.sql.Date.valueOf("2024-01-16")
        graft.operators.Stats
          .wasserstein1(t(s, d, "events"), "event_type", "value",
            to_date(col("ts")) < lit(split))
          .select(col("event_type"), col("n_a"), col("n_b"),
            round(col("w1"), 6).as("w1"))
          .orderBy("event_type")
      },
      Some("""WITH pts AS (
             |  SELECT event_type, value,
             |    SUM(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
             |        THEN 1 ELSE 0 END) AS ca,
             |    SUM(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
             |        THEN 0 ELSE 1 END) AS cb
             |  FROM events GROUP BY 1, 2),
             |c AS (
             |  SELECT event_type, value,
             |    SUM(ca) OVER (PARTITION BY event_type ORDER BY value) AS cuma,
             |    SUM(cb) OVER (PARTITION BY event_type ORDER BY value) AS cumb,
             |    SUM(ca) OVER (PARTITION BY event_type) AS na,
             |    SUM(cb) OVER (PARTITION BY event_type) AS nb,
             |    LEAD(value) OVER (PARTITION BY event_type ORDER BY value) AS nx
             |  FROM pts)
             |SELECT event_type,
             |  CAST(MAX(na) AS BIGINT) AS n_a, CAST(MAX(nb) AS BIGINT) AS n_b,
             |  ROUND(SUM(CASE WHEN nx IS NOT NULL
             |    THEN ABS(CAST(cuma AS DOUBLE) / na
             |      - CAST(cumb AS DOUBLE) / nb) * (nx - value) END), 6) AS w1
             |FROM c GROUP BY event_type ORDER BY event_type""".stripMargin)),

    Q("events_chi2_independence", // chi-square test of independence for
      // event_type × ISO weekday: the "is activity mix day-of-week
      // dependent" gate. Observed counts collapse to the ≤ types×7
      // grain before any window touches them, so the margin windows run
      // over a bounded relation; expected counts and the statistic are
      // closed-form arithmetic on exact integers.
      (s, d) => graft.operators.Stats
        .chiSquare(t(s, d, "events"), col("event_type"),
          weekday(to_date(col("ts"))) + 1)
        .select(round(col("chi2"), 6).as("chi2"), col("dof"), col("n")),
      Some("""WITH o AS (
             |  SELECT event_type, isodow(CAST(ts AS DATE)) AS dow,
             |    COUNT(*) AS o
             |  FROM events GROUP BY 1, 2),
             |x AS (
             |  SELECT o,
             |    CAST(SUM(o) OVER (PARTITION BY event_type) AS DOUBLE) AS rt,
             |    CAST(SUM(o) OVER (PARTITION BY dow) AS DOUBLE) AS ct,
             |    CAST(SUM(o) OVER () AS DOUBLE) AS n,
             |    event_type, dow
             |  FROM o)
             |SELECT ROUND(SUM((o - rt * ct / n) * (o - rt * ct / n)
             |    / (rt * ct / n)), 6) AS chi2,
             |  CAST((COUNT(DISTINCT event_type) - 1)
             |    * (COUNT(DISTINCT dow) - 1) AS BIGINT) AS dof,
             |  CAST(MAX(n) AS BIGINT) AS n
             |FROM x""".stripMargin)),

    Q("events_top_paths", // most common 3-step event-type sequences —
      // the path-mining view behind funnel design. One per-user ordered
      // window (total order: ts then event_id) emits each trigram
      // map-side via LEAD; the count is a plain hash aggregation on the
      // bounded path key (≤ types³ distinct values).
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        t(s, d, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"))
          .withColumn("e2", lead("event_type", 1).over(w))
          .withColumn("e3", lead("event_type", 2).over(w))
          .filter(col("e3").isNotNull)
          .select(concat_ws(">", col("event_type"), col("e2"), col("e3"))
            .as("path"))
          .groupBy("path").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("path")).limit(20)
      },
      Some("""WITH s AS (
             |  SELECT event_type,
             |    lead(event_type, 1) OVER
             |      (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
             |    lead(event_type, 2) OVER
             |      (PARTITION BY user_id ORDER BY ts, event_id) AS e3
             |  FROM events)
             |SELECT event_type || '>' || e2 || '>' || e3 AS path,
             |  COUNT(*) AS n
             |FROM s WHERE e3 IS NOT NULL
             |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin)),

    Q("emb_pca_power", // dominant principal direction of the embedding
      // Gram matrix by 3-round power iteration — the spectral summary
      // behind whitening / anisotropy checks on an embedding corpus.
      // Each round is two distributed passes (s = X·v map-side, then
      // u = Xᵀ·s as a d-keyed aggregation): the d×d covariance is never
      // materialized and only a d-vector reaches the driver, which is
      // the shape that survives 100 TB of vectors. Inputs, per-row
      // projections, and the iterate are rounded to 6 dp each round so
      // the oracle replays the identical arithmetic.
      (s, d) => {
        val v = Similarity.powerIteration(t(s, d, "embeddings"),
          "embedding", dim = 64, iters = 3, scale = 6)
        import s.implicits._
        v.toSeq.zipWithIndex.map { case (x, i) => (i + 1, x) }
          .toDF("dim", "loading")
      },
      Some {
        def itr(prev: String, k: Int): String =
          s"""s$k AS (SELECT vec_id, ROUND(SUM(x * $prev.val), 6) AS s
             |  FROM e JOIN $prev USING (dim) GROUP BY vec_id),
             |u$k AS (SELECT dim, SUM(e.x * s$k.s) AS u
             |  FROM e JOIN s$k USING (vec_id) GROUP BY dim),
             |n$k AS (SELECT SQRT(SUM(u * u)) AS nrm FROM u$k),
             |v$k AS (SELECT dim, ROUND(u / (SELECT nrm FROM n$k), 6) AS val
             |  FROM u$k)""".stripMargin
        s"""WITH e AS (
           |  SELECT vec_id, CAST(i AS INT) AS dim,
           |    ROUND(CAST(embedding[i] AS DOUBLE), 6) AS x
           |  FROM embeddings, range(1, 65) t(i)),
           |v0 AS (SELECT CAST(dim AS INT) AS dim, CAST(0.125 AS DOUBLE) AS val
           |  FROM range(1, 65) t(dim)),
           |${itr("v0", 1)},
           |${itr("v1", 2)},
           |${itr("v2", 3)},
           |sg AS (SELECT CASE WHEN (SELECT val FROM v3
           |    ORDER BY ABS(val) DESC, dim LIMIT 1) < 0
           |  THEN -1.0 ELSE 1.0 END AS s)
           |SELECT dim, ROUND(val * (SELECT s FROM sg), 6) + 0.0 AS loading
           |FROM v3 ORDER BY dim""".stripMargin
      }),

    Q("dq_fd_discovery", // functional-dependency audit over a candidate
      // set: which column→column determinations hold, and for the ones
      // that fail, the g1 error (minimum rows to delete for the FD to
      // hold — the TANE-profiler counting form). Two hash aggregations
      // per candidate on the lhs key; never pairwise.
      (s, d) => {
        val c = t(s, d, "customer")
        Seq(
          ("c_custkey->c_nationkey", col("c_custkey"), col("c_nationkey")),
          ("c_mktsegment->c_nationkey", col("c_mktsegment"), col("c_nationkey")),
          ("c_name->c_custkey", col("c_name"), col("c_custkey")),
          ("c_nationkey->c_mktsegment", col("c_nationkey"), col("c_mktsegment")))
          .map { case (nm, l, r) =>
            graft.operators.DataQuality.fdAudit(c, nm, l, r)
          }
          .reduce(_ unionByName _)
          .orderBy("fd")
      },
      Some {
        def cand(nm: String, l: String, r: String): String =
          s"""SELECT '$nm' AS fd,
             |  CAST(COUNT(*) AS BIGINT) AS lhs_groups,
             |  CAST(SUM(CASE WHEN nrhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS violating_groups,
             |  CAST(SUM(tot - mx) AS BIGINT) AS g1_rows
             |FROM (
             |  SELECT l, SUM(c) AS tot, MAX(c) AS mx, COUNT(*) AS nrhs
             |  FROM (SELECT $l AS l, $r AS r, COUNT(*) AS c
             |        FROM customer GROUP BY 1, 2) g
             |  GROUP BY l) x""".stripMargin
        s"""${cand("c_custkey->c_nationkey", "c_custkey", "c_nationkey")}
           |UNION ALL
           |${cand("c_mktsegment->c_nationkey", "c_mktsegment", "c_nationkey")}
           |UNION ALL
           |${cand("c_name->c_custkey", "c_name", "c_custkey")}
           |UNION ALL
           |${cand("c_nationkey->c_mktsegment", "c_nationkey", "c_mktsegment")}
           |ORDER BY fd""".stripMargin
      }),

    Q("doc_vocab_coverage", // cumulative token-coverage curve: what
      // share of all token occurrences the top-k vocabulary entries
      // cover, at k ∈ {1,2,4,8,16} — the curve that sizes a tokenizer
      // vocabulary. The explode collapses map-side into the
      // vocabulary-sized term grain before the (benign, bounded)
      // global-order window runs.
      (s, d) => {
        val counts = t(s, d, "documents")
          .select(explode(TextAnalysis.tokens(lower(col("text")))).as("term"))
          .groupBy("term").agg(count(lit(1)).as("tf"))
        val w = Window.orderBy(col("tf").desc, col("term"))
        counts
          .withColumn("rk", row_number().over(w))
          .withColumn("cum", sum("tf").over(w))
          .withColumn("tot", sum("tf").over(Window.partitionBy()))
          .filter(col("rk").isin(1, 2, 4, 8, 16))
          .select(col("rk").as("vocab_k"),
            round(col("cum").cast("double") / col("tot"), 6).as("coverage"))
          .orderBy("vocab_k")
      },
      Some("""WITH tf AS (
             |  SELECT term, COUNT(*) AS tf FROM (
             |    SELECT unnest(string_split_regex(lower(trim(text)), '\s+'))
             |      AS term
             |    FROM documents) GROUP BY term),
             |r AS (
             |  SELECT CAST(row_number() OVER (ORDER BY tf DESC, term) AS INT)
             |      AS vocab_k,
             |    SUM(tf) OVER (ORDER BY tf DESC, term) AS cum,
             |    SUM(tf) OVER () AS tot
             |  FROM tf)
             |SELECT vocab_k, ROUND(CAST(cum AS DOUBLE) / tot, 6) AS coverage
             |FROM r WHERE vocab_k IN (1, 2, 4, 8, 16)
             |ORDER BY vocab_k""".stripMargin)),

    Q("cust_er_golden", // entity resolution end-to-end: the fuzzy name
      // pairs (the cust_fuzzy_pairs candidate scheme — composite
      // nation × name-prefix blocking, see that query on why the plain
      // nation block degenerates at scale) collapse through the
      // threshold-gated connected components into golden-record
      // clusters — canonical id = min reachable key, one row per merged
      // entity with its member set. The pair list is the small side
      // (output of matching, not the corpus), so components run on
      // edges only; the oracle closes the same pairs with a recursive
      // CTE.
      (s, d) => {
        val pairs = Dedup.editDistancePairs(
          t(s, d, "customer").withColumn("blk_key", concat_ws("|",
            col("c_nationkey"),
            expr("substring(c_name, 1, length(c_name) - 2)"))),
          blockCol = "blk_key",
          strCol = "c_name", idCol = "c_custkey", maxDist = 2)
        Dedup.dupClustersOf(Dedup.connectedComponents(pairs))
          .withColumnRenamed("cluster_id", "canonical_id")
          .orderBy("canonical_id")
      },
      Some("""WITH RECURSIVE c AS (
             |  SELECT c_nationkey, c_custkey, c_name,
             |    row_number() OVER (
             |      PARTITION BY c_nationkey, substr(c_name, 1, length(c_name) - 2)
             |      ORDER BY c_custkey) AS rn
             |  FROM customer),
             |p AS (
             |  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
             |  FROM c a JOIN c b
             |  ON a.c_nationkey = b.c_nationkey
             |  AND substr(a.c_name, 1, length(a.c_name) - 2)
             |    = substr(b.c_name, 1, length(b.c_name) - 2)
             |  AND a.c_custkey < b.c_custkey
             |  WHERE a.rn <= 10000 AND b.rn <= 10000
             |    AND levenshtein(a.c_name, b.c_name) <= 2),
             |edges AS (SELECT id_a AS src, id_b AS dst FROM p
             |          UNION SELECT id_b, id_a FROM p),
             |reach(id, r) AS (
             |  SELECT src, src FROM edges
             |  UNION
             |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
             |comp AS (SELECT id, MIN(r) AS canonical_id FROM reach GROUP BY id)
             |SELECT canonical_id, COUNT(*) AS n_members,
             |  array_to_string(list_sort(list(id)), ',') AS members
             |FROM comp GROUP BY canonical_id ORDER BY canonical_id""".stripMargin)),

    Q("events_mannwhitney_weekend", // Mann–Whitney rank-sum test per
      // event type: does `value` distribute differently on weekends?
      // The nonparametric two-sample companion to events_ks_drift.
      // Midranks come from ONE keyed cumulative window over the
      // (type, value) grain; every term is an exact integer or exact
      // half, so U and the rank-biserial effect size are
      // bit-deterministic with no tolerance.
      (s, d) => graft.operators.Stats
        .mannWhitney(t(s, d, "events"), "event_type", "value",
          weekday(to_date(col("ts"))) >= 5)
        .select(col("event_type"), col("n_a").as("n_we"),
          col("n_b").as("n_wd"), round(col("u_a"), 1).as("u_we"),
          round(col("rank_biserial"), 6).as("rank_biserial"))
        .orderBy("event_type"),
      Some("""WITH pts AS (
             |  SELECT event_type, value,
             |    SUM(CASE WHEN isodow(CAST(ts AS DATE)) >= 6
             |        THEN 1 ELSE 0 END) AS ca,
             |    SUM(CASE WHEN isodow(CAST(ts AS DATE)) >= 6
             |        THEN 0 ELSE 1 END) AS cb
             |  FROM events GROUP BY 1, 2),
             |m AS (
             |  SELECT event_type, ca, cb,
             |    CAST(SUM(ca + cb) OVER (PARTITION BY event_type
             |        ORDER BY value) - (ca + cb) AS DOUBLE)
             |      + (ca + cb + 1) / 2.0 AS mid
             |  FROM pts),
             |agg AS (
             |  SELECT event_type,
             |    CAST(SUM(ca) AS BIGINT) AS n_we,
             |    CAST(SUM(cb) AS BIGINT) AS n_wd,
             |    SUM(ca * mid) AS r_we
             |  FROM m GROUP BY event_type)
             |SELECT event_type, n_we, n_wd,
             |  ROUND(r_we - CAST(n_we AS DOUBLE) * (n_we + 1) / 2, 1) AS u_we,
             |  ROUND(2.0 * (r_we - CAST(n_we AS DOUBLE) * (n_we + 1) / 2)
             |    / (n_we * n_wd) - 1, 6) AS rank_biserial
             |FROM agg ORDER BY event_type""".stripMargin)),

    Q("events_mutual_information", // mutual information between event
      // type and hour-of-day (plus both marginal entropies and the
      // normalized MI): the dependence summary that — unlike chi-square
      // — is in interpretable nats and feeds feature-selection
      // pipelines directly. Counts collapse to the ≤ types×24 grain
      // before the margin windows; every probability is an exact
      // integer ratio.
      (s, d) => graft.operators.Stats
        .mutualInformation(t(s, d, "events"), col("event_type"),
          hour(col("ts")))
        .select(round(col("mi_nats"), 6).as("mi_nats"),
          round(col("h_x"), 6).as("h_type"),
          round(col("h_y"), 6).as("h_hour"))
        .withColumn("nmi", round(col("mi_nats")
          / least(col("h_type"), col("h_hour")), 6)),
      Some("""WITH o AS (
             |  SELECT event_type, hour(ts) AS hr, COUNT(*) AS o
             |  FROM events GROUP BY 1, 2),
             |x AS (
             |  SELECT o,
             |    SUM(o) OVER (PARTITION BY event_type) AS rt,
             |    SUM(o) OVER (PARTITION BY hr) AS ct,
             |    SUM(o) OVER () AS n
             |  FROM o),
             |agg AS (
             |  SELECT
             |    ROUND(SUM((CAST(o AS DOUBLE) / n)
             |      * ln(CAST(o AS DOUBLE) * n / (rt * ct))), 6) AS mi_nats,
             |    ROUND(-SUM((CAST(o AS DOUBLE) / n)
             |      * ln(CAST(rt AS DOUBLE) / n)), 6) AS h_type,
             |    ROUND(-SUM((CAST(o AS DOUBLE) / n)
             |      * ln(CAST(ct AS DOUBLE) / n)), 6) AS h_hour
             |  FROM x)
             |SELECT mi_nats, h_type, h_hour,
             |  ROUND(mi_nats / least(h_type, h_hour), 6) AS nmi
             |FROM agg""".stripMargin)),

    Q("orders_kendall_tau", // Kendall τ-b rank correlation between time
      // and monthly order volume — the robust monotone-trend companion
      // to the OLS/Theil–Sen fits. Orders roll to the bounded ~80-row
      // month grain FIRST; the pairwise pass is a self-join of that
      // bounded series (≈3k pairs, a deliberate small-relation
      // cross-product like the Theil–Sen oracle), with the tie
      // correction from a count-of-counts aggregate. All concordance
      // counts are exact integers.
      (s, d) => graft.operators.Stats
        .kendallTauB(
          t(s, d, "orders")
            .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
            .agg(count(lit(1)).as("cnt")),
          "ym", "cnt")
        .select(col("n").as("n_months"), col("concordant"),
          col("discordant"), round(col("tau_b"), 6).as("tau_b")),
      Some("""WITH m AS (
             |  SELECT strftime(o_orderdate, '%Y-%m') AS ym, COUNT(*) AS cnt
             |  FROM orders GROUP BY 1),
             |p AS (
             |  SELECT
             |    CAST(SUM(CASE WHEN b.cnt > a.cnt THEN 1 ELSE 0 END) AS BIGINT)
             |      AS concordant,
             |    CAST(SUM(CASE WHEN b.cnt < a.cnt THEN 1 ELSE 0 END) AS BIGINT)
             |      AS discordant
             |  FROM m a JOIN m b ON a.ym < b.ym),
             |t AS (
             |  SELECT CAST(SUM(tb * (tb - 1) / 2) AS BIGINT) AS n2,
             |    CAST(SUM(tb) AS BIGINT) AS n
             |  FROM (SELECT cnt, COUNT(*) AS tb FROM m GROUP BY cnt))
             |SELECT n AS n_months, concordant, discordant,
             |  ROUND((concordant - discordant)
             |    / sqrt(CAST(n * (n - 1) / 2 AS DOUBLE)
             |      * (n * (n - 1) / 2 - n2)), 6) AS tau_b
             |FROM p, t""".stripMargin)),

    Q("emb_davies_bouldin", // Davies–Bouldin cluster-quality report in
      // cosine distance: per label, within-cluster scatter s_i (mean
      // 1−cos to the own centroid) and the worst (s_i+s_j)/d_ij ratio
      // against every other centroid — the second standard clustering
      // index next to emb_silhouette_report, graded per cluster so the
      // offender is named. Centroid dims round to 6dp first and the
      // scatters round BEFORE the ratio, so both engines divide
      // identical numbers; all centroid-grid work is a bounded k×k
      // fan-out.
      (s, d) => {
        val e = t(s, d, "embeddings")
          .select(col("vec_id"), col("label"),
            transform(col("embedding"), x => x.cast("double")).as("emb"))
        val cents = Similarity.centroids(t(s, d, "embeddings"))
          .select(col("cluster"),
            transform(col("centroid"), x => round(x, 6)).as("cent"))
        val scatter = e
          .join(broadcast(cents), col("label") === col("cluster"))
          .groupBy(col("label"))
          .agg(count(lit(1)).as("n_vectors"),
            round(avg(lit(1.0)
              - VectorFunctions.cosine(col("emb"), col("cent"))), 6)
              .as("s_own"))
        val a = cents.select(col("cluster").as("la"), col("cent").as("ca"))
        val b = cents.select(col("cluster").as("lb"), col("cent").as("cb"))
        val grid = a.crossJoin(broadcast(b)).filter(col("la") =!= col("lb"))
          .select(col("la"), col("lb"),
            (lit(1.0) - VectorFunctions.cosine(col("ca"), col("cb")))
              .as("d_ij"))
        val sa = scatter.select(col("label").as("la"), col("n_vectors"),
          col("s_own").as("sa"))
        val sb = scatter.select(col("label").as("lb"), col("s_own").as("sb"))
        val wPick = Window.partitionBy("la")
          .orderBy(col("ratio").desc, col("lb"))
        grid.join(sa, Seq("la")).join(sb, Seq("lb"))
          .withColumn("ratio", (col("sa") + col("sb")) / col("d_ij"))
          .withColumn("rn", row_number().over(wPick))
          .filter(col("rn") === 1)
          .select(col("la").as("label"), col("n_vectors"),
            col("sa").as("s_own"), col("lb").as("worst_other"),
            round(col("ratio"), 6).as("db_ratio"))
          .orderBy("label")
      },
      Some("""WITH e AS (
             |  SELECT vec_id, label,
             |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
             |  FROM embeddings),
             |cd AS (SELECT label AS cluster, i AS dim,
             |    ROUND(AVG(CAST(embedding[i] AS DOUBLE)), 6) AS m
             |  FROM embeddings, range(1, 65) t(i) GROUP BY 1, 2),
             |c AS (SELECT cluster, list(m ORDER BY dim) AS cent
             |  FROM cd GROUP BY cluster),
             |sc AS (
             |  SELECT e.label, COUNT(*) AS n_vectors,
             |    ROUND(AVG(1.0 - list_cosine_similarity(emb, cent)), 6) AS s_own
             |  FROM e JOIN c ON e.label = c.cluster GROUP BY e.label),
             |grid AS (
             |  SELECT a.cluster AS la, b.cluster AS lb,
             |    1.0 - list_cosine_similarity(a.cent, b.cent) AS d_ij
             |  FROM c a JOIN c b ON a.cluster <> b.cluster),
             |r AS (
             |  SELECT la, lb, sa.n_vectors, sa.s_own AS sa, sb.s_own AS sb,
             |    (sa.s_own + sb.s_own) / d_ij AS ratio
             |  FROM grid
             |  JOIN sc sa ON grid.la = sa.label
             |  JOIN sc sb ON grid.lb = sb.label),
             |pick AS (
             |  SELECT la, lb, n_vectors, sa, ratio, row_number() OVER (
             |    PARTITION BY la ORDER BY ratio DESC, lb) AS rn
             |  FROM r)
             |SELECT la AS label, n_vectors, sa AS s_own,
             |  lb AS worst_other, ROUND(ratio, 6) AS db_ratio
             |FROM pick WHERE rn = 1 ORDER BY label""".stripMargin)),

    Q("emb_pca_explained", // explained-variance ratio of the top
      // principal direction: the Rayleigh quotient Σ(x·v)² over the
      // total energy Σ‖x‖², with v the emb_pca_power iterate — the
      // "how anisotropic is this embedding space" number that decides
      // whether whitening is worth a pipeline stage. Two map-side
      // passes; per-row projections round to 6dp exactly as the
      // iteration rounds them, so both engines square identical
      // numbers; λ is sign-invariant so no flip is needed.
      (s, d) => {
        val v = Similarity.powerIteration(t(s, d, "embeddings"),
          "embedding", dim = 64, iters = 3, scale = 6)
        val vLit = array(v.map(lit).toIndexedSeq: _*)
        val x = transform(col("embedding"), c => round(c.cast("double"), 6))
        val proj = round(aggregate(zip_with(x, vLit, (a, b) => a * b),
          lit(0.0), (acc, e) => acc + e), 6)
        val energy = aggregate(transform(x, c => c * c),
          lit(0.0), (acc, e) => acc + e)
        t(s, d, "embeddings")
          .select(proj.as("s"), energy.as("en"))
          .agg(round(sum(col("s") * col("s")), 4).as("lambda1"),
            round(sum(col("en")), 4).as("total_var"),
            round(sum(col("s") * col("s")) / sum(col("en")), 6).as("evr"))
      },
      Some {
        def itr(prev: String, k: Int): String =
          s"""s$k AS (SELECT vec_id, ROUND(SUM(x * $prev.val), 6) AS s
             |  FROM e JOIN $prev USING (dim) GROUP BY vec_id),
             |u$k AS (SELECT dim, SUM(e.x * s$k.s) AS u
             |  FROM e JOIN s$k USING (vec_id) GROUP BY dim),
             |n$k AS (SELECT SQRT(SUM(u * u)) AS nrm FROM u$k),
             |v$k AS (SELECT dim, ROUND(u / (SELECT nrm FROM n$k), 6) AS val
             |  FROM u$k)""".stripMargin
        s"""WITH e AS (
           |  SELECT vec_id, CAST(i AS INT) AS dim,
           |    ROUND(CAST(embedding[i] AS DOUBLE), 6) AS x
           |  FROM embeddings, range(1, 65) t(i)),
           |v0 AS (SELECT CAST(dim AS INT) AS dim, CAST(0.125 AS DOUBLE) AS val
           |  FROM range(1, 65) t(dim)),
           |${itr("v0", 1)},
           |${itr("v1", 2)},
           |${itr("v2", 3)},
           |proj AS (SELECT vec_id, ROUND(SUM(x * v3.val), 6) AS s
           |  FROM e JOIN v3 USING (dim) GROUP BY vec_id),
           |tot AS (SELECT SUM(x * x) AS en FROM e)
           |SELECT ROUND(SUM(s * s), 4) AS lambda1,
           |  ROUND((SELECT en FROM tot), 4) AS total_var,
           |  ROUND(SUM(s * s) / (SELECT en FROM tot), 6) AS evr
           |FROM proj""".stripMargin
      }),

    Q("graph_degree_powerlaw", // co-purchase degree distribution with a
      // Hill/Clauset tail-exponent estimate (continuous MLE with the
      // −0.5 discreteness correction at dmin = 4): the one-number check
      // that the graph family's hub guards (degree caps, bloom kills)
      // face the heavy tail they assume. Degrees are one aggregation
      // over the SHARED co-purchase pair index; the estimate is a
      // closed-form aggregate over the tail nodes.
      (s, d) => {
        val deg = coPurchasePairs(s, d)
          .select(col("src").as("id"))
          .unionAll(coPurchasePairs(s, d).select(col("dst").as("id")))
          .groupBy("id").agg(count(lit(1)).as("deg"))
        val dmin = 4
        deg.agg(count(lit(1)).as("n_nodes"), max("deg").as("max_deg"),
            sum(when(col("deg") >= dmin, 1L).otherwise(0L)).as("n_tail"),
            sum(when(col("deg") >= dmin,
              log(col("deg").cast("double") / (dmin - 0.5)))).as("lsum"))
          .select(col("n_nodes"), col("max_deg"), col("n_tail"),
            round(lit(1.0) + col("n_tail") / col("lsum"), 6).as("alpha"))
      },
      Some("""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
             |p AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
             |  FROM op a JOIN op b
             |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
             |deg AS (
             |  SELECT id, COUNT(*) AS deg FROM (
             |    SELECT src AS id FROM p UNION ALL SELECT dst FROM p)
             |  GROUP BY id)
             |SELECT COUNT(*) AS n_nodes, CAST(MAX(deg) AS BIGINT) AS max_deg,
             |  CAST(SUM(CASE WHEN deg >= 4 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_tail,
             |  ROUND(1.0 + SUM(CASE WHEN deg >= 4 THEN 1 ELSE 0 END)
             |    / SUM(CASE WHEN deg >= 4
             |          THEN ln(deg / 3.5) END), 6) AS alpha
             |FROM deg""".stripMargin)),

    Q("events_entropy_rate", // entropy rate of the per-user event-type
      // Markov chain: −Σ p(s,t)·ln p(t|s) in nats, plus the ln(k)
      // normalization — how predictable the NEXT event is given the
      // current one, the sequence-compressibility summary the
      // transition matrix alone doesn't give. Transition counts are
      // the bounded k×k grain; everything after is closed-form exact
      // integer ratios.
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(unix_micros(col("ts")), col("event_id"))
        val c = t(s, d, "events")
          .select(col("user_id"), col("event_type"), col("ts"),
            col("event_id"))
          .withColumn("next_type", lead("event_type", 1).over(w))
          .filter(col("next_type").isNotNull)
          .groupBy(col("event_type").as("from_type"),
            col("next_type").as("to_type"))
          .agg(count(lit(1)).as("n"))
        c.withColumn("ns", sum("n").over(Window.partitionBy("from_type")))
          .withColumn("nt", sum("n").over(Window.partitionBy()))
          .agg(max("nt").as("n_transitions"),
            countDistinct("to_type").as("k_states"),
            round(-sum((col("n").cast("double") / col("nt"))
              * log(col("n").cast("double") / col("ns"))), 6)
              .as("entropy_rate_nats"))
          .withColumn("h_norm", round(col("entropy_rate_nats")
            / log(col("k_states").cast("double")), 6))
      },
      Some("""WITH seq AS (
             |  SELECT user_id, event_type,
             |    LEAD(event_type) OVER (PARTITION BY user_id
             |      ORDER BY epoch_us(ts), event_id) AS next_type
             |  FROM events),
             |c AS (SELECT event_type AS from_type, next_type AS to_type,
             |    COUNT(*) AS n
             |  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
             |x AS (
             |  SELECT n,
             |    SUM(n) OVER (PARTITION BY from_type) AS ns,
             |    SUM(n) OVER () AS nt,
             |    to_type
             |  FROM c),
             |agg AS (
             |  SELECT CAST(MAX(nt) AS BIGINT) AS n_transitions,
             |    CAST(COUNT(DISTINCT to_type) AS BIGINT) AS k_states,
             |    ROUND(-SUM((CAST(n AS DOUBLE) / nt)
             |      * ln(CAST(n AS DOUBLE) / ns)), 6) AS entropy_rate_nats
             |  FROM x)
             |SELECT n_transitions, k_states, entropy_rate_nats,
             |  ROUND(entropy_rate_nats / ln(CAST(k_states AS DOUBLE)), 6)
             |    AS h_norm
             |FROM agg""".stripMargin)),

    Q("events_welch_weekend", // Welch's unequal-variance t statistic for
      // weekend vs weekday `value` per event type — the parametric
      // companion to the rank-sum test, with the Welch–Satterthwaite
      // degrees of freedom. ONE keyed aggregation collects (n, Σx, Σx²)
      // per side; everything after is closed-form arithmetic, so no
      // second pass for the variances.
      (s, d) => graft.operators.Stats
        .welchT(t(s, d, "events"), "event_type", "value",
          weekday(to_date(col("ts"))) >= 5)
        .select(col("event_type"), col("n_a").as("n_we"),
          col("n_b").as("n_wd"),
          round(col("mean_diff"), 6).as("mean_diff"),
          round(col("t_welch"), 4).as("t_welch"),
          round(col("df"), 2).as("df"))
        .orderBy("event_type"),
      Some("""WITH g AS (
             |  SELECT event_type,
             |    SUM(CASE WHEN isodow(CAST(ts AS DATE)) >= 6
             |        THEN 1 ELSE 0 END) AS na,
             |    SUM(CASE WHEN isodow(CAST(ts AS DATE)) >= 6
             |        THEN value ELSE 0 END) AS sa,
             |    SUM(CASE WHEN isodow(CAST(ts AS DATE)) >= 6
             |        THEN value * value ELSE 0 END) AS qa,
             |    SUM(CASE WHEN isodow(CAST(ts AS DATE)) >= 6
             |        THEN 0 ELSE 1 END) AS nb,
             |    SUM(CASE WHEN isodow(CAST(ts AS DATE)) >= 6
             |        THEN 0 ELSE value END) AS sb,
             |    SUM(CASE WHEN isodow(CAST(ts AS DATE)) >= 6
             |        THEN 0 ELSE value * value END) AS qb
             |  FROM events GROUP BY event_type),
             |x AS (
             |  SELECT event_type, na, nb,
             |    sa / na AS ma, sb / nb AS mb,
             |    ((qa - sa * sa / na) / (na - 1)) / na AS sea,
             |    ((qb - sb * sb / nb) / (nb - 1)) / nb AS seb
             |  FROM g)
             |SELECT event_type,
             |  CAST(na AS BIGINT) AS n_we, CAST(nb AS BIGINT) AS n_wd,
             |  ROUND(ma - mb, 6) AS mean_diff,
             |  ROUND((ma - mb) / sqrt(sea + seb), 4) AS t_welch,
             |  ROUND((sea + seb) * (sea + seb)
             |    / (sea * sea / (na - 1) + seb * seb / (nb - 1)), 2) AS df
             |FROM x ORDER BY event_type""".stripMargin)),

    Q("lineitem_spearman_corr", // Spearman rank correlation per return
      // flag — the monotone-association twin of the Pearson probe
      // (outlier- and curvature-robust). Midranks come from the
      // (flag, value) grain (one keyed window per axis), map back via
      // grain-keyed joins, and the coefficient is the same closed-form
      // moment arithmetic; midrank moments are exactly representable,
      // so the statistic is bit-deterministic.
      (s, d) => graft.operators.Stats
        .spearmanByGroup(t(s, d, "lineitem"), "l_returnflag",
          "l_quantity", "l_extendedprice")
        .select(col("l_returnflag"), col("n"),
          round(col("spearman_rho"), 6).as("spearman_rho"))
        .orderBy("l_returnflag"),
      Some {
        def rk(v: String, out: String) =
          s"""SELECT l_returnflag, $v,
             |    CAST(SUM(c) OVER (PARTITION BY l_returnflag ORDER BY $v)
             |      - c AS DOUBLE) + CAST(c + 1 AS DOUBLE) / 2 AS $out
             |  FROM (SELECT l_returnflag, $v, COUNT(*) AS c
             |        FROM lineitem GROUP BY 1, 2)""".stripMargin
        s"""WITH rx AS (${rk("l_quantity", "mrx")}),
           |ry AS (${rk("l_extendedprice", "mry")}),
           |rows_r AS (
           |  SELECT l.l_returnflag, rx.mrx, ry.mry
           |  FROM lineitem l
           |  JOIN rx ON rx.l_returnflag = l.l_returnflag
           |    AND rx.l_quantity = l.l_quantity
           |  JOIN ry ON ry.l_returnflag = l.l_returnflag
           |    AND ry.l_extendedprice = l.l_extendedprice),
           |g AS (SELECT l_returnflag, COUNT(*) AS n,
           |    SUM(mrx) AS sx, SUM(mry) AS sy, SUM(mrx * mrx) AS sxx,
           |    SUM(mry * mry) AS syy, SUM(mrx * mry) AS sxy
           |  FROM rows_r GROUP BY 1)
           |SELECT l_returnflag, n,
           |  ROUND((n * sxy - sx * sy)
           |    / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
           |    AS spearman_rho
           |FROM g ORDER BY l_returnflag""".stripMargin
      }),

    Q("lineitem_price_qty_corr", // Pearson correlation of quantity vs
      // extended price per return flag — the covariance-structure probe
      // over the fact table. One keyed aggregation collects the five
      // moment sums; the coefficient is the textbook closed form so
      // both engines divide identical expressions (no reliance on
      // either engine's internal corr() algorithm).
      (s, d) => graft.operators.Stats
        .pearsonByGroup(t(s, d, "lineitem"), "l_returnflag",
          col("l_quantity"), col("l_extendedprice"))
        .select(col("l_returnflag"), col("n"),
          round(col("pearson_r"), 6).as("pearson_r"))
        .orderBy("l_returnflag"),
      Some("""WITH g AS (
             |  SELECT l_returnflag, COUNT(*) AS n,
             |    SUM(CAST(l_quantity AS DOUBLE)) AS sx,
             |    SUM(CAST(l_extendedprice AS DOUBLE)) AS sy,
             |    SUM(CAST(l_quantity AS DOUBLE)
             |      * CAST(l_quantity AS DOUBLE)) AS sxx,
             |    SUM(CAST(l_extendedprice AS DOUBLE)
             |      * CAST(l_extendedprice AS DOUBLE)) AS syy,
             |    SUM(CAST(l_quantity AS DOUBLE)
             |      * CAST(l_extendedprice AS DOUBLE)) AS sxy
             |  FROM lineitem GROUP BY l_returnflag)
             |SELECT l_returnflag, n,
             |  ROUND((n * sxy - sx * sy)
             |    / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
             |    AS pearson_r
             |FROM g ORDER BY l_returnflag""".stripMargin)),

    Q("graph_assortativity", // degree assortativity of the co-purchase
      // graph: Pearson correlation of endpoint degrees over the
      // directed edge list — do hubs link to hubs? The number that
      // decides whether the graph family's hub caps bite on a
      // correlated core or scattered spokes. Degrees come off the
      // SHARED pair index; by symmetry only three integer sums are
      // needed, all exact until the single final division.
      (s, d) => {
        val pairs = coPurchasePairs(s, d).select("src", "dst")
        val deg = pairs.select(col("src").as("id"))
          .unionAll(pairs.select(col("dst").as("id")))
          .groupBy("id").agg(count(lit(1)).as("deg"))
        val directed = pairs
          .unionAll(pairs.select(col("dst").as("src"), col("src").as("dst")))
        val ends = directed
          .join(deg.select(col("id").as("src"), col("deg").as("du")), "src")
          .join(deg.select(col("id").as("dst"), col("deg").as("dv")), "dst")
        ends.agg(count(lit(1)).as("m2"), sum("du").as("sx"),
            sum(col("du") * col("du")).as("sxx"),
            sum(col("du") * col("dv")).as("sxy"))
          .select((col("m2") / 2).cast("long").as("n_edges"),
            round((col("m2").cast("double") * col("sxy")
              - col("sx").cast("double") * col("sx"))
              / (col("m2").cast("double") * col("sxx")
                - col("sx").cast("double") * col("sx")), 6)
              .as("assortativity"))
      },
      Some("""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
             |p AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
             |  FROM op a JOIN op b
             |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
             |deg AS (
             |  SELECT id, COUNT(*) AS deg FROM (
             |    SELECT src AS id FROM p UNION ALL SELECT dst FROM p)
             |  GROUP BY id),
             |dir AS (SELECT src, dst FROM p
             |        UNION ALL SELECT dst, src FROM p),
             |ends AS (
             |  SELECT da.deg AS du, db.deg AS dv
             |  FROM dir JOIN deg da ON dir.src = da.id
             |           JOIN deg db ON dir.dst = db.id),
             |g AS (
             |  SELECT COUNT(*) AS m2, SUM(du) AS sx,
             |    SUM(du * du) AS sxx, SUM(du * dv) AS sxy
             |  FROM ends)
             |SELECT CAST(m2 / 2 AS BIGINT) AS n_edges,
             |  ROUND((CAST(m2 AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sx)
             |    / (CAST(m2 AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 6)
             |    AS assortativity
             |FROM g""".stripMargin)),

    Q("doc_dedup_yield_funnel", // the END-TO-END dedup pipeline summary:
      // documents and tokens surviving each cumulative stage — raw →
      // exact (byte-identical) → normalized (canonical form) → near-dup
      // (shingle-Jaccard clusters) — the single table a 100 TB
      // training-data run reads to know what each dedup pass actually
      // bought in token yield. Every stage keeps the min-id
      // representative (deterministic); the near-dup stage drops
      // non-canonical members of the SHARED memoized cluster labels
      // (one connected-components run serves five queries). Each stage
      // is a window/anti-join over the prior survivors — the corpus
      // scans once, and percentages divide the one-row raw totals.
      // One-scan shape: a doc surviving the exact stage is the min id
      // of its text group; a doc surviving the normalized stage is the
      // GLOBAL min id of its normalized group (its text group is a
      // subset of that group, so the global min is automatically an
      // exact-stage survivor) — so both flags come from two keyed
      // windows over ONE pass, the near-dup flag from one left join on
      // the shared labels, and the whole funnel is a single conditional
      // aggregation unpivoted to 4 rows.
      (s, d) => {
        val flags = t(s, d, "documents")
          .select(col("doc_id"), col("text"),
            graft.operators.TextAnalysis.tokenCount(col("text")).as("ntok"))
          .withColumn("_r1", row_number().over(
            Window.partitionBy("text").orderBy("doc_id")))
          .withColumn("_r2", row_number().over(
            Window.partitionBy(Dedup.normalized(col("text")))
              .orderBy("doc_id")))
          .join(dupClusterLabels(s, d)
            .filter(col("cluster_id") =!= col("id"))
            .select(col("id").as("doc_id"), lit(1).as("_dropped")),
            Seq("doc_id"), "left_outer")
        def cnt(cond: Column): Column =
          sum(when(cond, 1L).otherwise(0L)).cast("long")
        def tok(cond: Column): Column =
          sum(when(cond, col("ntok")).otherwise(0L)).cast("long")
        val s2 = col("_r2") === 1
        val s3 = s2 && col("_dropped").isNull
        val one = flags.agg(
          count(lit(1)).as("d0"), sum("ntok").cast("long").as("t0"),
          cnt(col("_r1") === 1).as("d1"), tok(col("_r1") === 1).as("t1"),
          cnt(s2).as("d2"), tok(s2).as("t2"),
          cnt(s3).as("d3"), tok(s3).as("t3"))
        def st(name: String, dc: String, tc: String): Column =
          struct(lit(name).as("stage"), col(dc).as("n_docs"),
            col(tc).cast("long").as("n_tokens"))
        one.select(explode(array(
            st("0_raw", "d0", "t0"), st("1_exact", "d1", "t1"),
            st("2_normalized", "d2", "t2"), st("3_neardup", "d3", "t3")))
            .as("x"),
            col("d0"), col("t0"))
          .select(col("x.stage").as("stage"), col("x.n_docs").as("n_docs"),
            col("x.n_tokens").as("n_tokens"),
            round(col("x.n_docs").cast("double") / col("d0"), 4)
              .as("doc_yield"),
            round(col("x.n_tokens").cast("double") / col("t0"), 4)
              .as("token_yield"))
          .orderBy("stage")
      },
      Some(dupClustersCte + """,
             |toks AS (SELECT doc_id, text,
             |  len(string_split_regex(trim(text), '\s+')) AS ntok
             |  FROM documents),
             |e1 AS (SELECT * FROM (SELECT doc_id, text, ntok,
             |    row_number() OVER (PARTITION BY text ORDER BY doc_id) AS r
             |  FROM toks) WHERE r = 1),
             |e2 AS (SELECT * FROM (SELECT doc_id, text, ntok,
             |    row_number() OVER (PARTITION BY
             |      trim(regexp_replace(regexp_replace(lower(text),
             |        '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))
             |      ORDER BY doc_id) AS r
             |  FROM e1) WHERE r = 1),
             |dropids AS (SELECT id FROM comp WHERE cluster_id <> id),
             |e3 AS (SELECT * FROM e2 WHERE doc_id NOT IN (SELECT id FROM dropids)),
             |st AS (
             |  SELECT '0_raw' AS stage, COUNT(*) AS n_docs,
             |    CAST(SUM(ntok) AS BIGINT) AS n_tokens FROM toks
             |  UNION ALL SELECT '1_exact', COUNT(*),
             |    CAST(SUM(ntok) AS BIGINT) FROM e1
             |  UNION ALL SELECT '2_normalized', COUNT(*),
             |    CAST(SUM(ntok) AS BIGINT) FROM e2
             |  UNION ALL SELECT '3_neardup', COUNT(*),
             |    CAST(SUM(ntok) AS BIGINT) FROM e3),
             |raw AS (SELECT n_docs AS d0, n_tokens AS t0 FROM st
             |        WHERE stage = '0_raw')
             |SELECT stage, n_docs, n_tokens,
             |  ROUND(CAST(n_docs AS DOUBLE) / d0, 4) AS doc_yield,
             |  ROUND(CAST(n_tokens AS DOUBLE) / t0, 4) AS token_yield
             |FROM st, raw ORDER BY stage""".stripMargin)),

    Q("doc_source_dup_matrix", // WHICH sources duplicate WHICH: the
      // simhash near-dup pairs (global chunk-blocked candidates, the
      // doc_simhash_neardups machinery) rolled up to an unordered
      // source×source matrix with pair counts and mean Hamming distance
      // — the provenance report that tells a corpus curator where
      // cross-source copying concentrates before they pick what to
      // drop. The pair list is the small side (detector output); two
      // id-keyed joins attach sources and one bounded rollup follows.
      (s, d) => {
        val src = t(s, d, "documents").select(col("doc_id"), col("source"))
        Dedup.simhashNearDupsPortable(t(s, d, "documents"), maxDist = 8)
          .join(src.select(col("doc_id").as("id_a"), col("source").as("sa")),
            Seq("id_a"))
          .join(src.select(col("doc_id").as("id_b"), col("source").as("sb")),
            Seq("id_b"))
          .select(least(col("sa"), col("sb")).as("source_lo"),
            greatest(col("sa"), col("sb")).as("source_hi"), col("dist"))
          .groupBy("source_lo", "source_hi")
          .agg(count(lit(1)).as("n_pairs"),
            round(avg(col("dist")), 4).as("avg_dist"))
          .orderBy("source_lo", "source_hi")
      },
      Some("""WITH d AS (
             |  SELECT doc_id AS id,
             |    list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS t
             |  FROM documents
             |), tokh AS (
             |  SELECT id, ('0x' || substr(md5(t.x), 1, 15))::BIGINT AS h
             |  FROM d, unnest(d.t) AS t(x) WHERE len(d.t) > 0
             |), votes AS (
             |  SELECT id, b.b,
             |    SUM(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
             |  FROM tokh, range(0, 60) AS b(b) GROUP BY id, b.b
             |), sig AS (
             |  SELECT id, SUM(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END) AS sig
             |  FROM votes GROUP BY id
             |), ch AS (
             |  SELECT id, sig, c.c AS chunk, (sig >> (c.c * 15)) & 32767 AS ckey
             |  FROM sig, range(0, 4) AS c(c)
             |), pairs AS (
             |  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
             |    bit_count(xor(a.sig, b.sig)) AS dist
             |  FROM ch a JOIN ch b
             |    ON a.chunk = b.chunk AND a.ckey = b.ckey AND a.id < b.id
             |), nd AS (SELECT * FROM pairs WHERE dist <= 8),
             |s AS (SELECT doc_id, source FROM documents),
             |m AS (
             |  SELECT least(sa.source, sb.source) AS source_lo,
             |    greatest(sa.source, sb.source) AS source_hi, dist
             |  FROM nd JOIN s sa ON nd.id_a = sa.doc_id
             |          JOIN s sb ON nd.id_b = sb.doc_id)
             |SELECT source_lo, source_hi, COUNT(*) AS n_pairs,
             |  ROUND(AVG(dist), 4) AS avg_dist
             |FROM m GROUP BY 1, 2 ORDER BY source_lo, source_hi""".stripMargin)),

    Q("emb_ann_recall_report", // the ANN ACCEPTANCE GATE as a query:
      // recall@k of the 8-plane multi-probe LSH ranking against the
      // exact brute-force ranking for k ∈ {5, 10, 20} on the standard
      // probe vector — the number a serving team signs off on before
      // swapping the exact scan for the index. Both rankings are
      // bounded top-k frames (TakeOrderedAndProject); the overlap join
      // and the per-k rollup touch ≤ 20 rows each.
      (s, d) => {
        val e = t(s, d, "embeddings")
        val qv = e.filter(col("vec_id") === 0).select("embedding")
          .head().getSeq[Float](0).map(_.toDouble)
        val base = e.filter(col("vec_id") =!= 0)
        // rank on the ROUNDED cosine + vec_id — the cross-engine FP
        // equivalence class every ANN oracle here uses
        def ranked(df: DataFrame, rCol: String): DataFrame =
          df.withColumn(rCol, row_number().over(
            Window.orderBy(col("cos").desc, col("vec_id"))))
        val brute = ranked(Similarity.bruteForceTopK(base, qv, 20), "r_b")
          .select(col("vec_id"), col("r_b"))
        val lsh = ranked(Similarity.lshTopK(base, qv, 20, nPlanes = 8), "r_l")
          .select(col("vec_id").as("lid"), col("r_l"))
        brute.join(lsh, col("vec_id") === col("lid"), "left_outer")
          .select(col("*"), explode(array(lit(5), lit(10), lit(20))).as("k"))
          .filter(col("r_b") <= col("k"))
          .groupBy("k")
          .agg(sum(when(col("r_l").isNotNull && col("r_l") <= col("k"), 1L)
            .otherwise(0L)).as("n_overlap"))
          .select(col("k"), col("n_overlap"),
            round(col("n_overlap").cast("double") / col("k"), 4)
              .as("recall"))
          .orderBy("k")
      },
      Some(s"""WITH e AS (SELECT vec_id,
             |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings),
             |q AS (SELECT emb AS qv, ${LshOracle.bucketSql("emb")} AS qb
             |      FROM e WHERE vec_id = 0),
             |brute AS (SELECT vec_id, r_b FROM (
             |  SELECT vec_id, row_number() OVER (ORDER BY
             |      ROUND(list_cosine_similarity(emb, qv), 6) DESC, vec_id) AS r_b
             |  FROM e, q WHERE vec_id <> 0) WHERE r_b <= 20),
             |probes AS (SELECT DISTINCT xor(qb, t.m) AS b
             |  FROM q, unnest(${LshOracle.probeMasks}) AS t(m)),
             |lsh AS (SELECT vec_id, r_l FROM (
             |  SELECT vec_id, row_number() OVER (ORDER BY
             |      ROUND(list_cosine_similarity(emb, qv), 6) DESC, vec_id) AS r_l
             |  FROM e, q WHERE vec_id <> 0
             |    AND ${LshOracle.bucketSql("emb")} IN (SELECT b FROM probes))
             |  WHERE r_l <= 20),
             |ks AS (SELECT unnest([5, 10, 20]) AS k)
             |SELECT k, CAST(SUM(CASE WHEN r_l IS NOT NULL AND r_l <= k
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
             |  ROUND(SUM(CASE WHEN r_l IS NOT NULL AND r_l <= k
             |    THEN 1 ELSE 0 END) / CAST(k AS DOUBLE), 4) AS recall
             |FROM brute LEFT JOIN lsh USING (vec_id), ks
             |WHERE r_b <= k GROUP BY k ORDER BY k""".stripMargin)),

    Q("doc_dup_quality_profile", // do near-dup clusters concentrate in
      // LOW-quality documents? The curator's question before deciding
      // drop-vs-keep: Welch t on the C4/Gopher quality score between
      // cluster members and unique docs. Composes the shared memoized
      // cluster labels (left join, small side) with the per-row quality
      // features and ONE moment-sum aggregation (Stats.welchT) — the
      // corpus scans once. Quality scores are exact quarter multiples,
      // so both engines sum identical doubles.
      (s, d) => {
        val q = t(s, d, "documents")
          .select(col("doc_id"),
            graft.operators.TextAnalysis.tokenCount(col("text")).as("n_tok"),
            graft.operators.TextAnalysis.punctRatio(col("text")).as("pr"),
            graft.operators.TextAnalysis.stopwordRatio(col("text")).as("sr"),
            graft.operators.TextAnalysis.meanTokenLen(col("text")).as("mtl"))
          .select(col("doc_id"),
            graft.operators.TextAnalysis.qualityFrom(col("n_tok"),
              col("pr"), col("sr"), col("mtl")).as("quality"))
        val clustered = dupClusterLabels(s, d)
          .select(col("id").as("doc_id")).distinct()
          .withColumn("_c", lit(1))
        val flagged = q.join(clustered, Seq("doc_id"), "left_outer")
          .withColumn("_k", lit("all"))
        graft.operators.Stats
          .welchT(flagged, "_k", "quality", col("_c").isNotNull)
          .select(col("n_a").as("n_clustered"), col("n_b").as("n_unique"),
            round(col("mean_diff"), 6).as("quality_mean_diff"),
            round(col("t_welch"), 4).as("t_welch"),
            round(col("df"), 2).as("df_welch"))
      },
      Some(dupClustersCte + """,
             |f2 AS (
             |  SELECT doc_id, text,
             |    string_split_regex(lower(trim(text)), '\s+') AS toks,
             |    len(string_split_regex(trim(text), '\s+')) AS n
             |  FROM documents),
             |m2 AS (
             |  SELECT doc_id, n,
             |    CASE WHEN length(text) = 0 THEN 0.0
             |      ELSE CAST(length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g')) AS DOUBLE) / length(text) END AS pr,
             |    CASE WHEN n = 0 THEN 0.0
             |      ELSE CAST(len(list_filter(toks, t -> list_contains(['the','a','of','and','to','in','is','it','that','for'], t))) AS DOUBLE) / n END AS sr,
             |    CASE WHEN n = 0 THEN 0.0
             |      ELSE CAST(list_aggregate(list_transform(string_split_regex(trim(text), '\s+'), t -> length(t)), 'sum') AS DOUBLE) / n END AS mtl
             |  FROM f2),
             |qual AS (
             |  SELECT doc_id,
             |    ROUND(((CASE WHEN n BETWEEN 5 AND 10000 THEN 1.0 ELSE 0.0 END)
             |      + (CASE WHEN pr < 0.2 THEN 1.0 ELSE 0.0 END)
             |      + (CASE WHEN sr > 0.01 THEN 1.0 ELSE 0.0 END)
             |      + (CASE WHEN mtl BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END)) / 4.0, 2)
             |      AS quality
             |  FROM m2),
             |mem AS (SELECT DISTINCT id FROM comp),
             |flag AS (
             |  SELECT quality,
             |    CASE WHEN mem.id IS NOT NULL THEN 1.0 ELSE 0.0 END AS c
             |  FROM qual LEFT JOIN mem ON qual.doc_id = mem.id),
             |g AS (
             |  SELECT CAST(SUM(c) AS BIGINT) AS n_a,
             |    CAST(SUM(1.0 - c) AS BIGINT) AS n_b,
             |    SUM(c * quality) AS sa, SUM(c * quality * quality) AS qa,
             |    SUM((1.0 - c) * quality) AS sb,
             |    SUM((1.0 - c) * quality * quality) AS qb
             |  FROM flag),
             |w AS (
             |  SELECT n_a, n_b, sa / n_a - sb / n_b AS md,
             |    ((qa - sa * sa / n_a) / (n_a - 1)) / n_a AS sea,
             |    ((qb - sb * sb / n_b) / (n_b - 1)) / n_b AS seb
             |  FROM g)
             |SELECT n_a AS n_clustered, n_b AS n_unique,
             |  ROUND(md, 6) AS quality_mean_diff,
             |  ROUND(md / sqrt(sea + seb), 4) AS t_welch,
             |  ROUND((sea + seb) * (sea + seb)
             |    / (sea * sea / (n_a - 1) + seb * seb / (n_b - 1)), 2)
             |    AS df_welch
             |FROM w""".stripMargin)),

    Q("emb_ivf_probe_curve", // the IVF serving knob as a CURVE: one
      // deterministic-Lloyd training + one assignment pass, then
      // recall@10 vs brute force for nProbe 1..4 — the table a serving
      // team reads to pick probe width at a recall target (the
      // single-point emb_lloyd_ivf_topk answers "is it right", this
      // answers "what does each probe buy"). The brute top-10 is a
      // 10-row broadcast; each probe width is a bounded top-k over the
      // one checkpointed scored frame.
      (s, d) => {
        val e = t(s, d, "embeddings")
        val qv = e.filter(col("vec_id") === 0).select("embedding")
          .head().getSeq[Float](0).map(_.toDouble)
        val base = e.filter(col("vec_id") =!= 0)
        val curve = Similarity.lloydIvfProbeCurve(base, qv, 10)
        val brute = Similarity.bruteForceTopK(base, qv, 10)
          .select(col("vec_id").as("bid"))
        curve.join(broadcast(brute), col("vec_id") === col("bid"),
            "left_outer")
          .groupBy("n_probe")
          .agg(count(lit(1)).as("n_results"),
            sum(when(col("bid").isNotNull, 1L).otherwise(0L))
              .as("n_overlap"))
          .select(col("n_probe"), col("n_results"), col("n_overlap"),
            round(col("n_overlap").cast("double") / 10, 4)
              .as("recall_at_10"))
          .orderBy("n_probe")
      },
      Some {
        def assign(src: String, cents: String, out: String,
            materialized: Boolean = false): String = {
          val kw = if (materialized) " MATERIALIZED" else ""
          s"""$out AS$kw (SELECT vec_id, v, cl FROM (
             |  SELECT $src.vec_id AS vec_id, $src.v AS v, $cents.cl AS cl,
             |    row_number() OVER (PARTITION BY $src.vec_id
             |      ORDER BY list_sum(list_transform(range(1, 65),
             |        i -> ($src.v[i] - $cents.c[i]) * ($src.v[i] - $cents.c[i]))),
             |        $cents.cl) AS rn
             |  FROM $src, $cents) WHERE rn = 1)""".stripMargin
        }
        def round(prev: String, cur: String): String =
          s"""${assign("e", prev, s"a$cur")},
             |m$cur AS (SELECT cl, t.dim, AVG(v[t.dim]) AS m
             |  FROM a$cur, range(1, 65) AS t(dim) GROUP BY cl, t.dim),
             |n$cur AS (SELECT cl, list(m ORDER BY dim) AS c FROM m$cur GROUP BY cl),
             |$cur AS (SELECT $prev.cl, COALESCE(n$cur.c, $prev.c) AS c
             |  FROM $prev LEFT JOIN n$cur ON $prev.cl = n$cur.cl)""".stripMargin
        s"""WITH e AS (SELECT vec_id,
           |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           |  FROM embeddings WHERE vec_id <> 0),
           |q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
           |  FROM embeddings WHERE vec_id = 0),
           |c0 AS (SELECT (row_number() OVER (ORDER BY vec_id)) - 1 AS cl, v AS c
           |  FROM e ORDER BY vec_id LIMIT 8),
           |${round("c0", "c1")},
           |${round("c1", "c2")},
           |${
             // c3 feeds BOTH the probe ranking and the assignment —
             // materialize it so DuckDB doesn't re-inline (= re-train)
             // the whole chain per consumer
             round("c2", "c3").replace("c3 AS (", "c3 AS MATERIALIZED (")},
           |${assign("e", "c3", "af", materialized = true)},
           |cc AS (SELECT c3.cl AS cl, list_cosine_similarity(c3.c, qv) AS ccos
           |  FROM c3, q),
           |nr AS MATERIALIZED (SELECT cl,
           |  row_number() OVER (ORDER BY ccos DESC, cl) AS pr FROM cc),
           |ps AS (SELECT unnest([1, 2, 3, 4]) AS p),
           |cand AS (
           |  SELECT ps.p, af.vec_id,
           |    ROUND(list_cosine_similarity(af.v, q.qv), 6) AS cos
           |  FROM af JOIN nr ON af.cl = nr.cl, ps, q WHERE nr.pr <= ps.p),
           |rk AS (SELECT p, vec_id, cos, row_number()
           |    OVER (PARTITION BY p ORDER BY cos DESC, vec_id) AS r
           |  FROM cand),
           |brute AS MATERIALIZED (SELECT vec_id FROM (
           |  SELECT vec_id, row_number() OVER (ORDER BY
           |      ROUND(list_cosine_similarity(v, qv), 6) DESC, vec_id) AS r
           |  FROM e, q) WHERE r <= 10)
           |SELECT p AS n_probe, COUNT(*) AS n_results,
           |  CAST(SUM(CASE WHEN vec_id IN (SELECT vec_id FROM brute)
           |    THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
           |  ROUND(SUM(CASE WHEN vec_id IN (SELECT vec_id FROM brute)
           |    THEN 1 ELSE 0 END) / 10.0, 4) AS recall_at_10
           |FROM rk WHERE r <= 10 GROUP BY p ORDER BY p""".stripMargin
      }),

    Q("events_did_estimate", // difference-in-differences: purchase
      // (treated) vs view (control) mean event value, first half of the
      // month (pre) vs second (post) — the cohort-assignment causal
      // estimator that completes the experimentation family (CUPED,
      // power analysis, attribution). ONE conditional aggregation over
      // the two event types yields all four cells' sufficient statistics
      // (n, Σx, Σx²); the DiD point estimate and its pooled standard
      // error are scalar expressions over that single row, so 12 numbers
      // cross the final exchange and nothing else.
      (s, d) => {
        val e = t(s, d, "events")
          .filter(col("event_type").isin("purchase", "view"))
          .select((col("event_type") === "purchase").as("treated"),
            (dayofmonth(col("ts")) > 15).as("post"), col("value"))
        def cell(tr: Boolean, po: Boolean, sfx: String) = {
          val in = when(col("treated") === tr && col("post") === po,
            col("value"))
          Seq(count(in).as(s"n_$sfx"), sum(in).as(s"s_$sfx"),
            sum(in * in).as(s"q_$sfx"))
        }
        val cells = cell(true, false, "t_pre") ++ cell(true, true, "t_post") ++
          cell(false, false, "c_pre") ++ cell(false, true, "c_post")
        val g = e.agg(cells.head, cells.tail: _*)
        def m(sfx: String) = col(s"s_$sfx") / col(s"n_$sfx")
        def v(sfx: String) = (col(s"q_$sfx")
          - col(s"s_$sfx") * col(s"s_$sfx") / col(s"n_$sfx"))
          ./(col(s"n_$sfx") - lit(1))
        val did = (m("t_post") - m("t_pre")) - (m("c_post") - m("c_pre"))
        val se = sqrt(v("t_pre") / col("n_t_pre")
          + v("t_post") / col("n_t_post") + v("c_pre") / col("n_c_pre")
          + v("c_post") / col("n_c_post"))
        g.select(col("n_t_pre"), col("n_t_post"), col("n_c_pre"),
          col("n_c_post"), round(m("t_pre"), 6).as("m_t_pre"),
          round(m("t_post"), 6).as("m_t_post"),
          round(m("c_pre"), 6).as("m_c_pre"),
          round(m("c_post"), 6).as("m_c_post"),
          round(did, 6).as("did"), round(se, 6).as("se"),
          round(did / se, 4).as("t_stat"))
      },
      Some("""WITH e AS (
             |  SELECT (event_type = 'purchase') AS treated,
             |    (day(ts) > 15) AS post, value
             |  FROM events WHERE event_type IN ('purchase', 'view')),
             |c AS (SELECT
             |    COUNT(*) FILTER (treated AND NOT post) AS n_t_pre,
             |    SUM(value) FILTER (treated AND NOT post) AS s_t_pre,
             |    SUM(value * value) FILTER (treated AND NOT post) AS q_t_pre,
             |    COUNT(*) FILTER (treated AND post) AS n_t_post,
             |    SUM(value) FILTER (treated AND post) AS s_t_post,
             |    SUM(value * value) FILTER (treated AND post) AS q_t_post,
             |    COUNT(*) FILTER (NOT treated AND NOT post) AS n_c_pre,
             |    SUM(value) FILTER (NOT treated AND NOT post) AS s_c_pre,
             |    SUM(value * value) FILTER (NOT treated AND NOT post) AS q_c_pre,
             |    COUNT(*) FILTER (NOT treated AND post) AS n_c_post,
             |    SUM(value) FILTER (NOT treated AND post) AS s_c_post,
             |    SUM(value * value) FILTER (NOT treated AND post) AS q_c_post
             |  FROM e)
             |SELECT n_t_pre, n_t_post, n_c_pre, n_c_post,
             |  ROUND(s_t_pre / n_t_pre, 6) AS m_t_pre,
             |  ROUND(s_t_post / n_t_post, 6) AS m_t_post,
             |  ROUND(s_c_pre / n_c_pre, 6) AS m_c_pre,
             |  ROUND(s_c_post / n_c_post, 6) AS m_c_post,
             |  ROUND((s_t_post / n_t_post - s_t_pre / n_t_pre)
             |    - (s_c_post / n_c_post - s_c_pre / n_c_pre), 6) AS did,
             |  ROUND(sqrt(
             |      (q_t_pre - s_t_pre * s_t_pre / n_t_pre) / (n_t_pre - 1) / n_t_pre
             |    + (q_t_post - s_t_post * s_t_post / n_t_post) / (n_t_post - 1) / n_t_post
             |    + (q_c_pre - s_c_pre * s_c_pre / n_c_pre) / (n_c_pre - 1) / n_c_pre
             |    + (q_c_post - s_c_post * s_c_post / n_c_post) / (n_c_post - 1) / n_c_post), 6) AS se,
             |  ROUND(((s_t_post / n_t_post - s_t_pre / n_t_pre)
             |    - (s_c_post / n_c_post - s_c_pre / n_c_pre))
             |    / sqrt(
             |      (q_t_pre - s_t_pre * s_t_pre / n_t_pre) / (n_t_pre - 1) / n_t_pre
             |    + (q_t_post - s_t_post * s_t_post / n_t_post) / (n_t_post - 1) / n_t_post
             |    + (q_c_pre - s_c_pre * s_c_pre / n_c_pre) / (n_c_pre - 1) / n_c_pre
             |    + (q_c_post - s_c_post * s_c_post / n_c_post) / (n_c_post - 1) / n_c_post), 4) AS t_stat
             |FROM c""".stripMargin)),

    Q("orders_sprt_monitor", // Wald's sequential probability ratio test
      // on the monthly urgent-order rate (H0 p=0.18 vs H1 p=0.22,
      // α=β=0.05) — the always-valid sequential monitor an
      // experimentation stack runs instead of a fixed-horizon test. One
      // aggregation collapses orders to the bounded month grain
      // (n, urgent count); the log-likelihood increment rounds at that
      // boundary on BOTH engines before the ordered cumulative sum, so
      // float slack can never flip a decision threshold. The ln
      // constants are computed once in the JVM and inlined into the
      // oracle as shortest-round-trip literals (the model-constants
      // pattern the LSH/KMeans oracles use).
      (s, d) => {
        val m = t(s, d, "orders")
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("o_orderpriority") === "1-URGENT", 1L)
              .otherwise(0L)).as("x"))
          .withColumn("llr",
            round(col("x") * lit(SprtLr1) + (col("n") - col("x")) * lit(SprtLr0), 6))
        val w = Window.orderBy("ym")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        m.withColumn("cum_llr", round(sum("llr").over(w), 6))
          .select(col("ym"), col("n"), col("x"), col("llr"), col("cum_llr"),
            when(col("cum_llr") >= SprtBound, "accept_h1")
              .when(col("cum_llr") <= -SprtBound, "accept_h0")
              .otherwise("continue").as("decision"))
          .orderBy("ym")
      },
      Some(s"""WITH m AS (
             |  SELECT strftime(o_orderdate, '%Y-%m') AS ym, COUNT(*) AS n,
             |    CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
             |      THEN 1 ELSE 0 END) AS BIGINT) AS x
             |  FROM orders GROUP BY 1),
             |l AS (SELECT ym, n, x,
             |  ROUND(x * ($SprtLr1) + (n - x) * ($SprtLr0), 6) AS llr FROM m),
             |c AS (SELECT ym, n, x, llr,
             |  ROUND(SUM(llr) OVER (ORDER BY ym), 6) AS cum_llr FROM l)
             |SELECT ym, n, x, llr, cum_llr,
             |  CASE WHEN cum_llr >= $SprtBound THEN 'accept_h1'
             |       WHEN cum_llr <= -($SprtBound) THEN 'accept_h0'
             |       ELSE 'continue' END AS decision
             |FROM c ORDER BY ym""".stripMargin)),

    Q("doc_heaps_law", // vocabulary-growth (Heaps' law) curve: cumulative
      // distinct vocabulary vs cumulative token count at 10 corpus-prefix
      // milestones, plus the fitted Heaps exponent β from log-log OLS —
      // the saturation diagnostic that says how much NEW vocabulary the
      // next 10 TB of corpus will add. Scale shape: tokens collapse to
      // the doc grain (token counts) and the term grain (first-occurrence
      // doc) in one explode+agg each; every row then lands in its decile
      // bucket by EXACT integer arithmetic against a 1-row max-id
      // broadcast, so the cumulative curve is a 10-row window, never a
      // doc-grain scan-order window. β is fitted with window aggregates
      // over those 10 rows — no extra join, no collect.
      (s, d) => {
        val dt = t(s, d, "documents").select(col("doc_id"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
        val mx = t(s, d, "documents").agg(max("doc_id").as("mx"))
        val docn = dt.groupBy("doc_id").agg(count(lit(1)).as("n_tok"))
        val tokb = docn.crossJoin(broadcast(mx))
          .select(expr("greatest((10 * doc_id + mx - 1) div mx, 1)").as("b"),
            col("n_tok"))
          .groupBy("b").agg(sum("n_tok").as("nt"))
        val trmb = dt.groupBy("term").agg(min("doc_id").as("fd"))
          .crossJoin(broadcast(mx))
          .select(expr("greatest((10 * fd + mx - 1) div mx, 1)").as("b"))
          .groupBy("b").agg(count(lit(1)).as("nv"))
        val grid = mx.select(explode(typedLit((1 to 10).map(_.toLong)))
          .as("decile"))
        val wc = Window.orderBy("decile")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wa = Window.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)
        val c = grid
          .join(tokb.withColumnRenamed("b", "decile"), Seq("decile"), "left_outer")
          .join(trmb.withColumnRenamed("b", "decile"), Seq("decile"), "left_outer")
          .select(col("decile"),
            sum(coalesce(col("nt"), lit(0L))).over(wc).as("n_tokens"),
            sum(coalesce(col("nv"), lit(0L))).over(wc).as("vocab"))
          .withColumn("x", log(col("n_tokens")))
          .withColumn("y", log(col("vocab")))
          .withColumn("xb", avg("x").over(wa))
          .withColumn("yb", avg("y").over(wa))
        c.select(col("decile"), col("n_tokens"), col("vocab"),
            round((sum((col("x") - col("xb")) * (col("y") - col("yb")))
              .over(wa))
              / (sum((col("x") - col("xb")) * (col("x") - col("xb")))
                .over(wa)), 6).as("heaps_beta"))
          .orderBy("decile")
      },
      Some("""WITH dt AS (
             |  SELECT doc_id,
             |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
             |  FROM documents),
             |mx AS (SELECT MAX(doc_id) AS mx FROM documents),
             |docn AS (SELECT doc_id, COUNT(*) AS n_tok FROM dt GROUP BY 1),
             |tokb AS (SELECT GREATEST((10 * doc_id + mx - 1) // mx, 1) AS b,
             |    CAST(SUM(n_tok) AS BIGINT) AS nt
             |  FROM docn, mx GROUP BY 1),
             |fd AS (SELECT term, MIN(doc_id) AS fd FROM dt GROUP BY 1),
             |trmb AS (SELECT GREATEST((10 * fd + mx - 1) // mx, 1) AS b,
             |    COUNT(*) AS nv
             |  FROM fd, mx GROUP BY 1),
             |g AS (SELECT unnest(range(1, 11)) AS decile),
             |c AS (SELECT g.decile,
             |    CAST(SUM(COALESCE(nt, 0)) OVER (ORDER BY g.decile) AS BIGINT)
             |      AS n_tokens,
             |    CAST(SUM(COALESCE(nv, 0)) OVER (ORDER BY g.decile) AS BIGINT)
             |      AS vocab
             |  FROM g LEFT JOIN tokb ON tokb.b = g.decile
             |    LEFT JOIN trmb ON trmb.b = g.decile),
             |l AS (SELECT decile, n_tokens, vocab,
             |    ln(n_tokens) AS x, ln(vocab) AS y,
             |    AVG(ln(n_tokens)) OVER () AS xb,
             |    AVG(ln(vocab)) OVER () AS yb
             |  FROM c)
             |SELECT decile, n_tokens, vocab,
             |  ROUND(SUM((x - xb) * (y - yb)) OVER ()
             |    / SUM((x - xb) * (x - xb)) OVER (), 6) AS heaps_beta
             |FROM l ORDER BY decile""".stripMargin)),

    Q("graph_edge_support", // per-edge triangle support histogram — the
      // k-truss building block over the shared co-purchase part graph:
      // how many edges sit in 0, 1, 2, … triangles. Degree-oriented
      // wedge enumeration finds each triangle once, keeps the apex, and
      // explodes it map-side into its three canonical edges; one hash
      // aggregation gives every edge's support, a left join brings back
      // the support-0 edges, and the histogram is a second tiny
      // aggregation. All counts exact integers.
      (s, d) => coPurchaseEdgeSupport(s, d)
        .groupBy("support").agg(count(lit(1)).as("n_edges"))
        .orderBy("support"),
      Some("""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
             |p AS MATERIALIZED (SELECT a.l_partkey AS src, b.l_partkey AS dst
             |  FROM op a JOIN op b
             |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
             |tri AS MATERIALIZED (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
             |  FROM p e1 JOIN p e2 ON e2.src = e1.dst
             |  JOIN p e3 ON e3.src = e1.src AND e3.dst = e2.dst),
             |te AS (SELECT a AS x, b AS y FROM tri
             |  UNION ALL SELECT a, c FROM tri
             |  UNION ALL SELECT b, c FROM tri),
             |sup AS (SELECT p.src, p.dst, COUNT(te.x) AS support
             |  FROM p LEFT JOIN te ON te.x = p.src AND te.y = p.dst
             |  GROUP BY 1, 2)
             |SELECT support, COUNT(*) AS n_edges
             |FROM sup GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("orders_poisson_bootstrap_ci", // Poisson bootstrap CI for the mean
      // order value per priority — the ONLY bootstrap that works at
      // 100 TB: instead of materializing B resamples of n rows, every
      // row independently contributes Poisson(1) copies to each of
      // B=100 replicates (weights from a portable integer hash family,
      // inverse-CDF thresholds precomputed as integer cutoffs), so the
      // whole thing is ONE map-side explode into ONE hash aggregation
      // on the (priority, replicate) grain — 500 cells — followed by
      // exact order statistics on 100 replicate means per group. All
      // sums are exact integer cents; each replicate mean is a single
      // int/int division, so both engines rank bit-identical doubles.
      (s, d) => {
        val o = t(s, d, "orders").select(
          col("o_orderpriority").as("priority"), col("o_orderkey"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
        val h1 = (lit(1000003L) * col("o_orderkey") + lit(17L)) % lit(2147483647L)
        val h2 = (h1 * (col("rep") + lit(13L)) + lit(911L)) % lit(2147483647L)
        val w = when(h2 < 790015083L, 0L).when(h2 < 1580030167L, 1L)
          .when(h2 < 1975037709L, 2L).when(h2 < 2106706890L, 3L)
          .when(h2 < 2139624185L, 4L).when(h2 < 2146207644L, 5L)
          .otherwise(lit(6L))
        val rm = o
          .select(col("priority"), col("o_orderkey"), col("cents"),
            explode(sequence(lit(1L), lit(100L))).as("rep"))
          .groupBy("priority", "rep")
          .agg(sum(w * col("cents")).as("swc"), sum(w).as("sw"))
          .select(col("priority"), col("rep"),
            (col("swc").cast("double") / col("sw") / lit(100.0)).as("mean_b"))
        val rk = rm.withColumn("rk", row_number().over(
          Window.partitionBy("priority").orderBy("mean_b", "rep")))
        val ci = rk.groupBy("priority").agg(
          max(when(col("rk") === 3, col("mean_b"))).as("lo"),
          max(when(col("rk") === 98, col("mean_b"))).as("hi"))
        val pt = o.groupBy("priority").agg(count(lit(1)).as("n_orders"),
          (sum("cents").cast("double") / count(lit(1)) / lit(100.0))
            .as("mean_price"))
        pt.join(ci, Seq("priority"))
          .select(col("priority"), col("n_orders"),
            round(col("mean_price"), 4).as("mean_price"),
            round(col("lo"), 4).as("ci_lo"), round(col("hi"), 4).as("ci_hi"))
          .orderBy("priority")
      },
      Some("""WITH o AS MATERIALIZED (SELECT o_orderpriority AS priority,
             |    o_orderkey,
             |    CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
             |  FROM orders),
             |ww AS (SELECT priority, rep,
             |    CASE WHEN h2 < 790015083 THEN 0 WHEN h2 < 1580030167 THEN 1
             |         WHEN h2 < 1975037709 THEN 2 WHEN h2 < 2106706890 THEN 3
             |         WHEN h2 < 2139624185 THEN 4 WHEN h2 < 2146207644 THEN 5
             |         ELSE 6 END AS w, cents
             |  FROM (SELECT priority, rep, cents,
             |      (((1000003 * o_orderkey + 17) % 2147483647) * (rep + 13)
             |        + 911) % 2147483647 AS h2
             |    FROM o, (SELECT unnest(range(1, 101)) AS rep) AS reps)),
             |rm AS (SELECT priority, rep,
             |    CAST(SUM(w * cents) AS DOUBLE) / CAST(SUM(w) AS BIGINT)
             |      / 100.0 AS mean_b
             |  FROM ww GROUP BY 1, 2),
             |rk AS (SELECT priority, mean_b,
             |    ROW_NUMBER() OVER (PARTITION BY priority
             |      ORDER BY mean_b, rep) AS rk
             |  FROM rm),
             |ci AS (SELECT priority,
             |    MAX(CASE WHEN rk = 3 THEN mean_b END) AS lo,
             |    MAX(CASE WHEN rk = 98 THEN mean_b END) AS hi
             |  FROM rk GROUP BY 1),
             |pt AS (SELECT priority, COUNT(*) AS n_orders,
             |    CAST(SUM(cents) AS DOUBLE) / COUNT(*) / 100.0 AS mean_price
             |  FROM o GROUP BY 1)
             |SELECT pt.priority, n_orders,
             |  ROUND(mean_price, 4) AS mean_price,
             |  ROUND(lo, 4) AS ci_lo, ROUND(hi, 4) AS ci_hi
             |FROM pt JOIN ci USING (priority) ORDER BY priority""".stripMargin)),

    Q("events_holt_linear", // Holt double exponential smoothing (level +
      // trend) per event type with α = β = 1/2, plus a 7-day-ahead
      // forecast fan. The coupled recursion has no closed form, but
      // every step is a handful of IEEE adds and divisions by 2 in a
      // FIXED sequential order, so Spark's aggregate() fold over the
      // bounded per-type day series and DuckDB's recursive CTE produce
      // bit-identical states with no rounding protocol at all. Scale
      // shape: the corpus collapses to the (type, day) grain in one
      // aggregation; the fold touches only the ~90-element day arrays —
      // the documented bounded-grain contract, same as runsTest.
      (s, d) => {
        val daily = t(s, d, "events")
          .groupBy(col("event_type"),
            date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(count(lit(1)).cast("double").as("y"))
        daily.groupBy("event_type")
          .agg(array_sort(collect_list(struct(col("day"), col("y"))))
            .as("ys"))
          .filter(size(col("ys")) >= 2)
          .withColumn("st", expr(
            """aggregate(ys,
              |  named_struct('i', 0, 'l', CAST(0.0 AS DOUBLE),
              |    'b', CAST(0.0 AS DOUBLE)),
              |  (acc, e) -> CASE
              |    WHEN acc.i = 0 THEN named_struct('i', 1, 'l', e.y,
              |      'b', CAST(0.0 AS DOUBLE))
              |    WHEN acc.i = 1 THEN named_struct('i', 2, 'l', e.y,
              |      'b', e.y - acc.l)
              |    ELSE named_struct('i', acc.i + 1,
              |      'l', (e.y + acc.l + acc.b) / CAST(2.0 AS DOUBLE),
              |      'b', (((e.y + acc.l + acc.b) / CAST(2.0 AS DOUBLE))
              |        - acc.l + acc.b) / CAST(2.0 AS DOUBLE))
              |  END)""".stripMargin))
          .select(col("event_type"), col("st.l").as("l"),
            col("st.b").as("b"),
            explode(sequence(lit(1L), lit(7L))).as("h"))
          .select(col("event_type"), col("h"),
            round(col("l"), 6).as("level"), round(col("b"), 6).as("trend"),
            round(col("l") + col("h") * col("b"), 6).as("forecast"))
          .orderBy("event_type", "h")
      },
      Some("""WITH RECURSIVE daily AS MATERIALIZED (
             |  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
             |    CAST(COUNT(*) AS DOUBLE) AS y
             |  FROM events GROUP BY 1, 2),
             |idx AS MATERIALIZED (
             |  SELECT event_type, y,
             |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
             |      AS t,
             |    COUNT(*) OVER (PARTITION BY event_type) AS nd
             |  FROM daily),
             |r(event_type, t, nd, l, b) AS (
             |  SELECT a.event_type, 2, a.nd, b.y, b.y - a.y
             |  FROM idx a JOIN idx b
             |    ON a.event_type = b.event_type AND a.t = 1 AND b.t = 2
             |  WHERE a.nd >= 2
             |  UNION ALL
             |  SELECT r.event_type, r.t + 1, r.nd,
             |    (i.y + r.l + r.b) / 2.0,
             |    (((i.y + r.l + r.b) / 2.0) - r.l + r.b) / 2.0
             |  FROM r JOIN idx i
             |    ON i.event_type = r.event_type AND i.t = r.t + 1),
             |f AS (SELECT event_type, l, b FROM r WHERE t = nd)
             |SELECT event_type, h, ROUND(l, 6) AS level,
             |  ROUND(b, 6) AS trend, ROUND(l + h * b, 6) AS forecast
             |FROM f, (SELECT unnest(range(1, 8)) AS h) AS hs
             |ORDER BY event_type, h""".stripMargin)),

    Q("lineitem_gmm_em", // two-component Gaussian-mixture EM on
      // standardized line price — the latent-bimodality decomposition a
      // curator runs before picking a single quality threshold. Three
      // relational EM rounds ([[Stats.gmmEm1d]]): each round is ONE
      // aggregation over the corpus collecting six sufficient sums; the
      // only driver state is the 5-scalar parameter vector (the
      // Lloyd/PQ model-state contract), and parameters round at 4dp at
      // every boundary so both engines re-enter the next E-step from
      // identical constants. Standardization runs on exact integer
      // cents with decimal sums — bit-identical z both engines.
      (s, d) => {
        val li = t(s, d, "lineitem")
          .select(round(col("l_extendedprice") * 100, 0).cast("long")
            .as("cents"))
        graft.operators.Stats.gmmEm1d(li, "cents", 3)
      },
      Some("""WITH c AS MATERIALIZED (
             |  SELECT CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS c
             |  FROM lineitem),
             |st AS (SELECT COUNT(*) AS n,
             |    CAST(SUM(c) AS DOUBLE) / COUNT(*) AS mu,
             |    CAST(SUM(c * c) AS DOUBLE) / COUNT(*) AS e2
             |  FROM c),
             |z AS MATERIALIZED (
             |  SELECT (CAST(c.c AS DOUBLE) - st.mu)
             |    / sqrt(st.e2 - st.mu * st.mu) AS z
             |  FROM c, st),
             |r1 AS (SELECT COUNT(*) AS n, SUM(r) AS sr, SUM(r * z) AS srz,
             |    SUM(r * z * z) AS srzz, SUM(z) AS sz, SUM(z * z) AS szz,
             |    SUM(ln(mix)) AS sll
             |  FROM (SELECT z, 0.5 * f1 / (0.5 * f1 + 0.5 * f2) AS r,
             |      0.5 * f1 + 0.5 * f2 AS mix
             |    FROM (SELECT z,
             |        exp(-((z - -1.0) * (z - -1.0)) / (2.0 * 1.0 * 1.0))
             |          / (1.0 * 2.5066282746310002) AS f1,
             |        exp(-((z - 1.0) * (z - 1.0)) / (2.0 * 1.0 * 1.0))
             |          / (1.0 * 2.5066282746310002) AS f2
             |      FROM z))),
             |p1 AS (SELECT n, ROUND(sr / n, 4) AS pi1,
             |    ROUND(srz / sr, 4) AS mu1,
             |    ROUND(sqrt(GREATEST(srzz / sr - (srz / sr) * (srz / sr),
             |      0.00000001)), 4) AS sg1,
             |    ROUND((sz - srz) / (CAST(n AS DOUBLE) - sr), 4) AS mu2,
             |    ROUND(sqrt(GREATEST((szz - srzz) / (CAST(n AS DOUBLE) - sr)
             |      - ((sz - srz) / (CAST(n AS DOUBLE) - sr))
             |        * ((sz - srz) / (CAST(n AS DOUBLE) - sr)),
             |      0.00000001)), 4) AS sg2,
             |    ROUND(sll / n, 6) AS ll
             |  FROM r1),
             |r2 AS (SELECT p.n, SUM(r) AS sr, SUM(r * z) AS srz,
             |    SUM(r * z * z) AS srzz, SUM(z) AS sz, SUM(z * z) AS szz,
             |    SUM(ln(mix)) AS sll
             |  FROM (SELECT n, z, pi1 * f1 / (pi1 * f1 + (1 - pi1) * f2) AS r,
             |      pi1 * f1 + (1 - pi1) * f2 AS mix
             |    FROM (SELECT p1.n AS n, p1.pi1, z.z AS z,
             |        exp(-((z.z - p1.mu1) * (z.z - p1.mu1))
             |          / (2 * p1.sg1 * p1.sg1))
             |          / (p1.sg1 * 2.5066282746310002) AS f1,
             |        exp(-((z.z - p1.mu2) * (z.z - p1.mu2))
             |          / (2 * p1.sg2 * p1.sg2))
             |          / (p1.sg2 * 2.5066282746310002) AS f2
             |      FROM z, p1)) AS p GROUP BY p.n),
             |p2 AS (SELECT n, ROUND(sr / n, 4) AS pi1,
             |    ROUND(srz / sr, 4) AS mu1,
             |    ROUND(sqrt(GREATEST(srzz / sr - (srz / sr) * (srz / sr),
             |      0.00000001)), 4) AS sg1,
             |    ROUND((sz - srz) / (CAST(n AS DOUBLE) - sr), 4) AS mu2,
             |    ROUND(sqrt(GREATEST((szz - srzz) / (CAST(n AS DOUBLE) - sr)
             |      - ((sz - srz) / (CAST(n AS DOUBLE) - sr))
             |        * ((sz - srz) / (CAST(n AS DOUBLE) - sr)),
             |      0.00000001)), 4) AS sg2,
             |    ROUND(sll / n, 6) AS ll
             |  FROM r2),
             |r3 AS (SELECT p.n, SUM(r) AS sr, SUM(r * z) AS srz,
             |    SUM(r * z * z) AS srzz, SUM(z) AS sz, SUM(z * z) AS szz,
             |    SUM(ln(mix)) AS sll
             |  FROM (SELECT n, z, pi1 * f1 / (pi1 * f1 + (1 - pi1) * f2) AS r,
             |      pi1 * f1 + (1 - pi1) * f2 AS mix
             |    FROM (SELECT p2.n AS n, p2.pi1, z.z AS z,
             |        exp(-((z.z - p2.mu1) * (z.z - p2.mu1))
             |          / (2 * p2.sg1 * p2.sg1))
             |          / (p2.sg1 * 2.5066282746310002) AS f1,
             |        exp(-((z.z - p2.mu2) * (z.z - p2.mu2))
             |          / (2 * p2.sg2 * p2.sg2))
             |          / (p2.sg2 * 2.5066282746310002) AS f2
             |      FROM z, p2)) AS p GROUP BY p.n),
             |p3 AS (SELECT n, ROUND(sr / n, 4) AS pi1,
             |    ROUND(srz / sr, 4) AS mu1,
             |    ROUND(sqrt(GREATEST(srzz / sr - (srz / sr) * (srz / sr),
             |      0.00000001)), 4) AS sg1,
             |    ROUND((sz - srz) / (CAST(n AS DOUBLE) - sr), 4) AS mu2,
             |    ROUND(sqrt(GREATEST((szz - srzz) / (CAST(n AS DOUBLE) - sr)
             |      - ((sz - srz) / (CAST(n AS DOUBLE) - sr))
             |        * ((sz - srz) / (CAST(n AS DOUBLE) - sr)),
             |      0.00000001)), 4) AS sg2,
             |    ROUND(sll / n, 6) AS ll
             |  FROM r3)
             |SELECT 1 AS round, pi1, mu1, sg1 AS sigma1, mu2,
             |  sg2 AS sigma2, ll AS avg_loglik FROM p1
             |UNION ALL SELECT 2, pi1, mu1, sg1, mu2, sg2, ll FROM p2
             |UNION ALL SELECT 3, pi1, mu1, sg1, mu2, sg2, ll FROM p3
             |ORDER BY round""".stripMargin)),

    Q("doc_qlm_search", // query-likelihood retrieval with Dirichlet
      // smoothing (Zhai & Lafferty 2001, μ=300) — the LM-based ranking
      // that complements BM25: score(d) = Σ_q ln((tf + μ·P(t|C)) /
      // (dl + μ)), every document scored including zero-tf ones (the
      // smoothed mass is the point). Scale shape: one token explode
      // filtered to the 3 query terms → tf cells; collection stats are
      // a 3-row cf table and a 1-row token total, both broadcast onto
      // the doc-length relation — no driver collect, no full-vocab
      // intermediate. Ranking sorts by the ROUNDED score (engine ln
      // slack stays below 4dp) with doc_id tie-break.
      (s, d) => {
        val terms = Seq("spark", "join", "window")
        val toks = t(s, d, "documents").select(col("doc_id"),
          TextAnalysis.tokens(lower(col("text"))).as("ts"))
        val dl = toks.select(col("doc_id"), size(col("ts")).as("dl"))
        val tf = toks.select(col("doc_id"), explode(col("ts")).as("w"))
          .filter(col("w").isin(terms: _*))
          .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
        val cf = tf.groupBy("w").agg(sum("tf").as("cf"))
        val tot = dl.agg(sum("dl").as("tot"))
        dl.select(col("doc_id"), col("dl"),
            explode(typedLit(terms)).as("w"))
          .join(tf, Seq("doc_id", "w"), "left_outer")
          .join(broadcast(cf), Seq("w"))
          .crossJoin(broadcast(tot))
          .groupBy("doc_id")
          .agg(round(sum(log(
              (coalesce(col("tf"), lit(0L)) + lit(300.0) * col("cf") / col("tot"))
                / (col("dl") + lit(300.0)))), 4).as("score"),
            sum(when(col("tf").isNotNull, 1L).otherwise(0L)).as("n_hit"))
          .orderBy(col("score").desc, col("doc_id")).limit(20)
      },
      Some("""WITH tok AS MATERIALIZED (
             |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ts
             |  FROM documents),
             |dl AS (SELECT doc_id, len(ts) AS dl FROM tok),
             |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM (
             |    SELECT doc_id, unnest(list_filter(ts,
             |      t -> list_contains(['spark','join','window'], t))) AS w
             |    FROM tok) GROUP BY 1, 2),
             |cf AS (SELECT w, CAST(SUM(tf) AS BIGINT) AS cf FROM tf GROUP BY 1),
             |tot AS (SELECT CAST(SUM(dl) AS BIGINT) AS tot FROM dl),
             |g AS (SELECT dl.doc_id, dl.dl, q.w
             |  FROM dl, (SELECT unnest(['spark','join','window']) AS w) AS q)
             |SELECT g.doc_id,
             |  ROUND(SUM(ln((COALESCE(tf.tf, 0) + 300.0 * cf.cf / tot.tot)
             |    / (g.dl + 300.0))), 4) AS score,
             |  CAST(SUM(CASE WHEN tf.tf IS NOT NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_hit
             |FROM g LEFT JOIN tf ON tf.doc_id = g.doc_id AND tf.w = g.w
             |  JOIN cf ON cf.w = g.w CROSS JOIN tot
             |GROUP BY g.doc_id ORDER BY score DESC, g.doc_id
             |LIMIT 20""".stripMargin)),

    Q("doc_kn_bigram_lm", // interpolated Kneser–Ney bigram probabilities
      // (D=0.75) for the corpus' top-20 bigrams — the smoothing every
      // production n-gram LM uses, built from FOUR count relations that
      // all derive from ONE map-side bigram explode + hash aggregation:
      // bigram counts, context totals c(w1·), follow-set sizes
      // N1+(w1·), and continuation-set sizes N1+(·w2); the bigram-type
      // total is the only driver scalar. Exact integers until the two
      // final probability expressions.
      (s, d) => {
        val bg = t(s, d, "documents")
          .select(TextAnalysis.tokens(lower(col("text"))).as("ts"))
          .filter(size(col("ts")) >= 2)
          .select(explode(transform(sequence(lit(1), size(col("ts")) - 1),
            i => concat(element_at(col("ts"), i), lit(" "),
              element_at(col("ts"), i + 1)))).as("b"))
          .groupBy("b").agg(count(lit(1)).as("c"))
          .withColumn("w1", split(col("b"), " ").getItem(0))
          .withColumn("w2", split(col("b"), " ").getItem(1))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val types = bg.count()
        val ctx = bg.groupBy("w1")
          .agg(sum("c").as("cw1"), count(lit(1)).as("n_follow"))
        val cont = bg.groupBy("w2").agg(count(lit(1)).as("n_prec"))
        val out = bg.join(ctx, Seq("w1")).join(cont, Seq("w2"))
          .select(col("b").as("bigram"), col("c"), col("cw1"),
            col("n_follow"), col("n_prec"),
            round(col("c") / col("cw1"), 6).as("p_ml"),
            round(greatest(col("c") - lit(0.75), lit(0.0)) / col("cw1")
              + lit(0.75) * col("n_follow") / col("cw1")
                * (col("n_prec") / lit(types)), 6).as("p_kn"))
          .orderBy(col("c").desc, col("bigram")).limit(20)
          .localCheckpoint(eager = true)
        bg.unpersist(blocking = false)
        out
      },
      Some("""WITH bg AS MATERIALIZED (
             |  SELECT b, COUNT(*) AS c,
             |    split_part(b, ' ', 1) AS w1, split_part(b, ' ', 2) AS w2
             |  FROM (SELECT unnest(list_transform(range(1, len(ts)),
             |      i -> ts[i] || ' ' || ts[i+1])) AS b
             |    FROM (SELECT string_split_regex(lower(trim(text)), '\s+') AS ts
             |      FROM documents) WHERE len(ts) >= 2)
             |  GROUP BY 1),
             |ctx AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS cw1,
             |    COUNT(*) AS n_follow FROM bg GROUP BY 1),
             |cont AS (SELECT w2, COUNT(*) AS n_prec FROM bg GROUP BY 1),
             |ty AS (SELECT COUNT(*) AS types FROM bg)
             |SELECT b AS bigram, c, cw1, n_follow, n_prec,
             |  ROUND(c / cw1, 6) AS p_ml,
             |  ROUND(GREATEST(c - 0.75, 0.0) / cw1
             |    + 0.75 * n_follow / cw1 * (n_prec / types), 6) AS p_kn
             |FROM bg JOIN ctx USING (w1) JOIN cont USING (w2) CROSS JOIN ty
             |ORDER BY c DESC, bigram LIMIT 20""".stripMargin)),

    Q("graph_jaccard_neighbors", // neighborhood-Jaccard ranking of
      // co-purchase edges: an edge's common-neighbor count IS its
      // triangle support, so this reads the SHARED memoized
      // edge-support build (one wedge enumeration for the whole truss/
      // support family) and joins two degree lookups —
      // J = cn / (da + db − cn). Every input is an exact integer, so
      // both engines rank the identical double with no rounding
      // protocol; the (src, dst) tie-break pins equal scores.
      (s, d) => {
        val und = coPurchasePairs(s, d).filter(col("n") >= 2)
        val deg = und.select(col("src").as("id"))
          .union(und.select(col("dst").as("id")))
          .groupBy("id").agg(count(lit(1)).as("deg"))
        val j = col("support") /
          (col("deg_src") + col("deg_dst") - col("support"))
        coPurchaseEdgeSupport(s, d)
          .select(col("a").as("src"), col("b").as("dst"), col("support"))
          .join(deg.select(col("id").as("src"), col("deg").as("deg_src")),
            Seq("src"))
          .join(deg.select(col("id").as("dst"), col("deg").as("deg_dst")),
            Seq("dst"))
          .select(col("src"), col("dst"),
            col("support").as("common_neighbors"),
            col("deg_src"), col("deg_dst"), round(j, 6).as("jaccard"))
          .orderBy(j.desc, col("src"), col("dst")).limit(20)
      },
      Some("""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
             |p AS MATERIALIZED (SELECT a.l_partkey AS src, b.l_partkey AS dst
             |  FROM op a JOIN op b
             |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
             |tri AS MATERIALIZED (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
             |  FROM p e1 JOIN p e2 ON e2.src = e1.dst
             |  JOIN p e3 ON e3.src = e1.src AND e3.dst = e2.dst),
             |te AS (SELECT a AS x, b AS y FROM tri
             |  UNION ALL SELECT a, c FROM tri
             |  UNION ALL SELECT b, c FROM tri),
             |sup AS (SELECT p.src, p.dst, COUNT(te.x) AS support
             |  FROM p LEFT JOIN te ON te.x = p.src AND te.y = p.dst
             |  GROUP BY 1, 2),
             |deg AS (SELECT id, COUNT(*) AS deg FROM (
             |    SELECT src AS id FROM p UNION ALL SELECT dst FROM p)
             |  GROUP BY 1)
             |SELECT s.src, s.dst, s.support AS common_neighbors,
             |  da.deg AS deg_src, db.deg AS deg_dst,
             |  ROUND(s.support / (da.deg + db.deg - s.support), 6) AS jaccard
             |FROM sup s JOIN deg da ON da.id = s.src
             |  JOIN deg db ON db.id = s.dst
             |ORDER BY s.support / (da.deg + db.deg - s.support) DESC,
             |  s.src, s.dst LIMIT 20""".stripMargin)),

    Q("graph_ktruss", // bounded 3-truss peel over the co-purchase
      // graph: three rounds of "recompute per-edge triangle support,
      // drop edges outside every triangle" ([[graft.operators.Graph
      // .ktrussPeel]]) — the cohesion decomposition that isolates the
      // genuinely clustered core a community method can trust. Each
      // round is one wedge enumeration + one hash aggregation over the
      // SURVIVING edges (monotonically shrinking); the only driver
      // state is the per-round edge count, and a zero-drop round ends
      // recomputation at the mathematical fixpoint.
      (s, d) => graft.operators.Graph.ktrussPeel(
        coPurchasePairs(s, d).filter(col("n") >= 2).select("src", "dst"),
        k = 3, rounds = 3),
      Some("""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
             |e0 AS MATERIALIZED (SELECT a.l_partkey AS src, b.l_partkey AS dst
             |  FROM op a JOIN op b
             |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
             |t1 AS MATERIALIZED (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
             |  FROM e0 e1 JOIN e0 e2 ON e2.src = e1.dst
             |  JOIN e0 e3 ON e3.src = e1.src AND e3.dst = e2.dst),
             |s1 AS (SELECT x, y, COUNT(*) AS sup FROM (
             |    SELECT a AS x, b AS y FROM t1
             |    UNION ALL SELECT a, c FROM t1
             |    UNION ALL SELECT b, c FROM t1) GROUP BY 1, 2),
             |e1 AS MATERIALIZED (SELECT e.src, e.dst FROM e0 e
             |  JOIN s1 ON s1.x = e.src AND s1.y = e.dst AND s1.sup >= 1),
             |t2 AS MATERIALIZED (SELECT ea.src AS a, ea.dst AS b, eb.dst AS c
             |  FROM e1 AS ea JOIN e1 AS eb ON eb.src = ea.dst
             |  JOIN e1 AS ec ON ec.src = ea.src AND ec.dst = eb.dst),
             |s2 AS (SELECT x, y, COUNT(*) AS sup FROM (
             |    SELECT a AS x, b AS y FROM t2
             |    UNION ALL SELECT a, c FROM t2
             |    UNION ALL SELECT b, c FROM t2) GROUP BY 1, 2),
             |e2 AS MATERIALIZED (SELECT e.src, e.dst FROM e1 e
             |  JOIN s2 ON s2.x = e.src AND s2.y = e.dst AND s2.sup >= 1),
             |t3 AS MATERIALIZED (SELECT ea.src AS a, ea.dst AS b, eb.dst AS c
             |  FROM e2 AS ea JOIN e2 AS eb ON eb.src = ea.dst
             |  JOIN e2 AS ec ON ec.src = ea.src AND ec.dst = eb.dst),
             |s3 AS (SELECT x, y, COUNT(*) AS sup FROM (
             |    SELECT a AS x, b AS y FROM t3
             |    UNION ALL SELECT a, c FROM t3
             |    UNION ALL SELECT b, c FROM t3) GROUP BY 1, 2),
             |e3 AS MATERIALIZED (SELECT e.src, e.dst FROM e2 e
             |  JOIN s3 ON s3.x = e.src AND s3.y = e.dst AND s3.sup >= 1),
             |n AS (SELECT (SELECT COUNT(*) FROM e0) AS n0,
             |  (SELECT COUNT(*) FROM e1) AS n1,
             |  (SELECT COUNT(*) FROM e2) AS n2,
             |  (SELECT COUNT(*) FROM e3) AS n3)
             |SELECT 1 AS round, n1 AS n_edges, n0 - n1 AS n_dropped FROM n
             |UNION ALL SELECT 2, n2, n1 - n2 FROM n
             |UNION ALL SELECT 3, n3, n2 - n3 FROM n
             |ORDER BY round""".stripMargin)),

    Q("doc_logreg_pr_curve", // precision/recall/F1 across 9 decision
      // thresholds for the SAME memoized language-ID fit — the
      // operating-point table a curator reads before picking the
      // quality cutoff. One scoring pass map-side-explodes each doc
      // into its 9 (threshold, outcome) cells → ONE hash aggregation;
      // F1 uses the closed form 2tp/(2tp+fp+fn) so no null
      // propagation. The oracle re-trains through the shared 6-round
      // chain and sweeps identically.
      (s, d) => {
        val w = logregFit(s, d)._1
        val p = lit(1.0) / (lit(1.0)
          + exp(-graft.operators.Learn.margin(w, logregCols)))
        val cell = logregFeatures(s, d)
          .select(col("y"), p.as("p"),
            explode(sequence(lit(1L), lit(9L))).as("k"))
          .groupBy("k").agg(
            sum(when(col("y") === 1.0 && col("p") >= col("k") / lit(10.0),
              1L).otherwise(0L)).as("tp"),
            sum(when(col("y") === 0.0 && col("p") >= col("k") / lit(10.0),
              1L).otherwise(0L)).as("fp"),
            sum(when(col("y") === 1.0 && col("p") < col("k") / lit(10.0),
              1L).otherwise(0L)).as("fn"))
        cell.select((col("k") / lit(10.0)).as("tau"),
            col("tp"), col("fp"), col("fn"),
            when(col("tp") + col("fp") > 0,
              round(col("tp") / (col("tp") + col("fp")), 6)).as("precision"),
            when(col("tp") + col("fn") > 0,
              round(col("tp") / (col("tp") + col("fn")), 6)).as("recall"),
            when(lit(2L) * col("tp") + col("fp") + col("fn") > 0,
              round(lit(2.0) * col("tp")
                / (lit(2L) * col("tp") + col("fp") + col("fn")), 6))
              .as("f1"))
          .orderBy("tau")
      },
      Some(s"""WITH $logregFeatureSql,
           |${logregChainParts("", "")},
           |scored AS (
           |  SELECT y, 1.0 / (1.0 + exp(-(w.b + w.w1 * x1 + w.w2 * x2
           |    + w.w3 * x3))) AS p
           |  FROM fb, w6 w),
           |cell AS (SELECT k,
           |    CAST(SUM(CASE WHEN y = 1.0 AND p >= k / 10.0
           |      THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           |    CAST(SUM(CASE WHEN y = 0.0 AND p >= k / 10.0
           |      THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           |    CAST(SUM(CASE WHEN y = 1.0 AND p < k / 10.0
           |      THEN 1 ELSE 0 END) AS BIGINT) AS fn
           |  FROM scored, (SELECT unnest(range(1, 10)) AS k) AS ks
           |  GROUP BY 1)
           |SELECT k / 10.0 AS tau, tp, fp, fn,
           |  CASE WHEN tp + fp > 0 THEN ROUND(tp / (tp + fp), 6) END
           |    AS precision,
           |  CASE WHEN tp + fn > 0 THEN ROUND(tp / (tp + fn), 6) END
           |    AS recall,
           |  CASE WHEN 2 * tp + fp + fn > 0
           |    THEN ROUND(2.0 * tp / (2 * tp + fp + fn), 6) END AS f1
           |FROM cell ORDER BY tau""".stripMargin)),

    Q("emb_rp_distortion", // Johnson–Lindenstrauss random-projection
      // audit: project the 64-d embeddings to 16-d with a deterministic
      // ±1 sign matrix (portable integer hash of (i,j) — no matrix to
      // ship, every executor derives its cells), then measure pairwise-
      // distance distortion over the linear chain of consecutive-id
      // pairs. Fully relational: ONE posexplode into (vec, coord)
      // rows, one 16-way sign-weighted hash aggregation builds the
      // sketch, and distances are coordinate joins — no driver-side
      // matrix, no all-pairs. The report is the go/no-go gate before
      // swapping the full vectors for sketches in a 100 TB ANN recall
      // path.
      (s, d) => {
        val xi = t(s, d, "embeddings")
          .select(col("vec_id"), posexplode(col("embedding"))
            .as(Seq("pos", "x")))
          .select(col("vec_id"), (col("pos") + 1).as("i"),
            col("x").cast("double").as("x"))
        val sign = when(
          ((lit(1000003L) * (col("i") * 97 + col("j")) + lit(17L))
            % lit(2147483647L)) % 2 === 0, lit(1.0)).otherwise(lit(-1.0))
        val y = xi.select(col("vec_id"), col("i"), col("x"),
            explode(sequence(lit(1L), lit(16L))).as("j"))
          .groupBy("vec_id", "j").agg((sum(sign * col("x")) / lit(4.0))
            .as("y"))
        val sx = xi.join(
            xi.select((col("vec_id") - 1).as("vec_id"), col("i"),
              col("x").as("x2")), Seq("vec_id", "i"))
          .groupBy("vec_id")
          .agg(sum((col("x") - col("x2")) * (col("x") - col("x2")))
            .as("sx"))
        val sy = y.join(
            y.select((col("vec_id") - 1).as("vec_id"), col("j"),
              col("y").as("y2")), Seq("vec_id", "j"))
          .groupBy("vec_id")
          .agg(sum((col("y") - col("y2")) * (col("y") - col("y2")))
            .as("sy"))
        sx.join(sy, Seq("vec_id")).filter(col("sx") > 0)
          .select(sqrt(col("sy") / col("sx")).as("ratio"))
          .agg(count(lit(1)).as("n_pairs"),
            round(avg("ratio"), 6).as("mean_ratio"),
            round(min("ratio"), 6).as("min_ratio"),
            round(max("ratio"), 6).as("max_ratio"),
            round(avg(abs(col("ratio") - 1.0)), 6).as("mean_abs_distortion"))
      },
      Some("""WITH xi AS MATERIALIZED (
             |  SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
             |  FROM embeddings, (SELECT unnest(range(1, 65)) AS i) AS ii),
             |y AS MATERIALIZED (
             |  SELECT vec_id, j,
             |    SUM(CASE WHEN ((1000003 * (i * 97 + j) + 17) % 2147483647)
             |      % 2 = 0 THEN 1.0 ELSE -1.0 END * x) / 4.0 AS y
             |  FROM xi, (SELECT unnest(range(1, 17)) AS j) AS jj
             |  GROUP BY 1, 2),
             |sx AS (SELECT a.vec_id,
             |    SUM((a.x - b.x) * (a.x - b.x)) AS sx
             |  FROM xi a JOIN xi b
             |    ON b.vec_id = a.vec_id + 1 AND b.i = a.i
             |  GROUP BY 1),
             |sy AS (SELECT a.vec_id,
             |    SUM((a.y - b.y) * (a.y - b.y)) AS sy
             |  FROM y a JOIN y b
             |    ON b.vec_id = a.vec_id + 1 AND b.j = a.j
             |  GROUP BY 1),
             |r AS (SELECT sqrt(sy / sx) AS ratio
             |  FROM sx JOIN sy USING (vec_id) WHERE sx > 0)
             |SELECT COUNT(*) AS n_pairs,
             |  ROUND(AVG(ratio), 6) AS mean_ratio,
             |  ROUND(MIN(ratio), 6) AS min_ratio,
             |  ROUND(MAX(ratio), 6) AS max_ratio,
             |  ROUND(AVG(abs(ratio - 1.0)), 6) AS mean_abs_distortion
             |FROM r""".stripMargin)),

    Q("dq_inclusion_deps", // inclusion-dependency profiling: the
      // foreign-key discovery pass a fabric runs before trusting
      // joins — for each candidate (lhs ⊆ rhs) pair, distinct lhs
      // values, how many exist in rhs, and the containment ratio.
      // Four true FKs plus one deliberate violation. ONE scan per
      // table: each row explodes into all its (dependency, side)
      // roles, map-side combine collapses to the distinct (dep, k)
      // grain before a single shuffle, and containment falls out of
      // one (dep, k)-keyed flag agg — no per-candidate re-scan, no
      // driver-side counting loop (was 10 distinct scans / 2.4 s).
      (s, d) => {
        val d1 = "lineitem.l_orderkey -> orders.o_orderkey"
        val d2 = "orders.o_custkey -> customer.c_custkey"
        val d3 = "lineitem.l_partkey -> part.p_partkey"
        val d4 = "customer.c_nationkey -> nation.n_nationkey"
        val d5 = "orders.o_orderkey -> customer.c_custkey"
        // TINY int codes ride the wide shuffle (dep 1..5, side 1=lhs
        // 2=rhs) — the 50-char dependency strings only materialize at
        // the 5-row report grain via a codegen'd CASE (string keys
        // through the 2M-row explode measured 1.76 s isolated at sf0.1;
        // int codes 1.23 s best-of-5 — the floor is the lineitem scan +
        // explode + one combined shuffle, all linear)
        def roles(df: DataFrame, rs: (Int, Int, String)*): DataFrame =
          df.select(explode(array(rs.map { case (dep, side, c) =>
              struct(lit(dep).as("dep"), lit(side).as("side"),
                col(c).cast("long").as("k"))
            }: _*)).as("e"))
            .select(col("e.dep").as("dep"), col("e.side").as("side"),
              col("e.k").as("k"))
        roles(t(s, d, "lineitem"),
            (1, 1, "l_orderkey"), (3, 1, "l_partkey"))
          .unionByName(roles(t(s, d, "orders"), (2, 1, "o_custkey"),
            (5, 1, "o_orderkey"), (1, 2, "o_orderkey")))
          .unionByName(roles(t(s, d, "customer"),
            (4, 1, "c_nationkey"), (2, 2, "c_custkey"),
            (5, 2, "c_custkey")))
          .unionByName(roles(t(s, d, "part"), (3, 2, "p_partkey")))
          .unionByName(roles(t(s, d, "nation"), (4, 2, "n_nationkey")))
          .groupBy("dep", "k")
          .agg(max(col("side") === 1).as("has_l"),
            max(col("side") === 2).as("has_r"))
          .filter(col("has_l"))
          .groupBy(col("dep"))
          .agg(count(lit(1)).as("n_lhs"),
            sum(when(col("has_r"), 1L).otherwise(0L)).as("n_contained"))
          .select(
            when(col("dep") === 1, d1).when(col("dep") === 2, d2)
              .when(col("dep") === 3, d3).when(col("dep") === 4, d4)
              .otherwise(d5).as("dependency"),
            col("n_lhs"), col("n_contained"),
            round(col("n_contained").cast("double") / col("n_lhs"), 6)
              .as("containment"),
            when(col("n_contained") === col("n_lhs"), "holds")
              .otherwise("violated").as("verdict"))
          .orderBy("dependency")
      },
      Some("""WITH c1 AS (SELECT 'lineitem.l_orderkey -> orders.o_orderkey'
             |    AS dependency, COUNT(*) AS n_lhs,
             |    CAST(SUM(CASE WHEN r.k IS NOT NULL THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_contained
             |  FROM (SELECT DISTINCT l_orderkey AS k FROM lineitem) l
             |  LEFT JOIN (SELECT DISTINCT o_orderkey AS k FROM orders) r
             |    USING (k)),
             |c2 AS (SELECT 'orders.o_custkey -> customer.c_custkey',
             |    COUNT(*),
             |    CAST(SUM(CASE WHEN r.k IS NOT NULL THEN 1 ELSE 0 END)
             |      AS BIGINT)
             |  FROM (SELECT DISTINCT o_custkey AS k FROM orders) l
             |  LEFT JOIN (SELECT DISTINCT c_custkey AS k FROM customer) r
             |    USING (k)),
             |c3 AS (SELECT 'lineitem.l_partkey -> part.p_partkey', COUNT(*),
             |    CAST(SUM(CASE WHEN r.k IS NOT NULL THEN 1 ELSE 0 END)
             |      AS BIGINT)
             |  FROM (SELECT DISTINCT l_partkey AS k FROM lineitem) l
             |  LEFT JOIN (SELECT DISTINCT p_partkey AS k FROM part) r
             |    USING (k)),
             |c4 AS (SELECT 'customer.c_nationkey -> nation.n_nationkey',
             |    COUNT(*),
             |    CAST(SUM(CASE WHEN r.k IS NOT NULL THEN 1 ELSE 0 END)
             |      AS BIGINT)
             |  FROM (SELECT DISTINCT c_nationkey AS k FROM customer) l
             |  LEFT JOIN (SELECT DISTINCT n_nationkey AS k FROM nation) r
             |    USING (k)),
             |c5 AS (SELECT 'orders.o_orderkey -> customer.c_custkey',
             |    COUNT(*),
             |    CAST(SUM(CASE WHEN r.k IS NOT NULL THEN 1 ELSE 0 END)
             |      AS BIGINT)
             |  FROM (SELECT DISTINCT o_orderkey AS k FROM orders) l
             |  LEFT JOIN (SELECT DISTINCT c_custkey AS k FROM customer) r
             |    USING (k)),
             |u AS (SELECT * FROM c1 UNION ALL SELECT * FROM c2
             |  UNION ALL SELECT * FROM c3 UNION ALL SELECT * FROM c4
             |  UNION ALL SELECT * FROM c5)
             |SELECT dependency, n_lhs, n_contained,
             |  ROUND(CAST(n_contained AS DOUBLE) / n_lhs, 6) AS containment,
             |  CASE WHEN n_contained = n_lhs THEN 'holds'
             |       ELSE 'violated' END AS verdict
             |FROM u ORDER BY dependency""".stripMargin)),

    Q("scale_zonemap_prune", // zonemap data-skipping audit — WHY layout
      // matters at 100 TB: orders are sliced into 64 value-range
      // "files" under two layouts (clustered by order key vs by order
      // date, both pure arithmetic off a 1-row min/max broadcast — no
      // global sort), per-file min/max date zonemaps are computed, and
      // four date predicates are tested for how many files they can
      // skip. The date-clustered layout skips nearly everything; the
      // key-clustered one scans all 64 — the measured case for sorting
      // /Z-ordering before the scan-heavy workloads land.
      (s, d) => {
        val preds = Seq(
          ("q1_1996q1", "1996-01-01", "1996-04-01"),
          ("q2_1995sum", "1995-06-01", "1995-09-01"),
          ("q3_1997y", "1997-01-01", "1998-01-01"),
          ("q4_2000jan", "2000-01-01", "2000-01-15"))
        val o = t(s, d, "orders").select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
        val bounds = o.agg(min("o_orderkey").as("k0"),
          max("o_orderkey").as("k1"), min("day").as("d0"),
          max("day").as("d1"))
        val withB = o.crossJoin(broadcast(bounds)).select(col("day"),
          expr("least((o_orderkey - k0) * 64 div (k1 - k0 + 1), 63)")
            .as("kb"),
          expr("""least((datediff(to_date(day), to_date(d0)) * 64)
                 | div (datediff(to_date(d1), to_date(d0)) + 1),
                 |63)""".stripMargin).as("db"))
        def zonemap(b: String, layout: String): DataFrame = withB
          .groupBy(col(b).as("bucket"))
          .agg(min("day").as("lo"), max("day").as("hi"),
            count(lit(1)).as("n_rows"))
          .select(lit(layout).as("layout"), col("bucket"), col("lo"),
            col("hi"), col("n_rows"))
        val zm = zonemap("kb", "key_clustered")
          .unionByName(zonemap("db", "date_clustered"))
        val pl = typedLit(preds.map(p => (p._1, p._2, p._3)))
        val scanned = zm.select(col("layout"), col("lo"), col("hi"),
            col("n_rows"), explode(pl).as("p"))
          .select(col("layout"), col("p._1").as("predicate"),
            col("lo"), col("hi"), col("n_rows"),
            col("p._2").as("plo"), col("p._3").as("phi"))
          .groupBy("layout", "predicate")
          .agg(count(lit(1)).as("n_buckets"),
            sum(when(col("lo") < col("phi") && col("hi") >= col("plo"), 1L)
              .otherwise(0L)).as("n_scanned"),
            sum(when(col("lo") < col("phi") && col("hi") >= col("plo"),
              col("n_rows")).otherwise(0L)).as("rows_scanned"))
        val sel = o.select(col("day"), explode(pl).as("p"))
          .filter(col("day") >= col("p._2") && col("day") < col("p._3"))
          .groupBy(col("p._1").as("predicate"))
          .agg(count(lit(1)).as("rows_selected"))
        scanned.join(sel, Seq("predicate"), "left_outer")
          .select(col("layout"), col("predicate"), col("n_buckets"),
            col("n_scanned"),
            (col("n_buckets") - col("n_scanned")).as("n_skipped"),
            col("rows_scanned"),
            coalesce(col("rows_selected"), lit(0L)).as("rows_selected"))
          .orderBy("layout", "predicate")
      },
      Some("""WITH o AS MATERIALIZED (SELECT o_orderkey,
             |    strftime(o_orderdate, '%Y-%m-%d') AS day
             |  FROM orders),
             |bounds AS (SELECT MIN(o_orderkey) AS k0, MAX(o_orderkey) AS k1,
             |    MIN(day) AS d0, MAX(day) AS d1 FROM o),
             |wb AS MATERIALIZED (SELECT day,
             |    LEAST((o_orderkey - k0) * 64 // (k1 - k0 + 1), 63) AS kb,
             |    LEAST((date_diff('day', strptime(d0, '%Y-%m-%d'),
             |        strptime(day, '%Y-%m-%d')) * 64)
             |      // (date_diff('day', strptime(d0, '%Y-%m-%d'),
             |        strptime(d1, '%Y-%m-%d')) + 1), 63) AS db
             |  FROM o, bounds),
             |zm AS (SELECT 'key_clustered' AS layout, kb AS bucket,
             |    MIN(day) AS lo, MAX(day) AS hi, COUNT(*) AS n_rows
             |  FROM wb GROUP BY 2
             |  UNION ALL
             |  SELECT 'date_clustered', db, MIN(day), MAX(day), COUNT(*)
             |  FROM wb GROUP BY 2),
             |preds AS (SELECT * FROM (VALUES
             |    ('q1_1996q1', '1996-01-01', '1996-04-01'),
             |    ('q2_1995sum', '1995-06-01', '1995-09-01'),
             |    ('q3_1997y', '1997-01-01', '1998-01-01'),
             |    ('q4_2000jan', '2000-01-01', '2000-01-15'))
             |  AS t(predicate, plo, phi)),
             |scanned AS (SELECT layout, predicate,
             |    COUNT(*) AS n_buckets,
             |    CAST(SUM(CASE WHEN lo < phi AND hi >= plo THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_scanned,
             |    CAST(SUM(CASE WHEN lo < phi AND hi >= plo THEN n_rows
             |      ELSE 0 END) AS BIGINT) AS rows_scanned
             |  FROM zm, preds GROUP BY 1, 2),
             |sel AS (SELECT predicate, COUNT(*) AS rows_selected
             |  FROM o, preds WHERE day >= plo AND day < phi GROUP BY 1)
             |SELECT layout, s.predicate, n_buckets, n_scanned,
             |  n_buckets - n_scanned AS n_skipped, rows_scanned,
             |  COALESCE(rows_selected, 0) AS rows_selected
             |FROM scanned s LEFT JOIN sel USING (predicate)
             |ORDER BY layout, s.predicate""".stripMargin)),

    Q("dp_noisy_mean", // ε-DP mean account balance per market segment:
      // clip-then-Laplace ([[graft.operators.DataQuality.dpNoisyMean]],
      // ε=1, clip [0, $5000]) — the numeric-release counterpart of the
      // noisy histogram. Clipping bounds one customer's influence
      // BEFORE aggregation (the part analysts forget), balances ride
      // as exact integer cents so the true sums are slack-free, and
      // the 48-bit md5 uniform makes the release reproducible — both
      // engines re-derive the identical noise.
      // audit = true: this IS the calibration audit (oracle-checked
      // against the exact clipped mean); the release-safe default emits
      // only (key, noisy_mean)
      (s, d) => graft.operators.DataQuality.dpNoisyMean(
          t(s, d, "customer").withColumn("cents",
            round(col("c_acctbal") * 100, 0).cast("long")),
          "c_mktsegment", col("cents"), 0L, 500000L, eps = 1.0,
          salt = "rel2026m", audit = true)
        .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment, n,
             |  ROUND(sc / 100.0 / n, 6) AS clipped_mean,
             |  ROUND((sc / 100.0 + -5000.0 * SIGN(u)
             |    * LN(1 - 2 * LEAST(ABS(u), 0.5 - 1e-12)))
             |    / n, 6) AS noisy_mean
             |FROM (
             |  SELECT c_mktsegment, COUNT(*) AS n,
             |    CAST(SUM(GREATEST(LEAST(
             |      CAST(ROUND(c_acctbal * 100, 0) AS BIGINT), 500000), 0))
             |      AS DOUBLE) AS sc,
             |    ((('0x' || SUBSTR(md5('rel2026m:' || c_mktsegment), 1, 12))
             |      ::BIGINT) / 281474976710656.0) - 0.5 AS u
             |  FROM customer GROUP BY 1)
             |ORDER BY c_mktsegment""".stripMargin)),

    Q("ivm_agg_delta", // incremental maintenance of an AGGREGATE view:
      // priority-level (count, sum, avg, max) over orders is kept as
      // mergeable partial state — a month's insert batch is aggregated
      // ALONE and folded in with pure state algebra (counts/sums add,
      // max takes greatest, avg re-derives from merged sums), exactly
      // the merge map-side combine performs; the base fact is never
      // rescanned. Both engines verify the merged state against a full
      // recompute in-query — exact integer cents make the check
      // bit-exact.
      (s, d) => {
        val o = t(s, d, "orders").select(col("o_orderpriority")
            .as("priority"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
        def st(f: DataFrame): DataFrame = f.groupBy("priority").agg(
          count(lit(1)).as("n"), sum("cents").as("sc"),
          max("cents").as("mx"))
        val base = st(o.filter(col("day") < "1999-01-01"))
        val delta = st(o.filter(col("day") >= "1999-01-01"
          && col("day") < "1999-02-01"))
        val full = st(o.filter(col("day") < "1999-02-01"))
        base.join(delta.select(col("priority"), col("n").as("dn"),
            col("sc").as("dsc"), col("mx").as("dmx")), Seq("priority"),
            "left_outer")
          .select(col("priority"), col("n").as("n_base"),
            coalesce(col("dn"), lit(0L)).as("n_delta"),
            (col("n") + coalesce(col("dn"), lit(0L))).as("n_new"),
            (col("sc") + coalesce(col("dsc"), lit(0L))).as("sc_new"),
            greatest(col("mx"), coalesce(col("dmx"), lit(0L))).as("mx_new"))
          .join(full.select(col("priority"), col("n").as("fn"),
            col("sc").as("fsc"), col("mx").as("fmx")), Seq("priority"))
          .select(col("priority"), col("n_base"), col("n_delta"),
            col("n_new"),
            round(col("sc_new").cast("double") / 100.0 / col("n_new"), 6)
              .as("avg_new"),
            (col("mx_new").cast("double") / 100.0).as("max_new"),
            when(col("n_new") === col("fn") && col("sc_new") === col("fsc")
              && col("mx_new") === col("fmx"), "ok").otherwise("mismatch")
              .as("verdict"))
          .orderBy("priority")
      },
      Some("""WITH o AS MATERIALIZED (SELECT o_orderpriority AS priority,
             |    strftime(o_orderdate, '%Y-%m-%d') AS day,
             |    CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
             |  FROM orders),
             |base AS (SELECT priority, COUNT(*) AS n,
             |    CAST(SUM(cents) AS BIGINT) AS sc, MAX(cents) AS mx
             |  FROM o WHERE day < '1999-01-01' GROUP BY 1),
             |delta AS (SELECT priority, COUNT(*) AS dn,
             |    CAST(SUM(cents) AS BIGINT) AS dsc, MAX(cents) AS dmx
             |  FROM o WHERE day >= '1999-01-01' AND day < '1999-02-01'
             |  GROUP BY 1),
             |fullv AS (SELECT priority, COUNT(*) AS fn,
             |    CAST(SUM(cents) AS BIGINT) AS fsc, MAX(cents) AS fmx
             |  FROM o WHERE day < '1999-02-01' GROUP BY 1),
             |m AS (SELECT b.priority, b.n AS n_base,
             |    COALESCE(d.dn, 0) AS n_delta,
             |    b.n + COALESCE(d.dn, 0) AS n_new,
             |    b.sc + COALESCE(d.dsc, 0) AS sc_new,
             |    GREATEST(b.mx, COALESCE(d.dmx, 0)) AS mx_new
             |  FROM base b LEFT JOIN delta d USING (priority))
             |SELECT m.priority, n_base, n_delta, n_new,
             |  ROUND(CAST(sc_new AS DOUBLE) / 100.0 / n_new, 6) AS avg_new,
             |  CAST(mx_new AS DOUBLE) / 100.0 AS max_new,
             |  CASE WHEN n_new = f.fn AND sc_new = f.fsc AND mx_new = f.fmx
             |    THEN 'ok' ELSE 'mismatch' END AS verdict
             |FROM m JOIN fullv f USING (priority)
             |ORDER BY m.priority""".stripMargin)),

    Q("events_stl_decompose", // additive trend/season/residual
      // decomposition of the daily series per event type — centered
      // 7-day moving-average trend (full windows only), day-of-week
      // seasonal means of the detrended series, and the variance share
      // each component explains: the one-table answer to "is this
      // metric trend, weekly rhythm, or noise?". All windows are KEYED
      // by type (bounded day grain, no global sort); dow comes from
      // portable day-index arithmetic, not engine weekday functions.
      (s, d) => {
        val daily = t(s, d, "events")
          .groupBy(col("event_type"),
            date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(count(lit(1)).as("y"))
        val w7 = Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(-3, 3)
        val dt = daily
          .withColumn("trend", avg("y").over(w7))
          .withColumn("wn", count(lit(1)).over(w7))
          .filter(col("wn") === 7)
          .withColumn("dow",
            pmod(datediff(to_date(col("day")), to_date(lit("1995-01-02"))),
              lit(7)))
          .withColumn("detr", col("y") - col("trend"))
        val seas = dt.groupBy("event_type", "dow")
          .agg(avg("detr").as("seasonal"))
        def vshare(x: Column): Column =
          (avg(x * x) - avg(x) * avg(x))
        dt.join(seas, Seq("event_type", "dow"))
          .withColumn("resid", col("detr") - col("seasonal"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_days"),
            round(vshare(col("y")), 6).as("var_y"),
            round(vshare(col("trend")) / vshare(col("y")), 6)
              .as("trend_share"),
            round(vshare(col("seasonal")) / vshare(col("y")), 6)
              .as("seasonal_share"),
            round(vshare(col("resid")) / vshare(col("y")), 6)
              .as("resid_share"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS MATERIALIZED (
             |  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
             |    COUNT(*) AS y
             |  FROM events GROUP BY 1, 2),
             |dt AS MATERIALIZED (SELECT event_type, day, y, trend,
             |    (date_diff('day', DATE '1995-01-02',
             |      strptime(day, '%Y-%m-%d')) % 7 + 7) % 7 AS dow,
             |    y - trend AS detr
             |  FROM (SELECT event_type, day, y,
             |      AVG(y) OVER w AS trend, COUNT(*) OVER w AS wn
             |    FROM daily
             |    WINDOW w AS (PARTITION BY event_type ORDER BY day
             |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING))
             |  WHERE wn = 7),
             |seas AS (SELECT event_type, dow, AVG(detr) AS seasonal
             |  FROM dt GROUP BY 1, 2)
             |SELECT dt.event_type, COUNT(*) AS n_days,
             |  ROUND(AVG(y * y) - AVG(y) * AVG(y), 6) AS var_y,
             |  ROUND((AVG(trend * trend) - AVG(trend) * AVG(trend))
             |    / (AVG(y * y) - AVG(y) * AVG(y)), 6) AS trend_share,
             |  ROUND((AVG(seasonal * seasonal) - AVG(seasonal) * AVG(seasonal))
             |    / (AVG(y * y) - AVG(y) * AVG(y)), 6) AS seasonal_share,
             |  ROUND((AVG(resid * resid) - AVG(resid) * AVG(resid))
             |    / (AVG(y * y) - AVG(y) * AVG(y)), 6) AS resid_share
             |FROM (SELECT dt.*, seas.seasonal, dt.detr - seas.seasonal AS resid
             |  FROM dt JOIN seas USING (event_type, dow)) AS dt
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("doc_mattr_lexdiv", // moving-average type-token ratio (MATTR,
      // window 25) per document, rolled up by source — the
      // length-robust lexical-diversity score (plain TTR collapses as
      // docs grow; the moving window doesn't). Per-doc work is a
      // bounded fold over the token array (window count × window
      // width, the documented bounded-doc-length contract); every
      // window's distinct count is an exact integer, so the per-doc
      // MATTR is a deterministic double and only the per-source mean
      // needs rounding.
      (s, d) => {
        val m = t(s, d, "documents")
          .select(col("source"),
            TextAnalysis.tokens(lower(col("text"))).as("ts"))
          .filter(size(col("ts")) >= 25)
          .select(col("source"),
            (aggregate(
              transform(sequence(lit(1), size(col("ts")) - 24),
                i => size(array_distinct(slice(col("ts"), i, lit(25))))
                  .cast("long")),
              lit(0L), (acc, x) => acc + x).cast("double")
              / (size(col("ts")) - 24) / lit(25.0)).as("mattr"))
        m.groupBy("source").agg(count(lit(1)).as("n_docs"),
            round(avg("mattr"), 6).as("mean_mattr"),
            round(min("mattr"), 6).as("min_mattr"),
            round(max("mattr"), 6).as("max_mattr"))
          .orderBy("source")
      },
      Some("""WITH m AS (SELECT source,
             |    CAST(list_sum(list_transform(range(1, len(ts) - 23),
             |      i -> len(list_distinct(ts[i:i+24])))) AS DOUBLE)
             |      / (len(ts) - 24) / 25.0 AS mattr
             |  FROM (SELECT source,
             |      string_split_regex(lower(trim(text)), '\s+') AS ts
             |    FROM documents)
             |  WHERE len(ts) >= 25)
             |SELECT source, COUNT(*) AS n_docs,
             |  ROUND(AVG(mattr), 6) AS mean_mattr,
             |  ROUND(MIN(mattr), 6) AS min_mattr,
             |  ROUND(MAX(mattr), 6) AS max_mattr
             |FROM m GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("events_peak_over_threshold", // extreme-value tail audit (POT):
      // per type, days whose count exceeds mean + 2σ are "peaks"; the
      // excesses get method-of-moments GPD parameters (ξ shape,
      // β scale) — ξ > 0 flags a heavy tail that invalidates normal
      // capacity planning. The threshold derives from EXACT integer
      // moment sums (bit-identical across engines, no protocol); only
      // the few excess values are doubles, and their tiny keyed
      // aggregations round at 6dp.
      (s, d) => {
        val daily = t(s, d, "events")
          .groupBy(col("event_type"),
            date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(count(lit(1)).as("y"))
        val st = daily.groupBy("event_type").agg(
          count(lit(1)).as("n_days"), sum("y").as("sy"),
          sum(col("y") * col("y")).as("syy"))
        val u = col("sy") / col("n_days") +
          lit(2.0) * sqrt(col("syy") / col("n_days") -
            (col("sy") / col("n_days")) * (col("sy") / col("n_days")))
        val withU = st.select(col("event_type"), col("n_days"),
          u.as("u"))
        val exc = daily.join(broadcast(withU), Seq("event_type"))
          .filter(col("y") > col("u"))
          .groupBy("event_type").agg(count(lit(1)).as("k"),
            sum(col("y") - col("u")).as("se"),
            sum((col("y") - col("u")) * (col("y") - col("u"))).as("see"))
        val me = col("se") / col("k")
        val ve = col("see") / col("k") - me * me
        withU.join(exc, Seq("event_type"), "left_outer")
          .select(col("event_type"), col("n_days"),
            round(col("u"), 4).as("threshold"),
            coalesce(col("k"), lit(0L)).as("n_exceed"),
            round(me, 6).as("mean_excess"),
            when(col("k") >= 2 && ve > 0,
              round(lit(0.5) * (lit(1.0) - me * me / ve), 6)).as("xi"),
            when(col("k") >= 2 && ve > 0,
              round(lit(0.5) * me * (me * me / ve + lit(1.0)), 6))
              .as("beta"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS MATERIALIZED (
             |  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
             |    COUNT(*) AS y
             |  FROM events GROUP BY 1, 2),
             |st AS (SELECT event_type, COUNT(*) AS n_days,
             |    CAST(SUM(y) AS BIGINT) AS sy,
             |    CAST(SUM(y * y) AS BIGINT) AS syy
             |  FROM daily GROUP BY 1),
             |wu AS (SELECT event_type, n_days,
             |    sy / n_days + 2.0 * sqrt(syy / n_days
             |      - (sy / n_days) * (sy / n_days)) AS u
             |  FROM st),
             |exc AS (SELECT d.event_type, COUNT(*) AS k,
             |    SUM(d.y - wu.u) AS se,
             |    SUM((d.y - wu.u) * (d.y - wu.u)) AS see
             |  FROM daily d JOIN wu USING (event_type)
             |  WHERE d.y > wu.u GROUP BY 1)
             |SELECT wu.event_type, n_days, ROUND(u, 4) AS threshold,
             |  COALESCE(k, 0) AS n_exceed,
             |  ROUND(se / k, 6) AS mean_excess,
             |  CASE WHEN k >= 2 AND see / k - (se / k) * (se / k) > 0
             |    THEN ROUND(0.5 * (1.0 - (se / k) * (se / k)
             |      / (see / k - (se / k) * (se / k))), 6) END AS xi,
             |  CASE WHEN k >= 2 AND see / k - (se / k) * (se / k) > 0
             |    THEN ROUND(0.5 * (se / k) * ((se / k) * (se / k)
             |      / (see / k - (se / k) * (se / k)) + 1.0), 6) END AS beta
             |FROM wu LEFT JOIN exc USING (event_type)
             |ORDER BY wu.event_type""".stripMargin)),

    Q("events_daily_cvar", // value-at-risk / expected shortfall of the
      // daily value totals per type: VaR90 = exact interpolated p90
      // over the bounded day grain, CVaR90 = mean of the totals at or
      // above it — the tail-budget number an SLO is written against.
      // Daily totals round at the grain boundary (the cross-engine
      // protocol for float sums) BEFORE ranking, so both engines
      // select the identical tail set.
      (s, d) => {
        val daily = t(s, d, "events")
          .groupBy(col("event_type"),
            date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(round(sum("value"), 6).as("t"))
        val v = daily.groupBy("event_type")
          .agg(count(lit(1)).as("n_days"),
            expr("percentile(t, 0.9)").as("var90"))
        daily.join(broadcast(v), Seq("event_type"))
          .filter(col("t") >= col("var90"))
          .groupBy("event_type").agg(count(lit(1)).as("n_tail"),
            round(avg("t"), 6).as("cvar90"))
          .join(v, Seq("event_type"))
          .select(col("event_type"), col("n_days"),
            round(col("var90"), 6).as("var90"), col("n_tail"),
            col("cvar90"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS MATERIALIZED (
             |  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
             |    ROUND(SUM(value), 6) AS t
             |  FROM events GROUP BY 1, 2),
             |v AS (SELECT event_type, COUNT(*) AS n_days,
             |    quantile_cont(t, 0.9) AS var90
             |  FROM daily GROUP BY 1),
             |c AS (SELECT d.event_type, COUNT(*) AS n_tail,
             |    ROUND(AVG(d.t), 6) AS cvar90
             |  FROM daily d JOIN v USING (event_type)
             |  WHERE d.t >= v.var90 GROUP BY 1)
             |SELECT v.event_type, n_days, ROUND(var90, 6) AS var90,
             |  n_tail, cvar90
             |FROM v JOIN c USING (event_type)
             |ORDER BY v.event_type""".stripMargin)),

    Q("lineitem_theil_index", // Theil-T inequality of supplier revenue
      // with its EXACT within/between-nation decomposition — the
      // property Gini lacks: T = Σ_g w_g·T_g + T_between, w_g = the
      // group's revenue share. One supplier rollup (exact cents), one
      // 25-row group rollup broadcast back, ONE pass computing both the
      // group-relative and global-relative entropy terms; the output
      // shows total-direct and total-decomposed agreeing at 6dp — the
      // identity is the test.
      (s, d) => {
        val sup = t(s, d, "lineitem")
          .groupBy(col("l_suppkey"))
          .agg(sum(round(col("l_extendedprice") * 100, 0).cast("long"))
            .as("c"))
          .join(t(s, d, "supplier").select(
            col("s_suppkey").as("l_suppkey"), col("s_nationkey")),
            Seq("l_suppkey"))
          .join(broadcast(t(s, d, "nation").select(
            col("n_nationkey").as("s_nationkey"), col("n_name"))),
            Seq("s_nationkey"))
          .select(col("n_name"), col("c"))
        val glob = sup.agg(count(lit(1)).as("n"), sum("c").as("sc"))
        val grp = sup.groupBy("n_name")
          .agg(count(lit(1)).as("ng"), sum("c").as("scg"))
        val rg = col("c").cast("double") * col("ng") / col("scg")
        val rt = col("c").cast("double") * col("n") / col("sc")
        val full = sup.join(broadcast(grp), Seq("n_name"))
          .crossJoin(broadcast(glob))
          .groupBy("n_name")
          .agg(first("ng").as("ng"), first("scg").as("scg"),
            sum(rg * log(rg)).as("stg"), sum(rt * log(rt)).as("stt"))
          .crossJoin(broadcast(glob))
        val between = full.agg(count(lit(1)).as("k"),
            sum((col("scg").cast("double") / col("sc"))
              * log(col("scg").cast("double") * col("n")
                / (col("ng").cast("double") * col("sc")))).as("tb"),
            sum((col("scg").cast("double") / col("sc"))
              * (col("stg") / col("ng"))).as("tw"),
            sum("stt").as("stt_all"), first("n").as("n"))
        full.select(col("n_name").as("scope"), col("ng").as("n_units"),
            round(col("scg").cast("double") / col("sc"), 6).as("rev_share"),
            round(col("stg") / col("ng"), 6).as("theil"))
          .unionByName(between.select(lit("zz_between").as("scope"),
            col("k").as("n_units"), lit(null).cast("double").as("rev_share"),
            round(col("tb"), 6).as("theil")))
          .unionByName(between.select(lit("zz_total_direct").as("scope"),
            col("n").as("n_units"), lit(null).cast("double").as("rev_share"),
            round(col("stt_all") / col("n"), 6).as("theil")))
          .unionByName(between.select(lit("zz_total_decomposed").as("scope"),
            col("n").as("n_units"), lit(null).cast("double").as("rev_share"),
            round(col("tw") + col("tb"), 6).as("theil")))
          .orderBy("scope")
      },
      Some("""WITH sup AS MATERIALIZED (
             |  SELECT l_suppkey,
             |    CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
             |      AS BIGINT) AS c
             |  FROM lineitem GROUP BY 1),
             |sn AS MATERIALIZED (SELECT n.n_name, sup.c
             |  FROM sup JOIN supplier s ON s.s_suppkey = sup.l_suppkey
             |  JOIN nation n ON n.n_nationkey = s.s_nationkey),
             |gtot AS (SELECT COUNT(*) AS n, CAST(SUM(c) AS BIGINT) AS sc
             |  FROM sn),
             |grp AS (SELECT n_name, COUNT(*) AS ng,
             |    CAST(SUM(c) AS BIGINT) AS scg FROM sn GROUP BY 1),
             |fullg AS (SELECT sn.n_name,
             |    FIRST(g.ng) AS ng, FIRST(g.scg) AS scg,
             |    SUM((CAST(sn.c AS DOUBLE) * g.ng / g.scg)
             |      * ln(CAST(sn.c AS DOUBLE) * g.ng / g.scg)) AS stg,
             |    SUM((CAST(sn.c AS DOUBLE) * gl.n / gl.sc)
             |      * ln(CAST(sn.c AS DOUBLE) * gl.n / gl.sc)) AS stt
             |  FROM sn JOIN grp g USING (n_name) CROSS JOIN gtot gl
             |  GROUP BY 1),
             |btw AS (SELECT COUNT(*) AS k,
             |    SUM((CAST(scg AS DOUBLE) / sc)
             |      * ln(CAST(scg AS DOUBLE) * n
             |        / (CAST(ng AS DOUBLE) * sc))) AS tb,
             |    SUM((CAST(scg AS DOUBLE) / sc) * (stg / ng)) AS tw,
             |    SUM(stt) AS stt_all, FIRST(n) AS n
             |  FROM fullg, gtot)
             |SELECT n_name AS scope, ng AS n_units,
             |  ROUND(CAST(scg AS DOUBLE) / sc, 6) AS rev_share,
             |  ROUND(stg / ng, 6) AS theil
             |FROM fullg, gtot
             |UNION ALL SELECT 'zz_between', k, NULL, ROUND(tb, 6) FROM btw
             |UNION ALL SELECT 'zz_total_direct', n, NULL,
             |  ROUND(stt_all / n, 6) FROM btw
             |UNION ALL SELECT 'zz_total_decomposed', n, NULL,
             |  ROUND(tw + tb, 6) FROM btw
             |ORDER BY scope""".stripMargin)),

    Q("events_crosscorr_lagged", // lead/lag cross-correlation between
      // the 'view' and 'purchase' daily series at lags −7…+7 — the
      // table that says which signal LEADS (peak r at positive lag =
      // views lead purchases). Day counts collapse each series to its
      // bounded grain; each lag is one integer-key join; Pearson per
      // lag comes from EXACT integer moment sums, so both engines
      // compute the identical double — no rounding protocol, 6dp
      // display only.
      (s, d) => {
        val ev = t(s, d, "events")
        def daily(tp: String, cn: String): DataFrame = ev
          .filter(col("event_type") === tp)
          .groupBy(datediff(col("ts").cast("date"),
            lit("1995-01-01").cast("date")).as("di"))
          .agg(count(lit(1)).as(cn))
        val xd = daily("view", "x")
        val yd = daily("purchase", "y")
        val m = yd
          .select(col("di"), col("y"),
            explode(sequence(lit(-7L), lit(7L))).as("lag"))
          .select(col("lag"), (col("di") - col("lag")).as("di"), col("y"))
          .join(xd, Seq("di"))
          .groupBy("lag")
          .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"),
            sum(col("x") * col("y")).as("sxy"))
        val vx = col("n") * col("sxx") - col("sx") * col("sx")
        val vy = col("n") * col("syy") - col("sy") * col("sy")
        m.select(col("lag"), col("n").as("n_days"),
            when(vx > 0 && vy > 0,
              round((col("n") * col("sxy") - col("sx") * col("sy"))
                .cast("double")
                / sqrt(vx.cast("double") * vy.cast("double")), 6)).as("r"))
          .orderBy("lag")
      },
      Some("""WITH xd AS (SELECT date_diff('day', DATE '1995-01-01',
             |      CAST(ts AS DATE)) AS di, COUNT(*) AS x
             |  FROM events WHERE event_type = 'view' GROUP BY 1),
             |yd AS (SELECT date_diff('day', DATE '1995-01-01',
             |      CAST(ts AS DATE)) AS di, COUNT(*) AS y
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
             |m AS (SELECT l.lag, COUNT(*) AS n,
             |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             |    CAST(SUM(x * x) AS BIGINT) AS sxx,
             |    CAST(SUM(y * y) AS BIGINT) AS syy,
             |    CAST(SUM(x * y) AS BIGINT) AS sxy
             |  FROM yd, (SELECT unnest(range(-7, 8)) AS lag) AS l
             |  JOIN xd ON xd.di = yd.di - l.lag
             |  GROUP BY 1)
             |SELECT lag, n AS n_days,
             |  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
             |    THEN ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             |      / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
             |        * CAST(n * syy - sy * sy AS DOUBLE)), 6) END AS r
             |FROM m ORDER BY lag""".stripMargin)),

    Q("lineitem_lorenz_curve", // Lorenz curve of line revenue: per
      // exact NTILE decile of the price order, the decile's revenue
      // and the cumulative share — the curve behind the Gini number.
      // Deciles come from the SHARED distributed range sort
      // ([[rankedExtPrice]] + RankedValues.bucketSums) — never a
      // single-reducer NTILE window — and the sums run in exact
      // integer cents, so the distributed reduce is order-independent
      // and only 10 scalar rows reach the driver.
      (s, d) => {
        import s.implicits._
        val rows = rankedExtPrice(s, d).bucketSums(10, 100.0)
        val tot = rows.map(_._3).sum
        val cum = rows.scanLeft(0.0)((a, r) => a + r._3).tail
        rows.zip(cum).map { case ((b, c, sc), cs) =>
          (b.toLong, c, sc / 100.0,
            BigDecimal(cs / tot).setScale(6,
              BigDecimal.RoundingMode.HALF_UP).toDouble)
        }.toDF("decile", "n", "revenue", "cum_share").orderBy("decile")
      },
      Some("""WITH r AS (SELECT
             |    CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS c,
             |    NTILE(10) OVER (ORDER BY l_extendedprice, l_orderkey,
             |      l_linenumber) AS d
             |  FROM lineitem),
             |g AS (SELECT d, COUNT(*) AS n, CAST(SUM(c) AS BIGINT) AS sc
             |  FROM r GROUP BY 1),
             |t AS (SELECT CAST(SUM(sc) AS BIGINT) AS tot FROM g)
             |SELECT d AS decile, n, CAST(sc AS DOUBLE) / 100.0 AS revenue,
             |  ROUND(CAST(SUM(sc) OVER (ORDER BY d) AS DOUBLE) / tot, 6)
             |    AS cum_share
             |FROM g, t ORDER BY decile""".stripMargin)),

    Q("events_session_concurrency", // peak concurrent sessions per day —
      // the capacity number a serving tier is sized against — via the
      // TWO-LEVEL sweep line that scales: session endpoints (+1/−1)
      // partition by day, each day runs its own keyed prefix sum, and
      // midnight-spanning sessions ride a day-level carry (cumulative
      // net over the bounded day grain) — never one global ordered
      // window over all endpoints. Sessions are the proven 30-min-gap
      // construction; everything is exact integers.
      (s, d) => {
        val sess = graft.streaming.EventStream
          .sessionize(s, t(s, d, "events")).toDF()
          .select(col("user_id"), col("start_ms"), col("end_ms"))
        val ep = sess.select(col("user_id"), explode(array(
            struct(col("start_ms").as("ms"), lit(1L).as("delta")),
            struct(col("end_ms").as("ms"), lit(-1L).as("delta")))).as("e"))
          .select(col("user_id"), col("e.ms").as("ms"),
            col("e.delta").as("delta"))
          .withColumn("day_idx", expr("ms div 86400000"))
        val wIntra = Window.partitionBy("day_idx")
          .orderBy(col("ms"), col("delta").desc, col("user_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val da = ep.withColumn("run", sum("delta").over(wIntra))
          .groupBy("day_idx")
          .agg(max("run").as("max_intra"), sum("delta").as("net"),
            sum(when(col("delta") === 1, 1L).otherwise(0L)).as("n_started"))
        val wc = Window.orderBy("day_idx")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        da.withColumn("carry", sum("net").over(wc) - col("net"))
          .select(col("day_idx").as("day_epoch"), col("n_started"),
            (col("carry") + col("max_intra")).as("max_concurrency"))
          .orderBy("day_epoch")
      },
      Some("""WITH g AS (
             |  SELECT user_id, event_id, ts,
             |    CASE WHEN lag(ts) OVER w IS NULL
             |         OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
             |         THEN 1 ELSE 0 END AS brk
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |sess AS (SELECT user_id, epoch_ms(MIN(ts)) AS start_ms,
             |    epoch_ms(MAX(ts)) AS end_ms
             |  FROM (SELECT user_id, ts,
             |      SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |    FROM g)
             |  GROUP BY user_id, sid),
             |ep AS (SELECT user_id, start_ms AS ms, 1 AS delta FROM sess
             |  UNION ALL SELECT user_id, end_ms, -1 FROM sess),
             |intra AS (SELECT ms // 86400000 AS day_idx, delta,
             |    SUM(delta) OVER (PARTITION BY ms // 86400000
             |      ORDER BY ms, delta DESC, user_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
             |  FROM ep),
             |da AS (SELECT day_idx, MAX(run) AS max_intra,
             |    CAST(SUM(delta) AS BIGINT) AS net,
             |    CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_started
             |  FROM intra GROUP BY 1)
             |SELECT day_idx AS day_epoch, n_started,
             |  CAST(SUM(net) OVER (ORDER BY day_idx) - net + max_intra
             |    AS BIGINT) AS max_concurrency
             |FROM da ORDER BY day_epoch""".stripMargin)),

    Q("events_bot_detection", // per-user behavioral bot screen — the
      // hygiene pass a training-data pipeline runs before user-level
      // signals feed anything: inter-arrival regularity (CV of integer
      // second gaps — bots are too regular), event rate (mean gap),
      // and event-type entropy (bots repeat). Gap and count moments
      // are EXACT integer sums, so every metric is a deterministic
      // double; entropy uses the closed form ln n − (Σ c ln c)/n.
      // One keyed lag window + two hash aggs; flags are illustrative
      // thresholds, the metric table is the product.
      (s, d) => {
        val ev = t(s, d, "events").select(col("user_id"),
          col("event_type"), col("event_id"), unix_millis(col("ts")).as("ms"))
        val gaps = ev.withColumn("gap_s", expr(
            """(ms - lag(ms, 1) over (partition by user_id
              | order by ms, event_id)) div 1000""".stripMargin))
          .filter(col("gap_s").isNotNull)
          .groupBy("user_id").agg(count(lit(1)).as("k"),
            sum("gap_s").as("sg"),
            sum(col("gap_s") * col("gap_s")).as("sgg"))
        val ent = ev.groupBy("user_id", "event_type")
          .agg(count(lit(1)).as("c"))
          .groupBy("user_id").agg(count(lit(1)).as("n_types"),
            sum("c").as("n"), sum(col("c") * log(col("c"))).as("slc"))
        val mean = col("sg") / col("k")
        val cv = sqrt(col("sgg") / col("k") - mean * mean) / mean
        val entropy = log(col("n")) - col("slc") / col("n")
        gaps.join(ent, Seq("user_id"))
          .select(col("user_id"), col("n").as("n_events"), col("n_types"),
            round(mean, 2).as("mean_gap_s"), round(cv, 6).as("cv_gap"),
            round(entropy, 6).as("type_entropy"),
            (when(cv < 0.9, 1L).otherwise(0L)
              + when(mean < 35000.0, 1L).otherwise(0L)
              + when(entropy < 1.55, 1L).otherwise(0L)).as("bot_flags"))
          .orderBy("user_id")
      },
      Some("""WITH e AS (SELECT user_id, event_type, event_id,
             |    epoch_ms(ts) AS ms FROM events),
             |gaps AS (SELECT user_id, COUNT(*) AS k,
             |    CAST(SUM(gap_s) AS BIGINT) AS sg,
             |    CAST(SUM(gap_s * gap_s) AS BIGINT) AS sgg
             |  FROM (SELECT user_id,
             |      (ms - lag(ms) OVER (PARTITION BY user_id
             |        ORDER BY ms, event_id)) // 1000 AS gap_s
             |    FROM e)
             |  WHERE gap_s IS NOT NULL GROUP BY 1),
             |ent AS (SELECT user_id, COUNT(*) AS n_types,
             |    CAST(SUM(c) AS BIGINT) AS n, SUM(c * ln(c)) AS slc
             |  FROM (SELECT user_id, event_type, COUNT(*) AS c
             |    FROM e GROUP BY 1, 2)
             |  GROUP BY 1),
             |m AS (SELECT user_id, n, n_types,
             |    sg / k AS mean, sqrt(sgg / k - (sg / k) * (sg / k))
             |      / (sg / k) AS cv,
             |    ln(n) - slc / n AS entropy
             |  FROM gaps JOIN ent USING (user_id))
             |SELECT user_id, n AS n_events, n_types,
             |  ROUND(mean, 2) AS mean_gap_s, ROUND(cv, 6) AS cv_gap,
             |  ROUND(entropy, 6) AS type_entropy,
             |  CAST((CASE WHEN cv < 0.9 THEN 1 ELSE 0 END)
             |    + (CASE WHEN mean < 35000.0 THEN 1 ELSE 0 END)
             |    + (CASE WHEN entropy < 1.55 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS bot_flags
             |FROM m ORDER BY user_id""".stripMargin)),

    Q("mm_audio_vad_segments", // energy-threshold voice-activity
      // segmentation over the REAL WAV decode: per-frame exact integer
      // energies (the shared [[graft.operators.Multimodal
      // .audioFrameEnergies]] decoder output) explode into frame rows,
      // each media's threshold is HALF its mean frame energy (exact
      // integer sums → deterministic double), and voiced runs become
      // segments through the keyed gap-islands trick (frame − voiced
      // rank). Only frame-count-sized relations ever exist — samples
      // never leave the decoder.
      (s, d) => {
        val en = graft.operators.Multimodal.audioFrameEnergies(s,
          graft.operators.Multimodal.synthesizeFromDocuments(
            t(s, d, "documents")))
        val fr = en.filter(size(col("energy")) > 0)
          .select(col("media_id"), size(col("energy")).as("nw"),
            posexplode(col("energy")).as(Seq("w", "e")))
        val th = fr.groupBy("media_id")
          .agg((sum("e").cast("double") / count(lit(1)) / lit(2.0))
            .as("theta"))
        val voiced = fr.join(th, Seq("media_id"))
          .filter(col("e") > col("theta"))
          .withColumn("isl", col("w") - row_number().over(
            Window.partitionBy("media_id").orderBy("w")))
        val seg = voiced.groupBy("media_id", "isl")
          .agg(count(lit(1)).as("len"))
          .groupBy("media_id")
          .agg(count(lit(1)).as("n_segments"), sum("len").as("n_voiced"),
            max("len").as("longest_segment"))
        en.filter(size(col("energy")) > 0)
          .select(col("media_id"), size(col("energy")).cast("long")
            .as("n_windows"))
          .join(seg, Seq("media_id"), "left_outer")
          .select(col("media_id"), col("n_windows"),
            coalesce(col("n_voiced"), lit(0L)).as("n_voiced"),
            coalesce(col("n_segments"), lit(0L)).as("n_segments"),
            coalesce(col("longest_segment"), lit(0L)).as("longest_segment"),
            round(coalesce(col("n_voiced"), lit(0L)) / col("n_windows"), 6)
              .as("voiced_share"))
          .orderBy("media_id")
      },
      Some("""WITH a AS (
             |  SELECT doc_id, text, length(text) AS bl,
             |    (length(text) + length(text) % 2) // 2 AS nsmp
             |  FROM documents WHERE doc_id % 3 = 1),
             |s AS (
             |  SELECT doc_id, nsmp, nsmp // 50 AS nw,
             |    list_transform(range(0, nsmp), i ->
             |      CASE WHEN 2 * i + 2 <= bl
             |        THEN ord(substr(text, CAST(2 * i + 1 AS INT), 1))
             |          + 256 * ord(substr(text, CAST(2 * i + 2 AS INT), 1))
             |        ELSE ord(substr(text, CAST(2 * i + 1 AS INT), 1))
             |      END) AS smp
             |  FROM a),
             |e AS (
             |  SELECT doc_id, nw,
             |    list_transform(range(0, nw), w ->
             |      list_sum(list_transform(range(0, 50), j ->
             |        CAST(smp[CAST(w * 50 + j + 1 AS INT)] AS BIGINT)
             |          * smp[CAST(w * 50 + j + 1 AS INT)]))) AS en
             |  FROM s WHERE nw > 0),
             |fr AS (SELECT doc_id, nw,
             |    unnest(range(0, nw)) AS w, unnest(en) AS ev
             |  FROM e),
             |th AS (SELECT doc_id,
             |    CAST(SUM(ev) AS DOUBLE) / COUNT(*) / 2.0 AS theta
             |  FROM fr GROUP BY 1),
             |voiced AS (SELECT fr.doc_id, w,
             |    w - ROW_NUMBER() OVER (PARTITION BY fr.doc_id ORDER BY w)
             |      AS isl
             |  FROM fr JOIN th USING (doc_id) WHERE ev > theta),
             |seg AS (SELECT doc_id, COUNT(*) AS len
             |  FROM voiced GROUP BY doc_id, isl),
             |agg AS (SELECT doc_id, COUNT(*) AS n_segments,
             |    CAST(SUM(len) AS BIGINT) AS n_voiced, MAX(len) AS longest
             |  FROM seg GROUP BY 1)
             |SELECT e.doc_id AS media_id, CAST(nw AS BIGINT) AS n_windows,
             |  COALESCE(n_voiced, 0) AS n_voiced,
             |  COALESCE(n_segments, 0) AS n_segments,
             |  COALESCE(longest, 0) AS longest_segment,
             |  ROUND(COALESCE(n_voiced, 0) / CAST(nw AS BIGINT), 6)
             |    AS voiced_share
             |FROM e LEFT JOIN agg USING (doc_id)
             |ORDER BY media_id""".stripMargin)),

    Q("doc_posting_compression", // inverted-index compressibility audit:
      // for the 30 highest-df terms, the Elias-γ cost of the
      // delta-gapped posting list (bits(x) = 2⌊log₂x⌋+1, first id
      // delta-coded from −1) versus raw 64-bit postings — the
      // size-the-index-before-you-build-it number. ⌊log₂⌋ comes from
      // the binary-string length (exact integer arithmetic — never a
      // float log at a power-of-two boundary); gaps ride one keyed lag
      // window over per-term postings.
      (s, d) => {
        val post = t(s, d, "documents").select(col("doc_id"),
          explode(array_distinct(TextAnalysis.tokens(lower(col("text")))))
            .as("w"))
        val top = post.groupBy("w").agg(count(lit(1)).as("df"))
          .orderBy(col("df").desc, col("w")).limit(30)
        val g = post.join(broadcast(top.select("w")), Seq("w"))
          .withColumn("gap", coalesce(
            col("doc_id") - lag("doc_id", 1).over(
              Window.partitionBy("w").orderBy("doc_id")),
            col("doc_id") + 1))
          .withColumn("bits",
            lit(2L) * (length(bin(col("gap"))) - 1) + lit(1L))
          .groupBy("w").agg(sum("bits").as("sum_bits"))
        top.join(g, Seq("w"))
          .select(col("w").as("term"), col("df"), col("sum_bits"),
            round(col("sum_bits") / col("df"), 4).as("bits_per_posting"),
            round(lit(64.0) * col("df") / col("sum_bits"), 4)
              .as("compression_x"))
          .orderBy(col("df").desc, col("term"))
      },
      Some("""WITH post AS MATERIALIZED (
             |  SELECT doc_id, unnest(list_distinct(
             |    string_split_regex(lower(trim(text)), '\s+'))) AS w
             |  FROM documents),
             |top AS (SELECT w, COUNT(*) AS df FROM post GROUP BY 1
             |  ORDER BY df DESC, w LIMIT 30),
             |g AS (SELECT w,
             |    COALESCE(doc_id - lag(doc_id) OVER (PARTITION BY w
             |      ORDER BY doc_id), doc_id + 1) AS gap
             |  FROM post WHERE w IN (SELECT w FROM top)),
             |b AS (SELECT w, CAST(SUM(2 * (length(printf('%b', gap)) - 1)
             |    + 1) AS BIGINT) AS sum_bits
             |  FROM g GROUP BY 1)
             |SELECT w AS term, df, sum_bits,
             |  ROUND(sum_bits / df, 4) AS bits_per_posting,
             |  ROUND(64.0 * df / sum_bits, 4) AS compression_x
             |FROM top JOIN b USING (w)
             |ORDER BY df DESC, term""".stripMargin)),

    Q("part_croston_demand", // Croston's method for intermittent
      // demand — the forecast that works when most weeks sell ZERO of
      // a part (plain EWMA collapses): smooth demand SIZES and
      // demand INTERVALS separately over the nonzero weeks, forecast
      // rate = size/interval. α = 1/2 BY DESIGN: both smoothers use
      // the dyadic closed form (running Σ v·2^i), so every output is
      // bit-identical across engines with no rounding protocol. Two
      // keyed windows over the per-part demand-week grain.
      (s, d) => {
        val weekly = t(s, d, "lineitem")
          .select(col("l_partkey"),
            expr("""datediff(cast(l_shipdate as date),
                   | cast('1995-01-01' as date)) div 7""".stripMargin)
              .as("wk"),
            col("l_quantity").cast("long").as("q"))
          .groupBy("l_partkey", "wk").agg(sum("q").as("qd"))
        val w = Window.partitionBy("l_partkey").orderBy("wk")
        val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.partitionBy("l_partkey")
        def ewmaLast(df: DataFrame, vCol: String, out: String): DataFrame =
          df.withColumn("i", row_number().over(w).cast("double") - 1)
            .withColumn("np", count(lit(1)).over(wAll))
            .withColumn("s",
              sum(col(vCol).cast("double") * pow(lit(2.0), col("i")))
                .over(wc))
            .withColumn("f", first(col(vCol).cast("double")).over(wc))
            .filter(col("i") === col("np").cast("double") - 1)
            .select(col("l_partkey"), col("np"),
              ((col("s") + col("f")) / pow(lit(2.0), col("i") + 1))
                .as(out))
        val sizes = ewmaLast(weekly, "qd", "croston_size")
        val ivals = ewmaLast(
          weekly.withColumn("g",
              col("wk") - lag("wk", 1).over(w))
            .filter(col("g").isNotNull).select(col("l_partkey"),
              col("wk"), col("g")),
          "g", "croston_interval")
        val tot = weekly.groupBy("l_partkey")
          .agg(sum("qd").as("total_qty"))
        sizes.filter(col("np") >= 3)
          .join(ivals.select(col("l_partkey"), col("croston_interval")),
            Seq("l_partkey"))
          .join(tot, Seq("l_partkey"))
          .select(col("l_partkey"), col("np").as("n_periods"),
            col("total_qty"), round(col("croston_size"), 6)
              .as("croston_size"),
            round(col("croston_interval"), 6).as("croston_interval"),
            round(col("croston_size") / col("croston_interval"), 6)
              .as("croston_rate"))
          .orderBy(col("n_periods").desc, col("l_partkey")).limit(20)
      },
      Some("""WITH weekly AS MATERIALIZED (
             |  SELECT l_partkey,
             |    date_diff('day', DATE '1995-01-01',
             |      CAST(l_shipdate AS DATE)) // 7 AS wk,
             |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qd
             |  FROM lineitem GROUP BY 1, 2),
             |szi AS (SELECT l_partkey, wk, qd,
             |    CAST(ROW_NUMBER() OVER (PARTITION BY l_partkey
             |      ORDER BY wk) AS DOUBLE) - 1 AS i,
             |    COUNT(*) OVER (PARTITION BY l_partkey) AS np
             |  FROM weekly),
             |sz AS (SELECT l_partkey, np,
             |    (s + f) / POW(2.0, i + 1) AS croston_size
             |  FROM (SELECT l_partkey, i, np,
             |      SUM(CAST(qd AS DOUBLE) * POW(2.0, i))
             |        OVER (PARTITION BY l_partkey ORDER BY wk
             |          ROWS UNBOUNDED PRECEDING) AS s,
             |      FIRST_VALUE(CAST(qd AS DOUBLE)) OVER (
             |        PARTITION BY l_partkey ORDER BY wk) AS f
             |    FROM szi)
             |  WHERE i = CAST(np AS DOUBLE) - 1),
             |gaps AS (SELECT l_partkey, wk, g FROM (
             |    SELECT l_partkey, wk,
             |      wk - lag(wk) OVER (PARTITION BY l_partkey ORDER BY wk)
             |        AS g
             |    FROM weekly) WHERE g IS NOT NULL),
             |ivi AS (SELECT l_partkey, wk, g,
             |    CAST(ROW_NUMBER() OVER (PARTITION BY l_partkey
             |      ORDER BY wk) AS DOUBLE) - 1 AS i,
             |    COUNT(*) OVER (PARTITION BY l_partkey) AS np
             |  FROM gaps),
             |iv AS (SELECT l_partkey,
             |    (s + f) / POW(2.0, i + 1) AS croston_interval
             |  FROM (SELECT l_partkey, i, np,
             |      SUM(CAST(g AS DOUBLE) * POW(2.0, i))
             |        OVER (PARTITION BY l_partkey ORDER BY wk
             |          ROWS UNBOUNDED PRECEDING) AS s,
             |      FIRST_VALUE(CAST(g AS DOUBLE)) OVER (
             |        PARTITION BY l_partkey ORDER BY wk) AS f
             |    FROM ivi)
             |  WHERE i = CAST(np AS DOUBLE) - 1),
             |tot AS (SELECT l_partkey, CAST(SUM(qd) AS BIGINT) AS total_qty
             |  FROM weekly GROUP BY 1)
             |SELECT sz.l_partkey, np AS n_periods, total_qty,
             |  ROUND(croston_size, 6) AS croston_size,
             |  ROUND(croston_interval, 6) AS croston_interval,
             |  ROUND(croston_size / croston_interval, 6) AS croston_rate
             |FROM sz JOIN iv USING (l_partkey) JOIN tot USING (l_partkey)
             |WHERE np >= 3
             |ORDER BY n_periods DESC, sz.l_partkey LIMIT 20""".stripMargin)),

    Q("events_weibull_gaps", // Weibull fit of inter-arrival gaps per
      // type via median-rank regression — the reliability-engineering
      // estimate of whether arrivals cluster (shape < 1, bursty) or
      // pace themselves (shape > 1): OLS of ln(−ln(1−mr)) on ln(gap)
      // over the keyed rank order, mr = (r−0.3)/(n+0.4) (Bernard's
      // approximation). Gaps are exact integer seconds; ranks come
      // from one keyed window with a unique event-id tie-break.
      (s, d) => {
        val ev = t(s, d, "events").select(col("event_type"),
          col("event_id"), unix_millis(col("ts")).as("ms"))
        val gaps = ev.withColumn("gap_s", expr(
            """(ms - lag(ms, 1) over (partition by event_type
              | order by ms, event_id)) div 1000""".stripMargin))
          .filter(col("gap_s").isNotNull && col("gap_s") > 0)
        val w = Window.partitionBy("event_type")
          .orderBy("gap_s", "event_id")
        val wAll = Window.partitionBy("event_type")
        val pts = gaps
          .withColumn("r", row_number().over(w).cast("double"))
          .withColumn("n", count(lit(1)).over(wAll).cast("double"))
          .withColumn("x", log(col("gap_s")))
          .withColumn("y", log(-log(lit(1.0)
            - (col("r") - 0.3) / (col("n") + 0.4))))
        val m = pts.groupBy("event_type").agg(count(lit(1)).as("k"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"))
        val slope = (col("k") * col("sxy") - col("sx") * col("sy")) /
          (col("k") * col("sxx") - col("sx") * col("sx"))
        val icept = (col("sy") - slope * col("sx")) / col("k")
        m.select(col("event_type"), col("k").as("n_gaps"),
            round(slope, 6).as("shape"),
            round(exp(-icept / slope), 2).as("scale_s"))
          .orderBy("event_type")
      },
      Some("""WITH g AS (SELECT event_type,
             |    (ms - lag(ms) OVER (PARTITION BY event_type
             |      ORDER BY ms, event_id)) // 1000 AS gap_s, event_id
             |  FROM (SELECT event_type, event_id, epoch_ms(ts) AS ms
             |    FROM events)),
             |p AS (SELECT event_type,
             |    ln(gap_s) AS x,
             |    ln(-ln(1.0 - (CAST(ROW_NUMBER() OVER (
             |      PARTITION BY event_type ORDER BY gap_s, event_id)
             |        AS DOUBLE) - 0.3)
             |      / (CAST(COUNT(*) OVER (PARTITION BY event_type)
             |        AS DOUBLE) + 0.4))) AS y
             |  FROM g WHERE gap_s IS NOT NULL AND gap_s > 0),
             |m AS (SELECT event_type, COUNT(*) AS k, SUM(x) AS sx,
             |    SUM(y) AS sy, SUM(x * x) AS sxx, SUM(x * y) AS sxy
             |  FROM p GROUP BY 1)
             |SELECT event_type, k AS n_gaps,
             |  ROUND((k * sxy - sx * sy) / (k * sxx - sx * sx), 6)
             |    AS shape,
             |  ROUND(exp(-((sy - (k * sxy - sx * sy)
             |    / (k * sxx - sx * sx) * sx) / k)
             |    / ((k * sxy - sx * sy) / (k * sxx - sx * sx))), 2)
             |    AS scale_s
             |FROM m ORDER BY event_type""".stripMargin)),

    Q("window_ntile_balance", // keyed NTILE deciles — the SQL-surface
      // sibling of the range-sort Lorenz machinery: per nation,
      // customers split into balance deciles (unique custkey
      // tie-break), per cell count and exact boundary balances. The
      // window is KEYED by nation, so at scale every partition sorts
      // independently — this is the NTILE that's allowed; the global
      // one is what the Lorenz query's range sort replaces.
      (s, d) => t(s, d, "customer")
        .select(col("c_nationkey"), col("c_custkey"),
          round(col("c_acctbal") * 100, 0).cast("long").as("cents"))
        .withColumn("decile", ntile(10).over(
          Window.partitionBy("c_nationkey")
            .orderBy("cents", "c_custkey")).cast("long"))
        .groupBy("c_nationkey", "decile")
        .agg(count(lit(1)).as("n"),
          (min("cents").cast("double") / 100.0).as("lo_bal"),
          (max("cents").cast("double") / 100.0).as("hi_bal"))
        .orderBy("c_nationkey", "decile"),
      Some("""WITH c AS (SELECT c_nationkey, c_custkey,
             |    CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS cents
             |  FROM customer),
             |d AS (SELECT c_nationkey, cents,
             |    NTILE(10) OVER (PARTITION BY c_nationkey
             |      ORDER BY cents, c_custkey) AS decile
             |  FROM c)
             |SELECT c_nationkey, decile, COUNT(*) AS n,
             |  CAST(MIN(cents) AS DOUBLE) / 100.0 AS lo_bal,
             |  CAST(MAX(cents) AS DOUBLE) / 100.0 AS hi_bal
             |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("doc_logreg_auc", // exact ROC AUC of the memoized language-ID
      // fit via the rank (Mann–Whitney) identity on a BOUNDED score
      // grid: scores round to 6dp FIRST, so the cumulative walk runs
      // over at most 10^6+1 grid cells regardless of corpus size —
      // never a global window over rows. Ties take the midrank
      // correction (+a·b/2, doubled to stay integral). Every count and
      // product is an exact long; the two final divisions are the only
      // float steps, so both engines emit identical values with no
      // rounding protocol on the walk itself.
      (s, d) => {
        val w = logregFit(s, d)._1
        val p = lit(1.0) / (lit(1.0)
          + exp(-graft.operators.Learn.margin(w, logregCols)))
        val cells = logregFeatures(s, d)
          .select(round(p, 6).as("pr"), col("y"))
          .groupBy("pr").agg(
            sum(when(col("y") === 1.0, 1L).otherwise(0L)).as("a"),
            sum(when(col("y") === 0.0, 1L).otherwise(0L)).as("b"))
        val wv = Window.orderBy("pr")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        cells
          .withColumn("cumb", sum("b").over(wv) - col("b"))
          .agg(
            sum(lit(2L) * col("a") * col("cumb") + col("a") * col("b"))
              .as("num2"),
            sum("a").as("n_pos"), sum("b").as("n_neg"))
          .select(col("n_pos"), col("n_neg"),
            round(col("num2").cast("double")
              / (lit(2L) * col("n_pos") * col("n_neg")), 6).as("auc"),
            round(col("num2").cast("double")
              / (col("n_pos") * col("n_neg")) - 1.0, 6).as("gini"))
      },
      Some(s"""WITH $logregFeatureSql,
           |${logregChainParts("", "")},
           |scored AS (SELECT y,
           |    ROUND(1.0 / (1.0 + exp(-(w.b + w.w1 * x1 + w.w2 * x2
           |      + w.w3 * x3))), 6) AS pr
           |  FROM fb, w6 w),
           |cells AS (SELECT pr,
           |    CAST(SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT)
           |      AS a,
           |    CAST(SUM(CASE WHEN y = 0.0 THEN 1 ELSE 0 END) AS BIGINT)
           |      AS b
           |  FROM scored GROUP BY 1),
           |cum AS (SELECT a, b, CAST(COALESCE(SUM(b) OVER (ORDER BY pr
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |    AS BIGINT) AS cumb
           |  FROM cells),
           |agg AS (SELECT CAST(SUM(2 * a * cumb + a * b) AS BIGINT)
           |      AS num2,
           |    CAST(SUM(a) AS BIGINT) AS n_pos,
           |    CAST(SUM(b) AS BIGINT) AS n_neg
           |  FROM cum)
           |SELECT n_pos, n_neg,
           |  ROUND(CAST(num2 AS DOUBLE) / (2 * n_pos * n_neg), 6) AS auc,
           |  ROUND(CAST(num2 AS DOUBLE) / (n_pos * n_neg) - 1.0, 6)
           |    AS gini
           |FROM agg""".stripMargin)),

    Q("cust_k_anonymity", // k-anonymity / l-diversity audit of the
      // customer table under the quasi-identifier (nation, $1000
      // balance band) with market segment as the sensitive attribute —
      // the release-gate report a privacy review reads next to
      // dp_noisy_mean. One hash aggregation to QI-class grain (data-
      // sized, partial-aggregates map-side), then a rollup to the
      // BOUNDED class-size grain; every metric is an exact integer
      // except the one avg division.
      (s, d) => {
        val cls = t(s, d, "customer")
          .groupBy(col("c_nationkey"),
            floor(col("c_acctbal").cast("double") / 1000.0).cast("long")
              .as("bal_band"))
          .agg(count(lit(1)).as("k_size"),
            countDistinct("c_mktsegment").as("l_div"))
        cls.groupBy("k_size").agg(
            count(lit(1)).as("n_classes"),
            sum("l_div").as("sum_l"), min("l_div").as("min_l"))
          .select(col("k_size"), col("n_classes"),
            (col("k_size") * col("n_classes")).as("n_records"),
            col("min_l"),
            round(col("sum_l").cast("double") / col("n_classes"), 4)
              .as("avg_l"))
          .orderBy("k_size")
      },
      Some("""WITH cls AS (SELECT c_nationkey,
             |    CAST(FLOOR(CAST(c_acctbal AS DOUBLE) / 1000.0)
             |      AS BIGINT) AS bal_band,
             |    COUNT(*) AS k_size,
             |    COUNT(DISTINCT c_mktsegment) AS l_div
             |  FROM customer GROUP BY 1, 2)
             |SELECT k_size, COUNT(*) AS n_classes,
             |  CAST(k_size * COUNT(*) AS BIGINT) AS n_records,
             |  CAST(MIN(l_div) AS BIGINT) AS min_l,
             |  ROUND(CAST(SUM(l_div) AS DOUBLE) / COUNT(*), 4) AS avg_l
             |FROM cls GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("doc_cdc_chunks", // content-defined chunking — the storage-layer
      // dedup the fixed-stride RAG chunker (doc_chunks) cannot do:
      // a cut lands wherever the portable md5 of the local 8-char
      // window ≡ 0 (mod 64), so chunk boundaries survive insertions
      // (they re-synchronize after the edit, unlike fixed-width
      // blocks). Per-position hashing is a len× map-side explode —
      // embarrassingly parallel, no shuffle until the chunk-hash agg;
      // windows are keyed per doc. Output is the bounded power-of-two
      // length histogram with exact dedup-savings integers.
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"),
          length(col("text")).cast("long").as("len"))
        val bnd = docs.filter(col("len") >= 9)
          .select(col("doc_id"), col("text"),
            explode(sequence(lit(2L), col("len") - 7)).as("i"))
          .filter(conv(substring(md5(col("text")
              .substr(col("i").cast("int"), lit(8))), 1, 15), 16, 10)
            .cast("long") % 64 === 0)
          .select(col("doc_id"), col("i").as("st"))
        val starts = docs.select(col("doc_id"), lit(1L).as("st"))
          .union(bnd)
        val w = Window.partitionBy("doc_id").orderBy("st")
        val chunks = starts.join(docs, Seq("doc_id"))
          .withColumn("en",
            coalesce(lead("st", 1).over(w) - 1, col("len")))
          .select(md5(col("text").substr(col("st").cast("int"),
              (col("en") - col("st") + 1).cast("int"))).as("h"),
            (col("en") - col("st") + 1).as("clen"))
        chunks.groupBy("h")
          .agg(count(lit(1)).as("cnt"), max("clen").as("clen"))
          .groupBy((length(bin(col("clen"))) - 1).cast("long")
            .as("len_bucket"))
          .agg(sum("cnt").as("n_chunks"), count(lit(1)).as("n_distinct"),
            sum(col("cnt") - 1).as("dup_chunks"),
            sum(col("cnt") * col("clen")).as("bytes"),
            sum((col("cnt") - 1) * col("clen")).as("dup_bytes"))
          .orderBy("len_bucket")
      },
      Some("""WITH d AS MATERIALIZED (SELECT doc_id, text,
             |    CAST(length(text) AS BIGINT) AS len FROM documents),
             |bnd AS (SELECT doc_id, i AS st
             |  FROM d, unnest(range(2, greatest(len - 7, 1) + 1)) AS r(i)
             |  WHERE ('0x' || substr(md5(substr(text, CAST(i AS INT), 8)),
             |    1, 15))::BIGINT % 64 = 0),
             |starts AS (SELECT doc_id, CAST(1 AS BIGINT) AS st FROM d
             |  UNION ALL SELECT doc_id, st FROM bnd),
             |seg AS (SELECT s.doc_id, s.st, d.text, d.len,
             |    lead(s.st) OVER (PARTITION BY s.doc_id ORDER BY s.st)
             |      AS nxt
             |  FROM starts s JOIN d USING (doc_id)),
             |ch AS (SELECT md5(substr(text, CAST(st AS INT),
             |      CAST(COALESCE(nxt - 1, len) - st + 1 AS INT))) AS h,
             |    COALESCE(nxt - 1, len) - st + 1 AS clen
             |  FROM seg),
             |ph AS (SELECT h, COUNT(*) AS cnt, MAX(clen) AS clen
             |  FROM ch GROUP BY 1)
             |SELECT CAST(length(printf('%b', clen)) - 1 AS BIGINT)
             |    AS len_bucket,
             |  CAST(SUM(cnt) AS BIGINT) AS n_chunks,
             |  COUNT(*) AS n_distinct,
             |  CAST(SUM(cnt - 1) AS BIGINT) AS dup_chunks,
             |  CAST(SUM(cnt * clen) AS BIGINT) AS bytes,
             |  CAST(SUM((cnt - 1) * clen) AS BIGINT) AS dup_bytes
             |FROM ph GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("events_ljung_box", // Ljung–Box portmanteau white-noise test of
      // each type's daily-count series at lags 1..7 — the formal
      // verdict the ACF table only eyeballs. The series ZERO-FILLS
      // missing days (autocorrelation over a gapped grid is a
      // different statistic); every r_k comes from exact integer
      // moments expanded around the global mean (sxy − x̄(sxa+sxb)
      // + np·x̄²), and Q sums the 7 terms in FIXED pivot order, so
      // both engines walk the identical IEEE sequence. Windows are
      // keyed per type over the bounded day grain.
      (s, d) => {
        val cnt = t(s, d, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("c"))
        val span = cnt.groupBy("event_type")
          .agg(min("day").as("d0"), max("day").as("d1"))
        val grid = span.select(col("event_type"),
          explode(sequence(lit(0), datediff(col("d1"), col("d0"))))
            .as("idx"))
        val series = grid.join(
            cnt.join(span, Seq("event_type"))
              .select(col("event_type"),
                datediff(col("day"), col("d0")).as("idx"), col("c")),
            Seq("event_type", "idx"), "left")
          .select(col("event_type"), col("idx"),
            coalesce(col("c"), lit(0L)).as("x"))
        val glob = series.groupBy("event_type").agg(
          count(lit(1)).as("n"), sum("x").as("s1"),
          sum(col("x") * col("x")).as("s2"))
        val w = Window.partitionBy("event_type").orderBy("idx")
        val leads = series.select(col("event_type") +: col("x") +:
          (1 to 7).map(k => lead(col("x"), k).over(w).as(s"k$k")): _*)
        val perLag = leads.select(col("event_type"), col("x"), expr(
            "stack(7, 1,k1, 2,k2, 3,k3, 4,k4, 5,k5, 6,k6, 7,k7) AS (lag_k, y)"))
          .filter(col("y").isNotNull)
          .groupBy("event_type", "lag_k")
          .agg(count(lit(1)).as("np"), sum("x").as("sxa"),
            sum("y").as("sxb"), sum(col("x") * col("y")).as("sxy"))
          .join(glob, Seq("event_type"))
        val xbar = col("s1") / col("n")
        val den = col("s2").cast("double") - col("s1") * col("s1") / col("n")
        val num = col("sxy").cast("double") - xbar * (col("sxa") + col("sxb")) +
          col("np") * xbar * xbar
        val rk = perLag.select(col("event_type"), col("n"), col("lag_k"),
          when(den > 0, round(num / den, 6)).as("r"))
        def rc(k: Int): Column =
          max(when(col("lag_k") === k, col("r"))).as(s"r$k")
        val piv = rk.groupBy("event_type", "n")
          .agg(rc(1), rc(2), rc(3), rc(4), rc(5), rc(6), rc(7))
        val qs = (1 to 7).map(k =>
            col(s"r$k") * col(s"r$k") / (col("n") - k))
          .reduce(_ + _)
        piv.select(col("event_type"), col("n").as("n_days"),
            col("r1"), col("r2"), col("r3"), col("r4"), col("r5"),
            col("r6"), col("r7"),
            round(col("n") * (col("n") + 2) * qs, 4).as("q_stat"),
            (col("n") * (col("n") + 2) * qs > 14.0671).as("reject_h0"))
          .orderBy("event_type")
      },
      Some("""WITH cnt AS MATERIALIZED (
             |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS c
             |  FROM events GROUP BY 1, 2),
             |span AS (SELECT event_type, MIN(day) AS d0, MAX(day) AS d1
             |  FROM cnt GROUP BY 1),
             |series AS (
             |  SELECT g.event_type, g.idx, COALESCE(c.c, 0) AS x
             |  FROM (SELECT event_type, d0, i AS idx
             |        FROM span, unnest(range(0,
             |          date_diff('day', d0, d1) + 1)) AS r(i)) g
             |  LEFT JOIN (SELECT c.event_type,
             |      date_diff('day', s.d0, c.day) AS idx, c.c
             |    FROM cnt c JOIN span s USING (event_type)) c
             |  USING (event_type, idx)),
             |gm AS (SELECT event_type, COUNT(*) AS n,
             |    CAST(SUM(x) AS BIGINT) AS s1,
             |    CAST(SUM(x * x) AS BIGINT) AS s2
             |  FROM series GROUP BY 1),
             |l AS (SELECT event_type, x,
             |    LEAD(x, 1) OVER w AS k1, LEAD(x, 2) OVER w AS k2,
             |    LEAD(x, 3) OVER w AS k3, LEAD(x, 4) OVER w AS k4,
             |    LEAD(x, 5) OVER w AS k5, LEAD(x, 6) OVER w AS k6,
             |    LEAD(x, 7) OVER w AS k7
             |  FROM series
             |  WINDOW w AS (PARTITION BY event_type ORDER BY idx)),
             |p AS (
             |  SELECT event_type, 1 AS lag_k, x, k1 AS y FROM l UNION ALL
             |  SELECT event_type, 2, x, k2 FROM l UNION ALL
             |  SELECT event_type, 3, x, k3 FROM l UNION ALL
             |  SELECT event_type, 4, x, k4 FROM l UNION ALL
             |  SELECT event_type, 5, x, k5 FROM l UNION ALL
             |  SELECT event_type, 6, x, k6 FROM l UNION ALL
             |  SELECT event_type, 7, x, k7 FROM l),
             |m AS (SELECT event_type, lag_k, COUNT(*) AS np,
             |    CAST(SUM(x) AS BIGINT) AS sxa,
             |    CAST(SUM(y) AS BIGINT) AS sxb,
             |    CAST(SUM(x * y) AS BIGINT) AS sxy
             |  FROM p WHERE y IS NOT NULL GROUP BY 1, 2),
             |rk AS (SELECT m.event_type, g.n, m.lag_k,
             |    CASE WHEN CAST(s2 AS DOUBLE) - s1 * s1 / n > 0 THEN
             |      ROUND((CAST(sxy AS DOUBLE) - s1 / n * (sxa + sxb)
             |          + np * (s1 / n) * (s1 / n))
             |        / (CAST(s2 AS DOUBLE) - s1 * s1 / n), 6) END AS r
             |  FROM m JOIN gm g USING (event_type)),
             |piv AS (SELECT event_type, n,
             |    MAX(CASE WHEN lag_k = 1 THEN r END) AS r1,
             |    MAX(CASE WHEN lag_k = 2 THEN r END) AS r2,
             |    MAX(CASE WHEN lag_k = 3 THEN r END) AS r3,
             |    MAX(CASE WHEN lag_k = 4 THEN r END) AS r4,
             |    MAX(CASE WHEN lag_k = 5 THEN r END) AS r5,
             |    MAX(CASE WHEN lag_k = 6 THEN r END) AS r6,
             |    MAX(CASE WHEN lag_k = 7 THEN r END) AS r7
             |  FROM rk GROUP BY 1, 2)
             |SELECT event_type, n AS n_days, r1, r2, r3, r4, r5, r6, r7,
             |  ROUND(n * (n + 2) * (r1*r1/(n-1) + r2*r2/(n-2) + r3*r3/(n-3)
             |    + r4*r4/(n-4) + r5*r5/(n-5) + r6*r6/(n-6) + r7*r7/(n-7)),
             |    4) AS q_stat,
             |  n * (n + 2) * (r1*r1/(n-1) + r2*r2/(n-2) + r3*r3/(n-3)
             |    + r4*r4/(n-4) + r5*r5/(n-5) + r6*r6/(n-6) + r7*r7/(n-7))
             |    > 14.0671 AS reject_h0
             |FROM piv ORDER BY event_type""".stripMargin)),

    Q("lineitem_stump_split", // optimal decision stump: the exhaustive
      // information-gain split search over quantity predicting
      // is-returned — round one of every tree ensemble, run as pure
      // relations. Values collapse to the BOUNDED 1..50 quantity grid
      // FIRST (like the AUC score grid), cumulative class counts walk
      // that grid once, and each candidate split's entropy comes from
      // exact integer counts via the closed form ln n − (Σ c·ln c)/n —
      // so every gain is the identical double in both engines. Top-10
      // splits by rounded gain; on this independent fixture max gain
      // ≈ 0, which is the stump doing its other job: certifying a
      // feature as useless before a tree burns depth on it.
      (s, d) => {
        val cells = t(s, d, "lineitem")
          .select(floor(col("l_quantity").cast("double")).cast("long")
              .as("v"),
            when(col("l_returnflag") === "R", 1L).otherwise(0L)
              .as("y"))
          .groupBy("v").agg(sum("y").as("n1"),
            sum(lit(1L) - col("y")).as("n0"))
        val wc = Window.orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wa = Window.orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        def h(a: Column, b: Column): Column =
          log(a + b) - (when(a > 0, a.cast("double") * log(a)).otherwise(0.0)
            + when(b > 0, b.cast("double") * log(b)).otherwise(0.0)) / (a + b)
        val walk = cells
          .withColumn("cl1", sum("n1").over(wc))
          .withColumn("cl0", sum("n0").over(wc))
          .withColumn("t1", sum("n1").over(wa))
          .withColumn("t0", sum("n0").over(wa))
          .withColumn("nl", col("cl1") + col("cl0"))
          .withColumn("nr", col("t1") + col("t0") - col("cl1") - col("cl0"))
          .filter(col("nr") > 0)
        walk.select(col("v").as("threshold"),
            col("nl").as("n_left"), col("nr").as("n_right"),
            col("cl1").as("pos_left"),
            (col("t1") - col("cl1")).as("pos_right"),
            round(h(col("t1"), col("t0"))
              - (col("nl") * h(col("cl1"), col("cl0"))
                + col("nr") * h(col("t1") - col("cl1"),
                  col("t0") - col("cl0"))) / (col("nl") + col("nr")), 6)
              .as("gain"))
          .orderBy(col("gain").desc, col("threshold")).limit(10)
      },
      Some("""WITH cells AS (SELECT
             |    CAST(FLOOR(CAST(l_quantity AS DOUBLE)) AS BIGINT) AS v,
             |    CAST(SUM(CASE WHEN l_returnflag = 'R'
             |      THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             |    CAST(SUM(CASE WHEN l_returnflag = 'R'
             |      THEN 0 ELSE 1 END) AS BIGINT) AS n0
             |  FROM lineitem GROUP BY 1),
             |walk AS (SELECT v,
             |    CAST(SUM(n1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
             |      AS BIGINT) AS cl1,
             |    CAST(SUM(n0) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
             |      AS BIGINT) AS cl0,
             |    CAST(SUM(n1) OVER () AS BIGINT) AS t1,
             |    CAST(SUM(n0) OVER () AS BIGINT) AS t0
             |  FROM cells),
             |g AS (SELECT v, cl1, cl0, t1, t0,
             |    cl1 + cl0 AS nl, t1 + t0 - cl1 - cl0 AS nr
             |  FROM walk WHERE t1 + t0 - cl1 - cl0 > 0)
             |SELECT v AS threshold, nl AS n_left, nr AS n_right,
             |  cl1 AS pos_left, t1 - cl1 AS pos_right,
             |  ROUND(
             |    (ln(t1 + t0) - (CASE WHEN t1 > 0 THEN t1 * ln(t1) ELSE 0 END
             |      + CASE WHEN t0 > 0 THEN t0 * ln(t0) ELSE 0 END) / (t1 + t0))
             |    - (nl * (ln(cl1 + cl0)
             |        - (CASE WHEN cl1 > 0 THEN cl1 * ln(cl1) ELSE 0 END
             |          + CASE WHEN cl0 > 0 THEN cl0 * ln(cl0) ELSE 0 END)
             |          / (cl1 + cl0))
             |      + nr * (ln(t1 - cl1 + t0 - cl0)
             |        - (CASE WHEN t1 - cl1 > 0
             |            THEN (t1 - cl1) * ln(t1 - cl1) ELSE 0 END
             |          + CASE WHEN t0 - cl0 > 0
             |            THEN (t0 - cl0) * ln(t0 - cl0) ELSE 0 END)
             |          / (t1 - cl1 + t0 - cl0))) / (nl + nr), 6) AS gain
             |FROM g ORDER BY gain DESC, threshold LIMIT 10""".stripMargin)),

    Q("orders_hurst_exponent", // rescaled-range (R/S) Hurst exponent of
      // the daily order-count series — the long-memory diagnostic
      // (H≈0.5 random walk, H>0.5 persistent trends, H<0.5 mean
      // reversion). Blocks of 16/64/256 days: within each block the
      // cumulative deviation runs off EXACT integer prefix sums
      // (cumx − k·S/n — no float accumulation), S from integer
      // moments; constant blocks are excluded by an exact integer
      // test. H is the evenly-spaced 3-point OLS slope, which
      // collapses to ln(rs256/rs16)/ln(16) — the constant inlined
      // JVM-side so neither engine's libm picks it. Windows are keyed
      // per (size, block) over the bounded day grain.
      (s, d) => {
        val daily = t(s, d, "orders")
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(count(lit(1)).as("x"))
        val wi = Window.orderBy("day")
        val rows = daily
          .withColumn("i", row_number().over(wi).cast("long") - 1)
          .select(col("i"), col("x"),
            explode(array(lit(16L), lit(64L), lit(256L))).as("bn"))
          .withColumn("blk", expr("i DIV bn"))
          .withColumn("pos", pmod(col("i"), col("bn")))
        val wb = Window.partitionBy("bn", "blk")
        val wcum = wb.orderBy("pos")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val dev = rows
          .withColumn("cnt", count(lit(1)).over(wb))
          .withColumn("s1", sum("x").over(wb))
          .withColumn("s2", sum(col("x") * col("x")).over(wb))
          .filter(col("cnt") === col("bn")
            && col("s2") * col("bn") > col("s1") * col("s1"))
          .withColumn("cumx", sum("x").over(wcum))
          .withColumn("dv",
            col("cumx").cast("double") - (col("pos") + 1) * col("s1") / col("bn"))
        val rs = dev.groupBy("bn", "blk", "s1", "s2")
          .agg(max("dv").as("dmax"), min("dv").as("dmin"))
          .select(col("bn"),
            ((col("dmax") - col("dmin"))
              / sqrt(col("s2").cast("double") / col("bn")
                - (col("s1") / col("bn")) * (col("s1") / col("bn"))))
              .as("rs"))
          .groupBy("bn").agg(count(lit(1)).as("n_blocks"),
            round(avg("rs"), 6).as("avg_rs"))
        val piv = rs.agg(
          sum("n_blocks").as("n_blocks_total"),
          max(when(col("bn") === 16, col("avg_rs"))).as("rs16"),
          max(when(col("bn") === 64, col("avg_rs"))).as("rs64"),
          max(when(col("bn") === 256, col("avg_rs"))).as("rs256"))
        piv.select(col("n_blocks_total"),
          round(col("rs16"), 4).as("rs16"),
          round(col("rs64"), 4).as("rs64"),
          round(col("rs256"), 4).as("rs256"),
          round((log(col("rs256")) - log(col("rs16")))
            / lit(HURST_LN16), 4).as("hurst"))
      },
      Some(s"""WITH daily AS MATERIALIZED (
             |  SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS x
             |  FROM orders GROUP BY 1),
             |rows_ AS (SELECT i, x, bn, i // bn AS blk, i % bn AS pos
             |  FROM (SELECT CAST(ROW_NUMBER() OVER (ORDER BY day)
             |        AS BIGINT) - 1 AS i, x FROM daily),
             |    (SELECT unnest([16, 64, 256]) AS bn)),
             |st AS (SELECT bn, blk, COUNT(*) AS cnt,
             |    CAST(SUM(x) AS BIGINT) AS s1,
             |    CAST(SUM(x * x) AS BIGINT) AS s2
             |  FROM rows_ GROUP BY 1, 2),
             |dev AS (SELECT r.bn, r.blk, s.s1, s.s2,
             |    CAST(SUM(r.x) OVER (PARTITION BY r.bn, r.blk ORDER BY r.pos
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumx,
             |    r.pos
             |  FROM rows_ r JOIN st s ON r.bn = s.bn AND r.blk = s.blk
             |  WHERE s.cnt = r.bn AND s.s2 * r.bn > s.s1 * s.s1),
             |rs AS (SELECT bn,
             |    (MAX(CAST(cumx AS DOUBLE) - (pos + 1) * s1 / bn)
             |      - MIN(CAST(cumx AS DOUBLE) - (pos + 1) * s1 / bn))
             |    / sqrt(CAST(s2 AS DOUBLE) / bn - (s1 / bn) * (s1 / bn))
             |      AS rs
             |  FROM dev GROUP BY bn, blk, s1, s2),
             |ag AS (SELECT bn, COUNT(*) AS n_blocks,
             |    ROUND(AVG(rs), 6) AS avg_rs
             |  FROM rs GROUP BY 1),
             |piv AS (SELECT CAST(SUM(n_blocks) AS BIGINT)
             |      AS n_blocks_total,
             |    MAX(CASE WHEN bn = 16 THEN avg_rs END) AS rs16,
             |    MAX(CASE WHEN bn = 64 THEN avg_rs END) AS rs64,
             |    MAX(CASE WHEN bn = 256 THEN avg_rs END) AS rs256
             |  FROM ag)
             |SELECT n_blocks_total, ROUND(rs16, 4) AS rs16,
             |  ROUND(rs64, 4) AS rs64, ROUND(rs256, 4) AS rs256,
             |  ROUND((ln(rs256) - ln(rs16)) / $HURST_LN16, 4) AS hurst
             |FROM piv""".stripMargin)),

    Q("doc_tokenizer_fertility", // tokenizer fertility by language —
      // tokens-per-word and chars-per-token of the trained BPE applied
      // to each language's slice: THE table an LLM team reads when
      // deciding whether a tokenizer's merges transfer across
      // languages (fertility ≫ 1 on a language = its context windows
      // shrink). Rides the memoized 3-merge BPE (model state in the
      // closure) + one doc-grain join to lang; the rollup is exact
      // integers into two final divisions.
      (s, d) => graft.operators.TextAnalysis
        .bpeEncode(t(s, d, "documents"), bpeMerges(s, d))
        .join(t(s, d, "documents").select(col("doc_id"), col("lang"),
          col("n_chars")), Seq("doc_id"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_raw").as("n_words"),
          sum("n_encoded").as("n_tokens"), sum("n_chars").as("n_chars"))
        .select(col("lang"), col("n_docs"), col("n_words"),
          col("n_tokens"),
          round(col("n_tokens").cast("double") / col("n_words"), 6)
            .as("fertility"),
          round(col("n_chars").cast("double") / col("n_tokens"), 6)
            .as("chars_per_token"))
        .orderBy("lang"),
      Some(s"""$bpeOracleWith,
           |enc AS (SELECT c0.id AS doc_id,
           |    CAST(len(c0.ts) AS BIGINT) AS n_raw,
           |    CAST(len(c3.ts) AS BIGINT) AS n_encoded
           |  FROM c0 JOIN c3 ON c0.id = c3.id)
           |SELECT lang, COUNT(*) AS n_docs,
           |  CAST(SUM(n_raw) AS BIGINT) AS n_words,
           |  CAST(SUM(n_encoded) AS BIGINT) AS n_tokens,
           |  ROUND(CAST(SUM(n_encoded) AS DOUBLE) / SUM(n_raw), 6)
           |    AS fertility,
           |  ROUND(CAST(SUM(n_chars) AS DOUBLE) / SUM(n_encoded), 6)
           |    AS chars_per_token
           |FROM enc JOIN documents d ON enc.doc_id = d.doc_id
           |GROUP BY lang ORDER BY lang""".stripMargin)),

    Q("supp_abc_classes", // Pareto/ABC inventory classification of
      // suppliers by revenue — A carries the first 80% of revenue
      // walking from the richest down, B to 95%, C the tail. The
      // cumulative walk that is usually written as one global
      // descending NTILE runs instead over 100 percentile buckets of
      // the DISTRIBUTED range sort (RankedValues.bucketSums — the
      // Lorenz machinery): class boundaries are decided at bucket
      // grain, which is the scale-safe declaration (at fixture scale
      // buckets are single suppliers, so it is also exact). Revenue is
      // exact integer cents; boundary tests are exact integer products.
      (s, d) => {
        import s.implicits._
        val rev = t(s, d, "lineitem")
          .groupBy(col("l_suppkey"))
          .agg(sum(round(col("l_extendedprice") * 100, 0).cast("long"))
            .as("cents"))
          .select(col("cents").cast("double").as("cents_d"),
            col("l_suppkey"))
        val ranked = graft.operators.Scale
          .rankValues(rev, "cents_d", Seq("l_suppkey"))
        val sums = ranked.bucketSums(100, 1.0)
        ranked.unpersist()
        val tot = sums.map(_._3).sum
        var cumBefore = 0.0
        val classed = sums.sortBy(-_._1).map { case (_, n, c) =>
          val cls =
            if (100.0 * cumBefore < 80.0 * tot) "A"
            else if (100.0 * cumBefore < 95.0 * tot) "B" else "C"
          cumBefore += c
          (cls, n, c)
        }
        classed.groupBy(_._1).toSeq.map { case (cls, rs) =>
          (cls, rs.map(_._2).sum, rs.map(_._3).sum / 100.0,
            BigDecimal(rs.map(_._3).sum / tot).setScale(6,
              BigDecimal.RoundingMode.HALF_UP).toDouble)
        }.toDF("abc_class", "n_suppliers", "revenue", "revenue_share")
          .orderBy("abc_class")
      },
      Some("""WITH rev AS (SELECT l_suppkey,
             |    CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
             |      AS BIGINT) AS cents
             |  FROM lineitem GROUP BY 1),
             |nt AS (SELECT l_suppkey, cents,
             |    NTILE(100) OVER (ORDER BY CAST(cents AS DOUBLE),
             |      l_suppkey) AS b
             |  FROM rev),
             |bs AS (SELECT b, COUNT(*) AS n,
             |    CAST(SUM(cents) AS BIGINT) AS c
             |  FROM nt GROUP BY 1),
             |cum AS (SELECT b, n, c,
             |    CAST(COALESCE(SUM(c) OVER (ORDER BY b DESC
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS BIGINT) AS cb,
             |    CAST(SUM(c) OVER () AS BIGINT) AS tot
             |  FROM bs),
             |cls AS (SELECT CASE WHEN 100 * cb < 80 * tot THEN 'A'
             |    WHEN 100 * cb < 95 * tot THEN 'B' ELSE 'C' END
             |      AS abc_class, n, c, tot
             |  FROM cum)
             |SELECT abc_class, CAST(SUM(n) AS BIGINT) AS n_suppliers,
             |  CAST(SUM(c) AS DOUBLE) / 100.0 AS revenue,
             |  ROUND(CAST(SUM(c) AS DOUBLE) / MAX(tot), 6)
             |    AS revenue_share
             |FROM cls GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("scale_compaction_plan", // small-files compaction planner: given
      // the day-grain file manifest (file ≈ one day's partition, size
      // ≈ its row count), coalesce adjacent files into ~500-row output
      // groups the way OPTIMIZE/AQE coalescing actually does it —
      // order-preserving cumulative packing, group = prefix-rows DIV
      // target. The window runs over the bounded MANIFEST grain (file
      // list), never over rows — exactly what a table-format compactor
      // reads, plans over, and rewrites. All integers; fill_ratio is
      // the one division.
      (s, d) => {
        val files = t(s, d, "orders")
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
          .agg(count(lit(1)).as("nrows"))
        val wc = Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        files
          .withColumn("cum", sum("nrows").over(wc))
          .withColumn("group_id", expr("(cum - nrows) DIV 500"))
          .groupBy("group_id")
          .agg(count(lit(1)).as("n_files"), sum("nrows").as("rows_total"),
            min("day").as("first_day"), max("day").as("last_day"))
          .select(col("group_id"), col("n_files"), col("rows_total"),
            col("first_day"), col("last_day"),
            round(col("rows_total").cast("double") / 500, 4)
              .as("fill_ratio"))
          .orderBy("group_id")
      },
      Some("""WITH f AS (SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
             |    COUNT(*) AS nrows
             |  FROM orders GROUP BY 1),
             |c AS (SELECT day, nrows,
             |    CAST(SUM(nrows) OVER (ORDER BY day
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
             |  FROM f)
             |SELECT (cum - nrows) // 500 AS group_id,
             |  COUNT(*) AS n_files, CAST(SUM(nrows) AS BIGINT)
             |    AS rows_total,
             |  MIN(day) AS first_day, MAX(day) AS last_day,
             |  ROUND(CAST(SUM(nrows) AS DOUBLE) / 500, 4) AS fill_ratio
             |FROM c GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("events_disorder_lateness", // out-of-orderness audit that sizes
      // the watermark: within each day, lateness = running-max(event
      // time in ARRIVAL order) − event time; the per-day report gives
      // the late share, the max, and the smallest power-of-two delay
      // covering ≥99% of events — the number `withWatermark` actually
      // needs. The fixture ships no arrival column (event_id is
      // exactly time-ordered), so arrival = ts + a deterministic
      // 0–120 s network delay from the portable integer hash family —
      // reproducible disorder, not randomness. The running max is a
      // KEYED window (day partitions), lateness collapses to the
      // bounded power-of-two bucket grain before the cumulative 99%
      // walk, and every test is an exact integer product
      // (100·cum ≥ 99·n).
      (s, d) => {
        val ev = t(s, d, "events").select(
          date_format(col("ts"), "yyyy-MM-dd").as("day"),
          col("event_id"), unix_millis(col("ts")).as("ms"))
          .withColumn("arr", col("ms")
            + (lit(1000003L) * col("event_id") + 17) % 2147483647L % 120000L)
        val w = Window.partitionBy("day").orderBy("arr", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val late = ev.withColumn("lmax", max("ms").over(w))
          .withColumn("late_s", expr("(lmax - ms) div 1000"))
        val hist = late.groupBy(col("day"),
            when(col("late_s") === 0, lit(0L))
              .otherwise(length(bin(col("late_s"))).cast("long")).as("b"))
          .agg(count(lit(1)).as("cnt"), max("late_s").as("mx"))
        val wd = Window.partitionBy("day")
        val wcum = wd.orderBy("b")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        hist
          .withColumn("n", sum("cnt").over(wd))
          .withColumn("cum", sum("cnt").over(wcum))
          .groupBy("day", "n")
          .agg(sum(when(col("b") > 0, col("cnt")).otherwise(0L))
              .as("n_late"),
            max("mx").as("max_late_s"),
            min(when(col("cum") * 100 >= col("n") * 99, col("b")))
              .as("bmin"))
          .select(col("day"), col("n").as("n_events"),
            round(col("n_late").cast("double") / col("n"), 6)
              .as("late_share"),
            (pow(lit(2.0), col("bmin")).cast("long") - 1)
              .as("p99_delay_s"),
            col("max_late_s"))
          .orderBy("day")
      },
      Some("""WITH e AS (SELECT strftime(ts, '%Y-%m-%d') AS day,
             |    event_id, epoch_ms(ts) AS ms,
             |    epoch_ms(ts) + (1000003 * event_id + 17)
             |      % 2147483647 % 120000 AS arr
             |  FROM events),
             |l AS (SELECT day,
             |    (MAX(ms) OVER (PARTITION BY day ORDER BY arr, event_id
             |      ROWS UNBOUNDED PRECEDING) - ms) // 1000 AS late_s
             |  FROM e),
             |h AS (SELECT day,
             |    CASE WHEN late_s = 0 THEN 0
             |      ELSE length(printf('%b', late_s)) END AS b,
             |    COUNT(*) AS cnt, CAST(MAX(late_s) AS BIGINT) AS mx
             |  FROM l GROUP BY 1, 2),
             |x AS (SELECT day, b, cnt, mx,
             |    CAST(SUM(cnt) OVER (PARTITION BY day) AS BIGINT) AS n,
             |    CAST(SUM(cnt) OVER (PARTITION BY day ORDER BY b
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
             |  FROM h)
             |SELECT day, n AS n_events,
             |  ROUND(CAST(SUM(CASE WHEN b > 0 THEN cnt ELSE 0 END)
             |    AS DOUBLE) / n, 6) AS late_share,
             |  CAST(POW(2, MIN(CASE WHEN cum * 100 >= n * 99 THEN b END))
             |    AS BIGINT) - 1 AS p99_delay_s,
             |  CAST(MAX(mx) AS BIGINT) AS max_late_s
             |FROM x GROUP BY day, n ORDER BY day""".stripMargin)),

    Q("scale_clustering_depth", // clustering-depth audit of the two
      // zonemap layouts — the Iceberg/Delta metric that PREDICTS
      // scale_zonemap_prune's outcome without running a predicate: how
      // many files' [min,max] day ranges stack over any point of the
      // domain. avg depth = Σ file spans / domain span (pure integer
      // arithmetic), max depth via a ±1 sweep over the bounded ≤128
      // file endpoints per layout. Depth ≈ 1 ⇒ every point lives in
      // one file (skip-friendly); depth ≈ n_files ⇒ zonemaps are
      // useless and the table wants a sort/Z-order rewrite.
      (s, d) => {
        val o = t(s, d, "orders").select(col("o_orderkey"),
          col("o_orderdate"))
        val bounds = o.agg(min("o_orderkey").as("k0"),
          max("o_orderkey").as("k1"), min("o_orderdate").as("dmin"),
          max("o_orderdate").as("dmax"))
        val withB = o.crossJoin(broadcast(bounds)).select(
          datediff(col("o_orderdate"), col("dmin")).as("di"),
          datediff(col("dmax"), col("dmin")).as("span0"),
          expr("least((o_orderkey - k0) * 64 div (k1 - k0 + 1), 63)")
            .as("kb"),
          expr("""least(datediff(o_orderdate, dmin) * 64
                 | div (datediff(dmax, dmin) + 1), 63)""".stripMargin)
            .as("db"))
        def files(b: String, layout: String): DataFrame = withB
          .groupBy(col(b).as("bucket"))
          .agg(min("di").as("lo"), max("di").as("hi"),
            max("span0").as("span0"))
          .select(lit(layout).as("layout"), col("bucket"), col("lo"),
            col("hi"), col("span0"))
        val f = files("kb", "key_clustered")
          .unionByName(files("db", "date_clustered"))
        val ep = f.select(col("layout"), col("span0"), explode(array(
            struct(col("lo").as("p"), lit(1L).as("delta")),
            struct((col("hi") + 1).as("p"), lit(-1L).as("delta"))))
            .as("e"))
          .select(col("layout"), col("span0"), col("e.p").as("p"),
            col("e.delta").as("delta"))
        val wsweep = Window.partitionBy("layout").orderBy("p")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val depth = ep.groupBy("layout", "span0", "p")
          .agg(sum("delta").as("delta"))
          .withColumn("depth", sum("delta").over(wsweep))
        val spans = f.groupBy("layout").agg(count(lit(1)).as("n_files"),
          sum(col("hi") - col("lo") + 1).as("span_sum"),
          (max("span0") + 1).as("domain"))
        depth.groupBy("layout").agg(max("depth").as("max_depth"))
          .join(spans, Seq("layout"))
          .select(col("layout"), col("n_files"),
            round(col("span_sum").cast("double") / col("domain"), 4)
              .as("avg_depth"),
            col("max_depth"))
          .orderBy("layout")
      },
      Some("""WITH b AS (SELECT MIN(o_orderkey) AS k0,
             |    MAX(o_orderkey) AS k1, MIN(o_orderdate) AS dmin,
             |    MAX(o_orderdate) AS dmax
             |  FROM orders),
             |w AS (SELECT date_diff('day', dmin, o_orderdate) AS di,
             |    date_diff('day', dmin, dmax) AS span0,
             |    least((o_orderkey - k0) * 64 // (k1 - k0 + 1), 63) AS kb,
             |    least(date_diff('day', dmin, o_orderdate) * 64
             |      // (date_diff('day', dmin, dmax) + 1), 63) AS db
             |  FROM orders, b),
             |f AS (
             |  SELECT 'key_clustered' AS layout, kb AS bucket,
             |    CAST(MIN(di) AS BIGINT) AS lo, CAST(MAX(di) AS BIGINT)
             |      AS hi, MAX(span0) AS span0
             |  FROM w GROUP BY 2
             |  UNION ALL
             |  SELECT 'date_clustered', db,
             |    CAST(MIN(di) AS BIGINT), CAST(MAX(di) AS BIGINT),
             |    MAX(span0)
             |  FROM w GROUP BY 2),
             |ep AS (
             |  SELECT layout, p, CAST(SUM(delta) AS BIGINT) AS delta
             |  FROM (SELECT layout, lo AS p, 1 AS delta FROM f
             |    UNION ALL SELECT layout, hi + 1, -1 FROM f)
             |  GROUP BY 1, 2),
             |sw AS (SELECT layout,
             |    CAST(SUM(delta) OVER (PARTITION BY layout ORDER BY p
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS depth
             |  FROM ep),
             |sp AS (SELECT layout, COUNT(*) AS n_files,
             |    CAST(SUM(hi - lo + 1) AS BIGINT) AS span_sum,
             |    MAX(span0) + 1 AS domain
             |  FROM f GROUP BY 1)
             |SELECT layout, n_files,
             |  ROUND(CAST(span_sum AS DOUBLE) / domain, 4) AS avg_depth,
             |  (SELECT CAST(MAX(depth) AS BIGINT) FROM sw
             |    WHERE sw.layout = sp.layout) AS max_depth
             |FROM sp ORDER BY layout""".stripMargin)),

    Q("emb_dim_health", // per-dimension health table of the embedding
      // matrix — the pre-ANN audit that catches dead dimensions
      // (σ ≈ 0 wastes index bits), off-center dims (|μ| ≫ σ breaks
      // inner-product pruning), and range blowouts. One posexplode →
      // one 64-cell hash aggregation; μ/σ round to 6dp (the model-state
      // rounding contract), and the dead flag tests the ROUNDED σ so
      // both engines flag identically.
      (s, d) => {
        val ex = t(s, d, "embeddings")
          .select(posexplode(col("embedding")).as(Seq("d0", "x0")))
          .select((col("d0") + 1).as("dim"),
            col("x0").cast("double").as("x"))
        ex.groupBy("dim")
          .agg(count(lit(1)).as("n"),
            round(avg("x"), 6).as("mu"),
            round(sqrt(avg(col("x") * col("x"))
              - avg("x") * avg("x")), 6).as("sigma"),
            round(min("x"), 6).as("vmin"),
            round(max("x"), 6).as("vmax"))
          .select(col("dim"), col("n"), col("mu"), col("sigma"),
            col("vmin"), col("vmax"),
            (col("sigma") < 0.05).as("dead_dim"))
          .orderBy("dim")
      },
      Some("""WITH ex AS (
             |  SELECT i AS dim, CAST(embedding[i] AS DOUBLE) AS x
             |  FROM embeddings, range(1, 65) t(i)),
             |st AS (SELECT dim, COUNT(*) AS n,
             |    ROUND(AVG(x), 6) AS mu,
             |    ROUND(sqrt(AVG(x * x) - AVG(x) * AVG(x)), 6) AS sigma,
             |    ROUND(MIN(x), 6) AS vmin, ROUND(MAX(x), 6) AS vmax
             |  FROM ex GROUP BY 1)
             |SELECT dim, n, mu, sigma, vmin, vmax,
             |  sigma < 0.05 AS dead_dim
             |FROM st ORDER BY dim""".stripMargin)),

    Q("orders_little_law", // Little's law audit (L = λW) of the
      // order-fulfillment queue: per year, average work-in-progress
      // (orders whose [orderdate, last shipdate] interval covers the
      // day) versus arrival rate × mean flow time. WIP comes from the
      // ±1 endpoint sweep over the bounded day grain (the session-
      // concurrency shape, not a per-order-per-day explode); every
      // input is an exact integer, and the ratio ≈ 1 IS the report —
      // drift from 1 localizes non-stationarity (ramp-up/cut-off
      // years). The queue is defined over in-contract lines
      // (0 ≤ ship−order ≤ 120 d): this fixture plants uncorrelated
      // ship dates years away, and a queue metric only holds for the
      // population whose intervals are real.
      (s, d) => {
        val iv = t(s, d, "lineitem")
          .select(col("l_orderkey"), to_date(col("l_shipdate")).as("sd"))
          .join(t(s, d, "orders").select(col("o_orderkey"),
            to_date(col("o_orderdate")).as("startd")),
            col("l_orderkey") === col("o_orderkey"))
          .filter(datediff(col("sd"), col("startd")).between(0, 120))
          .groupBy(col("o_orderkey"), col("startd"))
          .agg(max("sd").as("endd"))
          .select(col("startd"), col("endd"))
        val ep = iv.select(explode(array(
            struct(col("startd").as("day"), lit(1L).as("delta")),
            struct(date_add(col("endd"), 1).as("day"),
              lit(-1L).as("delta")))).as("e"))
          .select(col("e.day").as("day"), col("e.delta").as("delta"))
          .groupBy("day").agg(sum("delta").as("delta"))
        val wsweep = Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wip = ep.withColumn("wip", sum("delta").over(wsweep))
          .withColumn("nxt", lead("day", 1).over(Window.orderBy("day")))
          .filter(col("nxt").isNotNull)
          .select(year(col("day")).as("yr"),
            (col("wip") * datediff(col("nxt"), col("day"))).as("wip_days"))
          .groupBy("yr").agg(sum("wip_days").as("wip_days"))
        val lam = iv.groupBy(year(col("startd")).as("yr"))
          .agg(count(lit(1)).as("n_orders"),
            sum(datediff(col("endd"), col("startd")) + 1).as("flow_days"))
        wip.join(lam, Seq("yr"))
          .select(col("yr").as("year"), col("n_orders"),
            round(col("wip_days").cast("double") / 365.0, 4).as("l_wip"),
            round(col("n_orders").cast("double") / 365.0, 6).as("lambda"),
            round(col("flow_days").cast("double") / col("n_orders"), 4)
              .as("w_flow"),
            round((col("wip_days").cast("double") / 365.0)
              / ((col("n_orders").cast("double") / 365.0)
                * (col("flow_days").cast("double") / col("n_orders"))), 4)
              .as("little_ratio"))
          .orderBy("year")
      },
      Some("""WITH iv AS MATERIALIZED (
             |  SELECT CAST(o_orderdate AS DATE) AS startd,
             |    MAX(CAST(l_shipdate AS DATE)) AS endd
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  WHERE date_diff('day', CAST(o_orderdate AS DATE),
             |    CAST(l_shipdate AS DATE)) BETWEEN 0 AND 120
             |  GROUP BY o_orderkey, o_orderdate),
             |ep AS (SELECT day, CAST(SUM(delta) AS BIGINT) AS delta
             |  FROM (SELECT startd AS day, 1 AS delta FROM iv
             |    UNION ALL SELECT endd + 1, -1 FROM iv)
             |  GROUP BY 1),
             |sw AS (SELECT day,
             |    CAST(SUM(delta) OVER (ORDER BY day
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS wip,
             |    LEAD(day) OVER (ORDER BY day) AS nxt
             |  FROM ep),
             |wd AS (SELECT date_part('year', day) AS yr,
             |    CAST(SUM(wip * date_diff('day', day, nxt)) AS BIGINT)
             |      AS wip_days
             |  FROM sw WHERE nxt IS NOT NULL GROUP BY 1),
             |lam AS (SELECT date_part('year', startd) AS yr,
             |    COUNT(*) AS n_orders,
             |    CAST(SUM(date_diff('day', startd, endd) + 1) AS BIGINT)
             |      AS flow_days
             |  FROM iv GROUP BY 1)
             |SELECT CAST(wd.yr AS BIGINT) AS year, n_orders,
             |  ROUND(CAST(wip_days AS DOUBLE) / 365.0, 4) AS l_wip,
             |  ROUND(CAST(n_orders AS DOUBLE) / 365.0, 6) AS lambda,
             |  ROUND(CAST(flow_days AS DOUBLE) / n_orders, 4) AS w_flow,
             |  ROUND((CAST(wip_days AS DOUBLE) / 365.0)
             |    / ((CAST(n_orders AS DOUBLE) / 365.0)
             |      * (CAST(flow_days AS DOUBLE) / n_orders)), 4)
             |    AS little_ratio
             |FROM wd JOIN lam ON wd.yr = lam.yr
             |ORDER BY year""".stripMargin)),

    Q("events_fano_factor", // Fano factor (variance/mean of hourly
      // arrival counts) per event type — the dispersion test that
      // separates Poisson traffic (F≈1) from bursty (F>1) or
      // clock-regular (F<1) sources, sized over the COMPLETE hour
      // grid: empty hours contribute zero to the moments, so only the
      // 1-row global hour-span broadcast and the nonzero cells are
      // touched — no grid explode. Exact integer moments throughout;
      // the verdict tests the rounded statistic.
      (s, d) => {
        val hc = t(s, d, "events")
          .select(col("event_type"),
            expr("unix_millis(ts) div 3600000").as("h"))
          .groupBy("event_type", "h").agg(count(lit(1)).as("c"))
        val span = hc.agg((max("h") - min("h") + 1).as("n_hours"))
        val f = hc.groupBy("event_type")
          .agg(sum("c").as("s1"), sum(col("c") * col("c")).as("s2"))
          .crossJoin(broadcast(span))
        val mean = col("s1").cast("double") / col("n_hours")
        val fano = (col("s2").cast("double") / col("n_hours")
          - mean * mean) / mean
        f.select(col("event_type"), col("n_hours"), col("s1").as("n_events"),
            round(mean, 6).as("hourly_mean"),
            round(fano, 6).as("fano"),
            (round(fano, 6) > 1.5).as("bursty"))
          .orderBy("event_type")
      },
      Some("""WITH hc AS (SELECT event_type, epoch_ms(ts) // 3600000 AS h,
             |    COUNT(*) AS c
             |  FROM events GROUP BY 1, 2),
             |span AS (SELECT MAX(h) - MIN(h) + 1 AS n_hours FROM hc),
             |f AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS s1,
             |    CAST(SUM(c * c) AS BIGINT) AS s2
             |  FROM hc GROUP BY 1)
             |SELECT event_type, n_hours, s1 AS n_events,
             |  ROUND(CAST(s1 AS DOUBLE) / n_hours, 6) AS hourly_mean,
             |  ROUND((CAST(s2 AS DOUBLE) / n_hours
             |    - (CAST(s1 AS DOUBLE) / n_hours)
             |      * (CAST(s1 AS DOUBLE) / n_hours))
             |    / (CAST(s1 AS DOUBLE) / n_hours), 6) AS fano,
             |  ROUND((CAST(s2 AS DOUBLE) / n_hours
             |    - (CAST(s1 AS DOUBLE) / n_hours)
             |      * (CAST(s1 AS DOUBLE) / n_hours))
             |    / (CAST(s1 AS DOUBLE) / n_hours), 6) > 1.5 AS bursty
             |FROM f, span ORDER BY event_type""".stripMargin)),

    Q("doc_lm_perplexity_filter", // CCNet-style per-document perplexity
      // filter: score every doc under the corpus's own Laplace-smoothed
      // bigram LM and surface the 10 least-predictable documents — the
      // gibberish/outlier screen that runs before pretraining. Training
      // and scoring are the SAME gram-keyed relations (counts join back
      // to doc bigrams on the 2-gram key — never doc-vs-doc); the vocab
      // size rides a 1-row broadcast. p(w2|w1) = (c12+1)/(c1+V) is an
      // exact-integer ratio, so only ln/Σ/exp are float; ordering is on
      // the ROUNDED perplexity with a doc_id tie-break.
      (s, d) => {
        val toks = t(s, d, "documents").select(col("doc_id"),
          graft.operators.TextAnalysis.tokens(lower(col("text"))).as("ts"))
        val db = toks.filter(size(col("ts")) >= 2)
          .select(col("doc_id"),
            explode(transform(sequence(lit(1), size(col("ts")) - 1),
              i => struct(element_at(col("ts"), i).as("w1"),
                element_at(col("ts"), i + 1).as("w2")))).as("b"))
          .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
        val cnt = db.groupBy("w1", "w2").agg(count(lit(1)).as("cab"))
        val pref = cnt.groupBy("w1").agg(sum("cab").as("ca"))
        val voc = toks.select(explode(col("ts")).as("w"))
          .agg(countDistinct("w").as("v"))
        db.join(cnt, Seq("w1", "w2")).join(pref, Seq("w1"))
          .crossJoin(broadcast(voc))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"),
            sum(log((col("cab") + 1).cast("double") / (col("ca") + col("v"))))
              .as("slnp"))
          .select(col("doc_id"), col("n_bigrams"),
            round(exp(-col("slnp") / col("n_bigrams")), 6).as("perplexity"))
          .orderBy(col("perplexity").desc, col("doc_id")).limit(10)
      },
      Some("""WITH tok AS MATERIALIZED (SELECT doc_id,
             |    string_split_regex(lower(trim(text)), '\s+') AS ts
             |  FROM documents),
             |db AS MATERIALIZED (SELECT doc_id, ts[i] AS w1,
             |    ts[i+1] AS w2
             |  FROM tok, unnest(range(1, len(ts))) AS r(i)
             |  WHERE len(ts) >= 2),
             |cnt AS (SELECT w1, w2, COUNT(*) AS cab FROM db GROUP BY 1, 2),
             |pref AS (SELECT w1, CAST(SUM(cab) AS BIGINT) AS ca
             |  FROM cnt GROUP BY 1),
             |voc AS (SELECT COUNT(DISTINCT u.w) AS v
             |  FROM tok, unnest(ts) AS u(w)),
             |sc AS (SELECT d.doc_id, COUNT(*) AS n_bigrams,
             |    SUM(ln(CAST(cab + 1 AS DOUBLE) / (ca + v))) AS slnp
             |  FROM db d JOIN cnt USING (w1, w2) JOIN pref USING (w1), voc
             |  GROUP BY 1)
             |SELECT doc_id, n_bigrams,
             |  ROUND(exp(-slnp / n_bigrams), 6) AS perplexity
             |FROM sc ORDER BY perplexity DESC, doc_id LIMIT 10"""
        .stripMargin)),

    Q("orders_dup_payment_audit", // duplicate-payment detection — the
      // finance-ops audit: same customer, same amount to the cent,
      // within 30 days. The fixture carries no organic duplicates
      // (exact-cents collisions: zero), so ~19 duplicates are PLANTED
      // deterministically (every o_orderkey ≡ 0 mod 797 re-pays
      // +3 days later under a high orderkey) — the detector is graded
      // against known positives, the dq_inclusion_deps pattern.
      // Blocking is the equi-join on (customer, cents) — pairs only
      // ever form inside a block, never across the table.
      (s, d) => {
        val base = t(s, d, "orders").select(col("o_custkey"),
          col("o_orderkey"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"),
          to_date(col("o_orderdate")).as("day"))
        val planted = base.filter(col("o_orderkey") % 797 === 0)
          .select(col("o_custkey"),
            (col("o_orderkey") + 1000000000L).as("o_orderkey"),
            col("cents"), date_add(col("day"), 3).as("day"))
        val all = base.unionByName(planted)
        val ar = all.select(col("o_custkey"), col("o_orderkey").as("ok_a"),
          col("cents"), col("day").as("day_a"))
        val br = all.select(col("o_custkey"), col("o_orderkey").as("ok_b"),
          col("cents"), col("day").as("day_b"))
        ar.join(br, Seq("o_custkey", "cents"))
          .filter(col("ok_a") < col("ok_b")
            && abs(datediff(col("day_b"), col("day_a"))) <= 30)
          .select(col("o_custkey"), col("ok_a"), col("ok_b"),
            datediff(col("day_b"), col("day_a")).as("day_gap"),
            (col("cents").cast("double") / 100.0).as("amount"))
          .orderBy("o_custkey", "ok_a", "ok_b")
      },
      Some("""WITH base AS (SELECT o_custkey, o_orderkey,
             |    CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
             |    CAST(o_orderdate AS DATE) AS day
             |  FROM orders),
             |al AS (SELECT * FROM base
             |  UNION ALL
             |  SELECT o_custkey, o_orderkey + 1000000000, cents, day + 3
             |  FROM base WHERE o_orderkey % 797 = 0)
             |SELECT a.o_custkey, a.o_orderkey AS ok_a,
             |  b.o_orderkey AS ok_b,
             |  date_diff('day', a.day, b.day) AS day_gap,
             |  CAST(a.cents AS DOUBLE) / 100.0 AS amount
             |FROM al a JOIN al b
             |  ON a.o_custkey = b.o_custkey AND a.cents = b.cents
             |  AND a.o_orderkey < b.o_orderkey
             |WHERE abs(date_diff('day', a.day, b.day)) <= 30
             |ORDER BY a.o_custkey, ok_a, ok_b""".stripMargin)),

    Q("doc_source_hhi", // corpus balance audit: Herfindahl–Hirschman
      // concentration of sources within each language slice, and the
      // effective number of sources 1/HHI — the diversity number a
      // data-mixture plan is written against (effective ≈ 1 means a
      // language is really one source wearing several names). HHI =
      // Σc² / n² is exact integers into one division.
      (s, d) => {
        val cells = t(s, d, "documents")
          .groupBy("lang", "source").agg(count(lit(1)).as("c"))
        cells.groupBy("lang")
          .agg(sum("c").as("n_docs"), count(lit(1)).as("n_sources"),
            sum(col("c") * col("c")).as("s2"))
          .select(col("lang"), col("n_docs"), col("n_sources"),
            round(col("s2").cast("double") / (col("n_docs") * col("n_docs")),
              6).as("hhi"),
            round((col("n_docs") * col("n_docs")).cast("double") / col("s2"),
              4).as("effective_sources"))
          .orderBy("lang")
      },
      Some("""WITH cells AS (SELECT lang, source, COUNT(*) AS c
             |  FROM documents GROUP BY 1, 2)
             |SELECT lang, CAST(SUM(c) AS BIGINT) AS n_docs,
             |  COUNT(*) AS n_sources,
             |  ROUND(CAST(SUM(c * c) AS DOUBLE)
             |    / (SUM(c) * SUM(c)), 6) AS hhi,
             |  ROUND(CAST(SUM(c) * SUM(c) AS DOUBLE) / SUM(c * c), 4)
             |    AS effective_sources
             |FROM cells GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("events_srm_check", // sample-ratio-mismatch guardrail — the FIRST
      // test any A/B readout must pass: do the hash-assigned variants
      // (user_id mod 2) actually split 50/50? One chi² (1 df) per
      // segment: the user universe plus each event type's traffic. For
      // two cells the statistic collapses to (a−b)²/(a+b) — exact
      // integers into one division; the verdict tests the rounded
      // statistic against the inlined 3.8415 critical value.
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_type"), col("user_id"),
            (col("user_id") % 2).as("v"))
        val users = ev.select(col("user_id"), col("v")).distinct()
          .agg(sum(when(col("v") === 0, 1L).otherwise(0L)).as("n_a"),
            sum(when(col("v") === 1, 1L).otherwise(0L)).as("n_b"))
          .select(lit("users").as("segment"), col("n_a"), col("n_b"))
        val types = ev.groupBy(col("event_type").as("segment"))
          .agg(sum(when(col("v") === 0, 1L).otherwise(0L)).as("n_a"),
            sum(when(col("v") === 1, 1L).otherwise(0L)).as("n_b"))
        val chi = (col("n_a") - col("n_b")) * (col("n_a") - col("n_b"))
        users.unionByName(types)
          .select(col("segment"), col("n_a"), col("n_b"),
            round(chi.cast("double") / (col("n_a") + col("n_b")), 6)
              .as("chi2"),
            (round(chi.cast("double") / (col("n_a") + col("n_b")), 6)
              > 3.8415).as("srm_detected"))
          .orderBy("segment")
      },
      Some("""WITH ev AS (SELECT event_type, user_id, user_id % 2 AS v
             |  FROM events),
             |seg AS (
             |  SELECT 'users' AS segment,
             |    CAST(SUM(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_a,
             |    CAST(SUM(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_b
             |  FROM (SELECT DISTINCT user_id, v FROM ev)
             |  UNION ALL
             |  SELECT event_type,
             |    CAST(SUM(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT),
             |    CAST(SUM(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT)
             |  FROM ev GROUP BY 1)
             |SELECT segment, n_a, n_b,
             |  ROUND(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
             |    / (n_a + n_b), 6) AS chi2,
             |  ROUND(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
             |    / (n_a + n_b), 6) > 3.8415 AS srm_detected
             |FROM seg ORDER BY segment""".stripMargin)),

    Q("doc_blocklist_screen", // lexicon safety screen — the blocklist
      // filter every curation pipeline runs before anything smarter:
      // per (source, term) hit counts, affected docs, and the
      // hits-per-1k-tokens rate. The list rides an inline per-row
      // explode (no join); a rare term ('dup'), a common one ('slow'),
      // and an absent one ('crash') keep the report non-degenerate in
      // all three regimes. Exact integers into one rate division.
      (s, d) => {
        val toks = t(s, d, "documents").select(col("doc_id"),
          col("source"),
          graft.operators.TextAnalysis.tokens(lower(col("text"))).as("ts"))
        val src = toks.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(size(col("ts"))).cast("long").as("n_tokens"))
        val grid = src.select(col("source"), col("n_docs"),
          col("n_tokens"),
          explode(array(lit("dup"), lit("slow"), lit("crash"))).as("term"))
        val hits = toks
          .select(col("doc_id"), col("source"), explode(col("ts")).as("w"))
          .filter(col("w").isin("dup", "slow", "crash"))
          .groupBy(col("source"), col("w").as("term"))
          .agg(count(lit(1)).as("h"),
            countDistinct("doc_id").as("dh"))
        grid.join(hits, Seq("source", "term"), "left")
          .select(col("source"), col("term"), col("n_docs"),
            coalesce(col("h"), lit(0L)).as("n_hits"),
            coalesce(col("dh"), lit(0L)).as("n_docs_hit"),
            round(coalesce(col("h"), lit(0L)) * lit(1000.0)
              / col("n_tokens"), 4).as("hits_per_1k"))
          .orderBy("source", "term")
      },
      Some("""WITH tok AS MATERIALIZED (SELECT doc_id, source,
             |    string_split_regex(lower(trim(text)), '\s+') AS ts
             |  FROM documents),
             |src AS (SELECT source, COUNT(*) AS n_docs,
             |    CAST(SUM(len(ts)) AS BIGINT) AS n_tokens
             |  FROM tok GROUP BY 1),
             |grid AS (SELECT source, n_docs, n_tokens, term
             |  FROM src, unnest(['dup', 'slow', 'crash']) AS t(term)),
             |hits AS (SELECT source, u.w AS term, COUNT(*) AS h,
             |    COUNT(DISTINCT doc_id) AS dh
             |  FROM tok, unnest(ts) AS u(w)
             |  WHERE u.w IN ('dup', 'slow', 'crash')
             |  GROUP BY 1, 2)
             |SELECT g.source, g.term, n_docs,
             |  CAST(COALESCE(h, 0) AS BIGINT) AS n_hits,
             |  CAST(COALESCE(dh, 0) AS BIGINT) AS n_docs_hit,
             |  ROUND(COALESCE(h, 0) * 1000.0 / n_tokens, 4) AS hits_per_1k
             |FROM grid g LEFT JOIN hits
             |  ON g.source = hits.source AND g.term = hits.term
             |ORDER BY g.source, g.term""".stripMargin)),

    Q("supp_scorecard_composite", // supplier scorecard: three metrics
      // on three scales (revenue cents, distinct parts, return share)
      // min-max normalized over the supplier population via ONE 1-row
      // bounds broadcast, then a weighted composite
      // (0.5·rev + 0.3·breadth + 0.2·(1−returns)) ranks the top 10 —
      // the standard multi-metric normalization surface (the BI
      // sibling of feature scaling). Metrics are exact integers;
      // normalization is the only float step and the ranking orders by
      // the ROUNDED score with a supplier tie-break.
      (s, d) => {
        val m = t(s, d, "lineitem").groupBy(col("l_suppkey"))
          .agg(sum(round(col("l_extendedprice") * 100, 0).cast("long"))
              .as("cents"),
            countDistinct("l_partkey").as("n_parts"),
            count(lit(1)).as("n_lines"),
            sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
              .as("n_ret"))
        val b = m.agg(min("cents").as("c0"), max("cents").as("c1"),
          min("n_parts").as("p0"), max("n_parts").as("p1"))
        def mm(x: Column, lo: Column, hi: Column): Column =
          when(hi > lo, (x - lo).cast("double") / (hi - lo)).otherwise(0.5)
        val scored = m.crossJoin(broadcast(b))
          .withColumn("rev_n", mm(col("cents"), col("c0"), col("c1")))
          .withColumn("parts_n", mm(col("n_parts"), col("p0"), col("p1")))
          .withColumn("ret_share",
            col("n_ret").cast("double") / col("n_lines"))
          .withColumn("score", round(lit(0.5) * col("rev_n")
            + lit(0.3) * col("parts_n")
            + lit(0.2) * (lit(1.0) - col("ret_share")), 6))
        scored.select(col("l_suppkey"), col("n_parts"), col("n_lines"),
            (col("cents").cast("double") / 100.0).as("revenue"),
            round(col("ret_share"), 6).as("return_share"),
            col("score"))
          .orderBy(col("score").desc, col("l_suppkey")).limit(10)
      },
      Some("""WITH m AS (SELECT l_suppkey,
             |    CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
             |      AS BIGINT) AS cents,
             |    COUNT(DISTINCT l_partkey) AS n_parts,
             |    COUNT(*) AS n_lines,
             |    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_ret
             |  FROM lineitem GROUP BY 1),
             |b AS (SELECT MIN(cents) AS c0, MAX(cents) AS c1,
             |    MIN(n_parts) AS p0, MAX(n_parts) AS p1
             |  FROM m),
             |s AS (SELECT l_suppkey, n_parts, n_lines, cents,
             |    CAST(n_ret AS DOUBLE) / n_lines AS ret_share,
             |    ROUND(0.5 * (CASE WHEN c1 > c0 THEN
             |        CAST(cents - c0 AS DOUBLE) / (c1 - c0) ELSE 0.5 END)
             |      + 0.3 * (CASE WHEN p1 > p0 THEN
             |        CAST(n_parts - p0 AS DOUBLE) / (p1 - p0)
             |        ELSE 0.5 END)
             |      + 0.2 * (1.0 - CAST(n_ret AS DOUBLE) / n_lines), 6)
             |      AS score
             |  FROM m, b)
             |SELECT l_suppkey, n_parts, n_lines,
             |  CAST(cents AS DOUBLE) / 100.0 AS revenue,
             |  ROUND(ret_share, 6) AS return_share, score
             |FROM s ORDER BY score DESC, l_suppkey LIMIT 10"""
        .stripMargin)),

    Q("orders_nbinom_fit", // lines-per-order dispersion audit +
      // negative-binomial method-of-moments fit — the count-model
      // choice every demand/traffic simulator makes: Poisson (v≈m),
      // NB (v>m), or binomial-ish (v<m). The overdispersion verdict is
      // the EXACT integer test n·s2 − s1² > n·s1 (no float in the
      // branch); NB parameters r = m²/(v−m), p = m/v emit only when it
      // holds, NULL otherwise in both engines.
      (s, d) => {
        val k = t(s, d, "lineitem").groupBy("l_orderkey")
          .agg(count(lit(1)).as("k"))
        val mom = k.agg(count(lit(1)).as("n"), sum("k").as("s1"),
          sum(col("k") * col("k")).as("s2"))
        val m = col("s1").cast("double") / col("n")
        val v = col("s2").cast("double") / col("n") - m * m
        val over = col("n") * col("s2") - col("s1") * col("s1") >
          col("n") * col("s1")
        mom.select(col("n").as("n_orders"),
          round(m, 6).as("mean_lines"),
          round(v, 6).as("var_lines"),
          round(v / m, 4).as("dispersion"),
          over.as("overdispersed"),
          when(over, round(m * m / (v - m), 4)).as("nb_r"),
          when(over, round(m / v, 6)).as("nb_p"))
      },
      Some("""WITH k AS (SELECT l_orderkey, COUNT(*) AS k
             |  FROM lineitem GROUP BY 1),
             |mom AS (SELECT COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS s1,
             |    CAST(SUM(k * k) AS BIGINT) AS s2
             |  FROM k)
             |SELECT n AS n_orders,
             |  ROUND(CAST(s1 AS DOUBLE) / n, 6) AS mean_lines,
             |  ROUND(CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n)
             |    * (CAST(s1 AS DOUBLE) / n), 6) AS var_lines,
             |  ROUND((CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n)
             |    * (CAST(s1 AS DOUBLE) / n))
             |    / (CAST(s1 AS DOUBLE) / n), 4) AS dispersion,
             |  n * s2 - s1 * s1 > n * s1 AS overdispersed,
             |  CASE WHEN n * s2 - s1 * s1 > n * s1 THEN
             |    ROUND((CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
             |      / (CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n)
             |        * (CAST(s1 AS DOUBLE) / n) - CAST(s1 AS DOUBLE) / n),
             |      4) END AS nb_r,
             |  CASE WHEN n * s2 - s1 * s1 > n * s1 THEN
             |    ROUND((CAST(s1 AS DOUBLE) / n) / (CAST(s2 AS DOUBLE) / n
             |      - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)),
             |      6) END AS nb_p
             |  FROM mom""".stripMargin)),

    Q("mm_video_shot_cuts", // shot-boundary detection over the REAL
      // AVI decode: consecutive-frame Σ|Δbyte| computed INSIDE the
      // decode task (a video's frames live in one row — the pairing
      // never shuffles pixel bytes, the duplicateFrames contract),
      // cut where the diff exceeds 1800 (fixture median 1413, max
      // 3042 — both regimes populated). The oracle diffs the RAW
      // padded text slices: the decoder's BGR↔RGB byte permutation is
      // applied identically to both frames, so Σ|perm(a)−perm(b)| =
      // Σ|a−b| and the permutation drops out of the algebra. Exact
      // integers into one avg division.
      (s, d) => {
        val diffs = graft.operators.Multimodal.shotCutDiffs(s,
          graft.operators.Multimodal
            .synthesizeFromDocuments(t(s, d, "documents")))
        diffs.groupBy("media_id")
          .agg((count(lit(1)) + 1).as("n_frames"),
            sum(when(col("sdiff") > 1800, 1L).otherwise(0L)).as("n_cuts"),
            round(avg(col("sdiff").cast("double")), 4).as("avg_diff"),
            max("sdiff").as("max_diff"))
          .select(col("media_id"), col("n_frames"), col("n_cuts"),
            (col("n_cuts") + 1).as("n_shots"), col("avg_diff"),
            col("max_diff"))
          .orderBy("media_id")
      },
      Some("""WITH v AS (SELECT doc_id, text || repeat(' ', 48) AS padded,
             |    greatest(1, (length(text) + 47) // 48) AS nf
             |  FROM documents WHERE doc_id % 3 = 2),
             |bd AS (SELECT doc_id, i,
             |    CAST(list_aggregate(list_transform(range(1, 49),
             |      p -> abs(unicode(substr(padded,
             |          CAST(i * 48 + p AS BIGINT), 1))
             |        - unicode(substr(padded,
             |          CAST((i + 1) * 48 + p AS BIGINT), 1)))),
             |      'sum') AS BIGINT) AS sdiff
             |  FROM v, unnest(range(0, nf - 1)) AS u(i)
             |  WHERE nf >= 2)
             |SELECT doc_id AS media_id,
             |  COUNT(*) + 1 AS n_frames,
             |  CAST(SUM(CASE WHEN sdiff > 1800 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_cuts,
             |  CAST(SUM(CASE WHEN sdiff > 1800 THEN 1 ELSE 0 END)
             |    AS BIGINT) + 1 AS n_shots,
             |  ROUND(AVG(CAST(sdiff AS DOUBLE)), 4) AS avg_diff,
             |  CAST(MAX(sdiff) AS BIGINT) AS max_diff
             |FROM bd GROUP BY 1 ORDER BY media_id""".stripMargin)),

    Q("orders_churn_rate", // monthly churn timeline: of the customers
      // active in month m, how many place no order in m+1 — the
      // product-analytics number behind every retention plan (the
      // cohort triangle's marginal). Activity collapses to the
      // distinct (customer, month) grain FIRST; churn is ONE keyed
      // lead() per customer (no month-vs-month self-join); the final
      // month is censored (no m+1 observable) and excluded. Exact
      // integers into the two rate divisions.
      (s, d) => {
        val am = t(s, d, "orders")
          .select(col("o_custkey"),
            (year(col("o_orderdate")) * 12
              + month(col("o_orderdate"))).cast("long").as("mi"),
            date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
          .distinct()
        val w = Window.partitionBy("o_custkey").orderBy("mi")
        val flagged = am
          .withColumn("nxt", lead("mi", 1).over(w))
          .withColumn("prv", lag("mi", 1).over(w))
        val maxMi = flagged.agg(max("mi").as("last_mi"))
        flagged.crossJoin(broadcast(maxMi))
          .filter(col("mi") < col("last_mi"))
          .groupBy("ym")
          .agg(count(lit(1)).as("n_active"),
            sum(when(col("nxt").isNull || col("nxt") > col("mi") + 1, 1L)
              .otherwise(0L)).as("n_churned"),
            sum(when(col("prv").isNull, 1L).otherwise(0L)).as("n_new"))
          .select(col("ym"), col("n_active"), col("n_churned"),
            round(col("n_churned").cast("double") / col("n_active"), 6)
              .as("churn_rate"),
            col("n_new"),
            round(col("n_new").cast("double") / col("n_active"), 6)
              .as("new_share"))
          .orderBy("ym")
      },
      Some("""WITH am AS (SELECT DISTINCT o_custkey,
             |    date_part('year', o_orderdate) * 12
             |      + date_part('month', o_orderdate) AS mi,
             |    strftime(o_orderdate, '%Y-%m') AS ym
             |  FROM orders),
             |fl AS (SELECT o_custkey, mi, ym,
             |    LEAD(mi) OVER w AS nxt, LAG(mi) OVER w AS prv
             |  FROM am WINDOW w AS (PARTITION BY o_custkey ORDER BY mi)),
             |mx AS (SELECT MAX(mi) AS last_mi FROM fl)
             |SELECT ym, COUNT(*) AS n_active,
             |  CAST(SUM(CASE WHEN nxt IS NULL OR nxt > mi + 1
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_churned,
             |  ROUND(CAST(SUM(CASE WHEN nxt IS NULL OR nxt > mi + 1
             |    THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
             |    AS churn_rate,
             |  CAST(SUM(CASE WHEN prv IS NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_new,
             |  ROUND(CAST(SUM(CASE WHEN prv IS NULL THEN 1 ELSE 0 END)
             |    AS DOUBLE) / COUNT(*), 6) AS new_share
             |FROM fl, mx WHERE mi < last_mi
             |GROUP BY ym ORDER BY ym""".stripMargin)),

    Q("orders_service_level_curve", // fill-rate service levels: the
      // share of orders fully shipped within X days for X ∈ {7, 14,
      // 30, 60, 90, 120} — the curve an SLA is negotiated against. An
      // order's fill time is its max line lag over the in-contract
      // population (0..120 d, the orders_little_law filter — this
      // fixture plants uncorrelated ship dates that would otherwise
      // poison every max). Orders collapse to their max lag FIRST;
      // the X grid is an inline per-row explode. Exact integers into
      // one division per X.
      (s, d) => {
        val lag0 = t(s, d, "lineitem")
          .select(col("l_orderkey"), to_date(col("l_shipdate")).as("sd"))
          .join(t(s, d, "orders").select(col("o_orderkey"),
            to_date(col("o_orderdate")).as("od")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("o_orderkey"), datediff(col("sd"), col("od"))
            .as("lg"))
          .filter(col("lg").between(0, 120))
          .groupBy("o_orderkey").agg(max("lg").as("max_lag"))
        lag0.select(col("max_lag"), explode(array(
            lit(7), lit(14), lit(30), lit(60), lit(90), lit(120)))
            .as("x_days"))
          .groupBy("x_days")
          .agg(count(lit(1)).as("n_orders"),
            sum(when(col("max_lag") <= col("x_days"), 1L).otherwise(0L))
              .as("n_filled"))
          .select(col("x_days").cast("long").as("x_days"),
            col("n_orders"), col("n_filled"),
            round(col("n_filled").cast("double") / col("n_orders"), 6)
              .as("service_level"))
          .orderBy("x_days")
      },
      Some("""WITH lg AS (SELECT o_orderkey,
             |    CAST(MAX(date_diff('day', CAST(o_orderdate AS DATE),
             |      CAST(l_shipdate AS DATE))) AS BIGINT) AS max_lag
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  WHERE date_diff('day', CAST(o_orderdate AS DATE),
             |    CAST(l_shipdate AS DATE)) BETWEEN 0 AND 120
             |  GROUP BY 1)
             |SELECT CAST(x_days AS BIGINT) AS x_days,
             |  COUNT(*) AS n_orders,
             |  CAST(SUM(CASE WHEN max_lag <= x_days THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_filled,
             |  ROUND(CAST(SUM(CASE WHEN max_lag <= x_days
             |    THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
             |    AS service_level
             |FROM lg, unnest([7, 14, 30, 60, 90, 120]) AS t(x_days)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("events_asof_snapshot", // AS-OF state reconstruction from the
      // event log — the time-travel read every upsert/changelog table
      // needs: for three snapshot instants, the latest value per user
      // (keyed row_number over (ms, event_id) — the deterministic
      // last-writer rule) and the state rollup. Values scale to exact
      // integer cents BEFORE summing so the state total is
      // order-independent; the snapshot grid is an inline per-row
      // explode, so the log scans ONCE for all three instants.
      (s, d) => {
        val ev = t(s, d, "events").select(col("user_id"),
          col("event_id"), unix_millis(col("ts")).as("ms"),
          round(col("value") * 100, 0).cast("long").as("cents"))
        val snap = ev.select(col("user_id"), col("event_id"), col("ms"),
          col("cents"), explode(array(lit("2024-01-10"), lit("2024-01-20"),
            lit("2024-01-30"))).as("asof_day"))
          .filter(col("ms") < unix_millis(to_timestamp(col("asof_day"))))
        val w = Window.partitionBy("asof_day", "user_id")
          .orderBy(col("ms").desc, col("event_id").desc)
        val latest = snap.withColumn("rn", row_number().over(w))
        val nev = snap.groupBy("asof_day")
          .agg(count(lit(1)).as("n_events_upto"))
        latest.filter(col("rn") === 1)
          .groupBy("asof_day")
          .agg(count(lit(1)).as("n_users"),
            sum("cents").as("state_cents"))
          .join(nev, Seq("asof_day"))
          .select(col("asof_day"), col("n_users"), col("n_events_upto"),
            (col("state_cents").cast("double") / 100.0).as("state_sum"),
            round(col("state_cents").cast("double") / 100.0
              / col("n_users"), 4).as("state_avg"))
          .orderBy("asof_day")
      },
      Some("""WITH ev AS (SELECT user_id, event_id, epoch_ms(ts) AS ms,
             |    CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
             |  FROM events),
             |snap AS (SELECT user_id, event_id, ms, cents, asof_day
             |  FROM ev, unnest(['2024-01-10', '2024-01-20',
             |    '2024-01-30']) AS t(asof_day)
             |  WHERE ms < epoch_ms(CAST(asof_day || ' 00:00:00'
             |    AS TIMESTAMP))),
             |latest AS (SELECT asof_day, user_id, cents,
             |    ROW_NUMBER() OVER (PARTITION BY asof_day, user_id
             |      ORDER BY ms DESC, event_id DESC) AS rn
             |  FROM snap),
             |nev AS (SELECT asof_day, COUNT(*) AS n_events_upto
             |  FROM snap GROUP BY 1),
             |st AS (SELECT asof_day, COUNT(*) AS n_users,
             |    CAST(SUM(cents) AS BIGINT) AS state_cents
             |  FROM latest WHERE rn = 1 GROUP BY 1)
             |SELECT st.asof_day, n_users, n_events_upto,
             |  CAST(state_cents AS DOUBLE) / 100.0 AS state_sum,
             |  ROUND(CAST(state_cents AS DOUBLE) / 100.0 / n_users, 4)
             |    AS state_avg
             |FROM st JOIN nev USING (asof_day)
             |ORDER BY asof_day""".stripMargin)),

    Q("events_outage_windows", // per-pipeline outage detection: runs
      // of ≥2 consecutive ZERO-event hours for each event type — the
      // monitoring query behind every data-freshness SLA (the GLOBAL
      // stream never goes quiet on this fixture: 720/720 hours
      // populated; a single type's feed does, 17 two-hour stalls).
      // The hour grid derives from a 1-row span broadcast (~720
      // bounded cells per type), zero hours are the grid's anti-join
      // against the hourly rollup, and runs come from the classic
      // idx − row_number island trick KEYED by type. All exact
      // integers.
      (s, d) => {
        val hc = t(s, d, "events")
          .select(col("event_type"),
            expr("unix_millis(ts) div 3600000").as("h"))
          .groupBy("event_type", "h").agg(count(lit(1)).as("c"))
        val span = hc.agg(min("h").as("h0"), max("h").as("h1"))
        val grid = hc.select("event_type").distinct()
          .crossJoin(broadcast(span))
          .select(col("event_type"),
            explode(sequence(col("h0"), col("h1"))).as("h"))
        val zeros = grid.join(hc, Seq("event_type", "h"), "left_anti")
        val w = Window.partitionBy("event_type").orderBy("h")
        val isl = zeros
          .withColumn("grp", col("h") - row_number().over(w))
          .groupBy("event_type", "grp")
          .agg(min("h").as("start_h"), max("h").as("end_h"),
            count(lit(1)).as("n_hours"))
          .filter(col("n_hours") >= 2)
        isl.select(col("event_type"),
            from_unixtime(col("start_h") * 3600, "yyyy-MM-dd HH:00")
              .as("outage_start"),
            from_unixtime(col("end_h") * 3600 + 3599, "yyyy-MM-dd HH:mm")
              .as("outage_end"),
            col("n_hours"))
          .orderBy("event_type", "outage_start")
      },
      Some("""WITH hc AS (SELECT event_type,
             |    epoch_ms(ts) // 3600000 AS h, COUNT(*) AS c
             |  FROM events GROUP BY 1, 2),
             |span AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM hc),
             |grid AS (SELECT t.event_type, i AS h
             |  FROM (SELECT DISTINCT event_type FROM hc) t, span,
             |    unnest(range(h0, h1 + 1)) AS r(i)),
             |zeros AS (SELECT g.event_type, g.h
             |  FROM grid g LEFT JOIN hc
             |    ON g.event_type = hc.event_type AND g.h = hc.h
             |  WHERE hc.h IS NULL),
             |isl AS (SELECT event_type, MIN(h) AS start_h,
             |    MAX(h) AS end_h, COUNT(*) AS n_hours
             |  FROM (SELECT event_type, h,
             |      h - ROW_NUMBER() OVER (PARTITION BY event_type
             |        ORDER BY h) AS grp
             |    FROM zeros)
             |  GROUP BY event_type, grp HAVING COUNT(*) >= 2)
             |SELECT event_type,
             |  strftime(to_timestamp(start_h * 3600),
             |    '%Y-%m-%d %H:00') AS outage_start,
             |  strftime(to_timestamp(end_h * 3600 + 3599),
             |    '%Y-%m-%d %H:%M') AS outage_end,
             |  n_hours
             |FROM isl ORDER BY event_type, outage_start"""
        .stripMargin)),

    Q("events_dau_wau_stickiness", // DAU/WAU stickiness per week — the
      // engagement ratio product teams steer by (1/7 = users show up
      // once a week, 1.0 = daily habit). Weeks come from portable
      // day-index arithmetic (no engine week functions); daily and
      // weekly distinct-user rollups join on the bounded week grain;
      // exact integers into the two divisions.
      (s, d) => {
        val ev = t(s, d, "events").select(col("user_id"),
          expr("unix_millis(ts) div 86400000").as("di"))
        val dauW = ev.distinct()
          .select(col("user_id"), col("di"),
            expr("di div 7").cast("long").as("wk"))
        val wau = dauW.groupBy("wk")
          .agg(countDistinct("user_id").as("wau"),
            countDistinct("di").as("n_days"),
            count(lit(1)).as("sum_dau"))
        wau.select(col("wk").as("week_idx"), col("n_days"),
            col("wau"), col("sum_dau"),
            round(col("sum_dau").cast("double") / col("n_days"), 4)
              .as("avg_dau"),
            round(col("sum_dau").cast("double") / col("n_days")
              / col("wau"), 6).as("stickiness"))
          .orderBy("week_idx")
      },
      Some("""WITH du AS (SELECT DISTINCT user_id,
             |    epoch_ms(ts) // 86400000 AS di
             |  FROM events),
             |w AS (SELECT user_id, di, di // 7 AS wk FROM du)
             |SELECT wk AS week_idx, COUNT(DISTINCT di) AS n_days,
             |  COUNT(DISTINCT user_id) AS wau,
             |  COUNT(*) AS sum_dau,
             |  ROUND(CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT di), 4)
             |    AS avg_dau,
             |  ROUND(CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT di)
             |    / COUNT(DISTINCT user_id), 6) AS stickiness
             |FROM w GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("graph_clustering_coeff", // clustering coefficients of the
      // co-purchase graph: per-degree-bucket average LOCAL coefficient
      // plus the GLOBAL transitivity row — the triangle-density lens
      // on whether the graph is clumpy or stringy. Everything reads
      // the SHARED memoized edge-support build (one wedge enumeration
      // serves the whole truss/support/jaccard family): a node's
      // triangle count is half the support sum over its incident
      // edges, so local C = Σsup / (deg·(deg−1)) is an exact integer
      // ratio, and transitivity = 2·Σsup / Σdeg(deg−1) never counts a
      // triangle twice.
      (s, d) => {
        val sup = coPurchaseEdgeSupport(s, d)
          .select(col("a"), col("b"), col("support"))
        val inc = sup.select(col("a").as("id"), col("support"))
          .unionByName(sup.select(col("b").as("id"), col("support")))
        val nodes = inc.groupBy("id")
          .agg(count(lit(1)).as("deg"), sum("support").as("sup2"))
          .filter(col("deg") >= 2)
        val local = nodes.select(
          concat(lit("deg_"), lpad(least(col("deg"), lit(10))
            .cast("string"), 2, "0")).as("segment"),
          (col("sup2").cast("double")
            / (col("deg") * (col("deg") - 1))).as("c"))
        val buckets = local.groupBy("segment")
          .agg(count(lit(1)).as("n_nodes"),
            round(avg("c"), 6).as("clustering_coeff"))
        val glob = nodes.agg(count(lit(1)).as("n_nodes"),
            round(lit(2.0) * sum("sup2")
              / sum(col("deg") * (col("deg") - 1)), 6)
              .as("clustering_coeff"))
          .select(lit("global_transitivity").as("segment"),
            col("n_nodes"), col("clustering_coeff"))
        buckets.unionByName(glob).orderBy("segment")
      },
      Some("""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey
             |  FROM lineitem),
             |p AS MATERIALIZED (SELECT a.l_partkey AS src,
             |    b.l_partkey AS dst
             |  FROM op a JOIN op b
             |    ON a.l_orderkey = b.l_orderkey
             |    AND a.l_partkey < b.l_partkey
             |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
             |tri AS MATERIALIZED (SELECT e1.src AS a, e1.dst AS b,
             |    e2.dst AS c
             |  FROM p e1 JOIN p e2 ON e2.src = e1.dst
             |  JOIN p e3 ON e3.src = e1.src AND e3.dst = e2.dst),
             |te AS (SELECT a AS x, b AS y FROM tri
             |  UNION ALL SELECT a, c FROM tri
             |  UNION ALL SELECT b, c FROM tri),
             |sup AS (SELECT p.src, p.dst, COUNT(te.x) AS support
             |  FROM p LEFT JOIN te ON te.x = p.src AND te.y = p.dst
             |  GROUP BY 1, 2),
             |inc AS (SELECT src AS id, support FROM sup
             |  UNION ALL SELECT dst, support FROM sup),
             |nodes AS (SELECT id, COUNT(*) AS deg,
             |    CAST(SUM(support) AS BIGINT) AS sup2
             |  FROM inc GROUP BY 1 HAVING COUNT(*) >= 2),
             |loc AS (SELECT 'deg_' || lpad(CAST(least(deg, 10)
             |      AS VARCHAR), 2, '0') AS segment,
             |    CAST(sup2 AS DOUBLE) / (deg * (deg - 1)) AS c
             |  FROM nodes),
             |bk AS (SELECT segment, COUNT(*) AS n_nodes,
             |    ROUND(AVG(c), 6) AS clustering_coeff
             |  FROM loc GROUP BY 1),
             |gl AS (SELECT 'global_transitivity' AS segment,
             |    COUNT(*) AS n_nodes,
             |    ROUND(2.0 * SUM(sup2) / SUM(deg * (deg - 1)), 6)
             |      AS clustering_coeff
             |  FROM nodes)
             |SELECT * FROM bk UNION ALL SELECT * FROM gl
             |ORDER BY segment""".stripMargin)),

    Q("scale_join_cardinality_audit", // CBO sanity table: the textbook
      // join-cardinality estimate |A⋈B| ≈ nA·nB/max(ndv) audited
      // against truth for four joins — two FK joins (estimate exact by
      // construction), one low-cardinality key and one date key (where
      // the independence assumption strains). The ACTUAL cardinality
      // never materializes a join: |A⋈B| on k = Σ_k cA(k)·cB(k), one
      // count rollup per side joined on the key grain — the scale-safe
      // way to audit an optimizer. All exact integers.
      (s, d) => {
        def side(df: DataFrame, k: String): (DataFrame, DataFrame) = {
          val c = df.groupBy(col(k).as("k")).agg(count(lit(1)).as("c"))
          (c, c.agg(sum("c").as("n"), count(lit(1)).as("ndv")))
        }
        def audit(name: String, l: DataFrame, lk: String,
            r: DataFrame, rk: String): DataFrame = {
          val (cl, sl) = side(l, lk)
          val (cr, sr) = side(r, rk)
          val actual = cl.join(cr, Seq("k"))
            .agg(coalesce(sum(cl("c") * cr("c")), lit(0L)).as("actual_rows"))
          sl.crossJoin(sr.select(col("n").as("n_r"), col("ndv").as("ndv_r")))
            .crossJoin(actual)
            .select(lit(name).as("join_name"), col("n").as("n_left"),
              col("n_r").as("n_right"), col("ndv").as("ndv_left"),
              col("ndv_r").as("ndv_right"),
              round(col("n").cast("double") * col("n_r")
                / greatest(col("ndv"), col("ndv_r")), 1).as("est_rows"),
              col("actual_rows"),
              round(col("actual_rows")
                / (col("n").cast("double") * col("n_r")
                  / greatest(col("ndv"), col("ndv_r"))), 4).as("ratio"))
        }
        val li = t(s, d, "lineitem")
        val o = t(s, d, "orders")
        audit("lineitem_orders_fk", li, "l_orderkey", o, "o_orderkey")
          .unionByName(audit("orders_customer_fk", o, "o_custkey",
            t(s, d, "customer"), "c_custkey"))
          .unionByName(audit("lineitem_self_qty",
            li.select(floor(col("l_quantity").cast("double"))
              .cast("long").as("q")), "q",
            li.select(floor(col("l_quantity").cast("double"))
              .cast("long").as("q")), "q"))
          .unionByName(audit("lineitem_orders_date",
            li.select(to_date(col("l_shipdate")).as("dt")), "dt",
            o.select(to_date(col("o_orderdate")).as("dt")), "dt"))
          .orderBy("join_name")
      },
      Some("""WITH
             |j1 AS (SELECT 'lineitem_orders_fk' AS join_name,
             |    (SELECT COUNT(*) FROM lineitem) AS n_left,
             |    (SELECT COUNT(*) FROM orders) AS n_right,
             |    (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem)
             |      AS ndv_left,
             |    (SELECT COUNT(DISTINCT o_orderkey) FROM orders)
             |      AS ndv_right,
             |    (SELECT CAST(SUM(a.c * b.c) AS BIGINT) FROM
             |      (SELECT l_orderkey k, COUNT(*) c FROM lineitem
             |        GROUP BY 1) a
             |      JOIN (SELECT o_orderkey k, COUNT(*) c FROM orders
             |        GROUP BY 1) b USING (k)) AS actual_rows),
             |j2 AS (SELECT 'orders_customer_fk',
             |    (SELECT COUNT(*) FROM orders),
             |    (SELECT COUNT(*) FROM customer),
             |    (SELECT COUNT(DISTINCT o_custkey) FROM orders),
             |    (SELECT COUNT(DISTINCT c_custkey) FROM customer),
             |    (SELECT CAST(SUM(a.c * b.c) AS BIGINT) FROM
             |      (SELECT o_custkey k, COUNT(*) c FROM orders
             |        GROUP BY 1) a
             |      JOIN (SELECT c_custkey k, COUNT(*) c FROM customer
             |        GROUP BY 1) b USING (k))),
             |j3 AS (SELECT 'lineitem_self_qty',
             |    (SELECT COUNT(*) FROM lineitem),
             |    (SELECT COUNT(*) FROM lineitem),
             |    (SELECT COUNT(DISTINCT CAST(FLOOR(CAST(l_quantity
             |      AS DOUBLE)) AS BIGINT)) FROM lineitem),
             |    (SELECT COUNT(DISTINCT CAST(FLOOR(CAST(l_quantity
             |      AS DOUBLE)) AS BIGINT)) FROM lineitem),
             |    (SELECT CAST(SUM(c * c) AS BIGINT) FROM
             |      (SELECT CAST(FLOOR(CAST(l_quantity AS DOUBLE))
             |        AS BIGINT) k, COUNT(*) c FROM lineitem
             |        GROUP BY 1))),
             |j4 AS (SELECT 'lineitem_orders_date',
             |    (SELECT COUNT(*) FROM lineitem),
             |    (SELECT COUNT(*) FROM orders),
             |    (SELECT COUNT(DISTINCT CAST(l_shipdate AS DATE))
             |      FROM lineitem),
             |    (SELECT COUNT(DISTINCT CAST(o_orderdate AS DATE))
             |      FROM orders),
             |    (SELECT CAST(SUM(a.c * b.c) AS BIGINT) FROM
             |      (SELECT CAST(l_shipdate AS DATE) k, COUNT(*) c
             |        FROM lineitem GROUP BY 1) a
             |      JOIN (SELECT CAST(o_orderdate AS DATE) k, COUNT(*) c
             |        FROM orders GROUP BY 1) b USING (k))),
             |u AS (SELECT * FROM j1 UNION ALL SELECT * FROM j2
             |  UNION ALL SELECT * FROM j3 UNION ALL SELECT * FROM j4)
             |SELECT join_name, n_left, n_right, ndv_left, ndv_right,
             |  ROUND(CAST(n_left AS DOUBLE) * n_right
             |    / greatest(ndv_left, ndv_right), 1) AS est_rows,
             |  actual_rows,
             |  ROUND(actual_rows / (CAST(n_left AS DOUBLE) * n_right
             |    / greatest(ndv_left, ndv_right)), 4) AS ratio
             |FROM u ORDER BY join_name""".stripMargin)),

    Q("orders_aging_buckets", // accounts-receivable aging: open
      // (status O) and pending (P) orders bucketed by age at the
      // snapshot instant (max order date, a 1-row broadcast) —
      // the month-end finance report. Exact integer day arithmetic;
      // bucket labels sort lexicographically by construction.
      (s, d) => {
        val o = t(s, d, "orders").select(col("o_orderstatus"),
          to_date(col("o_orderdate")).as("day"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
        val snap = o.agg(max("day").as("snap_day"))
        o.filter(col("o_orderstatus").isin("O", "P"))
          .crossJoin(broadcast(snap))
          .withColumn("age", datediff(col("snap_day"), col("day")))
          .withColumn("bucket",
            when(col("age") <= 30, "a_000_030")
              .when(col("age") <= 90, "b_031_090")
              .when(col("age") <= 365, "c_091_365")
              .otherwise("d_366_plus"))
          .groupBy("o_orderstatus", "bucket")
          .agg(count(lit(1)).as("n_orders"),
            (sum("cents").cast("double") / 100.0).as("open_value"))
          .orderBy("o_orderstatus", "bucket")
      },
      Some("""WITH o AS (SELECT o_orderstatus,
             |    CAST(o_orderdate AS DATE) AS day,
             |    CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
             |  FROM orders),
             |snap AS (SELECT MAX(day) AS snap_day FROM o)
             |SELECT o_orderstatus,
             |  CASE WHEN date_diff('day', day, snap_day) <= 30
             |      THEN 'a_000_030'
             |    WHEN date_diff('day', day, snap_day) <= 90
             |      THEN 'b_031_090'
             |    WHEN date_diff('day', day, snap_day) <= 365
             |      THEN 'c_091_365'
             |    ELSE 'd_366_plus' END AS bucket,
             |  COUNT(*) AS n_orders,
             |  CAST(SUM(cents) AS DOUBLE) / 100.0 AS open_value
             |FROM o, snap WHERE o_orderstatus IN ('O', 'P')
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("lineitem_process_capability", // Cp/Cpk process-capability
      // indices of shipped quantity against the [1, 50] spec window,
      // per line status — the SPC number that says whether a process
      // FITS its tolerances (the control charts only say whether it is
      // stable). μ/σ from exact integer moments; both indices are
      // single closed-form expressions over them.
      (s, d) => {
        val m = t(s, d, "lineitem")
          .select(col("l_linestatus"),
            floor(col("l_quantity").cast("double")).cast("long").as("q"))
          .groupBy("l_linestatus")
          .agg(count(lit(1)).as("n"), sum("q").as("s1"),
            sum(col("q") * col("q")).as("s2"))
        val mu = col("s1").cast("double") / col("n")
        val sig = sqrt(col("s2").cast("double") / col("n") - mu * mu)
        m.select(col("l_linestatus"), col("n"),
            round(mu, 4).as("mean_qty"), round(sig, 4).as("sigma"),
            round((lit(50.0) - 1.0) / (lit(6.0) * sig), 4).as("cp"),
            round(least(lit(50.0) - mu, mu - 1.0) / (lit(3.0) * sig), 4)
              .as("cpk"))
          .orderBy("l_linestatus")
      },
      Some("""WITH m AS (SELECT l_linestatus, COUNT(*) AS n,
             |    CAST(SUM(CAST(FLOOR(CAST(l_quantity AS DOUBLE))
             |      AS BIGINT)) AS BIGINT) AS s1,
             |    CAST(SUM(CAST(FLOOR(CAST(l_quantity AS DOUBLE))
             |      AS BIGINT) * CAST(FLOOR(CAST(l_quantity AS DOUBLE))
             |      AS BIGINT)) AS BIGINT) AS s2
             |  FROM lineitem GROUP BY 1)
             |SELECT l_linestatus, n,
             |  ROUND(CAST(s1 AS DOUBLE) / n, 4) AS mean_qty,
             |  ROUND(sqrt(CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE)
             |    / n) * (CAST(s1 AS DOUBLE) / n)), 4) AS sigma,
             |  ROUND((50.0 - 1.0) / (6.0 * sqrt(CAST(s2 AS DOUBLE) / n
             |    - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))),
             |    4) AS cp,
             |  ROUND(least(50.0 - CAST(s1 AS DOUBLE) / n,
             |    CAST(s1 AS DOUBLE) / n - 1.0)
             |    / (3.0 * sqrt(CAST(s2 AS DOUBLE) / n
             |      - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))),
             |    4) AS cpk
             |FROM m ORDER BY l_linestatus""".stripMargin)),

    Q("lineitem_revenue_bridge", // FP&A revenue bridge 1996→1997:
      // ΔRevenue decomposed into volume effect Σ(q₁−q₀)·p₀, price
      // effect Σ(p₁−p₀)·q₁ (an exact algebraic identity per matched
      // part — zero residual by construction), plus new/exited part
      // mix. Parts collapse to per-year (quantity, exact-cents
      // revenue) grain FIRST; prices are exact-integer ratios; the
      // only float sums are the bounded per-part effect products.
      (s, d) => {
        def yr(y: Int): DataFrame = t(s, d, "lineitem")
          .filter(year(to_date(col("l_shipdate"))) === y)
          .groupBy(col("l_partkey"))
          .agg(sum(col("l_quantity").cast("long")).as(s"q$y"),
            sum(round(col("l_extendedprice") * 100, 0).cast("long"))
              .as(s"c$y"))
        val j = yr(1996).join(yr(1997), Seq("l_partkey"), "full_outer")
        val p0 = col("c1996").cast("double") / col("q1996") / 100.0
        val p1 = col("c1997").cast("double") / col("q1997") / 100.0
        val eff = j.agg(
          sum(when(col("q1996").isNotNull, col("c1996")).otherwise(0L))
            .as("rev0c"),
          sum(when(col("q1997").isNotNull, col("c1997")).otherwise(0L))
            .as("rev1c"),
          sum(when(col("q1996").isNotNull && col("q1997").isNotNull,
            (col("q1997") - col("q1996")) * p0).otherwise(0.0))
            .as("vol_eff"),
          sum(when(col("q1996").isNotNull && col("q1997").isNotNull,
            (p1 - p0) * col("q1997")).otherwise(0.0)).as("price_eff"),
          sum(when(col("q1996").isNull, col("c1997")).otherwise(0L))
            .as("new_c"),
          sum(when(col("q1997").isNull, col("c1996")).otherwise(0L))
            .as("exit_c"))
        eff.select(explode(array(
            struct(lit("1_revenue_1996").as("component"),
              (col("rev0c").cast("double") / 100.0).as("amount")),
            struct(lit("2_volume_effect").as("component"),
              round(col("vol_eff"), 2).as("amount")),
            struct(lit("3_price_effect").as("component"),
              round(col("price_eff"), 2).as("amount")),
            struct(lit("4_new_parts").as("component"),
              (col("new_c").cast("double") / 100.0).as("amount")),
            struct(lit("5_exited_parts").as("component"),
              (-col("exit_c").cast("double") / 100.0).as("amount")),
            struct(lit("6_revenue_1997").as("component"),
              (col("rev1c").cast("double") / 100.0).as("amount"))))
            .as("e"))
          .select(col("e.component").as("component"),
            col("e.amount").as("amount"))
          .orderBy("component")
      },
      Some("""WITH y0 AS (SELECT l_partkey,
             |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q0,
             |    CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0)
             |      AS BIGINT)) AS BIGINT) AS c0
             |  FROM lineitem
             |  WHERE date_part('year', CAST(l_shipdate AS DATE)) = 1996
             |  GROUP BY 1),
             |y1 AS (SELECT l_partkey,
             |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q1,
             |    CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0)
             |      AS BIGINT)) AS BIGINT) AS c1
             |  FROM lineitem
             |  WHERE date_part('year', CAST(l_shipdate AS DATE)) = 1997
             |  GROUP BY 1),
             |j AS (SELECT * FROM y0 FULL OUTER JOIN y1 USING (l_partkey)),
             |eff AS (SELECT
             |    CAST(SUM(CASE WHEN q0 IS NOT NULL THEN c0 ELSE 0 END)
             |      AS BIGINT) AS rev0c,
             |    CAST(SUM(CASE WHEN q1 IS NOT NULL THEN c1 ELSE 0 END)
             |      AS BIGINT) AS rev1c,
             |    SUM(CASE WHEN q0 IS NOT NULL AND q1 IS NOT NULL THEN
             |      (q1 - q0) * (CAST(c0 AS DOUBLE) / q0 / 100.0)
             |      ELSE 0.0 END) AS vol_eff,
             |    SUM(CASE WHEN q0 IS NOT NULL AND q1 IS NOT NULL THEN
             |      (CAST(c1 AS DOUBLE) / q1 / 100.0
             |        - CAST(c0 AS DOUBLE) / q0 / 100.0) * q1
             |      ELSE 0.0 END) AS price_eff,
             |    CAST(SUM(CASE WHEN q0 IS NULL THEN c1 ELSE 0 END)
             |      AS BIGINT) AS new_c,
             |    CAST(SUM(CASE WHEN q1 IS NULL THEN c0 ELSE 0 END)
             |      AS BIGINT) AS exit_c
             |  FROM j)
             |SELECT component, amount FROM (
             |  SELECT '1_revenue_1996' AS component,
             |    CAST(rev0c AS DOUBLE) / 100.0 AS amount FROM eff
             |  UNION ALL SELECT '2_volume_effect', ROUND(vol_eff, 2)
             |    FROM eff
             |  UNION ALL SELECT '3_price_effect', ROUND(price_eff, 2)
             |    FROM eff
             |  UNION ALL SELECT '4_new_parts',
             |    CAST(new_c AS DOUBLE) / 100.0 FROM eff
             |  UNION ALL SELECT '5_exited_parts',
             |    -CAST(exit_c AS DOUBLE) / 100.0 FROM eff
             |  UNION ALL SELECT '6_revenue_1997',
             |    CAST(rev1c AS DOUBLE) / 100.0 FROM eff)
             |ORDER BY component""".stripMargin)),

    Q("supp_greedy_coverage", // greedy maximum-coverage selection:
      // pick 5 suppliers that together cover the most distinct parts —
      // the submodular (1−1/e) selection every eval-set / vendor-
      // consolidation plan runs. Five bounded rounds: each round one
      // anti-join + hash agg + a SINGLE-ROW argmax collect (the Lloyd
      // driver-state contract — part sets stay distributed, only the
      // winner's id crosses). Cumulative coverage is prev + marginal
      // gain (exact, no recount). The oracle unrolls the same five
      // rounds as MATERIALIZED CTEs.
      (s, d) => {
        import s.implicits._
        // the pair relation is read by every round: persist it once,
        // and eagerly checkpoint the covered set each round so round i
        // never re-executes rounds 1..i−1's unions (lazy chaining made
        // the 5 rounds quadratic in lineage: 5.2 s → measured A/B below)
        val sp = t(s, d, "lineitem")
          .select(col("l_suppkey").as("s"), col("l_partkey").as("p"))
          .distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val total = sp.select(countDistinct("p")).head().getLong(0)
        var covered = sp.select("p").limit(0)
        var picked = Seq.empty[Long]
        var cum = 0L
        // early-stop when no pickable supplier with uncovered parts
        // remains (tiny fixtures can exhaust before k rounds)
        val rows = (1 to 5).iterator.map { i =>
          val gains = sp
            .filter(if (picked.isEmpty) lit(true)
              else !col("s").isin(picked: _*))
            .join(covered, Seq("p"), "left_anti")
            .groupBy("s").agg(count(lit(1)).as("g"))
            .orderBy(col("g").desc, col("s")).limit(1).collect()
          gains.headOption.map { r =>
            val (win, gain) = (r.getLong(0), r.getLong(1))
            covered = covered
              .union(sp.filter(col("s") === win).select("p")).distinct()
              .localCheckpoint(true)
            picked :+= win
            cum += gain
            (i.toLong, win, gain, cum,
              BigDecimal(cum.toDouble / total).setScale(6,
                BigDecimal.RoundingMode.HALF_UP).toDouble)
          }
        }.takeWhile(_.isDefined).flatten.toSeq
        sp.unpersist(false)
        rows.toDF("round", "l_suppkey", "marginal_parts", "cum_parts",
          "cum_share").orderBy("round")
      },
      Some("""WITH sp AS MATERIALIZED (SELECT DISTINCT l_suppkey AS s,
             |    l_partkey AS p FROM lineitem),
             |tot AS (SELECT COUNT(DISTINCT p) AS t FROM sp),
             |p1 AS MATERIALIZED (SELECT s, COUNT(*) AS g FROM sp
             |  GROUP BY 1 ORDER BY g DESC, s LIMIT 1),
             |c1 AS MATERIALIZED (SELECT DISTINCT p FROM sp
             |  WHERE s = (SELECT s FROM p1)),
             |p2 AS MATERIALIZED (SELECT s, COUNT(*) AS g FROM sp
             |  WHERE s NOT IN (SELECT s FROM p1)
             |    AND p NOT IN (SELECT p FROM c1)
             |  GROUP BY 1 ORDER BY g DESC, s LIMIT 1),
             |c2 AS MATERIALIZED (SELECT p FROM c1 UNION
             |  SELECT p FROM sp WHERE s = (SELECT s FROM p2)),
             |p3 AS MATERIALIZED (SELECT s, COUNT(*) AS g FROM sp
             |  WHERE s NOT IN (SELECT s FROM p1 UNION ALL
             |      SELECT s FROM p2)
             |    AND p NOT IN (SELECT p FROM c2)
             |  GROUP BY 1 ORDER BY g DESC, s LIMIT 1),
             |c3 AS MATERIALIZED (SELECT p FROM c2 UNION
             |  SELECT p FROM sp WHERE s = (SELECT s FROM p3)),
             |p4 AS MATERIALIZED (SELECT s, COUNT(*) AS g FROM sp
             |  WHERE s NOT IN (SELECT s FROM p1 UNION ALL
             |      SELECT s FROM p2 UNION ALL SELECT s FROM p3)
             |    AND p NOT IN (SELECT p FROM c3)
             |  GROUP BY 1 ORDER BY g DESC, s LIMIT 1),
             |c4 AS MATERIALIZED (SELECT p FROM c3 UNION
             |  SELECT p FROM sp WHERE s = (SELECT s FROM p4)),
             |p5 AS MATERIALIZED (SELECT s, COUNT(*) AS g FROM sp
             |  WHERE s NOT IN (SELECT s FROM p1 UNION ALL
             |      SELECT s FROM p2 UNION ALL SELECT s FROM p3
             |      UNION ALL SELECT s FROM p4)
             |    AND p NOT IN (SELECT p FROM c4)
             |  GROUP BY 1 ORDER BY g DESC, s LIMIT 1),
             |r AS (
             |  SELECT 1 AS round, s, g FROM p1
             |  UNION ALL SELECT 2, s, g FROM p2
             |  UNION ALL SELECT 3, s, g FROM p3
             |  UNION ALL SELECT 4, s, g FROM p4
             |  UNION ALL SELECT 5, s, g FROM p5),
             |w AS (SELECT round, s, g,
             |    CAST(SUM(g) OVER (ORDER BY round
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
             |  FROM r)
             |SELECT round, s AS l_suppkey, g AS marginal_parts,
             |  cum AS cum_parts,
             |  ROUND(CAST(cum AS DOUBLE) / t, 6) AS cum_share
             |FROM w, tot ORDER BY round""".stripMargin)),

    Q("scale_sample_error_curve", // sampling-error calibration: the
      // deterministic md5 sample at 1/5/10/25/50% rates versus ground
      // truth for mean order value — the table that says how small a
      // pilot scan can be before its answer stops being trustworthy.
      // The hash value computes ONCE per row; the rate grid is an
      // inline explode (one scan serves all five rates); integer hash
      // thresholds (rate·65536/100, floored) are inlined identically.
      // Exact-cents sums make every mean an int/int division.
      (s, d) => {
        val o = t(s, d, "orders").select(
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"),
          conv(substring(md5(col("o_orderkey").cast("string")), 1, 4),
            16, 10).cast("long").as("hv"))
        val truth = o.agg(count(lit(1)).as("n_total"),
          sum("cents").as("c_total"))
        val grid = o.select(col("cents"), col("hv"), explode(typedLit(Seq(
            (1, 655L), (5, 3276L), (10, 6553L), (25, 16384L),
            (50, 32768L)))).as("r"))
          .select(col("cents"), col("hv"),
            col("r._1").as("rate_pct"), col("r._2").as("thr"))
        grid.filter(col("hv") < col("thr"))
          .groupBy("rate_pct")
          .agg(count(lit(1)).as("n_sample"), sum("cents").as("c_sample"))
          .crossJoin(broadcast(truth))
          .select(col("rate_pct").cast("long").as("rate_pct"),
            col("n_sample"),
            round(col("c_sample").cast("double") / col("n_sample")
              / 100.0, 4).as("est_mean"),
            round(col("c_total").cast("double") / col("n_total")
              / 100.0, 4).as("true_mean"),
            round(abs(col("c_sample").cast("double") / col("n_sample")
              - col("c_total").cast("double") / col("n_total"))
              / (col("c_total").cast("double") / col("n_total")), 6)
              .as("rel_error"))
          .orderBy("rate_pct")
      },
      Some("""WITH o AS (SELECT
             |    CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
             |    ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4))
             |      ::BIGINT AS hv
             |  FROM orders),
             |truth AS (SELECT COUNT(*) AS n_total,
             |    CAST(SUM(cents) AS BIGINT) AS c_total FROM o),
             |grid AS (SELECT cents, hv, r.rate_pct, r.thr
             |  FROM o, (VALUES (1, 655), (5, 3276), (10, 6553),
             |    (25, 16384), (50, 32768)) AS r(rate_pct, thr)),
             |s AS (SELECT rate_pct, COUNT(*) AS n_sample,
             |    CAST(SUM(cents) AS BIGINT) AS c_sample
             |  FROM grid WHERE hv < thr GROUP BY 1)
             |SELECT CAST(rate_pct AS BIGINT) AS rate_pct, n_sample,
             |  ROUND(CAST(c_sample AS DOUBLE) / n_sample / 100.0, 4)
             |    AS est_mean,
             |  ROUND(CAST(c_total AS DOUBLE) / n_total / 100.0, 4)
             |    AS true_mean,
             |  ROUND(abs(CAST(c_sample AS DOUBLE) / n_sample
             |    - CAST(c_total AS DOUBLE) / n_total)
             |    / (CAST(c_total AS DOUBLE) / n_total), 6) AS rel_error
             |FROM s, truth ORDER BY rate_pct""".stripMargin)),

    Q("events_stream_srm", // §2.9 + experimentation: the SRM guardrail
      // maintained as a COMPLETE-mode streaming aggregation — the
      // ≤5-row per-type variant-count state merges associatively, so
      // the streamed counts equal the batch ones exactly and the BATCH
      // oracle checks the STREAMING chi² bit-for-bit (the
      // events_stream_cms mergeable-summary pattern applied to the
      // experiment guardrail that should run ON the ingest path, not
      // after it).
      (s, d) => {
        withStreamPartitions(s) {
          val q = graft.streaming.EventStream
            .startSrmStream(s, d, "stream_srm_verify")
          q.awaitTermination(180000)
        }
        val chi = (col("n_a") - col("n_b")) * (col("n_a") - col("n_b"))
        s.table("stream_srm_verify")
          .select(col("event_type").as("segment"), col("n_a"), col("n_b"),
            round(chi.cast("double") / (col("n_a") + col("n_b")), 6)
              .as("chi2"),
            (round(chi.cast("double") / (col("n_a") + col("n_b")), 6)
              > 3.8415).as("srm_detected"))
          .orderBy("segment")
      },
      Some("""WITH seg AS (SELECT event_type AS segment,
             |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_a,
             |    CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_b
             |  FROM events GROUP BY 1)
             |SELECT segment, n_a, n_b,
             |  ROUND(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
             |    / (n_a + n_b), 6) AS chi2,
             |  ROUND(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
             |    / (n_a + n_b), 6) > 3.8415 AS srm_detected
             |FROM seg ORDER BY segment""".stripMargin)),

    Q("events_markov_stationary", // stationary distribution of the
      // journey Markov chain by POWER ITERATION run as 8 lazily-chained
      // relational rounds over the bounded 5×5 transition grain (the
      // pageRank/GD round pattern: π rounds to 6dp per round in BOTH
      // engines so float slack can't compound), compared against the
      // empirical source distribution — where the chain will spend its
      // time versus where it spends it today. Transition probabilities
      // are exact integer ratios; only π itself is float.
      (s, d) => {
        val tr = t(s, d, "events")
          .select(col("user_id"), col("event_type"), col("event_id"),
            unix_millis(col("ts")).as("ms"))
          .withColumn("prev", lag("event_type", 1).over(
            Window.partitionBy("user_id").orderBy("ms", "event_id")))
          .filter(col("prev").isNotNull)
          .groupBy(col("prev").as("s"), col("event_type").as("t_"))
          .agg(count(lit(1)).as("c"))
        val marg = tr.groupBy("s").agg(sum("c").as("cs"))
        val p = tr.join(marg, Seq("s"))
          .select(col("s"), col("t_"),
            (col("c").cast("double") / col("cs")).as("p"))
        val k = marg.select(count(lit(1)).cast("double").as("k"))
        var pi = marg.crossJoin(broadcast(k))
          .select(col("s"), round(lit(1.0) / col("k"), 6).as("pi"))
        (1 to 8).foreach { _ =>
          pi = p.join(pi, Seq("s"))
            .groupBy(col("t_").as("s"))
            .agg(round(sum(col("pi") * col("p")), 6).as("pi"))
        }
        val n = marg.agg(sum("cs").as("n_tr"))
        marg.crossJoin(broadcast(n))
          .select(col("s").as("event_type"),
            round(col("cs").cast("double") / col("n_tr"), 6)
              .as("empirical_share"))
          .join(pi.select(col("s").as("event_type"),
            col("pi").as("stationary_pi")), Seq("event_type"))
          .select(col("event_type"), col("empirical_share"),
            col("stationary_pi"),
            round(col("stationary_pi") - col("empirical_share"), 6)
              .as("diff"))
          .orderBy("event_type")
      },
      Some({
        def rnd(i: Int): String = {
          val prev = s"pi${i - 1}"
          s"""pi$i AS MATERIALIZED (SELECT p.t_ AS s,
             |  ROUND(SUM(q.pi * p.p), 6) AS pi
             |  FROM p JOIN $prev q ON p.s = q.s GROUP BY 1)""".stripMargin
        }
        s"""WITH tr AS MATERIALIZED (SELECT s, t_, COUNT(*) AS c FROM (
           |    SELECT LAG(event_type) OVER (PARTITION BY user_id
           |        ORDER BY epoch_ms(ts), event_id) AS s,
           |      event_type AS t_
           |    FROM events)
           |  WHERE s IS NOT NULL GROUP BY 1, 2),
           |marg AS MATERIALIZED (SELECT s, CAST(SUM(c) AS BIGINT) AS cs
           |  FROM tr GROUP BY 1),
           |p AS MATERIALIZED (SELECT tr.s, tr.t_,
           |    CAST(tr.c AS DOUBLE) / m.cs AS p
           |  FROM tr JOIN marg m ON tr.s = m.s),
           |kk AS (SELECT CAST(COUNT(*) AS DOUBLE) AS k FROM marg),
           |pi0 AS (SELECT s, ROUND(1.0 / k, 6) AS pi FROM marg, kk),
           |${(1 to 8).map(rnd).mkString(",\n")},
           |n AS (SELECT CAST(SUM(cs) AS BIGINT) AS n_tr FROM marg)
           |SELECT m.s AS event_type,
           |  ROUND(CAST(m.cs AS DOUBLE) / n.n_tr, 6) AS empirical_share,
           |  pi8.pi AS stationary_pi,
           |  ROUND(pi8.pi - ROUND(CAST(m.cs AS DOUBLE) / n.n_tr, 6), 6)
           |    AS diff
           |FROM marg m JOIN pi8 ON pi8.s = m.s, n
           |ORDER BY event_type""".stripMargin
      })),

    Q("dq_rule_audit", // declarative data-quality rule table — the
      // expectation-suite run (dbt tests / Great Expectations shape):
      // five single-scan range/sign rules plus one cross-table
      // temporal rule, each a (checked, violations, rate) row. The
      // fixture passes every range rule and FAILS the temporal one
      // massively (uncorrelated planted ship dates) — both regimes
      // populated. Exact integers; one scan for the five local rules.
      (s, d) => {
        val li = t(s, d, "lineitem")
        def rule(name: String, bad: Column): DataFrame =
          li.agg(count(lit(1)).as("n_checked"),
              sum(when(bad, 1L).otherwise(0L)).as("n_violations"))
            .select(lit(name).as("rule"), col("n_checked"),
              col("n_violations"))
        val local = rule("r1_discount_range",
            col("l_discount") < 0 || col("l_discount") > 0.1)
          .unionByName(rule("r2_tax_range",
            col("l_tax") < 0 || col("l_tax") > 0.08))
          .unionByName(rule("r3_qty_range",
            col("l_quantity") < 1 || col("l_quantity") > 50))
          .unionByName(rule("r4_price_positive",
            col("l_extendedprice") <= 0))
        val temporal = li
          .select(col("l_orderkey"), to_date(col("l_shipdate")).as("sd"))
          .join(t(s, d, "orders").select(col("o_orderkey"),
            to_date(col("o_orderdate")).as("od")),
            col("l_orderkey") === col("o_orderkey"))
          .agg(count(lit(1)).as("n_checked"),
            sum(when(col("sd") < col("od"), 1L).otherwise(0L))
              .as("n_violations"))
          .select(lit("r5_ship_after_order").as("rule"),
            col("n_checked"), col("n_violations"))
        local.unionByName(temporal)
          .select(col("rule"), col("n_checked"), col("n_violations"),
            round(col("n_violations").cast("double") / col("n_checked"),
              6).as("violation_rate"),
            (col("n_violations") === 0).as("passed"))
          .orderBy("rule")
      },
      Some("""WITH local AS (
             |  SELECT 'r1_discount_range' AS rule, COUNT(*) AS n_checked,
             |    CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1
             |      THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
             |  FROM lineitem
             |  UNION ALL
             |  SELECT 'r2_tax_range', COUNT(*),
             |    CAST(SUM(CASE WHEN l_tax < 0 OR l_tax > 0.08
             |      THEN 1 ELSE 0 END) AS BIGINT)
             |  FROM lineitem
             |  UNION ALL
             |  SELECT 'r3_qty_range', COUNT(*),
             |    CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
             |      THEN 1 ELSE 0 END) AS BIGINT)
             |  FROM lineitem
             |  UNION ALL
             |  SELECT 'r4_price_positive', COUNT(*),
             |    CAST(SUM(CASE WHEN l_extendedprice <= 0
             |      THEN 1 ELSE 0 END) AS BIGINT)
             |  FROM lineitem
             |  UNION ALL
             |  SELECT 'r5_ship_after_order', COUNT(*),
             |    CAST(SUM(CASE WHEN CAST(l_shipdate AS DATE)
             |      < CAST(o_orderdate AS DATE) THEN 1 ELSE 0 END)
             |      AS BIGINT)
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
             |SELECT rule, n_checked, n_violations,
             |  ROUND(CAST(n_violations AS DOUBLE) / n_checked, 6)
             |    AS violation_rate,
             |  n_violations = 0 AS passed
             |FROM local ORDER BY rule""".stripMargin)),

    Q("doc_training_triplets", // contrastive-training triplet mining —
      // the (anchor, positive, hard-ish negative) construction an
      // embedding fine-tune consumes: positives pair each near-dup
      // cluster member with its exemplar (the SHARED memoized CC
      // labels — NEVER all same-cluster pairs, the BLEU lesson);
      // negatives come from a deterministic modular hash of the anchor
      // id, kept only when they land outside the anchor's cluster (the
      // check is one left join against the same labels). First 20 by
      // anchor id.
      (s, d) => {
        val comp = dupClusterLabels(s, d)
        val docs = t(s, d, "documents").select(col("doc_id"), col("lang"))
        val maxId = docs.agg(max("doc_id").as("max_id"))
        val anchors = comp.filter(col("id") =!= col("cluster_id"))
          .crossJoin(broadcast(maxId))
          .select(col("id").as("anchor_id"),
            col("cluster_id").as("positive_id"),
            ((col("id") * 31 + 7) % (col("max_id") + 1))
              .as("negative_id"))
        anchors
          .join(comp.select(col("id").as("negative_id"),
            col("cluster_id").as("neg_cluster")), Seq("negative_id"),
            "left")
          .filter(col("neg_cluster").isNull
            || col("neg_cluster") =!= col("positive_id"))
          .join(docs.select(col("doc_id").as("anchor_id"),
            col("lang").as("anchor_lang")), Seq("anchor_id"))
          .join(docs.select(col("doc_id").as("negative_id"),
            col("lang").as("negative_lang")), Seq("negative_id"))
          .select(col("anchor_id"), col("positive_id"),
            col("negative_id"), col("anchor_lang"), col("negative_lang"))
          .orderBy("anchor_id").limit(20)
      },
      Some(s"""$dupClustersCte,
           |mx AS (SELECT MAX(doc_id) AS max_id FROM documents),
           |an AS (SELECT id AS anchor_id, cluster_id AS positive_id,
           |    (id * 31 + 7) % (max_id + 1) AS negative_id
           |  FROM comp, mx WHERE id <> cluster_id),
           |fl AS (SELECT an.*, c2.cluster_id AS neg_cluster
           |  FROM an LEFT JOIN comp c2 ON c2.id = an.negative_id
           |  WHERE c2.cluster_id IS NULL
           |    OR c2.cluster_id <> an.positive_id)
           |SELECT anchor_id, positive_id, negative_id,
           |  da.lang AS anchor_lang, dn.lang AS negative_lang
           |FROM fl JOIN documents da ON da.doc_id = fl.anchor_id
           |JOIN documents dn ON dn.doc_id = fl.negative_id
           |ORDER BY anchor_id LIMIT 20""".stripMargin)),

    Q("events_session_gap_sensitivity", // how many sessions exist at
      // gap thresholds 10/30/60 min — the sensitivity table that
      // justifies (or indicts) the 30-minute magic number every
      // sessionizer hardcodes. Sessions(τ) = users + gaps>τ, so the
      // whole table is ONE keyed lag window and ONE aggregation with
      // three conditional sums — no per-threshold re-sessionization.
      // Exact integers into one division per row.
      (s, d) => {
        val g = t(s, d, "events")
          .select(col("user_id"), col("event_id"),
            unix_millis(col("ts")).as("ms"))
          .withColumn("gap", col("ms") - lag("ms", 1).over(
            Window.partitionBy("user_id").orderBy("ms", "event_id")))
        val agg = g.agg(count(lit(1)).as("n_events"),
          countDistinct("user_id").as("n_users"),
          sum(when(col("gap") > 600000L, 1L).otherwise(0L)).as("b10"),
          sum(when(col("gap") > 1800000L, 1L).otherwise(0L)).as("b30"),
          sum(when(col("gap") > 3600000L, 1L).otherwise(0L)).as("b60"))
        agg.select(explode(array(
            struct(lit(10L).as("tau_min"),
              (col("n_users") + col("b10")).as("n_sessions"),
              col("n_events")),
            struct(lit(30L).as("tau_min"),
              (col("n_users") + col("b30")).as("n_sessions"),
              col("n_events")),
            struct(lit(60L).as("tau_min"),
              (col("n_users") + col("b60")).as("n_sessions"),
              col("n_events")))).as("r"))
          .select(col("r.tau_min").as("tau_min"),
            col("r.n_sessions").as("n_sessions"),
            round(col("r.n_events").cast("double") / col("r.n_sessions"),
              4).as("events_per_session"))
          .orderBy("tau_min")
      },
      Some("""WITH g AS (SELECT user_id,
             |    ms - LAG(ms) OVER (PARTITION BY user_id
             |      ORDER BY ms, event_id) AS gap
             |  FROM (SELECT user_id, event_id, epoch_ms(ts) AS ms
             |    FROM events)),
             |a AS (SELECT COUNT(*) AS n_events,
             |    COUNT(DISTINCT user_id) AS n_users,
             |    CAST(SUM(CASE WHEN gap > 600000 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS b10,
             |    CAST(SUM(CASE WHEN gap > 1800000 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS b30,
             |    CAST(SUM(CASE WHEN gap > 3600000 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS b60
             |  FROM g)
             |SELECT tau_min, n_sessions,
             |  ROUND(CAST(n_events AS DOUBLE) / n_sessions, 4)
             |    AS events_per_session
             |FROM (SELECT 10 AS tau_min, n_users + b10 AS n_sessions,
             |    n_events FROM a
             |  UNION ALL SELECT 30, n_users + b30, n_events FROM a
             |  UNION ALL SELECT 60, n_users + b60, n_events FROM a)
             |ORDER BY tau_min""".stripMargin)),

    Q("orders_simpson_audit", // Simpson's-paradox audit: the OLS slope
      // of customer order volume on account balance computed overall
      // versus POOLED WITHIN nations (the ANCOVA within-group slope) —
      // when the signs disagree, every country-blind regression on the
      // table is lying. Both slopes are closed forms over exact
      // integer-cents moments (per-nation and global), so the verdict
      // compares two deterministic doubles at 6dp.
      // Units: x = balance dollars via shift-then-truncate on exact
      // cents (shift makes the operand nonnegative, so Spark's
      // truncating DIV and DuckDB's flooring // agree; a constant
      // x-shift cannot change a slope); y = whole-dollar order values
      // summed per customer. Dollar units keep every moment product
      // inside a long under ANSI at any fixture scale, and both
      // slopes use the CENTERED forms (Σxy − ΣxΣy/n) so no n·Σ
      // product is ever materialized in integers.
      (s, d) => {
        val cust = t(s, d, "orders")
          .select(col("o_custkey"),
            expr("""cast(round(o_totalprice * 100, 0) as bigint)
                   | div 100""".stripMargin).as("yd"))
          .groupBy(col("o_custkey")).agg(sum("yd").as("y"))
          .join(t(s, d, "customer").select(col("c_custkey"),
            col("c_nationkey"),
            expr("""(cast(round(c_acctbal * 100, 0) as bigint)
                   | + 100000) div 100""".stripMargin).as("x")),
            col("o_custkey") === col("c_custkey"))
        val g = cust.groupBy("c_nationkey")
          .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("x") * col("y")).as("sxy"))
        val pooled = g.agg(sum("n").as("n_customers"),
          sum(col("sxy") - col("sx").cast("double") * col("sy") / col("n"))
            .as("wxy"),
          sum(col("sxx") - col("sx").cast("double") * col("sx") / col("n"))
            .as("wxx"),
          sum("sx").as("tsx"), sum("sy").as("tsy"),
          sum("sxx").as("tsxx"), sum("sxy").as("tsxy"))
        val overallNum = col("tsxy").cast("double") -
          col("tsx").cast("double") * col("tsy") / col("n_customers")
        val overallDen = col("tsxx").cast("double") -
          col("tsx").cast("double") * col("tsx") / col("n_customers")
        val overall = overallNum / overallDen
        pooled.select(col("n_customers"),
          round(overall, 6).as("overall_slope"),
          round(col("wxy") / col("wxx"), 6).as("within_slope"),
          (round(overall, 6) * round(col("wxy") / col("wxx"), 6) < 0)
            .as("sign_reversed"))
      },
      Some("""WITH yv AS (SELECT o_custkey,
             |    CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) // 100
             |      AS yd
             |  FROM orders),
             |cust AS (SELECT yv.o_custkey,
             |    CAST(SUM(yd) AS BIGINT) AS y,
             |    MAX(c.c_nationkey) AS c_nationkey,
             |    MAX((CAST(ROUND(c.c_acctbal * 100, 0) AS BIGINT)
             |      + 100000) // 100) AS x
             |  FROM yv JOIN customer c ON yv.o_custkey = c.c_custkey
             |  GROUP BY 1),
             |g AS (SELECT c_nationkey, COUNT(*) AS n,
             |    CAST(SUM(x) AS BIGINT) AS sx,
             |    CAST(SUM(y) AS BIGINT) AS sy,
             |    CAST(SUM(x * x) AS BIGINT) AS sxx,
             |    CAST(SUM(x * y) AS BIGINT) AS sxy
             |  FROM cust GROUP BY 1),
             |pl AS (SELECT CAST(SUM(n) AS BIGINT) AS n_customers,
             |    SUM(sxy - CAST(sx AS DOUBLE) * sy / n) AS wxy,
             |    SUM(sxx - CAST(sx AS DOUBLE) * sx / n) AS wxx,
             |    CAST(SUM(sx) AS BIGINT) AS tsx,
             |    CAST(SUM(sy) AS BIGINT) AS tsy,
             |    CAST(SUM(sxx) AS BIGINT) AS tsxx,
             |    CAST(SUM(sxy) AS BIGINT) AS tsxy
             |  FROM g)
             |SELECT n_customers,
             |  ROUND((CAST(tsxy AS DOUBLE)
             |      - CAST(tsx AS DOUBLE) * tsy / n_customers)
             |    / (CAST(tsxx AS DOUBLE)
             |      - CAST(tsx AS DOUBLE) * tsx / n_customers), 6)
             |    AS overall_slope,
             |  ROUND(wxy / wxx, 6) AS within_slope,
             |  ROUND((CAST(tsxy AS DOUBLE)
             |      - CAST(tsx AS DOUBLE) * tsy / n_customers)
             |    / (CAST(tsxx AS DOUBLE)
             |      - CAST(tsx AS DOUBLE) * tsx / n_customers), 6)
             |    * ROUND(wxy / wxx, 6) < 0 AS sign_reversed
             |FROM pl""".stripMargin)),

    Q("emb_hard_negatives", // hard-negative mining for metric
      // learning: for each of 10 probe anchors, the HIGHEST-cosine
      // embedding whose document carries a DIFFERENT language label —
      // the pairs that actually move a contrastive loss (random
      // negatives are trivially far). 10 anchors broadcast against
      // the corpus (a bounded probe fan-out, the silhouette shape,
      // never corpus×corpus); ranking on the ROUNDED cosine with an
      // id tie-break.
      (s, d) => {
        val lang = t(s, d, "documents")
          .select(col("doc_id").as("vec_id"), col("lang"))
        val emb = t(s, d, "embeddings").join(lang, Seq("vec_id"))
        val anchors = emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("anchor_id"),
            col("embedding").as("a_emb"), col("lang").as("anchor_lang"))
        val scored = emb.crossJoin(broadcast(anchors))
          .filter(col("lang") =!= col("anchor_lang"))
          .select(col("anchor_id"), col("anchor_lang"),
            col("vec_id").as("negative_id"),
            col("lang").as("negative_lang"),
            round(graft.functions.VectorFunctions
              .cosine(col("a_emb"), col("embedding")), 6).as("cos"))
        val w = Window.partitionBy("anchor_id")
          .orderBy(col("cos").desc, col("negative_id"))
        scored.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("anchor_id"), col("anchor_lang"),
            col("negative_id"), col("negative_lang"), col("cos"))
          .orderBy("anchor_id")
      },
      Some("""WITH lang AS (SELECT doc_id AS vec_id, lang
             |  FROM documents),
             |emb AS (SELECT e.vec_id, e.embedding, l.lang
             |  FROM embeddings e JOIN lang l USING (vec_id)),
             |an AS (SELECT vec_id AS anchor_id, embedding AS a_emb,
             |    lang AS anchor_lang
             |  FROM emb WHERE vec_id < 10),
             |sc AS (SELECT an.anchor_id, an.anchor_lang,
             |    e.vec_id AS negative_id, e.lang AS negative_lang,
             |    ROUND(
             |      list_sum(list_transform(range(1, 65), i ->
             |        CAST(an.a_emb[i] AS DOUBLE)
             |          * CAST(e.embedding[i] AS DOUBLE)))
             |      / (sqrt(list_sum(list_transform(range(1, 65), i ->
             |          CAST(an.a_emb[i] AS DOUBLE)
             |            * CAST(an.a_emb[i] AS DOUBLE))))
             |        * sqrt(list_sum(list_transform(range(1, 65), i ->
             |          CAST(e.embedding[i] AS DOUBLE)
             |            * CAST(e.embedding[i] AS DOUBLE)))))
             |      , 6) AS cos
             |  FROM emb e, an WHERE e.lang <> an.anchor_lang),
             |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
             |    ORDER BY cos DESC, negative_id) AS rn
             |  FROM sc)
             |SELECT anchor_id, anchor_lang, negative_id, negative_lang,
             |  cos
             |FROM rk WHERE rn = 1 ORDER BY anchor_id""".stripMargin)),

    Q("orders_forecast_baselines", // beat-the-baseline table: MAE of
      // the three forecasts every model must outrun — naive (last
      // month), seasonal naive (same month last year), expanding mean —
      // backtested over the monthly revenue series. One bounded month
      // rollup, keyed lags, exact-cents errors; months without a
      // forecast (first month / first year) are excluded per method,
      // and n_evaluated says so.
      (s, d) => {
        val m = t(s, d, "orders")
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
          .agg(sum(round(col("o_totalprice") * 100, 0).cast("long"))
            .as("c"))
        val w = Window.orderBy("ym")
        val wc = w.rowsBetween(Window.unboundedPreceding, -1)
        val f = m
          .withColumn("f_naive", lag("c", 1).over(w))
          .withColumn("f_seasonal", lag("c", 12).over(w))
          .withColumn("f_mean", expr(
            """sum(c) over (order by ym rows between unbounded preceding
              | and 1 preceding) div
              | count(1) over (order by ym rows between unbounded
              | preceding and 1 preceding)""".stripMargin))
        // exact-cents MAE: errors are long cents; the cent rounding is
        // the integer round-half-up (2e+n) div (2n) — no float ROUND
        def mae(fc: Column): (Column, Column) =
          (sum(when(fc.isNotNull, abs(col("c") - fc))),
            sum(when(fc.isNotNull, 1L).otherwise(0L)))
        val (e1, n1) = mae(col("f_naive"))
        val (e2, n2) = mae(col("f_seasonal"))
        val (e3, n3) = mae(col("f_mean"))
        def cents(e: String, n: String): Column =
          expr(s"cast((2 * $e + $n) div (2 * $n) as double) / 100.0")
        f.agg(e1.as("e1"), n1.as("n1"), e2.as("e2"), n2.as("n2"),
            e3.as("e3"), n3.as("n3"))
          .select(explode(array(
            struct(lit("1_naive_last_month").as("method"),
              col("n1").as("n_evaluated"),
              cents("e1", "n1").as("mae")),
            struct(lit("2_seasonal_naive_12m").as("method"),
              col("n2").as("n_evaluated"),
              cents("e2", "n2").as("mae")),
            struct(lit("3_expanding_mean").as("method"),
              col("n3").as("n_evaluated"),
              cents("e3", "n3").as("mae"))))
            .as("r"))
          .select(col("r.method").as("method"),
            col("r.n_evaluated").as("n_evaluated"),
            col("r.mae").as("mae"))
          .orderBy("method")
      },
      Some("""WITH m AS (SELECT strftime(o_orderdate, '%Y-%m') AS ym,
             |    CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
             |      AS BIGINT) AS c
             |  FROM orders GROUP BY 1),
             |f AS (SELECT ym, c,
             |    LAG(c, 1) OVER w AS f_naive,
             |    LAG(c, 12) OVER w AS f_seasonal,
             |    SUM(c) OVER (ORDER BY ym ROWS BETWEEN UNBOUNDED
             |      PRECEDING AND 1 PRECEDING)
             |      // COUNT(*) OVER (ORDER BY ym ROWS BETWEEN UNBOUNDED
             |      PRECEDING AND 1 PRECEDING) AS f_mean
             |  FROM m WINDOW w AS (ORDER BY ym)),
             |a AS (SELECT
             |    CAST(SUM(CASE WHEN f_naive IS NOT NULL THEN
             |      abs(c - f_naive) END) AS BIGINT) AS e1,
             |    CAST(SUM(CASE WHEN f_naive IS NOT NULL THEN 1 ELSE 0
             |      END) AS BIGINT) AS n1,
             |    CAST(SUM(CASE WHEN f_seasonal IS NOT NULL THEN
             |      abs(c - f_seasonal) END) AS BIGINT) AS e2,
             |    CAST(SUM(CASE WHEN f_seasonal IS NOT NULL THEN 1
             |      ELSE 0 END) AS BIGINT) AS n2,
             |    CAST(SUM(CASE WHEN f_mean IS NOT NULL THEN
             |      abs(c - f_mean) END) AS BIGINT) AS e3,
             |    CAST(SUM(CASE WHEN f_mean IS NOT NULL THEN 1
             |      ELSE 0 END) AS BIGINT) AS n3
             |  FROM f)
             |SELECT method, n_evaluated, mae FROM (
             |  SELECT '1_naive_last_month' AS method, n1 AS n_evaluated,
             |    CAST((2 * e1 + n1) // (2 * n1) AS DOUBLE) / 100.0
             |      AS mae FROM a
             |  UNION ALL SELECT '2_seasonal_naive_12m', n2,
             |    CAST((2 * e2 + n2) // (2 * n2) AS DOUBLE) / 100.0 FROM a
             |  UNION ALL SELECT '3_expanding_mean', n3,
             |    CAST((2 * e3 + n3) // (2 * n3) AS DOUBLE) / 100.0 FROM a)
             |ORDER BY method""".stripMargin)),

    Q("scale_partition_skew_audit", // shuffle-planning diagnostic:
      // bucket-load distribution under 32-way hash partitioning for
      // three candidate keys — max/avg skew factor and the load Gini —
      // the table that says which key can be hashed flat and which
      // needs salting BEFORE a job pays for the lesson. Key hash =
      // the portable integer family (so the audit itself is
      // oracle-checkable); Gini over the bounded 32-bucket grain from
      // exact integer loads.
      (s, d) => {
        val li = t(s, d, "lineitem")
        def loads(name: String, k: Column): DataFrame = li
          .select((((lit(1000003L) * k + 17L) % 2147483647L) % 32)
            .as("b"))
          .groupBy("b").agg(count(lit(1)).as("n"))
          .select(lit(name).as("part_key"), col("b"), col("n"))
        val all = loads("l_orderkey", col("l_orderkey"))
          .unionByName(loads("l_partkey", col("l_partkey")))
          .unionByName(loads("l_suppkey", col("l_suppkey")))
        val w = Window.partitionBy("part_key").orderBy("n", "b")
        val g = all
          .withColumn("rk", row_number().over(w).cast("long"))
          .groupBy("part_key")
          .agg(count(lit(1)).as("n_buckets"), sum("n").as("total"),
            max("n").as("max_load"),
            sum(col("rk") * col("n")).as("srn"))
        g.select(col("part_key"), col("n_buckets"),
            round(col("max_load").cast("double")
              / (col("total").cast("double") / col("n_buckets")), 4)
              .as("skew_factor"),
            round((lit(2.0) * col("srn")
              / (col("n_buckets").cast("double") * col("total")))
              - (col("n_buckets") + 1).cast("double") / col("n_buckets"),
              6).as("load_gini"))
          .orderBy("part_key")
      },
      Some("""WITH li AS (SELECT
             |    ((1000003 * l_orderkey + 17) % 2147483647) % 32 AS bo,
             |    ((1000003 * l_partkey + 17) % 2147483647) % 32 AS bp,
             |    ((1000003 * l_suppkey + 17) % 2147483647) % 32 AS bs
             |  FROM lineitem),
             |all_ AS (
             |  SELECT 'l_orderkey' AS part_key, bo AS b, COUNT(*) AS n
             |  FROM li GROUP BY 2
             |  UNION ALL
             |  SELECT 'l_partkey', bp, COUNT(*) FROM li GROUP BY 2
             |  UNION ALL
             |  SELECT 'l_suppkey', bs, COUNT(*) FROM li GROUP BY 2),
             |r AS (SELECT part_key, b, n,
             |    CAST(ROW_NUMBER() OVER (PARTITION BY part_key
             |      ORDER BY n, b) AS BIGINT) AS rk
             |  FROM all_),
             |g AS (SELECT part_key, COUNT(*) AS n_buckets,
             |    CAST(SUM(n) AS BIGINT) AS total,
             |    CAST(MAX(n) AS BIGINT) AS max_load,
             |    CAST(SUM(rk * n) AS BIGINT) AS srn
             |  FROM r GROUP BY 1)
             |SELECT part_key, n_buckets,
             |  ROUND(CAST(max_load AS DOUBLE)
             |    / (CAST(total AS DOUBLE) / n_buckets), 4) AS skew_factor,
             |  ROUND((2.0 * srn / (CAST(n_buckets AS DOUBLE) * total))
             |    - CAST(n_buckets + 1 AS DOUBLE) / n_buckets, 6)
             |    AS load_gini
             |FROM g ORDER BY part_key""".stripMargin)),

    Q("events_error_budget_burn", // SRE error-budget burn-rate monitor
      // (the Google multiwindow page rule): daily error share against
      // the 21% budget, burn rates over the 1-day and rolling 7-day
      // windows, page when BOTH run hot (fast burn confirmed by a
      // non-cool slow window — the design that kills alert flaps;
      // thresholds 1.1/0.95 put 3 of 30 fixture days in the paging
      // regime). Counts are
      // exact integers; the 7-day window rides the bounded day grain;
      // the page verdict tests ROUNDED burn rates.
      (s, d) => {
        val daily = t(s, d, "events")
          .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("event_type") === "error", 1L).otherwise(0L))
              .as("e"))
        val w7 = Window.orderBy("day").rowsBetween(-6, 0)
        val b1 = round(col("e").cast("double") / col("n") / 0.21, 4)
        val b7 = round(col("e7").cast("double") / col("n7") / 0.21, 4)
        daily
          .withColumn("n7", sum("n").over(w7))
          .withColumn("e7", sum("e").over(w7))
          .select(col("day"), col("n").as("n_events"),
            col("e").as("n_errors"),
            round(col("e").cast("double") / col("n"), 6).as("err_share"),
            b1.as("burn_1d"), b7.as("burn_7d"),
            (b1 > 1.1 && b7 > 0.95).as("page_alert"))
          .orderBy("day")
      },
      Some("""WITH daily AS (SELECT strftime(ts, '%Y-%m-%d') AS day,
             |    COUNT(*) AS n,
             |    CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0
             |      END) AS BIGINT) AS e
             |  FROM events GROUP BY 1),
             |r AS (SELECT day, n, e,
             |    CAST(SUM(n) OVER w7 AS BIGINT) AS n7,
             |    CAST(SUM(e) OVER w7 AS BIGINT) AS e7
             |  FROM daily WINDOW w7 AS (ORDER BY day
             |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
             |SELECT day, n AS n_events, e AS n_errors,
             |  ROUND(CAST(e AS DOUBLE) / n, 6) AS err_share,
             |  ROUND(CAST(e AS DOUBLE) / n / 0.21, 4) AS burn_1d,
             |  ROUND(CAST(e7 AS DOUBLE) / n7 / 0.21, 4) AS burn_7d,
             |  ROUND(CAST(e AS DOUBLE) / n / 0.21, 4) > 1.1
             |    AND ROUND(CAST(e7 AS DOUBLE) / n7 / 0.21, 4) > 0.95
             |    AS page_alert
             |FROM r ORDER BY day""".stripMargin)),

    Q("part_xyz_classes", // XYZ demand-variability classification —
      // ABC's inventory-planning twin (supp_abc_classes ranks value;
      // XYZ ranks forecastability): per part, the CV of DEMAND SIZES
      // over its nonzero demand weeks (the Croston convention — on a
      // complete grid this intermittent fixture is all-Z, cv ≈ 4,
      // which classifies nothing), classes on the ROUNDED cv
      // (X < 0.5 steady, Y < 0.7, Z erratic — cuts chosen where the
      // fixture actually splits: 355/1471/174). Everything up to the
      // final cv sqrt is exact integers; the class rollup is the
      // bounded 3-row report.
      (s, d) => {
        val wk = t(s, d, "lineitem")
          .select(col("l_partkey"),
            expr("""datediff(cast(l_shipdate as date),
                   | cast('1995-01-01' as date)) div 7""".stripMargin)
              .as("w"),
            col("l_quantity").cast("long").as("q"))
          .groupBy("l_partkey", "w").agg(sum("q").as("qd"))
        val cv = wk.groupBy("l_partkey")
          .agg(count(lit(1)).as("nw"), sum("qd").as("s1"),
            sum(col("qd") * col("qd")).as("s2"))
          .select(col("l_partkey"),
            round(sqrt((col("nw") * col("s2") - col("s1") * col("s1"))
              .cast("double")) / col("s1"), 4).as("cv"))
        cv.select(col("cv"),
            when(col("cv") < 0.5, "X_steady")
              .when(col("cv") < 0.7, "Y_variable")
              .otherwise("Z_erratic").as("xyz_class"))
          .groupBy("xyz_class")
          .agg(count(lit(1)).as("n_parts"),
            round(avg("cv"), 4).as("avg_cv"))
          .orderBy("xyz_class")
      },
      Some("""WITH wk AS (SELECT l_partkey,
             |    date_diff('day', DATE '1995-01-01',
             |      CAST(l_shipdate AS DATE)) // 7 AS w,
             |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qd
             |  FROM lineitem GROUP BY 1, 2),
             |cv AS (SELECT l_partkey,
             |    ROUND(sqrt(CAST(nw * s2 - s1 * s1 AS DOUBLE)) / s1, 4)
             |      AS cv
             |  FROM (SELECT l_partkey, COUNT(*) AS nw,
             |      CAST(SUM(qd) AS BIGINT) AS s1,
             |      CAST(SUM(qd * qd) AS BIGINT) AS s2
             |    FROM wk GROUP BY 1))
             |SELECT CASE WHEN cv < 0.5 THEN 'X_steady'
             |    WHEN cv < 0.7 THEN 'Y_variable'
             |    ELSE 'Z_erratic' END AS xyz_class,
             |  COUNT(*) AS n_parts, ROUND(AVG(cv), 4) AS avg_cv
             |FROM cv GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("dq_key_density_audit", // surrogate-key hole detection: bucket
      // the key space into 64 ranges and flag ranges whose row count
      // runs ≥10% under the uniform expectation — how a failed
      // backfill or a dropped tenant shows up BEFORE anyone queries
      // the missing rows. The fixture's keys are perfectly contiguous
      // (density 1.0 — the audit would certify a clean table), so a
      // data-loss incident is SIMULATED deterministically (keys
      // 5000..5499 plus every key ≡ 0 mod 1000 deleted — one
      // contiguous hole the audit must flag, scattered losses it must
      // absorb); the bucket GRID is generated, not grouped-from-rows —
      // a fully deleted bucket emits no rows and would otherwise be
      // invisible to its own audit. Flag test is exact integers
      // (640·n < 9·total).
      (s, d) => {
        val sim = t(s, d, "orders").select(col("o_orderkey"))
          .filter(!(col("o_orderkey") >= 5000 && col("o_orderkey") < 5500)
            && col("o_orderkey") % 1000 =!= 0)
        val b = sim.agg(min("o_orderkey").as("k0"),
          max("o_orderkey").as("k1"), count(lit(1)).as("total"))
        val counts = sim.crossJoin(broadcast(b))
          .select(expr("least((o_orderkey - k0) * 64 div (k1 - k0 + 1), 63)")
            .as("bucket"))
          .groupBy("bucket").agg(count(lit(1)).as("n_rows"))
        // a FULLY deleted bucket never appears in the rollup — the grid
        // left-join is what makes the audit see the worst holes at all
        b.select(col("total"),
            explode(sequence(lit(0L), lit(63L))).as("bucket"))
          .join(counts, Seq("bucket"), "left")
          .select(col("bucket"),
            coalesce(col("n_rows"), lit(0L)).as("n_rows"),
            expr("total div 64").as("expected_n"),
            (expr("total div 64") - coalesce(col("n_rows"), lit(0L)))
              .as("deficit"),
            (coalesce(col("n_rows"), lit(0L)) * 640 < col("total") * 9)
              .as("hole_flagged"))
          .orderBy("bucket")
      },
      Some("""WITH sim AS (SELECT o_orderkey FROM orders
             |  WHERE NOT (o_orderkey >= 5000 AND o_orderkey < 5500)
             |    AND o_orderkey % 1000 <> 0),
             |b AS (SELECT MIN(o_orderkey) AS k0, MAX(o_orderkey) AS k1,
             |    COUNT(*) AS total FROM sim),
             |g AS (SELECT least((o_orderkey - k0) * 64 // (k1 - k0 + 1),
             |      63) AS bucket, COUNT(*) AS n_rows
             |  FROM sim, b GROUP BY 1),
             |grid AS (SELECT i AS bucket, total
             |  FROM b, unnest(range(0, 64)) AS r(i))
             |SELECT bucket, COALESCE(n_rows, 0) AS n_rows,
             |  total // 64 AS expected_n,
             |  total // 64 - COALESCE(n_rows, 0) AS deficit,
             |  COALESCE(n_rows, 0) * 640 < total * 9 AS hole_flagged
             |FROM grid LEFT JOIN g USING (bucket) ORDER BY bucket""".stripMargin)),

    Q("orders_median_polish", // Tukey median polish of the year ×
      // priority revenue matrix — the robust two-way decomposition
      // (row effects + column effects + residuals) that ANOVA's means
      // can't give under outliers. The 7×5 matrix grain is bounded;
      // both sweep dimensions have ODD length, so every median is an
      // exact matrix element and the whole two-iteration polish runs
      // in EXACT integer cents — no rounding protocol anywhere, the
      // residuals are bit-identical by construction.
      (s, d) => {
        val cells = t(s, d, "orders")
          .filter(year(to_date(col("o_orderdate"))) <= 2001)
          .groupBy(year(to_date(col("o_orderdate"))).cast("long").as("yr"),
            col("o_orderpriority").as("pri"))
          .agg(sum(round(col("o_totalprice") * 100, 0).cast("long"))
            .as("v"))
        def sweep(df: DataFrame, key: String, vc: String,
            out: String): DataFrame = {
          val med = df.groupBy(key)
            .agg(expr(s"cast(percentile($vc, 0.5) as long)").as(out))
          df.join(med, Seq(key))
            .withColumn(vc, col(vc) - col(out))
        }
        val r1 = sweep(cells, "yr", "v", "re1")
        val c1 = sweep(r1, "pri", "v", "ce1")
        val r2 = sweep(c1, "yr", "v", "re2")
        val c2 = sweep(r2, "pri", "v", "ce2")
        c2.select(col("yr"), col("pri"),
            ((col("re1") + col("re2")).cast("double") / 100.0)
              .as("year_effect"),
            ((col("ce1") + col("ce2")).cast("double") / 100.0)
              .as("priority_effect"),
            (col("v").cast("double") / 100.0).as("residual"))
          .orderBy("yr", "pri")
      },
      Some("""WITH cells AS (SELECT
             |    date_part('year', CAST(o_orderdate AS DATE)) AS yr,
             |    o_orderpriority AS pri,
             |    CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
             |      AS BIGINT) AS v
             |  FROM orders
             |  WHERE date_part('year', CAST(o_orderdate AS DATE)) <= 2001
             |  GROUP BY 1, 2),
             |m1 AS (SELECT yr, CAST(quantile_cont(v, 0.5) AS BIGINT)
             |    AS re1 FROM cells GROUP BY 1),
             |r1 AS (SELECT c.yr, c.pri, c.v - m1.re1 AS v, m1.re1
             |  FROM cells c JOIN m1 USING (yr)),
             |m2 AS (SELECT pri, CAST(quantile_cont(v, 0.5) AS BIGINT)
             |    AS ce1 FROM r1 GROUP BY 1),
             |c1 AS (SELECT r1.yr, r1.pri, r1.v - m2.ce1 AS v, r1.re1,
             |    m2.ce1
             |  FROM r1 JOIN m2 USING (pri)),
             |m3 AS (SELECT yr, CAST(quantile_cont(v, 0.5) AS BIGINT)
             |    AS re2 FROM c1 GROUP BY 1),
             |r2 AS (SELECT c1.yr, c1.pri, c1.v - m3.re2 AS v, c1.re1,
             |    c1.ce1, m3.re2
             |  FROM c1 JOIN m3 USING (yr)),
             |m4 AS (SELECT pri, CAST(quantile_cont(v, 0.5) AS BIGINT)
             |    AS ce2 FROM r2 GROUP BY 1),
             |c2 AS (SELECT r2.yr, r2.pri, r2.v - m4.ce2 AS v, r2.re1,
             |    r2.ce1, r2.re2, m4.ce2
             |  FROM r2 JOIN m4 USING (pri))
             |SELECT CAST(yr AS BIGINT) AS yr, pri,
             |  CAST(re1 + re2 AS DOUBLE) / 100.0 AS year_effect,
             |  CAST(ce1 + ce2 AS DOUBLE) / 100.0 AS priority_effect,
             |  CAST(v AS DOUBLE) / 100.0 AS residual
             |FROM c2 ORDER BY yr, pri""".stripMargin)),

    Q("orders_chow_test", // Chow structural-break test: do the first
      // and second halves of the monthly revenue series follow the
      // SAME line? F = ((SSRp − SSR1 − SSR2)/2) / ((SSR1+SSR2)/(n−4)),
      // each SSR the closed form Syy − Sxy²/Sxx over exact integer
      // moments of the bounded month grain — the formal companion to
      // the segmented-trend fit. Verdict against the inlined
      // F(2, n−4) ≈ 3.11 critical value on the rounded statistic.
      (s, d) => {
        val m = t(s, d, "orders")
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
          .agg(sum(round(col("o_totalprice") * 100, 0).cast("long"))
            .as("c"))
        val w = Window.orderBy("ym")
        val xi = m.withColumn("x",
            row_number().over(w).cast("long") - 1)
          .withColumn("half",
            when(col("x") < 40, 1L).otherwise(2L))
        def mo(grp: Column): DataFrame = xi.groupBy(grp.as("h"))
          .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("c").as("sy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("x") * col("c")).as("sxy"),
            sum(col("c").cast("double") * col("c")).as("syy"))
        val ssr = (df: DataFrame) => df.select(col("h"), col("n"),
          (col("syy") - col("sy").cast("double") * col("sy") / col("n")
            - (col("sxy").cast("double")
                - col("sx").cast("double") * col("sy") / col("n"))
              * (col("sxy").cast("double")
                - col("sx").cast("double") * col("sy") / col("n"))
              / (col("sxx").cast("double")
                - col("sx").cast("double") * col("sx") / col("n")))
            .as("ssr"),
          ((col("sxy").cast("double")
              - col("sx").cast("double") * col("sy") / col("n"))
            / (col("sxx").cast("double")
              - col("sx").cast("double") * col("sx") / col("n")))
            .as("slope"))
        val parts = ssr(mo(col("half")))
        val pool = ssr(mo(lit(0L)))
        val agg = parts.groupBy().agg(sum("n").as("n_months"),
            sum("ssr").as("ssr12"),
            max(when(col("h") === 1, round(col("slope") / 100.0, 4)))
              .as("slope_1"),
            max(when(col("h") === 2, round(col("slope") / 100.0, 4)))
              .as("slope_2"))
          .crossJoin(broadcast(pool.select(col("ssr").as("ssrp"))))
        val f = ((col("ssrp") - col("ssr12")) / 2.0) /
          (col("ssr12") / (col("n_months") - 4))
        agg.select(col("n_months"), col("slope_1"), col("slope_2"),
          round(f, 4).as("f_stat"),
          (round(f, 4) > 3.11).as("structural_break"))
      },
      Some("""WITH m AS (SELECT strftime(o_orderdate, '%Y-%m') AS ym,
             |    CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
             |      AS BIGINT) AS c
             |  FROM orders GROUP BY 1),
             |xi AS (SELECT c,
             |    CAST(ROW_NUMBER() OVER (ORDER BY ym) AS BIGINT) - 1
             |      AS x
             |  FROM m),
             |hs AS (SELECT CASE WHEN x < 40 THEN 1 ELSE 2 END AS h,
             |    COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS sx,
             |    CAST(SUM(c) AS BIGINT) AS sy,
             |    CAST(SUM(x * x) AS BIGINT) AS sxx,
             |    CAST(SUM(x * c) AS BIGINT) AS sxy,
             |    SUM(CAST(c AS DOUBLE) * c) AS syy
             |  FROM xi GROUP BY 1),
             |ps AS (SELECT 0 AS h, COUNT(*) AS n,
             |    CAST(SUM(x) AS BIGINT) AS sx,
             |    CAST(SUM(c) AS BIGINT) AS sy,
             |    CAST(SUM(x * x) AS BIGINT) AS sxx,
             |    CAST(SUM(x * c) AS BIGINT) AS sxy,
             |    SUM(CAST(c AS DOUBLE) * c) AS syy
             |  FROM xi),
             |sr AS (SELECT h, n,
             |    syy - CAST(sy AS DOUBLE) * sy / n
             |      - (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
             |        * (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
             |        / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n)
             |      AS ssr,
             |    (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
             |      / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n)
             |      AS slope
             |  FROM (SELECT * FROM hs UNION ALL SELECT * FROM ps)),
             |a AS (SELECT
             |    CAST(SUM(CASE WHEN h > 0 THEN n END) AS BIGINT)
             |      AS n_months,
             |    SUM(CASE WHEN h > 0 THEN ssr END) AS ssr12,
             |    MAX(CASE WHEN h = 1 THEN ROUND(slope / 100.0, 4) END)
             |      AS slope_1,
             |    MAX(CASE WHEN h = 2 THEN ROUND(slope / 100.0, 4) END)
             |      AS slope_2,
             |    MAX(CASE WHEN h = 0 THEN ssr END) AS ssrp
             |  FROM sr)
             |SELECT n_months, slope_1, slope_2,
             |  ROUND((ssrp - ssr12) / 2.0 / (ssr12 / (n_months - 4)), 4)
             |    AS f_stat,
             |  ROUND((ssrp - ssr12) / 2.0 / (ssr12 / (n_months - 4)), 4)
             |    > 3.11 AS structural_break
             |FROM a""".stripMargin)),

    Q("lineitem_priority_sla_test", // does URGENT actually ship faster
      // than LOW? Mann–Whitney rank-sum on in-contract fulfillment lag
      // per year — the nonparametric SLA audit that survives the lag
      // distribution's skew. Rides Stats.mannWhitney (one keyed
      // cumulative window over the (year, lag) grain, exact integers
      // and halves); on this independent fixture the honest answer is
      // rank_biserial ≈ 0 — priority buys nothing, and the report
      // proves it.
      (s, d) => {
        val lag0 = t(s, d, "lineitem")
          .select(col("l_orderkey"), to_date(col("l_shipdate")).as("sd"))
          .join(t(s, d, "orders").select(col("o_orderkey"),
            to_date(col("o_orderdate")).as("od"), col("o_orderpriority")),
            col("l_orderkey") === col("o_orderkey"))
          .filter(datediff(col("sd"), col("od")).between(0, 120)
            && col("o_orderpriority").isin("1-URGENT", "5-LOW"))
          .select(year(col("od")).cast("long").as("yr"),
            datediff(col("sd"), col("od")).cast("long").as("lag_d"),
            col("o_orderpriority"))
        graft.operators.Stats
          .mannWhitney(lag0, "yr", "lag_d",
            col("o_orderpriority") === "1-URGENT")
          .select(col("yr").as("year"), col("n_a").as("n_urgent"),
            col("n_b").as("n_low"), round(col("u_a"), 1).as("u_urgent"),
            round(col("rank_biserial"), 6).as("rank_biserial"))
          .orderBy("year")
      },
      Some("""WITH lg AS (SELECT
             |    date_part('year', CAST(o_orderdate AS DATE)) AS yr,
             |    date_diff('day', CAST(o_orderdate AS DATE),
             |      CAST(l_shipdate AS DATE)) AS lag_d,
             |    o_orderpriority
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  WHERE date_diff('day', CAST(o_orderdate AS DATE),
             |      CAST(l_shipdate AS DATE)) BETWEEN 0 AND 120
             |    AND o_orderpriority IN ('1-URGENT', '5-LOW')),
             |pts AS (SELECT yr, lag_d,
             |    SUM(CASE WHEN o_orderpriority = '1-URGENT'
             |      THEN 1 ELSE 0 END) AS ca,
             |    SUM(CASE WHEN o_orderpriority = '1-URGENT'
             |      THEN 0 ELSE 1 END) AS cb
             |  FROM lg GROUP BY 1, 2),
             |m AS (SELECT yr, ca, cb,
             |    CAST(SUM(ca + cb) OVER (PARTITION BY yr
             |        ORDER BY lag_d) - (ca + cb) AS DOUBLE)
             |      + (ca + cb + 1) / 2.0 AS mid
             |  FROM pts),
             |agg AS (SELECT yr,
             |    CAST(SUM(ca) AS BIGINT) AS n_urgent,
             |    CAST(SUM(cb) AS BIGINT) AS n_low,
             |    SUM(ca * mid) AS ra
             |  FROM m GROUP BY 1)
             |SELECT CAST(yr AS BIGINT) AS year, n_urgent, n_low,
             |  ROUND(ra - CAST(n_urgent AS DOUBLE) * (n_urgent + 1) / 2,
             |    1) AS u_urgent,
             |  ROUND(2.0 * (ra - CAST(n_urgent AS DOUBLE)
             |    * (n_urgent + 1) / 2) / (n_urgent * n_low) - 1, 6)
             |    AS rank_biserial
             |FROM agg ORDER BY year""".stripMargin)),

    Q("orders_trading_day_adjust", // trading-day adjustment: monthly
      // revenue growth raw versus normalized by that month's count of
      // business days (Mon–Fri via portable day-index arithmetic, no
      // engine weekday functions) — the econometric correction that
      // keeps a 20-business-day month from "beating" a 23-day one.
      // The calendar expands from each month's bounded day range;
      // exact cents; rates round once at the boundary.
      (s, d) => {
        val m = t(s, d, "orders")
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
            trunc(to_date(col("o_orderdate")), "month").as("m0"),
            last_day(to_date(col("o_orderdate"))).as("m1"))
          .agg(sum(round(col("o_totalprice") * 100, 0).cast("long"))
            .as("c"))
        val bd = m.select(col("ym"),
            explode(sequence(col("m0"), col("m1"))).as("day"))
          .select(col("ym"),
            when(pmod(datediff(col("day"), lit("1995-01-02")), lit(7)) < 5,
              1L).otherwise(0L).as("isbd"))
          .groupBy("ym").agg(sum("isbd").as("n_bdays"))
        val w = Window.orderBy("ym")
        // Exact-integer growth protocol: c (cents) and n_bdays are exact
        // longs, so each growth is ONE IEEE division of long cross-products
        // — raw = (c−prev_c)/prev_c, adjusted = (c·prev_nb − prev_c·nb)
        // /(prev_c·nb) — bit-identical in any engine; round once at the
        // boundary. (Chained rpd/prev_rpd doubles tipped a .5e-6 tie.)
        m.join(bd, Seq("ym"))
          .withColumn("prev_c", lag("c", 1).over(w))
          .withColumn("prev_nb", lag("n_bdays", 1).over(w))
          .filter(col("prev_c").isNotNull)
          .withColumn("raw_g",
            (col("c") - col("prev_c")).cast("double") / col("prev_c"))
          .withColumn("adj_g",
            (col("c") * col("prev_nb") - col("prev_c") * col("n_bdays"))
              .cast("double") / (col("prev_c") * col("n_bdays")))
          .select(col("ym"), col("n_bdays"),
            round(col("raw_g"), 6).as("raw_growth"),
            round(col("adj_g"), 6).as("adjusted_growth"),
            round(col("raw_g") - col("adj_g"), 6).as("calendar_effect"))
          .orderBy("ym")
      },
      Some("""WITH m AS (SELECT strftime(o_orderdate, '%Y-%m') AS ym,
             |    date_trunc('month', CAST(o_orderdate AS DATE)) AS m0,
             |    last_day(CAST(o_orderdate AS DATE)) AS m1,
             |    CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
             |      AS BIGINT) AS c
             |  FROM orders GROUP BY 1, 2, 3),
             |bd AS (SELECT ym, CAST(SUM(CASE WHEN
             |      (date_diff('day', DATE '1995-01-02',
             |        m0 + CAST(i AS INT)) % 7 + 7)
             |        % 7 < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_bdays
             |  FROM m, unnest(range(0,
             |    date_diff('day', m0, m1) + 1)) AS r(i)
             |  GROUP BY 1),
             |j AS (SELECT m.ym, c, n_bdays,
             |    LAG(c) OVER (ORDER BY m.ym) AS prev_c,
             |    LAG(n_bdays) OVER (ORDER BY m.ym) AS prev_nb
             |  FROM m JOIN bd USING (ym)),
             |g AS (SELECT ym, n_bdays,
             |    CAST(c - prev_c AS DOUBLE) / prev_c AS raw_g,
             |    CAST(c * prev_nb - prev_c * n_bdays AS DOUBLE)
             |      / (prev_c * n_bdays) AS adj_g
             |  FROM j WHERE prev_c IS NOT NULL)
             |SELECT ym, n_bdays,
             |  ROUND(raw_g, 6) + 0.0 AS raw_growth,
             |  ROUND(adj_g, 6) + 0.0 AS adjusted_growth,
             |  ROUND(raw_g - adj_g, 6) + 0.0 AS calendar_effect
             |FROM g ORDER BY ym"""
        .stripMargin)),

    Q("events_anomaly_attribution", // when the anomaly fires, WHO did
      // it: take the day with the largest |count − mean| deviation and
      // decompose that deviation into per-type contributions
      // (type count − type daily mean) — the attribution table an
      // on-call reads next to the alert. Means are exact integer
      // ratios over the bounded day grain; the peak day is picked on
      // an exact integer score (|n·x − Σx| maximized, ties to the
      // earliest day) so both engines choose identically.
      (s, d) => {
        val daily = t(s, d, "events")
          .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"),
            col("event_type"))
          .agg(count(lit(1)).as("c"))
        val dayTot = daily.groupBy("day").agg(sum("c").as("n"))
        val glob = dayTot.agg(count(lit(1)).as("nd"), sum("n").as("tot"))
        val peak = dayTot.crossJoin(broadcast(glob))
          .select(col("day"),
            abs(col("n") * col("nd") - col("tot")).as("score"))
          .orderBy(col("score").desc, col("day")).limit(1)
        val tmeans = daily.groupBy("event_type")
          .agg(sum("c").as("tc"))
          .crossJoin(broadcast(glob.select(col("nd"))))
        daily.join(broadcast(peak.select("day")), Seq("day"))
          .join(tmeans, Seq("event_type"))
          .select(col("day").as("anomaly_day"), col("event_type"),
            col("c").as("n_on_day"),
            round(col("tc").cast("double") / col("nd"), 4)
              .as("daily_mean"),
            round(col("c") - col("tc").cast("double") / col("nd"), 4)
              .as("contribution"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (SELECT strftime(ts, '%Y-%m-%d') AS day,
             |    event_type, COUNT(*) AS c
             |  FROM events GROUP BY 1, 2),
             |dt AS (SELECT day, CAST(SUM(c) AS BIGINT) AS n
             |  FROM daily GROUP BY 1),
             |g AS (SELECT COUNT(*) AS nd, CAST(SUM(n) AS BIGINT) AS tot
             |  FROM dt),
             |peak AS (SELECT day FROM dt, g
             |  ORDER BY abs(n * nd - tot) DESC, day LIMIT 1),
             |tm AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS tc
             |  FROM daily GROUP BY 1)
             |SELECT daily.day AS anomaly_day, daily.event_type,
             |  daily.c AS n_on_day,
             |  ROUND(CAST(tc AS DOUBLE) / nd, 4) AS daily_mean,
             |  ROUND(daily.c - CAST(tc AS DOUBLE) / nd, 4)
             |    AS contribution
             |FROM daily JOIN peak USING (day)
             |JOIN tm USING (event_type), g
             |ORDER BY event_type""".stripMargin)),

    Q("orders_kruskal_wallis", // Kruskal–Wallis k-sample rank test: do
      // the 12 calendar months draw daily revenue from one
      // distribution? The nonparametric ANOVA (rank-based, so the
      // revenue skew can't lie), with the tie-corrected H. Midranks
      // come from ONE cumulative window over the bounded distinct-value
      // grain (the mannWhitney shape generalized to k groups); every
      // rank sum is exact integers-and-halves; the χ²(11) verdict
      // tests the rounded statistic against the inlined 19.675.
      (s, d) => {
        val daily = t(s, d, "orders")
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(sum(round(col("o_totalprice") * 100, 0).cast("long"))
            .as("v"))
          .select(month(col("day")).cast("long").as("g"), col("v"))
        val vals = daily.groupBy("v").agg(count(lit(1)).as("c"))
        val wv = Window.orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val mids = vals
          .withColumn("mid", (sum("c").over(wv) - col("c")).cast("double")
            + (col("c") + 1).cast("double") / 2)
        val perG = daily.groupBy("g", "v").agg(count(lit(1)).as("cg"))
          .join(mids.select("v", "mid"), Seq("v"))
          .groupBy("g").agg(sum("cg").as("ng"),
            sum(col("cg") * col("mid")).as("rg"))
        val ties = vals.agg(
          sum(col("c") * col("c") * col("c") - col("c")).as("t3"),
          sum("c").as("nn"))
        val agg = perG.agg(count(lit(1)).as("k"),
            sum(col("rg") * col("rg") / col("ng")).as("srr"))
          .crossJoin(broadcast(ties))
        val h = lit(12.0) / (col("nn") * (col("nn") + 1)) * col("srr") -
          lit(3.0) * (col("nn") + 1)
        val corr = lit(1.0) - col("t3").cast("double") /
          (col("nn") * col("nn") * col("nn") - col("nn"))
        agg.select(col("nn").as("n_days"), col("k").as("n_groups"),
          round(h, 4).as("h_stat"),
          round(h / corr, 4).as("h_adjusted"),
          (round(h / corr, 4) > 19.675).as("months_differ"))
      },
      Some("""WITH daily AS (SELECT
             |    date_part('month', CAST(o_orderdate AS DATE)) AS g,
             |    CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
             |      AS BIGINT) AS v
             |  FROM orders GROUP BY CAST(o_orderdate AS DATE)),
             |vals AS (SELECT v, COUNT(*) AS c FROM daily GROUP BY 1),
             |mids AS (SELECT v, c,
             |    CAST(SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
             |      - c AS DOUBLE) + CAST(c + 1 AS DOUBLE) / 2 AS mid
             |  FROM vals),
             |pg AS (SELECT g, CAST(SUM(cg) AS BIGINT) AS ng,
             |    SUM(cg * mid) AS rg
             |  FROM (SELECT g, v, COUNT(*) AS cg FROM daily GROUP BY 1, 2)
             |  JOIN mids USING (v) GROUP BY 1),
             |ties AS (SELECT CAST(SUM(c * c * c - c) AS BIGINT) AS t3,
             |    CAST(SUM(c) AS BIGINT) AS nn
             |  FROM vals),
             |a AS (SELECT COUNT(*) AS k, SUM(rg * rg / ng) AS srr
             |  FROM pg)
             |SELECT nn AS n_days, k AS n_groups,
             |  ROUND(12.0 / (nn * (nn + 1)) * srr - 3.0 * (nn + 1), 4)
             |    AS h_stat,
             |  ROUND((12.0 / (nn * (nn + 1)) * srr - 3.0 * (nn + 1))
             |    / (1.0 - CAST(t3 AS DOUBLE) / (nn * nn * nn - nn)), 4)
             |    AS h_adjusted,
             |  ROUND((12.0 / (nn * (nn + 1)) * srr - 3.0 * (nn + 1))
             |    / (1.0 - CAST(t3 AS DOUBLE) / (nn * nn * nn - nn)), 4)
             |    > 19.675 AS months_differ
             |FROM a, ties""".stripMargin)),

    Q("orders_ewma_chart", // EWMA control chart (λ=1/2) over monthly
      // revenue — the SPC chart that catches small sustained shifts
      // the Shewhart charts miss. λ=1/2 BY DESIGN: z_t has the dyadic
      // closed form (Σ v·2^(i−1) + v₁)/2^t whose running sums both
      // engines accumulate in the identical fixed order, so every z is
      // bit-deterministic; the time-varying limits use
      // √((1/3)(1−4^(−t))) with μ/σ from exact integer moments.
      (s, d) => {
        val m = t(s, d, "orders")
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
          .agg(sum(round(col("o_totalprice") * 100, 0).cast("long"))
            .as("c"))
        val w = Window.orderBy("ym")
        val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val glob = m.agg(count(lit(1)).as("n"), sum("c").as("s1"),
          sum(col("c").cast("double") * col("c")).as("s2"))
        val z = m
          .withColumn("t", row_number().over(w).cast("long"))
          .withColumn("s",
            sum(col("c").cast("double") * pow(lit(2.0), col("t") - 1))
              .over(wc))
          .withColumn("f", first(col("c").cast("double")).over(wc))
          .withColumn("z",
            (col("s") + col("f")) / pow(lit(2.0), col("t")))
          .crossJoin(broadcast(glob))
        val mu = col("s1").cast("double") / col("n")
        val sig = sqrt(col("s2") / col("n") - mu * mu)
        val band = sig * sqrt((lit(1.0)
          - pow(lit(4.0), -col("t").cast("double"))) / 3.0)
        z.select(col("ym"),
            (col("c").cast("double") / 100.0).as("revenue"),
            round(col("z") / 100.0, 2).as("ewma"),
            round((mu - lit(3.0) * band) / 100.0, 2).as("lcl"),
            round((mu + lit(3.0) * band) / 100.0, 2).as("ucl"),
            (col("z") < mu - lit(3.0) * band
              || col("z") > mu + lit(3.0) * band)
              .as("out_of_control"))
          .orderBy("ym")
      },
      Some("""WITH m AS (SELECT strftime(o_orderdate, '%Y-%m') AS ym,
             |    CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
             |      AS BIGINT) AS c
             |  FROM orders GROUP BY 1),
             |g AS (SELECT COUNT(*) AS n, CAST(SUM(c) AS BIGINT) AS s1,
             |    SUM(CAST(c AS DOUBLE) * c) AS s2
             |  FROM m),
             |ti AS (SELECT ym, c,
             |    CAST(ROW_NUMBER() OVER (ORDER BY ym) AS BIGINT) AS t
             |  FROM m),
             |zt AS (SELECT ym, c, t,
             |    SUM(CAST(c AS DOUBLE) * POW(2.0, t - 1))
             |      OVER (ORDER BY ym ROWS UNBOUNDED PRECEDING) AS s,
             |    FIRST_VALUE(CAST(c AS DOUBLE))
             |      OVER (ORDER BY ym) AS f
             |  FROM ti),
             |z AS (SELECT ym, c, t, (s + f) / POW(2.0, t) AS z FROM zt)
             |SELECT ym, CAST(c AS DOUBLE) / 100.0 AS revenue,
             |  ROUND(z / 100.0, 2) AS ewma,
             |  ROUND((CAST(s1 AS DOUBLE) / n - 3.0 * sqrt(s2 / n
             |    - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
             |    * sqrt((1.0 - POW(4.0, -CAST(t AS DOUBLE))) / 3.0))
             |    / 100.0, 2) AS lcl,
             |  ROUND((CAST(s1 AS DOUBLE) / n + 3.0 * sqrt(s2 / n
             |    - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
             |    * sqrt((1.0 - POW(4.0, -CAST(t AS DOUBLE))) / 3.0))
             |    / 100.0, 2) AS ucl,
             |  z < CAST(s1 AS DOUBLE) / n - 3.0 * sqrt(s2 / n
             |    - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
             |    * sqrt((1.0 - POW(4.0, -CAST(t AS DOUBLE))) / 3.0)
             |    OR z > CAST(s1 AS DOUBLE) / n + 3.0 * sqrt(s2 / n
             |    - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
             |    * sqrt((1.0 - POW(4.0, -CAST(t AS DOUBLE))) / 3.0)
             |    AS out_of_control
             |FROM z, g ORDER BY ym""".stripMargin)),

    Q("doc_index_of_coincidence", // index of coincidence per language
      // slice — the classic character-level fingerprint (IC =
      // Σc(c−1)/(n(n−1)) over letter frequencies): distinguishes
      // natural-language-like from uniform/random text in one number,
      // no model needed. One per-char explode into the bounded
      // (lang, letter) grain; the whole statistic is exact integers
      // into one division, normalized ×26.
      (s, d) => {
        val ch = t(s, d, "documents")
          .select(col("lang"), explode(split(
            regexp_replace(lower(col("text")), "[^a-z]", ""), ""))
            .as("ch"))
          .filter(col("ch") =!= "")
          .groupBy("lang", "ch").agg(count(lit(1)).as("c"))
        ch.groupBy("lang")
          .agg(sum("c").as("n"), count(lit(1)).as("n_letters"),
            sum(col("c") * (col("c") - 1)).as("coin"))
          .select(col("lang"), col("n").as("n_chars"), col("n_letters"),
            round(col("coin").cast("double")
              / (col("n") * (col("n") - 1)), 6).as("ic"),
            round(col("coin").cast("double")
              / (col("n") * (col("n") - 1)) * 26.0, 4).as("ic_normalized"))
          .orderBy("lang")
      },
      Some("""WITH ch AS (SELECT lang, u.ch, COUNT(*) AS c
             |  FROM (SELECT lang, string_split(
             |      regexp_replace(lower(text), '[^a-z]', '', 'g'), '')
             |      AS cs
             |    FROM documents), unnest(cs) AS u(ch)
             |  WHERE u.ch <> '' GROUP BY 1, 2)
             |SELECT lang, CAST(SUM(c) AS BIGINT) AS n_chars,
             |  COUNT(*) AS n_letters,
             |  ROUND(CAST(SUM(c * (c - 1)) AS DOUBLE)
             |    / (SUM(c) * (SUM(c) - 1)), 6) AS ic,
             |  ROUND(CAST(SUM(c * (c - 1)) AS DOUBLE)
             |    / (SUM(c) * (SUM(c) - 1)) * 26.0, 4) AS ic_normalized
             |FROM ch GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("doc_ranker_agreement", // is BM25 worth it over raw term counts?
      // Rank agreement between the BM25 top-20 and the naive
      // term-frequency top-20 for the same query: set overlap
      // (Jaccard), and Kendall τ over the common documents' rank
      // pairs (≤190 pairs of a bounded 20-row list — a deliberate
      // small-relation pairing, the kendallTauB contract). Both
      // rankers order by rounded score with doc_id tie-break, so the
      // lists and τ are deterministic.
      (s, d) => {
        val terms = Seq("spark", "join", "window")
        val wA = Window.orderBy(col("score").desc, col("id"))
        val a = graft.operators.Retrieval
          .bm25(t(s, d, "documents"), terms)
          .select(col("doc_id").as("id"), col("score"))
          .withColumn("ra", row_number().over(wA))
          .filter(col("ra") <= 20).select("id", "ra")
        val wB = Window.orderBy(col("cnt").desc, col("id"))
        val b = t(s, d, "documents")
          .select(col("doc_id").as("id"), explode(
            graft.operators.TextAnalysis.tokens(lower(col("text"))))
            .as("w"))
          .filter(col("w").isin(terms: _*))
          .groupBy("id").agg(count(lit(1)).as("cnt"))
          .withColumn("rb", row_number().over(wB))
          .filter(col("rb") <= 20).select("id", "rb")
        val common = a.join(b, Seq("id"))
        val pairs = common.select(col("id").as("id1"),
            col("ra").as("ra1"), col("rb").as("rb1"))
          .join(common.select(col("id").as("id2"), col("ra").as("ra2"),
            col("rb").as("rb2")), col("id1") < col("id2"))
        val tau = pairs.agg(
          sum(when((col("ra1") < col("ra2")) === (col("rb1") < col("rb2")),
            1L).otherwise(0L)).as("conc"),
          count(lit(1)).as("np"))
        common.agg(count(lit(1)).as("n_common"))
          .crossJoin(broadcast(tau))
          .select(col("n_common"),
            round(col("n_common").cast("double")
              / (lit(40L) - col("n_common")), 6).as("jaccard_top20"),
            round((lit(2L) * col("conc") - col("np")).cast("double")
              / col("np"), 6).as("kendall_tau"))
      },
      Some("""WITH tok AS MATERIALIZED (SELECT doc_id,
             |    string_split_regex(lower(trim(text)), '\s+') AS toks
             |  FROM documents),
             |m AS (SELECT doc_id, len(toks) AS dl,
             |    unnest(list_filter(toks,
             |      t -> list_contains(['spark','join','window'], t)))
             |      AS term
             |  FROM tok),
             |tf AS (SELECT doc_id, dl, term, COUNT(*) AS tf
             |  FROM m GROUP BY 1, 2, 3),
             |dft AS (SELECT term, COUNT(DISTINCT doc_id) AS df
             |  FROM tf GROUP BY 1),
             |st AS (SELECT COUNT(*) AS n, AVG(len(toks)) AS avgdl
             |  FROM tok),
             |sc AS (SELECT doc_id,
             |    ROUND(SUM(ln((n - df + 0.5) / (df + 0.5) + 1.0)
             |      * (tf * (1.2 + 1.0))
             |      / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))), 4)
             |      AS score
             |  FROM tf JOIN dft USING (term), st GROUP BY 1),
             |a AS (SELECT doc_id AS id, ROW_NUMBER() OVER (
             |    ORDER BY score DESC, doc_id) AS ra
             |  FROM sc QUALIFY ra <= 20),
             |bc AS (SELECT doc_id AS id, COUNT(*) AS cnt
             |  FROM m GROUP BY 1),
             |b AS (SELECT id, ROW_NUMBER() OVER (
             |    ORDER BY cnt DESC, id) AS rb
             |  FROM bc QUALIFY rb <= 20),
             |com AS (SELECT a.id, ra, rb FROM a JOIN b USING (id)),
             |p AS (SELECT
             |    CAST(SUM(CASE WHEN (c1.ra < c2.ra) = (c1.rb < c2.rb)
             |      THEN 1 ELSE 0 END) AS BIGINT) AS conc,
             |    COUNT(*) AS np
             |  FROM com c1 JOIN com c2 ON c1.id < c2.id),
             |nc AS (SELECT COUNT(*) AS n_common FROM com)
             |SELECT n_common,
             |  ROUND(CAST(n_common AS DOUBLE) / (40 - n_common), 6)
             |    AS jaccard_top20,
             |  ROUND(CAST(2 * conc - np AS DOUBLE) / np, 6)
             |    AS kendall_tau
             |FROM nc, p""".stripMargin)),

    Q("lineitem_twoway_anova", // two-way ANOVA of shipped quantity on
      // return flag × line status (cell-means convention on the
      // near-balanced 3×2 grid): SSA/SSB from marginal means, the
      // interaction as SScells − SSA − SSB, error as SStot − SScells —
      // with F ratios against the error mean square. Every sum of
      // squares is a closed form over exact integer cell moments; the
      // grid is bounded.
      (s, d) => {
        val cells = t(s, d, "lineitem")
          .select(col("l_returnflag").as("a"), col("l_linestatus").as("b"),
            col("l_quantity").cast("long").as("q"))
          .groupBy("a", "b")
          .agg(count(lit(1)).as("n"), sum("q").as("s"),
            sum(col("q") * col("q")).as("ss"))
        val g = cells.agg(sum("n").as("nn"), sum("s").as("st"),
          sum("ss").as("sst"), count(lit(1)).as("n_cells"))
        val ma = cells.groupBy("a").agg(sum("n").as("n_"), sum("s").as("s_"))
          .agg(sum(col("s_").cast("double") * col("s_") / col("n_"))
            .as("qa"))
        val mb = cells.groupBy("b").agg(sum("n").as("n_"), sum("s").as("s_"))
          .agg(sum(col("s_").cast("double") * col("s_") / col("n_"))
            .as("qb"))
        val mc = cells
          .agg(sum(col("s").cast("double") * col("s") / col("n")).as("qc"))
        val j = g.crossJoin(broadcast(ma)).crossJoin(broadcast(mb))
          .crossJoin(broadcast(mc))
        val cf = col("st").cast("double") * col("st") / col("nn")
        val ssa = col("qa") - cf
        val ssb = col("qb") - cf
        val ssab = col("qc") - col("qa") - col("qb") + cf
        val sse = col("sst").cast("double") - col("qc")
        val dfe = col("nn") - col("n_cells")
        val mse = sse / dfe
        j.select(explode(array(
            struct(lit("1_returnflag").as("source"),
              round(ssa, 2).as("ss"), lit(2L).as("df"),
              round(ssa / 2.0 / mse, 4).as("f_stat")),
            struct(lit("2_linestatus").as("source"),
              round(ssb, 2).as("ss"), lit(1L).as("df"),
              round(ssb / 1.0 / mse, 4).as("f_stat")),
            struct(lit("3_interaction").as("source"),
              round(ssab, 2).as("ss"), lit(2L).as("df"),
              round(ssab / 2.0 / mse, 4).as("f_stat")),
            struct(lit("4_error").as("source"), round(sse, 2).as("ss"),
              dfe.as("df"), lit(null).cast("double").as("f_stat"))))
            .as("r"))
          .select(col("r.source").as("source"), col("r.ss").as("ss"),
            col("r.df").as("df"), col("r.f_stat").as("f_stat"))
          .orderBy("source")
      },
      Some("""WITH cells AS (SELECT l_returnflag AS a,
             |    l_linestatus AS b, COUNT(*) AS n,
             |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s,
             |    CAST(SUM(CAST(l_quantity AS BIGINT)
             |      * CAST(l_quantity AS BIGINT)) AS BIGINT) AS ss
             |  FROM lineitem GROUP BY 1, 2),
             |g AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
             |    CAST(SUM(s) AS BIGINT) AS st,
             |    CAST(SUM(ss) AS BIGINT) AS sst,
             |    COUNT(*) AS n_cells FROM cells),
             |ma AS (SELECT SUM(CAST(s_ AS DOUBLE) * s_ / n_) AS qa
             |  FROM (SELECT a, CAST(SUM(n) AS BIGINT) AS n_,
             |      CAST(SUM(s) AS BIGINT) AS s_ FROM cells GROUP BY 1)),
             |mb AS (SELECT SUM(CAST(s_ AS DOUBLE) * s_ / n_) AS qb
             |  FROM (SELECT b, CAST(SUM(n) AS BIGINT) AS n_,
             |      CAST(SUM(s) AS BIGINT) AS s_ FROM cells GROUP BY 1)),
             |mc AS (SELECT SUM(CAST(s AS DOUBLE) * s / n) AS qc
             |  FROM cells),
             |j AS (SELECT nn, st, sst, n_cells, qa, qb, qc,
             |    CAST(st AS DOUBLE) * st / nn AS cf
             |  FROM g, ma, mb, mc)
             |SELECT source, ss, df, f_stat FROM (
             |  SELECT '1_returnflag' AS source, ROUND(qa - cf, 2) AS ss,
             |    CAST(2 AS BIGINT) AS df,
             |    ROUND((qa - cf) / 2.0
             |      / ((CAST(sst AS DOUBLE) - qc) / (nn - n_cells)), 4)
             |      AS f_stat
             |  FROM j
             |  UNION ALL SELECT '2_linestatus', ROUND(qb - cf, 2), 1,
             |    ROUND((qb - cf) / 1.0
             |      / ((CAST(sst AS DOUBLE) - qc) / (nn - n_cells)), 4)
             |  FROM j
             |  UNION ALL SELECT '3_interaction',
             |    ROUND(qc - qa - qb + cf, 2), 2,
             |    ROUND((qc - qa - qb + cf) / 2.0
             |      / ((CAST(sst AS DOUBLE) - qc) / (nn - n_cells)), 4)
             |  FROM j
             |  UNION ALL SELECT '4_error',
             |    ROUND(CAST(sst AS DOUBLE) - qc, 2), nn - n_cells, NULL
             |  FROM j)
             |ORDER BY source""".stripMargin)),

    Q("events_lifetime_gamma_fit", // gamma fit (method of moments) of
      // user lifetimes — first-to-last event span per user, k = m²/v,
      // θ = v/m: the parametric summary a retention simulator samples
      // from. Spans are exact integer seconds; moments are exact longs;
      // the two parameters are the only float steps.
      (s, d) => {
        val sp = t(s, d, "events")
          .select(col("user_id"), unix_millis(col("ts")).as("ms"))
          .groupBy("user_id")
          .agg(expr("(max(ms) - min(ms)) div 1000").as("life_s"))
        val m = sp.agg(count(lit(1)).as("n"), sum("life_s").as("s1"),
          sum(col("life_s") * col("life_s")).as("s2"))
        val mu = col("s1").cast("double") / col("n")
        val v = col("s2").cast("double") / col("n") - mu * mu
        m.select(col("n").as("n_users"),
          round(mu, 2).as("mean_life_s"),
          round(sqrt(v), 2).as("sd_life_s"),
          round(mu * mu / v, 4).as("gamma_k"),
          round(v / mu, 2).as("gamma_theta"))
      },
      Some("""WITH sp AS (SELECT user_id,
             |    (MAX(epoch_ms(ts)) - MIN(epoch_ms(ts))) // 1000
             |      AS life_s
             |  FROM events GROUP BY 1),
             |m AS (SELECT COUNT(*) AS n,
             |    CAST(SUM(life_s) AS BIGINT) AS s1,
             |    CAST(SUM(life_s * life_s) AS BIGINT) AS s2
             |  FROM sp)
             |SELECT n AS n_users,
             |  ROUND(CAST(s1 AS DOUBLE) / n, 2) AS mean_life_s,
             |  ROUND(sqrt(CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE)
             |    / n) * (CAST(s1 AS DOUBLE) / n)), 2) AS sd_life_s,
             |  ROUND((CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
             |    / (CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n)
             |      * (CAST(s1 AS DOUBLE) / n)), 4) AS gamma_k,
             |  ROUND((CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n)
             |    * (CAST(s1 AS DOUBLE) / n)) / (CAST(s1 AS DOUBLE) / n),
             |    2) AS gamma_theta
             |FROM m""".stripMargin)),

    Q("events_reuse_distance", // working-set analysis (Denning): the
      // hit-rate curve a cache is sized against — for each access, the
      // time since that user's PREVIOUS access (one keyed lag, never a
      // global stack simulation), collapsed to the bounded power-of-two
      // gap histogram; hit_rate(W) = share of accesses whose reuse gap
      // fits the window. First accesses are cold misses at every W.
      // Exact integers into one division per row.
      (s, d) => {
        val gaps = t(s, d, "events")
          .select(col("user_id"), col("event_id"),
            unix_millis(col("ts")).as("ms"))
          .withColumn("gap_s", expr(
            """(ms - lag(ms, 1) over (partition by user_id
              | order by ms, event_id)) div 1000""".stripMargin))
        val total = gaps.agg(count(lit(1)).as("n_accesses"))
        val hist = gaps.filter(col("gap_s").isNotNull)
          .groupBy(when(col("gap_s") === 0, lit(0L))
            .otherwise(length(bin(col("gap_s"))).cast("long")).as("b"))
          .agg(count(lit(1)).as("cnt"))
        val wcum = Window.orderBy("b")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        hist.withColumn("cum", sum("cnt").over(wcum))
          .crossJoin(broadcast(total))
          .select((pow(lit(2.0), col("b")).cast("long") - 1)
              .as("window_s"),
            col("cum").as("n_within"), col("n_accesses"),
            round(col("cum").cast("double") / col("n_accesses"), 6)
              .as("hit_rate"))
          .orderBy("window_s")
      },
      Some("""WITH g AS (SELECT
             |    (ms - LAG(ms) OVER (PARTITION BY user_id
             |      ORDER BY ms, event_id)) // 1000 AS gap_s
             |  FROM (SELECT user_id, event_id, epoch_ms(ts) AS ms
             |    FROM events)),
             |tot AS (SELECT COUNT(*) AS n_accesses FROM g),
             |h AS (SELECT CASE WHEN gap_s = 0 THEN 0
             |      ELSE length(printf('%b', gap_s)) END AS b,
             |    COUNT(*) AS cnt
             |  FROM g WHERE gap_s IS NOT NULL GROUP BY 1),
             |c AS (SELECT b, CAST(SUM(cnt) OVER (ORDER BY b
             |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
             |  FROM h)
             |SELECT CAST(POW(2, b) AS BIGINT) - 1 AS window_s,
             |  cum AS n_within, n_accesses,
             |  ROUND(CAST(cum AS DOUBLE) / n_accesses, 6) AS hit_rate
             |FROM c, tot ORDER BY window_s""".stripMargin)),

    Q("orders_friedman_test", // Friedman rank test: with YEARS as
      // blocks, do the 12 calendar months rank consistently? The
      // blocked nonparametric companion to Kruskal–Wallis (which
      // pools away the year effect this test controls for). Ranks run
      // WITHIN each complete year block (keyed window over the bounded
      // 7×12 grid; exact-cents values make ties impossible, so rank()
      // IS the midrank), χ²_F = 12/(nk(k+1))·ΣR_j² −
      // 3n(k+1); everything is exact integers-and-halves into the
      // rounded statistic vs the inlined χ²(11) critical value.
      (s, d) => {
        val cell = t(s, d, "orders")
          .groupBy(year(to_date(col("o_orderdate"))).cast("long").as("yr"),
            month(to_date(col("o_orderdate"))).cast("long").as("mo"))
          .agg(sum(round(col("o_totalprice") * 100, 0).cast("long"))
            .as("v"))
        val full = cell.groupBy("yr").agg(count(lit(1)).as("nm"))
          .filter(col("nm") === 12).select("yr")
        val ranked = cell.join(full, Seq("yr"))
          .withColumn("rk", rank().over(
            Window.partitionBy("yr").orderBy("v")).cast("double"))
        val rj = ranked.groupBy("mo").agg(sum("rk").as("r"),
          count(lit(1)).as("n_blocks"))
        val agg = rj.agg(max("n_blocks").as("n"),
          count(lit(1)).as("k"),
          sum(col("r") * col("r")).as("srr"))
        val chi = lit(12.0) / (col("n") * col("k") * (col("k") + 1)) *
          col("srr") - lit(3.0) * col("n") * (col("k") + 1)
        agg.select(col("n").as("n_years"), col("k").as("n_months"),
          round(chi, 4).as("friedman_chi2"),
          (round(chi, 4) > 19.675).as("months_rank_consistently"))
      },
      Some("""WITH cell AS (SELECT
             |    date_part('year', CAST(o_orderdate AS DATE)) AS yr,
             |    date_part('month', CAST(o_orderdate AS DATE)) AS mo,
             |    CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
             |      AS BIGINT) AS v
             |  FROM orders GROUP BY 1, 2),
             |full_ AS (SELECT yr FROM cell GROUP BY 1
             |  HAVING COUNT(*) = 12),
             |rk AS (SELECT mo,
             |    CAST(RANK() OVER (PARTITION BY cell.yr ORDER BY v)
             |      AS DOUBLE) AS rk
             |  FROM cell JOIN full_ ON cell.yr = full_.yr),
             |rj AS (SELECT mo, SUM(rk) AS r, COUNT(*) AS n_blocks
             |  FROM rk GROUP BY 1),
             |a AS (SELECT CAST(MAX(n_blocks) AS BIGINT) AS n,
             |    COUNT(*) AS k, SUM(r * r) AS srr
             |  FROM rj)
             |SELECT n AS n_years, k AS n_months,
             |  ROUND(12.0 / (n * k * (k + 1)) * srr - 3.0 * n * (k + 1),
             |    4) AS friedman_chi2,
             |  ROUND(12.0 / (n * k * (k + 1)) * srr - 3.0 * n * (k + 1),
             |    4) > 19.675 AS months_rank_consistently
             |FROM a""".stripMargin)),

    Q("cust_segment_dissimilarity", // Duncan dissimilarity index: how
      // far each nation's market-segment mix sits from the global mix,
      // D = ½Σ|p_seg − q_seg| — the segregation/composition metric a
      // territory plan reads. Bounded (nation × segment) grain; counts
      // are exact integers; one division pair per cell inside the
      // absolute sum, rounded once per nation.
      (s, d) => {
        val cell = t(s, d, "customer")
          .groupBy(col("c_nationkey"), col("c_mktsegment"))
          .agg(count(lit(1)).as("c"))
        val nat = cell.groupBy("c_nationkey").agg(sum("c").as("cn"))
        val seg = cell.groupBy("c_mktsegment").agg(sum("c").as("cs"))
        val tot = cell.agg(sum("c").as("ct"))
        cell.join(nat, Seq("c_nationkey"))
          .join(broadcast(seg), Seq("c_mktsegment"))
          .crossJoin(broadcast(tot))
          .groupBy("c_nationkey")
          .agg(max("cn").as("n_customers"),
            round(sum(abs(col("c").cast("double") / col("cn")
              - col("cs").cast("double") / col("ct"))) / 2.0, 6)
              .as("dissimilarity"))
          .select(col("c_nationkey"), col("n_customers"),
            col("dissimilarity"))
          .orderBy("c_nationkey")
      },
      Some("""WITH cell AS (SELECT c_nationkey, c_mktsegment,
             |    COUNT(*) AS c
             |  FROM customer GROUP BY 1, 2),
             |nat AS (SELECT c_nationkey, CAST(SUM(c) AS BIGINT) AS cn
             |  FROM cell GROUP BY 1),
             |seg AS (SELECT c_mktsegment, CAST(SUM(c) AS BIGINT) AS cs
             |  FROM cell GROUP BY 1),
             |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS ct FROM cell)
             |SELECT cell.c_nationkey, MAX(cn) AS n_customers,
             |  ROUND(SUM(abs(CAST(c AS DOUBLE) / cn
             |    - CAST(cs AS DOUBLE) / ct)) / 2.0, 6) AS dissimilarity
             |FROM cell JOIN nat USING (c_nationkey)
             |JOIN seg USING (c_mktsegment), tot
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("emb_isotropy_audit", // embedding isotropy audit (Mu & Viswanath
      // all-but-the-top diagnostics): mean pairwise cosine over the
      // LINEAR consecutive-id chain (never all-pairs), the mean-vector
      // norm against the mean per-vector norm (a common-direction
      // bias detector), and the top dimension's share of total
      // variance (off the dim-health moments). Anisotropic embeddings
      // sink ANN recall before any index tuning can save it — this is
      // the go/no-go audit that runs first. Float sums follow the 6dp
      // model-state rounding contract.
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val chain = emb.select(col("vec_id").as("a"), col("embedding")
            .as("ea"))
          .join(emb.select((col("vec_id") - 1).as("a"),
            col("embedding").as("eb")), Seq("a"))
          .agg(count(lit(1)).as("n_pairs"),
            round(avg(graft.functions.VectorFunctions
              .cosine(col("ea"), col("eb"))), 6).as("mean_pair_cos"))
        val ex = emb.select(col("vec_id"),
            posexplode(col("embedding")).as(Seq("d0", "x0")))
          .select(col("vec_id"), (col("d0") + 1).as("dim"),
            col("x0").cast("double").as("x"))
        val dimStats = ex.groupBy("dim")
          .agg(avg("x").as("mu"),
            (avg(col("x") * col("x")) - avg("x") * avg("x")).as("v"))
        val dims = dimStats.agg(
          round(sqrt(sum(col("mu") * col("mu"))), 6).as("mean_vec_norm"),
          round(max("v") / sum("v"), 6).as("top_dim_var_share"))
        val norms = emb.select(graft.functions.VectorFunctions
            .l2Norm(col("embedding")).as("nv"))
          .agg(round(avg("nv"), 6).as("mean_norm"))
        chain.crossJoin(broadcast(dims)).crossJoin(broadcast(norms))
          .select(col("n_pairs"), col("mean_pair_cos"),
            col("mean_vec_norm"), col("mean_norm"),
            round(col("mean_vec_norm") / col("mean_norm"), 6)
              .as("common_direction_share"),
            col("top_dim_var_share"))
      },
      Some("""WITH chain AS (SELECT COUNT(*) AS n_pairs,
             |    ROUND(AVG(
             |      list_sum(list_transform(range(1, 65), i ->
             |        CAST(a.embedding[i] AS DOUBLE)
             |          * CAST(b.embedding[i] AS DOUBLE)))
             |      / (sqrt(list_sum(list_transform(range(1, 65), i ->
             |          CAST(a.embedding[i] AS DOUBLE)
             |            * CAST(a.embedding[i] AS DOUBLE))))
             |        * sqrt(list_sum(list_transform(range(1, 65), i ->
             |          CAST(b.embedding[i] AS DOUBLE)
             |            * CAST(b.embedding[i] AS DOUBLE)))))), 6)
             |      AS mean_pair_cos
             |  FROM embeddings a JOIN embeddings b
             |    ON b.vec_id = a.vec_id + 1),
             |ex AS (SELECT vec_id, i AS dim,
             |    CAST(embedding[i] AS DOUBLE) AS x
             |  FROM embeddings, range(1, 65) t(i)),
             |ds AS (SELECT dim, AVG(x) AS mu,
             |    AVG(x * x) - AVG(x) * AVG(x) AS v
             |  FROM ex GROUP BY 1),
             |dims AS (SELECT ROUND(sqrt(SUM(mu * mu)), 6)
             |      AS mean_vec_norm,
             |    ROUND(MAX(v) / SUM(v), 6) AS top_dim_var_share
             |  FROM ds),
             |norms AS (SELECT ROUND(AVG(sqrt(list_sum(
             |      list_transform(embedding, x ->
             |        CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)
             |      AS mean_norm
             |  FROM embeddings)
             |SELECT n_pairs, mean_pair_cos, mean_vec_norm, mean_norm,
             |  ROUND(mean_vec_norm / mean_norm, 6)
             |    AS common_direction_share,
             |  top_dim_var_share
             |FROM chain, dims, norms""".stripMargin)),

    Q("cust_brand_switching", // brand-switching matrix: each order's
      // DOMINANT brand (max line count, lexicographic tie-break — a
      // deterministic total order), then one keyed lag per customer
      // gives the (from → to) transition counts — the retail loyalty
      // table. Top 15 transitions by volume; share_of_from is the
      // row-normalized transition probability. Bounded 25×25 matrix
      // grain; exact integers into one division.
      (s, d) => {
        val ob = t(s, d, "lineitem")
          .join(t(s, d, "part").select(col("p_partkey"), col("p_brand")),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("l_orderkey"), col("p_brand"))
          .agg(count(lit(1)).as("nl"))
        val dom = ob.withColumn("rn", row_number().over(
            Window.partitionBy("l_orderkey")
              .orderBy(col("nl").desc, col("p_brand"))))
          .filter(col("rn") === 1)
          .select(col("l_orderkey"), col("p_brand").as("brand"))
        val seq0 = dom.join(t(s, d, "orders").select(col("o_orderkey"),
            col("o_custkey"), to_date(col("o_orderdate")).as("od")),
            col("l_orderkey") === col("o_orderkey"))
          .withColumn("prev", lag("brand", 1).over(
            Window.partitionBy("o_custkey")
              .orderBy(col("od"), col("o_orderkey"))))
          .filter(col("prev").isNotNull)
        val tr = seq0.groupBy(col("prev").as("from_brand"),
            col("brand").as("to_brand"))
          .agg(count(lit(1)).as("n"))
        val fromTot = tr.groupBy("from_brand").agg(sum("n").as("nf"))
        tr.join(fromTot, Seq("from_brand"))
          .select(col("from_brand"), col("to_brand"), col("n"),
            round(col("n").cast("double") / col("nf"), 6)
              .as("share_of_from"),
            (col("from_brand") === col("to_brand")).as("is_loyal"))
          .orderBy(col("n").desc, col("from_brand"), col("to_brand"))
          .limit(15)
      },
      Some("""WITH ob AS (SELECT l_orderkey, p_brand, COUNT(*) AS nl
             |  FROM lineitem JOIN part ON l_partkey = p_partkey
             |  GROUP BY 1, 2),
             |dom AS (SELECT l_orderkey, p_brand AS brand FROM (
             |    SELECT l_orderkey, p_brand,
             |      ROW_NUMBER() OVER (PARTITION BY l_orderkey
             |        ORDER BY nl DESC, p_brand) AS rn
             |    FROM ob) WHERE rn = 1),
             |sq AS (SELECT o_custkey, brand,
             |    LAG(brand) OVER (PARTITION BY o_custkey
             |      ORDER BY CAST(o_orderdate AS DATE), o_orderkey)
             |      AS prev
             |  FROM dom JOIN orders ON l_orderkey = o_orderkey),
             |tr AS (SELECT prev AS from_brand, brand AS to_brand,
             |    COUNT(*) AS n
             |  FROM sq WHERE prev IS NOT NULL GROUP BY 1, 2),
             |ft AS (SELECT from_brand, CAST(SUM(n) AS BIGINT) AS nf
             |  FROM tr GROUP BY 1)
             |SELECT tr.from_brand, to_brand, n,
             |  ROUND(CAST(n AS DOUBLE) / nf, 6) AS share_of_from,
             |  tr.from_brand = to_brand AS is_loyal
             |FROM tr JOIN ft USING (from_brand)
             |ORDER BY n DESC, tr.from_brand, to_brand LIMIT 15"""
        .stripMargin)),

    Q("orders_shipment_consolidation", // shipment-consolidation
      // opportunity: orders whose lines ship on k distinct days pay
      // k−1 avoidable shipments — the distribution by k and the total
      // extra shipments IS the business case for batching. One
      // two-level rollup (order grain → bounded k grain); exact
      // integers into one share division.
      (s, d) => {
        val per = t(s, d, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("n_lines"),
            countDistinct(col("l_shipdate")).as("k"))
        val tot = per.agg(count(lit(1)).as("n_orders_total"))
        per.groupBy("k")
          .agg(count(lit(1)).as("n_orders"),
            sum("n_lines").as("n_lines"),
            sum(col("k") - 1).as("extra_shipments"))
          .crossJoin(broadcast(tot))
          .select(col("k").as("n_ship_days"), col("n_orders"),
            round(col("n_orders").cast("double") / col("n_orders_total"),
              6).as("share"),
            col("n_lines"), col("extra_shipments"))
          .orderBy("n_ship_days")
      },
      Some("""WITH per AS (SELECT l_orderkey, COUNT(*) AS n_lines,
             |    COUNT(DISTINCT l_shipdate) AS k
             |  FROM lineitem GROUP BY 1),
             |tot AS (SELECT COUNT(*) AS n_orders_total FROM per)
             |SELECT k AS n_ship_days, COUNT(*) AS n_orders,
             |  ROUND(CAST(COUNT(*) AS DOUBLE) / n_orders_total, 6)
             |    AS share,
             |  CAST(SUM(n_lines) AS BIGINT) AS n_lines,
             |  CAST(SUM(k - 1) AS BIGINT) AS extra_shipments
             |FROM per, tot GROUP BY k, n_orders_total
             |ORDER BY n_ship_days""".stripMargin)),

    Q("doc_effective_vocab", // Simpson-effective vocabulary per source:
      // 1/Σp² — the "how many words does this source REALLY use"
      // number that raw type counts overstate (Heaps says how fast
      // types grow; this says how concentrated usage is). Σc² and n
      // are exact integers on the (source, term) grain; the effective
      // count is one division.
      (s, d) => {
        val tc = t(s, d, "documents")
          .select(col("source"), explode(
            graft.operators.TextAnalysis.tokens(lower(col("text"))))
            .as("w"))
          .groupBy("source", "w").agg(count(lit(1)).as("c"))
        tc.groupBy("source")
          .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_types"),
            sum(col("c") * col("c")).as("s2"))
          .select(col("source"), col("n_tokens"), col("n_types"),
            round((col("n_tokens") * col("n_tokens")).cast("double")
              / col("s2"), 4).as("effective_vocab"),
            round((col("n_tokens") * col("n_tokens")).cast("double")
              / col("s2") / col("n_types"), 6).as("evenness"))
          .orderBy("source")
      },
      Some("""WITH tc AS (SELECT source, u.w, COUNT(*) AS c
             |  FROM (SELECT source,
             |      string_split_regex(lower(trim(text)), '\s+') AS ts
             |    FROM documents), unnest(ts) AS u(w)
             |  GROUP BY 1, 2)
             |SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
             |  COUNT(*) AS n_types,
             |  ROUND(CAST(SUM(c) * SUM(c) AS DOUBLE) / SUM(c * c), 4)
             |    AS effective_vocab,
             |  ROUND(CAST(SUM(c) * SUM(c) AS DOUBLE) / SUM(c * c)
             |    / COUNT(*), 6) AS evenness
             |FROM tc GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("nation_rank_stability", // league-table stability: year-over-year
      // revenue-rank churn per nation — Spearman ρ between consecutive
      // years' rank vectors plus the mean absolute rank move. Ranks
      // run within year over the bounded 25-nation grain (exact-cents
      // values, no ties); ρ = 1 − 6Σd²/(n(n²−1)) is exact integers
      // into one division per year pair.
      (s, d) => {
        val rev = t(s, d, "lineitem")
          .join(t(s, d, "supplier").select(col("s_suppkey"),
            col("s_nationkey")), col("l_suppkey") === col("s_suppkey"))
          .groupBy(year(to_date(col("l_shipdate"))).cast("long").as("yr"),
            col("s_nationkey"))
          .agg(sum(round(col("l_extendedprice") * 100, 0).cast("long"))
            .as("c"))
        val ranked = rev.withColumn("rk", rank().over(
            Window.partitionBy("yr").orderBy(col("c").desc))
          .cast("long"))
        val pairs = ranked.select(col("yr"), col("s_nationkey"),
            col("rk"))
          .join(ranked.select((col("yr") - 1).as("yr"),
            col("s_nationkey"), col("rk").as("rk_next")),
            Seq("yr", "s_nationkey"))
        pairs.groupBy("yr")
          .agg(count(lit(1)).as("n_nations"),
            sum((col("rk") - col("rk_next")) * (col("rk") - col("rk_next")))
              .as("sd2"),
            sum(abs(col("rk") - col("rk_next"))).as("sad"))
          .select(col("yr").as("year"), col("n_nations"),
            round(lit(1.0) - lit(6L) * col("sd2")
              / (col("n_nations") * (col("n_nations") * col("n_nations")
                - 1)), 6).as("spearman_next_year"),
            round(col("sad").cast("double") / col("n_nations"), 4)
              .as("mean_abs_rank_move"))
          .orderBy("year")
      },
      Some("""WITH rev AS (SELECT
             |    date_part('year', CAST(l_shipdate AS DATE)) AS yr,
             |    s_nationkey,
             |    CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0)
             |      AS BIGINT)) AS BIGINT) AS c
             |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |  GROUP BY 1, 2),
             |rk AS (SELECT yr, s_nationkey,
             |    CAST(RANK() OVER (PARTITION BY yr ORDER BY c DESC)
             |      AS BIGINT) AS rk
             |  FROM rev),
             |p AS (SELECT a.yr, a.s_nationkey, a.rk, b.rk AS rk_next
             |  FROM rk a JOIN rk b
             |    ON b.yr = a.yr + 1 AND b.s_nationkey = a.s_nationkey)
             |SELECT CAST(yr AS BIGINT) AS year, COUNT(*) AS n_nations,
             |  ROUND(1.0 - 6 * SUM((rk - rk_next) * (rk - rk_next))
             |    / (COUNT(*) * (COUNT(*) * COUNT(*) - 1)), 6)
             |    AS spearman_next_year,
             |  ROUND(CAST(SUM(abs(rk - rk_next)) AS DOUBLE) / COUNT(*),
             |    4) AS mean_abs_rank_move
             |FROM p GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("doc_cross_lingual_leakage", // translation-pair / cross-lingual
      // contamination screen: near-dup pairs whose two documents carry
      // DIFFERENT language labels — in a real corpus these are
      // machine-translated clones that leak eval answers across
      // language splits. Reads the SHARED shingle-jaccard pair
      // relation (never re-pairs) and joins two doc-grain lang
      // lookups; the per-lang-pair rollup is bounded 5×5.
      (s, d) => {
        val pairs = graft.operators.Dedup
          .ngramJaccardOf(shinglePairIndex(s, d), threshold = 0.02)
        val lang = t(s, d, "documents")
          .select(col("doc_id"), col("lang"))
        val lp = pairs
          .join(lang.select(col("doc_id").as("id_a"),
            col("lang").as("lang_a")), Seq("id_a"))
          .join(lang.select(col("doc_id").as("id_b"),
            col("lang").as("lang_b")), Seq("id_b"))
        val tot = lp.agg(count(lit(1)).as("n_pairs_total"))
        lp.filter(col("lang_a") =!= col("lang_b"))
          .select(least(col("lang_a"), col("lang_b")).as("lang_1"),
            greatest(col("lang_a"), col("lang_b")).as("lang_2"))
          .groupBy("lang_1", "lang_2")
          .agg(count(lit(1)).as("n_cross_pairs"))
          .crossJoin(broadcast(tot))
          .select(col("lang_1"), col("lang_2"), col("n_cross_pairs"),
            round(col("n_cross_pairs").cast("double")
              / col("n_pairs_total"), 6).as("share_of_all_pairs"))
          .orderBy(col("n_cross_pairs").desc, col("lang_1"),
            col("lang_2"))
      },
      Some("""WITH d AS (SELECT doc_id, source, lang,
             |    list_distinct(list_transform(
             |      range(0, greatest(len(t) - 2, 1)),
             |      i -> array_to_string(t[(i+1):(i+3)], ' '))) AS sh
             |  FROM (SELECT doc_id, source, lang,
             |      string_split_regex(lower(trim(text)), '\s+') AS t
             |    FROM documents)),
             |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |    a.lang AS lang_a, b.lang AS lang_b
             |  FROM d a JOIN d b
             |    ON a.source = b.source AND a.doc_id < b.doc_id
             |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             |      / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.02),
             |tot AS (SELECT COUNT(*) AS n_pairs_total FROM pairs)
             |SELECT least(lang_a, lang_b) AS lang_1,
             |  greatest(lang_a, lang_b) AS lang_2,
             |  COUNT(*) AS n_cross_pairs,
             |  ROUND(CAST(COUNT(*) AS DOUBLE) / n_pairs_total, 6)
             |    AS share_of_all_pairs
             |FROM pairs, tot WHERE lang_a <> lang_b
             |GROUP BY 1, 2, n_pairs_total
             |ORDER BY n_cross_pairs DESC, lang_1, lang_2"""
        .stripMargin)),

    Q("doc_bpe_compression_curve", // when do merges stop paying?
      // Corpus token count and compression after each BPE merge round
      // 0..3 — the marginal-value curve a tokenizer budget is set
      // against. Each round re-applies the memoized merge prefix (model
      // state in the closure); the oracle reads the same c0..c3 chain
      // the other BPE oracles replay.
      (s, d) => {
        val docs = t(s, d, "documents")
        val merges = bpeMerges(s, d)
        (0 to 3).map { k =>
          val enc =
            if (k == 0) docs.select(
              size(graft.operators.TextAnalysis.tokens(lower(col("text"))))
                .cast("long").as("n"))
            else graft.operators.TextAnalysis
              .bpeEncode(docs, merges.take(k))
              .select(col("n_encoded").as("n"))
          enc.agg(sum("n").as("n_tokens"))
            .select(lit(k.toLong).as("merge_round"), col("n_tokens"))
        }.reduce(_.unionByName(_))
          .withColumn("compression", round(col("n_tokens").cast("double")
            / first("n_tokens").over(Window.orderBy("merge_round")
              .rowsBetween(Window.unboundedPreceding,
                Window.unboundedFollowing)), 6))
          .orderBy("merge_round")
      },
      Some(s"""$bpeOracleWith
           |SELECT merge_round, n_tokens,
           |  ROUND(CAST(n_tokens AS DOUBLE) / FIRST_VALUE(n_tokens)
           |    OVER (ORDER BY merge_round ROWS BETWEEN UNBOUNDED
           |      PRECEDING AND UNBOUNDED FOLLOWING), 6) AS compression
           |FROM (
           |  SELECT 0 AS merge_round, CAST(SUM(len(ts)) AS BIGINT)
           |    AS n_tokens FROM c0
           |  UNION ALL SELECT 1, CAST(SUM(len(ts)) AS BIGINT) FROM c1
           |  UNION ALL SELECT 2, CAST(SUM(len(ts)) AS BIGINT) FROM c2
           |  UNION ALL SELECT 3, CAST(SUM(len(ts)) AS BIGINT) FROM c3)
           |ORDER BY merge_round""".stripMargin)),

    Q("doc_learning_curve", // the learning curve: train the language-ID
      // logistic regression on nested 25/50/75/100% slices of the
      // training pool (doc_id mod 4 < k — deterministic, NESTED so the
      // curve is monotone in data, never resampled), evaluate every
      // fit on the SAME fixed 20% holdout (doc_id mod 5 = 0) — the
      // plot that says whether more data or a better model is the next
      // dollar. Four 6-round GD chains (driver state = 4 doubles each);
      // the oracle replays four prefixed training chains and scores
      // the holdout identically.
      (s, d) => {
        val fb = logregFeatures(s, d)
        val eval0 = fb.filter(pmod(col("doc_id"), lit(5)) === 0)
        (1 to 4).map { k =>
          val train = fb.filter(pmod(col("doc_id"), lit(5)) =!= 0
            && pmod(col("doc_id"), lit(4)) < k)
          val (w, rep) = graft.operators.Learn.logisticGd(
            train, logregCols, "y", iters = 6, lr = 2.0)
          graft.operators.Learn.scoreReport(eval0, logregCols, "y", w)
            .select(lit(k * 25L).as("train_pct"),
              lit(rep.head().getLong(0)).as("n_train"),
              col("n").as("n_eval"),
              round(col("n_correct").cast("double") / col("n"), 6)
                .as("accuracy"),
              col("log_loss"))
        }.reduce(_.unionByName(_)).orderBy("train_pct")
      },
      Some {
        def ev(k: Int): String =
          s"""e$k AS (
             |  SELECT ${k * 25} AS train_pct,
             |    (SELECT COUNT(*) FROM s${k}_f) AS n_train,
             |    COUNT(*) AS n_eval,
             |    ROUND(CAST(SUM(CASE WHEN (mg >= 0) = (y = 1.0)
             |      THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
             |      AS accuracy,
             |    ROUND(AVG(-(y * ln(p) + (1.0 - y) * ln(1.0 - p))), 6)
             |      AS log_loss
             |  FROM (SELECT y,
             |      w.b + w.w1 * x1 + w.w2 * x2 + w.w3 * x3 AS mg,
             |      1.0 / (1.0 + exp(-(w.b + w.w1 * x1 + w.w2 * x2
             |        + w.w3 * x3))) AS p
             |    FROM fb, s${k}_w6 w WHERE fb.doc_id % 5 = 0))"""
            .stripMargin
        s"""WITH $logregFeatureSql,
           |${(1 to 4).map(k => logregChainParts(s"s${k}_",
              s"WHERE doc_id % 5 <> 0 AND doc_id % 4 < $k"))
              .mkString(",\n")},
           |${(1 to 4).map(ev).mkString(",\n")}
           |SELECT * FROM e1 UNION ALL SELECT * FROM e2
           |UNION ALL SELECT * FROM e3 UNION ALL SELECT * FROM e4
           |ORDER BY train_pct""".stripMargin
      }),

    Q("lineitem_lag_icc", // intraclass correlation of fulfillment lag:
      // is lead time a SUPPLIER property or per-shipment noise? One-way
      // random-effects ICC(1) from the ANOVA decomposition —
      // MS_between/MS_within over exact integer moments per supplier
      // (in-contract lags, the established 0..120 filter), with k₀ the
      // unbalanced-design group size. ICC ≈ 0 on this fixture is the
      // honest answer: the generator gives suppliers no identity.
      (s, d) => {
        val lg = t(s, d, "lineitem")
          .select(col("l_suppkey"), col("l_orderkey"),
            to_date(col("l_shipdate")).as("sd"))
          .join(t(s, d, "orders").select(col("o_orderkey"),
            to_date(col("o_orderdate")).as("od")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("l_suppkey"),
            datediff(col("sd"), col("od")).cast("long").as("x"))
          .filter(col("x").between(0, 120))
        val g = lg.groupBy("l_suppkey")
          .agg(count(lit(1)).as("n"), sum("x").as("s"),
            sum(col("x") * col("x")).as("ss"))
        val a = g.agg(count(lit(1)).as("k"), sum("n").as("nn"),
          sum("s").as("st"), sum("ss").as("sst"),
          sum(col("s").cast("double") * col("s") / col("n")).as("qg"),
          sum(col("n") * col("n")).as("sn2"))
        val cf = col("st").cast("double") * col("st") / col("nn")
        val ssb = col("qg") - cf
        val ssw = col("sst").cast("double") - col("qg")
        val msb = ssb / (col("k") - 1)
        val msw = ssw / (col("nn") - col("k"))
        val k0 = (col("nn").cast("double")
          - col("sn2").cast("double") / col("nn")) / (col("k") - 1)
        a.select(col("k").as("n_suppliers"), col("nn").as("n_lines"),
          round(msb, 4).as("ms_between"), round(msw, 4).as("ms_within"),
          round((msb - msw) / (msb + (k0 - 1) * msw), 6).as("icc1"))
      },
      Some("""WITH lg AS (SELECT l_suppkey,
             |    date_diff('day', CAST(o_orderdate AS DATE),
             |      CAST(l_shipdate AS DATE)) AS x
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  WHERE date_diff('day', CAST(o_orderdate AS DATE),
             |    CAST(l_shipdate AS DATE)) BETWEEN 0 AND 120),
             |g AS (SELECT l_suppkey, COUNT(*) AS n,
             |    CAST(SUM(x) AS BIGINT) AS s,
             |    CAST(SUM(x * x) AS BIGINT) AS ss
             |  FROM lg GROUP BY 1),
             |a AS (SELECT COUNT(*) AS k, CAST(SUM(n) AS BIGINT) AS nn,
             |    CAST(SUM(s) AS BIGINT) AS st,
             |    CAST(SUM(ss) AS BIGINT) AS sst,
             |    SUM(CAST(s AS DOUBLE) * s / n) AS qg,
             |    CAST(SUM(n * n) AS BIGINT) AS sn2
             |  FROM g)
             |SELECT k AS n_suppliers, nn AS n_lines,
             |  ROUND((qg - CAST(st AS DOUBLE) * st / nn) / (k - 1), 4)
             |    AS ms_between,
             |  ROUND((CAST(sst AS DOUBLE) - qg) / (nn - k), 4)
             |    AS ms_within,
             |  ROUND(((qg - CAST(st AS DOUBLE) * st / nn) / (k - 1)
             |    - (CAST(sst AS DOUBLE) - qg) / (nn - k))
             |    / ((qg - CAST(st AS DOUBLE) * st / nn) / (k - 1)
             |      + ((CAST(nn AS DOUBLE) - CAST(sn2 AS DOUBLE) / nn)
             |        / (k - 1) - 1)
             |        * ((CAST(sst AS DOUBLE) - qg) / (nn - k))), 6)
             |    AS icc1
             |FROM a""".stripMargin)),

    Q("lineitem_partial_correlation", // partial correlation of quantity
      // and price CONTROLLING for discount — r_xy·z from the three
      // pairwise Pearson correlations (each from exact integer-scaled
      // moments), the first-order test for "is that correlation just
      // the third variable". All three inputs scale to exact integer
      // units (qty, cents, discount bps); only the final closed form
      // is float.
      (s, d) => {
        val v = t(s, d, "lineitem").select(
          col("l_quantity").cast("long").as("x"),
          round(col("l_extendedprice") * 100, 0).cast("long").as("y"),
          round(col("l_discount") * 10000, 0).cast("long").as("z"))
        val m = v.agg(count(lit(1)).as("n"),
          sum("x").as("sx"), sum("y").as("sy"), sum("z").as("sz"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y").cast("double") * col("y")).as("syy"),
          sum(col("z") * col("z")).as("szz"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("z")).as("sxz"),
          sum(col("y") * col("z")).as("syz"))
        def r(sab: Column, sa: Column, sb: Column, saa: Column,
            sbb: Column): Column =
          (col("n") * sab.cast("double") - sa.cast("double") * sb) /
            sqrt((col("n") * saa.cast("double") - sa.cast("double") * sa)
              * (col("n") * sbb.cast("double") - sb.cast("double") * sb))
        val rxy = r(col("sxy"), col("sx"), col("sy"), col("sxx"),
          col("syy"))
        val rxz = r(col("sxz"), col("sx"), col("sz"), col("sxx"),
          col("szz"))
        val ryz = r(col("syz"), col("sy"), col("sz"), col("syy"),
          col("szz"))
        m.select(col("n").as("n_lines"),
          round(rxy, 6).as("r_qty_price"),
          round(rxz, 6).as("r_qty_discount"),
          round(ryz, 6).as("r_price_discount"),
          round((rxy - rxz * ryz)
            / sqrt((lit(1.0) - rxz * rxz) * (lit(1.0) - ryz * ryz)), 6)
            .as("partial_r_qty_price"))
      },
      Some("""WITH v AS (SELECT CAST(l_quantity AS BIGINT) AS x,
             |    CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS y,
             |    CAST(ROUND(l_discount * 10000, 0) AS BIGINT) AS z
             |  FROM lineitem),
             |m AS (SELECT COUNT(*) AS n,
             |    CAST(SUM(x) AS BIGINT) AS sx,
             |    CAST(SUM(y) AS BIGINT) AS sy,
             |    CAST(SUM(z) AS BIGINT) AS sz,
             |    CAST(SUM(x * x) AS BIGINT) AS sxx,
             |    SUM(CAST(y AS DOUBLE) * y) AS syy,
             |    CAST(SUM(z * z) AS BIGINT) AS szz,
             |    CAST(SUM(x * y) AS BIGINT) AS sxy,
             |    CAST(SUM(x * z) AS BIGINT) AS sxz,
             |    CAST(SUM(y * z) AS BIGINT) AS syz
             |  FROM v),
             |r AS (SELECT n,
             |    (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
             |      / sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
             |        * sx) * (n * syy - CAST(sy AS DOUBLE) * sy))
             |      AS rxy,
             |    (n * CAST(sxz AS DOUBLE) - CAST(sx AS DOUBLE) * sz)
             |      / sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
             |        * sx) * (n * CAST(szz AS DOUBLE)
             |        - CAST(sz AS DOUBLE) * sz)) AS rxz,
             |    (n * CAST(syz AS DOUBLE) - CAST(sy AS DOUBLE) * sz)
             |      / sqrt((n * syy - CAST(sy AS DOUBLE) * sy)
             |        * (n * CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE)
             |        * sz)) AS ryz
             |  FROM m)
             |SELECT n AS n_lines, ROUND(rxy, 6) AS r_qty_price,
             |  ROUND(rxz, 6) AS r_qty_discount,
             |  ROUND(ryz, 6) AS r_price_discount,
             |  ROUND((rxy - rxz * ryz)
             |    / sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz)), 6)
             |    AS partial_r_qty_price
             |FROM r""".stripMargin)),

    Q("doc_dup_rate_rarefaction", // does the duplicate rate GROW with
      // the corpus? Near-dup PAIR counts on nested deterministic
      // 25/50/75/100% md5 samples (this fixture has zero exact or
      // normalized-bag duplicates — its duplication lives in the
      // shingle-jaccard pairs, so that is what rarefies): pair
      // formation is quadratic in overlapping docs, and the measured
      // curve (0 → 3 → 12 → 21 pairs) IS the proof that a pilot
      // sample UNDERSTATES 100 TB dedup savings. Pairs come from the
      // SHARED pair relation, sampled by endpoint — never re-paired
      // per rate.
      (s, d) => {
        def hv(c: Column): Column =
          conv(substring(md5(concat(lit("rar:"), c.cast("string"))),
            1, 4), 16, 10).cast("long")
        val pairs = graft.operators.Dedup
          .ngramJaccardOf(shinglePairIndex(s, d), threshold = 0.02)
          .select(hv(col("id_a")).as("ha"), hv(col("id_b")).as("hb"))
        val docs = t(s, d, "documents")
          .select(hv(col("doc_id")).as("hd"))
        val grid = typedLit(Seq((25, 16384L), (50, 32768L),
          (75, 49152L), (100, 65536L)))
        val nd = docs.select(col("hd"), explode(grid).as("r"))
          .filter(col("hd") < col("r._2"))
          .groupBy(col("r._1").as("rate_pct"))
          .agg(count(lit(1)).as("n_docs"))
        val np = pairs.select(col("ha"), col("hb"),
            explode(grid).as("r"))
          .filter(col("ha") < col("r._2") && col("hb") < col("r._2"))
          .groupBy(col("r._1").as("rate_pct"))
          .agg(count(lit(1)).as("n_pairs"))
        nd.join(np, Seq("rate_pct"), "left")
          .select(col("rate_pct").cast("long").as("rate_pct"),
            col("n_docs"), coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
            round(coalesce(col("n_pairs"), lit(0L)) * lit(1000.0)
              / col("n_docs"), 4).as("pairs_per_1k_docs"))
          .orderBy("rate_pct")
      },
      Some("""WITH d AS (SELECT doc_id, source,
             |    list_distinct(list_transform(
             |      range(0, greatest(len(t) - 2, 1)),
             |      i -> array_to_string(t[(i+1):(i+3)], ' '))) AS sh,
             |    ('0x' || substr(md5('rar:' || CAST(doc_id AS VARCHAR)),
             |      1, 4))::BIGINT AS hv
             |  FROM (SELECT doc_id, source,
             |      string_split_regex(lower(trim(text)), '\s+') AS t
             |    FROM documents)),
             |pairs AS (SELECT a.hv AS ha, b.hv AS hb
             |  FROM d a JOIN d b
             |    ON a.source = b.source AND a.doc_id < b.doc_id
             |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             |      / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.02),
             |grid AS (SELECT * FROM (VALUES (25, 16384), (50, 32768),
             |    (75, 49152), (100, 65536)) AS r(rate_pct, thr)),
             |nd AS (SELECT rate_pct, COUNT(*) AS n_docs
             |  FROM d, grid WHERE hv < thr GROUP BY 1),
             |np AS (SELECT rate_pct, COUNT(*) AS n_pairs
             |  FROM pairs, grid WHERE ha < thr AND hb < thr GROUP BY 1)
             |SELECT CAST(nd.rate_pct AS BIGINT) AS rate_pct, n_docs,
             |  CAST(COALESCE(n_pairs, 0) AS BIGINT) AS n_pairs,
             |  ROUND(COALESCE(n_pairs, 0) * 1000.0 / n_docs, 4)
             |    AS pairs_per_1k_docs
             |FROM nd LEFT JOIN np USING (rate_pct)
             |ORDER BY rate_pct""".stripMargin)))

  /** SPRT model constants (H0 p=0.18, H1 p=0.22, α=β=0.05), computed
    * once JVM-side and inlined into both engines' expressions so neither
    * engine's `ln` implementation enters the comparison. */
  private val SprtLr1: Double = math.log(0.22 / 0.18)
  private val SprtLr0: Double = math.log(0.78 / 0.82)
  private val SprtBound: Double = math.log(0.95 / 0.05)

  /** ln(256/16) for the evenly-spaced 3-point Hurst OLS slope, inlined
    * into both engines (the SPRT constant pattern). */
  private val HURST_LN16: Double = math.log(16.0)
  // Wave 30 (r8): training-data ECONOMICS + monitoring — the allocator
  // that turns corpus sizes into an epoch schedule, preference-strength
  // fitting over pairwise comparisons, and exact-integer sequential
  // change-point detection.
  private def wave30Queries: Seq[Q] = Seq(
    Q("doc_epoch_waterfill", // data-constrained epoch allocator
      // (the Muennighoff-style "how many times may each domain repeat"
      // table): a char budget of 3× the corpus is water-filled across
      // languages at a UNIFORM target share, each language capped at 4
      // epochs of its own size; a capped language freezes at its cap
      // and its unfilled share re-spreads over the survivors (3 rounds
      // — enough for any cap cascade on a bounded domain grain). ONE
      // corpus scan collapses to the ≤|langs| grain (localCheckpoint:
      // the round algebra must not re-scan the corpus per round); all
      // allocation arithmetic is exact integer division, epochs is the
      // single exact-long division at the boundary. At sf0.01: de/es/fr
      // cap in round 1, zh in round 2, en absorbs the rest — all three
      // rounds genuinely exercised.
      (s, d) => {
        val dom = t(s, d, "documents")
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(length(col("text"))).as("corpus_chars"))
          .withColumn("cap_chars", col("corpus_chars") * 4)
          .localCheckpoint(eager = true) // ≤|langs| rows, 4 round consumers
        val tot = dom.agg((sum("corpus_chars") * 3).as("budget"))
        var st = dom.crossJoin(broadcast(tot))
          .withColumn("capped_round", lit(0))
        for (r <- 1 to 3) {
          val sc = st.agg(
            sum(when(col("capped_round") === 0, 0L)
              .otherwise(col("cap_chars"))).as("used"),
            sum(when(col("capped_round") === 0, 1L).otherwise(0L))
              .as("n_u"))
          st = st.crossJoin(broadcast(sc))
            .withColumn("capped_round",
              when(col("capped_round") === 0 &&
                col("cap_chars") <= expr("(budget - used) div n_u"),
                lit(r)).otherwise(col("capped_round")))
            .drop("used", "n_u")
        }
        val fin = st.agg(
          sum(when(col("capped_round") === 0, 0L)
            .otherwise(col("cap_chars"))).as("used"),
          sum(when(col("capped_round") === 0, 1L).otherwise(0L)).as("n_u"))
        st.crossJoin(broadcast(fin))
          .withColumn("alloc_chars",
            when(col("capped_round") > 0, col("cap_chars"))
              .otherwise(expr("(budget - used) div n_u")))
          .select(col("lang"), col("n_docs"), col("corpus_chars"),
            col("cap_chars"), col("alloc_chars"),
            round(col("alloc_chars").cast("double")
              / col("corpus_chars"), 6).as("epochs"),
            col("capped_round"))
          .orderBy("lang")
      },
      Some("""WITH dom AS MATERIALIZED (
             |  SELECT lang, COUNT(*) AS n_docs,
             |    CAST(SUM(length(text)) AS BIGINT) AS sz
             |  FROM documents GROUP BY 1),
             |t0 AS (SELECT CAST(SUM(sz) AS BIGINT) * 3 AS budget,
             |  CAST(COUNT(*) AS BIGINT) AS k FROM dom),
             |r1 AS MATERIALIZED (
             |  SELECT lang, n_docs, sz, sz * 4 AS cap,
             |    CASE WHEN sz * 4 <= budget // k THEN 1 ELSE 0 END AS cr
             |  FROM dom, t0),
             |s1 AS (SELECT
             |    CAST(SUM(CASE WHEN cr > 0 THEN cap ELSE 0 END) AS BIGINT)
             |      AS used,
             |    CAST(SUM(CASE WHEN cr = 0 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_u FROM r1),
             |r2 AS MATERIALIZED (
             |  SELECT lang, n_docs, sz, cap,
             |    CASE WHEN cr > 0 THEN cr
             |      WHEN cap <= (budget - used) // n_u THEN 2
             |      ELSE 0 END AS cr
             |  FROM r1, s1, t0),
             |s2 AS (SELECT
             |    CAST(SUM(CASE WHEN cr > 0 THEN cap ELSE 0 END) AS BIGINT)
             |      AS used,
             |    CAST(SUM(CASE WHEN cr = 0 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_u FROM r2),
             |r3 AS MATERIALIZED (
             |  SELECT lang, n_docs, sz, cap,
             |    CASE WHEN cr > 0 THEN cr
             |      WHEN cap <= (budget - used) // n_u THEN 3
             |      ELSE 0 END AS cr
             |  FROM r2, s2, t0),
             |s3 AS (SELECT
             |    CAST(SUM(CASE WHEN cr > 0 THEN cap ELSE 0 END) AS BIGINT)
             |      AS used,
             |    CAST(SUM(CASE WHEN cr = 0 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_u FROM r3),
             |fin AS (SELECT lang, n_docs, sz, cap, cr,
             |    CASE WHEN cr > 0 THEN cap
             |      ELSE (budget - used) // n_u END AS alloc
             |  FROM r3, s3, t0)
             |SELECT lang, n_docs, sz AS corpus_chars, cap AS cap_chars,
             |  alloc AS alloc_chars,
             |  ROUND(CAST(alloc AS DOUBLE) / sz, 6) AS epochs,
             |  CAST(cr AS INT) AS capped_round
             |FROM fin ORDER BY lang""".stripMargin)),

    Q("doc_bradley_terry", // Bradley–Terry preference strengths over
      // pairwise comparisons — the fit behind reward-model and
      // human-preference leaderboards, run here over cross-language
      // length preferences: documents pair within id-derived buckets
      // (bucket count scales with the corpus, so occupancy — and
      // per-bucket pair fan-out — stays CONSTANT: pairs are linear in
      // n, never all-pairs), the longer text wins, and 3
      // minorization–maximization rounds fit strengths on the bounded
      // ≤|langs|² wins matrix (localCheckpointed — round algebra never
      // re-pairs the corpus). Isolated best-of-5 2.56 s at sf0.1: the
      // only data-sized work is the one linear pair build; the rest is
      // ~10 bounded-grain barrier jobs (index checkpoints + per-round
      // normalizer broadcast + round checkpoint), fixed overhead that
      // does not grow with the corpus. Strengths renormalize and round 6dp at
      // every round boundary on both engines (the iterative-chain
      // protocol); sums inside a round span ≤|langs| terms.
      (s, d) => {
        val docs = t(s, d, "documents")
        val nb = math.max(1L, docs.count() / 4)
        val dd = docs.select(col("lang"), length(col("text")).as("len"),
          (col("doc_id") % nb).as("b"))
        val games = dd.toDF("la", "xa", "b")
          .join(dd.toDF("lb", "xb", "b"), Seq("b"))
          .filter(col("la") < col("lb") && col("xa") =!= col("xb"))
          .select(when(col("xa") > col("xb"), col("la")).otherwise(col("lb"))
              .as("w"),
            when(col("xa") > col("xb"), col("lb")).otherwise(col("la"))
              .as("l"))
          .groupBy("w", "l").agg(count(lit(1)).as("n"))
          .localCheckpoint(eager = true) // ≤|langs|² rows, 3 MM rounds
        val cells = games.select(col("w").as("i"), col("l").as("j"), col("n"))
          .unionByName(
            games.select(col("l").as("i"), col("w").as("j"), col("n")))
          .groupBy("i", "j").agg(sum("n").as("nij"))
          .localCheckpoint(eager = true)
        val wins = cells.select(col("i").as("lang")).distinct()
          .join(games.groupBy(col("w").as("lang"))
            .agg(sum("n").as("wins")), Seq("lang"), "left_outer")
          .na.fill(0L, Seq("wins"))
        val k = cells.select(col("i")).distinct()
          .agg(count(lit(1)).as("k"))
        var p = cells.select(col("i").as("lang")).distinct()
          .crossJoin(broadcast(k))
          .select(col("lang"), round(lit(1.0) / col("k"), 6).as("p"))
        for (_ <- 1 to 3) {
          // checkpoint p each round: it feeds THREE consumers next round
          // (pi/pj joins + the normalizer broadcast), and a lazy chain
          // re-runs the whole prior-round subtree per consumer — the
          // exponential fan-out tripled the round cost (5.2 → 2.8 s
          // isolated at sf0.1); the frame is ≤|langs| rows, so the
          // barrier is free. praw itself stays lazy: it is ≤|langs|²
          // rows of joins over the checkpointed cells/p.
          val praw = cells
            .join(p.toDF("i", "pi"), Seq("i"))
            .join(p.toDF("j", "pj"), Seq("j"))
            .groupBy(col("i").as("lang"))
            .agg(sum(col("nij") / (col("pi") + col("pj"))).as("den"))
            .join(wins, Seq("lang"))
            .select(col("lang"), (col("wins") / col("den")).as("praw"))
          val z = praw.agg(sum("praw").as("z"))
          p = praw.crossJoin(broadcast(z))
            .select(col("lang"), round(col("praw") / col("z"), 6).as("p"))
            .localCheckpoint(eager = true)
        }
        val ng = cells.groupBy(col("i").as("lang"))
          .agg(sum("nij").as("n_games"))
        val wRank = Window.orderBy(col("p").desc, col("lang"))
        wins.join(ng, Seq("lang")).join(p, Seq("lang"))
          .select(col("lang"), col("wins"), col("n_games"),
            col("p").as("bt_strength"),
            rank().over(wRank).cast("long").as("bt_rank"))
          .orderBy("lang")
      },
      Some("""WITH n0 AS (SELECT GREATEST(1, COUNT(*) // 4) AS nb
             |  FROM documents),
             |d AS (SELECT doc_id, lang, length(text) AS len, doc_id % nb AS b
             |  FROM documents, n0),
             |games AS MATERIALIZED (
             |  SELECT CASE WHEN a.len > b.len THEN a.lang ELSE b.lang END AS w,
             |         CASE WHEN a.len > b.len THEN b.lang ELSE a.lang END AS l,
             |         COUNT(*) AS n
             |  FROM d a JOIN d b ON a.b = b.b AND a.lang < b.lang
             |    AND a.len <> b.len
             |  GROUP BY 1, 2),
             |cells AS MATERIALIZED (
             |  SELECT i, j, CAST(SUM(n) AS BIGINT) AS nij FROM (
             |    SELECT w AS i, l AS j, n FROM games
             |    UNION ALL SELECT l AS i, w AS j, n FROM games) u
             |  GROUP BY 1, 2),
             |langs AS MATERIALIZED (SELECT DISTINCT i AS lang FROM cells),
             |nl AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM langs),
             |wtot AS MATERIALIZED (
             |  SELECT lang, CAST(COALESCE(SUM(n), 0) AS BIGINT) AS wins
             |  FROM langs LEFT JOIN games ON w = lang GROUP BY 1),
             |p0 AS MATERIALIZED (SELECT lang, ROUND(1.0 / k, 6) AS p
             |  FROM langs, nl),
             |r1 AS MATERIALIZED (
             |  SELECT c.i AS lang, w.wins / SUM(c.nij / (pi.p + pj.p)) AS praw
             |  FROM cells c JOIN p0 pi ON pi.lang = c.i
             |    JOIN p0 pj ON pj.lang = c.j
             |    JOIN wtot w ON w.lang = c.i GROUP BY 1, w.wins),
             |p1 AS MATERIALIZED (SELECT lang,
             |    ROUND(praw / (SELECT SUM(praw) FROM r1), 6) AS p FROM r1),
             |r2 AS MATERIALIZED (
             |  SELECT c.i AS lang, w.wins / SUM(c.nij / (pi.p + pj.p)) AS praw
             |  FROM cells c JOIN p1 pi ON pi.lang = c.i
             |    JOIN p1 pj ON pj.lang = c.j
             |    JOIN wtot w ON w.lang = c.i GROUP BY 1, w.wins),
             |p2 AS MATERIALIZED (SELECT lang,
             |    ROUND(praw / (SELECT SUM(praw) FROM r2), 6) AS p FROM r2),
             |r3 AS MATERIALIZED (
             |  SELECT c.i AS lang, w.wins / SUM(c.nij / (pi.p + pj.p)) AS praw
             |  FROM cells c JOIN p2 pi ON pi.lang = c.i
             |    JOIN p2 pj ON pj.lang = c.j
             |    JOIN wtot w ON w.lang = c.i GROUP BY 1, w.wins),
             |p3 AS MATERIALIZED (SELECT lang,
             |    ROUND(praw / (SELECT SUM(praw) FROM r3), 6) AS p FROM r3)
             |SELECT l.lang, w.wins, g.n_games, p.p AS bt_strength,
             |  CAST(RANK() OVER (ORDER BY p.p DESC, l.lang) AS BIGINT)
             |    AS bt_rank
             |FROM langs l JOIN wtot w USING (lang) JOIN p3 p USING (lang)
             |  JOIN (SELECT i AS lang, CAST(SUM(nij) AS BIGINT) AS n_games
             |        FROM cells GROUP BY 1) g USING (lang)
             |ORDER BY l.lang""".stripMargin)),

    Q("events_cusum_alarm", // sequential change-ALARM (distinct from
      // events_cusum_changepoint, which locates the most likely shift
      // point retrospectively — this one fires online, with a
      // threshold): a reset-at-zero CUSUM over daily event counts, as
      // cumsum − running-min (the window identity for max(0, S+x)
      // recursion — two windows, no recursion). Everything is EXACT
      // integer arithmetic: deviations are scaled by n_days
      // (y = nd·c − tot, which sums to zero over the history), the
      // alarm threshold is 100 raw excess events (scaled: 100·nd).
      // Two monitors populate both regimes: the observed stationary
      // series (negative control — must NOT alarm) and the detector's
      // self-test with a deterministic +10% injection after day 20
      // (positive control — must alarm), the standard canary a
      // production change-point monitor ships with.
      (s, d) => {
        val daily = t(s, d, "events")
          .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(count(lit(1)).as("c"))
        val m = daily.agg(count(lit(1)).as("nd"), sum("c").as("tot"))
        val sr = daily.crossJoin(broadcast(m))
          .withColumn("t",
            row_number().over(Window.orderBy("day")).cast("long"))
        val obs = sr.select(lit("observed").as("monitor"), col("day"),
          col("t"), (col("nd") * col("c") - col("tot")).as("y"), col("nd"))
        val inj = sr.select(lit("injected").as("monitor"), col("day"),
          col("t"),
          (col("nd") * (col("c") +
            when(col("t") > 20, expr("c div 10")).otherwise(0L))
            - col("tot")).as("y"),
          col("nd"))
        val w = Window.partitionBy("monitor").orderBy("t")
        obs.unionByName(inj)
          .withColumn("cy", sum("y").over(w))
          .withColumn("s", col("cy") - min("cy").over(w))
          .groupBy("monitor")
          .agg(count(lit(1)).as("n_days"),
            round(max(col("s")).cast("double") / max(col("nd")), 4)
              .as("max_excess"),
            coalesce(min(when(col("s") > lit(100L) * col("nd"),
              col("day"))), lit("none")).as("alarm_day"),
            coalesce(min(when(col("s") > lit(100L) * col("nd"),
              col("t"))), lit(-1L)).as("alarm_t"))
          .orderBy("monitor")
      },
      Some("""WITH daily AS (
             |  SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS c
             |  FROM events GROUP BY 1),
             |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd,
             |  CAST(SUM(c) AS BIGINT) AS tot FROM daily),
             |sr AS (SELECT day, c,
             |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
             |    nd, tot FROM daily, m),
             |mon AS (
             |  SELECT 'observed' AS monitor, day, t, nd * c - tot AS y, nd
             |  FROM sr
             |  UNION ALL
             |  SELECT 'injected', day, t,
             |    nd * (c + CASE WHEN t > 20 THEN c // 10 ELSE 0 END) - tot,
             |    nd
             |  FROM sr),
             |cs AS (SELECT monitor, day, t, nd,
             |    CAST(SUM(y) OVER (PARTITION BY monitor ORDER BY t)
             |      AS BIGINT) AS cy FROM mon),
             |st AS (SELECT monitor, day, t, nd,
             |    cy - MIN(cy) OVER (PARTITION BY monitor ORDER BY t) AS s
             |  FROM cs)
             |SELECT monitor, COUNT(*) AS n_days,
             |  ROUND(CAST(MAX(s) AS DOUBLE) / MAX(nd), 4) AS max_excess,
             |  COALESCE(MIN(CASE WHEN s > 100 * nd THEN day END), 'none')
             |    AS alarm_day,
             |  COALESCE(MIN(CASE WHEN s > 100 * nd THEN t END), -1)
             |    AS alarm_t
             |FROM st GROUP BY 1 ORDER BY monitor""".stripMargin)))

  // -- driver contract ------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    // the Seq collapses into a Map — a duplicated name would silently
    // DROP a query from the driver's correctness gate, so fail loudly
    val names = registry.map(_.name)
    require(names.distinct.size == names.size,
      s"duplicate query names: ${names.diff(names.distinct).distinct}")
    registry.map(q => q.name -> q.run).toMap
  }

  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap ++
      kmeansIvfOracleSql.map("emb_kmeans_ivf_topk" -> _)

  /** Oracle for `emb_kmeans_ivf_topk`, attached lazily: the seeded MLlib
    * KMeans model is a deterministic function of (fixture, seed), so its
    * 8 learned centers are trained here once against the DECLARED sf0.01
    * fixture and inlined as SQL literals — the same model-constants
    * pattern the LSH-plane oracles use — while everything downstream of
    * the model (argmin assignment with the lowest-cluster tie-break, the
    * per-list mean centroids, the cosine probe, the final ranking)
    * replays in portable SQL. Training needs a live session and the
    * fixture on disk; when either is missing this degrades to None and
    * the driver records its weaker rows-only check, exactly as before.
    */
  private lazy val kmeansIvfOracleSql: Option[String] = scala.util.Try {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val s = SparkSession.builder().getOrCreate()
    val withFeat = t(s, "/root/testdata/sf0.01", "embeddings")
      .filter(col("vec_id") =!= 0)
      .withColumn("features",
        array_to_vector(col("embedding").cast("array<double>")))
    val model = new KMeans().setK(8).setSeed(42L).setMaxIter(10)
      .setFeaturesCol("features").setPredictionCol("ivf_cluster")
      .fit(withFeat)
    // Double.toString is the shortest round-trip decimal: DuckDB parses
    // it back to the identical IEEE double the assignment compares
    val centerRows = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      s"($i, [${c.toArray.map(_.toString).mkString(", ")}])"
    }.mkString(",\n|    ")
    s"""WITH e AS (SELECT vec_id,
       |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings WHERE vec_id <> 0),
       |q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
       |  FROM embeddings WHERE vec_id = 0),
       |cm AS (SELECT * FROM (VALUES
       |    $centerRows) AS t(cl, c)),
       |am AS MATERIALIZED (SELECT vec_id, v, cl FROM (
       |  SELECT e.vec_id AS vec_id, e.v AS v, cm.cl AS cl,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY list_sum(list_transform(range(1, 65),
       |        i -> (e.v[i] - cm.c[i]) * (e.v[i] - cm.c[i]))), cm.cl) AS rn
       |  FROM e, cm) WHERE rn = 1),
       |mm AS (SELECT cl, t.dim, AVG(v[t.dim]) AS m
       |  FROM am, range(1, 65) AS t(dim) GROUP BY cl, t.dim),
       |nn AS (SELECT cl, list(m ORDER BY dim) AS c FROM mm GROUP BY cl),
       |near AS (SELECT nn.cl FROM nn, q
       |  ORDER BY list_cosine_similarity(nn.c, qv) DESC, nn.cl LIMIT 3)
       |SELECT vec_id, ROUND(list_cosine_similarity(v, qv), 6) AS cos
       |FROM am, q WHERE cl IN (SELECT cl FROM near)
       |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin
  }.toOption
}
