package graft

import org.apache.spark.sql.functions._

import graft.operators.DataQuality
import graft.operators.DataQuality.Check

/** DataQuality audits must measure violation fractions exactly — a check
  * that always passes is worse than no check. Violations are injected
  * with known counts and the reported fractions asserted to the digit.
  */
class DataQualitySpec extends SparkSuite {
  import spark.implicits._

  test("audit measures completeness, uniqueness, and range fractions exactly") {
    // 10 rows: 2 null names, ids 1..9 with one dup, 3 negative amounts
    val df = Seq(
      (1, Some("a"), 10.0), (2, Some("b"), -1.0), (3, Some("c"), 5.0),
      (4, None, 2.0), (5, Some("e"), -3.0), (6, Some("f"), 7.0),
      (7, Some("g"), 1.0), (8, None, 4.0), (9, Some("i"), -9.0),
      (9, Some("j"), 6.0))
      .toDF("id", "name", "amount")
    val out = DataQuality.audit(df, Seq(
        Check("completeness", "name", DataQuality.completeness(col("name"))),
        Check("uniqueness", "id", DataQuality.uniqueness(col("id"))),
        Check("range", "amount>0",
          DataQuality.satisfaction(col("amount") > 0))))
      .orderBy("check_type")
      .as[(String, String, Double, Boolean)].collect()
    assert(out === Array(
      ("completeness", "name", 0.8, false),
      ("range", "amount>0", 0.7, false),
      ("uniqueness", "id", 0.9, false)))
  }

  test("audit passes exactly at the threshold") {
    val df = Seq(1, 2, 3, 4).toDF("id")
    val out = DataQuality.audit(df,
        Seq(Check("uniqueness", "id", DataQuality.uniqueness(col("id")))))
      .as[(String, String, Double, Boolean)].collect()
    assert(out === Array(("uniqueness", "id", 1.0, true)))
  }

  test("referential reports the matched fraction against dedup'd parent keys") {
    val child = Seq(1, 1, 2, 3, 9).toDF("fk") // 9 is an orphan
    // duplicate parent keys must not multiply child rows
    val parent = Seq(1, 1, 2, 3, 4).toDF("pk")
    val out = DataQuality.referential(child, "fk", parent, "pk", "fk->pk")
      .as[(String, String, Double, Boolean)].collect()
    assert(out === Array(("referential", "fk->pk", 0.8, false)))
  }

  test("null child keys count as orphans") {
    val child = Seq(Some(1), None, Some(2)).toDF("fk")
    val parent = Seq(1, 2).toDF("pk")
    val out = DataQuality.referential(child, "fk", parent, "pk", "fk->pk")
      .as[(String, String, Double, Boolean)].collect()
    assert(out(0)._3 === (2.0 / 3 * 1e6).round / 1e6)
  }

  // three quasi-id classes: ("us",1)×3, ("us",2)×2, ("de",1)×1
  private lazy val people = Seq(
    (1, "us", 1), (2, "us", 1), (3, "us", 1),
    (4, "us", 2), (5, "us", 2),
    (6, "de", 1)
  ).toDF("id", "region", "bracket")

  test("kAnonymity reports achieved k, suppression cost, and survivor audit") {
    val r = DataQuality.kAnonymity(people, Seq("region", "bracket"), 2)
      .as[(Long, Long, Long, Long, Long, Option[Long])].head()
    // 3 classes, k=1, one class <2 costing 1 row; survivors 3+2=5 at floor 2
    assert(r === ((3L, 1L, 1L, 1L, 5L, Some(2L))))
    val strict = DataQuality.kAnonymity(people, Seq("region", "bracket"), 4)
      .as[(Long, Long, Long, Long, Long, Option[Long])].head()
    // every class sits below k=4: nothing survives, floor undefined
    assert(strict === ((3L, 1L, 3L, 6L, 0L, None)))
    // the report's survivor columns equal an actual kAnonymize re-audit
    val reAudit = DataQuality
      .kAnonymize(people, Seq("region", "bracket"), 2)
      .groupBy("region", "bracket").agg(count(lit(1)).as("n"))
      .agg(sum("n"), min("n")).as[(Long, Long)].head()
    assert(reAudit === ((r._5, r._6.get)))
  }

  test("lDiversity counts distinct sensitive values per class") {
    // sensitive column: id parity. ("us",1) carries {1,0,1}→2 values,
    // ("us",2) carries {0,1}→2, ("de",1) carries {0}→1
    val withSensitive = people.withColumn("parity", $"id" % 2)
    val r = DataQuality
      .lDiversity(withSensitive, Seq("region", "bracket"), "parity", 2)
      .as[(Long, Long, Long, Long)].head()
    assert(r === ((3L, 1L, 1L, 1L))) // 3 classes, min l=1, 1 below, 1 row at risk
    // a constant sensitive column is the worst case: l = 1 everywhere
    val flat = DataQuality
      .lDiversity(people.withColumn("s", lit("x")), Seq("region", "bracket"),
        "s", 2)
      .as[(Long, Long, Long, Long)].head()
    assert(flat === ((3L, 1L, 3L, 6L)))
  }

  test("tCloseness computes total-variation distance per class") {
    // parity sensitive: global q = {0: 1/2, 1: 1/2}. Class distances:
    // ("us",1) p={1:2/3, 0:1/3} → TVD 1/6; ("us",2) balanced → 0;
    // ("de",1) all-0 → 0.5 (the absent value contributes its full q)
    val withSensitive = people.withColumn("parity", $"id" % 2)
    val r = DataQuality
      .tCloseness(withSensitive, Seq("region", "bracket"), "parity", 0.3)
      .as[(Long, Double, Long, Long)].head()
    assert(r._1 === 3L)
    assert(math.abs(r._2 - 0.5) < 1e-9)
    assert(r._3 === 1L) // only the singleton class exceeds t=0.3
    assert(r._4 === 1L)
    // tighter t pulls in the 1/6-distance class too
    val tight = DataQuality
      .tCloseness(withSensitive, Seq("region", "bracket"), "parity", 0.1)
      .as[(Long, Double, Long, Long)].head()
    assert(tight._3 === 2L)
    assert(tight._4 === 4L)
    // a sensitive column distributed identically in every class is 0-close
    val uniform = DataQuality
      .tCloseness(people.withColumn("s", lit("x")),
        Seq("region", "bracket"), "s", 0.01)
      .as[(Long, Double, Long, Long)].head()
    assert(uniform._2 === 0.0 && uniform._3 === 0L)
  }

  test("dpNoisyCount noise is seeded, salt-keyed, and scales as 1/eps") {
    val h = (salt: String, eps: Double) => DataQuality
      .dpNoisyCount(people, "region", eps, salt)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val a = h("s1", 1.0)
    assert(a === h("s1", 1.0)) // reruns reproduce the release exactly
    assert(a !== h("s2", 1.0)) // rotating the salt redraws the noise
    // same salt at double eps: the identical uniform through half the
    // scale — noise exactly halves (up to the 4-decimal rounding)
    val half = h("s1", 2.0)
    val truth = Map("us" -> 5.0, "de" -> 1.0)
    truth.keys.foreach { k =>
      assert(math.abs((half(k) - truth(k)) - (a(k) - truth(k)) / 2) < 1e-3, k)
      // 48-bit uniforms bound |noise| by ln(2^48)/eps ≈ 33.3
      assert(math.abs(a(k) - truth(k)) < 34.0, k)
    }
  }

  test("madOutlierReport flags by modified z-score on exact median/MAD") {
    // values 1,2,3,4,100: median 3, deviations {2,1,0,1,97} → MAD 1;
    // only 100 crosses 0.6745·97 = 65.4 > 3.5
    val vals = Seq(1.0, 2.0, 3.0, 4.0, 100.0).toDF("v")
    val r = DataQuality.madOutlierReport(vals, "v")
      .as[(Double, Double, Long, Long, Double)].head()
    assert(r === ((3.0, 1.0, 5L, 1L, 0.2)))
    // symmetric data with no tail: zero outliers
    val clean = Seq(1.0, 2.0, 3.0, 4.0, 5.0).toDF("v")
    val c = DataQuality.madOutlierReport(clean, "v")
      .as[(Double, Double, Long, Long, Double)].head()
    assert(c._4 === 0L && c._5 === 0.0)
  }

  test("kAnonymize suppresses exactly the small classes") {
    val kept = DataQuality.kAnonymize(people, Seq("region", "bracket"), 2)
      .select("id").as[Int].collect().sorted
    assert(kept === Array(1, 2, 3, 4, 5)) // the ("de",1) singleton drops
    // enforcement achieves the target: re-audit of survivors clears k
    val k2 = DataQuality
      .kAnonymity(DataQuality.kAnonymize(people, Seq("region", "bracket"), 2),
        Seq("region", "bracket"), 2)
      .select("k_anonymity").as[Long].head()
    assert(k2 >= 2L)
    // k above every class size suppresses everything
    assert(DataQuality.kAnonymize(people, Seq("region", "bracket"), 99)
      .count() === 0L)
  }

  test("keySkewReport reproduces the hand-computed Gini and shares") {
    // multiplicities a:4 b:2 c:1 d:1 → ascending counts [1,1,2,4],
    // rank·count sum = 1+2+6+16 = 25,
    // gini = 2·25/(4·8) − 5/4 = 0.3125; top-1% budget = ceil(0.04) = 1
    // key → the c=4 key → share 4/8 = 0.5; max_share likewise 0.5
    val rows = (Seq.fill(4)("a") ++ Seq.fill(2)("b") ++ Seq("c", "d"))
      .toDF("k")
    val r = DataQuality.keySkewReport(rows, "k")
      .as[(Long, Long, Long, Double, Double, Double, Double)].head()
    assert(r === ((4L, 8L, 4L, 2.0, 0.5, 0.5, 0.3125)))
    // uniform distribution: gini exactly 0, every share 1/n_keys
    val uni = (1 to 4).flatMap(i => Seq.fill(3)(s"k$i")).toDF("k")
    val u = DataQuality.keySkewReport(uni, "k")
      .as[(Long, Long, Long, Double, Double, Double, Double)].head()
    assert(u === ((4L, 12L, 3L, 3.0, 0.25, 0.25, 0.0)))
  }

  test("fdAudit: holding FD reports zero error; broken FD counts g1 exactly") {
    val df = Seq(
      ("a", 1, "x"), ("a", 1, "y"), ("b", 2, "x"),
      ("b", 2, "x"), ("c", 2, "y")).toDF("k", "n", "s")
    // k -> n holds: every k maps to one n
    val hold = DataQuality.fdAudit(df, "k->n", col("k"), col("n"))
      .as[(String, Long, Long, Long)].head()
    assert(hold === (("k->n", 3L, 0L, 0L)))
    // n -> s broken for n=2 (x,x,y): delete 1 row to fix; n=1 has (x,y):
    // delete 1 row -> 2 violating groups, g1 = 2
    val broken = DataQuality.fdAudit(df, "n->s", col("n"), col("s"))
      .as[(String, Long, Long, Long)].head()
    assert(broken === (("n->s", 2L, 2L, 2L)))
  }
}
