package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.Literal
import org.scalatest.funsuite.AnyFunSuite

/** The config-driven registration path a real cluster uses:
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions` applies the
  * extension class to every new session. spark.sql.extensions is a STATIC
  * conf read at SparkContext creation, so an end-to-end check would need
  * its own JVM; instead this drives the same mechanics the session
  * builder runs — apply the extension, materialize the function registry,
  * resolve and evaluate each function.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions injects every native function as a resolvable builder") {
    val ext = new SparkSessionExtensions
    new graft.plans.GraftExtensions().apply(ext)
    val registry: FunctionRegistry = FunctionRegistry.builtin.clone()
    org.apache.spark.sql.GraftTestAccess.registerFunctions(ext, registry)

    val expected = Seq("graft_dot", "graft_cosine", "graft_simhash",
      "graft_minhash", "graft_stopword_hits", "graft_shingles")
    expected.foreach { name =>
      assert(registry.functionExists(FunctionIdentifier(name)), s"missing $name")
    }

    // builders must produce working expressions, not just registry entries
    val dot = registry.lookupFunction(FunctionIdentifier("graft_dot"),
      Seq(Literal.create(Array(1.0, 2.0)), Literal.create(Array(3.0, 4.0))))
    assert(dot.eval(null) === 11.0)

    val mh = registry.lookupFunction(FunctionIdentifier("graft_minhash"),
      Seq(Literal.create(Array("a b c")), Literal(16)))
    assert(mh.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .numElements() === 16)
  }

  test("programmatic register() is idempotent and covers the same set") {
    val spark = SparkSuite.spark
    graft.plans.GraftFunctions.register(spark)
    graft.plans.GraftFunctions.register(spark) // second call must not throw
    val fns = spark.catalog.listFunctions().collect().map(_.name).toSet
    Seq("graft_dot", "graft_cosine", "graft_simhash", "graft_minhash",
      "graft_stopword_hits", "graft_shingles").foreach { f =>
      assert(fns.contains(f), s"missing $f")
    }
  }

  test("graft_bloom_contains probes a serialized sketch with zero false negatives") {
    val spark = SparkSuite.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    graft.plans.GraftFunctions.register(spark)
    val keys = spark.range(0, 1000).select(xxhash64(col("id")).as("k"))
    val bf = keys.stat.bloomFilter("k", 1000, 0.01)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val probe = spark.range(0, 2000)
      .select(col("id"), call_function("graft_bloom_contains",
        lit(bos.toByteArray), xxhash64(col("id"))).as("hit"))
    // every inserted key must hit (bloom filters have no false negatives)
    assert(probe.filter(col("id") < 1000 && !col("hit")).count() === 0L)
    // the uninserted half mostly misses (1% fpp target, generous bound)
    val fp = probe.filter(col("id") >= 1000 && col("hit")).count()
    assert(fp < 100, s"false-positive count $fp out of 1000")
  }
}
