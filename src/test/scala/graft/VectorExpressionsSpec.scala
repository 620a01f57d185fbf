package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.functions.VectorFunctions
import graft.plans.GraftFunctions

/** Differential tests for the native codegen'd vector expressions
  * (`graft_dot` / `graft_cosine`) against the portable higher-order-
  * function formulations they replaced. The two implementations must be
  * bit-compatible on every input class: float32 fixture embeddings,
  * double arrays, empty arrays, zero vectors, null elements, null
  * arrays, and length mismatches.
  */
class VectorExpressionsSpec extends SparkSuite {
  import spark.implicits._

  GraftFunctions.register(spark)

  private lazy val emb = engine.Tables.load(spark, sfDir, "embeddings").cache()

  test("graft_dot matches the HOF dot on all fixture embeddings (float32)") {
    val shifted = emb.select(
      $"vec_id", $"embedding",
      lead($"embedding", 1).over(
        org.apache.spark.sql.expressions.Window.orderBy("vec_id")).as("other"))
      .filter($"other".isNotNull)
    val mismatches = shifted.select(
        VectorFunctions.dot($"embedding", $"other").as("fast"),
        VectorFunctions.dotHof($"embedding", $"other").as("slow"))
      .filter(abs($"fast" - $"slow") > 1e-9)
      .count()
    assert(mismatches === 0)
  }

  test("graft_l2sq is bit-identical to the HOF l2sq on all fixture embeddings") {
    val shifted = emb.select(
      $"vec_id", $"embedding",
      lead($"embedding", 1).over(
        org.apache.spark.sql.expressions.Window.orderBy("vec_id")).as("other"))
      .filter($"other".isNotNull)
    // bit-identical, not just close: same difference/square/sum order
    val mismatches = shifted.select(
        VectorFunctions.l2Sq($"embedding", $"other").as("fast"),
        VectorFunctions.l2SqHof($"embedding", $"other").as("slow"))
      .filter($"fast" =!= $"slow")
      .count()
    assert(mismatches === 0)
  }

  test("graft_cosine matches the HOF cosine on all fixture embeddings") {
    val paired = emb.as("a").crossJoin(emb.as("b").limit(3))
      .select(col("a.embedding").as("x"), col("b.embedding").as("y"))
    val mismatches = paired.select(
        VectorFunctions.cosine($"x", $"y").as("fast"),
        VectorFunctions.cosineHof($"x", $"y").as("slow"))
      .filter(abs($"fast" - $"slow") > 1e-9)
      .count()
    assert(mismatches === 0)
  }

  test("double-typed arrays work identically through both paths") {
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, -5.0, 6.0)),
      (Seq(0.5, 0.5), Seq(0.5, 0.5))).toDF("a", "b")
    val rows = df.select(
        VectorFunctions.dot($"a", $"b").as("d"),
        VectorFunctions.dotHof($"a", $"b").as("dh"),
        VectorFunctions.cosine($"a", $"b").as("c"),
        VectorFunctions.cosineHof($"a", $"b").as("ch"))
      .as[(Double, Double, Double, Double)].collect()
    rows.foreach { case (d, dh, c, ch) =>
      assert(math.abs(d - dh) < 1e-12)
      assert(math.abs(c - ch) < 1e-12)
    }
    assert(math.abs(rows.head._1 - (4.0 - 10.0 + 18.0)) < 1e-12)
  }

  test("zero vectors yield cosine 0.0, empty arrays dot 0.0") {
    val df = Seq((Seq(0.0, 0.0), Seq(1.0, 2.0)), (Seq.empty[Double], Seq.empty[Double]))
      .toDF("a", "b")
    val rows = df.select(
        VectorFunctions.cosine($"a", $"b").as("c"),
        VectorFunctions.dot($"a", $"b").as("d"))
      .as[(Double, Double)].collect()
    assert(rows(0)._1 === 0.0)
    assert(rows(1)._1 === 0.0)
    assert(rows(1)._2 === 0.0)
  }

  test("null array, null element, and length mismatch all yield null") {
    val schema = StructType(Seq(
      StructField("a", ArrayType(DoubleType, containsNull = true)),
      StructField("b", ArrayType(DoubleType, containsNull = true))))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(null, Seq(1.0, 2.0)),                 // null array
        Row(Seq(1.0, null), Seq(1.0, 2.0)),       // null element
        Row(Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0))),  // length mismatch
      schema)
    val rows = df.select(
        VectorFunctions.dot($"a", $"b").as("d"),
        VectorFunctions.cosine($"a", $"b").as("c"))
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(0), s"dot not null: $r")
      assert(r.isNullAt(1), s"cosine not null: $r")
    }
  }

  test("SQL names resolve after registration and from spark.sql") {
    val v = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d, " +
        "graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
      .as[(Double, Double)].head()
    assert(v._1 === 11.0)
    assert(math.abs(v._2 - 1.0) < 1e-12)
  }

  test("non-array input is rejected at analysis time") {
    val err = intercept[Exception] {
      spark.sql("SELECT graft_dot('a', 'b')").collect()
    }
    assert(err.getMessage.toLowerCase.contains("array"))
  }

  test("interpreted eval path agrees with codegen (direct expression eval)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    val a = Literal.create(ArrayData.toArrayData(Array(1.0f, 2.0f, 3.0f)),
      ArrayType(FloatType, containsNull = false))
    val b = Literal.create(ArrayData.toArrayData(Array(0.5f, -1.0f, 2.0f)),
      ArrayType(FloatType, containsNull = false))
    val dot = graft.functions.DotProduct(a, b).eval(null).asInstanceOf[Double]
    assert(math.abs(dot - (0.5 - 2.0 + 6.0)) < 1e-9)
    val cos = graft.functions.CosineSimilarity(a, a).eval(null).asInstanceOf[Double]
    assert(math.abs(cos - 1.0) < 1e-9)
  }
}
