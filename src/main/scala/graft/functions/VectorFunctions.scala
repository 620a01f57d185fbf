package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` / `array<double>` embedding columns,
  * built from codegen-friendly higher-order functions (`zip_with`,
  * `aggregate`) — no UDFs, so whole plans stay inside Catalyst and scale
  * linearly with partition count. All arithmetic is promoted to double so
  * Spark and the DuckDB oracle agree on float32 inputs.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** ‖a‖₂ */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** cos(a, b) = a·b / (‖a‖‖b‖); null-safe on zero vectors. */
  def cosine(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom === 0.0, lit(0.0)).otherwise(dot(a, b) / denom)
  }

  /** Squared Euclidean distance. */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0),
      (acc, x) => acc + x)

  /** Element-wise sum of two vectors (for distributed centroid updates). */
  def vecAdd(a: Column, b: Column): Column =
    zip_with(a, b, (x, y) => x.cast("double") + y.cast("double"))

  /** Scale a vector by a scalar column. */
  def vecScale(a: Column, s: Column): Column =
    transform(a, x => x.cast("double") * s)

  /** A vector literal usable in expressions. */
  def vecLit(v: Seq[Double]): Column = typedLit(v)
}
