package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` / `array<double>` embedding columns.
  *
  * The hot-loop primitives (`dot`, `l2Norm`, `cosine`) resolve to graft's
  * native Catalyst expressions ([[DotProduct]], [[CosineSimilarity]]) —
  * codegen'd tight loops, registered by [[graft.plans.GraftFunctions]].
  * The remaining helpers use built-in higher-order functions. All
  * arithmetic is promoted to double so Spark and the DuckDB oracle agree
  * on float32 inputs.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ — native codegen'd loop ([[DotProduct]]). */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Σ aᵢ·bᵢ via higher-order built-ins (no registration needed; the
    * portable fallback and the differential-test partner of [[dot]]).
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** ‖a‖₂ */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** cos(a, b) in one pass — native codegen'd loop ([[CosineSimilarity]]);
    * zero-norm inputs yield 0.0.
    */
  def cosine(a: Column, b: Column): Column = call_function("graft_cosine", a, b)

  /** cos(a, b) via higher-order built-ins (portable fallback). */
  def cosineHof(a: Column, b: Column): Column = {
    val denom = sqrt(dotHof(a, a)) * sqrt(dotHof(b, b))
    when(denom === 0.0, lit(0.0)).otherwise(dotHof(a, b) / denom)
  }

  /** Squared Euclidean distance — native codegen'd loop
    * ([[L2SqDistance]]); bit-identical to [[l2SqHof]] (same difference /
    * square / sequential-sum operation order).
    */
  def l2Sq(a: Column, b: Column): Column = call_function("graft_l2sq", a, b)

  /** [[l2Sq]] via higher-order built-ins (portable fallback and
    * differential-test partner).
    */
  def l2SqHof(a: Column, b: Column): Column =
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
