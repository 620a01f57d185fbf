package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.functions.{col, count, lit, min, struct, udf, when}
import org.apache.spark.sql.types.DoubleType

import java.nio.file.{Files, Paths}

/** Rounding-boundary audit (VERDICT r7 item 2): for every registry query,
  * strip the FINAL `round(expr, n)` off each double output column and
  * measure, at sf0.01, how close each pre-round value sits to a
  * .5×10⁻ⁿ rounding boundary — in ulps of the scaled value. The failure
  * class this hunts: a chained-double expression whose last ulp lands on
  * the boundary, so Spark's BigDecimal HALF_UP and DuckDB's binary round
  * (or two DuckDB builds) tip different ways. The two-JVM determinism
  * audit cannot see it (both JVMs share the arithmetic); this report can:
  * any column whose min distance is within ~1e3 ulps of a boundary is a
  * rewrite candidate for the exact-integer protocol.
  *
  * Usage: runMain graft.BoundaryAudit <sfDir> <outReport.md> [nameFilter]
  *
  * Only the TOPMOST Project/Aggregate (under Sort/Limit wrappers) is
  * rewritten — intermediate protocol roundings are part of the query's
  * semantics and stay. Columns whose final expression nests round() deeper
  * than the alias root are reported as `nested` (manual review), not
  * silently skipped.
  */
object BoundaryAudit {

  private case class ColReport(query: String, column: String, scale: Int,
      nRows: Long, minRatio: Double, minD: Double, ulpAtMin: Double,
      valueAtMin: Double, tieClass: Int, nUnjustified: Long)

  /** Tie classification (VERDICT r9 #5): the "documented classes"
    * claim — every boundary-adjacent value rounds the same way in both
    * engines — used to live in prose; this makes it machine-checked
    * per run by computing BOTH engines' ACTUAL rounding decisions on
    * each pre-round double, exactly:
    *
    *   - Spark `round(double, n)` rounds the SHORTEST-decimal
    *     rendering: `BigDecimal.valueOf(v).setScale(n, HALF_UP)`.
    *   - DuckDB rounds the double PRODUCT half away from zero:
    *     `std::round(v * 10ⁿ)` — emulated exactly by comparing the
    *     product double's exact binary expansion against .5.
    *
    * Codes (severity-ordered, per-column report shows the max):
    *   0 far             — >1e3 ulps from any .5×10⁻ⁿ boundary
    *   1 near-margin     — boundary-adjacent (16-1e3 ulps off): a
    *                       multiply-based rounder's few-ulp error
    *                       cannot tip it
    *   2 tie-agree       — the value renders/lands ON a boundary by at
    *                       least one engine's lens, and both engines'
    *                       own tie rules produce the SAME rounded
    *                       result
    *   3 near-fragile    — <16 ulps off the boundary (not a tie):
    *                       engines agree on THIS double, but a
    *                       cross-engine last-ulp drift in the
    *                       pre-round arithmetic could land the other
    *                       side — tolerated while the two-JVM and
    *                       oracle-thread gates pin that arithmetic,
    *                       listed so the exposure is visible
    *   4 engine-mismatch — the engines round the IDENTICAL double
    *                       differently: guaranteed gate failure on
    *                       this fixture, rewrite required
    *   5 grid-overflow   — the double product v·10ⁿ overflowed to
    *                       infinity, so the DuckDB emulation (and
    *                       DuckDB itself, whose round() multiplies)
    *                       has no finite grid to judge: sentinel for
    *                       manual review, never thrown from the UDF
    *                       (ADVICE r10 — `new BigDecimal(∞)` used to
    *                       kill the whole audit run)
    * Class 4 needs a rewrite; the audit passes structurally when its
    * per-run count is zero (class 3 is reported as watch-grade).
    *
    * Classes 1/3 are additionally gated on the double grid being FINER
    * than the rounding grid (ulp(y) < 1e-3 units, ADVICE r10): at
    * coarse grids every representable double sits "few ulps" from a
    * boundary by construction, so the ulp-distance test would flag
    * large magnitudes as watch-grade when the geometry carries no
    * fragility signal — those rows land in the report's coarse-grid
    * table (judged by absolute distance) instead.
    */
  private val tieClassNames = Array(
    "far", "near-margin", "tie-agree", "near-fragile", "engine-mismatch",
    "grid-overflow")
  private[graft] def classifyTie(v: Double, n: Int): Int = {
    if (v.isNaN || v.isInfinite || v == 0.0) return 0
    val half = new java.math.BigDecimal("0.5")
    val one = java.math.BigDecimal.ONE
    // Spark's decision, in rounding-grid units (exact)
    val sparkUnits = java.math.BigDecimal.valueOf(v)
      .movePointRight(n).setScale(0, java.math.RoundingMode.HALF_UP)
    // DuckDB's decision: std::round(v * 10^n), judged on the exact
    // binary expansion of the double product (no double-rounding)
    val y = v * math.pow(10.0, n)
    if (y.isInfinite) return 5
    val yb = new java.math.BigDecimal(y)
    val fl = yb.setScale(0, java.math.RoundingMode.FLOOR)
    val cmp = yb.subtract(fl).compareTo(half)
    val duckUnits =
      if (y >= 0) { if (cmp >= 0) fl.add(one) else fl }
      else { if (cmp > 0) fl.add(one) else fl }
    if (sparkUnits.compareTo(duckUnits) != 0) return 4
    // engines agree — geometry subclass from the exact expansion of v
    val rem = new java.math.BigDecimal(v).abs().movePointRight(n)
      .remainder(one)
    if (rem.compareTo(half) == 0) return 2
    val dUnits = rem.subtract(half).abs().doubleValue()
    val ulpY = math.ulp(math.abs(y))
    // shortest-repr ties land here with dUnits ~ last-ulp tiny: the
    // SPARK lens saw a tie even though the exact expansion is off it
    if (java.math.BigDecimal.valueOf(v).movePointRight(n)
        .remainder(one).abs().compareTo(half) == 0) 2
    else if (ulpY >= 1e-3) 0 // coarse grid: ulp distance meaningless
    else if (dUnits < 16 * ulpY) 3
    else if (dUnits < 1e3 * ulpY) 1
    else 0
  }

  def main(args: Array[String]): Unit = {
    val (sfDir, outPath) = (args(0), args(1))
    val only = args.lift(2).map(_.split(',').toSeq)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // distance of the pre-round double to the nearest .5×10⁻ⁿ boundary:
    // y = |v|·10ⁿ, d = |frac(y) − 0.5| in grid units, ratio = d / ulp(y).
    // ratio is only meaningful while the double grid is finer than the
    // rounding grid (ulp(y) ≪ 1) — the report carries ulp so coarse-grid
    // rows (huge magnitudes) can be judged separately.
    val metricsUdf = udf((v: Double, n: Int) => {
      if (v.isNaN || v.isInfinite) (Double.NaN, Double.NaN, Double.NaN, v)
      else {
        val y = math.abs(v) * math.pow(10.0, n)
        val d = math.abs((y - math.floor(y)) - 0.5)
        val u = math.ulp(y)
        (d / u, d, u, v)
      }
    })
    val classUdf = udf((v: Double, n: Int) => classifyTie(v, n))

    val reports = scala.collection.mutable.ListBuffer.empty[ColReport]
    val nested = scala.collection.mutable.ListBuffer.empty[(String, String)]
    val errors = scala.collection.mutable.ListBuffer.empty[(String, String)]
    var nQueries = 0
    var nNoRound = 0

    // Dataset.ofRows is private[sql]; the classic companion exposes it
    // publicly in bytecode — the same reflective pattern as the batch
    // transformWithState coordinator bootstrap.
    val dsCompanion = Class.forName("org.apache.spark.sql.classic.Dataset$")
    val ofRows = dsCompanion.getMethods
      .filter(_.getName == "ofRows")
      .find(_.getParameterTypes.length == 2)
      .getOrElse(sys.error("Dataset.ofRows not found"))
    val companion = dsCompanion.getField("MODULE$").get(null)
    def fromPlan(plan: LogicalPlan): DataFrame =
      ofRows.invoke(companion, spark, plan).asInstanceOf[DataFrame]

    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.exists(name.contains)) }
      .foreach { case (name, fn) =>
        try {
          nQueries += 1
          val df = fn(spark, sfDir)
          val analyzed = df.queryExecution.analyzed
          @annotation.tailrec
          def top(p: LogicalPlan): Option[LogicalPlan] = p match {
            case s: Sort => top(s.child)
            case l: GlobalLimit => top(l.child)
            case l: LocalLimit => top(l.child)
            case s: SubqueryAlias => top(s.child)
            case d: Distinct => top(d.child)
            case pr: Project => Some(pr)
            case ag: Aggregate => Some(ag)
            case _ => None
          }
          val node = top(analyzed)
          val exprs: Seq[NamedExpression] = node match {
            case Some(p: Project) => p.projectList
            case Some(a: Aggregate) => a.aggregateExpressions
            case _ => Nil
          }
          // evaluate a batch of (label, scale, preRoundExpr) columns in
          // the node's own context and record their boundary metrics
          def auditBatch(cols: Seq[(String, Int, Expression)]): Unit = {
            val rawList: Seq[NamedExpression] = cols.map {
              case (aName, _, child) => Alias(child, aName)()
            }
            val rawPlan = node.get match {
              case p: Project => Project(rawList, p.child)
              case a: Aggregate =>
                Aggregate(a.groupingExpressions, rawList, a.child)
            }
            val raw = fromPlan(rawPlan)
            val aggCols = cols.zipWithIndex.flatMap {
              case ((aName, scale, _), i) =>
                val c = col(s"`$aName`").cast("double")
                val m = metricsUdf(c, lit(scale))
                // null cells carry no boundary info — keep them out of
                // the min(struct) (a null struct field trips the row
                // encoder on some aggregate paths)
                val cl = classUdf(c, lit(scale))
                Seq(min(when(c.isNotNull,
                    struct(m.getField("_1").as("ratio"),
                      m.getField("_2").as("d"), m.getField("_3").as("u"),
                      m.getField("_4").as("v")))).as(s"m_$i"),
                  count(c).as(s"n_$i"),
                  org.apache.spark.sql.functions.max(cl).as(s"c_$i"),
                  org.apache.spark.sql.functions.sum(
                    when(cl >= 3, 1L).otherwise(0L)).as(s"u_$i"))
            }
            val row = raw.agg(aggCols.head, aggCols.tail: _*).head()
            cols.zipWithIndex.foreach { case ((aName, scale, _), i) =>
              val m = row.getStruct(row.fieldIndex(s"m_$i"))
              val n = row.getLong(row.fieldIndex(s"n_$i"))
              if (m != null && n > 0)
                reports += ColReport(name, aName, scale, n,
                  m.getDouble(0), m.getDouble(1), m.getDouble(2),
                  m.getDouble(3),
                  if (row.isNullAt(row.fieldIndex(s"c_$i"))) 0
                  else row.getInt(row.fieldIndex(s"c_$i")),
                  if (row.isNullAt(row.fieldIndex(s"u_$i"))) 0L
                  else row.getLong(row.fieldIndex(s"u_$i")))
            }
          }
          // root-level round(expr, n) under the output alias = the
          // protocol's boundary rounding
          val audited = exprs.collect {
            case Alias(r: Round, aName)
                if r.dataType == DoubleType &&
                  r.scale.isInstanceOf[Literal] =>
              (aName, r.scale.eval().asInstanceOf[Int], r.child)
          }
          // rounds BELOW the alias root (thresholds compared against a
          // rounded value, rounds inside CASE arms or aggregates):
          // audited the same way, labeled name~i; a nested child that is
          // not a legal standalone output in this node's context (e.g.
          // a row-grain column inside sum(round(x, n)) of an Aggregate)
          // falls back to per-column attempts and is reported as a skip
          // if analysis still rejects it
          // each nested column carries TWO evaluable forms: the bare
          // pre-round child (primary — measures the raw distribution),
          // and the ENCLOSING-CONTEXT substitution (the parent
          // expression with this Round occurrence replaced by its
          // child, guards and CASE arms intact). The substitution is
          // the fallback for children that only evaluate safely under
          // their guard — e.g. when(n > 0, round(x / n, 6)): the bare
          // x / n throws DIVIDE_BY_ZERO under ANSI on the guarded-out
          // rows, while when(n > 0, x / n) yields exactly the
          // pre-round values on the rows the query actually rounds
          // (nulls elsewhere, which the metric already excludes).
          val nestedCols = exprs.flatMap { e =>
            val all = e.collect {
              case r: Round if r.dataType == DoubleType &&
                r.scale.isInstanceOf[Literal] => r
            }
            val skipRoot = e match {
              case Alias(r: Round, _) => all.filter(_ ne r)
              case _ => all
            }
            skipRoot.zipWithIndex.map { case (r, i) =>
              val inContext = e match {
                case Alias(childE, _) =>
                  val s0 = childE.transformUp {
                    case x if x eq r => r.child
                  }
                  if (s0.dataType == DoubleType) Some(s0) else None
                case _ => None
              }
              (s"${e.name}~$i", r.scale.eval().asInstanceOf[Int], r.child,
                inContext)
            }
          }
          if (audited.isEmpty && nestedCols.isEmpty) nNoRound += 1
          if (audited.nonEmpty) auditBatch(audited)
          if (nestedCols.nonEmpty) {
            try auditBatch(nestedCols.map(c => (c._1, c._2, c._3)))
            catch { case _: Throwable =>
              nestedCols.foreach { c =>
                try auditBatch(Seq((c._1, c._2, c._3)))
                catch { case _: Throwable =>
                  c._4 match {
                    case Some(sub) =>
                      try auditBatch(Seq((c._1, c._2, sub)))
                      catch { case e: Throwable =>
                        if (sys.env.contains("GRAFT_AUDIT_DEBUG"))
                          println(s"[audit-debug] $name ${c._1}: " +
                            e.toString.take(500))
                        nested += ((name, c._1))
                      }
                    case None => nested += ((name, c._1))
                  }
                }
              }
            }
          }
        } catch { case e: Throwable =>
          errors += ((name, e.toString.take(300)))
        }
      }

    val flagged = reports.filter(r =>
      !r.minRatio.isNaN && r.minRatio < 1e3 && r.ulpAtMin < 1e-3)
    val coarse = reports.filter(r => !r.ulpAtMin.isNaN && r.ulpAtMin >= 1e-3)
    val hard = reports.filter(r => r.tieClass == 4)
    val watch = reports.filter(r => r.tieClass == 3)
    val overflow = reports.filter(r => r.tieClass == 5)
    val sb = new StringBuilder
    sb ++= s"# Rounding-boundary audit @ $sfDir\n\n"
    sb ++= s"Queries audited: $nQueries; rounded double output columns: " +
      s"${reports.size}; no final-round queries: $nNoRound\n\n"
    sb ++= "tie_class legend (worst row per column, both engines' ACTUAL " +
      "rounding decisions computed exactly per value): " +
      "`engine-mismatch` = Spark (shortest-decimal HALF_UP) and DuckDB " +
      "(std::round of the double product) round the identical double " +
      "DIFFERENTLY — guaranteed gate failure, rewrite required; " +
      "`near-fragile` = engines agree on this double but it sits <16 " +
      "ulps off the boundary, so a cross-engine last-ulp drift in the " +
      "pre-round arithmetic could flip it (watch-grade; tolerated while " +
      "the two-JVM and oracle-thread gates pin that arithmetic); " +
      "`tie-agree` = on a boundary by at least one engine's lens, both " +
      "tie rules agree; `near-margin` = 16-1e3 ulps off, untippable.\n\n"
    sb ++= s"**Columns where the engines disagree (engine-mismatch): " +
      s"${hard.size}**\n\n"
    if (hard.nonEmpty) {
      sb ++= "| query | column | n_rows_cls>=3 |\n|---|---|---|\n"
      hard.foreach { r =>
        sb ++= s"| ${r.query} | ${r.column} | ${r.nUnjustified} |\n"
      }
      sb ++= "\n"
    }
    sb ++= s"Grid-overflow columns (v·10ⁿ overflows double — manual " +
      s"review): ${overflow.size}\n\n"
    if (overflow.nonEmpty) {
      sb ++= "| query | column | n_rows_cls>=3 |\n|---|---|---|\n"
      overflow.foreach { r =>
        sb ++= s"| ${r.query} | ${r.column} | ${r.nUnjustified} |\n"
      }
      sb ++= "\n"
    }
    sb ++= s"Watch-grade columns (near-fragile): ${watch.size}\n\n"
    if (watch.nonEmpty) {
      sb ++= "| query | column | n_rows_cls>=3 |\n|---|---|---|\n"
      watch.foreach { r =>
        sb ++= s"| ${r.query} | ${r.column} | ${r.nUnjustified} |\n"
      }
      sb ++= "\n"
    }
    sb ++= s"**FLAGGED (min distance < 1e3 ulps of a .5×10⁻ⁿ boundary, " +
      s"fine grid): ${flagged.size}**\n\n"
    def table(rs: Seq[ColReport]): Unit = {
      sb ++= "| query | column | scale | rows | min_ratio_ulps | min_d_units | ulp | value | tie_class |\n"
      sb ++= "|---|---|---|---|---|---|---|---|---|\n"
      rs.foreach { r =>
        sb ++= f"| ${r.query} | ${r.column} | ${r.scale} | ${r.nRows} | " +
          f"${r.minRatio}%.3g | ${r.minD}%.3g | ${r.ulpAtMin}%.3g | ${r.valueAtMin}%.17g " +
          s"| ${tieClassNames(r.tieClass)} |\n"
      }
      sb ++= "\n"
    }
    if (flagged.nonEmpty) table(flagged.toSeq.sortBy(_.minRatio))
    sb ++= s"Coarse-grid columns (ulp(y) ≥ 1e-3 at the min — magnitude too " +
      s"large for the ulp ratio to mean much; judge by min_d_units): " +
      s"${coarse.size}\n\n"
    if (coarse.nonEmpty) table(coarse.toSeq.sortBy(_.minD))
    sb ++= s"Closest 25 overall by ratio:\n\n"
    table(reports.toSeq.filterNot(r => r.minRatio.isNaN)
      .sortBy(_.minRatio).take(25))
    if (nested.nonEmpty) {
      sb ++= s"Nested-round columns the audit could NOT evaluate standalone " +
        s"(analysis rejects the bare child in this node's context — " +
        s"manual review): ${nested.size}\n\n"
      nested.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (q, cs) =>
        sb ++= s"- $q: ${cs.map(_._2).mkString(", ")}\n"
      }
      sb ++= "\n"
    }
    if (errors.nonEmpty) {
      sb ++= s"Errors: ${errors.size}\n\n"
      errors.foreach { case (q, e) => sb ++= s"- $q: $e\n" }
    }
    Files.writeString(Paths.get(outPath), sb.toString)
    println(s"[boundary-audit] ${reports.size} columns, " +
      s"${flagged.size} flagged, ${nested.size} nested, " +
      s"${errors.size} errors -> $outPath")
    spark.stop()
  }
}
