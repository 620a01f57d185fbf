package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema/statistics introspection — the Spark equivalent of the reference's
  * dynamic-schema machinery: `_get_actual_schema_info`
  * (`core/ai_query_generator.py:23-74`) and the `inspect_table` CLI
  * (`core/management/commands/inspect_table.py:22-194`). Schema-on-read
  * (`df.schema`) plays the role of `information_schema`; small agg probes
  * play the role of the COUNT/DISTINCT/MIN-MAX-AVG cursors. All probes are
  * single-pass distributed aggregations — no collect of table data.
  */
case class TableReport(
    table: String,
    columns: Seq[(String, String, Boolean)], // name, type, nullable
    rowCount: Long,
    sampleDepartments: Seq[String],
    salaryStats: Option[(java.math.BigDecimal, java.math.BigDecimal, Double)])

object TableInspector {

  /** Schema-description text fed to the NL compiler's prompt in the
    * reference (`ai_query_generator.py:43-70`): columns + row count +
    * up to 10 sample departments.
    */
  def schemaInfo(df: DataFrame, table: String = "employees"): String = {
    val sb = new StringBuilder(s"Database Schema for '$table' table:\n")
    df.schema.fields.foreach { f =>
      val nullable = if (f.nullable) "NULL" else "NOT NULL"
      sb.append(s"- ${f.name} (${f.dataType.sql}): $nullable\n")
    }
    sb.append(s"\nTable contains ${df.count()} employee records.\n")
    if (df.columns.contains("department")) {
      val departments = df.filter(col("department").isNotNull)
        .select("department").distinct().limit(10)
        .collect().map(_.getString(0))
      if (departments.nonEmpty)
        sb.append(s"Sample departments: ${departments.mkString(", ")}\n")
    }
    sb.toString
  }

  /** Full inspection — mirrors `inspect_table.py`: structure, count,
    * distinct departments, salary min/max/avg.
    */
  def inspect(df: DataFrame, table: String = "employees"): TableReport = {
    val cols = df.schema.fields.toSeq.map(f => (f.name, f.dataType.sql, f.nullable))
    val count = df.count()
    val depts =
      if (df.columns.contains("department"))
        df.filter(col("department").isNotNull).select("department")
          .distinct().orderBy("department").collect().map(_.getString(0)).toSeq
      else Nil
    val salary =
      if (df.columns.contains("salary")) {
        val r = df.agg(
          min("salary").cast(DecimalType(18, 2)),
          max("salary").cast(DecimalType(18, 2)),
          avg("salary").cast(DoubleType)).head()
        if (r.isNullAt(0)) None
        else Some((r.getDecimal(0), r.getDecimal(1), r.getDouble(2)))
      } else None
    TableReport(table, cols, count, depts, salary)
  }

  /** `_suggest_django_field` analogue (`inspect_table.py:168-194`): Spark
    * type → suggested model-field mapping.
    */
  def suggestField(dt: DataType): String = dt match {
    case _: IntegerType | _: ShortType => "IntegerField()"
    case _: LongType => "BigIntegerField()"
    case d: DecimalType => s"DecimalField(max_digits=${d.precision}, decimal_places=${d.scale})"
    case _: DoubleType | _: FloatType => "FloatField()"
    case _: BooleanType => "BooleanField()"
    case _: DateType => "DateField()"
    case _: TimestampType => "DateTimeField()"
    case _: StringType => "CharField(max_length=255)"
    case other => s"TextField()  # ${other.sql}"
  }
}
