package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** Test-only bridge into the `private[sql]` extension-application API, so
  * GraftExtensionsSpec can drive the exact code path the session builder
  * runs for `spark.sql.extensions` without needing a fresh SparkContext.
  */
object GraftTestAccess {
  def registerFunctions(ext: SparkSessionExtensions, reg: FunctionRegistry): FunctionRegistry =
    ext.registerFunctions(reg)
}
