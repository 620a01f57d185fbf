package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs (one per test JVM). */
object SparkSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // bare-Column helpers (shingles, simhash, …) resolve against the
    // session registry — register once so single-suite runs don't depend
    // on a DataFrame entry point having run first
    graft.plans.GraftFunctions.register(s)
    s
  }

  val sfDir = "/root/testdata/sf0.001"
}

abstract class SparkSuite extends AnyFunSuite {
  // stable val so `import spark.implicits._` works in subclasses
  protected lazy val spark: SparkSession = SparkSuite.spark
  protected def sfDir: String = SparkSuite.sfDir
}
