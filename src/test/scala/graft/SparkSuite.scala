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

  /** Drain an AvailableNow streaming query with a tight first window and
    * ONE fresh restart before the long ceiling. A blanket 300 s await
    * (the r11 response to a single co-load flake) delays genuine-hang
    * detection 2.5× for every streaming test; here a hang surfaces at
    * 120 s as a visible restart, and only the retry — a from-scratch
    * rerun, since `freshCheckpoint` wipes state and the memory sink is
    * re-registered under the same name — gets the 300 s ceiling.
    * Returns the query that actually drained (callers inspect progress).
    */
  protected def awaitDrained(
      start: => org.apache.spark.sql.streaming.StreamingQuery)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val q = start
    if (q.awaitTermination(120000)) q
    else {
      q.stop()
      val retry = start
      assert(retry.awaitTermination(300000),
        "stream failed to drain within 300 s even after a fresh restart")
      retry
    }
  }
}
