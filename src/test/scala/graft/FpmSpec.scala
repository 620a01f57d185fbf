package graft

import org.apache.spark.sql.functions._
import org.apache.spark.ml.fpm.FPGrowth

/** FP-Growth is exact — every itemset frequency it reports must equal the
  * count a plain relational query computes. Sizes 1 and 2 are cheap to
  * cross-check exactly; that pins the mining end-to-end (the FP-tree
  * builds sizes k+1 from k).
  */
class FpmSpec extends SparkSuite {
  import spark.implicits._

  test("FP-Growth itemset frequencies equal exact relational counts") {
    val op = engine.Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey").distinct().cache()
    val baskets = op.groupBy("l_orderkey").agg(collect_set("l_partkey").as("items"))
    val fi = new FPGrowth().setItemsCol("items").setMinSupport(0.01)
      .fit(baskets).freqItemsets.cache()
    assert(fi.count() > 0)

    val single = fi.filter(size($"items") === 1)
      .select(element_at($"items", 1).as("p"), $"freq")
      .as[(Long, Long)].collect().toMap
    val exact1 = op.groupBy("l_partkey").agg(countDistinct("l_orderkey").as("n"))
      .as[(Long, Long)].collect().toMap
    single.foreach { case (p, f) => assert(f === exact1(p), s"item $p") }

    val pairs = fi.filter(size($"items") === 2)
      .select(array_sort($"items"), $"freq")
      .as[(Seq[Long], Long)].collect()
    if (pairs.nonEmpty) {
      val a = op.select($"l_orderkey", $"l_partkey".as("pa"))
      val b = op.select($"l_orderkey".as("k2"), $"l_partkey".as("pb"))
      val exact2 = a.join(b, $"l_orderkey" === $"k2" && $"pa" < $"pb")
        .groupBy("pa", "pb").agg(count(lit(1)).as("n"))
        .as[(Long, Long, Long)].collect()
        .map { case (x, y, n) => (Seq(x, y), n) }.toMap
      pairs.foreach { case (is, f) => assert(f === exact2(is), s"pair $is") }
    }
  }
}
