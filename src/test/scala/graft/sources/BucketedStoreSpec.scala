package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The bucketing contract: a join between two tables bucketed on the
  * join key runs with NO Exchange in the physical plan (the persisted
  * hash layout replaces the shuffle), and results equal the plain
  * join. */
class BucketedStoreSpec extends SparkSpec {

  private def countExchanges(plan: String): Int =
    plan.linesIterator.count(l => l.contains("Exchange") && !l.contains("ReusedExchange"))

  test("co-bucketed tables join without a shuffle and match the plain join") {
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    try {
      val left = (1L to 2000L).map(k => (k, s"l$k")).toDF("k", "lv")
      val right = (1L to 2000L).filter(_ % 3 == 0).map(k => (k, s"r$k")).toDF("k", "rv")
      BucketedStore.write(left, "b_left", "k", buckets = 4)
      BucketedStore.write(right, "b_right", "k", buckets = 4)

      val joined = BucketedStore.read(spark, "b_left")
        .join(BucketedStore.read(spark, "b_right"), "k")
      val physical = joined.queryExecution.executedPlan.toString
      assert(countExchanges(physical) === 0,
        s"bucketed join still shuffles:\n$physical")

      val got = joined.select("k", "lv", "rv").as[(Long, String, String)].collect().toSet
      val want = left.join(right, "k").select("k", "lv", "rv")
        .as[(Long, String, String)].collect().toSet
      assert(got === want)
      assert(got.size === 2000 / 3)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_left")
      spark.sql("DROP TABLE IF EXISTS b_right")
    }
  }

  test("groupBy on the bucket key aggregates without a shuffle") {
    import spark.implicits._
    try {
      val df = (1L to 1000L).map(k => (k % 50, k)).toDF("k", "v")
      BucketedStore.write(df, "b_agg", "k", buckets = 4)
      val agg = BucketedStore.read(spark, "b_agg").groupBy("k").agg(sum("v").as("s"))
      val physical = agg.queryExecution.executedPlan.toString
      assert(countExchanges(physical) === 0,
        s"bucketed aggregation still shuffles:\n$physical")
      val got = agg.as[(Long, Long)].collect().toMap
      val want = df.groupBy("k").agg(sum("v").as("s")).as[(Long, Long)].collect().toMap
      assert(got === want)
    } finally spark.sql("DROP TABLE IF EXISTS b_agg")
  }
}
