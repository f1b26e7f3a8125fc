package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Misra-Gries guarantee tests: est ≤ true ≤ est + max_err, no false
  * negatives above n/capacity, and merge-order invariance of the
  * bounds under different partitionings. */
class HeavyHittersSpec extends SparkSpec {

  import spark.implicits._

  /** A skewed stream: item i repeated weight(i) times. */
  private def stream(weights: Map[Long, Long], parts: Int) = {
    GraftFunctions.register(spark)
    weights.toSeq.toDF("item", "w")
      .select(explode(expr("sequence(1, w)")).as("rep"), col("item"))
      .repartition(parts, col("rep"))
  }

  private def summary(weights: Map[Long, Long], cap: Int, parts: Int): Map[Long, (Long, Long)] =
    stream(weights, parts)
      .agg(GraftFunctions.heavyHitters(col("item"), cap).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.item"), col("h.est"), col("h.max_err"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  // Zipf-ish: a few heavy items over a long uniform tail.
  private val weights: Map[Long, Long] =
    Map(1L -> 500L, 2L -> 300L, 3L -> 200L) ++
      (10L to 409L).map(i => i -> 2L).toMap
  private val n = weights.values.sum // 1800

  test("frequency guarantee: est <= true <= est + max_err for every reported item") {
    for (parts <- Seq(1, 4, 13)) {
      val s = summary(weights, cap = 64, parts = parts)
      // the summary is genuinely bounded and lossy: eviction must have
      // fired (403 distinct keys > 64 counters), so the error bound is
      // positive and the counter set never exceeds capacity
      assert(s.size <= 64, s"summary exceeds capacity: ${s.size} (parts=$parts)")
      assert(s.values.head._2 > 0L, s"no eviction happened at cap=64 (parts=$parts)")
      s.foreach { case (item, (est, err)) =>
        val truth = weights.getOrElse(item, 0L)
        assert(est <= truth, s"item $item over-estimated: est=$est true=$truth (parts=$parts)")
        assert(truth <= est + err,
          s"item $item under bound: true=$truth est+err=${est + err} (parts=$parts)")
      }
    }
  }

  test("no false negatives: items with true count > n/capacity survive every partitioning") {
    for (parts <- Seq(1, 4, 13)) {
      val s = summary(weights, cap = 64, parts = parts)
      val mandatory = weights.filter(_._2 > n / 64).keySet // 1, 2, 3
      assert(mandatory.subsetOf(s.keySet),
        s"missing heavy items ${mandatory -- s.keySet} at parts=$parts")
    }
  }

  test("exact when capacity exceeds the distinct-key count") {
    val s = summary(weights, cap = 1024, parts = 4)
    assert(s.forall { case (item, (est, err)) => err == 0L && est == weights(item) })
    assert(s.keySet === weights.keySet)
  }

  test("q_heavy_hitters query: 10 ranked rows, sandwich guarantee proven per key") {
    val hh = graft.relational.RelationalPack.queries("q_heavy_hitters")(spark, sfDir)
    val rows = hh.collect()
    assert(rows.length === 10)
    assert(rows.map(_.getLong(0)).sorted.toSeq === (1L to 10L))
    // est <= true <= est + max_err, checked in-plan vs exact counts
    assert(rows.forall(_.getBoolean(1)))
  }
}
