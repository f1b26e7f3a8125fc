package graft.graph

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** A14 bounded Bellman-Ford: hand-computed examples. */
class SsspSpec extends SparkSpec {

  private def run(edges: Seq[(Long, Long, String)], seeds: Seq[Long], hops: Int) = {
    import spark.implicits._
    val e = edges.toDF("src", "dst", "w")
      .withColumn("w", col("w").cast("decimal(18,2)"))
    Sssp.run(spark, e, seeds.toDF("node"), hops).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  test("picks the cheaper of two paths and respects the hop bound") {
    // 1 → 2 → 3 costs 1.10 + 1.20 = 2.30; direct 1 → 3 costs 5.00.
    // At 2 hops node 4 is only reachable via the expensive direct
    // edge (5.00 + 0.50); the cheap 3-hop route needs hops ≥ 3.
    val edges = Seq(
      (1L, 2L, "1.10"), (2L, 3L, "1.20"), (1L, 3L, "5.00"), (3L, 4L, "0.50"))
    val twoHops = run(edges, Seq(1L), hops = 2)
    assert(twoHops === Map(1L -> 0.0, 2L -> 1.1, 3L -> 2.3, 4L -> 5.5))
    val threeHops = run(edges, Seq(1L), hops = 3)
    assert(threeHops(4L) === 2.8)
  }

  test("multiple seeds: each node takes its nearest source") {
    val edges = Seq((1L, 2L, "1.00"), (2L, 3L, "1.00"), (5L, 3L, "0.25"))
    val d = run(edges, Seq(1L, 5L), hops = 4)
    assert(d === Map(1L -> 0.0, 2L -> 1.0, 3L -> 0.25, 5L -> 0.0))
  }

  test("a longer path with smaller total weight wins within the bound") {
    // 1 → 4 direct costs 10; 1 → 2 → 3 → 4 costs 3 × 1.00
    val edges = Seq(
      (1L, 4L, "10.00"), (1L, 2L, "1.00"), (2L, 3L, "1.00"), (3L, 4L, "1.00"))
    assert(run(edges, Seq(1L), hops = 2)(4L) === 10.0)
    assert(run(edges, Seq(1L), hops = 3)(4L) === 3.0)
  }
}
