package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deep-graph stress: connected components on a single 30k-node chain
  * — diameter 30k. Pregel label propagation would need 30k supersteps
  * (infeasible in any engine); star contraction must converge in
  * ~log2(n) rounds. This is the shape 100 TB graphs actually have
  * (long derivation chains), so the round bound is the scale claim
  * under test, not just the labels. */
class DeepGraphSpec extends SparkSpec {

  test("CC labels a 30k-node chain in logarithmic rounds") {
    import spark.implicits._
    val n = 30000L
    val vertices = spark.range(n).select(col("id"))
    val edges = spark.range(n - 1)
      .select(col("id").as("src"), (col("id") + 1).as("dst"))
    val t0 = System.nanoTime()
    val cc = ConnectedComponents.run(spark, vertices, edges)
    val distinctComponents = cc.select("component").distinct().as[Long].collect().toSeq
    val dt = (System.nanoTime() - t0) / 1e9
    assert(distinctComponents === Seq(0L), "chain must collapse to component 0")
    assert(cc.count() === n)
    info(f"30k-chain CC in $dt%.1f s")
  }
}
