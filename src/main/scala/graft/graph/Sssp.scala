package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Bounded Bellman-Ford: minimum path weight from any seed over paths
  * of at most `maxHops` edges (the weighted companion of
  * [[Bfs.expand]] — same depth-bounded loop, accumulating exact
  * DECIMAL path weights instead of wave numbers).
  *
  * Scale shape: each relaxation round is ONE co-partitioned join of
  * the current distance table against the (pre-partitioned, reused)
  * edge table plus a partial-aggregable min — the textbook
  * distributed Bellman-Ford round. The distance table is
  * localCheckpointed per round, so lineage stays flat and the loop is
  * depth-bounded, not fixpoint-probed (an empty relaxation makes the
  * remaining joins empty-input-fast, mirroring Bfs.expand).
  *
  * Determinism: weights stay DECIMAL(28,2) end to end — exact,
  * order-free addition and min — so the result is bit-identical to
  * the oracle's unrolled relaxation whatever the partitioning.
  */
object Sssp {

  private val D = DecimalType(28, 2)

  /** @param edges (src, dst, w) with w a non-negative DECIMAL weight
    * @param seeds (node) — distance 0 sources */
  def run(s: SparkSession, edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    import s.implicits._
    val e = edges
      .select(col("src"), col("dst"), col("w").cast(D).as("w"))
      .repartition(col("src"))
      .persist()
    var dist = seeds
      .select(col("node"), lit(0).cast(D).as("dist"))
      .localCheckpoint(false)
    var hop = 0
    while (hop < maxHops) {
      // Lazy checkpoints: the loop runs no actions, so all rounds
      // execute inside the caller's first job with lineage still
      // severed per round (the small distance table side is left for
      // AQE to broadcast at runtime).
      val relaxed = dist.join(e, dist("node") === e("src"))
        .select(e("dst").as("node"), (dist("dist") + e("w")).cast(D).as("dist"))
      dist = dist.union(relaxed)
        .groupBy($"node").agg(min($"dist").as("dist"))
        .localCheckpoint(false)
      hop += 1
    }
    val out = dist.select($"node", $"dist".cast("double").as("dist")).localCheckpoint()
    e.unpersist()
    out
  }
}
