package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Bounded Bellman-Ford: minimum path weight from any seed over paths
  * of at most `maxHops` edges (the weighted companion of
  * [[Bfs.expand]] — same depth-bounded loop, accumulating exact
  * DECIMAL path weights instead of wave numbers).
  *
  * Scale shape (round 15): FRONTIER-based relaxation — each round
  * joins only the vertices whose distance IMPROVED in the previous
  * round against the (pre-partitioned, reused) edge table, then folds
  * candidates into the distance table with one partial-aggregable
  * min. The classic all-vertex round re-relaxed every settled vertex
  * every round, shuffling V+E rows per round; the frontier round
  * shuffles V + (edges out of improved vertices) — the relaxation
  * wave's own size (guide §1.2: don't recompute what cannot change).
  * Equality with the all-vertex unroll is the standard Bellman-Ford
  * invariant: a vertex whose distance did not improve in round r
  * contributes exactly the candidates it already contributed when it
  * last improved, so dropping it changes no minimum — per-round
  * distance tables are IDENTICAL, not just the fixpoint (pinned by
  * SsspFrontierSpec against the all-vertex reference).
  *
  * The improved flag rides the same aggregate as two plain decimal
  * mins (overall and incumbent-only) — `improved` is true only for a
  * STRICT improvement (or a first reach), so the frontier empties at
  * the fixpoint and later rounds are empty-input-fast, mirroring
  * Bfs.expand.
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
    var frontier = dist
    var hop = 0
    while (hop < maxHops) {
      // Lazy checkpoints: the loop runs no actions, so all rounds
      // execute inside the caller's first job with lineage still
      // severed per round (the frontier side is left for AQE to
      // broadcast at runtime). The non-eager checkpoint also makes
      // the two consumers of `merged` (dist chain + frontier chain)
      // share one evaluation via its cached blocks.
      val relaxed = frontier.join(e, frontier("node") === e("src"))
        .select(e("dst").as("node"),
          (frontier("dist") + e("w")).cast(D).as("dist"), lit(0).as("tag"))
      // two plain decimal mins (both hash-aggregable — a min over a
      // (dist, tag) STRUCT has an immutable buffer and would demote
      // the whole merge to SortAggregate): `dist` is the new minimum
      // over incumbent+candidates, `incumbent` the old one; improved
      // = strictly better than the incumbent, or first reach.
      val merged = dist.withColumn("tag", lit(1)).union(relaxed)
        .groupBy($"node").agg(min($"dist").as("dist"),
          min(when($"tag" === 1, $"dist")).as("incumbent"))
        .select($"node", $"dist",
          ($"incumbent".isNull || $"dist" < $"incumbent").as("improved"))
        .localCheckpoint(false)
      dist = merged.select($"node", $"dist")
      frontier = merged.filter($"improved").select($"node", $"dist")
      hop += 1
    }
    val out = dist.select($"node", $"dist".cast("double").as("dist")).localCheckpoint()
    e.unpersist()
    out
  }
}
