package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic random-walk sampling (SURVEY §2 A27) — the corpus
  * generator for skip-gram graph embeddings (DeepWalk/node2vec
  * style): from each seed, walk `steps` hops, choosing the next hop
  * pseudo-randomly but REPRODUCIBLY from the current node's sorted
  * neighbor list. Cross-engine determinism comes from an explicit
  * LCG-style index formula instead of an engine RNG:
  *
  *   idx(node, t) = ((node * 1103515245 + t * 12345) mod 2^31−1) mod deg(node)
  *
  * (all exact BIGINT arithmetic — node ids up to ~8.4e9 stay inside
  * 2^63 — so DuckDB reproduces every hop bit-for-bit; the walk is a
  * pure function of the graph, not of partitioning or schedule).
  *
  * Scale shape: the adjacency build is the one edge shuffle (O(deg)
  * per node, shared across all steps via a lazy localCheckpoint);
  * each hop is ONE equi-join of the frontier (|seeds| rows, typically
  * ≪ graph) against the adjacency — AQE broadcasts the frontier side
  * — so a w-step walk costs w frontier joins and no iteration-growing
  * state. Walks that reach a sink node simply end (inner join), same
  * as the reference BFS treating missing adjacency as absence
  * (main.py:272-305's neighbor lookups).
  */
object RandomWalks {

  /** Walk `steps` hops from every seed. `edges(src, dst)` directed
    * (pass a bidirectional edge set for undirected semantics);
    * `seeds(seed)` one row per walk start. Returns
    * (seed, step, node) for step 0..steps, one walk per seed. */
  def run(s: SparkSession, edges: DataFrame, seeds: DataFrame, steps: Int): DataFrame = {
    require(steps >= 0, s"steps must be >= 0, got $steps")
    val adj = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .distinct()
      .groupBy(col("src"))
      .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
      .localCheckpoint(false)
    var cur = seeds.select(col("seed").cast("long").as("seed"),
      col("seed").cast("long").as("node"), lit(0L).as("step"))
    val waves = Seq.newBuilder[DataFrame]
    waves += cur
    for (t <- 1 to steps) {
      cur = cur.join(adj, cur("node") === adj("src"))
        .select(col("seed"),
          expr(s"element_at(nbrs, cast((node * 1103515245 + $t * 12345) % 2147483647 % size(nbrs) as int) + 1)")
            .as("node"),
          lit(t.toLong).as("step"))
      waves += cur
    }
    waves.result().reduce(_ union _)
  }
}
