package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Approximate Neighborhood Function (HyperANF, Boldi–Vigna) — per
  * node, an estimate of |ball(v, r)|: how many vertices lie within r
  * hops. The reference's reachability surface answers "is b within r
  * of a" per pair (mcs.py's expansion queries); the neighborhood
  * function is its aggregate form — per-node reach counts, the
  * primitive behind effective-diameter and centrality estimates.
  *
  * Engine shape: each vertex carries a fixed 256-byte HLL counter
  * ([[graft.functions.Hll]]); round r replaces every counter with the
  * register-max of its neighbors' round-(r−1) counters and its own.
  * That is one equi-join (edges ⋈ counters on src) and one
  * partial-aggregable merge per round — the shuffle carries
  * O(V × 256 B) whatever the ball sizes are, where the EXACT
  * computation's per-round state is the materialized neighbor SETS
  * (O(Σ|ball|), quadratic on dense graphs, the thing that does not
  * survive 100 TB). Register max is commutative, associative and
  * idempotent, so retries/re-sends can't corrupt counters, and the
  * estimate is a pure function of the registers — deterministic for
  * a given graph.
  */
object Anf {

  /** Per-node counters after `rounds` propagation steps over the
    * bidirectional edge list: (node, regs binary, est double). */
  def run(s: SparkSession, edges: DataFrame, rounds: Int): DataFrame = {
    import s.implicits._
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    GraftFunctions.register(s)
    // the slim 2-column edge list, checkpointed once hash-partitioned
    // on the join key (the other iterative vertex programs' contract)
    val e = edges.select($"src", $"dst")
      .repartition($"src").localCheckpoint(false)
    var counters = e.select($"src".as("node")).distinct()
      .select($"node", GraftFunctions.hllUnit(xxhash64($"node")).as("regs"))
      .localCheckpoint(false)
    for (_ <- 1 to rounds) {
      // shuffle_hash: build the vertex-sized counter table, STREAM
      // the edges — no per-round sort of the edge list, no exchange
      // on the already-partitioned edge side; the one shuffle per
      // round is the register-max aggregation, whose map-side combine
      // caps it at O(V × 256 B) per partition
      val msgs = e.join(counters.hint("shuffle_hash"), e("src") === counters("node"))
        .select(e("dst").as("node"), $"regs")
      counters = msgs.union(counters)
        .groupBy($"node")
        .agg(GraftFunctions.hllMerge($"regs").as("regs"))
        // truncate the per-round lineage (same contract as the other
        // iterative vertex programs); lazy, so no extra job
        .localCheckpoint(false)
    }
    counters.select($"node", $"regs", GraftFunctions.hllCard($"regs").as("est"))
  }
}
