package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic random-walk sampling (SURVEY §2 A25) — the corpus
  * generator for skip-gram graph embeddings (DeepWalk/node2vec
  * style): from each seed, walk `steps` hops, choosing the next hop
  * pseudo-randomly but REPRODUCIBLY from the current node's sorted
  * neighbor list. Cross-engine determinism comes from an explicit
  * LCG-style index formula instead of an engine RNG:
  *
  *   idx(node, t) = (((node mod 2^31−1) * 1103515245 + t * 12345) mod 2^31−1) mod deg(node)
  *
  * (all exact BIGINT arithmetic: the node id is pre-reduced mod
  * 2^31−1 BEFORE the multiply, bounding the product at ~2^61 — no
  * overflow for ANY long node id, where the unreduced product would
  * wrap negative past ~8.4e9 and a sign-preserving % would then make
  * the positional join silently match nothing. Every intermediate is
  * non-negative (pmod), so DuckDB reproduces every hop bit-for-bit;
  * the walk is a pure function of the graph, not of partitioning or
  * schedule).
  *
  * Scale shape: adjacency is stored POSITIONALLY as (src, pos, dst,
  * deg) rows — pos = rank of dst in the node's sorted neighbor list,
  * deg carried on every row from the SAME window pass — NOT as
  * per-node neighbor arrays: a walk only ever reads ONE element per
  * hop, and a collect_list adjacency would build a degree-sized
  * aggregation buffer under a single key (a degree-10^8 celebrity =
  * an ~800 MB unspillable buffer — the exact failure class the capped
  * dedup posting lists avoid). The positional build is a row_number +
  * full-frame count window (one sort, sort-based and spilling; no
  * per-key in-memory aggregation state) over the one edge shuffle,
  * shared across all hops via a lazy localCheckpoint. Each hop is
  * then ONE join: frontier ⋈ adjacency on node = src with
  * pos = idx(node, t) mod deg as the residual predicate — AQE
  * broadcasts the frontier side (|seeds| rows, typically ≪ graph),
  * so the adjacency streams through exactly once per hop (deg riding
  * the adjacency row is what keeps the idx expression join-local; a
  * separate degree table would cost a second fact-scale scan per
  * hop). Each wave is checkpointed (seed-sized): hop t+1 and the
  * final union read materialized blocks, so a w-step walk costs
  * exactly w adjacency scans — not the O(w²) a lineage-recursive
  * union would re-execute (broadcast joins leave no exchange on the
  * adjacency side for ReuseExchange to dedupe). Walks that reach a
  * sink node simply end (inner join), same as the reference BFS
  * treating missing adjacency as absence (main.py:272-305's neighbor
  * lookups).
  */
object RandomWalks {

  /** Walk `steps` hops from every seed. `edges(src, dst)` directed
    * (pass a bidirectional edge set for undirected semantics);
    * `seeds(seed)` one row per walk start. Returns
    * (seed, step, node) for step 0..steps, one walk per seed. */
  def run(s: SparkSession, edges: DataFrame, seeds: DataFrame, steps: Int): DataFrame = {
    require(steps >= 0, s"steps must be >= 0, got $steps")
    // positional adjacency: pos is 0-based rank of dst among the
    // node's (distinct) neighbors sorted ascending — element pos of
    // the sorted neighbor list, without ever materializing the list —
    // and deg from the same window spec (full-frame count shares the
    // one partition sort). ONE edge-sized checkpoint, on DISK (the
    // KTruss/KCore peel discipline): it is read once per hop, and at
    // the 52M-edge sf1x rung in-memory edge-scale checkpoints crowded
    // the unified pool and starved the dedup aggregation
    // (UNABLE_TO_ACQUIRE_MEMORY).
    val byNode = Window.partitionBy(col("src")).orderBy(col("dst"))
    val adj = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .distinct()
      .withColumn("pos", row_number().over(byNode) - 1)
      .withColumn("deg", count(lit(1)).over(
        byNode.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .localCheckpoint(false, org.apache.spark.storage.StorageLevel.DISK_ONLY)
    // uniquely-named projection: the loop joins cur (whose lineage
    // would otherwise contain adj from earlier hops) back against it,
    // so shared column names would be ambiguous self-join references
    val adjT = adj.select(col("src").as("__aj_src"), col("pos").as("__aj_pos"),
      col("dst").as("__aj_dst"), col("deg").as("__aj_deg"))
    var cur = seeds.select(col("seed").cast("long").as("seed"),
      col("seed").cast("long").as("node"), lit(0L).as("step"))
      .localCheckpoint(true)
    val waves = Seq.newBuilder[DataFrame]
    waves += cur
    for (t <- 1 to steps) {
      // one fact-scale scan per hop: node = src is the hash key, the
      // positional pick is the join's residual predicate (bounded by
      // the node's degree, never materialized)
      cur = cur.join(adjT,
          col("node") === col("__aj_src") &&
            col("__aj_pos") === expr(
              s"pmod(pmod(node, 2147483647) * 1103515245 + $t * 12345, 2147483647) % __aj_deg"))
        .select(col("seed"), col("__aj_dst").as("node"), lit(t.toLong).as("step"))
        // seed-sized; makes hop t+1 AND the final union read blocks —
        // an unbroken lineage would re-execute hop k in every wave
        // ≥ k of the union (O(steps²) adjacency scans)
        .localCheckpoint(true)
      waves += cur
    }
    waves.result().reduce(_ union _)
  }
}
