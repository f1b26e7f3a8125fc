package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** k-core decomposition by iterative peeling: repeatedly drop every
  * vertex whose degree (within the surviving subgraph) is below k
  * until the edge set is stable; return each core vertex with its
  * in-core degree.
  *
  * Scale shape: each round is one partial-aggregable degree count
  * plus two left-semi joins against the alive set (AQE broadcasts it
  * once peeling has shrunk it) — the same join-per-round pattern as
  * the frontier BFS. The edge set is localCheckpointed every round,
  * so lineage stays one round deep however many rounds the cascade
  * takes, and the convergence probe rides the same count that
  * materializes the checkpoint. Rounds are bounded by the peeling
  * depth of the graph (≤ the longest degeneracy cascade), not by the
  * vertex count; every round strictly shrinks the edge set or
  * terminates.
  */
object KCore {

  /** Peel-loop checkpoints live on DISK (the KTruss discipline): the
    * loop's working state is edge-sized, TWO copies coexist at every
    * round boundary, and each is read at most twice per round — at
    * the 52M-edge sf1x rung the in-memory copies crowded the unified
    * pool's protected storage region and starved the degree
    * aggregation (UNABLE_TO_ACQUIRE_MEMORY) even with per-round
    * frees; on disk the loop is memory-bounded at ANY edge count for
    * ~a second per round of sequential I/O at that rung. */
  private val PEEL_LEVEL = org.apache.spark.storage.StorageLevel.DISK_ONLY

  def run(s: SparkSession, edges0: DataFrame, k: Int, maxIter: Int = 100): DataFrame = {
    import s.implicits._
    var edges = edges0
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .localCheckpoint(true, PEEL_LEVEL)
    var nEdges = edges.count()
    var converged = nEdges == 0L
    var iter = 0
    while (!converged && iter < maxIter) {
      val alive = edges.groupBy($"src").agg(count(lit(1)).as("deg"))
        .filter($"deg" >= k)
        .select($"src".as("node"))
      val pruned = edges
        .join(alive.select($"node".as("src")), Seq("src"), "left_semi")
        .join(alive.select($"node".as("dst")), Seq("dst"), "left_semi")
        .select($"src", $"dst")
        .localCheckpoint(true, PEEL_LEVEL)
      val n2 = pruned.count()
      converged = n2 == nEdges
      nEdges = n2
      // the new checkpoint is materialized (count above) — the
      // previous round's blocks are dead, free them NOW (the KTruss
      // discipline): leaking one edge-sized checkpoint per round
      // pinned the whole unified pool by round N at the 52M-edge
      // sf1x rung and starved execution (UNABLE_TO_ACQUIRE_MEMORY)
      KTruss.freeCheckpoint(edges)
      edges = pruned
      iter += 1
    }
    // a mid-peel edge set is NOT the k-core — refuse to return it
    // (mirrors ConnectedComponents' non-convergence guard; the SQL
    // oracle's unroll margin emits a poison sentinel for the same case)
    if (!converged) {
      KTruss.freeCheckpoint(edges) // a thrown run must not leak blocks
      throw new IllegalStateException(
        s"k-core peeling did not converge within $maxIter rounds ($nEdges edges still changing)")
    }
    edges.groupBy($"src".as("node")).agg(count(lit(1)).as("core_degree"))
  }
}
