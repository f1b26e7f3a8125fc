package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bridge (cut-edge) detection over the DIMENSION-BOUNDED class
  * graph — A29's quotient pattern applied to 2-edge-connectivity:
  * whether an edit-graph edge is a single point of failure is a pure
  * function of the (brand, size) CLASS graph, whose node count is
  * bounded by the attribute domain (|brands| × |sizes|) regardless
  * of how many fact parts populate each class. So the plan is one
  * distributed distinct over the fact table, an in-process Tarjan
  * bridge pass over the collected class graph (limit-guarded: the
  * collect refuses if the class count exceeds the domain bound,
  * mirroring DagDepth), and the bounded per-class-edge result —
  * never a fact-scaled connectivity iteration. A naive distributed
  * per-edge BFS would be |edges| full traversals of a graph that
  * fits in one task.
  *
  * The oracle replays 2-edge-connectivity definitionally: for every
  * class edge, a recursive reachability CTE that avoids (both
  * directions of) that edge — bridge ⟺ the far endpoint is
  * unreachable. Two entirely different algorithms (Tarjan low-link
  * vs per-edge deletion BFS) agreeing on the hash checks the
  * SEMANTICS, not the implementation. */
object Bridges {

  /** Classic iterative Tarjan bridge-finding on an undirected
    * adjacency (node → neighbors with edge ids); returns bridge edge
    * ids. Multi-edges share an id only if identical (src,dst); a
    * parallel edge pair is never a bridge and carries distinct ids,
    * handled by the edge-id (not node) parent check. */
  private def tarjanBridges(adj: Map[Long, Seq[(Long, Long)]]): Set[Long] = {
    val disc = scala.collection.mutable.Map.empty[Long, Int]
    val low = scala.collection.mutable.Map.empty[Long, Int]
    val bridges = scala.collection.mutable.Set.empty[Long]
    var timer = 0
    // explicit stack: (node, incoming edge id, child iterator)
    for (root <- adj.keys.toSeq.sorted if !disc.contains(root)) {
      val stack = scala.collection.mutable.Stack[(Long, Long, Iterator[(Long, Long)])]()
      disc(root) = timer; low(root) = timer; timer += 1
      stack.push((root, -1L, adj(root).iterator))
      while (stack.nonEmpty) {
        val (u, inEdge, it) = stack.top
        if (it.hasNext) {
          val (v, eid) = it.next()
          if (eid != inEdge) {
            if (!disc.contains(v)) {
              disc(v) = timer; low(v) = timer; timer += 1
              stack.push((v, eid, adj(v).iterator))
            } else low(u) = math.min(low(u), disc(v))
          }
        } else {
          stack.pop()
          if (stack.nonEmpty) {
            val (p, _, _) = stack.top
            low(p) = math.min(low(p), low(u))
            if (low(u) > disc(p)) bridges += inEdge
          }
        }
      }
    }
    bridges.toSet
  }

  /** In-process bridge classification of a grouped edge list: one
    * output tuple per input edge, flagged. Components are keyed by
    * `group` (edges never cross groups). */
  private[graph] def bridgesOf(edges: Seq[(String, Long, Long)]): Seq[(String, Long, Long, Boolean)] = {
    val withIds = edges.sorted.zipWithIndex
      .map { case ((g, lo, hi), i) => (g, lo, hi, i.toLong) }
    withIds.groupBy(_._1).toSeq.flatMap { case (group, es) =>
      val adj = es.flatMap { case (_, lo, hi, eid) =>
        Seq(lo -> (hi, eid), hi -> (lo, eid)) }
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val br = tarjanBridges(adj)
      es.map { case (_, lo, hi, eid) => (group, lo, hi, br.contains(eid)) }
    }
  }

  /** Bridge classification of the widened (±1, ±2) part edit rule's
    * class graph: one row per canonical class edge
    * (brand, size_lo, size_hi, is_bridge). */
  def classEdgeBridges(s: SparkSession, d: String): DataFrame = {
    val cls = Quotient.collectClasses(s, d).keys.toSeq
    val bySize = cls.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // canonical up-edges under the widened rule
    val edges = for {
      (brand, sizes) <- bySize.toSeq
      a <- sizes.toSeq
      delta <- Seq(1L, 2L)
      if sizes.contains(a + delta)
    } yield (brand, a, a + delta)
    s.createDataFrame(bridgesOf(edges))
      .toDF("brand", "size_lo", "size_hi", "is_bridge")
  }
}
