package graft.graph

/** Per-entity subgraph algorithms (pure Scala, run inside mapGroups —
  * entity graphs are molecule-sized, ≤ [[MAX_NODES]] nodes, the same
  * regime the reference enforces via its max_atoms=10 constraint,
  * mcs.py:42).
  *
  * - census: all connected node-induced subgraphs of size 2..k with
  *   ≥ 1 edge, deduplicated by canonical WL hash
  *   (generate_all_subgraphs, mcs.py:196-220).
  * - exact GED: unit-cost unlabeled graph edit distance by full
  *   injection enumeration (the networkx-default cost model the
  *   reference uses, mcs.py:338-346). With unit costs, mapping a
  *   node is never worse than delete+insert, so enumerating
  *   injections of the smaller graph into the larger is exact.
  */
object Subgraphs {

  /** Validation bound on entity-graph size (reference: max 10 atoms). */
  val MAX_NODES = 10

  /** A small undirected local graph: node ids with canonical
    * (min, max) edge pairs. */
  final case class LocalGraph(nodes: Vector[Int], edges: Set[(Int, Int)]) {
    def n: Int = nodes.size
    def m: Int = edges.size
  }

  /** Input validation (B6 — mirrors the reference's constraint
    * surface, mcs.py:27-54): size cap, no self-loops, edges over
    * declared nodes only. */
  def validate(nodes: Seq[Int], edges: Seq[(Int, Int)]): Either[String, LocalGraph] = {
    val ns = nodes.distinct.toVector
    if (ns.isEmpty) Left("empty graph")
    else if (ns.size > MAX_NODES) Left(s"too many nodes: ${ns.size} > $MAX_NODES")
    else if (edges.exists { case (a, b) => a == b }) Left("self-loop")
    else {
      val nodeSet = ns.toSet
      if (edges.exists { case (a, b) => !nodeSet(a) || !nodeSet(b) })
        Left("edge endpoint not in node set")
      else Right(LocalGraph(ns.sorted,
        edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet))
    }
  }

  private def connected(sub: Seq[Int], edges: Set[(Int, Int)]): Boolean = {
    val s = sub.toSet
    val adj = edges.toSeq.filter { case (a, b) => s(a) && s(b) }
    if (sub.size == 1) return true
    var reach = Set(sub.head)
    var grew = true
    while (grew) {
      val next = reach ++ adj.collect {
        case (a, b) if reach(a) => b
        case (a, b) if reach(b) => a
      }
      grew = next.size > reach.size
      reach = next
    }
    reach.size == sub.size
  }

  /** Distinct (canonical hash, size) of all connected induced
    * subgraphs of size 2..maxSize with ≥ 1 edge. */
  def census(g: LocalGraph, maxSize: Int = 4): Seq[(String, Int)] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    for (size <- 2 to math.min(maxSize, g.n);
         sub <- g.nodes.combinations(size)) {
      val induced = g.edges.filter { case (a, b) => sub.contains(a) && sub.contains(b) }
      if (induced.nonEmpty && connected(sub, induced)) {
        val h = WLHash.hash(sub, induced.toSeq)
        if (!out.contains(h)) out(h) = size
      }
    }
    out.toSeq
  }

  /** Exact unit-cost GED between two small graphs (≤ MAX_NODES). */
  def exactGed(g1: LocalGraph, g2: LocalGraph): Int = {
    val (small, big) = if (g1.n <= g2.n) (g1, g2) else (g2, g1)
    var bestMapped = 0
    for (image <- big.nodes.combinations(small.n); perm <- image.permutations) {
      val f = small.nodes.zip(perm).toMap
      val mapped = small.edges.count { case (a, b) =>
        val (x, y) = (f(a), f(b))
        big.edges.contains((math.min(x, y), math.max(x, y)))
      }
      if (mapped > bestMapped) bestMapped = mapped
    }
    (big.n - small.n) + small.m + big.m - 2 * bestMapped
  }
}
