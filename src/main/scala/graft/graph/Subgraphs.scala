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

  /** WL-hash memo keyed by (n, m, sorted degree sequence) — a COMPLETE
    * isomorphism invariant for connected graphs of ≤ 4 nodes (the six
    * 4-node, two 3-node and one 2-node connected classes all have
    * pairwise-distinct keys), so the cached hash equals the hash of
    * the actual subgraph. Bounded by the number of iso classes
    * (~10 entries); shared across tasks in the executor JVM. */
  private val wlMemo = new java.util.concurrent.ConcurrentHashMap[Long, String]()

  /** Distinct (canonical hash, size) of all connected induced
    * subgraphs of size 2..maxSize with ≥ 1 edge. */
  def census(g: LocalGraph, maxSize: Int = 4): Seq[(String, Int)] =
    censusDetailed(g, maxSize).map(t => (t._1, t._2))

  /** Census rows as (canonical WL hash, size, canon key), where the
    * canon key is `"size:m:sortedDegreeSequence"` — a cheap structural
    * invariant that is COMPLETE for connected graphs of ≤ 4 nodes (the
    * six 4-node, two 3-node and one 2-node connected classes have
    * pairwise-distinct keys — the same fact the WL memo below relies
    * on), and merely a sound-but-incomplete invariant above 4 nodes.
    * The key is what lets a plain-SQL engine (the DuckDB oracle)
    * classify subgraphs without implementing WL hashing.
    *
    * Enumeration is Wernicke's ESU over ≤[[MAX_NODES]]-node bitmasks:
    * each connected vertex set is generated exactly once (rooted at
    * its minimum vertex, extension candidates restricted to indices
    * above the root and outside N(sub)), so there is no subset
    * filtering and no per-subset connectivity BFS. Hash values are
    * identical to hashing every subgraph directly — sub-5-node
    * hashes come from the iso-class memo, larger ones from
    * [[WLHash.hash]] on the induced subgraph.
    */
  def censusDetailed(g: LocalGraph, maxSize: Int = 4): Seq[(String, Int, String)] = {
    val n = g.n
    // Int bitmasks alias silently above bit 31 — fail loudly instead.
    // (validate() caps graphs at MAX_NODES=10 long before this.)
    require(n < 32, s"census supports < 32 nodes, got $n")
    val out = scala.collection.mutable.LinkedHashMap.empty[String, (Int, String)]
    def result(): Seq[(String, Int, String)] =
      out.iterator.map { case (h, (sz, ck)) => (h, sz, ck) }.toSeq
    if (n < 2 || g.edges.isEmpty) return result()
    val ids = g.nodes.toArray
    java.util.Arrays.sort(ids)
    val adj = new Array[Int](n)
    g.edges.foreach { case (a, b) =>
      val i = java.util.Arrays.binarySearch(ids, a)
      val j = java.util.Arrays.binarySearch(ids, b)
      adj(i) |= 1 << j
      adj(j) |= 1 << i
    }

    // WL hash of the induced subgraph `mask`, via the iso-class memo
    // for ≤ 4 nodes (where (n, m, degseq) is complete).
    def hashOf(mask: Int): (String, Int, String) = {
      var m = 0
      var size = 0
      val degs = new Array[Int](Integer.bitCount(mask))
      var i = 0
      while (i < n) {
        if ((mask & (1 << i)) != 0) {
          val d = Integer.bitCount(adj(i) & mask)
          degs(size) = d
          size += 1
          m += d
        }
        i += 1
      }
      m /= 2
      java.util.Arrays.sort(degs)
      def wlDirect(): String = {
        val subNodes = Vector.newBuilder[Int]
        val subEdges = Seq.newBuilder[(Int, Int)]
        var i = 0
        while (i < n) {
          if ((mask & (1 << i)) != 0) {
            subNodes += ids(i)
            var rest = adj(i) & mask & ~((1 << (i + 1)) - 1)
            while (rest != 0) {
              val j = Integer.numberOfTrailingZeros(rest)
              rest &= rest - 1
              subEdges += ((ids(i), ids(j)))
            }
          }
          i += 1
        }
        WLHash.hash(subNodes.result(), subEdges.result())
      }
      val canon = s"$size:$m:${degs.mkString("")}"
      val hash =
        if (size <= 4) {
          var key = size.toLong << 40 | m.toLong << 32
          var k = 0
          while (k < size) { key = key << 4 | degs(k); k += 1 }
          val cached = wlMemo.get(key)
          if (cached != null) cached
          else {
            val h = wlDirect()
            wlMemo.putIfAbsent(key, h)
            h
          }
        } else wlDirect()
      (hash, size, canon)
    }

    def emit(mask: Int): Unit = {
      val (h, size, canon) = hashOf(mask)
      if (!out.contains(h)) out(h) = (size, canon)
    }

    // ESU: sub ∪ N(sub) is tracked in subNbr; ext ⊆ N(sub) holds only
    // indices > root not yet explored from this tree node.
    def extendSub(sub: Int, ext: Int, root: Int, subNbr: Int): Unit = {
      val size = Integer.bitCount(sub)
      if (size >= 2) emit(sub)
      if (size == maxSize) return
      var e = ext
      while (e != 0) {
        val w = Integer.numberOfTrailingZeros(e)
        e &= e - 1
        val wNew = adj(w) & ~subNbr & ~((1 << (root + 1)) - 1)
        extendSub(sub | (1 << w), e | wNew, root, subNbr | adj(w) | (1 << w))
      }
    }
    val cap = math.min(maxSize, n)
    if (cap >= 2) {
      var v = 0
      while (v < n) {
        extendSub(1 << v, adj(v) & ~((1 << (v + 1)) - 1), v, adj(v) | (1 << v))
        v += 1
      }
    }
    result()
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
