package graft.graph

/** Deterministic Weisfeiler-Lehman canonical graph hash (pure Scala,
  * no Spark dependency — used inside per-entity mapGroups).
  *
  * Re-expresses the reference's canonical identity
  * (`graph_to_canonical_hash`, mcs.py:222-241, which delegates to
  * networkx's WL hash with no node/edge attributes): initial labels
  * are node degrees, refined for `iters` rounds by hashing each
  * node's label together with the sorted multiset of its neighbors'
  * labels; the final hash digests the sorted multiset of labels plus
  * the node and edge counts.
  *
  * Isomorphism-invariant by construction (everything is
  * order-independent); distinguishes all connected graphs up to the
  * census size bound (≤ 4 nodes have pairwise-distinct degree
  * multisets per iso class). Spec-verified with hand-built examples.
  */
object WLHash {

  def md5hex(s: String): String = graft.util.Md5.hex(s)

  /** @param nodes node ids (any ints, need not be dense)
    * @param edges undirected edges as unordered pairs over `nodes`
    * @param initLabels optional initial node labels; defaults to
    *                   degree (the unlabeled-graph convention)
    */
  def hash(nodes: Seq[Int], edges: Seq[(Int, Int)],
           initLabels: Map[Int, String] = Map.empty, iters: Int = 3): String = {
    val adj: Map[Int, Seq[Int]] = {
      val m = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
      nodes.map(n => n -> m.getOrElse(n, Seq.empty)).toMap
    }
    var lab: Map[Int, String] =
      nodes.map(n => n -> initLabels.getOrElse(n, adj(n).size.toString)).toMap
    for (_ <- 1 to iters) {
      lab = nodes.map { n =>
        n -> md5hex(lab(n) + "|" + adj(n).map(lab).sorted.mkString(","))
      }.toMap
    }
    md5hex(lab.values.toSeq.sorted.mkString(",") + "#" + nodes.size + "#" + edges.size)
  }
}
