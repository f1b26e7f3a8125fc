package graft.graph

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Randomized invariants for the pure-Scala graph core (seeded —
  * fully deterministic). These run per-entity inside mapGroups in
  * production, so their invariants are what the distributed results
  * inherit. */
class GraphPropertiesSpec extends AnyFunSuite {

  private def randomGraph(rng: Random, maxN: Int): (Vector[Int], Set[(Int, Int)]) = {
    val n = 2 + rng.nextInt(maxN - 1)
    val nodes = Vector.tabulate(n)(identity)
    val edges = nodes.combinations(2).map(p => (p(0), p(1)))
      .filter(_ => rng.nextBoolean()).toSet
    (nodes, edges)
  }

  test("WL hash is invariant under node relabeling and edge order (200 random graphs)") {
    val rng = new Random(42)
    for (_ <- 1 to 200) {
      val (nodes, edges) = randomGraph(rng, 7)
      val perm = rng.shuffle(nodes)
      val f = nodes.zip(perm).toMap
      val permEdges = edges.map { case (a, b) =>
        (math.min(f(a), f(b)), math.max(f(a), f(b)))
      }
      val h1 = WLHash.hash(nodes, edges.toSeq)
      val h2 = WLHash.hash(perm.sorted, rng.shuffle(permEdges.toSeq))
      assert(h1 === h2, s"nodes=$nodes edges=$edges perm=$perm")
    }
  }

  test("census with a smaller size bound is a subset (200 random graphs)") {
    val rng = new Random(43)
    for (_ <- 1 to 200) {
      val (nodes, edges) = randomGraph(rng, 7)
      if (edges.nonEmpty) {
        val g = Subgraphs.LocalGraph(nodes, edges)
        val full = Subgraphs.census(g, maxSize = 4).map(_._1).toSet
        val small = Subgraphs.census(g, maxSize = 3).map(_._1).toSet
        assert(small.subsetOf(full), s"nodes=$nodes edges=$edges")
      }
    }
  }

  test("ESU census equals brute-force subset enumeration (300 random graphs, sizes 2..5)") {
    // The production census enumerates connected induced subgraphs
    // via ESU over bitmasks with an iso-class hash memo; this is the
    // definitionally-obvious reference: every subset, connectivity by
    // BFS, hash every survivor directly.
    def naive(g: Subgraphs.LocalGraph, maxSize: Int): Map[String, Int] = {
      def connected(sub: Seq[Int], edges: Set[(Int, Int)]): Boolean = {
        if (sub.size == 1) return true
        var reach = Set(sub.head)
        var grew = true
        while (grew) {
          val next = reach ++ edges.collect {
            case (a, b) if reach(a) => b
            case (a, b) if reach(b) => a
          }
          grew = next.size > reach.size
          reach = next
        }
        reach.size == sub.size
      }
      val out = scala.collection.mutable.Map.empty[String, Int]
      for (size <- 2 to math.min(maxSize, g.n);
           sub <- g.nodes.combinations(size)) {
        val induced = g.edges.filter { case (a, b) => sub.contains(a) && sub.contains(b) }
        if (induced.nonEmpty && connected(sub, induced))
          out.getOrElseUpdate(WLHash.hash(sub, induced.toSeq), size)
      }
      out.toMap
    }
    val rng = new Random(46)
    for (i <- 1 to 300) {
      val (nodes, edges) = randomGraph(rng, 8)
      val maxSize = 2 + rng.nextInt(4) // 2..5: exercises the memo (≤4) AND the direct path (5)
      val g = Subgraphs.LocalGraph(nodes, edges)
      assert(Subgraphs.census(g, maxSize).toMap === naive(g, maxSize),
        s"i=$i nodes=$nodes edges=$edges maxSize=$maxSize")
    }
  }

  test("exact GED: symmetric, non-negative, zero iff WL-equal, self-distance 0 (100 pairs)") {
    val rng = new Random(44)
    for (_ <- 1 to 100) {
      val (n1, e1) = randomGraph(rng, 5)
      val (n2, e2) = randomGraph(rng, 5)
      val g1 = Subgraphs.LocalGraph(n1, e1)
      val g2 = Subgraphs.LocalGraph(n2, e2)
      val d12 = Subgraphs.exactGed(g1, g2)
      assert(d12 === Subgraphs.exactGed(g2, g1))
      assert(d12 >= 0)
      assert(Subgraphs.exactGed(g1, g1) === 0)
      if (d12 == 0) {
        // GED 0 => isomorphic => equal WL hash
        assert(WLHash.hash(g1.nodes, g1.edges.toSeq) ===
          WLHash.hash(g2.nodes, g2.edges.toSeq), s"g1=$g1 g2=$g2")
      }
      // upper bound: full teardown and rebuild
      assert(d12 <= math.abs(g1.n - g2.n) + g1.m + g2.m)
    }
  }

  test("minhash signature: permutation-invariant, monotone under containment (100 docs)") {
    val rng = new Random(45)
    // the UDF's inner function is not directly accessible, so
    // re-derive the documented contract with WLHash.md5hex
    def sig(shingles: Seq[String]): Seq[String] =
      (1 to 8).map(h => shingles.map(sh => WLHash.md5hex(s"${h}_$sh")).min)
    for (_ <- 1 to 100) {
      val base = Vector.fill(5 + rng.nextInt(20))(rng.nextInt(50).toString)
      val shingles = base.sliding(3).map(_.mkString(" ")).toVector
      if (shingles.nonEmpty) {
        assert(sig(shingles) === sig(rng.shuffle(shingles)))
        // adding shingles can only lower (or keep) each min
        val more = shingles ++ Vector.fill(3)(rng.nextInt(1000).toString)
        sig(shingles).zip(sig(more)).foreach { case (a, b) => assert(b <= a) }
      }
    }
  }
}
