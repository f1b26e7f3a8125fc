package graft.graph

import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed census / GED / validation examples mirroring the
  * reference semantics (generate_all_subgraphs mcs.py:196-220,
  * exact GED mcs.py:338-346, validation mcs.py:27-54). */
class SubgraphsSpec extends AnyFunSuite {

  private def g(nodes: Seq[Int], edges: (Int, Int)*): Subgraphs.LocalGraph =
    Subgraphs.validate(nodes, edges).toOption.get

  test("census of a 4-cycle: one class per size (edge, path-3, cycle-4)") {
    val c = Subgraphs.census(g(Seq(1, 2, 3, 4), (1, 2), (2, 3), (3, 4), (4, 1)))
    assert(c.map(_._2).sorted === Seq(2, 3, 4))
    assert(c.map(_._1).distinct.size === 3)
  }

  test("census of triangle + pendant: edge, {path-3, triangle}, full graph") {
    val c = Subgraphs.census(g(Seq(1, 2, 3, 4), (1, 2), (2, 3), (1, 3), (3, 4)))
    // size 2: 1 class; size 3: path and triangle; size 4: 1 class
    assert(c.count(_._2 == 2) === 1)
    assert(c.count(_._2 == 3) === 2)
    assert(c.count(_._2 == 4) === 1)
  }

  test("census dedups isomorphic subgraphs within an entity") {
    // path of 5: every induced connected pair is THE edge class, etc.
    val c = Subgraphs.census(g(Seq(1, 2, 3, 4, 5), (1, 2), (2, 3), (3, 4), (4, 5)))
    assert(c === Seq(c.find(_._2 == 2).get, c.find(_._2 == 3).get, c.find(_._2 == 4).get))
  }

  test("exact GED: identical graphs differ by 0") {
    val p = g(Seq(1, 2, 3), (1, 2), (2, 3))
    assert(Subgraphs.exactGed(p, p) === 0)
  }

  test("exact GED: path-3 to triangle is one edge insertion") {
    assert(Subgraphs.exactGed(
      g(Seq(1, 2, 3), (1, 2), (2, 3)),
      g(Seq(1, 2, 3), (1, 2), (2, 3), (1, 3))) === 1)
  }

  test("exact GED: size difference counts as node + edge insertions") {
    // edge (2 nodes) -> path-3 (3 nodes): +1 node, +1 edge
    assert(Subgraphs.exactGed(
      g(Seq(1, 2), (1, 2)),
      g(Seq(1, 2, 3), (1, 2), (2, 3))) === 2)
  }

  test("validation rejects oversized graphs, self-loops, dangling edges") {
    assert(Subgraphs.validate((1 to 11).toSeq, Seq((1, 2))).isLeft)
    assert(Subgraphs.validate(Seq(1, 2), Seq((1, 1))).isLeft)
    assert(Subgraphs.validate(Seq(1, 2), Seq((1, 3))).isLeft)
    assert(Subgraphs.validate(Seq(1, 2), Seq((1, 2))).isRight)
  }
}
