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

  test("canon-key → WL-hash dictionary: the 9 connected ≤4-node classes") {
    // Pins the literals embedded in SubgraphPack's DuckDB oracle: if
    // WL hashing (or the canon key format) ever changes, this fails
    // before the driver's hash compare does.
    val expected = Map(
      "2:1:11" -> "de4694dddcb9035ab2f53f563f9699bf",
      "3:2:112" -> "51139270af9321b89635acca676c2177",
      "3:3:222" -> "dee09eecea3a7f2063ef6a3a103855e3",
      "4:3:1122" -> "6d090fe3937b01e38819a7b5d4237ab1",
      "4:3:1113" -> "59bf232e1a78412f9c9b77315246ab6c",
      "4:4:1223" -> "a32f0c85e825a65627d8df8f2d9a6003",
      "4:4:2222" -> "3e9feae938259890d2a4253469240227",
      "4:5:2233" -> "eca5e60d4f0a1fe8cec33d62c710d1fb",
      "4:6:3333" -> "5688ca8e2136fda0029dee1dd3074496")
    val reps: Seq[(Seq[Int], Seq[(Int, Int)])] = Seq(
      (Seq(1, 2), Seq((1, 2))),
      (Seq(1, 2, 3), Seq((1, 2), (2, 3))),
      (Seq(1, 2, 3), Seq((1, 2), (2, 3), (1, 3))),
      (Seq(1, 2, 3, 4), Seq((1, 2), (2, 3), (3, 4))),
      (Seq(1, 2, 3, 4), Seq((1, 2), (1, 3), (1, 4))),
      (Seq(1, 2, 3, 4), Seq((1, 2), (2, 3), (1, 3), (3, 4))),
      (Seq(1, 2, 3, 4), Seq((1, 2), (2, 3), (3, 4), (1, 4))),
      (Seq(1, 2, 3, 4), Seq((1, 2), (2, 3), (3, 4), (1, 4), (1, 3))),
      (Seq(1, 2, 3, 4), Seq((1, 2), (2, 3), (3, 4), (1, 4), (1, 3), (2, 4))))
    val got = reps.map { case (ns, es) =>
      val lg = g(ns, es: _*)
      val (h, _, ck) = Subgraphs.censusDetailed(lg).find(_._2 == lg.n).get
      ck -> h
    }.toMap
    assert(got === expected)
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
