package graft.graph

import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed WL-hash properties (the reference's canonical
  * identity, mcs.py:222-241): isomorphism invariance, discrimination
  * of the small iso classes the census can meet, determinism. */
class WLHashSpec extends AnyFunSuite {

  private def triangle(ids: Seq[Int]) =
    WLHash.hash(ids, Seq((ids(0), ids(1)), (ids(1), ids(2)), (ids(0), ids(2))))

  test("isomorphic graphs hash identically regardless of node ids and edge order") {
    assert(triangle(Seq(1, 2, 3)) === triangle(Seq(7, 42, 9)))
    val path1 = WLHash.hash(Seq(1, 2, 3), Seq((1, 2), (2, 3)))
    val path2 = WLHash.hash(Seq(10, 20, 30), Seq((30, 20), (20, 10)))
    assert(path1 === path2)
  }

  test("deterministic across invocations") {
    assert(triangle(Seq(1, 2, 3)) === triangle(Seq(1, 2, 3)))
  }

  test("distinguishes path-3 from triangle") {
    assert(WLHash.hash(Seq(1, 2, 3), Seq((1, 2), (2, 3))) !== triangle(Seq(1, 2, 3)))
  }

  test("distinguishes all six connected 4-node iso classes") {
    val classes = Seq(
      Seq((1, 2), (2, 3), (3, 4)),                        // path
      Seq((1, 2), (1, 3), (1, 4)),                        // star
      Seq((1, 2), (2, 3), (3, 4), (4, 1)),                // cycle
      Seq((1, 2), (2, 3), (1, 3), (3, 4)),                // triangle + pendant
      Seq((1, 2), (2, 3), (1, 3), (3, 4), (4, 1)),        // diamond
      Seq((1, 2), (2, 3), (1, 3), (3, 4), (4, 1), (2, 4)) // K4
    ).map(es => WLHash.hash(Seq(1, 2, 3, 4), es))
    assert(classes.distinct.size === 6)
  }

  test("initial labels participate when provided") {
    val lab1 = WLHash.hash(Seq(1, 2), Seq((1, 2)), Map(1 -> "a", 2 -> "a"))
    val lab2 = WLHash.hash(Seq(1, 2), Seq((1, 2)), Map(1 -> "a", 2 -> "b"))
    assert(lab1 !== lab2)
  }
}
