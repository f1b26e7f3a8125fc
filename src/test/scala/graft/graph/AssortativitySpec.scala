package graft.graph

import graft.SparkSpec

/** A32 degree assortativity: closed-form examples + the sf0.001 value. */
class AssortativitySpec extends SparkSpec {

  private def sym(pairs: (Long, Long)*) = {
    import spark.implicits._
    val up = pairs.toDF("src", "dst")
    up.union(up.select($"dst".as("src"), $"src".as("dst")))
  }

  private def r(edges: org.apache.spark.sql.DataFrame): Option[Double] = {
    val row = Assortativity.of(edges).head()
    if (row.isNullAt(1)) None else Some(row.getDouble(1))
  }

  test("a star is maximally disassortative: r = -1") {
    // hub deg 3 ↔ leaves deg 1: every edge pairs extreme degrees
    assert(r(sym((0L, 1L), (0L, 2L), (0L, 3L))).get === -1.0)
  }

  test("a degree-regular graph has undefined assortativity (NULL, not 0/0)") {
    // 4-cycle: every node degree 2 → zero variance on both margins
    assert(r(sym((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))).isEmpty)
  }

  test("two disjoint cliques of different sizes are perfectly assortative: r = 1") {
    // within a clique all degrees equal; K3 ∪ K4 never mixes degrees 2 and 3
    val k3 = for (a <- 1L to 3L; b <- 1L to 3L if a < b) yield (a, b)
    val k4 = for (a <- 11L to 14L; b <- 11L to 14L if a < b) yield (a, b)
    assert(math.abs(r(sym((k3 ++ k4): _*)).get - 1.0) < 1e-12)
  }

  test("a path of 4 nodes is disassortative but not extreme") {
    // 1-2-3-4: ends (deg 1) attach to middles (deg 2); exact r = -0.5
    assert(math.abs(r(sym((1L, 2L), (2L, 3L), (3L, 4L))).get - (-0.5)) < 1e-12)
  }

  test("sf0.001 edit-graph: defined, in [-1, 1], and matches the (size-band) structure") {
    val v = r(GraphBuilder.partEdgesWide(spark, sfDir))
    assert(v.isDefined)
    assert(v.get >= -1.0 && v.get <= 1.0)
  }
}
