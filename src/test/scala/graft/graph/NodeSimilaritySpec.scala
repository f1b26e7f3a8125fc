package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** NodeSimilarity.jaccard — the degree-capped wedge enumeration must
  * equal the naive wedge self-join on every graph, with the hot-block
  * path exercised by a hub whose degree exceeds the cap. */
class NodeSimilaritySpec extends SparkSpec {
  import spark.implicits._

  /** Reference implementation: the plain wedge self-join the capped
    * version replaced. */
  private def naive(edges: DataFrame): DataFrame = {
    val e = edges.select($"src".cast("long").as("src"), $"dst".cast("long").as("dst"))
    val deg = e.groupBy($"src".as("node")).agg(count(lit(1)).as("deg"))
    e.select($"src".as("mid"), $"dst".as("a"))
      .join(e.select($"src".as("mid"), $"dst".as("b")), "mid")
      .filter($"a" < $"b")
      .groupBy($"a", $"b").agg(count(lit(1)).as("n_common"))
      .join(deg.select($"node".as("a"), $"deg".as("da")), "a")
      .join(deg.select($"node".as("b"), $"deg".as("db")), "b")
      .withColumn("jaccard",
        $"n_common".cast("double") / ($"da" + $"db" - $"n_common").cast("double"))
      .select($"a".as("node_a"), $"b".as("node_b"), $"n_common", $"jaccard")
  }

  private def sortedRows(df: DataFrame) =
    df.orderBy("node_a", "node_b").collect().toSeq

  /** Bidirectional edge list from undirected pairs. */
  private def undirected(pairs: Seq[(Long, Long)]): DataFrame =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")

  // Hub 0 has degree 40 (> tau = 8, forcing ⌈40/8⌉ = 5 blocks and the
  // cross-block join); leaves form a chain so non-hub wedges exist too.
  private val hubGraph = undirected(
    (1L to 40L).map(i => (0L, i)) ++ (1L until 40L).map(i => (i, i + 1)))

  test("hot-hub graph: capped enumeration equals the naive wedge join") {
    val got = sortedRows(NodeSimilarity.jaccard(spark, hubGraph, tau = 8))
    val want = sortedRows(naive(hubGraph))
    assert(got == want)
    // hub neighbors (leaf pairs through the hub) must be present
    assert(got.size > 700) // C(40,2) = 780 pairs via the hub
  }

  test("celebrity hub (deg = 2000 >> tau = 8): blocks stay bounded and the closed form holds") {
    // 250 blocks for the hub, ~31k cross-block task groups — the
    // degree-scaled work the positional build spreads out; every
    // aggregation buffer holds <= tau neighbor ids by construction
    // (collects group on (mid, rank DIV tau)). On a pure star every
    // leaf pair meets only through the hub: n_common = 1 and
    // jaccard = 1/(1+1-1) = 1.0 for all C(2000,2) pairs.
    val star = undirected((1L to 2000L).map(i => (0L, i)))
    val out = NodeSimilarity.jaccard(spark, star, tau = 8).cache()
    try {
      assert(out.count() === 2000L * 1999L / 2L)
      assert(out.filter($"n_common" =!= 1L || $"jaccard" =!= 1.0).count() === 0)
    } finally out.unpersist()
  }

  test("tau larger than any degree (all-cold path) gives identical results") {
    val cold = sortedRows(NodeSimilarity.jaccard(spark, hubGraph, tau = 1000))
    val hot = sortedRows(NodeSimilarity.jaccard(spark, hubGraph, tau = 8))
    assert(cold == hot)
  }

  test("tau boundary: degree exactly tau stays on the cold path and matches") {
    // star of degree 6, tau = 6: single block, no join rows
    val star = undirected((1L to 6L).map(i => (0L, i)))
    assert(sortedRows(NodeSimilarity.jaccard(spark, star, tau = 6)) ==
      sortedRows(naive(star)))
  }

  test("triangle: each pair has exactly one common neighbor, jaccard 1/3") {
    val tri = undirected(Seq((1L, 2L), (2L, 3L), (1L, 3L)))
    val rows = sortedRows(NodeSimilarity.jaccard(spark, tri, tau = 2))
    assert(rows.size == 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_common") == 1L)
      assert(math.abs(r.getAs[Double]("jaccard") - 1.0 / 3.0) < 1e-15)
    }
  }

  test("random graphs: capped enumeration equals the naive join (tau forces mixed tiers)") {
    val rng = new scala.util.Random(47)
    for (i <- 1 to 10) {
      val n = 6 + rng.nextInt(10)
      val pairs = (for {
        a <- 0L until n; b <- (a + 1) until n
        if rng.nextInt(100) < 40
      } yield (a, b)).toSeq
      if (pairs.nonEmpty) {
        val edges = undirected(pairs)
        // tau = 3 puts most vertices on the hot block path
        assert(sortedRows(NodeSimilarity.jaccard(spark, edges, tau = 3)) ==
          sortedRows(naive(edges)), s"graph $i: $pairs")
      }
    }
  }

  test("matches the sf0.001 part-graph result of the naive join") {
    val edges = GraphBuilder.partEdgesWide(spark, sfDir)
    val got = sortedRows(NodeSimilarity.jaccard(spark, edges, tau = 4)) // force hot path on real data
    val want = sortedRows(naive(edges))
    assert(got == want)
  }
}
