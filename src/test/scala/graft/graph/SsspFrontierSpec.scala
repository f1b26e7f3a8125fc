package graft.graph

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Round-15 frontier Bellman-Ford: the engine relaxes only vertices
  * whose distance improved last round. This spec pins the law the
  * optimization rests on — the bounded result equals the ALL-VERTEX
  * unroll (the oracle's formulation) exactly, per hop bound — on
  * deterministic pseudo-random multigraphs with weight ties, plus the
  * hop-bound edge the frontier path could get wrong (a vertex settled
  * early must still forward longer-but-within-bound paths it carried
  * when it improved). */
class SsspFrontierSpec extends SparkSpec {

  /** Local all-vertex reference: dist_k(v) = min over ≤k-edge paths,
    * computed exactly in cents (Long) per textbook unroll. */
  private def reference(edges: Seq[(Long, Long, Long)], seeds: Seq[Long],
                        hops: Int): Map[Long, Long] = {
    var dist = seeds.map(_ -> 0L).toMap
    (1 to hops).foreach { _ =>
      val relaxed = edges.flatMap { case (a, b, w) =>
        dist.get(a).map(da => b -> (da + w))
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1).map { case (n, xs) =>
        n -> xs.map(_._2).min
      }
    }
    dist
  }

  private def engine(edges: Seq[(Long, Long, Long)], seeds: Seq[Long],
                     hops: Int): Map[Long, Long] = {
    import spark.implicits._
    val e = edges.toDF("src", "dst", "cents")
      .select($"src", $"dst", ($"cents".cast("decimal(18,2)") / 100).as("w"))
    Sssp.run(spark, e, seeds.toDF("node"), hops).collect()
      .map(r => r.getLong(0) -> math.round(r.getDouble(1) * 100)).toMap
  }

  test("frontier result equals the all-vertex unroll on pseudo-random graphs, every hop bound") {
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { trial =>
      val n = 40
      // multigraph with duplicate edges and many weight ties (cents in
      // {10,20,30}) — ties are where a wrong improved-flag would hide
      val edges = Seq.fill(160)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong, (rnd.nextInt(3) + 1) * 10L))
        .filter { case (a, b, _) => a != b }
      val seeds = Seq(0L, 1L, 7L)
      (1 to 6).foreach { hops =>
        val exp = reference(edges, seeds, hops)
        val got = engine(edges, seeds, hops)
        assert(got === exp, s"trial $trial hops $hops")
      }
    }
  }

  test("a vertex that stops improving keeps forwarding nothing — and that is enough") {
    // 0 →(1.00) 1 →(1.00) 2, plus 0 →(5.00) 2: vertex 2 improves at
    // hop 1 (5.00) and again at hop 2 (2.00); vertex 1 improves only
    // at hop 1. With 3 hops, 2 →(1.00) 3 must carry the hop-2 value.
    val edges = Seq((0L, 1L, 100L), (1L, 2L, 100L), (0L, 2L, 500L), (2L, 3L, 100L))
    assert(engine(edges, Seq(0L), 2) === Map(0L -> 0L, 1L -> 100L, 2L -> 200L, 3L -> 600L))
    assert(engine(edges, Seq(0L), 3) === Map(0L -> 0L, 1L -> 100L, 2L -> 200L, 3L -> 300L))
  }
}
