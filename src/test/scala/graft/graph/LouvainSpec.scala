package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A37 one-level Louvain: closed forms on hand graphs, the
  * singleton-swap guard, per-sweep Q non-decrease on the shipped
  * graph, and determinism. */
class LouvainSpec extends SparkSpec {
  import spark.implicits._

  /** Directed-list modularity Q = Σ_C [L_C/T − (D_C/T)²] — the A35
    * definition, computed independently in-test. */
  private def q(labels: Map[Long, Long], edges: Seq[(Long, Long)]): Double = {
    val t = edges.size.toDouble
    val lab = labels
    val lC = edges.groupBy { case (s, d) => (lab(s), lab(d)) }
      .collect { case ((a, b), es) if a == b => a -> es.size.toLong }
      .groupBy(_._1).view.mapValues(_.values.sum).toMap
    val dC = edges.groupBy { case (s, _) => lab(s) }.view.mapValues(_.size.toLong).toMap
    // .toSeq before map: keys is a Set, and mapping equal per-community
    // terms over a Set would deduplicate them before the sum
    dC.keys.toSeq.map { c =>
      lC.getOrElse(c, 0L) / t - math.pow(dC(c) / t, 2)
    }.sum
  }

  private def sym(pairs: (Long, Long)*): Seq[(Long, Long)] =
    pairs.flatMap(p => Seq(p, p.swap))

  private def runOn(edges: Seq[(Long, Long)], vertices: Seq[Long], sweeps: Int): Map[Long, Long] =
    Louvain.run(spark, vertices.toDF("id"), edges.toDF("src", "dst"), sweeps)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("barbell closed form: each clique collapses to one community, then fixpoint") {
    // two 5-cliques {1..5}, {6..10} bridged by 5–6: odd movers fold
    // onto min-labeled neighbors, even movers follow, and by sweep 3
    // the partition is exactly the two cliques — labeled by each
    // clique's smallest vertex — and every later sweep is a fixpoint.
    val cliqueA = for (a <- 1L to 5L; b <- 1L to 5L if a < b) yield (a, b)
    val cliqueB = for (a <- 6L to 10L; b <- 6L to 10L if a < b) yield (a, b)
    val edges = sym((cliqueA ++ cliqueB :+ (5L, 6L)): _*)
    val expected = ((1L to 5L).map(_ -> 1L) ++ (6L to 10L).map(_ -> 6L)).toMap
    for (sweeps <- Seq(3, 4, 6)) {
      assert(runOn(edges, 1L to 10L, sweeps) === expected, s"sweeps=$sweeps")
    }
    // and the closed-form Q of that partition: 2·(20/42 − (21/42)²)
    assert(math.abs(q(expected, edges) - 2.0 * (20.0 / 42.0 - 0.25)) < 1e-12)
  }

  test("singleton-swap guard: a single edge merges toward the smaller label, never oscillates") {
    // sweep 1 (odd movers): 1's only target is the LARGER singleton 2
    // — guarded out, nothing moves; sweep 2 (even movers): 2 → {1}.
    // Without the guard and parity, 1 and 2 (mutually best) would
    // swap labels every sweep.
    val edges = sym((1L, 2L))
    assert(runOn(edges, Seq(1L, 2L), sweeps = 1) === Map(1L -> 1L, 2L -> 2L))
    for (sweeps <- 2 to 4) {
      assert(runOn(edges, Seq(1L, 2L), sweeps) === Map(1L -> 1L, 2L -> 1L),
        s"sweeps=$sweeps")
    }
  }

  test("isolated vertices keep their own label; empty graphs are fixpoints") {
    val edges = sym((1L, 2L))
    val got = runOn(edges, Seq(1L, 2L, 99L), sweeps = 2)
    assert(got(99L) === 99L)
    assert(runOn(Seq.empty, Seq(7L, 8L), sweeps = 2) === Map(7L -> 7L, 8L -> 8L))
  }

  test("4-cycle: bipartite structure converges to the Q-optimal pairing, no oscillation") {
    // THE synchronous-Louvain failure mode: with all vertices moving
    // at once, a 4-cycle flips between its two bipartition labelings
    // forever (each is the other's best response). Odd-even
    // sub-sweeps freeze half the graph per sweep, and the cycle
    // settles on the pairing {1,4}/{2,3} — Q = 2·(2/8 − (4/8)²) = 0,
    // the optimum for a 4-cycle — stable from sweep 2 on.
    val edges = sym((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val expected = Map(1L -> 1L, 4L -> 1L, 2L -> 2L, 3L -> 2L)
    for (sweeps <- 2 to 5) {
      assert(runOn(edges, 1L to 4L, sweeps) === expected, s"sweeps=$sweeps")
    }
    assert(math.abs(q(expected, edges)) < 1e-12)
    assert(q(expected, edges) >= q((1L to 4L).map(v => v -> v).toMap, edges))
  }

  test("shipped graph: Q is non-decreasing per sweep and beats the LPA labeling") {
    val edges = GraphBuilder.partEdgesWide(spark, sfDir)
      .select($"src".cast("long"), $"dst".cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val vertices = graft.Tables.part(spark, sfDir)
      .select($"p_partkey".cast("long")).collect().map(_.getLong(0)).toSeq
    val vDf = vertices.toDF("id")
    val eDf = edges.toDF("src", "dst")
    val qs = (0 to 4).map {
      case 0 => q(vertices.map(v => v -> v).toMap, edges)
      case k =>
        val lab = Louvain.run(spark, vDf, eDf, k)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        q(lab, edges)
    }
    qs.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a - 1e-12, s"Q decreased across a sweep: $qs")
    }
    // the Q-optimizer must not lose to the vote-based detector on its
    // own objective (both run 4 rounds from singletons)
    val lpa = LabelPropagation.run(spark, vDf, eDf, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(qs.last >= q(lpa, edges) - 1e-12, s"louvain Q ${qs.last} < LPA Q ${q(lpa, edges)}")
  }

  test("determinism: two evaluations of the shipped key are identical") {
    val a = GraphPack.queries("g_louvain")(spark, sfDir)
    val b = GraphPack.queries("g_louvain")(spark, sfDir)
    assert(a.except(b).count() === 0 && b.except(a).count() === 0)
  }
}
