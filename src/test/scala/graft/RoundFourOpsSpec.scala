package graft

import org.apache.spark.sql.functions._

/** Invariant specs for the round-4 operators (A19 label propagation,
  * H8 spike detection, F14 bigram-LM scoring). Exact values are
  * verified by the DuckDB oracles; these assert the semantic
  * invariants a refactor could silently break, plus a hand-computed
  * LPA example. */
class RoundFourOpsSpec extends SparkSpec {
  import spark.implicits._

  test("LabelPropagation: hand-computed two-triangle example") {
    // two triangles {1,2,3} and {10,11,12} bridged by edge 3-10:
    // min-label mode propagation settles each triangle on its minimum
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L))
    val edges = (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")
    val vertices = (Seq(1L, 2L, 3L, 10L, 11L, 12L) :+ 99L).toDF("id") // 99 isolated
    val out = graft.graph.LabelPropagation.run(spark, vertices, edges, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // triangle one: everyone can reach label 1 via mode/min dynamics
    assert(out(1L) === 1L && out(2L) === 1L && out(3L) === 1L)
    // triangle two: 10's neighbors {11, 12, 3} tie at one vote each in
    // round 1 → min label wins locally; by round 4 the community is
    // uniform on a label from within {1, 2, 3, 10, 11, 12}
    assert(Set(out(10L), out(11L), out(12L)).size === 1)
    // the isolated vertex keeps its own label
    assert(out(99L) === 99L)
  }

  test("g_labelprop: total vertex coverage; labels are existing vertex ids") {
    val lp = graft.graph.GraphPack.queries("g_labelprop")(spark, sfDir).cache()
    val parts = Tables.part(spark, sfDir).select(col("p_partkey").cast("long").as("id"))
    assert(lp.count() === parts.count())
    // every label is itself a vertex id (labels only ever copy ids)
    assert(lp.join(parts.withColumnRenamed("id", "label"), Seq("label"), "left_anti")
      .count() === 0)
    // propagation did merge communities (fewer labels than vertices)
    assert(lp.select("label").distinct().count() < lp.count())
  }

  test("PersonalizedPageRank: mass flows from seeds only; unreachable component stays 0") {
    // two disjoint triangles; seed in the first only
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L))
    val edges = (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val out = graft.graph.PersonalizedPageRank.run(spark, edges, seeds, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.size === 6)
    // unreachable-from-seed component gets exactly zero
    assert(out(10L) === 0.0 && out(11L) === 0.0 && out(12L) === 0.0)
    // the seed dominates its own neighborhood
    assert(out(1L) > out(2L) && out(1L) > out(3L))
    assert(out(2L) > 0.0 && out(3L) > 0.0)
    // mass conservation on a bidirectional graph with total teleport
    // 0.15: sum_i = 0.15 + 0.85 * sum_{i-1}, from sum_0 = 0.15
    val expected = (1 to 5).foldLeft(0.15)((s, _) => 0.15 + 0.85 * s)
    assert(math.abs(out.values.sum - expected) < 1e-9)
  }

  test("PersonalizedPageRank: the dim-bounded fast path is bit-identical to the distributed loop") {
    // the guarded driver iteration (smallRanks) must replay the same
    // quantize-then-exact-sum contract: compare on the sf0.001 part
    // edit-graph (sinks, multi-component, real seed set), all 64 bits
    val edges = graft.graph.GraphBuilder.partEdges(spark, sfDir)
    val seeds = Tables.part(spark, sfDir).filter(col("p_partkey") % 100 === 0)
      .select(col("p_partkey").as("node"))
    def ranks(small: Boolean) =
      graft.graph.PersonalizedPageRank.run(spark, edges, seeds, iters = 4, smallRanks = small)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val dist = ranks(small = false)
    val fast = ranks(small = true)
    assert(fast.keySet === dist.keySet)
    assert(fast.forall { case (n, r) =>
      java.lang.Double.doubleToLongBits(r) == java.lang.Double.doubleToLongBits(dist(n))
    }, "fast-path ranks must match the distributed loop bit-for-bit")
    // and the guard refuses a caller lying about boundedness
    val big = spark.range((1L << 20) + 2L).select(col("id").as("src"), lit(2L).as("dst"))
    intercept[IllegalArgumentException] {
      graft.graph.PersonalizedPageRank.run(spark, big,
        Seq(1L).toDF("node"), iters = 1, smallRanks = true)
    }
  }

  test("e_spike: per-type counts sum to event totals; flag matches the cross-multiplication") {
    val sp = graft.streaming.EventsPack.queries("e_spike")(spark, sfDir).cache()
    val evTotals = Tables.events(spark, sfDir)
      .groupBy(col("event_type")).agg(count(lit(1)).as("total"))
    val spTotals = sp.groupBy(col("event_type"))
      .agg(sum(col("n")).as("total2"), count(lit(1)).as("n_buckets"))
    assert(evTotals.join(spTotals, "event_type")
      .filter(col("total") =!= col("total2")).count() === 0)
    // flag is exactly n * n_buckets > 2 * total for the row's type
    val bad = sp.join(spTotals, "event_type")
      .filter(col("spike") =!= (col("n") * col("n_buckets") > col("total2") * 2))
    assert(bad.count() === 0)
  }

  test("t_bigram_lm: every bigram counts itself, so avg frequency >= 1; totals consistent") {
    val lm = graft.text.TextPack.queries("t_bigram_lm")(spark, sfDir).cache()
    assert(lm.count() > 0)
    assert(lm.filter(col("avg_bigram_freq") < 1.0).count() === 0)
    assert(lm.filter(col("sum_freq") < col("n_bigrams")).count() === 0)
    // avg is exactly sum/count
    assert(lm.filter(col("avg_bigram_freq") =!=
      col("sum_freq").cast("double") / col("n_bigrams").cast("double")).count() === 0)
    // docs with >= 2 tokens all appear
    val expected = Tables.documents(spark, sfDir)
      .filter(size(split(graft.text.TextOps.norm(col("text")), " ")) >= 2).count()
    assert(lm.count() === expected)
  }
}
