package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MEASURED shuffle-volume evidence for the bounded-state claims the
  * plan-shape audits make analytically. A plan can look right and
  * still move too many bytes — at 100 TB the shuffle IS the cost, so
  * this spec runs representative operators with a task-metrics
  * listener and asserts hard byte ceilings that only hold if the
  * claimed mechanism (map-side partial aggregation, capped aggregate
  * buffers) is actually engaged:
  *
  *  - ANF: the per-round register shuffle is O(V × 256 B) — partial
  *    register-max merge collapses the E-row message stream BEFORE
  *    the exchange, so bytes stay vertex-bounded however dense the
  *    graph (the exact-neighbor-set alternative is O(Σ|ball|)).
  *  - CappedCollectLong / TopKByScore: under a worst-case skew (ONE
  *    group, 400k rows) the shuffled aggregation state is ≤ cap+1
  *    longs / ≤ k entries per partial buffer — kilobytes, not the
  *    megabytes an uncapped collect_list would move.
  *
  * Ceilings are deliberately generous (4×-ish over the raw bound,
  * room for codec framing and map-status overhead; shuffle
  * compression only ever shrinks bytes) so the assertions pin the
  * MECHANISM, not a brittle constant.
  */
class ShuffleVolumeSpec extends SparkSpec {

  /** Total shuffle-write bytes across all tasks of `action`
    * (shared listener + quiesce accounting in [[TestMetrics]]). */
  private def shuffleWriteBytes(action: => Unit): Long =
    TestMetrics.taskMetricSum(spark)(_.shuffleWriteMetrics.bytesWritten)(action)

  private def materialize(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  test("ANF round shuffle is vertex-bounded (partial register merge engaged), not message-bounded") {
    // the WIDE sf0.1 edit graph: ~26 edges per vertex, dense enough
    // that a message-bounded shuffle would dwarf the vertex bound
    val edges = graph.GraphBuilder.partEdgesWide(spark, "/root/testdata/sf0.1")
      .localCheckpoint(true) // materialized OUTSIDE the measurement
    val nV = edges.select("src").distinct().count()
    val nE = edges.count()
    // raw per-round message stream: E rows × ~264 B (node + regs);
    // the partial-agg claim says the exchange sees ≤ V keys per map
    // partition instead
    val perRoundMsgBytes = nE * 264L
    val vertexBound = nV * 264L * spark.sparkContext.defaultParallelism
    assert(perRoundMsgBytes > 4 * vertexBound,
      s"graph too sparse for the claim to discriminate (E=$nE, V=$nV) — pick a denser input")
    val b1 = shuffleWriteBytes(materialize(graph.Anf.run(spark, edges, rounds = 1)))
    val b3 = shuffleWriteBytes(materialize(graph.Anf.run(spark, edges, rounds = 3)))
    val perRound = (b3 - b1) / 2
    assert(perRound > 0, s"vacuous: no incremental shuffle measured (b1=$b1, b3=$b3)")
    assert(perRound < 4 * vertexBound,
      s"per-round shuffle $perRound B exceeds the vertex bound ${4 * vertexBound} B " +
        s"(raw message stream would be $perRoundMsgBytes B) — partial merge not engaged?")
  }

  test("CappedCollectLong shuffles kilobytes under total skew (one group, 400k rows)") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val cap = 64
    val skewed = spark.range(400000).select(lit(1L).as("g"), $"id".as("v"))
      .repartition(4) // spread the one group over every map task
      .localCheckpoint(true) // its shuffle happens OUTSIDE the measurement
    val bytes = shuffleWriteBytes(materialize(
      skewed.groupBy($"g").agg(expr(s"graft_collect_capped(v, $cap)").as("vs"))))
    // uncapped collect_list state would be ~400k × 8 B ≈ 3.2 MB on
    // the wire; cap+1 longs per partial buffer × 4 partitions is ~2 KB
    val uncapped = 400000L * 8
    assert(bytes > 0, "vacuous: no shuffle measured")
    assert(bytes < uncapped / 10,
      s"capped collect shuffled $bytes B — more than a tenth of the uncapped $uncapped B")
  }

  test("TopKByScore shuffles kilobytes under total skew (one query, 400k candidates)") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val skewed = spark.range(400000)
      .select(lit(7L).as("q"), ($"id" % 9973).cast("double").as("score"), $"id".as("cand"))
      .repartition(4)
      .localCheckpoint(true)
    val bytes = shuffleWriteBytes(materialize(
      skewed.groupBy($"q").agg(expr("graft_top_k(score, cand, 10)").as("top"))))
    val uncapped = 400000L * 16
    assert(bytes > 0, "vacuous: no shuffle measured")
    assert(bytes < uncapped / 10,
      s"top-k shuffled $bytes B — more than a tenth of the uncapped $uncapped B")
  }
}
