package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Fixed-iteration PageRank as an iterative DataFrame plan
  * (rank₀ = 1.0; rank = 0.15 + 0.85 · Σ rank_u / outdeg_u — GraphX
  * staticPageRank's update rule).
  *
  * Determinism contract: each message rank_u/outdeg_u is quantized to
  * DECIMAL(28,12) BEFORE the per-vertex sum. Decimal addition is exact
  * and order-independent, so the result is bit-identical across
  * partitionings and across engines — the DuckDB oracle unrolls the
  * same iterations and matches by hash. A raw double sum would depend
  * on partial-aggregation order and could flip a rounded digit.
  *
  * Scale shape: one shuffle per iteration (the groupBy(dst) message
  * sum); edges+outdeg are computed once and persisted; ranks are
  * localCheckpoint-ed per iteration to truncate lineage.
  */
object PageRank {
  private val M = DecimalType(28, 12)

  /** @param edges directed (src, dst); every node must appear as a src
    *              (true for bidirectional graphs).
    * @param bidirectional caller asserts every node also appears as a
    *              dst (symmetric edge set). Then every node receives
    *              ≥ 1 message per iteration, so the dangling-node left
    *              join is provably a no-op and is skipped — one join
    *              fewer per iteration, same result.
    * @param smallRanks caller asserts the NODE set is dimension-
    *              bounded (does not grow with fact data — e.g. the
    *              nation trade graph). The rank vector then joins the
    *              edge table broadcast, so an iteration is ONE shuffle
    *              (the message groupBy), not three. Leave false for
    *              graphs whose node count scales with the data.
    * @return (node, rank) with rank as a raw double.
    */
  def run(edges: DataFrame, iters: Int, bidirectional: Boolean = false,
          smallRanks: Boolean = false): DataFrame = {
    val e = edges.select("src", "dst")
    val deg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("outdeg"))
    val ed = e.join(deg, e("src") === deg("node"))
      .select(e("src"), e("dst"), col("outdeg"))
      .repartition(col("src")).persist()
    var ranks = deg.select(col("node"), lit(1.0).as("rank"))
      .localCheckpoint(eager = false)
    for (i <- 1 to iters) {
      val r = if (smallRanks) broadcast(ranks) else ranks
      val msgs = ed.join(r, ed("src") === r("node"))
        .select(ed("dst"), (r("rank") / ed("outdeg")).cast(M).as("contrib"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("msg"))
      val next =
        if (bidirectional)
          msgs.select(col("dst").as("node"),
            (lit(0.15) + lit(0.85) * col("msg").cast("double")).as("rank"))
        else ranks.select(col("node"))
          .join(msgs, col("node") === msgs("dst"), "left")
          .select(col("node"),
            (lit(0.15) + lit(0.85) * coalesce(col("msg").cast("double"), lit(0.0))).as("rank"))
      // Non-eager checkpoint: severs the plan every iteration (so the
      // optimizer never sees an unrolled 10-join tree) but defers
      // block materialization into the next iteration's job instead
      // of paying one dedicated job per iteration.
      ranks = next.localCheckpoint(eager = false)
    }
    ed.unpersist()
    ranks
  }
}
