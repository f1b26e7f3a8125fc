package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS (hubs & authorities, Kleinberg 1999) as a fixed-iteration
  * DataFrame program over a DIRECTED edge list, L1-normalized every
  * round so scores stay in [0,1] at ANY graph size (an unnormalized
  * power iteration would overflow any fixed-precision carrier once
  * per-node degrees grow — the 100 TB failure mode).
  *
  * Determinism contract (PageRank's, applied twice per round): each
  * message is quantized to DECIMAL(28,12) BEFORE the per-vertex sum
  * (exact, order-independent), the L1 total is the exact decimal sum
  * of those per-vertex sums, and the normalized score is ONE IEEE
  * division of two deterministic decimal→double casts:
  *
  *   a_i(v) = dbl(Σ_{u→v} Dec(h_{i−1}(u))) / dbl(Σ_v Σ_{u→v} Dec(h_{i−1}(u)))
  *   h_i(u) = dbl(Σ_{u→v} Dec(a_i(v)))    / dbl(Σ_u Σ_{u→v} Dec(a_i(v)))
  *
  * The DuckDB oracle unrolls the same K rounds and matches by hash.
  *
  * Scale shape: two key-partitioned shuffles per round (a-sum on dst,
  * h-sum on src) plus two ONE-ROW total broadcasts; the edge list is
  * computed once and persisted; scores are localCheckpoint-ed per
  * round to truncate lineage. Nodes outside the iteration's support
  * (sinks for hub, sources for authority) re-enter at the end with
  * exact-zero scores via the node-set left join.
  */
object Hits {
  private val M = org.apache.spark.sql.types.DecimalType(28, 12)
  private val S = org.apache.spark.sql.types.DecimalType(38, 12)

  /** @param edges directed (src, dst); duplicates allowed (multi-edges
    *              count multiply, same as the oracle).
    * @param iters full hub+authority update rounds (K).
    * @return (node, hub, authority) — every node appearing as src or
    *         dst; sinks have hub 0.0, sources authority 0.0. */
  def run(edges: DataFrame, iters: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst")).persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(eager = false)
    // h lives only on potential hubs (sources), a only on potential
    // authorities (sinks) during the loop — the zero rows would never
    // contribute a message, so they join back once at the end.
    var h = e.select(col("src").as("node")).distinct()
      .select(col("node"), lit(1.0).as("h"))
      .localCheckpoint(eager = false)
    var a: DataFrame = null
    for (_ <- 1 to iters) {
      val aRaw = e.join(h, e("src") === h("node"))
        .select(e("dst"), col("h").cast(M).as("c"))
        .groupBy(col("dst").as("anode")).agg(sum(col("c")).cast(S).as("araw"))
        .localCheckpoint(eager = false)
      val aTot = aRaw.agg(sum(col("araw")).cast(S).as("atot"))
      a = aRaw.crossJoin(broadcast(aTot))
        .select(col("anode").as("node"),
          (col("araw").cast("double") / col("atot").cast("double")).as("a"))
        .localCheckpoint(eager = false)
      val hRaw = e.join(a, e("dst") === a("node"))
        .select(e("src"), col("a").cast(M).as("c"))
        .groupBy(col("src").as("hnode")).agg(sum(col("c")).cast(S).as("hraw"))
        .localCheckpoint(eager = false)
      val hTot = hRaw.agg(sum(col("hraw")).cast(S).as("htot"))
      h = hRaw.crossJoin(broadcast(hTot))
        .select(col("hnode").as("node"),
          (col("hraw").cast("double") / col("htot").cast("double")).as("h"))
        .localCheckpoint(eager = false)
    }
    val out = nodes
      .join(h, Seq("node"), "left")
      .join(a, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("h"), lit(0.0)).as("hub"),
        coalesce(col("a"), lit(0.0)).as("authority"))
      .localCheckpoint()
    e.unpersist()
    out
  }
}
