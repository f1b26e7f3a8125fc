package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Fixed-iteration PERSONALIZED PageRank: random walk with restart to
  * a seed set — r(v) = (1−α)·p(v) + α·Σ_{u→v} r(u)/outdeg(u), where
  * the teleport vector p is uniform over the seeds (1/|S|) and zero
  * elsewhere (α = 0.85, the [[PageRank]] damping). The relevance /
  * recommendation primitive: "rank everything by proximity to THESE
  * entities" — nodes unreachable from the seed set get rank exactly 0.
  *
  * Determinism contract (mirrored by the unrolled DuckDB oracle): the
  * update is computed as r(v) = α · Σ_dec(contribs), where the
  * per-edge contributions r(u)/outdeg(u) AND a static per-node
  * teleport row p(v)/α each quantize to DECIMAL(28,12) before the
  * exact, order-free decimal sum — algebraically identical to
  * (1−α)p + αΣ, and it lets the teleport ride the SAME aggregation as
  * the messages: each round is one co-partitioned join + one
  * partial-aggregable decimal sum, nothing else. A separate
  * teleport join per round cost a full extra stage chain.
  *
  * Scale shape: the (src, dst, outdeg) message graph is derived once,
  * cached partitioned-and-sorted on src (so the per-round sort-merge
  * join neither exchanges nor re-sorts the edge side); the rank
  * vector exits each round hash-partitioned on the vertex key, so the
  * next round's join is again exchange-free; localCheckpoint per
  * round truncates lineage. The rank vector stays distributed (seed
  * sets are small; the RANKED set is the whole graph).
  *
  * Node domain: nodes appearing as an edge source (every node of a
  * bidirectional graph). Seeds outside the graph still divide the
  * teleport mass but receive no rank row — callers wanting them must
  * union isolated vertices in.
  */
object PersonalizedPageRank {
  private val M = DecimalType(28, 12)

  /** @param seeds single column "node"; deduplicated here. */
  def run(s: SparkSession, edges: DataFrame, seeds: DataFrame, iters: Int): DataFrame = {
    // The SLIM 2-column edge list is the only big table, checkpointed
    // once hash-partitioned on src. outdeg does NOT ride the edges
    // (that tripled the cached bytes and forced a second edge-wide
    // materialization) — it rides the VERTEX-sized rank vector and is
    // re-derived each round by the same aggregation that sums the
    // messages (max over the teleport rows, which carry it).
    val e = edges.select(col("src"), col("dst"))
      .repartition(col("src")).localCheckpoint(false)
    val deg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("outdeg"))
    val sd = seeds.select(col("node").cast("long").as("node")).distinct()
      .localCheckpoint(false)
    val nSeeds = sd.count()
    require(nSeeds > 0, "personalized PageRank needs at least one seed")
    val base = 0.15 / nSeeds.toDouble
    val vstate = deg
      .join(sd.withColumn("__seed", lit(1)), Seq("node"), "left")
      .select(col("node"), col("outdeg"),
        when(col("__seed").isNotNull, lit(base)).otherwise(lit(0.0)).as("teleport"))
      .repartition(col("node"))
      .localCheckpoint(false)
    // static teleport contribution rows (p(v)/α, quantized like any
    // other contribution), carrying each node's outdeg through the
    // round aggregation
    val tpRows = vstate.select(col("node").as("dst"),
        (col("teleport") / lit(0.85)).cast(M).as("contrib"), col("outdeg"))
      .localCheckpoint(false)
    var ranks = vstate.select(col("node"), col("outdeg"), col("teleport").as("rank"))
      .localCheckpoint(false)
    for (_ <- 1 to iters) {
      // shuffle_hash: build the vertex-sized side, STREAM the edges —
      // no per-round sort of the edge table (sort-merge re-sorted it
      // every round); both sides exit hash-partitioned on the join
      // key (checkpoint preserves partitioning), so there is no
      // exchange either. The single shuffle per round is the message
      // aggregation, and the union makes it compute teleport + rank
      // + outdeg in one pass.
      ranks = e.join(ranks.hint("shuffle_hash"), e("src") === ranks("node"))
        .select(e("dst"), (ranks("rank") / ranks("outdeg")).cast(M).as("contrib"),
          lit(null).cast("long").as("outdeg"))
        .union(tpRows)
        .groupBy(col("dst"))
        .agg(sum(col("contrib")).as("ms"), max(col("outdeg")).as("outdeg"))
        .select(col("dst").as("node"), col("outdeg"),
          (lit(0.85) * col("ms").cast("double")).as("rank"))
        .localCheckpoint(false)
    }
    ranks.select(col("node"), col("rank")).localCheckpoint()
  }
}
