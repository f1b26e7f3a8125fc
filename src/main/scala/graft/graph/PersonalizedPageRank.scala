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
  * Inherits PageRank's determinism contract: each message quantizes to
  * DECIMAL(28,12) before the exact, order-free per-vertex decimal sum,
  * so results are bit-identical across partitionings and engines (the
  * DuckDB oracle unrolls the same rounds). The teleport mass 0.15/|S|
  * is one IEEE division on both sides.
  *
  * Scale shape: identical to distributed PageRank — the (src, dst,
  * outdeg) message graph is derived once and persisted, each round is
  * ONE co-partitioned join + partial-aggregable decimal sum + a left
  * join back to the vertex set; ranks localCheckpoint per round to
  * truncate lineage. The rank vector stays distributed (seed sets are
  * small; the RANKED set is the whole graph).
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
    val e = edges.select("src", "dst")
    val deg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("outdeg"))
    val ed = e.join(deg, e("src") === deg("node"))
      .select(e("src"), e("dst"), col("outdeg"))
      .repartition(col("src")).persist()
    val sd = seeds.select(col("node").cast("long").as("node")).distinct()
      .localCheckpoint(false)
    val nSeeds = sd.count()
    require(nSeeds > 0, "personalized PageRank needs at least one seed")
    val base = 0.15 / nSeeds.toDouble
    val withSeed = deg.select(col("node"))
      .join(sd.withColumn("__seed", lit(1)), Seq("node"), "left")
      .select(col("node"),
        when(col("__seed").isNotNull, lit(base)).otherwise(lit(0.0)).as("teleport"))
      .localCheckpoint(false) // reused every round
    var ranks = withSeed.select(col("node"), col("teleport").as("rank"))
      .localCheckpoint(false)
    for (_ <- 1 to iters) {
      val msgs = ed.join(ranks, ed("src") === ranks("node"))
        .select(ed("dst"), (ranks("rank") / ed("outdeg")).cast(M).as("contrib"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("msg"))
      ranks = withSeed
        .join(msgs, withSeed("node") === msgs("dst"), "left")
        .select(withSeed("node"),
          (col("teleport") + lit(0.85) * coalesce(col("msg").cast("double"), lit(0.0))).as("rank"))
        .localCheckpoint(false)
    }
    // materialize while the message-graph cache is alive (see PageRank)
    val out = ranks.localCheckpoint()
    ed.unpersist()
    out
  }
}
