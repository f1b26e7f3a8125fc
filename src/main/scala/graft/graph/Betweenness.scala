package graft.graph

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType, StructField, StructType}

/** Exact betweenness centrality (Brandes-style shortest-path
  * counting) for DIMENSION-BOUNDED graphs.
  *
  * Reference anchor: the reference's query surface is shortest-path
  * waves between node pairs (main.py:272-305); betweenness is the
  * standard centrality built from exactly those shortest paths —
  * which nodes the molecule-edit routes run through.
  *
  * Two stages with different execution homes:
  *
  *  1. The σ stage — per-root BFS distances AND shortest-path
  *     counts σ(root, node). ROUTED on a bounded probe (round-10,
  *     the Dispatch discipline): within the 2²⁰ bound the probe's
  *     collected edge list feeds an in-process integer sweep — at
  *     100 TB the analytics graph this runs on is a dimension
  *     (nations, categories); the fact tables only ever DERIVE its
  *     edges. Past the bound, [[sigmaDistributed]]'s root-tagged
  *     frontier loop computes the same rows distributed instead of
  *     throwing. [[sigmaBounded]] keeps the old hard-assert contract
  *     for callers that CLAIM boundedness.
  *
  *  2. The pair-dependency aggregation δ_st(v) = σ_sv·σ_vt / σ_st
  *     summed over all (s, t) pairs — executed IN SPARK SQL as two
  *     self-joins over the (root, node) σ table with the engine's
  *     DECIMAL(28,12) quantize-then-exact-sum contract (the same
  *     cast class the PageRank messages use), so the doubles are
  *     bit-identical to the oracle's however the sum is ordered.
  *
  * Undirected convention: the input edge set carries both
  * orientations (the engine's graph contract); the ordered-pair sum
  * counts every unordered pair twice, so the result is halved.
  */
object Betweenness {

  /** (root, node, wave, sigma): BFS wave (root = wave 1) and number
    * of distinct shortest paths from root, for every reachable pair.
    * Collect-guarded driver computation — see class doc. */
  def sigmaBounded(edges: DataFrame): DataFrame = {
    // single-sourced route bound (round-13, verdict #6)
    val limit = Quotient.probeBound(edges.sparkSession)
    val e = Quotient.probeRows(normEdges(edges), limit).getOrElse(
      throw new IllegalArgumentException(
        s"requirement failed: sigmaBounded edge set exceeds $limit rows — not dimension-bounded"))
    sigmaSweep(edges.sparkSession, e)
  }

  private def normEdges(edges: DataFrame): DataFrame =
    edges.select(col("src").cast("long"), col("dst").cast("long"))
      .filter(col("src").isNotNull && col("dst").isNotNull)

  /** The in-process σ sweep over probed edge rows. */
  private def sigmaSweep(spark: SparkSession,
                         e: Array[Row]): DataFrame = {
    import scala.collection.mutable
    import scala.jdk.CollectionConverters._
    val adj = mutable.HashMap.empty[Long, mutable.LinkedHashSet[Long]]
    e.foreach(r => adj.getOrElseUpdate(r.getLong(0), mutable.LinkedHashSet.empty) += r.getLong(1))
    val nodes = adj.keySet.toSeq.sorted
    val out = mutable.ArrayBuffer.empty[Row]
    nodes.foreach { root =>
      val wave = mutable.HashMap[Long, Long](root -> 1L)
      val sigma = mutable.HashMap[Long, Long](root -> 1L)
      var frontier = Seq(root)
      var w = 1L
      while (frontier.nonEmpty) {
        w += 1
        val next = mutable.LinkedHashSet.empty[Long]
        frontier.foreach { u =>
          adj.getOrElse(u, Nil).foreach { v =>
            // v unseen in waves < w: it joins wave w, and EVERY wave-
            // (w-1) predecessor's σ accumulates (wave is only stamped
            // after the sweep, so all same-wave discoveries land here)
            if (!wave.contains(v)) {
              next += v
              sigma.update(v, sigma.getOrElse(v, 0L) + sigma(u))
            }
          }
        }
        next.foreach(v => wave.update(v, w))
        frontier = next.toSeq
      }
      wave.foreach { case (n, wv) => out += Row(root, n, wv, sigma(n)) }
    }
    val schema = StructType(Seq(
      StructField("root", LongType), StructField("node", LongType),
      StructField("wave", LongType), StructField("sigma", LongType)))
    spark.createDataFrame(
      out.sortBy(r => (r.getLong(0), r.getLong(1))).asJava, schema)
  }

  /** DISTRIBUTED σ — the general engine behind [[run]]'s fallback
    * route (round-10: the Dispatch discipline applied to the σ stage).
    * Root-tagged frontier BFS where each newly-reached node's σ is the
    * SUM of its wave-(w−1) predecessors' σ — one co-partitioned join +
    * one partial-aggregable sum + one anti-join per wave, the [[Bfs]]
    * loop with path counting riding the aggregation. State is
    * all-pairs-sized, so the per-wave checkpoints take the KCore
    * DISK discipline (eager, previous generation freed per wave).
    * Emits the same (root, node, wave, sigma) rows as [[sigmaBounded]]
    * (FallbackRoutingSpec pins the multiset). */
  private[graph] def sigmaDistributed(edges: DataFrame): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.DISK_ONLY
    // distinct: the in-process sweep's adjacency is a SET (a parallel
    // edge contributes one path, not two) — σ must count the same
    val e = normEdges(edges).distinct().repartition(col("src"))
      .localCheckpoint(false, lvl)
    var frontier = e.select(col("src").as("root")).distinct()
      .select(col("root"), col("root").as("node"),
        lit(1L).as("wave"), lit(1L).as("sigma"))
      .localCheckpoint(true, lvl)
    var visited = frontier
    var wave = 1L
    var n = frontier.count()
    while (n > 0L) {
      wave += 1
      val next = frontier.join(e, frontier("node") === e("src"))
        .groupBy(frontier("root"), e("dst").as("node"))
        .agg(sum(frontier("sigma")).as("sigma"))
        .join(visited.select("root", "node"), Seq("root", "node"), "left_anti")
        .select(col("root"), col("node"), lit(wave).as("wave"), col("sigma"))
        .localCheckpoint(true, lvl)
      val nextVisited = visited.union(next).localCheckpoint(true, lvl)
      n = next.count()
      KTruss.freeCheckpoint(frontier)
      KTruss.freeCheckpoint(visited)
      frontier = next
      visited = nextVisited
    }
    // zero-iteration path (empty edge set): visited IS frontier —
    // freeing it would unpersist the returned checkpoint
    if (!(frontier eq visited)) KTruss.freeCheckpoint(frontier)
    // the loop-long edge checkpoint is dead once the final visited
    // generation is materialized
    KTruss.freeCheckpoint(e)
    visited
  }

  /** Per-node exact betweenness over a bidirectional edge set:
    * (node, btw) with zero-centrality nodes included. The σ stage is
    * ROUTED (round-10): within `bound`, the probe's collected edge
    * rows feed the in-process sweep (the probe IS the collect — no
    * second job); past it, [[sigmaDistributed]] runs instead of
    * throwing — an unstructured fact-sized graph gets the measured
    * distributed engine, not an exception. The pair-dependency SQL
    * stage downstream is shared by both routes. */
  def run(spark: SparkSession, edges: DataFrame,
          bound: Int = -1): DataFrame = {
    import spark.implicits._
    val sig = Quotient.probeRows(normEdges(edges),
        Quotient.resolve(bound, spark, Quotient.probeBound))
      .map(sigmaSweep(spark, _))
      .getOrElse(sigmaDistributed(edges))
      .localCheckpoint(false)
    val sv = sig.select($"root".as("s"), $"node".as("v"),
      $"wave".as("wsv"), $"sigma".as("ssv"))
    val vt = sig.select($"root".as("t"), $"node".as("v"),
      $"wave".as("wvt"), $"sigma".as("svt"))
    val st = sig.select($"root".as("s"), $"node".as("t"),
      $"wave".as("wst"), $"sigma".as("sst"))
    val tri = sv.join(vt, "v").join(st, Seq("s", "t"))
      .filter($"s" =!= $"t" && $"v" =!= $"s" && $"v" =!= $"t" &&
        ($"wsv" - 1) + ($"wvt" - 1) === ($"wst" - 1))
      .select($"v",
        (($"ssv" * $"svt").cast("double") / $"sst".cast("double"))
          .cast(DecimalType(28, 12)).as("contrib"))
    sig.select($"root".as("node")).distinct()
      .join(tri.groupBy($"v".as("node")).agg(sum($"contrib").as("c")), Seq("node"), "left")
      .select($"node",
        round(coalesce($"c", lit(0)).cast("double") / 2.0, 6).as("btw"))
  }
}
