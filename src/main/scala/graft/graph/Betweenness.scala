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
  *  1. `sigmaBounded` — per-root BFS distances AND shortest-path
  *     counts σ(root, node). Integer arithmetic, computed on the
  *     driver over a collect-guarded edge list (the same
  *     dim-bounded contract and 2²⁰ guard as [[Bfs.bfsBounded]]:
  *     a fact-sized graph is refused, not collected). At 100 TB the
  *     analytics graph this runs on is a dimension (nations,
  *     categories); the fact tables only ever DERIVE its edges.
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
    import scala.collection.mutable
    import scala.jdk.CollectionConverters._
    val spark = edges.sparkSession
    val limit = 1 << 20
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .limit(limit + 1).collect()
    require(e.length <= limit,
      s"sigmaBounded edge set exceeds $limit rows — not dimension-bounded")
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

  /** Per-node exact betweenness over a bidirectional dim-bounded
    * edge set: (node, btw) with zero-centrality nodes included. */
  def run(spark: SparkSession, edges: DataFrame): DataFrame = {
    import spark.implicits._
    val sig = sigmaBounded(edges).localCheckpoint(false)
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
