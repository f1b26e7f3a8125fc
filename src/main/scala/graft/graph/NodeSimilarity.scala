package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Node-pair Jaccard similarity over neighbor sets (SURVEY §2 A13) —
  * the graph-db "similar entities" primitive (link prediction, entity
  * resolution). Semantics follow the reference's pairwise
  * set-similarity (mcs.py:285-336) lifted onto graph neighborhoods:
  * for every node pair with at least one common neighbor, emit
  * |N(a) ∩ N(b)| and |N(a) ∩ N(b)| / |N(a) ∪ N(b)|.
  *
  * Exact wedge counting WITHOUT the naive self-join. The edge
  * self-join on the middle vertex materializes Σ deg(m)² rows through
  * join machinery, and — fatally at scale — a single celebrity node
  * of degree 10⁶ lands its 10¹² wedges in ONE task. Equally fatally,
  * a per-node `collect_list` adjacency builds a degree-sized
  * aggregation buffer under one key (~800 MB unspillable for a
  * degree-10⁸ node). Neither shape appears here:
  *
  *   1. Neighbors are ranked per middle vertex by a row_number window
  *      (sort-based — spills to disk, no per-key aggregation state)
  *      and grouped into POSITIONAL BLOCKS of ≤ τ by rank DIV τ: the
  *      only collected arrays are per-(mid, block), bounded at τ
  *      elements whatever the degree. Block b holds sort ranks
  *      [bτ, (b+1)τ) of the middle's neighbor list, so block contents
  *      equal the contiguous slices of the globally sorted adjacency
  *      array the previous formulation materialized — without ever
  *      materializing it.
  *   2. Single-block middles (deg ≤ τ) enumerate their C(deg,2)
  *      neighbor pairs map-side through CHAINED GENERATORS —
  *      posexplode(part) then explode(slice(part, i+2, …)) — feeding
  *      straight into a partial-aggregable count: the wedge stream
  *      collapses to distinct (a,b) pairs per partition before it
  *      ever shuffles. Generators and slice() are codegen'd; the
  *      equivalent higher-order-function formulation
  *      (flatten(transform(…, lambda))) falls back to interpreted
  *      per-row eval and measured 3× slower on the same data.
  *   3. Hot middles (deg > τ) emit within-block pairs as in (2) after
  *      a (mid, blk) repartition spreads one celebrity's blocks over
  *      tasks, and cross-block pairs from a block self-join (bi < bj)
  *      re-hashed on (mid, bi, bj): the d² work spreads over ⌈d/τ⌉²
  *      bounded tasks of ≤ τ² pairs each. Positional blocks of the
  *      sorted rank order guarantee every x in block bi precedes
  *      every y in block bj>bi, so emitted pairs are already in
  *      canonical (a ≤ b) order and each unordered pair appears
  *      exactly once (a = b ties from parallel edges are filtered,
  *      exactly like the wedge join never pairing an edge with
  *      itself).
  *
  * Equivalence of the two paths (and of the union to the plain wedge
  * join) is spec-verified on a synthetic hot-hub graph
  * (NodeSimilaritySpec).
  *
  * Input contract: `edges(src, dst)` bidirectional and self-loop-free,
  * as produced by [[GraphBuilder]]; duplicate (src,dst) rows count as
  * parallel edges, exactly like the wedge join they replace.
  */
object NodeSimilarity {

  /** All ordered pairs (arr(i), arr(j)) with i < j from one sorted
    * array column, as two long columns — two chained codegen'd
    * generators, no lambda, no struct allocation. */
  private def pairsOf(df: DataFrame, arr: String): DataFrame =
    df.select(col(arr), posexplode(col(arr)).as(Seq("i", "a")))
      .select(col("a"), explode(expr(s"slice($arr, i + 2, size($arr))")).as("b"))

  def jaccard(s: SparkSession, edges: DataFrame, tau: Int = 256): DataFrame = {
    import s.implicits._
    require(tau >= 2, s"block cap tau must be >= 2, got $tau")
    val e = edges.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
    // Positional blocks: ONE shuffle on the middle vertex; rank and
    // degree ride the same exchange (row_number needs the sort, count
    // reuses the partitioning), then the bounded per-(mid, blk)
    // collect runs on the SAME partitioning — no second exchange.
    // Every aggregation buffer holds ≤ τ neighbor ids.
    val byMid = Window.partitionBy($"src").orderBy($"dst")
    val blocks = e
      .withColumn("rank", row_number().over(byMid) - 1)
      .withColumn("deg", count(lit(1)).over(Window.partitionBy($"src")))
      .groupBy($"src".as("mid"), expr(s"rank div $tau").as("blk"))
      .agg(sort_array(collect_list($"dst")).as("part"),
        first($"deg").as("deg"))
      .localCheckpoint(false)

    // single-block middles: all pairs are within the one block
    val cold = pairsOf(blocks.filter($"deg" <= tau), "part")

    val hot = blocks.filter($"deg" > tau)
    // within-block pairs need no join — just spread one hot middle's
    // blocks across tasks before the quadratic explode
    val hotWithin = pairsOf(hot.repartition($"mid", $"blk"), "part")
    // cross-block pairs: block self-join (bi < bj), re-hashed on
    // (mid, bi, bj) so a celebrity's ⌈d/τ⌉² block pairs spread across
    // the cluster instead of staying in the join's single mid partition
    val hotCross = hot.as("x")
      .join(hot.as("y"),
        col("x.mid") === col("y.mid") && col("x.blk") < col("y.blk"))
      .select(col("x.mid").as("mid"), col("x.blk").as("bx"), col("y.blk").as("by"),
        col("x.part").as("nx"), col("y.part").as("ny"))
      .repartition($"mid", $"bx", $"by")
      .select($"ny", explode($"nx").as("a"))
      .select($"a", explode($"ny").as("b"))

    // vertex-sized degree table: partial-aggregable, no buffers
    val deg = e.groupBy($"src".as("node")).agg(count(lit(1)).as("deg"))

    val counts = cold.union(hotWithin).union(hotCross)
      .filter($"a" =!= $"b") // parallel-edge guard: wedge join never paired an edge with itself
      .groupBy($"a", $"b")
      .agg(count(lit(1)).as("n_common"))
    counts
      .join(deg.select($"node".as("a"), $"deg".as("da")), "a")
      .join(deg.select($"node".as("b"), $"deg".as("db")), "b")
      .withColumn("jaccard",
        $"n_common".cast("double") / ($"da" + $"db" - $"n_common").cast("double"))
      .select($"a".as("node_a"), $"b".as("node_b"), $"n_common", $"jaccard")
  }
}
