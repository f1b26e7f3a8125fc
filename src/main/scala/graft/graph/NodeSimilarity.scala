package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * of degree 10⁶ lands its 10¹² wedges in ONE task. Instead:
  *
  *   1. ONE shuffle builds each node's sorted neighbor array
  *      (adjacency is O(deg) per node — the accepted baseline for any
  *      neighborhood analytics; the d² *pair* work is what must never
  *      concentrate).
  *   2. Normal-degree middles (deg ≤ τ) enumerate their C(deg,2)
  *      neighbor pairs map-side through CHAINED GENERATORS —
  *      posexplode(nbrs) then explode(slice(nbrs, i+2, …)) — feeding
  *      straight into a partial-aggregable count: the wedge stream
  *      collapses to distinct (a,b) pairs per partition before it
  *      ever shuffles. Generators and slice() are codegen'd; the
  *      equivalent higher-order-function formulation
  *      (flatten(transform(…, lambda))) falls back to interpreted
  *      per-row eval and measured 3× slower on the same data.
  *   3. Hot middles (deg > τ) slice their sorted neighbor array into
  *      ⌈deg/τ⌉ positional blocks of ≤ τ. Within-block pairs explode
  *      as in (2); cross-block pairs come from a block self-join
  *      (bi < bj) re-hashed across the cluster on (mid, bi, bj), so a
  *      celebrity's d² work spreads over ⌈d/τ⌉² bounded tasks of ≤ τ²
  *      pairs each. Positional slicing of a SORTED array guarantees
  *      every x in block bi precedes every y in block bj>bi, so
  *      emitted pairs are already in canonical (a < b) order and each
  *      unordered pair appears exactly once.
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
    // Adjacency: the single edge shuffle. Reused by both degree tiers
    // and the final degree lookups; localCheckpoint (lazy) shares the
    // materialization without a never-unpersisted cache entry — the
    // blocks are reclaimed by the ContextCleaner once the plan is GC'd.
    val adj = e.groupBy($"src")
      .agg(sort_array(collect_list($"dst")).as("nbrs"))
      .withColumn("deg", size($"nbrs"))
      .localCheckpoint(false)
    val deg = adj.select($"src".as("node"), $"deg".cast("long").as("deg"))

    val cold = pairsOf(adj.filter($"deg" <= tau), "nbrs")

    // Hot tier: positional blocks of ≤ τ neighbors. The per-node block
    // list is tiny (⌈deg/τ⌉ entries), so the interpreted transform
    // lambda here is off the hot path by construction.
    val blocks = adj.filter($"deg" > tau)
      .select($"src".as("mid"), posexplode(expr(
        s"""transform(sequence(0, cast(ceil(deg / cast($tau as double)) as int) - 1),
           |  b -> slice(nbrs, b * $tau + 1, $tau))""".stripMargin)).as(Seq("blk", "part")))
    // within-block pairs need no join — just spread one hot middle's
    // blocks across tasks before the quadratic explode
    val hotWithin = pairsOf(blocks.repartition($"mid", $"blk"), "part")
    // cross-block pairs: block self-join (bi < bj), re-hashed on
    // (mid, bi, bj) so a celebrity's ⌈d/τ⌉² block pairs spread across
    // the cluster instead of staying in the join's single mid partition
    val hotCross = blocks.as("x")
      .join(blocks.as("y"),
        col("x.mid") === col("y.mid") && col("x.blk") < col("y.blk"))
      .select(col("x.mid").as("mid"), col("x.blk").as("bx"), col("y.blk").as("by"),
        col("x.part").as("nx"), col("y.part").as("ny"))
      .repartition($"mid", $"bx", $"by")
      .select($"ny", explode($"nx").as("a"))
      .select($"a", explode($"ny").as("b"))

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
