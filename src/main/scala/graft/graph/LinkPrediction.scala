package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Link prediction by the Resource-Allocation index (Zhou/Lü/Zhang
  * 2009 — the Adamic–Adar family: score(u,v) = Σ_{w ∈ N(u)∩N(v)}
  * 1/deg(w)). RA's 1/deg replaces AA's 1/ln(deg) because a
  * transcendental ln has no cross-engine bit contract while ONE IEEE
  * division does — same family, same ranking intent, engine-exact.
  *
  * Scale shape: wedge enumeration uses NodeSimilarity's
  * POSITIONAL-BLOCK decomposition (not the naive Σdeg² edge
  * self-join): neighbors of each witness w are ranked into blocks of
  * ≤ τ, single-block witnesses stream their C(deg,2) pairs map-side
  * through chained generators, and a celebrity witness's d² wedges
  * spread over ⌈d/τ⌉² bounded tasks — with deg(w) riding each block
  * row so the per-wedge 1/deg(w) contribution needs no extra join.
  * The known-edge exclusion is a left-anti equi-join AFTER the pair
  * aggregation (pair-sized, not wedge-sized), per-wedge contributions
  * are DECIMAL(28,12)-quantized before the exact order-independent
  * sum, and the global top-k is Spark's TakeOrderedAndProject
  * (map-side k per partition, never a full sort); the rank stamp then
  * windows over only those k rows.
  */
object LinkPrediction {
  import Quotient.q12

  /** QUOTIENT fast path for the widened (±1, ±2) edit rule: the RA
    * score of a pair (u, v) is a pure function of their (brand, size)
    * CLASSES — every witness class contributes size(w)·Dec(1/deg(w)),
    * deg(w) itself a class function — so per-pair scores come from an
    * in-process sweep of the dimension-bounded class graph, and only
    * the top-tier candidate class-pairs ever materialize part pairs.
    * This removes the fact-level plan's scale defect: class sizes
    * grow with SF, so the wedge join's Σdeg² work grows
    * QUADRATICALLY with the data, while the quotient's work is
    * constant in SF (classes are domain-bounded) plus one
    * TakeOrdered over the ≥topK candidate pairs. Arithmetic is the
    * fact plan's exactly: summing size(w) copies of one quantized
    * decimal is integer multiplication; the BigDecimal sum equals
    * Spark's exact DECIMAL(38,12) accumulation digit-for-digit.
    *
    * @param parts (p_partkey, p_brand, p_size)-shaped DataFrame.
    * @return same schema/semantics as [[resourceAllocation]] on the
    *         widened symmetric edit graph of `parts`. */
  def resourceAllocationQuotient(s: org.apache.spark.sql.SparkSession,
      parts: DataFrame, topK: Int): DataFrame =
    quotientWithClasses(s, Quotient.collectClasses(parts
      .groupBy(col("p_brand").as("brand"), col("p_size").cast("long").as("size"))
      .agg(count(lit(1)).as("cnt"))), parts, topK)

  /** The class sweep + candidate-tier stamp over a precomputed class
    * map — factored out so [[Dispatch]] can reuse the probe's class
    * collect instead of aggregating twice. */
  private[graph] def quotientWithClasses(s: org.apache.spark.sql.SparkSession,
      sizes: Map[(String, Long), Long], parts: DataFrame, topK: Int): DataFrame = {
    import s.implicits._
    type C = (String, Long)
    def neighbors(c: C): Seq[C] = {
      val (b, sz) = c
      Seq(sz - 2, sz - 1, sz + 1, sz + 2).map(x => (b, x)).filter(sizes.contains)
    }
    val deg: Map[C, Long] = sizes.keys.map(c => c -> neighbors(c).map(sizes).sum).toMap
    def adjacent(a: C, b: C): Boolean =
      a._1 == b._1 && { val dd = math.abs(a._2 - b._2); dd == 1 || dd == 2 }
    // accumulate per unordered candidate class pair {ca, cb} (ca ≤ cb)
    val acc = scala.collection.mutable.Map.empty[(C, C), (BigDecimal, Long)]
    implicit val cOrd: Ordering[C] = Ordering.Tuple2(Ordering.String, Ordering.Long)
    for {
      w <- sizes.keys.toSeq
      ns = neighbors(w)
      i <- ns.indices
      j <- i until ns.length // i == j: pairs WITHIN one endpoint class
      ca = cOrd.min(ns(i), ns(j)); cb = cOrd.max(ns(i), ns(j))
      if !adjacent(ca, cb)
      if ca != cb || sizes(ca) >= 2
    } {
      val contrib = q12(1.0 / deg(w).toDouble) * BigDecimal(sizes(w))
      val (sc, nc) = acc.getOrElse((ca, cb), (BigDecimal(0), 0L))
      acc((ca, cb)) = (sc + contrib, nc + sizes(w))
    }
    val scored = acc.toSeq.map { case ((ca, cb), (sc, nc)) =>
      val nPairs = if (ca == cb) sizes(ca) * (sizes(ca) - 1) / 2 else sizes(ca) * sizes(cb)
      (ca, cb, sc.doubleValue, nc, nPairs)
    }.sortBy { case (_, _, sc, _, _) => -sc }
    // candidate tiers: take class pairs in score order until the
    // cumulative pair count covers topK, then extend through ties
    var cum = 0L; var cutoff = Double.NegativeInfinity
    val keep = scala.collection.mutable.ArrayBuffer.empty[(C, C, Double, Long, Long)]
    for (t <- scored if cum < topK || t._3 == cutoff) {
      keep += t; cum += t._5; cutoff = t._3
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("rank", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("u", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n_common", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("score", org.apache.spark.sql.types.DoubleType)))
    if (keep.isEmpty)
      return s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    // both orientations for cross-class pairs so u < v lands in one
    val cand = keep.toSeq.flatMap { case (ca, cb, sc, nc, _) =>
      if (ca == cb) Seq((ca._1, ca._2, cb._1, cb._2, nc, sc))
      else Seq((ca._1, ca._2, cb._1, cb._2, nc, sc), (cb._1, cb._2, ca._1, ca._2, nc, sc))
    }
    val candDF = s.createDataFrame(cand)
      .toDF("ba", "sa", "bb", "sb", "n_common", "score")
    val pa = parts.select(col("p_partkey").cast("long").as("u"),
      col("p_brand").as("ba"), col("p_size").cast("long").as("sa"))
    val pb = parts.select(col("p_partkey").cast("long").as("v"),
      col("p_brand").as("bb"), col("p_size").cast("long").as("sb"))
    pa.join(broadcast(candDF), Seq("ba", "sa"))
      .join(pb, Seq("bb", "sb"))
      .filter(col("u") < col("v"))
      .select(col("u"), col("v"), col("n_common"), col("score"))
      .orderBy(col("score").desc, col("u").asc, col("v").asc).limit(topK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("u").asc, col("v").asc)).cast("long"))
      .select(col("rank"), col("u"), col("v"), col("n_common"), col("score"))
  }

  /** All witnessed pairs (u, v) with u's sort rank before v's within
    * one block row, each tagged with the witness's degree — the RA
    * variant of NodeSimilarity's chained-generator pair stream (the
    * sorted positional blocks guarantee u ≤ v; u = v ties from
    * parallel edges are filtered by the caller). */
  private def wedgePairs(df: DataFrame): DataFrame =
    df.select(col("part"), col("degw"), posexplode(col("part")).as(Seq("i", "u")))
      .select(col("u"), explode(expr("slice(part, i + 2, size(part))")).as("v"),
        col("degw"))

  /** @param edges SYMMETRIC (src, dst) edge list (both directions
    *              present), no self-loops.
    * @param topK  rows to return.
    * @param tau   positional-block cap: every aggregation buffer and
    *              every generator input holds ≤ τ neighbor ids, and a
    *              degree-d witness's d² wedges spread over ⌈d/τ⌉²
    *              tasks. Output is τ-invariant (spec-pinned).
    * @return (rank, u, v, n_common, score) for the topK non-adjacent
    *         pairs u < v by (score DESC, u ASC, v ASC). */
  def resourceAllocation(edges: DataFrame, topK: Int, tau: Int = 256): DataFrame = {
    require(tau >= 2, s"block cap tau must be >= 2, got $tau")
    val e = edges.select(col("src"), col("dst"))
    // Positional blocks, exactly NodeSimilarity.jaccard's shape: ONE
    // shuffle on the witness vertex; rank and degree ride the same
    // exchange; the bounded per-(mid, blk) collect reuses the
    // partitioning. deg(w) is stored on the block row — the wedge
    // stream never joins a degree table.
    val byMid = Window.partitionBy(col("src")).orderBy(col("dst"))
    val blocks = e
      .withColumn("rank", row_number().over(byMid) - 1)
      .withColumn("degw", count(lit(1)).over(Window.partitionBy(col("src"))))
      .groupBy(col("src").as("mid"), expr(s"rank div $tau").as("blk"))
      .agg(sort_array(collect_list(col("dst"))).as("part"),
        first(col("degw")).as("degw"))
      .localCheckpoint(false)

    // single-block witnesses: all pairs are within the one block
    val cold = wedgePairs(blocks.filter(col("degw") <= tau))

    val hot = blocks.filter(col("degw") > tau)
    // within-block pairs, spread across tasks before the explode
    val hotWithin = wedgePairs(hot.repartition(col("mid"), col("blk")))
    // cross-block pairs: block self-join (bi < bj), re-hashed on
    // (mid, bi, bj) so one celebrity's block pairs spread cluster-wide
    val hotCross = hot.as("x")
      .join(hot.as("y"),
        col("x.mid") === col("y.mid") && col("x.blk") < col("y.blk"))
      .select(col("x.mid").as("mid"), col("x.blk").as("bx"), col("y.blk").as("by"),
        col("x.part").as("nx"), col("y.part").as("ny"), col("x.degw").as("degw"))
      .repartition(col("mid"), col("bx"), col("by"))
      .select(col("ny"), col("degw"), explode(col("nx")).as("u"))
      .select(col("u"), explode(col("ny")).as("v"), col("degw"))

    val canon = e.filter(col("src") < col("dst"))
      .select(col("src").as("u"), col("dst").as("v"))
    // Two-level aggregation: the wedge stream collapses under cheap
    // LONG counting on (u, v, degw) first, and the decimal arithmetic
    // (the quantized 1/deg unit and its accumulation — BigDecimal-
    // backed at this precision) runs once per distinct (pair, witness
    // degree), not once per wedge — measured 153 s → the count-only
    // jaccard twin's territory at the 4.7M-edge rung. Exactly equal:
    // cnt × q12(1/deg) in DECIMAL(33,12) is exact (unit ≤ 1.0 at
    // scale 12, cnt < 1e19), and decimal addition is order-free.
    val unit = (lit(1.0) / col("degw").cast("double"))
      .cast(org.apache.spark.sql.types.DecimalType(13, 12))
    cold.union(hotWithin).union(hotCross)
      .filter(col("u") =!= col("v")) // parallel-edge guard: the wedge join never paired an edge with itself
      .groupBy(col("u"), col("v"), col("degw"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("u"), col("v"))
      .agg(sum(col("cnt")).as("n_common"),
        sum(col("cnt").cast(org.apache.spark.sql.types.DecimalType(19, 0)) * unit)
          .as("sc"))
      .join(canon, Seq("u", "v"), "left_anti")
      .select(col("u"), col("v"), col("n_common"),
        col("sc").cast("double").as("score"))
      .orderBy(col("score").desc, col("u").asc, col("v").asc).limit(topK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("u").asc, col("v").asc)).cast("long"))
      .select(col("rank"), col("u"), col("v"), col("n_common"), col("score"))
  }
}
