package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Automatic quotient dispatch (round-9 #1): ONE cheap bounded
  * class-count probe routes each class-structured graph operator to
  * its quotient fast path (in-process sweep of the dimension-bounded
  * class graph + broadcast stamp) or to the general fact-level engine
  * over the materialized blow-up edges — per call, as ENGINE
  * behavior, not per-benchmark wiring.
  *
  * Before this layer the seven quotient keys hard-wired their fast
  * path and [[Quotient.collectClasses]] THREW past MAX_CLASSES: an
  * unstructured graph (every node its own class) did not get a slower
  * answer, it got an exception. Now the bound is a routing decision:
  *
  *   - probe: one partial-aggregable `(brand, size)` groupBy count
  *     with the limit INSIDE the collect (≤ bound + 1 rows ever reach
  *     the driver) — fact-linear, map-side combinable, one job;
  *   - within the bound, the collected class map feeds the quotient
  *     path directly (the probe IS the quotient's class collect — no
  *     second aggregation for ktruss/hits/ra/anf/jaccard, which
  *     consume the plain map; MIS's per-round undecided collect and
  *     PPR's seed-refined classes genuinely cannot reuse it, so for
  *     those two the probe is the routing cost alone);
  *   - past the bound, the general engine runs over
  *     [[GraphBuilder.blowupEdges]] of the same vertex table — the
  *     same edit rule materialized as equi-joins, so the fallback is
  *     the measured distributed engine, not a failure.
  *
  * Both routes are bit-identical on any dimension-bounded blow-up
  * (QuotientPropertySpec pins each pair; DispatchSpec pins the
  * ROUTING: an unstructured graph past an injected bound falls back
  * and still answers, and both routes agree wherever both run).
  *
  * Vertex-table contract: `(node LONG, brand STRING, size LONG)` —
  * plus `is_seed BOOLEAN` for [[ppr]]. The per-operator edit rules
  * match the shipped derived graphs: wide symmetric (±1, ±2) for
  * MIS / k-truss / RA / node-Jaccard, narrow symmetric (±1) for
  * PPR / ANF, directed size-up (+1) for HITS.
  */
object Dispatch {

  /** The probe: Some(class map) when the `(brand, size)` domain of
    * `parts` is within `bound`, None past it. One bounded collect,
    * shared guard discipline with [[Quotient.collectClasses]].
    *
    * The default (bound = −1) and the cap both resolve from
    * [[Quotient.maxClasses]] — conf-tunable via
    * `spark.graft.quotient.maxClasses`, default unchanged at
    * [[Quotient.MAX_CLASSES]] (round-11, verdict #8). The cap exists
    * because the quotient engines re-guard their own internal
    * collects at the same limit, so routing a larger class graph to
    * them would trade the documented fall-back for their throw;
    * clamping keeps the contract — ANY bound routes, never raises —
    * at the cost of a larger-than-cap request falling back earlier
    * than asked. */
  def probe(parts: DataFrame,
            bound: Int = -1): Option[Map[(String, Long), Long]] = {
    val max = Quotient.maxClasses(parts.sparkSession)
    Quotient.probeClasses(
      parts.groupBy(col("brand"), col("size").cast("long").as("size"))
        .agg(count(lit(1)).as("cnt")),
      math.min(Quotient.resolve(bound, parts.sparkSession, Quotient.maxClasses), max))
  }

  /** The shipped part-table vertex set in the dispatch contract's
    * column shape. */
  def partVertices(s: SparkSession, sfDir: String): DataFrame =
    graft.Tables.part(s, sfDir)
      .select(col("p_partkey").cast("long").as("node"),
        col("p_brand").as("brand"), col("p_size").cast("long").as("size"))

  /** A28 Luby MIS over the wide (±1, ±2) blow-up of `parts`. */
  def mis(s: SparkSession, parts: DataFrame, maxIter: Int = 25,
          bound: Int = -1): DataFrame =
    probe(parts, bound) match {
      case Some(_) => Mis.quotientBlowup(s, parts, maxIter)
      case None => Mis.run(s, parts.select(col("node").as("id")),
        GraphBuilder.blowupEdges(parts, Seq(1L, 2L), symmetric = true), maxIter)
    }

  /** A26 k-truss over the wide (±1, ±2) blow-up of `parts`. */
  def ktruss(s: SparkSession, parts: DataFrame, k: Int,
             bound: Int = -1): DataFrame =
    probe(parts, bound) match {
      case Some(classes) => KTruss.quotientBlowup(s, classes, parts, k)
      case None => KTruss.run(s,
        GraphBuilder.blowupEdges(parts, Seq(1L, 2L), symmetric = true), k)
    }

  /** A30 HITS over the DIRECTED size-up (+1) blow-up of `parts`. */
  def hits(s: SparkSession, parts: DataFrame, iters: Int,
           bound: Int = -1): DataFrame =
    probe(parts, bound) match {
      case Some(classes) => Hits.classBlowup(s, classes, parts, iters)
      case None => Hits.run(
        GraphBuilder.blowupEdges(parts, Seq(1L), symmetric = false), iters)
    }

  /** A31 Resource-Allocation link prediction over the wide (±1, ±2)
    * blow-up of `parts`. */
  def resourceAllocation(s: SparkSession, parts: DataFrame, topK: Int,
                         bound: Int = -1): DataFrame =
    probe(parts, bound) match {
      case Some(classes) => LinkPrediction.quotientWithClasses(s, classes,
        parts.select(col("node").as("p_partkey"), col("brand").as("p_brand"),
          col("size").as("p_size")), topK)
      case None => LinkPrediction.resourceAllocation(
        GraphBuilder.blowupEdges(parts, Seq(1L, 2L), symmetric = true), topK)
    }

  /** A20 personalized PageRank over the narrow (±1) blow-up of
    * `parts(node, brand, size, is_seed)`. The refined-quotient path
    * splits each class by the seed flag (≤ 2× the probed count, its
    * own guard inside), so the plain class probe is the right
    * routing signal. */
  def ppr(s: SparkSession, parts: DataFrame, iters: Int,
          bound: Int = -1): DataFrame =
    probe(parts, bound) match {
      case Some(_) => PersonalizedPageRank.quotientRefined(s,
        parts.select(col("node").as("id"), col("brand"), col("size"),
          col("is_seed")), iters)
      case None => PersonalizedPageRank.run(s,
        GraphBuilder.blowupEdges(parts, Seq(1L), symmetric = true),
        parts.filter(col("is_seed")).select(col("node")), iters)
    }

  /** A21 2-round HyperANF (+ exact ball anchor) over the narrow (±1)
    * blow-up of `parts`. */
  def anf(s: SparkSession, parts: DataFrame, sampleMod: Int, tol: Double,
          bound: Int = -1): DataFrame =
    probe(parts, bound) match {
      case Some(classes) => Anf.quotientBlowup(s, classes, parts, sampleMod, tol)
      case None => Anf.propagationReference(s,
          GraphBuilder.blowupEdges(parts, Seq(1L), symmetric = true),
          sampleMod, tol)
        .select(col("node"), col("ball2"), col("anf_ok"))
    }

  /** A13 neighbor-set Jaccard over the wide (±1, ±2) blow-up of
    * `parts`. */
  def jaccard(s: SparkSession, parts: DataFrame,
              bound: Int = -1): DataFrame =
    probe(parts, bound) match {
      case Some(classes) => NodeSimilarity.quotientStamp(s, classes,
        parts.select(col("node").as("id"), col("brand"), col("size")))
      case None => NodeSimilarity.jaccard(s,
        GraphBuilder.blowupEdges(parts, Seq(1L, 2L), symmetric = true))
    }

  /** B8 corpus-wide graphlet census over the wide (±1, ±2) blow-up
    * of `parts` (round-13). */
  def graphlets(s: SparkSession, parts: DataFrame,
                bound: Int = -1): DataFrame =
    probe(parts, bound) match {
      case Some(classes) =>
        GraphletCensus.toDF(s, GraphletCensus.quotientCounts(classes))
      case None => GraphletCensus.distributed(s,
        GraphBuilder.blowupEdges(parts, Seq(1L, 2L), symmetric = true)
          .select(col("src"), col("dst")))
    }
}
