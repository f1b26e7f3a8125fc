package graft.graph

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Shared scaffolding for the QUOTIENT fast paths (A29/A30/A31/A33):
  * operators whose result is a pure function of the dimension-bounded
  * (brand, size) class graph collect that graph — guarded — and run
  * in-process, then stamp results back onto the fact table. One
  * domain bound, one guarded collect, one quantizer, so the fast
  * paths cannot drift apart. */
object Quotient {

  /** Domain bound for any collected class graph (|brands|·|sizes|
    * is attribute-domain-bounded regardless of fact count). */
  val MAX_CLASSES = 100000

  /** Conf keys for the routing bounds (round-11, verdict #8): a
    * deployment can move each in-process/distributed crossover
    * without a rebuild — defaults unchanged. `maxClasses` governs
    * every class-domain probe and the quotient engines' own guarded
    * collects; `probeBound` governs the row-probe sweeps (bounded
    * BFS spine, Brandes σ). Explicit `bound` arguments still win —
    * the conf only replaces the DEFAULT.
    *
    * These two are THE routing bounds — every probe-routed operator
    * resolves its crossover through [[maxClasses]]/[[probeBound]]
    * (round-13, verdict #6: eccentricity/betweenness/label-prop/
    * PageRank/PPR's in-process variants and DagDepth's class DP each
    * carried a private copy; a drive-by edit to one silently changed
    * which engine answered at a given scale). DispatchSpec pins both
    * values AND each operator's route at the shipped SFs. */
  val MAX_CLASSES_KEY = "spark.graft.quotient.maxClasses"
  val PROBE_BOUND_KEY = "spark.graft.dispatch.probeBound"

  /** Default row-probe bound for the in-process sweep routes. */
  val PROBE_BOUND = 1 << 20

  def maxClasses(s: SparkSession): Int = confBound(s, MAX_CLASSES_KEY, MAX_CLASSES)
  def probeBound(s: SparkSession): Int = confBound(s, PROBE_BOUND_KEY, PROBE_BOUND)

  private def confBound(s: SparkSession, key: String, default: Int): Int = {
    val v = s.conf.get(key, default.toString).toInt
    require(v >= 1, s"$key must be >= 1, got $v")
    v
  }

  /** Resolves a caller bound: negative = "use the session default"
    * (the conf-tunable crossover), non-negative = the caller's own. */
  private[graph] def resolve(bound: Int, s: SparkSession, default: SparkSession => Int): Int =
    if (bound < 0) default(s) else bound

  /** The engine-wide message quantizer (DECIMAL(28,12) HALF_UP —
    * Spark's double→decimal cast semantics), used wherever an
    * in-process fast path must replicate a distributed decimal
    * contract bit-for-bit. */
  def q12(d: Double): BigDecimal =
    BigDecimal.decimal(d).setScale(12, BigDecimal.RoundingMode.HALF_UP)

  /** Guarded collect of the part table's (brand, size) classes with
    * member counts: the limit sits INSIDE the collect (never
    * materializing more than the bound + 1 rows on the driver), and
    * a caller lying about boundedness fails loudly. */
  def collectClasses(s: SparkSession, d: String): Map[(String, Long), Long] = {
    import s.implicits._
    collectClasses(graft.Tables.part(s, d)
      .groupBy($"p_brand", $"p_size".cast("long").as("size"))
      .agg(count(lit(1)).as("cnt")))
  }

  /** The same guard over a caller-supplied class-count aggregate —
    * columns (String class attr, Long class attr, Long member count)
    * in that order. Serves the fast paths that run off an arbitrary
    * vertex table (Anf's property-spec blow-ups, LinkPrediction's
    * widened graph) so the guard discipline stays single-sourced. */
  def collectClasses(classCounts: org.apache.spark.sql.DataFrame): Map[(String, Long), Long] = {
    val bound = maxClasses(classCounts.sparkSession)
    probeClasses(classCounts, bound).getOrElse(throw new IllegalArgumentException(
      s"requirement failed: class graph exceeds the $bound domain bound — not a dimension-bounded quotient"))
  }

  /** The NON-THROWING form of the guard — [[Dispatch]]'s probe. Same
    * bounded collect (the limit INSIDE, ≤ bound + 1 rows ever reach
    * the driver); a class graph past the bound answers None (route to
    * the general engine) where [[collectClasses]] throws (a caller
    * that HARD-ASSERTED boundedness was lying). */
  def probeClasses(classCounts: org.apache.spark.sql.DataFrame,
                   bound: Int): Option[Map[(String, Long), Long]] =
    probeRows(classCounts, bound)
      .map(_.map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap)

  /** The generic bounded probe every routed operator shares: Some(the
    * collected rows) when `df` is within `bound`, None past it. The
    * limit sits INSIDE the collect — at most bound + 1 rows ever
    * reach the driver, whatever the input size — and the rows ARE the
    * fast path's input, so routing costs no second job. Single-sourced
    * here so the in-process fast paths (class maps, bounded BFS edge
    * lists, σ sweeps) cannot drift apart in guard discipline. */
  def probeRows(df: org.apache.spark.sql.DataFrame,
                bound: Int): Option[Array[org.apache.spark.sql.Row]] = {
    val rows = df.limit(bound + 1).collect()
    if (rows.length > bound) None else Some(rows)
  }
}
