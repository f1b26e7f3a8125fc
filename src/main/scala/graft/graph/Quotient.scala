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
  def collectClasses(classCounts: org.apache.spark.sql.DataFrame): Map[(String, Long), Long] =
    probeClasses(classCounts, MAX_CLASSES).getOrElse(throw new IllegalArgumentException(
      s"requirement failed: class graph exceeds the $MAX_CLASSES domain bound — not a dimension-bounded quotient"))

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
