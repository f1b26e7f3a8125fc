package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Degree assortativity (Newman 2002): Pearson correlation of
  * endpoint degrees over a SYMMETRIC edge list — the one-number
  * summary of hub-hub vs hub-leaf mixing (r > 0 assortative,
  * r < 0 disassortative, NULL when the graph is degree-regular and
  * the correlation is undefined).
  *
  * C24's exact-moment discipline on the graph: per-edge
  * (deg u, deg v) from two node-keyed joins, then ONE
  * partial-aggregable global aggregate of five DECIMAL(38,0) moments
  * (degrees are fact-scaled — class sizes grow with SF — so
  * long×long cross products would overflow where exact decimals, vs
  * the oracle's HUGEINT, cannot); IEEE arithmetic touches only the
  * final pinned-order r expression (num / (sqrt(den1) · sqrt(den2)),
  * each sqrt correctly rounded per IEEE 754 so the value is
  * bit-identical cross-engine). */
object Assortativity {
  private val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
  private def dd(c: Column) = c.cast(d38)

  /** @param edges symmetric (src, dst) edge list.
    * @return one row (n_edges, assortativity). */
  def of(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    val deg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
    ofStamped(e
      .join(deg.select(col("node").as("src"), col("deg").as("x")), "src")
      .join(deg.select(col("node").as("dst"), col("deg").as("y")), "dst"))
  }

  /** The moment aggregate over an already degree-stamped edge list
    * (columns x = deg src, y = deg dst) — split out (round 15) so the
    * shipped key can feed the SessionCache'd, broadcast-joined stamp
    * shared with g_richclub while [[of]] keeps the self-contained
    * arbitrary-graph contract the specs pin. */
  def ofStamped(stamped: DataFrame): DataFrame = {
    val m = stamped
      .agg(count(lit(1)).as("n_edges"),
        sum(dd(col("x"))).as("sx"), sum(dd(col("y"))).as("sy"),
        sum(dd(col("x")) * dd(col("x"))).as("sxx"),
        sum(dd(col("x")) * dd(col("y"))).as("sxy"),
        sum(dd(col("y")) * dd(col("y"))).as("syy"))
    val num = dd(col("n_edges")) * dd(col("sxy")) - dd(col("sx")) * dd(col("sy"))
    val den1 = dd(col("n_edges")) * dd(col("sxx")) - dd(col("sx")) * dd(col("sx"))
    val den2 = dd(col("n_edges")) * dd(col("syy")) - dd(col("sy")) * dd(col("sy"))
    m.select(col("n_edges"),
      when(den1 === 0 || den2 === 0, lit(null).cast("double"))
        .otherwise(num.cast("double") /
          (sqrt(den1.cast("double")) * sqrt(den2.cast("double"))))
        .as("assortativity"))
  }
}
