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
  * Scale shape: wedge enumeration is the triangle-count join (Σdeg²
  * work — fine under a structural degree cap like the part
  * edit-graph's; a celebrity-skewed graph would need
  * NodeSimilarity's positional-block decomposition instead), the
  * known-edge exclusion is a left-anti equi-join, per-wedge
  * contributions are DECIMAL(28,12)-quantized before the exact
  * order-independent sum, and the global top-k is Spark's
  * TakeOrderedAndProject (map-side k per partition, never a full
  * sort); the rank stamp then windows over only those k rows.
  */
object LinkPrediction {
  private val M = org.apache.spark.sql.types.DecimalType(28, 12)

  /** @param edges SYMMETRIC (src, dst) edge list (both directions
    *              present), no self-loops.
    * @param topK  rows to return.
    * @return (rank, u, v, n_common, score) for the topK non-adjacent
    *         pairs u < v by (score DESC, u ASC, v ASC). */
  def resourceAllocation(edges: DataFrame, topK: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    val deg = e.groupBy(col("src").as("w")).agg(count(lit(1)).as("degw"))
    val x = e.select(col("src").as("w"), col("dst").as("u"))
    val y = e.select(col("src").as("w"), col("dst").as("v"))
    val canon = e.filter(col("src") < col("dst"))
      .select(col("src").as("u"), col("dst").as("v"))
    x.join(y, "w").filter(col("u") < col("v"))
      .join(canon, Seq("u", "v"), "left_anti")
      .join(deg, "w")
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("n_common"),
        sum((lit(1.0) / col("degw").cast("double")).cast(M)).as("sc"))
      .select(col("u"), col("v"), col("n_common"),
        col("sc").cast("double").as("score"))
      .orderBy(col("score").desc, col("u").asc, col("v").asc).limit(topK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("u").asc, col("v").asc)).cast("long"))
      .select(col("rank"), col("u"), col("v"), col("n_common"), col("score"))
  }
}
