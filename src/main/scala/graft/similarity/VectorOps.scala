package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector primitives shared by the similarity and dedup packs.
  *
  * Determinism contract (same as the rest of the engine): every sum
  * that feeds a comparison or an output is accumulated in
  * DECIMAL(28,12) — exact, order-free addition — so Spark and the
  * DuckDB oracle produce bit-identical doubles. Element products are
  * computed in double (float leaves cast up first), identical IEEE
  * semantics in both engines.
  *
  * The random-hyperplane LSH uses ±1 hyperplanes derived from
  * md5(plane || '_' || dim): sign(h_j · v) with s_ji = +1 iff the
  * first hex digit of md5(j_i) is < '8'. Fully deterministic and
  * reproducible in SQL — no RNG, no seed plumbing.
  */
object VectorOps {

  /** Sequential decimal-accumulated dot product of two array<float>
    * columns (codegen'd higher-order functions, no UDF). */
  def dotDec(a: String, b: String): Column =
    expr(s"""CAST(aggregate(
            |  zip_with($a, $b, (x, y) -> CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(28,12))),
            |  CAST(0 AS DECIMAL(28,12)),
            |  (acc, v) -> CAST(acc + v AS DECIMAL(28,12))) AS DOUBLE)""".stripMargin)

  /** Euclidean norm of an array<float> column, decimal-accumulated. */
  def normDec(a: String): Column =
    expr(s"""sqrt(CAST(aggregate(
            |  transform($a, x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,12))),
            |  CAST(0 AS DECIMAL(28,12)),
            |  (acc, v) -> CAST(acc + v AS DECIMAL(28,12))) AS DOUBLE))""".stripMargin)

  /** (id, i, x): 1-based exploded dimensions of an embedding table. */
  def dims(e: DataFrame, idCol: String): DataFrame =
    e.select(col(idCol), posexplode(col("embedding")).as(Seq("pos", "xf")))
      .select(col(idCol), (col("pos") + 1).as("i"), col("xf").cast("double").as("x"))

  /** Random-hyperplane sign signatures: (id, sg) where sg is a
    * `planes`-char '0'/'1' string, computed map-side in one pass per
    * vector ([[graft.dedup.Signatures.planeSig]] — the ±1 hyperplane
    * matrix is deterministic md5 signs, cached per executor). The
    * first formulation exploded every (vector, dim, plane) row and
    * aggregated twice; a signature is row-local, so that shuffled
    * (n·dim·planes) rows for nothing. */
  def signatures(e: DataFrame, idCol: String, planes: Int): DataFrame =
    e.select(col(idCol),
      graft.dedup.Signatures.planeSig(planes)(col("embedding")).as("sg"))

  /** Exact quantized dot product — the native codegen'd Catalyst
    * expression [[graft.functions.DotQuant]] (see its scaladoc for the
    * quantization contract mirrored by the oracles). Callers must have
    * run [[graft.functions.GraftFunctions.register]] on the session. */
  def dotDecFast(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.dotQuant(a, b)

  /** Explode a signature into `bands` equal chunks: (id, b, bv). */
  def bandKeys(sig: DataFrame, idCol: String, planes: Int, bands: Int): DataFrame = {
    val width = planes / bands
    sig.select(col(idCol), explode(sequence(lit(1), lit(bands))).as("b"), col("sg"))
      .withColumn("bv", expr(s"substring(sg, (b-1)*$width + 1, $width)"))
      .select(col(idCol), col("b"), col("bv"))
  }
}
