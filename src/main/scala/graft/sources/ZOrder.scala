package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) multi-dimensional clustering — the storage-LAYOUT
  * lever of a 100 TB corpus. Operators tune how data is processed;
  * layout tunes how little of it a filtered scan must READ: writing a
  * table clustered by the bit-interleaving of two filter columns
  * gives every file a bounded min/max envelope in BOTH dimensions, so
  * parquet row-group stats prune scans on EITHER predicate — the
  * effect Delta/Iceberg `OPTIMIZE ZORDER BY` exists for, built here
  * from public Spark primitives: one codegen'd bit-interleave
  * expression (no UDF) + `repartitionByRange` + an in-file sort.
  *
  * Scale shape: the interleave is a pure per-row expression (map-side,
  * whole-stage codegen); the clustered write is ONE range shuffle —
  * the same cost as any global sort, paid once at write time and
  * amortized over every pruned scan after. ZOrderLayoutSpec measures
  * the payoff (task `bytesRead` under a selective predicate, z-layout
  * vs single-column layout); the `q_zorder` key pins the bit math
  * cross-engine against DuckDB via [[oracleSqlExpr]], generated from
  * the same term table so the two cannot drift.
  */
object ZOrder {

  /** Bits interleaved per dimension. 31 keeps the result in the
    * non-negative long range (2·31 = 62 value bits), so ordering by
    * the signed zkey IS the Morton order. */
  val BITS = 31

  private val MAX = (1L << BITS) - 1

  /** Interleaved 62-bit Morton key of two in-domain longs: bit i of
    * `x` lands at 2i, bit i of `y` at 2i+1. Out-of-domain input
    * fails LOUDLY (raise_error) — silently masking high bits would
    * alias far-apart rows into one z-cell, the same failure mode as
    * s_knn_binary's 64-dim guard. */
  def interleave(x: Column, y: Column): Column = {
    val xs = x.cast("long")
    val ys = y.cast("long")
    val z = (0 until BITS).map { i =>
      // (v & (1<<i)) << i puts x's bit i at 2i; y's shifts one higher
      shiftleft(xs.bitwiseAND(lit(1L << i)), i)
        .bitwiseOR(shiftleft(ys.bitwiseAND(lit(1L << i)), i + 1))
    }.reduce(_ bitwiseOR _)
    when(xs.between(0, MAX) && ys.between(0, MAX), z)
      .otherwise(raise_error(concat(
        lit(s"zorder domain is [0, 2^$BITS): got ("), xs, lit(", "), ys, lit(")"))))
  }

  /** The DuckDB twin of [[interleave]] over in-domain data, generated
    * from the same term table (bit i of `x` → 2i, bit i of `y` →
    * 2i+1) so the Spark expression and the oracle cannot drift. */
  def oracleSqlExpr(x: String, y: String): String =
    (0 until BITS).map { i =>
      s"((CAST($x AS BIGINT) & ${1L << i}) << $i) | ((CAST($y AS BIGINT) & ${1L << i}) << ${i + 1})"
    }.mkString("(", " | ", ")")

  /** Bits per dimension for the write-time NORMALIZED key: both
    * columns are min/max-scaled onto [0, 2^16) before interleaving,
    * so each dimension gets equal weight in the high bits. Without
    * this, the dimension with the wider raw domain monopolizes every
    * high bit and range-splitting the key degenerates to a 1-D sort
    * on that column — ZOrderLayoutSpec measured exactly that failure
    * (zero pruning on the narrow dimension) before normalization. */
  val NORM_BITS = 16

  /** v scaled onto [0, 2^NORM_BITS): the product is computed in
    * DECIMAL(38,0), safe for ANY long span (a LongType multiply
    * would silently wrap at spans ≥ 2^63/65535 ≈ 1.4e14 — epoch
    * microseconds overflow it; a double multiply loses bits past
    * 2^53). Spark's decimal division rounds at scale 6, so a value
    * sitting within 5e-7 of a bucket boundary may land one bucket
    * over — layout blur of at most one cell, never a wrapped or
    * out-of-range key. Note the normalized output always lands in
    * [0, 2^NORM_BITS), so [[interleave]]'s domain guard never fires
    * on writeClustered's behalf — this exactness is what stands in
    * for it. Degenerate hi == lo → 0. */
  private def norm(v: Column, lo: Column, hi: Column): Column = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    // cast BEFORE subtracting: a LongType (v - lo) or (hi - lo)
    // itself wraps when the span reaches 2^63 (lo near Long.MinValue,
    // hi near Long.MaxValue) — the decimal domain has to start at the
    // leaves for the any-span claim to hold
    val vd = v.cast("long").cast(d38)
    val lod = lo.cast("long").cast(d38)
    val hid = hi.cast("long").cast(d38)
    val top = (1L << NORM_BITS) - 1
    when(hi === lo, lit(0L))
      .otherwise(floor((vd - lod) * lit(top) / (hid - lod)).cast("long"))
  }

  /** Write `df` z-clustered on (`x`, `y`) as `files` parquet files:
    * one tiny extent agg (broadcast), one range shuffle on the
    * normalized interleaved key, an in-file sort, key dropped before
    * writing (layout metadata, not data). */
  def writeClustered(df: DataFrame, x: String, y: String,
                     path: String, files: Int): Unit = {
    val ext = broadcast(df.agg(
      min(col(x)).cast("long").as("__xlo"), max(col(x)).cast("long").as("__xhi"),
      min(col(y)).cast("long").as("__ylo"), max(col(y)).cast("long").as("__yhi")))
    df.crossJoin(ext)
      .withColumn("__zkey", interleave(
        norm(col(x), col("__xlo"), col("__xhi")),
        norm(col(y), col("__ylo"), col("__yhi"))))
      .repartitionByRange(files, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey", "__xlo", "__xhi", "__ylo", "__yhi")
      .write.mode("overwrite").parquet(path)
  }
}
