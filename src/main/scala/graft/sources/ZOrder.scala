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

  /** Bits interleaved per dimension in the 2-D layout. 31 keeps the
    * result in the non-negative long range (2·31 = 62 value bits), so
    * ordering by the signed zkey IS the Morton order. */
  val BITS = 31

  /** Bits interleaved per dimension for a k-dim key: ⌊62 / k⌋, the
    * k-column generalization Delta/Iceberg `ZORDER BY` takes (k = 2
    * reproduces [[BITS]] exactly). The per-dim resolution shrinks as
    * k grows — 20 bits at k = 3, 15 at k = 4 — which is the inherent
    * z-order trade, not an implementation cap. */
  def bitsPerDim(k: Int): Int = {
    require(k >= 2 && k <= 16, s"zorder takes 2..16 dimensions, got $k")
    62 / k
  }

  /** Interleaved ≤62-bit Morton key of k in-domain longs: bit i of
    * dimension j lands at position i·k + j, so dimension 0 owns the
    * lowest bit of every k-bit group (for k = 2 this is the classic
    * x-even/y-odd layout). Out-of-domain input fails LOUDLY
    * (raise_error) — silently masking high bits would alias far-apart
    * rows into one z-cell, the same failure mode as s_knn_binary's
    * 64-dim guard. Pure codegen'd bit math, no UDF. */
  def interleaveN(dims: Seq[Column]): Column = {
    val k = dims.length
    val bits = bitsPerDim(k)
    val max = (1L << bits) - 1
    val ds = dims.map(_.cast("long"))
    val z = (for { i <- 0 until bits; j <- ds.indices } yield
      // (v & (1<<i)) << (i·(k−1) + j) puts dim j's bit i at i·k + j
      shiftleft(ds(j).bitwiseAND(lit(1L << i)), i * (k - 1) + j))
      .reduce(_ bitwiseOR _)
    val msgParts =
      (lit(s"zorder domain is [0, 2^$bits) in $k dims: got (") +:
        ds.flatMap(d => Seq(d, lit(", "))).dropRight(1)) :+ lit(")")
    when(ds.map(_.between(0, max)).reduce(_ && _), z)
      .otherwise(raise_error(concat(msgParts: _*)))
  }

  /** Interleaved 62-bit Morton key of two in-domain longs — the 2-D
    * special case of [[interleaveN]] (bit i of `x` at 2i, of `y` at
    * 2i+1; identical bit layout and guard). */
  def interleave(x: Column, y: Column): Column = interleaveN(Seq(x, y))

  /** The DuckDB twin of [[interleaveN]] over in-domain data, generated
    * from the same term table (bit i of dim j → i·k + j) so the Spark
    * expression and the oracle cannot drift. */
  def oracleSqlExprN(dims: Seq[String]): String = {
    val k = dims.length
    val bits = bitsPerDim(k)
    (for { i <- 0 until bits; j <- dims.indices } yield
      s"((CAST(${dims(j)} AS BIGINT) & ${1L << i}) << ${i * (k - 1) + j})")
      .mkString("(", " | ", ")")
  }

  /** The DuckDB twin of [[interleave]] — 2-D [[oracleSqlExprN]]. */
  def oracleSqlExpr(x: String, y: String): String = oracleSqlExprN(Seq(x, y))

  /** Bits per dimension for the write-time NORMALIZED key (capped at
    * bitsPerDim(k) when k > 3): every clustered column is
    * min/max-scaled onto [0, 2^16) before interleaving,
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
  private def norm(v: Column, lo: Column, hi: Column, normBits: Int): Column = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    // cast BEFORE subtracting: a LongType (v - lo) or (hi - lo)
    // itself wraps when the span reaches 2^63 (lo near Long.MinValue,
    // hi near Long.MaxValue) — the decimal domain has to start at the
    // leaves for the any-span claim to hold
    val vd = v.cast("long").cast(d38)
    val lod = lo.cast("long").cast(d38)
    val hid = hi.cast("long").cast(d38)
    val top = (1L << normBits) - 1
    when(hi === lo, lit(0L))
      .otherwise(floor((vd - lod) * lit(top) / (hid - lod)).cast("long"))
  }

  /** Write `df` z-clustered on `dims` (k ≥ 2 columns) as `files`
    * parquet files: one tiny extent agg (broadcast), one range shuffle
    * on the normalized interleaved key, an in-file sort, key dropped
    * before writing (layout metadata, not data). Each dimension is
    * min/max-scaled onto [0, 2^min(NORM_BITS, bitsPerDim(k))) so the
    * normalized values always sit inside the interleave domain
    * whatever k is — the guard never fires on this path. */
  def writeClusteredN(df: DataFrame, dims: Seq[String],
                      path: String, files: Int): Unit = {
    val nb = math.min(NORM_BITS, bitsPerDim(dims.length))
    val extCols = dims.zipWithIndex.flatMap { case (c, j) => Seq(
      min(col(c)).cast("long").as(s"__lo$j"),
      max(col(c)).cast("long").as(s"__hi$j")) }
    val ext = broadcast(df.agg(extCols.head, extCols.tail: _*))
    val normed = dims.zipWithIndex.map { case (c, j) =>
      norm(col(c), col(s"__lo$j"), col(s"__hi$j"), nb) }
    val helper = dims.indices.flatMap(j => Seq(s"__lo$j", s"__hi$j"))
    df.crossJoin(ext)
      .withColumn("__zkey", interleaveN(normed))
      .repartitionByRange(files, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey" +: helper: _*)
      .write.mode("overwrite").parquet(path)
  }

  /** 2-D [[writeClusteredN]] (the original shipped surface). */
  def writeClustered(df: DataFrame, x: String, y: String,
                     path: String, files: Int): Unit =
    writeClusteredN(df, Seq(x, y), path, files)
}
