package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Broadcast Bloom-filter membership as pure column expressions.
  *
  * The 100 TB decontamination / blocklist pattern: the member set (a
  * benchmark suite, a URL blocklist, a banned-hash list) is the SMALL
  * side, but a broadcast hash join against it still costs a
  * hash-table probe per row and a broadcast that grows with the set.
  * A Bloom filter caps the broadcast at `m` BITS regardless of member
  * cardinality and turns the probe into k hash + mask ops that stay
  * inside whole-stage codegen — no join, no shuffle, no UDF. The
  * price is a bounded false-positive rate and zero false negatives,
  * which is exactly the right trade for a contamination FLAG (a rare
  * FP quarantines one extra doc; an FN leaks benchmark text into
  * training data).
  *
  * Build-side scale shape: the bit positions are computed
  * distributed, deduplicated (≤ m distinct values — the driver
  * collect is capped by the FILTER SIZE, never by the member-set
  * size), and packed into an `Array[Long]` that ships to executors as
  * a literal, like a broadcast dimension.
  *
  * Hashing: position i = xxhash64(i, value) & (m − 1), the standard
  * k-independent-seeds construction (seed folded in as a leading
  * column); m must be a power of two so the mask is exact.
  */
object BloomBits {

  private def checkM(m: Int): Unit =
    require(m > 0 && (m & (m - 1)) == 0, s"m must be a positive power of two, got $m")

  /** The k bit positions of `value` in an m-bit filter. */
  def positions(value: Column, m: Int, k: Int): Seq[Column] = {
    checkM(m)
    (0 until k).map(i => xxhash64(lit(i), value).bitwiseAND(lit((m - 1).toLong)))
  }

  /** Build the packed bit array from the member column of `df`
    * (one action; the collect is ≤ m/64 + distinct-positions ≤ m
    * longs, bounded by the filter size at ANY member cardinality). */
  def build(df: DataFrame, value: Column, m: Int, k: Int): Array[Long] = {
    checkM(m)
    val pos = df.select(explode(array(positions(value, m, k): _*)).as("p"))
      .distinct()
      .collect()
      .map(_.getLong(0))
    val bits = new Array[Long](m / 64)
    pos.foreach(p => bits((p >>> 6).toInt) |= 1L << (p & 63L))
    bits
  }

  /** Membership probe against a built filter — k codegen'd
    * hash+mask+test ops, no join. True for every member (no false
    * negatives); true for a non-member with probability
    * ≈ (1 − e^(−kn/m))^k. */
  def mightContain(bits: Array[Long], value: Column, m: Int, k: Int): Column = {
    checkM(m)
    require(bits.length == m / 64, s"bit array has ${bits.length} words, expected ${m / 64}")
    val lit_bits = typedLit(bits.toSeq)
    positions(value, m, k).map { p =>
      val word = element_at(lit_bits, (p / 64).cast("int") + 1)
      val mask = call_function("shiftleft", lit(1L), (p % 64).cast("int"))
      word.bitwiseAND(mask) =!= 0L
    }.reduce(_ && _)
  }
}
