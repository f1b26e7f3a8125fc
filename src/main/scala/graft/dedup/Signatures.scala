package graft.dedup

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Map-side sketch signatures for the dedup pack.
  *
  * The first formulation of MinHash/SimHash built signatures
  * relationally: explode every (doc, shingle|token) pair, shuffle, and
  * aggregate 16 MINs / 64 bit-sums per document. Correct, but each
  * signature is really a ROW-LOCAL computation — a few thousand hashes
  * over one document's tokens — so materializing millions of exploded
  * rows and shuffling them twice buys nothing. These UDFs compute the
  * whole signature in one tight pass per document; the only shuffle
  * left in the dedup queries is the (tiny) band-bucket join itself.
  * At 100 TB that's the difference between two corpus-wide shuffles
  * and zero.
  *
  * Determinism contract is unchanged and byte-identical to the DuckDB
  * oracles: md5 of UTF-8 bytes, lexicographic min on lowercase hex,
  * integer tf sums for SimHash (no floats anywhere).
  */
object Signatures {

  /** Unsigned lexicographic digest compare — identical ordering to
    * comparing the lowercase-hex encodings. */
  private def ltUnsigned(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** 1-based sliding 3-word shingles (the [[graft.text.TextOps]]
    * contract) as an iterator — shared by the shingle-consuming
    * signatures below so shingling happens INSIDE the UDF: one
    * Catalyst↔JVM string conversion per document instead of two
    * (a separate shingle UDF feeding a signature UDF converts every
    * shingle across the boundary twice). */
  private def shingles3(w: Seq[String]): Iterator[String] =
    if (w == null || w.length < 3) Iterator.empty
    else w.sliding(3).map(_.mkString(" "))

  /** k-permutation MinHash signature of a shingle multiset:
    * sig(h) = min over shingles of md5hex(s"${h}_$shingle"), h in 1..k
    * (MIN over duplicates equals MIN over distinct, so no dedup pass
    * is needed). Returns null when there are no shingles — such docs
    * have no signature, matching the oracle's semantics.
    *
    * Digests are compared as raw bytes (same order as lowercase hex)
    * and each shingle is UTF-8-encoded once for all k permutations —
    * the hex strings are materialized only for the k winners. */
  def minhashSig(k: Int): UserDefinedFunction = {
    // row-invariant: built once at UDF construction, not per document
    val prefixes = Array.tabulate(k)(h => s"${h + 1}_".getBytes(StandardCharsets.UTF_8))
    udf { words: Seq[String] =>
    val it = shingles3(words)
    if (!it.hasNext) null
    else {
      val md = graft.util.Md5.digest()
      val mins = new Array[Array[Byte]](k)
      while (it.hasNext) {
        val sb = it.next().getBytes(StandardCharsets.UTF_8)
        var h = 0
        while (h < k) {
          md.reset()
          md.update(prefixes(h))
          md.update(sb)
          val dig = md.digest()
          if (mins(h) == null || ltUnsigned(dig, mins(h))) mins(h) = dig
          h += 1
        }
      }
      mins.toSeq.map(graft.util.Md5.toHex)
    }
  }
  }

  /** Term-frequency-weighted Charikar SimHash over a token sequence,
    * emitted as a `bits`-char '0'/'1' string. Bit b (1-based) of a
    * token's hash vector is bit (3 - (b-1)%4) of hex digit
    * (b-1)/4 of md5(token) — the same derivation the oracle spells
    * out with substr/position arithmetic. All accumulation is exact
    * integer math. */
  def simhashSig(bits: Int): UserDefinedFunction = {
    require(bits >= 1 && bits <= 128,
      s"simhash bits must be in 1..128 (md5 has 128 bits), got $bits")
    udf { toks: Seq[String] =>
    if (toks == null) null
    else {
      // tf map preserving exact token identity
      val tf = new java.util.HashMap[String, Long]()
      toks.foreach(t => tf.merge(t, 1L, (a, b) => a + b))
      val acc = new Array[Long](bits)
      val it = tf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val hx = graft.util.Md5.hex(e.getKey)
        val w = e.getValue
        var b = 0
        while (b < bits) {
          val nv = Character.digit(hx.charAt(b / 4), 16)
          val sgn = if (((nv >> (3 - (b % 4))) & 1) == 1) 1L else -1L
          acc(b) += sgn * w
          b += 1
        }
      }
      val out = new Array[Char](bits)
      var b = 0
      while (b < bits) {
        out(b) = if (acc(b) >= 0L) '1' else '0'
        b += 1
      }
      new String(out)
    }
  }
  }

  /** Sorted distinct 3-shingle set of a document's words (the
    * Jaccard-verify representation) in one pass — replaces a
    * corpus-wide DISTINCT shuffle plus a collect_set aggregation. */
  val shingleSet: UserDefinedFunction = udf { words: Seq[String] =>
    shingles3(words).toArray.distinct.sorted.toSeq
  }

  /** Deterministic ±1 hyperplane matrix, cached per (planes, dim) per
    * JVM: sgn(j, i) = +1 iff the first hex char of md5(s"${j}_$i") is
    * < '8' (1-based plane j, dim i) — identical to the oracle's
    * derivation. A (dim × planes) matrix is a few KB; on a cluster
    * each executor derives it once. */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  private def planeMatrix(planes: Int, dim: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((planes, dim), { _ =>
      Array.tabulate(dim) { i0 =>
        Array.tabulate(planes) { j0 =>
          if (graft.util.Md5.hex(s"${j0 + 1}_${i0 + 1}").charAt(0) < '8') 1.0 else -1.0
        }
      }
    })

  /** Random-hyperplane sign signature of a float vector as a
    * `planes`-char '0'/'1' string. Projection sums follow the
    * engine-wide quantization contract (floor(term·1e12 + 0.5) longs,
    * exact 64-bit sums — see [[graft.functions.DotQuant]]), mirrored
    * by the oracles. */
  def planeSig(planes: Int): UserDefinedFunction = udf { v: Seq[Float] =>
    if (v == null) null
    else {
      val m = planeMatrix(planes, v.length)
      val acc = new Array[Long](planes)
      var i = 0
      while (i < v.length) {
        val x = v(i).toDouble
        val row = m(i)
        var j = 0
        while (j < planes) {
          acc(j) += math.floor(row(j) * x * 1e12 + 0.5).toLong
          j += 1
        }
        i += 1
      }
      val out = new Array[Char](planes)
      var j = 0
      while (j < planes) {
        out(j) = if (acc(j) >= 0L) '1' else '0'
        j += 1
      }
      new String(out)
    }
  }
}
