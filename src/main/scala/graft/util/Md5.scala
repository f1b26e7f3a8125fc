package graft.util

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** The engine's ONE md5-hex implementation. Signature determinism
  * (MinHash, SimHash, WL hashes, winnowing fingerprints, split/mix
  * draws) all rides on this exact encoding — lowercase hex of the
  * UTF-8 digest, byte-identical to DuckDB's `md5(varchar)` — so it
  * lives in one place instead of hand-synced copies per pack.
  *
  * The digest instance is ThreadLocal: JCA provider lookup per call
  * (`MessageDigest.getInstance`) is pure overhead on paths that hash
  * once per token/gram across a corpus.
  */
object Md5 {

  private val digestTL: ThreadLocal[MessageDigest] = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private val HEX = "0123456789abcdef".toCharArray

  /** This thread's digest, reset and ready for update/digest calls. */
  def digest(): MessageDigest = {
    val m = digestTL.get()
    m.reset()
    m
  }

  def toHex(dig: Array[Byte]): String = {
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((dig(i) >> 4) & 0xf)
      out(2 * i + 1) = HEX(dig(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Lowercase md5 hex of the UTF-8 bytes of `s`. */
  def hex(s: String): String =
    toHex(digest().digest(s.getBytes(StandardCharsets.UTF_8)))
}
