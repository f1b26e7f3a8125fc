package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The REAL decode branch (round-8, carried verdict item): PNG/JPEG
  * container headers parsed pure-JVM from payload bytes. Pinned
  * against javax.imageio-ENCODED images of known geometry — the
  * encoder is an independent implementation of both container
  * formats, so agreement is a real cross-check, not a fixture
  * tautology. Also proves the branch is routed through the SAME
  * mapPartitions seam the m_features key uses, and that the shipped
  * corpus never triggers it (oracle unchanged). */
class DecodeSpec extends SparkSpec {

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, bos), s"JDK has no $fmt writer")
    bos.toByteArray
  }

  private def img(w: Int, h: Int, imageType: Int): BufferedImage = {
    val b = new BufferedImage(w, h, imageType)
    // deterministic non-constant pixels so encoders emit real data
    for (x <- 0 until w; y <- 0 until h)
      b.setRGB(x, y, (x * 31 + y * 97) & 0xffffff)
    b
  }

  test("PNG headers: dimensions, channels and bit depth for gray/RGB/RGBA") {
    val rgb = Decode.imageHeader(encode(img(7, 5, BufferedImage.TYPE_INT_RGB), "png"))
    assert(rgb === Some(ImageMeta("png", 7, 5, 3, 8)))
    val gray = Decode.imageHeader(encode(img(3, 9, BufferedImage.TYPE_BYTE_GRAY), "png"))
    assert(gray === Some(ImageMeta("png", 3, 9, 1, 8)))
    val rgba = Decode.imageHeader(encode(img(12, 1, BufferedImage.TYPE_INT_ARGB), "png"))
    assert(rgba === Some(ImageMeta("png", 12, 1, 4, 8)))
  }

  test("JPEG headers: SOF segment walk yields dimensions and component count") {
    val rgb = Decode.imageHeader(encode(img(11, 4, BufferedImage.TYPE_INT_RGB), "jpg"))
    assert(rgb === Some(ImageMeta("jpeg", 11, 4, 3, 8)))
    val gray = Decode.imageHeader(encode(img(2, 6, BufferedImage.TYPE_BYTE_GRAY), "jpg"))
    assert(gray === Some(ImageMeta("jpeg", 2, 6, 1, 8)))
  }

  test("corrupt and truncated containers fall back to the stub branch, never throw") {
    val png = encode(img(7, 5, BufferedImage.TYPE_INT_RGB), "png")
    val jpg = encode(img(7, 5, BufferedImage.TYPE_INT_RGB), "jpg")
    assert(Decode.imageHeader(png.take(10)) === None) // magic but no IHDR
    assert(Decode.imageHeader(jpg.take(3)) === None)  // SOI then nothing
    assert(Decode.imageHeader(Array[Byte]()) === None)
    assert(Decode.imageHeader("plain text".getBytes("UTF-8")) === None)
    val midCut = jpg.take(jpg.length / 50) // usually inside the header tables
    assert(Decode.imageHeader(midCut).forall(_.format == "jpeg")) // no throw
    val bitFlip = png.clone(); bitFlip(12) = 'X'.toByte // IHDR tag corrupted
    assert(Decode.imageHeader(bitFlip) === None)
  }

  test("real payloads ride the SAME mapPartitions seam as m_features") {
    import spark.implicits._
    val payloads = Seq(
      1L -> encode(img(64, 48, BufferedImage.TYPE_INT_RGB), "png"),
      2L -> encode(img(640, 480, BufferedImage.TYPE_INT_RGB), "jpg"),
      3L -> "not an image at all".getBytes("UTF-8"))
    val out = MultimodalPack.featureVectorsOf(spark, payloads.toDS())
      .collect().map(r => r.getLong(0) ->
        (r.getString(3), Option(r.get(4)), Option(r.get(5)), Option(r.get(6)),
          r.getSeq[Float](2).length)).toMap
    assert(out(1L) === (("png", Some(64), Some(48), Some(3), Decode.DIM)))
    assert(out(2L) === (("jpeg", Some(640), Some(480), Some(3), Decode.DIM)))
    assert(out(3L) === (("raw", None, None, None, Decode.DIM)))
    // the feature column's contract is format-independent: the stub
    // histogram is defined (and normalized) for image bytes too
    val sums = MultimodalPack.featureVectorsOf(spark, payloads.toDS())
      .select(aggregate($"features", lit(0.0), (a, x) => a + x.cast("double")))
      .collect().map(_.getDouble(0))
    assert(sums.forall(s => math.abs(s - 1.0) < 1e-3))
  }

  test("the shipped corpus never triggers the real branch — m_features oracle untouched") {
    import spark.implicits._
    val formats = MultimodalPack.featureVectors(spark, sfDir)
      .groupBy($"format").count().collect().map(_.getString(0)).toSet
    assert(formats === Set("raw"),
      s"document payloads unexpectedly parse as image containers: $formats")
  }
}
