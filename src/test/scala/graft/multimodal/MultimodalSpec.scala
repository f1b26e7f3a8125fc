package graft.multimodal

import graft.SparkSpec

/** G2: the stubbed decoder and the batched feature plumbing. */
class MultimodalSpec extends SparkSpec {

  test("featuresOf is a deterministic normalized 16-bin histogram") {
    val payload = "abcdabcd".getBytes("UTF-8")
    val f = Decode.featuresOf(payload)
    assert(f.length === Decode.DIM)
    assert(math.abs(f.sum - 1.0f) < 1e-6)
    assert(f === Decode.featuresOf(payload))
    // 'a'=97 -> bin 1, 'b' -> 2, 'c' -> 3, 'd' -> 4, each 2/8
    assert(f(1) === 0.25f && f(2) === 0.25f && f(3) === 0.25f && f(4) === 0.25f)
  }

  test("m_features emits one fixed-width vector per document") {
    import org.apache.spark.sql.functions._
    val df = MultimodalPack.queries("m_features")(spark, sfDir).cache()
    val n = df.count()
    assert(n > 0)
    assert(df.filter(size(col("features")) =!= Decode.DIM).count() === 0)
    assert(df.filter(col("n_bytes") <= 0).count() === 0)
  }
}
