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

  test("featureVectors emits one fixed-width vector per document") {
    import org.apache.spark.sql.functions._
    val df = MultimodalPack.featureVectors(spark, sfDir).cache()
    val n = df.count()
    assert(n > 0)
    assert(df.filter(size(col("features")) =!= Decode.DIM).count() === 0)
    assert(df.filter(col("n_bytes") <= 0).count() === 0)
  }

  test("m_features scalar projection is consistent with the vectors") {
    import org.apache.spark.sql.functions._
    val df = MultimodalPack.queries("m_features")(spark, sfDir).cache()
    assert(df.count() > 0)
    // scalar projection must stay sortable (driver comparator contract):
    // no array/map/struct columns.
    assert(df.schema.fields.forall(f =>
      !f.dataType.typeName.matches("array|map|struct")))
    assert(df.filter(col("dim") =!= Decode.DIM).count() === 0)
    assert(df.filter(col("argmax_bin") < 1 || col("argmax_bin") > Decode.DIM).count() === 0)
    // l2sq of a probability histogram lies in (0, 1]
    assert(df.filter(col("f_l2sq") <= 0 || col("f_l2sq") > 1).count() === 0)
    assert(df.filter(col("f_max") <= 0 || col("f_max") > 1).count() === 0)
  }

  test("the corpus is pure ASCII (oracle contract: bytes == characters)") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sfDir)
    assert(docs.filter(octet_length(col("text")) =!= length(col("text"))).count() === 0)
  }

  test("m_ar_buckets: batches respect the pixel budget and pack greedily without holes") {
    import org.apache.spark.sql.functions._
    val rows = graft.SparkEntry.queries("m_ar_buckets")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // every bucket id is a valid clamped ratio band and dims in range
    rows.foreach { r =>
      val (w, h, b) = (r.getAs[Long]("width"), r.getAs[Long]("height"), r.getAs[Long]("bucket"))
      assert(w >= 64 && w < 512 && h >= 64 && h < 512)
      assert(b === math.min(math.max(w * 4 / h, 2L), 8L))
      assert(r.getAs[Long]("pixels") === w * h)
    }
    // greedy packing law per (bucket, shard) stream: batch_idx is the
    // doc-id-ordered running pixel sum divided by the budget — batches
    // are contiguous, non-decreasing, and each holds < budget + one
    // image of slack (the greedy overflow bound)
    val budget = 1L << 20
    rows.groupBy(r => (r.getAs[Long]("bucket"), r.getAs[Long]("shard"))).foreach {
      case (_, stream) =>
        val ordered = stream.sortBy(_.getAs[Long]("doc_id"))
        var cum = 0L
        ordered.foreach { r =>
          assert(r.getAs[Long]("batch_idx") === cum / budget)
          cum += r.getAs[Long]("pixels")
        }
        val perBatch = ordered.groupBy(_.getAs[Long]("batch_idx"))
          .view.mapValues(_.map(_.getAs[Long]("pixels")).sum)
        perBatch.foreach { case (idx, px) =>
          if (idx < perBatch.keys.max)
            assert(px < budget + 511L * 511L, s"batch $idx overfull beyond greedy slack")
        }
    }
  }
}
