package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariant + hand-computed specs for t_passages (F16 repeated-
  * passage removal). Exact values at the data SFs are verified by
  * the DuckDB oracle; these pin the semantics a refactor could
  * silently break: segmentation arithmetic, the absolute-df
  * boilerplate cut, ordered reassembly, and the no-boilerplate
  * identity (removing nothing must reproduce the full normalized
  * text bit-for-bit).
  */
class PassagesSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_passages").toString
    rows.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("hand-built corpus: shared passage removed, unique tail kept, remainder preserved") {
    // Five docs open with the same 3-word passage (df = 5 >= 4) and
    // diverge after it; doc 99 shares nothing and exercises the
    // sub-segment remainder path.
    val dir = writeDocs(
      (0L until 5L).map(i => i -> s"x y z unique$i words here $i") :+ (99L -> "a b c d"))
    val out = TextPack.queries("t_passages")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap

    (0L until 5L).foreach { i =>
      val (nWords, nSegs, nBoiler, hash) = out(i)
      assert(nWords === 7L && nSegs === 2L && nBoiler === 1L)
      // kept = surviving segment + remainder word, in order
      assert(hash === graft.util.Md5.hex(s"unique$i words here $i"))
    }
    val (nWords99, nSegs99, nBoiler99, hash99) = out(99L)
    assert(nWords99 === 4L && nSegs99 === 1L && nBoiler99 === 0L)
    assert(hash99 === graft.util.Md5.hex("a b c d"))
  }

  test("df below the cut keeps everything: kept_hash is the full normalized text") {
    // Three repeats (df = 3 < 4) stay below the boilerplate cut.
    val dir = writeDocs(
      (0L until 3L).map(i => i -> s"x y z tail$i") :+ (7L -> "p q r s t u v"))
    val out = TextPack.queries("t_passages")(spark, dir)
    assert(out.filter($"n_boiler" > 0L).count() === 0L)
    val full = TextOps.md5s(TextOps.norm($"text"))
    val joined = graft.Tables.documents(spark, dir).select($"doc_id", full.as("h"))
      .join(out, "doc_id")
    assert(joined.filter($"h" =!= $"kept_hash").count() === 0L)
  }

  test("sf data: accounting identity and no-boilerplate identity hold") {
    val out = TextPack.queries("t_passages")(spark, sfDir).cache()
    // every segment is either kept or boilerplate; counts are sane
    assert(out.filter($"n_boiler" < 0L || $"n_boiler" > $"n_segs").count() === 0L)
    assert(out.filter($"n_segs" =!= ($"n_words" / lit(3L)).cast("long")).count() === 0L)
    // docs that lost nothing reassemble to the exact normalized text
    val full = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", TextOps.md5s(TextOps.norm($"text")).as("h"))
    assert(out.filter($"n_boiler" === 0L).join(full, "doc_id")
      .filter($"h" =!= $"kept_hash").count() === 0L)
    out.unpersist()
  }
}
